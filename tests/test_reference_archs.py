"""Every .arch network file shipped in the reference recipes must build and
run unchanged through our arch DSL (SURVEY.md §2.3: "user-facing model format
— must be supported as-is").

AM archs go through build_arch_module (features in, emissions out); LM archs
(token-embedding front) go through build_lm_model. Shapes/NFEAT follow each
recipe's train cfg (TDS archs hardcode the 80-mel view; conv_glu/lexicon_free
use 40 filterbanks).
"""

import os

import jax
import jax.numpy as jnp
import pytest

REF = "/root/reference/recipes"

# (relpath, nfeat, nlabel, T).  NLABEL kept small for speed; archs ending in a
# fixed-width linear (s2s encoders) just assert the forward runs & is finite.
AM_ARCHS = [
    ("conv_glu/librispeech/network.arch", 40, 30, 64),
    ("conv_glu/wsj/network.arch", 40, 30, 64),
    ("lexicon_free/librispeech/am.arch", 40, 30, 64),
    ("lexicon_free/wsj/am.arch", 40, 30, 64),
    ("learnable_frontend/am_baseline_conv_relu.arch", 40, 32, 64),
    ("local_prior_match/librispeech/network.arch", 80, 32, 64),
    ("self_training/librispeech/am/baseline.arch", 80, 32, 64),
    ("seq2seq_tds/librispeech/network.arch", 80, 32, 64),
    ("streaming_convnets/librispeech/am_500ms_future_context.arch", 80, 40, 64),
    ("sota/2019/am_arch/am_tds_ctc.arch", 80, 32, 64),
    ("sota/2019/am_arch/am_tds_s2s.arch", 80, 32, 64),
    ("sota/2019/am_arch/am_tds_ctc_librivox.arch", 80, 32, 64),
    ("sota/2019/am_arch/am_tds_s2s_librivox.arch", 80, 32, 64),
    ("sota/2019/am_arch/am_transformer_ctc.arch", 80, 32, 32),
    ("sota/2019/am_arch/am_transformer_s2s.arch", 80, 32, 32),
    ("sota/2019/am_arch/am_transformer_ctc_librivox.arch", 80, 32, 32),
    ("sota/2019/am_arch/am_transformer_s2s_librivox.arch", 80, 32, 32),
    ("sota/2019/am_arch/am_resnet_ctc.arch", 80, 32, 16),
    ("sota/2019/am_arch/am_resnet_s2s.arch", 80, 32, 16),
    ("sota/2019/am_arch/am_resnet_ctc_librivox.arch", 80, 32, 16),
    ("sota/2019/am_arch/am_resnet_s2s_librivox.arch", 80, 32, 16),
]

LM_ARCHS = [
    ("lexicon_free/librispeech/lm_librispeech_convlm_char_14B.arch", 40),
    ("lexicon_free/librispeech/lm_librispeech_convlm_char_20B.arch", 40),
    ("lexicon_free/librispeech/lm_librispeech_convlm_word_14B.arch", 200),
    ("lexicon_free/wsj/lm_wsj_convlm_char_14B.arch", 40),
    ("lexicon_free/wsj/lm_wsj_convlm_char_20B.arch", 40),
    ("lexicon_free/wsj/lm_wsj_convlm_word_14B.arch", 200),
    ("self_training/librispeech/lm/lm_librispeech_wp_5kwp_gcnn_14B.arch", 200),
    ("sota/2019/lm/lm_librispeech_word_gcnn_14B.arch", 200),
    ("sota/2019/lm/lm_librispeech_wp_10k_gcnn_14B.arch", 200),
]


def _needs(path):
    if not os.path.exists(os.path.join(REF, path)):
        pytest.skip("reference not mounted")


@pytest.mark.slow
@pytest.mark.parametrize("path,nfeat,nlabel,T", AM_ARCHS)
def test_reference_am_arch_builds(path, nfeat, nlabel, T):
    _needs(path)
    from wav2letter_tpu.models.arch import build_arch_module

    m = build_arch_module(os.path.join(REF, path), nfeat, nlabel)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, T, nfeat)) * 0.1
    xl = jnp.asarray([T], jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
    out = m.apply(p, x, xl)
    y = out[0] if isinstance(out, tuple) else out
    assert bool(jnp.all(jnp.isfinite(y)))
    # CTC-style archs end in a projection to NLABEL; s2s encoders end in a
    # fixed-width linear — only assert the token dim when the arch says so.
    last = [
        ln.split()
        for ln in open(os.path.join(REF, path))
        if ln.strip() and not ln.startswith("#")
    ][-1]
    if "NLABEL" in last:
        assert y.shape[-1] == nlabel


@pytest.mark.slow
@pytest.mark.parametrize("path,vocab", LM_ARCHS)
def test_reference_lm_arch_builds(path, vocab):
    _needs(path)
    from wav2letter_tpu.models.lm import build_lm_model

    m = build_lm_model(os.path.join(REF, path), vocab)
    ids = jnp.zeros((1, 16), jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, ids)
    out = m.apply(p, ids)
    y = out[0] if isinstance(out, tuple) else out
    assert y.shape[-1] == vocab
    assert bool(jnp.all(jnp.isfinite(y)))
