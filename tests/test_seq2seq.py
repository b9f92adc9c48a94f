"""Seq2Seq criterion tests: loss sanity, overfit a toy mapping, greedy
decode correctness, transformer variant, attention windows, e2e train."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wav2letter_tpu.criterions.base import CriterionScaleMode
from wav2letter_tpu.criterions.seq2seq import (
    S2SConfig,
    Seq2SeqCriterion,
    TransformerS2SCriterion,
)

N = 8  # incl. eos=6, pad=7
EOS, PAD = 6, 7


def make_crit(kind="gru", **kw):
    cfg = S2SConfig(n_classes=N, eos_idx=EOS, pad_idx=PAD, hidden=32,
                    max_decoder_output_len=12, **kw)
    if kind == "gru":
        return Seq2SeqCriterion(cfg, CriterionScaleMode.NONE)
    return TransformerS2SCriterion(cfg, CriterionScaleMode.NONE, n_tr_layers=1)


@pytest.fixture(scope="module")
def toy():
    # encoder "emissions": one-hot-ish codes the decoder can read via attention
    rng = np.random.RandomState(0)
    B, T, H = 4, 6, 32
    targets = np.array(
        [[0, 1, 2, -1], [3, 4, -1, -1], [2, 2, 1, 0], [5, -1, -1, -1]], np.int32
    )
    tlen = np.asarray([3, 2, 4, 1], np.int32)
    em = rng.randn(B, T, H).astype(np.float32)
    elen = np.asarray([6, 4, 6, 3], np.int32)
    return em, targets, elen, tlen


@pytest.mark.parametrize("kind", ["gru", "transformer"])
def test_loss_at_init_near_uniform(toy, kind):
    em, targets, elen, tlen = toy
    crit = make_crit(kind)
    params = crit.init(jax.random.PRNGKey(0), jnp.asarray(em), jnp.asarray(targets),
                       jnp.asarray(elen), jnp.asarray(tlen))
    losses = crit.apply(params, jnp.asarray(em), jnp.asarray(targets),
                        jnp.asarray(elen), jnp.asarray(tlen))
    losses = np.asarray(losses)
    expected = (tlen + 1) * np.log(N)
    assert np.all(losses > 0)
    np.testing.assert_allclose(losses, expected, rtol=0.35)


@pytest.mark.parametrize("kind", ["gru", "transformer"])
def test_overfit_and_greedy(toy, kind):
    em, targets, elen, tlen = toy
    crit = make_crit(kind)
    params = crit.init(jax.random.PRNGKey(1), jnp.asarray(em), jnp.asarray(targets),
                       jnp.asarray(elen), jnp.asarray(tlen))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            return crit.apply(p, jnp.asarray(em), jnp.asarray(targets),
                              jnp.asarray(elen), jnp.asarray(tlen)).mean()

        l, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    l0 = None
    for i in range(200):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.25 * l0, f"did not learn: {l0} -> {float(l)}"
    toks, lens = crit.apply(params, jnp.asarray(em), jnp.asarray(elen),
                            method="greedy_path")
    toks, lens = np.asarray(toks), np.asarray(lens)
    for b in range(em.shape[0]):
        want = [t for t in targets[b][: tlen[b]]]
        got = list(toks[b][: lens[b]])
        assert got == want, f"b={b}: {got} != {want}"


def test_label_smoothing_increases_loss(toy):
    em, targets, elen, tlen = toy
    c0 = make_crit()
    c1 = make_crit(label_smooth=0.2)
    p = c0.init(jax.random.PRNGKey(0), jnp.asarray(em), jnp.asarray(targets),
                jnp.asarray(elen), jnp.asarray(tlen))
    l0 = c0.apply(p, jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
                  jnp.asarray(tlen))
    l1 = c1.apply(p, jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
                  jnp.asarray(tlen))
    assert np.isfinite(np.asarray(l1)).all()


def test_attention_window(toy):
    em, targets, elen, tlen = toy
    crit = make_crit(attn_window="median", window_left=2, window_right=2)
    p = crit.init(jax.random.PRNGKey(0), jnp.asarray(em), jnp.asarray(targets),
                  jnp.asarray(elen), jnp.asarray(tlen), train=True)
    l = crit.apply(p, jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
                   jnp.asarray(tlen), train=True,
                   rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(l)).all()


def test_teacher_forcing_sampling(toy):
    em, targets, elen, tlen = toy
    crit = make_crit(pct_teacher_forcing=50.0, sampling_strategy="model")
    p = crit.init(jax.random.PRNGKey(0), jnp.asarray(em), jnp.asarray(targets),
                  jnp.asarray(elen), jnp.asarray(tlen))
    l = crit.apply(p, jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
                   jnp.asarray(tlen), train=True,
                   rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(l)).all()


def test_s2s_e2e_train(tmp_path):
    """Full Trainer run with --criterion=seq2seq on the synthetic tones."""
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=16, seed=11)
    arch = tmp_path / "enc.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(
            train=lst, tokens=tokens, lexicon=lexicon,
            rundir=str(tmp_path), runname="s2s",
            batchsize=8, mfsc=True, filterbanks=40,
            criterion="seq2seq", encoderdim=32, eostoken=True,
            lr=0.05, netoptim="adam", lrcrit=0.05, critoptim="adam",
            maxgradnorm=5.0, iter=30, reportiters=0, nthread=1,
            pad_multiple=64, compute_dtype="float32", arch=str(arch),
            maxdecoderoutputlen=16,
        )
    )
    tr = Trainer(cfg)
    tr.run()
    assert tr.updates == 30
