"""Seq2Seq beam decoder: overfit a GRU criterion on toy data, then require
the lexicon-free beam (beam=4) to recover the target sequences, and the
lexicon-constrained variant to only emit lexicon words."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wav2letter_tpu.criterions.base import CriterionScaleMode
from wav2letter_tpu.criterions.seq2seq import S2SConfig, Seq2SeqCriterion
from wav2letter_tpu.decoder import DecoderOptions, CriterionType, Trie, ZeroLM
from wav2letter_tpu.decoder.seq2seq_beam import (
    LexiconFreeSeq2SeqDecoder,
    LexiconSeq2SeqDecoder,
    make_s2s_update_fn,
)

N = 8
EOS, PAD = 6, 7


@pytest.fixture(scope="module")
def overfit():
    rng = np.random.RandomState(0)
    B, T, H = 4, 6, 32
    targets = np.array(
        [[0, 1, 2, -1], [3, 4, -1, -1], [2, 2, 1, 0], [5, -1, -1, -1]], np.int32
    )
    tlen = np.asarray([3, 2, 4, 1], np.int32)
    em = rng.randn(B, T, H).astype(np.float32)
    elen = np.asarray([6, 4, 6, 3], np.int32)
    crit = Seq2SeqCriterion(
        S2SConfig(n_classes=N, eos_idx=EOS, pad_idx=PAD, hidden=32,
                  max_decoder_output_len=10),
        CriterionScaleMode.NONE,
    )
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

    for _ in range(250):
        params, opt, l = step(params, opt)
    return crit, params, em, elen, targets, tlen


def test_lexicon_free_s2s_beam(overfit):
    crit, params, em, elen, targets, tlen = overfit
    for b in range(em.shape[0]):
        fn, init = make_s2s_update_fn(crit, params["params"], em[b], int(elen[b]))
        dec = LexiconFreeSeq2SeqDecoder(
            DecoderOptions(beam_size=4, beam_threshold=50.0,
                           criterion_type=CriterionType.S2S),
            EOS, fn, init, max_output_len=10,
        )
        res = dec.decode()[0]
        want = [int(t) for t in targets[b][: tlen[b]]]
        assert res.tokens == want, f"b={b}: {res.tokens} != {want}"


def test_lexicon_s2s_beam(overfit):
    crit, params, em, elen, targets, tlen = overfit
    # lexicon: words over token alphabet; sample 0 target is [0,1,2]
    trie = Trie(n_tokens=N)
    trie.insert([0, 1, 2], word_idx=0, score=0.0)
    trie.insert([3, 4], word_idx=1, score=0.0)
    b = 0
    fn, init = make_s2s_update_fn(crit, params["params"], em[b], int(elen[b]))
    dec = LexiconSeq2SeqDecoder(
        DecoderOptions(beam_size=4, beam_threshold=50.0,
                       criterion_type=CriterionType.S2S),
        trie, ZeroLM(), EOS, fn, init,
    )
    res = dec.decode()[0]
    assert res.tokens == [0, 1, 2]
    assert [w for w in res.words if w >= 0] == [0]


def test_transformer_incremental_matches_full():
    """KV-cached decode_step logits must equal the teacher-forced pass."""
    import jax.numpy as jnp
    from wav2letter_tpu.criterions.seq2seq import (
        S2SConfig, TransformerS2SCriterion,
    )
    from wav2letter_tpu.criterions.base import CriterionScaleMode

    crit = TransformerS2SCriterion(
        S2SConfig(n_classes=N, eos_idx=EOS, pad_idx=PAD, hidden=32,
                  max_decoder_output_len=8),
        CriterionScaleMode.NONE, n_tr_layers=2,
    )
    rng = np.random.RandomState(3)
    B, T, H = 2, 5, 32
    em = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    elen = jnp.asarray([5, 4], jnp.int32)
    toks = jnp.asarray(rng.randint(0, EOS, (B, 5)), jnp.int32)
    tlen = jnp.asarray([5, 5], jnp.int32)
    params = crit.init(jax.random.PRNGKey(0), em, toks, elen, tlen)
    enc_mask = jnp.arange(T)[None, :] < elen[:, None]
    dec_in = jnp.concatenate(
        [jnp.full((B, 1), EOS, jnp.int32), toks], axis=1
    )
    full = crit.apply(params, dec_in, em, enc_mask, method="_decode_all")
    state = crit.apply(params, B, method="init_state")
    for u in range(dec_in.shape[1]):
        state, logits = crit.apply(
            params, state, dec_in[:, u], em, enc_mask, u, method="decode_step"
        )
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(full[:, u]), rtol=1e-4, atol=1e-4,
            err_msg=f"position {u}",
        )


def test_transformer_beam_decodes():
    """Overfit the transformer criterion, then beam-decode with the
    KV-cached step and recover the targets."""
    import jax.numpy as jnp
    import optax
    from wav2letter_tpu.criterions.seq2seq import (
        S2SConfig, TransformerS2SCriterion,
    )
    from wav2letter_tpu.criterions.base import CriterionScaleMode

    crit = TransformerS2SCriterion(
        S2SConfig(n_classes=N, eos_idx=EOS, pad_idx=PAD, hidden=32,
                  max_decoder_output_len=8),
        CriterionScaleMode.NONE, n_tr_layers=1,
    )
    rng = np.random.RandomState(0)
    B, T, H = 4, 6, 32
    targets = np.array(
        [[0, 1, 2, -1], [3, 4, -1, -1], [2, 2, 1, 0], [5, -1, -1, -1]], np.int32
    )
    tlen = np.asarray([3, 2, 4, 1], np.int32)
    em = jnp.asarray(rng.randn(B, T, H).astype(np.float32))
    elen = jnp.asarray([6, 4, 6, 3], jnp.int32)
    params = crit.init(jax.random.PRNGKey(1), em, jnp.asarray(targets),
                       elen, jnp.asarray(tlen))
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def lf(pp):
            return crit.apply(pp, em, jnp.asarray(targets), elen,
                              jnp.asarray(tlen)).mean()
        l, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for _ in range(300):
        params, opt, l = step(params, opt)
    for b in range(B):
        fn, init = make_s2s_update_fn(crit, params["params"], np.asarray(em[b]),
                                      int(elen[b]))
        dec = LexiconFreeSeq2SeqDecoder(
            DecoderOptions(beam_size=4, beam_threshold=50.0,
                           criterion_type=CriterionType.S2S),
            EOS, fn, init, max_output_len=8,
        )
        res = dec.decode()[0]
        want = [int(t) for t in targets[b][: tlen[b]]]
        assert res.tokens == want, f"b={b}: {res.tokens} != {want}"


def test_hard_soft_selection_pruning(overfit):
    """--hardselection/--softselection (seq2seq_tds decode cfgs): with
    generous thresholds the result is unchanged; tight thresholds still
    decode the overfit target (pruning only trims the candidate tail)."""
    crit, params, em, elen, targets, tlen = overfit
    b = 2
    fn, init = make_s2s_update_fn(crit, params["params"], em[b], int(elen[b]))
    want = [int(t) for t in targets[b][: tlen[b]]]
    base = LexiconFreeSeq2SeqDecoder(
        DecoderOptions(beam_size=4, beam_threshold=50.0,
                       criterion_type=CriterionType.S2S),
        EOS, fn, init, max_output_len=10,
    ).decode()[0]
    for hard, soft in [(1.5, 10.0), (1.0, 2.0), (float("inf"), 0.5)]:
        res = LexiconFreeSeq2SeqDecoder(
            DecoderOptions(beam_size=4, beam_threshold=50.0,
                           criterion_type=CriterionType.S2S),
            EOS, fn, init, max_output_len=10,
            hard_selection=hard, soft_selection=soft,
        ).decode()[0]
        assert res.tokens == want
    assert base.tokens == want


def test_soft_selection_prunes_beam(overfit):
    """A pathologically tight soft window must leave <= 1 surviving
    candidate per step (greedy path), i.e. selection actually prunes."""
    crit, params, em, elen, targets, tlen = overfit
    b = 0
    fn, init = make_s2s_update_fn(crit, params["params"], em[b], int(elen[b]))
    dec = LexiconFreeSeq2SeqDecoder(
        DecoderOptions(beam_size=8, beam_threshold=1e9,
                       criterion_type=CriterionType.S2S),
        EOS, fn, init, max_output_len=10, soft_selection=1e-9,
    )
    res = dec.decode()[0]
    # greedy path on the overfit model still yields the target
    want = [int(t) for t in targets[b][: tlen[b]]]
    assert res.tokens == want
