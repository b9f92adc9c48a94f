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
    """Window gating: window=True (pretrain phase / --trainWithWindow) must
    actually constrain attention — the loss changes vs. the unwindowed run."""
    em, targets, elen, tlen = toy
    crit = make_crit(attn_window="median", window_left=1, window_right=1)
    args = (jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
            jnp.asarray(tlen))
    p = crit.init(jax.random.PRNGKey(0), *args, train=True)
    l_win = crit.apply(p, *args, train=True, window=True,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    l_off = crit.apply(p, *args, train=True, window=False,
                       rngs={"dropout": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(l_win)).all()
    assert not np.allclose(np.asarray(l_win), np.asarray(l_off))


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


def test_decoderattnround_multi_round(toy):
    """--decoderattnround=2 (sota/2019 *_s2s cfgs): two chained
    (GRU stack + attention) rounds per output step, each with its own
    parameters — behavior must actually change, not just be accepted."""
    em, targets, elen, tlen = toy
    crit1 = make_crit("gru")
    crit2 = make_crit("gru", n_rounds=2)
    k = jax.random.PRNGKey(0)
    args = (jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen), jnp.asarray(tlen))
    p1 = crit1.init(k, *args)
    p2 = crit2.init(k, *args)
    # round-1 modules exist and round-0 names are unchanged
    assert "gru0" in p2["params"] and "gru_r1_0" in p2["params"]
    n1 = sum(x.size for x in jax.tree.leaves(p1))
    n2 = sum(x.size for x in jax.tree.leaves(p2))
    assert n2 > n1
    # loss is finite and differs from the single-round criterion
    l1 = np.asarray(crit1.apply(p1, *args))
    l2 = np.asarray(crit2.apply(p2, *args))
    assert np.isfinite(l2).all()
    assert not np.allclose(l1, l2)
    # greedy decode runs with the multi-round state
    toks, lens = crit2.apply(p2, jnp.asarray(em), jnp.asarray(elen),
                             method="greedy_path")
    assert toks.shape[0] == em.shape[0]
    assert np.asarray(lens).max() <= 12


def test_decoderattnround_overfits(toy):
    """Multi-round decoder can still learn the toy mapping (grads flow
    through both rounds)."""
    import optax

    em, targets, elen, tlen = toy
    crit = make_crit("gru", n_rounds=2, pct_teacher_forcing=100.0)
    args = (jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen), jnp.asarray(tlen))
    params = crit.init(jax.random.PRNGKey(1), *args)
    tx = optax.adam(5e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def lf(p):
            return crit.apply(p, *args).mean()

        l, g = jax.value_and_grad(lf)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    first = None
    for _ in range(150):
        params, opt, l = step(params, opt)
        if first is None:
            first = float(l)
    assert float(l) < 0.3 * first


def test_transformer_decoder_dropout_layerdrop(toy):
    """--am_decoder_tr_dropout / --am_decoder_tr_layerdrop change the
    training loss stochastically (and are inert at eval)."""
    em, targets, elen, tlen = toy
    args = (jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
            jnp.asarray(tlen))
    from wav2letter_tpu.criterions.base import CriterionScaleMode
    from wav2letter_tpu.criterions.seq2seq import S2SConfig, TransformerS2SCriterion

    c = S2SConfig(n_classes=N, eos_idx=EOS, pad_idx=PAD, hidden=32,
                  max_decoder_output_len=12)
    crit = TransformerS2SCriterion(c, CriterionScaleMode.NONE, n_tr_layers=2,
                                   tr_dropout=0.5, tr_layerdrop=0.5)
    p = crit.init(jax.random.PRNGKey(0), *args)
    # perturb away from the zero-init residual projections so the dropped
    # branches actually carry signal
    leaves, treedef = jax.tree.flatten(p)
    ks = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    p = jax.tree.unflatten(
        treedef,
        [x + 0.05 * jax.random.normal(k, x.shape, x.dtype)
         for x, k in zip(leaves, ks)],
    )
    l_eval = crit.apply(p, *args)  # eval: deterministic, no rng needed
    l_a = crit.apply(p, *args, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    l_b = crit.apply(p, *args, train=True, rngs={"dropout": jax.random.PRNGKey(9)})
    assert np.isfinite(np.asarray(l_eval)).all()
    assert not np.allclose(np.asarray(l_a), np.asarray(l_b))  # stochastic
    # rate 0 -> identical to eval
    crit0 = TransformerS2SCriterion(c, CriterionScaleMode.NONE, n_tr_layers=2)
    p0 = crit0.init(jax.random.PRNGKey(0), *args)
    l0 = crit0.apply(p0, *args, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    np.testing.assert_allclose(np.asarray(l0),
                               np.asarray(crit0.apply(p0, *args)), rtol=1e-6)


def test_gumbel_sampling(toy):
    """--samplingstrategy=gumbel draws scheduled-sampling tokens from the
    model distribution at --gumbeltemperature."""
    em, targets, elen, tlen = toy
    args = (jnp.asarray(em), jnp.asarray(targets), jnp.asarray(elen),
            jnp.asarray(tlen))
    crit = make_crit(pct_teacher_forcing=0.0, sampling_strategy="gumbel",
                     gumbel_temperature=0.5)
    p = crit.init(jax.random.PRNGKey(0), *args)
    l = crit.apply(p, *args, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(l)).all()
    crit_r = make_crit(pct_teacher_forcing=0.0, sampling_strategy="rand")
    l_r = crit_r.apply(p, *args, train=True, rngs={"dropout": jax.random.PRNGKey(3)})
    assert not np.allclose(np.asarray(l), np.asarray(l_r))


def test_keyvalue_arch_2x_encoderdim_trains(tmp_path):
    """Reference keyvalue s2s recipes hard-code the encoder output at
    2 x --encoderdim (e.g. am_tds_s2s.arch ends `L 1440 1024` with
    encoderdim=512); the criterion splits keys/values. The arch builder
    must NOT force-reshape the encoder output to encoderdim (round-3
    regression: force_label_dim silently folded the feature dim into
    time, breaking every keyvalue arch)."""
    import os

    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=77)
    arch = tmp_path / "kv.arch"
    # final linear outputs 64 = 2 x encoderdim(32)
    arch.write_text(
        "V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 64\n"
    )
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="kv", batchsize=8, mfsc=True, filterbanks=40,
             criterion="seq2seq", attention="keyvalue", encoderdim=32,
             maxdecoderoutputlen=12, lr=0.05, netoptim="adam", lrcrit=0.05,
             critoptim="adam", iter=4, nthread=1, pad_multiple=64,
             arch=str(arch), compute_dtype="float32")
    )
    tr = Trainer(cfg)
    # encoder must emit 64-dim states, not a time-folded 32
    import jax
    import jax.numpy as jnp

    em, _ = tr.model.apply(
        {"params": tr.model_params}, jnp.zeros((1, 64, 40)), jnp.asarray([64])
    )
    assert em.shape[-1] == 64, em.shape
    tr.run()
    assert tr.updates == 4
