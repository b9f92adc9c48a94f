"""CPC criterion + joint trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_tpu.criterions.cpc import CPCConfig, CPCCriterion, MTLLoss


def test_mask_static_shapes():
    c = CPCConfig(mask_prob=0.1, mask_length=4)
    crit = CPCCriterion(c)
    B, T = 3, 50
    enc = jnp.zeros((B, T, c.n_encoder))
    ctx = jnp.zeros((B, T, c.n_context))
    rng = jax.random.PRNGKey(0)
    K = min(T, int(0.1 * T) * 4)
    params = crit.init(rng, enc, ctx, jnp.zeros((B, K), jnp.int32), rng)
    mask, idx = crit.apply(params, rng, B, T, method="make_mask")
    assert idx.shape == (B, K)
    assert mask.shape == (B, T)
    assert np.asarray(mask).sum(axis=1).tolist() == [K] * B  # exactly K per row


def test_apply_mask_uses_embedding():
    c = CPCConfig()
    crit = CPCCriterion(c)
    B, T = 2, 20
    enc = jnp.ones((B, T, c.n_encoder))
    ctx = jnp.ones((B, T, c.n_context))
    rng = jax.random.PRNGKey(1)
    K = min(T, int(c.mask_prob * T + 1) * c.mask_length)
    params = crit.init(rng, enc, ctx, jnp.zeros((B, 4), jnp.int32), rng)
    mask = jnp.zeros((B, T), bool).at[:, :5].set(True)
    masked = crit.apply(params, enc, mask, method="apply_mask")
    emb = params["params"]["mask_embedding"]
    np.testing.assert_allclose(np.asarray(masked[0, 0]), np.asarray(emb), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(masked[0, 10]), 1.0)


def test_cpc_loss_learns_alignment():
    """With context == encoder features, the loss should start near
    log(1+nneg) and be reducible by gradient descent."""
    import optax

    c = CPCConfig(n_encoder=16, n_context=16, n_mutual=16, n_negative=8,
                  mask_prob=0.2, mask_length=2, temperature=0.5)
    crit = CPCCriterion(c)
    rng = jax.random.PRNGKey(0)
    B, T = 4, 40
    feats = jax.random.normal(rng, (B, T, 16))
    K = min(T, int(0.2 * T) * 2)
    params = crit.init(rng, feats, feats, jnp.zeros((B, K), jnp.int32), rng)
    mask, idx = crit.apply(params, rng, B, T, method="make_mask")

    def loss_fn(p, r):
        return crit.apply(p, feats, feats, idx, r).mean()

    l0 = float(loss_fn(params, rng))
    assert 0.5 < l0 < np.log(1 + 8) + 2.0
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o, r):
        l, g = jax.value_and_grad(loss_fn)(p, r)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    for i in range(100):
        rng, k = jax.random.split(rng)
        params, opt, l = step(params, opt, k)
    assert float(l) < 0.5 * l0


def test_mtl_loss():
    m = MTLLoss(n_langs=3, in_dim=8)
    ctx = jnp.ones((4, 10, 8))
    clen = jnp.asarray([10, 8, 10, 5])
    langs = jnp.asarray([0, 2, -1, 1])
    p = m.init(jax.random.PRNGKey(0), ctx, clen, langs)
    l = np.asarray(m.apply(p, ctx, clen, langs))
    assert l.shape == (4,)
    assert l[2] == 0.0  # unlabeled
    assert (l[[0, 1, 3]] > 0).all()


def test_cpc_joint_trainer(tmp_path):
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train_cpc import CPCTrainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=16, seed=21)
    enc = tmp_path / "enc.arch"
    enc.write_text("V -1 1 NFEAT 0\nC NFEAT 32 8 4 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    ctx = tmp_path / "ctx.arch"
    ctx.write_text("V -1 1 NFEAT 0\nRO 2 0 3 1\nL NFEAT NLABEL\n")
    prd = tmp_path / "prd.arch"
    prd.write_text("V -1 1 NFEAT 0\nRO 2 0 3 1\nL NFEAT NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(
            train=lst, train2=lst, tokens=tokens, lexicon=lexicon,
            batchsize=4, mfsc=True, filterbanks=40, criterion="ctc",
            lr=0.01, netoptim="adam", maxgradnorm=5.0, iter=8,
            nthread=1, pad_multiple=64, compute_dtype="float32",
            arch=f"{enc},{ctx},{prd}",
        )
    )
    tr = CPCTrainer(
        cfg,
        cpc_flags=dict(codedim=16, contextdim=16, mutualdim=16,
                       nnegativesamples=8, maskprob=0.2, masklength=2,
                       supdelay=4, supdates=1, unsupdates=1),
    )
    losses = tr.run()
    assert tr.updates == 8
    assert len(losses["unsup"]) >= 3
    assert len(losses["sup"]) >= 1
    assert all(np.isfinite(l) for l in losses["unsup"] + losses["sup"])


def test_cpc_checkpoint_continue_and_pretrain(tmp_path):
    """Checkpoint save at reportiters, continue-mode resume (updates +
    params restored), and --pretrainmodel partial loading
    (Train.cpp:495-503, runValAndSaveModel)."""
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train_cpc import CPCTrainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=3)
    enc = tmp_path / "enc.arch"
    enc.write_text("V -1 1 NFEAT 0\nC NFEAT 32 8 4 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    ctx = tmp_path / "ctx.arch"
    ctx.write_text("V -1 1 NFEAT 0\nRO 2 0 3 1\nL NFEAT NLABEL\n")
    prd = tmp_path / "prd.arch"
    prd.write_text("V -1 1 NFEAT 0\nRO 2 0 3 1\nL NFEAT NLABEL\n")

    def mkcfg(it):
        cfg = Config()
        cfg.update(
            dict(
                train=lst, train2=lst, tokens=tokens, lexicon=lexicon,
                batchsize=4, mfsc=True, filterbanks=40, criterion="ctc",
                lr=0.01, netoptim="adam", maxgradnorm=5.0, iter=it,
                nthread=1, pad_multiple=64, compute_dtype="float32",
                arch=f"{enc},{ctx},{prd}", rundir=str(tmp_path),
                runname="cpcrun", reportiters=2,
            )
        )
        return cfg

    fl = dict(codedim=16, contextdim=16, mutualdim=16, nnegativesamples=8,
              maskprob=0.2, masklength=2, supdelay=2, supdates=1,
              unsupdates=1, supwarmup=2, suphold=1)
    tr = CPCTrainer(mkcfg(4), cpc_flags=fl)
    tr.run()
    ckpt_path = tmp_path / "cpcrun" / "model_last.bin"
    assert ckpt_path.exists()
    assert (tmp_path / "cpcrun" / "001_log").exists()
    # supervised schedule must use supwarmup, not cfg.warmup
    assert tr.sched_sup.warmup == 2 and tr.sched_sup.hold == 1

    # continue: resumes update counter and keeps training
    tr2 = CPCTrainer(mkcfg(6), cpc_flags=fl, mode="continue")
    assert tr2.updates == 4
    tr2.run()
    assert tr2.updates == 6

    # pretrainmodel: fresh trainer seeded from the checkpoint's params
    fl3 = dict(fl, pretrainmodel=str(ckpt_path))
    tr3 = CPCTrainer(mkcfg(2), cpc_flags=fl3)
    assert tr3.updates == 0
    import jax

    # the continue run (tr2) overwrote model_last.bin last
    ref = jax.tree.leaves(tr2.params["enc"])
    got = jax.tree.leaves(tr3.params["enc"])
    # at least one leaf must match the trained (non-init) weights exactly
    assert any(np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(ref, got))
    tr3.run()
