"""CTC vs optax goldens; ASG vs brute force; viterbi; scale modes."""

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wav2letter_tpu.ops.asg import (
    asg_loss,
    asg_viterbi,
    fal_score,
    fcc_score,
    linseg_loss,
)
from wav2letter_tpu.ops.ctc import ctc_collapse, ctc_loss, ctc_viterbi
from wav2letter_tpu.criterions.base import CriterionScaleMode, get_scale_mode, scale_losses


@pytest.fixture(scope="module")
def ctc_case():
    np.random.seed(0)
    B, T, N, U = 4, 20, 7, 6
    logits = jnp.asarray(np.random.randn(B, T, N).astype(np.float32))
    targets = jnp.asarray(
        np.array(
            [
                [1, 2, 3, 4, 5, 1],
                [2, 2, 1, -1, -1, -1],
                [0, 1, 0, 1, -1, -1],
                [3, -1, -1, -1, -1, -1],
            ],
            dtype=np.int32,
        )
    )
    tlen = jnp.asarray([6, 3, 4, 1], jnp.int32)
    llen = jnp.asarray([20, 14, 9, 20], jnp.int32)
    return logits, targets, llen, tlen


def _optax_ref(logits, targets, llen, tlen):
    B, T, N = logits.shape
    U = targets.shape[1]
    logit_pad = (jnp.arange(T)[None, :] >= llen[:, None]).astype(jnp.float32)
    tgt = jnp.where(targets < 0, 0, targets)
    lbl_pad = (jnp.arange(U)[None, :] >= tlen[:, None]).astype(jnp.float32)
    return optax.ctc_loss(logits, logit_pad, tgt, lbl_pad, blank_id=N - 1)


def test_ctc_loss_matches_optax(ctc_case):
    logits, targets, llen, tlen = ctc_case
    mine = ctc_loss(logits, targets, llen, tlen)
    ref = _optax_ref(logits, targets, llen, tlen)
    np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_ctc_grad_matches_optax(ctc_case):
    logits, targets, llen, tlen = ctc_case
    g1 = jax.grad(lambda l: ctc_loss(l, targets, llen, tlen).sum())(logits)
    g2 = jax.grad(lambda l: _optax_ref(l, targets, llen, tlen).sum())(logits)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_ctc_jit_and_vmap(ctc_case):
    logits, targets, llen, tlen = ctc_case
    f = jax.jit(ctc_loss)
    np.testing.assert_allclose(
        np.asarray(f(logits, targets, llen, tlen)),
        np.asarray(ctc_loss(logits, targets, llen, tlen)),
        rtol=1e-5,
    )


def test_ctc_viterbi_and_collapse():
    logits = jnp.asarray(
        np.array([[[5, 0, 0], [5, 0, 0], [0, 5, 0], [0, 0, 5], [0, 0, 5]]], np.float32)
    )
    path = ctc_viterbi(logits, jnp.asarray([5]))
    assert path.tolist() == [[0, 0, 1, 2, 2]]
    # blank = 2 (last)
    assert ctc_collapse(np.asarray(path), 2) == [[0, 1]]


# ---------------- ASG ----------------
def brute_fcc(e, tr, T, N):
    scores = []
    for seq in itertools.product(range(N), repeat=T):
        s = e[0, seq[0]]
        for t in range(1, T):
            s += e[t, seq[t]] + tr[seq[t], seq[t - 1]]
        scores.append(s)
    m = max(scores)
    return m + math.log(sum(math.exp(x - m) for x in scores))


def brute_fal(e, tr, tgt, T):
    scores = []
    U = len(tgt)
    for seq in itertools.product(range(U), repeat=T):
        ok = (
            seq[0] == 0
            and seq[-1] == U - 1
            and all(0 <= seq[t + 1] - seq[t] <= 1 for t in range(T - 1))
        )
        if not ok:
            continue
        lab = [tgt[u] for u in seq]
        s = e[0, lab[0]]
        for t in range(1, T):
            s += e[t, lab[t]] + tr[lab[t], lab[t - 1]]
        scores.append(s)
    m = max(scores)
    return m + math.log(sum(math.exp(x - m) for x in scores))


@pytest.fixture(scope="module")
def asg_case():
    np.random.seed(1)
    B, T, N = 2, 5, 3
    em = np.random.randn(B, T, N).astype(np.float32)
    tr = (np.random.randn(N, N) * 0.5).astype(np.float32)
    targets = np.array([[0, 2], [1, -1]], np.int32)
    elen = np.array([5, 4], np.int32)
    tlen = np.array([2, 1], np.int32)
    return em, tr, targets, elen, tlen


def test_asg_scores_vs_brute(asg_case):
    em, tr, targets, elen, tlen = asg_case
    fal = np.asarray(
        fal_score(jnp.asarray(em), jnp.asarray(tr), jnp.asarray(targets),
                  jnp.asarray(elen), jnp.asarray(tlen))
    )
    fcc = np.asarray(fcc_score(jnp.asarray(em), jnp.asarray(tr), jnp.asarray(elen)))
    np.testing.assert_allclose(fal[0], brute_fal(em[0], tr, [0, 2], 5), rtol=1e-5)
    np.testing.assert_allclose(fal[1], brute_fal(em[1], tr, [1], 4), rtol=1e-5)
    np.testing.assert_allclose(fcc[0], brute_fcc(em[0], tr, 5, 3), rtol=1e-5)
    np.testing.assert_allclose(fcc[1], brute_fcc(em[1], tr, 4, 3), rtol=1e-5)


def test_asg_loss_positive_and_grads(asg_case):
    em, tr, targets, elen, tlen = asg_case
    loss = asg_loss(jnp.asarray(em), jnp.asarray(tr), jnp.asarray(targets),
                    jnp.asarray(elen), jnp.asarray(tlen))
    assert (np.asarray(loss) >= -1e-4).all()
    g = jax.grad(
        lambda e, t: asg_loss(e, t, jnp.asarray(targets), jnp.asarray(elen),
                              jnp.asarray(tlen)).sum(),
        argnums=(0, 1),
    )(jnp.asarray(em), jnp.asarray(tr))
    assert np.isfinite(np.asarray(g[0])).all()
    assert np.isfinite(np.asarray(g[1])).all()


def test_asg_viterbi_vs_brute(asg_case):
    em, tr, targets, elen, tlen = asg_case
    vp = np.asarray(asg_viterbi(jnp.asarray(em), jnp.asarray(tr), jnp.asarray(elen)))

    def brute_vit(e, tr, T, N):
        best, bs = None, -1e9
        for seq in itertools.product(range(N), repeat=T):
            s = e[0, seq[0]]
            for t in range(1, T):
                s += e[t, seq[t]] + tr[seq[t], seq[t - 1]]
            if s > bs:
                bs, best = s, seq
        return list(best)

    assert vp[0].tolist() == brute_vit(em[0], tr, 5, 3)
    assert vp[1, :4].tolist() == brute_vit(em[1], tr, 4, 3)


def test_linseg_loss_finite(asg_case):
    em, tr, targets, elen, tlen = asg_case
    l = linseg_loss(jnp.asarray(em), jnp.asarray(tr), jnp.asarray(targets),
                    jnp.asarray(elen), jnp.asarray(tlen))
    assert np.isfinite(np.asarray(l)).all()


def test_scale_modes():
    losses = jnp.asarray([10.0, 10.0])
    il = jnp.asarray([100, 400])
    tl = jnp.asarray([4, 16])
    assert get_scale_mode("none", False) == CriterionScaleMode.NONE
    s = scale_losses(losses, get_scale_mode("target", False), il, tl)
    np.testing.assert_allclose(np.asarray(s), [2.5, 0.625])
    s = scale_losses(losses, get_scale_mode("target", True), il, tl)
    np.testing.assert_allclose(np.asarray(s), [5.0, 2.5])
    s = scale_losses(losses, get_scale_mode("input", False), il, tl)
    np.testing.assert_allclose(np.asarray(s), [0.1, 0.025])
