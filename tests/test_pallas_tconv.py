"""Pallas chain-layout time-conv kernel: exact-math tests in interpret
mode (CPU) against the jnp reference and its autodiff. The TPU lowering is
exercised by bench/integration (the kernel only selects on TPU backends)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from wav2letter_tpu.ops.pallas import tconv


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    orig = pl.pallas_call
    monkeypatch.setattr(
        pl, "pallas_call", lambda *a, **k: orig(*a, **{**k, "interpret": True})
    )


CASES = [
    # (B, T, F, C, CO, K, stride, lp, rp)
    (2, 37, 8, 5, 7, 9, 1, 4, 4),
    (1, 41, 4, 3, 3, 5, 1, 0, 4),
    (2, 50, 8, 5, 7, 10, 2, 5, 3),   # odd left pad, stride 2 (PD 0 5 3 case)
    (1, 33, 4, 3, 5, 10, 2, 7, 1),
    (1, 29, 2, 3, 4, 12, 2, 9, 1),
]


@pytest.mark.parametrize("B,T,F,C,CO,K,s,lp,rp", CASES)
def test_tconv_forward(B, T, F, C, CO, K, s, lp, rp):
    x = jax.random.normal(jax.random.PRNGKey(0), (B, T, F * C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, C, CO), jnp.float32) * 0.3
    y = tconv.time_conv(x, w, F, s, (lp, rp))
    ref = tconv.time_conv_reference(x, w, F, s, (lp, rp))
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("B,T,F,C,CO,K,s,lp,rp", CASES)
def test_tconv_grads(B, T, F, C, CO, K, s, lp, rp):
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, F * C), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (K, C, CO), jnp.float32) * 0.3
    co = jax.random.normal(
        jax.random.PRNGKey(4),
        tconv.time_conv_reference(x, w, F, s, (lp, rp)).shape, jnp.float32)

    def loss_k(x, w):
        return jnp.sum(tconv.time_conv(x, w, F, s, (lp, rp)) * co)

    def loss_r(x, w):
        return jnp.sum(tconv.time_conv_reference(x, w, F, s, (lp, rp)) * co)

    gx, gw = jax.grad(loss_k, (0, 1))(x, w)
    rx, rw = jax.grad(loss_r, (0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=1e-3)
