"""Pallas chain fusion (W2L_TCONV=1): the fused f-major (B,T,F*C) graph —
tconv convs, permuted linears, per-frame LN — must be numerically and
param-tree identical to the stored-layout graph on the real streaming
convnets reference arch. On CPU the conv runs the reference einsum; the
Pallas lowering itself is covered by test_pallas_tconv + the TPU bench."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

ARCH = "/root/reference/recipes/streaming_convnets/librispeech/am_500ms_future_context.arch"


@pytest.fixture
def both_models(monkeypatch):
    from wav2letter_tpu.models import arch as A

    if not os.path.exists(ARCH):
        pytest.skip("reference not mounted")
    monkeypatch.setenv("W2L_TCONV", "0")
    m0 = A.build_arch_module(ARCH, 80, 40)
    monkeypatch.setenv("W2L_TCONV", "1")
    m1 = A.build_arch_module(ARCH, 80, 40)
    return m0, m1


@pytest.mark.slow
def test_chain_fused_equals_unfused(both_models):
    m0, m1 = both_models
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 100, 80), jnp.float32) * 0.3
    xl = jnp.asarray([100, 73], jnp.int32)
    p0 = m0.init({"params": jax.random.PRNGKey(0)}, x, xl)
    p1 = m1.init({"params": jax.random.PRNGKey(0)}, x, xl)
    assert jax.tree.structure(p0) == jax.tree.structure(p1)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    y0, l0 = m0.apply(p0, x, xl)
    y1, l1 = m1.apply(p0, x, xl)  # unfused params through the fused graph
    assert bool(jnp.all(l0 == l1))
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-4)

    def loss(m, p):
        y, _ = m.apply(p, x, xl)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-3

    g0 = jax.grad(lambda p: loss(m0, p))(p0)
    g1 = jax.grad(lambda p: loss(m1, p))(p0)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-3, rtol=1e-2)
