"""Fused residual+LN Pallas kernel: exact forward/grad match vs autodiff
reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from wav2letter_tpu.ops.pallas.layernorm import fused_residual_ln


def ref(x, y, w, b):
    z = x + y
    mu = z.mean(-1, keepdims=True)
    var = z.var(-1, keepdims=True)
    return (z - mu) * jax.lax.rsqrt(var + 1e-5) * w[0] + b[0]


def test_fused_residual_ln_fwd_bwd():
    rng = np.random.RandomState(0)
    R, D = 70, 96  # non-multiple of the row tile
    x = jnp.asarray(rng.randn(R, D).astype(np.float32))
    y = jnp.asarray(rng.randn(R, D).astype(np.float32))
    w = jnp.asarray([1.3])
    b = jnp.asarray([-0.2])
    o1 = fused_residual_ln(x, y, w, b, True)
    o2 = ref(x, y, w, b)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)
    g1 = jax.grad(lambda *a: (fused_residual_ln(*a, True) ** 2).sum(),
                  argnums=(0, 1, 2, 3))(x, y, w, b)
    g2 = jax.grad(lambda *a: (ref(*a) ** 2).sum(), argnums=(0, 1, 2, 3))(x, y, w, b)
    for a, bb in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb), atol=1e-3)
