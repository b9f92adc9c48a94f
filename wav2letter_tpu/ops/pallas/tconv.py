"""Pallas TPU kernel: TDS/streaming time-convolution in the fused
(B, T, F*C) chain layout.

The reference's TDS time conv (``inference/module/nn/TDSBlock.cpp:20-71``;
arch ``TDS``/``C2`` lines) convolves over time only, mixing C->C' per
frequency position f with weights shared across f. XLA's TPU convolution
re-layouts activations around every such conv: the flagship bench showed
23.9 ms/step of {0,1,3,2}<->{3,2,1,0} "data formatting" copies clustered
around the TDS convs, their pads, and their backward (BENCH.md profile).
This kernel runs the conv *in* the chain layout — including the time
padding, so the surrounding PD/jnp.pad copies disappear too.

Math (x viewed (B, T, F, C), weights (K, C, Cout), stride s, pads (lp, rp)):

    y[b, t, f, co] = sum_{k, c} xpad[b, t*s + k, f, c] * w[k, c, co]

Layout strategy (every op here was individually validated against the
Mosaic lowering on v5e — leading/sublane permutes and strided slices are
NOT supported, so the kernel uses only: 2-D transposes, leading-dim
splits/merges, minor-2-dim batched transposes on 128-multiple lane dims,
and lane/sublane-offset stores):

  per batch item (grid = (B,)):
    xst   = transpose2d(x[b]) into phase-major scratch rows (s*F*C, Tp2)
    per f-group g (Fg rows at a time, bounds VMEM of the C-lane-padded view):
      xvt[ph] = transpose(xst[ph,g].reshape(Fg, C, Tp2), (0, 2, 1))
      per time tile, per tap k:
        P[:, k*C:(k+1)*C] = xvt[phase(k)][:, base(k)+t0 : ..+Tt, :]
      y2  = P @ w2                         ONE MXU matmul, contraction K*C
      ys[g, t0:t0+Tt] = transpose(y2.reshape(Fg, Tt, CO), (0,2,1)).reshape(..)
    y[b] = transpose2d(ys)[:Tout]

Packing k*C into the contraction is the only way past the C<=27 channel
widths of these archs (a bare C contraction leaves the MXU ~1% utilized).
Stride-2 convs split x into even/odd time phases with one free pair-reshape
((2T', L) -> (T', 2L)); tap k then reads phase (k - lp) mod s.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _align(n, m):
    return -(-n // m) * m


def _pick_fg(F, Tp2, vmem_budget=2 * 1024 * 1024):
    """f-group size: the (Fg, Tp2, C->128 lanes) padded xvt scratch is the
    VMEM hog; keep it under budget while dividing F."""
    fg = F
    while fg > 1 and fg * Tp2 * 128 * 2 > vmem_budget:
        fg -= 1
        while F % fg:
            fg -= 1
    return max(1, fg)


def _geom(T, K, S, lp, rp, Tout, t_tile):
    """Shared geometry: base column BO, tile count, scratch length Tp2."""
    BO = -((-lp) // S)  # ceil(lp/S): tap offsets j >= -BO stay in range
    Tt = min(t_tile, _align(Tout, 8))
    n_t = -(-Tout // Tt)
    # scratch must hold the stored phases AND the last tile's largest window
    Tp2 = _align(
        BO + max((T + S - 1) // S, (K - 1) // S + n_t * Tt + 1), 128)
    return BO, Tt, n_t, Tp2


def _store_x_phases(x_ref, xst_ref, S, D, T, BO):
    """Transpose x (T, D) into phase-major scratch rows (S*D, Tp2): phase p
    row-block column BO+v holds x[S*v + p]. One free pair-reshape + one 2-D
    transpose; odd-tail rows stored individually."""
    Tp2 = xst_ref.shape[1]
    xst_ref[:] = jnp.zeros((S * D, Tp2), xst_ref.dtype)
    if S == 1:
        xst_ref[:, BO : BO + T] = jnp.transpose(x_ref[0])
    else:
        T2 = T // S
        xr = x_ref[0, 0 : T2 * S, :].reshape(T2, S * D)
        xst_ref[:, BO : BO + T2] = jnp.transpose(xr)
        for r in range(T2 * S, T):
            ph, u = r % S, r // S
            xst_ref[ph * D : (ph + 1) * D, BO + u] = x_ref[0, r, :]


def _tap(k, lp, S, BO):
    """Scratch phase and base column for tap k: xpad[S*t + k] = x[S*t+k-lp]
    lives in phase (k-lp) mod S at column BO + t + (k-lp-ph)//S."""
    m = k - lp
    ph = m % S
    return ph, BO + (m - ph) // S


def _fwd_kernel(x_ref, w_ref, y_ref, xst_ref, xvt_ref, p_ref, ys_ref, *,
                K, C, CO, F, Fg, Tt, stride, n_t, Tout, lp, T):
    """Grid (B, n_fg): the f-group axis rides the grid (compile-time program
    size ~n_fg x smaller than a fully unrolled body); xst/ys scratch persist
    across the inner grid axis. The relayouted f-group view is MATERIALIZED
    into xvt_ref once per cell — as a bare value Mosaic recomputes the
    transpose at every slice use (measured: 20 s instead of ~1 ms)."""
    S = stride
    D = F * C
    BO = -((-lp) // S)
    g = pl.program_id(1)
    n_fg = pl.num_programs(1)

    @pl.when(g == 0)
    def _():
        _store_x_phases(x_ref, xst_ref, S, D, T, BO)

    Tp2 = xst_ref.shape[1]
    w = w_ref[:]
    gFgC = g * Fg * C
    for ph in range(S):
        xg = xst_ref[pl.ds(ph * D + gFgC, Fg * C), :]
        xvt_ref[ph] = jnp.transpose(xg.reshape(Fg, C, Tp2), (0, 2, 1))
    for ti in range(n_t):
        t0 = ti * Tt
        for k in range(K):
            ph, base = _tap(k, lp, S, BO)
            off = base + t0
            sl = xvt_ref[ph, :, off : off + Tt, :]
            p_ref[:, k * C : (k + 1) * C] = sl.reshape(Fg * Tt, C)
        y2 = jax.lax.dot_general(
            p_ref[:], w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y3 = jnp.transpose(y2.reshape(Fg, Tt, CO), (0, 2, 1))
        ys_ref[pl.ds(g * Fg * CO, Fg * CO), t0 : t0 + Tt] = (
            y3.reshape(Fg * CO, Tt).astype(ys_ref.dtype))

    @pl.when(g == n_fg - 1)
    def _():
        y_ref[0, :, :] = jnp.transpose(ys_ref[:])[0:Tout, :]


def _fwd(x, w, F, stride, lp, rp, t_tile=128):
    B, T, D = x.shape
    K, C, CO = w.shape
    assert D == F * C, (D, F, C)
    S = stride
    Tout = (lp + T + rp - K) // S + 1
    assert Tout >= 1, (T, K, S, lp, rp)
    BO, Tt, n_t, Tp2 = _geom(T, K, S, lp, rp, Tout, t_tile)
    Fg = _pick_fg(F, Tp2)
    w2 = w.reshape(K * C, CO).astype(x.dtype)
    Tout_pad = _align(n_t * Tt, 128)
    kern = functools.partial(
        _fwd_kernel, K=K, C=C, CO=CO, F=F, Fg=Fg, Tt=Tt, stride=S,
        n_t=n_t, Tout=Tout, lp=lp, T=T)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((B, Tout, F * CO), x.dtype),
        grid=(B, F // Fg),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Tout, F * CO), lambda b, g: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S * D, Tp2), x.dtype),
            pltpu.VMEM((S, Fg, Tp2, C), x.dtype),
            pltpu.VMEM((Fg * Tt, K * C), x.dtype),
            pltpu.VMEM((F * CO, Tout_pad), x.dtype),
        ],
    )(x, w2)


# ---------------------------------------------------------------------------
# wgrad kernel: dw[k*C+c, co] = sum_{b,t,f} xpad[b,t*s+k,f*C+c] * dy[b,t,f*CO+co]
# Same im2col machinery; accumulates across the sequential (B,) grid.
# ---------------------------------------------------------------------------
def _wgrad_kernel(x_ref, dy_ref, dw_ref, xst_ref, xvt_ref, dyg_ref, p_ref,
                  dyt_ref, *, K, C, CO, F, Fg, Tt, stride, n_t, Tout, lp, T):
    S = stride
    D = F * C
    BO = -((-lp) // S)
    b = pl.program_id(0)
    g = pl.program_id(1)

    @pl.when(jnp.logical_and(b == 0, g == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    @pl.when(g == 0)
    def _():
        _store_x_phases(x_ref, xst_ref, S, D, T, BO)
        dyt_ref[:] = jnp.zeros_like(dyt_ref)
        dyt_ref[:, 0:Tout] = jnp.transpose(dy_ref[0])

    Tp2 = xst_ref.shape[1]
    acc = jnp.zeros((K * C, CO), jnp.float32)
    for ph in range(S):
        xg = xst_ref[pl.ds(ph * D + g * Fg * C, Fg * C), :]
        xvt_ref[ph] = jnp.transpose(xg.reshape(Fg, C, Tp2), (0, 2, 1))
    dyg_ref[:] = jnp.transpose(
        dyt_ref[pl.ds(g * Fg * CO, Fg * CO), :].reshape(
            Fg, CO, dyt_ref.shape[1]),
        (0, 2, 1))  # (Fg, Tout_pad, CO); zero rows beyond Tout
    for ti in range(n_t):
        t0 = ti * Tt
        for k in range(K):
            ph, base = _tap(k, lp, S, BO)
            off = base + t0
            sl = xvt_ref[ph, :, off : off + Tt, :]
            p_ref[:, k * C : (k + 1) * C] = sl.reshape(Fg * Tt, C)
        dyb = dyg_ref[:, t0 : t0 + Tt, :].reshape(Fg * Tt, CO)
        acc = acc + jax.lax.dot_general(
            p_ref[:], dyb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    dw_ref[:] += acc


def _wgrad(x, dy, wshape, F, stride, lp, rp, t_tile=128):
    B, T, D = x.shape
    K, C, CO = wshape
    S = stride
    Tout = dy.shape[1]
    BO, Tt, n_t, Tp2 = _geom(T, K, S, lp, rp, Tout, t_tile)
    Fg = _pick_fg(F, Tp2)
    Tout_pad = _align(n_t * Tt, 128)
    kern = functools.partial(
        _wgrad_kernel, K=K, C=C, CO=CO, F=F, Fg=Fg, Tt=Tt, stride=S,
        n_t=n_t, Tout=Tout, lp=lp, T=T)
    dw2 = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((K * C, CO), jnp.float32),
        grid=(B, F // Fg),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tout, F * CO), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((K * C, CO), lambda b, g: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S * D, Tp2), x.dtype),
            pltpu.VMEM((S, Fg, Tp2, C), x.dtype),
            pltpu.VMEM((Fg, Tout_pad, CO), x.dtype),
            pltpu.VMEM((Fg * Tt, K * C), x.dtype),
            pltpu.VMEM((F * CO, Tout_pad), x.dtype),
        ],
    )(x, dy)
    return dw2.reshape(K, C, CO)


# ---------------------------------------------------------------------------
# public op with custom VJP
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def time_conv(x, w, F, stride=1, pads=(0, 0)):
    """Time conv in chain layout. x (B, T, F*C); w (K, C, CO); returns
    (B, (lp+T+rp-K)//stride+1, F*CO). Padding is applied inside the kernel
    (no XLA-side jnp.pad copy)."""
    return _fwd(x, w, F, stride, pads[0], pads[1])


def _time_conv_fwd_rule(x, w, F, stride, pads):
    return _fwd(x, w, F, stride, pads[0], pads[1]), (x, w)


def _time_conv_bwd_rule(F, stride, pads, res, dy):
    x, w = res
    K, C, CO = w.shape
    lp, rp = pads
    dy = dy.astype(x.dtype)
    wT = jnp.flip(w, 0).transpose(0, 2, 1)  # (K, CO, C)
    if stride == 1:
        dyd = dy
    else:
        B, Tout, _ = dy.shape
        dyd = jnp.zeros((B, (Tout - 1) * stride + 1, dy.shape[2]), dy.dtype)
        dyd = dyd.at[:, ::stride].set(dy)
    # dx[u] = sum_k dyd[u + lp - k] w[k]: a stride-1 correlation with the
    # flipped kernel; right pad sized so the output covers all T inputs
    # (the floor in Tout can shave the K-1-rp bound for stride > 1).
    rp_t = x.shape[1] + lp - dyd.shape[1]
    dx = _fwd(dyd, wT, F, 1, K - 1 - lp, max(rp_t, 0))
    if dx.shape[1] > x.shape[1]:
        dx = dx[:, : x.shape[1]]
    elif dx.shape[1] < x.shape[1]:
        dx = jnp.pad(dx, ((0, 0), (0, x.shape[1] - dx.shape[1]), (0, 0)))
    dw = _wgrad(x, dy, (K, C, CO), F, stride, lp, rp).astype(w.dtype)
    return dx, dw


time_conv.defvjp(_time_conv_fwd_rule, _time_conv_bwd_rule)


def time_conv_reference(x, w, F, stride=1, pads=(0, 0)):
    """jnp reference implementation (tests; CPU fallback path)."""
    B, T, D = x.shape
    K, C, CO = w.shape
    xp = jnp.pad(x, ((0, 0), pads, (0, 0))).reshape(B, -1, F, C)
    Tout = (xp.shape[1] - K) // stride + 1
    idx = jnp.arange(Tout) * stride
    out = jnp.zeros((B, Tout, F, CO), jnp.float32)
    for k in range(K):
        out = out + jnp.einsum(
            "btfc,cd->btfd", xp[:, idx + k].astype(jnp.float32),
            w[k].astype(jnp.float32))
    return out.reshape(B, Tout, F * CO).astype(x.dtype)
