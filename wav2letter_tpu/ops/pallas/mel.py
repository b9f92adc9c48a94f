"""Fused MFSC frontend as a Pallas TPU kernel.

One kernel computes, per (batch row, time tile): windowed-DFT via two MXU
matmuls (frames @ cos, frames @ sin), magnitude, mel projection (third
matmul), and log — fusing what the XLA path expresses as separate HLOs and
keeping the frame tile resident in VMEM across all three contractions.

Grid: (B, T_tiles). Each program loads a (TILE_T, frame_samples) strided
frame block (built by the caller as a framed view — framing itself is a
gather XLA does well), and writes (TILE_T, n_mels).

The XLA path in ``features/frontend.py`` remains the reference; the two are
tested to agree (bit-identical on TPU). Falls back transparently when Pallas
TPU lowering is unavailable (interpret mode on CPU tests).

Measured on v5e (B=32 x 15 s audio, 80 mels): XLA path 2.9 ms vs this
kernel 5.0 ms — XLA's global fusion over the flattened (B*T) frame rows
beats the per-(batch, tile) grid here, so the XLA path stays the default;
this kernel documents the Pallas recipe and serves as the starting point
for a fully-fused (framing + frontend + SpecAugment) kernel where the
gather currently materialized in HBM is the remaining win.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_T = 128


def _mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, mel_floor):
    frames = frames_ref[0]  # (TILE_T, FS)
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(jnp.maximum(re * re + im * im, 1e-20))
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, mel_floor))


@functools.partial(jax.jit, static_argnames=("mel_floor", "interpret"))
def pallas_mfsc(
    frames: jnp.ndarray,  # (B, T, FS) pre-framed, pre-emphasized audio
    cos_mat: jnp.ndarray,  # (FS, K) window-folded cos DFT
    sin_mat: jnp.ndarray,  # (FS, K)
    mel_fb: jnp.ndarray,  # (K, M)
    mel_floor: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    B, T, FS = frames.shape
    K = cos_mat.shape[1]
    M = mel_fb.shape[1]
    t_tiles = -(-T // TILE_T)
    T_pad = t_tiles * TILE_T
    if T_pad != T:
        frames = jnp.pad(frames, ((0, 0), (0, T_pad - T), (0, 0)))
    grid = (B, t_tiles)
    out = pl.pallas_call(
        functools.partial(_mel_kernel, mel_floor=mel_floor),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, M), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_T, FS), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((FS, K), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FS, K), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, M), lambda b, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_T, M), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, cos_mat, sin_mat, mel_fb)
    return out[:, :T]


_PALLAS_OK: Optional[bool] = None


def pallas_available() -> bool:
    """Probe once whether Pallas TPU lowering works on this backend."""
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            x = jnp.ones((1, 8, 16), jnp.float32)
            c = jnp.ones((16, 8), jnp.float32)
            m = jnp.ones((8, 4), jnp.float32)
            pallas_mfsc(x, c, c, m).block_until_ready()
            _PALLAS_OK = True
        except Exception:
            _PALLAS_OK = False
    return _PALLAS_OK
