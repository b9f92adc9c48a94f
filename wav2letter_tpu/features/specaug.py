"""SpecAugment — on-device, functional, static-shape.

Reference: arch-level ``SAUG F mF T p mT`` layer
(``cpc/SequentialBuilder.cpp:602-613``, e.g.
``recipes/streaming_convnets/librispeech/am_500ms_future_context.arch:2``)
and flag-driven ``--saug_*`` (``recipes/mls/train/english.cfg:23-28``).

Semantics (SpecAugment paper / flashlight impl): for each utterance draw
``n_freq_masks`` frequency masks of width U(0, F) and ``n_time_masks`` time
masks of width U(0, T) additionally capped at ``p * T_utt``; masked cells are
replaced with zero (flashlight uses mean? — it uses zero after log-mel, see
golden tests). All sampling happens on-device from a PRNG key so the op is
jittable and reproducible.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SpecAugment:
    n_freq_masks: int = 2
    freq_mask_f: int = 27
    n_time_masks: int = 2
    time_mask_t: int = 100
    time_mask_p: float = 1.0
    mask_value: float = 0.0

    def __call__(
        self,
        feats: jnp.ndarray,  # (B, T, C)
        rng: jax.Array,
        feat_len: Optional[jnp.ndarray] = None,  # (B,)
    ) -> jnp.ndarray:
        B, T, C = feats.shape
        if feat_len is None:
            feat_len = jnp.full((B,), T, jnp.int32)

        def mask_one(x, length, key):
            keys = jax.random.split(key, 2 * (self.n_freq_masks + self.n_time_masks))
            ki = 0
            mask = jnp.ones((T, C), bool)
            c_idx = jnp.arange(C)
            t_idx = jnp.arange(T)
            for _ in range(self.n_freq_masks):
                w = jax.random.randint(keys[ki], (), 0, self.freq_mask_f + 1)
                ki += 1
                start = jax.random.randint(keys[ki], (), 0, jnp.maximum(1, C - w))
                ki += 1
                m = (c_idx >= start) & (c_idx < start + w)
                mask = mask & ~m[None, :]
            max_t = jnp.minimum(
                self.time_mask_t,
                (self.time_mask_p * length).astype(jnp.int32),
            )
            for _ in range(self.n_time_masks):
                w = jax.random.randint(keys[ki], (), 0, jnp.maximum(1, max_t + 1))
                ki += 1
                start = jax.random.randint(
                    keys[ki], (), 0, jnp.maximum(1, length - w)
                )
                ki += 1
                m = (t_idx >= start) & (t_idx < start + w)
                mask = mask & ~m[:, None]
            return jnp.where(mask, x, jnp.asarray(self.mask_value, x.dtype))

        keys = jax.random.split(rng, B)
        return jax.vmap(mask_one)(feats, feat_len, keys)
