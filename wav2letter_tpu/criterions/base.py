"""Criterion scale modes (reference ``getCriterionScaleMode(onorm, sqnorm)``,
``cpc/Train.cpp:467``; flags ``--onorm none|target|input --sqnorm``)."""

from __future__ import annotations

import enum

import jax.numpy as jnp


class CriterionScaleMode(enum.Enum):
    NONE = "none"
    TARGET_SZ = "target"
    TARGET_SZ_SQRT = "target_sqrt"
    INPUT_SZ = "input"
    INPUT_SZ_SQRT = "input_sqrt"


def get_scale_mode(onorm: str, sqnorm: bool) -> CriterionScaleMode:
    if onorm == "none":
        return CriterionScaleMode.NONE
    if onorm == "target":
        return CriterionScaleMode.TARGET_SZ_SQRT if sqnorm else CriterionScaleMode.TARGET_SZ
    if onorm == "input":
        return CriterionScaleMode.INPUT_SZ_SQRT if sqnorm else CriterionScaleMode.INPUT_SZ
    raise ValueError(f"unknown onorm: {onorm}")


def scale_losses(
    losses: jnp.ndarray,
    mode: CriterionScaleMode,
    input_len: jnp.ndarray,
    target_len: jnp.ndarray,
) -> jnp.ndarray:
    tl = jnp.maximum(target_len.astype(jnp.float32), 1.0)
    il = jnp.maximum(input_len.astype(jnp.float32), 1.0)
    if mode == CriterionScaleMode.NONE:
        return losses
    if mode == CriterionScaleMode.TARGET_SZ:
        return losses / tl
    if mode == CriterionScaleMode.TARGET_SZ_SQRT:
        return losses / jnp.sqrt(tl)
    if mode == CriterionScaleMode.INPUT_SZ:
        return losses / il
    if mode == CriterionScaleMode.INPUT_SZ_SQRT:
        return losses / jnp.sqrt(il)
    raise ValueError(mode)
