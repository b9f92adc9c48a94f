"""CTC criterion module (reference ``CTCLoss(scalemode)``,
``cpc/Train.cpp:524-525``; blank appended last per ``:409-412``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.ctc import ctc_loss, ctc_viterbi
from .base import CriterionScaleMode, scale_losses


class CTCCriterion(nn.Module):
    n_classes: int
    scale_mode: CriterionScaleMode = CriterionScaleMode.NONE

    @nn.compact
    def __call__(
        self,
        emissions: jnp.ndarray,  # (B, T, N)
        targets: jnp.ndarray,  # (B, U), -1 padded
        emis_len: jnp.ndarray,
        target_len: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        losses = ctc_loss(emissions, targets, emis_len, target_len)
        return scale_losses(losses, self.scale_mode, emis_len, target_len)

    def viterbi_path(self, params, emissions, emis_len=None):
        return ctc_viterbi(emissions, emis_len)

    @property
    def blank_idx(self) -> int:
        return self.n_classes - 1
