"""ASG criterion module. The criterion OWNS the N×N transition matrix as its
parameter 0 (reference: ``StreamingTDSModelConverter.cpp:310-324`` reads
``criterion->param(0)`` as transitions), with optional diagonal init
(``--transdiag``, ``recipes/conv_glu/librispeech/train.cfg``) and linseg
initialization updates (``--linseg``)."""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.asg import asg_loss, asg_viterbi, linseg_loss
from .base import CriterionScaleMode, scale_losses


class ASGCriterion(nn.Module):
    n_classes: int
    scale_mode: CriterionScaleMode = CriterionScaleMode.NONE
    transdiag: float = 0.0
    replabel: int = 0

    def _transitions(self):
        def init(key, shape):
            t = jnp.zeros(shape, jnp.float32)
            if self.transdiag != 0.0:
                t = t + self.transdiag * jnp.eye(self.n_classes, dtype=jnp.float32)
            return t

        return self.param("transitions", init, (self.n_classes, self.n_classes))

    @nn.compact
    def __call__(
        self,
        emissions: jnp.ndarray,
        targets: jnp.ndarray,
        emis_len: jnp.ndarray,
        target_len: jnp.ndarray,
        train: bool = False,
        use_linseg: bool = False,
    ) -> jnp.ndarray:
        trans = self._transitions()
        fn = linseg_loss if use_linseg else asg_loss
        losses = fn(emissions, trans, targets, emis_len, target_len)
        return scale_losses(losses, self.scale_mode, emis_len, target_len)

    def viterbi_path(self, params, emissions, emis_len=None):
        trans = params["params"]["transitions"]
        return asg_viterbi(emissions, trans, emis_len)
