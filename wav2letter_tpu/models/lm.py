"""Neural LM models from arch files (GCNN / transformer LMs).

Reference LM archs (``recipes/sota/2019/lm/*.arch``) declare input AF layout
``(t, b, 1, 1)`` and embed with ``E`` — this wrapper adapts (B, L) token ids
to that layout, runs the arch stack, and emits (B, L, D) features plus an
optional tied/untied vocab projection, so the same `.arch` files train and
decode here (ConvLM path). The reference trained these in fairseq and
converted (``recipes/utilities/convlm_serializer``); we both train natively
(cli/train_lm.py) and import torch checkpoints (tools/convlm_import.py).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .arch import ArchSequential, LayerSpec, parse_arch_file, parse_arch_lines


class LMArchModel(nn.Module):
    """(B, L) int32 token ids -> (B, L, vocab) logits."""

    specs: Tuple[LayerSpec, ...]
    vocab_size: int
    out_dim: int  # arch output feature dim; == vocab_size -> no extra proj

    @nn.compact
    def __call__(self, ids: jnp.ndarray, lengths=None, train: bool = False):
        B, L = ids.shape
        # AF (L, B, 1, 1) == stored (1, 1, B, L)
        x = ids.reshape(1, 1, B, L)
        y = ArchSequential(self.specs, name="seq")(x, None, train)
        # arch output AF (D, L, B, 1) == stored (1, B, L, D) (after final RO/V
        # lines; archs that skip the final reorder give (B?, L, D)-compatible
        # shapes — canonicalize by size)
        total = y.size
        D = total // (B * L)
        y = y.reshape(B, L, D) if y.shape[0] in (B, 1) else y.reshape(B, L, D)
        if D != self.vocab_size:
            y = nn.Dense(self.vocab_size, name="vocab_proj")(
                y.astype(jnp.float32)
            )
        return y, lengths


def build_lm_model(arch_path: str, vocab_size: int) -> LMArchModel:
    lines = parse_arch_file(arch_path, n_feat=vocab_size, n_label=vocab_size)
    specs = tuple(parse_arch_lines(lines))
    # best-effort: inspect the last L line for the arch output dim
    out_dim = vocab_size
    for l in reversed(lines):
        t = l.split()
        if t[0] in ("L", "WN") and "L" in t[:3]:
            out_dim = int(t[-1]) if t[0] == "L" else int(t[-1])
            break
    return LMArchModel(specs, vocab_size, out_dim)


class AdaptiveSoftmax(nn.Module):
    """Adaptive softmax head (Grave et al.): head cluster = [0, c1) plus one
    gate per tail cluster; tails project down by 4^i. Provides
    ``log_probs(h)`` (full vocab, for ConvLM decoding — the reference's
    convlm_serializer flattens exactly this structure) and ``nll`` for
    training without materializing the full softmax.
    """

    in_dim: int
    cutoffs: Sequence[int]  # ascending, last == vocab size

    def setup(self):
        c = list(self.cutoffs)
        n_tails = len(c) - 1
        self.head = nn.Dense(c[0] + n_tails, name="head")
        self.tails = [
            nn.Sequential(
                [
                    nn.Dense(max(1, self.in_dim // (4 ** (i + 1))), name=None),
                    nn.Dense(c[i + 1] - c[i], name=None),
                ]
            )
            for i in range(n_tails)
        ]

    def log_probs(self, h: jnp.ndarray) -> jnp.ndarray:
        """(..., D) -> (..., V) full log-probs."""
        c = list(self.cutoffs)
        head = jax.nn.log_softmax(self.head(h).astype(jnp.float32), axis=-1)
        parts = [head[..., : c[0]]]
        for i, tail in enumerate(self.tails):
            gate = head[..., c[0] + i : c[0] + i + 1]
            tp = jax.nn.log_softmax(tail(h).astype(jnp.float32), axis=-1)
            parts.append(gate + tp)
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        return self.log_probs(h)


def lm_cross_entropy(
    logits: jnp.ndarray,  # (B, L, V) — predictions for positions 1..L
    ids: jnp.ndarray,  # (B, L) inputs; targets are ids shifted left
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Next-token CE per sample (sum over positions)."""
    B, L, V = logits.shape
    tgt = ids[:, 1:]
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    if lengths is not None:
        valid = jnp.arange(L - 1)[None, :] < (lengths[:, None] - 1)
        nll = jnp.where(valid, nll, 0.0)
    return nll.sum(axis=-1)
