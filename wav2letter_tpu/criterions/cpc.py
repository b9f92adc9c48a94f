"""CPC / wav2vec2-style masked contrastive criterion.

Reimplements the in-repo reference ``cpc/CPCCriterion.{h,cpp}`` (spans:
mask generation ``CPCCriterion.cpp:87-130``, negative sampling ``:139-171``,
InfoNCE forward ``:177-223``):

  * learned mask embedding (param, dim nEncoder) replaces masked frames;
  * masks: ``mask_prob * T`` random span starts per utterance, each extended
    to ``mask_length`` frames (alternating-shift construction), then
    restricted to the same count per batch row (static shapes on TPU: we
    select exactly K masked positions per row via random top-K);
  * loss: for each masked position, anchor = L2-normed W_ctx(context),
    positive = L2-normed W_enc(encoder), negatives = nNegative random other
    masked positions of the same utterance; InfoNCE with temperature.

TPU design: everything is batched with static K (no per-row where());
gathers + one (B, K, 1+nNeg) logit tensor; runs entirely on device.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class CPCConfig:
    n_encoder: int = 256  # codedim
    n_context: int = 256  # contextdim
    n_mutual: int = 256  # mutualdim
    n_negative: int = 100
    temperature: float = 0.1
    mask_prob: float = 0.065
    mask_length: int = 10
    n_buffer: int = 1  # exclusion window around the anchor position

    @classmethod
    def from_flags(cls, cfg) -> "CPCConfig":
        return cls(
            n_encoder=cfg.get("codedim", 256),
            n_context=cfg.get("contextdim", 256),
            n_mutual=cfg.get("mutualdim", 256),
            n_negative=cfg.get("nnegativesamples", 100),
            temperature=cfg.get("temperature", 0.1),
            mask_prob=cfg.get("maskprob", 0.065),
            mask_length=cfg.get("masklength", 10),
        )


class CPCCriterion(nn.Module):
    cfg: CPCConfig

    def setup(self):
        c = self.cfg
        self.mask_embedding = self.param(
            "mask_embedding",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -1.0, 1.0),
            (c.n_encoder,),
        )
        self.mutual_enc = nn.Dense(c.n_mutual, name="mutual_enc")
        self.mutual_ctx = nn.Dense(c.n_mutual, name="mutual_ctx")

    # ------------------------------------------------------------------
    def make_mask(self, rng: jax.Array, B: int, T: int) -> Tuple[Array, Array]:
        """Returns (mask (B,T) bool, mask_idx (B,K) int32) with K static.

        K = floor(mask_prob*T)*mask_length capped at T (every row gets
        exactly K masked positions — the reference's min-across-batch
        restriction made static).
        """
        c = self.cfg
        n_starts = max(1, int(c.mask_prob * T))
        k_start, k_sel = jax.random.split(rng)
        starts = jax.random.randint(k_start, (B, n_starts), 0, T)
        t_idx = jnp.arange(T)[None, None, :]
        span = (t_idx >= starts[..., None]) & (t_idx < starts[..., None] + c.mask_length)
        mask = jnp.any(span, axis=1)  # (B, T)
        K = min(T, n_starts * c.mask_length)
        # pick exactly K masked positions per row: random scores, masked
        # positions first (+1 bias), top-K. Rows with fewer than K masked
        # positions pad with unmasked ones (still valid anchors).
        scores = jax.random.uniform(k_sel, (B, T)) + mask.astype(jnp.float32)
        _, idx = jax.lax.top_k(scores, K)
        sel = jnp.zeros((B, T), bool).at[jnp.arange(B)[:, None], idx].set(True)
        return sel, idx.astype(jnp.int32)

    def apply_mask(self, features: Array, mask: Array) -> Array:
        """Replace masked frames with the learned embedding.
        features (B, T, C_enc), mask (B, T) bool."""
        emb = self.mask_embedding.astype(features.dtype)
        return jnp.where(mask[..., None], emb[None, None, :], features)

    # ------------------------------------------------------------------
    def __call__(
        self,
        enc_out: Array,  # (B, T, C_enc) unmasked encoder output (targets)
        context: Array,  # (B, T, C_ctx) context network output (masked input)
        mask_idx: Array,  # (B, K) masked positions
        rng: jax.Array,
    ) -> Array:
        """Per-utterance InfoNCE loss (mean over masked positions)."""
        c = self.cfg
        B, T, _ = enc_out.shape
        K = mask_idx.shape[1]
        take = lambda x: jnp.take_along_axis(x, mask_idx[..., None], axis=1)
        anchor = self.mutual_ctx(take(context).astype(jnp.float32))  # (B,K,M)
        pos = self.mutual_enc(take(enc_out).astype(jnp.float32))  # (B,K,M)
        anchor = anchor / (jnp.linalg.norm(anchor, axis=-1, keepdims=True) + 1e-8)
        pos = pos / (jnp.linalg.norm(pos, axis=-1, keepdims=True) + 1e-8)

        # negatives: for each (b, k): nNeg other positions among this row's
        # masked set, excluding a +-n_buffer window around k (reference
        # min/max-window exclusion, CPCCriterion.cpp:150-158)
        nneg = min(c.n_negative, K)
        kk = jnp.arange(K)
        lo = jnp.minimum(K, 1 + c.n_buffer + kk)  # (K,)
        hi = jnp.maximum(K, K - c.n_buffer + kk)
        span = hi - lo
        r = jax.random.randint(rng, (B, K, nneg), 0, 1 << 30)
        neg_pos = (lo[None, :, None] + r % span[None, :, None]) % K  # (B,K,nneg)
        negs = jnp.take_along_axis(
            pos[:, None, :, :].repeat(K, axis=1),
            neg_pos[..., None].repeat(pos.shape[-1], axis=-1),
            axis=2,
        )  # (B, K, nneg, M)

        pos_logit = jnp.sum(anchor * pos, axis=-1, keepdims=True) / c.temperature
        neg_logit = jnp.einsum("bkm,bknm->bkn", anchor, negs) / c.temperature
        logits = jnp.concatenate([pos_logit, neg_logit], axis=-1)  # (B,K,1+n)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -logp[..., 0].mean(axis=-1)  # (B,)


class MTLLoss(nn.Module):
    """Language-ID auxiliary classifier loss, keyed by a per-sample language
    id (reference ``cpc/MTLLoss.{h,cpp}``: sampleid suffix ``#lang`` mapped
    to a class; mean-pooled context features -> linear -> CE)."""

    n_langs: int
    in_dim: int

    @nn.compact
    def __call__(
        self,
        context: Array,  # (B, T, C)
        ctx_len: Array,  # (B,)
        lang_ids: Array,  # (B,) int32, -1 = no label (loss 0)
    ) -> Array:
        t_idx = jnp.arange(context.shape[1])[None, :, None]
        m = (t_idx < ctx_len[:, None, None]).astype(context.dtype)
        pooled = (context * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)
        logits = nn.Dense(self.n_langs, name="lid_head")(pooled.astype(jnp.float32))
        logp = jax.nn.log_softmax(logits, axis=-1)
        safe = jnp.where(lang_ids < 0, 0, lang_ids)
        nll = -jnp.take_along_axis(logp, safe[:, None], axis=1)[:, 0]
        return jnp.where(lang_ids < 0, 0.0, nll)
