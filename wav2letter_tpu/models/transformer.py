"""Transformer and Conformer encoder layers (arch mnemonics ``TR``/``CFR``).

Semantics match the reference's in-repo fork ``cpc/TransformerCPC.cpp``:
  * wq/wk/wv: modelDim -> headDim*nHeads, init U(±0.707·sqrt(6/(in+out)));
    q scaled by 1/sqrt(headDim).
  * relative position embedding: param (2·bptt, headDim) added to attention
    scores exactly as upstream's rotate trick does — bias[i,j] =
    q_i·P[(j-i)+bptt], zero beyond ±bptt (``TransformerCPC.cpp:123-127``;
    see ``_rel_position_bias``).
  * pad mask: log(valid) added to scores (``:135-143``).
  * layerdrop: whole-layer Bernoulli scale f∈{0,1} (``:168-171``).
  * preLN variant (reference ``preLN_``): h = f·LN1(attn(x)) + x;
    out = f·LN2(mlp(h)) + h — note LN on the sublayer *output* (``:172-178``).
    postLN: h = LN1(f·attn(x) + x); out = LN2(f·mlp(h) + h).
  * MLP: w2(relu(w1(x))) — the fork disables inner dropout (``:96-100``).
  * LayerNorm over the feature axis with scalar affine (AF dims {0,3}).

Operates on stored (…, T, C) activations (AF (C, T, B, 1) reversed), i.e.
attention over axis -2 — batched matmuls on the MXU, masks fused by XLA.

Conformer follows fl::Conformer's structure (macaron FFN halves, MHSA with
the same relative bias, depthwise conv module with swish), per the Conformer
paper; reference constructor at ``SequentialBuilder.cpp:160-180``.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .layers import Dropout, LayerNorm

Array = jnp.ndarray


def _tf_linear_init(gain=1.0):
    def init(key, shape):
        in_dim, out_dim = shape[0], shape[1]
        std = gain * math.sqrt(6.0 / (in_dim + out_dim))
        return jax.random.uniform(key, shape, jnp.float32, -std, std)

    return init


def _tf_bias_init(in_dim, zero=False):
    def init(key, shape):
        std = 0.0 if zero else math.sqrt(1.0 / in_dim)
        return jax.random.uniform(key, shape, jnp.float32, -std, std)

    return init


class TFLinear(nn.Module):
    in_dim: int
    out_dim: int
    gain: float = 1.0
    zero_bias: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", _tf_linear_init(self.gain), (self.in_dim, self.out_dim))
        b = self.param("bias", _tf_bias_init(self.in_dim, self.zero_bias), (self.out_dim,))
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


def _rel_shift(b: Array, T: int) -> Array:
    """Transformer-XL relative shift: b (..., T, 2T-1) -> (..., T, T)
    with out[..., i, j] = b[..., i, (j - i) + T - 1], for T <= bptt.

    Pure slice/pad/reshape — no gather. Derivation: with
    out[i, j] = b[i, j - i + T - 1], realize the per-row -i shift by
    flattening, dropping the first T-1 elements, and reshaping to rows of
    stride 2T-2 (out[i, j] = flat[i·(2T-2) + j]).
    """
    if T == 1:
        return b
    lead = b.shape[:-2]
    flat = b.reshape(lead + (T * (2 * T - 1),))[..., T - 1 : T - 1 + T * (2 * T - 2)]
    return flat.reshape(lead + (T, 2 * T - 2))[..., :T]


def _rel_position_bias(q: Array, pos_emb: Array, bptt: int) -> Array:
    """q (..., H, T, Dh), pos_emb (2·bptt, Dh) -> bias (..., H, T, T).

    Upstream-exact semantics (fl multiheadAttention's
    relativePositionEmbeddingRotate over a (2·bptt, headDim) table,
    ``TransformerCPC.cpp:123-127`` → flashlight Functions.cpp): the rotate
    trick computes bias[i, j] = q_i · pos_emb[(j - i) + bptt] for
    j - i ∈ [-bptt, bptt-1] and **zero** outside that window (positions
    further than bptt away get no bias — not a clamped one).

    Realized when T <= bptt as a (T, 2T-1) matmul (MXU) against only the
    reachable window of the table — relative offsets span just
    [-(T-1), T-1], i.e. rows bptt-T+1 .. bptt+T-1; contracting against the
    full 2·bptt table wastes (2·bptt-2T+1)/(2·bptt) of the matmul (59% at
    the sota/2019 T=188, bptt=460 shapes) — followed by the relative shift
    (layout ops only; the zero region is unreachable there, so the shift
    is exact). Masked-gather fallback for T > bptt.
    """
    T = q.shape[-2]
    if T <= bptt:
        win = pos_emb[bptt - T + 1 : bptt + T]  # (2T-1, Dh): offsets -(T-1)..T-1
        qp = jnp.einsum("...td,rd->...tr", q, win.astype(q.dtype))
        return _rel_shift(qp, T)
    qp = jnp.einsum("...td,rd->...tr", q, pos_emb.astype(q.dtype))  # (...,T,2bptt)
    rel = np.arange(T)[None, :] - np.arange(T)[:, None]  # j - i
    valid = (rel >= -bptt) & (rel <= bptt - 1)  # outside the table -> 0 bias
    idx = np.clip(rel + bptt, 0, 2 * bptt - 1)  # (T,T) in [0, 2bptt)
    # advanced-index gather along the last axis: out[..., i, j] = qp[..., i, idx[i, j]]
    i_idx = jnp.asarray(np.arange(T)[:, None])
    out = qp[..., i_idx, jnp.asarray(idx)]
    return jnp.where(jnp.asarray(valid), out, jnp.zeros((), out.dtype))


def _fused_attn_mode() -> str:
    """'1' (default: on for TPU), '0' (off), 'force' (on everywhere,
    interpret-mode off-TPU — for tests exercising the fused branch)."""
    import os

    return os.environ.get("W2L_FUSED_ATTN", "1")


class MultiHeadSelfAttention(nn.Module):
    model_dim: int
    head_dim: int
    n_heads: int
    bptt: int = 0
    dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        x: Array,  # (..., T, C)
        pad_mask: Optional[Array] = None,  # (..., T) True=valid
        train: bool = False,
    ) -> Array:
        H, Dh = self.n_heads, self.head_dim
        T = x.shape[-2]
        q = TFLinear(self.model_dim, H * Dh, 0.707, name="wq")(x)
        k = TFLinear(self.model_dim, H * Dh, 0.707, name="wk")(x)
        v = TFLinear(self.model_dim, H * Dh, 0.707, name="wv")(x)

        pos_emb = None
        if self.bptt > 0:
            pos_emb = self.param(
                "pos_emb",
                lambda key, s: jax.random.uniform(key, s, jnp.float32, -0.1, 0.1),
                (2 * self.bptt, Dh),
            )

        # fused Pallas path (ops/pallas/attention.py): rel-pos shear, mask,
        # softmax, dropout and both attention matmuls in one VMEM kernel;
        # heads stay as column blocks (no split/merge copies). Covers the
        # training/eval encoder case: non-causal, rel-pos window reachable
        # (T <= bptt), batched (B, T, C) input on a TPU device.
        mode = _fused_attn_mode()
        is_tpu = jax.devices()[0].platform in ("tpu", "axon")
        # multi-chip: GSPMD can't partition the Pallas custom call itself,
        # but shard_map over the training mesh runs it per-shard (data axis
        # on batch; model axis on head blocks when heads divide)
        from ..parallel.mesh import current_mesh

        mesh = current_mesh() if jax.device_count() > 1 else None
        on_tpu = is_tpu and (jax.device_count() == 1 or mesh is not None)
        if (
            (mode == "force" or (mode != "0" and on_tpu))
            and not self.causal
            and pos_emb is not None
            and T <= self.bptt
            and x.ndim >= 3
        ):
            from ..ops.pallas.attention import fused_mhsa, fused_mhsa_shardable

            rate = self.dropout if train else 0.0
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), 0, np.int32(2**31 - 1),
                    dtype=jnp.int32,
                )
            win = pos_emb[self.bptt - T + 1 : self.bptt + T]
            if pad_mask is not None:
                mask_bias = jnp.where(pad_mask, 0.0, -1e30).astype(jnp.float32)
                mask_bias = jnp.broadcast_to(mask_bias, x.shape[:-1])
            else:
                mask_bias = jnp.zeros(x.shape[:-1], jnp.float32)
            lead = x.shape[:-2]  # flatten leading dims: archs reach TR 4-d
            nb = int(np.prod(lead)) if lead else 1
            args = (
                (q / math.sqrt(Dh)).reshape(nb, T, H * Dh),
                k.reshape(nb, T, H * Dh), v.reshape(nb, T, H * Dh),
                win, mask_bias.reshape(nb, T).astype(jnp.float32), H,
            )
            kw = dict(dropout_rate=rate, seed=seed, interpret=not is_tpu)
            if mode == "force" and jax.device_count() > 1 and mesh is None:
                from ..parallel.mesh import make_mesh

                mesh = make_mesh()  # tests: all-data mesh over all devices
            out = (fused_mhsa_shardable(mesh, *args, **kw)
                   if mesh is not None else fused_mhsa(*args, **kw))
            if out is not None:
                out = out.reshape(x.shape[:-1] + (H * Dh,))
                return TFLinear(H * Dh, self.model_dim, 1.0, True,
                                name="wf")(out)
            # shapes didn't divide the mesh: fall through to the XLA path

        def split(a):  # (..., T, H*Dh) -> (..., H, T, Dh)
            a = a.reshape(a.shape[:-1] + (H, Dh))
            return jnp.moveaxis(a, -2, -3)

        q, k, v = split(q), split(k), split(v)
        q = q / math.sqrt(Dh)
        scores = jnp.einsum("...td,...sd->...ts", q, k)  # (..., H, T, T)
        if pos_emb is not None:
            scores = scores + _rel_position_bias(q, pos_emb, self.bptt)
        neg = jnp.asarray(-1e30, scores.dtype)
        if self.causal and T > 1:
            cm = np.tril(np.ones((T, T), bool))
            scores = jnp.where(jnp.asarray(cm), scores, neg)
        if pad_mask is not None:
            pm = pad_mask[..., None, None, :]  # (..., 1, 1, T) over keys
            scores = jnp.where(pm, scores, neg)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = Dropout(self.dropout, name="attn_do")(attn, train=train)
        out = jnp.einsum("...ts,...sd->...td", attn, v)  # (..., H, T, Dh)
        out = jnp.moveaxis(out, -3, -2).reshape(x.shape[:-1] + (H * Dh,))
        return TFLinear(H * Dh, self.model_dim, 1.0, True, name="wf")(out)


class TransformerLayer(nn.Module):
    """Arch ``TR modelDim mlpDim nHead csz pDrop [pLayerdrop] [preLN] [futureMask]``."""

    model_dim: int
    mlp_dim: int
    n_heads: int
    bptt: int
    dropout: float = 0.0
    layerdrop: float = 0.0
    pre_ln: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, train: bool = False) -> Array:
        head_dim = self.model_dim // self.n_heads
        attn = MultiHeadSelfAttention(
            self.model_dim, head_dim, self.n_heads, self.bptt, self.dropout,
            self.causal, name="attn",
        )
        ln1 = LayerNorm((0, 3), name="norm1")
        ln2 = LayerNorm((0, 3), name="norm2")

        f = 1.0
        if train and self.layerdrop > 0:
            drop = jax.random.bernoulli(self.make_rng("dropout"), self.layerdrop)
            f = jnp.where(drop, 0.0, 1.0).astype(x.dtype)

        def mlp(h):
            y = TFLinear(self.model_dim, self.mlp_dim, name="w1")(h)
            y = jnp.maximum(y, 0)
            return TFLinear(self.mlp_dim, self.model_dim, name="w2")(y)

        a = attn(x, pad_mask=mask, train=train)
        a = Dropout(self.dropout, name="do1")(a, train=train)
        if self.pre_ln:
            h = f * ln1(a) + x
            m = Dropout(self.dropout, name="do2")(mlp(h), train=train)
            return f * ln2(m) + h
        h = ln1(f * a + x)
        m = Dropout(self.dropout, name="do2")(mlp(h), train=train)
        return ln2(f * m + h)


class ConformerLayer(nn.Module):
    """Arch ``CFR modelDim mlpDim nHead csz kernel pDrop [pLayerdrop]``."""

    model_dim: int
    mlp_dim: int
    n_heads: int
    bptt: int
    conv_kernel: int
    dropout: float = 0.0
    layerdrop: float = 0.0
    conv_norm: str = "layernorm"  # "layernorm" (masked-safe) | "batchnorm" (paper)

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None, train: bool = False) -> Array:
        C = self.model_dim
        head_dim = C // self.n_heads

        def ffn(h, name):
            h = LayerNorm((0, 3), name=f"{name}_ln")(h)
            h = TFLinear(C, self.mlp_dim, name=f"{name}_w1")(h)
            h = h * jax.nn.sigmoid(h)  # swish
            h = Dropout(self.dropout, name=f"{name}_do1")(h, train=train)
            h = TFLinear(self.mlp_dim, C, name=f"{name}_w2")(h)
            return Dropout(self.dropout, name=f"{name}_do2")(h, train=train)

        f = 1.0
        if train and self.layerdrop > 0:
            drop = jax.random.bernoulli(self.make_rng("dropout"), self.layerdrop)
            f = jnp.where(drop, 0.0, 1.0).astype(x.dtype)

        x = x + f * 0.5 * ffn(x, "ffn1")
        a = MultiHeadSelfAttention(
            C, head_dim, self.n_heads, self.bptt, self.dropout, name="attn"
        )(LayerNorm((0, 3), name="attn_ln")(x), pad_mask=mask, train=train)
        x = x + f * Dropout(self.dropout, name="attn_do")(a, train=train)
        x = x + f * self._conv_module(x, mask, train)
        x = x + f * 0.5 * ffn(x, "ffn2")
        return LayerNorm((0, 3), name="final_ln")(x)

    def _conv_module(self, x: Array, mask, train: bool) -> Array:
        C, K = self.model_dim, self.conv_kernel
        h = LayerNorm((0, 3), name="conv_ln")(x)
        if mask is not None:
            h = h * mask[..., None].astype(h.dtype)
        h = TFLinear(C, 2 * C, name="conv_pw1")(h)
        a, b = jnp.split(h, 2, axis=-1)
        h = a * jax.nn.sigmoid(b)  # GLU
        # depthwise conv over time: (..., T, C); pad SAME
        dw = self.param(
            "conv_dw",
            lambda key, s: jax.random.normal(key, s, jnp.float32)
            * math.sqrt(2.0 / K),
            (K, C),
        )
        lead = h.shape[:-2]
        T = h.shape[-2]
        hh = h.reshape((-1, T, C))
        pad = ((K - 1) // 2, K - 1 - (K - 1) // 2)
        y = jax.lax.conv_general_dilated(
            hh,
            dw.astype(hh.dtype)[:, None, :],  # (K, 1, C) HIO
            window_strides=(1,),
            padding=(pad,),
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=C,
        )
        h = y.reshape(lead + (T, C))
        if self.conv_norm == "batchnorm":
            h = self._masked_batchnorm(h, mask, train)  # Conformer-paper BN
        else:
            h = LayerNorm((0, 3), name="conv_bn")(h)  # LN default (masked-safe)
        h = h * jax.nn.sigmoid(h)
        h = TFLinear(C, C, name="conv_pw2")(h)
        return Dropout(self.dropout, name="conv_do")(h, train=train)

    def _masked_batchnorm(self, h: Array, mask, train: bool,
                          momentum: float = 0.9, eps: float = 1e-5) -> Array:
        """Per-channel BatchNorm over valid (batch, time) positions only —
        the Conformer paper's conv-module norm, made pad-mask-correct so
        padded frames don't pollute the batch statistics."""
        C = h.shape[-1]
        w = self.param("conv_bn_weight", lambda k, s: jnp.ones(s, jnp.float32), (C,))
        b = self.param("conv_bn_bias", lambda k, s: jnp.zeros(s, jnp.float32), (C,))
        ra_mean = self.variable("batch_stats", "conv_bn_mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "conv_bn_var",
                               lambda: jnp.ones((C,), jnp.float32))
        hf = h.astype(jnp.float32)
        red = tuple(range(h.ndim - 1))
        use_batch_stats = train or self.is_initializing()
        if use_batch_stats:
            if mask is not None:
                m = mask[..., None].astype(jnp.float32)
                cnt = jnp.maximum(m.sum(axis=red), 1.0)
                mean = (hf * m).sum(axis=red) / cnt
                var = (jnp.square(hf - mean) * m).sum(axis=red) / cnt
            else:
                mean = hf.mean(axis=red)
                var = hf.var(axis=red)
            if not self.is_initializing():
                ra_mean.value = momentum * ra_mean.value + (1 - momentum) * mean
                ra_var.value = momentum * ra_var.value + (1 - momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (hf - mean) * jax.lax.rsqrt(var + eps) * w + b
        return y.astype(h.dtype)
