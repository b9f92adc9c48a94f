"""NN layer library implementing the reference `.arch` DSL semantics on TPU.

Coordinate convention — the "reversed ArrayFire" trick
------------------------------------------------------
The reference operates on column-major ArrayFire arrays with dims
``(d0, d1, d2, d3)`` and batch at d3 (speech input ``(T, C, 1, B)``;
constructor inventory at ``cpc/SequentialBuilder.cpp:104-622``). We store the
SAME logical tensor as a row-major JAX array with axes REVERSED:
``stored.shape == (d3, d2, d1, d0)``. Consequences, all exact:

  * AF ``View`` (column-major reshape)  == row-major ``reshape`` of reversed
    target dims.
  * AF ``Reorder(p0..p3)``              == transpose with reversed perm.
  * an op on AF dim ``k``               == the same op on stored axis ``3-k``.
  * AF ``Linear`` (acts on d0)          == dense on the LAST stored axis —
    the natural, MXU-friendly JAX contraction.
  * AF ``Conv2D`` (spatial d0,d1; channels d2; batch d3) == NCHW convolution
    with W = time. XLA re-layouts internally for the TPU conv engine.

So batch is leading, features trailing — idiomatic JAX — while every `.arch`
file in the reference parses and runs unchanged.

Masking: variable-length batches thread a frame-validity mask alongside the
activations (reference: pad-mask forward, ``cpc/SequentialBuilder.cpp:59-81``).
Convs/pools update the mask length arithmetic; transformers consume it.
"""

from __future__ import annotations

import math
import os
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jnp.ndarray


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------
def st_axis(af_dim: int) -> int:
    """AF dim -> stored axis (4-d arrays)."""
    return 3 - af_dim


def conv_out_len(n: int, kernel: int, stride: int, pad_total: int, dil: int = 1) -> int:
    eff = (kernel - 1) * dil + 1
    return (n + pad_total - eff) // stride + 1


def _kaiming_normal(key, shape, fan_in, dtype=jnp.float32):
    std = math.sqrt(2.0 / max(1, fan_in))
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# shape-only transforms
# ---------------------------------------------------------------------------
class View(nn.Module):
    """AF View: column-major reshape; -1 infer, 0 keep input dim size."""

    dims: Tuple[int, int, int, int]

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        af_in = tuple(reversed(x.shape))  # stored -> AF dims
        tgt = []
        for i, d in enumerate(self.dims):
            if d == 0:
                tgt.append(af_in[i] if i < len(af_in) else 1)
            else:
                tgt.append(d)
        # resolve -1
        known = 1
        for d in tgt:
            if d != -1:
                known *= d
        total = int(np.prod(x.shape))
        tgt = [total // known if d == -1 else d for d in tgt]
        return x.reshape(tuple(reversed(tgt)))


class Identity(nn.Module):
    """No-op placeholder (keeps spec indices/param names stable when a
    fusion pass absorbs a parameter-less layer into a neighbor)."""

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        return x


class Reorder(nn.Module):
    perm: Tuple[int, int, int, int]  # AF permutation

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        # AF: out dim i = in dim perm[i]. Stored axis j=3-i takes stored
        # axis 3-perm[i].
        stored_perm = tuple(3 - self.perm[3 - j] for j in range(4))
        return x.transpose(stored_perm)


class Padding(nn.Module):
    value: float
    pads: Tuple[Tuple[int, int], ...]  # per AF dim (before, after)

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        cfg = [(0, 0)] * x.ndim
        for af_dim, (b, a) in enumerate(self.pads):
            if af_dim < x.ndim:
                cfg[st_axis(af_dim)] = (b, a)
        return jnp.pad(x, cfg, constant_values=self.value)


# ---------------------------------------------------------------------------
# core parametric layers
# ---------------------------------------------------------------------------
class Linear(nn.Module):
    """AF Linear: y = W x over AF dim0 == dense on the last stored axis.

    Init matches flashlight Linear: uniform(-1/sqrt(fan_in), 1/sqrt(fan_in)).

    ``in_swap``/``out_swap`` support the Pallas f-major chain layout: params
    stay in the reference C-major (c*F+f) feature order (checkpoint/converter
    compatible) and are re-indexed at apply time when the activation is
    f-major (f*C+c). in_swap/out_swap = (C, F) of the respective side.
    """

    in_dim: int
    out_dim: int
    use_bias: bool = True
    in_swap: Optional[Tuple[int, int]] = None
    out_swap: Optional[Tuple[int, int]] = None

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        bound = 1.0 / math.sqrt(self.in_dim)
        w = self.param(
            "weight",
            lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
            (self.in_dim, self.out_dim),
        )
        if self.in_swap is not None:
            c, f = self.in_swap
            w = w.reshape(c, f, self.out_dim).swapaxes(0, 1).reshape(
                self.in_dim, self.out_dim)
        if self.out_swap is not None:
            c, f = self.out_swap
            w = w.reshape(self.in_dim, c, f).swapaxes(1, 2).reshape(
                self.in_dim, self.out_dim)
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.out_dim,),
            )
            if self.out_swap is not None:
                c, f = self.out_swap
                b = b.reshape(c, f).swapaxes(0, 1).reshape(self.out_dim)
            y = y + b.astype(x.dtype)
        return y


class Conv2D(nn.Module):
    """AF Conv2D on stored NCHW layout (N=d3, C=d2, H=d1, W=d0=time).

    kernel (wx over time, wy over d1), strides/pads/dilation likewise.
    px == -1 means SAME ("half") padding per flashlight ``PaddingMode::SAME``.
    Weight-norm handled by the `wn_dim` option (reference wraps Conv in WN).
    """

    in_ch: int
    out_ch: int
    wx: int
    wy: int = 1
    sx: int = 1
    sy: int = 1
    px: int = 0
    py: int = 0
    dx: int = 1
    dy: int = 1
    groups: int = 1
    use_bias: bool = True
    wn_dim: int = -1  # AF dim for weight norm (3 = output channels) or -1
    # activation layout: "ncft" = stored AF NCHW (default); "ntcf" = the
    # TDS fused-chain layout (B, T, C, F) — the conv runs in place via
    # dimension numbers, so chained blocks avoid full-activation transposes.
    # "btdf" = the Pallas chain layout (B, T, F*C) f-major: the time conv
    # runs as the ops.pallas.tconv kernel entirely in-layout (kills XLA's
    # conv layout copies; see BENCH.md). Params are layout-independent
    # (same OIHW kernel in every mode).
    data_layout: str = "ncft"

    def _pads(self, n_w: int, n_h: int) -> Tuple[Tuple[int, int], Tuple[int, int]]:
        def same(n, k, s, d):
            eff = (k - 1) * d + 1
            out = -(-n // s)
            total = max(0, (out - 1) * s + eff - n)
            return (total // 2, total - total // 2)

        if isinstance(self.px, tuple):
            pw = self.px
        else:
            pw = same(n_w, self.wx, self.sx, self.dx) if self.px == -1 else (self.px, self.px)
        ph = same(n_h, self.wy, self.sy, self.dy) if self.py == -1 else (self.py, self.py)
        return pw, ph

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        # kernel param in AF layout (wx, wy, in/g, out) stored reversed:
        # (out, in/g, wy, wx) == OIHW with H=wy, W=wx.
        fan_in = self.wx * self.wy * self.in_ch // self.groups
        shape = (self.out_ch, self.in_ch // self.groups, self.wy, self.wx)
        if self.wn_dim >= 0:
            v = self.param("v", _kaiming_normal, shape, fan_in)
            g = self.param(
                "g",
                lambda k, s: jnp.linalg.norm(
                    v.reshape(v.shape[0], -1), axis=1
                ).reshape(s),
                (self.out_ch, 1, 1, 1),
            )
            norm = jnp.sqrt(
                jnp.sum(v * v, axis=(1, 2, 3), keepdims=True) + 1e-12
            )
            w = g * v / norm
        else:
            w = self.param("weight", _kaiming_normal, shape, fan_in)
        if self.data_layout == "btdf":
            # x is (B, T, F*in_ch) f-major; pure time conv via the Pallas
            # chain-layout kernel (wy/sy/py/dilation/groups must be trivial —
            # the fusion pass only selects such convs).
            assert (self.wy, self.sy, self.py, self.dx, self.dy,
                    self.groups) == (1, 1, 0, 1, 1, 1), self
            from wav2letter_tpu.ops.pallas import tconv as _tconv

            if x.ndim == 4:  # chain entry from stored (B, C, F, T)
                B, C, F4, T4 = x.shape
                x = x.transpose(0, 3, 2, 1).reshape(B, T4, F4 * C)
            F = x.shape[2] // self.in_ch
            pw = (self.px if isinstance(self.px, tuple)
                  else self._pads(x.shape[1], 1)[0] if self.px == -1
                  else (self.px, self.px))
            wt = w[:, :, 0, :].transpose(2, 1, 0)  # (K, in, out)
            if jax.default_backend() == "tpu":
                y = _tconv.time_conv(x, wt.astype(x.dtype), F, self.sx, pw)
            else:
                y = _tconv.time_conv_reference(
                    x, wt.astype(x.dtype), F, self.sx, pw)
            if self.use_bias:
                bound = 1.0 / math.sqrt(fan_in)
                b = self.param(
                    "bias",
                    lambda k, s: jax.random.uniform(
                        k, s, jnp.float32, -bound, bound),
                    (self.out_ch,),
                )
                y = y + jnp.tile(b.astype(y.dtype), F)
            return y
        if self.data_layout == "ntcf":
            # x is (B, T, C, F): N=0, W(time)=1, C=2, H(freq)=3
            pw, ph = self._pads(x.shape[1], x.shape[3])
            dn = ("NWCH", "OIHW", "NWCH")
        else:
            pw, ph = self._pads(x.shape[3], x.shape[2])
            dn = ("NCHW", "OIHW", "NCHW")
        if (os.environ.get("W2L_PIN_CONV_LAYOUT") == "1"
                and self.data_layout == "ncft"
                and jax.default_backend() == "tpu"):
            # measured layout experiment (VERDICT r1 next#8): pin activations
            # around the conv to XLA's conv-preferred batch-minor layout
            # ({0,1,3,2} == major_to_minor (2,3,1,0) for NCHW) so the
            # neighboring elementwise/LN fusions adopt it instead of
            # round-tripping through row-major copies
            from jax.experimental.layout import Layout, with_layout_constraint

            x = with_layout_constraint(x, Layout(major_to_minor=(2, 3, 1, 0)))
        y = jax.lax.conv_general_dilated(
            x,
            w.astype(x.dtype),
            window_strides=(self.sy, self.sx),
            padding=(ph, pw),
            rhs_dilation=(self.dy, self.dx),
            dimension_numbers=dn,
            feature_group_count=self.groups,
        )
        if self.use_bias:
            bound = 1.0 / math.sqrt(fan_in)
            b = self.param(
                "bias",
                lambda k, s: jax.random.uniform(k, s, jnp.float32, -bound, bound),
                (self.out_ch,),
            )
            bb = b.astype(y.dtype)
            y = y + (bb[None, None, :, None] if self.data_layout == "ntcf"
                     else bb[None, :, None, None])
        return y


class AsymmetricConv1D(nn.Module):
    """Future-context-limited 1-D conv (reference ``AC``,
    ``SequentialBuilder.cpp:270-283``; upstream impl — semantics: of the
    kernel's receptive field, only ``future_px`` fraction may look ahead).

    Padding: total context = wx - 1 (when px == -1/SAME-like); right pad =
    round(future_px * (wx - 1)), left = the rest. With explicit px, total
    pad 2*px is split by the same fraction.
    """

    in_ch: int
    out_ch: int
    wx: int
    sx: int = 1
    px: int = 0
    future_px: float = 1.0
    dx: int = 1
    wn_dim: int = -1

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        total = (self.wx - 1) * self.dx if self.px == -1 else 2 * self.px
        right = int(round(self.future_px * total / (2.0 if self.px != -1 else 1.0)))
        if self.px == -1:
            right = int(round(self.future_px * total))
        left = total - right
        x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (left, right)])
        conv = Conv2D(
            self.in_ch,
            self.out_ch,
            self.wx,
            1,
            self.sx,
            1,
            0,
            0,
            self.dx,
            1,
            wn_dim=self.wn_dim,
            name="conv",
        )
        return conv(x)


class Embedding(nn.Module):
    """AF Embedding: consumes AF dim0 indices, inserts the embedding at the
    new dim0 and shifts dims up (requires AF d3 == 1, i.e. stored leading
    axis 1): AF (d0, d1, d2, 1) -> (emb, d0, d1, d2); stored
    (1, d2, d1, d0) -> (d2, d1, d0, emb). Covers both the speech layout
    (T, 1, 1, B? not used) and the LM layout (L, B, 1, 1)
    (``lm_librispeech_word_gcnn_14B.arch`` header comments)."""

    emb_dim: int
    n_tokens: int

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.1,
            (self.n_tokens, self.emb_dim),
        )
        ids = x.astype(jnp.int32)
        if ids.ndim == 4:
            if ids.shape[0] != 1:
                raise ValueError(
                    f"Embedding needs AF d3 == 1, got stored shape {ids.shape}"
                )
            ids = ids[0]  # stored (d2, d1, d0)
        return jnp.take(w.astype(jnp.float32), ids, axis=0)  # (..., d0, emb)


class AdaptiveEmbedding(nn.Module):
    """Adaptive input embeddings (arch ``ADAPTIVEE embsz c1,c2,...``;
    reference ``SequentialBuilder.cpp:326-342``; Baevski & Auli 2018):
    vocab clusters [0,c1), [c1,c2), ... get embeddings of dim
    emb/4^i projected up to emb. Same AF layout contract as Embedding."""

    emb_dim: int
    cutoffs: Tuple[int, ...]  # ascending; last = vocab size

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        ids = x.astype(jnp.int32)
        if ids.ndim == 4:
            if ids.shape[0] != 1:
                raise ValueError("AdaptiveEmbedding needs AF d3 == 1")
            ids = ids[0]
        out = jnp.zeros(ids.shape + (self.emb_dim,), jnp.float32)
        lo = 0
        for i, hi in enumerate(self.cutoffs):
            dim = max(1, self.emb_dim // (4 ** i))
            emb = self.param(
                f"emb{i}",
                lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.02,
                (hi - lo, dim),
            )
            in_cluster = (ids >= lo) & (ids < hi)
            local = jnp.clip(ids - lo, 0, hi - lo - 1)
            vec = jnp.take(emb, local, axis=0)
            if dim != self.emb_dim:
                proj = self.param(
                    f"proj{i}",
                    lambda k, s: jax.random.normal(k, s, jnp.float32)
                    * (1.0 / math.sqrt(s[0])),
                    (dim, self.emb_dim),
                )
                vec = vec @ proj
            out = out + jnp.where(in_cluster[..., None], vec, 0.0)
            lo = hi
        return out


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------
class LayerNorm(nn.Module):
    """flashlight LayerNorm over the given AF feature dims, scalar affine.

    Normalization statistics are computed over ``feat_af_dims``; weight/bias
    are scalars (converter asserts 1-elem wt/bias,
    ``StreamingTDSModelConverter.cpp:47-54``).
    """

    feat_af_dims: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        axes = tuple(x.ndim - 1 - d for d in self.feat_af_dims if d < x.ndim)
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (1,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (1,))
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=axes, keepdims=True)
        var = xf.var(axis=axes, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + 1e-5)
        return (w * y + b).astype(x.dtype)


class BatchNorm(nn.Module):
    """flashlight BatchNorm over AF feat dims (running stats)."""

    feat_af_dims: Tuple[int, ...]
    feat_size: int
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        train = not self.is_initializing() and train
        feat_axes = tuple(sorted(x.ndim - 1 - d for d in self.feat_af_dims))
        red_axes = tuple(a for a in range(x.ndim) if a not in feat_axes)
        shape = tuple(x.shape[a] if a in feat_axes else 1 for a in range(x.ndim))
        w = self.param("weight", lambda k, s: jnp.ones(s, jnp.float32), (self.feat_size,))
        b = self.param("bias", lambda k, s: jnp.zeros(s, jnp.float32), (self.feat_size,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(shape, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(shape, jnp.float32))
        xf = x.astype(jnp.float32)
        if train:
            mean = xf.mean(axis=red_axes, keepdims=True)
            var = xf.var(axis=red_axes, keepdims=True)
            ra_mean.value = self.momentum * ra_mean.value + (1 - self.momentum) * mean
            ra_var.value = self.momentum * ra_var.value + (1 - self.momentum) * var
        else:
            mean, var = ra_mean.value, ra_var.value
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        wb_shape = shape
        y = y * w.reshape(wb_shape) + b.reshape(wb_shape)
        return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# activations / simple ops
# ---------------------------------------------------------------------------
class Activation(nn.Module):
    kind: str
    dim: int = 0  # AF dim for GLU/LSM
    beta: float = 1.0

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        k = self.kind
        if k == "R":
            return jnp.maximum(x, 0)
        if k == "R6":
            return jnp.clip(x, 0, 6)
        if k == "ELU":
            return jax.nn.elu(x)
        if k == "LG":
            return jnp.log(x)
        if k == "HT":
            return jnp.clip(x, -1, 1)
        if k == "T":
            return jnp.tanh(x)
        if k == "SH":
            return x * jax.nn.sigmoid(self.beta * x)
        if k == "GLU":
            ax = x.ndim - 1 - self.dim
            a, b = jnp.split(x, 2, axis=ax)
            return a * jax.nn.sigmoid(b)
        if k == "LSM":
            ax = x.ndim - 1 - self.dim
            return jax.nn.log_softmax(x, axis=ax)
        raise ValueError(k)


class PReLU(nn.Module):
    n_params: int = 1
    init_val: float = 0.25

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        a = self.param(
            "weight", lambda k, s: jnp.full(s, self.init_val, jnp.float32), (self.n_params,)
        )
        if self.n_params == 1:
            aa = a[0]
        else:
            # parameters along the last stored axis (AF dim0)
            aa = a.reshape((1,) * (x.ndim - 1) + (self.n_params,))
        return jnp.where(x >= 0, x, aa.astype(x.dtype) * x)


class Dropout(nn.Module):
    rate: float

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        if not train or self.rate <= 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        m = jax.random.bernoulli(rng, keep, x.shape)
        return jnp.where(m, x / keep, 0.0).astype(x.dtype)


class Pool2D(nn.Module):
    """AF Pool2D over (d0=W, d1=H) on stored NCHW; mode MAX or AVG(include pad)."""

    wx: int
    wy: int
    sx: int
    sy: int
    px: int = 0
    py: int = 0
    mode: str = "max"

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        window = (1, 1, self.wy, self.wx)
        strides = (1, 1, self.sy, self.sx)
        pads = ((0, 0), (0, 0), (self.py, self.py), (self.px, self.px))
        if self.mode == "max":
            return jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, window, strides, pads
            ).astype(x.dtype)
        s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides, pads)
        return (s / (self.wx * self.wy)).astype(x.dtype)


class PrecisionCast(nn.Module):
    dtype: Any

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        return x.astype(self.dtype)


# ---------------------------------------------------------------------------
# TDS block
# ---------------------------------------------------------------------------
class TDSBlock(nn.Module):
    """Time-Depth-Separable block (Hannun et al. 2019; reference ``TDS``
    mnemonic, ``SequentialBuilder.cpp:254-268``; streaming impl
    ``inference/module/nn/TDSBlock.cpp:20-71``).

    Input stored (B, C, F, T) with C=channels, F=freq_dim.
      phase 1: x = LN1(x + DO(ReLU(Conv_time(x))))   conv kernel (w × 1)
      phase 2: flatten (C,F) -> L in; x = LN2(x + DO(W2 ReLU(W1 x)))
    right_pad >= 0 makes the time conv asymmetric (limited future context).
    """

    channels: int
    kernel_width: int
    freq_dim: int
    dropout: float = 0.0
    inner_linear_dim: int = 0
    right_pad: int = -1
    lnorm_include_time: bool = True
    # layout fusion: consecutive TDS blocks with per-frame LN chain in the
    # contiguous (B, T, C*F) domain ("btd"), avoiding 4 full-activation
    # transposes per block (measured 13% step win on v5e); boundary blocks
    # convert at entry/exit. Only valid when LN stats exclude time.
    # "btdf" = the Pallas chain layout (B, T, F*C) f-major: the time conv is
    # the ops.pallas.tconv kernel (in-layout, in-kernel padding) and the
    # linears re-index their C-major params at apply time.
    in_layout: str = "ncft"  # "ncft" (stored AF) | "btd" | "btdf"
    out_layout: str = "ncft"

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        c, f, w = self.channels, self.freq_dim, self.kernel_width
        if self.right_pad >= 0:
            pads = (w - 1 - self.right_pad, self.right_pad)
        else:
            pads = ((w - 1) // 2, w - 1 - (w - 1) // 2)
        inner = self.inner_linear_dim or (c * f)
        fused_fc = not self.lnorm_include_time and (
            self.in_layout == "btdf" or self.out_layout == "btdf"
        )
        fused = not self.lnorm_include_time and not fused_fc and (
            self.in_layout == "btd" or self.out_layout == "btd"
        )

        if fused_fc:
            # ---- Pallas f-major chain path; identical math (per-frame LN).
            # Layout (B, T, F*C): the time conv is the tconv kernel, no
            # stored-layout transposes anywhere in a fused chain.
            if self.in_layout == "ncft":
                B, C, F, T = x.shape
                z = x.transpose(0, 3, 2, 1).reshape(B, T, F * C)
            else:
                z = x
            conv = Conv2D(c, c, w, 1, 1, 1, pads, 0, name="conv",
                          data_layout="btdf")
            y = jnp.maximum(conv(z), 0)
            y = Dropout(self.dropout, name="do1")(y, train=train)
            z = LayerNorm((0,), name="ln1")(z + y)
            h = Linear(c * f, inner, in_swap=(c, f), name="lin1")(z)
            h = jnp.maximum(h, 0)
            h = Dropout(self.dropout, name="do2")(h, train=train)
            h = Linear(inner, c * f, out_swap=(c, f), name="lin2")(h)
            h = Dropout(self.dropout, name="do3")(h, train=train)
            z = LayerNorm((0,), name="ln2")(z + h)
            if self.out_layout == "ncft":
                B, T = z.shape[0], z.shape[1]
                return z.reshape(B, T, f, c).transpose(0, 3, 2, 1)
            return z

        if not fused:
            conv = Conv2D(c, c, w, 1, 1, 1, 0, 0, name="conv")
            ln_dims = (0, 1, 2) if self.lnorm_include_time else (1, 2)
            xp = jnp.pad(x, [(0, 0), (0, 0), (0, 0), pads])
            y = jnp.maximum(conv(xp), 0)
            y = Dropout(self.dropout, name="do1")(y, train=train)
            x = LayerNorm(ln_dims, name="ln1")(x + y)
            B, C, F, T = x.shape
            z = x.transpose(0, 3, 1, 2).reshape(B, T, C * F)
            z = Linear(c * f, inner, name="lin1")(z)
            z = jnp.maximum(z, 0)
            z = Dropout(self.dropout, name="do2")(z, train=train)
            z = Linear(inner, c * f, name="lin2")(z)
            z = Dropout(self.dropout, name="do3")(z, train=train)
            z = z.reshape(B, T, C, F).transpose(0, 2, 3, 1)
            return LayerNorm(ln_dims, name="ln2")(x + z)

        # ---- fused (B, T, C*F) path; identical math (per-frame LN) ----
        # the time conv runs IN the fused layout via dimension numbers
        # (Conv2D data_layout="ntcf" on the (B,T,C,F) view) — no
        # full-activation transposes anywhere in a fused chain.
        conv = Conv2D(c, c, w, 1, 1, 1, pads, 0, name="conv",
                      data_layout="ntcf")
        if self.in_layout == "ncft":
            B, C, F, T = x.shape
            z = x.transpose(0, 3, 1, 2).reshape(B, T, C * F)
        else:
            B, T = x.shape[0], x.shape[1]
            z = x
        z4 = z.reshape(B, T, c, f)
        y = jnp.maximum(conv(z4), 0)
        y = Dropout(self.dropout, name="do1")(y, train=train)
        z = LayerNorm((0,), name="ln1")(z + y.reshape(B, T, c * f))
        h = Linear(c * f, inner, name="lin1")(z)
        h = jnp.maximum(h, 0)
        h = Dropout(self.dropout, name="do2")(h, train=train)
        h = Linear(inner, c * f, name="lin2")(h)
        h = Dropout(self.dropout, name="do3")(h, train=train)
        z = LayerNorm((0,), name="ln2")(z + h)
        if self.out_layout == "ncft":
            return z.reshape(B, T, c, f).transpose(0, 2, 3, 1)
        return z


# ---------------------------------------------------------------------------
# position embeddings
# ---------------------------------------------------------------------------
class PositionEmbedding(nn.Module):
    """Learned absolute position embedding added to (…, T, C) input
    (reference POSEMB, ``SequentialBuilder.cpp:182-199``)."""

    layer_dim: int
    context_size: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        pe = self.param(
            "embedding",
            lambda k, s: jax.random.normal(k, s, jnp.float32) * 0.1,
            (self.context_size, self.layer_dim),
        )
        T = x.shape[-2]
        y = x + pe[:T].astype(x.dtype)
        return Dropout(self.dropout, name="do")(y, train=train)


class SinusoidalPositionEmbedding(nn.Module):
    layer_dim: int
    input_scale: float = 1.0

    @nn.compact
    def __call__(self, x: Array, mask=None) -> Array:
        T, C = x.shape[-2], x.shape[-1]
        pos = np.arange(T)[:, None].astype(np.float32)
        div = np.exp(np.arange(0, C, 2) * (-math.log(10000.0) / C)).astype(np.float32)
        pe = np.zeros((T, C), np.float32)
        pe[:, 0::2] = np.sin(pos * div)
        pe[:, 1::2] = np.cos(pos * div[: (C // 2) + (C % 2)][: pe[:, 1::2].shape[1]])
        return x * self.input_scale + jnp.asarray(pe, x.dtype)


# ---------------------------------------------------------------------------
# RNNs (lax.scan based; cuDNN-free)
# ---------------------------------------------------------------------------
class RNN(nn.Module):
    """RNN/GRU/LSTM over stored (..., T, C) input, matching fl::RNN layouts.

    Multi-layer, optionally bidirectional; uses flax recurrent cells under
    lax.scan (compiled once, pipelined by XLA).
    """

    in_dim: int
    hidden: int
    n_layers: int = 1
    mode: str = "lstm"  # relu|gru|lstm
    bidirectional: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        # collapse leading axes into batch
        lead = x.shape[:-2]
        T, C = x.shape[-2], x.shape[-1]
        h = x.reshape((-1, T, C))

        def run_dir(h, reverse: bool, li: int, di: int):
            if self.mode == "lstm":
                cell = nn.OptimizedLSTMCell(self.hidden, name=f"l{li}d{di}")
            elif self.mode == "gru":
                cell = nn.GRUCell(self.hidden, name=f"l{li}d{di}")
            else:
                cell = SimpleReluCell(self.hidden, name=f"l{li}d{di}")
            rnn = nn.RNN(cell, reverse=reverse, keep_order=True, name=f"rnn{li}d{di}")
            return rnn(h)

        for li in range(self.n_layers):
            outs = [run_dir(h, False, li, 0)]
            if self.bidirectional:
                outs.append(run_dir(h, True, li, 1))
            h = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if self.dropout > 0 and li < self.n_layers - 1:
                h = Dropout(self.dropout, name=f"do{li}")(h, train=train)
        return h.reshape(lead + h.shape[1:])


class SimpleReluCell(nn.RNNCellBase):
    features: int

    @nn.compact
    def __call__(self, carry, x):
        h = carry
        y = nn.Dense(self.features, name="i")(x) + nn.Dense(
            self.features, use_bias=False, name="h"
        )(h)
        y = jnp.maximum(y, 0)
        return y, y

    @nn.nowrap
    def initialize_carry(self, rng, input_shape):
        return jnp.zeros(input_shape[:-1] + (self.features,), jnp.float32)

    @property
    def num_feature_axes(self) -> int:
        return 1


# ---------------------------------------------------------------------------
# residual scaffold (RES/SKIP/SKIPL)
# ---------------------------------------------------------------------------
class ResidualBlock(nn.Module):
    """reference Residual container (``SequentialBuilder.cpp:525-599``):
    layers plus shortcuts (fromLayer -> toLayer), optional projection
    sequences and scales. Layer indices are 1-based; 0 = block input."""

    layers: Sequence[nn.Module]
    # each: (from_idx, to_idx, projection module or None)
    shortcuts: Sequence[Tuple[int, int, Optional[nn.Module]]] = ()
    scales: Any = None  # dict to_idx -> scale

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        scales = dict(self.scales or {})
        outputs = {0: x}
        n = len(self.layers)
        # incoming shortcut sums for each to-layer
        for i, layer in enumerate(self.layers, start=1):
            inp = outputs[i - 1]
            add = jnp.zeros_like(inp)
            got = False
            for (f, t, proj) in self.shortcuts:
                if t == i:
                    src = outputs[f]
                    if proj is not None:
                        src = _apply(proj, src, mask, train)
                    add = add + src
                    got = True
            if got:
                inp = inp + add
                if i in scales:
                    inp = inp * scales[i]
            outputs[i] = _apply(layer, inp, mask, train)
        out = outputs[n]
        # shortcuts targeting n+1 add to the final output
        add = None
        for (f, t, proj) in self.shortcuts:
            if t == n + 1:
                src = outputs[f]
                if proj is not None:
                    src = _apply(proj, src, mask, train)
                add = src if add is None else add + src
        if add is not None:
            out = out + add
            if (n + 1) in scales:
                out = out * scales[n + 1]
        return out


def _apply(layer: nn.Module, x: Array, mask, train: bool) -> Array:
    """Call a layer, passing mask/train only where accepted."""
    import inspect

    kwargs = {}
    try:
        sig = inspect.signature(type(layer).__call__)
        if "train" in sig.parameters:
            kwargs["train"] = train
        if "mask" in sig.parameters:
            kwargs["mask"] = mask
    except (ValueError, TypeError):
        pass
    return layer(x, **kwargs)


# ---------------------------------------------------------------------------
# SpecAugment as an arch layer
# ---------------------------------------------------------------------------
class SpecAugmentLayer(nn.Module):
    """SAUG F mF T p mT nrep (``SequentialBuilder.cpp:602-613``). Input is
    stored (B, 1, C, T) (pre-conv feature layout) or (B,…,T,C); we mask the
    time axis (last stored axis before channels per layout flag)."""

    f: int
    mf: int
    t: int
    p: float
    mt: int
    time_last: bool = True  # stored (B, 1, C, T) layout

    @nn.compact
    def __call__(self, x: Array, mask=None, train: bool = False) -> Array:
        if not train:
            return x
        from ..features.specaug import SpecAugment

        rng = self.make_rng("specaug")
        sa = SpecAugment(
            n_freq_masks=self.mf,
            freq_mask_f=self.f,
            n_time_masks=self.mt,
            time_mask_t=self.t,
            time_mask_p=self.p,
        )
        shp = x.shape
        if self.time_last:
            # (B, 1, C, T) -> (B, T, C)
            feats = x.reshape(shp[0], shp[-2], shp[-1]).transpose(0, 2, 1)
            out = sa(feats, rng)
            return out.transpose(0, 2, 1).reshape(shp)
        feats = x.reshape((-1,) + shp[-2:])
        out = sa(feats, rng)
        return out.reshape(shp)
