"""Chunked streaming inference — the wav2letter@anywhere equivalent.

The reference runtime (``recipes/streaming_convnets/inference/``) streams
audio through a graph of stateful ``InferenceModule``s with a
``start/run/finish`` protocol over ``IOBuffer``s: ``start`` applies left
padding, ``run`` consumes whole frames and buffers remainders, ``finish``
flushes right padding (``module/InferenceModule.h:29-64``,
``Conv1dFbGemm.cpp:75-123``).

TPU-native redesign: the IOBuffer protocol becomes *explicit carry state* —
each layer owns a buffer array carried between jitted steps. A step over the
whole chain is a pure function ``(params, states, chunk) -> (states, out)``
that XLA compiles once per chunk-shape signature (chunked streaming reaches a
small cycling set of signatures, each compiled once). Semantics are
bit-equivalent to running the batch model on the full utterance (verified by
tests): left zero-padding injected at start, right padding at finish, stride
remainders carried.

Supported layer set matches the reference streaming converter
(``StreamingTDSModelConverter.cpp:208-284``): PD+C2 (time conv), TDS, LN
(scalar affine), L, R (relu), DO/V/RO/SAUG skipped; plus the streaming
log-mel frontend with LocalNorm (running CMVN).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..features.frontend import FeatureParams, Featurizer
from ..models.arch import LayerSpec

Array = jnp.ndarray

# All streaming matmuls/convs pin precision="highest": the default matmul
# precision is reduced (bf16-class passes) and its error is SHAPE-DEPENDENT,
# so a chunked step (tiny N) and the batch forward (full T) disagree by ~1e-2
# on identical windows — enough to break the converter's exactness contract
# (StreamingTDSModelConverter.cpp:71-79). Streaming compute is a tiny fraction
# of batch training FLOPs, so fp32 exactness here is cheap.
_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# streaming featurizer (LogMelFeature + LocalNorm analog)
# ---------------------------------------------------------------------------
class StreamingFeaturizer:
    """Buffers raw samples, emits whole MFSC frames per chunk
    (``LogMelFeature::run`` consumes numFrames*stride samples and keeps the
    tail, ``LogMelFeature.cpp:43-64``). Optional running local CMVN with
    left context (``LocalNorm.cpp:43-90``)."""

    def __init__(self, params: FeatureParams):
        self.p = params
        # preemphasis is applied incrementally on arrival (continuous across
        # chunk boundaries); the windowed featurizer sees preemphasized
        # samples and must not re-apply it. Local CMVN is likewise applied
        # incrementally by _local_norm (whole-history window), so the inner
        # featurizer must NOT apply its per-chunk version — double
        # normalization broke every localnrml*ctx streaming model.
        self.featurizer = Featurizer(dataclasses.replace(
            params, preem_coef=0.0, local_norm_left=0, local_norm_right=0))
        self._jit_feat = jax.jit(lambda a: self.featurizer(a)[0])

    def start(self):
        state = {
            "samples": np.zeros((0,), np.float32),
            "last_sample": np.float32(0.0),
            "first": True,
        }
        if self.p.local_norm_left > 0:
            state["ln_hist"] = np.zeros((0, self.p.n_filterbanks), np.float32)
        return state

    def run(self, state, samples: np.ndarray):
        samples = samples.astype(np.float32)
        if len(samples):
            prev = np.concatenate([[state["last_sample"]], samples[:-1]])
            pre = samples - self.p.preem_coef * prev
            if state["first"]:
                pre[0] = samples[0]  # reference keeps x[0] unchanged
                state["first"] = False
            state["last_sample"] = samples[-1]
            samples = pre
        buf = np.concatenate([state["samples"], samples])
        fs, ss = self.p.frame_samples, self.p.stride_samples
        n_frames = max(0, 1 + (len(buf) - fs) // ss) if len(buf) >= fs else 0
        if n_frames == 0:
            state["samples"] = buf
            return state, np.zeros((0, self.p.n_filterbanks), np.float32)
        used = fs + (n_frames - 1) * ss
        feats = np.asarray(self._jit_feat(jnp.asarray(buf[:used][None])))[0]
        state["samples"] = buf[n_frames * ss :]
        if self.p.local_norm_left > 0:
            feats, state = self._local_norm(state, feats)
        return state, feats

    def finish(self, state):
        return state, np.zeros((0, self.p.n_filterbanks), np.float32)

    def _local_norm(self, state, feats):
        ctx = self.p.local_norm_left
        hist = np.concatenate([state["ln_hist"], feats], axis=0)
        out = np.empty_like(feats)
        n_prev = len(state["ln_hist"])
        for i in range(len(feats)):
            j = n_prev + i
            lo = max(0, j - ctx)
            w = hist[lo : j + 1].astype(np.float64)
            # identical formula to features.frontend.local_normalize
            # (E[x^2]-E[x]^2 then sqrt(var+1e-10)): same rounding, same eps
            m = w.mean(axis=0)
            var = np.maximum((w * w).mean(axis=0) - m * m, 0.0)
            out[i] = ((feats[i] - m) / np.sqrt(var + 1e-10)).astype(np.float32)
        state["ln_hist"] = hist[-ctx:]
        return out, state


# ---------------------------------------------------------------------------
# streaming layers
# ---------------------------------------------------------------------------
class StreamLayer:
    """Base: start() -> state; step consumes (state, x (B,n,C)) -> (state, y);
    finish flushes right padding. All array math is pure jax (jitted at the
    network level)."""

    def start(self, batch: int) -> Any:
        return None

    def out_frames(self, state_frames: int, in_frames: int) -> Tuple[int, int]:
        """(#output frames, #state frames after) given static counts."""
        return in_frames, state_frames

    def step(self, params, state, x):
        return state, x

    def flush_frames(self) -> int:
        """Frames of zero right-padding injected at finish."""
        return 0


@dataclasses.dataclass
class StreamConv(StreamLayer):
    """Time convolution with left/right padding as state (C2 after PD in the
    arch; converter maps PD+C2 -> padded Conv1d, ``Conv1dFbGemm.cpp:75-101``).

    Works on (B, n, H, Cin) input where H is the freq dim (1 for 1-D convs);
    kernel (w x kh) with time stride s. Left pad injected into the initial
    state; right pad appended at finish.
    """

    name: str
    in_ch: int
    out_ch: int
    kw: int  # time kernel
    kh: int  # freq kernel
    stride: int
    pad_left: int
    pad_right: int
    freq_dim: int
    freq_stride: int = 1
    freq_pad: int = 0
    groups: int = 1

    def start(self, batch: int) -> Array:
        return jnp.zeros((batch, self.pad_left, self.freq_dim, self.in_ch), jnp.float32)

    def out_frames(self, state_frames: int, in_frames: int) -> Tuple[int, int]:
        m = state_frames + in_frames
        if m < self.kw:
            return 0, m
        n_out = (m - self.kw) // self.stride + 1
        return n_out, m - n_out * self.stride

    def step(self, params, state, x):
        buf = jnp.concatenate([state, x], axis=1)  # (B, m, H, Cin)
        m = buf.shape[1]
        if m < self.kw:
            return buf, jnp.zeros((x.shape[0], 0, self._oh(), self.out_ch), x.dtype)
        n_out = (m - self.kw) // self.stride + 1
        used = self.kw + (n_out - 1) * self.stride
        w = params[f"{self.name}_w"]  # (out, in/g, kh, kw) OIHW
        b = params.get(f"{self.name}_b")
        inp = buf[:, :used].transpose(0, 3, 2, 1)  # (B, C, H, T)
        y = jax.lax.conv_general_dilated(
            inp,
            w.astype(inp.dtype),
            window_strides=(self.freq_stride, self.stride),
            padding=((self.freq_pad, self.freq_pad), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            feature_group_count=self.groups,
            precision=_PREC,
        )
        if b is not None:
            y = y + b.astype(y.dtype)[None, :, None, None]
        y = y.transpose(0, 3, 2, 1)  # (B, n_out, H', Cout)
        new_state = buf[:, n_out * self.stride :]
        return new_state, y

    def _oh(self):
        return (self.freq_dim + 2 * self.freq_pad - self.kh) // self.freq_stride + 1

    def flush_frames(self) -> int:
        return self.pad_right


@dataclasses.dataclass
class StreamTDS(StreamLayer):
    """TDS block: time conv (kernel w, SAME padding split left/right via
    right_pad) + residual + LN, then the position-wise 2-layer MLP + residual
    + LN (``TDSBlock.cpp:20-71``). Only the conv needs carry state; because
    of the residual, the state holds raw inputs and the block recomputes the
    conv on the aligned window."""

    name: str
    channels: int
    kernel: int
    freq_dim: int
    right_pad: int
    lnorm_include_time: bool = True

    def __post_init__(self):
        w = self.kernel
        self.pad_left = w - 1 - self.right_pad if self.right_pad >= 0 else (w - 1) // 2
        self.pad_right = (
            self.right_pad if self.right_pad >= 0 else w - 1 - (w - 1) // 2
        )

    def start(self, batch: int) -> Array:
        return jnp.zeros((batch, self.pad_left, self.freq_dim, self.channels), jnp.float32)

    def out_frames(self, state_frames: int, in_frames: int) -> Tuple[int, int]:
        m = state_frames + in_frames
        if m < self.kernel:
            return 0, m
        n_out = m - self.kernel + 1
        return n_out, m - n_out

    def step(self, params, state, x):
        buf = jnp.concatenate([state, x], axis=1)  # (B, m, F, C)
        m = buf.shape[1]
        if m < self.kernel:
            return buf, jnp.zeros((x.shape[0], 0, self.freq_dim, self.channels), x.dtype)
        n_out = m - self.kernel + 1
        w = params[f"{self.name}_conv_w"]  # OIHW (C, C, 1, kw)
        b = params[f"{self.name}_conv_b"]
        inp = buf.transpose(0, 3, 2, 1)  # (B, C, F, T)
        y = jax.lax.conv_general_dilated(
            inp, w.astype(inp.dtype), (1, 1), ((0, 0), (0, 0)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
            precision=_PREC,
        )
        y = y + b.astype(y.dtype)[None, :, None, None]
        y = jnp.maximum(y, 0).transpose(0, 3, 2, 1)  # (B, n_out, F, C)
        # residual uses the *aligned* input: frames state_frames-pad_left..
        res_in = buf[:, self.pad_left : self.pad_left + n_out]
        z = res_in + y
        z = self._ln(params, f"{self.name}_ln1", z)
        # MLP part (position-wise, stateless). The batch TDSBlock flattens
        # channels-major (C, F) — match that ordering exactly.
        B, N, F, C = z.shape
        flat = z.transpose(0, 1, 3, 2).reshape(B, N, C * F)
        w1 = params[f"{self.name}_lin1_w"]
        b1 = params[f"{self.name}_lin1_b"]
        w2 = params[f"{self.name}_lin2_w"]
        b2 = params[f"{self.name}_lin2_b"]
        h = jnp.matmul(
            jnp.maximum(jnp.matmul(flat, w1, precision=_PREC) + b1, 0),
            w2, precision=_PREC,
        ) + b2
        z2 = flat + h
        z2 = z2.reshape(B, N, C, F).transpose(0, 1, 3, 2)
        z2 = self._ln(params, f"{self.name}_ln2", z2)
        new_state = buf[:, n_out:]
        return new_state, z2

    def _ln(self, params, pname, v):
        # scalar affine LN over (time premise: per-frame => freq+chan axes)
        axes = (2, 3) if not self.lnorm_include_time else (2, 3)
        # NOTE: streaming LN cannot include time (stats would span chunk
        # boundaries); reference streaming archs use lNormIncludeTime=0 for
        # the streaming-convertible portions or accept per-frame stats.
        mean = v.mean(axis=axes, keepdims=True)
        var = v.var(axis=axes, keepdims=True)
        y = (v - mean) * jax.lax.rsqrt(var + 1e-5)
        return params[f"{pname}_w"] * y + params[f"{pname}_b"]

    def flush_frames(self) -> int:
        return self.pad_right


@dataclasses.dataclass
class StreamPointwise(StreamLayer):
    """Stateless per-frame ops: Linear (on flattened (F*C)), ReLU, scalar LN."""

    name: str
    kind: str  # "linear" | "relu" | "ln" | "reshape"
    out_shape: Optional[Tuple[int, int]] = None  # (F, C) after reshape

    def step(self, params, state, x):
        if self.kind == "relu":
            return state, jnp.maximum(x, 0)
        if self.kind == "ln":
            mean = x.mean(axis=(2, 3), keepdims=True)
            var = x.var(axis=(2, 3), keepdims=True)
            y = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            return state, params[f"{self.name}_w"] * y + params[f"{self.name}_b"]
        if self.kind == "linear":
            B, N, F, C = x.shape
            flat = x.reshape(B, N, F * C)
            y = jnp.matmul(flat, params[f"{self.name}_w"], precision=_PREC)
            b = params.get(f"{self.name}_b")
            if b is not None:
                y = y + b
            return state, y[:, :, None, :]  # (B, N, 1, out)
        if self.kind == "reshape":
            B, N = x.shape[:2]
            F, C = self.out_shape
            return state, x.reshape(B, N, F, C)
        raise ValueError(self.kind)


# ---------------------------------------------------------------------------
# the streaming network
# ---------------------------------------------------------------------------
class StreamingNetwork:
    """Composes StreamLayers; jit-compiles the full-chain step per shape
    signature. API mirrors the reference protocol: start/run/finish."""

    def __init__(self, layers: Sequence[StreamLayer], params: Dict[str, np.ndarray]):
        self.layers = list(layers)
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self._compiled: Dict[Tuple, Callable] = {}

    def start(self, batch: int = 1):
        return [l.start(batch) for l in self.layers]

    def _chain_step(self, params, states, x):
        new_states = []
        for l, s in zip(self.layers, states):
            s, x = l.step(params, s, x)
            new_states.append(s)
        return new_states, x

    def run(self, states, chunk: Array):
        """chunk (B, n, F, C). Returns (states, out (B, n_out, ...))."""
        sig = (chunk.shape, tuple(tuple(s.shape) if s is not None else None for s in states))
        fn = self._compiled.get(sig)
        if fn is None:
            fn = jax.jit(self._chain_step)
            self._compiled[sig] = fn
        return fn(self.params, states, jnp.asarray(chunk))

    def finish(self, states):
        """Flush right padding through the chain, layer by layer (reference
        finish: each module flushes its own right pad then passes on)."""
        B = None
        for s in states:
            if s is not None:
                B = s.shape[0]
                break
        B = B or 1
        outs = []
        # feed zeros equal to each layer's flush_frames at its own input:
        # process sequentially: flush layer i, pass result through i+1..n
        x = None
        for i, l in enumerate(self.layers):
            f = l.flush_frames()
            if f == 0:
                continue
            # zeros at layer i input with correct feature shape: reuse state
            st = states[i]
            zshape = (B, f) + tuple(st.shape[2:])
            z = jnp.zeros(zshape, jnp.float32)
            s, y = l.step(self.params, states[i], z)
            states[i] = s
            # propagate through the rest
            for j in range(i + 1, len(self.layers)):
                states[j], y = self.layers[j].step(self.params, states[j], y)
            if y.shape[1] > 0:
                outs.append(y)
        if outs:
            return states, jnp.concatenate(outs, axis=1)
        return states, None
