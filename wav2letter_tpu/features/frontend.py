"""MFSC / MFCC / power-spectrum frontend, TPU-native.

Matches the observable semantics of ``fl::lib::audio::Mfsc``/``Mfcc`` as
configured by the reference (``cpc/Train.cpp:469-486``: ``useEnergy=false,
usePower=false, zeroMeanFrame=false``; streaming copy
``inference/module/feature/LogMelFeature.cpp:75-91``):

    dither -> preemphasis (0.97) -> Hamming window -> |DFT| (magnitude,
    n_fft = next pow2 of frame length) -> HTK mel triangular filterbank ->
    log(max(x, melfloor)) [-> DCT-II + liftering for MFCC] [-> deltas]

TPU-first design: framing is a strided gather; the DFT is expressed as two
matmuls with precomputed cos/sin matrices so STFT + mel projection run on the
MXU and XLA fuses the elementwise chain between them. Everything is shaped
(B, T, C), static, and jit/vmap/pjit-friendly. A Pallas fused kernel for the
frontend lives in ``ops/pallas/mel.py`` (used when beneficial); this module is
the reference/XLA path and the two must agree to float tolerance.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def n_fft_for(frame_samples: int) -> int:
    n = 1
    while n < frame_samples:
        n *= 2
    return n


def num_frames(n_samples: int, frame: int, stride: int) -> int:
    if n_samples < frame:
        return 0
    return 1 + (n_samples - frame) // stride


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_filters: int,
    n_fft: int,
    sample_rate: float,
    low_freq: float = 0.0,
    high_freq: float = -1.0,
) -> np.ndarray:
    """HTK-style triangular mel filterbank, shape (n_fft//2+1, n_filters)."""
    if high_freq <= 0:
        high_freq = sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    mel_pts = np.linspace(hz_to_mel(low_freq), hz_to_mel(high_freq), n_filters + 2)
    hz_pts = mel_to_hz(mel_pts)
    bin_freqs = np.arange(n_bins, dtype=np.float64) * sample_rate / n_fft
    fb = np.zeros((n_bins, n_filters), dtype=np.float64)
    for m in range(n_filters):
        lo, ctr, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (bin_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - bin_freqs) / max(hi - ctr, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """DCT-II matrix (HTK normalization), shape (n_in, n_out)."""
    i = np.arange(n_in, dtype=np.float64)[:, None]
    k = np.arange(n_out, dtype=np.float64)[None, :]
    m = np.sqrt(2.0 / n_in) * np.cos(np.pi * k * (i + 0.5) / n_in)
    return m.astype(np.float32)


@dataclasses.dataclass(frozen=True)
class FeatureParams:
    sample_rate: int = 16000
    frame_size_ms: float = 25.0
    frame_stride_ms: float = 10.0
    n_filterbanks: int = 80
    low_freq: float = 0.0
    high_freq: float = -1.0
    n_cepstral: int = 13
    lifter_param: float = 22.0
    delta_window: int = 0
    preem_coef: float = 0.97
    mel_floor: float = 1.0
    dither: float = 0.0
    feature_type: str = "mfsc"  # mfsc|mfcc|pow|raw
    use_power: bool = False  # reference sets false (magnitude spectrum)
    zero_mean_frame: bool = False
    local_norm_left: int = 0
    local_norm_right: int = 0

    @property
    def frame_samples(self) -> int:
        return int(round(self.frame_size_ms * self.sample_rate / 1000.0))

    @property
    def stride_samples(self) -> int:
        return int(round(self.frame_stride_ms * self.sample_rate / 1000.0))

    @property
    def n_fft(self) -> int:
        return n_fft_for(self.frame_samples)

    @property
    def feature_dim(self) -> int:
        if self.feature_type == "mfsc":
            base = self.n_filterbanks
        elif self.feature_type == "mfcc":
            base = self.n_cepstral
        elif self.feature_type == "pow":
            base = self.n_fft // 2 + 1
        else:
            return 1
        mult = 3 if self.delta_window > 0 and self.feature_type in ("mfsc", "mfcc") else 1
        return base * mult

    @classmethod
    def from_config(cls, cfg) -> "FeatureParams":
        return cls(
            sample_rate=cfg.samplerate,
            frame_size_ms=cfg.framesizems,
            frame_stride_ms=cfg.framestridems,
            n_filterbanks=cfg.filterbanks,
            low_freq=cfg.lowfreqfilterbank,
            high_freq=cfg.highfreqfilterbank,
            n_cepstral=cfg.mfcccoeffs,
            delta_window=cfg.devwin,
            mel_floor=cfg.melfloor,
            feature_type=cfg.feature_type(),
            local_norm_left=cfg.localnrmlleftctx,
            local_norm_right=cfg.localnrmlrightctx,
        )


class Featurizer:
    """Precomputes DFT/mel/DCT matrices; provides a jittable __call__.

    __call__(audio (B,S), audio_len (B,)) -> (feats (B,T,C), feat_len (B,))
    where T = num_frames(S) is static given S.
    """

    def __init__(self, params: FeatureParams):
        self.p = params
        p = params
        if p.feature_type == "raw":
            return
        n_fft = p.n_fft
        fs = p.frame_samples
        # windowed real-DFT matrices folded together: frame @ C, frame @ S
        window = np.hamming(fs).astype(np.float64)
        t = np.arange(fs, dtype=np.float64)[:, None]
        k = np.arange(n_fft // 2 + 1, dtype=np.float64)[None, :]
        ang = -2.0 * np.pi * t * k / n_fft
        self.cos_mat = jnp.asarray((window[:, None] * np.cos(ang)).astype(np.float32))
        self.sin_mat = jnp.asarray((window[:, None] * np.sin(ang)).astype(np.float32))
        self.mel_fb = jnp.asarray(
            mel_filterbank(p.n_filterbanks, n_fft, p.sample_rate, p.low_freq, p.high_freq)
        )
        if p.feature_type == "mfcc":
            self.dct = jnp.asarray(dct_matrix(p.n_filterbanks, p.n_cepstral))
            kk = np.arange(p.n_cepstral, dtype=np.float64)
            lift = 1.0 + 0.5 * p.lifter_param * np.sin(np.pi * kk / p.lifter_param)
            self.lifter = jnp.asarray(lift.astype(np.float32))

    # ------------------------------------------------------------------
    def frame_signal(self, audio: jnp.ndarray) -> jnp.ndarray:
        """(B, S) -> (B, T, frame_samples) strided frames.

        Gather-free: decompose the in-frame offset j = q*ss + r, so
        frames[t, j] = reshaped[t + q, r] with reshaped = audio viewed
        (-1, ss) — ceil(fs/ss) shifted slices concatenated on the last
        axis. Pure pad/reshape/slice/concat fuses on TPU (the index-matrix
        gather showed up as a 0.9 ms/step custom fusion on the bench)."""
        p = self.p
        fs, ss = p.frame_samples, p.stride_samples
        S = audio.shape[-1]
        T = num_frames(S, fs, ss)
        nq = -(-fs // ss)
        need = (T + nq) * ss
        pad = max(0, need - S)
        if pad:
            audio = jnp.pad(
                audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
        xv = audio[..., : (T + nq) * ss].reshape(audio.shape[:-1] + (T + nq, ss))
        parts = []
        for q in range(nq):
            width = min(ss, fs - q * ss)
            parts.append(xv[..., q : q + T, :width])
        return jnp.concatenate(parts, axis=-1)  # (B, T, fs)

    def __call__(
        self,
        audio: jnp.ndarray,
        audio_len: Optional[jnp.ndarray] = None,
        dither_rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        p = self.p
        if audio.ndim == 1:
            audio = audio[None]
        if p.feature_type == "raw":
            feats = audio[..., None]
            flen = audio_len
            return feats, flen

        if p.dither > 0 and dither_rng is not None:
            audio = audio + p.dither * jax.random.normal(
                dither_rng, audio.shape, audio.dtype
            )
        # preemphasis: x[t] - a*x[t-1]; reference keeps x[0] as-is
        pre = jnp.concatenate([audio[..., :1], audio[..., 1:] - p.preem_coef * audio[..., :-1]], axis=-1)
        frames = self.frame_signal(pre)  # (B, T, fs)
        if p.zero_mean_frame:
            frames = frames - frames.mean(axis=-1, keepdims=True)
        re = jnp.einsum("btf,fk->btk", frames, self.cos_mat)
        im = jnp.einsum("btf,fk->btk", frames, self.sin_mat)
        spec = re * re + im * im
        if not p.use_power:
            spec = jnp.sqrt(jnp.maximum(spec, 1e-20))
        if p.feature_type == "pow":
            feats = spec
        else:
            mel = jnp.einsum("btk,km->btm", spec, self.mel_fb)
            feats = jnp.log(jnp.maximum(mel, p.mel_floor))
            if p.feature_type == "mfcc":
                feats = jnp.einsum("btm,mc->btc", feats, self.dct) * self.lifter
            if p.delta_window > 0:
                d = self._delta(feats, p.delta_window)
                dd = self._delta(d, p.delta_window)
                feats = jnp.concatenate([feats, d, dd], axis=-1)
        if p.local_norm_left > 0 or p.local_norm_right > 0:
            feats = local_normalize(feats, p.local_norm_left, p.local_norm_right)
        flen = None
        if audio_len is not None:
            flen = jnp.maximum(
                0,
                1 + (audio_len - p.frame_samples) // p.stride_samples,
            ).astype(jnp.int32)
        return feats, flen

    @staticmethod
    def _delta(x: jnp.ndarray, win: int) -> jnp.ndarray:
        """Regression deltas over time (HTK formula)."""
        denom = 2.0 * sum(i * i for i in range(1, win + 1))
        T = x.shape[1]
        out = jnp.zeros_like(x)
        for i in range(1, win + 1):
            fwd = jnp.concatenate([x[:, i:], jnp.repeat(x[:, -1:], i, axis=1)], axis=1)
            bwd = jnp.concatenate([jnp.repeat(x[:, :1], i, axis=1), x[:, :-i]], axis=1)
            out = out + i * (fwd - bwd)
        return out / denom


def local_normalize(feats: jnp.ndarray, left_ctx: int, right_ctx: int) -> jnp.ndarray:
    """Sliding-window CMVN over time (reference localnrml*ctx; streaming
    LocalNorm keeps running sums — here computed via cumulative sums, exact).
    """
    B, T, C = feats.shape
    # center per (utterance, channel) before the cumsum trick: E[x^2]-E[x]^2
    # in fp32 catastrophically cancels on near-constant windows (~20% std
    # error at var ~1e-6 for x ~ 3); on centered values the cancellation
    # vanishes and the result matches a float64 two-pass to ~1e-6
    c = feats.mean(axis=1, keepdims=True)
    y = feats - c
    cs = jnp.cumsum(y, axis=1)
    cs2 = jnp.cumsum(y * y, axis=1)
    zeros = jnp.zeros((B, 1, C), feats.dtype)
    cs = jnp.concatenate([zeros, cs], axis=1)
    cs2 = jnp.concatenate([zeros, cs2], axis=1)
    t = jnp.arange(T)
    lo = jnp.maximum(0, t - left_ctx)
    hi = jnp.minimum(T, t + right_ctx + 1)
    n = (hi - lo).astype(feats.dtype)[None, :, None]
    s = cs[:, hi] - cs[:, lo]
    s2 = cs2[:, hi] - cs2[:, lo]
    mean_y = s / n
    var = jnp.maximum(s2 / n - mean_y * mean_y, 0.0)
    std = jnp.sqrt(var + 1e-10)
    return (y - mean_y) / std


class HostFeaturizer:
    """CPU-jitted featurizer for the host data pipeline.

    The reference always featurizes in its data-loading threads
    (``data/W2lDataset.cpp`` -> FeatureParams pipeline) and ships (T, C)
    features to the accelerator. The TPU-native default here fuses MFSC
    into the jitted train step — optimal when the chip is local — but over
    a tunneled/remote device the raw-audio payload (4 bytes/sample) and
    the device FFT dominate the step (measured: 1.57 s/step vs 0.44 s/step
    at B=128x90s on the v5e tunnel). ``--features_device=host`` restores
    the reference's host-side placement: same Featurizer, jitted on the
    CPU backend inside the prefetch threads, shipping bf16 features
    (2 bytes/frame-channel, ~4x less than f32 audio).
    """

    def __init__(self, params: FeatureParams, out_dtype=None):
        import jax

        # local_devices: under multi-process (jax.distributed) the global
        # device list contains other hosts' CPUs — device_put to a
        # non-addressable device breaks (and per-host featurization must
        # stay host-local by definition)
        self._cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(self._cpu):
            self._feat = Featurizer(params)
        feat = self._feat

        def run(a, l):
            feats, flen = feat(a, l)
            if out_dtype is not None:
                feats = feats.astype(out_dtype)
            return feats, flen

        self._fn = jax.jit(run)

    def __call__(self, audio, audio_len):
        import jax
        import numpy as np

        a = jax.device_put(np.asarray(audio), self._cpu)
        l = jax.device_put(np.asarray(audio_len), self._cpu)
        feats, flen = self._fn(a, l)
        return np.asarray(feats), np.asarray(flen)
