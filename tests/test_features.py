"""Feature frontend tests: shape/semantics + golden comparison against an
independent numpy reference implementation of the MFSC pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from wav2letter_tpu.features import (
    FeatureParams,
    Featurizer,
    SpecAugment,
    mel_filterbank,
    n_fft_for,
    num_frames,
)


def numpy_mfsc(audio, p: FeatureParams):
    """Straight-line numpy MFSC for cross-checking the JAX implementation."""
    pre = np.concatenate([audio[:1], audio[1:] - p.preem_coef * audio[:-1]])
    fs, ss = p.frame_samples, p.stride_samples
    T = num_frames(len(pre), fs, ss)
    win = np.hamming(fs)
    nfft = p.n_fft
    fb = mel_filterbank(p.n_filterbanks, nfft, p.sample_rate, p.low_freq, p.high_freq)
    out = np.zeros((T, p.n_filterbanks), np.float64)
    for t in range(T):
        frame = pre[t * ss : t * ss + fs] * win
        spec = np.abs(np.fft.rfft(frame, nfft))
        mel = spec @ fb
        out[t] = np.log(np.maximum(mel, p.mel_floor))
    return out.astype(np.float32)


def test_mfsc_matches_numpy_reference():
    p = FeatureParams(n_filterbanks=40)
    rng = np.random.RandomState(0)
    audio = rng.randn(16000).astype(np.float32) * 0.1
    ref = numpy_mfsc(audio, p)
    f = Featurizer(p)
    got, _ = f(jnp.asarray(audio[None]))
    got = np.asarray(got)[0]
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_feat_lengths():
    p = FeatureParams(n_filterbanks=40)
    f = Featurizer(p)
    audio = jnp.zeros((2, 8000))
    alen = jnp.asarray([8000, 4000], jnp.int32)
    feats, flen = f(audio, alen)
    assert feats.shape[1] == num_frames(8000, p.frame_samples, p.stride_samples)
    assert int(flen[0]) == feats.shape[1]
    assert int(flen[1]) == num_frames(4000, p.frame_samples, p.stride_samples)


def test_mfcc_shape():
    p = FeatureParams(n_filterbanks=40, feature_type="mfcc", n_cepstral=13, delta_window=2)
    f = Featurizer(p)
    feats, _ = f(jnp.zeros((1, 8000)))
    assert feats.shape[-1] == 39  # 13 + deltas + accels
    assert p.feature_dim == 39


def test_pow_and_raw():
    p = FeatureParams(feature_type="pow")
    f = Featurizer(p)
    feats, _ = f(jnp.zeros((1, 4000)))
    assert feats.shape[-1] == p.n_fft // 2 + 1
    praw = FeatureParams(feature_type="raw")
    fr = Featurizer(praw)
    feats, flen = fr(jnp.zeros((1, 4000)), jnp.asarray([4000]))
    assert feats.shape == (1, 4000, 1)
    assert int(flen[0]) == 4000


def test_local_norm():
    from wav2letter_tpu.features.frontend import local_normalize

    x = jnp.asarray(np.random.RandomState(0).randn(1, 50, 8).astype(np.float32))
    y = local_normalize(x, 300, 300)  # window covers everything -> global CMVN
    yn = np.asarray(y)[0]
    np.testing.assert_allclose(yn.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(yn.std(axis=0), 1.0, atol=1e-2)


def test_specaugment_masks():
    import jax

    sa = SpecAugment(n_freq_masks=1, freq_mask_f=10, n_time_masks=1, time_mask_t=20)
    x = jnp.ones((2, 60, 30))
    y = sa(x, jax.random.PRNGKey(0))
    y = np.asarray(y)
    assert y.shape == x.shape
    assert (y == 0).any()  # something masked
    assert (y == 1).any()  # not everything
    # eval path identity is the caller's responsibility (train flag)
