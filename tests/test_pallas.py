"""Pallas kernel tests (interpret mode on CPU): fused MFSC must match the
XLA frontend path exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_tpu.features.frontend import FeatureParams, Featurizer
from wav2letter_tpu.ops.pallas.mel import pallas_mfsc


def test_pallas_mfsc_matches_xla():
    p = FeatureParams(n_filterbanks=40)
    f = Featurizer(p)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(2, 16000).astype(np.float32) * 0.1)
    ref, _ = f(audio)
    # same preprocessing as Featurizer.__call__, then the Pallas kernel
    pre = jnp.concatenate(
        [audio[..., :1], audio[..., 1:] - p.preem_coef * audio[..., :-1]], axis=-1
    )
    frames = f.frame_signal(pre)
    got = pallas_mfsc(
        frames, f.cos_mat, f.sin_mat, f.mel_fb, mel_floor=p.mel_floor,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_pallas_mfsc_ragged_tile():
    """T not a multiple of the tile size pads and trims correctly."""
    p = FeatureParams(n_filterbanks=24)
    f = Featurizer(p)
    audio = jnp.asarray(np.random.RandomState(1).randn(1, 7000).astype(np.float32))
    ref, _ = f(audio)
    pre = jnp.concatenate(
        [audio[..., :1], audio[..., 1:] - p.preem_coef * audio[..., :-1]], axis=-1
    )
    frames = f.frame_signal(pre)
    got = pallas_mfsc(frames, f.cos_mat, f.sin_mat, f.mel_fb,
                      mel_floor=p.mel_floor, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
