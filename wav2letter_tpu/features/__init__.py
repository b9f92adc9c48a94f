from .frontend import (
    FeatureParams,
    Featurizer,
    HostFeaturizer,
    n_fft_for,
    mel_filterbank,
    num_frames,
)
from .specaug import SpecAugment

__all__ = [
    "FeatureParams",
    "Featurizer",
    "n_fft_for",
    "mel_filterbank",
    "num_frames",
    "SpecAugment",
    "HostFeaturizer",
]
