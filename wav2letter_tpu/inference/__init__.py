from .streaming import StreamingFeaturizer, StreamingNetwork
from .convert import (
    build_streaming_network,
    convert_checkpoint,
    load_streaming_bundle,
)

__all__ = [
    "StreamingFeaturizer",
    "StreamingNetwork",
    "build_streaming_network",
    "convert_checkpoint",
    "load_streaming_bundle",
]
