from .meters import TrainMeters, DatasetMeters, EditDistanceMeter, TimerMeter
from .checkpoint import Checkpoint, save_checkpoint, load_checkpoint, find_last_checkpoint

__all__ = [
    "TrainMeters",
    "DatasetMeters",
    "EditDistanceMeter",
    "TimerMeter",
    "Checkpoint",
    "save_checkpoint",
    "load_checkpoint",
    "find_last_checkpoint",
]
