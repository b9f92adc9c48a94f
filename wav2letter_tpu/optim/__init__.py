from .optimizers import make_optimizer
from .schedules import LRSchedule

__all__ = ["make_optimizer", "LRSchedule"]
