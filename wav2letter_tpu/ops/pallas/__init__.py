from .mel import pallas_mfsc, pallas_available

__all__ = ["pallas_mfsc", "pallas_available"]
