from .base import CriterionScaleMode, get_scale_mode, scale_losses
from .ctc import CTCCriterion
from .asg import ASGCriterion

__all__ = [
    "CriterionScaleMode",
    "get_scale_mode",
    "scale_losses",
    "CTCCriterion",
    "ASGCriterion",
    "make_criterion",
]


def make_criterion(cfg, n_classes: int):
    """Build the criterion named by --criterion (reference Train.cpp:524-541)."""
    mode = get_scale_mode(cfg.onorm, cfg.sqnorm)
    if cfg.criterion == "ctc":
        return CTCCriterion(n_classes=n_classes, scale_mode=mode)
    if cfg.criterion == "asg":
        return ASGCriterion(
            n_classes=n_classes,
            scale_mode=mode,
            transdiag=cfg.transdiag,
            replabel=cfg.replabel,
        )
    if cfg.criterion == "seq2seq":
        from .seq2seq import Seq2SeqCriterion

        return Seq2SeqCriterion.from_config(cfg, n_classes)
    if cfg.criterion == "transformer":
        from .seq2seq import TransformerS2SCriterion

        return TransformerS2SCriterion.from_config(cfg, n_classes)
    raise ValueError(f"unknown criterion: {cfg.criterion}")
