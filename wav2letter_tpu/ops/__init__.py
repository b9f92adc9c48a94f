from .ctc import ctc_loss, ctc_viterbi
from .asg import asg_loss, asg_viterbi, fal_score, fcc_score
from .editdistance import edit_distance

__all__ = [
    "ctc_loss",
    "ctc_viterbi",
    "asg_loss",
    "asg_viterbi",
    "fal_score",
    "fcc_score",
    "edit_distance",
]
