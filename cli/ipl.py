#!/usr/bin/env python
"""IPL (Iterative Pseudo-Labeling) driver binary — the orchestration the
reference documents as a manual workflow (``recipes/ipl/README.md``,
``recipes/self_training/*``): {train -> decode unlabeled -> filter ->
merge lexicon -> retrain} with checkpointed loop state.

    python cli/ipl.py --train=labeled.lst --unsup_train=unlabeled.lst \\
        --tokens=... --lexicon=... --arch=... --rundir=... --runname=ipl \\
        --ipl_rounds=3 --ipl_seed_iters=500 --ipl_round_iters=300 \\
        [--lm=4gram.bin --lmweight=2.0 --beamsize=100 ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from wav2letter_tpu.config import Config, parse_argv
    from wav2letter_tpu.runtime.ipl import IPLOptions, run_ipl
    from wav2letter_tpu.tools.pseudo_label import PLFilterConfig

    raw = parse_argv(sys.argv[1:])
    unsup = raw.pop("unsup_train", "") or raw.pop("unsup_lst", "")
    if not unsup:
        sys.exit("--unsup_train=<unlabeled.lst> is required")
    opts = IPLOptions(
        unsup_lst=unsup,
        rounds=int(raw.pop("ipl_rounds", 3)),
        seed_iters=int(raw.pop("ipl_seed_iters", 500)),
        round_iters=int(raw.pop("ipl_round_iters", 300)),
        filter=PLFilterConfig(
            max_ngram_repeats=int(raw.pop("ipl_max_ngram_repeats", 2)),
            ngram_order=int(raw.pop("ipl_ngram_order", 4)),
            score_quantile=float(raw.pop("ipl_score_quantile", 0.0)),
            min_words=int(raw.pop("ipl_min_words", 1)),
        ),
    )
    cfg = Config.from_sources(argv=[f"--{k}={v}" for k, v in raw.items()])
    run_ipl(cfg, opts)


if __name__ == "__main__":
    main()
