#!/usr/bin/env python
"""Train binary (fl_asr_train equivalent).

Usage (mirrors the reference, SURVEY.md §3.1):
    python cli/train.py train --flagsfile=cfg/train.cfg [--flag=value ...]
    python cli/train.py continue --rundir=... --runname=...
    python cli/train.py fork <model.bin> [--flag=value ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config


def main():
    args = sys.argv[1:]
    mode = "train"
    init_model = ""
    if args and not args[0].startswith("--"):
        mode = args[0]
        args = args[1:]
        if mode == "fork" and args and not args[0].startswith("--"):
            init_model = args[0]
            args = args[1:]
    cfg = Config.from_sources(argv=args)
    from wav2letter_tpu.runtime.train import Trainer

    Trainer(cfg, mode=mode, init_model_path=init_model).run()


if __name__ == "__main__":
    main()
