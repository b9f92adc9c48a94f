#!/usr/bin/env python
"""slimIPL semi-supervised training (recipes/slimIPL/src/Train.cpp
equivalent).

    python cli/train_slimipl.py --flagsfile=recipes/slimipl/train.cfg \\
        --train=sup.lst --train2=unsup.lst \\
        [--slimIPL_start=20000 --slimIPL_type=cache --slimIPL_sup_updates=1 \\
         --slimIPL_unsup_updates=3 --slimIPL_cache_path=... \\
         --slimIPL_ema --slimIPL_ema_decay=0.9999 ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config
from wav2letter_tpu.runtime.train_slimipl import SLIMIPL_DEFAULTS


def main():
    args = sys.argv[1:]
    mode = "train"
    if args and not args[0].startswith("--"):
        mode = args[0]
        args = args[1:]
    argv, ipl_flags = [], {}
    for a in args:
        if a.startswith("--"):
            k = a[2:].split("=", 1)[0]
            if k in SLIMIPL_DEFAULTS:
                v = a.split("=", 1)[1] if "=" in a else "true"
                d = SLIMIPL_DEFAULTS[k]
                if isinstance(d, bool):
                    ipl_flags[k] = v.lower() in ("true", "1", "")
                elif isinstance(d, int):
                    ipl_flags[k] = int(float(v))
                elif isinstance(d, float):
                    ipl_flags[k] = float(v)
                else:
                    ipl_flags[k] = v
                continue
        argv.append(a)
    cfg = Config.from_sources(argv=argv)
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    SlimIPLTrainer(cfg, ipl_flags=ipl_flags, mode=mode).run()


if __name__ == "__main__":
    main()
