#!/usr/bin/env python
"""Local Prior Match semi-supervised training
(recipes/local_prior_match/Train_lpm.cpp equivalent).

    python cli/train_lpm.py train --flagsfile=recipes/local_prior_match/train.cfg \\
        --train=paired.lst --train2=unpaired.lst --lm=lm.arpa \\
        [--lpmBeamsz=4 --propupdate=2000 --pairediter=1 --audioiter=3 \\
         --hyplenratiolb=0.3 --hyplenratioub=3.0 --unpairedBatchsize=0]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config
from wav2letter_tpu.runtime.train_lpm import LPM_DEFAULTS


def main():
    args = sys.argv[1:]
    mode = "train"
    if args and not args[0].startswith("--"):
        mode = args[0]
        args = args[1:]
    argv, lpm_flags = [], {}
    for a in args:
        if a.startswith("--"):
            k = a[2:].split("=", 1)[0]
            if k in LPM_DEFAULTS:
                v = a.split("=", 1)[1] if "=" in a else "true"
                d = LPM_DEFAULTS[k]
                lpm_flags[k] = type(d)(float(v) if not isinstance(d, str) else v)
                continue
        argv.append(a)
    cfg = Config.from_sources(argv=argv)
    from wav2letter_tpu.runtime.train_lpm import LPMTrainer

    LPMTrainer(cfg, lpm_flags=lpm_flags, mode=mode).run()


if __name__ == "__main__":
    main()
