#!/usr/bin/env python
"""CPC / wav2vec2-style joint training (cpc/Train.cpp equivalent).

    python cli/train_cpc.py --flagsfile=recipes/cpc/pretrain.cfg \\
        --train=sup.lst --train2=unsup.lst \\
        [--codedim=256 --contextdim=768 --maskprob=0.065 --supdelay=50000 ...]

CPC-specific flags (codedim, contextdim, mutualdim, maskprob, masklength,
temperature, nnegativesamples, supdelay, supdates, unsupdates, twostage,
trainencoder, traincontext, freeze, grad_mult_feat, l2_enc_pen, lr2) are
recipe-level (reference DEFINEs, cpc/Train.cpp:45-203) and forwarded to the
CPCTrainer.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config
from wav2letter_tpu.runtime.train_cpc import CPC_DEFAULTS


def main():
    args = sys.argv[1:]
    mode = "train"
    if args and args[0] in ("train", "continue", "fork"):
        mode = args[0]
        args = args[1:]
    argv, cpc_flags = [], {}
    for a in args:
        if a.startswith("--"):
            k = a[2:].split("=", 1)[0]
            if k in CPC_DEFAULTS:
                v = a.split("=", 1)[1] if "=" in a else "true"
                d = CPC_DEFAULTS[k]
                if isinstance(d, bool):
                    cpc_flags[k] = v.lower() in ("true", "1", "")
                elif isinstance(d, int):
                    cpc_flags[k] = int(float(v))
                elif isinstance(d, float):
                    cpc_flags[k] = float(v)
                else:
                    cpc_flags[k] = v
                continue
        argv.append(a)
    cfg = Config.from_sources(argv=argv)
    from wav2letter_tpu.runtime.train_cpc import CPCTrainer

    CPCTrainer(cfg, cpc_flags=cpc_flags, mode=mode).run()


if __name__ == "__main__":
    main()
