#!/usr/bin/env python
"""Align binary (reference tools/Align equivalent).

Usage (mirrors the reference, lm_analysis/README.md):
    python cli/align.py out.align --am=model.bin --test=dev-other.lst \
        [--batchsize=N --datadir=... --lexicon=...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config


def main():
    args = sys.argv[1:]
    if not args or args[0].startswith("--"):
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    output = args[0]
    cfg = Config.from_sources(argv=args[1:])
    from wav2letter_tpu.runtime.align import run_align

    run_align(cfg, output)


if __name__ == "__main__":
    main()
