#!/usr/bin/env python
"""Test binary (fl_asr_test equivalent): greedy/Viterbi WER/TER.

    python cli/test.py --am=run/model_last.bin --test=dev.lst [--show] ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config


def main():
    cfg = Config.from_sources(argv=sys.argv[1:])
    from wav2letter_tpu.runtime.test import run_test

    run_test(cfg)


if __name__ == "__main__":
    main()
