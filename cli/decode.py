#!/usr/bin/env python
"""Decode binary (fl_asr_decode equivalent): beam-search decoding with LM.

    python cli/decode.py --am=run/model_last.bin --test=test.lst \\
        --lexicon=lex.txt --lm=4gram.arpa --lmweight=2.0 --wordscore=1.0 \\
        --beamsize=500 --smearing=max [--sclite=out/]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config


def main():
    # the product decode binary refuses a silent ~100x Python-beam fallback
    # when the native core fails to build/load (the reference binary cannot
    # even start without its decoder lib); export W2L_REQUIRE_NATIVE=0 to
    # opt back into the fallback
    os.environ.setdefault("W2L_REQUIRE_NATIVE", "1")
    cfg = Config.from_sources(argv=sys.argv[1:])
    if any(a.startswith("--lmweight_low") for a in sys.argv[1:]):
        from wav2letter_tpu.runtime.decode import run_lmweight_sweep

        run_lmweight_sweep(cfg)
        return
    from wav2letter_tpu.runtime.decode import run_decode

    run_decode(cfg)


if __name__ == "__main__":
    main()
