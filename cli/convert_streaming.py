#!/usr/bin/env python
"""Training checkpoint -> streaming bundle converter
(StreamingTDSModelConverter equivalent).

    python cli/convert_streaming.py --am=run/model_last.bin --out=model.stream
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = {}
    for a in sys.argv[1:]:
        if a.startswith("--"):
            k, _, v = a[2:].partition("=")
            args[k] = v
    from wav2letter_tpu.inference import convert_checkpoint

    out = convert_checkpoint(args["am"], args.get("out", "model.stream"))
    print(f"wrote streaming bundle: {out}")


if __name__ == "__main__":
    main()
