"""Host input-pipeline throughput benchmark.

The trainer's host path (reference ``loadPrefetchDataset`` semantics,
``cpc/Train.cpp:877-878``): .lst -> audio decode -> target encode ->
length-bucket -> pad/batch -> threaded prefetch. This tool measures how many
audio-seconds/second the HOST side can materialize as a function of the
prefetch thread count, to show it out-runs the device step rate (the TDS
flagship consumes ~4.5k audio-s/s/chip, BENCH.md) — i.e. the pipeline never
starves the TPU and needs no grain/tf.data dependency.

Usage: python tools/pipeline_bench.py [n_utts] [secs_per_utt]
Writes synthetic 16-bit WAVs to a temp dir (exercises the real decode path).
"""

import os
import struct
import sys
import tempfile
import time
import wave

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wav2letter_tpu.config import Config
from wav2letter_tpu.data.dataset import AsrDataset, PrefetchIterator
from wav2letter_tpu.data.dictionary import Dictionary, Lexicon

SR = 16000
LETTERS = [chr(c) for c in range(ord("a"), ord("z") + 1)]


def make_corpus(root: str, n_utts: int, secs: float) -> str:
    rng = np.random.RandomState(0)
    lines = []
    for i in range(n_utts):
        n = int(SR * secs * (0.5 + rng.rand()))  # mixed lengths
        wav = (rng.randn(n) * 3000).astype(np.int16)
        path = os.path.join(root, f"utt{i:04d}.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(SR)
            w.writeframes(wav.tobytes())
        words = " ".join(
            "".join(rng.choice(LETTERS, rng.randint(2, 8)))
            for _ in range(rng.randint(3, 12))
        )
        lines.append(f"utt{i:04d} {path} {1000.0 * n / SR:.1f} {words}")
    lst = os.path.join(root, "data.lst")
    with open(lst, "w") as f:
        f.write("\n".join(lines) + "\n")
    return lst


def main():
    n_utts = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    secs = float(sys.argv[2]) if len(sys.argv) > 2 else 15.0
    root = tempfile.mkdtemp(prefix="w2l_pipe_bench_")
    lst = make_corpus(root, n_utts, secs)

    tok_path = os.path.join(root, "tokens.txt")
    with open(tok_path, "w") as f:
        f.write("|\n" + "\n".join(LETTERS) + "\n")
    lex_path = os.path.join(root, "lexicon.txt")
    seen = set()
    for line in open(lst):
        for w in line.split()[3:]:
            if w not in seen:
                seen.add(w)
    with open(lex_path, "w") as f:
        for w in sorted(seen):
            f.write(w + "\t" + " ".join(w) + " |\n")

    cfg = Config()
    cfg.update({"criterion": "ctc", "batchsize": "32", "nthread": "4"})
    tdict = Dictionary.from_file(tok_path)
    tdict.add_entry("#")  # ctc blank
    lex = Lexicon.from_file(lex_path)

    ds = AsrDataset(lst, tdict, lex, cfg)
    total_audio_s = sum(s.duration_ms for s in ds.samples) / 1000.0
    print(f"corpus: {len(ds.samples)} utts, {total_audio_s:.0f} audio-s, "
          f"{len(ds.bucketer)} batches")

    # warm the page cache so we measure decode+batch, not cold disk
    for spec in ds.batch_specs()[:2]:
        ds.materialize(spec)

    for nthread in (1, 2, 4, 8):
        t0 = time.perf_counter()
        n = 0
        it = PrefetchIterator(ds, ds.batch_specs(), num_threads=nthread)
        for batch in it:
            n += batch["audio"].shape[0]
        dt = time.perf_counter() - t0
        rate = total_audio_s / dt
        print(
            f"nthread={nthread}: {dt:.2f}s -> {rate:,.0f} audio-s/s host "
            f"({rate / 4500:.1f}x the v5e TDS device rate)"
        )


if __name__ == "__main__":
    main()
