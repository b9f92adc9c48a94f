#!/bin/bash
# Post-soak bench sweep (round 5; authored round 4): run AFTER the soak finishes (the trained flagship
# checkpoint at _local/soak/b128/model_last.bin feeds the decode/streaming
# benches). Each line appends one JSON record to _local/bench_r5.jsonl.
set -u
export JAX_COMPILATION_CACHE_DIR=_local/jax_cache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5
cd "$(dirname "$0")/.."
OUT=_local/bench_r5.jsonl
: > "$OUT"
run() {
  echo "### $*" >&2
  env "$@" timeout 1800 python bench.py 2>/dev/null | tail -1 >> "$OUT"
  tail -1 "$OUT" >&2
}

# --- offline decode: trained AM, corpus scale then production scale -----
run BENCH_MODE=decode BENCH_BEAM=50 BENCH_UTTS=64
run BENCH_MODE=decode BENCH_BEAM=500 BENCH_UTTS=32
run BENCH_MODE=decode BENCH_BEAM=500 BENCH_UTTS=32 BENCH_TOPK=0
run BENCH_MODE=decode BENCH_SCALE=prod BENCH_BEAM=50 BENCH_UTTS=64
run BENCH_MODE=decode BENCH_SCALE=prod BENCH_BEAM=500 BENCH_UTTS=32
run BENCH_MODE=decode BENCH_SCALE=prod BENCH_LM_FORMAT=qt BENCH_BEAM=50 BENCH_UTTS=64

# --- streaming: stream-count sweep, overlap on/off ----------------------
for s in 1 2 4 8 16 32; do
  run BENCH_MODE=streaming BENCH_STREAMS=$s BENCH_OVERLAP=1
done
run BENCH_MODE=streaming BENCH_STREAMS=8 BENCH_OVERLAP=0
run BENCH_MODE=streaming BENCH_STREAMS=1 BENCH_OVERLAP=0

# --- s2s decode: sequential vs cross-utterance batched ------------------
run BENCH_MODE=decode_s2s BENCH_S2S_BATCH=1 BENCH_UTTS=8
run BENCH_MODE=decode_s2s BENCH_S2S_BATCH=8 BENCH_UTTS=32
run BENCH_MODE=decode_s2s BENCH_S2S_BATCH=16 BENCH_UTTS=32

# --- transformer_s2s train family (VERDICT r3 weak #7) ------------------
run BENCH_MODEL=transformer_s2s BENCH_ITERS=8
run BENCH_MODEL=transformer_s2s BENCH_BATCH=64 BENCH_ITERS=8

echo "sweep done -> $OUT" >&2
