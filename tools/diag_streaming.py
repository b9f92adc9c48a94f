"""Diagnose streaming-vs-offline emission divergence on a trained checkpoint.

Compares, for one utterance:
  1. batch featurizer vs StreamingFeaturizer output
  2. batch model emissions vs StreamingNetwork emissions fed the SAME features
  3. end-to-end streaming emissions (streaming feats -> streaming net)

Usage: JAX_PLATFORMS=cpu python tools/diag_streaming.py [--am PATH] [--bundle PATH]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--am", default="_local/soak/b128/model_last.bin")
    ap.add_argument("--bundle", default="_local/soak/am.stream")
    ap.add_argument("--lst", default="_local/soak/test_sub.lst")
    ap.add_argument("--chunk_ms", type=int, default=500)
    args = ap.parse_args()

    from wav2letter_tpu.config import Config
    from wav2letter_tpu.data import read_list_file
    from wav2letter_tpu.data.audio import load_audio
    from wav2letter_tpu.inference import StreamingFeaturizer, load_streaming_bundle
    from wav2letter_tpu.runtime.test import Evaluator

    cfg = Config()
    cfg.update({"am": args.am, "test": args.lst, "batchsize": 1})
    ev = Evaluator(cfg)

    net, featp, meta = load_streaming_bundle(args.bundle)

    s = read_list_file(args.lst)[0]
    audio = load_audio(s.audio_path, 16000).astype(np.float32)
    T = len(audio)
    print(f"utt {s.sample_id}: {T} samples ({T/16000:.2f}s)")

    # --- 1. batch emissions + batch features
    a = jnp.asarray(audio)[None]
    alen = jnp.asarray([T], jnp.int32)
    feats_b, flen_b = ev.featurizer(a, alen)
    feats_b = np.asarray(feats_b)[0, : int(flen_b[0])]
    em_b, elen_b = ev.emissions({"audio": audio[None], "audio_len": np.asarray([T])})
    em_b = np.asarray(em_b)[0, : int(elen_b[0])]
    print(f"batch: feats {feats_b.shape}, emissions {em_b.shape}")

    # --- 2. streaming features
    sf = StreamingFeaturizer(featp)
    st = sf.start()
    chunks = []
    cs = int(args.chunk_ms / 1000 * 16000)
    for off in range(0, T, cs):
        st, f = sf.run(st, audio[off : off + cs])
        if len(f):
            chunks.append(f)
    st, f = sf.finish(st)
    if len(f):
        chunks.append(f)
    feats_s = np.concatenate(chunks, axis=0)
    n = min(len(feats_b), len(feats_s))
    fd = np.abs(feats_b[:n] - feats_s[:n])
    print(f"stream feats {feats_s.shape} (batch {feats_b.shape}); "
          f"max|diff| over first {n}: {fd.max():.6g}, mean {fd.mean():.6g}")

    # --- 3. streaming net on BATCH features (isolates net from featurizer)
    def stream_net(feats, tag):
        states = net.start(1)
        outs = []
        # mimic soak: feed per-chunk frame groups (~48 frames per 500ms)
        group = max(1, int(args.chunk_ms / 10))
        for off in range(0, len(feats), group):
            f = feats[off : off + group]
            states, y = net.run(states, f[None, :, :, None])
            if y is not None and y.shape[1]:
                outs.append(np.asarray(y))
        states, y = net.finish(states)
        if y is not None and y.shape[1]:
            outs.append(np.asarray(y))
        em = np.concatenate([o.reshape(o.shape[0], o.shape[1], -1) for o in outs], axis=1)[0]
        print(f"{tag}: emissions {em.shape}")
        return em

    em_s_bf = stream_net(feats_b, "stream-net(batch feats)")
    em_s_sf = stream_net(feats_s, "stream-net(stream feats)")

    for tag, em_s in (("net-only", em_s_bf), ("end-to-end", em_s_sf)):
        n = min(len(em_b), len(em_s))
        d = np.abs(em_b[:n] - em_s[:n])
        agree = (em_b[:n].argmax(-1) == em_s[:n].argmax(-1)).mean()
        print(f"[{tag}] frames batch={len(em_b)} stream={len(em_s)}; "
              f"max|diff|={d.max():.4f} mean={d.mean():.5f} argmax-agree={agree:.3f}")

    # greedy decode both
    def greedy(em):
        blank = em.shape[-1] - 1
        ids = em.argmax(-1)
        out = []
        prev = -1
        for t in ids:
            if t != prev and t != blank:
                out.append(int(t))
            prev = t
        return out

    toks = [str(t) for t in meta["tokens"]]
    def to_words(idsq):
        return "".join(toks[i] for i in idsq).replace("|", " ").strip()

    print("REF :", s.transcript)
    print("BATCH greedy :", to_words(greedy(em_b)))
    print("STRM greedy (batch feats):", to_words(greedy(em_s_bf)))
    print("STRM greedy (strm feats) :", to_words(greedy(em_s_sf)))


if __name__ == "__main__":
    main()
