#!/usr/bin/env python
"""Interactive streaming ASR (InteractiveStreamingASRExample equivalent):
reads raw PCM16 or float32 audio from stdin in chunks and prints words as
they are decoded; type of stream set by --input_format.

    arecord -f S16_LE -r 16000 -c 1 | python cli/streaming_asr_interactive.py \\
        --bundle=am.stream [--lexicon_file=... --language_model_file=...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    args = {}
    for a in sys.argv[1:]:
        if a.startswith("--"):
            k, _, v = a[2:].partition("=")
            args[k] = v if v else "true"

    from cli.streaming_asr_multi import DecoderFactory
    from wav2letter_tpu.data.dictionary import Dictionary
    from wav2letter_tpu.data.targets import tokens_to_words
    from wav2letter_tpu.inference import StreamingFeaturizer, load_streaming_bundle

    net, featp, meta = load_streaming_bundle(args["bundle"])
    tokens = [str(t) for t in meta["tokens"]]
    tok_dict = Dictionary(tokens)
    blank = len(tokens) - 1 if str(meta.get("criterion", "ctc")) == "ctc" else -1
    wsep = str(meta.get("wordseparator", "|"))
    sil = tok_dict.get_index(wsep) if wsep in tok_dict else 0
    trans = np.asarray(meta["transitions"]) if "transitions" in meta else None
    factory = DecoderFactory(
        args, {"tok_index": {t: i for i, t in enumerate(tokens)}},
        len(tokens), blank, sil, trans,
    )
    dec = factory.make()
    sf = StreamingFeaturizer(featp)
    fstate = sf.start()
    states = net.start(1)
    dec.decode_begin()

    fmt = args.get("input_format", "s16le")
    chunk_samples = featp.sample_rate // 2
    chunk_bytes = chunk_samples * (2 if fmt == "s16le" else 4)
    printed = 0
    stdin = sys.stdin.buffer

    def emit(final=False):
        nonlocal printed
        res = dec.get_best_hypothesis()
        if factory.word_dict:
            ws = [factory.word_dict.get_entry(w) for w in res.words if w >= 0]
        else:
            toks = [t for t in res.tokens if t >= 0 and t != blank]
            dedup = [t for i, t in enumerate(toks) if i == 0 or t != toks[i - 1]]
            ws = tokens_to_words(tok_dict.map_indices(dedup), wsep)
        new = ws[printed:]
        if new:
            print(" ".join(new), flush=True)
            printed = len(ws)

    while True:
        buf = stdin.read(chunk_bytes)
        if not buf:
            break
        if fmt == "s16le":
            audio = np.frombuffer(buf, np.int16).astype(np.float32) / 32768.0
        else:
            audio = np.frombuffer(buf, np.float32)
        fstate, feats = sf.run(fstate, audio)
        if len(feats):
            states, y = net.run(states, feats[None, :, :, None])
            if y.shape[1]:
                dec.decode_step(np.asarray(y)[0, :, 0, :])
        emit()
        dec.prune(look_back=25)
    states, y = net.finish(states)
    if y is not None and y.shape[1]:
        dec.decode_step(np.asarray(y)[0, :, 0, :])
    dec.decode_end()
    emit(final=True)


if __name__ == "__main__":
    main()
