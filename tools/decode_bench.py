"""On-chip decode + streaming benchmarks (the product paths).

Reference shapes being matched:
  * offline decode — producer/consumer pipeline: accelerator AM forward ->
    emission queue -> native beam threads (`cpc/Decode.cpp:359-690`,
    `--nthread_decoder_am_forward` / `--nthread_decoder` /
    `--emission_queue_size`).
  * streaming — 500 ms chunk loop with incremental hypotheses and bounded
    memory (`examples/AudioToWords.cpp:64-105`).

Invoked via `bench.py` with BENCH_MODE=decode|streaming; emits the same
one-line JSON schema as the training bench. Synthetic setup: flagship
streaming_convnets TDS AM (115M, real arch file) with random params, a
5k-word lexicon over wordpiece tokens, and a 3-gram KN LM trained on
synthetic text — beam dynamics and throughput are what's measured, not WER.
"""

import json
import os
import queue
import sys
import tempfile
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STREAMING_ARCH = (
    "/root/reference/recipes/streaming_convnets/librispeech/"
    "am_500ms_future_context.arch"
)


def _synth_lexicon_and_lm(n_words, n_tokens, tmpdir, order=3, seed=0):
    """Random lexicon (2-5 token spellings) + KN n-gram LM over the words."""
    from wav2letter_tpu.tools.ngram_lm import train_ngram_lm

    rng = np.random.RandomState(seed)
    words = [f"w{i:05d}" for i in range(n_words)]
    spellings = {
        w: [list(rng.randint(1, n_tokens - 2, rng.randint(2, 6)))]
        for w in words
    }
    # zipf-ish corpus for a non-degenerate LM
    probs = 1.0 / np.arange(1, n_words + 1)
    probs /= probs.sum()
    corpus = os.path.join(tmpdir, "corpus.txt")
    with open(corpus, "w") as f:
        for _ in range(3000):
            L = rng.randint(4, 14)
            f.write(" ".join(rng.choice(words, L, p=probs)) + "\n")
    arpa = os.path.join(tmpdir, "lm.arpa")
    train_ngram_lm(corpus, arpa, order=order)
    return words, spellings, arpa


def _make_bench_convlm(words, lm_memory=50000):
    """Small GCNN word LM over the bench vocab (deferred-scoring path)."""
    import jax
    import jax.numpy as jnp

    from wav2letter_tpu.decoder.convlm import ConvLM
    from wav2letter_tpu.models.arch import parse_arch_lines
    from wav2letter_tpu.models.lm import LMArchModel

    V = len(words) + 2  # + </s>, <unk>
    lines = [
        "V -1 0 1 1", f"E 128 {V}", "RO 1 3 0 2",
        "WN 3 AC 128 256 5 1 -1 0", "GLU 2",
        "WN 3 AC 128 256 5 1 -1 0", "GLU 2",
        "RO 2 0 3 1", f"WN 0 L 128 {V}",
    ]
    m = LMArchModel(tuple(parse_arch_lines(lines)), V, V)
    p = m.init({"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 8), jnp.int32))
    vocab = list(words) + ["</s>", "<unk>"]
    return ConvLM(m, p, vocab, usr_vocab=words, context=16,
                  lm_memory=lm_memory)


def _build_native(words, spellings, arpa, n_tokens, beam, sil, blank,
                  convlm=None):
    from wav2letter_tpu.decoder import CriterionType, DecoderOptions
    from wav2letter_tpu.decoder.native import (
        NativeBeamDecoder, NativeExternalLM, NativeLM, NativeTrie,
    )

    opts = DecoderOptions(
        beam_size=beam, beam_size_token=30, beam_threshold=100.0,
        lm_weight=1.5, word_score=0.5, unk_score=-np.inf, sil_score=0.2,
        log_add=False, criterion_type=CriterionType.CTC,
    )
    if convlm is not None:
        lm = NativeExternalLM(convlm)
        score_lm = convlm
    else:
        from wav2letter_tpu.decoder.lm import KenLM

        lm = NativeLM(arpa, usr_vocab=words)
        score_lm = KenLM(arpa, usr_vocab=words)
    trie = NativeTrie(n_tokens)
    start = score_lm.start(False)
    for wi, w in enumerate(words):
        _, sc = score_lm.score(start, wi)
        for sp in spellings[w]:
            trie.insert(sp, wi, sc)
    trie.smear("max")
    return NativeBeamDecoder(opts, trie, lm, sil, blank, -1, n_tokens,
                             is_token_lm=False)


def run_decode_bench():
    """TPU AM forward -> emission queue -> native beam consumer pool."""
    import jax
    import jax.numpy as jnp

    from wav2letter_tpu.features import FeatureParams, Featurizer
    from wav2letter_tpu.models.arch import build_arch_module

    n_feat, n_label = 80, 9998
    beam = int(os.environ.get("BENCH_BEAM", "50"))
    n_thr = int(os.environ.get("BENCH_NTHREAD", "4"))
    secs = float(os.environ.get("BENCH_SECS", "15"))
    n_utts = int(os.environ.get("BENCH_UTTS", "32"))
    B = int(os.environ.get("BENCH_BATCH", "8"))

    model = build_arch_module(STREAMING_ARCH, n_feat, n_label)
    featurizer = Featurizer(FeatureParams(n_filterbanks=n_feat))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 128, n_feat)),
                        jnp.asarray([128]))

    # device-side top-k emission compression (BENCH_TOPK=0 to ship full
    # rows): the beam reads only the top beam_size_token tokens per frame,
    # so (val, idx) pairs cut device->host transfer ~V/k — the producer's
    # bottleneck (60 MB/batch full vs ~0.4 MB compressed at k=30)
    topk = int(os.environ.get("BENCH_TOPK", "30"))

    @jax.jit
    def fwd(params, audio, audio_len):
        # params as an argument (NOT closed over: closure would embed 115M
        # floats as HLO constants — oversized compile payloads)
        feats, flen = featurizer(audio, audio_len)
        em, elen = model.apply(params, feats.astype(jnp.bfloat16), flen)
        em = em.astype(jnp.float32)
        # trained CTC models are blank-dominant; the random-init AM is not,
        # which starves the beam (candidate sets need blank present). Boost
        # blank to reproduce the trained regime for beam-dynamics purposes.
        em = em.at[..., n_label - 1].add(4.0)
        em = jax.nn.log_softmax(em, -1)
        if topk > 0:
            vals, idx = jax.lax.top_k(em, topk)
            return vals, idx.astype(jnp.int32), elen
        return em, None, elen

    def fetch(out):
        """-> per-utterance full emission rows (sparse-reconstructed)."""
        vals, idx, elen = out
        el = np.asarray(elen)
        if idx is None:
            em_np = np.asarray(vals)
            return [em_np[i, : int(el[i])] for i in range(em_np.shape[0])]
        v, ix = np.asarray(vals), np.asarray(idx)
        outs = []
        for i in range(v.shape[0]):
            T = int(el[i])
            e = np.full((T, n_label), -1e30, np.float32)
            np.put_along_axis(e, ix[i, :T], v[i, :T], axis=1)
            outs.append(e)
        return outs

    s = int(16000 * secs)
    audio = 0.1 * jax.random.normal(rng, (B, s), jnp.float32)
    alen = jnp.full((B,), s, jnp.int32)
    fetch(fwd(params, audio, alen))  # compile

    tmpdir = tempfile.mkdtemp(prefix="w2l_decbench_")
    words, spellings, arpa = _synth_lexicon_and_lm(5000, n_label, tmpdir)

    # BENCH_LM=convlm: neural LM through the deferred batched-scoring
    # protocol (one device call per step batch per decoder) instead of the
    # in-process n-gram
    lm_kind = os.environ.get("BENCH_LM", "ngram")
    t0 = time.perf_counter()
    decoders = [
        _build_native(
            words, spellings, arpa, n_label, beam, 0, n_label - 1,
            convlm=_make_bench_convlm(words) if lm_kind == "convlm" else None,
        )
        for _ in range(n_thr)
    ]
    build_s = time.perf_counter() - t0

    emq: "queue.Queue" = queue.Queue(maxsize=64)
    beam_time = [0.0] * n_thr
    done = [0]
    lock = threading.Lock()

    def consumer(ti):
        dec = decoders[ti]
        while True:
            item = emq.get()
            if item is None:
                return
            t0 = time.perf_counter()
            dec.decode(item)
            beam_time[ti] += time.perf_counter() - t0
            with lock:
                done[0] += 1

    threads = [threading.Thread(target=consumer, args=(i,)) for i in range(n_thr)]
    wall0 = time.perf_counter()
    for t in threads:
        t.start()
    # producer: one TPU forward per batch, emissions to the queue
    produced = 0
    while produced < n_utts:
        rows = fetch(fwd(params, audio, alen))
        for i in range(min(B, n_utts - produced)):
            emq.put(rows[i])
        produced += min(B, n_utts - produced)
    for _ in threads:
        emq.put(None)
    for t in threads:
        t.join()
    wall = time.perf_counter() - wall0

    audio_s = n_utts * secs
    rtf = wall / audio_s
    beam_rtf = sum(beam_time) / n_thr / audio_s  # per-thread avg
    print(json.dumps({
        "metric": f"decode_rtf_beam{beam}_nt{n_thr}" + (
            "_convlm" if lm_kind == "convlm" else ""),
        "value": round(rtf, 5),
        "unit": "RTF (end-to-end wall / audio-s; TPU AM fwd + emission queue + native beam)",
        "vs_baseline": round(1.0 / rtf, 1),
        "baseline_note": "vs_baseline = x realtime; reference publishes no decode RTF",
        "beam_rtf_per_thread": round(beam_rtf, 5),
        "x_realtime": round(1.0 / rtf, 1),
        "decoder_build_s": round(build_s, 2),
        "utts": n_utts, "secs": secs, "batch": B, "emission_topk": topk,
    }))


def run_streaming_bench():
    """500 ms chunk loop through the converted flagship bundle + online
    native decoder: per-chunk p50/p95 latency and RTF."""
    import jax
    import jax.numpy as jnp

    from wav2letter_tpu.features import FeatureParams
    from wav2letter_tpu.inference.convert import (
        build_streaming_layers, map_params, parse_arch_file,
    )
    from wav2letter_tpu.inference.streaming import (
        StreamingFeaturizer, StreamingNetwork,
    )
    from wav2letter_tpu.models.arch import build_arch_module

    n_feat, n_label = 80, 9998
    beam = int(os.environ.get("BENCH_BEAM", "100"))
    secs = float(os.environ.get("BENCH_SECS", "15"))
    chunk_ms = int(os.environ.get("BENCH_CHUNK_MS", "500"))

    model = build_arch_module(STREAMING_ARCH, n_feat, n_label)
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 128, n_feat)),
                        jnp.asarray([128]))

    lines = parse_arch_file(STREAMING_ARCH, n_feat, n_label)
    layers, pmap = build_streaming_layers(lines, n_feat)
    sparams = map_params(pmap, params["params"])
    # blank-dominance bias (see run_decode_bench): fold +4.0 into the final
    # linear's blank bias so the untrained AM behaves like a trained CTC
    for k in sparams:
        if k.endswith("_b") and sparams[k].shape[-1] == n_label:
            b = np.array(sparams[k])
            b[..., n_label - 1] += 4.0
            sparams[k] = b
    net = StreamingNetwork(layers, sparams)

    fp = FeatureParams(n_filterbanks=n_feat, local_norm_left=300)
    sf = StreamingFeaturizer(fp)

    tmpdir = tempfile.mkdtemp(prefix="w2l_sbench_")
    words, spellings, arpa = _synth_lexicon_and_lm(5000, n_label, tmpdir)
    dec = _build_native(words, spellings, arpa, n_label, beam, 0, n_label - 1)

    sr = fp.sample_rate
    chunk_samples = sr * chunk_ms // 1000
    audio = np.asarray(
        0.1 * jax.random.normal(rng, (int(sr * secs),), jnp.float32)
    )
    stride_ms = fp.frame_stride_ms

    # BENCH_STREAMS=N: multi-stream serving — the TPU-native inversion of
    # MultithreadedStreamingASRExample (one thread-pool stream per core):
    # the N streams' frames BATCH through one stream-net step on the chip,
    # while the N independent beams run on host threads.
    n_streams = int(os.environ.get("BENCH_STREAMS", "1"))
    decs = [dec] + [
        _build_native(words, spellings, arpa, n_label, beam, 0, n_label - 1)
        for _ in range(n_streams - 1)
    ]

    def run_once(collect):
        import concurrent.futures as cf

        lat = []
        fstates = [sf.start() for _ in range(n_streams)]
        nstates = net.start(n_streams)
        for d in decs:
            d.decode_begin()
        pool = (cf.ThreadPoolExecutor(n_streams) if n_streams > 1 else None)
        pos = 0
        while pos < len(audio):
            t0 = time.perf_counter()
            chunk = audio[pos : pos + chunk_samples]
            pos += len(chunk)
            outs = [sf.run(fs, chunk) for fs in fstates]
            fstates = [o[0] for o in outs]
            feats = outs[0][1]  # identical audio per stream: same frames
            if len(feats):
                x = np.broadcast_to(
                    feats[None, :, :, None],
                    (n_streams,) + feats.shape + (1,),
                )
                nstates, y = net.run(nstates, x)
                if y.shape[1]:
                    em = np.asarray(y)[:, :, 0, :]

                    def step_one(i):
                        decs[i].decode_step(em[i])
                        decs[i].get_best_hypothesis(0)
                        decs[i].prune(look_back=int(250 / stride_ms))

                    if pool is not None:
                        list(pool.map(step_one, range(n_streams)))
                    else:
                        step_one(0)
            else:
                for d in decs:
                    d.get_best_hypothesis(0)
            if collect:
                lat.append(time.perf_counter() - t0)
        nstates, y = net.finish(nstates)
        if y is not None and y.shape[1]:
            em = np.asarray(y)[:, :, 0, :]
            for i, d in enumerate(decs):
                d.decode_step(em[i])
        for d in decs:
            d.decode_end()
        if pool is not None:
            pool.shutdown()
        return lat

    run_once(False)  # warmup: compiles every chunk-shape step
    t0 = time.perf_counter()
    lat = run_once(True)
    wall = time.perf_counter() - t0
    lat_ms = np.asarray(lat) * 1000
    rtf = wall / secs
    print(json.dumps({
        "metric": f"streaming_chunk{chunk_ms}ms_beam{beam}" + (f"_x{n_streams}" if n_streams > 1 else ""),
        "value": round(float(np.percentile(lat_ms, 50)), 2),
        "unit": "ms p50 per-chunk latency (feat+net+beam+hyp, 500ms chunks)",
        "vs_baseline": round(chunk_ms / float(np.percentile(lat_ms, 50)), 2),
        "baseline_note": "vs_baseline = chunk budget / p50 (>1 = faster than realtime)",
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "max_ms": round(float(lat_ms.max()), 2),
        "rtf": round(rtf, 4),
        "x_realtime": round(1.0 / rtf, 1),
        "streams": n_streams,
        "aggregate_x_realtime": round(n_streams / rtf, 1),
        "chunks": len(lat),
    }))


if __name__ == "__main__":
    mode = os.environ.get("BENCH_MODE", "decode")
    if mode == "streaming":
        run_streaming_bench()
    elif mode == "decode_s2s":
        run_s2s_decode_bench()
    else:
        run_decode_bench()


def run_s2s_decode_bench():
    """S2S product decode on-chip: TDS encoder forward on the TPU, then
    decoder-in-the-loop beam — ONE batched jitted device call per output
    position (the beam is the batch) driving the native S2S beam
    (cpc/Decode.cpp:529-624's LexiconSeq2SeqDecoder shape)."""
    import jax
    import jax.numpy as jnp

    from wav2letter_tpu.config import Config
    from wav2letter_tpu.criterions import make_criterion
    from wav2letter_tpu.decoder import CriterionType, DecoderOptions
    from wav2letter_tpu.decoder.native import NativeLM, NativeTrie
    from wav2letter_tpu.decoder.s2s_native import NativeSeq2SeqDecoder
    from wav2letter_tpu.decoder.seq2seq_beam import make_s2s_update_fn
    from wav2letter_tpu.features import FeatureParams, Featurizer
    from wav2letter_tpu.models.arch import build_arch_module

    n_feat, n_label, enc_dim = 80, 9998, 512
    beam = int(os.environ.get("BENCH_BEAM", "10"))
    secs = float(os.environ.get("BENCH_SECS", "15"))
    n_utts = int(os.environ.get("BENCH_UTTS", "8"))
    max_out = int(os.environ.get("BENCH_MAXOUT", "120"))

    arch = "/root/reference/recipes/sota/2019/am_arch/am_tds_s2s.arch"
    model = build_arch_module(arch, n_feat, enc_dim, force_label_dim=False)
    cfg = Config()
    cfg.update(dict(criterion="seq2seq", attention="keyvalue",
                    encoderdim=enc_dim, eostoken=True,
                    maxdecoderoutputlen=max_out))
    criterion = make_criterion(cfg, n_label)
    featurizer = Featurizer(FeatureParams(n_filterbanks=n_feat))
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng}, jnp.zeros((1, 128, n_feat)),
                        jnp.asarray([128]))
    em_d, el_d = model.apply(params, jnp.zeros((1, 128, n_feat)),
                             jnp.asarray([128]))
    crit_params = criterion.init(
        rng, em_d, jnp.zeros((1, 8), jnp.int32), el_d,
        jnp.full((1,), 8, jnp.int32))["params"]

    @jax.jit
    def fwd(params, audio, audio_len):
        feats, flen = featurizer(audio, audio_len)
        em, elen = model.apply(params, feats.astype(jnp.bfloat16), flen)
        return em.astype(jnp.float32), elen

    s = int(16000 * secs)
    audio = 0.1 * jax.random.normal(rng, (1, s), jnp.float32)
    alen = jnp.full((1,), s, jnp.int32)
    em, elen = fwd(params, audio, alen)
    em_np = np.asarray(em)[0, : int(np.asarray(elen)[0])]

    tmpdir = tempfile.mkdtemp(prefix="w2l_s2sbench_")
    words, spellings, arpa = _synth_lexicon_and_lm(2000, n_label, tmpdir)
    lm = NativeLM(arpa, usr_vocab=words)
    trie = NativeTrie(n_label)
    for wi, w in enumerate(words):
        for sp in spellings[w]:
            trie.insert(sp, wi, 0.0)
    trie.smear("none")
    opts = DecoderOptions(beam_size=beam, beam_size_token=10,
                          beam_threshold=100.0, lm_weight=0.8,
                          word_score=0.5, eos_score=0.0,
                          criterion_type=CriterionType.S2S)

    def decode_one():
        fn, init = make_s2s_update_fn(criterion, crit_params, em_np,
                                      em_np.shape[0])
        dec = NativeSeq2SeqDecoder(
            opts, n_label - 2, fn, init, lm=lm, trie=trie,
            word_sep_idx=0, max_output_len=max_out,
        )
        return dec.decode(n_best=1)

    decode_one()  # warm compile of the per-K step shapes
    t0 = time.perf_counter()
    for _ in range(n_utts):
        decode_one()
    wall = time.perf_counter() - t0
    rtf = wall / (n_utts * secs)
    print(json.dumps({
        "metric": f"s2s_decode_rtf_beam{beam}",
        "value": round(rtf, 5),
        "unit": "RTF (TPU encoder + per-step batched decoder device call + native beam)",
        "vs_baseline": round(1.0 / rtf, 1),
        "baseline_note": "vs_baseline = x realtime; reference publishes no decode RTF",
        "x_realtime": round(1.0 / rtf, 1),
        "utts": n_utts, "secs": secs, "max_out": max_out,
    }))
