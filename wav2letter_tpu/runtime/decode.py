"""Decode executor — offline beam-search decoding (``fl_asr_decode``;
reference call stack SURVEY.md §3.2, ``cpc/Decode.cpp``):

AM forward (or ``--emission_dir`` cache) feeding an emission queue drained by
``--nthread_decoder`` beam threads; per-thread decoder built from
tokens/lexicon/LM flags; WER meters + sclite ``.hyp/.ref/.log`` outputs +
beam dump. The TPU AM forward is batched (producer); beam search runs on
host CPU threads exactly like the reference's consumer pool.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Dict, List, Optional

import numpy as np

from ..config import Config
from ..data import AsrDataset, PrefetchIterator, make_word_dict
from ..data.dictionary import unpack_replabels
from ..data.targets import tokens_to_words
from ..decoder import (
    ArpaLM,
    KenLM,
    CriterionType,
    DecoderOptions,
    LexiconDecoder,
    LexiconFreeDecoder,
    SmearingMode,
    Trie,
    ZeroLM,
)
from .meters import DatasetMeters
from .test import Evaluator


def _native_required() -> bool:
    """W2L_REQUIRE_NATIVE=1 -> a native-core build/load failure raises
    instead of silently decoding ~100x slower on the Python beam. The decode
    CLI defaults it ON (reference parity: fl_asr_decode links its decoder
    library at build time — a missing lib fails the build, it never silently
    degrades)."""
    return os.environ.get("W2L_REQUIRE_NATIVE", "0") == "1"


def _native_failed(exc: BaseException, what: str = "beam decoder"):
    """Handle a native-core failure: raise under W2L_REQUIRE_NATIVE=1, else
    warn loudly (naming the exception) and let the caller fall back."""
    import warnings

    msg = (
        f"native {what} unavailable ({type(exc).__name__}: {exc}); "
        "falling back to the ~100x-slower Python beam. Set "
        "W2L_REQUIRE_NATIVE=1 to make this an error."
    )
    if _native_required():
        raise RuntimeError(
            f"native {what} unavailable ({type(exc).__name__}: {exc}) and "
            "W2L_REQUIRE_NATIVE=1 — refusing the ~100x-slower Python beam "
            "fallback. Set W2L_REQUIRE_NATIVE=0 to allow it."
        ) from exc
    warnings.warn(msg, RuntimeWarning, stacklevel=3)


def make_decode_lm(cfg, usr_vocab):
    """LM selection per ``--lmtype`` (reference Decode.cpp:242-277):
    ``kenlm`` (default; ARPA or binary n-gram) or ``convlm`` (neural GCNN LM
    forwarded on device with ``--lm_vocab`` mapping and an ``--lm_memory``
    score cache). ``--lmdict``: explicit LM dictionary — usr tokens are
    scored through its entries (tokens absent from it score as <unk>)."""
    if not cfg.lm:
        return ZeroLM()
    if cfg.lmdict:
        from ..data.dictionary import Dictionary

        lmd = Dictionary.from_file(cfg.lmdict)
        usr_vocab = [w if lmd.contains(w) else "<unk>" for w in (usr_vocab or [])]
    if cfg.lmtype == "convlm":
        from ..decoder.convlm import load_convlm

        return load_convlm(
            cfg.lm, cfg.lm_vocab, usr_vocab=usr_vocab, lm_memory=cfg.lm_memory
        )
    return KenLM(cfg.lm, usr_vocab=usr_vocab)


def build_decoder(cfg, token_dict, lexicon, transitions=None, use_native=True):
    """Construct the decoder per flags (reference Decode.cpp:242-624).
    Prefers the native C++ core when it builds; falls back to Python."""
    opts = DecoderOptions.from_config(cfg)
    n_tokens = len(token_dict)
    sil = token_dict.get_index(cfg.wordseparator) if cfg.wordseparator in token_dict else 0
    blank = n_tokens - 1 if cfg.criterion == "ctc" else -1

    use_lexicon = cfg.uselexicon and lexicon is not None
    word_level_lm = cfg.decodertype == "wrd"

    word_dict = make_word_dict(lexicon) if lexicon else None

    # ConvLM scores on device through the native core's deferred-LM
    # protocol: the C++ beam collects each step's (state, word) requests and
    # one batched JAX call resolves them (reference instead pins one GPU per
    # decoder thread, Decode.cpp:494-517)
    if use_native:
        try:
            return _build_native_decoder(
                cfg, opts, token_dict, lexicon, word_dict, transitions,
                sil, blank, n_tokens, use_lexicon, word_level_lm,
            )
        except Exception as e:
            _native_failed(e)  # raises under W2L_REQUIRE_NATIVE=1

    vocab = (
        (word_dict.entries() if word_dict else None)
        if word_level_lm
        else token_dict.entries()
    )
    lm = make_decode_lm(cfg, vocab)

    if use_lexicon:
        trie = Trie(n_tokens)
        smear = {
            "none": SmearingMode.NONE,
            "max": SmearingMode.MAX,
            "logadd": SmearingMode.LOGADD,
        }[cfg.smearing]
        # word unigram start scores from the LM (Decoder.cpp:73-94)
        start_state = lm.start(False) if cfg.lm else None
        for w, spellings in lexicon.entries.items():
            widx = word_dict.get_index(w)
            score = 0.0
            if cfg.lm and word_level_lm:
                _, score = lm.score(start_state, widx)
            for sp in spellings:
                toks = []
                for t in sp:
                    if token_dict.contains(t):
                        toks.append(token_dict.get_index(t))
                if cfg.criterion == "asg" and cfg.replabel > 0:
                    from ..data.dictionary import pack_replabels

                    base = n_tokens - cfg.replabel
                    toks = pack_replabels(toks, cfg.replabel, base)
                if toks:
                    trie.insert(toks, widx, score)
        trie.smear(smear)
        unk = word_dict.get_index("<unk>") if word_dict else -1
        dec = LexiconDecoder(
            opts, trie, lm, sil, blank, unk,
            transitions=transitions,
            is_token_lm=not word_level_lm,
        )
        return dec, word_dict
    dec = LexiconFreeDecoder(opts, lm, sil, blank, transitions=transitions)
    return dec, word_dict


def _build_native_decoder(cfg, opts, token_dict, lexicon, word_dict,
                          transitions, sil, blank, n_tokens, use_lexicon,
                          word_level_lm):
    from ..decoder.native import (
        NativeBeamDecoder, NativeExternalLM, NativeLM, NativeTrie,
    )

    lm = None
    convlm = None
    if cfg.lm:
        vocab = (
            word_dict.entries() if (word_level_lm and word_dict)
            else token_dict.entries()
        )
        if cfg.lmtype == "convlm":
            convlm = make_decode_lm(cfg, vocab)  # Python ConvLM scorer
            lm = NativeExternalLM(convlm)
        else:
            lm = NativeLM(cfg.lm, usr_vocab=vocab)
    trie = None
    unk = -1
    if use_lexicon:
        trie = NativeTrie(n_tokens)

        # word start scores for smearing (ConvLM: one cached device row;
        # n-gram: python ArpaLM reused just for unigram scores)
        score_lm = None
        if cfg.lm and word_level_lm:
            score_lm = convlm if convlm is not None else KenLM(
                cfg.lm, usr_vocab=word_dict.entries()
            )
        start = score_lm.start(False) if score_lm else None
        for w, spellings in lexicon.entries.items():
            widx = word_dict.get_index(w)
            score = 0.0
            if score_lm is not None:
                _, score = score_lm.score(start, widx)
            for sp in spellings:
                toks = [token_dict.get_index(t) for t in sp if token_dict.contains(t)]
                if cfg.criterion == "asg" and cfg.replabel > 0:
                    from ..data.dictionary import pack_replabels

                    toks = pack_replabels(toks, cfg.replabel, n_tokens - cfg.replabel)
                if toks:
                    trie.insert(toks, widx, score)
        trie.smear(cfg.smearing)
        unk = word_dict.get_index("<unk>") if word_dict else -1
    trans = np.asarray(transitions, np.float32) if transitions is not None else None
    dec = NativeBeamDecoder(
        opts, trie, lm, sil, blank, unk, n_tokens,
        transitions=trans, is_token_lm=not word_level_lm,
    )
    return dec, word_dict


def result_to_words(res, word_dict, token_dict, cfg, n_classes):
    """DecodeResult -> word strings (reference Decoder.cpp:113-164)."""
    words = [word_dict.get_entry(w) for w in res.words if w >= 0] if word_dict else None
    if words:
        return words
    # token path: collapse + replabel unpack + split on separator
    toks = [t for t in res.tokens if t >= 0]
    dedup = []
    prev = None
    for t in toks:
        if t != prev:
            dedup.append(t)
        prev = t
    blank = n_classes - 1 if cfg.criterion == "ctc" else None
    dedup = [t for t in dedup if t != blank]
    if cfg.criterion == "asg" and cfg.replabel > 0:
        dedup = unpack_replabels(dedup, cfg.replabel, n_classes - cfg.replabel)
    return tokens_to_words(
        token_dict.map_indices(dedup), cfg.wordseparator, cfg.usewordpiece
    )


def run_decode(cfg: Config) -> Dict[str, float]:
    ev = Evaluator(cfg)
    ecfg = ev.cfg
    # decode flags come from the caller cfg, not the checkpoint
    for k in ("lm", "lmweight", "wordscore", "silscore", "eosscore", "unkscore",
              "beamsize", "beamsizetoken", "beamthreshold", "smearing",
              "decodertype", "uselexicon", "logadd", "nthread_decoder", "sclite",
              "show", "showletters", "isbeamdump", "smoothingtemperature",
              "lmtype", "lm_vocab", "lm_memory", "lmdict",
              "attentionthreshold", "hardselection", "softselection",
              "s2s_batch_decode",
              "use_completed_hyp", "emission_queue_size"):
        ecfg.update({k: cfg.get(k)})

    ds = AsrDataset(ecfg.test, ev.token_dict, ev.lexicon, ecfg, batch_size=ecfg.batchsize)
    trans = np.asarray(ev.transitions) if ev.transitions is not None else None

    meters = DatasetMeters()
    lock = threading.Lock()
    emq: "queue.Queue" = queue.Queue(maxsize=ecfg.emission_queue_size)
    sclite_rows: List[tuple] = []
    beam_dump: Dict[str, list] = {}

    # --nthread_decoder_am_forward producer threads, each forwarding a
    # disjoint stripe of the batch list (reference Decode.cpp:362-453 runs
    # one GPU per producer; here all stripes share the one TPU — XLA
    # serializes device work while host-side featurize/fetch overlaps)
    n_producers = max(1, cfg.get("nthread_decoder_am_forward") or 1)
    producers_left = [n_producers]
    producers_left_lock = threading.Lock()

    # emission-transfer compression: the beam only reads the top
    # --beamsizetoken tokens per frame, so when that bounds the vocab the
    # producer ships device-side top-k (val, idx) pairs instead of full
    # (T, V) rows — ~V/k less device->host traffic — and rebuilds sparse
    # rows (-1e30 fill) host-side. Bit-identical decode: the beam's own
    # per-frame top-k selects exactly the shipped set.
    use_topk = (
        ecfg.criterion not in ("seq2seq", "transformer")
        and 0 < ecfg.beamsizetoken < ev.n_classes
        and not (cfg.get("emission_dir") or "")
    )

    def producer(stripe=0):
        emission_dir = cfg.get("emission_dir") or ""
        specs = ds.batch_specs()[stripe::n_producers]
        it = PrefetchIterator(ds, specs, num_threads=max(1, ecfg.nthread))
        for batch in it:
            # emission cache (reference --emission_dir, Decode.cpp:444-450):
            # load pre-computed emissions when present, else forward + save
            need_fwd = True
            if emission_dir:
                cached = []
                for i in range(batch["audio"].shape[0]):
                    sid = ds.samples[int(batch["sample_idx"][i])].sample_id
                    p = os.path.join(emission_dir, f"{sid}.npz")
                    cached.append(np.load(p)["emission"] if os.path.exists(p) else None)
                need_fwd = any(c is None for c in cached)
            topk = None
            if need_fwd:
                if use_topk:
                    vals, idx, elen = ev.emissions_topk(batch, ecfg.beamsizetoken)
                    topk = (np.asarray(vals), np.asarray(idx))
                else:
                    em, elen = ev.emissions(batch)
                    em = np.asarray(em)
                elen = np.asarray(elen)
            for i in range(batch["audio"].shape[0]):
                sidx = int(batch["sample_idx"][i])
                sid = ds.samples[sidx].sample_id
                tl = int(batch["target_len"][i])
                if not need_fwd:
                    e = cached[i]
                elif topk is not None:
                    T = int(elen[i])
                    e = np.full((T, ev.n_classes), -1e30, np.float32)
                    np.put_along_axis(e, topk[1][i, :T], topk[0][i, :T], axis=1)
                else:
                    e = em[i, : int(elen[i])]
                    if emission_dir:
                        os.makedirs(emission_dir, exist_ok=True)
                        np.savez(os.path.join(emission_dir, f"{sid}.npz"), emission=e)
                emq.put((sid, e, [int(t) for t in batch["target"][i, :tl]]))
        # last producer standing enqueues the consumer end-sentinels
        with producers_left_lock:
            producers_left[0] -= 1
            done = producers_left[0] == 0
        if done:
            for _ in range(max(1, ecfg.nthread_decoder)):
                emq.put(None)

    is_s2s = ecfg.criterion in ("seq2seq", "transformer")

    def consumer():
        if not is_s2s:
            dec, word_dict = build_decoder(ecfg, ev.token_dict, ev.lexicon, trans)
        else:
            # decoder-in-the-loop beam (reference LexiconSeq2SeqDecoder /
            # LexiconFreeSeq2SeqDecoder, Decode.cpp:529-624): built per
            # utterance around the batched attention-decoder step
            from ..data.dictionary import make_word_dict as _mwd
            from ..decoder import DecoderOptions as _DO, SmearingMode, Trie, ZeroLM
            from ..decoder.lm import KenLM

            word_dict = _mwd(ev.lexicon) if ev.lexicon else None
            s2s_opts = _DO.from_config(ecfg)
            s2s_vocab = (
                word_dict.entries() if (ecfg.decodertype == "wrd" and word_dict)
                else ev.token_dict.entries()
            )
            # native C++ beam when the extension builds; ConvLM scores on
            # device through the deferred-LM request protocol (as in
            # build_decoder)
            try:
                from ..decoder.native import (
                    NativeExternalLM, NativeLM, NativeTrie, native_available,
                )

                s2s_native = native_available()
                if not s2s_native:
                    raise RuntimeError("native core failed to build/load")
            except Exception as e:
                s2s_native = False
                _native_failed(e, what="s2s beam decoder")
            if s2s_native:
                if ecfg.lmtype == "convlm" and ecfg.lm:
                    s2s_lm = NativeExternalLM(make_decode_lm(ecfg, s2s_vocab))
                elif ecfg.lm:
                    vocab = list(s2s_vocab)
                    if ecfg.lmdict:
                        from ..data.dictionary import Dictionary as _Dict

                        lmd = _Dict.from_file(ecfg.lmdict)
                        vocab = [
                            w if lmd.contains(w) else "<unk>" for w in vocab
                        ]
                    s2s_lm = NativeLM(ecfg.lm, usr_vocab=vocab)
                else:
                    s2s_lm = None
            else:
                s2s_lm = make_decode_lm(ecfg, s2s_vocab)
            s2s_trie = None
            if ecfg.uselexicon and ev.lexicon:
                s2s_trie = (NativeTrie(ev.n_classes) if s2s_native
                            else Trie(ev.n_classes))
                for w, sps in ev.lexicon.entries.items():
                    widx = word_dict.get_index(w)
                    for sp in sps:
                        ids = [ev.token_dict.get_index(t) for t in sp
                               if ev.token_dict.contains(t)]
                        if ids:
                            s2s_trie.insert(ids, widx, 0.0)
                s2s_trie.smear("none" if s2s_native else SmearingMode.NONE)

        def handle_s2s(sid, ref_toks, results):
            """Shared s2s result handling: beam dump, meters, sclite."""
            if ecfg.isbeamdump:
                from ..tools.rescore import BeamHyp

                pool = results
                if ecfg.use_completed_hyp:
                    # rescoring cfgs (--use_completed_hyp=true): dump
                    # only EOS-completed hypotheses
                    pool = [r for r in results if r.completed] or results
                dumped = []
                for r in pool:
                    ws = ([word_dict.get_entry(w) for w in r.words if w >= 0]
                          if word_dict else
                          tokens_to_words(
                              ev.token_dict.map_indices(
                                  [t for t in r.tokens
                                   if 0 <= t < ev.n_classes - 2]),
                              ecfg.wordseparator, ecfg.usewordpiece))
                    dumped.append(BeamHyp(sid, ws, r.am_score, r.lm_score))
                with lock:
                    beam_dump[sid] = dumped
            res = results[0]
            emitted = [w for w in res.words if w >= 0]
            if word_dict and emitted:
                hyp_w = [word_dict.get_entry(w) for w in emitted]
            else:
                # s2s tokens are final symbols: no CTC dedup/blank rules
                hyp_w = tokens_to_words(
                    ev.token_dict.map_indices(
                        [t for t in res.tokens if 0 <= t < ev.n_classes - 2]
                    ),
                    ecfg.wordseparator, ecfg.usewordpiece,
                )
            ref_w = tokens_to_words(
                ev.token_dict.map_indices(ref_toks), ecfg.wordseparator,
                ecfg.usewordpiece,
            )
            with lock:
                meters.wrd_edit.add(ref_w, hyp_w)
                meters.tkn_edit.add(ref_toks, [t for t in res.tokens if t >= 0])
                sclite_rows.append((sid, ref_w, hyp_w))
                if ecfg.show:
                    print(f"|T|: {' '.join(ref_w)}")
                    print(f"|P|: {' '.join(hyp_w)}")

        if is_s2s:
            eos = ev.n_classes - 2
            prune_kw = dict(
                attention_threshold=ecfg.attentionthreshold,
                hard_selection=ecfg.hardselection,
                soft_selection=ecfg.softselection,
            )
            s2s_nbest = 50 if ecfg.isbeamdump else 1
        # --s2s_batch_decode=N: cross-utterance batched beams — one jitted
        # decoder-step device call advances N utterances' beams
        # (NativeSeq2SeqBatchDecoder; differentially equal to sequential).
        # The reference's answer is one DecoderThread per utterance, each
        # making its own per-step AM call (Decode.cpp:529-624).
        use_batched = (
            is_s2s and s2s_native and (ecfg.s2s_batch_decode or 1) > 1
        )
        if use_batched:
            from ..decoder.s2s_native import NativeSeq2SeqBatchDecoder

            bdec = NativeSeq2SeqBatchDecoder(
                s2s_opts, eos, ev.s2s_criterion, ev.crit_params,
                lm=s2s_lm, trie=s2s_trie,
                max_output_len=ecfg.maxdecoderoutputlen, **prune_kw,
            )
        while True:
            item = emq.get()
            if item is None:
                return
            if use_batched:
                items = [item]
                got_sentinel = False
                while len(items) < ecfg.s2s_batch_decode:
                    try:
                        nxt = emq.get_nowait()
                    except queue.Empty:
                        break
                    if nxt is None:
                        got_sentinel = True
                        break
                    items.append(nxt)
                res_lists = bdec.decode(
                    [it[1] for it in items], n_best=s2s_nbest)
                for (sid, _em, ref_toks), results in zip(items, res_lists):
                    handle_s2s(sid, ref_toks, results)
                if got_sentinel:
                    return
                continue
            sid, em, ref_toks = item
            if is_s2s:
                from ..decoder.seq2seq_beam import (
                    LexiconFreeSeq2SeqDecoder,
                    LexiconSeq2SeqDecoder,
                    make_s2s_update_fn,
                )

                fn, init = make_s2s_update_fn(
                    ev.s2s_criterion, ev.crit_params, em, em.shape[0]
                )
                if s2s_native:
                    from ..decoder.s2s_native import NativeSeq2SeqDecoder

                    dec = NativeSeq2SeqDecoder(
                        s2s_opts, eos, fn, init, lm=s2s_lm, trie=s2s_trie,
                        max_output_len=ecfg.maxdecoderoutputlen, **prune_kw,
                    )
                elif s2s_trie is not None:
                    dec = LexiconSeq2SeqDecoder(
                        s2s_opts, s2s_trie, s2s_lm, eos, fn, init,
                        max_output_len=ecfg.maxdecoderoutputlen, **prune_kw,
                    )
                else:
                    dec = LexiconFreeSeq2SeqDecoder(
                        s2s_opts, eos, fn, init, s2s_lm,
                        max_output_len=ecfg.maxdecoderoutputlen, **prune_kw,
                    )
                results = dec.decode(n_best=s2s_nbest)
                handle_s2s(sid, ref_toks, results)
                continue
            if ecfg.smoothingtemperature != 1.0 and ecfg.smoothingtemperature > 0:
                em = em / ecfg.smoothingtemperature
            n_best = 50 if ecfg.isbeamdump else 1
            results = dec.decode(em, n_best)
            res = results[0]
            hyp_w = result_to_words(res, word_dict, ev.token_dict, ecfg, ev.n_classes)
            if ecfg.isbeamdump:
                from ..tools.rescore import BeamHyp

                dumped = [
                    BeamHyp(
                        sid,
                        result_to_words(r, word_dict, ev.token_dict, ecfg, ev.n_classes),
                        r.am_score, r.lm_score,
                    )
                    for r in results
                ]
                with lock:
                    beam_dump[sid] = dumped
            if ecfg.criterion == "asg" and ecfg.replabel > 0:
                ref_toks = unpack_replabels(
                    ref_toks, ecfg.replabel, ev.n_classes - ecfg.replabel
                )
            ref_w = tokens_to_words(
                ev.token_dict.map_indices(ref_toks), ecfg.wordseparator, ecfg.usewordpiece
            )
            with lock:
                meters.wrd_edit.add(ref_w, hyp_w)
                hyp_toks_display = [t for t in res.tokens if t >= 0]
                meters.tkn_edit.add(ref_toks, hyp_toks_display)
                sclite_rows.append((sid, ref_w, hyp_w))
                if ecfg.show:
                    print(f"|T|: {' '.join(ref_w)}")
                    print(f"|P|: {' '.join(hyp_w)}")
                if ecfg.showletters:
                    toks = ev.token_dict.map_indices(
                        [t for t in res.tokens if 0 <= t < ev.n_classes]
                    )
                    print(f"|t|: {' '.join(toks)}")

    # a dead worker must fail the decode loudly (the reference binary
    # aborts); otherwise empty meters report a silent WER of 0.00%
    worker_errors: List[BaseException] = []

    def guarded(fn, *args):
        def run():
            try:
                fn(*args)
            except BaseException as e:  # noqa: BLE001 — reraised below
                with lock:
                    worker_errors.append(e)
                # unblock peers: drain one slot and resend sentinels
                try:
                    while True:
                        emq.get_nowait()
                except queue.Empty:
                    pass
                for _ in range(max(1, ecfg.nthread_decoder)):
                    try:
                        emq.put_nowait(None)
                    except queue.Full:
                        break
        return run

    pts = [
        threading.Thread(target=guarded(producer, s), daemon=True)
        for s in range(n_producers)
    ]
    for pt in pts:
        pt.start()
    threads = [
        threading.Thread(target=guarded(consumer), daemon=True)
        for _ in range(max(1, ecfg.nthread_decoder))
    ]
    for t in threads:
        t.start()
    for pt in pts:
        pt.join()
    for t in threads:
        t.join()
    if worker_errors:
        raise worker_errors[0]

    if ecfg.sclite:
        os.makedirs(ecfg.sclite, exist_ok=True)
        base = os.path.join(ecfg.sclite, os.path.basename(ecfg.test))
        with open(base + ".hyp", "w") as fh, open(base + ".ref", "w") as fr:
            for sid, ref_w, hyp_w in sclite_rows:
                fh.write(f"{' '.join(hyp_w)} ({sid})\n")
                fr.write(f"{' '.join(ref_w)} ({sid})\n")
        if ecfg.isbeamdump and beam_dump:
            from ..tools.rescore import save_beam_dump

            save_beam_dump(base + ".beams", beam_dump)
        with open(base + ".log", "w") as fl:
            fl.write(
                f"samples: {len(sclite_rows)}\n"
                f"WER: {meters.wrd_edit.error_rate():.2f}%\n"
                f"TER: {meters.tkn_edit.error_rate():.2f}%\n"
                f"word errors: {meters.wrd_edit.errors}/{meters.wrd_edit.total}\n"
            )

    res = {"WER": meters.wrd_edit.error_rate(), "TER": meters.tkn_edit.error_rate()}
    print(f"[Decode {ecfg.test}] WER: {res['WER']:.2f}%")
    return res


def run_lmweight_sweep(cfg: Config) -> Dict[float, float]:
    """Shallow-fusion weight sweep (reference --lmweight_low/high/step,
    ``recipes/slimIPL/README.md:27-29``): decode the dev set at each lmweight,
    report WER per weight and the argmin. Uses an emission cache so the AM
    forwards only once."""
    import tempfile

    sweep = {}
    emission_dir = cfg.get("emission_dir") or tempfile.mkdtemp(prefix="w2l_em_")
    w = cfg.lmweight_low
    while w <= cfg.lmweight_high + 1e-9:
        c = Config(**{})
        c.update(cfg.asdict())
        c.update({"lmweight": w, "emission_dir": emission_dir})
        res = run_decode(c)
        sweep[round(w, 4)] = res["WER"]
        w += cfg.lmweight_step
    best = min(sweep, key=sweep.get)
    print(f"[Sweep] best lmweight={best} WER={sweep[best]:.2f}%")
    return sweep
