"""Native (C++) seq2seq beam decoder driver.

Reference parity: ``LexiconSeq2SeqDecoder`` / ``LexiconFreeSeq2SeqDecoder``
(``cpc/Decode.cpp:529-624``) run the beam in native code with an
``amUpdateFunc`` callback into the acoustic model. TPU design inverts
control: Python owns the loop so the AM step stays ONE batched jitted device
call per output position (the beam is the batch); the C++ core
(``ops/native/decoder.cpp::S2SDecoder``) does everything else — candidate
generation over the (K, V) log-prob matrix, trie constraint, n-gram LM
shallow fusion, eosScore / attentionThreshold / hard-soft selection /
beamThreshold pruning — which is the host-side pointer-chasing work that
made the pure-Python ``seq2seq_beam.py`` ~100x slower. Differentially
tested against it in ``tests/test_native_s2s.py``.
"""

from __future__ import annotations

import ctypes
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .beam import DecodeResult, DecoderOptions
from .native import NativeExternalLM, NativeLM, NativeTrie
from ..ops.native import decoder_lib


def _gather_state(state, rows: np.ndarray):
    idx = np.asarray(rows)
    return jax.tree.map(
        lambda a: jnp.asarray(a)[idx] if a.ndim >= 1 and a.shape[0] != 0 else a,
        state,
    )


class NativeSeq2SeqDecoder:
    """Unified native s2s decoder: lexicon (trie != None) or lexicon-free.

    ``update_fn(state, toks) -> (new_state, log_probs (K, V), peaks|None)``
    and ``init_state_fn(k)`` as produced by
    ``seq2seq_beam.make_s2s_update_fn`` — identical signature to the Python
    decoders so the decode executor can swap freely.
    """

    def __init__(
        self,
        opts: DecoderOptions,
        eos_idx: int,
        update_fn,
        init_state_fn,
        lm: Optional[NativeLM] = None,
        trie: Optional[NativeTrie] = None,
        word_sep_idx: int = -1,
        max_output_len: int = 200,
        attention_threshold: float = float("inf"),
        hard_selection: float = float("inf"),
        soft_selection: float = float("inf"),
    ):
        self.lib = decoder_lib()
        self.opts = opts
        self.eos = eos_idx
        self.update_fn = update_fn
        self.init_state_fn = init_state_fn
        self.max_output_len = max_output_len
        usr_ptr, n_usr = None, 0
        self._usr = None
        if lm is not None and lm.usr_map is not None:
            self._usr = lm.usr_map
            usr_ptr = self._usr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            n_usr = len(self._usr)

        def fin(x):  # inf -> sentinel the C side maps back to +inf
            return 1e30 if not math.isfinite(x) else float(x)

        self.ptr = self.lib.w2l_s2s_new(
            opts.beam_size, opts.beam_size_token, fin(opts.beam_threshold),
            opts.lm_weight, opts.word_score, opts.eos_score,
            fin(attention_threshold), fin(hard_selection), fin(soft_selection),
            trie.ptr if trie else None, lm.ptr if lm else None,
            eos_idx, word_sep_idx, usr_ptr, n_usr,
        )
        self._trie, self._lm = trie, lm  # keep alive

    def _resolve_requests(self, n_reqs: int) -> np.ndarray:
        ext = self._lm
        cap = ext.context
        hists = np.zeros((n_reqs, cap), np.int32)
        lens = np.zeros(n_reqs, np.int32)
        words = np.zeros(n_reqs, np.int32)
        i32 = ctypes.POINTER(ctypes.c_int32)
        self.lib.w2l_s2s_reqs_export(
            self.ptr, hists.ctypes.data_as(i32), lens.ctypes.data_as(i32),
            words.ctypes.data_as(i32), cap,
        )
        return np.ascontiguousarray(
            ext.scorer.score_batch(hists, lens, words), np.float32
        )

    def decode(self, n_best: int = 1) -> List[DecodeResult]:
        lib = self.lib
        K = self.opts.beam_size
        out_toks = np.empty(K, np.int32)
        out_rows = np.empty(K, np.int32)
        tp = out_toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        rp = out_rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        lib.w2l_s2s_begin(self.ptr)
        state = self.init_state_fn(1)
        toks = np.asarray([self.eos], np.int32)
        rows = np.asarray([0], np.int32)
        k = 1
        for _ in range(self.max_output_len):
            state_in = _gather_state(state, rows)
            new_state, logp, peaks = self.update_fn(state_in, jnp.asarray(toks))
            logp_np = np.ascontiguousarray(np.asarray(logp), np.float32)
            if peaks is not None:
                peaks_np = np.ascontiguousarray(np.asarray(peaks), np.int32)
                pk_ptr = peaks_np.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            else:
                pk_ptr = None
            lp = logp_np.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
            if isinstance(self._lm, NativeExternalLM):
                n_reqs = lib.w2l_s2s_step_collect(
                    self.ptr, lp, pk_ptr, k, logp_np.shape[1]
                )
                scores = self._resolve_requests(n_reqs) if n_reqs else None
                k = lib.w2l_s2s_step_apply(
                    self.ptr,
                    scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                    if scores is not None else None,
                    tp, rp,
                )
            else:
                k = lib.w2l_s2s_step(
                    self.ptr, lp, pk_ptr, k, logp_np.shape[1], tp, rp,
                )
            if k <= 0:
                break
            toks = out_toks[:k].copy()
            rows = out_rows[:k].copy()
            state = new_state
        if isinstance(self._lm, NativeExternalLM):
            n_reqs = lib.w2l_s2s_end_collect(self.ptr)
            scores = self._resolve_requests(n_reqs) if n_reqs else None
            lib.w2l_s2s_end_apply(
                self.ptr,
                scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                if scores is not None else None,
            )
        else:
            lib.w2l_s2s_end(self.ptr)

        n = min(n_best, lib.w2l_s2s_nhyps(self.ptr))
        max_len = self.max_output_len + 8
        tk = np.empty(max_len, np.int32)
        wd = np.empty(max_len, np.int32)
        scores = np.empty(3, np.float64)
        nw = ctypes.c_int32()
        comp = ctypes.c_int32()
        results = []
        for i in range(n):
            L = lib.w2l_s2s_result(
                self.ptr, i,
                tk.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                wd.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                max_len, scores.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                ctypes.byref(nw), ctypes.byref(comp),
            )
            if L < 0:
                continue
            results.append(
                DecodeResult(
                    float(scores[0]), float(scores[1]), float(scores[2]),
                    wd[: nw.value].tolist() or [-1], tk[:L].tolist(),
                    completed=bool(comp.value),
                )
            )
        return results

    def __del__(self):
        if getattr(self, "ptr", None):
            try:
                self.lib.w2l_s2s_free(self.ptr)
            except Exception:
                pass
