"""Native extension loader: builds the C++ core on demand with g++ and binds
it via ctypes (no pybind11 in the image). Components:

  * decoder.cpp — ARPA n-gram LM + trie + CTC/ASG beam decoder
  * flac.cpp    — FLAC audio decoder

Build artifacts are cached next to the sources keyed by an mtime check.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS = {}


def _build(name: str) -> str:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-march=native",
        src, "-o", so,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return so


def load_lib(name: str) -> ctypes.CDLL:
    with _LOCK:
        if name not in _LIBS:
            _LIBS[name] = ctypes.CDLL(_build(name))
        return _LIBS[name]


def decoder_lib() -> ctypes.CDLL:
    lib = load_lib("decoder")
    c = ctypes
    lib.w2l_lm_load.restype = c.c_void_p
    lib.w2l_lm_load.argtypes = [c.c_char_p]
    lib.w2l_lm_free.argtypes = [c.c_void_p]
    lib.w2l_lm_word_id.restype = c.c_int
    lib.w2l_lm_word_id.argtypes = [c.c_void_p, c.c_char_p]
    lib.w2l_lm_unk_id.restype = c.c_int
    lib.w2l_lm_unk_id.argtypes = [c.c_void_p]
    lib.w2l_lm_score_seq.restype = c.c_float
    lib.w2l_lm_score_seq.argtypes = [c.c_void_p, c.POINTER(c.c_int32), c.c_int]
    lib.w2l_lm_used_mmap.restype = c.c_int
    lib.w2l_lm_used_mmap.argtypes = [c.c_void_p]
    lib.w2l_lm_build_binary.restype = c.c_int
    lib.w2l_lm_build_binary.argtypes = [c.c_char_p, c.c_char_p, c.c_float]
    lib.w2l_lm_build_trie.restype = c.c_int
    lib.w2l_lm_build_trie.argtypes = [c.c_char_p, c.c_char_p]
    lib.w2l_lm_order.restype = c.c_int
    lib.w2l_lm_order.argtypes = [c.c_void_p]
    lib.w2l_lm_score_hist.restype = c.c_float
    lib.w2l_lm_score_hist.argtypes = [
        c.c_void_p, c.POINTER(c.c_int32), c.c_int, c.c_int32,
    ]
    lib.w2l_lm_bos_id.restype = c.c_int
    lib.w2l_lm_bos_id.argtypes = [c.c_void_p]
    lib.w2l_lm_eos_id.restype = c.c_int
    lib.w2l_lm_eos_id.argtypes = [c.c_void_p]
    lib.w2l_trie_new.restype = c.c_void_p
    lib.w2l_trie_free.argtypes = [c.c_void_p]
    lib.w2l_trie_insert.argtypes = [
        c.c_void_p, c.POINTER(c.c_int32), c.c_int, c.c_int, c.c_float,
    ]
    lib.w2l_trie_smear.argtypes = [c.c_void_p, c.c_int]
    lib.w2l_decoder_new.restype = c.c_void_p
    lib.w2l_decoder_new.argtypes = [
        c.c_int, c.c_int, c.c_double, c.c_double, c.c_double, c.c_double,
        c.c_double, c.c_int, c.c_int, c.c_void_p, c.c_void_p, c.c_int,
        c.c_int, c.c_int, c.POINTER(c.c_float), c.c_int,
        c.POINTER(c.c_int32), c.c_int, c.c_int,
    ]
    lib.w2l_decoder_free.argtypes = [c.c_void_p]
    lib.w2l_decoder_begin.argtypes = [c.c_void_p]
    lib.w2l_decoder_step.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int, c.c_int]
    lib.w2l_decoder_end.argtypes = [c.c_void_p]
    lib.w2l_decoder_nhyps.restype = c.c_int
    lib.w2l_decoder_nhyps.argtypes = [c.c_void_p]
    lib.w2l_decoder_result.restype = c.c_int
    lib.w2l_decoder_result.argtypes = [
        c.c_void_p, c.c_int, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.c_int, c.POINTER(c.c_double),
    ]
    lib.w2l_decoder_prune.argtypes = [c.c_void_p, c.c_int]
    lib.w2l_decoder_best_lookback.restype = c.c_int
    lib.w2l_decoder_best_lookback.argtypes = [
        c.c_void_p, c.c_int, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.c_int, c.POINTER(c.c_double),
    ]
    lib.w2l_lm_new_external.restype = c.c_void_p
    lib.w2l_lm_new_external.argtypes = [c.c_int, c.c_int, c.c_int, c.c_int]
    lib.w2l_decoder_step_collect.restype = c.c_int
    lib.w2l_decoder_step_collect.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.c_int,
    ]
    lib.w2l_decoder_reqs_export.restype = c.c_int
    lib.w2l_decoder_reqs_export.argtypes = [
        c.c_void_p, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.c_int,
    ]
    lib.w2l_decoder_step_apply.argtypes = [c.c_void_p, c.POINTER(c.c_float)]
    lib.w2l_decoder_end_collect.restype = c.c_int
    lib.w2l_decoder_end_collect.argtypes = [c.c_void_p]
    lib.w2l_decoder_end_apply.argtypes = [c.c_void_p, c.POINTER(c.c_float)]
    lib.w2l_s2s_step_collect.restype = c.c_int
    lib.w2l_s2s_step_collect.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_int32), c.c_int,
        c.c_int,
    ]
    lib.w2l_s2s_reqs_export.restype = c.c_int
    lib.w2l_s2s_reqs_export.argtypes = [
        c.c_void_p, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32), c.c_int,
    ]
    lib.w2l_s2s_step_apply.restype = c.c_int
    lib.w2l_s2s_step_apply.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32),
    ]
    lib.w2l_s2s_end_collect.restype = c.c_int
    lib.w2l_s2s_end_collect.argtypes = [c.c_void_p]
    lib.w2l_s2s_end_apply.argtypes = [c.c_void_p, c.POINTER(c.c_float)]
    lib.w2l_s2s_new.restype = c.c_void_p
    lib.w2l_s2s_new.argtypes = [
        c.c_int, c.c_int, c.c_double, c.c_double, c.c_double, c.c_double,
        c.c_double, c.c_double, c.c_double, c.c_void_p, c.c_void_p,
        c.c_int, c.c_int, c.POINTER(c.c_int32), c.c_int,
    ]
    lib.w2l_s2s_free.argtypes = [c.c_void_p]
    lib.w2l_s2s_begin.argtypes = [c.c_void_p]
    lib.w2l_s2s_step.restype = c.c_int
    lib.w2l_s2s_step.argtypes = [
        c.c_void_p, c.POINTER(c.c_float), c.POINTER(c.c_int32), c.c_int,
        c.c_int, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
    ]
    lib.w2l_s2s_end.argtypes = [c.c_void_p]
    lib.w2l_s2s_nhyps.restype = c.c_int
    lib.w2l_s2s_nhyps.argtypes = [c.c_void_p]
    lib.w2l_s2s_result.restype = c.c_int
    lib.w2l_s2s_result.argtypes = [
        c.c_void_p, c.c_int, c.POINTER(c.c_int32), c.POINTER(c.c_int32),
        c.c_int, c.POINTER(c.c_double), c.POINTER(c.c_int32),
        c.POINTER(c.c_int32),
    ]
    return lib


def flac_lib() -> ctypes.CDLL:
    lib = load_lib("flac")
    c = ctypes
    lib.w2l_flac_read.restype = c.c_void_p
    lib.w2l_flac_read.argtypes = [
        c.c_char_p, c.POINTER(c.c_int64), c.POINTER(c.c_int), c.POINTER(c.c_int),
    ]
    lib.w2l_flac_copy_free.argtypes = [c.c_void_p, c.POINTER(c.c_float), c.c_int64]
    return lib


def flac_decode(path: str):
    """Decode a FLAC file -> (sample_rate, float32 mono samples)."""
    import numpy as np

    lib = flac_lib()
    n = ctypes.c_int64()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    handle = lib.w2l_flac_read(path.encode(), ctypes.byref(n),
                               ctypes.byref(sr), ctypes.byref(ch))
    if not handle:
        raise ValueError(f"flac decode failed: {path}")
    out = np.empty(n.value, np.float32)
    lib.w2l_flac_copy_free(
        handle, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n.value
    )
    if ch.value > 1:
        out = out.reshape(-1, ch.value).mean(axis=1)
    return sr.value, np.ascontiguousarray(out, np.float32)
