"""Forced alignment — the reference's ``tools/Align`` binary op
(``recipes/sota/2019/lm_analysis/README.md`` "Force alignment for dev-other";
upstream Align.cpp is unmounted, interface reconstructed from its outputs:
per-sample word segments ``begin length word`` with ``$`` for silence).

Viterbi through the CONSTRAINED target graph (vs the free Viterbi in
``ops/ctc.py``/``ops/asg.py``):
  * CTC: blank-interleaved extended targets (2U+1 states), transitions
    stay / advance-1 / skip-2 (skip only between distinct labels).
  * ASG: one state per target token, stay/advance scored by the transition
    matrix (criterion param 0).

TPU-native: one ``lax.scan`` over time carrying (B, S) scores, emitting int8
backpointers; a reverse scan backtracks. All shapes static; variable lengths
frozen with identity backpointers. Viterbi is invariant to per-frame
normalization, so raw logits are accepted.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _freeze(active, new, old):
    return jnp.where(active, new, old)


def ctc_forced_align(
    emissions: jnp.ndarray,  # (B, T, N) logits or log-probs
    targets: jnp.ndarray,  # (B, U) token ids, -1 padded
    emis_len: Optional[jnp.ndarray] = None,
    target_len: Optional[jnp.ndarray] = None,
    blank: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best frame-level token path constrained to the target sequence.

    Returns (path (B, T) int32 — token id per frame, blank on pad frames;
    score (B,) — Viterbi log-score of the alignment).
    """
    B, T, N = emissions.shape
    U = targets.shape[1]
    L = 2 * U + 1
    if blank is None:
        blank = N - 1
    if emis_len is None:
        emis_len = jnp.full((B,), T, jnp.int32)
    if target_len is None:
        target_len = jnp.sum(targets >= 0, axis=1).astype(jnp.int32)

    tgt = jnp.where(targets < 0, blank, targets)
    ext = jnp.full((B, L), blank, dtype=jnp.int32)
    ext = ext.at[:, 1::2].set(tgt.astype(jnp.int32))  # (B, L)
    pos = jnp.arange(L)[None, :]
    prev2 = jnp.pad(ext, ((0, 0), (2, 0)), constant_values=-1)[:, :L]
    allow_skip = ((pos % 2) == 1) & (ext != prev2)
    valid = pos < (2 * target_len[:, None] + 1)

    em = emissions.astype(jnp.float32).transpose(1, 0, 2)  # (T, B, N)
    em_ext = jnp.take_along_axis(em, ext[None].repeat(T, 0), axis=2)  # (T,B,L)

    init = jnp.where((pos <= 1) & valid, em_ext[0], NEG_INF)

    def step(carry, em_t):
        score, t = carry
        s1 = jnp.pad(score, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :L]
        s2 = jnp.pad(score, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :L]
        s2 = jnp.where(allow_skip, s2, NEG_INF)
        stacked = jnp.stack([score, s1, s2], axis=0)  # (3, B, L)
        bp = jnp.argmax(stacked, axis=0).astype(jnp.int8)
        best = jnp.max(stacked, axis=0)
        new = jnp.where(valid, best + em_t, NEG_INF)
        active = (t < emis_len)[:, None]
        return (
            (_freeze(active, new, score), t + 1),
            jnp.where(active, bp, jnp.int8(0)),
        )

    (score, _), bps = jax.lax.scan(step, (init, jnp.ones((), jnp.int32)), em_ext[1:])
    # final state: best of last blank (2*tlen) and last label (2*tlen - 1)
    fin_b = 2 * target_len
    fin_l = jnp.maximum(2 * target_len - 1, 0)
    sc_b = jnp.take_along_axis(score, fin_b[:, None], axis=1)[:, 0]
    sc_l = jnp.take_along_axis(score, fin_l[:, None], axis=1)[:, 0]
    last = jnp.where(sc_b >= sc_l, fin_b, fin_l).astype(jnp.int32)
    align_score = jnp.maximum(sc_b, sc_l)

    def back(s, bp_t):
        d = jnp.take_along_axis(bp_t.astype(jnp.int32), s[:, None], axis=1)[:, 0]
        return s - d, s

    s0, states_rev = jax.lax.scan(back, last, bps[::-1])  # states at t=T-1..1
    states = jnp.concatenate([s0[None], states_rev[::-1]], axis=0)  # (T, B)
    path = jnp.take_along_axis(ext, states.transpose(1, 0), axis=1)  # (B, T)
    t_idx = jnp.arange(T)[None, :]
    path = jnp.where(t_idx < emis_len[:, None], path, blank)
    return path, align_score


def asg_forced_align(
    emissions: jnp.ndarray,  # (B, T, N)
    transitions: jnp.ndarray,  # (N, N) trans[to, from]
    targets: jnp.ndarray,  # (B, U), -1 padded
    emis_len: Optional[jnp.ndarray] = None,
    target_len: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """ASG forced alignment (states = target tokens, stay/advance with the
    criterion's transition matrix). Returns (path (B,T), score (B,))."""
    B, T, N = emissions.shape
    U = targets.shape[1]
    if emis_len is None:
        emis_len = jnp.full((B,), T, jnp.int32)
    if target_len is None:
        target_len = jnp.sum(targets >= 0, axis=1).astype(jnp.int32)
    tgt = jnp.where(targets < 0, 0, targets).astype(jnp.int32)

    em = emissions.astype(jnp.float32).transpose(1, 0, 2)
    em_tgt = jnp.take_along_axis(em, tgt[None].repeat(T, 0), axis=2)  # (T,B,U)
    trans = transitions.astype(jnp.float32)
    # stay[s] = trans[tgt[s], tgt[s]]; adv[s] = trans[tgt[s], tgt[s-1]]
    stay = trans[tgt, tgt]  # (B, U)
    prev = jnp.pad(tgt, ((0, 0), (1, 0)))[:, :U]
    adv = trans[tgt, prev]  # (B, U); adv[0] unused
    pos = jnp.arange(U)[None, :]
    valid = pos < target_len[:, None]

    init = jnp.where(pos == 0, em_tgt[0], NEG_INF)

    def step(carry, em_t):
        score, t = carry
        s1 = jnp.pad(score, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :U]
        cand = jnp.stack([score + stay, s1 + adv], axis=0)  # (2, B, U)
        bp = jnp.argmax(cand, axis=0).astype(jnp.int8)
        best = jnp.max(cand, axis=0)
        new = jnp.where(valid, best + em_t, NEG_INF)
        active = (t < emis_len)[:, None]
        return (
            (_freeze(active, new, score), t + 1),
            jnp.where(active, bp, jnp.int8(0)),
        )

    (score, _), bps = jax.lax.scan(step, (init, jnp.ones((), jnp.int32)), em_tgt[1:])
    last = jnp.maximum(target_len - 1, 0).astype(jnp.int32)
    align_score = jnp.take_along_axis(score, last[:, None], axis=1)[:, 0]

    def back(s, bp_t):
        d = jnp.take_along_axis(bp_t.astype(jnp.int32), s[:, None], axis=1)[:, 0]
        return s - d, s

    s0, states_rev = jax.lax.scan(back, last, bps[::-1])
    states = jnp.concatenate([s0[None], states_rev[::-1]], axis=0)  # (T, B)
    path = jnp.take_along_axis(tgt, states.transpose(1, 0), axis=1)
    t_idx = jnp.arange(T)[None, :]
    # pad frames repeat the final token; mark with the sil/first token? keep
    # the final token but callers slice by emis_len
    path = jnp.where(t_idx < emis_len[:, None], path, path[:, -1:])
    return path, align_score


def path_to_word_segments(
    path,  # sequence of token ids for ONE utterance (host list/ndarray)
    token_dict,
    frame_sec: float,
    wordsep: str = "|",
    blank: Optional[int] = None,
    sil_word: str = "$",
):
    """Frame token path -> word segments [(begin_s, length_s, word)] with
    ``$`` silence entries, the reference Align output unit (consumed by
    lm_analysis filter/shuffle scripts).

    Words are delimited ONLY by separator-token frames; CTC blanks between
    letters stay inside the word span, while blanks at word edges join the
    adjacent silence. Repeated frames of a token are one emission; a blank
    between equal tokens restarts the emission (CTC collapse semantics).
    """
    # 1. collapse into runs (token, start, end)
    runs = []
    for t, tok in enumerate(path):
        tok = int(tok)
        if runs and runs[-1][0] == tok:
            runs[-1][2] = t + 1
        else:
            runs.append([tok, t, t + 1])

    def kind(tok):
        if blank is not None and tok == blank:
            return "B"
        ch = token_dict.get_entry(tok) if 0 <= tok < len(token_dict) else ""
        return "S" if ch == wordsep else "C"

    # 2. split at separator runs into word groups; track char spans
    segs = []  # (begin_frame, end_frame, word)
    word_chars: list = []
    word_start = word_end = None

    def flush_word():
        nonlocal word_chars, word_start, word_end
        if word_chars:
            segs.append((word_start, word_end, "".join(word_chars)))
        word_chars, word_start, word_end = [], None, None

    for tok, s, e in runs:
        k = kind(tok)
        if k == "C":
            ch = token_dict.get_entry(tok)
            if word_start is None:
                word_start = s
            word_chars.append(ch)
            word_end = e
        elif k == "S":
            flush_word()
        # blanks: neutral — inside a word they extend nothing (span is
        # char-bounded); at edges they fall into the silence gaps below
    flush_word()

    # 3. silence = gaps between word spans (covers separator + edge blanks)
    out = []
    cursor = 0
    for (s, e, w) in segs:
        if s > cursor:
            out.append((cursor * frame_sec, (s - cursor) * frame_sec, sil_word))
        out.append((s * frame_sec, (e - s) * frame_sec, w))
        cursor = e
    if cursor < len(path):
        out.append((cursor * frame_sec, (len(path) - cursor) * frame_sec, sil_word))
    return out
