"""Beam-search decoders: LexiconDecoder and LexiconFreeDecoder.

Reimplements the observable behavior of ``fl::lib::text::LexiconDecoder`` /
``LexiconFreeDecoder`` (upstream; constructed with full options at
``cpc/Decode.cpp:529-624``, streaming API use at
``inference/decoder/Decoder.cpp:227-261``):

  * options: beamSize, beamSizeToken, beamThreshold, lmWeight, wordScore,
    unkScore, silScore, eosScore, logAdd, criterionType ∈ {CTC, ASG, S2S}.
  * batch API ``decode(emissions, T, N)`` and online API
    ``decode_begin / decode_step / decode_end / prune(look_back) /
    get_best_hypothesis(look_back)``.
  * token-passing search: per frame each hypothesis extends with the
    top-``beamSizeToken`` emissions; blank/repeat handling per criterion;
    lexicon hypotheses walk the smeared trie accruing
    ``lmWeight * (smear delta)`` and rescore ``lmWeight * (P(word|h) -
    smear)`` + wordScore on word emission; hyps with identical
    (LM state, trie node, prev-token/blank) merge by max or logadd.

This Python implementation is the reference-correctness path; the native C++
core (``wav2letter_tpu/ops/native``) accelerates the same algorithm and is
used automatically when built.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from .lm import LM, LMState, ZeroLM
from .trie import SmearingMode, Trie, TrieNode

NEG_INF = -math.inf


class CriterionType(enum.Enum):
    CTC = "ctc"
    ASG = "asg"
    S2S = "s2s"


@dataclasses.dataclass
class DecoderOptions:
    beam_size: int = 2500
    beam_size_token: int = 250000
    beam_threshold: float = 25.0
    lm_weight: float = 0.0
    word_score: float = 0.0
    unk_score: float = NEG_INF
    sil_score: float = 0.0
    eos_score: float = 0.0
    log_add: bool = False
    criterion_type: CriterionType = CriterionType.CTC

    @classmethod
    def from_config(cls, cfg) -> "DecoderOptions":
        ct = {"ctc": CriterionType.CTC, "asg": CriterionType.ASG}.get(
            cfg.criterion, CriterionType.S2S
        )
        return cls(
            beam_size=cfg.beamsize,
            beam_size_token=cfg.beamsizetoken,
            beam_threshold=cfg.beamthreshold,
            lm_weight=cfg.lmweight,
            word_score=cfg.wordscore,
            unk_score=cfg.unkscore,
            sil_score=cfg.silscore,
            eos_score=cfg.eosscore,
            log_add=cfg.logadd,
            criterion_type=ct,
        )


@dataclasses.dataclass
class DecodeResult:
    score: float
    am_score: float
    lm_score: float
    words: List[int]  # word indices per frame (-1 = none)
    tokens: List[int]  # token index per frame
    # s2s: hypothesis reached EOS (vs. cut at maxdecoderoutputlen); the
    # --use_completed_hyp rescoring cfgs filter beam dumps on this
    completed: bool = True

    def word_frames(self) -> List[Tuple[int, int, int]]:
        """(word_idx, begin_frame, end_frame) per emitted word — frame times
        as in the reference's words-with-timestamps output
        (inference/decoder/Decoder.cpp:113-164). end_frame is the frame the
        word completed (its label emission); begin_frame the first frame
        after the previous word/silence."""
        out = []
        begin = 0
        for t, w in enumerate(self.words):
            if w >= 0:
                out.append((w, begin, t))
                begin = t + 1
        return out


class _Hyp:
    __slots__ = (
        "score",
        "am_score",
        "lm_score",
        "lm_state",
        "node",
        "parent",
        "token",
        "word",
        "prev_blank",
    )

    def __init__(self, score, am_score, lm_score, lm_state, node, parent, token, word, prev_blank=False):
        self.score = score
        self.am_score = am_score
        self.lm_score = lm_score
        self.lm_state = lm_state
        self.node = node
        self.parent = parent
        self.token = token
        self.word = word
        self.prev_blank = prev_blank


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    if b == NEG_INF:
        return a
    return a + math.log1p(math.exp(b - a))


def _backtrack(hyp: _Hyp, T: int) -> Tuple[List[int], List[int]]:
    words = []
    tokens = []
    h = hyp
    while h is not None and h.parent is not None:
        words.append(h.word)
        tokens.append(h.token)
        h = h.parent
    words.reverse()
    tokens.reverse()
    return words, tokens


class _BeamDecoderBase:
    """Shared frame loop + online API."""

    def __init__(self, opts: DecoderOptions):
        self.opts = opts
        self.hyps: List[List[_Hyp]] = []
        self.t = 0

    # -- online API (reference decodeBegin/decodeStep/decodeEnd) ----------
    def decode_begin(self):
        self.t = 0
        self.hyps = [[self._start_hyp()]]

    def decode_step(self, emissions: np.ndarray):
        """emissions (T_chunk, N) raw scores."""
        em = np.asarray(emissions, dtype=np.float64)
        for t in range(em.shape[0]):
            frame = em[t]
            self.hyps.append(self._step_frame(self.hyps[-1], frame))
            self.t += 1

    def decode_end(self):
        self.hyps.append(self._finish(self.hyps[-1]))

    def prune(self, look_back: int = 0):
        """Bounded memory: keep only the last ``look_back``+1 frames of
        lattice, re-rooting backpointers (reference prune(lookBack))."""
        keep_from = max(0, len(self.hyps) - 1 - look_back)
        if keep_from == 0:
            return
        # dropping old frame lists releases dead hypotheses; live ancestor
        # chains (via .parent) survive for backtracking past the cut
        self.hyps = self.hyps[keep_from:]

    def get_best_hypothesis(self, look_back: int = 0) -> DecodeResult:
        frame = max(0, len(self.hyps) - 1 - look_back)
        hyps = self.hyps[frame]
        best = max(hyps, key=lambda h: h.score)
        words, tokens = _backtrack(best, frame)
        return DecodeResult(best.score, best.am_score, best.lm_score, words, tokens)

    # -- batch API ---------------------------------------------------------
    def decode(self, emissions: np.ndarray, n_best: int = 1) -> List[DecodeResult]:
        """emissions (T, N). Returns n_best results sorted by score."""
        self.decode_begin()
        self.decode_step(emissions)
        self.decode_end()
        final = sorted(self.hyps[-1], key=lambda h: -h.score)
        out = []
        for h in final[:n_best]:
            words, tokens = _backtrack(h, len(self.hyps) - 1)
            out.append(DecodeResult(h.score, h.am_score, h.lm_score, words, tokens))
        return out

    # -- search core -------------------------------------------------------
    def _top_tokens(self, frame: np.ndarray) -> np.ndarray:
        n = frame.shape[0]
        k = min(self.opts.beam_size_token, n)
        if k >= n:
            return np.argsort(-frame)
        idx = np.argpartition(-frame, k)[:k]
        return idx[np.argsort(-frame[idx])]

    def _merge_and_prune(self, cands: Dict, best_score: float) -> List[_Hyp]:
        thr = best_score - self.opts.beam_threshold
        hyps = [h for h in cands.values() if h.score >= thr]
        hyps.sort(key=lambda h: -h.score)
        return hyps[: self.opts.beam_size]

    def _add_cand(self, cands: Dict, key, hyp: _Hyp):
        old = cands.get(key)
        if old is None:
            cands[key] = hyp
        else:
            if self.opts.log_add:
                merged = _logadd(old.score, hyp.score)
                if hyp.score > old.score:
                    hyp.score = merged
                    cands[key] = hyp
                else:
                    old.score = merged
            elif hyp.score > old.score:
                cands[key] = hyp


class LexiconDecoder(_BeamDecoderBase):
    """Trie-constrained decoder with word-level (or token-level) LM."""

    def __init__(
        self,
        opts: DecoderOptions,
        trie: Trie,
        lm: LM,
        sil_idx: int,
        blank_idx: int,
        unk_word_idx: int,
        transitions: Optional[np.ndarray] = None,
        is_token_lm: bool = False,
    ):
        super().__init__(opts)
        self.trie = trie
        self.lm = lm
        self.sil = sil_idx
        self.blank = blank_idx
        self.unk_word = unk_word_idx
        self.trans = transitions
        self.is_token_lm = is_token_lm
        self.ctc = opts.criterion_type == CriterionType.CTC
        self.asg = opts.criterion_type == CriterionType.ASG

    def _start_hyp(self) -> _Hyp:
        return _Hyp(0.0, 0.0, 0.0, self.lm.start(False), self.trie.root, None, self.sil, -1)

    def _trans_score(self, to_tok: int, from_tok: int) -> float:
        if self.trans is None or from_tok < 0:
            return 0.0
        return float(self.trans[to_tok, from_tok])

    def _step_frame(self, hyps: List[_Hyp], frame: np.ndarray) -> List[_Hyp]:
        opts = self.opts
        cands: Dict = {}
        best = NEG_INF
        top = self._top_tokens(frame)
        for hyp in hyps:
            for tok in top:
                tok = int(tok)
                am = float(frame[tok])
                base = hyp.score + am
                # --- blank (CTC only): stay, mark prev_blank ---
                if self.ctc and tok == self.blank:
                    nh = _Hyp(
                        base, hyp.am_score + am, hyp.lm_score, hyp.lm_state,
                        hyp.node, hyp, tok, -1, True,
                    )
                    self._add_cand(cands, (hyp.lm_state, hyp.node, True), nh)
                    best = max(best, nh.score)
                    continue
                # --- repeated token (collapse) ---
                if tok == hyp.token and (not self.ctc or not hyp.prev_blank):
                    sc = base + self._trans_score(tok, hyp.token)
                    nh = _Hyp(
                        sc, hyp.am_score + am, hyp.lm_score, hyp.lm_state,
                        hyp.node, hyp, tok, -1, False,
                    )
                    self._add_cand(cands, (hyp.lm_state, hyp.node, False), nh)
                    best = max(best, nh.score)
                    continue
                # --- silence: back to root + sil score ---
                if tok == self.sil and self.sil != self.blank:
                    sc = base + opts.sil_score + self._trans_score(tok, hyp.token)
                    nh = _Hyp(
                        sc, hyp.am_score + am, hyp.lm_score, hyp.lm_state,
                        self.trie.root, hyp, tok, -1, False,
                    )
                    self._add_cand(cands, (hyp.lm_state, self.trie.root, False), nh)
                    best = max(best, nh.score)
                    continue
                # --- descend lexicon trie ---
                child = hyp.node.children.get(tok)
                if child is None:
                    continue
                sc = base + self._trans_score(tok, hyp.token)
                lm_sc = hyp.lm_score
                lm_state = hyp.lm_state
                if opts.lm_weight != 0.0 and not self.is_token_lm:
                    # smeared upper bound delta
                    delta = child.max_score - hyp.node.max_score
                    sc += opts.lm_weight * delta
                    lm_sc += delta
                if self.is_token_lm and opts.lm_weight != 0.0:
                    lm_state, s = self.lm.score(lm_state, tok)
                    sc += opts.lm_weight * s
                    lm_sc += s
                # word endings at this node: emit words
                for wi, w in enumerate(child.labels):
                    wsc = sc
                    wlm_state = lm_state
                    wlm = lm_sc
                    if not self.is_token_lm and opts.lm_weight != 0.0:
                        wlm_state, s = self.lm.score(hyp.lm_state, w)
                        # replace the accumulated smear (telescoped:
                        # child.max_score - root.max_score lives in sc) with
                        # the true LM score — flashlight subtracts the
                        # child's absolute smeared score here
                        wsc = wsc + opts.lm_weight * (s - child.max_score)
                        wlm = hyp.lm_score + s
                    if w == self.unk_word:
                        wsc += opts.unk_score
                        if opts.unk_score == NEG_INF:
                            continue
                    wsc += opts.word_score
                    nh = _Hyp(
                        wsc, hyp.am_score + am, wlm, wlm_state,
                        self.trie.root, hyp, tok, w, False,
                    )
                    self._add_cand(cands, (wlm_state, self.trie.root, False), nh)
                    best = max(best, nh.score)
                # continue inside the word
                if child.children:
                    nh = _Hyp(
                        sc, hyp.am_score + am, lm_sc, lm_state,
                        child, hyp, tok, -1, False,
                    )
                    self._add_cand(cands, (lm_state, child, False), nh)
                    best = max(best, nh.score)
        return self._merge_and_prune(cands, best)

    def _finish(self, hyps: List[_Hyp]) -> List[_Hyp]:
        out = []
        for hyp in hyps:
            sc = hyp.score
            lm_sc = hyp.lm_score
            st = hyp.lm_state
            # unfinished word: discard in-word score? reference keeps hyp at
            # node != root without emitting; we simply don't emit the word.
            if self.opts.lm_weight != 0.0 and not self.is_token_lm:
                st, s = self.lm.finish(st)
                sc += self.opts.lm_weight * s
                lm_sc += s
            out.append(_Hyp(sc, hyp.am_score, lm_sc, st, hyp.node, hyp.parent, hyp.token, hyp.word, hyp.prev_blank))
        out.sort(key=lambda h: -h.score)
        return out[: self.opts.beam_size]


class LexiconFreeDecoder(_BeamDecoderBase):
    """Unconstrained token decoder with a token-level LM
    (reference LexiconFreeDecoder; ``--uselexicon=false`` path)."""

    def __init__(
        self,
        opts: DecoderOptions,
        lm: LM,
        sil_idx: int,
        blank_idx: int,
        transitions: Optional[np.ndarray] = None,
    ):
        super().__init__(opts)
        self.lm = lm
        self.sil = sil_idx
        self.blank = blank_idx
        self.trans = transitions
        self.ctc = opts.criterion_type == CriterionType.CTC

    def _start_hyp(self) -> _Hyp:
        return _Hyp(0.0, 0.0, 0.0, self.lm.start(False), None, None, self.sil, -1)

    def _trans_score(self, to_tok: int, from_tok: int) -> float:
        if self.trans is None or from_tok < 0:
            return 0.0
        return float(self.trans[to_tok, from_tok])

    def _step_frame(self, hyps: List[_Hyp], frame: np.ndarray) -> List[_Hyp]:
        opts = self.opts
        cands: Dict = {}
        best = NEG_INF
        top = self._top_tokens(frame)
        for hyp in hyps:
            for tok in top:
                tok = int(tok)
                am = float(frame[tok])
                base = hyp.score + am
                if self.ctc and tok == self.blank:
                    nh = _Hyp(base, hyp.am_score + am, hyp.lm_score, hyp.lm_state,
                              None, hyp, tok, -1, True)
                    self._add_cand(cands, (hyp.lm_state, hyp.token, True), nh)
                    best = max(best, nh.score)
                    continue
                if tok == hyp.token and (not self.ctc or not hyp.prev_blank):
                    sc = base + self._trans_score(tok, hyp.token)
                    nh = _Hyp(sc, hyp.am_score + am, hyp.lm_score, hyp.lm_state,
                              None, hyp, tok, -1, False)
                    self._add_cand(cands, (hyp.lm_state, tok, False), nh)
                    best = max(best, nh.score)
                    continue
                sc = base + self._trans_score(tok, hyp.token)
                st = hyp.lm_state
                lm_sc = hyp.lm_score
                if opts.lm_weight != 0.0:
                    st, s = self.lm.score(st, tok)
                    sc += opts.lm_weight * s
                    lm_sc += s
                if tok == self.sil:
                    sc += opts.sil_score
                nh = _Hyp(sc, hyp.am_score + am, lm_sc, st, None, hyp, tok, -1, False)
                self._add_cand(cands, (st, tok, False), nh)
                best = max(best, nh.score)
        return self._merge_and_prune(cands, best)

    def _finish(self, hyps: List[_Hyp]) -> List[_Hyp]:
        out = []
        for hyp in hyps:
            sc, lm_sc, st = hyp.score, hyp.lm_score, hyp.lm_state
            if self.opts.lm_weight != 0.0:
                st, s = self.lm.finish(st)
                sc += self.opts.lm_weight * s
                lm_sc += s
            out.append(_Hyp(sc, hyp.am_score, lm_sc, st, None, hyp.parent, hyp.token, hyp.word, hyp.prev_blank))
        out.sort(key=lambda h: -h.score)
        return out[: self.opts.beam_size]
