"""ConvLM — neural LM scoring for beam decoding.

Reference: ``ConvLM`` (GCNN LM forwarded on GPU during decode, with
``--lm_vocab`` token mapping and an ``--lm_memory`` state cache; one GPU per
decoder thread — ``cpc/Decode.cpp:249-277,494-517``).

TPU-native design: the LM is any arch-DSL model (e.g. the GCNN LM archs)
trained next-token; decode-time scoring keeps an LRU cache of
(history -> log-prob row) entries and evaluates cache misses in device
batches — the beam loop naturally generates many hypotheses sharing
prefixes, so hit rates are high (the role ``--lm_memory`` plays upstream).
"""

from __future__ import annotations

import os
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .lm import LM, LMState


class ConvLM(LM):
    def __init__(
        self,
        model,  # flax module: (B, L) int32 -> (B, L, V) logits
        params,
        vocab: Sequence[str],  # LM vocabulary (lm_vocab file order)
        usr_vocab: Optional[Sequence[str]] = None,
        context: int = 48,  # receptive field / history truncation
        lm_memory: int = 10000,  # cache entries (reference --lm_memory)
        eos: str = "</s>",
        unk: str = "<unk>",
    ):
        self.model = model
        self.params = params
        self.vocab = {w: i for i, w in enumerate(vocab)}
        self.eos_id = self.vocab.get(eos, 0)
        self.unk_id = self.vocab.get(unk, 0)
        self.context = context
        self.usr_map = None
        if usr_vocab is not None:
            self.usr_map = [self.vocab.get(w, self.unk_id) for w in usr_vocab]
        self.cache: "OrderedDict[Tuple[int, ...], np.ndarray]" = OrderedDict()
        self.lm_memory = lm_memory
        self._fwd = jax.jit(self._forward)
        self._fwd_at = jax.jit(self._forward_at)

    def _forward(self, ids):  # (B, L) -> (B, V) last-position log-probs
        logits, _ = self.model.apply(self.params, ids, None)
        return jax.nn.log_softmax(logits[:, -1].astype(jnp.float32), axis=-1)

    def _forward_at(self, ids, pos):  # (B, Lmax), (B,) -> (B, V) at pos
        logits, _ = self.model.apply(self.params, ids, None)
        rows = jnp.take_along_axis(
            logits, pos[:, None, None], axis=1
        )[:, 0]
        return jax.nn.log_softmax(rows.astype(jnp.float32), axis=-1)

    def _logprobs(self, hist: Tuple[int, ...]) -> np.ndarray:
        row = self.cache.get(hist)
        if row is not None:
            self.cache.move_to_end(hist)
            return row
        ids = jnp.asarray(np.asarray(hist, np.int32)[None])
        row = np.asarray(self._fwd(ids))[0]
        self.cache[hist] = row
        if len(self.cache) > self.lm_memory:
            self.cache.popitem(last=False)
        return row

    # -- batched scoring (native deferred-LM protocol) ---------------------
    # The native beam decoder collects a step's pending (history, word)
    # requests; score them with ONE device call per batch bucket — the
    # TPU-native equivalent of the reference's per-thread GPU ConvLM
    # (cpc/Decode.cpp:489-517). Right-padding is sound because the GCNN LM
    # is causal (position k sees only ids[:k+1]), so rows are gathered at
    # the true last position instead of -1.
    _B_BUCKETS = (8, 32, 128, 512)

    def score_batch(
        self, hists: np.ndarray, lens: np.ndarray, words: np.ndarray
    ) -> np.ndarray:
        """hists (N, H) int32 LM-id histories (rows padded past lens[i]),
        words (N,) int32 LM ids -> (N,) float32 log10 P(word | hist)."""
        n = len(words)
        keys = [tuple(int(x) for x in hists[i, : lens[i]]) for i in range(n)]
        missing = []
        seen = set()
        for k in keys:
            if k not in self.cache and k not in seen:
                seen.add(k)
                missing.append(k)
        ctx = self.context
        i = 0
        while i < len(missing):
            b = next((b for b in self._B_BUCKETS if b >= len(missing) - i),
                     self._B_BUCKETS[-1])
            chunk = missing[i : i + b]
            ids = np.zeros((b, ctx), np.int32)
            pos = np.zeros(b, np.int32)
            for j, k in enumerate(chunk):
                ids[j, : len(k)] = k
                pos[j] = len(k) - 1
            rows = np.asarray(self._fwd_at(jnp.asarray(ids), jnp.asarray(pos)))
            for j, k in enumerate(chunk):
                self.cache[k] = rows[j]
                if len(self.cache) > self.lm_memory:
                    self.cache.popitem(last=False)
            i += len(chunk)
        out = np.empty(n, np.float32)
        ln10 = np.log(10.0)
        for i, k in enumerate(keys):
            row = self.cache.get(k)
            if row is None:  # evicted within this batch (tiny lm_memory)
                row = self._logprobs(k)
            else:
                self.cache.move_to_end(k)
            out[i] = row[int(words[i])] / ln10
        return out

    # -- LM API ------------------------------------------------------------
    def start(self, start_with_nothing: bool = False) -> LMState:
        return LMState((self.eos_id,))  # <s> == </s> in GCNN LM convention

    def score(self, state: LMState, usr_token_idx: int) -> Tuple[LMState, float]:
        w = (
            self.usr_map[usr_token_idx]
            if self.usr_map is not None
            else usr_token_idx
        )
        row = self._logprobs(state.ngram)
        s = float(row[w])
        nh = (state.ngram + (w,))[-self.context :]
        # convert natural log -> log10 to match KenLM score scale
        return LMState(nh), s / np.log(10.0)

    def finish(self, state: LMState) -> Tuple[LMState, float]:
        row = self._logprobs(state.ngram)
        return state, float(row[self.eos_id]) / np.log(10.0)


def load_lm_vocab(path: str) -> List[str]:
    """``--lm_vocab`` file: one token per line, index = line number."""
    with open(path) as f:
        return [l.strip().split()[0] for l in f if l.strip()]


def load_convlm(
    model_path: str,
    lm_vocab_path: str,
    usr_vocab: Optional[Sequence[str]] = None,
    lm_memory: int = 10000,
) -> ConvLM:
    """Build a decode-time ConvLM from a self-describing LM checkpoint
    (written by ``cli/train_lm.py``) + ``--lm_vocab`` file — the
    ``--lmtype=convlm`` path of the decode executor
    (reference Decode.cpp:249-277: loadPrefetchDataset-free GPU ConvLM with
    lm_vocab mapping and lm_memory cache)."""
    from ..config import Config
    from ..models.lm import build_lm_model
    from ..runtime.checkpoint import load_checkpoint

    if not lm_vocab_path:
        raise ValueError("--lmtype=convlm requires --lm_vocab")
    vocab = load_lm_vocab(lm_vocab_path)
    ckpt = load_checkpoint(model_path)
    lm_cfg = Config.deserialize(ckpt.config)
    arch = os.path.join(lm_cfg.archdir, lm_cfg.arch) if lm_cfg.archdir else lm_cfg.arch
    # lm_vocab.txt written by train_lm already includes </s> and <unk>
    model = build_lm_model(arch, len(vocab))
    from flax import serialization

    dummy = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(0)},
        jnp.zeros((1, 8), jnp.int32),
    )
    params = {
        "params": serialization.from_state_dict(dummy["params"], ckpt.model_params)
    }
    return ConvLM(
        model, params, vocab=vocab, usr_vocab=usr_vocab, lm_memory=lm_memory
    )
