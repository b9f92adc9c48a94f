"""Seq2Seq criterions — RNN (GRU) and Transformer attention decoders.

Reference surface (upstream impls; constructed at ``cpc/Train.cpp:524-541``,
flag set at ``recipes/seq2seq_tds/librispeech/train.cfg:24-40``):
``--criterion=seq2seq`` (GRU attention decoder) and ``--criterion=
transformer`` (transformer decoder, ``--am_decoder_tr_layers``). Honored:
eos/pad appended to dict, ``--attention content|keyvalue|neural``, attention
windows (``--attnWindow no|median|step|soft|softPretrain``),
``--pctteacherforcing`` + ``--samplingstrategy rand|model``,
``--labelsmooth``, ``--maxdecoderoutputlen``, ``--decoderrnnlayer``.

TPU design: teacher-forced training decodes all target positions under one
``lax.scan`` (single fused compilation, batch-wide steps); greedy decoding is
the same scan with argmax feedback to a static length. Beam search uses
``decode_step`` — a batched-over-hypotheses single step the host beam loop
jits once (see decoder/seq2seq_beam.py).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .base import CriterionScaleMode, get_scale_mode, scale_losses

Array = jnp.ndarray


def _sinusoid(L, C, dtype):
    pos = np.arange(L)[:, None].astype(np.float64)
    div = np.exp(np.arange(0, C, 2) * (-math.log(10000.0) / C))
    pe = np.zeros((L, C))
    pe[:, 0::2] = np.sin(pos * div)
    pe[:, 1::2] = np.cos(pos * div[: pe[:, 1::2].shape[1]])
    return jnp.asarray(pe, dtype)


@dataclasses.dataclass(frozen=True)
class S2SConfig:
    n_classes: int
    eos_idx: int
    pad_idx: int
    hidden: int = 256
    n_layers: int = 1
    # --decoderattnround: N (RNN stack + attention) rounds chained per output
    # step, each with its own parameters/hidden state — reference builds one
    # attention per round (slimIPL/src/Train.cpp:413-431) and threads the
    # count into Seq2SeqCriterion and the beam amUpdate
    # (cpc/Decode.cpp:534-539)
    n_rounds: int = 1
    attention: str = "content"  # content|keyvalue|neural
    attn_window: str = "no"
    # window pretraining (reference slimIPL/src/Train.cpp:1887-1903: a
    # pretrain phase of --pretrainWindow updates runs with the window on,
    # then clearWindow(); --trainWithWindow keeps it on afterwards)
    train_with_window: bool = False
    pretrain_window: int = 0
    pct_teacher_forcing: float = 100.0
    sampling_strategy: str = "rand"
    gumbel_temperature: float = 1.0
    label_smooth: float = 0.0
    dropout: float = 0.0
    max_decoder_output_len: int = 200
    window_left: int = 50
    window_right: int = 50
    softw_offset: float = 10.0
    softw_rate: float = 5.0
    softw_std: float = 5.0

    @classmethod
    def from_flags(cls, cfg, n_classes: int) -> "S2SConfig":
        return cls(
            n_classes=n_classes,
            eos_idx=n_classes - 2,
            pad_idx=n_classes - 1,
            hidden=cfg.encoderdim or 256,
            n_layers=max(1, cfg.decoderrnnlayer),
            n_rounds=max(1, cfg.decoderattnround),
            attention={"content": "content", "keyvalue": "keyvalue"}.get(
                cfg.attention, "neural"
            ),
            attn_window=cfg.attnWindow,
            train_with_window=cfg.trainWithWindow,
            pretrain_window=cfg.pretrainWindow,
            pct_teacher_forcing=cfg.pctteacherforcing,
            sampling_strategy=cfg.samplingstrategy,
            gumbel_temperature=cfg.gumbeltemperature or 1.0,
            label_smooth=cfg.labelsmooth,
            dropout=cfg.decoderdropout,
            max_decoder_output_len=cfg.maxdecoderoutputlen,
            window_left=cfg.leftWindowSize,
            window_right=cfg.rightWindowSize,
            softw_offset=cfg.softwoffset,
            softw_rate=cfg.softwrate,
            softw_std=cfg.softwstd,
        )


def window_mask(kind, step_idx, T, prev_peak, c: S2SConfig):
    t_idx = jnp.arange(T)[None, :]
    if kind == "median":
        lo = prev_peak[:, None] - c.window_left
        hi = prev_peak[:, None] + c.window_right
        return (t_idx >= lo) & (t_idx <= hi)
    if kind == "step":
        lo = step_idx * c.softw_rate - c.softw_offset
        hi = step_idx * c.softw_rate + c.softw_offset
        return (t_idx >= lo) & (t_idx <= hi)
    if kind in ("soft", "softPretrain"):
        center = c.softw_offset + step_idx * c.softw_rate
        w = jnp.exp(-((t_idx - center) ** 2) / (2 * c.softw_std * c.softw_std))
        return w > 1e-4
    return None


class Seq2SeqCriterion(nn.Module):
    """GRU attention decoder criterion (fl Seq2SeqCriterion)."""

    cfg: S2SConfig
    scale_mode: CriterionScaleMode = CriterionScaleMode.NONE

    @classmethod
    def from_config(cls, cfg, n_classes: int):
        return cls(S2SConfig.from_flags(cfg, n_classes), get_scale_mode(cfg.onorm, cfg.sqnorm))

    def setup(self):
        c = self.cfg
        self.embedding = nn.Embed(c.n_classes, c.hidden)
        # one RNN stack + one attention per round (round-0 names keep the
        # single-round layout so existing checkpoints stay loadable)
        self.cells = [
            nn.GRUCell(c.hidden, name=f"gru{i}" if r == 0 else f"gru_r{r}_{i}")
            for r in range(c.n_rounds)
            for i in range(c.n_layers)
        ]
        self.out = nn.Dense(c.n_classes)
        if c.attention == "neural":
            self.attn_ws = [
                nn.Dense(c.hidden, name="attn_w" if r == 0 else f"attn_w_r{r}")
                for r in range(c.n_rounds)
            ]
            self.attn_vs = [
                nn.Dense(1, name="attn_v" if r == 0 else f"attn_v_r{r}")
                for r in range(c.n_rounds)
            ]

    # -- attention ---------------------------------------------------------
    def _attend(self, query, enc, mask, rnd: int = 0):
        c = self.cfg
        if c.attention == "neural":
            T = enc.shape[1]
            q = jnp.repeat(query[:, None], T, axis=1)
            h = jnp.tanh(self.attn_ws[rnd](jnp.concatenate([q, enc], axis=-1)))
            scores = self.attn_vs[rnd](h)[..., 0]
            keys = values = enc
        else:
            if c.attention == "keyvalue":
                keys, values = jnp.split(enc, 2, axis=-1)
            else:
                keys = values = enc
            scores = jnp.einsum("bh,bth->bt", query, keys) / math.sqrt(
                keys.shape[-1]
            )
        scores = jnp.where(mask, scores, -1e30)
        attn = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("bt,bth->bh", attn, values), attn

    # -- one decoder step --------------------------------------------------
    def decode_step(self, state, tok, enc, enc_mask, step_idx, windowed=False,
                    dropout_rng=None):
        """state = (hiddens tuple [n_rounds*n_layers], prev_peak);
        returns (state, logits). Per round r: x -> round-r GRU stack ->
        x += round-r attention summary; logits from the shared output
        linear after the final round (multi-round chaining per
        ``--decoderattnround``, slimIPL/src/Train.cpp:413-431).
        ``dropout_rng``: when given (training), --decoderdropout is applied
        to each round's GRU output (upstream passes it as the decoder RNN
        dropout)."""
        state, x = self.decode_step_core(state, tok, enc, enc_mask, step_idx,
                                         windowed, dropout_rng)
        return state, self.out(x)

    def decode_step_core(self, state, tok, enc, enc_mask, step_idx,
                         windowed=False, dropout_rng=None):
        """decode_step minus the output projection: returns (state, x) with
        x the pre-logit hidden. Lets the teacher-forced training scan hoist
        the hidden->vocab matmul (the step's FLOPs bulk: hidden x ~10k)
        outside the sequential loop as ONE batched (B*(U+1), hidden) GEMM —
        only the GRU recurrence and attention stay in the scan."""
        c = self.cfg
        hiddens, prev_peak = state
        x = self.embedding(tok)
        mask = enc_mask
        if windowed and c.attn_window != "no":
            wm = window_mask(c.attn_window, step_idx, enc.shape[1], prev_peak, c)
            if wm is not None:
                mask = mask & wm
        mask = mask | (~jnp.any(mask, axis=-1, keepdims=True))
        new_h = []
        a = None
        for r in range(c.n_rounds):
            for i in range(c.n_layers):
                k = r * c.n_layers + i
                hi, x = self.cells[k](hiddens[k], x)
                new_h.append(hi)
            if dropout_rng is not None and c.dropout > 0:
                keep = 1.0 - c.dropout
                m = jax.random.bernoulli(
                    jax.random.fold_in(dropout_rng, r), keep, x.shape
                )
                x = jnp.where(m, x / keep, jnp.zeros((), x.dtype))
            summary, a = self._attend(x, enc, mask, rnd=r)
            x = summary + x
        peak = jnp.argmax(a, axis=-1).astype(jnp.int32)
        return (tuple(new_h), peak), x

    def init_state(self, batch: int, dtype=jnp.float32):
        c = self.cfg
        hiddens = tuple(
            jnp.zeros((batch, c.hidden), dtype)
            for _ in range(c.n_rounds * c.n_layers)
        )
        return (hiddens, jnp.zeros((batch,), jnp.int32))

    # -- training loss -----------------------------------------------------
    def __call__(self, emissions, targets, emis_len, target_len,
                 train: bool = False, window: bool = False):
        """``window``: attention window active this step — the trainer gates
        it host-side per reference semantics (on while
        nupdates < --pretrainWindow, or always when --trainWithWindow;
        slimIPL/src/Train.cpp:1887-1903)."""
        c = self.cfg
        B, T, _ = emissions.shape
        U = targets.shape[1]
        enc_mask = jnp.arange(T)[None, :] < emis_len[:, None]
        tgt_in = jnp.where(targets < 0, c.pad_idx, targets)
        sos = jnp.full((B, 1), c.eos_idx, jnp.int32)
        dec_in = jnp.concatenate([sos, tgt_in], axis=1)  # (B, U+1)
        if self.is_initializing():
            # create all params OUTSIDE the scan (flax cannot initialize
            # inside lax.scan); the scan below then only reads them
            self.decode_step(
                self.init_state(B, emissions.dtype), dec_in[:, 0],
                emissions, enc_mask, 0,
            )
        tf_rng = None
        if train and (c.pct_teacher_forcing < 100.0 or c.dropout > 0):
            tf_rng = self.make_rng("dropout")
        use_window = window and train and c.attn_window not in ("no", "")
        do_rng = tf_rng if (train and c.dropout > 0) else None

        # pure teacher forcing (eval, or --pctteacherforcing=100): hoist the
        # hidden->vocab projection out of the scan — one (B*(U+1), hidden)
        # GEMM instead of U+1 skinny ones; scheduled sampling needs logits
        # in-loop (the sampled token feeds the next step)
        sample = train and c.pct_teacher_forcing < 100.0
        hoist_out = not sample

        def body(carry, u):
            state, prev_tok = carry
            step = self.decode_step_core if hoist_out else self.decode_step
            state, logits = step(
                state, prev_tok, emissions, enc_mask, u, windowed=use_window,
                dropout_rng=(jax.random.fold_in(do_rng, 500 + u)
                             if do_rng is not None else None),
            )
            next_tok = dec_in[:, jnp.minimum(u + 1, U)]
            if sample:
                use_tf = jax.random.uniform(jax.random.fold_in(tf_rng, u), (B,)) < (
                    c.pct_teacher_forcing / 100.0
                )
                if c.sampling_strategy == "model":
                    sampled = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                elif c.sampling_strategy == "gumbel":
                    # Gumbel sampling from the model distribution at
                    # --gumbeltemperature (reference kGumbelSampling)
                    sampled = jax.random.categorical(
                        jax.random.fold_in(tf_rng, 20000 + u),
                        logits.astype(jnp.float32) / c.gumbel_temperature,
                        axis=-1,
                    ).astype(jnp.int32)
                else:
                    sampled = jax.random.randint(
                        jax.random.fold_in(tf_rng, 10000 + u), (B,), 0, c.n_classes
                    )
                next_tok = jnp.where(use_tf, next_tok, sampled)
            return (state, next_tok), logits

        (_, _), ys = jax.lax.scan(
            body, (self.init_state(B, emissions.dtype), dec_in[:, 0]), jnp.arange(U + 1)
        )
        ys = ys.transpose(1, 0, 2)  # (B, U+1, hidden | N)
        logits = self.out(ys) if hoist_out else ys  # (B, U+1, N)
        return self._nll(logits, tgt_in, target_len, emis_len)

    def _nll(self, logits, tgt_in, target_len, emis_len):
        c = self.cfg
        B, U1, _ = logits.shape
        U = U1 - 1
        u_idx = jnp.arange(U1)[None, :]
        gold = jnp.concatenate(
            [tgt_in, jnp.full((B, 1), c.pad_idx, jnp.int32)], axis=1
        )[:, :U1]
        gold = jnp.where(u_idx == target_len[:, None], c.eos_idx, gold)
        valid = u_idx <= target_len[:, None]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, gold[..., None], axis=-1)[..., 0]
        if c.label_smooth > 0:
            nll = (1 - c.label_smooth) * nll + c.label_smooth * (-logp.mean(-1))
        losses = jnp.sum(jnp.where(valid, nll, 0.0), axis=1)
        return scale_losses(losses, self.scale_mode, emis_len, target_len + 1)

    # -- greedy ("viterbi") decode ----------------------------------------
    def greedy_path(self, emissions, emis_len):
        c = self.cfg
        B, T, _ = emissions.shape
        enc_mask = jnp.arange(T)[None, :] < emis_len[:, None]
        L = c.max_decoder_output_len

        def body(carry, u):
            state, prev_tok, done = carry
            state, logits = self.decode_step(state, prev_tok, emissions, enc_mask, u)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            tok = jnp.where(done, c.pad_idx, tok)
            done = done | (tok == c.eos_idx)
            return (state, tok, done), tok

        (_, _, _), toks = jax.lax.scan(
            body,
            (self.init_state(B, emissions.dtype),
             jnp.full((B,), c.eos_idx, jnp.int32), jnp.zeros((B,), bool)),
            jnp.arange(L),
        )
        toks = toks.transpose(1, 0)
        is_end = (toks == c.eos_idx) | (toks == c.pad_idx)
        lengths = jnp.argmax(is_end, axis=1)
        lengths = jnp.where(jnp.any(is_end, axis=1), lengths, L)
        return toks, lengths.astype(jnp.int32)


class TransformerS2SCriterion(nn.Module):
    """Transformer attention-decoder criterion (fl TransformerCriterion;
    ``--criterion=transformer`` with ``--am_decoder_tr_layers`` layers)."""

    cfg: S2SConfig
    scale_mode: CriterionScaleMode = CriterionScaleMode.NONE
    n_tr_layers: int = 2
    n_heads: int = 4
    tr_dropout: float = 0.0  # --am_decoder_tr_dropout
    tr_layerdrop: float = 0.0  # --am_decoder_tr_layerdrop

    @classmethod
    def from_config(cls, cfg, n_classes: int):
        return cls(
            S2SConfig.from_flags(cfg, n_classes),
            get_scale_mode(cfg.onorm, cfg.sqnorm),
            n_tr_layers=max(1, cfg.am_decoder_tr_layers),
            tr_dropout=cfg.am_decoder_tr_dropout,
            tr_layerdrop=cfg.am_decoder_tr_layerdrop,
        )

    def setup(self):
        c = self.cfg
        L = self.n_tr_layers
        self.embedding = nn.Embed(c.n_classes, c.hidden)
        self.out = nn.Dense(c.n_classes)
        # explicit projections so decoding can KV-cache incrementally
        zeros = nn.initializers.zeros
        self.sq = [nn.Dense(c.hidden, name=f"sq{i}") for i in range(L)]
        self.sk = [nn.Dense(c.hidden, name=f"sk{i}") for i in range(L)]
        self.sv = [nn.Dense(c.hidden, name=f"sv{i}") for i in range(L)]
        # residual-branch output projections zero-init: the decoder starts
        # as out(emb + pos) — near-uniform predictions, stable deep init
        self.so = [nn.Dense(c.hidden, kernel_init=zeros, name=f"so{i}") for i in range(L)]
        self.cq = [nn.Dense(c.hidden, name=f"cq{i}") for i in range(L)]
        self.ck = [nn.Dense(c.hidden, name=f"ck{i}") for i in range(L)]
        self.cv = [nn.Dense(c.hidden, name=f"cv{i}") for i in range(L)]
        self.co = [nn.Dense(c.hidden, kernel_init=zeros, name=f"co{i}") for i in range(L)]
        self.ln1 = [nn.LayerNorm(name=f"ln1_{i}") for i in range(L)]
        self.ln2 = [nn.LayerNorm(name=f"ln2_{i}") for i in range(L)]
        self.ln3 = [nn.LayerNorm(name=f"ln3_{i}") for i in range(L)]
        self.ff1 = [nn.Dense(4 * c.hidden, name=f"ff1_{i}") for i in range(L)]
        self.ff2 = [nn.Dense(c.hidden, kernel_init=zeros, name=f"ff2_{i}") for i in range(L)]

    def _heads(self, a):
        B, L, D = a.shape
        H = self.n_heads
        return a.reshape(B, L, H, D // H).transpose(0, 2, 1, 3)  # (B,H,L,dh)

    def _attend(self, q, k, v, mask, o_proj):
        # q (B,Lq,D), k/v (B,Lk,D), mask broadcastable to (B,1,Lq,Lk)
        dh = q.shape[-1] // self.n_heads
        qh, kh, vh = self._heads(q), self._heads(k), self._heads(v)
        s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
        s = jnp.where(mask, s, -1e30)
        a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", a, vh)
        B, H, Lq, _ = o.shape
        return o_proj(o.transpose(0, 2, 1, 3).reshape(B, Lq, H * dh))

    def _drop(self, x, train):
        """--am_decoder_tr_dropout on the residual branches (train only)."""
        if not train or self.tr_dropout <= 0:
            return x
        keep = 1.0 - self.tr_dropout
        m = jax.random.bernoulli(self.make_rng("dropout"), keep, x.shape)
        return jnp.where(m, x / keep, jnp.zeros((), x.dtype))

    def _layer_scale(self, train):
        """--am_decoder_tr_layerdrop: whole-layer Bernoulli drop."""
        if not train or self.tr_layerdrop <= 0:
            return 1.0
        drop = jax.random.bernoulli(self.make_rng("dropout"), self.tr_layerdrop)
        return jnp.where(drop, 0.0, 1.0)

    def _decode_all(self, dec_in, enc, enc_mask, train=False, window=False):
        c = self.cfg
        U1 = dec_in.shape[1]
        x = self.embedding(dec_in) + _sinusoid(U1, c.hidden, enc.dtype)[None]
        causal = jnp.tril(jnp.ones((U1, U1), bool))[None, None]
        cmask = enc_mask[:, None, None, :]
        if window and train and c.attn_window in ("soft", "softPretrain", "step"):
            # per-output-step encoder window on the cross-attention (the
            # vectorizable kinds; `median` needs the sequential peak and only
            # applies to the RNN criterion's stepwise path)
            wm = window_mask(
                c.attn_window, jnp.arange(U1)[:, None], enc.shape[1],
                jnp.zeros((1,), jnp.int32), c,
            )  # (U1, T)
            cmask = cmask & wm[None, None]
            cmask = cmask | (~jnp.any(cmask, axis=-1, keepdims=True))
        for i in range(self.n_tr_layers):
            f = self._layer_scale(train)
            h = self.ln1[i](x)
            x = x + f * self._drop(
                self._attend(self.sq[i](h), self.sk[i](h), self.sv[i](h),
                             causal, self.so[i]), train)
            h = self.ln2[i](x)
            x = x + f * self._drop(
                self._attend(self.cq[i](h), self.ck[i](enc), self.cv[i](enc),
                             cmask, self.co[i]), train)
            h = self.ln3[i](x)
            x = x + f * self._drop(self.ff2[i](jax.nn.gelu(self.ff1[i](h))), train)
        return self.out(x)

    # -- incremental decoding (KV cache) -----------------------------------
    def init_state(self, batch: int, dtype=jnp.float32):
        c = self.cfg
        Lmax = c.max_decoder_output_len + 1
        L = self.n_tr_layers
        # hypothesis axis leads every leaf so beam search can gather rows
        return {
            "k": jnp.zeros((batch, L, Lmax, c.hidden), dtype),
            "v": jnp.zeros((batch, L, Lmax, c.hidden), dtype),
            "pos": jnp.zeros((batch,), jnp.int32),
        }

    def decode_step(self, state, tok, enc, enc_mask, step_idx, windowed=False):
        """One token step with self-attention KV cache; cross-attention K/V
        recomputed from enc (cheap at ASR encoder lengths). Same signature
        contract as Seq2SeqCriterion.decode_step (beam-generic)."""
        c = self.cfg
        B = tok.shape[0]
        pos = state["pos"][0]  # beams advance in lockstep
        Lmax = state["k"].shape[2]
        x = self.embedding(tok)[:, None]  # (B,1,D)
        x = x + _sinusoid(Lmax, c.hidden, x.dtype)[pos][None, None]
        kc, vc = state["k"], state["v"]
        valid = (jnp.arange(Lmax)[None, :] <= pos)[:, None, None, :]  # (1,1,1,Lmax)
        cmask = enc_mask[:, None, None, :]
        for i in range(self.n_tr_layers):
            h = self.ln1[i](x)
            kc = kc.at[:, i, pos].set(self.sk[i](h)[:, 0])
            vc = vc.at[:, i, pos].set(self.sv[i](h)[:, 0])
            x = x + self._attend(self.sq[i](h), kc[:, i], vc[:, i], valid, self.so[i])
            h = self.ln2[i](x)
            x = x + self._attend(self.cq[i](h), self.ck[i](enc), self.cv[i](enc),
                                 cmask, self.co[i])
            h = self.ln3[i](x)
            x = x + self.ff2[i](jax.nn.gelu(self.ff1[i](h)))
        logits = self.out(x[:, 0])
        new_state = {"k": kc, "v": vc, "pos": state["pos"] + 1}
        return new_state, logits

    def __call__(self, emissions, targets, emis_len, target_len,
                 train: bool = False, window: bool = False):
        c = self.cfg
        B, T, _ = emissions.shape
        U = targets.shape[1]
        enc_mask = jnp.arange(T)[None, :] < emis_len[:, None]
        tgt_in = jnp.where(targets < 0, c.pad_idx, targets)
        sos = jnp.full((B, 1), c.eos_idx, jnp.int32)
        dec_in = jnp.concatenate([sos, tgt_in], axis=1)
        logits = self._decode_all(dec_in, emissions, enc_mask, train=train,
                                  window=window)
        return Seq2SeqCriterion._nll(self, logits, tgt_in, target_len, emis_len)

    def greedy_path(self, emissions, emis_len):
        """Greedy decode via the incremental KV-cached step (O(L))."""
        c = self.cfg
        B, T, _ = emissions.shape
        enc_mask = jnp.arange(T)[None, :] < emis_len[:, None]
        L = c.max_decoder_output_len
        if self.is_initializing():
            st = self.init_state(B, emissions.dtype)
            self.decode_step(st, jnp.full((B,), c.eos_idx, jnp.int32),
                             emissions, enc_mask, 0)

        def body(carry, u):
            state, prev_tok, done = carry
            state, logits = self.decode_step(state, prev_tok, emissions, enc_mask, u)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            nxt = jnp.where(done, c.pad_idx, nxt)
            done = done | (nxt == c.eos_idx)
            return (state, nxt, done), nxt

        (_, _, _), outs = jax.lax.scan(
            body,
            (self.init_state(B, emissions.dtype),
             jnp.full((B,), c.eos_idx, jnp.int32), jnp.zeros((B,), bool)),
            jnp.arange(L),
        )
        outs = outs.transpose(1, 0)
        is_end = (outs == c.eos_idx) | (outs == c.pad_idx)
        lengths = jnp.argmax(is_end, axis=1)
        lengths = jnp.where(jnp.any(is_end, axis=1), lengths, L)
        return outs, lengths.astype(jnp.int32)
