"""Test executor — greedy/Viterbi evaluation (the ``fl_asr_test`` binary;
reference call stack SURVEY.md §3.3, ``cpc/Test.cpp:43-360``):

load AM checkpoint → re-inject stored flags (CLI wins) → dataset over
``--test`` → forward → viterbiPath → token/word edit meters → optional
``--show`` per-utterance output → optional emission serialization to
``--emission_dir`` (consumed by Decode, App B.7 format analog).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import AsrDataset, Lexicon, PrefetchIterator, make_token_dict
from ..data.targets import tokens_to_words
from ..features import FeatureParams, Featurizer
from ..models.arch import build_arch_module
from ..ops.asg import asg_collapse, asg_viterbi
from ..ops.ctc import ctc_collapse, ctc_viterbi
from .checkpoint import load_checkpoint
from .meters import DatasetMeters


class Evaluator:
    """Shared AM-forward + viterbi + meters machinery for Test/Decode."""

    def __init__(self, cfg: Config, am_path: Optional[str] = None):
        am_path = am_path or cfg.am
        ckpt = load_checkpoint(am_path)
        stored = Config.deserialize(ckpt.config)
        merged = stored.asdict()
        # CLI-provided evaluation flags override stored training flags
        for k in (
            "test", "datadir", "show", "showletters", "emission_dir", "sclite",
            "batchsize", "validbatchsize", "maxisz", "minisz", "maxtsz", "mintsz",
            "nthread", "lexicon", "tokens", "tokensdir", "pad_multiple",
        ):
            v = cfg.get(k)
            if v not in ("", None):
                merged[k] = v
        self.cfg = Config(**{})
        self.cfg.update(merged)
        cfg = self.cfg

        tokens_path = (
            os.path.join(cfg.tokensdir, cfg.tokens) if cfg.tokensdir else cfg.tokens
        )
        self.token_dict = make_token_dict(
            tokens_path, cfg.criterion, cfg.replabel, cfg.eostoken
        )
        self.n_classes = len(self.token_dict)
        self.lexicon = Lexicon.from_file(cfg.lexicon, cfg.maxword) if cfg.lexicon else None

        self.featurizer = Featurizer(FeatureParams.from_config(cfg))
        self.n_feat = cfg.num_features()
        self.is_s2s = cfg.criterion in ("seq2seq", "transformer")
        out_dim = (
            cfg.encoderdim if self.is_s2s and cfg.encoderdim > 0 else self.n_classes
        )
        arch_path = os.path.join(cfg.archdir, cfg.arch) if cfg.archdir else cfg.arch
        if arch_path.endswith(".py") or ":" in arch_path:
            from ..models.plugin import load_plugin_module

            self.model = load_plugin_module(arch_path, self.n_feat, out_dim)
        else:
            self.model = build_arch_module(
                arch_path, self.n_feat, out_dim,
                # s2s encoders emit the arch's own output dim (2x
                # encoderdim for keyvalue) — never force-reshape
                force_label_dim=not self.is_s2s,
            )
        self.s2s_criterion = None
        if self.is_s2s:
            from ..criterions import make_criterion

            self.s2s_criterion = make_criterion(cfg, self.n_classes)

        from flax import serialization

        # abstract init: only the variable TREE STRUCTURE is needed to
        # restore the checkpoint — eval_shape avoids materializing 115M
        # random params on the (possibly remote) device
        dummy = jnp.zeros((1, 64, self.n_feat))
        dl = jnp.asarray([64], jnp.int32)
        variables = jax.eval_shape(
            lambda: self.model.init({"params": jax.random.PRNGKey(0)}, dummy, dl)
        )
        variables = jax.tree.map(
            lambda s: np.zeros(s.shape, s.dtype), variables
        )
        params = serialization.from_state_dict(variables["params"], ckpt.model_params)
        state = {k: v for k, v in variables.items() if k != "params"}
        if ckpt.model_state:
            state = serialization.from_state_dict(state, ckpt.model_state)
        # pin restored params on device ONCE: checkpoint restore yields
        # host numpy arrays, and passing those to a jitted forward
        # re-transfers the whole model EVERY call (460 MB for the flagship
        # — ~40 s/batch over a 20-35 MB/s tunneled chip, measured;
        # invisible on local PCIe)
        self.variables = jax.device_put({"params": params, **state})
        self.crit_params = jax.device_put(ckpt.crit_params or {})
        self.transitions = None
        if cfg.criterion == "asg" and self.crit_params:
            self.transitions = jnp.asarray(self.crit_params["transitions"])

        # params as jit ARGUMENTS, not closure: closed-over variables embed
        # the whole model as HLO constants (oversized compile payloads on
        # remote/tunneled backends, and no donation)
        self._fwd = jax.jit(self._forward)
        self._fwd_topk = jax.jit(self._forward_topk, static_argnums=(3,))

    def _forward(self, variables, audio, audio_len):
        feats, flen = self.featurizer(audio, audio_len)
        feats = feats.astype(
            jnp.bfloat16 if self.cfg.compute_dtype == "bfloat16" else jnp.float32
        )
        em, elen = self.model.apply(variables, feats, flen)
        return em.astype(jnp.float32), elen

    def _forward_topk(self, variables, audio, audio_len, k):
        # emission-transfer compression for beam decode: the beam only ever
        # reads the top --beamsizetoken tokens per frame, so ship (val, idx)
        # pairs instead of the full (T, V) rows — ~V/k less device->host
        # traffic (the emission-queue producer's bottleneck on TPU)
        em, elen = self._forward(variables, audio, audio_len)
        vals, idx = jax.lax.top_k(em, k)
        return vals, idx.astype(jnp.int32), elen

    def emissions(self, batch):
        return self._fwd(
            self.variables, jnp.asarray(batch["audio"]),
            jnp.asarray(batch["audio_len"]),
        )

    def emissions_topk(self, batch, k: int):
        return self._fwd_topk(
            self.variables, jnp.asarray(batch["audio"]),
            jnp.asarray(batch["audio_len"]), int(k),
        )

    def viterbi(self, em, elen):
        """Returns (path, path_len)."""
        if self.is_s2s:
            toks, lens = self.s2s_criterion.apply(
                {"params": self.crit_params}, em, elen, method="greedy_path"
            )
            return toks, lens
        if self.cfg.criterion == "asg":
            return asg_viterbi(em, self.transitions, elen), elen
        return ctc_viterbi(em, elen), elen

    def batch_loss(self, em, elen, targets, target_len):
        """Per-batch mean criterion loss (reference Test.cpp loss meter)."""
        import jax.numpy as jnp

        tgt = jnp.asarray(targets)
        tl = jnp.asarray(target_len)
        if self.is_s2s:
            losses = self.s2s_criterion.apply(
                {"params": self.crit_params}, em, tgt, elen, tl
            )
        elif self.cfg.criterion == "asg":
            from ..ops.asg import asg_loss

            losses = asg_loss(em, self.transitions, tgt, elen, tl)
        else:
            from ..ops.ctc import ctc_loss

            losses = ctc_loss(em, tgt, elen, tl)
        return float(losses.mean())

    def collapse(self, path_row, length):
        toks = [int(t) for t in path_row[:length]]
        if self.is_s2s:
            return toks
        if self.cfg.criterion == "asg":
            base = self.n_classes - self.cfg.replabel
            return asg_collapse([toks], self.cfg.replabel, base)[0]
        return ctc_collapse([toks], self.n_classes - 1)[0]


def run_test(cfg: Config) -> Dict[str, float]:
    ev = Evaluator(cfg)
    ecfg = ev.cfg
    ds = AsrDataset(
        ecfg.test, ev.token_dict, ev.lexicon, ecfg,
        batch_size=ecfg.batchsize,
    )
    meters = DatasetMeters()
    emission_dir = ecfg.emission_dir
    if emission_dir:
        os.makedirs(emission_dir, exist_ok=True)
    sclite_rows = []
    it = PrefetchIterator(ds, ds.batch_specs(), num_threads=max(1, ecfg.nthread))
    for batch in it:
        em, elen = ev.emissions(batch)
        meters.loss.add(
            ev.batch_loss(em, elen, batch["target"], batch["target_len"]),
            batch["audio"].shape[0],
        )
        vit, vlen = ev.viterbi(em, elen)
        vit, vlen = np.asarray(vit), np.asarray(vlen)
        em_np = np.asarray(em)
        elen_np = np.asarray(elen)
        for i in range(vit.shape[0]):
            sid = ds.samples[int(batch["sample_idx"][i])].sample_id
            hyp_toks = ev.collapse(vit[i], int(vlen[i]))
            ref_toks = [int(t) for t in batch["target"][i, : int(batch["target_len"][i])]]
            if ecfg.criterion == "asg" and ecfg.replabel > 0:
                from ..data.dictionary import unpack_replabels

                base = ev.n_classes - ecfg.replabel
                ref_toks = unpack_replabels(ref_toks, ecfg.replabel, base)
            meters.tkn_edit.add(ref_toks, hyp_toks)
            ref_w = tokens_to_words(
                ev.token_dict.map_indices(ref_toks), ecfg.wordseparator, ecfg.usewordpiece
            )
            hyp_w = tokens_to_words(
                ev.token_dict.map_indices(hyp_toks), ecfg.wordseparator, ecfg.usewordpiece
            )
            meters.wrd_edit.add(ref_w, hyp_w)
            if ecfg.sclite:
                sclite_rows.append((sid, ref_w, hyp_w))
            if ecfg.show:
                print(f"|T|: {' '.join(ref_w)}")
                print(f"|P|: {' '.join(hyp_w)}")
            if emission_dir:
                np.savez(
                    os.path.join(emission_dir, f"{sid}.npz"),
                    emission=em_np[i, : int(elen_np[i])],
                    sample_id=sid,
                )
    if ecfg.sclite:
        # same .hyp/.ref layout the beam decoder emits (decode.py sclite
        # path; reference Decode.cpp:206-233) so slice analyses can consume
        # viterbi and beam outputs uniformly
        os.makedirs(ecfg.sclite, exist_ok=True)
        base = os.path.join(ecfg.sclite, os.path.basename(ecfg.test))
        with open(base + ".hyp", "w") as fh, open(base + ".ref", "w") as fr:
            for sid, ref_w, hyp_w in sclite_rows:
                fh.write(f"{' '.join(hyp_w)} ({sid})\n")
                fr.write(f"{' '.join(ref_w)} ({sid})\n")
    res = {
        "TER": meters.tkn_edit.error_rate(),
        "WER": meters.wrd_edit.error_rate(),
        "loss": meters.loss.value(),
    }
    print(
        f"[Test {ecfg.test}] loss: {res['loss']:.4f}, "
        f"TER: {res['TER']:.2f}%, WER: {res['WER']:.2f}%"
    )
    return res
