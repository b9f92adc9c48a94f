"""slimIPL — semi-supervised training with a pseudo-label cache.

Reference: ``recipes/slimIPL/src/Train.cpp`` (1944 LoC; flags ``:79-102``,
cache dump/restore across restarts ``:477-533``, PL generation ``:1362-1417``,
cache-type dispatch ``:1483-1650``, post-update relabel ``:1833-1841``).
Mechanics reimplemented:

  * supervised warmup until ``--slimIPL_start`` updates;
  * then a shuffled window of ``--slimIPL_sup_updates`` supervised +
    ``--slimIPL_unsup_updates`` unsupervised batches (``setsOrder``,
    ``Train.cpp:1216-1227``), reshuffled when exhausted;
  * ``--slimIPL_type`` (``Train.cpp:80-85``):
      - ``naive``          — relabel the batch with the current model, then
                             backward on those PLs immediately;
      - ``cache``          — train on cached PLs; AFTER the optimizer step,
                             relabel the batch with the updated model and
                             store (``:1833-1841``). If no row is cached yet,
                             the update is skipped and the batch is labeled
                             into the cache (``doUpdate=false``, ``:1587-91``);
      - ``pre-cache``      — train on cached PLs; ALWAYS relabel with the
                             pre-update model and store (``:1586-1590``);
      - ``fixed-pre-cache``— batch-level cache of ``--slimIPL_fixed_cache_updates``
                             unsup batches. Until full, each unsup step labels
                             one batch ahead (no model update); once full,
                             batches are served from a shuffled pass over the
                             cache while, with prob
                             ``--slimIPL_fixed_cache_update_prob``, one new
                             batch is labeled and replaces the served slot
                             (``:1238-1305``);
  * ``--slimIPL_use_soft`` (fixed-pre-cache only, ``:1483-1550``): the cache
    stores full emissions; the unsup loss is
    ``soft_scale * CE(softmax(cached), log_softmax(current))`` per frame.
    Deviation: we average over *valid* (unpadded) frames, the reference
    averages over the padded time axis (``:1663-1670``);
  * PLs come from the EMA model when ``--slimIPL_ema`` (``predictPLCommon``
    ``:1362-1380`` forwards ``ntwrkEMA``); EMA is updated after every step
    (``:1823-1831``) and persisted in the checkpoint;
  * PL quality (WER of PLs vs the true transcripts, when the unsup list
    carries them) is metered per generation batch (``unsupQuality``,
    ``:1381-1405``); unsup loss/TER/WER go to separate meters
    (``meters.trainUnsup``, ``:1711-1713,1775-1779``);
  * ``--slimIPL_saug`` — supervised batches get a stronger SpecAugment
    (``fmaskn+1``, ``tmaskn*1.5``; ``:1052-1076``), unsup batches the normal
    one;
  * ``--slimIPL_dyn_dropout`` — at PL start every dropout in the network is
    reset to this value (reference passes it as a runtime forward arg,
    ``:1465-1469``; we rebuild the paramless dropout modules from the arch
    file and re-jit — parameters are untouched);
  * caches persist for exact ``continue`` (``saveModels`` ``:718-747``):
    token PLs as JSON, the fixed batch list as JSON, soft emissions as NPZ.

TPU-native notes: the PL cache holds token-id sequences (the reference
stores words and re-tokenizes through the lexicon — equivalent, round-trip
tested); PL generation is a dedicated jitted eval step; the unsup batches
ride the same pjit'd train step as supervised ones with unlabeled rows
masked via ``sample_idx=-1`` (pjit requires static shapes, so rows are
masked, not gathered as the reference does with ``maskedSamples``).
"""

from __future__ import annotations

import json
import os
import random
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..data import AsrDataset, PrefetchIterator
from ..data.targets import tokens_to_words
from ..parallel import shard_batch
from ..parallel.mesh import DATA_AXIS
from .meters import AverageMeter, DatasetMeters, EditDistanceMeter
from .train import Trainer, _log

SLIMIPL_DEFAULTS = dict(  # upstream defaults, slimIPL/src/Train.cpp:79-102
    unsup_datadir="",  # prefix for --unsup_train (Train.cpp:73-78)
    unsup_train="",  # comma list of unlabeled .lst files
    slimIPL_start=0,
    slimIPL_type="naive",  # naive|cache|pre-cache|fixed-pre-cache
    slimIPL_fixed_cache_updates=1000,  # size of the fixed batch cache
    slimIPL_cache_path="",
    slimIPL_sup_updates=1,
    slimIPL_unsup_updates=3,
    slimIPL_fixed_cache_update_prob=1.0,
    slimIPL_ema=False,
    slimIPL_ema_decay=0.999,
    slimIPL_use_soft=False,  # frame-wise soft-label distillation loss
    slimIPL_soft_scale=20.0,
    slimIPL_saug=False,  # stronger SpecAugment for sup batches (:1052-1076)
    slimIPL_dyn_dropout=-1.0,  # set all net dropouts to this at PL start
)


class SlimIPLTrainer(Trainer):
    """Extends the base Trainer with an unsupervised PL stream."""

    def __init__(self, cfg: Config, ipl_flags: Optional[Dict] = None,
                 unsup_list: str = "", **kw):
        super().__init__(cfg, **kw)
        # the unpaired-audio cache/augment paths featurize raw audio
        # themselves — keep the audio-domain pipeline regardless of
        # --features_device
        self.host_features = False
        self.train_ds.set_host_featurizer(None)
        for _ds in self.valid_ds.values():
            _ds.set_host_featurizer(None)
        self.fl = dict(SLIMIPL_DEFAULTS)
        if ipl_flags:
            ipl_flags = dict(ipl_flags)
            if "slimIPL_cache_sz" in ipl_flags:  # legacy alias
                ipl_flags["slimIPL_fixed_cache_updates"] = ipl_flags.pop(
                    "slimIPL_cache_sz"
                )
            self.fl.update(ipl_flags)
        if self.fl["slimIPL_type"] not in (
            "naive", "cache", "pre-cache", "fixed-pre-cache"
        ):
            raise ValueError(f"unknown slimIPL_type {self.fl['slimIPL_type']!r}")
        # stronger sup-batch SpecAugment (upstream: fmaskn+1, tmaskn*1.5)
        self.specaug_strong = None
        if self.fl["slimIPL_saug"] and cfg.saug_start_update >= 0:
            from ..features.specaug import SpecAugment

            self.specaug_strong = SpecAugment(
                n_freq_masks=cfg.saug_fmaskn + 1,
                freq_mask_f=cfg.saug_fmaskf,
                n_time_masks=int(cfg.saug_tmaskn * 1.5),
                time_mask_t=cfg.saug_tmaskt,
                time_mask_p=cfg.saug_tmaskp,
            )
        # unlabeled stream: explicit arg > --unsup_datadir/--unsup_train
        # (upstream flags, Train.cpp:73-78) > --train2
        unsup_spec = unsup_list
        if not unsup_spec and str(self.fl["unsup_train"]):
            import os as _os

            dd = str(self.fl["unsup_datadir"])
            unsup_spec = ",".join(
                _os.path.join(dd, p) if dd and not _os.path.isabs(p) else p
                for p in str(self.fl["unsup_train"]).split(",") if p.strip()
            )
        unsup_spec = unsup_spec or cfg.train2
        self.unsup_ds = AsrDataset(
            unsup_spec, self.token_dict, self.lexicon, cfg,
            allow_empty_targets=True,
            world_rank=jax.process_index(), world_size=jax.process_count(),
        )
        # PL cache: sample_id -> list[int] token ids
        self.cache: Dict[str, List[int]] = {}
        # soft PL cache: sample_id -> f16 emissions (elen, n_classes)
        self.soft_cache: Dict[str, np.ndarray] = {}
        # fixed-pre-cache: unsup batch-spec indices whose PLs are cached
        self.fixed_cache: List[int] = []
        self._cache_hits = 0
        self._label_cursor = 0
        self._label_order: List[int] = []
        self.meters_unsup = DatasetMeters()
        self.pl_quality = EditDistanceMeter()
        self._tout_cache: Dict[tuple, int] = {}
        self.ema_params = None
        if self.fl["slimIPL_ema"]:
            # deep copy: the train step donates its param buffers
            self.ema_params = jax.tree.map(jnp.copy, self.model_params)
            if self._resume is not None and self._resume.extra.get("ema_params"):
                from flax import serialization

                self.ema_params = serialization.from_state_dict(
                    self.ema_params, self._resume.extra["ema_params"]
                )
        self._rng = random.Random(cfg.seed + 99)
        self._restore_cache()

    # -- cache persistence (reference cache resume, Train.cpp:477-533) -----
    def _cache_file(self, suffix=""):
        p = self.fl["slimIPL_cache_path"] or (
            os.path.join(self.rundir, "pl_cache") if self.rundir else ""
        )
        # accept legacy explicit ".json" cache paths
        if p.endswith(".json"):
            p = p[: -len(".json")]
        return (p + suffix) if p else ""

    def _restore_cache(self):
        p = self._cache_file(".json")
        if p and os.path.exists(p):
            with open(p) as f:
                self.cache = {k: list(map(int, v)) for k, v in json.load(f).items()}
            _log(f"slimIPL: restored {len(self.cache)} cached PLs")
        p = self._cache_file("_fixed.json")
        if p and os.path.exists(p):
            with open(p) as f:
                st = json.load(f)
            self.fixed_cache = list(map(int, st["batches"]))[
                : int(self.fl["slimIPL_fixed_cache_updates"])
            ]
            self._cache_hits = min(int(st.get("hits", 0)), len(self.fixed_cache))
            self._label_cursor = int(st.get("cursor", 0))
            _log(f"slimIPL: restored fixed cache of {len(self.fixed_cache)} batches")
        p = self._cache_file("_soft.npz")
        if p and os.path.exists(p):
            with np.load(p) as z:
                self.soft_cache = {k: z[k] for k in z.files}
            _log(f"slimIPL: restored {len(self.soft_cache)} soft PLs")

    def _dump_cache(self):
        if jax.process_index() != 0:
            return
        p = self._cache_file(".json")
        if p:
            with open(p, "w") as f:
                json.dump(self.cache, f)
        if self.fixed_cache:
            with open(self._cache_file("_fixed.json"), "w") as f:
                json.dump(
                    {"batches": self.fixed_cache, "hits": self._cache_hits,
                     "cursor": self._label_cursor}, f,
                )
        if self.soft_cache:
            np.savez(self._cache_file("_soft.npz"), **self.soft_cache)

    def _ckpt_extra(self):
        if self.ema_params is not None:
            from flax import serialization

            return {"ema_params": serialization.to_state_dict(
                jax.tree.map(np.asarray, self.ema_params))}
        return {}

    # -- PL generation (predictPLCommon, Train.cpp:1362-1417) --------------
    def _make_pl_step(self):
        def step(model_params, crit_params, model_state, batch):
            feats, flen = self.featurizer(batch["audio"], batch["audio_len"])
            feats = feats.astype(self.compute_dtype)
            em, elen = self.model.apply(
                {"params": model_params, **model_state}, feats, flen, train=False
            )
            em = em.astype(jnp.float32)
            vit, vlen = self._viterbi(crit_params, em, elen)
            return em, elen, vit, vlen

        from jax.sharding import NamedSharding, PartitionSpec as P

        dat = NamedSharding(self.mesh, P(DATA_AXIS))
        keys = ("audio", "audio_len", "target", "target_len", "sample_idx",
                "row_mask")
        return jax.jit(
            step, in_shardings=(None, None, None, {k: dat for k in keys})
        )

    def _generate_pls(self, batch, want_soft=False):
        """Greedy-transcribe ``batch`` with the PL model (EMA if enabled).

        Returns ``{dataset_idx: token_ids}`` and, if ``want_soft``, also
        ``{dataset_idx: f16 emissions (elen, N)}``. Updates the PL-quality
        meter against any true transcripts present in the batch.
        """
        params = self.ema_params if self.ema_params is not None else self.model_params
        padded, sb = self._prep(batch)
        em, elen, vit, vlen = self._pl_step(
            params, self.crit_params, self.model_state, sb
        )
        elen, vit, vlen = np.asarray(elen), np.asarray(vit), np.asarray(vlen)
        sidx = np.asarray(padded["sample_idx"])
        tgts = np.asarray(padded["target"])
        tlens = np.asarray(padded["target_len"])
        out, soft = {}, {}
        wsep = self.cfg.wordseparator
        if want_soft:
            em = np.asarray(em, dtype=np.float16)
        for i in range(len(sidx)):
            if sidx[i] < 0:
                continue
            toks = self._path_to_tokens(vit[i], int(vlen[i]))
            out[int(sidx[i])] = toks
            if want_soft:
                soft[int(sidx[i])] = em[i, : int(elen[i])]
            if tlens[i] > 0:  # PL quality vs provided transcript
                ref = [int(t) for t in tgts[i, : int(tlens[i])]]
                self.pl_quality.add(
                    tokens_to_words(self.token_dict.map_indices(ref), wsep,
                                    self.cfg.usewordpiece),
                    tokens_to_words(self.token_dict.map_indices(toks), wsep,
                                    self.cfg.usewordpiece),
                )
        return (out, soft) if want_soft else out

    def _store_pls(self, pls: Dict[int, List[int]], soft=None):
        for i, toks in pls.items():
            self.cache[self.unsup_ds.samples[i].sample_id] = toks
        if soft:
            for i, em in soft.items():
                self.soft_cache[self.unsup_ds.samples[i].sample_id] = em

    def _relabel(self, batch, from_cache: bool):
        """Replace targets with PLs; rows without a PL are masked out.

        Reference gathers labeled rows (``maskedSamples``); under pjit we
        keep shapes static and mask via ``sample_idx=-1`` instead.
        """
        ids = [int(i) for i in batch["sample_idx"]]
        labels = []
        for i in ids:
            sid = self.unsup_ds.samples[i].sample_id
            labels.append(self.cache.get(sid) if from_cache else self.cache[sid])
        have = [l is not None for l in labels]
        n = sum(have)
        if n == 0:
            return None, 0
        width = max(max((len(l) for l in labels if l is not None), default=1), 1)
        width = -(-width // 16) * 16  # bucket target widths to limit re-jits
        tgt = np.full((len(ids), width), -1, dtype=np.int32)
        tlen = np.zeros((len(ids),), dtype=np.int32)
        sidx = np.asarray(batch["sample_idx"]).copy()
        for r, l in enumerate(labels):
            if l is None:
                sidx[r] = -1  # row masked out of loss and meters
                continue
            l = l[:width]
            tgt[r, : len(l)] = l
            tlen[r] = len(l)
        return dict(batch, target=tgt, target_len=tlen, sample_idx=sidx), n

    def _update_ema(self):
        if self.ema_params is None:
            return
        d = float(self.fl["slimIPL_ema_decay"])
        self.ema_params = jax.tree.map(
            lambda e, p: d * e + (1 - d) * p, self.ema_params, self.model_params
        )

    # -- dyn dropout (Train.cpp:1465-1469) ----------------------------------
    _DROPOUT_OPERAND = {"DO": 1, "TDS": 4, "TR": 5, "CFR": 6}

    def _apply_dyn_dropout(self):
        p = float(self.fl["slimIPL_dyn_dropout"])
        cfg = self.cfg
        arch_path = os.path.join(cfg.archdir, cfg.arch) if cfg.archdir else cfg.arch
        if arch_path.endswith(".py") or ":" in arch_path:
            _log("slimIPL: dyn_dropout unsupported for plugin archs; skipped")
            return
        from ..models.arch import build_arch_from_lines, parse_arch_file

        lines = parse_arch_file(arch_path, self.n_feat, self.model.n_label)
        out = []
        for line in lines:
            t = line.split()
            pos = self._DROPOUT_OPERAND.get(t[0])
            if pos is not None and len(t) > pos:
                t[pos] = repr(p)
            out.append(" ".join(t))
        self.model = build_arch_from_lines(out, self.model.n_label)
        _log(f"slimIPL: dropouts set to {p}, steps re-jitted")

    # -- soft-label step (Train.cpp:1663-1670) ------------------------------
    def _tout(self, batch) -> int:
        """Model output frames for this padded batch shape (no compute)."""
        key = batch["audio"].shape
        if key not in self._tout_cache:
            a = jax.ShapeDtypeStruct(batch["audio"].shape, jnp.float32)
            al = jax.ShapeDtypeStruct(batch["audio_len"].shape, jnp.int32)

            def f(a, al):
                feats, flen = self.featurizer(a, al)
                return self.model.apply(
                    {"params": self.model_params, **self.model_state},
                    feats.astype(self.compute_dtype), flen, train=False,
                )

            em_s, _ = jax.eval_shape(f, a, al)
            self._tout_cache[key] = int(em_s.shape[1])
        return self._tout_cache[key]

    def _make_soft_step(self):
        cfg = self.cfg
        scale = float(self.fl["slimIPL_soft_scale"])

        def step(model_params, model_state, net_opt, batch, soft_tgt, rng,
                 lr, saug_on, amp_scale):
            def scaled_loss(mp):
                feats, flen = self.featurizer(batch["audio"], batch["audio_len"])
                if self.specaug is not None:
                    rng2, k = jax.random.split(rng)
                    feats = jnp.where(saug_on, self.specaug(feats, k, flen), feats)
                else:
                    rng2 = rng
                feats = feats.astype(self.compute_dtype)
                mutable = list(model_state) if model_state else False
                out = self.model.apply(
                    {"params": mp, **model_state}, feats, flen, train=True,
                    rngs={"dropout": rng2,
                          "specaug": jax.random.fold_in(rng2, 1)},
                    mutable=mutable,
                )
                if mutable:
                    (em, elen), new_state = out
                else:
                    (em, elen), new_state = out, model_state
                em = em.astype(jnp.float32)
                q = jax.nn.softmax(soft_tgt.astype(jnp.float32), axis=-1)
                ce = -jnp.sum(q * jax.nn.log_softmax(em, axis=-1), axis=-1)
                fmask = (
                    jnp.arange(em.shape[1])[None, :] < elen[:, None]
                ).astype(jnp.float32) * batch["row_mask"][:, None]
                loss = scale * jnp.sum(ce * fmask) / jnp.maximum(jnp.sum(fmask), 1.0)
                return loss * amp_scale, (loss, new_state)

            (_, (loss, new_state)), g = jax.value_and_grad(
                scaled_loss, has_aux=True
            )(model_params)
            g = jax.tree.map(lambda x: x * (1.0 / amp_scale), g)
            if cfg.maxgradnorm > 0:
                gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                                  for x in jax.tree.leaves(g)))
                s = jnp.minimum(1.0, cfg.maxgradnorm / (gn + 1e-12))
                g = jax.tree.map(lambda x: x * s, g)
            finite = jnp.isfinite(loss)
            for x in jax.tree.leaves(g):
                finite = finite & jnp.all(jnp.isfinite(x))
            g = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), g)
            net_opt.hyperparams["learning_rate"] = lr
            upd, net_opt2 = self.net_tx.update(g, net_opt, model_params)
            model_params2 = optax.apply_updates(model_params, upd)
            model_state2 = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_state, model_state
            )
            return model_params2, model_state2, net_opt2, loss, finite

        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P(DATA_AXIS))
        keys = ("audio", "audio_len", "target", "target_len", "sample_idx",
                "row_mask")
        return jax.jit(
            step,
            in_shardings=(None, None, None, {k: dat for k in keys},
                          dat, rep, rep, rep, rep),
            donate_argnums=(0, 1, 2),
        )

    # -- per-type unsup machinery -------------------------------------------
    def _next_label_idx(self, n_batches: int) -> int:
        """Advance the shuffled labeling cursor (unsupBatchesIndices)."""
        if not self._label_order or self._label_cursor >= len(self._label_order):
            self._label_order = list(range(n_batches))
            self._rng.shuffle(self._label_order)
            self._label_cursor = 0
        i = self._label_order[self._label_cursor]
        self._label_cursor += 1
        return i

    def _jit_steps(self):
        self._train_step = self._make_train_step()
        self._train_step_sup = (
            self._make_train_step(specaug=self.specaug_strong)
            if self.specaug_strong is not None
            else self._train_step
        )
        self._eval_step = self._make_eval_step()
        self._pl_step = self._make_pl_step()
        if self.fl["slimIPL_use_soft"] and self.fl["slimIPL_type"] == "fixed-pre-cache":
            self._soft_step = self._make_soft_step()

    def _run_train_step(self, batch, rng, sup: bool):
        """One optimizer update; routes loss/TER to the right meter set."""
        cfg = self.cfg
        lr = self.net_sched(self.updates, self.epoch)
        lr_crit = self.crit_sched(self.updates, self.epoch)
        saug_on = jnp.asarray(
            cfg.saug_start_update >= 0 and self.updates >= cfg.saug_start_update
        )
        padded, sb = self._prep(batch)
        step = self._train_step_sup if sup else self._train_step
        (self.model_params, self.crit_params, self.model_state,
         self.net_opt_state, self.crit_opt_state,
         loss, finite, vit, vlen) = step(
            self.model_params, self.crit_params, self.model_state,
            self.net_opt_state, self.crit_opt_state, sb, rng,
            jnp.asarray(lr, jnp.float32), jnp.asarray(lr_crit, jnp.float32),
            saug_on, jnp.asarray(1.0, jnp.float32),
        )
        self.updates += 1
        self._update_ema()
        m = self.meters.train if sup else self.meters_unsup
        if bool(finite):
            m.loss.add(float(loss), int(padded["row_mask"].sum()))
        if np.random.rand() * 100.0 < cfg.pcttraineval:
            self._update_edit_meters(m, vit, vlen, padded)
        audio_s = float(np.sum(padded["audio_len"])) / cfg.samplerate
        self.meters.speed.add_audio(audio_s)

    def _run_soft_step(self, batch, rng):
        """Unsup update against cached soft emissions (use_soft path)."""
        ids = [int(i) for i in batch["sample_idx"]]
        sids = [self.unsup_ds.samples[i].sample_id for i in ids]
        sidx = np.asarray(batch["sample_idx"]).copy()
        n = 0
        for r, s in enumerate(sids):
            if s in self.soft_cache:
                n += 1
            else:
                sidx[r] = -1
        if n == 0:
            return False
        batch = dict(batch, sample_idx=sidx)
        padded, sb = self._prep(batch)
        T = self._tout(padded)
        N = self.n_classes
        soft = np.zeros((padded["audio"].shape[0], T, N), np.float32)
        for r, i in enumerate(np.asarray(padded["sample_idx"])):
            if i < 0:
                continue
            em = self.soft_cache[self.unsup_ds.samples[int(i)].sample_id]
            soft[r, : min(len(em), T)] = em[:T].astype(np.float32)
        soft = jax.device_put(
            soft, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec(DATA_AXIS))
        )
        lr = self.net_sched(self.updates, self.epoch)
        saug_on = jnp.asarray(
            self.cfg.saug_start_update >= 0
            and self.updates >= self.cfg.saug_start_update
        )
        (self.model_params, self.model_state, self.net_opt_state,
         loss, finite) = self._soft_step(
            self.model_params, self.model_state, self.net_opt_state, sb, soft,
            rng, jnp.asarray(lr, jnp.float32), saug_on,
            jnp.asarray(1.0, jnp.float32),
        )
        self.updates += 1
        self._update_ema()
        if bool(finite):
            self.meters_unsup.loss.add(float(loss), n)
        self.meters.speed.add_audio(
            float(np.sum(padded["audio_len"])) / self.cfg.samplerate
        )
        return True

    def _unsup_update(self, rng, unsup_gen, unsup_specs, stats):
        typ = self.fl["slimIPL_type"]
        soft = bool(self.fl["slimIPL_use_soft"]) and typ == "fixed-pre-cache"
        if typ == "fixed-pre-cache":
            N = int(self.fl["slimIPL_fixed_cache_updates"])
            prob = float(self.fl["slimIPL_fixed_cache_update_prob"])
            relabel = len(self.fixed_cache) < N or self._rng.random() < prob
            new_idx = -1
            if relabel:
                new_idx = self._next_label_idx(len(unsup_specs))
                nb = self.unsup_ds.materialize(unsup_specs[new_idx])
                if soft:
                    pls, softs = self._generate_pls(nb, want_soft=True)
                    self._store_pls(pls, softs)
                else:
                    self._store_pls(self._generate_pls(nb))
            if len(self.fixed_cache) < N:
                if relabel:
                    self.fixed_cache.append(new_idx)
                stats["warmed"] += 1  # cache warming, no model update (:1297-1303)
                self.updates += 1  # reference counts every batch (curBatch++)
                return
            if self._cache_hits >= len(self.fixed_cache):
                self._rng.shuffle(self.fixed_cache)  # new pass (:1264-1280)
                self._cache_hits = 0
            serve = self.fixed_cache[self._cache_hits]
            if relabel:  # replace the served slot for future passes (:1291-1298)
                self.fixed_cache[self._cache_hits] = new_idx
            self._cache_hits += 1
            batch = self.unsup_ds.materialize(unsup_specs[serve])
            if soft:
                if self._run_soft_step(batch, rng):
                    stats["unsup"] += 1
                else:
                    stats["skipped_unsup"] += 1
                    self.updates += 1
                return
            labeled, n = self._relabel(batch, from_cache=True)
            if n == 0:
                stats["skipped_unsup"] += 1
                self.updates += 1
                return
            self._run_train_step(labeled, rng, sup=False)
            stats["unsup"] += 1
            return

        batch = next(unsup_gen)
        if typ == "naive":
            self._store_pls(self._generate_pls(batch))
            labeled, n = self._relabel(batch, from_cache=False)
            if n:
                self._run_train_step(labeled, rng, sup=False)
                stats["unsup"] += 1
            else:
                stats["skipped_unsup"] += 1
                self.updates += 1
            return

        # cache / pre-cache
        labeled, n = self._relabel(batch, from_cache=True)
        pre = None
        if typ == "pre-cache" or n == 0:
            pre = self._generate_pls(batch)  # pre-update model (:1586-1590)
        if n:
            self._run_train_step(labeled, rng, sup=False)
            stats["unsup"] += 1
        else:
            stats["skipped_unsup"] += 1  # doUpdate=false (:1659-1662)
            self.updates += 1
        if pre:
            self._store_pls(pre)
        if typ == "cache" and n:
            # relabel with the post-update model (:1833-1841)
            self._store_pls(self._generate_pls(batch))

    # -- main loop ---------------------------------------------------------
    def run(self):
        cfg = self.cfg
        self._jit_steps()
        rng = jax.random.PRNGKey(cfg.seed + 7)
        sup_specs = self.train_ds.batch_specs(shuffle_seed=cfg.seed)
        unsup_specs = self.unsup_ds.batch_specs()  # stable order for indices

        def cycle(ds, shuffled):
            seed = cfg.seed
            while True:
                specs = ds.batch_specs(shuffle_seed=seed) if shuffled else (
                    ds.batch_specs())
                for b in PrefetchIterator(ds, specs, num_threads=cfg.nthread):
                    yield b
                seed += 1

        sup_gen = cycle(self.train_ds, True)
        unsup_gen = cycle(self.unsup_ds, True)
        start = int(self.fl["slimIPL_start"])
        nsup = int(self.fl["slimIPL_sup_updates"])
        nunsup = int(self.fl["slimIPL_unsup_updates"])
        stats = {"sup": 0, "unsup": 0, "skipped_unsup": 0, "warmed": 0}
        window: List[bool] = []
        dyn_applied = False
        report = cfg.reportiters
        self._pending = []  # unused (sync meters here) but report hooks expect it

        while self.updates < cfg.iter:
            before = self.updates
            pl_phase = self.updates >= start
            if pl_phase and not dyn_applied:
                dyn_applied = True
                if float(self.fl["slimIPL_dyn_dropout"]) >= 0:
                    self._apply_dyn_dropout()
                    self._jit_steps()
            if pl_phase:
                if not window:
                    # shuffled sup/unsup interleave (setsOrder, :1216-1227)
                    window = [True] * nsup + [False] * nunsup
                    self._rng.shuffle(window)
                is_sup = window.pop(0)
            else:
                is_sup = True
            rng, k = jax.random.split(rng)
            if is_sup:
                self._run_train_step(next(sup_gen), k, sup=True)
                stats["sup"] += 1
            else:
                self._unsup_update(k, unsup_gen, unsup_specs, stats)
            if report > 0 and self.updates != before and self.updates % report == 0:
                self._report_and_save()
                self._dump_cache()
                self._log_unsup()
        self._dump_cache()
        self.save()
        self._log_unsup()
        _log(f"slimIPL done: {stats}")
        return stats

    def _log_unsup(self):
        if self.meters_unsup.loss.n or self.pl_quality.total:
            _log(
                "slimIPL unsup: loss {:.5f} | TER {:.2f} | WER {:.2f} | "
                "PL-quality WER {:.2f} | cache {} | soft {} | fixed {}".format(
                    self.meters_unsup.loss.value(),
                    self.meters_unsup.tkn_edit.error_rate(),
                    self.meters_unsup.wrd_edit.error_rate(),
                    self.pl_quality.error_rate(),
                    len(self.cache), len(self.soft_cache), len(self.fixed_cache),
                )
            )
        self.meters_unsup.reset()
