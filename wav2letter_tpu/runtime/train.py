"""Training executor — the ``fl_asr_train`` equivalent.

Structure mirrors the reference Train binary (call stack in SURVEY.md §3.1,
``cpc/Train.cpp:223-1414``): mode dispatch (train|continue|fork), dictionary
construction with criterion extras, arch build, per-module optimizers
(net + criterion), dataset with shard-by-rank, the hot loop with LR schedule /
NaN guards / gradient clipping, periodic validation (viterbi WER meters) and
self-describing checkpoints.

TPU-native redesign of the hot loop: featurization + SpecAugment + model fwd +
criterion + backward + optimizer update are ONE jitted function over a device
mesh. Batches are sharded over the "data" axis; XLA inserts the gradient
psums the reference did with a NCCL CoalescingReducer. NaN handling: instead
of the AMP halve-and-retry loop (``cpc/Train.cpp:1216-1237`` — unnecessary
with bf16 compute + f32 master params), non-finite gradients zero the update
on-device and a skip counter is reported.
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..criterions import make_criterion
from ..data import (
    AsrDataset,
    Dictionary,
    Lexicon,
    PrefetchIterator,
    make_token_dict,
    make_word_dict,
)
from ..data.targets import tokens_to_words
from ..features import FeatureParams, Featurizer, SpecAugment
from ..models.arch import build_arch_module
from ..ops.asg import asg_collapse
from ..ops.ctc import ctc_collapse
from ..optim import LRSchedule, make_optimizer
from ..parallel import make_mesh, replicate, shard_batch
from ..parallel.mesh import DATA_AXIS, MeshSpec
from .checkpoint import (
    Checkpoint,
    find_last_checkpoint,
    load_checkpoint,
    run_index_paths,
    save_checkpoint,
)
from .meters import TrainMeters, get_log_string, sync_meters


def _log(msg: str):
    if jax.process_index() == 0:
        print(msg, flush=True)


class Trainer:
    def __init__(self, cfg: Config, mode: str = "train", init_model_path: str = ""):
        self.cfg = cfg
        self.mode = mode
        self.epoch = 0
        self.updates = 0
        self.run_idx = 1

        # --- run dir & continue/fork resolution (Train.cpp:241-327) ---
        self.rundir = os.path.join(cfg.rundir, cfg.runname) if cfg.runname else cfg.rundir
        resume_ckpt: Optional[Checkpoint] = None
        if mode == "continue":
            last = find_last_checkpoint(self.rundir)
            if not last:
                # fail loudly: silently starting fresh here would discard
                # the stored run config and train from scratch under the
                # run's name (reference `continue` requires a checkpoint,
                # Train.cpp:241-259)
                raise FileNotFoundError(
                    f"continue: no checkpoint (model_last.bin) under "
                    f"{self.rundir!r}")
            resume_ckpt = load_checkpoint(last)
            stored = Config.deserialize(resume_ckpt.config)
            # precedence: stored flags < EXPLICITLY re-passed flags.
            # Only flags the user actually set this run override the
            # checkpoint — process defaults must not clobber the stored
            # training config (`fl_asr_train continue` gflags parity;
            # a bare `continue --rundir=X` resumes with X's full flags).
            merged = stored.asdict()
            merged.update(cfg.explicit_dict())
            self.cfg = cfg = Config(**{})
            cfg.update(merged)
            self.epoch = resume_ckpt.epoch
            self.updates = resume_ckpt.updates
            idxs = run_index_paths(self.rundir)
            self.run_idx = (idxs[-1] + 1) if idxs else 1
        elif mode == "fork" and init_model_path:
            resume_ckpt = load_checkpoint(init_model_path)
        self._resume = resume_ckpt

        if self.rundir and jax.process_index() == 0:
            os.makedirs(self.rundir, exist_ok=True)

        # --- dictionaries (Train.cpp:399-436) ---
        tokens_path = (
            os.path.join(cfg.tokensdir, cfg.tokens) if cfg.tokensdir else cfg.tokens
        )
        self.token_dict = make_token_dict(
            tokens_path, cfg.criterion, cfg.replabel, cfg.eostoken
        )
        self.n_classes = len(self.token_dict)
        lex_path = cfg.lexicon
        self.lexicon = Lexicon.from_file(lex_path, cfg.maxword) if lex_path else None
        self.word_dict = make_word_dict(self.lexicon) if self.lexicon else None

        # --- features ---
        self.feat_params = FeatureParams.from_config(cfg)
        self.featurizer = Featurizer(self.feat_params)
        self.n_feat = cfg.num_features()
        self.specaug = None
        if cfg.saug_start_update >= 0:
            self.specaug = SpecAugment(
                n_freq_masks=cfg.saug_fmaskn,
                freq_mask_f=cfg.saug_fmaskf,
                n_time_masks=cfg.saug_tmaskn,
                time_mask_t=cfg.saug_tmaskt,
                time_mask_p=cfg.saug_tmaskp,
            )

        # --- model + criterion ---
        self.is_s2s = cfg.criterion in ("seq2seq", "transformer")
        # for attention criterions the network emits encoder states of
        # --encoderdim, not per-class logits (reference s2s recipes)
        out_dim = (
            cfg.encoderdim
            if self.is_s2s and cfg.encoderdim > 0
            else self.n_classes
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
        self.criterion = make_criterion(cfg, self.n_classes)

        # --- init params ---
        rng = jax.random.PRNGKey(cfg.seed)
        feat_dummy = jnp.zeros((2, 32, self.n_feat), jnp.float32)
        flen_dummy = jnp.full((2,), 32, jnp.int32)
        mvars = self.model.init(
            {"params": rng, "dropout": rng, "specaug": rng}, feat_dummy, flen_dummy
        )
        self.model_params = mvars["params"]
        self.model_state = {k: v for k, v in mvars.items() if k != "params"}
        em_dummy, el_dummy = self.model.apply(
            {"params": self.model_params, **self.model_state}, feat_dummy, flen_dummy
        )
        tgt_dummy = jnp.zeros((2, 8), jnp.int32)
        tl_dummy = jnp.full((2,), 8, jnp.int32)
        cvars = self.criterion.init(rng, em_dummy, tgt_dummy, el_dummy, tl_dummy)
        self.crit_params = cvars.get("params", {})

        if resume_ckpt is not None:
            from flax import serialization

            self.model_params = serialization.from_state_dict(
                self.model_params, resume_ckpt.model_params
            )
            if resume_ckpt.crit_params:
                self.crit_params = serialization.from_state_dict(
                    self.crit_params, resume_ckpt.crit_params
                )
            if resume_ckpt.model_state:
                self.model_state = serialization.from_state_dict(
                    self.model_state, resume_ckpt.model_state
                )

        # --- optimizers (net + crit; Train.cpp:569-581) ---
        self.net_sched = LRSchedule.from_config(cfg, cfg.lr)
        self.crit_sched = LRSchedule.from_config(cfg, cfg.lrcrit or cfg.lr)
        self.net_tx = make_optimizer(
            cfg.netoptim, cfg.lr, cfg.momentum, cfg.weightdecay,
            cfg.adambeta1, cfg.adambeta2, cfg.optimepsilon, cfg.optimrho,
        )
        self.crit_tx = make_optimizer(
            cfg.critoptim, cfg.lrcrit or cfg.lr, cfg.momentum, 0.0,
            cfg.adambeta1, cfg.adambeta2, cfg.optimepsilon, cfg.optimrho,
        )
        self.net_opt_state = self.net_tx.init(self.model_params)
        self.crit_opt_state = self.crit_tx.init(self.crit_params)
        if mode == "continue" and resume_ckpt is not None and resume_ckpt.opt_state:
            from flax import serialization

            self.net_opt_state = serialization.from_state_dict(
                self.net_opt_state, resume_ckpt.opt_state
            )
            if resume_ckpt.crit_opt_state:
                self.crit_opt_state = serialization.from_state_dict(
                    self.crit_opt_state, resume_ckpt.crit_opt_state
                )

        # --- mesh & placement ---
        self.mesh = make_mesh(MeshSpec.from_config(cfg))
        from ..parallel.mesh import set_current_mesh

        set_current_mesh(self.mesh)  # mesh-aware kernels (fused attention)
        from ..parallel.mesh import MODEL_AXIS
        from ..parallel.sharding import shard_params

        tp = self.mesh.shape[MODEL_AXIS] > 1
        # tensor-parallel: big 2-D params column-sharded over the model axis
        # (GSPMD inserts the activation collectives); small params replicate
        self.model_params = shard_params(self.mesh, self.model_params, tensor_parallel=tp)
        self.model_state = replicate(self.mesh, self.model_state)
        self.crit_params = replicate(self.mesh, self.crit_params)
        if tp:
            # optimizer slots must follow the param sharding; re-init from
            # the sharded params (TP + continue-mode optimizer state resume
            # would need resharding — currently unsupported together)
            self.net_opt_state = self.net_tx.init(self.model_params)
            self.crit_opt_state = self.crit_tx.init(self.crit_params)
        else:
            self.net_opt_state = replicate(self.mesh, self.net_opt_state)
            self.crit_opt_state = replicate(self.mesh, self.crit_opt_state)

        # --- datasets ---
        # Rank-sharded only when every data-mesh row is process-local; with
        # a host-spanning MODEL axis (pod-slice mesh, mp > per-host chips)
        # every process loads the full global batch and shard_batch places
        # per-device shards (see parallel/sharding.py).
        from ..parallel.sharding import data_rows_process_local

        self._local_data_rows = data_rows_process_local(self.mesh)
        w_rank = jax.process_index() if self._local_data_rows else 0
        w_size = jax.process_count() if self._local_data_rows else 1
        self.train_ds = AsrDataset(
            cfg.train, self.token_dict, self.lexicon, cfg,
            world_rank=w_rank, world_size=w_size,
        )
        self.valid_ds: Dict[str, AsrDataset] = {}
        vbs = cfg.validbatchsize if cfg.validbatchsize > 0 else cfg.batchsize
        for tag, path in cfg.valid_sets():
            self.valid_ds[tag] = AsrDataset(
                path, self.token_dict, self.lexicon, cfg, batch_size=vbs,
                world_rank=w_rank, world_size=w_size,
            )
        # --features_device=host: featurize in the prefetch threads
        # (reference W2lDataset placement) and ship bf16 features — ~4x
        # less device-bound traffic than f32 audio, and the device FFT
        # leaves the jitted step (measured 3.5x faster steps on the
        # tunneled v5e; see features.HostFeaturizer)
        self.host_features = cfg.features_device == "host"
        if self.host_features:
            from ..features import HostFeaturizer

            hf = HostFeaturizer(
                self.feat_params,
                out_dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                           else jnp.float32),
            )
            self.train_ds.set_host_featurizer(hf)
            for ds in self.valid_ds.values():
                ds.set_host_featurizer(hf)

        self.meters = TrainMeters(list(self.valid_ds.keys()))
        # AMP dynamic loss scale (mostly unnecessary with bf16; kept for
        # --fl_amp_use_mixed_precision parity)
        self.amp_scale = (
            cfg.fl_amp_scale_factor if cfg.fl_amp_use_mixed_precision else 1.0
        )
        self._amp_good = 0
        self._step_cache: Dict[Tuple, Any] = {}
        self.best_val: Dict[str, float] = {}
        self.compute_dtype = (
            jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        )

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------
    def _window_active(self) -> bool:
        """Attention-window gate for s2s criterions (host-side, per update):
        on during the --pretrainWindow pretrain phase, or always with
        --trainWithWindow (reference slimIPL/src/Train.cpp:1887-1903 runs a
        windowed pretrain block then clearWindow())."""
        cfg = self.cfg
        if not self.is_s2s or cfg.attnWindow in ("", "no"):
            return False
        return bool(cfg.trainWithWindow) or self.updates < cfg.pretrainWindow

    def _loss_fn(self, model_params, crit_params, model_state, batch, rng, saug_on, train,
                 specaug="default", window=False):
        saug_mod = self.specaug if specaug == "default" else specaug
        if "feats" in batch:  # host-featurized pipeline
            feats, flen = batch["feats"], batch["feat_len"]
            feats = feats.astype(jnp.float32)  # saug/jnp.where in f32
        else:
            feats, flen = self.featurizer(batch["audio"], batch["audio_len"])
        if saug_mod is not None and train:
            rng, k = jax.random.split(rng)
            feats = jnp.where(saug_on, saug_mod(feats, k, flen), feats)
        feats = feats.astype(self.compute_dtype)
        rngs = {"dropout": rng, "specaug": jax.random.fold_in(rng, 1)}

        # mutable collections (BatchNorm running stats etc.) update in train
        # mode; eval consumes them frozen (reference BatchNorm semantics)
        mutable = list(model_state) if (train and model_state) else False

        def fwd(model_params, feats):
            out = self.model.apply(
                {"params": model_params, **model_state},
                feats,
                flen,
                train=train,
                rngs=rngs if train else None,
                mutable=mutable,
            )
            if mutable:
                (em, elen), new_state = out
            else:
                em, elen = out
                new_state = model_state
            return em, elen, new_state

        if self.cfg.remat and train:
            fwd = jax.checkpoint(fwd)
        em, elen, new_state = fwd(model_params, feats)
        em = em.astype(jnp.float32)
        crit_kw = {}
        if self.is_s2s:
            crit_kw["window"] = window
        losses = self.criterion.apply(
            {"params": crit_params},
            em,
            batch["target"],
            elen,
            batch["target_len"],
            train=train,
            rngs={"dropout": jax.random.fold_in(rng, 2)} if train else None,
            **crit_kw,
        )
        rm = batch["row_mask"]
        loss = jnp.sum(losses * rm) / jnp.maximum(jnp.sum(rm), 1.0)
        return loss, (em, elen, new_state)

    def _make_train_step(self, specaug="default", window=False):
        cfg = self.cfg

        def step(model_params, crit_params, model_state, net_opt, crit_opt,
                 batch, rng, lr, lr_crit, saug_on, amp_scale):
            def scaled_loss(mp, cp):
                loss, aux = self._loss_fn(
                    mp, cp, model_state, batch, rng, saug_on, True,
                    specaug=specaug, window=window,
                )
                return loss * amp_scale, (loss, aux)

            (_, (loss, (em, elen, new_state))), grads = jax.value_and_grad(
                scaled_loss, argnums=(0, 1), has_aux=True
            )(model_params, crit_params)
            inv = 1.0 / amp_scale
            g_net, g_crit = jax.tree.map(lambda x: x * inv, grads)
            # global-norm clip across BOTH param groups (reference clipGradNorm
            # over network+criterion, Train.cpp:1341-1362)
            if cfg.maxgradnorm > 0:
                leaves = jax.tree.leaves(g_net) + jax.tree.leaves(g_crit)
                gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
                scale = jnp.minimum(1.0, cfg.maxgradnorm / (gn + 1e-12))
                g_net = jax.tree.map(lambda x: x * scale, g_net)
                g_crit = jax.tree.map(lambda x: x * scale, g_crit)
            # NaN/Inf guard: zero the whole update if loss or grads non-finite
            finite = jnp.isfinite(loss)
            for x in jax.tree.leaves(g_net) + jax.tree.leaves(g_crit):
                finite = finite & jnp.all(jnp.isfinite(x))
            g_net = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), g_net)
            g_crit = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), g_crit)

            net_opt.hyperparams["learning_rate"] = lr
            crit_opt.hyperparams["learning_rate"] = lr_crit
            upd, net_opt2 = self.net_tx.update(g_net, net_opt, model_params)
            model_params2 = optax.apply_updates(model_params, upd)
            updc, crit_opt2 = self.crit_tx.update(g_crit, crit_opt, crit_params)
            crit_params2 = optax.apply_updates(crit_params, updc)
            # reject state updates from non-finite steps (AMP retry keeps
            # the old running stats, mirroring the rejected param update)
            model_state2 = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_state, model_state
            )
            # viterbi for train meters
            vit, vit_len = self._viterbi(crit_params, em, elen)
            return (model_params2, crit_params2, model_state2, net_opt2,
                    crit_opt2, loss, finite, vit, vit_len)

        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P(DATA_AXIS))
        # param/opt shardings inferred from the input placement (replicated
        # or tensor-parallel); batch pinned to the data axis
        return jax.jit(
            step,
            in_shardings=(None, None, None, None, None,
                          {k: dat for k in self._batch_keys()},
                          rep, rep, rep, rep, rep),
            donate_argnums=(0, 1, 2, 3, 4),
        )

    def _viterbi(self, crit_params, em, elen):
        """Returns (path (B, L), path_len (B,))."""
        if self.is_s2s:
            toks, lens = self.criterion.apply(
                {"params": crit_params}, em, elen, method="greedy_path"
            )
            return toks, lens
        if self.cfg.criterion == "asg":
            from ..ops.asg import asg_viterbi

            return asg_viterbi(em, crit_params["transitions"], elen), elen
        from ..ops.ctc import ctc_viterbi

        return ctc_viterbi(em, elen), elen

    def _make_eval_step(self):
        def step(model_params, crit_params, model_state, batch):
            loss, (em, elen, _) = self._loss_fn(
                model_params, crit_params, model_state, batch,
                jax.random.PRNGKey(0), False, False,
            )
            vit, vit_len = self._viterbi(crit_params, em, elen)
            return loss, vit, vit_len

        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(self.mesh, P())
        dat = NamedSharding(self.mesh, P(DATA_AXIS))
        return jax.jit(
            step,
            in_shardings=(None, None, None,
                          {k: dat for k in self._batch_keys()}),
        )

    def _batch_keys(self):
        """Step-input batch fields for the active pipeline mode."""
        if getattr(self, "host_features", False):
            return ("feats", "feat_len", "audio_len", "target", "target_len",
                    "sample_idx", "row_mask")
        return ("audio", "audio_len", "target", "target_len", "sample_idx",
                "row_mask")

    def _prep(self, batch):
        from ..data.batching import pad_batch_rows

        # process-local rows: each process holds 1/process_count of the
        # global batch (dataset sharded by rank) and pads so the assembled
        # global batch divides the data mesh axis evenly. Host-spanning
        # MODEL axis: this process holds the FULL global batch — pad to the
        # whole data-axis extent.
        if getattr(self, "_local_data_rows", True):
            per_proc = max(1, self.mesh.shape[DATA_AXIS] // jax.process_count())
        else:
            per_proc = self.mesh.shape[DATA_AXIS]
        padded = pad_batch_rows(batch, per_proc)
        return padded, shard_batch(self.mesh, padded)

    def _fetch_local(self, x):
        """Fetch this process's rows of a batch-sharded step output (viterbi
        paths etc.) for the host-side meter updates."""
        from ..parallel import to_host_local

        return to_host_local(self.mesh, x)

    # ------------------------------------------------------------------
    # meters helpers
    # ------------------------------------------------------------------
    def _path_to_tokens(self, path_row, length) -> list:
        toks = [int(t) for t in path_row[:length]]
        if self.is_s2s:
            return toks  # already token sequence (greedy decode output)
        if self.cfg.criterion == "asg":
            base = self.n_classes - self.cfg.replabel
            return asg_collapse([toks], self.cfg.replabel, base)[0]
        blank = self.n_classes - 1
        return ctc_collapse([toks], blank)[0]

    def _update_edit_meters(self, ds_meters, vit, elen, batch):
        vit = self._fetch_local(vit)
        elen = self._fetch_local(elen)
        tgts = np.asarray(batch["target"])
        tlens = np.asarray(batch["target_len"])
        sidx = np.asarray(batch["sample_idx"])
        wsep = self.cfg.wordseparator
        for i in range(vit.shape[0]):
            if sidx[i] < 0:  # row padding
                continue
            hyp_toks = self._path_to_tokens(vit[i], int(elen[i]))
            ref_toks = [int(t) for t in tgts[i, : int(tlens[i])]]
            if self.cfg.criterion == "asg" and self.cfg.replabel > 0:
                from ..data.dictionary import unpack_replabels

                base = self.n_classes - self.cfg.replabel
                ref_toks = unpack_replabels(ref_toks, self.cfg.replabel, base)
            ds_meters.tkn_edit.add(ref_toks, hyp_toks)
            ref_w = tokens_to_words(
                self.token_dict.map_indices(ref_toks), wsep, self.cfg.usewordpiece
            )
            hyp_w = tokens_to_words(
                self.token_dict.map_indices(hyp_toks), wsep, self.cfg.usewordpiece
            )
            ds_meters.wrd_edit.add(ref_w, hyp_w)

    # ------------------------------------------------------------------
    # validation + checkpoint (runValAndSaveModel, Train.cpp:1039-1081)
    # ------------------------------------------------------------------
    def validate(self) -> Dict[str, float]:
        eval_step = self._eval_step
        wers = {}
        for tag, ds in self.valid_ds.items():
            m = self.meters.valid[tag]
            m.reset()
            it = PrefetchIterator(ds, ds.batch_specs(), num_threads=self.cfg.nthread)
            for batch in it:
                batch, sb = self._prep(batch)
                loss, vit, elen = eval_step(
                    self.model_params, self.crit_params, self.model_state, sb
                )
                m.loss.add(float(loss), int(batch["row_mask"].sum()))
                self._update_edit_meters(m, vit, elen, batch)
            wers[tag] = m.wrd_edit.error_rate()
        return wers

    def _ckpt_extra(self) -> Dict[str, Any]:
        """Subclass hook: extra state persisted in the checkpoint."""
        return {}

    def save(self, tag: Optional[str] = None):
        if not self.rundir:
            return
        # gather is COLLECTIVE when TP shards span hosts (pod-slice mesh):
        # every rank participates, then only the master writes
        from .checkpoint import gather_tree

        gathered = {
            "model_params": gather_tree(self.model_params),
            "model_state": gather_tree(self.model_state),
            "crit_params": gather_tree(self.crit_params),
            "opt_state": gather_tree(self.net_opt_state),
            "crit_opt_state": gather_tree(self.crit_opt_state),
        }
        if jax.process_index() != 0:
            return
        ckpt = Checkpoint(
            config=self.cfg.serialize(),
            epoch=self.epoch,
            updates=self.updates,
            model_params=gathered["model_params"],
            model_state=gathered["model_state"],
            crit_params=gathered["crit_params"],
            opt_state=gathered["opt_state"],
            crit_opt_state=gathered["crit_opt_state"],
            extra=self._ckpt_extra(),
        )
        save_checkpoint(os.path.join(self.rundir, "model_last.bin"), ckpt)
        if tag:
            save_checkpoint(os.path.join(self.rundir, f"model_{tag}.bin"), ckpt)

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------
    def _get_train_step(self):
        """Step compiled per (window) variant — at most two compilations;
        the pretrain->main window transition happens once."""
        w = self._window_active()
        if w not in self._train_steps:
            self._train_steps[w] = self._make_train_step(window=w)
        return self._train_steps[w]

    def run(self):
        cfg = self.cfg
        self._train_steps: Dict[bool, Any] = {}
        self._train_step = self._get_train_step()
        self._eval_step = self._make_eval_step()
        log_path = os.path.join(self.rundir, f"{self.run_idx:03d}_log") if self.rundir else None
        cfg_path = os.path.join(self.rundir, f"{self.run_idx:03d}_config") if self.rundir else None
        if cfg_path and jax.process_index() == 0:
            with open(cfg_path, "w") as f:
                f.write(cfg.serialize())

        # Per-step RNG is a pure function of the GLOBAL update index (not a
        # sequential split stream): `continue` resume replays the exact
        # dropout/SpecAugment draws the uninterrupted run would have used
        # (SURVEY hard part (f) — input determinism for resume parity).
        base_rng = jax.random.PRNGKey(cfg.seed + 7)
        stride_ms = cfg.framestridems
        report = cfg.reportiters
        self.meters.runtime.start()
        skipped = 0
        self._pending = []

        # Exact-replay resume: every batch consumes exactly one update and
        # epochs have a fixed deterministic batch count, so the interrupted
        # epoch and the position within it are pure functions of `updates`.
        # Re-derive both and skip the already-consumed prefix of the
        # per-epoch shuffle — the resumed run then sees the identical
        # remaining data stream (the reference resumes at epoch granularity
        # only, cpc/Train.cpp:249-327; we restore mid-epoch position).
        steps_per_epoch = len(self.train_ds.batch_specs(shuffle_seed=cfg.seed + 1))
        mid_skip = 0
        if self.updates and steps_per_epoch:
            self.epoch = self.updates // steps_per_epoch  # loop +1s below
            mid_skip = self.updates % steps_per_epoch

        while self.updates < cfg.iter:
            self.epoch += 1
            specs = self.train_ds.batch_specs(shuffle_seed=cfg.seed + self.epoch)
            if mid_skip:
                specs = specs[mid_skip:]
                mid_skip = 0
            it = PrefetchIterator(self.train_ds, specs, num_threads=cfg.nthread)
            for batch in it:
                if self.updates >= cfg.iter:
                    break
                self.meters.timer.start()
                lr = self.net_sched(self.updates, self.epoch)
                lr_crit = self.crit_sched(self.updates, self.epoch)
                k = jax.random.fold_in(base_rng, self.updates)
                saug_on = jnp.asarray(
                    cfg.saug_start_update >= 0
                    and self.updates >= cfg.saug_start_update
                )
                batch, sb = self._prep(batch)
                self._train_step = self._get_train_step()
                while True:
                    (self.model_params, self.crit_params, self.model_state,
                     self.net_opt_state,
                     self.crit_opt_state, loss, finite, vit, elen) = self._train_step(
                        self.model_params, self.crit_params, self.model_state,
                        self.net_opt_state, self.crit_opt_state, sb, k,
                        jnp.asarray(lr, jnp.float32), jnp.asarray(lr_crit, jnp.float32),
                        saug_on, jnp.asarray(self.amp_scale, jnp.float32),
                    )
                    if not cfg.fl_amp_use_mixed_precision:
                        break
                    # AMP overflow: halve the scale and RETRY THE SAME BATCH
                    # (reference Train.cpp:1216-1237 — the failed attempt is
                    # free since the non-finite update was zeroed on device
                    # and does not advance the update counter). Bail to a
                    # skip only at the scale floor (reference throws below
                    # kAmpMinimumScaleFactorValue; we floor at 1.0 for bf16).
                    if bool(finite):
                        self.meters.train.loss.add(float(loss), batch["audio_len"].shape[0])
                        self._amp_good += 1
                        if self._amp_good % cfg.fl_amp_scale_factor_update_interval == 0:
                            self.amp_scale = min(
                                self.amp_scale * 2.0, cfg.fl_amp_max_scale_factor
                            )
                        break
                    self._amp_good = 0
                    if self.amp_scale <= 1.0:
                        skipped += 1  # non-finite even unscaled: bad batch
                        break
                    self.amp_scale = max(1.0, self.amp_scale / 2.0)
                self.updates += 1
                if not cfg.fl_amp_use_mixed_precision:
                    # async pipelining: keep loss/finite as device values and
                    # fetch at report boundaries so the host never stalls the
                    # device between steps
                    self._pending.append((loss, finite, batch["audio_len"].shape[0]))
                audio_s = float(np.sum(batch["audio_len"])) / cfg.samplerate
                self.meters.speed.add_audio(audio_s)
                if np.random.rand() * 100.0 < cfg.pcttraineval:
                    self._update_edit_meters(self.meters.train, vit, elen, batch)
                self.meters.timer.stop()

                if report > 0 and self.updates % report == 0:
                    self._report_and_save()
            if report <= 0:
                self._report_and_save()
        self._flush_pending()
        self.save()
        skipped += getattr(self, "_skipped", 0)
        _log(f"training done: {self.updates} updates, {skipped} skipped batches")

    def _flush_pending(self):
        for loss, finite, n in getattr(self, "_pending", []):
            if bool(finite):
                self.meters.train.loss.add(float(loss), n)
            else:
                self._skipped = getattr(self, "_skipped", 0) + 1
        self._pending = []

    def _report_and_save(self):
        self._flush_pending()
        wers = self.validate()
        sync_meters(self.meters)
        line = get_log_string(
            self.meters,
            self.epoch,
            self.updates,
            self.net_sched(self.updates, self.epoch),
            self.crit_sched(self.updates, self.epoch),
        )
        _log(line)
        if self.rundir and jax.process_index() == 0:
            with open(os.path.join(self.rundir, f"{self.run_idx:03d}_log"), "a") as f:
                f.write(line + "\n")
        self.save(tag=f"iter_{self.epoch:03d}")
        for tag, wer in wers.items():
            if wer <= self.best_val.get(tag, float("inf")):
                self.best_val[tag] = wer
                self.save(tag=tag)
        self.meters.reset_train()
