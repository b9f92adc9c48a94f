"""CPC / wav2vec2-style joint training executor.

Reference: ``recipes/joint_training_vox_populi/cpc/Train.cpp`` (1494 LoC) —
alternating unsupervised (CPC InfoNCE) and supervised (CTC) update blocks
over a 3-part network (encoder, context, predict; ``--arch=enc,ctx,prd``)
with: ``--supdelay`` (updates before supervision starts), ``--unsupdates``/
``--supdates`` alternation counts, ``--twostage`` (freeze encoder during
supervised phase), ``--trainencoder/--traincontext/--freeze`` gating,
``--grad_mult_feat`` encoder-gradient scaling (``Train.cpp:1267-1291``),
``--l2_enc_pen`` encoder L2 penalty, separate optimizers/LRs
(``--lr/--lr2/--lrcrit/--lrcrit2``), dual meters.

TPU design: both phases are single jitted steps over the mesh; the phase
schedule runs on host. Parameter groups (encoder/context/predict/criterion)
are separate pytrees so gating and per-group scaling are tree operations,
not runtime branches.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..criterions.cpc import CPCConfig, CPCCriterion
from ..data import AsrDataset, Lexicon, PrefetchIterator, make_token_dict
from ..features import FeatureParams, Featurizer
from ..models.arch import build_arch_module
from ..ops.ctc import ctc_loss
from ..optim import LRSchedule, make_optimizer
from ..parallel import make_mesh, replicate, shard_batch
from ..parallel.mesh import DATA_AXIS, MeshSpec

# CPC-specific flags (reference DEFINEs, cpc/Train.cpp:45-203) are carried
# in a side dict because they are recipe-specific, not core flags.
CPC_DEFAULTS = dict(
    codedim=256,
    contextdim=256,
    mutualdim=256,
    maskprob=0.065,
    masklength=10,
    temperature=0.1,
    nnegativesamples=100,
    supdelay=0,
    supdates=1,
    unsupdates=1,
    twostage=False,
    trainencoder=True,
    traincontext=True,
    freeze=False,
    grad_mult_feat=1.0,
    l2_enc_pen=0.0,
    lr2=0.0,
    # supervised-phase LR ramp (reference uses these unconditionally for the
    # supervised branch, Train.cpp:908-916: hold=FLAGS_suphold,
    # warmup=FLAGS_supwarmup when !pretrain)
    supwarmup=0,
    suphold=0,
    # supervised criterion selection + its grad clip (Train.cpp:81-85,
    # :410): reference default "ctc"; ASG/S2S supervised heads are not used
    # by any vox_populi recipe — validated at startup.
    criterion2="ctc",
    lrcrit2=0.0,
    maxgradnorm2=0.0,
    # start from pretrained weights (Train.cpp:495-503 PartialLoading)
    pretrainmodel="",
)


class CPCTrainer:
    def __init__(self, cfg: Config, cpc_flags: Optional[Dict] = None,
                 mode: str = "train"):
        self.cfg = cfg
        self.fl = dict(CPC_DEFAULTS)
        if cpc_flags:
            self.fl.update(cpc_flags)
        if str(self.fl.get("criterion2", "ctc")) != "ctc":
            raise ValueError(
                "--criterion2: only 'ctc' is supported (the reference default;"
                " no vox_populi recipe uses another supervised criterion)")
        self.updates = 0
        self.mode = mode
        # --- run dir & continue resolution (Train.cpp:241-327) ---
        self.rundir = (
            os.path.join(cfg.rundir, cfg.runname) if cfg.runname else cfg.rundir
        )
        self._resume = None
        if mode == "continue" and self.rundir:
            from .checkpoint import find_last_checkpoint, load_checkpoint

            last = find_last_checkpoint(self.rundir)
            if not last:
                # same fail-loud contract as Trainer: a `continue` with no
                # checkpoint must not silently train from scratch
                raise FileNotFoundError(
                    f"continue: no checkpoint (model_last.bin) under "
                    f"{self.rundir!r}")
            self._resume = load_checkpoint(last)
            self.updates = self._resume.updates
        if self.rundir and jax.process_index() == 0:
            os.makedirs(self.rundir, exist_ok=True)

        tokens_path = (
            os.path.join(cfg.tokensdir, cfg.tokens) if cfg.tokensdir else cfg.tokens
        )
        self.token_dict = make_token_dict(tokens_path, "ctc", 0, False)
        self.n_classes = len(self.token_dict)
        self.lexicon = Lexicon.from_file(cfg.lexicon) if cfg.lexicon else None

        self.feat_params = FeatureParams.from_config(cfg)
        self.featurizer = Featurizer(self.feat_params)
        self.n_feat = cfg.num_features()

        # --- 3-part network: encoder, context, predict ---
        archs = [a.strip() for a in cfg.arch.split(",")]
        if len(archs) != 3:
            raise ValueError("CPC training needs --arch=encoder,context,predict")
        archdir = cfg.archdir
        paths = [os.path.join(archdir, a) if archdir else a for a in archs]
        code = int(self.fl["codedim"])
        ctxd = int(self.fl["contextdim"])
        self.encoder = build_arch_module(paths[0], self.n_feat, code)
        self.context = build_arch_module(paths[1], code, ctxd)
        self.predict = build_arch_module(paths[2], ctxd, self.n_classes)
        self.cpc = CPCCriterion(
            CPCConfig(
                n_encoder=code,
                n_context=ctxd,
                n_mutual=int(self.fl["mutualdim"]),
                n_negative=int(self.fl["nnegativesamples"]),
                temperature=float(self.fl["temperature"]),
                mask_prob=float(self.fl["maskprob"]),
                mask_length=int(self.fl["masklength"]),
            )
        )

        rng = jax.random.PRNGKey(cfg.seed)
        fdummy = jnp.zeros((2, 64, self.n_feat))
        fl_d = jnp.full((2,), 64, jnp.int32)
        self.p_enc = self.encoder.init({"params": rng}, fdummy, fl_d)["params"]
        enc_o, enc_l = self.encoder.apply({"params": self.p_enc}, fdummy, fl_d)
        self.p_ctx = self.context.init({"params": rng}, enc_o, enc_l)["params"]
        ctx_o, ctx_l = self.context.apply({"params": self.p_ctx}, enc_o, enc_l)
        self.p_prd = self.predict.init({"params": rng}, ctx_o, ctx_l)["params"]
        K = min(enc_o.shape[1], max(1, int(self.fl["maskprob"] * enc_o.shape[1])) * int(self.fl["masklength"]))
        self.p_cpc = self.cpc.init(
            rng, enc_o, ctx_o, jnp.zeros((2, K), jnp.int32), rng
        )["params"]

        # --- optimizers: unsup (lr) and sup (lr2 or lr) ---
        # the supervised branch ALWAYS ramps with --supwarmup/--suphold
        # (Train.cpp:908-916), independent of the unsup --warmup/--hold
        import dataclasses as _dc

        lr2 = float(self.fl["lr2"]) or cfg.lr
        self.sched_unsup = LRSchedule.from_config(cfg, cfg.lr)
        self.sched_sup = _dc.replace(
            LRSchedule.from_config(cfg, lr2),
            warmup=int(self.fl["supwarmup"]),
            hold=int(self.fl["suphold"]),
        )
        self.tx = make_optimizer(
            cfg.netoptim, cfg.lr, cfg.momentum, cfg.weightdecay,
            cfg.adambeta1, cfg.adambeta2, cfg.optimepsilon,
        )
        self.params = {
            "enc": self.p_enc,
            "ctx": self.p_ctx,
            "prd": self.p_prd,
            "cpc": self.p_cpc,
        }
        self.opt_state = self.tx.init(self.params)

        # --- pretrained / resumed weights ---
        if str(self.fl["pretrainmodel"]):
            # partial-load matching subtrees (Train.cpp:495-503); a plain
            # ASR checkpoint seeds the encoder+context via model_params
            from flax import serialization as _ser

            from .checkpoint import load_checkpoint as _lc

            ck = _lc(str(self.fl["pretrainmodel"]))
            src = ck.model_params or {}
            if set(src) >= {"enc", "ctx"}:
                for k in self.params:
                    if k in src:
                        self.params[k] = _ser.from_state_dict(self.params[k], src[k])
            else:
                self.params["enc"] = _ser.from_state_dict(self.params["enc"], src)
        if self._resume is not None:
            from flax import serialization as _ser

            self.params = _ser.from_state_dict(self.params, self._resume.model_params)
            if self._resume.opt_state:
                self.opt_state = _ser.from_state_dict(
                    self.opt_state, self._resume.opt_state
                )

        self.mesh = make_mesh(MeshSpec.from_config(cfg))
        self.params = replicate(self.mesh, self.params)
        self.opt_state = replicate(self.mesh, self.opt_state)

        self.sup_ds = (
            AsrDataset(cfg.train, self.token_dict, self.lexicon, cfg,
                       world_rank=jax.process_index(), world_size=jax.process_count())
            if cfg.train
            else None
        )
        self.unsup_ds = (
            AsrDataset(cfg.train2, self.token_dict, self.lexicon, cfg,
                       allow_empty_targets=True,
                       world_rank=jax.process_index(), world_size=jax.process_count())
            if cfg.train2
            else None
        )
        self._unsup_step = self._make_unsup_step()
        self._sup_step = self._make_sup_step()

    # ------------------------------------------------------------------
    def _grad_gates(self, phase: str):
        """Per-group gradient multipliers implementing trainencoder/
        traincontext/freeze/twostage/grad_mult_feat."""
        g = {"enc": float(self.fl["grad_mult_feat"]), "ctx": 1.0, "prd": 1.0, "cpc": 1.0}
        if not self.fl["trainencoder"]:
            g["enc"] = 0.0
        if not self.fl["traincontext"]:
            g["ctx"] = 0.0
        if phase == "sup" and (self.fl["twostage"] or self.fl["freeze"]):
            g["enc"] = 0.0
            if self.fl["freeze"]:
                g["ctx"] = 0.0
        return g

    def _forward_encoder(self, params, batch, train, rng):
        feats, flen = self.featurizer(batch["audio"], batch["audio_len"])
        enc, elen = self.encoder.apply(
            {"params": params["enc"]}, feats, flen, train=train,
            rngs={"dropout": rng} if train else None,
        )
        return enc, elen

    def _make_unsup_step(self):
        l2pen = float(self.fl["l2_enc_pen"])

        def step(params, opt_state, batch, rng, lr, gates):
            def loss_fn(p):
                r1, r2, r3 = jax.random.split(rng, 3)
                enc, elen = self._forward_encoder(p, batch, True, r1)
                B, T, _ = enc.shape
                mask, mask_idx = self.cpc.apply(
                    {"params": p["cpc"]}, r2, B, T, method="make_mask"
                )
                enc_masked = self.cpc.apply(
                    {"params": p["cpc"]}, enc, mask, method="apply_mask"
                )
                ctx, _ = self.context.apply(
                    {"params": p["ctx"]}, enc_masked, elen, train=True,
                    rngs={"dropout": r3},
                )
                losses = self.cpc.apply(
                    {"params": p["cpc"]}, enc, ctx, mask_idx, r2
                )
                rm = batch["row_mask"]
                loss = jnp.sum(losses * rm) / jnp.maximum(rm.sum(), 1.0)
                if l2pen > 0:
                    loss = loss + l2pen * jnp.mean(enc.astype(jnp.float32) ** 2)
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = {k: jax.tree.map(lambda x: x * gates[k], v) for k, v in grads.items()}
            finite = jnp.isfinite(loss)
            grads = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), grads)
            opt_state.hyperparams["learning_rate"] = lr
            upd, opt_state2 = self.tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, upd)
            return params2, opt_state2, loss, finite

        return jax.jit(step, donate_argnums=(0, 1))

    def _make_sup_step(self):
        def step(params, opt_state, batch, rng, lr, gates):
            def loss_fn(p):
                r1, r2 = jax.random.split(rng)
                enc, elen = self._forward_encoder(p, batch, True, r1)
                ctx, clen = self.context.apply(
                    {"params": p["ctx"]}, enc, elen, train=True,
                    rngs={"dropout": r2},
                )
                em, emlen = self.predict.apply({"params": p["prd"]}, ctx, clen)
                losses = ctc_loss(
                    em.astype(jnp.float32), batch["target"], emlen, batch["target_len"]
                )
                rm = batch["row_mask"]
                return jnp.sum(losses * rm) / jnp.maximum(rm.sum(), 1.0)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            grads = {k: jax.tree.map(lambda x: x * gates[k], v) for k, v in grads.items()}
            # supervised phase clips with --maxgradnorm2 when set
            # (Train.cpp:84-85, :1341-1351), else --maxgradnorm
            mgn = float(self.fl.get("maxgradnorm2", 0.0)) or self.cfg.maxgradnorm
            if mgn > 0:
                leaves = jax.tree.leaves(grads)
                gn = jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2) for x in leaves))
                sc = jnp.minimum(1.0, mgn / (gn + 1e-12))
                grads = jax.tree.map(lambda x: x * sc, grads)
            finite = jnp.isfinite(loss)
            grads = jax.tree.map(lambda x: jnp.where(finite, x, 0.0), grads)
            opt_state.hyperparams["learning_rate"] = lr
            upd, opt_state2 = self.tx.update(grads, opt_state, params)
            params2 = optax.apply_updates(params, upd)
            return params2, opt_state2, loss, finite

        return jax.jit(step, donate_argnums=(0, 1))

    # ------------------------------------------------------------------
    def run(self):
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed + 13)
        sup_it = iter([]) if self.sup_ds is None else None
        unsup_it = iter([]) if self.unsup_ds is None else None
        losses = {"sup": [], "unsup": []}

        def batches(ds):
            while True:
                for b in PrefetchIterator(ds, ds.batch_specs(shuffle_seed=cfg.seed),
                                          num_threads=cfg.nthread):
                    yield b

        sup_gen = batches(self.sup_ds) if self.sup_ds else None
        unsup_gen = batches(self.unsup_ds) if self.unsup_ds else None

        from ..data.batching import pad_batch_rows

        while self.updates < cfg.iter:
            in_sup_phase = (
                sup_gen is not None
                and self.updates >= int(self.fl["supdelay"])
                and (self.updates % (int(self.fl["supdates"]) + int(self.fl["unsupdates"])))
                >= int(self.fl["unsupdates"])
            ) or unsup_gen is None
            gen = sup_gen if in_sup_phase else unsup_gen
            batch = next(gen)
            batch = pad_batch_rows(batch, self.mesh.shape[DATA_AXIS])
            sb = shard_batch(self.mesh, batch)
            rng, k = jax.random.split(rng)
            gates = self._grad_gates("sup" if in_sup_phase else "unsup")
            if in_sup_phase:
                lr = self.sched_sup(self.updates)
                self.params, self.opt_state, loss, finite = self._sup_step(
                    self.params, self.opt_state, sb, k, jnp.asarray(lr, jnp.float32), gates
                )
                losses["sup"].append(float(loss))
            else:
                lr = self.sched_unsup(self.updates)
                self.params, self.opt_state, loss, finite = self._unsup_step(
                    self.params, self.opt_state, sb, k, jnp.asarray(lr, jnp.float32), gates
                )
                losses["unsup"].append(float(loss))
            self.updates += 1
            if cfg.reportiters > 0 and self.updates % cfg.reportiters == 0:
                self._report(losses, lr)
                losses = {"sup": [], "unsup": []}
                self.save_checkpoint()
        self.save_checkpoint()
        return losses

    def _report(self, losses, lr):
        if jax.process_index() != 0:
            return
        import numpy as _np

        parts = [f"nupdates: {self.updates:>12d}", f"lr: {lr:09.6f}"]
        for ph in ("unsup", "sup"):
            if losses[ph]:
                parts.append(f"loss-{ph}: {_np.mean(losses[ph]):10.5f}")
        line = " | ".join(parts)
        print(line, flush=True)
        if self.rundir:
            with open(os.path.join(self.rundir, "001_log"), "a") as f:
                f.write(line + "\n")

    def save_checkpoint(self):
        """model_last.bin in the shared self-describing format (Train.cpp
        runValAndSaveModel; CPC groups live in model_params)."""
        if not self.rundir or jax.process_index() != 0:
            return
        from .checkpoint import Checkpoint, save_checkpoint

        ckpt = Checkpoint(
            config=self.cfg.serialize(),
            epoch=0,
            updates=self.updates,
            model_params=self.params,
            model_state={},
            crit_params={},
            opt_state=self.opt_state,
            crit_opt_state={},
            extra={"cpc_flags": {k: v for k, v in self.fl.items()}},
        )
        save_checkpoint(os.path.join(self.rundir, "model_last.bin"), ckpt)
