"""slimIPL loop tests: supervised warmup on tones, then PL phase on
'unlabeled' copies; all four --slimIPL_type cache variants, soft labels,
EMA, dynamic dropout and strong sup-SpecAugment (slimIPL/src/Train.cpp)."""

import json
import os

import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config


def _mk_cfg(tmp_path, n_utts=24, iters=80, runname="ipl", **over):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=n_utts, seed=31)
    unsup = tmp_path / "unsup.lst"
    with open(lst) as f, open(unsup, "w") as g:
        for line in f:
            parts = line.split(None, 3)
            g.write(f"u_{parts[0]} {parts[1]} {parts[2]}\n")
    arch = tmp_path / "tiny.arch"
    arch.write_text(
        "V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nDO 0.1\nRO 2 0 3 1\nL 32 NLABEL\n"
    )
    cfg = Config()
    d = dict(
        train=lst, train2=str(unsup), tokens=tokens, lexicon=lexicon,
        rundir=str(tmp_path), runname=runname,
        batchsize=8, mfsc=True, filterbanks=40, criterion="ctc",
        lr=0.3, netoptim="sgd", maxgradnorm=1.0, iter=iters,
        nthread=1, pad_multiple=64, compute_dtype="float32",
        arch=str(arch), onorm="target", mintsz=0,
    )
    d.update(over)
    cfg.update(d)
    return cfg, str(unsup)


def test_slimipl_loop(tmp_path):
    cfg, unsup = _mk_cfg(tmp_path)
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    tr = SlimIPLTrainer(
        cfg,
        ipl_flags=dict(slimIPL_start=50, slimIPL_sup_updates=1,
                       slimIPL_unsup_updates=1, slimIPL_type="cache",
                       slimIPL_fixed_cache_update_prob=0.5),
        unsup_list=unsup,
    )
    stats = tr.run()
    assert tr.updates == 80
    assert stats["unsup"] > 0, "never entered PL phase"
    assert len(tr.cache) > 0, "PL cache empty"
    # cache persisted
    cache_file = os.path.join(tr.rundir, "pl_cache.json")
    assert os.path.exists(cache_file)
    data = json.load(open(cache_file))
    assert len(data) == len(tr.cache)
    # restored on a fresh trainer
    tr2 = SlimIPLTrainer(
        cfg, ipl_flags=dict(slimIPL_start=50), unsup_list=unsup
    )
    assert len(tr2.cache) == len(tr.cache)


@pytest.mark.parametrize("typ", ["naive", "pre-cache"])
def test_slimipl_types(tmp_path, typ):
    cfg, unsup = _mk_cfg(tmp_path, n_utts=16, iters=16, runname=f"ipl_{typ}")
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    tr = SlimIPLTrainer(
        cfg,
        ipl_flags=dict(slimIPL_start=6, slimIPL_sup_updates=1,
                       slimIPL_unsup_updates=2, slimIPL_type=typ),
        unsup_list=unsup,
    )
    stats = tr.run()
    assert tr.updates == 16
    # first pre-cache unsup batch has nothing cached -> skipped+labeled
    assert stats["unsup"] + stats["skipped_unsup"] > 0
    assert stats["unsup"] > 0
    assert len(tr.cache) > 0


def test_slimipl_fixed_pre_cache_ema(tmp_path):
    cfg, unsup = _mk_cfg(tmp_path, n_utts=16, iters=24, runname="ipl_fixed")
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    tr = SlimIPLTrainer(
        cfg,
        ipl_flags=dict(slimIPL_start=4, slimIPL_sup_updates=1,
                       slimIPL_unsup_updates=2,
                       slimIPL_type="fixed-pre-cache",
                       slimIPL_fixed_cache_updates=2,
                       slimIPL_fixed_cache_update_prob=0.5,
                       slimIPL_ema=True, slimIPL_ema_decay=0.5),
        unsup_list=unsup,
    )
    p0 = np.asarray(
        next(iter(__import__("jax").tree.leaves(tr.ema_params)))
    ).copy()
    stats = tr.run()
    assert stats["warmed"] >= 2, "fixed cache never warmed"
    assert stats["unsup"] > 0, "fixed cache never served"
    assert len(tr.fixed_cache) == 2
    # EMA actually tracked the live params
    p1 = np.asarray(next(iter(__import__("jax").tree.leaves(tr.ema_params))))
    assert not np.allclose(p0, p1)
    # EMA + fixed cache persisted for continue
    from wav2letter_tpu.runtime.checkpoint import load_checkpoint

    ck = load_checkpoint(os.path.join(tr.rundir, "model_last.bin"))
    assert "ema_params" in ck.extra
    assert os.path.exists(os.path.join(tr.rundir, "pl_cache_fixed.json"))


def test_slimipl_soft_labels(tmp_path):
    cfg, unsup = _mk_cfg(tmp_path, n_utts=16, iters=20, runname="ipl_soft")
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    tr = SlimIPLTrainer(
        cfg,
        ipl_flags=dict(slimIPL_start=4, slimIPL_sup_updates=1,
                       slimIPL_unsup_updates=2,
                       slimIPL_type="fixed-pre-cache",
                       slimIPL_fixed_cache_updates=2,
                       slimIPL_use_soft=True, slimIPL_soft_scale=5.0),
        unsup_list=unsup,
    )
    stats = tr.run()
    assert stats["unsup"] > 0, "soft path never trained"
    assert len(tr.soft_cache) > 0
    # soft cache holds f16 emissions of shape (elen, n_classes)
    em = next(iter(tr.soft_cache.values()))
    assert em.dtype == np.float16 and em.shape[1] == tr.n_classes
    assert os.path.exists(os.path.join(tr.rundir, "pl_cache_soft.npz"))


def test_slimipl_dyn_dropout_and_strong_saug(tmp_path):
    cfg, unsup = _mk_cfg(
        tmp_path, n_utts=16, iters=12, runname="ipl_dyn",
        saug_start_update=0, saug_fmaskn=1, saug_tmaskn=1,
    )
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    tr = SlimIPLTrainer(
        cfg,
        ipl_flags=dict(slimIPL_start=4, slimIPL_sup_updates=1,
                       slimIPL_unsup_updates=1, slimIPL_type="naive",
                       slimIPL_dyn_dropout=0.0, slimIPL_saug=True),
        unsup_list=unsup,
    )
    # stronger sup SpecAugment configured (fmaskn+1, tmaskn*1.5)
    assert tr.specaug_strong is not None
    assert tr.specaug_strong.n_freq_masks == cfg.saug_fmaskn + 1
    stats = tr.run()
    assert tr.updates == 12 and stats["unsup"] > 0
    # dropout was rewritten to 0.0 at PL start
    do_lines = [s.line for s in tr.model.specs if s.kind == "DO"]
    assert do_lines and all("0.0" in l for l in do_lines)
