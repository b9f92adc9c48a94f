"""slimIPL loop test: supervised warmup on tones, then PL phase on
'unlabeled' copies; cache fills, persists, and training stays finite."""

import json
import os

import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config


def test_slimipl_loop(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=24, seed=31)
    # unlabeled copy: same audio, empty transcripts
    unsup = tmp_path / "unsup.lst"
    with open(lst) as f, open(unsup, "w") as g:
        for line in f:
            parts = line.split(None, 3)
            g.write(f"u_{parts[0]} {parts[1]} {parts[2]}\n")
    arch = tmp_path / "tiny.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(
            train=lst, train2=str(unsup), tokens=tokens, lexicon=lexicon,
            rundir=str(tmp_path), runname="ipl",
            batchsize=8, mfsc=True, filterbanks=40, criterion="ctc",
            lr=0.3, netoptim="sgd", maxgradnorm=1.0, iter=80,
            nthread=1, pad_multiple=64, compute_dtype="float32",
            arch=str(arch), onorm="target", mintsz=0,
        )
    )
    from wav2letter_tpu.runtime.train_slimipl import SlimIPLTrainer

    tr = SlimIPLTrainer(
        cfg,
        ipl_flags=dict(slimIPL_start=50, slimIPL_sup_updates=1,
                       slimIPL_unsup_updates=1,
                       slimIPL_fixed_cache_update_prob=0.5),
        unsup_list=str(unsup),
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
        cfg, ipl_flags=dict(slimIPL_start=50), unsup_list=str(unsup)
    )
    assert len(tr2.cache) == len(tr.cache)
