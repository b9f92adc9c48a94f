"""LPM trainer smoke test: paired+unpaired s2s training with a proposal
model and LM-prior weighting runs and counts both phases."""

import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config


def test_lpm_loop(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=16, seed=41)
    unsup = tmp_path / "unpaired.lst"
    with open(lst) as f, open(unsup, "w") as g:
        for line in f:
            p = line.split(None, 3)
            g.write(f"u_{p[0]} {p[1]} {p[2]}\n")
    arch = tmp_path / "enc.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(
            train=lst, train2=str(unsup), tokens=tokens, lexicon=lexicon,
            rundir=str(tmp_path), runname="lpm",
            batchsize=4, mfsc=True, filterbanks=40,
            criterion="seq2seq", encoderdim=32, maxdecoderoutputlen=12,
            lr=0.05, netoptim="adam", lrcrit=0.05, critoptim="adam",
            maxgradnorm=5.0, iter=12, nthread=1,
            pad_multiple=64, compute_dtype="float32", arch=str(arch),
            mintsz=0,
        )
    )
    from wav2letter_tpu.runtime.train_lpm import LPMTrainer

    tr = LPMTrainer(
        cfg,
        lpm_flags=dict(lpmBeamsz=2, propupdate=6, pairediter=1, audioiter=1),
        unpaired_list=str(unsup),
    )
    stats = tr.run()
    assert tr.updates == 12
    assert stats["paired"] > 0
    assert stats["unpaired"] + stats["skipped"] > 0
