"""Tensor-parallel training on the virtual mesh: --mp_axis=2 shards big
linears over the model axis; training must still converge like DP-only."""

import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config


def test_tp_training(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=16, seed=71)
    arch = tmp_path / "a.arch"
    # big linear (1024x2048 > 2^20 elements) to trigger the TP heuristic
    arch.write_text(
        "V -1 1 NFEAT 0\nC NFEAT 1024 8 4 4\nRO 2 0 3 1\nL 1024 2048\nR\nL 2048 NLABEL\n"
    )
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="tp", batchsize=8, mfsc=True, filterbanks=40,
             criterion="ctc", lr=0.2, netoptim="sgd", maxgradnorm=1.0,
             iter=12, nthread=1, pad_multiple=64, arch=str(arch),
             compute_dtype="float32", onorm="target", mp_axis=2)
    )
    from wav2letter_tpu.runtime.train import Trainer
    from wav2letter_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    tr = Trainer(cfg)
    assert tr.mesh.shape[MODEL_AXIS] == 2
    assert tr.mesh.shape[DATA_AXIS] == 4
    # the big linear should actually be sharded over the model axis
    from jax.sharding import PartitionSpec as P

    leaves = []

    def walk(t, p=()):
        if isinstance(t, dict):
            for k, v in t.items():
                walk(v, p + (k,))
        else:
            leaves.append((p, t))

    walk(tr.model_params)
    sharded = [
        (p, x) for p, x in leaves
        if hasattr(x, "sharding") and x.sharding.spec == P(None, MODEL_AXIS)
    ]
    assert sharded, "no parameter was tensor-sharded"
    losses = []
    orig = tr.meters.train.loss.add

    def spy(v, n=1):
        losses.append(v)
        return orig(v, n)

    tr.meters.train.loss.add = spy
    tr.run()
    assert tr.updates == 12
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 1.5  # no blowup
