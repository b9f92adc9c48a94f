"""Numerical-equivalence tests for the parallel paths (VERDICT r1 item 1).

The framework's promise is that GSPMD sharding is an *implementation detail*:
the same training computation, bit-comparable within float tolerance, whether
the batch is spread over 1 or 8 devices (DP) or the big linears are
tensor-sharded over a model axis (TP). The reference has no analog (NCCL DP
only, never verified numerically); these tests hold the TPU build to the
stronger standard.
"""

import jax
import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config

SMALL_ARCH = "V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nRO 2 0 3 1\nL 64 64\nR\nL 64 NLABEL\n"
# big linear (1024x2048 > 2^20 elements) crosses the TP sharding heuristic
BIG_ARCH = "V -1 1 NFEAT 0\nC NFEAT 1024 8 4 4\nRO 2 0 3 1\nL 1024 2048\nR\nL 2048 NLABEL\n"


def _train(tmp_path, data, arch_text, runname, n_steps=8, **overrides):
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = data
    arch = tmp_path / f"{runname}.arch"
    arch.write_text(arch_text)
    cfg = Config()
    cfg.update(
        dict(
            train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
            runname=runname, batchsize=8, mfsc=True, filterbanks=40,
            criterion="ctc", lr=0.1, netoptim="sgd", momentum=0.9,
            maxgradnorm=1.0, iter=n_steps, nthread=1, pad_multiple=64,
            arch=str(arch), compute_dtype="float32", onorm="target",
            reportiters=1000, pcttraineval=0.0, seed=3,
        )
    )
    cfg.update(overrides)
    tr = Trainer(cfg)
    losses = []
    orig = tr.meters.train.loss.add

    def spy(v, n=1):
        losses.append(float(v))
        return orig(v, n)

    tr.meters.train.loss.add = spy
    tr.run()
    assert tr.updates == n_steps
    params = jax.tree.map(lambda x: np.asarray(x, np.float64), tr.model_params)
    return losses, params


def _assert_tree_close(a, b, rtol, atol):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)


def test_dp8_equals_single_device(tmp_path):
    """8-device data-parallel training == single-device training: identical
    loss trajectory and final parameters (same global batch, XLA psums vs
    local reduction) to float32 tolerance."""
    data = make_dataset(str(tmp_path / "data"), n_utts=16, seed=11)
    losses_dp, params_dp = _train(tmp_path, data, SMALL_ARCH, "dp8", dp_axis=8)
    losses_1, params_1 = _train(tmp_path, data, SMALL_ARCH, "dp1", dp_axis=1)
    assert len(losses_dp) == len(losses_1) == 8
    np.testing.assert_allclose(losses_dp, losses_1, rtol=1e-4, atol=1e-5)
    _assert_tree_close(params_dp, params_1, rtol=1e-3, atol=1e-5)


def test_tp_equals_dp(tmp_path):
    """dp4 x mp2 tensor-parallel training == dp8 pure-DP training on an arch
    whose big linears trip the TP sharding heuristic: the column-split matmuls
    + GSPMD collectives must reproduce the replicated math."""
    from jax.sharding import PartitionSpec as P

    from wav2letter_tpu.parallel.mesh import MODEL_AXIS

    data = make_dataset(str(tmp_path / "data"), n_utts=16, seed=12)
    losses_tp, params_tp = _train(
        tmp_path, data, BIG_ARCH, "tp", dp_axis=4, mp_axis=2, n_steps=6
    )
    losses_dp, params_dp = _train(
        tmp_path, data, BIG_ARCH, "dp", dp_axis=8, mp_axis=1, n_steps=6
    )
    np.testing.assert_allclose(losses_tp, losses_dp, rtol=2e-4, atol=1e-5)
    _assert_tree_close(params_tp, params_dp, rtol=2e-3, atol=2e-5)
