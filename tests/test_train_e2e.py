"""End-to-end training smoke test on the synthetic tone dataset:
build Trainer from flags, run a few hundred updates on the 8-device CPU
mesh, and require the loss to drop and train-TER to reach a sane level.
"""

import os

import numpy as np
import pytest

from wav2letter_tpu.config import Config
from tests.util_synth import make_dataset


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_dataset(str(root), n_utts=24, seed=3)


def make_cfg(lst, tokens, lexicon, rundir, criterion="ctc", **kw):
    cfg = Config()
    cfg.update(
        dict(
            train=lst,
            valid=f"dev:{lst}",
            tokens=tokens,
            lexicon=lexicon,
            rundir=rundir,
            runname="run",
            batchsize=4,
            mfsc=True,
            filterbanks=40,
            criterion=criterion,
            lr=0.3,
            netoptim="sgd",
            momentum=0.0,
            maxgradnorm=1.0,
            iter=60,
            reportiters=0,
            nthread=1,
            pad_multiple=64,
            compute_dtype="float32",
            arch="tests/tiny.arch",
            onorm="target",
        )
    )
    cfg.update(kw)
    return cfg


TINY_ARCH = """\
V -1 1 NFEAT 0
C NFEAT 64 8 4 4
GLU 2
RO 2 0 3 1
L 32 NLABEL
"""


def _write_arch(path):
    with open(path, "w") as f:
        f.write(TINY_ARCH)


def test_ctc_train_loss_decreases(synth, tmp_path):
    lst, tokens, lexicon = synth
    arch = str(tmp_path / "tiny.arch")
    _write_arch(arch)
    cfg = make_cfg(lst, tokens, lexicon, str(tmp_path), arch=arch)
    from wav2letter_tpu.runtime.train import Trainer

    tr = Trainer(cfg)
    losses = []
    orig = tr.meters.train.loss.add

    def spy(v, n=1):
        losses.append(v)
        return orig(v, n)

    tr.meters.train.loss.add = spy
    tr.run()
    assert len(losses) >= 50
    first = np.mean(losses[:8])
    last = np.mean(losses[-8:])
    assert last < first, f"loss did not decrease: {first} -> {last}"
    # checkpoint written
    assert os.path.exists(os.path.join(tr.rundir, "model_last.bin"))


def test_asg_train_runs(synth, tmp_path):
    lst, tokens, lexicon = synth
    arch = str(tmp_path / "tiny.arch")
    _write_arch(arch)
    cfg = make_cfg(
        lst, tokens, lexicon, str(tmp_path), criterion="asg", arch=arch,
        replabel=1, iter=20,
    )
    from wav2letter_tpu.runtime.train import Trainer

    tr = Trainer(cfg)
    tr.run()
    assert tr.updates == 20


def test_bare_continue_preserves_stored_flags(synth, tmp_path):
    """`train continue --rundir=X --runname=Y` (no other flags) must resume
    with the checkpoint's full flag set — process DEFAULTS must not clobber
    stored values; only explicitly re-passed flags override (reference
    gflags re-injection precedence)."""
    lst, tokens, lexicon = synth
    arch = str(tmp_path / "tiny.arch")
    _write_arch(arch)
    cfg = make_cfg(lst, tokens, lexicon, str(tmp_path), arch=arch,
                   iter=20, lr=0.123, filterbanks=40)
    from wav2letter_tpu.runtime.train import Trainer

    Trainer(cfg).run()

    # bare continue: only rundir/runname (+ a single explicit override)
    ccfg = Config.from_sources(
        argv=[f"--rundir={tmp_path}", "--runname=run", "--iter=30"]
    )
    tr2 = Trainer(ccfg, mode="continue")
    assert tr2.cfg.lr == 0.123          # stored, not the 0.1 default
    assert tr2.cfg.arch == arch          # stored path survives
    assert tr2.cfg.criterion == "ctc"
    assert tr2.cfg.iter == 30            # explicit override wins
    assert tr2.updates == 20
    tr2.run()
    assert tr2.updates == 30


def test_features_device_equivalence(synth, tmp_path):
    """--features_device=host (reference W2lDataset placement: featurize in
    prefetch threads, ship features) must train identically to the fused
    on-device path (same Featurizer function, different placement)."""
    lst, tokens, lexicon = synth
    arch = str(tmp_path / "tiny.arch")
    _write_arch(arch)
    losses = {}
    from wav2letter_tpu.runtime.train import Trainer

    for mode in ("host", "tpu"):
        cfg = make_cfg(lst, tokens, lexicon, str(tmp_path / mode), arch=arch,
                       iter=30, lr=0.3, features_device=mode)
        tr = Trainer(cfg)
        tr.run()
        losses[mode] = tr.meters.train.loss.value()
    assert abs(losses["host"] - losses["tpu"]) < 1e-3, losses
