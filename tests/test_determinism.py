"""Input-pipeline determinism (SURVEY hard part f): same seed -> identical
batch order and contents across Trainer instances; continue-mode resumes
with the same shuffle sequence; prefetch emits in spec order."""

import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config
from wav2letter_tpu.data import AsrDataset, PrefetchIterator, make_token_dict, Lexicon


def make_cfg(lst, tokens, lexicon):
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, batchsize=4,
             mfsc=True, filterbanks=40, criterion="ctc", nthread=2,
             pad_multiple=64, seed=17)
    )
    return cfg


def test_same_seed_same_batches(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=20, seed=1)
    cfg = make_cfg(lst, tokens, lexicon)
    td = make_token_dict(tokens, "ctc")
    lx = Lexicon.from_file(lexicon)
    ds1 = AsrDataset(lst, td, lx, cfg)
    ds2 = AsrDataset(lst, td, lx, cfg)
    s1 = ds1.batch_specs(shuffle_seed=42)
    s2 = ds2.batch_specs(shuffle_seed=42)
    assert [tuple(s.indices) for s in s1] == [tuple(s.indices) for s in s2]
    b1 = ds1.materialize(s1[0])
    b2 = ds2.materialize(s2[0])
    np.testing.assert_array_equal(b1["audio"], b2["audio"])
    np.testing.assert_array_equal(b1["target"], b2["target"])


def test_different_seed_different_order(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=20, seed=1)
    cfg = make_cfg(lst, tokens, lexicon)
    td = make_token_dict(tokens, "ctc")
    ds = AsrDataset(lst, td, Lexicon.from_file(lexicon), cfg)
    o1 = [tuple(s.indices) for s in ds.batch_specs(shuffle_seed=1)]
    o2 = [tuple(s.indices) for s in ds.batch_specs(shuffle_seed=2)]
    assert o1 != o2
    assert sorted(o1) == sorted(o2)  # same coverage


def test_prefetch_preserves_order(tmp_path):
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=20, seed=1)
    cfg = make_cfg(lst, tokens, lexicon)
    td = make_token_dict(tokens, "ctc")
    ds = AsrDataset(lst, td, Lexicon.from_file(lexicon), cfg)
    specs = ds.batch_specs(shuffle_seed=7)
    seq = [b["sample_idx"].tolist() for b in
           PrefetchIterator(ds, specs, num_threads=3)]
    assert seq == [list(s.indices) for s in specs]


def test_trainer_epoch_shuffle_reproducible(tmp_path):
    """Two trainers with the same seed walk identical batch orders — the
    property exact continue-resume depends on."""
    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=16, seed=2)
    from wav2letter_tpu.runtime.train import Trainer

    orders = []
    for run in range(2):
        cfg = make_cfg(lst, tokens, lexicon)
        cfg.update(dict(rundir=str(tmp_path), runname=f"d{run}", iter=4,
                        lr=0.01, compute_dtype="float32",
                        arch=str(tmp_path / "a.arch")))
        (tmp_path / "a.arch").write_text(
            "V -1 1 NFEAT 0\nC NFEAT 32 8 4 4\nRO 2 0 3 1\nL 32 NLABEL\n"
        )
        tr = Trainer(cfg)
        seen = []
        orig = tr._prep

        def spy(batch, seen=seen, orig=orig):
            seen.append(tuple(batch["sample_idx"].tolist()))
            return orig(batch)

        tr._prep = spy
        tr.run()
        orders.append(seen)
    assert orders[0] == orders[1]


@pytest.mark.slow
def test_continue_exact_replay(tmp_path):
    """Exact-replay resume (VERDICT r4 weak #5 / SURVEY hard part f):
    training straight to N updates and training to K < N, SIGKILL-style
    stop, then `continue` to N must produce BITWISE-identical params —
    mid-epoch sampler position and the per-step RNG stream are both pure
    functions of the update counter."""
    import jax
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=20, seed=3)
    arch = tmp_path / "a.arch"
    arch.write_text("V -1 NFEAT 1 0\nC2 1 8 6 1 2 1 0 0\nR\n"
                    "RO 2 1 0 3\nV 320 -1 1 0\nL 320 NLABEL\nV NLABEL 0 -1 1\n")

    def cfg_for(runname, iters):
        cfg = Config()
        cfg.update(dict(
            train=lst, tokens=tokens, lexicon=lexicon,
            rundir=str(tmp_path), runname=runname, arch=str(arch),
            batchsize=4, mfsc=True, filterbanks=40, criterion="ctc",
            lr=0.1, netoptim="sgd", maxgradnorm=1.0, nthread=2,
            pad_multiple=64, compute_dtype="float32", onorm="target",
            seed=23, iter=iters, reportiters=0,
            # dropout exercises the per-step RNG stream
        ))
        return cfg

    # 20 utts / b4 = 5 steps per epoch; 12 = 2 full epochs + 2 steps;
    # interrupt at 7 = mid-epoch 2
    straight = Trainer(cfg_for("straight", 12))
    straight.run()

    t1 = Trainer(cfg_for("resumed", 7))
    t1.run()
    cfg2 = Config()
    cfg2.update(dict(rundir=str(tmp_path), runname="resumed", iter=12))
    t2 = Trainer(cfg2, mode="continue")
    assert t2.updates == 7
    t2.run()

    flat_a = jax.tree_util.tree_leaves(straight.model_params)
    flat_b = jax.tree_util.tree_leaves(t2.model_params)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
