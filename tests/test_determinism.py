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
