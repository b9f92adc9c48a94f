"""IPL orchestration e2e (VERDICT r1 missing #2): the {train -> PL ->
filter -> merge -> retrain} loop on synthetic tones — pseudo-label quality
must improve across rounds and the loop state must be resumable."""

import json
import os

import numpy as np
import pytest

from tests.util_synth import make_dataset
from wav2letter_tpu.config import Config

ARCH = "V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n"


@pytest.mark.slow
def test_ipl_loop_improves(tmp_path):
    from wav2letter_tpu.ops.editdistance import edit_distance
    from wav2letter_tpu.runtime.ipl import IPLOptions, run_ipl
    from wav2letter_tpu.tools.pseudo_label import PLFilterConfig

    # labeled: 10 utts; unlabeled: 28 utts (ground truth known but unused)
    lab_lst, tokens, lexicon = make_dataset(str(tmp_path / "lab"), n_utts=10,
                                            seed=31)
    unsup_lst, _, _ = make_dataset(str(tmp_path / "unsup"), n_utts=28, seed=32)
    truth = {}
    for line in open(unsup_lst):
        sid, _, _, words = line.split(None, 3)
        truth[sid] = words.split()

    arch = tmp_path / "a.arch"
    arch.write_text(ARCH)
    cfg = Config()
    cfg.update(
        dict(
            train=lab_lst, tokens=tokens, lexicon=lexicon,
            rundir=str(tmp_path), runname="ipl", batchsize=8, mfsc=True,
            filterbanks=40, criterion="ctc", lr=0.4, netoptim="sgd",
            maxgradnorm=1.0, reportiters=1000, nthread=1, pad_multiple=64,
            compute_dtype="float32", arch=str(arch), onorm="target", seed=5,
        )
    )
    opts = IPLOptions(unsup_lst=unsup_lst, rounds=2, seed_iters=25,
                      round_iters=250,
                      filter=PLFilterConfig(min_words=1, max_ngram_repeats=4))

    pl_wers = []
    import wav2letter_tpu.runtime.ipl as ipl_mod

    orig_gen = ipl_mod.generate_pseudo_labels

    def spy(am, lst, c):
        hyps = orig_gen(am, lst, c)
        errs = tot = 0
        for sid, words, _, _ in hyps:
            errs += edit_distance(truth[sid], words)
            tot += len(truth[sid])
        pl_wers.append(100.0 * errs / max(1, tot))
        return hyps

    ipl_mod.generate_pseudo_labels = spy
    try:
        state = run_ipl(cfg, opts)
    finally:
        ipl_mod.generate_pseudo_labels = orig_gen

    # loop ran: seed + 2 rounds, artifacts + state on disk
    assert state["round"] == 3
    assert len(state["history"]) == 3
    rundir = tmp_path / "ipl"
    assert (rundir / "ipl_state.json").exists()
    assert (rundir / "pl_round01.lst").exists()
    assert (rundir / "train_round02.lst").exists()
    assert os.path.exists(state["model"])
    # pseudo-labels got BETTER between round 1 and round 2 (the point of IPL)
    assert len(pl_wers) == 2
    assert pl_wers[1] < pl_wers[0], pl_wers
    # round-2 training consumed labeled + pseudo-labeled data
    merged = open(rundir / "train_round02.lst").read().strip().splitlines()
    assert len(merged) > 10

    # resumability: state says done -> rerun is a no-op
    state2 = run_ipl(cfg, opts)
    assert state2["round"] == 3 and len(state2["history"]) == 3
