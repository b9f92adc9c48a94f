"""Forced alignment (reference tools/Align) + lm_analysis tooling tests:
brute-force differential DP checks, path validity, word-segment emission,
and the e2e align -> filter -> shuffle-segments chain on a trained model."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from wav2letter_tpu.config import Config
from wav2letter_tpu.ops.align import (
    asg_forced_align,
    ctc_forced_align,
    path_to_word_segments,
)
from wav2letter_tpu.ops.ctc import ctc_collapse
from tests.util_synth import make_dataset

NEG = -1e30


def brute_ctc_align(em, tgt, blank):
    """Exponential-free numpy DP mirror of the constrained Viterbi."""
    T, N = em.shape
    U = len(tgt)
    ext = [blank]
    for t in tgt:
        ext += [t, blank]
    L = len(ext)
    score = np.full((T, L), NEG)
    bp = np.zeros((T, L), np.int32)
    score[0, 0] = em[0, ext[0]]
    if L > 1:
        score[0, 1] = em[0, ext[1]]
    for t in range(1, T):
        for s in range(L):
            cands = [score[t - 1, s]]
            if s >= 1:
                cands.append(score[t - 1, s - 1])
            else:
                cands.append(NEG)
            if s >= 2 and s % 2 == 1 and ext[s] != ext[s - 2]:
                cands.append(score[t - 1, s - 2])
            else:
                cands.append(NEG)
            k = int(np.argmax(cands))
            bp[t, s] = k
            score[t, s] = cands[k] + em[t, ext[s]]
    fin = [L - 1, L - 2] if L > 1 else [0]
    last = fin[int(np.argmax([score[T - 1, f] for f in fin]))]
    best = score[T - 1, last]
    states = [last]
    for t in range(T - 1, 0, -1):
        last = last - bp[t, last]
        states.append(last)
    states.reverse()
    return np.asarray([ext[s] for s in states]), best


def brute_asg_align(em, trans, tgt):
    T, N = em.shape
    U = len(tgt)
    score = np.full((T, U), NEG)
    bp = np.zeros((T, U), np.int32)
    score[0, 0] = em[0, tgt[0]]
    for t in range(1, T):
        for s in range(U):
            stay = score[t - 1, s] + trans[tgt[s], tgt[s]]
            adv = score[t - 1, s - 1] + trans[tgt[s], tgt[s - 1]] if s >= 1 else NEG
            k = int(np.argmax([stay, adv]))
            bp[t, s] = k
            score[t, s] = [stay, adv][k] + em[t, tgt[s]]
    last = U - 1
    best = score[T - 1, last]
    states = [last]
    for t in range(T - 1, 0, -1):
        last = last - bp[t, last]
        states.append(last)
    states.reverse()
    return np.asarray([tgt[s] for s in states]), best


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ctc_forced_align_matches_bruteforce(seed):
    rng = np.random.RandomState(seed)
    B, T, N, U = 3, 14, 5, 4
    blank = N - 1
    em = rng.randn(B, T, N).astype(np.float32) * 2
    tls = np.asarray([U, U - 1, 2])
    els = np.asarray([T, T - 3, 9])
    tgts = np.full((B, U), -1, np.int32)
    for b in range(B):
        tgts[b, : tls[b]] = rng.randint(0, N - 1, tls[b])
    tgts[0, 1] = tgts[0, 0]  # repeated label exercises the skip constraint
    path, score = ctc_forced_align(
        jnp.asarray(em), jnp.asarray(tgts), jnp.asarray(els), jnp.asarray(tls)
    )
    path, score = np.asarray(path), np.asarray(score)
    for b in range(B):
        ref_path, ref_score = brute_ctc_align(
            em[b, : els[b]], list(tgts[b, : tls[b]]), blank
        )
        assert abs(score[b] - ref_score) < 1e-3, b
        np.testing.assert_array_equal(path[b, : els[b]], ref_path)
        # validity: collapse(path) recovers the target exactly
        assert ctc_collapse([list(path[b, : els[b]])], blank)[0] == list(
            tgts[b, : tls[b]]
        )
        # pad frames are blank
        assert (path[b, els[b]:] == blank).all()


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asg_forced_align_matches_bruteforce(seed):
    rng = np.random.RandomState(100 + seed)
    B, T, N, U = 2, 12, 5, 4
    em = rng.randn(B, T, N).astype(np.float32) * 2
    trans = rng.randn(N, N).astype(np.float32) * 0.5
    tls = np.asarray([U, 3])
    els = np.asarray([T, 8])
    tgts = np.full((B, U), -1, np.int32)
    for b in range(B):
        tgts[b, : tls[b]] = rng.randint(0, N, tls[b])
    path, score = asg_forced_align(
        jnp.asarray(em), jnp.asarray(trans), jnp.asarray(tgts),
        jnp.asarray(els), jnp.asarray(tls),
    )
    path, score = np.asarray(path), np.asarray(score)
    for b in range(B):
        ref_path, ref_score = brute_asg_align(
            em[b, : els[b]], trans, list(tgts[b, : tls[b]])
        )
        assert abs(score[b] - ref_score) < 1e-3
        np.testing.assert_array_equal(path[b, : els[b]], ref_path)


def test_path_to_word_segments():
    class TD:
        ents = ["|", "a", "b", "c", "<blank>"]

        def get_entry(self, i):
            return self.ents[i]

        def __len__(self):
            return len(self.ents)

    # path: a a <b> b | | c  (blank=4, sep=0) -> words "ab", sil, "c"
    path = [1, 1, 4, 2, 0, 0, 3]
    segs = path_to_word_segments(path, TD(), 0.1, wordsep="|", blank=4)
    words = [w for _, _, w in segs]
    assert words == ["ab", "$", "c"], segs
    b0, l0, _ = segs[0]
    assert abs(b0 - 0.0) < 1e-6 and abs(l0 - 0.4) < 1e-6  # 'ab' spans t=0..4
    assert abs(segs[1][0] - 0.4) < 1e-6  # silence starts at the separator


@pytest.fixture(scope="module")
def trained_align(tmp_path_factory):
    root = tmp_path_factory.mktemp("align_e2e")
    lst, tokens, lexicon = make_dataset(str(root), n_utts=16, seed=11)
    arch = os.path.join(str(root), "tiny.arch")
    with open(arch, "w") as f:
        f.write("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(dict(
        train=lst, tokens=tokens, lexicon=lexicon, rundir=str(root),
        runname="run", batchsize=8, mfsc=True, filterbanks=40, criterion="ctc",
        lr=0.4, netoptim="sgd", maxgradnorm=1.0, iter=300, reportiters=0,
        nthread=1, pad_multiple=64, compute_dtype="float32", arch=arch,
        onorm="target", seed=5,
    ))
    from wav2letter_tpu.runtime.train import Trainer

    Trainer(cfg).run()
    return root, lst, tokens, lexicon


@pytest.mark.slow
def test_align_executor_and_lm_analysis(trained_align, tmp_path):
    root, lst, tokens, lexicon = trained_align
    am = os.path.join(str(root), "run", "model_last.bin")
    cfg = Config()
    cfg.update(dict(am=am, test=lst, batchsize=8, nthread=1))
    from wav2letter_tpu.runtime.align import run_align

    align_path = str(tmp_path / "data.align")
    n = run_align(cfg, align_path)
    assert n == 16
    # every aligned word sequence must equal the transcript
    by_path = {}
    with open(lst) as f:
        for line in f:
            p = line.split()
            by_path[p[1]] = " ".join(p[3:])
    with open(align_path) as f:
        for line in f:
            path, entries = line.split("\t")
            words = [e.split()[4] for e in entries.strip().split("\\n")]
            spoken = " ".join(w for w in words if w != "$")
            assert spoken == by_path[path], (spoken, by_path[path])

    # lm_analysis chain: filter (tone words are single letters, all chunks
    # pass the <=6-word filter; multi-chunk requirement keeps sil-split utts)
    from wav2letter_tpu.tools.lm_analysis import (
        filter_segmentations,
        generate_shuffled_tts_lists,
        shuffle_segments,
    )

    stats = filter_segmentations(align_path, lst, str(tmp_path), min_sil=0.01)
    assert stats["total"] == 16 and stats["kept"] >= 1
    out_lst = shuffle_segments(
        stats["filtered_align"], str(tmp_path / "shuf"), seed=1, min_sil=0.01
    )
    lines = open(out_lst).read().strip().splitlines()
    assert len(lines) == stats["kept"]
    for line in lines:
        sid, wav_path, dur_ms, *words = line.split()
        assert os.path.exists(wav_path)
        assert float(dur_ms) > 0 and words

    outs = generate_shuffled_tts_lists(lst, str(tmp_path / "tts"), n_versions=2)
    assert len(outs) == 2
    t0 = open(outs[0]).read().strip().splitlines()
    assert len(t0) == 16
