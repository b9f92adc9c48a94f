"""Tests for AMI/Fisher/SWBD prep, AdaptiveEmbedding/Softmax, AMP scaling,
beam dump, s2s Test executor."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_tpu.tools import data_prep


def test_swbd_normalization():
    f = data_prep.swbd_normalize_word
    assert f("[NOISE]") == ""
    assert f("[laughter-hello]") == "hello"
    assert f("okay_1") == "okay"
    assert f("w[ord]-") == "word-"
    assert f("THE") == "the"


def test_swbd_transcript_parse(tmp_path):
    p = tmp_path / "sw.text"
    p.write_text(
        "sw2001A-ms98-a-0001 0.50 2.10 HELLO [noise] WORLD\n"
        "sw2001A-ms98-a-0002 3.00 4.00 [silence]\n"
    )
    rows = data_prep.parse_swbd_transcript(str(p))
    assert len(rows) == 1
    assert rows[0][3] == "hello world"


def test_fisher_transcript_parse(tmp_path):
    p = tmp_path / "f.txt"
    p.write_text("# header\n12.3 14.5 A: yeah okay\n15.0 16.0 B: [laughter]\n")
    rows = data_prep.parse_fisher_transcript(str(p))
    assert len(rows) == 1
    assert rows[0][2] == "A" and rows[0][3] == "yeah okay"


def test_ami_segmentation(tmp_path):
    xml = tmp_path / "m.words.xml"
    xml.write_text(
        '<nite:root xmlns:nite="http://nite.sourceforge.net/">'
        '<w starttime="0.0" endtime="0.3">hello</w>'
        '<w starttime="0.35" endtime="0.6">world</w>'
        '<w starttime="2.0" endtime="2.4">again</w>'
        "</nite:root>"
    )
    words = data_prep.parse_ami_words_xml(str(xml))
    assert len(words) == 3
    segs = data_prep.ami_split_segments(words, max_gap_s=0.5)
    assert len(segs) == 2
    assert segs[0][2] == ["hello", "world"]
    audio = np.zeros(16000 * 3, np.float32)
    ap = tmp_path / "meeting.npy"
    np.save(ap, audio)
    samples = data_prep.prepare_ami_meeting(
        str(xml), str(ap), "ES2002a", str(tmp_path / "segs")
    )
    assert len(samples) == 2
    assert samples[0].transcript == "hello world"


def test_adaptive_embedding():
    from wav2letter_tpu.models.arch import build_arch_from_lines

    lines = ["V -1 0 1 1", "ADAPTIVEE 32 8,64", "RO 2 1 0 3", "V 32 -1 1 0",
             "L 32 10", "V 10 0 -1 1"]
    from wav2letter_tpu.models.lm import LMArchModel
    from wav2letter_tpu.models.arch import parse_arch_lines

    m = LMArchModel(tuple(parse_arch_lines(lines)), 10, 10)
    ids = jnp.asarray(np.random.RandomState(0).randint(0, 64, (2, 6)), jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, ids)
    y, _ = m.apply(p, ids)
    assert y.shape == (2, 6, 10)
    assert np.isfinite(np.asarray(y)).all()


def test_adaptive_softmax():
    from wav2letter_tpu.models.lm import AdaptiveSoftmax

    V = 100
    asm = AdaptiveSoftmax(in_dim=16, cutoffs=[20, 60, 100])
    h = jnp.asarray(np.random.RandomState(1).randn(4, 16), jnp.float32)
    p = asm.init(jax.random.PRNGKey(0), h)
    lp = np.asarray(asm.apply(p, h))
    assert lp.shape == (4, V)
    np.testing.assert_allclose(np.exp(lp).sum(-1), 1.0, rtol=1e-4)


def test_amp_scaling_runs(tmp_path):
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=51)
    arch = tmp_path / "a.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 32 8 4 4\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="amp", batchsize=8, mfsc=True, filterbanks=40,
             criterion="ctc", lr=0.1, iter=6, nthread=1, pad_multiple=64,
             arch=str(arch), compute_dtype="float32",
             fl_amp_use_mixed_precision=True, fl_amp_scale_factor=1024.0,
             fl_amp_scale_factor_update_interval=2)
    )
    tr = Trainer(cfg)
    tr.run()
    assert tr.updates == 6
    assert tr.amp_scale >= 1024.0  # doubled on good steps


def test_amp_overflow_retries_same_batch(tmp_path):
    """AMP overflow parity (reference Train.cpp:1216-1237): a non-finite
    scaled gradient halves the scale and RETRIES THE SAME BATCH — the
    failed attempt consumes no new batch and does not advance the update
    counter. The overflow flag is injected on the first two step attempts
    (params passed through unchanged, exactly what the device-side zeroed
    update produces) so the host retry loop is exercised deterministically."""
    import numpy as np

    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=51)
    arch = tmp_path / "a.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 32 8 4 4\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="ampr", batchsize=8, mfsc=True, filterbanks=40,
             criterion="ctc", lr=0.1, iter=4, nthread=1, pad_multiple=64,
             arch=str(arch), compute_dtype="float32",
             fl_amp_use_mixed_precision=True, fl_amp_scale_factor=1024.0,
             fl_amp_scale_factor_update_interval=1000)
    )
    tr = Trainer(cfg)
    orig = tr._get_train_step
    calls = [0]
    batches_seen = []

    def counting():
        step = orig()

        def wrapped(mp, cp, ms, no, co, sb, *rest):
            calls[0] += 1
            batches_seen.append(np.asarray(sb["sample_idx"]).copy())
            out = step(mp, cp, ms, no, co, sb, *rest)
            if calls[0] <= 2:  # inject overflow (inputs are donated, so
                # pass the step outputs through with only the flag faked)
                return out[:6] + (np.False_,) + out[7:]
            return out

        return wrapped

    tr._get_train_step = counting
    tr.run()
    # update counter advanced once per BATCH (reference nupdates), while
    # the step ran two extra times for the retries of the overflowing batch
    assert tr.updates == 4
    assert calls[0] == 6, calls[0]
    # retries re-consumed the SAME batch (sample ids identical)
    np.testing.assert_array_equal(batches_seen[0], batches_seen[1])
    np.testing.assert_array_equal(batches_seen[1], batches_seen[2])
    # two halvings: 1024 -> 256; interval huge so no regrowth
    assert tr.amp_scale == 256.0, tr.amp_scale


def test_s2s_test_executor(tmp_path):
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer
    from wav2letter_tpu.runtime.test import run_test

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=52)
    arch = tmp_path / "a.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="s2st", batchsize=8, mfsc=True, filterbanks=40,
             criterion="seq2seq", encoderdim=32, maxdecoderoutputlen=12,
             lr=0.05, netoptim="adam", lrcrit=0.05, critoptim="adam",
             iter=8, nthread=1, pad_multiple=64, arch=str(arch),
             compute_dtype="float32")
    )
    tr = Trainer(cfg)
    tr.run()
    tcfg = Config()
    tcfg.update(dict(am=os.path.join(tr.rundir, "model_last.bin"), test=lst,
                     nthread=1))
    res = run_test(tcfg)
    assert "WER" in res and np.isfinite(res["WER"])
    # offline s2s beam decode (LexiconSeq2SeqDecoder path)
    from wav2letter_tpu.runtime.decode import run_decode

    dcfg = Config()
    dcfg.update(dict(am=os.path.join(tr.rundir, "model_last.bin"), test=lst,
                     nthread=1, nthread_decoder=1, beamsize=4,
                     beamthreshold=50.0, uselexicon=True))
    dres = run_decode(dcfg)
    assert np.isfinite(dres["WER"])
    # lexicon-free s2s beam
    dcfg.update(dict(uselexicon=False))
    dres2 = run_decode(dcfg)
    assert np.isfinite(dres2["WER"])


def test_wsj_full_prep(tmp_path):
    import wave as wavmod

    d = tmp_path / "wsj0" / "si_tr_s" / "01v"
    d.mkdir(parents=True)
    data = (np.zeros(1600)).astype(np.int16)
    with wavmod.open(str(d / "01vc0207.wav"), "wb") as w:
        w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
        w.writeframes(data.tobytes())
    (d / "01vc02.dot").write_text("HELLO [NOISE] WORLD (01vc0207)\n")
    ndx = tmp_path / "tr.ndx"
    ndx.write_text("; comment\n11_2_1:wsj0/si_tr_s/01v/01vc0207.wv1\n")
    out = tmp_path / "wsj.lst"
    n = data_prep.prepare_wsj_split(str(tmp_path), str(ndx), "train", str(out))
    assert n == 1
    from wav2letter_tpu.data import read_list_file

    s = read_list_file(str(out))[0]
    assert s.transcript == "hello world"


def test_s2s_batch_decode_equivalence(tmp_path):
    """--s2s_batch_decode=N (cross-utterance batched beams through one
    jitted decoder-step call) must give the SAME WER/TER and sclite rows as
    sequential per-utterance decode."""
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.decode import run_decode
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=53)
    arch = tmp_path / "a.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 64 8 4 4\nGLU 2\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="s2sb", batchsize=8, mfsc=True, filterbanks=40,
             criterion="seq2seq", encoderdim=32, maxdecoderoutputlen=12,
             lr=0.05, netoptim="adam", lrcrit=0.05, critoptim="adam",
             iter=12, nthread=1, pad_multiple=64, arch=str(arch),
             compute_dtype="float32")
    )
    Trainer(cfg).run()
    am = os.path.join(str(tmp_path), "s2sb", "model_last.bin")
    base = dict(am=am, test=lst, nthread=1, nthread_decoder=1, beamsize=4,
                beamthreshold=50.0, uselexicon=True)
    seq_cfg = Config()
    seq_cfg.update(dict(base, s2s_batch_decode=1))
    seq = run_decode(seq_cfg)
    bat_cfg = Config()
    bat_cfg.update(dict(base, s2s_batch_decode=4))
    bat = run_decode(bat_cfg)
    assert seq["WER"] == bat["WER"], (seq, bat)
    assert seq["TER"] == bat["TER"]
