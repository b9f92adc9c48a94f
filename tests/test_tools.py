"""Tools tests: data prep walkers, n-gram LM training + perplexity,
wordpiece trainer, pseudo-label filtering, rescoring, sfx chain."""

import json
import math
import os
import wave

import numpy as np
import pytest

from wav2letter_tpu.tools import data_prep, ngram_lm, pseudo_label, rescore, wordpiece


def write_wav(path, n_samples=1600, sr=16000):
    data = (np.sin(np.linspace(0, 100, n_samples)) * 10000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(data.tobytes())


def test_librispeech_prep(tmp_path):
    # fake tree: split/spk/chap/{spk-chap.trans.txt, utt.wav}
    d = tmp_path / "train-clean-100" / "19" / "198"
    d.mkdir(parents=True)
    write_wav(str(d / "19-198-0000.wav"))
    write_wav(str(d / "19-198-0001.wav"))
    (d / "19-198.trans.txt").write_text(
        "19-198-0000 HELLO WORLD\n19-198-0001 FOO BAR BAZ\n"
    )
    out = tmp_path / "train.lst"
    n = data_prep.prepare_librispeech_split(str(tmp_path), "train-clean-100", str(out))
    assert n == 2
    from wav2letter_tpu.data import read_list_file

    s = read_list_file(str(out))
    assert s[0].sample_id == "train-clean-100-19-198-0000"
    assert s[0].transcript == "hello world"
    assert abs(s[0].duration_ms - 100.0) < 1.0


def test_timit_prep_and_folding(tmp_path):
    d = tmp_path / "train" / "dr1" / "spk1"
    d.mkdir(parents=True)
    write_wav(str(d / "sa1.wav"))
    (d / "sa1.phn").write_text("0 100 h#\n100 200 sh\n200 300 ix\n300 400 q\n")
    out = tmp_path / "timit.lst"
    n = data_prep.prepare_timit_split(str(tmp_path), "train", str(out))
    assert n == 1
    from wav2letter_tpu.data import read_list_file

    s = read_list_file(str(out))[0]
    # sh->sh? no: zh->sh; sh stays; ix->ih; q dropped
    assert s.transcript == "h# sh ih"


def test_wsj_normalization():
    assert data_prep.wsj_normalize_word("HELLO") == "hello"
    assert data_prep.wsj_normalize_word("[NOISE]") == ""
    assert data_prep.wsj_normalize_word(".") == ""
    d = data_prep.parse_wsj_dot_file.__doc__
    assert "dot" in d


def test_letter_tokens_and_lexicon(tmp_path):
    lst = tmp_path / "x.lst"
    lst.write_text("a /x 100 hello world\nb /y 100 hello there\n")
    toks = data_prep.make_letter_tokens(str(tmp_path / "tokens.txt"))
    assert toks[0] == "|" and "a" in toks and len(toks) == 28
    n = data_prep.make_letter_lexicon([str(lst)], str(tmp_path / "lex.txt"))
    assert n == 3
    content = (tmp_path / "lex.txt").read_text()
    assert "hello\th e l l o |" in content


def test_ngram_lm_train_and_score(tmp_path):
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("the cat sat\nthe cat ran\nthe dog sat\na cat sat\n" * 5)
    arpa = tmp_path / "lm.arpa"
    lm = ngram_lm.train_ngram_lm(str(corpus), str(arpa), order=3)
    from wav2letter_tpu.decoder.lm import ArpaLM

    alm = ArpaLM(str(arpa))
    # P(cat | the) should beat P(dog | the)
    st = alm.start(True)
    the = alm.vocab["the"]
    st1 = alm._next_state((), the)
    s_cat = alm.raw_score(st1, alm.vocab["cat"])
    s_dog = alm.raw_score(st1, alm.vocab["dog"])
    assert s_cat > s_dog
    # perplexity of training-like text lower than of shuffled text
    ppl_good = ngram_lm.perplexity(str(arpa), [["the", "cat", "sat"]] * 3)
    ppl_bad = ngram_lm.perplexity(str(arpa), [["sat", "the", "dog"]] * 3)
    assert ppl_good < ppl_bad


def test_char_level_lm(tmp_path):
    corpus = tmp_path / "c.txt"
    corpus.write_text("ab ab\nab cd\n" * 10)
    arpa = tmp_path / "char.arpa"
    ngram_lm.train_ngram_lm(str(corpus), str(arpa), order=3, char_level=True)
    from wav2letter_tpu.decoder.lm import ArpaLM

    alm = ArpaLM(str(arpa))
    assert "|" in alm.vocab and "a" in alm.vocab


def test_wordpiece_trainer():
    counts = {"hello": 50, "help": 30, "world": 40, "word": 20, "held": 10}
    wp = wordpiece.UnigramWordPiece(vocab_size=20, max_piece_len=6)
    wp.fit(counts)
    enc = wp.encode_word("hello")
    assert "".join(enc).replace("_", "") == "hello"
    assert enc[0].startswith("_")
    nb = wp.nbest_word("world", 3)
    assert all("".join(s).replace("_", "") == "world" for s in nb)
    # unseen word still encodable (char fallback)
    enc2 = wp.encode_word("zzz")
    assert "".join(enc2).replace("_", "") == "zzz"


def test_wordpiece_artifacts(tmp_path):
    counts = {"aba": 5, "abb": 5, "bab": 5}
    wp = wordpiece.UnigramWordPiece(vocab_size=10, max_piece_len=3)
    wp.fit(counts)
    toks = wp.save_tokens(counts, str(tmp_path / "wp.tokens"))
    assert len(toks) > 0
    wp.save_lexicon(counts.keys(), str(tmp_path / "wp.lexicon"), n_best=2)
    lines = (tmp_path / "wp.lexicon").read_text().strip().split("\n")
    assert all("\t" in l for l in lines)


def test_pl_filtering():
    cfg = pseudo_label.PLFilterConfig(score_quantile=0.25, max_ngram_repeats=1,
                                      ngram_order=2)
    hyps = [
        ("a", ["good", "clean", "hyp"], 1.0, True),
        ("b", ["no", "eos"], 0.9, False),
        ("c", ["loop", "x", "loop", "x", "loop", "x"], 0.8, True),
        ("d", ["low", "score"], -99.0, True),
        ("e", ["fine", "words", "here"], 0.5, True),
    ]
    kept = pseudo_label.filter_pseudo_labels(hyps, cfg)
    ids = [k[0] for k in kept]
    assert "a" in ids and "e" in ids
    assert "b" not in ids and "c" not in ids and "d" not in ids


def test_pl_list_and_lexicon_merge(tmp_path):
    lst = tmp_path / "unsup.lst"
    lst.write_text("u1 /a.wav 100 \nu2 /b.wav 200 \n")
    labels = {"u1": ["new", "words"]}
    out = tmp_path / "pl.lst"
    n = pseudo_label.write_pseudo_labeled_list(str(lst), labels, str(out))
    assert n == 1
    lex = tmp_path / "lex.txt"
    lex.write_text("old\to l d |\n")
    added = pseudo_label.merge_synthetic_lexicon(str(lex), ["new", "old"], str(lex))
    assert added == 1
    stats = pseudo_label.analyze_dataset(str(out))
    assert stats["num_samples"] == 1


def test_rescoring():
    beams = {
        "s1": [
            rescore.BeamHyp("s1", ["the", "cat"], am_score=10.0, lm_score=-1.0),
            rescore.BeamHyp("s1", ["the", "bat"], am_score=10.5, lm_score=-3.0),
        ]
    }
    refs = {"s1": ["the", "cat"]}
    lm_fn = lambda ws: 0.0 if ws == ["the", "cat"] else -10.0
    w, wer = rescore.grid_search_weights(beams, refs, lm_fn)
    assert wer == 0.0
    out = rescore.rescore_beams(beams, lm_fn, w)
    assert out["s1"] == ["the", "cat"]
    assert rescore.oracle_wer(beams, refs) == 0.0


def test_sfx_chain(tmp_path):
    from wav2letter_tpu.data.sfx import read_sound_effect_config

    noise = tmp_path / "noise.npy"
    np.save(noise, np.random.RandomState(0).randn(8000).astype(np.float32) * 0.1)
    nlist = tmp_path / "noise.txt"
    nlist.write_text(str(noise) + "\n")
    conf = [
        {"type": "Normalize", "conf": {}},
        {"type": "AdditiveNoise",
         "conf": {"listFilePath": str(nlist), "minSnr": 10, "maxSnr": 20, "proba": 1.0}},
        {"type": "Amplify", "conf": {"ratioMin": 0.9, "ratioMax": 1.1}},
        {"type": "ReverbEcho", "conf": {"proba": 1.0}},
        {"type": "ClampAmplitude"},
    ]
    cpath = tmp_path / "sfx.json"
    cpath.write_text(json.dumps(conf))
    chain = read_sound_effect_config(str(cpath), seed=1)
    audio = np.sin(np.linspace(0, 50, 4000)).astype(np.float32) * 0.5
    out = chain(audio)
    assert out.shape == audio.shape
    assert np.abs(out).max() <= 1.0
    assert not np.allclose(out, audio)  # actually augmented


def test_corpus_tools(tmp_path):
    from wav2letter_tpu.tools import corpus

    assert corpus.normalize_lm_text("Hello, World! it's ME.") == "hello world it's me"
    assert corpus.title_match("The Adventures of Tom Sawyer", "adventures of tom sawyer!")
    assert not corpus.title_match("Moby Dick", "Pride and Prejudice")
    keep = corpus.dedup_corpus_titles(
        ["Moby Dick", "Some Other Book"], ["moby dick"]
    )
    assert keep == [1]
    a = tmp_path / "a.txt"
    a.write_text("Hello World.\nFoo, bar!\n")
    out = tmp_path / "corpus.txt"
    n = corpus.write_lm_corpus([str(a)], str(out))
    assert n == 2
    vocab = corpus.build_vocab(open(out))
    assert "hello" in vocab


def test_remat_flag(tmp_path):
    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.train import Trainer

    lst, tokens, lexicon = make_dataset(str(tmp_path), n_utts=8, seed=81)
    arch = tmp_path / "a.arch"
    arch.write_text("V -1 1 NFEAT 0\nC NFEAT 32 8 4 4\nRO 2 0 3 1\nL 32 NLABEL\n")
    cfg = Config()
    cfg.update(
        dict(train=lst, tokens=tokens, lexicon=lexicon, rundir=str(tmp_path),
             runname="rm", batchsize=8, mfsc=True, filterbanks=40,
             criterion="ctc", lr=0.1, iter=3, nthread=1, pad_multiple=64,
             arch=str(arch), compute_dtype="float32", remat=True)
    )
    tr = Trainer(cfg)
    tr.run()
    assert tr.updates == 3


def test_commonvoice_prep(tmp_path):
    # fake CommonVoice tree: clips/*.wav (8k, stereo-free) + split tsv
    clips = tmp_path / "clips"
    clips.mkdir()
    write_wav(str(clips / "a.wav"), n_samples=800, sr=8000)
    write_wav(str(clips / "b.wav"), n_samples=800, sr=8000)
    write_wav(str(clips / "c.wav"), n_samples=800, sr=8000)
    tsv = tmp_path / "dev.tsv"
    tsv.write_text(
        "client_id\tpath\tsentence\n"
        "spk1\ta.wav\tHello, World!\n"
        "spk2\tb.wav\tFoo – bar’s baz…\n"
        "spk3\tc.wav\tHas a Ø weird char\n"
    )
    # grapheme tokens from the raw sentences
    toks = data_prep.make_grapheme_tokens(
        ["Hello, World!", "Foo – bar’s baz…"], str(tmp_path / "tokens.txt")
    )
    assert "|" in toks and "'" in toks and "h" in toks and "," not in toks
    out = tmp_path / "dev.lst"
    n = data_prep.prepare_commonvoice_split(
        str(tsv), str(clips), str(out), tokens=toks,
        convert_dir=str(tmp_path / "conv"),
    )
    assert n == 2  # the Ø sentence is filtered by the token set
    from wav2letter_tpu.data import read_list_file
    from wav2letter_tpu.data.audio import load_audio_with_sr

    s = read_list_file(str(out))
    assert s[0].transcript == "hello world"
    assert s[1].transcript == "foo - bar's baz"
    # audio converted to mono 16 kHz wav
    sr, data = load_audio_with_sr(s[0].audio_path)
    assert sr == 16000 and len(data) == 1600
    # frequency-ranked lexicon from the produced lst
    lex = tmp_path / "lexicon.txt"
    n_lex = data_prep.lexicon_from_lst(
        str(out), str(tmp_path / "tokens.txt"), str(lex), n_best=3, min_occ=1
    )
    lines = lex.read_text().strip().splitlines()
    assert n_lex == len(lines) == 3
    assert any(l.startswith("hello h e l l o |") for l in lines)


# ---------------------------------------------------------------- gutenberg LM corpus pipeline
def test_number_and_roman_spelling():
    from wav2letter_tpu.tools.corpus import (
        number_to_ordinal, number_to_words, number_to_year, roman_to_int,
    )

    assert number_to_words(42) == "forty two"
    assert number_to_words(1234) == "one thousand two hundred and thirty four"
    assert number_to_words(1000000) == "one million"
    assert number_to_ordinal(1) == "first"
    assert number_to_ordinal(22) == "twenty second"
    assert number_to_ordinal(30) == "thirtieth"
    assert number_to_ordinal(100) == "one hundredth"
    assert number_to_year(1984) == "nineteen eighty four"
    assert number_to_year(1905) == "nineteen o five"
    assert number_to_year(2000) == "two thousand"
    assert number_to_year(1900) == "nineteen hundred"
    assert number_to_year(2019) == "twenty nineteen"
    assert roman_to_int("XIV") == 14
    assert roman_to_int("MCMXCIX") == 1999
    import pytest as _pt
    for bad in ("IIII", "VX", "ABC", ""):
        with _pt.raises(ValueError):
            roman_to_int(bad)


def test_corpus_pre_and_postprocessing():
    from wav2letter_tpu.tools.corpus import postprocess_line, preprocess_line

    # preprocessing.py behaviors
    assert preprocess_line("wait 12 min. more") == "wait 12 minutes more"
    assert preprocess_line("at 12:30 sharp") == "at 12 30 sharp"
    assert preprocess_line("cut 3/4 of it") == "cut 3 4 of it"
    assert preprocess_line("Mr. Smith vs. Dr. Jones") == \
        "mister Smith versus doctor Jones"
    # postprocessing.py behaviors
    assert postprocess_line("Chapter II") == "chapter two"
    assert postprocess_line("Chapter I") == "chapter one"
    assert postprocess_line("I went home") == "i went home"  # bare I kept
    assert postprocess_line("in 1905 he left") == "in nineteen o five he left"
    assert postprocess_line("the 3rd time") == "the third time"
    assert postprocess_line("$ 100 reward") == "one hundred dollars reward"
    assert postprocess_line("the dogs ' tails") == "the dogs' tails"
    assert postprocess_line("well-known & famous") == "well known and famous"
    assert postprocess_line("café résumé") == "cafe resume"
    assert postprocess_line("weird #@%! stuff") == "weird stuff"


def test_gutenberg_corpus_end_to_end(tmp_path):
    from wav2letter_tpu.tools.corpus import prepare_gutenberg_corpus

    b1 = tmp_path / "book1.txt"
    b1.write_text("<P>\nChapter I\nMr. Smith went home in 1905\n"
                  "Mr. Smith went home in 1905\n")
    b2 = tmp_path / "book2.txt"
    b2.write_text("The 2nd adventure of the well-known hero.\n")
    b3 = tmp_path / "excluded.txt"
    b3.write_text("Should not appear at all.\n")
    out = tmp_path / "corpus.txt"
    res = prepare_gutenberg_corpus(
        [str(b1), str(b2), str(b3)], str(out),
        titles=["A Tale of Winter", "Other Story", "The Great Journey"],
        exclude_titles=["the great journey"],
        vocab_size=5,
    )
    lines = out.read_text().strip().split("\n")
    assert res["n_dropped_books"] == 1
    assert "mister smith went home in nineteen o five" in lines
    assert sum("mister smith" in l for l in lines) == 1  # deduped
    assert "the second adventure of the well known hero" in lines
    assert not any("appear" in l for l in lines)
    assert len(res["vocab"]) == 5
    freqs = dict(res["frequencies"])
    assert freqs["the"] >= 2


def test_kaldi_to_listfile(tmp_path):
    """prepare_kaldi_dir vs the reference kaldi_to_listfile.py: wav.scp
    (plain + sox-pipe entries), segments cut to per-utterance wavs, list
    rows `uid path dur_ms transcript`."""
    import numpy as np
    from scipy.io import wavfile

    from wav2letter_tpu.data.audio import load_audio_with_sr
    from wav2letter_tpu.data.listfile import read_list_file
    from wav2letter_tpu.tools.data_prep import prepare_kaldi_dir

    src = tmp_path / "kaldi"
    src.mkdir()
    sr = 16000
    # 4s source wav, stereo for the remix case
    t = np.arange(4 * sr) / sr
    mono = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wavfile.write(str(src / "a.wav"), sr, (mono * 32767).astype(np.int16))
    stereo = np.stack([mono, 0.5 * mono], axis=1)
    wavfile.write(str(src / "b.wav"), sr, (stereo * 32767).astype(np.int16))

    (src / "wav.scp").write_text(
        f"W1 {src}/a.wav\n"
        f"W2 sox {src}/b.wav -t wav - remix 1 |\n"
    )
    (src / "segments").write_text(
        "U1 W1 0.50 1.50\n"
        "U2 W1 2.00 3.25\n"
        "U3 W2 1.00 2.00\n"
    )
    (src / "text").write_text(
        "U1 hello world\nU2 foo bar baz\nU3 quux\n"
    )

    dst = tmp_path / "out"
    n = prepare_kaldi_dir(str(src), str(dst), name="data.lst", n_process=2)
    assert n == 3

    samples = read_list_file(str(dst / "data.lst"))
    assert [s.sample_id for s in samples] == ["U1", "U2", "U3"]
    assert samples[0].transcript == "hello world"
    assert abs(samples[1].duration_ms - 1250.0) < 0.01
    # segment lengths match [start, end) at the source sample rate
    sr1, seg = load_audio_with_sr(samples[0].audio_path)
    assert sr1 == sr and len(seg) == sr  # 1.0 s
    # the remixed (channel-1) source produced the mono segment
    sr3, seg3 = load_audio_with_sr(samples[2].audio_path)
    assert len(seg3) == sr
    ref = mono[sr:2 * sr]
    assert np.max(np.abs(seg3 - ref)) < 2e-4


def test_prod_scale_artifacts(tmp_path):
    """Production-scale artifact builder at toy size: lexicon with the
    in-language vocab + distractors, counts-based 4-gram -> probing binary
    and quantized trie, both mmap-loaded, manifest cached (idempotent)."""
    from wav2letter_tpu.decoder.native import NativeLM
    from wav2letter_tpu.tools.prod_scale import build_prod_artifacts

    root = str(tmp_path / "prod")
    p = build_prod_artifacts(root, n_lexicon=3000, lm_tokens=40_000,
                             order=4, seed=0)
    import json

    man = json.load(open(p["manifest"]))
    assert man["lexicon_words"] == 3000
    assert man["counts"]["4"] > 1000
    words = [l.split()[0] for l in open(p["lexicon"])]
    assert len(words) == 3000 and len(set(words)) == 3000
    for key in ("bin", "qt"):
        lm = NativeLM(p[key], usr_vocab=words[:50])
        assert lm.used_mmap == 1
        s = lm.score_sentence_ids([0, 1, 2])
        assert s < 0 and s > -100
    # idempotent reuse (manifest match, no rebuild)
    import os
    mtime = os.path.getmtime(p["bin"])
    p2 = build_prod_artifacts(root, n_lexicon=3000, lm_tokens=40_000,
                              order=4, seed=0)
    assert os.path.getmtime(p2["bin"]) == mtime
