"""Decoder stack tests: ARPA LM backoff math, trie smearing, lexicon beam
search vs greedy, lexicon-free decoding, online streaming API."""

import math

import numpy as np
import pytest

from wav2letter_tpu.decoder import (
    ArpaLM,
    CriterionType,
    DecoderOptions,
    LexiconDecoder,
    LexiconFreeDecoder,
    SmearingMode,
    Trie,
    ZeroLM,
)

ARPA = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-1.0\t<s>\t-0.5
-1.2\t</s>
-0.5\tthe\t-0.3
-0.8\tcat\t-0.2
-1.5\t<unk>

\\2-grams:
-0.2\t<s> the
-0.4\tthe cat
-0.9\tcat </s>

\\end\\
"""


@pytest.fixture
def arpa_lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return ArpaLM(str(p), usr_vocab=["the", "cat", "<unk>"])


def test_arpa_direct_bigram(arpa_lm):
    st = arpa_lm.start(False)  # history (<s>)
    st, s = arpa_lm.score(st, 0)  # "the": <s> the seen
    assert abs(s - (-0.2)) < 1e-9
    st, s = arpa_lm.score(st, 1)  # "cat": the cat seen
    assert abs(s - (-0.4)) < 1e-9
    st, s = arpa_lm.finish(st)  # cat </s> seen
    assert abs(s - (-0.9)) < 1e-9


def test_arpa_backoff(arpa_lm):
    st = arpa_lm.start(False)
    st, _ = arpa_lm.score(st, 1)  # "cat": <s> cat unseen -> bo(<s>) + p(cat)
    # expected: -0.5 (backoff of <s>) + -0.8 = -1.3
    st2 = arpa_lm.start(False)
    _, s = arpa_lm.score(st2, 1)
    assert abs(s - (-1.3)) < 1e-9
    # "the the": the the unseen -> bo(the) + p(the) = -0.3 + -0.5
    st3 = arpa_lm.start(True)
    st3, _ = arpa_lm.score(st3, 0)
    st3, s = arpa_lm.score(st3, 0)
    assert abs(s - (-0.8)) < 1e-9


def test_arpa_unk(arpa_lm):
    st = arpa_lm.start(True)
    _, s = arpa_lm.score(st, 2)  # <unk> unigram
    assert abs(s - (-1.5)) < 1e-9


def test_trie_smearing():
    t = Trie(n_tokens=5)
    t.insert([1, 2], word_idx=0, score=-1.0)
    t.insert([1, 3], word_idx=1, score=-2.0)
    t.smear(SmearingMode.MAX)
    n1 = t.root.children[1]
    assert n1.max_score == -1.0
    assert t.root.max_score == -1.0
    assert n1.children[3].max_score == -2.0
    t2 = Trie(n_tokens=5)
    t2.insert([1, 2], 0, -1.0)
    t2.insert([1, 3], 1, -1.0)
    t2.smear(SmearingMode.LOGADD)
    assert abs(t2.root.children[1].max_score - (-1.0 + math.log(2))) < 1e-9


def _char_setup():
    # tokens: 0=| (sil) 1=a 2=b 3=c 4=# (blank)
    trie = Trie(n_tokens=5)
    trie.insert([1, 2], word_idx=0, score=0.0)  # "ab"
    trie.insert([2, 3], word_idx=1, score=0.0)  # "bc"
    trie.smear(SmearingMode.MAX)
    return trie


def _emissions_for(seq, n_tokens=5, T=None, strong=6.0):
    T = T or len(seq)
    em = np.full((T, n_tokens), -2.0, np.float64)
    for t, tok in enumerate(seq):
        em[t, tok] = strong
    return em


def test_lexicon_decoder_greedy_parity():
    trie = _char_setup()
    opts = DecoderOptions(
        beam_size=20, beam_threshold=100.0, criterion_type=CriterionType.CTC
    )
    dec = LexiconDecoder(opts, trie, ZeroLM(), sil_idx=0, blank_idx=4, unk_word_idx=-1)
    # "ab": a b then sil
    em = _emissions_for([1, 2, 0, 4])
    res = dec.decode(em)[0]
    words = [w for w in res.words if w >= 0]
    assert words == [0]


def test_lexicon_decoder_constrains_to_lexicon():
    trie = _char_setup()
    opts = DecoderOptions(beam_size=20, beam_threshold=100.0, criterion_type=CriterionType.CTC)
    dec = LexiconDecoder(opts, trie, ZeroLM(), 0, 4, -1)
    # emissions favor "ac" which is NOT a lexicon word -> must output ab or bc or nothing
    em = _emissions_for([1, 3, 0])
    res = dec.decode(em)[0]
    words = [w for w in res.words if w >= 0]
    for w in words:
        assert w in (0, 1)


def test_lexicon_decoder_lm_rescoring(tmp_path):
    # LM strongly prefers word 1 ("bc"); emissions slightly prefer "ab"
    arpa = """\\data\\
ngram 1=4

\\1-grams:
-9.0\tab
-0.1\tbc
-1.0\t<s>
-1.0\t</s>

\\end\\
"""
    p = tmp_path / "u.arpa"
    p.write_text(arpa)
    lm = ArpaLM(str(p), usr_vocab=["ab", "bc"])
    trie = Trie(n_tokens=5)
    trie.insert([1, 2], 0, -9.0)
    trie.insert([2, 3], 1, -0.1)
    trie.smear(SmearingMode.MAX)
    em = np.full((3, 5), -1.0)
    em[0, 1] = 1.2  # a slightly preferred over b
    em[0, 2] = 1.0
    em[1, 2] = 1.0  # b — so "ab" wins acoustically, "bb" loses to "bc"
    em[1, 3] = 1.1
    em[2, 0] = 2.0  # sil
    opts = DecoderOptions(
        beam_size=50, beam_threshold=1000.0, lm_weight=5.0,
        criterion_type=CriterionType.CTC,
    )
    dec = LexiconDecoder(opts, trie, lm, 0, 4, -1)
    res = dec.decode(em)[0]
    words = [w for w in res.words if w >= 0]
    assert words == [1]  # LM flipped the decision
    # without LM, acoustics win
    dec0 = LexiconDecoder(
        DecoderOptions(beam_size=50, beam_threshold=1000.0, criterion_type=CriterionType.CTC),
        trie, ZeroLM(), 0, 4, -1,
    )
    res0 = dec0.decode(em)[0]
    assert [w for w in res0.words if w >= 0] == [0]


def test_lexicon_free_decoder():
    opts = DecoderOptions(beam_size=10, beam_threshold=100.0, criterion_type=CriterionType.CTC)
    dec = LexiconFreeDecoder(opts, ZeroLM(), sil_idx=0, blank_idx=4)
    em = _emissions_for([1, 1, 4, 1, 2])
    res = dec.decode(em)[0]
    toks = res.tokens
    # collapse repeats + blanks -> a a b = [1,1,2] after CTC rules
    collapsed = []
    prev_blank = True
    prev = -1
    for t in toks:
        if t == 4:
            prev_blank = True
            prev = -1
            continue
        if t != prev:
            collapsed.append(t)
        prev = t
    assert collapsed == [1, 1, 2]


def test_online_api_matches_batch():
    trie = _char_setup()
    opts = DecoderOptions(beam_size=20, beam_threshold=100.0, criterion_type=CriterionType.CTC)
    em = _emissions_for([1, 2, 0, 2, 3, 0])
    d1 = LexiconDecoder(opts, trie, ZeroLM(), 0, 4, -1)
    batch = d1.decode(em)[0]
    d2 = LexiconDecoder(opts, trie, ZeroLM(), 0, 4, -1)
    d2.decode_begin()
    d2.decode_step(em[:3])
    d2.decode_step(em[3:])
    d2.decode_end()
    online = d2.get_best_hypothesis()
    assert [w for w in batch.words if w >= 0] == [w for w in online.words if w >= 0]


def test_asg_decoder_with_transitions():
    trie = _char_setup()
    trans = np.zeros((5, 5), np.float64)
    trans[2, 1] = 2.0  # strong a->b transition
    opts = DecoderOptions(beam_size=20, beam_threshold=100.0, criterion_type=CriterionType.ASG)
    dec = LexiconDecoder(opts, trie, ZeroLM(), 0, -1, -1, transitions=trans)
    em = _emissions_for([1, 2, 0])
    res = dec.decode(em)[0]
    assert [w for w in res.words if w >= 0] == [0]
