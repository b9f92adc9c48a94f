import numpy as np
import pytest

from wav2letter_tpu.tools import ngram_lm
from wav2letter_tpu.tools.char_lm_eval import (
    lower_word_ppl,
    transform_asg,
    upper_word_ppl,
)
from wav2letter_tpu.decoder.lm import ArpaLM


def test_transform_asg():
    assert transform_asg("hello", 2) == "hel1o"
    assert transform_asg("aaa", 2) == "a2"
    assert transform_asg("aaaa", 1) == "a1a1"
    assert transform_asg("abc", 2) == "abc"
    assert transform_asg("hello", 0) == "hello"


@pytest.fixture(scope="module")
def char_lm(tmp_path_factory):
    d = tmp_path_factory.mktemp("charlm")
    corpus = d / "c.txt"
    corpus.write_text("the cat\nthe dog\nthe cat sat\n" * 10)
    arpa = d / "char.arpa"
    ngram_lm.train_ngram_lm(str(corpus), str(arpa), order=4, char_level=True)
    return ArpaLM(str(arpa))


def test_upper_ppl(char_lm):
    ppl_seen = upper_word_ppl(char_lm, [["the", "cat"]] * 3)
    ppl_unseen = upper_word_ppl(char_lm, [["zzz", "qqq"]] * 3)
    assert np.isfinite(ppl_seen) and ppl_seen > 1
    assert ppl_unseen > ppl_seen


def test_lower_ppl_bounded(char_lm):
    sents = [["the", "cat"]]
    up = upper_word_ppl(char_lm, sents)
    lo = lower_word_ppl(char_lm, sents, ["the", "cat", "dog", "sat"])
    assert np.isfinite(lo)
    # normalized (lower-bound) ppl should not exceed the unnormalized upper
    assert lo <= up * 2  # loose sanity: normalization reduces per-word surprise
