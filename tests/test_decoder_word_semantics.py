"""Lexicon-decoder word-emission semantics (reference LexiconDecoder).

Production lexicons terminate every spelling with the word separator
(``word \\t t o k |`` — conv_glu/librispeech/prepare.py:79-84), so word
labels live on sil-children of the trie and a word is emitted by
TRAVERSING that child. These tests pin that behavior — the round-4
streaming-product failure (100% WER) was a decoder that reset to root on
sil without ever reaching the labeled nodes.
"""

import numpy as np
import pytest

from wav2letter_tpu.decoder import (
    ArpaLM,
    CriterionType,
    DecoderOptions,
    LexiconDecoder,
    SmearingMode,
    Trie,
    ZeroLM,
)

try:
    from wav2letter_tpu.decoder.native import (
        NativeBeamDecoder,
        NativeLM,
        NativeTrie,
        native_available,
    )
    HAVE_NATIVE = native_available()
except Exception:  # pragma: no cover
    HAVE_NATIVE = False

# tokens: 0=| 1=a 2=b 3=c 4=# (blank)
SIL, A, B, C, BLANK = 0, 1, 2, 3, 4
N_TOK = 5


def _trie_py(entries):
    t = Trie(n_tokens=N_TOK)
    for sp, w, score in entries:
        t.insert(sp, w, score)
    t.smear(SmearingMode.MAX)
    return t


def _trie_native(entries):
    t = NativeTrie(N_TOK)
    for sp, w, score in entries:
        t.insert(sp, w, score)
    t.smear("max")
    return t


# spellings are |-terminated like production lexicons
ENTRIES = [
    ([A, B, SIL], 0, 0.0),   # "ab"
    ([B, C, SIL], 1, 0.0),   # "bc"
    ([A, SIL], 2, 0.0),      # "a"
]


def _em(seq, strong=6.0, weak=-2.0):
    em = np.full((len(seq), N_TOK), weak, np.float64)
    for t, tok in enumerate(seq):
        em[t, tok] = strong
    return em


def _opts(**kw):
    d = dict(beam_size=30, beam_threshold=100.0,
             criterion_type=CriterionType.CTC)
    d.update(kw)
    return DecoderOptions(**d)


def _decoders(opts, entries=ENTRIES, lm_py=None, lm_nat=None):
    ds = [LexiconDecoder(opts, _trie_py(entries), lm_py or ZeroLM(),
                         SIL, BLANK, -1)]
    if HAVE_NATIVE:
        ds.append(NativeBeamDecoder(opts, _trie_native(entries), lm_nat,
                                    SIL, BLANK, -1, N_TOK))
    return ds


def test_word_emitted_through_sil_terminated_spelling():
    for dec in _decoders(_opts()):
        res = dec.decode(_em([A, B, SIL, BLANK]))[0]
        assert [w for w in res.words if w >= 0] == [0], type(dec).__name__


def test_two_words_with_silence_between():
    for dec in _decoders(_opts()):
        res = dec.decode(_em([A, B, SIL, B, C, SIL]))[0]
        assert [w for w in res.words if w >= 0] == [0, 1], type(dec).__name__


def test_single_token_word():
    for dec in _decoders(_opts()):
        res = dec.decode(_em([A, SIL, BLANK]))[0]
        assert [w for w in res.words if w >= 0] == [2], type(dec).__name__


def test_lexicon_constraint_no_incomplete_word_leak():
    """Emissions favoring OOV "ac" must not surface a hyp whose token path
    walks an incomplete spelling into sil (the pre-fix decoder leaked
    any-prefix + sil)."""
    for dec in _decoders(_opts()):
        res = dec.decode(_em([A, C, SIL]))[0]
        words = [w for w in res.words if w >= 0]
        for w in words:
            assert w in (0, 1, 2), type(dec).__name__
        # token stream must never contain sil right after a non-word prefix;
        # strongest check: every emitted non-sil token run between sils must
        # be a lexicon spelling whenever it is followed by sil
        toks = [t for t in res.tokens if t >= 0]
        dedup = []
        for t in toks:
            if not dedup or t != dedup[-1]:
                dedup.append(t)
        dedup = [t for t in dedup if t != BLANK]
        spellings = {(A, B), (B, C), (A,)}
        run = []
        for t in dedup:
            if t == SIL:
                if run:
                    assert tuple(run) in spellings, (type(dec).__name__, dedup)
                run = []
            else:
                run.append(t)


def test_online_consume_prune_matches_batch():
    """Reference AudioToWords pattern: per chunk get best words then
    prune(0); concatenation must equal the batch decode's words."""
    em = _em([A, B, SIL, B, C, SIL, BLANK, A, SIL])
    for make in ([lambda: LexiconDecoder(_opts(), _trie_py(ENTRIES), ZeroLM(), SIL, BLANK, -1)]
                 + ([lambda: NativeBeamDecoder(_opts(), _trie_native(ENTRIES),
                                               None, SIL, BLANK, -1, N_TOK)]
                    if HAVE_NATIVE else [])):
        batch = make().decode(em)[0]
        want = [w for w in batch.words if w >= 0]

        dec = make()
        dec.decode_begin()
        got = []
        for off in range(0, em.shape[0], 3):
            dec.decode_step(em[off:off + 3])
            if isinstance(dec, LexiconDecoder):
                res = dec.get_best_hypothesis()
                got_full = [w for w in res.words if w >= 0]
                # python prune keeps ancestor chains: full-history result
                got = got_full
            else:
                got += [w for w in dec.get_results(1)[0].words if w >= 0]
            dec.prune(0)
        dec.decode_end()
        if isinstance(dec, LexiconDecoder):
            got = [w for w in dec.get_best_hypothesis().words if w >= 0]
        else:
            got += [w for w in dec.get_results(1)[0].words if w >= 0]
        assert got == want, type(dec).__name__


HOMOPHONE_ARPA = """\\data\\
ngram 1=5
ngram 2=2

\\1-grams:
-0.9\tab\t-0.3
-0.9\tba\t-0.3
-1.5\tbc\t-0.4
-1.0\t<s>\t-0.5
-1.2\t</s>

\\2-grams:
-0.05\tab bc
-3.0\tba bc
\\end\\
"""


def test_homophone_resolved_by_lm_context(tmp_path):
    """Two words share one spelling (true homophones, the soak-corpus
    mechanism): only the LM context can pick between them. With
    lm_weight>0 the bigram must flip the choice; acoustics are identical
    by construction."""
    entries = [
        ([A, B, SIL], 0, -0.9),   # "ab"
        ([A, B, SIL], 1, -0.9),   # "ba" — same spelling, different word
        ([B, C, SIL], 2, -1.5),   # context word "bc"
    ]
    p = tmp_path / "h.arpa"
    p.write_text(HOMOPHONE_ARPA)
    vocab = ["ab", "ba", "bc"]
    em = _em([A, B, SIL, B, C, SIL])
    opts = _opts(lm_weight=2.0, beam_size=50)

    lm_py = ArpaLM(str(p), usr_vocab=vocab)
    decs = [LexiconDecoder(opts, _trie_py(entries), lm_py, SIL, BLANK, -1)]
    if HAVE_NATIVE:
        decs.append(NativeBeamDecoder(
            opts, _trie_native(entries), NativeLM(str(p), usr_vocab=vocab),
            SIL, BLANK, -1, N_TOK))
    for dec in decs:
        res = dec.decode(em, 4)
        words = [w for w in res[0].words if w >= 0]
        # "ab bc" beats "ba bc" purely on the bigram
        assert words == [0, 2], (type(dec).__name__, words)


def test_lm_weight_sweep_changes_scores(tmp_path):
    """Guard for the round-4 'LM never earns weight' finding: increasing
    lm_weight must actually move hypothesis scores by the LM component."""
    p = tmp_path / "h.arpa"
    p.write_text(HOMOPHONE_ARPA)
    vocab = ["ab", "ba", "bc"]
    entries = [([A, B, SIL], 0, -0.9), ([B, C, SIL], 2, -1.5)]
    em = _em([A, B, SIL, B, C, SIL])
    res0 = LexiconDecoder(_opts(lm_weight=0.0), _trie_py(entries),
                          ArpaLM(str(p), usr_vocab=vocab), SIL, BLANK, -1).decode(em)[0]
    res2 = LexiconDecoder(_opts(lm_weight=2.0), _trie_py(entries),
                          ArpaLM(str(p), usr_vocab=vocab), SIL, BLANK, -1).decode(em)[0]
    assert res0.lm_score != 0.0 or res2.lm_score != 0.0
    # score difference equals lm_weight * lm_score contribution
    assert abs((res2.score - res2.am_score) -
               2.0 * res2.lm_score) < 1e-6


@pytest.mark.skipif(not HAVE_NATIVE, reason="native decoder unavailable")
def test_native_python_differential_sil_terminated(tmp_path):
    """Random-emission differential with production-shaped (|-terminated)
    lexicons and a real LM at lm_weight>0 — pre-round-5 differentials only
    covered spellings without the separator."""
    # NOTE: the homophones' unigrams differ (-0.9 / -1.1) so no exact LM
    # ties arise — tie-breaking order between equal-score words is
    # implementation-defined in both decoders (SURVEY hard-part (c))
    p = tmp_path / "h.arpa"
    p.write_text(HOMOPHONE_ARPA.replace("-0.9\tba", "-1.1\tba"))
    vocab = ["ab", "ba", "bc"]
    entries = [([A, B, SIL], 0, -0.9), ([A, B, SIL], 1, -1.1),
               ([B, C, SIL], 2, -1.5)]
    rng = np.random.RandomState(7)
    for trial in range(8):
        em = rng.randn(12, N_TOK) * 2.0
        for lmw in (0.0, 1.5):
            opts = _opts(lm_weight=lmw, word_score=0.3, sil_score=-0.2,
                         beam_size=40)
            rp = LexiconDecoder(opts, _trie_py(entries),
                                ArpaLM(str(p), usr_vocab=vocab),
                                SIL, BLANK, -1).decode(em)[0]
            rn = NativeBeamDecoder(opts, _trie_native(entries),
                                   NativeLM(str(p), usr_vocab=vocab),
                                   SIL, BLANK, -1, N_TOK).decode(em)[0]
            assert abs(rp.score - rn.score) < 1e-3, (trial, lmw)
            assert [w for w in rp.words if w >= 0] == \
                   [w for w in rn.words if w >= 0], (trial, lmw)
