"""Native ConvLM decode (deferred / control-inverted LM scoring).

The native C++ beam collects each step's pending (lm-state, word) score
requests; the ConvLM resolves them in one batched device call
(reference: ConvLM forwarded on one GPU per decoder thread,
cpc/Decode.cpp:489-517, with --lm_vocab mapping and --lm_memory cache).
Differential: native decode with lmtype=convlm must match the Python beam.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_tpu.decoder import (
    CriterionType,
    DecoderOptions,
    LexiconDecoder,
    LexiconFreeDecoder,
    SmearingMode,
    Trie,
)
from wav2letter_tpu.decoder.convlm import ConvLM
from wav2letter_tpu.models.arch import parse_arch_lines

native = pytest.importorskip("wav2letter_tpu.decoder.native")
if not native.native_available():
    pytest.skip("native extension unavailable", allow_module_level=True)

from wav2letter_tpu.decoder.native import (
    NativeBeamDecoder,
    NativeExternalLM,
    NativeTrie,
)

V_LM = 8  # LM vocab incl. </s>, <unk>
N_TOK = 5  # 0=| 1=a 2=b 3=c 4=blank

GCNN_LINES = [
    "V -1 0 1 1",
    f"E 12 {V_LM}",
    "RO 1 3 0 2",
    "WN 3 AC 12 24 3 1 -1 0",
    "GLU 2",
    "RO 2 0 3 1",
    f"WN 0 L 12 {V_LM}",
]

# lexicon: words w0='ab' w1='bc' w2='abc' (token ids), <unk>
WORDS = ["w0", "w1", "w2", "<unk>"]
SPELLINGS = [[1, 2], [2, 3], [1, 2, 3]]


def make_convlm(usr_vocab, context=6, lm_memory=64):
    from wav2letter_tpu.models.lm import LMArchModel

    specs = tuple(parse_arch_lines(GCNN_LINES))
    m = LMArchModel(specs, V_LM, V_LM)
    p = m.init({"params": jax.random.PRNGKey(3)}, jnp.zeros((1, 4), jnp.int32))
    vocab = [f"w{i}" for i in range(V_LM - 2)] + ["</s>", "<unk>"]
    return ConvLM(m, p, vocab, usr_vocab=usr_vocab, context=context,
                  lm_memory=lm_memory)


def rand_emissions(t, seed):
    rng = np.random.RandomState(seed)
    em = rng.randn(t, N_TOK).astype(np.float32)
    return np.log(np.exp(em) / np.exp(em).sum(-1, keepdims=True))


def opts_for(criterion=CriterionType.CTC, beam=16, lm_weight=1.3):
    return DecoderOptions(
        beam_size=beam, beam_size_token=N_TOK, beam_threshold=1e9,
        lm_weight=lm_weight, word_score=0.4, unk_score=-np.inf,
        sil_score=0.2, log_add=False, criterion_type=criterion,
    )


def build_py_lexicon(lm, opts):
    trie = Trie(N_TOK)
    start = lm.start(False)
    for wi, sp in enumerate(SPELLINGS):
        _, sc = lm.score(start, wi)
        trie.insert(sp, wi, sc)
    trie.smear(SmearingMode.MAX)
    return LexiconDecoder(opts, trie, lm, 0, 4, 3, is_token_lm=False)


def build_native_lexicon(lm, opts):
    ext = NativeExternalLM(lm)
    trie = NativeTrie(N_TOK)
    start = lm.start(False)
    for wi, sp in enumerate(SPELLINGS):
        _, sc = lm.score(start, wi)
        trie.insert(sp, wi, sc)
    trie.smear("max")
    return NativeBeamDecoder(opts, trie, ext, 0, 4, 3, N_TOK,
                             is_token_lm=False)


def test_native_convlm_lexicon_matches_python():
    lm_py = make_convlm(WORDS)
    lm_nat = make_convlm(WORDS)
    opts = opts_for()
    for seed in (0, 1, 2, 3):
        em = rand_emissions(12, seed + 40)
        pyd = build_py_lexicon(lm_py, opts)
        nad = build_native_lexicon(lm_nat, opts)
        ra = pyd.decode(em)[0]
        rb = nad.decode(em)[0]
        assert [w for w in ra.words if w >= 0] == [w for w in rb.words if w >= 0], seed
        np.testing.assert_allclose(ra.score, rb.score, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(ra.lm_score, rb.lm_score, rtol=1e-4, atol=1e-3)


def test_native_convlm_lexicon_free_matches_python():
    """Char/token-level ConvLM (lexicon_free recipe shape): token ids map
    straight to LM ids via usr_vocab=token entries."""
    toks = ["|", "a", "b", "c", "#"]
    lm_py = make_convlm(toks)
    lm_nat = make_convlm(toks)
    opts = opts_for(lm_weight=0.8)
    for seed in (0, 1, 2):
        em = rand_emissions(10, seed + 77)
        pyd = LexiconFreeDecoder(opts, lm_py, 0, 4)
        ext = NativeExternalLM(lm_nat)
        nad = NativeBeamDecoder(opts, None, ext, 0, 4, -1, N_TOK,
                                is_token_lm=True)
        ra = pyd.decode(em)[0]
        rb = nad.decode(em)[0]
        assert ra.tokens == rb.tokens, seed
        np.testing.assert_allclose(ra.score, rb.score, rtol=1e-4, atol=1e-4)


def test_score_batch_matches_incremental():
    """score_batch (right-padded batched rows at the true position) must
    equal the incremental score() path — causality guarantee."""
    lm = make_convlm(WORDS)
    st = lm.start(False)
    # walk a few words, collecting (hist, word) pairs
    pairs = []
    ref = []
    for w in (0, 2, 1, 0):
        hist = st.ngram
        st, s = lm.score(st, w)
        pairs.append((hist, lm.usr_map[w]))
        ref.append(s)
    cap = lm.context
    hists = np.zeros((len(pairs), cap), np.int32)
    lens = np.zeros(len(pairs), np.int32)
    words = np.zeros(len(pairs), np.int32)
    for i, (h, w) in enumerate(pairs):
        hists[i, : len(h)] = h
        lens[i] = len(h)
        words[i] = w
    lm2 = make_convlm(WORDS)  # fresh cache: forces the batched path
    got = lm2.score_batch(hists, lens, words)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def _make_fake_s2s_update(seed=0, max_steps=12, v=8):
    """Deterministic fake AM step (same shape as tests/test_native_s2s.py)."""
    rng = np.random.RandomState(seed)
    table = (rng.randn(max_steps, v, v) * 2.0).astype(np.float32)
    table = table - np.log(np.exp(table).sum(-1, keepdims=True))

    def update(state, toks):
        st = np.asarray(state)
        toks = np.asarray(toks)
        step = int(st[0])
        logp = table[min(step, max_steps - 1), toks]
        return np.full((len(toks),), step + 1, np.int32), logp, None

    def init(k):
        return np.zeros((k,), np.int32)

    return update, init


def test_native_s2s_convlm_matches_python():
    """S2S beam with lmtype=convlm through the native core's deferred LM
    protocol — both lexicon (word-level) and lexicon-free (token-level)."""
    from wav2letter_tpu.decoder.seq2seq_beam import (
        LexiconFreeSeq2SeqDecoder,
        LexiconSeq2SeqDecoder,
    )
    from wav2letter_tpu.decoder.s2s_native import NativeSeq2SeqDecoder

    V, EOS = 8, 6
    spellings = [([0, 1], 0), ([1, 2], 1), ([0, 1, 2], 2), ([3], 3)]
    words = ["w0", "w1", "w2", "w3"]

    def tries():
        pytrie, nattrie = Trie(V), NativeTrie(V)
        for sp, w in spellings:
            pytrie.insert(sp, w, 0.0)
            nattrie.insert(sp, w, 0.0)
        pytrie.smear(SmearingMode.NONE)
        nattrie.smear("none")
        return pytrie, nattrie

    for seed in (0, 2):
        fn, init = _make_fake_s2s_update(seed, v=V)
        opts = DecoderOptions(beam_size=6, beam_size_token=6,
                              beam_threshold=40.0, lm_weight=1.2,
                              word_score=0.7, eos_score=0.2,
                              criterion_type=CriterionType.S2S)
        pytrie, nattrie = tries()
        pylm = make_convlm(words)
        natlm = NativeExternalLM(make_convlm(words))
        py = LexiconSeq2SeqDecoder(opts, pytrie, pylm, EOS, fn, init,
                                   word_sep_idx=5, max_output_len=8)
        nat = NativeSeq2SeqDecoder(opts, EOS, fn, init, lm=natlm,
                                   trie=nattrie, word_sep_idx=5,
                                   max_output_len=8)
        pr, nr = py.decode(n_best=3), nat.decode(n_best=3)
        assert len(pr) == len(nr)
        for p, n in zip(pr, nr):
            assert p.tokens == n.tokens, seed
            assert p.words == n.words
            np.testing.assert_allclose(p.score, n.score, rtol=1e-4, atol=1e-3)

    # lexicon-free token-level
    toks = [f"t{i}" for i in range(V)]
    for seed in (1,):
        fn, init = _make_fake_s2s_update(seed, v=V)
        opts = DecoderOptions(beam_size=5, beam_size_token=5,
                              beam_threshold=30.0, lm_weight=0.9,
                              criterion_type=CriterionType.S2S)
        pylm = make_convlm(toks)
        natlm = NativeExternalLM(make_convlm(toks))
        py = LexiconFreeSeq2SeqDecoder(opts, EOS, fn, init, pylm,
                                       max_output_len=7)
        nat = NativeSeq2SeqDecoder(opts, EOS, fn, init, lm=natlm,
                                   max_output_len=7)
        pr, nr = py.decode(n_best=3), nat.decode(n_best=3)
        for p, n in zip(pr, nr):
            assert p.tokens == n.tokens, seed
            np.testing.assert_allclose(p.score, n.score, rtol=1e-4, atol=1e-3)


def test_native_convlm_faster_than_python_beam():
    """The point of the exercise: the native beam with deferred ConvLM
    scoring must beat the Python beam wall-clock on a moderate decode."""
    import time

    lm_py = make_convlm(WORDS, lm_memory=10000)
    lm_nat = make_convlm(WORDS, lm_memory=10000)
    opts = opts_for(beam=32)
    em = rand_emissions(50, 9)
    pyd = build_py_lexicon(lm_py, opts)
    nad = build_native_lexicon(lm_nat, opts)
    # warm up both (compile + caches)
    pyd.decode(em)
    nad.decode(em)
    t0 = time.perf_counter()
    pyd.decode(em)
    t_py = time.perf_counter() - t0
    t0 = time.perf_counter()
    nad.decode(em)
    t_nat = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)
