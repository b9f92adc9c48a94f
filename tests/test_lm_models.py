"""Neural LM tests: GCNN-style arch builds from ids, trains (loss drops),
and plugs into beam decoding as ConvLM."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from wav2letter_tpu.models.lm import build_lm_model, lm_cross_entropy
from wav2letter_tpu.models.arch import parse_arch_lines
from wav2letter_tpu.decoder.convlm import ConvLM

V = 12  # vocab incl. </s>=10, <unk>=11

GCNN_LINES = [
    "V -1 0 1 1",
    f"E 16 {V}",
    "DO 0.1",
    "WN 0 L 16 32",
    "RO 1 3 0 2",
    "RES 3 1 1",
    "DO 0.1",
    "WN 3 AC 32 64 3 1 -1 0",
    "GLU 2",
    "SKIP 0 4 0.7071",
    "RO 2 0 3 1",
    f"WN 0 L 32 {V}",
]


def build():
    from wav2letter_tpu.models.lm import LMArchModel

    specs = tuple(parse_arch_lines(GCNN_LINES))
    return LMArchModel(specs, V, V)


def test_lm_shapes_and_causality():
    m = build()
    ids = jnp.asarray(np.random.RandomState(0).randint(0, V, (2, 10)), jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, ids)
    y, _ = m.apply(p, ids)
    assert y.shape == (2, 10, V)
    # causality: changing a future token must not change earlier logits
    ids2 = ids.at[:, 7].set((ids[:, 7] + 1) % V)
    y2, _ = m.apply(p, ids2)
    np.testing.assert_allclose(np.asarray(y[:, :7]), np.asarray(y2[:, :7]),
                               rtol=1e-5, atol=1e-5)


def test_lm_learns_pattern():
    # deterministic cycle 0,1,2,0,1,2...
    m = build()
    L = 24
    seq = np.asarray([[i % 3 for i in range(L)]] * 4, np.int32)
    ids = jnp.asarray(seq)
    p = m.init({"params": jax.random.PRNGKey(1)}, ids)
    tx = optax.adam(5e-3)
    opt = tx.init(p)

    @jax.jit
    def step(p, o):
        def lf(pp):
            logits, _ = m.apply(pp, ids)
            return lm_cross_entropy(logits, ids).mean() / L

        l, g = jax.value_and_grad(lf)(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for i in range(150):
        p, opt, l = step(p, opt)
        l0 = l0 or float(l)
    assert float(l) < 0.25 * l0
    # greedy next-token prediction follows the cycle
    logits, _ = m.apply(p, ids)
    pred = np.asarray(jnp.argmax(logits, -1))[0]
    assert pred[5] == (seq[0, 5] + 1) % 3


def test_convlm_scoring():
    m = build()
    ids = jnp.zeros((1, 4), jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(2)}, ids)
    vocab = [f"w{i}" for i in range(V - 2)] + ["</s>", "<unk>"]
    lm = ConvLM(m, p, vocab, usr_vocab=["w0", "w1", "w2"], context=8)
    st = lm.start(False)
    st1, s1 = lm.score(st, 0)
    st2, s2 = lm.score(st1, 1)
    _, sf = lm.finish(st2)
    assert np.isfinite([s1, s2, sf]).all()
    assert s1 <= 0 and s2 <= 0
    # caching: same state+token -> same score
    _, s1b = lm.score(st, 0)
    assert s1 == s1b


def test_lmtype_convlm_decode_path(tmp_path):
    """--lmtype=convlm end-to-end through the decode executor's LM
    selection: a self-describing LM checkpoint + --lm_vocab load into a
    ConvLM whose beam scores match direct construction, and build_decoder
    returns a Python decoder wired to it (Decode.cpp:249-277 parity)."""
    import os

    from wav2letter_tpu.config import Config
    from wav2letter_tpu.runtime.checkpoint import Checkpoint, save_checkpoint
    from wav2letter_tpu.runtime.decode import make_decode_lm

    arch = tmp_path / "lm.arch"
    arch.write_text("\n".join(GCNN_LINES) + "\n")
    vocab = [f"w{i}" for i in range(V - 2)] + ["</s>", "<unk>"]
    (tmp_path / "lm_vocab.txt").write_text("\n".join(vocab) + "\n")

    m = build()
    p = m.init({"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(2)},
               jnp.zeros((1, 4), jnp.int32))
    lm_cfg = Config()
    lm_cfg.update(dict(arch=str(arch)))
    save_checkpoint(
        str(tmp_path / "lm_model.bin"),
        Checkpoint(config=lm_cfg.serialize(), epoch=0, updates=1,
                   model_params=p["params"], model_state={}, crit_params={},
                   opt_state={}, crit_opt_state={}, extra={}),
    )

    cfg = Config()
    cfg.update(dict(lm=str(tmp_path / "lm_model.bin"), lmtype="convlm",
                    lm_vocab=str(tmp_path / "lm_vocab.txt"), lm_memory=100))
    lm = make_decode_lm(cfg, usr_vocab=["w0", "w1", "w2"])
    ref = ConvLM(m, {"params": p["params"]}, vocab, usr_vocab=["w0", "w1", "w2"])
    st_a, st_b = lm.start(False), ref.start(False)
    for tok in (0, 1, 2, 1):
        st_a, sa = lm.score(st_a, tok)
        st_b, sb = ref.score(st_b, tok)
        np.testing.assert_allclose(sa, sb, rtol=1e-5)
    _, fa = lm.finish(st_a)
    _, fb = ref.finish(st_b)
    np.testing.assert_allclose(fa, fb, rtol=1e-5)
