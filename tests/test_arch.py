"""Arch DSL tests: parsing, shapes, param counts vs reference model sizes,
train/eval behavior, residual blocks, real reference arch files."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_tpu.models.arch import (
    build_arch_from_lines,
    build_arch_module,
    parse_arch_lines,
)

REF = "/root/reference/recipes"


def init_and_run(lines, nlabel, B=2, T=64, C=40, train=False):
    m = build_arch_from_lines(lines, nlabel)
    x = jnp.asarray(np.random.RandomState(0).randn(B, T, C).astype(np.float32))
    xl = jnp.asarray([T, T // 2], jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
    rngs = {"dropout": jax.random.PRNGKey(1), "specaug": jax.random.PRNGKey(2)} if train else None
    y, yl = m.apply(p, x, xl, train=train, rngs=rngs)
    return m, p, np.asarray(y), np.asarray(yl)


def test_conv_glu_stack():
    lines = [
        "V -1 1 40 0",
        "WN 3 C 40 64 13 1 170",
        "GLU 2",
        "DO 0.2",
        "RO 2 0 3 1",
        "WN 0 L 32 64",
        "GLU 0",
        "WN 0 L 32 29",
    ]
    _, _, y, yl = init_and_run(lines, 29)
    assert y.shape[0] == 2 and y.shape[2] == 29
    assert yl[1] < yl[0]


def test_tds_arch():
    lines = [
        "V -1 40 1 0",
        "PD 0 5 3",
        "C2 1 8 10 1 2 1 0 0",
        "R",
        "LN 1 2",
        "TDS 8 9 40 0.1 0 1 0",
        "TDS 8 9 40 0.1 0 -1 1",
        "RO 2 1 0 3",
        "V 320 -1 1 0",
        "L 320 29",
        "V 29 0 -1 1",
    ]
    _, _, y, yl = init_and_run(lines, 29)
    assert y.shape == (2, 32, 29)


def test_tds_layout_fusion_equivalence():
    """A fused (B,T,C*F)-layout TDS chain must match the stored-layout chain
    exactly in math (same params, per-frame LN): the fused path's in-layout
    conv (Conv2D data_layout='ntcf') and boundary conversions are pure
    layout ops."""
    from wav2letter_tpu.models import layers as L

    c, w, f, rpad = 6, 5, 10, 2
    rng = np.random.RandomState(3)
    B, T = 2, 17
    x = jnp.asarray(rng.randn(B, c, f, T).astype(np.float32))

    class Chain(L.nn.Module):
        fused: bool

        @L.nn.compact
        def __call__(self, x):
            il = ("ncft", "btd") if self.fused else ("ncft", "ncft")
            ol = ("btd", "ncft") if self.fused else ("ncft", "ncft")
            for i in range(2):
                x = L.TDSBlock(c, w, f, 0.0, 0, rpad, False,
                               in_layout=il[i], out_layout=ol[i],
                               name=f"b{i}")(x)
            return x

    p = Chain(fused=False).init(jax.random.PRNGKey(0), x)
    y0 = Chain(fused=False).apply(p, x)
    y1 = Chain(fused=True).apply(p, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)


def test_transformer_with_mask():
    lines = [
        "V -1 1 40 0",
        "C 40 32 3 2 1",
        "RO 2 0 3 1",
        "TR 32 64 4 100 0.1 0.0 1",
        "TR 32 64 4 100 0.1 0.5",
        "L 32 29",
    ]
    _, _, y, yl = init_and_run(lines, 29, train=True)
    assert y.shape[-1] == 29


@pytest.mark.parametrize("T,bptt", [(1, 8), (7, 8), (8, 8), (16, 16), (31, 64)])
def test_rel_shift_matches_gather(T, bptt):
    """The layout-op relative shift must equal the gather definition exactly
    (values and gradients) for every T <= bptt."""
    from wav2letter_tpu.models.transformer import _rel_shift

    rng = np.random.RandomState(T * 100 + bptt)
    qp = jnp.asarray(rng.randn(2, 3, T, 2 * bptt).astype(np.float32))

    def gather_ref(a):
        rel = np.arange(T)[None, :] - np.arange(T)[:, None]  # j - i
        rel = rel + bptt
        return a[..., jnp.asarray(np.arange(T)[:, None]), jnp.asarray(rel)]

    def shift(a):  # _rel_shift now takes the pre-sliced (…, T, 2T-1) window
        return _rel_shift(a[..., bptt - T + 1 : bptt + T], T)

    got = jax.jit(shift)(qp)
    want = gather_ref(qp)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    g1 = jax.grad(lambda a: jnp.sum(jnp.sin(shift(a))))(qp)
    g2 = jax.grad(lambda a: jnp.sum(jnp.sin(gather_ref(a))))(qp)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def _upstream_rotate_bias(q, P, bptt):
    """Numpy simulation of the upstream path (fl multiheadAttention +
    relativePositionEmbeddingRotate, called from TransformerCPC.cpp:123-144),
    reproducing ArrayFire column-major join/moddims/rows semantics:
      pre   = matmulNT(posEmb, q)            (2bptt, T)
      rot   = rotate(pre)                    (2bptt+T-1, T)
      bias  = transpose(rot.rows(bptt, bptt+T-1))
    q (T, Dh), P (2bptt, Dh) -> (T_query, T_key)."""
    T = q.shape[0]
    pre = P @ q.T  # (2bptt, T)
    d0, d1 = pre.shape
    data = np.concatenate([pre, np.zeros((d1, d1), pre.dtype)], axis=0)
    flat = data.flatten(order="F")[: (d0 + d1 - 1) * d1]  # AF moddims+rows
    rot = flat.reshape((d0 + d1 - 1, d1), order="F")
    return rot[bptt : bptt + T, :].T


@pytest.mark.parametrize("T,bptt", [(1, 4), (3, 4), (4, 4), (6, 4), (9, 4), (16, 8)])
def test_rel_position_bias_matches_upstream_rotate(T, bptt):
    """_rel_position_bias must equal the upstream rotate-trick result for
    every T — including T > bptt, where out-of-window positions get ZERO
    bias (not a clamped one)."""
    from wav2letter_tpu.models.transformer import _rel_position_bias

    rng = np.random.RandomState(T * 10 + bptt)
    Dh = 5
    q = rng.randn(T, Dh).astype(np.float32)
    P = rng.randn(2 * bptt, Dh).astype(np.float32)
    want = _upstream_rotate_bias(q, P, bptt)
    got = _rel_position_bias(jnp.asarray(q)[None, None], jnp.asarray(P), bptt)
    np.testing.assert_allclose(np.asarray(got)[0, 0], want, atol=1e-5)


def test_residual_block():
    lines = [
        "V -1 1 16 0",
        "RO 2 0 3 1",
        "RES 2 1",
        "L 16 16",
        "SKIP 0 3 0.5",
        "L 16 16",
        "L 16 8",
    ]
    _, _, y, _ = init_and_run(lines, 8, C=16)
    assert y.shape[-1] == 8


def test_res_repeat_blocks():
    lines = [
        "V -1 1 16 0",
        "RO 2 0 3 1",
        "RES 1 1 3",
        "L 16 16",
        "SKIP 0 2",
        "L 16 8",
    ]
    specs = parse_arch_lines(lines)
    # RES repeated 3x + 3 other layers
    assert len(specs) == 6


def test_pool_and_activations():
    lines = [
        "V -1 1 40 0",
        "C 40 16 3 1 1",
        "M 2 1 2 1",
        "ELU",
        "RO 2 0 3 1",
        "PR 1 0.1",
        "L 16 29",
        "LSM 0",
    ]
    _, _, y, _ = init_and_run(lines, 29)
    # log-softmax output sums to 1 in prob space
    np.testing.assert_allclose(np.exp(y).sum(-1), 1.0, rtol=1e-4)


def test_rnn_layers():
    lines = ["V -1 1 20 0", "RO 2 0 3 1", "LSTM 20 16 1 1", "L 32 10"]
    _, _, y, _ = init_and_run(lines, 10, C=20)
    assert y.shape[-1] == 10


def test_dropout_train_vs_eval():
    lines = ["V -1 1 20 0", "RO 2 0 3 1", "DO 0.9", "L 20 10"]
    m = build_arch_from_lines(lines, 10)
    x = jnp.ones((1, 8, 20))
    xl = jnp.asarray([8], jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
    y_eval, _ = m.apply(p, x, xl)
    y_eval2, _ = m.apply(p, x, xl)
    np.testing.assert_array_equal(np.asarray(y_eval), np.asarray(y_eval2))
    y_tr, _ = m.apply(p, x, xl, train=True, rngs={"dropout": jax.random.PRNGKey(5)})
    assert not np.allclose(np.asarray(y_tr), np.asarray(y_eval))


@pytest.mark.parametrize(
    "arch,nfeat,nlabel,expect_mparams",
    [
        (f"{REF}/conv_glu/librispeech/network.arch", 40, 30, 208.9),
        (f"{REF}/streaming_convnets/librispeech/am_500ms_future_context.arch", 80, 9998, 115.1),
    ],
)
def test_reference_arch_files(arch, nfeat, nlabel, expect_mparams):
    m = build_arch_module(arch, nfeat, nlabel)
    T = 128
    x = jnp.zeros((1, T, nfeat))
    xl = jnp.asarray([T], jnp.int32)
    p = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
    n = sum(v.size for v in jax.tree.leaves(p)) / 1e6
    assert abs(n - expect_mparams) / expect_mparams < 0.02
    y, yl = m.apply(p, x, xl)
    assert y.shape[-1] == nlabel


def test_conformer_conv_norm_variants():
    """CFR optional 9th operand selects the conv-module norm: LN default,
    BN = Conformer-paper masked BatchNorm (padded frames excluded from
    batch statistics)."""
    from wav2letter_tpu.models.transformer import ConformerLayer

    for tail, expect_bn in (("", False), (" BN", True), (" LN", False)):
        lines = ["V -1 1 16 0", "RO 2 0 3 1", f"CFR 16 32 4 64 3 0.1 0.0{tail}", "L 16 8"]
        m = build_arch_from_lines(lines, 8)
        x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 16).astype(np.float32))
        xl = jnp.asarray([32, 16], jnp.int32)
        p = m.init({"params": jax.random.PRNGKey(0)}, x, xl)
        has_bn = "batch_stats" in p
        assert has_bn == expect_bn, (tail, list(p.keys()))
        if not expect_bn:
            continue
        # padded frames must not pollute batch stats: extending the padding
        # region with garbage leaves train-mode outputs on valid frames intact
        (y1, _), _ = m.apply(p, x, xl, train=True,
                             rngs={"dropout": jax.random.PRNGKey(1)},
                             mutable=["batch_stats"])
        x2 = x.at[1, 16:].set(1e3)  # garbage in sample 1's padding
        (y2, _), bs2 = m.apply(p, x2, xl, train=True,
                               rngs={"dropout": jax.random.PRNGKey(1)},
                               mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(y1[0]), np.asarray(y2[0]),
                                   rtol=2e-4, atol=2e-4)
        # eval mode consumes the running stats without mutation
        y_eval, _ = m.apply({**p, "batch_stats": bs2["batch_stats"]}, x, xl)
        assert np.isfinite(np.asarray(y_eval)).all()
