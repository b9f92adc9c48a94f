"""Streaming inference equivalence: chunked streaming execution must produce
the SAME emissions as the batch model on the full utterance (the property the
reference converter relies on, StreamingTDSModelConverter.cpp:71-79), plus
streaming featurizer consistency and bundle round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wav2letter_tpu.features.frontend import FeatureParams, Featurizer
from wav2letter_tpu.inference.convert import (
    build_streaming_layers,
    build_streaming_network,
    map_params,
)
from wav2letter_tpu.inference.streaming import StreamingFeaturizer
from wav2letter_tpu.models.arch import build_arch_from_lines

NFEAT = 16
NLABEL = 8

STREAM_ARCH = [
    f"V -1 {NFEAT} 1 0",
    "PD 0 5 3",
    "C2 1 6 10 1 2 1 0 0",
    "R",
    "LN 1 2",
    f"TDS 6 7 {NFEAT} 0.0 0 2 0",
    f"TDS 6 7 {NFEAT} 0.0 0 2 0",
    "RO 2 1 0 3",
    f"V {6 * NFEAT} -1 1 0",
    f"L {6 * NFEAT} {NLABEL}",
    f"V {NLABEL} 0 -1 1",
]


@pytest.fixture(scope="module")
def model_and_stream():
    m = build_arch_from_lines(STREAM_ARCH, NLABEL)
    T = 64
    x = jnp.zeros((1, T, NFEAT))
    params = m.init({"params": jax.random.PRNGKey(42)}, x, jnp.asarray([T]))
    net = build_streaming_network(STREAM_ARCH, NFEAT, params["params"])
    return m, params, net


def run_batch(m, params, feats):
    y, _ = m.apply(params, jnp.asarray(feats), jnp.asarray([feats.shape[1]]))
    return np.asarray(y)[0]


def run_streaming(net, feats, chunk_frames):
    states = net.start(1)
    outs = []
    T = feats.shape[1]
    for s in range(0, T, chunk_frames):
        chunk = feats[:, s : s + chunk_frames]  # (1, n, F)
        x = jnp.asarray(chunk)[..., None]  # (1, n, F, 1)
        states, y = net.run(states, x)
        if y.shape[1]:
            outs.append(np.asarray(y))
    states, y = net.finish(states)
    if y is not None and y.shape[1]:
        outs.append(np.asarray(y))
    out = np.concatenate(outs, axis=1)  # (1, T', 1, N)
    return out[0, :, 0, :]


@pytest.mark.parametrize("chunk", [8, 16, 50])
def test_streaming_equals_batch(model_and_stream, chunk):
    m, params, net = model_and_stream
    rng = np.random.RandomState(0)
    T = 100
    feats = rng.randn(1, T, NFEAT).astype(np.float32)
    batch_out = run_batch(m, params, feats)
    stream_out = run_streaming(net, feats, chunk)
    assert stream_out.shape == batch_out.shape, (
        f"{stream_out.shape} vs {batch_out.shape}"
    )
    np.testing.assert_allclose(stream_out, batch_out, rtol=1e-4, atol=1e-4)


def test_streaming_featurizer_matches_batch():
    p = FeatureParams(n_filterbanks=20)
    full = Featurizer(p)
    sf = StreamingFeaturizer(p)
    rng = np.random.RandomState(1)
    audio = rng.randn(16000).astype(np.float32) * 0.1
    ref, _ = full(jnp.asarray(audio[None]))
    ref = np.asarray(ref)[0]
    st = sf.start()
    outs = []
    for s in range(0, len(audio), 1600):
        st, f = sf.run(st, audio[s : s + 1600])
        if len(f):
            outs.append(f)
    got = np.concatenate(outs, axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_bundle_roundtrip(tmp_path):
    """Train-checkpoint -> bundle -> load -> identical streaming output."""
    from wav2letter_tpu.inference.convert import load_streaming_bundle
    from flax import serialization

    m = build_arch_from_lines(STREAM_ARCH, NLABEL)
    T = 64
    params = m.init(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, T, NFEAT)), jnp.asarray([T])
    )
    net = build_streaming_network(STREAM_ARCH, NFEAT, params["params"])
    # serialize bundle manually (convert_checkpoint needs full train ckpt)
    payload = {
        "arch_lines": STREAM_ARCH,
        "n_feat": NFEAT,
        "params": {k: np.asarray(v) for k, v in net.params.items()},
        "feature_cfg": {
            "sample_rate": 16000,
            "frame_size_ms": 25.0,
            "frame_stride_ms": 10.0,
            "n_filterbanks": NFEAT,
            "local_norm_left": 0,
            "local_norm_right": 0,
        },
        "tokens": ["a", "b"],
        "criterion": "ctc",
        "replabel": 0,
        "wordseparator": "|",
    }
    from wav2letter_tpu.inference.convert import BUNDLE_MAGIC

    bpath = tmp_path / "bundle.bin"
    with open(bpath, "wb") as f:
        f.write(BUNDLE_MAGIC)
        f.write(serialization.msgpack_serialize(payload))
    net2, featp, meta = load_streaming_bundle(str(bpath))
    feats = np.random.RandomState(2).randn(1, 50, NFEAT).astype(np.float32)
    o1 = run_streaming(net, feats, 16)
    o2 = run_streaming(net2, feats, 16)
    np.testing.assert_allclose(o1, o2, rtol=1e-6)


def test_streaming_ac_equals_batch():
    """Asymmetric conv (AC, future-limited) streams equal to batch."""
    nfeat, nlabel = 12, 6
    lines = [
        f"V -1 1 {nfeat} 0",
        f"AC {nfeat} 10 5 1 -1 0.25",
        "R",
        "RO 2 0 3 1",
        f"L 10 {nlabel}",
        f"V {nlabel} 0 -1 1",
    ]
    m = build_arch_from_lines(lines, nlabel)
    T = 40
    x = jnp.zeros((1, T, nfeat))
    params = m.init({"params": jax.random.PRNGKey(9)}, x, jnp.asarray([T]))
    net = build_streaming_network(lines, nfeat, params["params"])
    rng = np.random.RandomState(5)
    feats = rng.randn(1, T, nfeat).astype(np.float32)
    # batch: V -1 1 NFEAT maps to AF (T,1,C,B): freq dim 1, channels nfeat
    batch_out = run_batch(m, params, feats)
    states = net.start(1)
    outs = []
    for s in range(0, T, 7):
        chunk = feats[:, s : s + 7]  # (1, n, C)
        xin = jnp.asarray(chunk)[:, :, None, :]  # (1, n, 1, C)
        states, y = net.run(states, xin)
        if y.shape[1]:
            outs.append(np.asarray(y))
    states, y = net.finish(states)
    if y is not None and y.shape[1]:
        outs.append(np.asarray(y))
    stream_out = np.concatenate(outs, axis=1)[0, :, 0, :]
    assert stream_out.shape == batch_out.shape
    np.testing.assert_allclose(stream_out, batch_out, rtol=1e-4, atol=1e-4)


FLAGSHIP_NFEAT = 80
FLAGSHIP_NLABEL = 30


@pytest.fixture(scope="module")
def flagship_arch_lines():
    """The repo's streaming-convnets flagship: 4 chained future-context
    PD/C2 subsampling stages (stride 8 overall) + 8 asymmetric TDS blocks at
    80 filterbanks — the exact structure class whose streaming eval failed
    in the round-4 soak (reference equivalent:
    am_500ms_future_context.arch + StreamingTDSModelConverter.cpp:208-334)."""
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "recipes/streaming_convnets/network.arch")
    lines = [l.strip() for l in open(path)
             if l.strip() and not l.strip().startswith("#")
             and not l.strip().startswith("SAUG")]
    return [l.replace("NFEAT", str(FLAGSHIP_NFEAT))
            .replace("NLABEL", str(FLAGSHIP_NLABEL)) for l in lines]


@pytest.mark.slow
@pytest.mark.parametrize("chunk", [50, 37])
def test_flagship_streaming_equals_batch(flagship_arch_lines, chunk):
    """Full flagship arch: chunked streaming == batch forward (max |diff|
    < 1e-4 on logits). Catches multi-stage flush/carry bugs AND the
    shape-dependent reduced-precision matmul divergence (round-4's broken
    product path): the batch side is pinned to highest precision, the
    streaming side pins precision internally."""
    lines = flagship_arch_lines
    m = build_arch_from_lines(lines, FLAGSHIP_NLABEL)
    T = 300
    x = jnp.zeros((1, T, FLAGSHIP_NFEAT))
    params = m.init({"params": jax.random.PRNGKey(7)}, x, jnp.asarray([T]))
    net = build_streaming_network(lines, FLAGSHIP_NFEAT, params["params"])
    rng = np.random.RandomState(3)
    feats = rng.randn(1, T, FLAGSHIP_NFEAT).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        batch_out = run_batch(m, params, feats)
    stream_out = run_streaming(net, feats, chunk)
    assert stream_out.shape == batch_out.shape, (
        f"{stream_out.shape} vs {batch_out.shape}")
    np.testing.assert_allclose(stream_out, batch_out, rtol=1e-4, atol=1e-4)


def test_streaming_featurizer_local_norm_matches_batch():
    """Streaming featurizer with running local CMVN (left ctx 300 frames,
    the reference streaming cfg's --localnrmlleftctx,
    train_am_500ms_future_context.cfg:33) == batch featurizer with the
    same local normalization, across chunk boundaries."""
    p = FeatureParams(n_filterbanks=80, local_norm_left=300)
    full = Featurizer(p)
    sf = StreamingFeaturizer(p)
    rng = np.random.RandomState(4)
    audio = rng.randn(5 * 16000).astype(np.float32) * 0.1  # 5 s ~ 500 frames
    ref, _ = full(jnp.asarray(audio[None]))
    ref = np.asarray(ref)[0]
    st = sf.start()
    outs = []
    for s in range(0, len(audio), 8000):  # 500 ms chunks
        st, f = sf.run(st, audio[s : s + 8000])
        if len(f):
            outs.append(f)
    got = np.concatenate(outs, axis=0)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
