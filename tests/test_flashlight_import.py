"""Flashlight (cereal) checkpoint importer tests.

The real-artifact byte-compat is fixture-gated (flashlight not installable
here; tools/flashlight_import.py carries the generator to run where it is).
These tests forge a checkpoint in the documented layout and verify the
whole pipeline: header parse -> af::array scan -> arch-walk mapping ->
params load into our model with identical forward outputs.
"""

import json
import struct

import numpy as np
import pytest

from wav2letter_tpu.tools.flashlight_import import (
    gflags_to_cfg_updates,
    map_arch_params,
    read_header,
    scan_arrays,
    verify_fixture,
)

ARCH = [
    "V -1 NFEAT 1 0",
    "PD 0 3 2",
    "C2 1 8 6 1 2 1 0 0",
    "R",
    "LN 1 2",
    "TDS 8 5 NFEAT 0.0 0 1 0",
    "RO 2 1 0 3",
    "V 320 -1 1 0",
    "L 320 NLABEL",
    "V NLABEL 0 -1 1",
]


def _string(s: str) -> bytes:
    b = s.encode()
    return struct.pack("<Q", len(b)) + b


def _af_array(np_arr: np.ndarray, af_dims) -> bytes:
    data = np.ascontiguousarray(np_arr, np.float32).tobytes()
    return struct.pack("<4q", *af_dims) + struct.pack("<I", 0) + \
        struct.pack("<Q", len(data)) + data


def _forge_checkpoint(param_list, noise=b"\x01\x02xyz"):
    """Serializer::save-shaped bytes: version, cfg map, then arrays with
    arbitrary unknown fields (noise) interleaved — what the polymorphic
    module scalars look like to the scanner."""
    buf = _string("0.3")
    cfg = {"gflags": "--criterion=ctc\n--filterbanks=40\n--mfsc=true"}
    buf += struct.pack("<Q", len(cfg))
    for k, v in cfg.items():
        buf += _string(k) + _string(v)
    for np_arr, af_dims in param_list:
        buf += noise + _af_array(np_arr, af_dims)
    return buf + noise


def _conv_entry(w, b):
    # ours (cout, cin/g, kh, kw) -> AF dims (wx=kw, wy=kh, cin/g, cout);
    # C-order bytes of ours reshape back identically (scanner reverses dims)
    cout, cing, kh, kw = w.shape
    return [(w, (kw, kh, cing, cout)), (b, (len(b), 1, 1, 1))]


def _lin_entry(w, b):
    i, o = w.shape
    return [(w, (o, i, 1, 1)), (b, (len(b), 1, 1, 1))]


def _ln_entry(w, b):
    return [(w, (1, 1, 1, 1)), (b, (1, 1, 1, 1))]


def test_header_and_gflags():
    buf = _forge_checkpoint([])
    version, cfg, off = read_header(buf)
    assert version == "0.3"
    flags = gflags_to_cfg_updates(cfg["gflags"])
    assert flags["criterion"] == "ctc" and flags["filterbanks"] == "40"


def test_scan_rejects_noise_finds_arrays():
    rng = np.random.RandomState(0)
    w = rng.randn(8, 1, 1, 6).astype(np.float32)
    b = rng.randn(8).astype(np.float32)
    buf = _forge_checkpoint(_conv_entry(w, b))
    _, _, off = read_header(buf)
    arrays = scan_arrays(buf, off)
    assert len(arrays) == 2
    np.testing.assert_array_equal(arrays[0], w)
    np.testing.assert_array_equal(arrays[1].reshape(-1), b)


def test_import_forged_tds_checkpoint_forward_equal(tmp_path):
    """Round-trip: our model's params -> forged flashlight checkpoint ->
    import -> identical forward output."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from wav2letter_tpu.models.arch import build_arch_from_lines

    n_feat, n_label = 40, 30
    lines = [
        l.replace("NFEAT", str(n_feat)).replace("NLABEL", str(n_label))
        for l in ARCH
    ]
    model = build_arch_from_lines(lines, n_label)
    p = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, n_feat)), jnp.asarray([64]))
    seq = p["params"]["seq"]

    entries = []
    g = lambda d: np.asarray(d, np.float32)  # noqa: E731
    c2 = seq["02_C2"]
    entries += _conv_entry(g(c2["weight"]), g(c2["bias"]))
    ln = seq["04_LN"]
    entries += _ln_entry(g(ln["weight"]), g(ln["bias"]))
    tds = seq["05_TDS"]
    entries += _conv_entry(g(tds["conv"]["weight"]), g(tds["conv"]["bias"]))
    entries += _ln_entry(g(tds["ln1"]["weight"]), g(tds["ln1"]["bias"]))
    entries += _lin_entry(g(tds["lin1"]["weight"]), g(tds["lin1"]["bias"]))
    entries += _lin_entry(g(tds["lin2"]["weight"]), g(tds["lin2"]["bias"]))
    entries += _ln_entry(g(tds["ln2"]["weight"]), g(tds["ln2"]["bias"]))
    lin = seq["08_L"]
    entries += _lin_entry(g(lin["weight"]), g(lin["bias"]))

    buf = _forge_checkpoint(entries)
    ckpt = tmp_path / "am.bin"
    ckpt.write_bytes(buf)

    from wav2letter_tpu.tools.flashlight_import import import_checkpoint

    version, flags, tree, leftover = import_checkpoint(
        str(ckpt), arch_lines=lines, n_feat=n_feat, n_label=n_label
    )
    assert version == "0.3" and flags["criterion"] == "ctc"
    assert not leftover

    imported = serialization.from_state_dict(p["params"], {"seq": tree})
    x = jnp.asarray(np.random.RandomState(1).randn(2, 64, n_feat), jnp.float32)
    xl = jnp.asarray([64, 48])
    y0, l0 = model.apply({"params": p["params"]}, x, xl)
    y1, l1 = model.apply({"params": imported}, x, xl)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), rtol=1e-6)


def test_am_flag_accepts_flashlight_checkpoint(tmp_path):
    """--am=<reference.bin> works end-to-end: load_checkpoint falls back to
    the flashlight importer, re-injects the stored gflags as config, and the
    Test executor runs viterbi eval with the imported params."""
    import jax
    import jax.numpy as jnp

    from tests.util_synth import make_dataset
    from wav2letter_tpu.config import Config
    from wav2letter_tpu.models.arch import build_arch_from_lines
    from wav2letter_tpu.runtime.checkpoint import load_checkpoint

    lst, tokens, lexicon = make_dataset(str(tmp_path / "data"), n_utts=4,
                                        seed=3)
    n_feat = 40
    with open(tokens) as f:
        n_label = sum(1 for _ in f) + 1  # + blank (ctc)
    lines = [
        l.replace("NFEAT", str(n_feat)).replace("NLABEL", str(n_label))
        for l in ARCH
    ]
    arch = tmp_path / "net.arch"
    arch.write_text("\n".join(ARCH) + "\n")

    model = build_arch_from_lines(lines, n_label)
    p = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, n_feat)), jnp.asarray([64]))
    seq = p["params"]["seq"]
    g = lambda d: np.asarray(d, np.float32)  # noqa: E731
    entries = []
    entries += _conv_entry(g(seq["02_C2"]["weight"]), g(seq["02_C2"]["bias"]))
    entries += _ln_entry(g(seq["04_LN"]["weight"]), g(seq["04_LN"]["bias"]))
    tds = seq["05_TDS"]
    entries += _conv_entry(g(tds["conv"]["weight"]), g(tds["conv"]["bias"]))
    entries += _ln_entry(g(tds["ln1"]["weight"]), g(tds["ln1"]["bias"]))
    entries += _lin_entry(g(tds["lin1"]["weight"]), g(tds["lin1"]["bias"]))
    entries += _lin_entry(g(tds["lin2"]["weight"]), g(tds["lin2"]["bias"]))
    entries += _ln_entry(g(tds["ln2"]["weight"]), g(tds["ln2"]["bias"]))
    entries += _lin_entry(g(seq["08_L"]["weight"]), g(seq["08_L"]["bias"]))

    gflags = (
        f"--criterion=ctc\n--mfsc=true\n--filterbanks={n_feat}\n"
        f"--arch={arch}\n--tokens={tokens}\n--lexicon={lexicon}\n"
        "--wordseparator=|\n"
    )
    buf = _string("0.3")
    buf += struct.pack("<Q", 1) + _string("gflags") + _string(gflags)
    for np_arr, af_dims in entries:
        buf += b"\x07\x00" + _af_array(np_arr, af_dims)
    ckpt = tmp_path / "reference_am.bin"
    ckpt.write_bytes(buf)

    loaded = load_checkpoint(str(ckpt))
    assert loaded.extra["flashlight_version"] == "0.3"
    cfg = Config()
    cfg.update(dict(am=str(ckpt), test=lst, nthread=1))
    from wav2letter_tpu.runtime.test import run_test

    res = run_test(cfg)
    assert np.isfinite(res["TER"])  # untrained params: just runs end-to-end


def test_real_flashlight_fixture():
    """Byte-compat against a REAL flashlight-saved checkpoint. Auto-skipped
    until a fixture generated by tools/flashlight_import.py's
    FIXTURE_GENERATOR_CPP (on a machine with flashlight) is committed under
    tests/data/flashlight_fixture/."""
    import os

    fixture = os.path.join(os.path.dirname(__file__), "data",
                           "flashlight_fixture")
    if not os.path.exists(os.path.join(fixture, "fixture.bin")):
        pytest.skip("no real flashlight fixture (flashlight unavailable "
                    "here); generate with tools/flashlight_import.py")
    verify_fixture(fixture)
