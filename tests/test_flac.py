"""Native FLAC decoder tests against the test-only Python encoder."""

import numpy as np
import pytest

from tests.util_flac import encode_flac

native = pytest.importorskip("wav2letter_tpu.ops.native")
try:
    native.flac_lib()
except Exception:
    pytest.skip("flac extension unavailable", allow_module_level=True)


@pytest.mark.parametrize("mode", ["verbatim", "fixed"])
def test_flac_roundtrip(tmp_path, mode):
    rng = np.random.RandomState(0)
    n = 10000
    samples = (np.sin(np.linspace(0, 200, n)) * 12000 + rng.randn(n) * 50).astype(
        np.int16
    )
    blob = encode_flac([int(s) for s in samples], sr=16000, mode=mode)
    p = tmp_path / f"x_{mode}.flac"
    p.write_bytes(blob)
    sr, audio = native.flac_decode(str(p))
    assert sr == 16000
    assert len(audio) == n
    ref = samples.astype(np.float32) / 32768.0
    np.testing.assert_allclose(audio, ref, atol=1e-6)


def test_flac_via_load_audio(tmp_path):
    from wav2letter_tpu.data.audio import load_audio

    samples = (np.sin(np.linspace(0, 50, 3000)) * 8000).astype(np.int16)
    blob = encode_flac([int(s) for s in samples])
    p = tmp_path / "y.flac"
    p.write_bytes(blob)
    audio = load_audio(str(p), 16000)
    assert len(audio) == 3000
    np.testing.assert_allclose(audio, samples / 32768.0, atol=1e-6)


def test_flac_duration_tool(tmp_path):
    from wav2letter_tpu.tools.data_prep import audio_duration_ms

    samples = [0] * 16000
    p = tmp_path / "z.flac"
    p.write_bytes(encode_flac(samples))
    assert abs(audio_duration_ms(str(p)) - 1000.0) < 1.0
