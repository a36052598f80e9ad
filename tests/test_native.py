"""Native C++ audio ops vs the Python reference implementations."""

import numpy as np
import pytest

from grafp_tpu.data.audio_io import _read_wav, save_wav
from grafp_tpu.data.resample import resample_sinc
from tests.fixtures import make_wav_dir

wav_native = pytest.importorskip("grafp_tpu.native.wav_native")

try:
    wav_native._load()
    HAVE_NATIVE = True
except wav_native.NativeUnavailable:
    HAVE_NATIVE = False

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="no g++ toolchain")


def test_native_wav_matches_python(tmp_path, rng):
    x = np.clip(rng.randn(5000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "a.wav")
    save_wav(p, x, 16000)
    ya, sra = wav_native.read(p)
    yb, srb = _read_wav(p)
    assert sra == srb == 16000
    np.testing.assert_array_equal(ya, yb)


def test_native_wav_stereo(tmp_path, rng):
    x = np.clip(rng.randn(300, 2) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "st.wav")
    save_wav(p, x, 8000)
    ya, _ = wav_native.read(p)
    yb, _ = _read_wav(p)
    np.testing.assert_array_equal(ya, yb)


def test_native_wav_rejects_garbage(tmp_path):
    p = str(tmp_path / "x.wav")
    open(p, "wb").write(b"RIFFxxxxJUNK" + b"\x00" * 100)
    with pytest.raises(wav_native.NativeUnavailable):
        wav_native.read(p)


def test_native_resample_matches_python(rng):
    x = rng.randn(4000).astype(np.float32)
    for orig, new in ((22050, 16000), (44100, 16000), (8000, 16000)):
        a = wav_native.resample(x, orig, new)
        b = resample_sinc(x, orig, new)
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=2e-5)


def test_audio_io_uses_native_path(tmp_path, rng):
    from grafp_tpu.data.audio_io import load_audio

    x = np.clip(rng.randn(1000) * 0.3, -0.99, 0.99).astype(np.float32)
    p = str(tmp_path / "n.wav")
    save_wav(p, x, 16000)
    y, sr = load_audio(p, native=True)
    np.testing.assert_allclose(y, x, rtol=0, atol=1.0 / 32000)
