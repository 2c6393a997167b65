"""Native C++ library tests: decode and resample parity with the Python
fallback paths. Skipped when native/build/libsirdsp.so has not been built
(run native/build.sh)."""

import os

import numpy as np
import pytest

from speech_intent_recognizer_tpu.data import audio_io, native
from speech_intent_recognizer_tpu.ops.resample import resample_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="libsirdsp not built (native/build.sh)")


class TestNativeDecode:
    def test_wav_matches_python_parser(self, rng, tmp_path):
        x = (rng.standard_normal(12345) * 0.3).astype(np.float32)
        p = str(tmp_path / "a.wav")
        audio_io.save_wav(p, x, 16000)
        got, rate = native.decode_file(p)
        want, rate_py = audio_io.load_audio(p, mono=False,
                                            prefer_native=False)
        assert rate == rate_py == 16000
        np.testing.assert_allclose(got.reshape(-1), want.reshape(-1),
                                   atol=1e-6)

    def test_mp3_matches_python_mpg123(self, reference_mic_dir):
        path = os.path.join(reference_mic_dir,
                            "002_i want to decrease the heat.wav")
        got, rate = native.decode_file(path)
        want, rate_py = audio_io._decode_mp3_file(path)
        assert rate == rate_py
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_decode_missing_file_errors(self):
        with pytest.raises(RuntimeError):
            native.decode_file("/nonexistent/file.wav")


class TestNativeResample:
    @pytest.mark.parametrize("orig,new", [(24000, 16000), (44100, 16000),
                                          (8000, 16000)])
    def test_matches_numpy(self, rng, orig, new):
        x = (rng.standard_normal(orig) * 0.5).astype(np.float32)
        got = native.resample(x, orig, new)
        want = resample_np(x, orig, new)
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_identity(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        np.testing.assert_array_equal(native.resample(x, 16000, 16000), x)


class TestNativePreferred:
    def test_load_audio_uses_native(self, rng, tmp_path):
        """load_audio must produce identical output with and without the
        native path."""
        x = (rng.standard_normal(20000) * 0.3).astype(np.float32)
        p = str(tmp_path / "n.wav")
        audio_io.save_wav(p, x, 16000)
        a, _ = audio_io.load_audio(p, prefer_native=True)
        b, _ = audio_io.load_audio(p, prefer_native=False)
        np.testing.assert_allclose(a, b, atol=1e-7)
