"""Feature front-end parity tests.

Chain of trust:
  torch.stft (the engine torchaudio wraps)  ==  NumPy golden
  NumPy golden                              ==  JAX front-end
  JAX front-end                             ==  Pallas fused kernel (separate file)

The reference feature contract is defined at
/root/reference/scripts/precompute_features.py:28-73 (MelSpectrogram 1024/512/64
+ AmplitudeToDB + per-utterance norm).
"""

import numpy as np
import pytest

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.ops import frontend_numpy as golden


def _rand_wave(rng, n, sr=16000):
    t = np.arange(n) / sr
    x = (0.3 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1330 * t + 0.5)
         + 0.05 * rng.standard_normal(n))
    return x.astype(np.float32)


class TestGoldenVsTorch:
    """Validate the NumPy golden against actual torch kernels."""

    @pytest.mark.parametrize("n", [1600, 16000, 47999, 80000])
    def test_power_spectrogram_matches_torch_stft(self, rng, n):
        torch = pytest.importorskip("torch")
        x = _rand_wave(rng, n)
        spec_np = golden.spectrogram_np(x, n_fft=1024, hop_length=512)

        xt = torch.from_numpy(x.astype(np.float64))
        st = torch.stft(
            xt, n_fft=1024, hop_length=512,
            window=torch.hann_window(1024, dtype=torch.float64),
            center=True, pad_mode="reflect", onesided=True,
            return_complex=True,
        )
        spec_t = (st.abs() ** 2).numpy()
        assert spec_np.shape == spec_t.shape
        np.testing.assert_allclose(spec_np, spec_t, rtol=1e-9, atol=1e-9)

    def test_hann_window_matches_torch(self):
        torch = pytest.importorskip("torch")
        w = golden.hann_window(1024, periodic=True)
        wt = torch.hann_window(1024, dtype=torch.float64).numpy()
        np.testing.assert_allclose(w, wt, atol=1e-12)

    def test_unbiased_std_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        m = rng.standard_normal((64, 123)).astype(np.float32)
        ours = golden.normalize_per_utterance(m.astype(np.float64))
        mt = torch.from_numpy(m)
        theirs = ((mt - mt.mean()) / (mt.std() + 1e-5)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestMelFilterbank:
    def test_htk_filterbank_shape_and_partition(self):
        fb = golden.mel_filterbank(513, 64, 16000, mel_scale="htk", norm=None)
        assert fb.shape == (513, 64)
        assert fb.min() >= 0.0
        # interior frequency bins are covered by at least one filter
        coverage = fb[5:-5].sum(axis=1)
        assert (coverage > 0).all()

    def test_htk_vs_known_breakpoints(self):
        # 2595*log10(1+f/700) — htk mel of 8000 Hz
        m = golden.hz_to_mel(8000.0, "htk")
        assert abs(m - 2840.0230) < 1e-3
        f = golden.mel_to_hz(m, "htk")
        assert abs(f - 8000.0) < 1e-6

    def test_slaney_matches_librosa_formula(self):
        # slaney mel is linear below 1 kHz: mel(1000) == 15
        assert abs(golden.hz_to_mel(1000.0, "slaney") - 15.0) < 1e-9
        assert abs(golden.mel_to_hz(15.0, "slaney") - 1000.0) < 1e-9


class TestGoldenEndToEnd:
    def test_shapes_and_norm(self, rng):
        x = _rand_wave(rng, 40000)
        mel = golden.log_mel_spectrogram_np(x)
        assert mel.shape == (64, 1 + 40000 // 512)
        assert abs(float(mel.mean())) < 1e-3
        assert abs(float(mel.std(ddof=1)) - 1.0) < 1e-2

    def test_five_second_cap(self, rng):
        x = _rand_wave(rng, 200000)  # 12.5 s
        mel = golden.log_mel_spectrogram_np(x, max_duration=5.0)
        assert mel.shape == (64, 1 + 80000 // 512)  # capped at 5 s -> 157

    def test_pad_or_trim(self, rng):
        m = rng.standard_normal((64, 157)).astype(np.float32)
        out = golden.pad_or_trim_np(m, 200)
        assert out.shape == (64, 200)
        np.testing.assert_array_equal(out[:, 157:], 0.0)
        out2 = golden.pad_or_trim_np(rng.standard_normal((64, 300)), 200)
        assert out2.shape == (64, 200)

    def test_librosa_mode_top_db_and_global_norm(self, rng):
        x = _rand_wave(rng, 24000)
        mel = golden.log_mel_spectrogram_np(x, frontend="librosa")
        raw = golden.log_mel_spectrogram_np(x, frontend="librosa",
                                            normalize=False)
        assert raw.max() <= 1e-6  # ref=max -> peak at 0 dB
        assert raw.min() >= -80.0 - 1e-6  # top_db clamp
        np.testing.assert_allclose(mel, (raw - (-30.1)) / 12.7,
                                   rtol=1e-4, atol=1e-5)


class TestFrozenGoldenVectors:
    """Regression anchor: features frozen at creation time (verified against
    torch.stft before freezing — see tests/data/golden_features.npz).  Fails
    if ANY implementation drift changes the feature contract, independent of
    torch availability."""

    def test_golden_impl_matches_frozen(self):
        import os

        data_path = os.path.join(os.path.dirname(__file__), "data",
                                 "golden_features.npz")
        z = np.load(data_path)
        for key in ("vol", "lamp"):
            x = z[f"wave_{key}"]
            want = z[f"feat_{key}"]
            got = golden.pad_or_trim_np(golden.log_mel_spectrogram_np(x), 200)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                       err_msg=key)

    def test_jax_frontend_matches_frozen(self):
        import os

        import jax.numpy as jnp

        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        data_path = os.path.join(os.path.dirname(__file__), "data",
                                 "golden_features.npz")
        z = np.load(data_path)
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        for key in ("vol", "lamp"):
            x = z[f"wave_{key}"]
            want = z[f"feat_{key}"]
            buf = np.zeros((1, cfg.max_samples), np.float32)
            buf[0, : len(x)] = x
            got = np.asarray(log_mel_frontend(
                jnp.asarray(buf), jnp.asarray([len(x)], np.int32),
                params))[0]
            np.testing.assert_allclose(got, want, rtol=3e-3, atol=3e-3,
                                       err_msg=key)


class TestRealAudio:
    def test_bundled_corpus_features_match_golden(self, reference_mic_dir):
        """Real decoded speech (gTTS MP3 -> 16 kHz) through the device
        front-end must match the golden implementation — the end-to-end
        feature contract on actual audio, not synthetic tones."""
        import os

        import jax.numpy as jnp

        from speech_intent_recognizer_tpu.data.audio_io import load_audio
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        files = ["001_please decrease the volume.wav",
                 "010_switch on the lamp.wav"]
        for fname in files:
            path = os.path.join(reference_mic_dir, fname)
            if not os.path.exists(path):
                continue
            x, _ = load_audio(path, target_sample_rate=16000)
            n = min(len(x), cfg.max_samples)
            buf = np.zeros((1, cfg.max_samples), np.float32)
            buf[0, :n] = x[:n]
            out = np.asarray(log_mel_frontend(
                jnp.asarray(buf), jnp.asarray([n], np.int32), params))[0]
            ref = golden.pad_or_trim_np(
                golden.log_mel_spectrogram_np(x[:n]), 200)
            np.testing.assert_allclose(out, ref, rtol=3e-3, atol=3e-3,
                                       err_msg=fname)


class TestJaxFrontend:
    def test_matches_golden_single(self, rng):
        import jax.numpy as jnp
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        n = 40000
        x = _rand_wave(rng, n)
        ref = golden.pad_or_trim_np(golden.log_mel_spectrogram_np(x), 200)

        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = x
        out = log_mel_frontend(jnp.asarray(buf), jnp.asarray([n]), params)
        out = np.asarray(out[0])
        assert out.shape == (64, 200)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_batched_variable_lengths_match_per_utterance(self, rng):
        import jax.numpy as jnp
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        lengths = [8000, 16001, 31999, 80000]
        waves = [_rand_wave(rng, n) for n in lengths]
        buf = np.zeros((len(waves), cfg.max_samples), np.float32)
        for i, w in enumerate(waves):
            buf[i, : len(w)] = w
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray(lengths, np.int32), params))
        for i, w in enumerate(waves):
            ref = golden.pad_or_trim_np(golden.log_mel_spectrogram_np(w), 200)
            np.testing.assert_allclose(out[i], ref, rtol=2e-3, atol=2e-3,
                                       err_msg=f"utterance {i}")

    def test_librosa_mode_matches_golden(self, rng):
        import jax.numpy as jnp
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        cfg = AudioConfig(frontend="librosa")
        params = make_frontend_params(cfg)
        n = 30000
        x = _rand_wave(rng, n)
        ref = golden.pad_or_trim_np(
            golden.log_mel_spectrogram_np(x, frontend="librosa"), 200)
        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = x
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([n], np.int32), params))[0]
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=3e-3)


class TestPallasProbeFallback:
    """backend='auto' must degrade to the XLA path (not crash every caller)
    if the Mosaic lowering of the Pallas kernel regresses on TPU — the
    probe in frontend_jax.pallas_usable."""

    def test_probe_trivially_true_off_tpu(self):
        from speech_intent_recognizer_tpu.ops import frontend_jax as fj

        assert fj.pallas_usable() is True

    def test_auto_falls_back_when_probe_fails(self, monkeypatch):
        import jax

        from speech_intent_recognizer_tpu.ops import frontend_jax as fj

        def boom(*a, **k):
            raise RuntimeError("simulated mosaic failure")

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(fj, "log_mel_frontend", boom)
        fj._PALLAS_PROBE.clear()
        try:
            params = fj.make_frontend_params(AudioConfig())
            assert fj.default_backend_choice(params) == "xla"
            # cached: a second call must not re-raise through the stub
            assert fj.pallas_usable() is False
        finally:
            fj._PALLAS_PROBE.clear()

    def test_auto_still_picks_pallas_on_healthy_probe(self, monkeypatch):
        import jax

        from speech_intent_recognizer_tpu.ops import frontend_jax as fj

        import jax.numpy as jnp

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        # a healthy kernel: the probe call returns finite features
        monkeypatch.setattr(fj, "log_mel_frontend",
                            lambda *a, **k: jnp.zeros((8, 64, 200)))
        fj._PALLAS_PROBE.clear()
        try:
            params = fj.make_frontend_params(AudioConfig())
            assert fj.default_backend_choice(params) == "pallas"
        finally:
            fj._PALLAS_PROBE.clear()
