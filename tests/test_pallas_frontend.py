"""Pallas fused front-end kernel parity (interpreter mode on CPU; the same
kernel compiles on TPU — exercised by bench.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.ops import frontend_numpy as golden
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    log_mel_frontend, make_frontend_params)
from speech_intent_recognizer_tpu.ops.frontend_pallas import mel_db_pallas


def _rand_wave(rng, n):
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


class TestKernel:
    def test_mel_db_matches_xla(self, rng):
        cfg = AudioConfig()
        p = make_frontend_params(cfg)
        frames = jnp.asarray(
            rng.standard_normal((300, cfg.n_fft)).astype(np.float32) * 0.1)
        got = np.asarray(mel_db_pallas(frames, p))

        c = np.asarray(frames) @ np.asarray(p.dft_cos)
        s = np.asarray(frames) @ np.asarray(p.dft_sin)
        mel = (c * c + s * s) @ np.asarray(p.mel_fb)
        want = 10.0 * np.log10(np.maximum(mel, 1e-10))
        assert got.shape == (300, 64)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_tile_boundary_sizes(self, rng):
        cfg = AudioConfig()
        p = make_frontend_params(cfg)
        for n in (1, 255, 256, 257):
            frames = jnp.asarray(
                rng.standard_normal((n, cfg.n_fft)).astype(np.float32))
            out = mel_db_pallas(frames, p)
            assert out.shape == (n, 64)
            assert np.isfinite(np.asarray(out)).all()


class TestEndToEndBackend:
    # The fused kernel's DFT is bf16x3 like the XLA path's Precision.HIGH,
    # but a different pass/accumulation order — parity is ~1e-4 on the
    # normalized features in interpret mode, looser on real MXU passes.
    def test_pallas_backend_matches_xla_backend(self, rng):
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        lengths = [16000, 39999, 80000]
        buf = np.zeros((3, cfg.max_samples), np.float32)
        for i, n in enumerate(lengths):
            buf[i, :n] = _rand_wave(rng, n)
        args = (jnp.asarray(buf), jnp.asarray(lengths, np.int32), params)
        xla = np.asarray(log_mel_frontend(*args, backend="xla"))
        pls = np.asarray(log_mel_frontend(*args, backend="pallas"))
        np.testing.assert_allclose(pls, xla, rtol=2e-3, atol=2e-3)

    def test_fused_no_normalize_and_bf16_out(self, rng):
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        n = 32000
        buf = np.zeros((2, cfg.max_samples), np.float32)
        buf[0, :n] = _rand_wave(rng, n)
        buf[1, : n // 2] = _rand_wave(rng, n // 2)
        args = (jnp.asarray(buf), jnp.asarray([n, n // 2], np.int32), params)
        xla = np.asarray(log_mel_frontend(*args, backend="xla",
                                          normalize=False))
        pls = np.asarray(log_mel_frontend(*args, backend="pallas",
                                          normalize=False))
        # un-normalized dB scale: tolerance in dB
        np.testing.assert_allclose(pls, xla, rtol=2e-3, atol=5e-3)

        f32 = np.asarray(log_mel_frontend(*args, backend="pallas"))
        bf16 = np.asarray(log_mel_frontend(
            *args, backend="pallas",
            out_dtype=jnp.bfloat16).astype(jnp.float32))
        np.testing.assert_allclose(bf16, f32, rtol=1e-2, atol=4e-2)

    def test_fused_masks_padded_frames(self, rng):
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        n = 16000  # t_valid = 1 + n // 512 = 32 frames
        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = _rand_wave(rng, n)
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([n], np.int32), params,
            backend="pallas"))[0]
        t_valid = 1 + n // cfg.hop_length
        assert np.abs(out[:, t_valid:]).max() == 0.0
        assert np.abs(out[:, :t_valid]).max() > 0.0

    def test_fused_odd_batch_sizes(self, rng):
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        for b in (1, 3, 5):
            buf = np.zeros((b, cfg.max_samples), np.float32)
            lengths = []
            for i in range(b):
                n = 8000 + 9000 * i
                buf[i, :n] = _rand_wave(rng, n)
                lengths.append(n)
            args = (jnp.asarray(buf), jnp.asarray(lengths, np.int32), params)
            xla = np.asarray(log_mel_frontend(*args, backend="xla"))
            pls = np.asarray(log_mel_frontend(*args, backend="pallas"))
            np.testing.assert_allclose(pls, xla, rtol=2e-3, atol=2e-3)

    def test_chunk_boundary_lengths(self, rng):
        """The in-kernel reflect tail (dynamic roll + reversal + stitch)
        must be exact at every chunk-boundary alignment of the utterance
        length, including the tiny-length x[0]-fill fallback."""
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        hop = cfg.hop_length
        lengths = [2, 3, 100, hop - 1, hop, hop + 1, hop + 2,
                   2 * hop, 2 * hop + 1, 3 * hop - 1, 8000 + hop // 2,
                   cfg.max_samples - 1, cfg.max_samples]
        buf = np.zeros((len(lengths), cfg.max_samples), np.float32)
        for i, n in enumerate(lengths):
            buf[i, :n] = _rand_wave(rng, n)
        args = (jnp.asarray(buf), jnp.asarray(lengths, np.int32), params)
        xla = np.asarray(log_mel_frontend(*args, backend="xla"))
        pls = np.asarray(log_mel_frontend(*args, backend="pallas"))
        np.testing.assert_allclose(pls, xla, rtol=2e-3, atol=2e-3)

    def test_pallas_backend_matches_golden(self, rng):
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        n = 24000
        x = _rand_wave(rng, n)
        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = x
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([n], np.int32), params,
            backend="pallas"))[0]
        ref = golden.pad_or_trim_np(golden.log_mel_spectrogram_np(x), 200)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_librosa_mode_rejected(self, rng):
        cfg = AudioConfig(frontend="librosa")
        params = make_frontend_params(cfg)
        buf = jnp.zeros((1, cfg.max_samples), jnp.float32)
        with pytest.raises(ValueError):
            log_mel_frontend(buf, jnp.asarray([100], np.int32), params,
                             backend="pallas")

    def test_pallas_fallback_non_default_geometry(self, rng):
        """Explicit pallas on a torchaudio geometry the fused kernel does
        NOT support (n_fft=512/hop=256) takes the non-fused fallback, which
        must still apply the right-reflect tail (regression: the sparse
        chunk-tail update was skipped on this path, silently corrupting the
        last valid frames)."""
        cfg = AudioConfig(n_fft=512, hop_length=256, mel_spec_length=200)
        params = make_frontend_params(cfg)
        lengths = [16000, 39999, 12345]
        buf = np.zeros((len(lengths), cfg.max_samples), np.float32)
        for i, n in enumerate(lengths):
            buf[i, :n] = _rand_wave(rng, n)
        args = (jnp.asarray(buf), jnp.asarray(lengths, np.int32), params)
        xla = np.asarray(log_mel_frontend(*args, backend="xla"))
        pls = np.asarray(log_mel_frontend(*args, backend="pallas"))
        np.testing.assert_allclose(pls, xla, rtol=2e-3, atol=2e-3)
        # and both match the golden
        ref = np.stack([
            golden.pad_or_trim_np(
                golden.log_mel_spectrogram_np(
                    buf[i, :n], n_fft=cfg.n_fft, hop_length=cfg.hop_length),
                cfg.mel_spec_length)
            for i, n in enumerate(lengths)])
        np.testing.assert_allclose(pls, ref, rtol=2e-3, atol=2e-3)

    def test_fused_kernel_db_accuracy_vs_golden(self, rng):
        """Pin the fused kernel's accuracy claim directly against the fp32
        NumPy golden on the unnormalized dB scale: the bf16x4 DFT +
        3-pass mel reconstruction is documented at <= 1e-2 dB error
        (interpret mode executes the same split/accumulate arithmetic the
        Mosaic kernel runs)."""
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        lengths = [16000, 40000, 79999]
        buf = np.zeros((len(lengths), cfg.max_samples), np.float32)
        for i, n in enumerate(lengths):
            buf[i, :n] = _rand_wave(rng, n)
        pls = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray(lengths, np.int32), params,
            backend="pallas", normalize=False))
        for i, n in enumerate(lengths):
            ref = golden.pad_or_trim_np(
                golden.log_mel_spectrogram_np(buf[i, :n], normalize=False),
                cfg.mel_spec_length)
            t_valid = 1 + n // cfg.hop_length
            err = np.abs(pls[i, :, :min(t_valid, 200)]
                         - ref[:, :min(t_valid, 200)])
            assert err.max() <= 1e-2, f"dB error {err.max()} at length {n}"
