"""Audio decode / resample / manifest tests."""

import os

import numpy as np

from speech_intent_recognizer_tpu.data import audio_io
from speech_intent_recognizer_tpu.data.manifest import read_manifest
from speech_intent_recognizer_tpu.data.labelmap import (
    create_label_map, invert_label_map, load_label_map, save_label_map)
from speech_intent_recognizer_tpu.ops.resample import resample_np


class TestWav:
    def test_roundtrip_pcm16(self, rng, tmp_path):
        x = (0.5 * np.sin(2 * np.pi * 440 * np.arange(16000) / 16000)
             ).astype(np.float32)
        p = str(tmp_path / "t.wav")
        audio_io.save_wav(p, x, 16000)
        y, rate = audio_io.load_audio(p)
        assert rate == 16000
        assert y.shape == x.shape
        np.testing.assert_allclose(y, x, atol=1.0 / 32767)

    def test_stereo_mono_mixdown(self, rng, tmp_path):
        x = rng.standard_normal((8000, 2)).astype(np.float32) * 0.1
        p = str(tmp_path / "st.wav")
        audio_io.save_wav(p, x, 16000)
        y, rate = audio_io.load_audio(p, mono=True)
        np.testing.assert_allclose(y, x.mean(axis=1), atol=2.0 / 32767)

    def test_int16_wire_bit_exact_for_pcm16(self, rng, tmp_path):
        # the int16 staging contract: for 16-bit PCM mono at the target
        # rate, i16 * (1/32768) must equal load_audio's float32 BIT-exactly
        x = (0.3 * rng.standard_normal(12000)).astype(np.float32)
        p = str(tmp_path / "w.wav")
        audio_io.save_wav(p, x, 16000)
        f32, _ = audio_io.load_audio(p, target_sample_rate=16000)
        i16, rate = audio_io.load_audio_int16(p, target_sample_rate=16000)
        assert rate == 16000 and i16.dtype == np.int16
        np.testing.assert_array_equal(
            i16.astype(np.float32) * (1.0 / 32768.0), f32)

    def test_int16_wire_quantizes_non_pcm16(self, rng, tmp_path):
        # stereo (mixdown forces the float path): error bounded by the
        # half-LSB quantization step
        x = (0.2 * rng.standard_normal((8000, 2))).astype(np.float32)
        p = str(tmp_path / "st2.wav")
        audio_io.save_wav(p, x, 16000)
        f32, _ = audio_io.load_audio(p, target_sample_rate=16000)
        i16, _ = audio_io.load_audio_int16(p, target_sample_rate=16000)
        np.testing.assert_allclose(
            i16.astype(np.float32) / 32768.0, f32, atol=0.5 / 32768.0)

    def test_int16_wire_resamples(self, rng, tmp_path):
        x = (0.2 * rng.standard_normal(22050)).astype(np.float32)
        p = str(tmp_path / "sr.wav")
        audio_io.save_wav(p, x, 22050)
        i16, rate = audio_io.load_audio_int16(p, target_sample_rate=16000)
        f32, _ = audio_io.load_audio(p, target_sample_rate=16000)
        assert rate == 16000 and len(i16) == len(f32)
        np.testing.assert_allclose(
            i16.astype(np.float32) / 32768.0, f32, atol=0.5 / 32768.0)

    def test_validate_audio(self, tmp_path):
        p = str(tmp_path / "short.wav")
        audio_io.save_wav(p, np.zeros(50, np.float32), 16000)
        assert not audio_io.validate_audio(p)  # < 100 samples
        p2 = str(tmp_path / "ok.wav")
        audio_io.save_wav(p2, np.zeros(200, np.float32), 16000)
        assert audio_io.validate_audio(p2)
        assert not audio_io.validate_audio(str(tmp_path / "missing.wav"))


class TestMp3:
    def test_decode_bundled_gtts_corpus(self, reference_mic_dir):
        # the reference's .wav files are actually MP3 (gTTS output)
        path = os.path.join(reference_mic_dir,
                            "001_please decrease the volume.wav")
        x, rate = audio_io.load_audio(path)
        assert rate in (16000, 22050, 24000, 44100)
        assert x.ndim == 1
        assert len(x) > rate * 0.5  # at least half a second of speech
        assert float(np.abs(x).max()) > 0.01

    def test_decode_with_resample_to_16k(self, reference_mic_dir):
        path = os.path.join(reference_mic_dir, "005_i need the newspaper.wav")
        x, rate = audio_io.load_audio(path, target_sample_rate=16000)
        assert rate == 16000
        assert len(x) > 8000


class TestResample:
    def test_identity(self, rng):
        x = rng.standard_normal(1000).astype(np.float32)
        np.testing.assert_array_equal(resample_np(x, 16000, 16000), x)

    def test_output_length(self, rng):
        x = rng.standard_normal(24000).astype(np.float32)
        y = resample_np(x, 24000, 16000)
        assert len(y) == 16000

    def test_sine_preserved(self):
        # a 440 Hz tone must stay a 440 Hz tone through 24k -> 16k
        sr_in, sr_out, f0 = 24000, 16000, 440.0
        t_in = np.arange(sr_in) / sr_in
        x = np.sin(2 * np.pi * f0 * t_in).astype(np.float32)
        y = resample_np(x, sr_in, sr_out)
        t_out = np.arange(len(y)) / sr_out
        ref = np.sin(2 * np.pi * f0 * t_out)
        # ignore filter edges
        sl = slice(200, -200)
        err = np.abs(y[sl] - ref[sl]).max()
        assert err < 5e-3

    def test_upsample(self, rng):
        x = rng.standard_normal(8000).astype(np.float32)
        y = resample_np(x, 8000, 16000)
        assert len(y) == 16000

    def test_jax_matches_numpy(self, rng):
        from speech_intent_recognizer_tpu.ops.resample import resample_jax

        x = rng.standard_normal(24000).astype(np.float32)
        y_np = resample_np(x, 24000, 16000)
        y_jx = np.asarray(resample_jax(x, 24000, 16000))
        np.testing.assert_allclose(y_jx, y_np, rtol=1e-4, atol=1e-5)


class TestManifest:
    def test_action_object_label_synthesis(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("path,action,object,location\n"
                     "a.wav,increase,volume,none\n"
                     "b.wav,bring,shoes,kitchen\n")
        m = read_manifest(str(p), resolve_paths=False)
        assert m.labels == ["increase_volume", "bring_shoes"]
        assert "location" in m.extras

    def test_column_aliases(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("file_path,intent\nx.wav,play_music\n")
        m = read_manifest(str(p), resolve_paths=False)
        assert m.paths == ["x.wav"]
        assert m.labels == ["play_music"]

    def test_reference_details_csv(self, reference_mic_dir):
        m = read_manifest(os.path.join(reference_mic_dir, "details.csv"),
                          resolve_paths=False)
        assert len(m) == 95
        assert "decrease_volume" in m.labels

    def test_label_map_roundtrip(self, tmp_path):
        lm = create_label_map(["b", "a", "b", "c"])
        assert lm == {"a": 0, "b": 1, "c": 2}
        p = str(tmp_path / "lm.json")
        save_label_map(lm, p)
        assert load_label_map(p) == lm
        assert invert_label_map(lm)[1] == "b"

    def test_manifest_write_roundtrip(self, tmp_path):
        p = tmp_path / "m.csv"
        p.write_text("path,label\nx.wav,play\ny.wav,stop\n")
        m = read_manifest(str(p), resolve_paths=False)
        out = str(tmp_path / "out.csv")
        m.write_csv(out)
        m2 = read_manifest(out, resolve_paths=False)
        assert m2.paths == m.paths and m2.labels == m.labels
