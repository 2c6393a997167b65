"""Interop + fault-tolerance tests: PyTorch checkpoint loading end-to-end,
legacy torch feature-cache migration, corrupt-audio handling."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp


class TestTorchCheckpointInterop:
    @pytest.fixture(scope="class")
    def torch_ckpt(self, tmp_path_factory):
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_model import _make_torch_reference

        torch.manual_seed(1)
        ref = _make_torch_reference(num_classes=19).eval()
        path = str(tmp_path_factory.mktemp("ckpt") / "best_model.pt")
        torch.save(ref.state_dict(), path)
        return path, ref

    def test_predictor_from_pt(self, torch_ckpt, tmp_path, rng):
        import json

        torch = pytest.importorskip("torch")
        from speech_intent_recognizer_tpu.infer.predict import Predictor

        path, ref = torch_ckpt
        lm_path = str(tmp_path / "lm.json")
        with open(lm_path, "w") as f:
            json.dump({f"intent_{i}": i for i in range(19)}, f)
        pred = Predictor.from_checkpoint(path, lm_path)
        assert pred.model.num_classes == 19  # inferred from fc head

        # feature-level forward must match the torch model
        feats = rng.standard_normal((2, 64, 200)).astype(np.float32)
        got = np.asarray(pred.model.apply(pred.variables,
                                          jnp.asarray(feats), train=False))
        with torch.no_grad():
            want = ref(torch.from_numpy(feats)).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_wrapped_state_dict(self, torch_ckpt, tmp_path):
        """The historical {'model_state_dict': ...} wrapper
        (reference test_tts_samples.py:40-43) loads too."""
        torch = pytest.importorskip("torch")
        from speech_intent_recognizer_tpu.convert.torch_import import (
            convert_torch_checkpoint)

        path, ref = torch_ckpt
        wrapped = str(tmp_path / "latest_checkpoint.pt")
        torch.save({"model_state_dict": ref.state_dict(), "epoch": 7}, wrapped)
        kwargs, variables = convert_torch_checkpoint(wrapped)
        assert kwargs["num_classes"] == 19
        assert "conv1" in variables["params"]


class TestTorchExport:
    def test_roundtrip_flax_torch_flax(self, rng, tmp_path):
        """Flax -> .pt -> Flax preserves logits exactly, and the exported
        dict matches the reference layer naming."""
        pytest.importorskip("torch")
        from speech_intent_recognizer_tpu.convert.torch_export import (
            save_torch_checkpoint)
        from speech_intent_recognizer_tpu.convert.torch_import import (
            convert_torch_checkpoint)
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=19)
        variables = init_model(model, jax.random.key(3))
        path = str(tmp_path / "export.pt")
        save_torch_checkpoint(path, variables["params"],
                              variables["batch_stats"])

        kwargs, restored = convert_torch_checkpoint(path)
        assert kwargs["num_classes"] == 19
        x = jnp.asarray(rng.standard_normal((2, 64, 200)), jnp.float32)
        a = model.apply(variables, x, train=False)
        b = model.apply(restored, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_exported_dict_loads_into_torch_gru_layout(self, tmp_path):
        torch = pytest.importorskip("torch")
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_model import _make_torch_reference

        from speech_intent_recognizer_tpu.convert.torch_export import (
            save_torch_checkpoint)
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=31)
        variables = init_model(model, jax.random.key(4))
        path = str(tmp_path / "e.pt")
        save_torch_checkpoint(path, variables["params"],
                              variables["batch_stats"])
        ref = _make_torch_reference(31)
        state = torch.load(path, weights_only=True)
        ref.load_state_dict(state)  # raises on any key/shape mismatch


class TestLegacyCacheMigration:
    def test_torch_cache_reads(self, tmp_path, rng):
        torch = pytest.importorskip("torch")
        from speech_intent_recognizer_tpu.data.cache import load_torch_cache

        blob = {
            f"/audio/{i}.wav": {
                "features": torch.from_numpy(
                    rng.standard_normal((64, 150)).astype(np.float32)),
                "label": f"class_{i % 3}",
            }
            for i in range(5)
        }
        path = str(tmp_path / "train_data_features.pt")
        torch.save(blob, path)
        lm = {"class_0": 0, "class_1": 1, "class_2": 2}
        feats, labels, paths = load_torch_cache(path, lm, target_length=200)
        assert feats.shape == (5, 64, 200)
        np.testing.assert_array_equal(feats[:, :, 150:], 0.0)  # padded
        assert labels.tolist() == [0, 1, 2, 0, 1]


class TestFaultTolerance:
    def test_preprocess_drops_corrupt_files(self, tmp_path):
        from speech_intent_recognizer_tpu.data.audio_io import save_wav
        from speech_intent_recognizer_tpu.data.preprocess import (
            process_manifest)

        good = str(tmp_path / "good.wav")
        save_wav(good, np.zeros(4000, np.float32), 16000)
        bad = str(tmp_path / "bad.wav")
        with open(bad, "wb") as f:
            f.write(b"this is not audio data at all, not even close!!")
        missing = str(tmp_path / "missing.wav")
        csv_path = tmp_path / "m.csv"
        csv_path.write_text("path,label\n"
                            f"{good},play\n{bad},play\n{missing},stop\n")
        m = process_manifest(str(csv_path), validate=True, progress=False)
        assert m.paths == [good]

    def test_int16_wire_matches_float32_wire(self, rng, tmp_path):
        """PCM16 sources: int16-staged features == float32-staged, bit
        for bit (the staging default halves wire bytes for free)."""
        from speech_intent_recognizer_tpu.data.cache import (
            load_cache, precompute_features, save_cache)
        from speech_intent_recognizer_tpu.data.manifest import Manifest
        from speech_intent_recognizer_tpu.data.audio_io import save_wav
        from speech_intent_recognizer_tpu.config.schema import AudioConfig

        paths, labels = [], []
        for i in range(5):
            p = str(tmp_path / f"u{i}.wav")
            n = 4000 + 2500 * i
            save_wav(p, (0.3 * np.sin(np.arange(n) / (3.0 + i))
                         ).astype(np.float32), 16000)
            paths.append(p)
            labels.append("ab"[i % 2])
        m = Manifest(paths=paths, labels=labels)
        lm = {"a": 0, "b": 1}
        cfg = AudioConfig()
        f_i16, l_i16, ok_i16, _ = precompute_features(
            m, lm, cfg, batch_size=2, progress=False, wire_dtype="int16",
            fetch_dtype="float32")
        f_f32, l_f32, ok_f32, _ = precompute_features(
            m, lm, cfg, batch_size=2, progress=False, wire_dtype="float32",
            fetch_dtype="float32")
        f_pk, _, ok_pk, _ = precompute_features(
            m, lm, cfg, batch_size=2, progress=False,
            wire_dtype="int16_packed", fetch_dtype="float32")
        # default quantized readback (per-utterance int16 scale): half the
        # return wire bytes, error an order of magnitude under the fused-
        # kernel torch-parity gate (2e-3)
        f_q, _, ok_q, _ = precompute_features(
            m, lm, cfg, batch_size=2, progress=False,
            wire_dtype="int16_packed")
        assert ok_q.all()
        assert f_q.dtype == np.float32
        np.testing.assert_allclose(f_q, f_pk, atol=2.5e-4)
        assert np.max(np.abs(f_q - f_pk)) > 0  # it IS quantized
        assert ok_i16.all() and ok_f32.all() and ok_pk.all()
        np.testing.assert_array_equal(f_i16, f_f32)
        # packed unpack is value-exact, but fusing the gather into the
        # frontend shifts XLA f32 rounding at the ~5e-7 level
        np.testing.assert_allclose(f_pk, f_i16, atol=2e-6)
        np.testing.assert_array_equal(l_i16, l_f32)

        # features_out memmap streaming: same values, and the cache built
        # by zip-storing the backing .npy loads identically
        out_npy = str(tmp_path / "feats.npy")
        f_mm, l_mm, ok_mm, ps = precompute_features(
            m, lm, cfg, batch_size=2, progress=False, wire_dtype="int16",
            fetch_dtype="float32", features_out=out_npy)
        assert isinstance(f_mm, np.memmap)
        np.testing.assert_array_equal(np.asarray(f_mm), f_i16)
        cache_p = str(tmp_path / "c_features.npz")
        save_cache(cache_p, f_mm, l_mm, ps, lm, cfg)
        feats2, labels2, meta = load_cache(cache_p)
        np.testing.assert_array_equal(feats2, f_i16)
        np.testing.assert_array_equal(labels2, l_i16)
        assert meta["num_items"] == 5

    def test_cache_zero_fallback_for_bad_audio(self, tmp_path):
        from speech_intent_recognizer_tpu.data.cache import (
            precompute_features)
        from speech_intent_recognizer_tpu.data.manifest import Manifest
        from speech_intent_recognizer_tpu.data.audio_io import save_wav
        from speech_intent_recognizer_tpu.config.schema import AudioConfig

        good = str(tmp_path / "g.wav")
        save_wav(good, 0.1 * np.sin(np.arange(8000) / 5).astype(np.float32),
                 16000)
        m = Manifest(paths=[good, str(tmp_path / "nope.wav")],
                     labels=["a", "b"])
        feats, labels, ok, _ = precompute_features(
            m, {"a": 0, "b": 1}, AudioConfig(), batch_size=2, progress=False)
        assert ok.tolist() == [True, False]
        np.testing.assert_array_equal(feats[1], 0.0)
        assert np.abs(feats[0]).max() > 0
