"""AOT serving-export tests: the jax.export artifact must reproduce the
live Predictor bit-for-bit-ish (fp32 noise) at ANY batch size through its
symbolic batch dimension, reload without model code, and accept swapped-in
weights (fine-tune without re-export)."""

import os

import numpy as np
import pytest
import jax

from speech_intent_recognizer_tpu.infer.export import (
    ServingModel, export_predictor)
from speech_intent_recognizer_tpu.infer.predict import Predictor


@pytest.fixture(scope="module")
def predictor():
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        CNNAudioGRU, init_model)

    model = CNNAudioGRU(num_classes=5)
    variables = init_model(model, jax.random.key(0))
    label_map = {f"intent_{i}": i for i in range(5)}
    return Predictor(model, variables, label_map)


@pytest.fixture(scope="module")
def artifact(predictor, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("serving") / "artifact")
    export_predictor(predictor, out)
    return out


class TestExportRoundtrip:
    def test_artifact_files(self, artifact):
        for name in ("program.jaxexp", "variables.msgpack",
                     "label_map.json", "manifest.json"):
            assert os.path.getsize(os.path.join(artifact, name)) > 0

    @pytest.mark.parametrize("b", [1, 3, 16])
    def test_parity_across_batch_sizes(self, predictor, artifact, rng, b):
        srv = ServingModel.load(artifact)
        wf = (rng.standard_normal((b, predictor.audio_cfg.max_samples))
              * 0.1).astype(np.float32)
        ln = rng.integers(16000, predictor.audio_cfg.max_samples,
                          b).astype(np.int32)
        ref = predictor.predict_waveform_batch(wf, ln)
        got = srv.predict_waveform_batch(wf, ln)
        assert got.shape == (b, 5)
        np.testing.assert_allclose(ref, got, rtol=2e-4, atol=2e-5)

    def test_label_map_survives(self, predictor, artifact):
        srv = ServingModel.load(artifact)
        assert srv.label_map == predictor.label_map
        assert srv.inv_label_map[3] == "intent_3"

    def test_swapped_weights_take_effect(self, predictor, artifact, rng,
                                         tmp_path):
        """Drop a different checkpoint's msgpack into the artifact — the
        program must serve the NEW weights (they are call inputs, not
        baked constants)."""
        import shutil

        from flax import serialization

        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        other = init_model(CNNAudioGRU(num_classes=5), jax.random.key(7))
        clone = str(tmp_path / "artifact2")
        shutil.copytree(artifact, clone)
        with open(os.path.join(clone, "variables.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(other))
        srv = ServingModel.load(clone)
        wf = (rng.standard_normal((2, predictor.audio_cfg.max_samples))
              * 0.1).astype(np.float32)
        ln = np.array([30000, 50000], np.int32)
        base = ServingModel.load(artifact).predict_waveform_batch(wf, ln)
        swapped = srv.predict_waveform_batch(wf, ln)
        assert np.abs(base - swapped).max() > 1e-4

    def test_streaming_artifact_matches_live_recognizer(self, predictor,
                                                        tmp_path):
        """The exported streaming-finalize artifact
        (``export_streaming`` + ``StreamingArtifactPredictor``) must
        reproduce the live StreamingRecognizer's end-of-utterance result
        on an identical replayed stream, with no model code in the loop."""
        from speech_intent_recognizer_tpu.infer.export import (
            StreamingArtifactPredictor, export_streaming)
        from speech_intent_recognizer_tpu.infer.streaming import (
            StreamingRecognizer)

        out = str(tmp_path / "stream_artifact")
        export_streaming(predictor, out, platforms=["cpu"])
        sp = StreamingArtifactPredictor.load(out)
        assert sp.audio_cfg.max_samples == predictor.audio_cfg.max_samples

        rng = np.random.default_rng(3)
        sr, chunk = 16000, 1024
        t = np.arange(int(1.2 * sr)) / sr
        stream = np.concatenate([
            (0.3 * np.sin(2 * np.pi * 250 * t)
             + 0.02 * rng.standard_normal(t.size)).astype(np.float32),
            np.zeros(int(0.8 * sr), np.float32)])

        results = []
        for rec_pred in (predictor, sp):
            rec = StreamingRecognizer(rec_pred, chunk_size=chunk,
                                      threshold=0.01, silence_limit=0.5)
            r = None
            for i in range(0, len(stream) - chunk, chunk):
                r = r or rec.feed(stream[i : i + chunk])
            results.append(r or rec.flush())
        live, aot = results
        assert live is not None and aot is not None
        assert aot["predicted_label"] == live["predicted_label"]
        np.testing.assert_allclose(aot["confidence"], live["confidence"],
                                   rtol=2e-4, atol=2e-5)

    def test_rejects_unknown_format(self, artifact, tmp_path):
        import json
        import shutil

        clone = str(tmp_path / "bad")
        shutil.copytree(artifact, clone)
        with open(os.path.join(clone, "manifest.json"), "w") as f:
            json.dump({"format": "something_else"}, f)
        with pytest.raises(ValueError, match="unrecognized artifact"):
            ServingModel.load(clone)

    def test_short_buffer_padded(self, artifact, rng):
        srv = ServingModel.load(artifact)
        wf = (rng.standard_normal((2, 16000)) * 0.1).astype(np.float32)
        out = srv.predict_waveform_batch(wf, np.array([16000, 9000]))
        assert out.shape == (2, 5)
        np.testing.assert_allclose(out.sum(-1), 1.0, rtol=1e-5)


class TestWav2VecExport:
    def test_wav2vec_roundtrip(self, rng, tmp_path):
        from speech_intent_recognizer_tpu.infer.predict import (
            Wav2VecPredictor)
        from speech_intent_recognizer_tpu.models.wav2vec import (
            create_wav2vec_intent, init_wav2vec, small_wav2vec_config)

        model, _ = create_wav2vec_intent(
            num_classes=4, config=small_wav2vec_config(hidden_size=32,
                                                       num_layers=1))
        variables = init_wav2vec(model, jax.random.key(0),
                                 input_length=4000)
        from speech_intent_recognizer_tpu.config.schema import AudioConfig

        cfg = AudioConfig(max_duration=0.25)  # 4000 samples at 16 kHz
        pred = Wav2VecPredictor(model, variables,
                                {f"i{k}": k for k in range(4)},
                                audio_cfg=cfg)
        out = str(tmp_path / "w2v_artifact")
        export_predictor(pred, out)
        srv = ServingModel.load(out)
        wf = (rng.standard_normal((3, 4000)) * 0.1).astype(np.float32)
        ln = np.array([4000, 2500, 3999], np.int32)
        ref = pred.predict_waveform_batch(wf, ln)
        got = srv.predict_waveform_batch(wf, ln)
        np.testing.assert_allclose(ref, got, rtol=2e-4, atol=2e-5)


class TestProductionFlavor:
    def test_batch_routing_and_chunking(self, predictor, rng, tmp_path,
                                        monkeypatch):
        """The multi-program routing logic (smallest adequate batch,
        chunked oversize requests) must be exercisable off-TPU: fake the
        per-batch programs with the live fused fn pinned at each size."""
        import jax.numpy as jnp

        from speech_intent_recognizer_tpu.infer.export import ServingModel

        fn, variables = predictor._fused_body()
        width = predictor._buffer_width()

        class FakeExported:
            def __init__(self, bs):
                self.bs = bs

            def call(self, v, wf, ln):
                assert wf.shape[0] == self.bs, (wf.shape, self.bs)
                return fn(v, wf, ln)

        srv = ServingModel.__new__(ServingModel)
        ServingModel.__init__(
            srv, {4: FakeExported(4), 16: FakeExported(16)}, variables,
            predictor.label_map,
            {"buffer_width": width, "flavor": "production"})
        for b in (1, 4, 9, 16, 21, 37):
            wf = (rng.standard_normal((b, width)) * 0.1).astype(np.float32)
            ln = rng.integers(16000, predictor.audio_cfg.max_samples,
                              b).astype(np.int32)
            ref = predictor.predict_waveform_batch(wf, ln)
            got = srv.predict_waveform_batch(wf, ln)
            assert got.shape == (b, 5)
            np.testing.assert_allclose(ref, got, rtol=2e-4, atol=2e-5)

    def test_production_export_on_tpu(self):
        """Real Pallas-path export+reload parity; runs on the TPU in a
        fresh subprocess (the suite itself is CPU-pinned), skips cleanly
        when the accelerator is unavailable."""
        import subprocess
        import sys as _sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = {k: v for k, v in os.environ.items()
               if k not in ("JAX_PLATFORMS",)}
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        env["XLA_FLAGS"] = " ".join(flags)
        script = os.path.join(repo, "examples", "export_production.py")
        proc = subprocess.run(
            [_sys.executable, script, "--smoke"],
            env=env, cwd=repo, capture_output=True, text=True, timeout=900)
        if proc.returncode == 3:
            pytest.skip("no TPU available for production export")
        assert proc.returncode == 0, (
            f"production export failed:\n{proc.stdout[-2000:]}\n"
            f"{proc.stderr[-2000:]}")
