"""Edge-case behavior: very short audio, single-frame normalization,
empty-ish streams, tiny batches."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.ops import frontend_numpy as golden
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    log_mel_frontend, make_frontend_params)


class TestShortAudio:
    def test_sub_second_audio(self, rng):
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        n = 1500  # < n_fft pad region but > 2 frames worth
        x = rng.standard_normal(n).astype(np.float32) * 0.1
        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = x
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([n], np.int32), params))[0]
        ref = golden.pad_or_trim_np(golden.log_mel_spectrogram_np(x), 200)
        np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)

    def test_single_frame_audio(self, rng):
        """length < hop -> exactly one frame; normalization must not blow up."""
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        n = 400
        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = rng.standard_normal(n).astype(np.float32) * 0.1
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([n], np.int32), params))[0]
        assert np.isfinite(out).all()
        assert (np.abs(out[:, 1:]) == 0).all()  # only frame 0 is valid

    def test_silence_input(self):
        """All-zero audio: power clamps at amin; normalized output finite."""
        cfg = AudioConfig()
        params = make_frontend_params(cfg)
        buf = np.zeros((1, cfg.max_samples), np.float32)
        out = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([16000], np.int32), params))[0]
        assert np.isfinite(out).all()


class TestStreamingEdges:
    def test_flush_without_speech_returns_none(self):
        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.infer.streaming import (
            StreamingRecognizer)
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=3)
        variables = init_model(model, jax.random.key(0))
        pred = Predictor(model, variables, {"a": 0, "b": 1, "c": 2})
        rec = StreamingRecognizer(pred)
        for _ in range(10):
            assert rec.feed(np.zeros(1024, np.float32)) is None
        assert rec.flush() is None

    def test_tiny_utterance_classifies(self, rng):
        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.infer.streaming import (
            StreamingRecognizer)
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=3)
        variables = init_model(model, jax.random.key(0))
        pred = Predictor(model, variables, {"a": 0, "b": 1, "c": 2})
        rec = StreamingRecognizer(pred, silence_limit=0.2)
        speech = (0.3 * np.sin(2 * np.pi * 300 * np.arange(2048) / 16000)
                  ).astype(np.float32)
        rec.feed(speech[:1024])
        rec.feed(speech[1024:])
        result = rec.flush()
        assert result is not None and np.isfinite(result["confidence"])


class TestTinyTraining:
    def test_batch_larger_than_dataset(self):
        from speech_intent_recognizer_tpu.config.schema import Config
        from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
        from speech_intent_recognizer_tpu.train.loop import Trainer
        from speech_intent_recognizer_tpu.train.state import (
            create_optimizer, create_train_state)

        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal((3, 64, 200)), jnp.float32)
        labels = jnp.asarray([0, 1, 0], jnp.int32)
        cfg = Config.from_dict({"num_labels": 2, "epochs": 1,
                                "batch_size": 16, "lr": 1e-3})
        model = CNNAudioGRU(num_classes=2)
        tx = create_optimizer(lr=1e-3)
        state = create_train_state(model, jax.random.key(0), tx)
        trainer = Trainer(model, cfg, num_classes=2, tx=tx)
        state, result = trainer.fit(state, feats, labels, feats, labels)
        assert np.isfinite(result.history[0]["train_loss"])
