"""Inference tests: VAD segmentation, streaming front-end parity with the
offline front-end, predictor end-to-end on real audio, partial hypotheses."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.infer.streaming import (
    StreamingFeaturizer, StreamingRecognizer)
from speech_intent_recognizer_tpu.infer.vad import EnergyVAD, VADSegmenter


def _speech_like(rng, n, amp=0.2):
    return (amp * np.sin(2 * np.pi * 300 * np.arange(n) / 16000)
            + 0.02 * rng.standard_normal(n)).astype(np.float32)


class TestVAD:
    def test_energy_threshold(self, rng):
        vad = EnergyVAD(threshold=0.01)
        assert vad.is_speech(_speech_like(rng, 1024))
        assert not vad.is_speech(np.zeros(1024, np.float32))

    def test_segmenter_detects_utterance(self, rng):
        seg = VADSegmenter(silence_limit=0.5, prior_recording=0.25)
        speech = _speech_like(rng, 16000)  # 1 s of speech
        silence = np.zeros(16000, np.float32)
        stream = np.concatenate([silence[:4096], speech, silence])
        utterances = []
        for i in range(0, len(stream) - 1024, 1024):
            got = seg.feed(stream[i : i + 1024])
            if got is not None:
                utterances.append(got)
        assert len(utterances) == 1
        # captured utterance covers the speech (plus pre-roll and silence tail)
        assert len(utterances[0]) >= 16000

    def test_flush_returns_partial(self, rng):
        seg = VADSegmenter()
        seg.feed(_speech_like(rng, 1024))
        out = seg.flush()
        assert out is not None and len(out) >= 1024


class TestStreamingFeaturizer:
    @pytest.mark.parametrize("n", [5000, 16000, 40001])
    def test_matches_offline_frontend(self, rng, n):
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        cfg = AudioConfig()
        x = _speech_like(rng, n)
        params = make_frontend_params(cfg)
        buf = np.zeros((1, cfg.max_samples), np.float32)
        buf[0, :n] = x
        ref = np.asarray(log_mel_frontend(
            jnp.asarray(buf), jnp.asarray([n], np.int32), params))[0]

        fz = StreamingFeaturizer(audio_cfg=cfg)
        for i in range(0, n, 1024):  # mic-sized chunks
            fz.feed(x[i : i + 1024])
        got = fz.finalize()
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)

    def test_incremental_frame_counts(self, rng):
        cfg = AudioConfig()
        fz = StreamingFeaturizer(audio_cfg=cfg)
        x = _speech_like(rng, 8192)
        done = 0
        for i in range(0, len(x), 1024):
            done = fz.feed(x[i : i + 1024])
        # frames available without the tail pad: (n + pad - n_fft)//hop + 1
        assert done == (8192 + 512 - 1024) // 512 + 1

    def test_partial_features_shape(self, rng):
        cfg = AudioConfig()
        fz = StreamingFeaturizer(audio_cfg=cfg)
        fz.feed(_speech_like(rng, 4096))
        out = fz.partial_features()
        assert out.shape == (64, 200)

    def test_fp64_host_path_matches_golden_tight(self, rng):
        """host_dtype=float64 is the high-precision parity reference; the
        default fp32 host path must stay within the serving tolerance of
        it (fp32 is the production default for host featurization)."""
        from speech_intent_recognizer_tpu.ops.frontend_numpy import (
            log_mel_spectrogram_np, pad_or_trim_np)

        cfg = AudioConfig()
        n = 24000
        x = _speech_like(rng, n)
        golden = pad_or_trim_np(log_mel_spectrogram_np(x),
                                cfg.mel_spec_length)
        outs = {}
        for dt in (np.float64, np.float32):
            fz = StreamingFeaturizer(audio_cfg=cfg, host_dtype=dt)
            for i in range(0, n, 1024):
                fz.feed(x[i : i + 1024])
            outs[dt] = fz.finalize()
        np.testing.assert_allclose(outs[np.float64], golden,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(outs[np.float32], outs[np.float64],
                                   rtol=2e-3, atol=2e-3)

    def test_host_and_device_modes_match(self, rng):
        cfg = AudioConfig()
        x = _speech_like(rng, 20000)
        outs = []
        for mode in ("host", "device"):
            fz = StreamingFeaturizer(audio_cfg=cfg, mode=mode)
            for i in range(0, len(x), 1024):
                fz.feed(x[i : i + 1024])
            outs.append(fz.finalize())
        np.testing.assert_allclose(outs[0], outs[1], rtol=2e-3, atol=2e-3)

    def test_native_mode_matches_host(self, rng):
        """The C++ streaming featurizer (sirdsp_stream_feed/finalize) must
        track the host path frame-for-frame over ragged chunk schedules,
        including partial features mid-stream and the reflect tail."""
        from speech_intent_recognizer_tpu.data import native

        if not native.available():
            pytest.skip("native libsirdsp not built")
        cfg = AudioConfig()
        # chunk-boundary cases: short (< pad), hop-aligned, ragged, capped
        for n in (3, 300, 1537, 8192, 20000, cfg.max_samples + 5000):
            x = _speech_like(rng, n)
            h = StreamingFeaturizer(audio_cfg=cfg, mode="host")
            nv = StreamingFeaturizer(audio_cfg=cfg, mode="native")
            assert nv.mode == "native"
            i = 0
            while i < n:
                c = int(rng.integers(64, 3000))
                dh = h.feed(x[i : i + c])
                dn = nv.feed(x[i : i + c])
                assert dh == dn
                i += c
            np.testing.assert_allclose(nv.partial_features(),
                                       h.partial_features(),
                                       rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(nv.finalize(), h.finalize(),
                                       rtol=1e-4, atol=1e-4)

    def test_native_mode_matches_golden_tight(self, rng):
        """Native features vs the fp64 NumPy golden, within the same bound
        the fp32 host path satisfies."""
        from speech_intent_recognizer_tpu.data import native
        from speech_intent_recognizer_tpu.ops.frontend_numpy import (
            log_mel_spectrogram_np, pad_or_trim_np)

        if not native.available():
            pytest.skip("native libsirdsp not built")
        cfg = AudioConfig()
        n = 24000
        x = _speech_like(rng, n)
        golden = pad_or_trim_np(log_mel_spectrogram_np(x),
                                cfg.mel_spec_length)
        fz = StreamingFeaturizer(audio_cfg=cfg, mode="native")
        for i in range(0, n, 1024):
            fz.feed(x[i : i + 1024])
        np.testing.assert_allclose(fz.finalize(), golden,
                                   rtol=2e-3, atol=2e-3)

    def test_native_reset_reusable(self, rng):
        from speech_intent_recognizer_tpu.data import native

        if not native.available():
            pytest.skip("native libsirdsp not built")
        cfg = AudioConfig()
        x = _speech_like(rng, 9000)
        fz = StreamingFeaturizer(audio_cfg=cfg, mode="native")
        fz.feed(x)
        first = fz.finalize()
        fz.reset()
        fz.feed(x)
        np.testing.assert_array_equal(first, fz.finalize())


class TestStreamingRecognizer:
    @pytest.fixture(scope="class")
    def predictor(self):
        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=4)
        variables = init_model(model, jax.random.key(0))
        label_map = {f"intent_{i}": i for i in range(4)}
        return Predictor(model, variables, label_map)

    def test_end_to_end_utterance(self, predictor, rng):
        rec = StreamingRecognizer(predictor, silence_limit=0.5)
        speech = _speech_like(rng, 16000)
        silence = np.zeros(12000, np.float32)
        stream = np.concatenate([speech, silence])
        result = None
        for i in range(0, len(stream) - 1024, 1024):
            r = rec.feed(stream[i : i + 1024])
            if r is not None:
                result = r
        assert result is not None
        assert result["predicted_label"].startswith("intent_")
        assert 0.0 <= result["confidence"] <= 1.0
        assert len(result["top_predictions"]) == 3

    def test_async_results_mode(self, predictor, rng):
        """async_results returns a PendingResult that resolves to the same
        dict the synchronous mode produces (serving mode: the end-of-speech
        device call is dispatched without blocking the feed loop)."""
        sync = StreamingRecognizer(predictor, silence_limit=0.5)
        asyn = StreamingRecognizer(predictor, silence_limit=0.5,
                                   async_results=True)
        speech = _speech_like(rng, 16000)
        stream = np.concatenate([speech, np.zeros(12000, np.float32)])
        got_sync = got_async = None
        for i in range(0, len(stream) - 1024, 1024):
            chunk = stream[i : i + 1024]
            r1 = sync.feed(chunk)
            r2 = asyn.feed(chunk)
            got_sync = r1 if r1 is not None else got_sync
            got_async = r2 if r2 is not None else got_async
        assert got_sync is not None and got_async is not None
        assert isinstance(got_sync, dict)
        resolved = got_async.get()
        assert resolved["predicted_label"] == got_sync["predicted_label"]
        assert resolved["confidence"] == got_sync["confidence"]
        # dict-like access works without an explicit get()
        assert got_async["predicted_label"] == got_sync["predicted_label"]
        assert got_async.ready()
        # full Mapping protocol: dict.get signature, items/iter/in/dict()
        assert got_async.get("predicted_label") == got_sync["predicted_label"]
        assert got_async.get("no_such_key", 42) == 42
        assert "confidence" in got_async
        assert set(got_async) == set(got_sync)
        assert dict(got_async) == got_sync
        assert dict(got_async.items()) == got_sync
        assert len(got_async) == len(got_sync)
        assert got_async.resolve() is got_async.resolve()

    def test_pending_result_get_all(self, predictor, rng):
        """Batched materialization resolves many pending results in one
        device fetch and matches per-result get()."""
        from speech_intent_recognizer_tpu.infer.streaming import (
            PendingResult)

        speech = _speech_like(rng, 16000)
        stream = np.concatenate([speech, np.zeros(12000, np.float32)])
        pending = []
        for _ in range(3):
            rec = StreamingRecognizer(predictor, silence_limit=0.5,
                                      async_results=True)
            for i in range(0, len(stream) - 1024, 1024):
                r = rec.feed(stream[i : i + 1024])
                if r is not None:
                    pending.append(r)
        assert len(pending) == 3
        resolved = PendingResult.get_all(pending)
        assert len(resolved) == 3
        labels = {d["predicted_label"] for d in resolved}
        assert len(labels) == 1  # identical input -> identical result
        # already-resolved entries pass through unchanged
        again = PendingResult.get_all(pending)
        assert again[0] is resolved[0]

    def test_partial_result_midstream(self, predictor, rng):
        rec = StreamingRecognizer(predictor, silence_limit=1.0)
        speech = _speech_like(rng, 8192)
        for i in range(0, len(speech), 1024):
            rec.feed(speech[i : i + 1024])
        assert rec.recording
        partial = rec.partial_result()
        assert partial is not None
        assert partial["predicted_label"].startswith("intent_")

    def test_streaming_equals_offline_prediction(self, predictor, rng):
        """The streaming path must reproduce the offline predictor exactly
        (fixes the reference's train/serve feature mismatch,
        testing.py:189-217)."""
        n = 20000
        x = _speech_like(rng, n)
        offline = predictor.predict_array(x, 16000)

        rec = StreamingRecognizer(predictor, silence_limit=0.25,
                                  threshold=0.005, prior_recording=0.0)
        stream = np.concatenate([x, np.zeros(8000, np.float32)])
        result = None
        for i in range(0, len(stream) - 1024, 1024):
            r = rec.feed(stream[i : i + 1024])
            if r is not None:
                result = r
                break
        assert result is not None
        assert result["predicted_label"] == offline["predicted_label"]
        # silence tail inside the VAD window shifts features slightly; the
        # decision and confidence must still agree closely
        assert abs(result["confidence"] - offline["confidence"]) < 0.05


class TestPredictorFiles:
    def test_predict_reference_corpus_file(self, reference_mic_dir):
        import os

        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=19)
        variables = init_model(model, jax.random.key(1))
        label_map = {f"l{i}": i for i in range(19)}
        pred = Predictor(model, variables, label_map)
        r = pred.predict_file(os.path.join(
            reference_mic_dir, "005_i need the newspaper.wav"))
        assert r is not None
        assert r["predicted_label"] in label_map
        probs = [p["probability"] for p in r["top_predictions"]]
        assert probs == sorted(probs, reverse=True)


class TestMeshServing:
    """Data-parallel batch inference: shard_map over 'data' must produce the
    SAME probabilities as the single-device fused path (dp serving is the
    §5 'sequence scaling' story at multi-chip scale)."""

    def _predictor(self, mesh):
        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=4)
        variables = init_model(model, jax.random.key(0))
        label_map = {f"intent_{i}": i for i in range(4)}
        return Predictor(model, variables, label_map, mesh=mesh)

    def test_dp8_matches_single_device(self, rng):
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh

        assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
        single = self._predictor(None)
        sharded = self._predictor(create_mesh())
        b = 8
        wf = rng.standard_normal(
            (b, single.audio_cfg.max_samples)).astype(np.float32) * 0.1
        ln = rng.integers(16000, single.audio_cfg.max_samples,
                          b).astype(np.int32)
        ref = single.predict_waveform_batch(wf, ln)
        out = sharded.predict_waveform_batch(wf, ln)
        assert out.shape == ref.shape
        np.testing.assert_allclose(ref, out, rtol=2e-4, atol=2e-5)

    def test_ragged_batch_padded_and_stripped(self, rng):
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh

        sharded = self._predictor(create_mesh())
        b = 5  # not a multiple of dp=8
        wf = rng.standard_normal(
            (b, sharded.audio_cfg.max_samples)).astype(np.float32) * 0.1
        ln = rng.integers(16000, sharded.audio_cfg.max_samples,
                          b).astype(np.int32)
        out = sharded.predict_waveform_batch(wf, ln)
        assert out.shape == (b, 4)
        np.testing.assert_allclose(out.sum(axis=-1), 1.0, rtol=1e-5)

    def test_wav2vec_dp8_matches_single_device(self, rng):
        from speech_intent_recognizer_tpu.config.schema import AudioConfig
        from speech_intent_recognizer_tpu.infer.predict import (
            Wav2VecPredictor)
        from speech_intent_recognizer_tpu.models.wav2vec import (
            create_wav2vec_intent, init_wav2vec, small_wav2vec_config)
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh

        model, _ = create_wav2vec_intent(
            num_classes=4, config=small_wav2vec_config(hidden_size=32,
                                                       num_layers=1))
        variables = init_wav2vec(model, jax.random.key(0), input_length=4000)
        cfg = AudioConfig(max_duration=0.25)
        label_map = {f"i{k}": k for k in range(4)}
        single = Wav2VecPredictor(model, variables, label_map, audio_cfg=cfg)
        sharded = Wav2VecPredictor(model, variables, label_map,
                                   audio_cfg=cfg, mesh=create_mesh())
        b = 11  # ragged vs dp=8
        wf = (rng.standard_normal((b, 4000)) * 0.1).astype(np.float32)
        ln = rng.integers(1000, 4000, b).astype(np.int32)
        ref = single.predict_waveform_batch(wf, ln)
        out = sharded.predict_waveform_batch(wf, ln)
        assert out.shape == ref.shape == (b, 4)
        np.testing.assert_allclose(ref, out, rtol=2e-4, atol=2e-5)


class TestBatchFinalizer:
    """Batched end-of-utterance finalize (one device call for N sessions)
    must reproduce the single-call fused finalize exactly."""

    def _predictor(self):
        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=4)
        variables = init_model(model, jax.random.key(0))
        return Predictor(model, variables,
                         {f"intent_{i}": i for i in range(4)})

    def _utterance(self, seed, n):
        r = np.random.default_rng(seed)
        return (0.2 * np.sin(2 * np.pi * r.uniform(200, 400)
                             * np.arange(n) / 16000)
                + 0.02 * r.standard_normal(n)).astype(np.float32)

    def test_matches_single_call_finalize(self, rng):
        from speech_intent_recognizer_tpu.infer.streaming import (
            BatchFinalizer, PendingResult)

        predictor = self._predictor()
        batcher = BatchFinalizer(predictor, max_batch=16)
        # 3 sessions with different lengths -> bucket pad to 4
        lengths = [16000, 23456, 40001]
        singles, deferred = [], []
        for i, n in enumerate(lengths):
            x = self._utterance(i, n)
            chunks = [x[j : j + 1024] for j in range(0, n, 1024)]
            rec_s = StreamingRecognizer(predictor, silence_limit=10.0)
            rec_b = StreamingRecognizer(predictor, silence_limit=10.0,
                                        async_results=True,
                                        batch_finalizer=batcher)
            for c in chunks:
                rec_s.feed(c)
                rec_b.feed(c)
            singles.append(rec_s.flush())
            r = rec_b.flush()
            assert not r.ready()  # still queued — not dispatched
            deferred.append(r)
        assert batcher.flush() == 3
        got = PendingResult.get_all(deferred)
        for want, have in zip(singles, got):
            assert have["predicted_label"] == want["predicted_label"]
            assert abs(have["confidence"] - want["confidence"]) < 1e-5
            for a, b in zip(want["top_predictions"],
                            have["top_predictions"]):
                assert a["label"] == b["label"]
                assert abs(a["probability"] - b["probability"]) < 1e-5

    def test_lazy_dispatch_on_resolve(self, rng):
        from speech_intent_recognizer_tpu.infer.streaming import (
            BatchFinalizer)

        predictor = self._predictor()
        batcher = BatchFinalizer(predictor)
        x = self._utterance(7, 20000)
        rec = StreamingRecognizer(predictor, silence_limit=10.0,
                                  async_results=True,
                                  batch_finalizer=batcher)
        for j in range(0, len(x), 1024):
            rec.feed(x[j : j + 1024])
        r = rec.flush()
        assert not r.ready()
        out = r.resolve()  # forces the flush
        assert out["predicted_label"] in predictor.label_map
        assert len(batcher._queue) == 0

    def test_max_batch_auto_flush(self, rng):
        from speech_intent_recognizer_tpu.infer.streaming import (
            BatchFinalizer)

        predictor = self._predictor()
        batcher = BatchFinalizer(predictor, max_batch=2)
        recs = []
        for i in range(2):
            rec = StreamingRecognizer(predictor, silence_limit=10.0,
                                      async_results=True,
                                      batch_finalizer=batcher)
            x = self._utterance(i + 20, 16000)
            for j in range(0, len(x), 1024):
                rec.feed(x[j : j + 1024])
            recs.append(rec)
        r1 = recs[0].flush()
        r2 = recs[1].flush()  # hits max_batch=2 -> auto-dispatch
        assert len(batcher._queue) == 0
        assert r1.ready() or r1.resolve()
        assert r2.resolve()["predicted_label"] in predictor.label_map
