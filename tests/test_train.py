"""Training engine tests: the whole-epoch scan learns a separable toy
problem, early stopping triggers, checkpoints roundtrip, and the same loop
runs data-parallel on a virtual 8-device mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import Config
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.train.loop import (
    Trainer, pad_permutation, sequential_batches)
from speech_intent_recognizer_tpu.train.state import (
    create_optimizer, create_train_state)


def _toy_data(rng, n=48, num_classes=4, n_mels=64, t=200):
    """Class-separable synthetic 'mel' patterns."""
    labels = np.arange(n) % num_classes
    feats = rng.standard_normal((n, n_mels, t)).astype(np.float32) * 0.1
    for i, c in enumerate(labels):
        feats[i, c * 8 : (c + 1) * 8, :] += 2.0  # class-specific band
    return feats, labels.astype(np.int32)


def _mk_config(**train_kw):
    raw = {"num_labels": 4, "epochs": 3, "batch_size": 8, "lr": 2e-3,
           "weight_decay": 1e-4, "early_stop_patience": 5,
           "augment_prob": 0.5}
    raw.update(train_kw)
    return Config.from_dict(raw)


class TestBatching:
    def test_pad_permutation_covers_everything_once(self):
        idx, w = pad_permutation(jax.random.key(0), n=10, batch_size=4)
        idx, w = np.asarray(idx), np.asarray(w)
        assert idx.shape == (3, 4) and w.shape == (3, 4)
        real = idx.reshape(-1)[w.reshape(-1) > 0]
        assert sorted(real.tolist()) == list(range(10))
        assert w.sum() == 10

    def test_sequential_batches(self):
        idx, w = sequential_batches(5, 2)
        assert np.asarray(w).sum() == 5
        assert np.asarray(idx).shape == (3, 2)


class TestTrainer:
    @pytest.fixture(scope="class")
    def trained(self):
        rng = np.random.default_rng(0)
        feats, labels = _toy_data(rng)
        cfg = _mk_config()
        model = CNNAudioGRU(num_classes=4)
        tx = create_optimizer(lr=cfg.train.lr,
                              weight_decay=cfg.train.weight_decay,
                              grad_clip=cfg.train.grad_clip)
        state = create_train_state(model, jax.random.key(0), tx)
        trainer = Trainer(model, cfg, num_classes=4)
        state, result = trainer.fit(
            state, jnp.asarray(feats), jnp.asarray(labels),
            jnp.asarray(feats), jnp.asarray(labels))
        return trainer, state, result

    def test_loss_decreases_and_learns(self, trained):
        _, _, result = trained
        assert len(result.history) == 3
        assert result.history[-1]["train_loss"] < result.history[0]["train_loss"]
        assert result.best_val_acc > 0.5  # separable toy -> should overfit

    def test_best_variables_exported(self, trained):
        trainer, state, result = trained
        assert result.best_variables is not None
        assert "params" in result.best_variables

    def test_eval_accuracy_matches_manual(self, trained):
        trainer, state, result = trained
        rng = np.random.default_rng(0)
        feats, labels = _toy_data(rng)
        m = trainer.evaluate(state, jnp.asarray(feats), jnp.asarray(labels))
        model = trainer.model
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(feats), train=False)
        manual = float((np.argmax(np.asarray(logits), -1) == labels).mean())
        assert abs(m["acc"] - manual) < 1e-6


class TestWaveformResident:
    """Waveform-resident training (``data.train_on_waveforms``): int16
    waveforms in HBM, featurization inside the jitted step."""

    def _toy_waves(self, rng, n=24, num_classes=3, sr=16000, max_s=80000):
        """Class-separable tones, variable lengths, int16 wire format."""
        labels = (np.arange(n) % num_classes).astype(np.int32)
        waves = np.zeros((n, max_s), np.int16)
        lengths = np.zeros(n, np.int32)
        for i, c in enumerate(labels):
            m = int(sr * (1.0 + 0.2 * (i % 5)))
            t = np.arange(m, dtype=np.float32) / sr
            x = 0.4 * np.sin(2 * np.pi * (300.0 + 400.0 * c) * t)
            x += 0.02 * rng.standard_normal(m).astype(np.float32)
            waves[i, :m] = np.clip(np.round(x * 32768.0), -32768,
                                   32767).astype(np.int16)
            lengths[i] = m
        return waves, lengths, labels

    def _featurize_host(self, waves, lengths):
        from speech_intent_recognizer_tpu.config.schema import AudioConfig
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        params = make_frontend_params(AudioConfig())
        x = waves.astype(np.float32) / 32768.0
        return np.asarray(log_mel_frontend(
            jnp.asarray(x), jnp.asarray(np.maximum(lengths, 1)), params,
            backend="xla"))

    def test_in_step_featurization_is_exact_at_batch_shape(self):
        """The seam contract: featurizing a gathered batch inside the step
        is BIT-IDENTICAL to running the frontend on those rows standalone
        at the same shape.  (Across different batch shapes XLA's reduction
        tiling legitimately reorders f32 sums at the ~1e-7 level, so
        whole-training comparison below is close-not-exact.)"""
        from speech_intent_recognizer_tpu.config.schema import AudioConfig
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend, make_frontend_params)

        rng = np.random.default_rng(3)
        waves, lengths, labels = self._toy_waves(rng, n=8)
        params = make_frontend_params(AudioConfig())
        idx = np.array([5, 1, 6, 2], np.int32)

        @jax.jit
        def in_step(w_i16, ln, ix):
            x = w_i16[ix].astype(jnp.float32) * (1.0 / 32768.0)
            return log_mel_frontend(x, jnp.maximum(ln[ix], 1), params,
                                    backend="xla")

        got = np.asarray(in_step(jnp.asarray(waves), jnp.asarray(lengths),
                                 jnp.asarray(idx)))
        want = np.asarray(log_mel_frontend(
            jnp.asarray(waves[idx].astype(np.float32) / 32768.0),
            jnp.asarray(np.maximum(lengths[idx], 1)), params,
            backend="xla"))
        np.testing.assert_array_equal(got, want)

    def test_matches_feature_cached_when_augment_off(self):
        """With augmentation off, waveform-resident training tracks
        feature-cached training on the same corpus: same accuracies, losses
        within float-noise-amplified tolerance (features match to ~1e-7
        across batch shapes; Adam's sqrt(v) normalization amplifies that
        over steps, so the loss bar is rtol=2e-2, not exact)."""
        rng = np.random.default_rng(3)
        waves, lengths, labels = self._toy_waves(rng)
        feats = self._featurize_host(waves, lengths)
        cfg = _mk_config(num_labels=3, epochs=2, use_augmentation=False,
                         use_mixup=False, dropout=0.0)
        results = {}
        for mode in ("features", "waveforms"):
            model = CNNAudioGRU(num_classes=3, dropout=0.0)
            tx = create_optimizer(lr=cfg.train.lr,
                                  weight_decay=cfg.train.weight_decay,
                                  grad_clip=cfg.train.grad_clip)
            state = create_train_state(model, jax.random.key(0), tx)
            if mode == "waveforms":
                tr = Trainer(model, cfg, tx=tx, num_classes=3,
                             from_waveforms=True)
                state, res = tr.fit(state, jnp.asarray(waves),
                                    jnp.asarray(labels),
                                    jnp.asarray(waves), jnp.asarray(labels),
                                    log=lambda m: None,
                                    train_lengths=jnp.asarray(lengths),
                                    val_lengths=jnp.asarray(lengths))
            else:
                tr = Trainer(model, cfg, tx=tx, num_classes=3)
                state, res = tr.fit(state, jnp.asarray(feats),
                                    jnp.asarray(labels),
                                    jnp.asarray(feats), jnp.asarray(labels),
                                    log=lambda m: None)
            results[mode] = res
        hf, hw = results["features"], results["waveforms"]
        for ef, ew in zip(hf.history, hw.history):
            np.testing.assert_allclose(ef["train_loss"], ew["train_loss"],
                                       rtol=2e-2)
            np.testing.assert_allclose(ef["val_loss"], ew["val_loss"],
                                       rtol=2e-2)
            assert ef["train_acc"] == ew["train_acc"]
            assert ef["val_acc"] == ew["val_acc"]

    def test_waveform_augment_trains_and_learns(self):
        """The previously-unwirable capability, live: waveform augs on
        device inside the step; the toy problem still learns."""
        rng = np.random.default_rng(4)
        waves, lengths, labels = self._toy_waves(rng, n=30)
        cfg = _mk_config(num_labels=3, epochs=4, use_augmentation=True,
                         use_waveform_augment=True, augment_prob=0.7)
        model = CNNAudioGRU(num_classes=3)
        tx = create_optimizer(lr=cfg.train.lr,
                              weight_decay=cfg.train.weight_decay,
                              grad_clip=cfg.train.grad_clip)
        state = create_train_state(model, jax.random.key(1), tx)
        tr = Trainer(model, cfg, tx=tx, num_classes=3, from_waveforms=True)
        state, res = tr.fit(state, jnp.asarray(waves), jnp.asarray(labels),
                            jnp.asarray(waves), jnp.asarray(labels),
                            log=lambda m: None,
                            train_lengths=jnp.asarray(lengths),
                            val_lengths=jnp.asarray(lengths))
        assert res.history[-1]["train_loss"] < res.history[0]["train_loss"]
        assert res.best_val_acc > 0.5  # 3 tone classes: way above chance

    def test_waveform_cache_roundtrip(self, tmp_path):
        from speech_intent_recognizer_tpu.data.cache import (
            load_waveform_cache, precompute_waveforms, save_waveform_cache)
        from speech_intent_recognizer_tpu.data.manifest import Manifest
        from speech_intent_recognizer_tpu.data.audio_io import save_wav
        from speech_intent_recognizer_tpu.config.schema import AudioConfig

        rng = np.random.default_rng(5)
        paths, labels = [], []
        for i in range(4):
            p = str(tmp_path / f"w{i}.wav")
            save_wav(p, (0.2 * rng.standard_normal(9000 + 1000 * i)
                         ).astype(np.float32), 16000)
            paths.append(p)
            labels.append("ab"[i % 2])
        m = Manifest(paths=paths, labels=labels)
        lm = {"a": 0, "b": 1}
        out_npy = str(tmp_path / "waves.npy")
        waves, lengths, labs, ok, ps = precompute_waveforms(
            m, lm, AudioConfig(), progress=False, waves_out=out_npy)
        assert isinstance(waves, np.memmap) and waves.dtype == np.int16
        assert ok.all() and lengths.tolist() == [9000, 10000, 11000, 12000]
        cache_p = str(tmp_path / "w_waveforms.npz")
        save_waveform_cache(cache_p, waves, lengths, labs, ps, lm,
                            AudioConfig())
        w2, l2, lab2, meta = load_waveform_cache(cache_p)
        np.testing.assert_array_equal(w2, np.asarray(waves))
        np.testing.assert_array_equal(l2, lengths)
        np.testing.assert_array_equal(lab2, labs)
        assert meta["kind"] == "waveforms_int16"


class TestEarlyStopping:
    def test_stops_on_plateau(self):
        rng = np.random.default_rng(1)
        feats, labels = _toy_data(rng, n=16)
        # lr=0 -> no learning -> accuracy never improves after epoch 1
        cfg = _mk_config(epochs=10, lr=1e-12, early_stop_patience=2)
        model = CNNAudioGRU(num_classes=4)
        tx = create_optimizer(lr=1e-12, weight_decay=0.0, grad_clip=None)
        state = create_train_state(model, jax.random.key(0), tx)
        trainer = Trainer(model, cfg, num_classes=4, tx=tx)
        _, result = trainer.fit(state, jnp.asarray(feats), jnp.asarray(labels),
                                jnp.asarray(feats), jnp.asarray(labels))
        assert result.stopped_early
        assert result.epochs_run <= 4


class TestCheckpoint:
    def test_best_model_roundtrip(self, tmp_path):
        from speech_intent_recognizer_tpu.train.checkpoint import (
            Checkpointer, load_model_checkpoint)

        model = CNNAudioGRU(num_classes=4)
        tx = create_optimizer()
        state = create_train_state(model, jax.random.key(0), tx)
        ckpt = Checkpointer(str(tmp_path), use_orbax=False)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        path = ckpt.save_best(variables, 0.9, 1)
        restored = load_model_checkpoint(path, template=jax.device_get(variables))
        x = jnp.zeros((1, 64, 200))
        a = model.apply(variables, x, train=False)
        b = model.apply(restored, x, train=False)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_orbax_resume_roundtrip(self, tmp_path):
        from speech_intent_recognizer_tpu.train.checkpoint import Checkpointer

        model = CNNAudioGRU(num_classes=4)
        tx = create_optimizer()
        state = create_train_state(model, jax.random.key(0), tx)
        ckpt = Checkpointer(str(tmp_path), use_orbax=True)
        if ckpt._manager is None:
            pytest.skip("orbax unavailable")
        ckpt.save_state(state, epoch=2, best_val_acc=0.75, no_improve=1)
        fresh = create_train_state(model, jax.random.key(7), tx)
        out = ckpt.restore_state(fresh)
        assert out is not None
        restored, book = out
        assert book == {"epoch": 2, "best_val_acc": 0.75, "no_improve": 1}
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(restored.params)[0]),
            np.asarray(jax.tree.leaves(state.params)[0]))


class TestMeshTraining:
    def test_sharded_checkpoint_roundtrip_dp8(self, tmp_path):
        """Save a dp8 mesh-placed train state, restore it, and assert the
        NEXT epoch is bit-equal to the uninterrupted run — the distributed
        seam the single-device roundtrip (TestCheckpoint) can't cover."""
        from speech_intent_recognizer_tpu.data.pipeline import DeviceDataset
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh
        from speech_intent_recognizer_tpu.parallel.sharding import (
            place_params)
        from speech_intent_recognizer_tpu.train.checkpoint import Checkpointer
        from speech_intent_recognizer_tpu.train.loop import pad_permutation

        rng = np.random.default_rng(9)
        feats, labels = _toy_data(rng, n=16)
        cfg = _mk_config(epochs=1, batch_size=8, augment_prob=0.0,
                         use_augmentation=False)
        mesh = create_mesh()
        model = CNNAudioGRU(num_classes=4, dropout=0.0)
        tx = create_optimizer(lr=cfg.train.lr,
                              weight_decay=cfg.train.weight_decay,
                              grad_clip=cfg.train.grad_clip)
        state = create_train_state(model, jax.random.key(0), tx)
        state = state.replace(
            params=place_params(mesh, state.params),
            batch_stats=place_params(mesh, state.batch_stats))
        trainer = Trainer(model, cfg, mesh=mesh, num_classes=4, tx=tx)
        epoch_fn = trainer._build_epoch_fn()
        ds = DeviceDataset.from_arrays(feats, labels, mesh)
        perm, w = pad_permutation(jax.random.key(1), 16, 8)

        # epoch 1, then checkpoint the sharded state
        state, _ = epoch_fn(state, ds.features, ds.labels, perm, w,
                            jax.random.key(2))
        ckpt = Checkpointer(str(tmp_path), use_orbax=True)
        if ckpt._manager is None:
            pytest.skip("orbax unavailable")
        ckpt.save_state(state, epoch=1, best_val_acc=0.5, no_improve=0)

        # uninterrupted epoch 2 (donate_argnums invalidates `state`; keep a
        # host copy for the comparison AND a template for restore)
        host_state = jax.device_get(state)
        state2, m_uninterrupted = epoch_fn(state, ds.features, ds.labels,
                                           perm, w, jax.random.key(3))
        final_uninterrupted = jax.device_get(state2.params)

        # restore into a FRESH mesh-placed template, run the same epoch 2
        fresh = create_train_state(model, jax.random.key(99), tx)
        fresh = fresh.replace(
            params=place_params(mesh, fresh.params),
            batch_stats=place_params(mesh, fresh.batch_stats),
            opt_state=jax.device_put(host_state.opt_state),
            step=jax.device_put(host_state.step))
        out = ckpt.restore_state(fresh)
        assert out is not None
        restored, book = out
        assert book["epoch"] == 1
        restored = restored.replace(
            params=place_params(mesh, restored.params),
            batch_stats=place_params(mesh, restored.batch_stats))
        state3, m_resumed = epoch_fn(restored, ds.features, ds.labels,
                                     perm, w, jax.random.key(3))
        assert float(m_uninterrupted["loss"]) == float(m_resumed["loss"])
        for a, b in zip(jax.tree.leaves(final_uninterrupted),
                        jax.tree.leaves(jax.device_get(state3.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.slow
    def test_mesh_and_single_device_train_identically(self):
        """SPMD correctness: the 8-way data-parallel epoch must produce the
        SAME metrics as the single-device epoch (jit-with-shardings computes
        the global batch semantically — incl. global BatchNorm stats)."""
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh
        from speech_intent_recognizer_tpu.data.pipeline import DeviceDataset

        rng = np.random.default_rng(3)
        feats, labels = _toy_data(rng, n=32)
        cfg = _mk_config(epochs=1, batch_size=16, augment_prob=0.0)
        from speech_intent_recognizer_tpu.parallel.sharding import (
            place_params)

        results = {}
        meshes = (("single", None), ("dp8", create_mesh()),
                  ("dp4_tp2", create_mesh(model_axis=2)))
        for name, mesh in meshes:
            model = CNNAudioGRU(num_classes=4)
            tx = create_optimizer(lr=cfg.train.lr,
                                  weight_decay=cfg.train.weight_decay,
                                  grad_clip=cfg.train.grad_clip)
            state = create_train_state(model, jax.random.key(0), tx)
            if mesh is not None:
                state = state.replace(
                    params=place_params(mesh, state.params),
                    batch_stats=place_params(mesh, state.batch_stats))
            trainer = Trainer(model, cfg, mesh=mesh, num_classes=4, tx=tx)
            ds = DeviceDataset.from_arrays(feats, labels, mesh)
            _, result = trainer.fit(state, ds.features, ds.labels,
                                    ds.features, ds.labels)
            results[name] = result.history[0]
        # sharded execution changes float reduction order slightly (~1e-5
        # relative); the assertion is semantic identity, not bit equality
        for name, rtol in (("dp8", 5e-4), ("dp4_tp2", 5e-4)):
            np.testing.assert_allclose(results["single"]["train_loss"],
                                       results[name]["train_loss"],
                                       rtol=rtol, err_msg=name)
            np.testing.assert_allclose(results["single"]["val_acc"],
                                       results[name]["val_acc"], atol=1e-6,
                                       err_msg=name)

    def test_data_parallel_on_8_virtual_devices(self):
        from speech_intent_recognizer_tpu.parallel.mesh import create_mesh
        from speech_intent_recognizer_tpu.parallel.sharding import place_params

        assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
        mesh = create_mesh()
        rng = np.random.default_rng(0)
        feats, labels = _toy_data(rng, n=32)
        cfg = _mk_config(epochs=1, batch_size=16)
        model = CNNAudioGRU(num_classes=4)
        tx = create_optimizer(lr=cfg.train.lr)
        state = create_train_state(model, jax.random.key(0), tx)
        state = state.replace(
            params=place_params(mesh, state.params),
            batch_stats=place_params(mesh, state.batch_stats),
            opt_state=jax.device_put(state.opt_state))
        trainer = Trainer(model, cfg, mesh=mesh, num_classes=4, tx=tx)
        from speech_intent_recognizer_tpu.data.pipeline import DeviceDataset

        ds = DeviceDataset.from_arrays(feats, labels, mesh)
        state, result = trainer.fit(state, ds.features, ds.labels,
                                    ds.features, ds.labels)
        assert np.isfinite(result.history[0]["train_loss"])
        assert result.history[0]["val_acc"] >= 0.0
