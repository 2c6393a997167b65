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
