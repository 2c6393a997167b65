"""Wav2VecIntent model-family tests (small config; no downloads)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")

from speech_intent_recognizer_tpu.models.wav2vec import (  # noqa: E402
    Wav2VecIntent, create_wav2vec_intent, feature_extractor_mask,
    init_wav2vec, small_wav2vec_config)


@pytest.fixture(scope="module")
def small_model():
    model, _ = create_wav2vec_intent(
        num_classes=5, config=small_wav2vec_config(hidden_size=32,
                                                   num_layers=1))
    variables = init_wav2vec(model, jax.random.key(0), input_length=4000)
    return model, variables


class TestModel:
    def test_forward_shape(self, small_model, rng):
        model, variables = small_model
        x = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        mask = jnp.ones((2, 4000), jnp.int32)
        logits = model.apply(variables, x, mask, train=False)
        assert logits.shape == (2, 5)
        assert np.isfinite(np.asarray(logits)).all()

    def test_freeze_mask_marks_feature_extractor(self, small_model):
        model, variables = small_model
        mask = feature_extractor_mask(variables["params"])
        leaves = jax.tree.leaves(mask)
        assert any(leaves) and not all(leaves)

    def test_attention_mask_affects_output(self, small_model, rng):
        model, variables = small_model
        x = jnp.asarray(rng.standard_normal((1, 4000)), jnp.float32) * 0.1
        full = model.apply(variables, x, jnp.ones((1, 4000), jnp.int32),
                           train=False)
        half_mask = jnp.concatenate([jnp.ones((1, 2000), jnp.int32),
                                     jnp.zeros((1, 2000), jnp.int32)], axis=1)
        half = model.apply(variables, x, half_mask, train=False)
        assert not np.allclose(np.asarray(full), np.asarray(half))


class TestTraining:
    def test_one_step_reduces_loss(self, small_model, rng):
        from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
            create_wav2vec_optimizer)
        import optax

        model, variables = small_model
        params = variables["params"]
        tx = create_wav2vec_optimizer(lr=5e-3, grad_clip=1.0)
        opt_state = tx.init(params)
        x = jnp.asarray(rng.standard_normal((4, 4000)), jnp.float32) * 0.1
        mask = jnp.ones((4, 4000), jnp.int32)
        y = jnp.asarray([0, 1, 2, 3], jnp.int32)

        def loss_fn(p):
            logits = model.apply({"params": p}, x, mask, train=False)
            return optax.softmax_cross_entropy(
                logits, jax.nn.one_hot(y, 5)).mean()

        l0, grads = jax.value_and_grad(loss_fn)(params)
        for _ in range(5):
            updates, opt_state = tx.update(grads, opt_state, params,
                                           value=jnp.asarray(float(l0)))
            params = optax.apply_updates(params, updates)
            l1, grads = jax.value_and_grad(loss_fn)(params)
        assert float(l1) < float(l0)

    def test_frozen_feature_extractor_unchanged(self, small_model, rng):
        from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
            create_wav2vec_optimizer)
        import optax

        model, variables = small_model
        params = variables["params"]
        freeze = feature_extractor_mask(params)
        tx = create_wav2vec_optimizer(lr=1e-2, freeze_mask=freeze)
        opt_state = tx.init(params)
        x = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32) * 0.1
        mask = jnp.ones((2, 4000), jnp.int32)
        y = jnp.asarray([0, 1], jnp.int32)

        def loss_fn(p):
            logits = model.apply({"params": p}, x, mask, train=False)
            return optax.softmax_cross_entropy(
                logits, jax.nn.one_hot(y, 5)).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params,
                                       value=jnp.asarray(float(loss)))
        new_params = optax.apply_updates(params, updates)

        def fe_leaves(tree):
            out = []

            def visit(path, leaf):
                p = "/".join(str(getattr(e, "key", e)) for e in path)
                if "feature_extractor" in p:
                    out.append(np.asarray(leaf))

            jax.tree_util.tree_map_with_path(visit, tree)
            return out

        for a, b in zip(fe_leaves(params), fe_leaves(new_params)):
            np.testing.assert_array_equal(a, b)


class TestData:
    def test_batch_waveforms(self, reference_mic_dir):
        import os

        from speech_intent_recognizer_tpu.data.wav2vec_data import (
            batch_waveforms)

        paths = [os.path.join(reference_mic_dir, f) for f in
                 sorted(os.listdir(reference_mic_dir))[:3]
                 if f.endswith(".wav")]
        x, mask, ok = batch_waveforms(paths, max_length=48000)
        assert x.shape == (len(paths), 48000)
        assert mask.shape == x.shape
        assert ok.all()
        assert (mask.sum(axis=1) > 1000).all()

    def test_train_noise(self, rng):
        from speech_intent_recognizer_tpu.data.wav2vec_data import (
            add_train_noise)

        x = jnp.zeros((4, 1000), jnp.float32)
        mask = jnp.ones((4, 1000), jnp.int32)
        out = add_train_noise(x, mask, jax.random.key(0), prob=1.0,
                              level=1e-2)
        assert float(jnp.abs(out).max()) > 0


class TestCheckpointResume:
    """Fault tolerance for the wav2vec loop: a run killed mid-training
    resumes from the last epoch boundary and lands on the SAME trajectory
    as an uninterrupted run (per-epoch fold_in RNG)."""

    def _fit(self, tmp_path, reference_mic_dir, epochs, resume=True,
             subdir="ckpt"):
        import glob
        from speech_intent_recognizer_tpu.train.checkpoint import Checkpointer
        from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
            Wav2VecTrainer, create_wav2vec_optimizer)

        paths = sorted(glob.glob(reference_mic_dir + "/*.wav"))[:12]
        labels = [i % 3 for i in range(len(paths))]
        model, _ = create_wav2vec_intent(
            num_classes=3, config=small_wav2vec_config(hidden_size=32,
                                                       num_layers=1))
        variables = init_wav2vec(model, jax.random.key(0), input_length=8000)
        tx = create_wav2vec_optimizer(lr=1e-3)
        trainer = Wav2VecTrainer(model, tx, num_classes=3, max_length=8000)
        ckpt = Checkpointer(str(tmp_path / subdir))
        params, result = trainer.fit(
            variables["params"], paths[:8], labels[:8], paths[8:], labels[8:],
            epochs=epochs, batch_size=4, seed=0, early_stop_patience=100,
            checkpointer=ckpt, resume=resume, log=lambda m: None)
        return params, result

    @pytest.mark.slow
    def test_resumed_run_matches_uninterrupted(self, tmp_path,
                                               reference_mic_dir):
        # uninterrupted 3-epoch run
        _, full = self._fit(tmp_path, reference_mic_dir, epochs=3,
                            subdir="full")
        # "preempted" after 2 epochs, then resumed to 3
        self._fit(tmp_path, reference_mic_dir, epochs=2, subdir="split")
        _, resumed = self._fit(tmp_path, reference_mic_dir, epochs=3,
                               subdir="split")
        assert len(resumed["history"]) == 1  # only epoch 3 re-ran
        last_full = full["history"][-1]
        last_res = resumed["history"][-1]
        assert last_res["epoch"] == 3
        np.testing.assert_allclose(last_full["train_loss"],
                                   last_res["train_loss"], rtol=1e-4)
        np.testing.assert_allclose(last_full["val_loss"],
                                   last_res["val_loss"], rtol=1e-4)
        assert resumed["best_val_acc"] == pytest.approx(
            full["best_val_acc"], abs=1e-6)
        # best weights were reloaded from the msgpack export on resume
        assert resumed["best_params"] is not None
