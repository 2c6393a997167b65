"""Wav2Vec trainer parallelism tests (virtual 8-device CPU mesh).

SPMD correctness for the transformer model family: the data-parallel and
data+tensor-parallel train/eval steps must produce the SAME numbers as the
single-device step — GSPMD's collectives are semantically invisible.  The
tensor-parallel layout is the Megatron column/row split on the encoder's
attention and FFN kernels (``parallel/sharding.py``).  The reference's
wav2vec trainer is single-GPU torch
(``scripts/__pycache__/train_wav2vec.cpython-313.pyc``); this is the
TPU-native scaling path for that model family.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from speech_intent_recognizer_tpu.models.wav2vec import (
    create_wav2vec_intent, init_wav2vec, small_wav2vec_config)
from speech_intent_recognizer_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, create_mesh)
from speech_intent_recognizer_tpu.parallel.sharding import (
    param_shardings, place_params)
from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
    Wav2VecTrainer, create_wav2vec_optimizer)


def _tiny_model():
    model, _ = create_wav2vec_intent(
        num_classes=5,
        config=small_wav2vec_config(hidden_size=32, num_layers=1))
    variables = init_wav2vec(model, jax.random.key(0), input_length=4000)
    return model, variables["params"]


def _batch(seed: int, n: int = 8):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, 4000)), jnp.float32) * 0.1
    mask = jnp.ones((n, 4000), jnp.int32)
    y = jnp.asarray(rng.integers(0, 5, n), jnp.int32)
    return x, mask, y


def _run_steps(mesh, n_steps: int = 3):
    model, params = _tiny_model()
    tx = create_wav2vec_optimizer(lr=5e-3, grad_clip=1.0)
    if mesh is not None:
        params = place_params(mesh, params)
    trainer = Wav2VecTrainer(model, tx, num_classes=5, mesh=mesh)
    step, evaluate = trainer._build()
    opt_state = tx.init(params)
    key = jax.random.key(1)
    losses = []
    for i in range(n_steps):
        x, mask, y = _batch(i)
        key, srng = jax.random.split(key)
        params, opt_state, loss, _acc = step(
            params, opt_state, x, mask, y, srng, jnp.asarray(jnp.inf))
        losses.append(float(loss))
    ev_loss, ev_acc = evaluate(params, *_batch(99))
    return losses, float(ev_loss), float(ev_acc), jax.device_get(params)


class TestShardingRules:
    def test_encoder_kernels_sharded_over_model(self):
        _, params = _tiny_model()
        mesh = create_mesh(model_axis=2)
        shardings = param_shardings(mesh, params)
        enc = shardings["wav2vec2"]["encoder"]["layers_0"]
        # column-parallel: qkv + FFN expand shard the OUTPUT dim
        assert enc["attention"]["q_proj"]["kernel"].spec == (None, MODEL_AXIS)
        assert enc["feed_forward"]["intermediate_dense"]["kernel"].spec == \
            (None, MODEL_AXIS)
        assert enc["feed_forward"]["intermediate_dense"]["bias"].spec == \
            (MODEL_AXIS,)
        # row-parallel: projections back shard the INPUT dim, bias replicated
        assert enc["attention"]["out_proj"]["kernel"].spec == (MODEL_AXIS, None)
        assert enc["attention"]["out_proj"]["bias"].spec == ()
        assert enc["feed_forward"]["output_dense"]["kernel"].spec == \
            (MODEL_AXIS, None)
        # feature extractor convs / norms replicated
        fe = shardings["wav2vec2"]["feature_extractor"]
        assert fe["conv_layers_0"]["conv"]["kernel"].spec == ()

    def test_indivisible_shapes_fall_back_to_replicated(self):
        _, params = _tiny_model()
        mesh = create_mesh(model_axis=2)
        # hidden 32 is divisible by 2 — force an indivisible check via ms=8
        # on the (32, 5) classifier: 5 % 8 != 0 and 32 % 8 == 0 (row rule ok)
        mesh8 = create_mesh(model_axis=8)
        shardings = param_shardings(mesh8, params)
        assert shardings["fc"]["kernel"].spec == (MODEL_AXIS, None)
        del mesh


class TestSPMDIdentity:
    def test_mesh_and_single_device_train_identically(self):
        assert len(jax.devices()) == 8, "conftest must fake 8 CPU devices"
        results = {}
        for name, mesh in (("single", None), ("dp8", create_mesh()),
                           ("dp4_tp2", create_mesh(model_axis=2))):
            results[name] = _run_steps(mesh)
        for name in ("dp8", "dp4_tp2"):
            ref_losses, ref_el, ref_ea, ref_params = results["single"]
            losses, el, ea, params = results[name]
            np.testing.assert_allclose(ref_losses, losses, rtol=5e-4,
                                       err_msg=name)
            np.testing.assert_allclose(ref_el, el, rtol=5e-4, err_msg=name)
            np.testing.assert_allclose(ref_ea, ea, atol=1e-6, err_msg=name)
            # post-step params: same math up to sharded reduction order.
            # Excluded: the pooling attention/bias — it is added before a
            # softmax, so its TRUE gradient is exactly zero (shift
            # invariance) and its Adam update is pure float noise scaled to
            # O(lr).  Every real-gradient leaf must match; the 3-step LOSS
            # trajectory above is the functional params check anyway (loss
            # at step k sees step k-1 params).
            for (path, a), (_, b) in zip(
                    jax.tree_util.tree_leaves_with_path(ref_params),
                    jax.tree_util.tree_leaves_with_path(params)):
                keys = [str(getattr(p, "key", p)) for p in path]
                if keys == ["attention", "bias"]:
                    continue
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=1e-3,
                    err_msg=f"{name}:{'/'.join(keys)}")

    def test_batches_actually_sharded_over_data(self):
        mesh = create_mesh()
        model, params = _tiny_model()
        tx = create_wav2vec_optimizer(lr=5e-3)
        trainer = Wav2VecTrainer(model, tx, num_classes=5, mesh=mesh)
        s = trainer._batch_sharding(1)
        assert s.spec == (DATA_AXIS,)
        x = jax.device_put(jnp.zeros((8, 16)), s)
        assert len(x.addressable_shards) == 8
        assert x.addressable_shards[0].data.shape == (1, 16)
