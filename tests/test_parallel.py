"""Mesh / sharding / multi-host-sharding unit tests (virtual 8-device CPU
mesh via conftest)."""

import numpy as np
import pytest
import jax
from jax.sharding import PartitionSpec as P

from speech_intent_recognizer_tpu.parallel.distributed import (
    host_shard, shard_list)
from speech_intent_recognizer_tpu.parallel.mesh import (
    DATA_AXIS, MODEL_AXIS, create_mesh, local_batch_size)
from speech_intent_recognizer_tpu.parallel.sharding import (
    batch_sharding, param_shardings, shard_batch)


class TestMesh:
    def test_default_all_data(self):
        mesh = create_mesh()
        assert mesh.shape[DATA_AXIS] == 8
        assert mesh.shape[MODEL_AXIS] == 1

    def test_2d_mesh(self):
        mesh = create_mesh(model_axis=2)
        assert mesh.shape[DATA_AXIS] == 4
        assert mesh.shape[MODEL_AXIS] == 2

    def test_invalid_model_axis(self):
        with pytest.raises(ValueError):
            create_mesh(model_axis=3)  # 8 % 3 != 0

    def test_local_batch_size(self):
        mesh = create_mesh()
        assert local_batch_size(32, mesh) == 4
        with pytest.raises(ValueError):
            local_batch_size(30, mesh)


class TestShardingRules:
    def test_gru_weights_sharded_over_model(self):
        import jax.numpy as jnp

        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        mesh = create_mesh(model_axis=2)
        model = CNNAudioGRU(num_classes=8)
        variables = init_model(model, jax.random.key(0))
        shardings = param_shardings(mesh, variables["params"])
        gru = shardings["gru"]
        assert gru["l0_fwd_w_ih"].spec == P(MODEL_AXIS, None)
        assert gru["l1_bwd_w_hh"].spec == P(MODEL_AXIS, None)
        # conv weights replicated
        assert shardings["conv1"]["kernel"].spec == P()
        # row-parallel classifier head
        assert shardings["fc"]["kernel"].spec == P(MODEL_AXIS, None)

    def test_model_axis_1_replicates_everything(self):
        import jax.numpy as jnp

        mesh = create_mesh()  # model=1
        tree = {"gru": {"l0_fwd_w_ih": jnp.zeros((768, 64))},
                "fc": {"kernel": jnp.zeros((512, 8))}}
        sh = param_shardings(mesh, tree)
        assert sh["gru"]["l0_fwd_w_ih"].spec == P()
        assert sh["fc"]["kernel"].spec == P()

    def test_shard_batch_places_on_data_axis(self):
        mesh = create_mesh()
        batch = {"x": np.zeros((16, 64, 200), np.float32),
                 "y": np.zeros(16, np.int32)}
        placed = shard_batch(mesh, batch)
        assert placed["x"].sharding.spec == P(DATA_AXIS, None, None)
        assert placed["y"].sharding.spec == P(DATA_AXIS)

    def test_batch_sharding_spec(self):
        mesh = create_mesh()
        s = batch_sharding(mesh, ndim=3)
        assert s.spec == P(DATA_AXIS, None, None)


class TestHostSharding:
    def test_partition_covers_all(self):
        chunks = [list(host_shard(103, pi, 4)) for pi in range(4)]
        flat = sum(chunks, [])
        assert sorted(flat) == list(range(103))
        assert max(len(c) for c in chunks) - min(len(c) for c in chunks) <= 26

    def test_shard_list(self):
        items = list("abcdefghij")
        assert shard_list(items, 0, 2) == list("abcde")
        assert shard_list(items, 1, 2) == list("fghij")

    def test_single_host_is_identity(self):
        assert list(host_shard(7, 0, 1)) == list(range(7))


class TestMeshEvaluation:
    """predict_dataset over a 'data' mesh must equal the single-device run
    (the evaluation analog of the dp-serving identity in test_infer)."""

    def test_dp8_identity_and_ragged_n(self):
        from speech_intent_recognizer_tpu.evaluation.evaluate import (
            predict_dataset)
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            CNNAudioGRU, init_model)

        model = CNNAudioGRU(num_classes=5)
        variables = init_model(model, jax.random.key(0))
        rng = np.random.default_rng(0)
        # n=21 with batch_size=6: mesh rounds bs up to 8 and pads the tail
        feats = rng.standard_normal((21, 64, 200)).astype(np.float32)
        y_ref, p_ref, _ = predict_dataset(model, variables, feats,
                                          batch_size=6)
        y_dp, p_dp, _ = predict_dataset(model, variables, feats,
                                        batch_size=6, mesh=create_mesh())
        assert p_dp.shape == p_ref.shape == (21, 5)
        np.testing.assert_allclose(p_ref, p_dp, rtol=2e-4, atol=2e-5)
        np.testing.assert_array_equal(y_ref, y_dp)
