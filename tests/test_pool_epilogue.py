"""Pallas conv-epilogue kernel (bias + ReLU + 2x2 max-pool): parity.

The production TPU inference path applies each conv stage's epilogue
(reference ``models/models.py:10-21``: ReLU after the BN-folded bias, then
MaxPool2) as one streaming Pallas pass over XLA's raw conv output
(``ops/pool_epilogue_pallas``), because XLA never fuses an epilogue into a
conv (measured round 3).  These tests pin, in interpreter mode (same
arithmetic as the Mosaic kernel):

* the kernel against a NumPy pool(relu(y + bias)) reference — exact in f32;
* the bf16 path (production) within bf16 rounding;
* ``conv1_external`` variant logits with ``pool_impl="pallas"`` against the
  ``"xla"`` epilogue — identical params tree, bit-equal logits at bf16;
* geometry validation errors.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.models.cnn_gru import (
    CNNAudioGRU, conv1_external_params, fold_batchnorm, init_model)
from speech_intent_recognizer_tpu.ops.pool_epilogue_pallas import (
    bias_relu_pool2_pallas)


def _reference(y, bias):
    b, t, w, c = y.shape
    z = np.maximum(np.asarray(y, np.float32) + np.asarray(bias, np.float32),
                   0.0)
    return z.reshape(b, t // 2, 2, w // 2, 2, c).max(axis=(2, 4))


class TestKernel:
    @pytest.mark.parametrize("shape", [
        (3, 100, 32, 64),   # conv2 epilogue geometry (variant orientation)
        (2, 50, 16, 128),   # conv3 epilogue geometry
        (9, 8, 4, 64),      # batch not a multiple of the grid batch
        (1, 2, 4, 32),      # minimal
    ])
    def test_f32_exact(self, rng, shape):
        y = rng.standard_normal(shape).astype(np.float32)
        bias = rng.standard_normal(shape[-1]).astype(np.float32)
        out = np.asarray(bias_relu_pool2_pallas(jnp.asarray(y),
                                                jnp.asarray(bias)))
        np.testing.assert_array_equal(out, _reference(y, bias))

    def test_bf16_production_path(self, rng):
        y = rng.standard_normal((4, 100, 32, 64)).astype(np.float32)
        bias = rng.standard_normal(64).astype(np.float32)
        yb = jnp.asarray(y, jnp.bfloat16)
        out = np.asarray(bias_relu_pool2_pallas(yb, jnp.asarray(bias)),
                         np.float32)
        ref = _reference(np.asarray(yb, np.float32), bias)
        # output is bf16: one final rounding of exact f32 values
        assert np.abs(out - ref).max() <= np.abs(ref).max() * 2 ** -8

    def test_geometry_validation(self):
        y = jnp.zeros((1, 9, 32, 64))  # odd T
        with pytest.raises(ValueError):
            bias_relu_pool2_pallas(y, jnp.zeros(64))
        y = jnp.zeros((1, 10, 12, 64))  # W not a power of two
        with pytest.raises(ValueError):
            bias_relu_pool2_pallas(y, jnp.zeros(64))


class TestVariantIntegration:
    @pytest.fixture(scope="class")
    def variant_assets(self):
        base = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
        raw = init_model(base, jax.random.key(0), (1, 64, 200))
        folded = fold_batchnorm(raw["params"], raw["batch_stats"])
        var_params, _, _ = conv1_external_params(folded)
        return var_params

    def test_param_tree_identical(self, variant_assets):
        """pool_impl="pallas" declares the exact same params as "xla"."""
        for impl in ("xla", "pallas"):
            m = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                            fold_bn=True, conv1_external=True,
                            pool_impl=impl)
            v = m.init({"params": jax.random.key(1)},
                       jnp.zeros((1, 100, 1024)), train=False)
            shapes = jax.tree.map(lambda a: a.shape, v["params"])
            if impl == "xla":
                want = shapes
            else:
                assert shapes == want

    def test_logits_match_xla_epilogue(self, variant_assets, rng):
        x = jnp.asarray(rng.standard_normal((4, 100, 1024)), jnp.float32)
        outs = {}
        for impl in ("xla", "pallas"):
            m = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                            fold_bn=True, conv1_external=True,
                            pool_impl=impl)
            outs[impl] = np.asarray(
                m.apply({"params": variant_assets}, x, train=False))
        np.testing.assert_allclose(outs["pallas"], outs["xla"],
                                   atol=1e-5, rtol=0)
