"""Pallas GRU recurrence kernel parity (interpreter mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.models.cnn_gru import (
    CNNAudioGRU, TorchGRU, init_model)


class TestKernelParity:
    def test_gru_layer_matches_scan(self, rng):
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            _gru_bidirectional_scan)
        from speech_intent_recognizer_tpu.ops.gru_pallas import (
            gru_bidirectional_pallas)

        t, b, h, f = 25, 4, 256, 1024
        gx_f = jnp.asarray(rng.standard_normal((t, b, 3 * h)), jnp.float32)
        gx_b = jnp.asarray(rng.standard_normal((t, b, 3 * h)), jnp.float32)
        w_f = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.05, jnp.float32)
        w_b = jnp.asarray(rng.standard_normal((3 * h, h)) * 0.05, jnp.float32)
        b_f = jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32)
        b_b = jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32)

        # identical arguments: both implement PyTorch double-bias semantics
        ys_f, ys_b = _gru_bidirectional_scan(gx_f, gx_b, w_f, w_b,
                                             b_f, b_b, h)
        ys_f2, ys_b2 = gru_bidirectional_pallas(gx_f, gx_b, w_f, w_b,
                                                b_f, b_b, h)
        np.testing.assert_allclose(np.asarray(ys_f2), np.asarray(ys_f),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ys_b2), np.asarray(ys_b),
                                   rtol=1e-5, atol=1e-5)

    def test_full_model_logits_match(self, rng):
        """Same params, scan vs pallas GRU: logits must agree."""
        scan_model = CNNAudioGRU(num_classes=9)
        pls_model = CNNAudioGRU(num_classes=9, gru_impl="pallas")
        variables = init_model(scan_model, jax.random.key(2))
        x = jnp.asarray(rng.standard_normal((3, 64, 200)), jnp.float32)
        a = scan_model.apply(variables, x, train=False)
        b = pls_model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)
        assert (np.argmax(np.asarray(a), -1)
                == np.argmax(np.asarray(b), -1)).all()

    def test_batch_not_multiple_of_tile(self, rng):
        g = TorchGRU(hidden_size=64, num_layers=1, impl="pallas")
        x = jnp.asarray(rng.standard_normal((5, 10, 128)), jnp.float32)
        v = g.init(jax.random.key(0), x)
        out = g.apply(v, x)
        assert out.shape == (5, 10, 128)
        assert np.isfinite(np.asarray(out)).all()
