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


class TestCustomVJP:
    """gru_impl="pallas" is trainable: its custom VJP (Pallas forward,
    exact adjoint recurrence backward — ops/gru_pallas._gru_layer_diff)
    must produce the same gradients as autodiff through the scan path."""

    def test_layer_grads_match_scan(self, rng):
        from speech_intent_recognizer_tpu.models.cnn_gru import (
            _gru_bidirectional_scan)
        from speech_intent_recognizer_tpu.ops.gru_pallas import (
            gru_bidirectional_pallas)

        t, b, h = 12, 5, 64
        args = (
            jnp.asarray(rng.standard_normal((t, b, 3 * h)), jnp.float32),
            jnp.asarray(rng.standard_normal((t, b, 3 * h)), jnp.float32),
            jnp.asarray(rng.standard_normal((3 * h, h)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal((3 * h, h)) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32),
            jnp.asarray(rng.standard_normal(3 * h) * 0.1, jnp.float32),
        )
        # weight the loss so every (t, b, h) position gets a distinct
        # cotangent — a plain sum would mask transposition bugs
        wt = jnp.asarray(rng.standard_normal((t, b, h)), jnp.float32)

        def loss(fn, *a):
            ys_f, ys_b = fn(*a, h)
            return jnp.sum(wt * ys_f) + jnp.sum(wt[::-1] * ys_b)

        ref = jax.grad(lambda *a: loss(_gru_bidirectional_scan, *a),
                       argnums=tuple(range(6)))(*args)
        got = jax.grad(lambda *a: loss(gru_bidirectional_pallas, *a),
                       argnums=tuple(range(6)))(*args)
        for g_ref, g_got, name in zip(
                ref, got, ["gx_f", "gx_b", "w_f", "w_b", "b_f", "b_b"]):
            np.testing.assert_allclose(
                np.asarray(g_got), np.asarray(g_ref),
                rtol=2e-4, atol=2e-5, err_msg=f"grad mismatch: {name}")

    def test_full_model_param_grads_match(self, rng):
        """d(cross-entropy)/d(params) identical for scan vs pallas GRU."""
        import optax

        scan_model = CNNAudioGRU(num_classes=7)
        pls_model = CNNAudioGRU(num_classes=7, gru_impl="pallas")
        variables = init_model(scan_model, jax.random.key(5))
        x = jnp.asarray(rng.standard_normal((2, 64, 120)), jnp.float32)
        y = jnp.asarray([1, 4])

        def make_loss(model):
            def loss(params):
                logits = model.apply(
                    {"params": params,
                     "batch_stats": variables["batch_stats"]},
                    x, train=False)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()
            return loss

        g_ref = jax.grad(make_loss(scan_model))(variables["params"])
        g_got = jax.grad(make_loss(pls_model))(variables["params"])
        flat_ref = jax.tree.leaves_with_path(g_ref)
        flat_got = jax.tree.leaves(g_got)
        assert len(flat_ref) == len(flat_got)
        for (path, a), b in zip(flat_ref, flat_got):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5,
                err_msg=f"param grad mismatch at {jax.tree_util.keystr(path)}")
