"""Mixed-precision behavior: bf16 compute must track fp32 closely enough
that intent decisions are unchanged (the claim behind replacing AMP with
bf16)."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.models.cnn_gru import (
    CNNAudioGRU, init_model)


class TestBF16Parity:
    def test_decisions_match_fp32(self, rng):
        fp32 = CNNAudioGRU(num_classes=19, compute_dtype=jnp.float32)
        bf16 = CNNAudioGRU(num_classes=19, compute_dtype=jnp.bfloat16)
        variables = init_model(fp32, jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((8, 64, 200)), jnp.float32)
        a = np.asarray(fp32.apply(variables, x, train=False))
        b = np.asarray(bf16.apply(variables, x, train=False))
        assert b.dtype == np.float32
        # logits track within bf16 tolerance; argmax (the decision) matches
        assert np.abs(a - b).max() < 0.15
        assert (np.argmax(a, -1) == np.argmax(b, -1)).all()

    def test_bf16_gradients_finite_and_aligned(self, rng):
        model = CNNAudioGRU(num_classes=19, compute_dtype=jnp.bfloat16)
        variables = init_model(model, jax.random.key(0))
        x = jnp.asarray(rng.standard_normal((4, 64, 200)), jnp.float32)
        y = jnp.asarray([0, 3, 7, 12], jnp.int32)

        def loss_fn(params):
            logits, _ = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                x, train=True, rngs={"dropout": jax.random.key(1)},
                mutable=["batch_stats"])
            onehot = jax.nn.one_hot(y, 19)
            return -jnp.mean(jnp.sum(
                onehot * jax.nn.log_softmax(logits), axis=-1))

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree.leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        norm = float(jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves)))
        assert 1e-6 < norm < 1e3  # no vanishing/exploding from bf16
