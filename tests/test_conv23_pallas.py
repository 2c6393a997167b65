"""Pallas conv2/conv3 kernel: stage and end-to-end parity.

``ops/conv23_pallas.py`` runs the model's second and third conv stages
(conv/bias/ReLU/2x2-maxpool, reference ``models/models.py:14-21``) in one
VMEM-resident kernel on the fused-conv1 kernel's output, serving a
``conv_external`` (GRU+head only) CNNAudioGRU variant.  Interpreter-mode
tests (same arithmetic as the Mosaic kernel) pin:

* the kernel against plain-XLA conv+reduce_window stages of the same
  folded weights (the variant model's own conv2/conv3);
* conv-external logits against the full folded model at bf16;
* the Predictor integration (opt-in via ``enable_conv23_kernel``, matches
  the standard path; the conv1+variant path stays the production default —
  the kernel measured throughput-neutral at b1024, see BENCH_NOTES.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import linen as nn

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.models.cnn_gru import (
    CNNAudioGRU, conv1_external_params, conv_external_params,
    fold_batchnorm, init_model)
from speech_intent_recognizer_tpu.ops.conv23_pallas import (
    conv23_operands, conv23_pallas)
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    log_mel_conv1_frontend, make_frontend_params)
from speech_intent_recognizer_tpu.ops.frontend_pallas import (
    conv1_band_operands)


@pytest.fixture(scope="module")
def assets():
    cfg = AudioConfig()
    fe = make_frontend_params(cfg)
    base = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
    raw = init_model(base, jax.random.key(0),
                     (1, cfg.n_mels, cfg.mel_spec_length))
    folded = fold_batchnorm(raw["params"], raw["batch_stats"])
    var_params, c1k, c1b = conv1_external_params(folded)
    head_params, _, (k2, b2), (k3, b3) = conv_external_params(folded)
    return (cfg, fe, folded, var_params, head_params,
            conv1_band_operands(c1k, c1b, cfg.n_mels),
            conv23_operands(k2, b2, k3, b3))


def _conv_stage(x, k, b):
    z = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = nn.relu(z + b)
    return nn.max_pool(z, (2, 2), strides=(2, 2))


class TestConv23Kernel:
    def test_stages_match_xla(self, assets, rng):
        """Kernel == the variant model's XLA conv2/conv3 stages at bf16,
        including batch padding (B=5 not a multiple of the grid's bu)."""
        _, _, _, var_params, _, _, (w2, b2t, w3, b3t) = assets
        k2v = jnp.asarray(var_params["conv2"]["kernel"], jnp.bfloat16)
        b2v = jnp.asarray(var_params["conv2"]["bias"], jnp.bfloat16)
        k3v = jnp.asarray(var_params["conv3"]["kernel"], jnp.bfloat16)
        b3v = jnp.asarray(var_params["conv3"]["bias"], jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((5, 100, 1024)).astype(
            np.float32), jnp.bfloat16)
        want = np.asarray(_conv_stage(_conv_stage(
            x.reshape(5, 100, 32, 32), k2v, b2v), k3v, b3v), np.float32)
        got = np.asarray(conv23_pallas(x, w2, b2t, w3, b3t),
                         np.float32).reshape(5, 25, 8, 128)
        scale = np.abs(want).max()
        assert np.abs(got - want).max() < 0.02 * scale

    def test_conv_external_logits_match_full_model(self, assets, rng):
        cfg, fe, folded, _, head_params, weo, (w2, b2t, w3, b3t) = assets
        model_full = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                                 fold_bn=True)
        head = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                           fold_bn=True, conv_external=True)
        lengths = [24000, 8000, 80000]
        buf = np.zeros((3, cfg.max_samples), np.float32)
        for i, n in enumerate(lengths):
            t = np.arange(n) / 16000
            buf[i, :n] = (0.3 * np.sin(2 * np.pi * 440 * t)
                          + 0.05 * rng.standard_normal(n))
        wf = jnp.asarray(buf)
        ln = jnp.asarray(lengths, jnp.int32)
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend)

        feats = log_mel_frontend(wf, ln, fe, backend="pallas")
        want = np.asarray(model_full.apply(
            {"params": folded}, feats.astype(jnp.bfloat16), train=False))
        pooled = log_mel_conv1_frontend(wf, ln, fe, weo)
        sheet = conv23_pallas(pooled, w2, b2t, w3, b3t)
        got = np.asarray(head.apply({"params": head_params}, sheet,
                                    train=False))
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()
        np.testing.assert_allclose(got, want, atol=3e-2, rtol=3e-2)

    def test_predictor_uses_conv23_and_matches(self, assets, rng, tmp_path):
        import json

        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.train.checkpoint import save_model

        cfg, *_ = assets
        base = CNNAudioGRU(num_classes=31)
        raw = init_model(base, jax.random.key(1),
                         (1, cfg.n_mels, cfg.mel_spec_length))
        ckpt = tmp_path / "model.msgpack"
        save_model(str(ckpt), {"params": raw["params"],
                               "batch_stats": raw["batch_stats"]})
        lm_path = tmp_path / "label_map.json"
        lm_path.write_text(json.dumps({f"c{i}": i for i in range(31)}))

        pred = Predictor.from_checkpoint(str(ckpt), str(lm_path))
        assert pred._conv23 is None  # opt-in, not the default
        pred.enable_conv23_kernel()
        assert pred._conv23 is not None
        n = 24000
        buf = np.zeros((2, pred._buffer_width()), np.float32)
        t = np.arange(n) / 16000
        buf[0, :n] = 0.3 * np.sin(2 * np.pi * 300 * t)
        buf[1, : n // 2] = 0.2 * rng.standard_normal(n // 2)
        ln = np.asarray([n, n // 2], np.int32)
        probs = pred.predict_waveform_batch(buf, ln)

        pred_std = Predictor.from_checkpoint(str(ckpt), str(lm_path))
        pred_std._conv23 = None
        pred_std._conv1 = None  # force the standard feature+model path
        want = pred_std.predict_waveform_batch(buf, ln)
        assert (np.argmax(probs, -1) == np.argmax(want, -1)).all()
        np.testing.assert_allclose(probs, want, atol=2e-2)
