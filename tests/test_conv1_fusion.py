"""Fused frontend+conv1 Pallas path: stage and end-to-end parity.

The production inference fast path runs the model's first conv stage
(conv1 + ReLU + 2x2 max-pool, reference ``models/models.py:10-13``) INSIDE
the Pallas frontend kernel as a banded GEMM while the mel image is in VMEM
(``ops/frontend_pallas.py`` v6 section), serving a ``conv1_external``
CNNAudioGRU variant with spatially-transposed conv2/conv3 kernels.  These
tests pin, in interpreter mode (same arithmetic as the Mosaic kernel):

* the fused stage against a plain-XLA conv+pool of the same folded weights;
* variant logits against the full folded model (both bf16 — the production
  compute dtype);
* the Predictor integration (auto-enabled fusion, padded buffers).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.models.cnn_gru import (
    CNNAudioGRU, conv1_external_params, fold_batchnorm, init_model)
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    log_mel_conv1_frontend, log_mel_frontend, make_frontend_params,
    padded_samples, waveform_rows)
from speech_intent_recognizer_tpu.ops.frontend_pallas import (
    conv1_band_operands)


def _rand_wave(rng, n):
    t = np.arange(n) / 16000
    return (0.3 * np.sin(2 * np.pi * 440 * t)
            + 0.05 * rng.standard_normal(n)).astype(np.float32)


@pytest.fixture(scope="module")
def assets():
    cfg = AudioConfig()
    fe = make_frontend_params(cfg)
    base = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
    raw = init_model(base, jax.random.key(0),
                     (1, cfg.n_mels, cfg.mel_spec_length))
    folded = fold_batchnorm(raw["params"], raw["batch_stats"])
    var_params, c1k, c1b = conv1_external_params(folded)
    weo = conv1_band_operands(c1k, c1b, cfg.n_mels)
    return cfg, fe, folded, var_params, c1k, c1b, weo


def _batch(rng, cfg, lengths, width=None):
    buf = np.zeros((len(lengths), width or cfg.max_samples), np.float32)
    for i, n in enumerate(lengths):
        buf[i, :n] = _rand_wave(rng, n)
    return jnp.asarray(buf), jnp.asarray(lengths, jnp.int32)


class TestConv1Stage:
    def test_stage_matches_xla_conv_pool(self, assets, rng):
        """Kernel conv1+ReLU+pool == XLA conv+reduce_window of the same
        folded weights at bf16 (the model's own compute precision)."""
        cfg, fe, folded, _, c1k, c1b, weo = assets
        lengths = [16000, 39999, 80000, 1537, 2, 512]
        wf, ln = _batch(rng, cfg, lengths)
        feats = log_mel_frontend(wf, ln, fe, backend="pallas")

        x = feats[..., None].astype(jnp.bfloat16)  # (B, 64, 200, 1) NHWC
        z = jax.lax.conv_general_dilated(
            x, jnp.asarray(c1k, jnp.bfloat16), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        z = jnp.maximum(
            z + jnp.asarray(c1b, jnp.bfloat16).astype(jnp.float32), 0.0)
        pool = jax.lax.reduce_window(z, -jnp.inf, jax.lax.max,
                                     (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        want = jnp.transpose(pool, (0, 2, 1, 3)).reshape(
            len(lengths), 100, 1024)

        got = log_mel_conv1_frontend(wf, ln, fe, weo, out_dtype=jnp.float32)
        scale = float(np.abs(np.asarray(want)).max())
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=0.05 * scale, rtol=0.05)

    def test_variant_logits_match_full_model(self, assets, rng):
        cfg, fe, folded, var_params, _, _, weo = assets
        model_full = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                                 fold_bn=True)
        model_var = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                                fold_bn=True, conv1_external=True)
        lengths = [24000, 8000, 80000]
        wf, ln = _batch(rng, cfg, lengths)
        feats = log_mel_frontend(wf, ln, fe, backend="pallas")
        want = np.asarray(model_full.apply(
            {"params": folded}, feats.astype(jnp.bfloat16), train=False))
        pooled = log_mel_conv1_frontend(wf, ln, fe, weo)
        got = np.asarray(model_var.apply({"params": var_params}, pooled,
                                         train=False))
        assert (np.argmax(got, -1) == np.argmax(want, -1)).all()
        np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)

    def test_padded_buffer_is_equivalent_and_zero_copy(self, assets, rng):
        """padded_samples-wide buffers give bit-identical output, and
        waveform_rows on them is a pure reshape (no second pad)."""
        cfg, fe, *_rest, weo = assets
        width = padded_samples(cfg.max_samples, cfg.hop_length)
        assert width % (cfg.hop_length * 8) == 0 and width > cfg.max_samples
        lengths = [16000, 80000]
        wf_pad, ln = _batch(rng, cfg, lengths, width=width)
        wf = wf_pad[:, : cfg.max_samples]
        a = np.asarray(log_mel_conv1_frontend(wf, ln, fe, weo,
                                              out_dtype=jnp.float32))
        b = np.asarray(log_mel_conv1_frontend(wf_pad, ln, fe, weo,
                                              out_dtype=jnp.float32))
        np.testing.assert_array_equal(a, b)
        rows = waveform_rows(wf_pad, cfg.hop_length, multiple=8)
        assert rows.shape == (2, width // cfg.hop_length, cfg.hop_length)

    def test_predictor_auto_enables_fusion(self, assets, rng, tmp_path):
        """Predictor.from_checkpoint enables the conv1-fused path for the
        reference geometry and its probabilities match the standard
        feature+model path."""
        import json

        from speech_intent_recognizer_tpu.infer.predict import Predictor
        from speech_intent_recognizer_tpu.train.checkpoint import save_model

        cfg, fe, folded, *_ = assets
        base = CNNAudioGRU(num_classes=31)
        raw = init_model(base, jax.random.key(1),
                         (1, cfg.n_mels, cfg.mel_spec_length))
        ckpt = tmp_path / "model.msgpack"
        save_model(str(ckpt), {"params": raw["params"],
                               "batch_stats": raw["batch_stats"]})
        lm_path = tmp_path / "label_map.json"
        lm_path.write_text(json.dumps({f"c{i}": i for i in range(31)}))

        pred = Predictor.from_checkpoint(str(ckpt), str(lm_path))
        assert pred._conv1 is not None, "fusion not auto-enabled"
        n = 24000
        buf = np.zeros((2, pred._buffer_width()), np.float32)
        buf[0, :n] = _rand_wave(rng, n)
        buf[1, : n // 2] = _rand_wave(rng, n // 2)
        ln = np.asarray([n, n // 2], np.int32)
        probs = pred.predict_waveform_batch(buf, ln)

        pred_std = Predictor.from_checkpoint(str(ckpt), str(lm_path))
        pred_std._conv1 = None  # force the standard path
        pred_std._conv23 = None
        want = pred_std.predict_waveform_batch(buf, ln)
        assert (np.argmax(probs, -1) == np.argmax(want, -1)).all()
        np.testing.assert_allclose(probs, want, atol=2e-2)
