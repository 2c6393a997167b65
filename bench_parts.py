#!/usr/bin/env python
"""Component-level timing breakdown on the real accelerator.

Times each stage of the production inference path separately (frontend
backends, conv stack, GRU, full fused program) at several batch sizes, with
the scalar-carry chaining + best-of-k methodology from bench.py (the tunnel
link has high variance; see CLAUDE.md).  Development tool — the driver
benchmark is bench.py.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def _speech_like(rng, shape):
    t = np.arange(shape[-1]) / 16000.0
    base = 0.25 * np.sin(2 * np.pi * 220.0 * t)[None, :]
    return (base + 0.05 * rng.standard_normal(shape)).astype(np.float32)


def time_fn(fn, *args, iters=20, rounds=5):
    """Best-of-rounds sustained seconds/iter for a chained scalar-carry fn."""
    import jax.numpy as jnp

    float(fn(*args, jnp.float32(0)))  # compile + warmup
    best = float("inf")
    for _ in range(rounds):
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fn(*args, s)
        float(s)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[256, 512])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax

    from speech_intent_recognizer_tpu.utils.platform import configure_jax
    configure_jax()
    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.config.schema import AudioConfig
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        CNNAudioGRU, fold_batchnorm, init_model)
    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        log_mel_frontend, make_frontend_params)

    print("backend:", jax.default_backend(), jax.devices()[0])
    audio_cfg = AudioConfig()
    fe = make_frontend_params(audio_cfg)
    model = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
    model_folded = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                               fold_bn=True)
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        variables = init_model(
            model, jax.random.key(0),
            (1, audio_cfg.n_mels, audio_cfg.mel_spec_length))
        folded = {"params": fold_batchnorm(variables["params"],
                                           variables["batch_stats"])}
    variables = jax.device_put(variables, jax.devices()[0])
    folded = jax.device_put(folded, jax.devices()[0])

    rng = np.random.default_rng(0)
    for batch in args.batches:
        wf = jnp.asarray(_speech_like(rng, (batch, audio_cfg.max_samples)))
        ln = jnp.full((batch,), audio_cfg.max_samples, jnp.int32)
        feats = log_mel_frontend(wf, ln, fe, backend="xla")
        feats_bf16 = feats.astype(jnp.bfloat16)

        def fe_xla(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="xla")
            return f[0, 0, 0] + s

        def fe_xla_bf16(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="xla",
                                 out_dtype=jnp.bfloat16)
            return f[0, 0, 0].astype(jnp.float32) + s

        def fe_pallas(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="pallas")
            return f[0, 0, 0] + s

        def fe_pallas_bf16(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="pallas",
                                 out_dtype=jnp.bfloat16)
            return f[0, 0, 0].astype(jnp.float32) + s

        def fwd_bn(x, s):
            return jnp.sum(model.apply(variables, x, train=False)) + s

        def fwd_folded(x, s):
            return jnp.sum(model_folded.apply(folded, x, train=False)) + s

        def fwd_folded_bf16(x, s):
            return jnp.sum(model_folded.apply(folded, x, train=False)) + s

        def fused_old(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="xla")
            return jnp.sum(model.apply(variables, f, train=False)) + s

        def fused_new(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="pallas",
                                 out_dtype=jnp.bfloat16)
            return jnp.sum(model_folded.apply(folded, f, train=False)) + s

        def fused_xla_folded(wf, ln, s):
            f = log_mel_frontend(wf, ln, fe, backend="xla",
                                 out_dtype=jnp.bfloat16)
            return jnp.sum(model_folded.apply(folded, f, train=False)) + s

        rows = [
            ("frontend xla f32", jax.jit(fe_xla), (wf, ln)),
            ("frontend xla bf16out", jax.jit(fe_xla_bf16), (wf, ln)),
            ("frontend pallas f32", jax.jit(fe_pallas), (wf, ln)),
            ("frontend pallas bf16out", jax.jit(fe_pallas_bf16), (wf, ln)),
            ("model bn f32in", jax.jit(fwd_bn), (feats,)),
            ("model folded f32in", jax.jit(fwd_folded), (feats,)),
            ("model folded bf16in", jax.jit(fwd_folded_bf16), (feats_bf16,)),
            ("fused r1 (xla+bn)", jax.jit(fused_old), (wf, ln)),
            ("fused xla+folded", jax.jit(fused_xla_folded), (wf, ln)),
            ("fused pallas+folded", jax.jit(fused_new), (wf, ln)),
        ]
        print(f"\n=== batch {batch} ===")
        for name, fn, a in rows:
            try:
                sec = time_fn(fn, *a, iters=args.iters)
                print(f"{name:26s} {sec * 1e3:8.3f} ms  "
                      f"{batch / sec:10.0f} utt/s")
            except Exception as e:  # noqa: BLE001
                print(f"{name:26s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
