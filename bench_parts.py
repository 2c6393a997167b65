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
    ap.add_argument("--only", type=str, default=None,
                    help="run only stages whose name contains this substring")
    args = ap.parse_args()

    import jax

    from speech_intent_recognizer_tpu.utils.platform import configure_jax
    configure_jax()
    import jax.numpy as jnp
    from flax import linen as nn

    from speech_intent_recognizer_tpu.config.schema import AudioConfig
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        CNNAudioGRU, conv1_external_params, conv_external_params,
        fold_batchnorm, init_model)
    from speech_intent_recognizer_tpu.ops.conv23_pallas import (
        conv23_operands, conv23_pallas)
    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        log_mel_conv1_frontend, log_mel_frontend, make_frontend_params,
        padded_samples)
    from speech_intent_recognizer_tpu.ops.frontend_pallas import (
        conv1_band_operands)

    print("backend:", jax.default_backend(), jax.devices()[0])
    audio_cfg = AudioConfig()
    fe = make_frontend_params(audio_cfg)
    model = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
    model_folded = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                               fold_bn=True)
    model_var = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                            fold_bn=True, conv1_external=True)
    model_var_gp = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                               fold_bn=True, conv1_external=True,
                               gru_impl="pallas")
    model_var_pp = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                               fold_bn=True, conv1_external=True,
                               gru_impl="pallas", pool_impl="pallas")
    model_head = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                             fold_bn=True, conv_external=True)
    cpu0 = jax.devices("cpu")[0]
    with jax.default_device(cpu0):
        variables = init_model(
            model, jax.random.key(0),
            (1, audio_cfg.n_mels, audio_cfg.mel_spec_length))
        folded_p = fold_batchnorm(variables["params"],
                                  variables["batch_stats"])
        var_p, c1k, c1b = conv1_external_params(folded_p)
        head_p, _, (k2, b2), (k3, b3) = conv_external_params(folded_p)
        folded = {"params": folded_p}
        var_vars = {"params": var_p}
        head_vars = {"params": head_p}
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)
    folded = jax.device_put(folded, dev)
    var_vars = jax.device_put(var_vars, dev)
    head_vars = jax.device_put(head_vars, dev)
    weo = jax.device_put(conv1_band_operands(c1k, c1b, audio_cfg.n_mels),
                         dev)
    w2, b2t, w3, b3t = (jax.device_put(a, dev)
                        for a in conv23_operands(k2, b2, k3, b3))

    rng = np.random.default_rng(0)
    buf_width = padded_samples(audio_cfg.max_samples, audio_cfg.hop_length)
    for batch in args.batches:
        wav_np = np.zeros((batch, buf_width), np.float32)
        wav_np[:, :audio_cfg.max_samples] = _speech_like(
            rng, (batch, audio_cfg.max_samples))
        wf = jnp.asarray(wav_np)
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

        # ---- conv1-fused production path + stage isolation ----
        def fe_conv1(wf, ln, s):
            f = log_mel_conv1_frontend(wf, ln, fe, weo)
            return f[0, 0, 0].astype(jnp.float32) + s

        def fused_conv1(wf, ln, s):
            f = log_mel_conv1_frontend(wf, ln, fe, weo)
            return jnp.sum(model_var.apply(var_vars, f, train=False)) + s

        def model_var_fwd(x, s):
            return jnp.sum(model_var.apply(var_vars, x, train=False)) + s

        def model_var_gp_fwd(x, s):
            return jnp.sum(model_var_gp.apply(var_vars, x, train=False)) + s

        def fused_conv1_gp(wf, ln, s):
            f = log_mel_conv1_frontend(wf, ln, fe, weo)
            return jnp.sum(model_var_gp.apply(var_vars, f, train=False)) + s

        # pool_impl="pallas": conv epilogues as one-pass Pallas kernels
        def model_var_pp_fwd(x, s):
            return jnp.sum(model_var_pp.apply(var_vars, x, train=False)) + s

        def fused_conv1_pp(wf, ln, s):
            f = log_mel_conv1_frontend(wf, ln, fe, weo)
            return jnp.sum(model_var_pp.apply(var_vars, f, train=False)) + s

        pooled = log_mel_conv1_frontend(wf, ln, fe, weo)

        # isolated conv2 / conv3 stages of the variant (XLA convs) — the
        # decision input for a Pallas conv2/3 kernel (VERDICT r2 item 4)
        k2 = jnp.asarray(var_vars["params"]["conv2"]["kernel"], jnp.bfloat16)
        b2 = jnp.asarray(var_vars["params"]["conv2"]["bias"], jnp.bfloat16)
        k3 = jnp.asarray(var_vars["params"]["conv3"]["kernel"], jnp.bfloat16)
        b3 = jnp.asarray(var_vars["params"]["conv3"]["bias"], jnp.bfloat16)

        def conv_stage(x, k, b):
            z = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            z = nn.relu(z + b)
            return nn.max_pool(z, (2, 2), strides=(2, 2))

        x2 = pooled.reshape(batch, 100, 32, 32)
        x3 = jax.jit(lambda x: conv_stage(x, k2, b2))(x2)

        def conv2_only(x, s):
            return conv_stage(x, k2, b2)[0, 0, 0, 0].astype(jnp.float32) + s

        def conv3_only(x, s):
            return conv_stage(x, k3, b3)[0, 0, 0, 0].astype(jnp.float32) + s

        # ---- parity-stride conv experiment -----------------------------
        # Fold the mel-direction 2-pool INTO the conv as a stride-2 width-4
        # conv with doubled output channels (even/odd output-mel parities),
        # then max the parity halves; the remaining pool is time-only.
        # Halves the pre-pool activation written to HBM and fills the MXU
        # lane dim (conv2's N=64 -> 128).
        def parity_kernel(k):
            kh, kw, cin, cout = k.shape  # (3, 3, cin, cout), (time, mel)
            kp = np.zeros((kh, kw + 1, cin, 2 * cout), k.dtype)
            for p in (0, 1):
                kp[:, p:p + kw, :, p * cout:(p + 1) * cout] = np.asarray(k)
            return jnp.asarray(kp)

        def parity_stage(x, kp, b):
            cout = kp.shape[-1] // 2
            z = jax.lax.conv_general_dilated(
                x, kp, (1, 2), [(1, 1), (1, 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = nn.relu(jnp.maximum(z[..., :cout] + b, z[..., cout:] + b))
            return nn.max_pool(y, (2, 1), strides=(2, 1))

        k2p = parity_kernel(k2)
        k3p = parity_kernel(k3)

        def conv2_parity(x, s):
            return parity_stage(x, k2p, b2)[0, 0, 0, 0].astype(
                jnp.float32) + s

        def conv3_parity(x, s):
            return parity_stage(x, k3p, b3)[0, 0, 0, 0].astype(
                jnp.float32) + s

        def model_var_parity(x, s):
            h = parity_stage(parity_stage(x.reshape(batch, 100, 32, 32),
                                          k2p, b2), k3p, b3)
            f = h.reshape(batch, 25, 1024)
            return jnp.sum(model_head.apply(head_vars, f, train=False)) + s

        def fused_conv1_parity(wf, ln, s):
            p = log_mel_conv1_frontend(wf, ln, fe, weo)
            h = parity_stage(parity_stage(p.reshape(batch, 100, 32, 32),
                                          k2p, b2), k3p, b3)
            f = h.reshape(batch, 25, 1024)
            return jnp.sum(model_head.apply(head_vars, f, train=False)) + s

        # ---- conv23 Pallas kernel + head-only model --------------------
        def conv23_only(x, s):
            f = conv23_pallas(x, w2, b2t, w3, b3t)
            return f[0, 0, 0].astype(jnp.float32) + s

        def head_fwd(x, s):
            return jnp.sum(model_head.apply(head_vars, x, train=False)) + s

        def fused_all(wf, ln, s):
            p = log_mel_conv1_frontend(wf, ln, fe, weo)
            f = conv23_pallas(p, w2, b2t, w3, b3t)
            return jnp.sum(model_head.apply(head_vars, f, train=False)) + s

        sheet = conv23_pallas(pooled, w2, b2t, w3, b3t)

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
            ("frontend+conv1 kernel", jax.jit(fe_conv1), (wf, ln)),
            ("model variant (conv2..)", jax.jit(model_var_fwd), (pooled,)),
            ("conv2 stage only", jax.jit(conv2_only), (x2,)),
            ("conv3 stage only", jax.jit(conv3_only), (x3,)),
            ("fused conv1+variant", jax.jit(fused_conv1), (wf, ln)),
            ("model variant gruP", jax.jit(model_var_gp_fwd), (pooled,)),
            ("fused conv1+var gruP", jax.jit(fused_conv1_gp), (wf, ln)),
            ("model var gruP poolP", jax.jit(model_var_pp_fwd), (pooled,)),
            ("fused conv1+var poolP", jax.jit(fused_conv1_pp), (wf, ln)),
            ("conv23 kernel only", jax.jit(conv23_only), (pooled,)),
            ("head model (gru+attn)", jax.jit(head_fwd), (sheet,)),
            ("fused conv-all+head", jax.jit(fused_all), (wf, ln)),
            ("conv2 parity-stride", jax.jit(conv2_parity), (x2,)),
            ("conv3 parity-stride", jax.jit(conv3_parity), (x3,)),
            ("model parity convs", jax.jit(model_var_parity), (pooled,)),
            ("fused parity e2e", jax.jit(fused_conv1_parity), (wf, ln)),
        ]
        if args.only:
            rows = [r for r in rows if args.only in r[0]]
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
