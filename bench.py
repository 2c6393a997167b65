#!/usr/bin/env python
"""Benchmark: fused feature+forward throughput (utterances/sec/chip).

Measures the production inference path — raw 5 s waveforms through the
GEMM-native log-mel front-end and the CNNAudioGRU classifier, one jitted
program — on the available accelerator, and compares against a single-core
CPU baseline (librosa-math features + torch CPU forward — the reference's
own runtime; BASELINE.md targets >=10x that).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _speech_like(rng, shape):
    t = np.arange(shape[-1]) / 16000.0
    base = 0.25 * np.sin(2 * np.pi * 220.0 * t)[None, :]
    return (base + 0.05 * rng.standard_normal(shape)).astype(np.float32)


def main() -> int:
    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)
    # The tunnel to the TPU has outages during which backend init hangs;
    # probe in killable subprocesses so an unattended run either proceeds
    # or fails with a recorded JSON line instead of hanging forever.
    if not wait_for_backend():
        print(json.dumps({
            "metric": "fused_feature_forward_throughput", "value": 0.0,
            "unit": "utterances/sec/chip", "vs_baseline": 0.0,
            "error": "accelerator backend unavailable (tunnel outage): "
                     "no successful backend init within the wait budget",
        }))
        return 1

    import jax

    configure_jax()
    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.config.schema import AudioConfig
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        CNNAudioGRU, init_model)
    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        log_mel_frontend, make_frontend_params)
    from speech_intent_recognizer_tpu.ops import frontend_numpy as golden

    audio_cfg = AudioConfig()
    fe = make_frontend_params(audio_cfg)
    # The production inference configuration (what Predictor.from_checkpoint
    # ships): BatchNorm folded into the conv kernels, bf16 compute, and the
    # FIRST CONV STAGE fused into the Pallas frontend kernel (conv1 + ReLU
    # + 2x2 pool run while the mel image is in VMEM; the conv1_external
    # model variant consumes the pooled output directly).  Waveform buffers
    # are row-aligned (padded_samples) and handed to the program as their
    # (B, t_k, hop) row view, so the kernel input is the program parameter
    # itself — no in-jit prep copy (bench_kernel_attrib.py "entry_prep").
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        conv1_external_params, fold_batchnorm)
    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        log_mel_conv1_frontend, padded_samples, rows_view)
    from speech_intent_recognizer_tpu.ops.frontend_pallas import (
        conv1_band_operands)

    init_shape = (1, audio_cfg.n_mels, audio_cfg.mel_spec_length)
    base = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
    model = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                        fold_bn=True)
    # the production recurrence: the time-blocked Pallas GRU kernel on TPU
    # (what Predictor ships — see infer/predict._default_gru_impl)
    gru_impl = "pallas" if jax.default_backend() == "tpu" else "scan"
    variant = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                          fold_bn=True, conv1_external=True,
                          gru_impl=gru_impl)
    # init on CPU (skips a large one-off accelerator compile), then upload
    try:
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            raw = init_model(base, jax.random.key(0), init_shape)
            folded = fold_batchnorm(raw["params"], raw["batch_stats"])
            var_params, c1k, c1b = conv1_external_params(folded)
        dev = jax.devices()[0]
        variables = jax.device_put({"params": folded}, dev)
        var_vars = jax.device_put({"params": var_params}, dev)
        weo = jax.device_put(conv1_band_operands(c1k, c1b,
                                                 audio_cfg.n_mels), dev)
    except RuntimeError:
        raw = init_model(base, jax.random.key(0), init_shape)
        folded = fold_batchnorm(raw["params"], raw["batch_stats"])
        var_params, c1k, c1b = conv1_external_params(folded)
        variables = {"params": folded}
        var_vars = {"params": var_params}
        weo = conv1_band_operands(c1k, c1b, audio_cfg.n_mels)

    def forward(variables, waveforms, lengths):
        pooled = log_mel_conv1_frontend(waveforms, lengths, fe, weo)
        return variant.apply(variables, pooled, train=False)

    # chained variant for sustained-throughput timing: the scalar carry makes
    # successive batches a device-side dependency chain, so the measurement
    # reflects back-to-back execution rather than per-dispatch host latency
    # (one jitted program total — first compile through the shared compile
    # service can take minutes, and the persistent cache keys on it)
    fused_chained = jax.jit(
        lambda variables, waveforms, lengths, s:
        jnp.sum(forward(variables, waveforms, lengths)) + s)

    batch = 2048
    buf_width = padded_samples(audio_cfg.max_samples, audio_cfg.hop_length)
    rng = np.random.default_rng(0)
    wav_np = np.zeros((batch, buf_width), np.float32)
    wav_np[:, :audio_cfg.max_samples] = _speech_like(
        rng, (batch, audio_cfg.max_samples))
    waveforms = jnp.asarray(wav_np)
    lengths = jnp.full((batch,), audio_cfg.max_samples, jnp.int32)

    # ---- pre-flight the conv1-fused Pallas path ----
    # The kernel's parity suite runs in interpreter mode on CPU; the Mosaic
    # lowering is first exercised on the real backend right here.  If the
    # TPU compiler rejects it (or it emits non-finite garbage), record an
    # honest number on the unfused auto-backend path instead of crashing
    # the round artifact.  (backend="auto" has its own probe+fallback in
    # frontend_jax.pallas_usable.)
    fwd_vars = var_vars
    path_kind = "pallas_conv1_fused"
    try:
        pre = np.asarray(forward(var_vars, jnp.asarray(wav_np[:8]),
                                 lengths[:8]).astype(jnp.float32))
        if not np.isfinite(pre).all():
            raise RuntimeError("non-finite logits from the fused path")
    except Exception as e:
        print(f"conv1-fused path unusable ({e}); timing the unfused "
              "auto-backend path instead", file=sys.stderr)
        path_kind = "unfused_fallback"
        fwd_vars = variables

        def forward(variables, waveforms, lengths):  # noqa: F811
            feats = log_mel_frontend(waveforms, lengths, fe, backend="auto",
                                     out_dtype=jnp.bfloat16)
            return model.apply(variables, feats, train=False)

        fused_chained = jax.jit(  # noqa: F811
            lambda variables, waveforms, lengths, s:
            jnp.sum(forward(variables, waveforms, lengths)) + s)

    # ---- on-device numerical parity gate (before any timing) ----
    # The headline must be produced by a numerically correct Mosaic-compiled
    # kernel: run a few variable-length utterances through the SAME
    # production frontend configuration and assert they match the NumPy
    # golden (the reference torchaudio contract,
    # scripts/precompute_features.py:28-73) on normalized features.
    gate_lengths = [8000, 16000, 39999, 40000, 52117, 79999,
                    audio_cfg.max_samples, 2 * audio_cfg.hop_length + 1]
    gate_buf = np.zeros((len(gate_lengths), buf_width), np.float32)
    for i, n in enumerate(gate_lengths):
        gate_buf[i, :n] = _speech_like(np.random.default_rng(i + 1), (n,))
    gate_wf = jnp.asarray(gate_buf)
    gate_ln = jnp.asarray(gate_lengths, jnp.int32)
    gate_feats = np.asarray(log_mel_frontend(gate_wf, gate_ln, fe,
                                             backend="auto"))
    gate_err = 0.0
    golden_feats = []
    for i, n in enumerate(gate_lengths):
        want = golden.pad_or_trim_np(
            golden.log_mel_spectrogram_np(gate_buf[i, :n]),
            audio_cfg.mel_spec_length)
        golden_feats.append(want.astype(np.float32))
        gate_err = max(gate_err, float(np.abs(gate_feats[i] - want).max()))
    # ...and the SHIPPED path end-to-end: conv1-fused probabilities must
    # match golden-features -> folded model probabilities (bf16 scale)
    gate_probs = np.asarray(jax.nn.softmax(
        forward(fwd_vars, gate_wf, gate_ln).astype(jnp.float32), axis=-1))
    want_probs = np.asarray(jax.nn.softmax(model.apply(
        variables, jnp.asarray(np.stack(golden_feats), jnp.float32),
        train=False).astype(jnp.float32), axis=-1))
    gate_prob_err = float(np.abs(gate_probs - want_probs).max())
    argmax_ok = bool((np.argmax(gate_probs, -1)
                      == np.argmax(want_probs, -1)).all())
    if not (gate_err < 0.05 and gate_prob_err < 0.02 and argmax_ok):
        print(json.dumps({
            "metric": "fused_feature_forward_throughput", "value": 0.0,
            "unit": "utterances/sec/chip", "vs_baseline": 0.0,
            "error": f"on-device parity gate FAILED: feature err "
                     f"{gate_err:.4f} (>=0.05?), prob err "
                     f"{gate_prob_err:.4f} (>=0.02?), argmax_ok={argmax_ok}",
        }))
        return 1

    if path_kind == "pallas_conv1_fused":
        # rows-view staging: saves the 2.0 ms/b2048 in-jit prep copy
        waveforms = jnp.asarray(
            rows_view(wav_np, audio_cfg.hop_length))

    # warmup + compile
    float(fused_chained(fwd_vars, waveforms, lengths, jnp.float32(0)))

    # best-of-k rounds: the shared accelerator link has high load variance,
    # so the max over rounds approximates uncontended hardware throughput
    iters, rounds = 20, 5
    rates = []
    for _ in range(rounds):
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fused_chained(fwd_vars, waveforms, lengths, s)
        float(s)  # materialize: fences the whole chain
        rates.append(batch * iters / (time.perf_counter() - t0))
    tpu_rate = max(rates)

    # ------- pinned CPU baseline (methodology in BENCH_NOTES.md) -------
    # BASELINE.md names "the CPU librosa baseline": librosa itself is not
    # installable here, so the feature half is the numpy golden front-end in
    # *librosa mode* (bit-matches librosa's mel/power_to_db math — the
    # reference's mic path, scripts/testing.py:197-209) and the forward half
    # is the actual torch CPU model (the reference's runtime).  64
    # utterances, best of 5 rounds, so the denominator is stable run-to-run.
    k = 64
    wf_np = wav_np[:k]

    t_feat = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        feats_np = np.stack([
            golden.pad_or_trim_np(
                golden.log_mel_spectrogram_np(w, frontend="librosa"),
                audio_cfg.mel_spec_length)
            for w in wf_np])
        t_feat = min(t_feat, time.perf_counter() - t0)

    t_fwd = _torch_cpu_forward_time(feats_np)
    if t_fwd is None:  # torch unavailable: CPU-jit forward stand-in
        t_fwd = 0.0
        try:
            cpu_dev = jax.devices("cpu")[0]
        except RuntimeError:
            cpu_dev = None
        if cpu_dev is not None:
            with jax.default_device(cpu_dev):
                model_cpu = CNNAudioGRU(num_classes=31)
                vars_cpu = jax.device_put(jax.device_get(variables), cpu_dev)
                fwd_cpu = jax.jit(
                    lambda v, x: model_cpu.apply(v, x, train=False))
                x_cpu = jax.device_put(feats_np, cpu_dev)
                fwd_cpu(vars_cpu, x_cpu).block_until_ready()  # compile
                t0 = time.perf_counter()
                fwd_cpu(vars_cpu, x_cpu).block_until_ready()
                t_fwd = time.perf_counter() - t0
    cpu_rate = k / (t_feat + t_fwd)

    # ------- MFU: hardware-relative denominator -------
    # FLOPs of the XLA-equivalent computation at the measured batch (the
    # identical math on the XLA backend; Pallas custom calls are opaque to
    # HLO cost analysis, so the equivalent program is the honest FLOP
    # count).  v5e bf16 peak: 197 TFLOP/s/chip.
    V5E_BF16_PEAK = 197e12
    mfu = tflops = None
    try:
        def xla_equiv(variables, waveforms, lengths):
            feats = log_mel_frontend(waveforms, lengths, fe, backend="xla",
                                     out_dtype=jnp.bfloat16)
            return model.apply(variables, feats, train=False)

        wf_small = jnp.asarray(wav_np[:batch, : audio_cfg.max_samples])
        ca = jax.jit(xla_equiv).lower(
            variables, wf_small, lengths).cost_analysis()
        if ca is None:
            # The tunnelled accel backend does not expose HLO cost
            # analysis; lower the identical program for CPU — the FLOP
            # count of the traced math is backend-independent.
            with jax.default_device(jax.devices("cpu")[0]):
                ca = jax.jit(xla_equiv).lower(
                    jax.device_get(variables), np.asarray(wf_small),
                    np.asarray(lengths)).cost_analysis()
        flops_batch = float(ca.get("flops", 0.0))
        if flops_batch > 0:
            achieved = flops_batch * tpu_rate / batch
            tflops = achieved / 1e12
            mfu = achieved / V5E_BF16_PEAK
    except Exception as e:
        print(f"cost analysis unavailable ({e}); MFU omitted",
              file=sys.stderr)

    print(json.dumps({
        "metric": "fused_feature_forward_throughput",
        "value": round(tpu_rate, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(tpu_rate / max(cpu_rate, 1e-9), 2),
        "detail": {
            "path": path_kind,
            "parity_gate_max_err": round(gate_err, 5),
            "parity_gate_prob_err": round(gate_prob_err, 5),
            "cpu_baseline_rate": round(cpu_rate, 2),
            "cpu_baseline": "librosa-math features + torch CPU forward, "
                            f"{k} utts, best-of-5 feat / best-of-8 fwd",
            "cpu_feat_seconds": round(t_feat, 4),
            "cpu_fwd_seconds": round(t_fwd, 4),
            "achieved_tflops": (round(tflops, 2) if tflops is not None
                                else None),
            "mfu_vs_v5e_bf16_peak": (round(mfu, 4) if mfu is not None
                                     else None),
        },
    }))
    return 0


def _torch_cpu_forward_time(feats_np) -> "float | None":
    """Batched forward of the reference architecture in torch on CPU
    (best of 8); None when torch isn't importable."""
    try:
        import torch
    except ImportError:
        return None
    nn = torch.nn

    class Ref(nn.Module):
        # reference models/models.py:5-68 layer configuration
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 32, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(32)
            self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(64)
            self.conv3 = nn.Conv2d(64, 128, 3, 1, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(128)
            self.pool = nn.MaxPool2d(2)
            self.gru = nn.GRU(1024, 256, num_layers=2, batch_first=True,
                              bidirectional=True)
            self.attention = nn.Linear(512, 1)
            self.fc = nn.Linear(512, 31)

        def forward(self, x):
            x = x.unsqueeze(1)
            x = self.pool(torch.relu(self.bn1(self.conv1(x))))
            x = self.pool(torch.relu(self.bn2(self.conv2(x))))
            x = self.pool(torch.relu(self.bn3(self.conv3(x))))
            b, c, h, w = x.size()
            x = x.permute(0, 3, 1, 2).contiguous().view(b, w, c * h)
            x, _ = self.gru(x)
            w_att = torch.softmax(self.attention(x), dim=1)
            return self.fc(torch.sum(x * w_att, dim=1))

    model = Ref().eval()
    x = torch.from_numpy(feats_np)
    with torch.no_grad():
        model(x)  # warmup
        model(x)
        best = float("inf")
        for _ in range(8):
            t0 = time.perf_counter()
            model(x)
            best = min(best, time.perf_counter() - t0)
    return best


if __name__ == "__main__":
    sys.exit(main())
