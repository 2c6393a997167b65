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
    import jax

    from speech_intent_recognizer_tpu.utils.platform import configure_jax
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
    # ships): BatchNorm folded into the conv kernels, bf16 compute, bf16
    # feature handoff from the fused Pallas frontend (backend="auto").
    model = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16,
                        fold_bn=True)
    # init on CPU (skips a large one-off accelerator compile), then upload
    from speech_intent_recognizer_tpu.models.cnn_gru import fold_batchnorm
    init_shape = (1, audio_cfg.n_mels, audio_cfg.mel_spec_length)
    base = CNNAudioGRU(num_classes=31, compute_dtype=jnp.bfloat16)
    try:
        cpu0 = jax.devices("cpu")[0]
        with jax.default_device(cpu0):
            raw = init_model(base, jax.random.key(0), init_shape)
            variables = {"params": fold_batchnorm(raw["params"],
                                                  raw["batch_stats"])}
        variables = jax.device_put(variables, jax.devices()[0])
    except RuntimeError:
        raw = init_model(base, jax.random.key(0), init_shape)
        variables = {"params": fold_batchnorm(raw["params"],
                                              raw["batch_stats"])}

    def forward(variables, waveforms, lengths):
        feats = log_mel_frontend(waveforms, lengths, fe, backend="auto",
                                 out_dtype=jnp.bfloat16)
        return model.apply(variables, feats, train=False)

    # chained variant for sustained-throughput timing: the scalar carry makes
    # successive batches a device-side dependency chain, so the measurement
    # reflects back-to-back execution rather than per-dispatch host latency
    # (one jitted program total — first compile through the shared compile
    # service can take minutes, and the persistent cache keys on it)
    fused_chained = jax.jit(
        lambda variables, waveforms, lengths, s:
        jnp.sum(forward(variables, waveforms, lengths)) + s)

    batch = 2048
    rng = np.random.default_rng(0)
    waveforms = jnp.asarray(_speech_like(rng, (batch, audio_cfg.max_samples)))
    lengths = jnp.full((batch,), audio_cfg.max_samples, jnp.int32)

    # warmup + compile
    float(fused_chained(variables, waveforms, lengths, jnp.float32(0)))

    # best-of-k rounds: the shared accelerator link has high load variance,
    # so the max over rounds approximates uncontended hardware throughput
    iters, rounds = 20, 5
    rates = []
    for _ in range(rounds):
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(iters):
            s = fused_chained(variables, waveforms, lengths, s)
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
    wf_np = np.asarray(waveforms[:k])

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

    print(json.dumps({
        "metric": "fused_feature_forward_throughput",
        "value": round(tpu_rate, 2),
        "unit": "utterances/sec/chip",
        "vs_baseline": round(tpu_rate / max(cpu_rate, 1e-9), 2),
        "detail": {
            "cpu_baseline_rate": round(cpu_rate, 2),
            "cpu_baseline": "librosa-math features + torch CPU forward, "
                            f"{k} utts, best-of-5 feat / best-of-8 fwd",
            "cpu_feat_seconds": round(t_feat, 4),
            "cpu_fwd_seconds": round(t_fwd, 4),
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
