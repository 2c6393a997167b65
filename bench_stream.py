#!/usr/bin/env python
"""Streaming inference latency benchmark.

Replays utterances through the full streaming stack (VAD -> incremental
log-mel -> finalize -> classifier) and measures the **end-of-speech to
result** latency: the time between the silence-threshold chunk arriving and
the intent result being available — the interactive metric of the live mic
demo (BASELINE.md: measured p50 end-to-end latency).

Prints one JSON line with p50/p90 milliseconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

SR, CHUNK, SILENCE_LIMIT = 16000, 1024, 0.5


def make_utterance(rng, seconds):
    n = int(seconds * SR)
    t = np.arange(n) / SR
    x = (0.2 * np.sin(2 * np.pi * 280 * t)
         + 0.02 * rng.standard_normal(n)).astype(np.float32)
    return np.concatenate([x, np.zeros(int(SR * (SILENCE_LIMIT + 0.2)),
                                       np.float32)])


def measure_eos_latency(rec, rng, trials=30):
    """p50/p90 of end-of-speech -> result across replayed utterances."""
    latencies = []
    for trial in range(trials):
        stream = make_utterance(rng, 1.0 + (trial % 5) * 0.4)
        result = None
        for i in range(0, len(stream) - CHUNK, CHUNK):
            t0 = time.perf_counter()
            result = rec.feed(stream[i : i + CHUNK])
            if result is not None:
                latencies.append((time.perf_counter() - t0) * 1000.0)
                break
        if result is None:
            rec.flush()
    return np.asarray(latencies)


def local_artifact_main(artifact_dir: str) -> int:
    """Subprocess mode: replay the same streams against the exported CPU
    artifact (``infer/export.py::export_streaming``) on the LOCAL backend —
    the latency a deployed serving host sees, with no tunnel in the loop."""
    import jax

    jax.config.update("jax_platforms", "cpu")

    from speech_intent_recognizer_tpu.infer.export import (
        StreamingArtifactPredictor)
    from speech_intent_recognizer_tpu.infer.streaming import (
        StreamingRecognizer)

    sp = StreamingArtifactPredictor.load(artifact_dir)
    rec = StreamingRecognizer(sp, chunk_size=CHUNK, threshold=0.01,
                              silence_limit=SILENCE_LIMIT)
    rng = np.random.default_rng(0)
    for c in np.array_split(make_utterance(rng, 1.0), 40):  # compile
        rec.feed(np.resize(c, CHUNK))
    rec.flush()

    # per-chunk feed cost (host featurizer only — no device work)
    stream = make_utterance(rng, 2.0)
    feed_ms = []
    for i in range(0, len(stream) - CHUNK, CHUNK):
        t0 = time.perf_counter()
        rec.feed(stream[i : i + CHUNK])
        feed_ms.append((time.perf_counter() - t0) * 1000.0)
    rec.flush()

    lat = measure_eos_latency(rec, rng)
    print(json.dumps({
        "p50_ms": round(float(np.percentile(lat, 50)), 3),
        "p90_ms": round(float(np.percentile(lat, 90)), 3),
        "n": int(lat.size),
        "feed_p50_ms": round(float(np.percentile(feed_ms, 50)), 4),
        "platform": jax.default_backend(),
    }))
    return 0


def main() -> int:
    if len(sys.argv) == 3 and sys.argv[1] == "--local-artifact":
        return local_artifact_main(sys.argv[2])
    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)
    # backend init HANGS during tunnel outages; record a clean skip instead
    if not wait_for_backend():
        print(json.dumps({
            "metric": "streaming_eos_latency_p50", "value": None,
            "unit": "ms",
            "error": "accelerator backend unavailable (tunnel outage)"}))
        return 3

    import jax

    configure_jax()

    from speech_intent_recognizer_tpu.infer.predict import Predictor
    from speech_intent_recognizer_tpu.infer.streaming import (
        StreamingRecognizer)
    from speech_intent_recognizer_tpu.models.cnn_gru import (
        CNNAudioGRU, init_model)

    model = CNNAudioGRU(num_classes=31)
    variables = init_model(model, jax.random.key(0))
    label_map = {f"intent_{i}": i for i in range(31)}
    predictor = Predictor(model, variables, label_map)

    rng = np.random.default_rng(0)
    chunk = CHUNK
    rec = StreamingRecognizer(predictor, chunk_size=chunk, threshold=0.01,
                              silence_limit=SILENCE_LIMIT)

    # warmup (compiles the incremental featurizer + classifier)
    for c in np.array_split(make_utterance(rng, 1.0), 40):
        rec.feed(np.resize(c, chunk))
    rec.flush()

    lat = measure_eos_latency(rec, rng)

    # ---- latency decomposition: link RTT vs device compute ----
    # On this container the accelerator sits behind a shared tunnel whose
    # round-trip dominates single-shot latency; report the components so
    # the artifact states what a serving host would actually see.
    import jax.numpy as jnp

    # (a) minimal round trip: dispatch a trivial jitted op + sync a scalar
    tiny = jax.jit(lambda s: s + 1.0)
    x = jnp.float32(0)
    float(tiny(x))  # compile
    rtts = []
    for _ in range(30):
        t0 = time.perf_counter()
        x = tiny(x)
        float(x)
        rtts.append((time.perf_counter() - t0) * 1000.0)
    rtt_p50 = float(np.percentile(rtts, 50))

    # (b) pure device cost of one fused finalize: chain K calls through a
    # scalar carry (one sync total), so per-call dispatch/RTT amortizes
    # away — the same methodology as bench_serve's chip ceiling.
    run = rec._shared_jit("fused_finalize", rec._build_fused_finalize)
    fz = rec._featurizer
    tmax, n_mels = fz.params.target_length, fz.params.n_mels
    mel_buf = jnp.asarray(rng.standard_normal((tmax, n_mels)),
                          jnp.float32)
    tail = jnp.zeros((rec._TAIL_MAX, fz.n_fft), jnp.float32)

    chained = jax.jit(
        lambda v, mb, c, t, n, s:
        jnp.sum(run(v, mb + 0 * s, c, t, n)) + s)
    float(chained(predictor.variables, mel_buf, jnp.int32(100), tail,
                  jnp.int32(1), jnp.float32(0)))  # compile
    k = 50
    best_dev = float("inf")
    for _ in range(3):
        s = jnp.float32(0)
        t0 = time.perf_counter()
        for _ in range(k):
            s = chained(predictor.variables, mel_buf, jnp.int32(100),
                        tail, jnp.int32(1), s)
        float(s)
        best_dev = min(best_dev, (time.perf_counter() - t0) / k)
    device_ms = best_dev * 1000.0

    # ---- (c) deployed-artifact p50: export the streaming finalize as a
    # CPU artifact (infer/export.py::export_streaming) and replay the same
    # streams in a CPU-pinned subprocess — the end-of-speech latency a
    # local serving host sees, with no tunnel in the loop.
    local = None
    try:
        from speech_intent_recognizer_tpu.infer.export import (
            export_streaming)

        with tempfile.TemporaryDirectory(prefix="sir_stream_aot_") as d:
            export_streaming(predictor, d, platforms=["cpu"])
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--local-artifact", d],
                capture_output=True, text=True, timeout=600,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            local = json.loads(proc.stdout.strip().splitlines()[-1])
    except Exception as e:  # report the tunnel numbers regardless
        local = {"error": f"{type(e).__name__}: {e}"}

    p50 = float(np.percentile(lat, 50))
    print(json.dumps({
        "metric": "streaming_end_of_speech_latency",
        "value": round(p50, 2),
        "unit": "ms (p50)",
        "vs_baseline": None,
        "detail": {"p90_ms": round(float(np.percentile(lat, 90)), 2),
                   "n": int(lat.size),
                   "local_artifact": local,
                   "link_rtt_p50_ms": round(rtt_p50, 2),
                   "device_compute_ms_per_finalize": round(device_ms, 3),
                   "host_plus_queue_ms": round(
                       max(p50 - rtt_p50 - device_ms, 0.0), 2),
                   "note": "p50 through this container's shared tunnel; "
                           "device_compute is an upper bound (chained "
                           "dispatch cost at B=1 does not fully amortize "
                           "over the tunnel); a local-chip serving host "
                           "sees ~device_compute + sub-ms host feed"},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
