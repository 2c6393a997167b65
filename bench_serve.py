#!/usr/bin/env python
"""Serving-capacity benchmark: concurrent streaming sessions.

Simulates N independent microphone sessions feeding audio chunks
round-robin into shared-model streaming recognizers (compiled functions are
shared across sessions via the predictor jit cache) and measures how many
*real-time audio seconds per wall second* one chip sustains — the capacity
number for deploying the live-intent service.

Prints one JSON line: concurrent real-time sessions supported per chip.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax

    from speech_intent_recognizer_tpu.utils.platform import configure_jax
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

    sr, chunk = 16000, 1024
    n_sessions = 16
    rng = np.random.default_rng(0)
    # async_results: end-of-utterance device calls are dispatched without
    # blocking on their values, so one session's classify round trip
    # overlaps every other session's feature work — the serving mode.
    sessions = [StreamingRecognizer(predictor, chunk_size=chunk,
                                    threshold=0.01, silence_limit=0.4,
                                    async_results=True)
                for _ in range(n_sessions)]

    def utterance_stream(seed):
        r = np.random.default_rng(seed)
        while True:
            dur = float(r.uniform(0.8, 2.5))
            n = int(dur * sr)
            t = np.arange(n) / sr
            x = (0.2 * np.sin(2 * np.pi * r.uniform(200, 400) * t)
                 + 0.02 * r.standard_normal(n)).astype(np.float32)
            yield from np.array_split(x, max(1, n // chunk))
            silence = np.zeros(int(0.6 * sr), np.float32)
            yield from np.array_split(silence, max(1, len(silence) // chunk))

    streams = [utterance_stream(i) for i in range(n_sessions)]

    # warmup: compile the shared streaming functions once
    for _ in range(60):
        sessions[0].feed(np.resize(next(streams[0]), chunk))
    sessions[0].flush()

    total_audio = 0.0
    pending = []
    t0 = time.perf_counter()
    duration = 20.0
    while time.perf_counter() - t0 < duration:
        for s, st in zip(sessions, streams):
            piece = np.resize(next(st), chunk)
            r = s.feed(piece)
            if r is not None:
                pending.append(r)
            total_audio += chunk / sr
    feed_wall = time.perf_counter() - t0
    # materialize all in-flight results in one batched fetch; through a
    # remote accelerator link per-result fetches would otherwise dominate
    from speech_intent_recognizer_tpu.infer.streaming import PendingResult
    PendingResult.get_all(pending)
    wall = time.perf_counter() - t0
    results = len(pending)

    capacity = total_audio / wall  # audio seconds processed per wall second
    print(json.dumps({
        "metric": "streaming_serving_capacity",
        "value": round(capacity, 1),
        "unit": "concurrent real-time sessions per chip",
        "vs_baseline": None,
        "detail": {"utterances_classified": results,
                   "sessions_simulated": n_sessions,
                   "wall_seconds": round(wall, 1),
                   "feed_seconds": round(feed_wall, 1),
                   "result_drain_seconds": round(wall - feed_wall, 1)},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
