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
    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)
    # backend init HANGS during tunnel outages; record a clean skip instead
    if not wait_for_backend():
        print(json.dumps({
            "metric": "streaming_serving_capacity", "value": None,
            "unit": "concurrent real-time sessions per chip",
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

    # ---- decomposition: what limits the number above? ----------------
    # (a) per-chunk HOST cost, split into its parts.  The capacity run is
    # host-feed-bound on this 1-core container; these numbers let a reader
    # project the ceiling for a normal serving host.
    import time as _time

    from speech_intent_recognizer_tpu.infer.streaming import (
        StreamingFeaturizer)
    from speech_intent_recognizer_tpu.infer.vad import EnergyVAD

    r = np.random.default_rng(1)
    test_chunks = [
        (0.2 * np.sin(2 * np.pi * 300 * np.arange(chunk) / sr)
         + 0.02 * r.standard_normal(chunk)).astype(np.float32)
        for _ in range(64)]

    vad = EnergyVAD(0.01)
    t0 = _time.perf_counter()
    for _rep in range(8):
        for c in test_chunks:
            vad.is_speech(c)
    vad_ms = (_time.perf_counter() - t0) / (8 * len(test_chunks)) * 1e3

    feat_ms_by_mode = {}
    for mode in ("host", "native"):
        try:
            fz = StreamingFeaturizer(audio_cfg=predictor.audio_cfg,
                                     mode=mode)
        except Exception:
            continue
        if fz.mode != mode:  # native lib not built: auto-degraded
            continue
        best = float("inf")
        for _rep in range(8):
            fz.reset()
            t0 = _time.perf_counter()
            for c in test_chunks:
                fz.feed(c)
            best = min(best, _time.perf_counter() - t0)
        feat_ms_by_mode[mode] = best / len(test_chunks) * 1e3
    # what the capacity run above actually used (recognizer default "auto")
    session_mode = sessions[0]._featurizer.mode
    feat_ms = feat_ms_by_mode.get(session_mode,
                                  min(feat_ms_by_mode.values()))

    chunks_fed = total_audio * sr / chunk
    feed_ms = feed_wall / max(chunks_fed, 1) * 1e3  # full feed() incl. above

    # (b) CHIP-side ceiling: end-of-utterance device calls (the only chip
    # work per utterance) dispatched back-to-back with zero host featurize
    # (the session state is reused), drained in one batched fetch.
    ceiling_rec = sessions[0]
    n_fin = 200
    pend2 = [ceiling_rec._fused_finalize() for _ in range(4)]  # warm
    PendingResult.get_all(pend2)
    t0 = _time.perf_counter()
    pend2 = [ceiling_rec._fused_finalize() for _ in range(n_fin)]
    PendingResult.get_all(pend2)
    fin_per_s = n_fin / (_time.perf_counter() - t0)

    # (b') the BATCHED finalize path (what cli.serve deploys): N queued
    # end-of-utterance calls dispatch as ONE device program, amortizing
    # the per-dispatch link cost that bounds (b).
    from speech_intent_recognizer_tpu.infer.streaming import BatchFinalizer

    batcher = BatchFinalizer(predictor, max_batch=16)
    brec = StreamingRecognizer(predictor, chunk_size=chunk,
                               silence_limit=10.0, async_results=True,
                               batch_finalizer=batcher)
    for c in test_chunks:
        brec.feed(np.resize(c, chunk))
    brec._recording = True
    warm = [brec._fused_finalize() for _ in range(16)]
    batcher.flush()
    PendingResult.get_all(warm)
    n_bfin = 320
    t0 = _time.perf_counter()
    pend3 = []
    for _ in range(n_bfin // 16):
        pend3.extend(brec._fused_finalize() for _ in range(16))
        batcher.flush()
    PendingResult.get_all(pend3)
    bfin_per_s = n_bfin / (_time.perf_counter() - t0)
    # one utterance per session every (audio secs / classified utterance)
    utt_period = total_audio / max(results, 1)
    chip_ceiling = max(fin_per_s, bfin_per_s) * utt_period
    # host ceiling: a real-time session produces sr/chunk chunks per second
    host_ceiling = 1e3 / max(feed_ms * (sr / chunk), 1e-9)

    print(json.dumps({
        "metric": "streaming_serving_capacity",
        "value": round(capacity, 1),
        "unit": "concurrent real-time sessions per chip",
        "vs_baseline": None,
        "detail": {"utterances_classified": results,
                   "sessions_simulated": n_sessions,
                   "wall_seconds": round(wall, 1),
                   "feed_seconds": round(feed_wall, 1),
                   "result_drain_seconds": round(wall - feed_wall, 1),
                   "featurizer_mode": session_mode,
                   "host_ms_per_chunk": {
                       "vad": round(vad_ms, 4),
                       "featurize": round(feat_ms, 4),
                       "featurize_by_mode": {
                           k: round(v, 4)
                           for k, v in feat_ms_by_mode.items()},
                       "feed_total": round(feed_ms, 4)},
                   "chip_finalizes_per_s": round(fin_per_s, 1),
                   "chip_batched_finalizes_per_s": round(bfin_per_s, 1),
                   "chip_ceiling_sessions": round(chip_ceiling, 1),
                   "host_ceiling_sessions": round(host_ceiling, 1),
                   # NB: the "chip" rate is measured through the remote
                   # accelerator link, so it is dominated by per-dispatch
                   # cost — a lower bound on the real chip-compute ceiling
                   "limiting_resource": (
                       "host" if host_ceiling < chip_ceiling else
                       "chip-dispatch")},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
