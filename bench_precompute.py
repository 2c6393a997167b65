#!/usr/bin/env python
"""Precompute-stage floor decomposition: decode / stage+dispatch / fetch /
serialize, per wire format.

Round-4 verdict: the FSC-scale dress rehearsal spent 657.6 s (74% of e2e)
in feature precompute, of which device featurization was ~0.6 s — the rest
was staging 41 MB/batch of zero-padded float32 waveforms through the
tunnel, fetching float32 features back, and the end-of-run ``np.savez``
copy.  This bench measures each component of the rebuilt stage
(``data/cache.py::precompute_features``) so the remaining floor is
attributable:

* ``int16`` wire (default): half the staged bytes; bit-identical features
  for PCM16 sources (the reference's own corpus format,
  ``scripts/precompute_features.py:124-139`` stages float tensors).
* pipelined fetch: batch k's device->host readback overlaps batch k+1's
  staging + compute (JAX async dispatch).
* ``int16`` fetch (default): features quantize ON DEVICE with a
  per-utterance scale before readback — half the return wire bytes,
  <=1.5e-4 absolute error (cache stays float32).
* memmap serialization: features stream to the final ``.npy`` during the
  loop; the ``.npz`` build is one sequential zip-store disk copy.

Usage: python bench_precompute.py [--utts 8192] [--batch_size 128]
Prints one JSON line with the (wire, fetch, batch) matrix's stage tables.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def build_corpus(out_dir: str, utts: int, seed: int) -> tuple:
    """PCM16 mono 16 kHz wavs with FSC-like length spread (1.5-4.5 s)."""
    from speech_intent_recognizer_tpu.data.audio_io import save_wav

    rng = np.random.default_rng(seed)
    paths, labels = [], []
    os.makedirs(out_dir, exist_ok=True)
    for i in range(utts):
        n = int(16000 * rng.uniform(1.5, 4.5))
        t = np.arange(n, dtype=np.float32) / 16000.0
        f0 = 140.0 + 40.0 * (i % 19)
        x = (0.25 * np.sin(2 * np.pi * f0 * t)
             + 0.05 * rng.standard_normal(n)).astype(np.float32)
        p = os.path.join(out_dir, f"u{i:06d}.wav")
        save_wav(p, x, 16000)
        paths.append(p)
        labels.append(f"c{i % 19}")
    return paths, labels


def run_stage(manifest, label_map, audio_cfg, batch_size: int,
              wire_dtype: str, fetch_dtype: str, cache_path: str) -> dict:
    from speech_intent_recognizer_tpu.data import cache as cache_mod

    timings: dict = {}
    tmp_npy = cache_path + ".features.tmp.npy"
    t0 = time.perf_counter()
    feats, labels, ok, paths = cache_mod.precompute_features(
        manifest, label_map, audio_cfg, batch_size=batch_size,
        progress=False, wire_dtype=wire_dtype, fetch_dtype=fetch_dtype,
        features_out=tmp_npy, timings=timings)
    t_loop = time.perf_counter() - t0
    t0 = time.perf_counter()
    cache_mod.save_cache(cache_path, feats, labels, paths, label_map,
                         audio_cfg)
    t_save = time.perf_counter() - t0
    del feats
    os.unlink(tmp_npy)
    n = len(labels)
    return {
        "wire": wire_dtype,
        "fetch": fetch_dtype,
        "batch_size": batch_size,
        "loop_s": round(t_loop, 2),
        "save_npz_s": round(t_save, 2),
        "total_s": round(t_loop + t_save, 2),
        "utt_per_s": round(n / (t_loop + t_save), 1),
        "decode_s": round(timings["decode_s"], 2),
        "stage_dispatch_s": round(timings["stage_dispatch_s"], 2),
        "fetch_s": round(timings["fetch_s"], 2),
        "ok": int(ok.sum()),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--utts", type=int, default=8192)
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--out", default=None,
                    help="corpus dir (default: temp, removed after)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)

    if not wait_for_backend():
        print(json.dumps({"metric": "precompute_throughput", "value": 0.0,
                          "unit": "utterances/sec",
                          "error": "accelerator backend unavailable"}))
        return 3 if os.environ.get("SIR_TPU_REQUIRE_ACCEL") == "1" else 1
    configure_jax()

    from speech_intent_recognizer_tpu.config.schema import AudioConfig
    from speech_intent_recognizer_tpu.data.manifest import Manifest

    tmp_ctx = None
    out_dir = args.out
    if out_dir is None:
        tmp_ctx = tempfile.TemporaryDirectory(prefix="bench_precompute_")
        out_dir = tmp_ctx.name

    t0 = time.perf_counter()
    paths, labels = build_corpus(os.path.join(out_dir, "audio"), args.utts,
                                 args.seed)
    gen_s = time.perf_counter() - t0
    manifest = Manifest(paths=paths, labels=labels)
    label_map = {f"c{i}": i for i in range(19)}
    audio_cfg = AudioConfig()

    # (wire, fetch, batch) matrix: the f32/f32 row is the round-4
    # baseline behavior; int16_packed staging + int16 quantized readback
    # is the shipped default; the b512 row probes per-batch round-trip
    # amortization on the tunnel.
    combos = [
        ("float32", "float32", args.batch_size),
        ("int16", "float32", args.batch_size),
        ("int16_packed", "float32", args.batch_size),
        ("int16_packed", "int16", args.batch_size),
        ("int16_packed", "int16", 4 * args.batch_size),
    ]
    results = {}
    for wire, fetch, bs in combos:
        key = f"{wire}+{fetch}@b{bs}"
        cache_path = os.path.join(out_dir, "bench_features.npz")
        # warm run (compiles) then measured run
        run_stage(Manifest(paths=paths[: 2 * bs], labels=labels[: 2 * bs]),
                  label_map, audio_cfg, bs, wire, fetch, cache_path)
        results[key] = run_stage(manifest, label_map, audio_cfg,
                                 bs, wire, fetch, cache_path)

    f32 = results[f"float32+float32@b{args.batch_size}"]
    best = max(results.values(), key=lambda r: r["utt_per_s"])
    print(json.dumps({
        "metric": "precompute_throughput",
        "value": best["utt_per_s"],
        "unit": "utterances/sec (int16_packed wire, decode+device+serialize)",
        "vs_baseline": round(best["utt_per_s"] / max(f32["utt_per_s"], 1e-9),
                             2),
        "utts": args.utts,
        "batch_size": args.batch_size,
        "corpus_gen_s": round(gen_s, 1),
        "stages": results,
    }))
    if tmp_ctx is not None:
        tmp_ctx.cleanup()
    return 0


if __name__ == "__main__":
    sys.exit(main())
