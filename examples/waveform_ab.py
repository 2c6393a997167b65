#!/usr/bin/env python
"""Waveform-resident vs feature-cached convergence A/B (same framework).

The reference trains from cached features only; its waveform augmentation
(``scripts/augment.py:98-135``) is imported by nothing and can never run.
This framework's ``data.train_on_waveforms`` keeps int16 waveforms device
-resident and featurizes INSIDE the jitted train step, which makes
waveform-domain augmentation (``ops/augment.py``) a live, config-gated
capability.  This A/B validates the mode on the deterministic 3,040-utt
synthetic corpus (the powered-A/B corpus, ``examples/make_ab_corpus.py
--profile harder``): waveform-resident training — with and without
waveform augmentation — must match or beat the feature-cached path's
held-out accuracy, with the identical recipe, split and seeds, and the
per-side wall-clock is reported (the e2e cost of featurize-in-step).

    python examples/waveform_ab.py --seeds 5 --epochs 20 --out /tmp/wab.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NUM_CLASSES = 19
LR = 1e-3
WD = 1e-4
CLIP = 1.0
BATCH = 8

CORPUS_CANDIDATES = ("/root/ab_corpus_harder", "/tmp/sir_ab_corpus_harder")


def ensure_corpus() -> str:
    """Reuse (or synthesize) the shared 3,040-utt A/B corpus directory."""
    for cand in CORPUS_CANDIDATES:
        npz = os.path.join(cand, "features.npz")
        if os.path.exists(npz):
            d = np.load(npz)
            if d["features"].shape == (3040, 64, 200):
                return cand
    out = CORPUS_CANDIDATES[-1]
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(here, "examples", "make_ab_corpus.py"),
         "--variants", "80", "--profile", "harder", "--seed", "0",
         "--out", out],
        cwd=here, capture_output=True, text=True, timeout=3000)
    if proc.returncode != 0:
        raise RuntimeError(f"corpus generation failed:\n{proc.stdout[-1500:]}"
                           f"\n{proc.stderr[-1500:]}")
    return out


def stratified_split(labels: np.ndarray, holdout_frac: float):
    """Deterministic per-class holdout — identical indices to
    ``examples/convergence_ab.py::load_features_npz`` (rng(0))."""
    rng = np.random.default_rng(0)
    tr, he = [], []
    for c in np.unique(labels):
        idx = np.flatnonzero(labels == c)
        rng.shuffle(idx)
        k = max(1, int(round(len(idx) * holdout_frac)))
        he.extend(idx[:k])
        tr.extend(idx[k:])
    return np.sort(np.asarray(tr)), np.sort(np.asarray(he))


def load_waveforms(corpus_dir: str, labels: np.ndarray,
                   classes: np.ndarray):
    """Decode the corpus wavs in manifest order into the int16 cache
    (``data/cache.py::precompute_waveforms`` — the real waveform-mode
    ingest path), reusing a previously built cache file when present."""
    from speech_intent_recognizer_tpu.config.schema import AudioConfig
    from speech_intent_recognizer_tpu.data import cache as cache_mod
    from speech_intent_recognizer_tpu.data.manifest import Manifest

    paths = sorted(glob.glob(os.path.join(corpus_dir, "audio", "utt_*.wav")))
    if len(paths) != len(labels):
        raise RuntimeError(f"corpus mismatch: {len(paths)} wavs vs "
                           f"{len(labels)} feature rows")
    cache_npy = os.path.join(corpus_dir, "waveforms_int16.npy")
    audio_cfg = AudioConfig()
    if os.path.exists(cache_npy):
        waves = np.load(cache_npy, mmap_mode="r")
        lengths = np.load(cache_npy + ".lengths.npy")
        if waves.shape == (len(paths), audio_cfg.max_samples):
            return np.asarray(waves), lengths
    label_map = {str(c): i for i, c in enumerate(classes)}
    manifest = Manifest(paths=paths,
                        labels=[str(classes[l]) for l in labels])
    t0 = time.perf_counter()
    waves, lengths, lab2, ok, _ = cache_mod.precompute_waveforms(
        manifest, label_map, audio_cfg, progress=False,
        waves_out=cache_npy)
    decode_s = time.perf_counter() - t0
    if not ok.all() or not np.array_equal(lab2, labels.astype(np.int32)):
        raise RuntimeError("waveform decode mismatch vs feature corpus")
    np.save(cache_npy + ".lengths.npy", lengths)
    print(f"decoded {len(paths)} wavs -> int16 cache in {decode_s:.1f}s",
          flush=True)
    return np.asarray(waves), lengths


def run_side(mode: str, train_x, train_y, val_x, val_y, epochs: int,
             seed: int, train_len=None, val_len=None):
    """One training run; ``mode`` in {feat, wave, wave_aug}.  Identical
    recipe + init/dropout seed streams across modes (the feature-path RNG
    stream is preserved exactly by design — train/loop.py)."""
    import jax
    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.config.schema import Config
    from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
    from speech_intent_recognizer_tpu.train.loop import Trainer
    from speech_intent_recognizer_tpu.train.state import (
        create_optimizer, create_train_state)

    from_waveforms = mode != "feat"
    cfg = Config.from_dict({
        "num_labels": NUM_CLASSES, "epochs": epochs, "batch_size": BATCH,
        "lr": LR, "weight_decay": WD, "grad_clip": CLIP, "bf16": False,
        "use_augmentation": False, "use_mixup": False,
        "train_on_waveforms": from_waveforms,
        "use_waveform_augment": mode == "wave_aug",
        "augment_prob": 0.5,
        "seed": 100 * seed + 3,
        "early_stop_patience": epochs, "early_stop_delta": 0.0,
    })
    model = CNNAudioGRU(num_classes=NUM_CLASSES)
    tx = create_optimizer(lr=LR, weight_decay=WD, grad_clip=CLIP)
    state = create_train_state(model, jax.random.key(100 * seed + 42), tx)
    trainer = Trainer(model, cfg, tx=tx, num_classes=NUM_CLASSES,
                      from_waveforms=from_waveforms)
    t0 = time.perf_counter()
    _, result = trainer.fit(
        state, jnp.asarray(train_x), jnp.asarray(train_y.astype(np.int32)),
        jnp.asarray(val_x), jnp.asarray(val_y.astype(np.int32)),
        log=lambda *_: None,
        train_lengths=(None if train_len is None
                       else jnp.asarray(train_len)),
        val_lengths=(None if val_len is None else jnp.asarray(val_len)))
    wall = time.perf_counter() - t0
    return float(result.best_val_acc), wall, result.epochs_run


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)

    if not wait_for_backend():
        print(json.dumps({"error": "accelerator backend unavailable"}))
        return 3
    configure_jax()

    corpus = ensure_corpus()
    d = np.load(os.path.join(corpus, "features.npz"))
    feats = d["features"].astype(np.float32)
    labels = d["labels"].astype(np.int64)
    classes = d["classes"]
    waves, lengths = load_waveforms(corpus, labels, classes)
    tr, he = stratified_split(labels, 0.2)
    print(f"corpus {corpus}: {len(tr)} train / {len(he)} holdout",
          flush=True)

    sides = {"feat": {}, "wave": {}, "wave_aug": {}}
    accs = {k: [] for k in sides}
    walls = {k: [] for k in sides}
    for seed in range(args.seeds):
        for mode in sides:
            if mode == "feat":
                a, w, ep = run_side(mode, feats[tr], labels[tr],
                                    feats[he], labels[he],
                                    args.epochs, seed)
            else:
                a, w, ep = run_side(mode, waves[tr], labels[tr],
                                    waves[he], labels[he],
                                    args.epochs, seed,
                                    train_len=lengths[tr],
                                    val_len=lengths[he])
            accs[mode].append(a)
            walls[mode].append(w)
            print(f"seed {seed} {mode}: best holdout acc {a:.4f} "
                  f"({w:.1f}s, {ep} epochs)", flush=True)

    def stats(xs):
        return {"mean": round(float(np.mean(xs)), 4),
                "std": round(float(np.std(xs)), 4),
                "accs": [round(float(x), 4) for x in xs]}

    n = max(args.seeds, 1)
    sem_pair = float(np.sqrt(np.var(accs["feat"]) / n
                             + np.var(accs["wave"]) / n))
    result = {
        "metric": "waveform_resident_ab",
        "corpus": corpus,
        "seeds": args.seeds,
        "epochs": args.epochs,
        "recipe": {"lr": LR, "weight_decay": WD, "grad_clip": CLIP,
                   "batch": BATCH},
        "feature_cached": stats(accs["feat"]),
        "waveform_resident": stats(accs["wave"]),
        "waveform_resident_augmented": stats(accs["wave_aug"]),
        "wall_s_per_run": {k: round(float(np.mean(v)), 1)
                           for k, v in walls.items()},
        # pass = waveform-resident matches feature-cached within 2 SEM
        # of the mean difference (and augment side reported alongside)
        "pass": bool(np.mean(accs["wave"])
                     >= np.mean(accs["feat"]) - 2 * sem_pair - 1e-9),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
