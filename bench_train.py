#!/usr/bin/env python
"""Training-throughput benchmark at full-FSC scale.

Times the whole-epoch scanned trainer on a synthetic dataset the size of
Fluent Speech Commands (~23k train / 3.1k valid utterances, 64x200 features,
batch 16, reference recipe) and reports the projected wall-clock for the
full 15-epoch run — the BASELINE.md target is < 5 minutes on v4-8; a single
v5e chip must already be far under that.

Prints one JSON line: projected seconds for the full training run.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--recipe", choices=["reference", "large_batch"],
                    default="reference",
                    help="reference: the torch recipe verbatim (batch 16, "
                         "1,446 dispatches/epoch — the chip is idle most "
                         "of each step); large_batch: the TPU-native "
                         "recipe (configs/large_batch.yaml: batch 1024, "
                         "warmup+cosine), accuracy-validated on the "
                         "powered A/B corpus (BENCH_NOTES.md round 4)")
    args = ap.parse_args(argv)

    import jax

    from speech_intent_recognizer_tpu.utils.platform import configure_jax
    configure_jax()
    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.config.schema import Config
    from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
    from speech_intent_recognizer_tpu.train.loop import (
        Trainer, pad_permutation)
    from speech_intent_recognizer_tpu.train.state import (
        create_optimizer, create_train_state)

    n_train, n_valid, num_classes = 23_132, 3_118, 31
    large = args.recipe == "large_batch"
    cfg = Config.from_dict({
        "num_labels": num_classes, "epochs": 15,
        "batch_size": 1024 if large else 16,
        "lr": 5e-5, "weight_decay": 1e-4, "augment_prob": 0.7,
    })
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((n_train, 64, 200)).astype(np.float32)
    labels = rng.integers(0, num_classes, n_train).astype(np.int32)
    vfeats = jnp.asarray(feats[:n_valid])
    vlabels = jnp.asarray(labels[:n_valid])
    feats = jnp.asarray(feats)
    labels = jnp.asarray(labels)

    model = CNNAudioGRU(num_classes=num_classes,
                        compute_dtype=jnp.bfloat16)
    if large:
        # warmup+cosine over the full horizon (the accuracy-validated
        # large-batch recipe; lr value itself is timing-irrelevant here)
        steps_per_epoch = -(-n_train // cfg.train.batch_size)
        tx = create_optimizer(lr=4e-4, weight_decay=cfg.train.weight_decay,
                              grad_clip=cfg.train.grad_clip,
                              warmup_steps=max(steps_per_epoch, 20),
                              schedule="cosine",
                              total_steps=cfg.train.epochs * steps_per_epoch)
    else:
        tx = create_optimizer(lr=cfg.train.lr,
                              weight_decay=cfg.train.weight_decay,
                              grad_clip=cfg.train.grad_clip)
    state = create_train_state(model, jax.random.key(0), tx)
    trainer = Trainer(model, cfg, num_classes=num_classes, tx=tx)
    epoch_fn = trainer._build_epoch_fn()

    perm, weights = pad_permutation(jax.random.key(1), n_train,
                                    cfg.train.batch_size)
    # compile + warmup epoch. Sync by materializing the scalar metrics on
    # the host (device_get) — block_until_ready alone does not reliably
    # fence execution through remote-relay backends.
    t0 = time.perf_counter()
    state, m = epoch_fn(state, feats, labels, perm, weights,
                        jax.random.key(2))
    float(jax.device_get(m["loss"]))
    compile_and_first = time.perf_counter() - t0

    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        state, m = epoch_fn(state, feats, labels, perm, weights,
                            jax.random.key(3 + i))
        float(jax.device_get(m["loss"]))
    epoch_s = (time.perf_counter() - t0) / reps

    val = trainer.evaluate(state, vfeats, vlabels)  # compiles + syncs
    t0 = time.perf_counter()
    val = trainer.evaluate(state, vfeats, vlabels)
    val_s = time.perf_counter() - t0

    projected = cfg.train.epochs * (epoch_s + val_s)
    print(json.dumps({
        "metric": "projected_full_fsc_training_time",
        "value": round(projected, 2),
        "unit": (f"seconds (15 epochs, 23k utts, "
                 f"batch {cfg.train.batch_size}, 1 chip)"),
        "vs_baseline": round(300.0 / max(projected, 1e-9), 2),
        "detail": {
            "recipe": args.recipe,
            "epoch_seconds": round(epoch_s, 3),
            "validation_seconds": round(val_s, 3),
            "first_epoch_with_compile": round(compile_and_first, 2),
            "steps_per_epoch": int(perm.shape[0]),
            "train_loss": round(float(m["loss"]), 4),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
