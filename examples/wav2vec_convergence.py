#!/usr/bin/env python
"""wav2vec2-base convergence validation: large-batch recipe vs reference
recipe, same corpus, same seeds.

The reference's (bytecode-only) wav2vec trainer fine-tunes at batch 8
with constant LR + ReduceLROnPlateau — the recipe `configs/
wav2vec_large_batch.yaml` replaces with b64 + warmup->cosine at scaled LR.
Pretrained ``facebook/wav2vec2-base`` weights cannot be downloaded here
(zero egress), so both sides train the SAME random init end to end (no
frozen extractor — freezing random conv features would cripple both
sides identically and measure nothing) on the deterministic 3,040-utt
synthetic corpus.  Pass = the large-batch side matches or beats the
reference-shaped side's best held-out accuracy, in less wall-clock.

    python examples/wav2vec_convergence.py --seeds 2 --epochs 15 \
        --out /tmp/w2v_conv.json
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from waveform_ab import ensure_corpus, stratified_split  # noqa: E402

NUM_CLASSES = 19


def run_side(recipe: str, paths, labels, v_paths, v_labels, epochs: int,
             seed: int):
    """recipe: "reference" (b8, constant 1e-4, plateau decay) or
    "large_batch" (b64, 3e-4, 1-epoch warmup -> cosine)."""
    import jax
    import jax.numpy as jnp
    from transformers import Wav2Vec2Config

    from speech_intent_recognizer_tpu.models.wav2vec import (
        Wav2VecIntent, init_wav2vec)
    from speech_intent_recognizer_tpu.train.wav2vec_trainer import (
        Wav2VecTrainer, create_wav2vec_optimizer)

    config = Wav2Vec2Config()
    model = Wav2VecIntent(config=config, num_classes=NUM_CLASSES,
                          compute_dtype=jnp.bfloat16)
    params = init_wav2vec(model, jax.random.key(100 * seed + 7),
                          input_length=int(3.0 * 16000))["params"]
    if recipe == "reference":
        batch = 8
        tx = create_wav2vec_optimizer(lr=1e-4, weight_decay=0.01,
                                      grad_clip=1.0)
    else:
        batch = 64
        steps_per_epoch = -(-len(paths) // batch)
        tx = create_wav2vec_optimizer(
            lr=3e-4, weight_decay=0.01, grad_clip=1.0,
            warmup_steps=steps_per_epoch,
            decay_steps=epochs * steps_per_epoch)
    trainer = Wav2VecTrainer(model, tx, num_classes=NUM_CLASSES)
    t0 = time.perf_counter()
    _, result = trainer.fit(params, paths, labels, v_paths, v_labels,
                            epochs=epochs, batch_size=batch,
                            seed=100 * seed + 3, early_stop_patience=epochs,
                            log=lambda *_: None)
    wall = time.perf_counter() - t0
    epoch_s = [e["seconds"] for e in result["history"]]
    return (float(result["best_val_acc"]), wall,
            float(np.median(epoch_s[1:] or epoch_s)))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=15)
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
    labels = d["labels"].astype(np.int32)
    paths = sorted(glob.glob(os.path.join(corpus, "audio", "utt_*.wav")))
    if len(paths) != len(labels):
        raise RuntimeError("corpus mismatch")
    tr, he = stratified_split(labels, 0.2)
    tr_paths = [paths[i] for i in tr]
    he_paths = [paths[i] for i in he]
    print(f"corpus {corpus}: {len(tr)} train / {len(he)} holdout",
          flush=True)

    accs = {"reference": [], "large_batch": []}
    walls = {"reference": [], "large_batch": []}
    epochs_s = {"reference": [], "large_batch": []}
    for seed in range(args.seeds):
        for recipe in ("reference", "large_batch"):
            a, w, es = run_side(recipe, tr_paths, labels[tr].tolist(),
                                he_paths, labels[he].tolist(),
                                args.epochs, seed)
            accs[recipe].append(a)
            walls[recipe].append(w)
            epochs_s[recipe].append(es)
            print(f"seed {seed} {recipe}: best holdout acc {a:.4f} "
                  f"({w:.1f}s wall, {es:.1f}s/epoch)", flush=True)

    def stats(xs):
        return {"mean": round(float(np.mean(xs)), 4),
                "accs": [round(float(x), 4) for x in xs]}

    result = {
        "metric": "wav2vec_large_batch_convergence",
        "corpus": corpus,
        "seeds": args.seeds,
        "epochs": args.epochs,
        "reference_recipe_b8": {**stats(accs["reference"]),
                                "wall_s": round(float(np.mean(
                                    walls["reference"])), 1),
                                "epoch_s": round(float(np.median(
                                    epochs_s["reference"])), 1)},
        "large_batch_b64": {**stats(accs["large_batch"]),
                            "wall_s": round(float(np.mean(
                                walls["large_batch"])), 1),
                            "epoch_s": round(float(np.median(
                                epochs_s["large_batch"])), 1)},
        "pass": bool(np.mean(accs["large_batch"])
                     >= np.mean(accs["reference"]) - 0.02),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line)
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
