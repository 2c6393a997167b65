#!/usr/bin/env python
"""FSC-scale pipeline dress rehearsal: the full 4-stage ``run_pipeline``
over a ~30k-utterance on-disk corpus.

The reference's headline workflow is ``run_pipeline.py:39-211`` over the
Fluent Speech Commands dataset (23,132 train / 3,118 valid / 3,793 test
wav files); its hot loop is the per-file decode/validate pass
(``scripts/preprocess_fsc.py:118-122``).  The FSC audio cannot ship here
(zero egress), so this bench synthesizes a corpus of the same shape —
19 classes x ~1,582 variants = 30,043 on-disk wav files, FSC split
proportions — and runs the real pipeline CLI end to end ONCE, recording
per-stage wall-clock: preprocess (30k native decodes + validation),
feature precompute (device-batched featurization + .npz cache build),
training (reference recipe: 15 epochs, batch 16, bf16), evaluation.

Prints one JSON line with the stage table.  The corpus is generated once
(~2 GB under --out) and reused; --force regenerates.
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "examples"))

# FSC split sizes (fluent_speech_commands_dataset/data/*_data.csv)
FSC_SPLITS = {"train": 23132, "valid": 3118, "test": 3793}


def build_corpus(out_dir: str, utts: int, profile: str, seed: int,
                 force: bool) -> str:
    """Synthesize the wav corpus + manifest.csv; returns the manifest path.

    Reuses ``examples/make_ab_corpus.synthesize`` (deterministic TTS +
    rate/gain/noise jitter) at FSC scale.
    """
    manifest_csv = os.path.join(out_dir, "manifest.csv")
    if not force and os.path.exists(manifest_csv):
        with open(manifest_csv, newline="") as f:
            rows = sum(1 for _ in f) - 1
        if rows >= utts:
            return manifest_csv
    import make_ab_corpus

    sentences = os.path.join(REPO, "configs", "custom_intents_sentences.csv")
    rng = np.random.default_rng(seed)
    audio_dir = os.path.join(out_dir, "audio")
    n_classes = 19
    variants = -(-utts // n_classes)
    t0 = time.time()
    manifest = make_ab_corpus.synthesize(sentences, audio_dir, variants,
                                         rng, profile)
    print(f"synthesized {len(manifest)} utts in {time.time() - t0:.0f}s",
          flush=True)
    with open(manifest_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "label"])
        w.writerows(manifest)
    return manifest_csv


def write_splits(manifest_csv: str, out_dir: str, seed: int) -> dict:
    rows = []
    with open(manifest_csv, newline="") as f:
        for row in csv.DictReader(f):
            rows.append((row["path"], row["label"]))
    rng = np.random.default_rng(seed + 1)
    order = rng.permutation(len(rows))
    total = sum(FSC_SPLITS.values())
    n_train = round(len(rows) * FSC_SPLITS["train"] / total)
    n_valid = round(len(rows) * FSC_SPLITS["valid"] / total)
    bounds = {"train": order[:n_train],
              "valid": order[n_train:n_train + n_valid],
              "test": order[n_train + n_valid:]}
    paths = {}
    for name, idx in bounds.items():
        p = os.path.join(out_dir, f"{name}.csv")
        with open(p, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["path", "label"])
            w.writerows(rows[i] for i in idx)
        paths[name] = p
    return paths


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--utts", type=int, default=sum(FSC_SPLITS.values()))
    ap.add_argument("--out", default="/root/fsc_scale_corpus")
    ap.add_argument("--profile", default="hard",
                    help="make_ab_corpus difficulty profile")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--epochs", type=int, default=15,
                    help="reference FSC recipe epochs")
    ap.add_argument("--force", action="store_true",
                    help="regenerate the corpus even if present")
    ap.add_argument("--waveform", action="store_true",
                    help="waveform-resident mode (data.train_on_waveforms):"
                    " STEP 2 builds the int16 waveform cache (no device "
                    "round trip) and training featurizes inside the jitted "
                    "step, with waveform augmentation live")
    args = ap.parse_args(argv)

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()
    manifest_csv = build_corpus(args.out, args.utts, args.profile,
                                args.seed, args.force)
    synth_s = time.time() - t0
    splits = write_splits(manifest_csv, args.out, args.seed)

    from speech_intent_recognizer_tpu.config import Config
    from speech_intent_recognizer_tpu.config.loader import save_config

    workdir = os.path.join(args.out,
                           "run_waveform" if args.waveform else "run")
    os.makedirs(workdir, exist_ok=True)
    # reference FSC recipe (configs/config.yaml), paths swapped in
    cfg = Config.from_dict({
        "train_csv": splits["train"], "valid_csv": splits["valid"],
        "test_csv": splits["test"],
        "label_map_path": os.path.join(workdir, "label_map.json"),
        "output_dir": os.path.join(workdir, "processed"),
        "cache_dir": os.path.join(workdir, "cache"),
        "save_path": os.path.join(workdir, "ckpt"),
        "num_labels": 19, "epochs": args.epochs, "batch_size": 16,
        "lr": 5e-5, "weight_decay": 1e-4, "grad_clip": 1.0,
        "early_stop_patience": 5, "early_stop_delta": 0.001,
        "bf16": True, "use_augmentation": True, "augment_prob": 0.7,
        "precompute_batch_size": 512, "seed": 42,
        "train_on_waveforms": args.waveform,
        "use_waveform_augment": args.waveform,
    })
    cfg_path = os.path.join(workdir, "config.json")
    save_config(cfg, cfg_path)

    from speech_intent_recognizer_tpu.cli.run_pipeline import run_pipeline

    stage_times: dict = {}
    t0 = time.time()
    ok = run_pipeline(cfg_path, force_precompute=True,
                      stage_times=stage_times)
    total_s = time.time() - t0

    n_files = {k: sum(1 for _ in open(v)) - 1 for k, v in splits.items()}
    report = os.path.join(workdir, "ckpt", "evaluation_results",
                          "classification_report.txt")
    test_acc = None
    if os.path.exists(report):
        for line in open(report):
            if "accuracy" in line.lower():
                nums = [t for t in line.split() if
                        t.replace(".", "", 1).isdigit()]
                if nums:
                    test_acc = float(nums[-1])
                break
    print(json.dumps({
        "metric": "pipeline_scale_total",
        "value": round(total_s, 1),
        "unit": f"seconds (4-stage run_pipeline, {sum(n_files.values())} "
                "on-disk wavs, reference recipe)",
        "vs_baseline": None,
        "detail": {"ok": ok,
                   "mode": ("waveform_resident" if args.waveform
                            else "feature_cache"),
                   "stages_s": {k: round(v, 1) for k, v in
                                stage_times.items()},
                   "corpus_synth_s": round(synth_s, 1),
                   "splits": n_files, "epochs": args.epochs,
                   "test_accuracy": test_acc},
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
