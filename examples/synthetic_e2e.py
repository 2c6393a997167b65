#!/usr/bin/env python
"""End-to-end accuracy demonstration on a synthesized corpus.

FSC audio itself is not distributable, so this example synthesizes a
multi-hundred-utterance corpus with the hermetic TTS engine (19 intent
classes, distinct per-text acoustics + per-variant perturbations), then runs
the complete pipeline — preprocess -> device feature precompute -> whole-epoch
scanned training -> evaluation — and reports held-out intent accuracy.

Run: python examples/synthetic_e2e.py [--variants 20] [--workdir DIR]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthesize_corpus(sentence_csv: str, out_dir: str, variants: int,
                      rng: np.random.Generator):
    """variants recordings per sentence with pitch/tempo-style jitter."""
    from speech_intent_recognizer_tpu.data.audio_io import load_audio, save_wav
    from speech_intent_recognizer_tpu.tts.generate import (
        _read_sentence_sheet, synthesize_text)

    rows = _read_sentence_sheet(sentence_csv)
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    idx = 0
    for text, label in rows:
        base = os.path.join(out_dir, f"base_{idx:04d}.wav")
        synthesize_text(text, base, engine="synthetic")
        x, sr = load_audio(base)
        for v in range(variants):
            # linear-interp speed/pitch jitter + noise + gain variation
            # (bandlimited resample_np is overkill here and coprime rate
            # pairs would build enormous polyphase banks)
            rate = float(rng.uniform(0.9, 1.1))
            pos = np.arange(int(len(x) / rate)) * rate
            y = np.interp(pos, np.arange(len(x)), x).astype(np.float32)
            y = y * float(rng.uniform(0.6, 1.0))
            y = y + rng.normal(0, 0.005, len(y)).astype(np.float32)
            path = os.path.join(out_dir, f"utt_{idx:04d}_{v:02d}.wav")
            save_wav(path, y, sr)
            manifest.append((path, label))
        os.remove(base)
        idx += 1
    return manifest


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--variants", type=int, default=20)
    p.add_argument("--epochs", type=int, default=8)
    p.add_argument("--workdir", default=None)
    args = p.parse_args(argv)

    workdir = args.workdir or tempfile.mkdtemp(prefix="sir_synth_")
    rng = np.random.default_rng(0)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sentences = os.path.join(here, "configs", "custom_intents_sentences.csv")

    print(f"synthesizing corpus ({args.variants} variants/sentence) ...")
    manifest = synthesize_corpus(sentences, os.path.join(workdir, "audio"),
                                 args.variants, rng)
    order = rng.permutation(len(manifest))
    n_test = len(manifest) // 5
    n_val = len(manifest) // 5
    splits = {"test": order[:n_test],
              "valid": order[n_test : n_test + n_val],
              "train": order[n_test + n_val :]}
    paths = {}
    for name, ids in splits.items():
        path = os.path.join(workdir, f"{name}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["path", "label"])
            for i in ids:
                w.writerow(manifest[i])
        paths[name] = path
    print(f"corpus: {len(manifest)} utterances "
          f"({len(splits['train'])} train / {n_val} val / {n_test} test)")

    from speech_intent_recognizer_tpu.config import Config
    from speech_intent_recognizer_tpu.config.loader import save_config
    from speech_intent_recognizer_tpu.cli.run_pipeline import run_pipeline

    cfg = Config.from_dict({
        "train_csv": paths["train"], "valid_csv": paths["valid"],
        "test_csv": paths["test"],
        "label_map_path": os.path.join(workdir, "label_map.json"),
        "output_dir": os.path.join(workdir, "processed"),
        "cache_dir": os.path.join(workdir, "cache"),
        "save_path": os.path.join(workdir, "ckpt"),
        "num_labels": 19, "epochs": args.epochs, "batch_size": 16,
        "lr": 0.002, "augment_prob": 0.5, "precompute_batch_size": 128,
        "seed": 0,
    })
    cfg_path = os.path.join(workdir, "config.json")
    save_config(cfg, cfg_path)
    ok = run_pipeline(cfg_path, validate_audio=False)
    if not ok:
        print("pipeline failed")
        return 1

    report = os.path.join(workdir, "ckpt", "evaluation_results",
                          "metrics.json")
    with open(report) as f:
        metrics = json.load(f)
    print(json.dumps({"synthetic_e2e_test_accuracy": metrics["accuracy"],
                      "classes": len(metrics["classes"]),
                      "workdir": workdir}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
