#!/usr/bin/env python
"""Synthesize a convergence-A/B corpus and cache golden features as npz.

Builds on ``synthetic_e2e.synthesize_corpus``'s hermetic TTS but with a
selectable difficulty profile: the ``easy`` profile (synthetic_e2e's
jitter) saturates both frameworks at ~1.0 held-out accuracy by epoch 7,
which leaves an A/B no variance to compare; the ``hard`` profile widens
the speed/gain jitter and draws a per-utterance noise floor high enough
to hold the 15-epoch asymptote below ceiling, where a systematic
optimizer/init difference between frameworks would actually show.

    python examples/make_ab_corpus.py --variants 80 --profile hard \
        --out /root/ab_corpus_hard
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROFILES = {
    # (rate lo/hi, gain lo/hi, noise sigma lo/hi)
    "easy": ((0.9, 1.1), (0.6, 1.0), (0.005, 0.005)),
    "hard": ((0.78, 1.28), (0.25, 1.0), (0.01, 0.08)),
    # enough per-utterance noise to buy an irreducible error floor: the
    # 15-epoch asymptote sits at ~0.9 where framework differences show
    "harder": ((0.7, 1.4), (0.15, 1.0), (0.05, 0.3)),
}


def synthesize(sentence_csv: str, out_dir: str, variants: int,
               rng: np.random.Generator, profile: str):
    from speech_intent_recognizer_tpu.data.audio_io import load_audio, save_wav
    from speech_intent_recognizer_tpu.tts.generate import (
        _read_sentence_sheet, synthesize_text)

    (rlo, rhi), (glo, ghi), (nlo, nhi) = PROFILES[profile]
    rows = _read_sentence_sheet(sentence_csv)
    os.makedirs(out_dir, exist_ok=True)
    manifest = []
    for idx, (text, label) in enumerate(rows):
        base = os.path.join(out_dir, f"base_{idx:04d}.wav")
        synthesize_text(text, base, engine="synthetic")
        x, sr = load_audio(base)
        for v in range(variants):
            rate = float(rng.uniform(rlo, rhi))
            pos = np.arange(int(len(x) / rate)) * rate
            y = np.interp(pos, np.arange(len(x)), x).astype(np.float32)
            y = y * float(rng.uniform(glo, ghi))
            y = y + rng.normal(0, float(rng.uniform(nlo, nhi)),
                               len(y)).astype(np.float32)
            path = os.path.join(out_dir, f"utt_{idx:04d}_{v:02d}.wav")
            save_wav(path, y, sr)
            manifest.append((path, label))
        os.remove(base)
    return manifest


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", type=int, default=80)
    ap.add_argument("--profile", choices=sorted(PROFILES), default="hard")
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host job

    from speech_intent_recognizer_tpu.data.audio_io import load_audio
    from speech_intent_recognizer_tpu.ops import frontend_numpy as golden

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sentences = os.path.join(here, "configs",
                             "custom_intents_sentences.csv")
    rng = np.random.default_rng(args.seed)
    audio_dir = os.path.join(args.out, "audio")
    t0 = time.time()
    manifest = synthesize(sentences, audio_dir, args.variants, rng,
                          args.profile)
    print(f"synth[{args.profile}]: {len(manifest)} utts "
          f"in {time.time() - t0:.1f}s", flush=True)

    classes = sorted({lab for _, lab in manifest})
    label_map = {c: i for i, c in enumerate(classes)}
    feats = np.zeros((len(manifest), 64, 200), np.float32)
    labels = np.zeros(len(manifest), np.int64)
    t0 = time.time()
    for i, (path, lab) in enumerate(manifest):
        x, _ = load_audio(path, target_sample_rate=16000)
        feats[i] = golden.pad_or_trim_np(
            golden.log_mel_spectrogram_np(x), 200)
        labels[i] = label_map[lab]
    out_npz = os.path.join(args.out, "features.npz")
    np.savez(out_npz, features=feats, labels=labels,
             classes=np.array(classes))
    print(f"featurized in {time.time() - t0:.1f}s -> {out_npz}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
