#!/usr/bin/env python
"""Convergence A/B: torch vs this framework, same recipe, same data.

The closest data-available analogue of the reference's FSC experiment
(``scripts/train.py:164-302`` + the 0.9477 bar, whose audio cannot ship
here): train the reference architecture in BOTH frameworks on the bundled
95-utterance gTTS corpus (``mic_recordings/*.wav`` + ``details.csv``) —
identical golden features, stratified 76/19 split, the reference loop
semantics (Adam + L2 weight decay, grad-clip 1.0, architecture dropout 0.5,
per-epoch validation, best-val bookkeeping) — and compare the best held-out
accuracies.  Each side uses its own random init and dropout draws: this is
an experiment-level A/B, not a step-parity test (``tests/test_train_parity``
covers that).

The learning rate is scaled for the 76-utterance corpus (the published
5e-5 was tuned for 23k x 15 epochs and never leaves the init basin here);
both frameworks get the identical recipe.  The torch side runs on CPU (its
reference runtime); the JAX side runs on the default accelerator.

    python examples/convergence_ab.py --epochs 60 --out /tmp/ab.json
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LR = 1e-3
WD = 1e-4
CLIP = 1.0
BATCH = 8
NUM_CLASSES = 19


def load_corpus(mic_dir: str):
    """Decode the 95 recordings -> golden features; 4/1 variant split."""
    from speech_intent_recognizer_tpu.data.audio_io import load_audio
    from speech_intent_recognizer_tpu.ops import frontend_numpy as golden

    rows = []
    with open(os.path.join(mic_dir, "details.csv"), newline="") as f:
        for row in csv.DictReader(f):
            rows.append((row["filename"], row["class"]))
    label_map = {c: i for i, c in enumerate(sorted({c for _, c in rows}))}
    assert len(label_map) == NUM_CLASSES
    feats, labels = [], []
    for fname, cls in rows:
        x, _ = load_audio(os.path.join(mic_dir, fname),
                          target_sample_rate=16000)
        feats.append(golden.pad_or_trim_np(
            golden.log_mel_spectrogram_np(x), 200).astype(np.float32))
        labels.append(label_map[cls])
    feats = np.stack(feats)
    labels = np.asarray(labels, np.int64)
    seen: dict = {}
    tr, he = [], []
    for i, y in enumerate(labels):
        seen[y] = seen.get(y, 0) + 1
        (he if seen[y] == 5 else tr).append(i)
    return feats[tr], labels[tr], feats[he], labels[he]


def train_torch(feats, labels, v_feats, v_labels, epochs: int,
                seed: int = 0) -> float:
    """Faithful replica of the reference loop (scripts/train.py:164-302)."""
    import torch

    torch.set_num_threads(1)  # the 1-core host thrashes on torch's default
    nn = torch.nn

    class Ref(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(1, 32, 3, 1, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(32)
            self.conv2 = nn.Conv2d(32, 64, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(64)
            self.conv3 = nn.Conv2d(64, 128, 3, 1, 1, bias=False)
            self.bn3 = nn.BatchNorm2d(128)
            self.pool = nn.MaxPool2d(2)
            self.gru = nn.GRU(1024, 256, num_layers=2, batch_first=True,
                              bidirectional=True, dropout=0.5)
            self.attention = nn.Linear(512, 1)
            self.fc = nn.Linear(512, NUM_CLASSES)

        def forward(self, x):
            if x.dim() == 3:
                x = x.unsqueeze(1)
            x = self.pool(torch.relu(self.bn1(self.conv1(x))))
            x = self.pool(torch.relu(self.bn2(self.conv2(x))))
            x = self.pool(torch.relu(self.bn3(self.conv3(x))))
            b, c, h, w = x.size()
            x = x.permute(0, 3, 1, 2).contiguous().view(b, w, c * h)
            x, _ = self.gru(x)
            w_att = torch.softmax(self.attention(x), dim=1)
            return self.fc(torch.sum(x * w_att, dim=1))

    torch.manual_seed(100 * seed)
    model = Ref()
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=WD)
    loss_fn = nn.CrossEntropyLoss()
    g = torch.Generator().manual_seed(100 * seed + 1)
    xv = torch.from_numpy(v_feats)
    yv = torch.from_numpy(v_labels)
    best = 0.0
    for _epoch in range(epochs):
        model.train()
        order = torch.randperm(len(feats), generator=g)
        for s in range(0, len(feats), BATCH):
            idx = order[s : s + BATCH].numpy()
            opt.zero_grad()
            loss_fn(model(torch.from_numpy(feats[idx])),
                    torch.from_numpy(labels[idx])).backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
        model.eval()
        with torch.no_grad():
            acc = float((model(xv).argmax(1) == yv).float().mean())
        best = max(best, acc)
    return best


def train_jax(feats, labels, v_feats, v_labels, epochs: int,
              seed: int = 0) -> float:
    """The real Trainer.fit with the identical recipe."""
    import jax
    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.config.schema import Config
    from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
    from speech_intent_recognizer_tpu.train.loop import Trainer
    from speech_intent_recognizer_tpu.train.state import (
        create_optimizer, create_train_state)

    model = CNNAudioGRU(num_classes=NUM_CLASSES)  # architecture dropout 0.5
    cfg = Config.from_dict({
        "num_labels": NUM_CLASSES, "epochs": epochs, "batch_size": BATCH,
        "lr": LR, "weight_decay": WD, "grad_clip": CLIP, "bf16": False,
        "use_augmentation": False, "use_mixup": False,
        "seed": 100 * seed + 3,
        "early_stop_patience": epochs, "early_stop_delta": 0.0,
    })
    tx = create_optimizer(lr=LR, weight_decay=WD, grad_clip=CLIP)
    state = create_train_state(model, jax.random.key(100 * seed + 42), tx)
    trainer = Trainer(model, cfg, tx=tx, num_classes=NUM_CLASSES)
    _, result = trainer.fit(
        state, jnp.asarray(feats), jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(v_feats), jnp.asarray(v_labels.astype(np.int32)),
        log=lambda *_: None)
    return float(result.best_val_acc)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mic_dir", default="/root/reference/mic_recordings")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--seeds", type=int, default=1,
                    help="run N independent seed pairs and report per-seed "
                         "accuracies plus means (default 1: the original "
                         "fixed-seed A/B)")
    ap.add_argument("--out", default=None, help="write result JSON here")
    ap.add_argument("--require-accel", action="store_true",
                    help="exit 3 if JAX has no accelerator (the JAX side "
                         "is impractically slow on the 1-core CPU host)")
    args = ap.parse_args(argv)

    from speech_intent_recognizer_tpu.utils.platform import (
        configure_jax, wait_for_backend)

    if args.require_accel:
        # Tunnel outages can make backend init HANG (not fail) — probe in
        # killable subprocesses first so an unattended suite run skips in
        # bounded time instead of blocking on an in-process init.
        budget = float(os.environ.get("SIR_BACKEND_WAIT_S", "240"))
        if not wait_for_backend(max_wait_s=budget):
            print("accelerator backend unavailable (init hung or failed "
                  f"for {budget:.0f}s)", file=sys.stderr)
            return 3
    configure_jax()
    import jax

    try:
        backend = jax.default_backend()
    except RuntimeError as e:  # tunnel outage: backend init itself fails
        if args.require_accel:
            print(f"accelerator backend unavailable: {e}", file=sys.stderr)
            return 3
        raise
    if args.require_accel and backend == "cpu":
        print("no accelerator backend available", file=sys.stderr)
        return 3

    feats, labels, v_feats, v_labels = load_corpus(args.mic_dir)
    jax_accs, torch_accs = [], []
    t_jax = t_torch = 0.0
    for seed in range(args.seeds):
        t0 = time.perf_counter()
        jax_accs.append(train_jax(feats, labels, v_feats, v_labels,
                                  args.epochs, seed=seed))
        t_jax += time.perf_counter() - t0
        t0 = time.perf_counter()
        torch_accs.append(train_torch(feats, labels, v_feats, v_labels,
                                      args.epochs, seed=seed))
        t_torch += time.perf_counter() - t0
    torch_acc = float(np.mean(torch_accs))
    jax_acc = float(np.mean(jax_accs))

    result = {
        "torch_best_held_acc": round(torch_acc, 4),
        "jax_best_held_acc": round(jax_acc, 4),
        "gap": round(abs(torch_acc - jax_acc), 4),
        "epochs": args.epochs,
        "recipe": {"lr": LR, "weight_decay": WD, "grad_clip": CLIP,
                   "batch_size": BATCH, "dropout": 0.5},
        "jax_backend": backend,
        "seconds": {"torch": round(t_torch, 1), "jax": round(t_jax, 1)},
    }
    if args.seeds > 1:
        result["seeds"] = args.seeds
        result["torch_accs"] = [round(a, 4) for a in torch_accs]
        result["jax_accs"] = [round(a, 4) for a in jax_accs]
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
