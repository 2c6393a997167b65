"""Convergence A/B: torch vs this framework on the bundled 95-file corpus.

The FSC audio itself cannot ship here (zero egress), so the reference's
0.9477 accuracy claim is backed by layered evidence: converter logit parity,
train-step trajectory equivalence (``test_train_parity.py``), and THIS test
— the closest data-available analogue of the full experiment: train the
reference architecture in torch AND this framework's real ``Trainer.fit``
on the identical feature set (the bundled gTTS corpus,
``mic_recordings/*.wav`` + ``details.csv``), each from its own random init
with its own dropout draws, using the reference loop semantics
(``scripts/train.py:164-302``: Adam + L2 weight decay, grad-clip 1.0,
per-epoch validation, best-val early stopping), and assert both converge to
matching held-out accuracy.

The learning rate is scaled for the 76-utterance corpus (the published
5e-5 was tuned for 23k x 15 epochs; at 4 steps/epoch it never leaves the
init basin in any framework) — everything else is the recipe.
"""

import csv
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import Config
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.ops import frontend_numpy as golden
from speech_intent_recognizer_tpu.train.loop import Trainer
from speech_intent_recognizer_tpu.train.state import (create_optimizer,
                                                      create_train_state)

NUM_CLASSES = 19
BATCH = 19  # 76 train samples -> 4 exact batches per epoch
LR = 1e-3
WD = 1e-4
CLIP = 1.0
EPOCHS = 40
PATIENCE = 10


@pytest.fixture(scope="module")
def corpus(reference_mic_dir):
    """Decode the 95 bundled recordings -> golden features + labels, split
    4 variants/class train (76) and 1 variant/class held-out (19)."""
    from speech_intent_recognizer_tpu.data.audio_io import load_audio

    rows = []
    with open(os.path.join(reference_mic_dir, "details.csv"), newline="") as f:
        for row in csv.DictReader(f):
            rows.append((row["filename"], row["class"]))
    labels_sorted = sorted({c for _, c in rows})
    assert len(labels_sorted) == NUM_CLASSES
    label_map = {c: i for i, c in enumerate(labels_sorted)}

    feats, labels = [], []
    for fname, cls in rows:
        x, _ = load_audio(os.path.join(reference_mic_dir, fname),
                          target_sample_rate=16000)
        mel = golden.pad_or_trim_np(golden.log_mel_spectrogram_np(x), 200)
        feats.append(mel.astype(np.float32))
        labels.append(label_map[cls])
    feats = np.stack(feats)
    labels = np.asarray(labels, np.int64)

    # stratified split: the last variant of each class is held out
    seen: dict[int, int] = {}
    train_idx, held_idx = [], []
    for i, y in enumerate(labels):
        seen[y] = seen.get(y, 0) + 1
        (held_idx if seen[y] == 5 else train_idx).append(i)
    assert len(train_idx) == 76 and len(held_idx) == NUM_CLASSES
    return (feats[train_idx], labels[train_idx],
            feats[held_idx], labels[held_idx])


def _train_torch(torch, feats, labels, v_feats, v_labels):
    """Faithful replica of the reference loop (scripts/train.py:164-302)."""
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

    torch.manual_seed(0)
    model = Ref()
    opt = torch.optim.Adam(model.parameters(), lr=LR, weight_decay=WD)
    loss_fn = nn.CrossEntropyLoss()
    g = torch.Generator().manual_seed(1)
    xv = torch.from_numpy(v_feats)
    yv = torch.from_numpy(v_labels)
    best, no_improve = 0.0, 0
    n = len(feats)
    for _epoch in range(EPOCHS):
        model.train()
        order = torch.randperm(n, generator=g)
        for s in range(n // BATCH):
            idx = order[s * BATCH : (s + 1) * BATCH]
            x = torch.from_numpy(feats[idx.numpy()])
            y = torch.from_numpy(labels[idx.numpy()])
            opt.zero_grad()
            loss_fn(model(x), y).backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CLIP)
            opt.step()
        model.eval()
        with torch.no_grad():
            acc = float((model(xv).argmax(1) == yv).float().mean())
        if acc > best:
            best, no_improve = acc, 0
        else:
            no_improve += 1
        if no_improve >= PATIENCE:
            break
    return best


def _train_jax(feats, labels, v_feats, v_labels):
    model = CNNAudioGRU(num_classes=NUM_CLASSES)  # architecture dropout 0.5
    cfg = Config.from_dict({
        "num_labels": NUM_CLASSES, "epochs": EPOCHS, "batch_size": BATCH,
        "lr": LR, "weight_decay": WD, "grad_clip": CLIP, "bf16": False,
        "use_augmentation": False, "use_mixup": False, "seed": 3,
        "early_stop_patience": PATIENCE, "early_stop_delta": 0.0,
    })
    tx = create_optimizer(lr=LR, weight_decay=WD, grad_clip=CLIP)
    state = create_train_state(model, jax.random.key(42), tx)
    trainer = Trainer(model, cfg, tx=tx, num_classes=NUM_CLASSES)
    _, result = trainer.fit(
        state, jnp.asarray(feats), jnp.asarray(labels.astype(np.int32)),
        jnp.asarray(v_feats), jnp.asarray(v_labels.astype(np.int32)),
        log=lambda *_: None)
    return result.best_val_acc


class TestConvergenceAB:
    def test_same_recipe_same_data_matching_accuracy(self, corpus):
        torch = pytest.importorskip("torch")
        feats, labels, v_feats, v_labels = corpus
        torch_acc = _train_torch(torch, feats, labels, v_feats, v_labels)
        jax_acc = _train_jax(feats, labels, v_feats, v_labels)
        # both frameworks learn the corpus...
        assert torch_acc >= 0.8, f"torch failed to converge: {torch_acc}"
        assert jax_acc >= 0.8, f"jax failed to converge: {jax_acc}"
        # ...to the same held-out accuracy within small-sample noise
        # (19 held-out utterances; 3 samples ~= 0.16)
        assert abs(torch_acc - jax_acc) <= 3 / NUM_CLASSES + 1e-6, (
            f"accuracy gap: torch {torch_acc:.4f} vs jax {jax_acc:.4f}")
