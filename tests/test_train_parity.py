"""Training-trajectory equivalence vs the reference recipe in torch.

The strongest data-free evidence for the 0.9477 FSC accuracy-parity claim
(reference ``checkpoints/evaluation_results/classification_report.txt:1``):
run N optimization steps of the published recipe
(``scripts/train.py:242-261`` — Adam lr 5e-5, weight_decay 1e-4
L2-in-gradient, CrossEntropyLoss, train-mode BatchNorm) in torch and in
``train/loop.py`` from converter-matched initial weights on identical
batches, and assert the per-step loss trajectories and post-training logits
match within fp32 tolerance.  Dropout and augmentation are off on both
sides (the only stochastic pieces); everything else is the real jitted
epoch function.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from speech_intent_recognizer_tpu.config.schema import Config
from speech_intent_recognizer_tpu.convert.torch_import import (
    convert_torch_state_dict)
from speech_intent_recognizer_tpu.models.cnn_gru import CNNAudioGRU
from speech_intent_recognizer_tpu.train.loop import Trainer
from speech_intent_recognizer_tpu.train.state import (TrainState,
                                                      create_optimizer)

NUM_CLASSES = 8
BATCH = 8
STEPS = 6
LR = 5e-5
WD = 1e-4


def _make_torch_model(torch):
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
            # dropout=0 (vs the architecture's 0.5) so the trajectory is
            # deterministic; the dropout masks are the one thing that can't
            # be made bit-identical across frameworks
            self.gru = nn.GRU(1024, 256, num_layers=2, batch_first=True,
                              bidirectional=True, dropout=0.0)
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
            x = torch.sum(x * w_att, dim=1)
            return self.fc(x)

    return Ref()


@pytest.fixture(scope="module")
def batches():
    rng = np.random.default_rng(7)
    n = BATCH * STEPS
    feats = rng.standard_normal((n, 64, 200)).astype(np.float32)
    labels = rng.integers(0, NUM_CLASSES, n).astype(np.int64)
    held = rng.standard_normal((4, 64, 200)).astype(np.float32)
    return feats, labels, held


def _init_state(torch_state):
    params, batch_stats = convert_torch_state_dict(torch_state)
    model = CNNAudioGRU(num_classes=NUM_CLASSES, dropout=0.0)
    tx = create_optimizer(lr=LR, weight_decay=WD, grad_clip=None)
    return model, TrainState(step=jnp.zeros((), jnp.int32), params=params,
                             batch_stats=batch_stats, opt_state=tx.init(params),
                             tx=tx), tx


class TestTrainStepEquivalence:
    @pytest.mark.slow
    def test_loss_trajectory_and_final_logits_match_torch(self, batches):
        torch = pytest.importorskip("torch")
        feats, labels, held = batches

        # torch side — from ITS OWN init; capture the init first so both
        # frameworks start from identical weights
        torch.manual_seed(0)
        t_model = _make_torch_model(torch)
        init_state = {k: v.detach().numpy().copy()
                      for k, v in t_model.state_dict().items()}
        t_model.train()
        opt = torch.optim.Adam(t_model.parameters(), lr=LR, weight_decay=WD)
        loss_fn = torch.nn.CrossEntropyLoss()
        t_losses = []
        for s in range(STEPS):
            x = torch.from_numpy(feats[s * BATCH:(s + 1) * BATCH])
            y = torch.from_numpy(labels[s * BATCH:(s + 1) * BATCH])
            opt.zero_grad()
            loss = loss_fn(t_model(x), y)
            loss.backward()
            opt.step()
            t_losses.append(float(loss.detach()))
        t_model.eval()
        with torch.no_grad():
            t_logits = t_model(torch.from_numpy(held)).numpy()

        # jax side — the REAL jitted epoch function from train/loop.py,
        # one step per call so per-step losses are observable
        model, state, tx = _init_state(init_state)
        cfg = Config.from_dict({
            "num_labels": NUM_CLASSES, "epochs": 1, "batch_size": BATCH,
            "lr": LR, "weight_decay": WD, "grad_clip": 0.0, "bf16": False,
            "use_augmentation": False, "use_mixup": False,
        })
        trainer = Trainer(model, cfg, tx=tx, num_classes=NUM_CLASSES)
        epoch_fn = trainer._build_epoch_fn()

        j_feats = jnp.asarray(feats)
        j_labels = jnp.asarray(labels.astype(np.int32))
        j_losses = []
        for s in range(STEPS):
            idx = jnp.arange(s * BATCH, (s + 1) * BATCH,
                             dtype=jnp.int32)[None, :]
            w = jnp.ones((1, BATCH), jnp.float32)
            state, m = epoch_fn(state, j_feats, j_labels, idx, w,
                                jax.random.key(0))
            j_losses.append(float(m["loss"]))

        # per-step losses track torch within fp32 accumulation noise
        np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-4)

        # post-training eval logits on held-out data: the weights themselves
        # (incl. BatchNorm running stats) stayed equivalent through N updates
        j_logits = np.asarray(model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(held), train=False))
        np.testing.assert_allclose(j_logits, t_logits, rtol=2e-3, atol=2e-3)
        assert (np.argmax(j_logits, 1) == np.argmax(t_logits, 1)).all()

    @pytest.mark.slow
    def test_full_loop_gradclip_eval_earlystop_matches_torch(self, batches):
        """The FULL training-loop semantics (reference
        ``scripts/train.py:164-302``), not just the optimizer step: multiple
        epochs through the real ``Trainer.fit`` — shuffled batches,
        grad-clip 1.0 (the ``configs/config.yaml:18`` key; realized as
        global-norm clipping on both sides), interleaved per-epoch
        validation, and the best-val/no-improve early-stop bookkeeping —
        against a faithful torch replica fed the identical batch order.

        Asserts per-epoch train losses, per-epoch val losses/accuracies,
        and the final bookkeeping (best_val_acc, epochs_run) all match.
        """
        torch = pytest.importorskip("torch")
        from speech_intent_recognizer_tpu.train.loop import pad_permutation

        rng = np.random.default_rng(11)
        n_train, n_val, epochs, seed = 32, 16, 3, 5
        feats = rng.standard_normal((n_train, 64, 200)).astype(np.float32)
        labels = rng.integers(0, NUM_CLASSES, n_train).astype(np.int64)
        v_feats = rng.standard_normal((n_val, 64, 200)).astype(np.float32)
        v_labels = rng.integers(0, NUM_CLASSES, n_val).astype(np.int64)
        clip = 1.0

        # Reproduce the exact batch order Trainer.fit will draw so the
        # torch replica sees identical batches (n divisible by batch).
        fit_rng = jax.random.key(seed)
        perms = []
        for epoch in range(epochs):
            fit_rng, perm_key, _ = jax.random.split(fit_rng, 3)
            perm_key = jax.random.fold_in(perm_key, epoch)
            perm, _ = pad_permutation(perm_key, n_train, BATCH)
            perms.append(np.asarray(perm))

        # ---- torch replica of train.py:164-302 ----
        torch.manual_seed(0)
        t_model = _make_torch_model(torch)
        init_state = {k: v.detach().numpy().copy()
                      for k, v in t_model.state_dict().items()}
        opt = torch.optim.Adam(t_model.parameters(), lr=LR, weight_decay=WD)
        loss_fn = torch.nn.CrossEntropyLoss()
        t_hist = []
        t_best, t_no_improve, t_epochs_run = 0.0, 0, 0
        patience = 5
        for epoch in range(epochs):
            t_model.train()
            epoch_losses = []
            for b in perms[epoch]:
                x = torch.from_numpy(feats[b])
                y = torch.from_numpy(labels[b])
                opt.zero_grad()
                loss = loss_fn(t_model(x), y)
                loss.backward()
                torch.nn.utils.clip_grad_norm_(t_model.parameters(), clip)
                opt.step()
                epoch_losses.append(float(loss.detach()) * len(b))
            t_model.eval()
            with torch.no_grad():
                v_logits = t_model(torch.from_numpy(v_feats))
                v_loss = float(loss_fn(v_logits, torch.from_numpy(v_labels)))
                v_acc = float((v_logits.argmax(1).numpy()
                               == v_labels).mean())
            t_hist.append({"train_loss": sum(epoch_losses) / n_train,
                           "val_loss": v_loss, "val_acc": v_acc})
            if v_acc > t_best:
                t_best, t_no_improve = v_acc, 0
            else:
                t_no_improve += 1
            t_epochs_run = epoch + 1
            if t_no_improve >= patience:
                break

        # ---- the real Trainer.fit ----
        params, batch_stats = convert_torch_state_dict(init_state)
        model = CNNAudioGRU(num_classes=NUM_CLASSES, dropout=0.0)
        tx = create_optimizer(lr=LR, weight_decay=WD, grad_clip=clip)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=tx.init(params), tx=tx)
        cfg = Config.from_dict({
            "num_labels": NUM_CLASSES, "epochs": epochs, "batch_size": BATCH,
            "lr": LR, "weight_decay": WD, "grad_clip": clip, "bf16": False,
            "use_augmentation": False, "use_mixup": False, "seed": seed,
            "early_stop_patience": patience, "early_stop_delta": 0.0,
        })
        trainer = Trainer(model, cfg, tx=tx, num_classes=NUM_CLASSES)
        state, result = trainer.fit(
            state, jnp.asarray(feats), jnp.asarray(labels.astype(np.int32)),
            jnp.asarray(v_feats), jnp.asarray(v_labels.astype(np.int32)),
            log=lambda *_: None)

        assert result.epochs_run == t_epochs_run
        for got, want in zip(result.history, t_hist):
            np.testing.assert_allclose(got["train_loss"], want["train_loss"],
                                       rtol=3e-4, atol=3e-4)
            np.testing.assert_allclose(got["val_loss"], want["val_loss"],
                                       rtol=1e-3, atol=1e-3)
            assert got["val_acc"] == pytest.approx(want["val_acc"], abs=1e-6)
        assert result.best_val_acc == pytest.approx(t_best, abs=1e-6)

    def test_weight_decay_is_l2_in_gradient_not_adamw(self, batches):
        """One step with huge weight decay separates torch-Adam semantics
        (L2 added to the gradient, then scaled by the adaptive step) from
        AdamW (decay applied directly to weights): in torch-Adam the
        parameter update magnitude stays ~lr per coordinate even when the
        decay term dominates the gradient."""
        torch = pytest.importorskip("torch")
        feats, labels, _ = batches
        torch.manual_seed(0)
        t_model = _make_torch_model(torch)
        init_state = {k: v.detach().numpy().copy()
                      for k, v in t_model.state_dict().items()}
        t_model.train()
        big_wd = 0.5
        opt = torch.optim.Adam(t_model.parameters(), lr=LR,
                               weight_decay=big_wd)
        loss_fn = torch.nn.CrossEntropyLoss()
        x = torch.from_numpy(feats[:BATCH])
        y = torch.from_numpy(labels[:BATCH].astype(np.int64))
        opt.zero_grad()
        loss_fn(t_model(x), y).backward()
        opt.step()
        t_fc = t_model.state_dict()["fc.weight"].detach().numpy()

        params, batch_stats = convert_torch_state_dict(init_state)
        model = CNNAudioGRU(num_classes=NUM_CLASSES, dropout=0.0)
        tx = create_optimizer(lr=LR, weight_decay=big_wd, grad_clip=None)
        state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                           batch_stats=batch_stats,
                           opt_state=tx.init(params), tx=tx)
        cfg = Config.from_dict({
            "num_labels": NUM_CLASSES, "epochs": 1, "batch_size": BATCH,
            "lr": LR, "bf16": False,
            "use_augmentation": False, "use_mixup": False,
        })
        trainer = Trainer(model, cfg, tx=tx, num_classes=NUM_CLASSES)
        epoch_fn = trainer._build_epoch_fn()
        idx = jnp.arange(BATCH, dtype=jnp.int32)[None, :]
        w = jnp.ones((1, BATCH), jnp.float32)
        state, _ = epoch_fn(state, jnp.asarray(feats),
                            jnp.asarray(labels.astype(np.int32)), idx, w,
                            jax.random.key(0))
        j_fc = np.asarray(state.params["fc"]["kernel"]).T
        np.testing.assert_allclose(j_fc, t_fc, rtol=5e-4, atol=5e-6)
