"""Data-parallel training loop.

TPU-native redesign of the reference's epoch loop
(``scripts/train.py:72-118,164-302``).  Instead of a host-side DataLoader
feeding one batch at a time (8 worker processes, pinned memory, per-batch
host->device copies), the entire feature set lives in HBM and a **whole
epoch is one jitted ``lax.scan``**: batch gathering, SpecAugment, the
forward/backward pass, the Adam update and the metric accumulation all fuse
into a single XLA program with zero host round-trips.  Shuffling is a device
``jax.random.permutation``; the final partial batch is padded with
zero-weight duplicates so every sample counts exactly once per epoch
(DataLoader ``drop_last=False`` parity).

Parallelism: the batch is sharded over the mesh ``data`` axis via
``with_sharding_constraint``; GSPMD inserts the gradient ``psum`` over ICI.
BatchNorm statistics are computed over the *global* batch (jit semantics),
i.e. sync-BN for free — stronger than the reference's single-GPU BN.

Early stopping / best-model tracking matches ``train.py:263-302``: keep the
model with best validation accuracy, stop after ``patience`` epochs without
improvement.
"""

from __future__ import annotations

import logging
import signal
import time
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_intent_recognizer_tpu.config.schema import Config
from speech_intent_recognizer_tpu.ops.augment import (augment_waveforms,
                                                      mixup)
from speech_intent_recognizer_tpu.ops.specaugment import spec_augment
from speech_intent_recognizer_tpu.parallel.mesh import DATA_AXIS
from speech_intent_recognizer_tpu.train.state import TrainState

logger = logging.getLogger(__name__)


def cross_entropy(logits, labels_onehot, weights):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    per_example = -jnp.sum(labels_onehot * logp, axis=-1)
    wsum = jnp.maximum(jnp.sum(weights), 1e-8)
    return jnp.sum(per_example * weights) / wsum


def pad_permutation(key: jax.Array, n: int, batch_size: int):
    """Device-side shuffle padded to a whole number of batches.

    Returns (perm (steps, B) int32, weights (steps, B) f32).  Padding entries
    re-point at real samples (keeps BatchNorm statistics clean) but carry
    zero loss/metric weight.
    """
    steps = -(-n // batch_size)
    total = steps * batch_size
    perm = jax.random.permutation(key, n)
    pad = jnp.resize(perm, (total - n,)) if total > n else jnp.zeros((0,), perm.dtype)
    idx = jnp.concatenate([perm, pad]).reshape(steps, batch_size)
    w = (jnp.arange(total) < n).astype(jnp.float32).reshape(steps, batch_size)
    return idx, w


def sequential_batches(n: int, batch_size: int):
    steps = -(-n // batch_size)
    total = steps * batch_size
    idx = np.minimum(np.arange(total), n - 1).reshape(steps, batch_size)
    w = (np.arange(total) < n).astype(np.float32).reshape(steps, batch_size)
    return jnp.asarray(idx, jnp.int32), jnp.asarray(w, jnp.float32)


@dataclass
class TrainResult:
    best_val_acc: float
    epochs_run: int
    history: list = field(default_factory=list)
    best_variables: Optional[dict] = None
    stopped_early: bool = False


class Trainer:
    """Config-driven trainer for the intent classifier."""

    def __init__(self, model, cfg: Config, mesh=None,
                 tx=None, num_classes: Optional[int] = None,
                 from_waveforms: bool = False):
        from speech_intent_recognizer_tpu.train.state import create_optimizer

        self.model = model
        self.cfg = cfg
        self.mesh = mesh
        self.num_classes = num_classes or cfg.model.num_labels
        self.tx = tx or create_optimizer(
            lr=cfg.train.lr, weight_decay=cfg.train.weight_decay,
            grad_clip=cfg.train.grad_clip)
        self._epoch_fn = None
        self._eval_fn = None
        # Waveform-resident mode (``data.train_on_waveforms``): the train /
        # eval arrays are int16 waveforms + lengths; each batch is
        # featurized INSIDE the jitted step by the fused frontend (~10 ms
        # per b2048 — effectively free vs the backward pass), which makes
        # waveform-domain augmentation (``ops/augment.py``) live on device.
        # The gradient does not flow into the frontend (features are data),
        # so no frontend VJP is involved.
        self.from_waveforms = from_waveforms
        self._frontend_params = None
        if from_waveforms:
            from speech_intent_recognizer_tpu.ops.frontend_jax import (
                default_backend_choice, make_frontend_params)

            self._frontend_params = make_frontend_params(cfg.audio)
            # GSPMD cannot auto-partition a pallas_call under a sharded jit
            # (the XLA frontend partitions fine and the step stays fused);
            # single-device resolves "auto" EAGERLY here — the usability
            # probe cannot run inside the jitted step (frontend_jax.
            # pallas_usable).
            self._frontend_backend = (
                "xla" if mesh is not None
                else default_backend_choice(self._frontend_params))

    def _featurize(self, waves_f32, lengths):
        from speech_intent_recognizer_tpu.ops.frontend_jax import (
            log_mel_frontend)

        return log_mel_frontend(waves_f32, jnp.maximum(lengths, 1),
                                self._frontend_params,
                                backend=self._frontend_backend)

    # ---------------------------------------------------------------- jit fns

    def _data_sharding(self, ndim):
        if self.mesh is None:
            return None
        return NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    def _constrain(self, x):
        s = self._data_sharding(x.ndim)
        return jax.lax.with_sharding_constraint(x, s) if s is not None else x

    def _build_epoch_fn(self) -> Callable:
        cfg = self.cfg
        model = self.model
        num_classes = self.num_classes
        use_aug = cfg.data.use_augmentation
        aug_prob = cfg.data.augment_prob
        t_mask = cfg.data.time_mask_param
        f_mask = cfg.data.freq_mask_param
        use_mixup = cfg.data.mixup_alpha > 0 and cfg.data.use_mixup

        def loss_fn(params, batch_stats, x, y_onehot, w, drng):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": batch_stats},
                x, train=True, rngs={"dropout": drng},
                mutable=["batch_stats"])
            loss = cross_entropy(logits, y_onehot, w)
            return loss, (logits, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        from_waveforms = self.from_waveforms
        use_wave_aug = cfg.data.use_waveform_augment and from_waveforms

        def step_fn(carry, inp):
            state, rng = carry
            idx, w, features, labels = inp["idx"], inp["w"], inp["features"], inp["labels"]
            if from_waveforms:
                rng, arng, drng, mrng, wrng = jax.random.split(rng, 5)
                xw = self._constrain(features[idx]).astype(jnp.float32) \
                    * (1.0 / 32768.0)
                ln = inp["lengths"][idx]
                if use_wave_aug:
                    xw, ln = augment_waveforms(xw, ln, wrng,
                                               augment_prob=aug_prob)
                x = self._featurize(xw, ln)
            else:
                # 4-way split preserved exactly: the feature-cached RNG
                # stream (and every recipe validated on it) is unchanged
                rng, arng, drng, mrng = jax.random.split(rng, 4)
                x = self._constrain(features[idx])
            y = labels[idx]
            y_onehot = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
            if use_aug:
                x = spec_augment(x, arng, augment_prob=aug_prob,
                                 time_mask_param=t_mask,
                                 freq_mask_param=f_mask)
            if use_mixup:
                x, y_onehot = mixup(x, y_onehot, mrng, cfg.data.mixup_alpha)
            (loss, (logits, new_bs)), grads = grad_fn(
                state.params, state.batch_stats, x, y_onehot, w, drng)
            state = state.apply_gradients(grads).replace(batch_stats=new_bs)
            correct = jnp.sum(
                (jnp.argmax(logits, -1) == y).astype(jnp.float32) * w)
            metrics = jnp.stack([loss * jnp.sum(w), correct, jnp.sum(w)])
            return (state, rng), metrics

        @partial(jax.jit, donate_argnums=(0,))
        def epoch_fn(state, features, labels, perm, weights, rng,
                     lengths=None):
            def body(carry, inp):
                return step_fn(carry, {"idx": inp[0], "w": inp[1],
                                       "features": features,
                                       "labels": labels,
                                       "lengths": lengths})
            (state, _), ms = jax.lax.scan(body, (state, rng), (perm, weights))
            totals = jnp.sum(ms, axis=0)
            return state, {"loss": totals[0] / jnp.maximum(totals[2], 1.0),
                           "acc": totals[1] / jnp.maximum(totals[2], 1.0)}

        return epoch_fn

    def _build_eval_fn(self) -> Callable:
        model = self.model
        num_classes = self.num_classes
        from_waveforms = self.from_waveforms

        @jax.jit
        def eval_fn(params, batch_stats, features, labels, perm, weights,
                    lengths=None):
            def body(_, inp):
                idx, w = inp
                if from_waveforms:
                    xw = self._constrain(features[idx]).astype(jnp.float32) \
                        * (1.0 / 32768.0)
                    x = self._featurize(xw, lengths[idx])
                else:
                    x = self._constrain(features[idx])
                y = labels[idx]
                logits = model.apply(
                    {"params": params, "batch_stats": batch_stats},
                    x, train=False)
                y_onehot = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
                loss = cross_entropy(logits, y_onehot, w)
                correct = jnp.sum(
                    (jnp.argmax(logits, -1) == y).astype(jnp.float32) * w)
                return None, jnp.stack([loss * jnp.sum(w), correct,
                                        jnp.sum(w)])

            _, ms = jax.lax.scan(body, None, (perm, weights))
            totals = jnp.sum(ms, axis=0)
            return {"loss": totals[0] / jnp.maximum(totals[2], 1.0),
                    "acc": totals[1] / jnp.maximum(totals[2], 1.0)}

        return eval_fn

    # ------------------------------------------------------------------ train

    def evaluate(self, state: TrainState, features, labels,
                 batch_size: Optional[int] = None, lengths=None):
        if self._eval_fn is None:
            self._eval_fn = self._build_eval_fn()
        bs = batch_size or (self.cfg.train.batch_size
                            * self.cfg.train.eval_batch_multiplier)
        bs = min(bs, int(features.shape[0]))
        perm, w = sequential_batches(int(features.shape[0]), bs)
        m = self._eval_fn(state.params, state.batch_stats, features, labels,
                          perm, w, lengths=lengths)
        return {k: float(v) for k, v in m.items()}

    def fit(
        self,
        state: TrainState,
        train_features, train_labels,
        val_features, val_labels,
        checkpointer=None,
        start_epoch: int = 0,
        best_val_acc: float = 0.0,
        no_improve: int = 0,
        log: Optional[Callable[[str], None]] = None,
        train_lengths=None,
        val_lengths=None,
    ) -> tuple[TrainState, TrainResult]:
        cfg = self.cfg.train
        log = log or logger.info
        if self._epoch_fn is None:
            self._epoch_fn = self._build_epoch_fn()

        n_train = int(train_features.shape[0])
        bs = min(cfg.batch_size, n_train)
        rng = jax.random.key(cfg.seed)
        result = TrainResult(best_val_acc=best_val_acc, epochs_run=start_epoch)

        # Preemption awareness (absent in the reference, which could lose a
        # whole run): SIGTERM/SIGINT requests a final checkpoint at the next
        # epoch boundary instead of dying mid-step.
        preempted = {"flag": False}
        prev_handlers = {}

        def _request_stop(signum, _frame):
            preempted["flag"] = True
            log(f"signal {signum}: will checkpoint and stop after this epoch")

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev_handlers[sig] = signal.signal(sig, _request_stop)
            except (ValueError, OSError):  # non-main thread
                prev_handlers.pop(sig, None)

        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.perf_counter()
            rng, perm_key, epoch_key = jax.random.split(rng, 3)
            perm_key = jax.random.fold_in(perm_key, epoch)
            perm, weights = pad_permutation(perm_key, n_train, bs)
            state, train_m = self._epoch_fn(
                state, train_features, train_labels, perm, weights,
                jax.random.fold_in(epoch_key, epoch),
                lengths=train_lengths)
            val_m = self.evaluate(state, val_features, val_labels,
                                  lengths=val_lengths)
            dt = time.perf_counter() - t0
            train_loss = float(train_m["loss"])
            entry = {"epoch": epoch + 1, "train_loss": train_loss,
                     "train_acc": float(train_m["acc"]),
                     "val_loss": val_m["loss"], "val_acc": val_m["acc"],
                     "seconds": dt}
            result.history.append(entry)
            log(f"epoch {epoch + 1}/{cfg.epochs}: "
                f"train_loss={train_loss:.4f} val_loss={val_m['loss']:.4f} "
                f"val_acc={val_m['acc']:.4f} ({dt:.1f}s)")

            improved = val_m["acc"] > result.best_val_acc + cfg.early_stop_delta
            # ">= on first save": unlike the reference (train.py:281, which
            # can end a degenerate run with no checkpoint at all), always
            # export a best model once.
            if (val_m["acc"] > result.best_val_acc
                    or result.best_variables is None):
                result.best_val_acc = val_m["acc"]
                result.best_variables = {
                    "params": jax.device_get(state.params),
                    "batch_stats": jax.device_get(state.batch_stats),
                }
                if checkpointer is not None:
                    checkpointer.save_best(result.best_variables,
                                           result.best_val_acc, epoch + 1)
            if improved:
                no_improve = 0
            else:
                no_improve += 1
                log(f"no improvement for {no_improve} epoch(s)")

            if checkpointer is not None:
                checkpointer.save_state(state, epoch + 1,
                                        result.best_val_acc, no_improve)

            result.epochs_run = epoch + 1
            if no_improve >= cfg.early_stop_patience:
                log(f"early stopping after {epoch + 1} epochs")
                result.stopped_early = True
                break
            if preempted["flag"]:
                log(f"preempted; state checkpointed at epoch {epoch + 1}")
                result.stopped_early = True
                break

        for sig, handler in prev_handlers.items():
            try:
                signal.signal(sig, handler)
            except (ValueError, OSError):
                pass
        log(f"training complete; best val accuracy {result.best_val_acc:.4f}")
        return state, result
