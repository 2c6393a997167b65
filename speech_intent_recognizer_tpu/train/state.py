"""Train state and optimizer.

Optimizer parity with the reference recipe (``scripts/train.py:242-261`` —
``torch.optim.Adam(lr, weight_decay)`` + CrossEntropyLoss + AMP):

* torch Adam's ``weight_decay`` is L2-added-to-gradient *before* the moment
  updates (not decoupled AdamW) — reproduced as
  ``optax.add_decayed_weights`` ahead of ``scale_by_adam``;
* ``grad_clip`` from the config (configs/config.yaml:18; the reference
  declares it but only its wav2vec trainer used it) is wired as global-norm
  clipping on the raw gradients;
* AMP's GradScaler has no TPU analog — bf16 keeps fp32's exponent range so
  gradients never overflow and no loss scaling is needed.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def create_optimizer(
    lr: float = 5e-5,
    weight_decay: float = 1e-4,
    grad_clip: Optional[float] = 1.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    warmup_steps: int = 0,
    schedule: str = "constant",
    total_steps: Optional[int] = None,
) -> optax.GradientTransformation:
    """Reference-recipe Adam chain, optionally with a TPU-native LR schedule.

    The defaults (constant LR, no warmup) reproduce the reference's
    ``torch.optim.Adam`` exactly (see module docstring).  The large-batch
    recipe (``bench_train.py --recipe large_batch``; BENCH_NOTES.md round 4)
    adds linear warmup over ``warmup_steps`` and, with
    ``schedule="cosine"``, a cosine decay to zero over ``total_steps`` —
    the standard stabilizers for batch sizes 16x-128x the reference's.
    """
    parts = []
    if grad_clip is not None and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # L2-in-gradient (torch Adam semantics), not decoupled decay.
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if warmup_steps or schedule != "constant":
        if schedule == "cosine":
            if not total_steps:
                raise ValueError("schedule='cosine' requires total_steps")
            sched = optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=lr,
                warmup_steps=max(int(warmup_steps), 1),
                decay_steps=int(total_steps), end_value=0.0)
        elif schedule == "constant":
            sched = optax.linear_schedule(
                init_value=0.0, end_value=lr,
                transition_steps=max(int(warmup_steps), 1))
        else:
            raise ValueError(f"unknown schedule {schedule!r}")
        parts.append(optax.scale_by_learning_rate(sched))
    else:
        parts.append(optax.scale(-lr))
    return optax.chain(*parts)


def optimizer_from_config(cfg, n_train: int) -> optax.GradientTransformation:
    """Build the optimizer a config describes, resolving the cosine
    schedule's horizon from the dataset size (total steps = epochs x
    ceil(n_train / batch))."""
    t = cfg.train
    total = t.epochs * -(-n_train // t.batch_size)
    return create_optimizer(
        lr=t.lr, weight_decay=t.weight_decay, grad_clip=t.grad_clip,
        warmup_steps=getattr(t, "warmup_steps", 0),
        schedule=getattr(t, "lr_schedule", "constant"),
        total_steps=total)


def create_train_state(model, rng: jax.Array, tx: optax.GradientTransformation,
                       input_shape=(1, 64, 200)) -> TrainState:
    variables = model.init({"params": rng}, jnp.zeros(input_shape),
                           train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        tx=tx,
    )
