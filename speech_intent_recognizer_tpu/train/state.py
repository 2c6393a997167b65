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
) -> optax.GradientTransformation:
    parts = []
    if grad_clip is not None and grad_clip > 0:
        parts.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        # L2-in-gradient (torch Adam semantics), not decoupled decay.
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    parts.append(optax.scale(-lr))
    return optax.chain(*parts)


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
