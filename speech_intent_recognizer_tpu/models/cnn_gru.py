"""CNN -> BiGRU -> attention intent classifier (Flax).

Capability-parity reimplementation of the reference's ``CNNAudioGRU``
(``models/models.py:5-68``): three Conv3x3/BN/ReLU/MaxPool2 stages
(1->32->64->128 channels), a 2-layer bidirectional GRU (hidden 256, dropout
0.5 between layers), additive attention pooling over time, and a linear
classifier head — 3,261,184 parameters for 31 classes, matching the
reference's 3.26 M.

TPU-first design choices (not a torch translation):

* NHWC layout end-to-end (the TPU-native conv layout); the flattening into
  GRU features preserves the reference's channel-major ordering so the
  PyTorch checkpoint converter is exact.
* The GRU input projections for all timesteps are hoisted out of the
  recurrence into one large (B*T, in) x (in, 3H) GEMM per layer/direction —
  MXU-shaped — leaving only the (B, H) x (H, 3H) recurrent matmul inside
  ``lax.scan`` (25 steps after pooling).
* PyTorch GRU cell semantics exactly (gate order r,z,n and the double-bias
  ``n = tanh(W_in x + b_in + r * (W_hn h + b_hn))`` form) so converted
  checkpoints are logit-identical.
* bf16 compute / fp32 params via ``compute_dtype`` (the TPU equivalent of
  the reference's CUDA AMP, ``scripts/train.py:93-101``); BatchNorm and
  softmax stay fp32.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gru_direction_scan(x_proj, h0, w_hh, b_hh, reverse: bool):
    """Run one GRU direction.

    Args:
      x_proj: (T, B, 3H) precomputed ``x @ W_ih^T + b_ih`` for every step.
      h0: (B, H) initial hidden state.
      w_hh: (3H, H) recurrent weights in PyTorch [r; z; n] row order.
      b_hh: (3H,) recurrent bias.
      reverse: scan right-to-left (the backward direction).

    Returns: (T, B, H) hidden states in forward time order.
    """
    hidden = h0.shape[-1]
    w_hh_t = w_hh.T  # (H, 3H)

    def step(h, gx):
        gh = jnp.dot(h, w_hh_t) + b_hh
        r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
        z = jax.nn.sigmoid(gx[:, hidden : 2 * hidden] + gh[:, hidden : 2 * hidden])
        n = jnp.tanh(gx[:, 2 * hidden :] + r * gh[:, 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    # Full unroll: after pooling the sequence is only ~25 steps, so the
    # recurrence is loop-overhead-bound, not FLOP-bound — unrolling lets XLA
    # software-pipeline the small (B, H) x (H, 3H) matmuls.
    _, ys = jax.lax.scan(step, h0, x_proj, reverse=reverse,
                         unroll=min(x_proj.shape[0], 32))
    return ys


class TorchGRU(nn.Module):
    """Multi-layer bidirectional GRU with PyTorch cell semantics.

    Parameter layout mirrors ``torch.nn.GRU`` (``w_ih``/``w_hh``/``b_ih``/
    ``b_hh`` per layer and direction, rows in [r; z; n] order) so the
    checkpoint converter is a pure transpose-free copy.
    """

    hidden_size: int
    num_layers: int = 2
    bidirectional: bool = True
    dropout: float = 0.5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F)
        b = x.shape[0]
        directions = ("fwd", "bwd") if self.bidirectional else ("fwd",)
        for layer in range(self.num_layers):
            in_features = x.shape[-1]
            outs = []
            for direction in directions:
                name = f"l{layer}_{direction}"
                # U(-1/sqrt(H), 1/sqrt(H)) — the torch.nn.GRU default.
                bound = 1.0 / float(self.hidden_size) ** 0.5

                def init(key, shape, dtype=jnp.float32, _b=bound):
                    return jax.random.uniform(key, shape, dtype, -_b, _b)

                w_ih = self.param(f"{name}_w_ih", init,
                                  (3 * self.hidden_size, in_features))
                w_hh = self.param(f"{name}_w_hh", init,
                                  (3 * self.hidden_size, self.hidden_size))
                b_ih = self.param(f"{name}_b_ih", init, (3 * self.hidden_size,))
                b_hh = self.param(f"{name}_b_hh", init, (3 * self.hidden_size,))
                w_ih = w_ih.astype(self.compute_dtype)
                w_hh = w_hh.astype(self.compute_dtype)
                b_ih = b_ih.astype(self.compute_dtype)
                b_hh = b_hh.astype(self.compute_dtype)

                # One big MXU GEMM for all timesteps' input projections.
                gx = jnp.dot(x.astype(self.compute_dtype), w_ih.T) + b_ih
                gx = jnp.swapaxes(gx, 0, 1)  # (T, B, 3H)
                h0 = jnp.zeros((b, self.hidden_size), self.compute_dtype)
                ys = _gru_direction_scan(gx, h0, w_hh, b_hh,
                                         reverse=(direction == "bwd"))
                outs.append(jnp.swapaxes(ys, 0, 1))  # (B, T, H)
            x = jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]
            if layer < self.num_layers - 1 and self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class CNNAudioGRU(nn.Module):
    """Flagship intent classifier; forward contract matches the reference:
    ``(B, 64, 200)`` or ``(B, 1, 64, 200)`` log-mel in -> ``(B, C)`` logits."""

    num_classes: int
    conv_channels: Sequence[int] = (32, 64, 128)
    gru_hidden: int = 256
    gru_layers: int = 2
    dropout: float = 0.5
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # Accept (B, n_mels, T) or (B, 1, n_mels, T) like the reference
        # (models.py:46-47); convert to NHWC (B, n_mels, T, 1).
        if x.ndim == 3:
            x = x[..., None]
        elif x.ndim == 4 and x.shape[1] == 1:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.compute_dtype)

        for i, features in enumerate(self.conv_channels):
            x = nn.Conv(features, (3, 3), strides=1, padding="SAME",
                        use_bias=False, dtype=self.compute_dtype,
                        param_dtype=jnp.float32, name=f"conv{i + 1}")(x)
            # BatchNorm in fp32 for stable statistics under bf16 compute.
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32,
                             param_dtype=jnp.float32,
                             name=f"bn{i + 1}")(x.astype(jnp.float32))
            x = nn.relu(x).astype(self.compute_dtype)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # (B, H', T', C) -> (B, T', C * H') with channel-major feature order,
        # matching the reference's permute+view (models.py:54-57) so converted
        # checkpoints see identical GRU inputs.
        b, h, t, c = x.shape
        x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b, t, c * h)

        x = TorchGRU(hidden_size=self.gru_hidden, num_layers=self.gru_layers,
                     bidirectional=True, dropout=self.dropout,
                     compute_dtype=self.compute_dtype, name="gru")(x, train=train)

        # Additive attention pooling (softmax in fp32).
        scores = nn.Dense(1, dtype=self.compute_dtype,
                          param_dtype=jnp.float32, name="attention")(x)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
        pooled = jnp.sum(x.astype(jnp.float32) * weights, axis=1)

        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="fc")(pooled)
        return logits


def create_model(num_classes: int, compute_dtype=jnp.float32,
                 **kwargs) -> CNNAudioGRU:
    return CNNAudioGRU(num_classes=num_classes, compute_dtype=compute_dtype,
                       **kwargs)


def init_model(model: CNNAudioGRU, rng: jax.Array,
               input_shape=(1, 64, 200)) -> dict:
    variables = model.init({"params": rng}, jnp.zeros(input_shape), train=False)
    return variables


def count_params(params) -> int:
    return sum(int(p.size) for p in jax.tree.leaves(params))
