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


def _gru_bidirectional_scan(gx_fwd, gx_bwd, w_hh_fwd, w_hh_bwd,
                            b_hh_fwd, b_hh_bwd, hidden: int):
    """Run both GRU directions in ONE fused scan.

    The recurrence is the serial critical path of the whole model (~25
    steps of small matmuls after pooling).  Running fwd and bwd as separate
    scans doubles that serial depth for no reason: the backward direction
    over reversed inputs is the same recurrence.  Here both directions'
    recurrent matmuls execute as a single batched ``(2, B, H) x (2, H, 3H)``
    contraction per step, and the scan is fully unrolled so XLA can
    software-pipeline the steps.

    Args:
      gx_fwd/gx_bwd: (T, B, 3H) precomputed input projections
        ``x @ W_ih^T + b_ih`` per direction (one big MXU GEMM upstream).
      w_hh_*: (3H, H) PyTorch-layout recurrent weights.
      b_hh_*: (3H,).

    Returns (ys_fwd, ys_bwd): each (T, B, H), both in forward time order.
    """
    t = gx_fwd.shape[0]
    # (T, 2, B, 3H): lane 0 walks forward, lane 1 walks the reversed seq
    gx = jnp.stack([gx_fwd, gx_bwd[::-1]], axis=1)
    w = jnp.stack([w_hh_fwd.T, w_hh_bwd.T], axis=0)  # (2, H, 3H)
    b = jnp.stack([b_hh_fwd, b_hh_bwd], axis=0)[:, None, :]  # (2, 1, 3H)
    h0 = jnp.zeros((2, gx_fwd.shape[1], hidden), gx_fwd.dtype)

    def step(h, gxt):
        gh = jax.lax.dot_general(
            h, w, dimension_numbers=(((2,), (1,)), ((0,), (0,)))) + b
        r = jax.nn.sigmoid(gxt[..., :hidden] + gh[..., :hidden])
        z = jax.nn.sigmoid(gxt[..., hidden : 2 * hidden]
                           + gh[..., hidden : 2 * hidden])
        n = jnp.tanh(gxt[..., 2 * hidden :] + r * gh[..., 2 * hidden :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    _, ys = jax.lax.scan(step, h0, gx, unroll=min(t, 32))
    return ys[:, 0], ys[:, 1][::-1]


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
    # "scan" (default) or "pallas" (single-kernel recurrence per layer;
    # trainable — custom VJP in ops/gru_pallas.py, gradient-parity tested)
    impl: str = "scan"

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, F)
        directions = ("fwd", "bwd") if self.bidirectional else ("fwd",)
        # U(-1/sqrt(H), 1/sqrt(H)) — the torch.nn.GRU default.
        bound = 1.0 / float(self.hidden_size) ** 0.5

        def init(key, shape, dtype=jnp.float32, _b=bound):
            return jax.random.uniform(key, shape, dtype, -_b, _b)

        for layer in range(self.num_layers):
            in_features = x.shape[-1]
            params = {}
            for direction in directions:
                name = f"l{layer}_{direction}"
                params[direction] = tuple(
                    self.param(f"{name}_{p}", init, shape).astype(
                        self.compute_dtype)
                    for p, shape in (
                        ("w_ih", (3 * self.hidden_size, in_features)),
                        ("w_hh", (3 * self.hidden_size, self.hidden_size)),
                        ("b_ih", (3 * self.hidden_size,)),
                        ("b_hh", (3 * self.hidden_size,)),
                    ))

            xc = x.astype(self.compute_dtype)
            if self.bidirectional:
                wf, wb = params["fwd"], params["bwd"]
                # One big MXU GEMM per direction for all input projections.
                gx_f = jnp.swapaxes(jnp.dot(xc, wf[0].T) + wf[2], 0, 1)
                gx_b = jnp.swapaxes(jnp.dot(xc, wb[0].T) + wb[2], 0, 1)
                if self.impl == "pallas":
                    from speech_intent_recognizer_tpu.ops.gru_pallas import (
                        gru_bidirectional_pallas)

                    ys_f, ys_b = gru_bidirectional_pallas(
                        gx_f, gx_b, wf[1], wb[1], wf[3], wb[3],
                        self.hidden_size)
                else:
                    ys_f, ys_b = _gru_bidirectional_scan(
                        gx_f, gx_b, wf[1], wb[1], wf[3], wb[3],
                        self.hidden_size)
                x = jnp.concatenate([jnp.swapaxes(ys_f, 0, 1),
                                     jnp.swapaxes(ys_b, 0, 1)], axis=-1)
            else:
                wf = params["fwd"]
                gx_f = jnp.swapaxes(jnp.dot(xc, wf[0].T) + wf[2], 0, 1)
                zero = jnp.zeros_like(gx_f)
                ys_f, _ = _gru_bidirectional_scan(
                    gx_f, zero, wf[1], wf[1], wf[3], wf[3], self.hidden_size)
                x = jnp.swapaxes(ys_f, 0, 1)
            if layer < self.num_layers - 1 and self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


# torch's Conv2d/Linear default weight init, kaiming_uniform(a=sqrt(5)):
# U(-1/sqrt(fan_in), 1/sqrt(fan_in)) == variance_scaling(1/3, fan_in, uniform)
# (fan_in = in_ch * kh * kw for convs, in_features for Dense — Flax computes
# the same fans from the kernel shape).  The reference never re-initializes
# (models.py:10-39 uses module defaults), so matching torch's init
# distribution is part of training-behavior parity: Flax's lecun_normal has
# 3x the weight variance and zero biases where torch draws U(+-1/sqrt(fan_in)).
_torch_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def _torch_bias_init(fan_in: int):
    bound = 1.0 / float(fan_in) ** 0.5

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class _RawConv(nn.Module):
    """3x3 SAME conv that declares ``nn.Conv``'s exact param tree
    (``kernel``/``bias``) but returns the *pre-bias* conv output plus the
    bias, so a Pallas epilogue kernel can apply bias+ReLU+pool in one
    streaming pass (XLA never fuses an epilogue into a conv — measured,
    BENCH_NOTES.md round 3).  Checkpoint-compatible with the ``nn.Conv``
    path by construction."""

    features: int
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", _torch_kernel_init,
                            (3, 3, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.features,), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(self.compute_dtype), kernel.astype(self.compute_dtype),
            window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y, bias


class CNNAudioGRU(nn.Module):
    """Flagship intent classifier; forward contract matches the reference:
    ``(B, 64, 200)`` or ``(B, 1, 64, 200)`` log-mel in -> ``(B, C)`` logits.

    ``fold_bn=True`` builds the inference-only variant whose BatchNorms have
    been folded into the conv kernels/biases (see :func:`fold_batchnorm`) —
    identical math, no fp32 BN round-trips between the bf16 convs."""

    num_classes: int
    conv_channels: Sequence[int] = (32, 64, 128)
    gru_hidden: int = 256
    gru_layers: int = 2
    dropout: float = 0.5
    compute_dtype: Any = jnp.float32
    fold_bn: bool = False
    gru_impl: str = "scan"  # "pallas" for the single-kernel recurrence
    # Inference variant whose first conv stage runs inside the Pallas
    # frontend kernel (ops/frontend_pallas.fused_frontend_conv1_pallas):
    # input is that kernel's pooled L1 output (B, T/2, (n_mels/2)*C1) and
    # conv2/conv3 operate on (T, M) with spatially-transposed kernels (see
    # conv1_external_params).  Requires fold_bn.
    conv1_external: bool = False
    # Inference variant with the ENTIRE conv stack external (conv1 in the
    # frontend kernel + ops/conv23_pallas for conv2/conv3): input is the
    # conv23 kernel's (B, T/8, (n_mels/8)*C3) sheet, lane = m*C3 + c; this
    # model is GRU + attention + head only.  Requires fold_bn.
    conv_external: bool = False
    # conv epilogue (bias+ReLU+2x2 maxpool) implementation for the
    # conv1_external variant: "xla" (nn.Conv + max_pool) or "pallas"
    # (raw conv + ops/pool_epilogue_pallas one-pass kernel; inference only)
    pool_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.conv_external:
            return self._forward_conv_external(x, train)
        if self.conv1_external:
            return self._forward_conv1_external(x, train)
        # Accept (B, n_mels, T) or (B, 1, n_mels, T) like the reference
        # (models.py:46-47); convert to NHWC (B, n_mels, T, 1).
        if x.ndim == 3:
            x = x[..., None]
        elif x.ndim == 4 and x.shape[1] == 1:
            x = jnp.transpose(x, (0, 2, 3, 1))
        x = x.astype(self.compute_dtype)

        for i, features in enumerate(self.conv_channels):
            x = nn.Conv(features, (3, 3), strides=1, padding="SAME",
                        use_bias=self.fold_bn, dtype=self.compute_dtype,
                        param_dtype=jnp.float32,
                        kernel_init=_torch_kernel_init,
                        name=f"conv{i + 1}")(x)
            if not self.fold_bn:
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
        return self._head(x, train)

    def _forward_conv1_external(self, x, train: bool):
        """Tail of the conv stack for the fused-conv1 kernel's output.

        ``x``: (B, T', M'*C1) with lane = m*C1 + c (the kernel layout), or
        already (B, T', M', C1).  Convs run on spatial dims (T, M) — the
        transpose of the standard path — so the converter transposes the
        conv2/conv3 kernels' spatial axes; the math is identical.
        """
        if not self.fold_bn:
            raise ValueError("conv1_external requires fold_bn=True")
        c1 = self.conv_channels[0]
        if x.ndim == 3:
            b, t, mc = x.shape
            x = x.reshape(b, t, mc // c1, c1)
        x = x.astype(self.compute_dtype)
        for i, features in enumerate(self.conv_channels[1:], start=2):
            if self.pool_impl == "pallas":
                from speech_intent_recognizer_tpu.ops.pool_epilogue_pallas \
                    import bias_relu_pool2_pallas

                y, bias = _RawConv(features, compute_dtype=self.compute_dtype,
                                   name=f"conv{i}")(x)
                x = bias_relu_pool2_pallas(y, bias)
            else:
                x = nn.Conv(features, (3, 3), strides=1, padding="SAME",
                            use_bias=True, dtype=self.compute_dtype,
                            param_dtype=jnp.float32,
                            kernel_init=_torch_kernel_init,
                            name=f"conv{i}")(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # (B, T', M', C) -> (B, T', C * M') channel-major (models.py:54-57)
        b, t, m, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * m)
        return self._head(x, train)

    def _forward_conv_external(self, x, train: bool):
        """GRU + attention + head only, for the conv23 kernel's output.

        ``x``: (B, T'', M''*C3) with lane = m*C3 + c (the
        ``ops.conv23_pallas`` layout), or already (B, T'', M'', C3).
        """
        if not self.fold_bn:
            raise ValueError("conv_external requires fold_bn=True")
        c3 = self.conv_channels[2]
        if x.ndim == 3:
            b, t, mc = x.shape
            x = x.reshape(b, t, mc // c3, c3)
        x = x.astype(self.compute_dtype)
        # channel-major flatten (models.py:54-57), as in the other variants
        b, t, m, c = x.shape
        x = jnp.transpose(x, (0, 1, 3, 2)).reshape(b, t, c * m)
        return self._head(x, train)

    def _head(self, x, train: bool):
        x = TorchGRU(hidden_size=self.gru_hidden, num_layers=self.gru_layers,
                     bidirectional=True, dropout=self.dropout,
                     compute_dtype=self.compute_dtype, impl=self.gru_impl,
                     name="gru")(x, train=train)

        # Additive attention pooling (softmax in fp32).
        scores = nn.Dense(1, dtype=self.compute_dtype,
                          param_dtype=jnp.float32,
                          kernel_init=_torch_kernel_init,
                          bias_init=_torch_bias_init(x.shape[-1]),
                          name="attention")(x)
        weights = jax.nn.softmax(scores.astype(jnp.float32), axis=1)
        pooled = jnp.sum(x.astype(jnp.float32) * weights, axis=1)

        logits = nn.Dense(self.num_classes, dtype=jnp.float32,
                          param_dtype=jnp.float32,
                          kernel_init=_torch_kernel_init,
                          bias_init=_torch_bias_init(pooled.shape[-1]),
                          name="fc")(pooled)
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


def fold_batchnorm(params: dict, batch_stats: dict, eps: float = 1e-5) -> dict:
    """Fold eval-mode BatchNorm into the preceding conv (inference only).

    ``BN(conv(x)) == conv'(x) + bias'`` with
    ``kernel' = kernel * scale / sqrt(var + eps)`` (per output channel) and
    ``bias' = bias - mean * scale / sqrt(var + eps)``.  Returns a params tree
    for ``CNNAudioGRU(fold_bn=True)`` — batch_stats are consumed.
    """
    out = {k: v for k, v in params.items() if not k.startswith("bn")}
    for name in list(params):
        if not name.startswith("conv"):
            continue
        idx = name[len("conv"):]
        bn = params.get(f"bn{idx}")
        stats = batch_stats.get(f"bn{idx}")
        if bn is None or stats is None:
            continue
        scale = jnp.asarray(bn["scale"], jnp.float32)
        bias = jnp.asarray(bn["bias"], jnp.float32)
        mean = jnp.asarray(stats["mean"], jnp.float32)
        var = jnp.asarray(stats["var"], jnp.float32)
        mult = scale / jnp.sqrt(var + eps)  # (O,)
        kernel = jnp.asarray(params[name]["kernel"], jnp.float32)
        out[name] = {
            "kernel": kernel * mult[None, None, None, :],
            "bias": bias - mean * mult,
        }
    return out


def conv1_external_params(folded_params: dict):
    """Split BN-folded params for the fused-conv1 inference variant.

    Returns ``(variant_params, conv1_kernel, conv1_bias)``:

    * ``variant_params`` — the ``CNNAudioGRU(conv1_external=True)`` tree:
      conv1 removed, conv2/conv3 kernels' spatial axes transposed (the
      variant convolves over (T, M) instead of (M, T); a 3x3 SAME conv is
      identical under transposed spatial dims with a transposed kernel).
    * ``conv1_kernel``/``conv1_bias`` — the folded L1 stage, to be turned
      into Pallas band operands via
      ``ops.frontend_pallas.conv1_band_operands``.
    """
    out = {}
    for name, p in folded_params.items():
        if name == "conv1":
            continue
        if name.startswith("conv"):
            out[name] = {
                "kernel": jnp.transpose(jnp.asarray(p["kernel"]),
                                        (1, 0, 2, 3)),
                "bias": jnp.asarray(p["bias"]),
            }
        else:
            out[name] = p
    c1 = folded_params["conv1"]
    return out, jnp.asarray(c1["kernel"]), jnp.asarray(c1["bias"])


def conv_external_params(folded_params: dict):
    """Split BN-folded params for the fully-conv-external inference variant.

    Returns ``(head_params, (k1, b1), (k2, b2), (k3, b3))``: the
    ``CNNAudioGRU(conv_external=True)`` tree (GRU/attention/fc only) plus
    the three folded conv stages in their original orientation — conv1 for
    ``ops.frontend_pallas.conv1_band_operands``, conv2/conv3 for
    ``ops.conv23_pallas.conv23_operands``.
    """
    head = {k: v for k, v in folded_params.items()
            if not k.startswith("conv")}

    def kb(name):
        p = folded_params[name]
        return jnp.asarray(p["kernel"]), jnp.asarray(p["bias"])

    return head, kb("conv1"), kb("conv2"), kb("conv3")
