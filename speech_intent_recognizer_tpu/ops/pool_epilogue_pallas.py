"""Pallas TPU kernel: the conv *epilogue* (bias + ReLU + 2x2 max-pool).

Counterpart of the reference's per-stage ``ReLU(BN(conv)) -> MaxPool2``
tail (``models/models.py:10-21``) for the ``conv1_external`` inference
variant, where BN is already folded into the conv kernel/bias.

Why this kernel exists (measured on v5e, BENCH_NOTES.md round 3):
XLA-on-TPU does **not** fuse any output epilogue into a convolution — the
conv itself runs near peak (conv2 alone 1.49 ms/b2048, ~82% MFU), but the
bias/relu/pool epilogue is a separate full-activation round trip that runs
at ~300 GB/s effective (conv2 stage 4.96 ms total; a standalone max-pool on
the materialized activation alone costs 2.75 ms).  The prior attacks tried
to beat the *conv* in Pallas and lost (conv23 per-utterance and
batched-sheet kernels, parity-stride convs, NCHW — all measured negative).
This kernel leaves the conv to XLA and replaces only the epilogue pass
with a lane-dense streaming kernel.

**Measured NEGATIVE — kept as a parity-tested opt-in experiment**
(``CNNAudioGRU(pool_impl="pallas")``; the production default stays XLA).
On v5e at conv2's b2048 geometry: this kernel 5.3 ms vs XLA's fused
epilogue 2.8 ms — and a *pure copy* Pallas kernel over the same blocks
(one load + one store, zero compute, any block size 4..32 utterances or
2-D row sheets) also measures 2.7 ms.  XLA's epilogue already runs at the
Pallas streaming floor; the pipeline is element-throughput-bound (f32
moves 2x the bytes of bf16 in only 1.3x the time), so there is no
recoverable epilogue headroom short of fusing the conv itself — which
lost twice (``conv23_pallas`` revisions).  Full table in BENCH_NOTES.md
round 3.

Design (both dtype paths parity-tested; the bf16 path is bit-identical to
the XLA variant's epilogue):

* input is the raw (pre-bias) conv output collapsed to ``(B, T, W*C)``
  rows (lane = w*C + c — the row-major NHWC collapse, so the reshape is
  free), full 128-lane utilization instead of XLA's half-empty
  C=64-minor-dim vregs;
* time 2-pool: one sublane roll + max, then an exact 0/1 row-selection dot
  (odd rows are never selected, so the roll wrap at the last row is
  harmless — same argument as the frontend kernel's time pool);
* mel 2-pool: one lane roll (+C) + max over adjacent mel blocks, then the
  log-step roll compaction from ``conv23_pallas._compact`` packs the
  surviving even-mel blocks dense;
* bias + ReLU run on the *pooled* quarter-size sheet (exact: spatial max
  commutes with the monotonic ReLU and the per-channel bias — the reorder
  was verified exactly in the round-3 epilogue study).

Inference-only (no custom VJP); training keeps XLA's differentiable ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_intent_recognizer_tpu.ops.conv23_pallas import (
    _compact, _row_selector)

_BU = 8  # utterances per grid step


def _pool_epilogue_kernel_f32(x_ref, s_ref, b_ref, o_ref, *, bu, t, w, c):
    """Exact f32 path (tests / fp32 variants): pool first, bias+ReLU on the
    quarter-size pooled sheet (exact — max commutes with the monotonic ReLU
    and the per-channel bias)."""
    width = w * c
    half = width // 2
    steps = (w // 2).bit_length() - 1  # log2(number of surviving mel runs)
    bias = b_ref[...].astype(jnp.float32)[:, :half]
    for u in range(bu):
        x = x_ref[u]  # (t, width) f32, lane = m*c + ch
        # time 2-pool: row i pairs with row i+1; odd rows never selected
        tp = jnp.maximum(x, pltpu.roll(x, t - 1, 0))
        y = jax.lax.dot(s_ref[...].astype(jnp.float32), tp,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
        # mel 2-pool: even mel block m pairs with block m+1 (wrap harmless)
        y = jnp.maximum(y, pltpu.roll(y, width - c, 1))
        li = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        y = jnp.where(jax.lax.rem(li // c, 2) == 0, y, 0.0)
        y = _compact(y, c, steps)[:, :half]  # lane = m'*c + ch, dense
        o_ref[u] = jnp.maximum(y + bias, 0.0)


def _pool_epilogue_kernel_bf16(x_ref, s_ref, b_ref, o_ref, *, bu, t, w, c):
    """bf16 fast path: everything stays 16-bit.

    bias+ReLU run first (the values must be non-negative for the integer
    max trick), then ``pltpu.bitcast`` packs consecutive ROW pairs into one
    i32 lane — which are exactly the time-pool pairs — so the time 2-pool
    is a sign-extended hi/lo integer max (IEEE non-negative floats order as
    integers; -0.0 sign-extends most-negative and correctly loses).  The
    mel 2-pool + log-step compaction run on the half-height i32 sheet, and
    one exact 0/1 selection dot unpacks the even rows at the end.
    """
    width = w * c
    half = width // 2
    steps = (w // 2).bit_length() - 1
    bias = b_ref[...]  # (1, width) bf16, bias tiled per PRE-pool mel block
    for u in range(bu):
        z = jnp.maximum(x_ref[u] + bias, 0)  # (t, width) bf16
        pi = pltpu.bitcast(z, jnp.int32)  # (t//2, width): lo=row 2i, hi=2i+1
        lo = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(pi, 16), 16)
        hi = jax.lax.shift_right_arithmetic(pi, 16)
        tp = jnp.maximum(hi, lo)  # time-pooled bf16 pattern in low 16 bits
        # mel 2-pool in the packed domain (lane count is unchanged)
        mp = jnp.maximum(tp, pltpu.roll(tp, width - c, 1))
        li = jax.lax.broadcasted_iota(jnp.int32, mp.shape, 1)
        mp = jnp.where(jax.lax.rem(li // c, 2) == 0, mp, 0)
        mp = _compact(mp, c, steps)[:, :half]
        # low 16 bits -> bf16 lanes: values land on even rows, zeros on odd
        y = pltpu.bitcast(jnp.bitwise_and(mp, 0xFFFF), jnp.bfloat16)
        o_ref[u] = jnp.dot(s_ref[...], y,
                           preferred_element_type=jnp.float32).astype(
                               jnp.bfloat16)


@functools.partial(jax.jit,
                   static_argnames=("t", "w", "c", "interpret"))
def _pool_epilogue_call(x, s, bias_t, t, w, c, interpret):
    b = x.shape[0]
    width = w * c
    bu = _BU
    b_pad = -(-b // bu) * bu
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    body = (_pool_epilogue_kernel_bf16 if x.dtype == jnp.bfloat16
            else _pool_epilogue_kernel_f32)
    kernel = functools.partial(body, bu=bu, t=t, w=w, c=c)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bu,),
        in_specs=[
            pl.BlockSpec((bu, t, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t // 2, t), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bu, t // 2, width // 2),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, t // 2, width // 2), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=b_pad * (t // 2) * t * width * 2,
            bytes_accessed=(b_pad * t * width
                            + b_pad * (t // 2) * (width // 2))
            * x.dtype.itemsize,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, s, bias_t)
    return out[:b]


def bias_relu_pool2_pallas(y: jax.Array, bias: jax.Array) -> jax.Array:
    """``maxpool2x2(relu(y + bias))`` as one streaming Pallas pass.

    Args:
      y: (B, T, W, C) raw conv output (NHWC, *no* bias applied), T even,
        W a power of two >= 4, W*C a multiple of 128 lanes.  In the
        ``conv1_external`` variant the spatial dims are (time, mel).
      bias: (C,) per-channel bias (the BN-folded conv bias).

    Returns (B, T//2, W//2, C), same dtype as ``y``.
    """
    b, t, w, c = y.shape
    if t % 2 or w < 4 or (w & (w - 1)) or (w * c) % 128:
        raise ValueError(f"unsupported pool epilogue geometry {y.shape}")
    x = y.reshape(b, t, w * c)
    s = _row_selector(t // 2, t)
    # bias tiled per PRE-pool mel block, in the data dtype (the bf16 path
    # adds it in bf16 — bit-matching nn.Conv's bf16 bias add)
    bias_t = jnp.tile(jnp.asarray(bias, jnp.float32), w)[None].astype(y.dtype)
    interpret = jax.default_backend() != "tpu"
    out = _pool_epilogue_call(x, s, bias_t, t, w, c, interpret)
    return out.reshape(b, t // 2, w // 2, c)
