"""Pallas TPU kernel: conv2 + conv3 stages (conv/bias/ReLU/2x2-maxpool x2)
of the CNNAudioGRU conv stack, VMEM-resident end to end.

Counterpart of the reference's L2/L3 conv stages (``models/models.py:14-21``,
Conv3x3/BN/ReLU/MaxPool2 with 32->64->128 channels), consuming the fused
frontend+conv1 kernel's pooled output (``ops/frontend_pallas.py``, layout
``(B, T1, M1*C1)`` with lane = m*C1 + c) and emitting the pre-GRU feature
sheet ``(B, T1//4, (M1//4)*C3)`` with lane = m*C3 + c.

Why a kernel: at b1024 XLA runs these two stages in 6.0 ms of the 6.36 ms
variant-model forward — it pads the GEMMs (K 288->384, N 64->128; K 576->640)
and round-trips every activation through HBM (~1 GB/batch).  Here both
stages run as *exactly-shaped* GEMMs with all activations in VMEM:

* im2col without reshapes: the mel-and-channel lane layout is sliced into
  per-mel-block patches using only whole-sheet ``pltpu.roll`` pre-shifts and
  128-aligned static lane slices (Mosaic's in-kernel reshape of
  (100, 1024) -> (1600, 64) crashes the compiler; nothing here reshapes).
* conv2: 16 dots of (T1, 384) x (384, 128) — K = 3 time taps x 128 lanes
  covering mel window {2mh-1..2mh+2} x 32 channels, N = [even | odd] output
  mel parity x 64 channels.  ``max`` over the parity halves IS the
  mel-direction 2-pool (ReLU commutes with max).  Zero MXU padding.
* conv3: 8 dots of (T2, 768) x (768, 256), same construction one level up.
* pooled lanes are re-packed dense by a log-step roll compaction (valid
  runs of u at stride 2u -> one ``pltpu.roll`` + two selects per step).
* the time-direction pool is a roll+max plus an exact 0/1 row-selection
  dot (odd rows are never selected, so roll wrap at the last row is
  harmless — same argument as the frontend kernel's time pool).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BU = 2  # utterances per grid step (the kernel body is fully unrolled per
         # utterance — 26 dots each — so larger bu mostly costs compile time)


def _compact(x, unit: int, steps: int):
    """Pack valid runs (length ``unit`` at stride ``2*unit``, starting at
    lane 0, zeros elsewhere) into the low half of the sheet.

    Each step merges run pairs: runs at an odd multiple of ``2*unit`` shift
    left by ``unit`` (one whole-sheet roll + two lane-index selects), so
    ``steps = log2(n_runs)`` steps leave one dense run at lane 0.
    """
    w = x.shape[1]
    li = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for _ in range(steps):
        q = jax.lax.rem(li // unit, 4)
        x = (jnp.where(q == 0, x, 0)
             + jnp.where(q == 1, pltpu.roll(x, w - unit, 1), 0))
        unit *= 2
    return x


def _time_shift_sheets(x, t):
    """(x[t-1], x[t], x[t+1]) with zero rows at the boundaries (SAME pad)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    prev = jnp.where(ri == 0, 0, pltpu.roll(x, 1, 0))
    nxt = jnp.where(ri == t - 1, 0, pltpu.roll(x, t - 1, 0))
    return prev, x, nxt


def _conv23_kernel(x_ref, w2_ref, b2_ref, w3_ref, b3_ref, s1_ref, s2_ref,
                   o_ref, *, bu, t1, out_dtype):
    # NB: all sheet data stays f32 inside the kernel — Mosaic's rotate
    # (every pltpu.roll) supports 32-bit data only; bf16 enters at each
    # dot's LHS cast, matching the variant model's bf16 conv compute.
    lane = _LANE
    t2 = t1 // 2
    b2t = b2_ref[...]  # (1, 128) f32, [bias | bias] over output parity
    b3t = b3_ref[...]  # (1, 256)
    for u in range(bu):
        x = x_ref[u].astype(jnp.float32)  # (t1, 1024), lane = m*32 + c
        # ---- conv2: 16 mel-block dots ---------------------------------
        zer = jnp.zeros((t1, lane), jnp.float32)
        pas, pbs = [], []
        for d in _time_shift_sheets(x, t1):
            pbase = jnp.concatenate([zer, d, zer], axis=1)  # x at +128
            w = pbase.shape[1]
            pa = pltpu.roll(pbase, w - 96, 1)  # x at lane offset +32
            pas.append(pa)
            pbs.append(pltpu.roll(pa, w - 64, 1))  # x at offset -32
        zs = []
        for mh in range(16):
            # patch lanes [mh*64-32, mh*64+96) as a 128-aligned slice
            ps, o0 = (pas, mh * 64) if mh % 2 == 0 else (pbs, (mh - 1) * 64)
            lhs = jnp.concatenate(
                [p[:, o0:o0 + lane] for p in ps], axis=1).astype(jnp.bfloat16)
            z = jnp.dot(lhs, w2_ref[...],
                        preferred_element_type=jnp.float32)  # (t1, 128)
            z = jnp.maximum(z + b2t, 0.0)
            zp = jnp.maximum(z, pltpu.roll(z, 64, 1))  # mel 2-pool
            li = jax.lax.broadcasted_iota(jnp.int32, zp.shape, 1)
            zs.append(jnp.where(li < 64, zp, 0.0))
        y = jnp.concatenate(zs, axis=1)          # (t1, 2048), 64 @ 128
        y = _compact(y, 64, 4)[:, :1024]         # lane = m'*64 + c (m'=16)
        # time 2-pool: odd rows never selected, wrap at t1-1 harmless
        tp = jnp.maximum(y, pltpu.roll(y, t1 - 1, 0))
        y2 = jnp.dot(s1_ref[...], tp.astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
        # ---- conv3: 8 mel-block dots ----------------------------------
        zer3 = jnp.zeros((t2, lane), jnp.float32)
        pa3 = []
        for d in _time_shift_sheets(y2, t2):
            pbase = jnp.concatenate([zer3, d, zer3], axis=1)  # x at +128
            pa3.append(pltpu.roll(pbase, pbase.shape[1] - 64, 1))  # at +64
        zs3 = []
        for mh in range(8):
            # patch lanes [mh*128-64, mh*128+192) as a 128-aligned slice
            lhs = jnp.concatenate(
                [p[:, mh * lane:mh * lane + 2 * lane] for p in pa3],
                axis=1).astype(jnp.bfloat16)
            z = jnp.dot(lhs, w3_ref[...],
                        preferred_element_type=jnp.float32)  # (t2, 256)
            z = jnp.maximum(z + b3t, 0.0)
            zp = jnp.maximum(z, pltpu.roll(z, lane, 1))
            li = jax.lax.broadcasted_iota(jnp.int32, zp.shape, 1)
            zs3.append(jnp.where(li < lane, zp, 0.0))
        y3 = jnp.concatenate(zs3, axis=1)        # (t2, 2048), 128 @ 256
        y3 = _compact(y3, lane, 3)[:, :1024]     # lane = m''*128 + c
        tp3 = jnp.maximum(y3, pltpu.roll(y3, t2 - 1, 0))
        out = jnp.dot(s2_ref[...], tp3.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        o_ref[u] = out.astype(out_dtype)


def conv23_operands(k2, b2, k3, b3):
    """Kernel RHS/bias operands from the BN-folded conv2/conv3 params.

    Args are the *original-orientation* folded arrays (flax HWIO with
    spatial dims (mel, time)): k2 (3, 3, 32, 64), k3 (3, 3, 64, 128).

    Returns (w2, b2t, w3, b3t): w2 (384, 128) rows = (dt block 128) x
    (32 + 32*d + cin) for mel offset d = m_in - 2*mh in {-1, 0, 1, 2},
    cols = parity*64 + cout (parity = m_out - 2*mh); w3 the same one level
    up (256-row dt blocks, 64 + 64*d + cin, parity*128 + cout).
    """
    k2 = np.asarray(k2, np.float32)
    k3 = np.asarray(k3, np.float32)
    if k2.shape != (3, 3, 32, 64) or k3.shape != (3, 3, 64, 128):
        raise ValueError("conv23 kernel requires channels (32, 64, 128)")

    def band(k, ci, co, blk):
        w = np.zeros((3 * blk, 2 * co), np.float32)
        for dtb, dt in enumerate((-1, 0, 1)):
            for d in (-1, 0, 1, 2):
                for par in (0, 1):
                    dm = d - par
                    if dm not in (-1, 0, 1):
                        continue
                    r0 = dtb * blk + ci + ci * d
                    w[r0:r0 + ci, par * co:(par + 1) * co] = k[dm + 1, dt + 1]
        return jnp.asarray(w, jnp.bfloat16)

    b2t = np.concatenate([np.asarray(b2, np.float32)] * 2)[None]
    b3t = np.concatenate([np.asarray(b3, np.float32)] * 2)[None]
    return (band(k2, 32, 64, 128), jnp.asarray(b2t),
            band(k3, 64, 128, 256), jnp.asarray(b3t))


def _row_selector(t_out: int, t_in: int) -> jax.Array:
    """(t_out, t_in) 0/1 matrix selecting even rows (exact in bf16)."""
    s = np.zeros((t_out, t_in), np.float32)
    s[np.arange(t_out), 2 * np.arange(t_out)] = 1.0
    return jnp.asarray(s, jnp.bfloat16)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _conv23_call(x, w2, b2t, w3, b3t, s1, s2, interpret):
    b, t1, width = x.shape
    bu = _BU
    b_pad = -(-b // bu) * bu
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0), (0, 0)))
    t2, t3 = t1 // 2, t1 // 4
    kernel = functools.partial(_conv23_kernel, bu=bu, t1=t1,
                               out_dtype=x.dtype)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(b_pad // bu,),
        in_specs=[
            pl.BlockSpec((bu, t1, width), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((3 * _LANE, _LANE)),       # conv2 band RHS
            const((1, _LANE)),               # conv2 bias (parity-tiled)
            const((6 * _LANE, 2 * _LANE)),   # conv3 band RHS
            const((1, 2 * _LANE)),           # conv3 bias
            const((t2, t1)),                 # time-pool selector 1
            const((t3, t2)),                 # time-pool selector 2
        ],
        out_specs=pl.BlockSpec((bu, t3, 8 * _LANE), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, t3, 8 * _LANE), x.dtype),
        cost_estimate=pl.CostEstimate(
            # 16 conv2 dots + 8 conv3 dots + 2 selection dots per utterance
            flops=b_pad * (16 * 2 * t1 * 3 * _LANE * _LANE
                           + 8 * 2 * t2 * 6 * _LANE * 2 * _LANE
                           + 2 * t2 * t1 * 1024 + 2 * t3 * t2 * 1024),
            bytes_accessed=(b_pad * t1 * width * 2
                            + b_pad * t3 * 8 * _LANE * 2
                            + (3 * _LANE * _LANE + 6 * _LANE * 2 * _LANE) * 2),
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w2, b2t, w3, b3t, s1, s2)
    return out[:b]


def conv23_pallas(x: jax.Array, w2: jax.Array, b2t: jax.Array,
                  w3: jax.Array, b3t: jax.Array) -> jax.Array:
    """conv2+pool2+conv3+pool3 on the fused-conv1 kernel's output.

    Args:
      x: (B, T1, 1024) bf16 pooled L1 activations, lane = m*32 + c with
        m in 0..31 (the ``fused_frontend_conv1_pallas`` layout); T1 even
        and divisible by 4 (reference geometry: T1 = 100).
      w2/b2t/w3/b3t: from :func:`conv23_operands`.

    Returns (B, T1//4, 1024) activations, lane = m*128 + c with m in 0..7
    — reshape to (B, T, 8, 128) and flatten channel-major for the GRU
    (``CNNAudioGRU(conv_external=True)`` does exactly that).
    """
    b, t1, width = x.shape
    if width != 1024 or t1 % 4:
        raise ValueError("conv23 kernel requires (B, 4k, 1024) input")
    s1 = _row_selector(t1 // 2, t1)
    s2 = _row_selector(t1 // 4, t1 // 2)
    interpret = jax.default_backend() != "tpu"
    return _conv23_call(x, w2, b2t, w3, b3t, s1, s2, interpret)
