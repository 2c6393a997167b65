"""Pallas TPU kernel for the bidirectional GRU recurrence (inference).

The GRU recurrence is the model's serial critical path: 25 timesteps x
2 layers of small (B, H) x (H, 3H) matmuls.  Under XLA each step is separate
HLO with its own scheduling overhead; this kernel runs the whole recurrence
of one layer — both directions — inside a single Pallas program per batch
tile: hidden states live in VMEM scratch, the recurrent weights are loaded
once, and each step is two MXU dots plus VPU gate math.

The input projections ``x @ W_ih^T + b_ih + b_hh`` stay outside (they are
one large MXU GEMM — exactly what XLA is best at); the kernel consumes them
time-major.  PyTorch gate semantics ([r; z; n] rows, double-bias folded into
the projections) match :class:`models.cnn_gru.TorchGRU` — parity tested.

Forward-only (no custom VJP): selectable via ``gru_impl="pallas"``; training
keeps the differentiable `lax.scan` implementation.

The first revision tiled the BATCH and gave each grid program the whole
sequence (TILE_B=32 — the (2, T, 32, 3H) gx block was the VMEM limit).
Grid programs execute sequentially per core, so that ran 25·(B/32) tiny
M=32 dots back-to-back: measured **no net speedup** (2.18 vs 2.17 ms full
model at b256).  This revision tiles TIME instead: grid = (batch tiles, T),
each grid step consumes one timestep's (2, TILE_B, 3H) gx slice — the
Pallas pipeline double-buffers the next step's DMA behind the current
step's compute — and the hidden state persists in VMEM scratch across the
time sweep (re-zeroed at t == 0).  The batch tile grows to 512, so the
serial chain is 25·(B/512) well-shaped (512, H) x (H, 3H) dots instead of
XLA's 25 separate HLO steps with their scheduling gaps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 512  # batch rows per grid program (gx slices are double-buffered)


def _gru_layer_kernel(gx_ref, w_ref, bn_ref, out_ref, h_scratch):
    """One timestep, both directions, for one batch tile.

    gx_ref: (2, 1, TILE_B, 3H) — this step's input projections with b_ih
      and the r/z parts of b_hh folded in (the n-gate's b_hn must stay
      INSIDE the ``r * (...)`` term — PyTorch double-bias semantics),
      index 0 forward time order, index 1 reversed.
    w_ref: (2, H, 3H) — recurrent weights (transposed), per direction.
    bn_ref: (2, 1, H) — the n-gate recurrent bias b_hn per direction.
    out_ref: (2, 1, TILE_B, H) — this step's hidden states; direction 1 is
      in reversed time order (flipped back outside).
    h_scratch: (2, TILE_B, H) f32, persistent across the time sweep.
    """
    hidden = w_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    h = h_scratch[...]
    gh0 = jnp.dot(h[0], w_ref[0], preferred_element_type=jnp.float32)
    gh1 = jnp.dot(h[1], w_ref[1], preferred_element_type=jnp.float32)
    gh = jnp.stack([gh0, gh1], axis=0)
    gx = gx_ref[:, 0].astype(jnp.float32)
    r = jax.nn.sigmoid(gx[..., :hidden] + gh[..., :hidden])
    z = jax.nn.sigmoid(gx[..., hidden : 2 * hidden]
                       + gh[..., hidden : 2 * hidden])
    n = jnp.tanh(gx[..., 2 * hidden :]
                 + r * (gh[..., 2 * hidden :] + bn_ref[...]))
    h_new = (1.0 - z) * n + z * h
    h_scratch[...] = h_new
    out_ref[:, 0] = h_new.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gru_layer_call(gx, w, bn, interpret):
    """gx: (2, T, B, 3H); w: (2, H, 3H); bn: (2, 1, H) -> (2, T, B, H)."""
    two, t_len, b, three_h = gx.shape
    hidden = three_h // 3
    tile_b = min(_TILE_B, -(-b // 8) * 8)  # sublane-aligned batch tile
    b_pad = -(-b // tile_b) * tile_b
    if b_pad != b:
        gx = jnp.pad(gx, ((0, 0), (0, 0), (0, b_pad - b), (0, 0)))
    grid = (b_pad // tile_b, t_len)
    out = pl.pallas_call(
        _gru_layer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, 1, tile_b, three_h),
                         lambda i, t: (0, t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, three_h), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, hidden), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, 1, tile_b, hidden),
                               lambda i, t: (0, t, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, t_len, b_pad, hidden),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((2, tile_b, hidden), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_len * b_pad * hidden * three_h,
            bytes_accessed=(gx.size + w.size + 2 * t_len * b_pad * hidden)
            * 4,
            transcendentals=2 * t_len * b_pad * hidden * 3,
        ),
        interpret=interpret,
    )(gx, w, bn)
    return out[:, :, :b]


def gru_bidirectional_pallas(gx_fwd, gx_bwd, w_hh_fwd, w_hh_bwd,
                             b_hh_fwd, b_hh_bwd, hidden: int):
    """Drop-in replacement for the scan recurrence (inference only).

    Args/returns match ``models.cnn_gru._gru_bidirectional_scan``:
    gx_*: (T, B, 3H) input projections (``x @ W_ih^T + b_ih``); returns
    (ys_fwd, ys_bwd) each (T, B, H) in forward time order.
    """
    # fold only the r/z parts of b_hh into gx; b_hn stays inside r*(...)
    rz_f = jnp.concatenate([b_hh_fwd[: 2 * hidden],
                            jnp.zeros(hidden, b_hh_fwd.dtype)])
    rz_b = jnp.concatenate([b_hh_bwd[: 2 * hidden],
                            jnp.zeros(hidden, b_hh_bwd.dtype)])
    gx = jnp.stack([gx_fwd + rz_f, gx_bwd[::-1] + rz_b], axis=0)
    w = jnp.stack([w_hh_fwd.T, w_hh_bwd.T], axis=0).astype(jnp.float32)
    bn = jnp.stack([b_hh_fwd[2 * hidden :], b_hh_bwd[2 * hidden :]],
                   axis=0)[:, None, :].astype(jnp.float32)
    interpret = jax.default_backend() != "tpu"
    ys = _gru_layer_call(gx.astype(jnp.float32), w, bn, interpret)
    return ys[0], ys[1][::-1]
