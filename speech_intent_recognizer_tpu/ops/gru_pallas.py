"""Pallas TPU kernel for the bidirectional GRU recurrence.

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

Trainable: a custom VJP (defined below, commit fafb49e) recomputes the
forward to stash per-step hidden states, then runs the reverse recurrence
as a second Pallas kernel — ``gru_impl="pallas"`` works under ``jax.grad``
and is gradient-parity tested against the `lax.scan` implementation
(`tests/test_gru_pallas.py`).  `scan` remains the default.

Revision history (each measured on v5e, full model at b256/b1024):

* rev 1 tiled the BATCH, whole sequence per program (TILE_B=32, VMEM
  limit) — 25·(B/32) tiny M=32 dots back-to-back, **no net speedup**
  (2.18 vs 2.17 ms at b256).
* rev 2 tiled TIME: grid = (batch tiles, T), one timestep per grid step,
  TILE_B=512, fp32 operands — the pipeline double-buffers the next step's
  gx DMA behind compute, hidden state persists in VMEM scratch.  Parity
  but still neutral (the per-step grid + DMA bookkeeping ate the win).
* rev 3 (this one) blocks TIME (_TILE_T timesteps per grid step,
  unrolled straight-line per-direction code) and keeps the caller's bf16
  for the gx/out DMAs and the MXU operands (gate math fp32): variant
  forward 6.22 vs 6.36 ms scan, fused e2e 11.64 vs 11.96 ms at b1024 —
  the first net win; production default for the batch inference path.
  TILE_B=1024/512 and _TILE_T=25 (whole sequence, raised VMEM limit)
  all measured slightly worse — see BENCH_NOTES.md round 3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_B = 256  # batch rows per grid program (gx slices are double-buffered;
               # measured best on v5e at b1024: 512/1024 tiles and a
               # 25-step time block were all slightly worse — see
               # BENCH_NOTES.md round 3)
_TILE_T = 5    # timesteps per grid program (amortizes per-step grid cost)


def _gru_layer_kernel(gx_ref, w_ref, bn_ref, out_ref, h_scratch, *,
                      tile_t: int):
    """``tile_t`` timesteps, both directions, for one batch tile.

    gx_ref: (2, tile_t, TILE_B, 3H) — input projections with b_ih and the
      r/z parts of b_hh folded in (the n-gate's b_hn must stay INSIDE the
      ``r * (...)`` term — PyTorch double-bias semantics), index 0 forward
      time order, index 1 reversed.
    w_ref: (2, H, 3H) — recurrent weights (transposed), per direction.
    bn_ref: (2, 1, H) — the n-gate recurrent bias b_hn per direction.
    out_ref: (2, tile_t, TILE_B, H) — hidden states; direction 1 is in
      reversed time order (flipped back outside).
    h_scratch: (2, TILE_B, H) f32, persistent across the time sweep.

    The directions are processed as straight-line per-direction code (no
    (2, ...) leading-dim elementwise ops — those relayout on Mosaic).
    """
    hidden = w_ref.shape[1]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_scratch[...] = jnp.zeros_like(h_scratch)

    def gates(gx, gh, h, bn):
        r = jax.nn.sigmoid(gx[:, :hidden] + gh[:, :hidden])
        z = jax.nn.sigmoid(gx[:, hidden:2 * hidden]
                           + gh[:, hidden:2 * hidden])
        n = jnp.tanh(gx[:, 2 * hidden:] + r * (gh[:, 2 * hidden:] + bn))
        return (1.0 - z) * n + z * h

    op_t = w_ref.dtype
    h0 = h_scratch[0]
    h1 = h_scratch[1]
    for t in range(tile_t):
        gh0 = jnp.dot(h0.astype(op_t), w_ref[0],
                      preferred_element_type=jnp.float32)
        gh1 = jnp.dot(h1.astype(op_t), w_ref[1],
                      preferred_element_type=jnp.float32)
        h0 = gates(gx_ref[0, t].astype(jnp.float32), gh0, h0, bn_ref[0])
        h1 = gates(gx_ref[1, t].astype(jnp.float32), gh1, h1, bn_ref[1])
        out_ref[0, t] = h0.astype(out_ref.dtype)
        out_ref[1, t] = h1.astype(out_ref.dtype)
    h_scratch[0] = h0
    h_scratch[1] = h1


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gru_layer_call(gx, w, bn, interpret):
    """gx: (2, T, B, 3H); w: (2, H, 3H); bn: (2, 1, H) -> (2, T, B, H).

    Keeps the caller's dtype for the MXU operands and the output (bf16 in
    the production model — halves the per-step DMA); gate math is f32.
    """
    two, t_len, b, three_h = gx.shape
    hidden = three_h // 3
    tile_b = min(_TILE_B, -(-b // 8) * 8)  # sublane-aligned batch tile
    b_pad = -(-b // tile_b) * tile_b
    tile_t = min(_TILE_T, t_len)
    t_pad = -(-t_len // tile_t) * tile_t
    if b_pad != b or t_pad != t_len:
        gx = jnp.pad(gx, ((0, 0), (0, t_pad - t_len), (0, b_pad - b),
                          (0, 0)))
    grid = (b_pad // tile_b, t_pad // tile_t)
    kernel = functools.partial(_gru_layer_kernel, tile_t=tile_t)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, tile_t, tile_b, three_h),
                         lambda i, t: (0, t, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, hidden, three_h), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 1, hidden), lambda i, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((2, tile_t, tile_b, hidden),
                               lambda i, t: (0, t, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, t_pad, b_pad, hidden), gx.dtype),
        scratch_shapes=[pltpu.VMEM((2, tile_b, hidden), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * t_len * b_pad * hidden * three_h,
            bytes_accessed=(gx.size + w.size + 2 * t_len * b_pad * hidden)
            * gx.dtype.itemsize,
            transcendentals=2 * t_len * b_pad * hidden * 3,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(gx, w, bn)
    return out[:, :t_len, :b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _gru_layer_diff(gx, w, bn, interpret):
    """Differentiable wrapper: Pallas forward, exact reverse-time VJP.

    The backward pass recomputes the per-step gates from (gx, w, ys) —
    residuals are just the forward's own inputs and outputs, no extra
    kernel traffic — and runs the adjoint recurrence as a `lax.scan` in
    reversed time (one recompute dot + one adjoint dot + one weight-grad
    dot per step, the same arithmetic the scan implementation's autodiff
    produces).  This is what lets ``gru_impl="pallas"`` train; gradient
    parity vs the scan path is pinned in ``tests/test_gru_pallas.py``.
    """
    return _gru_layer_call(gx, w, bn, interpret)


def _gru_layer_diff_fwd(gx, w, bn, interpret):
    ys = _gru_layer_call(gx, w, bn, interpret)
    return ys, (gx, w, bn, ys)


def _gru_layer_diff_bwd(interpret, res, dys):
    gx, w, bn, ys = res
    two, t_len, b, three_h = gx.shape
    hidden = three_h // 3
    f32 = jnp.float32

    # h_{t-1} sequence: zeros at t=0, then ys shifted by one step
    h_prev_seq = jnp.concatenate(
        [jnp.zeros((two, 1, b, hidden), ys.dtype), ys[:, :-1]], axis=1)

    wf = w.astype(f32)
    bnf = bn.astype(f32)  # (2, 1, H)

    def step(carry, xs):
        dh, dw_acc, dbn_acc = carry
        gx_t, h_prev, dys_t = xs  # (2, B, 3H), (2, B, H), (2, B, H)
        gx_t = gx_t.astype(f32)
        h_prev = h_prev.astype(f32)
        gh = jax.lax.dot_general(
            h_prev, wf, dimension_numbers=(((2,), (1,)), ((0,), (0,))))
        r = jax.nn.sigmoid(gx_t[..., :hidden] + gh[..., :hidden])
        z = jax.nn.sigmoid(gx_t[..., hidden:2 * hidden]
                           + gh[..., hidden:2 * hidden])
        ghn_b = gh[..., 2 * hidden:] + bnf
        n = jnp.tanh(gx_t[..., 2 * hidden:] + r * ghn_b)

        dh_tot = dh + dys_t.astype(f32)
        dn = dh_tot * (1.0 - z)
        dz = dh_tot * (h_prev - n)
        dh_prev = dh_tot * z
        da_n = dn * (1.0 - n * n)
        dr = da_n * ghn_b
        dghn = da_n * r
        da_r = dr * r * (1.0 - r)
        da_z = dz * z * (1.0 - z)
        dgx_t = jnp.concatenate([da_r, da_z, da_n], axis=-1)
        dgh = jnp.concatenate([da_r, da_z, dghn], axis=-1)
        # dh_prev += dgh @ w^T    (contract the 3H axis)
        dh_prev = dh_prev + jax.lax.dot_general(
            dgh, wf, dimension_numbers=(((2,), (2,)), ((0,), (0,))))
        # dw += h_prev^T @ dgh    (batch-contracted outer product)
        dw_acc = dw_acc + jax.lax.dot_general(
            h_prev, dgh, dimension_numbers=(((1,), (1,)), ((0,), (0,))))
        dbn_acc = dbn_acc + jnp.sum(dghn, axis=1, keepdims=True)
        return (dh_prev, dw_acc, dbn_acc), dgx_t

    init = (jnp.zeros((two, b, hidden), f32),
            jnp.zeros((two, hidden, three_h), f32),
            jnp.zeros((two, 1, hidden), f32))
    xs = (jnp.swapaxes(gx, 0, 1), jnp.swapaxes(h_prev_seq, 0, 1),
          jnp.swapaxes(dys, 0, 1))
    (_, dw, dbn), dgx_t = jax.lax.scan(step, init, xs, reverse=True,
                                       unroll=min(t_len, 32))
    dgx = jnp.swapaxes(dgx_t, 0, 1).astype(gx.dtype)
    return dgx, dw.astype(w.dtype), dbn.astype(bn.dtype)


_gru_layer_diff.defvjp(_gru_layer_diff_fwd, _gru_layer_diff_bwd)


def gru_bidirectional_pallas(gx_fwd, gx_bwd, w_hh_fwd, w_hh_bwd,
                             b_hh_fwd, b_hh_bwd, hidden: int):
    """Drop-in replacement for the scan recurrence.

    Args/returns match ``models.cnn_gru._gru_bidirectional_scan``:
    gx_*: (T, B, 3H) input projections (``x @ W_ih^T + b_ih``); returns
    (ys_fwd, ys_bwd) each (T, B, H) in forward time order.  Differentiable
    (custom VJP: Pallas forward, exact adjoint recurrence backward).
    """
    # fold only the r/z parts of b_hh into gx; b_hn stays inside r*(...)
    rz_f = jnp.concatenate([b_hh_fwd[: 2 * hidden],
                            jnp.zeros(hidden, b_hh_fwd.dtype)])
    rz_b = jnp.concatenate([b_hh_bwd[: 2 * hidden],
                            jnp.zeros(hidden, b_hh_bwd.dtype)])
    gx = jnp.stack([gx_fwd + rz_f, gx_bwd[::-1] + rz_b], axis=0)
    w = jnp.stack([w_hh_fwd.T, w_hh_bwd.T], axis=0)
    bn = jnp.stack([b_hh_fwd[2 * hidden :], b_hh_bwd[2 * hidden :]],
                   axis=0)[:, None, :].astype(jnp.float32)
    interpret = jax.default_backend() != "tpu"
    ys = _gru_layer_diff(gx, w, bn, interpret)
    return ys[0].astype(gx_fwd.dtype), ys[1][::-1].astype(gx_fwd.dtype)
