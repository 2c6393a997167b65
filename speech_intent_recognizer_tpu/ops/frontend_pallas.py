"""Fused Pallas TPU kernel for the log-mel front-end.

One kernel per frame tile computes the complete chain

    windowed DFT (two MXU GEMMs against cos/sin matrices)
      -> power (c^2 + s^2, VPU)
      -> mel projection (MXU GEMM)
      -> dB (10*log10(max(., 1e-10)), VPU)

with every operand VMEM-resident: the (1024, 640) DFT matrices and the
(640, 64) filterbank total ~5.4 MB and are reused across all grid steps,
so HBM traffic is exactly one read of the frames and one write of the
64-wide mel rows — the bandwidth floor for this op.  Frequency dims are
zero-padded from 513 to 640 (lane-aligned multiples of 128); the pad lanes
multiply into zero filterbank rows, so results are unchanged.

Numerical contract matches the XLA path (`frontend_jax._mel_power` + dB) and
therefore the NumPy golden and the reference torchaudio features
(``scripts/precompute_features.py:28-73``).  On non-TPU backends the kernel
runs in interpreter mode (tests), so the same code path is exercised
everywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from speech_intent_recognizer_tpu.ops.frontend_jax import FrontendParams

_TILE = 256  # frames per grid step
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mel_db_kernel(frames_ref, wcos_ref, wsin_ref, fb_ref, out_ref):
    x = frames_ref[...]
    c = jnp.dot(x, wcos_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    s = jnp.dot(x, wsin_ref[...], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    power = c * c + s * s
    mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)
    out_ref[...] = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("n_fft", "n_mels", "interpret"))
def _mel_db_call(frames, wcos_p, wsin_p, fb_p, n_fft, n_mels, interpret):
    n = frames.shape[0]
    n_pad = _round_up(max(n, _TILE), _TILE)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, n_pad - n), (0, 0)))
    f_pad = wcos_p.shape[1]
    grid = (n_pad // _TILE,)
    out = pl.pallas_call(
        _mel_db_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_mels), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, n_mels), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, n_mels), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * n_fft * f_pad * 2 + 2 * n_pad * f_pad * n_mels,
            bytes_accessed=(n_pad * n_fft + 2 * n_fft * f_pad
                            + f_pad * n_mels + n_pad * n_mels) * 4,
            transcendentals=n_pad * n_mels,
        ),
        interpret=interpret,
    )(frames, wcos_p, wsin_p, fb_p)
    return out[:n]


def _padded_operands(p: FrontendParams):
    n_freqs = p.dft_cos.shape[1]
    f_pad = _round_up(n_freqs, _LANE)
    wcos = jnp.pad(p.dft_cos, ((0, 0), (0, f_pad - n_freqs)))
    wsin = jnp.pad(p.dft_sin, ((0, 0), (0, f_pad - n_freqs)))
    fb = jnp.pad(p.mel_fb, ((0, f_pad - n_freqs), (0, 0)))
    return wcos, wsin, fb


def mel_db_pallas(frames: jax.Array, p: FrontendParams) -> jax.Array:
    """(N, n_fft) raw frames -> (N, n_mels) dB-mel, fused in one kernel."""
    wcos, wsin, fb = _padded_operands(p)
    interpret = jax.default_backend() != "tpu"
    n_mels_pad = _round_up(p.n_mels, _LANE)
    if n_mels_pad != p.n_mels:
        fb = jnp.pad(fb, ((0, 0), (0, n_mels_pad - p.n_mels)))
    out = _mel_db_call(frames, wcos, wsin, fb, p.n_fft, n_mels_pad, interpret)
    # padded mel lanes hold log10(1e-10) garbage; slice them away
    return out[:, : p.n_mels]


# ---------------------------------------------------------------------------
# v4: fully fused per-utterance kernel reading RAW waveform rows.
#
# With hop = n_fft/2, frame t = [chunk_t | chunk_{t+1}] of non-overlapping
# hop-sized chunks, so frame_t @ W == chunk_t @ W_hi + chunk_{t+1} @ W_lo.
# Because the center pad equals the hop, the chunk view of the prepared
# (reflect-padded) signal is exactly ``[reflect_row ; waveform_rows]`` — so
# the kernel consumes the raw zero-padded waveform directly, viewed as
# (T, hop) rows, with NO prepared array ever materialized in HBM.  One grid
# step processes ONE utterance end-to-end:
#
#   * the (T, hop) waveform rows stream HBM->VMEM through the pallas
#     pipeline (automatically double-buffered across grid steps);
#   * the left-reflect chunk row is assembled in VMEM (a lane flip), and the
#     dynamic right-reflect tail — precomputed as a tiny (2, hop) correction
#     by `frontend_jax._tail_reflect_vals` — is added at its dynamic chunk
#     row via an iota mask;
#   * the windowed DFT runs as hand-rolled bf16x3 GEMMs (the exact
#     decomposition XLA uses for Precision.HIGH — Mosaic only exposes
#     DEFAULT/HIGHEST, and HIGHEST's 6-pass fp32 emulation is what made the
#     retired v2 kernel lose to the XLA path);
#   * dB conversion, masked per-utterance normalization, the mel-major
#     transpose and pad-to-target all happen in VMEM.
#
# HBM traffic is ONE read of the signal plus one write of the final
# (n_mels, t_out) block — the bandwidth floor for this op.  The XLA path by
# contrast materializes the prepared signal and the DFT/power intermediates.
#
# Numerical contract: same bf16x3 DFT as the XLA fast path
# (`frontend_jax._mel_power_chunked` at Precision.HIGH), exact fp32 mel
# projection and normalization; matches the NumPy golden / reference
# torchaudio features (scripts/precompute_features.py:28-73) to ~1e-3 dB.
# ---------------------------------------------------------------------------


def _split_bf16(x: jax.Array):
    """f32 -> (hi, lo) bf16 pair with hi + lo == x (to bf16x2 accuracy)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _fused_kernel(tvalid_ref, c0_ref, rows_ref, left_ref, vals_ref,
                  whi_h_ref, whi_l_ref, wlo_h_ref, wlo_l_ref, fb_ref,
                  out_ref, *, t, t_out, hop, n_mels, normalize, eps,
                  out_dtype):
    xr = rows_ref[0]  # (T, hop) f32 raw waveform rows (zero-padded)
    # Left-reflect chunk row, precomputed in XLA (Mosaic has no lane
    # reversal): prepared[j] = x[hop - j] for j in [0, hop).
    chunks = jnp.concatenate([left_ref[0], xr], axis=0)  # (C, hop), C = t+1
    # Dynamic right-reflect tail: add the (2, hop) correction at chunk rows
    # c0 / c0+1 (row c0+1 may fall off the end — the mask drops it).
    b_idx = pl.program_id(0)
    c0 = c0_ref[b_idx]
    v = vals_ref[0]  # (2, hop)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (t + 1, hop), 0)
    chunks = (chunks
              + jnp.where(rowi == c0,
                          jnp.broadcast_to(v[0:1], (t + 1, hop)), 0.0)
              + jnp.where(rowi == c0 + 1,
                          jnp.broadcast_to(v[1:2], (t + 1, hop)), 0.0))
    xh, xl = _split_bf16(chunks)

    def high_dot(wh_ref, wl_ref):
        # bf16x3: x @ W ~= xh@Wh + xh@Wl + xl@Wh (== XLA Precision.HIGH)
        wh = wh_ref[...]
        acc = jnp.dot(xh, wh, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(xh, wl_ref[...],
                            preferred_element_type=jnp.float32)
        return acc + jnp.dot(xl, wh, preferred_element_type=jnp.float32)

    a = high_dot(whi_h_ref, whi_l_ref)  # (C, 2F): [cos | sin] lanes
    bb = high_dot(wlo_h_ref, wlo_l_ref)
    cs = a[:t] + bb[1 : t + 1]  # shifted add joins the two half-frames
    f_pad = fb_ref.shape[0]
    c = cs[:, :f_pad]
    s = cs[:, f_pad:]
    power = c * c + s * s  # (t, F)
    # Small GEMM; exact fp32 keeps the mel projection bit-clean.
    mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.HIGHEST)  # (t, n_mels_pad)
    db = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))

    n_mels_pad = db.shape[1]
    tv = tvalid_ref[b_idx]
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, n_mels_pad), 0)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (t, n_mels_pad), 1)
    mask = jnp.logical_and(rows < tv, lanes < n_mels).astype(jnp.float32)
    if normalize:
        # Per-utterance mean / unbiased std over valid frames x real mels
        # (reference contract: precompute_features.py:73, ddof=1).
        cnt = tv.astype(jnp.float32) * n_mels
        mean = jnp.sum(db * mask) / cnt
        var = jnp.sum(jnp.square(db - mean) * mask) / jnp.maximum(
            cnt - 1.0, 1.0)
        db = (db - mean) / (jnp.sqrt(var) + eps)
    db = db * mask  # zero padded frames and pad lanes
    dbt = db.T[:n_mels]  # (n_mels, t) mel-major, as the model consumes it
    if t_out > t:
        dbt = jnp.concatenate(
            [dbt, jnp.zeros((n_mels, t_out - t), jnp.float32)], axis=1)
    else:
        dbt = dbt[:, :t_out]
    out_ref[0] = dbt.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "t_out", "hop", "n_mels", "normalize", "eps", "out_dtype", "interpret"))
def _fused_call(rows, t_valid, c0, left, vals, whi_h, whi_l, wlo_h, wlo_l,
                fb, t_out, hop, n_mels, normalize, eps, out_dtype, interpret):
    b, t, _ = rows.shape  # T waveform rows -> T frames (C = T + 1 chunks)
    f2 = whi_h.shape[1]  # 2 * padded freq bins
    n_mels_pad = fb.shape[1]
    kernel = functools.partial(
        _fused_kernel, t=t, t_out=t_out, hop=hop, n_mels=n_mels,
        normalize=normalize, eps=eps, out_dtype=out_dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f2), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f2), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f2), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f2), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f2 // 2, n_mels_pad),
                         lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n_mels, t_out), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, n_mels, t_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            # 6 bf16 passes over 2 (C, hop) x (hop, 2F) GEMMs + the mel GEMM
            flops=b * (6 * 2 * (t + 1) * hop * f2
                       + 2 * t * (f2 // 2) * n_mels_pad),
            bytes_accessed=(b * t * hop * 4 + 4 * hop * f2 * 2
                            + (f2 // 2) * n_mels_pad * 4
                            + b * n_mels * t_out * 4),
            transcendentals=b * t * n_mels_pad,
        ),
        interpret=interpret,
    )(t_valid, c0, rows, left, vals, whi_h, whi_l, wlo_h, wlo_l, fb)


def _fused_operands(p: FrontendParams):
    """Precompute the kernel's constant operands: hi/lo chunk halves of the
    windowed [cos | sin] DFT matrix, each split into a bf16 (hi, lo) pair,
    plus the lane-padded fp32 mel filterbank."""
    wcos, wsin, fb = _padded_operands(p)
    n_mels_pad = _round_up(p.n_mels, _LANE)
    if n_mels_pad != p.n_mels:
        fb = jnp.pad(fb, ((0, 0), (0, n_mels_pad - p.n_mels)))
    hop = p.hop_length
    w = jnp.concatenate([wcos, wsin], axis=1)  # (n_fft, 2F)
    whi_h, whi_l = _split_bf16(w[:hop])
    wlo_h, wlo_l = _split_bf16(w[hop:])
    return whi_h, whi_l, wlo_h, wlo_l, fb


def fused_frontend_pallas(wf_rows: jax.Array, lengths: jax.Array,
                          left_row: jax.Array, tail_vals: jax.Array,
                          tail_row: jax.Array,
                          p: FrontendParams, normalize: bool = True,
                          t_out: int | None = None,
                          out_dtype=jnp.float32) -> jax.Array:
    """Fully fused front-end: raw waveform rows -> normalized log-mel.

    Args:
      wf_rows: (B, T, hop) f32 — the zero-padded waveform buffer viewed as
        hop-sized rows (``frontend_jax.waveform_rows``); T = frame count.
      lengths: (B,) int32 true sample counts.
      left_row: (B, 1, hop) left-reflect chunk row (flip of samples 1..hop;
        computed in XLA — Mosaic has no lane reversal).
      tail_vals: (B, 2, hop) right-reflect correction
        (``frontend_jax._tail_reflect_vals``).
      tail_row: (B,) int32 first chunk row of the correction.
      normalize: fuse the masked per-utterance mean/std normalization.
      t_out: output time axis (pad/trim); defaults to ``p.target_length``.
      out_dtype: output dtype (f32, or bf16 for direct model handoff).
    """
    if p.n_fft != 2 * p.hop_length:
        raise ValueError("fused kernel requires hop == n_fft / 2")
    t_out = p.target_length if t_out is None else t_out
    whi_h, whi_l, wlo_h, wlo_l, fb = _fused_operands(p)
    interpret = jax.default_backend() != "tpu"
    t_valid = (1 + lengths // p.hop_length).astype(jnp.int32)
    return _fused_call(wf_rows, t_valid, tail_row.astype(jnp.int32),
                       left_row, tail_vals, whi_h, whi_l, wlo_h, wlo_l, fb,
                       t_out, p.hop_length, p.n_mels, normalize,
                       p.norm_eps, jnp.dtype(out_dtype), interpret)
