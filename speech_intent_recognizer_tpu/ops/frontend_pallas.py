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
# v2: chunked kernel — DMA-fed, no overlapped frame tensor.
#
# With hop = n_fft/2, frame t = [chunk_t | chunk_{t+1}] of non-overlapping
# hop-sized chunks, so frame_t @ W == chunk_t @ W_hi + chunk_{t+1} @ W_lo.
# Each grid step manually DMAs a (TILE_T + 1)-chunk window of one utterance
# from HBM into VMEM (the +1 gives the cross-boundary chunk), computes the
# half-DFTs, shifted-adds, squares, projects to mel and writes dB rows.
# HBM traffic is ~1x the signal (vs 2x for the frame-tensor kernel) plus the
# tiny mel output.
# ---------------------------------------------------------------------------

_TILE_T = 64  # frames per grid step


def _mel_db_chunked_kernel(chunks_hbm, wcos_hi, wcos_lo, wsin_hi, wsin_lo,
                           fb_ref, out_ref, chunk_vmem, sem):
    b = pl.program_id(0)
    tile = pl.program_id(1)
    # window is _TILE_T + 8 chunks: +1 for the cross-boundary chunk, padded
    # to the fp32 sublane tile (8) that Mosaic requires for DMA slices
    dma = pltpu.make_async_copy(
        chunks_hbm.at[b, pl.ds(tile * _TILE_T, _TILE_T + 8), :],
        chunk_vmem, sem)
    dma.start()
    dma.wait()
    x = chunk_vmem[...]
    # Mosaic supports DEFAULT/HIGHEST only; HIGHEST keeps exact fp32 parity
    prec = jax.lax.Precision.HIGHEST

    def half_dft(hi_ref, lo_ref):
        a = jnp.dot(x, hi_ref[...], preferred_element_type=jnp.float32,
                    precision=prec)
        bb = jnp.dot(x, lo_ref[...], preferred_element_type=jnp.float32,
                     precision=prec)
        return a[:_TILE_T] + bb[1 : _TILE_T + 1]

    c = half_dft(wcos_hi, wcos_lo)
    s = half_dft(wsin_hi, wsin_lo)
    power = c * c + s * s
    mel = jnp.dot(power, fb_ref[...], preferred_element_type=jnp.float32,
                  precision=prec)
    out_ref[0] = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))


@functools.partial(jax.jit, static_argnames=("t", "hop", "n_mels",
                                             "interpret"))
def _mel_db_chunked_call(prepared, wcos, wsin, fb, t, hop, n_mels, interpret):
    b = prepared.shape[0]
    t_pad = _round_up(t, _TILE_T)
    n_chunks = t_pad + 8  # +1 boundary chunk, padded to the sublane tile
    need = n_chunks * hop
    if prepared.shape[1] < need:
        prepared = jnp.pad(prepared, ((0, 0), (0, need - prepared.shape[1])))
    chunks = prepared[:, :need].reshape(b, n_chunks, hop)
    f_pad = wcos.shape[1]
    grid = (b, t_pad // _TILE_T)
    out = pl.pallas_call(
        _mel_db_chunked_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # chunks stay in HBM
            # hi/lo halves of the windowed DFT matrices: same operand passed
            # twice, block index selecting the top (0) or bottom (1) half
            pl.BlockSpec((hop, f_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f_pad), lambda i, j: (1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f_pad), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hop, f_pad), lambda i, j: (1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, n_mels), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TILE_T, n_mels),
                               lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((_TILE_T + 8, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=b * t_pad * (4 * hop * f_pad + 2 * f_pad * n_mels),
            bytes_accessed=(b * need + 4 * hop * f_pad
                            + f_pad * n_mels + b * t_pad * n_mels) * 4,
            transcendentals=b * t_pad * n_mels,
        ),
        interpret=interpret,
    )(chunks, wcos, wcos, wsin, wsin, fb)
    return out[:, :t]


def mel_db_pallas_chunked(prepared: jax.Array, t: int,
                          p: FrontendParams) -> jax.Array:
    """(B, L) center-padded signals -> (B, T, n_mels) dB-mel (chunked v2
    kernel; requires hop == n_fft/2)."""
    if p.n_fft != 2 * p.hop_length:
        raise ValueError("chunked kernel requires hop == n_fft / 2")
    wcos, wsin, fb = _padded_operands(p)
    interpret = jax.default_backend() != "tpu"
    n_mels_pad = _round_up(p.n_mels, _LANE)
    if n_mels_pad != p.n_mels:
        fb = jnp.pad(fb, ((0, 0), (0, n_mels_pad - p.n_mels)))
    out = _mel_db_chunked_call(prepared, wcos, wsin, fb, t, p.hop_length,
                               n_mels_pad, interpret)
    return out[..., : p.n_mels]
