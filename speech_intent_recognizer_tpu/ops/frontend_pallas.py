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
