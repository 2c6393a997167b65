"""Bandlimited sinc resampling (host NumPy + device JAX).

Reimplements the exact algorithm of torchaudio's
``sinc_interp_hann`` resampler (the reference resamples every non-16 kHz
input with ``torchaudio.transforms.Resample``,
``scripts/precompute_features.py:54-56``): a polyphase kernel bank of
Hann-windowed sincs at the reduced ``orig/gcd : new/gcd`` ratio, applied as a
strided correlation.  The strided correlation is expressed as framing + one
GEMM, so the same code path is MXU-friendly when run under jit.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np


@lru_cache(maxsize=32)
def _sinc_kernel(orig_freq: int, new_freq: int,
                 lowpass_filter_width: int = 6,
                 rolloff: float = 0.99) -> tuple[np.ndarray, int, int, int]:
    """Polyphase kernel bank, shape (new_freq_r, kernel_len), plus
    (width, orig_freq_r, new_freq_r) after gcd reduction."""
    g = math.gcd(int(orig_freq), int(new_freq))
    orig = int(orig_freq) // g
    new = int(new_freq) // g
    if orig == new:
        return np.ones((1, 1)), 0, 1, 1
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64) / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx[None, :]
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2.0) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / orig)
    return kernel.astype(np.float64), width, orig, new


def resample_np(waveform: np.ndarray, orig_freq: int, new_freq: int,
                lowpass_filter_width: int = 6,
                rolloff: float = 0.99) -> np.ndarray:
    """Resample the last axis; matches torchaudio.functional.resample."""
    if orig_freq == new_freq:
        return np.asarray(waveform)
    x = np.asarray(waveform, dtype=np.float64)
    squeeze = x.ndim == 1
    x = np.atleast_2d(x)
    kernel, width, orig, new = _sinc_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    length = x.shape[-1]
    x_pad = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(width, width + orig)])
    klen = kernel.shape[1]
    n_blocks = (x_pad.shape[-1] - klen) // orig + 1
    idx = np.arange(klen)[None, :] + orig * np.arange(n_blocks)[:, None]
    frames = x_pad[..., idx]  # (..., n_blocks, klen)
    ys = frames @ kernel.T  # (..., n_blocks, new)
    ys = ys.reshape(*x.shape[:-1], -1)
    target_length = math.ceil(new * length / orig)
    ys = ys[..., :target_length]
    out = ys.astype(np.result_type(waveform.dtype, np.float32))
    return out[0] if squeeze else out


def resample_jax(waveform, orig_freq: int, new_freq: int,
                 lowpass_filter_width: int = 6, rolloff: float = 0.99):
    """Device-side resampling (same math, jnp). Static shapes only."""
    import jax
    import jax.numpy as jnp

    if orig_freq == new_freq:
        return waveform
    kernel, width, orig, new = _sinc_kernel(
        orig_freq, new_freq, lowpass_filter_width, rolloff)
    x = jnp.atleast_2d(waveform)
    squeeze = waveform.ndim == 1
    length = x.shape[-1]
    x_pad = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(width, width + orig)])
    klen = kernel.shape[1]
    n_blocks = (x_pad.shape[-1] - klen) // orig + 1
    idx = np.arange(klen)[None, :] + orig * np.arange(n_blocks)[:, None]
    frames = x_pad[..., idx]
    # HIGHEST precision: on TPU the default matmul precision is bf16-pass,
    # which is far too coarse for a resampling kernel.
    ys = jnp.dot(frames, jnp.asarray(kernel.T, dtype=x.dtype),
                 precision=jax.lax.Precision.HIGHEST)
    ys = ys.reshape(*x.shape[:-1], -1)
    target_length = math.ceil(new * length / orig)
    ys = ys[..., :target_length]
    return ys[0] if squeeze else ys
