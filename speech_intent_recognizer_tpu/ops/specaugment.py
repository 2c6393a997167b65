"""On-device SpecAugment (time / frequency masking).

Replaces the reference's host-side per-sample torchaudio transforms
(``scripts/dataset.py:69-71,160-176`` — TimeMasking(20) / FrequencyMasking(10)
each gated at p=0.5 under an outer ``augment_prob`` gate) with a fully
vectorized, jittable batch op that runs inside the training step — zero host
work, fused by XLA into the surrounding pipeline (cf. SpecAugment,
PAPERS.md).

Masking semantics match torchaudio's ``_apply_mask_along_axis``: the mask
width is drawn uniformly from [0, param), the start uniformly from
[0, size - width), and masked bins are set to ``mask_value`` (0.0 — the
post-normalization mean, since the reference masks normalized features).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _axis_mask(key: jax.Array, size: int, mask_param: int, dtype) -> jax.Array:
    """A single random [0/1) mask of length ``size`` (1 = keep, 0 = masked)."""
    k1, k2 = jax.random.split(key)
    width = jax.random.uniform(k1, (), minval=0.0, maxval=float(mask_param))
    start = jax.random.uniform(k2, (), minval=0.0,
                               maxval=jnp.maximum(float(size) - width, 0.0))
    idx = jnp.arange(size, dtype=jnp.float32)
    keep = jnp.logical_or(idx < start, idx >= start + width)
    return keep.astype(dtype)


def spec_augment(
    mels: jax.Array,
    key: jax.Array,
    augment_prob: float = 0.7,
    time_mask_param: int = 20,
    freq_mask_param: int = 10,
    gate_prob: float = 0.5,
) -> jax.Array:
    """Batched SpecAugment: (B, n_mels, T) -> (B, n_mels, T).

    Per sample: with probability ``augment_prob``, independently apply a time
    mask and a frequency mask each with probability ``gate_prob`` — the exact
    gating structure of the reference (``dataset.py:105-106,160-176``).
    """
    b, n_mels, t = mels.shape

    def one(m, k):
        k_outer, k_tg, k_fg, k_tm, k_fm = jax.random.split(k, 5)
        outer = jax.random.uniform(k_outer) < augment_prob
        tgate = jnp.logical_and(outer, jax.random.uniform(k_tg) < gate_prob)
        fgate = jnp.logical_and(outer, jax.random.uniform(k_fg) < gate_prob)
        tmask = jnp.where(tgate, _axis_mask(k_tm, t, time_mask_param, m.dtype),
                          jnp.ones((t,), m.dtype))
        fmask = jnp.where(fgate, _axis_mask(k_fm, n_mels, freq_mask_param,
                                            m.dtype),
                          jnp.ones((n_mels,), m.dtype))
        return m * tmask[None, :] * fmask[:, None]

    keys = jax.random.split(key, b)
    return jax.vmap(one)(mels, keys)
