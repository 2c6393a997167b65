"""On-device waveform augmentation.

The reference's waveform augmentations (``scripts/augment.py``) run per
sample on the host through libsox effects (pitch/tempo) — a CPU bottleneck
the reference itself stopped using (nothing imports augment.py in its tree;
SURVEY.md §2).  Here they are batch-vectorized jnp ops that run on device
inside the input pipeline:

* time_shift — ±10 % circular shift with zero fill (exact equivalent of
  ``augment.py:6-28``);
* add_noise — additive Gaussian, level U(1e-3, 1e-2) (``augment.py:82-96``);
* speed_change — U(0.85, 1.15) time-scaling via linear-interpolation
  resampling (TPU-native equivalent of sox ``tempo``; changes pitch too —
  documented approximation);
* pitch_shift — ±2 semitones via interpolation resampling with
  length-preserving pad/trim (equivalent of sox ``pitch`` up to formant
  handling).

Composite gating matches ``apply_augmentation`` (``augment.py:98-135``): each
sub-augmentation fires with p=0.5 under an outer p=augment_prob gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _linear_resample(x: jax.Array, rate: jax.Array) -> jax.Array:
    """Sample x at positions i*rate with linear interpolation (same length,
    zeros beyond the stretched end)."""
    n = x.shape[0]
    pos = jnp.arange(n, dtype=jnp.float32) * rate
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    i0c = jnp.clip(i0, 0, n - 1)
    i1c = jnp.clip(i0 + 1, 0, n - 1)
    out = x[i0c] * (1.0 - frac) + x[i1c] * frac
    return jnp.where(pos <= n - 1, out, 0.0)


def time_shift(x: jax.Array, length: jax.Array, shift: jax.Array) -> jax.Array:
    """Shift by ``shift`` samples (positive = right), zero-filled."""
    n = x.shape[0]
    idx = jnp.arange(n) - shift
    valid = jnp.logical_and(idx >= 0, idx < length)
    return jnp.where(valid, x[jnp.clip(idx, 0, n - 1)], 0.0)


def augment_waveforms(
    waves: jax.Array,
    lengths: jax.Array,
    key: jax.Array,
    augment_prob: float = 0.7,
    shift_limit: float = 0.1,
    noise_range: tuple = (1e-3, 1e-2),
    speed_range: tuple = (0.85, 1.15),
    pitch_semitones: float = 2.0,
    gate_prob: float = 0.5,
) -> tuple[jax.Array, jax.Array]:
    """Batched waveform augmentation: (B, L), (B,) -> augmented (B, L), (B,).

    Returns updated lengths (speed change alters the effective duration).
    """
    b, n = waves.shape

    def one(x, length, k):
        ks = jax.random.split(k, 9)
        outer = jax.random.uniform(ks[0]) < augment_prob

        def gate(i):
            return jnp.logical_and(outer, jax.random.uniform(ks[i]) < gate_prob)

        # time shift
        shift_frac = jax.random.uniform(ks[5], minval=-shift_limit,
                                        maxval=shift_limit)
        shift = (shift_frac * length.astype(jnp.float32)).astype(jnp.int32)
        x = jnp.where(gate(1), time_shift(x, length, shift), x)

        # pitch shift: resample by 2^(s/12), keep duration
        semis = jax.random.uniform(ks[6], minval=-pitch_semitones,
                                   maxval=pitch_semitones)
        pitch_rate = jnp.exp2(semis / 12.0)
        x = jnp.where(gate(2), _linear_resample(x, pitch_rate), x)

        # speed change: resample by r, duration scales by 1/r
        r = jax.random.uniform(ks[7], minval=speed_range[0],
                               maxval=speed_range[1])
        sped = _linear_resample(x, r)
        new_len = jnp.minimum(
            (length.astype(jnp.float32) / r).astype(jnp.int32), n)
        do_speed = gate(3)
        x = jnp.where(do_speed, sped, x)
        length = jnp.where(do_speed, new_len, length)

        # additive gaussian noise (only on the valid region)
        level = jax.random.uniform(ks[8], minval=noise_range[0],
                                   maxval=noise_range[1])
        noise = jax.random.normal(ks[4], x.shape) * level
        mask = (jnp.arange(n) < length).astype(x.dtype)
        x = jnp.where(gate(0), x + noise * mask, x)
        return x, length

    keys = jax.random.split(key, b)
    return jax.vmap(one)(waves, lengths, keys)


def mixup(
    mels: jax.Array,
    labels_onehot: jax.Array,
    key: jax.Array,
    alpha: float = 0.2,
) -> tuple[jax.Array, jax.Array]:
    """Batch mixup (the reference configures ``mixup_alpha: 0.2`` in
    configs/config.yaml:40 but never wires it in — implemented here as a
    first-class option).  Mixes each sample with a random partner using a
    Beta(alpha, alpha) weight."""
    b = mels.shape[0]
    k1, k2 = jax.random.split(key)
    lam = jax.random.beta(k1, alpha, alpha, (b,))
    lam = jnp.maximum(lam, 1.0 - lam)  # keep the dominant sample first
    perm = jax.random.permutation(k2, b)
    lam_m = lam[:, None, None].astype(mels.dtype)
    mixed = lam_m * mels + (1.0 - lam_m) * mels[perm]
    lam_l = lam[:, None].astype(labels_onehot.dtype)
    mixed_labels = lam_l * labels_onehot + (1.0 - lam_l) * labels_onehot[perm]
    return mixed, mixed_labels
