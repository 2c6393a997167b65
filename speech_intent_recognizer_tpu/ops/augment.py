"""On-device waveform augmentation.

The reference's waveform augmentations (``scripts/augment.py``) run per
sample on the host through libsox effects (pitch/tempo) — a CPU bottleneck
the reference itself stopped using (nothing imports augment.py in its tree;
SURVEY.md §2).  Here they are batch-vectorized jnp ops that run on device
inside the jitted train step (``data.use_waveform_augment``):

* time_shift — ±10 % shift with zero fill (exact equivalent of
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

TPU design note: a per-row dynamic gather over an 80 k-sample waveform
costs ~1 ms/row on this backend (vmap'd gathers lower to element loops —
measured 263 ms per b64 step, 100x the featurization it feeds).  The
batched ops here therefore never gather:

* resampling quantizes the rate to a k/64 grid and becomes a POLYPHASE
  matmul — static strided framing (reshape + two slices) against a
  constant (64, k+2) linear-interpolation matrix per rate, with the
  per-row rate selected by a one-hot mix over the (cheap) rate bank;
* time shift decomposes into a chunk-level one-hot matmul plus a shared
  intra-chunk one-hot matmul (exact for arbitrary integer shifts).

Everything lands on the MXU as small constant-operand matmuls
(``Precision.HIGHEST`` — bf16x3 selection against exact 0/1 weights is
bit-exact); the full augmentation chain costs ~10 ms at b64 vs 263 ms for
the gather formulation.  Scalar goldens (``time_shift``,
``_linear_resample``) are kept for parity tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# resample rates are quantized to k/_RATE_DEN; the polyphase frame stride
# is _RATE_DEN output samples per input window of k+2 samples
_RATE_DEN = 64
# speed U(0.85, 1.15) and pitch ±2 semitones (2^(±2/12) = [0.891, 1.122])
# both land inside this grid
_RATE_KS = tuple(range(55, 74))
_SHIFT_CHUNK = 128
_HI = jax.lax.Precision.HIGHEST


def _linear_resample(x: jax.Array, rate: jax.Array) -> jax.Array:
    """Sample x at positions i*rate with linear interpolation (same length,
    zeros beyond the stretched end).  Scalar golden — the batched path is
    :func:`_resample_bank` (gathers are ~1 ms/row on TPU)."""
    n = x.shape[0]
    pos = jnp.arange(n, dtype=jnp.float32) * rate
    i0 = jnp.floor(pos).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    i0c = jnp.clip(i0, 0, n - 1)
    i1c = jnp.clip(i0 + 1, 0, n - 1)
    out = x[i0c] * (1.0 - frac) + x[i1c] * frac
    return jnp.where(pos <= n - 1, out, 0.0)


def time_shift(x: jax.Array, length: jax.Array, shift: jax.Array) -> jax.Array:
    """Shift by ``shift`` samples (positive = right), zero-filled.  Scalar
    golden — the batched path is :func:`batched_time_shift`."""
    n = x.shape[0]
    idx = jnp.arange(n) - shift
    valid = jnp.logical_and(idx >= 0, idx < length)
    return jnp.where(valid, x[jnp.clip(idx, 0, n - 1)], 0.0)


def _interp_matrix(k: int, den: int = _RATE_DEN) -> np.ndarray:
    """Constant (den, k+2) linear-interpolation weights: row p holds the
    hat weights for sampling at fractional position p*k/den inside the
    window ``x[m*k : m*k + k + 2]`` of output frame m."""
    p = np.arange(den)
    i0, frac = np.divmod(p * k, den)
    w = np.zeros((den, k + 2), np.float32)
    w[p, i0] = 1.0 - frac / den
    w[p, i0 + 1] = frac / den
    return w


def _resample_fixed(x: jax.Array, k: int, den: int = _RATE_DEN) -> jax.Array:
    """Batched resample of (B, L) at the fixed rational rate k/den via
    polyphase matmul: out[:, den*m + p] = interp(x, m*k + p*k/den).

    Value-identical to :func:`_linear_resample` at rate=k/den for inputs
    that are zero beyond their valid length (the waveform-cache
    precondition).  Any L: the frame count rounds up and the tail is
    sliced off.
    """
    b, n = x.shape
    m = -(-n // den)  # output frames (ceil); m*den >= n, sliced back to n
    need = (m + 1) * k + 2
    xp = jnp.pad(x, ((0, 0), (0, max(0, need - n)))) if need > n else x
    frames = xp[:, : (m + 1) * k].reshape(b, m + 1, k)
    # window m = x[m*k : m*k + k + 2] = chunk m plus next chunk's first 2
    win = jnp.concatenate(
        [frames[:, :m, :], frames[:, 1:, :2]], axis=2)
    w = jnp.asarray(_interp_matrix(k, den))
    out = jnp.einsum("bmw,pw->bmp", win, w, precision=_HI)
    # zero beyond the stretched end (positions i*k/den > n-1), matching
    # the golden; beyond-input reads already hit the zero pad
    cutoff = ((n - 1) * den) // k + 1
    return jnp.where(jnp.arange(n) < cutoff,
                     out.reshape(b, m * den)[:, :n], 0.0)


def _resample_bank(x: jax.Array, k_idx: jax.Array,
                   ks: tuple = _RATE_KS) -> jax.Array:
    """Per-row rational resample: row i is resampled at rate
    ``ks[k_idx[i]]/den``.  Computes the (cheap) fixed-rate bank for every
    rate and mixes with a one-hot — no data-dependent control flow, no
    gathers."""
    outs = jnp.stack([_resample_fixed(x, k) for k in ks])  # (R, B, L)
    onehot = jax.nn.one_hot(k_idx, len(ks), dtype=x.dtype)  # (B, R)
    return jnp.einsum("rbl,br->bl", outs, onehot, precision=_HI)


def batched_time_shift(x: jax.Array, shifts: jax.Array) -> jax.Array:
    """Shift row i right by ``shifts[i]`` samples (negative = left),
    zero-filling at the boundaries — exact for arbitrary integer shifts.

    Two-level one-hot decomposition (shift = C*a + b, b in [0, C)): a
    chunk permutation matmul then a shared intra-chunk shift matmul, both
    exact 0/1 selections on the MXU.  Precondition (holds for the int16
    waveform cache): rows are zero beyond their valid length, so the
    valid-length mask of the scalar golden is implied.
    """
    b_, n = x.shape
    c = _SHIFT_CHUNK
    npad = -n % c
    xp = jnp.pad(x, ((0, 0), (0, npad))) if npad else x
    m = xp.shape[1] // c
    a = jnp.floor_divide(shifts, c)
    fine = shifts - a * c  # in [0, c)
    chunks = xp.reshape(b_, m, c)
    rows_in = jnp.arange(m)
    # coarse: Y[m_out] = chunks[m_out - a] (zero outside [0, m)), computed
    # for m_out in [-1, m) — the fine stage below reads Y[m_out-1], and for
    # left shifts (a < 0) Y[-1] = chunks[-1-a] is a REAL chunk, not zero
    rows_out = jnp.arange(-1, m)
    sel = (rows_in[None, None, :]
           == rows_out[None, :, None] - a[:, None, None])
    yext = jnp.einsum("bmn,bnc->bmc", sel.astype(x.dtype), chunks,
                      precision=_HI)  # (B, M+1, C): Y[-1..m-1]
    # fine: out[m_out, j] = W[m_out, c + j - fine] over W = [Y[m-1]; Y[m]]
    win = jnp.concatenate([yext[:, :m], yext[:, 1:]], axis=2)  # (B, M, 2C)
    j = jnp.arange(c)
    w_idx = jnp.arange(2 * c)
    sel2 = (w_idx[None, :, None]
            == c + j[None, None, :] - fine[:, None, None])
    out = jnp.einsum("bmw,bwj->bmj", win, sel2.astype(x.dtype),
                     precision=_HI)
    return out.reshape(b_, m * c)[:, :n]


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
    Precondition: rows are zero beyond ``lengths`` (true for the int16
    waveform cache and for decoded batches).  Pitch/speed rates are
    quantized to the k/64 polyphase grid (~1.6 % steps — augmentation
    diversity, not a calibration) so the whole chain stays on the MXU.
    """
    b, n = waves.shape
    ks = jax.random.split(key, 10)
    u = {i: jax.random.uniform(ks[i], (b,)) for i in range(4)}
    outer = jax.random.uniform(ks[4], (b,)) < augment_prob

    def gate(i):
        return jnp.logical_and(outer, u[i] < gate_prob)

    k_lo, k_hi = _RATE_KS[0], _RATE_KS[-1]
    x = waves

    # time shift (exact arbitrary integer shifts)
    shift_frac = jax.random.uniform(ks[5], (b,), minval=-shift_limit,
                                    maxval=shift_limit)
    shift = (shift_frac * lengths.astype(jnp.float32)).astype(jnp.int32)
    x = jnp.where(gate(1)[:, None],
                  batched_time_shift(x, shift), x)

    # pitch shift: resample by 2^(s/12) (nearest grid rate), keep duration
    semis = jax.random.uniform(ks[6], (b,), minval=-pitch_semitones,
                               maxval=pitch_semitones)
    pitch_k = jnp.clip(
        jnp.round(jnp.exp2(semis / 12.0) * _RATE_DEN).astype(jnp.int32),
        k_lo, k_hi)
    x = jnp.where(gate(2)[:, None],
                  _resample_bank(x, pitch_k - k_lo), x)

    # speed change: resample by r (nearest grid rate), duration scales 1/r
    r = jax.random.uniform(ks[7], (b,), minval=speed_range[0],
                           maxval=speed_range[1])
    speed_k = jnp.clip(jnp.round(r * _RATE_DEN).astype(jnp.int32),
                       k_lo, k_hi)
    do_speed = gate(3)
    x = jnp.where(do_speed[:, None], _resample_bank(x, speed_k - k_lo), x)
    new_len = jnp.minimum(
        (lengths.astype(jnp.float32) * _RATE_DEN
         / speed_k.astype(jnp.float32)).astype(jnp.int32), n)
    lengths = jnp.where(do_speed, new_len, lengths)

    # additive gaussian noise (only on the valid region)
    level = jax.random.uniform(ks[8], (b,), minval=noise_range[0],
                               maxval=noise_range[1])
    noise = jax.random.normal(ks[9], (b, n)) * level[:, None]
    mask = (jnp.arange(n)[None, :] < lengths[:, None]).astype(x.dtype)
    x = jnp.where(gate(0)[:, None], x + noise * mask, x)
    return x, lengths


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
