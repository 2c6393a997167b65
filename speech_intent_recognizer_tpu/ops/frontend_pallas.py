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
# v5: fully fused per-utterance kernel — factorized (Cooley-Tukey) DFT.
#
# One grid step processes FOUR utterances end-to-end from RAW waveform rows
# (no prepared array in HBM; the (T, hop) rows stream HBM->VMEM through the
# auto-double-buffered pallas pipeline).  The left-reflect chunk row arrives
# as a tiny precomputed input; the dynamic right-reflect tail is computed
# IN-KERNEL from the chunk rows (see _tail_vals_in_kernel) — its XLA-side
# per-row dynamic slices used to cost more than the entire kernel.
#
# The 1024-point windowed rDFT is NOT one dense GEMM (the XLA path's
# formulation, ~16 MFLOP effective per frame at Precision.HIGH): it is
# factorized as
#
#   frame (1024,) = 8 contiguous 128-blocks, n = n1 + 128*n2
#     inner : 8-point DFT over blocks n2 — radix-2, exact fp32 VPU adds
#             (coefficients 0, ±1, ±√2/2); conjugate symmetry
#             Z[8-r] = conj(Z[r]) means only residues 0..4 materialize
#     outer : X[8t+r] = Σ_{n1} Z[n1,r]·e^{-2πi n1 r/1024}·e^{-2πi n1 t/128}
#             — per-residue MXU dots against constant matrices with the
#             twiddle PRE-FOLDED; residues 5,6,7 reuse the r=3,2,1
#             operands against sign-adjusted constants, and the Nyquist
#             bin rides as the 128th column of the r=0 block ([Xr | Xi]
#             packed in lanes; N=128, lane-exact)
#     mel   : |X|² is folded into the mel projection by doubling the
#             permuted filterbank rows (real and imag lanes of a bin hit
#             the same FB row), so Xr/Xi are never unpacked — one K=1024
#             GEMM
#
# Only bins k < 512 ride the GEMM (t < 64): bins 513..n_fft/2 of a padded
# output would be dead weight — conjugate symmetry means nothing above
# Nyquist is needed, which is what makes N exactly 128 lanes.
#
# Precision: the GEMMs run bf16x4 (x and W split into exact bf16 hi+lo
# pairs; all four cross products accumulated in fp32).  Unlike the retired
# 3-pass version — whose dropped lo·lo term put ~30-40 dB of noise in
# near-clamp spectral valleys of real recordings — bf16x4 reconstructs the
# full product; remaining error is split rounding (~2^-17) and fp32
# accumulation, measured <=1e-2 dB vs the fp32 golden.  The mel projection
# runs 3-pass (all-positive operands: no cancellation).
#
# Arithmetic: ~3.3 MFLOP effective per frame vs ~16.7 for the dense XLA
# path — a ~5x algorithmic reduction at equal MXU efficiency — with HBM
# traffic of ONE signal read + one (n_mels, t_out) write.
#
# Numerical contract matches the NumPy golden / reference torchaudio
# features (scripts/precompute_features.py:28-73).
# ---------------------------------------------------------------------------

_SQRT1_2 = 0.7071067811865476


def _split_bf16(x: jax.Array):
    """f32 -> (hi, lo) bf16 pair with hi + lo ~= x (split rounding ~2^-17)."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tail_sl_sw(chunks_u, length, hop):
    """Phase 1 of the right-reflect tail for ONE utterance (see
    ``_tail_finish``): the block-order-swapped 3-row window around
    ``Q = S // hop``.  The lane reversal itself happens in the caller as
    ONE antidiagonal dot batched across all ``bu`` utterances — per-
    utterance small dots carry a fixed MXU dispatch cost that used to
    dominate this path.

    Args:
      chunks_u: (C, hop) f32 — [left-reflect row ; waveform rows] of one
        utterance (pre-correction).
      length: scalar int32 true sample count.

    Returns (3, hop) f32: x-rows Q-2, Q-1, Q with 128-block order reversed.
    """
    lane = _LANE
    nb = hop // lane  # 128-blocks per row (4)
    off = length % hop  # == (pad + len) % hop at pad == hop
    s_tot = length + off - 2
    q = s_tot // hop

    # One zero guard row on top so q = 0 (tiny lengths) needs no clamping:
    # x-row d maps to guarded row d + 2 (left row sits at d = -1).
    # Rows padded to a sublane multiple — tpu.dynamic_rotate wants it.
    n_ext = _round_up(chunks_u.shape[0] + 1, 8)
    ext = jnp.concatenate(
        [jnp.zeros((1, hop), jnp.float32), chunks_u,
         jnp.zeros((n_ext - chunks_u.shape[0] - 1, hop), jnp.float32)],
        axis=0)
    # Dynamic 3-row window at q: Mosaic has no value-level dynamic_slice,
    # but a dynamic sublane roll + static slice is equivalent.
    sl = pltpu.roll(ext, n_ext - q, 0)[:3]  # x-rows Q-2, Q-1, Q

    # Swap the 128-block order with static lane-slice concats; the within-
    # block lane reversal is the caller's batched antidiagonal dot.
    return jnp.concatenate(
        [sl[:, (nb - 1 - j) * lane:(nb - j) * lane] for j in range(nb)],
        axis=1)  # (3, hop), block order reversed


def _tail_finish(rev_rows, length, x0, hop):
    """Phase 2 of the right-reflect tail: from the lane-reversed 3-row
    window to the (2, hop) correction rows for chunk rows
    c0 = (hop+len)//hop and c0+1.

    The tail is the reversed window ``y[i] = x[S - i]`` (i the position in
    the two affected chunk rows, ``S = len + (len mod hop) - 2``), with the
    reflect fallback ``x[0]`` wherever ``S - i < 0`` (tiny lengths — the
    ``clip(len-2-k, 0)`` contract).  Realized Mosaic-natively as ONE
    ``pltpu.roll`` by the per-utterance amount ``511 - S mod hop`` plus a
    mask-stitch across the row boundary.  No per-row vmapped dynamic
    slices in XLA — those serialized at ~ms per op per batch and used to
    dominate the whole fused front-end.

    Args:
      rev_rows: (3, hop) f32 — lane-reversed x-rows Q-2, Q-1, Q.
      length: scalar int32 true sample count.
      x0: scalar f32 first sample (prefetched — Mosaic rejects offset
        (1,1)-slice broadcasts).
    """
    off = length % hop
    s_tot = length + off - 2
    c_shift = (hop - 1) - (s_tot % hop)

    # revs[d] = reversed x-row (Q - d):  sl rows ascend, so flip row order.
    revs = jnp.concatenate(
        [rev_rows[2:3], rev_rows[1:2], rev_rows[0:1]], axis=0)

    # out[l] = revs[l + c_shift]  ==  roll by -c_shift (jnp.roll semantics)
    rolled = pltpu.roll(revs, (hop - c_shift) % hop, 1)

    # Stitch: tail row r lane l reads rolled[r] while l < hop - c_shift,
    # rolled[r+1] past the row boundary.
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (2, hop), 1)
    rowi2 = jax.lax.broadcasted_iota(jnp.int32, (2, hop), 0)
    lo = jnp.concatenate([rolled[0:1], rolled[1:2]], axis=0)
    hi = jnp.concatenate([rolled[1:2], rolled[2:3]], axis=0)
    y = jnp.where(lanes2 < hop - c_shift, lo, hi)

    # Reflect-index fallback to x[0] and the valid-extent mask k in [0,hop).
    # i = hop*r + l, k = i - off, source j = s_tot - i.
    i2 = rowi2 * hop + lanes2
    k2 = i2 - off
    y = jnp.where(s_tot - i2 >= 0, y, x0)
    return jnp.where(jnp.logical_and(k2 >= 0, k2 < hop), y, 0.0)


def _frontend_core(lengths_ref, firsts_ref, rows_ref, left_ref,
                   win_ref, pk_ref, fm_ref, *,
                   bu, t_k, hop, n_mels, normalize, eps,
                   stop_after=None):
    """See _frontend_core_impl.  ``stop_after`` is INSTRUMENTATION ONLY
    (bench_kernel_attrib.py): truncate the kernel after a named stage
    ("read", "frame", "inner", "outer") and emit a stage-dependent stub of
    the full output shape, so stage costs can be measured as increments
    under the identical grid/DMA pipeline.  Production callers never set
    it; parity tests cover stop_after=None."""
    return _frontend_core_impl(
        lengths_ref, firsts_ref, rows_ref, left_ref, win_ref, pk_ref,
        fm_ref, bu=bu, t_k=t_k, hop=hop, n_mels=n_mels,
        normalize=normalize, eps=eps, stop_after=stop_after)


def _frontend_core_impl(lengths_ref, firsts_ref, rows_ref, left_ref,
                   win_ref, pk_ref, fm_ref, *,
                   bu, t_k, hop, n_mels, normalize, eps,
                   stop_after=None):
    """Shared kernel body: raw rows -> (db, mask), both (bu, t_k, n_mels_pad).

    ``db`` is the normalized log-mel image (NOT yet masked); ``mask`` zeroes
    padded frames and pad lanes.  Callers multiply and lay out / consume.
    """
    lane = _LANE
    nb = hop // lane
    b_idx = pl.program_id(0)
    xr = rows_ref[...]  # (bu, t_k, hop) f32 raw waveform rows (zero-padded)
    ones = jnp.ones((bu, t_k, lane), jnp.float32)
    if stop_after == "read":
        # touch every input lane block so the full streaming read happens
        acc = None
        for j in range(nb):
            blk = xr[:, :, j * lane:(j + 1) * lane]
            acc = blk if acc is None else acc + blk
        return acc, ones
    # Left-reflect chunk rows, precomputed in XLA (cheap static ops there).
    chunks = jnp.concatenate([left_ref[...], xr], axis=1)  # (bu, t_k+1, hop)
    # Dynamic right-reflect tail, computed HERE from the chunk rows and
    # added at chunk rows c0 / c0+1 per utterance (row c0+1 may fall off
    # the end — masked away).  The lane-reversal antidiagonal dot is
    # batched across all bu utterances (per-utterance small dots carry a
    # fixed MXU dispatch cost).  Per-utterance scalars enter via
    # scalar-select chains (Mosaic has no (bu,) -> (bu,1,1) reshape).
    sls = [_tail_sl_sw(chunks[u], lengths_ref[bu * b_idx + u], hop)
           for u in range(bu)]
    jmat = (jax.lax.broadcasted_iota(jnp.int32, (lane, lane), 0)
            == (lane - 1) - jax.lax.broadcasted_iota(
                jnp.int32, (lane, lane), 1)).astype(jnp.float32)
    rev_all = jnp.dot(
        jnp.concatenate(sls, axis=0).reshape(3 * bu * nb, lane), jmat,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST).reshape(3 * bu, hop)
    iota_u = jax.lax.broadcasted_iota(jnp.int32, (bu, t_k + 1, hop), 0)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (bu, t_k + 1, hop), 1)
    corr = None
    for u in range(bu):
        ln_u = lengths_ref[bu * b_idx + u]
        v_u = _tail_finish(rev_all[3 * u:3 * u + 3], ln_u,
                           firsts_ref[bu * b_idx + u], hop)
        c0u = (hop + ln_u) // hop
        uu = iota_u == u
        h0 = jnp.logical_and(uu, rowi == c0u)
        h1 = jnp.logical_and(uu, rowi == c0u + 1)
        cu = (jnp.where(h0, v_u[0:1][None], 0.0)
              + jnp.where(h1, v_u[1:2][None], 0.0))
        corr = cu if corr is None else corr + cu
    chunks = chunks + corr

    # Windowed contiguous 128-sample blocks of every frame: with
    # hop = n_fft/2 = 4 blocks, frame t's block c lives in chunk row
    # t + (c >= 4) at columns (c % 4)*128.
    wx = []
    for c in range(8):
        blk = chunks[:, (c // 4):(c // 4) + t_k,
                     (c % 4) * lane:(c % 4 + 1) * lane]
        wx.append(blk * win_ref[c:c + 1])

    if stop_after == "frame":
        acc = wx[0]
        for c in range(1, 8):
            acc = acc + wx[c]
        return acc, ones

    # Inner 8-point DFT over blocks (radix-2; coefficients 0, ±1, ±√2/2).
    # Z[n1, r] = Σ_c wx_c[n1] e^{-2πi c r/8}.  Conjugate symmetry
    # (Z[8-r] = conj(Z[r])) means only residues 0..4 are materialized; the
    # r = 5, 6, 7 outputs reuse the r = 3, 2, 1 operands against
    # sign-adjusted constant matrices.  The e^{-2πi n1 r/1024} twiddles and
    # the Nyquist bin are folded into those constants too — zero VPU cost.
    e = [wx[c] + wx[c + 4] for c in range(4)]
    o = [wx[c] - wx[c + 4] for c in range(4)]
    ea, eb = e[0] + e[2], e[1] + e[3]
    ec, ed = e[0] - e[2], e[1] - e[3]
    oa = _SQRT1_2 * (o[1] - o[3])
    ob = _SQRT1_2 * (o[1] + o[3])
    m = bu * t_k

    def lhs_pack(*parts):
        """Lane-concat f32 parts, flatten rows, split to [hi | lo] bf16."""
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=2)
        x = x.reshape(m, x.shape[2])
        h, l = _split_bf16(x)
        return jnp.concatenate([h, l], axis=1)  # (m, 2K)

    # K=128 operands (purely real residues 0 and 4), K=256 for r=1..3.
    lhs_by_r = {
        0: lhs_pack(ea + eb),
        4: lhs_pack(ea - eb),
        1: lhs_pack(o[0] + oa, -(ob + o[2])),
        2: lhs_pack(ec, -ed),
        3: lhs_pack(o[0] - oa, o[2] - ob),
    }

    if stop_after == "inner":
        acc = None
        for r in (0, 4, 1, 2, 3):
            part = lhs_by_r[r][:, :lane].astype(jnp.float32)
            acc = part if acc is None else acc + part
        return acc.reshape(bu, t_k, lane), ones

    # Outer DFT-128 with twiddles pre-multiplied.  The hi/lo rhs splits AND
    # the conjugate residue pairs (1,7), (2,6), (3,5) that share an lhs are
    # column-packed into ONE rhs each (``pk_ref``, see _fused_operands), so
    # the whole outer stage is FIVE MXU dots — the halves/pairs fall out as
    # 128-lane column slices summed on the VPU.  (The earlier per-residue
    # per-split form issued 16 dots; small-dot dispatch overhead was the
    # kernel's largest cost after the MXU floor.)
    pk = pk_ref[...]

    def outer_packed(lhs, row0, rows, cols):
        return jnp.dot(lhs, pk[row0:row0 + rows, :cols],
                       preferred_element_type=jnp.float32)

    o0 = outer_packed(lhs_by_r[0], 0, 2 * lane, 2 * lane)
    o4 = outer_packed(lhs_by_r[4], 2 * lane, 2 * lane, 2 * lane)
    o1 = outer_packed(lhs_by_r[1], 4 * lane, 4 * lane, 4 * lane)
    o2 = outer_packed(lhs_by_r[2], 8 * lane, 4 * lane, 4 * lane)
    o3 = outer_packed(lhs_by_r[3], 12 * lane, 4 * lane, 4 * lane)
    x_by_r = {
        0: o0[:, :lane] + o0[:, lane:],
        4: o4[:, :lane] + o4[:, lane:],
        1: o1[:, :lane] + o1[:, lane:2 * lane],
        7: o1[:, 2 * lane:3 * lane] + o1[:, 3 * lane:],
        2: o2[:, :lane] + o2[:, lane:2 * lane],
        6: o2[:, 2 * lane:3 * lane] + o2[:, 3 * lane:],
        3: o3[:, :lane] + o3[:, lane:2 * lane],
        5: o3[:, 2 * lane:3 * lane] + o3[:, 3 * lane:],
    }
    # (m, 128) = [Xr | Xi] (r0: +Nyquist) lanes, residue order 0,4,1,2,3,5,6,7
    sq = [x_by_r[r] * x_by_r[r] for r in (0, 4, 1, 2, 3, 5, 6, 7)]
    # Mel projection with |X|² folded in: each lane of sq hits the permuted
    # (bin-doubled) FB row for its bin, so Xr/Xi are never unpacked — the
    # whole projection is ONE K=1024 GEMM (x3 bf16 passes; the hi and lo FB
    # splits ride as column blocks of ``fm_ref``, summed after the dot).
    if stop_after == "outer":
        acc = sq[0]
        for part in sq[1:]:
            acc = acc + part
        return acc.reshape(bu, t_k, lane), ones

    psl = jnp.concatenate(sq, axis=1)  # (m, 1024), residue-major lanes
    ph, pl_ = _split_bf16(psl)
    om = jnp.dot(jnp.concatenate([ph, pl_], axis=1), fm_ref[...],
                 preferred_element_type=jnp.float32)
    n_mels_pad = om.shape[1] // 2
    mel = om[:, :n_mels_pad] + om[:, n_mels_pad:]
    mel = mel.reshape(bu, t_k, n_mels_pad)

    db = (10.0 / np.log(10.0)) * jnp.log(jnp.maximum(mel, 1e-10))

    iota_u2 = jax.lax.broadcasted_iota(jnp.int32, (bu, t_k, n_mels_pad), 0)
    rows_i = jax.lax.broadcasted_iota(jnp.int32, (bu, t_k, n_mels_pad), 1)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (bu, t_k, n_mels_pad), 2)
    valid = None
    for u in range(bu):
        tv_u = 1 + lengths_ref[bu * b_idx + u] // hop
        vu = jnp.logical_and(iota_u2 == u, rows_i < tv_u)
        valid = vu if valid is None else jnp.logical_or(valid, vu)
    mask = jnp.logical_and(valid, lanes < n_mels).astype(jnp.float32)
    if normalize:
        # Per-utterance mean / unbiased std over valid frames x real mels
        # (reference contract: precompute_features.py:73, ddof=1).  Scalar
        # reductions per utterance — Mosaic rejects (bu,1,1) vector layouts.
        db_n = None
        for u in range(bu):
            dbu = db[u]
            mk = mask[u]
            cnt = jnp.sum(mk)  # == tv * n_mels
            mean = jnp.sum(dbu * mk) / cnt
            var = jnp.sum(jnp.square(dbu - mean) * mk) / jnp.maximum(
                cnt - 1.0, 1.0)
            scale = 1.0 / (jnp.sqrt(var) + eps)
            term = jnp.where(iota_u2 == u, (db - mean) * scale, 0.0)
            db_n = term if db_n is None else db_n + term
        db = db_n
    return db, mask


def _fused_kernel(lengths_ref, firsts_ref, rows_ref, left_ref,
                  win_ref, pk_ref, fm_ref, out_ref, *,
                  bu, t_k, t_out, hop, n_mels, normalize, eps, out_dtype,
                  stop_after=None):
    db, mask = _frontend_core(
        lengths_ref, firsts_ref, rows_ref, left_ref, win_ref, pk_ref,
        fm_ref, bu=bu, t_k=t_k, hop=hop, n_mels=n_mels,
        normalize=normalize, eps=eps, stop_after=stop_after)
    db = db * mask  # zero padded frames and pad lanes
    dbt = jnp.swapaxes(db, 1, 2)[:, :n_mels]  # (bu, n_mels, t_k) mel-major
    if t_out > t_k:
        dbt = jnp.concatenate(
            [dbt, jnp.zeros((bu, n_mels, t_out - t_k), jnp.float32)], axis=2)
    else:
        dbt = dbt[:, :, :t_out]
    out_ref[...] = dbt.astype(out_dtype)


_BU = 8  # utterances per grid step (amortizes per-step VPU/pipeline cost)


@functools.partial(jax.jit, static_argnames=(
    "t_out", "hop", "n_mels", "normalize", "eps", "out_dtype", "interpret",
    "stop_after"))
def _fused_call(rows, lengths, firsts, left, win, pk, fm,
                t_out, hop, n_mels, normalize, eps,
                out_dtype, interpret, stop_after=None):
    b, t_k, _ = rows.shape  # t_k waveform rows -> t_k frames (incl. pad)
    bu = _BU
    b_pad = -(-b // bu) * bu
    if b_pad != b:
        pad = ((0, b_pad - b),)
        rows = jnp.pad(rows, pad + ((0, 0), (0, 0)))
        left = jnp.pad(left, pad + ((0, 0), (0, 0)))
        lengths = jnp.pad(lengths, pad, constant_values=1)
        firsts = jnp.pad(firsts, pad)
    n_mels_pad = fm.shape[1] // 2
    kernel = functools.partial(
        _fused_kernel, bu=bu, t_k=t_k, t_out=t_out, hop=hop, n_mels=n_mels,
        normalize=normalize, eps=eps, out_dtype=out_dtype,
        stop_after=stop_after)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad // bu,),
        in_specs=[
            pl.BlockSpec((bu, t_k, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, 1, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((8, 1, _LANE)),          # window blocks
            const((16 * _LANE, 4 * _LANE)),  # packed twiddled outer DFT rhs
            const((16 * _LANE, 2 * n_mels_pad)),  # packed hi/lo mel FB
        ],
        out_specs=pl.BlockSpec((bu, n_mels, t_out), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_mels, t_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            # bf16x4 outer dots (2 K=256, 6 K=512) + 3-pass K=1024 mel
            flops=b_pad * t_k * ((2 * 2 * _LANE + 6 * 4 * _LANE) * _LANE * 2
                                 + 3 * 8 * _LANE * n_mels_pad * 2),
            bytes_accessed=(b_pad * t_k * hop * 4
                            + (16 * _LANE * 4 * _LANE
                               + 16 * _LANE * 2 * n_mels_pad) * 2
                            + b_pad * n_mels * t_out * 4),
            transcendentals=b_pad * t_k * n_mels_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths, firsts, rows, left, win, pk, fm)
    return out[:b]


def _fused_operands(p: FrontendParams):
    """Constant kernel operands for the factorized rDFT + mel chain.

    The pure-DFT factor matrices are exact numpy constants; the Hann window
    is recovered from the windowed cos matrix's DC column (cos(0)=1).
    """
    n_fft, lane = p.n_fft, _LANE
    blocks = n_fft // lane  # 8
    n1 = np.arange(lane)
    tt = np.arange(lane // 2)  # t < 64: bins 8t+r < 512
    cmat = np.cos(2 * np.pi * np.outer(n1, tt) / lane)
    smat = np.sin(2 * np.pi * np.outer(n1, tt) / lane)

    def cp_sp(r):
        """Outer DFT columns with the e^{-2πi n1 r/n_fft} twiddle folded."""
        tc = np.cos(2 * np.pi * r * n1 / n_fft)[:, None]
        ts = np.sin(2 * np.pi * r * n1 / n_fft)[:, None]
        return tc * cmat - ts * smat, ts * cmat + tc * smat

    # Residue order (0, 4, 1, 2, 3, 5, 6, 7) — matches the kernel's dot and
    # lane-concat order.  r=0/4 have purely real inner outputs (K=128);
    # r=5,6,7 reuse the conjugate operands of r=3,2,1 with adjusted signs.
    r0 = np.zeros((lane, lane))
    r0[:, : lane // 2] = cmat                      # Xr of bins 8t
    r0[:, lane // 2:lane - 1] = -smat[:, 1:]       # Xi of bins 8(t+1)
    r0[:, lane - 1] = (-1.0) ** n1                 # Nyquist bin n_fft/2
    cp4, sp4 = cp_sp(4)
    blocks_r = [r0, np.concatenate([cp4, -sp4], axis=1)]
    for r in (1, 2, 3):
        cp, sp = cp_sp(r)
        blocks_r.append(np.block([[cp, -sp], [sp, cp]]))
    for r in (5, 6, 7):  # lhs is [Zr_{8-r} | Zi_{8-r}] (conjugate reuse)
        cp, sp = cp_sp(r)
        blocks_r.append(np.block([[cp, -sp], [-sp, -cp]]))
    # Row-duplicate each block: dot([hi|lo], [[R];[R]]) = hi@R + lo@R.
    rmat = np.concatenate(
        [np.concatenate([b, b], axis=0) for b in blocks_r], axis=0)

    n_mels_pad = _round_up(p.n_mels, lane)
    fb = jnp.pad(p.mel_fb.astype(jnp.float32),
                 ((0, 0), (0, n_mels_pad - p.n_mels)))
    # Permuted bin-doubled FB, blocks in residue order (0,4,1,2,3,5,6,7):
    # each sq lane multiplies the FB row of its bin (real and imag lanes of
    # the same bin share a row; r0 carries the Nyquist row in lane 127).
    idx = np.zeros((blocks, lane), np.int64)
    idx[0, : lane // 2] = blocks * np.arange(lane // 2)
    idx[0, lane // 2:lane - 1] = blocks * (np.arange(lane // 2 - 1) + 1)
    idx[0, lane - 1] = n_fft // 2
    for j, r in enumerate((4, 1, 2, 3, 5, 6, 7)):
        a = blocks * np.arange(lane // 2) + r
        idx[1 + j] = np.concatenate([a, a])
    fbp = fb[idx.reshape(-1)]  # (blocks*lane, n_mels_pad)

    def split_np(x):
        hi = np.asarray(x, np.float64).astype(jnp.bfloat16)
        lo = (x - np.asarray(hi, np.float64)).astype(jnp.bfloat16)
        return np.asarray(hi), np.asarray(lo)

    rh, rl = split_np(rmat)
    # Column-pack the hi/lo splits AND the conjugate residue pairs sharing
    # an lhs into one rhs per dot (see the kernel's outer_packed): row
    # blocks P0 (r0), P4 (r4) at 256 rows / 256 used cols, then P1 (r1+r7),
    # P2 (r2+r6), P3 (r3+r5) at 512 rows x [rh_a | rl_a | rh_b | rl_b].
    pk = np.zeros((16 * lane, 4 * lane), rh.dtype)
    pk[0:256, 0:128], pk[0:256, 128:256] = rh[0:256], rl[0:256]
    pk[256:512, 0:128], pk[256:512, 128:256] = rh[256:512], rl[256:512]
    for i, (a, b) in enumerate(((512, 3072), (1024, 2560), (1536, 2048))):
        dst = 512 * (i + 1)
        pk[dst:dst + 512, 0:128] = rh[a:a + 512]
        pk[dst:dst + 512, 128:256] = rl[a:a + 512]
        pk[dst:dst + 512, 256:384] = rh[b:b + 512]
        pk[dst:dst + 512, 384:512] = rl[b:b + 512]

    fh1, fl1 = _split_bf16(fbp)
    # One-dot mel rhs: [[Fh ; Fl], [Fh ; 0]] — [ph | pl] against it gives
    # ph@Fh + pl@Fh in the left column block and ph@Fl in the right.
    # (jnp, not numpy: mel_fb may be traced under jit.)
    fm = jnp.concatenate(
        [jnp.concatenate([fh1, fl1], axis=1),
         jnp.concatenate([fh1, jnp.zeros_like(fl1)], axis=1)], axis=0)
    window = p.dft_cos[:, 0]  # hann window (cos(0) column)
    win = window.reshape(blocks, 1, lane).astype(jnp.float32)
    return win, jnp.asarray(pk), jnp.asarray(fm)


# ---------------------------------------------------------------------------
# v6: conv1 + ReLU + 2x2 max-pool fused INTO the frontend kernel.
#
# The model's conv stack is the fused step's bottleneck (61% at b1024) and
# L1 is the worst offender: XLA materializes conv1's (B, 32, 64, 200)
# activation in HBM (838 MB/batch) for a layer that is MXU-hostile as a
# plain conv (Cin=1, 3x3).  Here L1 runs while the normalized (200, 64)
# mel image is still in VMEM, as a *time-column banded GEMM*:
#
#   LHS (t_out, 256) = [prev-col mels | curr-col mels | next-col mels | 1]
#     built with two static rolls (sublane +-1 for the time shifts, lane
#     +64 to pack two 64-mel columns per 128-lane block; the constant 1
#     lane carries the folded-BN bias through the GEMM)
#   RHS: TWO (256, 1024) band matrices W_even / W_odd — W_even[r, m*32+c]
#     holds conv kernel tap K[m_in - 2m + 1, dt + 1, 0, c] for r = (dt+1
#     block, m_in lane); out-of-band taps are zero.  Splitting even/odd
#     output mel rows means  max(z_even, z_odd)  IS the mel-direction
#     2-pool with no lane compaction.
#   ReLU commutes with max; the time-direction pool is one roll+max plus
#   an exact 0/1 row-selection dot (rows 0,2,...,t_out-2).
#
# Output (B, t_out/2, 1024) with lane = m_pooled*32 + c_out — consumed by
# the conv1-less CNNAudioGRU variant (models/cnn_gru.py, conv1_external),
# which runs conv2/conv3 on (T, M) with spatially-transposed kernels.
# Replaces the reference's models/models.py:10-13 first stage bit-for-bit
# at bf16 precision (the production model's own compute dtype).
# ---------------------------------------------------------------------------


def _fused_conv1_kernel(lengths_ref, firsts_ref, rows_ref, left_ref,
                        win_ref, pk_ref, fm_ref,
                        weo_ref, sel_ref, out_ref, *,
                        bu, t_k, t_out, hop, n_mels, normalize, eps,
                        out_dtype):
    db, mask = _frontend_core(
        lengths_ref, firsts_ref, rows_ref, left_ref, win_ref, pk_ref,
        fm_ref, bu=bu, t_k=t_k, hop=hop, n_mels=n_mels,
        normalize=normalize, eps=eps)
    db = db * mask  # (bu, t_k, n_mels_pad); pad lanes zero (roll relies on it)
    n_out = weo_ref.shape[1] // 2
    lanes = db.shape[2]
    # Pad/trim every utterance's image to t_out rows, then flatten to one
    # (bu*t_out, lanes) sheet so ALL per-utterance conv GEMMs fuse into a
    # single MXU dot.  The time shifts become one sublane roll each, with
    # utterance-boundary rows masked via a modular row index (roll wraps
    # across utterances exactly at rows the mask zeroes).
    if t_k >= t_out:
        dbp = db[:, :t_out]
    else:
        dbp = jnp.concatenate(
            [db, jnp.zeros((bu, t_out - t_k, lanes), jnp.float32)], axis=1)
    xs = dbp.reshape(bu * t_out, lanes)
    rowi = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, xs.shape, 1)
    rmod = jax.lax.rem(rowi, t_out)
    prev = jnp.where(rmod == 0, 0.0, pltpu.roll(xs, 1, 0))
    nxt = jnp.where(rmod == t_out - 1, 0.0,
                    pltpu.roll(xs, bu * t_out - 1, 0))
    # [prev mels | curr mels] in one block; bias rides lane n_mels of the
    # second block as a constant 1 (W row 3*n_mels holds the folded-BN
    # bias), so no separate broadcast-add is needed.
    blk0 = prev + pltpu.roll(xs, n_mels, 1)
    blk1 = jnp.where(lanei == n_mels, 1.0, nxt)
    lhs = jnp.concatenate([blk0, blk1], axis=1).astype(jnp.bfloat16)
    # ONE dot realizes conv1 for all bu utterances against [W_even | W_odd];
    # max over the halves IS the mel-direction 2-pool, ReLU commutes.
    z = jnp.dot(lhs, weo_ref[...], preferred_element_type=jnp.float32)
    y = jnp.maximum(jnp.maximum(z[:, :n_out], z[:, n_out:]), 0.0)
    # time-direction pool: rows t hold max(y[t], y[t+1]); odd rows are
    # never selected, so the cross-utterance wrap at row bu*t_out-1 is
    # harmless.  The selection dot keeps even rows (exact 0/1 matrix;
    # values are bf16-bound anyway — the model consumes bf16 activations).
    ymax = jnp.maximum(y, pltpu.roll(y, bu * t_out - 1, 0)).astype(
        jnp.bfloat16)
    for u in range(bu):
        out = jnp.dot(sel_ref[...], ymax[u * t_out:(u + 1) * t_out],
                      preferred_element_type=jnp.float32)
        out_ref[u] = out.astype(out_dtype)


@functools.partial(jax.jit, static_argnames=(
    "t_out", "hop", "n_mels", "normalize", "eps", "out_dtype", "interpret"))
def _fused_conv1_call(rows, lengths, firsts, left, win, pk, fm,
                      weo, sel, t_out, hop, n_mels, normalize, eps,
                      out_dtype, interpret):
    b, t_k, _ = rows.shape
    bu = _BU
    b_pad = -(-b // bu) * bu
    if b_pad != b:
        pad = ((0, b_pad - b),)
        rows = jnp.pad(rows, pad + ((0, 0), (0, 0)))
        left = jnp.pad(left, pad + ((0, 0), (0, 0)))
        lengths = jnp.pad(lengths, pad, constant_values=1)
        firsts = jnp.pad(firsts, pad)
    n_mels_pad = fm.shape[1] // 2
    t_pool = t_out // 2
    n_out = weo.shape[1] // 2
    kernel = functools.partial(
        _fused_conv1_kernel, bu=bu, t_k=t_k, t_out=t_out, hop=hop,
        n_mels=n_mels, normalize=normalize, eps=eps, out_dtype=out_dtype)
    const = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i, *_: (0,) * len(shape), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad // bu,),
        in_specs=[
            pl.BlockSpec((bu, t_k, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bu, 1, hop), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((8, 1, _LANE)),          # window blocks
            const((16 * _LANE, 4 * _LANE)),  # packed twiddled outer DFT rhs
            const((16 * _LANE, 2 * n_mels_pad)),  # packed hi/lo mel FB
            const((2 * _LANE, 2 * n_out)),  # conv bands [W_even | W_odd]
            const((t_pool, t_out)),        # time-pool row selection
        ],
        out_specs=pl.BlockSpec((bu, t_pool, n_out), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, t_pool, n_out), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=b_pad * t_k * ((2 * 2 * _LANE + 6 * 4 * _LANE) * _LANE * 2
                                 + 3 * 8 * _LANE * n_mels_pad * 2)
            + b_pad * t_out * (2 * 2 * _LANE * n_out * 2
                               + t_pool * n_out * 2),
            bytes_accessed=(b_pad * t_k * hop * 4
                            + (16 * _LANE * 4 * _LANE
                               + 16 * _LANE * 2 * n_mels_pad) * 2
                            + 2 * 2 * _LANE * n_out * 2
                            + b_pad * t_pool * n_out * 4),
            transcendentals=b_pad * t_k * n_mels_pad,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lengths, firsts, rows, left, win, pk, fm, weo, sel)
    return out[:b]


def conv1_band_operands(conv_kernel, conv_bias, n_mels: int = 64):
    """Band-matrix RHS realizing conv1+bias as ONE GEMM.

    Args:
      conv_kernel: (3, 3, 1, C) HWIO flax conv kernel, spatial dims
        (mel, time) — the BN-folded ``conv1`` kernel.
      conv_bias: (C,) folded bias.

    Returns ``weo``: (2*128, n_mels * C) bf16 = [W_even | W_odd] — rows are
    LHS lanes ((dt+1)-block 64-mel layout, bias row at 3*n_mels), columns
    (m_out//2)*C + c_out for even m_out in the left half, odd in the right;
    ``max`` over the halves is the mel-direction 2-pool.
    """
    k = np.asarray(conv_kernel, np.float64)  # (3, 3, 1, C)
    bias = np.asarray(conv_bias, np.float64)
    c_out = k.shape[-1]
    lane = _LANE
    half = n_mels // 2
    n_out = half * c_out
    mats = []
    for parity in (0, 1):
        w = np.zeros((2 * lane, n_out), np.float64)
        for mh in range(half):
            m_out = 2 * mh + parity
            for dm in (-1, 0, 1):
                m_in = m_out + dm
                if not 0 <= m_in < n_mels:
                    continue
                for dt in (-1, 0, 1):
                    # LHS lane of x[m_in, t+dt]: dt=-1 -> lanes 0..63,
                    # dt=0 -> 64..127, dt=+1 -> 128..191
                    r = (dt + 1) * n_mels + m_in
                    w[r, mh * c_out : (mh + 1) * c_out] = k[dm + 1, dt + 1, 0]
        # bias enters via the constant-1 LHS lane: blk1's lane n_mels,
        # i.e. overall lane 2*n_mels + n_mels = 192 for n_mels=64
        for mh in range(half):
            w[3 * n_mels, mh * c_out : (mh + 1) * c_out] = bias
        mats.append(w.astype(np.float32))
    return jnp.asarray(np.concatenate(mats, axis=1), jnp.bfloat16)


def time_pool_selector(t_out: int) -> jax.Array:
    """(t_out//2, t_out) 0/1 matrix selecting even rows (exact bf16)."""
    sel = np.zeros((t_out // 2, t_out), np.float32)
    sel[np.arange(t_out // 2), 2 * np.arange(t_out // 2)] = 1.0
    return jnp.asarray(sel, jnp.bfloat16)


def fused_frontend_conv1_pallas(wf_rows: jax.Array, lengths: jax.Array,
                                left_row: jax.Array, p: FrontendParams,
                                weo: jax.Array,
                                normalize: bool = True,
                                t_out: int | None = None,
                                out_dtype=jnp.bfloat16) -> jax.Array:
    """Fully fused front-end + conv1 stage: raw rows -> pooled L1 output.

    Same input contract as :func:`fused_frontend_pallas`; ``weo`` from
    :func:`conv1_band_operands`.  Emits (B, t_out//2, (n_mels//2) * C) with
    lane = m_pooled * C + c_out — the input of the ``conv1_external``
    CNNAudioGRU variant.
    """
    if p.n_fft != 2 * p.hop_length or p.n_fft != 8 * _LANE:
        raise ValueError("fused kernel requires n_fft=1024, hop=512")
    if p.n_mels != 64:
        raise ValueError("fused conv1 kernel requires n_mels=64")
    t_out = p.target_length if t_out is None else t_out
    if t_out % 2:
        raise ValueError("fused conv1 kernel requires even target_length")
    win, pk, fm = _fused_operands(p)
    sel = time_pool_selector(t_out)
    interpret = jax.default_backend() != "tpu"
    return _fused_conv1_call(
        wf_rows, lengths.astype(jnp.int32), wf_rows[:, 0, 0], left_row,
        win, pk, fm, weo, sel, t_out, p.hop_length,
        p.n_mels, normalize, p.norm_eps, jnp.dtype(out_dtype), interpret)


def fused_frontend_pallas(wf_rows: jax.Array, lengths: jax.Array,
                          left_row: jax.Array,
                          p: FrontendParams, normalize: bool = True,
                          t_out: int | None = None,
                          out_dtype=jnp.float32,
                          _stop_after: str | None = None) -> jax.Array:
    """Fully fused front-end: raw waveform rows -> normalized log-mel.

    Args:
      wf_rows: (B, T, hop) f32 — the zero-padded waveform buffer viewed as
        hop-sized rows (``frontend_jax.waveform_rows``); T = frame count
        padded to a sublane multiple (junk frames are masked out).
      lengths: (B,) int32 true sample counts (sole per-utterance scalar —
        the dynamic right-reflect tail is computed in-kernel from it).
      left_row: (B, 1, hop) left-reflect chunk row (flip of samples 1..hop;
        cheap static ops in XLA).
      normalize: fuse the masked per-utterance mean/std normalization.
      t_out: output time axis (pad/trim); defaults to ``p.target_length``.
      out_dtype: output dtype (f32, or bf16 for direct model handoff).
    """
    if p.n_fft != 2 * p.hop_length or p.n_fft != 8 * _LANE:
        raise ValueError("fused kernel requires n_fft=1024, hop=512")
    t_out = p.target_length if t_out is None else t_out
    win, pk, fm = _fused_operands(p)
    interpret = jax.default_backend() != "tpu"
    return _fused_call(wf_rows, lengths.astype(jnp.int32),
                       wf_rows[:, 0, 0], left_row, win, pk, fm,
                       t_out, p.hop_length, p.n_mels, normalize,
                       p.norm_eps, jnp.dtype(out_dtype), interpret,
                       stop_after=_stop_after)
