"""TPU-native log-mel front-end (JAX/XLA).

Instead of translating torchaudio's FFT pipeline, the DFT is expressed as two
GEMMs against precomputed windowed cosine/sine matrices (GEMM-native DFT —
the MXU-friendly formulation; cf. the MelT approach in PAPERS.md).  For a
1024-point frame the DFT matrices are (1024, 513): tiny, VMEM-resident, and
the whole front-end becomes

    frames @ Wcos, frames @ Wsin  ->  square+add  ->  @ mel_fb  ->  log10

which XLA fuses into a few MXU ops.  A fused single-kernel Pallas version
lives in ``frontend_pallas.py``; both must match the NumPy golden
(``frontend_numpy.py``), which itself matches the reference torchaudio
contract (``scripts/precompute_features.py:28-73``).

Batched processing of variable-length audio uses static shapes throughout
(XLA requirement): waveforms arrive zero-padded to a fixed buffer plus their
true lengths; the center padding is one bulk concatenate with the per-sample
right-reflect applied as a sparse chunk-level update (never a second pass
over the 80 k-sample buffers); and per-utterance normalization is computed
under a valid-frame mask so results are bit-identical to processing each
utterance alone.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.ops import frontend_numpy as golden


class FrontendParams(NamedTuple):
    """Precomputed constant operands of the front-end (device arrays)."""

    dft_cos: jax.Array  # (n_fft, n_freqs) window-folded cos DFT matrix
    dft_sin: jax.Array  # (n_fft, n_freqs)
    mel_fb: jax.Array  # (n_freqs, n_mels)
    n_fft: int
    hop_length: int
    n_mels: int
    sample_rate: int
    target_length: int
    frontend: str  # "torchaudio" | "librosa"
    norm_eps: float
    global_mean: float
    global_std: float


def make_frontend_params(
    cfg: Optional[AudioConfig] = None,
    dtype=jnp.float32,
    global_mean: float = -30.1,
    global_std: float = 12.7,
) -> FrontendParams:
    cfg = cfg or AudioConfig()
    n_freqs = cfg.n_fft // 2 + 1
    window = golden.hann_window(cfg.win_length)
    if cfg.win_length < cfg.n_fft:
        lpad = (cfg.n_fft - cfg.win_length) // 2
        window = np.pad(window, (lpad, cfg.n_fft - cfg.win_length - lpad))
    n = np.arange(cfg.n_fft)[:, None]
    f = np.arange(n_freqs)[None, :]
    angle = 2.0 * np.pi * n * f / cfg.n_fft
    wcos = (np.cos(angle) * window[:, None]).astype(np.float64)
    wsin = (-np.sin(angle) * window[:, None]).astype(np.float64)
    if cfg.frontend == "torchaudio":
        fb = golden.mel_filterbank(
            n_freqs, cfg.n_mels, cfg.sample_rate, cfg.f_min, cfg.f_max,
            mel_scale="htk", norm=None)
    else:
        fb = golden.mel_filterbank(
            n_freqs, cfg.n_mels, cfg.sample_rate, cfg.f_min, cfg.f_max,
            mel_scale="slaney", norm="slaney")
    return FrontendParams(
        dft_cos=jnp.asarray(wcos, dtype=dtype),
        dft_sin=jnp.asarray(wsin, dtype=dtype),
        mel_fb=jnp.asarray(fb, dtype=dtype),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        n_mels=cfg.n_mels,
        sample_rate=cfg.sample_rate,
        target_length=cfg.mel_spec_length,
        frontend=cfg.frontend,
        norm_eps=cfg.norm_eps,
        global_mean=global_mean,
        global_std=global_std,
    )


_PALLAS_PROBE: dict = {}


def pallas_usable() -> bool:
    """One-time Mosaic compile+run probe of the fused Pallas kernel.

    The kernel's correctness suite runs in interpreter mode on CPU; the
    Mosaic lowering itself is first exercised on the real backend here, so
    a TPU-compiler regression degrades ``backend="auto"`` to the XLA path
    (with a loud warning) instead of breaking every caller.  Cached per
    process; trivially True off-TPU (interpret mode).
    """
    backend = jax.default_backend()
    if backend != "tpu":
        return True
    if backend not in _PALLAS_PROBE:
        # The probe cannot run while an outer function is being traced
        # (log_mel_frontend(backend="auto") inside jit): under omnistaging
        # everything it does becomes a tracer, pallas primitives have no
        # eager-eval rule, and caching that failure would disable the
        # kernel for the whole process.  Fall back to XLA for THIS call
        # without caching; callers that want the kernel inside jit resolve
        # the backend eagerly first (default_backend_choice at setup time
        # — see data/cache.precompute_features, train/loop.Trainer).
        try:
            from jax._src import core as _core

            if not _core.trace_state_clean():
                return False
        except Exception:
            pass
        try:
            cfg = AudioConfig()  # the standard geometry pallas serves
            p = make_frontend_params(cfg)
            wf = jnp.zeros((8, 8 * cfg.hop_length), jnp.float32)
            ln = jnp.full((8,), 7 * cfg.hop_length + 13, jnp.int32)
            out = log_mel_frontend(wf, ln, p, backend="pallas")
            ok = bool(np.isfinite(np.asarray(out)).all())
            if not ok:
                import logging

                logging.getLogger(__name__).warning(
                    "Pallas frontend probe produced non-finite output; "
                    "'auto' falls back to the XLA backend")
            _PALLAS_PROBE[backend] = ok
        except jax.errors.TracerArrayConversionError:
            # probed mid-trace and eager eval was unavailable: fall back for
            # THIS call but do not cache — an eager caller may still probe
            return False
        except Exception as e:  # Mosaic compile/runtime failure
            import logging

            logging.getLogger(__name__).warning(
                "Pallas frontend kernel unusable on %s (%s); 'auto' falls "
                "back to the XLA backend", backend, e)
            _PALLAS_PROBE[backend] = False
    return _PALLAS_PROBE[backend]


def default_backend_choice(params: "FrontendParams | None" = None) -> str:
    """Pick the fastest measured backend for ``backend="auto"``.

    The fully fused factorized-DFT Pallas kernel (``frontend_pallas``) wins
    on the standard torchaudio config (v5e, interleaved best-of-rounds:
    3.96 vs 4.62 ms per 256-batch, 11.9 vs 16.8 ms per 1024-batch against
    the chunked half-DFT XLA path) while ALSO tracking the fp32 golden
    tighter (0.030 vs 0.096 max normalized error on real recordings — its
    bf16x4 GEMMs beat XLA's Precision.HIGH in near-clamp spectral valleys).
    The kernel supports exactly the reference geometry (torchaudio mode,
    n_fft=1024, hop=512); anything else uses the XLA path.
    """
    if (params is not None and params.frontend == "torchaudio"
            and params.n_fft == 1024 and params.hop_length == 512
            and pallas_usable()):
        return "pallas"
    return "xla"


def _prepare_one(x: jax.Array, length: jax.Array, pad: int, reflect: bool) -> jax.Array:
    """Center-pad one zero-padded waveform; returns (L_max + 2*pad,).

    Reflect mode reproduces torch.stft's ``pad_mode="reflect"``; constant
    mode (zeros) reproduces librosa's default.  The left pad is static; the
    right pad is written at the dynamic true end of the signal.
    """
    l_max = x.shape[0]
    buf = jnp.zeros(l_max + 2 * pad, dtype=x.dtype)
    buf = jax.lax.dynamic_update_slice(buf, x, (pad,))
    if reflect:
        left = x[1 : pad + 1][::-1]
        ridx = jnp.clip(length - 2 - jnp.arange(pad), 0, l_max - 1)
        right = x[ridx]
        buf = jax.lax.dynamic_update_slice(buf, left, (0,))
        buf = jax.lax.dynamic_update_slice(buf, right, (pad + length,))
    return buf


def _prepare_batch(waveforms: jax.Array, lengths: jax.Array, pad: int,
                   reflect: bool, patch_tail: bool = True) -> jax.Array:
    """Batched center padding with one bulk copy (+ optional tail patch).

    The bulk layout (left reflect | signal | zero tail) is a single
    concatenate; the `pad`-sized right-reflect region at each utterance's
    dynamic end is patched per sample when ``patch_tail`` (the chunked fast
    path applies it as a sparse chunk update instead — see
    :func:`_tail_reflect_chunks` — avoiding a second pass over the big
    buffer)."""
    b, l_max = waveforms.shape
    if not reflect:
        return jnp.pad(waveforms, ((0, 0), (pad, pad)))
    left = waveforms[:, 1 : pad + 1][:, ::-1]
    prepared = jnp.concatenate(
        [left, waveforms, jnp.zeros((b, pad), waveforms.dtype)], axis=1)
    if not patch_tail:
        return prepared

    def patch(buf, x, length):
        ridx = jnp.clip(length - 2 - jnp.arange(pad), 0, l_max - 1)
        return jax.lax.dynamic_update_slice(buf, x[ridx], (pad + length,))

    return jax.vmap(patch)(prepared, waveforms, lengths)


def frame_signal(prepared: jax.Array, n_fft: int, hop_length: int) -> jax.Array:
    """(B, L) center-padded signals -> (B, T, n_fft) overlapping frames.

    When ``n_fft`` is a multiple of ``hop_length`` (the 1024/512 default),
    frames are assembled from contiguous hop-sized chunks — a pure reshape +
    concat, no gather — which XLA lowers to cheap layout ops.
    """
    b, l = prepared.shape
    t = (l - n_fft) // hop_length + 1
    if n_fft % hop_length == 0:
        r = n_fft // hop_length
        n_chunks = t + r - 1
        chunks = prepared[:, : n_chunks * hop_length].reshape(b, n_chunks, hop_length)
        parts = [chunks[:, j : j + t] for j in range(r)]
        return jnp.concatenate(parts, axis=-1)
    starts = hop_length * jnp.arange(t)[:, None] + jnp.arange(n_fft)[None, :]
    return prepared[:, starts]


def _mel_power(frames: jax.Array, p: FrontendParams, precision) -> jax.Array:
    """(B, T, n_fft) frames -> (B, T, n_mels) mel power (the two-GEMM DFT)."""
    c = jnp.dot(frames, p.dft_cos, precision=precision)
    s = jnp.dot(frames, p.dft_sin, precision=precision)
    power = c * c + s * s
    return jnp.dot(power, p.mel_fb, precision=precision)


def _tail_reflect_chunks(waveforms, lengths, pad: int, hop: int,
                         n_chunks: int):
    """Right-reflect tail as sparse chunk-row updates.

    Returns (rows (B, 2) int32, vals (B, 2, hop)) such that adding ``vals``
    at chunk rows ``rows`` of the zero-tailed chunk view reproduces the
    exact reflect-padded signal.  The ``pad``-sample reflect region starts
    at prepared position ``pad + len`` and therefore straddles at most two
    hop-sized chunk rows; everything here is small-buffer work (one
    ``hop``-sample slice + one 2*hop-sample embed per sample) instead of a
    rewrite of the 80k-sample buffer.

    Exact for any length >= 1: the reflect indices ``clip(len-2-k, 0)`` are
    realized by left-extending the signal with ``pad`` copies of sample 0.
    """
    b, l_max = waveforms.shape
    # xe[j] = x[max(j - pad, 0)]  -> r[k] = x[clip(len-2-k, 0)] = flip(slice)
    xe = jnp.concatenate(
        [jnp.repeat(waveforms[:, :1], pad, axis=1), waveforms], axis=1)

    def one(xe_row, length):
        r = jax.lax.dynamic_slice(xe_row, (length - 1,), (pad,))[::-1]
        buf = jnp.zeros(2 * hop, xe_row.dtype)
        offset = (pad + length) % hop
        return jax.lax.dynamic_update_slice(buf, r, (offset,))

    vals = jax.vmap(one)(xe, lengths).reshape(b, 2, hop)
    c0 = (pad + lengths) // hop
    rows = jnp.stack([c0, c0 + 1], axis=1)  # (B, 2)
    in_range = rows < n_chunks
    vals = jnp.where(in_range[:, :, None], vals, 0.0)
    rows = jnp.minimum(rows, n_chunks - 1)
    return rows.astype(jnp.int32), vals


def padded_samples(max_samples: int, hop: int = 512,
                   multiple: int = 8) -> int:
    """Row-aligned waveform buffer size for the fused Pallas kernels.

    Callers that allocate their batch buffers at this size (instead of the
    raw ``max_samples``) avoid the in-jit PAD of :func:`waveform_rows`.
    Note the in-jit reshape itself is NOT free: XLA still materializes the
    reshaped custom-call operand (measured 2.0 ms/b2048,
    bench_kernel_attrib.py) — hand the kernel a host-side :func:`rows_view`
    of the buffer to skip that too.  The extra tail samples stay zero;
    true lengths are what the kernel masks on.
    """
    t = -(-(max_samples // hop + 1) // multiple) * multiple
    return t * hop


def rows_view(waveforms, hop: int = 512, multiple: int = 8):
    """(B, L) -> (B, L // hop, hop) row view, or None if not row-aligned.

    On a NumPy batch buffer this is a zero-copy view; handing it (instead
    of the flat buffer) to :func:`log_mel_conv1_frontend` makes the fused
    kernel's input the program parameter itself, eliminating the in-jit
    prep copy entirely."""
    b, width = waveforms.shape
    t_k = width // hop
    if width % hop or t_k % multiple:
        return None
    return waveforms.reshape(b, t_k, hop)


def waveform_rows(waveforms: jax.Array, hop: int,
                  multiple: int = 1) -> jax.Array:
    """(B, L) zero-padded waveforms -> (B, T, hop) row view for the fused
    pallas kernel, T = L // hop + 1 (the frame count at hop == n_fft/2),
    rounded up to ``multiple`` (sublane alignment; extra frames are junk
    the kernel's valid mask removes).

    When L is already row-aligned (``L % (hop * multiple) == 0`` — a
    :func:`padded_samples`-sized buffer) this is a FREE reshape with
    T = L // hop; correctness then requires every true length < L (one
    spare hop row must exist past the longest utterance — guaranteed by
    construction, since ``padded_samples(n) > n`` always).
    """
    b, l_max = waveforms.shape
    if l_max % (hop * multiple) == 0:
        return waveforms.reshape(b, l_max // hop, hop)
    t = l_max // hop + 1
    t = -(-t // multiple) * multiple
    need = t * hop
    if need > l_max:
        waveforms = jnp.pad(waveforms, ((0, 0), (0, need - l_max)))
    return waveforms[:, :need].reshape(b, t, hop)


def _mel_power_chunked(prepared: jax.Array, t: int, p: FrontendParams,
                       precision, tail_update=None) -> jax.Array:
    """(B, L) center-padded signals -> (B, T, n_mels) mel power WITHOUT
    materializing overlapping frames.

    With hop = n_fft/2, frame t is [chunk_t | chunk_{t+1}] of non-overlapping
    hop-sized chunks, so ``frame_t @ W == chunk_t @ W_hi + chunk_{t+1} @ W_lo``
    — the DFT runs directly on the chunked signal (half the matmul input
    bytes, no 2x-duplicated frame tensor in HBM).  This is the fast path for
    the production 1024/512 configuration.

    ``tail_update``: optional (rows, vals) from :func:`_tail_reflect_chunks`
    applied as a sparse add on the chunk view (the right-reflect pad).
    """
    hop = p.hop_length
    b = prepared.shape[0]
    n_chunks = t + 1
    chunks = prepared[:, : n_chunks * hop].reshape(b, n_chunks, hop)
    if tail_update is not None:
        rows, vals = tail_update
        chunks = chunks.at[jnp.arange(b)[:, None], rows].add(vals)

    def half_dft(w):
        hi, lo = w[:hop], w[hop:]
        a = jnp.dot(chunks, hi, precision=precision)  # (B, C, F)
        bb = jnp.dot(chunks, lo, precision=precision)
        return a[:, :t] + bb[:, 1 : t + 1]

    c = half_dft(p.dft_cos)
    s = half_dft(p.dft_sin)
    power = c * c + s * s
    return jnp.dot(power, p.mel_fb, precision=precision)


@functools.partial(
    jax.jit,
    static_argnames=("params_static", "normalize", "pad_to_target", "backend",
                     "out_dtype"))
def _frontend_impl(waveforms, lengths, dft_cos, dft_sin, mel_fb,
                   params_static, normalize, pad_to_target, backend="xla",
                   out_dtype=jnp.float32):
    (n_fft, hop, n_mels, target_len, mode, eps, gmean, gstd) = params_static
    p = FrontendParams(dft_cos, dft_sin, mel_fb, n_fft, hop, n_mels, 0,
                       target_len, mode, eps, gmean, gstd)
    pad = n_fft // 2
    reflect = mode == "torchaudio"
    # The sparse chunk-level tail applies only on the chunked XLA path; the
    # non-fused pallas fallback below frames the prepared buffer directly,
    # so it needs the tail patched in during prepare (per-sample updates).
    sparse_tail = reflect and n_fft == 2 * hop and backend != "pallas"
    if backend == "pallas" and n_fft == 2 * hop and n_fft == 1024:
        # Fully fused kernel: reads the RAW waveform rows (no prepared
        # array in HBM); left reflect + dynamic tail + factorized DFT +
        # mel + dB + masked normalization + mel-major layout in one
        # pallas_call (see frontend_pallas.py for the algorithm).
        from speech_intent_recognizer_tpu.ops import frontend_pallas as fp

        rows = waveform_rows(waveforms, hop, multiple=8)
        left = waveforms[:, 1 : pad + 1][:, ::-1][:, None, :]  # (B, 1, hop)
        t_true = waveforms.shape[1] // hop + 1
        return fp.fused_frontend_pallas(
            rows, lengths, left, p, normalize=normalize,
            t_out=target_len if pad_to_target else t_true,
            out_dtype=out_dtype)
    prepared = _prepare_batch(waveforms, lengths, pad, reflect,
                              patch_tail=not sparse_tail)
    b, l_prep = prepared.shape
    t = (l_prep - n_fft) // hop + 1
    if backend == "pallas":
        from speech_intent_recognizer_tpu.ops import frontend_pallas as fp

        frames = frame_signal(prepared, n_fft, hop)  # (B, T, n_fft)
        db = fp.mel_db_pallas(frames.reshape(b * t, n_fft), p).reshape(
            b, t, n_mels)
        return _finish(db, lengths, p, normalize, pad_to_target,
                       is_db=True).astype(out_dtype)
    # HIGH precision (bf16x3 passes): max |error| vs fp32 is ~3e-4 dB on
    # speech-scale inputs — far below the feature-parity tolerance — at
    # ~1.4x the speed of HIGHEST.
    if n_fft == 2 * hop:
        tail = (_tail_reflect_chunks(waveforms, lengths, pad, hop, t + 1)
                if sparse_tail else None)
        mel = _mel_power_chunked(prepared, t, p, jax.lax.Precision.HIGH,
                                 tail_update=tail)
    else:
        frames = frame_signal(prepared, n_fft, hop)
        mel = _mel_power(frames, p, jax.lax.Precision.HIGH)
    return _finish(mel, lengths, p, normalize, pad_to_target,
                   is_db=False).astype(out_dtype)


def _finish(mel, lengths, p, normalize, pad_to_target, is_db):
    """Shared tail: dB conversion (unless the kernel already fused it),
    masked per-utterance / global normalization, zero-pad, layout."""
    n_fft, hop = p.n_fft, p.hop_length
    n_mels, target_len = p.n_mels, p.target_length
    mode, eps, gmean, gstd = p.frontend, p.norm_eps, p.global_mean, p.global_std
    b, t, _ = mel.shape

    # Valid frames per utterance: center=True gives 1 + length // hop.
    t_valid = 1 + lengths // hop  # (B,)
    frame_idx = jnp.arange(t)[None, :]
    mask = (frame_idx < t_valid[:, None]).astype(mel.dtype)  # (B, T)
    mask3 = mask[:, :, None]

    if mode == "torchaudio":
        db = mel if is_db else 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        if normalize:
            cnt = (t_valid.astype(mel.dtype) * n_mels)[:, None, None]
            mean = jnp.sum(db * mask3, axis=(1, 2), keepdims=True) / cnt
            var = jnp.sum(jnp.square(db - mean) * mask3, axis=(1, 2),
                          keepdims=True) / jnp.maximum(cnt - 1.0, 1.0)
            db = (db - mean) / (jnp.sqrt(var) + eps)
    else:  # librosa mic path
        ref = jnp.max(jnp.where(mask3 > 0, mel, 0.0), axis=(1, 2), keepdims=True)
        db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
        db = db - 10.0 * jnp.log10(jnp.maximum(ref, 1e-10))
        peak = jnp.max(jnp.where(mask3 > 0, db, -jnp.inf), axis=(1, 2),
                       keepdims=True)
        db = jnp.maximum(db, peak - 80.0)
        if normalize:
            db = (db - gmean) / gstd

    db = db * mask3  # zero the padded frames (reference pads with zeros)
    db = jnp.swapaxes(db, 1, 2)  # (B, n_mels, T)
    if pad_to_target:
        if t >= target_len:
            db = db[:, :, :target_len]
        else:
            db = jnp.pad(db, ((0, 0), (0, 0), (0, target_len - t)))
    return db


@functools.partial(jax.jit, static_argnames=("params_static", "out_dtype"))
def _conv1_frontend_impl(waveforms, lengths, dft_cos, dft_sin, mel_fb,
                         weo, params_static, out_dtype):
    (n_fft, hop, n_mels, target_len, mode, eps, gmean, gstd) = params_static
    p = FrontendParams(dft_cos, dft_sin, mel_fb, n_fft, hop, n_mels, 0,
                       target_len, mode, eps, gmean, gstd)
    from speech_intent_recognizer_tpu.ops import frontend_pallas as fp

    pad = n_fft // 2
    if waveforms.ndim == 3:
        # rows-shaped (B, t_k, hop) input: the kernel operand IS the jit
        # parameter — no in-jit reshape, so XLA materializes no prep copy
        # (measured 2.0 ms/b2048 for the flat path's in-jit prep; see
        # bench_kernel_attrib.py "entry_prep").  pad == hop for the fused
        # geometry, so the left-reflect source (samples 1..pad reversed)
        # is row 0 samples 1.. plus row 1 sample 0.
        rows = waveforms
        head = jnp.concatenate([rows[:, 0, 1:], rows[:, 1, :1]], axis=1)
        left = head[:, ::-1][:, None, :]
    else:
        rows = waveform_rows(waveforms, hop, multiple=8)
        left = waveforms[:, 1 : pad + 1][:, ::-1][:, None, :]
    return fp.fused_frontend_conv1_pallas(
        rows, lengths, left, p, weo, out_dtype=out_dtype)


def log_mel_conv1_frontend(
    waveforms: jax.Array,
    lengths: jax.Array,
    params: FrontendParams,
    weo: jax.Array,
    out_dtype=jnp.bfloat16,
) -> jax.Array:
    """Fused front-end + first conv stage (Pallas; inference fast path).

    ``waveforms`` is either the flat (B, L) contract of
    :func:`log_mel_frontend`, or the row view (B, L // hop, hop) of a
    row-aligned buffer (``rows_view``) — the fast path: the kernel
    operand is then the program input itself and XLA materializes no
    prep copy (worth 2.0 ms/b2048, bench_kernel_attrib.py).  Returns the
    pooled conv1 output (B, target_length // 2, (n_mels // 2) * C1) for
    the ``CNNAudioGRU(conv1_external=True)`` variant.  ``weo`` comes from
    ``ops.frontend_pallas.conv1_band_operands`` applied to the BN-folded
    conv1 stage.  Supports exactly the fused-kernel geometry (torchaudio
    mode, n_fft=1024, hop=512, n_mels=64).
    """
    if params.frontend != "torchaudio":
        raise ValueError("conv1 frontend supports the torchaudio mode only")
    static = (params.n_fft, params.hop_length, params.n_mels,
              params.target_length, params.frontend, params.norm_eps,
              params.global_mean, params.global_std)
    return _conv1_frontend_impl(waveforms, lengths.astype(jnp.int32),
                                params.dft_cos, params.dft_sin, params.mel_fb,
                                weo, static, jnp.dtype(out_dtype))


def log_mel_frontend(
    waveforms: jax.Array,
    lengths: jax.Array,
    params: FrontendParams,
    normalize: bool = True,
    pad_to_target: bool = True,
    backend: str = "xla",
    out_dtype=jnp.float32,
) -> jax.Array:
    """Batched waveforms -> normalized log-mel features.

    Args:
      waveforms: (B, L_max) float32, zero-padded beyond each true length.
        L_max should already respect the 5 s cap (``AudioConfig.max_samples``).
      lengths: (B,) int32 true sample counts.
      params: from :func:`make_frontend_params`.
      normalize: apply the per-utterance (torchaudio mode) or global
        (librosa mode) normalization.
      pad_to_target: pad/trim time axis to ``params.target_length``.
      out_dtype: output dtype; normalization math is always fp32, the cast
        happens last (bf16 for direct model handoff skips an HBM round trip).

    Returns:
      (B, n_mels, target_length) in ``out_dtype`` (or (B, n_mels, T) if not
      padded).
    """
    if backend == "auto":
        backend = default_backend_choice(params)
    if backend == "pallas" and params.frontend != "torchaudio":
        raise ValueError("pallas backend supports the torchaudio front-end")
    static = (params.n_fft, params.hop_length, params.n_mels,
              params.target_length, params.frontend, params.norm_eps,
              params.global_mean, params.global_std)
    return _frontend_impl(waveforms, lengths, params.dft_cos, params.dft_sin,
                          params.mel_fb, static, normalize, pad_to_target,
                          backend, jnp.dtype(out_dtype))
