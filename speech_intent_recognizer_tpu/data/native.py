"""ctypes bindings for the native C++ DSP library (``native/libsirdsp.so``).

The native library owns the host-side hot loops that the reference delegated
to torchaudio's C++ backend: audio decode (RIFF/WAVE parser + mpg123 MP3),
mono mixdown, and bandlimited sinc resampling.  Python falls back to the
NumPy implementations in :mod:`audio_io` / :mod:`ops.resample` when the
library has not been built (``native/build.sh``).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB_NAMES = ("libsirdsp.so",)
_lib: Optional[ctypes.CDLL] = None
_checked = False


def _candidate_paths():
    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    for name in _LIB_NAMES:
        yield os.path.join(here, "native", "build", name)
        yield os.path.join(here, "native", name)
        yield name


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _checked
    if _checked:
        return _lib
    _checked = True
    for path in _candidate_paths():
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            continue
        try:
            lib.sirdsp_decode_file.restype = ctypes.c_int
            lib.sirdsp_decode_file.argtypes = [
                ctypes.c_char_p,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
                ctypes.POINTER(ctypes.c_longlong),  # num frames
                ctypes.POINTER(ctypes.c_int),  # channels
                ctypes.POINTER(ctypes.c_int),  # sample rate
            ]
            lib.sirdsp_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
            lib.sirdsp_resample.restype = ctypes.c_longlong
            lib.sirdsp_resample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_longlong,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ]
            lib.sirdsp_version.restype = ctypes.c_int
            # Raw c_void_p argtypes: the stream calls sit on the per-chunk
            # serving hot path, and ndpointer's per-call dtype/flags
            # validation costs more than the C compute itself.  The
            # NativeStreamer wrapper owns the (fixed) buffers and passes
            # prebound pointers.
            vp = ctypes.c_void_p
            lib.sirdsp_stream_feed.restype = ctypes.c_longlong
            lib.sirdsp_stream_feed.argtypes = [
                vp, vp, vp, vp, ctypes.c_longlong, vp, vp,
                ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_longlong, ctypes.c_longlong,
            ]
            lib.sirdsp_stream_finalize.restype = ctypes.c_longlong
            lib.sirdsp_stream_finalize.argtypes = [
                vp, vp, vp, vp, vp,
                ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_longlong,
            ]
            lib.sirdsp_mean_abs.restype = ctypes.c_double
            lib.sirdsp_mean_abs.argtypes = [vp, ctypes.c_longlong]
        except AttributeError:
            continue
        _lib = lib
        break
    return _lib


def available() -> bool:
    return _load() is not None


def decode_file(path: str) -> Tuple[np.ndarray, int]:
    """Decode via the native library -> (float32 (frames, channels), rate)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native libsirdsp not built")
    data_ptr = ctypes.POINTER(ctypes.c_float)()
    frames = ctypes.c_longlong(0)
    channels = ctypes.c_int(0)
    rate = ctypes.c_int(0)
    ret = lib.sirdsp_decode_file(path.encode(), ctypes.byref(data_ptr),
                                 ctypes.byref(frames), ctypes.byref(channels),
                                 ctypes.byref(rate))
    if ret != 0:
        raise RuntimeError(f"sirdsp decode failed (code {ret}) for {path}")
    try:
        n = frames.value * channels.value
        x = np.ctypeslib.as_array(data_ptr, shape=(n,)).copy()
    finally:
        lib.sirdsp_free(data_ptr)
    return x.reshape(frames.value, channels.value), rate.value


def resample(x: np.ndarray, orig_freq: int, new_freq: int,
             lowpass_filter_width: int = 6,
             rolloff: float = 0.99) -> np.ndarray:
    """Native sinc resample of a mono float32 signal."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native libsirdsp not built")
    x = np.ascontiguousarray(x, dtype=np.float32).reshape(-1)
    out_ptr = ctypes.POINTER(ctypes.c_float)()
    n_out = lib.sirdsp_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        int(orig_freq), int(new_freq), int(lowpass_filter_width),
        float(rolloff), ctypes.byref(out_ptr))
    if n_out < 0:
        raise RuntimeError(f"sirdsp resample failed (code {n_out})")
    try:
        out = np.ctypeslib.as_array(out_ptr, shape=(n_out,)).copy()
    finally:
        lib.sirdsp_free(out_ptr)
    return out


class NativeStreamer:
    """Thin stateful wrapper over the native streaming featurizer.

    Owns nothing but NumPy buffers — the C side
    (``native/sirdsp.cpp::sirdsp_stream_feed/finalize``) mutates them in
    place, so there are no handles to free and the caller can alias the
    prepared-signal buffer for its own views.
    """

    def __init__(self, prep_buf: np.ndarray, window: np.ndarray,
                 mel_fb: np.ndarray, n_fft: int, hop: int,
                 max_samples: int):
        self._lib = _load()
        if self._lib is None:
            raise RuntimeError("native libsirdsp not built")
        if n_fft & (n_fft - 1):
            raise ValueError("native streamer needs a power-of-two n_fft")
        self.prep_buf = prep_buf  # shared with the caller
        self.window = np.ascontiguousarray(window, np.float32)
        self.mel_fb = np.ascontiguousarray(mel_fb, np.float32)
        self.n_fft, self.hop = int(n_fft), int(hop)
        self.n_mels = int(self.mel_fb.shape[1])
        self.max_samples = int(max_samples)
        self.cap_frames = 1 + self.max_samples // self.hop
        self.mel = np.zeros((self.cap_frames, self.n_mels), np.float32)
        self.state = np.zeros(3, np.int64)  # n, left_filled, frames_done
        for name, arr in (("prep_buf", self.prep_buf),
                          ("window", self.window), ("mel_fb", self.mel_fb)):
            if arr.dtype != np.float32 or not arr.flags.c_contiguous:
                raise ValueError(f"{name} must be C-contiguous float32")
        # prebound raw pointers + bound C functions: this is the per-chunk
        # serving hot path, so per-call ctypes marshalling is kept to the
        # chunk pointer alone (all other operands are fixed buffers)
        self._feed_c = self._lib.sirdsp_stream_feed
        self._finalize_c = self._lib.sirdsp_stream_finalize
        self._p_state = self.state.ctypes.data
        self._p_prep = self.prep_buf.ctypes.data
        self._p_mel = self.mel.ctypes.data
        self._p_win = self.window.ctypes.data
        self._p_fb = self.mel_fb.ctypes.data

    def reset(self) -> None:
        self.state[:] = 0

    def feed(self, chunk: np.ndarray) -> int:
        if (not isinstance(chunk, np.ndarray) or chunk.dtype != np.float32
                or not chunk.flags.c_contiguous):
            chunk = np.ascontiguousarray(chunk, np.float32)
        done = self._feed_c(
            self._p_state, self._p_prep, self._p_mel, chunk.ctypes.data,
            chunk.size, self._p_win, self._p_fb, self.n_fft, self.hop,
            self.n_mels, self.max_samples, self.cap_frames)
        if done < 0:
            raise RuntimeError(f"sirdsp_stream_feed failed ({done})")
        return done

    def finalize(self) -> int:
        total = self._finalize_c(
            self._p_state, self._p_prep, self._p_mel, self._p_win,
            self._p_fb, self.n_fft, self.hop, self.n_mels, self.cap_frames)
        if total < 0:
            raise RuntimeError(f"sirdsp_stream_finalize failed ({total})")
        return total


def mean_abs(chunk: np.ndarray) -> float:
    """Native mean-absolute energy (VAD hot op)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native libsirdsp not built")
    if (not isinstance(chunk, np.ndarray) or chunk.dtype != np.float32
            or not chunk.flags.c_contiguous):
        chunk = np.ascontiguousarray(chunk, np.float32)
    return lib.sirdsp_mean_abs(chunk.ctypes.data, chunk.size)
