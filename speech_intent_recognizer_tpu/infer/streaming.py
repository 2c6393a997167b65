"""Streaming batch-1 inference: chunked incremental log-mel + classifier.

The reference's live demo records a whole utterance, then runs the full
feature+forward pipeline on it (``scripts/testing.py:104-130``), paying the
entire feature cost at end-of-speech.  Here the front-end is *incremental*:
as audio chunks arrive, every newly-completed STFT frame is pushed through
the same windowed-DFT -> mel -> dB math as training (bit-identical to the
offline front-end), with running mean/variance accumulators for the
per-utterance normalization.  At end-of-utterance only the tail reflect
padding, an O(1) normalization and the 25-step classifier remain — the p50
end-to-end latency the benchmark measures.

``partial_result()`` classifies the frames seen so far (normalized with the
running statistics), giving early hypotheses mid-utterance.

Frame blocks are processed through two fixed jit shapes (a steady-state
block and a finalize block) so the streaming path never recompiles.
"""

from __future__ import annotations

from collections.abc import Mapping
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.evaluation.metrics import top_k_predictions
from speech_intent_recognizer_tpu.infer.vad import EnergyVAD
from speech_intent_recognizer_tpu.ops.frontend_jax import (
    FrontendParams, make_frontend_params)

_BLOCK = 16  # frames per steady-state jit call


def golden_hann(n_fft: int, audio_cfg: AudioConfig) -> np.ndarray:
    """The (possibly center-padded) hann window the DFT matrices fold in —
    identical construction to ``make_frontend_params``."""
    from speech_intent_recognizer_tpu.ops import frontend_numpy as golden

    window = golden.hann_window(audio_cfg.win_length)
    if audio_cfg.win_length < n_fft:
        lpad = (n_fft - audio_cfg.win_length) // 2
        window = np.pad(window,
                        (lpad, n_fft - audio_cfg.win_length - lpad))
    return window


@partial(jax.jit, static_argnames=("n_fft",))
def _mel_db_frames(frames, dft_cos, dft_sin, mel_fb, n_fft):
    """(F, n_fft) windowed-signal frames -> (F, n_mels) dB-mel."""
    c = jnp.dot(frames, dft_cos, precision=jax.lax.Precision.HIGHEST)
    s = jnp.dot(frames, dft_sin, precision=jax.lax.Precision.HIGHEST)
    mel = jnp.dot(c * c + s * s, mel_fb,
                  precision=jax.lax.Precision.HIGHEST)
    return 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))


class StreamingFeaturizer:
    """Incremental torchaudio-semantics log-mel over a growing signal.

    ``mode`` selects where the per-chunk frame math runs:

    * ``"host"`` (default) — NumPy matmuls against the same windowed-DFT
      matrices.  A chunk contributes ~2 frames = ~2 MFLOP, microseconds on
      any CPU, and the accelerator sees **zero** traffic until
      end-of-utterance — the right trade for many concurrent sessions or a
      high-RTT device link.
    * ``"device"`` — jitted frame blocks on the accelerator; useful when the
      host is the bottleneck.
    * ``"native"`` — the C++ hot loop in ``native/sirdsp.cpp``
      (window+rFFT+mel+dB per frame, state in shared NumPy buffers) — same
      features, a fraction of the per-chunk host cost; this is what raises
      the concurrent-session ceiling on a serving host.  Falls back to
      ``"host"`` when the library isn't built.
    * ``"auto"`` — ``"native"`` when available, else ``"host"``.

    All modes produce identical features (tested).
    """

    def __init__(self, params: Optional[FrontendParams] = None,
                 audio_cfg: Optional[AudioConfig] = None,
                 mode: str = "host", host_dtype=np.float32):
        self.audio_cfg = audio_cfg or AudioConfig()
        self.params = params or make_frontend_params(self.audio_cfg)
        if self.params.frontend != "torchaudio":
            raise ValueError("streaming supports the unified torchaudio "
                             "front-end")
        if mode not in ("host", "device", "native", "auto"):
            raise ValueError(f"unknown streaming mode {mode!r}")
        if mode in ("native", "auto"):
            mode = "native" if self._native_usable() else "host"
        self.mode = mode
        self.n_fft = self.params.n_fft
        self.hop = self.params.hop_length
        self.pad = self.n_fft // 2
        if mode == "host":
            # Host frames go through rFFT, not the windowed-DFT matmuls the
            # device path uses: a 2-frame chunk against the (n_fft, n_freqs)
            # cos/sin matrices is memory-bound (re-reads ~4 MB of matrix per
            # chunk, ~6 ms on the 1-core host) while an rfft of 2 windowed
            # frames is microseconds.  Numerically the same transform.
            # fp32 by default; fp64 stays available (host_dtype=np.float64)
            # for the golden parity tests.
            self._host_dtype = np.dtype(host_dtype)
            win = golden_hann(self.params.n_fft, self.audio_cfg)
            self._np_win = win.astype(self._host_dtype)
            self._np_fb = np.asarray(self.params.mel_fb, self._host_dtype)
        # prepared-signal buffer: [left reflect pad | raw signal], written
        # incrementally so feed() never reallocates or copies the history
        self._prep_buf = np.zeros(self.pad + self.audio_cfg.max_samples,
                                  np.float32)
        if self.mode == "native":
            from speech_intent_recognizer_tpu.data.native import (
                NativeStreamer)

            self._native = NativeStreamer(
                self._prep_buf, golden_hann(self.n_fft, self.audio_cfg),
                np.asarray(self.params.mel_fb), self.n_fft, self.hop,
                self.audio_cfg.max_samples)
        self.reset()

    def _native_usable(self) -> bool:
        from speech_intent_recognizer_tpu.data import native

        return native.available() and (self.params.n_fft
                                       & (self.params.n_fft - 1)) == 0

    def _sync_native_state(self) -> None:
        st = self._native.state
        self._n = int(st[0])
        self._left_filled = int(st[1])
        self._frames_done = int(st[2])

    def reset(self) -> None:
        self._n = 0  # raw samples seen so far (capped)
        self._left_filled = 0  # how much of the left reflect pad is final
        self._prep_buf[: self.pad] = 0.0
        self._frames_done = 0  # frames already emitted
        self._mel_frames: list[np.ndarray] = []
        self._sum = 0.0
        self._sumsq = 0.0
        self._count = 0
        if self.mode == "native":
            self._native.reset()

    # ------------------------------------------------------------- internals

    @property
    def _signal(self) -> np.ndarray:
        """Raw samples seen so far (view into the prepared buffer)."""
        return self._prep_buf[self.pad : self.pad + self._n]

    def _prepared(self, upto: Optional[int] = None) -> np.ndarray:
        """Left-reflect-padded signal (tail reflect added by finalize)."""
        self._fill_left_pad()
        n = self._n if upto is None else min(upto, self._n)
        if n < 2:
            return self._prep_buf[self.pad : self.pad + n]
        left = min(self.pad, n - 1)
        return self._prep_buf[self.pad - left : self.pad + n]

    def _fill_left_pad(self) -> None:
        """Mirror sig[1 : pad+1] into the pad region as samples arrive."""
        if self._left_filled >= self.pad:
            return
        avail = min(self.pad, self._n - 1)
        if avail > self._left_filled:
            src = self._prep_buf[self.pad + 1 + self._left_filled :
                                 self.pad + 1 + avail]
            self._prep_buf[self.pad - avail :
                           self.pad - self._left_filled] = src[::-1]
            self._left_filled = avail

    def _emit(self, frames_np: np.ndarray) -> None:
        if frames_np.shape[0] == 0:
            return
        if self.mode == "host":
            f = frames_np.astype(self._host_dtype) * self._np_win
            spec = np.fft.rfft(f, axis=1)
            power = (spec.real * spec.real + spec.imag * spec.imag
                     ).astype(self._host_dtype)
            mel = power @ self._np_fb
            out = (10.0 * np.log10(np.maximum(mel, 1e-10),
                                   dtype=np.float32)).astype(np.float32)
            self._mel_frames.append(out)
            self._sum += float(out.sum())
            self._sumsq += float((out.astype(np.float64) ** 2).sum())
            self._count += out.size
            self._frames_done += frames_np.shape[0]
            return
        n_blocks = -(-frames_np.shape[0] // _BLOCK)
        for b in range(n_blocks):
            block = frames_np[b * _BLOCK : (b + 1) * _BLOCK]
            pad = _BLOCK - block.shape[0]
            padded = (np.concatenate([block,
                                      np.zeros((pad, self.n_fft), np.float32)])
                      if pad else block)
            out = np.asarray(_mel_db_frames(
                jnp.asarray(padded), self.params.dft_cos,
                self.params.dft_sin, self.params.mel_fb, self.n_fft))
            out = out[: block.shape[0]]
            self._mel_frames.append(out)
            self._sum += float(out.sum())
            self._sumsq += float((out.astype(np.float64) ** 2).sum())
            self._count += out.size
        self._frames_done += frames_np.shape[0]

    def _window_frames(self, prepared: np.ndarray, start_frame: int,
                       n_frames: int) -> np.ndarray:
        # the hann window is folded into the DFT matrices; frames are raw.
        # Zero-copy strided view — BLAS handles the strided matmul input.
        s0 = start_frame * self.hop
        end = s0 + (n_frames - 1) * self.hop + self.n_fft
        return np.lib.stride_tricks.sliding_window_view(
            prepared[s0:end], self.n_fft)[:: self.hop]

    # ------------------------------------------------------------------ API

    def feed(self, chunk: np.ndarray) -> int:
        """Append samples; compute all newly-complete frames.

        A frame t needs ``t*hop + n_fft`` prepared samples, i.e.
        ``t*hop + pad`` raw samples (prepared = pad + raw so far).
        Returns the number of frames emitted so far.
        """
        if self.mode == "native":
            done = self._native.feed(chunk)
            self._sync_native_state()
            return done
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        space = self.audio_cfg.max_samples - self._n  # reference 5 s cap
        if space > 0 and chunk.size > 0:
            take = chunk[:space]
            self._prep_buf[self.pad + self._n :
                           self.pad + self._n + take.size] = take
            self._n += take.size
        n = self._n
        self._fill_left_pad()
        # complete frames available without tail padding
        avail = max(0, (n + self.pad - self.n_fft) // self.hop + 1)
        total_frames = 1 + n // self.hop  # final count incl. tail-padded
        avail = min(avail, total_frames)
        new = avail - self._frames_done
        if new > 0 and n > self.pad:
            # n > pad guarantees the left reflect region is fully final, so
            # frame t starts at prep_buf[t*hop] exactly
            frames = self._window_frames(self._prep_buf, self._frames_done,
                                         new)
            self._emit(frames)
        return self._frames_done

    def _stack_mel(self) -> np.ndarray:
        if self.mode == "native":
            return self._native.mel[: self._frames_done]
        if not self._mel_frames:
            return np.zeros((0, self.params.n_mels), np.float32)
        return np.concatenate(self._mel_frames, axis=0)

    def _normalize(self, mel: np.ndarray) -> np.ndarray:
        cnt = mel.size
        if cnt < 2:
            return mel
        mean = mel.sum() / cnt
        var = (np.square(mel.astype(np.float64)).sum() - cnt * mean ** 2)
        var = max(var / (cnt - 1), 0.0)
        return ((mel - mean) / (np.sqrt(var) + self.params.norm_eps)
                ).astype(np.float32)

    def partial_features(self) -> np.ndarray:
        """(n_mels, target_len) normalized features for frames so far."""
        mel = self._stack_mel()
        mel = self._normalize(mel)
        return self._pad_target(mel)

    def _pad_target(self, mel: np.ndarray) -> np.ndarray:
        t_target = self.params.target_length
        out = np.zeros((self.params.n_mels, t_target), np.float32)
        t = min(mel.shape[0], t_target)
        out[:, :t] = mel[:t].T
        return out

    def finalize(self) -> np.ndarray:
        """Complete the utterance: tail reflect pad, remaining frames,
        per-utterance normalization, pad/trim — bit-faithful to the offline
        front-end."""
        if self.mode == "native":
            total = self._native.finalize()
            self._sync_native_state()
            mel = self._normalize(self._native.mel[:total])
            return self._pad_target(mel)
        n = len(self._signal)
        total_frames = 1 + n // self.hop
        remaining = total_frames - self._frames_done
        if remaining > 0 and n >= 2:
            sig = self._signal
            tail_idx = np.clip(n - 2 - np.arange(self.pad), 0, n - 1)
            prepared = np.concatenate([self._prepared(), sig[tail_idx]])
            need = (total_frames - 1) * self.hop + self.n_fft
            if len(prepared) < need:
                prepared = np.pad(prepared, (0, need - len(prepared)))
            frames = self._window_frames(prepared, self._frames_done,
                                         remaining)
            self._emit(frames)
        mel = self._normalize(self._stack_mel())
        return self._pad_target(mel)


class PendingResult(Mapping):
    """Asynchronously-completing classification result.

    Wraps the device probabilities array while the accelerator is still
    computing (JAX dispatch is async); materialization happens on first
    access.  ``ready()`` polls without blocking; ``resolve()`` blocks.  In a
    multi-session server this lets the event loop keep feeding OTHER
    sessions' audio during one session's end-of-utterance device call +
    result round trip — the round trip is the dominant per-utterance cost
    when the accelerator is remote.

    Implements :class:`collections.abc.Mapping`, so sync call sites that
    treat results as plain dicts (``r["confidence"]``, ``r.items()``,
    ``"confidence" in r``, ``dict(r)``, ``r.get(key, default)``) keep
    working unchanged when ``async_results`` is enabled.
    """

    def __init__(self, probs, inv_label_map):
        self._probs = probs  # live jax array
        self._row = None  # set by BatchFinalizer: row into a batched call
        self._inv = inv_label_map
        self._dict: Optional[Dict] = None

    def _ensure_dispatched(self) -> None:
        """Hook for deferred results (see :class:`BatchFinalizer`): make
        ``self._probs`` a live device array.  Base results are dispatched
        at construction — no-op."""

    def ready(self) -> bool:
        if self._dict is not None:
            return True
        try:
            return self._probs is not None and self._probs.is_ready()
        except AttributeError:  # older jax: no is_ready
            return True

    def resolve(self) -> Dict:
        """Materialize (blocking) and return the result dict."""
        if self._dict is None:
            self._ensure_dispatched()
            probs = np.asarray(self._probs)
            if self._row is not None:
                probs = probs[self._row]
            pred = int(np.argmax(probs))
            self._dict = {
                "predicted_label": self._inv.get(pred, "Unknown"),
                "confidence": float(probs[pred]),
                "top_predictions": top_k_predictions(probs, self._inv, 3),
            }
            self._probs = None
        return self._dict

    def get(self, key=None, default=None):
        """dict.get-compatible; legacy zero-arg form returns the full dict."""
        d = self.resolve()
        return d if key is None else d.get(key, default)

    def __getitem__(self, key):
        return self.resolve()[key]

    def __iter__(self):
        return iter(self.resolve())

    def __len__(self):
        return len(self.resolve())

    @staticmethod
    def get_all(results: list) -> list:
        """Materialize many pending results in ONE batched device fetch.

        ``jax.device_get`` on the whole list amortizes the per-transfer
        link round trip — the difference between N round trips and one
        when the accelerator is remote.  Returns the resolved dicts.
        """
        live = [r for r in results if r._dict is None]
        if live:
            for r in live:
                r._ensure_dispatched()
            values = jax.device_get([r._probs for r in live])
            for r, probs in zip(live, values):
                probs = np.asarray(probs)
                if r._row is not None:
                    probs = probs[r._row]
                pred = int(np.argmax(probs))
                r._dict = {
                    "predicted_label": r._inv.get(pred, "Unknown"),
                    "confidence": float(probs[pred]),
                    "top_predictions": top_k_predictions(probs, r._inv, 3),
                }
                r._probs = None
        return [r.resolve() for r in results]


class _DeferredFinalize(PendingResult):
    """A finalize result whose device call has not been dispatched yet —
    it sits in a :class:`BatchFinalizer` queue until the next flush."""

    def __init__(self, batcher: "BatchFinalizer", inv_label_map):
        super().__init__(None, inv_label_map)
        self._batcher = batcher

    def _ensure_dispatched(self) -> None:
        if self._probs is None and self._dict is None:
            self._batcher.flush()


class BatchFinalizer:
    """Cross-session batching of end-of-utterance device calls.

    At serving concurrency, many sessions hit end-of-speech within the same
    event-loop tick, and the per-DISPATCH cost of the batch-1 fused
    finalize (not its compute) is what bounds capacity — measured at
    ~102-124 dispatches/s through the remote accelerator link
    (BENCH_NOTES.md).  Queue the finalize operands instead and run ONE
    batched program per flush: N utterances cost one dispatch.

    ``submit`` returns immediately with a deferred :class:`PendingResult`;
    the batch is dispatched when ``max_batch`` requests accumulate, on
    ``flush()`` (the server calls it every drain tick), or lazily when any
    deferred result is forced.  Queued batches are padded to the next
    power of two so the jitted program compiles for at most
    log2(max_batch)+1 shapes.

    The batched program is the exact vectorization of
    ``StreamingRecognizer._build_fused_finalize`` (identity-tested against
    it in ``tests/test_infer.py``).
    """

    def __init__(self, predictor, tail_max: int = 4, max_batch: int = 16):
        self.predictor = predictor
        self.p = predictor.frontend_params
        self.tail_max = tail_max
        self.max_batch = max_batch
        self._queue: list = []
        self._fn = None

    def _build(self):
        model = self.predictor.model
        p = self.p
        tmax, n_mels, eps = p.target_length, p.n_mels, p.norm_eps
        k = self.tail_max
        hi = jax.lax.Precision.HIGHEST

        @jax.jit
        def run(variables, mel_bufs, counts, tails, n_tails):
            # tails (N, K, n_fft) -> dB-mel rows for the masked tail frames
            c = jnp.dot(tails, p.dft_cos, precision=hi)
            s = jnp.dot(tails, p.dft_sin, precision=hi)
            mel = jnp.dot(c * c + s * s, p.mel_fb, precision=hi)
            tail_db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

            rows = counts[:, None] + jnp.arange(k)[None, :]  # (N, K)
            writable = jnp.logical_and(
                jnp.arange(k)[None, :] < n_tails[:, None], rows < tmax)
            onehot = jax.nn.one_hot(jnp.clip(rows, 0, tmax - 1), tmax,
                                    dtype=mel_bufs.dtype)  # (N, K, tmax)
            mel_bufs = mel_bufs + jnp.einsum(
                "nkt,nkm->ntm", onehot * writable[..., None], tail_db)

            total = counts + n_tails  # (N,)
            rmask = (jnp.arange(tmax)[None, :]
                     < total[:, None])[..., None].astype(jnp.float32)
            cnt = (total * n_mels).astype(jnp.float32)
            mean = (jnp.sum(mel_bufs * rmask, axis=(1, 2))
                    / jnp.maximum(cnt, 1.0))
            var = (jnp.sum(jnp.square(mel_bufs - mean[:, None, None])
                           * rmask, axis=(1, 2))
                   / jnp.maximum(cnt - 1.0, 1.0))
            feats = ((mel_bufs - mean[:, None, None])
                     / (jnp.sqrt(var)[:, None, None] + eps)) * rmask
            logits = model.apply(variables, feats.transpose(0, 2, 1),
                                 train=False)
            return jax.nn.softmax(logits, axis=-1)

        return run

    def submit(self, mel_buf, count, tail, n_tail,
               inv_label_map) -> PendingResult:
        """Queue one finalize; returns a deferred result immediately."""
        r = _DeferredFinalize(self, inv_label_map)
        self._queue.append((r, mel_buf, int(count), tail, int(n_tail)))
        if len(self._queue) >= self.max_batch:
            self.flush()
        return r

    def flush(self) -> int:
        """Dispatch every queued finalize as ONE device call."""
        if not self._queue:
            return 0
        q, self._queue = self._queue, []
        n = len(q)
        bucket = 1
        while bucket < n:
            bucket <<= 1
        p = self.p
        mel = np.zeros((bucket, p.target_length, p.n_mels), np.float32)
        counts = np.zeros(bucket, np.int32)
        tails = np.zeros((bucket, self.tail_max, p.n_fft), np.float32)
        n_tails = np.zeros(bucket, np.int32)
        for i, (_, m, c, t, nt) in enumerate(q):
            mel[i], counts[i], tails[i], n_tails[i] = m, c, t, nt
        if self._fn is None:
            cache = getattr(self.predictor, "_stream_jit_cache", None)
            if cache is None:
                cache = self.predictor._stream_jit_cache = {}
            if "batched_finalize" not in cache:
                cache["batched_finalize"] = self._build()
            self._fn = cache["batched_finalize"]
        probs = self._fn(self.predictor.variables, jnp.asarray(mel),
                         jnp.asarray(counts), jnp.asarray(tails),
                         jnp.asarray(n_tails))
        for i, (r, *_rest) in enumerate(q):
            r._probs = probs
            r._row = i
        return n


class StreamingRecognizer:
    """VAD-gated streaming intent recognition session.

    Feed audio chunks (float32, model sample rate); features are computed
    incrementally *while speech is still being captured*; on end-of-speech
    (silence >= ``silence_limit``) only finalize + classify run.

    ``async_results=True`` makes ``feed``/``flush`` return a
    :class:`PendingResult` immediately after *dispatching* the finalize
    device call instead of blocking on its value — the serving mode.
    """

    def __init__(self, predictor, chunk_size: int = 1024,
                 threshold: float = 0.01, silence_limit: float = 1.0,
                 prior_recording: float = 0.5, async_results: bool = False,
                 featurizer_mode: str = "auto",
                 batch_finalizer: Optional[BatchFinalizer] = None):
        self.async_results = async_results
        self.batch_finalizer = batch_finalizer
        self.predictor = predictor
        self.audio_cfg = predictor.audio_cfg
        self.chunk_size = chunk_size
        self.vad = EnergyVAD(threshold)
        self.silence_limit = silence_limit
        self._prior_max = max(1, int(prior_recording
                                     * self.audio_cfg.sample_rate
                                     / chunk_size))
        self._prior: list[np.ndarray] = []
        self._featurizer = StreamingFeaturizer(
            audio_cfg=predictor.audio_cfg, mode=featurizer_mode)
        self._classify = None
        self._fused = None
        self._recording = False
        self._silence_chunks = 0

    _TAIL_MAX = 4  # remaining frames at finalize is at most ~2

    def _build_classifier(self):
        model = self.predictor.model

        @jax.jit
        def classify(variables, feats):
            logits = model.apply(variables, feats[None], train=False)
            return jax.nn.softmax(logits, axis=-1)[0]

        return classify

    def _build_fused_finalize(self):
        """End-of-utterance in ONE device call: tail-frame DFT+mel+dB,
        masked per-utterance normalization, pad, classify.  Collapses the
        2-3 host->device round trips of the generic finalize path — the
        dominant cost of end-of-speech latency at batch 1."""
        model = self.predictor.model
        p = self._featurizer.params
        tmax = p.target_length
        n_mels = p.n_mels
        eps = p.norm_eps

        @jax.jit
        def run(variables, mel_buf, count, tail_frames, n_tail):
            # mel rows for the (masked) tail frames
            c = jnp.dot(tail_frames, p.dft_cos,
                        precision=jax.lax.Precision.HIGHEST)
            s = jnp.dot(tail_frames, p.dft_sin,
                        precision=jax.lax.Precision.HIGHEST)
            mel = jnp.dot(c * c + s * s, p.mel_fb,
                          precision=jax.lax.Precision.HIGHEST)
            tail_db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))

            rows = count + jnp.arange(self._TAIL_MAX)
            writable = jnp.logical_and(jnp.arange(self._TAIL_MAX) < n_tail,
                                       rows < tmax)
            mel_buf = mel_buf.at[jnp.clip(rows, 0, tmax - 1)].add(
                jnp.where(writable[:, None], tail_db, 0.0))

            total = count + n_tail
            rmask = (jnp.arange(tmax) < total)[:, None].astype(jnp.float32)
            cnt = (total * n_mels).astype(jnp.float32)
            mean = jnp.sum(mel_buf * rmask) / jnp.maximum(cnt, 1.0)
            var = (jnp.sum(jnp.square(mel_buf - mean) * rmask)
                   / jnp.maximum(cnt - 1.0, 1.0))
            feats = ((mel_buf - mean) / (jnp.sqrt(var) + eps)) * rmask
            logits = model.apply(variables, feats.T[None], train=False)
            return jax.nn.softmax(logits, axis=-1)[0]

        return run

    def _fused_finalize(self) -> dict:
        """Run end-of-utterance via the single-call fast path."""
        fz = self._featurizer
        if self._fused is None:
            self._fused = self._shared_jit("fused_finalize",
                                           self._build_fused_finalize)
        tmax = fz.params.target_length
        stacked = fz._stack_mel()
        count = min(stacked.shape[0], tmax)
        mel_buf = np.zeros((tmax, fz.params.n_mels), np.float32)
        mel_buf[:count] = stacked[:count]

        # tail frames (host-side slicing only; no device work)
        n = len(fz._signal)
        total_frames = min(1 + n // fz.hop, tmax)
        remaining = max(total_frames - fz._frames_done, 0)
        remaining = min(remaining, self._TAIL_MAX)
        tail = np.zeros((self._TAIL_MAX, fz.n_fft), np.float32)
        if remaining > 0 and n >= 2:
            sig = fz._signal
            tail_idx = np.clip(n - 2 - np.arange(fz.pad), 0, n - 1)
            prepared = np.concatenate([fz._prepared(), sig[tail_idx]])
            need = (total_frames - 1) * fz.hop + fz.n_fft
            if len(prepared) < need:
                prepared = np.pad(prepared, (0, need - len(prepared)))
            for i in range(remaining):
                s0 = (fz._frames_done + i) * fz.hop
                tail[i] = prepared[s0 : s0 + fz.n_fft]

        if self.batch_finalizer is not None:
            pending = self.batch_finalizer.submit(
                mel_buf, count, tail, remaining,
                self.predictor.inv_label_map)
            return pending if self.async_results else pending.resolve()
        probs_dev = self._fused(
            self.predictor.variables, jnp.asarray(mel_buf),
            jnp.int32(count), jnp.asarray(tail), jnp.int32(remaining))
        pending = PendingResult(probs_dev, self.predictor.inv_label_map)
        return pending if self.async_results else pending.get()

    def _shared_jit(self, key: str, builder):
        """Compiled functions are cached on the predictor so that many
        concurrent streaming sessions (serving) share one compilation."""
        cache = getattr(self.predictor, "_stream_jit_cache", None)
        if cache is None:
            cache = {}
            self.predictor._stream_jit_cache = cache
        if key not in cache:
            cache[key] = builder()
        return cache[key]

    def _run_classifier(self, feats: np.ndarray) -> dict:
        if self._classify is None:
            self._classify = self._shared_jit("classify",
                                              self._build_classifier)
        probs = np.asarray(self._classify(self.predictor.variables,
                                          jnp.asarray(feats)))
        pred = int(np.argmax(probs))
        inv = self.predictor.inv_label_map
        return {
            "predicted_label": inv.get(pred, "Unknown"),
            "confidence": float(probs[pred]),
            "top_predictions": top_k_predictions(probs, inv, 3),
        }

    @property
    def recording(self) -> bool:
        return self._recording

    def feed(self, chunk: np.ndarray) -> Optional[Dict]:
        """Feed one chunk; returns a result dict at end-of-utterance."""
        chunk = np.asarray(chunk, np.float32).reshape(-1)
        speech = self.vad.is_speech(chunk)

        if not self._recording:
            self._prior.append(chunk)
            if len(self._prior) > self._prior_max:
                self._prior.pop(0)
            if speech:
                self._recording = True
                self._silence_chunks = 0
                self._featurizer.reset()
                for c in self._prior:  # pre-roll goes through the featurizer
                    self._featurizer.feed(c)
                self._prior = []
            return None

        self._featurizer.feed(chunk)
        self._silence_chunks = 0 if speech else self._silence_chunks + 1
        silence_s = (self._silence_chunks * self.chunk_size
                     / self.audio_cfg.sample_rate)
        if silence_s >= self.silence_limit:
            result = self._fused_finalize()
            self._recording = False
            self._featurizer.reset()
            return result
        return None

    def partial_result(self) -> Optional[Dict]:
        """Early hypothesis from the frames seen so far (mid-utterance)."""
        if not self._recording:
            return None
        return self._run_classifier(self._featurizer.partial_features())

    def flush(self) -> Optional[Dict]:
        if not self._recording:
            return None
        result = self._fused_finalize()
        self._recording = False
        self._featurizer.reset()
        return result
