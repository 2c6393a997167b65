"""Feature cache: precomputed log-mel features as flat array records.

TPU-native replacement for the reference's pickled per-file torch dicts
(``scripts/precompute_features.py:104-143`` writes
``{path: {'features': tensor, 'label': str}}`` to ``*_features.pt``): here a
cache is a single ``.npz`` of contiguous arrays — ``features (N, n_mels, T)``
+ ``labels (N,)`` — plus a JSON sidecar with paths/config.  The whole cache
is ``device_put`` once and the training loop never touches the host again.

Feature extraction itself is the batched device front-end
(:func:`ops.frontend_jax.log_mel_frontend`): the host only decodes audio
(native C++ path when built) and fills fixed-size buffers; framing, DFT, mel
projection, dB and normalization run on the TPU in large batches — this is
where the >=10x-over-librosa throughput target is won.

A compat reader for the reference's ``.pt`` caches is provided so existing
caches migrate without recompute.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Dict, Iterable, Optional, Tuple

import numpy as np

from speech_intent_recognizer_tpu.config.schema import AudioConfig
from speech_intent_recognizer_tpu.data.audio_io import (load_audio,
                                                         load_audio_int16)
from speech_intent_recognizer_tpu.data.manifest import Manifest

logger = logging.getLogger(__name__)

CACHE_VERSION = 1


def cache_path_for(csv_path: str, cache_dir: str) -> str:
    stem = os.path.basename(csv_path)
    if stem.endswith(".csv"):
        stem = stem[:-4]
    return os.path.join(cache_dir, f"{stem}_features.npz")


def _decode_batch(paths, audio_cfg: AudioConfig, wire_dtype=np.float32):
    """Host decode into a fixed (B, max_samples) buffer + lengths.

    ``wire_dtype=np.int16`` is the half-byte staging format: bit-identical
    features for 16-bit PCM sources, <=2**-16 full-scale quantization for
    float/MP3 sources (see :func:`data.audio_io.load_audio_int16`).
    """
    max_samples = audio_cfg.max_samples
    buf = np.zeros((len(paths), max_samples), wire_dtype)
    lengths = np.zeros(len(paths), np.int32)
    ok = np.ones(len(paths), bool)
    int_wire = np.dtype(wire_dtype) == np.int16
    for i, p in enumerate(paths):
        try:
            if int_wire:
                x, _ = load_audio_int16(
                    p, target_sample_rate=audio_cfg.sample_rate)
            else:
                x, _ = load_audio(p, target_sample_rate=audio_cfg.sample_rate)
            n = min(len(x), max_samples)
            buf[i, :n] = x[:n]
            lengths[i] = n
            if n == 0:
                ok[i] = False
        except Exception as e:
            logger.error("error processing %s: %s", p, e)
            ok[i] = False
    return buf, lengths, ok


def precompute_features(
    manifest: Manifest,
    label_map: Dict[str, int],
    audio_cfg: Optional[AudioConfig] = None,
    batch_size: int = 64,
    progress: bool = True,
    wire_dtype: str = "int16_packed",
    fetch_dtype: str = "int16",
    features_out: Optional[str] = None,
    timings: Optional[dict] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """Compute features for a manifest on device.

    Returns (features (N, n_mels, T) f32, labels (N,) i32, ok mask, paths).
    Failed decodes keep the reference's zero-feature fallback semantics
    (``dataset.py:123,158``) and are flagged in the mask.

    The per-batch loop is a three-stage software pipeline: host decode runs
    on a worker thread (:class:`data.prefetch.BackgroundLoader`), the device
    program for batch k+1 is dispatched BEFORE batch k's features are
    fetched (JAX dispatch is async, so k's device->host readback overlaps
    k+1's host->device staging + compute), and the int16 wire format halves
    the staged bytes — the dominant cost through a remote/tunneled link;
    measured decomposition in ``bench_precompute.py``.

    Args:
      wire_dtype: "int16_packed" (default) stages only the REAL samples —
        each batch's waveforms concatenate into one flat int16 buffer
        (capacity rounded up to a 1/16-of-dense ladder so jit reuses a few
        programs) and a single device gather rebuilds the padded (B, L)
        layout, so the wire carries ~lengths/max_samples of the dense
        bytes; values are identical to "int16".  "int16" stages the dense
        zero-padded buffer at half float32's bytes.  Both int16 forms are
        bit-identical to "float32" for 16-bit PCM sources and within
        2**-16 full scale otherwise; "float32" is exact everywhere.
      fetch_dtype: "int16" (default) quantizes the finished features ON
        DEVICE with a per-utterance scale (max |x| / 32767) before the
        device->host readback, halving the return wire bytes — the
        co-dominant cost after int16 staging (bench_precompute.py).  The
        cache stays float32 (dequantized host-side); the absolute error
        is <= scale/2 ~ 1.5e-4 for normalized log-mel features, an order
        of magnitude under the fused-kernel parity gate (2e-3 vs torch).
        "float32" keeps the readback bit-exact.
      features_out: optional ``.npy`` path — features stream straight into
        an ``np.lib.format.open_memmap``, so serialization overlaps the
        compute loop and the (N, n_mels, T) array never occupies RAM; the
        returned features array is the flushed memmap.
      timings: optional dict, filled with per-stage seconds
        (decode / dispatch / fetch) for floor attribution.
    """
    import time as _time

    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        default_backend_choice, log_mel_frontend, make_frontend_params)

    audio_cfg = audio_cfg or AudioConfig()
    params = make_frontend_params(audio_cfg)
    # resolve "auto" EAGERLY: the Pallas-usability probe cannot run inside
    # the jitted featurize below (pallas primitives have no eager-eval
    # rule mid-trace; see frontend_jax.pallas_usable)
    fe_backend = default_backend_choice(params)
    if wire_dtype not in ("int16_packed", "int16", "float32"):
        raise ValueError(f"unknown wire_dtype {wire_dtype!r}")
    if fetch_dtype not in ("int16", "float32"):
        raise ValueError(f"unknown fetch_dtype {fetch_dtype!r}")
    packed = wire_dtype == "int16_packed"
    int_wire = wire_dtype != "float32"
    quant_fetch = fetch_dtype == "int16"

    def _maybe_quant(f):
        """Per-utterance int16 quantization of (B, n_mels, T) features —
        runs on device so the readback wire carries half the bytes."""
        if not quant_fetch:
            return f
        m = jnp.max(jnp.abs(f), axis=(1, 2))
        scale = jnp.maximum(m, 1e-12) * (1.0 / 32767.0)
        q = jnp.round(f * (1.0 / scale)[:, None, None]).astype(jnp.int16)
        return q, scale
    n = len(manifest)
    shape = (n, audio_cfg.n_mels, audio_cfg.mel_spec_length)
    if features_out is not None:
        os.makedirs(os.path.dirname(os.path.abspath(features_out)),
                    exist_ok=True)
        feats = np.lib.format.open_memmap(features_out, mode="w+",
                                          dtype=np.float32, shape=shape)
    else:
        feats = np.zeros(shape, np.float32)
    labels = np.asarray([label_map.get(l, 0) for l in manifest.labels],
                        np.int32)
    ok_all = np.ones(n, bool)
    t_decode = [0.0]

    from speech_intent_recognizer_tpu.data.prefetch import BackgroundLoader

    max_samples = audio_cfg.max_samples
    # packed capacities snap to this unit so jax.jit reuses a handful of
    # programs (one per distinct capacity) instead of one per batch
    pack_unit = max(1, (batch_size * max_samples) // 16)

    def produce():
        """Host decode on a worker thread — overlaps with device batches."""
        np_wire = np.int16 if int_wire else np.float32
        for start in range(0, n, batch_size):
            t0 = _time.perf_counter()
            chunk = manifest.paths[start : start + batch_size]
            buf, lengths, ok = _decode_batch(chunk, audio_cfg, np_wire)
            # pad the final chunk to the compiled batch size (one XLA program)
            if len(chunk) < batch_size:
                pad = batch_size - len(chunk)
                buf = np.concatenate([buf, np.zeros((pad, buf.shape[1]),
                                                    np_wire)])
                lengths = np.concatenate([lengths, np.ones(pad, np.int32)])
            if packed:
                # concatenate the real samples; device gather re-pads
                total = int(lengths.sum())
                cap = -(-max(total, 1) // pack_unit) * pack_unit
                flat = np.zeros(cap, np.int16)
                offsets = np.zeros(batch_size, np.int32)
                pos = 0
                for i in range(batch_size):
                    m = int(lengths[i])
                    offsets[i] = pos
                    flat[pos : pos + m] = buf[i, :m]
                    pos += m
                payload = (flat, offsets)
            else:
                payload = buf
            t_decode[0] += _time.perf_counter() - t0
            yield start, len(chunk), payload, lengths, ok

    iterator = BackgroundLoader(produce, capacity=2)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="precompute",
                            total=-(-n // batch_size))
        except ImportError:
            pass

    if packed:
        import jax

        @jax.jit  # re-specializes per distinct flat capacity (few, laddered)
        def _featurize(payload, lengths):
            flat, offsets = payload
            pos = jnp.arange(max_samples, dtype=jnp.int32)
            idx = offsets[:, None] + pos[None, :]
            valid = pos[None, :] < lengths[:, None]
            x = jnp.where(valid, flat[jnp.where(valid, idx, 0)], 0)
            x = x.astype(jnp.float32) * (1.0 / 32768.0)
            return _maybe_quant(log_mel_frontend(
                x, jnp.maximum(lengths, 1), params, backend=fe_backend))
    elif int_wire:
        import jax

        @jax.jit
        def _featurize(buf, lengths):
            x = buf.astype(jnp.float32) * (1.0 / 32768.0)
            return _maybe_quant(log_mel_frontend(x, lengths, params,
                                                 backend=fe_backend))
    else:
        def _featurize(buf, lengths):
            return _maybe_quant(log_mel_frontend(buf, lengths, params,
                                                 backend=fe_backend))

    t_dispatch = t_fetch = 0.0
    pending = None  # batch k-1, fetched only after k is dispatched

    def _drain(entry):
        """Fetch a finished batch's features into the output array."""
        nonlocal t_fetch
        start, n_chunk, ok, out_dev = entry
        t0 = _time.perf_counter()
        if quant_fetch:
            q, scale = out_dev
            out = (np.array(q)[:n_chunk].astype(np.float32)
                   * np.array(scale)[:n_chunk, None, None])
        else:
            out = np.array(out_dev)[:n_chunk]  # jax arrays are read-only
        t_fetch += _time.perf_counter() - t0
        out[~ok] = 0.0  # zero-feature fallback for failed decodes
        feats[start : start + n_chunk] = out
        ok_all[start : start + n_chunk] = ok

    for start, n_chunk, payload, lengths, ok in iterator:
        t0 = _time.perf_counter()
        if packed:
            flat, offsets = payload
            out_dev = _featurize((jnp.asarray(flat), jnp.asarray(offsets)),
                                 jnp.asarray(lengths))
        else:
            out_dev = _featurize(jnp.asarray(payload),
                                 jnp.asarray(np.maximum(lengths, 1)))
        t_dispatch += _time.perf_counter() - t0
        if pending is not None:
            _drain(pending)
        pending = (start, n_chunk, ok, out_dev)
    if pending is not None:
        _drain(pending)

    if features_out is not None:
        feats.flush()
    if timings is not None:
        timings.update(decode_s=t_decode[0], stage_dispatch_s=t_dispatch,
                       fetch_s=t_fetch, wire_dtype=wire_dtype,
                       fetch_dtype=fetch_dtype,
                       batches=-(-n // batch_size) if n else 0)
    return feats, labels, ok_all, list(manifest.paths)


def waveform_cache_path_for(csv_path: str, cache_dir: str) -> str:
    stem = os.path.basename(csv_path)
    if stem.endswith(".csv"):
        stem = stem[:-4]
    return os.path.join(cache_dir, f"{stem}_waveforms.npz")


def precompute_waveforms(
    manifest: Manifest,
    label_map: Dict[str, int],
    audio_cfg: Optional[AudioConfig] = None,
    progress: bool = True,
    waves_out: Optional[str] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, list]:
    """Decode a manifest into an int16 waveform cache for waveform-resident
    training (``data.train_on_waveforms``).

    Returns (waves (N, max_samples) int16, lengths (N,) i32, labels (N,)
    i32, ok mask, paths).  The int16 format is the same staging contract as
    :func:`precompute_features`'s wire: bit-exact for PCM16 sources.  At
    FSC scale the train split is ~3.7 GB — it lives in HBM whole, and the
    fused frontend featurizes each batch INSIDE the jitted train step, so
    waveform-domain augmentation (``ops/augment.py``, the reference's
    ``scripts/augment.py:98-135`` capability that its own pipeline never
    wired in) runs on device per epoch at ~zero cost.

    ``waves_out``: optional ``.npy`` path — waves stream into a memmap
    (the (N, max_samples) array never occupies host RAM).
    """
    audio_cfg = audio_cfg or AudioConfig()
    n = len(manifest)
    max_samples = audio_cfg.max_samples
    if waves_out is not None:
        os.makedirs(os.path.dirname(os.path.abspath(waves_out)),
                    exist_ok=True)
        waves = np.lib.format.open_memmap(waves_out, mode="w+",
                                          dtype=np.int16,
                                          shape=(n, max_samples))
        waves[:] = 0
    else:
        waves = np.zeros((n, max_samples), np.int16)
    lengths = np.zeros(n, np.int32)
    labels = np.asarray([label_map.get(l, 0) for l in manifest.labels],
                        np.int32)
    ok_all = np.ones(n, bool)

    iterator = enumerate(manifest.paths)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="decode waveforms", total=n)
        except ImportError:
            pass
    for i, p in iterator:
        try:
            x, _ = load_audio_int16(p,
                                    target_sample_rate=audio_cfg.sample_rate)
            m = min(len(x), max_samples)
            waves[i, :m] = x[:m]
            lengths[i] = m
            if m == 0:
                ok_all[i] = False
        except Exception as e:
            logger.error("error processing %s: %s", p, e)
            ok_all[i] = False
    if waves_out is not None:
        waves.flush()
    return waves, lengths, labels, ok_all, list(manifest.paths)


def save_waveform_cache(path: str, waves: np.ndarray, lengths: np.ndarray,
                        labels: np.ndarray, paths: Iterable[str],
                        label_map: Dict[str, int],
                        audio_cfg: Optional[AudioConfig] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if isinstance(waves, np.memmap) and waves.dtype == np.int16:
        import io
        import zipfile

        waves.flush()
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            zf.write(waves.filename, "waves.npy")
            for name, arr in (("lengths", lengths.astype(np.int32)),
                              ("labels", labels.astype(np.int32))):
                buf = io.BytesIO()
                np.lib.format.write_array(buf, arr)
                zf.writestr(name + ".npy", buf.getvalue())
    else:
        np.savez(path, waves=np.asarray(waves, np.int16),
                 lengths=lengths.astype(np.int32),
                 labels=labels.astype(np.int32))
    cfg = audio_cfg or AudioConfig()
    meta = {
        "version": CACHE_VERSION,
        "kind": "waveforms_int16",
        "num_items": int(waves.shape[0]),
        "paths": list(paths),
        "label_map": label_map,
        "audio": {"sample_rate": cfg.sample_rate,
                  "max_samples": int(waves.shape[1])},
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)
    logger.info("saved %d waveforms to %s", waves.shape[0], path)


def load_waveform_cache(path: str):
    """-> (waves (N, max_samples) int16, lengths, labels, meta dict)."""
    with np.load(path) as z:
        waves = z["waves"]
        lengths = z["lengths"]
        labels = z["labels"]
    meta = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return waves, lengths, labels, meta


def save_cache(path: str, features: np.ndarray, labels: np.ndarray,
               paths: Iterable[str], label_map: Dict[str, int],
               audio_cfg: Optional[AudioConfig] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if isinstance(features, np.memmap) and features.dtype == np.float32:
        # Features were streamed to disk during precompute
        # (``features_out=``): build the .npz by zip-storing the backing
        # ``.npy`` — one sequential disk copy instead of materializing the
        # (N, n_mels, T) array in RAM and re-serializing it.  np.load reads
        # the result identically to np.savez output.
        import io
        import zipfile

        features.flush()
        with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
            zf.write(features.filename, "features.npy")
            buf = io.BytesIO()
            np.lib.format.write_array(buf, labels.astype(np.int32))
            zf.writestr("labels.npy", buf.getvalue())
    else:
        np.savez(path, features=np.asarray(features, np.float32),
                 labels=labels.astype(np.int32))
    meta = {
        "version": CACHE_VERSION,
        "num_items": int(features.shape[0]),
        "paths": list(paths),
        "label_map": label_map,
        "audio": {
            "sample_rate": (audio_cfg or AudioConfig()).sample_rate,
            "n_mels": int(features.shape[1]),
            "mel_spec_length": int(features.shape[2]),
        },
    }
    with open(_meta_path(path), "w") as f:
        json.dump(meta, f)
    logger.info("saved %d features to %s", features.shape[0], path)


def _meta_path(path: str) -> str:
    return os.path.splitext(path)[0] + ".meta.json"


def load_cache(path: str):
    """-> (features, labels, meta dict)."""
    with np.load(path) as z:
        features = z["features"]
        labels = z["labels"]
    meta = {}
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return features, labels, meta


def load_torch_cache(path: str, label_map: Dict[str, int],
                     target_length: int = 200):
    """Read a reference-format ``*_features.pt`` cache (torch pickled dict of
    per-path feature tensors) into flat arrays — migration support."""
    import torch

    from speech_intent_recognizer_tpu.ops.frontend_numpy import pad_or_trim_np

    blob = torch.load(path, map_location="cpu", weights_only=False)
    paths, feats, labels = [], [], []
    for p, entry in blob.items():
        paths.append(p)
        feats.append(pad_or_trim_np(
            np.asarray(entry["features"], np.float32), target_length))
        labels.append(label_map.get(str(entry["label"]), 0))
    return (np.stack(feats), np.asarray(labels, np.int32), paths)
