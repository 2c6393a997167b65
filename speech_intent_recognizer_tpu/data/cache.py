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
from speech_intent_recognizer_tpu.data.audio_io import load_audio
from speech_intent_recognizer_tpu.data.manifest import Manifest

logger = logging.getLogger(__name__)

CACHE_VERSION = 1


def cache_path_for(csv_path: str, cache_dir: str) -> str:
    stem = os.path.basename(csv_path)
    if stem.endswith(".csv"):
        stem = stem[:-4]
    return os.path.join(cache_dir, f"{stem}_features.npz")


def _decode_batch(paths, audio_cfg: AudioConfig):
    """Host decode into a fixed (B, max_samples) buffer + lengths."""
    max_samples = audio_cfg.max_samples
    buf = np.zeros((len(paths), max_samples), np.float32)
    lengths = np.zeros(len(paths), np.int32)
    ok = np.ones(len(paths), bool)
    for i, p in enumerate(paths):
        try:
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
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """Compute features for a manifest on device.

    Returns (features (N, n_mels, T) f32, labels (N,) i32, ok mask, paths).
    Failed decodes keep the reference's zero-feature fallback semantics
    (``dataset.py:123,158``) and are flagged in the mask.
    """
    import jax.numpy as jnp

    from speech_intent_recognizer_tpu.ops.frontend_jax import (
        log_mel_frontend, make_frontend_params)

    audio_cfg = audio_cfg or AudioConfig()
    params = make_frontend_params(audio_cfg)
    n = len(manifest)
    feats = np.zeros((n, audio_cfg.n_mels, audio_cfg.mel_spec_length),
                     np.float32)
    labels = np.asarray([label_map.get(l, 0) for l in manifest.labels],
                        np.int32)
    ok_all = np.ones(n, bool)

    from speech_intent_recognizer_tpu.data.prefetch import BackgroundLoader

    def produce():
        """Host decode on a worker thread — overlaps with device batches."""
        for start in range(0, n, batch_size):
            chunk = manifest.paths[start : start + batch_size]
            buf, lengths, ok = _decode_batch(chunk, audio_cfg)
            # pad the final chunk to the compiled batch size (one XLA program)
            if len(chunk) < batch_size:
                pad = batch_size - len(chunk)
                buf = np.concatenate([buf, np.zeros((pad, buf.shape[1]),
                                                    np.float32)])
                lengths = np.concatenate([lengths, np.ones(pad, np.int32)])
            yield start, len(chunk), buf, lengths, ok

    iterator = BackgroundLoader(produce, capacity=2)
    if progress:
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="precompute",
                            total=-(-n // batch_size))
        except ImportError:
            pass

    for start, n_chunk, buf, lengths, ok in iterator:
        out = log_mel_frontend(jnp.asarray(buf),
                               jnp.asarray(np.maximum(lengths, 1)), params,
                               backend="auto")
        out = np.array(out)[:n_chunk]  # copy: jax arrays are read-only
        out[~ok] = 0.0  # zero-feature fallback for failed decodes
        feats[start : start + n_chunk] = out
        ok_all[start : start + n_chunk] = ok

    return feats, labels, ok_all, list(manifest.paths)


def save_cache(path: str, features: np.ndarray, labels: np.ndarray,
               paths: Iterable[str], label_map: Dict[str, int],
               audio_cfg: Optional[AudioConfig] = None) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, features=features.astype(np.float32),
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
