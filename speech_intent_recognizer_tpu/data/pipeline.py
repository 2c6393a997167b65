"""Device-resident dataset.

The DataLoader-shaped input pipeline of the reference (8 worker processes,
3-tier cache, per-item pad/trim — ``scripts/dataset.py``) collapses on TPU
into: load the flat feature cache once, ``device_put`` it (replicated over
the mesh), and let the jitted epoch scan gather batches on device.  For
multi-host pods each process places only its host's shard
(:func:`parallel.distributed.host_shard`).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Dict, Optional

import numpy as np

from speech_intent_recognizer_tpu.config.schema import Config
from speech_intent_recognizer_tpu.data import cache as cache_mod
from speech_intent_recognizer_tpu.data.manifest import read_manifest

logger = logging.getLogger(__name__)


@dataclass
class DeviceDataset:
    """Features (or int16 waveforms) and labels living in device memory."""

    features: object  # jax.Array (N, n_mels, T) f32 — or (N, L) int16 waves
    labels: object  # jax.Array (N,) int32
    num_items: int
    lengths: object = None  # jax.Array (N,) int32, waveform mode only

    @classmethod
    def from_arrays(cls, features: np.ndarray, labels: np.ndarray, mesh=None,
                    lengths: Optional[np.ndarray] = None):
        import jax

        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(mesh, P())
            put = lambda a: jax.device_put(a, rep)  # noqa: E731
        else:
            put = jax.device_put
        return cls(features=put(features), labels=put(labels),
                   num_items=int(features.shape[0]),
                   lengths=put(lengths) if lengths is not None else None)


def build_dataset(
    csv_path: str,
    label_map: Dict[str, int],
    cfg: Config,
    mesh=None,
    use_cache: Optional[bool] = None,
    store: bool = True,
) -> DeviceDataset:
    """Resolve features for a manifest: cache hit -> load; miss -> compute
    (and optionally store), mirroring the reference's cache-or-extract flow
    (``dataset.py:43-102``) at dataset granularity instead of per item."""
    use_cache = cfg.data.use_feature_cache if use_cache is None else use_cache
    cache_file = cache_mod.cache_path_for(csv_path, cfg.data.cache_dir)

    if use_cache and os.path.exists(cache_file) and not cfg.data.force_precompute:
        feats, labels, meta = cache_mod.load_cache(cache_file)
        logger.info("loaded %d cached features from %s", len(feats), cache_file)
        return DeviceDataset.from_arrays(feats, labels, mesh)

    # reference-format torch cache migration
    legacy = cache_file[: -len(".npz")] + ".pt"
    if use_cache and os.path.exists(legacy) and not cfg.data.force_precompute:
        try:
            feats, labels, _paths = cache_mod.load_torch_cache(
                legacy, label_map, cfg.audio.mel_spec_length)
            logger.info("migrated %d features from legacy cache %s",
                        len(feats), legacy)
            return DeviceDataset.from_arrays(feats, labels, mesh)
        except Exception as e:
            logger.warning("legacy cache %s unreadable (%s); recomputing",
                           legacy, e)

    manifest = read_manifest(csv_path)
    feats, labels, ok, paths = cache_mod.precompute_features(
        manifest, label_map, cfg.audio,
        batch_size=cfg.data.precompute_batch_size,
        wire_dtype=cfg.data.precompute_wire_dtype,
        fetch_dtype=cfg.data.precompute_fetch_dtype)
    if use_cache and store:
        cache_mod.save_cache(cache_file, feats, labels, paths, label_map,
                             cfg.audio)
    return DeviceDataset.from_arrays(feats, labels, mesh)


def build_waveform_dataset(
    csv_path: str,
    label_map: Dict[str, int],
    cfg: Config,
    mesh=None,
    use_cache: Optional[bool] = None,
    store: bool = True,
) -> DeviceDataset:
    """Waveform-resident variant of :func:`build_dataset`
    (``data.train_on_waveforms``): the dataset is the int16 waveform cache
    placed whole in HBM; featurization happens inside the jitted train step
    (see ``train/loop.py``), which makes waveform-domain augmentation live.
    """
    use_cache = cfg.data.use_feature_cache if use_cache is None else use_cache
    cache_file = cache_mod.waveform_cache_path_for(csv_path,
                                                   cfg.data.cache_dir)

    if (use_cache and os.path.exists(cache_file)
            and not cfg.data.force_precompute):
        waves, lengths, labels, meta = cache_mod.load_waveform_cache(
            cache_file)
        logger.info("loaded %d cached waveforms from %s", len(waves),
                    cache_file)
        return DeviceDataset.from_arrays(waves, labels, mesh,
                                         lengths=lengths)

    manifest = read_manifest(csv_path)
    waves, lengths, labels, ok, paths = cache_mod.precompute_waveforms(
        manifest, label_map, cfg.audio)
    if use_cache and store:
        cache_mod.save_waveform_cache(cache_file, waves, lengths, labels,
                                      paths, label_map, cfg.audio)
    return DeviceDataset.from_arrays(waves, labels, mesh, lengths=lengths)
