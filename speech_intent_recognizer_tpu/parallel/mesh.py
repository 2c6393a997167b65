"""Device mesh construction.

The reference is strictly single-device (``CUDA_VISIBLE_DEVICES="0"``,
reference ``scripts/train.py:17``).  The TPU framework is mesh-native from
the start: a 2-D ``(data, model)`` mesh where

* ``data`` is the batch axis — gradients are reduced over it by XLA-inserted
  ``psum`` riding ICI (the NCCL-allreduce equivalent, owned by the compiler);
* ``model`` shards the wide GRU/attention/classifier weights when > 1
  (tensor parallelism; the 3.26 M-param flagship doesn't need it, but the
  sharding rules generalize to larger models for free).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclass(frozen=True)
class MeshSpec:
    data: int
    model: int = 1

    @property
    def num_devices(self) -> int:
        return self.data * self.model


def create_mesh(
    data_axis: int = -1,
    model_axis: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh over the given (default: all) devices.

    ``data_axis=-1`` consumes all devices not taken by ``model_axis``.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(1, int(model_axis))
    if n % model != 0:
        raise ValueError(f"{n} devices not divisible by model axis {model}")
    data = n // model if data_axis in (-1, None) else int(data_axis)
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not cover {n} devices")
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-data-shard batch size; validates divisibility up front."""
    n = mesh.shape[DATA_AXIS]
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by data axis {n}")
    return global_batch // n
