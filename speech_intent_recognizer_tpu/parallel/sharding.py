"""Sharding rules: how parameters and batches are laid out on the mesh.

Parameters are placed with ``NamedSharding`` per-leaf; XLA's GSPMD inserts
the collectives (all-gather on use, reduce-scatter/psum on grad) so no
explicit communication code exists anywhere in the framework — the TPU-native
replacement for the reference's (absent) NCCL layer.

Rules for the CNNAudioGRU tree:

* GRU weights ``*_w_ih``/``*_w_hh`` (3H, in): shard dim 0 (the gate-stacked
  hidden dim, 768 = divisible by 2/4/8) over ``model``.
* GRU biases (3H,): shard dim 0 over ``model``.
* ``attention/kernel`` and ``fc/kernel`` (in, out): shard dim 0 (in = 512)
  over ``model`` (row-parallel; XLA inserts the psum).
* conv/bn and small leaves: replicated.
* Batches: shard dim 0 over ``data``.

Rules for the Wav2VecIntent tree (Megatron-style tensor parallelism on the
transformer encoder):

* ``q_proj``/``k_proj``/``v_proj`` and ``intermediate_dense`` kernels
  (in, out): shard dim 1 (heads / FFN-expand) over ``model``
  (column-parallel); their biases follow on dim 0.
* ``out_proj`` and ``output_dense`` kernels: shard dim 0 (row-parallel;
  XLA inserts the psum back to replicated).
* feature extractor convs, layer norms, ``masked_spec_embed``: replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from speech_intent_recognizer_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def _spec_for_leaf(path: str, leaf, model_size: int) -> P:
    if model_size <= 1:
        return P()
    shape = getattr(leaf, "shape", ())
    if "gru" in path and ("w_ih" in path or "w_hh" in path or "b_ih" in path
                          or "b_hh" in path):
        if shape and shape[0] % model_size == 0:
            return P(MODEL_AXIS, *([None] * (len(shape) - 1)))
        return P()
    col_parallel = ("q_proj" in path or "k_proj" in path or "v_proj" in path
                    or "intermediate_dense" in path)
    row_parallel = "out_proj" in path or "output_dense" in path
    if col_parallel or row_parallel:
        if path.endswith("kernel") and len(shape) == 2:
            if col_parallel and shape[1] % model_size == 0:
                return P(None, MODEL_AXIS)
            if row_parallel and shape[0] % model_size == 0:
                return P(MODEL_AXIS, None)
        if (col_parallel and path.endswith("bias") and len(shape) == 1
                and shape[0] % model_size == 0):
            return P(MODEL_AXIS)
        return P()
    if ("attention" in path or "fc" in path) and path.endswith("kernel"):
        if len(shape) == 2 and shape[0] % model_size == 0:
            return P(MODEL_AXIS, None)
        return P()
    return P()


def param_shardings(mesh: Mesh, tree: Any):
    """NamedSharding tree matching ``tree`` (params / batch_stats / opt state
    mirror the same layout)."""
    model_size = mesh.shape[MODEL_AXIS]

    def lower(path_entries, leaf):
        path = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                        for p in path_entries)
        return NamedSharding(mesh, _spec_for_leaf(path, leaf, model_size))

    return jax.tree_util.tree_map_with_path(lower, tree)


def shard_batch(mesh: Mesh, batch):
    """Place host arrays onto the mesh, batch-dim sharded over ``data``."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch)


def place_params(mesh: Mesh, variables):
    """Place a variables tree with the model-parallel layout rules."""
    shardings = param_shardings(mesh, variables)
    return jax.tree.map(jax.device_put, variables, shardings)
