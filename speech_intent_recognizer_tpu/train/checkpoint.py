"""Checkpointing: best-model export + full train-state resume.

The reference is save-only — a bare ``state_dict`` written on validation
improvement (``scripts/train.py:281-289``), no optimizer state, no resume.
Here checkpointing is a first-class subsystem:

* **best model**: ``best_model.msgpack`` (flax serialization of
  ``{params, batch_stats}``) + ``best_model.json`` metadata — the portable
  artifact that evaluate / inference / serving load;
* **full state**: Orbax-managed ``state/`` directory with params, batch
  stats, optimizer moments, step counter and early-stop bookkeeping —
  ``--resume`` continues bit-exactly where training stopped;
* **interop**: ``load_model_checkpoint`` also accepts a PyTorch
  ``best_model.pt`` (via :mod:`convert`), so reference users can evaluate
  or serve their existing checkpoints on TPU unchanged.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)

BEST_MODEL_FILE = "best_model.msgpack"
BEST_META_FILE = "best_model.json"
STATE_DIR = "state"


class Checkpointer:
    """Writes best-model exports and resumable train state under save_path."""

    def __init__(self, save_path: str, model_meta: Optional[dict] = None,
                 keep: int = 3, use_orbax: bool = True):
        self.save_path = save_path
        self.model_meta = model_meta or {}
        self.keep = keep
        os.makedirs(save_path, exist_ok=True)
        self._manager = None
        if use_orbax:
            try:
                import orbax.checkpoint as ocp

                self._ocp = ocp
                self._manager = ocp.CheckpointManager(
                    os.path.abspath(os.path.join(save_path, STATE_DIR)),
                    options=ocp.CheckpointManagerOptions(
                        max_to_keep=keep, create=True),
                )
            except Exception as e:  # pragma: no cover
                logger.warning("orbax unavailable (%s); resume disabled", e)

    # ------------------------------------------------------------------ best

    def save_best(self, variables: dict, val_acc: float, epoch: int) -> str:
        path = os.path.join(self.save_path, BEST_MODEL_FILE)
        host_vars = jax.device_get(variables)
        with open(path, "wb") as f:
            f.write(serialization.to_bytes(host_vars))
        meta = dict(self.model_meta)
        meta.update({"val_acc": float(val_acc), "epoch": int(epoch),
                     "format": "flax-msgpack"})
        with open(os.path.join(self.save_path, BEST_META_FILE), "w") as f:
            json.dump(meta, f, indent=2)
        logger.info("saved best model (val_acc=%.4f) to %s", val_acc, path)
        return path

    # ----------------------------------------------------------------- state

    def save_state(self, state, epoch: int, best_val_acc: float,
                   no_improve: int) -> None:
        if self._manager is None:
            return
        payload = {
            "params": jax.device_get(state.params),
            "batch_stats": jax.device_get(state.batch_stats),
            "opt_state": jax.device_get(state.opt_state),
            "step": int(jax.device_get(state.step)),
            "epoch": epoch,
            "best_val_acc": float(best_val_acc),
            "no_improve": int(no_improve),
        }
        self._manager.save(epoch, args=self._ocp.args.StandardSave(payload))
        self._manager.wait_until_finished()

    def save_payload(self, payload: dict, step: int) -> None:
        """Generic resumable-state save for trainers whose state is not a
        ``TrainState`` (e.g. the wav2vec loop: params + opt_state +
        plateau-LR scale + bookkeeping)."""
        if self._manager is None:
            return
        self._manager.save(
            step, args=self._ocp.args.StandardSave(jax.device_get(payload)))
        self._manager.wait_until_finished()

    def restore_payload(self, template: dict) -> Optional[dict]:
        """Restore the latest payload saved with :meth:`save_payload`;
        ``template`` supplies the tree structure/dtypes."""
        if self._manager is None:
            return None
        step = self._manager.latest_step()
        if step is None:
            return None
        return self._manager.restore(
            step,
            args=self._ocp.args.StandardRestore(jax.device_get(template)))

    def latest_epoch(self) -> Optional[int]:
        if self._manager is None:
            return None
        return self._manager.latest_step()

    def restore_state(self, state_template) -> Optional[Tuple[Any, dict]]:
        """Restore the latest full state; returns (state, bookkeeping)."""
        if self._manager is None:
            return None
        step = self._manager.latest_step()
        if step is None:
            return None
        template = {
            "params": jax.device_get(state_template.params),
            "batch_stats": jax.device_get(state_template.batch_stats),
            "opt_state": jax.device_get(state_template.opt_state),
            "step": 0,
            "epoch": 0,
            "best_val_acc": 0.0,
            "no_improve": 0,
        }
        restored = self._manager.restore(
            step, args=self._ocp.args.StandardRestore(template))
        state = state_template.replace(
            step=np.asarray(restored["step"], np.int32),
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        book = {"epoch": int(restored["epoch"]),
                "best_val_acc": float(restored["best_val_acc"]),
                "no_improve": int(restored["no_improve"])}
        logger.info("resumed from epoch %d (best val acc %.4f)",
                    book["epoch"], book["best_val_acc"])
        return state, book


def save_model(path: str, variables: dict, meta: Optional[dict] = None):
    """Standalone best-model export (outside a training run)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    if meta is not None:
        with open(os.path.splitext(path)[0] + ".json", "w") as f:
            json.dump(meta, f, indent=2)


def load_model_checkpoint(path: str, template: Optional[dict] = None) -> dict:
    """Load model variables from .msgpack (native) or .pt (torch interop)."""
    if path.endswith(".pt") or path.endswith(".pth"):
        from speech_intent_recognizer_tpu.convert.torch_import import (
            convert_torch_state_dict, load_torch_checkpoint)

        state = load_torch_checkpoint(path)
        if any(k.startswith(("wav2vec.", "wav2vec2.")) for k in state):
            # reference fine-tuned Wav2VecIntent layout
            from speech_intent_recognizer_tpu.convert.wav2vec_import import (
                convert_wav2vec_intent_state_dict)

            params, _ = convert_wav2vec_intent_state_dict(state)
            return {"params": params}
        params, batch_stats = convert_torch_state_dict(state)
        return {"params": params, "batch_stats": batch_stats}
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        return serialization.from_bytes(template, data)
    return serialization.msgpack_restore(data)
