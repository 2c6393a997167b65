"""PyTorch ``best_model.pt`` -> Flax parameter converter.

The reference publishes its trained model as a bare ``state_dict``
(``scripts/train.py:288``), sometimes wrapped as
``{'model_state_dict': ...}`` by an older trainer
(``scripts/test_tts_samples.py:40-43``).  This module maps that layout onto
the Flax :class:`~speech_intent_recognizer_tpu.models.CNNAudioGRU` so a
reference user can bring their checkpoint to TPU unchanged.

Layout mapping (torch -> flax):

* ``conv{i}.weight`` (O, I, kH, kW)   -> ``conv{i}/kernel`` (kH, kW, I, O)
* ``bn{i}.weight/bias``               -> ``bn{i}/scale,bias``
* ``bn{i}.running_mean/var``          -> batch_stats ``bn{i}/mean,var``
* ``gru.weight_ih_l{L}[_reverse]``    -> ``gru/l{L}_{fwd,bwd}_w_ih`` (as-is;
  PyTorch's [r; z; n] row order is the native layout of our TorchGRU)
* ``attention.weight`` (1, F)         -> ``attention/kernel`` (F, 1)
* ``fc.weight`` (C, F)                -> ``fc/kernel`` (F, C)

The converter is pure numpy; torch is only needed to unpickle ``.pt`` files
(torch-cpu is an optional interop dependency, never part of the compute
path).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Unpickle a ``.pt`` state dict into plain numpy arrays."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "loading .pt checkpoints requires torch (cpu) for unpickling"
        ) from e
    state = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(state, dict) and "model_state_dict" in state:
        # historical rich-checkpoint format (test_tts_samples.py:40-43)
        state = state["model_state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()}


def infer_num_classes(state: Dict[str, np.ndarray]) -> int:
    """Reference trick (``test_tts_samples.py:46-48``): the class count is
    the output dim of the final linear layer."""
    if "fc.weight" not in state:
        raise KeyError("state dict has no fc.weight")
    return int(state["fc.weight"].shape[0])


def convert_torch_state_dict(
    state: Dict[str, np.ndarray],
    num_conv_blocks: int = 3,
    gru_layers: int = 2,
) -> Tuple[dict, dict]:
    """Convert a reference-layout state dict -> (params, batch_stats) trees."""
    params: dict = {}
    batch_stats: dict = {}

    for i in range(1, num_conv_blocks + 1):
        w = state[f"conv{i}.weight"]
        params[f"conv{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
        params[f"bn{i}"] = {
            "scale": state[f"bn{i}.weight"],
            "bias": state[f"bn{i}.bias"],
        }
        batch_stats[f"bn{i}"] = {
            "mean": state[f"bn{i}.running_mean"],
            "var": state[f"bn{i}.running_var"],
        }

    gru: dict = {}
    for layer in range(gru_layers):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            key = f"l{layer}_{direction}"
            gru[f"{key}_w_ih"] = state[f"gru.weight_ih_l{layer}{suffix}"]
            gru[f"{key}_w_hh"] = state[f"gru.weight_hh_l{layer}{suffix}"]
            gru[f"{key}_b_ih"] = state[f"gru.bias_ih_l{layer}{suffix}"]
            gru[f"{key}_b_hh"] = state[f"gru.bias_hh_l{layer}{suffix}"]
    params["gru"] = gru

    params["attention"] = {
        "kernel": state["attention.weight"].T,
        "bias": state["attention.bias"],
    }
    params["fc"] = {
        "kernel": state["fc.weight"].T,
        "bias": state["fc.bias"],
    }

    import jax.numpy as jnp

    to_jnp = lambda tree: {  # noqa: E731
        k: (to_jnp(v) if isinstance(v, dict) else jnp.asarray(v, jnp.float32))
        for k, v in tree.items()
    }
    return to_jnp(params), to_jnp(batch_stats)


def convert_torch_checkpoint(path: str):
    """One-call import: path -> (model_kwargs, variables dict)."""
    state = load_torch_checkpoint(path)
    num_classes = infer_num_classes(state)
    params, batch_stats = convert_torch_state_dict(state)
    return {"num_classes": num_classes}, {"params": params,
                                          "batch_stats": batch_stats}
