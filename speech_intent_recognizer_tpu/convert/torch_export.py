"""Flax -> PyTorch ``state_dict`` export (the reverse of torch_import).

Lets a model trained on TPU be handed back to users of the reference
project unchanged: the exported dict loads into the reference's
``CNNAudioGRU`` (``models/models.py:5-39`` layout) via
``model.load_state_dict(torch.load(path))``.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def export_torch_state_dict(
    params: Dict,
    batch_stats: Dict,
    num_conv_blocks: int = 3,
    gru_layers: int = 2,
) -> Dict[str, np.ndarray]:
    """Flax variables -> reference-layout numpy state dict."""
    out: Dict[str, np.ndarray] = {}
    for i in range(1, num_conv_blocks + 1):
        kernel = np.asarray(params[f"conv{i}"]["kernel"])  # (kH,kW,I,O)
        out[f"conv{i}.weight"] = np.transpose(kernel, (3, 2, 0, 1))
        out[f"bn{i}.weight"] = np.asarray(params[f"bn{i}"]["scale"])
        out[f"bn{i}.bias"] = np.asarray(params[f"bn{i}"]["bias"])
        out[f"bn{i}.running_mean"] = np.asarray(batch_stats[f"bn{i}"]["mean"])
        out[f"bn{i}.running_var"] = np.asarray(batch_stats[f"bn{i}"]["var"])
        out[f"bn{i}.num_batches_tracked"] = np.asarray(0, np.int64)

    gru = params["gru"]
    for layer in range(gru_layers):
        for direction, suffix in (("fwd", ""), ("bwd", "_reverse")):
            key = f"l{layer}_{direction}"
            out[f"gru.weight_ih_l{layer}{suffix}"] = np.asarray(
                gru[f"{key}_w_ih"])
            out[f"gru.weight_hh_l{layer}{suffix}"] = np.asarray(
                gru[f"{key}_w_hh"])
            out[f"gru.bias_ih_l{layer}{suffix}"] = np.asarray(
                gru[f"{key}_b_ih"])
            out[f"gru.bias_hh_l{layer}{suffix}"] = np.asarray(
                gru[f"{key}_b_hh"])

    out["attention.weight"] = np.asarray(params["attention"]["kernel"]).T
    out["attention.bias"] = np.asarray(params["attention"]["bias"])
    out["fc.weight"] = np.asarray(params["fc"]["kernel"]).T
    out["fc.bias"] = np.asarray(params["fc"]["bias"])
    return out


def save_torch_checkpoint(path: str, params: Dict, batch_stats: Dict) -> None:
    """Write a ``best_model.pt`` the reference can load directly."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("torch (cpu) required to write .pt files") from e
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             if isinstance(v, np.ndarray) and v.ndim > 0
             else torch.tensor(v)
             for k, v in export_torch_state_dict(params, batch_stats).items()}
    torch.save(state, path)
