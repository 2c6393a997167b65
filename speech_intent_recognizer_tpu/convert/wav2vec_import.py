"""torch wav2vec2 checkpoint -> first-party Flax backbone converter.

Mirrors ``convert/torch_import.py`` for the wav2vec model family: maps a
``transformers.Wav2Vec2Model`` state dict (either architecture variant —
the reference fine-tunes ``facebook/wav2vec2-base``, see
``models/__pycache__/model_wav2vec.cpython-313.pyc``) onto
:class:`~speech_intent_recognizer_tpu.models.wav2vec_flax.Wav2Vec2Backbone`,
and a full fine-tuned ``Wav2VecIntent`` state dict (``wav2vec.*`` backbone +
``attention.*``/``fc.*`` head) onto the Flax ``Wav2VecIntent``.

Layout mapping (torch -> flax):

* conv1d ``weight`` (O, I/g, K)           -> ``conv/kernel`` (K, I/g, O)
* linear ``weight`` (O, I)                -> ``kernel`` (I, O)
* layer/group norm ``weight``/``bias``    -> ``scale``/``bias``
* ``pos_conv_embed.conv`` weight-norm pairs (``weight_g``/``weight_v`` or
  ``parametrizations.weight.original0/1``) are folded into one kernel:
  ``w = g * v / ||v||`` with the norm over (out, in) per kernel position
  (torch ``weight_norm(..., dim=2)``).

Pure numpy; torch is only needed upstream to unpickle ``.pt`` files.
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))  # (O, I/g, K) -> (K, I/g, O)


def _linear(tree: dict, w: np.ndarray, b: Optional[np.ndarray]) -> None:
    tree["kernel"] = np.transpose(w)
    if b is not None:
        tree["bias"] = b


def _fold_weight_norm(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch ``weight_norm(conv, dim=2)``: per-kernel-position norm over
    (out_channels, in_channels)."""
    norm = np.sqrt(np.sum(v.astype(np.float64) ** 2, axis=(0, 1),
                          keepdims=True))
    return (g.astype(np.float64) * v.astype(np.float64) / norm).astype(
        v.dtype)


def convert_wav2vec_state_dict(state: Dict[str, np.ndarray],
                               config=None) -> dict:
    """``transformers.Wav2Vec2Model`` state dict -> Flax backbone params."""
    p: dict = {"feature_extractor": {}, "feature_projection": {},
               "encoder": {}}
    get = state.get

    # ---- feature extractor conv stack
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in state:
        layer = {"conv": {"kernel": _conv_kernel(
            state[f"feature_extractor.conv_layers.{i}.conv.weight"])}}
        b = get(f"feature_extractor.conv_layers.{i}.conv.bias")
        if b is not None:
            layer["conv"]["bias"] = b
        lw = get(f"feature_extractor.conv_layers.{i}.layer_norm.weight")
        if lw is not None:
            layer["layer_norm"] = {
                "scale": lw,
                "bias": state[
                    f"feature_extractor.conv_layers.{i}.layer_norm.bias"],
            }
        p["feature_extractor"][f"conv_layers_{i}"] = layer
        i += 1
    if i == 0:
        raise KeyError("no feature_extractor.conv_layers.* in state dict")

    # ---- feature projection
    p["feature_projection"]["layer_norm"] = {
        "scale": state["feature_projection.layer_norm.weight"],
        "bias": state["feature_projection.layer_norm.bias"],
    }
    proj: dict = {}
    _linear(proj, state["feature_projection.projection.weight"],
            get("feature_projection.projection.bias"))
    p["feature_projection"]["projection"] = proj

    # ---- positional conv embedding (weight-norm folded)
    pc = "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in state:
        w = _fold_weight_norm(state[f"{pc}.weight_g"],
                              state[f"{pc}.weight_v"])
    elif f"{pc}.parametrizations.weight.original0" in state:
        w = _fold_weight_norm(
            state[f"{pc}.parametrizations.weight.original0"],
            state[f"{pc}.parametrizations.weight.original1"])
    else:
        w = state[f"{pc}.weight"]
    conv = {"kernel": _conv_kernel(w)}
    if get(f"{pc}.bias") is not None:
        conv["bias"] = state[f"{pc}.bias"]
    p["encoder"]["pos_conv_embed"] = {"conv": conv}

    # ---- encoder layer norm (post-pos-conv for base; final for stable)
    p["encoder"]["layer_norm"] = {
        "scale": state["encoder.layer_norm.weight"],
        "bias": state["encoder.layer_norm.bias"],
    }

    # ---- transformer layers
    n_layers = 1 + max(
        int(m.group(1)) for k in state
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    for li in range(n_layers):
        pre = f"encoder.layers.{li}"
        layer: dict = {"attention": {}, "feed_forward": {}}
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            d: dict = {}
            _linear(d, state[f"{pre}.attention.{name}.weight"],
                    get(f"{pre}.attention.{name}.bias"))
            layer["attention"][name] = d
        layer["layer_norm"] = {
            "scale": state[f"{pre}.layer_norm.weight"],
            "bias": state[f"{pre}.layer_norm.bias"],
        }
        for name in ("intermediate_dense", "output_dense"):
            d = {}
            _linear(d, state[f"{pre}.feed_forward.{name}.weight"],
                    get(f"{pre}.feed_forward.{name}.bias"))
            layer["feed_forward"][name] = d
        layer["final_layer_norm"] = {
            "scale": state[f"{pre}.final_layer_norm.weight"],
            "bias": state[f"{pre}.final_layer_norm.bias"],
        }
        p["encoder"][f"layers_{li}"] = layer

    if "masked_spec_embed" in state:
        p["masked_spec_embed"] = state["masked_spec_embed"]
    return p


def infer_wav2vec_config(state: Dict[str, np.ndarray]):
    """Reconstruct a ``Wav2Vec2Config`` from a backbone state dict's weight
    shapes — lets a bare reference ``best_model.pt`` load without a config
    sidecar.  Strides aren't visible in weights: the canonical wav2vec2
    stack ``(5,2,2,2,2,2,2)`` is assumed for 7-layer extractors (true of
    every published wav2vec2 checkpoint); other depths fall back to stride 2
    after the first layer.  Head count uses the standard ``hidden//64``."""
    from transformers import Wav2Vec2Config

    hidden = int(state["feature_projection.projection.weight"].shape[0])
    n_layers = 1 + max(
        int(m.group(1)) for k in state
        if (m := re.match(r"encoder\.layers\.(\d+)\.", k)))
    conv_ws = []
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in state:
        conv_ws.append(state[f"feature_extractor.conv_layers.{i}.conv.weight"])
        i += 1
    conv_dim = tuple(int(w.shape[0]) for w in conv_ws)
    conv_kernel = tuple(int(w.shape[2]) for w in conv_ws)
    conv_stride = (5,) + (2,) * (len(conv_ws) - 1)
    feat_norm = ("layer"
                 if "feature_extractor.conv_layers.1.layer_norm.weight"
                 in state else "group")
    pc = "encoder.pos_conv_embed.conv"
    pos_w = state.get(f"{pc}.weight_v",
                      state.get(f"{pc}.parametrizations.weight.original1",
                                state.get(f"{pc}.weight")))
    return Wav2Vec2Config(
        hidden_size=hidden,
        num_hidden_layers=n_layers,
        num_attention_heads=max(1, hidden // 64),
        intermediate_size=int(
            state["encoder.layers.0.feed_forward.intermediate_dense.weight"
                  ].shape[0]),
        conv_dim=conv_dim,
        conv_kernel=conv_kernel,
        conv_stride=conv_stride,
        num_feat_extract_layers=len(conv_ws),
        num_conv_pos_embeddings=int(pos_w.shape[2]),
        num_conv_pos_embedding_groups=hidden // int(pos_w.shape[1]),
        conv_bias="feature_extractor.conv_layers.0.conv.bias" in state,
        feat_extract_norm=feat_norm,
        # stable-LN tracks the feat-norm mode in all published checkpoints
        # (base family: group/post-LN; lv60 family: layer/pre-LN)
        do_stable_layer_norm=(feat_norm == "layer"),
    )


def convert_wav2vec_intent_state_dict(
    state: Dict[str, np.ndarray],
) -> Tuple[dict, int]:
    """Full fine-tuned ``Wav2VecIntent`` state dict (reference layout:
    ``wav2vec.*`` backbone + ``attention.*`` + ``fc.*`` head) ->
    (flax params, num_classes)."""
    backbone_state = {}
    for prefix in ("wav2vec.", "wav2vec2."):
        sub = {k[len(prefix):]: v for k, v in state.items()
               if k.startswith(prefix)}
        if sub:
            backbone_state = sub
            break
    if not backbone_state:
        raise KeyError("no wav2vec backbone keys in state dict")
    params = {"wav2vec2": convert_wav2vec_state_dict(backbone_state)}
    att: dict = {}
    _linear(att, state["attention.weight"], state.get("attention.bias"))
    params["attention"] = att
    fc: dict = {}
    _linear(fc, state["fc.weight"], state.get("fc.bias"))
    params["fc"] = fc
    return params, int(state["fc.weight"].shape[0])
