"""Wav2VecIntent: raw-waveform intent classifier on a wav2vec 2.0 backbone.

Rebuild of the reference's orphaned wav2vec path (surviving only as compiled
bytecode: ``models/__pycache__/model_wav2vec.cpython-313.pyc`` — a
``Wav2Vec2Model`` backbone + softmax-attention pooling + linear head; see
SURVEY.md §2).  Here the backbone is HuggingFace's Flax wav2vec2 encoder and
the head matches the reference design: attention scores ``hidden -> 1``,
softmax over time, weighted sum, ``hidden -> num_classes``.

Notes:
* the backbone is the first-party Flax implementation in
  ``models/wav2vec_flax.py`` supporting BOTH architecture variants — the
  reference's ``facebook/wav2vec2-base`` (``do_stable_layer_norm=False``,
  group feat norm) is reproduced faithfully, unlike transformers' Flax
  port, which only implements the stable-LN variant.
* ``freeze_feature_extractor`` (the reference trainer's option) is realized
  functionally: :func:`feature_extractor_mask` labels the feature-encoder
  subtree and the optimizer zeroes those updates — no mutable
  ``requires_grad`` state.
* Pretrained weights load through ``from_pretrained`` when a local/cached
  checkpoint exists (this environment has no network egress; random init via
  config is always available).
"""

from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

logger = logging.getLogger(__name__)


def _wav2vec_available() -> bool:
    try:
        from transformers import FlaxWav2Vec2Model  # noqa: F401

        return True
    except Exception:
        return False


def small_wav2vec_config(hidden_size: int = 64, num_layers: int = 2):
    """A tiny config for tests / smoke runs (no download needed)."""
    from transformers import Wav2Vec2Config

    return Wav2Vec2Config(
        hidden_size=hidden_size,
        num_hidden_layers=num_layers,
        num_attention_heads=max(2, hidden_size // 32),
        intermediate_size=hidden_size * 2,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_feat_extract_layers=3,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True,
        feat_extract_norm="layer",
    )


def small_wav2vec_base_config(hidden_size: int = 64, num_layers: int = 2):
    """Tiny config with the ``facebook/wav2vec2-base`` architecture flags
    (post-LN encoder, group feat norm, biasless convs) for tests."""
    from transformers import Wav2Vec2Config

    return Wav2Vec2Config(
        hidden_size=hidden_size,
        num_hidden_layers=num_layers,
        num_attention_heads=max(2, hidden_size // 32),
        intermediate_size=hidden_size * 2,
        conv_dim=(32, 32, 32),
        conv_kernel=(10, 3, 3),
        conv_stride=(5, 2, 2),
        num_feat_extract_layers=3,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        conv_bias=False,
    )


class Wav2VecIntent(nn.Module):
    """wav2vec2 encoder + attention pooling + intent head.

    ``__call__(input_values (B, L), attention_mask (B, L)) -> (B, C)``.
    """

    config: Any  # transformers.Wav2Vec2Config
    num_classes: int = 31
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_values, attention_mask=None, train: bool = False,
                 mask_time_indices=None):
        from speech_intent_recognizer_tpu.models.wav2vec_flax import (
            Wav2Vec2Backbone)

        backbone = Wav2Vec2Backbone(self.config, dtype=self.compute_dtype,
                                    name="wav2vec2")
        hidden = backbone(
            input_values.astype(self.compute_dtype),
            attention_mask=attention_mask,
            mask_time_indices=mask_time_indices,
            deterministic=not train,
        )  # (B, T', H)

        scores = nn.Dense(1, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="attention")(hidden.astype(jnp.float32))
        weights = jax.nn.softmax(scores, axis=1)
        pooled = jnp.sum(hidden.astype(jnp.float32) * weights, axis=1)
        return nn.Dense(self.num_classes, dtype=jnp.float32,
                        param_dtype=jnp.float32, name="fc")(pooled)


def create_wav2vec_intent(
    num_classes: int,
    model_name: Optional[str] = None,
    config: Optional[Any] = None,
    compute_dtype=jnp.float32,
):
    """Build the model from a config or (when cached locally) a pretrained
    name; returns (module, init_params_or_None)."""
    if not _wav2vec_available():
        raise RuntimeError(
            "Wav2VecIntent requires transformers' Flax wav2vec2 support")
    pretrained_params = None
    if config is None:
        from transformers import Wav2Vec2Config

        if model_name:
            try:
                # torch checkpoint -> first-party Flax tree via the
                # converter (handles weight-norm folding etc.)
                from transformers import Wav2Vec2Model

                from speech_intent_recognizer_tpu.convert.wav2vec_import \
                    import convert_wav2vec_state_dict

                hf = Wav2Vec2Model.from_pretrained(model_name,
                                                   local_files_only=True)
                config = hf.config
                state = {k: v.detach().numpy()
                         for k, v in hf.state_dict().items()}
                pretrained_params = {
                    "wav2vec2": convert_wav2vec_state_dict(state, config)}
            except Exception as e:
                logger.warning(
                    "pretrained %s unavailable (%s); random init from config",
                    model_name, e)
                config = Wav2Vec2Config.from_pretrained(
                    model_name) if _cached(model_name) else None
        if config is None:
            config = small_wav2vec_config()
    # Both architecture variants are supported natively (wav2vec_flax.py):
    # the reference's facebook/wav2vec2-base (do_stable_layer_norm=False,
    # group feat norm) is reproduced faithfully — no config mutation.
    model = Wav2VecIntent(config=config, num_classes=num_classes,
                          compute_dtype=compute_dtype)
    return model, pretrained_params


def _cached(model_name: str) -> bool:
    try:
        from transformers.utils import cached_file

        return cached_file(model_name, "config.json",
                           local_files_only=True) is not None
    except Exception:
        return False


def init_wav2vec(model: Wav2VecIntent, rng, input_length: int = 16000,
                 pretrained_params: Optional[dict] = None) -> dict:
    x = jnp.zeros((1, input_length), jnp.float32)
    mask = jnp.ones((1, input_length), jnp.int32)
    variables = model.init({"params": rng, "dropout": rng}, x, mask,
                           train=False)
    if pretrained_params:
        params = dict(variables["params"])
        params.update(jax.tree.map(jnp.asarray, pretrained_params))
        variables = {**variables, "params": params}
    return variables


def feature_extractor_mask(params) -> Any:
    """Pytree of bools marking the conv feature-encoder subtree — used to
    freeze it (reference trainer's ``freeze_feature_extractor``)."""

    def mark(path_entries, _leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_entries)
        return "feature_extractor" in path

    return jax.tree_util.tree_map_with_path(mark, params)
