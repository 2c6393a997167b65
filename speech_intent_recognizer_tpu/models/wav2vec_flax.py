"""First-party Flax wav2vec 2.0 backbone — both architecture variants.

The reference's wav2vec path fine-tunes ``facebook/wav2vec2-base``
(``models/__pycache__/model_wav2vec.cpython-313.pyc``), which is the
*non-stable-layer-norm* variant (``do_stable_layer_norm=False``,
``feat_extract_norm="group"``, ``conv_bias=False``).  HuggingFace's Flax
implementation only supports the stable-LN/layer-norm variant, so a faithful
TPU rebuild needs its own encoder.  This module implements both:

* **base** (post-LN): group-norm on conv layer 0 only; each encoder layer is
  ``x = LN(x + attn(x)); x = LN2(x + ff(x))``; one LN right after the
  positional convolution.
* **stable / large** (pre-LN): per-conv-layer layer norm; encoder layers are
  ``x = x + attn(LN(x)); x = x + ff(LN2(x))``; a final LN after all layers.

Semantics match torch ``transformers.Wav2Vec2Model`` (eval and train mode,
including attention masking, exact-erf GELU, LayerDrop and the
``masked_spec_embed`` time masking) — verified by the converter parity tests
in ``tests/test_wav2vec_parity.py``.  Everything is static-shape,
bf16-friendly and jit-compiles to MXU matmuls; the conv feature extractor is
seven strided convolutions XLA maps directly.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)  # torch F.gelu default (erf)


def feat_extract_output_lengths(config, input_lengths):
    """Sample-space lengths -> conv-feature-space lengths (the torch
    ``_get_feat_extract_output_lengths`` recurrence)."""
    lengths = input_lengths
    for kernel, stride in zip(config.conv_kernel, config.conv_stride):
        lengths = (lengths - kernel) // stride + 1
    return lengths


def feature_space_attention_mask(config, attention_mask, t_out: int):
    """Sample-space padding mask (B, L) -> feature-space mask (B, T')."""
    lengths = feat_extract_output_lengths(
        config, jnp.sum(attention_mask.astype(jnp.int32), axis=-1))
    return (jnp.arange(t_out)[None, :] < lengths[:, None]).astype(jnp.int32)


class ConvLayer(nn.Module):
    """One conv block of the feature encoder."""

    config: Any
    layer_id: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        out_dim = cfg.conv_dim[self.layer_id]
        x = nn.Conv(out_dim,
                    kernel_size=(cfg.conv_kernel[self.layer_id],),
                    strides=(cfg.conv_stride[self.layer_id],),
                    padding="VALID",
                    use_bias=bool(cfg.conv_bias),
                    dtype=self.dtype, name="conv")(x)
        if cfg.feat_extract_norm == "group" and self.layer_id == 0:
            # torch GroupNorm(out_dim, out_dim): per-channel stats over time
            x = nn.GroupNorm(num_groups=out_dim, epsilon=1e-5,
                             dtype=jnp.float32, name="layer_norm")(x)
        elif cfg.feat_extract_norm == "layer":
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="layer_norm")(x)
        return _gelu(x)


class FeatureEncoder(nn.Module):
    """Raw waveform (B, L) -> conv features (B, T', conv_dim[-1])."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_values):
        x = input_values[..., None].astype(self.dtype)  # (B, L, 1)
        for i in range(self.config.num_feat_extract_layers):
            x = ConvLayer(self.config, layer_id=i, dtype=self.dtype,
                          name=f"conv_layers_{i}")(x)
        return x


class FeatureProjection(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = nn.LayerNorm(epsilon=self.config.layer_norm_eps,
                         dtype=jnp.float32, name="layer_norm")(x)
        x = nn.Dense(self.config.hidden_size, dtype=self.dtype,
                     name="projection")(x)
        x = nn.Dropout(self.config.feat_proj_dropout)(
            x, deterministic=deterministic)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (weight-norm folded into the kernel
    by the converter)."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        pad = k // 2
        y = nn.Conv(cfg.hidden_size, kernel_size=(k,), strides=(1,),
                    padding=[(pad, pad)],
                    feature_group_count=cfg.num_conv_pos_embedding_groups,
                    dtype=self.dtype, name="conv")(x)
        if k % 2 == 0:  # torch SamePadLayer removes the extra tail element
            y = y[:, :-1, :]
        return _gelu(y)


class Attention(nn.Module):
    """Multi-head self-attention with the torch wav2vec2 scaling layout."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None, deterministic: bool = True):
        cfg = self.config
        h = cfg.hidden_size
        n_heads = cfg.num_attention_heads
        head_dim = h // n_heads
        b, t, _ = x.shape

        def split(p):
            return p.reshape(b, t, n_heads, head_dim)

        q = split(nn.Dense(h, dtype=self.dtype, name="q_proj")(x))
        k = split(nn.Dense(h, dtype=self.dtype, name="k_proj")(x))
        v = split(nn.Dense(h, dtype=self.dtype, name="v_proj")(x))
        q = q * (head_dim ** -0.5)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        if attn_bias is not None:
            scores = scores + attn_bias
        probs = jax.nn.softmax(scores, axis=-1).astype(self.dtype)
        probs = nn.Dropout(cfg.attention_dropout)(
            probs, deterministic=deterministic)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, t, h)
        return nn.Dense(h, dtype=self.dtype, name="out_proj")(out)


class FeedForward(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        x = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                     name="intermediate_dense")(x)
        x = _gelu(x)
        x = nn.Dropout(cfg.activation_dropout)(x, deterministic=deterministic)
        x = nn.Dense(cfg.hidden_size, dtype=self.dtype,
                     name="output_dense")(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)
        return x


class EncoderLayer(nn.Module):
    """Post-LN (base) or pre-LN (stable) transformer layer."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attn_bias=None, deterministic: bool = True):
        cfg = self.config
        stable = bool(cfg.do_stable_layer_norm)
        attn = Attention(cfg, dtype=self.dtype, name="attention")
        ln1 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                           name="layer_norm")
        ln2 = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                           name="final_layer_norm")
        ff = FeedForward(cfg, dtype=self.dtype, name="feed_forward")
        drop = nn.Dropout(cfg.hidden_dropout)

        if stable:
            res = x
            x = ln1(x)
            x = res + drop(attn(x, attn_bias, deterministic),
                           deterministic=deterministic)
            x = x + ff(ln2(x), deterministic)
        else:
            res = x
            x = res + drop(attn(x, attn_bias, deterministic),
                           deterministic=deterministic)
            x = ln1(x)
            x = ln2(x + ff(x, deterministic))
        return x


class Encoder(nn.Module):
    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, attention_mask=None, deterministic: bool = True):
        cfg = self.config
        stable = bool(cfg.do_stable_layer_norm)

        attn_bias = None
        if attention_mask is not None:
            keep = attention_mask.astype(jnp.float32)  # (B, T')
            x = x * keep[..., None].astype(x.dtype)  # zero padded positions
            attn_bias = (1.0 - keep)[:, None, None, :] * jnp.finfo(
                jnp.float32).min

        x = x + PositionalConvEmbedding(cfg, dtype=self.dtype,
                                        name="pos_conv_embed")(x)
        ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                          name="layer_norm")
        if not stable:
            x = ln(x)
        x = nn.Dropout(cfg.hidden_dropout)(x, deterministic=deterministic)

        for i in range(cfg.num_hidden_layers):
            y = EncoderLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(
                x, attn_bias, deterministic)
            if not deterministic and cfg.layerdrop > 0.0:
                # torch LayerDrop: skip the whole layer w.p. layerdrop (no
                # rescale).  Computed-then-selected keeps shapes static.
                keep_layer = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - cfg.layerdrop)
                y = jnp.where(keep_layer, y, x)
            x = y

        if stable:
            x = ln(x)
        return x


class Wav2Vec2Backbone(nn.Module):
    """Faithful ``transformers.Wav2Vec2Model`` forward (either variant):
    ``(input_values (B, L), attention_mask (B, L)) -> hidden (B, T', H)``."""

    config: Any
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_values, attention_mask=None,
                 mask_time_indices=None, deterministic: bool = True):
        cfg = self.config
        feats = FeatureEncoder(cfg, dtype=self.dtype,
                               name="feature_extractor")(input_values)
        hidden = FeatureProjection(cfg, dtype=self.dtype,
                                   name="feature_projection")(
            feats, deterministic)

        feat_mask = None
        if attention_mask is not None:
            feat_mask = feature_space_attention_mask(cfg, attention_mask,
                                                     hidden.shape[1])

        # declared unconditionally so the param tree is checkpoint-stable
        masked_embed = self.param(
            "masked_spec_embed",
            lambda key, shape: jax.random.uniform(key, shape),
            (cfg.hidden_size,))
        if mask_time_indices is not None:
            # SpecAugment-style time masking with the learned mask embedding
            hidden = jnp.where(mask_time_indices[..., None],
                               masked_embed[None, None, :].astype(hidden.dtype),
                               hidden)

        hidden = Encoder(cfg, dtype=self.dtype, name="encoder")(
            hidden, feat_mask, deterministic)
        return hidden
