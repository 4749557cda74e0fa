"""CLIP text + vision encoders (Flax), transformers-compatible.

The reference conditions every UNet cross-attention on CLIP text embeddings
(reference magicanimate/pipelines/pipeline_animation.py:184-271 _encode_prompt,
animation.py:76 CLIPTextModel.from_pretrained) and its EMO pipeline loads a
CLIPVisionModelWithProjection as the identity/image encoder (reference
EMOAnimationPipeline.py:867, Net.py:421-430 EMOModel(image_encoder=...)).

These modules reproduce the exact compute of transformers' CLIPTextModel /
CLIPVisionModelWithProjection (openai/clip-vit-large-patch14 layout — the
encoder SD-1.5 ships) so real checkpoints import key-for-key via
emox.interop.torch_import.import_clip_{text,vision}. Sequences are tiny
(77 text tokens / 257 patches), so attention runs through plain XLA einsum
with the causal mask — no Pallas needed at this size.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from emox.core.config import CLIPConfig

_NEG_INF = -1e9


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"unknown CLIP activation {name!r}")


class CLIPAttention(nn.Module):
    """Multi-head self-attention with optional causal mask (biased q/k/v/out,
    transformers CLIPAttention)."""

    heads: int
    causal: bool = False
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, L, C]
        b, l, c = x.shape
        hd = c // self.heads
        dense = lambda name: nn.Dense(c, dtype=self.dtype, param_dtype=self.param_dtype, name=name)
        split = lambda y: y.reshape(b, l, self.heads, hd).transpose(0, 2, 1, 3)
        q = split(dense("to_q")(x)) * (hd ** -0.5)
        k = split(dense("to_k")(x))
        v = split(dense("to_v")(x))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        if self.causal:
            mask = jnp.tril(jnp.ones((l, l), bool))
            s = jnp.where(mask[None, None], s, _NEG_INF)
        p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", p, v).transpose(0, 2, 1, 3).reshape(b, l, c)
        return dense("to_out")(o)


class CLIPEncoderLayer(nn.Module):
    heads: int
    causal: bool
    hidden_act: str
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = nn.LayerNorm(epsilon=1e-5, name="norm1", **kw)(x)
        x = x + CLIPAttention(self.heads, causal=self.causal, name="attn", **kw)(h)
        h = nn.LayerNorm(epsilon=1e-5, name="norm2", **kw)(x)
        h = nn.Dense(4 * x.shape[-1], name="fc1", **kw)(h)
        h = _act(self.hidden_act)(h)
        return x + nn.Dense(x.shape[-1], name="fc2", **kw)(h)


class CLIPTextEncoder(nn.Module):
    """transformers CLIPTextModel: token+position embeddings -> causal
    transformer -> final LayerNorm. Returns the per-token hidden states the
    SD UNet cross-attends to (reference pipeline_animation.py:236-241)."""

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jax.Array) -> jax.Array:  # [B, L] int32 -> [B, L, C]
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        tok = nn.Embed(cfg.vocab_size, cfg.text_hidden_dim, name="token_embedding",
                       dtype=self.dtype, param_dtype=self.param_dtype)(input_ids)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (cfg.max_positions, cfg.text_hidden_dim), self.param_dtype,
        )
        x = tok + pos[None, : input_ids.shape[1]].astype(self.dtype)
        for i in range(cfg.text_layers):
            x = CLIPEncoderLayer(
                cfg.text_heads, causal=True, hidden_act=cfg.hidden_act, name=f"layer_{i}", **kw
            )(x)
        return nn.LayerNorm(epsilon=1e-5, name="final_norm", **kw)(x)

    def pooled(self, input_ids: jax.Array, eos_token_id: int = 49407) -> jax.Array:
        """EOS-token pooled embedding (transformers pooled_output)."""
        hidden = self(input_ids)
        idx = jnp.argmax((input_ids == eos_token_id).astype(jnp.int32), axis=1)
        return jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]


class CLIPVisionEncoder(nn.Module):
    """transformers CLIPVisionModelWithProjection: patch conv (no bias) +
    class token + position embeddings -> pre-LN -> transformer -> post-LN on
    the class token -> linear projection (no bias). Returns the projected
    image embedding (reference EMOAnimationPipeline.py:867's image_enc)."""

    cfg: CLIPConfig
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, project: bool = True) -> jax.Array:
        """images [B, H, W, 3] (CLIP-normalised) -> [B, proj] (project=True)
        or per-patch hidden states [B, 1+P, C]."""
        cfg = self.cfg
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        b = images.shape[0]
        patches = nn.Conv(
            cfg.vision_hidden_dim, (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size), use_bias=False,
            name="patch_embedding", **kw,
        )(images.astype(self.dtype))
        p = patches.reshape(b, -1, cfg.vision_hidden_dim)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.vision_hidden_dim,), self.param_dtype)
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.vision_hidden_dim)), p], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.01),
            (1 + (cfg.image_size // cfg.patch_size) ** 2, cfg.vision_hidden_dim), self.param_dtype,
        )
        x = x + pos[None, : x.shape[1]].astype(self.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="pre_norm", **kw)(x)
        for i in range(cfg.vision_layers):
            x = CLIPEncoderLayer(
                cfg.vision_heads, causal=False, hidden_act=cfg.hidden_act, name=f"layer_{i}", **kw
            )(x)
        if not project:
            return x
        pooled = nn.LayerNorm(epsilon=1e-5, name="post_norm", **kw)(x[:, 0])
        return nn.Dense(cfg.projection_dim, use_bias=False, name="visual_projection", **kw)(pooled)


# openai CLIP image preprocessing constants (transformers CLIPImageProcessor)
CLIP_IMAGE_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_IMAGE_STD = (0.26862954, 0.26130258, 0.27577711)


def clip_normalize(images_01: jax.Array) -> jax.Array:
    """[0,1]-ranged [B,H,W,3] -> CLIP-normalised."""
    mean = jnp.asarray(CLIP_IMAGE_MEAN, images_01.dtype)
    std = jnp.asarray(CLIP_IMAGE_STD, images_01.dtype)
    return (images_01 - mean) / std
