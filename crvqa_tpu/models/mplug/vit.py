"""CLIP vision transformer for mPLUG — flax re-design.

Re-implements the visual tower used by the reference
(`mPLUG/models/clip/model.py:VisualTransformer` — conv patch embed, class
token, pre-LN residual attention blocks with QuickGELU, ln_post;
`skip_last_layer=True` returns the 768-d patch sequence without the CLIP
projection, `model.py:229-249`). ViT-B-16 at 384x384 -> 577 tokens.

Param naming mirrors the torch module tree (`visual.transformer.resblocks.i.
mlp.c_fc` etc.) so the mPLUG mask specs (`mPLUG/masking/maskers.py:16-24`)
and checkpoint interop line up.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .. import layers as _layers


def clip_normalize_u8(images: jnp.ndarray) -> jnp.ndarray:
    """On-device ((x/255) - CLIP_MEAN) / CLIP_STD for uint8 [B, H, W, 3] —
    the same fp32 arithmetic as the host path (`data/augment._normalize_u8`,
    the single home of the constants), fused into the patch conv by XLA."""
    from ...data.augment import CLIP_MEAN, CLIP_STD

    x = images.astype(jnp.float32) / 255.0
    return (x - jnp.asarray(CLIP_MEAN)) / jnp.asarray(CLIP_STD)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


# CLIP's LayerNorm is torch nn.LayerNorm with its DEFAULT eps=1e-5
# (clip/model.py:157-163) — NOT flax's 1e-6 default and NOT BERT's 1e-12;
# caught by tests/test_ref_oracle_mplug.py::test_vit_tower_oracle


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_res: int = 384
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    attn_dropout: float = 0.1
    dtype: Any = jnp.float32
    # activation checkpointing over the 577-token blocks (the reference's
    # DeepSpeed partition_activations covers the whole model incl. the ViT,
    # ds_config.json:12-16) -> flax nn.remat per resblock
    use_remat: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_res // self.patch_size) ** 2

    @classmethod
    def tiny(cls, **kw) -> "ViTConfig":
        base = dict(image_res=32, patch_size=16, width=32, layers=2, heads=4)
        base.update(kw)
        return cls(**base)

    @classmethod
    def vit_l_14(cls, image_res: int = 392, **kw) -> "ViTConfig":
        """CLIP ViT-L-14 (`models/visual_transformers.py:46-47`). Default
        resolution 392 (= 28 * 14): the reference pairs `clip_name:
        ViT-L-14` with whatever `image_res` the yaml sets, but its
        `int(res^2/14^2)` patch count only matches the conv grid when res is
        a multiple of 14 — at the B-16 default 384 its pos-embed (753 rows)
        disagrees with the 730-token conv output and the torch add fails.
        Our pos table is sized off the true grid, so any multiple of 14
        works."""
        base = dict(image_res=image_res, patch_size=14, width=1024,
                    layers=24, heads=16)
        base.update(kw)
        return cls(**base)


class ResidualAttentionBlock(nn.Module):
    """Pre-LN block: x += attn(ln_1(x)); x += mlp(ln_2(x)) with QuickGELU
    (`clip/model.py:ResidualAttentionBlock`)."""

    config: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        c = self.config
        h = nn.LayerNorm(epsilon=1e-5, name="ln_1", dtype=c.dtype)(x)
        # torch nn.MultiheadAttention: fused qkv (in_proj) + out_proj
        qkv = nn.Dense(3 * c.width, dtype=c.dtype, name="attn_in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        hd = c.width // c.heads

        use_midseq = False
        if _layers.MIDSEQ_ATTENTION and x.shape[1] * c.heads > 1024:
            from ...ops import midseq_attention as _ma

            # the 577-token self-attention is the dominant mPLUG cost; the
            # kernel keeps each head's [S, S] probs in VMEM instead of the
            # [B, H, S, S] HBM tensor XLA materializes per layer. Same
            # mid-length-only lower bound as layers._attend: short contexts
            # (tiny test configs) stay on XLA — the x128 key-lane padding
            # would dominate them
            use_midseq = _ma.supported(
                x.shape[0], x.shape[1], x.shape[1], c.heads, hd,
                jnp.dtype(c.dtype).itemsize)
        if use_midseq:
            from ...ops.midseq_attention import midseq_attention_seeded

            bias, seed, rate = _layers.kernel_bias_and_seed(
                self, None, q, k, deterministic, rate=c.attn_dropout)
            ctx = midseq_attention_seeded(
                q, k, v, bias, seed, c.heads, hd, rate,
                _layers.FUSED_ATTENTION_INTERPRET)
        else:
            def split_heads(t):
                return t.reshape(t.shape[0], t.shape[1], c.heads, hd)

            scores = jnp.einsum("bqhd,bkhd->bhqk",
                                split_heads(q), split_heads(k))
            scores = (scores.astype(jnp.float32)
                      / jnp.sqrt(hd).astype(jnp.float32))
            probs = jax.nn.softmax(scores, axis=-1).astype(c.dtype)
            probs = nn.Dropout(c.attn_dropout)(probs,
                                               deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs, split_heads(v))
            ctx = ctx.reshape(x.shape[0], x.shape[1], c.width)
        attn_out = nn.Dense(c.width, dtype=c.dtype, name="attn_out_proj")(ctx)
        x = x + attn_out

        h = nn.LayerNorm(epsilon=1e-5, name="ln_2", dtype=c.dtype)(x)
        h = nn.Dense(4 * c.width, dtype=c.dtype, name="mlp_c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(c.width, dtype=c.dtype, name="mlp_c_proj")(h)
        return x + h


class VisionTransformer(nn.Module):
    """`VisualTransformer.forward(skip_last_layer=True)` (model.py:229-249):
    conv patch embed -> [cls; patches] + pos -> ln_pre -> blocks -> ln_post,
    no projection."""

    config: ViTConfig

    @nn.compact
    def __call__(self, images, deterministic=True):
        c = self.config
        if images.dtype == jnp.uint8:
            # device-side CLIP normalize: the loaders' raw path ships uint8
            # (4x less host->device traffic; every transform op upstream is
            # uint8->uint8, so nothing is lost). Exact fp32 arithmetic of
            # data/augment._normalize_u8 — bit-identical activations either
            # way (equivalence-tested), then the model's own dtype applies.
            images = clip_normalize_u8(images)
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    dtype=c.dtype, name="conv1")(images)
        b = x.shape[0]
        x = x.reshape(b, -1, c.width)  # [B, grid^2, width]
        cls_emb = self.param("class_embedding",
                             nn.initializers.normal(stddev=c.width ** -0.5),
                             (c.width,), jnp.float32)
        cls_tok = jnp.broadcast_to(cls_emb.astype(c.dtype), (b, 1, c.width))
        x = jnp.concatenate([cls_tok, x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(stddev=c.width ** -0.5),
                         (c.num_patches + 1, c.width), jnp.float32)
        x = x + pos[None, : x.shape[1]].astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre", dtype=c.dtype)(x)
        block_cls = (nn.remat(ResidualAttentionBlock, static_argnums=(2,))
                     if c.use_remat else ResidualAttentionBlock)
        for i in range(c.layers):
            x = block_cls(c, name=f"resblocks_{i}")(
                x, deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="ln_post", dtype=c.dtype)(x)


def interpolate_pos_embed(pos: jnp.ndarray, new_num_patches: int) -> jnp.ndarray:
    """Bilinear pos-embed resize for a new image resolution
    (`models/visual_transformers.py:resize_pos_embed`,
    `models/vit.py:interpolate_pos_embed`)."""
    cls, grid = pos[:1], pos[1:]
    old = int(grid.shape[0] ** 0.5)
    new = int(new_num_patches ** 0.5)
    if old == new:
        return pos
    grid = grid.reshape(old, old, -1)
    grid = jax.image.resize(grid, (new, new, grid.shape[-1]), method="bicubic")
    return jnp.concatenate([cls, grid.reshape(new * new, -1)], axis=0)
