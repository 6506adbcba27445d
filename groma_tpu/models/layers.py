"""Shared flax building blocks for the Groma-TPU model stack."""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from groma_tpu.ops.flash_attention import flash_attention


class MLP(nn.Module):
    """ReLU-intermediate MLP head (reference: groma/model/roi_align.py:25-38
    and HF DeformableDetrMLPPredictionHead used at
    groma/model/ddetr_transformer.py:331)."""
    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: jnp.dtype = jnp.float32
    final_kernel_init: object = None
    final_bias_init: object = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            kw = {}
            if last and self.final_kernel_init is not None:
                kw['kernel_init'] = self.final_kernel_init
            if last and self.final_bias_init is not None:
                kw['bias_init'] = self.final_bias_init
            x = nn.Dense(self.output_dim if last else self.hidden_dim,
                         dtype=self.dtype, name=f'layers_{i}', **kw)(x)
            if not last:
                x = nn.relu(x)
        return x


def multi_head_attention(q, k, v, num_heads: int,
                         kv_mask: Optional[jnp.ndarray] = None,
                         causal: bool = False,
                         use_flash: bool = False,
                         attn_bias: Optional[jnp.ndarray] = None):
    """Plain MHA over (B, S, D) projections already split externally.

    q/k/v: (B, S, D_model); reshaped to heads internally.
    """
    b, sq, d = q.shape
    skv = k.shape[1]
    hd = d // num_heads

    def split(x, s):
        return x.reshape(b, s, num_heads, hd).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q, sq), split(k, skv), split(v, skv)
    if use_flash and attn_bias is None:
        out = flash_attention(qh, kh, vh, kv_mask=kv_mask, causal=causal)
    else:
        # bf16 models store scores in bf16 (torch-bf16-autocast semantics
        # — torch softmax upcasts arithmetic to fp32 but the score tensor
        # lives in bf16); halves the dominant HBM term at ViT@448 shapes
        # (1.42 vs 1.85 ms/layer measured).  fp32 models keep fp32 scores.
        score_dtype = jnp.bfloat16 if q.dtype == jnp.bfloat16 \
            else jnp.float32
        scale = hd ** -0.5
        s = jnp.einsum('bhqd,bhkd->bhqk', qh, kh,
                       preferred_element_type=score_dtype) \
            * jnp.asarray(scale, score_dtype)
        if attn_bias is not None:
            s = s + attn_bias.astype(score_dtype)
        if kv_mask is not None:
            s = jnp.where(kv_mask[:, None, None, :], s,
                          jnp.asarray(-1e30, jnp.float32).astype(score_dtype))
        if causal:
            qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
            kj = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
            s = jnp.where((kj <= qi + (skv - sq))[None, None], s,
                          jnp.asarray(-1e30, jnp.float32).astype(score_dtype))
        p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
        out = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), vh,
                         preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, d).astype(q.dtype)


def sine_position_embedding_2d(h: int, w: int, dim: int,
                               temperature: float = 10000.0,
                               normalize: bool = True,
                               scale: float = 2 * math.pi,
                               eps: float = 1e-6) -> jnp.ndarray:
    """(h, w, dim) sine/cosine position encoding, HF DeformableDetr
    ``DeformableDetrSinePositionEmbedding`` semantics with an all-valid mask
    (Groma always feeds full 448x448 images, reference:
    groma/model/ddetr.py:187 masks of ones).  y first, then x.
    """
    half = dim // 2
    y = jnp.arange(1, h + 1, dtype=jnp.float32)[:, None]
    x = jnp.arange(1, w + 1, dtype=jnp.float32)[None, :]
    y = jnp.broadcast_to(y, (h, w))
    x = jnp.broadcast_to(x, (h, w))
    if normalize:
        y = y / (h + eps) * scale
        x = x / (w + eps) * scale
    dim_t = jnp.arange(half, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / half)
    pos_x = x[:, :, None] / dim_t
    pos_y = y[:, :, None] / dim_t
    pos_x = jnp.stack([jnp.sin(pos_x[:, :, 0::2]),
                       jnp.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, half)
    pos_y = jnp.stack([jnp.sin(pos_y[:, :, 0::2]),
                       jnp.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, half)
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def proposal_position_embedding(proposals: jnp.ndarray,
                                num_pos_feats: int = 128,
                                temperature: float = 10000.0) -> jnp.ndarray:
    """Position embedding of (…, 4) proposal logits, applied after sigmoid
    (reference: groma/model/ddetr_transformer.py:432-446
    get_proposal_pos_embed)."""
    scale = 2 * math.pi
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = temperature ** (2 * jnp.floor(dim_t / 2) / num_pos_feats)
    pos = jax.nn.sigmoid(proposals) * scale
    pos = pos[..., None] / dim_t                      # (..., 4, F)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])],
                    axis=-1)
    return pos.reshape(*proposals.shape[:-1], 4 * num_pos_feats)
