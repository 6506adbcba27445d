"""DINOv2 ViT encoder in flax, HF ``Dinov2Model`` semantics.

The reference uses the frozen HF Dinov2Model as the visual backbone
(reference: groma/model/ddetr.py:104-107) and taps *pre-final-LayerNorm*
per-layer hidden states: hidden_states[-1] feeds the image-token stream,
the mean of hidden_states[-4:] feeds the DDETR proposer, hidden_states[-3:]
feed the region encoder (reference: groma/model/groma.py:222-241,312).

TPU-first notes:
* channels-last NHWC patchify via a single reshaped matmul (MXU-friendly;
  a 14x14 conv with stride 14 is exactly a (196*3, C) GEMM),
* position embeddings stored at the *deployment* grid (e.g. 32x32 for 448²)
  — torch-bicubic interpolation from the 518² checkpoint grid happens once
  at weight-import time (checkpoint/hf_import.py), never per step,
* optional Pallas flash attention for the 1025-token sequence at train time.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from groma_tpu.config import ViTConfig
from groma_tpu.models.layers import multi_head_attention


class Dinov2Layer(nn.Module):
    cfg: ViTConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, use_flash=False):
        c = self.cfg
        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name='norm1')(x)
        # fused qkv: one (D, 3D) GEMM instead of three (importer concats
        # the HF q/k/v kernels)
        qkv = nn.Dense(3 * c.hidden_size, dtype=self.dtype, name='qkv')(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = multi_head_attention(q, k, v, c.num_heads, use_flash=use_flash)
        attn = nn.Dense(c.hidden_size, dtype=self.dtype, name='attn_out')(attn)
        ls1 = self.param('layerscale1', nn.initializers.constant(
            c.layerscale_value), (c.hidden_size,))
        x = x + attn * ls1.astype(self.dtype)

        h = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=self.dtype,
                         name='norm2')(x)
        inner = int(c.hidden_size * c.mlp_ratio)
        if c.use_swiglu_ffn:
            # dinov2-giant variant; kept for config completeness
            h12 = nn.Dense(2 * ((inner * 2 // 3 + 7) // 8 * 8),
                           dtype=self.dtype, name='weights_in')(h)
            h1, h2 = jnp.split(h12, 2, axis=-1)
            h = nn.silu(h1) * h2
            h = nn.Dense(c.hidden_size, dtype=self.dtype,
                         name='weights_out')(h)
        else:
            h = nn.Dense(inner, dtype=self.dtype, name='fc1')(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(c.hidden_size, dtype=self.dtype, name='fc2')(h)
        ls2 = self.param('layerscale2', nn.initializers.constant(
            c.layerscale_value), (c.hidden_size,))
        return x + h * ls2.astype(self.dtype)


class Dinov2Model(nn.Module):
    """Returns (last_hidden_state, hidden_states tuple).

    ``hidden_states`` follows the HF contract: entry 0 is the embedding
    output, entry i the output of layer i, all *without* the final
    LayerNorm; ``last_hidden_state`` is LayerNorm(hidden_states[-1]).
    """
    cfg: ViTConfig
    deploy_image_size: Optional[int] = None   # pos-embed grid; default cfg
    remat: bool = False   # per-layer activation rematerialization
    # (gradient checkpointing for the vision tower — headroom beyond the
    # reference, which always freezes the ViT; SURVEY §2.8)

    @nn.compact
    def __call__(self, pixel_values, use_flash=False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        img = self.deploy_image_size or c.image_size
        grid = img // c.patch_size
        b, hh, ww, _ = pixel_values.shape
        assert hh == img and ww == img, (
            f'model compiled for {img}², got {hh}x{ww}')

        # patchify: (B, G, p, G, p, 3) -> (B, G*G, p*p*3) -> GEMM
        x = pixel_values.astype(dtype).reshape(
            b, grid, c.patch_size, grid, c.patch_size, c.num_channels)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, grid * grid, c.patch_size * c.patch_size * c.num_channels)
        x = nn.Dense(c.hidden_size, dtype=dtype, name='patch_embed')(x)

        cls = self.param('cls_token', nn.initializers.zeros,
                         (1, 1, c.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (b, 1, c.hidden_size)), x],
            axis=1)
        pos = self.param('pos_embed', nn.initializers.zeros,
                         (1, 1 + grid * grid, c.hidden_size))
        x = x + pos.astype(dtype)

        layer_cls = nn.remat(Dinov2Layer, static_argnums=(2,)) \
            if self.remat else Dinov2Layer
        hidden_states = [x]
        for i in range(c.num_layers):
            x = layer_cls(c, dtype, name=f'layer_{i}')(x, use_flash)
            hidden_states.append(x)
        last = nn.LayerNorm(epsilon=c.layer_norm_eps, dtype=dtype,
                            name='norm')(x)
        return last, tuple(hidden_states)
