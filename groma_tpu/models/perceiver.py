"""Perceiver: DINOv2 backbone + input-projection pyramid + DDETR head.

Re-design of the reference's CustomDDETRModel
(reference: groma/model/ddetr.py:98-196): the frozen ViT's last-4 hidden
states are averaged, reshaped to a 2D map, pushed through per-level conv
projections (stride-2 down, identity, 2x up, 4x up — list reversed so
level 0 is the most upsampled, reference: ddetr.py:113-152), and fed to the
two-stage DDETR transformer.  NHWC layout throughout; the reference's
channel-first LayerNorm (ddetr.py:25-45) becomes a plain last-axis
LayerNorm.
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp

from groma_tpu.config import PerceiverConfig
from groma_tpu.models.ddetr import DDETRTransformer
from groma_tpu.models.dinov2 import Dinov2Model


class InputProj(nn.Module):
    """One pyramid level projection.  ``level`` is the *pre-reversal* recipe
    index from the reference (0=stride-2 down … 3=4x up); ``single`` is the
    one-level configuration (plain 1x1 conv, reference: ddetr.py:146-151)."""
    d_model: int
    level: int
    single: bool = False
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        ln = lambda name: nn.LayerNorm(epsilon=self.eps, name=name)
        if self.single or self.level == 1:
            x = nn.Conv(d, (1, 1), name='conv0')(x)
            return ln('ln0')(x)
        if self.level == 0:
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name='conv0')(x)
            return ln('ln0')(x)
        if self.level == 2:
            x = nn.ConvTranspose(d // 2, (2, 2), strides=(2, 2),
                                 name='convt0')(x)
            x = nn.Conv(d, (1, 1), name='conv1')(x)
            x = ln('ln0')(x)
            return nn.Conv(d, (3, 3), padding=((1, 1), (1, 1)),
                           name='conv2')(x)
        if self.level == 3:
            x = nn.ConvTranspose(d // 2, (2, 2), strides=(2, 2),
                                 name='convt0')(x)
            x = ln('ln0')(x)
            x = nn.gelu(x, approximate=False)
            x = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                                 name='convt1')(x)
            x = nn.Conv(d, (1, 1), name='conv1')(x)
            x = ln('ln1')(x)
            return nn.Conv(d, (3, 3), padding=((1, 1), (1, 1)),
                           name='conv2')(x)
        raise ValueError('only up to 4 feature levels')


class Perceiver(nn.Module):
    cfg: PerceiverConfig

    def setup(self):
        c = self.cfg
        self.vis_encoder = Dinov2Model(
            c.vit, deploy_image_size=c.image_size, name='vis_encoder')
        nfl = c.ddetr.num_feature_levels
        if nfl == 1:
            self.input_proj = [InputProj(c.ddetr.d_model, 1, single=True,
                                         name='input_proj_0')]
        else:
            # reference reverses the recipe list (ddetr.py:152)
            order = list(range(nfl))[::-1]
            self.input_proj = [
                InputProj(c.ddetr.d_model, lvl, name=f'input_proj_{i}')
                for i, lvl in enumerate(order)]
        self.ddetr_transformer = DDETRTransformer(c.ddetr,
                                                  name='ddetr_transformer')

    def encode_image(self, images, use_flash=False):
        """images: (B, H, W, 3) normalized pixels -> ViT hidden states."""
        _, hidden_states = self.vis_encoder(images, use_flash=use_flash)
        return hidden_states

    def ddetr_features(self, hidden_states):
        """mean of last-k hidden states, CLS dropped, as (B, h, w, C)
        (reference: groma/model/ddetr.py:177-184)."""
        c = self.cfg
        feats = jnp.mean(
            jnp.stack(hidden_states[-c.vis_feature_layers:]), axis=0)[:, 1:]
        b, l, d = feats.shape
        g = int(round(l ** 0.5))
        return feats.reshape(b, g, g, d)

    def propose(self, hidden_states, deterministic=True):
        """ViT hidden states -> DDETR outputs (boxes + dual objectness)."""
        feat2d = self.ddetr_features(hidden_states)
        srcs = [proj(feat2d) for proj in self.input_proj]
        return self.ddetr_transformer(srcs, deterministic=deterministic)

    def __call__(self, images, deterministic=True, use_flash=False):
        hidden_states = self.encode_image(images, use_flash=use_flash)
        return self.propose(hidden_states, deterministic=deterministic)
