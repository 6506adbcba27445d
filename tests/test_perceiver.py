"""Perceiver tests: conv-pyramid importer parity vs a torch replica of the
reference recipes (incl. ConvTranspose kernel layout), and forward shape
contracts for 1- and 4-level configurations."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from groma_tpu.config import DDETRConfig, PerceiverConfig, ViTConfig
from groma_tpu.models.perceiver import InputProj, Perceiver
from groma_tpu.checkpoint.hf_import import import_input_proj
import pytest

D = 16  # d_model


def _ln(x, w, b):
    # channel-first LayerNorm (reference: groma/model/ddetr.py:25-45)
    u = x.mean(1, keepdim=True)
    s = (x - u).pow(2).mean(1, keepdim=True)
    return w[:, None, None] * (x - u) / torch.sqrt(s + 1e-6) + b[:, None, None]


def _torch_level(recipe, sd, prefix, x):
    """Reference Sequential recipes (reference: ddetr.py:113-152)."""
    g = lambda k: sd[prefix + k]
    if recipe == 0:
        y = F.conv2d(x, g('0.weight'), g('0.bias'), stride=2, padding=1)
        return _ln(y, g('1.weight'), g('1.bias'))
    if recipe == 1:
        y = F.conv2d(x, g('0.weight'), g('0.bias'))
        return _ln(y, g('1.weight'), g('1.bias'))
    if recipe == 2:
        y = F.conv_transpose2d(x, g('0.weight'), g('0.bias'), stride=2)
        y = F.conv2d(y, g('1.weight'), g('1.bias'))
        y = _ln(y, g('2.weight'), g('2.bias'))
        return F.conv2d(y, g('3.weight'), g('3.bias'), padding=1)
    if recipe == 3:
        y = F.conv_transpose2d(x, g('0.weight'), g('0.bias'), stride=2)
        y = _ln(y, g('1.weight'), g('1.bias'))
        y = F.gelu(y)
        y = F.conv_transpose2d(y, g('3.weight'), g('3.bias'), stride=2)
        y = F.conv2d(y, g('4.weight'), g('4.bias'))
        y = _ln(y, g('5.weight'), g('5.bias'))
        return F.conv2d(y, g('6.weight'), g('6.bias'), padding=1)


def _mk_pyramid_weights(rng, in_ch):
    t = lambda *s: torch.from_numpy(
        rng.standard_normal(s).astype(np.float32) * 0.1)
    sd = {}
    # reversed order: flax input_proj_0 == reference input_proj.0 == recipe 3
    recipes = [3, 2, 1, 0]
    for i, r in enumerate(recipes):
        p = f'input_proj.{i}.'
        if r == 0:
            sd[p + '0.weight'] = t(D, in_ch, 3, 3)
            sd[p + '0.bias'] = t(D)
            sd[p + '1.weight'] = t(D); sd[p + '1.bias'] = t(D)
        elif r == 1:
            sd[p + '0.weight'] = t(D, in_ch, 1, 1)
            sd[p + '0.bias'] = t(D)
            sd[p + '1.weight'] = t(D); sd[p + '1.bias'] = t(D)
        elif r == 2:
            sd[p + '0.weight'] = t(in_ch, D // 2, 2, 2)   # convT: (in,out,k,k)
            sd[p + '0.bias'] = t(D // 2)
            sd[p + '1.weight'] = t(D, D // 2, 1, 1)
            sd[p + '1.bias'] = t(D)
            sd[p + '2.weight'] = t(D); sd[p + '2.bias'] = t(D)
            sd[p + '3.weight'] = t(D, D, 3, 3); sd[p + '3.bias'] = t(D)
        elif r == 3:
            sd[p + '0.weight'] = t(in_ch, D // 2, 2, 2)
            sd[p + '0.bias'] = t(D // 2)
            sd[p + '1.weight'] = t(D // 2); sd[p + '1.bias'] = t(D // 2)
            sd[p + '3.weight'] = t(D // 2, D // 4, 2, 2)
            sd[p + '3.bias'] = t(D // 4)
            sd[p + '4.weight'] = t(D, D // 4, 1, 1); sd[p + '4.bias'] = t(D)
            sd[p + '5.weight'] = t(D); sd[p + '5.bias'] = t(D)
            sd[p + '6.weight'] = t(D, D, 3, 3); sd[p + '6.bias'] = t(D)
    return sd, recipes


def test_input_proj_importer_matches_torch(rng):
    in_ch = 8
    sd_t, recipes = _mk_pyramid_weights(rng, in_ch)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    params = import_input_proj(sd, num_feature_levels=4)

    x = rng.standard_normal((2, in_ch, 8, 8)).astype(np.float32)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    for i, r in enumerate(recipes):
        mod = InputProj(D, r)
        got = mod.apply({'params': params[f'input_proj_{i}']}, xj)
        want = _torch_level(r, sd_t, f'input_proj.{i}.',
                            torch.from_numpy(x))
        want = want.permute(0, 2, 3, 1).detach().numpy()
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-5,
                                   err_msg=f'recipe {r}')


@pytest.mark.slow
def test_perceiver_four_level_forward(rng):
    vit = ViTConfig(hidden_size=32, num_layers=2, num_heads=4,
                    patch_size=14, image_size=112, dtype='float32')
    ddetr = DDETRConfig(d_model=32, num_queries=16, encoder_layers=1,
                        decoder_layers=1, num_heads=4, ffn_dim=64,
                        num_feature_levels=4, dtype='float32')
    cfg = PerceiverConfig(vit=vit, ddetr=ddetr, image_size=112)
    model = Perceiver(cfg)
    img = jnp.asarray(rng.standard_normal((1, 112, 112, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)['params']
    out = model.apply({'params': params}, img)
    assert out['pred_boxes'].shape == (1, 16, 4)
    # source sizes: 8x8 base -> levels (32,16,8,4) flattened
    s = 32 * 32 + 16 * 16 + 8 * 8 + 4 * 4
    assert out['enc_outputs_class'].shape == (1, s, 1)
