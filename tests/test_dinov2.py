"""DINOv2 flax vs installed HF torch Dinov2Model parity (tiny config)."""

import numpy as np
import jax.numpy as jnp
import torch

from groma_tpu.config import ViTConfig
from groma_tpu.models.dinov2 import Dinov2Model
import pytest
from groma_tpu.checkpoint.hf_import import (
    import_dinov2, to_numpy_state_dict, interpolate_pos_embed)


def _torch_model():
    from transformers import Dinov2Config, Dinov2Model as TorchDinov2
    cfg = Dinov2Config(image_size=56, patch_size=14, hidden_size=32,
                       num_hidden_layers=2, num_attention_heads=4,
                       mlp_ratio=4, layerscale_value=1.0,
                       hidden_act='gelu', attention_probs_dropout_prob=0.0,
                       hidden_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(0)
    return TorchDinov2(cfg).eval()


@pytest.mark.slow
def test_dinov2_matches_hf(rng):
    tm = _torch_model()
    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4, patch_size=14,
                    image_size=56, dtype='float32')
    params = import_dinov2(to_numpy_state_dict(tm), num_layers=2,
                           patch_size=14)

    img = rng.standard_normal((2, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        out = tm(torch.from_numpy(img), output_hidden_states=True)

    model = Dinov2Model(cfg)
    last, hidden = model.apply({'params': params},
                               jnp.asarray(img.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(last),
                               out.last_hidden_state.numpy(), atol=2e-5)
    assert len(hidden) == len(out.hidden_states)
    for got, want in zip(hidden, out.hidden_states):
        np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=2e-5)


def test_pos_embed_bicubic_matches_torch(rng):
    # importer's bicubic must match torch F.interpolate bicubic
    src_grid, dst_grid, c = 7, 5, 6
    pos = rng.standard_normal((1, 1 + src_grid * src_grid, c)).astype(np.float32)
    got = interpolate_pos_embed(pos, src_grid, dst_grid)
    patch = torch.from_numpy(
        pos[:, 1:].reshape(1, src_grid, src_grid, c)).permute(0, 3, 1, 2)
    want = torch.nn.functional.interpolate(
        patch, size=(dst_grid, dst_grid), mode='bicubic',
        align_corners=False).permute(0, 2, 3, 1).reshape(1, -1, c).numpy()
    np.testing.assert_allclose(got[:, 1:], want, atol=1e-5)
    np.testing.assert_allclose(got[:, :1], pos[:, :1], atol=0)


@pytest.mark.slow
def test_dinov2_remat_matches(rng):
    """remat=True (gradient checkpointing) changes memory, not values
    or gradients (SURVEY §2.8 gradient-checkpointing row)."""
    import jax
    cfg = ViTConfig(hidden_size=32, num_layers=2, num_heads=4,
                    patch_size=14, image_size=28, dtype='float32')
    img = jnp.asarray(rng.standard_normal((1, 28, 28, 3)), jnp.float32)
    m0, m1 = Dinov2Model(cfg), Dinov2Model(cfg, remat=True)
    params = m0.init(jax.random.PRNGKey(0), img)['params']

    def loss(m):
        def f(p, im):
            last, _ = m.apply({'params': p}, im)
            return jnp.sum(last ** 2)
        return f

    l0, g0 = jax.value_and_grad(loss(m0))(params, img), None
    l1 = jax.value_and_grad(loss(m1))(params, img)
    np.testing.assert_allclose(np.asarray(l0[0]), np.asarray(l1[0]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(l0[1]),
                    jax.tree_util.tree_leaves(l1[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)
