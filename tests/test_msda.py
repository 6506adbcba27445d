"""MSDA parity vs the pure-torch reference implementation shipped in the
installed transformers package (the same math as the reference's CUDA
kernel fallback, reference: mmcv/mmcv/ops/multi_scale_deform_attn.py:93)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from groma_tpu.ops.msda import ms_deform_attn, sampling_locations_from_reference


def torch_msda(value, spatial_shapes, sampling_locations, attention_weights):
    """Independent torch restatement of grid_sample-based MSDA."""
    import torch.nn.functional as F
    bs, _, num_heads, embed_dims = value.shape
    _, num_queries, _, num_levels, num_points, _ = sampling_locations.shape
    value_list = value.split([h * w for h, w in spatial_shapes], dim=1)
    sampling_grids = 2 * sampling_locations - 1
    sampling_value_list = []
    for level, (h, w) in enumerate(spatial_shapes):
        value_l = (value_list[level].flatten(2).transpose(1, 2)
                   .reshape(bs * num_heads, embed_dims, h, w))
        grid_l = (sampling_grids[:, :, :, level].transpose(1, 2)
                  .flatten(0, 1))
        sampled = F.grid_sample(value_l, grid_l, mode='bilinear',
                                padding_mode='zeros', align_corners=False)
        sampling_value_list.append(sampled)
    attn = attention_weights.transpose(1, 2).reshape(
        bs * num_heads, 1, num_queries, num_levels * num_points)
    out = ((torch.stack(sampling_value_list, dim=-2).flatten(-2) * attn)
           .sum(-1).view(bs, num_heads * embed_dims, num_queries))
    return out.transpose(1, 2).contiguous()


@pytest.mark.parametrize('shapes', [((8, 8),), ((16, 16), (8, 8), (4, 4))])
def test_msda_matches_torch(rng, shapes):
    b, q, nh, d, p = 2, 12, 4, 8, 4
    nl = len(shapes)
    s = sum(h * w for h, w in shapes)
    value = rng.standard_normal((b, s, nh, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(b, q, nh, nl, p, 2)).astype(np.float32)
    w = rng.uniform(0, 1, size=(b, q, nh, nl * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, nh, nl, p)

    want = torch_msda(torch.from_numpy(value), shapes,
                      torch.from_numpy(loc), torch.from_numpy(w)).numpy()
    got = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                    jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_msda_gradients(rng):
    shapes = ((6, 6),)
    b, q, nh, d, p = 1, 5, 2, 4, 3
    s = 36
    value = jnp.asarray(rng.standard_normal((b, s, nh, d)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, nh, 1, p, 2)), jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, q, nh, 1, p)), jnp.float32))

    def f(v, l, w_):
        return jnp.sum(ms_deform_attn(v, shapes, l, w_) ** 2)

    from tests.gradcheck import check_grad
    check_grad(f, (value, loc, w), atol=2e-2)


def test_sampling_locations_2d_and_4d(rng):
    shapes = ((8, 4),)
    b, q, nh, p = 1, 3, 2, 4
    off = jnp.asarray(rng.standard_normal((b, q, nh, 1, p, 2)), jnp.float32)
    ref2 = jnp.asarray(rng.uniform(0, 1, (b, q, 1, 2)), jnp.float32)
    loc2 = sampling_locations_from_reference(ref2, off, shapes, p)
    # x divided by W=4, y by H=8
    want = np.asarray(ref2)[:, :, None, :, None, :] + np.asarray(off) / np.array([4., 8.])
    np.testing.assert_allclose(np.asarray(loc2), want, atol=1e-6)

    ref4 = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, 1, 4)), jnp.float32)
    loc4 = sampling_locations_from_reference(ref4, off, shapes, p)
    want4 = (np.asarray(ref4)[:, :, None, :, None, :2]
             + np.asarray(off) / p * np.asarray(ref4)[:, :, None, :, None, 2:] * 0.5)
    np.testing.assert_allclose(np.asarray(loc4), want4, atol=1e-6)


@pytest.mark.parametrize('shapes', [((8, 8),), ((16, 16), (8, 8), (4, 4))])
def test_msda_dense_matches_gather(rng, shapes):
    from groma_tpu.ops.msda import ms_deform_attn_dense
    b, q, nh, d, p = 2, 12, 4, 8, 4
    nl = len(shapes)
    s = sum(h * w for h, w in shapes)
    value = rng.standard_normal((b, s, nh, d)).astype(np.float32)
    loc = rng.uniform(-0.1, 1.1, size=(b, q, nh, nl, p, 2)).astype(np.float32)
    w = rng.uniform(0, 1, size=(b, q, nh, nl * p)).astype(np.float32)
    w = (w / w.sum(-1, keepdims=True)).reshape(b, q, nh, nl, p)
    want = np.asarray(ms_deform_attn(jnp.asarray(value), shapes,
                                     jnp.asarray(loc), jnp.asarray(w)))
    got = np.asarray(ms_deform_attn_dense(jnp.asarray(value), shapes,
                                          jnp.asarray(loc), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_msda_dense_gradients(rng):
    from groma_tpu.ops.msda import ms_deform_attn_dense
    shapes = ((6, 6),)
    b, q, nh, d, p = 1, 5, 2, 4, 3
    value = jnp.asarray(rng.standard_normal((b, 36, nh, d)), jnp.float32)
    loc = jnp.asarray(rng.uniform(0.2, 0.8, (b, q, nh, 1, p, 2)), jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((b, q, nh, 1, p)), jnp.float32))

    def f_dense(v, l, w_):
        return jnp.sum(ms_deform_attn_dense(v, shapes, l, w_) ** 2)

    def f_gather(v, l, w_):
        return jnp.sum(ms_deform_attn(v, shapes, l, w_) ** 2)

    gd = jax.grad(f_dense, argnums=(0, 1, 2))(value, loc, w)
    gg = jax.grad(f_gather, argnums=(0, 1, 2))(value, loc, w)
    for a, b_ in zip(gd, gg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)
