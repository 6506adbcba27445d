"""Piece timing for the region encoder at b8 448 (the ~59 ms over floor).

Times each stage of RegionEncoder in isolation (same shapes the vision
pipeline produces) via time_fn_ingraph (in-graph loop + per-iteration
perturbation — immune to the tunnel's result caching).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp

from groma_tpu.models.region_encoder import (MLVLFuse, RegionEncoder,
                                             resize_bilinear_align_corners)
from groma_tpu.ops.roi_align import roi_align_batched
from groma_tpu.utils.profiling import time_fn_ingraph

B, R, D = 8, 100, 1024
ITERS = 24
rng = np.random.default_rng(0)
cdtype = jnp.bfloat16

feats_tok = [jnp.asarray(rng.standard_normal((B, 1024, D)) * 0.1, cdtype)
             for _ in range(3)]
boxes = jnp.asarray(rng.uniform(0.2, 0.6, (B, R, 4)), jnp.float32)


def bench(name, fn, args, iters=ITERS):
    dt = time_fn_ingraph(fn, args, iters=iters) * 1000
    print(f'{name:32s} {dt:8.2f} ms', flush=True)
    return dt


def upsample(feats):
    feats2d = [f.reshape(B, 32, 32, D) for f in feats]
    to_shape = [(128, 128), (64, 64), (32, 32)]
    return [resize_bilinear_align_corners(f, s, compute_dtype=cdtype)
            for f, s in zip(feats2d, to_shape)]


t_up = bench('initial upsample', upsample, (feats_tok,))
feats2d = jax.jit(upsample)(feats_tok)

fuse = MLVLFuse(D, 3, num_fuse=5, gn_groups=64, dtype=cdtype)
fvars = jax.jit(fuse.init)(jax.random.PRNGKey(0), feats2d)
t_fuse = bench('MLVLFuse (5 rounds)', lambda v, f: fuse.apply(v, f),
               (fvars, feats2d))
fused = jax.jit(fuse.apply)(fvars, feats2d)

rois = boxes * 448.0
strides = [14 / 8, 14 / 4, 14 / 2]


def roi_all(fused, rois):
    outs = []
    for lvl in range(3):
        p = roi_align_batched(fused[lvl].astype(jnp.float32), rois,
                              output_size=14,
                              spatial_scale=1.0 / strides[lvl],
                              sampling_ratio=2, aligned=True)
        outs.append(p.reshape(B * R, 14, 14, D).astype(cdtype))
    return outs


t_roi = bench('RoIAlign x3', roi_all, (fused, rois))
pooled = jax.jit(roi_all)(fused, rois)

pk = jnp.asarray(rng.standard_normal((3, 3, 3 * D, D)) * 0.01, cdtype)
w1 = jnp.asarray(rng.standard_normal((14 * 14 * D, 1024)) * 0.01, cdtype)
w2 = jnp.asarray(rng.standard_normal((1024, 4096)) * 0.01, cdtype)


def pconv(pooled, pk, w1, w2):
    cat_in = jnp.concatenate(pooled, axis=-1)
    acc = jax.lax.conv_general_dilated(
        cat_in, pk, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.float32)
    acc = jax.nn.relu(acc).astype(cdtype)
    flat = acc.reshape(B * R, -1)
    return (flat @ w1) @ w2


t_pc = bench('pconv+flatten+proj', pconv, (pooled, pk, w1, w2))

enc = RegionEncoder(D, 4096, 3, 448, 14, 5, 64, dtype='bfloat16')
evars = jax.jit(enc.init)(jax.random.PRNGKey(0), feats_tok, boxes)
t_all = bench('RegionEncoder total',
              lambda v, f, b: enc.apply(v, f, b), (evars, feats_tok, boxes))
print(f'sum of pieces: {t_up + t_fuse + t_roi + t_pc:.2f} ms')

ck = jnp.asarray(rng.standard_normal((3, 3, D, D)) * 0.01, cdtype)


def fuse_convs_only(feats2d, ck):
    for _ in range(5):
        feats2d = [
            jax.nn.relu(jax.lax.conv_general_dilated(
                f, ck, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)).astype(cdtype)
            for f in feats2d]
    return feats2d


t_conv = bench('fuse convs only (5r x 3l)', fuse_convs_only, (feats2d, ck))
print(f'fuse GN+resize overhead: {t_fuse - t_conv:.2f} ms')

# --- finer fuse decomposition: where do the 33 ms go? ---
import flax.linen as nn


def gn_relu_only(feats2d, gvars):
    gn = nn.GroupNorm(num_groups=64, epsilon=1e-5, dtype=cdtype)
    outs = []
    for r_ in range(5):
        feats2d = [jax.nn.relu(gn.apply({'params': gvars}, f))
                   for f in feats2d]
    return feats2d


gn0 = nn.GroupNorm(num_groups=64, epsilon=1e-5, dtype=cdtype)
gvars = jax.jit(gn0.init)(jax.random.PRNGKey(0), feats2d[0])['params']
bench('GN+relu only (5r x 3l)', gn_relu_only, (feats2d, gvars))


def resizes_only(feats2d):
    remain, shuffle = 512, 256
    n = 3
    outs = []
    for r_ in range(5):
        nf = []
        for lvl in range(n):
            top = min(lvl + 1, n - 1)
            down = max(lvl - 1, 0)
            hw = feats2d[lvl].shape[1:3]
            ft = resize_bilinear_align_corners(
                feats2d[top][..., remain + shuffle:], hw)
            fd = resize_bilinear_align_corners(
                feats2d[down][..., remain:remain + shuffle], hw)
            nf.append(jnp.concatenate(
                [feats2d[lvl][..., :remain],
                 ft.astype(cdtype), fd.astype(cdtype)], -1))
        feats2d = nf
    return feats2d


bench('resize+concat only (5r x 3l)', resizes_only, (feats2d,))


# --- composed fuse variants: find the 24 ms composition loss ---
def fuse_split_conv(feats2d, ck, gvars):
    """conv(cat(a,b,c)) == conv_a(a)+conv_b(b)+conv_c(c): no concat."""
    gn = nn.GroupNorm(num_groups=64, epsilon=1e-5, dtype=cdtype)
    remain, shuffle = 512, 256
    n = 3
    k_keep = ck[:, :, :remain, :]
    k_top = ck[:, :, remain:remain + shuffle, :]
    k_down = ck[:, :, remain + shuffle:, :]

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=jnp.float32)

    for r_ in range(5):
        nf = []
        for lvl in range(n):
            top = min(lvl + 1, n - 1)
            down = max(lvl - 1, 0)
            hw = feats2d[lvl].shape[1:3]
            ft = resize_bilinear_align_corners(
                feats2d[top][..., remain + shuffle:], hw).astype(cdtype)
            fd = resize_bilinear_align_corners(
                feats2d[down][..., remain:remain + shuffle],
                hw).astype(cdtype)
            acc = conv(feats2d[lvl][..., :remain], k_keep) \
                + conv(ft, k_top) + conv(fd, k_down)
            nf.append(jax.nn.relu(gn.apply({'params': gvars},
                                           acc.astype(cdtype))))
        feats2d = nf
    return feats2d


bench('fuse split-conv variant (5r)', fuse_split_conv,
      (feats2d, ck, gvars))


def fuse_concat_conv(feats2d, ck, gvars):
    """the current module's structure, inlined (control variant)."""
    gn = nn.GroupNorm(num_groups=64, epsilon=1e-5, dtype=cdtype)
    remain, shuffle = 512, 256
    n = 3
    for r_ in range(5):
        nf = []
        for lvl in range(n):
            top = min(lvl + 1, n - 1)
            down = max(lvl - 1, 0)
            hw = feats2d[lvl].shape[1:3]
            ft = resize_bilinear_align_corners(
                feats2d[top][..., remain + shuffle:], hw).astype(cdtype)
            fd = resize_bilinear_align_corners(
                feats2d[down][..., remain:remain + shuffle],
                hw).astype(cdtype)
            cat = jnp.concatenate(
                [feats2d[lvl][..., :remain], ft, fd], -1)
            acc = jax.lax.conv_general_dilated(
                cat, ck, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
            nf.append(jax.nn.relu(gn.apply({'params': gvars},
                                           acc.astype(cdtype))))
        feats2d = nf
    return feats2d


bench('fuse concat-conv inlined (5r)', fuse_concat_conv,
      (feats2d, ck, gvars))
