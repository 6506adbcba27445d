import numpy as np
import jax
import jax.numpy as jnp

from groma_tpu.ops.roi_align import roi_align

# Golden values from the mmcv op test suite
# (reference: mmcv/tests/test_ops/test_roi_align.py:14-33), output_size 2,
# spatial_scale 1.0, sampling_ratio 2, aligned=True.
GOLDEN = [
    (np.array([[[[1., 2.], [3., 4.]]]]),
     np.array([[0., 0., 0., 1., 1.]]),
     np.array([[[[1.0, 1.25], [1.5, 1.75]]]])),
    (np.array([[[[1., 2.], [3., 4.]], [[4., 3.], [2., 1.]]]]),
     np.array([[0., 0., 0., 1., 1.]]),
     np.array([[[[1.0, 1.25], [1.5, 1.75]], [[4.0, 3.75], [3.5, 3.25]]]])),
    (np.array([[[[1., 2., 5., 6.], [3., 4., 7., 8.],
                 [9., 10., 13., 14.], [11., 12., 15., 16.]]]]),
     np.array([[0., 0., 0., 3., 3.]]),
     np.array([[[[1.9375, 4.75], [7.5625, 10.375]]]])),
]


def test_roi_align_golden():
    for feats_nchw, rois, want_nchw in GOLDEN:
        feats = jnp.asarray(np.transpose(feats_nchw, (0, 2, 3, 1)), jnp.float32)
        out = roi_align(feats, jnp.asarray(rois, jnp.float32),
                        output_size=2, spatial_scale=1.0, sampling_ratio=2)
        got_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
        np.testing.assert_allclose(got_nchw, want_nchw, atol=1e-5)


def test_roi_align_backward_golden():
    # gradient of sum(output) w.r.t. input matches mmcv golden table
    for (feats_nchw, rois, _), want_grad in zip(
            GOLDEN,
            [np.array([[[[3.0625, 0.4375], [0.4375, 0.0625]]]]),
             np.array([[[[3.0625, 0.4375], [0.4375, 0.0625]],
                        [[3.0625, 0.4375], [0.4375, 0.0625]]]]),
             np.array([[[[0.47265625, 0.42968750, 0.42968750, 0.04296875],
                         [0.42968750, 0.39062500, 0.39062500, 0.03906250],
                         [0.42968750, 0.39062500, 0.39062500, 0.03906250],
                         [0.04296875, 0.03906250, 0.03906250, 0.00390625]]]])]):
        feats = jnp.asarray(np.transpose(feats_nchw, (0, 2, 3, 1)), jnp.float32)
        rois_j = jnp.asarray(rois, jnp.float32)
        grad = jax.grad(
            lambda f: roi_align(f, rois_j, 2, 1.0, 2).sum())(feats)
        got = np.transpose(np.asarray(grad), (0, 3, 1, 2))
        np.testing.assert_allclose(got, want_grad, atol=1e-5)


def test_roi_align_out_of_bounds_zero(rng):
    # a box entirely out of bounds pools to zero
    feats = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    rois = jnp.asarray([[0., 100., 100., 120., 120.]], jnp.float32)
    out = roi_align(feats, rois, 4, 1.0, 2)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_roi_align_overshoot_matches_partial(rng):
    # Groma quirk: level-0 spatial_scale overshoots the feature map 2x
    # (reference: groma/model/roi_align.py:204,220-227); out-of-map samples
    # must contribute exactly zero, not clamp-extend.
    feats = jnp.asarray(np.ones((1, 8, 8, 1)), jnp.float32)
    rois = jnp.asarray([[0., 0., 0., 16., 16.]], jnp.float32)  # 2x the map
    out = np.asarray(roi_align(feats, rois, 4, 1.0, 2))[0, :, :, 0]
    # right/bottom half of the pooled grid samples beyond the map -> 0
    assert out[0, 0] == 1.0
    assert out[3, 3] == 0.0


def test_roi_align_batched_matches_gather(rng):
    from groma_tpu.ops.roi_align import roi_align_batched
    b, h, w, c, r = 2, 16, 12, 8, 7
    feats = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    # boxes include negative extents (the cxcywh-as-xyxy quirk) and
    # out-of-bounds coordinates
    boxes = jnp.asarray(rng.uniform(-4, 20, (b, r, 4)), jnp.float32)
    got = roi_align_batched(feats, boxes, output_size=4,
                            spatial_scale=0.5, sampling_ratio=2,
                            roi_chunk=3)
    # reference: flatten to (B*R, 5) rois through the gather version
    bidx = np.repeat(np.arange(b), r).astype(np.float32)[:, None]
    rois = jnp.asarray(np.concatenate(
        [bidx, np.asarray(boxes).reshape(-1, 4)], axis=1))
    want = roi_align(feats, rois, 4, 0.5, 2).reshape(b, r, 4, 4, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5)
