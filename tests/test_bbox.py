import numpy as np
import jax.numpy as jnp

from groma_tpu.ops import bbox


def _rand_boxes(rng, n):
    xy = rng.uniform(0, 0.8, size=(n, 2))
    wh = rng.uniform(0.05, 0.2, size=(n, 2))
    return np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)


def test_format_roundtrip(rng):
    boxes = _rand_boxes(rng, 17)
    back = bbox.cxcywh_to_xyxy(bbox.xyxy_to_cxcywh(jnp.asarray(boxes)))
    np.testing.assert_allclose(np.asarray(back), boxes, atol=1e-6)


def test_iou_against_numpy(rng):
    a = _rand_boxes(rng, 13)
    b = _rand_boxes(rng, 7)
    got = np.asarray(bbox.box_iou(jnp.asarray(a), jnp.asarray(b)))
    # independent O(N*M) numpy reference
    want = np.zeros((13, 7), np.float32)
    for i in range(13):
        for j in range(7):
            xx1 = max(a[i, 0], b[j, 0]); yy1 = max(a[i, 1], b[j, 1])
            xx2 = min(a[i, 2], b[j, 2]); yy2 = min(a[i, 3], b[j, 3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            area_a = (a[i, 2] - a[i, 0]) * (a[i, 3] - a[i, 1])
            area_b = (b[j, 2] - b[j, 0]) * (b[j, 3] - b[j, 1])
            want[i, j] = inter / (area_a + area_b - inter)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_giou_identity_and_disjoint():
    a = jnp.asarray([[0., 0., 1., 1.]])
    np.testing.assert_allclose(
        np.asarray(bbox.generalized_box_iou(a, a)), [[1.0]], atol=1e-6)
    b = jnp.asarray([[2., 0., 3., 1.]])
    # disjoint, enclosing box 3x1: giou = 0 - (3 - 2)/3 = -1/3
    np.testing.assert_allclose(
        np.asarray(bbox.generalized_box_iou(a, b)), [[-1 / 3]], atol=1e-6)


def test_elementwise_iou_matches_diag(rng):
    a = _rand_boxes(rng, 9)
    b = _rand_boxes(rng, 9)
    got = np.asarray(bbox.elementwise_iou(jnp.asarray(a), jnp.asarray(b)))
    want = np.diag(np.asarray(bbox.box_iou(jnp.asarray(a), jnp.asarray(b))))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.01, 0.25, 0.5, 0.9, 0.999])
    y = jax_sigmoid(bbox.inverse_sigmoid(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-4)


def jax_sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))
