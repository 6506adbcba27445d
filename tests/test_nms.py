import numpy as np
import jax.numpy as jnp

from groma_tpu.ops.nms import nms


def ref_nms(boxes, scores, iou_thr, score_thr=0.0, max_num=-1):
    """Independent numpy re-statement of mmcv hard-NMS semantics
    (strict score filter, descending stable order, greedy suppression)."""
    idx_all = np.arange(len(scores))
    keep_mask = scores > score_thr
    boxes, scores, idx_all = boxes[keep_mask], scores[keep_mask], idx_all[keep_mask]
    order = np.argsort(-scores, kind='stable')
    kept = []
    suppressed = np.zeros(len(order), bool)
    for ii, i in enumerate(order):
        if suppressed[ii]:
            continue
        kept.append(idx_all[i])
        for jj in range(ii + 1, len(order)):
            j = order[jj]
            xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
            xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
            inter = max(0., xx2 - xx1) * max(0., yy2 - yy1)
            a = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
            b = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
            if inter / (a + b - inter) > iou_thr:
                suppressed[jj] = True
    if max_num > 0:
        kept = kept[:max_num]
    return np.array(kept, np.int64)


def _rand(rng, n):
    xy = rng.uniform(0, 0.6, size=(n, 2))
    wh = rng.uniform(0.1, 0.4, size=(n, 2))
    boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    scores = rng.uniform(0, 1, size=(n,)).astype(np.float32)
    return boxes, scores


def test_nms_matches_reference(rng):
    for trial in range(5):
        boxes, scores = _rand(rng, 64)
        want = ref_nms(boxes, scores, 0.5, 0.15, 16)
        idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores),
                        0.5, 0.15, max_num=16)
        got = np.asarray(idx)[np.asarray(mask)]
        np.testing.assert_array_equal(got, want)


def test_nms_all_below_threshold(rng):
    boxes, scores = _rand(rng, 8)
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores * 0.0),
                    0.6, 0.15, max_num=4)
    assert not np.asarray(mask).any()


def test_nms_valid_mask(rng):
    boxes, scores = _rand(rng, 32)
    valid = np.zeros(32, bool); valid[:20] = True
    want = ref_nms(boxes[:20], scores[:20], 0.6, 0.1, 10)
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.6, 0.1,
                    max_num=10, valid=jnp.asarray(valid))
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, want)


def test_nms_tie_scores():
    # identical scores: stable order by original index must win
    boxes = np.array([[0, 0, 1, 1], [10, 10, 11, 11], [0.01, 0, 1.01, 1]],
                     np.float32)
    scores = np.array([0.5, 0.5, 0.5], np.float32)
    idx, mask = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5, 0.0, 3)
    got = np.asarray(idx)[np.asarray(mask)]
    np.testing.assert_array_equal(got, [0, 1])
