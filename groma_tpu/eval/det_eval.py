"""Detector-stage evaluation (reference: groma/train/train_det.py:97-158
post_process + distributed eval loop with collect_results_cpu).

``post_process`` mirrors the reference exactly: sigmoid over the coco
logits, flat top-k over (query, class), cxcywh -> xyxy, rescale to the
original image size.  Evaluation runs through the numpy COCO-protocol
evaluator (eval/coco_map.py) instead of pycocotools.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.eval.coco_map import DetectionEvaluator
from groma_tpu.ops.bbox import cxcywh_to_xyxy


def collate_det_eval(samples):
    """(reference: groma/data/collator.py:55-62
    DataCollatorForDetEvalDataset)."""
    return {
        'images': np.stack([s['images'] for s in samples]),
        'ori_shapes': np.stack([np.asarray(s['ori_shape'][:2])
                                for s in samples]),
    }


def post_process(logits_coco: jnp.ndarray, pred_boxes: jnp.ndarray,
                 target_sizes: jnp.ndarray, threshold: float = 0.0,
                 top_k: int = 100):
    """(B, Q, C) logits + (B, Q, 4) cxcywh + (B, 2) (h, w) ->
    per-image (scores, labels, boxes_xyxy_abs), fixed top_k."""
    b, q, c = logits_coco.shape
    prob = jax.nn.sigmoid(logits_coco).reshape(b, q * c)
    k = min(top_k, q * c)
    topk_values, topk_indexes = jax.lax.top_k(prob, k)
    topk_boxes = topk_indexes // c
    labels = topk_indexes % c
    boxes = cxcywh_to_xyxy(pred_boxes)
    boxes = jnp.take_along_axis(boxes, topk_boxes[..., None], axis=1)
    img_h = target_sizes[:, 0].astype(jnp.float32)
    img_w = target_sizes[:, 1].astype(jnp.float32)
    scale = jnp.stack([img_w, img_h, img_w, img_h], axis=1)[:, None, :]
    boxes = boxes * scale
    keep = topk_values > threshold
    return topk_values, labels, boxes, keep


def evaluate_detector(perceiver_apply, params, samples: Iterable[dict],
                      top_k: int = 100, threshold: float = 0.0) -> dict:
    """samples: dicts with 'images' (H,W,3 normalized), 'image_id',
    'ori_shape' (h, w), 'gt' list of (category_id, xyxy abs box)."""
    ev = DetectionEvaluator(max_dets=top_k)
    fwd = jax.jit(perceiver_apply)
    for s in samples:
        for cat, box in s.get('gt', []):
            ev.add_ground_truth(s['image_id'], cat, box)
        out = fwd(params, jnp.asarray(s['images'][None]))
        sizes = jnp.asarray(np.asarray(s['ori_shape'][:2])[None])
        scores, labels, boxes, keep = post_process(
            out['logits']['coco'], out['pred_boxes'], sizes,
            threshold=threshold, top_k=top_k)
        scores, labels = np.asarray(scores[0]), np.asarray(labels[0])
        boxes, keep = np.asarray(boxes[0]), np.asarray(keep[0])
        for sc, lb, bx, kp in zip(scores, labels, boxes, keep):
            if kp:
                ev.add_detection(s['image_id'], int(lb), bx, float(sc))
    return ev.summarize()
