"""Box geometry ops, pure jnp (vectorized, MXU/VPU friendly).

TPU-native replacement for the reference's native IoU kernels
(reference: mmcv/mmcv/ops/csrc/pytorch/bbox_overlaps.cpp and
mmcv/mmcv/ops/bbox.py:7) and torchvision ``box_iou`` use
(reference: groma/model/groma.py:10,287).  Everything here is shape-static
and differentiable where meaningful; pairwise ops broadcast to (N, M).
"""

from __future__ import annotations

import jax.numpy as jnp


def cxcywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) center format -> corner format.

    Mirrors HF ``center_to_corners_format`` semantics
    (reference: groma/model/groma.py:13 import).
    """
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1)


def xyxy_to_cxcywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) corner format -> center format
    (reference: mmdet/core/bbox/transforms.py:259 bbox_xyxy_to_cxcywh)."""
    x0, y0, x1, y1 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) * 0.5, (y0 + y1) * 0.5, x1 - x0, y1 - y0], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, (…, 4) -> (…,)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M).

    Matches torchvision ``box_iou`` / mmcv ``bbox_overlaps`` numerics
    (reference: mmcv/mmcv/ops/bbox.py:7).
    """
    inter, union = _box_inter_union(boxes1, boxes2)
    return inter / jnp.maximum(union, 1e-12)


def _box_inter_union(boxes1, boxes2):
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return inter, union


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise GIoU of xyxy boxes: (N, 4) x (M, 4) -> (N, M).

    Same math as HF ``generalized_box_iou`` used by the det losses
    (reference: groma/model/ddetr_transformer.py:21 import, :229).
    """
    inter, union = _box_inter_union(boxes1, boxes2)
    iou = inter / jnp.maximum(union, 1e-12)
    lt = jnp.minimum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.maximum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, min=0)
    enclosing = wh[..., 0] * wh[..., 1]
    return iou - (enclosing - union) / jnp.maximum(enclosing, 1e-12)


def elementwise_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IoU of aligned xyxy boxes: (N, 4) x (N, 4) -> (N,)."""
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes1) + box_area(boxes2) - inter
    return inter / jnp.maximum(union, 1e-12)


def normalize_box_coordinates(boxes: jnp.ndarray, img_shape) -> jnp.ndarray:
    """xyxy pixel boxes -> normalized cxcywh clipped to [0, 1]
    (reference: groma/data/datasets/det_data.py:8-13)."""
    h, w = img_shape[0], img_shape[1]
    scale = jnp.asarray([w, h, w, h], dtype=boxes.dtype)
    return jnp.clip(xyxy_to_cxcywh(boxes / scale), 0.0, 1.0)


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Logit with HF DeformableDetr clamping semantics
    (reference: groma/model/ddetr_transformer.py:23 import)."""
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1.0 - x, min=eps)
    return jnp.log(x1 / x2)
