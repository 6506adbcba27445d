"""Deformable-DETR training losses, static-shape jax.

Reproduces the reference's loss stack (reference:
groma/model/ddetr_transformer.py:240-292 DeformableDetrLossX and the HF
DeformableDetrLoss/DeformableDetrHungarianMatcher it extends at :731-771):
sigmoid focal CE + L1 + GIoU over Hungarian-matched pairs, repeated for
every decoder layer (aux) and for the encoder-stage proposals with
binarized labels.

TPU-first: targets arrive as fixed-capacity padded tensors
(class_labels (B, T), boxes (B, T, 4) normalized cxcywh, valid (B, T));
cost matrices are computed on device; only the LSA itself round-trips
through the scipy host callback (ops/matcher.py), exactly like the
reference's per-step scipy call.  num_boxes normalization matches the
reference: the raw target count of the local batch, clamped to >= 1
(reference: ddetr_transformer.py:258-264, no cross-replica allreduce).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from groma_tpu.config import DDETRConfig
from groma_tpu.ops.bbox import cxcywh_to_xyxy, generalized_box_iou
from groma_tpu.ops.matcher import auction_match, hungarian_match


def _matcher_cost(logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid,
                  cfg: DDETRConfig, alpha=0.25, gamma=2.0):
    """(B, Q, T) matching cost, HF DeformableDetrHungarianMatcher math."""
    prob = jax.nn.sigmoid(logits.astype(jnp.float32))        # (B, Q, C)
    neg = (1 - alpha) * prob ** gamma * (-jnp.log(1 - prob + 1e-8))
    pos = alpha * (1 - prob) ** gamma * (-jnp.log(prob + 1e-8))
    # gather the per-target class column: (B, Q, T)
    b, q, _ = prob.shape
    t = tgt_labels.shape[1]
    idx = jnp.broadcast_to(tgt_labels[:, None, :], (b, q, t))
    cls_cost = (jnp.take_along_axis(pos, idx, axis=2)
                - jnp.take_along_axis(neg, idx, axis=2))
    bbox_cost = jnp.sum(
        jnp.abs(pred_boxes[:, :, None, :] - tgt_boxes[:, None, :, :]), -1)
    giou_cost = -jax.vmap(generalized_box_iou)(
        cxcywh_to_xyxy(pred_boxes), cxcywh_to_xyxy(tgt_boxes))
    cost = (cfg.bbox_cost * bbox_cost + cfg.class_cost * cls_cost
            + cfg.giou_cost * giou_cost)
    return jnp.where(tgt_valid[:, None, :], cost, 1e8)


def _single_stage_loss(logits, pred_boxes, tgt_labels, tgt_boxes, tgt_valid,
                       num_boxes, cfg: DDETRConfig, matcher='hungarian',
                       assign=None):
    """loss_ce / loss_bbox / loss_giou for one prediction set.

    ``assign`` may be precomputed (ddetr_loss batches every stage's
    matching into ONE matcher call); when None it is computed here."""
    b, q, ncls = logits.shape
    if assign is None:
        cost = _matcher_cost(logits, pred_boxes, tgt_labels, tgt_boxes,
                             tgt_valid, cfg, alpha=cfg.focal_alpha)
        # matching is a non-differentiable decision (reference:
        # @torch.no_grad on the HF matcher)
        match_fn = hungarian_match if matcher == 'hungarian' \
            else auction_match
        assign = match_fn(jax.lax.stop_gradient(cost), tgt_valid)
    assign_safe = jnp.maximum(assign, 0)

    # ----- focal classification loss (HF sigmoid_focal_loss semantics:
    # mean over queries, sum over batch/classes, / num_boxes, * Q)
    onehot = jnp.zeros((b, q, ncls), jnp.float32)
    src_idx = assign_safe                                 # (B, T)
    tgt_cls = jnp.where(tgt_valid, tgt_labels, 0)
    updates = jax.nn.one_hot(tgt_cls, ncls) * tgt_valid[..., None]
    onehot = jax.vmap(
        lambda oh, idx, upd: oh.at[idx].add(upd))(onehot, src_idx, updates)
    onehot = jnp.clip(onehot, 0.0, 1.0)
    logits32 = logits.astype(jnp.float32)
    prob = jax.nn.sigmoid(logits32)
    ce = (jnp.maximum(logits32, 0) - logits32 * onehot
          + jnp.log1p(jnp.exp(-jnp.abs(logits32))))
    p_t = prob * onehot + (1 - prob) * (1 - onehot)
    loss = ce * (1 - p_t) ** 2.0
    alpha_t = cfg.focal_alpha * onehot + (1 - cfg.focal_alpha) * (1 - onehot)
    loss = alpha_t * loss
    loss_ce = jnp.sum(jnp.mean(loss, axis=1)) / num_boxes * q

    # ----- box losses over matched pairs
    src_boxes = jax.vmap(lambda pb, idx: pb[idx])(pred_boxes, assign_safe)
    l1 = jnp.sum(jnp.abs(src_boxes - tgt_boxes), -1)
    loss_bbox = jnp.sum(jnp.where(tgt_valid, l1, 0.0)) / num_boxes
    giou = jax.vmap(lambda s, t: jnp.diagonal(
        generalized_box_iou(cxcywh_to_xyxy(s), cxcywh_to_xyxy(t))))(
        src_boxes, tgt_boxes)
    loss_giou = jnp.sum(jnp.where(tgt_valid, 1.0 - giou, 0.0)) / num_boxes

    # cardinality diagnostic (unweighted, logged only) — reproduces the
    # HF DeformableDetrLoss.loss_cardinality definition, which degenerates
    # to counting argmax != last-class; with num_labels == 1 that count is
    # always 0, exactly as in the reference's class-agnostic runs
    card_pred = jnp.sum(
        jnp.argmax(logits32, axis=-1) != (ncls - 1), axis=1
    ).astype(jnp.float32)
    n_tgt = jnp.sum(tgt_valid, axis=1).astype(jnp.float32)
    cardinality_error = jnp.mean(jnp.abs(card_pred - n_tgt))
    return {'loss_ce': loss_ce, 'loss_bbox': loss_bbox,
            'loss_giou': loss_giou, 'cardinality_error': cardinality_error}


def ddetr_loss(outputs: Dict, targets: Dict, cfg: DDETRConfig,
               source: str, matcher: str = 'hungarian') -> Dict[str, jnp.ndarray]:
    """Total det loss.

    Args:
      outputs: dict from DDETRTransformer.__call__.
      targets: {'class_labels': (B,T) int32, 'boxes': (B,T,4) cxcywh,
                'valid': (B,T) bool}.
      source: 'coco' | 'sa1b' — selects the objectness head supervised this
        step (single-source batches, reference: groma/data/collator.py:47).
      matcher: 'hungarian' (exact, scipy host callback) or 'auction'
        (fully on-device; required on backends without host callbacks,
        e.g. remote-execution tunnels).
    """
    tgt_labels = targets['class_labels']
    tgt_boxes = targets['boxes'].astype(jnp.float32)
    tgt_valid = targets['valid']
    num_boxes = jnp.maximum(jnp.sum(tgt_valid).astype(jnp.float32), 1.0)

    # collect every stage (final + aux per decoder layer + encoder) and
    # run ONE batched matcher call over the stacked (S*B, Q, T) costs —
    # 13 sequential auction loops per step collapse into one
    stages = [('', outputs['logits'][source], outputs['pred_boxes'],
               tgt_labels)]
    if cfg.auxiliary_loss:
        for i, (lg, bx) in enumerate(zip(outputs['aux'][source],
                                         outputs['aux']['boxes'])):
            stages.append((f'_{i}', lg, bx, tgt_labels))
    if cfg.two_stage:
        # encoder stage: binary targets (class 0)
        stages.append(('_enc', outputs['enc_outputs_class'],
                       outputs['enc_outputs_coord'],
                       jnp.zeros_like(tgt_labels)))

    b, t = tgt_valid.shape
    match_fn = hungarian_match if matcher == 'hungarian' else auction_match
    # group stages by query count (the encoder stage proposes over every
    # encoder token, not num_queries) and run one matcher call per group
    groups: Dict[int, list] = {}
    for k, st in enumerate(stages):
        groups.setdefault(st[1].shape[1], []).append(k)
    assign = [None] * len(stages)
    for idxs in groups.values():
        costs = jnp.stack([
            _matcher_cost(stages[k][1], stages[k][2], stages[k][3],
                          tgt_boxes, tgt_valid, cfg, alpha=cfg.focal_alpha)
            for k in idxs])                                 # (S, B, Q, T)
        s = len(idxs)
        a = match_fn(
            jax.lax.stop_gradient(costs).reshape(s * b, *costs.shape[2:]),
            jnp.tile(tgt_valid, (s, 1))).reshape(s, b, t)
        for j, k in enumerate(idxs):
            assign[k] = a[j]

    loss_dict = {}
    for k, (suffix, lg, bx, lab) in enumerate(stages):
        part = _single_stage_loss(lg, bx, lab, tgt_boxes, tgt_valid,
                                  num_boxes, cfg, matcher,
                                  assign=assign[k])
        loss_dict.update({f'{kk}{suffix}': v for kk, v in part.items()})

    weights = {'loss_ce': cfg.cls_loss_coefficient,
               'loss_bbox': cfg.bbox_loss_coefficient,
               'loss_giou': cfg.giou_loss_coefficient}
    total = jnp.zeros((), jnp.float32)
    for k, v in loss_dict.items():
        base = k.split('_enc')[0]
        base = '_'.join(base.split('_')[:2])
        if base in weights:
            total = total + weights[base] * v
    loss_dict['loss'] = total
    return loss_dict
