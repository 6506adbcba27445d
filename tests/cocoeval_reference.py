"""Independent scalar mirror of the pycocotools COCOeval protocol.

pycocotools is not installable in this environment, so this module
re-implements the published COCOeval algorithm (cocoeval.py evaluateImg /
accumulate / summarize and maskUtils.iou crowd semantics) as a direct,
loop-heavy transcription of the spec — deliberately structured nothing
like groma_tpu/eval/coco_map.py (which is vectorized and accumulates
per-category match matrices).  test_coco_map.py differential-tests the
production evaluator against this mirror on randomized scenes
(VERDICT round-1 item 10; reference: groma/eval/eval_lvis.py:1-45).

Only bbox evaluation with useCats=1 and a single maxDets value is
mirrored — that is the protocol surface Groma's eval stack uses.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)


def _bbox_iou(dt, gt, iscrowd):
    """maskUtils.iou for xyxy boxes: crowd GT -> intersection / det area."""
    ious = np.zeros((len(dt), len(gt)))
    for i, d in enumerate(dt):
        da = max(d[2] - d[0], 0.0) * max(d[3] - d[1], 0.0)
        for j, g in enumerate(gt):
            ga = max(g[2] - g[0], 0.0) * max(g[3] - g[1], 0.0)
            iw = min(d[2], g[2]) - max(d[0], g[0])
            ih = min(d[3], g[3]) - max(d[1], g[1])
            inter = max(iw, 0.0) * max(ih, 0.0)
            union = da if iscrowd[j] else da + ga - inter
            ious[i, j] = inter / union if union > 0 else 0.0
    return ious


def _evaluate_img(dts, gts, area_rng, max_dets):
    """cocoeval.COCOeval.evaluateImg for one (image, category).

    dts: list of (score, xyxy). gts: list of (xyxy, iscrowd, area).
    Returns None if both empty, else a dict mirroring evalImgs entries.
    """
    if not dts and not gts:
        return None
    lo, hi = area_rng
    gt_ig = np.array([(g[1]) or (g[2] < lo or g[2] > hi) for g in gts],
                     float)
    # sort gts ignore-last, dets score-descending (both stable)
    gtind = np.argsort(gt_ig, kind='mergesort')
    dtind = np.argsort([-d[0] for d in dts], kind='mergesort')[:max_dets]
    gts = [gts[i] for i in gtind]
    dts = [dts[i] for i in dtind]
    iscrowd = [bool(g[1]) for g in gts]
    ious = _bbox_iou([d[1] for d in dts], [g[0] for g in gts], iscrowd)

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))          # matched det id (1-based) or 0
    dtm = np.zeros((T, D))          # matched gt id (1-based) or 0
    gt_ig = np.array([(g[1]) or (g[2] < lo or g[2] > hi) for g in gts],
                     float)
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
                # gt already matched, and not a crowd
                if gtm[tind, gind] > 0 and not iscrowd[gind]:
                    continue
                # dt matched to a real gt, and on to ignored gts: stop
                if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m + 1
            gtm[tind, m] = dind + 1
    # set unmatched out-of-area detections to ignore
    a = np.array([(max(d[1][2] - d[1][0], 0.0) * max(d[1][3] - d[1][1], 0.0)
                   < lo)
                  or (max(d[1][2] - d[1][0], 0.0)
                      * max(d[1][3] - d[1][1], 0.0) > hi)
                  for d in dts]).reshape(1, -1)
    dt_ig = np.logical_or(dt_ig, np.logical_and(
        dtm == 0, np.repeat(a, T, 0)))
    return {
        'dtMatches': dtm,
        'dtScores': [d[0] for d in dts],
        'gtIgnore': gt_ig,
        'dtIgnore': dt_ig,
    }


def evaluate(dets, gts, area_rng=(0.0, 1e10), max_dets=100):
    """Full COCOeval accumulate+summarize for one area range.

    dets: list of dicts {image_id, category_id, bbox, score}
    gts:  list of dicts {image_id, category_id, bbox, iscrowd, area}
    Returns dict with per-category AP (np.nan when no GT), AP50, AR.
    """
    img_ids = sorted({d['image_id'] for d in dets}
                     | {g['image_id'] for g in gts})
    cat_ids = sorted({d['category_id'] for d in dets}
                     | {g['category_id'] for g in gts})

    ap_per_cat, ap50_per_cat, ar_per_cat = {}, {}, {}
    for cat in cat_ids:
        eval_imgs = []
        for img in img_ids:
            dt = [(d['score'], np.asarray(d['bbox'], float)) for d in dets
                  if d['image_id'] == img and d['category_id'] == cat]
            gt = [(np.asarray(g['bbox'], float), bool(g.get('iscrowd')),
                   float(g['area'])) for g in gts
                  if g['image_id'] == img and g['category_id'] == cat]
            eval_imgs.append(_evaluate_img(dt, gt, area_rng, max_dets))
        eval_imgs = [e for e in eval_imgs if e is not None]
        if not eval_imgs:
            continue
        dt_scores = np.concatenate(
            [np.asarray(e['dtScores'], float) for e in eval_imgs])
        inds = np.argsort(-dt_scores, kind='mergesort')
        dtm = np.concatenate([e['dtMatches'] for e in eval_imgs],
                             axis=1)[:, inds]
        dt_ig = np.concatenate([e['dtIgnore'] for e in eval_imgs],
                               axis=1)[:, inds]
        gt_ig = np.concatenate([e['gtIgnore'] for e in eval_imgs])
        npig = int(np.count_nonzero(gt_ig == 0))
        if npig == 0:
            ap_per_cat[cat] = np.nan
            ap50_per_cat[cat] = np.nan
            ar_per_cat[cat] = np.nan
            continue
        tps = np.logical_and(dtm, np.logical_not(dt_ig))
        fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
        tp_sum = np.cumsum(tps, axis=1).astype(float)
        fp_sum = np.cumsum(fps, axis=1).astype(float)
        ap_t = np.zeros(len(IOU_THRS))
        ar_t = np.zeros(len(IOU_THRS))
        for t in range(len(IOU_THRS)):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            ar_t[t] = rc[-1] if nd else 0.0
            q = np.zeros(len(RECALL_THRS))
            pr = pr.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds_r = np.searchsorted(rc, RECALL_THRS, side='left')
            for ri, pi in enumerate(inds_r):
                if pi < nd:
                    q[ri] = pr[pi]
            ap_t[t] = q.mean()
        ap_per_cat[cat] = ap_t.mean()
        ap50_per_cat[cat] = ap_t[0]
        ar_per_cat[cat] = ar_t.mean()

    def _mean(d):
        vals = [v for v in d.values() if not np.isnan(v)]
        return float(np.mean(vals)) if vals else -1.0

    return {
        'AP': _mean(ap_per_cat),
        'AP50': _mean(ap50_per_cat),
        'AR': _mean(ar_per_cat),
        'per_cat_ap': ap_per_cat,
    }
