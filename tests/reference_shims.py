"""Make the reference's own torch model code importable in this env.

The reference (/root/reference/groma) depends on compiled mmcv ops,
mmdet, torchvision, and transformers==4.32 symbols.  None of that exists
here, so this module installs *pure-torch* stand-ins with exactly the
semantics the reference exercises:

* ``mmcv.ops.nms.nms``      — mmcv wrapper semantics (score > thr filter,
  stable descending sort, greedy IoU > thr suppression, max_num truncation,
  original-index mapping; reference: mmcv/mmcv/ops/nms.py:14-33,119),
* ``mmcv.ops.RoIAlign``     — aligned=True, sampling_ratio grid, mmcv
  bilinear edge rules (reference:
  mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh:17-108),
* ``mmcv.ops.bbox.bbox_overlaps``, ``mmcv.cnn.{ConvModule,Linear,
  normal_init}``, ``mmdet.models.BaseRoIExtractor``,
  ``torchvision.ops.box_iou``,
* transformers-4.57 compat: re-expose DeformableDetrHungarianMatcher /
  DeformableDetrLoss / generalized_box_iou under their 4.32 names and
  auto-fill the ``spatial_shapes_list`` argument 4.57 requires.

This file is TEST GLUE ONLY — it contains no framework code and exists so
tests can run the reference model as a numerical oracle.
"""

from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F

REFERENCE_ROOT = '/root/reference'


# --------------------------------------------------------------- pure ops

def box_iou_t(boxes1: torch.Tensor, boxes2: torch.Tensor) -> torch.Tensor:
    """torchvision.ops.box_iou semantics, pure torch."""
    area1 = (boxes1[:, 2] - boxes1[:, 0]) * (boxes1[:, 3] - boxes1[:, 1])
    area2 = (boxes2[:, 2] - boxes2[:, 0]) * (boxes2[:, 3] - boxes2[:, 1])
    lt = torch.max(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = torch.min(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / union.clamp(min=1e-12)


def mmcv_nms(boxes=None, scores=None, iou_threshold=0.5, offset=0,
             score_threshold=0.0, max_num=-1):
    """mmcv.ops.nms wrapper semantics (reference: mmcv/ops/nms.py:14-33)."""
    assert offset == 0
    if score_threshold > 0:
        valid_mask = scores > score_threshold
        vboxes, vscores = boxes[valid_mask], scores[valid_mask]
        valid_inds = torch.nonzero(valid_mask, as_tuple=False).squeeze(1)
    else:
        vboxes, vscores = boxes, scores
        valid_inds = torch.arange(len(scores))

    order = torch.argsort(vscores, descending=True, stable=True)
    sb = vboxes[order]
    n = len(order)
    iou = box_iou_t(sb, sb)
    suppressed = torch.zeros(n, dtype=torch.bool)
    keep_sorted = []
    for i in range(n):
        if suppressed[i]:
            continue
        keep_sorted.append(i)
        suppressed |= (iou[i] > iou_threshold) & (
            torch.arange(n) > i)
    inds = order[torch.tensor(keep_sorted, dtype=torch.long)] \
        if keep_sorted else torch.zeros(0, dtype=torch.long)
    if max_num > 0:
        inds = inds[:max_num]
    inds = valid_inds[inds]
    dets = torch.cat([boxes[inds], scores[inds, None]], dim=1)
    return dets, inds


class PureRoIAlign(nn.Module):
    """mmcv.ops.RoIAlign with aligned=True, pure torch (fp32).

    Bilinear edge rules match the CUDA kernel
    (reference: mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh):
    out-of-bounds (< -1 or > size) samples contribute 0; coords clamped at
    0; at the high edge low==high==size-1 with frac 0.
    """

    def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=0,
                 pool_mode='avg', aligned=True, use_torchvision=False):
        super().__init__()
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        self.output_size = output_size
        self.spatial_scale = spatial_scale
        self.sampling_ratio = sampling_ratio
        assert pool_mode == 'avg' and aligned

    @staticmethod
    def _axis(coord, size):
        in_bounds = (coord >= -1.0) & (coord <= size)
        c = coord.clamp(min=0.0)
        low = c.floor().long()
        at_edge = low >= size - 1
        low = torch.where(at_edge, torch.full_like(low, size - 1), low)
        high = torch.where(at_edge, low, low + 1)
        frac = torch.where(at_edge, torch.zeros_like(c), c - low.float())
        return low, high, 1.0 - frac, frac, in_bounds

    def forward(self, features: torch.Tensor, rois: torch.Tensor):
        # features (B, C, H, W), rois (R, 5) [batch, x1, y1, x2, y2]
        b, ch, hsz, wsz = features.shape
        r = rois.shape[0]
        out = self.output_size[0]
        g = self.sampling_ratio
        assert g > 0
        batch_idx = rois[:, 0].long()
        x1 = rois[:, 1] * self.spatial_scale - 0.5
        y1 = rois[:, 2] * self.spatial_scale - 0.5
        x2 = rois[:, 3] * self.spatial_scale - 0.5
        y2 = rois[:, 4] * self.spatial_scale - 0.5
        bin_w = (x2 - x1) / out
        bin_h = (y2 - y1) / out

        ph = torch.arange(out, dtype=torch.float32)
        ii = torch.arange(g, dtype=torch.float32)
        # (out, g) sample offsets inside the roi, per axis
        off = ph[:, None] + (ii[None, :] + 0.5) / g
        ys = y1[:, None, None] + off[None] * bin_h[:, None, None]  # (R,out,g)
        xs = x1[:, None, None] + off[None] * bin_w[:, None, None]

        yl, yh, wyl, wyh, yok = self._axis(ys, hsz)
        xl, xh, wxl, wxh, xok = self._axis(xs, wsz)

        def gather(yy, xx):
            # (R, out, g) index maps -> (R, out, g, out, g, C)
            fi = features.permute(0, 2, 3, 1)  # B,H,W,C
            byy = yy[:, :, :, None, None].expand(r, out, g, out, g)
            bxx = xx[:, None, None, :, :].expand(r, out, g, out, g)
            bb = batch_idx[:, None, None, None, None].expand_as(byy)
            return fi[bb, byy, bxx]

        w_ll = (wyl[:, :, :, None, None] * wxl[:, None, None, :, :])
        w_lh = (wyl[:, :, :, None, None] * wxh[:, None, None, :, :])
        w_hl = (wyh[:, :, :, None, None] * wxl[:, None, None, :, :])
        w_hh = (wyh[:, :, :, None, None] * wxh[:, None, None, :, :])
        val = (gather(yl, xl) * w_ll[..., None] +
               gather(yl, xh) * w_lh[..., None] +
               gather(yh, xl) * w_hl[..., None] +
               gather(yh, xh) * w_hh[..., None])
        ok = (yok[:, :, :, None, None] & xok[:, None, None, :, :])
        val = val * ok[..., None].float()
        # average over the g x g samples of each (ph, pw) bin
        val = val.permute(0, 1, 3, 5, 2, 4)       # R,out,out,C,g,g
        pooled = val.mean(dim=(-1, -2))           # R,out,out,C
        return pooled.permute(0, 3, 1, 2).contiguous()   # R,C,out,out


def bbox_overlaps_t(bboxes1, bboxes2, mode='iou', aligned=False, offset=0):
    assert mode == 'iou' and not aligned and offset == 0
    return box_iou_t(bboxes1, bboxes2)


class ConvModule(nn.Module):
    """mmcv ConvModule subset: conv -> (GN) -> ReLU, bias off under norm
    (reference: mmcv/mmcv/cnn/bricks/conv_module.py:16)."""

    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, conv_cfg=None, norm_cfg=None):
        super().__init__()
        assert conv_cfg is None
        with_norm = norm_cfg is not None
        self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                              stride=stride, padding=padding,
                              bias=not with_norm)
        self.with_norm = with_norm
        if with_norm:
            assert norm_cfg['type'] == 'GN'
            self.gn = nn.GroupNorm(norm_cfg['num_groups'], out_channels)

    def forward(self, x):
        x = self.conv(x)
        if self.with_norm:
            x = self.gn(x)
        return F.relu(x, inplace=True)


def normal_init(module, mean=0.0, std=1.0, bias=0.0):
    if hasattr(module, 'weight') and module.weight is not None:
        nn.init.normal_(module.weight, mean, std)
    if hasattr(module, 'bias') and module.bias is not None:
        nn.init.constant_(module.bias, bias)


class BaseRoIExtractor(nn.Module):
    """mmdet BaseRoIExtractor subset (reference:
    mmdet/models/roi_heads/roi_extractors/base_roi_extractor.py:10)."""

    def __init__(self, roi_layer, out_channels, featmap_strides,
                 init_cfg=None, **kwargs):
        super().__init__()
        cfg = dict(roi_layer)
        assert cfg.pop('type') == 'RoIAlign'
        self.roi_layers = nn.ModuleList(
            PureRoIAlign(spatial_scale=1.0 / s, **cfg)
            for s in featmap_strides)
        self.out_channels = out_channels
        self.featmap_strides = featmap_strides

    @property
    def num_inputs(self):
        return len(self.featmap_strides)


# -------------------------------------------------------- module installs

def _module(name, **attrs):
    import importlib.machinery
    m = types.ModuleType(name)
    # a real ModuleSpec so importlib.util.find_spec probes (e.g.
    # transformers' torchvision availability check) don't explode
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_installed = False


def install_reference_shims():
    global _installed
    if _installed:
        return
    _installed = True

    # import transformers FIRST so its optional-dependency probing runs
    # before any fake torchvision module exists in sys.modules
    import transformers.models.deformable_detr.modeling_deformable_detr  # noqa: F401

    if 'mmcv' not in sys.modules:
        mmcv = _module('mmcv')
        ops = _module('mmcv.ops', nms=mmcv_nms, RoIAlign=PureRoIAlign)
        _module('mmcv.ops.nms', nms=mmcv_nms)
        _module('mmcv.ops.bbox', bbox_overlaps=bbox_overlaps_t)
        cnn = _module('mmcv.cnn', ConvModule=ConvModule, Linear=nn.Linear,
                      normal_init=normal_init)
        mmcv.ops, mmcv.cnn = ops, cnn

    if 'mmdet' not in sys.modules:
        mmdet = _module('mmdet')
        models = _module('mmdet.models', BaseRoIExtractor=BaseRoIExtractor)
        mmdet.models = models

    if 'torchvision' not in sys.modules:
        tv = _module('torchvision')
        tv.ops = _module('torchvision.ops', box_iou=box_iou_t, nms=None)

    # ---- transformers 4.57 compat for 4.32-era symbol names
    import transformers.models.deformable_detr.modeling_deformable_detr \
        as mdd
    if not hasattr(mdd, 'DeformableDetrHungarianMatcher'):
        from transformers.loss.loss_deformable_detr import (
            DeformableDetrHungarianMatcher)
        mdd.DeformableDetrHungarianMatcher = DeformableDetrHungarianMatcher
    if not hasattr(mdd, 'DeformableDetrLoss'):
        from transformers.loss.loss_deformable_detr import (
            DeformableDetrImageLoss)
        mdd.DeformableDetrLoss = DeformableDetrImageLoss
    if not hasattr(mdd, 'generalized_box_iou'):
        from transformers.loss.loss_for_object_detection import (
            generalized_box_iou)
        mdd.generalized_box_iou = generalized_box_iou

    if not hasattr(mdd.DeformableDetrMultiscaleDeformableAttention,
                   '_reset_parameters'):
        import math

        def _reset_parameters(self):
            # 4.32's MSDA init (4.57 moved it into _init_weights)
            nn.init.constant_(self.sampling_offsets.weight.data, 0.0)
            default_dtype = torch.get_default_dtype()
            thetas = torch.arange(self.n_heads, dtype=torch.int64).to(
                default_dtype) * (2.0 * math.pi / self.n_heads)
            grid_init = torch.stack([thetas.cos(), thetas.sin()], -1)
            grid_init = (
                (grid_init / grid_init.abs().max(-1, keepdim=True)[0])
                .view(self.n_heads, 1, 1, 2)
                .repeat(1, self.n_levels, self.n_points, 1))
            for i in range(self.n_points):
                grid_init[:, :, i, :] *= i + 1
            with torch.no_grad():
                self.sampling_offsets.bias = nn.Parameter(
                    grid_init.view(-1))
            nn.init.constant_(self.attention_weights.weight.data, 0.0)
            nn.init.constant_(self.attention_weights.bias.data, 0.0)
            nn.init.xavier_uniform_(self.value_proj.weight.data)
            nn.init.constant_(self.value_proj.bias.data, 0.0)
            nn.init.xavier_uniform_(self.output_proj.weight.data)
            nn.init.constant_(self.output_proj.bias.data, 0.0)

        mdd.DeformableDetrMultiscaleDeformableAttention._reset_parameters \
            = _reset_parameters

    def _fill_list(kw):
        if kw.get('spatial_shapes_list') is None \
                and kw.get('spatial_shapes') is not None:
            kw['spatial_shapes_list'] = [
                (int(h), int(w)) for h, w in kw['spatial_shapes']]
        return kw

    if not getattr(mdd.DeformableDetrEncoder.forward, '_shimmed', False):
        orig_enc = mdd.DeformableDetrEncoder.forward

        def enc_fwd(self, *a, **kw):
            return orig_enc(self, *a, **_fill_list(kw))
        enc_fwd._shimmed = True
        mdd.DeformableDetrEncoder.forward = enc_fwd

    if not getattr(mdd.DeformableDetrDecoderLayer.forward, '_shimmed',
                   False):
        orig_lyr = mdd.DeformableDetrDecoderLayer.forward

        def lyr_fwd(self, *a, **kw):
            return orig_lyr(self, *a, **_fill_list(kw))
        lyr_fwd._shimmed = True
        mdd.DeformableDetrDecoderLayer.forward = lyr_fwd


def load_reference_groma():
    """Import the reference's groma.model.groma with shims installed."""
    install_reference_shims()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import groma.model.groma as ref_groma
    return ref_groma
