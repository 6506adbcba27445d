"""Region encoder parity vs an independent torch restatement of the
reference math (reference: groma/model/roi_align.py:97-326).  The torch
side uses torch convs/GN/interpolate and delegates only the RoIAlign
pooling to our already golden-verified op."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from groma_tpu.models.region_encoder import (
    RegionEncoder, resize_bilinear_align_corners)
from groma_tpu.checkpoint.hf_import import import_region_encoder
from groma_tpu.ops.roi_align import roi_align
import pytest

D = 32          # embed dims (divisible by 4; GN groups scaled down)
NL = 3
NF = 2          # fuse rounds (test-scale)
ROI = 4         # pooled size
GN_GROUPS = 8
BASE = 8        # base grid 8x8 (tokens 64)
OUT = 64
IMG = 448


def _mk_weights(rng):
    t = lambda *s: torch.from_numpy(rng.standard_normal(s).astype(np.float32) * 0.1)
    sd = {}
    for lvl in range(NL):
        sd[f'mlvl_fuse.input_conv.{lvl}.weight'] = t(D, D + 2, 1, 1)
        sd[f'mlvl_fuse.input_conv.{lvl}.bias'] = t(D)
    for i in range(NF):
        sd[f'mlvl_fuse.fuse_convs.{i}.conv.weight'] = t(D, D, 3, 3)
        sd[f'mlvl_fuse.fuse_convs.{i}.gn.weight'] = t(D)
        sd[f'mlvl_fuse.fuse_convs.{i}.gn.bias'] = t(D)
    for lvl in range(NL):
        sd[f'roi_align.pconvs.{lvl}.weight'] = t(D, D, 3, 3)
        sd[f'roi_align.pconvs.{lvl}.bias'] = t(D)
    sd['roi_align.pos_embedd.0.weight'] = t(256, 4)
    sd['roi_align.pos_embedd.0.bias'] = t(256)
    sd['roi_align.pos_embedd.2.weight'] = t(256)
    sd['roi_align.pos_embedd.2.bias'] = t(256)
    sd['roi_align.pos_embedd.3.weight'] = t(1024, 256)
    sd['roi_align.pos_embedd.3.bias'] = t(1024)
    sd['roi_align.pos_embedd.5.weight'] = t(1024)
    sd['roi_align.pos_embedd.5.bias'] = t(1024)
    sd['roi_align.flatten_linear.weight'] = t(1024, D * ROI * ROI)
    sd['roi_align.flatten_linear.bias'] = t(1024)
    sd['roi_align.updims.weight'] = t(OUT, 1024)
    sd['roi_align.updims.bias'] = t(OUT)
    return sd


def _torch_forward(sd, feats_tokens, boxes):
    """Reference math in torch, NCHW."""
    b = feats_tokens[0].shape[0]
    feats = [f.reshape(b, BASE, BASE, D).permute(0, 3, 1, 2)
             for f in feats_tokens]
    to_shape = [(BASE * 2 ** l,) * 2 for l in range(NL)][::-1]
    feats = [F.interpolate(f, size=s, mode='bilinear', align_corners=True)
             for f, s in zip(feats, to_shape)]
    # coord conv + input convs
    new = []
    for lvl, f in enumerate(feats):
        h, w = f.shape[-2:]
        xr = torch.linspace(-1, 1, w)
        yr = torch.linspace(-1, 1, h)
        y, x = torch.meshgrid(yr, xr, indexing='ij')
        coord = torch.cat([x.expand(b, 1, -1, -1), y.expand(b, 1, -1, -1)], 1)
        f = torch.cat([f, coord], 1)
        new.append(F.conv2d(f, sd[f'mlvl_fuse.input_conv.{lvl}.weight'],
                            sd[f'mlvl_fuse.input_conv.{lvl}.bias']))
    feats = new
    shuffle, remain = D // 4, D - D // 2
    for i in range(NF):
        fused = []
        for lvl in range(NL):
            top, down = min(lvl + 1, NL - 1), max(lvl - 1, 0)
            tar = feats[lvl]
            keep = tar[:, :remain]
            ft = F.interpolate(feats[top][:, remain + shuffle:],
                               size=tar.shape[-2:], mode='bilinear',
                               align_corners=True)
            fd = F.interpolate(feats[down][:, remain:remain + shuffle],
                               size=tar.shape[-2:], mode='bilinear',
                               align_corners=True)
            x = torch.cat([keep, ft, fd], 1)
            x = F.conv2d(x, sd[f'mlvl_fuse.fuse_convs.{i}.conv.weight'],
                         None, padding=1)
            x = F.group_norm(x, GN_GROUPS,
                             sd[f'mlvl_fuse.fuse_convs.{i}.gn.weight'],
                             sd[f'mlvl_fuse.fuse_convs.{i}.gn.bias'])
            fused.append(F.relu(x))
        feats = fused
    # pos embed
    h = F.relu(F.linear(boxes, sd['roi_align.pos_embedd.0.weight'],
                        sd['roi_align.pos_embedd.0.bias']))
    h = F.layer_norm(h, (256,), sd['roi_align.pos_embedd.2.weight'],
                     sd['roi_align.pos_embedd.2.bias'])
    h = F.relu(F.linear(h, sd['roi_align.pos_embedd.3.weight'],
                        sd['roi_align.pos_embedd.3.bias']))
    pos = F.layer_norm(h, (1024,), sd['roi_align.pos_embedd.5.weight'],
                       sd['roi_align.pos_embedd.5.bias'])
    # rois: cxcywh-as-xyxy quirk
    r = boxes.shape[1]
    rois = []
    for i in range(b):
        ri = boxes[i] * IMG
        rois.append(torch.cat([torch.full((r, 1), float(i)), ri], 1))
    rois = torch.cat(rois).numpy()
    strides = [14 / 8, 14 / 4, 14 / 2]
    acc = None
    for lvl in range(NL):
        f_nhwc = jnp.asarray(feats[lvl].permute(0, 2, 3, 1).detach().numpy())
        pooled = roi_align(f_nhwc, jnp.asarray(rois), ROI,
                           1.0 / strides[lvl], 2)
        pooled = torch.from_numpy(np.asarray(pooled)).permute(0, 3, 1, 2)
        p = F.conv2d(pooled, sd[f'roi_align.pconvs.{lvl}.weight'],
                     sd[f'roi_align.pconvs.{lvl}.bias'], padding=1)
        acc = p if acc is None else acc + p
    acc = F.relu(acc).flatten(1)                      # NCHW flatten
    tok = F.linear(acc, sd['roi_align.flatten_linear.weight'],
                   sd['roi_align.flatten_linear.bias'])
    tok = tok.reshape(b, r, 1024) + pos
    return F.linear(tok, sd['roi_align.updims.weight'],
                    sd['roi_align.updims.bias'])


@pytest.mark.slow
def test_region_encoder_matches_torch_reference(rng):
    sd_t = _mk_weights(rng)
    sd = {k: v.numpy() for k, v in sd_t.items()}
    b, r = 2, 5
    feats_tokens = [rng.standard_normal((b, BASE * BASE, D)).astype(np.float32)
                    for _ in range(NL)]
    boxes = rng.uniform(0.1, 0.9, (b, r, 4)).astype(np.float32)

    want = _torch_forward(sd_t, [torch.from_numpy(f) for f in feats_tokens],
                          torch.from_numpy(boxes)).detach().numpy()

    params = import_region_encoder(sd, NL, NF, embed_dims=D, roi_out=ROI)
    model = RegionEncoder(embed_dims=D, out_dims=OUT, num_levels=NL,
                          image_size=IMG, roi_out=ROI, num_fuse=NF,
                          gn_groups=GN_GROUPS)
    got = model.apply({'params': params},
                      [jnp.asarray(f) for f in feats_tokens],
                      jnp.asarray(boxes))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3, rtol=1e-3)


def test_align_corners_resize_matches_torch(rng):
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (9, 11)))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(9, 11), mode='bilinear',
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_region_encoder_int8_close_to_float(rng):
    """quant=True (int8 x int8 fuse/pconv convs, ops/quant.w8a8_conv)
    must track the float path closely and reuse the IDENTICAL param tree
    (the switch quantizes in-graph; checkpoints are untouched)."""
    sd = {k: v.numpy() for k, v in _mk_weights(rng).items()}
    b, r = 2, 5
    feats_tokens = [rng.standard_normal((b, BASE * BASE, D)).astype(np.float32)
                    for _ in range(NL)]
    boxes = rng.uniform(0.1, 0.9, (b, r, 4)).astype(np.float32)
    params = import_region_encoder(sd, NL, NF, embed_dims=D, roi_out=ROI)
    kw = dict(embed_dims=D, out_dims=OUT, num_levels=NL, image_size=IMG,
              roi_out=ROI, num_fuse=NF, gn_groups=GN_GROUPS)
    feats = [jnp.asarray(f) for f in feats_tokens]
    want = np.asarray(RegionEncoder(**kw).apply(
        {'params': params}, feats, jnp.asarray(boxes)))
    got = np.asarray(RegionEncoder(quant=True, **kw).apply(
        {'params': params}, feats, jnp.asarray(boxes)))
    cos = (want * got).sum() / (
        np.linalg.norm(want) * np.linalg.norm(got) + 1e-30)
    assert cos > 0.995, cos
    # per-element agreement within combined quantization noise
    denom = np.maximum(np.abs(want).max(), 1e-6)
    assert np.abs(got - want).max() / denom < 0.15
