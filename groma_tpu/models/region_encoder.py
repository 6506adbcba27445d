"""Region tokenizer: multi-level fusion + RoIAlign -> region tokens.

Re-design of the reference's MLVLROIQueryModule / MLVLFuseModule /
MlvlRoIExtractor (reference: groma/model/roi_align.py:97-326) with static
(B, R) region capacity and NHWC layout.

Parity-critical reference behaviors preserved:
* the last-3 ViT hidden layers are bilinear-upsampled (align_corners=True)
  to [4x, 2x, 1x] of the 32x32 base grid, largest first
  (reference: roi_align.py:220-227),
* coord-conv channels appended as linspace(-1, 1) x then y grids
  (reference: roi_align.py:118-126),
* 5 rounds of cross-level channel-shuffle fusion: keep the first 512
  channels, pull channels 768:1024 from the next-coarser level and 512:768
  from the next-finer level, both bilinear align_corners=True resized, then
  3x3 conv + GroupNorm(64) + ReLU (reference: roi_align.py:150-178;
  mmcv ConvModule => conv has no bias when followed by a norm),
* **the cxcywh quirk**: RoIAlign receives ``boxes * 448`` used directly as
  (x1, y1, x2, y2) corners even though the boxes are normalized cxcywh —
  the reference never converts (reference: roi_align.py:288-294), and the
  released checkpoints are trained with exactly these semantics, so we
  reproduce them bit-for-bit (boxes with w < cx produce negative-extent
  rois whose out-of-map samples are zero),
* RoIAlign strides [14/8, 14/4, 14/2] overshoot the actual feature sizes
  2x (reference: roi_align.py:204) — also preserved,
* RoIAlign runs in fp32 islands inside a bf16 model
  (reference: roi_align.py:303),
* box position MLP(4->256->1024 with ReLU+LayerNorm) added before the final
  1024->4096 up-projection (reference: roi_align.py:254-262,320-321).

TPU-first notes: align_corners=True bilinear resize is expressed as two
dense interpolation matmuls (MXU) instead of a gather; all R region slots
are processed unconditionally and invalid slots masked by the caller.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


from groma_tpu.ops.quant import w8a8_conv
from groma_tpu.ops.roi_align import roi_align_batched
from groma_tpu.parallel.mesh import constrain


def _align_corners_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """(out, in) bilinear interpolation matrix with align_corners=True."""
    if in_size == 1:
        return jnp.ones((out_size, 1), jnp.float32)
    if out_size == 1:
        m = jnp.zeros((1, in_size), jnp.float32)
        return m.at[0, 0].set(1.0)
    scale = (in_size - 1) / (out_size - 1)
    src = jnp.arange(out_size, dtype=jnp.float32) * scale
    lo = jnp.clip(jnp.floor(src).astype(jnp.int32), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    frac = src - lo.astype(jnp.float32)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    rows = jnp.arange(out_size)
    m = m.at[rows, lo].add(1.0 - frac)
    m = m.at[rows, hi].add(frac)
    return m


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw,
                                  compute_dtype=jnp.float32) -> jnp.ndarray:
    """NHWC bilinear resize, align_corners=True, as two matmuls.

    ``compute_dtype`` selects the matmul precision: the fuse-internal
    resizes are fp32 (reference: roi_align.py:164 casts to float32) while
    the initial feature upsampling runs in the model dtype
    (reference: roi_align.py:227 interpolates bf16 features directly).
    """
    oh, ow = out_hw
    b, h, w, c = x.shape
    if (oh, ow) == (h, w):
        # same-size align-corners bilinear is the identity (torch
        # F.interpolate included) — skip the two matmuls; the boundary
        # levels' self-neighbor shuffles hit this every fuse round
        return x.astype(compute_dtype)
    ah = _align_corners_matrix(oh, h).astype(compute_dtype)
    aw = _align_corners_matrix(ow, w).astype(compute_dtype)
    x = jnp.einsum('oh,bhwc->bowc', ah, x.astype(compute_dtype))
    x = jnp.einsum('ow,bhwc->bhoc', aw, x)
    return x


class _SlicedConv(nn.Module):
    """3x3 no-bias conv over CHANNEL SLICES of its input: applies the one
    stored kernel sliced along the input-channel axis to each piece and
    sums — mathematically identical to conv(concat(pieces)) but without
    materializing the concatenation.  The parameter path/shape matches
    nn.Conv ('kernel', (3, 3, cin, features)), so checkpoints and the HF
    importer are unaffected.

    ``quant=True`` runs each slice through ops/quant.w8a8_conv (int8 x
    int8 on the MXU integer path, ~1.5x the bf16 conv rate;
    benchmarks/exp_int8_conv.py) — per-slice activation scales,
    per-output-channel kernel scales, exact dequant before the sum.
    Inference opt-in (GromaConfig.vision_int8)."""
    features: int
    cin: int
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, pieces):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, self.cin, self.features))
        acc = None
        off = 0
        for p in pieces:
            c = p.shape[-1]
            k = kernel[:, :, off:off + c, :]
            if self.quant:
                y = w8a8_conv(p, k, (1, 1), ((1, 1), (1, 1)))
            else:
                y = jax.lax.conv_general_dilated(
                    p.astype(self.dtype), k.astype(self.dtype), (1, 1),
                    ((1, 1), (1, 1)),
                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
            off += c
        assert off == self.cin, (off, self.cin)
        return acc.astype(self.dtype)


class ConvModuleGN(nn.Module):
    """mmcv ConvModule(conv 3x3 no-bias -> GroupNorm(64) -> ReLU).

    ``x`` may be a tuple of channel slices (see _SlicedConv)."""
    features: int
    groups: int = 64
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, x):
        if not isinstance(x, (tuple, list)):
            x = (x,)
        cin = sum(p.shape[-1] for p in x)
        x = _SlicedConv(self.features, cin, dtype=self.dtype,
                        quant=self.quant, name='conv')(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name='gn')(x)
        return nn.relu(x)


class MLVLFuse(nn.Module):
    """(reference: groma/model/roi_align.py:97-193 MLVLFuseModule)."""
    embed_dims: int = 1024
    num_levels: int = 3
    num_fuse: int = 5
    gn_groups: int = 64
    dtype: jnp.dtype = jnp.float32
    quant: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]):
        d = self.embed_dims
        shuffle = d // 4
        remain = d - 2 * shuffle
        feats = [f.astype(self.dtype) for f in feats]

        # coord-conv channels + 1x1 input convs
        withcoord = []
        for lvl, f in enumerate(feats):
            b, h, w, _ = f.shape
            xs = jnp.linspace(-1.0, 1.0, w)
            ys = jnp.linspace(-1.0, 1.0, h)
            xg = jnp.broadcast_to(xs[None, :], (h, w))
            yg = jnp.broadcast_to(ys[:, None], (h, w))
            coord = jnp.broadcast_to(jnp.stack([xg, yg], -1)[None],
                                     (b, h, w, 2)).astype(f.dtype)
            f = jnp.concatenate([f, coord], axis=-1)
            withcoord.append(
                nn.Conv(d, (1, 1), dtype=self.dtype,
                        name=f'input_conv_{lvl}')(f))
        feats = withcoord

        fuse_convs = [ConvModuleGN(d, self.gn_groups, dtype=self.dtype,
                                   quant=self.quant,
                                   name=f'fuse_conv_{i}')
                      for i in range(self.num_fuse)]
        n = self.num_levels
        for conv in fuse_convs:
            fused = []
            for lvl in range(n):
                top = min(lvl + 1, n - 1)
                down = max(lvl - 1, 0)
                tar = feats[lvl]
                hw = tar.shape[1:3]
                keep = tar[..., :remain]
                from_top = resize_bilinear_align_corners(
                    feats[top][..., remain + shuffle:], hw).astype(tar.dtype)
                from_down = resize_bilinear_align_corners(
                    feats[down][..., remain:remain + shuffle],
                    hw).astype(tar.dtype)
                # conv(cat(a, b, c)) == conv_a(a) + conv_b(b) + conv_c(c)
                # with the kernel sliced along its input-channel axis:
                # skips materializing the (B, H, W, 1024) concat (~4 ms
                # per b8 vision batch); the stored parameter layout is
                # unchanged (checkpoint/import compatible)
                fused.append((keep, from_top, from_down))
            feats = [conv(f) for f in fused]
        return feats


class RegionEncoder(nn.Module):
    """(B, R, 4) normalized cxcywh boxes -> (B, R, out_dims) region tokens.

    (reference: groma/model/roi_align.py:196-326)
    """
    embed_dims: int = 1024
    out_dims: int = 4096
    num_levels: int = 3
    image_size: int = 448
    roi_out: int = 14
    num_fuse: int = 5
    gn_groups: int = 64
    dtype: str = 'float32'    # compute dtype for fuse/proj convs (bf16 at
                              # full scale, matching the reference's model
                              # dtype; RoIAlign stays an fp32 island)
    quant: bool = False       # int8 x int8 fuse/pconv convs on the MXU
                              # integer path (GromaConfig.vision_int8)

    @nn.compact
    def __call__(self, mlvl_feats: Sequence[jnp.ndarray], boxes: jnp.ndarray):
        cdtype = jnp.dtype(self.dtype)
        d = self.embed_dims
        nl = self.num_levels
        assert len(mlvl_feats) == nl
        b, r, _ = boxes.shape

        # token maps -> 2D NHWC, upsample to [4x, 2x, 1x] of the base grid
        feats2d = []
        for f in mlvl_feats:
            if f.ndim == 3:
                bb, l, c = f.shape
                g = int(round(l ** 0.5))
                f = f.reshape(bb, g, g, c)
            feats2d.append(f)
        base = feats2d[0].shape[1]
        to_shape = [(base * 2 ** lvl,) * 2 for lvl in range(nl)][::-1]
        feats2d = [resize_bilinear_align_corners(
                       f.astype(cdtype), s, compute_dtype=cdtype)
                   for f, s in zip(feats2d, to_shape)]

        fused = MLVLFuse(d, nl, num_fuse=self.num_fuse,
                         gn_groups=self.gn_groups, dtype=cdtype,
                         quant=self.quant, name='mlvl_fuse')(feats2d)

        # position embedding of the raw normalized boxes
        # (reference: roi_align.py:254-261,278)
        # every intermediate is pinned batch-over-(dp, fsdp): the pins
        # transpose onto the cotangents, so weight grads of the (small)
        # fsdp-sharded pos kernels reduce-scatter from batch-sharded
        # operands instead of resharding activations (involuntary-remat
        # source in MULTICHIP_r02)
        h = nn.relu(nn.Dense(256, name='pos_fc1')(boxes.astype(jnp.float32)))
        h = constrain(h, ('dp', 'fsdp'))
        h = nn.LayerNorm(name='pos_ln1')(h)
        h = constrain(nn.relu(nn.Dense(1024, name='pos_fc2')(h)),
                      ('dp', 'fsdp'))
        pos = nn.LayerNorm(name='pos_ln2')(h)             # (B, R, 1024)
        pos = constrain(pos, ('dp', 'fsdp'))

        # rois: THE cxcywh-as-xyxy quirk — multiply by image size, no
        # format conversion (reference: roi_align.py:289-294).  Pooling
        # uses the separable-matmul RoIAlign (ops/roi_align.py
        # roi_align_batched): MXU matmuls instead of 4-corner gathers.
        rois = (boxes * self.image_size).astype(jnp.float32)   # (B, R, 4)

        strides = [14 / 8, 14 / 4, 14 / 2]
        pooled_all = []
        for lvl in range(nl):
            pooled = roi_align_batched(
                fused[lvl].astype(jnp.float32), rois,
                output_size=self.roi_out,
                spatial_scale=1.0 / strides[lvl],
                sampling_ratio=2, aligned=True)
            pooled_all.append(
                pooled.reshape(b * r, self.roi_out, self.roi_out,
                               d).astype(cdtype))
        # sum_l conv_l(pooled_l) == ONE conv over channel-concatenated
        # inputs with channel-concatenated kernels: 1/3 the conv calls and
        # a 3x deeper contraction for the MXU (reference math:
        # roi_align.py:312-317 pconvs sum).
        kernels = [self.param(f'pconv_kernel_{lvl}',
                              nn.initializers.normal(0.01), (3, 3, d, d))
                   for lvl in range(nl)]
        biases = [self.param(f'pconv_bias_{lvl}', nn.initializers.zeros,
                             (d,)) for lvl in range(nl)]
        cat_in = jnp.concatenate(pooled_all, axis=-1)
        cat_k = jnp.concatenate(kernels, axis=2)
        if self.quant:
            acc = w8a8_conv(cat_in, cat_k, (1, 1), ((1, 1), (1, 1)))
        else:
            acc = jax.lax.conv_general_dilated(
                cat_in, cat_k.astype(cdtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
                preferred_element_type=jnp.float32)
        acc = (acc + sum(biases)).astype(cdtype)
        acc = nn.relu(acc)                                 # (B*R, 14, 14, d)
        flat = acc.reshape(b * r, -1).astype(cdtype)
        # keep the flattened ROI batch sharded over (dp, fsdp): without
        # the pin the partitioner reshards this activation to match the
        # fsdp-sharded flatten_linear kernel (involuntary full remat,
        # MULTICHIP_r02); gathering the kernel instead is the FSDP deal
        flat = constrain(flat, ('dp', 'fsdp'))
        # NOTE: the reference flattens NCHW (channel-major); our NHWC
        # flatten permutes features, so the flatten_linear kernel is
        # re-ordered correspondingly at import time (hf_import.py).
        tokens = nn.Dense(1024, dtype=cdtype, name='flatten_linear')(flat)
        # pin the dot's RESULT to the batch layout as well: with operand
        # and result both batch-sharded the partitioner all-gathers the
        # fsdp-sharded kernel (the FSDP contract) instead of resharding
        # the activation through a transposed device order
        tokens = constrain(tokens, ('dp', 'fsdp'))
        tokens = tokens.reshape(b, r, 1024) + pos.astype(cdtype)
        tokens = constrain(tokens, ('dp', 'fsdp'))
        out = nn.Dense(self.out_dims, dtype=cdtype, name='updims')(tokens)
        return constrain(out, ('dp', 'fsdp'))
