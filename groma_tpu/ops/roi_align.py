"""RoIAlign for TPU: static-shape, gather-based, autodiff-friendly.

TPU-native replacement for the reference's C++/CUDA RoIAlign
(reference: mmcv/mmcv/ops/csrc/common/cuda/roi_align_cuda_kernel.cuh:17-108,
wrapper mmcv/mmcv/ops/roi_align.py:14,134).  Numerics match the CUDA kernel
bit-for-bit in fp32:

* ``aligned=True``: roi coords scaled by ``spatial_scale`` then shifted by
  -0.5 (the "do not use rounding" detail, kernel line 35-40),
* ``sampling_ratio`` fixed sample grid per bin at ``(i + 0.5) * bin / g``,
* out-of-bounds samples (y < -1 or y > H or x < -1 or x > W) contribute 0,
  in-bounds coords clamped to [0, size-1] with edge collapse at the high end
  (reference: common_cuda_helper.hpp:29-60 bilinear_interpolate).

Design notes (TPU-first):
* NHWC layout — channels-last keeps the trailing 128-lane dimension dense.
* All RoIs gather from a single batched feature tensor with advanced
  indexing; XLA lowers this to one fused gather, and autodiff produces the
  scatter-add backward (replacing roi_align_backward_cuda_kernel).
* Padding rows (invalid RoIs) are handled by the caller via masks; the op
  itself is total — any box produces a deterministic output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _bilinear_weights(coord: jnp.ndarray, size: int):
    """Per-axis bilinear low/high indices + weights with mmcv edge rules.

    coord: any-shape fp32 sample positions (already scaled/offset).
    Returns (idx_low, idx_high, w_low, w_high, in_bounds).
    """
    in_bounds = (coord >= -1.0) & (coord <= size)
    c = jnp.maximum(coord, 0.0)
    low = jnp.floor(c).astype(jnp.int32)
    # collapse at the high edge: low >= size-1 -> low = high = size-1, frac 0
    at_edge = low >= size - 1
    low = jnp.where(at_edge, size - 1, low)
    high = jnp.where(at_edge, size - 1, low + 1)
    frac = jnp.where(at_edge, 0.0, c - low.astype(c.dtype))
    return low, high, 1.0 - frac, frac, in_bounds


@functools.partial(
    jax.jit,
    static_argnames=('output_size', 'spatial_scale', 'sampling_ratio',
                     'aligned'))
def roi_align(features: jnp.ndarray,
              rois: jnp.ndarray,
              output_size: int = 14,
              spatial_scale: float = 1.0,
              sampling_ratio: int = 2,
              aligned: bool = True) -> jnp.ndarray:
    """RoIAlign average pooling.

    Args:
      features: (B, H, W, C) feature maps.
      rois: (R, 5) rows of [batch_index, x1, y1, x2, y2] in input pixels.
      output_size: pooled output resolution (square).
      spatial_scale: multiply roi coords by this to reach feature coords.
      sampling_ratio: samples per bin per axis (must be > 0 here; Groma
        always uses 2, reference: groma/model/roi_align.py:207).
      aligned: half-pixel alignment (mmcv default True).

    Returns:
      (R, output_size, output_size, C) pooled features, fp32.
    """
    assert sampling_ratio > 0, 'adaptive sampling_ratio not needed by Groma'
    b, h, w, c = features.shape
    r = rois.shape[0]
    g = sampling_ratio
    out = output_size

    rois = rois.astype(jnp.float32)
    features = features.astype(jnp.float32)
    batch_idx = rois[:, 0].astype(jnp.int32)
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 1] * spatial_scale - offset
    y1 = rois[:, 2] * spatial_scale - offset
    x2 = rois[:, 3] * spatial_scale - offset
    y2 = rois[:, 4] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / out
    bin_h = roi_h / out

    # sample positions: (R, out, g) per axis
    ph = jax.lax.broadcasted_iota(jnp.float32, (out, g), 0)
    iy = jax.lax.broadcasted_iota(jnp.float32, (out, g), 1)
    ys = y1[:, None, None] + (ph + (iy + 0.5) / g) * bin_h[:, None, None]
    xs = x1[:, None, None] + (ph + (iy + 0.5) / g) * bin_w[:, None, None]

    y_lo, y_hi, wy_lo, wy_hi, y_ok = _bilinear_weights(ys, h)
    x_lo, x_hi, wx_lo, wx_hi, x_ok = _bilinear_weights(xs, w)

    # broadcast to the full sample grid (R, out, g, out, g)
    def by(a):  # y-axis terms
        return a[:, :, :, None, None]

    def bx(a):  # x-axis terms
        return a[:, None, None, :, :]

    bidx = batch_idx[:, None, None, None, None]
    bidx = jnp.broadcast_to(bidx, (r, out, g, out, g))

    def gather(yi, xi):
        yi = jnp.broadcast_to(by(yi), (r, out, g, out, g))
        xi = jnp.broadcast_to(bx(xi), (r, out, g, out, g))
        return features[bidx, yi, xi, :]          # (R,out,g,out,g,C)

    valid = (by(y_ok) & bx(x_ok)).astype(jnp.float32)[..., None]
    val = (gather(y_lo, x_lo) * (by(wy_lo) * bx(wx_lo))[..., None]
           + gather(y_lo, x_hi) * (by(wy_lo) * bx(wx_hi))[..., None]
           + gather(y_hi, x_lo) * (by(wy_hi) * bx(wx_lo))[..., None]
           + gather(y_hi, x_hi) * (by(wy_hi) * bx(wx_hi))[..., None])
    val = val * valid
    # average over the g x g samples inside each bin
    return jnp.mean(val, axis=(2, 4))


def _axis_weights(start, bin_size, size, out, g):
    """Dense bilinear sampling weights along one axis.

    start/bin_size: (R,) roi start + per-bin size in feature coords.
    Returns (R, out, size): for each output bin, the average of its g
    sample taps' bilinear weights over the ``size`` integer grid —
    mmcv boundary semantics (skip out-of-range, clamp, edge collapse).
    """
    ph = jax.lax.broadcasted_iota(jnp.float32, (out, g), 0)
    ig = jax.lax.broadcasted_iota(jnp.float32, (out, g), 1)
    # sample positions: (R, out, g)
    p = start[:, None, None] + (ph + (ig + 0.5) / g) * bin_size[:, None, None]
    ok = ((p >= -1.0) & (p <= size)).astype(jnp.float32)
    c = jnp.clip(p, 0.0, size - 1.0)
    grid = jax.lax.broadcasted_iota(jnp.float32, (1, 1, 1, size), 3)
    # tent kernel == bilinear taps on the integer grid
    w = jnp.maximum(0.0, 1.0 - jnp.abs(c[..., None] - grid))
    w = w * ok[..., None]
    return jnp.mean(w, axis=2)                        # (R, out, size)


@functools.partial(
    jax.jit,
    static_argnames=('output_size', 'spatial_scale', 'sampling_ratio',
                     'aligned', 'roi_chunk'))
def roi_align_batched(features: jnp.ndarray,
                      boxes: jnp.ndarray,
                      output_size: int = 14,
                      spatial_scale: float = 1.0,
                      sampling_ratio: int = 2,
                      aligned: bool = True,
                      roi_chunk: int = 25) -> jnp.ndarray:
    """RoIAlign as two interpolation matmuls (MXU path).

    Bilinear sampling is separable, so instead of 4 giant gathers the
    pooled map is ``W_y @ feat @ W_x^T`` with dense per-roi interpolation
    matrices — XLA tiles these straight onto the MXU and peak memory is
    bounded by ``roi_chunk``.  Numerics match ``roi_align`` exactly (same
    mmcv boundary semantics, fp32 accumulation).

    Args:
      features: (B, H, W, C).
      boxes: (B, R, 4) xyxy in input pixels (batched layout — each image
        owns R roi slots, which is Groma's fixed-capacity pool shape).

    Returns (B, R, output_size, output_size, C) fp32.
    """
    b, h, w, c = features.shape
    r = boxes.shape[1]
    out = output_size
    features = features.astype(jnp.float32)
    boxes = boxes.astype(jnp.float32)
    offset = 0.5 if aligned else 0.0
    x1 = boxes[..., 0] * spatial_scale - offset
    y1 = boxes[..., 1] * spatial_scale - offset
    roi_w = boxes[..., 2] * spatial_scale - offset - x1
    roi_h = boxes[..., 3] * spatial_scale - offset - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    def per_image(feat, x1i, y1i, bwi, bhi):
        def chunk_fn(args):
            x1c, y1c, bwc, bhc = args
            wy = _axis_weights(y1c, bhc / out, h, out, sampling_ratio)
            wx = _axis_weights(x1c, bwc / out, w, out, sampling_ratio)
            t = jnp.einsum('roh,hwc->rowc', wy, feat,
                           preferred_element_type=jnp.float32)
            return jnp.einsum('rowc,rpw->ropc', t, wx,
                              preferred_element_type=jnp.float32)

        n_chunks = -(-r // roi_chunk)
        pad = n_chunks * roi_chunk - r
        args = tuple(jnp.pad(a, (0, pad)).reshape(n_chunks, roi_chunk)
                     for a in (x1i, y1i, bwi, bhi))
        pooled = jax.lax.map(chunk_fn, args)
        return pooled.reshape(n_chunks * roi_chunk, out, out, c)[:r]

    return jax.vmap(per_image)(features, x1, y1, roi_w, roi_h)
