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
