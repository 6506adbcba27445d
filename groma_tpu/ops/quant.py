"""Weight-only int8 quantization for HBM-bound decode.

TPU-native replacement for the reference's bitsandbytes 4/8-bit inference
switch (reference: groma/eval/run_groma.py:43-61 — CUDA-only kernels).
Decode on a single chip is weight-streaming-bound (~13.5 GB/step for 7B
bf16), so storing matmul weights as int8 + per-output-channel scales and
dequantizing inside the kernel's VMEM halves the HBM traffic — a ~2x
decode speedup ceiling.

``int8_matmul`` is a Pallas kernel: int8 weight tiles are DMA'd to VMEM,
converted and scaled in-register, and fed to the MXU against the bf16
activations.  A pure-XLA fallback covers CPU/debugging.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_weight(w: jnp.ndarray, pad_to: int = 0):
    """(K, N) float -> (int8 (K, N'), scale (N',) f32), symmetric
    per-column (per-output-channel).

    ``pad_to`` zero-pads N up to a multiple at quantization time so the
    matmul kernel never re-pads per call (a ragged lm_head costs a 132 MB
    copy per decode step otherwise); callers slice outputs back to the
    true N."""
    w = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w), axis=0)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    if pad_to:
        n = q.shape[1]
        pad = (-n) % pad_to
        if pad:
            q = jnp.pad(q, ((0, 0), (0, pad)))
            scale = jnp.pad(scale, (0, pad), constant_values=1.0)
    return q, scale


def dequantize_weight(q: jnp.ndarray, scale: jnp.ndarray,
                      dtype=jnp.bfloat16):
    return (q.astype(jnp.float32) * scale).astype(dtype)


def _int8_matmul_kernel(x_ref, w_ref, scale_ref, o_ref, *, block_n):
    """Resident-K tile: whole (K, block_n) int8 weight strip in VMEM,
    dequantized and fed to the MXU in one dot.  Faster than a K-gridded
    accumulate variant at decode shapes (61.5 vs 51.5 tok/s measured) —
    the grid-step overhead outweighs double-buffering gains when M is
    tiny.  block_n must keep (K * block_n) int8 + its bf16 dequant temp
    under VMEM (~11 MB at K=11008, block_n=256)."""
    x = x_ref[:]                                   # (M, K) bf16
    w = w_ref[:].astype(jnp.bfloat16)              # (K, bn) dequant
    acc = jax.lax.dot(x, w, preferred_element_type=jnp.float32)
    o_ref[:] = (acc * scale_ref[:]).astype(o_ref.dtype)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=('block_n', 'block_m',
                                             'interpret'))
def int8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray,
                block_n: int = 0, block_m: int = 128,
                interpret: bool | None = None):
    """x (M, K) bf16/f32 @ int8 weights (K, N) with per-column scales.

    Returns (M, N) in x.dtype.  K must be a multiple of 32 (int8 sublane
    tile); N is padded to block_n internally (pre-pad weights with
    ``quantize_weight(pad_to=...)`` to avoid the per-call copy).
    ``block_n=0`` auto-tunes: 512 when the (K, bn) int8 strip + its bf16
    dequant double-buffer fits VMEM, else 256 (measured 724 vs 581 GB/s
    at K=4096 decode shapes).
    """
    if interpret is None:
        interpret = not _on_tpu()
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    if block_n == 0:
        block_n = 512 if 6 * k * 512 <= 14 * 1024 * 1024 else 256
    if k % 32 != 0:
        # shape not kernel-friendly: XLA fallback
        return (x.astype(jnp.float32)
                @ (w_q.astype(jnp.float32) * scale)).astype(x.dtype)
    if m >= 256 and not interpret:
        # compute-bound regime (prefill): the weight-resident Pallas
        # kernel is tuned for tiny-M decode and runs BELOW the plain
        # bf16 matmul here (132 vs 150 TF/s at M=6144/K=4096/N=12288,
        # benchmarks/exp_prefill_matmul.py) — materialize the bf16
        # dequant (one extra weight-sized HBM round-trip, ~3% of the
        # matmul time) and let XLA run the MXU-peak bf16 dot.  Numerics
        # identical to the kernel (same dequant then bf16 x bf16 dot).
        w = (w_q.astype(jnp.float32) * scale).astype(jnp.bfloat16)
        return jax.lax.dot(
            x.astype(jnp.bfloat16), w,
            preferred_element_type=jnp.float32).astype(x.dtype)
    m_pad = 0
    if m < 8:
        # single-token decode: pad rows up to the fp32 sublane tile —
        # still weight-streaming-bound, and it keeps the int8 weights
        # un-materialized (the XLA fallback would dequantize all of HBM)
        m_pad = 8 - m
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
        m = 8
    block_m = min(block_m, m)
    n_pad = pl.cdiv(n, block_n) * block_n
    m_pad2 = pl.cdiv(m, block_m) * block_m - m
    w_p = jnp.pad(w_q, ((0, 0), (0, n_pad - n)))
    s_p = jnp.pad(scale.astype(jnp.float32), (0, n_pad - n))[None, :]
    x_p = jnp.pad(x, ((0, m_pad2), (0, 0)))

    # grid order (n outer, m inner): the int8 weight strip stays RESIDENT
    # across the whole m sweep (same block index -> no re-fetch), so
    # multi-block-m calls (prefill: m ~ 6k) stream each weight byte from
    # HBM exactly once instead of m/block_m times
    out = pl.pallas_call(
        functools.partial(_int8_matmul_kernel, block_n=block_n),
        grid=(n_pad // block_n, (m + m_pad2) // block_m),
        in_specs=[
            pl.BlockSpec((block_m, k), lambda j, i: (i, 0)),
            pl.BlockSpec((k, block_n), lambda j, i: (0, j)),
            pl.BlockSpec((1, block_n), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad2, n_pad), x.dtype),
        interpret=interpret,
    )(x_p.astype(jnp.bfloat16) if not interpret else x_p, w_p, s_p)
    return out[:m - m_pad if m_pad else m, :n]


def quantize_act(x: jnp.ndarray):
    """(M, K) float -> (int8 (M, K), scale (M,) f32), symmetric per-row
    (per-token) absmax — the activation half of W8A8."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def w8a8_matmul(x: jnp.ndarray, w_q: jnp.ndarray, scale: jnp.ndarray):
    """x (M, K) float @ int8 weights (K, N): dynamic per-row activation
    quantization + an int8 x int8 -> int32 dot.

    The v5e MXU runs int8 x int8 at ~1.6x the bf16 rate through plain
    XLA (measured 234 TOPS vs 146 TFLOP/s bf16 on this chip), so this is
    the compute-bound PREFILL counterpart of the weight-streaming-bound
    decode kernel above — no Pallas needed, XLA tiles the int8 dot onto
    the MXU directly and fuses the row/column rescale.

    Numerics: per-token symmetric activation int8 on top of the stored
    per-column weight int8 (LLM.int8 vector-wise quantization without
    the outlier decomposition; reference's bnb path is weight-only at
    inference).  Opt-in at the model level — activation outliers in
    trained 7B checkpoints can degrade accuracy, unvalidated until real
    weights land (see llama_quant.quant_llama_forward w8a8 flag)."""
    xq, xs = quantize_act(x)
    acc = jax.lax.dot(xq, w_q, preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * xs[:, None] * scale[None, :]
    return out.astype(x.dtype)


def w8a8_conv(x: jnp.ndarray, kernel: jnp.ndarray,
              strides=(1, 1), padding='SAME'):
    """NHWC conv with BOTH operands quantized to int8 in-graph, run as an
    int8 x int8 -> int32 convolution on the MXU's double-rate integer
    path (measured 258 TOPS vs 169 TFLOP/s bf16 at fuse-conv shapes,
    benchmarks/exp_int8_conv.py; integer arithmetic is exact).

    Quantization: per-tensor symmetric absmax on the activation,
    per-output-channel symmetric absmax on the (kh, kw, ci, co) kernel —
    both folded out of the integer accumulation exactly.  The kernel is
    quantized from its float storage each call (one elementwise pass,
    trivial next to the conv); weights on disk / in checkpoints are
    untouched.  Opt-in for inference: accuracy with trained weights is
    unvalidated until real checkpoints land (see docs/VISION_FLOOR.md).
    """
    kf = kernel.astype(jnp.float32)
    ka = jnp.max(jnp.abs(kf), axis=(0, 1, 2))
    ks = jnp.where(ka > 0, ka / 127.0, 1.0)
    kq = jnp.clip(jnp.round(kf / ks), -127, 127).astype(jnp.int8)
    xf = x.astype(jnp.float32)
    xa = jnp.max(jnp.abs(xf))
    xs = jnp.where(xa > 0, xa / 127.0, 1.0)
    xq = jnp.clip(jnp.round(xf / xs), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, kq, strides, padding,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (xs * ks)


def quantize_dense_tree(params, path_pred):
    """Quantize every Dense kernel whose path matches ``path_pred`` into a
    parallel pytree {path: {'q': int8, 'scale': f32}} plus the stripped
    params.  Used to build weight-only-quantized LLM decode params."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    qtree = {}
    out = []
    for path, leaf in flat:
        name = '/'.join(str(getattr(p, 'key', p)) for p in path)
        if name.endswith('kernel') and path_pred(name) and leaf.ndim == 2:
            q, s = quantize_weight(leaf)
            qtree[name] = {'q': q, 'scale': s}
            out.append(leaf)   # keep original; caller decides replacement
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out), qtree
