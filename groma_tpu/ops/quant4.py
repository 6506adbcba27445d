"""4-bit weight-only quantization: packed int4 Pallas matmul + nf4 format.

The parity surface for the reference's bitsandbytes 4-bit inference switch
(reference: groma/eval/run_groma.py:43-61, BitsAndBytesConfig nf4).  Two
pieces:

* **int4 packed matmul** (the fast decode path): symmetric 4-bit weights
  with per-K-block, per-output-channel fp scales, packed two nibbles per
  byte.  Packing puts row ``k`` and row ``k + K/2`` in one byte, so the
  kernel unpacks into two contiguous half planes and computes
  ``x_lo @ W_lo + x_hi @ W_hi`` — no sublane relayout, pure VPU bit-ops +
  MXU dots.  Halves int8's HBM traffic again (~3.3 GB per 7B decode step).
* **nf4 codec** (format parity): bitsandbytes NormalFloat4 — the fixed
  16-level quantile table with blockwise absmax over flattened weights —
  encode/decode in jnp, so released bnb-nf4 checkpoints can be imported
  and converted to the packed-int4 or int8 runtime formats.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from groma_tpu.ops.quant import _on_tpu

# bitsandbytes NF4 quantile table (functional.py create_normal_map order:
# index 0..15; value 0 at index 7)
NF4_TABLE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0], np.float32)


# ------------------------------------------------------------- int4 pack

# runtime scale-block for the packed-int4 LLM tree (quality/speed knob:
# 128 -> 339 GB/s, 256 -> ~430, 512 -> 404..510 measured at decode shapes)
INT4_BLOCK = 256


def quantize_weight_int4(w: jnp.ndarray, block: int = 128,
                         pad_to: int = 0):
    """(K, N) float -> packed int4 dict.

    Symmetric per-(K-block, column) scales: q in [-7, 7], stored as
    (q + 8) nibbles; rows k and k + K/2 share a byte.  ``pad_to``
    zero-pads N at quantization time (see quantize_weight).

    Returns {'q': uint8 (K/2, N), 'scale': f32 (K/block, N), 'block': b}.
    """
    k, n = w.shape
    assert k % 2 == 0 and k % block == 0, (k, block)
    w = w.astype(jnp.float32)
    if pad_to:
        pad = (-n) % pad_to
        if pad:
            w = jnp.pad(w, ((0, 0), (0, pad)))
            n += pad
    amax = jnp.max(jnp.abs(w.reshape(k // block, block, n)), axis=1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)          # (K/blk, N)
    q = jnp.round(w / jnp.repeat(scale, block, axis=0))
    q = jnp.clip(q, -7, 7).astype(jnp.int32) + 8          # 1..15
    lo, hi = q[:k // 2], q[k // 2:]
    packed = (lo | (hi << 4)).astype(jnp.uint8)           # (K/2, N)
    return {'q': packed, 'scale': scale.astype(jnp.float32),
            'block': block}


def dequantize_weight_int4(qd: dict, dtype=jnp.float32):
    packed = qd['q'].astype(jnp.int32)
    block = qd['block']
    lo = (packed & 0xF) - 8
    hi = (packed >> 4) - 8
    q = jnp.concatenate([lo, hi], axis=0).astype(jnp.float32)
    scale = jnp.repeat(qd['scale'], block, axis=0)
    return (q * scale).astype(dtype)


def _int4_matmul_kernel(x_ref, w_ref, scale_ref, o_ref, *, block: int):
    """One (K/2, bn) packed strip: unpack nibbles into the two K half
    planes and accumulate per-K-block scaled dots.

    The stored nibbles are BIASED (q + 8 in 1..15); instead of
    subtracting 8 per element on the VPU (two extra passes over the
    whole weight strip), the dot runs on the biased values and the bias
    is removed algebraically: x @ (n - 8) = x @ n - 8 * sum(x)."""
    x = x_ref[:]                                   # (M, K) bf16
    packed = w_ref[:].astype(jnp.int32)            # (K/2, bn)
    khalf = packed.shape[0]
    k = 2 * khalf
    lo = (packed & 0xF).astype(jnp.bfloat16)           # rows 0..K/2 (+8)
    hi = (packed >> 4).astype(jnp.bfloat16)            # rows K/2..K (+8)
    nblk = k // block
    acc = jnp.zeros((x.shape[0], packed.shape[1]), jnp.float32)
    # per-K-block scaling: scale rows of each half plane by its block's
    # per-column scale, then one dot per block (unrolled, static trip).
    # A block straddling the half-plane boundary splits into two dots.
    for b_ in range(nblk):
        sc = scale_ref[b_]                          # (bn,)
        segs = []
        r0, r1 = b_ * block, (b_ + 1) * block
        if r0 < khalf:
            segs.append((r0, min(r1, khalf), lo, 0))
        if r1 > khalf:
            segs.append((max(r0, khalf), r1, hi, khalf))
        part = None
        for s0, s1, plane, off in segs:
            d = jax.lax.dot(x[:, s0:s1], plane[s0 - off:s1 - off],
                            preferred_element_type=jnp.float32)
            part = d if part is None else part + d
        xsum = jnp.sum(x[:, r0:r1].astype(jnp.float32), axis=1,
                       keepdims=True)               # (M, 1)
        acc = acc + (part - 8.0 * xsum) * sc[None, :]
    o_ref[:] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block', 'block_n',
                                             'interpret'))
def int4_matmul(x: jnp.ndarray, packed: jnp.ndarray, scale: jnp.ndarray,
                block: int = 128, block_n: int = 0,
                interpret: bool | None = None):
    """x (M, K) @ packed int4 (K/2, N) with (K/block, N) scales.

    ``block_n=0`` auto-sizes the N tile so the packed strip + its two
    bf16 half planes stay under the ~16 MB VMEM scoped limit."""
    if interpret is None:
        interpret = not _on_tpu()
    m, k2 = x.shape
    khalf, n = packed.shape
    if block_n == 0:
        block_n = 512 if 5 * khalf * 512 <= 12 * 1024 * 1024 else 256
    assert k2 == 2 * khalf
    nblk, n2 = scale.shape
    assert n2 == n and nblk * block == k2
    if interpret or k2 % block or n % 128:
        # XLA fallback (CPU tests / ragged shapes)
        w = dequantize_weight_int4(
            {'q': packed, 'scale': scale, 'block': block})
        return (x.astype(jnp.float32) @ w).astype(x.dtype)
    bm = 8 if m <= 8 else min(64, pl.cdiv(m, 8) * 8)
    m_pad = pl.cdiv(m, bm) * bm - m
    if m_pad:
        x = jnp.pad(x, ((0, m_pad), (0, 0)))
    bn = min(block_n, n)
    n_pad = pl.cdiv(n, bn) * bn - n
    w_p = jnp.pad(packed, ((0, 0), (0, n_pad))) if n_pad else packed
    s_p = jnp.pad(scale, ((0, 0), (0, n_pad))) if n_pad else scale

    # n-outer grid: the packed strip stays resident across the m sweep
    # (see quant.py int8_matmul) — one HBM pass over the weights per call
    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, block=block),
        grid=((n + n_pad) // bn, (m + m_pad) // bm),
        in_specs=[
            pl.BlockSpec((bm, k2), lambda j, i: (i, 0)),
            pl.BlockSpec((khalf, bn), lambda j, i: (0, j)),
            pl.BlockSpec((nblk, bn), lambda j, i: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda j, i: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m + m_pad, n + n_pad), x.dtype),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_p, s_p)
    return out[:m, :n]


# --------------------------------------------------------------- nf4

def nf4_quantize(w: jnp.ndarray, block: int = 64):
    """bitsandbytes-style NF4: flatten, blockwise absmax, nearest
    NF4-table code; two codes per byte (even index in low nibble).

    Returns {'codes': uint8 (numel/2,), 'absmax': f32 (numel/block,),
             'shape': original shape, 'block': block}.
    """
    shape = w.shape
    flat = w.astype(jnp.float32).reshape(-1)
    numel = flat.shape[0]
    assert numel % block == 0 and numel % 2 == 0
    blocks = flat.reshape(-1, block)
    absmax = jnp.max(jnp.abs(blocks), axis=1)
    normed = blocks / jnp.where(absmax > 0, absmax, 1.0)[:, None]
    table = jnp.asarray(NF4_TABLE)
    idx = jnp.argmin(
        jnp.abs(normed.reshape(-1)[:, None] - table[None, :]), axis=1)
    idx = idx.astype(jnp.uint8)
    lo, hi = idx[0::2], idx[1::2]
    codes = (hi | (lo << 4)).astype(jnp.uint8)   # bnb packs first elem high
    return {'codes': codes, 'absmax': absmax.astype(jnp.float32),
            'shape': shape, 'block': block}


def nf4_dequantize(qd: dict, dtype=jnp.float32):
    codes = qd['codes'].astype(jnp.int32)
    hi = (codes >> 4) & 0xF      # first element of each pair
    lo = codes & 0xF
    idx = jnp.stack([hi, lo], axis=1).reshape(-1)
    table = jnp.asarray(NF4_TABLE)
    vals = table[idx].reshape(-1, qd['block'])
    vals = vals * qd['absmax'][:, None]
    return vals.reshape(qd['shape']).astype(dtype)
