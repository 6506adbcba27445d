"""Fused single-token decode attention over an int8 KV cache (Pallas).

One kernel per layer replaces the XLA chain in
``models/llama_quant._int8_cache_attention`` (int8 q.k dot -> scale ->
softmax -> fold v-scale -> requantize p -> int8 p.v dot).  The XLA
lowering of that chain runs ~2.5x over the KV-stream roofline at 7B
decode shapes (6.5 ms vs 2.6 ms per 32-layer step at B=8, S=1024);
here every big tensor (k8, v8) is touched exactly once as int8 — the
only fp arithmetic is on (S,) score vectors and (D,) outputs.

Numerics mirror the XLA path: q quantized per (b, h) row, scores scaled
by qs * ks[pos] * D^-0.5, softmax in f32, v-scale folded into p before
its requantization (exact for the p.v dot because vs indexes the
contraction dim).

Reference semantics being accelerated: the bitsandbytes-style quantized
decode of run_groma (reference: groma/eval/run_groma.py:43-61); the int8
KV cache itself is this framework's extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from groma_tpu.ops.quant import _on_tpu


def _kernel(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref,
            *, heads: int, scale: float):
    """All hb heads processed as one (hb, .) batch: a python loop over
    heads issued per-head (1, S) VPU rows (1 of 8 sublanes live) and
    serial per-head matvecs; batching fills the sublanes and lets the
    softmax/requantize VPU work of all heads pipeline against the k/v
    DMA streams."""
    bias = bias_ref[0, 0, 0, :].astype(jnp.float32)          # (S,)
    q = q_ref[0, :, 0].astype(jnp.float32)                    # (hb, D)
    amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)        # (hb, 1)
    qs = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.round(q / qs).astype(jnp.int8)
    # orientation note (r4 measured, B=8 H=32 S=1024 D=128): this
    # q-as-LHS matvec form runs the 32-layer step at 9.4 ms; flipping to
    # k-as-LHS ([S, D] x [D, 1]) to avoid a hypothesized k transpose
    # measured 26 ms — the M=S, N=1 form wastes the whole MXU column
    # dimension.  Keep q-as-LHS.
    s = jax.lax.dot_general(
        q8[:, None], k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]               # (hb, S)
    s = s.astype(jnp.float32) * (qs * scale) \
        * ks_ref[0] + bias[None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)                                        # (hb, S)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    ps = p * vs_ref[0]
    r = jnp.max(ps, axis=-1, keepdims=True)
    r = jnp.where(r > 0, r / 127.0, 1.0)
    p8 = jnp.round(ps / r).astype(jnp.int8)
    o = jax.lax.dot_general(
        p8[:, None], v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]               # (hb, D)
    o_ref[0, :, 0] = (o.astype(jnp.float32)
                      * (r / jnp.maximum(denom, 1e-30)))


@functools.partial(jax.jit, static_argnames=('block_h', 'interpret'))
def int8_decode_attention(q: jnp.ndarray, k8: jnp.ndarray, ks: jnp.ndarray,
                          v8: jnp.ndarray, vs: jnp.ndarray,
                          mask_bias: jnp.ndarray, block_h: int = 8,
                          interpret: bool | None = None) -> jnp.ndarray:
    """q (B, H, 1, D) bf16/f32; k8/v8 (B, H, S, D) int8; ks/vs (B, H, S)
    f32; mask_bias (B, 1, 1, S) f32 (0 or -1e30).  Returns (B, H, 1, D)
    f32 attention output.  S and D must be lane-aligned (128 | S, D)."""
    b, h, one, d = q.shape
    assert one == 1
    s = k8.shape[2]
    if interpret is None:
        interpret = not _on_tpu()
    if interpret or d % 128 or s % 128:
        # reference path (CPU tests / ragged shapes)
        from groma_tpu.models.llama_quant import _int8_cache_attention
        return _int8_cache_attention(q, k8, ks, v8, vs, mask_bias)
    return _call_kernel(q, k8, ks, v8, vs, mask_bias, block_h=block_h,
                        interpret=False)


def _call_kernel(q, k8, ks, v8, vs, mask_bias, block_h: int = 8,
                 interpret: bool = False):
    """The pallas_call itself; ``interpret=True`` runs the kernel body
    through the Pallas interpreter (CPU kernel-logic tests)."""
    b, h, one, d = q.shape
    s = k8.shape[2]
    # the (1, hb, S) scale blocks need their second-to-last dim to be a
    # multiple of 8 (TPU sublane granularity) unless hb == h
    hb = min(block_h, h)
    while h % hb or (hb % 8 and hb != h):
        hb -= 1
    if hb < 1:
        hb = h
    out = pl.pallas_call(
        functools.partial(_kernel, heads=hb, scale=d ** -0.5),
        grid=(b, h // hb),
        in_specs=[
            pl.BlockSpec((1, hb, 1, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, hb, s, d), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, s), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, 1, s), lambda i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, 1, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
        interpret=interpret,
    )(q.astype(jnp.float32), k8, ks, v8, vs, mask_bias)
    return out
