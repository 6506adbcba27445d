"""Decode-shape matmul rate probe: is B=8 decode MXU-row-bound? (round 4)

Hypothesis from the component ledger: at M=8 the MXU runs at ~8/128 of
peak (weight tiles reload every 128 cycles but only 8 activation rows
stream through), so the four 7B layer matmuls cost ~8.4 ms/32-layer
step in bf16 — MORE than the int4 weight DMA (4.2 ms).  Existing
evidence: int4 B=1 decode measures 8.0 ms/step against a 4.2 ms DMA
floor, and int8 B=1 (10.2) sits right at max(DMA 8.2, MXU 8.6).

If true, int8 x int8 -> int32 dots (the MXU's double-rate integer path,
measured 234 TOPS at prefill) halve the matmul term and the "decode is
weight-streaming-bound, activation quant buys nothing" note in
llama_quant.py is wrong at B >= 8.

Variants (per-layer matmul set qkv/o/gate_up/down at M=8, summed and
scaled to a 32-layer step):

  bf16 dot          XLA, bf16 weights (the bits=16 tree's form)
  int8 kernel       ops/quant.int8_matmul (shipped decode path)
  w8a8 xla          per-row int8 act quant + XLA int8 dot
  w8a8 kernel       int8 act quant + int8 dot INSIDE the weight-
                    resident Pallas kernel (no bf16 dequant pass)
  int4 kernel       ops/quant4.int4_matmul (shipped, bf16-plane dot)
  int4-a8 kernel    prototype: biased-nibble int8 planes, int8 dot per
                    K block, bias folded via 8*sum(x8) — all integer

Run: python benchmarks/exp_decode_matmul_m8.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from groma_tpu.ops.quant import int8_matmul, quantize_weight  # noqa: E402
from groma_tpu.ops.quant4 import (INT4_BLOCK, int4_matmul,  # noqa: E402
                                  quantize_weight_int4)
from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

D, F, HD = 4096, 11008, 128
NQKV, NGU = 3 * D, 2 * F
SHAPES = [('qkv', D, NQKV), ('o', D, D), ('gu', D, NGU), ('down', F, D)]
M = 8
L = 32


# ------------------------------------------------------ w8a8 variants

def _act_q(x):
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def w8a8_xla(x, wq, sc):
    xq, xs = _act_q(x)
    acc = jax.lax.dot(xq, wq, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs[:, None] * sc[None, :]


def _w8a8_kernel(x_ref, w_ref, s_ref, o_ref):
    xq, xs = _act_q(x_ref[:])
    acc = jax.lax.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    o_ref[:] = acc.astype(jnp.float32) * xs[:, None] * s_ref[:]


def w8a8_pallas(x, wq, sc, bn=512):
    m, k = x.shape
    _, n = wq.shape
    return pl.pallas_call(
        _w8a8_kernel,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((m, k), lambda j: (0, 0)),
                  pl.BlockSpec((k, bn), lambda j: (0, j)),
                  pl.BlockSpec((1, bn), lambda j: (0, j))],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x.astype(jnp.float32), wq, sc[None, :])


# ------------------------------------------------- int4-a8 prototype

def _int4_a8_kernel(x_ref, w_ref, scale_ref, o_ref, *, block):
    xq, xs = _act_q(x_ref[:])                       # (M, K) int8, (M,)
    khalf = w_ref.shape[0]
    k = 2 * khalf
    nblk = k // block
    acc = jnp.zeros((xq.shape[0], w_ref.shape[1]), jnp.float32)
    for b_ in range(nblk):
        sc = scale_ref[b_]
        r0, r1 = b_ * block, (b_ + 1) * block
        segs = []
        if r0 < khalf:
            segs.append((r0, min(r1, khalf), 0))   # lo nibble plane
        if r1 > khalf:
            segs.append((max(r0, khalf), r1, khalf))  # hi plane
        part = None
        for s0, s1, off in segs:
            pk = w_ref[s0 - off:s1 - off, :].astype(jnp.int32)
            plane = ((pk & 0xF) if off == 0 else (pk >> 4)).astype(jnp.int8)
            d = jax.lax.dot(xq[:, s0:s1], plane,
                            preferred_element_type=jnp.int32)
            part = d if part is None else part + d
        xsum = jnp.sum(xq[:, r0:r1].astype(jnp.int32), axis=1,
                       keepdims=True)
        acc = acc + (part - 8 * xsum).astype(jnp.float32) * sc[None, :]
    o_ref[:] = acc * xs[:, None]


def int4_a8(x, packed, scale, block=INT4_BLOCK, bn=256):
    m, k = x.shape
    khalf, n = packed.shape
    nblk = scale.shape[0]
    return pl.pallas_call(
        functools.partial(_int4_a8_kernel, block=block),
        grid=(n // bn,),
        in_specs=[pl.BlockSpec((m, k), lambda j: (0, 0)),
                  pl.BlockSpec((khalf, bn), lambda j: (0, j)),
                  pl.BlockSpec((nblk, bn), lambda j: (0, j))],
        out_specs=pl.BlockSpec((m, bn), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x.astype(jnp.float32), packed, scale)


def main():
    rng = np.random.default_rng(0)
    xs = {k: jnp.asarray(rng.standard_normal((M, kdim)) * 0.1,
                         jnp.bfloat16)
          for k, kdim, _ in SHAPES}
    ws = {k: jnp.asarray(rng.standard_normal((kdim, n)) * 0.02,
                         jnp.float32)
          for k, kdim, n in SHAPES}
    w8 = {k: quantize_weight(w) for k, w in ws.items()}
    w4 = {k: quantize_weight_int4(w, block=INT4_BLOCK)
          for k, w in ws.items()}
    wbf = {k: w.astype(jnp.bfloat16) for k, w in ws.items()}

    gflop = 2 * M * sum(kd * n for _, kd, n in SHAPES) / 1e9
    bytes8 = sum(kd * n for _, kd, n in SHAPES)
    print(f'# per-layer matmul set: {gflop:.2f} GFLOP, int8 '
          f'{bytes8 / 1e6:.0f} MB; x32 layers', flush=True)

    # weights are passed as jit ARGS (closures embed them as constants
    # in the compile request -> tunnel HTTP 413)
    def layer_bf16(xs_, w):
        return [jax.lax.dot(xs_[k], w[k],
                            preferred_element_type=jnp.float32)
                for k, _, _ in SHAPES]

    def layer_int8(xs_, w):
        return [int8_matmul(xs_[k], *w[k]) for k, _, _ in SHAPES]

    def layer_w8a8_xla(xs_, w):
        return [w8a8_xla(xs_[k], *w[k]) for k, _, _ in SHAPES]

    def layer_w8a8_pl(xs_, w):
        return [w8a8_pallas(xs_[k], *w[k]) for k, _, _ in SHAPES]

    def layer_int4(xs_, w):
        return [int4_matmul(xs_[k], w[k]['q'], w[k]['scale'],
                            block=INT4_BLOCK) for k, _, _ in SHAPES]

    def layer_int4_a8(xs_, w):
        return [int4_a8(xs_[k], w[k]['q'], w[k]['scale'])
                for k, _, _ in SHAPES]

    variants = [('bf16 dot', layer_bf16, wbf),
                ('int8 kernel', layer_int8, w8),
                ('w8a8 xla', layer_w8a8_xla, w8),
                ('w8a8 kernel', layer_w8a8_pl, w8),
                ('int4 kernel', layer_int4, w4),
                ('int4-a8 kernel', layer_int4_a8, w4)]

    # numerics gate vs fp32 reference (loose: int8 act quant ~1% rel)
    reff = {k: np.asarray(xs[k].astype(jnp.float32) @ ws[k])
            for k, _, _ in SHAPES}
    for name, fn, w in variants:
        outs = jax.jit(fn)(xs, w)
        errs = []
        for (k, _, _), o in zip(SHAPES, outs):
            o = np.asarray(o, np.float32)
            r = reff[k]
            errs.append(np.abs(o - r).max()
                        / max(np.abs(r).max(), 1e-6))
        print(f'# relerr {name}: {max(errs):.4f}', flush=True)

    for name, fn, w in variants:
        def summed(xs_, w_, _fn=fn):
            return sum(jnp.sum(o) for o in _fn(xs_, w_))
        f = jax.jit(summed)
        # iters must be LARGE here: the x32-layer scaling multiplies any
        # amortized per-dispatch overhead by 32/iters (at iters=64 a
        # ~15 ms tunnel round-trip adds ~7 ms of phantom time to ms32)
        dt = time_fn_ingraph(f, (xs, w), iters=512)
        ms32 = dt * 1e3 * L
        tf = gflop / dt / 1e3
        print(f'{name:16s}: {ms32:7.2f} ms/32-layer step '
              f'({tf:6.1f} TF/s eff)', flush=True)


if __name__ == '__main__':
    main()
