"""Decode-attention pipeline-structure probe (round 4).

ops/decode_attention.py measures 9.4 ms per 32-layer step at serving
shapes (B=8, H=32, S=1024, D=128) against a 2.7 ms KV-stream roofline.
First run of this probe falsified the compute-body hypothesis: a
DMA-FLOOR kernel (same grid/BlockSpecs, compute = one cheap touch of
k/v) already costs 8.55 ms = 3.16x roofline — the batched M=1 matvecs
add only ~0.9 ms.  The gap lives in the *pipeline structure*: how the
grid carves the KV stream into blocks and how many pallas_call
launches a 32-layer step pays, not in what the body computes.

So this probe sweeps structure, not arithmetic:

  floor/mxu hb8     the shipped grid ((B, H/8); 1 MB k + 1 MB v blocks)
  floor/mxu hb16/32 fewer grid steps, bigger DMAs (4/16 MB blocks)
  floor/mxu sb256   S-blocked grid (B, H/hb, S/sb): more, smaller
                    blocks -> deeper DMA overlap (flash-style 2-pass
                    softmax accumulation for mxu)
  floor/mxu Lstack  ONE pallas_call for all L layers (grid
                    (L, B, H/hb)): isolates per-call launch overhead
                    (independent per-layer outputs — real decode has a
                    layer dependency, so this is a bound, not a drop-in)
  xla chain         the llama_quant._int8_cache_attention XLA lowering

Run on a free chip (needs ~2.2 GB for L=8 KV fixtures):
    python benchmarks/exp_decode_attn_variants.py [L]
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

from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

B, NH, S, HD = 8, 32, 1024, 128
L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SCALE = 32 / L
DISPATCH = 0.030


def k_floor(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref):
    """Touch every input block once, minimal VPU work: the pipeline's
    memory floor for this grid/BlockSpec structure."""
    t = (jnp.sum(k_ref[0].astype(jnp.int32), axis=1)
         + jnp.sum(v_ref[0].astype(jnp.int32), axis=1))       # (hb, D)
    o_ref[0, :, 0] = (t.astype(jnp.float32)
                      + jnp.sum(ks_ref[0], axis=-1, keepdims=True)
                      + jnp.sum(vs_ref[0], axis=-1, keepdims=True)
                      + bias_ref[0, 0, 0, :1]
                      + q_ref[0, :, 0].astype(jnp.float32) * 0)


def k_mxu(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref,
          *, scale):
    """The shipped ops/decode_attention body (whole-S blocks)."""
    bias = bias_ref[0, 0, 0, :].astype(jnp.float32)
    q = q_ref[0, :, 0].astype(jnp.float32)                    # (hb, D)
    amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    qs = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.round(q / qs).astype(jnp.int8)
    s = jax.lax.dot_general(
        q8[:, None], k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]               # (hb, S)
    s = s.astype(jnp.float32) * (qs * scale) * ks_ref[0] + bias[None, :]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
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


def k_mxu_sblk(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref,
               m_ref, d_ref, *, scale, nsb):
    """S-blocked flash-style body: running max/denom in VMEM scratch,
    output rescaled across S blocks (exact, same algebra as flash)."""
    sb = pl.program_id(2)

    @pl.when(sb == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        d_ref[...] = jnp.zeros_like(d_ref)
        o_ref[...] = jnp.zeros_like(o_ref)

    bias = bias_ref[0, 0, 0, :].astype(jnp.float32)           # (sblk,)
    q = q_ref[0, :, 0].astype(jnp.float32)                    # (hb, D)
    amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    qs = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.round(q / qs).astype(jnp.int8)
    s = jax.lax.dot_general(
        q8[:, None], k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]               # (hb, sblk)
    s = s.astype(jnp.float32) * (qs * scale) * ks_ref[0] + bias[None, :]
    m_prev, d_prev = m_ref[...], d_ref[...]                   # (hb, 1)
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                                    # (hb, sblk)
    corr = jnp.exp(m_prev - m_new)
    d_new = d_prev * corr + jnp.sum(p, axis=-1, keepdims=True)
    ps = p * vs_ref[0]
    r = jnp.max(ps, axis=-1, keepdims=True)
    r = jnp.where(r > 0, r / 127.0, 1.0)
    p8 = jnp.round(ps / r).astype(jnp.int8)
    o = jax.lax.dot_general(
        p8[:, None], v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]               # (hb, D)
    o_ref[0, :, 0] = o_ref[0, :, 0] * corr + o.astype(jnp.float32) * r
    m_ref[...], d_ref[...] = m_new, d_new

    @pl.when(sb == nsb - 1)
    def _final():
        o_ref[0, :, 0] = o_ref[0, :, 0] / jnp.maximum(d_ref[...], 1e-30)


def call(kernel, q, k8, ks, v8, vs, bias, hb=8, sblk=None, **kw):
    b, h, _, d = q.shape
    s = k8.shape[2]
    if sblk is None:
        return pl.pallas_call(
            functools.partial(kernel, **kw),
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
        )(q.astype(jnp.float32), k8, ks, v8, vs, bias)
    nsb = s // sblk
    return pl.pallas_call(
        functools.partial(kernel, nsb=nsb, **kw),
        grid=(b, h // hb, nsb),
        in_specs=[
            pl.BlockSpec((1, hb, 1, d), lambda i, j, t: (i, j, 0, 0)),
            pl.BlockSpec((1, hb, sblk, d), lambda i, j, t: (i, j, t, 0)),
            pl.BlockSpec((1, hb, sblk), lambda i, j, t: (i, j, t)),
            pl.BlockSpec((1, hb, sblk, d), lambda i, j, t: (i, j, t, 0)),
            pl.BlockSpec((1, hb, sblk), lambda i, j, t: (i, j, t)),
            pl.BlockSpec((1, 1, 1, sblk), lambda i, j, t: (i, 0, 0, t)),
        ],
        out_specs=pl.BlockSpec((1, hb, 1, d), lambda i, j, t: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
        scratch_shapes=_scratch(hb),
    )(q.astype(jnp.float32), k8, ks, v8, vs, bias)


def _scratch(hb):
    from jax.experimental.pallas import tpu as pltpu
    return [pltpu.VMEM((hb, 1), jnp.float32),
            pltpu.VMEM((hb, 1), jnp.float32)]


def call_lstack(kernel, q, k8, ks, v8, vs, bias, hb=8, **kw):
    """One pallas_call for ALL L layers: grid (L, B, H/hb).  Per-layer
    outputs are independent (no cross-layer chain) — this bounds what
    eliminating 7 of 8 call launches is worth."""
    lyr, b, h, s, d = k8.shape
    qL = jnp.broadcast_to(q.astype(jnp.float32)[None],
                          (lyr,) + q.shape)
    return pl.pallas_call(
        functools.partial(kernel, **kw),
        grid=(lyr, b, h // hb),
        in_specs=[
            pl.BlockSpec((1, 1, hb, 1, d), lambda l, i, j: (l, i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s, d), lambda l, i, j: (l, i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s), lambda l, i, j: (l, i, j, 0)),
            pl.BlockSpec((1, 1, hb, s, d), lambda l, i, j: (l, i, j, 0, 0)),
            pl.BlockSpec((1, 1, hb, s), lambda l, i, j: (l, i, j, 0)),
            pl.BlockSpec((1, 1, 1, s), lambda l, i, j: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, hb, 1, d),
                               lambda l, i, j: (l, i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((lyr, b, h, 1, d), jnp.float32),
    )(qL, k8, ks, v8, vs, bias)


def _lstack_body(kernel, **kw):
    """Adapt a (1, hb, ...)-block kernel to (1, 1, hb, ...) blocks by
    peeling the layer dim off every ref with a sub-ref view."""
    def body(q_ref, k_ref, ks_ref, v_ref, vs_ref, bias_ref, o_ref):
        kernel(q_ref.at[0], k_ref.at[0], ks_ref.at[0], v_ref.at[0],
               vs_ref.at[0], bias_ref, o_ref.at[0], **kw)
    return body


def xla_chain(q, k8, ks, v8, vs, bias):
    from groma_tpu.models.llama_quant import _int8_cache_attention
    return _int8_cache_attention(q, k8, ks, v8, vs, bias)


def main():
    @jax.jit
    def mk_kv(key):
        ks_ = jax.random.split(key, 4)
        k8_ = jax.random.randint(ks_[0], (L, B, NH, S, HD), -127, 127,
                                 jnp.int8)
        v8_ = jax.random.randint(ks_[1], (L, B, NH, S, HD), -127, 127,
                                 jnp.int8)
        kss = jax.random.uniform(ks_[2], (L, B, NH, S), jnp.float32,
                                 1e-3, 1.1e-2)
        vss = jax.random.uniform(ks_[3], (L, B, NH, S), jnp.float32,
                                 1e-3, 1.1e-2)
        return k8_, v8_, kss, vss

    k8, v8, ks, vs = mk_kv(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, NH, 1, HD)), jnp.float32)
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)

    kv_bytes = L * 2 * (B * NH * S * HD + 4 * B * NH * S) * SCALE
    roof = kv_bytes / 819e9
    print(f'# roofline {roof * 1e3:.2f} ms/32-layer step (measured at '
          f'L={L})', flush=True)

    scale = HD ** -0.5
    variants = [
        ('floor hb8', lambda *a: call(k_floor, *a, hb=8)),
        ('floor hb16', lambda *a: call(k_floor, *a, hb=16)),
        ('floor hb32', lambda *a: call(k_floor, *a, hb=32)),
        ('mxu hb8 (shipped)', lambda *a: call(k_mxu, *a, hb=8,
                                              scale=scale)),
        ('mxu hb16', lambda *a: call(k_mxu, *a, hb=16, scale=scale)),
        ('mxu hb32', lambda *a: call(k_mxu, *a, hb=32, scale=scale)),
        ('mxu hb8 sb256', lambda *a: call(k_mxu_sblk, *a, hb=8,
                                          sblk=256, scale=scale)),
        ('mxu hb32 sb256', lambda *a: call(k_mxu_sblk, *a, hb=32,
                                           sblk=256, scale=scale)),
        ('mxu hb32 sb512', lambda *a: call(k_mxu_sblk, *a, hb=32,
                                           sblk=512, scale=scale)),
        ('xla chain', xla_chain),
    ]
    # correctness gate: every mxu variant must match the shipped body
    ref = jax.jit(lambda *a: call(k_mxu, *a, hb=8, scale=scale))(
        q, k8[0], ks[0], v8[0], vs[0], bias)
    bad = set()
    for name, fn in variants:
        if name.startswith('floor') or name == 'mxu hb8 (shipped)':
            continue
        try:
            got = jax.jit(fn)(q, k8[0], ks[0], v8[0], vs[0], bias)
            got = got.reshape(ref.shape)
            ok = bool(jnp.allclose(got, ref, atol=2e-2, rtol=2e-2))
        except Exception as e:  # noqa: BLE001 — lowering varies
            print(f'# parity {name}: FAILED {type(e).__name__}: '
                  f'{str(e)[:140]}', flush=True)
            bad.add(name)
            continue
        print(f'# parity {name}: {"OK" if ok else "MISMATCH"}', flush=True)
        if not ok:
            bad.add(name)

    for name, fn in variants:
        if name in bad:
            continue

        def alllayers(q_, k8_, ks_, v8_, vs_, _fn=fn):
            out = q_
            for i in range(L):
                r = _fn(out * (1.0 / (1 + i)), k8_[i], ks_[i], v8_[i],
                        vs_[i], bias)
                out = out + r.astype(out.dtype) * 1e-6
            return jnp.sum(out)

        try:
            f = jax.jit(alllayers)
            dt = (time_fn_ingraph(f, (q, k8, ks, v8, vs), iters=32)
                  - DISPATCH / 32) * SCALE
            print(f'{name:18s}: {dt * 1e3:7.2f} ms/32-layer step '
                  f'({dt / roof:.2f}x roofline)', flush=True)
        except Exception as e:  # noqa: BLE001 — Mosaic lowering varies
            print(f'{name:18s}: FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}', flush=True)

    # L-stacked single call (floor + mxu): bounds per-call overhead
    for name, kern, kw in [('floor Lstack hb8', k_floor, {}),
                           ('mxu Lstack hb8', k_mxu, dict(scale=scale)),
                           ('mxu Lstack hb16', k_mxu, dict(scale=scale))]:
        hb = 16 if name.endswith('hb16') else 8
        body = _lstack_body(kern, **kw)

        def one(q_, k8_, ks_, v8_, vs_, _b=body, _hb=hb):
            return jnp.sum(call_lstack(_b, q_, k8_, ks_, v8_, vs_,
                                       bias, hb=_hb))

        try:
            f = jax.jit(one)
            dt = (time_fn_ingraph(f, (q, k8, ks, v8, vs), iters=32)
                  - DISPATCH / 32) * SCALE
            print(f'{name:18s}: {dt * 1e3:7.2f} ms/32-layer step '
                  f'({dt / roof:.2f}x roofline)', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name:18s}: FAILED {type(e).__name__}: '
                  f'{str(e)[:160]}', flush=True)


if __name__ == '__main__':
    main()
