"""Decode-attention kernel vs its KV-stream roofline (round-4 re-measure).

The r3 rework vectorized the fused int8 decode-attention kernel over
heads; the last on-device number (5.2 ms per 32-layer step at B=8
S=1024 vs the 2.6 ms KV roofline) predates the final grids.  This probe
times, at exact serving shapes (B=8, H=32, S=1024, D=128, 32 layers):
    a) fused Pallas int8 decode attention (ops/decode_attention.py)
    b) the XLA dequant+einsum chain (_int8_cache_attention)
    c) paged kernel (ops/paged_attention.py), 8 pages/row
Roofline: the mandatory HBM stream is the int8 KV (2 x 33.5 MB/layer)
+ f32 scales (2 x 1.05 MB/layer) = 69.2 MB/layer -> 2.21 GB per step
/ 819 GB/s = 2.70 ms.

r4 MEASURED (v5e, L=8 scaled to 32): pallas fused 9.4 ms, xla chain
5.9 ms, paged fused 9.0 ms — in THIS isolated harness the XLA chain
wins.  But inside the real scanned 32-layer decode step the ranking
INVERTS: bench_decode_quant B=8 int4+kv8 runs 10.5 ms/step with the
Pallas kernel vs 16.7 ms with GROMA_DECODE_ATTN=xla (762 vs 480 tok/s
aggregate).  The isolated chain hands XLA a single fusion-friendly
dataflow (attention -> scale -> add, no rope/norm/MLP between layers);
with the full layer body around it, the chain's dequant+softmax
intermediates lose their fusion partners.  Microbenchmark rooflines
guide, full-step numbers decide: the kernel stays the default.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from groma_tpu.models.llama_quant import _int8_cache_attention  # noqa: E402
from groma_tpu.ops.decode_attention import int8_decode_attention  # noqa: E402
from groma_tpu.ops.paged_attention import (PAGE,  # noqa: E402
                                           paged_int8_decode_attention)
from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

B, NH, S, HD = 8, 32, 1024, 128
# per-layer cost is the quantity of interest; chaining L layers in one
# program amortizes dispatch.  L=32 (the full model) compiles >15 min
# over the tunnel, so default to 8 and report per-STEP numbers scaled
# to 32 layers (the kernel shapes are identical at every layer).
L = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SCALE = 32 / L
DISPATCH = 0.030


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, NH, 1, HD)), jnp.float32)

    # generate the multi-GB KV fixtures ON DEVICE (host->device upload
    # of 4 GB over the axon tunnel takes tens of minutes)
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
    bias = jnp.zeros((B, 1, 1, S), jnp.float32)

    kv_bytes = L * 2 * (B * NH * S * HD + 4 * B * NH * S) * SCALE
    roof = kv_bytes / 819e9
    print(f'# KV stream {kv_bytes / 1e9:.2f} GB (32-layer equiv, '
          f'measured at L={L}) -> roofline {roof * 1e3:.2f} ms/step',
          flush=True)

    # every KV buffer is a jit ARG (closed-over device arrays embed as
    # HLO constants and blow past the tunnel's compile-request limit)
    def alllayers(fn, q, k8_, ks_, v8_, vs_):
        out = q
        for i in range(L):
            out = out + fn(out * (1.0 / (1 + i)), k8_[i], ks_[i],
                           v8_[i], vs_[i], bias).astype(out.dtype) * 1e-6
        return jnp.sum(out)

    for name, fn in (('pallas fused', int8_decode_attention),
                     ('xla chain   ', _int8_cache_attention)):
        f = jax.jit(lambda q, a, b, c, d, _fn=fn:
                    alllayers(_fn, q, a, b, c, d))
        dt = (time_fn_ingraph(lambda q_, a, b, c, d: f(q_, a, b, c, d),
                              (q, k8, ks, v8, vs), iters=32)
              - DISPATCH / 32) * SCALE
        print(f'{name}: {dt * 1e3:7.2f} ms/32-layer step '
              f'({dt / roof:.2f}x roofline)', flush=True)

    # paged: same tokens in PAGE-sized pages (reshape the contiguous
    # buffers on device), 32-layer pools
    npages = S // PAGE
    pool = npages * B + 1
    table = jnp.asarray(
        (np.arange(B * npages).reshape(B, npages) + 1), jnp.int32)
    lengths = jnp.full((B,), S - PAGE // 2, jnp.int32)

    def to_pages(a):     # (B, NH, S, ...) -> (pool, NH, PAGE, ...)
        tail = a.shape[3:]
        pages = a.reshape(B, NH, npages, PAGE, *tail) \
            .transpose(0, 2, 1, 3, *range(4, 4 + len(tail))) \
            .reshape(B * npages, NH, PAGE, *tail)
        return jnp.concatenate([pages[:1] * 0, pages], axis=0)

    pageify = jax.jit(lambda a: jax.vmap(to_pages)(a))
    kp, vp, ksp, vsp = (pageify(k8), pageify(v8), pageify(ks),
                        pageify(vs))

    def paged_all(q, kp_, ksp_, vp_, vsp_):
        out = q
        for i in range(L):
            out = out + paged_int8_decode_attention(
                out * (1.0 / (1 + i)), kp_[i], ksp_[i], vp_[i], vsp_[i],
                table, lengths).astype(out.dtype) * 1e-6
        return jnp.sum(out)

    f = jax.jit(paged_all)
    dt = (time_fn_ingraph(lambda q_, a, b, c, d: f(q_, a, b, c, d),
                          (q, kp, ksp, vp, vsp), iters=32)
          - DISPATCH / 32) * SCALE
    print(f'paged fused : {dt * 1e3:7.2f} ms/32-layer step '
          f'({dt / roof:.2f}x roofline)', flush=True)


if __name__ == '__main__':
    main()
