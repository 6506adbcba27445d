"""Reproduce + lift the B=32 decode compile ceiling.

Round 5 recorded: B=32 int4+kv8 decode fails to compile
(decode-attention kernel VMEM); B=24 is the shipped batch ceiling
(1,315 tok/s).  This probe isolates which piece actually fails at
B=32 — the attention kernel alone, or the full scanned step — and
measures candidate fixes (smaller block_h, S-blocked kernel).

MEASURED (v5e, 2026-08-20): the attention kernel ALONE compiles and
runs fine at B=32 with the default block_h=8 (grid (32, 4), same
per-step VMEM as B=24); block_h=32 fails (hb=32 blocks: 2 x 32 x 1024
x 128 int8 = 8 MB + double-buffering exceeds VMEM).  The B=32 ceiling
is NOT this kernel: the full scanned decode step fails in the AOT
compile helper (subprocess exit 1 on a 148 KB MLIR payload), and the
B=32 PREFILL alone takes 327 s to compile — at 8.6 GB of int8 KV next
to 3.5 GB int4 weights the step sits against the 16 GB HBM wall, so
compiler failure is plausibly allocation-related.  B=24 stays the
shipped batch ceiling; this probe documents the precise boundary.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import time
import numpy as np, jax, jax.numpy as jnp

from groma_tpu.ops import decode_attention as da

B, H, S, D = 32, 32, 1024, 128
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, H, 1, D)), jnp.bfloat16)
k8 = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)), jnp.int8)
v8 = jnp.asarray(rng.integers(-127, 128, (B, H, S, D)), jnp.int8)
ks = jnp.asarray(rng.uniform(0.01, 0.02, (B, H, S)), jnp.float32)
vs = jnp.asarray(rng.uniform(0.01, 0.02, (B, H, S)), jnp.float32)
bias = jnp.zeros((B, 1, 1, S), jnp.float32)

for bh in (8, 32):
    try:
        t0 = time.time()
        out = da.int8_decode_attention(q, k8, ks, v8, vs, bias, block_h=bh)
        out.block_until_ready()
        tc = time.time() - t0
        # timed loop
        n = 64
        f = jax.jit(lambda *a: sum(
            da.int8_decode_attention(*a, block_h=bh).sum() for _ in range(1)))
        t0 = time.time()
        for _ in range(n):
            out = da.int8_decode_attention(q, k8, ks, v8, vs, bias, block_h=bh)
        out.block_until_ready()
        dt = (time.time() - t0) / n * 1e3
        print(f'block_h={bh}: OK compile {tc:.1f}s, {dt:.3f} ms/call (B=32)')
    except Exception as e:
        print(f'block_h={bh}: FAIL {type(e).__name__}: {str(e)[:300]}')
