"""Fused int8 decode attention: device parity + speed vs the XLA chain."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp
from groma_tpu.models.llama_quant import (_int8_cache_attention,
                                          _quantize_tokens)
from groma_tpu.ops.decode_attention import int8_decode_attention
from groma_tpu.utils.profiling import time_fn_ingraph

B, H, S, D, L = 8, 32, 1024, 128, 32
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B, H, 1, D)), jnp.float32)
k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
k8, ks = _quantize_tokens(k)
v8, vs = _quantize_tokens(v)
bias = np.zeros((B, 1, 1, S), np.float32)
bias[..., -200:] = -1e30
bias = jnp.asarray(bias)

# parity at full shape
want = np.asarray(jax.jit(_int8_cache_attention)(q, k8, ks, v8, vs, bias))
got = np.asarray(int8_decode_attention(q, k8, ks, v8, vs, bias))
err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
print(f'parity max-rel-err: {err:.4f}')
assert err < 3e-2, err

# speed: L layers back to back (shared k8 — DMA per call is what matters)
def loop_fused(q, k8, ks, v8, vs, bias):
    def body(c, _):
        o = int8_decode_attention(c.astype(jnp.float32), k8, ks, v8, vs,
                                  bias)
        return c + o.astype(c.dtype) * 1e-6, ()
    c, _ = jax.lax.scan(body, q, None, length=L)
    return c


def loop_xla(q, k8, ks, v8, vs, bias):
    def body(c, _):
        o = _int8_cache_attention(c, k8, ks, v8, vs, bias)
        return c + o.astype(c.dtype) * 1e-6, ()
    c, _ = jax.lax.scan(body, q, None, length=L)
    return c


dtf = time_fn_ingraph(loop_fused, (q, k8, ks, v8, vs, bias), iters=24)
print(f'fused : {dtf*1000:7.3f} ms per {L}-layer step')
dtx = time_fn_ingraph(loop_xla, (q, k8, ks, v8, vs, bias), iters=24)
print(f'xla   : {dtx*1000:7.3f} ms per {L}-layer step')
print(f'speedup: {dtx/dtf:.2f}x')

# block_h tuning sweep
for bh in (16, 32):
    def loop_bh(q, k8, ks, v8, vs, bias, _bh=bh):
        def body(c, _):
            o = int8_decode_attention(c.astype(jnp.float32), k8, ks, v8,
                                      vs, bias, block_h=_bh)
            return c + o.astype(c.dtype) * 1e-6, ()
        c, _ = jax.lax.scan(body, q, None, length=L)
        return c
    dt = time_fn_ingraph(loop_bh, (q, k8, ks, v8, vs, bias), iters=24)
    print(f'block_h={bh:2d}: {dt*1000:7.3f} ms per {L}-layer step')
