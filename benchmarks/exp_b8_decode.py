"""Isolate the B=8 int8-KV decode anomaly (54.6 tok/s aggregate vs ~170
expected from the weight+KV HBM streams).

Pieces at exact decode shapes, all timed via time_fn_ingraph (per-iter
input perturbation defeats the tunnel's result caching):
  a) 32-layer int8-KV attention only (_int8_cache_attention)
  b) 32-layer bf16-KV attention only (einsum path)
  c) full decode step with int8 KV at B=8 / B=1
  d) full decode step with bf16 KV at B=8
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp
from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import make_kv_cache
from groma_tpu.models.llama_quant import (_int8_cache_attention,
                                          make_quant_kv_cache,
                                          quant_llama_forward)
from groma_tpu.utils.profiling import time_fn_ingraph

cfg = LlamaConfig()
B, S, L = 8, 1024, 32
H = cfg.hidden_size
NH = cfg.num_heads
HD = H // NH
rng = np.random.default_rng(0)

q = jnp.asarray(rng.standard_normal((B, NH, 1, HD)), jnp.bfloat16)
k8 = jnp.asarray(rng.integers(-127, 127, (L, B, NH, S, HD)), jnp.int8)
v8 = jnp.asarray(rng.integers(-127, 127, (L, B, NH, S, HD)), jnp.int8)
ks = jnp.asarray(rng.random((L, B, NH, S)) + 0.5, jnp.float32) * 1e-2
vs = jnp.asarray(rng.random((L, B, NH, S)) + 0.5, jnp.float32) * 1e-2
bias = jnp.zeros((B, 1, 1, S), jnp.float32)


def attn_i8_alllayers(q, k8, ks, v8, vs, bias):
    def body(c, i):
        o = _int8_cache_attention(
            c, jax.lax.dynamic_index_in_dim(k8, i, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(ks, i, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(v8, i, 0, keepdims=False),
            jax.lax.dynamic_index_in_dim(vs, i, 0, keepdims=False),
            bias)
        return c + o.astype(c.dtype) * 1e-6, ()
    c, _ = jax.lax.scan(body, q, jnp.arange(L))
    return c


dt = time_fn_ingraph(attn_i8_alllayers, (q, k8, ks, v8, vs, bias), iters=64)
print(f'int8-KV attention, 32 layers: {dt*1000:8.3f} ms/step', flush=True)

kbf = jnp.asarray(rng.standard_normal((L, B, NH, S, HD)), jnp.bfloat16)
vbf = jnp.asarray(rng.standard_normal((L, B, NH, S, HD)), jnp.bfloat16)


def attn_bf16_alllayers(q, kbf, vbf, bias):
    def body(c, i):
        k = jax.lax.dynamic_index_in_dim(kbf, i, 0, keepdims=False)
        v = jax.lax.dynamic_index_in_dim(vbf, i, 0, keepdims=False)
        sc = jnp.einsum('bhqd,bhkd->bhqk', c, k,
                        preferred_element_type=jnp.float32) * HD ** -0.5
        p = jax.nn.softmax(sc + bias, axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        return c + o.astype(c.dtype) * 1e-6, ()
    c, _ = jax.lax.scan(body, q, jnp.arange(L))
    return c


dt = time_fn_ingraph(attn_bf16_alllayers, (q, kbf, vbf, bias), iters=64)
print(f'bf16-KV attention, 32 layers: {dt*1000:8.3f} ms/step', flush=True)


from _fixtures import mk_layer as _mk_layer


def mk_layer():
    return _mk_layer(cfg, bits=8)


qp = {'layers': [mk_layer() for _ in range(L)],
      'norm': jnp.ones((H,), jnp.float32)}
qp = jax.jit(lambda t: t)(qp)


def full_step(emb, qp, cache):
    h, _ = quant_llama_forward(qp, cfg, emb,
                               jnp.ones((emb.shape[0], 1), bool),
                               jnp.full((emb.shape[0], 1), 600, jnp.int32),
                               cache)
    return h


for name, b, cache in [
        ('full fwd B=8 int8-KV', 8, make_quant_kv_cache(cfg, 8, S)),
        ('full fwd B=8 bf16-KV', 8, make_kv_cache(cfg, 8, S)),
        ('full fwd B=1 int8-KV', 1, make_quant_kv_cache(cfg, 1, S))]:
    cache['index'] = 600
    emb = jnp.asarray(rng.standard_normal((b, 1, H)), jnp.bfloat16)
    dt = time_fn_ingraph(full_step, (emb, qp, cache), iters=64)
    print(f'{name}: {dt*1000:8.3f} ms/step '
          f'({b / dt:.0f} tok/s aggregate)', flush=True)
