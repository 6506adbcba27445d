"""Groma-7B int8 weight-only decode benchmark.

Measured (round 1): 59.9 tok/s (16.7 ms/tok) vs 41.5 tok/s bf16 - 1.44x,
via the Pallas int8 dequant matmul (ops/quant.py).  Run with
PYTHONPATH including the repo root.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import time, json, sys
import numpy as np, jax, jax.numpy as jnp
from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import make_kv_cache
from groma_tpu.models.llama_quant import quant_llama_forward, quant_llama_logits

cfg = LlamaConfig()
B, PRE, STEPS, MAXLEN = 1, 512, 256, 1024  # 256 steps amortize the ~30 ms tunnel dispatch to <0.1%
H, I, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers

def mk_q(shape_kn):
    k, n = shape_kn
    return {'q': jnp.ones((k, n), jnp.int8), 'scale': jnp.full((n,), 1e-4, jnp.float32)}

def mk_layer():
    return {
      'input_layernorm': jnp.ones((H,), jnp.float32),
      'post_attention_layernorm': jnp.ones((H,), jnp.float32),
      'qkv_proj': mk_q((H, 3 * H)), 'o_proj': mk_q((H, H)),
      'gate_up_proj': mk_q((H, 2 * I)), 'down_proj': mk_q((I, H)),
    }
qp = {'layers': [mk_layer() for _ in range(L)], 'norm': jnp.ones((H,), jnp.float32),
      'embed_tokens': jnp.full((V, H), 0.01, jnp.bfloat16), 'lm_head': mk_q((H, V + (-V) % 512))}
qp = jax.jit(lambda t: t)(qp)

def prefill(qp, ids, kv8=False):
    if kv8:
        from groma_tpu.models.llama_quant import make_quant_kv_cache
        cache = make_quant_kv_cache(cfg, B, MAXLEN)
    else:
        cache = make_kv_cache(cfg, B, MAXLEN)
    emb = qp['embed_tokens'][ids]
    pos = jnp.broadcast_to(jnp.arange(PRE)[None], (B, PRE))
    h, cache = quant_llama_forward(qp, cfg, emb, jnp.ones((B,PRE),bool), pos, cache)
    return quant_llama_logits(qp, h[:, -1:])[:, 0], cache

def decode_n(qp, tok0, cache, pos0, seed):
    def step(carry, i):
        tok, cache = carry
        emb = qp['embed_tokens'][tok]
        h, cache = quant_llama_forward(qp, cfg, emb, jnp.ones((B,1),bool), pos0+i+seed*0, cache)
        logits = quant_llama_logits(qp, h)[:, -1]
        nxt = jnp.argmax(logits, -1, keepdims=True).astype(jnp.int32)
        return (nxt, cache), nxt[:,0]
    (_, cache), toks = jax.lax.scan(step, (tok0, cache), jnp.arange(STEPS))
    return toks.sum() + seed

ids = jnp.asarray(np.random.default_rng(0).integers(0, V, (B, PRE)), jnp.int32)
t0=time.time(); logits, cache = jax.jit(prefill)(qp, ids); float(logits.sum())
print(f'prefill {time.time()-t0:.1f}s', flush=True)
tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
pos0 = jnp.full((B,1), PRE, jnp.int32)
dec = jax.jit(decode_n, donate_argnums=(2,))
v = float(dec(qp, tok0, cache, pos0, jnp.int32(0)))
logits, cache = jax.jit(prefill)(qp, ids)
t0=time.time(); v = float(dec(qp, tok0, cache, pos0, jnp.int32(1))); dt=time.time()-t0
print(json.dumps({'metric':'llama7b_int8_decode_tok_per_sec','value':round(B*STEPS/dt,2),'unit':'tok/s'}), flush=True)
print(f'# {dt/STEPS*1000:.1f} ms/tok (bf16 was 24.1)', flush=True)

# int8 KV cache variant: int8 x int8 attention dots over quantized cache
prefill8 = jax.jit(lambda qp, ids: prefill(qp, ids, kv8=True))
logits, cache = prefill8(qp, ids); float(logits.sum())
dec8 = jax.jit(decode_n, donate_argnums=(2,))
v = float(dec8(qp, tok0, cache, pos0, jnp.int32(0)))
logits, cache = prefill8(qp, ids)
t0=time.time(); v = float(dec8(qp, tok0, cache, pos0, jnp.int32(1))); dt=time.time()-t0
print(json.dumps({'metric':'llama7b_int8_kv8_decode_tok_per_sec','value':round(B*STEPS/dt,2),'unit':'tok/s'}), flush=True)
print(f'# {dt/STEPS*1000:.1f} ms/tok with int8 KV cache', flush=True)
