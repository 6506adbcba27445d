"""Groma-7B packed-int4 weight-only decode benchmark.

The fast path behind the reference's bitsandbytes 4-bit switch
(reference: groma/eval/run_groma.py:43-61): ~3.4 GB of weight streaming
per step vs 6.7 GB int8 / 13.5 GB bf16.  Also measures the peak serving
config — int4 weights + int8 KV cache at B=8 (the continuous-batching
aggregate behind serve/engine.py).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import time, json
import numpy as np, jax, jax.numpy as jnp
from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import make_kv_cache
from groma_tpu.models.llama_quant import (make_quant_kv_cache,
                                          quant_llama_forward,
                                          quant_llama_logits)
from groma_tpu.ops.quant4 import INT4_BLOCK

cfg = LlamaConfig()
PRE, STEPS, MAXLEN = 512, 256, 1024  # 256 steps amortize the ~30 ms tunnel dispatch
H, I, V, L = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size, cfg.num_layers
rng = np.random.default_rng(0)

def mk_q4(k, n):
    return {'q': jnp.asarray(rng.integers(0, 255, (k // 2, n)), jnp.uint8),
            'scale': jnp.full((k // INT4_BLOCK, n), 1e-4, jnp.float32)}

def mk_layer():
    return {
      'input_layernorm': jnp.ones((H,), jnp.float32),
      'post_attention_layernorm': jnp.ones((H,), jnp.float32),
      'qkv_proj': mk_q4(H, 3 * H), 'o_proj': mk_q4(H, H),
      'gate_up_proj': mk_q4(H, 2 * I), 'down_proj': mk_q4(I, H),
    }
VP = V + (-V) % 512
qp = {'layers': [mk_layer() for _ in range(L)], 'norm': jnp.ones((H,), jnp.float32),
      'embed_tokens': jnp.full((V, H), 0.01, jnp.bfloat16), 'lm_head': mk_q4(H, VP)}
qp = jax.jit(lambda t: t)(qp)


def measure(B, kv8, metric, note=''):
    def prefill(qp, ids):
        cache = make_quant_kv_cache(cfg, B, MAXLEN) if kv8 \
            else make_kv_cache(cfg, B, MAXLEN)
        emb = qp['embed_tokens'][ids]
        pos = jnp.broadcast_to(jnp.arange(PRE)[None], (B, PRE))
        h, cache = quant_llama_forward(qp, cfg, emb,
                                       jnp.ones((B, PRE), bool), pos, cache)
        return quant_llama_logits(qp, h[:, -1:])[:, 0], cache

    def decode_n(qp, tok0, cache, pos0, seed):
        def step(carry, i):
            tok, cache = carry
            emb = qp['embed_tokens'][tok]
            h, cache = quant_llama_forward(
                qp, cfg, emb, jnp.ones((B, 1), bool),
                pos0 + i + seed * 0, cache)
            logits = quant_llama_logits(qp, h)[:, -1]
            nxt = jnp.argmax(logits, -1, keepdims=True).astype(jnp.int32)
            return (nxt, cache), nxt[:, 0]
        (_, cache), toks = jax.lax.scan(step, (tok0, cache),
                                        jnp.arange(STEPS))
        return toks.sum() + seed

    ids = jnp.asarray(rng.integers(0, V, (B, PRE)), jnp.int32)
    pf = jax.jit(prefill)
    t0 = time.time()
    logits, cache = pf(qp, ids)
    float(logits.sum())
    print(f'# prefill B={B} {time.time() - t0:.1f}s', file=sys.stderr)
    tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    pos0 = jnp.full((B, 1), PRE, jnp.int32)
    dec = jax.jit(decode_n, donate_argnums=(2,))
    float(dec(qp, tok0, cache, pos0, jnp.int32(0)))
    logits, cache = pf(qp, ids)
    t0 = time.time()
    float(dec(qp, tok0, cache, pos0, jnp.int32(1)))
    dt = time.time() - t0
    print(json.dumps({'metric': metric,
                      'value': round(B * STEPS / dt, 2),
                      'unit': 'tok/s'}), flush=True)
    print(f'# B={B} kv8={kv8} {dt / STEPS * 1000:.1f} ms/step {note}',
          file=sys.stderr)


measure(1, False, 'llama7b_int4_decode_tok_per_sec')
measure(8, True, 'llama7b_int4_kv8_batch8_decode_tok_per_sec',
        '(peak serving config: int4 weights + int8 KV, '
        'continuous-batching aggregate)')
