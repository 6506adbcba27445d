"""Groma-7B decode throughput: tok/s/chip (BASELINE.md target row 3).

Vicuna-7B-shaped LLaMA, bf16 weights + KV cache; prefill 512 then a fully
in-graph lax.scan decode (cache donated/aliased).  AOT-compiled via
lower().compile() so the 13.5 GB parameter tree is only materialized after
compilation (a jit-at-call-time path would hold params + compile temps at
once).  Single-chip v5e decode is weight-streaming-bound: ~13.5 GB/step
=> roofline ~60 tok/s at 819 GB/s.

Measured (round 1): 41.5 tok/s (24.1 ms/tok), 69% of roofline.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()


def main(batch=1, prefill_len=512, decode_steps=32, max_len=1024):
    import jax
    import jax.numpy as jnp

    from groma_tpu.config import LlamaConfig
    from groma_tpu.models.llama import LlamaForCausalLM, make_kv_cache

    on_tpu = jax.devices()[0].platform == 'tpu'
    if on_tpu:
        cfg = LlamaConfig()                       # vicuna-7b shape, bf16
    else:
        cfg = LlamaConfig(vocab_size=256, hidden_size=128,
                          intermediate_size=256, num_layers=2, num_heads=4,
                          num_kv_heads=4, dtype='float32')
        prefill_len, decode_steps, max_len = 32, 8, 64

    model = LlamaForCausalLM(cfg)
    pdtype = jnp.dtype(cfg.dtype)
    shapes = jax.eval_shape(
        model.init, jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((batch, 8), jnp.int32))['params']
    p_sh = jax.tree_util.tree_map(
        lambda s: jax.ShapeDtypeStruct(s.shape, pdtype), shapes)

    def prefill(params, ids):
        cache = make_kv_cache(cfg, batch, max_len)
        logits, cache = model.apply(
            {'params': params}, ids, jnp.ones_like(ids, dtype=bool),
            jnp.broadcast_to(jnp.arange(prefill_len)[None],
                             (batch, prefill_len)), cache)
        return logits[:, -1], cache

    def decode_n(params, tok0, cache, pos0, seed):
        def step(carry, i):
            tok, cache = carry
            logits, cache = model.apply(
                {'params': params}, tok, jnp.ones_like(tok, dtype=bool),
                pos0 + i + seed * 0, cache)
            nxt = jnp.argmax(logits[:, -1], -1, keepdims=True)
            return (nxt.astype(jnp.int32), cache), nxt[:, 0]

        (_, cache), toks = jax.lax.scan(
            step, (tok0, cache), jnp.arange(decode_steps))
        return toks.sum() + seed

    ids_sh = jax.ShapeDtypeStruct((batch, prefill_len), jnp.int32)
    prefill_c = jax.jit(prefill).lower(p_sh, ids_sh).compile()
    cache_sh = jax.eval_shape(prefill, p_sh, ids_sh)[1]
    decode_c = jax.jit(decode_n, donate_argnums=(2,)).lower(
        p_sh, jax.ShapeDtypeStruct((batch, 1), jnp.int32), cache_sh,
        jax.ShapeDtypeStruct((batch, 1), jnp.int32),
        jax.ShapeDtypeStruct((), jnp.int32)).compile()

    params = jax.jit(lambda: jax.tree_util.tree_map(
        lambda s: jnp.full(s.shape, 0.01, pdtype), shapes))()
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, cfg.vocab_size, (batch, prefill_len)), jnp.int32)

    t0 = time.time()
    logits, cache = prefill_c(params, ids)
    float(logits.sum())
    print(f'# prefill({prefill_len}) {time.time() - t0:.2f}s',
          file=sys.stderr)

    tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    pos0 = jnp.full((batch, 1), prefill_len, jnp.int32)
    float(decode_c(params, tok0, cache, pos0, jnp.int32(0)))  # warmup
    logits, cache = prefill_c(params, ids)       # cache was donated
    t0 = time.time()
    float(decode_c(params, tok0, cache, pos0, jnp.int32(1)))
    dt = time.time() - t0
    print(json.dumps({
        'metric': 'llama7b_decode_tok_per_sec_per_chip',
        'value': round(batch * decode_steps / dt, 2),
        'unit': 'tok/s',
        'vs_baseline': round(batch * decode_steps / dt, 2),
    }))
    print(f'# {dt / decode_steps * 1000:.1f} ms/tok', file=sys.stderr)


if __name__ == '__main__':
    main()
