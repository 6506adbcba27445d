"""Groma-7B decode throughput: tok/s/chip (BASELINE.md target row 3).

Vicuna-7B-shaped LLaMA, bf16, KV cache in bf16.  The decode loop runs
inside one jit via lax.scan (cache carried through the scan) so the
number is pure device time — the host never touches the loop.

Single-chip v5e decode is HBM-bandwidth-bound: ~13.5 GB of weights per
step => speed-of-light ~60 tok/s at 819 GB/s.  Report achieved tok/s and
the fraction of that roofline.
"""

import json
import sys
import time

import numpy as np


def main(prefill_len=512, decode_steps=32, batch=1, max_len=1024):
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
        prefill_len, decode_steps = 32, 8

    model = LlamaForCausalLM(cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, cfg.vocab_size,
                                   (batch, prefill_len)))

    t0 = time.time()
    params = jax.jit(model.init, static_argnums=())(
        jax.random.PRNGKey(0), ids[:, :8])['params']
    print(f'# init {time.time() - t0:.1f}s', file=sys.stderr)

    @jax.jit
    def prefill(params, ids):
        cache = make_kv_cache(cfg, batch, max_len)
        logits, cache = model.apply(
            {'params': params}, ids, jnp.ones_like(ids, dtype=bool),
            jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape),
            cache)
        return logits[:, -1], cache

    @jax.jit
    def decode_n(params, tok0, cache, pos0, seed):
        def step(carry, i):
            tok, cache = carry
            logits, cache = model.apply(
                {'params': params}, tok, jnp.ones_like(tok, dtype=bool),
                pos0 + i + seed * 0, cache)
            nxt = jnp.argmax(logits[:, -1], -1, keepdims=True)
            return (nxt, cache), nxt[:, 0]

        (_, cache), toks = jax.lax.scan(
            step, (tok0, cache), jnp.arange(decode_steps))
        return toks.sum() + seed

    t0 = time.time()
    logits, cache = prefill(params, ids)
    float(logits.sum())
    prefill_t = time.time() - t0
    print(f'# prefill({prefill_len}) compile+run {prefill_t:.1f}s',
          file=sys.stderr)

    tok0 = jnp.argmax(logits, -1)[:, None]
    pos0 = jnp.full((batch, 1), prefill_len, jnp.int32)
    float(decode_n(params, tok0, cache, pos0, jnp.int32(0)))  # compile
    t0 = time.time()
    float(decode_n(params, tok0, cache, pos0, jnp.int32(1)))
    dt = time.time() - t0
    toks = batch * decode_steps / dt
    print(json.dumps({
        'metric': 'llama7b_decode_tok_per_sec_per_chip',
        'value': round(toks, 2),
        'unit': 'tok/s',
        'vs_baseline': round(toks, 2),
    }))
    print(f'# {dt / decode_steps * 1000:.1f} ms/step; v5e HBM roofline '
          f'~60 tok/s at bs1', file=sys.stderr)


if __name__ == '__main__':
    main()
