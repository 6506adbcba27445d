"""On-device validation + timing of the all-layer decode megakernel.

Round-4 isolated the B=8 quantized decode gap to ~190 us of fixed cost
per pallas_call x 32 layers (exp_decode_attn_variants.py); the
megakernel (ops/decode_megakernel.py) runs the whole layer stack as one
call.  This experiment, on the real TPU:

1. validates one fused step against the per-layer quant_llama_forward
   decode branch at full 7B geometry (both paths run the same bf16
   int4-plane algebra on TPU, so agreement should be tight);
2. times a STEPS-long in-graph greedy decode scan through the
   megakernel vs the shipped per-layer path (B=8 int4 + int8 KV, the
   bench_decode_quant peak serving config; baseline 10.4-10.5 ms/step).

Usage: python benchmarks/exp_megakernel.py [validate|time|all]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import time, json
import numpy as np, jax, jax.numpy as jnp
from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama_quant import (make_quant_kv_cache,
                                          quant_llama_forward,
                                          quant_llama_decode_megakernel,
                                          quant_llama_logits)
from groma_tpu.ops import decode_megakernel as mk
from _fixtures import mk_llama_quant_params

cfg = LlamaConfig()
B, PRE, STEPS, MAXLEN = 8, 512, 128, 1024
V = cfg.vocab_size


def setup():
    qp = mk_llama_quant_params(cfg, bits=4)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, (B, PRE)),
                      jnp.int32)

    def prefill(qp, ids):
        cache = make_quant_kv_cache(cfg, B, MAXLEN)
        emb = qp['embed_tokens'][ids]
        pos = jnp.broadcast_to(jnp.arange(PRE)[None], (B, PRE))
        h, cache = quant_llama_forward(qp, cfg, emb,
                                       jnp.ones((B, PRE), bool), pos, cache)
        return quant_llama_logits(qp, h[:, -1:])[:, 0], cache

    t0 = time.time()
    logits, cache = jax.jit(prefill)(qp, ids)
    float(logits.sum())
    print(f'# prefill {time.time() - t0:.1f}s', file=sys.stderr)
    tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    return qp, cache, tok0


def validate(qp, cache, tok0):
    sp = jax.jit(mk.stack_decode_params)(qp)
    stacked = jax.jit(mk.stack_kv_cache)(cache)
    emb = qp['embed_tokens'][tok0]

    pos = jnp.full((B, 1), cache['index'], jnp.int32)
    want, c2 = jax.jit(lambda qp, emb, am, pos, c:
                       quant_llama_forward(qp, cfg, emb, am, pos, c))(
        qp, emb, jnp.ones((B, 1), bool), pos, cache)
    got, s2 = jax.jit(lambda qp, sp, emb, am, st:
                      quant_llama_decode_megakernel(qp, sp, cfg, emb,
                                                    am, st))(
        qp, sp, emb, jnp.ones((B, 1), bool), stacked)
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want, np.float32))
    scale = float(np.abs(np.asarray(want, np.float32)).max())
    dmax, dmean = float(d.max()), float(d.mean())
    ok = dmax < 0.05 * max(scale, 1.0)
    print('%s megakernel hidden: max|d|=%.4f mean=%.5f scale=%.2f'
          % ('PASS' if ok else 'FAIL', dmax, dmean, scale), flush=True)
    # freshly written cache column across all layers
    mism = 0
    for li in range(cfg.num_layers):
        dk = (np.asarray(s2['k'][li, :, :, PRE, :], np.int32)
              - np.asarray(c2['k'][li][:, :, PRE, :], np.int32))
        dv = (np.asarray(s2['v'][li, :, :, PRE, :], np.int32)
              - np.asarray(c2['v'][li][:, :, PRE, :], np.int32))
        mism = max(mism, int(np.abs(dk).max()), int(np.abs(dv).max()))
    print(f'{"PASS" if mism <= 1 else "FAIL"} megakernel cache write: '
          f'max int8 delta={mism}')
    return ok and mism <= 1


def time_path(qp, cache, tok0, fused):
    if fused:
        sp = jax.jit(mk.stack_decode_params)(qp)
        st = jax.jit(mk.stack_kv_cache)(cache)
    else:
        st = cache

    def decode_n(qp, sp, tok0, st, seed):
        def step(carry, i):
            tok, st = carry
            emb = qp['embed_tokens'][tok]
            if fused:
                h, st = quant_llama_decode_megakernel(
                    qp, sp, cfg, emb, jnp.ones((B, 1), bool), st)
            else:
                pos = jnp.full((B, 1), st['index'], jnp.int32) + seed * 0
                h, st = quant_llama_forward(
                    qp, cfg, emb, jnp.ones((B, 1), bool), pos, st)
            logits = quant_llama_logits(qp, h)[:, -1]
            nxt = jnp.argmax(logits, -1, keepdims=True).astype(jnp.int32)
            return (nxt, st), nxt[:, 0]
        (_, st), toks = jax.lax.scan(step, (tok0, st), jnp.arange(STEPS))
        return toks.sum() + seed

    dec = jax.jit(decode_n, static_argnames=())
    t0 = time.time()
    float(dec(qp, sp if fused else None, tok0, st, jnp.int32(0)))
    print(f'# compile+first {"fused" if fused else "per-layer"} '
          f'{time.time() - t0:.1f}s', file=sys.stderr)
    t0 = time.time()
    float(dec(qp, sp if fused else None, tok0, st, jnp.int32(1)))
    dt = time.time() - t0
    name = 'megakernel' if fused else 'per-layer'
    print(json.dumps({
        'metric': f'exp_decode_{name}_b8_int4kv8_ms_per_step',
        'value': round(dt / STEPS * 1000, 2), 'unit': 'ms'}), flush=True)
    print(f'# {name}: {dt / STEPS * 1000:.2f} ms/step '
          f'({B * STEPS / dt:.0f} tok/s aggregate)', file=sys.stderr)
    return dt / STEPS


def main(which='all'):
    assert jax.devices()[0].platform == 'tpu', 'on-device experiment'
    qp, cache, tok0 = setup()
    ok = True
    if which in ('validate', 'all'):
        ok = validate(qp, cache, tok0)
    if which in ('time', 'all'):
        time_path(qp, cache, tok0, fused=True)
        time_path(qp, cache, tok0, fused=False)
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else 'all'))
