"""Groma-7B quantized decode benchmark (int8 / packed-int4 weights,
bf16 or int8 KV cache, single-stream and batched serving shapes).

The TPU fast path behind the reference's bitsandbytes 4/8-bit switch
(reference: groma/eval/run_groma.py:43-61).  B=1 is interactive decode;
B=8 with int8 KV is the continuous-batching aggregate behind
serve/engine.py (weights amortized across slots).

Variants are argv-selectable so the driver path can run a tight subset
(BENCH_r03 lost the whole family to a 420 s timeout with four variants;
the r4 driver set is the two ends of the quant spectrum only):
    python bench_decode_quant.py            # driver set (2 variants)
    python bench_decode_quant.py all        # 6 variants, STEPS=256
Decode loops run as one in-graph scan (STEPS=128 amortizes the ~30 ms
tunnel dispatch to <0.2%).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import time, json
import numpy as np, jax, jax.numpy as jnp

# orchestrator-exported hard budget (see bench.py / bench_train.py)
T0 = time.time()
BUDGET = float(os.environ.get('GROMA_SUB_BUDGET', 1e9))


def _left():
    return BUDGET - (time.time() - T0)
from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import make_kv_cache
from groma_tpu.models.llama_quant import (make_quant_kv_cache,
                                          quant_llama_forward,
                                          quant_llama_logits)
from _fixtures import mk_llama_quant_params

cfg = LlamaConfig()
PRE, STEPS, MAXLEN = 512, 128, 1024
V = cfg.vocab_size


def measure(qp, B, kv8, metric, note=''):
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

    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, (B, PRE)),
                      jnp.int32)
    pf = jax.jit(prefill)
    t0 = time.time()
    logits, cache = pf(qp, ids)
    float(logits.sum())
    print(f'# prefill B={B} {time.time() - t0:.1f}s', file=sys.stderr)
    tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    pos0 = jnp.full((B, 1), PRE, jnp.int32)
    dec = jax.jit(decode_n)
    float(dec(qp, tok0, cache, pos0, jnp.int32(0)))
    t0 = time.time()
    float(dec(qp, tok0, cache, pos0, jnp.int32(1)))
    dt = time.time() - t0
    print(json.dumps({'metric': metric,
                      'value': round(B * STEPS / dt, 2),
                      'unit': 'tok/s',
                      'vs_baseline': round(B * STEPS / dt, 2)}), flush=True)
    print(f'# B={B} kv8={kv8} {dt / STEPS * 1000:.1f} ms/step '
          f'({B * STEPS / dt:.0f} tok/s aggregate) {note}',
          file=sys.stderr, flush=True)


def measure_megakernel(qp4, metric, B=8):
    """B=8 int4+kv8 decode through the all-layer Pallas megakernel
    (ops/decode_megakernel.py): one pallas_call per step instead of
    32 x ~5 — the r4-measured ~190 us/pallas_call overhead exploit."""
    from groma_tpu.models.llama_quant import quant_llama_decode_megakernel
    from groma_tpu.ops import decode_megakernel as mk
    if not mk.supported(cfg, B, qp4):
        print('# megakernel unsupported here (TPU + MHA + int4 only)',
              file=sys.stderr, flush=True)
        return

    def prefill(qp, ids):
        cache = make_quant_kv_cache(cfg, B, MAXLEN)
        emb = qp['embed_tokens'][ids]
        pos = jnp.broadcast_to(jnp.arange(PRE)[None], (B, PRE))
        h, cache = quant_llama_forward(qp, cfg, emb,
                                       jnp.ones((B, PRE), bool), pos, cache)
        return quant_llama_logits(qp, h[:, -1:])[:, 0], cache

    def decode_n(qp, sp, tok0, st, seed):
        def step(carry, i):
            tok, st = carry
            emb = qp['embed_tokens'][tok]
            h, st = quant_llama_decode_megakernel(
                qp, sp, cfg, emb, jnp.ones((B, 1), bool), st)
            logits = quant_llama_logits(qp, h)[:, -1]
            nxt = jnp.argmax(logits, -1, keepdims=True).astype(jnp.int32)
            return (nxt, st), nxt[:, 0]
        (_, st), toks = jax.lax.scan(step, (tok0, st), jnp.arange(STEPS))
        return toks.sum() + seed

    ids = jnp.asarray(np.random.default_rng(0).integers(0, V, (B, PRE)),
                      jnp.int32)
    t0 = time.time()
    logits, cache = jax.jit(prefill)(qp4, ids)
    float(logits.sum())
    print(f'# prefill B={B} {time.time() - t0:.1f}s', file=sys.stderr)
    sp = jax.jit(mk.stack_decode_params)(qp4)
    st = jax.jit(mk.stack_kv_cache)(cache)
    del cache
    tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    dec = jax.jit(decode_n)
    t0 = time.time()
    float(dec(qp4, sp, tok0, st, jnp.int32(0)))
    print(f'# megakernel compile+first {time.time() - t0:.0f}s',
          file=sys.stderr)
    t0 = time.time()
    float(dec(qp4, sp, tok0, st, jnp.int32(1)))
    dt = time.time() - t0
    print(json.dumps({'metric': metric,
                      'value': round(B * STEPS / dt, 2),
                      'unit': 'tok/s',
                      'vs_baseline': round(B * STEPS / dt, 2)}), flush=True)
    print(f'# megakernel B={B} {dt / STEPS * 1000:.1f} ms/step '
          f'({B * STEPS / dt:.0f} tok/s aggregate)',
          file=sys.stderr, flush=True)


def main(which='driver'):
    global STEPS
    if which == 'all':
        STEPS = 256
    qp8 = mk_llama_quant_params(cfg, bits=8)
    # interactive single-stream decode first: the family's headline
    measure(qp8, 1, False, 'llama7b_int8_decode_tok_per_sec',
            '(bf16 was 24.1 ms round 1)')
    if which == 'all':
        measure(qp8, 1, True, 'llama7b_int8_kv8_decode_tok_per_sec')
        measure(qp8, 8, True, 'llama7b_int8_kv8_batch8_decode_tok_per_sec',
                '(continuous-batching aggregate, serve/engine.py)')
    del qp8
    qp4 = mk_llama_quant_params(cfg, bits=4)
    # peak aggregate config FIRST (round 5): decode at B=8 is M=8 MXU-
    # row-bound (corrected exp_decode_matmul_m8 + megakernel parity
    # result, ROADMAP), so aggregate throughput scales with BATCH almost
    # for free: B=16 1099 tok/s (14.6 ms/step), B=24 1315 tok/s (18.3
    # ms/step) measured; B=32 fails to compile (full-step AOT compile
    # against the HBM wall — exp_b32_ceiling.py; NOT the attn kernel).
    # Cache at B=24/S=1024 int8 = 6.4 GB next to 3.5 GB int4 weights.
    measure(qp4, 24, True, 'llama7b_int4_kv8_batch24_decode_tok_per_sec',
            '(peak aggregate serving config)')
    if _left() > 90:
        measure(qp4, 8, True, 'llama7b_int4_kv8_batch8_decode_tok_per_sec',
                '(r02-r04 series point)')
    else:
        print(f'# budget trim: skipping B=8 int4 series point '
              f'({_left():.0f}s left)', file=sys.stderr, flush=True)
    if which == 'all':
        # measured AT PARITY with the per-layer path (10.41 vs 10.47
        # ms/step on v5e — see ROADMAP round-5 log): validated and kept,
        # but its ~10 min Mosaic compile stays out of the driver budget
        measure_megakernel(
            qp4, 'llama7b_int4_kv8_batch8_megakernel_tok_per_sec')
        measure(qp4, 1, False, 'llama7b_int4_decode_tok_per_sec')
        del qp4
        # bf16 fused-stream tree (bits=16): full-precision single-stream
        # decode through the same programs (weights ~13.2 GB: B=1 only)
        qp16 = mk_llama_quant_params(cfg, bits=16)
        measure(qp16, 1, True, 'llama7b_bf16_kv8_decode_tok_per_sec',
                '(fused bf16 tree + int8 KV)')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else 'driver')
