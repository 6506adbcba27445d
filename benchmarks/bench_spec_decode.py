"""Prompt-lookup speculative decoding throughput at 7B scale.

Measures tokens/s of the speculative verify loop vs the sequential
scan decode, bounding the law from both sides with synthetic weights:
the CEILING regime (prompt-lookup; synthetic greedy streams are
constant-ish, so acceptance ~G) shows the (G+1)x weight-stream win,
and the FLOOR regime (adversarial always-wrong proposer, acceptance 0)
shows the worst case — near sequential parity at weight-bound 7B
scale, minus the host-loop dispatch (the scan decode has none).
Real-weight acceptance on grounded-QA sits between, set by how much
answers echo the prompt.

Usage: python benchmarks/bench_spec_decode.py [G]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from groma_tpu.config import LlamaConfig  # noqa: E402
from groma_tpu.eval.speculative import (make_verify_step,  # noqa: E402
                                        speculative_greedy_decode)
from groma_tpu.models.llama import make_kv_cache  # noqa: E402
from groma_tpu.models.llama_quant import (quant_llama_forward,  # noqa: E402
                                          quant_llama_logits)
from _fixtures import mk_llama_quant_params  # noqa: E402


def main(G=8):
    cfg = LlamaConfig()
    on_tpu = jax.devices()[0].platform == 'tpu'
    if not on_tpu:
        cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                          intermediate_size=128, num_layers=2,
                          num_heads=4, num_kv_heads=4, dtype='float32')
    PRE, NEW, MAXLEN = 512, 128, 1024
    qp = mk_llama_quant_params(cfg, bits=8, pad_vocab=on_tpu)

    def embed_fn(qp, ids):
        return qp['embed_tokens'][ids]

    def logits_fn(qp, hidden):
        return quant_llama_logits(qp, hidden)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, (1, PRE)).astype(np.int32)

    def prefill(qp, ids):
        cache = make_kv_cache(cfg, 1, MAXLEN)
        emb = embed_fn(qp, ids)
        pos = jnp.arange(PRE)[None]
        h, cache = quant_llama_forward(qp, cfg, emb,
                                       jnp.ones((1, PRE), bool), pos,
                                       cache)
        return logits_fn(qp, h[:, -1:])[:, 0], cache

    pf = jax.jit(prefill)
    verify = make_verify_step(cfg, embed_fn, logits_fn, G)

    # sequential baseline: scan decode (bench_decode_quant's law)
    def decode_n(qp, tok0, cache, pos0):
        def step(carry, i):
            tok, cache = carry
            emb = embed_fn(qp, tok)
            h, cache = quant_llama_forward(
                qp, cfg, emb, jnp.ones((1, 1), bool), pos0 + i, cache)
            nxt = jnp.argmax(logits_fn(qp, h)[:, -1], -1,
                             keepdims=True).astype(jnp.int32)
            return (nxt, cache), nxt[:, 0]
        (_, cache), toks = jax.lax.scan(step, (tok0, cache),
                                        jnp.arange(NEW))
        return toks

    logits, cache = pf(qp, jnp.asarray(ids))
    tok0 = jnp.argmax(logits, -1)[:, None].astype(jnp.int32)
    dec = jax.jit(decode_n)
    toks = dec(qp, tok0, cache, jnp.full((1, 1), PRE, jnp.int32))
    toks.block_until_ready()
    # the timed baseline is DECODE ONLY (like the spec regimes below,
    # whose timer starts after prefill), on a warm executable: an
    # executable's early re-invocations over the axon tunnel can stall
    # tens of seconds (program re-load), so take the best of 2 reps
    dt_seq = float('inf')
    for _ in range(2):
        t0 = time.time()
        toks = np.asarray(dec(qp, tok0, cache,
                              jnp.full((1, 1), PRE, jnp.int32)))
        dt_seq = min(dt_seq, time.time() - t0)
    print(f'# sequential {NEW} tokens (warm, decode only): '
          f'{dt_seq * 1e3:.0f} ms ({NEW / dt_seq:.1f} tok/s, '
          f'{dt_seq / NEW * 1e3:.1f} ms/tok)', file=sys.stderr, flush=True)
    print(json.dumps({
        'metric': 'spec_sequential_baseline_tok_per_sec',
        'value': round(NEW / dt_seq, 1), 'unit': 'tok/s'}), flush=True)

    # two proposer regimes bound the law: prompt-lookup on synthetic
    # weights degenerates to high acceptance (constant-ish greedy
    # stream matches the repeat-last fallback) -> the (G+1)x ceiling;
    # an adversarial always-wrong proposer -> the floor, which should
    # sit near the sequential rate because one G+1-token verify streams
    # the weights once, like one step.
    def wrong(ctx, g, n):
        return [(ctx[-1] + 1 + i) % cfg.vocab_size for i in range(g)]

    for regime, proposer in (('ceiling', None), ('floor', wrong)):
        ctx = [int(t) for t in ids[0]]
        logits, cache = pf(qp, jnp.asarray(ids))
        cur = int(jnp.argmax(logits[0]))
        # warm the verify compile
        t0 = time.time()
        out, stats = speculative_greedy_decode(
            verify, qp, cache, cur, len(ctx), ctx, NEW, -1, G,
            proposer=proposer)
        dt = time.time() - t0
        print(f'# spec[{regime}] first (compile) {dt:.1f}s '
              f'accept={stats["tokens_per_call"]}', file=sys.stderr,
              flush=True)
        logits, cache = pf(qp, jnp.asarray(ids))
        cur = int(jnp.argmax(logits[0]))
        t0 = time.time()
        out, stats = speculative_greedy_decode(
            verify, qp, cache, cur, len(ctx), ctx, NEW, -1, G,
            proposer=proposer)
        dt = time.time() - t0
        n = len(out)
        print(json.dumps({
            'metric': f'spec_decode_{regime}_tok_per_sec',
            'value': round(n / dt, 1), 'unit': 'tok/s',
            'vs_baseline': round((n / dt) / (NEW / dt_seq), 2),
            'accept_per_call': stats['tokens_per_call'],
            'ms_per_verify_call': round(dt / stats['verify_calls'] * 1e3,
                                        1),
        }), flush=True)

    # decompose the verify-call cost: chain K calls through the donated
    # cache with NO host work between them (no n-gram search, no
    # emitted-token sync) and block once — per-call device+dispatch
    # cost.  The floor regime's ms/call minus this is the host-loop tax
    # (tunnel round-trips for int(n_accept) + emitted transfer + lookup).
    logits, cache = pf(qp, jnp.asarray(ids))
    cur = jnp.argmax(logits, -1)[:1].astype(jnp.int32)
    draft = jnp.zeros((G,), jnp.int32)
    pos_j = jnp.asarray([PRE], jnp.int32)
    cache, emitted, _, cur, pos_j = verify(qp, cache, cur, draft, pos_j)
    jax.block_until_ready(emitted)
    K = 24
    t0 = time.time()
    for _ in range(K):
        cache, emitted, _, cur, pos_j = verify(qp, cache, cur, draft,
                                               pos_j)
    jax.block_until_ready(emitted)
    ms = (time.time() - t0) / K * 1e3
    print(json.dumps({
        'metric': 'spec_verify_call_device_ms',
        'value': round(ms, 2), 'unit': 'ms/call',
        'vs_baseline': round(ms / (dt_seq / NEW * 1e3), 2),
    }), flush=True)


if __name__ == '__main__':
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
