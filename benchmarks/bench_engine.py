"""Full-scale continuous-batching engine benchmark (serve/engine.py).

Drives the REAL BatchEngine — vision prefill + slot insertion + batched
decode — at Groma-7B scale (bf16 vision, int8 LLM, int8 KV) on one chip:

* aggregate decode tok/s and requests/min while draining a queue of REC
  requests through ``max_slots`` slots,
* the longest inter-burst stall an ACTIVE stream sees while later
  requests prefill — one-shot prefill stalls every live stream for the
  full prompt; chunked prefill (``prefill_chunk_tokens``) bounds the
  stall at one chunk + one decode burst.

Standalone (not part of bench.py's driver run — engine compiles are
heavy); host-side timing INCLUDES the axon tunnel's ~30 ms dispatch
overhead per program call, so on-host deployments see better numbers.
"""
import sys, os, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp

from groma_tpu.config import (DDETRConfig, GromaConfig, LlamaConfig,
                              PerceiverConfig, ViTConfig)
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.eval.rec import build_rec_prompt
from groma_tpu.models.groma import GromaModel
from groma_tpu.serve.engine import BatchEngine

on_tpu = jax.devices()[0].platform == 'tpu'
LONG = '--long' in sys.argv      # long-prompt regime (chunked prefill's
                                 # home turf: the prompt compute dwarfs
                                 # the per-chunk weight re-stream)
CAPACITY = '--capacity' in sys.argv  # paged-KV capacity regime: slots x
                                 # max_len the contiguous cache cannot
                                 # hold in 16 GB next to the weights
if on_tpu:
    cfg = GromaConfig(
        llm=LlamaConfig(),
        perceiver=PerceiverConfig(vit=ViTConfig(dtype='bfloat16'),
                                  ddetr=DDETRConfig(dtype='bfloat16'),
                                  image_size=448))
    if CAPACITY:
        # 12 slots x 2176-token int8 contiguous KV would be 6.6 GB on
        # top of ~8 GB weights+vision -> contiguous OOMs at 8 slots
        # already (the LONG regime's measured failure); paged allocates
        # by ACTUAL stream length (~616 tok = 5 pages = 161 MB/slot),
        # so a 12k-token pool (3.2 GB) seats all 12.  (16 paged slots
        # OOMed transiently: a b=1 2k prefill + vision spikes next to
        # the 4.3 GB pool during a 16-slot burst.)
        SLOTS, NREQ, MAXNEW, CHUNK, PCHUNK = 12, 12, 48, 24, 192
        seq_len = 2048
    elif LONG:
        # 6 slots, not 8: 8 x 551 MB int8 KV next to ~7.2 GB int8
        # weights + the b=1 2k-prefill workspace fragments past 16 GB
        # (round-4 OOM in the decode burst); the stall crossover only
        # needs >=2 concurrent streams
        SLOTS, NREQ, MAXNEW, CHUNK, PCHUNK = 6, 8, 48, 24, 512
        seq_len = 2048
    else:
        SLOTS, NREQ, MAXNEW, CHUNK, PCHUNK = 8, 16, 48, 24, 192
        seq_len = 640    # REC stream sizing, see bench_e2e.py (round 4)
else:
    from __graft_entry__ import _small_cfg
    cfg = _small_cfg()
    SLOTS, NREQ, MAXNEW, CHUNK, PCHUNK = 2, 3, 8, 4, 16
    seq_len = cfg.max_seq_len

model = GromaModel(cfg)
spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                  max_region_num=cfg.max_region_num,
                  max_seq_len=seq_len,
                  image_size=cfg.perceiver.image_size)
tok = StubTokenizer(base_vocab=cfg.llm.vocab_size)
t = build_rec_prompt('the red object on the left', tok, spec)
img_sz = cfg.perceiver.image_size
rng = np.random.default_rng(0)

image = rng.standard_normal((img_sz, img_sz, 3)).astype(np.float32)
params = jax.jit(
    lambda im, i, s, v: model.init(jax.random.PRNGKey(0), im, i, s, v,
                                   method=GromaModel.prepare_stream)
)(jnp.asarray(image)[None], jnp.asarray(t['input_ids'])[None],
  jnp.asarray(t['region_slot'])[None],
  jnp.asarray(t['valid'])[None])['params']
params = jax.tree_util.tree_map(
    lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
    params)

H, V = cfg.llm.hidden_size, cfg.llm.vocab_size
from _fixtures import mk_llama_quant_params  # noqa: E402
qp = mk_llama_quant_params(cfg.llm, bits=8,
                           num_new_token=cfg.num_new_token,
                           pad_vocab=False, device=False)
# random embeddings/heads so greedy decode produces varied token streams
qp['embed_tokens'] = jnp.asarray(
    rng.standard_normal((V, H)) * 0.02, jnp.bfloat16)
qp['new_input_embs'] = jnp.asarray(
    rng.standard_normal((cfg.num_new_token, H)) * 0.02, jnp.bfloat16)
qp['extra_lm_head'] = jnp.asarray(
    rng.standard_normal((H, cfg.num_new_token)) * 0.02, jnp.bfloat16)
qp = jax.jit(lambda x: x)(qp)


def drive(prefill_chunk, admit_batch=1, paged=False, spec=0,
          pool_tokens=None):
    eng = BatchEngine(model, params, max_slots=SLOTS,
                      max_len=seq_len + MAXNEW + 8, eos_id=-1,
                      chunk=CHUNK, max_new_tokens=MAXNEW, qp=qp,
                      kv_bits=8, prefill_chunk_tokens=prefill_chunk,
                      admit_batch=admit_batch, paged_kv=paged,
                      kv_pool_tokens=pool_tokens,
                      spec_lookahead=spec)
    try:
        # warmup: compile every program — enough simultaneous requests
        # to trigger the batched-admission prefill too
        warm = [eng.submit(image, t['input_ids'], t['region_slot'],
                           t['valid']) for _ in range(max(1, admit_batch))]
        for s0 in warm:
            for _ in s0.token_stream():
                pass

        stamps = {i: [] for i in range(NREQ)}
        t0 = time.perf_counter()
        sessions = [eng.submit(image, t['input_ids'], t['region_slot'],
                               t['valid']) for i in range(NREQ)]

        def consume(i, sess):
            for _ in sess.token_stream():
                stamps[i].append(time.perf_counter())

        import threading
        threads = [threading.Thread(target=consume, args=(i, s))
                   for i, s in enumerate(sessions)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        dt = time.perf_counter() - t0
        for s in sessions:       # surface engine-fatal errors (OOM) in
            if s.error:          # THIS thread instead of dying silently
                raise s.error    # inside a consumer thread
    finally:
        eng.close()

    total_toks = sum(len(v) for v in stamps.values())
    # worst stall: longest gap between consecutive decode BURSTS seen by
    # a live stream (tokens arrive CHUNK at a time; intra-burst gaps are
    # ~0), excluding each stream's own prefill wait (first token).  With
    # one-shot prefill this gap grows to the full prefill latency of any
    # concurrently-admitted request; chunked prefill bounds it at one
    # prompt chunk + one burst.
    worst = 0.0
    for v in stamps.values():
        bursts = [t for a, t in zip(v[1:], v[2:]) if t - a > 2e-3]
        for a, b in zip([v[1]] + bursts, bursts):
            worst = max(worst, b - a)
    mode = f'chunked({prefill_chunk})' if prefill_chunk else (
        f'one-shot admit_batch={admit_batch}'
        + (' paged' if paged else '') + (f' spec{spec}' if spec else ''))
    tag = ('chunked' if prefill_chunk
           else (f'spec{spec}' if spec
                 else ('paged' if paged else f'oneshot_ab{admit_batch}')))
    if LONG:
        tag += '_long'
    if CAPACITY:
        tag += f'_cap{SLOTS}x2k'
    print(json.dumps({
        'metric': f'engine_aggregate_tok_per_sec_{tag}',
        'value': round(total_toks / dt, 2), 'unit': 'tok/s'}), flush=True)
    print(json.dumps({
        'metric': f'engine_worst_stall_ms_{tag}',
        'value': round(worst * 1000, 1), 'unit': 'ms'}), flush=True)
    print(f'# {mode}: {NREQ} reqs x {MAXNEW} new tokens in {dt:.1f}s '
          f'({NREQ / dt * 60:.1f} req/min, {total_toks / dt:.0f} tok/s '
          f'aggregate), worst mid-stream stall {worst * 1000:.0f} ms',
          flush=True)


if CAPACITY:
    # paged KV's winning regime: SLOTS (12) concurrent 2k-max-context
    # streams.  The contiguous engine must reserve max_len per slot,
    # which does not fit in 16 GB next to ~7.3 GB int8 weights + ~1 GB
    # bf16 vision.  Round-4 measured: attempting it does not even fail
    # cleanly — the tunnel-side allocator hangs retrying (30 min, zero
    # progress; the 8-slot LONG regime OOMs outright) — so the
    # contiguous side is reported as the COMPUTED arithmetic ledger it
    # is, and the PAGED engine actually runs: REC-compacted 2k-cap
    # streams seat ~616 live tokens = 5 pages = 161 MB/slot, so a
    # 12k-token pool (3.2 GB) serves all 12 concurrently.
    ml = seq_len + MAXNEW + 8
    kv_bytes = 1                             # engine runs kv_bits=8
    per_tok = (2 * cfg.llm.num_layers * cfg.llm.num_kv_heads
               * (cfg.llm.hidden_size // cfg.llm.num_heads)
               * kv_bytes / 1e9)             # int8 KV GB/token
    need = SLOTS * (-(-ml // 128) * 128) * per_tok
    print(json.dumps({
        'metric': f'engine_contiguous_{SLOTS}slot_2k_kv_gb',
        'value': round(need, 2), 'unit': 'GB, computed ledger (not a '
        'measurement; does not fit: +7.3 GB int8 weights + ~1 GB '
        'vision > 16 GB HBM; contiguous OOMs at 8 slots, measured)'}),
        flush=True)
    drive(0, paged=True, pool_tokens=SLOTS * 1024)
elif LONG:
    # the chunked-prefill crossover regime: 2048-token prompts.  One-shot
    # stalls every live stream for the FULL ~2k-token prefill; 512-token
    # chunks re-stream the int8 weight tree 3 extra times (~8 ms each, vs
    # ~35 ms of chunk compute) — a small throughput tax for a 4x tighter
    # stall bound.  Run the two modes in SEPARATE processes
    # (--only=oneshot / --only=chunked): the first engine's executables
    # + fragmentation leave too little of the 16 GB for the second
    # (round-4 OOM when both ran in one process).
    only = next((a.split('=', 1)[1] for a in sys.argv
                 if a.startswith('--only=')), None)
    if only in (None, 'oneshot'):
        drive(0)
    if only in (None, 'chunked'):
        drive(PCHUNK)
else:
    drive(0)
    drive(0, admit_batch=4)
    drive(PCHUNK)
    drive(0, paged=True)
    # batched speculative verify (prompt-lookup): synthetic weights give
    # near-constant greedy streams -> high acceptance, the optimistic
    # bound; real-weight acceptance depends on prompt echo
    drive(0, spec=8)
