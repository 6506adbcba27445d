"""Continuous-batching engine vs the single-request Generator.

The engine interleaves independent streams in a fixed-slot batched cache
(serve/engine.py); with greedy fp32 decoding its outputs must be
IDENTICAL to running each request alone through eval/generate.Generator —
including for requests admitted mid-decode of other requests.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from groma_tpu.config import tiny_groma_config
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.eval.generate import Generator
from groma_tpu.eval.rec import build_rec_prompt
from groma_tpu.models.groma import GromaModel
from groma_tpu.serve.engine import BatchEngine

# heavyweight tier (round-5 verdict #7): run with -m slow; the
# default tier must stay <5 min
pytestmark = pytest.mark.slow

CFG = tiny_groma_config()
SPEC = VLDataSpec(num_image_tokens=CFG.num_image_tokens,
                  max_region_num=CFG.max_region_num,
                  max_seq_len=CFG.max_seq_len,
                  image_size=CFG.perceiver.image_size)
MAX_NEW = 6


def _requests(rng, n):
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    reqs = []
    for i in range(n):
        t = build_rec_prompt(f'thing {i}', tok, SPEC)
        img = rng.standard_normal(
            (CFG.perceiver.image_size,) * 2 + (3,)).astype(np.float32)
        reqs.append((img, t['input_ids'], t['region_slot'], t['valid']))
    return tok, reqs


def test_engine_matches_generator_with_mid_decode_admission(rng):
    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 3)
    img0 = jnp.asarray(reqs[0][0])[None]
    params = model.init(
        jax.random.PRNGKey(0), images=img0,
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']

    # ground truth: each request alone, greedy
    gen = Generator(model, params, max_len=CFG.max_seq_len + MAX_NEW + 8)
    singles = []
    for (img, ids, rslot, valid) in reqs:
        toks, vis = gen.generate(
            jnp.asarray(img)[None], jnp.asarray(ids)[None],
            jnp.asarray(rslot)[None], jnp.asarray(valid)[None],
            max_new_tokens=MAX_NEW, eos_id=tok.sp.eos)
        singles.append((list(int(x) for x in toks[0]), vis))

    eng = BatchEngine(model, params, max_slots=2,
                      max_len=CFG.max_seq_len + MAX_NEW + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=MAX_NEW)
    try:
        s0 = eng.submit(*reqs[0])
        s1 = eng.submit(*reqs[1])
        # let the first two start decoding, then admit a third (only 2
        # slots: it must wait for a free slot and still decode correctly)
        time.sleep(0.5)
        s2 = eng.submit(*reqs[2])
        outs = []
        for s in (s0, s1, s2):
            got = [t for t in s.token_stream()]
            outs.append(got)
    finally:
        eng.close()

    for i, (got, (want, vis_want)) in enumerate(zip(outs, singles)):
        # generator rows may carry trailing eos padding; compare up to
        # and including the first eos (or MAX_NEW tokens)
        def trim(seq):
            if tok.sp.eos in seq:
                return seq[:seq.index(tok.sp.eos) + 1]
            return seq[:MAX_NEW]
        assert trim(got) == trim(want), (i, got, want)

    # the proposal pool travels with the session
    np.testing.assert_allclose(
        np.asarray(s0.vis['selected_boxes']),
        np.asarray(singles[0][1]['selected_boxes'][0]), atol=1e-5)


@pytest.mark.parametrize('kv_bits', [16, 8])
def test_quant_engine_matches_quant_generator(rng, kv_bits):
    """int8-LLM continuous batching (the production single-chip serving
    config) matches QuantGenerator per request; kv_bits=8 additionally
    runs the int8 KV cache (first token exact; later tokens may differ
    by KV-quantization noise on a random tiny model, so only the bf16-KV
    variant asserts full equality)."""
    from groma_tpu.eval.generate_quant import (QuantGenerator,
                                               quantize_groma_llm)

    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 2)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG)

    qg = QuantGenerator(model, params, qp,
                        max_len=CFG.max_seq_len + MAX_NEW + 8,
                        kv_bits=kv_bits)
    singles = []
    for (img, ids, rslot, valid) in reqs:
        toks, _ = qg.generate(
            jnp.asarray(img)[None], jnp.asarray(ids)[None],
            jnp.asarray(rslot)[None], jnp.asarray(valid)[None],
            max_new_tokens=MAX_NEW, eos_id=tok.sp.eos)
        singles.append([int(x) for x in toks[0]])

    eng = BatchEngine(model, params, max_slots=2,
                      max_len=CFG.max_seq_len + MAX_NEW + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=MAX_NEW,
                      qp=qp, kv_bits=kv_bits)
    try:
        sessions = [eng.submit(*r) for r in reqs]
        outs = [[t for t in s.token_stream()] for s in sessions]
    finally:
        eng.close()

    def trim(seq):
        if tok.sp.eos in seq:
            return seq[:seq.index(tok.sp.eos) + 1]
        return seq[:MAX_NEW]

    for got, want in zip(outs, singles):
        if kv_bits == 16:
            assert trim(got) == trim(want), (got, want)
        else:
            assert got[0] == want[0]     # prefill logits are exact


def test_chunked_prefill_engine_matches_oneshot_engine(rng):
    """prefill_chunk_tokens (interleaved chunked prefill) must produce
    the same greedy streams as the one-shot-prefill engine (bf16 KV —
    exact path)."""
    from groma_tpu.eval.generate_quant import quantize_groma_llm

    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 3)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG)

    def run(**kw):
        eng = BatchEngine(model, params, max_slots=2,
                          max_len=CFG.max_seq_len + MAX_NEW + 8,
                          eos_id=tok.sp.eos, chunk=2,
                          max_new_tokens=MAX_NEW, qp=qp, **kw)
        try:
            # submit with a stagger so chunked prefills of later requests
            # interleave with live decode of earlier ones
            sessions = []
            for r in reqs:
                sessions.append(eng.submit(*r))
            return [[t for t in s.token_stream()] for s in sessions]
        finally:
            eng.close()

    want = run()
    got = run(prefill_chunk_tokens=5)     # ragged: stream len % 5 != 0
    assert got == want, (got, want)


def test_batched_admission_matches_single(rng):
    """admit_batch=2 (batched b=2 prefill + row-wise slot insertion) must
    produce the same greedy streams as per-request admission."""
    from groma_tpu.eval.generate_quant import quantize_groma_llm

    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 4)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG)

    def run(**kw):
        eng = BatchEngine(model, params, max_slots=2,
                          max_len=CFG.max_seq_len + MAX_NEW + 8,
                          eos_id=tok.sp.eos, chunk=2,
                          max_new_tokens=MAX_NEW, qp=qp, **kw)
        try:
            sessions = [eng.submit(*r) for r in reqs]
            return [[t for t in s.token_stream()] for s in sessions]
        finally:
            eng.close()

    want = run()
    got = run(admit_batch=2)
    assert got == want, (got, want)


def test_partial_group_uses_padded_batched_prefill(rng):
    """A partial admission group (2 waiting, admit_batch=3) must run the
    ONE padded b=3 program (dummy rows replicated, never seated) and
    still produce exactly the per-request streams."""
    from groma_tpu.eval.generate_quant import quantize_groma_llm

    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 2)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG)

    def run(**kw):
        eng = BatchEngine(model, params, max_slots=3,
                          max_len=CFG.max_seq_len + MAX_NEW + 8,
                          eos_id=tok.sp.eos, chunk=2,
                          max_new_tokens=MAX_NEW, qp=qp, **kw)
        try:
            sessions = [eng.submit(*r) for r in reqs]
            return [[t for t in s.token_stream()] for s in sessions]
        finally:
            eng.close()

    want = run()
    got = run(admit_batch=3)          # only 2 requests ever queued
    assert got == want, (got, want)


def test_paged_engine_matches_contiguous_kv8_engine(rng):
    """paged_kv=True (shared 128-token page pool, compacted prefill
    streams, block-indirect decode attention) must produce the same
    greedy streams as the contiguous int8-KV engine: compaction is exact
    because rope positions are already compacted cumsum indices, and the
    CPU fallback gathers pages back into the contiguous int8 chain."""
    from groma_tpu.eval.generate_quant import quantize_groma_llm

    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 3)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG)

    def run(**kw):
        eng = BatchEngine(model, params, max_slots=2,
                          max_len=CFG.max_seq_len + MAX_NEW + 8,
                          eos_id=tok.sp.eos, chunk=2,
                          max_new_tokens=MAX_NEW, qp=qp, kv_bits=8, **kw)
        try:
            sessions = [eng.submit(*r) for r in reqs]
            outs = [[t for t in s.token_stream()] for s in sessions]
            assert not any(s.truncated for s in sessions)
            return outs
        finally:
            eng.close()

    want = run()
    got = run(paged_kv=True)
    assert got == want, (got, want)


def test_paged_engine_recycles_pages_under_tiny_pool(rng):
    """A pool sized for ONE worst-case request (free pages == np_max)
    forces admission back-pressure: requests serialize through the pool,
    finished streams return their pages, and every stream still matches
    the roomy-pool engine exactly (nothing truncated, nothing leaked)."""
    from groma_tpu.eval.generate_quant import quantize_groma_llm
    from groma_tpu.ops.paged_attention import PAGE

    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 4)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG)

    def run(pool_tokens):
        eng = BatchEngine(model, params, max_slots=2,
                          max_len=CFG.max_seq_len + MAX_NEW + 8,
                          eos_id=tok.sp.eos, chunk=2,
                          max_new_tokens=MAX_NEW, qp=qp, kv_bits=8,
                          paged_kv=True, kv_pool_tokens=pool_tokens)
        np_max = eng._np_max
        try:
            sessions = [eng.submit(*r) for r in reqs]
            outs = [[t for t in s.token_stream()] for s in sessions]
            assert not any(s.truncated for s in sessions)
            # every page came back to the free list
            assert len(eng._free_pages) == eng._num_pages - 1
            assert all(not p for p in eng._slot_pages)
            return outs, np_max
        finally:
            eng.close()

    want, np_max = run(pool_tokens=8 * PAGE)    # roomy
    got, _ = run(pool_tokens=np_max * PAGE)     # exactly one request
    assert got == want, (got, want)


def test_priority_orders_admission(rng):
    """With one slot occupied, a later high-priority submission must be
    admitted before an earlier low-priority one."""
    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 3)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']

    eng = BatchEngine(model, params, max_slots=1,
                      max_len=CFG.max_seq_len + MAX_NEW + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=MAX_NEW)
    first_token_at = {}

    def consume(name, sess):
        for _ in sess.token_stream():
            first_token_at.setdefault(name, time.monotonic())

    try:
        s0 = eng.submit(*reqs[0])
        # enqueued while slot 0 is busy (prefill compile takes seconds on
        # first use): low priority first, high priority second
        s_low = eng.submit(*reqs[1], priority=0)
        s_high = eng.submit(*reqs[2], priority=5)
        import threading
        threads = [threading.Thread(target=consume, args=a)
                   for a in (('first', s0), ('low', s_low),
                             ('high', s_high))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
    finally:
        eng.close()

    assert first_token_at['high'] < first_token_at['low'], first_token_at


def test_session_cancel_frees_slot(rng):
    """Session.cancel (the worker's stop-string path) ends the stream at
    the next burst boundary and frees the slot for a waiting request."""
    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 2)
    img0 = jnp.asarray(reqs[0][0])[None]
    params = model.init(
        jax.random.PRNGKey(0), images=img0,
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']

    eng = BatchEngine(model, params, max_slots=1,
                      max_len=CFG.max_seq_len + 64 + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=64)
    try:
        s0 = eng.submit(*reqs[0])
        stream = s0.token_stream()
        next(stream)             # at least one token produced
        s0.cancel()
        rest = list(stream)      # must terminate (slot freed)
        assert len(rest) < 64
        assert s0.done
        # the freed slot admits and completes a second request
        s1 = eng.submit(*reqs[1], max_new_tokens=4)
        got = list(s1.token_stream())
        assert 1 <= len(got) <= 4 + 1
    finally:
        eng.close()


def test_per_slot_temperature_sampling(rng):
    """temp>0 streams sample; temp=0 streams in the SAME batch stay
    exactly greedy (per-slot jnp.where selection, one program)."""
    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 2)
    img0 = jnp.asarray(reqs[0][0])[None]
    params = model.init(
        jax.random.PRNGKey(0), images=img0,
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']

    gen = Generator(model, params, max_len=CFG.max_seq_len + MAX_NEW + 8)
    want, _ = gen.generate(
        jnp.asarray(reqs[0][0])[None], jnp.asarray(reqs[0][1])[None],
        jnp.asarray(reqs[0][2])[None], jnp.asarray(reqs[0][3])[None],
        max_new_tokens=MAX_NEW, eos_id=tok.sp.eos)
    want = [int(x) for x in want[0]]

    eng = BatchEngine(model, params, max_slots=2,
                      max_len=CFG.max_seq_len + MAX_NEW + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=MAX_NEW)
    try:
        s_greedy = eng.submit(*reqs[0])                      # temp 0
        s_hot = eng.submit(*reqs[1], temperature=5.0)        # sampled
        got_greedy = list(s_greedy.token_stream())
        got_hot = list(s_hot.token_stream())
    finally:
        eng.close()

    def trim(seq):
        if tok.sp.eos in seq:
            return seq[:seq.index(tok.sp.eos) + 1]
        return seq[:MAX_NEW]
    assert trim(got_greedy) == trim(want), (got_greedy, want)
    assert 1 <= len(got_hot) <= MAX_NEW
    V = CFG.llm.vocab_size + CFG.num_new_token
    assert all(0 <= t < V for t in got_hot)


def test_engine_stats_counters(rng):
    """stats() reflects admissions, finishes, tokens, and TTFT."""
    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 2)
    img0 = jnp.asarray(reqs[0][0])[None]
    params = model.init(
        jax.random.PRNGKey(0), images=img0,
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    eng = BatchEngine(model, params, max_slots=2,
                      max_len=CFG.max_seq_len + MAX_NEW + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=MAX_NEW)
    try:
        s0 = eng.submit(*reqs[0])
        s1 = eng.submit(*reqs[1])
        t0 = list(s0.token_stream())
        t1 = list(s1.token_stream())
        st = eng.stats()
    finally:
        eng.close()
    assert st['submitted'] == 2 and st['finished'] == 2
    assert st['truncated'] == 0
    assert st['tokens_emitted'] == len(t0) + len(t1)
    assert st['mean_ttft_sec'] is not None and st['mean_ttft_sec'] > 0
    assert s0.ttft is not None and s0.ttft > 0
    assert st['tokens_per_sec'] > 0


def test_engine_fatal_error_fails_fast(rng):
    """A fatal error in the scheduler loop (e.g. device OOM mid-burst)
    must NOT leave consumers blocked on token_stream() forever: live and
    queued streams end by re-raising the error, later submits refuse,
    and stats() reports the death (serve/engine.py _abort_all)."""
    model = GromaModel(CFG)
    tok, reqs = _requests(rng, 3)
    img0 = jnp.asarray(reqs[0][0])[None]
    params = model.init(
        jax.random.PRNGKey(0), images=img0,
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    eng = BatchEngine(model, params, max_slots=1,
                      max_len=CFG.max_seq_len + 64 + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=64)
    try:
        boom = RuntimeError('RESOURCE_EXHAUSTED (simulated)')

        def die():
            raise boom

        eng._decode_burst = die
        s0 = eng.submit(*reqs[0])           # will be seated, then die
        s1 = eng.submit(*reqs[1])           # stays queued -> aborted too
        with pytest.raises(RuntimeError) as e0:
            list(s0.token_stream())
        assert e0.value.__cause__ is boom
        with pytest.raises(RuntimeError):
            list(s1.token_stream())
        assert s0.error is boom and s1.error is boom
        assert s0.done and s1.done
        assert 'RESOURCE_EXHAUSTED' in eng.stats()['fatal']
        with pytest.raises(RuntimeError):   # engine refuses new work
            eng.submit(*reqs[2])
    finally:
        eng.close()
