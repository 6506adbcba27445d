"""Prompt-lookup speculative decoding: exact greedy equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.config import tiny_groma_config
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.eval.generate_quant import QuantGenerator, quantize_groma_llm
from groma_tpu.eval.rec import build_rec_prompt
from groma_tpu.eval.speculative import propose_prompt_lookup
from groma_tpu.models.groma import GromaModel

# heavyweight tier (round-5 verdict #7): run with -m slow; the
# default tier must stay <5 min
pytestmark = pytest.mark.slow

CFG = tiny_groma_config()
SPEC = VLDataSpec(num_image_tokens=CFG.num_image_tokens,
                  max_region_num=CFG.max_region_num,
                  max_seq_len=CFG.max_seq_len,
                  image_size=CFG.perceiver.image_size)


def test_propose_prompt_lookup():
    # last bigram (7, 8) occurred earlier, followed by 9, 4
    assert propose_prompt_lookup([1, 7, 8, 9, 4, 7, 8], 2) == [9, 4]
    # most recent match wins
    assert propose_prompt_lookup([7, 8, 1, 7, 8, 2, 7, 8], 2)[0] == 2
    # no match / short context: repeat-last fallback, always G long
    assert propose_prompt_lookup([5], 3) == [5, 5, 5]
    assert propose_prompt_lookup([1, 2, 3], 3) == [3, 3, 3]
    # continuation may run into the suffix itself (valid: those are the
    # genuinely-following tokens)
    assert propose_prompt_lookup([4, 5, 6, 4, 5], 3) == [6, 4, 5]
    # continuation shorter than G is padded with the last context token
    assert propose_prompt_lookup([1, 2, 1, 2], 3) == [1, 2, 2]


def _setup(rng, bits):
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    t = build_rec_prompt('a thing', tok, SPEC)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    kw = dict(images=img,
              input_ids=jnp.asarray(t['input_ids'][None]),
              region_slot=jnp.asarray(t['region_slot'][None]),
              base_valid=jnp.asarray(t['valid'][None]))
    params = model.init(jax.random.PRNGKey(0), **kw)['params']
    qp = quantize_groma_llm(params, CFG, bits=bits)
    return tok, model, params, qp, kw


def _trim(seq, eos):
    seq = [int(x) for x in seq]
    return seq[:seq.index(eos) + 1] if eos in seq else seq


def test_speculative_matches_sequential_greedy(rng):
    """The hard invariant: speculative greedy == sequential greedy,
    token for token (bits=16 tree, fp32 cache)."""
    tok, model, params, qp, kw = _setup(rng, bits=16)
    seq = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 16)
    spc = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 16,
                         spec_lookahead=4)
    want, vis_w = seq.generate(
        kw['images'], kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=8, eos_id=tok.sp.eos)
    got, vis_g = spc.generate(
        kw['images'], kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=8, eos_id=tok.sp.eos)
    assert _trim(got[0], tok.sp.eos) == _trim(want[0], tok.sp.eos), \
        (got, want, spc.spec_stats)
    np.testing.assert_allclose(vis_g['selected_boxes'],
                               vis_w['selected_boxes'], atol=1e-5)
    assert spc.spec_stats['verify_calls'] >= 1
    assert spc.spec_stats['tokens_per_call'] >= 1


def test_speculative_int8_weights(rng):
    """Same invariant through the int8 weight tree (shared _qmm route)."""
    tok, model, params, qp, kw = _setup(rng, bits=8)
    seq = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 16)
    spc = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 16,
                         spec_lookahead=3)
    want, _ = seq.generate(
        kw['images'], kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=6, eos_id=tok.sp.eos)
    got, _ = spc.generate(
        kw['images'], kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=6, eos_id=tok.sp.eos)
    assert _trim(got[0], tok.sp.eos) == _trim(want[0], tok.sp.eos), \
        (got, want, spc.spec_stats)


def test_engine_speculative_matches_sequential(rng):
    """Engine spec mode: batched (B, G+1) verify with per-row accepts
    and rewinds reproduces the sequential engine's greedy tokens for
    concurrent streams, including one admitted mid-decode."""
    import time as _time

    from groma_tpu.serve.engine import BatchEngine

    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    reqs = []
    for i in range(3):
        t = build_rec_prompt(f'thing {i}', tok, SPEC)
        img = rng.standard_normal(
            (CFG.perceiver.image_size,) * 2 + (3,)).astype(np.float32)
        reqs.append((img, t['input_ids'], t['region_slot'], t['valid']))
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(reqs[0][0])[None],
        input_ids=jnp.asarray(reqs[0][1])[None],
        region_slot=jnp.asarray(reqs[0][2])[None],
        base_valid=jnp.asarray(reqs[0][3])[None])['params']
    qp = quantize_groma_llm(params, CFG, bits=16)
    MAX_NEW = 7

    def run(spec):
        eng = BatchEngine(model, params, max_slots=2,
                          max_len=CFG.max_seq_len + MAX_NEW + 8,
                          eos_id=tok.sp.eos, chunk=2,
                          max_new_tokens=MAX_NEW, qp=qp,
                          spec_lookahead=spec)
        try:
            s0 = eng.submit(*reqs[0])
            s1 = eng.submit(*reqs[1])
            _time.sleep(0.5)
            s2 = eng.submit(*reqs[2])       # waits for a free slot
            return [list(s.token_stream()) for s in (s0, s1, s2)]
        finally:
            eng.close()

    want = run(0)
    got = run(3)

    def trim(seq):
        if tok.sp.eos in seq:
            return seq[:seq.index(tok.sp.eos) + 1]
        return seq[:MAX_NEW]
    for i, (g, w) in enumerate(zip(got, want)):
        assert trim(g) == trim(w), (i, g, w)


def test_engine_speculative_rejects_sampling(rng):
    from groma_tpu.serve.engine import BatchEngine
    import pytest

    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    t = build_rec_prompt('x', tok, SPEC)
    img = rng.standard_normal(
        (CFG.perceiver.image_size,) * 2 + (3,)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(img)[None],
        input_ids=jnp.asarray(t['input_ids'])[None],
        region_slot=jnp.asarray(t['region_slot'])[None],
        base_valid=jnp.asarray(t['valid'])[None])['params']
    qp = quantize_groma_llm(params, CFG, bits=16)
    eng = BatchEngine(model, params, max_slots=1, eos_id=tok.sp.eos,
                      max_len=CFG.max_seq_len + 16, qp=qp,
                      spec_lookahead=2)
    try:
        with pytest.raises(ValueError):
            eng.submit(img, t['input_ids'], t['region_slot'], t['valid'],
                       temperature=0.7)
    finally:
        eng.close()
