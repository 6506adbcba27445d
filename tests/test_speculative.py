"""Prompt-lookup speculative decoding: exact greedy equivalence."""

import numpy as np
import jax
import jax.numpy as jnp

from groma_tpu.config import tiny_groma_config
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.eval.generate_quant import QuantGenerator, quantize_groma_llm
from groma_tpu.eval.rec import build_rec_prompt
from groma_tpu.eval.speculative import propose_prompt_lookup
from groma_tpu.models.groma import GromaModel

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
