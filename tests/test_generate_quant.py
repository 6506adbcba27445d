"""Quantized Groma generation path vs full precision (tiny model)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavyweight tier (round-5 verdict #7): run with -m slow; the
# default tier must stay <5 min
pytestmark = pytest.mark.slow

from groma_tpu.config import tiny_groma_config
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.eval.generate import Generator
from groma_tpu.eval.generate_quant import QuantGenerator, quantize_groma_llm
from groma_tpu.eval.rec import build_rec_prompt
from groma_tpu.models.groma import GromaModel

CFG = tiny_groma_config()
SPEC = VLDataSpec(num_image_tokens=CFG.num_image_tokens,
                  max_region_num=CFG.max_region_num,
                  max_seq_len=CFG.max_seq_len,
                  image_size=CFG.perceiver.image_size)


def test_quant_generator_runs_and_tracks_fp(rng):
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    t = build_rec_prompt('thing', tok, SPEC)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    kw = dict(images=img,
              input_ids=jnp.asarray(t['input_ids'][None]),
              region_slot=jnp.asarray(t['region_slot'][None]),
              base_valid=jnp.asarray(t['valid'][None]))
    params = model.init(jax.random.PRNGKey(0), **kw)['params']
    qp = quantize_groma_llm(params, CFG)

    fp = Generator(model, params, max_len=CFG.max_seq_len + 8)
    qg = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 8)

    toks_fp, vis_fp = fp.generate(
        img, kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=3, eos_id=tok.sp.eos)
    toks_q, vis_q = qg.generate(
        img, kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=3, eos_id=tok.sp.eos)
    assert toks_q.shape[0] == 1 and toks_q.shape[1] >= 1
    # same proposal pool (vision path is shared, full precision)
    np.testing.assert_allclose(vis_q['selected_boxes'],
                               vis_fp['selected_boxes'], atol=1e-5)


def test_quant_generator_int8_kv(rng):
    """kv_bits=8 path runs end to end and matches the bf16-cache decode's
    proposal pool and token shape (int8 cache noise may flip tokens on a
    random tiny model, so only structure + vision are asserted exact)."""
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    t = build_rec_prompt('thing', tok, SPEC)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    kw = dict(images=img,
              input_ids=jnp.asarray(t['input_ids'][None]),
              region_slot=jnp.asarray(t['region_slot'][None]),
              base_valid=jnp.asarray(t['valid'][None]))
    params = model.init(jax.random.PRNGKey(0), **kw)['params']
    qp = quantize_groma_llm(params, CFG)

    qg16 = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 8)
    qg8 = QuantGenerator(model, params, qp, max_len=CFG.max_seq_len + 8,
                         kv_bits=8)
    toks16, vis16 = qg16.generate(
        img, kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=3, eos_id=tok.sp.eos)
    toks8, vis8 = qg8.generate(
        img, kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=3, eos_id=tok.sp.eos)
    assert toks8.shape[0] == 1 and toks8.shape[1] >= 1
    np.testing.assert_allclose(vis8['selected_boxes'],
                               vis16['selected_boxes'], atol=1e-5)
    # first decoded token comes from the (identical) prefill logits
    assert toks8[0, 0] == toks16[0, 0]


def test_bf16_tree_generator_matches_fp_tokens(rng):
    """bits=16 fused tree: greedy tokens MATCH the full-precision
    Generator exactly on the tiny fp32 model (no quantization noise —
    the fused tree is the same math with fused weight streams)."""
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    t = build_rec_prompt('thing', tok, SPEC)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    kw = dict(images=img,
              input_ids=jnp.asarray(t['input_ids'][None]),
              region_slot=jnp.asarray(t['region_slot'][None]),
              base_valid=jnp.asarray(t['valid'][None]))
    params = model.init(jax.random.PRNGKey(0), **kw)['params']
    qp16 = quantize_groma_llm(params, CFG, bits=16)

    fp = Generator(model, params, max_len=CFG.max_seq_len + 8)
    qg = QuantGenerator(model, params, qp16, max_len=CFG.max_seq_len + 8)
    toks_fp, vis_fp = fp.generate(
        img, kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=4, eos_id=tok.sp.eos)
    toks_16, vis_16 = qg.generate(
        img, kw['input_ids'], kw['region_slot'], kw['base_valid'],
        max_new_tokens=4, eos_id=tok.sp.eos)
    np.testing.assert_allclose(vis_16['selected_boxes'],
                               vis_fp['selected_boxes'], atol=1e-5)
    w = min(toks_fp.shape[1], toks_16.shape[1])
    np.testing.assert_array_equal(toks_16[:, :w], toks_fp[:, :w])
