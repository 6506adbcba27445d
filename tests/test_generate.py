"""End-to-end generation + REC harness smoke on the tiny model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.config import tiny_groma_config
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.eval.generate import Generator, parse_region_tokens
from groma_tpu.eval.rec import RECMetrics, build_rec_prompt, evaluate_rec
from groma_tpu.models.groma import GromaModel

# heavyweight tier (round-5 verdict #7): the module fixture
# alone costs minutes; run with -m slow
pytestmark = pytest.mark.slow

CFG = tiny_groma_config()
SPEC = VLDataSpec(num_image_tokens=CFG.num_image_tokens,
                  max_region_num=CFG.max_region_num,
                  max_seq_len=CFG.max_seq_len,
                  image_size=CFG.perceiver.image_size)


@pytest.fixture(scope='module')
def generator():
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    model = GromaModel(CFG)
    t = build_rec_prompt('thing', tok, SPEC)
    img = jnp.zeros((1, 56, 56, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        images=img,
                        input_ids=jnp.asarray(t['input_ids'][None]),
                        region_slot=jnp.asarray(t['region_slot'][None]),
                        base_valid=jnp.asarray(t['valid'][None]))['params']
    return Generator(model, params, max_len=CFG.max_seq_len + 16), tok


def test_greedy_generate_runs(generator, rng):
    gen, tok = generator
    t = build_rec_prompt('red box', tok, SPEC)
    img = jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32)
    tokens, vis = gen.generate(
        img, jnp.asarray(t['input_ids'][None]),
        jnp.asarray(t['region_slot'][None]),
        jnp.asarray(t['valid'][None]), max_new_tokens=4,
        eos_id=tok.sp.eos)
    assert tokens.shape[0] == 1 and 1 <= tokens.shape[1] <= 4
    assert vis['selected_boxes'].shape == (1, CFG.max_region_num, 4)


def test_rec_harness_runs(generator, rng):
    gen, tok = generator
    samples = [
        {'image': rng.standard_normal((56, 56, 3)).astype(np.float32),
         'expr': 'the widget',
         'gt_box': np.array([0.5, 0.5, 0.2, 0.2], np.float32)}
        for _ in range(2)]
    out = evaluate_rec(gen, samples, tok, SPEC)
    assert out['total'] == 2
    assert 0.0 <= out['acc@0.5'] <= 1.0
    assert out['miss_rate'] + out['acc@0.5'] <= 1.0 + 1e-9


def test_rec_metrics_math():
    m = RECMetrics()
    m.update(np.array([0.5, 0.5, 0.2, 0.2]),
             np.array([0.5, 0.5, 0.2, 0.2]))     # exact match
    m.update(None, np.array([0.5, 0.5, 0.2, 0.2]))  # miss
    m.update(np.array([0.9, 0.9, 0.1, 0.1]),
             np.array([0.1, 0.1, 0.1, 0.1]))     # wrong box
    s = m.summary()
    assert s['acc@0.5'] == pytest.approx(1 / 3)
    assert s['miss_rate'] == pytest.approx(1 / 3)


def test_parse_region_tokens():
    start = 1000
    toks = np.array([[5, 1003, 7, 1099, 2]])
    assert parse_region_tokens(toks, start) == [[3, 99]]


def test_rec_harness_batched(generator, rng):
    gen, tok = generator
    samples = [
        {'image': rng.standard_normal((56, 56, 3)).astype(np.float32),
         'expr': f'widget {i}',
         'gt_box': np.array([0.5, 0.5, 0.2, 0.2], np.float32)}
        for i in range(5)]
    from groma_tpu.eval.rec import evaluate_rec
    out = evaluate_rec(gen, samples, tok, SPEC, batch_size=2)
    assert out['total'] == 5      # ragged tail padded, not double-counted
