"""Export -> load_groma roundtrip in this framework's own format, plus a
generation smoke through the loaded checkpoint (the integration path the
REC/LVIS CLIs use)."""

import numpy as np
import jax
import jax.numpy as jnp

from groma_tpu.checkpoint.loader import load_groma, _dummy_batch
from groma_tpu.checkpoint.orbax_io import export_params
from groma_tpu.config import tiny_groma_config
from groma_tpu.models.groma import GromaModel


def test_export_load_generate_roundtrip(rng, tmp_path):
    cfg = tiny_groma_config()
    model = GromaModel(cfg)
    batch = _dummy_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)['params']
    out_dir = str(tmp_path / 'ckpt')
    export_params(out_dir, params, config=cfg)

    model2, params2, cfg2 = load_groma(out_dir)
    assert cfg2 == cfg
    flat1 = jax.tree_util.tree_leaves(params)
    flat2 = jax.tree_util.tree_leaves(params2)
    assert all(np.array_equal(a, b) for a, b in zip(flat1, flat2))

    # drive a generation through the loaded checkpoint
    from groma_tpu.data.datasets.base import VLDataSpec
    from groma_tpu.data.tokenizer import StubTokenizer
    from groma_tpu.eval.generate import Generator
    from groma_tpu.eval.rec import build_rec_prompt

    tok = StubTokenizer(base_vocab=cfg.llm.vocab_size)
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=cfg.max_seq_len,
                      image_size=cfg.perceiver.image_size)
    t = build_rec_prompt('a thing', tok, spec)
    gen = Generator(model2, params2, max_len=cfg.max_seq_len + 8)
    tokens, vis = gen.generate(
        jnp.asarray(rng.standard_normal((1, 56, 56, 3)), jnp.float32),
        jnp.asarray(t['input_ids'][None]),
        jnp.asarray(t['region_slot'][None]),
        jnp.asarray(t['valid'][None]),
        max_new_tokens=2, eos_id=tok.sp.eos)
    assert tokens.shape[0] == 1
