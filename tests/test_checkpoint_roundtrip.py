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
import pytest


@pytest.mark.slow
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


@pytest.mark.slow
def test_hf_export_import_roundtrip(tmp_path):
    """export_groma (flax -> reference state dict) is the exact inverse
    of import_groma: the round trip reproduces every leaf bit-for-bit,
    and the safetensors container reloads identically."""
    from groma_tpu.checkpoint.hf_export import export_groma, save_safetensors
    from groma_tpu.checkpoint.loader import import_groma

    cfg = tiny_groma_config()
    model = GromaModel(cfg)
    batch = _dummy_batch(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)['params']
    params = jax.tree_util.tree_map(np.asarray, params)

    sd = export_groma(params, cfg)
    back = import_groma(sd, cfg)

    flat1 = jax.tree_util.tree_flatten_with_path(params)[0]
    flat2 = jax.tree_util.tree_flatten_with_path(back)[0]
    paths1 = {jax.tree_util.keystr(k) for k, _ in flat1}
    paths2 = {jax.tree_util.keystr(k) for k, _ in flat2}
    assert paths1 == paths2, (paths1 - paths2, paths2 - paths1)
    vals2 = {jax.tree_util.keystr(k): v for k, v in flat2}
    for k, v in flat1:
        ks = jax.tree_util.keystr(k)
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(vals2[ks]), err_msg=ks)

    # safetensors container round trip
    from safetensors.numpy import load_file
    path = str(tmp_path / 'groma.safetensors')
    save_safetensors(sd, path)
    sd2 = load_file(path)
    assert set(sd2) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd[k], sd2[k], err_msg=k)
