"""4-bit quantization tests: packed int4 codec + matmul fallback, nf4
codec vs bitsandbytes semantics (reference: groma/eval/run_groma.py:43-61
BitsAndBytesConfig nf4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from groma_tpu.ops.quant4 import (NF4_TABLE, dequantize_weight_int4,
                                  int4_matmul, nf4_dequantize, nf4_quantize,
                                  quantize_weight_int4)


def test_int4_pack_roundtrip(rng):
    w = jnp.asarray(rng.standard_normal((512, 96)), jnp.float32)
    qd = quantize_weight_int4(w, block=128)
    assert qd['q'].dtype == jnp.uint8
    assert qd['q'].shape == (256, 96)
    assert qd['scale'].shape == (4, 96)
    back = dequantize_weight_int4(qd)
    # max error is half a quantization step = blockmax/14
    step = np.repeat(np.asarray(qd['scale']), 128, axis=0)
    assert np.all(np.abs(np.asarray(back - w)) <= step / 2 + 1e-6)


def test_int4_matmul_matches_dequant(rng):
    w = jnp.asarray(rng.standard_normal((512, 96)), jnp.float32)
    qd = quantize_weight_int4(w, block=128)
    x = jnp.asarray(rng.standard_normal((3, 512)), jnp.float32)
    got = np.asarray(int4_matmul(x, qd['q'], qd['scale'], block=128))
    want = np.asarray(x @ dequantize_weight_int4(qd))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_int4_pad_to(rng):
    w = jnp.asarray(rng.standard_normal((512, 100)), jnp.float32)
    qd = quantize_weight_int4(w, block=128, pad_to=64)
    assert qd['q'].shape[1] == 128
    x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
    got = np.asarray(int4_matmul(x, qd['q'], qd['scale'], block=128))
    want = np.asarray(x @ dequantize_weight_int4(
        quantize_weight_int4(w, block=128)))
    np.testing.assert_allclose(got[:, :100], want, atol=1e-3, rtol=1e-3)


def test_nf4_table_is_bnb():
    # spot values from bitsandbytes create_normal_map (functional.py)
    assert NF4_TABLE[0] == -1.0
    assert NF4_TABLE[7] == 0.0
    assert NF4_TABLE[15] == 1.0
    assert abs(NF4_TABLE[1] + 0.6961928009986877) < 1e-9
    assert abs(NF4_TABLE[8] - 0.07958029955625534) < 1e-9
    assert np.all(np.diff(NF4_TABLE) > 0)


def test_nf4_roundtrip_error_bounded(rng):
    w = jnp.asarray(rng.standard_normal((64, 64)), jnp.float32)
    qd = nf4_quantize(w, block=64)
    assert qd['codes'].shape == (64 * 64 // 2,)
    back = nf4_dequantize(qd)
    # per-block max error <= absmax * widest half-gap of the table
    gaps = np.diff(NF4_TABLE).max() / 2
    absmax = np.repeat(np.asarray(qd['absmax']), 64)
    err = np.abs(np.asarray(back).reshape(-1) - np.asarray(w).reshape(-1))
    assert np.all(err <= absmax * gaps + 1e-6)


def test_nf4_exact_codes():
    # values exactly on table entries, scaled by blockwise absmax,
    # roundtrip exactly
    vals = NF4_TABLE[np.arange(64) % 16] * 3.5
    w = jnp.asarray(vals.reshape(1, 64), jnp.float32)
    qd = nf4_quantize(w, block=64)
    back = np.asarray(nf4_dequantize(qd)).reshape(-1)
    np.testing.assert_allclose(back, vals, atol=1e-6)


@pytest.mark.slow
def test_quantize_llama_params_bits4(rng):
    from groma_tpu.config import LlamaConfig
    from groma_tpu.models.llama import LlamaForCausalLM
    from groma_tpu.models.llama_quant import (quant_llama_forward,
                                              quantize_llama_params)
    import jax
    cfg = LlamaConfig(vocab_size=128, hidden_size=1024,
                      intermediate_size=1024, num_layers=1, num_heads=8,
                      num_kv_heads=8, dtype='float32')
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(rng.integers(0, 128, (1, 6)))
    params = model.init(jax.random.PRNGKey(0), ids)['params']
    qp = quantize_llama_params(
        {'model': params['model'], 'embed_tokens': params['embed_tokens'],
         'lm_head': params['lm_head']}, cfg, bits=4)
    assert qp['layers'][0]['qkv_proj']['q'].dtype == jnp.uint8
    emb = qp['embed_tokens'][ids].astype(jnp.float32)
    pos = jnp.arange(6)[None]
    h4, _ = quant_llama_forward(qp, cfg, emb, jnp.ones((1, 6), bool), pos)
    want, _ = model.apply({'params': params}, ids)
    # int4 is lossy; just require same scale and finite agreement trend
    assert np.isfinite(np.asarray(h4)).all()


def test_bnb_nf4_state_dict_import(rng):
    """Import smoke against a synthetic bitsandbytes state_dict fixture:
    a Linear4bit-serialized weight (packed codes + absmax + quant_map +
    json quant_state blob, bnb 0.43 layout) round-trips through
    import_bnb_nf4_weight to the codec's own dequantization and to the
    original weight within blockwise-nf4 error."""
    import json as _json
    from groma_tpu.checkpoint.hf_import import (import_bnb_nf4_weight,
                                                is_bnb_nf4)
    from groma_tpu.ops.quant4 import NF4_TABLE

    w = rng.standard_normal((32, 64)).astype(np.float32)
    qd = nf4_quantize(jnp.asarray(w), block=64)
    meta = _json.dumps({'shape': [32, 64], 'blocksize': 64,
                        'dtype': 'float32',
                        'quant_type': 'nf4'}).encode()
    sd = {
        # bnb serializes the packed codes as an (numel/2, 1) uint8 tensor
        'llm.layers.0.q_proj.weight': np.asarray(qd['codes']).reshape(-1, 1),
        'llm.layers.0.q_proj.weight.absmax': np.asarray(qd['absmax']),
        'llm.layers.0.q_proj.weight.quant_map': NF4_TABLE.copy(),
        'llm.layers.0.q_proj.weight.quant_state.bitsandbytes__nf4':
            np.frombuffer(meta, np.uint8),
    }
    name = 'llm.layers.0.q_proj.weight'
    assert is_bnb_nf4(sd, name)
    assert not is_bnb_nf4(sd, 'llm.layers.0.k_proj.weight')
    got = import_bnb_nf4_weight(sd, name)          # shape from quant_state
    want = np.asarray(nf4_dequantize(qd))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # nf4 block-64 error bound vs the original
    err = np.abs(got - w).max()
    assert err < np.abs(w).max() * 0.2
    # explicit-shape path agrees
    got2 = import_bnb_nf4_weight(sd, name, shape=(32, 64))
    np.testing.assert_allclose(got2, want, atol=1e-6)
    # double-quant layout is rejected, not silently mis-read
    sd['llm.layers.0.q_proj.weight.nested_absmax'] = np.zeros(2, np.float32)
    with pytest.raises(NotImplementedError):
        import_bnb_nf4_weight(sd, name)
