"""All-layer decode megakernel vs the per-layer quantized path.

The megakernel re-implements the full decode step (rms/rope/int4
matmuls/int8-KV attention) inside one pallas_call; these tests pin it
against quant_llama_forward's cached decode branch on the Pallas
interpreter (CPU), including the in-place cache update.

Tolerance note: on CPU the per-layer path routes int4 matmuls through
int4_matmul's fp32-dequant fallback (ops/quant4.py:145), while the
megakernel always runs the TPU kernel algebra (bf16 input planes +
per-block xsum fold).  bf16 input rounding (~0.4% relative) shifts
values quantized near 127 LSBs by up to ~0.5 LSB, so freshly written
int8 cache bytes may differ by +-1 with scales agreeing to ~1e-4.
The pins here are: cache within +-1 LSB, scales tight, hidden state
bounded in max/mean, untouched cache tail exactly zero.  Bit-level
agreement of the shared algebra is validated on real TPU by
scripts/device_validate.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import LlamaForCausalLM
from groma_tpu.models.llama_quant import (make_quant_kv_cache,
                                          quant_llama_forward,
                                          quantize_llama_params)
from groma_tpu.ops import decode_megakernel as mk

CFG = LlamaConfig(vocab_size=128, hidden_size=256, intermediate_size=512,
                  num_layers=2, num_heads=2, num_kv_heads=2,
                  dtype='float32')
B, PRE, MAXLEN = 8, 12, 256


@pytest.fixture(scope='module')
def setup():
    rng = np.random.default_rng(0)
    model = LlamaForCausalLM(CFG)
    ids = jnp.asarray(rng.integers(0, CFG.vocab_size, (B, PRE)))
    params = model.init(jax.random.PRNGKey(0), ids)['params']
    qp = quantize_llama_params(params, CFG, bits=4)
    emb = jnp.asarray(rng.standard_normal((B, PRE, CFG.hidden_size))
                      * 0.05, jnp.float32)
    cache = make_quant_kv_cache(CFG, B, MAXLEN)
    h, cache = quant_llama_forward(
        qp, CFG, emb, jnp.ones((B, PRE), bool),
        jnp.broadcast_to(jnp.arange(PRE)[None], (B, PRE)), cache)
    return qp, cache


def _ref_step(qp, emb, cache):
    pos = jnp.full((B, 1), cache['index'], jnp.int32)
    return quant_llama_forward(qp, CFG, emb, jnp.ones((B, 1), bool),
                               pos, cache)


def test_fused_step_matches_per_layer(setup):
    qp, cache0 = setup
    sp = mk.stack_decode_params(qp)
    stacked = mk.stack_kv_cache(cache0)
    cache = cache0
    rng = np.random.default_rng(1)
    for step in range(3):
        emb = jnp.asarray(rng.standard_normal((B, 1, CFG.hidden_size))
                          * 0.05, jnp.float32)
        want, cache = _ref_step(qp, emb, cache)

        from groma_tpu.models.llama_quant import \
            quant_llama_decode_megakernel
        index = stacked['index']
        kv_mask = jax.lax.dynamic_update_slice(
            stacked['mask'], jnp.ones((B, 1), bool), (0, index))
        kj = jax.lax.broadcasted_iota(jnp.int32, (1, MAXLEN), 1)[0]
        mask_bias = jnp.where((kj < index)[None] & stacked['mask'], 0.0,
                              jnp.float32(-1e30))
        cur_bias = jnp.zeros((B, 1), jnp.float32)
        from groma_tpu.models.llama import rope_tables, rms_norm
        hd = CFG.hidden_size // CFG.num_heads
        cos, sin = rope_tables(jnp.full((B, 1), index, jnp.int32), hd,
                               CFG.rope_theta)
        x, k8, ks, v8, vs = mk.fused_decode_step(
            sp, emb[:, 0], stacked['k'], stacked['k_scale'],
            stacked['v'], stacked['v_scale'], mask_bias, cur_bias,
            cos[:, 0], sin[:, 0], index, eps=CFG.rms_norm_eps,
            interpret=True)
        got = rms_norm(x[:, None, :], qp['norm'], CFG.rms_norm_eps)
        stacked = {'k': k8, 'k_scale': ks, 'v': v8, 'v_scale': vs,
                   'mask': kv_mask, 'index': index + 1}

        d = np.abs(np.asarray(got) - np.asarray(want))
        assert d.max() < 0.15 and d.mean() < 0.02, (d.max(), d.mean())
        assert (d > 0.05).mean() < 0.01
        # freshly written cache column: compare DEQUANTIZED k/v (the
        # int8 bytes and scales each shift with the bf16-vs-fp32 matmul
        # input difference, see module docstring; q*scale is the
        # path-independent quantity)
        for li in range(CFG.num_layers):
            for qn, sn, cq, cs in (
                    ('k', 'k_scale', k8, ks), ('v', 'v_scale', v8, vs)):
                # stacked scales are (L, H, B, S) -> transpose to (B, H)
                got_dq = (np.asarray(cq[li, :, :, PRE + step, :],
                                     np.float32)
                          * np.asarray(cs[li, :, :, PRE + step]).T[..., None])
                ref_dq = (np.asarray(cache[qn][li][:, :, PRE + step, :],
                                     np.float32)
                          * np.asarray(cache[sn][li][:, :, PRE + step])
                          [..., None])
                tol = 0.03 * max(np.abs(ref_dq).max(), 1e-6)
                np.testing.assert_allclose(got_dq, ref_dq, atol=tol)
        # untouched tail of the cache stays zero (aliased update is
        # surgical, not a rebuild)
        assert not np.asarray(k8[:, :, :, PRE + step + 1:, :]).any()


def test_wrapper_matches_per_layer(setup):
    """quant_llama_decode_megakernel end-to-end (mask/rope/final norm
    built inside) against the reference step, multi-step."""
    from groma_tpu.models.llama_quant import \
        quant_llama_decode_megakernel
    qp, cache0 = setup
    sp = mk.stack_decode_params(qp)
    stacked = mk.stack_kv_cache(cache0)
    cache = cache0
    rng = np.random.default_rng(2)
    # interpret mode: monkeypatch the TPU gate inside fused_decode_step
    import groma_tpu.ops.decode_megakernel as mkm
    orig = mkm.fused_decode_step

    def interp_step(*a, **kw):
        kw['interpret'] = True
        return orig(*a, **kw)

    mkm.fused_decode_step = interp_step
    try:
        import groma_tpu.models.llama_quant as lq
        for _ in range(2):
            emb = jnp.asarray(
                rng.standard_normal((B, 1, CFG.hidden_size)) * 0.05,
                jnp.float32)
            want, cache = _ref_step(qp, emb, cache)
            got, stacked = lq.quant_llama_decode_megakernel(
                qp, sp, CFG, emb, jnp.ones((B, 1), bool), stacked)
            d = np.abs(np.asarray(got) - np.asarray(want))
            assert d.max() < 0.15 and d.mean() < 0.02, (d.max(), d.mean())
            assert int(stacked['index']) == int(cache['index'])
    finally:
        mkm.fused_decode_step = orig
