"""Paged int8 decode attention (ops/paged_attention.py) vs the
contiguous-cache chain, and the paged decode forward vs the
vector-index engine decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.models.llama_quant import (_int8_cache_attention,
                                          _quantize_tokens)
from groma_tpu.ops.paged_attention import (PAGE, _call_kernel,
                                           insert_prefill_pages,
                                           make_kv_page_pool,
                                           paged_attention_reference,
                                           paged_int8_decode_attention)


def _mk_paged(rng, b=2, h=4, np_=3, d=128, pool_pages=16):
    """Random contiguous cache + an equivalent shuffled page pool."""
    s = np_ * PAGE
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k8, ks = _quantize_tokens(k)
    v8, vs = _quantize_tokens(v)
    # scatter each slot's pages at random distinct pool positions
    perm = rng.permutation(pool_pages - 1)[:b * np_] + 1   # skip trash 0
    table = np.asarray(perm, np.int32).reshape(b, np_)
    kpool = np.zeros((pool_pages, h, PAGE, d), np.int8)
    vpool = np.zeros((pool_pages, h, PAGE, d), np.int8)
    ksp = np.zeros((pool_pages, h, PAGE), np.float32)
    vsp = np.zeros((pool_pages, h, PAGE), np.float32)
    for i in range(b):
        for p in range(np_):
            sl = slice(p * PAGE, (p + 1) * PAGE)
            kpool[table[i, p]] = np.asarray(k8[i, :, sl, :])
            vpool[table[i, p]] = np.asarray(v8[i, :, sl, :])
            ksp[table[i, p]] = np.asarray(ks[i, :, sl])
            vsp[table[i, p]] = np.asarray(vs[i, :, sl])
    lengths = np.asarray(
        [s - rng.integers(0, PAGE), s - rng.integers(0, PAGE)][:b],
        np.int32)
    bias = np.zeros((b, 1, 1, s), np.float32)
    for i in range(b):
        bias[i, ..., lengths[i]:] = -1e30
    contig = (q, k8, ks, v8, vs, jnp.asarray(bias))
    paged = (q, jnp.asarray(kpool), jnp.asarray(ksp), jnp.asarray(vpool),
             jnp.asarray(vsp), jnp.asarray(table), jnp.asarray(lengths))
    return contig, paged


@pytest.mark.slow
def test_reference_matches_contiguous_chain(rng):
    contig, paged = _mk_paged(rng)
    want = np.asarray(_int8_cache_attention(*contig))
    got = np.asarray(paged_attention_reference(*paged))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_kernel_interpret_matches_reference(rng):
    """Kernel body (online softmax across pages, per-page p requant)
    through the Pallas interpreter."""
    contig, paged = _mk_paged(rng)
    want = np.asarray(_int8_cache_attention(*contig))
    q, kp, ks, vp, vs, table, lengths = paged
    got = np.asarray(_call_kernel(table, lengths, q, kp, ks, vp, vs,
                                  interpret=True))
    # per-page p-requantization (vs one whole-row requant) differs by
    # int8 rounding of p only
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_kernel_on_device(rng):
    """Real Mosaic lowering incl. scalar-prefetch block indirection
    (TPU only)."""
    if jax.devices()[0].platform != 'tpu':
        pytest.skip('needs TPU')
    contig, paged = _mk_paged(rng, h=8, np_=4, pool_pages=32)
    want = np.asarray(_int8_cache_attention(*contig))
    got = np.asarray(paged_int8_decode_attention(*paged,
                                                 interpret=False))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_insert_prefill_pages_roundtrip(rng):
    """Contiguous prefill leaves scattered to pages == hand slicing;
    unused page ids hit the trash page 0 only."""
    from groma_tpu.config import LlamaConfig
    cfg = LlamaConfig(num_layers=2, hidden_size=256, num_heads=2,
                      num_kv_heads=2, intermediate_size=64)
    b, s = 2, 2 * PAGE
    hd = cfg.hidden_size // cfg.num_heads
    one = {
        'k': [jnp.asarray(rng.integers(-127, 127, (b, 2, s, hd)), jnp.int8)
              for _ in range(2)],
        'v': [jnp.asarray(rng.integers(-127, 127, (b, 2, s, hd)), jnp.int8)
              for _ in range(2)],
        'k_scale': [jnp.asarray(rng.standard_normal((b, 2, s)),
                                jnp.float32) for _ in range(2)],
        'v_scale': [jnp.asarray(rng.standard_normal((b, 2, s)),
                                jnp.float32) for _ in range(2)],
    }
    pools = make_kv_page_pool(cfg, num_pages=8)
    ids = jnp.asarray([3, 5], jnp.int32)
    pools = insert_prefill_pages(pools, one, row=1, page_ids=ids)
    got = np.asarray(pools['k'][0][3])                  # (H, PAGE, D)
    want = np.asarray(one['k'][0][1, :, :PAGE, :])
    np.testing.assert_array_equal(got, want)
    got = np.asarray(pools['v'][1][5])
    want = np.asarray(one['v'][1][1, :, PAGE:, :])
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(np.asarray(pools['k'][0][1]), 0)


@pytest.mark.slow
def test_paged_decode_matches_vector_index_decode(rng):
    """quant_llama_decode_paged == the engine's contiguous vector-index
    decode, token for token, on a tiny model."""
    from groma_tpu.config import LlamaConfig
    from groma_tpu.models.llama_quant import (make_quant_kv_cache,
                                              quant_llama_decode_paged,
                                              quant_llama_forward)
    from tests.test_llama_quant import _setup, CFG

    model, params, qp, _ = _setup(rng)
    cfg = CFG
    b = 2
    max_len = 2 * PAGE
    # contiguous engine cache with per-row indices
    cache = make_quant_kv_cache(cfg, b, max_len)
    cache['index'] = jnp.asarray([5, PAGE + 3], jnp.int32)  # ragged rows
    cache['mask'] = jnp.asarray(
        np.arange(max_len)[None, :] < np.asarray(cache['index'])[:, None])
    # fill the occupied prefix with random quantized kv
    hd = cfg.hidden_size // cfg.num_heads
    for i in range(cfg.num_layers):
        cache['k'][i] = jnp.asarray(
            rng.integers(-127, 127, cache['k'][i].shape), jnp.int8)
        cache['v'][i] = jnp.asarray(
            rng.integers(-127, 127, cache['v'][i].shape), jnp.int8)
        cache['k_scale'][i] = jnp.asarray(
            rng.standard_normal(cache['k_scale'][i].shape) * 0.01 + 0.02,
            jnp.float32)
        cache['v_scale'][i] = jnp.asarray(
            rng.standard_normal(cache['v_scale'][i].shape) * 0.01 + 0.02,
            jnp.float32)

    # equivalent page pool: slot 0 -> pages (1, 2), slot 1 -> (3, 4)
    pools = make_kv_page_pool(cfg, num_pages=6)
    table = np.asarray([[1, 1], [3, 4]], np.int32)  # tail repeats last
    for i in range(cfg.num_layers):
        for slot in range(b):
            pages = [1, 2] if slot == 0 else [3, 4]
            for p, pid in enumerate(pages):
                sl = slice(p * PAGE, (p + 1) * PAGE)
                pools['k'][i] = pools['k'][i].at[pid].set(
                    cache['k'][i][slot, :, sl, :])
                pools['v'][i] = pools['v'][i].at[pid].set(
                    cache['v'][i][slot, :, sl, :])
                pools['k_scale'][i] = pools['k_scale'][i].at[pid].set(
                    cache['k_scale'][i][slot, :, sl])
                pools['v_scale'][i] = pools['v_scale'][i].at[pid].set(
                    cache['v_scale'][i][slot, :, sl])
    # slot 0 uses only page 1 (len 5 < PAGE); its table tail repeats it
    table = jnp.asarray(table)

    emb = jnp.asarray(rng.standard_normal((b, 1, cfg.hidden_size)),
                      jnp.float32)
    pos = np.asarray(cache['index'])[:, None].astype(np.int32)
    h_want, _ = quant_llama_forward(
        qp, cfg, emb, jnp.ones((b, 1), bool), jnp.asarray(pos), cache)
    h_got, pools2 = quant_llama_decode_paged(
        qp, cfg, emb, jnp.asarray(pos), pools, table,
        jnp.asarray(pos[:, 0] + 1))
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_want),
                               atol=1e-4, rtol=1e-4)
    # the write landed at the right page/offset
    pid0 = int(table[0, 0])
    off0 = int(pos[0, 0])
    assert not np.array_equal(np.asarray(pools2['k'][0][pid0, :, off0, :]),
                              np.asarray(pools['k'][0][pid0, :, off0, :]))
