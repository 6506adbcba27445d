"""Paged single-token decode attention over an int8 KV page pool (Pallas).

vLLM-style paged KV for the serving engine (serve/engine.py paged mode):
instead of one contiguous (B, H, max_len, D) cache per slot, all slots
share a global pool of fixed 128-token PAGES and each slot owns an
ordered page list.  Slots then consume HBM proportional to their actual
stream length, so the engine can seat many more concurrent requests than
``max_slots x max_len`` contiguous buffers would allow on 16 GB.

This replaces the reference's one-request-at-a-time worker semantics
(reference: groma/serve/model_worker.py:63,186 — semaphore-serialized)
with TPU-native block-indirect attention; there is no CUDA counterpart
to port, the kernel is original to this framework.

Design (TPU-first):
* pool layout (P, H, page, D) int8 + (P, H, page) f32 scales — one pool
  block = one page with ALL heads resident (512 KB at 7B shapes), so the
  grid is (B, num_pages) and heads loop inside the kernel exactly like
  ops/decode_attention.py.
* the page table is a SCALAR-PREFETCH argument: the BlockSpec index_map
  reads ``table[b, p]`` to aim each page DMA — block-indirect gather
  with zero host involvement.
* online softmax across the page grid dimension (running m / l / acc in
  VMEM scratch, output written once on the last page) — the flash
  recipe applied across pages instead of across key blocks.
* UNUSED page slots in the table must REPEAT the slot's last used page
  id: consecutive grid steps with an identical block index skip the DMA
  (Mosaic revisiting), so padded table tails cost no bandwidth; their
  scores are masked by ``lengths``.
* numerics: identical to ops/decode_attention.py — q quantized per
  (b, h), int8 x int8 MXU dots for both q.k and p.v, v-scale folded
  into p before its requantization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groma_tpu.ops.quant import _on_tpu

PAGE = 128
NEG = -1e30     # python float: a jnp scalar would be captured as a
                # pallas kernel constant (rejected by pallas_call)


def _kernel(table_ref, len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
            o_ref, acc_ref, m_ref, l_ref, *, heads: int, scale: float):
    b = pl.program_id(0)
    p = pl.program_id(1)
    np_ = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref[...])
        m_ref[...] = jnp.full_like(m_ref[...], NEG)
        l_ref[...] = jnp.zeros_like(l_ref[...])

    pos0 = p * PAGE
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, PAGE), 1) + pos0
    valid = idx < len_ref[b]                              # (1, PAGE)
    bias = jnp.where(valid, 0.0, NEG)

    # all heads as one (heads, .) batch — a python loop over heads issued
    # per-head (1, PAGE) VPU rows (1 of 8 sublanes live) and serial
    # per-head matvecs (see ops/decode_attention.py)
    q = q_ref[0, :, 0].astype(jnp.float32)                # (heads, D)
    amax = jnp.max(jnp.abs(q), axis=-1, keepdims=True)
    qs = jnp.where(amax > 0, amax / 127.0, 1.0)
    q8 = jnp.round(q / qs).astype(jnp.int8)
    s = jax.lax.dot_general(
        q8[:, None], k_ref[0], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]           # (heads, PAGE)
    s = s.astype(jnp.float32) * (qs * scale) * ks_ref[0] + bias

    m_old = m_ref[:, :1]                                  # (heads, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp(m_old - m_new)
    pv = jnp.exp(s - m_new)                               # (heads, PAGE)
    # scalar stores to VMEM are rejected by Mosaic: keep the running
    # stats lane-replicated and store full (heads, 128) planes
    l_ref[...] = jnp.broadcast_to(
        l_ref[:, :1] * corr + jnp.sum(pv, axis=-1, keepdims=True),
        l_ref.shape)
    m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    ps = pv * vs_ref[0]
    r = jnp.max(ps, axis=-1, keepdims=True)
    r = jnp.where(r > 0, r / 127.0, 1.0)
    p8 = jnp.round(ps / r).astype(jnp.int8)
    o = jax.lax.dot_general(
        p8[:, None], v_ref[0], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)[:, 0]           # (heads, D)
    acc_ref[...] = acc_ref[...] * corr + o.astype(jnp.float32) * r

    @pl.when(p == np_ - 1)
    def _done():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0, :, 0] = acc_ref[...] / l


def paged_attention_reference(q, kpool, ks, vpool, vs, table, lengths):
    """Pure-jnp reference: gather each slot's pages into a contiguous
    cache and run the exact int8 decode-attention chain (CPU tests and
    the off-TPU engine fallback)."""
    from groma_tpu.models.llama_quant import _int8_cache_attention
    b, np_ = table.shape
    # (B, NP, H, PAGE, D) -> (B, H, NP*PAGE, D)
    kg = kpool[table]
    vg = vpool[table]
    kq = kg.transpose(0, 2, 1, 3, 4).reshape(
        b, kg.shape[2], np_ * PAGE, kg.shape[-1])
    vq = vg.transpose(0, 2, 1, 3, 4).reshape(
        b, vg.shape[2], np_ * PAGE, vg.shape[-1])
    ksg = ks[table].transpose(0, 2, 1, 3).reshape(b, kg.shape[2], -1)
    vsg = vs[table].transpose(0, 2, 1, 3).reshape(b, vg.shape[2], -1)
    pos = jnp.arange(np_ * PAGE)[None, :]
    bias = jnp.where(pos < lengths[:, None], 0.0, NEG)[:, None, None, :]
    return _int8_cache_attention(q, kq, ksg, vq, vsg, bias)


@functools.partial(jax.jit, static_argnames=('interpret',))
def paged_int8_decode_attention(q, kpool, ks, vpool, vs, table, lengths,
                                interpret: bool | None = None):
    """q (B, H, 1, D); kpool/vpool (P, H, PAGE, D) int8; ks/vs
    (P, H, PAGE) f32; table (B, NP) int32 page ids (tails repeat the last
    used id); lengths (B,) int32 valid kv positions.  Returns
    (B, H, 1, D) f32.  D must be lane-aligned (128 | D)."""
    d = q.shape[3]
    if interpret is None:
        interpret = not _on_tpu()
    if interpret or d % 128:
        return paged_attention_reference(q, kpool, ks, vpool, vs,
                                         table, lengths)
    return _call_kernel(table, lengths, q, kpool, ks, vpool, vs,
                        interpret=False)


def _call_kernel(table, lengths, q, kpool, ks, vpool, vs,
                 interpret: bool = False):
    """The pallas_call itself; ``interpret=True`` runs the kernel body
    through the Pallas interpreter (CPU kernel-logic tests)."""
    b, h, one, d = q.shape
    assert one == 1
    np_ = table.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,                 # table, lengths
        grid=(b, np_),
        in_specs=[
            pl.BlockSpec((1, h, 1, d), lambda i, p, tbl, ln: (i, 0, 0, 0)),
            pl.BlockSpec((1, h, PAGE, d),
                         lambda i, p, tbl, ln: (tbl[i, p], 0, 0, 0)),
            pl.BlockSpec((1, h, PAGE),
                         lambda i, p, tbl, ln: (tbl[i, p], 0, 0)),
            pl.BlockSpec((1, h, PAGE, d),
                         lambda i, p, tbl, ln: (tbl[i, p], 0, 0, 0)),
            pl.BlockSpec((1, h, PAGE),
                         lambda i, p, tbl, ln: (tbl[i, p], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h, 1, d),
                               lambda i, p, tbl, ln: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, d), jnp.float32),       # acc
            pltpu.VMEM((h, 128), jnp.float32),     # running max (lane-rep)
            pltpu.VMEM((h, 128), jnp.float32),     # running denom
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, heads=h, scale=d ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, 1, d), jnp.float32),
        interpret=interpret,
    )(table, lengths, q.astype(jnp.float32), kpool, ks, vpool, vs)
    return out


def make_kv_page_pool(cfg, num_pages: int):
    """Per-layer int8 page pools (page 0 is the reserved TRASH page —
    prefill writes of unused page slots land there; the allocator never
    hands it out)."""
    hd = cfg.hidden_size // cfg.num_heads
    shape = (num_pages, cfg.num_kv_heads, PAGE, hd)
    nl = cfg.num_layers
    return {
        'k': [jnp.zeros(shape, jnp.int8) for _ in range(nl)],
        'v': [jnp.zeros(shape, jnp.int8) for _ in range(nl)],
        'k_scale': [jnp.zeros(shape[:-1], jnp.float32) for _ in range(nl)],
        'v_scale': [jnp.zeros(shape[:-1], jnp.float32) for _ in range(nl)],
    }


def insert_prefill_pages(pools: dict, one: dict, row: int,
                         page_ids: jnp.ndarray, valid=None):
    """Scatter row ``row`` of a contiguous int8 prefill cache (the
    engine's b>=1 prefill output: (B, H, S, D) leaves, 128 | S) into the
    page pools at ``page_ids`` ((S/PAGE,) int32; entries beyond the
    prompt's pages must be 0 = the trash page).

    ``valid`` ((S,) bool, optional) COMPACTS the stream first: the token
    surgery leaves interior pad gaps in the prefill cache (masked there
    via cache['mask']), but the paged kernel masks by LENGTH only — a
    stable partition moves the valid positions to the front, which is
    exact because rope positions are already compacted cumsum indices
    (cache slot i then holds rope position i), and it saves pages."""
    out = dict(pools)
    perm = None
    if valid is not None:
        perm = jnp.argsort(jnp.logical_not(valid), stable=True)

    def put(pool, leaf):
        x = jax.lax.dynamic_slice_in_dim(leaf, row, 1, axis=0)[0]
        if perm is not None:
            x = jnp.take(x, perm, axis=1)
        h, s = x.shape[0], x.shape[1]
        # (H, S, ...) -> (S/PAGE, H, PAGE, ...)
        x = x.reshape(h, s // PAGE, PAGE, *x.shape[2:]).swapaxes(0, 1)
        return pool.at[page_ids].set(x)

    out['k'] = [put(p, o) for p, o in zip(pools['k'], one['k'])]
    out['v'] = [put(p, o) for p, o in zip(pools['v'], one['v'])]
    out['k_scale'] = [put(p, o)
                      for p, o in zip(pools['k_scale'], one['k_scale'])]
    out['v_scale'] = [put(p, o)
                      for p, o in zip(pools['v_scale'], one['v_scale'])]
    return out
