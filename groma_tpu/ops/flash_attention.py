"""Pallas flash attention (forward + backward) for TPU.

TPU-native replacement for the reference's external CUDA flash-attn package
(reference: groma/train/llama_flash_attn_monkey_patch.py:13-124).  Instead of
the reference's varlen-unpad path (flatten valid tokens, cu_seqlens), the
TPU design keeps static shapes and threads an explicit key-padding mask into
the kernel — padding slots simply never contribute, which also covers
Groma's mid-sequence pad slots from the fixed-capacity region stream.

Layout: (batch, num_heads, seq, head_dim); online-softmax tiling with
128x128 blocks (MXU-native); fp32 accumulators; log-sum-exp saved for the
backward.  Backward is the standard two-kernel split: one pass accumulates
dk/dv per kv block, one accumulates dq per q block.

Used by both the LLaMA decoder (causal) and the ViT/DDETR encoders
(bidirectional) at training time; single-token decode uses the plain XLA
dot-product path in models/llama.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK = 128
NEG_INF = -1e30


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == 'tpu'
    except Exception:
        return False


# ---------------------------------------------------------------- reference

def mha_reference(q, k, v, kv_mask=None, causal=False, scale=None):
    """Plain jnp attention — the golden reference for kernel tests
    (the analogue of mmcv's CUDA-vs-pure-PyTorch comparisons,
    reference: mmcv/tests/test_ops/test_ms_deformable_attn.py:54+)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]
    scale = (d ** -0.5) if scale is None else scale
    s = jnp.einsum('bhqd,bhkd->bhqk', q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :], s, NEG_INF)
    if causal:
        qi = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (sq, skv), 1)
        s = jnp.where((kj <= qi + (skv - sq))[None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # rows with no valid key: output zero (fully-masked guard)
    denom_ok = jnp.max(s, axis=-1, keepdims=True) > NEG_INF / 2
    p = jnp.where(denom_ok, p, 0.0)
    return jnp.einsum('bhqk,bhkd->bhqd', p, v.astype(jnp.float32)).astype(q.dtype)


# ------------------------------------------------- forward (single kv block)

def _fwd_wholekv_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref=None,
                        *, scale, block_q, seq_kv, skv_p, need_lse):
    """Encoder-shape forward: the whole kv range lives in one block, heads
    are batched into the leading block dim.

    The tiled online-softmax kernel is overhead-bound at ViT shapes
    (d=64, s~1k: ~0.2us of MXU work per grid step vs ~3us of step
    overhead).  Holding all keys in VMEM removes the running-max/sum
    corrections entirely and batching heads amortizes the grid overhead;
    k arrives pre-transposed as (hb, d, skv_p) so both dots contract
    MXU-naturally (lhs last dim x rhs first dim) — no in-kernel relayout.

    Masking is one broadcast select on the score block, no iota pass:
    the per-batch kv validity row rides in as a (1, skv_p) block and
    invalid/pad columns are pushed to NEG_INF BEFORE the row max, which
    keeps the softmax exact for every input regime.  (Two cheaper
    variants both proved wrong: subtracting invalid_count*exp(-m) from
    the denominator cancels catastrophically in f32 once every valid
    score sits ~15 below the pad-pinned max; keying the select off
    s == 0.0 misfires on legitimate zero scores — DINOv2's zero-init
    CLS token yields exactly-zero q/k rows at init.)"""
    q = q_ref[0]                                     # (hb, bq, d)
    kt = k_ref[0]                                    # (hb, d, skv_p)
    s = jax.lax.dot_general(
        q, kt, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # (hb, bq, skv_p)
    kvm = mask_ref[0] != 0                           # (1, skv_p)
    s = jnp.where(kvm[None], s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    # pads: exp(NEG_INF - m) == 0 exactly (m == NEG_INF only when the
    # whole row is masked, where p=1 everywhere but v is zeroed -> o=0)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    safe_l = jnp.where(l > 1e-20, l, 1.0)
    v = v_ref[0]
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    row_dead = m <= NEG_INF / 2                      # (hb, bq, 1)
    o_ref[0] = jnp.where(row_dead, 0.0, o / safe_l).astype(o_ref.dtype)
    if need_lse:
        lse = jnp.where(row_dead | (l <= 1e-20), NEG_INF,
                        m + jnp.log(safe_l))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref[0].shape)


def _fwd_wholekv(q, k, v, kv_mask, scale, block_q, interpret,
                 need_lse=True):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    # padding-minimal q block: same number of q chunks as block 256 would
    # give, but sized to the sequence (1025 -> 5 x 208 pads 1.5%, vs
    # 5 x 256 padding 25%; measured 0.84 vs 1.10 ms at DINOv2@448 b8)
    nq_chunks = pl.cdiv(sq, min(block_q, 256) * 2)
    block_q = min(pl.cdiv(sq, nq_chunks * 8) * 8, 256)
    sq_p = pl.cdiv(sq, block_q) * block_q
    skv_p = pl.cdiv(skv, 128) * 128
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    # masking happens in-kernel on the score block; tail pad columns are
    # marked invalid through the padded mask row (zeros)
    ktp = jnp.pad(k.transpose(0, 1, 3, 2),
                  ((0, 0), (0, 0), (0, 0), (0, skv_p - skv)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    maskp = jnp.pad(kv_mask.astype(jnp.int32),
                    ((0, 0), (0, skv_p - skv)))[:, None, :]  # (b,1,skv_p)

    # heads per block: amortize grid-step overhead, cap the fp32 score
    # block (hb * block_q * skv_p * 4B) at ~4 MB of VMEM
    hb = 1
    for cand in (2, 4, 8, 16):
        if h % cand == 0 and cand * block_q * skv_p * 4 <= 4 * 2 ** 20:
            hb = cand
    nq = sq_p // block_q

    kernel = functools.partial(
        _fwd_wholekv_kernel, scale=scale, block_q=block_q, seq_kv=skv,
        skv_p=skv_p, need_lse=need_lse)
    out_specs = [pl.BlockSpec((1, hb, block_q, d),
                              lambda ib, ih, iq: (ib, ih, iq, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype)]
    if need_lse:
        out_specs.append(pl.BlockSpec((1, hb, block_q, 128),
                                      lambda ib, ih, iq: (ib, ih, iq, 0)))
        out_shape.append(jax.ShapeDtypeStruct((b, h, sq_p, 128),
                                              jnp.float32))
    res = pl.pallas_call(
        kernel,
        grid=(b, h // hb, nq),
        in_specs=[
            pl.BlockSpec((1, hb, block_q, d),
                         lambda ib, ih, iq: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hb, d, skv_p),
                         lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, hb, skv_p, d),
                         lambda ib, ih, iq: (ib, ih, 0, 0)),
            pl.BlockSpec((1, 1, skv_p),
                         lambda ib, ih, iq: (ib, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(qp, ktp, vp, maskp)

    out = res[0][:, :, :sq]
    lse = res[1][:, :, :sq, 0] if need_lse else None
    return out, lse


# maximum kv length for the whole-kv encoder kernel (k/v/score VMEM fit)
WHOLEKV_MAX_SKV = 4096


# ------------------------------------------------ causal packed grids

def _causal_pairs(nq, nk, block_q, block_k, seq_q, seq_kv,
                  kv_major=False):
    """Enumerate the LIVE (iq, ik) causal block pairs.

    A rectangular (nq, nk) grid pays full grid-step overhead AND the
    k/v block DMAs for every dead above-diagonal block — `pl.when` only
    skips compute.  Packing the live pairs into a 1-D grid indexed
    through scalar-prefetch tables removes ~(1 - (nq+1)/2nq) of the
    steps outright (s=2048 @ 512^2 blocks: 16 -> 10 pairs).

    Returns int32 arrays (iq_t, ik_t, first_t, last_t) where first/last
    flag the first/last pair of each OUTPUT block's visit run —
    kv-major order (dk/dv kernel) groups by ik, q-major by iq."""
    off = seq_kv - seq_q
    rows = []
    for iq in range(nq):
        q_end = iq * block_q + (block_q - 1) + off
        live = [ik for ik in range(nk) if ik * block_k <= q_end]
        if not live:
            live = [0]     # fully-padded q tail: keep the output written
        rows.append(live)
    pairs = []
    if kv_major:
        for ik in range(nk):
            qs = [iq for iq in range(nq) if ik in rows[iq]]
            if not qs:
                qs = [nq - 1]
            for p, iq in enumerate(qs):
                pairs.append((iq, ik, p == 0, p == len(qs) - 1))
    else:
        for iq in range(nq):
            for p, ik in enumerate(rows[iq]):
                pairs.append((iq, ik, p == 0, p == len(rows[iq]) - 1))
    arr = np.array(pairs, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]


# ---------------------------------------------------------------- forward

def _fwd_kernel(*refs, scale, causal, block_q, block_k,
                num_kv_blocks, seq_q, seq_kv, hb, packed):
    """Tiled online-softmax forward with `hb` heads batched per block.

    One batch-head per grid step (hb=1) starves the MXU and is
    grid-overhead-bound below ~2k tokens: at b8/h32/s768/d128 the hb=1
    kernel ran 5.98 ms/layer while plain XLA dense attention ran 2.11
    (benchmarks/exp_flash_768.py).  Batching heads into the block —
    the same trick as the whole-kv encoder kernel above — cuts grid
    steps by hb and feeds the MXU hb-batched (block_q x d) @ (d x
    block_k) dots.

    ``packed=True`` (causal): the grid is the 1-D list of LIVE causal
    block pairs (see _causal_pairs); iq/ik come from scalar-prefetch
    tables and every step does real work."""
    if packed:
        (iq_t, ik_t, first_t, last_t,
         q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
         acc, m_scr, l_scr) = refs
        j = pl.program_id(2)
        iq, ik = iq_t[j], ik_t[j]
        is_first, is_last = first_t[j] == 1, last_t[j] == 1
    else:
        (q_ref, k_ref, v_ref, mask_ref, o_ref, lse_ref,
         acc, m_scr, l_scr) = refs
        ik = pl.program_id(3)
        iq = pl.program_id(2)
        is_first = ik == 0
        is_last = ik == num_kv_blocks - 1

    @pl.when(is_first)
    def _init():
        acc[:] = jnp.zeros_like(acc)
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)

    # causal block skipping: a kv block strictly above the diagonal of
    # this q block is fully masked — skip all its compute (packed grids
    # contain no dead pairs, so block_live folds to True there)
    if causal:
        q_end = iq * block_q + (block_q - 1) + (seq_kv - seq_q)
        block_live = True if packed else (ik * block_k <= q_end)
        # blocks strictly below the diagonal of the FIRST row of this q
        # block need no causal masking at all
        q_start = iq * block_q + (seq_kv - seq_q)
        crosses_diag = ik * block_k + (block_k - 1) > q_start
    else:
        block_live = True
        crosses_diag = False

    # interior fast path: no causal crossing, no kv tail, and every kv
    # slot valid — skip ALL the iota/compare/where VPU work (most blocks
    # at training shapes; the masked path runs only on boundary blocks)
    kv_valid = mask_ref[0, 0] != 0                      # (block_k,)
    in_tail = ik * block_k + block_k > seq_kv
    all_valid = jnp.all(kv_valid) & jnp.logical_not(in_tail) \
        & jnp.logical_not(crosses_diag)

    def _update(s, p_valid=None):
        """Online-softmax update with scores s (hb, bq, bk)."""
        m_prev = m_scr[:, :, :1]                        # (hb, block_q, 1)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        if p_valid is not None:
            p = jnp.where(p_valid, p, 0.0)
        corr = jnp.exp(m_prev - m_new)
        l_new = l_scr[:, :, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0]                                    # (hb, block_k, d)
        acc[:] = acc[:] * corr + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    def _scores():
        # feed the MXU in the input dtype (bf16 matmul + fp32 accumulate
        # when the model is bf16 — 4x the fp32 MXU rate; fp32 models keep
        # full-precision matmuls)
        return jax.lax.dot_general(
            q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (hb, bq, bk)

    @pl.when(block_live & all_valid)
    def _compute_fast():
        _update(_scores())

    @pl.when(block_live & jnp.logical_not(all_valid))
    def _compute_masked():
        s = _scores()
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = kv_valid[None, :] & (col + ik * block_k < seq_kv)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            qpos = row + iq * block_q + (seq_kv - seq_q)
            valid = valid & (col + ik * block_k <= qpos)
        valid = jnp.broadcast_to(valid[None], s.shape)
        s = jnp.where(valid, s, NEG_INF)
        _update(s, p_valid=valid)

    @pl.when(is_last)
    def _finalize():
        l = l_scr[:, :, :1]
        safe_l = jnp.where(l > 0.0, l, 1.0)
        o_ref[0] = (acc[:] / safe_l).astype(o_ref.dtype)
        lse = jnp.where(l > 0.0, m_scr[:, :, :1] + jnp.log(safe_l), NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref[0].shape)


def _pick_hb(h, block_q, block_k, d, extra_io=0, budget=12 * 2 ** 20):
    """Heads per block: largest divisor of h whose whole kernel instance
    fits the ~16 MB scoped-VMEM limit with margin.

    The estimate is calibrated against Mosaic's actual scoped allocation
    (hb=16 at 128x128/d128 allocates 20.27 MB — the fp32 score block is
    NOT the dominant term; double-buffered in/out DMA blocks and the
    fp32 scratch are of the same order).  Terms per head: score-block
    temporaries (~2 fp32 copies), double-buffered q/k/v (+extra bwd
    streams via extra_io) blocks, lane-replicated fp32 stats."""
    per_head = (8 * block_q * block_k
                + 12 * (block_q + 2 * block_k + extra_io) * d
                + 16 * block_q * 128)
    hb = 1
    for cand in (2, 4, 8, 16):
        if h % cand == 0 and cand * per_head <= budget:
            hb = cand
    return hb


def _fwd(q, k, v, kv_mask, causal, scale, block_q, block_k, interpret,
         need_lse=True):
    b, h, sq, d = q.shape
    skv = k.shape[2]
    if not causal and skv <= WHOLEKV_MAX_SKV:
        return _fwd_wholekv(q, k, v, kv_mask, scale, min(block_q, 256),
                            interpret, need_lse=need_lse)
    sq_p = pl.cdiv(sq, block_q) * block_q
    skv_p = pl.cdiv(skv, block_k) * block_k
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, skv_p - skv), (0, 0)))
    maskp = jnp.pad(kv_mask, ((0, 0), (0, skv_p - skv)))
    maskp = maskp.astype(jnp.int32)[:, None, :]

    nq = sq_p // block_q
    nk = skv_p // block_k
    hb = _pick_hb(h, block_q, block_k, d)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_kv_blocks=nk, seq_q=sq, seq_kv=skv, hb=hb,
        packed=causal)

    out_shape = [
        jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype),
        jax.ShapeDtypeStruct((b, h, sq_p, 128), jnp.float32),
    ]
    scratch_shapes = [
        pltpu.VMEM((hb, block_q, d), jnp.float32),
        pltpu.VMEM((hb, block_q, 128), jnp.float32),
        pltpu.VMEM((hb, block_q, 128), jnp.float32),
    ]
    if causal:
        # live-pair packed grid: dead above-diagonal blocks never get a
        # grid step (nor their k/v DMAs) — ~37% fewer steps at s=2048
        iq_t, ik_t, fi_t, la_t = _causal_pairs(nq, nk, block_q, block_k,
                                               sq, skv)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h // hb, len(iq_t)),
            in_specs=[
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, ik[j], 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, ik[j], 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, 0, ik[j])),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
                pl.BlockSpec((1, hb, block_q, 128),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
            ],
            scratch_shapes=scratch_shapes,
        )
        out, lse = pl.pallas_call(
            kernel, grid_spec=grid_spec, out_shape=out_shape,
            interpret=interpret,
        )(jnp.asarray(iq_t), jnp.asarray(ik_t), jnp.asarray(fi_t),
          jnp.asarray(la_t), qp, kp, vp, maskp)
    else:
        out, lse = pl.pallas_call(
            kernel,
            grid=(b, h // hb, nq, nk),
            in_specs=[
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda ib, ih, iq, ik: (ib, 0, ik)),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
                pl.BlockSpec((1, hb, block_q, 128),
                             lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            ],
            out_shape=out_shape,
            scratch_shapes=scratch_shapes,
            interpret=interpret,
        )(qp, kp, vp, maskp)

    out = out[:, :, :sq]
    lse = lse[:, :, :sq, 0]
    return out, lse


# ---------------------------------------------------------------- backward

def _bwd_dkv_kernel(*refs, scale, causal, block_q, block_k,
                    num_q_blocks, seq_q, seq_kv, hb, packed):
    # rectangular grid only: the causal path routes through the fused
    # single-pass kernel above (packed kv-major live pairs)
    assert not packed
    (q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
     dk_ref, dv_ref, dk_acc, dv_acc) = refs
    iq = pl.program_id(3)
    ik = pl.program_id(2)
    is_first = iq == 0
    is_last = iq == num_q_blocks - 1

    @pl.when(is_first)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    if causal:
        q_end = iq * block_q + (block_q - 1) + (seq_kv - seq_q)
        block_live = True if packed else (ik * block_k <= q_end)
        q_start = iq * block_q + (seq_kv - seq_q)
        crosses_diag = ik * block_k + (block_k - 1) > q_start
    else:
        block_live = True
        crosses_diag = False

    kv_valid = mask_ref[0, 0] != 0
    kv_tail = ik * block_k + block_k > seq_kv
    q_tail = iq * block_q + block_q > seq_q
    all_valid = jnp.all(kv_valid) & jnp.logical_not(kv_tail) \
        & jnp.logical_not(q_tail) & jnp.logical_not(crosses_diag)

    def _accumulate(p):
        # p: (hb, block_q, block_k)
        do = do_ref[0]                                  # (hb, block_q, d)
        delta = delta_ref[0][:, :, :1]                  # (hb, block_q, 1)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (hb, block_k, d)
        dp = jax.lax.dot_general(do, v_ref[0], (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(q_ref.dtype)
        dk_acc[:] += jax.lax.dot_general(
            ds, q_ref[0], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (hb, block_k, d)

    def _scores():
        return jax.lax.dot_general(
            q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (hb, bq, bk)

    @pl.when(block_live & all_valid)
    def _compute_fast():
        _accumulate(jnp.exp(_scores() - lse_ref[0][:, :, :1]))

    @pl.when(block_live & jnp.logical_not(all_valid))
    def _compute_masked():
        s = _scores()
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = kv_valid[None, :] & (col + ik * block_k < seq_kv)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        qpos = row + iq * block_q
        valid = valid & (qpos < seq_q)
        if causal:
            valid = valid & (col + ik * block_k <= qpos + (seq_kv - seq_q))
        _accumulate(jnp.where(valid[None],
                              jnp.exp(s - lse_ref[0][:, :, :1]), 0.0))

    @pl.when(is_last)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_fused_kernel(*refs, scale, causal, block_q, block_k,
                      seq_q, seq_kv, hb, num_q_blocks):
    """Single-pass backward over the PACKED kv-major causal grid:
    dk/dv accumulate in VMEM per kv block (as _bwd_dkv_kernel) and dq
    accumulates in a FULL-SEQUENCE f32 VMEM scratch — one score
    recompute and one q/k/v/do/stats stream instead of two, at half the
    grid steps of the two-kernel split.

    dq bookkeeping: under causal masking every q block is live at
    ik == 0, which seeds its scratch slice; the DIAGONAL visit
    ((ik+1)*block_k > q_end) is each q block's last contribution in
    kv-major order and writes the output block exactly once — no
    revisited output blocks, no aliasing races against Mosaic's input
    prefetch."""
    (iq_t, ik_t, first_t, last_t,
     q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
     dk_ref, dv_ref, dq_ref, dk_acc, dv_acc, dq_scr) = refs
    j = pl.program_id(2)
    iq, ik = iq_t[j], ik_t[j]
    is_first, is_last = first_t[j] == 1, last_t[j] == 1

    @pl.when(is_first)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_end = iq * block_q + (block_q - 1) + (seq_kv - seq_q)
    q_start = iq * block_q + (seq_kv - seq_q)
    crosses_diag = ik * block_k + (block_k - 1) > q_start
    is_diag = (ik + 1) * block_k > q_end       # last kv block of this iq

    kv_valid = mask_ref[0, 0] != 0
    kv_tail = ik * block_k + block_k > seq_kv
    q_tail = iq * block_q + block_q > seq_q
    all_valid = jnp.all(kv_valid) & jnp.logical_not(kv_tail) \
        & jnp.logical_not(q_tail) & jnp.logical_not(crosses_diag)

    def _accumulate(p):
        # p: (hb, block_q, block_k) — pad rows/cols already zeroed
        do = do_ref[0]                                  # (hb, block_q, d)
        delta = delta_ref[0][:, :, :1]                  # (hb, block_q, 1)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (hb, block_k, d)
        dp = jax.lax.dot_general(do, v_ref[0], (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(q_ref.dtype)
        dk_acc[:] += jax.lax.dot_general(
            ds, q_ref[0], (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (hb, block_k, d)
        dq_blk = jax.lax.dot_general(
            ds, k_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (hb, block_q, d)
        sl = pl.ds(pl.multiple_of(iq * block_q, block_q), block_q)
        prev = jnp.where(ik == 0, jnp.zeros_like(dq_blk), dq_scr[:, sl, :])
        val = prev + dq_blk
        dq_scr[:, sl, :] = val

        @pl.when(is_diag)
        def _emit_dq():
            dq_ref[0] = val.astype(dq_ref.dtype)

    def _scores():
        return jax.lax.dot_general(
            q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # (hb, bq, bk)

    @pl.when(all_valid)
    def _compute_fast():
        _accumulate(jnp.exp(_scores() - lse_ref[0][:, :, :1]))

    @pl.when(jnp.logical_not(all_valid))
    def _compute_masked():
        s = _scores()
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = kv_valid[None, :] & (col + ik * block_k < seq_kv)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        qpos = row + iq * block_q
        valid = valid & (qpos < seq_q)
        valid = valid & (col + ik * block_k <= qpos + (seq_kv - seq_q))
        _accumulate(jnp.where(valid[None],
                              jnp.exp(s - lse_ref[0][:, :, :1]), 0.0))

    @pl.when(is_last)
    def _finalize():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(*refs, scale, causal, block_q, block_k,
                   num_kv_blocks, seq_q, seq_kv, hb, packed):
    # rectangular grid only (see _bwd_dkv_kernel note)
    assert not packed
    (q_ref, k_ref, v_ref, mask_ref, do_ref, lse_ref, delta_ref,
     dq_ref, dq_acc) = refs
    ik = pl.program_id(3)
    iq = pl.program_id(2)
    is_first = ik == 0
    is_last = ik == num_kv_blocks - 1

    @pl.when(is_first)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    if causal:
        q_end = iq * block_q + (block_q - 1) + (seq_kv - seq_q)
        block_live = True if packed else (ik * block_k <= q_end)
        q_start = iq * block_q + (seq_kv - seq_q)
        crosses_diag = ik * block_k + (block_k - 1) > q_start
    else:
        block_live = True
        crosses_diag = False

    kv_valid = mask_ref[0, 0] != 0
    kv_tail = ik * block_k + block_k > seq_kv
    all_valid = jnp.all(kv_valid) & jnp.logical_not(kv_tail) \
        & jnp.logical_not(crosses_diag)

    def _accumulate(p):
        do = do_ref[0]                                  # (hb, block_q, d)
        delta = delta_ref[0][:, :, :1]
        dp = jax.lax.dot_general(do, v_ref[0], (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - delta) * scale).astype(k_ref.dtype)
        dq_acc[:] += jax.lax.dot_general(
            ds, k_ref[0], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)         # (hb, block_q, d)

    def _scores():
        return jax.lax.dot_general(
            q_ref[0], k_ref[0], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale

    @pl.when(block_live & all_valid)
    def _compute_fast():
        _accumulate(jnp.exp(_scores() - lse_ref[0][:, :, :1]))

    @pl.when(block_live & jnp.logical_not(all_valid))
    def _compute_masked():
        s = _scores()
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        valid = kv_valid[None, :] & (col + ik * block_k < seq_kv)
        if causal:
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
            qpos = row + iq * block_q + (seq_kv - seq_q)
            valid = valid & (col + ik * block_k <= qpos)
        _accumulate(jnp.where(valid[None],
                              jnp.exp(s - lse_ref[0][:, :, :1]), 0.0))

    @pl.when(is_last)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd(causal, scale, block_q, block_k, interpret, res, g):
    q, k, v, kv_mask, out, lse = res
    b, h, sq, d = q.shape
    skv = k.shape[2]
    # backward kernels may prefer their own tiling (dk/dv iterates q
    # blocks per kv block; dq the reverse) — overridable via env for
    # sweeps, defaults tied to the fwd blocks
    block_q = int(os.environ.get('GROMA_FLASH_BWD_BQ', block_q))
    block_k = int(os.environ.get('GROMA_FLASH_BWD_BK', block_k))
    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(skv, 8))
    do = g
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)

    sq_p = pl.cdiv(sq, block_q) * block_q
    skv_p = pl.cdiv(skv, block_k) * block_k

    def pad3(x, s_to):
        return jnp.pad(x, ((0, 0), (0, 0), (0, s_to - x.shape[2]), (0, 0)))

    qp, dop = pad3(q, sq_p), pad3(do, sq_p)
    kp, vp = pad3(k, skv_p), pad3(v, skv_p)
    maskp = jnp.pad(kv_mask, ((0, 0), (0, skv_p - skv)))
    maskp = maskp.astype(jnp.int32)[:, None, :]
    lse_p = jnp.pad(lse, ((0, 0), (0, 0), (0, sq_p - sq)),
                    constant_values=NEG_INF)
    delta_p = jnp.pad(delta, ((0, 0), (0, 0), (0, sq_p - sq)))
    # stats as (b, h, sq, 128) replicated in lanes for clean VMEM tiling
    lse_t = jnp.broadcast_to(lse_p[..., None], (b, h, sq_p, 128))
    delta_t = jnp.broadcast_to(delta_p[..., None], (b, h, sq_p, 128))

    nq = sq_p // block_q
    nk = skv_p // block_k
    # bwd kernels stream do (+dk/dv or dq) blocks on top of q/k/v
    hb = _pick_hb(h, block_q, block_k, d, extra_io=block_q + 2 * block_k)

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, num_q_blocks=nq, seq_q=sq, seq_kv=skv, hb=hb,
        packed=causal)
    dkv_out_shape = [
        jax.ShapeDtypeStruct((b, h, skv_p, d), k.dtype),
        jax.ShapeDtypeStruct((b, h, skv_p, d), v.dtype),
    ]
    dkv_scratch = [
        pltpu.VMEM((hb, block_k, d), jnp.float32),
        pltpu.VMEM((hb, block_k, d), jnp.float32),
    ]
    if causal:
        # SINGLE-PASS fused backward over the kv-major live-pair packing
        # (see _causal_pairs and _bwd_fused_kernel): dk/dv/dq from one
        # score recompute and one q/k/v/do/stats stream
        iq_t, ik_t, fi_t, la_t = _causal_pairs(
            nq, nk, block_q, block_k, sq, skv, kv_major=True)
        fused_kernel = functools.partial(
            _bwd_fused_kernel, scale=scale, causal=True,
            block_q=block_q, block_k=block_k, seq_q=sq, seq_kv=skv,
            hb=hb, num_q_blocks=nq)
        fused_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(b, h // hb, len(iq_t)),
            in_specs=[
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, ik[j], 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, ik[j], 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, 0, ik[j])),
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
                pl.BlockSpec((1, hb, block_q, 128),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
                pl.BlockSpec((1, hb, block_q, 128),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, ik[j], 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, ik[j], 0)),
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, j, iq, ik, f, l:
                             (ib, ih, iq[j], 0)),
            ],
            scratch_shapes=dkv_scratch + [
                pltpu.VMEM((hb, sq_p, d), jnp.float32),   # dq_scr
            ],
        )
        dk, dv, dq = pl.pallas_call(
            fused_kernel, grid_spec=fused_spec,
            out_shape=dkv_out_shape + [
                jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype)],
            interpret=interpret,
        )(jnp.asarray(iq_t), jnp.asarray(ik_t), jnp.asarray(fi_t),
          jnp.asarray(la_t), qp, kp, vp, maskp, dop, lse_t, delta_t)
        dq = dq[:, :, :sq]
        dk = dk[:, :, :skv]
        dv = dv[:, :, :skv]
        return dq, dk, dv, None
    else:
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(b, h // hb, nk, nq),
            in_specs=[
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, ik, iq: (ib, ih, iq, 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, ik, iq: (ib, ih, ik, 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, ik, iq: (ib, ih, ik, 0)),
                pl.BlockSpec((1, 1, block_k),
                             lambda ib, ih, ik, iq: (ib, 0, ik)),
                pl.BlockSpec((1, hb, block_q, d),
                             lambda ib, ih, ik, iq: (ib, ih, iq, 0)),
                pl.BlockSpec((1, hb, block_q, 128),
                             lambda ib, ih, ik, iq: (ib, ih, iq, 0)),
                pl.BlockSpec((1, hb, block_q, 128),
                             lambda ib, ih, ik, iq: (ib, ih, iq, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, ik, iq: (ib, ih, ik, 0)),
                pl.BlockSpec((1, hb, block_k, d),
                             lambda ib, ih, ik, iq: (ib, ih, ik, 0)),
            ],
            out_shape=dkv_out_shape,
            scratch_shapes=dkv_scratch,
            interpret=interpret,
        )(qp, kp, vp, maskp, dop, lse_t, delta_t)

    dq_kernel = functools.partial(
        _bwd_dq_kernel, scale=scale, causal=False, block_q=block_q,
        block_k=block_k, num_kv_blocks=nk, seq_q=sq, seq_kv=skv, hb=hb,
        packed=False)
    dq_out_shape = jax.ShapeDtypeStruct((b, h, sq_p, d), q.dtype)
    dq_scratch = [pltpu.VMEM((hb, block_q, d), jnp.float32)]
    # non-causal only: the causal path returned above via the
    # fused single-pass kernel
    dq = pl.pallas_call(
        dq_kernel,
        grid=(b, h // hb, nq, nk),
        in_specs=[
            pl.BlockSpec((1, hb, block_q, d),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hb, block_k, d),
                         lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
            pl.BlockSpec((1, hb, block_k, d),
                         lambda ib, ih, iq, ik: (ib, ih, ik, 0)),
            pl.BlockSpec((1, 1, block_k),
                         lambda ib, ih, iq, ik: (ib, 0, ik)),
            pl.BlockSpec((1, hb, block_q, d),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hb, block_q, 128),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
            pl.BlockSpec((1, hb, block_q, 128),
                         lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        ],
        out_specs=pl.BlockSpec((1, hb, block_q, d),
                               lambda ib, ih, iq, ik: (ib, ih, iq, 0)),
        out_shape=dq_out_shape,
        scratch_shapes=dq_scratch,
        interpret=interpret,
    )(qp, kp, vp, maskp, dop, lse_t, delta_t)

    dq = dq[:, :, :sq]
    dk = dk[:, :, :skv]
    dv = dv[:, :, :skv]
    return dq, dk, dv, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_attention(q, k, v, kv_mask, causal, scale, block_q, block_k,
                     interpret):
    # primal (non-grad) call: skip the lse output entirely (saves a
    # 128-lane-replicated f32 write per q block on the whole-kv path)
    out, _ = _fwd(q, k, v, kv_mask, causal, scale, block_q, block_k,
                  interpret, need_lse=False)
    return out


def _flash_fwd_rule(q, k, v, kv_mask, causal, scale, block_q, block_k,
                    interpret):
    out, lse = _fwd(q, k, v, kv_mask, causal, scale, block_q, block_k,
                    interpret)
    return out, (q, k, v, kv_mask, out, lse)


def _flash_bwd_rule(causal, scale, block_q, block_k, interpret, res, g):
    return _bwd(causal, scale, block_q, block_k, interpret, res, g)


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def flash_attention(q: jnp.ndarray,
                    k: jnp.ndarray,
                    v: jnp.ndarray,
                    kv_mask: jnp.ndarray | None = None,
                    causal: bool = False,
                    scale: float | None = None,
                    block_q: int | None = None,
                    block_k: int | None = None,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Flash attention over (B, H, S, D) tensors with optional causal masking
    and a (B, S_kv) key validity mask.  Differentiable (custom VJP).

    Default blocks are tuned for v5e with heads-batched PACKED causal
    grids (round-5 sweep at b8/h32/d128, /tmp-probe results recorded in
    ROADMAP.md): causal >=1k uses 256x512 (fwd+bwd s=2048: 25.3 ms vs
    31.8 at the old 512x512 — the finer q tiling wastes less of the
    diagonal), causal <1k uses one whole-seq 128-padded block per side
    (s=576 fwd: 2.70 ms/layer vs 4.02 XLA dense — the packed grid
    REVERSES the old dense-below-1k policy), bidirectional tiling keeps
    128 (the whole-kv kernel handles every <=4k-kv encoder shape)."""
    b, h, sq, d = q.shape
    skv = k.shape[2]

    def _whole(n):
        return min(pl.cdiv(n, 128) * 128, 1024)

    if block_q is None:
        block_q = (256 if sq >= 1024 else _whole(sq)) if causal \
            else DEFAULT_BLOCK
    if block_k is None:
        block_k = (512 if skv >= 1024 else _whole(skv)) if causal \
            else DEFAULT_BLOCK
    if scale is None:
        scale = d ** -0.5
    if kv_mask is None:
        kv_mask = jnp.ones((b, skv), dtype=bool)
    if interpret is None:
        interpret = not _on_tpu()
    block_q = min(block_q, max(sq, 8))
    block_k = min(block_k, max(skv, 8))
    return _flash_attention(q, k, v, kv_mask, causal, float(scale),
                            block_q, block_k, interpret)
