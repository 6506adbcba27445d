"""Single-call decode step over ALL transformer layers (Pallas megakernel).

The round-4 probes isolated two structural costs in the B=8 quantized
decode step that no per-layer program can remove:

* ~190 us of fixed cost per ``pallas_call`` x 32 layers of decode
  attention (an L-stacked single call with the identical body ran
  1.06x the KV roofline, benchmarks/exp_decode_attn_variants.py);
* zero overlap between the attention KV stream (~2.1 GB/step) and the
  MXU-row-bound weight matmuls — XLA cannot prefetch layer l+1's cache
  while layer l computes, because every pallas_call is opaque.

This kernel runs the ENTIRE L-layer decode step as ONE ``pallas_call``
with ``grid=(L,)``: the hidden state lives in VMEM scratch across grid
steps while int4 weights and the int8 KV cache stream from HBM through
manually double-buffered DMA.  Everything is computed in "(B, lanes)"
register land — per-head work uses static 128-lane slices, so no
sublane<->lane relayouts are ever issued.

Cache-update contract: the kernel QUANTIZES this token's k/v exactly
like the per-layer path, DMAs the new column into the aliased output
planes at ``pos`` (the write overlaps the whole layer body), and folds
the CURRENT token into the softmax in registers from the same
quantized values — so attention never has to read back the column it
just wrote.  Old positions stream from the input refs; the wrapper's
mask covers only ``kj < pos`` and the current token's validity rides a
separate (B, 1) bias.  The int32 p.v accumulation adds the current
column's term before the f32 cast, keeping the arithmetic identical
to the per-layer int8 dot over the full cache.

Numerics follow the shipped per-layer path exactly:
* matmuls: ops/quant4._int4_matmul_kernel algebra (biased-nibble bf16
  planes, per-K-block scales, ``x@(n-8) = x@n - 8*sum(x)`` fold);
* attention: ops/decode_attention._kernel algebra (per-(b,h) q
  quantization, f32 softmax, v-scale folded into p, p requantized);
* rms-norm/rope: models/llama.py fp32 helpers.

Reference semantics accelerated: the quantized single-token decode of
run_groma (reference: groma/eval/run_groma.py:43-61); the megakernel
form is this framework's TPU-native extension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from groma_tpu.ops.quant import _on_tpu

LANE = 128
NEG = jnp.float32(-1e30)


def _largest_bn(n: int, cap: int = 512) -> int:
    """Largest multiple-of-128 divisor of ``n`` that is <= cap."""
    bn = min(cap, n)
    bn -= bn % LANE
    while bn >= LANE and n % bn:
        bn -= LANE
    return max(bn, LANE)


def stack_decode_params(qp: dict) -> dict:
    """Per-layer int4 tree (llama_quant.quantize_llama_params bits=4)
    -> stacked (L, ...) planes for the megakernel.  One-time cost at
    load; weight bytes are identical."""
    layers = qp['layers']
    for lp in layers:
        for k in ('qkv_proj', 'o_proj', 'gate_up_proj', 'down_proj'):
            assert lp[k]['q'].dtype == jnp.uint8, \
                'megakernel requires the packed-int4 tree (bits=4)'

    def stk(get):
        return jnp.stack([get(lp) for lp in layers])

    def stk_scale(get):
        # pad the (K/block) row dim to a sublane multiple: Mosaic DMA
        # slices of tiled dims must be 8-aligned, and e.g. the 7B down
        # projection has 11008/256 = 43 scale rows
        s = jnp.stack([get(lp) for lp in layers])
        pad = (-s.shape[1]) % 8
        return jnp.pad(s, ((0, 0), (0, pad), (0, 0))) if pad else s

    return {
        'ln1': stk(lambda lp: lp['input_layernorm']),
        'ln2': stk(lambda lp: lp['post_attention_layernorm']),
        'wqkv': stk(lambda lp: lp['qkv_proj']['q']),
        'sqkv': stk_scale(lambda lp: lp['qkv_proj']['scale']),
        'wo': stk(lambda lp: lp['o_proj']['q']),
        'so': stk_scale(lambda lp: lp['o_proj']['scale']),
        'wgu': stk(lambda lp: lp['gate_up_proj']['q']),
        'sgu': stk_scale(lambda lp: lp['gate_up_proj']['scale']),
        'wdn': stk(lambda lp: lp['down_proj']['q']),
        'sdn': stk_scale(lambda lp: lp['down_proj']['scale']),
    }


def stack_kv_cache(cache: dict) -> dict:
    """Per-layer-leaf int8 cache (llama_quant.make_quant_kv_cache) ->
    stacked (L, ...) planes.  One ~2 GB copy at prefill->decode handoff;
    inside the decode scan each plane is updated IN PLACE by the
    kernel's aliased column write — the round-2 stacked-plane
    copy-per-step pathology (per-layer XLA updates re-materializing the
    stack) does not apply because the whole step is one pallas_call.

    Scales are transposed to (L, H, B, S): the kernel streams them per
    (layer, head), so the head index must sit on an untiled (leading)
    dim."""
    return {
        'k': jnp.stack(cache['k']), 'v': jnp.stack(cache['v']),
        'k_scale': jnp.stack(cache['k_scale']).transpose(0, 2, 1, 3),
        'v_scale': jnp.stack(cache['v_scale']).transpose(0, 2, 1, 3),
        'mask': cache['mask'], 'index': cache['index'],
    }


def unstack_kv_cache(st: dict, num_layers: int) -> dict:
    """Inverse of stack_kv_cache (engine handoff / tests)."""
    return {
        'k': [st['k'][i] for i in range(num_layers)],
        'v': [st['v'][i] for i in range(num_layers)],
        'k_scale': [st['k_scale'][i].transpose(1, 0, 2)
                    for i in range(num_layers)],
        'v_scale': [st['v_scale'][i].transpose(1, 0, 2)
                    for i in range(num_layers)],
        'mask': st['mask'], 'index': st['index'],
    }


# --------------------------------------------------------------- kernel


def _int4_chunk_dot(x_bf, xsums, packed_i32, scales, *, block: int):
    """(M, K) bf16 @ one packed (K/2, BN) int4 strip with (K/block, BN)
    scales — the ops/quant4._int4_matmul_kernel inner algebra."""
    khalf, bn = packed_i32.shape
    k = 2 * khalf
    lo = (packed_i32 & 0xF).astype(jnp.bfloat16)
    hi = (packed_i32 >> 4).astype(jnp.bfloat16)
    nblk = k // block
    acc = jnp.zeros((x_bf.shape[0], bn), jnp.float32)
    for b_ in range(nblk):
        sc = scales[b_]
        segs = []
        r0, r1 = b_ * block, (b_ + 1) * block
        if r0 < khalf:
            segs.append((r0, min(r1, khalf), lo, 0))
        if r1 > khalf:
            segs.append((max(r0, khalf), r1, hi, khalf))
        part = None
        for s0, s1, plane, off in segs:
            d = jax.lax.dot(x_bf[:, s0:s1], plane[s0 - off:s1 - off],
                            preferred_element_type=jnp.float32)
            part = d if part is None else part + d
        acc = acc + (part - 8.0 * xsums[b_]) * sc[None, :]
    return acc


def _rms(x32, scale_row, eps):
    """(M, D) f32 -> bf16-rounded rms-norm (models/llama.rms_norm
    numerics: fp32 arithmetic, bf16 storage for the matmul feed)."""
    v = x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (v * scale_row.astype(jnp.float32)).astype(jnp.bfloat16)


def _rope(x32, cos, sin, *, heads, hd):
    """Per-head half-rotation on a (B, H*hd) f32 register using static
    lane slices (models/llama.apply_rope numerics)."""
    half = hd // 2
    outs = []
    for h in range(heads):
        xh = x32[:, h * hd:(h + 1) * hd]
        rot = jnp.concatenate([-xh[:, half:], xh[:, :half]], axis=-1)
        outs.append(xh * cos + rot * sin)
    return jnp.concatenate(outs, axis=-1)


def _quant_rows(x32):
    """Symmetric per-row absmax int8 (llama_quant._quantize_tokens /
    decode_attention q-quantization numerics)."""
    a = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def _make_kernel(*, L, B, H, S, hd, F, block, eps, bn_qkv, bn_o, bn_gu,
                 bn_dn, ring, pre):
    D = H * hd
    k2_d = D // 2
    k2_f = F // 2
    nblk_d = D // block      # K = D matmuls (qkv, o, gate_up)
    nblk_f = F // block      # K = F matmul (down)
    scale = hd ** -0.5
    assert 1 <= pre <= ring - 1, (pre, ring)

    def kernel(pos_ref,                                   # scalar prefetch
               x0, cos_r, sin_r, mask_r, curb_r, ln1, ln2,  # VMEM blocks
               wqkv, sqkv, wo, so, wgu, sgu, wdn, sdn,    # HBM weights
               k8i, ksi, v8i, vsi,                        # HBM cache (in)
               x_out, k8o, kso, v8o, vso,                 # outputs
               x_scr, qkv_scr, gu_scr, attn_scr,          # VMEM scratch
               kq_scr, vq_scr, kssc_scr, vssc_scr,
               ktile, vtile, kstile, vstile,
               wbuf, sbuf, dnbuf, dsbuf, kbuf, ksbuf, vbuf, vsbuf,
               wsem, ssem, rtsem, cwsem, ksem, kssem, vsem, vssem):
        lyr = pl.program_id(0)
        pos = pos_ref[0]

        @pl.when(lyr == 0)
        def _init():
            x_scr[...] = x0[...]

        x = x_scr[...]                                    # (B, D) f32

        def stream_matmul(x_bf, w_hbm, s_hbm, out_scr, *, khalf, nblk,
                          bn, nch, wb, sb):
            """Double-buffered int4 matmul: (B, K) bf16 @ (K/2, N) int4
            streamed in (K/2, bn) strips from HBM.  Static chunk loop:
            every slice index is compile-time constant.  Scale planes
            carry 8-aligned padded rows (stack_decode_params); the DMA
            copies the padded rows, the dot reads the first nblk."""
            nblk8 = s_hbm.shape[1]
            xsums = [jnp.sum(
                x_bf[:, b_ * block:(b_ + 1) * block].astype(jnp.float32),
                axis=1, keepdims=True) for b_ in range(nblk)]

            def dmas(slot, j):
                c0 = j * bn
                return (pltpu.make_async_copy(
                            w_hbm.at[lyr, :, c0:c0 + bn],
                            wb.at[slot, :khalf, :bn], wsem.at[slot]),
                        pltpu.make_async_copy(
                            s_hbm.at[lyr, :, c0:c0 + bn],
                            sb.at[slot, :nblk8, :bn], ssem.at[slot]))

            for d in dmas(0, 0):
                d.start()
            for j in range(nch):
                slot = j % 2
                if j + 1 < nch:
                    for d in dmas((j + 1) % 2, j + 1):
                        d.start()
                for d in dmas(slot, j):
                    d.wait()
                packed = wb[slot, :khalf, :bn].astype(jnp.int32)
                acc = _int4_chunk_dot(x_bf, xsums, packed,
                                      sb[slot, :nblk8, :bn], block=block)
                out_scr[:, j * bn:(j + 1) * bn] = acc

        # ---- attention block: rms1 -> qkv -> rope -> cache write + attn
        h1 = _rms(x, ln1[pl.ds(lyr, 1)][0], eps)          # (B, D) bf16
        stream_matmul(h1, wqkv, sqkv, qkv_scr, khalf=k2_d, nblk=nblk_d,
                      bn=bn_qkv, nch=3 * D // bn_qkv, wb=wbuf, sb=sbuf)
        qkv = qkv_scr[...]                                # (B, 3D) f32
        cos = cos_r[...]                                  # (B, hd) f32
        sin = sin_r[...]
        q_rot = _rope(qkv[:, :D], cos, sin, heads=H, hd=hd)
        k_rot = _rope(qkv[:, D:2 * D], cos, sin, heads=H, hd=hd)
        v_cur = qkv[:, 2 * D:]

        # quantize this token's k/v per (b, head); stage the int8 planes
        # for both the cache write and the in-register attention fold
        kscs, vscs = [], []
        for hh in range(H):
            kq, ksc = _quant_rows(k_rot[:, hh * hd:(hh + 1) * hd])
            vq, vsc = _quant_rows(v_cur[:, hh * hd:(hh + 1) * hd])
            kq_scr[:, hh, :] = kq
            vq_scr[:, hh, :] = vq
            kssc_scr[hh, :] = ksc[:, 0]
            vssc_scr[hh, :] = vsc[:, 0]
            kscs.append(ksc)
            vscs.append(vsc)
        # cache-column write at [lyr, ..., pos] into the ALIASED output
        # planes.  Mosaic cannot DMA a 1-wide slice of a TILED dim (S is
        # sublane-tiled on the int8 planes, lane-tiled on the scales), so
        # the write is a read-modify-write of the ALIGNED tile holding
        # ``pos``: DMA the 8-wide (int8) / 128-wide (f32 scale) tile in,
        # splice the new column with an iota select, DMA the whole tile
        # back.  Rows != pos are rewritten with identical bytes, so the
        # concurrent attention stream below can never observe a torn
        # value at a live position; position pos itself is masked there
        # (register fold).  Extra traffic: ~1 MB/layer vs the 67 MB/layer
        # KV stream.  The final wait sits at the END of the layer body,
        # so the writeback overlaps all of attention + MLP.
        pos_base = pl.multiple_of((pos // 8) * 8, 8)
        soff = pos - pos_base
        sbase = pl.multiple_of((pos // LANE) * LANE, LANE)
        loff = pos - sbase
        reads = (
            pltpu.make_async_copy(
                k8i.at[lyr, :, :, pl.ds(pos_base, 8), :], ktile,
                rtsem.at[0]),
            pltpu.make_async_copy(
                v8i.at[lyr, :, :, pl.ds(pos_base, 8), :], vtile,
                rtsem.at[1]),
            pltpu.make_async_copy(
                ksi.at[lyr, :, :, pl.ds(sbase, LANE)], kstile,
                rtsem.at[2]),
            pltpu.make_async_copy(
                vsi.at[lyr, :, :, pl.ds(sbase, LANE)], vstile,
                rtsem.at[3]),
        )
        for r in reads:
            r.start()
        for r in reads:
            r.wait()
        srow = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
        ktile[...] = jnp.where(srow == soff, kq_scr[...][:, :, None, :],
                               ktile[...])
        vtile[...] = jnp.where(srow == soff, vq_scr[...][:, :, None, :],
                               vtile[...])
        lcol = jax.lax.broadcasted_iota(jnp.int32, (1, 1, LANE), 2)
        kstile[...] = jnp.where(lcol == loff, kssc_scr[...][:, :, None],
                                kstile[...])
        vstile[...] = jnp.where(lcol == loff, vssc_scr[...][:, :, None],
                                vstile[...])
        writes = (
            pltpu.make_async_copy(
                ktile, k8o.at[lyr, :, :, pl.ds(pos_base, 8), :],
                cwsem.at[0]),
            pltpu.make_async_copy(
                vtile, v8o.at[lyr, :, :, pl.ds(pos_base, 8), :],
                cwsem.at[1]),
            pltpu.make_async_copy(
                kstile, kso.at[lyr, :, :, pl.ds(sbase, LANE)],
                cwsem.at[2]),
            pltpu.make_async_copy(
                vstile, vso.at[lyr, :, :, pl.ds(sbase, LANE)],
                cwsem.at[3]),
        )
        for w in writes:
            w.start()

        # stream the OLD int8 cache per head: (B, S, hd) k/v + (B, S)
        # scales, through a RING of ``ring`` slots.  The first ``pre``
        # heads of THIS layer were prefetched at the END of the previous
        # layer's attention loop (or in _init for layer 0), so their
        # stream overlapped the previous layer's o/gate_up/down matmuls
        # — the cross-layer overlap the per-layer pallas_call path
        # structurally cannot express (each call is opaque to XLA).
        # Position pos may be concurrently overwritten by this layer's
        # own column DMA — harmless, the mask is -1e30 there (DMA writes
        # are element-atomic, values stay finite).
        def att_dmas(slot, hh, ll):
            return (pltpu.make_async_copy(
                        k8i.at[ll, :, hh], kbuf.at[slot], ksem.at[slot]),
                    pltpu.make_async_copy(
                        ksi.at[ll, hh], ksbuf.at[slot], kssem.at[slot]),
                    pltpu.make_async_copy(
                        v8i.at[ll, :, hh], vbuf.at[slot], vsem.at[slot]),
                    pltpu.make_async_copy(
                        vsi.at[ll, hh], vsbuf.at[slot], vssem.at[slot]))

        @pl.when(lyr == 0)
        def _prime():
            for h0 in range(pre):
                for d in att_dmas(h0 % ring, h0, 0):
                    d.start()

        mask = mask_r[...]                                # (B, S) f32
        curb = curb_r[...]                                # (B, 1) f32
        for hh in range(H):
            slot = hh % ring
            nxt = hh + pre
            if nxt < H:
                for d in att_dmas(nxt % ring, nxt, lyr):
                    d.start()
            for d in att_dmas(slot, hh, lyr):
                d.wait()
            q8, qs = _quant_rows(q_rot[:, hh * hd:(hh + 1) * hd])
            k8c = kq_scr[:, hh, :]                        # (B, hd) i8
            v8c = vq_scr[:, hh, :]
            s_old = jax.lax.dot_general(
                q8[:, None, :], kbuf[slot], (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)[:, 0]   # (B, S)
            s_old = (s_old.astype(jnp.float32) * (qs * scale)
                     * ksbuf[slot] + mask)
            s_cur = jnp.sum(q8.astype(jnp.int32) * k8c.astype(jnp.int32),
                            axis=-1, keepdims=True)       # (B, 1)
            s_cur = (s_cur.astype(jnp.float32) * (qs * scale)
                     * kscs[hh] + curb)
            m = jnp.maximum(jnp.max(s_old, axis=-1, keepdims=True), s_cur)
            p_old = jnp.exp(s_old - m)                    # (B, S)
            p_cur = jnp.exp(s_cur - m)                    # (B, 1)
            denom = jnp.sum(p_old, axis=-1, keepdims=True) + p_cur
            ps_old = p_old * vsbuf[slot]
            ps_cur = p_cur * vscs[hh]
            r = jnp.maximum(jnp.max(ps_old, axis=-1, keepdims=True),
                            ps_cur)
            r = jnp.where(r > 0, r / 127.0, 1.0)
            p8 = jnp.round(ps_old / r).astype(jnp.int8)
            p8c = jnp.round(ps_cur / r)                   # integral f32
            o = jax.lax.dot_general(
                p8[:, None, :], vbuf[slot], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.int32)[:, 0]   # (B, hd)
            # current column's term joins BEFORE the f32 cast: identical
            # int32 accumulation to the per-layer dot over the full cache
            o = o + p8c.astype(jnp.int32) * v8c.astype(jnp.int32)
            attn_scr[:, hh * hd:(hh + 1) * hd] = (
                o.astype(jnp.float32) * (r / jnp.maximum(denom, 1e-30)))

        # prefetch the NEXT layer's first ``pre`` heads now: their
        # ~pre/H of the KV stream rides the DMA engine while the MXU
        # runs this layer's o/gate_up/down matmuls.  Ring slots 0..pre-1
        # were last consumed by heads H-ring..: all waited above.
        @pl.when(lyr + 1 < L)
        def _prefetch_next_layer():
            for h0 in range(pre):
                for d in att_dmas(h0 % ring, h0, lyr + 1):
                    d.start()

        # o-projection streamed into qkv_scr[:, :D] (qkv is consumed)
        attn_bf = attn_scr[...].astype(jnp.bfloat16)
        stream_matmul(attn_bf, wo, so, qkv_scr, khalf=k2_d, nblk=nblk_d,
                      bn=bn_o, nch=D // bn_o, wb=wbuf, sb=sbuf)
        x = x + qkv_scr[:, :D]

        # ---- MLP block
        h2 = _rms(x, ln2[pl.ds(lyr, 1)][0], eps)
        stream_matmul(h2, wgu, sgu, gu_scr, khalf=k2_d, nblk=nblk_d,
                      bn=bn_gu, nch=2 * F // bn_gu, wb=wbuf, sb=sbuf)
        gu = gu_scr[...]                                  # (B, 2F) f32
        act = (jax.nn.silu(gu[:, :F]) * gu[:, F:]).astype(jnp.bfloat16)
        stream_matmul(act, wdn, sdn, qkv_scr, khalf=k2_f, nblk=nblk_f,
                      bn=bn_dn, nch=D // bn_dn, wb=dnbuf, sb=dsbuf)
        x = x + qkv_scr[:, :D]

        for w in writes:
            w.wait()
        x_scr[...] = x

        @pl.when(lyr == L - 1)
        def _final():
            x_out[...] = x

    return kernel


@functools.partial(jax.jit, static_argnames=('block', 'eps', 'interpret'))
def fused_decode_step(sp: dict, x: jnp.ndarray, k8, ks, v8, vs,
                      mask_bias: jnp.ndarray, cur_bias: jnp.ndarray,
                      cos: jnp.ndarray, sin: jnp.ndarray,
                      pos: jnp.ndarray, block: int = 256,
                      eps: float = 1e-5, interpret: bool = False):
    """One full decode step over all L layers in a single pallas_call.

    sp: stacked params (stack_decode_params);
    x (B, D) f32 hidden after embedding; k8/v8 (L, B, H, S, hd) int8 and
    ks/vs (L, H, B, S) f32 stacked cache planes (updated IN PLACE via
    aliasing); mask_bias (B, S) f32 (0 / -1e30) over OLD cache positions
    — it must already exclude ``pos`` itself (kj < pos & validity);
    cur_bias (B, 1) f32 validity bias for THIS token; cos/sin (B, hd)
    f32 rope rows for this token's positions; pos () int32 — the shared
    cache write slot (scalar-position decode: bench/generator; the
    engine's per-row vector positions keep the per-layer path).

    Returns (x_out (B, D) f32, k8', ks', v8', vs').
    """
    L, B, H, S, hd = k8.shape
    D = H * hd
    F = sp['wdn'].shape[1] * 2
    assert x.shape == (B, D) and hd % LANE == 0 and S % LANE == 0
    assert ks.shape == (L, H, B, S), ks.shape

    def _pad8(n):
        return n + (-n) % 8

    assert sp['sqkv'].shape[1] == _pad8(D // block), 'scale block mismatch'
    bn_qkv = _largest_bn(3 * D)
    bn_o = _largest_bn(D)
    bn_gu = _largest_bn(2 * F)
    bn_dn = _largest_bn(D)
    nblk_d, nblk_f = D // block, F // block

    # KV ring: ~16 MB of k+v slots (1 MB per (B=8, S=1024, hd=128) int8
    # plane), capped so in-loop prefetch never laps the consumer
    ring = max(4, min(8, (8 * 2 ** 20) // max(B * S * hd, 1)))
    pre = max(1, min(6, ring - 1, H - 1)) if H > 1 else 1
    kernel = _make_kernel(L=L, B=B, H=H, S=S, hd=hd, F=F, block=block,
                          eps=eps, bn_qkv=bn_qkv, bn_o=bn_o, bn_gu=bn_gu,
                          bn_dn=bn_dn, ring=ring, pre=pre)
    bn_max = max(bn_qkv, bn_o, bn_gu)
    vmem = pl.BlockSpec
    any_ = pl.BlockSpec(memory_space=pl.ANY)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L,),
        in_specs=[
            vmem((B, D), lambda l, *_: (0, 0)),               # x0
            vmem((B, hd), lambda l, *_: (0, 0)),              # cos
            vmem((B, hd), lambda l, *_: (0, 0)),              # sin
            vmem((B, S), lambda l, *_: (0, 0)),               # mask
            vmem((B, 1), lambda l, *_: (0, 0)),               # cur bias
            # full (L, D) tables resident in VMEM (512 KB each at 7B);
            # Mosaic rejects (1, D) blocks (sublane dim must be 8k or L),
            # so the kernel slices its layer's row with pl.ds(lyr, 1)
            vmem((L, D), lambda l, *_: (0, 0)),               # ln1
            vmem((L, D), lambda l, *_: (0, 0)),               # ln2
            any_, any_, any_, any_, any_, any_, any_, any_,   # weights
            any_, any_, any_, any_,                       # cache in
        ],
        out_specs=[
            vmem((B, D), lambda l, *_: (0, 0)),               # x_out
            any_, any_, any_, any_,                       # cache out
        ],
        scratch_shapes=[
            pltpu.VMEM((B, D), jnp.float32),              # x_scr
            pltpu.VMEM((B, 3 * D), jnp.float32),          # qkv_scr
            pltpu.VMEM((B, 2 * F), jnp.float32),          # gu_scr
            pltpu.VMEM((B, D), jnp.float32),              # attn_scr
            pltpu.VMEM((B, H, hd), jnp.int8),             # kq_scr
            pltpu.VMEM((B, H, hd), jnp.int8),             # vq_scr
            pltpu.VMEM((H, B), jnp.float32),              # kssc_scr
            pltpu.VMEM((H, B), jnp.float32),              # vssc_scr
            pltpu.VMEM((B, H, 8, hd), jnp.int8),          # ktile
            pltpu.VMEM((B, H, 8, hd), jnp.int8),          # vtile
            pltpu.VMEM((H, B, LANE), jnp.float32),        # kstile
            pltpu.VMEM((H, B, LANE), jnp.float32),        # vstile
            pltpu.VMEM((2, D // 2, bn_max), jnp.uint8),   # wbuf
            pltpu.VMEM((2, _pad8(nblk_d), bn_max), jnp.float32),  # sbuf
            pltpu.VMEM((2, F // 2, bn_dn), jnp.uint8),    # dnbuf
            pltpu.VMEM((2, _pad8(nblk_f), bn_dn), jnp.float32),   # dsbuf
            pltpu.VMEM((ring, B, S, hd), jnp.int8),       # kbuf
            pltpu.VMEM((ring, B, S), jnp.float32),        # ksbuf
            pltpu.VMEM((ring, B, S, hd), jnp.int8),       # vbuf
            pltpu.VMEM((ring, B, S), jnp.float32),        # vsbuf
            pltpu.SemaphoreType.DMA((2,)),                # wsem
            pltpu.SemaphoreType.DMA((2,)),                # ssem
            pltpu.SemaphoreType.DMA((4,)),                # rtsem
            pltpu.SemaphoreType.DMA((4,)),                # cwsem
            pltpu.SemaphoreType.DMA((ring,)),             # ksem
            pltpu.SemaphoreType.DMA((ring,)),             # kssem
            pltpu.SemaphoreType.DMA((ring,)),             # vsem
            pltpu.SemaphoreType.DMA((ring,)),             # vssem
        ],
    )
    # aliases: inputs are indexed INCLUDING the scalar-prefetch operand
    # (pos=0), so cache inputs sit at 16..19 and cache outputs at 1..4
    interp = pltpu.InterpretParams() if interpret else False
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct(k8.shape, k8.dtype),
            jax.ShapeDtypeStruct(ks.shape, ks.dtype),
            jax.ShapeDtypeStruct(v8.shape, v8.dtype),
            jax.ShapeDtypeStruct(vs.shape, vs.dtype),
        ],
        input_output_aliases={16: 1, 17: 2, 18: 3, 19: 4},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interp,
    )(jnp.asarray(pos, jnp.int32).reshape(1),
      x.astype(jnp.float32), cos.astype(jnp.float32),
      sin.astype(jnp.float32), mask_bias.astype(jnp.float32),
      cur_bias.astype(jnp.float32).reshape(B, 1),
      sp['ln1'].astype(jnp.float32), sp['ln2'].astype(jnp.float32),
      sp['wqkv'], sp['sqkv'], sp['wo'], sp['so'], sp['wgu'], sp['sgu'],
      sp['wdn'], sp['sdn'], k8, ks, v8, vs)
    return out[0], out[1], out[2], out[3], out[4]


def supported(cfg, batch: int, qp: dict) -> bool:
    """The megakernel covers the production serving geometry: MHA,
    lane-aligned head_dim, packed-int4 weights, TPU backend."""
    if not _on_tpu():
        return False
    if cfg.num_heads != cfg.num_kv_heads:
        return False
    if (cfg.hidden_size // cfg.num_heads) % LANE:
        return False
    try:
        return qp['layers'][0]['qkv_proj']['q'].dtype == jnp.uint8
    except Exception:
        return False
