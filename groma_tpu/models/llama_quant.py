"""Weight-only int8 LLaMA inference path.

The parity surface for the reference's bitsandbytes 8-bit inference switch
(reference: groma/eval/run_groma.py:43-61) plus the practical enabler for
running full Groma-7B (vision bf16 + LLM int8 ≈ 9.6 GB) on a single
16 GB v5e chip.  Functional-style (no flax): weights are pre-quantized
into a plain pytree; matmuls go through the Pallas int8 kernel
(ops/quant.py) for m >= 8 rows and the XLA dequant path for single-token
decode, where XLA fuses convert+dot without materializing bf16 weights.

Numerics: symmetric per-output-channel int8 (the same scheme as LLM.int8's
vector-wise quantization minus outlier decomposition); embeddings, norms
and rotary stay bf16/f32.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import (FLASH_MIN_SEQ, apply_rope, rms_norm,
                                    rope_tables)
from groma_tpu.ops.flash_attention import flash_attention
from groma_tpu.ops.quant import int8_matmul, quantize_weight, w8a8_matmul
from groma_tpu.ops.quant4 import INT4_BLOCK, int4_matmul, quantize_weight_int4

QUANT_KERNELS = ('q_proj', 'k_proj', 'v_proj', 'o_proj',
                 'gate_proj', 'up_proj', 'down_proj')


def quantize_llama_params(params: dict, cfg: LlamaConfig,
                          quantize_lm_head: bool = True,
                          bits: int = 8) -> dict:
    """flax LlamaModel/LlamaForCausalLM-style params -> int8/int4 pytree.

    ``bits=4`` packs two nibbles per byte with per-(K-block, column)
    scales (ops/quant4.py) — the runtime format behind the reference's
    bitsandbytes 4-bit switch (reference: groma/eval/run_groma.py:43-61);
    the matmul dispatch keys on the stored dtype (uint8 = packed int4).

    ``bits=16`` keeps the weights bf16 but still fuses qkv and gate/up
    into single streams — the full-precision decode then rides the same
    jit programs (engine, QuantGenerator) as the quantized trees, with
    fewer, larger HBM weight streams than the per-projection flax
    forward."""
    assert bits in (16, 8, 4)

    def q(kernel, pad_to=0):
        kernel = jnp.asarray(kernel)
        if bits == 16:
            if pad_to and kernel.shape[1] % pad_to:
                kernel = jnp.pad(
                    kernel, ((0, 0), (0, (-kernel.shape[1]) % pad_to)))
            return {'q': kernel.astype(jnp.bfloat16)}
        if bits == 4 and kernel.shape[0] % INT4_BLOCK == 0 \
                and kernel.shape[0] % 2 == 0:
            qw = quantize_weight_int4(kernel, block=INT4_BLOCK,
                                      pad_to=pad_to)
            return {'q': qw['q'], 'scale': qw['scale']}
        qw, s = quantize_weight(kernel, pad_to=pad_to)
        return {'q': qw, 'scale': s.astype(jnp.float32)}

    model = params.get('model', params)          # accept either nesting
    out = {'layers': [], 'norm': jnp.asarray(model['norm']['scale'])}
    for i in range(cfg.num_layers):
        lp = model[f'layers_{i}']
        # fuse qkv and gate/up along the output dim: per-column int8
        # scales stay exact under concatenation, and one Pallas dispatch
        # streams all three weight blocks
        qkv = jnp.concatenate([lp['self_attn']['q_proj']['kernel'],
                               lp['self_attn']['k_proj']['kernel'],
                               lp['self_attn']['v_proj']['kernel']], axis=1)
        gate_up = jnp.concatenate([lp['gate_proj']['kernel'],
                                   lp['up_proj']['kernel']], axis=1)
        out['layers'].append({
            'input_layernorm': jnp.asarray(lp['input_layernorm']['scale']),
            'post_attention_layernorm': jnp.asarray(
                lp['post_attention_layernorm']['scale']),
            'qkv_proj': q(qkv),
            'o_proj': q(lp['self_attn']['o_proj']['kernel']),
            'gate_up_proj': q(gate_up),
            'down_proj': q(lp['down_proj']['kernel']),
        })
    if 'embed_tokens' in params:
        out['embed_tokens'] = jnp.asarray(params['embed_tokens'],
                                          jnp.bfloat16)
    if 'lm_head' in params:
        k = params['lm_head']['kernel']
        # pad_to=512 pre-pads the ragged head (32114 -> 32256) so the
        # kernel never re-copies 132 MB per decode step; the consumer
        # slices logits back to the true vocab (quant_llama_logits)
        out['lm_head'] = q(k, pad_to=512) if quantize_lm_head \
            else jnp.asarray(k, jnp.bfloat16)
    return out


def _qmm(x, qw, a8: bool = False):
    """(…, K) @ quantized (K, N); uint8 storage = packed int4,
    int8 = per-column int8.  2D-flatten for the kernel.

    ``a8=True`` (int8 weights, >=256 rows only): quantize the
    activations per-row and run the dot int8 x int8 -> int32 on the
    MXU's double-rate int8 path (ops/quant.w8a8_matmul) — the prefill
    fast path.  int4 weights keep the dequant route (per-K-block scales
    cannot be folded out of an integer dot)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    if qw['q'].dtype == jnp.bfloat16:                    # bits=16 tree
        y = jax.lax.dot(x2.astype(jnp.bfloat16), qw['q'],
                        preferred_element_type=jnp.float32).astype(x2.dtype)
    elif qw['q'].dtype == jnp.uint8:
        y = int4_matmul(x2, qw['q'], qw['scale'], block=INT4_BLOCK)
    elif a8 and x2.shape[0] >= 256:
        y = w8a8_matmul(x2, qw['q'], qw['scale'])
    else:
        y = int8_matmul(x2, qw['q'], qw['scale'])
    return y.reshape(*lead, -1)


# --------------------------------------------------------- int8 KV cache

def make_quant_kv_cache(cfg: LlamaConfig, batch: int, max_len: int):
    """int8 KV cache with per-(batch, head, position) scales, PER-LAYER
    leaves (see llama.make_kv_cache — stacked (L, ...) planes defeat
    XLA's in-place carry aliasing and copy the full cache per step).

    Halves the decode-time KV HBM stream and cache footprint vs bf16
    (537 -> 270 MB at 7B/b1/s1024; ~2.6 ms/step at b8) — the KV-side
    analogue of the weight-only int8 path.  Scales are 1/128 of the
    element count, so their overhead is negligible."""
    hd = cfg.hidden_size // cfg.num_heads
    shape = (batch, cfg.num_kv_heads, max_len, hd)
    nl = cfg.num_layers
    return {
        'k': [jnp.zeros(shape, jnp.int8) for _ in range(nl)],
        'v': [jnp.zeros(shape, jnp.int8) for _ in range(nl)],
        'k_scale': [jnp.zeros(shape[:-1], jnp.float32) for _ in range(nl)],
        'v_scale': [jnp.zeros(shape[:-1], jnp.float32) for _ in range(nl)],
        'mask': jnp.zeros((batch, max_len), bool),
        'index': 0,
    }


def _quantize_tokens(x):
    """(B, H, S, D) float -> (int8, (B, H, S) f32 scale), symmetric
    per-token-per-head absmax."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    sc = jnp.where(a > 0, a / 127.0, 1.0)
    q = jnp.round(x.astype(jnp.float32) / sc[..., None])
    return jnp.clip(q, -127, 127).astype(jnp.int8), sc


def _int8_cache_attention(q, k_q, k_s, v_q, v_s, mask_bias):
    """Single-token decode attention over the int8 cache.

    Both dots run int8 x int8 -> int32 on the MXU, so the cache is
    streamed from HBM as int8 with no bf16 materialization:
    * scores: quantize q per (B, H); s = (q8 . k8) * qs * ks[pos].
    * output: fold the v scale into p (it indexes the contraction dim),
      then re-quantize the scaled p per (B, H) row.
    """
    b, h, sq, d = q.shape
    q8, qs = _quantize_tokens(q)                       # (B,H,1,D), (B,H,1)
    s = jax.lax.dot_general(
        q8, k_q, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)              # (B,H,1,S)
    s = s.astype(jnp.float32) * qs[..., None] * k_s[:, :, None, :] \
        * (d ** -0.5)
    p = jax.nn.softmax(s + mask_bias, axis=-1)         # (B,H,1,S) f32
    ps = p * v_s[:, :, None, :]
    r = jnp.max(ps, axis=-1, keepdims=True)            # p >= 0
    r = jnp.where(r > 0, r / 127.0, 1.0)
    ps8 = jnp.round(ps / r).astype(jnp.int8)
    out = jax.lax.dot_general(
        ps8, v_q, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32)              # (B,H,1,D)
    return out.astype(jnp.float32) * r


def quant_llama_forward(qp: dict, cfg: LlamaConfig, inputs_embeds,
                        attn_mask, position_ids,
                        cache: Optional[dict] = None,
                        use_flash: bool = False,
                        chunked: bool = False,
                        w8a8: bool = False):
    """Mirror of models/llama.py LlamaModel.__call__ on quantized weights.

    Multi-token calls with a cache are PREFILL: the cache must be fresh
    (index 0); attention runs over this call's own keys (optionally via
    the Pallas flash kernel), never against the padded cache buffer.

    ``chunked=True`` lifts that contract: a multi-token call APPENDS the
    chunk at the current (scalar) cache index and attends over the whole
    cache buffer through its mask — chunked prefill for the serving
    engine (interleave prompt chunks with decode bursts so active slots
    never stall behind a long prefill).  Equivalent to one-shot prefill
    for any chunking of the same stream (tests/test_llama_quant.py)."""
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.hidden_size // cfg.num_heads
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    cos, sin = rope_tables(position_ids, hd, cfg.rope_theta)
    x = inputs_embeds.astype(dtype)
    b, s, _ = x.shape

    vector_index = cache is not None and jnp.ndim(cache['index']) == 1
    kv_mask = attn_mask
    if vector_index and s == 1:
        # per-row positions (continuous-batching engine)
        kv_mask = cache['mask'].at[jnp.arange(b), cache['index']].set(
            attn_mask[:, 0])
    elif vector_index:
        # per-row MULTI-token append (engine speculative verify): row b
        # writes its s tokens at cache slots index[b] .. index[b]+s-1
        assert chunked, 'vector-index multi-token calls must be chunked'
        wpos = cache['index'][:, None] + jnp.arange(s)[None]   # (B, s)
        kv_mask = cache['mask'].at[
            jnp.arange(b)[:, None], wpos].set(attn_mask[:, :s])
    elif cache is not None:
        kv_mask = jax.lax.dynamic_update_slice(
            cache['mask'], attn_mask[:, :s], (0, cache['index']))

    cache_index = cache['index'] if cache is not None else None
    ck = cache['k'] if cache is not None else None      # per-layer lists
    cv = cache['v'] if cache is not None else None
    quant_kv = cache is not None and ck[0].dtype == jnp.int8
    cks = list(cache['k_scale']) if quant_kv else None
    cvs = list(cache['v_scale']) if quant_kv else None
    if cache is not None:
        ck, cv = list(ck), list(cv)

    # prefill (s > 1) attends over the CURRENT keys only — multi-token
    # forwards always start a fresh cache at index 0 in this framework
    # (GromaModel.prefill / eval generators), so attending to the raw
    # k/v of this call is exact and never materializes (B, H, S, max_len)
    # scores against the padded cache buffer.  A chunked APPEND instead
    # takes the cached-decode route below (full-buffer mask, readback).
    append = chunked and s > 1 and cache is not None
    prefill_mode = s > 1 and not append
    # W8A8 applies only to multi-token (compute-bound) calls; decode
    # stays weight-only (it is HBM-bound — activation quant buys nothing)
    a8 = w8a8 and s > 1
    if prefill_mode or cache is None:
        skv = s
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 1)
        causal_ok = kj <= qi
        amask = attn_mask[:, :s]
    else:
        skv = ck[0].shape[2]
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 1)
        if vector_index:
            # per-row positions: (B, s, skv); row b's query j may see
            # cache slots <= index[b] + j (reduces to the decode case
            # at s == 1 where qi == 0)
            causal_ok = kj[None] <= qi[None] + cache_index[:, None, None]
        else:
            causal_ok = kj <= qi + cache_index
        amask = kv_mask
    neg = jnp.float32(-1e30)
    if jnp.ndim(causal_ok) == 3:
        mask_bias = jnp.where(
            causal_ok[:, None] & amask[:, None, None, :], 0.0, neg)
    else:
        mask_bias = jnp.where(
            causal_ok[None, None] & amask[:, None, None, :], 0.0, neg)

    for i, lp in enumerate(qp['layers']):
        h = rms_norm(x, lp['input_layernorm'], cfg.rms_norm_eps)
        qkv = _qmm(h, lp['qkv_proj'], a8)
        q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q.astype(dtype), cos, sin)
        k = apply_rope(k.astype(dtype), cos, sin)
        v = v.astype(dtype)

        if quant_kv and vector_index and s == 1:
            kq8, ksc = _quantize_tokens(k)
            vq8, vsc = _quantize_tokens(v)
            bidx = jnp.arange(b)
            idx = cache_index
            ck[i] = ck[i].at[bidx, :, idx, :].set(kq8[:, :, 0, :])
            cv[i] = cv[i].at[bidx, :, idx, :].set(vq8[:, :, 0, :])
            cks[i] = cks[i].at[bidx, :, idx].set(ksc[:, :, 0])
            cvs[i] = cvs[i].at[bidx, :, idx].set(vsc[:, :, 0])
        elif quant_kv and vector_index:
            # per-row multi-token append (engine speculative verify):
            # scatter row b's s tokens at slots index[b]..index[b]+s-1
            kq8, ksc = _quantize_tokens(k)
            vq8, vsc = _quantize_tokens(v)
            bidx = jnp.arange(b)[:, None]                      # (B, 1)
            wpos = cache_index[:, None] + jnp.arange(s)[None]  # (B, s)
            # advanced indexing at axes (0, 2) selects (B, s, H, .)
            ck[i] = ck[i].at[bidx, :, wpos, :].set(
                kq8.transpose(0, 2, 1, 3))
            cv[i] = cv[i].at[bidx, :, wpos, :].set(
                vq8.transpose(0, 2, 1, 3))
            cks[i] = cks[i].at[bidx, :, wpos].set(ksc.transpose(0, 2, 1))
            cvs[i] = cvs[i].at[bidx, :, wpos].set(vsc.transpose(0, 2, 1))
        elif quant_kv:
            # int8 KV: quantize this step's keys/values per (b, head,
            # position) and update this layer's int8 + scale leaves
            kq8, ksc = _quantize_tokens(k)
            vq8, vsc = _quantize_tokens(v)
            ck[i] = jax.lax.dynamic_update_slice(
                ck[i], kq8, (0, 0, cache_index, 0))
            cv[i] = jax.lax.dynamic_update_slice(
                cv[i], vq8, (0, 0, cache_index, 0))
            cks[i] = jax.lax.dynamic_update_slice(
                cks[i], ksc, (0, 0, cache_index))
            cvs[i] = jax.lax.dynamic_update_slice(
                cvs[i], vsc, (0, 0, cache_index))
        elif cache is not None and vector_index and s == 1:
            bidx = jnp.arange(b)
            idx = cache_index
            ck[i] = ck[i].at[bidx, :, idx, :].set(
                k[:, :, 0, :].astype(ck[i].dtype))
            cv[i] = cv[i].at[bidx, :, idx, :].set(
                v[:, :, 0, :].astype(cv[i].dtype))
        elif cache is not None and vector_index:
            bidx = jnp.arange(b)[:, None]
            wpos = cache_index[:, None] + jnp.arange(s)[None]
            ck[i] = ck[i].at[bidx, :, wpos, :].set(
                k.transpose(0, 2, 1, 3).astype(ck[i].dtype))
            cv[i] = cv[i].at[bidx, :, wpos, :].set(
                v.transpose(0, 2, 1, 3).astype(cv[i].dtype))
        elif cache is not None:
            # tiny in-place update on this layer's own (B, H, S, D) leaf —
            # per-layer leaves alias cleanly inside scanned decode loops
            # (see make_quant_kv_cache; stacked planes copied the full
            # cache per step)
            ck[i] = jax.lax.dynamic_update_slice(
                ck[i], k.astype(ck[i].dtype), (0, 0, cache_index, 0))
            cv[i] = jax.lax.dynamic_update_slice(
                cv[i], v.astype(cv[i].dtype), (0, 0, cache_index, 0))
        if cache is not None and not prefill_mode and not quant_kv:
            k, v = ck[i], cv[i]

        rep = nh // nkv
        if quant_kv and not prefill_mode and s == 1 and rep == 1 \
                and os.environ.get('GROMA_DECODE_ATTN', 'pallas') != 'xla':
            # fused Pallas kernel on TPU (falls back to the XLA chain
            # below off-TPU / at ragged shapes): 7.2 -> 5.2 ms per
            # 32-layer step at B=8 S=1024 (ops/decode_attention.py).
            # GROMA_DECODE_ATTN=xla forces the _int8_cache_attention
            # chain (the r4 isolated-kernel probe had it faster; the
            # full scanned decode step is the decisive comparison).
            from groma_tpu.ops.decode_attention import int8_decode_attention
            attn = int8_decode_attention(
                q, ck[i], cks[i], cv[i], cvs[i], mask_bias)
        else:
            if quant_kv and not prefill_mode:
                # GQA decode over an int8 cache: dequantize this layer
                # (rep > 1 needs head-repeat anyway; LLaMA-7B is MHA so
                # the int8x int8 fast path above is the production route)
                k = (ck[i].astype(jnp.float32)
                     * cks[i][..., None]).astype(dtype)
                v = (cv[i].astype(jnp.float32)
                     * cvs[i][..., None]).astype(dtype)
            if rep > 1:
                k = jnp.repeat(k, rep, axis=1)
                v = jnp.repeat(v, rep, axis=1)

            if use_flash and prefill_mode and s >= FLASH_MIN_SEQ:
                attn = flash_attention(q, k, v, kv_mask=amask, causal=True)
            else:
                # bf16 score STORAGE with fp32 softmax arithmetic (torch
                # bf16-autocast semantics, same idiom as models/layers.py)
                # — at b8/s640 prefill the materialized (B,H,S,S) tensor
                # between the two softmax passes halves, worth ~2x400 MB
                # of HBM traffic per layer vs f32 scores
                score_dtype = jnp.bfloat16 if dtype == jnp.bfloat16 \
                    and prefill_mode else jnp.float32
                scale = hd ** -0.5
                sc = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                                preferred_element_type=score_dtype) \
                    * jnp.asarray(scale, score_dtype)
                sc = sc + mask_bias.astype(score_dtype)
                p = jax.nn.softmax(sc.astype(jnp.float32), axis=-1)
                attn = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v,
                                  preferred_element_type=jnp.float32)
        attn = attn.astype(dtype).transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + _qmm(attn, lp['o_proj'], a8).astype(dtype)

        h = rms_norm(x, lp['post_attention_layernorm'], cfg.rms_norm_eps)
        gu = _qmm(h, lp['gate_up_proj'], a8)
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + _qmm((jax.nn.silu(gate) * up).astype(dtype),
                     lp['down_proj'], a8).astype(dtype)

    x = rms_norm(x, qp['norm'], cfg.rms_norm_eps)

    new_cache = None
    if cache is not None:
        new_cache = {'k': ck, 'v': cv,
                     'mask': kv_mask, 'index': cache['index'] + s}
        if quant_kv:
            new_cache['k_scale'] = cks
            new_cache['v_scale'] = cvs
    return x, new_cache


def quant_llama_decode_megakernel(qp: dict, sp: dict, cfg: LlamaConfig,
                                  inputs_embeds, attn_mask, cache: dict):
    """Single-token decode through the all-layer Pallas megakernel
    (ops/decode_megakernel.py): one pallas_call runs the full L-layer
    stack with the hidden state in VMEM and the stacked int8 KV cache
    updated in place.

    ``sp`` = stack_decode_params(qp); ``cache`` = a STACKED cache
    (decode_megakernel.stack_kv_cache) with a scalar index.
    Token positions are the scalar cache index (the bench/generator
    decode contract — the engine's per-row vector positions keep the
    per-layer path).  Semantics mirror quant_llama_forward's cached
    decode branch exactly; returns (hidden (B, 1, D), new_cache).
    """
    from groma_tpu.ops.decode_megakernel import fused_decode_step
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.hidden_size // cfg.num_heads
    b, s, _ = inputs_embeds.shape
    assert s == 1, 'megakernel decode is single-token'
    index = cache['index']
    skv = cache['k'].shape[3]
    kv_mask = jax.lax.dynamic_update_slice(
        cache['mask'], attn_mask[:, :1], (0, index))
    kj = jax.lax.broadcasted_iota(jnp.int32, (1, skv), 1)
    # OLD positions only (kj < index): the kernel folds the current
    # token into the softmax in registers via cur_bias
    mask_bias = jnp.where((kj[0] < index)[None, :] & cache['mask'],
                          0.0, jnp.float32(-1e30))        # (B, S)
    cur_bias = jnp.where(attn_mask[:, :1], 0.0, jnp.float32(-1e30))
    position_ids = jnp.full((b, 1), index, jnp.int32)
    cos, sin = rope_tables(position_ids, hd, cfg.rope_theta)
    x, k8, ks, vv8, vvs = fused_decode_step(
        sp, inputs_embeds[:, 0].astype(jnp.float32),
        cache['k'], cache['k_scale'], cache['v'], cache['v_scale'],
        mask_bias, cur_bias, cos[:, 0], sin[:, 0], index,
        eps=cfg.rms_norm_eps)
    x = rms_norm(x.astype(dtype)[:, None, :], qp['norm'],
                 cfg.rms_norm_eps)
    new_cache = {'k': k8, 'k_scale': ks, 'v': vv8, 'v_scale': vvs,
                 'mask': kv_mask, 'index': index + 1}
    return x, new_cache


def quant_llama_decode_paged(qp: dict, cfg: LlamaConfig, inputs_embeds,
                             position_ids, pools: dict, table, lengths):
    """Single-token decode against a shared int8 KV PAGE POOL
    (ops/paged_attention.py; serve/engine.py paged mode).

    A lean decode-only mirror of quant_llama_forward's cached branch:
    * ``position_ids`` (B, 1) — this token's write position per slot
      (= its current kv length); the page id comes from ``table``.
    * ``lengths`` (B,) — valid kv length AFTER the write (pos + 1 for
      live rows; 0 freezes a row: its write lands in its page but the
      kernel masks everything, exp(-1e30) = 0).
    * MHA only (num_heads == num_kv_heads, the 7B serving config) — the
      paged kernel has no GQA head-repeat path.
    Returns (hidden (B, 1, D), updated pools).
    """
    from groma_tpu.ops.paged_attention import (PAGE,
                                               paged_int8_decode_attention)
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.hidden_size // cfg.num_heads
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    assert nh == nkv, 'paged decode requires MHA'
    cos, sin = rope_tables(position_ids, hd, cfg.rope_theta)
    x = inputs_embeds.astype(dtype)
    b, s, _ = x.shape
    assert s == 1
    pos = position_ids[:, 0]
    bidx = jnp.arange(b)
    pids = table[bidx, pos // PAGE]                    # (B,)
    offs = pos % PAGE

    pk, pv = list(pools['k']), list(pools['v'])
    pks, pvs = list(pools['k_scale']), list(pools['v_scale'])

    for i, lp in enumerate(qp['layers']):
        h = rms_norm(x, lp['input_layernorm'], cfg.rms_norm_eps)
        qkv = _qmm(h, lp['qkv_proj'])
        q, k, v = jnp.split(qkv, [nh * hd, nh * hd + nkv * hd], axis=-1)
        q = q.reshape(b, s, nh, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, nkv, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q.astype(dtype), cos, sin)
        k = apply_rope(k.astype(dtype), cos, sin)
        v = v.astype(dtype)

        kq8, ksc = _quantize_tokens(k)
        vq8, vsc = _quantize_tokens(v)
        pk[i] = pk[i].at[pids, :, offs, :].set(kq8[:, :, 0, :])
        pv[i] = pv[i].at[pids, :, offs, :].set(vq8[:, :, 0, :])
        pks[i] = pks[i].at[pids, :, offs].set(ksc[:, :, 0])
        pvs[i] = pvs[i].at[pids, :, offs].set(vsc[:, :, 0])

        attn = paged_int8_decode_attention(
            q, pk[i], pks[i], pv[i], pvs[i], table, lengths)
        attn = attn.astype(dtype).transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + _qmm(attn, lp['o_proj']).astype(dtype)

        h = rms_norm(x, lp['post_attention_layernorm'], cfg.rms_norm_eps)
        gu = _qmm(h, lp['gate_up_proj'])
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + _qmm((jax.nn.silu(gate) * up).astype(dtype),
                     lp['down_proj']).astype(dtype)

    x = rms_norm(x, qp['norm'], cfg.rms_norm_eps)
    return x, {'k': pk, 'v': pv, 'k_scale': pks, 'v_scale': pvs}


def quant_llama_logits(qp: dict, hidden):
    head = qp['lm_head']
    if isinstance(head, dict):
        logits = _qmm(hidden, head)
        emb = qp.get('embed_tokens')
        if emb is not None and logits.shape[-1] != emb.shape[0]:
            logits = logits[..., :emb.shape[0]]   # drop pad_to columns
        return logits
    return jnp.einsum('bsd,dv->bsv', hidden, head,
                      preferred_element_type=jnp.float32)
