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

from typing import Optional

import jax
import jax.numpy as jnp

from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import apply_rope, rms_norm, rope_tables
from groma_tpu.ops.quant import int8_matmul, quantize_weight

QUANT_KERNELS = ('q_proj', 'k_proj', 'v_proj', 'o_proj',
                 'gate_proj', 'up_proj', 'down_proj')


def quantize_llama_params(params: dict, cfg: LlamaConfig,
                          quantize_lm_head: bool = True) -> dict:
    """flax LlamaModel/LlamaForCausalLM-style params -> int8 pytree."""
    def q(kernel):
        qw, s = quantize_weight(jnp.asarray(kernel))
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
        out['lm_head'] = q(k) if quantize_lm_head \
            else jnp.asarray(k, jnp.bfloat16)
    return out


def _qmm(x, qw):
    """(…, K) @ int8 (K, N).  2D-flatten for the kernel."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    y = int8_matmul(x2, qw['q'], qw['scale'])
    return y.reshape(*lead, -1)


def quant_llama_forward(qp: dict, cfg: LlamaConfig, inputs_embeds,
                        attn_mask, position_ids, cache: Optional[dict] = None):
    """Mirror of models/llama.py LlamaModel.__call__ on int8 weights."""
    dtype = jnp.dtype(cfg.dtype)
    hd = cfg.hidden_size // cfg.num_heads
    nh, nkv = cfg.num_heads, cfg.num_kv_heads
    cos, sin = rope_tables(position_ids, hd, cfg.rope_theta)
    x = inputs_embeds.astype(dtype)
    b, s, _ = x.shape

    kv_mask = attn_mask
    if cache is not None:
        kv_mask = jax.lax.dynamic_update_slice(
            cache['mask'], attn_mask[:, :s], (0, cache['index']))

    new_k, new_v = [], []
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

        cache_index = None
        if cache is not None:
            cache_index = cache['index']
            ck = jax.lax.dynamic_update_slice(
                cache['k'][i], k.astype(cache['k'].dtype),
                (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(
                cache['v'][i], v.astype(cache['v'].dtype),
                (0, 0, cache_index, 0))
            k, v = ck, cv
            new_k.append(ck)
            new_v.append(cv)

        rep = nh // nkv
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        scale = hd ** -0.5
        sc = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                        preferred_element_type=jnp.float32) * scale
        skv = k.shape[2]
        sc = jnp.where(kv_mask[:, None, None, :], sc, -1e30)
        qi = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 1)
        causal_ok = kj <= qi + (cache_index if cache is not None
                                else (skv - s))
        sc = jnp.where(causal_ok[None, None], sc, -1e30)
        p = jax.nn.softmax(sc, axis=-1)
        attn = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        attn = attn.astype(dtype).transpose(0, 2, 1, 3).reshape(b, s, -1)
        x = x + _qmm(attn, lp['o_proj']).astype(dtype)

        h = rms_norm(x, lp['post_attention_layernorm'], cfg.rms_norm_eps)
        gu = _qmm(h, lp['gate_up_proj'])
        gate, up = jnp.split(gu, 2, axis=-1)
        x = x + _qmm((jax.nn.silu(gate) * up).astype(dtype),
                     lp['down_proj']).astype(dtype)

    x = rms_norm(x, qp['norm'], cfg.rms_norm_eps)

    new_cache = None
    if cache is not None:
        new_cache = {'k': jnp.stack(new_k), 'v': jnp.stack(new_v),
                     'mask': kv_mask, 'index': cache['index'] + s}
    return x, new_cache


def quant_llama_logits(qp: dict, hidden):
    head = qp['lm_head']
    if isinstance(head, dict):
        return _qmm(hidden, head)
    return jnp.einsum('bsd,dv->bsv', hidden, head,
                      preferred_element_type=jnp.float32)
