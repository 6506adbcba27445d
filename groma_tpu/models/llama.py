"""LLaMA decoder in flax (Vicuna-7B), HF ``LlamaForCausalLM`` semantics.

The reference wraps HF's LlamaForCausalLM as the language model
(reference: groma/model/groma.py:104-107) with a train-time flash-attn
monkey patch (reference: groma/train/llama_flash_attn_monkey_patch.py).

TPU-first design:
* stateless KV cache as an explicit pytree argument (fixed ``max_len``
  buffers + ``dynamic_update_slice``) so prefill and decode are two cached
  XLA programs — replacing HF's python-side past_key_values plumbing
  (reference: groma/model/groma.py:176-200 prepare_inputs_for_generation),
* explicit ``position_ids`` (cumsum of the validity mask) so the fixed-
  capacity token stream with mid-sequence pad slots is numerically equal to
  the reference's compacted dynamic sequences,
* Pallas flash attention for training, plain XLA dot-product attention for
  single-token decode,
* rotary tables computed in fp32 islands (HF parity), bf16 everywhere else.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from jax.ad_checkpoint import checkpoint_name

from groma_tpu.parallel.mesh import constrain

from groma_tpu.config import LlamaConfig
from groma_tpu.ops.flash_attention import flash_attention

# Below this many query tokens XLA's dense-attention fusion beats the
# Pallas flash kernel IN-MODEL at LLaMA-7B shapes (r3 policy, re-verified
# round 5 WITH the packed causal grids: w8a8 prefill at b8/s576 measured
# 348.9 ms dense vs 365.9 ms flash, even though the ISOLATED kernel wins
# 2.70 vs 4.02 ms/layer against an f32 reference — XLA fuses the bf16
# dense chain with its neighbors, which the isolated probe cannot see).
# benchmarks/exp_prefill_policy.py holds; at s>=2048 flash wins both
# isolated and in-model.
FLASH_MIN_SEQ = 1024


def rms_norm(x, scale, eps):
    dt = x.dtype
    x = x.astype(jnp.float32)
    x = x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True) + eps)
    return (x * scale.astype(jnp.float32)).astype(dt)


class RMSNorm(nn.Module):
    eps: float

    @nn.compact
    def __call__(self, x):
        scale = self.param('scale', nn.initializers.ones, (x.shape[-1],))
        return rms_norm(x, scale, self.eps)


def rope_tables(position_ids: jnp.ndarray, head_dim: int, theta: float):
    """cos/sin of shape (B, S, head_dim), HF half-rotation layout."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2,
                                           dtype=jnp.float32) / head_dim))
    angles = position_ids.astype(jnp.float32)[..., None] * inv_freq
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def apply_rope(x, cos, sin):
    """x: (B, H, S, D); cos/sin: (B, S, D)."""
    x32 = x.astype(jnp.float32)
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x32[..., half:], x32[..., :half]], axis=-1)
    out = x32 * cos[:, None] + rot * sin[:, None]
    return out.astype(x.dtype)


def make_kv_cache(cfg: LlamaConfig, batch: int, max_len: int,
                  dtype=None) -> dict:
    """KV cache as PER-LAYER leaves (lists of (B, H, S, D)), not stacked
    (L, B, H, S, D) planes: each layer's in-place update then aliases its
    own ~tens-of-MB buffer inside scanned decode loops.  With stacked
    planes XLA copies the full multi-GB plane whenever it cannot prove
    the carry aliases — measured 163 ms/step at 7B B=8 vs 16 ms with
    per-layer leaves (benchmarks/exp_b8_full.py)."""
    dtype = dtype or jnp.dtype(cfg.dtype)
    hd = cfg.hidden_size // cfg.num_heads
    shape = (batch, cfg.num_kv_heads, max_len, hd)
    return {
        'k': [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        'v': [jnp.zeros(shape, dtype) for _ in range(cfg.num_layers)],
        'mask': jnp.zeros((batch, max_len), dtype=bool),
        'index': jnp.zeros((), jnp.int32),
    }


class LlamaAttention(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, cos, sin, attn_mask, cache_kv=None,
                 cache_index=None, layer_idx=0, use_flash=False):
        c = self.cfg
        b, s, _ = x.shape
        hd = c.hidden_size // c.num_heads

        def proj(name, width):
            return nn.Dense(width, use_bias=False, dtype=self.dtype,
                            name=name)(x)

        q = proj('q_proj', c.num_heads * hd)
        k = proj('k_proj', c.num_kv_heads * hd)
        v = proj('v_proj', c.num_kv_heads * hd)
        q = q.reshape(b, s, c.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, c.num_kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, c.num_kv_heads, hd).transpose(0, 2, 1, 3)
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

        new_cache_kv = None
        prefill_mode = cache_kv is not None and s > 1
        vector_index = cache_kv is not None \
            and jnp.ndim(cache_index) == 1          # per-row write offsets
        if vector_index:
            # continuous-batching decode (serve/engine.py): each batch row
            # sits at its own sequence position.  Scatter the (B, H, 1, D)
            # new key/value at per-row slots — s must be 1.
            assert s == 1, 'vector cache_index requires single-token decode'
            ck, cv = cache_kv                      # this layer's (B,H,S,D)
            bidx = jnp.arange(b)
            ck = ck.at[bidx, :, cache_index, :].set(
                k[:, :, 0, :].astype(ck.dtype))
            cv = cv.at[bidx, :, cache_index, :].set(
                v[:, :, 0, :].astype(cv.dtype))
            new_cache_kv = (ck, cv)
            k, v = ck, cv
        elif cache_kv is not None:
            # tiny in-place update on this layer's own (B, H, S, D)
            # buffer — per-layer leaves alias cleanly inside scanned
            # decode loops (see make_kv_cache)
            ck, cv = cache_kv
            ck = jax.lax.dynamic_update_slice(
                ck, k.astype(ck.dtype), (0, 0, cache_index, 0))
            cv = jax.lax.dynamic_update_slice(
                cv, v.astype(cv.dtype), (0, 0, cache_index, 0))
            new_cache_kv = (ck, cv)
            if not prefill_mode:
                k, v = ck, cv

        rep = c.num_heads // c.num_kv_heads
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)

        # prefill (s > 1 with a cache) attends over THIS call's keys only:
        # multi-token cached forwards always start at index 0 (prefill
        # contract), so this is exact and avoids (B, H, S, max_len)
        # score materialization against the padded cache
        amask = attn_mask[:, :s] if (cache_kv is None or prefill_mode) \
            else attn_mask
        if use_flash and (cache_kv is None or prefill_mode) \
                and s >= FLASH_MIN_SEQ:
            out = flash_attention(q, k, v, kv_mask=amask, causal=True)
        else:
            scale = hd ** -0.5
            sc = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                            preferred_element_type=jnp.float32) * scale
            skv = k.shape[2]
            sc = jnp.where(amask[:, None, None, :], sc, -1e30)
            qi = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 0)
            kj = jax.lax.broadcasted_iota(jnp.int32, (s, skv), 1)
            if cache_kv is None or prefill_mode:
                causal_ok = kj <= qi + (skv - s)
                sc = jnp.where(causal_ok[None, None], sc, -1e30)
            elif vector_index:
                # per-row positions (continuous batching): the kv mask is
                # authoritative — rows only ever see slots their own
                # stream has written (future slots are mask=False), so no
                # extra causal term is needed; still mask slots past each
                # row's current index defensively.
                causal_ok = kj[None] <= cache_index[:, None, None]
                sc = jnp.where(causal_ok[:, None], sc, -1e30)
            else:
                # cache slots are written in order, so slot index == global
                # position: query (cache_index + i) sees slots <= that.
                causal_ok = kj <= qi + cache_index
                sc = jnp.where(causal_ok[None, None], sc, -1e30)
            p = jax.nn.softmax(sc, axis=-1)
            out = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32
                             ).astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, c.num_heads * hd)
        # named for the selective remat policy (LlamaModel remat_policy=
        # 'attn'): saving this (B, S, H) tensor skips re-running the
        # flash-attention kernel in the backward remat pass at the cost
        # of S*H*2 bytes/layer of saved activation
        out = checkpoint_name(out, 'attn_out')
        out = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                       name='o_proj')(out)
        return out, new_cache_kv


class LlamaLayer(nn.Module):
    cfg: LlamaConfig
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, cos, sin, attn_mask, cache_kv=None,
                 cache_index=None, layer_idx=0, use_flash=False):
        c = self.cfg
        h = RMSNorm(c.rms_norm_eps, name='input_layernorm')(x)
        attn, new_cache = LlamaAttention(c, self.dtype, name='self_attn')(
            h, cos, sin, attn_mask, cache_kv, cache_index, layer_idx,
            use_flash)
        x = x + attn
        h = RMSNorm(c.rms_norm_eps, name='post_attention_layernorm')(x)
        gate = nn.Dense(c.intermediate_size, use_bias=False,
                        dtype=self.dtype, name='gate_proj')(h)
        up = nn.Dense(c.intermediate_size, use_bias=False,
                      dtype=self.dtype, name='up_proj')(h)
        down = nn.Dense(c.hidden_size, use_bias=False, dtype=self.dtype,
                        name='down_proj')(nn.silu(gate) * up)
        return x + down, new_cache


class LlamaModel(nn.Module):
    """Decoder trunk; embedding lookup is the caller's job (Groma splices
    visual embeddings into the stream before calling, reference:
    groma/model/groma.py:359-369)."""
    cfg: LlamaConfig
    remat: bool = False
    remat_policy: str = 'full'   # 'full' | 'attn' (save attention
    # outputs, recompute everything else — skips the flash-attention
    # recompute in the backward pass for ~S*H*2 bytes/layer)

    @nn.compact
    def __call__(self, inputs_embeds, attn_mask, position_ids,
                 cache: Optional[dict] = None, use_flash=False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        hd = c.hidden_size // c.num_heads
        cos, sin = rope_tables(position_ids, hd, c.rope_theta)
        x = inputs_embeds.astype(dtype)

        kv_mask = attn_mask
        if cache is not None:
            # attn_mask marks validity of the *new* tokens (B, s); the
            # layers see the whole fixed cache buffer through its mask.
            s = inputs_embeds.shape[1]
            if jnp.ndim(cache['index']) == 1:   # per-row offsets (engine)
                kv_mask = cache['mask'].at[
                    jnp.arange(attn_mask.shape[0]),
                    cache['index']].set(attn_mask[:, 0])
            else:
                kv_mask = jax.lax.dynamic_update_slice(
                    cache['mask'], attn_mask[:, :s], (0, cache['index']))

        layer_cls = LlamaLayer
        if self.remat:
            # static_argnums counts self as 0: layer_idx/use_flash are
            # positional 7/8
            policy = None
            if self.remat_policy == 'attn':
                policy = jax.checkpoint_policies.save_only_these_names(
                    'attn_out')
            layer_cls = nn.remat(LlamaLayer, static_argnums=(7, 8),
                                 prevent_cse=False, policy=policy)
        cache_index = cache['index'] if cache is not None else None
        new_k, new_v = [], []
        # pin the inter-layer hidden to the megatron activation layout
        # (batch over (dp, fsdp), seq/hidden replicated): the pin
        # transposes onto cotangents and into the remat computations, so
        # fsdp-sharded weights all-gather instead of the partitioner
        # resharding (B, S, H) through a transposed device order
        # (the fake_parameter involuntary-remats of MULTICHIP_r02)
        x = constrain(x, ('dp', 'fsdp'))
        for i in range(c.num_layers):
            layer_kv = (cache['k'][i], cache['v'][i]) \
                if cache is not None else None
            x, updated = layer_cls(c, dtype, name=f'layers_{i}')(
                x, cos, sin, kv_mask, layer_kv, cache_index, i, use_flash)
            x = constrain(x, ('dp', 'fsdp'))
            if updated is not None:
                new_k.append(updated[0])
                new_v.append(updated[1])
        x = RMSNorm(c.rms_norm_eps, name='norm')(x)

        new_cache = None
        if cache is not None:
            new_cache = {
                'k': new_k,
                'v': new_v,
                'mask': kv_mask,
                'index': cache['index'] + inputs_embeds.shape[1],
            }
        return x, new_cache


class LlamaForCausalLM(nn.Module):
    cfg: LlamaConfig
    remat: bool = False
    remat_policy: str = 'full'

    @nn.compact
    def __call__(self, input_ids, attn_mask=None, position_ids=None,
                 cache=None, use_flash=False, return_hidden=False):
        c = self.cfg
        dtype = jnp.dtype(c.dtype)
        embed = self.param('embed_tokens', nn.initializers.normal(0.02),
                           (c.vocab_size, c.hidden_size))
        x = embed[input_ids].astype(dtype)
        b, s = input_ids.shape
        if attn_mask is None:
            attn_mask = jnp.ones((b, s), bool)
        if position_ids is None:
            position_ids = jnp.cumsum(attn_mask, axis=-1) - 1
        h, new_cache = LlamaModel(c, remat=self.remat,
                                  remat_policy=self.remat_policy,
                                  name='model')(
            x, attn_mask, position_ids, cache, use_flash)
        if return_hidden:
            # callers fusing CE with the head matmul (ops/fused_ce.py)
            # take the hidden states and p['lm_head']['kernel'] directly,
            # never materializing the (B, S, V) logits
            return h, new_cache
        logits = nn.Dense(c.vocab_size, use_bias=False, dtype=dtype,
                          name='lm_head')(h)
        return logits, new_cache
