"""Int8-LLM Groma generation: vision bf16 + weight-only-int8 LLaMA.

The TPU analogue of the reference's 8-bit inference switch
(reference: groma/eval/run_groma.py:43-61 load_in_8bit): vision tower and
region tokenizer run bf16 flax; the 7B decoder runs through
models/llama_quant.py.  Groma-7B then fits one 16 GB v5e chip
(~1.3 GB vision + ~7 GB int8 LLM + cache).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.config import GromaConfig
from groma_tpu.models.groma import GromaModel
from groma_tpu.models.llama import make_kv_cache
from groma_tpu.models.llama_quant import (quant_llama_forward,
                                          quant_llama_logits,
                                          quantize_llama_params)



def quantize_groma_llm(params: dict, cfg: GromaConfig,
                       bits: int = 8) -> dict:
    """Quantize the LLM branch of a GromaModel param tree; embeddings and
    the small extra head stay bf16.  ``bits`` selects int8 or packed int4
    (the reference's load_in_8bit / load_in_4bit switch,
    reference: groma/eval/run_groma.py:43-61), or 16 for a full-precision
    bf16 tree with the same fused qkv/gate_up stream layout."""
    qp = quantize_llama_params(
        {'model': params['llm'],
         'embed_tokens': params['embed_tokens'],
         'lm_head': params['lm_head']}, cfg.llm, bits=bits)
    qp['new_input_embs'] = jnp.asarray(params['new_input_embs'],
                                       jnp.bfloat16)
    qp['extra_lm_head'] = jnp.asarray(params['extra_lm_head']['kernel'],
                                      jnp.bfloat16)
    return qp


class QuantGenerator:
    """Prefill + greedy scan decode with the int8 LLM.

    ``kv_bits=8`` stores the KV cache as int8 with per-token scales
    (models/llama_quant.py make_quant_kv_cache) — halves cache HBM
    streaming and footprint on top of the weight-only quantization."""

    def __init__(self, model: GromaModel, params, qp, max_len: int = 2048,
                 kv_bits: int = 16, use_flash: bool = False,
                 w8a8_prefill: bool = False, spec_lookahead: int = 0,
                 spec_ngram: int = 2):
        """``spec_lookahead=G`` > 0 switches b=1 greedy decoding to
        prompt-lookup speculative decoding (eval/speculative.py): one
        (1, G+1) verify forward per accepted run — exact greedy
        semantics, up to (G+1)x fewer weight streams."""
        self.model = model
        cfg = model.cfg
        self.cfg = cfg
        self.spec_lookahead = spec_lookahead
        self.spec_ngram = spec_ngram
        sp_base = cfg.llm.vocab_size

        def logits_fn(qp, hidden):
            base = quant_llama_logits(qp, hidden)
            extra = jnp.einsum('bsd,dv->bsv',
                               hidden.astype(jnp.bfloat16),
                               qp['extra_lm_head'],
                               preferred_element_type=jnp.float32)
            return jnp.concatenate([base, extra], axis=-1)

        def embed_fn(qp, ids):
            is_new = ids >= sp_base
            base = qp['embed_tokens'][jnp.where(is_new, 0, ids)]
            new = qp['new_input_embs'][jnp.where(is_new, ids - sp_base, 0)]
            return jnp.where(is_new[..., None], new, base)

        def prefill(params, qp, images, input_ids, region_slot, base_valid,
                    refer_boxes, refer_valid):
            emb, ids, valid, vis = model.apply(
                {'params': params}, images, input_ids, region_slot,
                base_valid, refer_boxes=refer_boxes,
                refer_valid=refer_valid, use_flash=use_flash,
                method=GromaModel.prepare_stream)
            pos = jnp.maximum(
                jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
            if kv_bits == 8:
                from groma_tpu.models.llama_quant import make_quant_kv_cache
                cache = make_quant_kv_cache(cfg.llm, images.shape[0],
                                            max_len)
            else:
                cache = make_kv_cache(cfg.llm, images.shape[0], max_len)
            hidden, cache = quant_llama_forward(qp, cfg.llm, emb, valid,
                                                pos, cache,
                                                use_flash=use_flash,
                                                w8a8=w8a8_prefill)
            last = jnp.argmax(pos, axis=-1)
            last_h = jnp.take_along_axis(hidden, last[:, None, None],
                                         axis=1)
            next_pos = jnp.take_along_axis(pos, last[:, None], -1) + 1
            return logits_fn(qp, last_h)[:, 0], cache, vis, next_pos

        def decode_scan(qp, logits0, cache, pos0, n_steps, eos_id):
            def step(carry, i):
                logits, cache, done = carry
                tok = jnp.argmax(logits, axis=-1)
                tok = jnp.where(done, eos_id, tok)
                done = done | (tok == eos_id)
                emb = embed_fn(qp, tok[:, None])
                hidden, cache = quant_llama_forward(
                    qp, cfg.llm, emb,
                    jnp.ones_like(tok[:, None], dtype=bool),
                    pos0 + i, cache)
                return (logits_fn(qp, hidden)[:, -1], cache, done), tok

            b = logits0.shape[0]
            (_, _, _), toks = jax.lax.scan(
                step, (logits0, cache, jnp.zeros((b,), bool)),
                jnp.arange(n_steps))
            return jnp.swapaxes(toks, 0, 1)

        self.params = params
        self.qp = qp
        self._prefill = jax.jit(prefill)
        self._decode_scan = jax.jit(decode_scan, donate_argnums=(2,),
                                    static_argnames=('n_steps', 'eos_id'))
        if spec_lookahead > 0:
            from groma_tpu.eval.speculative import make_verify_step
            self._verify = make_verify_step(cfg.llm, embed_fn, logits_fn,
                                            spec_lookahead)
        self.spec_stats = None        # last generate()'s acceptance info

    def generate(self, images, input_ids, region_slot, base_valid,
                 refer_boxes=None, refer_valid=None,
                 max_new_tokens: int = 32, eos_id: int = 2):
        b = images.shape[0]
        if refer_boxes is None:
            refer_boxes = jnp.zeros((b, 0, 4), jnp.float32)
            refer_valid = jnp.zeros((b, 0), bool)
        logits, cache, vis, next_pos = self._prefill(
            self.params, self.qp, images, input_ids, region_slot,
            base_valid, refer_boxes, refer_valid)
        if self.spec_lookahead > 0:
            assert b == 1, 'speculative decoding is single-stream'
            from groma_tpu.eval.speculative import speculative_greedy_decode
            cur = int(jnp.argmax(logits[0]))
            ctx = [int(t) for t, v in
                   zip(np.asarray(input_ids[0]), np.asarray(base_valid[0]))
                   if v]
            row, self.spec_stats = speculative_greedy_decode(
                self._verify, self.qp, cache, cur, int(next_pos[0, 0]),
                ctx, max_new_tokens, eos_id, self.spec_lookahead,
                self.spec_ngram)
            toks = np.asarray([row], np.int32)
        else:
            toks = np.asarray(self._decode_scan(self.qp, logits, cache,
                                                next_pos, max_new_tokens,
                                                eos_id))
        out = []
        for row in toks:
            stop = np.nonzero(row == eos_id)[0]
            out.append(row[:stop[0] + 1] if len(stop) else row)
        width = max(len(r) for r in out)
        tokens = np.full((b, width), eos_id, toks.dtype)
        for i, r in enumerate(out):
            tokens[i, :len(r)] = r
        return tokens, jax.tree_util.tree_map(np.asarray, {
            'selected_boxes': vis['selected_boxes'],
            'selected_mask': vis['selected_mask'],
        })
