"""Generation loop over the prefill/decode pair.

Replaces the reference's HF GenerationMixin glue
(reference: groma/model/groma.py:176-200 prepare_inputs_for_generation +
eval call sites): vision runs once in the prefill program, decode is a
single cached XLA program stepped from the host (greedy or sampled).
"""

from __future__ import annotations


from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.models.groma import GromaModel


class Generator:
    """Compiled prefill+decode wrapper for a GromaModel."""

    def __init__(self, model: GromaModel, params, max_len: int = 2048,
                 use_flash: bool = False):
        self.model = model
        self.params = params
        self.max_len = max_len

        def prefill(params, images, input_ids, region_slot, base_valid,
                    refer_boxes, refer_valid):
            return model.apply(
                {'params': params}, images, input_ids, region_slot,
                base_valid, max_len=max_len, refer_boxes=refer_boxes,
                refer_valid=refer_valid, use_flash=use_flash,
                method=GromaModel.prefill)

        def decode(params, tok, cache, pos):
            return model.apply({'params': params}, tok, cache, pos,
                               method=GromaModel.decode_step)

        def decode_scan(params, logits0, cache, pos0, n_steps, eos_id,
                        temperature, rng_key):
            """Decode n_steps fully on device (lax.scan) — one device
            round-trip for the whole generation instead of one per token
            (critical under a high-latency device tunnel).  temperature 0
            = greedy; > 0 samples (the reference generation default is
            do_sample=True, reference: groma/train/train.py:112)."""
            def step(carry, i):
                logits, cache, done, key = carry
                key, sub = jax.random.split(key)
                greedy = jnp.argmax(logits, axis=-1)
                sampled = jax.random.categorical(
                    sub, logits / jnp.maximum(temperature, 1e-6), axis=-1)
                tok = jnp.where(temperature > 0.0, sampled, greedy)
                tok = jnp.where(done, eos_id, tok)
                done = done | (tok == eos_id)
                nlogits, cache = model.apply(
                    {'params': params}, tok[:, None], cache, pos0 + i,
                    method=GromaModel.decode_step)
                return (nlogits, cache, done, key), tok

            b = logits0.shape[0]
            done0 = jnp.zeros((b,), bool)
            (_, _, _, _), toks = jax.lax.scan(
                step, (logits0, cache, done0, rng_key), jnp.arange(n_steps))
            return jnp.swapaxes(toks, 0, 1)          # (B, n_steps)

        self._prefill = jax.jit(prefill)
        # donate the cache so per-step updates alias in place
        self._decode = jax.jit(decode, donate_argnums=(2,))
        self._decode_scan = jax.jit(decode_scan, donate_argnums=(2,),
                                    static_argnames=('n_steps', 'eos_id'))

    def generate(self, images, input_ids, region_slot, base_valid,
                 refer_boxes=None, refer_valid=None,
                 max_new_tokens: int = 32, eos_id: int = 2,
                 temperature: float = 0.0,
                 rng: Optional[jax.Array] = None,
                 use_scan: bool = True):
        """Greedy (temperature 0) or sampled decoding.

        ``use_scan`` (greedy only) runs the whole decode loop in one
        compiled program; the python loop remains for sampling and for
        step-level early exit.

        Returns (tokens (B, <=max_new_tokens) numpy, vis dict).
        """
        b = images.shape[0]
        if refer_boxes is None:
            refer_boxes = jnp.zeros((b, 0, 4), jnp.float32)
            refer_valid = jnp.zeros((b, 0), bool)
        logits, cache, vis, next_pos = self._prefill(
            self.params, images, input_ids, region_slot, base_valid,
            refer_boxes, refer_valid)

        if use_scan:
            if rng is None:
                rng = jax.random.PRNGKey(0)
            toks = self._decode_scan(self.params, logits, cache, next_pos,
                                     max_new_tokens, eos_id,
                                     jnp.float32(temperature), rng)
            toks = np.asarray(toks)
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

        out_tokens = []
        done = np.zeros(b, bool)
        for step in range(max_new_tokens):
            if temperature > 0.0:
                rng, sub = jax.random.split(rng)
                tok = jax.random.categorical(sub, logits / temperature,
                                             axis=-1)
            else:
                tok = jnp.argmax(logits, axis=-1)
            tok_np = np.asarray(tok)
            out_tokens.append(tok_np)
            done |= tok_np == eos_id
            if done.all():
                break
            logits, cache = self._decode(self.params, tok[:, None], cache,
                                         next_pos + step)
        tokens = np.stack(out_tokens, axis=1) if out_tokens \
            else np.zeros((b, 0), np.int64)
        return tokens, jax.tree_util.tree_map(np.asarray, {
            'selected_boxes': vis['selected_boxes'],
            'selected_mask': vis['selected_mask'],
        })


def parse_region_tokens(tokens: np.ndarray, box_idx_start: int,
                        num_region_tokens: int = 100):
    """Extract <rK> indices from generated tokens
    (reference: groma/eval/eval_rec.py:104-112 scan for box_idx ids)."""
    out = []
    for row in tokens:
        ks = [int(t - box_idx_start) for t in row
              if box_idx_start <= t < box_idx_start + num_region_tokens]
        out.append(ks)
    return out
