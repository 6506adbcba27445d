"""Generation loop over the prefill/decode pair.

Replaces the reference's HF GenerationMixin glue
(reference: groma/model/groma.py:176-200 prepare_inputs_for_generation +
eval call sites): vision runs once in the prefill program, decode is a
single cached XLA program stepped from the host (greedy or sampled).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from groma_tpu.models.groma import GromaModel


class Generator:
    """Compiled prefill+decode wrapper for a GromaModel."""

    def __init__(self, model: GromaModel, params, max_len: int = 2048):
        self.model = model
        self.params = params
        self.max_len = max_len

        def prefill(params, images, input_ids, region_slot, base_valid,
                    refer_boxes, refer_valid):
            return model.apply(
                {'params': params}, images, input_ids, region_slot,
                base_valid, max_len=max_len, refer_boxes=refer_boxes,
                refer_valid=refer_valid, method=GromaModel.prefill)

        def decode(params, tok, cache, pos):
            return model.apply({'params': params}, tok, cache, pos,
                               method=GromaModel.decode_step)

        self._prefill = jax.jit(prefill)
        self._decode = jax.jit(decode)

    def generate(self, images, input_ids, region_slot, base_valid,
                 refer_boxes=None, refer_valid=None,
                 max_new_tokens: int = 32, eos_id: int = 2,
                 temperature: float = 0.0,
                 rng: Optional[jax.Array] = None):
        """Greedy (temperature 0) or sampled decoding.

        Returns (tokens (B, <=max_new_tokens) numpy, vis dict).
        """
        b = images.shape[0]
        if refer_boxes is None:
            refer_boxes = jnp.zeros((b, 0, 4), jnp.float32)
            refer_valid = jnp.zeros((b, 0), bool)
        logits, cache, vis, next_pos = self._prefill(
            self.params, images, input_ids, region_slot, base_valid,
            refer_boxes, refer_valid)

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
