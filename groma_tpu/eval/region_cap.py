"""Region-captioning evaluation (Visual Genome / RefCOCOg).

(reference: groma/eval/model_vg.py + model_refcocog.py generate captions
for referred boxes and write per-rank JSON shards; groma/eval/eval_cap.py
merges and scores).  Sharding across hosts uses jax.process_index();
scoring uses the pure-python CIDEr/BLEU in eval/cap.py.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Iterable

import numpy as np

from groma_tpu.constants import DEFAULT_TOKENS
from groma_tpu.data.conversation import conv_templates
from groma_tpu.data.datasets.base import VLDataSpec, intro_conversation
from groma_tpu.data.tokenization import expand_template
from groma_tpu.eval.cap import score_captions
from groma_tpu.eval.generate import Generator

T = DEFAULT_TOKENS

REGION_CAP_EVAL_INSTRUCTION = 'Please give a concise description of region {}.'


def build_region_cap_prompt(tokenizer, spec: VLDataSpec,
                            conv_temp: str = 'llava'):
    """Refer-box prompt: <roi><refer_box></roi><refer_feat>
    (reference: model_vg.py refer_exp assembly)."""
    conv = conv_templates[conv_temp]
    messages = intro_conversation(conv)
    refer = T['bor'] + T['rbox'] + T['eor'] + T['rfeat']
    messages.append((conv.roles[0],
                     REGION_CAP_EVAL_INSTRUCTION.format(refer)))
    messages.append((conv.roles[1], None))
    ids = tokenizer.encode(conv.get_prompt(messages))
    return expand_template(ids, None, tokenizer.sp, spec.num_image_tokens,
                           spec.max_region_num, spec.max_seq_len)


def generate_region_captions(generator: Generator, samples: Iterable[dict],
                             tokenizer, spec: VLDataSpec,
                             shard_dir: str, max_new_tokens: int = 48,
                             rank: int = 0) -> str:
    """samples: dicts with 'image', 'sample_id', 'refer_box' (cxcywh).
    Writes one JSON shard per rank (reference: model_vg.py per-rank
    shards); returns the shard path."""
    import jax.numpy as jnp
    sp = tokenizer.sp
    t = build_region_cap_prompt(tokenizer, spec)
    results = []
    for s in samples:
        rb = jnp.asarray(np.asarray(s['refer_box'],
                                    np.float32).reshape(1, 1, 4))
        tokens, _ = generator.generate(
            jnp.asarray(s['image'][None]),
            jnp.asarray(t['input_ids'][None]),
            jnp.asarray(t['region_slot'][None]),
            jnp.asarray(t['valid'][None]),
            refer_boxes=rb, refer_valid=jnp.ones((1, 1), bool),
            max_new_tokens=max_new_tokens, eos_id=sp.eos)
        text = tokenizer.decode([tok for tok in tokens[0]
                                 if tok != sp.eos])
        results.append({'sample_id': s['sample_id'], 'caption': text})
    os.makedirs(shard_dir, exist_ok=True)
    path = os.path.join(shard_dir, f'captions_rank{rank}.json')
    with open(path, 'w') as f:
        json.dump(results, f)
    return path


def merge_and_score(shard_dir: str, references: dict) -> dict:
    """Merge rank shards + CIDEr/BLEU scoring
    (reference: eval_cap.py:1-61)."""
    candidates = {}
    for path in sorted(glob.glob(os.path.join(shard_dir,
                                              'captions_rank*.json'))):
        with open(path) as f:
            for r in json.load(f):
                candidates[str(r['sample_id'])] = r['caption']
    refs = {str(k): (v if isinstance(v, list) else [v])
            for k, v in references.items() if str(k) in candidates}
    candidates = {k: v for k, v in candidates.items() if k in refs}
    return score_captions(candidates, refs)
