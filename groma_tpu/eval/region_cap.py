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


def main():
    """Region-captioning CLI: generate captions for each image's first
    annotation box and score against the annotation 'caption' fields
    (reference: groma/eval/model_vg.py CLI + eval_cap.py merge/score —
    one COCO-format file where each image carries one refer box and
    the ground-truth region description)."""
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument('--model-dir', required=True)
    ap.add_argument('--img-prefix', required=True)
    ap.add_argument('--ann-file', required=True)
    ap.add_argument('--result-dir', required=True)
    ap.add_argument('--tokenizer', default=None)
    ap.add_argument('--limit', type=int, default=0)
    ap.add_argument('--max-new-tokens', type=int, default=48)
    args = ap.parse_args()

    import jax

    from groma_tpu.checkpoint.loader import load_groma
    from groma_tpu.data.coco_index import CocoIndex
    from groma_tpu.data.image_pipeline import (load_image, normalize,
                                               resize,
                                               xyxy_to_norm_cxcywh)
    from groma_tpu.data.tokenizer import load_tokenizer

    model, params, cfg = load_groma(args.model_dir)
    if args.tokenizer == 'stub':
        # checkpoint-free drill mode (see eval_rec.py)
        from groma_tpu.data.tokenizer import StubTokenizer
        tokenizer = StubTokenizer(base_vocab=cfg.llm.vocab_size,
                                  model_max_length=cfg.max_seq_len)
    else:
        tokenizer = load_tokenizer(args.tokenizer or args.model_dir,
                                   cfg.max_seq_len)
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=cfg.max_seq_len,
                      image_size=cfg.perceiver.image_size)
    gen = Generator(model, params, max_len=cfg.max_seq_len + 16)

    coco = CocoIndex(args.ann_file)
    img_ids = coco.get_img_ids()
    if args.limit:
        img_ids = img_ids[:args.limit]
    rank, world = jax.process_index(), jax.process_count()
    shard_ids = img_ids[rank::world]

    def samples():
        for iid in shard_ids:
            info = coco.load_img(iid)
            anns = coco.get_anns(iid)
            if not anns:
                continue
            img = load_image(os.path.join(args.img_prefix,
                                          info['file_name']))
            img448, _ = resize(img, (spec.image_size,) * 2)
            x, y, w, h = anns[0]['bbox']
            box = np.array([[x, y, x + w, y + h]], np.float32)
            scale = np.array([spec.image_size / info['width'],
                              spec.image_size / info['height']] * 2,
                             np.float32)
            rb = xyxy_to_norm_cxcywh(box * scale,
                                     (spec.image_size, spec.image_size))
            yield {'image': normalize(img448), 'sample_id': iid,
                   'refer_box': rb[0]}

    generate_region_captions(gen, samples(), tokenizer, spec,
                             args.result_dir,
                             max_new_tokens=args.max_new_tokens,
                             rank=rank)
    if rank == 0:
        # references: annotation (region description) or image caption
        refs = {}
        for iid in img_ids:
            anns = coco.get_anns(iid)
            cap = (anns[0].get('caption') if anns else None) \
                or coco.load_img(iid).get('caption')
            if cap:
                refs[iid] = [cap]
        print(json.dumps(merge_and_score(args.result_dir, refs),
                         indent=2))


if __name__ == '__main__':
    main()
