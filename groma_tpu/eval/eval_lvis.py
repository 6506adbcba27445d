"""LVIS-Ground benchmark CLI (reference: groma/eval/eval_lvis.py entry).

Usage:
  python -m groma_tpu.eval.eval_lvis --model-dir <ckpt> \
      --img-prefix <coco_val> --ann-file lvis_test.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-dir', required=True)
    ap.add_argument('--img-prefix', required=True)
    ap.add_argument('--ann-file', required=True)
    ap.add_argument('--tokenizer', default=None)
    ap.add_argument('--limit', type=int, default=0)
    args = ap.parse_args()

    import jax

    from groma_tpu.checkpoint.loader import load_groma
    from groma_tpu.data.coco_index import CocoIndex
    from groma_tpu.data.datasets.base import VLDataSpec
    from groma_tpu.data.image_pipeline import (load_image, normalize,
                                               resize,
                                               xyxy_to_norm_cxcywh)
    from groma_tpu.data.tokenizer import load_tokenizer
    from groma_tpu.eval.generate import Generator
    from groma_tpu.eval.lvis import evaluate_lvis

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
    cat_names = {cid: c['name'].replace('_', ' ').strip().lower()
                 for cid, c in coco.cats.items()}
    # LVIS frequency buckets from the category records
    cat_freq = {cid: c.get('frequency', '') for cid, c in coco.cats.items()}

    img_ids = coco.get_img_ids()
    if args.limit:
        img_ids = img_ids[:args.limit]
    rank, world = jax.process_index(), jax.process_count()
    img_ids = img_ids[rank::world]

    def samples():
        for iid in img_ids:
            info = coco.load_img(iid)
            anns = coco.get_anns(iid)
            if not anns:
                continue
            img = load_image(os.path.join(args.img_prefix,
                                          info['file_name']))
            img448, _ = resize(img, (spec.image_size,) * 2)
            norm_img = normalize(img448)
            by_cat = {}
            for a in anns:
                by_cat.setdefault(a['category_id'], []).append(a['bbox'])
            for cid, bxs in by_cat.items():
                boxes = np.asarray(
                    [[x, y, x + w, y + h] for x, y, w, h in bxs],
                    np.float32)
                scale = np.array([spec.image_size / info['width'],
                                  spec.image_size / info['height']] * 2,
                                 np.float32)
                gt = xyxy_to_norm_cxcywh(
                    boxes * scale, (spec.image_size, spec.image_size))
                yield {'image': norm_img, 'image_id': iid,
                       'category_id': cid,
                       'category_name': cat_names.get(cid, 'object'),
                       'gt_boxes': gt}

    out = evaluate_lvis(gen, samples(), tokenizer, spec,
                        cat_frequencies=cat_freq)
    print(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()
