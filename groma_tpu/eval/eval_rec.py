"""REC benchmark CLI (reference: groma/eval/eval_rec.py entry).

Usage:
  python -m groma_tpu.eval.eval_rec --model-dir <groma ckpt> \
      --img-prefix <coco_train_2017> --ann-file refcoco_val.json

Annotation format: the RefCOCO-style COCO JSON used by the reference
(one image record per referring expression, 'caption' = expression).
Multi-host: each process evaluates its shard; metrics reduce via
process_allgather (eval/rec.py).
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
    ap.add_argument('--limit', type=int, default=0,
                    help='evaluate only the first N samples (0 = all)')
    ap.add_argument('--batch-size', type=int, default=8)
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
    from groma_tpu.eval.rec import evaluate_rec

    model, params, cfg = load_groma(args.model_dir)
    if args.tokenizer == 'stub':
        # checkpoint-free drill mode: the deterministic word-hash
        # tokenizer (tests/serving --tiny analogue) so the full kit runs
        # before real weights/tokenizers are available
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
    gen = Generator(model, params, max_len=cfg.max_seq_len + 8)

    coco = CocoIndex(args.ann_file)
    img_ids = coco.get_img_ids()
    if args.limit:
        img_ids = img_ids[:args.limit]
    # shard across hosts (reference: DistributedSampler per rank)
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
            x, y, w, h = anns[0]['bbox']
            box = np.array([[x, y, x + w, y + h]], np.float32)
            scale = np.array([spec.image_size / info['width'],
                              spec.image_size / info['height']] * 2,
                             np.float32)
            gt = xyxy_to_norm_cxcywh(box * scale,
                                     (spec.image_size, spec.image_size))[0]
            yield {'image': normalize(img448), 'expr': info['caption'],
                   'gt_box': gt}

    out = evaluate_rec(gen, samples(), tokenizer, spec,
                       batch_size=args.batch_size)
    # one line so scripts/run_rec_eval.sh can parse it from the log
    print(json.dumps(out))


if __name__ == '__main__':
    main()
