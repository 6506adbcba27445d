"""Detector-only visualization demo (reference: groma/eval/run_ddetr.py).

Runs the Perceiver on one image and draws the surviving proposals using
the reference's demo-time selection rule: NMS(0.8) + fused-score threshold
``coco^0.3 * sa1b^0.7 >= 0.4`` (reference: run_ddetr.py:64-69 — note the
exponents differ from the 0.4/0.6 used inside GromaModel, groma.py:249;
both are preserved where they occur).
"""

from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-dir', default=None,
                    help='perceiver checkpoint (HF CustomDDETR format)')
    ap.add_argument('--tiny', action='store_true',
                    help='random-weight tiny detector (smoke test)')
    ap.add_argument('--image-file', required=True)
    ap.add_argument('--output-image', default='ddetr_output.jpg')
    ap.add_argument('--nms-thres', type=float, default=0.8)
    ap.add_argument('--score-thres', type=float, default=0.4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from groma_tpu.checkpoint.hf_import import (import_perceiver,
                                                load_config_json,
                                                load_state_dict)
    from groma_tpu.checkpoint.loader import hf_groma_config
    from groma_tpu.data.image_pipeline import load_image, normalize, resize
    from groma_tpu.eval.run_groma import draw_boxes
    from groma_tpu.models.perceiver import Perceiver
    from groma_tpu.ops.bbox import cxcywh_to_xyxy
    from groma_tpu.ops.nms import nms

    if args.tiny:
        from groma_tpu.config import tiny_groma_config
        cfg = tiny_groma_config().perceiver
        params = None
    elif args.model_dir:
        cfg_d = load_config_json(args.model_dir)
        cfg = hf_groma_config({'perceiver_cfg': cfg_d}).perceiver
        sd = load_state_dict(args.model_dir)
        params = import_perceiver(
            sd, cfg.vit.num_layers, cfg.ddetr.encoder_layers,
            cfg.ddetr.decoder_layers, cfg.ddetr.num_feature_levels,
            patch_size=cfg.vit.patch_size,
            deploy_grid=cfg.image_size // cfg.vit.patch_size)
    else:
        ap.error('--model-dir or --tiny is required')

    raw = load_image(args.image_file)
    img448, _ = resize(raw, (cfg.image_size, cfg.image_size))
    img = jnp.asarray(normalize(img448)[None])

    model = Perceiver(cfg)
    if params is None:
        params = jax.jit(
            lambda im: model.init(jax.random.PRNGKey(0), im))(
            img)['params']
    out = jax.jit(lambda p, im: model.apply({'params': p}, im))(
        params, img)
    boxes = out['pred_boxes'][0]
    s_coco = jax.nn.sigmoid(out['logits']['coco'][0, :, 0])
    s_sa1b = jax.nn.sigmoid(out['logits']['sa1b'][0, :, 0])
    # demo-time fusion exponents (reference: run_ddetr.py:69)
    scores = s_coco ** 0.3 * s_sa1b ** 0.7
    keep_idx, keep_mask = nms(cxcywh_to_xyxy(boxes), scores,
                              args.nms_thres, args.score_thres, max_num=100)
    kept = np.asarray(keep_idx)[np.asarray(keep_mask)]
    sel = np.asarray(boxes)[kept]
    print(f'{len(sel)} boxes above threshold')
    draw_boxes(img448, sel, args.output_image)
    print(f'wrote {args.output_image}')


if __name__ == '__main__':
    main()
