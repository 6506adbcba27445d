"""Single-image chat demo CLI (reference: groma/eval/run_groma.py).

Loads a Groma checkpoint, runs one grounded-chat turn on an image, prints
the answer with ``<rK>`` tokens resolved to boxes, and optionally draws the
referenced boxes onto an output image (PIL; the reference uses the same
box-drawing approach).  Quantization switch parity: 'none' | 'bf16' |
'int8' | 'int4' (weight-only Pallas dequant matmuls — the TPU equivalents
of the reference's bitsandbytes load_in_8bit / load_in_4bit-nf4; released
bnb-nf4 checkpoints import through the nf4 codec in ops/quant4.py).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def draw_boxes(image: 'np.ndarray', boxes_cxcywh, path: str):
    from PIL import Image, ImageDraw
    im = Image.fromarray(image.astype(np.uint8))
    d = ImageDraw.Draw(im)
    w, h = im.size
    for b in boxes_cxcywh:
        x1 = (b[0] - b[2] / 2) * w
        y1 = (b[1] - b[3] / 2) * h
        x2 = (b[0] + b[2] / 2) * w
        y2 = (b[1] + b[3] / 2) * h
        d.rectangle([x1, y1, x2, y2], outline=(255, 0, 0), width=3)
    im.save(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-dir', default=None,
                    help='checkpoint dir (orbax or HF-format)')
    ap.add_argument('--tiny', action='store_true',
                    help='random-weight tiny model (pipeline smoke test)')
    ap.add_argument('--image-file', required=True)
    ap.add_argument('--query', required=True)
    ap.add_argument('--tokenizer', default=None,
                    help='HF tokenizer path (defaults to model dir)')
    ap.add_argument('--quant_type', default='none',
                    choices=['none', 'bf16', 'int8', 'int4'])
    ap.add_argument('--kv-bits', type=int, default=16, choices=[16, 8],
                    help='8 = int8 KV cache (quantized paths only)')
    ap.add_argument('--spec-lookahead', type=int, default=0,
                    help='>0: prompt-lookup speculative decoding with G '
                         'draft tokens per verify (exact greedy; '
                         'quantized/bf16-tree paths)')
    ap.add_argument('--max-new-tokens', type=int, default=1024)
    ap.add_argument('--output-image', default='output.jpg')
    args = ap.parse_args()

    import jax.numpy as jnp


    from groma_tpu.data.conversation import conv_templates
    from groma_tpu.data.datasets.base import (VLDataSpec,
                                              intro_conversation)
    from groma_tpu.data.image_pipeline import load_image, normalize, resize
    from groma_tpu.data.tokenization import expand_template
    from groma_tpu.data.tokenizer import load_tokenizer
    from groma_tpu.checkpoint.loader import load_groma
    from groma_tpu.eval.generate import Generator, parse_region_tokens


    model_dir = 'tiny' if args.tiny else args.model_dir
    if not model_dir:
        ap.error('--model-dir or --tiny is required')
    model, params, cfg = load_groma(model_dir,
                                    dtype='bfloat16' if args.quant_type
                                    == 'bf16' else None)
    if model_dir == 'tiny':
        from groma_tpu.data.tokenizer import StubTokenizer
        tokenizer = StubTokenizer(cfg.llm.vocab_size, cfg.max_seq_len)
    else:
        tokenizer = load_tokenizer(args.tokenizer or model_dir,
                                   model_max_length=cfg.max_seq_len)
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=cfg.max_seq_len,
                      image_size=cfg.perceiver.image_size)

    raw = load_image(args.image_file)
    img448, _ = resize(raw, (spec.image_size, spec.image_size))
    img = normalize(img448)

    conv = conv_templates['llava']
    messages = intro_conversation(conv)
    messages.append((conv.roles[0], args.query))
    messages.append((conv.roles[1], None))
    ids = tokenizer.encode(conv.get_prompt(messages))
    t = expand_template(ids, None, tokenizer.sp, spec.num_image_tokens,
                        spec.max_region_num, spec.max_seq_len)

    if args.quant_type in ('bf16', 'int8', 'int4'):
        # 'bf16' uses the fused qkv/gate_up bf16 tree (bits=16): same
        # decode programs as the quantized paths, fewer weight streams
        from groma_tpu.eval.generate_quant import (QuantGenerator,
                                                   quantize_groma_llm)
        qp = quantize_groma_llm(
            params, cfg,
            bits={'bf16': 16, 'int8': 8, 'int4': 4}[args.quant_type])
        gen = QuantGenerator(model, params, qp,
                             max_len=cfg.max_seq_len + 64,
                             kv_bits=args.kv_bits,
                             spec_lookahead=args.spec_lookahead)
    else:
        gen = Generator(model, params, max_len=cfg.max_seq_len + 64)
    tokens, vis = gen.generate(
        jnp.asarray(img[None]), jnp.asarray(t['input_ids'][None]),
        jnp.asarray(t['region_slot'][None]), jnp.asarray(t['valid'][None]),
        max_new_tokens=args.max_new_tokens, eos_id=tokenizer.sp.eos)

    text = tokenizer.decode([tok for tok in tokens[0]
                             if tok != tokenizer.sp.eos])
    print(text)

    ks = parse_region_tokens(tokens, tokenizer.sp.box_idx_start)[0]
    cap = vis['selected_mask'].shape[1]
    boxes = [vis['selected_boxes'][0, k] for k in ks
             if k < cap and vis['selected_mask'][0, k]]
    if boxes:
        draw_boxes(img448, boxes, args.output_image)
        print(f'drew {len(boxes)} boxes -> {args.output_image}')


if __name__ == '__main__':
    main()
