"""Interactive chat CLI (reference: groma/serve/cli.py — which imported a
nonexistent module; this one drives the real pipeline)."""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--model-dir', required=True)
    ap.add_argument('--image-file', required=True)
    ap.add_argument('--tokenizer', default=None)
    ap.add_argument('--max-new-tokens', type=int, default=256)
    a = ap.parse_args()

    import jax.numpy as jnp

    from groma_tpu.checkpoint.loader import load_groma
    from groma_tpu.data.conversation import conv_templates
    from groma_tpu.data.datasets.base import VLDataSpec, intro_conversation
    from groma_tpu.data.image_pipeline import load_image, normalize, resize
    from groma_tpu.data.tokenization import expand_template
    from groma_tpu.data.tokenizer import load_tokenizer
    from groma_tpu.eval.generate import Generator, parse_region_tokens

    model, params, cfg = load_groma(a.model_dir)
    tokenizer = load_tokenizer(a.tokenizer or a.model_dir, cfg.max_seq_len)
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=cfg.max_seq_len,
                      image_size=cfg.perceiver.image_size)
    img, _ = resize(load_image(a.image_file), (spec.image_size,) * 2)
    img = normalize(img)
    gen = Generator(model, params, max_len=cfg.max_seq_len + 64)
    conv = conv_templates['llava']
    history = intro_conversation(conv)

    while True:
        try:
            query = input('USER: ')
        except EOFError:
            break
        if not query.strip():
            break
        messages = history + [(conv.roles[0], query),
                              (conv.roles[1], None)]
        ids = tokenizer.encode(conv.get_prompt(messages))
        t = expand_template(ids, None, tokenizer.sp,
                            spec.num_image_tokens, spec.max_region_num,
                            spec.max_seq_len)
        tokens, vis = gen.generate(
            jnp.asarray(img[None]), jnp.asarray(t['input_ids'][None]),
            jnp.asarray(t['region_slot'][None]),
            jnp.asarray(t['valid'][None]),
            max_new_tokens=a.max_new_tokens, eos_id=tokenizer.sp.eos)
        text = tokenizer.decode([tok for tok in tokens[0]
                                 if tok != tokenizer.sp.eos])
        ks = parse_region_tokens(tokens, tokenizer.sp.box_idx_start)[0]
        print(f'ASSISTANT: {text}')
        if ks:
            cap = vis['selected_mask'].shape[1]
            boxes = [vis['selected_boxes'][0, k].tolist() for k in ks
                     if k < cap and vis['selected_mask'][0, k]]
            print(f'  grounded boxes (cxcywh): {boxes}')
        messages[-1] = (conv.roles[1], text)
        history = messages


if __name__ == '__main__':
    main()
