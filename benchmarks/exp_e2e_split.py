"""Locate the e2e REC residual: time PREFIXES of the one-program e2e.

exp_e2e_pieces.py times stages as separate programs, but holding every
stage's inputs live inflates readings under HBM pressure (observed 3-5x
vs the same stages inside bench_e2e's single program).  This experiment
instead times three SELF-CONTAINED prefix programs of the exact
bench_e2e pipeline and differences them:

  A vision+surgery only
  B + LLM prefill (no cache) + last-pos logits   (first-token program)
  C + kv-cache creation/writes + 3-step decode   (= bench_e2e)

B-A = prefill+logits cost inside the fused program; C-B = cache+decode.
Flags: --w8a8 --int8vision (same semantics as bench_e2e).
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()


def main(batch=8, w8a8=False, vision_int8=False):
    import dataclasses
    import jax
    import jax.numpy as jnp

    from groma_tpu.config import (DDETRConfig, GromaConfig, LlamaConfig,
                                  PerceiverConfig, ViTConfig)
    from groma_tpu.data.datasets.base import VLDataSpec
    from groma_tpu.data.tokenizer import StubTokenizer
    from groma_tpu.eval.rec import build_rec_prompt
    from groma_tpu.models.groma import GromaModel
    from groma_tpu.models.llama import make_kv_cache
    from groma_tpu.models.llama_quant import (quant_llama_forward,
                                              quant_llama_logits)

    on_tpu = jax.devices()[0].platform == 'tpu'
    cfg = GromaConfig(
        llm=LlamaConfig(),
        perceiver=PerceiverConfig(vit=ViTConfig(dtype='bfloat16'),
                                  ddetr=DDETRConfig(dtype='bfloat16'),
                                  image_size=448)) if on_tpu else None
    if not on_tpu:
        from __graft_entry__ import _small_cfg
        cfg = _small_cfg()
    if vision_int8:
        cfg = dataclasses.replace(cfg, vision_int8=True)
    decode_steps = 3 if on_tpu else 2

    model = GromaModel(cfg)
    seq_len = 768 if on_tpu else cfg.max_seq_len
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=seq_len,
                      image_size=cfg.perceiver.image_size)
    tok = StubTokenizer(base_vocab=cfg.llm.vocab_size)
    t = build_rec_prompt('the red object on the left', tok, spec)
    img_sz = cfg.perceiver.image_size
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.standard_normal((batch, img_sz, img_sz, 3)),
                        jnp.float32)
    ids = jnp.asarray(np.stack([t['input_ids']] * batch))
    slot = jnp.asarray(np.stack([t['region_slot']] * batch))
    valid0 = jnp.asarray(np.stack([t['valid']] * batch))

    params = jax.jit(
        lambda im, i, s, v: model.init(jax.random.PRNGKey(0), im, i, s, v,
                                       method=GromaModel.prepare_stream)
    )(image, ids, slot, valid0)['params']
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)

    from _fixtures import mk_llama_quant_params
    qp = mk_llama_quant_params(cfg.llm, bits=8,
                               num_new_token=cfg.num_new_token,
                               pad_vocab=False)
    max_len = seq_len + 8
    base = cfg.llm.vocab_size

    def logits_fn(qp, hidden):
        lg = quant_llama_logits(qp, hidden)
        extra = jnp.einsum('bsd,dv->bsv', hidden.astype(jnp.bfloat16),
                           qp['extra_lm_head'],
                           preferred_element_type=jnp.float32)
        return jnp.concatenate([lg, extra], axis=-1)

    def prefix_a(params, qp, image, ids, slot, valid0, seed):
        image = image + seed.astype(image.dtype) * 1e-9
        emb, fids, valid, vis = model.apply(
            {'params': params}, image, ids, slot, valid0,
            use_flash=on_tpu, method=GromaModel.prepare_stream)
        return (emb.sum().astype(jnp.float32)
                + vis['selected_boxes'].sum().astype(jnp.float32))

    def prefix_b(params, qp, image, ids, slot, valid0, seed):
        image = image + seed.astype(image.dtype) * 1e-9
        emb, fids, valid, vis = model.apply(
            {'params': params}, image, ids, slot, valid0,
            use_flash=on_tpu, method=GromaModel.prepare_stream)
        pos = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
        hidden, _ = quant_llama_forward(qp, cfg.llm, emb, valid, pos,
                                        None, use_flash=on_tpu, w8a8=w8a8)
        last = jnp.argmax(pos, axis=-1)
        logits = logits_fn(
            qp, jnp.take_along_axis(hidden, last[:, None, None], 1))[:, 0]
        return (logits.sum()
                + vis['selected_boxes'].sum().astype(jnp.float32))

    def prefix_c(params, qp, image, ids, slot, valid0, seed):
        image = image + seed.astype(image.dtype) * 1e-9
        emb, fids, valid, vis = model.apply(
            {'params': params}, image, ids, slot, valid0,
            use_flash=on_tpu, method=GromaModel.prepare_stream)
        pos = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)
        cache = make_kv_cache(cfg.llm, batch, max_len)
        hidden, cache = quant_llama_forward(qp, cfg.llm, emb, valid, pos,
                                            cache, use_flash=on_tpu,
                                            w8a8=w8a8)
        last = jnp.argmax(pos, axis=-1)
        logits = logits_fn(
            qp, jnp.take_along_axis(hidden, last[:, None, None], 1))[:, 0]
        pos0 = jnp.take_along_axis(pos, last[:, None], -1) + 1

        def step(carry, i):
            logits, cache = carry
            tokk = jnp.argmax(logits, -1)
            is_new = tokk >= base
            embt = jnp.where(
                is_new[..., None],
                qp['new_input_embs'][jnp.where(is_new, tokk - base, 0)],
                qp['embed_tokens'][jnp.where(is_new, 0, tokk)])[:, None]
            hidden, cache2 = quant_llama_forward(
                qp, cfg.llm, embt, jnp.ones((batch, 1), bool), pos0 + i,
                cache)
            return (logits_fn(qp, hidden)[:, -1], cache2), tokk

        (_, _), toks = jax.lax.scan(step, (logits, cache),
                                    jnp.arange(decode_steps))
        return (toks.sum().astype(jnp.float32)
                + vis['selected_boxes'].sum().astype(jnp.float32))

    results = {}
    for name, fn in (('A_vision', prefix_a), ('B_first_token', prefix_b),
                     ('C_full_e2e', prefix_c)):
        run = jax.jit(fn)
        t0 = time.time()
        float(run(params, qp, image, ids, slot, valid0, jnp.int32(0)))
        print(f'# {name} compile+first {time.time() - t0:.1f}s',
              file=sys.stderr)
        n = 4
        t0 = time.time()
        for i in range(1, n + 1):
            float(run(params, qp, image, ids, slot, valid0, jnp.int32(i)))
        dt = (time.time() - t0) / n
        results[name] = dt
        print(f'{name:16s} {dt * 1e3:8.1f} ms/batch', flush=True)

    a, b, c = (results['A_vision'], results['B_first_token'],
               results['C_full_e2e'])
    print(f'prefill+logits (B-A)  {(b - a) * 1e3:8.1f} ms', flush=True)
    print(f'cache+decode   (C-B)  {(c - b) * 1e3:8.1f} ms', flush=True)
    print(json.dumps({'metric': 'e2e_split_ms',
                      'value': {k: round(v * 1e3, 1)
                                for k, v in results.items()},
                      'unit': 'ms'}), flush=True)


if __name__ == '__main__':
    _pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    main(batch=int(_pos[0]) if _pos else
         (8 if os.environ.get('JAX_PLATFORMS', 'axon') != 'cpu' else 1),
         w8a8='--w8a8' in sys.argv,
         vision_int8='--int8vision' in sys.argv)
