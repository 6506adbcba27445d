"""Stage breakdown of the e2e REC pipeline (bench_e2e.py config).

bench_e2e measures ~969 ms/batch (b8, w8a8) but the known stage floors
sum to ~530 ms (vision 266 + prefill ~215 + decode ~50) — this profiler
times each stage as its own jit program to locate the remainder.

All timings: in-graph seed perturbation + scalar readback (tunnel-safe).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()


def main(batch=8):
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

    cfg = GromaConfig(
        llm=LlamaConfig(),
        perceiver=PerceiverConfig(vit=ViTConfig(dtype='bfloat16'),
                                  ddetr=DDETRConfig(dtype='bfloat16'),
                                  image_size=448))
    model = GromaModel(cfg)
    seq_len = 768
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

    def timed(name, fn, *args, iters=4):
        out = fn(*args)          # compile
        jax.tree_util.tree_map(
            lambda a: a.block_until_ready()
            if hasattr(a, 'block_until_ready') else a, out)
        t0 = time.time()
        for i in range(1, iters + 1):
            out = fn(*args, jnp.int32(i))
            # force a scalar fetch (readback ~30ms; subtracted below)
            leaves = [a for a in jax.tree_util.tree_leaves(out)
                      if hasattr(a, 'dtype')]
            float(leaves[0].reshape(-1)[0])
        dt = (time.time() - t0) / iters - 0.030
        print(f'{name:32s} {dt * 1e3:8.1f} ms')
        return dt

    # 1. vision + surgery (prepare_stream)
    @jax.jit
    def f_prep(params, image, ids, slot, valid0, seed=jnp.int32(0)):
        image = image + seed.astype(image.dtype) * 1e-9
        emb, fids, valid, vis = model.apply(
            {'params': params}, image, ids, slot, valid0,
            use_flash=True, method=GromaModel.prepare_stream)
        return emb, valid, vis['selected_boxes']

    timed('prepare_stream (vision+surgery)', f_prep,
          params, image, ids, slot, valid0)

    # materialize inputs for the LLM-only stages
    emb, valid, _ = f_prep(params, image, ids, slot, valid0)
    emb = jax.block_until_ready(emb)
    pos = jnp.maximum(jnp.cumsum(valid.astype(jnp.int32), -1) - 1, 0)

    # 2. LLM prefill, no cache write (logits only)
    def f_prefill(qp, emb, valid, pos, w8a8, seed=jnp.int32(0)):
        e = emb + seed.astype(emb.dtype) * 1e-9
        hidden, _ = quant_llama_forward(qp, cfg.llm, e, valid, pos,
                                        None, use_flash=True, w8a8=w8a8)
        return hidden

    f_prefill_nc = jax.jit(f_prefill, static_argnums=(4,))
    timed('prefill no-cache bf16-act', lambda *a: f_prefill_nc(*a[:4],
          False, a[-1] if len(a) > 4 else jnp.int32(0)),
          qp, emb, valid, pos)
    timed('prefill no-cache w8a8', lambda *a: f_prefill_nc(*a[:4],
          True, a[-1] if len(a) > 4 else jnp.int32(0)),
          qp, emb, valid, pos)

    # 3. prefill WITH cache creation + writes (the e2e configuration)
    def f_prefill_cache(qp, emb, valid, pos, seed=jnp.int32(0)):
        e = emb + seed.astype(emb.dtype) * 1e-9
        cache = make_kv_cache(cfg.llm, batch, max_len)
        hidden, cache = quant_llama_forward(qp, cfg.llm, e, valid, pos,
                                            cache, use_flash=True,
                                            w8a8=True)
        return hidden, cache['k'][0]

    timed('prefill + cache writes w8a8', jax.jit(f_prefill_cache),
          qp, emb, valid, pos)

    # 4. last-position logits (full 32k+114 vocab head)
    hidden = f_prefill_nc(qp, emb, valid, pos, False)
    hidden = jax.block_until_ready(hidden)
    last = jnp.argmax(pos, axis=-1)

    def f_logits(qp, hidden, seed=jnp.int32(0)):
        h = hidden + seed.astype(hidden.dtype) * 1e-9
        hh = jnp.take_along_axis(h, last[:, None, None], 1)
        lg = quant_llama_logits(qp, hh)
        extra = jnp.einsum('bsd,dv->bsv', hh.astype(jnp.bfloat16),
                           qp['extra_lm_head'],
                           preferred_element_type=jnp.float32)
        return jnp.concatenate([lg, extra], -1)

    timed('last-pos logits head', jax.jit(f_logits), qp, hidden)

    # 5. three decode steps (scan) from a ready cache
    _, _ = f_prefill_cache(qp, emb, valid, pos)

    def f_decode(qp, cache_seed):
        cache = make_kv_cache(cfg.llm, batch, max_len)
        cache['index'] = jnp.full((), seq_len, jnp.int32)
        logits0 = jnp.zeros((batch, base + cfg.num_new_token), jnp.float32)
        pos0 = jnp.full((batch, 1), seq_len, jnp.int32)

        def step(carry, i):
            logits, cache = carry
            tokk = jnp.argmax(logits, -1) + cache_seed * 0
            is_new = tokk >= base
            embt = jnp.where(
                is_new[..., None],
                qp['new_input_embs'][jnp.where(is_new, tokk - base, 0)],
                qp['embed_tokens'][jnp.where(is_new, 0, tokk)])[:, None]
            hidden, cache2 = quant_llama_forward(
                qp, cfg.llm, embt, jnp.ones((batch, 1), bool), pos0 + i,
                cache)
            return (f_logits(qp, hidden)[:, -1], cache2), tokk

        (_, _), toks = jax.lax.scan(step, (logits0, cache),
                                    jnp.arange(3))
        return toks

    timed('3 decode steps (incl cache alloc)', jax.jit(f_decode), qp)


if __name__ == '__main__':
    main(batch=int(sys.argv[1]) if len(sys.argv) > 1 else 8)
