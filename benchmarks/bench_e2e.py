"""End-to-end Groma-7B REC inference (BASELINE config 4).

Image -> DINOv2-L -> DDETR proposals -> NMS top-100 -> region tokens ->
token surgery -> Vicuna-7B prefill (768-slot REC stream, Pallas flash) ->
3-token decode -> ``<rK>`` -> box.  Vision runs bf16; the 7B decoder runs
weight-only int8 (models/llama_quant.py).  Measured (round 2): 5.3 img/s
bs1, 5.9 bs4, 6.4 bs8 on one v5e chip (round 1: 2.08 bs1, OOM bs4).

The whole per-image pipeline is ONE jitted program; timing is
seed-perturbed fetch-forced (tunnel-safe).
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


def main(batch=1, w8a8=False, vision_int8=False, regions=0):
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
    if on_tpu:
        cfg = GromaConfig(
            llm=LlamaConfig(),
            perceiver=PerceiverConfig(vit=ViTConfig(dtype='bfloat16'),
                                      ddetr=DDETRConfig(dtype='bfloat16'),
                                      image_size=448))
        decode_steps = 3       # REC emits <r K> </roi> style short answers
    else:
        from __graft_entry__ import _small_cfg
        cfg = _small_cfg()
        decode_steps = 2
    if vision_int8:
        cfg = dataclasses.replace(cfg, vision_int8=True)
    if regions and not on_tpu:
        print('# --regions is a TPU serving knob; ignored on the tiny '
              'CPU config', file=sys.stderr)
        regions = 0
    if regions:
        # SERVING-config knob (opt-in, NOT the reference eval protocol):
        # the reference ships max_region_num=100, but REC scenes rarely
        # keep >50 NMS survivors at thres 0.15/0.6 — fewer region slots
        # shrink the post-surgery stream (2 tokens per slot) and with it
        # every prefill matmul row.  Emitted under a _regN metric suffix
        # so the protocol-default series stays untouched.
        cfg = dataclasses.replace(cfg, max_region_num=regions)

    model = GromaModel(cfg)
    # REC prompts are ~520 tokens post-surgery; a 640-slot stream (not the
    # generic 2048) keeps prefill compute and the KV cache proportionate.
    # 768 -> 640 (round 4): full-prefill 673 -> 494 ms measured (the
    # attention policy also routes s<1024 to XLA dense — see
    # models/llama.py FLASH_MIN_SEQ / benchmarks/exp_prefill_policy.py)
    seq_len = 640 if on_tpu else cfg.max_seq_len
    if regions and on_tpu:
        seq_len = max(384, 640 - (-(-2 * (100 - regions) // 64)) * 64)
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
    import numpy as _np
    ids = jnp.asarray(_np.stack([t['input_ids']] * batch))
    slot = jnp.asarray(_np.stack([t['region_slot']] * batch))
    valid0 = jnp.asarray(_np.stack([t['valid']] * batch))

    # vision-side params only (prepare_stream never touches the LLM)
    t0 = time.time()
    params = jax.jit(
        lambda im, i, s, v: model.init(jax.random.PRNGKey(0), im, i, s, v,
                                       method=GromaModel.prepare_stream)
    )(image, ids, slot, valid0)['params']
    # bf16 param storage for inference (halves the ~2.5 GB vision tree)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)
    print(f'# vision init {time.time() - t0:.1f}s', file=sys.stderr)

    # synthetic int8 LLM weights (random real ones load the same way via
    # eval/generate_quant.quantize_groma_llm)
    from _fixtures import mk_llama_quant_params
    qp = mk_llama_quant_params(cfg.llm, bits=8,
                               num_new_token=cfg.num_new_token,
                               pad_vocab=False)

    max_len = (576 if on_tpu else seq_len) + 8
    base = cfg.llm.vocab_size

    def logits_fn(qp, hidden):
        lg = quant_llama_logits(qp, hidden)
        extra = jnp.einsum('bsd,dv->bsv', hidden.astype(jnp.bfloat16),
                           qp['extra_lm_head'],
                           preferred_element_type=jnp.float32)
        return jnp.concatenate([lg, extra], axis=-1)

    # prefill the COMPACTED stream: ~522 valid tokens in the 640-slot
    # template -> one 576-slot gap-free buffer (exact; models/groma.py
    # compact_stream), removing 10% of every prefill matmul's rows
    from groma_tpu.models.groma import compact_stream
    prefill_len = 576 if on_tpu else seq_len
    if regions and on_tpu:
        prefill_len = max(320, 576 - (-(-2 * (100 - regions) // 64)) * 64)

    def e2e(params, qp, image, ids, slot, valid0, seed):
        image = image + seed.astype(image.dtype) * 1e-9
        emb, fids, valid, vis = model.apply(
            {'params': params}, image, ids, slot, valid0,
            use_flash=on_tpu, method=GromaModel.prepare_stream)
        # compact_stream capacity guard: emitted alongside the result so
        # the first (compile) run can assert host-side that no row
        # overflows prefill_len (silent prompt-token drop otherwise)
        max_valid = valid.sum(-1).max()
        emb, valid = compact_stream(emb, valid, prefill_len)
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
                + vis['selected_boxes'].sum().astype(jnp.float32),
                max_valid)

    run = jax.jit(e2e)
    t0 = time.time()
    _, max_valid = run(params, qp, image, ids, slot, valid0, jnp.int32(0))
    print(f'# e2e compile+first run {time.time() - t0:.1f}s',
          file=sys.stderr)
    if int(max_valid) > prefill_len:
        raise ValueError(
            f'compact_stream capacity exceeded: a row carries '
            f'{int(max_valid)} valid tokens > prefill_len={prefill_len}')
    t0 = time.time()
    n = 3
    for i in range(1, n + 1):
        v = float(run(params, qp, image, ids, slot, valid0,
                      jnp.int32(i))[0])
    dt = (time.time() - t0) / n
    suffix = ('_w8a8' if w8a8 else '') + \
        ('_int8vision' if vision_int8 else '') + \
        (f'_reg{regions}' if regions else '')
    print(json.dumps({
        'metric': f'groma7b_e2e_rec{suffix}_images_per_sec',
        'value': round(batch / dt, 3),
        'unit': 'images/sec',
        'vs_baseline': round(batch / dt, 3),
    }), flush=True)
    print(f'# {dt * 1000:.0f} ms/batch (prefill {t["valid"].sum()} tokens '
          f'+ {decode_steps} decode steps, bs {batch})', file=sys.stderr)
    # pipelined throughput: dispatch every batch asynchronously and sync
    # once at the end — the serving regime, where host prep / tunnel
    # round-trips for batch N+1 overlap device compute of batch N.  The
    # per-batch fetch above charges one host round-trip (~30 ms on the
    # tunnel) to every batch; a real pipeline pays it once per stream.
    npipe = 12
    t0 = time.time()
    outs = [run(params, qp, image, ids, slot, valid0, jnp.int32(100 + i))
            for i in range(npipe)]
    jax.block_until_ready(outs)
    dtp = (time.time() - t0) / npipe
    print(json.dumps({
        'metric': f'groma7b_e2e_rec{suffix}_pipelined_images_per_sec',
        'value': round(batch / dtp, 3),
        'unit': 'images/sec',
        'vs_baseline': round(batch / dtp, 3),
    }), flush=True)
    print(f'# pipelined {dtp * 1000:.0f} ms/batch over {npipe} async '
          f'batches', file=sys.stderr)


if __name__ == '__main__':
    import jax as _jax
    _default = 8 if _jax.devices()[0].platform == 'tpu' else 1
    _pos = [a for a in sys.argv[1:] if not a.startswith('-')]
    _reg = 0
    for _a in sys.argv[1:]:
        if _a.startswith('--regions='):
            _reg = int(_a.split('=')[1])
    main(batch=int(_pos[0]) if _pos else _default,
         w8a8='--w8a8' in sys.argv,
         vision_int8='--int8vision' in sys.argv,
         regions=_reg)
