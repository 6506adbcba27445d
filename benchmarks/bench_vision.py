"""Groma vision->region-token pipeline throughput (the driver headline).

Measures BASELINE.json configs 1-3 end-to-end: DINOv2-L encoder @448² ->
DDETR two-stage proposer (300 boxes) -> NMS top-100 select -> multi-level
RoIAlign region tokenization, i.e. the image -> region-token half of Groma
inference (reference call stack SURVEY §3.3 steps 1-7) at full model
scale, bf16 compute.

The whole measurement loop runs inside one jit (utils/profiling.py) so the
number is pure device throughput, immune to host transfer and to the
remote-execution tunnel's result caching.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import json

import numpy as np


def main(vision_int8=False):
    import dataclasses

    import jax
    import jax.numpy as jnp
    from groma_tpu.config import (DDETRConfig, GromaConfig, LlamaConfig,
                                  PerceiverConfig, ViTConfig)
    from groma_tpu.models.groma import GromaModel
    from groma_tpu.utils.profiling import time_fn_ingraph

    on_tpu = jax.devices()[0].platform == 'tpu'
    if on_tpu:
        vit = ViTConfig(dtype='bfloat16')                 # dinov2-large
        ddetr = DDETRConfig(dtype='bfloat16')             # shipped det cfg
        perceiver = PerceiverConfig(vit=vit, ddetr=ddetr, image_size=448)
        llm = LlamaConfig(num_layers=2)  # vision bench: LLM not exercised
        cfg = GromaConfig(llm=llm, perceiver=perceiver)
        batch = 8
        iters = 20      # >=20 amortizes the ~30ms tunnel dispatch to <1%
    else:  # CPU smoke fallback so the script always emits a line
        from __graft_entry__ import _small_cfg
        cfg = _small_cfg()
        batch = 2
        iters = 2
    if vision_int8:
        # opt-in int8 x int8 fuse/pconv convs (config.vision_int8)
        cfg = dataclasses.replace(cfg, vision_int8=True)

    model = GromaModel(cfg)
    img = cfg.perceiver.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, img, img, 3)),
                         jnp.float32)

    params = jax.jit(
        lambda im: model.init(jax.random.PRNGKey(0), im,
                              method=GromaModel.vision))(
        images[:1])['params']

    def vision_fn(params, images):
        # whole-kv Pallas flash for the ViT (see ops/flash_attention.py)
        out = model.apply({'params': params}, images,
                          method=GromaModel.vision, use_flash=on_tpu)
        return out['region_tokens']

    sec_per_iter = time_fn_ingraph(vision_fn, (params, images),
                                   iters=iters, perturb_arg=1)
    ips = batch / sec_per_iter
    name = ('vision_proposer_int8_images_per_sec' if vision_int8
            else 'vision_proposer_images_per_sec')
    print(json.dumps({
        'metric': name,
        'value': round(ips, 3),
        'unit': 'images/sec',
        'vs_baseline': round(ips, 3),
    }), flush=True)
    print(f'# platform={jax.devices()[0].platform} batch={batch} '
          f'iters={iters} sec/iter={sec_per_iter:.4f}', file=sys.stderr)
    print('# vs_baseline is the raw value: the reference publishes no '
          'throughput numbers and no A100 is reachable here (SURVEY §6)',
          file=sys.stderr)


if __name__ == '__main__':
    main(vision_int8='--int8' in sys.argv)
