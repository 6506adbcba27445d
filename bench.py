"""Benchmark: Groma vision->region-token pipeline throughput on TPU.

Measures BASELINE.json configs 1-3 end-to-end on real hardware: DINOv2-L
encoder @448² -> DDETR two-stage proposer (300 boxes) -> NMS top-100 select
-> multi-level RoIAlign region tokenization, i.e. everything in the image ->
region-tokens half of Groma inference (reference call stack SURVEY §3.3
steps 1-7), at full model scale with bf16 compute.

Prints ONE JSON line: images/sec.  vs_baseline is vs the driver target of
3x an A100 running the PyTorch reference; the reference publishes no
throughput numbers (SURVEY §6), so until an A100 measurement lands in
BASELINE.md the field reports value/target_placeholder=1.0-relative.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.devices()[0].platform == 'tpu'
    from groma_tpu.config import (DDETRConfig, GromaConfig, LlamaConfig,
                                  PerceiverConfig, ViTConfig)
    from groma_tpu.models.groma import GromaModel

    if on_tpu:
        vit = ViTConfig(dtype='bfloat16')                 # dinov2-large
        ddetr = DDETRConfig(dtype='bfloat16')             # shipped det cfg
        perceiver = PerceiverConfig(vit=vit, ddetr=ddetr, image_size=448)
        llm = LlamaConfig(num_layers=2)  # vision bench: LLM not exercised
        cfg = GromaConfig(llm=llm, perceiver=perceiver)
        batch = 4
        iters, warmup = 20, 3
    else:  # CPU smoke fallback so the script always emits a line
        from __graft_entry__ import _small_cfg
        cfg = _small_cfg()
        batch = 2
        iters, warmup = 3, 1

    model = GromaModel(cfg)
    img = cfg.perceiver.image_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.standard_normal((batch, img, img, 3)),
                         jnp.float32)

    init_images = images[:1]
    params = jax.jit(
        lambda im: model.init(jax.random.PRNGKey(0), im,
                              method=GromaModel.vision))(init_images)['params']

    @jax.jit
    def vision_fn(params, images):
        out = model.apply({'params': params}, images,
                          method=GromaModel.vision)
        return (out['region_tokens'], out['selected_boxes'],
                out['selected_mask'], out['image_tokens'])

    # compile + warmup
    out = vision_fn(params, images)
    jax.block_until_ready(out)
    for _ in range(warmup):
        jax.block_until_ready(vision_fn(params, images))

    t0 = time.perf_counter()
    for _ in range(iters):
        out = vision_fn(params, images)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    print(json.dumps({
        'metric': 'vision_proposer_images_per_sec',
        'value': round(ips, 3),
        'unit': 'images/sec',
        'vs_baseline': round(ips, 3),
    }))
    print(f'# platform={jax.devices()[0].platform} batch={batch} '
          f'iters={iters} total_s={dt:.2f}', file=sys.stderr)


if __name__ == '__main__':
    main()
