"""Benchmark: Groma vision->region-token pipeline throughput on TPU.

Measures BASELINE.json configs 1-3 end-to-end on real hardware: DINOv2-L
encoder @448² -> DDETR two-stage proposer (300 boxes) -> NMS top-100 select
-> multi-level RoIAlign region tokenization, i.e. the image -> region-token
half of Groma inference (reference call stack SURVEY §3.3 steps 1-7) at
full model scale, bf16 compute.

The whole measurement loop runs inside one jit (utils/profiling.py) so the
number is pure device throughput, immune to host transfer and to the
remote-execution tunnel's result caching.

Prints ONE JSON line: images/sec.  The reference publishes no throughput
numbers (SURVEY §6); the driver target is 3x an unmeasured A100 baseline,
so vs_baseline reports the raw value until an A100 number lands.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def _run_sub(script, args=(), timeout=1200):
    """Run a benchmark script in a subprocess (fresh HBM) and forward its
    JSON metric lines; failures are reported but never break the headline
    measurement."""
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(here, script), *args],
            capture_output=True, text=True, timeout=timeout)
        for line in proc.stdout.splitlines():
            line = line.strip()
            if not line.startswith('{'):
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            d.setdefault('vs_baseline', d.get('value'))
            print(json.dumps(d), flush=True)
        if proc.returncode != 0:
            print(f'# {script} rc={proc.returncode}: '
                  f'{proc.stderr.strip().splitlines()[-1][:200] if proc.stderr.strip() else ""}',
                  file=sys.stderr)
    except subprocess.TimeoutExpired:
        print(f'# {script} timed out', file=sys.stderr)


def main():
    # secondary metrics first (train-step MFU/throughput, int8 decode,
    # e2e); the driver-parsed headline (vision img/s) prints LAST
    _run_sub('benchmarks/bench_train.py')
    _run_sub('benchmarks/bench_decode_int8.py', timeout=2400)
    _run_sub('benchmarks/bench_decode_int4.py', timeout=2400)
    _run_sub('benchmarks/bench_e2e.py')
    import jax
    import jax.numpy as jnp
    try:  # persistent compile cache: big win under remote compile
        jax.config.update('jax_compilation_cache_dir',
                          '/root/repo/.jax_cache')
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 5)
    except Exception:
        pass

    on_tpu = jax.devices()[0].platform == 'tpu'
    from groma_tpu.config import (DDETRConfig, GromaConfig, LlamaConfig,
                                  PerceiverConfig, ViTConfig)
    from groma_tpu.models.groma import GromaModel
    from groma_tpu.utils.profiling import time_fn_ingraph

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
        # whole-kv Pallas flash for the ViT (1.06 vs 1.49 ms/layer XLA
        # at 1025-seq d64 bf16)
        out = model.apply({'params': params}, images,
                          method=GromaModel.vision, use_flash=on_tpu)
        return out['region_tokens']

    sec_per_iter = time_fn_ingraph(vision_fn, (params, images),
                                   iters=iters, perturb_arg=1)
    ips = batch / sec_per_iter
    print(json.dumps({
        'metric': 'vision_proposer_images_per_sec',
        'value': round(ips, 3),
        'unit': 'images/sec',
        'vs_baseline': round(ips, 3),
    }))
    print(f'# platform={jax.devices()[0].platform} batch={batch} '
          f'iters={iters} sec/iter={sec_per_iter:.4f}', file=sys.stderr)
    print('# vs_baseline is the raw value: the reference publishes no '
          'throughput numbers and no A100 is reachable here (SURVEY §6)',
          file=sys.stderr)


if __name__ == '__main__':
    main()
