"""In-graph microbench of the prefill matmul paths at b8 REC shapes.

M = 8 x 768 = 6144 prompt rows against the 7B projections.  Compares
bf16 dot / weight-only int8 (Pallas dequant kernel, tuned for decode) /
w8a8 (XLA int8 x int8).  Decides which path prefill should take per
matmul family.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from groma_tpu.ops.quant import (int8_matmul, quantize_weight,  # noqa: E402
                                 w8a8_matmul)
from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402


def main():
    rng = np.random.default_rng(0)
    M = 6144
    shapes = [('qkv', 4096, 12288), ('o', 4096, 4096),
              ('gate_up', 4096, 22016), ('down', 11008, 4096)]
    for name, K, N in shapes:
        x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, N)) * 0.02, jnp.bfloat16)
        q, s = quantize_weight(w)
        q = jax.block_until_ready(q)
        gflop = 2 * M * K * N / 1e9

        t = time_fn_ingraph(
            lambda a, b: jnp.sum(jax.lax.dot(
                a, b, preferred_element_type=jnp.float32)),
            (x, w), iters=32)
        print(f'{name:8s} bf16      {t*1e3:7.3f} ms {gflop/t/1e3:6.0f} TF/s')

        t = time_fn_ingraph(
            lambda a, b, c: jnp.sum(int8_matmul(a, b, c)),
            (x.astype(jnp.float32), q, s), iters=32)
        print(f'{name:8s} int8-wo   {t*1e3:7.3f} ms {gflop/t/1e3:6.0f} TF/s')

        t = time_fn_ingraph(
            lambda a, b, c: jnp.sum(w8a8_matmul(a, b, c)),
            (x.astype(jnp.float32), q, s), iters=32)
        print(f'{name:8s} w8a8      {t*1e3:7.3f} ms {gflop/t/1e3:6.0f} TF/s')


if __name__ == '__main__':
    main()
