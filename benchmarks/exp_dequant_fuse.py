"""Does XLA fuse a bare int8->bf16 convert into the dot operand load?

ops/quant.py's prefill branch materializes the scaled bf16 dequant
((w*scale).astype(bf16) -> HLO temp -> dot), costing ~5x the weight
bytes in HBM traffic.  Per-output-channel scales commute with the dot:
    dot(x, (w*scale).bf16) == dot(x, w.bf16) * scale[None, :]
so if XLA fuses the scale-free convert into the operand stream, the
temp disappears.  Three variants at REC-prefill shapes (M=5120 = 8x640,
K=4096, N=12288 fused gate_up), 32-layer-equivalent loop:
  a) materialized scaled dequant (current)
  b) convert-only operand + output column scale
  c) direct mixed dot_general bf16 x s8 (XLA native mixed precision)
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

from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

M, K, N = 5120, 4096, 12288
DISPATCH = 0.030


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    s = jnp.asarray(rng.random(N) * 0.01 + 0.001, jnp.float32)

    def a_materialized(x, w, s):
        wd = (w.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return jax.lax.dot(x, wd, preferred_element_type=jnp.float32)

    def b_convert_only(x, w, s):
        o = jax.lax.dot(x, w.astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32)
        return o * s[None, :]

    def c_mixed(x, w, s):
        o = jax.lax.dot_general(x, w, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return o * s[None, :]

    for name, fn in (('a materialized', a_materialized),
                     ('b convert-only', b_convert_only),
                     ('c mixed bf16xs8', c_mixed)):
        try:
            f = jax.jit(lambda x, w, _fn=fn: jnp.sum(_fn(x, w, s)))
            dt = time_fn_ingraph(lambda x, w: f(x, w), (x, w), iters=64) \
                - DISPATCH / 64
            tf = 2 * M * K * N / dt / 1e12
            print(f'{name}: {dt * 1e3:7.3f} ms  {tf:6.1f} TF/s', flush=True)
        except Exception as e:  # noqa: BLE001
            print(f'{name}: FAILED {type(e).__name__}: {str(e)[:120]}',
                  flush=True)
    # numerics: b must equal a to bf16 tolerance
    oa = jax.jit(a_materialized)(x, w, s)
    ob = jax.jit(b_convert_only)(x, w, s)
    err = float(jnp.max(jnp.abs(oa - ob) / (jnp.abs(oa) + 1e-3)))
    print(f'# a-vs-b max rel err {err:.3e}', flush=True)


if __name__ == '__main__':
    main()
