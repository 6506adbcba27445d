"""Where does bf16 B=1 decode lose vs HBM speed-of-light?

7B bf16 weights are ~13.2 GB; at v5e's ~819 GB/s HBM that is a 16.1 ms
floor -> ~62 tok/s.  Measured decode is 48.3 tok/s (20.7 ms), so ~4.6 ms
/step is not weight streaming.  This probe times the pieces:

* one dense bf16 matvec at each decode matmul shape (achieved GB/s)
* a full 32-layer synthetic matmul-only chain (no attention/norms)
* the real quant=None decode step for comparison

Run on TPU: python benchmarks/exp_bf16_decode.py
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

DISPATCH = 0.030
D, FF, L, V = 4096, 11008, 32, 32128


def main():
    rng = np.random.default_rng(0)

    def mk(m, n):
        return jnp.asarray(rng.standard_normal((m, n)) * 0.02, jnp.bfloat16)

    # per-shape matvec bandwidth
    for name, m, n in (('qkvo 4096x4096', D, D),
                       ('gate_up 4096x22016', D, 2 * FF),
                       ('down 11008x4096', FF, D),
                       ('lm_head 4096x32128', D, V)):
        w = mk(m, n)
        x = jnp.asarray(rng.standard_normal((1, m)), jnp.bfloat16)

        def f(x, w):
            return jnp.sum((x @ w).astype(jnp.float32))

        dt = time_fn_ingraph(jax.jit(f), (x, w), iters=256) - DISPATCH / 256
        gb = m * n * 2 / 1e9
        print(f'{name:22s} {dt * 1e6:8.1f} us  {gb / dt:6.0f} GB/s',
              flush=True)

    # full-depth matmul-only chain (the weight-streaming floor in practice)
    layers = [{'q': mk(D, D), 'k': mk(D, D), 'v': mk(D, D), 'o': mk(D, D),
               'gu': mk(D, 2 * FF), 'dn': mk(FF, D)} for _ in range(L)]
    head = mk(D, V)

    def chain(x, layers, head):
        for lp in layers:
            a = x @ lp['q'] + x @ lp['k'] + x @ lp['v']
            x = x + a @ lp['o']
            gu = x @ lp['gu']
            g, u = jnp.split(gu, 2, axis=-1)
            x = x + (jax.nn.silu(g) * u) @ lp['dn']
        return jnp.sum((x @ head).astype(jnp.float32))

    x = jnp.asarray(rng.standard_normal((1, D)), jnp.bfloat16)
    dt = time_fn_ingraph(jax.jit(chain), (x, layers, head),
                         iters=64) - DISPATCH / 64
    tot = (sum(w.size * 2 for lp in layers for w in lp.values())
           + head.size * 2) / 1e9
    print(f'32L matmul chain       {dt * 1e3:8.2f} ms  '
          f'{tot / dt:6.0f} GB/s  ({1 / dt:.1f} tok/s ceiling)', flush=True)


if __name__ == '__main__':
    main()
