"""Flash-attention fwd+bwd timing vs XLA dense (round-4 re-measure).

The r3 rework batched heads into the flash BACKWARD kernel grids
(ops/flash_attention.py) during the tunnel outage; the committed
numbers ("22.6 vs 23.8 ms XLA at b8/h32/s2048/d128 fwd+bwd") predate
those grids.  This probe times value_and_grad of a pure attention
layer — sum(attn(q, k, v)) — through both paths at the two training
shapes (s=768 REC streams, s=2048 vl_finetune streams).

Usage: python benchmarks/exp_flash_bwd.py [seq ...]   (default 768 2048)
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

from groma_tpu.ops.flash_attention import flash_attention  # noqa: E402
from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

DISPATCH = 0.030


def xla_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum('bhqd,bhkd->bhqk', q, k) * (d ** -0.5)
    sq = s.shape[-1]
    causal = jnp.tril(jnp.ones((sq, sq), bool))
    s = jnp.where(causal, s.astype(jnp.float32), -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum('bhqk,bhkd->bhqd', p, v)


def main(seqs=(768, 2048)):
    b, h, d = 8, 32, 128
    rng = np.random.default_rng(0)
    for s in seqs:
        qkv = tuple(jnp.asarray(
            rng.standard_normal((b, h, s, d)) * 0.1, jnp.bfloat16)
            for _ in range(3))

        def loss_flash(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=True)
                           .astype(jnp.float32))

        def loss_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v).astype(jnp.float32))

        for name, fn in (('flash', loss_flash), ('xla  ', loss_xla)):
            g = jax.jit(jax.value_and_grad(fn, argnums=(0, 1, 2)))
            dt = time_fn_ingraph(lambda q, k, v: g(q, k, v)[0], qkv,
                                 iters=16) - DISPATCH / 16
            print(f's={s} {name} fwd+bwd: {dt * 1e3:7.2f} ms/layer',
                  flush=True)


if __name__ == '__main__':
    main(tuple(int(a) for a in sys.argv[1:]) or (768, 2048))
