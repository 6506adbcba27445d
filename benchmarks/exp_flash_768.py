"""Block-size sweep for causal flash attention at the REC prefill shape.

exp_prefill_llm.py found the default (128, 128) blocks cost 5.97
ms/layer at b8/h32/s768/d128 — 32 layers of that is ~190 ms of the
569 ms w8a8 prefill, and the XLA dense-attention prefill beats the
flash one end to end (439 vs 569 ms).  Sweep (block_q, block_k) and
compare the XLA chain at the same shape.
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


def main(seq=768):
    b, h, d = 8, 32, 128
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, h, seq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, seq, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, seq, d)), jnp.bfloat16)
    mask = jnp.ones((b, seq), bool)

    def xla_attn(q, k, v):
        s = jnp.einsum('bhqd,bhkd->bhqk', q, k,
                       preferred_element_type=jnp.float32) * (d ** -0.5)
        qi = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 0)
        kj = jax.lax.broadcasted_iota(jnp.int32, (seq, seq), 1)
        s = jnp.where((kj <= qi)[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum('bhqk,bhkd->bhqd', p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)
        return jnp.sum(o)

    dt = time_fn_ingraph(jax.jit(xla_attn), (q, k, v), iters=64)
    dt -= DISPATCH / 64
    print(f'xla dense            {dt * 1e3:7.2f} ms/layer', flush=True)

    for bq, bk in ((128, 128), (256, 128), (128, 256), (256, 256),
                   (256, 384), (384, 384), (256, 768), (768, 768),
                   (512, 256), (512, 512)):
        if bq > seq or bk > seq:
            continue
        fn = jax.jit(lambda q, k, v, _bq=bq, _bk=bk: jnp.sum(
            flash_attention(q, k, v, kv_mask=mask, causal=True,
                            block_q=_bq, block_k=_bk)
            .astype(jnp.float32)))
        try:
            dt = time_fn_ingraph(fn, (q, k, v), iters=64) - DISPATCH / 64
        except Exception as e:  # noqa: BLE001 — VMEM OOM etc., keep sweeping
            print(f'flash bq={bq:4d} bk={bk:4d}   FAIL '
                  f'({type(e).__name__})', flush=True)
            continue
        print(f'flash bq={bq:4d} bk={bk:4d} {dt * 1e3:7.2f} ms/layer',
              flush=True)


if __name__ == '__main__':
    main(seq=int(sys.argv[1]) if len(sys.argv) > 1 else 768)
