"""Decompose the 7B prefill residual (b8, 768-token REC stream).

exp_e2e_split.py measured prefill+logits at ~633 ms inside the fused
e2e program while the dispatch-corrected matmul components sum to only
~283 ms (exp_prefill_matmul.py) — this probe times quant_llama_forward
itself and its attention variants to locate the remainder:

* full w8a8 prefill (flash, REC valid mask with interior gaps)
* same with an ALL-VALID mask (does the gappy mask defeat the flash
  kernel's interior fast path?)
* same with use_flash=False (XLA dense attention)
* attention-only at the same shapes

All timings amortize >= 32 in-graph iterations; the reported numbers
subtract the ~30 ms tunnel dispatch (see utils/profiling).
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

from groma_tpu.config import LlamaConfig  # noqa: E402
from groma_tpu.models.llama_quant import quant_llama_forward  # noqa: E402
from groma_tpu.ops.flash_attention import flash_attention  # noqa: E402
from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

DISPATCH = 0.030


def t(fn, args, iters=32):
    dt = time_fn_ingraph(fn, args, iters=iters)
    return dt - DISPATCH / iters


def main():
    cfg = LlamaConfig()
    b, s = 8, 768
    rng = np.random.default_rng(0)
    from _fixtures import mk_llama_quant_params
    qp = mk_llama_quant_params(cfg, bits=8, num_new_token=114,
                               pad_vocab=False)
    emb = jnp.asarray(rng.standard_normal((b, s, cfg.hidden_size)) * 0.02,
                      jnp.bfloat16)
    # REC-like valid mask: ~520 valid positions with interior gaps
    # (surgery leaves pad holes between the image/region blocks)
    valid_np = np.ones((b, s), bool)
    valid_np[:, 260:380] = False          # interior gap
    valid_np[:, 640:] = False             # tail pad
    valid = jnp.asarray(valid_np)
    pos = jnp.maximum(jnp.cumsum(valid_np.astype(np.int32), -1) - 1, 0)
    pos = jnp.asarray(pos)
    allv = jnp.ones((b, s), bool)
    pos_all = jnp.asarray(
        np.broadcast_to(np.arange(s, dtype=np.int32), (b, s)))

    def pf(qp, emb, valid, pos, use_flash, w8a8):
        h, _ = quant_llama_forward(qp, cfg, emb, valid, pos, None,
                                   use_flash=use_flash, w8a8=w8a8)
        return jnp.sum(h.astype(jnp.float32))

    for name, v, p, fl, a8 in (
            ('w8a8 flash gappy-mask ', valid, pos, True, True),
            ('w8a8 flash all-valid  ', allv, pos_all, True, True),
            ('w8a8 xla-attn gappy   ', valid, pos, False, True),
            ('bf16a flash gappy     ', valid, pos, True, False)):
        fn = jax.jit(lambda qp, e, vv, pp, _fl=fl, _a8=a8:
                     pf(qp, e, vv, pp, _fl, _a8))
        # perturb EMB (arg 0) — perturbing a qp leaf the forward never
        # reads lets XLA hoist the whole body out of the timing loop
        # (and OOMs trying to keep every layer's output live)
        dt = t(lambda e, qp_: fn(qp_, e, v, p), (emb, qp), iters=32)
        print(f'{name} {dt * 1e3:8.1f} ms/prefill', flush=True)

    # attention-only at prefill shapes
    hd = cfg.hidden_size // cfg.num_heads
    q = jnp.asarray(rng.standard_normal((b, cfg.num_heads, s, hd)),
                    jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, cfg.num_heads, s, hd)),
                    jnp.bfloat16)
    vv = jnp.asarray(rng.standard_normal((b, cfg.num_heads, s, hd)),
                     jnp.bfloat16)
    for name, mask in (('attn flash causal all-valid', allv),
                       ('attn flash causal gappy    ', valid)):
        fn = jax.jit(lambda q, k, v, m: jnp.sum(flash_attention(
            q, k, v, kv_mask=m, causal=True).astype(jnp.float32)))
        dt = t(lambda q, k: fn(q, k, vv, mask), (q, k), iters=64)
        print(f'{name} {dt * 1e3:8.2f} ms/layer '
              f'(x32 = {dt * 32e3:6.1f} ms)', flush=True)


if __name__ == '__main__':
    main()
