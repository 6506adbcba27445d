"""Prefill attention-policy + stream-length probe (round 4).

exp_prefill_llm measured (b8, s768, TPU v5e):
    w8a8 flash 494 ms | w8a8 XLA-attn 439 ms | bf16a flash 673 ms
i.e. XLA dense attention BEATS the flash kernel at REC prefill shapes
(the (B,H,S,S) tensor is only 302 MB/layer transient at s=768, and
Mosaic's block overheads outweigh the saved traffic below ~1k tokens).
This probe completes the matrix — bf16a+XLA, and both at a 640-slot
stream (REC prompts are ~520 valid tokens; 768 was padding headroom) —
to pick the e2e/engine prefill policy.
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
from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

DISPATCH = 0.030


def t(fn, args, iters=32):
    return time_fn_ingraph(fn, args, iters=iters) - DISPATCH / iters


def main():
    cfg = LlamaConfig()
    b = 8
    rng = np.random.default_rng(0)
    from _fixtures import mk_llama_quant_params
    qp = mk_llama_quant_params(cfg, bits=8, num_new_token=114,
                               pad_vocab=False)
    for s in (768, 640):
        emb = jnp.asarray(
            rng.standard_normal((b, s, cfg.hidden_size)) * 0.02,
            jnp.bfloat16)
        valid_np = np.ones((b, s), bool)
        valid_np[:, 260:380] = False       # interior surgery gap
        valid_np[:, s - 128:] = False      # tail pad
        valid = jnp.asarray(valid_np)
        pos = jnp.asarray(np.maximum(
            np.cumsum(valid_np.astype(np.int32), -1) - 1, 0))

        def pf(qp, emb, valid, pos, use_flash, w8a8):
            h, _ = quant_llama_forward(qp, cfg, emb, valid, pos, None,
                                       use_flash=use_flash, w8a8=w8a8)
            return jnp.sum(h.astype(jnp.float32))

        for name, fl, a8 in (('bf16a xla ', False, False),
                             ('bf16a flash', True, False),
                             ('w8a8  xla ', False, True),
                             ('w8a8  flash', True, True)):
            fn = jax.jit(lambda qp, e, _fl=fl, _a8=a8:
                         pf(qp, e, valid, pos, _fl, _a8))
            dt = t(lambda e, qp_: fn(qp_, e), (emb, qp), iters=32)
            print(f's={s} {name} {dt * 1e3:8.1f} ms/prefill', flush=True)


if __name__ == '__main__':
    main()
