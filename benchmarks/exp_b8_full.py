"""Full quantized decode step timing at B=8/B=1 (see exp_b8_decode.py).

Separate script so the attention-only probes' KV buffers don't crowd HBM.
Usage: python exp_b8_full.py [kv8|bf16|b1|noattn]
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp
from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import make_kv_cache
from groma_tpu.models.llama_quant import (make_quant_kv_cache,
                                          quant_llama_forward)
from groma_tpu.utils.profiling import time_fn_ingraph

cfg = LlamaConfig()
B, S, L = 8, 1024, 32
H = cfg.hidden_size
rng = np.random.default_rng(0)

which = sys.argv[1] if len(sys.argv) > 1 else 'kv8'


from _fixtures import mk_layer as _mk_layer


def mk_layer():
    return _mk_layer(cfg, bits=8)


qp = {'layers': [mk_layer() for _ in range(L)],
      'norm': jnp.ones((H,), jnp.float32)}
qp = jax.jit(lambda t: t)(qp)


def full_step(emb, qp, cache):
    h, _ = quant_llama_forward(qp, cfg, emb,
                               jnp.ones((emb.shape[0], 1), bool),
                               jnp.full((emb.shape[0], 1), 600, jnp.int32),
                               cache)
    return h


b = 1 if which == 'b1' else B
cache = make_kv_cache(cfg, b, S) if which == 'bf16' \
    else make_quant_kv_cache(cfg, b, S)
cache['index'] = 600
emb = jnp.asarray(rng.standard_normal((b, 1, H)), jnp.bfloat16)
dt = time_fn_ingraph(full_step, (emb, qp, cache), iters=64)
print(f'full fwd B={b} {which}: {dt*1000:8.3f} ms/step '
      f'({b / dt:.0f} tok/s aggregate)', flush=True)
