"""Can the int4 nibble unpack run at 8-bit lane width in Mosaic?

The packed-int4 matmul kernel (ops/quant4.py) unpacks via
``packed.astype(int32) & 0xF`` — int32 lanes process 4x fewer elements
per VPU op than int8 lanes would, and the unpack is the reason int4
decode runs at 8.0 ms/step against a 4.2 ms HBM floor (ROADMAP).  This
probe times small pallas kernels doing the same unpack+dot through
different integer widths to see what today's Mosaic supports:

  A  astype(int32) -> &0xF / >>4 -> astype(bf16)      (current)
  B  astype(int8)  -> &0xF / >>4 -> astype(bf16)      (8-bit lanes)
  C  astype(int8)  -> &0xF / >>4 stay int8 -> int8 MXU dot vs bf16 x
  D  view int4?    -- not supported, skip

Run on TPU: python benchmarks/exp_int4_unpack.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from groma_tpu.utils.profiling import time_fn_ingraph  # noqa: E402

DISPATCH = 0.030
KHALF, N = 2048, 512        # one (K/2, bn) strip at down_proj-ish shape


def _kern_a(x_ref, w_ref, o_ref):
    packed = w_ref[:].astype(jnp.int32)
    lo = (packed & 0xF).astype(jnp.bfloat16)
    hi = (packed >> 4).astype(jnp.bfloat16)
    x = x_ref[:]
    o_ref[:] = (jax.lax.dot(x[:, :KHALF], lo,
                            preferred_element_type=jnp.float32)
                + jax.lax.dot(x[:, KHALF:], hi,
                              preferred_element_type=jnp.float32)
                ).astype(o_ref.dtype)


def _kern_b(x_ref, w_ref, o_ref):
    packed = w_ref[:].astype(jnp.int8)
    lo = (packed & 0xF).astype(jnp.bfloat16)
    hi = ((packed >> 4) & 0xF).astype(jnp.bfloat16)
    x = x_ref[:]
    o_ref[:] = (jax.lax.dot(x[:, :KHALF], lo,
                            preferred_element_type=jnp.float32)
                + jax.lax.dot(x[:, KHALF:], hi,
                              preferred_element_type=jnp.float32)
                ).astype(o_ref.dtype)


def _kern_c(x_ref, w_ref, o_ref):
    packed = w_ref[:].astype(jnp.int8)
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    x = x_ref[:]
    o_ref[:] = (jax.lax.dot(x[:, :KHALF], lo.astype(x.dtype),
                            preferred_element_type=jnp.float32)
                + jax.lax.dot(x[:, KHALF:], hi.astype(x.dtype),
                              preferred_element_type=jnp.float32)
                ).astype(o_ref.dtype)


def run(kern, name, x, w):
    f = pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(x.shape, lambda: (0, 0)),
                  pl.BlockSpec(w.shape, lambda: (0, 0))],
        out_specs=pl.BlockSpec((x.shape[0], w.shape[1]), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], w.shape[1]),
                                       jnp.float32),
    )
    fj = jax.jit(lambda x, w: jnp.sum(f(x, w)))
    try:
        want = None
        got = float(fj(x, w))
        dt = time_fn_ingraph(fj, (x, w), iters=256) - DISPATCH / 256
        gb = w.size / 1e9
        print(f'{name}: {dt * 1e6:7.1f} us/strip  {gb / dt:6.0f} GB/s '
              f'(sum={got:.1f})', flush=True)
    except Exception as e:  # noqa: BLE001 — report unsupported paths
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:200]}',
              flush=True)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 2 * KHALF)), jnp.bfloat16)
    w = jnp.asarray(rng.integers(0, 255, (KHALF, N)), jnp.uint8)
    run(_kern_a, 'A int32-lane unpack (current)', x, w)
    run(_kern_b, 'B int8-lane unpack -> bf16   ', x, w)
    run(_kern_c, 'C int8-lane unpack, x-dtype  ', x, w)


if __name__ == '__main__':
    main()
