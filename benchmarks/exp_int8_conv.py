"""Probe: does XLA on this TPU run int8 x int8 -> int32 convolutions on
the MXU's double-rate integer path?  If yes, the region-encoder fuse
(5 rounds of 3x3 1024->1024 convs, 82 ms MXU floor at bf16 — see
docs/VISION_FLOOR.md) halves with int8 weights+activations, moving the
vision headline past the bf16 ceiling.

Timing via utils/profiling.time_fn_ingraph (in-graph fori_loop with
per-iteration perturbation — immune to tunnel result caching; a naive
repeated-args loop on this tunnel reads 0.04 ms for a 3 ms conv).
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


def main():
    rng = np.random.default_rng(0)
    # one fuse-round conv at the 64^2 level, b8: (8, 64, 64, 1024) x
    # 3x3x1024->1024 (NHWC); 618 GFLOP -> 3.1 ms bf16 MXU floor
    B, H, W, C = 8, 64, 64, 1024
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.02, jnp.bfloat16)
    dn = jax.lax.conv_dimension_numbers(x.shape, k.shape,
                                        ('NHWC', 'HWIO', 'NHWC'))
    gflop = B * H * W * 9 * C * C * 2 / 1e9

    def conv_bf16(x, k):
        o = jax.lax.conv_general_dilated(
            x, k, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return jnp.sum(o)

    t = time_fn_ingraph(conv_bf16, (x, k), iters=64)
    print(f'bf16 conv {t*1e3:.3f} ms  ({gflop / t / 1e3:.0f} TFLOP/s)')
    t_bf16 = t

    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 10), -127, 127
                  ).astype(jnp.int8)
    kq = jnp.clip(jnp.round(k.astype(jnp.float32) * 500), -127, 127
                  ).astype(jnp.int8)

    def conv_int8(xf, kq):
        # perturbable float input, quantized in-graph (what a real int8
        # vision path does per activation); weight already int8
        x8 = jnp.clip(jnp.round(xf), -127, 127).astype(jnp.int8)
        o = jax.lax.conv_general_dilated(
            x8, kq, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return jnp.sum(o.astype(jnp.float32))

    try:
        t = time_fn_ingraph(conv_int8, (xq.astype(jnp.float32), kq),
                            iters=64)
        print(f'int8 conv (incl act quant) {t*1e3:.3f} ms  '
              f'({gflop / t / 1e3:.0f} TOPS, {t_bf16 / t:.2f}x vs bf16)')
    except Exception as e:  # noqa: BLE001
        print(f'int8 conv FAILED: {type(e).__name__}: {e}')

    # pure int8 conv without the quantize step (floor)
    def conv_int8_pure(x8, kq):
        o = jax.lax.conv_general_dilated(
            x8, kq, (1, 1), 'SAME', dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return jnp.sum(o.astype(jnp.float32))

    @jax.jit
    def run(seed, x8, kq):
        def body(i, acc):
            xs = jnp.bitwise_xor(x8, (i + seed).astype(jnp.int8))
            return acc + conv_int8_pure(xs, kq) * 1e-12
        return jax.lax.fori_loop(0, 64, body, jnp.float32(0.0))

    import time as _time
    float(run(jnp.int32(0), xq, kq))
    t0 = _time.perf_counter()
    float(run(jnp.int32(1), xq, kq))
    t = (_time.perf_counter() - t0) / 64
    print(f'int8 conv (pure) {t*1e3:.3f} ms  '
          f'({gflop / t / 1e3:.0f} TOPS, {t_bf16 / t:.2f}x vs bf16)')

    # correctness: exact vs f32 conv of the quantized operands
    got = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), 'SAME', dimension_numbers=dn,
        preferred_element_type=jnp.int32))(xq[:1, :8, :8], kq)
    want = jax.jit(lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), 'SAME', dimension_numbers=dn,
        preferred_element_type=jnp.float32))(
        xq[:1, :8, :8].astype(jnp.float32), kq.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want)))
    print(f'int8-vs-f32-conv max abs err {err:.2e} (exact expected)')


if __name__ == '__main__':
    main()
