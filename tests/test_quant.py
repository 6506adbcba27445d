import numpy as np
import jax.numpy as jnp

from groma_tpu.ops.quant import (dequantize_weight, int8_matmul,
                                 quantize_weight)


def test_quantize_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    q, s = quantize_weight(w)
    back = dequantize_weight(q, s, jnp.float32)
    # per-column max error bounded by scale/2
    err = np.abs(np.asarray(back - w))
    bound = np.asarray(s) / 2 + 1e-6
    assert (err <= bound[None, :]).all()


def test_int8_matmul_matches_dequant(rng):
    x = jnp.asarray(rng.standard_normal((8, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 200)), jnp.float32)
    q, s = quantize_weight(w)
    got = np.asarray(int8_matmul(x, q, s, block_n=128))
    want = np.asarray(x @ dequantize_weight(q, s, jnp.float32))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)


def test_int8_matmul_fallback_small_m(rng):
    # m < 8 takes the XLA fallback path
    x = jnp.asarray(rng.standard_normal((1, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 48)), jnp.float32)
    q, s = quantize_weight(w)
    got = np.asarray(int8_matmul(x, q, s))
    want = np.asarray(x @ dequantize_weight(q, s, jnp.float32))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=5e-2)
