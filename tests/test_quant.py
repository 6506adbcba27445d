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


def test_w8a8_matmul_exact_integer_arithmetic(rng):
    # the implementation must be exactly quantize -> int32 dot -> rescale;
    # mirror that arithmetic in numpy and demand bit-equality of the
    # integer part (the float rescale then matches to f32 rounding)
    from groma_tpu.ops.quant import quantize_act, w8a8_matmul
    x = jnp.asarray(rng.standard_normal((256, 64)) * 3, jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)
    q, s = quantize_weight(w)
    got = np.asarray(w8a8_matmul(x, q, s))
    xq, xs = map(np.asarray, quantize_act(x))
    want = (xq.astype(np.int64) @ np.asarray(q).astype(np.int64)
            ).astype(np.float32) * xs[:, None] * np.asarray(s)[None, :]
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # and it approximates the float matmul within combined quant noise
    ref = np.asarray(x @ w)
    denom = np.maximum(np.abs(ref), 1.0)
    assert (np.abs(got - ref) / denom).mean() < 0.03


def test_w8a8_matmul_zero_rows(rng):
    # all-zero activation rows (padded prompt positions) must not NaN
    from groma_tpu.ops.quant import w8a8_matmul
    x = np.asarray(rng.standard_normal((300, 32)), np.float32)
    x[5] = 0.0
    w = jnp.asarray(rng.standard_normal((32, 48)), jnp.float32)
    q, s = quantize_weight(w)
    got = np.asarray(w8a8_matmul(jnp.asarray(x), q, s))
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[5], 0.0)
