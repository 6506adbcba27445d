"""Fused int8 decode-attention kernel vs the XLA reference chain."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.models.llama_quant import (_int8_cache_attention,
                                          _quantize_tokens)
from groma_tpu.ops.decode_attention import int8_decode_attention


def _mk(rng, b=2, h=4, s=256, d=128, masked_tail=32):
    q = jnp.asarray(rng.standard_normal((b, h, 1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k8, ks = _quantize_tokens(k)
    v8, vs = _quantize_tokens(v)
    bias = np.zeros((b, 1, 1, s), np.float32)
    if masked_tail:
        bias[..., -masked_tail:] = -1e30
    return q, k8, ks, v8, vs, jnp.asarray(bias)


def test_fused_matches_xla_chain_interpret(rng):
    """Pallas-interpreter run of the ACTUAL kernel body on CPU.

    (int8_decode_attention(interpret=True) routes to the XLA fallback
    by design; _call_kernel is the kernel itself.)"""
    from groma_tpu.ops.decode_attention import _call_kernel
    args = _mk(rng)
    want = np.asarray(_int8_cache_attention(*args))
    got = np.asarray(_call_kernel(*args, interpret=True))
    # both paths quantize p at slightly different normalizations; the
    # int8-rounded products agree to ~1% relative
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_fused_matches_on_device(rng):
    """Real Mosaic lowering (TPU only; skipped on CPU)."""
    if jax.devices()[0].platform != 'tpu':
        pytest.skip('needs TPU')
    args = _mk(rng, b=2, h=8, s=256, d=128)
    want = np.asarray(_int8_cache_attention(*args))
    got = np.asarray(int8_decode_attention(*args))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_fused_fully_masked_tail_rows_are_finite(rng):
    args = _mk(rng, masked_tail=0)
    got = np.asarray(int8_decode_attention(*args, interpret=True))
    assert np.isfinite(got).all()
