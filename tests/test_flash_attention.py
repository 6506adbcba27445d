import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.ops.flash_attention import flash_attention, mha_reference


def _inputs(rng, b=2, h=3, sq=160, skv=160, d=32):
    q = jnp.asarray(rng.standard_normal((b, h, sq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, skv, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize('causal', [False, True])
def test_flash_matches_reference(rng, causal):
    q, k, v = _inputs(rng)
    out = flash_attention(q, k, v, causal=causal)
    want = mha_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_flash_padding_mask(rng):
    q, k, v = _inputs(rng, b=2, sq=96, skv=96)
    # mid-sequence invalid slots (the Groma fixed-capacity region stream case)
    mask = np.ones((2, 96), bool)
    mask[0, 40:60] = False
    mask[1, 90:] = False
    mask_j = jnp.asarray(mask)
    out = flash_attention(q, k, v, kv_mask=mask_j, causal=True)
    want = mha_reference(q, k, v, kv_mask=mask_j, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_flash_nonmultiple_block(rng):
    q, k, v = _inputs(rng, sq=100, skv=100)
    out = flash_attention(q, k, v, causal=True, block_q=64, block_k=64)
    want = mha_reference(q, k, v, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)


def test_flash_grads_match_reference(rng):
    q, k, v = _inputs(rng, b=1, h=2, sq=128, skv=128, d=32)
    mask = np.ones((1, 128), bool)
    mask[0, 110:] = False
    mask_j = jnp.asarray(mask)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask_j, causal=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, kv_mask=mask_j, causal=True) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_flash_fully_masked_rows_zero(rng):
    q, k, v = _inputs(rng, b=1, h=1, sq=32, skv=32, d=16)
    mask = jnp.zeros((1, 32), dtype=bool)
    out = flash_attention(q, k, v, kv_mask=mask)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_flash_grads_bidirectional_wholekv(rng):
    # bidirectional path routes through the whole-kv encoder kernel; its
    # lse output feeds the tiled backward — check the pair end to end
    q, k, v = _inputs(rng, b=1, h=2, sq=100, skv=130, d=32)
    mask = np.ones((1, 130), bool)
    mask[0, 120:] = False
    mask_j = jnp.asarray(mask)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, kv_mask=mask_j) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(mha_reference(q, k, v, kv_mask=mask_j) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=1e-3)


def test_flash_bf16_close_to_fp32_reference(rng):
    q, k, v = _inputs(rng, b=1, h=4, sq=200, skv=200, d=64)
    out = flash_attention(q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
                          v.astype(jnp.bfloat16))
    want = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(want), atol=3e-2)


def test_flash_wholekv_degenerate_negative_scores(rng):
    """All valid scores far below the pad-pinned row max must not drown in
    f32 rounding of the pad mass (ADVICE r2: the old algebraic denominator
    sum(p) - inv_cnt*exp(-m) cancels catastrophically when every valid
    score <= ~-15 with ~100+ pad columns, e.g. DINOv2@448 pads 1025->1152)."""
    b, h, skv, d = 1, 2, 1025, 32  # non-multiple of 128 -> 127 pad columns
    q, k, v = _inputs(rng, b=b, h=h, sq=64, skv=skv, d=d)
    # force every valid score strongly negative: k = -q_dir * large
    q = jnp.ones((b, h, 64, d), jnp.float32)
    k = -jnp.ones((b, h, skv, d), jnp.float32) * 4.0  # score = -4*d*scale ~ -22.6
    k = k + 0.01 * jnp.asarray(rng.standard_normal(k.shape), jnp.float32)
    out = flash_attention(q, k, v)  # bidirectional -> wholekv path
    want = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_flash_wholekv_exact_zero_scores(rng):
    """Legitimate exactly-zero scores (DINOv2's zero-init CLS token gives
    all-zero q/k rows at init) must behave like any other score — a
    where(s==0)-style pad detector misfires here (round-3 regression)."""
    b, h, s, d = 1, 2, 17, 8
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    q = q.at[:, :, 0].set(0.0)   # CLS-like zero query row
    k = k.at[:, :, 0].set(0.0)   # and zero key column
    out = flash_attention(q, k, v)
    want = mha_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-5)
