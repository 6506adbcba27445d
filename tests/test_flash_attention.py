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


def test_causal_pairs_enumeration():
    """Packed-grid tables: exactly the live causal pairs, visit order
    groups each output block's run contiguously with correct first/last
    flags, and dead above-diagonal pairs are absent."""
    from groma_tpu.ops.flash_attention import _causal_pairs
    for nq, nk, bq, bk, sq, skv in ((4, 4, 512, 512, 2048, 2048),
                                    (8, 4, 256, 512, 2048, 2048),
                                    (2, 2, 384, 384, 576, 576),
                                    (3, 5, 256, 128, 640, 640)):
        for kv_major in (False, True):
            iq_t, ik_t, fi, la = _causal_pairs(nq, nk, bq, bk, sq, skv,
                                               kv_major=kv_major)
            pairs = list(zip(iq_t.tolist(), ik_t.tolist()))
            # every live pair present exactly once
            live = {(iq, ik) for iq in range(nq) for ik in range(nk)
                    if ik * bk <= iq * bq + bq - 1 + (skv - sq)}
            assert set(pairs) == live and len(pairs) == len(live)
            # contiguous runs per output block + first/last flags
            key = ik_t if kv_major else iq_t
            runs = {}
            for j, kv in enumerate(key.tolist()):
                runs.setdefault(kv, []).append(j)
            for kv, js in runs.items():
                assert js == list(range(js[0], js[-1] + 1)), (kv, js)
                assert fi[js[0]] == 1 and la[js[-1]] == 1
                assert all(fi[j] == 0 for j in js[1:])
                assert all(la[j] == 0 for j in js[:-1])
            # within a run the non-major index ascends (accumulator
            # visit order matches the rectangular grid's)
            minor = iq_t if kv_major else ik_t
            for kv, js in runs.items():
                ms = [minor[j] for j in js]
                assert ms == sorted(ms), (kv, ms)


def test_fused_backward_ragged_blocks(rng):
    """The single-pass causal backward (dk/dv VMEM accumulators + the
    full-seq dq scratch with diagonal-visit emission) matches reference
    grads at ragged seq/block combinations that force multi-visit dq
    accumulation and masked boundary paths."""
    B, H, S, D = 2, 4, 100, 32
    q = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)) * 0.3, jnp.float32)
    mask = jnp.asarray(rng.random((B, S)) > 0.2)

    gr = jax.grad(lambda q, k, v: jnp.sum(mha_reference(
        q, k, v, kv_mask=mask, causal=True) ** 2), (0, 1, 2))(q, k, v)
    for bq, bk in ((32, 64), (64, 32), (48, 48)):
        gf = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
            q, k, v, kv_mask=mask, causal=True, block_q=bq, block_k=bk,
            interpret=True) ** 2), (0, 1, 2))(q, k, v)
        for name, a, b in zip('dq dk dv'.split(), gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4,
                                       err_msg=f'{bq}x{bk} {name}')
