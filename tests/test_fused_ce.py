"""Fused (chunked-remat) cross-entropy vs the materialized log_softmax
path: value and gradient equality (ops/fused_ce.py), plus model-level
equality of GromaModel(fused_ce=True/False) — the loss the train step
optimizes must be bit-for-bit the same math as the reference's
log_softmax + gather (reference: groma/model/groma.py:404-415)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.ops.fused_ce import fused_cross_entropy


def _naive(hidden, heads, labels, ok):
    logits = jnp.concatenate(
        [jnp.einsum('bsh,hv->bsv', hidden, w.astype(hidden.dtype),
                    preferred_element_type=jnp.float32) for w in heads],
        axis=-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    safe = jnp.where(ok, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], -1)[..., 0]
    return jnp.sum(jnp.where(ok, nll, 0.0)) / jnp.maximum(jnp.sum(ok), 1)


def _mk(rng, b=2, s=37, h=16, vs=(50, 6), dtype=jnp.float32):
    hidden = jnp.asarray(rng.standard_normal((b, s, h)), dtype)
    heads = tuple(jnp.asarray(rng.standard_normal((h, v)) * 0.2, dtype)
                  for v in vs)
    labels = jnp.asarray(rng.integers(0, sum(vs), (b, s)), jnp.int32)
    ok = jnp.asarray(rng.random((b, s)) < 0.7)
    return hidden, heads, labels, ok


@pytest.mark.parametrize('chunk', [8, 16, 64])
@pytest.mark.parametrize('unroll', [False, True])
def test_value_matches_naive(rng, chunk, unroll):
    hidden, heads, labels, ok = _mk(rng)
    got = fused_cross_entropy(hidden, heads, labels, ok, chunk=chunk,
                              unroll=unroll)
    want = _naive(hidden, heads, labels, ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_grads_match_naive(rng):
    hidden, heads, labels, ok = _mk(rng)

    def f_fused(h, w):
        return fused_cross_entropy(h, w, labels, ok, chunk=16)

    def f_naive(h, w):
        return _naive(h, w, labels, ok)

    gf = jax.grad(f_fused, argnums=(0, 1))(hidden, heads)
    gn = jax.grad(f_naive, argnums=(0, 1))(hidden, heads)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_no_ok_positions_is_zero(rng):
    hidden, heads, labels, _ = _mk(rng)
    ok = jnp.zeros(labels.shape, bool)
    got = fused_cross_entropy(hidden, heads, labels, ok, chunk=16)
    assert float(got) == 0.0
    g = jax.grad(lambda h: fused_cross_entropy(h, heads, labels, ok,
                                               chunk=16))(hidden)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_hidden_close(rng):
    hidden, heads, labels, ok = _mk(rng, dtype=jnp.bfloat16)
    got = fused_cross_entropy(hidden, heads, labels, ok, chunk=16)
    want = _naive(hidden, heads, labels, ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2)


@pytest.mark.slow
def test_groma_model_fused_matches_unfused(rng):
    """Model-level: fused_ce=True/False produce the same loss and the
    same trainable grads on the tiny Groma."""
    from groma_tpu.config import tiny_groma_config
    from groma_tpu.data.tokenization import SpecialIds, expand_template
    from groma_tpu.constants import IGNORE_INDEX
    from groma_tpu.models.groma import GromaModel

    cfg = tiny_groma_config()
    sp = SpecialIds.from_base_vocab(cfg.llm.vocab_size)
    ids = [1, 5, sp.image, 7, 8, sp.region, 9, 13, 14, 2]
    labels = [IGNORE_INDEX] * 7 + [13, 14, 2]
    t = expand_template(np.array(ids), np.array(labels), sp,
                        cfg.num_image_tokens, cfg.max_region_num,
                        cfg.max_seq_len)
    b = 2
    batch = dict(
        images=jnp.asarray(rng.standard_normal((b, 56, 56, 3)),
                           jnp.float32),
        input_ids=jnp.asarray(np.stack([t['input_ids']] * b)),
        region_slot=jnp.asarray(np.stack([t['region_slot']] * b)),
        base_valid=jnp.asarray(np.stack([t['valid']] * b)),
        labels=jnp.asarray(np.stack([t['labels']] * b)),
    )
    model = GromaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), **batch)['params']

    def loss(p, fused):
        return model.apply({'params': p}, **batch, fused_ce=fused)['loss']

    lf, gf = jax.value_and_grad(loss)(params, True)
    ln, gn = jax.value_and_grad(loss)(params, False)
    np.testing.assert_allclose(float(lf), float(ln), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gn)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-5)
