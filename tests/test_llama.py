"""LLaMA flax vs installed HF torch LlamaForCausalLM parity (tiny config),
including the KV-cache prefill+decode contract."""

import numpy as np
import jax.numpy as jnp
import torch

from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import LlamaForCausalLM, LlamaModel, make_kv_cache
from groma_tpu.checkpoint.hf_import import import_llama, to_numpy_state_dict
import pytest

CFG = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                  num_layers=2, num_heads=4, num_kv_heads=4,
                  max_position_embeddings=256, dtype='float32')


def _torch_model():
    from transformers import LlamaConfig as TLC, LlamaForCausalLM as TLM
    tcfg = TLC(vocab_size=128, hidden_size=64, intermediate_size=128,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=4, max_position_embeddings=256,
               rope_theta=10000.0, rms_norm_eps=1e-5,
               attention_dropout=0.0, tie_word_embeddings=False)
    torch.manual_seed(0)
    return TLM(tcfg).eval()


@pytest.mark.slow
def test_llama_logits_match_hf(rng):
    tm = _torch_model()
    params = import_llama(to_numpy_state_dict(tm), num_layers=2)
    ids = rng.integers(0, 128, size=(2, 11))
    # left padding on sample 0 (HF convention: mask + position_ids)
    mask = np.ones((2, 11), bool)
    mask[0, :3] = False
    pos = np.maximum(np.cumsum(mask, axis=-1) - 1, 0)

    with torch.no_grad():
        want = tm(torch.from_numpy(ids),
                  attention_mask=torch.from_numpy(mask.astype(np.int64)),
                  position_ids=torch.from_numpy(pos)).logits.numpy()

    model = LlamaForCausalLM(CFG)
    got, _ = model.apply({'params': params}, jnp.asarray(ids),
                         jnp.asarray(mask), jnp.asarray(pos))
    got = np.asarray(got)
    # compare only valid positions (padded positions differ, both garbage)
    np.testing.assert_allclose(got[mask], want[mask], atol=3e-4, rtol=1e-4)


@pytest.mark.slow
def test_llama_kv_cache_decode_matches_full_forward(rng):
    tm = _torch_model()
    params = import_llama(to_numpy_state_dict(tm), num_layers=2)
    model = LlamaForCausalLM(CFG)

    ids = jnp.asarray(rng.integers(0, 128, size=(1, 9)))
    mask = jnp.ones((1, 9), bool)
    full_logits, _ = model.apply({'params': params}, ids, mask)

    # prefill 6 tokens, then decode 3 one at a time
    cache = make_kv_cache(CFG, batch=1, max_len=16, dtype=jnp.float32)
    pos = jnp.arange(9)[None]
    logits, cache = model.apply({'params': params}, ids[:, :6],
                                jnp.ones((1, 6), bool), pos[:, :6], cache)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full_logits[:, :6]), atol=2e-4)
    for t in range(6, 9):
        step_logits, cache = model.apply(
            {'params': params}, ids[:, t:t + 1], jnp.ones((1, 1), bool),
            pos[:, t:t + 1], cache)
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]), atol=2e-4)


def test_llama_midsequence_padding_equals_compacted(rng):
    """Fixed-capacity stream with mid-sequence pad slots must equal the
    compacted sequence (the static token-surgery design contract)."""
    tm = _torch_model()
    params = import_llama(to_numpy_state_dict(tm), num_layers=2)
    model = LlamaForCausalLM(CFG)

    compact = rng.integers(1, 128, size=(1, 7))
    # insert pad slots at positions 2,3 and 5
    padded = np.zeros((1, 10), np.int64)
    mask = np.zeros((1, 10), bool)
    src = iter(compact[0])
    for i in range(10):
        if i not in (2, 3, 5):
            padded[0, i] = next(src)
            mask[0, i] = True
    pos = np.maximum(np.cumsum(mask, -1) - 1, 0)

    out_pad, _ = model.apply({'params': params}, jnp.asarray(padded),
                             jnp.asarray(mask), jnp.asarray(pos))
    out_compact, _ = model.apply({'params': params}, jnp.asarray(compact),
                                 jnp.ones((1, 7), bool))
    np.testing.assert_allclose(np.asarray(out_pad)[mask],
                               np.asarray(out_compact)[0], atol=2e-4)


@pytest.mark.slow
def test_remat_policies_equal_gradients(rng):
    """remat=True with policy 'full' vs 'attn' (save attention outputs)
    must produce identical loss and gradients — the policy only changes
    what the backward pass recomputes."""
    import jax

    ids = jnp.asarray(rng.integers(0, 128, size=(2, 12)))
    labels = jnp.asarray(rng.integers(0, 128, size=(2, 12)))

    def loss_and_grad(policy):
        model = LlamaForCausalLM(CFG, remat=True, remat_policy=policy)
        params = model.init(jax.random.PRNGKey(0), ids[:, :4])['params']

        def loss_fn(p):
            logits, _ = model.apply({'params': p}, ids)
            logp = jax.nn.log_softmax(logits[:, :-1])
            nll = -jnp.take_along_axis(logp, labels[:, 1:, None], -1)
            return nll.mean()

        return jax.jit(jax.value_and_grad(loss_fn))(params)

    loss_f, grad_f = loss_and_grad('full')
    loss_a, grad_a = loss_and_grad('attn')
    np.testing.assert_allclose(float(loss_f), float(loss_a), rtol=1e-6)
    flat_f = jax.tree_util.tree_leaves(grad_f)
    flat_a = jax.tree_util.tree_leaves(grad_a)
    for a, b in zip(flat_f, flat_a):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)
