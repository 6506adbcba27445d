"""Multi-device GSPMD tests on the 8-device virtual CPU mesh (the JAX
analogue of the reference's mocked-process-group distributed tests,
reference: mmcv/tests/test_parallel.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# heavyweight tier (round-5 verdict #7): run with -m slow; the
# default tier must stay <5 min
pytestmark = pytest.mark.slow

from groma_tpu.parallel.mesh import (data_sharding, make_mesh, param_pspec,
                                     shard_params)


def test_mesh_axes():
    mesh = make_mesh(dp=2, tp=2)
    assert dict(mesh.shape) == {'dp': 2, 'fsdp': 2, 'tp': 2}
    mesh = make_mesh(dp=1, tp=1)
    assert dict(mesh.shape) == {'dp': 1, 'fsdp': 8, 'tp': 1}


def test_param_pspec_rules():
    mesh = make_mesh(dp=1, fsdp=4, tp=2)
    # tp: column-parallel q_proj output dim
    spec = param_pspec('llm/layers_0/self_attn/q_proj/kernel', (64, 64),
                       mesh, fsdp_min_size=1)
    assert spec[1] == 'tp' and spec[0] == 'fsdp'
    # tp: row-parallel o_proj input dim
    spec = param_pspec('llm/layers_0/self_attn/o_proj/kernel', (64, 64),
                       mesh, fsdp_min_size=1)
    assert spec[0] == 'tp'
    # small params stay replicated
    spec = param_pspec('llm/norm/scale', (64,), mesh)
    assert all(s is None for s in spec)
    # embed sharded over the COMBINED (tp, fsdp) axes on the vocab dim
    # (feature dim replicated so embedding gathers keep the batch layout
    # without transposed-order reshards, round-3 sharding hygiene)
    spec = param_pspec('embed_tokens', (1024, 64), mesh, fsdp_min_size=1)
    assert spec[0] == ('tp', 'fsdp') and spec[1] is None
    # lm_head: vocab (output) dim over (tp, fsdp), contract dim replicated
    spec = param_pspec('lm_head/kernel', (64, 1024), mesh, fsdp_min_size=1)
    assert spec[1] == ('tp', 'fsdp') and spec[0] is None
    # vocab not divisible by tp*fsdp: falls back to tp only
    spec = param_pspec('embed_tokens', (1012, 64), mesh, fsdp_min_size=1)
    assert spec[0] == 'tp'


def test_sharded_llama_matches_single_device(rng):
    """dp+fsdp+tp sharded forward == single-device forward."""
    from groma_tpu.config import LlamaConfig
    from groma_tpu.models.llama import LlamaForCausalLM

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      dtype='float32')
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(rng.integers(0, 128, (8, 16)))
    params = model.init(jax.random.PRNGKey(0), ids[:1])['params']
    want, _ = jax.jit(lambda p, x: model.apply({'params': p}, x))(
        params, ids)

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, mesh, fsdp_min_size=2 ** 10)
        idsd = jax.device_put(ids, data_sharding(mesh))
        got, _ = jax.jit(lambda p, x: model.apply({'params': p}, x))(
            sp, idsd)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=1e-4)


def test_dryrun_multichip_entry():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_sharded_decode_matches_single_device(rng):
    """Serving at scale: prefill + greedy KV-cache decode under a
    (dp, fsdp, tp) mesh produces the SAME tokens as single-device —
    GSPMD shards the cache/attention across tp without any code change
    (the multi-chip analogue of the serve path; train has dryrun)."""
    import jax
    import jax.numpy as jnp
    from groma_tpu.config import LlamaConfig
    from groma_tpu.models.llama import LlamaForCausalLM, make_kv_cache
    from groma_tpu.parallel.mesh import make_mesh, shard_params

    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=4,
                      dtype='float32')
    model = LlamaForCausalLM(cfg)
    ids = jnp.asarray(rng.integers(0, 128, (2, 6)))
    params = model.init(jax.random.PRNGKey(0), ids)['params']

    def generate(params, ids, steps=5):
        cache = make_kv_cache(cfg, ids.shape[0], 16)
        logits, cache = model.apply({'params': params}, ids, cache=cache)
        tok = jnp.argmax(logits[:, -1], -1).astype(jnp.int32)

        def step(carry, i):
            tok, cache = carry
            lg, cache = model.apply(
                {'params': params}, tok[:, None], cache=cache,
                position_ids=jnp.full_like(tok[:, None], 6) + i)
            nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, _), toks = jax.lax.scan(step, (tok, cache), jnp.arange(steps))
        return jnp.concatenate([tok[None], toks], 0).T

    want = np.asarray(jax.jit(generate)(params, ids))

    mesh = make_mesh(dp=2, tp=2)
    with mesh:
        sp = shard_params(params, mesh, fsdp_min_size=2 ** 10)
        got = np.asarray(jax.jit(generate)(sp, ids))
    np.testing.assert_array_equal(got, want)


def test_discover_launch_env_precedence():
    """Launch-coordinate discovery mirrors the reference's
    init_distributed_mode precedence (groma/utils.py:143-185):
    torchrun env:// first, then SLURM, then JAX-native; None single-host."""
    from groma_tpu.parallel.mesh import discover_launch_env

    assert discover_launch_env({}) is None
    got = discover_launch_env({'RANK': '3', 'WORLD_SIZE': '8',
                               'MASTER_ADDR': '10.0.0.1',
                               'MASTER_PORT': '1234'})
    assert got == {'coordinator_address': '10.0.0.1:1234',
                   'num_processes': 8, 'process_id': 3}
    # torchrun vars win over SLURM when both are set (env:// precedence)
    got = discover_launch_env({'RANK': '0', 'WORLD_SIZE': '2',
                               'MASTER_ADDR': 'a',
                               'SLURM_PROCID': '1', 'SLURM_NTASKS': '4'})
    assert got['num_processes'] == 2 and got['process_id'] == 0
    got = discover_launch_env({'SLURM_PROCID': '1', 'SLURM_NTASKS': '4',
                               'SLURM_NODELIST': 'node[1-4]'})
    assert got == {'coordinator_address': 'node:8476',
                   'num_processes': 4, 'process_id': 1}
    got = discover_launch_env({'COORDINATOR_ADDRESS': 'h:9',
                               'JAX_NUM_PROCESSES': '2',
                               'JAX_PROCESS_ID': '1'})
    assert got == {'coordinator_address': 'h:9', 'num_processes': 2,
                   'process_id': 1}


def test_engine_serves_tp_sharded_params(rng):
    """Mesh-sharded SERVING: BatchEngine fed (fsdp, tp)-sharded params
    produces the same greedy tokens as the single-device Generator —
    GSPMD propagates the input shardings through the engine's prefill /
    insert / chunked-decode programs (which run on a background thread,
    outside any mesh context: shardings ride on the arrays)."""
    from groma_tpu.config import tiny_groma_config
    from groma_tpu.data.datasets.base import VLDataSpec
    from groma_tpu.data.tokenizer import StubTokenizer
    from groma_tpu.eval.generate import Generator
    from groma_tpu.eval.rec import build_rec_prompt
    from groma_tpu.models.groma import GromaModel
    from groma_tpu.serve.engine import BatchEngine

    cfg = tiny_groma_config()
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=cfg.max_seq_len,
                      image_size=cfg.perceiver.image_size)
    tok = StubTokenizer(base_vocab=cfg.llm.vocab_size)
    model = GromaModel(cfg)
    t = build_rec_prompt('a thing', tok, spec)
    img = rng.standard_normal(
        (cfg.perceiver.image_size,) * 2 + (3,)).astype(np.float32)
    params = model.init(
        jax.random.PRNGKey(0), images=jnp.asarray(img)[None],
        input_ids=jnp.asarray(t['input_ids'])[None],
        region_slot=jnp.asarray(t['region_slot'])[None],
        base_valid=jnp.asarray(t['valid'])[None])['params']

    MAX_NEW = 5
    gen = Generator(model, params, max_len=cfg.max_seq_len + MAX_NEW + 8)
    want, _ = gen.generate(
        jnp.asarray(img)[None], jnp.asarray(t['input_ids'])[None],
        jnp.asarray(t['region_slot'])[None], jnp.asarray(t['valid'])[None],
        max_new_tokens=MAX_NEW, eos_id=tok.sp.eos)
    want = [int(x) for x in want[0]]

    mesh = make_mesh(dp=1, fsdp=2, tp=2, devices=jax.devices()[:4])
    with mesh:
        sp = shard_params(params, mesh, fsdp_min_size=2 ** 10)
    eng = BatchEngine(model, sp, max_slots=2,
                      max_len=cfg.max_seq_len + MAX_NEW + 8,
                      eos_id=tok.sp.eos, chunk=2, max_new_tokens=MAX_NEW)
    try:
        s0 = eng.submit(img, t['input_ids'], t['region_slot'], t['valid'])
        got = list(s0.token_stream())
    finally:
        eng.close()

    def trim(seq):
        if tok.sp.eos in seq:
            return seq[:seq.index(tok.sp.eos) + 1]
        return seq[:MAX_NEW]
    assert trim(got) == trim(want), (got, want)
