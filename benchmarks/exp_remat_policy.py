"""Compare remat policies for the vl train step: full vs save-attn-out.

'attn' saves the (B, S, H) attention outputs (checkpoint_name in
LlamaAttention) so the backward remat pass skips re-running the flash
kernel; costs S*H*2 bytes/layer of activation memory.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp
import optax

from groma_tpu.config import LlamaConfig
from groma_tpu.models.llama import LlamaForCausalLM
from groma_tpu.train.optimizer import make_adamw
from groma_tpu.train.steps import TrainState

PEAK = 197e12
layers, batch, seq, steps = 2, 2, 2048, 12
cfg = LlamaConfig(vocab_size=32114, num_layers=layers, dtype='bfloat16')
rng = np.random.default_rng(0)
ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)))
labels = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, seq)))
tx = make_adamw(1e-5, weight_decay=0.0)


def run(policy):
    model = LlamaForCausalLM(cfg, remat=True, remat_policy=policy)
    params = jax.jit(lambda i: model.init(jax.random.PRNGKey(0), i))(
        ids[:, :8])['params']

    def step(state, ids, labels):
        def loss_fn(p):
            logits, _ = model.apply({'params': p}, ids, use_flash=True)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32))
            nll = -jnp.take_along_axis(logp, labels[:, 1:, None], -1)
            return nll.mean()
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params2 = optax.apply_updates(state.params, updates)
        return TrainState(params=params2, opt_state=opt_state,
                          step=state.step + 1), loss

    state = jax.jit(lambda p: TrainState.create(p, tx))(params)
    jit_step = jax.jit(step, donate_argnums=(0,))
    compiled = jit_step.lower(state, ids, labels).compile()
    flops = compiled.cost_analysis().get('flops', 0.0)
    mem = compiled.memory_analysis()
    state, loss = compiled(state, ids, labels)
    float(loss)
    t0 = time.perf_counter()
    for _ in range(steps):
        state, loss = compiled(state, ids, labels)
    lv = float(loss)
    dt = (time.perf_counter() - t0) / steps
    print(f'{policy:6s}: {dt*1000:7.1f} ms/step  '
          f'MFU {flops/dt/PEAK*100:5.2f}%  loss {lv:.3f}  '
          f'peak-mem {mem.temp_size_in_bytes/1e9:.2f} GB  '
          f'flops {flops:.3g}')
    return dt


t_full = run('full')
t_attn = run('attn')
print(f'attn vs full: {t_full/t_attn:.3f}x')
