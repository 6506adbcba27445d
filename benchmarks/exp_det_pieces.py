"""Piece timing for the det-pretrain step (14.5 img/s at b8 448).

Pieces via time_fn_ingraph: (a) perceiver fwd, (b) loss-only on frozen
outputs (matcher + focal/L1/GIoU over 12+1 stage matchings), (c) the
full train step (fwd + loss + bwd + AdamW).  bwd+opt ~= c - a - b.
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import _cache  # noqa: E402
_cache.enable()
import numpy as np
import jax
import jax.numpy as jnp

from groma_tpu.config import DDETRConfig, PerceiverConfig, ViTConfig
from groma_tpu.models.ddetr_loss import ddetr_loss
from groma_tpu.models.perceiver import Perceiver
from groma_tpu.train.optimizer import (det_lr_mult_rules, freeze_predicate,
                                       make_adamw)
from groma_tpu.train.steps import TrainState, make_det_train_step
from groma_tpu.utils.profiling import time_fn_ingraph

cfg = PerceiverConfig(vit=ViTConfig(dtype='bfloat16'),
                      ddetr=DDETRConfig(dtype='bfloat16'), image_size=448)
B, T = 8, 20
rng = np.random.default_rng(0)
model = Perceiver(cfg)
images = jnp.asarray(rng.standard_normal((B, 448, 448, 3)), jnp.float32)
targets = {
    'class_labels': jnp.zeros((B, T), jnp.int32),
    'boxes': jnp.asarray(rng.uniform(0.2, 0.6, (B, T, 4)), jnp.float32),
    'valid': jnp.asarray(rng.random((B, T)) < 0.7),
}
params = jax.jit(lambda im: model.init(jax.random.PRNGKey(0), im))(
    images[:1])['params']

dt = time_fn_ingraph(
    lambda p, im: model.apply({'params': p}, im, deterministic=True),
    (params, images), iters=16, perturb_arg=1)
print(f'perceiver fwd          {dt*1000:8.1f} ms', flush=True)

out = jax.jit(lambda p, im: model.apply({'params': p}, im,
                                        deterministic=True))(params, images)

dt = time_fn_ingraph(
    lambda o, t: ddetr_loss(o, t, cfg.ddetr, 'coco',
                            matcher='auction')['loss'],
    (out, targets), iters=16, perturb_arg=0)
print(f'loss+matcher (no grad) {dt*1000:8.1f} ms', flush=True)

tx = make_adamw(2e-4, weight_decay=1e-4,
                lr_mult_rules=det_lr_mult_rules(0.1),
                frozen_pred=freeze_predicate(freeze_vis_encoder=True))
step = make_det_train_step(model, cfg.ddetr, tx, source='coco',
                           matcher='auction')
state = jax.jit(lambda p: TrainState.create(p, tx))(params)


def full(state, batch):
    new_state, losses = step(state, batch)
    return losses['loss'] + jax.tree_util.tree_reduce(
        lambda a, l: a + jnp.sum(l).astype(jnp.float32) * 1e-20,
        new_state.params, jnp.float32(0.0))


dt = time_fn_ingraph(full, (state, {'images': images, 'targets': targets}),
                     iters=12, perturb_arg=1)
print(f'full train step        {dt*1000:8.1f} ms '
      f'({B / dt:.1f} img/s)', flush=True)
