"""Stage train steps: det pretrain + VL pretrain/finetune.

One jitted, mesh-sharded XLA program per stage (GSPMD inserts all
collectives) — replacing the reference's HF-Trainer DDP/FSDP loops
(reference: groma/train/train.py:63-148, groma/train/train_det.py:161-253).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax

from groma_tpu.config import DDETRConfig
from groma_tpu.models.ddetr_loss import ddetr_loss


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray

    @classmethod
    def create(cls, params, tx):
        return cls(params=params, opt_state=tx.init(params),
                   step=jnp.zeros((), jnp.int32))


def make_vl_train_step(model, tx, use_flash: bool = False,
                       permute_regions: bool = True) -> Callable:
    """VL-stage step: CE loss on the grounded token stream
    (reference: groma/train/train.py + GromaModel.forward §3.3)."""

    def step(state: TrainState, batch: dict, rng):
        def loss_fn(params):
            out = model.apply(
                {'params': params},
                images=batch['images'],
                input_ids=batch['input_ids'],
                region_slot=batch['region_slot'],
                base_valid=batch['valid'],
                labels=batch['labels'],
                refer_boxes=batch.get('refer_boxes'),
                refer_valid=batch.get('refer_valid'),
                ground_boxes=batch.get('ground_boxes'),
                ground_valid=batch.get('ground_valid'),
                rng=rng, permute=permute_regions, use_flash=use_flash)
            return out['loss']

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, {'loss': loss}

    return step


def make_det_train_step(perceiver, ddetr_cfg: DDETRConfig, tx,
                        source: str, matcher: str = 'hungarian') -> Callable:
    """Det-stage step: Hungarian-matched focal/L1/GIoU losses.

    ``source`` is static ('coco' | 'sa1b') because every global batch is
    single-source (reference: groma/train/groma_trainer.py:14-59
    RandomBatchSampler + groma/data/collator.py:47).  ``matcher`` selects
    exact scipy LSA (host callback) or the on-device auction (required on
    backends without host callbacks)."""

    def step(state: TrainState, batch: dict):
        def loss_fn(params):
            out = perceiver.apply({'params': params}, batch['images'],
                                  deterministic=True)
            losses = ddetr_loss(out, batch['targets'], ddetr_cfg, source,
                                matcher=matcher)
            return losses['loss'], losses

        (loss, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=params, opt_state=opt_state,
                               step=state.step + 1)
        return new_state, losses

    return step
