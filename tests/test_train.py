"""Train-step + optimizer + checkpoint tests (tiny configs) — the analogue
of the reference's debug.sh 0.001-epoch smoke run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.config import tiny_groma_config
from groma_tpu.constants import IGNORE_INDEX
from groma_tpu.data.tokenization import SpecialIds, expand_template
from groma_tpu.models.groma import GromaModel
from groma_tpu.models.perceiver import Perceiver
from groma_tpu.train.optimizer import (det_lr_mult_rules, freeze_predicate,
                                       make_adamw, cosine_schedule)
from groma_tpu.train.steps import TrainState, make_det_train_step, \
    make_vl_train_step

CFG = tiny_groma_config()


def _leaf_equal(a, b):
    return all(np.array_equal(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a),
                   jax.tree_util.tree_leaves(b)))


@pytest.mark.slow
def test_det_train_step(rng):
    model = Perceiver(CFG.perceiver)
    img = jnp.asarray(rng.standard_normal((2, 56, 56, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img)['params']
    tx = make_adamw(cosine_schedule(1e-3, 10, warmup_steps=1),
                    weight_decay=1e-4, max_grad_norm=1.0,
                    lr_mult_rules=det_lr_mult_rules(0.1),
                    frozen_pred=freeze_predicate(freeze_vis_encoder=True))
    state = TrainState.create(params, tx)
    batch = {
        'images': img,
        'targets': {
            'class_labels': jnp.zeros((2, 4), jnp.int32),
            'boxes': jnp.asarray(rng.uniform(0.3, 0.6, (2, 4, 4)),
                                 jnp.float32),
            'valid': jnp.asarray([[True, True, False, False],
                                  [True] * 4]),
        },
    }
    step = jax.jit(make_det_train_step(model, CFG.perceiver.ddetr, tx,
                                       source='coco'))
    new_state, losses = step(state, batch)
    assert np.isfinite(float(losses['loss']))
    # second step (past lr warmup): params actually move
    new_state2, losses2 = step(new_state, batch)
    assert int(new_state2.step) == 2
    assert np.isfinite(float(losses2['loss']))
    # frozen backbone unchanged; ddetr head trained
    assert _leaf_equal(state.params['vis_encoder'],
                       new_state2.params['vis_encoder'])
    assert not _leaf_equal(state.params['ddetr_transformer'],
                           new_state2.params['ddetr_transformer'])


@pytest.mark.slow
def test_vl_train_step_and_checkpoint(rng, tmp_path):
    sp = SpecialIds.from_base_vocab(CFG.llm.vocab_size)
    model = GromaModel(CFG)
    raw = np.array([1, 5, sp.image, 7, sp.region, 9, 10, 11, 2])
    labels = np.array([IGNORE_INDEX] * 6 + [10, 11, 2])
    t = expand_template(raw, labels, sp, CFG.num_image_tokens,
                        CFG.max_region_num, CFG.max_seq_len)
    b = 2
    batch = {
        'images': jnp.asarray(rng.standard_normal((b, 56, 56, 3)),
                              jnp.float32),
        'input_ids': jnp.asarray(np.stack([t['input_ids']] * b)),
        'region_slot': jnp.asarray(np.stack([t['region_slot']] * b)),
        'valid': jnp.asarray(np.stack([t['valid']] * b)),
        'labels': jnp.asarray(np.stack([t['labels']] * b)),
        'ground_boxes': jnp.asarray(rng.uniform(0.3, 0.6, (b, 3, 4)),
                                    jnp.float32),
        'ground_valid': jnp.ones((b, 3), bool),
        'refer_boxes': jnp.zeros((b, 1, 4), jnp.float32),
        'refer_valid': jnp.zeros((b, 1), bool),
    }
    params = model.init(jax.random.PRNGKey(0), images=batch['images'],
                        input_ids=batch['input_ids'],
                        region_slot=batch['region_slot'],
                        base_valid=batch['valid'])['params']
    tx = make_adamw(1e-3, frozen_pred=freeze_predicate(
        freeze_perceiver=True, freeze_llm=True))
    state = TrainState.create(params, tx)
    step = jax.jit(make_vl_train_step(model, tx))
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    # frozen parts untouched; region encoder / new embs train
    assert _leaf_equal(state.params['perceiver'],
                       new_state.params['perceiver'])
    assert _leaf_equal(state.params['llm'], new_state.params['llm'])
    assert not np.array_equal(state.params['new_input_embs'],
                              new_state.params['new_input_embs'])

    # orbax save + auto-resume roundtrip
    from groma_tpu.checkpoint.orbax_io import CheckpointManager, maybe_resume
    mngr = CheckpointManager(str(tmp_path / 'ckpt'), save_total_limit=1)
    mngr.save(1, new_state, config=CFG, wait=True)
    template = jax.tree_util.tree_map(jnp.zeros_like, new_state)
    restored, step_no = maybe_resume(
        CheckpointManager(str(tmp_path / 'ckpt')), template)
    assert step_no == 1
    assert _leaf_equal(restored.params, new_state.params)
    # config roundtrip
    cfg2 = CheckpointManager(str(tmp_path / 'ckpt')).load_config()
    assert cfg2 == CFG


@pytest.mark.slow
def test_vl_train_step_with_flash_attention(rng):
    """The finetune stage's flash-attention training path (interpret mode
    on CPU) — replaces the reference's flash-attn monkey patch."""
    sp = SpecialIds.from_base_vocab(CFG.llm.vocab_size)
    model = GromaModel(CFG)
    raw = np.array([1, 5, sp.image, 7, sp.region, 9, 10, 2])
    labels = np.array([IGNORE_INDEX] * 5 + [9, 10, 2])
    t = expand_template(raw, labels, sp, CFG.num_image_tokens,
                        CFG.max_region_num, CFG.max_seq_len)
    batch = {
        'images': jnp.asarray(rng.standard_normal((1, 56, 56, 3)),
                              jnp.float32),
        'input_ids': jnp.asarray(t['input_ids'][None]),
        'region_slot': jnp.asarray(t['region_slot'][None]),
        'valid': jnp.asarray(t['valid'][None]),
        'labels': jnp.asarray(t['labels'][None]),
    }
    params = model.init(jax.random.PRNGKey(0), images=batch['images'],
                        input_ids=batch['input_ids'],
                        region_slot=batch['region_slot'],
                        base_valid=batch['valid'])['params']
    tx = make_adamw(1e-3)
    state = TrainState.create(params, tx)
    step = make_vl_train_step(model, tx, use_flash=True)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics['loss']))
    # flash and XLA attention agree on the loss
    step2 = make_vl_train_step(model, tx, use_flash=False)
    _, metrics2 = step2(state, batch, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(metrics['loss']),
                               float(metrics2['loss']), atol=1e-3)
