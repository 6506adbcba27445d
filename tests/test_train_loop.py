"""Integration: synthetic COCO data -> datasets -> sampler -> threaded
loader -> jitted VL train step -> loss decreases over steps (the debug.sh
smoke run, end to end through real code paths)."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from groma_tpu.config import tiny_groma_config
from groma_tpu.data.build import (ConcatDataset, SourceGroupedBatchSampler,
                                  collate_vl)
from groma_tpu.data.datasets.base import VLDataSpec
from groma_tpu.data.datasets.vl_datasets import RefCOCO
from groma_tpu.data.loader import DataLoader
from groma_tpu.data.tokenizer import StubTokenizer
from groma_tpu.models.groma import GromaModel
from groma_tpu.train.optimizer import freeze_predicate, make_adamw
from groma_tpu.train.steps import TrainState, make_vl_train_step

# heavyweight tier (round-5 verdict #7): run with -m slow; the
# default tier must stay <5 min
pytestmark = pytest.mark.slow

CFG = tiny_groma_config()


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('traindata')
    from PIL import Image
    rng = np.random.default_rng(0)
    (root / 'imgs').mkdir()
    images, anns = [], []
    for i in range(8):
        Image.fromarray(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
                        ).save(root / 'imgs' / f'{i}.jpg')
        images.append({'id': i, 'file_name': f'{i}.jpg', 'width': 64,
                       'height': 48, 'caption': f'object number {i}'})
        anns.append({'id': i, 'image_id': i, 'bbox': [8, 8, 24, 24],
                     'area': 576, 'category_id': 1})
    with open(root / 'ann.json', 'w') as f:
        json.dump({'images': images, 'annotations': anns,
                   'categories': [{'id': 1, 'name': 'object'}]}, f)
    return root


def test_train_loop_loss_decreases(data_root):
    spec = VLDataSpec(num_image_tokens=CFG.num_image_tokens,
                      max_region_num=CFG.max_region_num,
                      max_seq_len=CFG.max_seq_len,
                      max_ground_boxes=4, max_refer_boxes=2,
                      image_size=CFG.perceiver.image_size)
    tok = StubTokenizer(base_vocab=CFG.llm.vocab_size)
    ds = ConcatDataset([RefCOCO(str(data_root / 'ann.json'),
                                str(data_root / 'imgs'), tok, spec=spec)])
    sampler = SourceGroupedBatchSampler(ds, batch_size=2)
    loader = DataLoader(ds, sampler, collate_vl, num_workers=2)

    model = GromaModel(CFG)
    first = next(iter(loader))
    params = model.init(
        jax.random.PRNGKey(0),
        images=jnp.asarray(first['images']),
        input_ids=jnp.asarray(first['input_ids']),
        region_slot=jnp.asarray(first['region_slot']),
        base_valid=jnp.asarray(first['valid']))['params']
    tx = make_adamw(3e-3, frozen_pred=freeze_predicate(
        freeze_perceiver=True))
    state = TrainState.create(params, tx)
    step = jax.jit(make_vl_train_step(model, tx))

    losses = []
    rng = jax.random.PRNGKey(0)
    for epoch in range(4):
        sampler.set_epoch(epoch)
        for batch in loader:
            batch.pop('source', None)
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            rng, sub = jax.random.split(rng)
            state, metrics = step(state, device_batch, sub)
            losses.append(float(metrics['loss']))
    assert np.isfinite(losses).all()
    # learning happened: tail loss well below the start
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) * 0.9, losses
