"""Data layer tests on synthetic COCO-style annotations + images."""

import json
import os

import numpy as np
import pytest

from groma_tpu.constants import DEFAULT_TOKENS, IGNORE_INDEX
from groma_tpu.data.build import (ConcatDataset, SourceGroupedBatchSampler,
                                  build_multi_datasets, collate_det,
                                  collate_vl)
from groma_tpu.data.datasets.base import VLDataSpec, tokenize_and_mask
from groma_tpu.data.tokenizer import StubTokenizer

SPEC = VLDataSpec(num_image_tokens=4, max_region_num=8, max_seq_len=160,
                  max_ground_boxes=8, max_refer_boxes=4, image_size=56)


@pytest.fixture(scope='module')
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp('data')
    from PIL import Image
    rng = np.random.default_rng(0)
    (root / 'imgs').mkdir()
    images, anns = [], []
    aid = 0
    for i in range(6):
        w, h = 64, 48
        Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
                        ).save(root / 'imgs' / f'{i}.jpg')
        images.append({'id': i, 'file_name': f'{i}.jpg', 'width': w,
                       'height': h, 'caption': f'a red thing number {i}'})
        for k in range(2):
            anns.append({'id': aid, 'image_id': i,
                         'bbox': [5 + 10 * k, 5, 20, 20], 'area': 400,
                         'category_id': 1, 'caption': f'object {k}',
                         'tokens_positive': [[2, 5]]})
            aid += 1
    coco = {'images': images, 'annotations': anns,
            'categories': [{'id': 1, 'name': 'object'}]}
    with open(root / 'ann.json', 'w') as f:
        json.dump(coco, f)
    return root


def _tok():
    return StubTokenizer(base_vocab=256, model_max_length=512)


def test_sep_masking_idiom():
    tok = _tok()
    sp = tok.sp
    prompt = ("sys text USER: question one ASSISTANT: "
              + DEFAULT_TOKENS['sep'] + "the answer</s>"
              + DEFAULT_TOKENS['sep'])
    ids, labels = tokenize_and_mask(prompt, tok)
    assert sp.sep not in ids
    # everything before the answer masked, answer supervised
    n_sup = (labels != IGNORE_INDEX).sum()
    assert n_sup >= 2
    sup_ids = ids[labels != IGNORE_INDEX]
    assert 2 in sup_ids          # eos supervised


def test_refcoco_dataset_shapes(data_root):
    from groma_tpu.data.datasets.vl_datasets import RefCOCO
    ds = RefCOCO(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                 _tok(), spec=SPEC)
    s = ds[0]
    assert s['images'].shape == (56, 56, 3)
    assert s['input_ids'].shape == (160,)
    assert s['ground_boxes'].shape == (8, 4)
    assert s['ground_valid'].sum() == 2
    assert (s['region_slot'] >= 0).sum() == 16        # 8 pairs
    # ground box placeholder present pre-substitution
    sp = _tok().sp
    assert (s['input_ids'] == sp.gbox).sum() == 2
    assert (s['labels'] == sp.gbox).sum() == 2        # supervised


def test_flickr_and_vg_and_cocodet(data_root):
    from groma_tpu.data.datasets.vl_datasets import (COCODet, Flickr30k,
                                                     SingleRoundVG)
    tok = _tok()
    for cls in (Flickr30k, SingleRoundVG, COCODet):
        ds = cls(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                 tok, spec=SPEC)
        s = ds[1]
        assert s['input_ids'].shape == (160,)
        assert np.isfinite(s['images']).all()


def test_det_dataset_and_collator(data_root):
    from groma_tpu.data.datasets.det_datasets import ClassAgnosticCoco
    ds = ClassAgnosticCoco(str(data_root / 'ann.json'),
                           str(data_root / 'imgs'), max_boxes=10,
                           image_size=56)
    batch = collate_det([ds[0], ds[1]])
    assert batch['images'].shape == (2, 56, 56, 3)
    assert batch['targets']['boxes'].shape == (2, 10, 4)
    assert batch['source'] == 'coco'
    b = batch['targets']['boxes'][batch['targets']['valid']]
    assert (b >= 0).all() and (b <= 1).all()


def test_source_grouped_sampler(data_root):
    from groma_tpu.data.datasets.vl_datasets import COCODet, RefCOCO
    tok = _tok()
    ds = ConcatDataset([
        RefCOCO(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                tok, spec=SPEC),
        COCODet(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                tok, spec=SPEC),
    ])
    sampler = SourceGroupedBatchSampler(ds, batch_size=2)
    batches = list(sampler)
    assert len(batches) == 6
    for b in batches:
        sources = {ds.source_of_index(i) for i in b}
        assert len(sources) == 1
    # epoch reshuffles
    sampler.set_epoch(1)
    assert [b for b in sampler] != batches


def test_collate_vl_stacks(data_root):
    from groma_tpu.data.datasets.vl_datasets import RefCOCO
    ds = RefCOCO(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                 _tok(), spec=SPEC)
    batch = collate_vl([ds[0], ds[1]])
    assert batch['input_ids'].shape == (2, 160)
    assert batch['images'].shape == (2, 56, 56, 3)


def test_build_from_config_file(data_root, tmp_path):
    cfg = tmp_path / 'cfg.py'
    cfg.write_text(f"""
datasets = [
    dict(type='refcoco_rec', ann_file='{data_root}/ann.json',
         img_prefix='{data_root}/imgs', conv_temp='default'),
    dict(type='coco', ann_file='{data_root}/ann.json',
         img_prefix='{data_root}/imgs', conv_temp='default', ratio=0.5),
]
""")
    ds = build_multi_datasets(str(cfg), tokenizer=_tok(), spec=SPEC)
    assert len(ds.datasets) == 2
    assert len(ds.datasets[1]) == 3       # ratio 0.5 of 6
    s = ds[0]
    assert s['input_ids'].shape == (160,)


def test_dataloader_complete_and_ordered(data_root):
    from groma_tpu.data.datasets.vl_datasets import RefCOCO
    from groma_tpu.data.loader import DataLoader
    ds = RefCOCO(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                 _tok(), spec=SPEC)
    sampler = [[0, 1], [2, 3], [4, 5]]
    loader = DataLoader(ds, sampler, collate_vl, num_workers=3)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b['input_ids'].shape == (2, 160)
    # deterministic across iterations (per-sample RNGs)
    batches2 = list(loader)
    np.testing.assert_array_equal(batches[0]['input_ids'],
                                  batches2[0]['input_ids'])
    np.testing.assert_allclose(batches[0]['images'],
                               batches2[0]['images'])


def test_moderation_hook():
    from groma_tpu.serve import moderation
    assert not moderation.violates_moderation('anything')   # default open
    moderation.set_moderation_checker(lambda t: 'bad' in t)
    assert moderation.violates_moderation('bad words')
    assert not moderation.violates_moderation('fine')
    moderation.set_moderation_checker(lambda t: 1 / 0)      # fails open
    assert not moderation.violates_moderation('x')
    moderation.set_moderation_checker(lambda t: False)       # reset


def test_config_base_inheritance(tmp_path):
    """mmcv Config _base_ semantics: base loaded first, child overrides,
    dicts merge recursively (reference: mmcv/mmcv/utils/config.py:70)."""
    from groma_tpu.data.build import load_config
    (tmp_path / 'base.py').write_text(
        "lr = 0.1\nmodel = dict(depth=6, width=256)\n")
    (tmp_path / 'child.py').write_text(
        "_base_ = './base.py'\nlr = 0.01\nmodel = dict(width=512)\n")
    cfg = load_config(str(tmp_path / 'child.py'))
    assert cfg['lr'] == 0.01
    assert cfg['model'] == {'depth': 6, 'width': 512}

    # _delete_ replaces instead of merging
    (tmp_path / 'child2.py').write_text(
        "_base_ = './base.py'\nmodel = dict(_delete_=True, width=1)\n")
    cfg2 = load_config(str(tmp_path / 'child2.py'))
    assert cfg2['model'] == {'width': 1}


def test_sampler_multihost_shards(data_root):
    """rank/world_size sharding: disjoint, deterministic, equal-length
    per-host batch streams that partition the (even) global order."""
    from groma_tpu.data.datasets.vl_datasets import COCODet, RefCOCO
    tok = _tok()
    ds = ConcatDataset([
        RefCOCO(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                tok, spec=SPEC),
        COCODet(str(data_root / 'ann.json'), str(data_root / 'imgs'),
                tok, spec=SPEC),
    ])
    world = 2
    shards = [list(SourceGroupedBatchSampler(
        ds, batch_size=2, rank=r, world_size=world)) for r in range(world)]
    # equal per-host step count == len()
    for r, sh in enumerate(shards):
        assert len(sh) == len(SourceGroupedBatchSampler(
            ds, batch_size=2, rank=r, world_size=world))
    assert len(shards[0]) == len(shards[1])
    # disjoint sample indices across hosts
    flat = [frozenset(i for b in sh for i in b) for sh in shards]
    assert not (flat[0] & flat[1])
    # interleaving matches the single-host global order (minus ragged tail)
    glob = list(SourceGroupedBatchSampler(ds, batch_size=2))
    n_even = (len(glob) // world) * world
    inter = []
    for i in range(len(shards[0])):
        for sh in shards:
            inter.append(sh[i])
    assert inter == glob[:n_even]
    # deterministic: re-iterating gives the same stream
    again = list(SourceGroupedBatchSampler(ds, batch_size=2, rank=0,
                                           world_size=world))
    assert again == shards[0]
