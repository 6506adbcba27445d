"""End-to-end drill of the one-command REC readiness kit WITHOUT real
weights (round-4 verdict #8): export a tiny model as an HF-layout
checkpoint directory (checkpoint/hf_export.export_hf_dir), synthesize
all 8 RefCOCO/+/g annotation splits + images in the reference's EVAL.md
data layout, and run scripts/run_rec_eval.sh over them — proving the kit
mechanically works end to end (load_groma on the HF dir, eval_rec over
every split path, and the summary-table printer) the day real weights
land (reference: docs/EVAL.md layout; README.md:106-114 table shape)."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import pytest

from groma_tpu.checkpoint.hf_export import export_config, export_hf_dir
from groma_tpu.checkpoint.loader import (_dummy_batch, hf_groma_config,
                                         load_groma)
from groma_tpu.config import tiny_groma_config
from groma_tpu.models.groma import GromaModel

SPLITS = ['refcoco_val', 'refcoco_testA', 'refcoco_testB',
          'refcoco+_val', 'refcoco+_testA', 'refcoco+_testB',
          'refcocog_val', 'refcocog_test']


def test_export_config_roundtrip():
    """export_config is the inverse of hf_groma_config for every field
    the loader reads — a tiny (non-default-shaped) config survives."""
    cfg = tiny_groma_config()
    back = hf_groma_config(export_config(cfg))
    assert back.llm == cfg.llm
    assert back.perceiver.vit == cfg.perceiver.vit
    assert back.perceiver.ddetr == cfg.perceiver.ddetr
    assert back.perceiver.image_size == cfg.perceiver.image_size
    assert back.num_image_tokens == cfg.num_image_tokens
    assert back.max_seq_len == cfg.max_seq_len
    assert back.max_region_num == cfg.max_region_num
    assert back.num_new_token == cfg.num_new_token
    assert back.region_roi_out == cfg.region_roi_out


def _write_data_root(root, rng):
    """Reference EVAL.md layout: annotations/<split>.json + train2014/."""
    ann_dir = os.path.join(root, 'annotations')
    img_dir = os.path.join(root, 'train2014')
    os.makedirs(ann_dir)
    os.makedirs(img_dir)
    from PIL import Image
    W = H = 64
    for k, split in enumerate(SPLITS):
        images, annotations = [], []
        for i in range(2):            # 2 expressions per split
            iid = 1000 * k + i
            fname = f'COCO_train2014_{iid:012d}.jpg'
            images.append({'id': iid, 'file_name': fname,
                           'width': W, 'height': H,
                           'caption': f'the object number {i}'})
            annotations.append({'id': iid, 'image_id': iid,
                                'bbox': [8.0, 8.0, 24.0, 24.0],
                                'category_id': 1, 'area': 576.0,
                                'iscrowd': 0})
            arr = rng.integers(0, 255, (H, W, 3), dtype=np.uint8)
            Image.fromarray(arr).save(os.path.join(img_dir, fname))
        with open(os.path.join(ann_dir, split + '.json'), 'w') as f:
            json.dump({'images': images, 'annotations': annotations,
                       'categories': [{'id': 1, 'name': 'object'}]}, f)


@pytest.mark.slow
def test_rec_kit_all_splits(tmp_path, rng):
    # 1. the fixture checkpoint: tiny model exported as an HF-layout dir
    cfg = tiny_groma_config()
    model = GromaModel(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           **_dummy_batch(cfg)))()['params']
    params = jax.tree_util.tree_map(np.asarray, params)
    ckpt = str(tmp_path / 'hf_ckpt')
    export_hf_dir(params, cfg, ckpt)

    # the exported dir reloads through the HF branch of load_groma
    _, params2, cfg2 = load_groma(ckpt)
    assert cfg2 == cfg
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(params2)
    assert all(np.allclose(a, b) for a, b in zip(l1, l2))

    # 2. synthetic 8-split data root
    data = str(tmp_path / 'data')
    os.makedirs(data)
    _write_data_root(data, rng)

    # 3. the one-command kit, exactly as a user would run it (fresh
    # interpreter per split; CPU mesh — strip the axon sitecustomize)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    env['REC_TOKENIZER'] = 'stub'
    env['REC_OUT'] = str(tmp_path / 'out')
    pyp = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
           if p and 'axon_site' not in p]
    env['PYTHONPATH'] = os.pathsep.join(pyp + [repo])
    proc = subprocess.run(
        ['bash', os.path.join(repo, 'scripts', 'run_rec_eval.sh'),
         ckpt, data, '2'],
        capture_output=True, text=True, env=env, timeout=1200)
    out = proc.stdout
    assert proc.returncode == 0, (out[-2000:], proc.stderr[-2000:])

    # every split produced a metric row (not skipped / no-metric)...
    for s in SPLITS:
        row = next((ln for ln in out.splitlines()
                    if ln.startswith(f'| {s} ')), None)
        assert row is not None, f'no table row for {s}\n{out[-2000:]}'
        assert 'skipped' not in row and 'no metric' not in row, row
    # ...and the average row aggregates all 8 (random tiny weights -> the
    # VALUE is meaningless; the drill proves the plumbing)
    assert '| **avg (8 splits)** |' in out, out[-2000:]
