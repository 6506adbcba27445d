"""End-to-end drills of the LVIS-Ground and region-captioning kits
WITHOUT real weights (round-5 verdict #5) — the eval/rec.py kit's
siblings: export a tiny model as an HF-layout checkpoint, synthesize
the data layouts the scripts document, and run scripts/run_lvis_eval.sh
and scripts/run_cap_eval.sh exactly as a user would (reference:
groma/eval/eval_lvis.py; groma/eval/model_vg.py + eval_cap.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import jax
import pytest

from groma_tpu.checkpoint.hf_export import export_hf_dir
from groma_tpu.config import tiny_groma_config
from groma_tpu.models.groma import GromaModel


@pytest.fixture(scope='module')
def ckpt_dir(tmp_path_factory):
    from groma_tpu.checkpoint.loader import _dummy_batch
    cfg = tiny_groma_config()
    model = GromaModel(cfg)
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0),
                           **_dummy_batch(cfg)))()['params']
    params = jax.tree_util.tree_map(np.asarray, params)
    out = str(tmp_path_factory.mktemp('kits') / 'hf_ckpt')
    export_hf_dir(params, cfg, out)
    return out


def _kit_env():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env['JAX_PLATFORMS'] = 'cpu'
    pyp = [p for p in env.get('PYTHONPATH', '').split(os.pathsep)
           if p and 'axon_site' not in p]
    env['PYTHONPATH'] = os.pathsep.join(pyp + [repo])
    return repo, env


def _img(rng, path, w=64, h=64):
    from PIL import Image
    Image.fromarray(rng.integers(0, 255, (h, w, 3),
                                 dtype=np.uint8)).save(path)


@pytest.mark.slow
def test_lvis_kit(tmp_path, rng, ckpt_dir):
    data = tmp_path / 'data'
    (data / 'annotations').mkdir(parents=True)
    (data / 'val2017').mkdir()
    images, annotations = [], []
    for i in range(3):
        fname = f'{i:012d}.jpg'
        _img(rng, data / 'val2017' / fname)
        images.append({'id': i, 'file_name': fname,
                       'width': 64, 'height': 64})
        annotations.append({'id': i, 'image_id': i,
                            'bbox': [8.0, 8.0, 24.0, 24.0],
                            'category_id': 1 + i % 2, 'area': 576.0,
                            'iscrowd': 0})
    cats = [{'id': 1, 'name': 'cat_a', 'frequency': 'r'},
            {'id': 2, 'name': 'cat_b', 'frequency': 'f'}]
    with open(data / 'annotations' / 'lvis_ground.json', 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': cats}, f)

    repo, env = _kit_env()
    env['LVIS_TOKENIZER'] = 'stub'
    env['LVIS_OUT'] = str(tmp_path / 'out')
    proc = subprocess.run(
        ['bash', os.path.join(repo, 'scripts', 'run_lvis_eval.sh'),
         ckpt_dir, str(data), '3'],
        capture_output=True, text=True, env=env, timeout=1200)
    assert proc.returncode == 0, (proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    res = json.loads(proc.stdout[proc.stdout.index('{'):])
    # random tiny weights -> the VALUES are meaningless; the drill
    # proves the protocol emits the LVIS AP summary incl. buckets
    for key in ('AP', 'AP50', 'AR'):
        assert key in res, res


@pytest.mark.slow
def test_cap_kit(tmp_path, rng, ckpt_dir):
    data = tmp_path / 'data'
    (data / 'annotations').mkdir(parents=True)
    (data / 'images').mkdir()
    images, annotations = [], []
    for i in range(2):
        fname = f'vg_{i}.jpg'
        _img(rng, data / 'images' / fname)
        images.append({'id': i, 'file_name': fname,
                       'width': 64, 'height': 64})
        annotations.append({'id': i, 'image_id': i,
                            'bbox': [8.0, 8.0, 24.0, 24.0],
                            'category_id': 1, 'area': 576.0,
                            'iscrowd': 0,
                            'caption': f'a thing number {i}'})
    with open(data / 'annotations' / 'region_cap.json', 'w') as f:
        json.dump({'images': images, 'annotations': annotations,
                   'categories': [{'id': 1, 'name': 'object'}]}, f)

    repo, env = _kit_env()
    env['CAP_TOKENIZER'] = 'stub'
    env['CAP_OUT'] = str(tmp_path / 'out')
    proc = subprocess.run(
        ['bash', os.path.join(repo, 'scripts', 'run_cap_eval.sh'),
         ckpt_dir, str(data), '2'],
        capture_output=True, text=True, env=env, timeout=1200)
    assert proc.returncode == 0, (proc.stdout[-2000:],
                                  proc.stderr[-2000:])
    res = json.loads(proc.stdout[proc.stdout.index('{'):])
    for key in ('CIDEr', 'BLEU-4', 'METEOR', 'ROUGE_L'):
        assert key in res, res
    assert res['num'] == 2, res
    # the rank shard exists in the documented layout
    shard = tmp_path / 'out' / 'shards' / 'captions_rank0.json'
    assert shard.exists()
    assert len(json.load(open(shard))) == 2
