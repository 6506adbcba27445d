"""Checkpoint save/restore with orbax + auto-resume.

TPU replacement for the reference's HF-Trainer checkpointing
(reference: groma/train/train.py:137-144 auto-resume on ``checkpoint-*``,
save_total_limit, trainer.save_model/save_state;
groma/train/train_det.py:76-85 CPU state-dict collection).  Orbax handles
sharded arrays natively — params stay distributed on save and restore.

Model configs travel with the checkpoint (config.json, the analogue of the
nested HF config serialization, reference: groma/model/groma.py:72-83).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from groma_tpu.config import config_from_json

CKPT_PREFIX = 'checkpoint-'


class CheckpointManager:
    def __init__(self, output_dir: str, save_total_limit: int = 1):
        self.output_dir = os.path.abspath(output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.output_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_total_limit,
                step_prefix=CKPT_PREFIX.rstrip('-'),
                create=True),
        )

    def save(self, step: int, state: Any, config=None, wait: bool = False):
        self.mngr.save(step, args=ocp.args.StandardSave(state))
        if config is not None:
            with open(os.path.join(self.output_dir, 'config.json'),
                      'w') as f:
                f.write(config.to_json_string())
        if wait:
            self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step

    def load_config(self):
        path = os.path.join(self.output_dir, 'config.json')
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return config_from_json(f.read())


def export_params(output_dir: str, params, config=None):
    """Write a params-only export checkpoint (the analogue of the
    reference's trainer.save_model final export,
    reference: groma/train/train.py:142-144) to <output_dir>/export —
    loadable by checkpoint/loader.py without optimizer state."""
    path = os.path.join(os.path.abspath(output_dir), 'export')
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, 'params'), {'params': params},
               force=True)
    ckptr.wait_until_finished()
    if config is not None:
        with open(os.path.join(output_dir, 'config.json'), 'w') as f:
            f.write(config.to_json_string())


def restore_params(output_dir: str, params_template):
    """Restore a params-only export written by ``export_params``."""
    path = os.path.join(os.path.abspath(output_dir), 'export', 'params')
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(path, {'params': params_template})
    return out['params']


def maybe_resume(manager: CheckpointManager, state_template):
    """HF-Trainer-style auto-resume: restore the latest checkpoint if one
    exists (reference: groma/train/train.py:137-140)."""
    restored, step = manager.restore(state_template)
    if restored is None:
        return state_template, 0
    return restored, int(step)
