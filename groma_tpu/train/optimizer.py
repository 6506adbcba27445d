"""Optimizers with the reference's param-group rules, in optax.

Reproduces:
* det stage: AdamW with 0.1x lr on backbone and on
  {reference_points, sampling_offsets} params
  (reference: groma/train/train_det.py:198-216, lr_multiplier 0.1),
* vl stages: HF-Trainer-style weight-decay split (no decay on biases and
  norm scales) plus optional custom lr multipliers per submodule
  (reference: groma/train/groma_trainer.py:78-133 create_optimizer),
* freeze switches as zero-update masks
  (reference: groma/model/groma.py:150-157 freeze_* and
  groma/train/train.py:116-121).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import optax


def _path_str(path) -> str:
    return '/'.join(str(getattr(p, 'key', p)) for p in path)


def label_params(params, rules: Sequence[tuple], default: str):
    """Label each leaf by the first matching (predicate(path) -> label)."""
    def one(path, _leaf):
        p = _path_str(path)
        for pred, label in rules:
            if pred(p):
                return label
        return default
    return jax.tree_util.tree_map_with_path(one, params)


def _no_decay(path: str) -> bool:
    last = path.rsplit('/', 1)[-1]
    return last in ('bias', 'scale', 'layerscale1', 'layerscale2',
                    'cls_token', 'pos_embed', 'level_embed')


def make_adamw(learning_rate, weight_decay: float = 0.0,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               max_grad_norm: Optional[float] = None,
               lr_mult_rules: Sequence[tuple] = (),
               frozen_pred: Optional[Callable[[str], bool]] = None):
    """AdamW with decay masking, per-group lr multipliers and freezing.

    Args:
      learning_rate: float or optax schedule.
      lr_mult_rules: iterable of (predicate(path) -> bool, multiplier).
      frozen_pred: predicate(path) -> True for frozen params (zero update).
    """
    def decay_mask(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: not _no_decay(_path_str(p)), params)

    chain = []
    if max_grad_norm:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay, decay_mask))
    if lr_mult_rules:
        def mult_mask(params):
            def one(path, _):
                p = _path_str(path)
                for pred, mult in lr_mult_rules:
                    if pred(p):
                        return mult
                return 1.0
            return jax.tree_util.tree_map_with_path(one, params)

        def scale_by_mult():
            def init(params):
                return {'mult': mult_mask(params)}

            def update(updates, state, params=None):
                updates = jax.tree_util.tree_map(
                    lambda u, m: u * m, updates, state['mult'])
                return updates, state
            return optax.GradientTransformation(init, update)
        chain.append(scale_by_mult())
    chain.append(optax.scale_by_learning_rate(learning_rate))
    tx = optax.chain(*chain)

    if frozen_pred is not None:
        def label(params):
            return jax.tree_util.tree_map_with_path(
                lambda p, _: 'frozen' if frozen_pred(_path_str(p))
                else 'train', params)
        tx = optax.multi_transform(
            {'train': tx, 'frozen': optax.set_to_zero()}, label)
    return tx


def cosine_schedule(base_lr: float, total_steps: int,
                    warmup_steps: int = 0, warmup_ratio: float = 0.0):
    """HF-Trainer cosine schedule with linear warmup
    (reference: scripts/*.sh --lr_scheduler_type cosine --warmup_ratio)."""
    warmup = warmup_steps or int(total_steps * warmup_ratio)
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base_lr, warmup_steps=max(warmup, 1),
        decay_steps=max(total_steps, 2), end_value=0.0)


# reference param-group predicates (train_det.py:69-72)
def det_lr_mult_rules(multiplier: float = 0.1):
    return [
        (lambda p: 'vis_encoder' in p, multiplier),
        (lambda p: 'sampling_offsets' in p, multiplier),
    ]


def freeze_predicate(freeze_perceiver=False, freeze_llm=False,
                     freeze_vis_encoder=False):
    def pred(path: str) -> bool:
        if freeze_perceiver and path.startswith('perceiver/'):
            return True
        if freeze_vis_encoder and 'vis_encoder/' in path:
            return True
        if freeze_llm and (path.startswith('llm/')
                           or path.startswith('embed_tokens')
                           or path.startswith('lm_head/')):
            return True
        return False
    return pred
