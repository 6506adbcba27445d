"""Detection-pretrain entry point (stage 1).

(reference: groma/train/train_det.py:161-253 + scripts/det_pretrain.sh):
builds the Perceiver from a DINOv2 checkpoint, AdamW with 0.1x lr groups on
backbone/offset params, class-agnostic two-stage DDETR losses, cosine
schedule, source-grouped batches, orbax checkpoints with auto-resume.
Distribution: one (dp, fsdp) mesh; GSPMD shards batch + params.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    # model args (reference: train_det.py:36-57 ModelArguments)
    ap.add_argument('--vis_encoder', default=None,
                    help='HF dinov2 checkpoint dir (optional)')
    ap.add_argument('--num_queries', type=int, default=300)
    ap.add_argument('--ddetr_hidden_dim', type=int, default=256)
    ap.add_argument('--num_encoder_layers', type=int, default=6)
    ap.add_argument('--num_decoder_layers', type=int, default=6)
    ap.add_argument('--num_feature_levels', type=int, default=1)
    ap.add_argument('--two_stage', type=bool, default=True)
    ap.add_argument('--with_box_refine', type=bool, default=True)
    ap.add_argument('--num_classes', type=int, default=1)
    # training args (reference: train_det.py:62-73 + det_pretrain.sh)
    ap.add_argument('--dataset_config', required=True)
    ap.add_argument('--output_dir', required=True)
    ap.add_argument('--num_train_epochs', type=float, default=12)
    ap.add_argument('--per_device_train_batch_size', type=int, default=8)
    ap.add_argument('--learning_rate', type=float, default=2e-4)
    ap.add_argument('--weight_decay', type=float, default=1e-4)
    ap.add_argument('--max_grad_norm', type=float, default=1.0)
    ap.add_argument('--warmup_steps', type=int, default=100)
    ap.add_argument('--logging_steps', type=int, default=100)
    ap.add_argument('--save_strategy', default='epoch')
    ap.add_argument('--save_steps', type=int, default=2500)
    ap.add_argument('--save_total_limit', type=int, default=1)
    ap.add_argument('--freeze_vis_encoder', type=bool, default=True)
    ap.add_argument('--lr_multiplier', type=float, default=0.1)
    ap.add_argument('--dataloader_num_workers', type=int, default=8)
    ap.add_argument('--dp', type=int, default=1)
    ap.add_argument('--tp', type=int, default=1)
    ap.add_argument('--seed', type=int, default=0)
    return ap.parse_args()


def main():
    args = parse_args()
    import jax
    import jax.numpy as jnp

    from groma_tpu.config import DDETRConfig, PerceiverConfig, ViTConfig
    from groma_tpu.checkpoint.hf_import import (import_dinov2,
                                                load_state_dict)
    from groma_tpu.checkpoint.orbax_io import CheckpointManager, maybe_resume
    from groma_tpu.data.build import (SourceGroupedBatchSampler,
                                      build_multi_datasets, collate_det)
    from groma_tpu.data.loader import DataLoader
    from groma_tpu.models.perceiver import Perceiver
    from groma_tpu.parallel.mesh import (data_sharding, make_mesh,
                                         shard_params)
    from groma_tpu.train.optimizer import (cosine_schedule,
                                           det_lr_mult_rules,
                                           freeze_predicate, make_adamw)
    from groma_tpu.train.steps import TrainState, make_det_train_step
    from groma_tpu.utils.logging import print0

    vit = ViTConfig()
    ddetr = DDETRConfig(
        d_model=args.ddetr_hidden_dim, num_queries=args.num_queries,
        encoder_layers=args.num_encoder_layers,
        decoder_layers=args.num_decoder_layers,
        num_feature_levels=args.num_feature_levels,
        num_labels=args.num_classes, two_stage=args.two_stage,
        with_box_refine=args.with_box_refine)
    cfg = PerceiverConfig(vit=vit, ddetr=ddetr)
    model = Perceiver(cfg)

    dataset = build_multi_datasets(args.dataset_config)
    sampler = SourceGroupedBatchSampler(
        dataset, args.per_device_train_batch_size, seed=args.seed)
    loader = DataLoader(dataset, sampler, collate_det,
                        num_workers=args.dataloader_num_workers)
    steps_per_epoch = len(sampler)
    total_steps = int(steps_per_epoch * args.num_train_epochs)

    tx = make_adamw(
        cosine_schedule(args.learning_rate, total_steps,
                        warmup_steps=args.warmup_steps),
        weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        lr_mult_rules=det_lr_mult_rules(args.lr_multiplier),
        frozen_pred=freeze_predicate(
            freeze_vis_encoder=args.freeze_vis_encoder))

    img = cfg.image_size
    init_img = jnp.zeros((1, img, img, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(args.seed), init_img)['params']
    if args.vis_encoder:
        sd = load_state_dict(args.vis_encoder)
        params['vis_encoder'] = jax.tree_util.tree_map(
            jnp.asarray,
            import_dinov2(sd, vit.num_layers, vit.patch_size,
                          deploy_grid=img // vit.patch_size))

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    with mesh:
        params = shard_params(params, mesh)
        state = jax.jit(lambda p: TrainState.create(p, tx))(params)
        mngr = CheckpointManager(args.output_dir, args.save_total_limit)
        state, start_step = maybe_resume(mngr, state)
        if start_step:
            print0(f'resumed from step {start_step}')

        step_fn = jax.jit(
            make_det_train_step(model, ddetr, tx, source='coco'),
            static_argnames=())
        step_fns = {}
        dshard = data_sharding(mesh)

        step = start_step
        t0 = time.time()
        for epoch in range(int(np.ceil(args.num_train_epochs))):
            sampler.set_epoch(epoch)
            for batch in loader:
                if step >= total_steps:
                    break
                source = batch.pop('source')
                if source not in step_fns:
                    step_fns[source] = jax.jit(make_det_train_step(
                        model, ddetr, tx, source=source
                        if source in ('coco', 'sa1b') else 'coco'))
                device_batch = {
                    'images': jax.device_put(batch['images'], dshard),
                    'targets': {k: jax.device_put(v, dshard)
                                for k, v in batch['targets'].items()},
                }
                prof_dir = os.environ.get('GROMA_PROFILE_DIR')
                if prof_dir and step == 10:
                    jax.profiler.start_trace(prof_dir)
                if prof_dir and step == 13:
                    jax.profiler.stop_trace()
                state, losses = step_fns[source](state, device_batch)
                step += 1
                if step % args.logging_steps == 0:
                    print0(f'step {step}/{total_steps} '
                           f'loss {float(losses["loss"]):.4f} '
                           f'({(time.time() - t0) / args.logging_steps:.2f}'
                           f' s/step)')
                    t0 = time.time()
                if args.save_strategy == 'steps' \
                        and step % args.save_steps == 0:
                    mngr.save(step, state, config=cfg)
            if args.save_strategy == 'epoch':
                mngr.save(step, state, config=cfg)
            if step >= total_steps:
                break
        mngr.save(step, state, config=cfg, wait=True)
        from groma_tpu.checkpoint.orbax_io import export_params
        export_params(args.output_dir, state.params, config=cfg)
        print0(f'done at step {step}')


if __name__ == '__main__':
    main()
