"""VL-stage training entry point (stages 2 + 3).

(reference: groma/train/train.py:63-148 + scripts/vl_pretrain.sh /
vl_finetune.sh): compose the model from ``--llm`` + ``--perceiver``
checkpoints or resume a full Groma checkpoint; freeze switches; CE loss on
the grounded token stream; cosine schedule; gradient accumulation; orbax
auto-resume.  The finetune stage's FSDP full_shard becomes GSPMD fsdp-axis
parameter sharding (+ remat via the model's use_flash/remat options).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args():
    ap = argparse.ArgumentParser()
    # model composition (reference: train.py:32-61)
    ap.add_argument('--model_name_or_path', default=None,
                    help='full Groma checkpoint (HF or ours)')
    ap.add_argument('--llm', default=None, help='vicuna checkpoint dir')
    ap.add_argument('--perceiver', default=None,
                    help='det-pretrained perceiver checkpoint dir')
    ap.add_argument('--tokenizer', default=None)
    ap.add_argument('--nms_thres', type=float, default=0.6)
    ap.add_argument('--box_score_thres', type=float, default=0.15)
    ap.add_argument('--max_region_num', type=int, default=100)
    ap.add_argument('--freeze_perceiver', type=bool, default=True)
    ap.add_argument('--freeze_llm', type=bool, default=False)
    # training (reference: scripts/vl_*.sh)
    ap.add_argument('--dataset_config', required=True)
    ap.add_argument('--output_dir', required=True)
    ap.add_argument('--num_train_epochs', type=float, default=1)
    ap.add_argument('--per_device_train_batch_size', type=int, default=2)
    ap.add_argument('--gradient_accumulation_steps', type=int, default=1)
    ap.add_argument('--learning_rate', type=float, default=1e-4)
    ap.add_argument('--weight_decay', type=float, default=0.0)
    ap.add_argument('--warmup_ratio', type=float, default=0.03)
    ap.add_argument('--model_max_length', type=int, default=2048)
    ap.add_argument('--logging_steps', type=int, default=1)
    ap.add_argument('--save_steps', type=int, default=2500)
    ap.add_argument('--save_total_limit', type=int, default=1)
    ap.add_argument('--gradient_checkpointing', type=bool, default=False)
    ap.add_argument('--use_flash_attention', type=bool, default=True)
    ap.add_argument('--dataloader_num_workers', type=int, default=8)
    ap.add_argument('--dp', type=int, default=1)
    ap.add_argument('--tp', type=int, default=1)
    ap.add_argument('--seed', type=int, default=0)
    return ap.parse_args()


def compose_model(args):
    """Build GromaModel params from stage checkpoints
    (reference: train.py:84-113 compose-vs-resume switch)."""
    import jax
    import jax.numpy as jnp

    from groma_tpu.checkpoint.loader import (hf_groma_config, load_groma,
                                             _dummy_batch)
    from groma_tpu.checkpoint.hf_import import (import_llama,
                                                import_perceiver,
                                                load_state_dict,
                                                load_config_json)

    from groma_tpu.models.groma import GromaModel

    if args.model_name_or_path:
        return load_groma(args.model_name_or_path)

    assert args.llm and args.perceiver, \
        'need --llm and --perceiver (reference: train.py:114)'
    # derive config from the two checkpoints' config.json
    llm_cfg_d = load_config_json(args.llm)
    perc_cfg_d = load_config_json(args.perceiver)
    cfg = hf_groma_config({
        'llm_cfg': llm_cfg_d,
        'perceiver_cfg': perc_cfg_d if 'vis_encoder_cfg' in perc_cfg_d
        else {'vis_encoder_cfg': perc_cfg_d.get('vis_encoder_cfg', {}),
              'ddetr_cfg': perc_cfg_d.get('ddetr_cfg', {})},
        'nms_thres': args.nms_thres,
        'box_score_thres': args.box_score_thres,
        'max_region_num': args.max_region_num,
    })
    model = GromaModel(cfg)
    params = model.init(jax.random.PRNGKey(args.seed),
                        **_dummy_batch(cfg))['params']
    # load pretrained pieces; bridge/region-encoder/new-embs stay random
    llm_sd = load_state_dict(args.llm)
    llama = import_llama(llm_sd, cfg.llm.num_layers)
    params['llm'] = jax.tree_util.tree_map(jnp.asarray, llama['model'])
    params['embed_tokens'] = jnp.asarray(llama['embed_tokens'])
    params['lm_head'] = jax.tree_util.tree_map(jnp.asarray,
                                               llama['lm_head'])
    perc_sd = load_state_dict(args.perceiver)
    deploy_grid = cfg.perceiver.image_size // cfg.perceiver.vit.patch_size
    params['perceiver'] = jax.tree_util.tree_map(
        jnp.asarray,
        import_perceiver(perc_sd, cfg.perceiver.vit.num_layers,
                         cfg.perceiver.ddetr.encoder_layers,
                         cfg.perceiver.ddetr.decoder_layers,
                         cfg.perceiver.ddetr.num_feature_levels,
                         patch_size=cfg.perceiver.vit.patch_size,
                         deploy_grid=deploy_grid))
    # new-token embeddings init to the mean base embedding
    # (reference: groma/model/groma.py:121-124)
    params['new_input_embs'] = jnp.broadcast_to(
        jnp.mean(params['embed_tokens'], axis=0, keepdims=True),
        (cfg.num_new_token, cfg.llm.hidden_size)).copy()
    return model, params, cfg


def main():
    args = parse_args()
    import jax
    import optax

    from groma_tpu.checkpoint.orbax_io import CheckpointManager, maybe_resume
    from groma_tpu.data.build import (SourceGroupedBatchSampler,
                                      build_multi_datasets, collate_vl)
    from groma_tpu.data.datasets.base import VLDataSpec
    from groma_tpu.data.loader import DataLoader
    from groma_tpu.data.tokenizer import load_tokenizer
    from groma_tpu.parallel.mesh import (data_sharding, make_mesh,
                                         shard_params)
    from groma_tpu.train.optimizer import (cosine_schedule,
                                           freeze_predicate, make_adamw)
    from groma_tpu.train.steps import TrainState, make_vl_train_step
    from groma_tpu.utils.logging import print0

    model, params, cfg = compose_model(args)
    cfg = cfg.replace(max_seq_len=args.model_max_length)
    tokenizer = load_tokenizer(args.tokenizer or args.llm
                            or args.model_name_or_path,
                            model_max_length=args.model_max_length)
    spec = VLDataSpec(num_image_tokens=cfg.num_image_tokens,
                      max_region_num=cfg.max_region_num,
                      max_seq_len=cfg.max_seq_len,
                      image_size=cfg.perceiver.image_size)

    dataset = build_multi_datasets(args.dataset_config,
                                   tokenizer=tokenizer, spec=spec)
    sampler = SourceGroupedBatchSampler(
        dataset, args.per_device_train_batch_size, seed=args.seed)
    loader = DataLoader(dataset, sampler, collate_vl,
                        num_workers=args.dataloader_num_workers)
    steps_per_epoch = max(
        len(sampler) // args.gradient_accumulation_steps, 1)
    total_steps = int(steps_per_epoch * args.num_train_epochs)

    tx = make_adamw(
        cosine_schedule(args.learning_rate, total_steps,
                        warmup_ratio=args.warmup_ratio),
        weight_decay=args.weight_decay,
        frozen_pred=freeze_predicate(
            freeze_perceiver=args.freeze_perceiver,
            freeze_llm=args.freeze_llm))
    if args.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, args.gradient_accumulation_steps)

    mesh = make_mesh(dp=args.dp, tp=args.tp)
    with mesh:
        params = shard_params(params, mesh)
        state = jax.jit(lambda p: TrainState.create(p, tx))(params)
        mngr = CheckpointManager(args.output_dir, args.save_total_limit)
        state, start_step = maybe_resume(mngr, state)
        if start_step:
            print0(f'resumed from step {start_step}')

        step_fn = jax.jit(make_vl_train_step(
            model, tx, use_flash=args.use_flash_attention))
        dshard = data_sharding(mesh)
        rng = jax.random.PRNGKey(args.seed)

        micro = start_step * args.gradient_accumulation_steps
        t0 = time.time()
        for epoch in range(int(np.ceil(args.num_train_epochs))):
            sampler.set_epoch(epoch)
            for batch in loader:
                step = micro // args.gradient_accumulation_steps
                if step >= total_steps:
                    break
                batch.pop('source', None)
                device_batch = {k: jax.device_put(v, dshard)
                                for k, v in batch.items()}
                rng, sub = jax.random.split(rng)
                prof_dir = os.environ.get('GROMA_PROFILE_DIR')
                if prof_dir and step == 10:
                    jax.profiler.start_trace(prof_dir)
                if prof_dir and step == 13:
                    jax.profiler.stop_trace()
                state, metrics = step_fn(state, device_batch, sub)
                micro += 1
                step = micro // args.gradient_accumulation_steps
                if micro % (args.logging_steps
                            * args.gradient_accumulation_steps) == 0:
                    dt = (time.time() - t0) / args.logging_steps
                    print0(f'step {step}/{total_steps} '
                           f'loss {float(metrics["loss"]):.4f} '
                           f'({dt:.2f} s/step)')
                    t0 = time.time()
                if step and step % args.save_steps == 0 \
                        and micro % args.gradient_accumulation_steps == 0:
                    mngr.save(step, state, config=cfg)
            if step >= total_steps:
                break
        mngr.save(total_steps, state, config=cfg, wait=True)
        from groma_tpu.checkpoint.orbax_io import export_params
        export_params(args.output_dir, state.params, config=cfg)
        print0('training complete')


if __name__ == '__main__':
    main()
