#!/bin/bash
# Tiny smoke run (reference: scripts/debug.sh 0.001-epoch single-GPU).
python -m groma_tpu.train.train_vl \
    --llm checkpoints/vicuna-7b-v1.5 \
    --perceiver checkpoints/ddetr_box \
    --dataset_config groma_tpu/data/configs/vl_pretrain.py \
    --freeze_perceiver True --freeze_llm True \
    --num_train_epochs 0.001 \
    --per_device_train_batch_size 2 \
    --learning_rate 1e-4 \
    --output_dir ./checkpoints/debug
