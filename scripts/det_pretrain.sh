#!/bin/bash
# Stage 1: detection pretraining (reference: scripts/det_pretrain.sh).
# On TPU there is no torchrun — one process drives the whole mesh.
DINO_PATH=$1
OUTPUT_DIR=$2
mkdir -p $OUTPUT_DIR
python -m groma_tpu.train.train_det \
    --vis_encoder $DINO_PATH \
    --dataset_config groma_tpu/data/configs/det_pretrain.py \
    --num_classes 1 \
    --num_queries 300 \
    --num_feature_levels 1 \
    --num_train_epochs 12 \
    --learning_rate 2e-4 \
    --weight_decay 1e-4 \
    --max_grad_norm 1.0 \
    --warmup_steps 100 \
    --logging_steps 100 \
    --per_device_train_batch_size 64 \
    --save_strategy epoch \
    --output_dir $OUTPUT_DIR \
    | tee $OUTPUT_DIR/train.log
