#!/bin/sh
# bash_files/Stage2/run_mask_train_stage2_visualBert.sh: zero_rate lr seed
ZERO=${1:-0.7}; LR=${2:-5e-5}; SEED=${3:-42}
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.prune_debias_vqa_visualbert \
    --dataroot "$ROOT_DIR/data/vqacp2" \
    --img_root "$ROOT_DIR/data/vqa_img_feature_trainval.pickle" \
    --zero_rate "$ZERO" --learning_rate "$LR" --seed "$SEED" \
    --Masker_type lmh --controlled_init magnitude \
    --per_gpu_train_batch_size 256 --num_train_epochs 20 \
    --logging_steps 100 --save_steps 1712 \
    --prng_impl unsafe_rbg \
    --fused_attention true \
    --do_train --do_eval --evaluate_during_training \
    --output_dir "$ROOT_DIR/out/visualbert-$ZERO-$SEED"
