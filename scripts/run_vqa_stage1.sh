#!/bin/sh
# Canonical stage-1 launch (bash_files/Stage1/run_vqa_stage1.sh equivalent):
# bs 64, lr 5e-5, 20 epochs, warmup 34235 steps.
FT_TYPE=${1:-lmh}
SEED=${2:-42}
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.run_vqa_stage1 \
    --dataroot "$ROOT_DIR/data/vqacp2" \
    --img_root "$ROOT_DIR/data/vqa_img_feature_trainval.pickle" \
    --FT_type "$FT_TYPE" \
    --label4save "$FT_TYPE" \
    --learning_rate 5e-5 \
    --per_gpu_train_batch_size 64 \
    --per_gpu_eval_batch_size 64 \
    --num_train_epochs 20 \
    --warmup_steps 34235 \
    --logging_steps 100 \
    --save_steps 1712 \
    --seed "$SEED" \
    --prng_impl unsafe_rbg \
    --fused_attention true \
    --do_train --do_eval --evaluate_during_training \
    --output_dir "$ROOT_DIR/out/stage1-$FT_TYPE-$SEED"
