#!/bin/sh
# Canonical stage-3 launch (bash_files/Stage3/run_vqa_stage3.sh): bs 64.
STAGE2_DIR=${1:?usage: run_vqa_stage3.sh <stage2_output_dir> [ft_type] [seed]}
FT_TYPE=${2:-lmh}; SEED=${3:-42}
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.run_vqa_stage3 \
    --dataroot "$ROOT_DIR/data/vqacp2" \
    --img_root "$ROOT_DIR/data/vqa_img_feature_trainval.pickle" \
    --FT_type "$FT_TYPE" \
    --training_type FT_trainedMask \
    --stage1_ckpt "$ROOT_DIR/out/stage1-$FT_TYPE-$SEED/${FT_TYPE}_FT${FT_TYPE}_only.bin" \
    --mask_pt "$STAGE2_DIR/mask.pt" \
    --classifier_bin "$STAGE2_DIR/classifier4masker.bin" \
    --learning_rate 5e-5 \
    --per_gpu_train_batch_size 64 \
    --num_train_epochs 20 \
    --seed "$SEED" \
    --prng_impl unsafe_rbg \
    --fused_attention true \
    --do_train --do_eval --evaluate_during_training \
    --output_dir "$STAGE2_DIR/stage3-$FT_TYPE"
