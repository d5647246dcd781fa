#!/bin/sh
# Canonical stage-2 launch (bash_files/Stage2/run_mask_train_stage2.sh):
# positional args: lang_comp vis_comp fus_comp zero_rate seed
LANG=${1:-0.3}; VIS=${2:-0.3}; FUS=${3:-0.3}; ZERO=${4:-0.7}; SEED=${5:-42}
ROOT_DIR=${ROOT_DIR:-.}
LABEL="lmh2lmh-Masker-5e-5-20epo-$LANG-$VIS-$FUS-zerorate$ZERO-$SEED"
python -m crvqa_tpu.cli.prune_debias_vqa \
    --dataroot "$ROOT_DIR/data/vqacp2" \
    --img_root "$ROOT_DIR/data/vqa_img_feature_trainval.pickle" \
    --label4save "$LABEL" \
    --masker_level modal \
    --Lang_comp "$LANG" --Vis_comp "$VIS" --Fus_comp "$FUS" \
    --zero_rate "$ZERO" \
    --FTmodel_type lmh --Masker_type lmh \
    --stage1_ckpt "$ROOT_DIR/out/stage1-lmh-$SEED/lmh_FTlmh_only.bin" \
    --learning_rate 5e-5 \
    --per_gpu_train_batch_size 256 \
    --per_gpu_eval_batch_size 256 \
    --num_train_epochs 20 \
    --logging_steps 100 \
    --save_steps 1712 \
    --controlled_init magnitude \
    --seed "$SEED" \
    --prng_impl unsafe_rbg \
    --fused_attention true \
    --do_train --do_eval --evaluate_during_training \
    --output_dir "$ROOT_DIR/out/$LABEL"
