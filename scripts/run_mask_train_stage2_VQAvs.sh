#!/bin/sh
# VQA-VS stage-2 launch (bash_files/Stage2/run_mask_train_stage2_VQAvs.sh):
# positional args: lang_comp vis_comp fus_comp zero_rate seed.
# Canonical hparams: lr 5e-5, bs 256, 20 epochs, save_steps 1802,
# controlled_init magnitude.
LANG=${1:-0.3}; VIS=${2:-0.3}; FUS=${3:-0.3}; ZERO=${4:-0.7}; SEED=${5:-42}
ROOT_DIR=${ROOT_DIR:-.}
LABEL="lmh2lmh-VQAvs-Masker-5e-5-linearLR-20epo-$LANG-$VIS-$FUS-zerorate$ZERO-$SEED"
python -m crvqa_tpu.cli.prune_debias_vqavs \
    --dataroot "$ROOT_DIR/data/vqavs" \
    --img_root "$ROOT_DIR/data/vqa_img_feature_trainval.pickle" \
    --label4save "$LABEL" \
    --masker_level modal \
    --Lang_comp "$LANG" --Vis_comp "$VIS" --Fus_comp "$FUS" \
    --zero_rate "$ZERO" \
    --FTmodel_type lmh --Masker_type lmh \
    --stage1_ckpt "$ROOT_DIR/out/stage1-vqavs-lmh-$SEED/lmh_FTlmh_only.bin" \
    --learning_rate 5e-5 \
    --per_gpu_train_batch_size 256 \
    --per_gpu_eval_batch_size 256 \
    --num_train_epochs 20 \
    --logging_steps 100 \
    --save_steps 1802 \
    --controlled_init magnitude \
    --seed "$SEED" \
    --prng_impl unsafe_rbg \
    --fused_attention true \
    --do_train --do_eval --evaluate_during_training \
    --output_dir "$ROOT_DIR/out/$LABEL"
