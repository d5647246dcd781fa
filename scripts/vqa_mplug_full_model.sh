#!/bin/sh
# mPLUG full-model fine-tune, CE loss (mPLUG/scripts/vqa_full_model.sh +
# configs/full_model.yaml): bs 64, lr1 3e-5 / lr2 5e-6, 8 epochs, distill on,
# OCR+object question augmentation, activation checkpointing. The reference's
# 4-GPU DeepSpeed launch maps to the data-parallel mesh (--mesh_data).
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.vqa_mplug \
    --mode full \
    --train_files "$ROOT_DIR/data/vqacp_ocr_object/train.json" \
    --test_files "$ROOT_DIR/data/vqacp_ocr_object/test.json" \
    --vqa_root "$ROOT_DIR/img_root/coco_2014" \
    --init_ckpt "$ROOT_DIR/ckpts/mplug_base" \
    --add_ocr true --add_object true \
    --train_batch_size 64 --eval_batch_size 128 \
    --num_train_epochs 8 --lr1 3e-5 --lr2 5e-6 --min_lr 1e-6 \
    --distill true --alpha 0.4 --alpha_warm_up true \
    --use_bias_reweight false \
    --use_checkpoint true --dtype bfloat16 \
    --prng_impl unsafe_rbg \
    --fused_attention true --midseq_attention true \
    --do_train --do_predict \
    --output_dir "$ROOT_DIR/out/mplug-full-model"
