#!/bin/sh
# mPLUG full-model fine-tune with (1-bias) debias reweighting
# (mPLUG/scripts/vqa_full_model_debias.sh + configs/full_model_debias.yaml):
# train_bias.json entries carry the per-answer bias; bs 48, distill off.
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.vqa_mplug \
    --mode full \
    --train_files "$ROOT_DIR/data/vqacp_ocr_object/train_bias.json" \
    --test_files "$ROOT_DIR/data/vqacp_ocr_object/test.json" \
    --vqa_root "$ROOT_DIR/img_root/coco_2014" \
    --init_ckpt "$ROOT_DIR/ckpts/mplug_base" \
    --add_ocr true --add_object true \
    --train_batch_size 48 --eval_batch_size 64 \
    --num_train_epochs 8 --lr1 3e-5 --lr2 5e-6 --min_lr 1e-6 \
    --distill false \
    --use_bias_reweight true \
    --use_checkpoint true --dtype bfloat16 \
    --prng_impl unsafe_rbg \
    --fused_attention true --midseq_attention true \
    --do_train --do_predict \
    --output_dir "$ROOT_DIR/out/mplug-full-model-debias"
