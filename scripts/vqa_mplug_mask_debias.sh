#!/bin/sh
# mPLUG/scripts/vqa_full+mask_debias.sh equivalent: mask-train with (1-bias)
# debiasing; data-parallel over the whole mesh (DeepSpeed ZeRO-2 -> zero.py).
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.vqa_mplug \
    --mode mask --zero_rate 0.5 \
    --train_files "$ROOT_DIR/data/vqacp_ocr_object/train_bias.json" \
    --test_files "$ROOT_DIR/data/vqacp_ocr_object/test.json" \
    --vqa_root "$ROOT_DIR/img_root/coco_2014" \
    --train_batch_size 48 --eval_batch_size 64 \
    --num_train_epochs 8 --lr1 3e-5 --lr2 5e-6 \
    --masker_update_step 100 --use_bias_reweight true \
    --prng_impl unsafe_rbg \
    --fused_attention true --midseq_attention true \
    --do_train --do_predict \
    --output_dir "$ROOT_DIR/out/mplug-mask-debias"
