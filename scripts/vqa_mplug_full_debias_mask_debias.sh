#!/bin/sh
# mPLUG mask-train on top of the debias-fine-tuned model
# (mPLUG/scripts/vqa_full_debias_mask_debias.sh): load the full_model_debias
# checkpoint, train masks at zero_rate 0.5 with (1-bias) reweighting.
# Paper row: mPLUG(LPF)+mask-train(LPF) = 63.66 @ 51.98% params
# (mPLUG/README.md:39).
ROOT_DIR=${ROOT_DIR:-.}
python -m crvqa_tpu.cli.vqa_mplug \
    --mode mask --zero_rate 0.5 \
    --train_files "$ROOT_DIR/data/vqacp_ocr_object/train_bias.json" \
    --test_files "$ROOT_DIR/data/vqacp_ocr_object/test.json" \
    --vqa_root "$ROOT_DIR/img_root/coco_2014" \
    --init_ckpt "$ROOT_DIR/out/mplug-full-model-debias/ckpt_final" \
    --add_ocr true --add_object true \
    --train_batch_size 48 --eval_batch_size 64 \
    --num_train_epochs 8 --lr1 3e-5 --lr2 5e-6 --min_lr 1e-6 \
    --masker_update_step 100 --controlled_init magnitude_soft \
    --use_bias_reweight true \
    --use_checkpoint true --dtype bfloat16 \
    --prng_impl unsafe_rbg \
    --fused_attention true --midseq_attention true \
    --do_train --do_predict \
    --output_dir "$ROOT_DIR/out/mplug-full-debias-mask-debias"
