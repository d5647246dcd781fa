"""mPLUG driver: full-model or mask-training of the generative VQA model.

Re-design of `mPLUG/vqa_mplug.py` (main :311-459, train :130-218,
beam-search evaluation :247-287): replaces DeepSpeed/NCCL with a jitted step
over the data mesh + ZeRO-sharded Adam moments, and the ruamel-yaml config
with flags mirroring `MaskConfigs` (`mPLUG/masking/mask_config.py`) and the
optimizer/schedular blocks of `configs/full_model_debias.yaml`.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core import torch_compat
from ..masking import Masker, MaskerScheduler, ModalSparsity
from ..masking.mplug_specs import mplug_mask_specs
from ..models.mplug import MPlug, MPlugConfig
from ..models.mplug.bert import MPlugBertConfig
from ..models.mplug.vit import ViTConfig
from ..parallel import MeshConfig, make_mesh, replicated_sharding
from ..train import mplug_train
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("vqa_mplug")
    common.add_common_args(p)
    # mPLUG defaults differ from the LXMERT stages (yaml: weight_decay
    # 0.02, warmup = one epoch); None marks "not given" so an explicit
    # --weight_decay 0 / --warmup_steps 0 survives
    p.set_defaults(weight_decay=None, warmup_steps=None)
    p.add_argument("--mode", type=str, default="mask", choices=["full", "mask"])
    p.add_argument("--zero_rate", type=float, default=0.5)
    p.add_argument("--init_sparsity", type=float, default=None)
    p.add_argument("--final_sparsity_epoch", type=float, default=6)
    p.add_argument("--masker_update_step", type=int, default=100)
    p.add_argument("--threshold", type=float, default=1e-2)
    p.add_argument("--init_scale", type=float, default=2e-2)
    p.add_argument("--controlled_init", type=str, default="magnitude_soft")
    p.add_argument("--mask_biases", type=common.str2bool, default=False,
                   help="also mask bias vectors (mask_config.py:mask_biases; "
                        "default False in the shipped config)")
    p.add_argument("--lr1", type=float, default=3e-5)
    p.add_argument("--lr2", type=float, default=5e-6)
    p.add_argument("--min_lr", type=float, default=1e-6)
    # yaml `schedular:` block (scheduler_factory.py:10; shipped configs use
    # cosine; tanh/step are the other authored non-metric options)
    p.add_argument("--sched", type=str, default="cosine",
                   choices=["cosine", "tanh", "step"])
    p.add_argument("--decay_rate", type=float, default=0.1)
    p.add_argument("--decay_steps", type=int, default=0)
    # reference-exact epoch-granular driving (timm t_in_epochs=True; the
    # yaml ships warmup_epochs 4 / warmup_lr 1e-5 / decay_rate 1 and the
    # loop advances warmup per 100 iterations of epoch 0 then steps once per
    # epoch, vqa_mplug.py:145-146,200-201,431). 'step' = smooth step-granular
    # schedules driven by --warmup_steps (TPU-native alternative).
    p.add_argument("--sched_granularity", type=str, default="epoch",
                   choices=["epoch", "step"])
    p.add_argument("--warmup_epochs", type=int, default=4)
    p.add_argument("--warmup_lr", type=float, default=1e-5)
    p.add_argument("--decay_epochs", type=int, default=1)
    # yaml `optimizer:` block (optim_factory.py:56-127; shipped = adamW)
    p.add_argument("--opt", type=str, default="adamw")
    p.add_argument("--opt_momentum", type=float, default=0.9)
    p.add_argument("--use_bias_reweight", type=common.str2bool, default=True)
    p.add_argument("--distill", type=common.str2bool, default=False)
    p.add_argument("--image_res", type=int, default=384)
    p.add_argument("--beam_size", type=int, default=5)
    p.add_argument("--max_answer_len", type=int, default=12)
    p.add_argument("--decode_cache", type=common.str2bool, default=True,
                   help="incremental beam decode with self-attention KV "
                        "caches (chip-measured +31%% beam-5 eval; identical "
                        "outputs — equivalence-tested)")
    p.add_argument("--min_length", type=int, default=1,
                   help="EOS blocked while decode step < min_length "
                        "(vqa_mplug.py:472, predictor.py:207-208)")
    p.add_argument("--lm_head_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="tied-LM-head matmul operand dtype. float32 = "
                        "reference-exact; bfloat16 rounds the operands but "
                        "keeps fp32 accumulation + fp32 logits (the decode "
                        "loop's largest matmul moves to the bf16 MXU path)")
    p.add_argument("--train_files", type=str, nargs="*", default=None)
    p.add_argument("--test_files", type=str, nargs="*", default=None)
    p.add_argument("--vqa_root", type=str, default="")
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="params init: msgpack checkpoint dir, or a reference "
                        "torch .pt/.pth/.bin (vqa_mplug.py:338-376 import: "
                        "model/module unwrap, pos-embed resize, "
                        "fusion./bert. shim)")
    p.add_argument("--init_ckpt_format", type=str, default="auto",
                   choices=["auto", "pretrain", "finetuned"],
                   help="torch-checkpoint key format: 'pretrain' applies the "
                        "reference's pos-embed resize + fusion./bert. rename "
                        "shim (vqa_mplug.py:345-371); 'auto' mirrors its "
                        "gate (full-mode training only, :346)")
    p.add_argument("--clip_name", type=str, default="ViT-B-16",
                   choices=["ViT-B-16", "ViT-L-14"],
                   help="visual tower preset (visual_transformers.py:41-47); "
                        "ViT-L-14 adds the visn_fc 'large' adapter")
    p.add_argument("--use_checkpoint", type=common.str2bool, default=False,
                   help="activation checkpointing (remat) on transformer layers")
    p.add_argument("--eval_method", type=str, default="beam",
                   choices=["beam", "rank"],
                   help="beam: generative decoding; rank: score a fixed "
                        "answer list by LM loss (MPLUG.rank_answers)")
    p.add_argument("--answer_list", type=str, default=None,
                   help="answer_list.json for --eval_method rank")
    p.add_argument("--k_test", type=int, default=10,
                   help="first-token shortlist size for rank eval "
                        "(rank_answer k, model_vqa_mplug.py:196-213); "
                        "0 scores the full list")
    p.add_argument("--alpha", type=float, default=0.4,
                   help="distillation mixing weight (full_model.yaml)")
    p.add_argument("--alpha_warm_up", type=common.str2bool, default=True,
                   help="ramp alpha over the first epoch (vqa_mplug.py:165-168)")
    p.add_argument("--mask_classifier", type=common.str2bool, default=False,
                   help="also mask the momentum twin's LM-head transform "
                        "dense (mask_config.py:mask_classifier)")
    p.add_argument("--add_ocr", type=common.str2bool, default=False,
                   help="append OCR tokens to questions "
                        "(vqa_dataset.py:57-67)")
    p.add_argument("--max_input_length", type=int, default=50,
                   help="question token length when --add_ocr (the "
                        "reference tokenizes at max_input_length with OCR, "
                        "25 otherwise — vqa_mplug.py:159,474)")
    p.add_argument("--add_object", type=common.str2bool, default=False,
                   help="append object labels to questions "
                        "(vqa_dataset.py:68-70)")
    p.add_argument("--device_normalize", type=common.str2bool, default=True,
                   help="ship uint8 images and CLIP-normalize on device "
                        "(4x less host->device traffic; bit-identical "
                        "activations — models/mplug/vit.clip_normalize_u8). "
                        "false = host fp32 normalize (the reference shape)")
    p.add_argument("--synthetic_shapes", type=str, default="6,5,3",
                   help="q_len,answer_len,answers_per_question for the "
                        "--synthetic loader. '25,8,5' matches the "
                        "bench_mplug._batch workload for product-surface "
                        "parity sessions; the tiny default keeps CPU smoke "
                        "tests fast")
    p.add_argument("--eval_pipeline_depth", type=int, default=2,
                   help="in-flight eval batches dispatched ahead of the "
                        "result fetch (0 = serial reference-shaped loop); "
                        "overlaps encode of batch i+1 with the host's fetch/"
                        "detokenize of batch i")
    p.add_argument("--data_workers", type=int, default=4,
                   help="thread-pool width for per-image decode+augment "
                        "inside a batch (reference num_workers=[12,8,8]); "
                        "pixels depend only on the seed, never on this. "
                        "Scales on multi-core TPU hosts; neutral on a "
                        "1-core box (the native ops release the GIL)")
    p.add_argument("--augment", type=common.str2bool, default=True,
                   help="train-time RandomResizedCrop+HFlip+RandAugment(2,7) "
                        "(dataset/__init__.py:28-35); eval always uses the "
                        "plain resize transform")
    return p


def build_model(args):
    """Config + tokenizer + model assembly (shared with `serve_mplug`)."""
    import dataclasses

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    lm_head = (jnp.bfloat16
               if getattr(args, "lm_head_dtype", "float32") == "bfloat16"
               else None)
    if args.tiny:
        config = MPlugConfig(
            bert=MPlugBertConfig.tiny(dtype=dtype,
                                      use_remat=args.use_checkpoint,
                                      lm_head_dtype=lm_head),
            vit=ViTConfig.tiny(dtype=dtype, use_remat=args.use_checkpoint),
            distill=args.distill)
    else:
        if getattr(args, "clip_name", "ViT-B-16") == "ViT-L-14":
            vit = ViTConfig.vit_l_14(image_res=args.image_res, dtype=dtype,
                                     use_remat=args.use_checkpoint)
        else:
            vit = ViTConfig(image_res=args.image_res, dtype=dtype,
                            use_remat=args.use_checkpoint)
        config = MPlugConfig(
            bert=MPlugBertConfig(dtype=dtype, use_remat=args.use_checkpoint,
                                 lm_head_dtype=lm_head),
            vit=vit, distill=args.distill)
    # common parity-alignment dropout overrides (rehearsals run with 0):
    # the two BERT probabilities exist on every tower config; the attention
    # override also covers the ViT. classifier_dropout has no mPLUG surface
    # (LM decoder, no classifier head) — reject rather than silently ignore.
    over = common.config_overrides(args)
    if over.pop("classifier_dropout", None) is not None:
        raise SystemExit("--classifier_dropout has no mPLUG analogue "
                         "(LM-decoder head); remove the flag")
    if over:
        config = dataclasses.replace(
            config, bert=dataclasses.replace(config.bert, **over))
        if "attention_probs_dropout_prob" in over:
            config = dataclasses.replace(
                config, vit=dataclasses.replace(
                    config.vit,
                    attn_dropout=over["attention_probs_dropout_prob"]))
    tokenizer = None
    if not getattr(args, "synthetic", 0) and args.vocab_file:
        # the reference derives bos/eos/pad from ITS tokenizer (eos '[SEP]',
        # full_model_debias.yaml; vqa_mplug.py:429-431) — with a custom
        # vocab the bert-base defaults (101/102/0) would point at the wrong
        # rows, so sync the decode token ids from the actual vocab. Built
        # ONCE here; the data path below reuses it.
        from ..data.vqacp import make_tokenizer

        tokenizer = make_tokenizer(args.vocab_file)
        config = dataclasses.replace(
            config, bos_token_id=int(tokenizer.cls_token_id),
            eos_token_id=int(tokenizer.sep_token_id),
            pad_token_id=int(tokenizer.pad_token_id))
    return config, tokenizer, MPlug(config)


def build_masker(args, config):
    """Masker + scheduler wiring for mask mode (`init_masker`,
    mPLUG/vqa_mplug.py:59-128). The serving driver rebuilds the same masker
    so a training checkpoint's score/threshold trees restore 1:1."""
    c = config.bert
    # momentum twins live in state.params_m under the SAME tree paths, so
    # the masker never needs _m-prefixed specs (they exist only for
    # artifact-name parity at export time)
    specs = mplug_mask_specs(
        vit_layers=config.vit.layers,
        text_encoder_layers=c.text_encoder_layers,
        fusion_layers=c.fusion_layers,
        decoder_layers=c.text_decode_layers,
        stride_layer=c.stride_layer,
        mask_classifier=args.mask_classifier)
    masker = Masker.create(
        specs, ModalSparsity.uniform(args.zero_rate),
        mask_biases=args.mask_biases,
        threshold=args.threshold, init_scale=args.init_scale,
        controlled_init=args.controlled_init)
    scheduler = MaskerScheduler(
        final_sparsity=args.zero_rate, num_epochs=args.num_train_epochs,
        init_sparsity=args.init_sparsity, lambdas_lr=1.0,
        final_epoch=args.final_sparsity_epoch)
    return masker, scheduler


def build_rank_fn(args, config, tokenizer, model, masker, cfg):
    """Fixed-candidate answer re-ranking (`rank_answer`,
    model_vqa_mplug.py:188-245), shared by the offline eval loop and
    `serve_mplug` so a served answer stays byte-identical to the
    `vqa_result.json` entry. Returns `(rank_fn, answers, best_index)`:
    `rank_fn(state, batch)` is jitted; `best_index(out)` maps its output to
    the per-row winning answer-list index (the two rank methods return
    different shapes: topk -> re-ranked ids best-first, dense -> LM losses).
    """
    if args.answer_list:
        from ..data.mplug_data import _tokenize_fixed

        with open(args.answer_list) as fh:
            answers = json.load(fh)
        # the reference appends config['eos'] to every candidate before
        # tokenizing (vqa_mplug.py:231-232) — extra_eos reproduces its
        # [SEP] [SEP] row ending
        ids_np, mask_np = _tokenize_fixed(
            tokenizer, answers, args.max_answer_len, extra_eos=True)
        alist_ids = jnp.asarray(ids_np, jnp.int32)
        alist_mask = jnp.asarray(mask_np, jnp.float32)
    else:
        # synthetic smoke path: rank over a tiny random list
        answers = [f"ans_{i}" for i in range(8)]
        alist_ids = (jnp.arange(8 * 4, dtype=jnp.int32).reshape(8, 4)
                     % config.bert.vocab_size)
        alist_mask = jnp.ones((8, 4), jnp.float32)

    use_topk = 0 < args.k_test < len(answers)

    @jax.jit
    def rank_fn(state, batch):
        params = state.params
        if cfg.mode == "mask" and state.scores is not None:
            params = masker.apply_masks(params, state.scores,
                                        state.thresholds)
        if use_topk:
            # first-token shortlist (k_test) + chain-rule re-rank —
            # B*(1+k) decoder rows instead of B*n_answers
            return model.apply(
                {"params": params}, batch["images"],
                batch["question_ids"], batch["question_mask"],
                alist_ids, alist_mask, k=args.k_test,
                method=model.rank_answers_topk)
        return model.apply({"params": params}, batch["images"],
                           batch["question_ids"], batch["question_mask"],
                           alist_ids, alist_mask,
                           method=model.rank_answers)

    def best_index(out) -> np.ndarray:
        if use_topk:
            return np.asarray(out[0])[:, 0]  # re-ranked best first
        return np.asarray(out).argmin(axis=1)  # LM loss, lower = better

    return rank_fn, answers, best_index


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.init_distributed(args)
    common.setup_logging(args.output_dir)
    common.apply_prng_impl(args)
    common.dump_args(args, args.output_dir)
    common.init_metrics(args)

    config, tokenizer, model = build_model(args)

    from ..data.mplug_data import (
        iterate_batches,
        load_entries,
        synthetic_mplug_batch,
    )

    if args.synthetic:
        ql, al, apq = (int(x) for x in args.synthetic_shapes.split(","))

        def train_batches(epoch):
            for i in range(max(args.synthetic // args.train_batch_size, 1)):
                yield synthetic_mplug_batch(
                    batch_size=args.train_batch_size,
                    image_res=config.vit.image_res, q_len=ql, a_len=al,
                    answers_per_question=apq,
                    uint8_images=args.device_normalize,
                    vocab_size=config.bert.vocab_size, seed=epoch * 1000 + i)

        def eval_batches():
            for i in range(max(args.synthetic // args.eval_batch_size, 1)):
                yield synthetic_mplug_batch(
                    batch_size=args.eval_batch_size,
                    image_res=config.vit.image_res, q_len=ql, a_len=al,
                    answers_per_question=apq,
                    uint8_images=args.device_normalize,
                    vocab_size=config.bert.vocab_size, seed=90000 + i)

        n_train = args.synthetic
    else:
        if tokenizer is None:
            from ..data.vqacp import make_tokenizer

            tokenizer = make_tokenizer(args.vocab_file)
        from ..data.mplug_data import question_token_len

        q_len = question_token_len(args.add_ocr, args.max_input_length)
        train_entries = load_entries(args.train_files, tokenizer,
                                     q_len=q_len, vqa_root=args.vqa_root,
                                     add_ocr=args.add_ocr,
                                     add_object=args.add_object)
        test_entries = load_entries(args.test_files, tokenizer,
                                    q_len=q_len, vqa_root=args.vqa_root,
                                    add_ocr=args.add_ocr,
                                    add_object=args.add_object)
        n_train = len(train_entries)

        def train_batches(epoch):
            return iterate_batches(train_entries, args.train_batch_size,
                                   config.vit.image_res,
                                   shuffle=args.train_shuffle,
                                   seed=args.seed + epoch, drop_last=True,
                                   augment=args.augment,
                                   workers=args.data_workers,
                                   raw_images=args.device_normalize)

        def eval_batches():
            return iterate_batches(test_entries, args.eval_batch_size,
                                   config.vit.image_res,
                                   workers=args.data_workers,
                                   raw_images=args.device_normalize)

    # shape-probe the UNWRAPPED iterator (exactly one batch of host work),
    # then wrap with the prefetcher: overlap image decode + RandAugment
    # with device steps (the reference runs DataLoader(num_workers=[12,8,8]),
    # vqa_mplug.py:422)
    b0 = next(iter(train_batches(0)))
    train_batches = common.wrap_prefetch(
        common.wrap_process_local(train_batches), args)
    eval_batches = common.wrap_prefetch(
        common.wrap_process_local(eval_batches), args)
    jb0 = {k: jnp.asarray(v) for k, v in b0.items()
           if k not in ("qid", "valid")}
    params = model.init(jax.random.PRNGKey(args.seed), jb0["images"],
                        jb0["question_ids"], jb0["question_mask"],
                        jb0["answer_ids"], jb0["answer_mask"],
                        jb0["weights"])["params"]
    loaded_params_m = None
    if args.init_ckpt:
        pretrain_fmt = (args.init_ckpt_format == "pretrain"
                        or (args.init_ckpt_format == "auto"
                            and args.mode == "full" and args.do_train))

        def _mplug_torch_loader(path, template):
            nonlocal loaded_params_m
            from ..core import torch_compat

            loaded, loaded_params_m, report = (
                torch_compat.load_mplug_torch_checkpoint(
                    path, template,
                    template_m=template if args.distill else None,
                    pretrain_format=pretrain_fmt))
            # the analogue of the reference's printed load_state_dict msg
            # (vqa_mplug.py:373-375)
            common.logger.info(
                "init_ckpt %s: %d template leaves missing, %d checkpoint "
                "keys unused%s", path, len(report["missing"]),
                len(report["unused"]),
                " (pretrain-format shims applied)" if pretrain_fmt else "")
            return loaded

        params = common.load_params_any(args.init_ckpt, params,
                                        torch_loader=_mplug_torch_loader)

    steps_per_epoch = max(n_train // args.train_batch_size, 1)
    total_steps = int(steps_per_epoch * args.num_train_epochs)
    cfg = mplug_train.MPlugTrainConfig(
        mode=args.mode, lr1=args.lr1, lr2=args.lr2,
        # explicit zeros must survive: `or` would override --weight_decay 0
        # / --warmup_steps 0 with the mPLUG defaults
        weight_decay=(0.02 if args.weight_decay is None
                      else args.weight_decay),
        warmup_steps=(steps_per_epoch if args.warmup_steps is None
                      else args.warmup_steps),
        total_steps=total_steps, min_lr=args.min_lr, sched=args.sched,
        decay_rate=args.decay_rate, decay_steps=args.decay_steps,
        # epoch granularity = the reference trajectory exactly; explicit
        # --warmup_steps opts into the smooth step-granular surface
        steps_per_epoch=(steps_per_epoch
                         if args.sched_granularity == "epoch"
                         and args.warmup_steps is None else 0),
        epochs=int(args.num_train_epochs),
        warmup_epochs=args.warmup_epochs, warmup_lr_init=args.warmup_lr,
        decay_epochs=args.decay_epochs,
        opt=args.opt, opt_momentum=args.opt_momentum,
        max_grad_norm=args.max_grad_norm,
        use_bias_reweight=args.use_bias_reweight, distill=args.distill,
        alpha=args.alpha,
        alpha_warmup_steps=steps_per_epoch if args.alpha_warm_up else 0)

    masker = None
    scheduler = None
    if args.mode == "mask":
        masker, scheduler = build_masker(args, config)
        # dump the mask config like vqa_mplug.py:506-507 (process 0 only)
        if jax.process_index() == 0:
            with open(os.path.join(args.output_dir,
                                   "mask_config.json"), "w") as f:
                json.dump({"zero_rate": args.zero_rate,
                           "threshold": args.threshold,
                           "init_scale": args.init_scale,
                           "controlled_init": args.controlled_init,
                           "masker_update_step": args.masker_update_step}, f)

    state, tx = mplug_train.init_state(model, params, cfg,
                                       jax.random.PRNGKey(args.seed),
                                       masker=masker)
    if loaded_params_m is not None and state.params_m is not None:
        # checkpoint carried `_m` momentum twins: they override init_state's
        # params copy (reference order — init_distill copies, then
        # load_state_dict fills the twins from the checkpoint, :338-373)
        state = state.replace(params_m=jax.tree_util.tree_map(
            jnp.asarray, loaded_params_m))
    if args.resume_from:
        # BEFORE device placement — from_bytes yields host numpy, which
        # would silently undo shard_opt_state's ZeRO placement below
        state = ckpt.load_checkpoint(args.resume_from, state)
    mesh = make_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    state = jax.device_put(state, replicated_sharding(mesh))
    from ..parallel.zero import shard_opt_state

    state = state.replace(opt_state=shard_opt_state(state.opt_state, mesh))
    shard_fn = common.make_shard_fn(mesh)
    step_fn = mplug_train.make_train_step(model, cfg, tx, masker=masker,
                                          mesh=mesh)
    reset_fn = (mplug_train.make_threshold_reset(masker)
                if masker is not None else None)
    report_fn = (jax.jit(masker.sparsity_report)
                 if masker is not None else None)
    masks_fn = jax.jit(masker.binary_masks) if masker is not None else None
    gen_fn = mplug_train.make_generate_step(model, cfg, masker=masker,
                                            beam_size=args.beam_size,
                                            max_len=args.max_answer_len,
                                            min_length=args.min_length,
                                            use_cache=args.decode_cache)

    if args.do_train:
        # host-side counter: int(state.step) every iteration would sync on
        # the in-flight step and serialize device with host batch prep
        step = int(state.step)
        guard = common.PreemptionGuard()
        profiler = common.ProfileWindow(args)
        t_last, s_last = time.perf_counter(), step
        for epoch in range(int(args.num_train_epochs)):
            for batch_idx, batch in enumerate(train_batches(epoch)):
                dev = shard_fn({k: v for k, v in batch.items()
                                if k not in ("qid", "valid")})
                state, loss = step_fn(state, dev)
                prev, step = step, step + 1
                profiler.tick(step)
                if masker is not None and common.crossed(
                        step, prev, args.masker_update_step):
                    # FRACTIONAL epoch: the AGP/stepwise ramps move at 0.1-
                    # epoch granularity (sparsity_control.py:101); the bare
                    # integer epoch froze the target within each epoch
                    _, target, _ = scheduler.step(
                        epoch + batch_idx / steps_per_epoch)
                    state = reset_fn(state, float(target))
                    report = jax.device_get(
                        report_fn(state.scores, state.thresholds))
                    common.log_step(step, sparsity=float(report["all"]),
                                    target=target)
                if common.crossed(step, prev, args.logging_steps):
                    loss_f = float(loss)  # device fence
                    now = time.perf_counter()
                    ex_s = ((step - s_last) * args.train_batch_size
                            / max(now - t_last, 1e-9))
                    t_last, s_last = now, step
                    common.log_step(step, loss=loss_f, epoch=epoch,
                                    ex_s=round(ex_s, 1))
                if common.crossed(step, prev, args.save_steps):
                    ckpt.save_checkpoint(
                        os.path.join(args.output_dir, f"ckpt_{step}"), state,
                        metadata={"step": step})
                    ckpt.rotate_checkpoints(args.output_dir, keep=2)
                if guard.save_and_stop(args, state, step):
                    profiler.close()
                    return
        profiler.close()
        if masker is not None:
            state = reset_fn(state, None)
            masks = jax.device_get(masks_fn(state.scores, state.thresholds))
            export_specs = list(masker.specs)
            export_masks = dict(masks)
            if args.distill:
                # reference mask.pt also carries the momentum twins' masks
                # (chain_module_names adds _m modules, maskers.py:80-84),
                # binarized from the twins' own EMA'd scores + thresholds
                import dataclasses as _dc

                twin_masks = (jax.device_get(
                    masks_fn(state.scores_m, state.thresholds_m))
                    if state.scores_m is not None else masks)
                for s in masker.specs:
                    if s.momentum_only:
                        continue
                    tower, rest = s.torch_name.split(".", 1)
                    twin = _dc.replace(
                        s, path=(s.path[0] + "_m",) + s.path[1:],
                        torch_name=f"{tower}_m.{rest}")
                    export_specs.append(twin)
                    export_masks[twin.key] = twin_masks[s.key]
            torch_compat.export_mask_pt(
                os.path.join(args.output_dir, "mask.pt"), export_masks,
                export_specs)
        ckpt.save_checkpoint(os.path.join(args.output_dir, "ckpt_final"), state)

    if args.do_eval or args.do_predict:
        results = []
        rank_fn = None
        answers = None
        if args.eval_method == "rank":
            rank_fn, answers, best_index = build_rank_fn(
                args, config, tokenizer, model, masker, cfg)

        from collections import deque

        from ..parallel.mesh import host_all_gather, host_all_gather_local

        # Software pipeline (depth = --eval_pipeline_depth): dispatch the
        # NEXT batch's jitted generate/rank call before fetching this
        # batch's results. JAX's async dispatch keeps the device queue
        # non-empty while the host fetches ids through the tunnel,
        # detokenizes, and the prefetcher decodes the next images — the
        # encode of batch i+1 runs while the host is still consuming batch
        # i. The reference predictor's per-step Python beam loop
        # (mPLUG/models/predictor.py) keeps the host inside the decode
        # loop and cannot pipeline at all. Depth 0 = the serial
        # reference-shaped loop (the A/B surface, bench_serve/CLI session).
        pending = deque()
        depth = max(args.eval_pipeline_depth, 0)
        t_eval0 = time.perf_counter()
        warm = {"n": 0, "t": None}  # steady-state clock past batch 0's compile
        # per-phase wall accounting (printed at the end): where does eval
        # time actually go on this host/tunnel — batch production (loader
        # next()), shard/device_put, dispatch call, result fetch+decode
        phases = {"load": 0.0, "shard": 0.0, "dispatch": 0.0, "flush": 0.0}

        def _clock(key, t0):
            now = time.perf_counter()
            phases[key] += now - t0
            return now

        def flush_one():
            kind, out, qids, ok_vec = pending.popleft()
            if kind == "rank":
                out = jax.tree_util.tree_map(host_all_gather, out)
                best = best_index(out)  # numpy already (host_all_gather)
                for idx, qid, ok in zip(best, qids, ok_vec):
                    if not ok:  # ragged-final-batch padding
                        continue
                    results.append({"question_id": int(qid),
                                    "answer": answers[int(idx)]})
                if warm["t"] is None:
                    warm["t"] = time.perf_counter()
                else:
                    warm["n"] += len(qids)
                return
            ids = host_all_gather(out)  # one bulk host fetch (numpy)
            for row, qid, ok in zip(ids, qids, ok_vec):
                if not ok:  # ragged-final-batch padding
                    continue
                if tokenizer is not None:
                    toks = [int(t) for t in row[1:]]
                    if config.eos_token_id in toks:
                        toks = toks[: toks.index(config.eos_token_id)]
                    answer = tokenizer.decode(toks).strip()
                else:
                    answer = " ".join(str(int(t)) for t in row[1:] if t != 0)
                results.append({"question_id": int(qid), "answer": answer})
            if warm["t"] is None:
                warm["t"] = time.perf_counter()  # first fetch done = warm
            else:
                warm["n"] += len(qids)

        it = iter(eval_batches())
        while True:
            t0 = time.perf_counter()
            batch = next(it, None)
            t0 = _clock("load", t0)
            if batch is None:
                break
            dev = shard_fn({k: v for k, v in batch.items()
                            if k not in ("qid", "valid")})
            t0 = _clock("shard", t0)
            # multi-process: device outputs are sharded globals and qid/valid
            # are loader-local — gather both so every process sees the full
            # set (distributed_concat analogue); single-process: pass-through.
            # Every process runs the same depth, so the collective gathers
            # inside flush_one stay order-aligned.
            qids = host_all_gather_local(np.asarray(batch["qid"]))
            ok_vec = host_all_gather_local(np.asarray(
                batch.get("valid", np.ones(len(batch["qid"]), bool))))
            if rank_fn is not None:
                pending.append(("rank", rank_fn(state, dev), qids, ok_vec))
            else:
                ids, scores = gen_fn(state, dev)
                pending.append(("gen", ids, qids, ok_vec))
            t0 = _clock("dispatch", t0)
            while len(pending) > depth:
                flush_one()
            _clock("flush", t0)
        t0 = time.perf_counter()
        while pending:
            flush_one()
        _clock("flush", t0)
        if jax.process_index() == 0:
            with open(os.path.join(args.output_dir,
                                   "vqa_result.json"), "w") as f:
                json.dump(results, f)
        eval_s = time.perf_counter() - t_eval0
        steady = (round(warm["n"] / (time.perf_counter() - warm["t"]), 1)
                  if warm["t"] is not None and warm["n"] > 0 else None)
        common.log_step(int(state.step), num_predictions=len(results),
                        eval_seconds=round(eval_s, 1),
                        eval_ex_s_steady=steady,
                        eval_pipeline_depth=depth,
                        **{f"eval_{k}_s": round(v, 2)
                           for k, v in phases.items()})


if __name__ == "__main__":
    main()
