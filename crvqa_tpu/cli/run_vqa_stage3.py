"""Stage-3 driver: permanently prune the learned subnetwork + fine-tune.

TPU-native re-design of `run_vqa_stage3.py`: loads the stage-1 params +
stage-2 `mask.pt` + `classifier4masker.bin`, applies the mask as a constant
multiplier pytree (the JAX analogue of `prune.CustomFromMask` — masked
entries get exactly zero gradient), audits the achieved zero rate
(`see_weight_rate`, :75-178), then runs the stage-1 training loop. The
`FT_randMask` baseline replaces the trained mask with per-matrix
random-magnitude pruning (:209-226).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core import torch_compat
from ..masking import magnitude_masks, reference_rand_masks
from ..models import LxmertConfig, LxmertForVQA
from ..parallel import MeshConfig, make_mesh, replicated_sharding
from ..train import stage1
from ..train.evaluation import dump_predictions, predict, vqa_accuracy
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("run_vqa_stage3")
    common.add_common_args(p)
    p.add_argument("--model_type", type=str, default="lxmert")
    p.add_argument("--FT_type", type=str, default="normal",
                   choices=["normal", "lmh", "lpf", "rubi"])
    p.add_argument("--training_type", type=str, default="FT_trainedMask",
                   choices=["FT_trainedMask", "FT_randMask"])
    p.add_argument("--stage1_ckpt", type=str, default=None)
    p.add_argument("--mask_pt", type=str, default=None,
                   help="stage-2 mask.pt (required for FT_trainedMask)")
    p.add_argument("--classifier_bin", type=str, default=None,
                   help="stage-2 classifier4masker.bin")
    p.add_argument("--zero_rate", type=float, default=0.7)
    p.add_argument("--rand_scope", type=str, default="reference",
                   choices=["reference", "all"],
                   help="FT_randMask scope: 'reference' = the reference's "
                        "mag_pruning module list (language layers + pooler + "
                        "word embeddings ONLY, run_vqa_stage3.py:209-226); "
                        "'all' = every masked matrix at the modal rates")
    # Structured alternative (reference `--structured --prune_head/--prune_ffn`
    # with head_mask_dir/ffn_mask_dir .npy files, run_vqa_stage3.py:307-324,
    # 766-772): physically compact the language branch instead of applying an
    # unstructured mask.pt.
    p.add_argument("--head_mask_npy", type=str, default=None,
                   help="[L, H] 0/1 head mask .npy -> physical head pruning")
    p.add_argument("--ffn_mask_npy", type=str, default=None,
                   help="[L, intermediate] 0/1 FFN mask .npy -> neuron pruning")
    common.add_dense_train_flags(p)
    return p


def see_weight_rate(masker, params, masks) -> float:
    """Achieved zero-rate audit (run_vqa_stage3.py:75-178)."""
    pruned = masker.prune_params(params, masks)
    zeros = total = 0
    from flax import traverse_util

    flat = traverse_util.flatten_dict(pruned)
    for spec in masker.specs:
        w = np.asarray(flat[spec.path])
        zeros += int((w == 0).sum())
        total += w.size
    return zeros / total


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.init_distributed(args)
    common.setup_logging(args.output_dir)
    common.apply_prng_impl(args)
    common.dump_args(args, args.output_dir)
    common.init_metrics(args)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.tiny:
        config = LxmertConfig.tiny(dtype=dtype, **common.config_overrides(args))
    else:
        config = LxmertConfig(ans_num=args.ans_num, dtype=dtype,
                              **common.config_overrides(args))
    model = LxmertForVQA(config)

    from .prune_debias_vqa import load_stage1_params

    params = load_stage1_params(args.stage1_ckpt, model, config,
                                jax.random.PRNGKey(args.seed))

    structured = bool(args.head_mask_npy or args.ffn_mask_npy)
    masks = None
    masker = None
    if structured:
        # Physical compaction path — the TPU-native `prune_heads`/`prune_ffns`
        # (masking/compaction.py). Replaces unstructured mask.pt pruning.
        import dataclasses as _dc

        from ..masking import compact_lang_ffns, compact_lang_heads

        overrides = {}
        if args.head_mask_npy:
            head_mask = np.load(args.head_mask_npy)
            common.logger.info("head zero rate: %.3f", float((head_mask == 0).mean()))
            params, n_heads = compact_lang_heads(params, head_mask, config.head_size)
            overrides["lang_num_heads"] = n_heads
        if args.ffn_mask_npy:
            ffn_mask = np.load(args.ffn_mask_npy)
            common.logger.info("ffn zero rate: %.3f", float((ffn_mask == 0).mean()))
            params, n_inter = compact_lang_ffns(params, ffn_mask)
            overrides["lang_intermediate_size"] = n_inter
        config = _dc.replace(config, **overrides)
        model = LxmertForVQA(config)
    else:
        masker = common.lxmert_uniform_masker(config, args.zero_rate)

        if args.training_type == "FT_randMask":
            if args.rand_scope == "reference":
                # mag_pruning's exact module list: language layers + pooler +
                # word embeddings; visual/cross branches stay dense
                masks = jax.device_get(jax.jit(
                    lambda p: reference_rand_masks(p, list(masker.specs),
                                                   args.zero_rate))(params))
            else:
                masks = jax.device_get(jax.jit(
                    lambda p: magnitude_masks(p, list(masker.specs),
                                              masker.zerorate_dict))(params))
        else:
            assert args.mask_pt, "--mask_pt required for FT_trainedMask"
            masks = torch_compat.import_mask_pt(args.mask_pt, masker.specs)

        rate = see_weight_rate(masker, params, masks)
        common.logger.info("achieved zero rate after pruning: %.4f", rate)

        params = masker.prune_params(
            params, {k: jnp.asarray(v) for k, v in masks.items()})
        masks = {k: jnp.asarray(v) for k, v in masks.items()}

    # branch-independent: the stage-2 classifier rides along either way
    if args.classifier_bin:
        params = common.overlay_classifier(params, args.classifier_bin)

    train_batches, eval_batches, label2ans, n_train = common.build_data(args, config)
    steps_per_epoch = max(n_train // args.train_batch_size, 1)
    total_steps = common.scheduler_horizon(
        n_train, args.train_batch_size, args.num_train_epochs)

    cfg = stage1.Stage1Config(
        ft_type=args.FT_type, learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps, total_steps=total_steps,
        max_grad_norm=args.max_grad_norm, adam_epsilon=args.adam_epsilon,
        gamma=args.gamma, hidden_size=config.hidden_size,
        grad_accum_steps=args.gradient_accumulation_steps,
        moment_dtype=args.moment_dtype)
    state, tx = stage1.init_state(
        params, cfg, jax.random.PRNGKey(args.seed), masks=masks)

    if args.resume_from:
        # before device placement, matching the TP/ZeRO CLIs (from_bytes
        # yields host numpy and would drop any placement applied earlier)
        state = ckpt.load_checkpoint(args.resume_from, state)

    mesh = make_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    state = jax.device_put(state, replicated_sharding(mesh))
    shard_fn = common.make_shard_fn(mesh)
    step_fn = stage1.make_train_step(model, cfg, tx, masker=masker)
    eval_fn = stage1.make_eval_step(model, masker=masker)


    def evaluate(state):
        out = predict(eval_fn, state, eval_batches(), shard_fn=shard_fn)
        return vqa_accuracy(out["logits"], out["labels"]), out

    best = -1.0
    if args.do_train:
        # host-side counter — int(state.step) per iteration syncs on the
        # in-flight step (cli/common.crossed docstring)
        step = int(state.step)
        guard = common.PreemptionGuard()
        profiler = common.ProfileWindow(args)
        for epoch in range(int(args.num_train_epochs)):
            for batch in train_batches(epoch):
                state, metrics = step_fn(state, shard_fn(batch))
                prev, step = step, step + 1
                profiler.tick(step)
                if common.crossed(step, prev, args.logging_steps):
                    common.log_step(step, loss=float(metrics.loss),
                                    score=100 * float(metrics.score) /
                                    float(metrics.batch_size), epoch=epoch)
                if common.crossed(step, prev, args.save_steps):
                    ckpt.save_checkpoint(
                        os.path.join(args.output_dir, f"ckpt_{step}"), state,
                        metadata={"step": step})
                    ckpt.rotate_checkpoints(args.output_dir, keep=2)
                    if args.evaluate_during_training:
                        acc, out = evaluate(state)
                        common.log_step(step, eval_acc=acc)
                        if acc > best:
                            best = acc
                            dump_predictions(
                                os.path.join(args.output_dir, "test.json"),
                                out["logits"], out["question_id"], label2ans)
                            # no underscore before FT_randMask — byte-
                            # faithful to the reference's own naming
                            # (mask_trainer_Robust_VQA.py:757-759)
                            suffix = ("_FT_trainedMask.bin"
                                      if args.training_type == "FT_trainedMask"
                                      else "FT_randMask.bin")
                            ckpt.save_checkpoint(
                                os.path.join(args.output_dir,
                                             args.label4save + suffix + ".msgpack"),
                                jax.device_get(state.params))
                if guard.save_and_stop(args, state, step):
                    profiler.close()
                    return
        profiler.close()
        if best < 0:
            # the fine-tuned subnetwork must survive even when no best-eval
            # save fired (no --evaluate_during_training, or total steps
            # below save_steps); a best-eval checkpoint is never overwritten
            suffix = ("_FT_trainedMask.bin"
                      if args.training_type == "FT_trainedMask"
                      else "FT_randMask.bin")
            ckpt.save_checkpoint(
                os.path.join(args.output_dir,
                             args.label4save + suffix + ".msgpack"),
                jax.device_get(state.params))
        if best >= 0:
            common.write_eval_results(
                args.output_dir, "best_eval_results_vqa_noMASK.txt",
                eval_acc=best)

    if args.do_eval or args.do_predict:
        acc, out = evaluate(state)
        common.log_step(int(state.step), final_eval_acc=acc)
        common.write_eval_results(args.output_dir, "eval_results_vqa.txt",
                                  eval_acc=acc)
        # the reference never rewrites the best-save test.json post-train
        if not os.path.exists(os.path.join(args.output_dir, "test.json")):
            dump_predictions(os.path.join(args.output_dir, "test.json"),
                             out["logits"], out["question_id"], label2ans)


if __name__ == "__main__":
    main()
