"""Stage-2 driver for VisualBERT: uniform-sparsity mask training.

Re-design of `prune_debias_VQA_visualBERT.py` +
`mask_trainer_visualBERT_VQA.py`: single-stream VisualBERT, uniform
zero-rate over K/Q/V/AO/I/O/P/E (no modality split,
prune_debias_VQA_visualBERT.py:127-190), model called with
(input_ids, visual_embeds) only, classifier head is `model.cls`.
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core import torch_compat
from ..masking import Masker, ModalSparsity, visualbert_mask_specs
from ..models.visualbert import VisualBertConfig, VisualBertForVQA
from ..parallel import MeshConfig, make_mesh, replicated_sharding
from ..train import stage2
from ..train.evaluation import dump_predictions, predict, vqa_accuracy
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("prune_debias_vqa_visualbert")
    common.add_common_args(p)
    p.add_argument("--model_type", type=str, default="visualbert")
    common.add_moment_dtype_flag(p)
    p.add_argument("--zero_rate", type=float, default=0.7)
    p.add_argument("--FTmodel_type", type=str, default="noFT")
    p.add_argument("--Masker_type", type=str, default="lmh",
                   choices=["normal", "lmh", "lpf", "rubi", "poe", "reweight"])
    p.add_argument("--stage1_ckpt", type=str, default=None)
    p.add_argument("--controlled_init", type=str, default="magnitude")
    p.add_argument("--threshold", type=float, default=1e-2)
    p.add_argument("--init_scale", type=float, default=2e-2)
    p.add_argument("--name_of_masker", type=str, default="MaskedLinear1")
    p.add_argument("--mask_biases", type=common.str2bool, default=False,
                   help="also mask bias vectors (maskers_visualBert "
                        "mask_biases; default False in every shipped config)")
    return p


def _to_visualbert_batch(batch: dict) -> dict:
    """LXMERT-style batches carry (visual_feats, visual_pos); VisualBERT
    consumes the 2048-d features directly as visual_embeds."""
    out = dict(batch)
    if "visual_embeds" not in out and "visual_feats" in out:
        out["visual_embeds"] = out.pop("visual_feats")
        out.pop("visual_pos", None)
    return out


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.init_distributed(args)
    common.setup_logging(args.output_dir)
    common.apply_prng_impl(args)
    common.dump_args(args, args.output_dir)
    common.init_metrics(args)

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.tiny:
        config = VisualBertConfig.tiny(dtype=dtype, **common.config_overrides(args))
    else:
        config = VisualBertConfig(ans_num=args.ans_num, dtype=dtype,
                                  **common.config_overrides(args))
    model = VisualBertForVQA(config)
    rng = jax.random.PRNGKey(args.seed)

    params = common.init_visualbert_params(model, config, rng)
    params = common.load_params_any(args.stage1_ckpt, params)

    specs = visualbert_mask_specs(config.num_hidden_layers)
    masker = Masker.create(
        specs, ModalSparsity.uniform(args.zero_rate),
        mask_biases=args.mask_biases,
        threshold=args.threshold, init_scale=args.init_scale,
        controlled_init=args.controlled_init,
        binarizer_name=args.name_of_masker)

    # data: reuse the VQA-CP pipeline, converting feats -> visual_embeds
    class _Cfg:
        vocab_size = config.vocab_size
        ans_num = config.ans_num
        visual_feat_dim = config.visual_embedding_dim
        visual_pos_dim = 4

    train_batches, eval_batches, label2ans, n_train = common.build_data(args, _Cfg)
    steps_per_epoch = max(n_train // args.train_batch_size, 1)
    total_steps = common.scheduler_horizon(
        n_train, args.train_batch_size, args.num_train_epochs)

    cfg = stage2.Stage2Config(
        masker_type=args.Masker_type, learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps, total_steps=total_steps,
        max_grad_norm=args.max_grad_norm, adam_epsilon=args.adam_epsilon,
        gamma=args.gamma, hidden_size=config.hidden_size,
        classifier_key="cls", backbone_dtype=args.backbone_dtype,
        moment_dtype=args.moment_dtype)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(args.seed))

    if args.resume_from:
        # before device placement, matching the TP/ZeRO CLIs (from_bytes
        # yields host numpy and would drop any placement applied earlier)
        state = ckpt.load_checkpoint(args.resume_from, state)

    mesh = make_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    state = jax.device_put(state, replicated_sharding(mesh))
    base_shard = common.make_shard_fn(mesh)
    shard_fn = lambda b: base_shard(_to_visualbert_batch(b))
    step_fn = stage2.make_train_step(model, masker, tx, cfg)
    reset_fn = stage2.make_threshold_reset(masker)
    eval_fn = stage2.make_eval_step(model, masker, cfg)


    def evaluate(state):
        out = predict(eval_fn, state, eval_batches(), shard_fn=shard_fn)
        return vqa_accuracy(out["logits"], out["labels"]), out

    masks_fn = jax.jit(masker.binary_masks)

    def export_best(state):
        state = reset_fn(state)
        masks = jax.device_get(masks_fn(state.scores, state.thresholds))
        torch_compat.export_mask_pt(
            os.path.join(args.output_dir, "mask.pt"), masks, masker.specs)
        torch_compat.export_classifier_bin(
            os.path.join(args.output_dir, "classifier4masker.bin"),
            jax.device_get(state.train_params["classifier"]))
        return state

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
                    state = reset_fn(state)
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
                            state = export_best(state)
                if guard.save_and_stop(args, state, step):
                    profiler.close()
                    return
        profiler.close()
        if best < 0:
            # reference parity: best-save owns the artifacts; final export
            # only when no best-eval save fired (see prune_debias_vqa.py)
            state = export_best(state)

    if args.do_eval or args.do_predict:
        acc, out = evaluate(state)
        common.log_step(int(state.step), final_eval_acc=acc)
        common.write_eval_results(args.output_dir, "eval_results_vqa.txt",
                                  eval_acc=acc)
        if os.path.exists(os.path.join(args.output_dir, "test.json")):
            return
        dump_predictions(os.path.join(args.output_dir, "test.json"),
                         out["logits"], out["question_id"], label2ans)


if __name__ == "__main__":
    main()
