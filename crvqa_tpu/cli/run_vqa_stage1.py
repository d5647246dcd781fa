"""Stage-1 driver: full fine-tuning of LXMERT on VQA-CP v2.

TPU-native re-design of `run_vqa_stage1.py` + `mask_trainer_VQA.py`:
FT_type dispatches the debias loss; best-eval checkpoints are saved with the
reference's `<label4save>_FT{only,lmh_only,lpf_only,rubi_only}.bin` naming
convention (as torch state_dicts + native msgpack).
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from ..core import checkpoint as ckpt
from ..core import torch_compat
from ..models import LxmertConfig, LxmertForVQA
from ..parallel import MeshConfig, make_mesh, replicated_sharding
from ..train import stage1
from ..train.evaluation import dump_predictions, predict, vqa_accuracy
from . import common

_SUFFIX = {"normal": "_FTonly.bin", "lmh": "_FTlmh_only.bin",
           "lpf": "_FTlpf_only.bin", "rubi": "_FTrubi_only.bin"}


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("run_vqa_stage1")
    common.add_common_args(p)
    p.add_argument("--model_type", type=str, default="lxmert")
    p.add_argument("--FT_type", type=str, default="normal",
                   choices=["normal", "lmh", "lpf", "rubi"])
    p.add_argument("--training_type", type=str, default="FTonly")
    p.add_argument("--init_ckpt", type=str, default=None,
                   help="pretrained LXMERT weights (torch state_dict or native)")
    common.add_dense_train_flags(p)
    return p


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

    params = load_stage1_params(args.init_ckpt, model, config,
                                jax.random.PRNGKey(args.seed))

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
    state, tx = stage1.init_state(params, cfg, jax.random.PRNGKey(args.seed))

    if args.resume_from:
        # before device placement, matching the TP/ZeRO CLIs (from_bytes
        # yields host numpy and would drop any placement applied earlier)
        state = ckpt.load_checkpoint(args.resume_from, state)

    mesh = make_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    state = jax.device_put(state, replicated_sharding(mesh))
    shard_fn = common.make_shard_fn(mesh)
    step_fn = stage1.make_train_step(model, cfg, tx)
    eval_fn = stage1.make_eval_step(model)


    def evaluate(state):
        out = predict(eval_fn, state, eval_batches(), shard_fn=shard_fn)
        return vqa_accuracy(out["logits"], out["labels"]), out

    def save_best(state):
        suffix = _SUFFIX[args.FT_type]
        native = os.path.join(args.output_dir, args.label4save + suffix + ".msgpack")
        ckpt.save_checkpoint(native, jax.device_get(state.params))
        # torch state_dict for downstream stage-2/3 interop
        torch_compat.save_torch_state_dict(
            os.path.join(args.output_dir, args.label4save + suffix),
            jax.device_get(state.params))

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
                            save_best(state)
                if guard.save_and_stop(args, state, step):
                    profiler.close()
                    return
        profiler.close()
        if best < 0:
            # no best-eval save fired (no --evaluate_during_training, or
            # total steps below save_steps): persist the final params —
            # but never overwrite a best-eval checkpoint with the last one
            save_best(state)
        if best >= 0:
            # `best_eval_results_vqa_noMASK.txt` after training
            # (run_vqa_stage1.py:615-623)
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
