"""Stage-2 driver: mask-train LXMERT on VQA-CP v2 with per-modality sparsity.

TPU-native re-design of `prune_debias_VQA.py` + the stage-2 trainer loop
(`mask_trainer_Robust_VQA.py:504-783`): loads the stage-1 checkpoint selected
by `--FTmodel_type`, builds the per-modality Masker, trains mask scores +
classifier with the `--Masker_type` debias loss, resets thresholds every
`--logging_steps`, evaluates every `--save_steps`, and at each new best
exports test.json + mask.pt + classifier4masker.bin.
"""
from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..core import torch_compat
from ..masking import Masker, ModalSparsity, lxmert_mask_specs
from ..models import LxmertConfig, LxmertForVQA
from ..parallel import MeshConfig, make_mesh, replicated_sharding
from ..train import stage2
from ..train.evaluation import dump_predictions, predict, vqa_accuracy
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("prune_debias_vqa")
    common.add_common_args(p)
    p.add_argument("--model_type", type=str, default="lxmert")
    p.add_argument("--masker_level", type=str, default="modal",
                   choices=["modal"])  # only 'modal' shipped (prune_debias_VQA.py:853-855)
    p.add_argument("--Lang_comp", type=float, default=0.3)
    p.add_argument("--Vis_comp", type=float, default=0.3)
    p.add_argument("--Fus_comp", type=float, default=0.3)
    p.add_argument("--zero_rate", type=float, default=0.7)
    p.add_argument("--FTmodel_type", type=str, default="noFT",
                   choices=["noFT", "normal", "lmh", "lpf", "rubi"])
    p.add_argument("--Masker_type", type=str, default="lmh",
                   choices=["normal", "lmh", "lpf", "rubi", "poe", "reweight"])
    p.add_argument("--stage1_ckpt", type=str, default=None,
                   help="stage-1 checkpoint (native msgpack or torch .bin state_dict)")
    p.add_argument("--controlled_init", type=str, default="magnitude",
                   choices=["magnitude", "uniform", "double_uniform",
                            "magnitude_soft", "magnitude_global", "none"])
    p.add_argument("--threshold", type=float, default=1e-2)
    p.add_argument("--init_scale", type=float, default=2e-2)
    p.add_argument("--global_prune", type=common.str2bool, default=False)
    p.add_argument("--name_of_masker", type=str, default="MaskedLinear1")
    common.add_moment_dtype_flag(p)
    p.add_argument("--mask_biases", type=common.str2bool, default=False,
                   help="also mask bias vectors with the module's weight "
                        "threshold (maskers_Robust.py:360-367; default "
                        "False in every shipped config)")
    p.add_argument("--training_type", type=str, default="Masker")
    p.add_argument("--masking_scheduler_conf", type=str,
                   default="lambdas_lr=0,sparsity_warmup=automated_gradual_sparsity,"
                           "sparsity_warmup_interval_epoch=0.1,init_epoch=0,final_epoch=1",
                   help="k=v,... mini-DSL (utils/param_parser.dict_parser). "
                        "Parsed/validated for flag parity but — like the "
                        "reference stage-2 trainer — NOT consulted: its "
                        "reset_threshold ignores the scheduler's sparsity "
                        "(mask_trainer_Robust_VQA.py:467-482, the "
                        "init_sparsity arg is dead) and nothing calls "
                        "scheduler.step. The live scheduler is the mPLUG "
                        "path (vqa_mplug --masker_update_step).")
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--accumulate_grads", type=common.str2bool, default=False,
                   help="integrate |grad| per step into the optimizer state "
                        "(the reference AdamW's state['sum'], "
                        "optimization.py:100-101); dumped as grad_abs_sum.npz")
    p.add_argument("--scan_layers", type=common.str2bool, default=False,
                   help="scan-over-layers model variant (stacked layer "
                        "params; ~5x smaller HLO, batched per-layer "
                        "threshold resets; same numerics)")
    p.add_argument("--layers_to_mask", type=str,
                   default="0,1,2,3,4,5,6,7,8,9,10,11",
                   help="comma-separated layer indices (prune_debias_VQA.py "
                        "--layers_to_mask; intersected with each group's depth)")
    p.add_argument("--steps_per_dispatch", type=int, default=1,
                   help=">1 scans N train steps per device dispatch "
                        "(stage2.make_multi_step) — removes per-step host "
                        "overhead; logging granularity becomes N steps")
    p.add_argument("--zero_opt", type=common.str2bool, default=False,
                   help="ZeRO-shard the Adam moments of the mask scores over "
                        "the data mesh axis (parallel/zero.py; the DeepSpeed "
                        "ZeRO-2 analogue the reference applies to mPLUG)")
    # Structured mask training (masking/structured.py — the redesign of the
    # reference's per-head/per-matrix templates, maskers_Robust.py:139-178.
    # The reference's own structured stage-2 is unreachable as shipped:
    # assert 0==1 at prune_debias_VQA.py:840-842, and its LxmertModel
    # forward takes no head_mask. Here 'heads' trains one gate per
    # attention head of every matched module and exports head_mask.npy in
    # the stage-3 `--head_mask_npy` format.)
    p.add_argument("--structured_masking", type=str, default="none",
                   choices=["none", "heads", "layers"])
    p.add_argument("--structured_masking_types", type=str, default="self",
                   help="comma-separated module-name substrings to mask "
                        "structurally (the reference's "
                        "structured_masking_types); others stay unstructured")
    return p


def load_stage1_params(path, model, config, rng):
    """Init fresh params, then overlay a stage-1 checkpoint if given
    (the `FTmodel_type` loading switch, prune_debias_VQA.py:767-818)."""
    from ..data.synthetic import synthetic_batch

    b = synthetic_batch(batch_size=2, vocab_size=config.vocab_size,
                        ans_num=config.ans_num, feat_dim=config.visual_feat_dim,
                        pos_dim=config.visual_pos_dim)
    params = model.init(
        rng, input_ids=jnp.asarray(b["input_ids"]),
        visual_feats=jnp.asarray(b["visual_feats"]),
        visual_pos=jnp.asarray(b["visual_pos"]))["params"]
    return common.load_params_any(path, params)


def main(argv=None) -> None:
    run(build_parser().parse_args(argv))


def run(args) -> None:
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
    rng = jax.random.PRNGKey(args.seed)
    # checkpoints always interop through the unrolled layout
    params = load_stage1_params(args.stage1_ckpt, model, config, rng)

    if args.scan_layers:
        from ..masking.spec import lxmert_scan_mask_specs
        from ..models.lxmert_scan import ScanLxmertForVQA, stack_params

        model = ScanLxmertForVQA(config)
        params = stack_params(params, config)
        specs = lxmert_scan_mask_specs(config.l_layers, config.r_layers,
                                       config.x_layers)
    else:
        layers = [int(x) for x in args.layers_to_mask.split(",")
                  if x.strip() != ""]
        specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                                  config.x_layers, layers_to_mask=layers)
    if args.masking_scheduler_conf:
        # fail fast on DSL typos; see the flag help — the reference stage-2
        # trainer never consults the parsed values
        from ..utils.param_parser import dict_parser

        dict_parser(args.masking_scheduler_conf)
    sparsity = ModalSparsity.from_compression(
        args.Lang_comp, args.Vis_comp, args.Fus_comp, args.zero_rate)
    masker_kw = dict(
        mask_biases=args.mask_biases,
        threshold=args.threshold, init_scale=args.init_scale,
        controlled_init=None if args.controlled_init == "none" else args.controlled_init,
        binarizer_name=args.name_of_masker, global_prune=args.global_prune)
    if args.structured_masking != "none":
        from ..masking.structured import StructuredMasker

        masker = StructuredMasker.create(
            specs, sparsity,
            structured_masking=args.structured_masking,
            structured_types=tuple(
                t for t in args.structured_masking_types.split(",") if t),
            num_heads=config.num_attention_heads, **masker_kw)
    else:
        masker = Masker.create(specs, sparsity, **masker_kw)

    train_batches, eval_batches, label2ans, n_train = common.build_data(args, config)
    steps_per_epoch = max(n_train // args.train_batch_size, 1)
    total_steps = common.scheduler_horizon(
        n_train, args.train_batch_size, args.num_train_epochs)

    cfg = stage2.Stage2Config(
        masker_type=args.Masker_type, learning_rate=args.learning_rate,
        warmup_steps=args.warmup_steps, total_steps=total_steps,
        weight_decay=args.weight_decay, max_grad_norm=args.max_grad_norm,
        adam_epsilon=args.adam_epsilon, gamma=args.gamma,
        hidden_size=config.hidden_size,
        grad_accum_steps=args.gradient_accumulation_steps,
        accumulate_abs_grad=args.accumulate_grads,
        backbone_dtype=args.backbone_dtype,
        moment_dtype=args.moment_dtype)
    state, tx = stage2.init_state(model, masker, params, cfg,
                                  jax.random.PRNGKey(args.seed))
    if args.resume_from:
        # BEFORE device placement: from_bytes yields host numpy leaves, so
        # loading after shard_params_tp/shard_opt_state would silently
        # discard those placements (fully replicated state -> TP/ZeRO
        # memory scaling lost)
        state = ckpt.load_checkpoint(args.resume_from, state)

    mesh = make_mesh(MeshConfig(data=args.mesh_data, model=args.mesh_model))
    state = jax.device_put(state, replicated_sharding(mesh))
    if args.mesh_model > 1:
        # tensor-parallel placement of the frozen backbone + mask scores
        from ..parallel.tp import shard_params_tp, shard_scores_tp

        state = state.replace(
            frozen_params=shard_params_tp(
                jax.device_get(state.frozen_params), mesh),
            scores=shard_scores_tp(
                jax.device_get(state.scores), masker.specs, mesh))
    zero_mesh = None
    if args.zero_opt:
        from ..parallel.zero import shard_opt_state

        zero_mesh = mesh
        state = state.replace(opt_state=shard_opt_state(
            jax.device_get(state.opt_state), mesh))
    shard_fn = common.make_shard_fn(mesh)
    spd = max(args.steps_per_dispatch, 1)
    if spd > 1:
        multi_fn = stage2.make_multi_step(model, masker, tx, cfg, spd,
                                          mesh=zero_mesh)
    step_fn = stage2.make_train_step(model, masker, tx, cfg, mesh=zero_mesh)
    reset_fn = stage2.make_threshold_reset(masker)
    eval_fn = stage2.make_eval_step(model, masker)

    def evaluate(state):
        out = predict(eval_fn, state, eval_batches(), shard_fn=shard_fn)
        acc = vqa_accuracy(out["logits"], out["labels"])
        return acc, out

    def export_best(state):
        state = reset_fn(state)
        masks = jax.device_get(masks_fn(state.scores, state.thresholds))
        export_masks = dict(masks)
        if args.structured_masking != "none":
            # mask.pt carries weight-SHAPED bools; expand the structured
            # gates onto their kernels (scalar 'layers' gate -> whole
            # matrix; [H] head gate -> head column blocks, the flax
            # transpose of reshape_mask_for_sp)
            from flax import traverse_util

            from ..masking.structured import expand_head_mask_to_kernel

            flat_shapes = {k: v.shape for k, v in
                           traverse_util.flatten_dict(
                               state.frozen_params).items()}
            for spec in masker.specs:
                m = np.asarray(masks[spec.key])
                shape = flat_shapes[spec.path]
                if m.shape == shape:
                    continue
                if m.ndim == 0:
                    export_masks[spec.key] = np.broadcast_to(
                        m, shape).copy()
                else:
                    export_masks[spec.key] = np.asarray(
                        expand_head_mask_to_kernel(jnp.asarray(m), shape))
        torch_compat.export_mask_pt(
            os.path.join(args.output_dir, "mask.pt"), export_masks,
            masker.specs)
        if args.structured_masking == "heads":
            # head_mask.npy [l_layers, H] in the stage-3 --head_mask_npy /
            # reference prune_with_mask format (save_struc_model_mask,
            # mask_trainer_Robust_VQA.py:933-941). Each of q/k/v carries
            # its own per-head gates; a head survives physically iff ANY of
            # its gates survives (pruning it while some projection still
            # keeps it would change the forward).
            hm = np.zeros((config.l_layers, config.num_attention_heads),
                          np.float32)
            contributed = 0
            for spec in masker.specs:
                marker = ".encoder.layer."
                if marker not in spec.torch_name or spec.key not in masks:
                    continue
                m = np.asarray(masks[spec.key])
                if m.shape != (config.num_attention_heads,):
                    continue  # unstructured fallback spec
                layer = int(spec.torch_name.split(marker)[1].split(".")[0])
                hm[layer] = np.maximum(hm[layer], m.astype(np.float32))
                contributed += 1
            if contributed:
                np.save(os.path.join(args.output_dir, "head_mask.npy"), hm)
            else:
                # structured_types matched no language self-attention spec;
                # an all-zero npy would tell stage-3 to prune EVERY head
                common.logger.warning(
                    "structured 'heads' export skipped: no language-layer "
                    "head gates under structured_masking_types=%s",
                    args.structured_masking_types)
        torch_compat.export_classifier_bin(
            os.path.join(args.output_dir, "classifier4masker.bin"),
            jax.device_get(state.train_params["classifier"]))
        report = jax.device_get(report_fn(state.scores, state.thresholds))
        common.logger.info("zero rates: %s",
                           {k: round(float(v), 4) for k, v in report.items()})
        if args.accumulate_grads:
            from flax import traverse_util

            from ..train.common import abs_grad_sum

            sums = abs_grad_sum(state.opt_state)
            if sums is not None:
                from ..parallel import host_all_gather

                # collective gather (ZeRO-sharded leaves span processes),
                # then process-0 write
                host = jax.tree_util.tree_map(host_all_gather, sums)
                if jax.process_index() == 0:
                    flat = {"/".join(k): np.asarray(v) for k, v in
                            traverse_util.flatten_dict(host).items()}
                    np.savez(os.path.join(args.output_dir,
                                          "grad_abs_sum.npz"), **flat)
        return state

    drift_fn = jax.jit(masker.mask_drift)
    masks_fn = jax.jit(masker.binary_masks)
    report_fn = jax.jit(masker.sparsity_report)
    orig_masks = jax.device_get(masks_fn(state.scores, state.thresholds))
    tmp_masks = orig_masks

    best = -1.0
    if args.do_train:
        # pre-train sanity eval (mask_trainer_Robust_VQA.py:606-609)
        if args.evaluate_during_training:
            acc0, _ = evaluate(state)
            common.logger.info(
                "pre-train eval acc %.2f (expected LOW right after mask "
                "patching)", acc0)
        # host-side step counter: reading int(state.step) every iteration
        # would force a sync on the just-dispatched step and serialize
        # device compute with host batch prep (it advances deterministically
        # by the dispatch width; the device value is only needed at resume)
        step = int(state.step)
        pending = []
        t_last, s_last = time.perf_counter(), step
        guard = common.PreemptionGuard()
        profiler = common.ProfileWindow(args)
        for epoch in range(int(args.num_train_epochs)):
            for batch in train_batches(epoch):
                if spd > 1:
                    # partial windows fall through to the single-step path at
                    # epoch end (see the flush below)
                    pending.append(batch)
                    if len(pending) < spd:
                        continue
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    wsh = NamedSharding(mesh, P(None, "data"))

                    # multi-process: each process stacks its LOCAL window
                    # slices; the global [W, B, ...] array is assembled like
                    # shard_batch does for single batches
                    def _put_window(arr):
                        if jax.process_count() > 1:
                            return jax.make_array_from_process_local_data(
                                wsh, arr)
                        return jax.device_put(arr, wsh)

                    stacked = {
                        k: _put_window(np.stack([p[k] for p in pending]))
                        for k in pending[0] if k != "valid"}
                    pending = []
                    state, losses, scores_sum = multi_fn(state, stacked)
                    metrics = stage2.TrainMetrics(
                        loss=losses[-1], score=scores_sum[-1],
                        batch_size=jnp.asarray(args.train_batch_size,
                                               jnp.float32))
                    prev, step = step, step + spd
                else:
                    state, metrics = step_fn(state, shard_fn(batch))
                    prev, step = step, step + 1
                profiler.tick(step)
                if common.crossed(step, prev, args.logging_steps):
                    state = reset_fn(state)
                    # mask distance vs init / change vs last log (log_mask_info)
                    distance = float(drift_fn(state.scores, state.thresholds,
                                              orig_masks))
                    change = float(drift_fn(state.scores, state.thresholds,
                                            tmp_masks))
                    tmp_masks = jax.device_get(
                        masks_fn(state.scores, state.thresholds))
                    score_pct = 100 * float(metrics.score) / float(metrics.batch_size)
                    # interval throughput, fence-to-fence (the float() above
                    # synced the device) — the product-surface number the
                    # bench harness must agree with (BENCHMARKS.md
                    # product-surface parity row)
                    now = time.perf_counter()
                    ex_s = ((step - s_last) * args.train_batch_size
                            / max(now - t_last, 1e-9))
                    t_last, s_last = now, step
                    common.log_step(step, loss=float(metrics.loss),
                                    score=score_pct, epoch=epoch,
                                    mask_distance=distance, mask_change=change,
                                    ex_s=round(ex_s, 1))
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
                    # pending partial-window batches are dropped; the
                    # resumed run re-iterates the epoch
                    profiler.close()
                    return
            # flush a partial scan window through the single-step path
            for leftover in pending:
                state, metrics = step_fn(state, shard_fn(leftover))
                step += 1
                profiler.tick(step)
            pending = []
        profiler.close()
        if best < 0:
            # no best-eval save fired (e.g. --evaluate_during_training off):
            # export the final state so the run still yields artifacts. When
            # a best save DID fire, the reference leaves its artifacts alone
            # (mask.pt/classifier/test.json are written ONLY inside the
            # best-save block, mask_trainer_Robust_VQA.py:717-744)
            state = export_best(state)

    if args.do_eval or args.do_predict:
        acc, out = evaluate(state)
        common.log_step(int(state.step), final_eval_acc=acc)
        # post-train eval writes eval_results_vqa.txt, NOT test.json
        # (prune_debias_VQA.py:973-986); test.json only if no best save
        # produced one
        common.write_eval_results(args.output_dir, "eval_results_vqa.txt",
                                  eval_acc=acc)
        if not os.path.exists(os.path.join(args.output_dir, "test.json")):
            dump_predictions(os.path.join(args.output_dir, "test.json"),
                             out["logits"], out["question_id"], label2ans)


if __name__ == "__main__":
    main()
