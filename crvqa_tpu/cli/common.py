"""Shared CLI plumbing: args, data assembly, logging, the epoch loop skeleton.

Mirrors the flag surface of the reference entry scripts
(`run_vqa_stage1.py`, `prune_debias_VQA.py`, `run_vqa_stage3.py`) where
sensible; adds `--synthetic N` to smoke-run any stage without the VQA-CP
data drop.
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import time
from typing import Callable, Iterator, Optional

import jax
import numpy as np

logger = logging.getLogger("crvqa_tpu")


def str2bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "y")


def lxmert_uniform_masker(config, zero_rate: float):
    """The stage-2-artifact contract in one place: the uniform-rate LXMERT
    masker whose specs key `mask.pt` imports (`run_vqa_stage3.py` and
    `serve_vqa` must build the SAME masker or served weights diverge from
    stage-3's pruned weights)."""
    from ..masking import Masker, ModalSparsity, lxmert_mask_specs

    specs = lxmert_mask_specs(config.l_layers, config.r_layers,
                              config.x_layers)
    return Masker.create(
        specs, ModalSparsity.uniform(zero_rate, ("Lang", "Vis", "Fus", "P")))


def load_params_any(path: Optional[str], params, torch_loader=None):
    """Overlay a params checkpoint of either lineage onto init params:
    reference torch artifacts (`.bin`/`.pt`/`.pth` state_dicts or whole-model
    pickles, via `torch_compat.load_torch_params`) or this repo's msgpack
    checkpoint dirs. The single home of the format dispatch — every driver
    and both serving paths route through here. `torch_loader(path, template)`
    overrides the torch branch for model-specific name shims (the mPLUG
    driver's pretrained-checkpoint import)."""
    if path is None:
        return params
    if path.endswith((".bin", ".pt", ".pth")):
        if torch_loader is not None:
            return torch_loader(path, params)
        from ..core import torch_compat

        return torch_compat.load_torch_params(path, params)
    from ..core import checkpoint as ckpt

    return ckpt.load_checkpoint(path, params)


def init_visualbert_params(model, config, rng):
    """Shape-only init on a synthetic probe batch (single-stream model:
    `mask_trainer_visualBERT_VQA.py:820` passes input_ids + visual_embeds).
    Shared by the VisualBERT stage-2 driver and `serve_vqa`."""
    import jax.numpy as jnp

    from ..data.synthetic import synthetic_batch

    b = synthetic_batch(batch_size=2, vocab_size=config.vocab_size,
                        ans_num=config.ans_num,
                        feat_dim=config.visual_embedding_dim,
                        style="visualbert")
    return model.init(rng, input_ids=jnp.asarray(b["input_ids"]),
                      visual_embeds=jnp.asarray(b["visual_embeds"]))["params"]


def overlay_classifier(params, classifier_bin: str, key: str = "classifier"):
    """Swap in the stage-2 classifier (`classifier4masker.bin`,
    mask_trainer_Robust_VQA.py:734-740). VisualBERT's head lives under
    `cls` (the reference saves `model.cls`)."""
    from ..core import torch_compat

    params = dict(params)
    params[key] = torch_compat.import_classifier_bin(
        classifier_bin, params[key])
    return params


def add_moment_dtype_flag(p: argparse.ArgumentParser) -> None:
    """Adam m/v storage dtype — the optimizer-HBM lever on every LXMERT
    driver. Stage 2: bench.py's measured +2.8% headline ingredient
    (hf_adamw moment_dtype); stage 1/3: the profile-pinned ~26%
    optimizer-floor lever (Stage1Config.moment_dtype). Math stays fp32 per
    step; only the carried state rounds (guard tests both paths)."""
    p.add_argument("--moment_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])


def add_dense_train_flags(p: argparse.ArgumentParser) -> None:
    """Flags specific to the DENSE (stage-1/3) train step, shared by both
    drivers. The reference surface carries gradient_accumulation_steps on
    every TrainingArguments subclass (`hg_transformers/training_args.py`)."""
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    add_moment_dtype_flag(p)


def add_kernel_flags(p: argparse.ArgumentParser) -> None:
    """The Pallas attention-kernel switches — one definition shared by the
    training parsers (via add_common_args) and the serving parsers, so a
    new kernel flag can never miss a CLI again. Activated by
    apply_prng_impl."""
    p.add_argument("--fused_attention", type=str2bool, default=False,
                   help="fused short-seq attention kernel "
                        "(ops/fused_attention.py): measured +8.8%% stage-2 "
                        "throughput on v5e (3260 vs 2997 ex/s). Runs "
                        "interpreted off-TPU (tests)")
    p.add_argument("--midseq_attention", type=str2bool, default=False,
                   help="mid-sequence attention kernel "
                        "(ops/midseq_attention.py): VMEM-fused softmax for "
                        "the 577-patch image attention contexts the "
                        "short-seq kernel rejects (mPLUG ViT/fusion). Runs "
                        "interpreted off-TPU (tests)")


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--dataroot", type=str, default=None)
    p.add_argument("--img_root", type=str, default=None,
                   help="path to vqa_img_feature_trainval.pickle")
    p.add_argument("--vocab_file", type=str, default=None)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--label4save", type=str, default="run")
    p.add_argument("--learning_rate", type=float, default=5e-5)
    p.add_argument("--per_gpu_train_batch_size", "--train_batch_size",
                   dest="train_batch_size", type=int, default=64)
    p.add_argument("--per_gpu_eval_batch_size", "--eval_batch_size",
                   dest="eval_batch_size", type=int, default=64)
    p.add_argument("--num_train_epochs", type=float, default=20)
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--max_grad_norm", type=float, default=1.0)
    p.add_argument("--adam_epsilon", type=float, default=1e-8)
    p.add_argument("--logging_steps", type=int, default=100)
    p.add_argument("--save_steps", type=int, default=1712)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--do_train", action="store_true")
    p.add_argument("--do_eval", action="store_true")
    p.add_argument("--do_predict", action="store_true")
    p.add_argument("--evaluate_during_training", action="store_true")
    p.add_argument("--gamma", type=float, default=5.0)
    p.add_argument("--ans_num", type=int, default=2274)
    p.add_argument("--mesh_data", type=int, default=-1,
                   help="data-parallel mesh size (-1 = all devices)")
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--multihost", type=str2bool, default=False,
                   help="multi-process runtime: call "
                        "jax.distributed.initialize at startup (TPU pods "
                        "discover peers from the environment; off-TPU pass "
                        "the coordinator flags). Batch sizes stay GLOBAL — "
                        "each process feeds its row block of every batch "
                        "(B %% process_count == 0); see parallel/mesh.py")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (off-TPU multihost only)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--backbone_dtype", type=str, default="float32",
                   choices=["bfloat16", "float32"],
                   help="storage dtype of the frozen stage-2 backbone "
                        "(bfloat16 halves the masked-apply HBM reads)")
    p.add_argument("--prng_impl", type=str, default="threefry2x32",
                   choices=["threefry2x32", "rbg", "unsafe_rbg"],
                   help="dropout PRNG. unsafe_rbg uses the TPU "
                        "RngBitGenerator: +13%% stage-2 throughput measured "
                        "(fine for dropout; threefry = reproducible default)")
    add_kernel_flags(p)
    p.add_argument("--transfer_dtype", type=str, default="auto",
                   choices=["auto", "float32", "bfloat16"],
                   help="host->device dtype of the visual-feature leaves "
                        "(75.5 of ~80 MB in a bs-256 stage-2 batch). "
                        "'auto' = bfloat16 iff the model computes in "
                        "bfloat16 (bit-identical: the first matmul casts "
                        "its inputs to the model dtype anyway)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="run on N synthetic examples instead of real data")
    p.add_argument("--synthetic_pool", type=int, default=0,
                   help="pre-generate this many synthetic TRAIN batches and "
                        "cycle them instead of regenerating per step. For "
                        "chip parity sessions: a bs-256 batch is ~75 MB of "
                        "host randn (~0.3 s on a 1-core host), which would "
                        "make a product-surface throughput run host-RNG "
                        "bound — unlike the real mmap feature store, which "
                        "assembles 3x faster than the step consumes "
                        "(benchmarks/bench_feature_store.py). 0 = regenerate")
    p.add_argument("--prefetch_batches", type=int, default=2,
                   help="host batches prepared ahead on a producer thread "
                        "(data/prefetch.py) — the DataLoader(num_workers) "
                        "overlap; 0 disables")
    p.add_argument("--resume_from", type=str, default=None)
    p.add_argument("--train_shuffle", type=str2bool, default=True,
                   help="shuffle training batches each epoch; turn off only "
                        "for step-paired parity rehearsals against the "
                        "reference trainer (torch and numpy shuffles cannot "
                        "be aligned)")
    p.add_argument("--hidden_dropout_prob", type=float, default=None,
                   help="override the config's hidden dropout (parity "
                        "rehearsals zero it: torch/JAX dropout RNG cannot "
                        "be aligned)")
    p.add_argument("--attention_probs_dropout_prob", type=float, default=None)
    p.add_argument("--classifier_dropout", type=float, default=None)
    p.add_argument("--wandb_project", type=str, default=None,
                   help="mirror step metrics to wandb (optional, like the "
                        "reference's is_wandb_available gate, "
                        "mask_trainer_Robust_VQA.py:68-82; absent wandb "
                        "degrades to JSONL/TB with a notice)")
    p.add_argument("--tensorboard_dir", type=str, default=None,
                   help="also emit scalar metrics as TensorBoard event "
                        "files into this dir (dependency-free writer, "
                        "utils/tb_events.py; metrics.jsonl stays the "
                        "default sink). The reference's SummaryWriter "
                        "surface, mask_trainer_Robust_VQA.py:51-65")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler xplane trace (TensorBoard/"
                        "XProf) of a training-step window into this dir "
                        "(utils/profiling.py; the product surface of the "
                        "reference's tpu_metrics_debug flag, "
                        "mask_trainer_Robust_VQA.py:775-777)")
    p.add_argument("--profile_start_step", type=int, default=10,
                   help="first step of the trace window (past compile)")
    p.add_argument("--profile_steps", type=int, default=5,
                   help="trace window length in steps")
    p.add_argument("--tiny", action="store_true",
                   help="tiny 2/1/1-layer config for smoke tests")
    p.add_argument("--dataset", type=str, default="vqacp",
                   choices=["vqacp", "vqavs"])
    p.add_argument("--data_ratio", type=float, default=1.0,
                   help="subsample the train set (VQAFeatureDataset ratio)")


class ProfileWindow:
    """Drives `--profile_dir`: starts a jax.profiler trace when the host
    step counter enters [profile_start_step, +profile_steps) and stops it
    on exit. Call `tick(step)` once per iteration (multi-step dispatch
    advances `step` by steps_per_dispatch; the window rounds to dispatch
    boundaries). One-shot: the window never re-arms."""

    def __init__(self, args: argparse.Namespace):
        self.dir = getattr(args, "profile_dir", None)
        self.start = getattr(args, "profile_start_step", 10)
        self.stop_at = self.start + getattr(args, "profile_steps", 5)
        self.active = False

    def tick(self, step: int) -> None:
        if self.dir is None:
            return
        import jax

        # `>=` (not a range test): with multi-step dispatch the host counter
        # can stride clean over [start, stop_at) — fire at the first tick at
        # or past `start`, then stop at the NEXT tick past `stop_at` (the
        # elif guarantees at least one full dispatch inside the trace).
        if not self.active and step >= self.start:
            os.makedirs(self.dir, exist_ok=True)
            jax.profiler.start_trace(self.dir)
            self.active = True
        elif self.active and step >= self.stop_at:
            jax.profiler.stop_trace()
            self.active = False
            self.dir = None  # one-shot

    def close(self) -> None:
        """Stop an open trace at end of training (short runs)."""
        if self.active:
            import jax

            jax.profiler.stop_trace()
            self.active = False
            self.dir = None


def apply_prng_impl(args: argparse.Namespace) -> None:
    """Apply --prng_impl before any key creation. unsafe_rbg (TPU
    RngBitGenerator) measured +13% stage-2 throughput over threefry; the
    default stays threefry so runs are bit-reproducible across backends."""
    import jax

    impl = getattr(args, "prng_impl", None)
    if impl and impl != "threefry2x32":
        jax.config.update("jax_default_prng_impl", impl)
    if getattr(args, "opt", "").lower().split("_")[-1] == "adahessian" and (
            getattr(args, "fused_attention", False)
            or getattr(args, "midseq_attention", False)):
        # second-order (Hutchinson jvp-of-grad) cannot cross the Pallas
        # kernels' custom_vjp; the XLA attention path differentiates at any
        # order (the binarizer STEs are custom_jvp and fine)
        import logging

        logging.getLogger("crvqa_tpu").warning(
            "opt=adahessian needs forward-mode autodiff: forcing the XLA "
            "attention path (--fused_attention/--midseq_attention ignored)")
        args.fused_attention = False
        args.midseq_attention = False
    if getattr(args, "fused_attention", False):
        from ..models import layers

        layers.FUSED_ATTENTION = True
        # Mosaic kernels need a TPU; on the virtual CPU mesh run
        # interpreted so the flag stays testable. Gate on == "cpu", NOT
        # != "tpu": the axon PJRT plugin may report its own platform name
        # for the real chip, and interpret mode there would run the
        # kernels emulated (the r5 session-2 eval A/B suspect)
        layers.FUSED_ATTENTION_INTERPRET = (
            jax.devices()[0].platform == "cpu")
    if getattr(args, "midseq_attention", False):
        from ..models import layers

        layers.MIDSEQ_ATTENTION = True
        layers.FUSED_ATTENTION_INTERPRET = (
            jax.devices()[0].platform == "cpu")


def init_distributed(args: argparse.Namespace) -> None:
    """--multihost: bring up the JAX process group. MUST be the first jax
    call in the driver (before any backend use — setup_logging already reads
    jax.process_index()). The analogue of the reference's
    `utils.init_distributed_mode` / DDP env wiring (`mPLUG/utils.py:238-262`,
    `mask_trainer_Robust_VQA.py:547-557`)."""
    if getattr(args, "multihost", False):
        from ..parallel import initialize_multihost

        initialize_multihost(getattr(args, "coordinator_address", None),
                             getattr(args, "num_processes", None),
                             getattr(args, "process_id", None))


def setup_logging(output_dir: str) -> None:
    os.makedirs(output_dir, exist_ok=True)
    # rank-gated log level like the reference (prune_debias_VQA.py:714-719):
    # INFO on process 0, WARN elsewhere
    logging.basicConfig(
        level=logging.INFO if jax.process_index() == 0 else logging.WARN,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )


def dump_args(args: argparse.Namespace, output_dir: str) -> None:
    """`args.txt` dump of all configs (prune_debias_VQA.py:953-957);
    process-0-gated."""
    if jax.process_index() != 0:
        return
    with open(os.path.join(output_dir, "args.txt"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)


class PreemptionGuard:
    """Preemption-safe checkpointing. A SIGTERM handler latches a flag the
    train loops poll once per iteration: the in-flight dispatch finishes,
    ONE checkpoint is written, and the driver returns cleanly for a
    `--resume_from` restart. The reference has no preemption handling at
    all (SURVEY §5.3 — its "resume" is an optimizer-state reload plus a
    dead skip counter). SIGINT keeps its normal meaning.

    Multi-process: SIGTERM may reach only SOME processes (or land between
    different loop iterations), and both `save_checkpoint` (allgather of
    sharded leaves) and continuing to train issue collectives — acting on a
    process-local flag would mismatch collectives across the slice and hang
    the pod. `save_and_stop` therefore reaches consensus first: every
    process allgathers its latched flag at the same loop point every
    iteration (one scalar over the coordinator per step — noise next to a
    train dispatch) and all act iff ANY process was signalled.
    """

    def __init__(self):
        import signal

        self.triggered = False
        try:
            signal.signal(signal.SIGTERM, self._on_signal)
        except ValueError:
            pass  # not the main thread (embedded / test harness use)

    def _on_signal(self, signum, frame):
        self.triggered = True

    def _any_process_triggered(self) -> bool:
        """Collective agreement on the latched flag. MUST be called at the
        same loop point by every process (it is a collective when
        process_count > 1)."""
        if jax.process_count() == 1:
            return self.triggered
        import numpy as np
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([self.triggered], dtype=np.int32))
        return bool(np.asarray(flags).max())

    def save_and_stop(self, args, state, step: int) -> bool:
        """When ANY process was signalled: write ckpt_<step> (+ preempted
        marker) and return True so the caller can exit its train loop."""
        if not self._any_process_triggered():
            return False
        from ..core import checkpoint as ckpt

        path = os.path.join(args.output_dir, f"ckpt_{step}")
        ckpt.save_checkpoint(path, state,
                             metadata={"step": step, "preempted": True})
        log_step(step, preempted=True, checkpoint=path)
        return True


def write_eval_results(output_dir: str, name: str, **results) -> None:
    """Reference-style eval-results text artifact (`key = value` lines,
    `prune_debias_VQA.py:979-986`, `run_vqa_stage1.py:615-623`);
    process-0-gated."""
    if jax.process_index() != 0:
        return
    with open(os.path.join(output_dir, name), "w") as f:
        for k, v in results.items():
            f.write("%s = %s\n" % (k, v))


def config_overrides(args: argparse.Namespace) -> dict:
    """Model-config kwargs from the optional CLI dropout overrides."""
    out = {}
    for k in ("hidden_dropout_prob", "attention_probs_dropout_prob",
              "classifier_dropout"):
        v = getattr(args, k, None)
        if v is not None:
            out[k] = v
    return out


def scheduler_horizon(n_train: int, batch_size: int, epochs: float) -> int:
    """The reference's LR-scheduler horizon, exactly: every driver feeds
    `get_linear_schedule_with_warmup` with
    `int(int(n/(n_gpu*per_gpu_bs)+1)*epochs)` (`run_vqa_stage1.py:356-358`,
    `prune_debias_VQA.py:626-628`, `..._visualBERT.py:470-472`) — n_gpu *
    per_gpu_bs is our GLOBAL batch size, and the float-division `+1` makes
    the horizon one-step-per-epoch LONGER than the steps actually run, so
    the decay never reaches 0 during training. Loop control stays
    `n // bs * epochs`; only the schedule uses this."""
    return int(int(n_train / batch_size + 1) * epochs)


def crossed(step: int, prev: int, every) -> bool:
    """True when (prev, step] contains a multiple of `every` — the cadence
    check for logging/checkpoint/reset actions. With multi-step dispatch
    the step counter advances by `steps_per_dispatch` at a time, so the
    reference's `step % N == 0` would only fire at lcm(spd, N); this fires
    once per crossed window regardless of stride."""
    return bool(every) and step // every > prev // every


_metrics_writer = None


def init_metrics(args: argparse.Namespace) -> None:
    """Create the run's MetricsWriter (metrics.jsonl + optional TensorBoard
    event file via --tensorboard_dir); every subsequent `log_step` mirrors
    into it. Process-0-gated inside the writer — drivers call this
    unconditionally. The stand-in for the reference's SummaryWriter/wandb
    construction (`mask_trainer_Robust_VQA.py:51-82, 273-276`)."""
    global _metrics_writer
    from ..utils.profiling import MetricsWriter

    if _metrics_writer is not None:
        _metrics_writer.close()
    _metrics_writer = MetricsWriter(
        args.output_dir,
        tensorboard_dir=getattr(args, "tensorboard_dir", None),
        wandb_project=getattr(args, "wandb_project", None))


def log_step(step: int, **metrics) -> None:
    """JSON-line step logs like the reference trainer's `_log`; mirrored to
    metrics.jsonl/TensorBoard when `init_metrics` ran. stdout printing is
    process-0-gated like the reference's rank-gated logging
    (`prune_debias_VQA.py:714-719`)."""
    payload = {"step": step}
    payload.update({k: (round(float(v), 6) if isinstance(v, (int, float, np.floating))
                        else v) for k, v in metrics.items()})
    if jax.process_index() == 0:
        print(json.dumps(payload), flush=True)
    if _metrics_writer is not None:
        _metrics_writer.write(step, **metrics)


# Visual-input leaves whose dtype the first masked/dense matmul casts to
# the model dtype anyway — pre-casting them on the HOST (producer thread)
# is bit-identical under a bf16 model and halves the dominant
# host->device bytes (75.5 of ~80 MB of a bs-256 stage-2 batch is
# visual_feats; labels/bias stay fp32 — they enter fp32 loss math).
_TRANSFER_CAST_KEYS = ("visual_feats", "visual_embeds", "visual_pos")


def transfer_cast_dtype(args):
    """Resolve --transfer_dtype: 'auto' = bfloat16 iff the model computes
    in bfloat16 (--dtype), else float32 (no cast)."""
    choice = getattr(args, "transfer_dtype", "auto")
    if choice == "auto":
        choice = ("bfloat16" if getattr(args, "dtype", "") == "bfloat16"
                  else "float32")
    if choice == "bfloat16":
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return None


def wrap_transfer_cast(batches_fn, args):
    """Cast the visual-feature leaves to the transfer dtype inside the
    batch iterator (runs on the prefetch producer thread)."""
    dt = transfer_cast_dtype(args)
    if dt is None:
        return batches_fn

    def wrapped(*a):
        for batch in batches_fn(*a):
            yield {k: (v.astype(dt) if k in _TRANSFER_CAST_KEYS else v)
                   for k, v in batch.items()}

    return wrapped


def wrap_prefetch(batches_fn, args):
    """Wrap a batches-fn (0 or 1 positional args -> iterator) with the
    background prefetcher (`data/prefetch.py`) at --prefetch_batches depth.
    Host floats are device_put from the producer only when a single device
    is live — under a mesh the driver's shard_fn owns placement — and only
    at steps_per_dispatch 1: the multi-step window path np.stack()s leaves
    on host first, and stacking device arrays would read every float leaf
    back before re-uploading it."""
    from ..data.prefetch import prefetch_batches

    batches_fn = wrap_transfer_cast(batches_fn, args)
    depth = getattr(args, "prefetch_batches", 2)
    if depth <= 0:
        return batches_fn
    host_stacked = getattr(args, "steps_per_dispatch", 1) > 1

    def wrapped(*a):
        import jax

        return prefetch_batches(
            batches_fn(*a), depth=depth,
            to_device=len(jax.devices()) == 1 and not host_stacked)

    return wrapped


def wrap_process_local(batches_fn):
    """Multi-process loader shard: map `process_local_slice` over a
    batches-fn's iterator, so each process feeds its block of every GLOBAL
    batch (see parallel/mesh.py for the contract). Applied BEFORE
    wrap_prefetch so the prefetcher only stages this process's slice.
    Single-process: returns batches_fn unchanged."""
    import jax

    if jax.process_count() == 1:
        return batches_fn
    from ..parallel import process_local_slice

    def wrapped(*a):
        return (process_local_slice(b) for b in batches_fn(*a))

    return wrapped


def build_data(args, config):
    """Returns (train_batches_fn, eval_batches_fn, label2ans, n_train).

    Real VQA-CP data when --dataroot/--img_root are given; synthetic
    otherwise (--synthetic N). Both paths ride the background prefetcher
    (wrap_prefetch) so host batch prep overlaps device steps. Batch sizes
    are GLOBAL: under `jax.process_count() > 1` every process derives the
    same global batch sequence and `wrap_process_local` slices out its rows
    (feature fetch/augment for off-process rows is skipped only in the
    loaders that support it; the synthetic path regenerates cheaply).
    """
    from ..data.synthetic import synthetic_batch

    if args.synthetic:
        n = args.synthetic
        ans_num = config.ans_num
        label2ans = [f"ans_{i}" for i in range(ans_num)]

        pool_n = getattr(args, "synthetic_pool", 0)
        pools: dict = {}

        def _make(bs: int, seed: int) -> dict:
            return synthetic_batch(
                batch_size=bs, seed=seed,
                vocab_size=config.vocab_size, ans_num=ans_num,
                feat_dim=config.visual_feat_dim,
                pos_dim=config.visual_pos_dim)

        def train_batches(epoch: int) -> Iterator[dict]:
            bs = args.train_batch_size
            steps = max(n // bs, 1)
            if pool_n > 0:
                # cycle a fixed pool of distinct batches (see --synthetic_pool)
                if bs not in pools:
                    pools[bs] = [_make(bs, i) for i in range(pool_n)]
                for i in range(steps):
                    yield pools[bs][i % pool_n]
                return
            for i in range(steps):
                yield _make(bs, epoch * 10000 + i)

        def eval_batches() -> Iterator[dict]:
            bs = args.eval_batch_size
            for i in range(max(n // bs, 1)):
                yield _make(bs, 777000 + i)

        return (wrap_prefetch(wrap_process_local(train_batches), args),
                wrap_prefetch(wrap_process_local(eval_batches), args),
                label2ans, n)

    from ..data import vqacp

    tokenizer = vqacp.make_tokenizer(args.vocab_file)
    if getattr(args, "dataset", "vqacp") == "vqavs":
        from ..data import vqavs

        ans2label, label2ans = vqavs.load_answer_vocab(args.dataroot)
        ans_num = len(ans2label)
        train = vqavs.load_entries(args.dataroot, "train", tokenizer, ans_num)
        test = vqavs.load_entries(args.dataroot, "test", tokenizer, ans_num)
    else:
        ans2label, label2ans = vqacp.load_answer_vocab(args.dataroot)
        ans_num = len(ans2label)
        train = vqacp.load_entries(args.dataroot, "train", tokenizer, ans_num,
                                   ratio=args.data_ratio, seed=args.seed)
        test = vqacp.load_entries(args.dataroot, "test", tokenizer, ans_num)
    priors = vqacp.compute_bias_priors(train, ans_num)
    vqacp.attach_bias(train, priors, ans_num)
    vqacp.attach_bias(test, priors, ans_num)
    features = vqacp.open_image_features(args.img_root)

    def train_batches(epoch: int) -> Iterator[dict]:
        return vqacp.iterate_batches(
            train, features, args.train_batch_size,
            shuffle=getattr(args, "train_shuffle", True),
            seed=args.seed + epoch, drop_last=True)

    def eval_batches() -> Iterator[dict]:
        return vqacp.iterate_batches(
            test, features, args.eval_batch_size, shuffle=False)

    return (wrap_prefetch(wrap_process_local(train_batches), args),
            wrap_prefetch(wrap_process_local(eval_batches), args),
            label2ans, len(train))


def make_shard_fn(mesh):
    from ..parallel import shard_batch

    def fn(batch):
        return shard_batch(mesh, {k: v for k, v in batch.items() if k != "valid"})

    return fn
