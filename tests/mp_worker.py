"""Subprocess worker for test_multiprocess.py — the 2-process half of the
multi-process runtime contract (parallel/mesh.py).

Launched as `python tests/mp_worker.py MODE NPROC PID PORT OUTDIR` with NPROC
processes x (8/NPROC) virtual CPU devices each, coordinated over localhost
gRPC. This is the CPU stand-in for a multi-host TPU pod slice: process-local
loader shards, `jax.make_array_from_process_local_data` batch assembly,
cross-process `process_allgather` eval gathers, process-0 artifact gating —
the semantics the reference gets from DDP + DistributedSampler +
distributed_concat (`mask_trainer_Robust_VQA.py:303-307, 1247-1257`,
`mPLUG/utils.py:238-262`).
"""
import json
import os
import sys

# script mode puts tests/ (not the repo root) on sys.path
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup(nproc: int):
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={8 // nproc}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    return jax


def run_units(jax, nproc: int, pid: int, out_dir: str) -> None:
    """Unit semantics under 2 real processes: loader slice -> global batch ->
    gather round trips, sharded-leaf checkpoint save, process-0 gating."""
    import numpy as np

    from crvqa_tpu.core import load_checkpoint, save_checkpoint
    from crvqa_tpu.parallel import (
        host_all_gather,
        host_all_gather_local,
        is_main_process,
        make_mesh,
        process_local_slice,
        shard_batch,
    )
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == nproc
    mesh = make_mesh()
    checks = {}

    # 1) GLOBAL batch -> per-process slice -> global device array -> host
    gbatch = {"x": np.arange(8 * 3, dtype=np.float32).reshape(8, 3),
              "s": np.float32(7.0)}
    local = process_local_slice(gbatch)
    checks["slice_rows"] = bool(
        np.array_equal(local["x"], gbatch["x"][pid * 4:(pid + 1) * 4]))
    dev = shard_batch(mesh, local)
    checks["global_shape"] = tuple(dev["x"].shape) == (8, 3)
    checks["scalar_replicated"] = float(dev["s"]) == 7.0
    checks["gather_roundtrip"] = bool(
        np.array_equal(host_all_gather(dev["x"]), gbatch["x"]))

    # 2) host-local gather concatenates in process order (row alignment
    # with the device batch)
    qids = np.arange(4, dtype=np.int64) + pid * 4
    checks["local_gather_order"] = bool(
        np.array_equal(host_all_gather_local(qids), np.arange(8)))

    # 3) a jitted global reduction sees every process's rows
    summed = float(jax.jit(lambda b: (b["x"] * 2).sum())(dev))
    checks["global_psum"] = abs(summed - 2 * gbatch["x"].sum()) < 1e-4

    # 4) checkpoint with a process-spanning sharded leaf (ZeRO analogue):
    # collective gather inside save_checkpoint, process-0 write
    sharded = jax.device_put(dev["x"], NamedSharding(mesh, P("data")))
    ckpt_path = os.path.join(out_dir, "mp_ckpt")
    save_checkpoint(ckpt_path, {"w": sharded, "b": np.ones(3, np.float32)})
    checks["is_main"] = is_main_process() == (pid == 0)
    if pid == 0:
        restored = load_checkpoint(ckpt_path, {"w": np.zeros((8, 3)),
                                               "b": np.zeros(3)})
        checks["ckpt_value"] = bool(
            np.array_equal(np.asarray(restored["w"]), gbatch["x"]))

    # 5) preemption consensus: the signal latched on process 0 ONLY — both
    # processes must agree (collective flag allgather) and act together,
    # else A enters save_checkpoint's gather while B keeps training
    import argparse

    from crvqa_tpu.cli import common as cli_common

    guard = cli_common.PreemptionGuard()
    guard.triggered = pid == 0
    acted = guard.save_and_stop(
        argparse.Namespace(output_dir=out_dir), {"w": sharded}, step=3)
    checks["preempt_consensus"] = bool(acted)
    if pid == 0:
        checks["preempt_ckpt"] = os.path.exists(
            os.path.join(out_dir, "ckpt_3"))
    # and with NO process signalled, nobody acts
    guard2 = cli_common.PreemptionGuard()
    checks["preempt_quiet"] = not guard2.save_and_stop(
        argparse.Namespace(output_dir=out_dir), {"w": sharded}, step=4)

    with open(os.path.join(out_dir, f"units_{pid}.json"), "w") as f:
        json.dump({k: bool(v) for k, v in checks.items()}, f)


def run_stage2(jax, nproc: int, pid: int, port: str, out_dir: str) -> None:
    """The full stage-2 CLI under NPROC processes on synthetic data. With
    global-batch semantics the nproc=2 run must reproduce the nproc=1 run's
    trajectory and artifacts (floating-point reduction order aside)."""
    from crvqa_tpu.cli import prune_debias_vqa

    argv = [
        "--output_dir", out_dir, "--Masker_type", "lmh",
        "--tiny", "--synthetic", "64",
        "--train_batch_size", "16", "--eval_batch_size", "16",
        "--num_train_epochs", "1", "--logging_steps", "2", "--save_steps", "2",
        "--warmup_steps", "0", "--dtype", "float32",
        "--do_train", "--do_eval", "--evaluate_during_training",
        "--seed", "0", "--Lang_comp", "0.3", "--Vis_comp", "0.3",
        "--Fus_comp", "0.3", "--zero_rate", "0.7",
        "--controlled_init", "magnitude",
    ]
    if nproc > 1:
        argv += ["--multihost", "true",
                 "--coordinator_address", f"localhost:{port}",
                 "--num_processes", str(nproc), "--process_id", str(pid)]
    prune_debias_vqa.main(argv)


def run_mplug(jax, nproc: int, pid: int, port: str, out_dir: str) -> None:
    """The full vqa_mplug CLI (mask mode + momentum twins) under NPROC
    processes — the path that replaced DeepSpeed ZeRO-2
    (`mPLUG/configs/ds_config.json`, `mPLUG/utils.py:238`): ZeRO-sharded
    Adam moments, dual-LR param groups, twin-score EMA, process-local
    loaders, process-0 gating of mask.pt / vqa_result.json / checkpoints."""
    from crvqa_tpu.cli import vqa_mplug

    argv = [
        "--output_dir", out_dir, "--tiny", "--synthetic", "32",
        "--mode", "mask", "--zero_rate", "0.5", "--distill", "true",
        "--train_batch_size", "16", "--eval_batch_size", "16",
        "--num_train_epochs", "1", "--logging_steps", "1",
        "--masker_update_step", "2", "--save_steps", "100",
        "--warmup_steps", "1", "--dtype", "float32",
        "--do_train", "--do_predict", "--seed", "0",
    ]
    if nproc > 1:
        argv += ["--multihost", "true",
                 "--coordinator_address", f"localhost:{port}",
                 "--num_processes", str(nproc), "--process_id", str(pid)]
    vqa_mplug.main(argv)


def main() -> None:
    mode, nproc, pid, port, out_dir = sys.argv[1:6]
    nproc, pid = int(nproc), int(pid)
    jax = _setup(nproc)
    if mode == "units":
        if nproc > 1:
            jax.distributed.initialize(
                coordinator_address=f"localhost:{port}",
                num_processes=nproc, process_id=pid)
        run_units(jax, nproc, pid, out_dir)
    elif mode == "stage2":
        # the CLI's --multihost flags own jax.distributed.initialize
        run_stage2(jax, nproc, pid, port, out_dir)
    elif mode == "mplug":
        run_mplug(jax, nproc, pid, port, out_dir)
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(f"WORKER_OK {mode} {pid}", flush=True)


if __name__ == "__main__":
    main()
