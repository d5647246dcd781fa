"""End-to-end 3-stage pipeline smoke test through the CLI entry points on a
tiny config + synthetic data (SURVEY.md §4 integration tier): stage-1
fine-tune -> stage-2 mask-train -> stage-3 pruned fine-tune, with checkpoint
hand-off via the reference's artifact formats."""
import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_three_stage_pipeline(tmp_path):
    from crvqa_tpu.cli import prune_debias_vqa, run_vqa_stage1, run_vqa_stage3

    s1 = tmp_path / "stage1"
    s2 = tmp_path / "stage2"
    s3 = tmp_path / "stage3"
    common_flags = [
        "--tiny", "--synthetic", "64", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--num_train_epochs", "1",
        "--logging_steps", "2", "--save_steps", "4", "--warmup_steps", "0",
        "--dtype", "float32", "--do_train", "--do_eval",
        "--evaluate_during_training", "--seed", "0",
    ]

    run_vqa_stage1.main([
        "--output_dir", str(s1), "--FT_type", "normal",
        "--label4save", "t", *common_flags])
    stage1_bin = s1 / "t_FTonly.bin"
    assert stage1_bin.exists()
    assert (s1 / "test.json").exists()

    prune_debias_vqa.main([
        "--output_dir", str(s2), "--Masker_type", "lmh",
        "--stage1_ckpt", str(stage1_bin),
        "--Lang_comp", "0.3", "--Vis_comp", "0.3", "--Fus_comp", "0.3",
        "--zero_rate", "0.7", "--controlled_init", "magnitude",
        *common_flags])
    assert (s2 / "mask.pt").exists()
    assert (s2 / "classifier4masker.bin").exists()
    preds = json.load(open(s2 / "test.json"))
    assert {"question_id", "answer"} == set(preds[0])

    run_vqa_stage3.main([
        "--output_dir", str(s3), "--FT_type", "normal",
        "--training_type", "FT_trainedMask",
        "--stage1_ckpt", str(stage1_bin),
        "--mask_pt", str(s2 / "mask.pt"),
        "--classifier_bin", str(s2 / "classifier4masker.bin"),
        "--label4save", "t", *common_flags])
    assert (s3 / "test.json").exists()

    # the stage-2 mask really hit ~0.7 zero rate
    import torch

    mask = torch.load(s2 / "mask.pt", weights_only=False)
    zeros = sum(int((~m).sum()) for m in mask.values())
    total = sum(m.numel() for m in mask.values())
    assert abs(zeros / total - 0.7) < 0.02


@pytest.mark.slow
def test_stage1_lmh_cli(tmp_path):
    from crvqa_tpu.cli import run_vqa_stage1

    out = tmp_path / "s1lmh"
    run_vqa_stage1.main([
        "--output_dir", str(out), "--FT_type", "lmh", "--label4save", "l",
        "--tiny", "--synthetic", "32", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--num_train_epochs", "1",
        "--logging_steps", "2", "--save_steps", "4", "--warmup_steps", "0",
        "--dtype", "float32", "--do_train", "--do_eval",
        "--evaluate_during_training", "--seed", "0"])
    assert (out / "l_FTlmh_only.bin").exists()
    assert (out / "test.json").exists()


@pytest.mark.slow
def test_vqavs_cli_synthetic(tmp_path):
    from crvqa_tpu.cli import prune_debias_vqavs

    out = tmp_path / "vqavs"
    prune_debias_vqavs.main([
        "--output_dir", str(out), "--tiny", "--synthetic", "32",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--save_steps", "4", "--warmup_steps", "0", "--dtype", "float32",
        "--Masker_type", "lpf", "--do_train", "--do_eval",
        "--evaluate_during_training", "--seed", "0"])
    assert (out / "mask.pt").exists()
    # the reference's (typo'd) VQA-VS prediction dump name is preserved
    assert (out / "prefictions_VQAvs_test.json").exists()


@pytest.mark.slow
def test_stage2_scan_layers_cli(tmp_path):
    """--scan_layers end to end: stacked model + per-layer resets + export."""
    from crvqa_tpu.cli import prune_debias_vqa

    out = tmp_path / "scan"
    prune_debias_vqa.main([
        "--output_dir", str(out), "--tiny", "--synthetic", "32",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--save_steps", "4", "--warmup_steps", "0", "--dtype", "float32",
        "--scan_layers", "true", "--Masker_type", "lmh",
        "--do_train", "--do_eval", "--evaluate_during_training",
        "--seed", "0"])
    import torch

    mask = torch.load(out / "mask.pt", weights_only=False)
    # per-layer torch names despite the stacked internal layout
    assert "lxmert.encoder.layer.1.attention.self.query.weight" in mask
    zeros = sum(int((~m).sum()) for m in mask.values())
    total = sum(m.numel() for m in mask.values())
    assert abs(zeros / total - 0.7) < 0.02


@pytest.mark.slow
def test_stage2_resume_from_checkpoint(tmp_path):
    """Kill-and-resume: a second CLI invocation with --resume_from continues
    from the saved step counter (the preemption-recovery story the reference
    lacked, SURVEY.md §5.3)."""
    from crvqa_tpu.cli import prune_debias_vqa
    from crvqa_tpu.core import latest_checkpoint, load_metadata

    out = tmp_path / "resume"
    common = [
        "--output_dir", str(out), "--tiny", "--synthetic", "32",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--logging_steps", "2", "--save_steps", "2", "--warmup_steps", "0",
        "--dtype", "float32", "--Masker_type", "normal", "--seed", "0",
        "--do_train",
    ]
    prune_debias_vqa.main([*common, "--num_train_epochs", "1"])
    ck = latest_checkpoint(str(out))
    assert ck is not None
    step0 = load_metadata(ck)["step"]
    assert step0 >= 2

    prune_debias_vqa.main([*common, "--num_train_epochs", "1",
                           "--resume_from", ck])
    ck2 = latest_checkpoint(str(out))
    step1 = load_metadata(ck2)["step"]
    assert step1 > step0  # continued counting from the restored step


def test_prng_impl_flag(tmp_path):
    """--prng_impl unsafe_rbg (the measured +13% TPU fast path) runs the full
    stage-2 CLI; config restored afterwards so other tests keep threefry."""
    import jax

    from crvqa_tpu.cli import prune_debias_vqa

    before = jax.config.jax_default_prng_impl
    try:
        out = tmp_path / "s2rbg"
        prune_debias_vqa.main([
            "--output_dir", str(out), "--tiny", "--synthetic", "16",
            "--train_batch_size", "8", "--eval_batch_size", "8",
            "--num_train_epochs", "1", "--warmup_steps", "0",
            "--dtype", "float32", "--do_train", "--seed", "0",
            "--Masker_type", "normal", "--zero_rate", "0.7",
            "--controlled_init", "magnitude", "--prng_impl", "unsafe_rbg",
        ])
        assert jax.config.jax_default_prng_impl == "unsafe_rbg"
        assert (out / "mask.pt").exists()
    finally:
        jax.config.update("jax_default_prng_impl", before)


@pytest.mark.slow
def test_stage3_structured_compaction_cli(tmp_path):
    """Structured stage-3 (reference run_vqa_stage3.py:766-772 alternative
    branch): head + FFN mask .npy files physically compact the language
    branch, then the pruned subnetwork fine-tunes end to end."""
    from crvqa_tpu.cli import run_vqa_stage3
    from crvqa_tpu.models import LxmertConfig

    cfg = LxmertConfig.tiny()
    rng = np.random.default_rng(0)
    head_mask = np.ones((cfg.l_layers, cfg.num_attention_heads), np.float32)
    head_mask[0, :2] = 0.0  # prune 2 of 4 heads in layer 0
    ffn_mask = (rng.random((cfg.l_layers, cfg.intermediate_size)) < 0.6
                ).astype(np.float32)
    np.save(tmp_path / "head_mask.npy", head_mask)
    np.save(tmp_path / "ffn_mask.npy", ffn_mask)

    out = tmp_path / "s3struct"
    run_vqa_stage3.main([
        "--output_dir", str(out), "--FT_type", "normal",
        "--training_type", "FT_trainedMask",
        "--head_mask_npy", str(tmp_path / "head_mask.npy"),
        "--ffn_mask_npy", str(tmp_path / "ffn_mask.npy"),
        "--label4save", "t",
        "--tiny", "--synthetic", "32", "--train_batch_size", "8",
        "--eval_batch_size", "8", "--num_train_epochs", "1",
        "--logging_steps", "2", "--save_steps", "4", "--warmup_steps", "0",
        "--dtype", "float32", "--do_train", "--do_eval",
        "--evaluate_during_training", "--seed", "0"])
    assert (out / "test.json").exists()


def test_fused_attention_flag(tmp_path):
    """--fused_attention runs the stage-2 CLI through the Pallas kernel
    (interpreted on the CPU mesh); flag restored afterwards."""
    from crvqa_tpu.cli import prune_debias_vqa
    from crvqa_tpu.models import layers

    try:
        out = tmp_path / "s2fused"
        prune_debias_vqa.main([
            "--output_dir", str(out), "--tiny", "--synthetic", "16",
            "--train_batch_size", "8", "--eval_batch_size", "8",
            "--num_train_epochs", "1", "--warmup_steps", "0",
            "--dtype", "float32", "--do_train", "--seed", "0",
            "--Masker_type", "normal", "--zero_rate", "0.7",
            "--controlled_init", "magnitude", "--fused_attention", "true",
        ])
        assert layers.FUSED_ATTENTION and layers.FUSED_ATTENTION_INTERPRET
        assert (out / "mask.pt").exists()
    finally:
        layers.FUSED_ATTENTION = False
        layers.FUSED_ATTENTION_INTERPRET = False
