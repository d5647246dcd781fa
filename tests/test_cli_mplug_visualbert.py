"""CLI smoke tests for the mPLUG and VisualBERT drivers (tiny + synthetic)."""
import json
import os

import pytest


@pytest.mark.slow
def test_vqa_mplug_mask_train_cli(tmp_path):
    from crvqa_tpu.cli import vqa_mplug

    out = tmp_path / "mplug"
    vqa_mplug.main([
        "--output_dir", str(out), "--tiny", "--synthetic", "16",
        "--mode", "mask", "--zero_rate", "0.5",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--masker_update_step", "2", "--save_steps", "4",
        "--warmup_steps", "1", "--dtype", "float32",
        "--do_train", "--do_predict", "--seed", "0",
    ])
    assert (out / "mask.pt").exists()
    assert (out / "mask_config.json").exists()
    preds = json.load(open(out / "vqa_result.json"))
    assert preds and set(preds[0]) == {"question_id", "answer"}

    import torch

    mask = torch.load(out / "mask.pt", weights_only=False)
    assert any(k.startswith("text_decoder.bert.encoder") for k in mask)
    zeros = sum(int((~m).sum()) for m in mask.values())
    total = sum(m.numel() for m in mask.values())
    assert abs(zeros / total - 0.5) < 0.05


@pytest.mark.slow
def test_visualbert_stage2_cli(tmp_path):
    from crvqa_tpu.cli import prune_debias_vqa_visualbert as vb

    out = tmp_path / "vb"
    vb.main([
        "--output_dir", str(out), "--tiny", "--synthetic", "32",
        "--zero_rate", "0.7", "--Masker_type", "lmh",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--save_steps", "4", "--warmup_steps", "0", "--dtype", "float32",
        "--do_train", "--do_eval", "--evaluate_during_training",
        "--seed", "0",
    ])
    assert (out / "mask.pt").exists()
    assert (out / "classifier4masker.bin").exists()

    import torch

    mask = torch.load(out / "mask.pt", weights_only=False)
    assert "visual_bert.encoder.layer.0.attention.self.query.weight" in mask


@pytest.mark.slow
def test_eval_pipeline_depth_equivalence(tmp_path):
    """--eval_pipeline_depth only changes WHEN results are fetched, never
    what they are or their order: depths 0 (serial reference-shaped loop),
    1 (default dispatch-ahead) and 3 (> batch count would deadlock a wrong
    flush loop) must produce identical vqa_result.json files."""
    from crvqa_tpu.cli import vqa_mplug

    outs = []
    for depth in (0, 1, 3):
        out = tmp_path / f"d{depth}"
        vqa_mplug.main([
            "--output_dir", str(out), "--tiny", "--synthetic", "24",
            "--mode", "full", "--eval_batch_size", "8",
            "--do_predict", "--eval_pipeline_depth", str(depth),
            "--dtype", "float32", "--seed", "0",
        ])
        outs.append(json.load(open(out / "vqa_result.json")))
    assert outs[0] == outs[1] == outs[2]
    assert len(outs[0]) == 24
