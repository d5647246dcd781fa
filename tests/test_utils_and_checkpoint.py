"""Unit coverage: checkpoint retention/latest, MetricsWriter, StepTimer,
cal_metric, torch-compat name mapping round trip."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from crvqa_tpu.core import (
    latest_checkpoint,
    load_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
)
from crvqa_tpu.core.torch_compat import (
    flax_to_torch_state_dict,
    torch_state_dict_to_flax,
)
from crvqa_tpu.evals import cal_metric
from crvqa_tpu.utils.profiling import MetricsWriter, StepTimer


def test_checkpoint_latest_and_rotation(tmp_path):
    d = str(tmp_path)
    for step in (10, 20, 30, 40):
        save_checkpoint(os.path.join(d, f"ckpt_{step}"),
                        {"x": jnp.full((2,), step)}, metadata={"step": step})
    assert latest_checkpoint(d).endswith("ckpt_40")
    rotate_checkpoints(d, keep=2)
    remaining = sorted(n for n in os.listdir(d) if n.startswith("ckpt_")
                       and not n.endswith(".json"))
    assert remaining == ["ckpt_30", "ckpt_40"]
    restored = load_checkpoint(os.path.join(d, "ckpt_40"),
                               {"x": jnp.zeros((2,))})
    np.testing.assert_array_equal(np.asarray(restored["x"]), [40, 40])
    # keep<=0 means NO rotation (the reference returns early for
    # save_total_limit None/<=0) — it must never mean "delete everything"
    rotate_checkpoints(d, keep=0)
    rotate_checkpoints(d, keep=-1)
    assert sorted(n for n in os.listdir(d) if n.startswith("ckpt_")
                  and not n.endswith(".json")) == ["ckpt_30", "ckpt_40"]


def test_crossed_cadence():
    """Multi-step dispatch cadence: fire once per crossed multiple of N
    regardless of step stride (cli/common.crossed)."""
    from crvqa_tpu.cli.common import crossed

    # stride 64, N=100: reference `step % 100 == 0` would fire only at
    # lcm(64,100)=1600; crossed fires on every window containing a multiple
    fires = [s for s in range(64, 3201, 64) if crossed(s, s - 64, 100)]
    assert fires[:5] == [128, 256, 320, 448, 512]  # windows crossing 100k
    assert len(fires) == 32  # one per multiple of 100 in (0, 3200]
    # stride 1 degenerates to step % N == 0
    assert [s for s in range(1, 20) if crossed(s, s - 1, 5)] == [5, 10, 15]
    # disabled cadences never fire
    assert not crossed(100, 0, 0)
    assert not crossed(100, 0, None)


def test_metrics_writer_jsonl(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.write(1, loss=1.5, tag="a")
    w.write(2, loss=jnp.asarray(0.75))
    w.close()
    lines = [json.loads(l) for l in open(w.path)]
    assert lines[0] == {"step": 1, "loss": 1.5, "tag": "a"}
    assert lines[1]["loss"] == 0.75


def test_step_timer():
    t = StepTimer(warmup=1)
    for _ in range(4):
        t.start()
        t.stop()
    s = t.summary(batch_size=8)
    assert s["steps"] == 3
    assert s["examples_per_sec"] > 0


def test_cal_metric(tmp_path):
    label_file = tmp_path / "labels.json"
    json.dump([
        {"question_id": 1, "label": {"yes": 1.0, "no": 0.3}},
        {"question_id": 2, "label": {"red": 0.6}},
    ], open(label_file, "w"))
    preds = [{"question_id": 1, "answer": "yes"},
             {"question_id": 2, "answer": "blue"}]
    assert abs(cal_metric(preds, str(label_file)) - 0.5) < 1e-9


def test_torch_name_mapping_round_trip():
    params = {
        "encoder": {
            "layer_3": {"attention": {"self": {"query": {
                "kernel": np.arange(12.0).reshape(3, 4).astype(np.float32),
                "bias": np.zeros(4, np.float32)}}}},
            "LayerNorm": {"scale": np.ones(3, np.float32),
                          "bias": np.zeros(3, np.float32)},
        },
        "emb": {"word_embeddings": {
            "embedding": np.ones((5, 3), np.float32)}},
        "clf": {"main_0": {"v": np.ones((3, 2), np.float32),
                           "g": np.asarray([2.0], np.float32),
                           "bias": np.zeros(2, np.float32)}},
    }
    sd = flax_to_torch_state_dict(params)
    assert "encoder.layer.3.attention.self.query.weight" in sd
    assert sd["encoder.layer.3.attention.self.query.weight"].shape == (4, 3)
    assert "encoder.LayerNorm.weight" in sd
    assert "emb.word_embeddings.weight" in sd
    assert sd["clf.main.0.weight_g"].shape == ()
    back = torch_state_dict_to_flax(sd, params)
    np.testing.assert_array_equal(
        back["encoder"]["layer_3"]["attention"]["self"]["query"]["kernel"],
        params["encoder"]["layer_3"]["attention"]["self"]["query"]["kernel"])
    np.testing.assert_array_equal(back["clf"]["main_0"]["g"],
                                  params["clf"]["main_0"]["g"])


def test_profile_window_captures_trace(tmp_path):
    """`--profile_dir` must land a jax.profiler xplane trace from a normal
    CLI training run (the product surface of SURVEY §5.1 tracing)."""
    import glob

    from crvqa_tpu.cli import run_vqa_stage1

    prof = tmp_path / "prof"
    run_vqa_stage1.main([
        "--tiny", "--synthetic", "16", "--train_batch_size", "8",
        "--num_train_epochs", "1", "--do_train", "--dtype", "float32",
        "--warmup_steps", "0", "--output_dir", str(tmp_path / "out"),
        "--profile_dir", str(prof), "--profile_start_step", "1",
        "--profile_steps", "1", "--prefetch_batches", "0"])
    traces = glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)
    assert traces, f"no xplane trace under {prof}"


def test_profile_window_fires_when_dispatch_strides_over_it(
        tmp_path, monkeypatch):
    """Multi-step dispatch advances the host counter by steps_per_dispatch;
    a window that falls between two ticks (e.g. [10, 15) with ticks at
    8/16/24) must still capture — regression: the old range test
    `start <= step < stop_at` never fired and the run ended traceless."""
    import argparse

    import jax

    from crvqa_tpu.cli.common import ProfileWindow

    calls = []
    monkeypatch.setattr(jax.profiler, "start_trace",
                        lambda d: calls.append(("start", d)))
    monkeypatch.setattr(jax.profiler, "stop_trace",
                        lambda: calls.append(("stop",)))
    args = argparse.Namespace(profile_dir=str(tmp_path / "p"),
                              profile_start_step=10, profile_steps=5)
    w = ProfileWindow(args)
    for step in (8, 16, 24, 32):
        w.tick(step)
    w.close()
    assert calls == [("start", str(tmp_path / "p")), ("stop",)]
    # one-shot: later ticks past the window must not re-arm
    w.tick(40)
    assert len(calls) == 2
