"""TensorBoard event emitter (utils/tb_events.py): the files must be readable
by STOCK TensorBoard — verified here with tensorboard's own EventFileLoader,
plus crc32c vectors and the MetricsWriter mirror path. The reference's
SummaryWriter surface (`mask_trainer_Robust_VQA.py:51-65, 273-276,
785-799`)."""
import glob
import os

import numpy as np
import pytest

from crvqa_tpu.utils.tb_events import TBEventWriter, _masked_crc, crc32c

tb_loader = pytest.importorskip(
    "tensorboard.backend.event_processing.event_file_loader")


def test_crc32c_vectors():
    # RFC 3720 / kernel test vectors for CRC-32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    # masking is the TFRecord rotate+add — differs from the raw crc
    assert _masked_crc(b"123456789") != crc32c(b"123456789")


def _load_scalars(logdir: str) -> list:
    files = glob.glob(os.path.join(logdir, "events.out.tfevents.*"))
    assert len(files) == 1
    out = []
    for ev in tb_loader.EventFileLoader(files[0]).Load():
        for v in ev.summary.value:
            if v.WhichOneof("value") == "tensor":
                # TB >= 2.x migrates simple_value -> scalar tensor on load
                out.append((ev.step, v.tag, v.tensor.float_val[0]))
            else:
                out.append((ev.step, v.tag, v.simple_value))
    return out


def test_event_file_readable_by_tensorboard(tmp_path):
    d = str(tmp_path / "tb")
    w = TBEventWriter(d)
    w.add_scalar("loss", 1.5, 10)
    w.add_scalar("loss", 0.75, 20)
    w.add_scalar("eval/acc", 42.25, 20)
    w.close()
    rows = _load_scalars(d)
    assert rows == [(10, "loss", 1.5), (20, "loss", 0.75),
                    (20, "eval/acc", 42.25)]


def test_metrics_writer_mirror(tmp_path):
    from crvqa_tpu.utils.profiling import MetricsWriter

    out = str(tmp_path / "run")
    tb = str(tmp_path / "tb")
    mw = MetricsWriter(out, tensorboard_dir=tb)
    mw.write(1, loss=2.0, score=10.0, note="text-skipped")
    mw.write(2, loss=1.0)
    mw.close()
    # JSONL stays the primary sink
    lines = open(os.path.join(out, "metrics.jsonl")).read().splitlines()
    assert len(lines) == 2
    rows = _load_scalars(tb)
    by = {(s, t): v for s, t, v in rows}
    assert np.isclose(by[(1, "loss")], 2.0) and np.isclose(by[(2, "loss")], 1.0)
    assert np.isclose(by[(1, "score")], 10.0)
    # non-float metrics only go to JSONL
    assert not any(t == "note" for _, t, _ in rows)


def test_large_step_and_negative_values(tmp_path):
    d = str(tmp_path)
    w = TBEventWriter(d)
    w.add_scalar("g", -3.5, 2**40)
    w.close()
    assert _load_scalars(d) == [(2**40, "g", -3.5)]


def test_metrics_writer_wandb_hook(tmp_path, monkeypatch):
    """Optional wandb mirroring (the reference's is_wandb_available gate,
    mask_trainer_Robust_VQA.py:68-82): present -> metrics logged + finish;
    absent -> silent JSONL/TB degradation."""
    import sys
    import types

    calls = []
    fake = types.ModuleType("wandb")

    class Run:
        def log(self, d, step=None):
            calls.append((step, dict(d)))

        def finish(self):
            calls.append(("finish", None))

    fake.init = lambda **kw: Run()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    from crvqa_tpu.utils.profiling import MetricsWriter

    w = MetricsWriter(str(tmp_path), wandb_project="proj")
    w.write(3, loss=1.5)
    w.close()
    assert (3, {"loss": 1.5}) in calls
    assert ("finish", None) in calls

    # absent wandb: degrades without raising
    monkeypatch.delitem(sys.modules, "wandb")
    w2 = MetricsWriter(str(tmp_path), wandb_project="proj")
    w2.write(4, loss=2.0)
    w2.close()
