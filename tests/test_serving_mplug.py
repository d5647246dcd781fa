"""mPLUG serving tests (`cli/serve_mplug.py`).

Asserts the generative server returns responses in arrival order, that
partial-batch padding cannot change a real row's answer (beam search is
row-independent: serve_batch_size invariance), and that mask-mode state
wiring (scores/thresholds through the rebuilt masker) serves end-to-end.
"""
import json

from tests.test_dress_rehearsal_mplug import _fabricate


def _args(root, extra=()):
    return [
        "--tiny", "--dtype", "float32", "--seed", "11", "--mode", "mask",
        "--vocab_file", str(root / "vocab.txt"),
        "--beam_size", "2", "--max_answer_len", "6",
        "--output_dir", str(root / "out"),
        *extra,
    ]


def _serve(root, reqs, batch_size, tag):
    from crvqa_tpu.cli import serve_mplug

    req_path = root / f"req_{tag}.jsonl"
    out_path = root / f"out_{tag}.jsonl"
    with open(req_path, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    serve_mplug.main(_args(root, [
        "--input", str(req_path), "--output", str(out_path),
        "--serve_batch_size", str(batch_size), "--max_wait_ms", "1"]))
    return [json.loads(line) for line in open(out_path)]


def test_serve_mplug_order_and_batch_invariance(tmp_path):
    _fabricate(tmp_path)
    test_records = json.load(open(tmp_path / "vqa_test.json"))[:5]
    reqs = [{"question_id": r["question_id"], "question": r["question"],
             "image": str(tmp_path / r["image"])} for r in test_records]

    out = _serve(tmp_path, reqs, 2, "b2")  # 5 reqs over bs 2 -> padded final
    assert [o["question_id"] for o in out] == [r["question_id"] for r in reqs]
    assert all(isinstance(o["answer"], str) for o in out)

    out_full = _serve(tmp_path, reqs, 5, "b5")
    assert [o["answer"] for o in out_full] == [o["answer"] for o in out]
