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


def _serve(root, reqs, batch_size, tag, extra=()):
    from crvqa_tpu.cli import serve_mplug

    req_path = root / f"req_{tag}.jsonl"
    out_path = root / f"out_{tag}.jsonl"
    with open(req_path, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    serve_mplug.main(_args(root, [
        "--input", str(req_path), "--output", str(out_path),
        "--serve_batch_size", str(batch_size), "--max_wait_ms", "1", *extra]))
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

    # per-request validation: an unreadable image path errors that request
    # only, the rest of the batch still answers
    bad = [{"question_id": 1, "question": "is this a dog?",
            "image": str(tmp_path / "missing.jpg")}, reqs[0]]
    out_bad = _serve(tmp_path, bad, 2, "bad")
    assert "error" in out_bad[0] and out_bad[1]["answer"] == out[0]["answer"]


def test_serve_mplug_rank_mode(tmp_path):
    """--eval_method rank serves answers from the fixed candidate list
    (chain-rule LM-loss ranking), invariant to serve batch size."""
    from tests.test_dress_rehearsal_mplug import ANSWERS

    _fabricate(tmp_path)
    reqs = _requests_from(tmp_path, 4)
    extra = ["--eval_method", "rank",
             "--answer_list", str(tmp_path / "answer_list.json"),
             "--k_test", "0"]
    out = _serve(tmp_path, reqs, 2, "rank2", extra=extra)
    assert [o["question_id"] for o in out] == [r["question_id"] for r in reqs]
    assert all(o["answer"] in ANSWERS for o in out)
    out_full = _serve(tmp_path, reqs, 4, "rank4", extra=extra)
    assert [o["answer"] for o in out_full] == [o["answer"] for o in out]


def test_serve_mplug_checkpoint_restore(tmp_path):
    """Serving state restores from a training checkpoint through None-typed
    opt/twin fields: serve(--ckpt saved-from-seed-99) must answer exactly
    like a seed-99 server, not like the serving parser's own seed."""
    import jax

    from crvqa_tpu.cli import vqa_mplug
    from crvqa_tpu.core import checkpoint as ckpt
    from crvqa_tpu.train import mplug_train

    _fabricate(tmp_path)
    reqs = _requests_from(tmp_path, 3)

    # build a full training state (WITH optimizer state) at seed 99
    targs = vqa_mplug.build_parser().parse_args(_args(tmp_path) + ["--seed", "99"])
    config, _, model = vqa_mplug.build_model(targs)
    masker, _ = vqa_mplug.build_masker(targs, config)
    from crvqa_tpu.data.mplug_data import synthetic_mplug_batch

    import jax.numpy as jnp

    b0 = synthetic_mplug_batch(batch_size=1, image_res=config.vit.image_res,
                               vocab_size=config.bert.vocab_size)
    jb0 = {k: jnp.asarray(v) for k, v in b0.items() if k != "qid"}
    params = model.init(jax.random.PRNGKey(99), jb0["images"],
                        jb0["question_ids"], jb0["question_mask"],
                        jb0["answer_ids"], jb0["answer_mask"],
                        jb0["weights"])["params"]
    cfg = mplug_train.MPlugTrainConfig(mode="mask")
    state, _ = mplug_train.init_state(model, params, cfg,
                                      jax.random.PRNGKey(99), masker=masker)
    ckpt.save_checkpoint(str(tmp_path / "ckpt_t"), state)

    out_ckpt = _serve(tmp_path, reqs, 3, "ckpt",
                      extra=["--ckpt", str(tmp_path / "ckpt_t")])
    out_99 = _serve(tmp_path, reqs, 3, "s99", extra=["--seed", "99"])
    assert [o["answer"] for o in out_ckpt] == [o["answer"] for o in out_99]


def _requests_from(root, n):
    test_records = json.load(open(root / "vqa_test.json"))[:n]
    return [{"question_id": r["question_id"], "question": r["question"],
             "image": str(root / r["image"])} for r in test_records]
