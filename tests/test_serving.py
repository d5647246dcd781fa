"""Serving driver tests (`cli/serve_vqa.py`).

The server re-packages the offline eval forward; these tests assert a
served answer is identical to a direct forward on the same params
(batch-size-invariant, fp32), that responses preserve arrival order through
padding and micro-batching, and that the streaming path flushes a non-full
batch after max_wait_ms.
"""
import json
import os
import threading

import numpy as np

from tests.test_dress_rehearsal import _fabricate


def _args(root, extra=()):
    return [
        "--tiny", "--dtype", "float32", "--seed", "3",
        "--dataroot", str(root),
        "--img_root", str(root / "vqa_img_feature_trainval.pickle"),
        "--vocab_file", str(root / "vocab.txt"),
        *extra,
    ]


def _requests(root, n=10):
    questions = json.load(open(root / "vqacp_v2_test_questions.json"))[:n]
    return [{"question_id": q["question_id"], "question": q["question"],
             "image_id": q["image_id"]} for q in questions]


def _serve(root, tmp_path, reqs, batch_size, tag, extra=()):
    from crvqa_tpu.cli import serve_vqa

    req_path = tmp_path / f"req_{tag}.jsonl"
    out_path = tmp_path / f"out_{tag}.jsonl"
    with open(req_path, "w") as f:
        for r in reqs:
            f.write(json.dumps(r) + "\n")
    serve_vqa.main(_args(root, [
        "--input", str(req_path), "--output", str(out_path),
        "--serve_batch_size", str(batch_size), "--max_wait_ms", "1",
        *extra]))
    return [json.loads(line) for line in open(out_path)]


def test_serve_order_padding_and_parity(tmp_path):
    import jax
    import jax.numpy as jnp

    from crvqa_tpu.cli import serve_vqa
    from crvqa_tpu.data import vqacp
    from crvqa_tpu.models import LxmertConfig, LxmertForVQA

    _fabricate(tmp_path)
    reqs = _requests(tmp_path, 10)
    # batch 4 over 10 requests -> one padded final batch (n=2 < bs)
    out = _serve(tmp_path, tmp_path, reqs, 4, "b4")
    assert [o["question_id"] for o in out] == [r["question_id"] for r in reqs]

    # direct forward on the same (seeded random-init) params
    args = serve_vqa.build_parser().parse_args(_args(tmp_path))
    config = LxmertConfig.tiny(dtype=jnp.float32)
    model = LxmertForVQA(config)
    params = serve_vqa.load_serving_params(args, model, config)
    tokenizer = vqacp.make_tokenizer(str(tmp_path / "vocab.txt"))
    features = vqacp.open_image_features(
        str(tmp_path / "vqa_img_feature_trainval.pickle"))
    _, label2ans = vqacp.load_answer_vocab(str(tmp_path))
    ids, _ = vqacp.tokenize_questions([r["question"] for r in reqs], tokenizer)
    feats, pos = features.lookup([r["image_id"] for r in reqs])
    logits, _ = model.apply(
        {"params": params}, input_ids=jnp.asarray(ids),
        visual_feats=jnp.asarray(feats), visual_pos=jnp.asarray(pos),
        attention_mask=jnp.ones_like(jnp.asarray(ids), jnp.float32),
        deterministic=True)
    expected = [label2ans[int(t)] for t in np.asarray(logits).argmax(axis=1)]
    assert [o["answer"] for o in out] == expected
    assert all(0.0 <= o["prob"] <= 1.0 for o in out)

    # batch-size invariance: padding rows and grouping must not change answers
    out_full = _serve(tmp_path, tmp_path, reqs, 10, "b10")
    assert [o["answer"] for o in out_full] == [o["answer"] for o in out]


def test_serve_visualbert_parity(tmp_path):
    """--model_type visualbert: served answers == a direct single-stream
    forward on the same seeded params (feats ride as visual_embeds)."""
    import jax.numpy as jnp

    from crvqa_tpu.cli import serve_vqa
    from crvqa_tpu.data import vqacp
    from crvqa_tpu.models.visualbert import VisualBertConfig, VisualBertForVQA

    _fabricate(tmp_path)
    reqs = _requests(tmp_path, 6)
    out = _serve(tmp_path, tmp_path, reqs, 4, "vb",
                 extra=["--model_type", "visualbert"])
    assert [o["question_id"] for o in out] == [r["question_id"] for r in reqs]

    args = serve_vqa.build_parser().parse_args(
        _args(tmp_path, ["--model_type", "visualbert"]))
    config = VisualBertConfig.tiny(dtype=jnp.float32)
    model = VisualBertForVQA(config)
    params = serve_vqa.load_serving_params(args, model, config)
    tokenizer = vqacp.make_tokenizer(str(tmp_path / "vocab.txt"))
    features = vqacp.open_image_features(
        str(tmp_path / "vqa_img_feature_trainval.pickle"))
    _, label2ans = vqacp.load_answer_vocab(str(tmp_path))
    ids, _ = vqacp.tokenize_questions([r["question"] for r in reqs], tokenizer)
    feats, _ = features.lookup([r["image_id"] for r in reqs])
    logits, _ = model.apply(
        {"params": params}, input_ids=jnp.asarray(ids),
        visual_embeds=jnp.asarray(feats),
        attention_mask=jnp.ones_like(jnp.asarray(ids), jnp.float32),
        deterministic=True)
    expected = [label2ans[int(t)] for t in np.asarray(logits).argmax(axis=1)]
    assert [o["answer"] for o in out] == expected


def test_serve_error_responses_and_malformed_lines(tmp_path):
    """A bad request gets an error RESPONSE (the batch and server survive);
    a malformed JSON line is dropped by the reader without hanging the
    server (the finally-enqueued EOF sentinel)."""
    from crvqa_tpu.cli import serve_vqa

    _fabricate(tmp_path)
    good = _requests(tmp_path, 1)[0]
    reqs = [good,
            {"question_id": 77, "question": "what?", "image_id": "no_such"},
            {"question_id": 78}]
    req_path = tmp_path / "req_err.jsonl"
    out_path = tmp_path / "out_err.jsonl"
    with open(req_path, "w") as f:
        f.write(json.dumps(reqs[0]) + "\n")
        f.write("{not json at all\n")  # must be dropped, not fatal
        f.write(json.dumps(reqs[1]) + "\n")
        f.write(json.dumps(reqs[2]) + "\n")
    serve_vqa.main(_args(tmp_path, [
        "--input", str(req_path), "--output", str(out_path),
        "--serve_batch_size", "4", "--max_wait_ms", "1"]))
    out = [json.loads(line) for line in open(out_path)]
    assert len(out) == 3  # the malformed line produced no response
    assert out[0]["question_id"] == good["question_id"] and "answer" in out[0]
    assert out[1]["question_id"] == 77 and "no_such" in out[1]["error"]
    assert out[2]["question_id"] == 78 and "error" in out[2]


def test_serve_streaming_flushes_partial_batch(tmp_path, monkeypatch):
    """Feed requests through a pipe with gaps > max_wait_ms: each request
    must come back without waiting for a full batch (micro-batch timeout),
    and the server must exit cleanly on EOF."""
    from crvqa_tpu.cli import serve_vqa

    _fabricate(tmp_path)
    reqs = _requests(tmp_path, 3)

    r_fd, w_fd = os.pipe()
    reader = os.fdopen(r_fd, "r")
    writer = os.fdopen(w_fd, "w")

    def feed():
        import time
        for r in reqs:
            writer.write(json.dumps(r) + "\n")
            writer.flush()
            time.sleep(0.08)  # >> max_wait_ms: forces 3 partial batches
        writer.close()

    monkeypatch.setattr("sys.stdin", reader)
    out_path = tmp_path / "stream_out.jsonl"
    t = threading.Thread(target=feed)
    t.start()
    serve_vqa.main(_args(tmp_path, [
        "--output", str(out_path),
        "--serve_batch_size", "8", "--max_wait_ms", "10"]))
    t.join()
    reader.close()
    out = [json.loads(line) for line in open(out_path)]
    assert [o["question_id"] for o in out] == [r["question_id"] for r in reqs]


def test_serve_fused_attention_flag(tmp_path):
    """--fused_attention on the serving CLI activates the kernel (interpret
    mode off-TPU) and serves the same answers as the XLA path — the flag was
    previously parser-less here (and silently ignored on serve_mplug)."""
    from crvqa_tpu.models import layers

    _fabricate(tmp_path)
    reqs = _requests(tmp_path, 6)
    before = (layers.FUSED_ATTENTION, layers.FUSED_ATTENTION_INTERPRET)
    try:
        base = _serve(tmp_path, tmp_path, reqs, 4, "xla")
        out = _serve(tmp_path, tmp_path, reqs, 4, "fused",
                     ["--fused_attention", "true"])
        # the flag must actually have reached the dispatch switch
        assert layers.FUSED_ATTENTION and layers.FUSED_ATTENTION_INTERPRET
    finally:
        layers.FUSED_ATTENTION, layers.FUSED_ATTENTION_INTERPRET = before
    assert [o["answer"] for o in out] == [o["answer"] for o in base]
