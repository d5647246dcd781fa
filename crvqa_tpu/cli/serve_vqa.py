"""Batched VQA inference server — a production serving surface.

The reference has no serving story: its only inference path is the offline
prediction loop (`mask_trainer_Robust_VQA.py:1096-1245`) plus `make_json`
(:487-496), which requires a full dataset object and re-runs a whole split.
This driver re-packages the same forward (stage-1 dense params, or a stage-2
subnetwork via `mask.pt` + `classifier4masker.bin`, or a stage-3 fine-tuned
checkpoint) as a long-lived request server:

- JSON-lines protocol: one request `{"question_id": ..., "question": str,
  "image_id": str}` per line on stdin (or `--input` file), one response
  `{"question_id", "answer", "prob"}` per line on stdout (or `--output`),
  in arrival order.
- Micro-batching: requests are grouped up to `--serve_batch_size`, waiting
  at most `--max_wait_ms` after the first pending request. Every batch is
  padded to the SAME static shape with a `valid` mask, so XLA compiles the
  forward exactly once (compile happens at startup on a dummy batch, before
  the first request arrives — cold-start pays it, requests never do).
- Image features come from the preloaded feature store (`--img_root`: the
  reference's `vqa_img_feature_trainval.pickle` or the native mmap `.bin`
  built by `python -m crvqa_tpu.native.feature_store`), questions go through
  the self-contained WordPiece tokenizer with the fixed-14 [PAD] contract
  (`dataset_LXM.py:189-226`) — identical preprocessing to training, so a
  served answer is byte-identical to the offline predict path's.
- End-of-input prints a stats line (requests, batches, occupancy,
  per-batch end-to-end latency percentiles — host preprocessing INCLUDED,
  which dominates for serve_mplug's image decode) to stderr.

Single-chip by design: VQA serving is latency-bound at these model sizes
(one v5e chip runs stage-2 eval at thousands of examples/sec); scale-out is
process-per-chip behind any external load balancer.
"""
from __future__ import annotations

import argparse
import json
import queue
import sys
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import torch_compat
from ..models import LxmertConfig, LxmertForVQA
from . import common


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("serve_vqa")
    p.add_argument("--model_type", type=str, default="lxmert",
                   choices=["lxmert", "visualbert"])
    p.add_argument("--ckpt", type=str, default=None,
                   help="params checkpoint: stage-1/3 torch .bin or msgpack")
    p.add_argument("--mask_pt", type=str, default=None,
                   help="stage-2 mask.pt -> serve the pruned subnetwork")
    p.add_argument("--classifier_bin", type=str, default=None,
                   help="stage-2 classifier4masker.bin")
    p.add_argument("--zero_rate", type=float, default=0.7)
    p.add_argument("--dataroot", type=str, required=True,
                   help="dir with cache/train_test_label2ans.pkl")
    p.add_argument("--img_root", type=str, required=True,
                   help="image-feature pickle or native .bin store")
    p.add_argument("--vocab_file", type=str, default=None)
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--ans_num", type=int, default=2274)
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--serve_batch_size", type=int, default=32)
    p.add_argument("--max_wait_ms", type=float, default=5.0,
                   help="max time to hold a non-full batch after its first "
                        "request")
    p.add_argument("--input", type=str, default="-",
                   help="'-' = stdin, else a requests .jsonl file")
    p.add_argument("--output", type=str, default="-",
                   help="'-' = stdout, else a responses .jsonl file")
    common.add_kernel_flags(p)
    return p


def load_serving_params(args, model, config):
    """Stage-agnostic param assembly: checkpoint, then optional stage-2
    subnetwork artifacts (the `run_vqa_stage3.py:227-324` pruning applied
    once at load — served weights are exactly `w * mask`)."""
    if args.model_type == "visualbert":
        params = common.init_visualbert_params(
            model, config, jax.random.PRNGKey(args.seed))
        params = common.load_params_any(args.ckpt, params)
    else:
        from .prune_debias_vqa import load_stage1_params

        params = load_stage1_params(args.ckpt, model, config,
                                    jax.random.PRNGKey(args.seed))
    if args.mask_pt:
        if args.model_type == "visualbert":
            from ..masking import (Masker, ModalSparsity,
                                   visualbert_mask_specs)

            masker = Masker.create(
                visualbert_mask_specs(config.num_hidden_layers),
                ModalSparsity.uniform(args.zero_rate))
        else:
            masker = common.lxmert_uniform_masker(config, args.zero_rate)
        masks = torch_compat.import_mask_pt(args.mask_pt, masker.specs)
        params = jax.jit(masker.prune_params)(
            params, {k: jnp.asarray(v) for k, v in masks.items()})
    if args.classifier_bin:
        params = common.overlay_classifier(
            params, args.classifier_bin,
            key="cls" if args.model_type == "visualbert" else "classifier")
    return params


class _Batcher:
    """Reader thread + bounded queue; the main loop pulls the first pending
    request blocking, then drains up to batch_size-1 more within
    max_wait_ms. A single reader preserves arrival order."""

    _EOF = object()

    def __init__(self, stream, batch_size: int, max_wait_ms: float):
        self.q: queue.Queue = queue.Queue(maxsize=4 * batch_size)
        self.batch_size = batch_size
        self.max_wait = max_wait_ms / 1000.0
        self.done = False
        self._t = threading.Thread(target=self._read, args=(stream,),
                                   daemon=True)
        self._t.start()

    def _read(self, stream):
        # the finally-EOF is load-bearing: if this thread dies without
        # enqueueing the sentinel, next_batch() blocks forever and the
        # server hangs — malformed lines are dropped, never fatal
        try:
            for line in stream:
                line = line.strip()
                if not line:
                    continue
                try:
                    self.q.put(json.loads(line))
                except ValueError as e:
                    print(f"serve: dropped malformed request line: {e}",
                          file=sys.stderr, flush=True)
        finally:
            self.q.put(self._EOF)

    def next_batch(self) -> Optional[list]:
        if self.done:
            return None
        first = self.q.get()
        if first is self._EOF:
            self.done = True
            return None
        batch = [first]
        deadline = time.monotonic() + self.max_wait
        while len(batch) < self.batch_size:
            remaining = deadline - time.monotonic()
            try:
                item = self.q.get(timeout=max(remaining, 0.0))
            except queue.Empty:
                break
            if item is self._EOF:
                self.done = True
                break
            batch.append(item)
        return batch


def serve_loop(args, run_batch, tag: str) -> None:
    """Generic request loop: micro-batch from --input, write responses to
    --output in arrival order, print latency stats at EOF. Shared by the
    LXMERT (`serve_vqa`) and mPLUG (`serve_mplug`) servers."""
    bs = args.serve_batch_size
    in_stream = sys.stdin if args.input == "-" else open(args.input)
    out_stream = sys.stdout if args.output == "-" else open(args.output, "w")
    batcher = _Batcher(in_stream, bs, args.max_wait_ms)

    n_req = n_batch = 0
    lat_ms: list = []
    while True:
        reqs = batcher.next_batch()
        if reqs is None:
            break
        t0 = time.monotonic()
        try:
            resps = run_batch(reqs)
        except Exception as e:  # a long-lived server must outlive one bad
            # batch: every request in it gets an error response instead of
            # the whole process dying with the in-flight queue
            resps = [{"question_id": (r.get("question_id")
                                      if isinstance(r, dict) else None),
                      "error": f"{type(e).__name__}: {e}"} for r in reqs]
        for resp in resps:
            out_stream.write(json.dumps(resp) + "\n")
        out_stream.flush()
        lat_ms.append(1000 * (time.monotonic() - t0))
        n_req += len(reqs)
        n_batch += 1
    if args.input != "-":
        in_stream.close()
    if args.output != "-":
        out_stream.close()

    if n_batch:
        lat = np.asarray(lat_ms)
        stats = {"requests": n_req, "batches": n_batch,
                 "occupancy": round(n_req / (n_batch * bs), 3),
                 "batch_ms_p50": round(float(np.percentile(lat, 50)), 2),
                 "batch_ms_p99": round(float(np.percentile(lat, 99)), 2)}
        print(f"{tag} stats: {json.dumps(stats)}", file=sys.stderr,
              flush=True)


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    common.apply_prng_impl(args)  # activates the kernel flags too

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.model_type == "visualbert":
        from ..models.visualbert import VisualBertConfig, VisualBertForVQA

        config = (VisualBertConfig.tiny(dtype=dtype) if args.tiny
                  else VisualBertConfig(ans_num=args.ans_num, dtype=dtype))
        model = VisualBertForVQA(config)
    else:
        config = (LxmertConfig.tiny(dtype=dtype) if args.tiny
                  else LxmertConfig(ans_num=args.ans_num, dtype=dtype))
        model = LxmertForVQA(config)
    params = load_serving_params(args, model, config)

    from ..data import vqacp

    tokenizer = vqacp.make_tokenizer(args.vocab_file)
    _, label2ans = vqacp.load_answer_vocab(args.dataroot)
    features = vqacp.open_image_features(args.img_root)

    from ..train.common import model_inputs

    @jax.jit
    def forward(params, batch):
        # the forward-kwargs contract is single-sourced in
        # train.common.model_inputs (LXMERT: visual_feats+visual_pos;
        # VisualBERT: visual_embeds) so serving cannot drift from the
        # training/eval call convention
        logits, _ = model.apply({"params": params}, deterministic=True,
                                **model_inputs(batch))
        return logits

    def device_batch(ids, feats, pos):
        b = {"input_ids": jnp.asarray(ids),
             # all-ones mask = the reference's positional model call
             # (mask_trainer_Robust_VQA.py:808; see vqacp.iterate_batches)
             "attention_mask": jnp.ones(ids.shape, jnp.float32)}
        if args.model_type == "visualbert":
            # single-stream model: the 2048-d features ARE visual_embeds
            # (mask_trainer_visualBERT_VQA.py:820); spatials unused
            b["visual_embeds"] = jnp.asarray(feats)
        else:
            b["visual_feats"] = jnp.asarray(feats)
            b["visual_pos"] = jnp.asarray(pos)
        return b

    bs = args.serve_batch_size

    def run_batch(requests: list) -> list:
        # per-request validation: a bad request gets an error RESPONSE and
        # is excluded from the model batch — it must never take down the
        # batch (let alone the server) for its neighbors
        responses: list = [None] * len(requests)
        live = []
        for i, r in enumerate(requests):
            if (not isinstance(r, dict) or "question" not in r
                    or "image_id" not in r):
                responses[i] = {
                    "question_id": (r.get("question_id")
                                    if isinstance(r, dict) else None),
                    "error": "request needs question and image_id"}
            elif str(r["image_id"]) not in features:
                responses[i] = {"question_id": r.get("question_id"),
                                "error": f"unknown image_id {r['image_id']}"}
            else:
                live.append(i)
        if not live:
            return responses
        n = len(live)
        questions = [requests[i]["question"] for i in live]
        image_ids = np.asarray([str(requests[i]["image_id"]) for i in live])
        if n < bs:  # pad to the static shape; pad rows are discarded
            questions += [""] * (bs - n)
            image_ids = np.concatenate(
                [image_ids, np.repeat(image_ids[-1:], bs - n)])
        ids, _ = vqacp.tokenize_questions(questions, tokenizer)
        feats, pos = features.lookup(image_ids)
        logits = np.asarray(forward(params, device_batch(ids, feats, pos)),
                            np.float32)[:n]
        top = logits.argmax(axis=1)
        probs = 1.0 / (1.0 + np.exp(-logits[np.arange(n), top]))
        for j, i in enumerate(live):
            responses[i] = {"question_id": requests[i].get("question_id"),
                            "answer": label2ans[int(top[j])],
                            "prob": round(float(probs[j]), 6)}
        return responses

    # startup compile on a dummy batch: the one trace the server ever does
    t0 = time.monotonic()
    run_batch([{"question_id": -1, "question": "warm up",
                "image_id": features.ids()[0]}])
    compile_s = time.monotonic() - t0
    print(f"serve_vqa: ready (compile {compile_s:.1f}s, batch {bs}, "
          f"wait {args.max_wait_ms}ms)", file=sys.stderr, flush=True)

    serve_loop(args, run_batch, tag="serve_vqa")


if __name__ == "__main__":
    main()
