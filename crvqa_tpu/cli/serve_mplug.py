"""Batched mPLUG inference server — generative VQA serving.

The generative twin of `serve_vqa.py` (see its docstring for the protocol
and micro-batching model): serves beam-search answer generation over a
trained mPLUG checkpoint — full-model or a mask-mode subnetwork (the saved
state's score/threshold trees restore 1:1 through the same masker wiring,
`vqa_mplug.build_masker`). The reference's only generative inference is the
offline eval loop (`mPLUG/vqa_mplug.py:247-287`).

Requests: `{"question_id": ..., "question": str, "image": <path>}` per
line; optional `"ocr"` / `"object_label"` fields are spliced exactly like
training when `--add_ocr` / `--add_object` are set
(`vqa_dataset.__getitem__`, mPLUG/dataset/vqa_dataset.py:57-70).
Responses: `{"question_id", "answer"}` in arrival order. Images load
through the same test transform as eval (resize + CLIP normalize, native
fast path), questions through the same tokenizer contract — a served
answer is identical to the offline `vqa_result.json` entry.

Startup compiles the full encode + beam-decode program once on a dummy
batch; requests never pay a trace. `--serve_batch_size` is the static
batch; partial batches are padded and the pad rows discarded (beam search
is row-independent: padding cannot change a real row's answer).
"""
from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core import checkpoint as ckpt
from ..train import mplug_train
from . import common, vqa_mplug
from .serve_vqa import serve_loop


def build_parser():
    p = vqa_mplug.build_parser()
    p.prog = "serve_mplug"
    p.add_argument("--ckpt", type=str, default=None,
                   help="training checkpoint dir (ckpt_final / ckpt_<step>)")
    p.add_argument("--serve_batch_size", type=int, default=8)
    # --device_normalize is inherited from vqa_mplug.build_parser()
    p.add_argument("--max_wait_ms", type=float, default=20.0)
    p.add_argument("--input", type=str, default="-",
                   help="'-' = stdin, else a requests .jsonl file")
    p.add_argument("--output", type=str, default="-",
                   help="'-' = stdout, else a responses .jsonl file")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    assert args.vocab_file, "serve_mplug requires --vocab_file"
    # the parser inherits --fused_attention/--midseq_attention from
    # vqa_mplug; activate them (midseq measured +7.5% on beam-5 eval)
    common.apply_prng_impl(args)

    config, tokenizer, model = vqa_mplug.build_model(args)
    masker = None
    if args.mode == "mask":
        masker, _ = vqa_mplug.build_masker(args, config)

    from ..data.mplug_data import (_tokenize_fixed, augment_question,
                                   load_images, question_token_len,
                                   synthetic_mplug_batch)

    # params init on a probe batch (shapes are batch-size independent).
    # The serving state is built DIRECTLY — no tx.init: the generate step
    # reads only params/scores/thresholds, and materializing weight-shaped
    # Adam moments (GBs at full mPLUG size) just to drop them would spike
    # HBM at startup. Checkpoint restore tolerates the None fields: flax's
    # from_state_dict passes state through unchanged for untyped (None)
    # targets, and the post-load replace() drops those raw subtrees.
    b0 = synthetic_mplug_batch(batch_size=1, image_res=config.vit.image_res,
                               vocab_size=config.bert.vocab_size)
    jb0 = {k: jnp.asarray(v) for k, v in b0.items() if k != "qid"}
    rng = jax.random.PRNGKey(args.seed)
    params = model.init(rng, jb0["images"], jb0["question_ids"],
                        jb0["question_mask"], jb0["answer_ids"],
                        jb0["answer_mask"], jb0["weights"])["params"]
    cfg = mplug_train.MPlugTrainConfig(mode=args.mode, distill=args.distill)
    scores = thresholds = None
    if masker is not None:
        scores, thresholds = jax.jit(masker.init)(params, rng)
    state = mplug_train.MPlugState(
        step=jnp.zeros((), jnp.int32), params=params, scores=scores,
        thresholds=thresholds, params_m=None, opt_state=None, rng=rng)
    if args.ckpt:
        state = ckpt.load_checkpoint(args.ckpt, state)
        state = state.replace(opt_state=None, params_m=None,
                              scores_m=None, thresholds_m=None)
    rank_fn = None
    answers = None
    if args.eval_method == "rank":
        # fixed-candidate re-ranking: the fast serving mode when the answer
        # vocabulary is closed — shares vqa_mplug.build_rank_fn so a served
        # answer stays byte-identical to the offline vqa_result.json entry
        assert args.answer_list, "--eval_method rank needs --answer_list"
        rank_fn, answers, best_index = vqa_mplug.build_rank_fn(
            args, config, tokenizer, model, masker, cfg)

    gen_fn = mplug_train.make_generate_step(
        model, cfg, masker=masker, beam_size=args.beam_size,
        max_len=args.max_answer_len, min_length=args.min_length,
        use_cache=args.decode_cache)

    bs = args.serve_batch_size
    q_len = question_token_len(args.add_ocr, args.max_input_length)
    res = config.vit.image_res

    def decode_answer(row: np.ndarray) -> str:
        toks = [int(t) for t in row[1:]]
        if config.eos_token_id in toks:
            toks = toks[: toks.index(config.eos_token_id)]
        return tokenizer.decode(toks).strip()

    def run_batch(requests: list, images: np.ndarray = None) -> list:
        # per-request validation (see serve_vqa.run_batch): a bad request
        # gets an error response, never takes down the batch or the server
        responses: list = [None] * len(requests)
        live = []
        for i, r in enumerate(requests):
            if not isinstance(r, dict) or "question" not in r:
                responses[i] = {
                    "question_id": (r.get("question_id")
                                    if isinstance(r, dict) else None),
                    "error": "request needs question and image"}
            elif images is None and not (isinstance(r.get("image"), str)
                                         and os.path.isfile(r["image"])):
                responses[i] = {"question_id": r.get("question_id"),
                                "error": f"unreadable image {r.get('image')}"}
            else:
                live.append(i)
        if not live:
            return responses
        n = len(live)
        texts = [augment_question(requests[i], args.add_ocr, args.add_object)
                 for i in live]
        if images is None:
            images = load_images([requests[i]["image"] for i in live], res,
                                 workers=args.data_workers,
                                 raw=args.device_normalize)
        if n < bs:
            texts += [""] * (bs - n)
            images = np.concatenate(
                [images, np.repeat(images[-1:], bs - n, axis=0)])
        ids, mask = _tokenize_fixed(tokenizer, texts, q_len)
        dev = {"images": jnp.asarray(images),
               "question_ids": jnp.asarray(ids),
               "question_mask": jnp.asarray(mask)}
        if rank_fn is not None:
            out = rank_fn(state, dev)
            best = best_index(out)
            for j, i in enumerate(live):
                responses[i] = {"question_id": requests[i].get("question_id"),
                                "answer": answers[int(best[j])]}
            return responses
        out_ids, _ = gen_fn(state, dev)
        out_ids = np.asarray(out_ids)[:n]
        for j, i in enumerate(live):
            responses[i] = {"question_id": requests[i].get("question_id"),
                            "answer": decode_answer(out_ids[j])}
        return responses

    t0 = time.monotonic()
    run_batch([{"question_id": -1, "question": "warm up"}],
              images=np.zeros((1, res, res, 3),
                              np.uint8 if args.device_normalize
                              else np.float32))
    print(f"serve_mplug: ready (compile {time.monotonic() - t0:.1f}s, "
          f"batch {bs}, beam {args.beam_size})", file=sys.stderr, flush=True)

    serve_loop(args, run_batch, tag="serve_mplug")


if __name__ == "__main__":
    main()
