"""Evaluation / prediction loop: accumulate logits, score, dump test.json.

Re-design of `_prediction_loop` + `make_json`
(`mask_trainer_Robust_VQA.py:487-496, 1096-1245`): the jitted eval step
returns per-batch logits (sharded over `data`); accumulation and the JSON
dump happen on host. Single-process, the all-gather the reference does via
`distributed_concat` / `xm.mesh_reduce` is just a host fetch of the global
array; under `jax.process_count() > 1` the logits shards are exchanged with
`host_all_gather` and the host-side fields (qids/labels/valid, local to each
process's loader shard) with `host_all_gather_local`, so EVERY process sees
the full prediction set (like the reference's distributed_concat) and
artifact writes are gated on process 0 by the drivers.
"""
from __future__ import annotations

import json
from typing import Callable, Iterable, Optional, Sequence

import numpy as np

from ..parallel.mesh import host_all_gather, host_all_gather_local


def predict(eval_step: Callable, state, batches: Iterable[dict],
            shard_fn: Optional[Callable] = None) -> dict:
    """Run eval_step over batches; returns logits/qids/labels stacked on host.

    Batches may be padded to a fixed size; a 'valid' bool vector marks real
    rows (fixed shapes keep XLA from recompiling on the ragged final batch).
    Multi-process: every process must iterate the SAME NUMBER of batches
    (its own loader shard of each global batch) — the gathers are
    collectives.
    """
    all_logits, all_qids, all_labels = [], [], []
    n_valid = 0
    for batch in batches:
        dev_batch = shard_fn(batch) if shard_fn is not None else batch
        logits = host_all_gather(eval_step(state, dev_batch))
        if "valid" in batch:
            valid = host_all_gather_local(np.asarray(batch["valid"]))
        else:
            valid = np.ones(logits.shape[0], bool)
        all_logits.append(logits[valid])
        if "question_id" in batch:
            all_qids.append(
                host_all_gather_local(np.asarray(batch["question_id"]))[valid])
        if "labels" in batch:
            all_labels.append(
                host_all_gather_local(np.asarray(batch["labels"]))[valid])
        n_valid += int(valid.sum())
    out = {"logits": np.concatenate(all_logits) if all_logits else np.zeros((0,))}
    if all_qids:
        out["question_id"] = np.concatenate(all_qids)
    if all_labels:
        out["labels"] = np.concatenate(all_labels)
    out["num_examples"] = n_valid
    return out


def vqa_accuracy(logits: np.ndarray, labels: np.ndarray) -> float:
    """100 * mean soft score of the argmax answer
    (`compute_score_with_logits` + the divide at
    mask_trainer_Robust_VQA.py:1230-1232)."""
    idx = np.argmax(logits, axis=1)
    return float(100.0 * labels[np.arange(len(idx)), idx].sum() / len(idx))


def make_json(logits: np.ndarray, qids: Sequence, label2ans: Sequence[str]
              ) -> list[dict]:
    """[{question_id, answer}] — the scorer contract
    (`make_json`, mask_trainer_Robust_VQA.py:487-496)."""
    idx = np.argmax(logits, axis=1)
    return [
        {"question_id": int(q), "answer": str(label2ans[int(i)])}
        for q, i in zip(qids, idx)
    ]


def dump_predictions(path: str, logits: np.ndarray, qids: Sequence,
                     label2ans: Sequence[str]) -> None:
    """Process-0-gated: after `predict`'s gathers every process holds the
    full prediction set; only one writes test.json."""
    import jax

    if jax.process_index() != 0:
        return
    with open(path, "w") as f:
        json.dump(make_json(logits, qids, label2ans), f)
