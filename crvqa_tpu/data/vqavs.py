"""VQA-VS dataset variant (`dataset_LXM_VQAvs.py`).

Same pipeline as VQA-CP v2 with different file names: per-split question
JSONs (Training-Ques.json / Val-Ques.json / IID-Test-Ques.json), split target
pickles, and a train_val_test answer vocabulary. Scoring goes through
`crvqa_tpu.evals.compute_vqavs_scores` (9 OOD splits + Final_Score).
"""
from __future__ import annotations

import json
import os
import pickle
from typing import Optional

import numpy as np

from .vqacp import VQAEntries, tokenize_questions

VQAVS_QUESTION_FILES = {
    "train": "Training-Ques.json",
    "val": "Val-Ques.json",
    "test": "IID-Test-Ques.json",
}


def load_answer_vocab(dataroot: str) -> tuple[dict, list]:
    with open(os.path.join(dataroot, "cache", "train_val_test_ans2label.pkl"),
              "rb") as f:
        ans2label = pickle.load(f)
    with open(os.path.join(dataroot, "cache", "train_val_test_label2ans.pkl"),
              "rb") as f:
        label2ans = pickle.load(f)
    return ans2label, label2ans


def load_entries(dataroot: str, split: str, tokenizer, ans_num: int,
                 seed: int = 0) -> VQAEntries:
    assert split in VQAVS_QUESTION_FILES
    with open(os.path.join(dataroot, VQAVS_QUESTION_FILES[split])) as f:
        payload = json.load(f)
    questions = payload["questions"] if isinstance(payload, dict) else payload
    questions = sorted(questions, key=lambda x: x["question_id"])
    with open(os.path.join(dataroot, "cache", f"{split}_target.pkl"), "rb") as f:
        answers = sorted(pickle.load(f), key=lambda x: x["question_id"])[
            : len(questions)]
    assert len(questions) == len(answers)

    n = len(questions)
    input_ids, lengths = tokenize_questions(
        [q["question"] for q in questions], tokenizer)
    labels = np.zeros((n, ans_num), np.float32)
    max_label = np.zeros(n, np.int32)
    qtypes = []
    rng = np.random.RandomState(seed)
    for i, (q, a) in enumerate(zip(questions, answers)):
        assert q["question_id"] == a["question_id"]
        qtypes.append(a.get("question_type", ""))
        lab = a.get("labels")
        sco = a.get("scores")
        if lab is not None and len(lab):
            lab = np.asarray(lab, np.int64)
            sco = np.asarray(sco, np.float32)
            labels[i, lab] = sco
            max_label[i] = int(lab[int(np.argmax(sco))])
        else:
            max_label[i] = rng.randint(0, ans_num)
    return VQAEntries(
        input_ids=input_ids,
        lengths=lengths,
        image_ids=np.asarray([str(q["image_id"]) for q in questions]),
        question_ids=np.asarray([q["question_id"] for q in questions], np.int64),
        labels=labels,
        max_label=max_label,
        question_types=qtypes,
    )
