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

from .vqacp import VQAEntries, entries_from_qa

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
    # shared tokenize/tensorize with the VQA-CP loader (vqacp.entries_from_qa)
    return entries_from_qa(questions, answers, tokenizer, ans_num, seed)
