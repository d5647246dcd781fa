#!/usr/bin/env python
"""Data-drop gate: fail-fast validation of an on-disk VQA-CP / VQA-VS /
mPLUG data layout BEFORE any training run touches it.

The RUNBOOK's real-data recipes assume well-formed files; the first real
drop is the riskiest remaining event (VERDICT r3 #6). This gate checks file
presence, pickle/JSON schemas, answer-space sizes, feature shapes, and
question-id alignment — each failure names the file, the defect, and the
consumer that would break (reference contract: `dataset_LXM.py:103-289`,
`dataset_LXM_VQAvs.py`, `comput_score.py:20-23`, `mPLUG/dataset/vqa_dataset.py`).

Usage:
  python scripts/check_data_drop.py --task vqacp --dataroot DIR --img_root FEATS.pickle [--vocab_file V]
  python scripts/check_data_drop.py --task vqavs --dataroot DIR --img_root FEATS.pickle
  python scripts/check_data_drop.py --task mplug --train_files A.json [...] --test_file T.json \
      --answer_list answer_list.json [--vqa_root IMG_DIR]

Exit 0 = launch-ready; exit 1 = problems printed, one per line.
Pure stdlib + numpy (torch only for the .pth annotation file, optional).
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np


class Problems(list):
    def add(self, path: str, msg: str, consumer: str) -> None:
        self.append(f"{path}: {msg}  [breaks {consumer}]")


def _load_json(path: str, problems: Problems, consumer: str):
    if not os.path.exists(path):
        problems.add(path, "missing file", consumer)
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, UnicodeDecodeError) as e:
        problems.add(path, f"unparseable JSON ({e})", consumer)
        return None


def _load_pickle(path: str, problems: Problems, consumer: str):
    if not os.path.exists(path):
        problems.add(path, "missing file", consumer)
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception as e:  # truncated/corrupt pickles raise many types
        problems.add(path, f"unreadable pickle ({type(e).__name__}: {e})",
                     consumer)
        return None


def _check_questions(path: str, problems: Problems) -> dict:
    """Question JSON: list (or {'questions': list}) of
    {question_id, image_id, question}; unique qids."""
    payload = _load_json(path, problems, "data.vqacp.load_entries")
    if payload is None:
        return {}
    questions = payload.get("questions") if isinstance(payload, dict) \
        else payload
    if not isinstance(questions, list) or not questions:
        problems.add(path, "expected a non-empty list of question records",
                     "data.vqacp.load_entries")
        return {}
    qids = {}
    for i, q in enumerate(questions):
        missing = [k for k in ("question_id", "image_id", "question")
                   if k not in q]
        if missing:
            problems.add(path, f"record {i} missing keys {missing}",
                         "data.vqacp.load_entries")
            continue
        if q["question_id"] in qids:
            problems.add(path, f"duplicate question_id {q['question_id']}",
                         "evals.scoring (qid-keyed pairing)")
        qids[q["question_id"]] = str(q["image_id"])
    return qids


def _check_targets(path: str, qids: dict, ans_num: int,
                   problems: Problems) -> None:
    """target.pkl: per-question {question_id, labels, scores,
    question_type}; labels in [0, ans_num); aligned with the question set."""
    targets = _load_pickle(path, problems, "data.vqacp.load_entries")
    if targets is None:
        return
    seen = set()
    for i, t in enumerate(targets):
        missing = [k for k in ("question_id", "labels", "scores",
                               "question_type") if k not in t]
        if missing:
            problems.add(path, f"record {i} missing keys {missing}",
                         "soft-target scatter (dataset_LXM.py:278-280)")
            continue
        seen.add(t["question_id"])
        labels = np.asarray(t["labels"] if t["labels"] is not None else [])
        scores = np.asarray(t["scores"] if t["scores"] is not None else [])
        if labels.size != scores.size:
            problems.add(path, f"qid {t['question_id']}: {labels.size} labels"
                         f" vs {scores.size} scores",
                         "soft-target scatter")
        if labels.size and (labels.min() < 0 or labels.max() >= ans_num):
            problems.add(path, f"qid {t['question_id']}: label "
                         f"{int(labels.max())} outside answer space "
                         f"[0,{ans_num})", "target.scatter_ / one-hot labels")
        if scores.size and (scores.min() < 0 or scores.max() > 1.0 + 1e-6):
            problems.add(path, f"qid {t['question_id']}: scores outside "
                         "[0,1]", "VQA soft accuracy")
    if qids:
        if seen - set(qids):
            problems.add(path, f"{len(seen - set(qids))} target qids have no "
                         "question record (e.g. "
                         f"{sorted(seen - set(qids))[:3]})",
                         "load_entries qid alignment")
        if set(qids) - seen:
            problems.add(path, f"{len(set(qids) - seen)} questions have no "
                         f"target (e.g. {sorted(set(qids) - seen)[:3]})",
                         "load_entries qid alignment")


def _check_answer_vocab(cache_dir: str, names: tuple, problems: Problems
                        ) -> int:
    a2l_path = os.path.join(cache_dir, names[0])
    l2a_path = os.path.join(cache_dir, names[1])
    ans2label = _load_pickle(a2l_path, problems, "answer-space sizing")
    label2ans = _load_pickle(l2a_path, problems, "make_json answer strings")
    if ans2label is None or label2ans is None:
        return 0
    n = len(label2ans)
    if len(ans2label) != n:
        problems.add(a2l_path, f"{len(ans2label)} answers vs {n} in "
                     f"{names[1]}", "answer-space sizing")
    if sorted(ans2label.values()) != list(range(len(ans2label))):
        problems.add(a2l_path, "label ids not contiguous 0..N-1",
                     "classifier head width")
    bad = [a for a, i in ans2label.items()
           if i < n and label2ans[i] != a]
    if bad:
        problems.add(a2l_path, f"{len(bad)} entries disagree with "
                     f"{names[1]} (e.g. {bad[:3]})", "make_json")
    return n


def _check_features(path: str, qids_by_split: dict, problems: Problems
                    ) -> None:
    """Feature pickle: {image_id: {'feats': [B, D], 'sp_feats': [B, 4]}};
    every referenced image present; consistent shapes."""
    if path.endswith(".bin") or path.endswith(".fst"):
        # native feature-store format has its own header validation
        if not os.path.exists(path):
            problems.add(path, "missing feature store", "ImageFeatures")
        return
    feats = _load_pickle(path, problems, "ImageFeatures.lookup")
    if feats is None:
        return
    dims = set()
    for k, v in feats.items():
        if "feats" not in v or "sp_feats" not in v:
            problems.add(path, f"image {k} missing feats/sp_feats",
                         "ImageFeatures.lookup")
            continue
        f = np.asarray(v["feats"])
        s = np.asarray(v["sp_feats"])
        if f.ndim != 2 or s.ndim != 2:
            problems.add(path, f"image {k}: feats {f.shape} / sp {s.shape} "
                         "not rank-2", "fixed-shape batch assembly")
            continue
        if s.shape[1] != 4:
            problems.add(path, f"image {k}: sp_feats dim {s.shape[1]} != 4",
                         "visual_pos input (LxmertConfig.visual_pos_dim)")
        if f.shape[0] != s.shape[0]:
            problems.add(path, f"image {k}: {f.shape[0]} boxes vs "
                         f"{s.shape[0]} spatials", "batch assembly")
        dims.add(f.shape[1])
    if len(dims) > 1:
        problems.add(path, f"inconsistent feature dims {sorted(dims)}",
                     "one static XLA compile per shape")
    for split, qids in qids_by_split.items():
        missing = {im for im in qids.values() if str(im) not in feats}
        if missing:
            problems.add(path, f"{len(missing)} {split} images absent "
                         f"(e.g. {sorted(missing)[:3]})",
                         "ImageFeatures.lookup KeyError at step time")


def _check_target_count(dataroot: str, test_qids: dict, problems: Problems
                        ) -> None:
    """test_target_count.pth: offline-scorer annotations
    (comput_score.py:20-23); accepted at <dataroot>/ or <dataroot>/cache/."""
    cands = [os.path.join(dataroot, "test_target_count.pth"),
             os.path.join(dataroot, "cache", "test_target_count.pth")]
    path = next((p for p in cands if os.path.exists(p)), None)
    if path is None:
        problems.add(cands[0], "missing (also looked in cache/)",
                     "evals.scoring offline accuracy")
        return
    try:
        from crvqa_tpu.core.torch_compat import load_torch_pickle

        anno = load_torch_pickle(path)
    except ImportError:
        print(f"note: torch unavailable; skipped schema check of {path}")
        return
    except Exception as e:
        problems.add(path, f"unreadable ({type(e).__name__}: {e})",
                     "evals.scoring")
        return
    seen = set()
    for i, a in enumerate(anno):
        missing = [k for k in ("question_id", "answers_word", "answer_count",
                               "answer_type") if k not in a]
        if missing:
            problems.add(path, f"record {i} missing keys {missing}",
                         "cal_metric breakdown")
            continue
        seen.add(a["question_id"])
    if test_qids and seen != set(test_qids):
        problems.add(path, f"annotation qids != test question qids "
                     f"({len(seen ^ set(test_qids))} mismatched)",
                     "qid-keyed scoring")


def _check_vocab(path: str, problems: Problems) -> None:
    if not os.path.exists(path):
        problems.add(path, "missing vocab file", "WordPiece tokenizer")
        return
    toks = [t for t in open(path, encoding="utf-8").read().split("\n") if t]
    for special in ("[PAD]", "[UNK]", "[CLS]", "[SEP]"):
        if special not in toks:
            problems.add(path, f"missing special token {special}",
                         "tokenization (fixed-14 contract)")
    if len(set(toks)) != len(toks):
        problems.add(path, "duplicate vocab entries", "token-id stability")


def check_vqacp(dataroot: str, img_root: str, vocab_file: str = None
                ) -> Problems:
    problems = Problems()
    qids = {}
    for split in ("train", "test"):
        qids[split] = _check_questions(
            os.path.join(dataroot, f"vqacp_v2_{split}_questions.json"),
            problems)
    ans_num = _check_answer_vocab(
        os.path.join(dataroot, "cache"),
        ("train_test_ans2label.pkl", "train_test_label2ans.pkl"), problems)
    for split in ("train", "test"):
        _check_targets(os.path.join(dataroot, "cache",
                                    f"{split}_target.pkl"),
                       qids[split], ans_num or 1 << 30, problems)
    if img_root:
        _check_features(img_root, qids, problems)
    _check_target_count(dataroot, qids["test"], problems)
    if vocab_file:
        _check_vocab(vocab_file, problems)
    return problems


def check_vqavs(dataroot: str, img_root: str, vocab_file: str = None
                ) -> Problems:
    problems = Problems()
    names = {"train": "Training-Ques.json", "val": "Val-Ques.json",
             "test": "IID-Test-Ques.json"}
    qids = {}
    for split, fname in names.items():
        path = os.path.join(dataroot, fname)
        if split == "val" and not os.path.exists(path):
            # val is optional: the shipped pipeline trains on Training-Ques
            # and scores IID-Test + the 9 OOD splits
            names = {k: v for k, v in names.items() if k != "val"}
            continue
        qids[split] = _check_questions(path, problems)
    ans_num = _check_answer_vocab(
        os.path.join(dataroot, "cache"),
        ("train_val_test_ans2label.pkl", "train_val_test_label2ans.pkl"),
        problems)
    for split in names:
        _check_targets(os.path.join(dataroot, "cache",
                                    f"{split}_target.pkl"),
                       qids[split], ans_num or 1 << 30, problems)
    if img_root:
        _check_features(img_root, qids, problems)
    if vocab_file:
        _check_vocab(vocab_file, problems)
    return problems


def check_mplug(train_files: list, test_file: str, answer_list: str,
                vqa_root: str = "", sample_images: int = 32) -> Problems:
    problems = Problems()
    records_by_file = {}
    for path in list(train_files) + [test_file]:
        payload = _load_json(path, problems, "mplug_data.vqa_dataset")
        if payload is None:
            continue
        if not isinstance(payload, list) or not payload:
            problems.add(path, "expected a non-empty list of records",
                         "mplug_data.vqa_dataset")
            continue
        records_by_file[path] = payload
        for i, r in enumerate(payload):
            missing = [k for k in ("image", "question") if k not in r]
            if missing:
                problems.add(path, f"record {i} missing keys {missing}",
                             "mplug_data.vqa_dataset")
            for aligned in ("weights", "bias"):
                if "answer" in r and aligned in r and \
                        len(r["answer"]) != len(np.atleast_1d(r[aligned])):
                    problems.add(
                        path, f"record {i}: {len(r['answer'])} answers vs "
                        f"{len(np.atleast_1d(r[aligned]))} {aligned}",
                        "per-answer alignment through dedup "
                        "(mplug_data.vqa_dataset)")
    answers = _load_json(answer_list, problems, "rank-mode candidates")
    if answers is not None and (not isinstance(answers, list) or
                                not all(isinstance(a, str) for a in answers)):
        problems.add(answer_list, "expected a JSON list of answer strings",
                     "rank_answers candidate list")
    if vqa_root:
        checked = 0
        for path, records in records_by_file.items():
            for r in records[:max(1, sample_images // max(
                    1, len(records_by_file)))]:
                img = os.path.join(vqa_root, r.get("image", ""))
                if not os.path.exists(img):
                    problems.add(img, f"image referenced by {path} missing",
                                 "image decode at step time")
                checked += 1
                if checked >= sample_images:
                    break
    return problems


def main(argv=None) -> int:
    p = argparse.ArgumentParser("check_data_drop")
    p.add_argument("--task", choices=["vqacp", "vqavs", "mplug"],
                   default="vqacp")
    p.add_argument("--dataroot", type=str, default=None)
    p.add_argument("--img_root", type=str, default=None)
    p.add_argument("--vocab_file", type=str, default=None)
    p.add_argument("--train_files", type=str, nargs="*", default=[])
    p.add_argument("--test_file", type=str, default=None)
    p.add_argument("--answer_list", type=str, default=None)
    p.add_argument("--vqa_root", type=str, default="")
    args = p.parse_args(argv)

    if args.task == "mplug":
        if not (args.train_files and args.test_file and args.answer_list):
            p.error("--task mplug needs --train_files --test_file "
                    "--answer_list")
        problems = check_mplug(args.train_files, args.test_file,
                               args.answer_list, args.vqa_root)
    else:
        if not args.dataroot:
            p.error(f"--task {args.task} needs --dataroot")
        fn = check_vqacp if args.task == "vqacp" else check_vqavs
        problems = fn(args.dataroot, args.img_root, args.vocab_file)

    if problems:
        print(f"DATA DROP NOT READY — {len(problems)} problem(s):")
        for line in problems:
            print("  " + line)
        return 1
    print("data drop OK — launch-ready")
    return 0


if __name__ == "__main__":
    sys.exit(main())
