"""Synthetic full-dress rehearsal of the VQA-VS real-data pipeline.

Companion to test_dress_rehearsal.py for the VQA-VS track: fabricates the
reference's VQA-VS on-disk contract — `Training-Ques.json` /
`IID-Test-Ques.json`, `cache/<split>_target.pkl`,
`cache/train_val_test_{ans2label,label2ans}.pkl`
(`dataset_LXM_VQAvs.py:118-289`), and the `VQAvs_test_annotations.json`
payload `comput_vqavs_score.py:121-135` reads from its CWD — then runs the
stage-2 VQA-VS CLI WITH the real WordPiece tokenizer and asserts our
`compute_vqavs_scores` reproduces every number the reference's own scorer
prints (Final_Score + IID + the 9 OOD splits) on the produced
`prefictions_VQAvs_test.json`.
"""
import json
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

from test_dress_rehearsal import ANSWERS, ANSWER_TYPE, TEMPLATES, WORDS

from crvqa_tpu.evals.scoring import VQAVS_SPLITS, compute_vqavs_scores


def _fabricate(root, n_train=32, n_test=24, seed=3):
    rng = np.random.default_rng(seed)
    (root / "cache").mkdir(parents=True)
    ans2label = {a: i for i, a in enumerate(ANSWERS)}
    with open(root / "cache" / "train_val_test_ans2label.pkl", "wb") as f:
        pickle.dump(ans2label, f)
    with open(root / "cache" / "train_val_test_label2ans.pkl", "wb") as f:
        pickle.dump(ANSWERS, f)

    tokens = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
              + sorted(set(WORDS) | {a for a in ANSWERS if a.isalpha()})
              + ["##s"] + list("0123?,."))
    with open(root / "vocab.txt", "w") as f:
        f.write("\n".join(tokens) + "\n")

    images = [f"20{i}" for i in range(5)]
    feats = {im: {"feats": rng.normal(size=(8, 16)).astype(np.float32),
                  "sp_feats": rng.random((8, 4)).astype(np.float32)}
             for im in images}
    with open(root / "vqa_img_feature_trainval.pickle", "wb") as f:
        pickle.dump(feats, f)

    def make_split(split, fname, n, qid0):
        questions, targets, annos = [], [], []
        for i in range(n):
            qtype, template = TEMPLATES[i % len(TEMPLATES)]
            subj = ANSWERS[9 + (i % 4)]
            ans_idx = rng.choice(len(ANSWERS), size=2, replace=False)
            c1, c2 = int(rng.integers(1, 7)), int(rng.integers(1, 4))
            questions.append({"question_id": qid0 + i,
                              "image_id": images[i % len(images)],
                              "question": template.format(subj)})
            targets.append({
                "question_id": qid0 + i, "question_type": qtype,
                "labels": [int(a) for a in ans_idx],
                "scores": [min(1.0, c1 / 3.0), min(1.0, c2 / 3.0)],
            })
            w1, w2 = ANSWERS[ans_idx[0]], ANSWERS[ans_idx[1]]
            annos.append({
                "question_id": qid0 + i,
                "answers_word": [w1, w2],
                "answer_count": {w1: c1, w2: c2},
                "answer_type": ANSWER_TYPE.get(w1, "other"),
            })
        with open(root / fname, "w") as f:
            json.dump(questions, f)
        with open(root / "cache" / f"{split}_target.pkl", "wb") as f:
            pickle.dump(targets, f)
        return annos

    make_split("train", "Training-Ques.json", n_train, 1000)
    test_annos = make_split("test", "IID-Test-Ques.json", n_test, 7000)
    # the official annotation payload: annotations + the 9 overlapping OOD
    # split qid lists (comput_vqavs_score.py:121-135)
    payload = {"annotations": test_annos}
    for s in VQAVS_SPLITS:
        payload[f"{s}_qid"] = [7000 + int(i) for i in
                               rng.choice(n_test, size=n_test // 2,
                                          replace=False)]
    with open(root / "VQAvs_test_annotations.json", "w") as f:
        json.dump(payload, f)
    return payload


def _ref_vqavs_score(pred_path, cwd):
    """Run the reference's own VQA-VS scorer (reads
    VQAvs_test_annotations.json from its CWD) and parse all 11 numbers."""
    proc = subprocess.run(
        [sys.executable, "/root/reference/comput_vqavs_score.py",
         "--input", str(pred_path)],
        capture_output=True, text=True, timeout=300, cwd=str(cwd))
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    final = float(re.search(r"Final_Score[^\t]*\t\s*([\d.]+)", out).group(1))
    tail = re.search(r"iid_score ([\d.]+)" + "".join(
        rf" {s}_score ([\d.]+)" for s in VQAVS_SPLITS), out)
    assert tail, out
    return final, [float(g) for g in tail.groups()]


@pytest.mark.slow
def test_vqavs_dress_rehearsal(tmp_path):
    from crvqa_tpu.cli import prune_debias_vqavs

    payload = _fabricate(tmp_path)
    out = tmp_path / "s2vs"
    prune_debias_vqavs.main([
        "--output_dir", str(out), "--tiny",
        "--dataroot", str(tmp_path),
        "--img_root", str(tmp_path / "vqa_img_feature_trainval.pickle"),
        "--vocab_file", str(tmp_path / "vocab.txt"),
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--save_steps", "4", "--warmup_steps", "0", "--dtype", "float32",
        "--Masker_type", "lmh", "--zero_rate", "0.7",
        "--Lang_comp", "0.3", "--Vis_comp", "0.3", "--Fus_comp", "0.3",
        "--controlled_init", "magnitude", "--do_train", "--do_eval",
        "--evaluate_during_training", "--seed", "0", "--data_ratio", "1.0"])

    pred_path = out / "prefictions_VQAvs_test.json"
    preds = json.load(open(pred_path))
    assert len(preds) == 24
    assert all(p["answer"] in ANSWERS for p in preds)

    ours = compute_vqavs_scores(preds, payload)
    ref_final, ref_scores = _ref_vqavs_score(pred_path, tmp_path)
    ref_iid, ref_splits = ref_scores[0], ref_scores[1:]
    assert ours["iid"] == ref_iid
    for s, want in zip(VQAVS_SPLITS, ref_splits):
        assert ours[s] == want, s
    assert round(ours["Final_Score"], 10) == round(ref_final, 10)
