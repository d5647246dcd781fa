"""Synthetic full-dress rehearsal of the real-data pipeline (VERDICT r2 #5).

Fabricates the reference's ACTUAL on-disk file formats —
`vqacp_v2_<split>_questions.json`, `cache/<split>_target.pkl`,
`cache/train_test_{ans2label,label2ans}.pkl`, the image-feature pickle, and
`test_target_count.pth` (`dataset_LXM.py:118-289`, `comput_score.py:20-23`)
— then runs stage-1 -> stage-2 -> stage-3 through the CLIs WITH the real
WordPiece tokenizer (no synthetic token ids anywhere), scores the final
predictions with `evals/scoring.py`, and runs the reference's own
`comput_score.py` under torch on the same files, asserting identical
numbers. After this, a real VQA-CP data drop is config-only.
"""
import json
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

ANSWERS = ["yes", "no", "0", "1", "2", "3", "red", "blue", "green", "dog",
           "cat", "frisbee", "kitchen", "man", "woman", "table"]
ANSWER_TYPE = {"yes": "yes/no", "no": "yes/no",
               "0": "number", "1": "number", "2": "number", "3": "number"}
TEMPLATES = [
    ("is this", "Is this a {}?"),
    ("what color is the", "What color is the {}?"),
    ("how many", "How many {}s are there?"),
    ("what is on the", "What is on the table, a {}?"),
]
WORDS = ("is this a what color the how many are there on table dog cat "
         "frisbee kitchen man woman red blue green yes no s").split()


def _fabricate(root, n_train=32, n_test=20, seed=0):
    rng = np.random.default_rng(seed)
    (root / "cache").mkdir(parents=True)
    ans2label = {a: i for i, a in enumerate(ANSWERS)}
    with open(root / "cache" / "train_test_ans2label.pkl", "wb") as f:
        pickle.dump(ans2label, f)
    with open(root / "cache" / "train_test_label2ans.pkl", "wb") as f:
        pickle.dump(ANSWERS, f)

    # vocab.txt: specials + the exact lowercase words of the question
    # templates + '##s' (plurals) + punctuation/digits — small enough for
    # the tiny config's 128-entry embedding, rich enough that no live
    # question token maps to [UNK]
    tokens = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
              + sorted(set(WORDS) | {a for a in ANSWERS if a.isalpha()})
              + ["##s"] + list("0123?,."))
    vocab = {t: i for i, t in enumerate(tokens)}
    with open(root / "vocab.txt", "w") as f:
        f.write("\n".join(tokens) + "\n")
    assert len(vocab) <= 128  # tiny config vocab bound

    images = [f"10{i}" for i in range(6)]
    feats = {im: {"feats": rng.normal(size=(8, 16)).astype(np.float32),
                  "sp_feats": rng.random((8, 4)).astype(np.float32)}
             for im in images}
    with open(root / "vqa_img_feature_trainval.pickle", "wb") as f:
        pickle.dump(feats, f)

    def make_split(split, n, qid0):
        questions, targets, counts = [], [], []
        for i in range(n):
            qtype, template = TEMPLATES[i % len(TEMPLATES)]
            subj = ANSWERS[9 + (i % 4)]  # dog/cat/frisbee/kitchen
            ans_idx = rng.choice(len(ANSWERS), size=2, replace=False)
            # VQA soft scores: 10 annotators -> count/3 capped at 1
            c1, c2 = int(rng.integers(1, 7)), int(rng.integers(1, 4))
            questions.append({"question_id": qid0 + i,
                              "image_id": images[i % len(images)],
                              "question": template.format(subj)})
            targets.append({
                # image_id is part of the real target.pkl contract: the
                # reference loader pops + cross-checks it
                # (dataset_LXM.py:105,149)
                "question_id": qid0 + i, "image_id": images[i % len(images)],
                "question_type": qtype,
                "labels": [int(a) for a in ans_idx],
                "scores": [min(1.0, c1 / 3.0), min(1.0, c2 / 3.0)],
            })
            w1, w2 = ANSWERS[ans_idx[0]], ANSWERS[ans_idx[1]]
            counts.append({
                "question_id": qid0 + i,
                "answers_word": [w1, w2],
                "answer_count": {w1: c1, w2: c2},
                "answer_type": ANSWER_TYPE.get(w1, "other"),
            })
        with open(root / f"vqacp_v2_{split}_questions.json", "w") as f:
            json.dump(questions, f)
        with open(root / "cache" / f"{split}_target.pkl", "wb") as f:
            pickle.dump(targets, f)
        return counts

    make_split("train", n_train, 1000)
    test_counts = make_split("test", n_test, 5000)
    import torch

    torch.save(test_counts, root / "cache" / "test_target_count.pth")


def _ref_comput_score(pred_path, cache_dir):
    """Run the reference's own scorer and parse its printed numbers."""
    proc = subprocess.run(
        [sys.executable, "/root/reference/comput_score.py",
         "--input", str(pred_path), "--name", "test",
         "--dataroot", str(cache_dir)],
        capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr
    out = proc.stdout
    overall = float(re.search(r"score: ([\d.]+)", out).group(1))
    m = re.search(r"Yes/No: ([\d.]+) Num: ([\d.]+)\s*,?\s*other: ([\d.]+)",
                  out)
    return overall, float(m.group(1)), float(m.group(2)), float(m.group(3))


@pytest.mark.slow
def test_full_dress_rehearsal(tmp_path):
    from crvqa_tpu.cli import prune_debias_vqa, run_vqa_stage1, run_vqa_stage3
    from crvqa_tpu.evals.scoring import score_prediction_file

    _fabricate(tmp_path)
    data_flags = [
        "--dataroot", str(tmp_path),
        "--img_root", str(tmp_path / "vqa_img_feature_trainval.pickle"),
        "--vocab_file", str(tmp_path / "vocab.txt"),
    ]
    common_flags = [
        "--tiny", *data_flags, "--train_batch_size", "8",
        "--eval_batch_size", "8", "--num_train_epochs", "1",
        "--logging_steps", "2", "--save_steps", "4", "--warmup_steps", "0",
        "--dtype", "float32", "--do_train", "--do_eval",
        "--evaluate_during_training", "--seed", "0", "--data_ratio", "1.0",
    ]
    s1, s2, s3 = tmp_path / "s1", tmp_path / "s2", tmp_path / "s3"

    run_vqa_stage1.main(["--output_dir", str(s1), "--FT_type", "normal",
                         "--label4save", "t", *common_flags])
    assert (s1 / "t_FTonly.bin").exists()

    prune_debias_vqa.main([
        "--output_dir", str(s2), "--Masker_type", "lmh",
        "--stage1_ckpt", str(s1 / "t_FTonly.bin"),
        "--Lang_comp", "0.3", "--Vis_comp", "0.3", "--Fus_comp", "0.3",
        "--zero_rate", "0.7", "--controlled_init", "magnitude",
        *common_flags])
    assert (s2 / "mask.pt").exists()

    run_vqa_stage3.main([
        "--output_dir", str(s3), "--FT_type", "normal",
        "--training_type", "FT_trainedMask",
        "--stage1_ckpt", str(s1 / "t_FTonly.bin"),
        "--mask_pt", str(s2 / "mask.pt"),
        "--classifier_bin", str(s2 / "classifier4masker.bin"),
        "--label4save", "t", *common_flags])

    for stage_dir in (s2, s3):
        preds = json.load(open(stage_dir / "test.json"))
        assert len(preds) == 20  # every test question answered exactly once
        assert all(p["answer"] in ANSWERS for p in preds)

        ours = score_prediction_file(
            str(stage_dir / "test.json"),
            str(tmp_path / "cache" / "test_target_count.pth"))
        ref_overall, ref_yn, ref_num, ref_other = _ref_comput_score(
            stage_dir / "test.json", tmp_path / "cache")
        assert ours["overall"] == ref_overall
        assert ours["yes/no"] == ref_yn
        assert ours["number"] == ref_num
        assert ours["other"] == ref_other
