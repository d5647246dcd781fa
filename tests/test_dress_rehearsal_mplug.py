"""Synthetic full-dress rehearsal of the mPLUG real-data pipeline.

Fabricates the reference mPLUG annotation contract — COCO-style image files
on disk, `vqa_train.json`-shaped records ({image, question, answer: [str],
bias}, `mPLUG/dataset/vqa_dataset.py:82-109`), a test file with
question_ids, `answer_list.json`, and a `cal_metric` label file
(`mPLUG/vqa_mplug.py:289-303`) — then runs the mPLUG CLI end-to-end with
the real WordPiece tokenizer and REAL image decoding + train-time
augmentation (PIL + RandomResizedCrop/HFlip/RandAugment), mask mode, beam
eval with decode-to-text, and `cal_metric` scoring. Also exercises the
OCR/object question splicing flags. After this, an mPLUG data drop is
config-only.
"""
import json

import numpy as np
import pytest

from crvqa_tpu.evals.scoring import cal_metric

ANSWERS = ["yes", "no", "red", "blue", "dog", "cat"]
WORDS = ("is this a what color the dog cat red blue yes no stop sign").split()


def _fabricate(root, n_train=16, n_test=8, seed=5):
    from PIL import Image

    rng = np.random.default_rng(seed)
    (root / "imgs").mkdir(parents=True)
    names = []
    for i in range(4):
        arr = rng.integers(0, 255, size=(48, 48, 3), dtype=np.uint8)
        name = f"imgs/COCO_{i:03d}.jpg"
        Image.fromarray(arr).save(root / name)
        names.append(name)

    # toy vocab: every question/answer word tokenizes without [UNK]
    tokens = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
              + sorted(set(WORDS)) + ["?", "##s"])
    with open(root / "vocab.txt", "w") as f:
        f.write("\n".join(tokens) + "\n")
    assert len(tokens) <= 128  # tiny config vocab bound

    def records(n, with_answers, qid0):
        out = []
        for i in range(n):
            subj = ["dog", "cat"][i % 2]
            rec = {"image": names[i % len(names)],
                   "question": f"Is this a {subj}?",
                   "question_id": qid0 + i}
            if with_answers:
                # raw human answer lists WITH duplicates + aligned bias
                ans = [str(rng.choice(ANSWERS)) for _ in range(3)]
                rec["answer"] = ans
                rec["bias"] = [float(rng.random() * 0.5) for _ in ans]
            else:
                rec["answer"] = [str(rng.choice(ANSWERS))]
            if i % 3 == 0:  # OCR/object splicing records (vqa_dataset.py:57-70)
                rec["ocr"] = [[0, "stop"], [1, "sign"]]
                rec["object_label"] = "dog&&sign"
            out.append(rec)
        return out

    with open(root / "vqa_train.json", "w") as f:
        json.dump(records(n_train, True, 100), f)
    test_records = records(n_test, False, 900)
    with open(root / "vqa_test.json", "w") as f:
        json.dump(test_records, f)
    with open(root / "answer_list.json", "w") as f:
        json.dump(ANSWERS, f)
    # cal_metric label file: {question_id, label: {answer: score}}
    labels = [{"question_id": r["question_id"],
               "label": {r["answer"][0]: 1.0, "yes": 0.3}}
              for r in test_records]
    with open(root / "vqa_test_labels.json", "w") as f:
        json.dump(labels, f)


@pytest.mark.slow
def test_mplug_dress_rehearsal(tmp_path):
    from crvqa_tpu.cli import vqa_mplug
    from crvqa_tpu.data.tokenization import WordPieceTokenizer

    _fabricate(tmp_path)
    out = tmp_path / "mplug"
    vqa_mplug.main([
        "--output_dir", str(out), "--tiny", "--mode", "mask",
        "--zero_rate", "0.5",
        "--train_files", str(tmp_path / "vqa_train.json"),
        "--test_files", str(tmp_path / "vqa_test.json"),
        "--vqa_root", str(tmp_path),
        "--vocab_file", str(tmp_path / "vocab.txt"),
        "--add_ocr", "true", "--add_object", "true", "--augment", "true",
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--logging_steps", "2",
        "--masker_update_step", "2", "--save_steps", "4",
        "--warmup_steps", "1", "--dtype", "float32", "--beam_size", "3",
        "--max_answer_len", "6", "--do_train", "--do_predict", "--seed", "0",
    ])
    assert (out / "mask.pt").exists()
    preds = json.load(open(out / "vqa_result.json"))
    # every test question answered exactly once, decoded to TEXT via the
    # real tokenizer (qids preserved from the annotation file)
    assert sorted(p["question_id"] for p in preds) == list(range(900, 908))
    vocab_words = set(WORDS) | {"?", "s", ""}
    for p in preds:
        assert isinstance(p["answer"], str)
        for w in p["answer"].replace("?", " ").split():
            assert w in vocab_words, p["answer"]

    score = cal_metric(preds, str(tmp_path / "vqa_test_labels.json"))
    assert 0.0 <= score <= 1.0

    # the decode special ids were synced from the custom vocab (CLS/SEP/PAD
    # are 2/3/0 here, not bert-base's 101/102/0)
    tok = WordPieceTokenizer(vocab_file=str(tmp_path / "vocab.txt"))
    assert (tok.cls_token_id, tok.sep_token_id, tok.pad_token_id) == (2, 3, 0)


@pytest.mark.slow
def test_mplug_rank_eval_rehearsal(tmp_path):
    """--eval_method rank through the CLI on the same fabricated contract:
    real answer_list.json tokenized with the reference's appended-eos rows
    (vqa_mplug.py:231-232), first-token top-k shortlist + chain-rule
    re-rank (rank_answer, model_vqa_mplug.py:188-245), answers mapped back
    to list strings, cal_metric scoring."""
    import json

    from crvqa_tpu.cli import vqa_mplug

    _fabricate(tmp_path)
    out = tmp_path / "mplug_rank"
    vqa_mplug.main([
        "--output_dir", str(out), "--tiny", "--mode", "mask",
        "--zero_rate", "0.5",
        "--train_files", str(tmp_path / "vqa_train.json"),
        "--test_files", str(tmp_path / "vqa_test.json"),
        "--vqa_root", str(tmp_path),
        "--vocab_file", str(tmp_path / "vocab.txt"),
        "--train_batch_size", "8", "--eval_batch_size", "8",
        "--num_train_epochs", "1", "--warmup_steps", "1",
        "--dtype", "float32", "--max_answer_len", "6",
        "--eval_method", "rank",
        "--answer_list", str(tmp_path / "answer_list.json"),
        "--k_test", "3",
        "--do_predict", "--seed", "0",
    ])
    preds = json.load(open(out / "vqa_result.json"))
    assert sorted(p["question_id"] for p in preds) == list(range(900, 908))
    # ranked answers are exact answer-list strings, scorable by cal_metric
    assert all(p["answer"] in ANSWERS for p in preds)
    score = cal_metric(preds, str(tmp_path / "vqa_test_labels.json"))
    assert 0.0 <= score <= 1.0
