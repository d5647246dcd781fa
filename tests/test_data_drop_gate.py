"""Data-drop gate (scripts/check_data_drop.py): passes on the fabricated
rehearsal drops, fails helpfully on each seeded corruption (VERDICT r3 #6 —
the first real data drop should hit this gate, not a mid-run stack trace)."""
import json
import os
import pickle
import shutil
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from check_data_drop import check_mplug, check_vqacp, check_vqavs, main

from test_dress_rehearsal import _fabricate as fabricate_vqacp
from test_dress_rehearsal_mplug import _fabricate as fabricate_mplug
from test_dress_rehearsal_vqavs import _fabricate as fabricate_vqavs


@pytest.fixture()
def vqacp_drop(tmp_path):
    fabricate_vqacp(tmp_path)
    return tmp_path


def test_vqacp_drop_passes(vqacp_drop):
    problems = check_vqacp(str(vqacp_drop),
                           str(vqacp_drop / "vqa_img_feature_trainval.pickle"),
                           str(vqacp_drop / "vocab.txt"))
    assert problems == [], "\n".join(problems)
    # CLI surface: exit 0 + message
    rc = main(["--task", "vqacp", "--dataroot", str(vqacp_drop),
               "--img_root",
               str(vqacp_drop / "vqa_img_feature_trainval.pickle")])
    assert rc == 0


def test_vqavs_drop_passes(tmp_path):
    fabricate_vqavs(tmp_path)
    problems = check_vqavs(str(tmp_path),
                           str(tmp_path / "vqa_img_feature_trainval.pickle"))
    assert problems == [], "\n".join(problems)


def test_mplug_drop_passes(tmp_path):
    fabricate_mplug(tmp_path)
    problems = check_mplug([str(tmp_path / "vqa_train.json")],
                           str(tmp_path / "vqa_test.json"),
                           str(tmp_path / "answer_list.json"),
                           vqa_root=str(tmp_path))
    assert problems == [], "\n".join(problems)


def _expect(problems, needle):
    assert any(needle in p for p in problems), \
        f"no problem mentions {needle!r}:\n" + "\n".join(problems)


def test_missing_file_detected(vqacp_drop):
    os.remove(vqacp_drop / "cache" / "test_target.pkl")
    problems = check_vqacp(str(vqacp_drop),
                           str(vqacp_drop / "vqa_img_feature_trainval.pickle"))
    _expect(problems, "test_target.pkl")
    _expect(problems, "missing file")


def test_truncated_pickle_detected(vqacp_drop):
    path = vqacp_drop / "cache" / "train_target.pkl"
    raw = path.read_bytes()
    path.write_bytes(raw[: len(raw) // 2])
    problems = check_vqacp(str(vqacp_drop), None)
    _expect(problems, "unreadable pickle")


def test_qid_misalignment_detected(vqacp_drop):
    path = vqacp_drop / "cache" / "test_target.pkl"
    targets = pickle.load(open(path, "rb"))
    targets[0]["question_id"] = 999_999  # no such question
    pickle.dump(targets, open(path, "wb"))
    problems = check_vqacp(str(vqacp_drop), None)
    _expect(problems, "no question record")
    _expect(problems, "no target")


def test_label_out_of_answer_space_detected(vqacp_drop):
    path = vqacp_drop / "cache" / "train_target.pkl"
    targets = pickle.load(open(path, "rb"))
    targets[2]["labels"] = [10_000]
    targets[2]["scores"] = [1.0]
    pickle.dump(targets, open(path, "wb"))
    problems = check_vqacp(str(vqacp_drop), None)
    _expect(problems, "outside answer space")


def test_missing_image_feature_detected(vqacp_drop):
    feat_path = vqacp_drop / "vqa_img_feature_trainval.pickle"
    feats = pickle.load(open(feat_path, "rb"))
    feats.pop(next(iter(feats)))
    pickle.dump(feats, open(feat_path, "wb"))
    problems = check_vqacp(str(vqacp_drop), str(feat_path))
    _expect(problems, "images absent")


def test_bad_spatial_dim_detected(vqacp_drop):
    feat_path = vqacp_drop / "vqa_img_feature_trainval.pickle"
    feats = pickle.load(open(feat_path, "rb"))
    k = next(iter(feats))
    feats[k]["sp_feats"] = feats[k]["sp_feats"][:, :3]
    pickle.dump(feats, open(feat_path, "wb"))
    problems = check_vqacp(str(vqacp_drop), str(feat_path))
    _expect(problems, "sp_feats dim 3 != 4")


def test_vocab_without_specials_detected(vqacp_drop):
    (vqacp_drop / "vocab.txt").write_text("hello\nworld\n")
    problems = check_vqacp(str(vqacp_drop), None,
                           str(vqacp_drop / "vocab.txt"))
    _expect(problems, "[CLS]")


def test_answer_vocab_inconsistency_detected(vqacp_drop):
    l2a_path = vqacp_drop / "cache" / "train_test_label2ans.pkl"
    label2ans = pickle.load(open(l2a_path, "rb"))
    label2ans[0], label2ans[1] = label2ans[1], label2ans[0]
    pickle.dump(label2ans, open(l2a_path, "wb"))
    problems = check_vqacp(str(vqacp_drop), None)
    _expect(problems, "disagree")


def test_mplug_missing_image_detected(tmp_path):
    fabricate_mplug(tmp_path)
    records = json.load(open(tmp_path / "vqa_train.json"))
    records[0]["image"] = "imgs/DOES_NOT_EXIST.jpg"
    json.dump(records, open(tmp_path / "vqa_train.json", "w"))
    problems = check_mplug([str(tmp_path / "vqa_train.json")],
                           str(tmp_path / "vqa_test.json"),
                           str(tmp_path / "answer_list.json"),
                           vqa_root=str(tmp_path))
    _expect(problems, "DOES_NOT_EXIST")


def test_mplug_bias_misalignment_detected(tmp_path):
    fabricate_mplug(tmp_path)
    records = json.load(open(tmp_path / "vqa_train.json"))
    rec = next(r for r in records if "bias" in r)
    rec["bias"] = rec["bias"][:-1]
    json.dump(records, open(tmp_path / "vqa_train.json", "w"))
    problems = check_mplug([str(tmp_path / "vqa_train.json")],
                           str(tmp_path / "vqa_test.json"),
                           str(tmp_path / "answer_list.json"))
    _expect(problems, "bias")
