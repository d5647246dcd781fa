"""Reference-oracle parity: the mPLUG dataset __getitem__.

Runs the ACTUAL `mPLUG/dataset/vqa_dataset.py:vqa_dataset` (train and test
splits, add_ocr/add_object on) on the dress-rehearsal annotation files and
asserts our `data.mplug_data.load_entries` matches per entry: the spliced
question string (raw question + pre_question'd OCR + objects — the
reference's question-level pre_question is COMMENTED OUT at
vqa_dataset.py:71), the first-occurrence answer dedup with 1/len(answer)
weights, the bias-follows-answer dedup, the '[SEP]'-string answer suffix
(token-equal to our extra_eos rows), and test-split qids.

Import notes: the reference file needs an `oss2` stub (Alibaba OSS SDK,
cloud-read path we never take) and the `dataset` package registered
WITHOUT executing its __init__ (which imports torchvision).
"""
import importlib.util
import json
import sys
import types

import numpy as np
import pytest

import ref_oracle

from test_dress_rehearsal_mplug import _fabricate

torch = ref_oracle.install()


@pytest.fixture(scope="module")
def ref_vqa_dataset():
    if "oss2" not in sys.modules:
        oss2 = types.ModuleType("oss2")
        oss2.__spec__ = importlib.util.spec_from_loader("oss2", loader=None)
        sys.modules["oss2"] = oss2
    # dataset/utils.py imports vqaTools.vqaEval (the official evaluator)
    ref_oracle.add_mplug_path()
    pkg_dir = f"{ref_oracle.REFERENCE}/mPLUG/dataset"
    if "dataset" not in sys.modules or not hasattr(sys.modules["dataset"],
                                                   "__path__"):
        pkg = types.ModuleType("dataset")
        pkg.__path__ = [pkg_dir]
        pkg.__spec__ = importlib.util.spec_from_loader("dataset", loader=None,
                                                       is_package=True)
        sys.modules["dataset"] = pkg
    for name in ("dataset.utils", "dataset.vqa_dataset"):
        if name in sys.modules:
            continue
        spec = importlib.util.spec_from_file_location(
            name, f"{pkg_dir}/{name.split('.')[1]}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod
        spec.loader.exec_module(mod)
    return sys.modules["dataset.vqa_dataset"].vqa_dataset


def _add_dataset_key(path):
    recs = json.loads(path.read_text())
    for r in recs:
        r["dataset"] = "vqa"  # the reference contract (vqa_dataset.py:47)
    path.write_text(json.dumps(recs))
    return recs


def test_mplug_dataset_train_oracle(tmp_path, ref_vqa_dataset):
    _fabricate(tmp_path)
    recs = _add_dataset_key(tmp_path / "vqa_train.json")

    ds = ref_vqa_dataset(
        [str(tmp_path / "vqa_train.json")], transform=lambda im: im,
        vqa_root=str(tmp_path), vg_root="", gqa_root="", split="train",
        max_ques_words=30, read_local_data=True, add_ocr=True,
        add_object=True)

    from crvqa_tpu.data.mplug_data import (_tokenize_fixed, augment_question,
                                           load_entries)
    from crvqa_tpu.data.tokenization import WordPieceTokenizer

    tok = WordPieceTokenizer(str(tmp_path / "vocab.txt"))
    ours = load_entries([str(tmp_path / "vqa_train.json")], tok, q_len=25,
                        a_len=6, vqa_root=str(tmp_path), add_ocr=True,
                        add_object=True)

    assert len(ds) == len(recs)
    for i in range(len(ds)):
        _img, question, answers, weights, biases = ds[i]
        assert augment_question(recs[i], True, True) == question, i
        k = len(answers)
        # our arrays store fp32; the reference returns python floats
        np.testing.assert_allclose(ours.weights[i][:k], weights, rtol=1e-6,
                                   err_msg=f"entry {i}")
        assert (ours.weights[i][k:] == 0).all()
        np.testing.assert_allclose(ours.bias[i][:k], biases, rtol=1e-6,
                                   err_msg=f"entry {i}")
        # the reference's answer strings carry the '[SEP]' eos suffix;
        # tokenizing them plainly equals our extra_eos token rows
        ref_ids, ref_mask = _tokenize_fixed(tok, answers, 6)
        np.testing.assert_array_equal(ours.answer_tokens[i][:k], ref_ids,
                                      err_msg=f"entry {i}")
        np.testing.assert_array_equal(ours.answer_mask[i][:k], ref_mask,
                                      err_msg=f"entry {i}")
    # non-degenerate: some entry actually had duplicate answers to dedup
    assert any(len(ds[i][2]) < len(recs[i]["answer"]) for i in range(len(ds)))


def test_mplug_dataset_test_oracle(tmp_path, ref_vqa_dataset):
    _fabricate(tmp_path)
    recs = _add_dataset_key(tmp_path / "vqa_test.json")

    # a long OCR list pins the EFFECTIVE test-split cap: the ctor's
    # test-split 50 is overwritten by `if self.add_ocr: max_ques_words=30`
    # which runs LAST (vqa_dataset.py:33-37) — 30 on both splits
    recs = json.loads((tmp_path / "vqa_test.json").read_text())
    recs[0]["ocr"] = [[i, f"tok{i}"] for i in range(45)]
    (tmp_path / "vqa_test.json").write_text(json.dumps(recs))

    ds = ref_vqa_dataset(
        [str(tmp_path / "vqa_test.json")], transform=lambda im: im,
        vqa_root=str(tmp_path), vg_root="", gqa_root="", split="test",
        answer_list=str(tmp_path / "answer_list.json"),
        read_local_data=True, add_ocr=True, add_object=True)
    assert ds.max_ques_words == 30  # not 50: add_ocr overrides

    from crvqa_tpu.data.mplug_data import augment_question, load_entries
    from crvqa_tpu.data.tokenization import WordPieceTokenizer

    tok = WordPieceTokenizer(str(tmp_path / "vocab.txt"))
    ours = load_entries([str(tmp_path / "vqa_test.json")], tok, q_len=25,
                        a_len=6, vqa_root=str(tmp_path), add_ocr=True,
                        add_object=True)

    for i in range(len(ds)):
        _img, question, qid = ds[i]
        assert augment_question(recs[i], True, True) == question, i
        assert int(ours.question_ids[i]) == int(qid), i
    # the 45-token OCR string IS cut at the effective cap 30
    long_q = ds[0][1]
    assert "tok29" in long_q and "tok44" not in long_q
    assert "tok44" in augment_question(recs[0], True, True,
                                       max_ques_words=50)
