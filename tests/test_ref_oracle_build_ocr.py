"""Reference-oracle parity: the VQA-CP OCR preprocessing pipeline.

Runs the ACTUAL `mPLUG/data/build_vqacp_ocr.py` script (a run-once
module-level script with hardcoded relative paths) via runpy on fabricated
inputs, and asserts our functional port (`data/build_vqacp_ocr.build_all`)
produces byte-identical train/test/train_bias/test_labels artifacts — the
`bias` lists here are the priors the headline mPLUG (1-bias) debias loss
consumes. The val split is RNG-dependent on both sides (the reference's
random.sample is unseeded), so it is compared structurally and through the
label builder instead.
"""
import json
import runpy

import numpy as np
import pytest

from ref_oracle import REFERENCE

ANSWERS = ["yes", "no", "2", "red", "dog", "left", "frisbee", "white"]


def _fabricate_inputs(root, rng, n_train=120, n_test=20800):
    (root / "vqa_ocr_object").mkdir()
    (root / "vqav2").mkdir()
    (root / "vqacp").mkdir()
    (root / "vqacp_ocr_object").mkdir()

    n = n_train + n_test
    qids = list(range(1000, 1000 + n))
    # a few vqacp ids with no OCR record (exercises the membership filter)
    missing = set(qids[::97])

    records = []
    for q in qids:
        if q in missing:
            continue
        ans = [str(a) for a in rng.choice(ANSWERS, size=10)]
        records.append({
            "question_id": q,
            "image": ("val2014_img/COCO_val2014_%012d.jpg" % q
                      if q % 2 else "train2014/COCO_train2014_%012d.jpg" % q),
            "question": f"what is {q}?",
            "answer": ans,
        })
    # one qid duplicated across files: dict-update order makes the LAST
    # file's record win on both sides
    dup = dict(records[0])
    dup["question"] = "duplicate wins"
    thirds = len(records) // 3
    files = {
        "vqa_train_ocr.json": records[:thirds],
        "vqa_nominival_ocr.json": records[thirds:2 * thirds],
        "vqa_minival_ocr.json": records[2 * thirds:] + [dup],
    }
    for name, recs in files.items():
        (root / "vqa_ocr_object" / name).write_text(json.dumps(recs))

    anns = [{"question_id": q,
             "question_type": ["what is", "is the", "how many"][q % 3],
             "answer_type": ["other", "yes/no", "number"][q % 3]}
            for q in qids]
    half = n // 2
    (root / "vqav2" / "v2_mscoco_train2014_annotations.json").write_text(
        json.dumps({"annotations": anns[:half]}))
    (root / "vqav2" / "v2_mscoco_val2014_annotations.json").write_text(
        json.dumps({"annotations": anns[half:]}))

    train_ids, test_ids = qids[:n_train], qids[n_train:]
    (root / "vqacp" / "vqacp_v2_train_questions.json").write_text(
        json.dumps([{"question_id": q} for q in train_ids]))
    (root / "vqacp" / "vqacp_v2_test_questions.json").write_text(
        json.dumps([{"question_id": q} for q in test_ids]))
    ordered = records[:thirds] + records[thirds:2 * thirds] \
        + records[2 * thirds:] + [dup]
    return ordered, train_ids, test_ids


@pytest.mark.slow
def test_build_vqacp_ocr_oracle(tmp_path, monkeypatch):
    rng = np.random.default_rng(21)
    ordered, train_ids, test_ids = _fabricate_inputs(tmp_path, rng)
    monkeypatch.chdir(tmp_path)

    runpy.run_path(f"{REFERENCE}/mPLUG/data/build_vqacp_ocr.py",
                   run_name="__main__")

    out = tmp_path / "vqacp_ocr_object"
    ref = {name: json.loads((out / f"{name}.json").read_text())
           for name in ("train", "test", "val", "train_bias")}
    ref_labels = {name: json.loads((out / f"{name}_labels.json").read_text())
                  for name in ("test", "val")}

    from crvqa_tpu.data.build_vqacp_ocr import (build_all, build_label_file,
                                                load_type_maps)

    qtypes, atypes = load_type_maps([
        str(tmp_path / "vqav2" / "v2_mscoco_train2014_annotations.json"),
        str(tmp_path / "vqav2" / "v2_mscoco_val2014_annotations.json")])
    ours = build_all(ordered, train_ids, test_ids, qtypes, atypes,
                     val_size=20000, seed=3)

    # RNG-independent artifacts must be byte-identical (incl. float bias)
    assert ours["train"] == ref["train"]
    assert ours["test"] == ref["test"]
    assert ours["train_bias"] == ref["train_bias"]
    assert ours["test_label"] == ref_labels["test"]
    # the duplicate record resolved last-file-wins on the reference side too
    dup_ref = [d for d in ref["train"] + ref["test"]
               if d["question"] == "duplicate wins"]
    assert len(dup_ref) == 1

    # val: same size, same sampling pool; label construction identical when
    # run on the reference's own val membership
    assert len(ours["val"]) == len(ref["val"]) == 20000
    test_qids = {d["question_id"] for d in ref["test"]}
    assert {d["question_id"] for d in ref["val"]} <= test_qids
    assert {d["question_id"] for d in ours["val"]} <= test_qids
    assert build_label_file(ref["val"], qtypes, atypes) == ref_labels["val"]

    # bias sanity: every train_bias record carries one prior per answer
    for d in ours["train_bias"][:20]:
        assert len(d["bias"]) == len(d["answer"])
        assert all(0 < b <= 1 for b in d["bias"])
