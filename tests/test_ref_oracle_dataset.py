"""Data-layer oracle: the reference's ACTUAL `dataset_LXM.py` Dataset
(vendored-HF tokenizer included) run on the dress-rehearsal synthetic files,
compared entry-by-entry against `crvqa_tpu.data.vqacp.load_entries`.

The dress rehearsals prove end-to-end score equality; this pins the
intermediate tensors — fixed-14 question ids from TWO independent WordPiece
implementations, lengths, scatter'd soft-target vectors, max_label, and the
feature/spatial arrays — so any drift is localized to the data layer
instead of surfacing as a score mismatch three stages later.
Reference: dataset_LXM.py:103-289.
"""
import os
import pickle
import shutil
import sys

import numpy as np
import pytest

from ref_oracle import install

from test_dress_rehearsal import _fabricate


@pytest.fixture(scope="module")
def ref_dataset_mod():
    install()
    # dataset_LXM calls utils_vqa.assert_eq on every entry; ref_oracle's
    # bare module stub needs the real check
    def assert_eq(real, expected):
        assert real == expected, f"{real} != {expected}"

    sys.modules["utils_vqa"].assert_eq = assert_eq
    import dataset_LXM

    return dataset_LXM


def _ref_tokenizer():
    from hg_transformers.tokenization_bert import BertTokenizer

    return BertTokenizer  # constructed per vocab file below


@pytest.mark.slow
def test_dataset_entries_match_reference(tmp_path, monkeypatch,
                                         ref_dataset_mod):
    _fabricate(tmp_path)
    # the reference hardcodes a relative feature-pickle path — satisfy it
    feat_dir = tmp_path / "xxxx" / "CompressVQA" / "coco" / "object_features"
    feat_dir.mkdir(parents=True)
    shutil.copy(tmp_path / "vqa_img_feature_trainval.pickle",
                feat_dir / "vqa_img_feature_trainval.pickle")
    monkeypatch.chdir(tmp_path)

    ref_tok = _ref_tokenizer()(str(tmp_path / "vocab.txt"))

    from crvqa_tpu.data.vqacp import (
        ImageFeatures,
        load_answer_vocab,
        load_entries,
        make_tokenizer,
    )

    ans2label, label2ans = load_answer_vocab(str(tmp_path))
    ours_tok = make_tokenizer(str(tmp_path / "vocab.txt"))
    feats = ImageFeatures(str(tmp_path / "vqa_img_feature_trainval.pickle"))

    for split in ("train", "test"):
        ds = ref_dataset_mod.VQAFeatureDataset(
            split, str(tmp_path), "", 1.0, ref_tok)
        ours = load_entries(str(tmp_path), split, ours_tok,
                            ans_num=len(ans2label))
        assert len(ds) == len(ours)
        for e in ds.entries:
            e["bias"] = 0.0  # attached by the reference trainer, not here
        for i in range(len(ds)):
            (q_token, features, spatials, target, qid, image_id, _bias,
             max_label) = ds[i]
            assert int(qid) == int(ours.question_ids[i])
            assert str(image_id) == str(ours.image_ids[i])
            # two independent WordPiece implementations agree on the
            # fixed-14 contract
            np.testing.assert_array_equal(q_token.numpy(),
                                          ours.input_ids[i])
            assert int(ds.entries[i]["length"]) == int(ours.lengths[i])
            np.testing.assert_allclose(target.numpy(), ours.labels[i],
                                       rtol=0, atol=0)
            assert int(max_label) == int(ours.max_label[i])
            f_ours, sp_ours = feats.lookup([str(image_id)])
            np.testing.assert_array_equal(features.numpy(), f_ours[0])
            np.testing.assert_array_equal(spatials.numpy(), sp_ours[0])
            assert (ds.entries[i]["answer"]["question_type"]
                    == ours.question_types[i])


@pytest.mark.slow
def test_trim_collator_batch_matches_ours(tmp_path, monkeypatch,
                                          ref_dataset_mod):
    """Batch-assembly oracle: the reference `TrimCollator.collate_batch`
    (hg_transformers/data/data_collator.py:47-95) over the positional
    8-tuples vs our `iterate_batches` dict batches — same stacked ids,
    features, spatials, targets, qids, max_labels. (Box counts are fixed at
    36 on both sides, so the reference's pad-to-batch-max is the identity —
    our static shapes are behavior-equal, not just compatible.)"""
    _fabricate(tmp_path)
    feat_dir = tmp_path / "xxxx" / "CompressVQA" / "coco" / "object_features"
    feat_dir.mkdir(parents=True)
    shutil.copy(tmp_path / "vqa_img_feature_trainval.pickle",
                feat_dir / "vqa_img_feature_trainval.pickle")
    monkeypatch.chdir(tmp_path)

    import collections
    import collections.abc

    # py3.10 removed the collections.* ABC aliases the 2019-era collator
    # uses (data_collator.py:91-94) — the same class of environment shim as
    # torch._six in ref_oracle.install()
    monkeypatch.setattr(collections, "Mapping", collections.abc.Mapping,
                        raising=False)
    monkeypatch.setattr(collections, "Sequence", collections.abc.Sequence,
                        raising=False)

    from hg_transformers.data.data_collator import TrimCollator

    from crvqa_tpu.data.vqacp import (
        ImageFeatures,
        iterate_batches,
        load_answer_vocab,
        load_entries,
        make_tokenizer,
    )

    ref_tok = _ref_tokenizer()(str(tmp_path / "vocab.txt"))
    ans2label, _ = load_answer_vocab(str(tmp_path))
    ours_tok = make_tokenizer(str(tmp_path / "vocab.txt"))
    feats = ImageFeatures(str(tmp_path / "vqa_img_feature_trainval.pickle"))

    ds = ref_dataset_mod.VQAFeatureDataset("train", str(tmp_path), "", 1.0,
                                           ref_tok)
    for e in ds.entries:
        e["bias"] = 0.0
    entries = load_entries(str(tmp_path), "train", ours_tok,
                           ans_num=len(ans2label))

    bs = min(4, len(ds))
    ref_batch = TrimCollator().collate_batch([ds[i] for i in range(bs)])
    (q_token, features, spatials, target, qid, image_id, _bias,
     max_label) = ref_batch

    ours = next(iterate_batches(entries, feats, batch_size=bs))
    np.testing.assert_array_equal(q_token.numpy(), ours["input_ids"])
    np.testing.assert_array_equal(features.numpy(), ours["visual_feats"])
    np.testing.assert_array_equal(spatials.numpy(), ours["visual_pos"])
    np.testing.assert_array_equal(target.numpy(), ours["labels"])
    np.testing.assert_array_equal(np.asarray(qid), ours["question_id"])
    np.testing.assert_array_equal(np.asarray(max_label), ours["max_label"])
    assert ours["valid"].all()
    # equal box counts per image -> the reference's pad-to-batch-max is the
    # identity and both sides carry the same static feature shape
    assert features.shape == ours["visual_feats"].shape
