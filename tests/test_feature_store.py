"""Native mmap feature store: build from pickle payload, gather correctness,
threaded gather equivalence, error handling."""
import os

import numpy as np
import pytest

from crvqa_tpu.native import FeatureStore, build_feature_store, ensure_built


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    ensure_built()
    rng = np.random.RandomState(0)
    features = {
        str(100 + i): {
            "feats": rng.randn(36, 64).astype(np.float32),
            "sp_feats": rng.rand(36, 4).astype(np.float32),
        }
        for i in range(20)
    }
    path = str(tmp_path_factory.mktemp("fs") / "feats.bin")
    ids = build_feature_store(path, features)
    return FeatureStore(path), features, ids


def test_metadata(store):
    fs, features, ids = store
    assert fs.num_images == 20
    assert fs.boxes == 36
    assert fs.feat_dim == 64
    assert fs.pos_dim == 4


def test_lookup_matches_source(store):
    fs, features, ids = store
    sel = [ids[3], ids[17], ids[0], ids[3]]
    feats, pos = fs.lookup(sel)
    for i, image_id in enumerate(sel):
        np.testing.assert_array_equal(feats[i], features[image_id]["feats"])
        np.testing.assert_array_equal(pos[i], features[image_id]["sp_feats"])


def test_threaded_gather_equals_single(store):
    fs, features, ids = store
    rows = np.asarray([5, 1, 19, 0, 7, 7, 2, 3] * 8, np.int64)
    fs.threads = 1
    f1, p1 = fs.gather_rows(rows)
    fs.threads = 8
    f8, p8 = fs.gather_rows(rows)
    np.testing.assert_array_equal(f1, f8)
    np.testing.assert_array_equal(p1, p8)


def test_out_of_range_row(store):
    fs, *_ = store
    with pytest.raises(IndexError):
        fs.gather_rows(np.asarray([99], np.int64))


def test_unknown_id(store):
    fs, *_ = store
    with pytest.raises(KeyError):
        fs.lookup(["does-not-exist"])
