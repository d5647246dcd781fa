"""--synthetic_pool: the chip-parity loader that cycles pre-generated
batches (cli/common.build_data) instead of paying ~75 MB of host randn per
bs-256 batch (see the flag's help text)."""
import types

import numpy as np


def _args(**kw):
    base = dict(synthetic=32, synthetic_pool=0, train_batch_size=8,
                eval_batch_size=8, prefetch_batches=0)
    base.update(kw)
    return types.SimpleNamespace(**base)


def _config():
    return types.SimpleNamespace(ans_num=10, vocab_size=64,
                                 visual_feat_dim=16, visual_pos_dim=4)


def test_pool_cycles_fixed_batches():
    from crvqa_tpu.cli.common import build_data

    train, _, _, n = build_data(_args(synthetic_pool=3), _config())
    batches = list(train(epoch=0))
    assert n == 32 and len(batches) == 4
    # cycle: batch 3 IS batch 0 (same arrays, no regeneration)
    assert batches[3]["visual_feats"] is batches[0]["visual_feats"]
    # pool entries are distinct batches
    assert not np.array_equal(batches[0]["input_ids"], batches[1]["input_ids"])
    # a second epoch reuses the same pool (no per-epoch regeneration)
    again = list(train(epoch=1))
    assert again[0]["visual_feats"] is batches[0]["visual_feats"]


def test_pool_off_regenerates_per_epoch():
    from crvqa_tpu.cli.common import build_data

    train, _, _, _ = build_data(_args(), _config())
    e0 = list(train(epoch=0))
    e1 = list(train(epoch=1))
    assert not np.array_equal(e0[0]["input_ids"], e1[0]["input_ids"])


def test_pool_leaves_eval_loader_alone():
    from crvqa_tpu.cli.common import build_data

    _, ev, _, _ = build_data(_args(synthetic_pool=2), _config())
    qids = [b["question_id"] for b in ev()]
    # eval batches stay distinct (pooling only applies to training)
    assert len({int(q[0]) for q in qids}) == len(qids)
