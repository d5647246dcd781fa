"""Scorer compatibility tests (same JSON in -> same numbers out) and utils."""
import numpy as np

from crvqa_tpu.evals import compute_vqacp_scores, compute_vqavs_scores
from crvqa_tpu.utils import dict_parser, MetricLogger
from crvqa_tpu.masking.sparsity_control import (
    MaskerScheduler,
    automated_gradual_sparsity,
)


def test_vqacp_scoring_matches_reference_formula():
    annotations = [
        {"question_id": 1, "answers_word": ["yes", "no"],
         "answer_count": {"yes": 7, "no": 3}, "answer_type": "yes/no"},
        {"question_id": 2, "answers_word": ["2", "3"],
         "answer_count": {"2": 2, "3": 8}, "answer_type": "number"},
        {"question_id": 3, "answers_word": ["red"],
         "answer_count": {"red": 10}, "answer_type": "other"},
    ]
    predictions = [
        {"question_id": 1, "answer": "yes"},   # min(1, 7/3) = 1
        {"question_id": 2, "answer": "2"},     # min(1, 2/3) = 2/3
        {"question_id": 3, "answer": "blue"},  # miss -> 0
    ]
    res = compute_vqacp_scores(predictions, annotations)
    assert res["overall"] == round((1 + 2 / 3 + 0) * 100 / 3, 2)
    assert res["yes/no"] == 100.0
    assert res["number"] == round(100 * 2 / 3, 2)
    assert res["other"] == 0.0
    assert res["upper_bound"] == 100.0
    assert res["count"] == 2


def test_vqavs_scoring_nine_splits():
    annos = [
        {"question_id": i, "answers": [{"answer": "yes"}] * 5}
        for i in range(10)
    ]
    preds = [{"question_id": i, "answer": "yes" if i % 2 == 0 else "no"}
             for i in range(10)]
    test_anno = {"annotations": annos}
    from crvqa_tpu.evals import VQAVS_SPLITS

    for s in VQAVS_SPLITS:
        test_anno[f"{s}_qid"] = list(range(0, 10, 2))  # only even qids
    res = compute_vqavs_scores(preds, test_anno)
    assert res["iid"] == 50.0
    for s in VQAVS_SPLITS:
        assert res[s] == 100.0  # every even qid predicted correctly
    assert res["Final_Score"] == 100.0

    # qid-keyed pairing: shuffled/duplicated prediction lists score
    # identically, and a missing qid is an error (not a silent desync of
    # every later positional pair)
    shuffled = list(reversed(preds)) + [preds[0]]
    res2 = compute_vqavs_scores(shuffled, test_anno)
    assert res2 == res
    import pytest

    with pytest.raises(ValueError, match="lack predictions"):
        compute_vqavs_scores(preds[:-1], test_anno)


def test_dict_parser():
    conf = dict_parser(
        "lambdas_lr=0,sparsity_warmup=automated_gradual_sparsity,"
        "sparsity_warmup_interval_epoch=0.1,init_epoch=0,final_epoch=1")
    assert conf["lambdas_lr"] == 0
    assert conf["sparsity_warmup"] == "automated_gradual_sparsity"
    assert conf["sparsity_warmup_interval_epoch"] == 0.1
    assert conf["final_epoch"] == 1


def test_agp_schedule_cubic():
    f = automated_gradual_sparsity(0.0, 0.7, 0.1, 0, 10)
    assert f(0, 0) == 0.0
    assert abs(f(10, 0) - 0.7) < 1e-9
    assert abs(f(5, 0) - (0.7 + (0 - 0.7) * 0.5 ** 3)) < 1e-9
    assert f(11, 0) == 0.7


def test_masker_scheduler_shipped_config_is_skip():
    # shipped default: lambdas_lr=0 -> scheduler disabled, sparsity pinned
    sched = MaskerScheduler(final_sparsity=0.7, num_epochs=20, lambdas_lr=0.0,
                            init_epoch=0, final_epoch=1)
    assert sched.is_skip
    assert sched.init_sparsity == 0.7
    inc, target, changed = sched.step(0)
    assert target == 0.7


def test_masker_scheduler_active_ramp():
    sched = MaskerScheduler(final_sparsity=0.7, num_epochs=10, lambdas_lr=1.0,
                            init_sparsity=0.1, init_epoch=0, final_epoch=8)
    targets = [sched.step(e)[1] for e in range(10)]
    assert targets[0] == 0.1
    assert abs(targets[-1] - 0.7) < 1e-9
    assert all(b >= a - 1e-9 for a, b in zip(targets, targets[1:]))


def test_metric_logger():
    ml = MetricLogger()
    for i in range(5):
        ml.update(loss=float(i))
    assert ml.meters["loss"].global_avg == 2.0
    assert "loss" in str(ml)
