"""Reference-oracle parity: the VQA-VS 9-split scorer vs the reference's
own `comput_vqavs_score.py` functions (get_scores :16-67, get_OOD_ans_pred
:69-119, Final_Score = mean of the 9 ROUNDED OOD split scores :177)."""
import numpy as np

import ref_oracle

from crvqa_tpu.evals.scoring import VQAVS_SPLITS, compute_vqavs_scores

ref_oracle.install()

ANSWERS = ["yes", "no", "2", "red", "dog", "frisbee"]


def _fabricate(n=60, seed=4):
    rng = np.random.default_rng(seed)
    annotations, predictions = [], []
    for i in range(n):
        w1, w2 = rng.choice(ANSWERS, size=2, replace=False)
        c1, c2 = int(rng.integers(1, 7)), int(rng.integers(1, 4))
        atype = ("yes/no" if w1 in ("yes", "no")
                 else "number" if w1.isdigit() else "other")
        annotations.append({
            "question_id": 100 + i,
            "answers_word": [str(w1), str(w2)],
            "answer_count": {str(w1): c1, str(w2): c2},
            "answer_type": atype,
        })
        predictions.append({"question_id": 100 + i,
                            "answer": str(rng.choice(ANSWERS))})
    test_anno = {"annotations": annotations}
    for s in VQAVS_SPLITS:
        # overlapping random OOD split memberships, like the real file
        test_anno[f"{s}_qid"] = [100 + int(i) for i in
                                 rng.choice(n, size=n // 2, replace=False)]
    return test_anno, predictions


def test_vqavs_scorer_oracle():
    import comput_vqavs_score as ref

    test_anno, predictions = _fabricate()
    ours = compute_vqavs_scores(predictions, test_anno)

    annotations = sorted(test_anno["annotations"],
                         key=lambda x: x["question_id"])
    predictions = sorted(predictions, key=lambda x: x["question_id"])
    ref_iid = ref.get_scores(annotations, predictions)
    split_annos, split_preds = ref.get_OOD_ans_pred(
        annotations, predictions,
        *[test_anno[f"{s}_qid"] for s in VQAVS_SPLITS])
    ref_splits = [ref.get_scores(a, p)
                  for a, p in zip(split_annos, split_preds)]

    assert ours["iid"] == ref_iid
    for s, want in zip(VQAVS_SPLITS, ref_splits):
        assert ours[s] == want, s
    assert ours["Final_Score"] == sum(ref_splits) / 9


def test_compare_mask_oracle(tmp_path):
    """`evals.compare_mask` vs the reference `compare_mask.py:compare`
    (Jaccard of bool mask dicts, :31-43), on real torch-saved mask.pt files.

    The reference module creates its hardcoded output dir at import time;
    os.path.exists is patched to skip that side effect.
    """
    import os
    import torch

    rng = np.random.default_rng(7)
    m1 = {f"layer.{i}.weight": rng.random((6, 8)) > 0.6 for i in range(5)}
    m2 = {k: (rng.random(v.shape) > 0.4) for k, v in m1.items()}
    p1, p2 = str(tmp_path / "m1.pt"), str(tmp_path / "m2.pt")
    torch.save({k: torch.from_numpy(v) for k, v in m1.items()}, p1)
    torch.save({k: torch.from_numpy(v) for k, v in m2.items()}, p2)

    real_exists = os.path.exists
    os.path.exists = lambda *_: True
    try:
        ref_cm = ref_oracle.load_ref_module("ref_compare_mask",
                                            "compare_mask.py")
    finally:
        os.path.exists = real_exists

    ref_sim = float(ref_cm.compare(p1, p2, show_every_matrix=False))

    from crvqa_tpu.evals.compare_mask import compare_mask_dicts

    ours = compare_mask_dicts(m1, m2)
    assert abs(ours - ref_sim) < 1e-6
    # self-similarity is exactly 1 on both sides
    assert float(ref_cm.compare(p1, p1, False)) == 1.0
    assert compare_mask_dicts(m1, m1) == 1.0


def test_smoothed_value_oracle():
    """utils.metric_logger.SmoothedValue vs the reference's
    (`mPLUG/utils.py:11-69`): identical median (torch lower-median on even
    windows), avg, global_avg, max, value, and formatted string over a
    randomized update sequence including window eviction."""
    ref_utils = ref_oracle.load_ref_module("ref_mplug_utils", "mPLUG/utils.py")

    from crvqa_tpu.utils.metric_logger import SmoothedValue

    rng = np.random.default_rng(9)
    ref_sv = ref_utils.SmoothedValue(window_size=6)
    ours = SmoothedValue(window_size=6)
    for step in range(25):
        v = float(rng.normal())
        n = int(rng.integers(1, 4))
        ref_sv.update(v, n=n)
        ours.update(v, n=n)
        # reference medians/avgs round through torch float32
        assert abs(ours.median - ref_sv.median) < 1e-6, step
        assert abs(ours.avg - ref_sv.avg) < 1e-6, step
        assert abs(ours.global_avg - ref_sv.global_avg) < 1e-12, step
        assert ours.max == ref_sv.max and ours.value == ref_sv.value
    assert str(ours) == str(ref_sv)


def test_compute_score_with_logits_oracle():
    """`train.common.batch_score` vs the reference in-training metric
    (`compute_score_with_logits`, hg_transformers/data/metrics/
    __init__.py:90-104): summed soft score of the argmax answer, including
    argmax tie behavior (torch.max picks the FIRST max index; jnp.argmax
    does too)."""
    import torch
    import jax.numpy as jnp

    from hg_transformers.data.metrics import compute_score_with_logits

    from crvqa_tpu.train.common import batch_score

    rng = np.random.default_rng(17)
    logits = rng.normal(size=(16, 7)).astype(np.float32)
    labels = (rng.random((16, 7)) < 0.3).astype(np.float32) * \
        rng.choice([0.3, 0.6, 0.9, 1.0], size=(16, 7)).astype(np.float32)
    # exact ties in two rows: both sides must pick the FIRST max index
    logits[3, :] = 0.0
    logits[7, 2] = logits[7, 5] = logits[7].max() + 1.0

    ref = compute_score_with_logits(
        "vqa", torch.from_numpy(logits.copy()),
        torch.from_numpy(labels.copy()))["acc"]
    ours = float(batch_score(jnp.asarray(logits), jnp.asarray(labels)))
    assert abs(ours - float(ref)) < 1e-6
