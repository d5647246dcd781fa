"""Reference-oracle parity: bias priors and mPLUG's cal_metric.

- Executes the reference's LITERAL bias-computation snippet
  (`run_vqa_stage1.py:483-510` == `prune_debias_VQA.py:884-911`) on the
  reference's own `VQAFeatureDataset` entries (dress-rehearsal files) and
  asserts `data.vqacp.compute_bias_priors`/`attach_bias` produce the same
  per-entry bias vectors.
- Executes the reference `cal_metric` (`mPLUG/vqa_mplug.py:289-303`),
  extracted by ast from the un-importable driver (deepspeed/ruamel deps),
  against our `evals.scoring.cal_metric` on a randomized prediction set.
"""
import ast
import json
import shutil
import sys
import textwrap

import numpy as np
import pytest

from ref_oracle import REFERENCE, install

from test_dress_rehearsal import _fabricate


def _ref_bias_snippet():
    """The literal source lines of the reference bias computation."""
    src = open(f"{REFERENCE}/run_vqa_stage1.py").read().splitlines()
    start = next(i for i, l in enumerate(src) if "# Compute the bias:" in l)
    end = next(i for i, l in enumerate(src)
               if 'ex["bias"] = question_type_to_prob_array' in l)
    return textwrap.dedent("\n".join(src[start:end + 1]))


@pytest.mark.slow
def test_bias_priors_oracle(tmp_path, monkeypatch):
    install()

    def assert_eq(real, expected):
        assert real == expected

    sys.modules["utils_vqa"].assert_eq = assert_eq
    import dataset_LXM

    _fabricate(tmp_path)
    feat_dir = tmp_path / "xxxx" / "CompressVQA" / "coco" / "object_features"
    feat_dir.mkdir(parents=True)
    shutil.copy(tmp_path / "vqa_img_feature_trainval.pickle",
                feat_dir / "vqa_img_feature_trainval.pickle")
    monkeypatch.chdir(tmp_path)

    from hg_transformers.tokenization_bert import BertTokenizer

    ref_tok = BertTokenizer(str(tmp_path / "vocab.txt"))
    train_ds = dataset_LXM.VQAFeatureDataset("train", str(tmp_path), "", 1.0,
                                             ref_tok)
    eval_ds = dataset_LXM.VQAFeatureDataset("test", str(tmp_path), "", 1.0,
                                            ref_tok)

    from collections import Counter, defaultdict

    env = {
        "train_dataset": train_ds, "eval_dataset": eval_ds,
        "answer_voc_size": train_ds.num_ans_candidates,
        "defaultdict": defaultdict, "Counter": Counter, "np": np,
    }
    exec(_ref_bias_snippet(), env)  # the reference's own code, verbatim

    from crvqa_tpu.data.vqacp import (attach_bias, compute_bias_priors,
                                      load_answer_vocab, load_entries,
                                      make_tokenizer)

    ans2label, _ = load_answer_vocab(str(tmp_path))
    tok = make_tokenizer(str(tmp_path / "vocab.txt"))
    ours_train = load_entries(str(tmp_path), "train", tok, len(ans2label))
    ours_eval = load_entries(str(tmp_path), "test", tok, len(ans2label))
    priors = compute_bias_priors(ours_train, len(ans2label))
    attach_bias(ours_train, priors, len(ans2label))
    attach_bias(ours_eval, priors, len(ans2label))

    for ds, ours in ((train_ds, ours_train), (eval_ds, ours_eval)):
        assert len(ds.entries) == len(ours)
        for i, ex in enumerate(ds.entries):
            np.testing.assert_allclose(ours.bias[i], ex["bias"],
                                       rtol=1e-6, atol=1e-7,
                                       err_msg=f"entry {i}")
    # non-degenerate: at least two distinct question types with different
    # priors
    assert len({t for t in ours_train.question_types}) >= 2


def _ref_cal_metric():
    tree = ast.parse(open(f"{REFERENCE}/mPLUG/vqa_mplug.py").read())
    fn = next(n for n in tree.body
              if isinstance(n, ast.FunctionDef) and n.name == "cal_metric")
    mod = ast.Module(body=[fn], type_ignores=[])
    env = {"json": json}
    exec(compile(mod, "vqa_mplug.py", "exec"), env)
    return env["cal_metric"]


def test_cal_metric_oracle(tmp_path):
    """Reference `cal_metric` vs ours on randomized predictions incl.
    out-of-label answers (scored 0 on both sides)."""
    rng = np.random.default_rng(13)
    labels = []
    preds = []
    answers = ["yes", "no", "2", "red", "left"]
    for i in range(40):
        lab = {str(rng.choice(answers)): float(rng.choice([0.3, 0.6, 0.9, 1.0]))
               for _ in range(int(rng.integers(1, 3)))}
        labels.append({"question_id": int(i), "label": lab})
        preds.append({"question_id": int(i),
                      "answer": str(rng.choice(answers + ["elephant"]))})
    label_file = tmp_path / "test_labels.json"
    label_file.write_text(json.dumps(labels))

    ref_fn = _ref_cal_metric()
    ref_score = ref_fn(preds, [str(label_file)])

    from crvqa_tpu.evals.scoring import cal_metric

    ours = cal_metric(preds, str(label_file))
    assert abs(ours - ref_score) < 1e-12
    assert 0.0 < ref_score < 1.0
