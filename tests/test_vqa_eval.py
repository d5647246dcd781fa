"""Official VQA evaluation protocol: normalization rules + scoring."""
from crvqa_tpu.evals.vqa_eval import VQAEval, normalize_answer


def test_normalization_digits_articles_contractions():
    assert normalize_answer("Two") == "2"
    assert normalize_answer("a dog") == "dog"
    assert normalize_answer("the none") == "0"
    assert normalize_answer("isnt") == "isn't"
    assert normalize_answer("yes!") == "yes"
    assert normalize_answer("1,000") == "1000"


def test_evaluate_leave_one_out():
    annos = [{
        "question_id": 1,
        "answers": [{"answer": "yes"}] * 7 + [{"answer": "no"}] * 3,
        "question_type": "is the", "answer_type": "yes/no",
    }]
    ev = VQAEval()
    # 'yes': each leave-one-out subset has >=6 'yes' -> min(6/3,1)=1
    acc = ev.evaluate([{"question_id": 1, "answer": "Yes"}], annos)
    assert acc["overall"] == 100.0
    # 'no': subsets have 2 or 3 'no' -> avg of 7*(3/3->1? no: leave out a yes
    # keeps 3 'no' -> 1.0) and 3*(2/3): (7*1 + 3*2/3)/10 = 0.9
    acc = ev.evaluate([{"question_id": 1, "answer": "no"}], annos)
    assert abs(acc["overall"] - 90.0) < 0.01
    assert acc["perAnswerType"]["yes/no"] == acc["overall"]


def test_evaluate_miss_scores_zero():
    annos = [{"question_id": 5, "answers": [{"answer": "red"}] * 10,
              "question_type": "what color", "answer_type": "other"}]
    acc = VQAEval().evaluate([{"question_id": 5, "answer": "blue"}], annos)
    assert acc["overall"] == 0.0


def test_gt_normalization_asymmetry():
    """The official protocol (vqaEval.py:93-97) never digit-maps GT answers
    and punct-processes them only when the humans disagree — so NO
    prediction can ever match a unanimous GT 'two' (every pred digit-maps
    to '2'), while pred 'two' DOES match GT '2'."""
    annos = [{"question_id": 1, "answers": [{"answer": "two"}] * 10,
              "question_type": "how many", "answer_type": "number"}]
    assert VQAEval().evaluate(
        [{"question_id": 1, "answer": "2"}], annos)["overall"] == 0.0
    assert VQAEval().evaluate(
        [{"question_id": 1, "answer": "two"}], annos)["overall"] == 0.0
    annos[0]["answers"] = [{"answer": "2"}] * 10
    assert VQAEval().evaluate(
        [{"question_id": 1, "answer": "two"}], annos)["overall"] == 100.0
    # unanimous GT keeps its punctuation: pred 'dog' misses GT 'dog!'
    annos = [{"question_id": 1, "answers": [{"answer": "dog!"}] * 10,
              "question_type": "what", "answer_type": "other"}]
    assert VQAEval().evaluate(
        [{"question_id": 1, "answer": "dog"}], annos)["overall"] == 0.0


def test_vqa_eval_reference_oracle():
    """Run the ACTUAL reference evaluator (`mPLUG/vqaTools/vqaEval.py`) on a
    randomized corpus of contractions / digit words / articles /
    punctuation / unanimous-vs-split GT sets and assert identical overall,
    per-type, and per-question scores."""
    import copy
    import random

    from ref_oracle import load_ref_module

    ref_mod = load_ref_module("ref_vqaEval", "mPLUG/vqaTools/vqaEval.py")

    answers_pool = [
        "yes", "no", "2", "two", "a dog", "dog", "don't know", "dont know",
        "1,000", "1000", "u.s.", "us", "red!", "red", "isnt", "isn't",
        "the man", "man", "none", "0", "left-hand side", "left hand side",
    ]
    qtypes = ["is the", "how many", "what color"]
    atypes = ["yes/no", "number", "other"]
    rng = random.Random(7)
    gts, res, annos, preds = {}, {}, [], []
    for qid in range(60):
        if rng.random() < 0.3:  # unanimous GT set
            gt = [rng.choice(answers_pool)] * 10
        else:
            gt = [rng.choice(answers_pool) for _ in range(10)]
        pred = rng.choice(answers_pool)
        qt, at = rng.choice(qtypes), rng.choice(atypes)
        # realistic annotation rows: distinct answer_id per human (real VQA
        # files carry answer_id 1..10 + answer_confidence) — the reference's
        # leave-one-out excludes by whole-dict `!=`, which equals
        # exclude-by-index ONLY because these fields differ
        mk = lambda: [{"answer": a, "answer_id": i + 1,
                       "answer_confidence": "yes"}
                      for i, a in enumerate(gt)]
        gts[qid] = {"answers": mk(), "question_type": qt, "answer_type": at}
        res[qid] = {"answer": pred}
        annos.append({"question_id": qid, "answers": mk(),
                      "question_type": qt, "answer_type": at})
        preds.append({"question_id": qid, "answer": pred})

    class _FakeVQA:
        def __init__(self, qa):
            self.qa = qa

        def getQuesIds(self):
            return list(self.qa)

    # deep copies: the reference evaluator MUTATES gt answer dicts in place
    ref = ref_mod.VQAEval(_FakeVQA(copy.deepcopy(gts)),
                          _FakeVQA(copy.deepcopy(res)), n=2)
    ref.evaluate()

    ours = VQAEval(n=2)
    acc = ours.evaluate(preds, annos)

    assert acc["overall"] == ref.accuracy["overall"]
    assert acc["perQuestionType"] == ref.accuracy["perQuestionType"]
    assert acc["perAnswerType"] == ref.accuracy["perAnswerType"]
    assert ours.eval_qa == ref.evalQA
