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
