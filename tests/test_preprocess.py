"""Answer-target cache builder + end-to-end with the real data pipeline and
the offline scorer (synthetic raw annotations -> cache -> loader -> scorer)."""
import json
import os
import pickle

import numpy as np

from crvqa_tpu.data import preprocess, vqacp


def _raw_annotations(n, seed=0):
    rng = np.random.RandomState(seed)
    answers_pool = ["yes", "no", "red", "blue", "2", "cat"]
    annos = []
    for i in range(n):
        main = answers_pool[rng.randint(len(answers_pool))]
        answers = [{"answer": main}] * rng.randint(4, 11)
        answers += [{"answer": answers_pool[rng.randint(len(answers_pool))]}
                    for _ in range(10 - len(answers))]
        annos.append({
            "question_id": i, "image_id": 100 + i % 3,
            "question_type": "what" if i % 2 else "is the",
            "answer_type": "other",
            "answers": answers,
            "multiple_choice_answer": main,
        })
    return {"annotations": annos}


def test_build_cache_and_load(tmp_path):
    dataroot = str(tmp_path)
    train_anno = os.path.join(dataroot, "train_anno.json")
    test_anno = os.path.join(dataroot, "test_anno.json")
    json.dump(_raw_annotations(40, 0), open(train_anno, "w"))
    json.dump(_raw_annotations(20, 1), open(test_anno, "w"))
    info = preprocess.build_cache(dataroot, train_anno, test_anno,
                                  min_occurrence=3)
    assert info["ans_num"] >= 4

    ans2label, label2ans = vqacp.load_answer_vocab(dataroot)
    assert len(ans2label) == info["ans_num"]

    with open(os.path.join(dataroot, "cache", "train_target.pkl"), "rb") as f:
        targets = pickle.load(f)
    assert len(targets) == 40
    t = targets[0]
    assert set(t) == {"question_id", "image_id", "question_type", "labels",
                      "scores"}
    assert all(0 < s <= 1 for s in t["scores"])

    # scorer consumes the generated target_count annotations
    import torch

    counts = torch.load(os.path.join(dataroot, "cache",
                                     "test_target_count.pth"),
                        weights_only=False)
    from crvqa_tpu.evals import compute_vqacp_scores

    preds = [{"question_id": c["question_id"],
              "answer": c["answers_word"][0]} for c in counts]
    res = compute_vqacp_scores(preds, counts)
    assert res["overall"] > 0

    # the question loader consumes the targets with matching question files
    questions = [{"question_id": a["question_id"],
                  "image_id": a["image_id"],
                  "question": "what color is it?"}
                 for a in _raw_annotations(20, 1)["annotations"]]
    with open(os.path.join(dataroot, "vqacp_v2_test_questions.json"), "w") as f:
        json.dump(questions, f)

    class _Tok:
        def tokenize(self, q):
            return q.split()[:5]

        def convert_tokens_to_ids(self, toks):
            if isinstance(toks, str):
                return 0
            return [hash(t) % 100 for t in toks]

    entries = vqacp.load_entries(dataroot, "test", _Tok(), info["ans_num"])
    assert len(entries) == 20
    assert entries.labels.shape == (20, info["ans_num"])
    assert entries.labels.max() > 0
