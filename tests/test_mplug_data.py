"""mPLUG data pipeline: annotation parsing, fixed answer slots, weights."""
import json

import numpy as np

from crvqa_tpu.data.mplug_data import MPlugEntries, load_entries


class _Tok:
    def __call__(self, texts, padding=None, truncation=None, max_length=None,
                 add_special_tokens=True):
        ids, mask = [], []
        for t in texts:
            toks = [hash(w) % 97 + 1 for w in t.split()][:max_length]
            pad = max_length - len(toks)
            ids.append(toks + [0] * pad)
            mask.append([1] * len(toks) + [0] * pad)
        return {"input_ids": ids, "attention_mask": mask}


def test_load_entries_weights_and_bias(tmp_path):
    records = [
        {"question_id": 7, "question": "what color is the cat",
         "image": "img/1.jpg",
         "answer": ["red", "red", "red", "blue"],
         "bias": [0.5, 0.1]},
        {"question_id": 8, "question": "is it raining",
         "image": "img/2.jpg", "answer": "yes"},
    ]
    path = tmp_path / "train.json"
    json.dump(records, open(path, "w"))
    e = load_entries([str(path)], _Tok(), q_len=6, a_len=4,
                     answers_per_question=3, vqa_root="/data")
    assert len(e) == 2
    assert e.question_tokens.shape == (2, 6)
    assert e.answer_tokens.shape == (2, 3, 4)
    # unique answers with count/len(answers) weights: red 3/4, blue 1/4
    np.testing.assert_allclose(sorted(e.weights[0], reverse=True)[:2],
                               [0.75, 0.25])
    assert e.weights[0].sum() <= 1.0 + 1e-6
    # single-string answer becomes one slot of weight 1
    np.testing.assert_allclose(e.weights[1], [1.0, 0.0, 0.0])
    # per-answer bias attaches positionally
    np.testing.assert_allclose(e.bias[0][:2], [0.5, 0.1])
    assert e.image_paths[0] == "/data/img/1.jpg"
    assert list(e.question_ids) == [7, 8]
