"""mPLUG data pipeline: annotation parsing, fixed answer slots, weights."""
import json

import numpy as np

from crvqa_tpu.data.mplug_data import MPlugEntries, load_entries


class _Tok:
    sep_token_id = 98

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
         # one prior per RAW answer incl. duplicates — the
         # build_vqacp_ocr contract ('[probs[qtype][a] for a in answer]')
         "bias": [0.5, 0.5, 0.5, 0.1]},
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
    # per-answer bias follows each answer through the dedup BY KEY (review
    # finding: positional truncation fed 'blue' the bias of 'red'), and the
    # FIRST occurrence of a duplicated answer keeps its bias, like the
    # reference's not-seen-branch append (vqa_dataset.py:85-91)
    np.testing.assert_allclose(e.bias[0][:2], [0.5, 0.1])
    assert e.image_paths[0] == "/data/img/1.jpg"
    assert list(e.question_ids) == [7, 8]
    # answer rows end with an EXTRA eos token — the reference tokenizes
    # `answer + '[SEP]'` with auto specials (vqa_dataset.py:107), so rows
    # read ... [SEP] [SEP]
    row = e.answer_tokens[1, 0]
    end = int(e.answer_mask[1, 0].sum())
    assert row[end - 1] == _Tok.sep_token_id
    assert e.answer_mask[0, 0].sum() == 2  # 'red' -> 1 tok + appended sep


def test_first_wins_bias_on_conflicting_duplicates(tmp_path):
    """A duplicated answer with DIFFERENT per-occurrence biases keeps the
    first one (the reference appends bias only when the answer is first
    seen, vqa_dataset.py:85-91)."""
    records = [{"question_id": 1, "question": "q", "image": "i.jpg",
                "answer": ["yes", "no", "yes"], "bias": [0.9, 0.2, 0.1]}]
    path = tmp_path / "t.json"
    json.dump(records, open(path, "w"))
    e = load_entries([str(path)], _Tok(), q_len=4, a_len=4,
                     answers_per_question=3)
    np.testing.assert_allclose(e.bias[0][:2], [0.9, 0.2])


class TestAugment:
    """RandAugment stack (mPLUG/dataset/__init__.py:28-35,
    dataset/randaugment.py) — deterministic given a Generator."""

    def _img(self, seed=0, size=48):
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, (size, size, 3)).astype(np.uint8)

    def test_deterministic_given_seed(self):
        from PIL import Image

        from crvqa_tpu.data.augment import train_transform

        pil = Image.fromarray(self._img())
        a = train_transform(pil, np.random.default_rng(7), 32)
        b = train_transform(pil, np.random.default_rng(7), 32)
        c = train_transform(pil, np.random.default_rng(8), 32)
        np.testing.assert_array_equal(a, b)
        assert a.shape == (32, 32, 3) and a.dtype == np.float32
        assert np.abs(a - c).max() > 0  # different seed, different image

    def test_op_semantics(self):
        from crvqa_tpu.data import augment as A

        img = self._img(1)
        # autocontrast stretches to full range
        ac = A.autocontrast((img // 2 + 64).astype(np.uint8))
        assert ac.min() == 0 and ac.max() == 255
        # equalize flattens the histogram of a skewed image
        skewed = (img // 4).astype(np.uint8)
        eq = A.equalize(skewed)
        assert eq.max() > skewed.max()
        # brightness factor 1.0 is identity; 0.5 darkens
        np.testing.assert_array_equal(A.brightness(img, 1.0), img)
        assert A.brightness(img, 0.5).mean() < img.mean()
        # translate fills vacated pixels with 128
        tx = A.translate_x(img, 10.0)
        assert (tx[:, -1] == 128).all() or (tx[:, 0] == 128).all()
        # rotate(0) is identity (bilinear at integer coords)
        np.testing.assert_array_equal(A.rotate(img, 0.0), img)
        # shear changes geometry but keeps shape
        assert A.shear_x(img, 0.21).shape == img.shape

    def test_test_transform_matches_manual(self):
        from PIL import Image

        from crvqa_tpu.data.augment import CLIP_MEAN, CLIP_STD, test_transform

        pil = Image.fromarray(self._img(2))
        out = test_transform(pil, 24)
        ref = (np.asarray(pil.resize((24, 24), Image.BICUBIC), np.float32)
               / 255.0 - CLIP_MEAN) / CLIP_STD
        np.testing.assert_allclose(out, ref)


def test_question_augmentation_ocr_object():
    """OCR/object splicing (vqa_dataset.py:57-70)."""
    from crvqa_tpu.data.mplug_data import augment_question, pre_question

    rec = {"question": "What's written?",
           "ocr": [[[0, 0], "STOP"], [[1, 1], "Ahead!"]],
           "object_label": "sign&&road"}
    assert augment_question(rec, False, False) == "What's written?"
    assert (augment_question(rec, True, False)
            == "What's written? [SEP] stop ahead")
    assert (augment_question(rec, False, True)
            == "What's written? [SEP] sign road")
    assert (augment_question(rec, True, True)
            == "What's written? [SEP] stop ahead [SEP] sign road")
    # pre_question normalization (utils.py:3-16)
    assert pre_question("What IS this, really?!", 30) == "what is this really"
    assert pre_question("a b c d e", 3) == "a b c"


def test_build_vqacp_ocr(tmp_path):
    """Functional port of mPLUG/data/build_vqacp_ocr.py: split by VQA-CP
    ids, seeded val sample, per-qtype bias, min(count/3,1) labels."""
    import json

    from crvqa_tpu.data.build_vqacp_ocr import main

    ocr = [
        {"question_id": i, "image": f"train2014/img_{i}.jpg",
         "question": f"q{i}",
         "answer": ["yes", "yes", "no"] if i % 2 == 0 else ["2", "2", "2"],
         "ocr": [[[0, 0], "tok"]]}
        for i in range(10)
    ]
    anns = {"annotations": [
        {"question_id": i, "question_type": "is this" if i % 2 == 0 else
         "how many", "answer_type": "yes/no" if i % 2 == 0 else "number"}
        for i in range(10)]}
    (tmp_path / "ocr.json").write_text(json.dumps(ocr))
    (tmp_path / "anns.json").write_text(json.dumps(anns))
    (tmp_path / "cp_train.json").write_text(
        json.dumps([{"question_id": i} for i in range(6)]))
    (tmp_path / "cp_test.json").write_text(
        json.dumps([{"question_id": i} for i in range(6, 10)]))
    out = tmp_path / "out"
    main(["--vqa_ocr_files", str(tmp_path / "ocr.json"),
          "--vqa_annotation_files", str(tmp_path / "anns.json"),
          "--vqacp_train_questions", str(tmp_path / "cp_train.json"),
          "--vqacp_test_questions", str(tmp_path / "cp_test.json"),
          "--output_dir", str(out), "--val_size", "2", "--seed", "0"])
    train = json.load(open(out / "train.json"))
    test = json.load(open(out / "test.json"))
    val = json.load(open(out / "val.json"))
    bias = json.load(open(out / "train_bias.json"))
    labels = json.load(open(out / "test_labels.json"))
    assert [d["question_id"] for d in train] == list(range(6))
    assert [d["question_id"] for d in test] == list(range(6, 10))
    assert len(val) == 2 and all(d["question_id"] >= 6 for d in val)
    # bias: qtype 'is this' answers yes 2/3 each entry -> prob(yes)=2/3
    b0 = bias[0]
    assert b0["question_id"] == 0
    np.testing.assert_allclose(b0["bias"], [2 / 3, 2 / 3, 1 / 3])
    # labels: min(count/3, 1)
    lab = {d["question_id"]: d for d in labels}
    assert lab[6]["label"] == {"yes": 2 / 3, "no": 1 / 3}
    assert lab[7]["label"] == {"2": 1.0}
    assert lab[6]["img_id"] == "img_6"
    # seeded val sample reproduces
    main(["--vqa_ocr_files", str(tmp_path / "ocr.json"),
          "--vqa_annotation_files", str(tmp_path / "anns.json"),
          "--vqacp_train_questions", str(tmp_path / "cp_train.json"),
          "--vqacp_test_questions", str(tmp_path / "cp_test.json"),
          "--output_dir", str(out), "--val_size", "2", "--seed", "0"])
    assert json.load(open(out / "val.json")) == val


def test_loader_augmented_questions_and_images(tmp_path):
    """End-to-end loader: augmented question text reaches the tokens, and
    augment=True produces different image batches across epochs while eval
    stays deterministic."""
    import json

    from PIL import Image

    from crvqa_tpu.data.mplug_data import iterate_batches, load_entries

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(
            rng.randint(0, 256, (64, 64, 3)).astype(np.uint8)).save(
            img_dir / f"im{i}.jpg")
    records = [
        {"question_id": i, "image": f"im{i}.jpg",
         "question": f"what is {i}", "answer": ["cat"],
         "ocr": [[[0, 0], "EXIT"]], "object_label": "door&&wall"}
        for i in range(4)
    ]
    ann = tmp_path / "train.json"
    ann.write_text(json.dumps(records))

    class FakeTok:
        sep_token_id = 98

        def __call__(self, texts, padding=None, truncation=None,
                     max_length=None, add_special_tokens=True):
            ids = []
            for t in texts:
                h = [hash(w) % 1000 + 1 for w in t.split()][:max_length]
                ids.append(h + [0] * (max_length - len(h)))
            return {"input_ids": ids,
                    "attention_mask": [[1 if x else 0 for x in row]
                                       for row in ids]}

    plain = load_entries([str(ann)], FakeTok(), vqa_root=str(img_dir))
    aug = load_entries([str(ann)], FakeTok(), vqa_root=str(img_dir),
                       add_ocr=True, add_object=True)
    assert (aug.question_mask.sum() > plain.question_mask.sum())

    b_a = next(iterate_batches(aug, 4, image_res=32, augment=True, seed=1))
    b_b = next(iterate_batches(aug, 4, image_res=32, augment=True, seed=1))
    b_c = next(iterate_batches(aug, 4, image_res=32, augment=True, seed=2))
    b_t = next(iterate_batches(aug, 4, image_res=32))
    np.testing.assert_array_equal(b_a["images"], b_b["images"])
    assert np.abs(b_a["images"] - b_c["images"]).max() > 0
    assert np.abs(b_a["images"] - b_t["images"]).max() > 0

    # worker-count invariance: per-image spawned rngs make pixels a
    # function of the seed alone — threads change wall time, never output
    b_w = next(iterate_batches(aug, 4, image_res=32, augment=True, seed=1,
                               workers=4))
    np.testing.assert_array_equal(b_a["images"], b_w["images"])
    b_tw = next(iterate_batches(aug, 4, image_res=32, workers=3))
    np.testing.assert_array_equal(b_t["images"], b_tw["images"])


def test_eval_batches_mark_ragged_padding_valid():
    """Review finding: the ragged final eval batch was padded with repeats
    of the last example and no `valid` flag, so the CLI appended duplicate
    predictions (skewing cal_metric). Batches now carry `valid`."""
    from crvqa_tpu.data.mplug_data import MPlugEntries, iterate_batches

    n, bs = 5, 4
    e = MPlugEntries(
        question_ids=np.arange(n, dtype=np.int64),
        question_tokens=np.zeros((n, 3), np.int32),
        question_mask=np.ones((n, 3), np.float32),
        answer_tokens=np.zeros((n, 2, 3), np.int32),
        answer_mask=np.ones((n, 2, 3), np.float32),
        weights=np.ones((n, 2), np.float32),
        bias=np.zeros((n, 2), np.float32),
        image_paths=["x"] * n)
    import crvqa_tpu.data.mplug_data as md

    orig = md.load_images
    md.load_images = lambda paths, image_res=384, rng=None, **kw: np.zeros(
        (len(paths), 8, 8, 3), np.float32)
    try:
        batches = list(iterate_batches(e, bs, image_res=8))
    finally:
        md.load_images = orig
    assert batches[0]["valid"].all()
    assert list(batches[1]["valid"]) == [True, False, False, False]
    assert len(batches[1]["qid"]) == bs  # shapes stay static


def test_pre_question_reference_oracle():
    """Fuzz `pre_question` against the ACTUAL reference implementation
    (mPLUG/dataset/utils.py:3-16, executed from its source slice — the
    module tail pulls torch/vqaTools, which the oracle doesn't need)."""
    import random

    from crvqa_tpu.data.mplug_data import pre_question

    src = open("/root/reference/mPLUG/dataset/utils.py").read()
    src = src.split("from vqaTools.vqaEval import VQAEval")[0]
    ns: dict = {}
    exec(compile(src, "ref_dataset_utils", "exec"), ns)
    ref = ns["pre_question"]

    corpus = [
        "What color is the dog?", "Don't you think it's nice?!",
        "is this a left-handed man or right/left?", "WHAT IS THAT *thing*;",
        "trailing spaces   ", 'quotes "inside" (and) #tags ~x:',
        "a b c d e f g h i j k l m n o p", "", "   ", "one-two/three-four",
        "what's on the sign: 'STOP'?", "naïve café — unicode dash",
    ]
    rng = random.Random(5)
    alphabet = "abc '?,.-/\"()*#:;~! "
    corpus += ["".join(rng.choice(alphabet) for _ in range(rng.randrange(40)))
               for _ in range(200)]
    for q in corpus:
        for max_words in (3, 25, 30):
            assert pre_question(q, max_words) == ref(q, max_words), repr(q)
