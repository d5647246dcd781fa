"""Tokenization coverage (VERDICT r2 weak #1 / missing #4).

Golden-tests the self-contained WordPiece tokenizer against the pip
`transformers.BertTokenizer` on the reference's real 30,522-entry vocab
(`/root/reference/lxmert_config/vocab.txt` — public bert-base-uncased data)
over realistic VQA questions (punctuation, numbers, unicode, contractions,
>14-token truncation), and exercises the load-bearing encode contracts:
the fixed-14 [PAD] layout (`data/vqacp.py:51-63`) and the mPLUG fixed-length
question/answer encode (`data/mplug_data.py:40-46`).
"""
import os

import numpy as np
import pytest

from crvqa_tpu.data.tokenization import WordPieceTokenizer, toy_vocab

REF_VOCAB = "/root/reference/lxmert_config/vocab.txt"

QUESTIONS = [
    "What color is the man's shirt?",
    "How many people are riding bicycles in this photo??",
    "Is this a cafe, a restaurant, or somebody's kitchen table?",
    "What does the sign say? (left side)",
    "Are there 12 or 13 giraffes standing near the watering-hole?",
    "what time is shown on the clock -- 10:45 or 11:15?",
    "Qu'est-ce que c'est — a croissant or a bagel?",  # accents + em-dash
    "Is the TEMPERATURE above 100°F today?",
    "does the skateboarder wear knee-pads &/or elbow pads!?!",
    "Whose umbrella is that...theirs or hers?",
    "这是什么颜色?",  # CJK isolation path
    "name brand of laptop visible on the cafe table near the window sill "
    "behind the barista counter on the left of the picture frame",  # >14 toks
    "",  # empty question
    "   ",  # whitespace only
    "naïve café résumé",  # NFD accent stripping
    # special tokens inside raw text — HF's split_on_tokens layer, incl.
    # GLUED occurrences (the reference feeds answer+'[SEP]' strings,
    # vqa_dataset.py:107; OCR splicing inserts spaced ' [SEP] ')
    "is this a dog? [SEP] stop sign",
    "yes[SEP]",
    "don't know[SEP]",
    "[CLS]prefix and[SEP]glued[PAD]everywhere",
    "[UNK] in text stays [MASK] special",
]


@pytest.fixture(scope="module")
def pair():
    if not os.path.exists(REF_VOCAB):
        pytest.skip("reference vocab not present")
    from transformers import BertTokenizer

    ours = WordPieceTokenizer(vocab_file=REF_VOCAB, do_lower_case=True)
    hf = BertTokenizer(vocab_file=REF_VOCAB, do_lower_case=True)
    return ours, hf


def test_tokenize_golden_vs_hf(pair):
    ours, hf = pair
    for q in QUESTIONS:
        assert ours.tokenize(q) == hf.tokenize(q), q


def test_convert_and_special_ids(pair):
    ours, hf = pair
    assert ours.pad_token_id == hf.pad_token_id == 0
    assert ours.cls_token_id == hf.cls_token_id
    assert ours.sep_token_id == hf.sep_token_id
    toks = ours.tokenize(QUESTIONS[0])
    assert ours.convert_tokens_to_ids(toks) == hf.convert_tokens_to_ids(toks)
    assert ours.convert_tokens_to_ids("[PAD]") == 0


def test_batch_call_golden_vs_hf(pair):
    """The mPLUG encode contract: padding='max_length', truncation, CLS/SEP
    (`vqa_mplug.py:159`, `data/mplug_data.py:40-46`)."""
    ours, hf = pair
    live = [q for q in QUESTIONS if q.strip()]
    enc_o = ours(live, padding="max_length", truncation=True, max_length=16)
    enc_h = hf(live, padding="max_length", truncation=True, max_length=16)
    assert enc_o["input_ids"] == enc_h["input_ids"]
    assert enc_o["attention_mask"] == enc_h["attention_mask"]


def test_decode_roundtrip(pair):
    ours, hf = pair
    ids = ours.encode("what color is the frisbee?", max_length=12)
    assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True)


def test_decode_contraction_cleanup(pair):
    """HF clean_up_tokenization parity on apostrophes/contractions — beam
    answers like \"don't know\" are dict keys in cal_metric
    (evals/scoring.py), so a ' don' t' artifact would silently zero their
    score."""
    ours, hf = pair
    for text in ("i don't know", "the man's hat", "they're not sure",
                 "i 've seen it , really !", "what ' s that ?"):
        ids = ours.encode(text, max_length=20)
        assert ours.decode(ids) == hf.decode(ids, skip_special_tokens=True)
    ids = ours.encode("i don't know", max_length=20)
    assert ours.decode(ids) == "i don't know"


def test_fixed14_question_contract(pair):
    """tokenize_questions pads with [PAD]=0 to exactly 14 and truncates
    longer questions (`dataset_LXM.py` contract, `data/vqacp.py:51-63`)."""
    from crvqa_tpu.data.vqacp import tokenize_questions

    ours, _ = pair
    ids, lengths = tokenize_questions(QUESTIONS[:3] + [QUESTIONS[11]], ours)
    assert ids.shape == (4, 14)
    assert lengths[3] == 14
    assert ids.dtype == np.int32
    # short question ends in pads; long one fills all 14
    toks0 = ours.tokenize(QUESTIONS[0])
    assert (ids[0, len(toks0):] == 0).all()
    assert (ids[3] != 0).all()
    np.testing.assert_array_equal(
        ids[0, : len(toks0)], ours.convert_tokens_to_ids(toks0))


def test_make_tokenizer_uses_self_contained(tmp_path):
    """make_tokenizer(vocab) must return the in-repo tokenizer, not pip
    transformers (the default real-data path is dependency-free)."""
    from crvqa_tpu.data.vqacp import make_tokenizer

    vocab = toy_vocab(["what", "color", "is", "the", "cat"])
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(sorted(vocab, key=vocab.get)) + "\n")
    tok = make_tokenizer(str(vf))
    assert isinstance(tok, WordPieceTokenizer)
    # ','/'?' are not in the toy vocab -> single-char words go to [UNK]
    assert tok.tokenize("What color, is THE cat?") == [
        "what", "color", "[UNK]", "is", "the", "cat", "[UNK]"]
    ids = tok.convert_tokens_to_ids(tok.tokenize("what is the cat"))
    assert all(i != tok.unk_token_id for i in ids)


def test_wordpiece_unk_and_long_token(pair):
    ours, hf = pair
    weird = "zqxjv" * 25  # 125 chars > max_input_chars_per_word
    assert ours.tokenize(weird) == hf.tokenize(weird) == ["[UNK]"]


# ---------------------------------------------------------------- native path

def test_native_encoder_matches_python(pair):
    """The C++ bulk encoder (native/wordpiece.cpp) must produce id-identical
    output to the pure-Python tokenizer on the real vocab — ASCII rows via
    C++, unicode rows via the reported fallback."""
    ours, _ = pair
    native = ours._native_handle()
    assert native, "native encoder failed to build"
    # at least one ASCII question really took the C++ path
    assert native.encode_batch(["what color is the dog?"])[0] is not None
    # unicode rows are reported for fallback, not mis-encoded
    assert native.encode_batch(["naïve café"])[0] is None

    pure = WordPieceTokenizer(vocab_file=REF_VOCAB, native=False)
    assert ours.raw_ids_batch(QUESTIONS) == pure.raw_ids_batch(QUESTIONS)
    enc_n = ours(QUESTIONS, max_length=14)
    enc_p = pure(QUESTIONS, max_length=14)
    assert enc_n == enc_p


def test_native_encoder_ascii_fuzz(pair):
    """Randomized printable-ASCII strings (punctuation runs, control chars,
    specials spliced mid-text) — native == Python on every row."""
    import random
    import string

    ours, _ = pair
    pure = WordPieceTokenizer(vocab_file=REF_VOCAB, native=False)
    rng = random.Random(11)
    alphabet = string.ascii_letters + string.digits + string.punctuation + " \t"
    texts = []
    for _ in range(200):
        n = rng.randrange(0, 60)
        s = "".join(rng.choice(alphabet) for _ in range(n))
        if rng.random() < 0.3:
            s += " [SEP] " + "".join(rng.choice(alphabet)
                                     for _ in range(rng.randrange(0, 10)))
        if rng.random() < 0.1:
            s = s[: n // 2] + "\x07\x01" + s[n // 2:]  # control chars drop
        if rng.random() < 0.05:
            s += "\x00x"  # embedded NUL: C-string hazard -> Python fallback
        texts.append(s)
    assert ours.raw_ids_batch(texts) == pure.raw_ids_batch(texts)


def test_tokenize_questions_native_batch(pair):
    """data/vqacp.tokenize_questions takes the bulk path and matches the
    per-question Python loop (fixed-14 contract preserved)."""
    from crvqa_tpu.data.vqacp import tokenize_questions

    ours, _ = pair
    pure = WordPieceTokenizer(vocab_file=REF_VOCAB, native=False)
    delattr_ok = hasattr(pure, "raw_ids_batch")  # both have the method; force
    ids_n, len_n = tokenize_questions(QUESTIONS, ours)

    # reference loop semantics, computed directly
    import numpy as _np

    pad = pure.convert_tokens_to_ids("[PAD]")
    ids_p = _np.full((len(QUESTIONS), 14), pad, _np.int32)
    len_p = _np.zeros(len(QUESTIONS), _np.int32)
    for i, q in enumerate(QUESTIONS):
        toks = pure.tokenize(q)[:14]
        ids_p[i, : len(toks)] = pure.convert_tokens_to_ids(toks)
        len_p[i] = len(toks)
    _np.testing.assert_array_equal(ids_n, ids_p)
    _np.testing.assert_array_equal(len_n, len_p)
    assert delattr_ok


def test_padding_false_and_no_truncation_vs_hf(pair):
    """HF surface parity for the non-default knobs: padding=False returns
    ragged unpadded rows; truncation=False keeps every token even past the
    native encoder's 512 cap (review finding, r3 pass 3)."""
    ours, hf = pair
    texts = ["what color is the dog?", "is it raining?"]
    enc_o = ours(texts, padding=False, truncation=True, max_length=8)
    enc_h = hf(texts, padding=False, truncation=True, max_length=8)
    assert enc_o["input_ids"] == enc_h["input_ids"]
    assert enc_o["attention_mask"] == enc_h["attention_mask"]
    assert len(enc_o["input_ids"][0]) != len(enc_o["input_ids"][1])

    long = "what color is the dog " * 120  # ~600 wordpieces > the 512 cap
    enc_o = ours([long], padding=False, truncation=False,
                 add_special_tokens=False)
    raw = ours.tokenize(long)
    assert enc_o["input_ids"][0] == ours.convert_tokens_to_ids(raw)
    assert len(enc_o["input_ids"][0]) > 512
