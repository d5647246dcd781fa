"""Self-contained BERT WordPiece tokenizer — no `transformers` dependency.

Implements the exact algorithm of the vendored
`hg_transformers/tokenization_bert.py` (BasicTokenizer :347-483,
WordpieceTokenizer :485-543, helper predicates :545-583), which is the
published Google-BERT tokenization spec: NFC-agnostic text cleaning, CJK
isolation, lowercase + NFD accent stripping, punctuation splitting, then
greedy longest-match-first WordPiece with '##' continuations.

The surface mirrors the slice of the HF tokenizer API this repo uses:
`tokenize`, `convert_tokens_to_ids`, `decode`, and batch `__call__` with
`padding='max_length'`/`truncation`/`max_length` (the mPLUG question/answer
encode path, `mPLUG/vqa_mplug.py:159`). Golden-tested against the pip
`transformers.BertTokenizer` in tests/test_tokenization.py.
"""
from __future__ import annotations

import unicodedata
from typing import Iterable, Optional, Sequence, Union

_CJK_RANGES = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


def _is_whitespace(ch: str) -> bool:
    # \t/\n/\r are control chars in unicode, but BERT treats them as spaces
    return ch in " \t\n\r" or unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in "\t\n\r":
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII non-alphanumerics count as punctuation even when unicode
    # disagrees ('$', '@', '`', ...) — tokenization_bert.py:569-583
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_RANGES)


def _clean(text: str) -> str:
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        out.append(" " if _is_whitespace(ch) else ch)
    return "".join(out)


def _isolate_cjk(text: str) -> str:
    return "".join(f" {ch} " if _is_cjk(ord(ch)) else ch for ch in text)


def _strip_accents(text: str) -> str:
    return "".join(ch for ch in unicodedata.normalize("NFD", text)
                   if unicodedata.category(ch) != "Mn")


def _split_punc(token: str) -> list[str]:
    pieces: list[list[str]] = []
    fresh = True
    for ch in token:
        if _is_punctuation(ch):
            pieces.append([ch])
            fresh = True
        else:
            if fresh:
                pieces.append([])
            fresh = False
            pieces[-1].append(ch)
    return ["".join(p) for p in pieces]


def basic_tokenize(text: str, do_lower_case: bool = True,
                   never_split: Iterable[str] = ()) -> list[str]:
    """BasicTokenizer.tokenize (tokenization_bert.py:370-399)."""
    never = set(never_split)
    text = _isolate_cjk(_clean(text))
    out: list[str] = []
    for token in text.split():
        if token in never:
            out.append(token)
            continue
        if do_lower_case:
            token = _strip_accents(token.lower())
        out.extend(_split_punc(token))
    return [t for t in out if t]


def wordpiece_tokenize(token: str, vocab: dict, unk: str,
                       max_chars: int = 100) -> list[str]:
    """Greedy longest-match-first WordPiece
    (WordpieceTokenizer.tokenize, tokenization_bert.py:493-543)."""
    if len(token) > max_chars:
        return [unk]
    pieces: list[str] = []
    start = 0
    while start < len(token):
        end = len(token)
        match = None
        while start < end:
            sub = token[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                match = sub
                break
            end -= 1
        if match is None:
            return [unk]
        pieces.append(match)
        start = end
    return pieces


class WordPieceTokenizer:
    """Drop-in for the slice of `BertTokenizer` this framework uses."""

    def __init__(self, vocab_file: Optional[str] = None,
                 vocab: Optional[dict] = None, do_lower_case: bool = True,
                 unk_token: str = "[UNK]", cls_token: str = "[CLS]",
                 sep_token: str = "[SEP]", pad_token: str = "[PAD]",
                 mask_token: str = "[MASK]", native: bool = True):
        if vocab is None:
            if vocab_file is None:
                raise ValueError("need vocab_file or vocab")
            vocab = {}
            with open(vocab_file, encoding="utf-8") as f:
                for i, line in enumerate(f):
                    vocab[line.rstrip("\n")] = i
        self.vocab = dict(vocab)
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        self.do_lower_case = do_lower_case
        self.unk_token, self.cls_token = unk_token, cls_token
        self.sep_token, self.pad_token = sep_token, pad_token
        self.mask_token = mask_token
        self.all_special_tokens = [unk_token, cls_token, sep_token,
                                   pad_token, mask_token]
        for t in self.all_special_tokens:
            if t not in self.vocab:
                raise ValueError(f"special token {t!r} missing from vocab")
        self.unk_token_id = self.vocab[unk_token]
        self.cls_token_id = self.vocab[cls_token]
        self.sep_token_id = self.vocab[sep_token]
        self.pad_token_id = self.vocab[pad_token]
        self.mask_token_id = self.vocab[mask_token]
        # native bulk path: None = build lazily on first batch call,
        # False = disabled (pure Python only)
        self._native = None if native else False

    def _native_handle(self):
        """Build (once) the C++ encoder; False if unavailable."""
        if self._native is None:
            try:
                from ..native.wordpiece import NativeWordPiece

                self._native = NativeWordPiece(
                    self.vocab, self.all_special_tokens, self.unk_token_id)
            except Exception:  # no g++ / dense-id violation -> pure Python
                self._native = False
        return self._native

    def raw_ids_batch(self, texts: Sequence[str],
                      cap: int = 512) -> list[list[int]]:
        """Raw wordpiece ids per text (no specials added) — the bulk
        tokenization entry. ASCII rows run through the native C++ encoder
        (goldens in tests/test_tokenization.py prove id-equality with the
        Python path); rows with any non-ASCII byte fall back to the Python
        unicode implementation. `do_lower_case=False` vocabs always take
        the Python path (the C++ encoder implements the lowercase spec)."""
        native = self._native_handle() if self.do_lower_case else False
        if native:
            rows = native.encode_batch(list(texts), cap=cap)
            # GLUED special tokens (e.g. the reference's `answer+'[SEP]'`)
            # must split as substrings like HF's split_on_tokens; the C++
            # encoder only honors whitespace-delimited specials, so such
            # rows take the Python path
            rows = [None if self._has_glued_special(t) else r
                    for r, t in zip(rows, texts)]
        else:
            rows = [None] * len(texts)
        return [r if r is not None
                else self.convert_tokens_to_ids(self.tokenize(t))[:cap]
                for r, t in zip(rows, texts)]

    def _has_glued_special(self, text: str) -> bool:
        """True if any special token occurs NOT whitespace-delimited."""
        for sp in self.all_special_tokens:
            start = 0
            while True:
                i = text.find(sp, start)
                if i < 0:
                    break
                j = i + len(sp)
                if not ((i == 0 or text[i - 1].isspace())
                        and (j == len(text) or text[j].isspace())):
                    return True
                start = j
        return False

    # ---------------------------------------------------------------- core
    def _split_on_specials(self, text: str) -> list[str]:
        """Split special tokens out of the raw text as SUBSTRINGS — HF's
        PreTrainedTokenizer.tokenize `split_on_tokens` layer, which runs
        BEFORE basic tokenization. Matters for glued occurrences: the
        reference feeds `answer + '[SEP]'` strings to its tokenizer
        (vqa_dataset.py:107), and HF still emits the special id there."""
        parts = [text]
        for sp in self.all_special_tokens:
            nxt: list[str] = []
            for p in parts:
                if p in self.all_special_tokens:
                    nxt.append(p)
                    continue
                pieces = p.split(sp)
                for i, frag in enumerate(pieces):
                    if i:
                        nxt.append(sp)
                    if frag:
                        nxt.append(frag)
            parts = nxt
        return parts

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for part in self._split_on_specials(text):
            if part in self.all_special_tokens:
                out.append(part)
                continue
            for token in basic_tokenize(part, self.do_lower_case,
                                        self.all_special_tokens):
                out.extend(wordpiece_tokenize(token, self.vocab,
                                              self.unk_token))
        return out

    def convert_tokens_to_ids(self, tokens: Union[str, Sequence[str]]):
        if isinstance(tokens, str):
            return self.vocab.get(tokens, self.unk_token_id)
        return [self.vocab.get(t, self.unk_token_id) for t in tokens]

    def convert_ids_to_tokens(self, ids) -> list[str]:
        return [self.ids_to_tokens.get(int(i), self.unk_token) for i in ids]

    # ---------------------------------------------------------- encode API
    def encode(self, text: str, max_length: Optional[int] = None,
               add_special_tokens: bool = True) -> list[int]:
        toks = self.tokenize(text)
        if add_special_tokens:
            if max_length is not None:
                toks = toks[: max_length - 2]
            toks = [self.cls_token] + toks + [self.sep_token]
        elif max_length is not None:
            toks = toks[:max_length]
        return self.convert_tokens_to_ids(toks)

    def __call__(self, texts, padding: str = "max_length",
                 truncation: bool = True, max_length: int = 25,
                 add_special_tokens: bool = True, return_tensors=None):
        if isinstance(texts, str):
            texts = [texts]
        cap = max(512, max_length)
        raw = self.raw_ids_batch(texts, cap=cap)
        if not truncation:
            # a row that filled the whole cap may have been cut there —
            # redo those unbounded through the Python path (HF returns all
            # tokens when truncation is off)
            raw = [self.convert_tokens_to_ids(self.tokenize(t))
                   if len(r) >= cap else r
                   for r, t in zip(raw, texts)]
        rows = []
        for r in raw:
            if add_special_tokens:
                if truncation:
                    r = r[: max(0, max_length - 2)]
                r = [self.cls_token_id] + r + [self.sep_token_id]
            elif truncation:
                r = r[:max_length]
            rows.append(r)
        if padding == "longest":
            max_length = max((len(r) for r in rows), default=0)
        elif not padding:  # HF padding=False: ragged, unpadded rows
            max_length = 0
        ids, mask = [], []
        # rows longer than max_length (truncation=False) stay unpadded —
        # the HF behavior (ragged output), never a negative pad count
        for r in rows:
            pad_n = max(0, max_length - len(r))
            ids.append(r + [self.pad_token_id] * pad_n)
            mask.append([1] * len(r) + [0] * pad_n)
        return {"input_ids": ids, "attention_mask": mask}

    # ---------------------------------------------------------------- decode
    def decode(self, ids, skip_special_tokens: bool = True) -> str:
        toks = self.convert_ids_to_tokens(ids)
        if skip_special_tokens:
            toks = [t for t in toks if t not in self.all_special_tokens]
        text = " ".join(toks).replace(" ##", "")
        # HF clean_up_tokenization: reattach punctuation and contractions
        for a, b in ((" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
                     (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"),
                     (" 's", "'s"), (" 've", "'ve"), (" 're", "'re")):
            text = text.replace(a, b)
        return text


def toy_vocab(words: Iterable[str]) -> dict:
    """Deterministic test vocab: specials + whole words + all '##'-suffix
    pieces of each word (so WordPiece can always segment them)."""
    vocab: dict[str, int] = {}
    for t in ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"):
        vocab[t] = len(vocab)
    for w in words:
        for piece in {w} | {"##" + w[i:] for i in range(1, len(w))} | {w[:i] for i in range(1, len(w) + 1)}:
            if piece not in vocab:
                vocab[piece] = len(vocab)
    return vocab
