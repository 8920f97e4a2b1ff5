"""BERT WordPiece tokenizer (M3) — pure python/Arrow, no torch.

Reimplements, from behavior, the reference's tokenization chain:

* BasicTokenizer  (/root/reference/legacy/labeling/bert/tokenization.py:
  194-305): control-char removal, whitespace cleanup, CJK char isolation,
  optional lowercase + accent strip, punctuation splitting;
* WordpieceTokenizer (tokenization.py:371-433): greedy longest-match-first
  over a vocab with "##" continuation pieces, [UNK] for unmatchable or
  over-long words (max_input_chars_per_word=200);
* convert_examples_to_features (/root/reference/classification/
  dataset_bert.py:30-69): truncate to max_seq_length-2, wrap with
  [CLS]/[SEP], all-zero token_type_ids, all-one attention mask, zero-pad
  everything to max_seq_length.

``WordPieceTokenizer`` is the canonical stateful-tokenizer actor: the
vocab dict is built ONCE per actor in ``__init__``; ``__call__`` encodes a
batch and appends three fixed-size-list feature columns.
"""

from __future__ import annotations

import unicodedata

import numpy as np
import pyarrow as pa

PAD, UNK, CLS, SEP = "[PAD]", "[UNK]", "[CLS]", "[SEP]"
SPECIALS = [PAD, UNK, CLS, SEP]


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


def basic_tokenize(text: str, do_lower_case: bool = False) -> list[str]:
    """BasicTokenizer.tokenize: clean -> CJK isolation -> whitespace split
    -> (lower + accent strip) -> punctuation split."""
    cleaned = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        cleaned.append(" " if _is_whitespace(ch) else ch)
    spaced = []
    for ch in cleaned:
        if _is_cjk(ord(ch)):
            spaced += [" ", ch, " "]
        else:
            spaced.append(ch)
    out: list[str] = []
    for token in "".join(spaced).split():
        if do_lower_case:
            token = token.lower()
            token = "".join(
                c for c in unicodedata.normalize("NFD", token)
                if unicodedata.category(c) != "Mn"
            )
        # punctuation split
        cur: list[str] = []
        for ch in token:
            if _is_punctuation(ch):
                if cur:
                    out.append("".join(cur))
                    cur = []
                out.append(ch)
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur))
    return out


def wordpiece(
    token: str,
    vocab: dict[str, int],
    unk_token: str = UNK,
    max_input_chars_per_word: int = 200,
) -> list[str]:
    """Greedy longest-match-first split of ONE basic token
    (tokenization.py:380-433 semantics)."""
    if len(token) > max_input_chars_per_word:
        return [unk_token]
    pieces: list[str] = []
    start = 0
    while start < len(token):
        end = len(token)
        cur = None
        while start < end:
            sub = token[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [unk_token]
        pieces.append(cur)
        start = end
    return pieces


class WordPieceTokenizer:
    """Stateful tokenizer actor for ``map_batches(WordPieceTokenizer,
    concurrency=N)``: vocab built once per actor, batches encoded to the
    dataset_bert.py feature layout (input_ids / attention_mask /
    token_type_ids, fixed-size list<int32>[max_seq_length])."""

    def __init__(
        self,
        vocab: dict[str, int] | None = None,
        max_seq_length: int = 128,
        do_lower_case: bool = False,
        text_col: str = "text",
    ):
        self.vocab = dict(vocab) if vocab is not None else corpus_vocab()
        for sp in SPECIALS:
            if sp not in self.vocab:
                raise ValueError(f"vocab must contain {sp}")
        self.max_seq_length = max_seq_length
        self.do_lower_case = do_lower_case
        self.text_col = text_col

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for tok in basic_tokenize(text, self.do_lower_case):
            out.extend(wordpiece(tok, self.vocab))
        return out

    def features(self, text: str) -> tuple[list[int], list[int], list[int]]:
        """dataset_bert.py:30-50: truncate, [CLS]/[SEP], masks, pad."""
        tokens = self.tokenize(text)[: self.max_seq_length - 2]
        tokens = [CLS] + tokens + [SEP]
        ids = [self.vocab[t] for t in tokens]
        mask = [1] * len(ids)
        pad = [0] * (self.max_seq_length - len(ids))
        return ids + pad, mask + pad, [0] * self.max_seq_length

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        n = len(texts)
        L = self.max_seq_length
        ids = np.zeros((n, L), np.int32)
        mask = np.zeros((n, L), np.int32)
        for i, text in enumerate(texts):
            row_ids, row_mask, _ = self.features(text)
            ids[i] = row_ids
            mask[i] = row_mask
        def fsl(mat: np.ndarray) -> pa.FixedSizeListArray:
            return pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1), pa.int32()), L
            )
        return (
            batch.append_column("input_ids", fsl(ids))
            .append_column("attention_mask", fsl(mask))
            .append_column("token_type_ids", fsl(np.zeros((n, L), np.int32)))
        )


def corpus_vocab() -> dict[str, int]:
    """Deterministic vocab over the testdata documents corpus (31 fixed
    words): 16 whole words, 14 words that split into exactly two pieces,
    and 'dup' left unmatchable so the [UNK] path is exercised.  The split
    arithmetic is hand-derivable, which is what makes the wordpiece_stats
    SQL oracle possible."""
    whole = [
        "a", "the", "data", "row", "key", "agg", "fast", "slow", "hash",
        "join", "line", "part", "scan", "sort", "small", "big",
    ]
    pieces = [
        "bat", "##ch", "col", "##umn", "cust", "##omer", "du", "fil",
        "##ter", "gro", "##up", "mer", "##ge", "or", "##der", "qu",
        "##ery", "sp", "##ark", "st", "##ream", "tab", "##le", "val",
        "##ue", "vec", "##tor", "win", "##dow",
    ]
    return {t: i for i, t in enumerate(SPECIALS + whole + pieces)}
