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


WORDPIECE_MARK = "[##WordPiece]"


def bio_label_rows(
    text: str, spo_list: list[dict], tokenizer: "WordPieceTokenizer"
) -> list[tuple[str, list[str], list[str]]]:
    """M9: WordPiece BIO training rows, one per (sentence, predicate)
    group — exact semantics of the legacy generator
    (/root/reference/legacy/labeling/bert/bin/subject_object_labeling/
    sequence_labeling_data_manager.py:32-98):

    * spo_list grouped by predicate; each group gets its own O-initialized
      label list over the tokenized text;
    * each subject/object is tokenized and located as a token SUBLIST at
      its FIRST occurrence only; B-SUB/B-OBJ at the start, I-* for the
      rest;
    * entities whose token sequence does not occur (the reference's
      "##"-prefix tokener error) poison the whole predicate group — the
      row is skipped, matching the reference's error-log-and-drop;
    * AFTER span marking, every "##"-continuation token's label is
      overwritten with the special ``[##WordPiece]`` mark.
    """
    toks = tokenizer.tokenize(text)
    by_pred: dict[str, list[tuple[str, str]]] = {}
    for spo in spo_list or []:
        if "subject" not in spo or "object" not in spo:
            continue
        by_pred.setdefault(spo["predicate"], []).append(
            (spo["subject"], spo["object"])
        )

    def find_sub(needle: list[str]) -> int | None:
        n, k = len(toks), len(needle)
        for i in range(n - k + 1):
            if toks[i : i + k] == needle:
                return i
        return None

    out = []
    for predicate, pairs in by_pred.items():
        labels = ["O"] * len(toks)
        error = False
        for sub, obj in pairs:
            for entity, role in ((sub, "SUB"), (obj, "OBJ")):
                ent_toks = tokenizer.tokenize(entity)
                idx = find_sub(ent_toks) if ent_toks else None
                if idx is None:
                    error = True
                    continue
                labels[idx] = f"B-{role}"
                for j in range(idx + 1, idx + len(ent_toks)):
                    labels[j] = f"I-{role}"
        if error:
            continue
        row_labels = [
            WORDPIECE_MARK if t.startswith("##") else lab
            for t, lab in zip(toks, labels)
        ]
        out.append((predicate, toks, row_labels))
    return out


def wordpiece_bio_rows(sentences, vocab: dict[str, int] | None = None,
                       max_seq_length: int = 128):
    """Dataset surface for M9: (doc_id, text, spo_list) -> one row per
    (doc, predicate) with token and BIO-label lists.  The tokenizer vocab
    is built once per task/actor."""

    class Gen:
        def __init__(self):
            self.tok = WordPieceTokenizer(vocab, max_seq_length)

        def __call__(self, batch: pa.Table) -> pa.Table:
            doc_ids = batch["doc_id"].to_pylist()
            texts = batch["text"].to_pylist()
            spos = batch["spo_list"].to_pylist()
            out = {"doc_id": [], "predicate": [], "tokens": [], "labels": []}
            for d, t, s in zip(doc_ids, texts, spos):
                for pred, toks, labels in bio_label_rows(t, s or [], self.tok):
                    out["doc_id"].append(d)
                    out["predicate"].append(pred)
                    out["tokens"].append(toks)
                    out["labels"].append(labels)
            return pa.table(
                {
                    "doc_id": pa.array(out["doc_id"], pa.string()),
                    "predicate": pa.array(out["predicate"], pa.string()),
                    "tokens": pa.array(out["tokens"], pa.list_(pa.string())),
                    "labels": pa.array(out["labels"], pa.list_(pa.string())),
                }
            )

    return sentences.map_batches(Gen(), batch_format="pyarrow")


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
