"""WordPiece tokenizer (M3): basic-tokenizer behaviors, greedy
longest-match semantics, and the dataset_bert.py feature invariants."""

import pyarrow as pa

from kgray.ops.wordpiece import (
    CLS,
    SEP,
    SPECIALS,
    UNK,
    WordPieceTokenizer,
    basic_tokenize,
    corpus_vocab,
    wordpiece,
)


def test_basic_tokenize_punct_and_cjk():
    assert basic_tokenize("hello,world") == ["hello", ",", "world"]
    assert basic_tokenize("abc中文x") == ["abc", "中", "文", "x"]
    # NUL removed, tabs/newlines are whitespace
    assert basic_tokenize("a\x00b\tc\nd") == ["ab", "c", "d"]


def test_basic_tokenize_lower_and_accents():
    assert basic_tokenize("Héllo", do_lower_case=True) == ["hello"]
    assert basic_tokenize("Héllo", do_lower_case=False) == ["Héllo"]


def test_wordpiece_greedy_longest_match():
    vocab = {t: i for i, t in enumerate(SPECIALS + ["un", "##aff", "##able", "руки"])}
    assert wordpiece("unaffable", vocab) == ["un", "##aff", "##able"]
    assert wordpiece("unaffordable", vocab) == [UNK]
    assert wordpiece("руки", vocab) == ["руки"]
    assert wordpiece("x" * 300, vocab) == [UNK]


def test_corpus_vocab_hand_derived_splits():
    tok = WordPieceTokenizer()
    two_piece = [
        "batch", "column", "customer", "filter", "group", "merge", "order",
        "query", "spark", "stream", "table", "value", "vector", "window",
    ]
    one_piece = [
        "a", "the", "data", "row", "key", "agg", "fast", "slow", "hash",
        "join", "line", "part", "scan", "sort", "small", "big",
    ]
    for w in two_piece:
        pieces = wordpiece(w, tok.vocab)
        assert len(pieces) == 2 and UNK not in pieces, (w, pieces)
    for w in one_piece:
        assert wordpiece(w, tok.vocab) == [w]
    assert wordpiece("dup", tok.vocab) == [UNK]


def test_features_invariants():
    """dataset_bert.py:47-50 asserts: every feature list is exactly
    max_seq_length; CLS/SEP wrap; mask is a 1-prefix."""
    tok = WordPieceTokenizer(max_seq_length=16)
    ids, mask, segs = tok.features("the data batch")
    assert len(ids) == len(mask) == len(segs) == 16
    # the(1) + data(1) + batch(2) pieces + CLS + SEP = 6 non-pad positions
    assert sum(mask) == 6
    assert mask[:6] == [1] * 6 and mask[6:] == [0] * 10
    assert ids[0] == tok.vocab[CLS] and ids[5] == tok.vocab[SEP]
    assert ids[6:] == [0] * 10
    assert segs == [0] * 16


def test_features_truncation():
    tok = WordPieceTokenizer(max_seq_length=8)
    ids, mask, _ = tok.features("the " * 50)
    assert len(ids) == 8 and sum(mask) == 8
    assert ids[0] == tok.vocab[CLS] and ids[7] == tok.vocab[SEP]


def test_batch_call_appends_feature_columns():
    tok = WordPieceTokenizer(max_seq_length=12)
    batch = pa.table({"doc_id": [1, 2], "text": ["the data", "dup dup"]})
    out = tok(batch)
    assert {"input_ids", "attention_mask", "token_type_ids"} <= set(
        out.column_names
    )
    ids = out["input_ids"].combine_chunks().to_pylist()
    assert all(len(r) == 12 for r in ids)
    unk_id = corpus_vocab()[UNK]
    assert ids[1][1] == unk_id and ids[1][2] == unk_id


# ---------------------------------------------------------------------------
# M9: WordPiece BIO rows (legacy sequence_labeling_data_manager semantics)
# ---------------------------------------------------------------------------

def _bio_tok():
    vocab = {t: i for i, t in enumerate(
        SPECIALS + ["un", "##aff", "##able", "x", "y", "甲", "乙", "丙", "的"]
    )}
    return WordPieceTokenizer(vocab)


def test_bio_rows_basic_grouping_and_marks():
    from kgray.ops.wordpiece import WORDPIECE_MARK, bio_label_rows

    tok = _bio_tok()
    rows = bio_label_rows(
        "甲的乙 unaffable",
        [
            {"subject": "甲", "predicate": "p1", "object": "乙"},
            {"subject": "乙", "predicate": "p2", "object": "unaffable"},
        ],
        tok,
    )
    got = {pred: (toks, labels) for pred, toks, labels in rows}
    assert set(got) == {"p1", "p2"}
    toks, labels = got["p1"]
    assert toks == ["甲", "的", "乙", "un", "##aff", "##able"]
    # ## continuation tokens are overwritten AFTER span marking
    assert labels == ["B-SUB", "O", "B-OBJ", "O", WORDPIECE_MARK, WORDPIECE_MARK]
    _, labels2 = got["p2"]
    assert labels2 == ["O", "O", "B-SUB", "B-OBJ", WORDPIECE_MARK, WORDPIECE_MARK]


def test_bio_rows_first_occurrence_only():
    from kgray.ops.wordpiece import bio_label_rows

    tok = _bio_tok()
    [(_, toks, labels)] = bio_label_rows(
        "甲乙甲", [{"subject": "甲", "predicate": "p", "object": "乙"}], tok
    )
    assert labels == ["B-SUB", "B-OBJ", "O"]  # only the FIRST 甲 marked


def test_bio_rows_tokener_error_drops_group():
    from kgray.ops.wordpiece import bio_label_rows

    tok = _bio_tok()
    # entity 丙 does not occur in the text -> whole predicate group dropped
    rows = bio_label_rows(
        "甲的乙",
        [
            {"subject": "甲", "predicate": "p1", "object": "丙"},
            {"subject": "甲", "predicate": "p2", "object": "乙"},
        ],
        tok,
    )
    assert [r[0] for r in rows] == ["p2"]


def test_wordpiece_bio_rows_dataset(ray_session):
    import ray.data as rd

    from kgray.corpus import doc_ids_for_range, sentences_table
    from kgray.ops.featurize import build_vocab
    from kgray.ops.wordpiece import wordpiece_bio_rows

    ds = rd.from_arrow(sentences_table(doc_ids_for_range(0, 30), seed=42))
    chars = build_vocab(ds, "char")
    vocab = {t: i for i, t in enumerate(SPECIALS)}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    out = wordpiece_bio_rows(ds, vocab).to_pandas()
    assert len(out) > 20
    assert (out["tokens"].map(len) == out["labels"].map(len)).all()
    assert out["labels"].map(lambda ls: any(l.startswith("B-") for l in ls)).all()
