"""Featurization operators: the reference's stage-1/stage-2 data prep
re-expressed as vectorized Arrow batch transforms.

Covers SURVEY.md §2.2/§2.3 items the model stages don't subsume:

* M1  multi-hot target encoder   (classification/dataset.py:10-16)
* M2  char tokenizer             (classification/dataset.py:38)
* M4  vocab index + left-pad     (classification/dataset.py:65-76)
* M5  postag expander            (labeling/dataset.py:12-27)
* M16 empty postag/spo filter    (labeling/dataset.py:52-53)
* M17 predicate-subset exports   (pytorch/analysis/statistic.py:105-177)
* M19 schema->question template  (legacy/explore/auxiliary_question.py:4-14)
* A9/G8 vocabulary builder       (classification/dataset.py:56-62;
                                  labeling/dataset.py:85-114)
* J4  composition check          (legacy/explore/check_composition.py:21-66)
* G1  spo-count histogram        (pytorch/analysis/spo_count.py:10-22)
* G3  empty-field counts         (pytorch/analysis/empty_count.py:11-27)

Vocab build is the canonical distinct-count shuffle: per-batch combiner
(value_counts inside map_batches) then ONE small groupby — the shuffle
moves one row per distinct token per block, not one per occurrence.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from kgray.schema import CONCAT_TO_ID, NUM_SCHEMAS

SENT_LEN = 320  # classification/config.py:31 (max observed text is 300)
PAD_ID = 0
UNK_ID = 1


def _list_lengths(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pc.list_value_length(col).fill_null(0).to_numpy(zero_copy_only=False)


# ---------------------------------------------------------------------------
# M1: spo_list -> 50-dim multi-hot by schema concat identity
# ---------------------------------------------------------------------------

def add_multihot_target(batch: pa.Table, out_col: str = "target") -> pa.Table:
    """One {0,1}^50 vector per row: bit i set iff spo_list contains a triple
    whose subject_type+predicate+object_type concat maps to schema i
    (classification/dataset.py:10-16,22-26)."""
    spo = batch["spo_list"]
    if isinstance(spo, pa.ChunkedArray):
        spo = spo.combine_chunks()
    lengths = _list_lengths(spo)
    flat = spo.flatten()
    concat = pc.binary_join_element_wise(
        flat.field("subject_type"), flat.field("predicate"),
        flat.field("object_type"), "",
    ).to_pylist()
    sids = np.fromiter(
        (CONCAT_TO_ID.get(c, -1) for c in concat), np.int64, len(concat)
    )
    row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    mat = np.zeros((len(batch), NUM_SCHEMAS), np.int8)
    ok = sids >= 0
    mat[row_idx[ok], sids[ok]] = 1
    target = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.int8()), NUM_SCHEMAS
    )
    return batch.append_column(out_col, target)


# ---------------------------------------------------------------------------
# M2/M4: char tokenize + vocab index + left-pad
# ---------------------------------------------------------------------------

def index_and_pad(batch: pa.Table, vocab: dict[str, int],
                  text_col: str = "text", out_col: str = "char_ids",
                  sent_len: int = SENT_LEN) -> pa.Table:
    """chars -> vocab ids, LEFT-padded to ``sent_len``
    (classification/dataset.py:65-76; pad=0, unk=1).  The padded array is
    built inside the batch and not meant to persist across stage
    boundaries (SURVEY.md §7.4: pad only inside actor batches)."""
    texts = batch[text_col].to_pylist()
    mat = np.full((len(texts), sent_len), PAD_ID, np.int32)
    for r, t in enumerate(texts):
        t = t[:sent_len]
        ids = [vocab.get(c, UNK_ID) for c in t]
        mat[r, sent_len - len(ids):] = ids  # left pad
    col = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.int32()), sent_len
    )
    return batch.append_column(out_col, col)


# ---------------------------------------------------------------------------
# M5: postag expander — word/pos repeated per char, aligned with text
# ---------------------------------------------------------------------------

def expand_postag(batch: pa.Table) -> pa.Table:
    """Per row: word/pos sequences repeated per char so len(word) ==
    len(pos) == len(text) (labeling/dataset.py:12-27: ``word +=
    [tag['word']]*len(tag['word'])``)."""
    postag = batch["postag"]
    if isinstance(postag, pa.ChunkedArray):
        postag = postag.combine_chunks()
    words_out, pos_out = [], []
    for row in postag.to_pylist():
        w_seq, p_seq = [], []
        for tag in row or []:
            w_seq.extend([tag["word"]] * len(tag["word"]))
            p_seq.extend([tag["pos"]] * len(tag["word"]))
        words_out.append(w_seq)
        pos_out.append(p_seq)
    return batch.append_column(
        "word_per_char", pa.array(words_out, pa.list_(pa.string()))
    ).append_column("pos_per_char", pa.array(pos_out, pa.list_(pa.string())))


# ---------------------------------------------------------------------------
# A9/G8: vocabulary builder (distributed distinct-count)
# ---------------------------------------------------------------------------

def vocab_counts(ds, kind: str = "char", text_col: str = "text"):
    """token -> count Dataset over the corpus.  kind: char (M2 path),
    word / pos (postag fields).  Per-batch value_counts combiner first, so
    the groupby shuffle moves one row per distinct token per block
    (classification/dataset.py:56-62; labeling/dataset.py:85-114)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        if kind == "char":
            toks = pd.Series(
                [c for t in batch[text_col].to_pylist() for c in t]
            )
        else:
            field = {"word": "word", "pos": "pos"}[kind]
            toks = pd.Series(
                [
                    tag[field]
                    for row in batch["postag"].to_pylist()
                    for tag in (row or [])
                ]
            )
        vc = toks.value_counts()
        return pa.table(
            {
                "token": pa.array(vc.index.astype(str), pa.string()),
                "n": pa.array(vc.to_numpy(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


def build_vocab(ds, kind: str = "char", min_count: int = 1) -> dict[str, int]:
    """Materialize a token -> id dict (0=pad, 1=unk, then tokens by
    (-count, token) for determinism).  Small result: safe to collect."""
    t = vocab_counts(ds, kind).to_pandas()
    t = t[t["n"] >= min_count].sort_values(
        ["n", "token"], ascending=[False, True]
    )
    return {tok: i + 2 for i, tok in enumerate(t["token"])}


# ---------------------------------------------------------------------------
# M16/M17: filters
# ---------------------------------------------------------------------------

def filter_unusable(ds):
    """Drop rows with empty postag or empty spo_list
    (labeling/dataset.py:52-53)."""

    def keep(batch: pa.Table) -> pa.Table:
        np_len = _list_lengths(batch["postag"])
        ns_len = _list_lengths(batch["spo_list"])
        return batch.filter(pa.array((np_len > 0) & (ns_len > 0)))

    return ds.map_batches(keep, batch_format="pyarrow")


def filter_by_predicate(ds, predicate: str):
    """Rows whose spo_list contains ``predicate``
    (pytorch/analysis/statistic.py:105-126 export pattern)."""

    def keep(batch: pa.Table) -> pa.Table:
        spo = batch["spo_list"]
        if isinstance(spo, pa.ChunkedArray):
            spo = spo.combine_chunks()
        lengths = _list_lengths(spo)
        preds = spo.flatten().field("predicate").to_numpy(zero_copy_only=False)
        row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        hit = np.zeros(len(batch), bool)
        hit[row_idx[preds == predicate]] = True
        return batch.filter(pa.array(hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def filter_sub_eq_obj(ds):
    """Rows containing a triple with subject == object
    (pytorch/analysis/statistic.py:129-143)."""

    def keep(batch: pa.Table) -> pa.Table:
        spo = batch["spo_list"]
        if isinstance(spo, pa.ChunkedArray):
            spo = spo.combine_chunks()
        lengths = _list_lengths(spo)
        flat = spo.flatten()
        eq = pc.equal(flat.field("subject"), flat.field("object")).to_numpy(
            zero_copy_only=False
        )
        row_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        hit = np.zeros(len(batch), bool)
        hit[row_idx[eq]] = True
        return batch.filter(pa.array(hit))

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# M19: schema -> auxiliary question template
# ---------------------------------------------------------------------------

def schema_questions() -> pa.Table:
    """One question string per schema: "P的S和O是什么？"
    (legacy/explore/auxiliary_question.py:4-14)."""
    from kgray.schema import SCHEMAS

    rows = sorted(SCHEMAS, key=lambda s: s.schema_id)
    return pa.table(
        {
            "schema_id": pa.array([s.schema_id for s in rows], pa.int32()),
            "question": pa.array(
                [
                    f"{s.predicate}的{s.subject_type}和{s.object_type}是什么？"
                    for s in rows
                ],
                pa.string(),
            ),
        }
    )


# ---------------------------------------------------------------------------
# J4: composition check — every emitted entity is a substring of its text
# ---------------------------------------------------------------------------

def composition_check(triples, docs_flat):
    """Validate predicted triples against source text: entity must occur in
    the doc's text (legacy/explore/check_composition.py:21-66).  Returns
    (doc_id, subject, object, s_ok, o_ok) rows; broadcast-free — texts
    arrive via a partitioned hash join on doc_id."""
    from kgray.ops.joins import bucket_join

    joined = bucket_join(
        triples, docs_flat, on="doc_id", right_on="doc_id", how="left",
        num_buckets=16,
    )

    def check(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        subs = batch["subject"].to_pylist()
        objs = batch["object"].to_pylist()
        s_ok = [bool(t and s in t) for s, t in zip(subs, texts)]
        o_ok = [bool(t and o in t) for o, t in zip(objs, texts)]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "subject": batch["subject"],
                "object": batch["object"],
                "s_ok": pa.array(s_ok, pa.bool_()),
                "o_ok": pa.array(o_ok, pa.bool_()),
            }
        )

    return joined.map_batches(check, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# G1/G3: corpus statistics
# ---------------------------------------------------------------------------

def spo_count_histogram(sentences):
    """Distribution of len(spo_list) per row
    (pytorch/analysis/spo_count.py:10-22)."""
    from ray.data.aggregate import Count

    def lens(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"n_spo": pa.array(_list_lengths(batch["spo_list"]))}
        )

    return (
        sentences.map_batches(lens, batch_format="pyarrow")
        .groupby("n_spo")
        .aggregate(Count(alias_name="n_rows"))
    )


def empty_field_counts(sentences) -> pa.Table:
    """Counts of rows with empty postag / empty spo_list / empty text
    (pytorch/analysis/empty_count.py:11-27) — per-batch partial sums +
    ds.sum, three scalars materialize."""
    def partial(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "empty_postag": pa.array(
                    [int((_list_lengths(batch["postag"]) == 0).sum())]
                ),
                "empty_spo": pa.array(
                    [int((_list_lengths(batch["spo_list"]) == 0).sum())]
                ),
                "empty_text": pa.array(
                    [
                        int(
                            pc.sum(
                                pc.cast(
                                    pc.equal(
                                        pc.utf8_length(batch["text"]), 0
                                    ),
                                    pa.int64(),
                                )
                            ).as_py()
                            or 0
                        )
                    ]
                ),
                "total": pa.array([len(batch)]),
            }
        )

    sums = sentences.map_batches(partial, batch_format="pyarrow").sum(
        ["empty_postag", "empty_spo", "empty_text", "total"]
    )
    return pa.table(
        {
            "empty_postag": pa.array([sums["sum(empty_postag)"]], pa.int64()),
            "empty_spo": pa.array([sums["sum(empty_spo)"]], pa.int64()),
            "empty_text": pa.array([sums["sum(empty_text)"]], pa.int64()),
            "total": pa.array([sums["sum(total)"]], pa.int64()),
        }
    )


def fill_random_spo(sentences, seed: int = 0):
    """M18 (legacy/explore/random_spo.py:18-41): rows whose spo_list is
    EMPTY but whose postag is not get exactly one filler triple — a
    random schema, subject and object each drawn from the row's postag
    words.  The reference uses the global ``random`` module; here draws
    are seeded per doc (crc32(doc_id) ^ seed) so the diagnostic is
    deterministic and distributed-safe (no shared RNG state across
    batches).  Emits (doc_id, subject, predicate, object, filled)."""
    import zlib

    from kgray.schema import SCHEMAS

    def fill(batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        spo_lists = batch["spo_list"].to_pylist()
        postags = batch["postag"].to_pylist()
        out = {"doc_id": [], "subject": [], "predicate": [], "object": [],
               "filled": []}
        for doc_id, spo_list, postag in zip(doc_ids, spo_lists, postags):
            if spo_list:
                for s in spo_list:
                    out["doc_id"].append(doc_id)
                    out["subject"].append(s.get("subject", ""))
                    out["predicate"].append(s.get("predicate", ""))
                    out["object"].append(s.get("object", ""))
                    out["filled"].append(False)
            elif postag:
                rng = np.random.RandomState(
                    (zlib.crc32(str(doc_id).encode()) ^ seed) & 0x7FFFFFFF
                )
                schema = SCHEMAS[rng.randint(0, len(SCHEMAS))]
                words = [p["word"] for p in postag]
                out["doc_id"].append(doc_id)
                out["subject"].append(words[rng.randint(0, len(words))])
                out["predicate"].append(schema.predicate)
                out["object"].append(words[rng.randint(0, len(words))])
                out["filled"].append(True)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "subject": pa.array(out["subject"], pa.string()),
                "predicate": pa.array(out["predicate"], pa.string()),
                "object": pa.array(out["object"], pa.string()),
                "filled": pa.array(out["filled"], pa.bool_()),
            }
        )

    return sentences.map_batches(fill, batch_format="pyarrow")


def postag_reconstruction_check(sentences):
    """J4 companion (legacy/explore/check_composition.py:7-18): does the
    concatenation of postag words reconstruct the sentence text exactly?
    Emits per-doc (ok, n_words); rows with empty postag are counted as
    not-ok only when the text is non-empty (the reference prints every
    mismatch; we emit the flag so the caller aggregates)."""

    def check(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        postags = batch["postag"].to_pylist()
        ok, n_words = [], []
        for t, ps in zip(texts, postags):
            ps = ps or []
            concat = "".join(p["word"] for p in ps)
            ok.append(concat == t)
            n_words.append(len(ps))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ok": pa.array(ok, pa.bool_()),
                "n_words": pa.array(n_words, pa.int64()),
            }
        )

    return sentences.map_batches(check, batch_format="pyarrow")
