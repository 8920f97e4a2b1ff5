"""Featurize-family operators (SURVEY.md §2.2/§2.3): M1 multi-hot, M4
index+pad, M5 postag expander, A9/G8 vocab build, M16/M17 filters, J4
composition check, G1/G3 statistics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from kgray.corpus import doc_ids_for_range, sentences_table
from kgray.ops import featurize as fz
from kgray.schema import CONCAT_TO_ID, NUM_SCHEMAS

N_DOCS = 120
SEED = 42


def _sentences():
    return sentences_table(doc_ids_for_range(0, N_DOCS), seed=SEED)


def test_multihot_matches_spo_list():
    t = _sentences()
    out = fz.add_multihot_target(t)
    mat = np.asarray(out["target"].combine_chunks().flatten()).reshape(
        len(t), NUM_SCHEMAS
    )
    rows = t.to_pylist()
    for r, row in enumerate(rows):
        want = {
            CONCAT_TO_ID[s["subject_type"] + s["predicate"] + s["object_type"]]
            for s in row["spo_list"]
        }
        got = set(np.nonzero(mat[r])[0].tolist())
        assert got == want


def test_index_and_pad_left_pads():
    t = pa.table({"text": ["abc", ""]})
    vocab = {"a": 2, "b": 3}
    out = fz.index_and_pad(t, vocab, sent_len=6)
    ids = np.asarray(out["char_ids"].combine_chunks().flatten()).reshape(2, 6)
    assert ids[0].tolist() == [0, 0, 0, 2, 3, 1]  # left pad; c -> unk(1)
    assert ids[1].tolist() == [0] * 6


def test_expand_postag_alignment():
    t = _sentences()
    out = fz.expand_postag(t)
    texts = t["text"].to_pylist()
    words = out["word_per_char"].to_pylist()
    poss = out["pos_per_char"].to_pylist()
    postags = t["postag"].to_pylist()
    for text, w, p, pt in zip(texts, words, poss, postags):
        if pt:  # non-empty postag rows align with text length
            assert len(w) == len(text) and len(p) == len(text)
        else:
            assert w == [] and p == []


def test_vocab_counts_match_serial(ray_session):
    t = _sentences()
    ds = rd.from_arrow(t)
    got = {
        r["token"]: r["n"]
        for r in fz.vocab_counts(ds, "char").to_pandas().to_dict("records")
    }
    want: dict[str, int] = {}
    for text in t["text"].to_pylist():
        for c in text:
            want[c] = want.get(c, 0) + 1
    assert got == want


def test_build_vocab_deterministic_ids(ray_session):
    ds = rd.from_arrow(_sentences())
    v1 = fz.build_vocab(ds, "char")
    v2 = fz.build_vocab(ds, "char")
    assert v1 == v2
    assert min(v1.values()) == 2  # 0=pad, 1=unk reserved


def test_filters(ray_session):
    t = _sentences()
    ds = rd.from_arrow(t)
    usable = fz.filter_unusable(ds).count()
    n_empty = sum(
        1
        for row in t.to_pylist()
        if not row["postag"] or not row["spo_list"]
    )
    assert usable == len(t) - n_empty

    adapted = fz.filter_by_predicate(ds, "改编自").take_all()
    for row in adapted:
        assert any(s["predicate"] == "改编自" for s in row["spo_list"])
    n_serial = sum(
        1
        for row in t.to_pylist()
        if any(s["predicate"] == "改编自" for s in row["spo_list"])
    )
    assert len(adapted) == n_serial

    eq = fz.filter_sub_eq_obj(ds).take_all()
    for row in eq:
        assert any(s["subject"] == s["object"] for s in row["spo_list"])


def test_schema_questions_shape():
    q = fz.schema_questions()
    assert q.num_rows == NUM_SCHEMAS
    assert all("是什么？" in s for s in q["question"].to_pylist())


def test_composition_check_all_ok_on_pipeline_output(ray_session):
    from kgray.corpus import interleaved_dataset
    from kgray.pipeline import PipelineConfig, extract_triples, flatten_documents

    docs = interleaved_dataset(N_DOCS, seed=SEED)
    triples = extract_triples(docs, PipelineConfig())
    flat = flatten_documents(interleaved_dataset(N_DOCS, seed=SEED))
    checked = fz.composition_check(triples, flat).to_pandas()
    assert len(checked) > 0
    assert checked["s_ok"].all() and checked["o_ok"].all()


def test_spo_histogram_and_empty_counts(ray_session):
    t = _sentences()
    ds = rd.from_arrow(t)
    hist = {
        r["n_spo"]: r["n_rows"]
        for r in fz.spo_count_histogram(ds).to_pandas().to_dict("records")
    }
    want: dict[int, int] = {}
    for row in t.to_pylist():
        k = len(row["spo_list"])
        want[k] = want.get(k, 0) + 1
    assert hist == want

    ec = fz.empty_field_counts(ds).to_pylist()[0]
    assert ec["total"] == len(t)
    assert ec["empty_postag"] == sum(1 for r in t.to_pylist() if not r["postag"])


def test_postag_reconstruction_check(ray_session):
    import ray.data as rd

    from kgray.ops.featurize import postag_reconstruction_check

    rows = [
        {"doc_id": "ok", "text": "甲乙丙",
         "postag": [{"word": "甲乙", "pos": "n"}, {"word": "丙", "pos": "n"}]},
        {"doc_id": "bad", "text": "甲乙丙",
         "postag": [{"word": "甲", "pos": "n"}, {"word": "丙", "pos": "n"}]},
        {"doc_id": "empty", "text": "", "postag": []},
    ]
    out = postag_reconstruction_check(rd.from_items(rows)).to_pandas()
    got = dict(zip(out["doc_id"], out["ok"]))
    assert got == {"ok": True, "bad": False, "empty": True}


def test_corpus_postag_reconstructs_text(ray_session):
    """The synthetic corpus must satisfy the reference's invariant except
    for the planted empty-postag edge rows."""
    import ray.data as rd

    from kgray.corpus import doc_ids_for_range, sentences_table
    from kgray.ops.featurize import postag_reconstruction_check

    ds = rd.from_arrow(sentences_table(doc_ids_for_range(0, 120), seed=42))
    out = postag_reconstruction_check(ds).to_pandas()
    bad = out[~out["ok"]]
    # only rows with EMPTY postag (the planted edge rate) may fail
    assert (bad["n_words"] == 0).all()
