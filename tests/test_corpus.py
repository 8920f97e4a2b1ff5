"""Corpus generator invariants: determinism, reference-shape constraints,
template/cue hygiene, interleave codec."""

import pyarrow as pa

from kgray.corpus import (
    EDGE_RATES,
    doc_ids_for_range,
    golden_triples_table,
    interleave,
    interleaved_table,
    make_sentence,
    sentences_table,
)
from kgray.ops import spans as sp
from kgray.schema import CONCAT_TO_ID, NUM_SCHEMAS, SCHEMAS
from kgray.templates import CUES, TEMPLATES

IDS = doc_ids_for_range(0, 300)
ROWS = [make_sentence(42, d) for d in IDS]


def test_deterministic_pure_function_of_seed_and_id():
    again = [make_sentence(42, d) for d in IDS[:50]]
    assert again == ROWS[:50]
    other_seed = make_sentence(43, IDS[0])
    assert other_seed != ROWS[0]


def test_postag_concat_reconstructs_text():
    """check_composition.py:7-18 invariant."""
    non_empty = 0
    for r in ROWS:
        if r["postag"]:
            assert "".join(w["word"] for w in r["postag"]) == r["text"]
            non_empty += 1
    assert non_empty > 250  # empty-postag rows are ~1%


def test_max_text_length_under_300():
    """max_length.py:14-17: corpus max is 300."""
    assert max(len(r["text"]) for r in ROWS) <= 300


def test_spo_per_row_distribution_shape():
    ks = [len({(s["subject_type"], s["predicate"], s["object_type"]) for s in r["spo_list"]}) for r in ROWS]
    assert all(1 <= k <= 5 for k in ks)
    assert sum(k == 1 for k in ks) > len(ROWS) * 0.3  # head of spo_count.py dist


def test_subject_eq_object_rows_exist():
    assert any(
        s["subject"] == s["object"] for r in ROWS for s in r["spo_list"]
    )


def test_cue_uniqueness_across_templates():
    """Each filled sentence contains exactly the cues of its schemas."""
    for r in ROWS:
        present = {sid for sid, cue in CUES.items() if cue in r["text"]}
        expected = {
            CONCAT_TO_ID[s["subject_type"] + s["predicate"] + s["object_type"]]
            for s in r["spo_list"]
        }
        assert present == expected, r["text"]


def test_all_schemas_have_templates_and_distinct_cues():
    assert set(TEMPLATES) == set(range(NUM_SCHEMAS))
    cues = list(CUES.values())
    assert len(set(cues)) == len(cues)


def test_every_entity_is_substring_of_text():
    for r in ROWS:
        for s in r["spo_list"]:
            assert s["subject"] in r["text"]
            assert s["object"] in r["text"]


def test_schema_types_match_schema_table():
    valid = {(s.subject_type, s.predicate, s.object_type) for s in SCHEMAS}
    for r in ROWS:
        for s in r["spo_list"]:
            assert (s["subject_type"], s["predicate"], s["object_type"]) in valid


def test_interleave_roundtrip_and_offsets():
    t = interleaved_table(IDS[:80], seed=42)
    assert sp.check_offsets_monotonic(t)
    out = sp.reassemble_text(t)
    texts = {r["doc_id"]: r["text"] for r in ROWS}
    for i in range(len(out)):
        assert out["text"][i].as_py() == texts[out["doc_id"][i].as_py()]


def test_interleave_contains_media_spans():
    t = interleaved_table(IDS[:80], seed=42)
    kinds = t["spans"].combine_chunks().flatten().field("kind").to_pylist()
    assert "image" in kinds or "audio" in kinds
    refs = t["spans"].combine_chunks().flatten().field("media_ref").to_pylist()
    assert any(r.startswith("media://") for r in refs)


def test_span_fingerprints_stable():
    t = interleaved_table(IDS[:10], seed=42)
    f1 = sp.span_fingerprints(t)
    f2 = sp.span_fingerprints(interleaved_table(IDS[:10], seed=42))
    assert f1 == f2 and len(set(f1)) == len(f1)


def test_golden_triples_table_matches_rows():
    g = golden_triples_table(IDS[:50], seed=42)
    n = sum(len(r["spo_list"]) for r in ROWS[:50])
    assert g.num_rows == n


def test_tables_have_declared_schemas():
    st = sentences_table(IDS[:5])
    it = interleaved_table(IDS[:5])
    assert st.schema.names == ["doc_id", "text", "postag", "spo_list"]
    assert it.schema.names == ["doc_id", "spans"]
    assert pa.types.is_list(it.schema.field("spans").type)


def test_checked_in_sentences_parquet_matches_generation():
    """The kg_sentences snapshot (shared input of four SQL-oracled
    queries) must equal live generation; regenerate with
    scripts/gen_kg_sentences.py if corpus code legitimately changed."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kgray", "data", "kg_sentences_600.parquet",
    )
    snap = pq.read_table(path)
    live = sentences_table([f"doc-{i:08d}" for i in range(600)], seed=42)
    assert snap.equals(live)


def test_checked_in_media_parquet_matches_generation():
    """The kg_media snapshot (shared input of the media_resize oracle)
    must equal live generation; regenerate with scripts/gen_kg_media.py
    if corpus code legitimately changed."""
    import os
    import sys

    import pyarrow.parquet as pq

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "kgray", "data", "kg_media_200.parquet")
    snap = pq.read_table(path)
    sys.path.insert(0, os.path.join(root, "scripts"))
    from gen_kg_media import media_rows

    live = media_rows(
        interleaved_table([f"doc-{i:08d}" for i in range(200)], seed=42)
    )
    assert snap.equals(live)


def test_checked_in_docs_parquet_matches_generation():
    """The kg_docs snapshot (shared input of the kg_flatten oracle) must
    equal live generation; regenerate with scripts/gen_kg_docs.py if
    corpus code legitimately changed."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "kgray", "data", "kg_docs_600.parquet",
    )
    snap = pq.read_table(path)
    live = interleaved_table([f"doc-{i:08d}" for i in range(600)], seed=42)
    assert snap.equals(live)
