"""Sources/sinks: S1/S5/S9 JSON-lines roundtrip, partitioned parquet."""

from __future__ import annotations

import ray.data as rd

from kgray import io
from kgray.corpus import doc_ids_for_range, sentences_table


def test_io_jsonl(tmp_path, ray_session):
    """S1 reader + S5 writer roundtrip on the triples table (S9: reading
    an emitted submission back)."""
    from kgray.pipeline import golden_triples

    sents = rd.from_arrow(sentences_table(doc_ids_for_range(0, 50)))
    triples = golden_triples(sents)
    out = str(tmp_path / "triples_json")
    io.write_jsonl(triples, out)

    back = io.read_jsonl(out)
    a = triples.to_pandas().sort_values(
        ["doc_id", "subject", "predicate", "object"], ignore_index=True
    )
    b = back.to_pandas()[a.columns.tolist()].sort_values(
        ["doc_id", "subject", "predicate", "object"], ignore_index=True
    )
    assert a.equals(b)


def test_io_jsonl_nested(tmp_path, ray_session):
    """Nested postag/spo_list structs survive the JSON roundtrip (the
    reference's record shape, README.md:19-39)."""
    t = sentences_table(doc_ids_for_range(0, 20))
    ds = rd.from_arrow(t)
    out = str(tmp_path / "sents_json")
    io.write_jsonl(ds, out)
    back = io.read_jsonl(out).to_pandas().sort_values("doc_id", ignore_index=True)
    orig = t.to_pandas().sort_values("doc_id", ignore_index=True)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    assert back["text"].tolist() == orig["text"].tolist()
    # struct lists come back as lists of dicts with equal content
    for a, b in zip(orig["spo_list"], back["spo_list"]):
        assert [dict(x) for x in a] == [dict(x) for x in b]
