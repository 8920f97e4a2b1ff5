"""Regenerate the checked-in kg_media parquet snapshot.

The snapshot (kgray/data/kg_media_200.parquet) holds the media spans of
the first 200 interleaved documents (doc_id, media_ref, kind) — the
shared input of the media_resize query AND its DuckDB oracle, so the
fit-arithmetic check is a full value-hash oracle.  Re-run whenever
kgray.corpus generation changes (tests/test_corpus.py guards drift),
then commit the new file.

    python scripts/gen_kg_media.py
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgray.corpus import doc_ids_for_range, interleaved_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kgray", "data", "kg_media_200.parquet",
)


def media_rows(docs: pa.Table) -> pa.Table:
    """Media spans of an interleaved docs table (pure-python mirror of
    ops/media.media_table_from_documents, snapshot columns only)."""
    doc_ids, refs, kinds = [], [], []
    for did, spans in zip(
        docs["doc_id"].to_pylist(), docs["spans"].to_pylist()
    ):
        for s in spans:
            if s["kind"] != "text":
                doc_ids.append(did)
                refs.append(s["media_ref"])
                kinds.append(s["kind"])
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.string()),
            "media_ref": pa.array(refs, pa.string()),
            "kind": pa.array(kinds, pa.string()),
        }
    )


def main() -> int:
    t = media_rows(interleaved_table(doc_ids_for_range(0, 200), seed=42))
    pq.write_table(t, OUT)
    print(f"wrote {t.num_rows} rows -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
