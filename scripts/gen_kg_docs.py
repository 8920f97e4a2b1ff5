"""Regenerate the checked-in interleaved-docs parquet snapshot.

The snapshot (kgray/data/kg_docs_600.parquet) is interleaved_table over
the first 600 doc ids — the shared input of the kg_flatten query AND its
DuckDB oracle (string_agg over text spans), making span reassembly a
full value-hash oracle.  Re-run whenever kgray.corpus generation changes
(tests/test_corpus.py guards drift), then commit the new file.

    python scripts/gen_kg_docs.py
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgray.corpus import doc_ids_for_range, interleaved_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kgray", "data", "kg_docs_600.parquet",
)


def main() -> int:
    t = interleaved_table(doc_ids_for_range(0, 600), seed=42)
    pq.write_table(t, OUT)
    print(f"wrote {t.num_rows} rows -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
