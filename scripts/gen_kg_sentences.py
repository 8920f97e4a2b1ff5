"""Regenerate the checked-in kg_sentences parquet snapshot.

The snapshot (kgray/data/kg_sentences_600.parquet) is the shared input of
the kg_spo_hist / kg_empty_counts / kg_vocab_chars / kg_multihot queries
AND their DuckDB oracles — both engines read the same bytes, which is
what makes those checks full value-hash oracles.  Re-run this script
whenever kgray.corpus generation changes (tests/test_corpus.py guards
drift), then commit the new file.

    python scripts/gen_kg_sentences.py
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kgray.corpus import doc_ids_for_range, sentences_table  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "kgray", "data", "kg_sentences_600.parquet",
)


def main() -> int:
    t = sentences_table(doc_ids_for_range(0, 600), seed=42)
    pq.write_table(t, OUT)
    print(f"wrote {t.num_rows} rows -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
