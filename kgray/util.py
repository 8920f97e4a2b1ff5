"""Small Dataset utilities shared across ops."""

from __future__ import annotations

import pyarrow as pa


def rename_cols(ds, mapping: dict[str, str]):
    """Rename columns via a pyarrow map_batches.

    ``Dataset.rename_columns`` projects over raw blocks and breaks when a
    block is pandas (e.g. downstream of ``map_groups(batch_format=
    "pandas")``); forcing Arrow batches here is shape-safe everywhere.
    """

    def apply(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )

    return ds.map_batches(apply, batch_format="pyarrow")
