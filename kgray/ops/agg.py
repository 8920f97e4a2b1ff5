"""Pre-aggregated (combiner) groupby — the skew/volume-defusing pattern
for wide aggregations (SURVEY.md §4: "pre-aggregate inside map_batches
before a groupby").

``pre_aggregate(ds, keys, specs)`` runs a pandas groupby inside EVERY
batch first, so the all-to-all shuffle moves one row per (batch, distinct
key) instead of one per input row, then folds the partials with Ray's
native aggregate.  Supported specs: sum, count, min, max, mean (decomposed
into sum+count; the final mean is computed after the fold, so it is exact).

    pre_aggregate(lineitem, ["l_returnflag"],
                  {"sum_qty": ("l_quantity", "sum"),
                   "n": (None, "count"),
                   "avg_price": ("l_extendedprice", "mean")})
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def pre_aggregate(ds, keys: list[str], specs: dict[str, tuple[str | None, str]]):
    from ray.data.aggregate import Max, Min, Sum

    # decompose: output column -> (src, op); mean -> hidden sum + per-column
    # NON-NULL count (SQL AVG divides by the non-null count, not the row
    # count — a shared size() diverges when the source column has nulls)
    partial_cols: dict[str, tuple[str | None, str]] = {}
    mean_cols: dict[str, tuple[str, str]] = {}  # out -> (hidden sum, hidden cnt)
    for out, (src, op) in specs.items():
        if op == "mean":
            partial_cols[f"__{out}_sum"] = (src, "sum")
            partial_cols[f"__{out}_cnt"] = (src, "nncount")
            mean_cols[out] = (f"__{out}_sum", f"__{out}_cnt")
        elif op == "count":
            partial_cols[out] = (None, "count")
        else:
            partial_cols[out] = (src, op)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby(keys, sort=False, dropna=False)
        out = {}
        for name, (src, op) in partial_cols.items():
            if op == "count":
                out[name] = g.size()
            elif op == "nncount":
                out[name] = g[src].count()  # non-null count
            else:
                out[name] = getattr(g[src], op)()
        res = pd.DataFrame(out).reset_index()
        t = pa.Table.from_pandas(
            res, preserve_index=False).replace_schema_metadata(None)
        # typed-empty guard: an empty batch round-trips string keys
        # through pandas as null-typed columns, and the schema flip
        # surfaces as Ray's "RefBundle with a different schema" warning
        # downstream of the fold — pin key columns to the INPUT types
        for k in keys:
            want = batch.schema.field(k).type
            if t.schema.field(k).type != want:
                t = t.set_column(
                    t.column_names.index(k), k, t[k].cast(want))
        return t

    aggs = []
    for name, (src, op) in partial_cols.items():
        if op in ("sum", "count", "nncount"):
            aggs.append(Sum(name, alias_name=name))
        elif op == "min":
            aggs.append(Min(name, alias_name=name))
        elif op == "max":
            aggs.append(Max(name, alias_name=name))

    # NB: when distinct keys < input block count, Ray's sort-aggregate
    # necessarily emits EMPTY (zero-column) reduce partitions; they are
    # benign, and the untyped-empty log line they trigger is suppressed
    # by the targeted filter in kgray/__init__.  Measured dead ends: a
    # map_batches batch_size bundle merges blocks per TASK and slashed
    # read-side parallelism 8x (events_auc 1.3 -> 4.6 s);
    # StreamingRepartition splits but does not merge; only a full extra
    # all-to-all changes the reduce partition count — not worth it.
    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys if len(keys) > 1 else keys[0])
        .aggregate(*aggs)
    )

    if not mean_cols:
        return folded

    hidden = [c for c in partial_cols if c.startswith("__")]
    out_order = keys + [o for o in specs]

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        for out, (hidden_sum, hidden_cnt) in mean_cols.items():
            df[out] = df[hidden_sum] / df[hidden_cnt].replace(0, np.nan)
        df = df.drop(columns=[c for c in hidden if c in df.columns])
        return pa.Table.from_pandas(
            df[out_order], preserve_index=False).replace_schema_metadata(None)

    return folded.map_batches(finalize, batch_format="pyarrow")


def grouped_corr(ds, key: str, x: str, y: str, out_col: str = "r",
                 digits: int = 4):
    """Per-group Pearson correlation in ONE pass via sufficient
    statistics: each batch folds (n, Σx, Σy, Σx², Σy², Σxy) per key —
    the shuffle moves six numbers per (batch, key) — and the final
    r = (nΣxy - ΣxΣy) / sqrt((nΣx² - Σx²)(nΣy² - Σy²)) is computed on
    the folded aggregate (algebraically identical to SQL CORR; the
    summation-order ulp drift is absorbed by the ``digits`` round)."""
    from ray.data.aggregate import Sum

    from kgray.util import round_half_up

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        xf = df[x].to_numpy(np.float64)
        yf = df[y].to_numpy(np.float64)
        df = df.assign(
            __x=xf, __y=yf, __xx=xf * xf, __yy=yf * yf, __xy=xf * yf,
        )
        g = df.groupby(key, sort=False, dropna=False)
        res = g[["__x", "__y", "__xx", "__yy", "__xy"]].sum()
        res["__n"] = g.size()
        return pa.Table.from_pandas(
            res.reset_index(),
            preserve_index=False).replace_schema_metadata(None)

    folded = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .aggregate(*[Sum(c, alias_name=c)
                     for c in ("__x", "__y", "__xx", "__yy", "__xy", "__n")])
    )

    def finalize(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        n = df["__n"].to_numpy(np.float64)
        sx, sy = df["__x"].to_numpy(), df["__y"].to_numpy()
        cov = n * df["__xy"].to_numpy() - sx * sy
        vx = n * df["__xx"].to_numpy() - sx * sx
        vy = n * df["__yy"].to_numpy() - sy * sy
        denom = np.sqrt(vx * vy)
        r = np.where(denom > 0, cov / np.where(denom > 0, denom, 1.0), np.nan)
        return pa.table(
            {
                key: pa.Array.from_pandas(df[key]),
                out_col: pa.array(round_half_up(r, digits), pa.float64()),
            }
        )

    return folded.map_batches(finalize, batch_format="pyarrow")
