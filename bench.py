"""Benchmark driver (driver contract + local feedback loop).

Default mode: runs the headline KG-construction pipeline plus a
representative query suite over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS)`` (default 32) and prints ONE JSON line::

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "triples": T, "triples_per_sec": R}

``--scaling``: runs the headline pipeline twice in FRESH processes
(num_cpus=8 then num_cpus=32) on the same input and reports both
throughputs + scaling efficiency (sandbox stand-in for the north rule's
N vs 4N node criterion).  ``--headline-only`` is the child mode.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# queries() entries that form the representative suite (beyond the headline)
SUITE = [
    "tpch_q1",
    "mktsegment_revenue",
    "supplier_balance_by_region",
    "events_hourly",
    "events_sessions",
    "events_user_topk",
    "token_stats",
    "langid",
    "exact_dedup",
    "minhash_dup_docs",
    "simhash_dup_docs",
    "embed_knn",
    "knn_ivf",
    "kg_link_edges",
]


def _consume(res) -> int:
    """Execute a lazy result and return its row count without pulling the
    data to the driver."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return len(res)
    if isinstance(res, pa.Table):
        return res.num_rows
    return res.count()  # ray Dataset: streams through, no driver collect


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _headline_n_docs(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    n = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    return max(500, n)


def run_headline(sf_dir: str) -> tuple[float, int]:
    """KG extraction end-to-end (the north-rule metric): interleaved docs
    -> stage-1 classify -> fan-out -> stage-2 label -> SPO triples."""
    from kgray.corpus import interleaved_dataset
    from kgray.pipeline import PipelineConfig, extract_triples

    n_docs = _headline_n_docs(sf_dir)
    docs = interleaved_dataset(n_docs, seed=42)
    t0 = time.time()
    triples = extract_triples(docs, PipelineConfig()).count()
    return time.time() - t0, triples


def main() -> int:
    if "--scaling" in sys.argv:
        return scaling()

    _init_ray(NUM_CPUS)
    if "--headline-only" in sys.argv:
        dt, triples = run_headline(SF_DIR)
        print(json.dumps({"sec": dt, "triples": triples,
                          "triples_per_sec": triples / dt,
                          "num_cpus": NUM_CPUS}))
        import ray

        ray.shutdown()
        return 0

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    times: dict[str, float] = {}

    t0 = time.time()
    kg_sec, triples = run_headline(SF_DIR)
    times["kg_extract_e2e"] = round(kg_sec, 3)

    for name in SUITE:
        if name not in qs:
            continue
        t1 = time.time()
        try:
            _consume(qs[name](SF_DIR))
            times[name] = round(time.time() - t1, 3)
        except Exception as e:  # pragma: no cover - bench robustness
            times[name] = -1.0
            print(f"# bench error {name}: {e}", file=sys.stderr)

    total = time.time() - t0
    print(json.dumps({
        "metric": "kg-construction e2e + query suite wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "triples": triples,
        "triples_per_sec": round(triples / kg_sec, 1),
    }))
    import ray

    ray.shutdown()
    return 0


def scaling() -> int:
    """Fresh-process headline runs at 8 then 32 CPUs -> scaling efficiency."""
    results = {}
    for cpus in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=SF_DIR)
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--headline-only"],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = out.stdout.strip().splitlines()[-1]
        results[cpus] = json.loads(line)
    thr8 = results[8]["triples_per_sec"]
    thr32 = results[32]["triples_per_sec"]
    eff = thr32 / (4.0 * thr8)
    print(json.dumps({
        "metric": "scaling efficiency (8 -> 32 cpus, fresh ray sessions)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "throughput_8cpu": round(thr8, 1),
        "throughput_32cpu": round(thr32, 1),
        "sec_8cpu": round(results[8]["sec"], 3),
        "sec_32cpu": round(results[32]["sec"], 3),
        "triples": results[32]["triples"],
        "sf": SF_DIR,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
