"""Machine-ceiling probe: raw multiprocessing (no Ray) over the fused
extraction kernel at K=4 and K=16 processes, interleaved twice.

Separates what the BOX can give from what Ray delivers: perfectly
partitioned work, no shuffle, no scheduler.  Measured 2026-08-17 (calib
~0.3 s, idle host): 4 procs 141.6-142.8k triples/s, 16 procs
478.9-490.3k -> machine scaling ceiling 0.84-0.87 at 4->16.  Ray's
16-cpu headline measured 490.9k on the same corpus — parity with raw
multiprocessing, i.e. the Ray layer adds no measurable overhead; the
sub-1.0 scaling ceiling is memory bandwidth (string-heavy kernel), and
it DROPPED from round 2 precisely because the kernel got 3x faster
per core.

    python scripts/raw_scaling_probe.py   # needs /tmp corpus from bench.py --scaling
"""
import glob
import multiprocessing as mp
import os
import sys
import time


def work(files):
    import pyarrow.parquet as pq

    from kgray.ops.classify import CueClassifier, fanout, threshold_and_fallback
    from kgray.ops.label import TemplateLabeler
    from kgray.ops.spans import reassemble_text

    clf = CueClassifier()
    lab = TemplateLabeler()
    n_docs = 0
    n_triples = 0
    for f in files:
        t = pq.read_table(f)
        n_docs += t.num_rows
        flat = reassemble_text(t, keep_spans=False)
        out = lab(fanout(threshold_and_fallback(clf(flat), 0.5, 10)))
        n_triples += out.num_rows
    return n_docs, n_triples


def run_level(k, files):
    chunks = [files[i::k] for i in range(k)]
    t0 = time.time()
    with mp.Pool(k) as p:
        res = p.map(work, chunks)
    el = time.time() - t0
    docs = sum(r[0] for r in res)
    trips = sum(r[1] for r in res)
    return docs, trips, el


if __name__ == "__main__":
    sys.path.insert(0, "/root/repo")
    files = sorted(glob.glob("/tmp/kgray_bench_corpus_4000000/*.parquet"))
    import numpy as np
    for k in (4, 16, 4, 16):
        a = np.random.rand(2000, 2000)
        t = time.time(); a @ a; calib = time.time() - t
        docs, trips, el = run_level(k, files)
        print(f"k={k} docs={docs} triples={trips} wall={el:.2f} "
              f"docs/s={docs/el:.0f} triples/s={trips/el:.0f} calib={calib:.2f}",
              flush=True)
