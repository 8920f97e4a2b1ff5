"""Pipeline assembly: named steps Dataset -> Dataset, extraction pipeline.

The reference runs its stages as separate OS processes glued by files
(SURVEY.md §3.1); here each stage is a Ray Data transform on one lazy,
streaming Dataset — the executor pipelines and applies backpressure.

Registry: steps are named callables (cfg) -> (Dataset -> Dataset),
mirroring the reference's model-pluggability-by-name extension surface
(/root/reference/classification/config.py:58, labeling/config.py:42).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgray.ops.classify import CueClassifier, fanout, threshold_and_fallback
from kgray.ops.label import TemplateLabeler
from kgray.ops.spans import reassemble_text


@dataclass
class PipelineConfig:
    # Execution mode for the two model stages.
    #   "tasks"  (default): stage state is constructed on the driver and
    #     shipped inside the task closure.  Right when state build cost is
    #     tiny vs one batch of work (CueClassifier: 50 strings;
    #     TemplateLabeler: 50 compiled regexes ~10ms) — tasks fuse with the
    #     read, scale elastically to every core, and skip actor ramp-up.
    #     Measured on this pipeline: 285k rows/s at 32 cpus vs 116k with
    #     actor pools (the ramp + fixed pool caps dominate short stages).
    #   "actors": callable-CLASS actor pools (state built once per actor in
    #     __init__) — required when state is heavy (torch model weights,
    #     big vocabs) or GPU-resident; the reference's real scorers/labelers
    #     (classification/model.py:7-157, labeling/model.py:14-162) belong
    #     here.  Pool caps scale with cluster CPUs: capping below cluster
    #     width strangles the fused read->classify chain (measured 0.35
    #     scaling efficiency with cpus//4 caps).
    execution: str = "tasks"
    # actor-pool sizing when execution="actors"; None = (1, cluster CPUs)
    classifier_concurrency: tuple[int, int] | None = None
    labeler_concurrency: tuple[int, int] | None = None
    # None = one batch per block (fewer slice/dispatch overheads; measured
    # 24.3s -> 17.7s at 32 cpus on a 2M-doc run vs batch_size=4096)
    classify_batch_size: int | None = None
    label_batch_size: int | None = None

    def resolved_concurrency(self) -> tuple[tuple[int, int], tuple[int, int]]:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        cls_c = self.classifier_concurrency or (1, max(2, cpus))
        lbl_c = self.labeler_concurrency or (1, max(2, cpus))
        return cls_c, lbl_c
    encoding_type: str = "bieso"          # labeling/tagging.py:9-11 knob
    threshold: float = 0.5                # prob2res.py:14 knob
    fallback_top_k: int = 10              # prepare_data_for_labeling_infer.py:28
    classifier_cls: type = CueClassifier  # pluggable scorer (A1-A3 slot)
    labeler_cls: type = TemplateLabeler   # pluggable labeler (A4-A5 slot)


def flatten_documents(docs, cfg: PipelineConfig | None = None):
    """interleaved documents -> (doc_id, text) rows; spans dropped here so
    downstream shuffles move only what they need (re-joined by doc_id at
    materialization time)."""
    return docs.map_batches(
        lambda b: reassemble_text(b, keep_spans=False),
        batch_format="pyarrow",
    )


def extract_triples(docs, cfg: PipelineConfig | None = None):
    """Flagship extraction: interleaved docs -> SPO triple Dataset.

    read -> span reassembly -> stage-1 classifier (actor pool) ->
    threshold+fallback -> fan-out -> stage-2 labeler (actor pool, emits
    tags -> decode -> assemble inside the batch).  One streaming pipeline,
    all stages zero-copy Arrow (SURVEY.md §3.1 Ray-native restatement).
    """
    cfg = cfg or PipelineConfig()
    if cfg.execution != "actors":
        # Tasks mode: ONE map_batches running all four stage functions
        # in-heap.  Ray Data rebuilds an output block at every MapBatches
        # boundary; on this pipeline the three interior boundaries cost
        # ~20% of wall (interleaved A/B at 4M docs: 608k vs 471k
        # triples/s).  The stage functions stay separate (and actor mode
        # keeps them as separate pool stages) — only the composition is
        # collapsed.
        clf = cfg.classifier_cls()   # state built once, shipped in closure
        lab = cfg.labeler_cls()
        thr, top_k = cfg.threshold, cfg.fallback_top_k

        def fused_extract(b: pa.Table) -> pa.Table:
            flat = reassemble_text(b, keep_spans=False)
            return lab(fanout(threshold_and_fallback(clf(flat), thr, top_k)))

        return docs.map_batches(
            fused_extract,
            batch_format="pyarrow",
            batch_size=cfg.classify_batch_size,
        )

    ds = flatten_documents(docs, cfg)
    cls_c, lbl_c = cfg.resolved_concurrency()
    ds = ds.map_batches(
        cfg.classifier_cls,
        batch_format="pyarrow",
        batch_size=cfg.classify_batch_size,
        concurrency=cls_c,
    )
    ds = ds.map_batches(
        lambda b: fanout(
            threshold_and_fallback(b, cfg.threshold, cfg.fallback_top_k)
        ),
        batch_format="pyarrow",
    )
    ds = ds.map_batches(
        cfg.labeler_cls,
        batch_format="pyarrow",
        batch_size=cfg.label_batch_size,
        concurrency=lbl_c,
    )
    return ds


def golden_triples(sentences):
    """Explode golden spo_list rows (doc_id, text, postag, spo_list) ->
    flat triple rows — the eval oracle side (calc_pr.py:89-119 analogue).
    Vectorized list-explode on Arrow offsets."""

    def explode(batch: pa.Table) -> pa.Table:
        spo = batch["spo_list"]
        if isinstance(spo, pa.ChunkedArray):
            spo = spo.combine_chunks()
        lengths = pc.list_value_length(spo).fill_null(0).to_numpy(zero_copy_only=False)
        take = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
        flat = spo.flatten()
        return pa.table(
            {
                "doc_id": batch["doc_id"].take(pa.array(take)),
                "subject": flat.field("subject"),
                "subject_type": flat.field("subject_type"),
                "predicate": flat.field("predicate"),
                "object": flat.field("object"),
                "object_type": flat.field("object_type"),
            }
        )

    return sentences.map_batches(explode, batch_format="pyarrow")


def kg_construct(
    docs,
    out_dir: str,
    cfg: PipelineConfig | None = None,
    num_partitions: int = 16,
    tau: float = 0.6,
    input_fingerprint: str = "",
    resume: bool = True,
):
    """Full KG construction: extract -> link -> canonicalize -> materialize.

    Writes three partitioned, manifested tables under ``out_dir``:
    ``triples/`` (hash(doc_id) layout, resumable), ``entities/`` (the
    mention -> canonical component map) and ``triples_canonical/``.
    Returns the manifests dict.
    """
    import os

    from kgray import io
    from kgray.ops.canonical import canonicalize_triples, connected_components
    from kgray.ops.linking import link_mentions

    cfg = cfg or PipelineConfig()
    manifests = {}

    triples_dir = os.path.join(out_dir, "triples")
    done = io.completed_partitions(triples_dir, input_fingerprint) if resume else set()
    pending_docs = io.filter_pending(docs, "doc_id", num_partitions, done)
    # NOTE: per-partition resume appends only missing partitions; the
    # written layout is the checkpoint (io.py docstring).
    triples = extract_triples(pending_docs, cfg)
    # doc_id zone maps: partitions are assigned by crc32(doc_id), which
    # scatters ids uniformly, so each partition's zone spans ~the whole
    # doc_id range and range pruning here is best-effort only (it never
    # wrongly prunes; it mostly helps a reader probing a range narrower
    # than the corpus, or a corpus whose id space is sparse/segmented).
    # The zones' primary value on this table is the audit trail: min/max
    # per partition attests which id universe each partition covers.
    manifests["triples"] = io.write_partitioned(
        triples, triples_dir, "doc_id", num_partitions,
        stage="extract", input_fingerprint=input_fingerprint,
        keep_partitions=done, stats_cols=("doc_id",),
    )

    # Downstream stages carry LINEAGE fingerprints: each stage's
    # input_fingerprint is the content fingerprint of its upstream
    # manifest(s), so a resume in which the triples did not change skips
    # link+CC and canonicalize entirely (incremental recompute — the
    # manifest attests both the bytes and the derivation).
    tr_fp = io.manifest_fingerprint(manifests["triples"])
    ent_dir = os.path.join(out_dir, "entities")
    ent_m = io.read_manifest(ent_dir) if resume else None
    all_triples = io.read_table(triples_dir)
    if ent_m is not None and ent_m.get("input_fingerprint") == tr_fp:
        manifests["entities"] = ent_m  # unchanged upstream: stage skipped
    else:
        edges = link_mentions(all_triples, tau=tau)
        entity_map = connected_components(edges)
        manifests["entities"] = io.write_partitioned(
            entity_map, ent_dir, "node", num_partitions,
            stage="link+canonicalize", input_fingerprint=tr_fp,
        )

    canon_fp = f"{tr_fp}+{io.manifest_fingerprint(manifests['entities'])}"
    canon_dir = os.path.join(out_dir, "triples_canonical")
    canon_m = io.read_manifest(canon_dir) if resume else None
    if canon_m is not None and canon_m.get("input_fingerprint") == canon_fp:
        manifests["triples_canonical"] = canon_m
    else:
        canon = canonicalize_triples(
            all_triples, io.read_table(ent_dir),
            num_partitions=num_partitions,
        )
        manifests["triples_canonical"] = io.write_partitioned(
            canon, canon_dir, "doc_id",
            num_partitions, stage="materialize", input_fingerprint=canon_fp,
            stats_cols=("doc_id",),
        )
    return manifests


# ---------------------------------------------------------------------------
# Step registry (extension surface)
# ---------------------------------------------------------------------------

_REGISTRY: dict[str, object] = {}


def register_step(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def get_step(name: str):
    return _REGISTRY[name]


def steps() -> list[str]:
    return sorted(_REGISTRY)


register_step("flatten")(flatten_documents)
register_step("extract")(extract_triples)
register_step("golden")(lambda ds, cfg=None: golden_triples(ds))
