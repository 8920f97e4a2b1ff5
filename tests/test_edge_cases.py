"""Degenerate-input robustness: empty corpora and empty stages must flow
through every pipeline without schema loss or crashes (a resumed run whose
pending set is empty hits exactly these paths)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from kgray.schema import DOCUMENTS_INTERLEAVED, TRIPLES


def _empty_docs():
    return rd.from_arrow(DOCUMENTS_INTERLEAVED.empty_table())


def test_extract_on_empty_corpus(ray_session):
    from kgray.pipeline import PipelineConfig, extract_triples

    out = extract_triples(_empty_docs(), PipelineConfig())
    assert out.count() == 0


def test_exact_dedup_empty(ray_session):
    from kgray.ops.dedup import exact_dedup_groups

    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    )
    assert exact_dedup_groups(empty).count() == 0


def test_eval_empty_predictions(ray_session):
    from kgray.corpus import doc_ids_for_range, sentences_table
    from kgray.ops.evaluate import spo_prf1
    from kgray.pipeline import golden_triples

    gold = golden_triples(
        rd.from_arrow(sentences_table(doc_ids_for_range(0, 20)))
    )
    pred = rd.from_arrow(TRIPLES.empty_table())
    m = spo_prf1(pred, gold)
    assert m.tp == 0 and m.pred_n == 0 and m.gold_n > 0
    assert m.precision == 0.0 and m.recall == 0.0 and m.f1 == 0.0


def test_linking_on_empty_triples(ray_session):
    from kgray.ops.canonical import canonicalize_triples, connected_components
    from kgray.ops.linking import link_mentions

    empty = rd.from_arrow(TRIPLES.empty_table())
    edges = link_mentions(empty, tau=0.6)
    entity_map = connected_components(edges)
    # canonicalize with an empty map: identity mapping, still empty
    out = canonicalize_triples(empty, entity_map)
    assert out.count() == 0
