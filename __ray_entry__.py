"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline over the
deterministic interleaved corpus (BASELINE.json input_hint shape), sized
from the sf0.001 documents table.  ``queries()`` exposes every
implemented operator from SURVEY.md §2 (plus the training-data operator
families); ``oracle_sql()`` gives the DuckDB-checkable subset.  The
KG-pipeline entries run on this repo's synthetic LIC-shaped corpus (not
registered as DuckDB views), so they are rows-only checks — their
correctness gate is tests/ (reference-oracle parity + e2e P/R >= 0.95).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os as _os
from collections.abc import Callable
from typing import Any

from kgray.io import read_parquet_clean as _rpq

# number of synthetic interleaved docs the KG queries run over at the
# driver's sf=0.01 correctness scale
_KG_DOCS = 600
_SEED = 42


def _kg_docs_ds(n: int = _KG_DOCS):
    from kgray.corpus import interleaved_dataset

    return interleaved_dataset(n, seed=_SEED)


# Checked-in snapshot of sentences_table(doc_ids_for_range(0, 600), seed=42)
# (scripts/gen_kg_sentences.py writes it; tests/test_corpus.py guards drift).
# Both the Ray kg_* queries AND their DuckDB oracles read THIS file, so the
# spo_hist/empty_counts/vocab_chars/multihot checks are full value-hash
# oracles rather than rows-only.
_KG_SENT_PARQUET = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "kgray", "data", "kg_sentences_600.parquet",
)

# Media spans of the first 200 interleaved docs (scripts/gen_kg_media.py;
# drift-guarded in tests/test_corpus.py) — shared input of media_resize
# and its fit-arithmetic oracle.
_KG_MEDIA_PARQUET = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "kgray", "data", "kg_media_200.parquet",
)

# Interleaved docs snapshot (scripts/gen_kg_docs.py; drift-guarded) —
# shared input of kg_flatten and its span-reassembly oracle.
_KG_DOCS_PARQUET = _os.path.join(
    _os.path.dirname(_os.path.abspath(__file__)),
    "kgray", "data", "kg_docs_600.parquet",
)


def _kg_sentences_ds(n: int = _KG_DOCS):
    import os

    import ray.data as rd

    if n == _KG_DOCS and os.path.exists(_KG_SENT_PARQUET):
        return _rpq(_KG_SENT_PARQUET)
    from kgray.corpus import doc_ids_for_range, sentences_table

    return rd.from_arrow(sentences_table(doc_ids_for_range(0, n), seed=_SEED))


def entry() -> Any:
    """Flagship: interleaved docs (sized from sf0.001 documents table) ->
    extraction -> SPO triples Dataset."""
    import pyarrow.parquet as pq

    from kgray.pipeline import PipelineConfig, extract_triples

    n_docs = pq.read_metadata("/root/testdata/sf0.001/documents.parquet").num_rows
    docs = _kg_docs_ds(max(200, n_docs))
    return extract_triples(docs, PipelineConfig())


def _kg_extract(sf_dir: str):
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(_kg_docs_ds(), PipelineConfig())


def _kg_flatten(sf_dir: str):
    """Span reassembly over the checked-in docs snapshot — oracle is a
    string_agg over the text spans in offset order."""
    import ray.data as rd

    from kgray.pipeline import flatten_documents

    return flatten_documents(_rpq(_KG_DOCS_PARQUET))


def _kg_golden(sf_dir: str):
    from kgray.pipeline import golden_triples

    return golden_triples(_kg_sentences_ds())


def _kg_eval(sf_dir: str):
    import pyarrow as pa

    from kgray.ops.evaluate import spo_prf1
    from kgray.pipeline import PipelineConfig, extract_triples, golden_triples

    m = spo_prf1(
        extract_triples(_kg_docs_ds(), PipelineConfig()),
        golden_triples(_kg_sentences_ds()),
    )
    return pa.table(
        {
            "precision": pa.array([round(m.precision, 4)]),
            "recall": pa.array([round(m.recall, 4)]),
            "f1": pa.array([round(m.f1, 4)]),
            "tp": pa.array([m.tp]),
            "pred_n": pa.array([m.pred_n]),
            "gold_n": pa.array([m.gold_n]),
        }
    )


def _kg_extract_crf(sf_dir: str):
    """A6: extraction with the numpy constrained-Viterbi CRF decode in the
    labeler slot (template emissions -> viterbi -> shared codec)."""
    from kgray.ops.crf import CrfLabeler
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(_kg_docs_ds(), PipelineConfig(labeler_cls=CrfLabeler))


def _kg_extract_cnn(sf_dir: str):
    """A1: stage-1 scores from the numpy CNN forward pass (actor pool —
    model tensors built once per actor), rest of the pipeline unchanged."""
    from kgray.ops.models import NumpyCnnScorer
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(
        _kg_docs_ds(),
        PipelineConfig(classifier_cls=NumpyCnnScorer, execution="actors"),
    )


def _kg_extract_bilstm(sf_dir: str):
    """A4-A6: stage-2 via the numpy BiLSTM-CRF forward (untrained seeded
    weights — output is arbitrary but BIESO-legal; exercises the model
    execution path end-to-end as an actor pool)."""
    from kgray.ops.models import NumpyBiLstmCrfLabeler
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(
        _kg_docs_ds(200),
        PipelineConfig(labeler_cls=NumpyBiLstmCrfLabeler, execution="actors"),
    )


def _kg_extract_transformer(sf_dir: str):
    """A5: stage-2 via the numpy transformer-CRF forward (masked MHA +
    FFN encoder, labeling/model.py:165-299 shape; untrained seeded
    weights — output is arbitrary but BIESO-legal; actor pool so the
    encoder tensors build once per actor)."""
    from kgray.ops.models import NumpyTransformerCrfLabeler
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(
        _kg_docs_ds(200),
        PipelineConfig(labeler_cls=NumpyTransformerCrfLabeler, execution="actors"),
    )


def _kg_extract_bert(sf_dir: str):
    """A2: stage-1 scores from the numpy BERT forward (WordPiece ids ->
    embeddings -> masked-MHA/gelu encoder -> pooler -> sigmoid(50),
    classification/model_bert.py:14-118 shape), rest unchanged."""
    from kgray.ops.models import NumpyBertScorer
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(
        _kg_docs_ds(200),
        PipelineConfig(classifier_cls=NumpyBertScorer, execution="actors"),
    )


def _kg_extract_ensemble(sf_dir: str):
    """A3: stage-1 scores from a weighted two-member ensemble
    (classification/ensemble.py:120-133 formula), rest of the pipeline
    unchanged."""
    from kgray.ops.ensemble import EnsembleClassifier
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(
        _kg_docs_ds(), PipelineConfig(classifier_cls=EnsembleClassifier)
    )


def _kg_extract_crf_ensemble(sf_dir: str):
    """A7: stage-2 tags from a weighted labeler ensemble decoded once
    through the constrained Viterbi (labeling/ensemble.py:126-166 shape)."""
    from kgray.ops.ensemble import EnsembleCrfLabeler
    from kgray.pipeline import PipelineConfig, extract_triples

    return extract_triples(
        _kg_docs_ds(), PipelineConfig(labeler_cls=EnsembleCrfLabeler)
    )


def _kg_link_edges(sf_dir: str):
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import PipelineConfig, extract_triples

    return link_mentions(extract_triples(_kg_docs_ds(), PipelineConfig()), tau=0.5)


def _kg_pred_set_rates(sf_dir: str):
    """G6: per-doc predicate-set exact/subset/superset rates."""
    from kgray.ops.evaluate import predicate_set_rates
    from kgray.pipeline import PipelineConfig, extract_triples, golden_triples

    return predicate_set_rates(
        extract_triples(_kg_docs_ds(), PipelineConfig()),
        golden_triples(_kg_sentences_ds()),
    )


def _kg_link_edges_golden(sf_dir: str):
    """Linking over the checked-in golden triples snapshot: because the
    verify step is exact char-2-gram Jaccard and LSH recall at tau=0.6 is
    1 - 0.64^32 (~1 - 6e-7), the exact Jaccard self-join over distinct
    normalized mentions is a full DuckDB oracle for this query."""
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import golden_triples

    return link_mentions(golden_triples(_kg_sentences_ds()), tau=0.6)


def _kg_link_degree(sf_dir: str):
    """Node degrees of the golden mention-link graph (undirected):
    symmetric explode + count combiner over the same exact-Jaccard edge
    set as kg_link_edges_golden, so the SQL oracle rebuilds the edges
    and counts both directions."""
    from kgray.ops.graph import node_degrees
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import golden_triples

    edges = link_mentions(golden_triples(_kg_sentences_ds()), tau=0.6)
    return node_degrees(edges)


def _kg_pagerank(sf_dir: str):
    """PageRank over the golden mention-link graph: 8 rounds of power
    iteration, each ONE bucket join + ONE groupby (the CC round shape).
    Rows-only: iterative float fixpoints are not SQL-expressible; the
    formulation is pinned exactly against a numpy brute power iteration
    (tests/test_graph.py)."""
    from kgray.ops.graph import pagerank
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import golden_triples

    edges = link_mentions(golden_triples(_kg_sentences_ds()), tau=0.6)
    return pagerank(edges, iters=8)


def _kg_link_triangles(sf_dir: str):
    """Triangle count of the golden mention-link graph (wedge-check MR:
    neighbor-pair emission capped at max_degree, closure cogroup,
    /3) — the clustering-density signal over link candidates."""
    from kgray.ops.graph import triangle_count
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import golden_triples

    edges = link_mentions(golden_triples(_kg_sentences_ds()), tau=0.6)
    return triangle_count(edges)


def _kg_canonical_golden(sf_dir: str):
    """Full link -> connected-components -> canonicalize chain over the
    golden snapshot, oracle-checked end-to-end: the DuckDB side rebuilds
    the exact-Jaccard edges and runs min-label connected components as a
    recursive CTE."""
    from kgray.ops.canonical import canonicalize_triples, connected_components
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import golden_triples

    g = golden_triples(_kg_sentences_ds()).materialize()
    edges = link_mentions(g, tau=0.6)
    return canonicalize_triples(g, connected_components(edges))


def _kg_link_edges_embed(sf_dir: str):
    from kgray.ops.linking import link_mentions_embedding
    from kgray.pipeline import PipelineConfig, extract_triples

    return link_mentions_embedding(
        extract_triples(_kg_docs_ds(), PipelineConfig()), tau=0.8
    )


def _kg_canonical(sf_dir: str):
    from kgray.ops.canonical import canonicalize_triples, connected_components
    from kgray.ops.linking import link_mentions
    from kgray.pipeline import PipelineConfig, extract_triples

    # materialize once: both the linking pass and the rewrite consume it
    triples = extract_triples(_kg_docs_ds(), PipelineConfig()).materialize()
    edges = link_mentions(triples, tau=0.5)
    entity_map = connected_components(edges)
    return canonicalize_triples(triples, entity_map)


def _minhash_dup_docs(sf_dir: str):
    import ray.data as rd

    from kgray.ops.dedup import minhash_dup_pairs

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return minhash_dup_pairs(docs, tau=0.7)


def _simhash_dup_docs(sf_dir: str):
    import ray.data as rd

    from kgray.ops.dedup import simhash_dup_pairs

    docs = _rpq(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return simhash_dup_pairs(docs, max_hamming=3)


def _embed_dup_bucketed(sf_dir: str):
    """The 100-TB embedding-dedup path: multi-probe IVF blocking ->
    in-bucket exact cosine (no whole-matrix broadcast).  Exactness oracle
    is embed_dup_pairs (brute) at small scale."""
    import ray.data as rd

    from kgray.ops.dedup import embedding_dup_pairs

    emb = _rpq(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return embedding_dup_pairs(emb, tau=0.45, strategy="ivf")


def _knn_ivf(sf_dir: str):
    import ray.data as rd

    from kgray.ops.similarity import knn_ivf
    from kgray.queries import _query_vec

    emb = _rpq(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return knn_ivf(emb, _query_vec(sf_dir), k=10)


def _kg_spo_hist(sf_dir: str):
    from kgray.ops.featurize import spo_count_histogram

    return spo_count_histogram(_kg_sentences_ds())


def _kg_empty_counts(sf_dir: str):
    from kgray.ops.featurize import empty_field_counts

    return empty_field_counts(_kg_sentences_ds())


def _kg_vocab_chars(sf_dir: str):
    from kgray.ops.featurize import vocab_counts

    return vocab_counts(_kg_sentences_ds(), "char")


def _kg_filter_adapted(sf_dir: str):
    import pyarrow as pa

    from kgray.ops.featurize import filter_by_predicate

    ds = filter_by_predicate(_kg_sentences_ds(), "改编自")
    return ds.map_batches(
        lambda b: pa.table({"doc_id": b["doc_id"], "text": b["text"]}),
        batch_format="pyarrow",
    )


def _kg_multihot(sf_dir: str):
    import numpy as np
    import pyarrow as pa

    from kgray.ops.featurize import add_multihot_target

    def project(batch: pa.Table) -> pa.Table:
        t = add_multihot_target(batch)
        col = t["target"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        mat = np.asarray(col.flatten()).reshape(len(t), -1)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_schemas": pa.array(mat.sum(axis=1).astype(np.int64)),
            }
        )

    return _kg_sentences_ds().map_batches(project, batch_format="pyarrow")


def _kg_postag_check(sf_dir: str):
    """check_concat_postag analogue: postag words reconstruct the text.
    The ok flag is projected to int64 (DuckDB's nullable boolean comes
    back as pandas object dtype and the driver hash is dtype-kind
    sensitive)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from kgray.ops.featurize import postag_reconstruction_check

    checked = postag_reconstruction_check(_kg_sentences_ds())

    def as_int(batch: pa.Table) -> pa.Table:
        i = batch.column_names.index("ok")
        return batch.set_column(i, "ok", pc.cast(batch["ok"], pa.int64()))

    return checked.map_batches(as_int, batch_format="pyarrow")


def _kg_composition_check(sf_dir: str):
    from kgray.ops.featurize import composition_check
    from kgray.pipeline import PipelineConfig, extract_triples, flatten_documents

    triples = extract_triples(_kg_docs_ds(), PipelineConfig())
    flat = flatten_documents(_kg_docs_ds())
    return composition_check(triples, flat)


def _media_frames(sf_dir: str):
    """Frame sampling over the media snapshot: per-row deterministic
    durations (ord of the ref's last char), so the sampling arithmetic
    (min(max_frames, max(1, dur // every_ms)) rows per media, t = i *
    every_ms) is a full DuckDB oracle."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.ops.media import sample_frames

    media = _rpq(_KG_MEDIA_PARQUET)

    def with_duration(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        dur = [1000 + 700 * (ord(r[-1]) % 5) for r in refs]
        return batch.append_column(
            "duration_ms", pa.array(dur, pa.int32())
        )

    return sample_frames(media.map_batches(with_duration, batch_format="pyarrow"))


def _kg_eval_alias(sf_dir: str):
    """Alias-aware calc_pr eval (S3/J3 alias expansion path)."""
    import pyarrow as pa

    from kgray.corpus import _build_pools
    from kgray.ops.evaluate import spo_prf1
    from kgray.pipeline import PipelineConfig, extract_triples, golden_triples

    # the corpus plants alias surfaces by dropping the interpunct from
    # dotted person names — the alias dict maps each form to the other
    pools = _build_pools()
    alias = {}
    for name in pools["人物"]:
        if "·" in name:
            alias[name.replace("·", "")] = [name]
            alias[name] = [name.replace("·", "")]
    m = spo_prf1(
        extract_triples(_kg_docs_ds(), PipelineConfig()),
        golden_triples(_kg_sentences_ds()),
        alias=alias,
    )
    return pa.table(
        {
            "precision": pa.array([round(m.precision, 4)]),
            "recall": pa.array([round(m.recall, 4)]),
            "f1": pa.array([round(m.f1, 4)]),
            "tp": pa.array([m.tp]),
        }
    )


def _kg_wordpiece_bio(sf_dir: str):
    """M9: WordPiece BIO training rows (one per sentence x predicate),
    tokenizer vocab = corpus chars (CJK chars tokenize 1:1; the ##-piece
    path is covered by the unit suite's latin vocab)."""
    from kgray.ops.featurize import build_vocab
    from kgray.ops.wordpiece import SPECIALS, wordpiece_bio_rows

    import pyarrow as pa

    ds = _kg_sentences_ds()
    chars = build_vocab(ds, "char")
    vocab = {t: i for i, t in enumerate(SPECIALS)}
    for c in chars:
        vocab.setdefault(c, len(vocab))
    rows = wordpiece_bio_rows(ds, vocab)

    def stats(batch: pa.Table) -> pa.Table:
        labels = batch["labels"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "predicate": batch["predicate"],
                "n_tokens": pa.array([len(ls) for ls in labels], pa.int64()),
                "n_spans": pa.array(
                    [sum(1 for l in ls if l.startswith("B-")) for ls in labels],
                    pa.int64(),
                ),
            }
        )

    return rows.map_batches(stats, batch_format="pyarrow")


def _kg_word_tags(sf_dir: str):
    """M8: word-level tag refinement stats per (doc, predicate)."""
    import pyarrow as pa

    from kgray.ops.tagging import word_tags

    def stats(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "predicate": [], "n_chars": [], "n_marked": []}
        for row in batch.to_pylist():
            spo_list = row["spo_list"] or []
            postag = row["postag"] or []
            for p in sorted({s["predicate"] for s in spo_list}):
                tags = word_tags(p, row["text"], postag, spo_list)
                out["doc_id"].append(row["doc_id"])
                out["predicate"].append(p)
                out["n_chars"].append(len(tags))
                out["n_marked"].append(sum(1 for t in tags if t != "O"))
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "predicate": pa.array(out["predicate"], pa.string()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
                "n_marked": pa.array(out["n_marked"], pa.int64()),
            }
        )

    return _kg_sentences_ds().map_batches(stats, batch_format="pyarrow")


def _kg_random_spo_fill(sf_dir: str):
    """M18: deterministic random-SPO filler over empty-prediction rows."""
    from kgray.ops.featurize import fill_random_spo

    return fill_random_spo(_kg_sentences_ds(), seed=7)


def _kg_resegment(sf_dir: str):
    """M6: dictionary re-segmentation (jieba-free FMM) stats per doc."""
    from kgray.ops.segment import resegment_stats

    return resegment_stats(_kg_sentences_ds())


def _kg_span_f1(sf_dir: str):
    """G7: span-level P/R/F1 of labeler tags vs golden training targets."""
    from kgray.ops.evaluate import span_prf1

    return span_prf1(_kg_sentences_ds())


def _kg_eval_loc(sf_dir: str):
    """Location-dict calc_pr eval (S3 loc dict + is_spo_correct loc
    branch): golden objects expand one-directionally through a location
    dict built from the corpus place pool."""
    import pyarrow as pa

    from kgray.corpus import _build_pools
    from kgray.ops.evaluate import spo_prf1
    from kgray.pipeline import PipelineConfig, extract_triples, golden_triples

    pools = _build_pools()
    # each place expands to a district-suffixed variant (the shape of the
    # reference's location dictionary: city -> sub-locations)
    loc = {p: [p + "东区", p + "西区"] for p in pools.get("地点", [])}
    m = spo_prf1(
        extract_triples(_kg_docs_ds(), PipelineConfig()),
        golden_triples(_kg_sentences_ds()),
        loc=loc,
    )
    return pa.table(
        {
            "precision": pa.array([round(m.precision, 4)]),
            "recall": pa.array([round(m.recall, 4)]),
            "f1": pa.array([round(m.f1, 4)]),
            "tp": pa.array([m.tp]),
        }
    )


def _media_resize(sf_dir: str):
    """Resize stage over the checked-in media snapshot: source dims are a
    deterministic per-row function of the ref (ord of its last char), so
    the aspect-fit arithmetic is a full DuckDB oracle."""
    import pyarrow as pa
    import ray.data as rd

    from kgray.ops.media import resize_media

    media = _rpq(_KG_MEDIA_PARQUET)

    def with_dims(batch: pa.Table) -> pa.Table:
        refs = batch["media_ref"].to_pylist()
        n = len(refs)
        w = [640 + 80 * (ord(r[-1]) % 7) for r in refs]
        h = [360 + 60 * (ord(r[-1]) % 5) for r in refs]
        return batch.append_column(
            "payload", pa.array([b""] * n, pa.binary())
        ).append_column(
            "width", pa.array(w, pa.int32())
        ).append_column(
            "height", pa.array(h, pa.int32())
        ).append_column("duration_ms", pa.nulls(n, pa.int32()))

    resized = resize_media(media.map_batches(with_dims, batch_format="pyarrow"))

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "width": batch["width"],
                "height": batch["height"],
            }
        )

    return resized.map_batches(project, batch_format="pyarrow")


def _media_dup(sf_dir: str):
    """Near-duplicate media pairs over the snapshot: actor-pool feature
    decode composed with the embedding-cosine dedup machinery
    (media.media_dup_refs).  The snapshot's 64 sha-random unit vectors
    have no true near-dups, so the demo threshold (0.35) selects the
    deterministic high-similarity tail — non-empty, stable, rows-only
    (the feature space has no SQL expression)."""
    import ray.data as rd

    from kgray.ops.media import media_dup_refs

    media = _rpq(_KG_MEDIA_PARQUET)
    return media_dup_refs(media, tau=0.35)


def _media_features(sf_dir: str):
    """Actor-pool decode over the media snapshot; the SQL-checkable
    projection is (ref, kind, feature dim) — every row must come back
    from the actor stage with a FEATURE_DIM-wide vector."""
    import ray.data as rd

    from kgray.ops.media import extract_media_features

    media = _rpq(_KG_MEDIA_PARQUET)
    feats = extract_media_features(media)
    import pyarrow as pa

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "media_ref": batch["media_ref"],
                "kind": batch["kind"],
                "dim": pa.array([len(v) for v in batch["features"].to_pylist()],
                                 pa.int64()),
            }
        )

    return feats.map_batches(project, batch_format="pyarrow")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from kgray.queries import CATALOG

    out: dict[str, Callable[[str], Any]] = {
        name: fn for name, (fn, _sql) in CATALOG.items()
    }
    out.update(
        {
            "kg_flatten": _kg_flatten,
            "kg_extract": _kg_extract,
            "kg_extract_crf": _kg_extract_crf,
            "kg_extract_cnn": _kg_extract_cnn,
            "kg_extract_bilstm": _kg_extract_bilstm,
            "kg_extract_transformer": _kg_extract_transformer,
            "kg_extract_bert": _kg_extract_bert,
            "kg_extract_ensemble": _kg_extract_ensemble,
            "kg_extract_crf_ensemble": _kg_extract_crf_ensemble,
            "kg_golden": _kg_golden,
            "kg_eval": _kg_eval,
            "kg_pred_set_rates": _kg_pred_set_rates,
            "kg_link_edges": _kg_link_edges,
            "kg_link_edges_golden": _kg_link_edges_golden,
            "kg_link_degree": _kg_link_degree,
            "kg_pagerank": _kg_pagerank,
            "kg_link_triangles": _kg_link_triangles,
            "kg_canonical_golden": _kg_canonical_golden,
            "kg_link_edges_embed": _kg_link_edges_embed,
            "kg_canonical": _kg_canonical,
            "kg_spo_hist": _kg_spo_hist,
            "kg_empty_counts": _kg_empty_counts,
            "kg_vocab_chars": _kg_vocab_chars,
            "kg_filter_adapted": _kg_filter_adapted,
            "kg_multihot": _kg_multihot,
            "kg_composition_check": _kg_composition_check,
            "kg_postag_check": _kg_postag_check,
            "minhash_dup_docs": _minhash_dup_docs,
            "simhash_dup_docs": _simhash_dup_docs,
            "knn_ivf": _knn_ivf,
            "embed_dup_bucketed": _embed_dup_bucketed,
            "media_features": _media_features,
            "media_dup": _media_dup,
            "media_frames": _media_frames,
            "media_resize": _media_resize,
            "kg_eval_alias": _kg_eval_alias,
            "kg_eval_loc": _kg_eval_loc,
            "kg_span_f1": _kg_span_f1,
            "kg_resegment": _kg_resegment,
            "kg_random_spo_fill": _kg_random_spo_fill,
            "kg_wordpiece_bio": _kg_wordpiece_bio,
            "kg_word_tags": _kg_word_tags,
        }
    )
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB equivalents for every SQL-expressible query (same column
    names as the Ray results).  KG-pipeline / sketch-based entries are
    intentionally absent (non-SQL-expressible; rows-only check) — except
    the four sentence-table statistics below, whose inputs are the
    checked-in kg_sentences parquet both engines read."""
    from kgray.queries import CATALOG

    out = {name: sql for name, (fn, sql) in CATALOG.items() if sql}
    p = f"read_parquet('{_KG_SENT_PARQUET}')"
    out.update(
        {
            "kg_spo_hist": (
                "SELECT CAST(len(spo_list) AS BIGINT) AS n_spo, "
                f"CAST(COUNT(*) AS BIGINT) AS n_rows FROM {p} GROUP BY 1"
            ),
            "kg_empty_counts": (
                "SELECT "
                "CAST(SUM(CASE WHEN len(postag)=0 THEN 1 ELSE 0 END) AS BIGINT)"
                " AS empty_postag, "
                "CAST(SUM(CASE WHEN len(spo_list)=0 THEN 1 ELSE 0 END) AS "
                "BIGINT) AS empty_spo, "
                "CAST(SUM(CASE WHEN length(text)=0 THEN 1 ELSE 0 END) AS "
                "BIGINT) AS empty_text, "
                f"CAST(COUNT(*) AS BIGINT) AS total FROM {p}"
            ),
            "kg_vocab_chars": (
                "SELECT u AS token, CAST(COUNT(*) AS BIGINT) AS n FROM "
                f"(SELECT UNNEST(string_split(text, '')) AS u FROM {p}) "
                "GROUP BY 1"
            ),
            # M17 predicate-subset filter: any-spo-has-predicate semantics
            # (filter_by_predicate, featurize.py) is one list_filter in SQL
            "kg_filter_adapted": (
                "SELECT doc_id, text FROM "
                f"{p} WHERE len(list_filter(spo_list, "
                "s -> s.predicate = '改编自')) > 0"
            ),
            "kg_multihot": (
                "SELECT t.doc_id, CAST(COALESCE(u.n, 0) AS BIGINT) AS "
                f"n_schemas FROM {p} t LEFT JOIN ("
                "SELECT doc_id, COUNT(DISTINCT s.subject_type || s.predicate "
                "|| s.object_type) AS n FROM (SELECT doc_id, UNNEST(spo_list)"
                f" AS s FROM {p}) GROUP BY doc_id) u ON t.doc_id = u.doc_id"
            ),
            # golden_triples is a pure spo_list explode — one UNNEST
            "kg_golden": (
                "SELECT doc_id, s.subject AS subject, "
                "s.subject_type AS subject_type, s.predicate AS predicate, "
                "s.object AS object, s.object_type AS object_type "
                f"FROM (SELECT doc_id, UNNEST(spo_list) AS s FROM {p})"
            ),
            # MinHash-LSH output is exact-Jaccard-verified, so its oracle is
            # the exact word-3-gram Jaccard self-join (same shape as
            # ngram_dup_pairs).  With 32 bands x 2 rows, P(LSH misses a
            # j>=0.7 pair) = 0.51^32 ~ 4e-10 — the sketch is exact here.
            "minhash_dup_docs": """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
           i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS shingles
  FROM documents
  WHERE len(string_split(text,' ')) >= 3),
inv AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
cand AS (SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
         FROM inv a JOIN inv b ON a.s = b.s AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT c.u, c.v,
       ROUND(CAST(c.common AS DOUBLE) /
             (len(a.shingles) + len(b.shingles) - c.common), 4) AS jac
FROM cand c JOIN sh a ON c.u = a.doc_id JOIN sh b ON c.v = b.doc_id
WHERE CAST(c.common AS DOUBLE) /
      (len(a.shingles) + len(b.shingles) - c.common) >= 0.7
""",
            # Linking over golden triples: exact char-2-gram Jaccard over
            # distinct normalized (type, mention) pairs, same-type gate,
            # tau=0.6.  normalize = lower() then strip one enclosing 《》.
            "kg_link_edges_golden": f"""
WITH g AS (SELECT UNNEST(spo_list) AS s FROM read_parquet('{_KG_SENT_PARQUET}')),
raw AS (
  SELECT s.subject_type AS t, lower(s.subject) AS m0 FROM g
  UNION ALL
  SELECT s.object_type AS t, lower(s.object) AS m0 FROM g),
m AS (
  SELECT DISTINCT t,
    CASE WHEN starts_with(m0, '《') AND ends_with(m0, '》') AND length(m0) >= 2
         THEN substr(m0, 2, length(m0) - 2) ELSE m0 END AS m
  FROM raw),
sh AS (
  SELECT t, m,
    CASE WHEN length(m) < 2 THEN [m]
         ELSE list_distinct(list_transform(range(1, length(m)),
                                           i -> substr(m, i, 2))) END AS sg
  FROM m WHERE length(m) > 0)
SELECT u, v, sim FROM (
  SELECT a.t || chr(31) || a.m AS u, b.t || chr(31) || b.m AS v,
         CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE) /
         (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS sim
  FROM sh a JOIN sh b ON a.t = b.t AND a.m < b.m)
WHERE sim >= 0.6
""",
            # degrees over the same exact-Jaccard edge graph, counting
            # both directions (undirected semantics of node_degrees)
            "kg_link_degree": f"""
WITH g AS (SELECT UNNEST(spo_list) AS s FROM read_parquet('{_KG_SENT_PARQUET}')),
raw AS (
  SELECT s.subject_type AS t, lower(s.subject) AS m0 FROM g
  UNION ALL
  SELECT s.object_type AS t, lower(s.object) AS m0 FROM g),
m AS (
  SELECT DISTINCT t,
    CASE WHEN starts_with(m0, '《') AND ends_with(m0, '》') AND length(m0) >= 2
         THEN substr(m0, 2, length(m0) - 2) ELSE m0 END AS m
  FROM raw),
sh AS (
  SELECT t, m,
    CASE WHEN length(m) < 2 THEN [m]
         ELSE list_distinct(list_transform(range(1, length(m)),
                                           i -> substr(m, i, 2))) END AS sg
  FROM m WHERE length(m) > 0),
e AS (
  SELECT u, v FROM (
    SELECT a.t || chr(31) || a.m AS u, b.t || chr(31) || b.m AS v,
           CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE) /
           (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS sim
    FROM sh a JOIN sh b ON a.t = b.t AND a.m < b.m)
  WHERE sim >= 0.6),
sym AS (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
SELECT node, CAST(COUNT(*) AS BIGINT) AS degree FROM sym GROUP BY node
""",
            # triangle count over the same canonical (u < v) edge set:
            # a triangle x<y<z is exactly one (x,y)(y,z)(x,z) join row
            "kg_link_triangles": f"""
WITH g AS (SELECT UNNEST(spo_list) AS s FROM read_parquet('{_KG_SENT_PARQUET}')),
raw AS (
  SELECT s.subject_type AS t, lower(s.subject) AS m0 FROM g
  UNION ALL
  SELECT s.object_type AS t, lower(s.object) AS m0 FROM g),
m AS (
  SELECT DISTINCT t,
    CASE WHEN starts_with(m0, '《') AND ends_with(m0, '》') AND length(m0) >= 2
         THEN substr(m0, 2, length(m0) - 2) ELSE m0 END AS m
  FROM raw),
sh AS (
  SELECT t, m,
    CASE WHEN length(m) < 2 THEN [m]
         ELSE list_distinct(list_transform(range(1, length(m)),
                                           i -> substr(m, i, 2))) END AS sg
  FROM m WHERE length(m) > 0),
e AS (
  SELECT u, v FROM (
    SELECT a.t || chr(31) || a.m AS u, b.t || chr(31) || b.m AS v,
           CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE) /
           (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS sim
    FROM sh a JOIN sh b ON a.t = b.t AND a.m < b.m)
  WHERE sim >= 0.6)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM e a JOIN e b ON a.v = b.u JOIN e c ON a.u = c.u AND b.v = c.v
""",
            # link -> CC -> canonicalize, end-to-end: exact-Jaccard edges
            # (as above), min-label connected components via recursive CTE,
            # canonical id = component min, identity for unlinked mentions.
            "kg_canonical_golden": f"""
WITH RECURSIVE
t AS (
  SELECT doc_id, s.subject AS subject, s.subject_type AS subject_type,
         s.predicate AS predicate, s.object AS object,
         s.object_type AS object_type
  FROM (SELECT doc_id, UNNEST(spo_list) AS s
        FROM read_parquet('{_KG_SENT_PARQUET}'))),
keyed AS (
  SELECT *,
    subject_type || chr(31) ||
      CASE WHEN starts_with(lower(subject), '《')
             AND ends_with(lower(subject), '》') AND length(subject) >= 2
           THEN substr(lower(subject), 2, length(subject) - 2)
           ELSE lower(subject) END AS s_key,
    object_type || chr(31) ||
      CASE WHEN starts_with(lower(object), '《')
             AND ends_with(lower(object), '》') AND length(object) >= 2
           THEN substr(lower(object), 2, length(object) - 2)
           ELSE lower(object) END AS o_key
  FROM t),
m AS (
  SELECT DISTINCT t, m FROM (
    SELECT subject_type AS t,
           CASE WHEN starts_with(lower(subject), '《')
                  AND ends_with(lower(subject), '》') AND length(subject) >= 2
                THEN substr(lower(subject), 2, length(subject) - 2)
                ELSE lower(subject) END AS m FROM t
    UNION ALL
    SELECT object_type,
           CASE WHEN starts_with(lower(object), '《')
                  AND ends_with(lower(object), '》') AND length(object) >= 2
                THEN substr(lower(object), 2, length(object) - 2)
                ELSE lower(object) END FROM t)),
sh AS (
  SELECT t, m,
    CASE WHEN length(m) < 2 THEN [m]
         ELSE list_distinct(list_transform(range(1, length(m)),
                                           i -> substr(m, i, 2))) END AS sg
  FROM m WHERE length(m) > 0),
edges AS (
  SELECT u, v FROM (
    SELECT a.t || chr(31) || a.m AS u, b.t || chr(31) || b.m AS v,
           CAST(len(list_intersect(a.sg, b.sg)) AS DOUBLE) /
           (len(a.sg) + len(b.sg) - len(list_intersect(a.sg, b.sg))) AS sim
    FROM sh a JOIN sh b ON a.t = b.t AND a.m < b.m)
  WHERE sim >= 0.6),
sym AS (SELECT u AS src, v AS dst FROM edges
        UNION ALL SELECT v, u FROM edges),
cc AS (
  SELECT src AS node, src AS label FROM sym
  UNION
  SELECT s.dst AS node, cc.label FROM cc JOIN sym s ON s.src = cc.node),
comp AS (SELECT node, min(label) AS component FROM cc GROUP BY node)
SELECT k.doc_id, k.subject, k.subject_type, k.predicate, k.object,
       k.object_type,
       COALESCE(c1.component, k.s_key) AS subject_canonical,
       COALESCE(c2.component, k.o_key) AS object_canonical
FROM keyed k
LEFT JOIN comp c1 ON k.s_key = c1.node
LEFT JOIN comp c2 ON k.o_key = c2.node
""",
            # Aspect-fit resize arithmetic over the media snapshot:
            # scale = min(256/w, 256/h, 1.0); dim = max(1, trunc(dim*scale))
            # (fit_box, kgray/ops/media.py).  Source dims derive from
            # ord(last char of the ref) exactly as the Ray query does.
            "media_resize": f"""
WITH m AS (
  SELECT media_ref,
         640 + 80 * (ord(substr(media_ref, length(media_ref))) % 7) AS w,
         360 + 60 * (ord(substr(media_ref, length(media_ref))) % 5) AS h
  FROM read_parquet('{_KG_MEDIA_PARQUET}')),
s AS (SELECT media_ref, w, h,
             LEAST(256.0 / w, 256.0 / h, 1.0) AS sc FROM m)
SELECT media_ref,
       CAST(GREATEST(1, CAST(trunc(w * sc) AS BIGINT)) AS INTEGER) AS width,
       CAST(GREATEST(1, CAST(trunc(h * sc) AS BIGINT)) AS INTEGER) AS height
FROM s
""",
            # Frame-sampling arithmetic over the media snapshot:
            # n = min(8, max(1, dur // 1000)) frames, t = idx * 1000,
            # dur = 1000 + 700 * (ord(last char of ref) % 5).
            "media_frames": f"""
WITH m AS (
  SELECT media_ref,
         1000 + 700 * (ord(substr(media_ref, length(media_ref))) % 5) AS dur
  FROM read_parquet('{_KG_MEDIA_PARQUET}'))
SELECT media_ref,
       CAST(i AS INTEGER) AS frame_idx,
       CAST(i * 1000 AS INTEGER) AS t_ms
FROM m, UNNEST(range(LEAST(8, GREATEST(1, dur // 1000)))) AS t(i)
""",
            # Every snapshot row must return from the decode actor pool
            # with a FEATURE_DIM(=32)-wide vector.
            "media_features": (
                "SELECT media_ref, kind, CAST(32 AS BIGINT) AS dim "
                f"FROM read_parquet('{_KG_MEDIA_PARQUET}')"
            ),
            # Span reassembly: concat of kind='text' span texts in offset
            # order must equal flatten_documents' binary_join output.
            "kg_flatten": f"""
WITH e AS (SELECT doc_id, UNNEST(spans) AS s
           FROM read_parquet('{_KG_DOCS_PARQUET}'))
SELECT doc_id, string_agg(s.text, '' ORDER BY s.offset) AS text
FROM e WHERE s.kind = 'text' GROUP BY doc_id
""",
            # check_concat_postag analogue over the sentences snapshot.
            "kg_postag_check": (
                "SELECT doc_id, "
                "CAST(COALESCE(array_to_string(list_transform(postag, "
                "x -> x.word), ''), '') = text AS BIGINT) AS ok, "
                "CAST(len(postag) AS BIGINT) AS n_words "
                f"FROM read_parquet('{_KG_SENT_PARQUET}')"
            ),
        }
    )
    return out
