"""kgray — a Ray-Data-native knowledge-graph construction engine.

From-scratch reimplementation of the capabilities of the reference repo
zhongyuchen/information-extraction (2019 LIC/SKE schema-constrained SPO
triple extraction) as an idiomatic Ray Data pipeline:

    read interleaved documents
      -> span codec (spans <-> text, per-row invariant)
      -> stage-1 multi-label predicate classification (actor pool)
      -> threshold + top-k fallback
      -> fan-out to (doc, schema) rows
      -> stage-2 BIESO span labeling (actor pool)
      -> tag decode + SPO assembly
      -> triple dedup, entity linking, canonicalization
      -> partitioned, resumable graph materialization

plus the large-scale training-data operators (dedup family, similarity
search, text analysis, multimodal plumbing) that a 100 TB pipeline needs.

No code is copied from the reference; semantics are cited per-function as
/root/reference/<file>:<lines>.
"""

__version__ = "0.1.0"
