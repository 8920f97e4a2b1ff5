"""Stage-2 sequence labeling + span decode + SPO assembly.

The actor-pool analogue of the reference's BiLSTM-CRF labeler
(/root/reference/labeling/model.py:14-162, predict.py:131-184): a callable
class whose state (compiled per-schema patterns — standing in for model
weights) is built once per actor; each batch of fan-out rows
(doc_id, text, schema_id) yields BIESO tag sequences, which flow through
the *real* codec path — decode_tags (labeling/predict.py:50-71) and
assemble_spo (labeling/predict.py:74-81) — to triple rows.

The labeler is pluggable: anything with ``predict_tags(text, schema_id) ->
list[str]`` works (mirroring the reference's task_names model dispatch,
labeling/train.py:47-71).  ``TemplateLabeler`` is the deterministic
instance; a learned model would hold tensors instead of regexes.

The per-row regex loop is inherent to sequence labeling (the reference
loops per batch row too, predict.py:146-167); state is compiled once and
the loop touches only ~300-char strings.
"""

from __future__ import annotations

import re

import pyarrow as pa

from kgray.ops.tagging import assemble_spo, decode_tags, tags_for_pairs
from kgray.schema import SCHEMAS, TRIPLES
from kgray.templates import TEMPLATES


class TemplateLabeler:
    """Deterministic stage-2 labeler: per-schema template regexes -> tags."""

    def __init__(self, encoding_type: str = "bieso"):
        self.encoding_type = encoding_type
        self.patterns: dict[int, re.Pattern] = {
            sid: tpl.regex() for sid, tpl in TEMPLATES.items()
        }
        self.multi_object: dict[int, bool] = {
            sid: tpl.multi_object for sid, tpl in TEMPLATES.items()
        }

    def predict_tags(self, text: str, schema_id: int) -> list[str]:
        pairs: list[tuple[str, str]] = []
        pattern = self.patterns[schema_id]
        for m in pattern.finditer(text):
            s, o = m.group("s"), m.group("o")
            if self.multi_object[schema_id]:
                pairs.extend((s, oo) for oo in o.split("、"))
            else:
                pairs.append((s, o))
        return tags_for_pairs(text, pairs, self.encoding_type)

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        sids = batch["schema_id"].to_pylist()

        out: dict[str, list] = {name: [] for name in TRIPLES.names}
        for doc_id, text, sid in zip(doc_ids, texts, sids):
            tags = self.predict_tags(text, sid)
            subs, objs = decode_tags(tags, text)
            schema = SCHEMAS[sid]
            for spo in assemble_spo(
                subs, objs, sid, schema.subject_type, schema.predicate,
                schema.object_type,
            ):
                out["doc_id"].append(doc_id)
                for k in ("subject", "subject_type", "predicate", "object",
                          "object_type", "schema_id"):
                    out[k].append(spo[k])
        return pa.table(out, schema=TRIPLES)
