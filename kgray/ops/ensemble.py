"""Ensemble combinators for the two model stages (A3 / A7).

Reimplements, as dataflow, the reference's ensembling semantics:

* classifier ensemble (/root/reference/classification/ensemble.py:85-141):
  ``prob = sum_i(weight_i * prob_i) / sum(weight)`` over N scorers
  (production weights [1,10,30,9,100], ensemble.py:205), then the usual
  threshold+fallback consumes the averaged probs unchanged;
* labeler ensemble (/root/reference/labeling/ensemble.py:126-166): members'
  per-position tag score tensors are summed and normalized, then ONE
  decode runs on the combined scores.  (The reference normalizes by
  sum(weight) but sums unweighted member scores — a quirk of that script;
  we weight each member as the classifier ensemble does and document the
  divergence here.)

Ray-native shape: ONE ``map_batches`` stage holds every member's state
(each member is built once per actor in ``__init__``) and runs them
serially on the same in-memory batch — N members never re-read or
re-shuffle the dataset.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from kgray.ops.classify import SCORES_COL
from kgray.schema import NUM_SCHEMAS


class CharOverlapClassifier:
    """Second deterministic scorer (distinct lens from CueClassifier):
    score[i] = fraction of schema i's distinct cue characters present in
    the text.  Soft scores in [0,1] — gives the ensemble real averaging
    work.  Vectorized: one match_substring kernel per distinct cue char."""

    def __init__(self, text_col: str = "text"):
        from kgray.templates import CUES

        self.text_col = text_col
        self.cue_chars: list[list[str]] = [
            sorted(set(CUES[i])) for i in range(NUM_SCHEMAS)
        ]
        # distinct chars across all cues -> one kernel per char, reused
        self.all_chars = sorted({c for chars in self.cue_chars for c in chars})

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        n = len(batch)
        hit = {
            c: pc.match_substring(text, c).to_numpy(zero_copy_only=False)
            for c in self.all_chars
        }
        mat = np.zeros((n, NUM_SCHEMAS), dtype=np.float32)
        for sid, chars in enumerate(self.cue_chars):
            acc = np.zeros(n, np.float32)
            for c in chars:
                acc += hit[c]
            mat[:, sid] = acc / max(len(chars), 1)
        scores = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), NUM_SCHEMAS
        )
        return batch.append_column(SCORES_COL, scores)


def _scores_matrix(tbl: pa.Table, n: int) -> np.ndarray:
    col = tbl[SCORES_COL]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(n, NUM_SCHEMAS)


class EnsembleClassifier:
    """A3: weighted prob-average over N member scorers in one stage.

    ``members`` are scorer FACTORIES (callable classes); each instance is
    built once per actor.  Matches classification/ensemble.py:120-133:
    every member scores the same batch, probs combine as
    ``sum(w_i * p_i) / sum(w)`` and land in the standard scores column, so
    ``threshold_and_fallback`` composes unchanged.
    """

    def __init__(self, members: list | None = None,
                 weights: list[float] | None = None,
                 text_col: str = "text"):
        from kgray.ops.classify import CueClassifier

        factories = members or [CueClassifier, CharOverlapClassifier]
        self.members = [
            f(text_col=text_col) if isinstance(f, type) else f
            for f in factories
        ]
        w = weights if weights is not None else [1.0] * len(self.members)
        if len(w) != len(self.members):
            raise ValueError("weights must match members")
        self.weights = np.asarray(w, np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        acc = np.zeros((n, NUM_SCHEMAS), np.float32)
        for member, w in zip(self.members, self.weights):
            scored = member(batch)
            acc += w * _scores_matrix(scored, n)
        acc /= self.weights.sum()
        scores = pa.FixedSizeListArray.from_arrays(
            pa.array(acc.reshape(-1), pa.float32()), NUM_SCHEMAS
        )
        return batch.append_column(SCORES_COL, scores)


class EnsembleCrfLabeler:
    """A7: members emit per-position tag scores for the same fan-out rows;
    the weighted average decodes ONCE through the constrained Viterbi and
    the shared codec (labeling/ensemble.py:126-166 shape).

    Members need ``predict_tags(text, schema_id) -> list[str]`` (tag
    strings become one-hot score planes) — the same pluggable contract as
    the labeler slot itself.
    """

    def __init__(self, members: list | None = None,
                 weights: list[float] | None = None,
                 encoding_type: str = "bieso"):
        from kgray.ops.crf import BIESO_TAGS, ViterbiTagDecoder
        from kgray.ops.label import TemplateLabeler

        factories = members or [TemplateLabeler, TemplateLabeler]
        self.members = [
            f(encoding_type) if isinstance(f, type) else f for f in factories
        ]
        w = weights if weights is not None else [1.0] * len(self.members)
        if len(w) != len(self.members):
            raise ValueError("weights must match members")
        self.weights = np.asarray(w, np.float64)
        self.decoder = ViterbiTagDecoder(BIESO_TAGS, encoding_type)
        self.tag2id = {t: i for i, t in BIESO_TAGS.items()}

    def _combined_scores(
        self, texts: list[str], sids: list[int]
    ) -> tuple[np.ndarray, np.ndarray]:
        B = len(texts)
        L = max((len(t) for t in texts), default=0)
        T = len(self.tag2id)
        logits = np.zeros((B, max(L, 1), T), np.float64)
        mask = np.zeros((B, max(L, 1)), bool)
        for b, (text, sid) in enumerate(zip(texts, sids)):
            mask[b, : len(text)] = True
            for member, w in zip(self.members, self.weights):
                tags = member.predict_tags(text, sid)
                ids = [self.tag2id[t] for t in tags]
                logits[b, np.arange(len(ids)), ids] += w
        logits /= self.weights.sum()
        return logits, mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        from kgray.ops.tagging import assemble_spo, decode_tags
        from kgray.schema import SCHEMAS, TRIPLES

        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        sids = batch["schema_id"].to_pylist()

        nonempty = [i for i, t in enumerate(texts) if t]
        decoded: dict[int, list[str]] = {}
        if nonempty:
            logits, mask = self._combined_scores(
                [texts[i] for i in nonempty], [sids[i] for i in nonempty]
            )
            for i, tags in zip(nonempty, self.decoder.decode(logits, mask)):
                decoded[i] = tags

        out: dict[str, list] = {name: [] for name in TRIPLES.names}
        for i, (doc_id, text, sid) in enumerate(zip(doc_ids, texts, sids)):
            subs, objs = decode_tags(decoded.get(i, []), text)
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
