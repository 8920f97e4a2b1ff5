"""Ensemble combinators (A3/A7): weighted prob-average parity with the
serial reference formula, and member-weighted recovery in the labeler
ensemble."""

import numpy as np
import pyarrow as pa

from kgray.ops.classify import SCORES_COL, CueClassifier
from kgray.ops.ensemble import (
    CharOverlapClassifier,
    EnsembleClassifier,
    EnsembleCrfLabeler,
)
from kgray.ops.label import TemplateLabeler
from kgray.schema import NUM_SCHEMAS


def _mat(tbl):
    col = tbl[SCORES_COL]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(tbl), NUM_SCHEMAS)


_BATCH = pa.table(
    {
        "doc_id": ["d1", "d2", "d3"],
        "text": ["《A》的作者是B", "C的身高是180厘米", "plain text, no cues"],
    }
)


def test_ensemble_matches_serial_weighted_average():
    """output == sum(w_i * p_i) / sum(w) — classification/ensemble.py:120-133."""
    weights = [1.0, 10.0, 30.0]
    members = [CueClassifier(), CharOverlapClassifier(), CueClassifier()]
    ens = EnsembleClassifier(members=list(members), weights=weights)
    got = _mat(ens(_BATCH))

    want = np.zeros((len(_BATCH), NUM_SCHEMAS), np.float32)
    for m, w in zip(members, weights):
        want += np.float32(w) * _mat(m(_BATCH))
    want /= np.float32(sum(weights))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_ensemble_degenerates_to_single_member():
    ens = EnsembleClassifier(members=[CueClassifier], weights=[7.0])
    np.testing.assert_allclose(_mat(ens(_BATCH)), _mat(CueClassifier()(_BATCH)))


class _DropObjLabeler(TemplateLabeler):
    """Corrupted member: erases all OBJ marks."""

    def predict_tags(self, text, schema_id):
        return [
            "O" if t.endswith("OBJ") else t
            for t in super().predict_tags(text, schema_id)
        ]


def test_labeler_ensemble_outvotes_corrupted_member():
    """3:1 weighted combine must recover the clean member's triples."""
    fan = pa.table(
        {
            "doc_id": ["d1"],
            "text": ["甲的丈夫是乙"],
            "schema_id": [0],
        }
    )
    base = TemplateLabeler()(fan).to_pandas()
    assert len(base) > 0  # schema 0 (丈夫) template must fire on this sentence

    ens = EnsembleCrfLabeler(
        members=[TemplateLabeler(), _DropObjLabeler()], weights=[3.0, 1.0]
    )
    got = ens(fan).to_pandas()
    key = ["doc_id", "subject", "predicate", "object"]
    assert got.sort_values(key, ignore_index=True).equals(
        base.sort_values(key, ignore_index=True)
    )

    # sanity: the corrupted member ALONE loses the objects
    alone = _DropObjLabeler()(fan).to_pandas()
    assert len(alone) == 0


def test_labeler_ensemble_identity_when_members_agree():
    fan = pa.table(
        {
            "doc_id": ["d1", "d2"],
            "text": ["甲的丈夫是乙", ""],
            "schema_id": [0, 0],
        }
    )
    base = TemplateLabeler()(fan).to_pandas()
    ens = EnsembleCrfLabeler()(fan).to_pandas()
    key = ["doc_id", "subject", "predicate", "object"]
    assert ens.sort_values(key, ignore_index=True).equals(
        base.sort_values(key, ignore_index=True)
    )
