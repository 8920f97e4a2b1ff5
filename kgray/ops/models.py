"""Learned-model slots for the two pipeline stages (A1-A7 of SURVEY.md §2.3).

This container ships no torch, so the model classes raise
NotImplementedError from __init__ until torch is importable — but their
CONTRACT (constructor signature, __call__ batch shape, output columns) is
identical to the deterministic stand-ins, so at deploy time the only
change is ``PipelineConfig(classifier_cls=CnnPredicateScorer,
labeler_cls=BiLstmCrfLabeler, execution="actors")`` plus ``num_gpus`` on
the stage.  Architecture shapes mirror the reference:

* CnnPredicateScorer — char-embed 128, kernels (3,4,5)x128, sigmoid over
  50 schemas (/root/reference/classification/model.py:7-31, config.py:23-31)
* BiLstmCrfLabeler   — char/word/pos embeds 64 + schema one-hot 50 ->
  2-layer BiLSTM(128) -> FC -> CRF with BIESO-legal transitions
  (/root/reference/labeling/model.py:14-162, crf.py:12-160)
"""

from __future__ import annotations

import pyarrow as pa

try:  # pragma: no cover - torch not shipped in this container
    import torch  # noqa: F401

    HAVE_TORCH = True
except ImportError:
    HAVE_TORCH = False

_MSG = (
    "torch is not available in this environment; use the deterministic "
    "CueClassifier/TemplateLabeler, or install torch and load weights via "
    "the checkpoint_path argument"
)


class CnnPredicateScorer:
    """Stage-1 slot: text batch -> + scores list<float32>[50].

    Actor-pool stage: weights load ONCE per actor in __init__ (the
    stateful-stage pattern, SURVEY.md §2.3 A1); __call__ is pure per
    batch and must append the same ``scores`` column CueClassifier does
    (kgray/ops/classify.py), so threshold_and_fallback composes unchanged.
    """

    def __init__(self, checkpoint_path: str | None = None,
                 text_col: str = "text", device: str = "cpu"):
        if not HAVE_TORCH:  # pragma: no cover
            raise NotImplementedError(_MSG)
        raise NotImplementedError(
            "weight loading intentionally unimplemented in this round; "
            "wire: torch.load(checkpoint_path) -> embed(128) -> "
            "convs(3/4/5 x128) -> maxpool -> fc(50) -> sigmoid"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError(_MSG)


class BiLstmCrfLabeler:
    """Stage-2 slot: fan-out batch (doc_id, text, schema_id) -> triple rows.

    Must emit the TRIPLES schema exactly as TemplateLabeler does — the
    model produces BIESO tag ids, then the SHARED codec path
    (kgray.ops.tagging.decode_tags / assemble_spo) turns them into rows,
    so parity with the reference decoder is inherited, not re-implemented.
    """

    def __init__(self, checkpoint_path: str | None = None,
                 encoding_type: str = "bieso", device: str = "cpu"):
        if not HAVE_TORCH:  # pragma: no cover
            raise NotImplementedError(_MSG)
        raise NotImplementedError(
            "weight loading intentionally unimplemented in this round; "
            "wire: embeds(char/word/pos 64) + schema one-hot -> LayerNorm "
            "-> BiLSTM(128, 2 layers) -> FC -> CRF viterbi with BIESO "
            "transition constraints"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError(_MSG)
