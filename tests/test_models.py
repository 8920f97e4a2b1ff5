"""Numpy CNN scorer (A1): real conv/pool/fc/sigmoid execution with
cue-distilled weights equals CueClassifier; checkpoints round-trip."""

import numpy as np
import pyarrow as pa

from kgray.corpus import doc_ids_for_range, sentences_table
from kgray.ops.classify import SCORES_COL, CueClassifier
from kgray.ops.models import NumpyCnnScorer
from kgray.schema import NUM_SCHEMAS


def _mat(tbl):
    col = tbl[SCORES_COL]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(tbl), NUM_SCHEMAS)


def _batch(n=60):
    t = sentences_table(doc_ids_for_range(0, n), seed=42)
    return pa.table({"doc_id": t["doc_id"], "text": t["text"]})


def test_cnn_forward_matches_cue_detection():
    b = _batch()
    cue = _mat(CueClassifier()(b))
    cnn = _mat(NumpyCnnScorer()(b))
    # sigmoid saturates to ~{0,1}; thresholded at 0.5 it IS cue detection
    assert np.array_equal((cnn >= 0.5).astype(np.float32), cue)
    assert float(np.minimum(cnn, 1 - cnn).max()) < 1e-9


def test_cnn_checkpoint_round_trip(tmp_path):
    b = _batch(20)
    s = NumpyCnnScorer()
    path = str(tmp_path / "cnn.npz")
    s.save(path)
    loaded = NumpyCnnScorer(checkpoint_path=path)
    np.testing.assert_array_equal(_mat(s(b)), _mat(loaded(b)))


def test_cnn_conv_is_positional():
    """The conv really slides: a cue split across the text matches only
    when contiguous."""
    from kgray.templates import CUES

    cue = CUES[0]
    hit = pa.table({"doc_id": ["a"], "text": [f"xx{cue}yy"]})
    split = pa.table({"doc_id": ["a"], "text": [cue[0] + "x" + cue[1:]]})
    s = NumpyCnnScorer()
    assert _mat(s(hit))[0, 0] > 0.5
    assert _mat(s(split))[0, 0] < 0.5


def test_cnn_empty_and_short_texts():
    b = pa.table({"doc_id": ["a", "b"], "text": ["", "x"]})
    m = _mat(NumpyCnnScorer()(b))
    assert (m < 0.5).all()


def test_bilstm_crf_labeler_executes_and_emits_legal_tags():
    """Untrained weights: output triples are arbitrary but every decoded
    tag path must be BIESO-legal (constrained Viterbi), deterministic
    for a fixed seed, and schema-correct."""
    import pyarrow as pa

    from kgray.ops.crf import BIESO_TAGS, allowed_transitions
    from kgray.ops.models import NumpyBiLstmCrfLabeler
    from kgray.schema import TRIPLES

    lab = NumpyBiLstmCrfLabeler(seed=3)
    texts = ["甲的丈夫是乙", "某某出生于某地", ""]
    batch = pa.table(
        {
            "doc_id": ["d1", "d2", "d3"],
            "text": texts,
            "schema_id": [0, 1, 0],
        }
    )
    out = lab(batch)
    assert out.schema.equals(TRIPLES)
    # determinism
    out2 = NumpyBiLstmCrfLabeler(seed=3)(batch)
    assert out.equals(out2)

    # tag-path legality, checked at the scores->decode level
    logits, mask = lab.scores(texts[:2], [0, 1])
    paths = lab.decoder.decode(logits, mask)
    legal = set(allowed_transitions(BIESO_TAGS, "bieso"))
    t2i = {t: i for i, t in BIESO_TAGS.items()}
    n = len(BIESO_TAGS)
    for p in paths:
        ids = [n] + [t2i[t] for t in p] + [n + 1]
        assert all((a, b) in legal for a, b in zip(ids, ids[1:]))
    assert len(paths[0]) == len(texts[0])
    assert len(paths[1]) == len(texts[1])


def test_bilstm_checkpoint_round_trip(tmp_path):
    """The documented npz landing pad round-trips: save() -> load ->
    identical triples (VERDICT item: spec a converted torch checkpoint
    could target)."""
    import pyarrow as pa

    from kgray.ops.models import NumpyBiLstmCrfLabeler

    batch = pa.table(
        {
            "doc_id": ["d1", "d2"],
            "text": ["甲的丈夫是乙", "某某出生于某地"],
            "schema_id": [0, 1],
        }
    )
    lab = NumpyBiLstmCrfLabeler(seed=5)
    path = str(tmp_path / "bilstm.npz")
    lab.save(path)
    loaded = NumpyBiLstmCrfLabeler(checkpoint_path=path)
    assert lab(batch).equals(loaded(batch))


def test_transformer_crf_labeler_executes_and_emits_legal_tags():
    """A5: numpy transformer-encoder + constrained Viterbi — BIESO-legal
    paths, deterministic, schema-correct, npz round-trip."""
    import pyarrow as pa

    from kgray.ops.crf import BIESO_TAGS, allowed_transitions
    from kgray.ops.models import NumpyTransformerCrfLabeler
    from kgray.schema import TRIPLES

    lab = NumpyTransformerCrfLabeler(seed=3, num_layers=2)
    texts = ["甲的丈夫是乙", "某某出生于某地", ""]
    batch = pa.table(
        {"doc_id": ["d1", "d2", "d3"], "text": texts, "schema_id": [0, 1, 0]}
    )
    out = lab(batch)
    assert out.schema.equals(TRIPLES)
    assert out.equals(NumpyTransformerCrfLabeler(seed=3, num_layers=2)(batch))

    logits, mask = lab.scores(texts[:2], [0, 1])
    paths = lab.decoder.decode(logits, mask)
    legal = set(allowed_transitions(BIESO_TAGS, "bieso"))
    t2i = {t: i for i, t in BIESO_TAGS.items()}
    n = len(BIESO_TAGS)
    for p in paths:
        ids = [n] + [t2i[t] for t in p] + [n + 1]
        assert all((a, b) in legal for a, b in zip(ids, ids[1:]))
    assert [len(p) for p in paths] == [len(texts[0]), len(texts[1])]


def test_transformer_checkpoint_round_trip(tmp_path):
    import pyarrow as pa

    from kgray.ops.models import NumpyTransformerCrfLabeler

    batch = pa.table(
        {"doc_id": ["d1"], "text": ["甲导演了乙然后又执导丙"], "schema_id": [2]}
    )
    lab = NumpyTransformerCrfLabeler(seed=9, num_layers=2)
    path = str(tmp_path / "tfm.npz")
    lab.save(path)
    loaded = NumpyTransformerCrfLabeler(checkpoint_path=path)
    assert lab(batch).equals(loaded(batch))


def test_transformer_attention_is_masked():
    """Padding must not leak: a short text scores identically whether it
    shares a batch with long texts (heavy padding) or stands alone."""
    from kgray.ops.models import NumpyTransformerCrfLabeler

    lab = NumpyTransformerCrfLabeler(seed=3, num_layers=2)
    solo, _ = lab.scores(["甲的丈夫是乙"], [0])
    mixed, _ = lab.scores(["甲的丈夫是乙", "某" * 40], [0, 1])
    # float32 forward: BLAS blocking differs across pad shapes -> ~1e-6
    np.testing.assert_allclose(mixed[0, :6], solo[0, :6], atol=1e-4)


def test_bert_scorer_executes_and_is_masked():
    """A2: numpy BERT forward — (n, 50) probabilities in (0, 1),
    deterministic, padding-invariant via the attention mask."""
    from kgray.ops.models import NumpyBertScorer

    b = _batch(12)
    s = NumpyBertScorer(seed=1)
    out = s(b)
    m = _mat(out)
    assert m.shape == (12, NUM_SCHEMAS)
    assert ((m > 0) & (m < 1)).all()
    np.testing.assert_array_equal(m, _mat(NumpyBertScorer(seed=1)(b)))

    # masking: same text scores the same regardless of batch company
    short = "甲的丈夫是乙"
    solo = s.forward([short])
    mixed = s.forward([short, "某" * 60])
    np.testing.assert_allclose(mixed[0], solo[0], atol=1e-7)


def test_bert_checkpoint_round_trip(tmp_path):
    from kgray.ops.models import NumpyBertScorer

    b = _batch(8)
    s = NumpyBertScorer(seed=4)
    path = str(tmp_path / "bert.npz")
    s.save(path)
    loaded = NumpyBertScorer(checkpoint_path=path)
    np.testing.assert_array_equal(_mat(s(b)), _mat(loaded(b)))
