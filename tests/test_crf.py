"""Numpy CRF decode (A6): transition-legality tables and constrained
Viterbi parity with hand-worked sequences, plus e2e equivalence of the
CrfLabeler with the template labeler on legal emissions."""

import numpy as np
import pytest

from kgray.ops.crf import (
    BIESO_TAGS,
    CrfLabeler,
    ViterbiTagDecoder,
    allowed_transitions,
    constrained_transitions,
    one_hot_scores,
    viterbi_decode,
)


def test_allowed_transitions_bieso_table():
    n = len(BIESO_TAGS)
    start, end = n, n + 1
    allowed = set(allowed_transitions(BIESO_TAGS, "bieso"))
    t2i = {t: i for i, t in BIESO_TAGS.items()}

    # start may open with B, S, O — never I or E
    assert (start, t2i["B-SUB"]) in allowed
    assert (start, t2i["S-OBJ"]) in allowed
    assert (start, t2i["O"]) in allowed
    assert (start, t2i["I-SUB"]) not in allowed
    assert (start, t2i["E-OBJ"]) not in allowed
    # B/I continue only within the same label
    assert (t2i["B-SUB"], t2i["I-SUB"]) in allowed
    assert (t2i["B-SUB"], t2i["E-SUB"]) in allowed
    assert (t2i["B-SUB"], t2i["I-OBJ"]) not in allowed
    assert (t2i["B-SUB"], t2i["O"]) not in allowed
    assert (t2i["I-OBJ"], t2i["E-OBJ"]) in allowed
    assert (t2i["I-OBJ"], t2i["B-OBJ"]) not in allowed
    # E/S/O may close, restart, or end
    assert (t2i["E-SUB"], t2i["B-OBJ"]) in allowed
    assert (t2i["S-SUB"], t2i["O"]) in allowed
    assert (t2i["O"], end) in allowed
    assert (t2i["B-SUB"], end) not in allowed
    # nothing enters start, nothing leaves end
    assert not any(t == start for _, t in allowed)
    assert not any(f == end for f, _ in allowed)


def test_allowed_transitions_bio():
    id2t = {0: "B-X", 1: "I-X", 2: "O", 3: "B-Y", 4: "I-Y"}
    allowed = set(allowed_transitions(id2t, "bio"))
    assert (5, 0) in allowed and (5, 2) in allowed  # start -> B/O
    assert (5, 1) not in allowed                     # start -> I
    assert (0, 1) in allowed and (0, 4) not in allowed  # label match for I
    assert (2, 1) not in allowed                     # O -> I
    assert (2, 6) in allowed                         # O -> end


def test_viterbi_picks_best_unconstrained_path():
    # 2 tags, flat transitions: best path = per-position argmax
    trans = np.zeros((4, 4))
    logits = np.array([[[0.1, 0.9], [0.8, 0.2], [0.3, 0.7]]])
    mask = np.ones((1, 3), bool)
    paths, scores = viterbi_decode(logits, mask, trans)
    assert paths == [[1, 0, 1]]
    assert scores[0] == pytest.approx(0.9 + 0.8 + 0.7)


def test_viterbi_respects_transition_scores():
    # staying in the same tag pays +1: sticky path beats per-position argmax
    trans = np.zeros((4, 4))
    trans[0, 0] = trans[1, 1] = 1.0
    logits = np.array([[[1.0, 0.0], [0.4, 0.6], [1.0, 0.0]]])
    mask = np.ones((1, 3), bool)
    paths, scores = viterbi_decode(logits, mask, trans)
    assert paths == [[0, 0, 0]]
    assert scores[0] == pytest.approx(1.0 + 1 + 0.4 + 1 + 1.0)


def test_viterbi_constraint_blocks_illegal_start():
    # emissions prefer I-X at every position; bio forbids start->I and O->I,
    # so the decoded path must be a LEGAL one (B-X then I-X)
    id2t = {0: "B-X", 1: "I-X", 2: "O"}
    trans = constrained_transitions(id2t, "bio")
    logits = np.array([[[0.0, 0.9, 0.1], [0.0, 0.9, 0.1]]])
    mask = np.ones((1, 2), bool)
    paths, _ = viterbi_decode(logits, mask, trans)
    assert paths == [[0, 1]]  # B-X, I-X — not [1, 1]


def test_viterbi_mask_unpads_rows():
    trans = np.zeros((4, 4))
    logits = np.zeros((2, 3, 2))
    logits[0, :, 1] = 1.0  # row 0: len 3, all tag 1
    logits[1, 0, 0] = 1.0  # row 1: len 1, tag 0 (padding prefers tag 1!)
    logits[1, 1:, 1] = 9.0
    mask = np.array([[True, True, True], [True, False, False]])
    paths, _ = viterbi_decode(logits, mask, trans)
    assert paths[0] == [1, 1, 1]
    assert paths[1] == [0]


def test_decoder_identity_on_legal_tags():
    rows = [
        ["B-SUB", "E-SUB", "O", "S-OBJ"],
        ["O"],
        ["S-SUB", "B-OBJ", "I-OBJ", "E-OBJ"],
    ]
    logits, mask = one_hot_scores(rows)
    dec = ViterbiTagDecoder()
    assert dec.decode(logits, mask) == rows


def test_decoder_repairs_illegal_sequence():
    # B-SUB followed by O is illegal in bieso; the decode must return a
    # legal path, never the raw emission argmax
    rows = [["B-SUB", "O", "O"]]
    logits, mask = one_hot_scores(rows)
    out = ViterbiTagDecoder().decode(logits, mask)[0]
    allowed = set(allowed_transitions(BIESO_TAGS, "bieso"))
    t2i = {t: i for i, t in BIESO_TAGS.items()}
    n = len(BIESO_TAGS)
    path = [n] + [t2i[t] for t in out] + [n + 1]
    assert all((a, b) in allowed for a, b in zip(path, path[1:]))


def test_crf_labeler_matches_template_labeler(ray_session):
    import ray.data as rd

    from kgray.corpus import doc_ids_for_range, interleaved_table
    from kgray.pipeline import PipelineConfig, extract_triples

    docs = rd.from_arrow(interleaved_table(doc_ids_for_range(0, 40), seed=7))
    base = extract_triples(docs, PipelineConfig()).to_pandas()
    crf = extract_triples(
        docs, PipelineConfig(labeler_cls=CrfLabeler)
    ).to_pandas()
    key = ["doc_id", "subject", "predicate", "object", "schema_id"]
    b = base.sort_values(key, ignore_index=True)
    c = crf.sort_values(key, ignore_index=True)
    assert b.equals(c)
    assert len(b) > 20


def test_viterbi_matches_bruteforce_enumeration():
    """Exhaustive oracle: for random small (B,L,T) problems the viterbi
    path must equal argmax over ALL T^L paths (including start/end
    transition rows)."""
    import itertools

    rs = np.random.RandomState(5)
    for trial in range(25):
        T = rs.randint(2, 4)
        L = rs.randint(1, 5)
        B = 2
        logits = rs.normal(size=(B, L, T))
        trans = rs.normal(size=(T + 2, T + 2))
        mask = np.ones((B, L), bool)
        mask[1, rs.randint(1, L + 1):] = False  # row 1: random true length
        paths, scores = viterbi_decode(logits, mask, trans)
        for b in range(B):
            n = int(mask[b].sum())
            best, best_s = None, -np.inf
            for cand in itertools.product(range(T), repeat=n):
                s = trans[T, cand[0]] + logits[b, 0, cand[0]]
                for t in range(1, n):
                    s += trans[cand[t - 1], cand[t]] + logits[b, t, cand[t]]
                s += trans[cand[-1], T + 1]
                if s > best_s:
                    best, best_s = list(cand), s
            assert paths[b] == best, (trial, b)
            assert scores[b] == pytest.approx(best_s)
