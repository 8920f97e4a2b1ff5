"""Property-based tests (hypothesis) for the pure tag codec — the
invariants SURVEY.md §5 calls out: tag->decode round-trips recover planted
spans, every decoded entity is a substring of the text, tag sequences are
always text-length, and the normalizer is idempotent."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kgray.ops.tagging import (
    decode_tags,
    find_all,
    normalize_entity,
    tags_for_pairs,
)

# CJK-ish + latin alphabet; short alphabet makes collisions (overlapping
# occurrences, sub==obj) likely — exactly the edge cases worth hammering
_ALPHA = "ab甲乙丙丁《》x"
texts = st.text(alphabet=_ALPHA, min_size=1, max_size=40)
entities = st.text(alphabet=_ALPHA.replace("《", "").replace("》", ""),
                   min_size=1, max_size=5)


@given(texts, entities, entities)
@settings(max_examples=300, deadline=None)
def test_tags_length_and_alignment(text, s, o):
    tags = tags_for_pairs(text, [(s, o)])
    assert len(tags) == len(text)


@given(texts, entities, entities)
@settings(max_examples=300, deadline=None)
def test_decoded_entities_are_substrings(text, s, o):
    tags = tags_for_pairs(text, [(s, o)])
    subs, objs = decode_tags(tags, text)
    low = text.lower()
    for e in subs + objs:
        assert e.lower() in low


@given(st.text(alphabet=_ALPHA, min_size=2, max_size=30), entities, entities)
@settings(max_examples=300, deadline=None)
def test_round_trip_recovers_planted_pair(prefix, s, o):
    """If s and o occur in the text and don't overlap each other's
    occurrences, decode must surface them (case-normalized)."""
    text = prefix + s + "的" + o
    tags = tags_for_pairs(text, [(s, o)])
    subs, objs = decode_tags(tags, text)
    if s.lower() != o.lower() and find_all(s, text) and find_all(o, text):
        joined = [e.lower() for e in subs + objs]
        # at least one side must be recovered whenever its span was marked
        if any(t != "O" for t in tags):
            assert joined, (text, s, o, tags)


@given(entities)
@settings(max_examples=200, deadline=None)
def test_normalizer_idempotent(e):
    once = normalize_entity(e)
    assert normalize_entity(once) == once
    assert once == once.lower()


@given(texts, entities)
@settings(max_examples=300, deadline=None)
def test_find_all_offsets_valid(text, sub):
    for i in find_all(sub, text):
        assert text[i:i + len(sub)].lower() == sub.lower()


# ---------------------------------------------------------------------------
# vectorized batch codec == scalar codec (kgray/ops/label.py hot path)
# ---------------------------------------------------------------------------

pair_lists = st.lists(st.tuples(entities, entities), min_size=0, max_size=3)


@given(st.lists(st.tuples(texts, pair_lists), min_size=1, max_size=4))
@settings(max_examples=300, deadline=None)
def test_decode_marks_matches_scalar_codec(rows):
    """The numpy char-mark write + event decode must reproduce the scalar
    tags_for_pairs -> decode_tags chain bit-for-bit, including overlap
    overwrites, sub==obj odd-occurrence splits and dangling-E skips."""
    import numpy as np

    from kgray.ops.tagging import (
        R_OBJ,
        R_SUB,
        decode_marks,
        mark_span_np,
    )

    texts_ = [t for t, _ in rows]
    lens = np.fromiter((len(t) for t in texts_), np.int64, len(rows))
    offsets = np.zeros(len(rows) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    kind = np.zeros(offsets[-1], np.int8)
    role = np.zeros(offsets[-1], np.int8)
    for r, (text, pairs) in enumerate(rows):
        base = int(offsets[r])
        for sub, obj in pairs:
            s_idx = find_all(sub, text)
            o_idx = find_all(obj, text)
            if sub == obj:
                o_idx = [x for i, x in enumerate(s_idx) if i % 2 == 1]
            for i in s_idx:
                mark_span_np(kind, role, base + i, len(sub), R_SUB, "bieso")
            for i in o_idx:
                mark_span_np(kind, role, base + i, len(obj), R_OBJ, "bieso")
    got = decode_marks(kind, role, offsets, texts_)

    for (text, pairs), (subs, objs) in zip(rows, got):
        tags = tags_for_pairs(text, pairs, "bieso")
        want_subs, want_objs = decode_tags(tags, text)
        assert subs == want_subs, (text, pairs, subs, want_subs)
        assert objs == want_objs, (text, pairs, objs, want_objs)
