"""Parity tests for the BIESO codec against the reference semantics.

Golden vectors are the reference's own worked examples
(/root/reference/labeling/tagging.py:65-85), captured by running the
reference function; a randomized cross-check imports the reference
implementation directly as an oracle.
"""

import sys

import pytest

from kgray.ops.tagging import (
    assemble_spo,
    bieso_tags,
    decode_tags,
    find_all,
    normalize_entity,
    tags_for_pairs,
)

D1_TEXT = (
    "《端脑》改编自有妖气同名漫画《端脑》，是由搜狐视频、有妖气、留白影视出品，"
    "于中中执导，朱元冰、蒋依依、杨奇煜、黄一琳、谢佳见、赵奕欢等人主演的科幻悬疑网络剧"
)
D1_SPO = [
    {"predicate": "主演", "object_type": "人物", "subject_type": "影视作品", "object": o, "subject": "端脑"}
    for o in ["蒋依依", "朱元冰", "赵奕欢", "黄一琳", "杨奇煜", "谢佳见"]
] + [
    {"predicate": "导演", "object_type": "人物", "subject_type": "影视作品", "object": "于中中", "subject": "端脑"},
    {"predicate": "改编自", "object_type": "作品", "subject_type": "影视作品", "object": "端脑", "subject": "端脑"},
]

D2_TEXT = "《碑》是2009年由上海人民出版社出版的图书，作者是维克多·谢阁兰"
D2_SPO = [
    {"predicate": "作者", "object_type": "人物", "subject_type": "图书作品", "object": "维克多·谢阁兰", "subject": "碑"},
    {"predicate": "出版社", "object_type": "出版社", "subject_type": "书籍", "object": "上海人民出版社", "subject": "碑"},
]


def test_find_all_overlap_and_case():
    assert find_all("ab", "xabyAB") == [1, 4]
    assert find_all("aa", "aaaa") == [0, 2]  # finditer: non-overlapping
    assert find_all("", "xyz") == []


def test_find_all_fast_path_matches_regex():
    """The caseless str.find fast path must agree with the re.I finditer
    reference on every (needle, haystack) — property-fuzzed over the
    corpus alphabet plus cased/caseless edge chars."""
    import random
    import re

    alphabet = "张王李《》、，。abAB13ßKς好的是"
    rng = random.Random(7)
    for _ in range(2000):
        sent = "".join(rng.choices(alphabet, k=rng.randrange(0, 30)))
        sub = "".join(rng.choices(alphabet, k=rng.randrange(1, 4)))
        expect = [
            m.start() for m in re.finditer(re.escape(sub), sent, re.I)
        ]
        assert find_all(sub, sent) == expect, (sub, sent)


def test_sub_eq_obj_odd_occurrence_rule():
    """subject==object: odd occurrences become OBJ (tagging.py:25-26).
    端脑 occurs at 1 and 15; occurrence idx 1 (offset 15) -> OBJ."""
    marks = bieso_tags("影视作品改编自作品", D1_TEXT, D1_SPO)
    assert marks[1:3] == ["B-SUB", "E-SUB"]
    assert marks[15:17] == ["B-OBJ", "E-OBJ"]
    assert all(m == "O" for i, m in enumerate(marks) if i not in (1, 2, 15, 16))


def test_multi_object_tagging():
    marks = bieso_tags("影视作品主演人物", D1_TEXT, D1_SPO)
    # both 端脑 occurrences marked SUB; six 3-char objects marked B-I-E
    assert marks[1:3] == ["B-SUB", "E-SUB"]
    assert marks[15:17] == ["B-SUB", "E-SUB"]
    assert marks[43:46] == ["B-OBJ", "I-OBJ", "E-OBJ"]  # 朱元冰
    assert marks.count("B-OBJ") == 6


def test_single_char_subject_uses_s_tag():
    marks = bieso_tags("图书作品作者人物", D2_TEXT, D2_SPO)
    assert marks[1] == "S-SUB"
    assert marks[26:33] == ["B-OBJ"] + ["I-OBJ"] * 5 + ["E-OBJ"]


def test_bieo_variant_uses_b_for_singletons():
    marks = bieso_tags("图书作品作者人物", D2_TEXT, D2_SPO, encoding_type="bieo")
    assert marks[1] == "B-SUB"


def test_two_char_span_has_no_i():
    marks = bieso_tags("书籍出版社出版社", D2_TEXT, D2_SPO)
    assert marks[1] == "S-SUB"
    assert marks[10:17] == ["B-OBJ"] + ["I-OBJ"] * 5 + ["E-OBJ"]


def test_missing_keys_yields_all_o():
    marks = bieso_tags("x", "abc", [{"predicate": "p"}])
    assert marks == ["O", "O", "O"]


def test_decode_round_trip():
    marks = bieso_tags("影视作品主演人物", D1_TEXT, D1_SPO)
    subs, objs = decode_tags(marks, D1_TEXT)
    assert subs == ["端脑", "端脑"]
    assert set(objs) == {"朱元冰", "蒋依依", "杨奇煜", "黄一琳", "谢佳见", "赵奕欢"}


def test_decode_singletons():
    marks = bieso_tags("图书作品作者人物", D2_TEXT, D2_SPO)
    subs, objs = decode_tags(marks, D2_TEXT)
    assert subs == ["碑"]
    assert objs == ["维克多·谢阁兰"]


def test_assemble_cartesian_dedup():
    spos = assemble_spo(["a", "a"], ["x", "y"], 3, "S", "p", "O")
    assert [(s["subject"], s["object"]) for s in spos] == [("a", "x"), ("a", "y")]
    assert spos[0]["schema_id"] == 3 and spos[0]["predicate"] == "p"


def test_normalize_entity():
    assert normalize_entity("《端脑》") == "端脑"
    assert normalize_entity("ABC") == "abc"
    assert normalize_entity("《碑") == "《碑"


@pytest.mark.parametrize("concat", ["影视作品主演人物", "影视作品改编自作品", "影视作品导演人物"])
def test_reference_oracle_d1(concat):
    """Direct comparison against the reference implementation."""
    sys.path.insert(0, "/root/reference/labeling")
    try:
        from tagging import tagging as ref_tagging
    finally:
        sys.path.pop(0)
    assert bieso_tags(concat, D1_TEXT, D1_SPO) == ref_tagging(concat, D1_TEXT, D1_SPO)


def test_reference_oracle_generated_corpus():
    """Cross-check on 100 generated sentences x their schemas."""
    sys.path.insert(0, "/root/reference/labeling")
    try:
        from tagging import tagging as ref_tagging
    finally:
        sys.path.pop(0)
    from kgray.corpus import doc_ids_for_range, make_sentence

    checked = 0
    for d in doc_ids_for_range(0, 100):
        row = make_sentence(42, d)
        concats = {
            s["subject_type"] + s["predicate"] + s["object_type"]
            for s in row["spo_list"]
        }
        for concat in concats:
            ours = bieso_tags(concat, row["text"], row["spo_list"])
            refs = ref_tagging(concat, row["text"], row["spo_list"])
            assert ours == refs, (d, concat)
            checked += 1
    assert checked > 100


def test_tags_for_pairs_matches_bieso_tags():
    pairs = [("端脑", o) for o in ["蒋依依", "朱元冰", "赵奕欢", "黄一琳", "杨奇煜", "谢佳见"]]
    assert tags_for_pairs(D1_TEXT, pairs) == bieso_tags("影视作品主演人物", D1_TEXT, D1_SPO)
    assert tags_for_pairs(D1_TEXT, [("端脑", "端脑")]) == bieso_tags(
        "影视作品改编自作品", D1_TEXT, D1_SPO
    )


def test_word_tags_reference_parity():
    """M8: word-level→char tag refinement must match the imported
    reference implementation on every corpus sentence x predicate."""
    import sys

    sys.path.insert(0, "/root/reference/pytorch/analysis")
    import importlib

    ref = importlib.import_module("statistic")
    sys.path.pop(0)

    from kgray.corpus import doc_ids_for_range, sentences_table
    from kgray.ops.tagging import word_tags

    t = sentences_table(doc_ids_for_range(0, 80), seed=42)
    n_checked = 0
    for row in t.to_pylist():
        postag = row["postag"] or []
        spo_list = row["spo_list"] or []
        if not postag:
            continue
        for p in {s["predicate"] for s in spo_list}:
            want = ref.tagging(p, row["text"], postag, spo_list)
            got = word_tags(p, row["text"], postag, spo_list)
            assert got == want, (row["doc_id"], p)
            n_checked += 1
    assert n_checked > 50


def test_word_tags_boundary_expansion():
    from kgray.ops.tagging import word_tags

    # words: 甲乙 | 的 | 丙丁  — subject spans words 0, object word 2
    postag = [{"word": "甲乙", "pos": "n"}, {"word": "的", "pos": "u"},
              {"word": "丙丁", "pos": "n"}]
    spo = [{"subject": "甲乙", "predicate": "p", "object": "丙丁",
            "subject_type": "x", "object_type": "y"}]
    tags = word_tags("p", "甲乙的丙丁", postag, spo)
    # singleton-word B expands to B..E chars; lookahead sees no continuation
    assert tags == ["B-SUB", "E-SUB", "O", "B-OBJ", "E-OBJ"]
