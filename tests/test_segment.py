"""M6 dictionary segmenter and M18 random-SPO filler."""

import pyarrow as pa
import ray.data as rd

from kgray.ops.segment import DictSegmenter, resegment_stats


def test_fmm_longest_match_wins():
    seg = DictSegmenter(vocab={"北京": "ns", "北京大学": "nt", "大学": "n"})
    assert seg.cut("北京大学") == [("北京大学", "nt")]
    assert seg.cut("北京的大学") == [
        ("北京", "ns"), ("的", "x"), ("大学", "n"),
    ]
    assert seg.cut("") == []


def test_char_alignment_contract():
    """process_postag contract (pytorch/labeling/dataset.py:49-55): one
    word + one pos entry PER CHAR, each char repeating its word."""
    seg = DictSegmenter(vocab={"北京": "ns"})
    word, pos = seg.char_aligned("北京x")
    assert word == ["北京", "北京", "x"]
    assert pos == ["ns", "ns", "x"]
    for text in ["北京北京", "abc", "北x京"]:
        w, p = seg.char_aligned(text)
        assert len(w) == len(p) == len(text)


def test_batch_call_appends_columns():
    seg = DictSegmenter(vocab={"甲乙": "nr"})
    out = seg(pa.table({"doc_id": ["d"], "text": ["甲乙丙"]}))
    assert out["word"].to_pylist() == [["甲乙", "甲乙", "丙"]]
    assert out["pos"].to_pylist() == [["nr", "nr", "x"]]


def test_resegment_stats_on_corpus(ray_session):
    from kgray.corpus import doc_ids_for_range, sentences_table

    ds = rd.from_arrow(sentences_table(doc_ids_for_range(0, 40), seed=42))
    stats = resegment_stats(ds).to_pandas()
    assert len(stats) == 40
    assert (stats["n_words"] > 0).all()
    assert (stats["n_unk"] <= stats["n_words"]).all()
    # the corpus dictionary should resolve most entity spans: every doc
    # has at least one multi-char dictionary hit
    assert (stats["n_unk"] < stats["n_words"]).all()


def test_fill_random_spo_deterministic(ray_session):
    from kgray.ops.featurize import fill_random_spo

    rows = [
        {"doc_id": "d1", "spo_list": [],
         "postag": [{"word": "甲", "pos": "nr"}, {"word": "乙", "pos": "nr"}]},
        {"doc_id": "d2", "spo_list": [], "postag": []},  # no postag: dropped
        {"doc_id": "d3",
         "spo_list": [{"subject": "s", "predicate": "p", "object": "o"}],
         "postag": [{"word": "w", "pos": "n"}]},
    ]
    out = fill_random_spo(rd.from_items(rows), seed=7).to_pandas()
    assert set(out["doc_id"]) == {"d1", "d3"}
    d1 = out[out["doc_id"] == "d1"].iloc[0]
    assert d1["filled"] and d1["subject"] in {"甲", "乙"}
    assert d1["object"] in {"甲", "乙"}
    d3 = out[out["doc_id"] == "d3"].iloc[0]
    assert not d3["filled"] and d3["predicate"] == "p"
    # deterministic across runs
    again = fill_random_spo(rd.from_items(rows), seed=7).to_pandas()
    assert out.sort_values("doc_id", ignore_index=True).equals(
        again.sort_values("doc_id", ignore_index=True)
    )
