"""Curation batch 4 (bigram set difference, composite quality gate) —
pinned against brute python references on synthetic docs engineered so
every rule and both diff directions are non-trivial."""

import numpy as np
import pandas as pd


def _docs(tmp_path, seed=13):
    rng = np.random.default_rng(seed)
    vocab_en = ["red", "blue", "green", "gold"]
    vocab_zh = ["red", "blue", "iron", "jade"]
    rows = []
    for i in range(60):
        lang = "en" if i % 2 == 0 else "zh"
        v = vocab_en if lang == "en" else vocab_zh
        k = int(rng.integers(2, 80))
        toks = list(rng.choice(v, k))
        if i == 0:
            toks = ["gold"] * 30  # repetitive + short
        if i == 2:
            toks = ["a"] * 60  # word_len fail (mean 1.0), not short
        text = " ".join(toks)
        rows.append((i, text, lang, "syn", len(text)))
    df = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    df.to_parquet(tmp_path / "documents.parquet", index=False)
    return df


def _bigrams(text):
    t = text.split(" ")
    return [f"{a} {b}" for a, b in zip(t, t[1:])]


def test_bigram_diff_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_bigram_diff

    df = _docs(tmp_path)
    got = (
        q_bigram_diff(str(tmp_path)).to_pandas()
        .sort_values("bg").reset_index(drop=True)
    )
    en, zh = {}, set()
    for _, r in df.iterrows():
        for g in _bigrams(r["text"]):
            if r["lang"] == "en":
                en[g] = en.get(g, 0) + 1
            elif r["lang"] == "zh":
                zh.add(g)
    exp = {g: c for g, c in en.items() if g not in zh}
    assert len(exp) > 0
    assert got["bg"].tolist() == sorted(exp)
    assert got["n"].tolist() == [exp[g] for g in sorted(exp)]


def test_quality_rules_matches_brute(ray_session, tmp_path):
    from kgray.queries import q_quality_rules

    df = _docs(tmp_path)
    got = dict(
        zip(*(c.tolist() for c in (
            q_quality_rules(str(tmp_path)).to_pandas()
            [["rule", "n_fail"]].T.to_numpy()
        )))
    )
    exp = {"too_short": 0, "word_len": 0, "repetitive": 0}
    for text in df["text"]:
        toks = text.split(" ")
        n = len(toks)
        if n < 50:
            exp["too_short"] += 1
        mean_wl = (len(text) - (n - 1)) / n
        if mean_wl < 3.0 or mean_wl > 10.0:
            exp["word_len"] += 1
        tf = pd.Series(toks).value_counts()
        if tf.max() / n > 0.2:
            exp["repetitive"] += 1
    assert got == exp
    assert all(v > 0 for v in exp.values())  # every rule is exercised
