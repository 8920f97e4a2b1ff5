"""Bigram language-model quality scoring (ops/text.py).

Brute-force oracle: a pure-python add-one-smoothed bigram LM computed
with dicts and math.log, compared against the distributed fit + score
(exact equality — both sides build log-probs with libm log).
"""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from kgray.ops.text import bigram_lm_scores, fit_bigram_lm


def _brute_model(texts):
    bg, ctx, vocab = {}, {}, set()
    for t in texts:
        toks = t.split(" ")
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            ctx[a] = ctx.get(a, 0) + 1
    v = float(len(vocab))
    lp = {k: math.log((c + 1.0) / (ctx[k[0]] + v)) for k, c in bg.items()}
    return lp, ctx, v


def _brute_scores(texts, ids, lp, ctx, v):
    out = {}
    for i, t in zip(ids, texts):
        toks = t.split(" ")
        if len(toks) < 2:
            continue
        vals = []
        for a, b in zip(toks, toks[1:]):
            if (a, b) in lp:
                vals.append(lp[(a, b)])
            elif a in ctx:
                vals.append(math.log(1.0 / (ctx[a] + v)))
            else:
                vals.append(math.log(1.0 / v))
        out[i] = np.round(np.mean(vals), 4)
    return out


def _corpus(n=60, seed=3):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    texts = [
        " ".join(rng.choice(words, size=rng.integers(2, 12)))
        for _ in range(n)
    ]
    return pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                         "text": texts})


def test_fit_matches_brute_model(ray_session):
    df = _corpus()
    model = fit_bigram_lm(rd.from_pandas(df, override_num_blocks=7))
    lp, ctx, v = _brute_model(df["text"])
    assert len(model["lp"]) == len(lp)
    for (a, b), val in lp.items():
        assert model["lp"][f"{a} {b}"] == val  # exact: same libm log
    for a, c in ctx.items():
        assert model["miss"][a] == math.log(1.0 / (c + v))
    assert model["lp_unk"] == math.log(1.0 / v)


def test_scores_match_brute_self_scored(ray_session):
    df = _corpus(n=80, seed=11)
    ds = rd.from_pandas(df, override_num_blocks=5)
    got = bigram_lm_scores(ds).to_pandas().set_index("doc_id")["lm_score"]
    lp, ctx, v = _brute_model(df["text"])
    want = _brute_scores(df["text"], df["doc_id"], lp, ctx, v)
    assert len(got) == len(want)
    for i, s in want.items():
        assert abs(got[i] - s) < 1e-9, i


def test_heldout_miss_and_unknown_context_paths(ray_session):
    train = pd.DataFrame({
        "doc_id": np.arange(2, dtype=np.int64),
        "text": ["a b a c", "b c b a"],
    })
    # "a q": seen context 'a', unseen pair; "z q": unseen context
    score_df = pd.DataFrame({
        "doc_id": np.array([10, 11], np.int64),
        "text": ["a b", "z q"],
    })
    model = fit_bigram_lm(rd.from_pandas(train))
    got = bigram_lm_scores(
        rd.from_pandas(score_df), model=model
    ).to_pandas().set_index("doc_id")["lm_score"]
    lp, ctx, v = _brute_model(train["text"])
    assert got[10] == np.round(lp[("a", "b")], 4)
    assert got[11] == np.round(math.log(1.0 / v), 4)
    # seen-context / unseen-pair fallback
    got2 = bigram_lm_scores(
        rd.from_pandas(pd.DataFrame({"doc_id": np.array([12], np.int64),
                                     "text": ["a a"]})),
        model=model,
    ).to_pandas()
    assert got2["lm_score"][0] == np.round(math.log(1.0 / (ctx["a"] + v)), 4)


def test_min_count_prunes_to_miss_mass(ray_session):
    train = pd.DataFrame({
        "doc_id": np.arange(1, dtype=np.int64),
        "text": ["a b a b a c"],
    })
    model = fit_bigram_lm(rd.from_pandas(train), min_count=2)
    assert "a b" in model["lp"].index
    assert "a c" not in model["lp"].index  # pruned (count 1)
    # context totals re-derived over KEPT bigrams only
    v = 3.0
    assert model["lp"]["a b"] == math.log((2 + 1.0) / (2 + v))


def test_short_docs_emit_no_row(ray_session):
    df = pd.DataFrame({"doc_id": np.array([0, 1], np.int64),
                       "text": ["solo", "a b"]})
    out = bigram_lm_scores(rd.from_pandas(df)).to_pandas()
    assert out["doc_id"].tolist() == [1]
