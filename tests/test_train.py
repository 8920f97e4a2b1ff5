"""Distributed training loop (ops/train.py): convergence, held-out
quality, and the dataflow contract (per-epoch fold, no corpus collect)."""

import numpy as np
import pyarrow as pa
import ray


def _features(n_docs=300):
    from kgray import corpus
    from kgray.ops.featurize import add_multihot_target
    from kgray.ops.train import featurize_hashed

    tbl = corpus.sentences_table(corpus.doc_ids_for_range(0, n_docs))
    ds = ray.data.from_arrow(tbl).map_batches(
        add_multihot_target, batch_format="pyarrow"
    )
    return featurize_hashed(ds, B=4096)


def test_loss_decreases_monotonically_early(ray_session):
    from kgray.ops.train import fit_logreg_hashed

    m = fit_logreg_hashed(_features(), B=4096, L=50, epochs=12, lr=2.0)
    losses = m["loss"]
    assert losses[-1] < losses[0] / 5
    # full-batch GD with momentum on a separable task: strictly improving
    # over the first ten epochs
    assert all(b < a for a, b in zip(losses[:10], losses[1:11]))


def test_heldout_f1_above_bar(ray_session):
    """Runs the catalog entry end-to-end (2000 docs, 80/20 split,
    60 epochs) and checks held-out micro-F1 >= 0.95 from its counts."""
    from kgray.queries import q_train_predicate_clf

    t = q_train_predicate_clf("unused").to_pandas().iloc[0]
    f1 = 2 * t.tp / (2 * t.tp + t.fp + t.fn)
    assert f1 >= 0.95, f1
    assert t.n_train == 1600 and t.n_eval == 400


def test_gradient_matches_dense_numpy(ray_session):
    """One grad-fold step == the dense-matrix gradient computed locally."""
    from kgray.ops.train import _char_ngram_idx, fit_logreg_hashed

    feats = _features(60)
    B, L = 4096, 50
    m = fit_logreg_hashed(feats, B=B, L=L, epochs=1, lr=1.0,
                          momentum=0.0, l2=0.0)
    # dense replay: W0 = 0 -> p = 0.5 everywhere, grad = X^T (0.5 - y)/n
    df = feats.to_pandas()
    n = len(df)
    X = np.zeros((n, B))
    Y = np.zeros((n, L))
    for r, (idx, cnt, t) in enumerate(zip(df["idx"], df["cnt"],
                                          df["target"])):
        X[r, np.asarray(idx, np.int64)] = np.asarray(cnt, np.float64)
        Y[r] = np.asarray(t, np.float64)
    gW = X.T @ (np.full((n, L), 0.5) - Y) / n
    want = -1.0 * gW  # one momentum-free step from zero
    assert np.allclose(m["W"], want, atol=1e-9)
