"""M6: dictionary re-segmentation — the jieba-free segmenter slot.

The reference re-segments each sentence with jieba at feature-build time
(/root/reference/pytorch/labeling/dataset.py:49-55: ``posseg.lcut`` ->
char-aligned word/pos arrays, each char carrying its word and the word's
POS).  jieba is not in this container, so the operator ships with a
deterministic forward-maximum-match segmenter over a dictionary built
once per actor from the corpus entity pools — the same stateful-segmenter
actor shape a jieba-backed instance would have (load dict in __init__,
pure per batch), and the exact char-alignment contract of
``process_postag``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# jieba-style POS by corpus pool type
_POOL_POS = {"人物": "nr", "地点": "ns", "图书作品": "nz", "影视作品": "nz",
             "学校": "nt", "企业": "nt"}
_UNK_POS = "x"  # jieba's tag for unmatched single chars


def default_vocab() -> dict[str, str]:
    """word -> POS over the synthetic corpus pools + schema predicates."""
    from kgray.corpus import _build_pools
    from kgray.schema import SCHEMAS

    vocab: dict[str, str] = {}
    for pool_type, names in _build_pools().items():
        pos = _POOL_POS.get(pool_type, "n")
        for name in names:
            vocab[name] = pos
    for s in SCHEMAS:
        vocab.setdefault(s.predicate, "v")
    return vocab


class DictSegmenter:
    """Stateful segmenter actor: dictionary built ONCE per actor;
    ``cut`` is greedy forward maximum matching (longest dict word wins,
    else a single char with POS 'x')."""

    def __init__(self, vocab: dict[str, str] | None = None,
                 text_col: str = "text"):
        self.vocab = vocab if vocab is not None else default_vocab()
        self.max_len = max((len(w) for w in self.vocab), default=1)
        self.text_col = text_col

    def cut(self, text: str) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        i, n = 0, len(text)
        while i < n:
            for L in range(min(self.max_len, n - i), 1, -1):
                w = text[i : i + L]
                if w in self.vocab:
                    out.append((w, self.vocab[w]))
                    i += L
                    break
            else:
                ch = text[i]
                out.append((ch, self.vocab.get(ch, _UNK_POS)))
                i += 1
        return out

    def char_aligned(self, text: str) -> tuple[list[str], list[str]]:
        """process_postag contract: per-CHAR word and POS arrays (each
        char repeats its containing word and that word's POS)."""
        word, pos = [], []
        for w, p in self.cut(text):
            word += [w] * len(w)
            pos += [p] * len(w)
        return word, pos

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        words_col, pos_col = [], []
        for t in texts:
            w, p = self.char_aligned(t)
            words_col.append(w)
            pos_col.append(p)
        return (
            batch.append_column(
                "word", pa.array(words_col, pa.list_(pa.string()))
            ).append_column("pos", pa.array(pos_col, pa.list_(pa.string())))
        )


def resegment_stats(sentences, vocab: dict[str, str] | None = None):
    """Per-doc segmentation stats (n_words, n_unk): the compact query
    surface over the M6 operator."""
    seg = DictSegmenter(vocab)

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_words = np.zeros(len(texts), np.int64)
        n_unk = np.zeros(len(texts), np.int64)
        for i, t in enumerate(texts):
            cut = seg.cut(t)
            n_words[i] = len(cut)
            n_unk[i] = sum(1 for _, p in cut if p == _UNK_POS)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words),
                "n_unk": pa.array(n_unk),
            }
        )

    return sentences.map_batches(stats, batch_format="pyarrow")
