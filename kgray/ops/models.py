"""Learned-model slots for the two pipeline stages (A1-A7 of SURVEY.md §2.3).

Two EXECUTABLE numpy implementations carry the real forward paths
without torch:

* ``NumpyCnnScorer``       — stage-1 conv/pool/fc/sigmoid forward; its
  cue-distilled default weights reproduce CueClassifier exactly
  (test-proven), and ``.npz`` checkpoints round-trip;
* ``NumpyBiLstmCrfLabeler`` — stage-2 BiLSTM scan + FC + constrained
  Viterbi + shared codec; seeded init or ``.npz`` checkpoint.

The torch classes below raise NotImplementedError from __init__ until
torch is importable — their CONTRACT (constructor signature, __call__
batch shape, output columns) is identical, so at deploy time the only
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


class NumpyCnnScorer:
    """A1 made real without torch: a numpy forward pass with the
    reference CNN's architecture shape (char embedding -> parallel
    1-D convs -> relu -> max-over-time pool -> fully-connected ->
    sigmoid; /root/reference/classification/model.py:7-31).

    Weights come from an ``.npz`` checkpoint when given, else from
    ``cue_distilled_weights()`` — hand-constructed tensors that make the
    SAME forward computation reproduce CueClassifier's cue detection
    exactly (one-hot char embedding; one filter per schema whose kernel
    equals its cue length with bias -(len-1), so relu(conv) max-pools to
    1 iff the cue n-gram occurs; the fc layer is a scaled identity and
    sigmoid saturates to {~0,~1}).  Dims differ from the trained
    reference (embed 124 one-hot vs 128 learned; kernel sizes 2-7, one
    filter each vs (3,4,5)x128) — the EXECUTION path (conv-as-matmul over
    strided windows, pooling, fc, sigmoid) is the real one a trained
    checkpoint would use.

    Stateful-stage contract: tensors built once per actor in __init__;
    __call__ appends the same ``scores`` column CueClassifier does, so
    threshold_and_fallback/fanout compose unchanged.
    """

    def __init__(self, checkpoint_path: str | None = None,
                 text_col: str = "text"):
        import numpy as np

        self.text_col = text_col
        if checkpoint_path is not None:
            ckpt = np.load(checkpoint_path, allow_pickle=True)
            # chars[i] has char id i+1 (0 is the pad/unk slot)
            self.char2id = {c: i + 1 for i, c in enumerate(ckpt["chars"].tolist())}
            self.embed = ckpt["embed"]
            self.kernels = {}
            for key in ckpt.files:
                if key.startswith("conv_w_"):
                    k = int(key.split("_")[-1])
                    self.kernels[k] = (ckpt[f"conv_w_{k}"], ckpt[f"conv_b_{k}"],
                                      ckpt[f"conv_map_{k}"])
            self.fc_w = ckpt["fc_w"]
            self.fc_b = ckpt["fc_b"]
        else:
            (self.char2id, self.embed, self.kernels, self.fc_w,
             self.fc_b) = cue_distilled_weights()

    def save(self, path: str) -> None:
        import numpy as np

        arrays = {
            # index i holds the char with id i+1 (0 is pad/unk)
            "chars": np.asarray(
                [c for c, _ in sorted(self.char2id.items(), key=lambda x: x[1])],
                object,
            ),
            "embed": self.embed, "fc_w": self.fc_w, "fc_b": self.fc_b,
        }
        for k, (w, b, m) in self.kernels.items():
            arrays[f"conv_w_{k}"] = w
            arrays[f"conv_b_{k}"] = b
            arrays[f"conv_map_{k}"] = m
        np.savez(path, **arrays)

    def forward(self, texts: list[str]):
        """embed -> convs (matmul over strided windows) -> relu ->
        max-over-time pool -> fc -> sigmoid.  Returns (n, 50) float32."""
        import numpy as np

        n = len(texts)
        L = max(max((len(t) for t in texts), default=1), max(self.kernels))
        ids = np.zeros((n, L), np.int64)  # 0 = pad/unk
        for i, t in enumerate(texts):
            ids[i, : len(t)] = [self.char2id.get(c, 0) for c in t]
        X = self.embed[ids]  # (n, L, D) embedding lookup
        D = X.shape[2]
        n_filters = self.fc_w.shape[1]
        feats = np.zeros((n, n_filters), np.float64)
        for k in sorted(self.kernels):
            w, b, fmap = self.kernels[k]  # w: (F, k*D), b: (F,), fmap: (F,)
            win = np.lib.stride_tricks.sliding_window_view(X, (k, D), axis=(1, 2))
            win = win.reshape(n, L - k + 1, k * D)
            conv = win @ w.T + b[None, None, :]  # (n, L-k+1, F)
            act = np.maximum(conv, 0.0)  # relu
            feats[:, fmap] = act.max(axis=1)  # max-over-time pool
        logits = feats @ self.fc_w.T + self.fc_b
        return (1.0 / (1.0 + np.exp(-logits))).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from kgray.ops.classify import SCORES_COL

        texts = batch[self.text_col].to_pylist()
        mat = self.forward(texts)
        scores = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), pa.float32()), mat.shape[1]
        )
        return batch.append_column(SCORES_COL, scores)


def cue_distilled_weights():
    """Hand-constructed CNN tensors reproducing cue detection: one-hot
    char embedding; per schema one conv filter of kernel = len(cue) whose
    weights are the cue chars' one-hot rows and bias -(len-1) (window
    response = #matching chars - (len-1): exactly 1 on a full match, <= 0
    otherwise, so relu+maxpool yields the cue indicator); fc = 100*I - 50
    saturates the sigmoid to ~{0, 1}."""
    import numpy as np

    from kgray.schema import NUM_SCHEMAS
    from kgray.templates import CUES

    chars = sorted({c for i in range(NUM_SCHEMAS) for c in CUES[i]})
    char2id = {c: i + 1 for i, c in enumerate(chars)}  # 0 = pad/unk
    D = len(chars) + 1
    embed = np.zeros((D, D), np.float64)
    embed[1:, 1:] = np.eye(D - 1)  # pad/unk embeds to the zero vector

    by_len: dict[int, list[int]] = {}
    for sid in range(NUM_SCHEMAS):
        by_len.setdefault(len(CUES[sid]), []).append(sid)
    kernels = {}
    for k, sids in by_len.items():
        w = np.zeros((len(sids), k * D), np.float64)
        for f, sid in enumerate(sids):
            for j, c in enumerate(CUES[sid]):
                w[f, j * D + char2id[c]] = 1.0
        b = np.full(len(sids), -(k - 1), np.float64)
        kernels[k] = (w, b, np.asarray(sids, np.int64))
    fc_w = 100.0 * np.eye(NUM_SCHEMAS)
    fc_b = np.full(NUM_SCHEMAS, -50.0)
    return char2id, embed, kernels, fc_w, fc_b


class NumpyBiLstmCrfLabeler:
    """A4-A6 executable without torch: a numpy BiLSTM forward with the
    reference labeler's architecture shape (char embedding + schema
    one-hot -> 1-layer bidirectional LSTM -> FC over 9 BIESO tags ->
    constrained Viterbi decode -> shared span codec;
    /root/reference/labeling/model.py:14-162 + crf.py).

    Weights load from an ``.npz`` checkpoint or initialize from a seeded
    RNG (untrained: output tags are arbitrary but always BIESO-LEGAL
    because the decode is the constrained Viterbi — the execution path a
    trained checkpoint would use, exercised end-to-end).  Emits the
    TRIPLES schema exactly like TemplateLabeler, so it drops into
    ``PipelineConfig(labeler_cls=...)`` unchanged.
    """

    def __init__(self, checkpoint_path: str | None = None,
                 embed_dim: int = 32, hidden: int = 32, seed: int = 0,
                 encoding_type: str = "bieso"):
        import numpy as np

        from kgray.ops.crf import BIESO_TAGS, ViterbiTagDecoder
        from kgray.schema import NUM_SCHEMAS

        self.n_tags = len(BIESO_TAGS)
        self.decoder = ViterbiTagDecoder(BIESO_TAGS, encoding_type)
        if checkpoint_path is not None:
            ckpt = np.load(checkpoint_path, allow_pickle=True)
            self.w = {k: ckpt[k] for k in ckpt.files if k != "chars"}
            self.char2id = {c: i + 1 for i, c in enumerate(ckpt["chars"].tolist())}
        else:
            rs = np.random.RandomState(seed)
            V = 4099  # hashed char vocab (unseen chars bucket by hash)
            D, H = embed_dim, hidden
            In = D + NUM_SCHEMAS
            def g(*shape):
                return rs.normal(scale=0.1, size=shape)
            self.w = {
                "embed": g(V, D),
                # fused gate weights (i,f,g,o) per direction
                "fw_Wx": g(In, 4 * H), "fw_Wh": g(H, 4 * H), "fw_b": g(4 * H),
                "bw_Wx": g(In, 4 * H), "bw_Wh": g(H, 4 * H), "bw_b": g(4 * H),
                "fc_w": g(2 * H, self.n_tags), "fc_b": g(self.n_tags),
            }
            self.char2id = None  # hashed ids

    def _char_ids(self, text: str) -> "np.ndarray":
        import numpy as np

        if self.char2id is not None:
            return np.asarray(
                [self.char2id.get(c, 0) for c in text], np.int64
            )
        V = self.w["embed"].shape[0]
        return np.asarray([(ord(c) % (V - 1)) + 1 for c in text], np.int64)

    @staticmethod
    def _lstm(X, Wx, Wh, b, reverse=False):
        """Batched single-layer LSTM scan: X (B, L, In) -> (B, L, H)."""
        import numpy as np

        B, L, _ = X.shape
        H = Wh.shape[0]
        h = np.zeros((B, H))
        c = np.zeros((B, H))
        out = np.zeros((B, L, H))
        steps = range(L - 1, -1, -1) if reverse else range(L)
        for t in steps:
            z = X[:, t] @ Wx + h @ Wh + b  # (B, 4H)
            i = 1 / (1 + np.exp(-z[:, :H]))
            f = 1 / (1 + np.exp(-z[:, H:2 * H]))
            gg = np.tanh(z[:, 2 * H:3 * H])
            o = 1 / (1 + np.exp(-z[:, 3 * H:]))
            c = f * c + i * gg
            h = o * np.tanh(c)
            out[:, t] = h
        return out

    def scores(self, texts: list[str], sids: list[int]):
        """(B, Lmax, n_tags) emission scores + (B, Lmax) mask."""
        import numpy as np

        from kgray.schema import NUM_SCHEMAS

        B = len(texts)
        L = max((len(t) for t in texts), default=0)
        L = max(L, 1)
        D = self.w["embed"].shape[1]
        X = np.zeros((B, L, D + NUM_SCHEMAS))
        mask = np.zeros((B, L), bool)
        for bi, (text, sid) in enumerate(zip(texts, sids)):
            if text:
                ids = self._char_ids(text)
                X[bi, : len(ids), :D] = self.w["embed"][ids]
                X[bi, : len(ids), D + int(sid)] = 1.0  # schema one-hot
                mask[bi, : len(ids)] = True
        fw = self._lstm(X, self.w["fw_Wx"], self.w["fw_Wh"], self.w["fw_b"])
        bw = self._lstm(X, self.w["bw_Wx"], self.w["bw_Wh"], self.w["bw_b"],
                        reverse=True)
        feats = np.concatenate([fw, bw], axis=2)
        return feats @ self.w["fc_w"] + self.w["fc_b"], mask

    def __call__(self, batch: pa.Table) -> pa.Table:
        from kgray.ops.tagging import assemble_spo, decode_tags
        from kgray.schema import SCHEMAS, TRIPLES

        doc_ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        sids = batch["schema_id"].to_pylist()

        nonempty = [i for i, t in enumerate(texts) if t]
        decoded: dict[int, list[str]] = {}
        if nonempty:
            logits, mask = self.scores(
                [texts[i] for i in nonempty], [sids[i] for i in nonempty]
            )
            for i, tags in zip(nonempty, self.decoder.decode(logits, mask)):
                decoded[i] = tags

        out: dict[str, list] = {name: [] for name in TRIPLES.names}
        for i, (doc_id, text, sid) in enumerate(zip(doc_ids, texts, sids)):
            subs, objs = decode_tags(decoded.get(i, []), text)
            schema = SCHEMAS[sid]
            for spo in assemble_spo(
                subs, objs, sid, schema.subject_type, schema.predicate,
                schema.object_type,
            ):
                out["doc_id"].append(doc_id)
                for k in ("subject", "subject_type", "predicate", "object",
                          "object_type", "schema_id"):
                    out[k].append(spo[k])
        return pa.table(out, schema=TRIPLES)


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
