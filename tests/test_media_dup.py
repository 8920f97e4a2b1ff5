"""media_dup_refs: actor-pool feature decode composed with the
embedding-cosine dedup machinery, ref identity via int64 fingerprints.

NB the planted decoder class is defined INSIDE the test function:
module-level classes in tests/ serialize by reference and Ray workers
cannot import the tests package — the actor pool then respawns forever
(a silent hang, not an error)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _planted_decoder():
    class PlantedDecoder:
        """Maps ref prefix to fixed unit vectors: 'a*' and 'b*' nearly
        parallel (cos ~0.9992), 'z*' orthogonal."""

        def __call__(self, batch: pa.Table) -> pa.Table:
            dim = 8
            base = np.zeros(dim); base[0] = 1.0
            near = np.zeros(dim); near[0] = 1.0; near[1] = 0.04
            near /= np.linalg.norm(near)
            far = np.zeros(dim); far[2] = 1.0
            feats = []
            for r in batch["media_ref"].to_pylist():
                feats.append(
                    {"a": base, "b": near, "z": far}[r.split(":")[0]]
                )
            m = np.vstack(feats).astype(np.float32)
            col = pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), dim
            )
            return batch.append_column("features", col)

    return PlantedDecoder


def test_media_dup_refs_planted(ray_session):
    import ray.data as rd

    from kgray.ops.media import media_dup_refs

    media = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(["d1", "d2", "d3"]),
                "media_ref": pa.array(["a:1", "b:2", "z:3"]),
                "kind": pa.array(["image", "image", "audio"]),
            }
        )
    )
    res = media_dup_refs(media, tau=0.99,
                         decoder_cls=_planted_decoder())
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) == 1
    assert set(df[["ref_u", "ref_v"]].iloc[0]) == {"a:1", "b:2"}
    assert df["cos"].iloc[0] == pytest.approx(0.9992, abs=1e-3)


def test_media_dup_snapshot_deterministic(ray_session):
    import __ray_entry__ as m

    a = m.queries()["media_dup"]("unused")
    b = m.queries()["media_dup"]("unused")
    da = (a.to_pandas() if hasattr(a, "to_pandas") else a).sort_values(
        ["ref_u", "ref_v"]).reset_index(drop=True)
    db = (b.to_pandas() if hasattr(b, "to_pandas") else b).sort_values(
        ["ref_u", "ref_v"]).reset_index(drop=True)
    assert len(da) == len(db) > 0
    pd.testing.assert_frame_equal(da, db)
