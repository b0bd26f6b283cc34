"""SemDeDup: numpy reference parity + planted semantic duplicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lexor_ray.ops.similarity import (
    _kmeans_centroids,
    _normalize,
    semdedup,
)

SF = "/root/testdata/sf0.001"


def test_semdedup_matches_numpy_reference(ray_session):
    got = semdedup(SF, k=8, threshold=0.35).to_pandas().sort_values("vec_id").reset_index(drop=True)

    # independent reference for the PRUNE stage: same centroids (the
    # kmeans loop has its own tests), then a plain numpy replay of the
    # assignment + star rule over the whole table at once
    src = pd.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    src = src.sort_values("vec_id").reset_index(drop=True)
    emb = _normalize(np.asarray(src["embedding"].tolist(), dtype=np.float64))
    c = _kmeans_centroids(SF, 8, 4)
    cluster = np.argmax(emb @ c.T, axis=1)
    kept = np.ones(len(src), dtype=bool)
    for ci in np.unique(cluster):
        idx = np.flatnonzero(cluster == ci)  # vec_id-sorted already
        sim = emb[idx] @ emb[idx].T
        kept[idx] = ~np.triu(sim >= 0.35, 1).any(axis=0)

    want = pd.DataFrame(
        {"vec_id": src["vec_id"], "cluster": cluster.astype(np.int32), "kept": kept}
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False
    )
    # the corpus max pairwise cosine is 0.479, so 0.35 must drop some
    assert (~got["kept"]).sum() > 0
    assert got["kept"].sum() > 0


def test_semdedup_planted_duplicates(ray_session, tmp_path):
    """Exact duplicate vectors always share a cluster (identical
    assignment), so exactly the first copy of each group survives."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(40, 16)).astype(np.float32)
    # ids 0..39 unique; 40..59 duplicate ids 0..19 exactly
    vecs = np.vstack([base, base[:20]])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(60), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * 60, type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    got = semdedup(str(tmp_path), k=4, threshold=0.999).to_pandas().sort_values("vec_id").reset_index(drop=True)
    kept = got.set_index("vec_id")["kept"]
    assert kept.loc[range(40)].all(), "an original was dropped"
    assert not kept.loc[range(40, 60)].any(), "a planted duplicate survived"


def test_semdedup_catches_chunk_boundary_duplicates(ray_session, tmp_path):
    """r4 (verdict item 5): a duplicate pair STRADDLING a chunk
    boundary must be caught — the r3 within-chunk-only prune missed
    it. cluster_cap=8 forces many chunks; dup pairs are planted so
    the copies land several chunks after their originals."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(30, 16)).astype(np.float64)
    # ids 0..29 unique originals; ids 30..39 duplicate ids 0..9 —
    # with cap=8, id 30+ sits 3+ chunks after its original
    vecs = np.vstack([base, base[:10]])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(40), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float64()),
                ),
                "label": pa.array([0] * 40, type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    # k=1: ONE cluster of 40 vectors -> 5 chunks at cap=8; every
    # planted dup crosses a chunk boundary
    got = (
        semdedup(str(tmp_path), k=1, threshold=0.999, cluster_cap=8)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    kept = got.set_index("vec_id")["kept"]
    assert kept.loc[range(30)].all(), "an original was dropped"
    assert not kept.loc[range(30, 40)].any(), (
        "a boundary-straddling duplicate survived"
    )
    # and the chunked prune equals the unchunked one exactly
    whole = (
        semdedup(str(tmp_path), k=1, threshold=0.999, cluster_cap=8192)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, whole, check_dtype=False)


def test_semdedup_auto_chunk_tier_exact(ray_session, tmp_path):
    """r5 (r4 verdict item 8): a cluster whose naive chunk count would
    exceed _SEMDEDUP_MAX_CHUNKS takes the auto-sized tier
    (chunk = ceil(n / MAX_CHUNKS) > cluster_cap) and must stay EXACT —
    equal to the unchunked prune, boundary duplicates included."""
    from lexor_ray.ops.similarity import _SEMDEDUP_MAX_CHUNKS

    rng = np.random.default_rng(17)
    base = rng.normal(size=(90, 16)).astype(np.float64)
    # ids 0..89 unique; 90..119 duplicate ids 0..29
    vecs = np.vstack([base, base[:30]])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(120), type=pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    type=pa.list_(pa.float64()),
                ),
                "label": pa.array([0] * 120, type=pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    # cap=2 would naively mean 60 chunks > MAX_CHUNKS=32 → the tier
    # kicks in with chunk = ceil(120/32) = 4
    assert 120 // 2 > _SEMDEDUP_MAX_CHUNKS
    got = (
        semdedup(str(tmp_path), k=1, threshold=0.999, cluster_cap=2)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    kept = got.set_index("vec_id")["kept"]
    assert kept.loc[range(90)].all(), "an original was dropped"
    assert not kept.loc[range(90, 120)].any(), "a planted duplicate survived"
    whole = (
        semdedup(str(tmp_path), k=1, threshold=0.999, cluster_cap=8192)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, whole, check_dtype=False)
