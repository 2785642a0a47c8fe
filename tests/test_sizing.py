"""Scale-aware index sizing (simsearch.size_*): the LSH/IVF plan
shapes are scale-right by construction; these tests pin that the
CONSTANTS now scale too — bucket/cell counts grow with the corpus so
within-bucket exact scoring stays bounded, instead of the sandbox
defaults silently becoming O((N/16)²) at corpus size."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from datax_spark import simsearch

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


def test_size_lsh_planes_tracks_log_n():
    s = simsearch.size_lsh_planes
    assert s(500, target_bucket_rows=1024) == 4          # floor at min_planes
    assert s(1 << 20, target_bucket_rows=1024) == 10     # 1M/1k -> 2^10 buckets
    assert s(10**10, target_bucket_rows=1024) == 24      # clamped at max
    # monotone non-decreasing in N
    sizes = [s(n) for n in (10**3, 10**5, 10**7, 10**9)]
    assert sizes == sorted(sizes)


def test_size_ivf_centroids_is_sqrt_n():
    s = simsearch.size_ivf_centroids
    assert s(100) == 16                                   # floor
    assert s(10**6) == 1000
    assert s(10**8) == 10**4
    assert s(10**12) == 1 << 18                           # broadcast bound


def test_size_lsh_bands_holds_recall():
    """bands chosen so OR-across-bands recall ≥ target at the stated
    per-plane agreement probability."""
    for ppb in (4, 8, 12):
        bands = simsearch.size_lsh_bands(ppb, p_collide=0.86, target_recall=0.9)
        p_band = 0.86 ** ppb
        assert 1 - (1 - p_band) ** bands >= 0.9 - 1e-9
    # more planes per band -> needs at least as many bands
    b = [simsearch.size_lsh_bands(p, p_collide=0.86) for p in (4, 8, 12)]
    assert b == sorted(b)


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_MED])
def test_lsh_bucket_occupancy_bounded_with_autosizing(spark, sf_dir):
    """With auto-sizing on, the max (band, bucket) occupancy stays
    within a constant factor of the target at BOTH sf scales — the
    property that keeps within-bucket candidate sets bounded as the
    corpus grows. (Real embeddings cluster, so allow a skew factor
    over the uniform ideal.)"""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    target = 64  # small target so sizing actually engages at sandbox sf
    ppb = simsearch.size_lsh_planes(n, target_bucket_rows=target)
    occ = (
        emb.select(
            simsearch.lsh_band_bucket("embedding", 0, ppb).alias("bucket")
        )
        .groupBy("bucket")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert occ <= 16 * target, f"max occupancy {occ} vs target {target} (N={n})"


def test_ivf_autosizing_cells_bounded(spark):
    """n_centroids=None derives K ≈ √N; assignment must spread vectors
    so the largest cell is far below N (no degenerate single cell)."""
    emb = spark.read.parquet(f"{SF_MED}/embeddings.parquet")
    n = emb.count()
    k = simsearch.size_ivf_centroids(n)
    assign = simsearch.ivf_assign(emb, emb.filter(F.col("vec_id") < k))
    cells = assign.groupBy("cell").count()
    max_cell = cells.agg(F.max("count")).collect()[0][0]
    n_cells = cells.count()
    assert n_cells > max(2, k // 4)  # most seed cells actually used
    assert max_cell <= n / 2, f"degenerate cell: {max_cell} of {n}"
    # auto-sized end-to-end call returns the same shape as the pinned one
    out = simsearch.ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, n_centroids=None
    )
    rows = out.collect()
    assert {r["query_id"] for r in rows} == set(range(5))
    assert all(r["rank"] <= 3 for r in rows)


def test_ivf_train_lloyd_improves_objective(spark):
    """Distributed spherical k-means: each Lloyd iteration must not
    decrease the objective Σ cos(v, assigned centroid) — the property
    that averaging UNIT vectors guarantees (raw means would not).
    Trained centroids then plug into ivf_ann_topk unchanged."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    k = 8

    def objective(cent):
        assign = simsearch.ivf_assign(emb, cent)
        a = emb.join(assign, on="vec_id")
        cv = cent.select(
            F.col("vec_id").alias("cell"),
            F.col("embedding").alias("_cv"),
        )
        scored = a.join(cv, on="cell").select(
            simsearch.cosine(
                simsearch.as_double("embedding"), simsearch.as_double("_cv")
            ).alias("c")
        )
        return scored.agg(F.sum("c")).collect()[0][0]

    seed = emb.filter(F.col("vec_id") < k).select("vec_id", "embedding")
    obj0 = objective(seed)
    cent1 = simsearch.ivf_train(emb, n_centroids=k, n_iters=1).cache()
    obj1 = objective(cent1)
    cent2 = simsearch.ivf_train(emb, n_centroids=k, n_iters=2).cache()
    obj2 = objective(cent2)
    assert obj1 >= obj0 - 1e-6, (obj0, obj1)
    assert obj2 >= obj1 - 1e-6, (obj1, obj2)

    out = simsearch.ivf_ann_topk(
        emb, emb.filter(F.col("vec_id") < 5), k=3, centroids=cent2
    )
    rows = out.collect()
    assert {r["query_id"] for r in rows} == set(range(5))
    assert all(r["rank"] <= 3 for r in rows)


def test_ivf_nprobe_improves_recall_toward_exact(spark):
    """nprobe is the IVF recall lever: probing more cells can only add
    candidates, so top-k recall vs the exact brute-force answer is
    monotone in nprobe — and at nprobe = K (all cells) the candidate
    set is the whole corpus minus nothing, making the result EQUAL the
    exact top-k."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 10)
    k, K = 5, 8
    exact = {(r["query_id"], r["neighbor_id"])
             for r in simsearch.cosine_topk(emb, queries, k=k).collect()}

    def recall(nprobe):
        got = {(r["query_id"], r["neighbor_id"])
               for r in simsearch.ivf_ann_topk(
                   emb, queries, k=k, n_centroids=K, nprobe=nprobe).collect()}
        return len(got & exact) / len(exact)

    r1, r2, rall = recall(1), recall(2), recall(K)
    assert r1 <= r2 + 1e-9 <= rall + 2e-9, (r1, r2, rall)
    assert rall == 1.0, f"nprobe=K must equal exact top-k (recall {rall})"
    assert r2 >= r1  # the lever actually moves


def _vec_df(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_semantic_dedup_keeps_min_id_per_similar_group(spark):
    # ids 0/1/2 identical direction (scaled copies -> cosine 1), id 3
    # orthogonal: one centroid world (seed = id 0) so all share a cell.
    df = _vec_df(spark, [
        (0, [1.0, 0.0, 0.0]),
        (1, [2.0, 0.0, 0.0]),
        (2, [0.5, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ])
    out = simsearch.semantic_dedup(df, threshold=0.9, n_centroids=1)
    got = {r.vec_id: r.keep for r in out.collect()}
    assert got == {0: True, 1: False, 2: False, 3: True}


def test_semantic_dedup_prunes_within_cells_only(spark):
    # Two well-separated directions; seeds (ids 0 and 1) land one
    # centroid per direction, and each cell prunes independently.
    df = _vec_df(spark, [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.05]),   # cell of id 0
        (3, [0.05, 1.0]),   # cell of id 1
        (4, [1.0, 0.04]),   # cell of id 0
    ])
    out = simsearch.semantic_dedup(df, threshold=0.95, n_centroids=2)
    rows = {r.vec_id: r for r in out.collect()}
    # cell 0 = {0, 2, 4}: 0 (the min id) survives, 2 and 4 prune
    # against it; cell 1 = {1, 3}: cos([0,1],[0.05,1]) ≈ 0.9988 ≥ .95
    # so 3 prunes against 1. The near-identical CROSS-cell pair (2, 4
    # vs 3) never even scores — blocking is by cell.
    assert {i: r.keep for i, r in rows.items()} == {
        0: True, 1: True, 2: False, 3: False, 4: False,
    }
    assert rows[2].cell == rows[4].cell != rows[3].cell


def test_semantic_dedup_dropped_ids_subset_of_exact_pairs(spark):
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    out = simsearch.semantic_dedup(
        emb, threshold=0.4, centroids=emb.filter(F.col("vec_id") < 16)
    )
    dropped = {r.vec_id for r in out.filter(~F.col("keep")).collect()}
    exact_b = {
        r.id_b
        for r in simsearch.cosine_dedup_pairs(emb, threshold=0.4).collect()
    }
    # cell blocking only ever REDUCES the prune set vs all-pairs
    assert dropped <= exact_b


def test_semantic_dedup_handles_sparse_hashed_ids(spark):
    """Hashed/sparse id spaces: every id >> n_centroids. The seed set
    is the K SMALLEST ids (not `id < K`, which would match nothing and
    silently drop the whole corpus)."""
    base = 10**12
    df = _vec_df(spark, [
        (base + 1, [1.0, 0.0, 0.0]),
        (base + 2, [2.0, 0.0, 0.0]),   # dup of +1
        (base + 3, [0.0, 1.0, 0.0]),
    ])
    out = simsearch.semantic_dedup(df, threshold=0.9, n_centroids=1)
    got = {r.vec_id: r.keep for r in out.collect()}
    assert got == {base + 1: True, base + 2: False, base + 3: True}
