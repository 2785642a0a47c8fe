"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline, and two bucketed
scale paths: random-hyperplane sign-LSH (data-oblivious) and an IVF
coarse quantizer (data-adaptive). At 100 TB you first bucket (one
map-side pass + one uniform shuffle), then run exact math only within
buckets.

All arithmetic is double-precision via built-in higher-order
functions (zip_with / aggregate) — JVM-side, no UDFs. (Measured: for
numeric lambdas the HOF interpreter beats unrolled 64-term
element_at chains, which also exceed the codegen method limit —
string-processing HOFs are the ones worth rewriting as explode, see
textops.) Norms are precomputed ONCE per vector before any join, so
per-pair work is just the dot product: |A|+|B| norm evaluations
instead of |A|·|B|. The pseudo-random hyperplanes are derived from
sha256 so the DuckDB oracle can generate bit-identical planes (no
engine-specific RNG).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

# ----------------------------------------------------- scale-aware sizing


def size_lsh_planes(
    n_vectors: int,
    target_bucket_rows: int = 1024,
    min_planes: int = 4,
    max_planes: int = 24,
) -> int:
    """planes_per_band ≈ log2(N / target_bucket_rows): sized so an
    (idealized uniform) band splits N vectors into buckets of about
    `target_bucket_rows`, keeping within-bucket exact scoring
    O(N·target) instead of O((N/2^fixed)²) as the corpus grows.
    Raising planes lowers per-band collision probability p^planes —
    at higher plane counts grow n_bands too (size_lsh_bands) to hold
    recall. Bounded to [min_planes, max_planes] (2^24 buckets/band is
    past any practical corpus)."""
    import math

    if n_vectors <= target_bucket_rows:
        return min_planes
    return max(min_planes, min(max_planes, math.ceil(math.log2(n_vectors / target_bucket_rows))))


def size_lsh_bands(
    planes_per_band: int, p_collide: float = 0.7, target_recall: float = 0.9,
    max_bands: int = 64,
) -> int:
    """n_bands holding OR-across-bands recall ≈ target at a given
    per-plane agreement probability p (p = 1 - θ/π for angle θ at the
    dedup threshold; cosine 0.4 → p ≈ 0.63, cosine 0.9 → p ≈ 0.86):
    recall = 1 - (1 - p^planes)^bands ⇒ bands = ln(1-target)/ln(1-p^planes)."""
    import math

    p_band = p_collide ** planes_per_band
    if p_band >= 1.0:
        return 1
    return max(1, min(max_bands, math.ceil(math.log(1 - target_recall) / math.log(1 - p_band))))


def size_ivf_centroids(
    n_vectors: int, min_centroids: int = 16, max_centroids: int = 1 << 18
) -> int:
    """n_centroids ≈ √N (the classic IVF balance point: K cells of
    ~N/K rows each make assign O(N·K) and probe O(Q·nprobe·N/K), both
    minimized together at K ≈ √N). Clamped so tiny corpora keep a
    workable cell count and huge ones bound the broadcast table."""
    import math

    return max(min_centroids, min(max_centroids, math.isqrt(max(1, n_vectors))))


# ------------------------------------------------------------- primitives


def as_double(vec: str | Column) -> Column:
    v = F.col(vec) if isinstance(vec, str) else vec
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ a_i·b_i — left-to-right aggregate, deterministic order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _pair_cosine(dot_col: Column, norm_a: Column, norm_b: Column) -> Column:
    """cosine from a per-pair dot and PRE-COMPUTED per-vector norms —
    same expression shape as cosine() (dot / (sqrt·sqrt)), so results
    are bit-identical, but the norms are evaluated once per vector."""
    return dot_col / (norm_a * norm_b)


# ------------------------------------------------------ brute-force top-k


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    The query side is broadcast (it is small by definition); the corpus
    is scanned once, similarity computed map-side, then one shuffle on
    query_id for the per-query top-k window. Self-matches excluded.
    """
    q = query_df.select(
        F.col(id_col).alias("query_id"), as_double(vec_col).alias("qv"),
        l2_norm(as_double(vec_col)).alias("qn"),
    )
    c = df.select(
        F.col(id_col).alias("neighbor_id"), as_double(vec_col).alias("cv"),
        l2_norm(as_double(vec_col)).alias("cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _pair_cosine(dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w_rank = F.row_number().over(
        Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    )
    return (
        scored.withColumn("rank", w_rank)
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


# --------------------------------------------------------------- sign-LSH


def plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-7.5, +7.5]:
    first hex nibble of sha256('p<plane>_<dim>') minus 7.5. Importable
    by tests; the SQL twin is `strpos('0123456789abcdef', substr(
    sha256(...),1,1)) - 1 - 7.5`."""
    import hashlib

    nibble = int(hashlib.sha256(f"p{plane}_{dim}".encode()).hexdigest()[0], 16)
    return nibble - 7.5


def _plane_array_sql(plane: int, n_dims: int) -> str:
    return "array(" + ",".join(
        f"CAST({plane_component(plane, d)} AS DOUBLE)" for d in range(n_dims)
    ) + ")"


def _proj_sql(vec_sql: str, plane: int, n_dims: int) -> str:
    """Σ w_d·v_d as a SQL fragment — same zip_with/aggregate fold as
    dot(), just parsed from one string."""
    return (
        f"aggregate(zip_with({_plane_array_sql(plane, n_dims)}, {vec_sql}, "
        "(x, y) -> x * y), CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def _sign_bits(vec: str | Column, planes: list[int], n_dims: int) -> Column:
    """Bucket id from the sign bits of the given plane projections
    (bit j = 1 iff plane planes[j]'s projection > 0).

    Built as ONE F.expr string when given a column NAME: the
    Column-algebra form (F.array of 64 F.lits + zip_with/aggregate
    lambdas per plane) costs ~3,200 py4j driver round-trips ≈ 2 s of
    pure Python DataFrame-build time per LSH query — before Spark even
    sees a plan. One parsed string per bucket expression is a handful
    of round-trips for the IDENTICAL expression tree (same zip_with/
    aggregate fold, so results are bit-identical)."""
    if isinstance(vec, Column):
        out = F.lit(0).cast("long")
        for j, p in enumerate(planes):
            proj = dot(_plane_array_sql_col(p, n_dims), vec)
            out = out + F.when(proj > 0, F.lit(2 ** j)).otherwise(F.lit(0)).cast("long")
        return out
    vec_sql = f"CAST(`{vec}` AS ARRAY<DOUBLE>)"
    terms = " + ".join(
        f"(CASE WHEN {_proj_sql(vec_sql, p, n_dims)} > 0 "
        f"THEN CAST({2 ** j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j, p in enumerate(planes)
    )
    return F.expr(f"CAST({terms} AS BIGINT)")


def _plane_array_sql_col(plane: int, n_dims: int) -> Column:
    return F.expr(_plane_array_sql(plane, n_dims))


def lsh_bucket(vec_col: str | Column, n_planes: int = 8, n_dims: int = 64) -> Column:
    """Sign-LSH bucket id: bit b = 1 iff Σ_d w(b,d)·v_d > 0, with the
    sha256-derived weights above. Closed-form column expression —
    identical in the DuckDB oracle."""
    # pass the NAME through when we have one — the string form builds
    # the bucket expression in a few py4j calls instead of thousands
    vec = vec_col if isinstance(vec_col, str) else as_double(vec_col)
    return _sign_bits(vec, list(range(n_planes)), n_dims)


def lsh_band_bucket(
    vec_col: str | Column, band: int, planes_per_band: int = 4, n_dims: int = 64
) -> Column:
    """One band of a banded LSH signature: sign bits of planes
    [band·ppb, (band+1)·ppb) — same sha256-derived plane family."""
    planes = [band * planes_per_band + j for j in range(planes_per_band)]
    vec = vec_col if isinstance(vec_col, str) else as_double(vec_col)
    return _sign_bits(vec, planes, n_dims)


def lsh_ann_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_dims: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share the query's LSH bucket; the
    exact cosine window runs only within buckets. At scale this turns
    an O(N·Q) cross product into one uniform hash-bucket join."""
    bq = query_df.select(
        F.col(id_col).alias("query_id"),
        as_double(vec_col).alias("qv"),
        l2_norm(as_double(vec_col)).alias("qn"),
        lsh_bucket(vec_col, n_planes, n_dims).alias("bucket"),
    )
    bc = df.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(vec_col).alias("cv"),
        l2_norm(as_double(vec_col)).alias("cn"),
        lsh_bucket(vec_col, n_planes, n_dims).alias("bucket"),
    )
    scored = (
        bc.join(F.broadcast(bq), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _pair_cosine(dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


# -------------------------------------------------------------------- IVF


def _seed_centroids(df: DataFrame, n_centroids: int, id_col: str, vec_col: str) -> DataFrame:
    """Deterministic seed set: the K smallest ids (TakeOrdered, K is
    small). Literally "the first K ids" — robust to SPARSE or hashed
    id spaces, where a `id < K` filter would select few or zero seeds
    and silently degrade the index. On dense 0..N ids (the testdata
    and every oracle) the two forms pick the identical set."""
    return df.select(id_col, vec_col).orderBy(id_col).limit(n_centroids)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    centroid by cosine (deterministic tie-break on centroid id).
    Centroids are broadcast (K is small by definition), so assignment
    is a map-side O(N·K) pass — the standard inverted-file build.
    Returns (id_col, cell); with nprobe > 1 a vector gets one row per
    probed cell (its nprobe nearest centroids) — used on the QUERY
    side so a query near a cell boundary still reaches neighbors
    indexed just across it."""
    c = centroids.select(
        F.col(id_col).alias("cid"), as_double(vec_col).alias("cv"),
        l2_norm(as_double(vec_col)).alias("cn"),
    )
    v = df.select(
        F.col(id_col).alias("_vid"), as_double(vec_col).alias("_v"),
        l2_norm(as_double(vec_col)).alias("_vn"),
    )
    scored = v.crossJoin(F.broadcast(c)).withColumn(
        "_cos", _pair_cosine(dot(F.col("_v"), F.col("cv")), F.col("_vn"), F.col("cn"))
    )
    w = Window.partitionBy("_vid").orderBy(F.desc("_cos"), F.asc("cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= nprobe)
        .select(F.col("_vid").alias(id_col), F.col("cid").alias("cell"))
    )


def ivf_train(
    df: DataFrame,
    n_centroids: int | None = None,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Refine IVF centroids with distributed Lloyd iterations
    (spherical k-means): assign every vector to its nearest centroid
    by cosine (broadcast centroids, map-side), then recompute each
    cell's centroid as the mean of its members' UNIT vectors —
    posexplode to (cell, pos, x/|v|) → one groupBy(cell, pos) avg →
    reassemble the array. Averaging normalized vectors (not raw ones)
    is what makes the spherical k-means objective Σ cos(v, c_assigned)
    non-decreasing per iteration; cosine is scale-invariant so the
    mean needs no renormalization for assignment. Cells that lose all
    members drop out (K can shrink). Each iteration is one broadcast
    pass + one (cell,pos)-keyed shuffle of N·dims rows — linear in
    corpus size, the standard distributed k-means step. Returns
    (id_col=cell id, vec_col=centroid) for ivf_assign/ivf_ann_topk.

    The driver-registered ann_ivf_topk keeps the deterministic seed
    centroids (first K ids) so its DuckDB oracle reproduces the index;
    this trainer is the production build step on real corpora."""
    if n_centroids is None:
        n_centroids = size_ivf_centroids(df.count())
    cent = _seed_centroids(df, n_centroids, id_col, vec_col)
    for _ in range(n_iters):
        assign = ivf_assign(df, cent, id_col=id_col, vec_col=vec_col)
        unit = (
            df.join(assign, on=id_col)
            .withColumn("_n", F.greatest(l2_norm(as_double(vec_col)), F.lit(1e-12)))
            .select(
                "cell",
                F.posexplode(
                    F.transform(as_double(vec_col), lambda x: x / F.col("_n"))
                ).alias("pos", "x"),
            )
        )
        means = unit.groupBy("cell", "pos").agg(F.avg("x").alias("m"))
        cent = (
            means.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias(vec_col)
            )
            .select(F.col("cell").alias(id_col), vec_col)
        )
    return cent


def ivf_ann_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 5,
    n_centroids: int | None = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    nprobe: int = 1,
) -> DataFrame:
    """Approximate top-k via an IVF index: vectors are bucketed by
    nearest centroid (ivf_assign); each query searches its `nprobe`
    nearest cells with exact cosine + window. The centroid seed set is
    deterministic (the first n_centroids ids) so the DuckDB oracle
    reproduces the nprobe=1 index bit-for-bit. The alternative scale
    path to sign-LSH: cells adapt to the data distribution where LSH
    buckets are data-oblivious.

    n_centroids=None auto-sizes K ≈ √N (size_ivf_centroids) — the
    scale default; the explicit sandbox value (16) keeps the DuckDB
    oracle's centroid set pinned. Pass `centroids` (e.g. from
    ivf_train) to search a pre-trained index. nprobe > 1 probes the
    query's next-nearest cells too — the standard recall lever for
    queries near a cell boundary (corpus rows keep ONE cell each, so a
    pair can match through at most one probed cell: no dedup needed;
    probe cost is Q·nprobe·N/K, still nowhere near brute force)."""
    if centroids is None:
        if n_centroids is None:
            n_centroids = size_ivf_centroids(df.count())
        centroids = _seed_centroids(df, n_centroids, id_col, vec_col)
    assign = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col)
    base = df.select(
        F.col(id_col), as_double(vec_col).alias("_v"),
        l2_norm(as_double(vec_col)).alias("_n"),
    ).join(assign, on=id_col)
    qvec = query_df.select(F.col(id_col).alias("query_id")).join(
        base.select(
            F.col(id_col).alias("query_id"),
            F.col("_v").alias("qv"),
            F.col("_n").alias("qn"),
            F.col("cell"),
        ),
        on="query_id",
    )
    if nprobe > 1:
        probe = ivf_assign(
            query_df, centroids, id_col=id_col, vec_col=vec_col, nprobe=nprobe
        ).select(F.col(id_col).alias("query_id"), "cell")
        qvec = qvec.drop("cell").join(probe, on="query_id")
    q = qvec
    c = base.select(
        F.col(id_col).alias("neighbor_id"), F.col("_v").alias("cv"),
        F.col("_n").alias("cn"), F.col("cell")
    )
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            _pair_cosine(dot(F.col("qv"), F.col("cv")), F.col("qn"), F.col("cn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rank")
    )


# ------------------------------------------------------------ near-dedup


def lsh_cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bands: int | None = 4,
    planes_per_band: int | None = 4,
    n_dims: int = 64,
    target_bucket_rows: int = 1024,
) -> DataFrame:
    """Embedding near-dup pairs, banded-LSH-blocked — the 100 TB path.

    MinHash-style banding on sign-LSH: each vector gets n_bands
    (band, bucket) rows (map-side, zero shuffle); a pair is a
    CANDIDATE if ANY band's buckets collide (OR across bands — recall
    1-(1-p^ppb)^n_bands vs the single-signature p^(ppb·n_bands), e.g.
    ~50% vs ~2% at cosine 0.4), then exact cosine scores candidates
    only. One uniform (band, bucket) self-join + a distinct replaces
    the O(N²) cross product; per-pair math identical to
    cosine_dedup_pairs, and the whole index is oracle-reproducible
    (sha256-derived planes).

    planes_per_band=None auto-sizes from the corpus (size_lsh_planes,
    ≈log2(N/target_bucket_rows), floor 4): measured at N=2000 the
    fixed 4-plane default leaves only 16 buckets/band and 470k of 2.0M
    possible pairs survive as candidates (23% — barely any pruning);
    bucket count must grow with N or within-bucket exact scoring
    reverts to O(N²). More planes per band lowers per-band recall
    (p^planes) — the documented LSH trade; grow n_bands
    (size_lsh_bands) to compensate where recall is the priority."""
    if planes_per_band is None:
        planes_per_band = size_lsh_planes(df.count(), target_bucket_rows)
    if n_bands is None:
        # hold recall at a moderate-similarity operating point
        n_bands = size_lsh_bands(planes_per_band, p_collide=0.7, target_recall=0.5)
    sig = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    lsh_band_bucket(vec_col, b, planes_per_band, n_dims).alias("bucket"),
                )
                for b in range(n_bands)
            ])
        ).alias("s"),
    ).select("id", "s.band", "s.bucket")
    cand = (
        sig.alias("a")
        .join(
            sig.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()  # a pair may collide in several bands
    )
    vecs = df.select(
        F.col(id_col).alias("_id"),
        as_double(vec_col).alias("_v"),
        l2_norm(as_double(vec_col)).alias("_n"),
    )
    return (
        cand.join(
            vecs.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                        F.col("_n").alias("na")),
            on="id_a",
        )
        .join(
            vecs.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                        F.col("_n").alias("nb")),
            on="id_b",
        )
        .withColumn(
            "cosine",
            F.round(
                _pair_cosine(dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")), 4
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def cosine_dedup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (a, b) with
    round(cosine, 4) >= threshold, a < b — the exact-answer baseline
    (oracle-checkable). At corpus scale use lsh_cosine_dedup_pairs:
    same per-pair math, candidates restricted to band collisions."""
    a = df.select(
        F.col(id_col).alias("id_a"), as_double(vec_col).alias("va"),
        l2_norm(as_double(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"), as_double(vec_col).alias("vb"),
        l2_norm(as_double(vec_col)).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(
                _pair_cosine(dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")), 4
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.85,
    n_centroids: int | None = None,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (cluster-then-prune, per
    the public SemDeDup recipe: partition the embedding space with
    k-means, then look for near-duplicates only WITHIN each cluster):

      1. assign every vector to its nearest centroid — broadcast
         centroids, map-side O(N·K) (ivf_assign);
      2. per-cell pairwise cosine on the (cell)-keyed self-join —
         Σ|cell|² work instead of N², the same containment argument
         that makes IVF search scale (centroid count sizes as √N via
         size_ivf_centroids, so expected cell size stays bounded);
      3. deterministic keep rule: a row is dropped iff some
         SMALLER-id member of its cell is >= threshold similar — so
         exactly one representative (the minimum id) survives per
         ε-similar group, independent of partitioning.

    Pass `centroids=` from ivf_train for the production path, or let
    the deterministic seed selection (first K ids) keep the whole
    index oracle-reproducible. Returns (id_col, cell, keep); filter
    on keep for the pruned corpus."""
    if centroids is None:
        if n_centroids is None:
            n_centroids = size_ivf_centroids(df.count())
        centroids = _seed_centroids(df, n_centroids, id_col, vec_col)
    assigned = ivf_assign(df, centroids, id_col=id_col, vec_col=vec_col, nprobe=1)
    v = df.select(
        F.col(id_col).alias("_id"), as_double(vec_col).alias("_v"),
        l2_norm(as_double(vec_col)).alias("_n"),
    ).join(assigned.withColumnRenamed(id_col, "_id"), "_id")
    a = v.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"),
                 F.col("_n").alias("na"), "cell")
    b = v.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"),
                 F.col("_n").alias("nb"), "cell")
    dup = (
        a.join(b, ["cell"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "_cos", _pair_cosine(dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
        )
        .filter(F.col("_cos") >= threshold)
        .select(F.col("id_b").alias("_dup_id"))
        .distinct()
    )
    return (
        assigned.join(dup, assigned[id_col] == dup["_dup_id"], "left")
        .withColumn("keep", F.col("_dup_id").isNull())
        .select(id_col, "cell", "keep")
    )
