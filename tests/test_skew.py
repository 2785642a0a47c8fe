"""Skew mitigation: salted join correctness + partition balance on a
Zipf-hot key distribution (SURVEY.md §5 item 6)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datax_spark.skew import explode_salt, hot_keys, salted_join, with_salt

N_SALT = 8


def _skewed_fact(spark, n=20_000):
    """~50% of rows on one hot key, rest uniform over 100 keys."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .alias("k"),
        F.col("id").alias("v"),
    )


def _dim(spark):
    return spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("name")
    )


def test_salted_join_equals_plain_join(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, on=["k"]).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(fact, dim, on=["k"], n_salt=N_SALT, fact_salt_from="v").groupBy(
        "k", "name"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_hot_key_detection(spark):
    fact = _skewed_fact(spark)
    hot = hot_keys(fact, ["k"], threshold_frac=0.1)
    assert hot == [(0,)]


def test_salting_balances_partitions(spark):
    """After keying the shuffle on (k, salt), no partition may hold a
    grossly disproportionate share: the hot key's 50% mass must spread
    across ~N_SALT partitions."""
    fact = with_salt(_skewed_fact(spark), N_SALT, from_col="v")
    parts = (
        fact.repartition(16, "k", "_salt")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    counts = sorted(r["count"] for r in parts)
    total = sum(counts)
    # unsalted, one partition would hold >50%; salted, the worst
    # partition carries at most ~(50%/N_SALT + uniform share) ≈ 10%
    assert max(counts) < 0.2 * total, counts

    unsalted = (
        _skewed_fact(spark).repartition(16, "k")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    assert max(r["count"] for r in unsalted) > 0.45 * total, "fixture must actually be skewed"


def test_explode_salt_replicates_dim(spark):
    d = explode_salt(_dim(spark), N_SALT)
    assert d.count() == 100 * N_SALT
    assert d.select("_salt").distinct().count() == N_SALT


def test_adaptive_salted_join_equals_plain_join(spark):
    """Hot-only salting must produce the identical result while
    replicating only the hot keys' dim rows."""
    from datax_spark.skew import adaptive_salted_join

    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = fact.join(dim, on=["k"]).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    adaptive = adaptive_salted_join(
        fact, dim, on=["k"], n_salt=N_SALT, threshold_frac=0.1, fact_salt_from="v"
    ).groupBy("k", "name").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, adaptive.collect()))


def test_adaptive_salting_no_hot_keys_falls_back(spark):
    from datax_spark.skew import adaptive_salted_join

    fact = spark.range(1000).select(
        F.pmod(F.col("id"), F.lit(100)).alias("k"), F.col("id").alias("v"))
    dim = _dim(spark)
    out = adaptive_salted_join(fact, dim, on=["k"], threshold_frac=0.5)
    assert out.count() == 1000


def test_hot_key_detection_sampled(spark):
    """The sampled detector (one pass over a seeded sample, total via
    observe — no full-table count) still finds the Zipf head; exact
    mode (sample_frac=None) agrees."""
    fact = _skewed_fact(spark, n=50_000)
    assert hot_keys(fact, ["k"], threshold_frac=0.1, sample_frac=0.05) == [(0,)]
    assert hot_keys(fact, ["k"], threshold_frac=0.1, sample_frac=None) == [(0,)]


def test_merge_balances_zipf_wal_without_salting(spark, tmp_path):
    """The MERGE path's claim (skew.py header): LWW max_by partial-agg
    collapses a hot key's events map-side, and the bucket hash over
    the FULL key spreads hot-repo keys, so a Zipf-hot WAL needs no
    salting — per-bucket row spread through a real merge stays tight."""
    from datax_spark.engine import replay_wal_as_table
    from datax_spark.fixtures import generate_wal
    from datax_spark.schema_evolution import EpochRegistry
    from datax_spark.table import bucket_expr

    fx = generate_wal(str(tmp_path / "w"), n_keys=300, n_events=6000,
                      n_segments=4, with_schema_evolution=False)
    reg = EpochRegistry.from_json(fx.schema_epochs_path)
    t = replay_wal_as_table(spark, fx.wal_dir, reg, str(tmp_path / "t"), num_buckets=8)
    counts = [
        r["n"] for r in t.snapshot()
        .withColumn("b", bucket_expr(["repo", "path"], 8))
        .groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    mean = sum(counts) / len(counts)
    assert len(counts) == 8
    assert max(counts) < 2.5 * mean, counts
