"""Skew mitigation — salted keys for hot repos (north rule).

Zipf-distributed repos make some join/shuffle keys orders of magnitude
hotter than the median. AQE's skew-join split handles sort-merge joins
at runtime; for the cases AQE doesn't cover (hash aggregations keyed by
the hot column, pre-AQE plans, deterministic layout control) this
module implements the classic explicit remedy:

  * hot_keys()    — one cheap aggregation finds keys above a frequency
                    threshold (bounded driver-side list).
  * salted_join() — dim side exploded ×n_salt, fact side picks a salt
                    by row hash → a hot key's rows spread over n_salt
                    partitions; result identical to the plain join for
                    a dim that is unique per key.

The MERGE path itself needs no salting: last-writer-wins uses map-side
partial max_by, so a hot key's events collapse to one row per map
partition before the shuffle (see table.SnapshotTable.merge).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation, functions as F


def hot_keys(
    df: DataFrame,
    cols: list[str],
    threshold_frac: float = 0.01,
    max_keys: int = 1000,
    sample_frac: float | None = 0.1,
) -> list[tuple]:
    """Keys carrying more than threshold_frac of all rows — the
    candidates worth salting (bounded: ≤ 1/threshold_frac keys can
    exceed the threshold).

    Frequencies are estimated from ONE pass over a sample (seeded, so
    plans are stable): a key at k× the threshold appears in a
    sample of s rows ~Binomial(s, k·threshold_frac) times, so with
    threshold_frac ≥ 0.005 even a 0.1% sample of a 10^9-row fact sees
    a truly-hot key thousands of times — two full fact scans to find
    ≤100 keys is the cost that doubles an adaptive join at 100 TB.
    The total row count rides an observe() on the same pass (no
    separate count job). Misclassification is a perf wobble, never a
    correctness issue: adaptive_salted_join is exact for ANY hot set.
    sample_frac=None or ≥1 disables sampling (exact counts)."""
    s = df if not sample_frac or sample_frac >= 1 else df.sample(
        fraction=sample_frac, seed=42
    )
    obs = Observation()
    s = s.observe(obs, F.count(F.lit(1)).alias("n"))
    rows = (
        s.groupBy(*cols)
        .count()
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    total = obs.get["n"]
    cutoff = total * threshold_frac
    return [tuple(r[c] for c in cols) for r in rows if r["count"] > cutoff]


def with_salt(df: DataFrame, n_salt: int, salt_col: str = "_salt",
              from_col: str | Column | None = None) -> DataFrame:
    """Fact side: deterministic pseudo-random salt from a row hash."""
    src = F.col(from_col) if isinstance(from_col, str) else (
        from_col if from_col is not None else F.monotonically_increasing_id()
    )
    return df.withColumn(salt_col, F.pmod(F.hash(src), F.lit(n_salt)))


def explode_salt(df: DataFrame, n_salt: int, salt_col: str = "_salt") -> DataFrame:
    """Dim side: replicate each row across every salt value."""
    return df.withColumn(
        salt_col, F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salt: int = 8,
    how: str = "inner",
    fact_salt_from: str | None = None,
) -> DataFrame:
    """fact ⋈ dim on `on`, with the shuffle keyed on (on…, salt).
    `dim` must be unique per key (the usual dimension contract) so the
    result equals the unsalted join. fact_salt_from names a fact column
    to derive the salt from (default: a per-row id)."""
    f = with_salt(fact, n_salt, from_col=fact_salt_from)
    d = explode_salt(dim, n_salt)
    return f.join(d, on=[*on, "_salt"], how=how).drop("_salt")


def adaptive_salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n_salt: int = 8,
    threshold_frac: float = 0.01,
    how: str = "inner",
    fact_salt_from: str | None = None,
    sample_frac: float | None = 0.1,
) -> DataFrame:
    """Salt ONLY detected hot keys: cold keys join with salt 0, hot
    keys spread over n_salt. Dim replication cost scales with the hot
    set (bounded by 1/threshold_frac keys), not |dim| — at a 10^9-row
    dimension, full explode_salt is n_salt× the dim shuffle; this is
    |dim| + (n_salt−1)·|hot|. Result identical to the plain join for a
    key-unique dim — for ANY detected hot set, so the sampled detector
    can never change the answer, only the partition balance."""
    hot = hot_keys(fact, on, threshold_frac=threshold_frac, sample_frac=sample_frac)
    if not hot:
        return fact.join(dim, on=on, how=how)
    hot_df = F.broadcast(
        fact.sparkSession.createDataFrame(hot, on).withColumn("_hot", F.lit(True))
    )
    src = F.col(fact_salt_from) if fact_salt_from else F.monotonically_increasing_id()
    f = (
        fact.join(hot_df, on=on, how="left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(), F.pmod(F.hash(src), F.lit(n_salt)))
            .otherwise(F.lit(0)),
        )
        .drop("_hot")
    )
    # explode of a conditional array: hot rows fan out ×n_salt, cold
    # rows keep a single salt-0 copy
    salt_values = F.when(
        F.col("_hot").isNotNull(), F.array(*[F.lit(i) for i in range(n_salt)])
    ).otherwise(F.array(F.lit(0)))
    d = (
        dim.join(hot_df, on=on, how="left")
        .withColumn("_salt", F.explode(salt_values))
        .drop("_hot")
    )
    return f.join(d, on=[*on, "_salt"], how=how).drop("_salt")
