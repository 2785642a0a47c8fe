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

from pyspark.sql import Column, DataFrame, functions as F


def hot_keys(
    df: DataFrame, cols: list[str], threshold_frac: float = 0.01, max_keys: int = 1000
) -> list[tuple]:
    """Keys carrying more than threshold_frac of all rows — the
    candidates worth salting. One partial-agg pass; the result is
    bounded (≤ 1/threshold_frac keys can exceed the threshold)."""
    total = df.count()
    rows = (
        df.groupBy(*cols)
        .count()
        .filter(F.col("count") > total * threshold_frac)
        .orderBy(F.desc("count"))
        .limit(max_keys)
        .collect()
    )
    return [tuple(r[c] for c in cols) for r in rows]


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
) -> DataFrame:
    """Salt ONLY detected hot keys: cold keys join with salt 0, hot
    keys spread over n_salt. Dim replication cost scales with the hot
    set (bounded by 1/threshold_frac keys), not |dim| — at a 10^9-row
    dimension, full explode_salt is n_salt× the dim shuffle; this is
    |dim| + (n_salt−1)·|hot|. Result identical to the plain join for a
    key-unique dim."""
    hot = hot_keys(fact, on, threshold_frac=threshold_frac)
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
