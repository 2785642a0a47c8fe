"""Local replica of the driver's correctness gate: every entry in
queries() runs on Spark at sf0.001 and must match its oracle_sql()
run through DuckDB on the same parquet files — row count, column
names, and (order-insensitively) values.

Floats are compared to 1e-9 relative tolerance; everything else must
be exactly equal. This is intentionally STRICTER in spirit than the
driver (which hashes): a float mismatch here predicts a hash mismatch
there.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("DATAX_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def _sorted_rows(rows):
    return sorted([tuple(_norm(v) for v in r) for r in rows], key=lambda r: tuple(map(str, r)))


def _approx_eq(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return a is b
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


from datax_spark.queries import DEMOTED_ORACLES, DEMOTED_QUERIES

# Demoted queries sit outside the driver's 50-slot gate but stay fully
# oracle-checked here: same comparison, same rigor.
_QUERIES = {**entry_mod.queries(), **DEMOTED_QUERIES}
_ORACLES = {**entry_mod.oracle_sql(), **DEMOTED_ORACLES}

ORACLE_NAMES = sorted(_ORACLES)
ALL_NAMES = sorted(_QUERIES)


def test_every_query_has_callable():
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_driver_surface_fits_gate_budget():
    """The driver's correctness gate runs at most 50 registry entries
    in dict order (CORRECTNESS_r02 truncated at exactly #50). The
    driver-facing surface must stay within that budget, with every
    non-batch-expressible family ordered in the protected prefix."""
    qs = list(entry_mod.queries())
    assert len(qs) <= 50, f"registry has {len(qs)} entries; gate runs 50"
    head = set(qs[:20])
    for must in ("stream_stateful_audit", "stream_stream_interval_join",
                 "multimodal_frame_sample", "ann_lsh_topk",
                 "dedup_embedding_cosine_lsh"):
        assert must in head, f"{must} must sit in the protected prefix"


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    spark_df = _QUERIES[name](spark, SF_DIR)
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = ddb.execute(_ORACLES[name])
    ddb_cols = [d[0] for d in res.description]
    ddb_rows = [tuple(float(v) if hasattr(v, "as_integer_ratio") and not isinstance(v, (int, bool)) else v for v in r) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(ddb_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(ddb_rows), f"{name}: row count {len(spark_rows)} vs {len(ddb_rows)}"

    # Reorder duckdb columns to spark's order, then compare sorted rows.
    idx = [ddb_cols.index(c) for c in spark_cols]
    ddb_rows = [tuple(r[i] for i in idx) for r in ddb_rows]
    s_rows, d_rows = _sorted_rows(spark_rows), _sorted_rows(ddb_rows)
    for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
        for c, (a, b) in enumerate(zip(sr, dr)):
            assert _approx_eq(a, b), (
                f"{name}: row {i} col {spark_cols[c]}: spark={a!r} duckdb={b!r}"
            )


@pytest.mark.parametrize("name", sorted(set(ALL_NAMES) - set(ORACLE_NAMES)))
def test_rows_only_queries_run(spark, name):
    df = _QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_approx_percentile_twin_within_tolerance(spark):
    """The sketch-based percentile twin (the 100 TB path — mergeable
    bounded-memory sketches instead of per-group sorted multisets)
    must track the exact form: with accuracy=10000 the rank error is
    ≤ N/10000 ranks, which at sandbox N means the returned value is an
    actual sample near the exact rank — compare against the exact
    per-group percentiles with a value tolerance derived from the
    group's spread."""
    from datax_spark.queries import agg_value_percentiles_approx

    from pyspark.sql import functions as SF

    approx = {r["event_type"]: r for r in agg_value_percentiles_approx(spark, SF_DIR).collect()}
    # rank-bracket oracle: the sketch guarantees rank error; at small N
    # the VALUE gap between adjacent samples (esp. in the tail) can be
    # wide, so assert each approx value lies within the exact quantile
    # envelope [q(p-δ), q(p+δ)] instead of a value tolerance.
    delta = 0.02
    brackets = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("event_type")
        .agg(*[
            SF.expr(f"percentile(value, {max(0.0, p - delta)})").alias(f"{n}_lo")
            for n, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
        ] + [
            SF.expr(f"percentile(value, {min(1.0, p + delta)})").alias(f"{n}_hi")
            for n, p in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99))
        ])
    )
    exact = {r["event_type"]: r for r in brackets.collect()}
    assert set(exact) == set(approx)
    for et, er in exact.items():
        ar = approx[et]
        for p in ("p50", "p90", "p99"):
            lo, hi = er[f"{p}_lo"] - 1e-9, er[f"{p}_hi"] + 1e-9
            assert lo <= ar[p] <= hi, (et, p, ar[p], lo, hi)


def test_approx_distinct_twin_within_rsd(spark, ddb):
    """The HyperLogLog++ distinct-count twin must track the exact
    per-group COUNT(DISTINCT) within a few multiples of its stated
    relative standard deviation (rsd=0.02 → allow 4σ ≈ 8%)."""
    from datax_spark.queries import agg_distinct_users_approx

    approx = {r["event_type"]: r for r in agg_distinct_users_approx(spark, SF_DIR).collect()}
    exact = dict(ddb.execute(
        "SELECT event_type, count(DISTINCT user_id) FROM events GROUP BY event_type"
    ).fetchall())
    assert set(exact) == set(approx)
    for et, n_exact in exact.items():
        n_approx = approx[et]["n_users_approx"]
        assert abs(n_approx - n_exact) <= max(2, 0.08 * n_exact), (et, n_approx, n_exact)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"repo", "path", "content_sha256"} <= set(df.columns)
