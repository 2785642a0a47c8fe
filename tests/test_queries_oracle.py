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


ORACLE_NAMES = sorted(entry_mod.oracle_sql())
ALL_NAMES = sorted(entry_mod.queries())


def test_every_query_has_callable():
    qs = entry_mod.queries()
    assert qs, "queries() must not be empty"
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_subset_of_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    spark_df = entry_mod.queries()[name](spark, SF_DIR)
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = ddb.execute(entry_mod.oracle_sql()[name])
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
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    n = df.count()
    assert n > 0
    assert {"repo", "path", "content_sha256"} <= set(df.columns)
