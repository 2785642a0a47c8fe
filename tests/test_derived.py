"""Incremental derived-table maintenance (derived.sync_derived): after
any sequence of syncs at any cadence, the derivative must equal the
full recompute — transform(src.snapshot()).filter(gate) — exactly,
including deletions caused by gate flips and source deletes."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F, types as T

from datax_spark.derived import last_synced_version, sync_derived
from datax_spark.table import SnapshotTable

SRC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)
DST_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text_upper", T.StringType()),
        T.StructField("score", T.LongType()),
    ]
)


def _transform(df):
    return df.select(
        "doc_id", F.upper(F.col("text")).alias("text_upper"), "score"
    )


def _gate():
    return F.col("score") >= 10


def _tables(spark, tmp_path, tag):
    src = SnapshotTable.create(
        spark, str(tmp_path / f"src_{tag}"), SRC_SCHEMA,
        key_cols=["doc_id"], num_buckets=4,
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / f"dst_{tag}"), DST_SCHEMA,
        key_cols=["doc_id"], num_buckets=4,
    )
    return src, dst


def _merge(spark, src, rows, lsn0, batch_id):
    df = spark.createDataFrame(
        [(d, t, s, lsn0 + i, op) for i, (d, t, s, op) in enumerate(rows)],
        "doc_id long, text string, score long, lsn long, op string",
    )
    src.merge(df, batch_id=batch_id)


def _expected(src):
    return (
        _transform(src.snapshot()).filter(_gate())
        .toPandas().sort_values("doc_id").reset_index(drop=True)
    )


def _got(dst):
    return (
        dst.snapshot().toPandas().sort_values("doc_id").reset_index(drop=True)
        [["doc_id", "text_upper", "score"]]
    )


def test_incremental_sync_equals_full_recompute(spark, tmp_path):
    src, dst = _tables(spark, tmp_path, "a")
    # batch 1: two gate-passing rows, one failing
    _merge(spark, src, [(1, "a", 50, "U"), (2, "b", 5, "U"), (3, "c", 30, "U")],
           100, "b1")
    ci = sync_derived(src, dst, transform=_transform, gate=_gate())
    assert ci is not None and not ci.skipped
    pd.testing.assert_frame_equal(_got(dst), _expected(src))
    assert last_synced_version(dst) == src.current()["version"]

    # batch 2: gate FLIP off (1: 50→2), flip on (2: 5→60), src delete (3)
    _merge(spark, src, [(1, "a2", 2, "U"), (2, "b2", 60, "U"), (3, "c", 0, "D")],
           200, "b2")
    sync_derived(src, dst, transform=_transform, gate=_gate())
    pd.testing.assert_frame_equal(_got(dst), _expected(src))
    got_ids = set(_got(dst)["doc_id"])
    assert got_ids == {2}  # 1 gated out, 3 deleted, 2 gated in

    # batch 3: new key + re-insert of the deleted key
    _merge(spark, src, [(3, "c3", 99, "U"), (4, "d", 11, "U")], 300, "b3")
    sync_derived(src, dst, transform=_transform, gate=_gate())
    pd.testing.assert_frame_equal(_got(dst), _expected(src))


def test_sync_is_exactly_once_and_noop_when_current(spark, tmp_path):
    src, dst = _tables(spark, tmp_path, "b")
    _merge(spark, src, [(1, "a", 50, "U")], 100, "b1")
    ci = sync_derived(src, dst, transform=_transform, gate=_gate())
    assert not ci.skipped
    # already current → None, no commit
    assert sync_derived(src, dst, transform=_transform, gate=_gate()) is None
    v = dst.current()["version"]
    # a replayed sync of the same range is a ledgered no-op
    _merge(spark, src, [(2, "b", 20, "U")], 200, "b2")
    ci2 = sync_derived(src, dst, transform=_transform, gate=_gate())
    assert not ci2.skipped and dst.current()["version"] == v + 1


def test_sync_survives_expired_source_snapshots(spark, tmp_path):
    """Retention between syncs expires the synced-from version: the
    fallback full resync must converge, including deleting derivative
    keys whose source rows vanished while the chain was broken."""
    src, dst = _tables(spark, tmp_path, "c")
    _merge(spark, src, [(1, "a", 50, "U"), (2, "b", 40, "U")], 100, "b1")
    sync_derived(src, dst, transform=_transform, gate=_gate())

    _merge(spark, src, [(1, "a", 0, "D"), (3, "c", 70, "U")], 200, "b2")
    _merge(spark, src, [(4, "d", 80, "U")], 300, "b3")
    src.expire_snapshots(keep_last=1)  # the synced-from version is gone

    sync_derived(src, dst, transform=_transform, gate=_gate())
    pd.testing.assert_frame_equal(_got(dst), _expected(src))
    assert set(_got(dst)["doc_id"]) == {2, 3, 4}  # 1's delete propagated


def test_sync_without_gate_or_transform_mirrors_source(spark, tmp_path):
    src = SnapshotTable.create(
        spark, str(tmp_path / "src_d"), SRC_SCHEMA, key_cols=["doc_id"],
        num_buckets=4,
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst_d"), SRC_SCHEMA, key_cols=["doc_id"],
        num_buckets=4,
    )
    _merge(spark, src, [(1, "a", 1, "U"), (2, "b", 2, "U")], 100, "b1")
    sync_derived(src, dst)
    _merge(spark, src, [(1, "a", 0, "D"), (3, "c", 3, "U")], 200, "b2")
    sync_derived(src, dst)
    exp = src.snapshot().toPandas().sort_values("doc_id").reset_index(drop=True)
    got = dst.snapshot().toPandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_null_gate_rows_are_deleted_not_stranded(spark, tmp_path):
    """A source update that makes the gate expression NULL must remove
    the row from the derivative: NULL is neither true nor NOT-true, so
    without coalescing it would escape both the upsert and the delete
    branch and leave the stale pre-update row behind forever."""
    src = SnapshotTable.create(
        spark, str(tmp_path / "src_n"), SRC_SCHEMA, key_cols=["doc_id"],
        num_buckets=4,
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / "dst_n"), DST_SCHEMA, key_cols=["doc_id"],
        num_buckets=4,
    )
    _merge(spark, src, [(1, "a", 50, "U")], 100, "b1")
    sync_derived(src, dst, transform=_transform, gate=_gate())
    assert set(_got(dst)["doc_id"]) == {1}

    # score -> NULL: gate evaluates NULL
    df = spark.createDataFrame(
        [(1, "a2", None, 200, "U")],
        "doc_id long, text string, score long, lsn long, op string",
    )
    src.merge(df, batch_id="b2")
    sync_derived(src, dst, transform=_transform, gate=_gate())
    assert _got(dst).empty
    pd.testing.assert_frame_equal(_got(dst), _expected(src))


# ---------------------------------------------------------------- agg


AGG_DST_SCHEMA = T.StructType(
    [
        T.StructField("grp", T.StringType()),
        T.StructField("n_docs", T.LongType()),
        T.StructField("sum_score", T.LongType()),
    ]
)
_AGGS = {"n_docs": ("count",), "sum_score": ("sum", "score")}


def _agg_transform(df):
    # group key derived from the row (first letter of text), rows with
    # score present only
    return df.select(F.substring("text", 1, 1).alias("grp"), "score")


def _agg_tables(spark, tmp_path, tag):
    src = SnapshotTable.create(
        spark, str(tmp_path / f"asrc_{tag}"), SRC_SCHEMA,
        key_cols=["doc_id"], num_buckets=4,
    )
    dst = SnapshotTable.create(
        spark, str(tmp_path / f"adst_{tag}"), AGG_DST_SCHEMA,
        key_cols=["grp"], num_buckets=4,
    )
    return src, dst


def _agg_expected(src, gate=None):
    rows = _agg_transform(src.snapshot())
    if gate is not None:
        rows = rows.filter(F.coalesce(gate, F.lit(False)))
    return (
        rows.groupBy("grp")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
             F.sum("score").alias("sum_score"))
        .toPandas().sort_values("grp").reset_index(drop=True)
    )


def _agg_got(dst):
    return (
        dst.snapshot().toPandas().sort_values("grp").reset_index(drop=True)
        [["grp", "n_docs", "sum_score"]]
    )


def test_agg_incremental_equals_full_recompute_any_cadence(spark, tmp_path):
    """Grouped derivative maintained by delta-aggregation == full
    re-aggregation after every sync, across inserts, updates that MOVE
    a row between groups, and delete-heavy batches."""
    from datax_spark.derived import sync_derived_agg

    src, dst = _agg_tables(spark, tmp_path, "a")
    _merge(spark, src, [(1, "ax", 5, "U"), (2, "ay", 7, "U"), (3, "bz", 11, "U")],
           100, "b1")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    pd.testing.assert_frame_equal(_agg_got(dst), _agg_expected(src))

    # update moves doc 2 from group 'a' to group 'c'; doc 1 re-scored
    _merge(spark, src, [(2, "cy", 7, "U"), (1, "ax", 9, "U")], 200, "b2")
    # delete-heavy: group 'b' empties entirely
    _merge(spark, src, [(3, "bz", 0, "D")], 300, "b3")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)  # 2 src batches in ONE sync
    pd.testing.assert_frame_equal(_agg_got(dst), _agg_expected(src))
    assert _agg_got(dst).grp.tolist() == ["a", "c"]  # 'b' deleted, not zeroed

    # per-batch cadence from here on
    _merge(spark, src, [(4, "bw", 3, "U")], 400, "b4")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    _merge(spark, src, [(4, "bw", 0, "D"), (1, "ax", 0, "D"), (2, "cy", 0, "D")],
           500, "b5")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    pd.testing.assert_frame_equal(_agg_got(dst), _agg_expected(src))
    assert _agg_got(dst).empty  # everything deleted upstream


def test_agg_gate_flip_retracts_contribution(spark, tmp_path):
    from datax_spark.derived import sync_derived_agg

    gate = F.col("score") >= 10
    src, dst = _agg_tables(spark, tmp_path, "g")
    _merge(spark, src, [(1, "ax", 50, "U"), (2, "ay", 30, "U")], 100, "b1")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform, gate=gate)
    assert _agg_got(dst).n_docs.tolist() == [2]
    # doc 2 drops below the gate: its contribution must RETRACT
    _merge(spark, src, [(2, "ay", 3, "U")], 200, "b2")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform, gate=gate)
    pd.testing.assert_frame_equal(_agg_got(dst), _agg_expected(src, gate))
    assert _agg_got(dst).sum_score.tolist() == [50]
    # and back in
    _merge(spark, src, [(2, "ay", 40, "U")], 300, "b3")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform, gate=gate)
    assert _agg_got(dst).sum_score.tolist() == [90]


def test_agg_sync_is_exactly_once_and_survives_expiry(spark, tmp_path):
    from datax_spark.derived import sync_derived_agg

    src, dst = _agg_tables(spark, tmp_path, "x")
    _merge(spark, src, [(1, "ax", 5, "U")], 100, "b1")
    ci = sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    assert ci is not None and not ci.skipped
    # already current → no-op without a commit
    assert sync_derived_agg(src, dst, _AGGS, transform=_agg_transform) is None
    # watermark survives retention (compacted into the ledger summary)
    dst.expire_snapshots(keep_last=1)
    assert last_synced_version(dst) == src.current()["version"]
    assert sync_derived_agg(src, dst, _AGGS, transform=_agg_transform) is None
    # source-snapshot expiry between syncs → full resync, still exact
    _merge(spark, src, [(2, "by", 7, "U"), (1, "ax", 0, "D")], 200, "b2")
    src.expire_snapshots(keep_last=1)
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    pd.testing.assert_frame_equal(_agg_got(dst), _agg_expected(src))


def test_agg_rejects_non_decomposable_aggregates(spark, tmp_path):
    import pytest
    from datax_spark.derived import sync_derived_agg

    src, dst = _agg_tables(spark, tmp_path, "r")
    with pytest.raises(ValueError, match="count"):
        sync_derived_agg(src, dst, {"m": ("sum", "score")})
    with pytest.raises(ValueError, match="delta-maintainable"):
        sync_derived_agg(src, dst, {"n": ("count",), "m": ("max", "score")})


def test_agg_null_sum_semantics_identical_across_paths(spark, tmp_path):
    """A live group whose summed inputs are all NULL holds 0 (the
    documented sum(coalesce(x,0)) semantics) — IDENTICALLY from the
    incremental path and from a fresh full resync, so the equality
    invariant survives NULL inputs (review finding r5: plain sum()
    in the full path yielded NULL where the delta path held 0)."""
    from datax_spark.derived import sync_derived_agg

    src, dst = _agg_tables(spark, tmp_path, "nullsum")
    # group 'n': both rows carry NULL score; group 'a': mixed
    _merge(spark, src, [(1, "nx", None, "U"), (2, "ny", None, "U"),
                        (3, "ax", 7, "U"), (4, "ay", None, "U")], 100, "b1")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    got = {r["grp"]: (r["n_docs"], r["sum_score"]) for r in dst.snapshot().collect()}
    assert got["n"] == (2, 0)  # not NULL
    assert got["a"] == (2, 7)

    # a fresh destination syncing the same source ONCE (full path)
    # must agree byte-for-byte
    _src2, dst2 = _agg_tables(spark, tmp_path, "nullsum_full")
    sync_derived_agg(src, dst2, _AGGS, transform=_agg_transform)
    got2 = {r["grp"]: (r["n_docs"], r["sum_score"]) for r in dst2.snapshot().collect()}
    assert got2 == got

    # retract one NULL row incrementally: count falls, sum stays 0
    _merge(spark, src, [(1, "nx", 0, "D")], 200, "b2")
    sync_derived_agg(src, dst, _AGGS, transform=_agg_transform)
    got = {r["grp"]: (r["n_docs"], r["sum_score"]) for r in dst.snapshot().collect()}
    assert got["n"] == (1, 0)
