"""Physical-plan regression tests: the 100 TB properties — pushdown,
column pruning, broadcast joins, map-side partial aggregation, top-k
without global sort — must survive refactors. These inspect explain
output only (no job execution)."""

from __future__ import annotations

import pytest

from datax_spark.queries import DEMOTED_QUERIES, QUERIES

_ALL = {**QUERIES, **DEMOTED_QUERIES}
SF_DIR = "/root/testdata/sf0.001"


def plan(spark, name: str, mode: str = "formatted") -> str:
    df = _ALL[name](spark, SF_DIR)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_agg_pushdown_pruning_partial(spark):
    p = plan(spark, "agg_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_quantity), LessThan(l_quantity,50" in p
    read_schema = p.split("ReadSchema")[1][:400]
    assert "l_shipdate" not in read_schema, "projection must prune unused columns"
    assert "partial" in p.lower(), "aggregation must have a map-side partial phase"


def test_star_join_broadcasts_dims(spark):
    p = plan(spark, "join_broadcast_revenue")
    assert p.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in p, "fact side must never shuffle for dim joins"


def test_lww_dedup_is_partial_agg_not_window(spark):
    p = plan(spark, "cdc_lww_dedup")
    assert "Window" not in p, "LWW dedup must use max_by partial agg, not a window sort"
    assert "partial" in p.lower()


def test_topk_avoids_global_sort(spark):
    p = plan(spark, "sort_limit_topk")
    assert "TakeOrderedAndProject" in p


def test_ann_broadcasts_query_side(spark):
    p = plan(spark, "ann_cosine_topk")
    assert "Broadcast" in p


def test_exact_dedup_prunes_to_two_columns(spark):
    p = plan(spark, "dedup_exact")
    read_schema = p.split("ReadSchema")[1][:300]
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read_schema


def test_stream_and_engine_queries_not_checked_here():
    # engine-backed queries build state at call time; their plan
    # properties are asserted via bench/engine tests instead.
    assert "cdc_replay_events" in QUERIES


def test_lsh_dedup_has_no_cartesian(spark):
    """The LSH-blocked embedding dedup must plan as a hash/merge join
    on the bucket key — the whole point is avoiding the exact
    baseline's O(N²) cartesian product."""
    p = plan(spark, "dedup_embedding_cosine_lsh")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_lsh_dedup_is_subset_of_exact_with_recall(spark):
    """Banded-LSH dedup must return a SUBSET of the exact all-pairs
    result (identical per-pair math, candidates restricted) with
    non-trivial recall — the banding exists because one 16-plane
    signature has ~2% recall at cosine 0.4."""
    exact = {(r["id_a"], r["id_b"]): r["cosine"]
             for r in _ALL["dedup_embedding_cosine"](spark, SF_DIR).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"]
           for r in _ALL["dedup_embedding_cosine_lsh"](spark, SF_DIR).collect()}
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert cos == exact[pair]  # same math, bit-identical scores
    assert len(lsh) >= max(1, len(exact) // 4)  # usable recall


def test_ivf_assignment_broadcasts_centroids(spark):
    p = plan(spark, "ann_ivf_topk")
    assert "Broadcast" in p


def test_sessionize_single_shuffle(spark):
    """lag and the running sum share (partition key, ordering), and the
    final per-session rollup groups on a superset of the partition key
    — Spark must plan ONE exchange for the whole pipeline, not three.
    (Formatted explain prints each node twice: tree + details; count
    tree entries only.)"""
    import re

    p = plan(spark, "event_sessionize")
    assert len(re.findall(r"[+:]- Exchange", p)) <= 1
    assert len(re.findall(r"[+:]- Sort", p)) <= 1


def test_running_window_single_exchange(spark):
    import re

    p = plan(spark, "window_running_spend")
    assert len(re.findall(r"[+:]- Exchange", p)) <= 1


def test_code_quality_gate_is_one_scan_no_shuffle(spark):
    """The code quality panel must stay a single fused projection over
    the scan: any Exchange would mean a 100 TB sweep shuffles."""
    p = plan(spark, "code_quality_gate")
    assert "Exchange" not in p
    assert "BatchScan" in p or "Scan" in p


def test_code_secret_redaction_is_map_side(spark):
    p = plan(spark, "code_secret_redaction")
    assert "Exchange" not in p


def test_code_comment_density_single_uniform_shuffle(spark):
    # one lang-keyed aggregation (partial + final) — exactly one
    # shuffle boundary, with a map-side partial phase
    p = plan(spark, "code_comment_density")
    # count tree nodes only — formatted mode re-prints each node in
    # the detail section ("(5) Exchange")
    assert p.count("Exchange (") == 1
    assert "partial" in p.lower()


def test_semantic_dedup_no_unbroadcast_cartesian(spark):
    """Centroid assignment is a broadcast nested-loop by design (K
    centroids, bounded); there must be no non-broadcast cartesian and
    the in-cell pair join must be a hash/sort join on cell, never a
    product."""
    p = plan(spark, "dedup_semantic")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p  # the bounded centroid pass


def test_winnow_pairs_no_cartesian_one_sha_per_gram(spark):
    """Winnowing (r5): the fingerprint join must be equi-keyed (never
    a cartesian/NLJ), and the gram hash must be computed ONCE per gram
    — the sliding min is a Window frame over exploded gram rows (the
    rejected HOF-array formulation put sha inside a transform lambda,
    re-evaluated per window: pinned absent as no lambda function
    anywhere in the plan)."""
    p = plan(spark, "code_winnow_clone_pairs")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Window" in p
    assert "lambdafunction" not in p.lower()  # no per-window re-hash HOFs


def test_mor_fold_absent_on_pure_cow_reads(spark, tmp_path):
    """The MOR read fold must cost pure-COW tables NOTHING: snapshot()
    of a table with no deltas plans as scan+filter (no aggregate, no
    input_file_name), while a table holding deltas plans the
    LWW fold (max_by aggregate keyed on the table key)."""
    import pandas as pd
    from pyspark.sql import types as T

    from datax_spark.table import SnapshotTable

    schema = T.StructType([
        T.StructField("repo", T.StringType()), T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), schema, key_cols=["repo", "path"], num_buckets=2
    )
    b = spark.createDataFrame(
        pd.DataFrame([(1, "U", "r", "p", "c")],
                     columns=["lsn", "op", "repo", "path", "content"]),
        schema="lsn long, op string, repo string, path string, content string",
    )
    t.merge(b, batch_id="cow")
    p_cow = t.snapshot()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "max_by" not in p_cow and "input_file_name" not in p_cow
    assert "HashAggregate" not in p_cow and "SortAggregate" not in p_cow

    t.merge(b.withColumn("lsn", b.lsn + 1), batch_id="mor", strategy="mor")
    p_mor = t.snapshot()._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "max_by" in p_mor and "input_file_name" in p_mor


def test_exact_substring_dedup_plan_shape(spark):
    """Exact-substring dedup (r5): the hash-df count must run with a
    map-side partial phase (one row per corpus char collapses before
    the shuffle), every join is equi-keyed, and no lambda-function
    array pipeline sneaks in."""
    p = plan(spark, "dedup_exact_substrings")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "partial" in p.lower()
