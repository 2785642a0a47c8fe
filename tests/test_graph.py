"""connected_components: correctness, pointer-doubling convergence on
high-diameter chains, and loud failure instead of silent fragmentation
(round-3 ADVICE: plain min-label propagation needs O(diameter) rounds,
so a chain longer than max_iter silently split one true cluster)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.graph import ConvergenceError, connected_components


def _clusters(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = connected_components(df, **kw)
    return {r["doc_id"]: r["cluster_id"] for r in out.collect()}


def test_two_components(spark):
    got = _clusters(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_within_default_iters(spark):
    # A 201-node path: plain propagation needs ~200 rounds — far past
    # max_iter=20; pointer doubling must close it in O(log 200) ≈ 8.
    n = 200
    got = _clusters(spark, [(i, i + 1) for i in range(n)])
    assert set(got) == set(range(n + 1))
    assert set(got.values()) == {0}


def test_chain_label_values_match_transitive_closure(spark):
    # Chain joined to a clique plus an isolated pair: every node's
    # cluster is the global min of its component, nothing leaks across.
    edges = [(i, i + 1) for i in range(5, 60)] + [(3, 5), (3, 4)] + [(100, 101)]
    got = _clusters(spark, edges)
    assert all(got[i] == 3 for i in range(3, 61))
    assert got[100] == got[101] == 100


def test_nonconvergence_raises_loudly(spark):
    # With max_iter too small for the diameter the function must raise,
    # not return fragmented clusters.
    with pytest.raises(ConvergenceError, match="still changing"):
        _clusters(spark, [(i, i + 1) for i in range(300)], max_iter=2)


def test_reversed_edge_direction_is_irrelevant(spark):
    a = _clusters(spark, [(1, 9), (9, 4), (4, 7)])
    b = _clusters(spark, [(9, 1), (4, 9), (7, 4)])
    assert a == b


def test_string_ids(spark):
    df = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("x", "y")], "id_a string, id_b string"
    )
    out = connected_components(df)
    got = {r["doc_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"d1": "d1", "d2": "d1", "d3": "d1", "x": "x", "y": "x"}


def test_empty_edges(spark):
    df = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(df).count() == 0
