"""Property-based: random I/U/D sequences folded by the engine must
equal a model dict fold (SURVEY.md §5.5)."""

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from datax_spark.table import SnapshotTable

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

ops = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(min_value=0, max_value=5),  # key id
        st.text(alphabet="abcxyz", min_size=0, max_size=6),  # content
    ),
    min_size=1,
    max_size=40,
)


def model_fold(events):
    state = {}
    for lsn, (op, k, content) in enumerate(events):
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = content
    return state


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=ops, split=st.integers(min_value=1, max_value=39))
def test_engine_matches_model(spark, tmp_path_factory, events, split):
    loc = str(tmp_path_factory.mktemp("prop") / "t")
    t = SnapshotTable.create(spark, loc, SCHEMA, key_cols=["repo", "path"], num_buckets=4)
    rows = [
        (lsn, op, "r", f"k{k}", None if op == "D" else content)
        for lsn, (op, k, content) in enumerate(events)
    ]
    split = min(split, len(rows))
    for chunk in (rows[:split], rows[split:]):
        if chunk:
            pdf = pd.DataFrame(chunk, columns=["lsn", "op", "repo", "path", "content"])
            t.merge(spark.createDataFrame(pdf, schema="lsn long, op string, repo string, path string, content string"))
    got = {r["path"]: r["content"] for r in t.snapshot().collect()}
    want = {f"k{k}": v for k, v in model_fold(events).items()}
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    events=ops,
    cuts=st.lists(st.integers(min_value=1, max_value=39), min_size=0, max_size=3),
    order_seed=st.integers(min_value=0, max_value=10**6),
)
def test_engine_fold_is_delivery_order_independent(
    spark, tmp_path_factory, events, cuts, order_seed
):
    """The STRONG invariant tombstone retention buys: partition the
    event stream into arbitrary batches and apply them in an arbitrary
    PERMUTED order — the final live state must still equal the in-order
    LWW fold. (Without delete markers this fails whenever a delete's
    batch lands before a batch holding an older update for the same
    key — the exact scenario mtime-scrambled WAL segments produced.)"""
    import random

    loc = str(tmp_path_factory.mktemp("propo") / "t")
    t = SnapshotTable.create(spark, loc, SCHEMA, key_cols=["repo", "path"], num_buckets=4)
    rows = [
        (lsn, op, "r", f"k{k}", None if op == "D" else content)
        for lsn, (op, k, content) in enumerate(events)
    ]
    bounds = sorted({min(c, len(rows)) for c in cuts} | {0, len(rows)})
    batches = [rows[a:b] for a, b in zip(bounds, bounds[1:]) if rows[a:b]]
    random.Random(order_seed).shuffle(batches)
    for i, chunk in enumerate(batches):
        pdf = pd.DataFrame(chunk, columns=["lsn", "op", "repo", "path", "content"])
        t.merge(
            spark.createDataFrame(
                pdf, schema="lsn long, op string, repo string, path string, content string"
            ),
            batch_id=f"b{i}",
        )
    got = {r["path"]: r["content"] for r in t.snapshot().collect()}
    want = {f"k{k}": v for k, v in model_fold(events).items()}
    assert got == want


# ---- incremental cluster maintenance vs a union-find model ----------

edge_sets = st.lists(
    st.tuples(st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)),
    min_size=1,
    max_size=22,
)


def _uf_components(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label = min member id of the component
    label = {}
    for n in nodes:
        r = find(n)
        label.setdefault(r, min(m for m in nodes if find(m) == r))
    return {n: label[find(n)] for n in nodes}


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    raw=edge_sets,
    split=st.integers(min_value=0, max_value=21),
    removals=st.sets(st.integers(min_value=0, max_value=12), max_size=4),
)
def test_cluster_table_matches_union_find(spark, tmp_path_factory, raw, split, removals):
    """Any batch split of any edge set, followed by any removal set,
    equals a union-find fold over the surviving edges (stranded
    survivors self-labeled)."""
    from datax_spark.dedup_index import ClusterTable

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    if not edges:
        return
    loc = str(tmp_path_factory.mktemp("ctprop") / "ct")
    ct = ClusterTable.create(spark, loc, num_buckets=4, track_edges=True)
    split = min(split, len(edges))
    for i, chunk in enumerate((edges[:split], edges[split:])):
        if chunk:
            ct.add_pairs(
                spark.createDataFrame(chunk, "id_a long, id_b long"),
                batch_id=f"b{i}",
            )
    removals = {r for r in removals}
    if removals:
        ct.remove_docs(
            spark.createDataFrame([(r,) for r in removals], "doc_id long"),
            batch_id="rm",
        )
    nodes = {n for e in edges for n in e} - removals
    surviving = [
        (a, b) for a, b in edges if a not in removals and b not in removals
    ]
    want = _uf_components(nodes, surviving)
    got = {r["doc_id"]: r["cluster_id"] for r in ct.assignments().collect()}
    assert got == want
