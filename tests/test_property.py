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
