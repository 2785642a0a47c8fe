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
