import pandas as pd
import pytest
from pyspark.sql import functions as F

from datax_spark import transforms as tx


@pytest.fixture(scope="module")
def df(spark):
    pdf = pd.DataFrame(
        {
            "s": ["hello world", "abc", "", None, "data-x"],
            "num_str": ["42", "7", "oops", None, "-3"],
        }
    )
    return spark.createDataFrame(pdf)


def _col(df, c):
    return [r[0] for r in df.select(c).collect()]


def test_dx_substr(spark, df):
    out = df.withColumn("o", tx.dx_substr("s", 1, 3))
    assert _col(out, "o") == ["ell", "bc", "", None, "ata"]


def test_dx_pad(spark, df):
    out = df.withColumn("l", tx.dx_pad("s", "l", 5, "*")).withColumn(
        "r", tx.dx_pad("s", "r", 5, "*")
    )
    rows = out.select("s", "l", "r").collect()
    assert rows[1]["l"] == "**abc" and rows[1]["r"] == "abc**"
    assert rows[0]["l"] == "hello"  # truncation like reference pad-to-length


def test_dx_replace_overlay(spark, df):
    out = df.withColumn("o", tx.dx_replace("s", 0, 5, "HOWDY"))
    assert _col(out, "o")[0] == "HOWDY world"


def test_dx_filter_drops_matching(spark, df):
    out = tx.dx_filter(df, "s", "like", "%world%")
    vals = _col(out, "s")
    assert "hello world" not in vals
    assert None in vals  # null predicate → record kept (reference behavior)
    out2 = tx.dx_filter(df, "s", "=", "abc")
    assert "abc" not in _col(out2, "s")


def test_dx_cast_and_quarantine(spark, df):
    casted = df.withColumn("n", tx.dx_cast("num_str", "long"))
    ok, bad = tx.quarantine(casted, F.col("n").isNotNull() | F.col("num_str").isNull())
    assert bad.count() == 1 and bad.collect()[0]["num_str"] == "oops"
    assert ok.count() == 4


def test_error_limit(spark):
    tx.ErrorLimit(record=5).check(3, 100)
    with pytest.raises(tx.DirtyDataLimitExceeded):
        tx.ErrorLimit(record=2).check(3, 100)
    with pytest.raises(tx.DirtyDataLimitExceeded):
        tx.ErrorLimit(percentage=0.01).check(3, 100)


def test_derive_lang(spark):
    pdf = pd.DataFrame({"path": ["a/b.py", "x.rs", "y.md", "z.unknown"]})
    out = spark.createDataFrame(pdf).withColumn("lang", tx.derive_lang("path"))
    assert _col(out, "lang") == ["python", "rust", "markdown", None]


def test_vectorized_groovy_escape_hatch(spark, df):
    double_len = tx.vectorized("long", lambda s: s.str.len() * 2)
    out = df.withColumn("o", double_len(F.col("s")))
    assert _col(out, "o")[0] == 22


def test_pipeline_fuses(spark, df):
    p = (
        tx.TransformPipeline()
        .with_column("up", F.upper("s"))
        .with_column("up3", tx.dx_substr("up", 0, 3))
        .transform("drop_null", lambda d: d.filter(F.col("s").isNotNull()))
    )
    out = p.apply(df)
    assert out.count() == 4
    assert _col(out, "up3")[0] == "HEL"
    # whole chain stays in one codegen stage (no Python in the plan)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_map_in_arrow_sha_parity(spark):
    """Arrow-native mapInArrow path must agree with JVM sha2 and the
    pandas-UDF twin on every row (all three §2.10 UDF surfaces)."""
    from pyspark.sql import functions as F
    from datax_spark.transforms import content_sha256, map_in_arrow_sha

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    out = map_in_arrow_sha(docs, "text").withColumn("sha_sql", content_sha256("text"))
    assert out.filter(F.col("sha_arrow") != F.col("sha_sql")).count() == 0
    assert out.count() == docs.count()


def test_word_window_udtf_lateral(spark):
    """UDTF surface (§2.10): the table function fans a row out to one
    row per word window via LATERAL, and agrees with a Python model."""
    from datax_spark.transforms import word_window_udtf

    spark.udtf.register("word_windows", word_window_udtf())
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y")], "id long, text string"
    )
    df.createOrReplaceTempView("udtf_src")
    rows = spark.sql(
        "SELECT id, w.idx, w.chunk FROM udtf_src, "
        "LATERAL word_windows(text, 2) AS w ORDER BY id, idx"
    ).collect()
    got = [(r["id"], r["idx"], r["chunk"]) for r in rows]
    assert got == [
        (1, 0, "a b"), (1, 1, "c d"), (1, 2, "e"),
        (2, 0, "x y"),
    ]


def test_weighted_mean_udaf_grouped(spark):
    """UDAF surface (§2.10): grouped-agg pandas UDF computes the
    weighted mean per group, matching the closed-form expression."""
    from pyspark.sql import functions as F
    from datax_spark.transforms import weighted_mean_udaf

    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 2.0), ("b", 20.0, 0.0)],
        "g string, v double, w double",
    )
    wm = weighted_mean_udaf()
    got = {r["g"]: r["m"] for r in df.groupBy("g").agg(wm("v", "w").alias("m")).collect()}
    assert abs(got["a"] - 2.5) < 1e-12      # (1*1 + 3*3) / 4
    assert abs(got["b"] - 10.0) < 1e-12     # (10*2 + 20*0) / 2
