"""MinHashIndex: incremental-pairs == full-recompute equivalence (the
round-3 VERDICT's #2 ask), exactly-once adds, deletes, and parameter
persistence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datax_spark.dedup_index import MinHashIndex
from datax_spark.textops import minhash_lsh_pairs

SF = "/root/testdata/sf0.001"


def _pairs_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")


@pytest.fixture(scope="module")
def full_pairs(spark, docs):
    return _pairs_set(minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4))


@pytest.mark.parametrize("n_batches", [1, 3])
def test_incremental_equals_full_recompute(spark, docs, full_pairs, tmp_path, n_batches):
    """Union of per-batch pairs over ANY split == one-shot recompute,
    exactly — the invariant that makes the incremental path a drop-in
    for the full one."""
    idx = MinHashIndex.create(
        spark, str(tmp_path / f"idx{n_batches}"), n_bands=4, k=8, stride=4
    )
    got = set()
    for b in range(n_batches):
        batch = docs.filter(F.col("doc_id") % n_batches == b)
        got |= _pairs_set(idx.add_batch(batch, batch_id=f"b{b}"))
    assert got == full_pairs
    assert idx.doc_count() == docs.count()


def test_split_shape_is_irrelevant(spark, docs, full_pairs, tmp_path):
    """A different batch boundary (contiguous halves instead of mod)
    yields the same union — batch order/shape cannot matter."""
    idx = MinHashIndex.create(spark, str(tmp_path / "idx2"), n_bands=4, k=8, stride=4)
    mid = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    got = _pairs_set(idx.add_batch(docs.filter(F.col("doc_id") <= mid), batch_id="lo"))
    got |= _pairs_set(idx.add_batch(docs.filter(F.col("doc_id") > mid), batch_id="hi"))
    assert got == full_pairs


def test_exactly_once_replay(spark, docs, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "idx3"), n_bands=4, k=8, stride=4)
    batch = docs.limit(50)
    idx.add_batch(batch, batch_id="b0")
    n = idx.doc_count()
    v = idx.table.current()["version"]
    # replayed micro-batch: merge is a ledger no-op, index unchanged
    idx.add_batch(batch, batch_id="b0")
    assert idx.doc_count() == n
    assert idx.table.current()["version"] == v


def test_signature_replacement_on_reingest(spark, tmp_path):
    """Editing a doc's content replaces its signature (LWW) — the next
    batch matches the NEW text, not the old."""
    idx = MinHashIndex.create(spark, str(tmp_path / "idx4"), n_bands=4, k=8, stride=4)
    t1 = "the quick brown fox jumps over the lazy dog " * 3
    t2 = "completely different content with no shared shingles at all " * 3
    idx.add_batch(spark.createDataFrame([(1, t1)], "doc_id long, text string"), "b0")
    idx.add_batch(spark.createDataFrame([(1, t2)], "doc_id long, text string"), "b1")
    # near-dup of the ORIGINAL text must no longer match doc 1
    p = idx.add_batch(
        spark.createDataFrame([(2, t1 + "tail")], "doc_id long, text string"), "b2"
    )
    assert _pairs_set(p) == set()
    # near-dup of the CURRENT text does
    p2 = idx.add_batch(
        spark.createDataFrame([(3, t2 + "tail")], "doc_id long, text string"), "b3"
    )
    assert _pairs_set(p2) == {(1, 3)}


def test_remove_docs_stops_matching(spark, tmp_path):
    idx = MinHashIndex.create(spark, str(tmp_path / "idx5"), n_bands=4, k=8, stride=4)
    t = "some document text that will be retired from the corpus " * 3
    idx.add_batch(spark.createDataFrame([(7, t)], "doc_id long, text string"), "b0")
    idx.remove_docs(spark.createDataFrame([(7,)], "doc_id long"), batch_id="rm0")
    assert idx.doc_count() == 0
    p = idx.add_batch(
        spark.createDataFrame([(8, t + "x")], "doc_id long, text string"), "b1"
    )
    assert _pairs_set(p) == set()


def test_load_restores_parameters(spark, docs, tmp_path):
    loc = str(tmp_path / "idx6")
    MinHashIndex.create(spark, loc, n_bands=3, k=6, stride=2)
    idx = MinHashIndex.load(spark, loc)
    assert (idx.n_bands, idx.k, idx.stride) == (3, 6, 2)
    with pytest.raises(ValueError, match="not a MinHashIndex"):
        from datax_spark.table import SnapshotTable
        from pyspark.sql import types as T

        plain = str(tmp_path / "plain")
        SnapshotTable.create(
            spark, plain,
            T.StructType([T.StructField("doc_id", T.LongType(), False)]),
            key_cols=["doc_id"],
        )
        MinHashIndex.load(spark, plain)
