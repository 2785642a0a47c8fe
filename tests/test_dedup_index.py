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


def test_same_batch_reingest_never_pairs_against_stale_signature(spark, tmp_path):
    """A batch that BOTH re-ingests doc 1 with new content AND adds a
    doc 2 similar to doc 1's OLD content must not emit (1, 2): the
    stored signature is superseded by the in-batch one (LWW), so the
    index side is anti-joined before pairing — a pair a full recompute
    of the current contents would never produce."""
    idx = MinHashIndex.create(spark, str(tmp_path / "idx6"), n_bands=4, k=8, stride=4)
    t_old = "the quick brown fox jumps over the lazy dog " * 3
    t_new = "completely different content with no shared shingles at all " * 3
    idx.add_batch(spark.createDataFrame([(1, t_old)], "doc_id long, text string"), "b0")
    p = idx.add_batch(
        spark.createDataFrame(
            [(1, t_new), (2, t_old + "tail")], "doc_id long, text string"
        ),
        "b1",
    )
    assert _pairs_set(p) == set()  # (1,2) would be a stale-signature pair
    # and the CURRENT content is what the index now matches
    p2 = idx.add_batch(
        spark.createDataFrame([(3, t_new + "tail")], "doc_id long, text string"), "b2"
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


# ---------------------------------------------------- EmbeddingLSHIndex


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id", "embedding")


def _scored_set(df):
    return {(r["id_a"], r["id_b"], r["cosine"]) for r in df.collect()}


def test_embedding_incremental_equals_full(spark, emb, tmp_path):
    """Union of per-batch scored pairs == one-shot
    lsh_cosine_dedup_pairs at the same pinned plane parameters."""
    from datax_spark.dedup_index import EmbeddingLSHIndex
    from datax_spark.simsearch import lsh_cosine_dedup_pairs

    full = _scored_set(
        lsh_cosine_dedup_pairs(emb, threshold=0.4, n_bands=4, planes_per_band=4)
    )
    idx = EmbeddingLSHIndex.create(
        spark, str(tmp_path / "eidx"), n_bands=4, planes_per_band=4
    )
    got = set()
    for b in range(3):
        batch = emb.filter(F.col("vec_id") % 3 == b)
        got |= _scored_set(idx.add_batch(batch, batch_id=f"b{b}", threshold=0.4))
    assert got == full
    assert idx.doc_count() == emb.count()


def test_embedding_index_exactly_once_and_load(spark, emb, tmp_path):
    from datax_spark.dedup_index import EmbeddingLSHIndex

    loc = str(tmp_path / "eidx2")
    idx = EmbeddingLSHIndex.create(spark, loc, n_bands=3, planes_per_band=5)
    batch = emb.limit(40)
    idx.add_batch(batch, batch_id="b0")
    v = idx.table.current()["version"]
    idx.add_batch(batch, batch_id="b0")  # replay → ledger no-op
    assert idx.table.current()["version"] == v
    re = EmbeddingLSHIndex.load(spark, loc)
    assert (re.n_bands, re.planes_per_band, re.n_dims) == (3, 5, 64)


# --------------------------------------------------------- ClusterTable


def _assign(ct):
    return {r["doc_id"]: r["cluster_id"] for r in ct.assignments().collect()}


def test_cluster_table_merges_components_across_batches(spark, tmp_path):
    """A later edge joining two existing clusters must relabel EVERY
    member of both to the new global min."""
    from datax_spark.dedup_index import ClusterTable

    ct = ClusterTable.create(spark, str(tmp_path / "ct"))
    mk = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")
    ct.add_pairs(mk([(1, 2), (2, 5)]), batch_id="b0")
    ct.add_pairs(mk([(3, 4)]), batch_id="b1")
    assert _assign(ct) == {1: 1, 2: 1, 5: 1, 3: 3, 4: 3}
    ct.add_pairs(mk([(5, 4)]), batch_id="b2")  # bridges the two clusters
    assert _assign(ct) == {1: 1, 2: 1, 5: 1, 3: 1, 4: 1}
    # exactly-once: replaying the bridge batch is a no-op
    v = ct.table.current()["version"]
    ct.add_pairs(mk([(5, 4)]), batch_id="b2")
    assert ct.table.current()["version"] == v


def test_cluster_table_equals_full_clustering(spark, docs, tmp_path):
    """End-to-end incremental pipeline: MinHashIndex batches feed
    ClusterTable folds; the final assignment equals one-shot
    connected_components over the full corpus's pairs."""
    from datax_spark.dedup_index import ClusterTable, MinHashIndex
    from datax_spark.graph import connected_components

    expected = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4)
        ).collect()
    }
    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_bands=4, k=8, stride=4)
    ct = ClusterTable.create(spark, str(tmp_path / "cl"))
    for b in range(3):
        pairs = idx.add_batch(docs.filter(F.col("doc_id") % 3 == b), batch_id=f"b{b}")
        ct.add_pairs(pairs, batch_id=f"b{b}")
    assert _assign(ct) == expected


# -------------------------------------------------------- streaming drive


def test_streaming_dedup_pipeline_with_restart(spark, docs, tmp_path):
    """Streaming front-end: documents land as files, each micro-batch
    feeds index + cluster table. Kill after the first batches, restart
    from the checkpoint — no double-pairs, no missed docs; the final
    cluster table equals the one-shot clustering."""
    import os
    import time

    from datax_spark.dedup_index import ClusterTable, MinHashIndex, run_dedup_stream
    from datax_spark.graph import connected_components

    expected = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4)
        ).collect()
    }
    src = str(tmp_path / "docs_src")
    docs.repartition(4).write.parquet(src)

    idx = MinHashIndex.create(spark, str(tmp_path / "smh"), n_bands=4, k=8, stride=4)
    ct = ClusterTable.create(spark, str(tmp_path / "scl"))
    ckpt = str(tmp_path / "sckpt")

    # first run: availableNow drain, killed after 2 micro-batches
    q = run_dedup_stream(spark, src, ckpt, idx, ct, max_files_per_trigger=1)
    while q.isActive:
        if len(idx.table.committed_batch_ids()) >= 2:
            q.stop()
            break
        time.sleep(0.05)
    q.awaitTermination()
    assert len(idx.table.committed_batch_ids()) < 4  # genuinely interrupted

    # restart with the same checkpoint: resumes, applies only the rest
    q2 = run_dedup_stream(spark, src, ckpt, idx, ct, max_files_per_trigger=1)
    q2.awaitTermination()
    got = {r["doc_id"]: r["cluster_id"] for r in ct.assignments().collect()}
    assert got == expected
    assert idx.doc_count() == docs.count()
    # third run: nothing new → no additional commits
    v_idx, v_ct = idx.table.current()["version"], ct.table.current()["version"]
    q3 = run_dedup_stream(spark, src, ckpt, idx, ct, max_files_per_trigger=1)
    q3.awaitTermination()
    assert idx.table.current()["version"] == v_idx
    assert ct.table.current()["version"] == v_ct


# ------------------------------------------------------- doc removal


def _ids(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "doc_id long")


def test_cluster_remove_splits_and_relabels(spark, tmp_path):
    """Removing a bridge doc splits its cluster; removing the minimum
    member relabels survivors to the new min; replays are no-ops."""
    from datax_spark.dedup_index import ClusterTable

    ct = ClusterTable.create(spark, str(tmp_path / "ct"), track_edges=True)
    mk = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")
    ct.add_pairs(mk([(1, 2), (2, 3), (5, 6)]), batch_id="b0")
    assert _assign(ct) == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5}

    ct.remove_docs(_ids(spark, [2]), batch_id="r0")  # bridge → split
    assert _assign(ct) == {1: 1, 3: 3, 5: 5, 6: 5}
    v_t, v_e = ct.table.current()["version"], ct.edges.current()["version"]
    ct.remove_docs(_ids(spark, [2]), batch_id="r0")  # replay → no-op
    assert ct.table.current()["version"] == v_t
    assert ct.edges.current()["version"] == v_e

    ct.remove_docs(_ids(spark, [5]), batch_id="r1")  # min member → relabel
    assert _assign(ct) == {1: 1, 3: 3, 6: 6}


def test_cluster_remove_keeps_cycle_connected(spark, tmp_path):
    """A removal inside a cycle must NOT split the component — the
    surviving edges still connect it."""
    from datax_spark.dedup_index import ClusterTable

    ct = ClusterTable.create(spark, str(tmp_path / "ct"), track_edges=True)
    mk = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")
    ct.add_pairs(mk([(1, 2), (2, 3), (3, 4), (1, 4)]), batch_id="b0")
    ct.remove_docs(_ids(spark, [2]), batch_id="r0")
    assert _assign(ct) == {1: 1, 3: 1, 4: 1}


def test_cluster_remove_requires_edge_tracking(spark, tmp_path):
    from datax_spark.dedup_index import ClusterTable

    ct = ClusterTable.create(spark, str(tmp_path / "ct_plain"))
    with pytest.raises(ValueError, match="track_edges"):
        ct.remove_docs(_ids(spark, [1]))


def test_cluster_remove_equals_one_shot(spark, docs, tmp_path):
    """Pipeline equivalence under removal: incremental add + remove
    equals one-shot clustering of the surviving pair set; survivors
    stranded without edges stay as explicit singletons."""
    from datax_spark.dedup_index import ClusterTable, MinHashIndex
    from datax_spark.graph import connected_components

    idx = MinHashIndex.create(spark, str(tmp_path / "mh"), n_bands=4, k=8, stride=4)
    ct = ClusterTable.create(spark, str(tmp_path / "cl"), track_edges=True)
    for b in range(2):
        pairs = idx.add_batch(docs.filter(F.col("doc_id") % 2 == b), batch_id=f"b{b}")
        ct.add_pairs(pairs, batch_id=f"b{b}")

    clustered = sorted({r["doc_id"] for r in ct.assignments().collect()})
    removed = set(clustered[::5])  # every 5th clustered doc
    idx.remove_docs(_ids(spark, sorted(removed)), batch_id="rm")
    ct.remove_docs(_ids(spark, sorted(removed)), batch_id="rm")

    full = minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4)
    surviving = full.filter(
        ~F.col("id_a").isin(removed) & ~F.col("id_b").isin(removed)
    )
    expected = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(surviving).collect()
    }
    got = _assign(ct)
    assert removed.isdisjoint(got)
    assert {k: v for k, v in got.items() if k in expected} == expected
    # every extra row is a stranded survivor, self-labeled
    extras = {k: v for k, v in got.items() if k not in expected}
    assert all(k == v for k, v in extras.items())
    assert set(extras).issubset(set(clustered) - removed)
    # future batches no longer match removed docs' signatures
    assert idx.signatures().filter(F.col("doc_id").isin(removed)).count() == 0


def test_cluster_load_restores_edge_table(spark, tmp_path):
    from datax_spark.dedup_index import ClusterTable

    loc = str(tmp_path / "ct")
    ct = ClusterTable.create(spark, loc, track_edges=True)
    mk = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")
    ct.add_pairs(mk([(1, 2)]), batch_id="b0")
    re = ClusterTable.load(spark, loc)
    assert re.edges is not None
    re.remove_docs(_ids(spark, [1]), batch_id="r0")
    assert _assign(re) == {2: 2}

    plain = str(tmp_path / "ct_plain")
    ClusterTable.create(spark, plain)
    assert ClusterTable.load(spark, plain).edges is None


def test_streaming_embedding_dedup(spark, emb, tmp_path):
    """run_dedup_stream drives the EmbeddingLSHIndex too: per-file
    micro-batches, union of scored pairs == one-shot LSH pairs."""
    from datax_spark.dedup_index import ClusterTable, EmbeddingLSHIndex, run_dedup_stream
    from datax_spark.simsearch import lsh_cosine_dedup_pairs

    sample = emb.limit(300)
    full = _scored_set(
        lsh_cosine_dedup_pairs(sample, threshold=0.4, n_bands=4, planes_per_band=4)
    )
    src = str(tmp_path / "emb_src")
    sample.repartition(3).write.parquet(src)
    idx = EmbeddingLSHIndex.create(
        spark, str(tmp_path / "eidx"), n_bands=4, planes_per_band=4
    )
    ct = ClusterTable.create(spark, str(tmp_path / "ecl"))
    q = run_dedup_stream(
        spark, src, str(tmp_path / "eckpt"), idx, ct,
        id_col="vec_id", text_col="embedding", threshold=0.4,
    )
    q.awaitTermination()
    assert idx.doc_count() == sample.count()
    # clusters cover exactly the paired ids
    paired = {i for p in full for i in (p[0], p[1])}
    assert {r["doc_id"] for r in ct.assignments().collect()} == paired


def test_embedding_remove_docs(spark, emb, tmp_path):
    from datax_spark.dedup_index import EmbeddingLSHIndex

    idx = EmbeddingLSHIndex.create(spark, str(tmp_path / "eidx3"), n_bands=3, planes_per_band=5)
    idx.add_batch(emb.limit(50), batch_id="b0")
    gone = [r["vec_id"] for r in emb.limit(5).collect()]
    idx.remove_docs(spark.createDataFrame([(v,) for v in gone], "vec_id long"), batch_id="rm")
    assert idx.doc_count() == 45
    assert idx.table.snapshot().filter(F.col("vec_id").isin(gone)).count() == 0


def test_index_survives_snapshot_expiry(spark, docs, tmp_path):
    """Routine maintenance (expire_snapshots + vacuum) prunes the
    commit that carried the parameter record; the params sidecar keeps
    load() working and later batches still pair correctly."""
    import os

    loc = str(tmp_path / "mhexp")
    idx = MinHashIndex.create(spark, loc, n_bands=4, k=8, stride=4)
    half = docs.filter(F.col("doc_id") % 2 == 0)
    got = _pairs_set(idx.add_batch(half, batch_id="b0"))
    idx.table.expire_snapshots(keep_last=1)
    idx.table.vacuum()

    re = MinHashIndex.load(spark, loc)
    assert (re.n_bands, re.k, re.stride) == (4, 8, 4)
    got |= _pairs_set(
        re.add_batch(docs.filter(F.col("doc_id") % 2 == 1), batch_id="b1")
    )
    full = _pairs_set(minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4))
    assert got == full

    # pre-sidecar indexes (no _index.json, history intact) still load
    loc2 = str(tmp_path / "mhlegacy")
    MinHashIndex.create(spark, loc2, n_bands=3, k=6, stride=2)
    os.unlink(os.path.join(loc2, "_index.json"))
    legacy = MinHashIndex.load(spark, loc2)
    assert (legacy.n_bands, legacy.k, legacy.stride) == (3, 6, 2)


def test_cluster_remove_unknown_and_whole_cluster(spark, tmp_path):
    """Removing an id that was never clustered is a harmless no-op on
    assignments; removing every member of a cluster erases it."""
    from datax_spark.dedup_index import ClusterTable

    ct = ClusterTable.create(spark, str(tmp_path / "ct"), track_edges=True)
    mk = lambda rows: spark.createDataFrame(rows, "id_a long, id_b long")
    ct.add_pairs(mk([(1, 2), (7, 8)]), batch_id="b0")
    ct.remove_docs(_ids(spark, [99]), batch_id="r0")
    assert _assign(ct) == {1: 1, 2: 1, 7: 7, 8: 7}
    ct.remove_docs(_ids(spark, [7, 8]), batch_id="r1")
    assert _assign(ct) == {1: 1, 2: 1}
    assert ct.edges.snapshot().count() == 1  # only (1,2) survives


def test_mor_index_equals_full_recompute_and_exactly_once(spark, docs, full_pairs, tmp_path):
    """merge_strategy='mor' on the index (r5): every signature merge
    is an O(batch) delta commit with inline per-hot-bucket compaction,
    and the pair union over any split STILL equals the one-shot
    recompute; redelivery stays a no-op and removal tombstones flow
    through the delta path."""
    idx = MinHashIndex.create(
        spark, str(tmp_path / "idxm"), n_bands=4, k=8, stride=4
    )
    idx.merge_strategy = "mor"
    idx.mor_compact_threshold = 2
    got = set()
    for b in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == b)
        got |= _pairs_set(idx.add_batch(batch, batch_id=f"b{b}"))
    assert got == full_pairs
    assert idx.doc_count() == docs.count()
    # inline compaction bounded the deltas
    assert all(n < 2 for n in idx.table.delta_counts().values())
    # replay no-op through the delta path: no new docs, no new deltas
    n = idx.doc_count()
    deltas_before = idx.table.delta_counts()
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 0), batch_id="b0")
    assert idx.doc_count() == n
    assert idx.table.delta_counts() == deltas_before
    # removal tombstones via deltas: removed docs stop matching
    some = docs.limit(5).select("doc_id")
    idx.remove_docs(some, batch_id="rm")
    left = idx.signatures().join(some, "doc_id", "left_semi").count()
    assert left == 0


def test_streaming_dedup_pipeline_mor(spark, docs, tmp_path):
    """The streaming front-end under merge-on-read indexes: same final
    clusters as the one-shot fold, delta counts bounded by the inline
    compactor, idle re-run commits nothing."""
    from datax_spark.dedup_index import ClusterTable, MinHashIndex, run_dedup_stream
    from datax_spark.graph import connected_components

    expected = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4)
        ).collect()
    }
    src = str(tmp_path / "docs_src_m")
    docs.repartition(4).write.parquet(src)
    idx = MinHashIndex.create(spark, str(tmp_path / "mmh"), n_bands=4, k=8, stride=4)
    ct = ClusterTable.create(spark, str(tmp_path / "mcl"))
    for obj in (idx, ct):
        obj.merge_strategy = "mor"
        obj.mor_compact_threshold = 2
    ckpt = str(tmp_path / "mckpt")
    q = run_dedup_stream(spark, src, ckpt, idx, ct, max_files_per_trigger=1)
    q.awaitTermination()
    got = {r["doc_id"]: r["cluster_id"] for r in ct.assignments().collect()}
    assert got == expected
    assert all(n < 2 for n in idx.table.delta_counts().values())
    assert all(n < 2 for n in ct.table.delta_counts().values())
    v_idx, v_ct = idx.table.current()["version"], ct.table.current()["version"]
    q2 = run_dedup_stream(spark, src, ckpt, idx, ct, max_files_per_trigger=1)
    q2.awaitTermination()
    assert idx.table.current()["version"] == v_idx
    assert ct.table.current()["version"] == v_ct
