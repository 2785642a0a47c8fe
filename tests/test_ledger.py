"""Exactly-once ledger at long-running-table scale.

Round-4 defect (VERDICT r4): the batch-id ledger was serialized
CUMULATIVELY into every commit record — O(batches²) metadata over a
table's life. The r5 design carries a bounded `ledger_tail` per commit
plus a pointer to an immutable compacted summary; these tests pin the
properties that make that safe: flat commit-record size over hundreds
of batches, redelivery no-op across compaction + expire + vacuum,
retention/watermark state surviving history pruning, and low-watermark
pruning of retired batch ids.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import functions as F, types as T

from datax_spark.table import SnapshotTable

_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
_DDL = "lsn long, op string, repo string, path string, content string"


def _mk(spark, loc, threshold=16, num_buckets=2) -> SnapshotTable:
    t = SnapshotTable.create(spark, loc, _SCHEMA, key_cols=["repo", "path"], num_buckets=num_buckets)
    t.ledger_compact_threshold = threshold
    return t


def _one_row_batch(spark, lsn, key, val="v"):
    return spark.createDataFrame(
        pd.DataFrame([(lsn, "U", "r", key, f"{val}{lsn}")],
                     columns=["lsn", "op", "repo", "path", "content"]),
        schema=_DDL,
    )


def _commit_size(t: SnapshotTable) -> int:
    v = t._latest_version()
    return os.path.getsize(os.path.join(t.location, "_commits", f"v{v:012d}.json"))


def test_commit_record_size_stays_flat_over_many_batches(spark, tmp_path):
    """~150 committed batches at threshold 16: commit-record byte size
    must NOT grow with batch count (the O(batches²) regression), the
    tail must stay bounded, and the full id set must survive — every
    id still no-ops on redelivery, including pre-compaction ones."""
    t = _mk(spark, str(tmp_path / "t"), threshold=16)
    n = 150
    sizes = []
    for i in range(n):
        t.merge(
            _one_row_batch(spark, i + 1, f"p{i % 5}"),
            batch_id=f"b{i}",
            lineage=[{"source": f"/wal/seg{i}.parquet", "min_lsn": i + 1,
                      "max_lsn": i + 1, "rows": 1}],
        )
        sizes.append(_commit_size(t))
        rec = t.current()
        assert len(rec["ledger_tail"]) <= t.ledger_compact_threshold
        assert "batch_ids" not in rec

    # Size after 150 batches ≈ size after 20 — bounded by the
    # compaction threshold, not the table's age. (Manifest is fixed at
    # 2 buckets, so any growth would be ledger growth.)
    assert sizes[-1] <= sizes[20] * 1.5, (sizes[20], sizes[-1])
    # O(1) reconstruction cost: one base file + bounded tail, never a
    # history walk.
    assert t.committed_batch_ids() == {f"b{i}" for i in range(n)}
    # redelivery of an id long past compaction is still a no-op
    assert t.merge(_one_row_batch(spark, 1, "p0", "stale"), batch_id="b3").skipped
    assert t.merge(_one_row_batch(spark, 1, "p0", "stale"), batch_id=f"b{n-1}").skipped


def test_ledger_survives_expire_and_vacuum(spark, tmp_path):
    """expire_snapshots auto-compacts first, so dropping ALL history
    but the head keeps (a) every batch id no-oping, (b) per-source
    applied-row maxima (WAL retention proofs), (c) the derived-sync
    watermark — all of which previously lived in expired commits."""
    t = _mk(spark, str(tmp_path / "t"), threshold=64)  # no auto-compaction yet
    for i in range(6):
        t.merge(
            _one_row_batch(spark, i + 1, f"p{i}"),
            batch_id=f"b{i}",
            lineage=[{"source": f"/wal/seg{i}.parquet", "min_lsn": i + 1,
                      "max_lsn": i + 1, "rows": 3}],
            metrics={"src_version": i + 10},
        )
    t.expire_snapshots(keep_last=1)
    t.vacuum()
    assert len(t.history()) == 1
    assert t.committed_batch_ids() == {f"b{i}" for i in range(6)}
    s = t.ledger_summary()
    assert s["applied_sources"]["/wal/seg4.parquet"] == 3
    assert s["max_src_version"] == 15
    assert t.merge(_one_row_batch(spark, 1, "p0", "stale"), batch_id="b0").skipped
    # vacuum never removes the live summary file
    live = t.current()["ledger_base"]
    assert live and os.path.exists(os.path.join(t.location, live))


def test_vacuum_reclaims_superseded_summary_files(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), threshold=2)
    for i in range(12):
        t.merge(_one_row_batch(spark, i + 1, "p0"), batch_id=f"b{i}")
    ledger_dir = os.path.join(t.location, "_ledger")
    assert len(os.listdir(ledger_dir)) > 1  # several compactions happened
    t.expire_snapshots(keep_last=1)
    removed = t.vacuum()
    assert any(r.startswith("_ledger/") for r in removed)
    remaining = os.listdir(ledger_dir)
    assert len(remaining) == 1  # exactly the live base survives
    assert t.committed_batch_ids() == {f"b{i}" for i in range(12)}


def test_prune_drops_only_requested_ids(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), threshold=4)
    for i in range(8):
        t.merge(_one_row_batch(spark, i + 1, "p0"), batch_id=f"b{i}")
    t.compact_ledger(prune={"b0", "b1", "b2"})
    assert t.committed_batch_ids() == {f"b{i}" for i in range(3, 8)}
    # a pruned id re-applies (by design: only prune ids whose source
    # can never redeliver) — and LWW makes the stale content harmless
    ci = t.merge(_one_row_batch(spark, 1, "p0", "stale"), batch_id="b0")
    assert not ci.skipped
    assert t.snapshot().filter(F.col("path") == "p0").first()["content"] == "v8"


def test_legacy_cumulative_format_migrates_in_place(spark, tmp_path):
    """A pre-r5 table (cumulative `batch_ids` in each commit) must keep
    exactly-once semantics as-is and convert to the compacted format on
    its first new merge past the threshold."""
    t = _mk(spark, str(tmp_path / "t"), threshold=3)
    t.merge(_one_row_batch(spark, 1, "p0"), batch_id="new0")
    # rewrite the head commit into the legacy format
    v = t._latest_version()
    cpath = os.path.join(t.location, "_commits", f"v{v:012d}.json")
    with open(cpath) as f:
        rec = json.load(f)
    rec.pop("ledger_base"), rec.pop("ledger_tail")
    rec["batch_ids"] = ["old0", "old1", "old2", "new0"]
    os.unlink(cpath)
    with open(cpath, "w") as f:
        json.dump(rec, f)

    t2 = SnapshotTable.load(spark, t.location)
    t2.ledger_compact_threshold = 3
    assert t2.committed_batch_ids() == {"old0", "old1", "old2", "new0"}
    assert t2.merge(_one_row_batch(spark, 1, "p0", "x"), batch_id="old1").skipped
    # first new merge crosses the threshold → compacts to new format
    t2.merge(_one_row_batch(spark, 2, "p0"), batch_id="new1")
    rec2 = t2.current()
    assert rec2["ledger_base"] is not None and rec2["ledger_tail"] == []
    assert "batch_ids" not in rec2
    assert t2.committed_batch_ids() == {"old0", "old1", "old2", "new0", "new1"}


def test_engine_prunes_ids_of_archived_wal_segments(spark, tmp_path, wal_fixture):
    """archive_wal retires fully-applied segments; prune_ledger then
    drops exactly those segments' batch ids (past the replay
    low-watermark — the stream can never redeliver a deleted file),
    while ids with live or pseudo sources stay."""
    import shutil

    from datax_spark.engine import CDCEngine
    from datax_spark.schema_evolution import EpochRegistry

    wal_dir = str(tmp_path / "wal")
    shutil.copytree(wal_fixture.wal_dir, wal_dir)
    reg = EpochRegistry.from_json(wal_fixture.schema_epochs_path)
    t = SnapshotTable.create(
        spark, str(tmp_path / "t"), reg.schema_for(0), key_cols=reg.key_cols, num_buckets=4
    )
    engine = CDCEngine(spark, t, reg)
    segs = sorted(
        os.path.join(wal_dir, f) for f in os.listdir(wal_dir) if f.endswith(".parquet")
    )
    for i, seg in enumerate(segs):
        engine.apply_batch(
            spark.read.parquet(seg).withColumn("_source_file", F.lit(seg)),
            batch_id=f"seg-{i}",
        )
    engine.bootstrap(
        spark.createDataFrame([("zz-seed", "zz-seed")], "repo string, path string"),
        snapshot_lsn=0, batch_id="boot",
    )

    # retire the first two segments only
    archive = str(tmp_path / "cold")
    os.makedirs(archive)
    for seg in segs[:2]:
        shutil.move(seg, os.path.join(archive, os.path.basename(seg)))
    assert engine.prunable_batch_ids() == {"seg-0", "seg-1"}
    assert engine.prune_ledger() == 2
    ids = t.committed_batch_ids()
    assert "seg-0" not in ids and "seg-1" not in ids
    assert {f"seg-{i}" for i in range(2, len(segs))} <= ids
    assert "boot" in ids  # pseudo-source batches are never pruned
    # idempotent: nothing more to prune
    assert engine.prune_ledger() == 0
