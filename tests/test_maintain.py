"""jobs/maintain.py — the operational maintenance CLI, driven end to
end on a real table: compact MOR deltas, purge tombstones, compact the
ledger, expire, vacuum, and retire applied WAL segments in one
invocation, content unchanged throughout."""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import types as T

from datax_spark.table import SnapshotTable

_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)
_DDL = "lsn long, op string, repo string, path string, content string"


def _wal_segment(spark, wal_dir, name, rows):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "content"]),
        schema=_DDL,
    )
    df.coalesce(1).write.parquet(os.path.join(wal_dir, "_tmp_" + name))
    # single-file segment with a stable name (the engine keys lineage
    # on the file path)
    tmp = os.path.join(wal_dir, "_tmp_" + name)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.rename(os.path.join(tmp, part), os.path.join(wal_dir, name))
    import shutil

    shutil.rmtree(tmp)


def test_maintain_cli_full_pass(spark, tmp_path, monkeypatch, capsys):
    from datax_spark.engine import CDCEngine
    from datax_spark.schema_evolution import EpochRegistry

    import jobs.maintain as maintain

    # reuse the session-scoped test spark instead of spinning a new one
    monkeypatch.setattr(
        "datax_spark.session.get_spark", lambda **kw: spark
    )
    monkeypatch.setattr(maintain, "get_spark", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    _wal_segment(spark, wal, "segment_0001.parquet",
                 [(i, "U", "r", f"p{i % 7}", f"v{i}") for i in range(1, 15)])
    _wal_segment(spark, wal, "segment_0002.parquet",
                 [(20, "D", "r", "p1", None), (21, "U", "r", "p2", "v21")])

    loc = str(tmp_path / "t")
    t = SnapshotTable.create(spark, loc, _SCHEMA, key_cols=["repo", "path"], num_buckets=4)
    reg = EpochRegistry([{"epoch": 0, "change": "base", "columns": {"content": "string"}}])
    eng = CDCEngine(spark, t, reg, merge_strategy="mor", mor_compact_threshold=100)
    eng.replay_batch(wal)
    assert t.delta_counts()  # live deltas for the CLI to compact
    state = sorted(
        (r["repo"], r["path"], r["content"]) for r in t.snapshot().collect()
    )

    rc = maintain.main([
        "--table", loc,
        "--compact-deltas",
        "--purge-tombstones-before-lsn", "100",
        "--compact-ledger",
        "--expire-keep-last", "1",
        "--vacuum",
        "--archive-wal", wal,
        "--archive-dir", str(tmp_path / "cold"),
    ])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["compact_deltas"]["skipped"] is False
    assert report["compact_deltas"]["remaining"] == {}
    assert report["purge_tombstones"]["skipped"] is False
    assert report["expire_snapshots"]["expired_versions"]
    assert report["vacuum"]["removed"]
    # the batch replay applied the whole WAL as one batch whose lineage
    # covers both segments fully — both retire to cold storage
    assert len(report["archive_wal"]["retired"]) == 2
    assert sorted(os.listdir(str(tmp_path / "cold"))) == [
        "segment_0001.parquet", "segment_0002.parquet"
    ]

    t2 = SnapshotTable.load(spark, loc)
    assert t2.delta_counts() == {}
    assert t2.snapshot(include_meta=True).filter("_tombstone").count() == 0
    got = sorted(
        (r["repo"], r["path"], r["content"]) for r in t2.snapshot().collect()
    )
    assert got == state
    # exactly-once survived every maintenance step: the replay batch id
    # still no-ops
    assert "replay" in t2.committed_batch_ids()
