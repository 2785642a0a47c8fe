"""Endurance + crash-window tests for the streaming engine."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from datax_spark.engine import CDCEngine, wal_checkpoint_run
from datax_spark.fixtures import generate_wal
from datax_spark.schema_evolution import EpochRegistry
from datax_spark.table import SnapshotTable


def test_repeated_kill_resume_until_drained(spark, tmp_path):
    """Kill the stream after every 2 micro-batches, resume from the
    checkpoint, repeat until drained: final state ≡ the batch fold.
    This is the operational profile of a long-running tail that gets
    restarted by its scheduler many times."""
    fx = generate_wal(str(tmp_path), n_keys=300, n_events=6000, n_segments=12)
    reg = EpochRegistry.from_json(fx.schema_epochs_path)
    tloc, ckpt = str(tmp_path / "t"), str(tmp_path / "ckpt")

    prev_version, runs = -1, 0
    while runs < 15:
        runs += 1
        t = wal_checkpoint_run(spark, fx.wal_dir, reg, tloc, ckpt,
                               max_files_per_trigger=2, stop_after_batches=2)
        v = t.current()["version"]
        if v == prev_version:
            break
        prev_version = v
    assert runs >= 3, "fixture must need several kill/resume cycles"

    got = (
        t.snapshot().select("repo", "path", F.sha2(F.col("content"), 256).alias("content_sha256"))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(os.path.join(fx.expected_dir, "final_hashes.parquet"))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)


def test_tombstone_purge_vacuum_cycles_stay_bounded(spark, tmp_path):
    """Long-running maintenance profile: many delete-heavy batches
    interleaved with purge_tombstones + expire_snapshots + vacuum.
    Storage must stay BOUNDED (live data dirs do not accumulate),
    every cycle's end state must match the live-key model, and the
    batch-id ledger must survive every maintenance op — the invariant
    that makes maintenance safe to run under exactly-once delivery."""
    from pyspark.sql import types as T
    from datax_spark.table import TOMBSTONE_COL

    schema = T.StructType([
        T.StructField("repo", T.StringType()), T.StructField("path", T.StringType()),
        T.StructField("content", T.StringType()),
    ])
    loc = str(tmp_path / "tb")
    t = SnapshotTable.create(spark, loc, schema, key_cols=["repo", "path"], num_buckets=4)

    n_keys, lsn = 40, 0
    model: dict[str, str] = {}
    for cycle in range(6):
        rows = []
        for k in range(n_keys):
            lsn += 1
            key = f"p{k}"
            if (k + cycle) % 3 == 0:           # a third of keys deleted
                rows.append((lsn, "D", "r", key, None))
                model.pop(key, None)
            else:
                rows.append((lsn, "U", "r", key, f"v{cycle}-{k}"))
                model[key] = f"v{cycle}-{k}"
        pdf = pd.DataFrame(rows, columns=["lsn", "op", "repo", "path", "content"])
        t.merge(
            spark.createDataFrame(
                pdf, schema="lsn long, op string, repo string, path string, content string"
            ),
            batch_id=f"cycle-{cycle}",
        )
        if cycle % 2 == 1:                     # maintenance every other cycle
            t.purge_tombstones(before_lsn=lsn + 1)
            t.expire_snapshots(keep_last=1)
            t.vacuum()

    got = {r["path"]: r["content"] for r in t.snapshot().collect()}
    assert got == model
    # ledger intact through purge/expire/vacuum → redelivery still no-ops
    assert {f"cycle-{c}" for c in range(6)} <= t.committed_batch_ids()
    ci = t.merge(
        spark.createDataFrame(
            pd.DataFrame([(1, "U", "r", "p0", "stale")],
                         columns=["lsn", "op", "repo", "path", "content"]),
            schema="lsn long, op string, repo string, path string, content string",
        ),
        batch_id="cycle-0",
    )
    assert ci.skipped
    # storage bounded: only the dirs the retained snapshots reference
    data_dirs = os.listdir(os.path.join(loc, "data"))
    assert len(data_dirs) <= 4, data_dirs
    # post-purge tombstone volume bounded to the most recent cycle only
    n_tomb = t.snapshot(include_meta=True).filter(F.col(TOMBSTONE_COL)).count()
    assert n_tomb <= n_keys


def test_crash_between_schema_evolve_and_merge(spark, tmp_path):
    """Epoch walk commits schema changes BEFORE the batch merge; a
    crash in that window leaves an evolved-but-unmerged table. The
    replayed batch must converge (evolution is idempotent per epoch,
    the merge applies on the evolved schema)."""
    from unittest import mock

    fx = generate_wal(str(tmp_path), n_keys=80, n_events=600, n_segments=3,
                      with_schema_evolution=True)
    reg = EpochRegistry.from_json(fx.schema_epochs_path)
    t = SnapshotTable.create(spark, str(tmp_path / "t2"), reg.schema_for(0),
                             key_cols=reg.key_cols, num_buckets=4)
    engine = CDCEngine(spark, t, reg)

    # crash inside merge, AFTER the epoch walk already committed
    with mock.patch.object(SnapshotTable, "merge", side_effect=OSError("crash")):
        with pytest.raises(OSError):
            engine.replay_batch(fx.wal_dir, batch_id="replay")
    assert t.current()["schema_version"] > 0, "evolution committed before the crash"
    assert t.snapshot().count() == 0

    # replay converges: fresh engine (fresh epoch inference), same batch id
    CDCEngine(spark, t, reg).replay_batch(fx.wal_dir, batch_id="replay")
    got = (
        t.snapshot().select("repo", "path", F.sha2(F.col("content"), 256).alias("content_sha256"))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(os.path.join(fx.expected_dir, "final_hashes.parquet"))
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)
