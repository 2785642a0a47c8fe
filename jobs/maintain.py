"""spark-submit entry point: table maintenance.

The operational companion to jobs/replay.py — the periodic job a real
deployment schedules beside the streaming tail (Iceberg ships the same
set as stored procedures: rewrite_data_files, expire_snapshots,
remove_orphan_files). One invocation runs any subset, in the safe
order: compact MOR deltas → purge tombstones → compact the exactly-once
ledger → expire old snapshots → vacuum unreferenced files → archive
fully-applied WAL segments.

Cluster usage:

    spark-submit --py-files dist/engine.zip jobs/maintain.py \
        --table /data/replica \
        [--compact-deltas [--min-deltas 1]] \
        [--purge-tombstones-before-lsn N] \
        [--compact-ledger] \
        [--expire-keep-last K] [--vacuum] \
        [--rebucket N] \
        [--archive-wal /data/wal [--archive-dir /cold/wal]]

Prints ONE JSON line of what each step did. Every step is an
independent transactional commit (or pure file operation) and safe to
RE-RUN. Concurrency contract: run maintenance from a single owner.
Beside a LIVE streaming writer, commit-writing steps (compact-deltas,
purge, compact-ledger, expire, rebucket) ride the same atomic version
claim as merge — losing the race raises ConcurrentCommitError and a
rerun is safe — but --vacuum must NOT run concurrently with an
in-flight merge: vacuum deletes dirs unreferenced by any retained
snapshot, and a merge's data dir is exactly that in the window between
its write and its commit rename. Pause the tail (or schedule vacuum in
its trigger gaps) for the vacuum step; --archive-wal alone is
unconditionally safe (the checkpoint ignores retired files).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.engine import CDCEngine  # noqa: E402
from datax_spark.schema_evolution import EpochRegistry  # noqa: E402
from datax_spark.session import get_spark  # noqa: E402
from datax_spark.table import SnapshotTable  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="table location")
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    ap.add_argument("--compact-deltas", action="store_true",
                    help="fold merge-on-read delta files back into per-bucket bases")
    ap.add_argument("--min-deltas", type=int, default=1,
                    help="only compact buckets holding at least this many delta sets")
    ap.add_argument("--purge-tombstones-before-lsn", type=int, default=None,
                    help="drop delete markers older than this lsn (the source's "
                         "replay low-watermark); only affected buckets rewrite")
    ap.add_argument("--compact-ledger", action="store_true",
                    help="fold the batch-id ledger tail into a fresh compacted summary")
    ap.add_argument("--expire-keep-last", type=int, default=None,
                    help="expire all but the last K snapshots")
    ap.add_argument("--vacuum", action="store_true",
                    help="delete data dirs / ledger files unreferenced by retained snapshots")
    ap.add_argument("--rebucket", type=int, default=None,
                    help="migrate to a new bucket count (growth lever; single writer)")
    ap.add_argument("--archive-wal", default=None,
                    help="WAL dir: retire segments lineage proves fully applied")
    ap.add_argument("--archive-dir", default=None,
                    help="move retired WAL segments here (default: delete)")
    ap.add_argument("--wal-format", default="parquet")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="datax_maintain", cores=args.cores)
    table = SnapshotTable.load(spark, args.table)
    report: dict = {"table": args.table, "version_before": table.current()["version"]}

    if args.compact_deltas:
        ci = table.compact_buckets(min_deltas=args.min_deltas)
        report["compact_deltas"] = {
            # what was ACTUALLY compacted — from the commit record, so
            # min_deltas filtering and the nothing-hot skip report true
            "buckets": [] if ci.skipped
            else table.current()["metrics"].get("compact_buckets", []),
            "skipped": ci.skipped,
            "remaining": table.delta_counts(),
        }
    if args.purge_tombstones_before_lsn is not None:
        ci = table.purge_tombstones(before_lsn=args.purge_tombstones_before_lsn)
        report["purge_tombstones"] = {
            "skipped": ci.skipped,
            "purged_buckets": [] if ci.skipped
            else table.current()["metrics"].get("purged_buckets", []),
        }
    if args.compact_ledger:
        ci = table.compact_ledger()
        report["compact_ledger"] = {"version": ci.version}
    if args.rebucket is not None:
        ci = table.rebucket(args.rebucket)
        report["rebucket"] = {"num_buckets": args.rebucket, "skipped": ci.skipped}
    if args.expire_keep_last is not None:
        expired = table.expire_snapshots(keep_last=args.expire_keep_last)
        report["expire_snapshots"] = {"expired_versions": expired}
    if args.vacuum:
        report["vacuum"] = {"removed": table.vacuum()}
    if args.archive_wal:
        # the engine owns lineage-proof retirement; registry content is
        # irrelevant here (no merge happens), only the table handle is.
        registry = EpochRegistry(
            [{"epoch": 0, "change": "base", "columns": {}}],
            key_cols=table.key_cols,
        )
        engine = CDCEngine(spark, table, registry)
        retired = engine.archive_wal(
            args.archive_wal, archive_dir=args.archive_dir,
            wal_format=args.wal_format,
        )
        report["archive_wal"] = {"retired": retired}

    report["version_after"] = table.current()["version"]
    print(json.dumps(report))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
