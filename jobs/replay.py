"""spark-submit entry point: WAL → table replay.

Cluster usage (the north rule's deployment shape):

    zip -r dist/engine.zip datax_spark
    spark-submit --py-files dist/engine.zip jobs/replay.py \
        --wal /data/wal --table /data/replica --checkpoint /data/ckpt \
        [--epochs /data/wal/schema_epochs.json] [--buckets 256] \
        [--max-files-per-trigger 16] [--follow]

Local smoke (this sandbox):

    python jobs/replay.py --demo

The driver process stays thin: build the session, start the stream,
await. All heavy lifting is the engine's foreachBatch apply loop.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.engine import CDCEngine  # noqa: E402
from datax_spark.metrics import MetricsLog  # noqa: E402
from datax_spark.schema_evolution import EpochRegistry  # noqa: E402
from datax_spark.session import get_spark  # noqa: E402
from datax_spark.table import SnapshotTable  # noqa: E402

DEFAULT_EPOCHS = [
    {"epoch": 0, "change": "base",
     "columns": {"commit": "string", "lang": "string", "content": "string"}}
]


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", help="WAL directory of parquet change-event segments")
    ap.add_argument("--table", help="target table location")
    ap.add_argument("--checkpoint", help="streaming checkpoint dir")
    ap.add_argument("--epochs", help="schema_epochs.json path (default: single base epoch)")
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    ap.add_argument("--follow", action="store_true",
                    help="keep tailing instead of draining once (availableNow)")
    ap.add_argument("--metrics", help="append per-batch metrics JSONL here")
    ap.add_argument("--demo", action="store_true",
                    help="run a self-contained fixture replay in a temp dir")
    args = ap.parse_args(argv)

    spark = get_spark(app_name="datax-replay")

    if args.demo:
        import tempfile

        from datax_spark.fixtures import generate_wal

        work = tempfile.mkdtemp(prefix="replay_demo_")
        fx = generate_wal(work, n_keys=120, n_events=900, n_segments=6)
        args.wal = fx.wal_dir
        args.table = os.path.join(work, "table")
        args.checkpoint = os.path.join(work, "ckpt")
        args.epochs = fx.schema_epochs_path
    elif not (args.wal and args.table and args.checkpoint):
        ap.error("--wal, --table and --checkpoint are required (or --demo)")

    registry = (
        EpochRegistry.from_json(args.epochs) if args.epochs else EpochRegistry(DEFAULT_EPOCHS)
    )
    if os.path.isdir(os.path.join(args.table, "_commits")):
        table = SnapshotTable.load(spark, args.table)
    else:
        table = SnapshotTable.create(
            spark, args.table, registry.schema_for(0),
            key_cols=registry.key_cols, num_buckets=args.buckets,
        )
    engine = CDCEngine(spark, table, registry)
    log = MetricsLog(args.metrics)

    def on_batch(ci, epoch_id):
        m = dict(getattr(engine, "_last_metrics", {}))
        rec = {"epoch_id": epoch_id, "version": ci.version,
               "snapshot_id": ci.snapshot_id, "skipped": ci.skipped, **m}
        log.emit(rec)
        print(f"batch {epoch_id}: {json.dumps(rec)}", file=sys.stderr)

    q = engine.run_stream(
        args.wal, args.checkpoint,
        max_files_per_trigger=args.max_files_per_trigger,
        available_now=not args.follow,
        on_batch=on_batch,
    )
    q.awaitTermination()
    final = table.snapshot().count()
    print(json.dumps({"table": args.table, "rows": final,
                      "version": table.current()["version"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
