"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real surface lives in ``datax_spark.queries`` — one named query +
oracle per operator family from SURVEY.md §2 plus the corpus-curation
extensions (dedup / similarity search / text analysis / multimodal).
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from datax_spark.queries import ORACLES, QUERIES, events_as_changes, load
from datax_spark.engine import CDCEngine
from datax_spark.schema_evolution import EpochRegistry
from datax_spark.table import SnapshotTable

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full STREAMING path end-to-end at sf0.001 —
    events → WAL parquet segments → Structured Streaming tail with
    checkpoint → per-micro-batch idempotent MERGE into the
    transactional SnapshotTable → final replicated state."""
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="datax_entry_")
    wal_dir = os.path.join(work, "wal")
    registry = EpochRegistry(
        [{"epoch": 0, "change": "base",
          "columns": {"commit_id": "string", "lang": "string", "content": "string"}}]
    )
    changes = events_as_changes(load(spark, SF_SMOKE, "events")).withColumn(
        "schema_epoch", F.lit(0)
    )
    # 4 lsn-ordered WAL segments → 2 micro-batches at maxFilesPerTrigger=2.
    changes.repartitionByRange(4, "lsn").write.parquet(wal_dir)
    table = SnapshotTable.create(
        spark, os.path.join(work, "table"), registry.schema_for(0),
        key_cols=registry.key_cols, num_buckets=16,
    )
    engine = CDCEngine(spark, table, registry)
    q = engine.run_stream(
        wal_dir, os.path.join(work, "ckpt"), max_files_per_trigger=2, available_now=True
    )
    q.awaitTermination()
    return table.snapshot().select(
        "repo", "path", "commit_id", "lang", "content",
        F.sha2(F.col("content"), 256).alias("content_sha256"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted for the
    non-SQL-expressible fixture-driven ops → rows-only check)."""
    return dict(ORACLES)
