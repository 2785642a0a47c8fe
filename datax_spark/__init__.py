"""datax_spark — a brand-new PySpark-native CDC / incremental-ingest engine.

Re-imagines the reference DataX's reader→channel→writer job model
(see SURVEY.md §1-§3, upstream paths cited there) as:

    WAL/binlog tail (Structured Streaming file source)
      → vectorized transform (pandas/Arrow UDFs, no per-row Python)
      → within-batch last-writer-wins dedup (window by lsn)
      → idempotent MERGE into a transactional snapshot table
        (Iceberg on real clusters; SnapshotParquetBackend in-sandbox)
      → atomic commit carrying batch-id ledger + per-partition lineage

Everything here is built on the public Apache Spark DataFrame/SQL API.
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API (`from datax_spark import CDCEngine`) —
    resolved on first access so importing the package for metadata
    never pays the pyspark import."""
    _API = {
        "CDCEngine": ("datax_spark.engine", "CDCEngine"),
        "SnapshotTable": ("datax_spark.table", "SnapshotTable"),
        "IcebergTable": ("datax_spark.iceberg", "IcebergTable"),
        "EpochRegistry": ("datax_spark.schema_evolution", "EpochRegistry"),
        "run_job": ("datax_spark.job", "run_job"),
        "sync_derived": ("datax_spark.derived", "sync_derived"),
        "get_spark": ("datax_spark.session", "get_spark"),
    }
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(f"module 'datax_spark' has no attribute {name!r}")
