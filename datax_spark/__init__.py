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
