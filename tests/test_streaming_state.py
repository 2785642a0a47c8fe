"""Cross-batch state for the stateful lsn audit: gaps and
re-deliveries that SPAN micro-batch boundaries must be detected, which
only works if group state survives between batches."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from datax_spark.streaming import stateful_lsn_audit


def test_audit_state_spans_batches(spark, tmp_path):
    # key 1: lsns 1,2 | 5,6      → one gap, crossing the batch boundary
    # key 2: lsns 10  | 10,11    → one re-delivery (10 again), no gap
    # key 3: lsns 7   | (none)   → untouched by batch 2
    b1 = pd.DataFrame({"user_id": [1, 1, 2, 3], "event_id": [1, 2, 10, 7]})
    b2 = pd.DataFrame({"user_id": [1, 1, 2, 2], "event_id": [5, 6, 10, 11]})
    src = tmp_path / "wal"
    src.mkdir()
    # file order = arrival order (the engine's WAL convention)
    b1.to_parquet(src / "seg_0000.parquet", index=False)
    b2.to_parquet(src / "seg_0001.parquet", index=False)

    schema = "user_id long, event_id long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    audited = stateful_lsn_audit(stream, key_col="user_id", lsn_col="event_id")
    q = (
        audited.writeStream.format("memory")
        .queryName("audit_state_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    out = spark.table("audit_state_test")
    # last emitted row per key = final running totals
    w = __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy(
        "user_id"
    ).orderBy(F.desc("n_events"), F.desc("max_lsn"), F.desc("n_redelivered"))
    final = {
        r["user_id"]: r
        for r in out.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert final[1]["n_events"] == 4
    assert final[1]["max_lsn"] == 6
    assert final[1]["n_gaps"] == 1          # 2 → 5 across the batch boundary
    assert final[1]["n_redelivered"] == 0
    assert final[2]["n_events"] == 3        # 10 | 10, 11 — every arrival counts
    assert final[2]["n_redelivered"] == 1   # 10 re-delivered in batch 2
    assert final[2]["n_gaps"] == 0
    assert final[3]["n_events"] == 1 and final[3]["n_gaps"] == 0
    assert out.count() >= 4  # at least one update row per key per touching batch
