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


def test_audit_idle_timeout_evicts_state(spark, tmp_path):
    """With idle_timeout set, a key idle past the duration is evicted
    (final totals emitted, state removed) — if it reappears later its
    audit RESTARTS instead of continuing, proving the state store no
    longer holds it. This is the unbounded-keyspace guard: NoTimeout
    state grows monotonically forever on an open key domain."""
    import time

    b1 = pd.DataFrame({"user_id": [9, 9], "event_id": [1, 2]})
    b2 = pd.DataFrame({"user_id": [1], "event_id": [100]})   # advances proc time
    b3 = pd.DataFrame({"user_id": [9], "event_id": [3]})     # 9 reappears
    src = tmp_path / "wal"
    src.mkdir()
    for i, b in enumerate((b1, b2, b3)):
        b.to_parquet(src / f"seg_{i:04d}.parquet", index=False)

    schema = "user_id long, event_id long"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    audited = stateful_lsn_audit(
        stream, key_col="user_id", lsn_col="event_id", idle_timeout_ms=1
    )
    # Processing-time timers only fire on a RUNNING clock-triggered
    # stream: under availableNow Spark keeps scheduling empty batches
    # while timers exist and the drain never terminates (measured here
    # — 50+ empty batches). So the TTL path runs with a processingTime
    # trigger and an explicit stop; availableNow replays keep the
    # NoTimeout default (see the twin test below).
    q = (
        audited.writeStream.format("memory")
        .queryName("audit_ttl_test")
        .outputMode("update")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 90
        while time.monotonic() < deadline:
            rows = spark.table("audit_ttl_test").filter("user_id = 9").collect()
            if any((r["n_events"], r["max_lsn"]) == (1, 3) for r in rows):
                break
            time.sleep(1)
    finally:
        q.stop()

    rows9 = sorted(
        [tuple(r) for r in spark.table("audit_ttl_test").filter("user_id = 9")
         .select("n_events", "max_lsn", "n_gaps").collect()]
    )
    # batch1 update (2 events), eviction emit (same totals), fresh
    # restart after reappearance (1 event, NO gap counted across the
    # eviction — restart is indistinguishable from first sight)
    assert (1, 3, 0) in rows9, f"key 9 must restart fresh after eviction: {rows9}"
    assert rows9.count((2, 2, 0)) >= 2, f"eviction must emit final totals: {rows9}"


def test_watermark_drops_late_rows(spark, tmp_path):
    """§2.9 semantics pin, with the SUBTLETY measured here: the
    watermark is a STATE-EVICTION bound, not an input filter — a late
    row is guaranteed dropped only once its window's state has been
    evicted, and eviction lags the watermark by a batch (a late row
    arriving one batch after its window closed, before eviction ran,
    is still aggregated; observed directly). So the guaranteed
    contract is: after an intermediate batch evicts + finalizes the
    window, a later late row is dropped and the window is NEVER
    re-emitted. That bounded-state guarantee (plus the bounded
    too-late acceptance window) is what makes infinite-stream
    aggregation viable."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F

    t0 = pd.Timestamp("2026-01-01 00:00:00")
    b0 = pd.DataFrame({
        "user_id": [1, 1, 1],
        "ts": [t0, t0 + pd.Timedelta(minutes=5), t0 + pd.Timedelta(hours=3)],
    })
    b1 = pd.DataFrame({
        # advances the watermark AND triggers eviction+emission of the
        # [00:00, 01:00) window (count 2) at batch end
        "user_id": [1],
        "ts": [t0 + pd.Timedelta(hours=6)],
    })
    b2 = pd.DataFrame({
        # 00:10 is late AND its window's state is already evicted →
        # guaranteed drop; 09:00 keeps the stream advancing
        "user_id": [1, 1],
        "ts": [t0 + pd.Timedelta(minutes=10), t0 + pd.Timedelta(hours=9)],
    })

    src = tmp_path / "wal"
    src.mkdir()
    for i, b in enumerate((b0, b1, b2)):
        # micros, not pandas' default nanos — Spark's vectorized parquet
        # reader rejects NANOS-typed INT64 for timestamp columns
        p = src / f"seg_{i:04d}.parquet"
        b.to_parquet(p, index=False,
                     coerce_timestamps="us", allow_truncated_timestamps=True)
        # distinct mtimes pin arrival order (equal mtimes let the file
        # source group/order arbitrarily — see the out-of-order tests)
        os.utime(p, (1_600_000_000 + i * 60, 1_600_000_000 + i * 60))

    stream = (
        # read as NTZ and cast (the session is pinned UTC so the
        # instant is unchanged)
        spark.readStream.schema("user_id long, ts timestamp_ntz")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("w0"), "n")
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("wm_late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [tuple(r) for r in spark.table("wm_late_test").collect()]
    first = [r for r in rows if r[0] == "2026-01-01 00:00"]
    # finalized ONCE with its 2 on-time events; the evicted-window late
    # row neither re-opens nor re-emits it
    assert first == [("2026-01-01 00:00", 2)], rows


def test_audit_no_timeout_unchanged(spark, tmp_path):
    """Default (no idle_timeout) keeps NoTimeout semantics: the same
    reappearing key CONTINUES its audit (3 events, gap 2→3 not
    counted as gap since 3 = 2+1)."""
    b1 = pd.DataFrame({"user_id": [9, 9], "event_id": [1, 2]})
    b2 = pd.DataFrame({"user_id": [1], "event_id": [100]})
    b3 = pd.DataFrame({"user_id": [9], "event_id": [3]})
    src = tmp_path / "wal"
    src.mkdir()
    for i, b in enumerate((b1, b2, b3)):
        b.to_parquet(src / f"seg_{i:04d}.parquet", index=False)

    stream = (
        spark.readStream.schema("user_id long, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        stateful_lsn_audit(stream, key_col="user_id", lsn_col="event_id")
        .writeStream.format("memory")
        .queryName("audit_nottl_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows9 = [tuple(r) for r in spark.table("audit_nottl_test").filter("user_id = 9")
             .select("n_events", "max_lsn", "n_gaps").collect()]
    assert (3, 3, 0) in rows9, f"state must persist without timeout: {rows9}"
