"""Re-measure the r03→r04 same-direction drift cluster (VERDICT r4 #5).

Protocol = round 4 item-3's: best-of-3 walls per query at sf0.1 on
local[32], with the bench calibration job run in the SAME window so the
readings are normalizable against the r03/r04 BENCH calibrations, plus
a formatted-plan capture for the batch queries (streaming queries run a
real micro-batch pipeline; their terminal batch read's plan is not the
interesting object, so they are wall-only).

Prints one JSON object to stdout; intended to be pasted into
ROUND5_NOTES.md as evidence.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuse _get_spark + run_calibration)
from datax_spark.queries import DEMOTED_QUERIES, QUERIES  # noqa: E402

DRIFT = [
    "schema_evolution_replay",
    "cdc_time_travel",
    "text_word_bigrams",
    "stream_session_counts",
    "stream_dedup_exactly_once",
    "stream_windowed_counts",
    "multimodal_frame_sample",
    "multimodal_decode_meta",
]
PLAN_QUERIES = {"text_word_bigrams", "multimodal_frame_sample",
                "multimodal_decode_meta"}
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    all_q = {**QUERIES, **DEMOTED_QUERIES}
    spark = bench._get_spark(bench.CPUS)
    # Same warmups bench uses so run 1 isn't charged session fixed cost.
    from pyspark.sql import functions as F

    spark.range(1000).groupBy(F.col("id") % 7).count().write.format(
        "noop").mode("overwrite").save()
    warm_udf = F.pandas_udf("long")(lambda s: s)
    spark.range(1000).select(warm_udf("id").alias("x")).write.format(
        "noop").mode("overwrite").save()

    calibration = bench.run_calibration(spark)
    out: dict = {"sf_dir": SF_DIR, "calibration": calibration, "queries": {}}
    plans: dict[str, str] = {}
    for name in DRIFT:
        fn = all_q[name]
        walls = []
        for _ in range(3):
            t0 = time.monotonic()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.monotonic() - t0, 2))
        out["queries"][name] = {"walls": walls, "best": min(walls)}
        if name in PLAN_QUERIES:
            plans[name] = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
    spark.stop()
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/drift_plans_r05.txt", "w") as f:
        for name, p in plans.items():
            f.write(f"===== {name} =====\n{p}\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
