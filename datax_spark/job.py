"""DataX-style job specs on Spark — the migration surface.

A reference user drives DataX with a JSON job config:
``job.content[0].{reader,transformer,writer}`` + ``job.setting.{speed,
errorLimit}`` (SURVEY.md §3A, [UP core/.../core/Engine.java],
[UP common/.../util/Configuration.java]). This module accepts the same
shape and runs it as one Spark job, so a reference job file ports by
renaming the plugin: readers/writers become Spark DataFrame sources/
sinks, the transformer chain becomes fused Catalyst expressions, speed
control becomes repartitioning, and errorLimit becomes the quarantine
split of transforms.py.

Readers: parquetreader, txtfilereader/csvreader (fieldDelimiter,
encoding, nullFormat, dateFormat, skipHeader, column projection),
jsonreader, streamreader (synthetic generator — the reference's test
source), jdbcreader (options passthrough with splitPk → partitioned
read; no JDBC driver ships in this sandbox so it is config-mapping
only), walreader (this engine's change-stream tail, batch form).

Writers: parquetwriter/hdfswriter (writeMode append/nonConflict/
truncate → Spark save modes), txtfilewriter/csvwriter, streamwriter
(show), memwriter (collect to a named temp view — test sink),
snapshotwriter (MERGE into SnapshotTable; writeMode insert/replace/
update mirrors [UP plugin-rdbms-util/.../CommonRdbmsWriter.java]:
insert diverts rows whose key already exists to the dirty counter,
replace/update upsert them).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from .table import SnapshotTable
from .transforms import (
    ErrorLimit,
    dx_cast,
    dx_filter,
    dx_pad,
    dx_replace,
    dx_substr,
)


class JobConfigError(ValueError):
    pass


@dataclass
class JobResult:
    rows_read: int = 0
    rows_written: int = 0
    dirty_records: int = 0
    wall_sec: float = 0.0
    output: DataFrame | None = field(default=None, repr=False)
    commit: object | None = None


# ------------------------------------------------------------------ readers


def _apply_column_projection(df: DataFrame, columns: list | None) -> DataFrame:
    """DataX reader `column` config: list of names, indices, or
    {"value": const, "type": t} constant entries; "*" = everything."""
    if not columns or columns == ["*"]:
        return df
    cols = []
    for i, c in enumerate(columns):
        if isinstance(c, dict):
            cols.append(F.lit(c["value"]).cast(c.get("type", "string")).alias(f"const_{i}"))
        elif isinstance(c, int):
            cols.append(F.col(df.columns[c]))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def _read(spark: SparkSession, reader: dict) -> DataFrame:
    name = reader.get("name", "")
    p = reader.get("parameter", {})
    if name in ("parquetreader", "parquet"):
        df = spark.read.parquet(*_paths(p))
    elif name in ("txtfilereader", "csvreader", "ossreader", "ftpreader"):
        df = (
            spark.read.options(
                sep=p.get("fieldDelimiter", ","),
                encoding=p.get("encoding", "UTF-8"),
                nullValue=p.get("nullFormat", "\\N"),
                dateFormat=p.get("dateFormat", "yyyy-MM-dd"),
                header=str(bool(p.get("skipHeader", False))).lower(),
                inferSchema="true",
            ).csv(_paths(p))
        )
    elif name in ("jsonreader", "json"):
        df = spark.read.json(_paths(p))
    elif name == "streamreader":
        # synthetic generator: column = [{"value": x, "type": t} |
        # {"random": "lo, hi", "type": "long"}], sliceRecordCount rows.
        n = int(p.get("sliceRecordCount", 100))
        df = spark.range(n).withColumnRenamed("id", "_i")
        cols = []
        for i, c in enumerate(p.get("column", [])):
            t = c.get("type", "string")
            if "random" in c:
                lo, hi = [int(x) for x in str(c["random"]).split(",")]
                cols.append(
                    (F.pmod(F.hash(F.col("_i") + F.lit(i * 7919)), F.lit(hi - lo + 1)) + lo)
                    .cast(t).alias(f"col_{i}")
                )
            else:
                cols.append(F.lit(c.get("value")).cast(t).alias(f"col_{i}"))
        df = df.select(*cols)
        # column config was consumed to BUILD the rows — skip projection
        if p.get("where"):
            df = df.filter(p["where"])
        return df
    elif name in ("jdbcreader", "mysqlreader", "postgresqlreader", "rdbmsreader"):
        opts = {
            "url": p["jdbcUrl"] if isinstance(p.get("jdbcUrl"), str) else p["jdbcUrl"][0],
            "dbtable": p.get("table", p.get("querySql")),
        }
        if "username" in p:
            opts["user"] = p["username"]
        if "password" in p:
            opts["password"] = p["password"]
        if "splitPk" in p:  # DataX splitPk → Spark partitioned JDBC read
            opts["partitionColumn"] = p["splitPk"]
            opts["lowerBound"] = str(p.get("lowerBound", 0))
            opts["upperBound"] = str(p.get("upperBound", 1 << 31))
            opts["numPartitions"] = str(p.get("channel", 8))
        if "fetchSize" in p:
            opts["fetchsize"] = str(p["fetchSize"])
        df = spark.read.format("jdbc").options(**opts).load()
    elif name == "walreader":
        df = spark.read.option("pathGlobFilter", "*.parquet").parquet(p["path"])
    else:
        raise JobConfigError(f"unknown reader {name!r}")
    if p.get("where"):
        df = df.filter(p["where"])
    return _apply_column_projection(df, p.get("column"))


def _paths(p: dict) -> list[str]:
    path = p.get("path")
    if path is None:
        raise JobConfigError("reader.parameter.path required")
    return path if isinstance(path, list) else [path]


# ------------------------------------------------------------- transformers


def _apply_transformers(df: DataFrame, transformers: list[dict]) -> DataFrame:
    for t in transformers or []:
        name = t.get("name")
        p = t.get("parameter", {})
        col = p.get("columnName") or df.columns[int(p.get("columnIndex", 0))]
        if name == "dx_substr":
            df = df.withColumn(col, dx_substr(col, int(p["startIndex"]), int(p["length"])))
        elif name == "dx_pad":
            df = df.withColumn(
                col, dx_pad(col, p.get("padType", "l"), int(p["padLength"]), p["padString"])
            )
        elif name == "dx_replace":
            df = df.withColumn(
                col, dx_replace(col, int(p["startIndex"]), int(p["length"]), p["replaceString"])
            )
        elif name == "dx_filter":
            df = dx_filter(df, col, p["operator"], p["value"])
        elif name == "dx_cast":
            df = df.withColumn(col, dx_cast(col, p["type"]))
        elif name == "dx_sql":
            # dx_groovy's declarative stand-in: a Spark SQL expression
            # over the current row (stays in codegen, unlike Groovy).
            df = df.withColumn(p.get("as", col), F.expr(p["expr"]))
        else:
            raise JobConfigError(f"unknown transformer {name!r}")
    return df


# ------------------------------------------------------------------ writers

_WRITE_MODES = {"append": "append", "nonConflict": "errorifexists", "truncate": "overwrite"}


def _write(spark: SparkSession, df: DataFrame, writer: dict, result: JobResult) -> None:
    name = writer.get("name", "")
    p = writer.get("parameter", {})
    mode = _WRITE_MODES.get(p.get("writeMode", "append"), p.get("writeMode", "append"))
    if name in ("parquetwriter", "hdfswriter"):
        df.write.mode(mode).parquet(p["path"])
    elif name in ("txtfilewriter", "csvwriter", "osswriter", "ftpwriter"):
        (
            df.write.mode(mode)
            .options(
                sep=p.get("fieldDelimiter", ","),
                nullValue=p.get("nullFormat", "\\N"),
                header=str(bool(p.get("header", False))).lower(),
            )
            .csv(p["path"])
        )
    elif name == "streamwriter":
        df.show(int(p.get("limit", 20)), truncate=False)
    elif name == "memwriter":
        df.createOrReplaceTempView(p.get("view", "job_output"))
        result.output = df
    elif name == "snapshotwriter":
        _write_snapshot(spark, df, p, result)
    else:
        raise JobConfigError(f"unknown writer {name!r}")


def _write_snapshot(spark: SparkSession, df: DataFrame, p: dict, result: JobResult) -> None:
    """writeMode trichotomy onto MERGE (SURVEY.md §2.2):
    replace/update → upsert; insert → only new keys land, rows whose
    key already exists are counted dirty (DataX's key-dup behavior)."""
    loc = p["path"]
    key_cols = p.get("upsertKey", ["repo", "path"])
    if os.path.isdir(os.path.join(loc, "_commits")):
        table = SnapshotTable.load(spark, loc)
    else:
        table = SnapshotTable.create(
            spark, loc, df.drop("lsn", "op").schema, key_cols=key_cols,
            num_buckets=int(p.get("numBuckets", 32)),
        )
    mode = p.get("writeMode", "update")
    if "lsn" not in df.columns:
        df = df.withColumn("lsn", F.monotonically_increasing_id())
    if "op" not in df.columns:
        df = df.withColumn("op", F.lit("U"))
    if mode == "insert":
        existing = table.snapshot().select(*key_cols)
        matched = df.join(existing, on=key_cols, how="left_semi")
        result.dirty_records += matched.count()
        df = df.join(existing, on=key_cols, how="left_anti")
    elif mode not in ("replace", "update"):
        raise JobConfigError(f"snapshotwriter writeMode {mode!r}")
    result.commit = table.merge(df, batch_id=p.get("batchId"))


# ------------------------------------------------------------------ engine


def run_job(spark: SparkSession, spec: dict) -> JobResult:
    """Execute one job spec (DataX job JSON shape). Returns counters —
    the analogue of the reference's end-of-job Communication report
    ([UP core/.../statistics/communication/CommunicationTool.java])."""
    import time as _time

    t0 = _time.monotonic()
    job = spec.get("job", spec)
    content = job.get("content")
    if not content:
        raise JobConfigError("job.content required")
    setting = job.get("setting", {})
    limit = ErrorLimit(
        record=setting.get("errorLimit", {}).get("record"),
        percentage=setting.get("errorLimit", {}).get("percentage"),
    )
    result = JobResult()
    for entry in content:
        df = _read(spark, entry["reader"])
        rows_in = df.count()
        result.rows_read += rows_in
        channels = setting.get("speed", {}).get("channel")
        if channels:
            df = df.repartition(int(channels))
        df = _apply_transformers(df, entry.get("transformer"))
        rows_out = df.count()
        dirty_before = result.dirty_records
        _write(spark, df, entry["writer"], result)
        result.rows_written += rows_out - (result.dirty_records - dirty_before)
        limit.check(result.dirty_records, rows_in)
    result.wall_sec = _time.monotonic() - t0
    return result
