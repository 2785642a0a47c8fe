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
jsonreader, orcreader, streamreader (synthetic generator — the
reference's test source), jdbcreader (querySql via Spark's `query`
option, splitPk → partitioned read; no JDBC driver ships in this
sandbox so it is config-mapping only — see jdbc_options), walreader
(this engine's change-stream tail, batch form).

Writers: parquetwriter/hdfswriter (writeMode append/nonConflict/
truncate → Spark save modes), orcwriter, txtfilewriter/csvwriter,
streamwriter (show), memwriter (collect to a named temp view — test
sink), snapshotwriter (MERGE into SnapshotTable; writeMode insert/
replace/update mirrors [UP plugin-rdbms-util/.../CommonRdbmsWriter.java]:
insert diverts rows whose key already exists to the dirty counter,
replace/update upsert them; writeMode bootstrap stamps a full load at
a consistent snapshotLsn watermark — the CDCEngine.bootstrap cutover
— so a subsequent WAL tail may safely overlap the snapshot). All
writers honor preSql/postSql hooks.

Transformers: dx_substr/pad/replace/filter/cast, dx_sql (Catalyst
expression), dx_python (named Arrow-vectorized UDF from
transforms.register_udf — the job-JSON-reachable dx_groovy analogue).
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, Observation, SparkSession, functions as F

from .table import SnapshotTable
from .transforms import (
    ErrorLimit,
    TransformPipeline,
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
    bytes_read: int = 0
    bytes_written: int = 0
    dirty_records: int = 0
    wall_sec: float = 0.0
    output: DataFrame | None = field(default=None, repr=False)
    commit: object | None = None
    warnings: list[str] = field(default_factory=list)


# Per-row byte-size estimate for the Communication-style MB/s report
# (the reference's Record.getByteSize analogue): exact for string/
# binary payloads, fixed width for scalars, JSON-rendered length for
# the rare nested column. Pure column arithmetic — rides the same
# observe() pass as the row counters, no extra scan.
_FIXED_BYTES = {
    "tinyint": 1, "smallint": 2, "int": 4, "bigint": 8, "float": 4,
    "double": 8, "boolean": 1, "date": 4, "timestamp": 8, "timestamp_ntz": 8,
}


def _row_bytes(schema) -> Column:
    parts = []
    for f in schema.fields:
        t = f.dataType.simpleString()
        c = F.col(f.name)
        if t in ("string", "binary"):
            parts.append(F.coalesce(F.octet_length(c).cast("long"), F.lit(0)))
        elif t in _FIXED_BYTES:
            parts.append(F.lit(_FIXED_BYTES[t]).cast("long"))
        elif t.startswith("decimal"):
            parts.append(F.lit(16).cast("long"))
        else:
            parts.append(F.coalesce(F.octet_length(F.to_json(c)).cast("long"), F.lit(0)))
    total = parts[0] if parts else F.lit(0).cast("long")
    for p in parts[1:]:
        total = total + p
    return total


# ------------------------------------------------------------------ readers


# DataX column-config type names → Spark cast types
# ([UP common/.../element/Column.java] Type enum: the reference's
# readers carry an explicit per-column type list; DATE covers
# date+datetime so it maps to timestamp, BYTES to binary).
_DATAX_TYPES = {
    "long": "long", "double": "double", "string": "string",
    "bool": "boolean", "boolean": "boolean", "date": "timestamp",
    "bytes": "binary",
}


def _datax_cast_type(t: str) -> str:
    return _DATAX_TYPES.get(str(t).lower(), str(t))


def _typed_columns(columns: list | None) -> bool:
    """True when the reader's column config carries explicit types for
    file positions ({"index": i, "type": t} / {"name": n, "type": t})
    — the signal to SKIP schema inference (which silently retypes
    values: leading-zero ids become ints, date-ish strings become
    timestamps) and honor the configured types instead."""
    return bool(columns) and any(
        isinstance(c, dict) and "type" in c and ("index" in c or "name" in c)
        for c in columns
    )


def _apply_column_projection(df: DataFrame, columns: list | None) -> DataFrame:
    """DataX reader `column` config: list of names, indices,
    {"index"|"name": …, "type": t} typed entries, or
    {"value": const, "type": t} constants; "*" = everything."""
    if not columns or columns == ["*"]:
        return df
    cols = []
    for i, c in enumerate(columns):
        if isinstance(c, dict) and "value" in c:
            cols.append(
                F.lit(c["value"]).cast(_datax_cast_type(c.get("type", "string")))
                .alias(f"const_{i}")
            )
        elif isinstance(c, dict):
            if "index" in c:
                col, alias = F.col(df.columns[int(c["index"])]), df.columns[int(c["index"])]
            elif "name" in c:
                col, alias = F.col(c["name"]), c["name"]
            else:
                raise JobConfigError(
                    f"column entry {c!r} needs one of value/index/name"
                )
            if "type" in c:
                col = col.cast(_datax_cast_type(c["type"]))
            cols.append(col.alias(alias))
        elif isinstance(c, int):
            cols.append(F.col(df.columns[c]))
        else:
            cols.append(F.col(c))
    return df.select(*cols)


def _csv_read(spark: SparkSession, p: dict) -> DataFrame:
    """txtfilereader/csvreader/hdfsreader(text|csv) file scan. Schema
    discipline follows the reference's explicit column-type semantics
    ([UP hdfsreader/.../DFSUtil.java] reads everything as text and
    casts per the configured column types): when the config declares
    types, every field is read AS STRING and the projection applies
    the declared casts — inference would silently retype values
    (leading-zero ids → ints, date-like strings → timestamps).
    Inference remains the fallback for type-less configs only."""
    return spark.read.options(
        sep=p.get("fieldDelimiter", ","),
        encoding=p.get("encoding", "UTF-8"),
        nullValue=p.get("nullFormat", "\\N"),
        dateFormat=p.get("dateFormat", "yyyy-MM-dd"),
        header=str(bool(p.get("skipHeader", False))).lower(),
        inferSchema=str(not _typed_columns(p.get("column"))).lower(),
    ).csv(_paths(p))


def _read(spark: SparkSession, reader: dict) -> DataFrame:
    name = reader.get("name", "")
    p = reader.get("parameter", {})
    if name in ("parquetreader", "parquet"):
        df = spark.read.parquet(*_paths(p))
    elif name in ("txtfilereader", "csvreader", "ossreader", "ftpreader"):
        df = _csv_read(spark, p)
    elif name in ("jsonreader", "json"):
        df = spark.read.json(_paths(p))
    elif name in ("orcreader", "orc"):
        # hdfsreader fileType=orc ([UP hdfsreader/.../DFSUtil.java])
        df = spark.read.orc(*_paths(p))
    elif name == "hdfsreader":
        # The reference's hdfsreader dispatches on fileType
        # ([UP hdfsreader/.../DFSUtil.java] text/orc/parquet/csv/rc);
        # paths carry their own scheme (hdfs://, s3a://, file:) so one
        # reader covers every hadoop-compatible filesystem.
        ft = str(p.get("fileType", "text")).lower()
        if ft == "parquet":
            df = spark.read.parquet(*_paths(p))
        elif ft == "orc":
            df = spark.read.orc(*_paths(p))
        elif ft in ("text", "csv"):
            df = _csv_read(spark, p)
        elif ft == "json":
            df = spark.read.json(_paths(p))
        else:
            raise JobConfigError(f"hdfsreader fileType {ft!r} (text/csv/orc/parquet/json)")
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
        df = spark.read.format("jdbc").options(**jdbc_options(p)).load()
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


def _scalar(p: dict, key: str, required: bool = False):
    """DataX config values arrive as scalar-or-list; take the first
    element with a config error (naming the parameter) on an empty
    list instead of a raw IndexError."""
    v = p.get(key)
    if isinstance(v, list):
        if not v:
            raise JobConfigError(f"parameter.{key} is an empty list")
        v = v[0]
    if required and v is None:
        raise JobConfigError(f"parameter.{key} required")
    return v


def jdbc_options(p: dict) -> dict:
    """DataX rdbms-reader config → Spark JDBC options. Separate from
    _read so it is unit-testable without a driver jar (the sandbox
    ships none). querySql goes through Spark's `query` option (which
    subquery-aliases it server-side) — NOT raw into dbtable, which
    would be a syntax error on first contact with a real database;
    with splitPk it must be a dbtable subquery instead, since Spark
    rejects query+partitionColumn together."""
    url = _scalar(p, "jdbcUrl", required=True)
    opts = {"url": url}
    query_sql = _scalar(p, "querySql")
    table = _scalar(p, "table")
    if query_sql is not None:
        if "splitPk" in p:
            opts["dbtable"] = f"({query_sql}) dx_query"
        else:
            opts["query"] = query_sql
    elif table is not None:
        opts["dbtable"] = table
    else:
        raise JobConfigError("jdbcreader needs parameter.table or parameter.querySql")
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
    return opts


def jdbc_write_options(p: dict) -> tuple[dict, str]:
    """DataX rdbms-writer config → (Spark JDBC options, save mode).
    writeMode insert → append; replace → overwrite WITH truncate=true
    (DataX replace re-loads the table in place — Spark's overwrite
    would otherwise DROP and recreate it, losing DDL); update (upsert)
    has no Spark-JDBC equivalent → explicit error pointing at
    snapshotwriter, never a silent append. Unit-testable without a
    driver jar, like jdbc_options."""
    url = _scalar(p, "jdbcUrl", required=True)
    table = _scalar(p, "table")
    if table is None:
        raise JobConfigError("jdbcwriter needs parameter.table")
    opts = {"url": url, "dbtable": table}
    if "username" in p:
        opts["user"] = p["username"]
    if "password" in p:
        opts["password"] = p["password"]
    if "batchSize" in p:
        opts["batchsize"] = str(p["batchSize"])
    write_mode = p.get("writeMode", "insert")
    if write_mode == "insert":
        mode = "append"
    elif write_mode == "replace":
        mode = "overwrite"
        opts["truncate"] = "true"
    elif write_mode == "update":
        raise JobConfigError(
            "jdbcwriter writeMode 'update' (upsert) is not expressible over "
            "Spark's JDBC sink — use snapshotwriter (MERGE) or stage to a "
            "temp table with postSql"
        )
    else:
        raise JobConfigError(f"jdbcwriter writeMode {write_mode!r}")
    return opts, mode


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
        elif name == "dx_python":
            # dx_groovy's imperative stand-in reachable from a job
            # SPEC: a named Arrow-vectorized pandas UDF registered via
            # transforms.register_udf (never per-row Python).
            from .transforms import UDF_REGISTRY

            udf_name = p.get("udf")
            if udf_name not in UDF_REGISTRY:
                raise JobConfigError(
                    f"dx_python udf {udf_name!r} not registered — call "
                    "datax_spark.transforms.register_udf(name, out_type, fn) first"
                )
            in_cols = p.get("columns") or [col]
            df = df.withColumn(
                p.get("as", col), UDF_REGISTRY[udf_name](*[F.col(c) for c in in_cols])
            )
        else:
            raise JobConfigError(f"unknown transformer {name!r}")
    return df


# ------------------------------------------------------------------ writers

_WRITE_MODES = {"append": "append", "nonConflict": "errorifexists", "truncate": "overwrite"}


def _write(spark: SparkSession, df: DataFrame, writer: dict, result: JobResult) -> None:
    name = writer.get("name", "")
    p = writer.get("parameter", {})
    mode = _WRITE_MODES.get(p.get("writeMode", "append"), p.get("writeMode", "append"))
    # preSql/postSql hooks ([UP plugin-rdbms-util/.../writer/WriterUtil.java]):
    # the truncate-then-load / post-load-index idiom of nearly every
    # production writer job. Statements run through spark.sql against
    # the session catalog (temp views / managed tables) — which is the
    # WRONG catalog for a jdbc writer (in DataX they execute on the
    # target RDBMS), so there they are an explicit config error rather
    # than a confusing TRUNCATE of a local view.
    _jdbc_writers = ("jdbcwriter", "mysqlwriter", "postgresqlwriter", "rdbmswriter")
    if name in _jdbc_writers and (p.get("preSql") or p.get("postSql")):
        raise JobConfigError(
            f"{name} preSql/postSql would run against the local Spark "
            "catalog, not the target database — execute them on the RDBMS "
            "out-of-band, or use a catalog-backed writer"
        )
    for sql in p.get("preSql") or []:
        spark.sql(sql)
    # hive-style partitioned layout (hdfswriter jobs feeding partitioned
    # tables) — the storage-layout lever that makes downstream partition
    # pruning possible at 100 TB
    part_cols = p.get("partitionBy") or []
    if isinstance(part_cols, str):
        part_cols = [part_cols]

    def _w(writer_obj):
        return writer_obj.partitionBy(*part_cols) if part_cols else writer_obj

    if name in ("parquetwriter", "hdfswriter"):
        _w(df.write.mode(mode)).parquet(p["path"])
    elif name == "orcwriter":
        _w(df.write.mode(mode)).orc(p["path"])
    elif name in ("txtfilewriter", "csvwriter", "osswriter", "ftpwriter"):
        opts = dict(
            sep=p.get("fieldDelimiter", ","),
            nullValue=p.get("nullFormat", "\\N"),
            header=str(bool(p.get("header", False))).lower(),
        )
        if p.get("compress"):  # DataX txtfilewriter compress: gzip/bzip2/...
            opts["compression"] = p["compress"]
        _w(df.write.mode(mode).options(**opts)).csv(p["path"])
    elif name in ("jsonlwriter", "jsonwriter"):
        # JSON-lines shards — the canonical LLM-training-corpus export
        # format ({"text": ...} per line); compress + partitionBy make
        # it the terminal stage of a curation job
        opts = {}
        if p.get("compress"):
            opts["compression"] = p["compress"]
        _w(df.write.mode(mode).options(**opts)).json(p["path"])
    elif name == "streamwriter":
        df.show(int(p.get("limit", 20)), truncate=False)
    elif name == "memwriter":
        df.createOrReplaceTempView(p.get("view", "job_output"))
        result.output = df
    elif name in ("jdbcwriter", "mysqlwriter", "postgresqlwriter", "rdbmswriter"):
        jopts, jmode = jdbc_write_options(p)
        df.write.format("jdbc").options(**jopts).mode(jmode).save()
    elif name == "snapshotwriter":
        _write_snapshot(spark, df, p, result)
    elif name == "dedupindexwriter":
        _write_dedup_index(spark, df, p, result)
    else:
        raise JobConfigError(f"unknown writer {name!r}")
    for sql in p.get("postSql") or []:
        spark.sql(sql)


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
    if mode == "bootstrap":
        # Initial full load at a consistent LSN watermark (the
        # CDCEngine.bootstrap cutover semantics): every row stamped
        # op='I'/lsn=snapshotLsn so a subsequent WAL tail may safely
        # overlap the snapshot — LWW discards overlapped older events.
        if "snapshotLsn" not in p:
            raise JobConfigError(
                "snapshotwriter writeMode 'bootstrap' requires snapshotLsn "
                "(the watermark the snapshot is consistent as of)"
            )
        wm = int(p["snapshotLsn"])
        batch_id = p.get("batchId", "bootstrap")
        df = (
            df.drop("lsn", "op")
            .withColumn("lsn", F.lit(wm).cast("long"))
            .withColumn("op", F.lit("I"))
        )
        # rows: -1 sentinel (same convention as derived.py lineage) —
        # a df.count() here would re-scan the ENTIRE full load purely
        # for a metadata integer; the observe() counters on the job
        # result already carry the real row count.
        result.commit = table.merge(
            df, batch_id=batch_id,
            lineage=[{"source": f"snapshot:{batch_id}", "min_lsn": wm,
                      "max_lsn": wm, "rows": -1}],
        )
        return
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
    strategy = p.get("mergeStrategy", "cow")
    if strategy not in ("cow", "mor"):
        raise JobConfigError(f"snapshotwriter mergeStrategy {strategy!r}")
    result.commit = table.merge(df, batch_id=p.get("batchId"), strategy=strategy)
    if strategy == "mor" and not result.commit.skipped:
        # Shared inline policy (table.compact_hot_buckets); skipped
        # exactly-once replays trigger no compaction commit.
        table.compact_hot_buckets(int(p.get("morCompactThreshold", 8)))


def _write_dedup_index(spark: SparkSession, df: DataFrame, p: dict, result: JobResult) -> None:
    """Incremental dedup maintenance as a job-spec sink: each job run
    is ONE batch into a persisted LSH index (kind: minhash over a text
    column, embedding over a vector column), optionally folding the
    batch's candidate pairs into a cluster table. Exactly-once per
    batchId rides the index tables' own ledgers, so rerunning a failed
    job is safe — the DataX writer idiom (land a batch, dedupe against
    everything already landed) without ever recomputing the corpus."""
    from .dedup_index import ClusterTable, EmbeddingLSHIndex, MinHashIndex

    kind = p.get("kind", "minhash")
    loc = p["path"]
    batch_id = p.get("batchId")
    id_col = p.get("idColumn", "doc_id")
    exists = os.path.isdir(os.path.join(loc, "_commits"))

    def _warn_param_drift(idx_params: dict, spec_keys: dict) -> None:
        # An existing index pins its LSH parameters at create time —
        # silently honoring a spec that asks for different ones would
        # make this batch's buckets incompatible with the stored
        # signatures (missed duplicates, no error). Warn loudly.
        drift = {
            spec_key: (p[spec_key], idx_params[attr])
            for spec_key, attr in spec_keys.items()
            if spec_key in p and int(p[spec_key]) != idx_params[attr]
        }
        if drift:
            msg = (
                f"dedupindexwriter: index at {loc} pins "
                + ", ".join(f"{k}={have} (spec asks {want})" for k, (want, have) in drift.items())
                + " — create-time parameters win; re-create the index to change them"
            )
            warnings.warn(msg, stacklevel=2)
            result.warnings.append(msg)

    if kind == "minhash":
        idx = (
            MinHashIndex.load(spark, loc)
            if exists
            else MinHashIndex.create(
                spark, loc,
                n_bands=int(p.get("bands", 4)),
                k=int(p.get("shingleK", 8)),
                stride=int(p.get("stride", 4)),
                num_buckets=int(p.get("numBuckets", 32)),
            )
        )
        if exists:
            _warn_param_drift(
                {"n_bands": idx.n_bands, "k": idx.k, "stride": idx.stride},
                {"bands": "n_bands", "shingleK": "k", "stride": "stride"},
            )
        pairs = idx.add_batch(
            df, batch_id=batch_id,
            text_col=p.get("contentColumn", "text"), id_col=id_col,
        )
    elif kind == "embedding":
        idx = (
            EmbeddingLSHIndex.load(spark, loc)
            if exists
            else EmbeddingLSHIndex.create(
                spark, loc,
                n_bands=int(p.get("bands", 4)),
                planes_per_band=int(p.get("planesPerBand", 4)),
                n_dims=int(p.get("dims", 64)),
                num_buckets=int(p.get("numBuckets", 32)),
            )
        )
        if exists:
            _warn_param_drift(
                {"n_bands": idx.n_bands, "planes_per_band": idx.planes_per_band,
                 "n_dims": idx.n_dims},
                {"bands": "n_bands", "planesPerBand": "planes_per_band",
                 "dims": "n_dims"},
            )
        pairs = idx.add_batch(
            df, batch_id=batch_id, id_col=id_col,
            vec_col=p.get("contentColumn", "embedding"),
            threshold=float(p.get("threshold", 0.4)),
        )
    else:
        raise JobConfigError(f"dedupindexwriter kind {kind!r} (minhash|embedding)")
    cloc = p.get("clusterPath")
    if cloc:
        ct = (
            ClusterTable.load(spark, cloc)
            if os.path.isdir(os.path.join(cloc, "_commits"))
            else ClusterTable.create(
                spark, cloc,
                num_buckets=int(p.get("numBuckets", 32)),
                track_edges=bool(p.get("trackEdges", False)),
            )
        )
        ct.add_pairs(pairs, batch_id=batch_id)
    result.output = pairs
    pairs.createOrReplaceTempView(p.get("pairsView", "dedup_pairs"))


# ------------------------------------------------------------------ engine


def substitute_params(spec, params: dict | None) -> tuple[object, set[str]]:
    """DataX job-JSON variable substitution: `${name}` inside any
    string value is replaced from `params` — the analogue of the
    reference CLI's `-p "-Dname=value"` job parameters (the ${bizdate}
    idiom every scheduled production job uses). Mirrors the reference's
    leniency: unknown variables stay literal (they may be meaningful to
    the target system), but each is collected into the returned
    `unresolved` set so run_job can surface a warning instead of a
    confusing path error downstream. Returns (new_spec, unresolved)."""
    import re as _re

    params = params or {}
    unresolved: set[str] = set()

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        if isinstance(node, str):
            def repl(m):
                name = m.group(1)
                if name in params:
                    return str(params[name])
                unresolved.add(name)
                return m.group(0)

            return _re.sub(r"\$\{([A-Za-z0-9_.-]+)\}", repl, node)
        return node

    return walk(spec), unresolved


def _run_stream_entry(spark: SparkSession, entry: dict, result: JobResult) -> None:
    """Streaming job entry: `walreader` with `stream: true` +
    `snapshotwriter` runs the engine's checkpointed Structured
    Streaming tail from the same job JSON that batch jobs use —
    DataX's reader→channel→writer lifecycle with the channel replaced
    by micro-batches. availableNow (default) drains what is present
    and stops; re-running with the same checkpoint resumes. Reader
    params: path, schemaEpochs (registry json) OR columns {name:type},
    maxFilesPerTrigger / maxBytesPerTrigger (speed control), walFormat,
    availableNow. Writer (snapshotwriter) params: path, upsertKey,
    numBuckets, checkpoint (REQUIRED — resume identity), mergeStrategy
    cow|mor + morCompactThreshold (merge-on-read deltas with inline
    compaction — the small-batch/high-frequency tail shape)."""
    from .engine import CDCEngine
    from .schema_evolution import EpochRegistry

    rp = entry["reader"].get("parameter", {})
    writer = entry.get("writer", {})
    if writer.get("name") != "snapshotwriter":
        raise JobConfigError("streaming walreader requires a snapshotwriter")
    wp = writer.get("parameter", {})
    ckpt = wp.get("checkpoint")
    if not ckpt:
        raise JobConfigError(
            "snapshotwriter.parameter.checkpoint required for a streaming job "
            "(it is the resume identity)"
        )
    key_cols = wp.get("upsertKey", ["repo", "path"])
    if rp.get("schemaEpochs"):
        registry = EpochRegistry.from_json(rp["schemaEpochs"], key_cols=key_cols)
    elif rp.get("columns"):
        registry = EpochRegistry(
            [{"epoch": 0, "change": "base", "columns": dict(rp["columns"])}],
            key_cols=key_cols,
        )
    else:
        raise JobConfigError("streaming walreader needs schemaEpochs or columns")
    loc = wp.get("path")
    if not loc:
        raise JobConfigError("snapshotwriter.parameter.path required")
    if os.path.isdir(os.path.join(loc, "_commits")):
        table = SnapshotTable.load(spark, loc)
    else:
        table = SnapshotTable.create(
            spark, loc, registry.schema_for(0), key_cols=key_cols,
            num_buckets=int(wp.get("numBuckets", 32)),
        )
    transformers = entry.get("transformer")
    pipeline = TransformPipeline()
    if transformers:
        pipeline.transform("job_spec", lambda df: _apply_transformers(df, transformers))
    v_before = table.current()["version"]
    strategy = wp.get("mergeStrategy", "cow")
    if strategy not in ("cow", "mor"):
        raise JobConfigError(f"snapshotwriter mergeStrategy {strategy!r}")
    engine = CDCEngine(
        spark, table, registry, transform=pipeline,
        merge_strategy=strategy,
        mor_compact_threshold=int(wp.get("morCompactThreshold", 8)),
    )
    q = engine.run_stream(
        rp["path"], ckpt,
        max_files_per_trigger=int(rp.get("maxFilesPerTrigger", 1)),
        available_now=bool(rp.get("availableNow", True)),
        wal_format=rp.get("walFormat", "parquet"),
        max_bytes_per_trigger=(
            int(rp["maxBytesPerTrigger"]) if rp.get("maxBytesPerTrigger") else None
        ),
    )
    q.awaitTermination()
    # counters from the commit-embedded lineage of the NEW commits
    for rec in table.history():
        if rec["version"] > v_before:
            for lin in rec.get("lineage") or []:
                result.rows_read += int(lin.get("rows", 0))
                result.rows_written += int(lin.get("rows", 0))
    result.commit = table.current()


def run_job(spark: SparkSession, spec: dict, params: dict | None = None) -> JobResult:
    """Execute one job spec (DataX job JSON shape). Returns counters —
    the analogue of the reference's end-of-job Communication report
    ([UP core/.../statistics/communication/CommunicationTool.java]).

    `params` substitutes ${name} variables throughout the spec before
    execution (the reference CLI's -p "-Dname=value" surface).

    Row/byte counters ride observe() nodes on the single write pass —
    the pipeline executes ONCE per entry, not once per counter. The
    errorLimit is evaluated per entry (dirty delta vs that entry's own
    rows), matching the reference's per-job ratio semantics."""
    import time as _time

    t0 = _time.monotonic()
    spec, unresolved = substitute_params(spec, params)
    job = spec.get("job", spec)
    content = job.get("content")
    if not content:
        raise JobConfigError("job.content required")
    setting = job.get("setting", {})
    limit = ErrorLimit(
        record=setting.get("errorLimit", {}).get("record"),
        percentage=setting.get("errorLimit", {}).get("percentage"),
    )
    speed = setting.get("speed", {})
    result = JobResult()
    if unresolved:
        msg = (
            "unresolved job variables left literal: "
            + ", ".join(sorted("${" + u + "}" for u in unresolved))
            + " — pass values via run_job(..., params={...})"
        )
        warnings.warn(msg, stacklevel=2)
        result.warnings.append(msg)
    for throttle in ("byte", "record"):
        if speed.get(throttle) is not None:
            msg = (
                f"speed.{throttle} throttle is not supported on a BATCH Spark "
                "job (it runs at cluster speed); use speed.channel for "
                "parallelism, or the streaming path's max_bytes_per_trigger / "
                "max_files_per_trigger (CDCEngine.run_stream) for rate control"
            )
            warnings.warn(msg, stacklevel=2)
            result.warnings.append(msg)
    for entry in content:
        if (
            entry["reader"].get("name") == "walreader"
            and entry["reader"].get("parameter", {}).get("stream")
        ):
            _run_stream_entry(spark, entry, result)
            continue
        obs_in, obs_out = Observation(), Observation()
        df = _read(spark, entry["reader"])
        df = df.observe(
            obs_in,
            F.count(F.lit(1)).alias("rows"),
            F.sum(_row_bytes(df.schema)).alias("bytes"),
        )
        channels = speed.get("channel")
        if channels:
            df = df.repartition(int(channels))
        df = _apply_transformers(df, entry.get("transformer"))
        df = df.observe(
            obs_out,
            F.count(F.lit(1)).alias("rows"),
            F.sum(_row_bytes(df.schema)).alias("bytes"),
        )
        writer = entry["writer"]
        dirty_before = result.dirty_records
        commit_before = result.commit
        if writer.get("name") in ("memwriter", "streamwriter"):
            # these sinks run no (or only a LIMIT-truncated) action of
            # their own — drive one full pass here so the observed
            # counters are complete (show()'s partial scan must not be
            # the action that finalizes them)
            df.count()
        _write(spark, df, writer, result)
        if result.commit is not commit_before and getattr(result.commit, "skipped", False):
            df.count()  # exactly-once merge no-op ran no action; finalize counters
        rows_in = int(obs_in.get["rows"])
        rows_out = int(obs_out.get["rows"])
        entry_dirty = result.dirty_records - dirty_before
        result.rows_read += rows_in
        result.bytes_read += int(obs_in.get["bytes"] or 0)
        result.rows_written += rows_out - entry_dirty
        result.bytes_written += int(obs_out.get["bytes"] or 0)
        limit.check(entry_dirty, rows_in)
    result.wall_sec = _time.monotonic() - t0
    return result
