"""DataX-style job-spec API: readers, transformer chain, writers,
writeMode semantics, errorLimit — the migration surface for a
reference user's job JSON."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from datax_spark.job import JobConfigError, run_job
from datax_spark.transforms import DirtyDataLimitExceeded

SF = "/root/testdata/sf0.001"


def test_parquet_to_mem_with_transformers(spark):
    spec = {
        "job": {
            "content": [
                {
                    "reader": {
                        "name": "parquetreader",
                        "parameter": {
                            "path": f"{SF}/documents.parquet",
                            "column": ["doc_id", "text", "lang", "source"],
                            "where": "lang = 'en'",
                        },
                    },
                    "transformer": [
                        {"name": "dx_substr",
                         "parameter": {"columnName": "text", "startIndex": 0, "length": 10}},
                        {"name": "dx_pad",
                         "parameter": {"columnName": "source", "padType": "l",
                                       "padLength": 8, "padString": "0"}},
                        {"name": "dx_filter",
                         "parameter": {"columnName": "doc_id", "operator": ">", "value": 10**9}},
                        {"name": "dx_sql",
                         "parameter": {"expr": "sha2(text, 256)", "as": "text_sha"}},
                    ],
                    "writer": {"name": "memwriter", "parameter": {"view": "t_out"}},
                }
            ],
            "setting": {"speed": {"channel": 4}},
        }
    }
    r = run_job(spark, spec)
    out = spark.table("t_out")
    assert r.rows_read > 0 and r.rows_written == out.count()
    row = out.first()
    assert len(row["text"]) <= 10
    assert len(row["source"]) == 8
    assert len(row["text_sha"]) == 64
    # dx_filter drops records MATCHING the predicate (doc_id > 1e9 → none match)
    assert out.count() == r.rows_read or out.count() > 0


def test_csv_roundtrip(spark, tmp_path):
    csv_dir = str(tmp_path / "csv")
    out_dir = str(tmp_path / "out")
    run_job(spark, {
        "job": {"content": [{
            "reader": {"name": "parquetreader",
                       "parameter": {"path": f"{SF}/region.parquet"}},
            "writer": {"name": "csvwriter",
                       "parameter": {"path": csv_dir, "fieldDelimiter": "|",
                                     "header": True, "writeMode": "truncate"}},
        }]}
    })
    r = run_job(spark, {
        "job": {"content": [{
            "reader": {"name": "csvreader",
                       "parameter": {"path": csv_dir, "fieldDelimiter": "|",
                                     "skipHeader": True}},
            "writer": {"name": "memwriter", "parameter": {"view": "csv_back"}},
        }]}
    })
    orig = spark.read.parquet(f"{SF}/region.parquet")
    back = spark.table("csv_back")
    assert back.count() == orig.count()
    assert sorted(back.columns) == sorted(orig.columns)


def test_streamreader_synthetic(spark):
    r = run_job(spark, {
        "job": {"content": [{
            "reader": {"name": "streamreader", "parameter": {
                "sliceRecordCount": 50,
                "column": [
                    {"value": "hello", "type": "string"},
                    {"random": "0, 9", "type": "long"},
                ],
            }},
            "writer": {"name": "memwriter", "parameter": {"view": "syn"}},
        }]}
    })
    out = spark.table("syn")
    assert r.rows_read == 50
    vals = [row["col_1"] for row in out.collect()]
    assert all(0 <= v <= 9 for v in vals)
    assert out.where(F.col("col_0") != "hello").count() == 0


def test_snapshotwriter_modes(spark, tmp_path):
    loc = str(tmp_path / "snap")
    docs = f"{SF}/documents.parquet"
    base = {
        "reader": {"name": "parquetreader",
                   "parameter": {"path": docs, "column": ["doc_id", "text"]}},
        "writer": {"name": "snapshotwriter",
                   "parameter": {"path": loc, "upsertKey": ["doc_id"],
                                 "writeMode": "update", "numBuckets": 4}},
    }
    r1 = run_job(spark, {"job": {"content": [base]}})
    n = spark.read.parquet(docs).count()
    assert r1.rows_written == n and r1.dirty_records == 0

    # update again → upsert, same row count, no dirty
    r2 = run_job(spark, {"job": {"content": [base]}})
    assert r2.dirty_records == 0

    # insert mode: every key already exists → all dirty, none written
    ins = {**base, "writer": {"name": "snapshotwriter", "parameter": {
        **base["writer"]["parameter"], "writeMode": "insert"}}}
    r3 = run_job(spark, {"job": {"content": [ins]}})
    assert r3.dirty_records == n and r3.rows_written == 0

    from datax_spark.table import SnapshotTable
    assert SnapshotTable.load(spark, loc).snapshot().count() == n


def test_error_limit_aborts(spark, tmp_path):
    loc = str(tmp_path / "snap2")
    docs = f"{SF}/documents.parquet"
    base = {
        "reader": {"name": "parquetreader",
                   "parameter": {"path": docs, "column": ["doc_id", "text"]}},
        "writer": {"name": "snapshotwriter",
                   "parameter": {"path": loc, "upsertKey": ["doc_id"],
                                 "writeMode": "update", "numBuckets": 4}},
    }
    run_job(spark, {"job": {"content": [base]}})
    ins = {**base, "writer": {"name": "snapshotwriter", "parameter": {
        **base["writer"]["parameter"], "writeMode": "insert"}}}
    with pytest.raises(DirtyDataLimitExceeded):
        run_job(spark, {"job": {"content": [ins],
                                "setting": {"errorLimit": {"record": 0}}}})


def test_unknown_plugin_rejected(spark):
    with pytest.raises(JobConfigError):
        run_job(spark, {"job": {"content": [{
            "reader": {"name": "nosuchreader", "parameter": {"path": "/x"}},
            "writer": {"name": "memwriter", "parameter": {}},
        }]}})


def test_multi_content_entries(spark, tmp_path):
    """DataX job.content is a LIST — one job can run several
    reader→writer pairs; counters aggregate across them."""
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    r = run_job(spark, {"job": {"content": [
        {"reader": {"name": "parquetreader", "parameter": {"path": f"{SF}/region.parquet"}},
         "writer": {"name": "parquetwriter", "parameter": {"path": out1, "writeMode": "truncate"}}},
        {"reader": {"name": "parquetreader", "parameter": {"path": f"{SF}/nation.parquet"}},
         "writer": {"name": "parquetwriter", "parameter": {"path": out2, "writeMode": "truncate"}}},
    ]}})
    n_region = spark.read.parquet(f"{SF}/region.parquet").count()
    n_nation = spark.read.parquet(f"{SF}/nation.parquet").count()
    assert r.rows_read == n_region + n_nation
    assert r.rows_written == n_region + n_nation
    assert spark.read.parquet(out1).count() == n_region
    assert spark.read.parquet(out2).count() == n_nation


def test_example_job_specs_run(spark, tmp_path):
    """The shipped example specs (examples/job_specs/*.json) run
    unmodified — the reference user's migration artifact."""
    import glob
    import json
    import shutil

    from datax_spark.fixtures import generate_wal

    shutil.rmtree("/tmp/datax_out", ignore_errors=True)
    # the streaming example tails ${work}/wal — provide a fixture WAL
    work = str(tmp_path / "work")
    generate_wal(work, n_keys=40, n_events=200, n_segments=2)
    specs = sorted(glob.glob("examples/job_specs/*.json"))
    assert len(specs) >= 4
    for path in specs:
        with open(path) as f:
            spec = json.load(f)
        r = run_job(
            spark, spec,
            params={"work": work, "watermark": "100", "bizdate": "19700101"},
        )
        assert r.rows_read > 0, path


def test_counters_and_bytes_single_pass(spark, tmp_path):
    """Row/byte counters ride observe() on the one write pass; bytes
    approximate the reference's Record.getByteSize (string payload =
    octet length)."""
    out = str(tmp_path / "obs_out")
    r = run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/documents.parquet",
                                 "column": ["doc_id", "text"]}},
        "writer": {"name": "parquetwriter",
                   "parameter": {"path": out, "writeMode": "truncate"}},
    }]}})
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n = docs.count()
    text_bytes = docs.agg(F.sum(F.octet_length("text"))).collect()[0][0]
    assert r.rows_read == n and r.rows_written == n
    assert r.bytes_read == text_bytes + 8 * n  # text octets + 8/bigint
    assert r.bytes_written == r.bytes_read  # no transformer changed the shape


def test_orc_roundtrip_with_pre_post_sql(spark, tmp_path):
    """ORC reader/writer + preSql/postSql hooks: preSql prepares a
    catalog object, postSql records completion — and the job is
    idempotent when rerun (the truncate-then-load idiom)."""
    orc_dir = str(tmp_path / "orc")
    spec = {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/nation.parquet"}},
        "writer": {"name": "orcwriter",
                   "parameter": {"path": orc_dir, "writeMode": "truncate",
                                 "preSql": ["DROP VIEW IF EXISTS job_done"],
                                 "postSql": ["CREATE TEMP VIEW job_done AS SELECT 1 AS ok"]}},
    }]}}
    r1 = run_job(spark, spec)
    r2 = run_job(spark, spec)  # rerun: preSql drops, truncate overwrites
    n = spark.read.parquet(f"{SF}/nation.parquet").count()
    assert r1.rows_written == n and r2.rows_written == n
    assert spark.read.orc(orc_dir).count() == n  # not doubled
    assert spark.table("job_done").collect()[0]["ok"] == 1

    back = run_job(spark, {"job": {"content": [{
        "reader": {"name": "orcreader", "parameter": {"path": orc_dir}},
        "writer": {"name": "memwriter", "parameter": {"view": "orc_back"}},
    }]}})
    assert back.rows_read == n


def test_jdbc_options_mapping():
    """querySql must reach Spark as the `query` option (or a dbtable
    subquery when splitPk forces partitionColumn) — never raw dbtable."""
    from datax_spark.job import jdbc_options

    base = {"jdbcUrl": ["jdbc:postgresql://h/db"], "username": "u", "password": "p"}
    o1 = jdbc_options({**base, "table": "t1", "splitPk": "id", "fetchSize": 500})
    assert o1["dbtable"] == "t1" and o1["partitionColumn"] == "id"
    assert o1["numPartitions"] == "8" and o1["fetchsize"] == "500"
    assert o1["user"] == "u" and o1["url"] == "jdbc:postgresql://h/db"

    o2 = jdbc_options({**base, "querySql": "SELECT a, b FROM t WHERE a > 0"})
    assert o2["query"] == "SELECT a, b FROM t WHERE a > 0"
    assert "dbtable" not in o2

    o3 = jdbc_options({**base, "querySql": ["SELECT * FROM t"], "splitPk": "a"})
    assert o3["dbtable"] == "(SELECT * FROM t) dx_query"  # Spark rejects query+partitionColumn
    assert "query" not in o3

    with pytest.raises(JobConfigError):
        jdbc_options(base)


def test_dx_python_registered_udf(spark):
    """The dx_groovy analogue reachable from a job SPEC: a registered
    Arrow-vectorized pandas UDF by name."""
    from datax_spark.transforms import register_udf

    register_udf("tok_count", "long", lambda s: s.str.split(" ").str.len())
    r = run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/documents.parquet",
                                 "column": ["doc_id", "text"]}},
        "transformer": [{"name": "dx_python",
                         "parameter": {"udf": "tok_count", "columnName": "text",
                                       "as": "n_tok"}}],
        "writer": {"name": "memwriter", "parameter": {"view": "dxp_out"}},
    }]}})
    out = spark.table("dxp_out")
    row = out.first()
    assert row["n_tok"] == len(row["text"].split(" "))
    with pytest.raises(JobConfigError):
        run_job(spark, {"job": {"content": [{
            "reader": {"name": "parquetreader",
                       "parameter": {"path": f"{SF}/region.parquet"}},
            "transformer": [{"name": "dx_python", "parameter": {"udf": "nope"}}],
            "writer": {"name": "memwriter", "parameter": {}},
        }]}})


def test_speed_throttles_warn_not_silent(spark):
    """speed.byte / speed.record are unsupported on Spark — the job
    must SAY so (reference jobs rely on them), not silently ignore."""
    r = run_job(spark, {"job": {
        "content": [{
            "reader": {"name": "parquetreader",
                       "parameter": {"path": f"{SF}/region.parquet"}},
            "writer": {"name": "memwriter", "parameter": {"view": "sp_out"}},
        }],
        "setting": {"speed": {"channel": 2, "byte": 1048576, "record": 10000}},
    }})
    assert len(r.warnings) == 2
    assert any("speed.byte" in w for w in r.warnings)
    assert any("speed.record" in w for w in r.warnings)


def test_jdbc_write_options_mapping():
    """writeMode insert → append; replace → overwrite+truncate (DataX
    replace reloads in place — plain overwrite would drop the table's
    DDL); update → explicit error, never a silent append."""
    from datax_spark.job import jdbc_write_options

    base = {"jdbcUrl": "jdbc:mysql://h/db", "table": ["t"], "username": "u",
            "password": "p", "batchSize": 2048}
    o, mode = jdbc_write_options(base)
    assert mode == "append" and o["dbtable"] == "t" and o["batchsize"] == "2048"

    o2, mode2 = jdbc_write_options({**base, "writeMode": "replace"})
    assert mode2 == "overwrite" and o2["truncate"] == "true"

    with pytest.raises(JobConfigError):
        jdbc_write_options({**base, "writeMode": "update"})
    with pytest.raises(JobConfigError):
        jdbc_write_options({"jdbcUrl": "jdbc:mysql://h/db"})


def test_jdbc_empty_list_params_are_config_errors():
    """An empty list for jdbcUrl/querySql/table must surface as a
    JobConfigError naming the parameter, not a raw IndexError."""
    from datax_spark.job import jdbc_options, jdbc_write_options

    with pytest.raises(JobConfigError, match="jdbcUrl"):
        jdbc_options({"jdbcUrl": [], "table": "t"})
    with pytest.raises(JobConfigError, match="querySql"):
        jdbc_options({"jdbcUrl": "jdbc:mysql://h/db", "querySql": []})
    with pytest.raises(JobConfigError, match="table"):
        jdbc_write_options({"jdbcUrl": "jdbc:mysql://h/db", "table": []})
    with pytest.raises(JobConfigError, match="jdbcUrl"):
        jdbc_options({"table": "t"})


def test_streaming_job_spec_runs_engine_with_resume(spark, wal_fixture, tmp_path):
    """A walreader entry with stream: true + snapshotwriter runs the
    REAL checkpointed streaming engine from the job JSON: first run
    drains all but the withheld segment; re-running the SAME spec after
    the segment lands resumes from the checkpoint and applies only the
    new data, converging to the fixture's expected fold."""
    import os
    import shutil

    import pandas as pd
    from pyspark.sql import functions as F
    from datax_spark.table import SnapshotTable

    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    segs = sorted(f for f in os.listdir(wal_fixture.wal_dir) if f.endswith(".parquet"))
    for f in segs[:-1]:
        shutil.copy(os.path.join(wal_fixture.wal_dir, f), os.path.join(wal, f))

    loc = str(tmp_path / "table")
    spec = {"job": {"content": [{
        "reader": {"name": "walreader",
                   "parameter": {"path": wal, "stream": True,
                                 "schemaEpochs": wal_fixture.schema_epochs_path,
                                 "maxFilesPerTrigger": 2}},
        "writer": {"name": "snapshotwriter",
                   "parameter": {"path": loc, "upsertKey": ["repo", "path"],
                                 "numBuckets": 8,
                                 "checkpoint": str(tmp_path / "ckpt")}},
    }]}}
    r1 = run_job(spark, spec)
    assert r1.rows_written > 0
    v1 = SnapshotTable.load(spark, loc).current()["version"]

    # the withheld segment arrives; same spec, same checkpoint → resume
    shutil.copy(os.path.join(wal_fixture.wal_dir, segs[-1]), os.path.join(wal, segs[-1]))
    run_job(spark, spec)
    t = SnapshotTable.load(spark, loc)
    assert t.current()["version"] > v1

    got = (
        t.snapshot()
        .select("repo", "path", F.sha2(F.col("content"), 256).alias("content_sha256"))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(os.path.join(wal_fixture.expected_dir, "final_hashes.parquet"))
        [["repo", "path", "content_sha256"]]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    with pytest.raises(JobConfigError, match="checkpoint"):
        run_job(spark, {"job": {"content": [{
            "reader": {"name": "walreader",
                       "parameter": {"path": wal, "stream": True,
                                     "schemaEpochs": wal_fixture.schema_epochs_path}},
            "writer": {"name": "snapshotwriter", "parameter": {"path": loc}},
        }]}})


def test_hdfsreader_filetype_dispatch(spark, tmp_path):
    """hdfsreader dispatches on fileType like the reference's DFSUtil;
    the same entry shape reads parquet and csv."""
    import os

    src = spark.range(10).selectExpr("id", "CAST(id * 2 AS STRING) AS v")
    pq = str(tmp_path / "pq")
    src.write.parquet(pq)
    csv = str(tmp_path / "csv")
    src.write.option("header", "true").csv(csv)

    r1 = run_job(spark, {"job": {"content": [{
        "reader": {"name": "hdfsreader",
                   "parameter": {"path": pq, "fileType": "parquet",
                                 "column": ["id", "v"]}},
        "writer": {"name": "memwriter", "parameter": {"view": "hdfs_pq"}},
    }]}})
    assert r1.rows_read == 10
    r2 = run_job(spark, {"job": {"content": [{
        "reader": {"name": "hdfsreader",
                   "parameter": {"path": csv, "fileType": "csv",
                                 "skipHeader": True}},
        "writer": {"name": "memwriter", "parameter": {"view": "hdfs_csv"}},
    }]}})
    assert r2.rows_read == 10
    with pytest.raises(JobConfigError, match="fileType"):
        run_job(spark, {"job": {"content": [{
            "reader": {"name": "hdfsreader",
                       "parameter": {"path": pq, "fileType": "rcfile"}},
            "writer": {"name": "memwriter", "parameter": {}},
        }]}})


def test_job_variable_substitution(spark):
    """${name} variables substitute throughout the spec (the reference
    CLI's -p "-Dname=value" surface, the ${bizdate} idiom of scheduled
    jobs); unknown variables stay literal — lenient like the reference
    — but the job reports them as a warning."""
    spec = {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": "${base}/documents.parquet",
                                 "column": ["doc_id", "lang"],
                                 "where": "lang = '${lang}'"}},
        "writer": {"name": "memwriter",
                   "parameter": {"view": "subst_${lang}_out"}},
    }]}}
    r = run_job(spark, spec, params={"base": SF, "lang": "en"})
    out = spark.table("subst_en_out")
    assert out.count() > 0
    assert out.filter("lang <> 'en'").count() == 0
    assert not r.warnings

    r2 = run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/region.parquet"}},
        "writer": {"name": "memwriter",
                   "parameter": {"view": "subst_${missing}_out"}},
    }]}})
    assert any("${missing}" in w for w in r2.warnings)


def test_jdbc_writer_rejects_presql_postsql(spark):
    """pre/postSql on a jdbc writer would execute against the LOCAL
    Spark catalog, not the target RDBMS (where DataX's WriterUtil runs
    them) — must be an explicit config error, not a wrong-catalog
    TRUNCATE."""
    spec = {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/region.parquet"}},
        "writer": {"name": "jdbcwriter",
                   "parameter": {"jdbcUrl": "jdbc:mysql://h/db", "table": "t",
                                 "preSql": ["TRUNCATE TABLE t"]}},
    }]}}
    with pytest.raises(JobConfigError, match="local Spark catalog"):
        run_job(spark, spec)


def test_partitioned_and_compressed_writes(spark, tmp_path):
    """partitionBy → hive-style layout (downstream partition pruning);
    txtfilewriter compress → gzip part files readable transparently."""
    import os

    pq_dir = str(tmp_path / "part_pq")
    run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/nation.parquet"}},
        "writer": {"name": "parquetwriter",
                   "parameter": {"path": pq_dir, "writeMode": "truncate",
                                 "partitionBy": ["n_regionkey"]}},
    }]}})
    assert any(e.startswith("n_regionkey=") for e in os.listdir(pq_dir))
    n = spark.read.parquet(f"{SF}/nation.parquet").count()
    assert spark.read.parquet(pq_dir).count() == n

    gz_dir = str(tmp_path / "gz_csv")
    run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/region.parquet",
                                 "column": ["r_regionkey", "r_name"]}},
        "writer": {"name": "csvwriter",
                   "parameter": {"path": gz_dir, "writeMode": "truncate",
                                 "header": True, "compress": "gzip"}},
    }]}})
    assert any(f.endswith(".csv.gz") for f in os.listdir(gz_dir))
    back = run_job(spark, {"job": {"content": [{
        "reader": {"name": "csvreader",
                   "parameter": {"path": gz_dir, "skipHeader": True}},
        "writer": {"name": "memwriter", "parameter": {"view": "gz_back"}},
    }]}})
    assert back.rows_read == spark.read.parquet(f"{SF}/region.parquet").count()


def test_run_job_spec_cli_param_parsing():
    """The CLI accepts both the reference's -p "-Dkey=value" shape and
    plain key=value; fused argv keeps argparse from rejecting
    dash-prefixed values."""
    import importlib.util as ilu
    import os

    spec = ilu.spec_from_file_location(
        "run_job_spec",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs", "run_job_spec.py"),
    )
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)

    assert mod.parse_param("-Dbizdate=2026-08-17") == ("bizdate", "2026-08-17")
    assert mod.parse_param("work=/tmp/x") == ("work", "/tmp/x")
    assert mod.parse_param("-Dk=a=b") == ("k", "a=b")
    assert mod._fuse_param_flags(["spec.json", "-p", "-Dk=v", "--cores", "8"]) == [
        "spec.json", "-p=-Dk=v", "--cores", "8"
    ]
    assert mod._fuse_param_flags(["spec.json", "-p", "k=v"]) == ["spec.json", "-p", "k=v"]


def test_jsonl_writer_roundtrip(spark, tmp_path):
    """jsonlwriter emits JSON-lines shards (gzip-compressed, the LLM
    corpus export format) that the jsonreader reads back losslessly."""
    out = str(tmp_path / "jsonl")
    run_job(spark, {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": f"{SF}/documents.parquet",
                                 "column": ["doc_id", "text", "lang"]}},
        "writer": {"name": "jsonlwriter",
                   "parameter": {"path": out, "writeMode": "truncate",
                                 "compress": "gzip"}},
    }]}})
    import glob
    assert glob.glob(f"{out}/*.json.gz"), "shards must be gzip JSONL"
    back = run_job(spark, {"job": {"content": [{
        "reader": {"name": "jsonreader", "parameter": {"path": out}},
        "writer": {"name": "memwriter", "parameter": {"view": "jsonl_back"}},
    }]}})
    orig = spark.read.parquet(f"{SF}/documents.parquet")
    got = spark.table("jsonl_back")
    assert got.count() == orig.count()
    assert {"doc_id", "text", "lang"} == set(got.columns)
    a = {r["doc_id"]: r["text"] for r in got.collect()}
    b = {r["doc_id"]: r["text"] for r in orig.select("doc_id", "text").collect()}
    assert a == b


def test_csv_reader_honors_configured_column_types(spark, tmp_path):
    """Round-3 ADVICE: csv/text readers always inferred schema,
    silently retyping values (leading-zero ids become ints, date-like
    strings become timestamps) — diverging from the reference
    hdfsreader's explicit column-type semantics. With a typed column
    config, inference must be OFF and the declared types honored."""
    csv_dir = str(tmp_path / "typed_csv")
    with open(tmp_path / "typed_csv.csv", "w") as fh:
        fh.write("id|qty|label\n007|3|2024-01-01\n042|9|plain\n")
    import shutil
    import os
    os.makedirs(csv_dir)
    shutil.move(str(tmp_path / "typed_csv.csv"), os.path.join(csv_dir, "part.csv"))

    r = run_job(spark, {
        "job": {"content": [{
            "reader": {"name": "hdfsreader",
                       "parameter": {"path": csv_dir, "fileType": "csv",
                                     "fieldDelimiter": "|", "skipHeader": True,
                                     "column": [
                                         {"index": 0, "type": "string"},
                                         {"index": 1, "type": "long"},
                                         {"index": 2, "type": "string"},
                                     ]}},
            "writer": {"name": "memwriter", "parameter": {"view": "typed_back"}},
        }]}
    })
    back = spark.table("typed_back")
    assert dict(back.dtypes) == {"id": "string", "qty": "bigint", "label": "string"}
    rows = {r["id"]: r for r in back.collect()}
    assert set(rows) == {"007", "042"}          # leading zeros preserved
    assert rows["007"]["qty"] == 3
    assert rows["007"]["label"] == "2024-01-01"  # not retyped to timestamp

    # untyped config keeps the old inference fallback
    r2 = run_job(spark, {
        "job": {"content": [{
            "reader": {"name": "csvreader",
                       "parameter": {"path": csv_dir, "fieldDelimiter": "|",
                                     "skipHeader": True}},
            "writer": {"name": "memwriter", "parameter": {"view": "inferred_back"}},
        }]}
    })
    assert dict(spark.table("inferred_back").dtypes)["id"] == "int"


def test_dedup_index_writer(spark, tmp_path):
    """dedupindexwriter: two job runs = two batches into one persisted
    index + cluster table; union of batches equals one-shot LSH pairs;
    a replayed batchId is a ledger no-op."""
    from datax_spark.dedup_index import ClusterTable, MinHashIndex
    from datax_spark.graph import connected_components
    from datax_spark.textops import minhash_lsh_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    iloc, cloc = str(tmp_path / "mhidx"), str(tmp_path / "mhcl")
    for b in range(2):
        src = str(tmp_path / f"batch{b}")
        docs.filter(F.col("doc_id") % 2 == b).write.parquet(src)
        spec = {"job": {"content": [{
            "reader": {"name": "parquetreader",
                       "parameter": {"path": src, "column": ["doc_id", "text"]}},
            "writer": {"name": "dedupindexwriter",
                       "parameter": {"path": iloc, "clusterPath": cloc,
                                     "batchId": f"b{b}", "numBuckets": 4,
                                     "trackEdges": True}},
        }]}}
        run_job(spark, spec)
        if b == 0:  # replay of the same batch is a no-op on both tables
            vi = MinHashIndex.load(spark, iloc).table.current()["version"]
            run_job(spark, spec)
            assert MinHashIndex.load(spark, iloc).table.current()["version"] == vi

    idx = MinHashIndex.load(spark, iloc)
    assert idx.doc_count() == docs.count()
    expected = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(
            minhash_lsh_pairs(docs, n_bands=4, k=8, stride=4)
        ).collect()
    }
    ct = ClusterTable.load(spark, cloc)
    got = {r["doc_id"]: r["cluster_id"] for r in ct.assignments().collect()}
    assert got == expected
    assert ct.edges is not None  # trackEdges honored → removal-capable


def test_dedup_index_writer_rejects_unknown_kind(spark, tmp_path):
    docs = f"{SF}/documents.parquet"
    spec = {"job": {"content": [{
        "reader": {"name": "parquetreader",
                   "parameter": {"path": docs, "column": ["doc_id", "text"]}},
        "writer": {"name": "dedupindexwriter",
                   "parameter": {"path": str(tmp_path / "x"), "kind": "nope"}},
    }]}}
    with pytest.raises(JobConfigError, match="minhash|embedding"):
        run_job(spark, spec)


def test_dedup_index_writer_warns_on_param_drift(spark, tmp_path):
    """An existing index pins its create-time LSH parameters; a spec
    asking for different ones gets a warning, not silent drift."""
    docs = f"{SF}/documents.parquet"
    loc = str(tmp_path / "mhidx")

    def spec(bands):
        return {"job": {"content": [{
            "reader": {"name": "parquetreader",
                       "parameter": {"path": docs, "column": ["doc_id", "text"]}},
            "writer": {"name": "dedupindexwriter",
                       "parameter": {"path": loc, "batchId": "b0",
                                     "bands": bands, "numBuckets": 4}},
        }]}}

    r1 = run_job(spark, spec(4))
    assert r1.warnings == []
    r2 = run_job(spark, spec(8))  # replayed batch, conflicting bands
    assert any("pins" in w and "bands" in w for w in r2.warnings)
    from datax_spark.dedup_index import MinHashIndex
    assert MinHashIndex.load(spark, loc).n_bands == 4  # create-time wins


def test_snapshotwriter_bootstrap_mode(spark, tmp_path):
    """writeMode=bootstrap stamps the full load at the snapshotLsn
    watermark; a later overlapped update older than the watermark
    must lose LWW, a newer one must win; re-running the bootstrap
    job is an exactly-once no-op."""
    from datax_spark.table import SnapshotTable

    loc = str(tmp_path / "boot_snap")
    src = str(tmp_path / "full_dump.parquet")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "doc_id long, text string"
    ).write.parquet(src)

    spec = {"job": {"content": [{
        "reader": {"name": "parquetreader", "parameter": {"path": src}},
        "writer": {"name": "snapshotwriter",
                   "parameter": {"path": loc, "upsertKey": ["doc_id"],
                                 "writeMode": "bootstrap", "snapshotLsn": 100,
                                 "numBuckets": 4}},
    }]}}
    r1 = run_job(spark, spec)
    assert r1.rows_written == 20
    table = SnapshotTable.load(spark, loc)
    assert table.snapshot().count() == 20
    assert {e["source"] for e in table.lineage()} == {"snapshot:bootstrap"}

    # exactly-once: same batchId → skipped commit, no state change
    r2 = run_job(spark, spec)
    assert r2.commit.skipped and table.snapshot().count() == 20

    # overlapped WAL events: lsn 50 (pre-watermark) loses, 150 wins
    overlap = spark.createDataFrame(
        [(1, "old", 50, "U"), (2, "new", 150, "U")],
        "doc_id long, text string, lsn long, op string",
    )
    table.merge(overlap, batch_id="tail-1")
    got = {r.doc_id: r.text for r in table.snapshot().collect()}
    assert got[1] == "v1" and got[2] == "new"


def test_snapshotwriter_bootstrap_requires_watermark(spark, tmp_path):
    src = str(tmp_path / "dump2.parquet")
    spark.createDataFrame([(1, "x")], "doc_id long, text string").write.parquet(src)
    with pytest.raises(JobConfigError):
        run_job(spark, {"job": {"content": [{
            "reader": {"name": "parquetreader", "parameter": {"path": src}},
            "writer": {"name": "snapshotwriter",
                       "parameter": {"path": str(tmp_path / "t"),
                                     "upsertKey": ["doc_id"],
                                     "writeMode": "bootstrap"}},
        }]}})


def test_streaming_job_spec_mor_strategy(spark, wal_fixture, tmp_path):
    """mergeStrategy: mor on the streaming snapshotwriter drives the
    engine's merge-on-read tail from job JSON: final state sha-equals
    the fixture fold, inline compaction bounded every bucket's delta
    count, and a bogus strategy fails loudly."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F
    from datax_spark.table import SnapshotTable

    loc = str(tmp_path / "table")
    spec = {"job": {"content": [{
        "reader": {"name": "walreader",
                   "parameter": {"path": wal_fixture.wal_dir, "stream": True,
                                 "schemaEpochs": wal_fixture.schema_epochs_path,
                                 "maxFilesPerTrigger": 1}},
        "writer": {"name": "snapshotwriter",
                   "parameter": {"path": loc, "upsertKey": ["repo", "path"],
                                 "numBuckets": 8,
                                 "checkpoint": str(tmp_path / "ckpt"),
                                 "mergeStrategy": "mor",
                                 "morCompactThreshold": 2}},
    }]}}
    run_job(spark, spec)
    t = SnapshotTable.load(spark, loc)
    assert all(n < 2 for n in t.delta_counts().values())
    got = (
        t.snapshot()
        .select("repo", "path", F.sha2(F.col("content"), 256).alias("content_sha256"))
        .toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    exp = (
        pd.read_parquet(os.path.join(wal_fixture.expected_dir, "final_hashes.parquet"))
        [["repo", "path", "content_sha256"]]
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp)

    bad = {"job": {"content": [{
        "reader": spec["job"]["content"][0]["reader"],
        "writer": {"name": "snapshotwriter",
                   "parameter": {"path": loc, "checkpoint": str(tmp_path / "ck2"),
                                 "mergeStrategy": "merge-on-read"}},
    }]}}
    with pytest.raises(JobConfigError, match="mergeStrategy"):
        run_job(spark, bad)


def test_batch_job_spec_mor_strategy(spark, tmp_path):
    """Batch snapshotwriter honors mergeStrategy: mor — repeated runs
    land deltas, cross the threshold, compact, and the final state
    matches the same spec run under cow."""
    import pandas as pd

    from datax_spark.table import SnapshotTable

    src = str(tmp_path / "src")
    pd.DataFrame(
        {"repo": ["r"] * 4, "path": [f"p{i}" for i in range(4)],
         "content": [f"c{i}" for i in range(4)],
         "lsn": [1, 2, 3, 4], "op": ["U"] * 4}
    ).to_parquet(src + ".parquet")

    def spec(loc, strategy, batch_id):
        return {"job": {"content": [{
            "reader": {"name": "parquetreader", "parameter": {"path": src + ".parquet"}},
            "writer": {"name": "snapshotwriter",
                       "parameter": {"path": loc, "upsertKey": ["repo", "path"],
                                     "numBuckets": 4, "batchId": batch_id,
                                     "mergeStrategy": strategy,
                                     "morCompactThreshold": 2}},
        }]}}

    for strategy in ("cow", "mor"):
        loc = str(tmp_path / strategy)
        for b in range(3):
            run_job(spark, spec(loc, strategy, f"b{b}"))
        # identical content (batch b re-lands the same rows; ledger
        # makes b1/b2 no-ops under distinct ids only if ids repeat —
        # here ids differ so LWW ties resolve to first applied)
    cow = SnapshotTable.load(spark, str(tmp_path / "cow"))
    mor = SnapshotTable.load(spark, str(tmp_path / "mor"))
    a = sorted((r["repo"], r["path"], r["content"]) for r in cow.snapshot().collect())
    b = sorted((r["repo"], r["path"], r["content"]) for r in mor.snapshot().collect())
    assert a == b
    assert all(n < 2 for n in mor.delta_counts().values())
