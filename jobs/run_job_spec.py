"""spark-submit entry point: execute a DataX-style job-spec JSON.

The CLI analogue of the reference's `datax.py job.json -p "-Dkey=value"`:

    spark-submit --py-files dist/engine.zip jobs/run_job_spec.py \
        examples/job_specs/parquet_to_csv.json \
        -p "-Dbizdate=2026-08-17" -p "-Dwork=/data/out"

Accepts both the reference's `-Dkey=value` param shape and plain
`key=value`. Prints ONE JSON line of Communication-style counters
(rows/bytes read+written, dirty records, warnings, wall seconds) on
stdout — machine-parseable like the reference's end-of-job report.
Batch AND streaming entries both run (a walreader with stream: true +
snapshotwriter drives the checkpointed engine; see
examples/job_specs/stream_wal_to_snapshot.json).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datax_spark.job import run_job  # noqa: E402
from datax_spark.session import get_spark  # noqa: E402


def parse_param(raw: str) -> tuple[str, str]:
    s = raw.strip()
    if s.startswith("-D"):
        s = s[2:]
    if "=" not in s:
        raise argparse.ArgumentTypeError(
            f"param {raw!r} must look like -Dkey=value or key=value"
        )
    k, v = s.split("=", 1)
    return k, v


def _fuse_param_flags(argv: list[str]) -> list[str]:
    """argparse rejects option VALUES that start with '-', which is
    exactly the reference's `-p "-Dkey=value"` shape — fuse the pair
    into `-p=-Dkey=value` so both CLI styles work verbatim."""
    out, i = [], 0
    while i < len(argv):
        a = argv[i]
        if a in ("-p", "--param") and i + 1 < len(argv) and argv[i + 1].startswith("-D"):
            out.append(f"{a}={argv[i + 1]}")
            i += 2
        else:
            out.append(a)
            i += 1
    return out


def main(argv: list[str] | None = None) -> int:
    argv = _fuse_param_flags(sys.argv[1:] if argv is None else list(argv))
    ap = argparse.ArgumentParser()
    ap.add_argument("spec", help="job-spec JSON file (DataX job shape)")
    ap.add_argument(
        "-p", "--param", action="append", default=[], type=parse_param,
        metavar='"-Dkey=value"',
        help="job variable (repeatable); substitutes ${key} in the spec",
    )
    ap.add_argument("--cores", type=int, default=None,
                    help="local[k] cores for ad-hoc runs (default: session default)")
    args = ap.parse_args(argv)

    with open(args.spec) as f:
        spec = json.load(f)
    spark = get_spark(app_name="datax-job", **({"cores": args.cores} if args.cores else {}))
    r = run_job(spark, spec, params=dict(args.param))
    print(json.dumps({
        "spec": args.spec,
        "rows_read": r.rows_read,
        "rows_written": r.rows_written,
        "bytes_read": r.bytes_read,
        "bytes_written": r.bytes_written,
        "dirty_records": r.dirty_records,
        "warnings": r.warnings,
        "wall_sec": round(r.wall_sec, 3),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
