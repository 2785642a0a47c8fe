"""Quick driver-contract check (the verify recipe's surface 2).

Runs every queries() entry against its oracle_sql() through DuckDB on
the given sf dir and prints one line per query: ORACLE_MATCH /
ORACLE_MISMATCH / ROWS_ONLY / ERROR. Exit code 0 iff nothing
mismatched or errored.

    PYTHONPATH=/root/repo python scripts/check_queries.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import duckdb

    import __spark_entry__ as entry_mod
    from datax_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="check_queries", cores=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    from datax_spark.queries import DEMOTED_ORACLES, DEMOTED_QUERIES

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    # demoted queries are outside the driver surface but keep full
    # oracle checks here (and in pytest)
    qs = {**qs, **DEMOTED_QUERIES}
    oracles = {**oracles, **DEMOTED_ORACLES}
    failed = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            sdf = qs[name](spark, sf_dir)
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"ROWS_ONLY     {name}: {len(s_rows)} rows")
                continue
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
            idx = [d_cols.index(c) for c in sdf.columns]
            d_rows = [tuple(r[i] for i in idx) for r in d_rows]

            def norm(rows):
                out = []
                for r in rows:
                    out.append(tuple(
                        round(float(v), 6)
                        if isinstance(v, float) or type(v).__name__ == "Decimal" else v
                        for v in r))
                return sorted(out, key=lambda r: tuple(map(str, r)))

            sn, dn = norm(s_rows), norm(d_rows)
            ok = len(sn) == len(dn) and all(
                all(
                    (isinstance(a, float) and isinstance(b, float)
                     and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)) or a == b
                    for a, b in zip(x, y)
                )
                for x, y in zip(sn, dn)
            )
            if ok:
                print(f"ORACLE_MATCH  {name}: {len(sn)} rows")
            else:
                print(f"ORACLE_MISMATCH {name}: spark={len(sn)} duckdb={len(dn)}")
                failed.append(name)
        except Exception as e:  # noqa: BLE001
            print(f"ERROR         {name}: {type(e).__name__}: {str(e)[:150]}")
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print("ALL_OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
