"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry and its
``oracle_sql()`` twin on the same sf dir, compares row count, column
names, and an order-insensitive value hash (columns sorted by name,
rows sorted, values canonicalized). Usage:

    python oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, Decimal):
        # STRICT on purpose (r11 driver-red lesson): collapsing
        # Decimal->float here made the local gate blind to the
        # decimal-vs-double seam the driver's hash catches
        # (Decimal('3916451.10') vs 3916451.1). Preserve scale and
        # trailing zeros so Spark DECIMAL output only matches a
        # DuckDB DECIMAL of identical value+scale.
        return format(v, "f")
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(name: str, spark_df, duck_rel) -> dict:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols = [d[0] for d in duck_rel.description]
    d_rows = duck_rel.fetchall()

    result = {
        "query": name,
        "spark_rows": len(s_rows),
        "oracle_rows": len(d_rows),
        "rows_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
    }
    if result["rows_match"] and result["schema_match"]:
        cs = canonical_rows(s_cols, s_rows)
        cd = canonical_rows(d_cols, d_rows)
        result["values_match"] = cs == cd
        if not result["values_match"]:
            diff = [
                (a, b) for a, b in zip(cs, cd) if a != b
            ][:3]
            result["first_diffs"] = diff
    else:
        result["values_match"] = False
        result["spark_cols"] = s_cols
        result["oracle_cols"] = d_cols
    return result


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from declarative_dataflow_spark.session import build_session

    spark = build_session("oracle-check", master="local[8]", shuffle_partitions=8)

    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Reap the previous query's localCheckpoint scratch blocks
        # (ContextCleaner needs a driver GC to enqueue their weak
        # refs) — across the 148-query marathon, leaked blocks squeeze
        # the single local-mode JVM into a uniform later-query tax
        # (the r7 drift, same discipline as bench.py). Between
        # queries, so no in-flight accumulators can be hit.
        spark.sparkContext._jvm.System.gc()
        try:
            sdf = fn(spark, sf_dir)
            if name not in oracles:
                n = sdf.count()
                print(f"{name:24s} rows-only: {n}")
                continue
            res = compare(name, sdf, con.sql(oracles[name]))
        except Exception as exc:  # noqa: BLE001
            print(f"{name:24s} ERROR: {type(exc).__name__}: {exc}")
            failures += 1
            continue
        ok = res["rows_match"] and res["schema_match"] and res["values_match"]
        status = "OK " if ok else "FAIL"
        print(
            f"{name:24s} {status} rows={res['spark_rows']}/{res['oracle_rows']}"
            + ("" if ok else f" detail={ {k: v for k, v in res.items() if k not in ('query',)} }")
        )
        failures += 0 if ok else 1
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
