"""Local stand-in for the driver's correctness gate: run every
__spark_entry__.queries() entry at sf0.01 and compare against its
oracle_sql() in DuckDB — row count, column names, and order-insensitive
value comparison (columns sorted by name, rows sorted)."""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime

    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.10g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def frame_sig(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    names = [cols[i] for i in order]
    body = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return names, body


def main():
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:32s} rows-only: {len(srows):7d} rows  ({dt:.1f}s)")
            continue
        ocols = [d[0] for d in con.execute(oracles[name]).description]
        orows = con.execute(oracles[name]).fetchall()
        sn, sb = frame_sig(scols, [tuple(r) for r in srows])
        on, ob = frame_sig(ocols, orows)
        ok_cols = sn == on
        ok_rows = len(sb) == len(ob)
        ok_vals = sb == ob
        status = "OK " if (ok_cols and ok_rows and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:32s} {status} rows={len(sb)}/{len(ob)} cols={ok_cols} "
              f"vals={ok_vals}  ({dt:.1f}s)")
        if not ok_cols:
            print(f"    spark cols:  {sn}\n    oracle cols: {on}")
        if ok_cols and ok_rows and not ok_vals:
            for a, b in zip(sb, ob):
                if a != b:
                    print(f"    first diff:\n      spark:  {a}\n      oracle: {b}")
                    break
    print("FAILURES:", failures)
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
