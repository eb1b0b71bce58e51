"""Ad-hoc pair verifier: run named queries() entries against their DuckDB
oracles at one or more scale factors, optionally under a driver-like
session (non-UTC tz, ANSI on, 200 shuffle partitions) — the same compare
as tests/test_driver_queries.py, for fast iteration on new pairs.

Usage: python tools/verify_pairs.py [--driverlike] name [name ...]
"""

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 6)
    return v


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    driverlike = "--driverlike" in sys.argv
    import __spark_entry__ as em

    if driverlike:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify-driverlike")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.ansi.enabled", "true")
            .config("spark.sql.shuffle.partitions", "200")
            .getOrCreate()
        )
    else:
        from search_engine_spark.session import get_spark

        spark = get_spark("verify-pairs", master="local[8]", shuffle_partitions=8)

    failed = False
    for sf in SFS:
        con = duckdb.connect()
        for t in TABLES:
            p = f"{sf}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        for name in args:
            sdf = em.queries()[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            res = con.execute(em.oracle_sql()[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            sr = sorted(tuple(norm(r[i]) for i in so) for r in srows)
            dr = sorted(tuple(norm(r[i]) for i in do) for r in drows)
            cols_ok = [scols[i] for i in so] == [dcols[i] for i in do]
            ok = cols_ok and len(sr) == len(dr) and sr == dr
            ddf = con.execute(em.oracle_sql()[name]).df()
            kinds = {c: ddf[c].dtype.kind for c in ddf.columns}
            bad_kind = [c for c, k in kinds.items() if k not in "biufO"]
            print(
                sf.split("/")[-1], name,
                "OK" if ok else "FAIL",
                f"rows={len(sr)}/{len(dr)}",
                ("dtypes_ok" if not bad_kind else f"BAD_DTYPES={bad_kind}"),
            )
            if not ok:
                failed = True
                if not cols_ok:
                    print("  cols:", [scols[i] for i in so], "vs", [dcols[i] for i in do])
                print("  diff:", [(a, b) for a, b in zip(sr, dr) if a != b][:3])
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
