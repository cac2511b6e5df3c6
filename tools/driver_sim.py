"""Driver simulator — drives the repo exactly the way the round driver does.

Usage: python tools/driver_sim.py [sf_dir] [--tz TZ]

Builds a *vanilla* SparkSession (none of the engine's confs — the real
driver owns its session), imports ``__spark_entry__`` from the repo
root, then:
  1. smoke: entry(spark) → row count, schema
  2. for every queries() entry: run on sf_dir, compare to oracle_sql()
     via DuckDB (row count + sorted-column names + order-insensitive
     value multiset, floats at 1e-6)
Prints one line per query and a final verdict line.
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    tz = None
    if "--tz" in sys.argv:
        tz = sys.argv[sys.argv.index("--tz") + 1]

    from pyspark.sql import SparkSession

    b = SparkSession.builder.master("local[8]").appName("driver-sim").config(
        "spark.ui.enabled", "false"
    )
    if tz:
        b = b.config("spark.sql.session.timeZone", tz)
    spark = b.getOrCreate()

    import __spark_entry__ as e

    t0 = time.time()
    df = e.entry(spark)
    rows = df.collect()
    print(f"SMOKE entry(): {len(rows)} rows, cols={df.columns} "
          f"({time.time()-t0:.1f}s)")
    assert len(rows) > 0

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = e.queries()
    oracles = e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name in sorted(queries):
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = sorted((tuple(norm(r[c]) for c in scols) for r in sdf.collect()), key=repr)
            if name not in oracles:
                print(f"ROWS-ONLY {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
                n_rows_only += 1
                continue
            odf = con.sql(oracles[name])
            ocols_raw = list(odf.columns)
            order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
            ocols = [ocols_raw[i] for i in order]
            orows = sorted((tuple(norm(r[i]) for i in order) for r in odf.fetchall()), key=repr)
            if scols != ocols:
                print(f"FAIL {name}: cols spark={scols} oracle={ocols}")
                n_fail += 1
            elif srows != orows:
                diff = [(s, o) for s, o in zip(srows, orows) if s != o]
                print(
                    f"FAIL {name}: rows spark={len(srows)} oracle={len(orows)}"
                    f" first-diff={diff[:1]}"
                )
                n_fail += 1
            else:
                print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
                n_pass += 1
        except Exception as ex:
            print(f"ERROR {name}: {type(ex).__name__}: {ex}")
            n_fail += 1
    print(f"VERDICT: pass={n_pass} rows_only={n_rows_only} fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
