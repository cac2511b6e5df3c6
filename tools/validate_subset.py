"""Validate a subset of registry queries against their DuckDB oracles.

Usage: python tools/validate_subset.py q1 q2 ... [--sf sf0.001,sf0.01]
       python tools/validate_subset.py --prefix olap_ --sf sf0.01

Same compare semantics as driver_sim (dtype-strict, order-insensitive
value multiset, floats at 1e-6) but only for the named queries — the
fast loop while building a new operator. Full-registry validation
before committing still goes through driver_sim.
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from driver_sim import TABLES, dtype_violations, norm  # noqa: E402


def main() -> int:
    argv = sys.argv[1:]
    flag_values = {
        argv[i + 1]
        for i, a in enumerate(argv)
        if a in ("--sf", "--prefix") and i + 1 < len(argv)
    }
    names = [a for a in argv if not a.startswith("--") and a not in flag_values]
    sfs = ["sf0.001", "sf0.01"]
    if "--sf" in argv:
        sfs = argv[argv.index("--sf") + 1].split(",")
    prefix = None
    if "--prefix" in argv:
        prefix = argv[argv.index("--prefix") + 1]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("validate-subset")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    queries = e.queries()
    oracles = e.oracle_sql()
    if prefix:
        names = names + [n for n in queries if n.startswith(prefix)]
    unknown = [n for n in names if n not in queries]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2

    n_fail = 0
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for name in names:
            t0 = time.time()
            try:
                sdf = queries[name](spark, sf_dir)
                scols = sorted(sdf.columns)
                srows = sorted(
                    (tuple(norm(r[c]) for c in scols) for r in sdf.collect()),
                    key=repr,
                )
                if name not in oracles:
                    print(f"[{sf}] ROWS-ONLY {name}: {len(srows)} rows")
                    continue
                odf = con.sql(oracles[name])
                ocols_raw = list(odf.columns)
                viol = dtype_violations(sdf.dtypes, ocols_raw, odf.types)
                order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
                ocols = [ocols_raw[i] for i in order]
                orows = sorted(
                    (tuple(norm(r[i]) for i in order) for r in odf.fetchall()),
                    key=repr,
                )
                if viol:
                    print(f"[{sf}] FAIL {name}: dtype {viol}")
                    n_fail += 1
                elif scols != ocols:
                    print(f"[{sf}] FAIL {name}: cols spark={scols} oracle={ocols}")
                    n_fail += 1
                elif srows != orows:
                    diff = [(s, o) for s, o in zip(srows, orows) if s != o]
                    only_s = [r for r in srows if r not in orows][:2]
                    only_o = [r for r in orows if r not in srows][:2]
                    print(
                        f"[{sf}] FAIL {name}: rows spark={len(srows)} "
                        f"oracle={len(orows)} first-diff={diff[:1]} "
                        f"only_spark={only_s} only_oracle={only_o}"
                    )
                    n_fail += 1
                else:
                    print(
                        f"[{sf}] PASS {name}: {len(srows)} rows "
                        f"({time.time()-t0:.1f}s)"
                    )
            except Exception as ex:
                print(f"[{sf}] ERROR {name}: {type(ex).__name__}: {ex}")
                n_fail += 1
        con.close()
    print(f"SUBSET VERDICT: fail={n_fail}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
