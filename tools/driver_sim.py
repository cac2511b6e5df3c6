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


# --- dtype strictness -------------------------------------------------
# The driver's hasher is dtype-sensitive: it canonicalizes through
# pandas, so DuckDB HUGEINT (int128) vs Spark BIGINT, or DECIMAL cells
# (DuckDB → float64, Spark → decimal.Decimal objects), hash differently
# even when every value is equal. That cost green rows in BOTH round 1
# (ndarray crash) and round 2 (five HUGEINT/DECIMAL repr-fails), so the
# simulator now rejects those representations outright and requires the
# two sides' column *kinds* to line up, not just their values.

_SPARK_KIND = {
    "tinyint": "int", "smallint": "int", "int": "int", "bigint": "int",
    "float": "float", "double": "float",
    "string": "str", "boolean": "bool", "binary": "bytes",
    "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}

_DUCK_KIND = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "UTINYINT": "int", "USMALLINT": "int", "UINTEGER": "int", "UBIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
    "VARCHAR": "str", "BOOLEAN": "bool", "BLOB": "bytes",
    "DATE": "date", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
    "TIMESTAMP WITH TIME ZONE": "ts",
}


def spark_kind(dtype: str) -> str:
    """Map a Spark simpleString dtype to a comparison kind, or REJECT:…"""
    if dtype.startswith("decimal"):
        return "REJECT:spark DECIMAL (driver hashes Decimal objects differently)"
    if dtype.startswith(("array", "map", "struct")):
        return f"REJECT:spark nested type {dtype} (driver canonicalizer cannot hash it)"
    return _SPARK_KIND.get(dtype, f"REJECT:spark unknown dtype {dtype}")


def duck_kind(dtype: str) -> str:
    """Map a DuckDB type string to a comparison kind, or REJECT:…"""
    s = str(dtype).upper()
    if s == "HUGEINT":
        return "REJECT:oracle HUGEINT (list_sum/sum on ints — CAST(... AS BIGINT))"
    if s.startswith("DECIMAL"):
        return "REJECT:oracle DECIMAL (CAST to DOUBLE or BIGINT)"
    if s.endswith("[]") or s.startswith(("STRUCT", "MAP", "LIST", "UNION")):
        return f"REJECT:oracle nested type {s}"
    return _DUCK_KIND.get(s, f"REJECT:oracle unknown type {s}")


def dtype_violations(spark_dtypes, duck_cols, duck_types) -> list[str]:
    """Strict cross-engine dtype check. ``spark_dtypes`` is
    ``df.dtypes`` (name → simpleString); ``duck_cols``/``duck_types``
    come from the DuckDB relation. Returns human-readable violations
    (empty = clean). Columns are matched by sorted name, mirroring the
    driver's sort-columns-by-name canonicalization."""
    out = []
    skinds = {name: spark_kind(dt) for name, dt in spark_dtypes}
    dkinds = {name: duck_kind(dt) for name, dt in zip(duck_cols, duck_types)}
    for name in sorted(set(skinds) | set(dkinds)):
        sk, dk = skinds.get(name), dkinds.get(name)
        for k in (sk, dk):
            if k and k.startswith("REJECT:"):
                out.append(f"{name}: {k[7:]}")
        if sk and dk and not sk.startswith("REJECT") and not dk.startswith("REJECT"):
            if sk != dk:
                out.append(f"{name}: kind mismatch spark={sk} oracle={dk}")
    return out


def main() -> int:
    argv = list(sys.argv[1:])
    only = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    tz = None
    if "--tz" in argv:
        i = argv.index("--tz")
        tz = argv[i + 1]
        del argv[i : i + 2]
    args = [a for a in argv if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

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
    if only is not None:
        missing = only - set(queries)
        assert not missing, f"--only names not in registry: {sorted(missing)}"
        queries = {n: f for n, f in queries.items() if n in only}
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
            viol = dtype_violations(sdf.dtypes, ocols_raw, odf.types)
            order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
            ocols = [ocols_raw[i] for i in order]
            orows = sorted((tuple(norm(r[i]) for i in order) for r in odf.fetchall()), key=repr)
            if viol:
                print(f"FAIL {name}: dtype {viol}")
                n_fail += 1
            elif scols != ocols:
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
