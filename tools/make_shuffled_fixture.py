"""Build a row-SHUFFLED twin of a fixture dir: identical rows and
schemas, deterministically permuted physical row order (seeded numpy
permutation per table; pyarrow read -> take -> write).

Why this exists: every other sweep (3 SFs, TZ probes, MOD-subset
perturbations) reads the SAME physical row order the fixtures shipped
with, so a query whose result silently depends on scan order — a
``first()`` without a full ordering, a tie broken by arrival, a limit
racing a non-total sort — passes every one of them and still diverges
the day the driver regenerates fixtures with a different writer
parallelism. Relational results must be a function of the SET of rows;
this differential makes order-dependence observable:

    python tools/make_shuffled_fixture.py --dst /tmp/sf_shuffled
    python tools/driver_sim.py /tmp/sf_shuffled

A FAIL here that the plain sf0.001 run does not show is an
order-dependence bug in either the Spark query or its DuckDB oracle.
"""
import argparse
import os
import zlib

import numpy as np
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument(
        "--src", default="/root/testdata/sf0.001",
        help="fixture dir to read (never written)",
    )
    ap.add_argument(
        "--dst", default="/tmp/sf_shuffled",
        help="output dir for the shuffled twin",
    )
    # legacy positional form was (DST, SRC) — reject positionals
    # outright so a habitual `tool.py <fixture_dir>` can no longer
    # overwrite the named directory with shuffled output (ADVICE r6)
    args = ap.parse_args()
    if os.path.abspath(args.src) == os.path.abspath(args.dst):
        ap.error("--src and --dst must differ")
    os.makedirs(args.dst, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(os.path.join(args.src, f"{t}.parquet"))
        # seed by a hash of the NAME: len()-based seeds collided for
        # customer/supplier/lineitem, giving same-length tables the
        # same permutation stream (ADVICE r6)
        seed = zlib.crc32(t.encode()) & 0x7FFFFFFF
        perm = np.random.RandomState(seed).permutation(tbl.num_rows)
        pq.write_table(tbl.take(perm), os.path.join(args.dst, f"{t}.parquet"))
        print(t, tbl.num_rows)


if __name__ == "__main__":
    main()
