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

    python tools/make_shuffled_fixture.py /tmp/sf_shuffled
    python tools/driver_sim.py /tmp/sf_shuffled

A FAIL here that the plain sf0.001 run does not show is an
order-dependence bug in either the Spark query or its DuckDB oracle.
"""
import os
import sys

import numpy as np
import pyarrow.parquet as pq

SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_shuffled"
os.makedirs(DST, exist_ok=True)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
    perm = np.random.RandomState(42 + len(t)).permutation(tbl.num_rows)
    shuffled = tbl.take(perm)
    pq.write_table(shuffled, os.path.join(DST, f"{t}.parquet"))
    print(t, tbl.num_rows)
