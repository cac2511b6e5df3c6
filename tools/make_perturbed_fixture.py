"""Build a perturbed twin of a fixture dir: deterministic row
subsample (key % MOD == 0) of the keyed tables, dims kept whole,
schemas byte-identical (pyarrow read -> filter -> write).

Why this exists: the round driver has REGENERATED fixtures mid-round
before (NOTES trap 2/25), so every query must agree with its DuckDB
oracle on data it was not tuned on — including degenerate shapes
(orphaned FKs appear naturally: orders keeps rows whose customer was
dropped). Run the differential with:

    python tools/make_perturbed_fixture.py /tmp/sf_perturb 2
    python tools/driver_sim.py /tmp/sf_perturb

A FAIL here is a latent cross-engine divergence that a fixture regen
could surface in a driver grading run. Round-5 status: 258/29/0 at
MOD=2 and MOD=8 (logs in tools/logs/).
"""
import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
DST = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_perturb"
MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 2
os.makedirs(DST, exist_ok=True)
KEY = {
    "orders": "o_orderkey", "lineitem": "l_orderkey", "events": "event_id",
    "documents": "doc_id", "embeddings": "vec_id", "customer": "c_custkey",
}
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
for t in TABLES:
    tbl = pq.read_table(os.path.join(SRC, f"{t}.parquet"))
    k = KEY.get(t)
    if k is not None:
        keep = pc.equal(
            pc.cast(pc.bit_wise_and(pc.cast(tbl[k], pa.int64()), MOD - 1),
                    pa.int64()),
            0,
        )
        tbl = tbl.filter(keep)
    pq.write_table(tbl, os.path.join(DST, f"{t}.parquet"))
    print(t, tbl.num_rows)
