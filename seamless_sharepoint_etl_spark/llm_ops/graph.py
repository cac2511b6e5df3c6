"""Graph analytics over the similarity graph (north-star tier).

Provenance: SURVEY.md §2 Tier B extension — the dedup family already
builds a near-duplicate *graph* (edges = vector pairs above
``similarity.NEARDUP_COS``) and consumes it as connected components
(``dedup.neardup_clusters``) and PageRank exemplars
(``dedup.neardup_pagerank``). These operators complete the standard
graph-shaped questions a curation pipeline asks of that graph:
how clustered is it (triangles / clustering coefficient — dense
near-dup cliques mean template spam), and what does its degree
distribution look like (hub documents that near-match everything are
boilerplate magnets).

Both are pure DataFrame joins/aggregations over the edge relation —
the distributed-triangle shape is the textbook one: orient every edge
low→high, two-hop join on the middle vertex, then close the wedge with
a semi-join against the edge set. Every exchange is keyed by vertex
id, so at 100 TB the plan is three hash-partitioned joins over an
edge list, never an adjacency matrix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import io, portable
from .dedup import NGRAM_JACCARD_SQL
from .similarity import (
    EMBEDDING_NEARDUP_SQL,
    embedding_neardup,
    embedding_neardup_sql,
)


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oriented (id_lo < id_hi) near-dup edge relation."""
    return embedding_neardup(spark, sf_dir).select("id_lo", "id_hi")


# kcore-specific edge threshold, deliberately below NEARDUP_COS: the
# 0.42 near-dup graph's 2-core is EMPTY at every fixture SF (27 edges
# at sf0.001, 34 at sf0.01 — measured), so a peel over it never
# exercises the surviving-core path (the round-6 verdict's
# "verification vacuum"). At 0.34 the fixtures carry a ~100-vertex
# 2-core at both SFs, so the driver's rows-only record, the bench
# entry, and the Python-re-peel differential all run the loop's real
# exit (n == prev_n > 0) and the core_degree reporting.
KCORE_EDGE_COS = 0.34


def _kcore_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denser oriented edge relation for the k-core peel (see
    KCORE_EDGE_COS). Same blocked-BLAS generator as _edges — only the
    admission threshold differs."""
    return embedding_neardup(spark, sf_dir, threshold=KCORE_EDGE_COS).select(
        "id_lo", "id_hi"
    )


def _degrees(e: DataFrame, out: str = "d") -> DataFrame:
    """(v, <out>) undirected degree relation — ONE definition of
    'degree' (count of incident edges, both endpoint columns) feeding
    the census, histogram, modularity, and assortativity so the four
    cannot silently disagree."""
    return (
        e.select(F.col("id_lo").alias("v"))
        .unionAll(e.select(F.col("id_hi").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias(out))
    )


# the oracle-side twin of _degrees — interpolate into each SQL oracle
_DEG_CTE = """
  SELECT v, count(*) AS d
  FROM (SELECT id_lo AS v FROM edges UNION ALL SELECT id_hi FROM edges)
  GROUP BY v
"""


def triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global triangle census of the near-dup graph: edge/wedge/triangle
    counts plus the transitivity ratio (3×triangles / wedges).

    Shape: edges are already oriented lo<hi, so each triangle
    {a<b<c} is counted exactly once as e(a,b)⋈e(b,c) closed by
    e(a,c) — a two-hop equi-join on the shared vertex and one
    LEFT SEMI join against the edge set; wedges come from the degree
    relation as Σ deg·(deg−1)/2. All joins are vertex-keyed shuffles
    (or AQE-broadcast when one side is small); nothing is quadratic
    in vertices. The ratio divides two BIGINTs in one double op —
    bit-identical across engines, emitted as basis points.
    """
    e = _edges(spark, sf_dir)
    e.persist()
    ab = e.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("b"))
    bc = e.select(F.col("id_lo").alias("b"), F.col("id_hi").alias("c"))
    ac = e.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("c"))
    tri = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = _degrees(e)
    wedge = deg.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"),
    )
    edges = e.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        edges.crossJoin(wedge)
        .crossJoin(tri)
        .select(
            "n_edges",
            "n_vertices",
            "n_wedges",
            "n_triangles",
            F.when(F.col("n_wedges") > 0,
                   F.floor(3.0 * F.col("n_triangles") / F.col("n_wedges") * 10000
                           + F.lit(0.5)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            .alias("transitivity_bp"),
        )
    )


TRIANGLE_STATS_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
tri AS (
  SELECT count(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.id_hi = e2.id_lo
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.id_lo = e1.id_lo AND e3.id_hi = e2.id_hi)
),
deg AS ({_DEG_CTE}),
wedge AS (
  SELECT count(*) AS n_vertices,
         CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges
  FROM deg
),
ecnt AS (SELECT count(*) AS n_edges FROM edges)
SELECT n_edges, n_vertices, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0
            THEN CAST(floor(3.0 * n_triangles / n_wedges * 10000 + 0.5) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS transitivity_bp
FROM ecnt, wedge, tri
"""


def degree_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the near-dup graph: how many vertices
    have each degree. Two vertex-keyed hash aggregations — the shape
    that turns a 100 TB edge list into a k-row histogram with one
    shuffle each.
    """
    e = _edges(spark, sf_dir)
    deg = _degrees(e, "degree")
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("degree")
    )


DEGREE_HISTOGRAM_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
deg AS ({_DEG_CTE})
SELECT d AS degree, count(*) AS n_vertices
FROM deg GROUP BY d ORDER BY degree
"""


KCORE_K = 2
KCORE_MAX_ROUNDS = 50


def kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition (k=2) of the near-dup graph — the standard
    "dense boilerplate cluster" extractor: iteratively peel vertices
    with degree < k until the remaining subgraph's minimum degree is
    ≥ k. The 2-core drops every pendant chain and keeps only vertices
    that sit on cycles of near-duplication — template spam, not
    coincidental pairs.

    Distributed peel: each round is (a) restrict edges to surviving
    vertices — two vertex-keyed semi-joins, (b) recount degrees — one
    vertex-keyed aggregate, (c) filter. Rounds are data-dependent
    (peel depth, not diameter), so per-round relations are
    ``localCheckpoint(eager=True)``, not persist — persist does NOT
    truncate lineage (NOTES trap 16) and the peel's nested semi-join
    plan OOMed the DRIVER on plan bookkeeping inside the bench's
    long-lived session; the eager checkpoint cuts each round to a
    leaf, and dropping the Python refs lets the ContextCleaner reclaim
    prior rounds' blocks. Converges when the vertex count stops
    shrinking; a round cap raises rather than silently returning a
    non-core (same backstop policy as the CC labeler). Exactly oracled
    since round 8: the peel is a monotone fixpoint, so DuckDB's
    WITH RECURSIVE expresses it (KCORE_SQL below) — each iteration
    carries the full survivor set and stops when the next set stops
    shrinking; the pytest gate additionally re-peels the collected
    edge list exactly in Python and compares sets.

    Edges come from _kcore_edges (threshold KCORE_EDGE_COS = 0.34, not
    the 0.42 near-dup graph) so the core is non-trivial at fixture
    scale — see the constant's comment.
    """
    cur_edges = _kcore_edges(spark, sf_dir).localCheckpoint(eager=True)

    def degrees(edges: DataFrame) -> DataFrame:
        return (
            edges.select(F.col("id_lo").alias("v"))
            .unionAll(edges.select(F.col("id_hi").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
        )

    prev_n = -1
    for _ in range(KCORE_MAX_ROUNDS):
        # LAZY checkpoint + count(): the count materializes the
        # checkpoint blocks in the SAME job, so each peel round costs
        # one job instead of three (eager-verts + count + eager-edges
        # ran 3 driver-synchronized jobs/round; the restricted edge
        # relation now materializes inside the next round's count).
        # count() computes every partition, so the truncated lineage
        # is never left with missing blocks (a limit()-style partial
        # action would be unsafe here).
        verts = (
            degrees(cur_edges)
            .filter(F.col("deg") >= KCORE_K)
            .localCheckpoint(eager=False)
        )
        n = verts.count()
        if n == prev_n:
            core = verts
            break
        cur_edges = cur_edges.join(
            verts.select(F.col("v").alias("id_lo")), "id_lo", "left_semi"
        ).join(
            verts.select(F.col("v").alias("id_hi")), "id_hi", "left_semi"
        ).localCheckpoint(eager=False)
        prev_n = n
    else:
        raise RuntimeError(
            f"k-core peel did not converge in {KCORE_MAX_ROUNDS} rounds"
        )
    return core.select(
        F.col("v").alias("vec_id"), F.col("deg").alias("core_degree")
    ).orderBy("vec_id")


# Exact oracle for the k=2 peel: a WITH RECURSIVE fixpoint. Each
# iteration's working table is the FULL current survivor set (standard
# recursive-CTE semantics: the recursive term sees only the previous
# iteration's rows, so the set must be carried whole, tagged by iter);
# the next set = vertices with >= KCORE_K surviving neighbors, emitted
# only while strictly smaller than the current set, so recursion halts
# at the fixpoint (or one step past it when the next set is empty).
# The final SELECT applies the survivor filter once more OUTSIDE the
# recursion, which is idempotent at a fixpoint and correctly yields
# the empty core when the last emitted set peels to nothing (the
# MOD-perturbed fixtures exercise exactly that branch). The k-core is
# the unique maximal subgraph of min-degree >= k, so peel order
# (Spark's simultaneous rounds vs this formulation) cannot diverge.
KCORE_SQL = f"""
WITH RECURSIVE
edges AS (SELECT id_lo, id_hi FROM ({embedding_neardup_sql(KCORE_EDGE_COS)})),
adj AS (
  SELECT id_lo AS v, id_hi AS u FROM edges
  UNION ALL
  SELECT id_hi AS v, id_lo AS u FROM edges
),
peel(iter, v) AS (
  SELECT 0, v FROM (SELECT DISTINCT v FROM adj)
  UNION ALL
  SELECT cur.iter + 1, nxt.v
  FROM (SELECT iter, count(*) AS n FROM peel GROUP BY iter) cur,
       (SELECT a.v
          FROM adj a
          JOIN peel pv ON pv.v = a.v
          JOIN peel pu ON pu.v = a.u
         GROUP BY a.v
        HAVING count(*) >= {KCORE_K}) nxt
  WHERE (SELECT count(*) FROM
           (SELECT a.v
              FROM adj a
              JOIN peel pv ON pv.v = a.v
              JOIN peel pu ON pu.v = a.u
             GROUP BY a.v
            HAVING count(*) >= {KCORE_K})) < cur.n
),
last_iter AS (SELECT v FROM peel WHERE iter = (SELECT max(iter) FROM peel)),
core AS (
  SELECT a.v, count(*) AS deg
  FROM adj a
  JOIN last_iter lv ON lv.v = a.v
  JOIN last_iter lu ON lu.v = a.u
  GROUP BY a.v
  HAVING count(*) >= {KCORE_K}
)
SELECT v AS vec_id, deg AS core_degree FROM core ORDER BY vec_id
"""


BFS_MAX_ROUNDS = 64


def bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth histogram of a synthesized random recursive tree — the
    hierarchy-traversal operator (org charts, BOM explosion,
    reply-thread depth) that SQL expresses as WITH RECURSIVE and Spark
    (which has no recursive CTE) must run iteratively. The DuckDB
    oracle IS the recursive CTE, so the loop's result is exactly
    graded, unlike the fixpoint family's rows-only checks.

    Tree: node n>0 gets parent = lcg(n) % n (strictly smaller, so the
    graph is acyclic and rooted at 0); expected depth is Θ(log n) but
    the loop must tolerate any depth. Algorithm: POINTER DOUBLING
    (path halving), not level-by-level frontier BFS — each round every
    node's ancestor pointer jumps to its ancestor's ancestor and the
    accumulated distance adds, so convergence takes ⌈log₂ depth⌉
    rounds instead of depth rounds (round 3 measured the frontier
    version at ~29 sequential rounds / 10 s at sf0.1; doubling runs
    the same result in 5-6 rounds). Each round is ONE self-join of the
    state relation keyed by ancestor id + a `localCheckpoint` (NOTES
    trap 16). At 100 TB the trade is explicit: doubling does
    O(n log d) join work in O(log d) driver-synchronized rounds, vs
    the frontier's O(n) total work in O(d) rounds — round overhead
    (scheduling, checkpoint barriers) dominates real clusters, so
    log-rounds wins. A round cap raises rather than returning a
    truncated traversal.
    """
    d = io.load_table_parallel(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("n")
    )
    # state: ancestor pointer + accumulated distance; the root points
    # at itself with distance 0, so a converged pointer is a fixpoint
    # of the doubling join (anc=0 joins the root row and gains +0).
    state = d.select(
        "n",
        F.when(F.col("n") > 0, portable.lcg31(F.col("n")) % F.col("n"))
        .otherwise(F.lit(0))
        .alias("anc"),
        F.when(F.col("n") > 0, F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("dist"),
    ).localCheckpoint(eager=True)
    for _ in range(BFS_MAX_ROUNDS):
        hop = state.select(
            F.col("n").alias("anc"),
            F.col("anc").alias("anc2"),
            F.col("dist").alias("d2"),
        )
        state = (
            state.join(hop, "anc")
            .select(
                "n",
                F.col("anc2").alias("anc"),
                (F.col("dist") + F.col("d2")).alias("dist"),
            )
            .localCheckpoint(eager=False)
        )
        # full-scan count (not isEmpty/limit — a partial action must
        # not materialize a lazy checkpoint) doubles as the checkpoint
        # materialization: one job per doubling round instead of two
        if state.filter(F.col("anc") != 0).count() == 0:
            break
    else:
        raise RuntimeError(f"pointer doubling exceeded {BFS_MAX_ROUNDS} rounds")
    return (
        state.select("n", F.col("dist").alias("depth"))
        .groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.min("n").alias("min_node"))
        .orderBy("depth")
    )


BFS_DEPTH_SQL = f"""
WITH RECURSIVE walk AS (
  SELECT doc_id AS n, CAST(0 AS BIGINT) AS depth
  FROM documents WHERE doc_id = 0
  UNION ALL
  SELECT d.doc_id, w.depth + 1
  FROM documents d
  JOIN walk w
    ON d.doc_id > 0
   AND {portable.lcg31_sql("d.doc_id")} % d.doc_id = w.n
)
SELECT depth, count(*) AS n_nodes, min(n) AS min_node
FROM walk GROUP BY depth ORDER BY depth
"""


# ---------------------------------------------------------------------------
# Link prediction: common-neighbor Jaccard over non-edges
# ---------------------------------------------------------------------------

LINKPRED_TOP = 20


def jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted links of the near-dup graph: non-adjacent
    vector pairs ranked by neighborhood Jaccard |N(a)∩N(b)| /
    |N(a)∪N(b)| — the "these two docs near-match the same things but
    not (yet) each other" probe that surfaces borderline duplicates a
    fixed cosine threshold just missed.

    Shape: undirected adjacency → two-hop join on the shared neighbor
    (the SAME wedge relation the triangle census builds), hash agg on
    the (a, b) pair, LEFT ANTI against the edge set, broadcast degree
    join, TakeOrderedAndProject top-k. Every exchange is keyed by a
    vertex id or an (a, b) pair — Σ deg² work, never |V|². The ratio
    is one double division of exact BIGINTs floored onto the bp grid;
    (jaccard, a, b) is a total order, so the top-k is deterministic.
    """
    e = _edges(spark, sf_dir)
    e.persist()
    adj = e.select(F.col("id_lo").alias("v"), F.col("id_hi").alias("w")).unionAll(
        e.select(F.col("id_hi").alias("v"), F.col("id_lo").alias("w"))
    )
    n1 = adj.select("v", F.col("w").alias("a"))
    n2 = adj.select("v", F.col("w").alias("b"))
    pairs = (
        n1.join(n2, "v")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cn"))
    )
    non_edges = pairs.join(
        e,
        (pairs.a == e.id_lo) & (pairs.b == e.id_hi),
        "left_anti",
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    j = (
        non_edges.join(
            F.broadcast(deg.select(F.col("v").alias("a"), F.col("d").alias("da"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("v").alias("b"), F.col("d").alias("db"))),
            "b",
        )
    )
    return (
        j.select(
            "a",
            "b",
            "cn",
            "da",
            "db",
            F.floor(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn"))
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("jaccard_bp"),
        )
        .orderBy(F.desc("jaccard_bp"), F.asc("a"), F.asc("b"))
        .limit(LINKPRED_TOP)
    )


JACCARD_LINK_PREDICTION_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
adj AS (
  SELECT id_lo AS v, id_hi AS w FROM edges
  UNION ALL SELECT id_hi, id_lo FROM edges
),
pairs AS (
  SELECT n1.w AS a, n2.w AS b, count(*) AS cn
  FROM adj n1 JOIN adj n2 ON n1.v = n2.v AND n1.w < n2.w
  GROUP BY n1.w, n2.w
),
non_edges AS (
  SELECT * FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM edges e
                    WHERE e.id_lo = p.a AND e.id_hi = p.b)
),
deg AS (SELECT v, count(*) AS d FROM adj GROUP BY v)
SELECT p.a, p.b, CAST(p.cn AS BIGINT) AS cn,
       CAST(da.d AS BIGINT) AS da, CAST(db.d AS BIGINT) AS db,
       CAST(floor(CAST(p.cn AS DOUBLE) / (da.d + db.d - p.cn) * 10000 + 0.5)
            AS BIGINT) AS jaccard_bp
FROM non_edges p
JOIN deg da ON da.v = p.a
JOIN deg db ON db.v = p.b
ORDER BY jaccard_bp DESC, p.a, p.b
LIMIT {LINKPRED_TOP}
"""



def label_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity of the ground-truth LABEL partition over the
    near-dup graph — "do the labels align with similarity structure":
    Q = (4m·Σe_c − Σd_c²) / 4m², where e_c counts intra-label edges,
    d_c sums label-class degrees, m counts edges. Q > 0 means near-dups
    concentrate within labels (expected for a sane embedding space);
    Q ≈ 0 means labels are independent of the graph.

    Exactness: the closed form is pure BIGINT arithmetic over three
    counts, floored onto the ppm grid in one double division — fully
    SQL-oracled, unusual for a graph-quality metric. Shape: one edge
    relation, two broadcast label joins, vertex-keyed degree rollup —
    nothing quadratic. Magnitude guard: 4m² ≤ 9e18 needs m ≤ 1.5e9
    edges; beyond that pre-divide by m (documented, not hit at any
    fixture SF).
    """
    e = _edges(spark, sf_dir)
    e.persist()
    lab = io.load_table_parallel(spark, sf_dir, "embeddings").select(
        "vec_id", "label"
    )
    la = lab.select(F.col("vec_id").alias("id_lo"), F.col("label").alias("l_lo"))
    lb = lab.select(F.col("vec_id").alias("id_hi"), F.col("label").alias("l_hi"))
    labeled = e.join(F.broadcast(la), "id_lo").join(F.broadcast(lb), "id_hi")
    m_intra = labeled.agg(
        F.count(F.lit(1)).alias("m_edges"),
        F.sum(F.when(F.col("l_lo") == F.col("l_hi"), 1).otherwise(0)).alias(
            "intra_edges"
        ),
    )
    deg = _degrees(e)
    dsq = (
        deg.join(
            F.broadcast(lab.select(F.col("vec_id").alias("v"), "label")), "v"
        )
        .groupBy("label")
        .agg(F.sum("d").alias("d_c"))
        .agg(F.sum(F.col("d_c") * F.col("d_c")).alias("sum_dc_sq"))
    )
    return m_intra.crossJoin(dsq).select(
        "m_edges",
        "intra_edges",
        "sum_dc_sq",
        F.floor(
            (
                4 * F.col("m_edges") * F.col("intra_edges")
                - F.col("sum_dc_sq")
            ).cast("double")
            / (4.0 * F.col("m_edges") * F.col("m_edges"))
            * 1000000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("modularity_ppm"),
    )


LABEL_MODULARITY_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
lab AS (SELECT vec_id, label FROM embeddings),
labeled AS (
  SELECT e.id_lo, e.id_hi, la.label AS l_lo, lb.label AS l_hi
  FROM edges e JOIN lab la ON la.vec_id = e.id_lo
               JOIN lab lb ON lb.vec_id = e.id_hi
),
mi AS (
  SELECT count(*) AS m_edges,
         CAST(sum(CASE WHEN l_lo = l_hi THEN 1 ELSE 0 END) AS BIGINT)
           AS intra_edges
  FROM labeled
),
deg AS ({_DEG_CTE}),
dsq AS (
  SELECT CAST(sum(d_c * d_c) AS BIGINT) AS sum_dc_sq
  FROM (SELECT label, CAST(sum(d) AS BIGINT) AS d_c
        FROM deg JOIN lab ON lab.vec_id = deg.v GROUP BY label)
)
SELECT CAST(m_edges AS BIGINT) AS m_edges, intra_edges, sum_dc_sq,
       CAST(floor(CAST(4 * m_edges * intra_edges - sum_dc_sq AS DOUBLE)
                  / (4.0 * m_edges * m_edges) * 1000000 + 0.5) AS BIGINT)
         AS modularity_ppm
FROM mi, dsq
"""



def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the near-dup graph: the Pearson
    correlation of endpoint degrees over edges (Newman r) — positive r
    means hub documents near-match other hubs (template families),
    negative means hubs absorb leaves (boilerplate magnets). The
    structural complement to the triangle census.

    Closed integer form over the directed edge list (each undirected
    edge counted both ways, the standard symmetrization): with
    M = 2m rows of (j, k) endpoint-degree pairs, r = (M·Σjk − Σj·Σk) /
    (M·Σj² − (Σj)²) — and by symmetry the j and k marginals coincide.
    Everything is BIGINT until one double division floored onto ppm;
    fully SQL-oracled. Shape: degree rollup + two broadcast degree
    joins + one scalar aggregate — no quadratic work. Magnitude: M·Σj²
    needs Σdeg³ ≲ 9e18 — safe while max-degree³·V stays under BIGINT
    (the near-dup graph's degrees are bounded by cluster sizes).
    """
    e = _edges(spark, sf_dir)
    e.persist()
    deg = _degrees(e)
    da = deg.select(F.col("v").alias("id_lo"), F.col("d").alias("dj"))
    db = deg.select(F.col("v").alias("id_hi"), F.col("d").alias("dk"))
    pairs = (
        e.join(F.broadcast(da), "id_lo")
        .join(F.broadcast(db), "id_hi")
        .select("dj", "dk")
    )
    # single pass: by symmetry the both-directions sums are linear in
    # one-direction sums (m2 = 2·count, Σj = Σdj+Σdk, Σjk = 2·Σdj·dk,
    # Σj² = Σdj²+Σdk²) — a unionAll would re-execute the whole
    # edge-scan + degree-join subplan twice for the same numbers
    agg = pairs.agg(
        (F.count(F.lit(1)) * 2).alias("m2"),
        (F.sum("dj") + F.sum("dk")).alias("sj"),
        (F.sum(F.col("dj") * F.col("dk")) * 2).alias("sjk"),
        (
            F.sum(F.col("dj") * F.col("dj"))
            + F.sum(F.col("dk") * F.col("dk"))
        ).alias("sjj"),
    )
    num = F.col("m2") * F.col("sjk") - F.col("sj") * F.col("sj")
    den = F.col("m2") * F.col("sjj") - F.col("sj") * F.col("sj")
    return agg.select(
        (F.col("m2") / 2).cast("long").alias("m_edges"),
        F.when(
            den != 0,
            F.floor(num.cast("double") / den * 1000000 + F.lit(0.5)).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("assortativity_ppm"),
    )


DEGREE_ASSORTATIVITY_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
deg AS ({_DEG_CTE}),
pairs AS (
  SELECT da.d AS dj, db.d AS dk
  FROM edges e JOIN deg da ON da.v = e.id_lo
               JOIN deg db ON db.v = e.id_hi
),
sym AS (SELECT dj, dk FROM pairs UNION ALL SELECT dk, dj FROM pairs),
agg AS (
  SELECT count(*) AS m2, CAST(sum(dj) AS BIGINT) AS sj,
         CAST(sum(dj * dk) AS BIGINT) AS sjk,
         CAST(sum(dj * dj) AS BIGINT) AS sjj
  FROM sym
)
SELECT CAST(m2 / 2 AS BIGINT) AS m_edges,
       CASE WHEN m2 * sjj - sj * sj <> 0
            THEN CAST(floor(CAST(m2 * sjk - sj * sj AS DOUBLE)
                            / (m2 * sjj - sj * sj) * 1000000 + 0.5) AS BIGINT)
            ELSE CAST(0 AS BIGINT) END AS assortativity_ppm
FROM agg
"""



def local_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient of the near-dup graph:
    cc(v) = 2·t(v) / (d(v)·(d(v)−1)), where t(v) counts triangles
    through v — the node-level refinement of ``graph_triangle_stats``'s
    global transitivity. High-cc hubs are template-spam cliques; the
    per-node readout is what a curation pipeline joins back onto
    documents to demote them.

    Shape: the same oriented two-hop triangle join as the census, but
    each closed triangle {a<b<c} is exploded to its three corners and
    counted per vertex (one 8-byte-key aggregate), then LEFT-joined
    onto the degree relation so triangle-free vertices keep cc = 0.
    The coefficient is pure integer arithmetic: 2·t·10⁴ div (d·(d−1))
    — no float to flap (NOTES trap 1). All exchanges are vertex-keyed;
    nothing is quadratic in vertices.
    """
    e = _edges(spark, sf_dir)
    e.persist()
    ab = e.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("b"))
    bc = e.select(F.col("id_lo").alias("b"), F.col("id_hi").alias("c"))
    ac = e.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("c"))
    corners = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"], "left_semi")
        .select(F.explode(F.array("a", "b", "c")).alias("v"))
    )
    tri_v = corners.groupBy("v").agg(F.count(F.lit(1)).alias("t"))
    deg = _degrees(e)
    return (
        deg.join(tri_v, "v", "left")
        .select(
            "v",
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.expr(
                "CASE WHEN d >= 2 THEN coalesce(t, 0) * 2 * 10000"
                " div (d * (d - 1)) ELSE 0 END"
            )
            .cast("long")
            .alias("local_cc_bp"),
        )
        .orderBy("v")
    )


LOCAL_CLUSTERING_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
closed AS (
  SELECT e1.id_lo AS a, e1.id_hi AS b, e2.id_hi AS c
  FROM edges e1
  JOIN edges e2 ON e1.id_hi = e2.id_lo
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.id_lo = e1.id_lo AND e3.id_hi = e2.id_hi)
),
tri_v AS (
  SELECT v, count(*) AS t
  FROM (SELECT a AS v FROM closed
        UNION ALL SELECT b FROM closed
        UNION ALL SELECT c FROM closed)
  GROUP BY v
),
deg AS ({_DEG_CTE})
SELECT deg.v,
       CAST(deg.d AS BIGINT) AS degree,
       CAST(coalesce(tri_v.t, 0) AS BIGINT) AS n_triangles,
       CAST(CASE WHEN deg.d >= 2
                 THEN coalesce(tri_v.t, 0) * 2 * 10000 // (deg.d * (deg.d - 1))
                 ELSE 0 END AS BIGINT) AS local_cc_bp
FROM deg LEFT JOIN tri_v ON deg.v = tri_v.v
ORDER BY deg.v
"""


def edge_support_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge-support census of the near-dup graph: support(e) = number
    of triangles containing edge e — the quantity k-truss
    decomposition peels on (support ≥ k−2), and the edge-level dual of
    ``graph_local_clustering``. High-support edges sit inside dense
    near-dup cliques; a truss-based curation keeps one exemplar per
    truss instead of per component.

    Shape: the oriented two-hop triangle join emits each closed
    triangle's THREE edges (the wedge pair and the closing edge), one
    8-byte-key aggregate counts per edge, and a LEFT join against the
    edge set keeps support-0 edges. Output is the (support → edge
    count) histogram, so result size is O(max support), not O(edges).
    """
    e = _edges(spark, sf_dir)
    e.persist()
    ab = e.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("b"))
    bc = e.select(F.col("id_lo").alias("b"), F.col("id_hi").alias("c"))
    ac = e.select(F.col("id_lo").alias("a"), F.col("id_hi").alias("c"))
    # closed is consumed THREE times by the union below; Catalyst
    # inlines each reference and AQE stage reuse does not deduplicate
    # subtree copies rooted on the cached edge relation (r9 diagnosis),
    # so the two-hop triangle join executed three times per call. The
    # lazy per-call localCheckpoint materializes the O(triangles)
    # relation once; the other branches read stored partitions.
    closed = (
        ab.join(bc, "b")
        .join(ac, ["a", "c"], "left_semi")
        .localCheckpoint(eager=False)
    )
    tri_edges = (
        closed.select(F.col("a").alias("lo"), F.col("b").alias("hi"))
        .unionAll(closed.select(F.col("b").alias("lo"), F.col("c").alias("hi")))
        .unionAll(closed.select(F.col("a").alias("lo"), F.col("c").alias("hi")))
        .groupBy("lo", "hi")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    per_edge = e.join(
        tri_edges,
        (e.id_lo == tri_edges.lo) & (e.id_hi == tri_edges.hi),
        "left",
    ).select(F.coalesce("support", F.lit(0)).alias("support"))
    return (
        per_edge.groupBy("support")
        .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        .select(F.col("support").cast("long").alias("support"), "n_edges")
        .orderBy("support")
    )


EDGE_SUPPORT_SQL = f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
closed AS (
  SELECT e1.id_lo AS a, e1.id_hi AS b, e2.id_hi AS c
  FROM edges e1
  JOIN edges e2 ON e1.id_hi = e2.id_lo
  WHERE EXISTS (SELECT 1 FROM edges e3
                WHERE e3.id_lo = e1.id_lo AND e3.id_hi = e2.id_hi)
),
tri_edges AS (
  SELECT lo, hi, count(*) AS support
  FROM (SELECT a AS lo, b AS hi FROM closed
        UNION ALL SELECT b, c FROM closed
        UNION ALL SELECT a, c FROM closed)
  GROUP BY lo, hi
),
per_edge AS (
  SELECT coalesce(t.support, 0) AS support
  FROM edges e LEFT JOIN tri_edges t
    ON e.id_lo = t.lo AND e.id_hi = t.hi
)
SELECT CAST(support AS BIGINT) AS support,
       CAST(count(*) AS BIGINT) AS n_edges
FROM per_edge GROUP BY support
ORDER BY support
"""


# ---------------------------------------------------------------------------
# Exactly-oracled PageRank (fixed-iteration, integer ppm)
# ---------------------------------------------------------------------------

PR_ITERS = 4
PR_TOP = 25
_PR_BASE = 150_000  # (1 − d) · 10⁶ with d = 0.85
_PR_DAMP = 85  # d numerator (denominator 100 folded into the div)


def pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank over the (undirected) near-dup graph in
    EXACT integer parts-per-million — the exactly-SQL-oracled sibling of
    the rows-only ``dedup_neardup_pagerank`` fixpoint (which converges
    in floats and can only be property-gated). Pinning the iteration
    count and doing every transfer as BIGINT arithmetic
    (rᵗ⁺¹(v) = {_PR_BASE} + Σ_neighbors (rᵗ(u)·{_PR_DAMP}) div (100·deg(u)))
    makes the result bit-reproducible, so DuckDB replays the same four
    rounds as chained CTEs and the driver hash-matches it — the
    ``graph_bfs_depth`` / ``join_entity_resolution`` precedent extended
    to a NUMERIC iterative algorithm.

    Scale shape: each round is one vertex-keyed equi-join (ranks onto
    the edge list) + one vertex-keyed hash aggregate — the textbook
    distributed-PageRank plan. The edge relation is persisted once (the
    graph-family policy); ranks are O(vertices) rows of three BIGINTs.
    Four unrolled rounds keep the RANK lineage shallow enough that it
    needs no checkpoint (the 40-round float fixpoint in dedup.py is
    where localCheckpoint becomes mandatory — NOTES trap 16); the
    O(|V|) DEGREE relation, referenced once per unrolled round, IS
    lazily ``localCheckpoint``ed below because AQE stage reuse does not
    deduplicate the per-round subtree copies Catalyst inlines over a
    cached input (r9 diagnosis).
    """
    e = _edges(spark, sf_dir)
    e.persist()
    bidir = e.select(
        F.col("id_lo").alias("src"), F.col("id_hi").alias("dst")
    ).unionAll(e.select(F.col("id_hi").alias("src"), F.col("id_lo").alias("dst")))
    deg = bidir.groupBy("src").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("src").alias("v"), "deg"
    )
    # deg anchors every round's left join (keeping the unrolled lineage
    # LINEAR — anchoring on rel would reference it twice per round and
    # double the subtree per unroll), but Catalyst inlines the degree
    # aggregate once per reference and AQE stage reuse does not match
    # the copies over a cached input (census: 18 jobs / 585 tasks for
    # 4 rounds, ~5 of them re-running deg). A lazy localCheckpoint
    # materializes the O(|V|) degree relation once inside the final
    # action; every round then reads the stored partitions.
    deg = deg.localCheckpoint(eager=False)
    rel = deg.select("v", "deg", F.lit(1_000_000).cast("long").alias("r"))
    for _ in range(PR_ITERS):
        contrib = bidir.join(rel, bidir.src == rel.v).select(
            F.col("dst").alias("v"),
            F.expr(f"(r * {_PR_DAMP}) div (100 * deg)").alias("c"),
        )
        inflow = contrib.groupBy("v").agg(F.sum("c").alias("cin"))
        rel = deg.join(inflow, "v", "left").select(
            "v",
            "deg",
            (F.lit(_PR_BASE) + F.coalesce("cin", F.lit(0))).cast("long").alias("r"),
        )
    return (
        rel.select("v", F.col("r").alias("pagerank_ppm"))
        .orderBy(F.desc("pagerank_ppm"), "v")
        .limit(PR_TOP)
    )


def _pagerank_sql() -> str:
    rounds = []
    for i in range(PR_ITERS):
        rounds.append(
            f"""r{i + 1} AS (
  SELECT d.v, d.deg,
         CAST({_PR_BASE} + coalesce(sum((p.r * {_PR_DAMP}) // (100 * p.deg)), 0)
              AS BIGINT) AS r
  FROM deg d
  LEFT JOIN bidir b ON b.dst = d.v
  LEFT JOIN r{i} p ON p.v = b.src
  GROUP BY d.v, d.deg
)"""
        )
    return f"""
WITH edges AS (SELECT id_lo, id_hi FROM ({EMBEDDING_NEARDUP_SQL})),
bidir AS (SELECT id_lo AS src, id_hi AS dst FROM edges
          UNION ALL SELECT id_hi, id_lo FROM edges),
deg AS (SELECT src AS v, count(*) AS deg FROM bidir GROUP BY src),
r0 AS (SELECT v, deg, CAST(1000000 AS BIGINT) AS r FROM deg),
{", ".join(rounds)}
SELECT v, r AS pagerank_ppm
FROM r{PR_ITERS}
ORDER BY pagerank_ppm DESC, v
LIMIT {PR_TOP}
"""


PAGERANK_EXACT_SQL = _pagerank_sql()


CC_MAX_ROUNDS = 50

# Session-scoped (k, label) relation of the n-gram-Jaccard near-dup
# graph, keyed like the shingle/token caches: neardup_cc_exact and
# dedup.keep_best_canonical cluster the IDENTICAL edge set, so the
# fixpoint loop runs once per (session, corpus) and is served from the
# final localCheckpoint thereafter.
# Session cache of localCheckpoint-ed CC label relations, keyed by
# (applicationId, sf_dir). Retention policy (ADVICE r6): NO eviction
# by design — same as the shingle/token caches; a long-lived session
# sweeping many fixture dirs accumulates one small checkpointed
# relation per corpus (the label table is O(near-dup vertices), a few
# hundred rows at fixture scale), and a lost executor invalidates the
# non-reliable checkpoint for every consumer at once, which surfaces
# as a recompute, not a wrong answer. clear_cc_label_cache() exists
# for harnesses that need deterministic memory (trap-16 family).
_CC_LABEL_CACHE: dict[tuple[str, str], DataFrame] = {}


def clear_cc_label_cache() -> None:
    """Drop every cached CC label relation (the checkpointed RDD blocks
    are reclaimed by the ContextCleaner once unreferenced)."""
    _CC_LABEL_CACHE.clear()


# Introspection: rounds the LAST _min_label_cc invocation took to
# converge (set on every call; read by tests and the optimization log
# to evidence the pointer-doubling round count).
_CC_LAST_ROUNDS = 0


def _min_label_cc(edges: DataFrame, max_rounds: int, what: str) -> DataFrame:
    """Exact min-label connected components over an undirected edge
    relation (first column, second column) — returns ``(k, label)``
    with ``label`` = the component's minimum member id, one row per
    vertex that appears in ``edges`` (isolated vertices are absent;
    callers coalesce to the vertex's own id).

    Scale: per round one vertex-keyed hash join + min-aggregate
    (relax) plus one label-keyed self-join (pointer doubling),
    ``localCheckpoint``ed (NOTES trap 16) so the plan never deepens;
    doubling makes the round count O(log diameter) instead of one
    round per hop, with a hard cap that RAISES (``what`` names the
    caller) rather than returning a silently split partition.
    """
    lo, hi = edges.columns
    sym = (
        edges.select(F.col(lo).alias("ka"), F.col(hi).alias("kb"))
        .unionAll(edges.select(F.col(hi).alias("ka"), F.col(lo).alias("kb")))
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("ka").alias("k"))
        .distinct()
        .select("k", F.col("k").alias("label"))
        .localCheckpoint(eager=False)
    )
    # Convergence by the monotone label-sum invariant: min-propagation
    # only ever DECREASES a vertex's label, so Σ label is strictly
    # decreasing until the fixpoint and equal exactly at it — the same
    # fixpoint the old join-and-compare diff detected, in one 1-row
    # aggregate per round instead of a join + count job. The agg also
    # materializes the round's LAZY checkpoint in the same job
    # (sum(label) touches every partition).
    global _CC_LAST_ROUNDS
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for rnd in range(max_rounds):
        _CC_LAST_ROUNDS = rnd + 1
        msgs = sym.join(labels, sym.ka == labels.k).select(
            F.col("kb").alias("k"), "label"
        )
        relaxed = (
            labels.unionAll(msgs)
            .groupBy("k")
            .agg(F.min("label").alias("label"))
            # checkpoint BEFORE the doubling self-join: both references
            # read the stored partitions instead of re-running the
            # relax aggregate (Catalyst inlines self-joined subtrees)
            .localCheckpoint(eager=False)
        )
        # Pointer doubling (r10 — the join_entity_resolution r9
        # precedent applied verbatim): label(k) is always a member id
        # of k's component, so label(label(k)) is too — folding it in
        # each round makes convergence O(log diameter) driver barriers
        # instead of one per hop. The fixpoint is unchanged: both steps
        # only decrease labels within the component, and a stable label
        # sum means NEITHER step moved, i.e. the same one-hop fixpoint
        # the oracle's WITH RECURSIVE walk computes.
        l2 = relaxed.select(F.col("k").alias("lk"), F.col("label").alias("l2"))
        new_labels = (
            relaxed.join(l2, relaxed.label == l2.lk, "left")
            .select(
                "k",
                F.least("label", F.coalesce("l2", "label")).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        new_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    else:
        raise RuntimeError(f"{what} did not converge in {max_rounds} rounds")
    return labels


def neardup_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``(k, label)`` min-label components of the n-gram-Jaccard
    near-dup graph, computed once per (session, corpus) — the shared
    partition behind ``graph_neardup_cc_exact`` and
    ``dedup_keep_best_canonical``."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CC_LABEL_CACHE.get(key)
    if cached is not None:
        return cached
    from .dedup import ngram_jaccard_pairs

    e = ngram_jaccard_pairs(spark, sf_dir).select("doc_lo", "doc_hi")
    labels = _min_label_cc(e, CC_MAX_ROUNDS, "neardup min-label CC")
    _CC_LABEL_CACHE[key] = labels
    return labels


def neardup_cc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY-oracled connected components of the near-dup graph —
    the driver-graded proof the rows-only CC family
    (``dedup_neardup_clusters`` label propagation,
    ``dedup_cc_twophase`` star contraction) could only pytest-gate:
    DuckDB replays the same partition as a WITH RECURSIVE reachability
    walk (the ``join_entity_resolution`` precedent applied to the
    embedding near-dup edges). Output is one row per NON-SINGLETON
    cluster (canonical id = min member, size, member-id sum) — with
    the other two algorithms pytest-proven equal, three independent
    algorithms now agree on every cluster and one of them is
    hash-graded.

    Scale: min-label propagation via the shared ``_min_label_cc``
    fixpoint (one vertex-keyed hash join + min-aggregate per round,
    `localCheckpoint`ed — NOTES trap 16 — diameter-bounded with a
    raising backstop), served from the session ``neardup_cc_labels``
    cache it shares with ``dedup_keep_best_canonical``. Edges are the
    exact n-gram-Jaccard pairs — the SAME graph the rows-only CC
    family clusters (the embedding graph is the other families'
    index), so the three partitions are comparable; the pair relation
    rides the session shingle cache.
    """
    labels = neardup_cc_labels(spark, sf_dir)
    return (
        labels.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("k").cast("long").alias("member_id_sum"),
        )
        .select(
            F.col("label").cast("long").alias("cluster_id"),
            "n_members",
            "member_id_sum",
        )
        .orderBy("cluster_id")
    )


NEARDUP_CC_EXACT_SQL = f"""
WITH RECURSIVE
edges AS (SELECT doc_lo, doc_hi FROM ({NGRAM_JACCARD_SQL})),
sym AS (SELECT doc_lo AS ka, doc_hi AS kb FROM edges
        UNION ALL SELECT doc_hi, doc_lo FROM edges),
verts AS (SELECT DISTINCT ka AS k FROM sym),
reach (k, r) AS (
  SELECT k, k FROM verts
  UNION
  SELECT reach.k, sym.kb FROM reach JOIN sym ON reach.r = sym.ka
),
cluster AS (SELECT k, min(r) AS cluster_id FROM reach GROUP BY k)
SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(k) AS BIGINT) AS member_id_sum
FROM cluster GROUP BY cluster_id
ORDER BY cluster_id
"""


QUERIES = {
    "graph_triangle_stats": (triangle_stats, TRIANGLE_STATS_SQL),
    "graph_degree_histogram": (degree_histogram, DEGREE_HISTOGRAM_SQL),
    "graph_kcore": (kcore, KCORE_SQL),
    "graph_bfs_depth": (bfs_depth, BFS_DEPTH_SQL),
    "graph_jaccard_linkpred": (jaccard_link_prediction, JACCARD_LINK_PREDICTION_SQL),
    "graph_label_modularity": (label_modularity, LABEL_MODULARITY_SQL),
    "graph_degree_assortativity": (degree_assortativity, DEGREE_ASSORTATIVITY_SQL),
    "graph_local_clustering": (local_clustering, LOCAL_CLUSTERING_SQL),
    "graph_edge_support": (edge_support_histogram, EDGE_SUPPORT_SQL),
    "graph_pagerank_exact": (pagerank_exact, PAGERANK_EXACT_SQL),
    "graph_neardup_cc_exact": (neardup_cc_exact, NEARDUP_CC_EXACT_SQL),
}
