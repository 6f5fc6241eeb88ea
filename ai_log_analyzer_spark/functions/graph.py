"""Link-graph ranking for URL/domain-level corpus curation.

Web-scale curation pipelines rank hosts by link centrality before
sampling (Common Crawl publishes harmonic-centrality / PageRank-style
host ranks; RefinedWeb and friends filter on them).  This module
implements fixed-iteration PageRank as pure DataFrame ops — the
canonical iterative-shuffle Spark workload — in EXACT integer
parts-per-billion arithmetic so every engine reproduces bit-identical
ranks (float PageRank sums are order-dependent and can never be
value-hashed across engines).

Scale shape per iteration: one equi-join of the edge table with the
current rank vector on ``src`` (both sides hash-partitioned on src —
a self-reusable exchange), one groupBy(dst) with map-side partial
sums, one left join back to the node set.  Plan growth is bounded by
``localCheckpoint`` every iteration, exactly like the CC operators.
Dangling nodes (no out-links) keep the damping floor — the standard
simplification; redistributing their mass adds one tiny scalar agg
per round if ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPB = 1_000_000_000          # rank unit: parts-per-billion of 1.0/node
DAMP_NUM, DAMP_DEN = 850, 1000   # 0.85 damping as an exact rational


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """(node, rank_ppb) after ``iters`` synchronous PageRank rounds
    from a uniform start of PPB per node.

    Update rule, all integer (floor division, positive operands —
    identical semantics to DuckDB's ``//``):

        contrib(u)   = rank(u) div outdeg(u)
        rank'(v)     = (1-d)·PPB + (d_num · Σ contrib(u→v)) div d_den

    Multi-edges are meaningful (each contributes); callers wanting
    simple-graph semantics distinct the edge table first."""
    edges = edges.select(F.col("src").cast("long").alias("src"),
                         F.col("dst").cast("long").alias("dst"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionAll(edges.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # outdeg rides WITH the edge table so each iteration's join touches
    # one prepartitioned input, not two
    ed = edges.join(deg, "src").localCheckpoint(eager=True)

    ranks = nodes.select("node", F.lit(PPB).cast("long").alias("rank_ppb"))
    floor_ppb = (PPB * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    for _ in range(iters):
        contrib = (ed.join(ranks, ed.src == ranks.node)
                   .select(F.col("dst").alias("node"),
                           F.expr("rank_ppb div outdeg").alias("c")))
        inflow = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(inflow, "node", "left")
                 .select("node",
                         (F.lit(floor_ppb) +
                          F.expr(f"({DAMP_NUM} * coalesce(s, 0)) div {DAMP_DEN}"))
                         .cast("long").alias("rank_ppb"))
                 .localCheckpoint(eager=True))
    return ranks


def pagerank_sql(edges_cte: str, iters: int = 3) -> str:
    """DuckDB oracle: the same integer update rule, unrolled — one CTE
    per iteration (recursion is unnecessary for a fixed count and
    unrolling keeps it plain ANSI)."""
    floor_ppb = (PPB * (DAMP_DEN - DAMP_NUM)) // DAMP_DEN
    sql = [f"edges AS ({edges_cte})",
           "nodes AS (SELECT DISTINCT node FROM "
           "(SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges))",
           "deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)",
           f"r0 AS (SELECT node, {PPB}::BIGINT AS rank_ppb FROM nodes)"]
    for i in range(iters):
        sql.append(f"""r{i + 1} AS (
  SELECT n.node,
         ({floor_ppb} + ({DAMP_NUM} * COALESCE(s.c, 0)) // {DAMP_DEN})::BIGINT
           AS rank_ppb
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank_ppb // d.outdeg) AS c
    FROM edges e JOIN r{i} r ON r.node = e.src JOIN deg d ON d.src = e.src
    GROUP BY e.dst) s ON s.node = n.node)""")
    return ",\n".join(sql) + f"\nSELECT node, rank_ppb FROM r{iters}"
