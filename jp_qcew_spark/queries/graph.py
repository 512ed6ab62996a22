"""Graph analytics over DataFrames — iterative algorithms expressed as
joins + aggregations per superstep (the same execution shape GraphX/Pregel
lowers to; reference has no graph surface, this is engine extension tier
alongside dedup_components).

Scale notes: each PageRank superstep is one co-partitioned equi-join
(ranks ⋈ edges on src — both sides hash-partitioned on the same key, AQE
reuses the exchange) plus one aggregation shuffle on dst.  Ranks (one row
per node) are persisted per iteration so superstep k doesn't recompute
k-1; for long runs ``localCheckpoint`` truncates the lineage the same way
dedup_components does.  Edge skew (a supplier in every order) is bounded
by the out-degree normalization join being on the *src* side only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jp_qcew_spark.io import load_table

_DAMP = 0.85
_ITERS = 3


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (damping 0.85, 3 fixed supersteps) over the bipartite
    customer→supplier graph induced by orders: an edge c→s whenever any of
    c's orders contains a lineitem supplied by s.

    Node ids are namespaced ('c:123' vs 's:123' — custkey and suppkey
    overlap numerically).  Simplified dangling-mass semantics (suppliers
    have no out-edges; their mass is not redistributed) — pinned identically
    in the oracle, which unrolls the same three supersteps as chained CTEs,
    so the hash-compare proves the iterative DataFrame loop reproduces the
    closed-form SQL to 6 decimals."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    edeg = edges.join(outdeg, "src").persist()

    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("pr"))
    base = (1.0 - _DAMP) / n_nodes
    for _ in range(_ITERS):
        contribs = (
            edeg.join(ranks, edeg.src == ranks.node)
            .select("dst", (F.col("pr") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(
            contribs, nodes.node == contribs.dst, "left"
        ).select(
            "node",
            (F.lit(base) + _DAMP * F.coalesce(F.col("s"), F.lit(0.0))).alias(
                "pr"
            ),
        ).persist()
    return ranks.select(
        "node", F.round(F.col("pr") * 1000, 6).alias("pr_permille")
    ).orderBy("node")


ORACLE_GRAPH_PAGERANK = f"""
WITH edges AS (
  SELECT DISTINCT 'c:' || CAST(o_custkey AS VARCHAR) AS src,
                  's:' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), nn AS (
  SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
), edeg AS (
  SELECT e.src, e.dst, d.deg
  FROM edges e JOIN (SELECT src, count(*) AS deg FROM edges GROUP BY src) d
    USING (src)
), it0 AS (
  SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes
), it1 AS (
  SELECT node,
         (1 - {_DAMP}) / (SELECT n FROM nn) + {_DAMP} * coalesce(s, 0) AS pr
  FROM nodes LEFT JOIN (
    SELECT dst, sum(pr / deg) AS s FROM edeg JOIN it0 ON src = node
    GROUP BY dst) c ON node = dst
), it2 AS (
  SELECT node,
         (1 - {_DAMP}) / (SELECT n FROM nn) + {_DAMP} * coalesce(s, 0) AS pr
  FROM nodes LEFT JOIN (
    SELECT dst, sum(pr / deg) AS s FROM edeg JOIN it1 ON src = node
    GROUP BY dst) c ON node = dst
), it3 AS (
  SELECT node,
         (1 - {_DAMP}) / (SELECT n FROM nn) + {_DAMP} * coalesce(s, 0) AS pr
  FROM nodes LEFT JOIN (
    SELECT dst, sum(pr / deg) AS s FROM edeg JOIN it2 ON src = node
    GROUP BY dst) c ON node = dst
)
SELECT node, round(pr * 1000, 6) AS pr_permille
FROM it3 ORDER BY node
"""


QUERIES = {
    "graph_pagerank": q_graph_pagerank,
}

ORACLE = {
    "graph_pagerank": ORACLE_GRAPH_PAGERANK,
}
