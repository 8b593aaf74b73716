"""Round-4 graph + ANN batch: deterministic weighted PageRank (authority
scoring for corpus curation) and product-quantization similarity search
(the byte-compressed ANN scale path)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Query
from ._util import fquant, t

PR_ITERS = 3
PR_DAMPING = 0.85


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph (customer's nation →
    supplier's nation, weighted by lineitem count) — the host/domain
    authority signal a web-corpus curation pipeline computes before
    deciding sampling weights per source.

    The edge build is the interesting part at scale: a 3-way fact join
    (customer⋈orders⋈lineitem⋈supplier) reduced to a tiny weighted edge
    list BEFORE any iteration touches it — the iterations then run on
    O(V+E) state, never on the 100 TB fact table. Cross-engine exactness
    comes from operators/graph.py's integer-quantized contribution sums
    (see its docstring); the oracle unrolls the same three iterations as
    SQL CTEs."""
    from ..operators.graph import pagerank

    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")

    edges = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust.select("c_custkey", "c_nationkey")),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            F.col("c_nationkey").alias("src"),
            F.col("s_nationkey").alias("dst"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    nodes = nation.select(F.col("n_nationkey").alias("node"))
    ranks = pagerank(nodes, edges, iters=PR_ITERS, damping=PR_DAMPING)
    return (
        ranks.join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            ranks.node == F.col("n_nationkey"),
        )
        .select(
            F.col("node").alias("nationkey"),
            "n_name",
            fquant(F.col("pr"), 8).alias("pagerank"),
        )
    )


def _pr_iter_sql(i: int) -> str:
    """One unrolled PageRank iteration: integer-quantized contribution
    sum (exact, order-insensitive) + damped update — the SQL mirror of
    operators/graph.py::pagerank's loop body."""
    return f"""
c{i} AS (
  SELECT e.dst,
         SUM(CAST(floor(p.pr * (e.w / o.wout) * 1e14) AS BIGINT)) AS s
  FROM edges e
  JOIN p{i - 1} p ON p.node = e.src
  JOIN outw o ON o.src = e.src
  GROUP BY e.dst
), p{i} AS (
  SELECT n.node,
         (1.0 - {PR_DAMPING}) / nn.n
           + {PR_DAMPING} * (CAST(COALESCE(c.s, 0) AS DOUBLE) / 1e14) AS pr
  FROM nodes n
  LEFT JOIN c{i} c ON c.dst = n.node
  CROSS JOIN nn
)"""


GRAPH_PAGERANK_SQL = f"""
WITH edges AS (
  SELECT c_nationkey AS src, s_nationkey AS dst,
         CAST(COUNT(*) AS DOUBLE) AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY 1, 2
), nodes AS (
  SELECT n_nationkey AS node FROM nation
), nn AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes
), outw AS (
  SELECT src, SUM(w) AS wout FROM edges GROUP BY src
), p0 AS (
  SELECT node, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn
),{",".join(_pr_iter_sql(i) for i in range(1, PR_ITERS + 1))}
SELECT p.node AS nationkey, n.n_name,
       floor(p.pr * 100000000.0) / 100000000.0 AS pagerank
FROM p{PR_ITERS} p JOIN nation n ON n.n_nationkey = p.node
"""


def llm_sim_search_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization approximate top-10 (rows-only: PQ scores are
    lossy by construction — recall vs. brute force is measured in
    tests/test_operators.py). 16 subspaces × 64 centroids compress a
    64-dim float corpus 16:1; asymmetric-distance scoring + exact
    re-ranking of the top 80 candidates measures recall@10 = 1.0 at
    sf0.1 (near-uniform random embeddings are PQ's worst case — the
    coarser 8×16 codebook only reached 0.2 there, so the registry pins
    the measured configuration). Same persisted-index contract as IVF:
    codebooks are trained once per corpus fingerprint and cached."""
    from ..operators.simsearch import corpus_cache_key, pq_topk

    return pq_topk(
        t(spark, sf_dir, "embeddings"), probe_vec_id=0, k=10,
        m=16, ksub=64, refine=8,
        corpus_key=corpus_cache_key(
            os.path.join(sf_dir, "embeddings.parquet"), label="pq"
        ),
    )


QUERIES: dict[str, Query] = {
    "graph_pagerank": Query(
        graph_pagerank, GRAPH_PAGERANK_SQL,
        "deterministic weighted PageRank, 3 unrolled iterations",
    ),
    "llm_sim_search_pq": Query(
        llm_sim_search_pq, None, "PQ ANN with ADC scoring + exact re-rank"
    ),
}
