"""Distributed KMeans expressed as DataFrame operations — the iterative
ML-training loop pattern (assign → update) on Catalyst plans, with
cross-engine EXACT arithmetic so the result is hash-comparable against a
SQL oracle.

Contrast with operators/simsearch.py's driver-side Lloyd: there the
quantizer trains on a bounded SAMPLE because an ANN index needs only
approximate centroids. This operator is the full-data distributed
formulation — the one you run when the assignment of every row matters
(corpus bucketing, SemDeDup block assignment, curriculum binning) and the
table is 100 TB: each iteration is one broadcast-join assignment pass and
one O(k·dim) update aggregation; no vector ever reaches the driver.

Determinism contract (same family as operators/graph.py::pagerank):
- distances are sequential left-folds over the vector dims
  (``aggregate(zip_with(...))``), matching DuckDB's ``list_sum(
  list_transform(...))`` evaluation exactly;
- assignment ties break to the lowest centroid id via a total-order
  window rank;
- centroid updates floor-quantize each component to an integer at 1e-9
  resolution and sum BIGINTs — order-insensitive and exact, so partition
  layout cannot move a centroid — then divide back in deterministic IEEE
  arithmetic. Empty clusters drop out (both engines identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sqdist(v: str, cv: str) -> F.Column:
    """Sequential-fold squared L2 distance between two array<double>
    columns — the shape DuckDB's list_sum(list_transform(...)) mirrors."""
    return F.aggregate(
        F.zip_with(v, cv, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, y: acc + y,
    )


def kmeans_assign(
    vectors: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Fit ``k`` centroids with ``iters`` Lloyd iterations (init: the
    vectors with ``id < k`` — deterministic, and exact for callers whose
    ids are dense from 0; a sparse-id corpus should pass a remapped view)
    and return every row's final assignment
    ``(id, cid, d2_q)`` with the squared distance floor-quantized at 1e-6.

    Per iteration: assignment is vectors ⋈ broadcast(centroids) + one
    window rank (k·n tiny rows, no data-size shuffle beyond the rank's
    partition-by-id — which reuses the vectors' natural distribution);
    the update is a posexplode to (cid, dim) integer partial sums —
    O(k·dim) output rows, fully map-side combinable. ``localCheckpoint``
    truncates lineage between iterations so the plan stays flat."""
    emb = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    centroids = (
        emb.filter(F.col("vec_id") < k)
        .select(F.col("vec_id").cast("int").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("vec_id").orderBy("d2", "cid")

    def assign(cents: DataFrame) -> DataFrame:
        return (
            emb.join(F.broadcast(cents))
            .select("vec_id", "cid", "v", _sqdist("v", "cv").alias("d2"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn")
        )

    for _ in range(iters):
        assigned = assign(centroids)
        exploded = assigned.select(
            "cid", F.posexplode("v").alias("pos", "x")
        )
        means = (
            exploded.groupBy("cid", "pos")
            .agg(
                F.sum(F.floor(F.col("x") * F.lit(1e9)).cast("long")).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .select(
                "cid",
                "pos",
                ((F.col("s").cast("double") / F.lit(1e9)) / F.col("n")).alias(
                    "m"
                ),
            )
        )
        centroids = (
            means.groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda st: st["m"],
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )

    final = assign(centroids)
    return final.select(
        "vec_id",
        "cid",
        (F.floor(F.col("d2") * F.lit(1e6)) / F.lit(1e6)).alias("d2_q"),
    )
