"""Similarity search over embedding columns (``array<float>``).

Two paths, per the 100 TB design brief:
- **Brute-force cosine top-k** — the exact baseline. One broadcast of the
  probe vector, one map-side cosine per row (JVM ``aggregate``/``zip_with``
  expressions — no Python in the row path), then ``TakeOrderedAndProject``
  (per-partition top-k, never a global sort).
- **IVF (inverted-file) top-k** — the scale path: vectors are assigned to
  coarse centroids once (an O(n·C) map pass, cacheable); a probe scans only
  the ``nprobe`` nearest clusters, cutting the scan by ~C/nprobe. Centroids
  come from an MLlib KMeans fit over L2-normalized vectors (spherical
  approximation: Euclidean KMeans on unit vectors optimizes the same
  objective as max-cosine assignment), seeded for determinism.

All double math is sequential left-fold (``aggregate``), matching the
element order the DuckDB oracle uses, and similarities are rounded before
ranking with a vec_id tiebreak so top-k boundaries are engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Sequential left-fold dot product / norm over array<double> columns —
# bit-identical to DuckDB's list_sum(list_transform(...)) evaluation order.
def _dot(a: str, b: str) -> F.Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    )


def _to_double(col: str) -> F.Column:
    return F.expr(f"transform({col}, x -> cast(x as double))")


def cosine_expr(a: str, b: str) -> F.Column:
    dot = _dot(a, b)
    na = F.sqrt(_dot(a, a))
    nb = F.sqrt(_dot(b, b))
    return dot / (na * nb)


def quant6(col: F.Column) -> F.Column:
    """Floor-quantize a similarity to 1e-6 — deterministic across engines
    on bit-identical doubles (round() is not, at half boundaries); floor
    toward -inf is also sign-safe for negative cosines."""
    return F.floor(col * 1000000.0) / 1000000.0


SQL_COSINE = (
    "list_sum(list_transform(range(1, 65), i -> va[i] * vb[i]))"
    " / (sqrt(list_sum(list_transform(range(1, 65), i -> va[i] * va[i])))"
    " * sqrt(list_sum(list_transform(range(1, 65), i -> vb[i] * vb[i]))))"
)


def brute_force_topk(
    embeddings: DataFrame, probe_vec_id: int, k: int = 10
) -> DataFrame:
    """Exact cosine top-k for one probe vector (excluding itself)."""
    emb = embeddings.select(
        "vec_id", _to_double("embedding").alias("v")
    )
    probe = emb.filter(F.col("vec_id") == probe_vec_id).select(
        F.col("v").alias("pv")
    )
    scored = (
        emb.filter(F.col("vec_id") != probe_vec_id)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            quant6(cosine_expr("v", "pv")).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def train_ivf_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    train_cap: int = 100_000,
) -> DataFrame:
    """Fit IVF coarse centroids with MLlib KMeans over L2-normalized
    vectors (unit vectors make Euclidean KMeans equivalent to spherical /
    max-cosine clustering). Returns a tiny (cid, cv) DataFrame meant to be
    broadcast; at production scale the fit is run once and persisted, not
    per query.

    The quantizer trains DRIVER-SIDE on a bounded, deterministic sample
    (first ``train_cap`` vectors by id) with spherical Lloyd iterations
    in numpy — exactly how FAISS trains IVF coarse quantizers (a sample
    of ~30-256 vectors per centroid; full-corpus distributed fits buy no
    pruning quality and cost one Spark job per Lloyd iteration). The
    collect here is capped by ``train_cap`` BY CONSTRUCTION — it is a
    sample-train, never a corpus materialization."""
    import numpy as np

    sample = emb.orderBy("vec_id").limit(train_cap).select("v").collect()
    X = np.asarray([r["v"] for r in sample], dtype=np.float64)
    norms = np.linalg.norm(X, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    X = X / norms
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(10):
        assign = (X @ C.T).argmax(axis=1)
        for j in range(len(C)):
            members = X[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
        cn = np.linalg.norm(C, axis=1, keepdims=True)
        cn[cn == 0.0] = 1.0
        C = C / cn
    centers = [(i, [float(x) for x in c]) for i, c in enumerate(C)]
    return emb.sparkSession.createDataFrame(
        centers, "cid int, cv array<double>"
    )


def ivf_topk(
    embeddings: DataFrame,
    probe_vec_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF-pruned cosine top-k: assign every vector to its max-cosine
    centroid, search only the probe's ``nprobe`` best clusters."""
    emb = embeddings.select("vec_id", _to_double("embedding").alias("v"))
    centroids = train_ivf_centroids(emb, n_centroids=n_centroids, seed=seed)
    # Assignment pass: argmax cosine over broadcast centroids.
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("cid")
    )
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("ccos", quant6(cosine_expr("v", "cv")))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "cid")
    )
    probe_clusters = (
        assigned.filter(F.col("vec_id") == probe_vec_id)
        .select(F.col("v").alias("pv"))
        .crossJoin(F.broadcast(centroids))
        .withColumn("ccos", quant6(cosine_expr("pv", "cv")))
        .orderBy(F.col("ccos").desc(), F.col("cid"))
        .limit(nprobe)
        .select("cid")
    )
    probe = assigned.filter(F.col("vec_id") == probe_vec_id).select(
        F.col("v").alias("pv")
    )
    return (
        assigned.join(F.broadcast(probe_clusters), "cid")
        .filter(F.col("vec_id") != probe_vec_id)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            quant6(cosine_expr("v", "pv")).alias("cosine"),
            "cid",
        )
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
