"""Near-duplicate detection at corpus scale: MinHash-LSH, SimHash banding,
and exact n-gram Jaccard — the dedup family a 100 TB training-data pipeline
needs (BASELINE.json north_star).

Scale posture per variant:
- **n-gram Jaccard** (exact): explode shingles → equi-join on shingle →
  count pairs. Cost is driven by shingle document frequency; random-text
  shingles are rare, so the join output stays near the true-pair count.
  A hot shingle (boilerplate) is the skew risk — drop shingles with
  document frequency above a cap (standard "stop-shingle" trick).
- **MinHash-LSH** (approx): signature length × band joins, linear in corpus
  size. Two backends: pure-JVM banded (registry default since round 4 —
  one groupBy for all signature mins, one bucket self-join, exact verify
  on candidates only; whole-stage codegen end-to-end) and the MLlib
  ``approxSimilarityJoin`` formulation (head-to-head-tested: identical
  pair sets, MLlib 1.4× slower at sf0.1).
- **SimHash** (approx): one 64-bit signature per doc, candidates from
  16-bit band equality (4 bands → Hamming ≤ 3 guaranteed recall, wider
  radius needs more bands), verified by popcount. Cheapest at scale;
  signatures are computed in one Arrow-batched pass.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from .text import trigrams


def _join_set_sizes(inter: DataFrame, sizes: DataFrame) -> DataFrame:
    """Attach both documents' shingle-set sizes to per-pair intersection
    counts — the shared tail of every exact-Jaccard verify (ngram pair
    generation and banded-MinHash candidate verification both end here;
    keep the join and the inter/(na+nb-inter) discipline in ONE place)."""
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    return inter.join(sa, "doc_a").join(sb, "doc_b")


def _jaccard_col() -> F.Column:
    """inter / (na + nb - inter) — exact set Jaccard from the columns
    _join_set_sizes produces."""
    return F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    block_col: str | None = "lang",
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact trigram-Jaccard near-dup pairs (doc_a < doc_b, jac ≥ threshold).

    ``max_shingle_df`` is the stop-shingle cap: shingles whose document
    frequency exceeds it are removed from the shingle UNIVERSE (both the
    intersection counts and the per-doc set sizes), so Jaccard is computed
    over non-boilerplate shingles only. Without the cap one hot shingle
    (a shared header) makes the self-join output quadratic in its document
    frequency — the cap bounds the join fan-out per shingle at
    ``max_shingle_df²`` while exact duplicates still score 1.0."""
    base = docs.select(
        "doc_id",
        *( [F.col(block_col)] if block_col else [] ),
        trigrams("text").alias("grams"),
    ).filter(F.size("grams") > 0)
    # Shuffle/join on a 64-bit hash of the shingle, not the string — ~3×
    # smaller exchange and cheaper equality at any scale (collision odds
    # ~1e-9 per corpus; an intersection miscount needs a within-pair
    # collision, which is negligible).
    # The shingle relation is reused 3-4x below (DF stats, both sides of
    # the pair self-join, set sizes); localCheckpoint materializes the
    # tokenize+shingle+hash pass ONCE instead of recomputing it per use
    # (measured 2x end-to-end at sf0.1). At production scale this is the
    # standard shingle-table materialization — ~corpus-sized, on executor
    # local storage, amortized over every downstream pass.
    exploded = base.select(
        "doc_id",
        *( [F.col(block_col)] if block_col else [] ),
        F.explode("grams").alias("gram_str"),
    ).select(
        "doc_id",
        *( [F.col(block_col)] if block_col else [] ),
        F.xxhash64("gram_str").alias("gram"),
    ).localCheckpoint()
    if max_shingle_df is not None:
        # grams are distinct per doc, so count(*) per gram == document
        # frequency. The DF stats use groupBy (map-side partial agg — a
        # window over gram would put a hot shingle's rows on one task,
        # the exact skew the cap defends against), and the filter is a
        # LEFT ANTI against the broadcast HOT list: stop-shingles are few
        # by construction (at most total_grams / cap), so the cap costs
        # one broadcast map-side pass, not a second full shuffle.
        hot = (
            exploded.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("gram_df"))
            .filter(F.col("gram_df") > max_shingle_df)
            .select("gram")
        )
        exploded = exploded.join(
            F.broadcast(hot), "gram", "left_anti"
        ).localCheckpoint()
    # Per-doc set size over the (possibly capped) shingle universe —
    # grams are distinct per doc so count == set size.
    sizes = exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    a = exploded.select(
        F.col("doc_id").alias("doc_a"),
        F.col("gram"),
        *( [F.col(block_col).alias("__blk")] if block_col else [] ),
    )
    b = exploded.select(
        F.col("doc_id").alias("doc_b"),
        F.col("gram"),
        *( [F.col(block_col).alias("__blk_b")] if block_col else [] ),
    )
    if block_col:
        pairs = a.join(
            b,
            (a.gram == b.gram)
            & (F.col("__blk") == F.col("__blk_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
    else:
        pairs = a.join(b, "gram").filter(F.col("doc_a") < F.col("doc_b"))
    inter = pairs.groupBy("doc_a", "doc_b").agg(
        F.count(F.lit(1)).alias("inter")
    )
    return (
        _join_set_sizes(inter, sizes)
        .withColumn(
            "jaccard",
            # floor-quantize: no half-boundary divergence across engines
            F.floor(_jaccard_col() * 10000.0) / 10000.0,
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    dist_threshold: float = 0.5,
    num_hash_tables: int = 5,
    num_features: int = 1 << 18,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH candidate pairs via MLlib ``approxSimilarityJoin``
    (Jaccard distance ≤ dist_threshold), doc_a < doc_b.

    Features are trigram *shingles*, not unigram tokens — over a small
    vocabulary unigram MinHash signatures collide for unrelated documents
    and the LSH bucket join degenerates toward a cartesian product
    (measured: 861s → ~8s at sf0.1 for this corpus). Shingle space is
    |vocab|³, so only genuinely overlapping documents share buckets; the
    same property is what keeps bucket sizes bounded at 100 TB."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    toks = docs.select("doc_id", trigrams("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    tf = HashingTF(
        inputCol="toks", outputCol="features", numFeatures=num_features,
        binary=True,
    )
    # localCheckpoint is load-bearing, not an optimization: inside
    # approxSimilarityJoin, Catalyst pushes the posexplode's derived
    # predicates (which embed the LSH hash UDF) below the size(toks)>0
    # filter, and codegen's common-subexpression elimination evaluates
    # that UDF eagerly on PRE-filter rows — an empty-shingle doc then
    # reaches MinHashLSHModel.hashFunction, which throws "Must have at
    # least 1 non zero entry". The checkpoint is a lineage barrier: the
    # self-join starts from materialized, already-filtered signatures.
    # At scale it also computes the shingle+HashingTF pass once instead
    # of once per side of the self-join.
    feats = tf.transform(toks).localCheckpoint()
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes",
        numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(feats)
    joined = model.approxSimilarityJoin(
        feats, feats, dist_threshold, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 4).alias("jaccard_dist"),
        )
    )


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    vec_col: str = "v",
    id_col: str = "vec_id",
    max_block: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs with BOUNDED blocks (SemDeDup-style).

    Pairs are generated all-pairs *within a block*, but no block is allowed
    to grow unboundedly: any ``block_col`` group larger than ``max_block``
    is split by ONE global MLlib KMeans fit over the oversized groups'
    vectors (k sized so expected sub-blocks are ~``max_block // 2``), and
    the pair join runs on the composite ``(block, sub_cluster)`` key. With
    a fixed cap, per-block pair counts are bounded-quadratic, so total
    work is LINEAR in corpus size — the published SemDeDup recipe for
    embedding dedup at web scale. The tradeoff is recall on pairs that
    straddle sub-clusters; near-duplicates (the target) almost always
    co-cluster, and the exact-cosine verify keeps precision at 1.0.

    Blocks at or under the cap take the exact path untouched, so on
    corpora where no block exceeds ``max_block`` the result is exactly
    the all-pairs-within-block answer (what the DuckDB oracle computes).
    The two ``count()`` driver actions are scalar sizing decisions only.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from .simsearch import cosine_expr, quant6

    counts = emb.groupBy(block_col).agg(F.count(F.lit(1)).alias("__bn"))
    oversized = counts.filter(F.col("__bn") > max_block).select(block_col)
    if oversized.limit(1).count() == 0:
        blocked = emb.withColumn("__sub", F.lit(0))
    else:
        tagged = emb.join(
            F.broadcast(oversized.withColumn("__over", F.lit(True))),
            block_col,
            "left",
        )
        big = tagged.filter(F.col("__over").isNotNull()).drop("__over")
        small = (
            tagged.filter(F.col("__over").isNull())
            .drop("__over")
            .withColumn("__sub", F.lit(-1))
        )
        n_big = big.count()
        k = max(2, math.ceil(n_big / max(1, max_block // 2)))
        feats = big.withColumn("__fv", array_to_vector(F.col(vec_col)))
        model = KMeans(
            k=k, seed=seed, featuresCol="__fv", predictionCol="__sub"
        ).fit(feats)
        blocked = model.transform(feats).drop("__fv").unionByName(small)
    # Per-row norms are hoisted BEFORE the pair join: inside the join,
    # cosine_expr would recompute |a| and |b| per PAIR (O(pairs) extra
    # higher-order-function evaluations — zip_with/aggregate are
    # interpreted, not codegen'd, so they dominate the exact path).
    # dot/(na*nb) is arithmetically identical to cosine_expr, so oracle
    # hashes are unchanged.
    from .simsearch import _dot

    norm = F.sqrt(_dot(vec_col, vec_col))
    a = blocked.select(
        F.col(id_col).alias("vec_a"),
        F.col(block_col),
        F.col("__sub"),
        F.col(vec_col).alias("va"),
        norm.alias("__na"),
    )
    b = blocked.select(
        F.col(id_col).alias("vec_b"),
        F.col(block_col).alias("__blk_b"),
        F.col("__sub").alias("__sub_b"),
        F.col(vec_col).alias("vb"),
        norm.alias("__nb"),
    )
    return (
        a.join(
            b,
            (F.col(block_col) == F.col("__blk_b"))
            & (F.col("__sub") == F.col("__sub_b"))
            & (F.col("vec_a") < F.col("vec_b")),
        )
        .withColumn(
            "cosine",
            # try_divide: a zero-norm vector pair scores NULL instead of
            # throwing under ANSI Spark; NULL >= threshold is false on
            # both engines, so the pair just drops (oracle's x/0 = NULL
            # in DuckDB behaves identically)
            quant6(
                F.try_divide(
                    _dot("va", "vb"), F.col("__na") * F.col("__nb")
                )
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", block_col, "cosine")
    )


@pandas_udf(LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens; token hash = first 8 bytes of
    md5 (engine-independent, deterministic). Arrow-batched, numpy bit
    voting with a per-batch token→bits cache — the cache turns the cost
    from O(tokens) hash calls into O(vocab) per batch, which matters when
    the corpus vocabulary is much smaller than the corpus."""
    import numpy as np

    bit_cache: dict[str, "np.ndarray"] = {}

    def bits_of(tok: str) -> "np.ndarray":
        b = bit_cache.get(tok)
        if b is None:
            h = hashlib.md5(tok.encode("utf-8")).digest()[:8]
            # bits[i] == (int.from_bytes(h, 'little') >> i) & 1 — i.e.
            # the token integer IS DuckDB's md5_number_upper(tok), which
            # is what lets the whole banded pipeline carry a SQL oracle
            # (round 6 graduation): any fixed 64-bit token hash yields a
            # valid SimHash, so the convention is chosen to be the one a
            # second engine can compute natively.
            b = np.unpackbits(
                np.frombuffer(h, dtype=np.uint8), bitorder="little"
            ).astype(np.int32)
            bit_cache[tok] = b
        return b

    weights = (np.uint64(1) << np.arange(64, dtype=np.uint64))
    out = np.zeros(len(texts), dtype=np.int64)
    for idx, text in enumerate(texts):
        toks = [tk for tk in (text or "").split(" ") if tk]
        if not toks:
            continue
        ones = np.zeros(64, dtype=np.int32)
        for tok in toks:
            ones += bits_of(tok)
        sig_bits = (ones * 2 > len(toks)).astype(np.uint64)
        out[idx] = (sig_bits * weights).sum().astype(np.uint64).view(np.int64)
    return pd.Series(out, dtype="int64")


def simhash_pairs(docs: DataFrame, max_hamming: int = 6) -> DataFrame:
    """SimHash near-dup candidates: 4×16-bit band blocking (guaranteed
    recall for Hamming ≤ 3; catches most ≤ 6) + popcount verification."""
    sigs = docs.select("doc_id", simhash64(F.col("text")).alias("sig"))
    bands = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(f"(sig >> {i * 16}) & 65535").alias("band_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_idx", "band.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"),
        "band_idx", "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"),
        "band_idx", "band_val",
    )
    cands = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .distinct()
    )
    return (
        cands.withColumn(
            "hamming",
            F.bit_count(F.expr("sig_a").bitwiseXOR(F.expr("sig_b"))).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def minhash_banded_pairs(
    docs: DataFrame,
    dist_threshold: float = 0.5,
    num_hash_tables: int = 5,
    seed: int = 42,
) -> DataFrame:
    """Pure-JVM MinHash-LSH with the SAME candidate geometry as MLlib's
    ``MinHashLSH(numHashTables=n)`` (OR-amplification: a pair is a
    candidate iff ANY of the n min-hashes collide), but expressed as
    plain DataFrame ops instead of VectorUDT + per-row Scala UDFs:

    1. signature — ONE groupBy over exploded distinct trigram shingles
       computing n ``min(xxhash64(gram, seed_i))`` aggregates (map-side
       combinable: shuffle volume is O(docs), never O(shingles));
    2. candidates — posexplode the n mins to (table, hash) and self-join
       on the bucket key (shingle-based signatures scatter buckets for
       unrelated docs — the same boundedness argument as
       :func:`minhash_lsh_pairs`);
    3. verify — EXACT trigram Jaccard on candidates only, via a shingle
       equi-join semi-restricted to candidate docs, mirroring MLlib's
       exact keyDistance re-check.

    Same output contract as :func:`minhash_lsh_pairs`:
    (doc_a < doc_b, jaccard_dist rounded to 4) with dist ≤ threshold.
    At 100 TB this wins over the MLlib path on three axes: no Python/
    Scala UDF in the hot loop (whole-stage codegen end-to-end), no dense
    signature vectors shuffled (n longs per doc), and the verify join
    touches only candidate docs.
    """
    n = num_hash_tables
    grams = (
        docs.select(
            "doc_id", F.explode(F.array_distinct(trigrams("text"))).alias("gram")
        )
    ).localCheckpoint(eager=True)  # reused: signatures + verify join

    sig = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        *[
            F.min(F.xxhash64(F.col("gram"), F.lit(seed + i))).alias(f"h{i}")
            for i in range(n)
        ],
    )
    buckets = sig.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"h{i}") for i in range(n)])).alias(
            "table", "bucket"
        ),
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (
        x.join(y, ["table", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )

    ga = grams.select(F.col("doc_id").alias("doc_a"), "gram")
    gb = grams.select(F.col("doc_id").alias("doc_b"), "gram")
    inter = (
        cand.join(ga, "doc_a")
        .join(gb, ["doc_b", "gram"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        _join_set_sizes(inter, sig.select("doc_id", "n_grams"))
        .withColumn(
            "jaccard_dist",
            # round (not floor): MLlib's approxSimilarityJoin contract,
            # which this backend swap preserves verbatim
            F.round(F.lit(1.0) - _jaccard_col(), 4),
        )
        .filter(F.col("jaccard_dist") <= dist_threshold)
        .select("doc_a", "doc_b", "jaccard_dist")
    )
