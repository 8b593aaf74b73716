"""Training-data curation operators (round 4): deterministic stratified
sampling and held-out split assignment.

Both are hash-threshold ops, not ``df.sample``: at 100 TB a sample/split
must be reproducible across engines, runs, retries, repartitions and
incremental re-ingests — membership must be a pure function of the row's
identity, never of partition layout or RNG state. That is the property a
training corpus needs so that (a) re-running curation after a late batch
doesn't reshuffle membership of old rows, and (b) the eval split can be
decontaminated against exactly (llm_decontaminate) because it is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import Query
from ._util import t

# Per-language keep thresholds on the first two hex chars of md5(doc_id):
# 'en' dominates the corpus, so it is downsampled to ~25% (0x40/0x100)
# while under-represented languages are kept IN FULL (no filter at all —
# a strictly-below 'ff' comparison would silently drop the 0xff bucket,
# ~0.4% of every stratum) — the standard rebalancing move in multilingual
# corpus curation.
STRATA_THRESHOLDS = {"en": "40"}


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic sampling: keep a row iff the md5 of its
    id falls below its stratum's threshold; strata without a threshold
    are kept whole. One codegen'd map pass — no shuffle, no RNG; the
    sample is a pure function of (doc_id, lang)."""
    docs = t(spark, sf_dir, "documents")
    fp = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    keep = F.lit(True)
    for lang, th in STRATA_THRESHOLDS.items():
        keep = F.when(F.col("lang") == lang, fp < F.lit(th)).otherwise(keep)
    return docs.filter(keep).select("doc_id", "lang", "source", "n_chars")


SAMPLE_STRATIFIED_SQL = """
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE CASE WHEN lang = 'en'
           THEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '40'
           ELSE TRUE END
"""


def llm_data_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (~90/5/5) from the id
    hash. Row-level output so the oracle checks every assignment, not
    just the counts. Scale: one map pass; the split column then drives
    partitioned writes downstream (`partitionBy("split")`)."""
    docs = t(spark, sf_dir, "documents")
    fp = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    return docs.select(
        "doc_id",
        F.when(fp < "e6", "train")
        .when(fp < "f3", "val")
        .otherwise("test")
        .alias("split"),
    )


LLM_DATA_SPLIT_SQL = """
SELECT doc_id,
       CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                THEN 'train'
            WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3'
                THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


QUERIES: dict[str, Query] = {
    "sample_stratified": Query(
        sample_stratified, SAMPLE_STRATIFIED_SQL,
        "per-stratum deterministic hash sampling (corpus rebalancing)",
    ),
    "llm_data_split": Query(
        llm_data_split, LLM_DATA_SPLIT_SQL,
        "deterministic train/val/test split assignment",
    ),
}
