"""Skew-mitigation and shuffle-avoidance join strategies.

AQE's skew-join handles most hot-key cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on by default in session.py);
this module provides the two manual levers for when it can't:

- **Salting** — for a skewed shuffle join where one side has hot keys:
  append a salt ``0..S-1`` to the big side's key (deterministic, derived
  from a secondary column — never ``rand()``, which breaks retry/replay
  determinism), replicate the small side S×, join on (key, salt). Hot-key
  partitions shrink by S at the cost of S× duplication of the other side.
- **Bucketing** — for repeated joins on the same key: pre-shuffle both
  tables into the same bucket layout (``bucketBy`` + ``saveAsTable``);
  subsequent joins read co-located buckets with NO exchange on either side
  (asserted in tests/test_plans.py). At 100 TB this converts every
  recurring fact⋈fact join from a full shuffle into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_from: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big ⋈ small`` on ``key`` with salt-spread hot keys.

    ``salt_from`` is a column on the big side whose hash spreads rows of
    the same key across salts (e.g. the line number within an order).
    Semantically identical to the plain join — verified by the oracle.

    Only big-side-preserving join types are allowed: under 'right' or
    'full', unmatched SMALL-side rows would surface once per salt replica
    (num_salts copies), which is not the plain join's result.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join: how={how!r} is not semantics-preserving under "
            f"small-side replication; use one of {sorted(allowed)}"
        )
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_from)), F.lit(num_salts))
    )
    salts = F.explode(
        F.array(*[F.lit(i) for i in range(num_salts)])
    ).alias("__salt")
    replicated_small = small.select("*", salts)
    out = salted_big.join(replicated_small, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int,
    path: str,
) -> None:
    """Persist a table in bucket layout (Hive-compatible bucketing)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key_l: str, key_r: str
) -> DataFrame:
    """Join two same-bucketed tables — zero exchanges in the plan."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    return lt.join(rt, lt[key_l] == rt[key_r])
