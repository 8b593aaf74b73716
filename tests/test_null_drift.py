"""Null-drift parity sweep — the round-5 fixture-regeneration insurance.

The driver regenerates fixtures between rounds, and round 2 proved a
silent generator change can break many keys at once. This module rebuilds
that scenario on demand: it copies sf0.001 with ~3% NULLs injected into
the measure/categorical/text columns (primary keys and ts stay intact
here — null TIMESTAMPS get their own dedicated axis in
tests/test_const_drift.py::test_null_ts_drift_parity, added round 9 —
ts feeds the unit sniffer and calendar spines) and asserts every registry
key still hash-matches its DuckDB oracle on the SAME perturbed data.

Round-4 findings that motivated this (all fixed): applyInPandas integer
casts crashing on NaN (udaf_grouped), NULL payload synthesis crashing
four mm_ decoders, Spark NULLS FIRST vs DuckDB NULLS LAST shifting every
percent_rank, and two oracles missing the Spark side's NULL filters.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from serverless_etl_aws_spark.compare import compare
from serverless_etl_aws_spark.queries import build_registry

REGISTRY = build_registry()

SRC = "/root/testdata/sf0.001"

NULLABLE = {
    "documents": ["text", "lang", "source"],
    "events": ["event_type", "value", "props"],
    # o_orderdate: window ORDER BY columns are the null-ordering
    # divergence class (Spark asc = NULLS FIRST, DuckDB = NULLS LAST) —
    # an adversarial review found three contract window keys unpinned,
    # and this column is what exercises them.
    "orders": ["o_totalprice", "o_orderpriority", "o_orderdate"],
    "lineitem": [
        "l_quantity", "l_discount", "l_returnflag", "l_shipdate",
        "l_extendedprice",
    ],
}
COPY = ["region", "nation", "customer", "supplier", "part", "embeddings"]


@pytest.fixture(scope="session")
def null_sf_dir(tmp_path_factory) -> str:
    dst = str(tmp_path_factory.mktemp("nullfix"))
    rng = np.random.default_rng(3)
    for name, cols in NULLABLE.items():
        tbl = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        n = len(tbl)
        for col in cols:
            idx = tbl.schema.get_field_index(col)
            mask = rng.random(n) < 0.03
            arr = tbl[col].to_pylist()
            for i in np.flatnonzero(mask):
                arr[i] = None
            tbl = tbl.set_column(
                idx, col, pa.array(arr, type=tbl.schema.field(col).type)
            )
        pq.write_table(tbl, os.path.join(dst, f"{name}.parquet"))
    for name in COPY:
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    return dst


@pytest.mark.parametrize("key", sorted(REGISTRY))
def test_null_drift_parity(spark, null_sf_dir, key):
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, null_sf_dir), q.sql, null_sf_dir, strict=True)
    assert result.ok, (
        f"{key}: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )


@pytest.fixture(scope="session")
def ns_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with events.ts re-encoded at nanosecond unit — the exact
    drift class that broke six keys in round 2 (the generator switched
    units between rounds; catalog.events_reader_setup footer-sniffs)."""
    dst = str(tmp_path_factory.mktemp("nsfix"))
    tbl = pq.read_table(os.path.join(SRC, "events.parquet"))
    idx = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(idx, "ts", tbl["ts"].cast(pa.timestamp("ns")))
    pq.write_table(tbl, os.path.join(dst, "events.parquet"))
    for name in [*NULLABLE, *COPY]:
        if name != "events":
            shutil.copy(
                os.path.join(SRC, f"{name}.parquet"),
                os.path.join(dst, f"{name}.parquet"),
            )
    return dst


EVENTS_KEYS = sorted(
    key
    for key, q in REGISTRY.items()
    if "FROM events" in (q.sql or "")
    # rows-only keys (sql=None) that read events — listed explicitly
    # because the SQL scan above cannot see them
    or key in ("stream_stateful", "ingest_incremental", "agg_approx_distinct")
)


@pytest.mark.parametrize("key", EVENTS_KEYS)
def test_ts_unit_drift_parity(spark, ns_sf_dir, key):
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, ns_sf_dir), q.sql, ns_sf_dir, strict=True)
    assert result.ok, (
        f"{key}: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )


@pytest.fixture(scope="session")
def unicode_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with ~20% of documents carrying multi-byte tokens (accented
    latin, CJK, an astral emoji). Byte-vs-char and UTF-16-vs-codepoint
    divergences live here: round 4 caught RE2's ASCII-only \\b disagreeing
    with Java's unicode \\b (stopword counts) and Levenshtein editing
    UTF-16 units vs bytes."""
    dst = str(tmp_path_factory.mktemp("unifix"))
    rng = np.random.default_rng(5)
    extra = [
        "héllo", "日本語テキスト", "emoji🙂tok", "ÜBER", "naïve", "ação",
        # Java-vs-RE2 \b and full-vs-simple lowercase divergence probes
        # (the round-4 adversarial-review classes): a marker word fused
        # to a non-ASCII letter, Turkish dotted capital I (Java lower →
        # 'i'+U+0307, utf8proc → 'i'), word-final Greek sigma (Java
        # context-maps Σ→ς), and a phone shape abutting non-ASCII.
        "theé", "İstanbul", "ΟΔΟΣ", "é123-456-7890é",
    ]
    tbl = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = tbl["text"].to_pylist()
    for i in range(len(texts)):
        if texts[i] is not None and rng.random() < 0.2:
            toks = texts[i].split(" ")
            toks[int(rng.integers(0, len(toks)))] = extra[
                int(rng.integers(0, len(extra)))
            ]
            texts[i] = " ".join(toks)
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(t) if t is not None else None for t in texts], pa.int64()),
    )
    pq.write_table(tbl, os.path.join(dst, "documents.parquet"))
    for name in ["events", "orders", "lineitem", *COPY]:
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    return dst


TEXT_KEYS = sorted(
    key
    for key, q in REGISTRY.items()
    if "documents" in (q.sql or "") or key.startswith(("llm_", "mm_"))
)


@pytest.mark.parametrize("key", TEXT_KEYS)
def test_unicode_drift_parity(spark, unicode_sf_dir, key):
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, unicode_sf_dir), q.sql, unicode_sf_dir, strict=True)
    assert result.ok, (
        f"{key}: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )


@pytest.fixture(scope="session")
def empty_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with empty / single-token / whitespace-only document texts
    and empty (non-NULL) event props. Empty strings are a distinct drift
    class from NULLs: round 4 caught ANSI Spark erroring on 0-char
    division (llm_quality_score) and DuckDB's json_extract hard-erroring
    on '' where get_json_object returns NULL (fn_json)."""
    dst = str(tmp_path_factory.mktemp("emptyfix"))
    rng = np.random.default_rng(9)
    tbl = pq.read_table(os.path.join(SRC, "documents.parquet"))
    texts = tbl["text"].to_pylist()
    for i in range(len(texts)):
        r = rng.random()
        if r < 0.02:
            texts[i] = ""
        elif r < 0.04:
            texts[i] = "single"
        elif r < 0.05:
            texts[i] = "  "
    tbl = tbl.set_column(
        tbl.schema.get_field_index("text"), "text", pa.array(texts, pa.string())
    )
    tbl = tbl.set_column(
        tbl.schema.get_field_index("n_chars"),
        "n_chars",
        pa.array([len(t) if t is not None else None for t in texts], pa.int64()),
    )
    pq.write_table(tbl, os.path.join(dst, "documents.parquet"))
    ev = pq.read_table(os.path.join(SRC, "events.parquet"))
    props = ev["props"].to_pylist()
    for i in np.flatnonzero(rng.random(len(ev)) < 0.03):
        props[i] = ""
    ev = ev.set_column(
        ev.schema.get_field_index("props"), "props", pa.array(props, pa.string())
    )
    pq.write_table(ev, os.path.join(dst, "events.parquet"))
    for name in ["orders", "lineitem", *COPY]:
        shutil.copy(
            os.path.join(SRC, f"{name}.parquet"),
            os.path.join(dst, f"{name}.parquet"),
        )
    return dst


EMPTY_KEYS = sorted(set(TEXT_KEYS) | {"fn_json", "fn_regexp_extract_all"})


@pytest.mark.parametrize("key", EMPTY_KEYS)
def test_empty_string_drift_parity(spark, empty_sf_dir, key):
    q = REGISTRY[key]
    result = compare(key, q.fn(spark, empty_sf_dir), q.sql, empty_sf_dir, strict=True)
    assert result.ok, (
        f"{key}: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )


@pytest.fixture(scope="session")
def nullvec_sf_dir(tmp_path_factory) -> str:
    """sf0.001 with the EMBEDDING column itself drifted — the one column
    the main null sweep leaves intact: ~3% of vectors get one NULL
    element, a few vectors become NULL wholesale, and one becomes the
    empty list. This is the fixture shape that splits Spark's
    three-valued exists/forall (NULL) from a naive len(list_filter(...))
    oracle emulation (FALSE/TRUE) — ADVICE r4."""
    dst = str(tmp_path_factory.mktemp("nullvecfix"))
    rng = np.random.default_rng(11)
    tbl = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    idx = tbl.schema.get_field_index("embedding")
    vecs = tbl["embedding"].to_pylist()
    for i in range(len(vecs)):
        r = rng.random()
        if r < 0.01:
            vecs[i] = None
        elif r < 0.02:
            vecs[i] = []
        elif r < 0.05 and vecs[i]:
            v = list(vecs[i])
            v[int(rng.integers(len(v)))] = None
            vecs[i] = v
    tbl = tbl.set_column(
        idx, "embedding", pa.array(vecs, type=tbl.schema.field("embedding").type)
    )
    pq.write_table(tbl, os.path.join(dst, "embeddings.parquet"))
    for name in [*NULLABLE, *COPY]:
        if name != "embeddings":
            shutil.copy(
                os.path.join(SRC, f"{name}.parquet"),
                os.path.join(dst, f"{name}.parquet"),
            )
    return dst


def test_higher_order_3vl_parity_under_null_vector_elements(
    spark, nullvec_sf_dir
):
    """fn_higher_order's oracle mirrors Spark's 3VL exists/forall and
    fold-NULL-poisoning explicitly; this pins it against the drifted
    embedding column (NULL elements, NULL vectors, an empty vector)."""
    q = REGISTRY["fn_higher_order"]
    result = compare(
        "fn_higher_order", q.fn(spark, nullvec_sf_dir), q.sql, nullvec_sf_dir,
        strict=True
    )
    assert result.ok, (
        f"fn_higher_order: {result.detail} "
        f"(spark={result.rows_spark}, oracle={result.rows_oracle})"
    )
