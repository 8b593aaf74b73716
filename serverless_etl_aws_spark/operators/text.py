"""Text-analysis building blocks: tokenization, shingles, fingerprints,
language-ID and quality scoring — all JVM-side column expressions (no
Python in the row path), designed for the 100 TB training-data pipeline
use case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tokenization: single-space split (the corpus is single-spaced text).
# For messier corpora swap in split('\\s+') — keep the oracle SQL in sync.
def tokens(col: str = "text") -> Column:
    return F.split(F.col(col), " ")


def word_ngrams(k: int, col: str = "text") -> Column:
    """Distinct k-word shingles joined by spaces. Docs with fewer than k
    tokens yield an EMPTY array: an unguarded ``sequence(0, size - k)``
    goes negative on short docs and Spark's sequence then counts *down*,
    producing negative indices → INVALID_ARRAY_INDEX at runtime. The guard
    also matches the DuckDB oracles' ``len(toks) >= k`` predicate.

    The split is bound ONCE per row as a lambda variable (the outer
    single-element ``transform``): inlining ``split()`` in the inner lambda
    re-tokenizes the whole document per shingle index — O(tokens²) per doc,
    measured 5× slower on the decontamination key at sf0.1. Spark has no
    SQL ``LET``; the 1-element transform is the standard binding idiom."""
    return F.expr(
        f"transform(array(split({col}, ' ')), toks -> "
        f"CASE WHEN size(toks) >= {k} THEN "
        f"array_distinct(transform(sequence(0, size(toks) - {k}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {k})))) "
        f"ELSE cast(array() AS array<string>) END)[0]"
    )


def trigrams(col: str = "text") -> Column:
    """Distinct word-trigram shingles of ``col`` (short docs → empty
    array). Takes a column NAME like :func:`word_ngrams` — the previous
    signature accepted (and silently ignored) a Column, hardcoding
    'text' for every caller."""
    return word_ngrams(3, col)


#: Whitespace class pinned EXPLICITLY on both engines: Java's ``\s`` is
#: ``[ \t\n\x0B\f\r]`` while RE2's (DuckDB) excludes vertical tab — a
#: document containing \x0B would normalize differently and silently
#: hash-mismatch. One literal class, same bytes, any engine.
WS_CLASS = r"[ \t\n\r\f\x0B]"


def fingerprint(col: str = "text") -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lower + trim + collapse whitespace). Same bytes → same hash in any
    engine, which is what makes this the exact-dedup key at scale."""
    return F.md5(
        F.lower(F.trim(F.regexp_replace(F.col(col), WS_CLASS + "+", " ")))
    )


SQL_FINGERPRINT = (
    r"md5(lower(trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))))"
)


# Language-ID: marker-word counting. Deliberately simple and fully
# SQL-expressible so the oracle can verify it; a production lang-ID would
# swap in a fastText-style model behind the same column contract.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "es": ["el", "la", "que"],
    "de": ["der", "und", "die"],
    "fr": ["le", "et", "les"],
    "zh": ["de", "shi", "le"],
}
LANG_ORDER = ["en", "es", "de", "fr", "zh"]  # tie-break priority


def lang_score(lang: str, col: str = "text") -> Column:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return F.regexp_count(F.lower(F.col(col)), F.lit(pat))


def sql_lang_score(lang: str) -> str:
    pat = r"\b(" + "|".join(LANG_MARKERS[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pat}'))"
