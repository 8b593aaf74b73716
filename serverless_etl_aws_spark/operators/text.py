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

#: ASCII-only lowercasing, pinned on both engines. ``lower()`` is NOT
#: portable: Spark applies Java's full case mapping (lower('İ') =
#: 'i̇', two codepoints; word-final 'Σ' → 'ς') while DuckDB applies
#: utf8proc's simple mapping (lower('İ') = 'i') — any lower()-derived
#: hash, token count, or membership test diverges on such characters.
#: ``translate`` is per-codepoint in both engines and leaves non-ASCII
#: untouched, which is exactly the normalization an ASCII marker/
#: stopword comparison needs.
_ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(c: Column) -> Column:
    return F.translate(c, _ASCII_UPPER, _ASCII_LOWER)


def sql_ascii_lower(expr: str) -> str:
    return f"translate({expr}, '{_ASCII_UPPER}', '{_ASCII_LOWER}')"


def ascii_upper(c: Column) -> Column:
    """Engine-portable uppercase (same class as ascii_lower: JVM upper()
    is full case mapping — one-to-many like ß → 'SS' — while DuckDB's
    utf8proc is simple and length-preserving)."""
    return F.translate(c, _ASCII_LOWER, _ASCII_UPPER)


def sql_ascii_upper(expr: str) -> str:
    return f"translate({expr}, '{_ASCII_LOWER}', '{_ASCII_UPPER}')"


def fingerprint(col: str = "text") -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (ASCII-lower + trim + collapse whitespace). Same bytes → same hash in
    any engine, which is what makes this the exact-dedup key at scale.
    ASCII-only lowering on purpose: full-Unicode lower() differs between
    engines (see ascii_lower) and a locale-sensitive fingerprint is the
    wrong dedup key anyway."""
    return F.md5(
        ascii_lower(F.trim(F.regexp_replace(F.col(col), WS_CLASS + "+", " ")))
    )


SQL_FINGERPRINT = (
    r"md5(" + sql_ascii_lower(
        r"trim(regexp_replace(text, '[ \t\n\r\f\x0B]+', ' ', 'g'))"
    ) + r")"
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


def lang_tokens(col: str = "text") -> Column:
    """The shared tokenization all language scores read: ASCII-lowered,
    space-split. Compute it ONCE per row (its own projection step) and
    pass the column to :func:`lang_score` — inlining it into each of the
    five per-language scores re-lowers and re-splits the text 5× per row
    (measured 1.8× on llm_lang_id's warm wall time, the round-4 bench
    swing)."""
    return F.split(ascii_lower(F.col(col)), " ")


def lang_score(lang: str, tokens: Column | None = None) -> Column:
    """Marker hits counted by token equality, NOT a ``\\b`` regex:
    Java's ``\\b`` is Unicode-aware while RE2's is ASCII-only, so a
    marker abutting a non-ASCII letter ('the' in 'theé') is a hit for
    DuckDB and none for Spark — the same divergence class
    llm_quality_score's stopword counting already dodges. Split-token
    membership over ASCII-lowered text is identical on both engines
    under any content.

    ``tokens`` is the :func:`lang_tokens` array; when scoring several
    languages, project it once first (see lang_tokens)."""
    markers = LANG_MARKERS[lang]
    return F.size(
        F.filter(
            lang_tokens() if tokens is None else tokens,
            lambda tok: tok.isin(*markers),
        )
    )


def sql_lang_score(lang: str) -> str:
    in_list = ",".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return (
        "len(list_filter(string_split("
        + sql_ascii_lower("text")
        + ", ' '), t -> t IN ("
        + in_list
        + ")))"
    )
