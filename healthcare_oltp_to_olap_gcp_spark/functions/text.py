"""Text column expressions (tokenization, shingles, quality signals).

All JVM-side (``pyspark.sql.functions`` higher-order functions) — no
Python UDFs in the hot path, so whole-stage codegen applies and the same
code scales to billions of documents.

The stopword constants are the single source of truth: the DuckDB
oracle SQL in ``oracles.py`` is generated from the same lists, so the
Spark query and the oracle can never drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EN_STOP = ("the", "and", "is", "of", "to", "in", "that", "it", "a")
DE_STOP = ("und", "der", "die", "das", "ist", "ein", "zu", "nicht")
FR_STOP = ("le", "la", "les", "et", "des", "une", "est", "dans")
ES_STOP = ("el", "los", "las", "una", "es", "por", "con", "para")

# CJK unified ideographs; Java regex form (Spark) — RE2 form for DuckDB
# lives in oracles.py.
CJK_PATTERN_JAVA = "[一-鿿]"

# GPT-2-style pre-tokenizer shape: contractions, letter runs, digit
# runs, punctuation runs (no lookarounds, so the same pattern parses in
# Java regex and RE2). Token count under this pattern approximates BPE
# pre-tokenization counts.
BPE_PATTERN = "'(?:s|d|m|t|ll|ve|re)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9\\s']+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens, empties dropped."""
    return F.filter(F.split(F.lower(_col(text)), r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text)).cast("long")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (space-joined); empty when < n tokens.

    Built from O(1) ``element_at`` lookups per position — ``slice()``
    would copy O(len) per shingle, turning shingling quadratic in
    document length (measured 5x slowdown on the bench corpus).
    """
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def stop_hits(toks: Column, stops: tuple[str, ...]) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in stops])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("long")


def punct_count(text: Column | str) -> Column:
    """Characters that are neither alphanumeric nor whitespace."""
    c = _col(text)
    return F.char_length(F.regexp_replace(c, r"[a-zA-Z0-9\s]", "")).cast("long")


def normalized(text: Column | str) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum
    (keeping spaces), collapse whitespace, trim."""
    c = F.lower(_col(text))
    c = F.regexp_replace(c, r"[^a-z0-9 ]", "")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def cjk_count(text: Column | str) -> Column:
    c = _col(text)
    return F.char_length(c) - F.char_length(F.regexp_replace(c, CJK_PATTERN_JAVA, ""))
