"""Text analysis operators for LLM-corpus pipelines: tokenization,
language-ID heuristic, quality scoring, token counting, fingerprinting.

All pure built-in expressions (codegen'd; no Python). Arithmetic uses
integer counts and single IEEE divisions only — bit-identical in any
engine, so every operator is oracle-checkable without rounding fudge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
SEED = 7
BASE = 31

# Tiny marker vocabularies for the language-ID heuristic. A real system
# uses char-n-gram profiles (fastText-style); the heuristic's *shape* —
# per-language evidence scores -> argmax with deterministic tie-break —
# is what scales (one map pass, broadcastable profiles).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "nicht", "mit"],
    "en": ["the", "and", "of", "to", "in", "is"],
    "es": ["el", "la", "los", "de", "que", "y"],
    "fr": ["le", "la", "les", "et", "des", "est"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai"],
}


def tokens(text_col: str | Column) -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.split(c, " ")


def regex_tokens(text_col: str) -> Column:
    """BPE-ish lexer tokens: letter runs, digit runs (regexp_extract_all)."""
    return F.regexp_extract_all(F.col(text_col), F.lit("[a-z]+|[0-9]+"), 0)


def lang_scores(tokens_col: str) -> dict[str, Column]:
    """Marker-overlap count per language (array_intersect on a tiny
    broadcast-literal vocabulary)."""
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = ", ".join(f"'{m}'" for m in markers)
        out[lang] = F.expr(
            f"size(array_intersect(array_distinct({tokens_col}), array({arr})))"
        )
    return out


def lang_id(tokens_col: str) -> Column:
    """argmax language by marker evidence; ties break alphabetically."""
    scores = lang_scores(tokens_col)
    structs = F.array(
        *[F.struct(c.alias("s"), F.lit(lang).alias("lang")) for lang, c in sorted(scores.items())]
    )
    best = F.aggregate(
        structs,
        F.struct(F.lit(-1).alias("s"), F.lit("zz").alias("lang")),
        lambda acc, cur: F.when(cur["s"] > acc["s"], cur).otherwise(acc),
    )
    return best["lang"]


def quality_score(text_col: str, tokens_col: str) -> Column:
    """Deterministic quality heuristic in [0,1]:
    0.4*min(1, n_tokens/50) + 0.3*(1 - digit_ratio) + 0.3*min(1, avg_len/8)
    """
    n_tok = F.size(F.col(tokens_col))
    n_chars = F.length(F.col(text_col))
    n_digits = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", ""))
    avg_len = (n_chars - (n_tok - 1)) / n_tok  # chars net of separators
    return (
        0.4 * F.least(F.lit(1.0), n_tok / F.lit(50.0))
        + 0.3 * (F.lit(1.0) - n_digits / n_chars)
        + 0.3 * F.least(F.lit(1.0), avg_len / F.lit(8.0))
    )


def rolling_fingerprint(text_col: str) -> Column:
    """Polynomial rolling hash over characters (seed 7, base 31, mod 1e9+7)
    — an order-sensitive document fingerprint (anagram texts differ, unlike
    bag-of-words hashes). One aggregate() fold; byte-identical in DuckDB
    via list_reduce (probed)."""
    return F.expr(
        f"aggregate(transform(split({text_col}, ''), c -> cast(ascii(c) as bigint)),"
        f" cast({SEED} as bigint), (acc, c) -> (acc * {BASE} + c) % {MOD})"
    )


def rolling_fingerprint_sql(text_expr: str) -> str:
    """DuckDB rendering of rolling_fingerprint (list_reduce lacks an init
    arg -> seed is prepended)."""
    return (
        f"list_reduce(list_prepend(CAST({SEED} AS BIGINT),"
        f" list_transform(string_split({text_expr}, ''), c -> CAST(ascii(c) AS BIGINT))),"
        f" (acc, c) -> (acc * {BASE} + c) % {MOD})"
    )
