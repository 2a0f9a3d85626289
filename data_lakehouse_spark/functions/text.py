"""Text-analysis column functions for LLM-data pipelines.

All are pure ``Column`` expressions (JVM-side). Designed so each has an
exact ANSI-SQL equivalent for the DuckDB oracle — deterministic, no RNG,
no Python in the hot path. At 100 TB these run inside whole-stage
codegen on the scan, so cost is one pass over the text column.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from data_lakehouse_spark.functions.scalars import round_half_up

__all__ = [
    "token_count",
    "char_count",
    "avg_token_len",
    "stopword_ratio",
    "quality_score",
    "doc_fingerprint",
    "language_guess",
    "normalized_text",
    "bpe_ish_token_count",
    "winnow_fingerprints",
]

#: BPE-style pre-tokenizer classes: letter runs, digit runs, and runs of
#: other non-space symbols — the GPT-2 pattern minus lookahead and
#: contraction special-cases, so the SAME pattern runs identically under
#: Java regex (Spark) and RE2 (DuckDB): the three classes are disjoint,
#: making the tokenization alternation-order-independent.
BPE_ISH_PATTERN = r"\p{L}+|\p{N}+|[^\p{L}\p{N}\s]+"

# A tiny language-agnostic stopword set used by the quality heuristics.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

_WS = r"\s+"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalized_text(text: Column | str) -> Column:
    """Lower-cased, whitespace-collapsed, trimmed text (dedup canon form)."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), _WS, " "))


def token_count(text: Column | str) -> Column:
    """Whitespace token count; 0 for empty/NULL-ish strings."""
    t = F.trim(_col(text))
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, _WS))).cast("bigint")


def char_count(text: Column | str) -> Column:
    return F.length(_col(text)).cast("bigint")


def avg_token_len(text: Column | str) -> Column:
    """Mean token length = len(text without whitespace) / token count."""
    t = F.trim(_col(text))
    n = token_count(t)
    chars = F.length(F.regexp_replace(t, _WS, ""))
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(chars.cast("double") / n, 4)
    )


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of whitespace tokens that are stopwords (lowercased)."""
    t = F.trim(F.lower(_col(text)))
    toks = F.split(t, _WS)
    n = token_count(t)
    sw = F.array([F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        round_half_up(hits.cast("double") / n, 4)
    )


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + mean-token-length band. Deterministic, SQL-expressible."""
    t = _col(text)
    n = token_count(t)
    atl = avg_token_len(t)
    swr = stopword_ratio(t)
    len_ok = F.when((n >= 10) & (n <= 10000), F.lit(0.4)).otherwise(F.lit(0.0))
    sw_ok = F.when((swr >= 0.01) & (swr <= 0.6), F.lit(0.3)).otherwise(F.lit(0.0))
    atl_ok = F.when((atl >= 2.0) & (atl <= 12.0), F.lit(0.3)).otherwise(F.lit(0.0))
    return round_half_up(len_ok + sw_ok + atl_ok, 2)


def doc_fingerprint(text: Column | str) -> Column:
    """Content fingerprint: MD5 of the normalized text (exact-dup key)."""
    return F.md5(normalized_text(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Sub-word-ish token count via the BPE-style pre-tokenizer regex —
    the usual first-order estimate of LLM token cost (whitespace counts
    under-estimate code/punctuation-heavy text). One JVM ``regexp_count``
    per row, inside codegen."""
    return F.regexp_count(_col(text), F.lit(BPE_ISH_PATTERN)).cast("bigint")


def winnow_fingerprints(
    text: Column | str, *, k: int = 5, window: int = 4
) -> Column:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD 2003):
    hash every ``k``-gram of the normalized token stream, then keep the
    minimum hash of each sliding ``window`` — the standard
    position-robust near-dup/plagiarism fingerprint set.

    Returns a sorted distinct ``array<string>`` of selected md5 hashes.
    Using the md5 HEX STRING as the rolling hash keeps selection
    (lexicographic min) bit-identical across Spark and any SQL oracle —
    no base-16 integer folding needed.

    Convenience single-expression form: the window scan references the
    k-gram array once per window, and Catalyst expression trees are
    trees — an INLINE kgram pipeline re-evaluates per reference (the
    O(len²) blowup documented at ``dedup.shingles_of_tokens``). For the
    hot path use ``dedup.winnow_fingerprint_df``, which materializes
    the token and k-gram arrays as projection columns first.
    """
    toks = F.split(normalized_text(text), " ")
    kgrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0))),
        lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
    )
    return _winnow_from_kgrams(kgrams, window)


def _winnow_from_kgrams(kgrams: Column, window: int) -> Column:
    wins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(kgrams) - window, F.lit(0))),
        lambda j: F.array_min(F.slice(kgrams, j + 1, window)),
    )
    return F.array_sort(F.array_distinct(wins))


def language_guess(text: Column | str) -> Column:
    """Toy n-gram-free language ID: scores a handful of high-frequency
    function words per language and picks the max (ties → 'en' order).

    Real deployments plug a model in via mapInPandas; this keeps the
    operator deterministic and oracle-checkable.
    """
    toks = F.split(F.trim(F.lower(_col(text))), _WS)
    markers = {
        "en": ("the", "and", "of"),
        "es": ("el", "la", "de"),
        "fr": ("le", "la", "et"),
        "de": ("der", "die", "und"),
        "zh": ("的", "是", "了"),
    }

    def score(words: tuple[str, ...]) -> Column:
        arr = F.array([F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))

    scores = {lang: score(words) for lang, words in markers.items()}
    best = F.greatest(*scores.values())
    expr = F.when(best == 0, F.lit("unknown"))
    for lang in ("en", "es", "fr", "de", "zh"):  # tie-break order
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr.otherwise(F.lit("unknown"))
