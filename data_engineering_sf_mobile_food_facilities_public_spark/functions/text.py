"""Text-analysis functions for the LLM-training-data pipeline extensions
(BASELINE.json north star: "text analysis").

All functions are pure Catalyst column expressions — JVM-side, codegen'd,
no Python UDFs — so they run at full scan speed over 100 TB of documents.
Each has an exact ANSI-SQL twin used by the DuckDB oracle (see
``plans/text_analysis.py``).

Design notes for scale:
- tokenization is a regex split (no shuffle; fuses into the scan);
- language-ID is stopword voting over the token array via higher-order
  functions (``filter``/``size``) — a heuristic, but deterministic and
  cheap; a real model would be a pandas_udf scoring stage;
- fingerprints are md5 of whitespace-normalized text: stable across
  engines, usable as an exact-dedup key at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Portable whitespace class. Java regex (Spark) and RE2 (DuckDB) DISAGREE
# on the shorthand ``\s``: Java's is ``[ \t\n\x0B\f\r]`` (includes U+000B,
# vertical tab) while RE2's is ``[\t\n\f\r ]`` (excludes it).  A corpus
# containing U+000B therefore tokenizes differently in the two engines,
# which silently breaks every oracle comparison downstream of a token
# count or a whitespace-normalized fingerprint.  Spelling the class out
# with explicit escapes is interpreted identically by both engines
# (proven by tests/test_hostile_whitespace.py), so ``\s`` MUST NOT appear
# in any oracle-paired expression — use these constants instead.
WS_REGEX = r"[ \t\n\x0B\f\r]+"
# The same pattern for embedding inside a *Spark SQL* string literal:
# Spark's default (non-ANSI) parser unescapes backslashes once, so each
# backslash must be doubled there (DuckDB's plain '…' literals do NOT
# unescape, so WS_REGEX embeds into oracle SQL as-is).
WS_REGEX_SPARK_SQL = WS_REGEX.replace("\\", "\\\\")

# language -> stopword vote list (tiny on purpose; deterministic)
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "ist"),
    "en": ("the", "a", "and", "is"),
    "es": ("el", "los", "y", "es"),
    "fr": ("le", "la", "et", "est"),
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization: split on runs of whitespace after trim.
    Uses the explicit :data:`WS_REGEX` class, not ``\\s`` — see the
    portability note above."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), WS_REGEX)


def bpe_ish_tokens(col: Column | str) -> Column:
    """BPE-ish tokenization: alphabetic runs and digit runs as separate
    tokens (the word/number split most BPE vocabularies make first)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit("[a-zA-Z]+|[0-9]+"), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def punct_count(col: Column | str) -> Column:
    """Number of ASCII punctuation characters."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) - F.length(F.regexp_replace(c, r"[.,;:!?]", ""))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of ``lang`` (higher-order
    ``filter`` over the token array — no explode, no shuffle)."""
    words = LANG_STOPWORDS[lang]
    toks = tokens(col)
    in_list = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(in_list, t)))


def quality_score(col: Column | str) -> Column:
    """Deterministic quality heuristic in [0, ~1]: rewards stopword density
    (natural-language-ness) and mid-length tokens, penalizes punctuation
    soup.  score = stop_ratio - 0.5 * punct_ratio + 0.1 * min(n_tokens, 100) / 100
    """
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    stop_ratio = stopword_hits(c, "en").cast("double") / n_tok
    # empty document: punct_ratio is 0 by definition (ANSI mode would
    # otherwise raise DIVIDE_BY_ZERO; the DuckDB oracle twin guards the
    # same way with nullif/coalesce)
    punct_ratio = F.when(
        F.length(c) > 0, punct_count(c).cast("double") / F.length(c).cast("double")
    ).otherwise(F.lit(0.0))
    len_bonus = F.least(n_tok, F.lit(100.0)) / F.lit(100.0)
    return stop_ratio - F.lit(0.5) * punct_ratio + F.lit(0.1) * len_bonus


def lang_id(col: Column | str) -> Column:
    """Stopword-vote language ID with deterministic tiebreak (first of
    de/en/es/fr in code order wins ties; 'und' when no stopword hits)."""
    c = F.col(col) if isinstance(col, str) else col
    hits = {lang: stopword_hits(c, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build CASE in reverse so earlier langs win ties
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((hits[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def normalized_text(col: Column | str) -> Column:
    """Lowercase + collapse whitespace — the canonical form for exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), WS_REGEX, " ")


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 of the normalized text (hex string —
    identical in any engine, so it doubles as a cross-system dedup key)."""
    return F.md5(normalized_text(col))
