"""Text-analysis functions for training-data pipelines (task brief:
lang-ID, quality scoring, token counting, document fingerprinting).

All pure built-in expressions (regexp/array lambdas — JVM, codegen'd; no
Python in the hot path), each with a DuckDB SQL mirror so every op is
oracle-checkable. On 100 TB these are narrow per-row projections: no
shuffle, fully pipelined with the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"

#: tiny per-language stopword lists for the n-gram/stopword heuristic.
#: Deterministic tie-break: first list wins (fixed order below).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "un", "est"],
    "es": ["el", "la", "los", "de", "que", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2", "you3"],
}
LANG_ORDER = list(LANG_STOPWORDS)

QUALITY_ROUND = 6


def tokens(text: Column) -> Column:
    """Lowercased [a-z0-9]+ word tokens."""
    return F.regexp_extract_all(F.lower(text), F.lit(TOKEN_RE), 0)


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_ngrams(text: Column, n: int) -> Column:
    """Character n-gram shingles over the raw text (MinHash input)."""
    t = text
    count = F.greatest(F.length(t) - F.lit(n - 1), F.lit(0))
    return F.when(count == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.substring(t, i, F.lit(n)),
        )
    )


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-gram shingles (space-joined) over a token array — the unit
    of Gopher-style repetition accounting and benchmark decontamination.
    Pure codegen'd array expression: no shuffle, no Python."""
    count = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    return F.when(count == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: SHA-256 of whitespace-normalised lowercase
    text — the dedup key that survives reflow/case changes."""
    # collapse-then-trim: trim() strips only ASCII spaces in both engines,
    # so newlines must be collapsed to spaces before trimming
    norm = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.upper(F.sha2(norm, 256))


def stopword_hits(toks: Column, words: list[str]) -> Column:
    """Number of tokens (with multiplicity) in ``words``."""
    lit = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lit, t)))


def quality_scores(text: Column) -> dict[str, Column]:
    """Deterministic quality features, rounded for cross-engine parity:

    - n_chars, n_tokens
    - punct_ratio  = non-alnum-non-space chars / chars
    - stop_ratio   = english stopword tokens / tokens
    - avg_token_len
    - quality_score = mean(len_score, stop_score, 1 - punct_ratio)
      with len_score = least(n_tokens/100, 1), stop_score capped at 3x
      the 'natural' 0.12 stopword rate.
    """
    toks = tokens(text)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_punct = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stops = stopword_hits(toks, LANG_STOPWORDS["en"])
    stop_ratio = F.when(n_tokens > 0, stops / n_tokens).otherwise(F.lit(0.0))
    avg_len = F.when(
        n_tokens > 0,
        (n_chars - (n_tokens - 1)) / n_tokens,  # proxy: chars per token
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stop_ratio / F.lit(0.12), F.lit(1.0))
    quality = (len_score + stop_score + (F.lit(1.0) - punct_ratio)) / F.lit(3.0)
    r = QUALITY_ROUND
    return {
        "n_chars": n_chars.cast("bigint"),
        "n_tokens": n_tokens.cast("bigint"),
        "punct_ratio": F.round(punct_ratio, r),
        "stop_ratio": F.round(stop_ratio, r),
        "avg_token_len": F.round(avg_len, r),
        "quality_score": F.round(quality, r),
    }


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(text)
    return {lang: stopword_hits(toks, ws) for lang, ws in LANG_STOPWORDS.items()}


def lang_id(text: Column) -> Column:
    """Argmax language by stopword hits; deterministic tie-break by
    LANG_ORDER; 'und' (undetermined) when no list scores > 0."""
    scores = lang_scores(text)
    best = None
    best_score = None
    for lang in LANG_ORDER:
        s = scores[lang]
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors
# ---------------------------------------------------------------------------

def sql_tokens(text_expr: str) -> str:
    return f"regexp_extract_all(lower({text_expr}), '{TOKEN_RE}')"


def sql_char_ngrams(text_expr: str, n: int) -> str:
    return (
        f"CASE WHEN length({text_expr}) < {n} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, length({text_expr}) - {n} + 2), "
        f"i -> substring({text_expr}, i, {n})) END"
    )


def sql_word_ngrams(toks_expr: str, n: int) -> str:
    return (
        f"CASE WHEN len({toks_expr}) < {n} THEN CAST([] AS VARCHAR[]) "
        f"ELSE list_transform(range(1, len({toks_expr}) - {n} + 2), "
        f"i -> array_to_string(list_slice({toks_expr}, i, i + {n - 1}), ' ')) END"
    )


def sql_fingerprint(text_expr: str) -> str:
    return (
        f"upper(sha256(trim(regexp_replace(lower({text_expr}), '\\s+', ' ', 'g'))))"
    )


def sql_stopword_hits(tokens_expr: str, words: list[str]) -> str:
    lst = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({tokens_expr}, t -> list_contains({lst}, t)))"


def sql_quality_select(text_expr: str = "text") -> dict[str, str]:
    toks = sql_tokens(text_expr)
    n_chars = f"length({text_expr})"
    n_tokens = f"len({toks})"
    n_punct = f"length(regexp_replace({text_expr}, '[a-zA-Z0-9\\s]', '', 'g'))"
    punct = f"(CASE WHEN {n_chars} > 0 THEN CAST({n_punct} AS DOUBLE) / {n_chars} ELSE 0.0 END)"
    stops = sql_stopword_hits(toks, LANG_STOPWORDS["en"])
    stop_ratio = f"(CASE WHEN {n_tokens} > 0 THEN CAST({stops} AS DOUBLE) / {n_tokens} ELSE 0.0 END)"
    avg_len = (
        f"(CASE WHEN {n_tokens} > 0 THEN CAST({n_chars} - ({n_tokens} - 1) AS DOUBLE)"
        f" / {n_tokens} ELSE 0.0 END)"
    )
    len_score = f"LEAST(CAST({n_tokens} AS DOUBLE) / 100.0, 1.0)"
    stop_score = f"LEAST({stop_ratio} / 0.12, 1.0)"
    quality = f"(({len_score} + {stop_score} + (1.0 - {punct})) / 3.0)"
    r = QUALITY_ROUND
    return {
        "n_chars": f"CAST({n_chars} AS BIGINT)",
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "punct_ratio": f"round({punct}, {r})",
        "stop_ratio": f"round({stop_ratio}, {r})",
        "avg_token_len": f"round({avg_len}, {r})",
        "quality_score": f"round({quality}, {r})",
    }


def sql_lang_id(text_expr: str = "text") -> str:
    toks = sql_tokens(text_expr)
    score = {
        lang: sql_stopword_hits(toks, ws) for lang, ws in LANG_STOPWORDS.items()
    }
    # same argmax + tie-break as the Column form: walk LANG_ORDER, strict >
    best_expr = f"'{LANG_ORDER[0]}'"
    best_score = score[LANG_ORDER[0]]
    for lang in LANG_ORDER[1:]:
        s = score[lang]
        best_expr = f"(CASE WHEN {s} > {best_score} THEN '{lang}' ELSE {best_expr} END)"
        best_score = f"(CASE WHEN {s} > {best_score} THEN {s} ELSE {best_score} END)"
    return f"(CASE WHEN {best_score} > 0 THEN {best_expr} ELSE 'und' END)"


# ---------------------------------------------------------------------------
# Readability — exact-integer Flesch reading ease (quality-gate signal)
# ---------------------------------------------------------------------------

#: Java ∩ RE2 regexes (same dialect bar as scrub.py): letter-run words,
#: terminal-punctuation sentence breaks, vowel-group syllable proxy
#: (the standard dictionary-free approximation).
WORD_RE = "[A-Za-z]+"
SENT_RE = "[.!?]+"
VOWEL_RE = "[aeiouyAEIOUY]+"

#: Flesch (1948) coefficients scaled x1000 so the whole score is exact
#: int64 arithmetic: ease_milli = 206835 - 1015*W/S - 84600*V/W with
#: truncating division (all terms non-negative, so Spark div == DuckDB
#: // bit-for-bit — same discipline as the PageRank ladder).
_BASE, _WPS, _SPW = 206835, 1015, 84600

#: (lower bound in milli-points, grade) — standard Flesch bands.
EASE_BANDS = [
    (90000, "very_easy"),
    (70000, "easy"),
    (50000, "medium"),
    (30000, "hard"),
]
EASE_FLOOR = "very_hard"


def _count(text: Column, pat: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("long")


def _tdiv(a: Column, b: Column) -> Column:
    """Exact truncating integer division for NON-NEGATIVE int64 columns
    without leaving codegen: (a - a%%b)/b is exact in double for
    a < 2^53 (all readability terms are), and equals Spark's `div` /
    DuckDB's `//` bit-for-bit on non-negatives."""
    return ((a - a % b) / b).cast("long")


def reading_ease_milli(text: Column) -> Column:
    """Flesch reading ease x1000 as exact int64 (vowel-group syllable
    proxy; W and S floored at 1 so empty/degenerate docs score the
    all-base value instead of dividing by zero). One codegen'd
    projection — zero shuffle."""
    w = F.greatest(_count(text, WORD_RE), F.lit(1))
    s = F.greatest(_count(text, SENT_RE), F.lit(1))
    v = _count(text, VOWEL_RE)
    return (
        F.lit(_BASE).cast("long")
        - _tdiv(F.lit(_WPS).cast("long") * w, s)
        - _tdiv(F.lit(_SPW).cast("long") * v, w)
    )


def ease_grade(ease_milli: Column) -> Column:
    """Flesch band label for an exact milli-point score."""
    out = F.lit(EASE_FLOOR)
    for bound, grade in reversed(EASE_BANDS):
        out = F.when(ease_milli >= bound, F.lit(grade)).otherwise(out)
    return out


def sql_reading_ease_milli(text_expr: str = "text") -> str:
    """DuckDB mirror (`//` truncates toward zero on the same
    non-negative terms)."""
    w = f"GREATEST(CAST(len(regexp_extract_all({text_expr}, '{WORD_RE}')) AS BIGINT), 1)"
    s = f"GREATEST(CAST(len(regexp_extract_all({text_expr}, '{SENT_RE}')) AS BIGINT), 1)"
    v = f"CAST(len(regexp_extract_all({text_expr}, '{VOWEL_RE}')) AS BIGINT)"
    return (
        f"(CAST({_BASE} AS BIGINT) - (CAST({_WPS} AS BIGINT) * {w}) // {s}"
        f" - (CAST({_SPW} AS BIGINT) * {v}) // {w})"
    )


def sql_ease_grade(ease_expr: str) -> str:
    whens = "".join(
        f" WHEN {ease_expr} >= {b} THEN '{g}'" for b, g in EASE_BANDS
    )
    return f"(CASE{whens} ELSE '{EASE_FLOOR}' END)"
