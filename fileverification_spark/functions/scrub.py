"""PII scrubbing / text redaction for training-data pipelines: redact
emails, IPv4 addresses, and international phone numbers, and count each
redaction class per document.

All pure built-in ``regexp_replace`` / ``regexp_extract_all`` column
expressions — JVM-side, codegen'd, zero shuffle, no Python in the hot
path; at 100 TB this is a narrow per-row projection fully pipelined
with the parquet scan (same hot-path discipline as
``functions/text.py``).

Dialect parity: every pattern below is written in the common subset of
Java regex (Spark) and RE2 (DuckDB oracle) — character classes, bounded
quantifiers, non-capturing groups, and ASCII ``\\b`` word boundaries
only; no lookarounds, no backreferences (RE2 has neither). Counts are
taken on the ORIGINAL text; replacement order (email -> IPv4 -> phone)
is fixed and the replacement tokens contain neither digits nor ``@`` so
later passes can never re-match earlier redactions.

Reference analogue: the reference redacts nothing, but its report sink
normalises every file row through a fixed serialisation
(``FV/IO/CheckSumFile.cs:146`` record shape); the scrubbed-text +
per-class counts here are the corpus-hygiene equivalent of that
normalise-then-account pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\+\d{9,15}"

#: (name, pattern, replacement token) — replacement ORDER is semantics:
#: fixed here, identical in the SQL mirror.
RULES: list[tuple[str, str, str]] = [
    ("emails", EMAIL_RE, "<EMAIL>"),
    ("ipv4s", IPV4_RE, "<IP>"),
    ("phones", PHONE_RE, "<PHONE>"),
]


def scrub_text(text: Column) -> Column:
    """Redacted text: all three rule classes replaced, in RULES order."""
    out = text
    for _, pat, tok in RULES:
        out = F.regexp_replace(out, pat, tok)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-class match counts on the ORIGINAL text (group 0: patterns
    are group-free by construction)."""
    return {
        f"n_{name}": F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat, _ in RULES
    }


def pii_scrub(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, clean_text, n_emails, n_ipv4s, n_phones): one zero-shuffle
    projection — redacted text plus per-class accounting."""
    t = F.col(text_col)
    counts = pii_counts(t)
    return docs.select(
        "doc_id",
        scrub_text(t).alias("clean_text"),
        *[c.alias(n) for n, c in counts.items()],
    )


# ---------------------------------------------------------------------------
# DuckDB SQL mirrors (oracle)
# ---------------------------------------------------------------------------


def sql_scrub_text(text_expr: str) -> str:
    """RE2 needs the 'g' flag for replace-ALL (Spark replaces all by
    default); patterns are shared verbatim."""
    out = text_expr
    for _, pat, tok in RULES:
        out = f"regexp_replace({out}, '{pat}', '{tok}', 'g')"
    return out


def sql_pii_counts(text_expr: str) -> dict[str, str]:
    return {
        f"n_{name}": f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for name, pat, _ in RULES
    }


def sql_pii_scrub_query(docs_rel: str = "documents", text_expr: str = "text") -> str:
    counts = sql_pii_counts(text_expr)
    cols = ",\n       ".join(f"{e} AS {n}" for n, e in counts.items())
    return f"""
SELECT doc_id,
       {sql_scrub_text(text_expr)} AS clean_text,
       {cols}
FROM {docs_rel}"""
