"""NT DOS wildcard edge chars — ``>`` DOS_STAR, ``<`` DOS_QM, ``"``
DOS_DOT (PatternMatcher.cs:11-13, 81-92, 319-433; SURVEY §2.2 F4).

Three layers of pinning:
- dos_match (pure-Python spec matcher) against hand-derived truths;
- dos_to_regex("java") against dos_match over a generated corpus
  (hypothesis when available, a dense product sweep otherwise);
- dos_to_regex("re2") against the java dialect on every RE2-expressible
  pattern, plus ValueError on the inexpressible ones;
- the Spark Column cascade against the DuckDB SQL mirror end-to-end.
"""

from __future__ import annotations

import re

import duckdb
import pytest
from pyspark.sql import functions as F

from fileverification_spark import config as C

# (pattern, name, expected) — hand-derived from the FsRtl rules
TRUTH = [
    # DOS_DOT: a '.' or zero chars at end of name
    ('FOO"', "FOO", True),
    ('FOO"', "FOO.", True),
    ('FOO"', "FOOX", False),
    ('FOO"TXT', "FOO.TXT", True),
    ('FOO"TXT', "FOOTXT", False),   # mid-name DOS_DOT must eat a dot
    # DOS_QM: one non-dot, or epsilon at dot / end
    ("<<.TXT", "AB.TXT", True),
    ("<<.TXT", "A.TXT", True),
    ("<<.TXT", ".TXT", True),
    ("<<.TXT", "ABC.TXT", False),   # 3 chars > run of 2
    ("<<.TXT", "A.B.TXT", False),   # run can't cross the first dot
    ("<<X", "ABX", True),
    ("<<X", "AX", False),           # short match only allowed at dot/end
    ("<<", "AB", True),
    ("<<", "A", True),
    ("<<", "", False),              # empty name never matches
    ("<<", "A.B", False),           # epsilon at dot, but pattern exhausted
    ("A<", "A", True),              # epsilon at end of name
    ("A<", "A.", False),            # epsilon at dot leaves '.' unconsumed
    # DOS_STAR: zero+ chars, never eats the FINAL dot
    (">.TXT", "A.TXT", True),
    (">.TXT", "A.B.TXT", True),     # eats 'A.B' — the eaten dot has a later one
    (">.TXT", "TXT", False),
    (">X", "AAX", True),
    (">X", "A.X", False),           # would have to eat the final dot
    (">X", "A.B.X", False),         # the dot before X is final — uneatable
    (">", "ABC", True),
    (">", "A.B", False),            # must swallow the final dot to reach end
    ('>"TXT', "A.TXT", True),
    ('>"', "ABC", True),            # DOS_DOT matches end, STAR ate dot-free text
    ('>"', "A.B", False),
    # classic wildcards through the same compiler
    ("*.TXT", "A.B.TXT", True),
    ("?.TXT", "A.TXT", True),
    ("?.TXT", "AB.TXT", False),
]


def test_dos_match_truth_table():
    for pat, name, want in TRUTH:
        assert C.dos_match(pat, name) is want, (pat, name, want)


@pytest.mark.parametrize("pat,name,want", TRUTH)
def test_java_regex_matches_spec(pat, name, want):
    rx = re.compile(C.dos_to_regex(pat, dialect="java"))
    got = bool(rx.fullmatch(name)) if name else False
    assert got is want, (pat, name)


def _corpus():
    """Dense generated sweep: every pattern over a small alphabet x
    every name over a small alphabet."""
    pat_atoms = ["A", ".", "<", ">", '"', "*", "?"]
    names = [""]
    for _ in range(4):
        names = names + [s + c for s in names for c in "AB."]
    pats = []
    for a in pat_atoms:
        for b in pat_atoms:
            pats.append(a + b)
            for c in ["A", ".", "<", ">", '"']:
                pats.append(a + b + c)
    return pats, sorted(set(names))


def test_java_regex_matches_spec_swept():
    pats, names = _corpus()
    bad = []
    for pat in pats:
        rx = re.compile(C.dos_to_regex(pat, dialect="java"))
        for name in names:
            want = C.dos_match(pat, name)
            got = bool(rx.fullmatch(name)) if name else False
            if got is not want:
                bad.append((pat, name, want, got))
    assert not bad, bad[:20]


def test_re2_dialect_agrees_or_raises():
    pats, names = _corpus()
    n_ok = 0
    for pat in pats:
        try:
            r2 = C.dos_to_regex(pat, dialect="re2")
        except ValueError:
            continue
        n_ok += 1
        assert "(?=" not in r2, pat
        rx2 = re.compile(r2)
        rxj = re.compile(C.dos_to_regex(pat, dialect="java"))
        for name in names:
            if name:
                assert bool(rx2.fullmatch(name)) == bool(rxj.fullmatch(name)), (
                    pat, name,
                )
    assert n_ok > 50  # the RE2-safe subset is the common case, not a corner


def test_re2_dialect_runs_in_duckdb():
    con = duckdb.connect()
    for pat, name, want in TRUTH:
        try:
            rx = C.dos_to_regex(pat, dialect="re2")
        except ValueError:
            continue
        if not name:
            continue
        got = con.execute(
            "SELECT regexp_matches(?, ?)", [name, rx]
        ).fetchone()[0]
        assert got is want, (pat, name, rx)


def test_cascade_spark_duckdb_parity_nt_patterns(spark):
    urls = [
        "https://h/a/INDEX.HTML",
        "https://h/a/index.html",
        "https://h/a/data.v2.html",
        "https://h/a/readme",
        "https://h/a/readme.",
        "https://h/a/ab.parq",
        "https://h/a/abcdefghij.parq",
        "https://h/b/x.y",
    ]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    ex = C.Exclusions(names=["<<.PARQ", '>.HTML', 'README"'])
    kept_spark = sorted(
        r["url"] for r in C.apply_exclusions(df, ex).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(u,) for u in urls])
    pred = C.sql_exclusion_predicate(ex, "url")
    kept_sql = sorted(
        r[0] for r in con.execute(
            f"SELECT url FROM t WHERE NOT {pred}"
        ).fetchall()
    )
    assert kept_spark == kept_sql
    # and the values are what the FsRtl rules say
    assert "https://h/a/ab.parq" not in kept_spark        # <<.PARQ
    assert "https://h/a/abcdefghij.parq" in kept_spark    # run of 2 only
    assert "https://h/a/INDEX.HTML" not in kept_spark     # >.HTML
    assert "https://h/a/index.html" not in kept_spark     # upper-cased sides
    assert "https://h/a/readme" not in kept_spark         # README" end rule
    assert "https://h/a/readme." not in kept_spark        # README" dot rule
    assert "https://h/b/x.y" in kept_spark
