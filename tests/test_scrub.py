"""PII scrubbing semantics: per-class redaction + counts, dialect parity
between the Spark expressions (Java regex) and the DuckDB mirror (RE2)
on handcrafted edge-case rows."""

from __future__ import annotations

import duckdb

from fileverification_spark.functions import scrub as SC

ROWS = [
    (0, "plain text with no pii at all"),
    (1, "mail bob.smith+tag@sub.example.co.uk today"),
    (2, "host 192.168.001.1 and 10.0.0.1 up"),
    (3, "call +12025550123 or +123456789 now"),
    (4, "short +1234 is not a phone; 1.2.3 is not an ip"),
    (5, "a@b.io x 8.8.8.8 y +999999999999999 z"),  # all three classes
    (6, "two mails a@b.io c@d.org and twice 1.1.1.1 1.1.1.1"),
    (7, "version 1.2.3.4.5 embeds an ip-shaped run"),
    (8, ""),
]


def _spark_rows(spark):
    df = spark.createDataFrame(ROWS, ["doc_id", "text"])
    return {
        r["doc_id"]: r for r in SC.pii_scrub(df).orderBy("doc_id").collect()
    }


def test_redaction_and_counts(spark):
    got = _spark_rows(spark)
    assert got[0]["clean_text"] == ROWS[0][1]
    assert (got[0]["n_emails"], got[0]["n_ipv4s"], got[0]["n_phones"]) == (0, 0, 0)
    assert got[1]["clean_text"] == "mail <EMAIL> today"
    assert got[1]["n_emails"] == 1
    assert got[2]["clean_text"] == "host <IP> and <IP> up"
    assert got[2]["n_ipv4s"] == 2
    assert got[3]["clean_text"] == "call <PHONE> or <PHONE> now"
    assert got[3]["n_phones"] == 2
    # +1234 has < 9 digits -> not a phone; 1.2.3 is not 4 octets
    assert got[4]["clean_text"] == ROWS[4][1]
    assert (got[4]["n_ipv4s"], got[4]["n_phones"]) == (0, 0)
    assert got[5]["clean_text"] == "<EMAIL> x <IP> y <PHONE> z"
    assert got[6]["n_emails"] == 2 and got[6]["n_ipv4s"] == 2
    assert got[8]["clean_text"] == ""


def test_ip_shaped_run_inside_longer_version_string(spark):
    # 1.2.3.4.5: the regex takes the leftmost 4-octet window; counts and
    # replacement must agree with the SQL mirror (pinned by parity test),
    # and the trailing ".5" survives
    got = _spark_rows(spark)[7]
    assert got["n_ipv4s"] == 1
    assert got["clean_text"] == "version <IP>.5 embeds an ip-shaped run"


def test_sql_mirror_parity(spark):
    got = _spark_rows(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
    oracle = con.execute(
        SC.sql_pii_scrub_query("t") + " ORDER BY doc_id"
    ).fetchall()
    for doc_id, clean, ne, ni, np_ in oracle:
        g = got[doc_id]
        assert g["clean_text"] == clean, doc_id
        assert (g["n_emails"], g["n_ipv4s"], g["n_phones"]) == (ne, ni, np_)
    con.close()
