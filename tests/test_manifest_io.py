"""Reference-layout text manifest parse/serialize (SURVEY S3/S5)."""

from __future__ import annotations

from fileverification_spark.sources import manifest_io as MIO


def test_read_drops_malformed_and_dedups(spark, tmp_path):
    # NB: Hadoop's hidden-file filter skips paths starting with "_", so the
    # reference's literal "__fv.txt" name can't be read by Spark directly;
    # fixtures use a visible name (see manifest_io docstring).
    p = tmp_path / "fv.txt"
    p.write_text(
        "a.txt|sha256|AAAA\n"
        "broken-line-no-separators\n"          # != 3 fields -> dropped
        "b.txt|md5|BBBB|extra\n"               # 4 fields -> dropped
        "c.txt|bogusalgo|CCCC\n"               # unknown algo -> sha256
        "a.txt|sha256|DDDD\n"                  # dup key -> first wins
        "\n"
    )
    df = MIO.read_text_manifest(spark, str(p)).orderBy("child_key")
    rows = {r["child_key"]: r for r in df.collect()}
    assert set(rows) == {"a.txt", "c.txt"}
    assert rows["c.txt"]["algo"] == "sha256"
    assert rows["a.txt"]["hash"] in ("AAAA", "DDDD")  # nondeterministic winner


def test_roundtrip(spark, tmp_path):
    src = tmp_path / "in.txt"
    src.write_text("x.bin|sha512|FFFF\ny.bin|sha1|EEEE\n")
    df = MIO.read_text_manifest(spark, str(src))
    out = tmp_path / "outdir"
    MIO.write_text_manifest(df, str(out))
    back = MIO.read_text_manifest(spark, str(out)).orderBy("child_key").collect()
    assert [(r["child_key"], r["algo"], r["hash"]) for r in back] == [
        ("x.bin", "sha512", "FFFF"),
        ("y.bin", "sha1", "EEEE"),
    ]


def test_parse_manifest_lines_df(spark):
    lines = spark.createDataFrame(
        [("a.txt|sha256|AAAA",), ("broken|BBBB",), ("c.txt|crc32|CCCC",), ("  ",)],
        ["value"],
    )
    rows = {
        r["child_key"]: r
        for r in MIO.parse_manifest_lines(lines).collect()
    }
    assert set(rows) == {"a.txt", "c.txt"}
    assert rows["c.txt"]["algo"] == "sha256"  # unknown algo fallback
