"""Exclusion predicate semantics (F3/F4) and config loading."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from fileverification_spark import config as C


def _urls(spark, urls):
    return spark.createDataFrame([(u,) for u in urls], ["url"])


def test_dos_to_like():
    assert C.dos_to_like("*.txt") == "%.txt"
    assert C.dos_to_like("a?c") == "a_c"
    assert C.dos_to_like("100%_a") == "100\\%\\_a"


def test_name_match_stages(spark):
    df = _urls(
        spark,
        [
            "https://h/x/report.txt",
            "https://h/x/REPORT.TXT",
            "https://h/x/data.bin",
            "https://h/x/summary-report.pdf",
        ],
    )
    ex = C.Exclusions(names=["*.txt"])
    kept = [r["url"] for r in C.apply_exclusions(df, ex).collect()]
    # DOS wildcard is case-insensitive (upper-cased both sides)
    assert kept == ["https://h/x/data.bin", "https://h/x/summary-report.pdf"]

    ex2 = C.Exclusions(names=["report"])
    kept2 = [r["url"] for r in C.apply_exclusions(df, ex2).collect()]
    # substring stage hits 'summary-report.pdf' and 'report.txt';
    # regex (?i) stage also hits REPORT.TXT
    assert kept2 == ["https://h/x/data.bin"]


def test_star_excludes_everything(spark):
    df = _urls(spark, ["https://h/a", "https://h/b"])
    assert C.apply_exclusions(df, C.Exclusions(names=["*"])).count() == 0


def test_path_and_pattern_lists(spark):
    df = _urls(spark, ["https://h/Keep/x", "https://h/skip/x", "https://h/z/x9"])
    ex = C.Exclusions(paths=["SKIP"], patterns=[r"x\d$"])
    kept = [r["url"] for r in C.apply_exclusions(df, ex).collect()]
    assert kept == ["https://h/Keep/x"]


def test_empty_exclusions_keep_all(spark):
    df = _urls(spark, ["a", "b"])
    assert C.apply_exclusions(df, C.Exclusions()).count() == 2


def test_folder_cascade_on_full_path(spark):
    # FolderMatch (MatchBase.cs:183-206) hands the FULL path to the Name
    # cascade: a plain folder name excludes via the contains stage, a DOS
    # pattern must match the whole path
    df = _urls(
        spark,
        [
            "https://h/temp/a.txt",
            "https://h/docs/a.txt",
            "https://h/docs/temporary/b.txt",
        ],
    )
    kept = [
        r["url"]
        for r in C.apply_exclusions(df, C.Exclusions(folders=["temp"])).collect()
    ]
    assert kept == ["https://h/docs/a.txt"]
    kept2 = [
        r["url"]
        for r in C.apply_exclusions(
            df, C.Exclusions(folders=["*/docs/*"])
        ).collect()
    ]
    assert kept2 == ["https://h/temp/a.txt"]


def test_attribute_flags_and_skip_unknown(spark):
    df = spark.createDataFrame(
        [
            ("https://h/a", "long enough text " * 10),
            ("https://h/b", "tiny"),
            ("https://h/.hidden", "long enough text " * 10),
            ("https://h/c", None),
        ],
        ["url", "text"],
    )
    ex = C.Exclusions(attributes=["SparseFile", "Hidden", "System", "Bogus"])
    kept = [r["url"] for r in C.apply_exclusions(df, ex).collect()]
    assert kept == ["https://h/a"]
    # unknown flags alone -> exclude nothing (reference skips bad enum names)
    assert C.apply_exclusions(df, C.Exclusions(attributes=["Bogus"])).count() == 4


def test_sql_predicate_mirrors_spark(spark):
    import duckdb

    rows = [
        ("https://h/temp/a3.txt", "tiny"),
        ("https://h/de/x", "long enough text " * 10),
        ("https://h/en/100", "long enough text " * 10),
        ("https://h/zh/7", "long enough text " * 10),
        ("https://h/en/keep", "long enough text " * 10),
    ]
    ex = C.Exclusions(
        names=["*3"],
        folders=["zh"],
        paths=["/de/"],
        patterns=[r"/en/\d*0$"],
        attributes=["SparseFile", "NoSuchFlag"],
    )
    df = spark.createDataFrame(rows, ["url", "text"])
    kept_spark = sorted(r["url"] for r in C.apply_exclusions(df, ex).collect())
    con = duckdb.connect()
    con.execute("CREATE TABLE t(url VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    kept_sql = sorted(
        r[0]
        for r in con.execute(
            f"SELECT url FROM t WHERE NOT {C.sql_exclusion_predicate(ex)}"
        ).fetchall()
    )
    assert kept_spark == kept_sql == ["https://h/en/keep"]


def test_config_from_json_folders_attributes(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(
        json.dumps(
            {"exclusions": {"folders": ["tmp"], "attributes": ["Hidden"]}}
        )
    )
    cfg = C.JobConfig.from_json(str(p))
    assert cfg.exclusions.folders == ["tmp"]
    assert cfg.exclusions.attributes == ["Hidden"]


def test_config_from_json(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text(
        json.dumps(
            {
                "exclusions": {"names": ["*.tmp"], "paths": ["/cache/"]},
                "algorithm": "md5",
                "allow_remove": True,
            }
        )
    )
    cfg = C.JobConfig.from_json(str(p))
    assert cfg.exclusions.names == ["*.tmp"]
    assert cfg.algorithm == "md5"
    assert cfg.allow_remove is True


def test_config_from_xml(tmp_path):
    """Reference-native XML settings transport (XmlFile.cs:74-104,
    Settings.cs:8-36, FileBase.cs:14-17, Paths.cs:15, Attributes.cs:16)."""
    p = tmp_path / "settings.xml"
    p.write_text("""<?xml version="1.0"?>
<settings>
  <exclusions>
    <files><name>*.tmp</name><name>thumbs.db</name></files>
    <folders><name>node_modules</name></folders>
    <paths><path>/cache/</path></paths>
    <attributes><attribute>Hidden</attribute></attributes>
  </exclusions>
  <allowremove>true</allowremove>
  <notifications>
    <waittime>31000</waittime>
    <notification>
      <url>http://hook/x</url>
      <data><body>{"m": "[message]"}</body></data>
    </notification>
  </notifications>
</settings>
""")
    cfg = C.JobConfig.from_xml(str(p))
    assert cfg.exclusions.names == ["*.tmp", "thumbs.db"]
    assert cfg.exclusions.folders == ["node_modules"]
    assert cfg.exclusions.paths == ["/cache/"]
    assert cfg.exclusions.attributes == ["Hidden"]
    assert cfg.allow_remove is True
    assert cfg.notify_wait_ms == 31000
    assert [n.url for n in cfg.notifications] == ["http://hook/x"]


def test_config_from_xml_minimal_and_bad_root(tmp_path):
    p = tmp_path / "min.xml"
    p.write_text("<settings/>")
    cfg = C.JobConfig.from_xml(str(p))
    assert cfg.exclusions.names == [] and cfg.allow_remove is False
    assert cfg.notifications == []
    bad = tmp_path / "bad.xml"
    bad.write_text("<config/>")
    import pytest
    with pytest.raises(ValueError, match="settings"):
        C.JobConfig.from_xml(str(bad))


def test_xml_and_json_configs_compile_same_predicate(spark):
    """Both transports must feed the identical exclusion compiler —
    same predicate, same rows excluded."""
    import json as _json
    import tempfile, os
    xml = """<settings><exclusions>
      <files><name>*.log</name></files>
      <paths><path>/tmp/</path></paths>
    </exclusions></settings>"""
    js = _json.dumps(
        {"exclusions": {"names": ["*.log"], "paths": ["/tmp/"]}})
    with tempfile.TemporaryDirectory() as d:
        xp, jp = os.path.join(d, "s.xml"), os.path.join(d, "s.json")
        open(xp, "w").write(xml)
        open(jp, "w").write(js)
        cx = C.JobConfig.from_xml(xp)
        cj = C.JobConfig.from_json(jp)
    df = spark.createDataFrame(
        [("http://a/x.log",), ("http://a/tmp/y.txt",), ("http://a/z.txt",),
         ("http://a/sub/tmp/k",)], "url string")
    rx = sorted(r.url for r in
                df.filter(~C.exclusion_predicate(cx.exclusions, F.col("url"))).collect())
    rj = sorted(r.url for r in
                df.filter(~C.exclusion_predicate(cj.exclusions, F.col("url"))).collect())
    assert rx == rj
