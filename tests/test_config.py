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
