"""fileverification_spark — a PySpark-native spatial-join + tiling engine.

Reimagines the reference (TechieGuy12/FileVerification, C#/.NET — recursive
folder-tree hash manifests, see /root/reference) as hierarchical quadtree/H3
cell manifests over a table of Common-Crawl-style web pages:

- pages(url, warc_ts, html, text, lang) is the "file tree"
  (ref: FileVerification/PathInfo.cs:427-537 CrawlDirectory),
- per-cell Merkle manifests are the "__fv.txt" checksum files
  (ref: FileVerification/CheckSumFile.cs:14-29, HashInfo.cs:271-274),
- verify = left join (OK/FAIL/ADDED) + anti join (MISSING)
  (ref: FileVerification/PathInfo.cs:177-182, CheckSumFile.cs:222-265),
- the resolution ladder replaces folder recursion.

Everything is DataFrame-first: built-in pyspark.sql.functions in the hot
path, pandas/Arrow UDFs only where built-ins cannot express the semantics
(exact point-in-polygon winding test, multimodal decode stubs).
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
