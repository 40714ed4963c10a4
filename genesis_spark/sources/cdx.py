"""Common Crawl CDX(J) index ingest.

The CDXJ line format — ``<SURT key> <14-digit timestamp> <JSON payload>``
— is the public index format of the Common Crawl / Internet Archive
capture indexes (pywb CDXJ spec).  A 100 TB crawl pipeline reads these
indexes to pick which captures to fetch or re-process, so parsing them
and selecting one capture per content digest is a first-class source
operation (the reference's seed feeders play the same role for its
onion frontier — app/crawler/crawl_model.py's feeder scan).

Spark-first shape: the line splits into exactly three fields where the
first two contain no spaces, so ``substring_index`` + one ``from_json``
keep the whole parse in codegen — no Python, no UDF.  Digest dedup is a
single window over ``digest`` (the natural shuffle key: 32-hex ≈
uniform), which at 100 TB is one exchange of (digest, small payload).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: JSON payload schema of a CDXJ capture record (pywb field names).
CDXJ_PAYLOAD_SCHEMA = ("url string, mime string, status string, "
                       "digest string, length string")


def parse_cdxj(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse raw CDXJ lines into typed capture columns.

    Emits ``surt`` (the SURT-ordered key), ``ts_num`` (the 14-digit
    capture timestamp as BIGINT — numerically sortable), and the JSON
    payload fields ``url / mime / status / digest / length_int``.
    """
    line = F.col(line_col)
    surt = F.substring_index(line, " ", 1)
    ts = F.element_at(F.split(line, " ", 3), 2)
    payload = F.element_at(F.split(line, " ", 3), 3)
    j = F.from_json(payload, CDXJ_PAYLOAD_SCHEMA)
    return df.select(
        surt.alias("surt"),
        ts.cast("long").alias("ts_num"),
        j["url"].alias("url"),
        j["mime"].alias("mime"),
        j["status"].alias("status"),
        j["digest"].alias("digest"),
        j["length"].cast("int").alias("length_int"),
    )


def latest_per_digest(captures: DataFrame) -> DataFrame:
    """One capture per content digest: the fetch-planner's dedup.

    Keeps the latest timestamp (URL descending as the deterministic
    tie-break) and carries ``n_captures`` so downstream jobs know how
    often the content was re-crawled.  One window shuffle on ``digest``.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("digest")
    wo = w.orderBy(F.col("ts_num").desc(), F.col("url").desc())
    return (captures
            .withColumn("rn", F.row_number().over(wo))
            .withColumn("n_captures", F.count(F.lit(1)).over(w))
            .filter(F.col("rn") == 1)
            .drop("rn"))


def synth_cdxj_lines(orders: DataFrame) -> DataFrame:
    """Deterministic CDXJ fixture lines derived from ``orders`` keys.

    Pure codegen synthesis (no external data): hosts cycle mod 40,
    URLs are unique per order key, every 7th capture is a 404, every
    5th a PDF, and content digests collapse mod 1200 so the digest
    dedup has real duplicate groups to resolve.
    """
    k = F.col("o_orderkey")
    host = F.concat(F.lit("host"), (k % 40).cast("string"))
    url = F.concat(F.lit("https://"), host, F.lit(".example.com/page/"),
                   k.cast("string"))
    surt = F.concat(F.lit("com,example,"), host, F.lit(")/page/"),
                    k.cast("string"))
    ts = (F.lit(20250100000000) + (1 + k % 28) * 1000000
          + (k % 24) * 10000 + (k % 60) * 100 + (k * 7) % 60)
    status = F.when(k % 7 == 0, "404").otherwise("200")
    mime = F.when(k % 5 == 0, "application/pdf").otherwise("text/html")
    digest = F.upper(F.md5(F.concat(F.lit("content-"),
                                    (k % 1200).cast("string"))))
    length = (500 + k % 4000).cast("string")
    line = F.concat(
        surt, F.lit(" "), ts.cast("string"),
        F.lit(' {"url": "'), url,
        F.lit('", "mime": "'), mime,
        F.lit('", "status": "'), status,
        F.lit('", "digest": "'), digest,
        F.lit('", "length": "'), length, F.lit('"}'))
    return orders.select(line.alias("line"))
