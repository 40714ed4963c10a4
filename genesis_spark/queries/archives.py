"""Registry family: Archive & feed sources (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_sitemap_ingest(spark, sf_dir):
    """Sitemap source round-trip (sources/sitemap.py): per-host sitemap
    XML is synthesized in pure codegen (block per order, string-sorted
    concat per host — deterministic), then parsed back by the regexp
    urlset parser. The oracle states the expected parsed rows DIRECTLY
    from orders (never touching XML), so a value-hash match proves the
    synth->parse round trip: loc/lastmod extraction, optional
    changefreq nullability, priority string->double."""
    from genesis_spark.sources.sitemap import parse_sitemap

    k = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (k % 20).cast("string"))
    block = F.concat(
        F.lit("<url><loc>http://"), host, F.lit(".onion/p"),
        (k % 97).cast("string"), F.lit("</loc>"),
        F.when(k % 3 == 0,
               F.lit("<changefreq>daily</changefreq>")).otherwise(F.lit("")),
        F.lit("<lastmod>2024-0"), ((k % 9) + 1).cast("string"),
        F.lit("-15</lastmod><priority>0."), (k % 10).cast("string"),
        F.lit("</priority></url>"))
    docs = (_t(spark, sf_dir, "orders")
            .select(host.alias("host"), block.alias("b"))
            .groupBy("host")
            .agg(F.concat_ws("", F.array_sort(F.collect_list("b")))
                 .alias("content")))
    parsed = parse_sitemap(docs, "content", keep_cols=("host",))
    # absent changefreq is a real NULL from the parser; sentinel it for
    # the order-insensitive hash compare (same trick as events_rollup)
    return parsed.withColumn("changefreq",
                             F.coalesce("changefreq", F.lit("-")))


ORACLE_SITEMAP_INGEST = """
SELECT 'h' || (o_orderkey % 20) AS host,
       'http://h' || (o_orderkey % 20) || '.onion/p' || (o_orderkey % 97)
         AS loc,
       '2024-0' || (o_orderkey % 9 + 1) || '-15' AS lastmod,
       CASE WHEN o_orderkey % 3 = 0 THEN 'daily' ELSE '-' END AS changefreq,
       CAST('0.' || (o_orderkey % 10) AS DOUBLE) AS priority
FROM orders
"""


# ---------------------------------------------------------------------------
# block 11: WARC archive source, event-sequence Markov transitions
# ---------------------------------------------------------------------------

def q_warc_ingest(spark, sf_dir):
    """WARC archive ingestion end-to-end as a driver row (the crawl
    world's standard at-rest format — Common Crawl / Heritrix / wget
    --warc): mapInPandas serializes a standards-shaped WARC file per doc
    (request + response records, CRLF headers, Content-Length framing),
    ``sources/warc.read_warc`` parses the bytes back and explodes records,
    and the pipeline keeps the response payloads — the exact
    archive-to-documents path a 100 TB Common Crawl job runs (one file =
    one independent mapInPandas unit, zero shuffles until aggregation).
    The oracle restates the response rows closed-form; a value-hash match
    proves the CRLF/Content-Length framing round-trip."""
    import pandas as pd

    from genesis_spark.sources.warc import encode_warc, read_warc
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                uri = f"http://h{i % 50}.onion/p{i}"
                body = f"doc-{i}-body-{i % 7}".encode()
                blobs.append(encode_warc([
                    ("request", uri, "2026-01-01T00:00:00Z", b"GET"),
                    ("response", uri, "2026-01-01T00:00:01Z", body)]))
            yield pd.DataFrame({"file_id": pdf["doc_id"],
                                "warc_blob": blobs})

    files = d.mapInPandas(encode, "file_id long, warc_blob binary")
    recs = read_warc(files, blob_col="warc_blob", file_col="file_id")
    return (recs.filter(F.col("warc_type") == "response")
            .select("file_id", "target_uri", "payload_len",
                    "payload_text"))


ORACLE_WARC_INGEST = """
SELECT doc_id AS file_id,
       'http://h' || (doc_id % 50) || '.onion/p' || doc_id AS target_uri,
       CAST(length('doc-' || doc_id || '-body-' || (doc_id % 7)) AS INT)
         AS payload_len,
       'doc-' || doc_id || '-body-' || (doc_id % 7) AS payload_text
FROM documents
"""


# ---------------------------------------------------------------------------
# round-3 session-4 block: CDX index ingest, char entropy, mojibake,
# label-propagation communities, Zipf fit
# ---------------------------------------------------------------------------


def q_cdx_ingest(spark, sf_dir):
    """Common Crawl CDXJ index ingest -> one capture per content digest
    (sources/cdx.py): parse the ``<SURT> <ts14> <JSON>`` line in pure
    codegen (substring_index + from_json), gate on status 200 +
    text/html, then a single window on ``digest`` picks the latest
    capture and counts re-crawls.  The digest is the shuffle key — a
    32-hex uniform key, so at 100 TB the one exchange is balanced and
    the JSON parse never leaves the scan stage."""
    from genesis_spark.sources import cdx

    lines = cdx.synth_cdxj_lines(_t(spark, sf_dir, "orders"))
    cap = cdx.parse_cdxj(lines)
    ok = cap.filter((F.col("status") == "200")
                    & (F.col("mime") == "text/html"))
    return (cdx.latest_per_digest(ok)
            .select("digest", "url", "surt", "ts_num", "length_int",
                    "n_captures"))


ORACLE_CDX_INGEST = """
WITH lines AS (
  SELECT 'com,example,host' || (o_orderkey % 40) || ')/page/' || o_orderkey
      || ' '
      || CAST(20250100000000 + (1 + o_orderkey % 28) * 1000000
              + (o_orderkey % 24) * 10000 + (o_orderkey % 60) * 100
              + (o_orderkey * 7) % 60 AS VARCHAR)
      || ' {"url": "https://host' || (o_orderkey % 40)
      || '.example.com/page/' || o_orderkey
      || '", "mime": "'
      || CASE WHEN o_orderkey % 5 = 0 THEN 'application/pdf'
              ELSE 'text/html' END
      || '", "status": "'
      || CASE WHEN o_orderkey % 7 = 0 THEN '404' ELSE '200' END
      || '", "digest": "'
      || upper(md5('content-' || (o_orderkey % 1200)))
      || '", "length": "' || (500 + o_orderkey % 4000) || '"}' AS line
  FROM orders
),
parsed AS (
  SELECT split_part(line, ' ', 1) AS surt,
         CAST(split_part(line, ' ', 2) AS BIGINT) AS ts_num,
         substr(line, len(split_part(line, ' ', 1))
                      + len(split_part(line, ' ', 2)) + 3) AS payload
  FROM lines
),
cap AS (
  SELECT surt, ts_num,
         json_extract_string(payload, '$.url') AS url,
         json_extract_string(payload, '$.mime') AS mime,
         json_extract_string(payload, '$.status') AS status,
         json_extract_string(payload, '$.digest') AS digest,
         CAST(json_extract_string(payload, '$.length') AS INT) AS length_int
  FROM parsed
),
ok AS (SELECT * FROM cap WHERE status = '200' AND mime = 'text/html'),
picked AS (
  SELECT *,
         row_number() OVER (PARTITION BY digest
                            ORDER BY ts_num DESC, url DESC) AS rn,
         count(*) OVER (PARTITION BY digest) AS n_captures
  FROM ok
)
SELECT digest, url, surt, ts_num, length_int,
       CAST(n_captures AS BIGINT) AS n_captures
FROM picked WHERE rn = 1
"""


def q_warc_revisit(spark, sf_dir):
    """WARC revisit-record deduplication — the archive-side half of
    recrawl economics (WARC/1.1 §6.7: a recapture whose payload digest
    matches an earlier capture is stored as a bodyless `revisit` record
    pointing at the original; Common Crawl and Heritrix both do this):
    two crawl rounds capture every URI, round-2 bodies change only for
    doc_id % 3 == 0, and each capture is classified `response` (first
    capture of its digest) or `revisit` (same digest seen in an earlier
    round, carrying revisit_of = the original round).

    Plan/scale: digests are md5 over the payload so the dedup window
    keys on (uri, digest) — 48 bytes/row, the wide payload never
    shuffles; one bounded window (<= #rounds rows per key) classifies
    every capture."""
    i = F.col("doc_id")
    base = _t(spark, sf_dir, "documents").select(
        i.cast("long").alias("doc_id"),
        F.concat(F.lit("http://h"), (i % 50).cast("string"),
                 F.lit(".onion/p"), i.cast("string")).alias("uri"))
    r1 = base.select(
        "uri", F.lit(1).alias("crawl_round"),
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string"),
                 F.lit("-body-"), (i % 7).cast("string")).alias("body"))
    v2 = F.when(i % 3 == 0, i % 7 + 1).otherwise(i % 7)
    r2 = base.select(
        "uri", F.lit(2).alias("crawl_round"),
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string"),
                 F.lit("-body-"), v2.cast("string")).alias("body"))
    caps = (r1.unionByName(r2)
            .select("uri", "crawl_round", F.md5("body").alias("digest")))
    w = Window.partitionBy("uri", "digest").orderBy("crawl_round")
    return (caps
            .withColumn("rn", F.row_number().over(w))
            .withColumn("first_round", F.min("crawl_round").over(
                Window.partitionBy("uri", "digest")))
            .select("uri",
                    F.col("crawl_round").cast("int").alias("crawl_round"),
                    "digest",
                    F.when(F.col("rn") == 1, F.lit("response"))
                    .otherwise(F.lit("revisit")).alias("rec_type"),
                    F.when(F.col("rn") == 1, F.lit(-1))
                    .otherwise(F.col("first_round")).cast("int")
                    .alias("revisit_of")))


ORACLE_WARC_REVISIT = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'http://h' || (doc_id % 50) || '.onion/p' || doc_id AS uri
  FROM documents),
caps AS (
  SELECT uri, 1 AS crawl_round,
         md5('doc-' || doc_id || '-body-' || (doc_id % 7)) AS digest
  FROM base
  UNION ALL
  SELECT uri, 2,
         md5('doc-' || doc_id || '-body-' ||
             (CASE WHEN doc_id % 3 = 0 THEN doc_id % 7 + 1
                   ELSE doc_id % 7 END))
  FROM base),
marked AS (
  SELECT uri, crawl_round, digest,
         row_number() OVER (PARTITION BY uri, digest
                            ORDER BY crawl_round) AS rn,
         min(crawl_round) OVER (PARTITION BY uri, digest) AS first_round
  FROM caps)
SELECT uri, CAST(crawl_round AS INT) AS crawl_round, digest,
       CASE WHEN rn = 1 THEN 'response' ELSE 'revisit' END AS rec_type,
       CAST(CASE WHEN rn = 1 THEN -1 ELSE first_round END AS INT)
         AS revisit_of
FROM marked
"""


def q_jsonl_ingest(spark, sf_dir):
    """JSONL source ingestion with corrupt-record accounting — the other
    at-rest format a crawl/data pipeline reads beside WARC/CDX/parquet
    (exports, API dumps, log shipping are all JSON-lines, and a 100 TB
    read ALWAYS contains torn lines): synthesize one JSON line per doc
    (every 17th truncated mid-object — a torn write), parse with the
    engine's JSON reader (from_json: malformed -> NULL, the PERMISSIVE
    contract), and report per-lang line/good/corrupt counts plus the
    field sum recovered from good lines. The oracle re-parses the same
    lines with DuckDB's JSON engine — a value-hash match proves both
    engines agree on what is and isn't recoverable.

    Plan/scale: synthesis and parse are per-row codegen + one JSON parse
    per line (JVM Jackson, no Python); one partial agg. Corrupt rows
    cost a failed parse, never a task."""
    i = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    line_full = F.concat(
        F.lit('{"id":'), i.cast("string"),
        F.lit(',"lang":"'), F.col("lang"),
        F.lit('","n":'), F.col("n_chars").cast("string"), F.lit("}"))
    line = F.when(i % 17 == 0,
                  F.expr("substring(line_full, 1, length(line_full) - 5)")
                  ).otherwise(F.col("line_full"))
    lines = (d.withColumn("line_full", line_full)
             .select("lang", line.alias("line")))
    parsed = lines.withColumn(
        "j", F.from_json("line", "id BIGINT, lang STRING, n BIGINT"))
    return (parsed.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("j.id").isNotNull().cast("long")).cast("long")
        .alias("n_good"),
        F.sum(F.col("j.id").isNull().cast("long")).cast("long")
        .alias("n_corrupt"),
        F.sum(F.coalesce(F.col("j.n"), F.lit(0))).cast("long")
        .alias("sum_n_good")))


ORACLE_JSONL_INGEST = """
WITH src AS (
  SELECT lang,
         '{"id":' || doc_id || ',"lang":"' || lang || '","n":'
           || n_chars || '}' AS line_full,
         doc_id % 17 = 0 AS torn
  FROM documents WHERE text IS NOT NULL),
lines AS (
  SELECT lang,
         CASE WHEN torn
              THEN substring(line_full, 1, length(line_full) - 5)
              ELSE line_full END AS line
  FROM src),
parsed AS (
  SELECT lang,
         CASE WHEN json_valid(line)
              THEN CAST(json_extract(line, '$.id') AS BIGINT) END AS id,
         CASE WHEN json_valid(line)
              THEN CAST(json_extract(line, '$.n') AS BIGINT) END AS n
  FROM lines)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_good,
       CAST(sum(CASE WHEN id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_corrupt,
       CAST(sum(coalesce(n, 0)) AS BIGINT) AS sum_n_good
FROM parsed GROUP BY lang
"""


def q_sitemap_staleness(spark, sf_dir):
    """Sitemap-driven recrawl prioritization — what a crawler does with
    sitemap <lastmod> beyond seed discovery (sitemap_ingest): join the
    sitemap's lastmod against the crawl ledger's last-fetch date and
    bucket every URL as uncrawled / stale (lastmod after the last fetch)
    / fresh, with exact staleness-day totals per host — the per-host
    work-queue the recrawl scheduler drains first.

    Deterministic synthesis: lastmod = o_orderdate; the crawl ledger
    covers o_orderkey % 5 != 0 with last_crawled = lastmod + (key % 120
    - 60) days, so both stale and fresh populations exist by
    construction.

    Plan/scale: one equi-join on url_id (ledger bucketable next to the
    frontier) + one partial agg; date math is integer days."""
    k = F.col("o_orderkey")
    sm = _t(spark, sf_dir, "orders").select(
        k.alias("url_id"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 40).cast("string"))
        .alias("host_key"),
        F.col("o_orderdate").cast("date").alias("lastmod"))
    ledger = (_t(spark, sf_dir, "orders")
              .filter(k % 5 != 0)
              .select(k.alias("url_id"),
                      F.expr("date_add(CAST(o_orderdate AS DATE), "
                             "CAST(o_orderkey % 120 - 60 AS INT))")
                      .alias("last_crawled")))
    j = sm.join(ledger, "url_id", "left")
    klass = (F.when(F.col("last_crawled").isNull(), F.lit("uncrawled"))
             .when(F.col("lastmod") > F.col("last_crawled"),
                   F.lit("stale"))
             .otherwise(F.lit("fresh")))
    tagged = j.select(
        "host_key", klass.alias("klass"),
        F.when(F.col("last_crawled").isNotNull()
               & (F.col("lastmod") > F.col("last_crawled")),
               F.datediff("lastmod", "last_crawled"))
        .otherwise(F.lit(0)).cast("long").alias("stale_days"))
    return tagged.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_sitemap_urls"),
        F.sum((F.col("klass") == "uncrawled").cast("long")).cast("long")
        .alias("n_uncrawled"),
        F.sum((F.col("klass") == "stale").cast("long")).cast("long")
        .alias("n_stale"),
        F.sum((F.col("klass") == "fresh").cast("long")).cast("long")
        .alias("n_fresh"),
        F.sum("stale_days").cast("long").alias("sum_stale_days"),
        F.max("stale_days").cast("long").alias("max_stale_days"))


ORACLE_SITEMAP_STALENESS = """
WITH sm AS (
  SELECT o_orderkey AS url_id,
         'h' || (o_custkey % 40) AS host_key,
         CAST(o_orderdate AS DATE) AS lastmod
  FROM orders),
ledger AS (
  SELECT o_orderkey AS url_id,
         CAST(o_orderdate AS DATE)
           + CAST(o_orderkey % 120 - 60 AS INT) AS last_crawled
  FROM orders WHERE o_orderkey % 5 <> 0),
tagged AS (
  SELECT s.host_key,
         CASE WHEN l.last_crawled IS NULL THEN 'uncrawled'
              WHEN s.lastmod > l.last_crawled THEN 'stale'
              ELSE 'fresh' END AS klass,
         CASE WHEN l.last_crawled IS NOT NULL
                   AND s.lastmod > l.last_crawled
              THEN date_diff('day', l.last_crawled, s.lastmod)
              ELSE 0 END AS stale_days
  FROM sm s LEFT JOIN ledger l ON l.url_id = s.url_id)
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_sitemap_urls,
       CAST(sum(CASE WHEN klass = 'uncrawled' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_uncrawled,
       CAST(sum(CASE WHEN klass = 'stale' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stale,
       CAST(sum(CASE WHEN klass = 'fresh' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fresh,
       CAST(sum(stale_days) AS BIGINT) AS sum_stale_days,
       CAST(max(stale_days) AS BIGINT) AS max_stale_days
FROM tagged GROUP BY host_key
"""


def q_warc_cdx_audit(spark, sf_dir):
    """WARC ↔ CDX cross-archive consistency audit — the integrity sweep
    an archive operator runs between the record store and its index
    (Common Crawl publishes both; an unindexed record is unreachable,
    a dangling index line 404s, a wrong offset corrupts range reads):
    classify every URI as indexed_ok / missing_cdx (record without an
    index line — every 13th) / dangling_cdx (index line without a
    record — synthetic deletions) / offset_mismatch (both sides exist
    but disagree on the byte offset — every 23rd).

    Plan/scale: one full outer equi-join on uri + one 4-row agg; both
    sides derive per-row."""
    i = F.col("doc_id")
    base = _t(spark, sf_dir, "documents").select(
        i.cast("long").alias("doc_id"),
        F.concat(F.lit("http://h"), (i % 50).cast("string"),
                 F.lit(".onion/p"), i.cast("string")).alias("uri"))
    warc = base.select(
        "uri", (F.col("doc_id") * 1000).alias("w_offset"))
    cdx_main = (base.filter(i % 13 != 0)
                .select("uri",
                        (F.col("doc_id") * 1000
                         + F.when(i % 23 == 0, 8).otherwise(0))
                        .alias("c_offset")))
    cdx_dangling = (base.filter(i % 17 == 0)
                    .select(F.concat(F.lit("http://h"),
                                     (i % 50).cast("string"),
                                     F.lit(".onion/deleted"),
                                     i.cast("string")).alias("uri"),
                            (F.col("doc_id") * 1000 + 500)
                            .alias("c_offset")))
    cdx = cdx_main.unionByName(cdx_dangling)
    j = warc.join(cdx, "uri", "full_outer")
    klass = (F.when(F.col("c_offset").isNull(), F.lit("missing_cdx"))
             .when(F.col("w_offset").isNull(), F.lit("dangling_cdx"))
             .when(F.col("w_offset") != F.col("c_offset"),
                   F.lit("offset_mismatch"))
             .otherwise(F.lit("indexed_ok")))
    return (j.select(klass.alias("audit_class"))
            .groupBy("audit_class")
            .agg(F.count("*").cast("long").alias("n")))


ORACLE_WARC_CDX_AUDIT = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         'http://h' || (doc_id % 50) || '.onion/p' || doc_id AS uri
  FROM documents),
warc AS (SELECT uri, doc_id * 1000 AS w_offset FROM base),
cdx AS (
  SELECT uri, doc_id * 1000
           + CASE WHEN doc_id % 23 = 0 THEN 8 ELSE 0 END AS c_offset
  FROM base WHERE doc_id % 13 <> 0
  UNION ALL
  SELECT 'http://h' || (doc_id % 50) || '.onion/deleted' || doc_id,
         doc_id * 1000 + 500
  FROM base WHERE doc_id % 17 = 0),
j AS (
  SELECT CASE WHEN c.c_offset IS NULL THEN 'missing_cdx'
              WHEN w.w_offset IS NULL THEN 'dangling_cdx'
              WHEN w.w_offset <> c.c_offset THEN 'offset_mismatch'
              ELSE 'indexed_ok' END AS audit_class
  FROM warc w FULL OUTER JOIN cdx c ON c.uri = w.uri)
SELECT audit_class, CAST(count(*) AS BIGINT) AS n
FROM j GROUP BY audit_class
"""


def q_feed_ingest(spark, sf_dir):
    """RSS/Atom feed source round-trip (sources/feeds.py): per-host
    feed XML is synthesized in pure codegen (RSS 2.0 for even hosts,
    Atom for odd — block per order, string-sorted concat per host),
    parsed back by the one-pass dual-format regexp parser, then
    aggregated to frontier candidates (dedupe by URL, earliest
    declared publication wins). The oracle states the expected
    candidate rows DIRECTLY from orders (never touching XML), so a
    value-hash match proves the synth -> parse -> aggregate chain:
    per-block format dispatch, <link>text vs <link href=> attribute
    extraction, pubDate vs updated, and the min-published dedupe.

    Plan/scale: one regexp explode per feed file (a file is an
    independent unit — zero shuffles until the URL dedupe census);
    the dedupe groupBy carries (url, date-string) only."""
    from genesis_spark.sources.feeds import feed_candidates, parse_feed

    k = F.col("o_orderkey")
    host_id = k % 15
    is_rss = host_id % 2 == 0
    url = F.concat(F.lit("http://h"), host_id.cast("string"),
                   F.lit(".onion/f"), (k % 89).cast("string"))
    date = F.concat(F.lit("2024-0"), ((k % 9) + 1).cast("string"),
                    F.lit("-"), F.lpad(((k % 28) + 1).cast("string"),
                                       2, "0"))
    block = F.when(is_rss, F.concat(
        F.lit("<item><title>t"), k.cast("string"),
        F.lit("</title><link>"), url, F.lit("</link><pubDate>"), date,
        F.lit("</pubDate></item>"))) \
        .otherwise(F.concat(
            F.lit("<entry><title>t"), k.cast("string"),
            F.lit('</title><link href="'), url,
            F.lit('"/><updated>'), date,
            F.lit("T00:00:00Z</updated></entry>")))
    wrap_l = F.when(is_rss, F.lit("<rss><channel>")) \
              .otherwise(F.lit("<feed>"))
    wrap_r = F.when(is_rss, F.lit("</channel></rss>")) \
              .otherwise(F.lit("</feed>"))
    feeds = (_t(spark, sf_dir, "orders")
             .select(F.concat(F.lit("h"), host_id.cast("string"))
                     .alias("host"),
                     block.alias("b"), wrap_l.alias("wl"),
                     wrap_r.alias("wr"))
             .groupBy("host")
             .agg(F.concat(F.min("wl"),
                           F.concat_ws("", F.array_sort(
                               F.collect_list("b"))),
                           F.min("wr")).alias("content")))
    return feed_candidates(parse_feed(feeds, "content"))


ORACLE_FEED_INGEST = """
WITH r AS (
  SELECT 'http://h' || (o_orderkey % 15) || '.onion/f'
           || (o_orderkey % 89) AS url,
         '2024-0' || (o_orderkey % 9 + 1) || '-'
           || lpad(CAST(o_orderkey % 28 + 1 AS VARCHAR), 2, '0')
           || CASE WHEN (o_orderkey % 15) % 2 = 0
                   THEN '' ELSE 'T00:00:00Z' END AS published,
         CASE WHEN (o_orderkey % 15) % 2 = 0 THEN 'rss' ELSE 'atom' END
           AS fmt
  FROM orders)
SELECT url, min(published) AS published, min(fmt) AS fmt,
       CAST(count(*) AS BIGINT) AS n_sightings
FROM r GROUP BY url
"""


def q_feed_guid_identity(spark, sf_dir):
    """FEED item-identity audit (RSS guid vs link) — feed dedup
    must pick a key, and real feeds break both choices: CMSes
    regenerate links (tracking params, host migrations) under a
    stable guid, and sloppy feeds omit guid entirely; keying on
    the wrong one re-ingests every item on every poll. Per
    identity group: row mass, distinct links, the unstable-link
    flag, and the dedup key the ingester should use.

    Fixture: every 11th item's link varies per poll under one
    guid; every 13th item has no guid (falls back to link
    identity).

    Plan/scale: one groupBy on the chosen identity — the feed
    ingest shuffle itself."""
    k = F.col("o_orderkey")
    item = (k % 300).cast("long")
    guid_missing = (item % 13 == 0)
    guid = F.when(guid_missing, F.lit("")).otherwise(
        F.concat(F.lit("tag:site,2024:/"), item.cast("string")))
    link = (F.when((item % 11 == 0) & ~guid_missing,
                   F.concat(F.lit("http://site/p"), item.cast("string"),
                            F.lit("?v="),
                            ((k / F.lit(300)).cast("long") % 4)
                            .cast("string")))
            .otherwise(F.concat(F.lit("http://site/p"),
                                item.cast("string"))))
    d = (_t(spark, sf_dir, "orders")
         .select(guid.alias("guid"), link.alias("link")))
    ident = F.when(F.col("guid") != "", F.col("guid")) \
        .otherwise(F.col("link"))
    cens = (d.withColumn("identity", ident)
            .groupBy("identity")
            .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
                 F.countDistinct("link").cast("long").alias("n_links"),
                 F.max((F.col("guid") == "").cast("int")).cast("int")
                 .alias("guid_missing")))
    return (cens.withColumn("link_unstable",
                            (F.col("n_links") >= 2).cast("int"))
            .withColumn("dedup_key",
                        F.when(F.col("guid_missing") == 1,
                               F.lit("link"))
                        .otherwise(F.lit("guid"))))


ORACLE_FEED_GUID_IDENTITY = """
WITH d AS (
  SELECT CASE WHEN (o_orderkey % 300) % 13 = 0 THEN ''
              ELSE 'tag:site,2024:/'
                   || CAST(o_orderkey % 300 AS VARCHAR) END AS guid,
         CASE WHEN (o_orderkey % 300) % 11 = 0
                   AND (o_orderkey % 300) % 13 <> 0
              THEN 'http://site/p' || CAST(o_orderkey % 300 AS VARCHAR)
                   || '?v=' || CAST((o_orderkey // 300) % 4 AS VARCHAR)
              ELSE 'http://site/p' || CAST(o_orderkey % 300 AS VARCHAR)
         END AS link
  FROM orders),
cens AS (
  SELECT CASE WHEN guid <> '' THEN guid ELSE link END AS identity,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT link) AS BIGINT) AS n_links,
         CAST(max(CASE WHEN guid = '' THEN 1 ELSE 0 END) AS INT)
           AS guid_missing
  FROM d GROUP BY 1)
SELECT identity, n_rows, n_links, guid_missing,
       CAST(CASE WHEN n_links >= 2 THEN 1 ELSE 0 END AS INT)
         AS link_unstable,
       CASE WHEN guid_missing = 1 THEN 'link' ELSE 'guid' END
         AS dedup_key
FROM cens
"""


def q_warc_wet_derive(spark, sf_dir):
    """WET/WAT derivative extraction from WARC — the Common Crawl
    companion formats every large-scale text pipeline actually
    consumes (WET = extracted plain text, WAT = per-record metadata
    incl. outlinks): HTML response bodies are framed into real WARC
    bytes (sources/warc.encode_warc), parsed back through the real
    read_warc chain, and each response derives its WET text
    (tag-strip + whitespace collapse, pure codegen) and WAT link
    census (href extraction) in one pass. The oracle restates the
    derivation closed-form from the fixture; the hash proves
    framing -> parse -> derive end to end.

    Plan/scale: the derivation is codegen over read_warc's Arrow
    output — zero extra Python, zero shuffles; exactly the CC
    WARC->WET/WAT job shape (one archive = one independent unit)."""
    import pandas as pd

    from genesis_spark.sources.warc import encode_warc, read_warc
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                uri = f"http://h{i % 50}.onion/p{i}"
                body = (f'<html><a href="u{i}a">x</a>text {i} here'
                        + (f' <a href="u{i}b">y</a>' if i % 3 else "")
                        + "</html>").encode()
                blobs.append(encode_warc([
                    ("response", uri, "2026-01-01T00:00:01Z", body)]))
            yield pd.DataFrame({"file_id": pdf["doc_id"],
                                "warc_blob": blobs})

    files = d.mapInPandas(encode, "file_id long, warc_blob binary")
    recs = read_warc(files, blob_col="warc_blob", file_col="file_id")
    wet = F.trim(F.regexp_replace(
        F.regexp_replace("payload_text", "<[^>]*>", " "), "\\s+", " "))
    links = F.expr(
        "regexp_extract_all(payload_text, 'href=\"([^\"]*)\"', 1)")
    return (recs.filter(F.col("warc_type") == "response")
            .select("file_id", "target_uri",
                    wet.alias("wet_text"),
                    F.length(wet).cast("int").alias("wet_len"),
                    F.size(links).cast("int").alias("wat_n_links"),
                    F.array_join(links, ",").alias("wat_links"),
                    "payload_len"))


ORACLE_WARC_WET_DERIVE = """
WITH d AS (
  SELECT doc_id,
         'http://h' || (doc_id % 50) || '.onion/p' || doc_id AS uri,
         '<html><a href="u' || doc_id || 'a">x</a>text ' || doc_id ||
         ' here' ||
         CASE WHEN doc_id % 3 <> 0
              THEN ' <a href="u' || doc_id || 'b">y</a>' ELSE '' END ||
         '</html>' AS body
  FROM documents)
SELECT doc_id AS file_id, uri AS target_uri,
       trim(regexp_replace(regexp_replace(body, '<[^>]*>', ' ', 'g'),
                           '\\s+', ' ', 'g')) AS wet_text,
       CAST(length(trim(regexp_replace(
             regexp_replace(body, '<[^>]*>', ' ', 'g'),
             '\\s+', ' ', 'g'))) AS INT) AS wet_len,
       CAST(len(regexp_extract_all(body, 'href="([^"]*)"', 1)) AS INT)
         AS wat_n_links,
       list_aggr(regexp_extract_all(body, 'href="([^"]*)"', 1),
                 'string_agg', ',') AS wat_links,
       CAST(length(body) AS INT) AS payload_len
FROM d
"""


def q_warc_member_index(spark, sf_dir):
    """WARC.gz MEMBER INDEX — the byte-offset table that makes a
    100 TB Common Crawl archive randomly addressable (each record is
    its own gzip member; CDX serves (file, offset, length) and a
    reader issues an HTTP Range for exactly that member): per
    archive file (records grouped 20 per file by doc_id), member
    lengths are a deterministic closed form of the record
    (240 + 16*(doc_id % 11) bytes), offsets are the EXCLUSIVE prefix
    sum within the file (one bounded window), and each record emits
    its ready-to-send ``bytes=start-end`` Range header plus the
    file's total size for tail validation.

    Plan/scale: one window per file partition (20 rows each), pure
    integer arithmetic — the index is metadata-sized."""
    did = F.col("doc_id")
    recs = (_t(spark, sf_dir, "documents").select("doc_id")
            .select("doc_id",
                    (did / 20).cast("long").alias("file_id"),
                    (240 + 16 * (did % 11)).cast("long").alias("mlen")))
    w = (Window.partitionBy("file_id").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    wall = Window.partitionBy("file_id")
    return (recs
            .withColumn("m_offset",
                        F.coalesce(F.sum("mlen").over(w), F.lit(0)))
            .withColumn("file_bytes", F.sum("mlen").over(wall))
            .select("file_id", "doc_id", "m_offset", "mlen", "file_bytes",
                    F.concat(F.lit("bytes="),
                             F.col("m_offset").cast("string"), F.lit("-"),
                             (F.col("m_offset") + F.col("mlen") - 1)
                             .cast("string")).alias("range_header")))


ORACLE_WARC_MEMBER_INDEX = """
WITH recs AS (
  SELECT doc_id, doc_id // 20 AS file_id,
         CAST(240 + 16 * (doc_id % 11) AS BIGINT) AS mlen
  FROM documents),
idx AS (
  SELECT file_id, doc_id, mlen,
         COALESCE(SUM(mlen) OVER (PARTITION BY file_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS m_offset,
         SUM(mlen) OVER (PARTITION BY file_id) AS file_bytes
  FROM recs)
SELECT file_id, doc_id, CAST(m_offset AS BIGINT) AS m_offset, mlen,
       CAST(file_bytes AS BIGINT) AS file_bytes,
       'bytes=' || m_offset || '-' || (m_offset + mlen - 1) AS range_header
FROM idx
"""


def q_sitemap_media_ext(spark, sf_dir):
    """Sitemap image/video extension parsing (sitemaps.org
    ``image:``/``video:`` namespaces) — how a crawler discovers media
    WITHOUT fetching pages, and how a multimodal corpus finds its
    image/video candidates cheapest: per host sitemap, page count,
    ``<image:loc>`` count, ``<video:duration>`` count and total
    declared video seconds (regexp_extract_all -> transform ->
    aggregate in the array domain), plus the has_media routing flag.

    Fixture: 3 pages/sitemap, k%4 images and k%3 videos per page,
    durations 30+((k+u*7+v*3)%570) s — all reparsed from the XML
    text, never from the formulas.

    Plan/scale: map-only regexp + array codegen, zero shuffles."""
    k = F.col("c_custkey")
    # NB sequence(0, -1) in Spark descends instead of returning empty —
    # the zero-image / zero-video hosts must short-circuit to ''.
    img = ("if(hk % 4 = 0, '', "
           "array_join(transform(sequence(0, cast(hk % 4 as int) - 1), "
           "i -> concat('<image:image><image:loc>https://h', hk, "
           "'/img', u, '_', i, '.jpg</image:loc></image:image>')), ''))")
    vid = ("if(hk % 3 = 0, '', "
           "array_join(transform(sequence(0, cast(hk % 3 as int) - 1), "
           "v -> concat('<video:video><video:duration>', "
           "30 + ((hk + u * 7 + v * 3) % 570), "
           "'</video:duration></video:video>')), ''))")
    page = (f"concat('<url><loc>https://h', hk, '/p', u, '</loc>', "
            f"{img}, {vid}, '</url>')")
    sitemaps = (_t(spark, sf_dir, "customer")
                .select(k.alias("hk"))
                .select("hk", F.expr(
                    f"concat('<urlset>', array_join(transform("
                    f"sequence(0, 2), u -> {page}), ''), '</urlset>')")
                    .alias(("xml"))))
    durs = ("transform(regexp_extract_all(xml, "
            "'<video:duration>([0-9]+)</video:duration>', 1), "
            "x -> cast(x as bigint))")
    return sitemaps.select(
        F.concat(F.lit("h"), F.col("hk").cast("string")).alias("host"),
        F.expr("size(regexp_extract_all(xml, '<url>', 0))")
        .cast("long").alias("n_pages"),
        F.expr("size(regexp_extract_all(xml, '<image:loc>', 0))")
        .cast("long").alias("n_images"),
        F.expr(f"size({durs})").cast("long").alias("n_videos"),
        F.expr(f"aggregate({durs}, 0L, (acc, x) -> acc + x)")
        .alias("video_sec"),
        F.expr("size(regexp_extract_all(xml, '<image:loc>', 0)) > 0 "
               "or size(regexp_extract_all(xml, '<video:duration>', 0))"
               " > 0").cast("int").alias("has_media"))


ORACLE_SITEMAP_MEDIA_EXT = """
WITH sm AS (
  SELECT c_custkey AS hk,
         '<urlset>' || array_to_string(list_transform(range(3), u ->
           '<url><loc>https://h' || c_custkey || '/p' || u || '</loc>'
           || COALESCE(array_to_string(
                list_transform(range(c_custkey % 4), i ->
                '<image:image><image:loc>https://h' || c_custkey
                || '/img' || u || '_' || i
                || '.jpg</image:loc></image:image>'), ''), '')
           || COALESCE(array_to_string(
                list_transform(range(c_custkey % 3), v ->
                '<video:video><video:duration>'
                || (30 + ((c_custkey + u * 7 + v * 3) % 570))
                || '</video:duration></video:video>'), ''), '')
           || '</url>'), '') || '</urlset>' AS xml
  FROM customer),
parsed AS (
  SELECT hk, xml,
         list_transform(regexp_extract_all(xml,
           '<video:duration>([0-9]+)</video:duration>', 1),
           x -> CAST(x AS BIGINT)) AS durs
  FROM sm)
SELECT 'h' || hk AS host,
       CAST(len(regexp_extract_all(xml, '<url>')) AS BIGINT)
         AS n_pages,
       CAST(len(regexp_extract_all(xml, '<image:loc>')) AS BIGINT)
         AS n_images,
       CAST(len(durs) AS BIGINT) AS n_videos,
       CAST(COALESCE(list_sum(durs), 0) AS BIGINT) AS video_sec,
       CAST(CASE WHEN len(regexp_extract_all(xml, '<image:loc>')) > 0
                   OR len(regexp_extract_all(xml,
                          '<video:duration>')) > 0
            THEN 1 ELSE 0 END AS INT) AS has_media
FROM parsed
"""


def q_warc_digest_verify(spark, sf_dir):
    """WARC payload-digest verification (``WARC-Payload-Digest``
    recomputation) — the bit-rot / truncation gate an archive
    re-reader runs before trusting a record (ISO 28500 stores the
    digest precisely so mirrors can be audited without the origin):
    each record's payload digest is RECOMPUTED (md5 here — portable
    to the oracle) and compared to the declared header digest;
    corrupt records (every 13th declares the digest of a one-byte-
    different payload) must fail closed.

    Plan/scale: map-only hash codegen; at 100 TB this is the
    archive-integrity scrub job — embarrassingly parallel, no
    shuffle."""
    k = F.col("doc_id")
    payload = F.concat(F.lit("payload for doc "), k.cast("string"),
                       F.lit(": "), F.substring("text", 1, 100))
    declared = F.when(k % 13 == 0,
                      F.md5(F.concat(payload, F.lit("x")))) \
        .otherwise(F.md5(payload))
    rows = _t(spark, sf_dir, "documents").select(
        k.alias("doc_id"), payload.alias("payload"),
        declared.alias("declared_digest"))
    recomputed = F.md5("payload")
    return rows.select(
        "doc_id",
        F.substring(recomputed, 1, 8).alias("digest8"),
        (recomputed == F.col("declared_digest")).cast("int")
        .alias("digest_ok"),
        F.when(recomputed == F.col("declared_digest"), "verified")
        .otherwise(F.lit("corrupt")).alias("verdict"))


ORACLE_WARC_DIGEST_VERIFY = """
WITH rows_ AS (
  SELECT doc_id,
         'payload for doc ' || doc_id || ': ' || substr(text, 1, 100)
           AS payload
  FROM documents),
tagged AS (
  SELECT doc_id, payload,
         CASE WHEN doc_id % 13 = 0 THEN md5(payload || 'x')
              ELSE md5(payload) END AS declared_digest
  FROM rows_)
SELECT doc_id,
       substr(md5(payload), 1, 8) AS digest8,
       CAST(md5(payload) = declared_digest AS INT) AS digest_ok,
       CASE WHEN md5(payload) = declared_digest THEN 'verified'
            ELSE 'corrupt' END AS verdict
FROM tagged
"""


def q_warc_warcinfo_join(spark, sf_dir):
    """``warcinfo`` metadata inheritance — every WARC record belongs
    to a file whose leading warcinfo record names the crawler
    software and operator; readers propagate that provenance to
    every record (and files MISSING their warcinfo are an archive
    defect the audit must surface, not silently null through):
    records (grouped 20/file as in the member index) LEFT-join the
    per-file warcinfo dim; orphaned records carry the flag.

    Fixture: file f has warcinfo iff f%9!=0, software crawler/v1-3,
    operator op0-4.

    Plan/scale: the warcinfo dim is |files| = |records|/20 —
    broadcast-join shaped at any archive size."""
    recs = (_t(spark, sf_dir, "documents").select("doc_id")
            .select("doc_id",
                    (F.col("doc_id") / 20).cast("long")
                    .alias("file_id")))
    files = (recs.select("file_id").distinct()
             .filter(F.col("file_id") % 9 != 0)
             .select("file_id",
                     F.concat(F.lit("crawler/v"),
                              (F.col("file_id") % 3 + 1)
                              .cast("string")).alias("software"),
                     F.concat(F.lit("op"),
                              (F.col("file_id") % 5).cast("string"))
                     .alias("operator")))
    return (recs.join(F.broadcast(files), "file_id", "left")
            .select("doc_id", "file_id",
                    F.col("software").isNotNull().cast("int")
                    .alias("has_warcinfo"),
                    F.coalesce("software", F.lit(""))
                    .alias("software"),
                    F.coalesce("operator", F.lit(""))
                    .alias("operator")))


ORACLE_WARC_WARCINFO_JOIN = """
WITH recs AS (
  SELECT doc_id, doc_id // 20 AS file_id FROM documents),
files AS (
  SELECT DISTINCT file_id,
         'crawler/v' || (file_id % 3 + 1) AS software,
         'op' || (file_id % 5) AS operator
  FROM recs WHERE file_id % 9 <> 0)
SELECT r.doc_id, r.file_id,
       CAST(f.software IS NOT NULL AS INT) AS has_warcinfo,
       COALESCE(f.software, '') AS software,
       COALESCE(f.operator, '') AS operator
FROM recs r LEFT JOIN files f ON f.file_id = r.file_id
"""


def q_warc_chunked_artifact(spark, sf_dir):
    """Chunked transfer-encoding artifact detection — a notorious
    real-world archive bug (a recorder that stores the raw socket
    stream without de-chunking leaves ``<hex>\\r\\n`` chunk-size
    lines INSIDE the payload; text extracted from such records
    carries periodic hex garbage that poisons n-gram statistics):
    payloads scan for the chunk-header shape (CRLF + 1-4 hex digits
    + CRLF), artifacts count per record, the reconstructed clean
    length is computed, and flagged records route to the re-extract
    queue.

    Plant: every 13th record has 2 + k%3 chunk headers spliced at
    deterministic offsets.

    Plan/scale: map-only regexp scan + arithmetic."""
    k = F.col("doc_id")
    chunk = F.concat(F.lit("\r\n"),
                     F.lower(F.hex(200 + k % 800)), F.lit("\r\n"))
    n_splice = (2 + k % 3).cast("int")
    body = F.substring("text", 1, 200)
    spliced = F.expr(
        "concat(substr(t, 1, 50), ch, substr(t, 51, 60), ch, "
        "if(ns > 2, concat(substr(t, 111, 40), ch, substr(t, 151)), "
        "substr(t, 111)))")
    rows = (_t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select(k.alias("doc_id"), body.alias("t"),
                    chunk.alias("ch"), n_splice.alias("ns")))
    payload = (F.when(k % 13 == 0, spliced).otherwise(F.col("t")))
    base = rows.select("doc_id", payload.alias("payload"))
    pat = "\r\n[0-9a-f]{1,4}\r\n"
    n_art = F.expr(f"size(regexp_extract_all(payload, '{pat}', 0))")
    arts_len = F.length(
        F.expr(f"array_join(regexp_extract_all(payload, '{pat}', 0),"
               " '')"))
    return (base
            .withColumn("n_artifacts", n_art.cast("int"))
            .withColumn("payload_len",
                        F.length("payload").cast("long"))
            .withColumn("clean_len",
                        (F.length("payload") - arts_len)
                        .cast("long"))
            .withColumn("needs_dechunk",
                        (n_art > 0).cast("int"))
            .drop("payload"))


ORACLE_WARC_CHUNKED_ARTIFACT = """
WITH rows_ AS (
  SELECT doc_id, substr(text, 1, 200) AS t,
         chr(13) || chr(10) || lower(to_hex(200 + doc_id % 800))
           || chr(13) || chr(10) AS ch,
         2 + doc_id % 3 AS ns
  FROM documents WHERE text IS NOT NULL),
built AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0 THEN
           substr(t, 1, 50) || ch || substr(t, 51, 60) || ch ||
           CASE WHEN ns > 2
                THEN substr(t, 111, 40) || ch || substr(t, 151)
                ELSE substr(t, 111) END
         ELSE t END AS payload
  FROM rows_),
scanned AS (
  SELECT doc_id, payload,
         regexp_extract_all(payload,
           chr(13) || chr(10) || '[0-9a-f]{1,4}'
           || chr(13) || chr(10)) AS arts
  FROM built)
SELECT doc_id,
       CAST(len(arts) AS INT) AS n_artifacts,
       CAST(length(payload) AS BIGINT) AS payload_len,
       CAST(length(payload)
            - length(COALESCE(array_to_string(arts, ''), ''))
            AS BIGINT) AS clean_len,
       CAST(len(arts) > 0 AS INT) AS needs_dechunk
FROM scanned
"""


def q_cdx_collapse(spark, sf_dir):
    """Wayback-style CDX COLLAPSE — the temporal complement of
    cdx_ingest's digest dedup (that row answers "which capture per
    content"; this one answers "how does each URL's content evolve"):
    captures of one URL collapse into RUNS of consecutive identical
    digests (the CDX server's collapse=digest), and the per-URL census
    (captures, runs, longest run, storage saving) is what a recrawl
    scheduler reads to find never-changing pages. Synthesis gives each
    of 300 URL keys one capture per 300-key stride with the digest
    rotating every 3rd capture, so runs have real length at every SF.
    Plan/scale: one window on (url_key) ordered by timestamp + a
    two-level aggregation — the shuffle key is the URL, uniform by
    construction; output is O(distinct urls)."""
    k = F.col("o_orderkey")
    u = (k % 300).cast("long")
    i = F.expr("o_orderkey DIV 300")
    caps = _t(spark, sf_dir, "orders").select(
        u.alias("url_key"),
        (F.lit(20250101000000) + i * 100).alias("ts_num"),
        F.md5(F.concat(F.lit("c"), u.cast("string"), F.lit("-"),
                       F.expr("o_orderkey DIV 900").cast("string")))
        .alias("digest"))
    w = Window.partitionBy("url_key").orderBy("ts_num")
    runs = (caps
            .withColumn("is_new",
                        F.when(F.lag("digest").over(w).isNull()
                               | (F.lag("digest").over(w)
                                  != F.col("digest")), 1).otherwise(0))
            .withColumn("run_id", F.sum("is_new").over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow))))
    per_run = runs.groupBy("url_key", "run_id").agg(
        F.count("*").alias("run_len"))
    return (per_run.groupBy("url_key")
            .agg(F.sum("run_len").alias("n_captures"),
                 F.count("*").alias("n_runs"),
                 F.max("run_len").alias("max_run_len"))
            .withColumn("saved_ppm",
                        F.expr("(n_captures - n_runs) * 1000000 "
                               "DIV n_captures"))
            .orderBy("url_key"))


ORACLE_CDX_COLLAPSE = """
WITH caps AS (
  SELECT o_orderkey % 300 AS url_key,
         20250101000000 + (o_orderkey // 300) * 100 AS ts_num,
         md5('c' || (o_orderkey % 300) || '-' || (o_orderkey // 900))
           AS digest
  FROM orders
),
flagged AS (
  SELECT url_key, ts_num, digest,
         CASE WHEN lag(digest) OVER w IS NULL
                   OR lag(digest) OVER w <> digest
              THEN 1 ELSE 0 END AS is_new
  FROM caps
  WINDOW w AS (PARTITION BY url_key ORDER BY ts_num)
),
runs AS (
  SELECT url_key,
         sum(is_new) OVER (PARTITION BY url_key ORDER BY ts_num
                           ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
),
per_run AS (
  SELECT url_key, run_id, count(*) AS run_len
  FROM runs GROUP BY url_key, run_id
)
SELECT url_key,
       CAST(sum(run_len) AS BIGINT) AS n_captures,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS max_run_len,
       (CAST(sum(run_len) AS BIGINT) - count(*)) * 1000000
         // CAST(sum(run_len) AS BIGINT) AS saved_ppm
FROM per_run GROUP BY url_key
ORDER BY url_key
"""


def q_feed_poll_schedule(spark, sf_dir):
    """Adaptive FEED POLLING schedule — the classic RSS/Atom scheduling
    problem (poll too often = wasted fetches, too rarely = missed
    posts): per feed, the observed posting cadence sets the poll
    interval at half the mean inter-post gap (Nyquist for point
    processes), clamped to [5 min, 1 day]. Feeds are events bucketed
    40 ways; all math is integer (seconds), so the verdict is exact.
    At 10^7 feeds this is one partial-agg pass at feed grain — the
    refresh planner the reference's periodic re-feed loop (ST2) would
    consult instead of its fixed cadence."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("f"), (F.col("event_id") % 40).cast("string"))
        .alias("feed"),
        F.unix_timestamp("ts").alias("t"))
    agg = ev.groupBy("feed").agg(
        F.count("*").alias("n_posts"),
        (F.max("t") - F.min("t")).alias("span_s"))
    return (agg
            .withColumn("mean_gap_s",
                        F.expr("span_s DIV greatest(n_posts - 1, 1)"))
            .withColumn("rec_poll_s",
                        F.expr("least(greatest(mean_gap_s DIV 2, 300), "
                               "86400)"))
            .withColumn("polls_per_day",
                        F.expr("86400 DIV rec_poll_s"))
            .orderBy("feed"))


ORACLE_FEED_POLL_SCHEDULE = """
WITH ev AS (
  SELECT 'f' || (event_id % 40) AS feed,
         CAST(floor(epoch(ts)) AS BIGINT) AS t
  FROM events
),
agg AS (
  SELECT feed, count(*) AS n_posts, max(t) - min(t) AS span_s
  FROM ev GROUP BY feed
)
SELECT feed, n_posts, span_s,
       span_s // greatest(n_posts - 1, 1) AS mean_gap_s,
       least(greatest(span_s // greatest(n_posts - 1, 1) // 2, 300),
             86400) AS rec_poll_s,
       86400 // least(greatest(span_s // greatest(n_posts - 1, 1) // 2,
                               300), 86400) AS polls_per_day
FROM agg
ORDER BY feed
"""


def q_warc_date_coverage(spark, sf_dir):
    """Archive TEMPORAL-COVERAGE audit — the collection-management QA
    every web archive runs before claiming it "covers" a host (IIPC
    collection-profile practice): per host, how many distinct capture
    days exist, what span they stretch over, the coverage ratio, and
    the LONGEST capture gap inside the span (the number that decides
    whether a replay of date D will find a near-date capture).
    Synthesized capture days drop every (host+day) % 7 == 0 slot so
    real gaps exist at every SF. One distinct + one lag window per
    host + a final per-host rollup — all integer day arithmetic."""
    k = F.col("o_orderkey")
    caps = (_t(spark, sf_dir, "orders")
            .select(F.concat(F.lit("h"), (k % 25).cast("string"))
                    .alias("host_key"),
                    ((F.expr("o_orderkey DIV 25")) % 60).alias("day"))
            .filter(((k % 25) + F.col("day")) % 7 != 0)
            .distinct())
    w = Window.partitionBy("host_key").orderBy("day")
    gaps = caps.withColumn(
        "gap", F.col("day") - F.lag("day").over(w) - 1)
    return (gaps.groupBy("host_key")
            .agg(F.count("*").alias("n_days"),
                 (F.max("day") - F.min("day") + 1).alias("span_days"),
                 F.coalesce(F.max("gap"), F.lit(0)).alias("max_gap_days"))
            .withColumn("coverage_ppm",
                        F.expr("n_days * 1000000 DIV span_days"))
            .orderBy("host_key"))


ORACLE_WARC_DATE_COVERAGE = """
WITH caps AS (
  SELECT DISTINCT 'h' || (o_orderkey % 25) AS host_key,
         (o_orderkey // 25) % 60 AS day
  FROM orders
  WHERE ((o_orderkey % 25) + (o_orderkey // 25) % 60) % 7 <> 0
),
gaps AS (
  SELECT host_key, day,
         day - lag(day) OVER (PARTITION BY host_key ORDER BY day) - 1
           AS gap
  FROM caps
)
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_days,
       CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days,
       CAST(coalesce(max(gap), 0) AS BIGINT) AS max_gap_days,
       CAST(count(*) AS BIGINT) * 1000000
         // CAST(max(day) - min(day) + 1 AS BIGINT) AS coverage_ppm
FROM gaps GROUP BY host_key
ORDER BY host_key
"""
