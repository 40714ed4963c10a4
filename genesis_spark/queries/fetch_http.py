"""Registry family: Fetch & HTTP (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_fetch_revalidate(spark, sf_dir):
    """HTTP conditional-revalidation planning — the bandwidth half of a
    recrawl scheduler (reference fetches unconditionally per round,
    crawl_man.py's fetch loop; a 10^10-URL frontier cannot): join the
    scheduled fetch wave against the previous crawl snapshot's cache
    validators (ETag per URL) and classify each URL as `304` (validator
    match — skip the body), `200_changed` (stale validator — refetch),
    or `200_new` (no history — first fetch), then roll up per host the
    request counts and the exact bytes the conditional protocol saves.

    Deterministic simulation: every order row is a scheduled URL; the
    previous snapshot holds URLs with o_orderkey % 3 != 0 (two-thirds
    have history); the content "version" is o_orderkey % 7, bumped when
    o_orderkey % 13 == 0 (the page changed since last round); body size
    is o_orderkey % 4000 + 500 bytes. All integers — Spark and DuckDB
    agree exactly.

    Plan/scale: one equi-join on url_id (both sides partition-pruned
    projections of the same scan — AQE plans a shuffle join that scales
    with the wave, not the frontier) + one partial agg; the snapshot
    side at 10^10 URLs lives bucketed-by-url_id next to the frontier so
    the join co-locates (frontier_install_bucketed's layout)."""
    k = F.col("o_orderkey")
    wave = _t(spark, sf_dir, "orders").select(
        k.alias("url_id"),
        F.concat(F.lit("h"), (F.col("o_custkey") % 40).cast("string"))
        .alias("host_key"),
        (k % 7).cast("long").alias("ver_prev"),
        ((k % 7) + F.when(k % 13 == 0, 1).otherwise(0)).cast("long")
        .alias("ver_now"),
        (k % 4000 + 500).cast("long").alias("body_bytes"))
    snap = (wave.filter(F.col("url_id") % 3 != 0)
            .select("url_id", F.col("ver_prev").alias("etag_ver")))
    joined = wave.drop("ver_prev").join(snap, "url_id", "left")
    klass = (F.when(F.col("etag_ver").isNull(), F.lit("200_new"))
             .when(F.col("etag_ver") == F.col("ver_now"), F.lit("304"))
             .otherwise(F.lit("200_changed")))
    tagged = joined.withColumn("klass", klass)
    return (tagged.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum((F.col("klass") == "304").cast("long")).cast("long")
        .alias("n_304"),
        F.sum((F.col("klass") == "200_changed").cast("long")).cast("long")
        .alias("n_changed"),
        F.sum((F.col("klass") == "200_new").cast("long")).cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("klass") == "304", F.col("body_bytes"))
              .otherwise(F.lit(0))).cast("long").alias("bytes_saved"),
        F.sum(F.when(F.col("klass") != "304", F.col("body_bytes"))
              .otherwise(F.lit(0))).cast("long").alias("bytes_fetched")))


ORACLE_FETCH_REVALIDATE = """
WITH wave AS (
  SELECT o_orderkey AS url_id,
         'h' || (o_custkey % 40) AS host_key,
         CAST(o_orderkey % 7 AS BIGINT) AS ver_prev,
         CAST(o_orderkey % 7
              + CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END
              AS BIGINT) AS ver_now,
         CAST(o_orderkey % 4000 + 500 AS BIGINT) AS body_bytes
  FROM orders),
snap AS (SELECT url_id, ver_prev AS etag_ver FROM wave
         WHERE url_id % 3 <> 0),
tagged AS (
  SELECT w.host_key, w.body_bytes,
         CASE WHEN s.etag_ver IS NULL THEN '200_new'
              WHEN s.etag_ver = w.ver_now THEN '304'
              ELSE '200_changed' END AS klass
  FROM wave w LEFT JOIN snap s ON s.url_id = w.url_id)
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(CASE WHEN klass = '304' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_304,
       CAST(sum(CASE WHEN klass = '200_changed' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_changed,
       CAST(sum(CASE WHEN klass = '200_new' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_new,
       CAST(sum(CASE WHEN klass = '304' THEN body_bytes ELSE 0 END)
            AS BIGINT) AS bytes_saved,
       CAST(sum(CASE WHEN klass <> '304' THEN body_bytes ELSE 0 END)
            AS BIGINT) AS bytes_fetched
FROM tagged
GROUP BY host_key
"""


def q_http_content_type(spark, sf_dir):
    """Content-Type header parsing and parser routing — the dispatch
    decision a fetcher makes per response before anything downstream
    runs (the reference routes on HTML-ness inside its parse loop; a
    batch engine classifies the whole wave): parse `mime; charset=...`
    with real-world messiness (case, spacing, quoting variants),
    normalize mime and charset, and route to parse / parse_text / media
    / skip. Header synthesis cycles 5 representative shapes, including
    quoted and upper-cased charset parameters.

    Plan/scale: per-row codegen (split + (?i) regexp_extract) + one
    partial agg — one scan, no Python."""
    i = F.col("doc_id")
    hdr = (F.when(i % 5 == 0, F.lit("text/html; charset=UTF-8"))
           .when(i % 5 == 1, F.lit("text/html;charset=iso-8859-1"))
           .when(i % 5 == 2, F.lit("application/pdf"))
           .when(i % 5 == 3, F.lit("image/png"))
           .otherwise(F.lit('Text/Plain; CHARSET="utf-8"')))
    d = (_t(spark, sf_dir, "documents")
         .select(hdr.alias("content_type")))
    mime = F.lower(F.trim(F.split("content_type", ";").getItem(0)))
    charset = F.lower(F.regexp_extract(
        "content_type", '(?i)charset\\s*=\\s*"?([A-Za-z0-9_-]+)', 1))
    parsed = d.select(
        mime.alias("mime"),
        F.when(charset == "", F.lit("none")).otherwise(charset)
        .alias("charset"))
    route = (F.when(F.col("mime") == "text/html", F.lit("parse"))
             .when(F.col("mime").startswith("text/"), F.lit("parse_text"))
             .when(F.col("mime").startswith("image/") |
                   F.col("mime").startswith("audio/") |
                   F.col("mime").startswith("video/"), F.lit("media"))
             .otherwise(F.lit("skip")))
    return (parsed.withColumn("route", route)
            .groupBy("mime", "charset", "route")
            .agg(F.count("*").cast("long").alias("n")))


ORACLE_HTTP_CONTENT_TYPE = """
WITH d AS (
  SELECT CASE doc_id % 5
           WHEN 0 THEN 'text/html; charset=UTF-8'
           WHEN 1 THEN 'text/html;charset=iso-8859-1'
           WHEN 2 THEN 'application/pdf'
           WHEN 3 THEN 'image/png'
           ELSE 'Text/Plain; CHARSET="utf-8"' END AS content_type
  FROM documents),
parsed AS (
  SELECT lower(trim(string_split(content_type, ';')[1])) AS mime,
         CASE WHEN regexp_extract(content_type,
                '(?i)charset\\s*=\\s*"?([A-Za-z0-9_-]+)', 1) = ''
              THEN 'none'
              ELSE lower(regexp_extract(content_type,
                '(?i)charset\\s*=\\s*"?([A-Za-z0-9_-]+)', 1)) END
           AS charset
  FROM d),
routed AS (
  SELECT mime, charset,
         CASE WHEN mime = 'text/html' THEN 'parse'
              WHEN mime LIKE 'text/%' THEN 'parse_text'
              WHEN mime LIKE 'image/%' OR mime LIKE 'audio/%'
                   OR mime LIKE 'video/%' THEN 'media'
              ELSE 'skip' END AS route
  FROM parsed)
SELECT mime, charset, route, CAST(count(*) AS BIGINT) AS n
FROM routed GROUP BY mime, charset, route
"""


def q_dns_cache_plan(spark, sf_dir):
    """Per-wave DNS resolution planning — before a fetch wave, every
    pending host needs a live A-record: join the wave's hosts against
    the resolver cache and classify MISS (never resolved) / EXPIRED
    (now past resolved_at + ttl) / FRESH, then aggregate per resolver
    shard (hosts hash-sharded across 16 resolver workers) the lookups
    owed this wave and the URLs blocked behind them — the prefetch
    batch a crawler issues while the previous wave drains.

    Deterministic synthesis: 200 hosts from o_custkey; cache covers
    host_id % 3 != 0 with resolved_at staggered by (host_id*7) % 900 s and
    a 600 s TTL against a fixed now-epoch, so all three classes exist
    by construction. Plan/scale: one small agg to hosts, one broadcast
    join against the cache (cache rows ≈ live hosts << URLs), one
    16-row rollup — no URL-grain shuffle."""
    now = 1_700_000_000
    host_id = F.col("o_custkey") % 200
    pend = (_t(spark, sf_dir, "orders")
            .select(host_id.alias("host_id"))
            .groupBy("host_id")
            .agg(F.count("*").cast("long").alias("n_urls")))
    cache = (pend.select("host_id")
             .filter(F.col("host_id") % 3 != 0)
             .select("host_id",
                     (F.lit(now) - 300 - (F.col("host_id") * 7) % 900)
                     .alias("resolved_at"),
                     F.lit(600).alias("ttl_s")))
    j = pend.join(F.broadcast(cache), "host_id", "left")
    klass = (F.when(F.col("resolved_at").isNull(), F.lit("miss"))
             .when(F.lit(now) > F.col("resolved_at") + F.col("ttl_s"),
                   F.lit("expired"))
             .otherwise(F.lit("fresh")))
    tagged = j.select((F.col("host_id") % 16).cast("long")
                      .alias("resolver_shard"),
                      klass.alias("klass"), "n_urls")
    return tagged.groupBy("resolver_shard").agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.sum((F.col("klass") == "miss").cast("long")).cast("long")
        .alias("n_miss"),
        F.sum((F.col("klass") == "expired").cast("long")).cast("long")
        .alias("n_expired"),
        F.sum((F.col("klass") == "fresh").cast("long")).cast("long")
        .alias("n_fresh"),
        F.sum(F.when(F.col("klass") != "fresh", F.col("n_urls"))
              .otherwise(F.lit(0))).cast("long").alias("n_urls_blocked"))


ORACLE_DNS_CACHE_PLAN = """
WITH pend AS (
  SELECT o_custkey % 200 AS host_id, CAST(count(*) AS BIGINT) AS n_urls
  FROM orders GROUP BY host_id),
cache AS (
  SELECT host_id, 1700000000 - 300 - (host_id * 7) % 900 AS resolved_at,
         600 AS ttl_s
  FROM pend WHERE host_id % 3 <> 0),
tagged AS (
  SELECT p.host_id % 16 AS resolver_shard,
         CASE WHEN c.resolved_at IS NULL THEN 'miss'
              WHEN 1700000000 > c.resolved_at + c.ttl_s THEN 'expired'
              ELSE 'fresh' END AS klass,
         p.n_urls
  FROM pend p LEFT JOIN cache c ON c.host_id = p.host_id)
SELECT CAST(resolver_shard AS BIGINT) AS resolver_shard,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(CASE WHEN klass = 'miss' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_miss,
       CAST(sum(CASE WHEN klass = 'expired' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_expired,
       CAST(sum(CASE WHEN klass = 'fresh' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fresh,
       CAST(sum(CASE WHEN klass <> 'fresh' THEN n_urls ELSE 0 END)
            AS BIGINT) AS n_urls_blocked
FROM tagged GROUP BY resolver_shard
"""


def q_fetch_backoff_plan(spark, sf_dir):
    """Exponential-backoff scheduling after fetch failures — the retry
    policy the reference hard-codes as a flat 4-attempt loop
    (crawl_controller retry cap, conf.py:33), upgraded to what a
    polite crawler at scale actually runs: per host, count the
    CONSECUTIVE trailing failures (attempts after the last success)
    and schedule next_allowed_at = last_attempt + min(base·2^k, cap)
    with base 30 s and cap 3600 s; hosts with k ≥ 6 are quarantined.

    Deterministic synthesis: an attempt ledger from lineitem (40 hosts,
    ts staggered by line number, status 200 vs 503 from an integer
    pattern that gives every host a different trailing-failure run).
    Plan/scale: one window max per host partition (last success ts) +
    one partial agg — no self-join, integer math throughout."""
    lk, ln = F.col("l_orderkey"), F.col("l_linenumber")
    att = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("h"), (lk % 40).cast("string")).alias("host_key"),
        (F.lit(1_700_000_000) + lk * 7 + ln).cast("long").alias("ts"),
        F.when((lk + ln) % (lk % 9 + 2) == 0, F.lit(200))
        .otherwise(F.lit(503)).cast("int").alias("status"))
    w = Window.partitionBy("host_key")
    scoped = att.withColumn(
        "last_ok_ts",
        F.max(F.when(F.col("status") == 200, F.col("ts"))).over(w))
    agg = scoped.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_attempts"),
        F.max("ts").alias("last_attempt_ts"),
        F.sum((F.col("status") != 200).cast("long")).cast("long")
        .alias("n_failures"),
        F.sum((F.col("last_ok_ts").isNull()
               | (F.col("ts") > F.col("last_ok_ts"))).cast("long"))
        .cast("long").alias("consec_failures"))
    # F.shiftleft only takes a literal bit count; the SQL form shifts
    # by a column
    backoff = F.expr(
        "least(30 * shiftleft(1, CAST(least(consec_failures, 20) "
        "AS INT)), 3600)").cast("long")
    return agg.select(
        "host_key", "n_attempts", "n_failures", "consec_failures",
        backoff.alias("backoff_s"),
        (F.col("last_attempt_ts") + backoff).cast("long")
        .alias("next_allowed_at"),
        (F.col("consec_failures") >= 6).alias("quarantined"))


ORACLE_FETCH_BACKOFF_PLAN = """
WITH att AS (
  SELECT 'h' || (l_orderkey % 40) AS host_key,
         1700000000 + l_orderkey * 7 + l_linenumber AS ts,
         CASE WHEN (l_orderkey + l_linenumber)
                   % (l_orderkey % 9 + 2) = 0
              THEN 200 ELSE 503 END AS status
  FROM lineitem),
scoped AS (
  SELECT *, max(CASE WHEN status = 200 THEN ts END)
              OVER (PARTITION BY host_key) AS last_ok_ts
  FROM att),
agg AS (
  SELECT host_key,
         CAST(count(*) AS BIGINT) AS n_attempts,
         max(ts) AS last_attempt_ts,
         CAST(sum(CASE WHEN status <> 200 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_failures,
         CAST(sum(CASE WHEN last_ok_ts IS NULL OR ts > last_ok_ts
                       THEN 1 ELSE 0 END) AS BIGINT) AS consec_failures
  FROM scoped GROUP BY host_key)
SELECT host_key, n_attempts, n_failures, consec_failures,
       CAST(least(30 * (1 << CAST(least(consec_failures, 20) AS INT)),
                  3600) AS BIGINT) AS backoff_s,
       CAST(last_attempt_ts
            + least(30 * (1 << CAST(least(consec_failures, 20) AS INT)),
                    3600) AS BIGINT) AS next_allowed_at,
       consec_failures >= 6 AS quarantined
FROM agg
"""


def q_fetch_mime_mismatch(spark, sf_dir):
    """Magic-byte MIME sniffing vs the declared Content-Type — the
    polyglot/mislabel audit (a .jpg that is really a ZIP is how
    archives smuggle through media pipelines; a crawler routing parsers
    on declared type alone mis-parses every such blob). Complements
    http_content_type (header string parsing) with CONTENT truth.

    Real binary on the Spark side: blobs are built with unhex(magic ||
    md5-payload) and sniffed from hex(substring(blob)) — the oracle
    states the same decisions from the hex strings directly. Every
    7th blob (partkey % 7 = 0) declares its neighbour format (planted
    mismatch). Plan/scale: pure codegen map + one census groupBy —
    sniffing fuses into the fetch-result scan at 100 TB."""
    fmt = (F.col("l_orderkey") % 6).cast("int")
    magic_hex = F.element_at(
        F.array(*[F.lit(m) for m, _ in _MAGIC51]), fmt + 1)
    payload = F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8)
    blob = F.unhex(F.concat(magic_hex, F.upper(payload)))
    decl_id = (F.when(F.col("l_partkey") % 7 == 0, (fmt + 1) % 6)
               .otherwise(fmt)).cast("int")
    declared = F.element_at(
        F.array(*[F.lit(t) for _, t in _MAGIC51]), decl_id + 1)
    rows = _t(spark, sf_dir, "lineitem").select(
        blob.alias("blob"), declared.alias("declared"))
    hx = F.upper(F.hex(F.col("blob")))
    sniffed = (F.when(hx.startswith("89504E47"), F.lit("image/png"))
               .when(hx.startswith("FFD8FF"), F.lit("image/jpeg"))
               .when(hx.startswith("474946"), F.lit("image/gif"))
               .when(hx.startswith("25504446"), F.lit("application/pdf"))
               .when(hx.startswith("504B0304"), F.lit("application/zip"))
               .when(hx.startswith("3C21444F"), F.lit("text/html"))
               .otherwise(F.lit("application/octet-stream")))
    return (rows.select("declared", sniffed.alias("sniffed"))
            .groupBy("declared", "sniffed")
            .agg(F.count("*").cast("long").alias("n_blobs"))
            .withColumn("is_mismatch",
                        F.col("declared") != F.col("sniffed")))


ORACLE_FETCH_MIME_MISMATCH = """
WITH b AS (
  SELECT (CASE l_orderkey % 6
            WHEN 0 THEN '89504E470D0A1A0A' WHEN 1 THEN 'FFD8FFE0'
            WHEN 2 THEN '474946383961' WHEN 3 THEN '25504446'
            WHEN 4 THEN '504B0304' ELSE '3C21444F43545950' END)
         || upper(substr(md5(l_partkey::VARCHAR), 1, 8)) AS hx,
         (CASE (CASE WHEN l_partkey % 7 = 0 THEN (l_orderkey % 6 + 1) % 6
                     ELSE l_orderkey % 6 END)
            WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
            WHEN 2 THEN 'image/gif' WHEN 3 THEN 'application/pdf'
            WHEN 4 THEN 'application/zip' ELSE 'text/html' END) AS declared
  FROM lineitem),
s AS (
  SELECT declared,
         CASE WHEN hx LIKE '89504E47%' THEN 'image/png'
              WHEN hx LIKE 'FFD8FF%' THEN 'image/jpeg'
              WHEN hx LIKE '474946%' THEN 'image/gif'
              WHEN hx LIKE '25504446%' THEN 'application/pdf'
              WHEN hx LIKE '504B0304%' THEN 'application/zip'
              WHEN hx LIKE '3C21444F%' THEN 'text/html'
              ELSE 'application/octet-stream' END AS sniffed
  FROM b)
SELECT declared, sniffed, CAST(count(*) AS BIGINT) AS n_blobs,
       declared <> sniffed AS is_mismatch
FROM s GROUP BY 1, 2
"""


def q_http_cache_headers(spark, sf_dir):
    """HTTP response-cache freshness planning (RFC 9111): parse
    Cache-Control directives + Age from synthesized response headers and
    compute what a polite recrawler may reuse — the header-driven
    complement to fetch_revalidate's ETag path. Rules encoded:
    no-store -> not cacheable at all; private -> shared caches (the
    crawler fleet's) get ttl 0 but a private ttl stands; no-cache ->
    stored but must revalidate (effective ttl 0); s-maxage overrides
    max-age FOR SHARED CACHES only; Age already consumed is subtracted
    from remaining freshness (floor 0). Per-response classification,
    exact integer seconds.

    Plan/scale: pure codegen regexp extraction + CASE ladder, zero
    shuffles — fuses into the header scan at 100 TB."""
    k = F.col("o_orderkey")
    hdr = (F.when(k % 6 == 0,
                  F.concat(F.lit("Cache-Control: public, max-age="),
                           ((k % 7) * 600).cast("string"),
                           F.lit("\r\nAge: "),
                           ((k % 3) * 150).cast("string")))
           .when(k % 6 == 1, F.lit("Cache-Control: no-store"))
           .when(k % 6 == 2,
                 F.concat(F.lit("Cache-Control: private, max-age=120, "
                                "s-maxage="),
                          ((k % 5) * 900).cast("string")))
           .when(k % 6 == 3,
                 F.lit("Cache-Control: no-cache, max-age=3600"))
           .when(k % 6 == 4,
                 F.concat(F.lit("Cache-Control: s-maxage="),
                          ((k % 4) * 450).cast("string"),
                          F.lit(", max-age=60\r\nAge: 30")))
           .otherwise(F.lit("X-Served-By: edge")))
    h = _t(spark, sf_dir, "orders").select(k.alias("req_id"),
                                           hdr.alias("header"))
    cc = F.col("header")
    max_age = F.regexp_extract(cc, "max-age=([0-9]+)", 1)
    s_maxage = F.regexp_extract(cc, "s-maxage=([0-9]+)", 1)
    age = F.regexp_extract(cc, "Age: ([0-9]+)", 1)
    max_age_s = F.when(max_age != "", max_age.cast("long"))
    s_maxage_s = F.when(s_maxage != "", s_maxage.cast("long"))
    age_s = F.coalesce(F.when(age != "", age.cast("long")), F.lit(0))
    no_store = cc.contains("no-store")
    no_cache = cc.contains("no-cache")
    private = cc.contains("private")
    cacheable = F.when(no_store, 0).otherwise(1)
    revalidate = F.when(no_store | no_cache, 1).otherwise(0)
    base_private = F.coalesce(max_age_s, F.lit(0))
    base_shared = F.coalesce(s_maxage_s, max_age_s, F.lit(0))
    private_ttl = (F.when(no_store | no_cache, F.lit(0))
                   .otherwise(F.greatest(base_private - age_s, F.lit(0))))
    shared_ttl = (F.when(no_store | no_cache | private, F.lit(0))
                  .otherwise(F.greatest(base_shared - age_s, F.lit(0))))
    return h.select("req_id", "header",
                    cacheable.cast("int").alias("cacheable"),
                    revalidate.cast("int").alias("must_revalidate"),
                    private_ttl.cast("long").alias("private_ttl_s"),
                    shared_ttl.cast("long").alias("shared_ttl_s"))


ORACLE_HTTP_CACHE_HEADERS = """
WITH h AS (
  SELECT o_orderkey AS req_id,
         CASE
           WHEN o_orderkey % 6 = 0 THEN
             'Cache-Control: public, max-age=' || ((o_orderkey % 7) * 600)
             || chr(13) || chr(10) || 'Age: ' || ((o_orderkey % 3) * 150)
           WHEN o_orderkey % 6 = 1 THEN 'Cache-Control: no-store'
           WHEN o_orderkey % 6 = 2 THEN
             'Cache-Control: private, max-age=120, s-maxage='
             || ((o_orderkey % 5) * 900)
           WHEN o_orderkey % 6 = 3 THEN 'Cache-Control: no-cache, max-age=3600'
           WHEN o_orderkey % 6 = 4 THEN
             'Cache-Control: s-maxage=' || ((o_orderkey % 4) * 450)
             || ', max-age=60' || chr(13) || chr(10) || 'Age: 30'
           ELSE 'X-Served-By: edge'
         END AS header
  FROM orders),
p AS (
  SELECT req_id, header,
         regexp_extract(header, 'max-age=([0-9]+)', 1) AS max_age,
         regexp_extract(header, 's-maxage=([0-9]+)', 1) AS s_maxage,
         regexp_extract(header, 'Age: ([0-9]+)', 1) AS age,
         contains(header, 'no-store') AS no_store,
         contains(header, 'no-cache') AS no_cache,
         contains(header, 'private') AS private
  FROM h),
t AS (
  SELECT req_id, header, no_store, no_cache, private,
         CASE WHEN max_age <> '' THEN CAST(max_age AS BIGINT) END
           AS max_age_s,
         CASE WHEN s_maxage <> '' THEN CAST(s_maxage AS BIGINT) END
           AS s_maxage_s,
         coalesce(CASE WHEN age <> '' THEN CAST(age AS BIGINT) END, 0)
           AS age_s
  FROM p)
SELECT req_id, header,
       CAST(CASE WHEN no_store THEN 0 ELSE 1 END AS INT) AS cacheable,
       CAST(CASE WHEN no_store OR no_cache THEN 1 ELSE 0 END AS INT)
         AS must_revalidate,
       CAST(CASE WHEN no_store OR no_cache THEN 0
                 ELSE greatest(coalesce(max_age_s, 0) - age_s, 0)
            END AS BIGINT) AS private_ttl_s,
       CAST(CASE WHEN no_store OR no_cache OR private THEN 0
                 ELSE greatest(coalesce(s_maxage_s, max_age_s, 0) - age_s,
                               0)
            END AS BIGINT) AS shared_ttl_s
FROM t
"""


# ---------------------------------------------------------------------------
# block 62: security-header posture, language-variant URL families, Gini
# ---------------------------------------------------------------------------


def q_http_security_headers(spark, sf_dir):
    """Security-header posture census per host — HSTS /
    Content-Security-Policy / X-Content-Type-Options / X-Frame-Options
    presence over each host's responses (a crawler's cheap
    trust/hygiene signal: hosts with zero security headers correlate
    with abandoned or attacker-controlled properties, and the posture
    grade feeds the same admission rubric as validity_rubric). Header
    names are matched case-insensitively on the raw header blob (the
    wire allows any case; the synth family mixes cases on purpose).

    Grades: per host a header counts as DEPLOYED when >= 50% of its
    responses carry it; grade = 'A' at 4 deployed .. 'F' at 0.

    Exactness: counts + integer DIV ppm; the 50% cut is ppm >= 500000.

    Plan/scale: pure-map header parse fused into the scan, ONE
    map-side-combinable host census agg; no joins."""
    k = F.col("o_orderkey")
    host_id, seq = k % 30, (k / 30).cast("long")
    tier = host_id % 5
    mixed_on = (tier == 4) & (seq % 2 == 0)
    lower_case = seq % 3 == 0
    hsts = F.when(lower_case, "strict-transport-security: max-age=63072000"
                  ).otherwise("Strict-Transport-Security: max-age=31536000")
    csp = F.when(lower_case, "content-security-policy: default-src 'self'"
                 ).otherwise("Content-Security-Policy: default-src 'none'")
    xcto = F.lit("X-Content-Type-Options: nosniff")
    xfo = F.when(lower_case, "x-frame-options: DENY"
                 ).otherwise("X-Frame-Options: SAMEORIGIN")
    base = F.lit("Server: nginx\nContent-Type: text/html")
    blob = F.concat(
        base,
        F.when((tier == 0) | mixed_on,
               F.concat(F.lit("\n"), hsts, F.lit("\n"), csp, F.lit("\n"),
                        xcto, F.lit("\n"), xfo)).otherwise(F.lit("")),
        F.when(tier == 1, F.concat(F.lit("\n"), hsts, F.lit("\n"), xcto))
        .otherwise(F.lit("")),
        F.when(tier == 2, F.concat(F.lit("\n"), csp)).otherwise(F.lit("")))
    resp = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), host_id.cast("string")).alias("host"),
        F.lower(blob).alias("hdrs"))
    has = {name: F.contains("hdrs", F.lit(pat)).cast("long") for name, pat
           in [("hsts", "strict-transport-security:"),
               ("csp", "content-security-policy:"),
               ("xcto", "x-content-type-options:"),
               ("xfo", "x-frame-options:")]}
    agg = (resp.groupBy("host")
           .agg(F.count(F.lit(1)).cast("long").alias("n_resp"),
                *[F.sum(v).alias(f"n_{n}") for n, v in has.items()]))
    cols = ["hsts", "csp", "xcto", "xfo"]
    for c in cols:
        agg = agg.withColumn(f"{c}_ppm", F.expr(
            f"n_{c} * 1000000 DIV n_resp").cast("long"))
    deployed = sum((F.col(f"{c}_ppm") >= 500000).cast("int") for c in cols)
    grade = (F.when(deployed == 4, "A").when(deployed == 3, "B")
             .when(deployed == 2, "C").when(deployed == 1, "D")
             .otherwise("F"))
    return agg.select("host", "n_resp",
                      *[F.col(f"{c}_ppm") for c in cols],
                      deployed.alias("n_deployed"), grade.alias("grade"))


ORACLE_HTTP_SECURITY_HEADERS = """
WITH r AS (
  SELECT 'h' || (o_orderkey % 30) AS host,
         lower(
           'Server: nginx' || chr(10) || 'Content-Type: text/html'
           || CASE WHEN (o_orderkey % 30) % 5 = 0
                    OR ((o_orderkey % 30) % 5 = 4
                        AND (o_orderkey // 30) % 2 = 0)
               THEN chr(10) || CASE WHEN (o_orderkey // 30) % 3 = 0
                 THEN 'strict-transport-security: max-age=63072000'
                 ELSE 'Strict-Transport-Security: max-age=31536000' END
                 || chr(10) || CASE WHEN (o_orderkey // 30) % 3 = 0
                 THEN 'content-security-policy: default-src ''self'''
                 ELSE 'Content-Security-Policy: default-src ''none''' END
                 || chr(10) || 'X-Content-Type-Options: nosniff'
                 || chr(10) || CASE WHEN (o_orderkey // 30) % 3 = 0
                 THEN 'x-frame-options: DENY'
                 ELSE 'X-Frame-Options: SAMEORIGIN' END
               ELSE '' END
           || CASE WHEN (o_orderkey % 30) % 5 = 1
               THEN chr(10) || CASE WHEN (o_orderkey // 30) % 3 = 0
                 THEN 'strict-transport-security: max-age=63072000'
                 ELSE 'Strict-Transport-Security: max-age=31536000' END
                 || chr(10) || 'X-Content-Type-Options: nosniff'
               ELSE '' END
           || CASE WHEN (o_orderkey % 30) % 5 = 2
               THEN chr(10) || CASE WHEN (o_orderkey // 30) % 3 = 0
                 THEN 'content-security-policy: default-src ''self'''
                 ELSE 'Content-Security-Policy: default-src ''none''' END
               ELSE '' END) AS hdrs
  FROM orders),
agg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_resp,
         sum(CASE WHEN contains(hdrs, 'strict-transport-security:')
                  THEN 1 ELSE 0 END) AS n_hsts,
         sum(CASE WHEN contains(hdrs, 'content-security-policy:')
                  THEN 1 ELSE 0 END) AS n_csp,
         sum(CASE WHEN contains(hdrs, 'x-content-type-options:')
                  THEN 1 ELSE 0 END) AS n_xcto,
         sum(CASE WHEN contains(hdrs, 'x-frame-options:')
                  THEN 1 ELSE 0 END) AS n_xfo
  FROM r GROUP BY host),
p AS (
  SELECT host, n_resp,
         CAST(n_hsts * 1000000 // n_resp AS BIGINT) AS hsts_ppm,
         CAST(n_csp * 1000000 // n_resp AS BIGINT) AS csp_ppm,
         CAST(n_xcto * 1000000 // n_resp AS BIGINT) AS xcto_ppm,
         CAST(n_xfo * 1000000 // n_resp AS BIGINT) AS xfo_ppm
  FROM agg),
g AS (
  SELECT *,
         CAST((CASE WHEN hsts_ppm >= 500000 THEN 1 ELSE 0 END)
            + (CASE WHEN csp_ppm >= 500000 THEN 1 ELSE 0 END)
            + (CASE WHEN xcto_ppm >= 500000 THEN 1 ELSE 0 END)
            + (CASE WHEN xfo_ppm >= 500000 THEN 1 ELSE 0 END) AS INT)
           AS n_deployed
  FROM p)
SELECT host, n_resp, hsts_ppm, csp_ppm, xcto_ppm, xfo_ppm, n_deployed,
       CASE n_deployed WHEN 4 THEN 'A' WHEN 3 THEN 'B' WHEN 2 THEN 'C'
                       WHEN 1 THEN 'D' ELSE 'F' END AS grade
FROM g
"""


def q_http_cookies(spark, sf_dir):
    """Set-Cookie posture audit (RFC 6265) — per-host census of cookie
    security attributes and tracking cookies: Secure / HttpOnly /
    SameSite flags, persistent-vs-session lifetime (Max-Age), and the
    underscore-prefixed tracker convention (_ga, _fbp). The privacy /
    compliance sweep a crawl archive runs before shipping pages into a
    training corpus, and the fetch-layer audit for session handling.

    Exactness: both engines parse the SAME synthesized header strings
    with token-exact attribute matching (split ';' + trim + lower —
    'SecureFlag' can't false-positive) and identical regex extracts
    for SameSite/Max-Age; counts and ppm are exact integers.

    Plan/scale: attribute extraction is a zero-exchange map over the
    response stream; the rollup is ONE map-side-combinable census agg
    into |hosts| rows."""
    k = F.col("o_orderkey")
    c = k % 6
    sc = (F.when(c == 0, F.concat(
        F.lit("sid=abc"), k.cast("string"),
        F.lit("; Path=/; Secure; HttpOnly; SameSite=Strict")))
        .when(c == 1, F.concat(
            F.lit("_ga=GA1.2."), k.cast("string"),
            F.lit("; Max-Age=63072000; SameSite=None; Secure")))
        .when(c == 2, F.lit("pref=dark; Path=/; Max-Age=3600"))
        .when(c == 3, F.concat(F.lit("sess="), k.cast("string"),
                               F.lit("; HttpOnly")))
        .when(c == 4, F.concat(
            F.lit("_fbp=fb.1."), k.cast("string"),
            F.lit("; Max-Age=7776000; SameSite=Lax")))
        .otherwise(F.lit("")))
    resp = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 20).cast("string")).alias("host"),
        sc.alias("sc"))
    parsed = (resp
              .withColumn("name",
                          F.nullif(F.regexp_extract("sc", r"^([^=;]+)=", 1),
                                   F.lit("")))
              .withColumn("_t", F.expr(
                  "transform(split(sc, ';'), x -> lower(trim(x)))"))
              .withColumn("secure",
                          F.array_contains("_t", "secure").cast("int"))
              .withColumn("httponly",
                          F.array_contains("_t", "httponly").cast("int"))
              .withColumn("max_age",
                          F.nullif(F.regexp_extract(
                              F.lower("sc"), r"max-age=([0-9]+)", 1),
                              F.lit("")).cast("long"))
              .withColumn("samesite",
                          F.coalesce(F.nullif(F.regexp_extract(
                              F.lower("sc"), r"samesite=([a-z]+)", 1),
                              F.lit("")), F.lit("-")))
              .withColumn("tracker",
                          F.col("name").startswith("_").cast("int")))
    has = F.col("name").isNotNull()
    return (parsed.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_responses"),
                 F.sum(has.cast("int")).cast("long").alias("n_cookies"),
                 F.sum(F.when(has, F.col("secure")).otherwise(F.lit(0)))
                 .cast("long").alias("n_secure"),
                 F.sum(F.when(has, F.col("httponly")).otherwise(F.lit(0)))
                 .cast("long").alias("n_httponly"),
                 F.sum(F.when(has & F.col("max_age").isNotNull(),
                              F.lit(1)).otherwise(F.lit(0)))
                 .cast("long").alias("n_persistent"),
                 F.sum(F.when(has, F.col("tracker")).otherwise(F.lit(0)))
                 .cast("long").alias("n_trackers"),
                 F.max(F.coalesce("max_age", F.lit(0).cast("long")))
                 .cast("long").alias("max_lifetime_s"))
            .withColumn("tracker_ppm",
                        F.expr("n_trackers * 1000000 DIV n_cookies")
                        .cast("long")))


ORACLE_HTTP_COOKIES = """
WITH resp AS (
  SELECT 'h' || (o_orderkey % 20) AS host,
         CASE o_orderkey % 6
           WHEN 0 THEN 'sid=abc' || o_orderkey ||
                '; Path=/; Secure; HttpOnly; SameSite=Strict'
           WHEN 1 THEN '_ga=GA1.2.' || o_orderkey ||
                '; Max-Age=63072000; SameSite=None; Secure'
           WHEN 2 THEN 'pref=dark; Path=/; Max-Age=3600'
           WHEN 3 THEN 'sess=' || o_orderkey || '; HttpOnly'
           WHEN 4 THEN '_fbp=fb.1.' || o_orderkey ||
                '; Max-Age=7776000; SameSite=Lax'
           ELSE '' END AS sc
  FROM orders),
parsed AS (
  SELECT host, sc,
         nullif(regexp_extract(sc, '^([^=;]+)=', 1), '') AS name,
         list_transform(string_split(sc, ';'), x -> lower(trim(x))) AS t,
         TRY_CAST(nullif(regexp_extract(lower(sc), 'max-age=([0-9]+)', 1),
                         '') AS BIGINT) AS max_age
  FROM resp)
SELECT host, CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(CASE WHEN name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cookies,
       CAST(sum(CASE WHEN name IS NOT NULL
                      AND list_contains(t, 'secure') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_secure,
       CAST(sum(CASE WHEN name IS NOT NULL
                      AND list_contains(t, 'httponly') THEN 1 ELSE 0 END)
            AS BIGINT) AS n_httponly,
       CAST(sum(CASE WHEN name IS NOT NULL AND max_age IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_persistent,
       CAST(sum(CASE WHEN name IS NOT NULL AND name LIKE '\\_%' ESCAPE '\\'
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_trackers,
       CAST(max(coalesce(max_age, 0)) AS BIGINT) AS max_lifetime_s,
       CAST(sum(CASE WHEN name IS NOT NULL AND name LIKE '\\_%' ESCAPE '\\'
                     THEN 1 ELSE 0 END) * 1000000
            // sum(CASE WHEN name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS tracker_ppm
FROM parsed GROUP BY host
"""


def q_http_compression(spark, sf_dir):
    """Content-Encoding adoption audit — per-host compression posture
    and the exact bytes it saves: parse the (case-messy) encoding
    token, apply each codec's deterministic size model, and census
    raw-vs-sent bytes per host. The capacity-planning row for a fetch
    fleet (uncompressed hosts dominate egress) and the nudge list for
    Accept-Encoding negotiation.

    Exactness: token parse is trim+lower (case variants in the
    fixture); compressed sizes are exact integer DIV by the per-codec
    ratio; savings ppm is integer DIV.

    Plan/scale: zero-exchange parse + ONE map-side-combinable census
    agg into |hosts| rows."""
    k = F.col("o_orderkey")
    c = k % 5
    enc_raw = (F.when(c == 0, F.lit("gzip"))
               .when(c == 1, F.lit(" BR "))
               .when(c == 2, F.lit("zstd"))
               .when(c == 4, F.lit("GZip"))
               .otherwise(F.lit("")))
    raw_bytes = (1000 + k % 9000).cast("long")
    resp = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 15).cast("string")).alias("host"),
        enc_raw.alias("enc_raw"), raw_bytes.alias("raw_bytes"))
    enc = F.when(F.trim(F.lower("enc_raw")) == "", "identity") \
           .otherwise(F.trim(F.lower("enc_raw")))
    sent = (F.when(enc == "gzip", F.expr("raw_bytes DIV 3"))
            .when(enc == "br", F.expr("raw_bytes DIV 4"))
            .when(enc == "zstd", F.expr("raw_bytes DIV 5"))
            .otherwise(F.col("raw_bytes"))).cast("long")
    x = resp.select("host", enc.alias("enc"), "raw_bytes",
                    sent.alias("sent_bytes"))
    return (x.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_responses"),
                 F.sum((F.col("enc") == "gzip").cast("int"))
                 .cast("long").alias("n_gzip"),
                 F.sum((F.col("enc") == "br").cast("int"))
                 .cast("long").alias("n_br"),
                 F.sum((F.col("enc") == "zstd").cast("int"))
                 .cast("long").alias("n_zstd"),
                 F.sum((F.col("enc") == "identity").cast("int"))
                 .cast("long").alias("n_identity"),
                 F.sum("raw_bytes").cast("long").alias("bytes_raw"),
                 F.sum("sent_bytes").cast("long").alias("bytes_sent"))
            .withColumn("savings_ppm", F.expr(
                "(bytes_raw - bytes_sent) * 1000000 DIV bytes_raw")
                .cast("long")))


ORACLE_HTTP_COMPRESSION = """
WITH r AS (
  SELECT 'h' || (o_orderkey % 15) AS host,
         CASE o_orderkey % 5
           WHEN 0 THEN 'gzip' WHEN 1 THEN ' BR ' WHEN 2 THEN 'zstd'
           WHEN 4 THEN 'GZip' ELSE '' END AS enc_raw,
         CAST(1000 + o_orderkey % 9000 AS BIGINT) AS raw_bytes
  FROM orders),
x AS (
  SELECT host, raw_bytes,
         CASE WHEN trim(lower(enc_raw)) = '' THEN 'identity'
              ELSE trim(lower(enc_raw)) END AS enc
  FROM r),
y AS (
  SELECT host, enc, raw_bytes,
         CASE enc WHEN 'gzip' THEN raw_bytes // 3
                  WHEN 'br' THEN raw_bytes // 4
                  WHEN 'zstd' THEN raw_bytes // 5
                  ELSE raw_bytes END AS sent_bytes
  FROM x)
SELECT host, CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(CASE WHEN enc = 'gzip' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gzip,
       CAST(sum(CASE WHEN enc = 'br' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_br,
       CAST(sum(CASE WHEN enc = 'zstd' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zstd,
       CAST(sum(CASE WHEN enc = 'identity' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_identity,
       CAST(sum(raw_bytes) AS BIGINT) AS bytes_raw,
       CAST(sum(sent_bytes) AS BIGINT) AS bytes_sent,
       CAST((sum(raw_bytes) - sum(sent_bytes)) * 1000000
            // sum(raw_bytes) AS BIGINT) AS savings_ppm
FROM y GROUP BY host
"""


def q_http_ratelimit(spark, sf_dir):
    """Rate-limit header consumption — the server-DECLARED politeness
    channel next to robots crawl-delay (robots_directives) and
    latency-adaptive EWMA (frontier_crawl_delay): parse Retry-After
    (delta-seconds form) and X-RateLimit-Remaining/-Reset pairs off
    the response stream and fold them into a per-host backoff plan —
    the LATEST applicable resume time wins, and hosts answering 429
    are flagged throttled.

    Exactness: header parse is regexp over synthesized strings both
    engines replay; resume times are exact integer epoch seconds
    (max-merge); counts exact. (The http-date Retry-After form needs
    a locale-free date parse — documented out of this row's scope;
    production routes it through the same max-merge.)

    Plan/scale: zero-exchange parse + ONE census agg into |hosts|
    rows — the plan the dispatcher polls between waves."""
    k = F.col("o_orderkey")
    host_id = k % 25
    ts = (1000000 + (k % 500) * 7).cast("long")
    v = k % 6
    status = F.when(v <= 1, F.lit(429)).otherwise(F.lit(200))
    hdr = (F.when(v == 0, F.concat(F.lit("Retry-After: "),
                                   (30 + k % 90).cast("string")))
           .when(v == 1, F.concat(
               F.lit("X-RateLimit-Remaining: 0\nX-RateLimit-Reset: "),
               (ts + 120 + k % 60).cast("string")))
           .when(v == 2, F.concat(
               F.lit("X-RateLimit-Remaining: "),
               (1 + k % 50).cast("string")))
           .otherwise(F.lit("")))
    resp = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), host_id.cast("string")).alias("host"),
        ts.alias("ts"), status.alias("status"), hdr.alias("hdr"))
    retry_after = F.nullif(
        F.regexp_extract("hdr", r"Retry-After: (\d+)", 1),
        F.lit("")).cast("long")
    reset_at = F.nullif(
        F.regexp_extract("hdr", r"X-RateLimit-Reset: (\d+)", 1),
        F.lit("")).cast("long")
    remaining = F.nullif(
        F.regexp_extract("hdr", r"X-RateLimit-Remaining: (\d+)", 1),
        F.lit("")).cast("long")
    x = resp.select(
        "host", "status",
        F.greatest(
            F.when(retry_after.isNotNull(), F.col("ts") + retry_after),
            F.when(remaining == 0, reset_at)).alias("resume_at"))
    return (x.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_responses"),
                 F.sum((F.col("status") == 429).cast("int")).cast("long")
                 .alias("n_429"),
                 F.coalesce(F.max("resume_at"), F.lit(-1).cast("long"))
                 .cast("long").alias("backoff_until"))
            .withColumn("throttled",
                        (F.col("n_429") > 0).cast("int")))


ORACLE_HTTP_RATELIMIT = """
WITH r AS (
  SELECT 'h' || (o_orderkey % 25) AS host,
         CAST(1000000 + (o_orderkey % 500) * 7 AS BIGINT) AS ts,
         CASE WHEN o_orderkey % 6 <= 1 THEN 429 ELSE 200 END AS status,
         CASE o_orderkey % 6
           WHEN 0 THEN 'Retry-After: ' || (30 + o_orderkey % 90)
           WHEN 1 THEN 'X-RateLimit-Remaining: 0' || chr(10)
                || 'X-RateLimit-Reset: '
                || (1000000 + (o_orderkey % 500) * 7 + 120
                    + o_orderkey % 60)
           WHEN 2 THEN 'X-RateLimit-Remaining: ' || (1 + o_orderkey % 50)
           ELSE '' END AS hdr
  FROM orders),
p AS (
  SELECT host, status,
         TRY_CAST(nullif(regexp_extract(hdr, 'Retry-After: (\\d+)', 1),
                         '') AS BIGINT) AS retry_after,
         TRY_CAST(nullif(regexp_extract(hdr,
                  'X-RateLimit-Reset: (\\d+)', 1), '') AS BIGINT)
           AS reset_at,
         TRY_CAST(nullif(regexp_extract(hdr,
                  'X-RateLimit-Remaining: (\\d+)', 1), '') AS BIGINT)
           AS remaining,
         ts
  FROM r),
x AS (
  SELECT host, status,
         greatest(CASE WHEN retry_after IS NOT NULL
                       THEN ts + retry_after END,
                  CASE WHEN remaining = 0 THEN reset_at END) AS resume_at
  FROM p)
SELECT host, CAST(count(*) AS BIGINT) AS n_responses,
       CAST(sum(CASE WHEN status = 429 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_429,
       CAST(coalesce(max(resume_at), -1) AS BIGINT) AS backoff_until,
       CAST(CASE WHEN sum(CASE WHEN status = 429 THEN 1 ELSE 0 END) > 0
                 THEN 1 ELSE 0 END AS INT) AS throttled
FROM x GROUP BY host
"""


def q_http_range_resume(spark, sf_dir):
    """HTTP RANGE-resume planning (RFC 9110 §14) — when a large
    fetch dies mid-transfer, refetching from byte 0 doubles the
    bill; a crawler that tracks received bytes and the server's
    Accept-Ranges can resume instead. Per fetch: sizes, the
    interruption and ranges capability flags, the action
    (complete / range_resume / refetch_full — resume only pays
    past a 25 KiB floor), bytes still to fetch, and bytes saved
    vs a naive refetch.

    Fixture: every 7th fetch truncates at a key-derived 30-70%;
    every 3rd+1 server refuses ranges.

    Plan/scale: row-local integer policy codegen, zero shuffle —
    runs inline in the fetch-retry loop."""
    k = F.col("o_orderkey")
    total = ((k % 20 + 1) * 51200).cast("long")
    interrupted = (k % 7 == 0)
    received = (F.when(interrupted,
                       (total * ((k % 5) + 3) / 10).cast("long"))
                .otherwise(total))
    accepts = (k % 3 != 1)
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("u"), k.cast("string")).alias("url_id"),
                 total.alias("total_bytes"),
                 received.alias("received_bytes"),
                 interrupted.cast("int").alias("interrupted"),
                 accepts.cast("int").alias("accepts_ranges")))
    action = (F.when(F.col("interrupted") == 0, F.lit("complete"))
              .when((F.col("accepts_ranges") == 1)
                    & (F.col("received_bytes") >= 25600),
                    F.lit("range_resume"))
              .otherwise(F.lit("refetch_full")))
    out = d.withColumn("action", action)
    to_fetch = (F.when(F.col("action") == "complete", F.lit(0))
                .when(F.col("action") == "range_resume",
                      F.col("total_bytes") - F.col("received_bytes"))
                .otherwise(F.col("total_bytes")))
    return (out.withColumn("bytes_to_fetch", to_fetch.cast("long"))
            .withColumn("bytes_saved",
                        F.when(F.col("action") == "range_resume",
                               F.col("received_bytes"))
                        .otherwise(F.lit(0)).cast("long")))


ORACLE_HTTP_RANGE_RESUME = """
WITH d AS (
  SELECT 'u' || CAST(o_orderkey AS VARCHAR) AS url_id,
         CAST((o_orderkey % 20 + 1) * 51200 AS BIGINT) AS total_bytes,
         CAST(CASE WHEN o_orderkey % 7 = 0
              THEN ((o_orderkey % 20 + 1) * 51200)
                   * ((o_orderkey % 5) + 3) // 10
              ELSE (o_orderkey % 20 + 1) * 51200 END AS BIGINT)
           AS received_bytes,
         CAST(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS INT)
           AS interrupted,
         CAST(CASE WHEN o_orderkey % 3 <> 1 THEN 1 ELSE 0 END AS INT)
           AS accepts_ranges
  FROM orders),
act AS (
  SELECT *,
         CASE WHEN interrupted = 0 THEN 'complete'
              WHEN accepts_ranges = 1 AND received_bytes >= 25600
                THEN 'range_resume'
              ELSE 'refetch_full' END AS action
  FROM d)
SELECT url_id, total_bytes, received_bytes, interrupted,
       accepts_ranges, action,
       CAST(CASE WHEN action = 'complete' THEN 0
                 WHEN action = 'range_resume'
                   THEN total_bytes - received_bytes
                 ELSE total_bytes END AS BIGINT) AS bytes_to_fetch,
       CAST(CASE WHEN action = 'range_resume' THEN received_bytes
                 ELSE 0 END AS BIGINT) AS bytes_saved
FROM act
"""


def q_http_link_header(spark, sf_dir):
    """RFC 8288 ``Link`` header parsing — rel=next/prev/canonical
    pagination discovery, the HTTP-header sibling of the
    rel-canonical and srcset rows: the comma-separated
    ``<url>; rel=...`` list (quoted and unquoted rel, irregular
    whitespace, extra params) is parsed in pure codegen; per link:
    its target and relation; per page: the has_next flag a frontier
    expander consumes (every 7th page is the last of its chain and
    carries no next link). Both engines build the same messy header
    string, so the hash proves the parser.

    Plan/scale: pure map + split/regexp per header; census-free
    (per-link rows), fuses into the scan."""
    pk = F.col("page_id")
    base = F.concat(F.lit("http://h"), (pk % 30).cast("string"),
                    F.lit(".onion/page"))
    nxt = F.concat(F.lit("<"), base, (pk + 1).cast("string"),
                   F.lit('>; rel="next"'))
    prv = F.concat(F.lit(" <"), base,
                   F.when(pk > 0, pk - 1).otherwise(0).cast("string"),
                   F.lit(">;rel=prev"))
    canon = F.concat(F.lit("<"), base, pk.cast("string"),
                     F.lit('>; rel="canonical"; type="text/html"'))
    header = F.when(pk % 7 == 0, F.concat(prv, F.lit(" , "), canon)) \
        .otherwise(F.concat(nxt, F.lit(","), prv, F.lit(" , "), canon))
    d = (_t(spark, sf_dir, "orders")
         .select((F.col("o_orderkey") % 300).alias("page_id")).distinct()
         .withColumn("header", header))
    parts = (d.select("page_id",
                      F.posexplode(F.split("header", ","))
                      .alias("idx", "raw"))
             .withColumn("part", F.trim("raw")))
    url = F.regexp_extract("part", "<([^>]*)>", 1)
    rel = F.regexp_extract("part", 'rel="?([A-Za-z]+)"?', 1)
    links = parts.select("page_id", F.col("idx").cast("int").alias("idx"),
                         url.alias("url"), rel.alias("rel"))
    w = Window.partitionBy("page_id")
    return links.withColumn(
        "has_next",
        F.max((F.col("rel") == "next").cast("int")).over(w))


ORACLE_HTTP_LINK_HEADER = """
WITH d AS (
  SELECT DISTINCT o_orderkey % 300 AS page_id FROM orders),
built AS (
  SELECT page_id,
         'http://h' || (page_id % 30) || '.onion/page' AS base
  FROM d),
hdr AS (
  SELECT page_id,
         CASE WHEN page_id % 7 = 0
              THEN ' <' || base ||
                   CASE WHEN page_id > 0 THEN page_id - 1 ELSE 0 END
                   || '>;rel=prev , <' || base || page_id
                   || '>; rel="canonical"; type="text/html"'
              ELSE '<' || base || (page_id + 1) || '>; rel="next", <'
                   || base ||
                   CASE WHEN page_id > 0 THEN page_id - 1 ELSE 0 END
                   || '>;rel=prev , <' || base || page_id
                   || '>; rel="canonical"; type="text/html"'
         END AS header
  FROM built),
parts AS (
  SELECT page_id, CAST(t.i AS INT) AS idx,
         trim(string_split(header, ',')[t.i + 1]) AS part
  FROM hdr, UNNEST(range(len(string_split(header, ',')))) t(i)),
links AS (
  SELECT page_id, idx,
         regexp_extract(part, '<([^>]*)>', 1) AS url,
         regexp_extract(part, 'rel="?([A-Za-z]+)"?', 1) AS rel
  FROM parts)
SELECT page_id, idx, url, rel,
       CAST(MAX(CASE WHEN rel = 'next' THEN 1 ELSE 0 END)
            OVER (PARTITION BY page_id) AS INT) AS has_next
FROM links
"""


def q_http_vary_cache(spark, sf_dir):
    """``Vary`` header cache-key fragmentation audit — the cache-ops
    twin of http_cache_headers: per response, the Vary list (messy
    case/whitespace; every 5th resource varies on User-Agent — the
    classic cache-killer — every 3rd on Accept-Encoding, every 11th
    is ``Vary: *``, i.e. uncacheable) is parsed and normalized in
    codegen; per host: resource count, how many are fragmented by UA,
    uncacheable count, and the CACHE-KEY MULTIPLIER the host's cache
    needs (product over distinct vary dimensions, with UA counting
    x50 client populations and encoding x3) summed in exact integer
    space.

    Plan/scale: parse is a pure map; one per-host census agg."""
    k = F.col("o_orderkey")
    rows = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 40).cast("string")).alias("host_key"),
        k.alias("rid"),
        F.when(k % 11 == 0, F.lit(" * "))
        .when((k % 5 == 0) & (k % 3 == 0),
              F.lit("accept-encoding , User-Agent"))
        .when(k % 5 == 0, F.lit("USER-AGENT"))
        .when(k % 3 == 0, F.lit("Accept-Encoding"))
        .otherwise(F.lit("")).alias("vary_raw"))
    toks = F.filter(
        F.transform(F.split("vary_raw", ","),
                    lambda t: F.lower(F.trim(t))),
        lambda t: t != "")
    parsed = rows.select(
        "host_key", "rid",
        F.array_contains(toks, "*").cast("int").alias("uncacheable"),
        F.array_contains(toks, "user-agent").cast("int").alias("by_ua"),
        F.array_contains(toks, "accept-encoding").cast("int")
        .alias("by_enc"))
    mult = (F.when(F.col("uncacheable") == 1, F.lit(0))
            .otherwise(
                F.when(F.col("by_ua") == 1, F.lit(50)).otherwise(F.lit(1))
                * F.when(F.col("by_enc") == 1, F.lit(3))
                .otherwise(F.lit(1))))
    return (parsed.withColumn("key_mult", mult.cast("long"))
            .groupBy("host_key")
            .agg(F.count("*").cast("long").alias("n_resources"),
                 F.sum("by_ua").cast("long").alias("n_ua_varied"),
                 F.sum("uncacheable").cast("long").alias("n_uncacheable"),
                 F.sum("key_mult").cast("long").alias("cache_keys")))


ORACLE_HTTP_VARY_CACHE = """
WITH rows_ AS (
  SELECT 'h' || (o_orderkey % 40) AS host_key, o_orderkey AS rid,
         CASE WHEN o_orderkey % 11 = 0 THEN ' * '
              WHEN o_orderkey % 5 = 0 AND o_orderkey % 3 = 0
                THEN 'accept-encoding , User-Agent'
              WHEN o_orderkey % 5 = 0 THEN 'USER-AGENT'
              WHEN o_orderkey % 3 = 0 THEN 'Accept-Encoding'
              ELSE '' END AS vary_raw
  FROM orders),
parsed AS (
  SELECT host_key, rid,
         CASE WHEN list_contains(toks, '*') THEN 1 ELSE 0 END
           AS uncacheable,
         CASE WHEN list_contains(toks, 'user-agent') THEN 1 ELSE 0 END
           AS by_ua,
         CASE WHEN list_contains(toks, 'accept-encoding') THEN 1 ELSE 0
           END AS by_enc
  FROM (SELECT *,
               list_filter(list_transform(string_split(vary_raw, ','),
                                          t -> lower(trim(t))),
                           t -> t <> '') AS toks
        FROM rows_))
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_resources,
       CAST(sum(by_ua) AS BIGINT) AS n_ua_varied,
       CAST(sum(uncacheable) AS BIGINT) AS n_uncacheable,
       CAST(sum(CASE WHEN uncacheable = 1 THEN 0
                     ELSE (CASE WHEN by_ua = 1 THEN 50 ELSE 1 END)
                        * (CASE WHEN by_enc = 1 THEN 3 ELSE 1 END)
                END) AS BIGINT) AS cache_keys
FROM parsed GROUP BY host_key
"""


def q_fetch_connection_reuse(spark, sf_dir):
    """HTTP keep-alive CONNECTION planning — how many TCP+TLS
    handshakes a crawl schedule actually pays (the fetch-ops cousin
    of the sessionize pattern, with connection semantics): per host,
    fetches ordered by time reuse the open connection when the idle
    gap is <= 300 s, else a new connect; per host: fetch count,
    connections needed, handshakes SAVED (fetches - connections),
    reuse ratio in exact ppm, and the longest single-connection run.
    Deterministic BURSTY schedule from orders (host k%50, hour
    bucket k%13, offset ((k*11)%29)*20 s — fetches cluster inside
    hour blocks so both reuse and re-connect occur).

    Plan/scale: one per-host window pass (lag + running sum — the
    gaps-and-islands shape) + one census agg; shuffle carries (host,
    t) pairs only."""
    k = F.col("o_orderkey")
    fx = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("host_key"),
        ((k % 13) * 3600 + ((k * 11) % 29) * 20).cast("long")
        .alias("t")).distinct()
    w = Window.partitionBy("host_key").orderBy("t")
    marked = (fx.withColumn("gap", F.col("t") - F.lag("t").over(w))
              .withColumn("new_conn",
                          (F.col("gap").isNull()
                           | (F.col("gap") > 300)).cast("long"))
              .withColumn("conn_id", F.sum("new_conn").over(
                  w.rowsBetween(Window.unboundedPreceding,
                                Window.currentRow))))
    per_conn = (marked.groupBy("host_key", "conn_id")
                .agg(F.count("*").cast("long").alias("run")))
    return (per_conn.groupBy("host_key")
            .agg(F.sum("run").cast("long").alias("n_fetches"),
                 F.count("*").cast("long").alias("n_connections"),
                 F.max("run").cast("long").alias("max_run"))
            .select("host_key", "n_fetches", "n_connections",
                    (F.col("n_fetches") - F.col("n_connections"))
                    .alias("saved_handshakes"),
                    F.expr("(n_fetches - n_connections) * 1000000 "
                           "DIV n_fetches").alias("reuse_ppm"),
                    "max_run"))


ORACLE_FETCH_CONNECTION_REUSE = """
WITH fx AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS host_key,
         CAST((o_orderkey % 13) * 3600
              + ((o_orderkey * 11) % 29) * 20 AS BIGINT) AS t
  FROM orders),
marked AS (
  SELECT host_key, t,
         CASE WHEN lag(t) OVER w IS NULL OR t - lag(t) OVER w > 300
              THEN 1 ELSE 0 END AS new_conn
  FROM fx WINDOW w AS (PARTITION BY host_key ORDER BY t)),
runs AS (
  SELECT host_key,
         SUM(new_conn) OVER (PARTITION BY host_key ORDER BY t
                             ROWS UNBOUNDED PRECEDING) AS conn_id
  FROM marked),
per_conn AS (
  SELECT host_key, conn_id, CAST(count(*) AS BIGINT) AS run
  FROM runs GROUP BY host_key, conn_id)
SELECT host_key,
       CAST(sum(run) AS BIGINT) AS n_fetches,
       CAST(count(*) AS BIGINT) AS n_connections,
       CAST(sum(run) - count(*) AS BIGINT) AS saved_handshakes,
       (CAST(sum(run) AS BIGINT) - count(*)) * 1000000 // sum(run)
         AS reuse_ppm,
       CAST(max(run) AS BIGINT) AS max_run
FROM per_conn GROUP BY host_key
"""


def q_fetch_charset_sniff(spark, sf_dir):
    """Charset SNIFFING with the WHATWG precedence order — what a
    fetcher must decide before any text touches the parser: (1) a
    byte-order mark wins outright (UTF-8 / UTF-16LE / UTF-16BE,
    matched on the payload's hex prefix), (2) else the HTTP
    Content-Type charset parameter, (3) else a <meta charset> inside
    the first 1024 bytes, (4) else the windows-1252 legacy default.
    The fixture exercises every branch AND every override (BOM
    beating a contradicting header, header beating meta);
    charset names normalize to lowercase.

    Plan/scale: pure codegen (prefix match + two regexps) per
    resource, zero shuffles after the per-host census."""
    k = F.col("o_orderkey")
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"),
        F.when(k % 7 == 0, F.lit("efbbbf3c68746d6c"))
        .when(k % 7 == 1, F.lit("fffe3c00680074"))
        .when(k % 7 == 2, F.lit("feff003c0068"))
        .otherwise(F.lit("3c68746d6c")).alias("payload_hex"),
        F.when(k % 5 == 0, F.lit("text/html; charset=Shift_JIS"))
        .otherwise(F.lit("text/html")).alias("content_type"),
        F.when(k % 3 == 0,
               F.concat(F.lit('<html><head><meta charset="'),
                        F.when(k % 2 == 0, F.lit("ISO-8859-1"))
                        .otherwise(F.lit("utf-8")),
                        F.lit('"></head>')))
        .otherwise(F.lit("<html><head></head>")).alias("head_text"))
    hdr_cs = F.lower(F.regexp_extract("content_type",
                                      "charset=([A-Za-z0-9_-]+)", 1))
    meta_cs = F.lower(F.regexp_extract(
        F.substring("head_text", 1, 1024),
        '<meta charset="([A-Za-z0-9_-]+)"', 1))
    det = (F.when(F.col("payload_hex").startswith("efbbbf"),
                  F.struct(F.lit("utf-8").alias("cs"),
                           F.lit("bom").alias("src")))
           .when(F.col("payload_hex").startswith("fffe"),
                 F.struct(F.lit("utf-16le").alias("cs"),
                          F.lit("bom").alias("src")))
           .when(F.col("payload_hex").startswith("feff"),
                 F.struct(F.lit("utf-16be").alias("cs"),
                          F.lit("bom").alias("src")))
           .when(hdr_cs != "", F.struct(hdr_cs.alias("cs"),
                                        F.lit("header").alias("src")))
           .when(meta_cs != "", F.struct(meta_cs.alias("cs"),
                                         F.lit("meta").alias("src")))
           .otherwise(F.struct(F.lit("windows-1252").alias("cs"),
                               F.lit("default").alias("src"))))
    return rows.withColumn("d", det).select(
        "rid", F.col("d.cs").alias("charset"),
        F.col("d.src").alias("source"))


ORACLE_FETCH_CHARSET_SNIFF = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 7 = 0 THEN 'efbbbf3c68746d6c'
              WHEN o_orderkey % 7 = 1 THEN 'fffe3c00680074'
              WHEN o_orderkey % 7 = 2 THEN 'feff003c0068'
              ELSE '3c68746d6c' END AS payload_hex,
         CASE WHEN o_orderkey % 5 = 0
              THEN 'text/html; charset=Shift_JIS'
              ELSE 'text/html' END AS content_type,
         CASE WHEN o_orderkey % 3 = 0
              THEN '<html><head><meta charset="' ||
                   CASE WHEN o_orderkey % 2 = 0 THEN 'ISO-8859-1'
                        ELSE 'utf-8' END || '"></head>'
              ELSE '<html><head></head>' END AS head_text
  FROM orders),
sniff AS (
  SELECT rid,
         lower(regexp_extract(content_type,
                              'charset=([A-Za-z0-9_-]+)', 1)) AS hdr_cs,
         lower(regexp_extract(substr(head_text, 1, 1024),
                              '<meta charset="([A-Za-z0-9_-]+)"', 1))
           AS meta_cs,
         payload_hex
  FROM rows_)
SELECT rid,
       CASE WHEN payload_hex LIKE 'efbbbf%' THEN 'utf-8'
            WHEN payload_hex LIKE 'fffe%' THEN 'utf-16le'
            WHEN payload_hex LIKE 'feff%' THEN 'utf-16be'
            WHEN hdr_cs <> '' THEN hdr_cs
            WHEN meta_cs <> '' THEN meta_cs
            ELSE 'windows-1252' END AS charset,
       CASE WHEN payload_hex LIKE 'efbbbf%' OR payload_hex LIKE 'fffe%'
              OR payload_hex LIKE 'feff%' THEN 'bom'
            WHEN hdr_cs <> '' THEN 'header'
            WHEN meta_cs <> '' THEN 'meta'
            ELSE 'default' END AS source
FROM sniff
"""


def q_http_alt_svc(spark, sf_dir):
    """``Alt-Svc`` header parsing (RFC 7838) — HTTP/3 adoption
    discovery, the transport-upgrade complement of the
    https_upgrade/security_headers rows: the messy comma-separated
    alternative list (h3/h2 protocols, quoted authority, optional
    ma= lifetime, 'clear' tombstones) is parsed in codegen; per host:
    resources advertising h3, the dominant advertised lifetime, and
    the adoption verdict (h3_ready iff a majority of resources
    advertise h3 with ma >= 3600).

    Fixture: k%4==0 -> 'h3=":443"; ma=86400, h2=":443"', k%4==1 ->
    'h3=":443";ma=60' (short-lived), k%4==2 -> 'clear', else absent.

    Plan/scale: regexp parse + one host census."""
    k = F.col("o_orderkey")
    rows = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 45).cast("string")).alias("host_key"),
        k.alias("rid"),
        F.when(k % 4 == 0, F.lit('h3=":443"; ma=86400, h2=":443"'))
        .when(k % 4 == 1, F.lit('h3=":443";ma=60'))
        .when(k % 4 == 2, F.lit("clear"))
        .otherwise(F.lit("")).alias("alt_svc"))
    has_h3 = F.col("alt_svc").rlike("(^|,)\\s*h3=")
    ma = F.regexp_extract("alt_svc", "ma=([0-9]+)", 1)
    parsed = rows.select(
        "host_key",
        has_h3.cast("long").alias("h3"),
        (F.col("alt_svc") == "clear").cast("long").alias("cleared"),
        F.when(has_h3 & (ma != ""), ma.cast("long"))
        .otherwise(F.lit(0)).alias("h3_ma"))
    return (parsed.groupBy("host_key")
            .agg(F.count("*").cast("long").alias("n_resources"),
                 F.sum("h3").cast("long").alias("n_h3"),
                 F.sum("cleared").cast("long").alias("n_cleared"),
                 F.max("h3_ma").cast("long").alias("max_ma"))
            .withColumn(
                "h3_ready",
                ((F.col("n_h3") * 2 > F.col("n_resources"))
                 & (F.col("max_ma") >= 3600)).cast("int")))


ORACLE_HTTP_ALT_SVC = """
WITH rows_ AS (
  SELECT 'h' || (o_orderkey % 45) AS host_key, o_orderkey AS rid,
         CASE WHEN o_orderkey % 4 = 0
                THEN 'h3=":443"; ma=86400, h2=":443"'
              WHEN o_orderkey % 4 = 1 THEN 'h3=":443";ma=60'
              WHEN o_orderkey % 4 = 2 THEN 'clear'
              ELSE '' END AS alt_svc
  FROM orders),
parsed AS (
  SELECT host_key,
         CASE WHEN regexp_matches(alt_svc, '(^|,)\\s*h3=')
              THEN 1 ELSE 0 END AS h3,
         CASE WHEN alt_svc = 'clear' THEN 1 ELSE 0 END AS cleared,
         CASE WHEN regexp_matches(alt_svc, '(^|,)\\s*h3=')
                AND regexp_extract(alt_svc, 'ma=([0-9]+)', 1) <> ''
              THEN CAST(regexp_extract(alt_svc, 'ma=([0-9]+)', 1)
                        AS BIGINT)
              ELSE 0 END AS h3_ma
  FROM rows_)
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_resources,
       CAST(sum(h3) AS BIGINT) AS n_h3,
       CAST(sum(cleared) AS BIGINT) AS n_cleared,
       CAST(max(h3_ma) AS BIGINT) AS max_ma,
       CAST(CASE WHEN sum(h3) * 2 > count(*) AND max(h3_ma) >= 3600
            THEN 1 ELSE 0 END AS INT) AS h3_ready
FROM parsed GROUP BY host_key
"""


def q_fetch_happy_eyeballs(spark, sf_dir):
    """RFC 8305 Happy-Eyeballs connection racing, planned in closed
    form — the fetch layer's dual-stack strategy (staggered attempts
    every 250 ms over the family-interleaved address list; first
    established connection wins, later attempts cancel): per host,
    the winning family, established time, how many attempts had
    already been STARTED when the winner landed (= sockets burned),
    and the all-failed verdict.

    Fixture: 2+k%4 addresses, v6/v4 interleaved (k%5=0 hosts are
    v4-only), attempt j latency 80+((k*13+j*37)%200) ms, fails when
    (k+j)%3=0; k%19=0 hosts are fully down. The 250 ms stagger
    exceeds the 199 ms latency spread, so established times can
    never tie (argmin well-defined).

    Plan/scale: the whole race is array codegen (transform + min +
    filter) — zero shuffles; at 10^10 hosts this is a map-only pass
    over the address table."""
    k = F.col("c_custkey")
    hosts = (_t(spark, sf_dir, "customer")
             .select(k.alias("hk"),
                     F.concat(F.lit("h"), k.cast("string"))
                     .alias("host"),
                     (2 + k % 4).cast("int").alias("n_addr")))
    est = ("transform(sequence(0, n_addr - 1), j -> "
           "if((hk + j) % 3 = 0 or hk % 19 = 0, "
           "cast(null as bigint), "
           "j * 250 + 80 + ((hk * 13 + j * 37) % 200)))")
    fam = ("transform(sequence(0, n_addr - 1), j -> "
           "if(hk % 5 = 0, 'v4', if(j % 2 = 0, 'v6', 'v4')))")
    raced = hosts.select(
        "host", "n_addr", "hk",
        F.expr(est).alias("est"), F.expr(fam).alias("fams"))
    winner = F.expr("array_min(est)")
    raced = raced.withColumn("win_ms", winner)
    return (raced.select(
        "host", "n_addr",
        F.coalesce("win_ms", F.lit(-1)).alias("established_ms"),
        F.when(F.col("win_ms").isNull(), F.lit("none"))
        .otherwise(F.expr(
            "element_at(fams, element_at(filter(sequence(1, n_addr), "
            "i -> element_at(est, i) = win_ms), 1))"))
        .alias("winner_family"),
        F.when(F.col("win_ms").isNull(),
               F.col("n_addr").cast("long"))
        .otherwise(F.expr(
            "size(filter(sequence(0, n_addr - 1), "
            "j -> j * 250 < win_ms))").cast("long"))
        .alias("n_started"),
        F.col("win_ms").isNull().cast("int").alias("all_failed")))


ORACLE_FETCH_HAPPY_EYEBALLS = """
WITH hosts AS (
  SELECT c_custkey AS hk, 'h' || c_custkey AS host,
         2 + c_custkey % 4 AS n_addr
  FROM customer),
raced AS (
  SELECT host, n_addr, hk,
         list_transform(range(n_addr), j ->
           CASE WHEN (hk + j) % 3 = 0 OR hk % 19 = 0 THEN NULL
                ELSE j * 250 + 80 + ((hk * 13 + j * 37) % 200) END)
           AS est,
         list_transform(range(n_addr), j ->
           CASE WHEN hk % 5 = 0 THEN 'v4'
                WHEN j % 2 = 0 THEN 'v6' ELSE 'v4' END) AS fams
  FROM hosts),
won AS (
  SELECT host, n_addr, est, fams, list_min(est) AS win_ms
  FROM raced)
SELECT host, CAST(n_addr AS INT) AS n_addr,
       CAST(COALESCE(win_ms, -1) AS BIGINT) AS established_ms,
       CASE WHEN win_ms IS NULL THEN 'none'
            ELSE fams[CAST(list_filter(range(1, n_addr + 1),
                 i -> est[CAST(i AS INT)] = win_ms)[1] AS INT)]
       END AS winner_family,
       CAST(CASE WHEN win_ms IS NULL THEN n_addr
            ELSE len(list_filter(range(n_addr),
                     j -> j * 250 < win_ms)) END AS BIGINT)
         AS n_started,
       CAST(CASE WHEN win_ms IS NULL THEN 1 ELSE 0 END AS INT)
         AS all_failed
FROM won
"""


def q_http_retry_after(spark, sf_dir):
    """``Retry-After`` header interpretation (RFC 9110 §10.2.3) — the
    server-directed side of the politeness loop (429/503 responses
    carry either delta-seconds OR an HTTP-date; a crawler that
    misparses one hammers a throttling host): delta form is matched
    with '^[0-9]+$'; the date form is decoded WITHOUT timestamp
    functions (day-of-month/H/M/S substring arithmetic against the
    fixed response instant 2015-10-21 07:00:00 GMT — locale- and
    session-TZ-proof), malformed/absent headers fall back to the
    default 60 s, and every wait clamps to [0, 300] (the crawler's
    own patience cap).

    Fixture: k%4 -> delta '30+k%600' / strftime'd date at
    +k%900 s / literal 'soon' (malformed) / absent.

    Plan/scale: map-only regexp + arithmetic codegen."""
    k = F.col("o_orderkey")
    delta = (30 + k % 600)
    date_s = F.concat(
        F.lit("Wed, 21 Oct 2015 "),
        F.lpad(((F.lit(25200) + k % 900) / 3600).cast("int")
               .cast("string"), 2, "0"), F.lit(":"),
        F.lpad((((F.lit(25200) + k % 900) / 60).cast("int") % 60)
               .cast("string"), 2, "0"), F.lit(":"),
        F.lpad(((F.lit(25200) + k % 900) % 60).cast("string"), 2, "0"),
        F.lit(" GMT"))
    hdr = (F.when(k % 4 == 0, delta.cast("string"))
           .when(k % 4 == 1, date_s)
           .when(k % 4 == 2, F.lit("soon"))
           .otherwise(F.lit("")))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), hdr.alias("retry_after"))
    h = F.col("retry_after")
    is_num = h.rlike("^[0-9]+$")
    is_date = h.rlike("^[A-Za-z]{3}, [0-9]{2} [A-Za-z]{3} [0-9]{4} "
                      "[0-9]{2}:[0-9]{2}:[0-9]{2} GMT$")
    dd = F.substring(h, 6, 2).cast("long")
    hh = F.substring(h, 18, 2).cast("long")
    mi = F.substring(h, 21, 2).cast("long")
    ss = F.substring(h, 24, 2).cast("long")
    date_wait = ((dd - 21) * 86400 + hh * 3600 + mi * 60 + ss
                 - F.lit(7 * 3600))
    wait = (F.when(is_num, h.cast("long"))
            .when(is_date, date_wait)
            .otherwise(F.lit(60)))
    return rows.select(
        "rid", "retry_after",
        F.when(is_num, "delta-seconds").when(is_date, "http-date")
        .otherwise(F.lit("default")).alias("kind"),
        F.greatest(F.lit(0), F.least(F.lit(300), wait))
        .cast("long").alias("wait_s"))


ORACLE_HTTP_RETRY_AFTER = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 4 = 0
                THEN CAST(30 + o_orderkey % 600 AS VARCHAR)
              WHEN o_orderkey % 4 = 1
                THEN 'Wed, 21 Oct 2015 '
                  || lpad(CAST((25200 + o_orderkey % 900) // 3600
                          AS VARCHAR), 2, '0') || ':'
                  || lpad(CAST(((25200 + o_orderkey % 900) // 60) % 60
                          AS VARCHAR), 2, '0') || ':'
                  || lpad(CAST((25200 + o_orderkey % 900) % 60
                          AS VARCHAR), 2, '0') || ' GMT'
              WHEN o_orderkey % 4 = 2 THEN 'soon'
              ELSE '' END AS retry_after
  FROM orders),
parsed AS (
  SELECT rid, retry_after,
         regexp_matches(retry_after, '^[0-9]+$') AS is_num,
         regexp_matches(retry_after,
           '^[A-Za-z]{3}, [0-9]{2} [A-Za-z]{3} [0-9]{4} '
           || '[0-9]{2}:[0-9]{2}:[0-9]{2} GMT$') AS is_date
  FROM rows_),
waits AS (
  SELECT rid, retry_after,
         CASE WHEN is_num THEN 'delta-seconds'
              WHEN is_date THEN 'http-date'
              ELSE 'default' END AS kind,
         CASE WHEN is_num THEN CAST(retry_after AS BIGINT)
              WHEN is_date THEN
                (CAST(substr(retry_after, 6, 2) AS BIGINT) - 21) * 86400
                + CAST(substr(retry_after, 18, 2) AS BIGINT) * 3600
                + CAST(substr(retry_after, 21, 2) AS BIGINT) * 60
                + CAST(substr(retry_after, 24, 2) AS BIGINT) - 25200
              ELSE 60 END AS wait_raw
  FROM parsed)
SELECT rid, retry_after, kind,
       CAST(greatest(0, least(300, wait_raw)) AS BIGINT) AS wait_s
FROM waits
"""


def q_http_etag_compare(spark, sf_dir):
    """RFC 9110 §8.8.3 ETag comparison — weak vs strong, the part of
    revalidation fetch_revalidate's equality check glosses over: the
    WEAK comparator (opaque tags equal, ``W/`` prefixes ignored)
    decides If-None-Match for ordinary GETs, but a byte-RANGE
    request may only revalidate under the STRONG comparator (both
    tags strong) — serving a range against a weak match can splice
    two different representations. Tags are PARSED (weak flag +
    quoted opaque) and the 304/200 decision branches on request
    type.

    Fixture: server tag strong/weak by k%2 over version k%7; client
    tag strong/weak by k%3 over version (k + k%11)%7; k%13 marks
    range requests.

    Plan/scale: map-only regexp codegen."""
    k = F.col("o_orderkey")
    sv = (k % 7).cast("string")
    cv = ((k + k % 11) % 7).cast("string")
    server = F.concat(F.when(k % 2 == 0, "").otherwise("W/"),
                      F.lit('"v'), sv, F.lit('"'))
    client = F.concat(F.when(k % 3 == 0, "").otherwise("W/"),
                      F.lit('"v'), cv, F.lit('"'))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), server.alias("server_etag"),
        client.alias("client_inm"),
        (k % 13 == 0).cast("int").alias("is_range"))
    s_weak = F.col("server_etag").startswith("W/")
    c_weak = F.col("client_inm").startswith("W/")
    s_op = F.regexp_extract("server_etag", '"([^"]*)"', 1)
    c_op = F.regexp_extract("client_inm", '"([^"]*)"', 1)
    weak_match = (s_op == c_op)
    strong_match = weak_match & ~s_weak & ~c_weak
    return rows.select(
        "rid", "server_etag", "client_inm", "is_range",
        weak_match.cast("int").alias("weak_match"),
        strong_match.cast("int").alias("strong_match"),
        F.when((F.col("is_range") == 1) & strong_match, 304)
        .when((F.col("is_range") == 0) & weak_match, 304)
        .otherwise(F.lit(200)).cast("int").alias("status"))


ORACLE_HTTP_ETAG_COMPARE = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         (CASE WHEN o_orderkey % 2 = 0 THEN '' ELSE 'W/' END)
           || '"v' || (o_orderkey % 7) || '"' AS server_etag,
         (CASE WHEN o_orderkey % 3 = 0 THEN '' ELSE 'W/' END)
           || '"v' || ((o_orderkey + o_orderkey % 11) % 7) || '"'
           AS client_inm,
         CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END AS is_range
  FROM orders),
cmp AS (
  SELECT rid, server_etag, client_inm, is_range,
         regexp_extract(server_etag, '"([^"]*)"', 1)
           = regexp_extract(client_inm, '"([^"]*)"', 1) AS wm,
         regexp_extract(server_etag, '"([^"]*)"', 1)
           = regexp_extract(client_inm, '"([^"]*)"', 1)
           AND server_etag NOT LIKE 'W/%'
           AND client_inm NOT LIKE 'W/%' AS sm
  FROM rows_)
SELECT rid, server_etag, client_inm, CAST(is_range AS INT) AS is_range,
       CAST(wm AS INT) AS weak_match,
       CAST(sm AS INT) AS strong_match,
       CAST(CASE WHEN is_range = 1 AND sm THEN 304
                 WHEN is_range = 0 AND wm THEN 304
                 ELSE 200 END AS INT) AS status
FROM cmp
"""


def q_http_accept_negotiate(spark, sf_dir):
    """RFC 9110 §12 proactive content negotiation — picking the
    representation a crawler should request (an API that can serve
    JSON beats parsing HTML; negotiating wrong wastes a fetch):
    the ``Accept`` header's media ranges parse with their q-values
    in exact MILLIS (q=0.9 -> 900; absent q -> 1000), each offered
    type takes the q of its MOST SPECIFIC matching range (exact >
    type/* > */* — specificity, not max-q, per the RFC), and the
    chosen type is the max-q offer (tie -> type asc); no acceptable
    offer = 406.

    Fixture: 5 Accept shapes (plain, subtype wildcard, full
    wildcard, no-match, near-zero wildcard) x 2 offer sets.

    Plan/scale: all parsing and matching in the array domain — one
    row in, one row out, zero shuffles."""
    k = F.col("o_orderkey")
    accept = (F.when(k % 5 == 0,
                     "text/html;q=0.9, application/json")
              .when(k % 5 == 1,
                    "application/*;q=0.5, text/html;q=0.8")
              .when(k % 5 == 2, "*/*;q=0.1")
              .when(k % 5 == 3, "text/plain")
              .otherwise(F.lit("text/html, */*;q=0.01")))
    offered = (F.when(k % 2 == 0,
                      F.array(F.lit("application/json"),
                              F.lit("text/html")))
               .otherwise(F.array(F.lit("application/xml"),
                                  F.lit("text/html"))))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), accept.alias("accept_hdr"),
        offered.alias("offered"))
    ranges = F.expr(
        "transform(split(accept_hdr, ','), r -> struct("
        "trim(split(trim(r), ';')[0]) as mtype, "
        "if(trim(r) rlike ';q=', "
        "cast(round(cast(regexp_extract(trim(r), "
        "';q=([0-9.]+)', 1) as double) * 1000) as bigint), "
        "1000L) as q))")
    base = rows.select("rid", "accept_hdr", "offered",
                       ranges.alias("ranges"))
    # eff q per offered type: most specific matching range
    eff = F.expr(
        "transform(offered, o -> struct(o as otype, coalesce("
        "array_max(transform(filter(ranges, r -> r.mtype = o), "
        "r -> r.q)), "
        "array_max(transform(filter(ranges, r -> r.mtype = "
        "concat(split(o, '/')[0], '/*')), r -> r.q)), "
        "array_max(transform(filter(ranges, r -> r.mtype = '*/*'), "
        "r -> r.q)), 0L) as q))")
    base = base.select("rid", "accept_hdr", eff.alias("eff"))
    best_q = F.expr("array_max(transform(eff, e -> e.q))")
    base = base.withColumn("best_q", best_q)
    chosen = F.expr(
        "array_min(transform(filter(eff, e -> e.q = best_q), "
        "e -> e.otype))")
    return base.select(
        "rid", "accept_hdr",
        F.when(F.col("best_q") > 0, chosen).otherwise(F.lit(""))
        .alias("chosen_type"),
        F.when(F.col("best_q") > 0, F.col("best_q"))
        .otherwise(F.lit(0)).cast("long").alias("chosen_q_milli"),
        F.when(F.col("best_q") > 0, 200).otherwise(F.lit(406))
        .cast("int").alias("status"))


ORACLE_HTTP_ACCEPT_NEGOTIATE = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 5 = 0
                THEN 'text/html;q=0.9, application/json'
              WHEN o_orderkey % 5 = 1
                THEN 'application/*;q=0.5, text/html;q=0.8'
              WHEN o_orderkey % 5 = 2 THEN '*/*;q=0.1'
              WHEN o_orderkey % 5 = 3 THEN 'text/plain'
              ELSE 'text/html, */*;q=0.01' END AS accept_hdr,
         CASE WHEN o_orderkey % 2 = 0
              THEN ['application/json', 'text/html']
              ELSE ['application/xml', 'text/html'] END AS offered
  FROM orders),
parsed AS (
  SELECT rid, accept_hdr, offered,
         list_transform(string_split(accept_hdr, ','), r ->
           {'mtype': trim(string_split(trim(r), ';')[1]),
            'q': CASE WHEN regexp_matches(trim(r), ';q=')
                 THEN CAST(round(CAST(regexp_extract(trim(r),
                      ';q=([0-9.]+)', 1) AS DOUBLE) * 1000)
                      AS BIGINT)
                 ELSE 1000 END}) AS ranges
  FROM rows_),
eff AS (
  SELECT rid, accept_hdr,
         list_transform(offered, o -> {'otype': o, 'q': COALESCE(
           list_max(list_transform(list_filter(ranges,
             r -> r.mtype = o), r -> r.q)),
           list_max(list_transform(list_filter(ranges,
             r -> r.mtype = string_split(o, '/')[1] || '/*'),
             r -> r.q)),
           list_max(list_transform(list_filter(ranges,
             r -> r.mtype = '*/*'), r -> r.q)), 0)}) AS effs
  FROM parsed),
best AS (
  SELECT rid, accept_hdr, effs,
         list_max(list_transform(effs, e -> e.q)) AS best_q
  FROM eff)
SELECT rid, accept_hdr,
       CASE WHEN best_q > 0
            THEN list_min(list_transform(list_filter(effs,
                 e -> e.q = best_q), e -> e.otype))
            ELSE '' END AS chosen_type,
       CAST(CASE WHEN best_q > 0 THEN best_q ELSE 0 END AS BIGINT)
         AS chosen_q_milli,
       CAST(CASE WHEN best_q > 0 THEN 200 ELSE 406 END AS INT)
         AS status
FROM best
"""


def q_fetch_tls_resume(spark, sf_dir):
    """TLS session-resumption accounting — the fetch fleet's
    handshake economics (a resumed session skips a full RTT of
    handshake; against hosts crawled every few minutes the ticket
    cache pays for itself, against cold hosts it never fires): each
    host's session stream orders by time, a session RESUMES when
    the previous one ended within the ticket lifetime (7200 s), and
    the per-host census prices the saving at 120 ms per resumption.

    Fixture: host h(k%40), session times 900·seq + 50·(k%7) — gaps
    mostly under lifetime, with cold starts at stream heads.

    Plan/scale: one per-host lag window + census on the same key."""
    k = F.col("o_orderkey")
    sessions = _t(spark, sf_dir, "orders").select(
        (k % 40).alias("hn"),
        ((k / 40).cast("long") * 900 + (k % 7) * 50).alias("t"))
    w = Window.partitionBy("hn").orderBy("t")
    marked = (sessions
              .withColumn("prev_t", F.lag("t").over(w))
              .withColumn("resumed",
                          (F.col("prev_t").isNotNull()
                           & (F.col("t") - F.col("prev_t") <= 7200))
                          .cast("long")))
    return (marked.groupBy("hn")
            .agg(F.count("*").cast("long").alias("n_sessions"),
                 F.sum("resumed").cast("long").alias("n_resumed"))
            .select(F.concat(F.lit("h"), F.col("hn").cast("string"))
                    .alias("host"),
                    "n_sessions", "n_resumed",
                    (F.col("n_sessions") - F.col("n_resumed"))
                    .alias("n_full_handshakes"),
                    (F.col("n_resumed") * 120).alias("ms_saved")))


ORACLE_FETCH_TLS_RESUME = """
WITH sessions AS (
  SELECT o_orderkey % 40 AS hn,
         (o_orderkey // 40) * 900 + (o_orderkey % 7) * 50 AS t
  FROM orders),
marked AS (
  SELECT hn, t,
         LAG(t) OVER (PARTITION BY hn ORDER BY t) AS prev_t
  FROM sessions),
flagged AS (
  SELECT hn,
         CASE WHEN prev_t IS NOT NULL AND t - prev_t <= 7200
              THEN 1 ELSE 0 END AS resumed
  FROM marked)
SELECT 'h' || hn AS host,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(sum(resumed) AS BIGINT) AS n_resumed,
       CAST(count(*) - sum(resumed) AS BIGINT) AS n_full_handshakes,
       CAST(sum(resumed) * 120 AS BIGINT) AS ms_saved
FROM flagged GROUP BY hn
"""


def q_http_meta_refresh(spark, sf_dir):
    """META-REFRESH redirect extraction — the HTML-level redirect the
    HTTP-level rows (url_redirect_resolve, url_redirect_loops) never
    see: <meta http-equiv="refresh" content="N;url=..."> is how parked
    pages, interstitials, and soft-moved sites redirect without a 3xx,
    and a frontier that ignores it crawls the shell and misses the
    content. Pages are synthesized four ways (immediate redirect,
    delayed redirect, bare reload without url=, no meta at all); the
    extraction is one case-insensitive regexp over the document —
    pure codegen, fused into the scan — emitting (url, target, delay)
    edges plus a per-class census column."""
    k = F.col("doc_id")
    url = F.concat(F.lit("http://s"), (k % 30).cast("string"),
                   F.lit(".onion/p"), k.cast("string"))
    target = F.concat(F.lit("http://s"), (k % 30).cast("string"),
                      F.lit(".onion/new"), (k % 50).cast("string"))
    html = (F.when(k % 4 == 0, F.concat(
                F.lit('<html><head><META HTTP-EQUIV="Refresh" '
                      'CONTENT="0;URL='), target,
                F.lit('"></head><body>moved</body></html>')))
            .when(k % 4 == 1, F.concat(
                F.lit('<html><head><meta http-equiv="refresh" '
                      'content="5; url='), target,
                F.lit('"></head><body>wait</body></html>')))
            .when(k % 4 == 2, F.lit(
                '<html><head><meta http-equiv="refresh" '
                'content="30"></head><body>reload</body></html>'))
            .otherwise(F.lit("<html><body>plain</body></html>")))
    pages = (_t(spark, sf_dir, "documents")
             .select(url.alias("url"), html.alias("html")))
    content = F.regexp_extract(
        F.col("html"),
        r'(?i)<meta\s+http-equiv="refresh"\s+content="([^"]*)"', 1)
    delay = F.regexp_extract(content, r"^\s*(\d+)", 1)
    tgt = F.regexp_extract(content, r"(?i);\s*url=([^\"]+)", 1)
    out = (pages
           .withColumn("refresh_delay_s",
                       F.when(delay == "", F.lit(-1))
                       .otherwise(delay.cast("long")))
           .withColumn("refresh_target", tgt)
           .withColumn("refresh_class",
                       F.when(content == "", "none")
                       .when(tgt == "", "reload_only")
                       .when(F.col("refresh_delay_s") == 0, "immediate")
                       .otherwise("delayed")))
    return (out.select("url", "refresh_class", "refresh_delay_s",
                       "refresh_target")
            .orderBy("url"))


ORACLE_HTTP_META_REFRESH = """
WITH pages AS (
  SELECT 'http://s' || (doc_id % 30) || '.onion/p' || doc_id AS url,
         doc_id % 4 AS shape,
         'http://s' || (doc_id % 30) || '.onion/new' || (doc_id % 50)
           AS target
  FROM documents
)
SELECT url,
       CASE shape WHEN 0 THEN 'immediate' WHEN 1 THEN 'delayed'
                  WHEN 2 THEN 'reload_only' ELSE 'none' END
         AS refresh_class,
       CAST(CASE shape WHEN 0 THEN 0 WHEN 1 THEN 5
                       WHEN 2 THEN 30 ELSE -1 END AS BIGINT)
         AS refresh_delay_s,
       CASE WHEN shape IN (0, 1) THEN target ELSE '' END
         AS refresh_target
FROM pages
ORDER BY url
"""
