"""Registry family: Robots & politeness (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_robots_admission(spark, sf_dir):
    """ST3 robots admission as a driver CORRECTNESS row (VERDICT r2 #9):
    candidates synthesized from orders (4 path shapes incl. a pathless
    URL), a broadcast robots table over 40 hosts (two disallow sets, one
    host in three unlisted); a candidate is dropped iff its path starts
    with any disallowed prefix of its host."""
    from genesis_spark.crawler.politeness import apply_robots

    k = F.col("o_orderkey")
    path = (F.when(k % 4 == 0, F.concat(F.lit("/pub/"), k.cast("string")))
            .when(k % 4 == 1, F.concat(F.lit("/private/"), k.cast("string")))
            .when(k % 4 == 2, F.concat(F.lit("/admin/x"), k.cast("string")))
            .otherwise(F.lit("")))
    cand = _t(spark, sf_dir, "orders").select(
        k.alias("o_orderkey"),
        F.concat(F.lit("h"), (k % 40).cast("string")).alias("host_key"),
        F.concat(F.lit("http://h"), (k % 40).cast("string"),
                 F.lit(".onion"), path).alias("url"))
    r = F.col("id")
    robots = (spark.range(40).filter(r % 3 < 2).select(
        F.concat(F.lit("h"), r.cast("string")).alias("host_key"),
        F.when(r % 3 == 0, F.array(F.lit("/private/"), F.lit("/admin/")))
        .otherwise(F.array(F.lit("/admin/"))).alias("disallow")))
    return apply_robots(cand, robots).select("o_orderkey", "host_key", "url")


ORACLE_ROBOTS_ADMISSION = """
WITH cand AS (
  SELECT o_orderkey,
         'h' || (o_orderkey % 40) AS host_key,
         CASE o_orderkey % 4
            WHEN 0 THEN '/pub/' || o_orderkey
            WHEN 1 THEN '/private/' || o_orderkey
            WHEN 2 THEN '/admin/x' || o_orderkey
            ELSE '' END AS path
  FROM orders
), rob AS (
  SELECT 'h' || r AS host_key,
         CASE WHEN r % 3 = 0 THEN ['/private/', '/admin/']
              ELSE ['/admin/'] END AS disallow
  FROM range(40) t(r) WHERE r % 3 < 2
)
SELECT o_orderkey, host_key,
       'http://' || host_key || '.onion' || path AS url
FROM cand LEFT JOIN rob USING (host_key)
WHERE NOT coalesce(
  len(list_filter(disallow, p -> path LIKE p || '%')) > 0, FALSE)
"""


def q_robots_rfc(spark, sf_dir):
    """RFC 9309 robots.txt end-to-end: raw per-host robots.txt TEXT (five
    shapes, comments/CRLF/multi-agent groups/wildcards) -> codegen parser
    (group assembly via windows, agent-specific > '*' selection) ->
    longest-match admission (longest rule path wins, Allow wins ties).
    All five shapes and both outcomes land in the value hash."""
    from genesis_spark.crawler.politeness import admit_rfc, parse_robots_rules

    r = F.col("id")
    shape = F.when(r % 5 == 0, F.lit(_ROBOTS_SHAPES[0]))
    for i in range(1, 5):
        shape = shape.when(r % 5 == i, F.lit(_ROBOTS_SHAPES[i]))
    robots = spark.range(30).select(
        F.concat(F.lit("h"), r.cast("string")).alias("host_key"),
        shape.alias("robots_txt"))
    rules = parse_robots_rules(robots, agent="genesis")

    k = F.col("o_orderkey")
    path = (F.when(k % 5 == 0, F.concat(F.lit("/private/pub/a"),
                                        k.cast("string")))
            .when(k % 5 == 1, F.concat(F.lit("/private/x"), k.cast("string")))
            .when(k % 5 == 2, F.concat(F.lit("/admin/y"), k.cast("string")))
            .when(k % 5 == 3, F.concat(F.lit("/files/f"), k.cast("string"),
                                       F.lit(".zip")))
            .otherwise(F.concat(F.lit("/files/f"), k.cast("string"),
                                F.lit(".zipx"))))
    cand = _t(spark, sf_dir, "orders").select(
        k.alias("o_orderkey"),
        F.concat(F.lit("h"), (k % 30).cast("string")).alias("host_key"),
        path.alias("path"))
    return (admit_rfc(cand, rules, key_cols=["o_orderkey"])
            .select("o_orderkey", "host_key", "path", "admitted"))

ORACLE_ROBOTS_RFC = f"""
WITH robots AS (
  SELECT 'h' || r AS host_key,
         CASE r % 5 {_ROBOTS_SHAPE_SQL} END AS robots_txt
  FROM range(30) t(r)
),
lines0 AS (
  SELECT host_key,
         string_split_regex(robots_txt, chr(13) || '?' || chr(10)) AS ls
  FROM robots
),
lines AS (
  SELECT host_key, i AS ln,
         trim(regexp_replace(ls[i + 1], '#.*', '')) AS line
  FROM lines0, unnest(range(len(ls))) u(i)
),
fields AS (
  SELECT host_key, ln,
         lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS field,
         trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS value
  FROM lines WHERE line LIKE '%:%'
),
rel AS (
  SELECT * FROM fields WHERE field IN ('user-agent', 'allow', 'disallow')
),
newg AS (
  SELECT host_key, ln, field, value,
         CASE WHEN field = 'user-agent' AND coalesce(lag(field) OVER
               (PARTITION BY host_key ORDER BY ln), 'x') <> 'user-agent'
              THEN 1 ELSE 0 END AS is_new
  FROM rel
),
grp AS (
  SELECT host_key, ln, field, value,
         sum(is_new) OVER (PARTITION BY host_key ORDER BY ln) AS grp_id
  FROM newg
),
gflag AS (
  SELECT host_key, grp_id,
         max(CASE WHEN field = 'user-agent' AND lower(value) = 'genesis'
                  THEN 1 ELSE 0 END) AS m_specific,
         max(CASE WHEN field = 'user-agent' AND value = '*'
                  THEN 1 ELSE 0 END) AS m_star
  FROM grp WHERE grp_id >= 1 GROUP BY host_key, grp_id
),
hflag AS (
  SELECT host_key, max(m_specific) AS has_specific FROM gflag
  GROUP BY host_key
),
rules AS (
  SELECT g.host_key, (g.field = 'allow') AS allow, g.value AS rpath,
         length(g.value) AS plen
  FROM grp g JOIN gflag f USING (host_key, grp_id)
       JOIN hflag h USING (host_key)
  WHERE g.field IN ('allow', 'disallow') AND g.value <> ''
    AND g.grp_id >= 1
    AND ((h.has_specific = 1 AND f.m_specific = 1)
         OR (h.has_specific = 0 AND f.m_star = 1))
),
rx AS (
  SELECT host_key, allow, plen,
         '^' ||
         replace(regexp_replace(
            CASE WHEN rpath LIKE '%$' THEN substr(rpath, 1, plen - 1)
                 ELSE rpath END,
            '([.^$+?(){{}}\\[\\]|\\\\])', '\\\\\\1', 'g'), '*', '.*')
         || CASE WHEN rpath LIKE '%$' THEN '$' ELSE '' END AS pat
  FROM rules
),
cand AS (
  SELECT o_orderkey, 'h' || (o_orderkey % 30) AS host_key,
         CASE o_orderkey % 5
           WHEN 0 THEN '/private/pub/a' || o_orderkey
           WHEN 1 THEN '/private/x' || o_orderkey
           WHEN 2 THEN '/admin/y' || o_orderkey
           WHEN 3 THEN '/files/f' || o_orderkey || '.zip'
           ELSE '/files/f' || o_orderkey || '.zipx' END AS path
  FROM orders
),
m AS (
  SELECT c.o_orderkey, c.host_key, c.path,
         max(struct_pack(plen := r.plen, allow := r.allow)) AS best
  FROM cand c JOIN rx r ON c.host_key = r.host_key
   AND regexp_matches(c.path, r.pat)
  GROUP BY c.o_orderkey, c.host_key, c.path
)
SELECT c.o_orderkey, c.host_key, c.path,
       coalesce(m.best.allow, TRUE) AS admitted
FROM cand c LEFT JOIN m USING (o_orderkey, host_key, path)
"""


def q_robots_directives(spark, sf_dir):
    """Crawl-delay + Sitemap directive extraction from raw robots.txt
    (the politeness knobs next to the RFC 9309 rules): group-scoped
    Crawl-delay with specific-beats-* selection and min-wins merge,
    file-wide Sitemap collection. Five shapes cover: plain * delay,
    specific-beats-* (0.5 s -> 500 ms), an inapplicable foreign group
    (delay NULL but sitemaps still collected), an unparseable value
    (TRY_CAST -> NULL), and an empty file."""
    from genesis_spark.crawler.politeness import parse_robots_directives

    r = F.col("id")
    shape = F.when(r % 5 == 0, F.lit(_ROBOTS_DELAY_SHAPES[0]))
    for i in range(1, 5):
        shape = shape.when(r % 5 == i, F.lit(_ROBOTS_DELAY_SHAPES[i]))
    robots = spark.range(30).select(
        F.concat(F.lit("h"), r.cast("string")).alias("host_key"),
        shape.alias("robots_txt"))
    out = parse_robots_directives(robots, agent="genesis")
    # no-delay hosts sentinel to -1: the value-hash compare is NULL-averse
    # (same convention as events_rollup's grouping-set keys)
    return out.withColumn(
        "crawl_delay_ms",
        F.coalesce("crawl_delay_ms", F.lit(-1).cast("long")))


ORACLE_ROBOTS_DIRECTIVES = f"""
WITH robots AS (
  SELECT 'h' || r AS host_key,
         CASE r % 5 {_ROBOTS_DELAY_SHAPE_SQL} END AS robots_txt
  FROM range(30) t(r)
),
lines0 AS (
  SELECT host_key,
         string_split_regex(robots_txt, chr(13) || '?' || chr(10)) AS ls
  FROM robots
),
lines AS (
  SELECT host_key, i AS ln,
         trim(regexp_replace(ls[i + 1], '#.*', '')) AS line
  FROM lines0, unnest(range(len(ls))) u(i)
),
fields AS (
  SELECT host_key, ln,
         lower(trim(regexp_extract(line, '^([^:]+):', 1))) AS field,
         trim(regexp_extract(line, '^[^:]+:(.*)$', 1)) AS value
  FROM lines WHERE line LIKE '%:%'
),
sm AS (
  SELECT host_key, CAST(count(*) AS INT) AS n_sitemaps,
         string_agg(value, '|' ORDER BY value) AS sitemaps
  FROM fields WHERE field = 'sitemap' GROUP BY host_key
),
rel AS (
  SELECT * FROM fields WHERE field IN ('user-agent', 'crawl-delay')
),
newg AS (
  SELECT host_key, ln, field, value,
         CASE WHEN field = 'user-agent' AND coalesce(lag(field) OVER
               (PARTITION BY host_key ORDER BY ln), 'x') <> 'user-agent'
              THEN 1 ELSE 0 END AS is_new
  FROM rel
),
grp AS (
  SELECT host_key, ln, field, value,
         sum(is_new) OVER (PARTITION BY host_key ORDER BY ln) AS grp_id
  FROM newg
),
gflag AS (
  SELECT host_key, grp_id,
         max(CASE WHEN field = 'user-agent' AND lower(value) = 'genesis'
                  THEN 1 ELSE 0 END) AS m_specific,
         max(CASE WHEN field = 'user-agent' AND value = '*'
                  THEN 1 ELSE 0 END) AS m_star
  FROM grp WHERE grp_id >= 1 GROUP BY host_key, grp_id
),
hflag AS (
  SELECT host_key, max(m_specific) AS has_specific FROM gflag
  GROUP BY host_key
),
del AS (
  SELECT g.host_key,
         CAST(round(min(TRY_CAST(g.value AS DOUBLE)) * 1000) AS BIGINT)
           AS crawl_delay_ms
  FROM grp g JOIN gflag f USING (host_key, grp_id)
       JOIN hflag h USING (host_key)
  WHERE g.field = 'crawl-delay' AND g.grp_id >= 1
    AND TRY_CAST(g.value AS DOUBLE) IS NOT NULL
    AND ((h.has_specific = 1 AND f.m_specific = 1)
         OR (h.has_specific = 0 AND f.m_star = 1))
  GROUP BY g.host_key
)
SELECT r.host_key,
       CAST(coalesce(d.crawl_delay_ms, -1) AS BIGINT) AS crawl_delay_ms,
       coalesce(sm.n_sitemaps, 0) AS n_sitemaps,
       coalesce(sm.sitemaps, '') AS sitemaps
FROM robots r
LEFT JOIN del d USING (host_key)
LEFT JOIN sm USING (host_key)
"""


def q_politeness_audit(spark, sf_dir):
    """Politeness-violation audit over a fetch log — the compliance
    check behind the politeness contract (scheduling politely is
    necessary, PROVING the fleet fetched politely is what this row
    does): per host, consecutive-fetch gaps vs the host's crawl delay
    (the frontier_schedule fixture rule 500 + (host % 5) * 250 ms);
    count violations (gap < delay), the worst (minimum) gap, and the
    violation share in ppm.

    Deterministic fetch log: fetch_at_ms = (o_orderkey % 100000) * 37 —
    a scrambled-but-exact timeline with collisions broken by seq.

    Plan/scale: one lag window per host + one partial agg — the
    heartbeat-gap shape pointed at the politeness contract."""
    k = F.col("o_orderkey")
    host_num = (F.col("o_custkey") % 40).cast("int")
    log = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), host_num.cast("string")).alias("host_key"),
        ((host_num % 5) * 250 + 500).cast("long").alias("delay_ms"),
        (k % 100000 * 37).cast("long").alias("fetch_at_ms"),
        k.alias("seq"))
    w = Window.partitionBy("host_key").orderBy("fetch_at_ms", "seq")
    gapped = log.withColumn(
        "gap_ms", F.col("fetch_at_ms") - F.lag("fetch_at_ms").over(w))
    agg = gapped.groupBy("host_key").agg(
        F.max("delay_ms").alias("delay_ms"),
        F.count("*").cast("long").alias("n_fetches"),
        F.sum((F.col("gap_ms") < F.col("delay_ms")).cast("long"))
        .cast("long").alias("n_violations"),
        F.min("gap_ms").cast("long").alias("min_gap_ms"))
    return agg.select(
        "host_key", F.col("delay_ms").cast("long").alias("delay_ms"),
        "n_fetches", "n_violations", "min_gap_ms",
        F.expr("n_violations * 1000000 DIV greatest(n_fetches - 1, 1)")
        .cast("long").alias("violation_ppm"))


ORACLE_POLITENESS_AUDIT = """
WITH log AS (
  SELECT 'h' || (o_custkey % 40) AS host_key,
         CAST(((o_custkey % 40) % 5) * 250 + 500 AS BIGINT) AS delay_ms,
         CAST(o_orderkey % 100000 * 37 AS BIGINT) AS fetch_at_ms,
         o_orderkey AS seq
  FROM orders),
gapped AS (
  SELECT host_key, delay_ms,
         fetch_at_ms - lag(fetch_at_ms) OVER (
           PARTITION BY host_key ORDER BY fetch_at_ms, seq) AS gap_ms
  FROM log),
agg AS (
  SELECT host_key, max(delay_ms) AS delay_ms,
         CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN gap_ms < delay_ms THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations,
         CAST(min(gap_ms) AS BIGINT) AS min_gap_ms
  FROM gapped GROUP BY host_key)
SELECT host_key, CAST(delay_ms AS BIGINT) AS delay_ms, n_fetches,
       n_violations, min_gap_ms,
       CAST(n_violations * 1000000 // greatest(n_fetches - 1, 1)
            AS BIGINT) AS violation_ppm
FROM agg
"""


def q_robots_meta(spark, sf_dir):
    """Page-level robots directives — the indexing/admission layer
    robots.txt (robots_rfc) cannot express: ``<meta name=robots>`` in
    the page head plus the ``X-Robots-Tag`` response header, combined
    most-restrictive-wins (Google's documented semantics; ``none`` =
    noindex + nofollow). A crawler that ignores nofollow pages leaks
    their outlinks into the frontier; one that ignores noindex ships
    opted-out pages into the corpus — this census is the audit for
    both.

    Exactness: both engines parse the SAME synthesized HTML/header
    strings with the same case-insensitive regex and token-exact
    directive matching (split + trim, never substring — 'nofollowed'
    can't false-positive); counts and ppm are exact integers.

    Plan/scale: directive extraction is a zero-exchange map over the
    page stream; the rollup is ONE map-side-combinable census agg
    into |hosts| rows."""
    k = F.col("o_orderkey")
    m, h = k % 8, k % 5
    meta = (F.when(m == 0, F.lit(
        '<meta name="robots" content="noindex, follow">'))
        .when(m == 1, F.lit('<meta name="robots" content="index, nofollow">'))
        .when(m == 2, F.lit('<meta name="robots" content="none">'))
        .when(m == 3, F.lit('<meta name="ROBOTS" content="NOINDEX">'))
        .when(m == 4, F.lit('<meta name="robots" content="noarchive">'))
        .otherwise(F.lit("")))
    html = F.concat(F.lit("<html><head>"), meta, F.lit("</head><body>p"),
                    k.cast("string"), F.lit("</body></html>"))
    header = (F.when(h == 0, F.lit("X-Robots-Tag: nofollow"))
              .when(h == 1, F.lit("X-Robots-Tag: noindex, noarchive"))
              .otherwise(F.lit("")))
    pages = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 25).cast("string")).alias("host"),
        html.alias("html"), header.alias("header"),
        (k % 12).cast("long").alias("n_links"))
    meta_dirs = F.lower(F.regexp_extract(
        "html", '(?i)<meta name="robots" content="([^"]*)"', 1))
    hdr_dirs = F.lower(F.regexp_extract(
        "header", r"(?i)^x-robots-tag:\s*(.*)$", 1))
    toks = F.expr("transform(split(concat(_md, ',', _hd), ','), "
                  "x -> trim(x))")
    flagged = (pages
               .withColumn("_md", meta_dirs).withColumn("_hd", hdr_dirs)
               .withColumn("_t", toks)
               .withColumn("noindex",
                           (F.array_contains("_t", "noindex")
                            | F.array_contains("_t", "none")).cast("int"))
               .withColumn("nofollow",
                           (F.array_contains("_t", "nofollow")
                            | F.array_contains("_t", "none")).cast("int"))
               .withColumn("noarchive",
                           F.array_contains("_t", "noarchive").cast("int")))
    return (flagged.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum("noindex").cast("long").alias("n_noindex"),
                 F.sum("nofollow").cast("long").alias("n_nofollow"),
                 F.sum("noarchive").cast("long").alias("n_noarchive"),
                 F.sum(F.when(F.col("nofollow") == 1, F.col("n_links"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("links_lost"))
            .withColumn("noindex_ppm",
                        F.expr("n_noindex * 1000000 DIV n_pages")
                        .cast("long")))


ORACLE_ROBOTS_META = """
WITH p AS (
  SELECT 'h' || (o_orderkey % 25) AS host,
         '<html><head>' ||
         CASE o_orderkey % 8
           WHEN 0 THEN '<meta name="robots" content="noindex, follow">'
           WHEN 1 THEN '<meta name="robots" content="index, nofollow">'
           WHEN 2 THEN '<meta name="robots" content="none">'
           WHEN 3 THEN '<meta name="ROBOTS" content="NOINDEX">'
           WHEN 4 THEN '<meta name="robots" content="noarchive">'
           ELSE '' END
         || '</head><body>p' || o_orderkey || '</body></html>' AS html,
         CASE o_orderkey % 5
           WHEN 0 THEN 'X-Robots-Tag: nofollow'
           WHEN 1 THEN 'X-Robots-Tag: noindex, noarchive'
           ELSE '' END AS header,
         CAST(o_orderkey % 12 AS BIGINT) AS n_links
  FROM orders),
d AS (
  SELECT host, n_links,
         list_transform(string_split(
           lower(regexp_extract(html,
             '(?i)<meta name="robots" content="([^"]*)"', 1))
           || ',' ||
           lower(regexp_extract(header,
             '(?i)^x-robots-tag:\\s*(.*)$', 1)), ','),
           x -> trim(x)) AS t
  FROM p),
f AS (
  SELECT host, n_links,
         CASE WHEN list_contains(t, 'noindex')
                OR list_contains(t, 'none') THEN 1 ELSE 0 END AS noindex,
         CASE WHEN list_contains(t, 'nofollow')
                OR list_contains(t, 'none') THEN 1 ELSE 0 END AS nofollow,
         CASE WHEN list_contains(t, 'noarchive') THEN 1 ELSE 0 END
           AS noarchive
  FROM d)
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(noindex) AS BIGINT) AS n_noindex,
       CAST(sum(nofollow) AS BIGINT) AS n_nofollow,
       CAST(sum(noarchive) AS BIGINT) AS n_noarchive,
       CAST(sum(CASE WHEN nofollow = 1 THEN n_links ELSE 0 END) AS BIGINT)
         AS links_lost,
       CAST(sum(noindex) * 1000000 // count(*) AS BIGINT) AS noindex_ppm
FROM f GROUP BY host
"""


def q_politeness_violations(spark, sf_dir):
    """Politeness-compliance audit over the fetch log — the check that
    the scheduler's declared per-host crawl delay was actually honored
    by the fetch layer (ST3's pacing contract, audited after the
    fact): per host, consecutive fetch gaps under the declared delay
    are violations. The ops row a crawl operator reads after every
    incident report from a webmaster.

    Exactness: integer millisecond timestamps, full (ts, fetch_id)
    tie-break so both engines see the same fetch order; a host's first
    fetch has no gap and is never a violation; single-fetch hosts get
    the -1 sentinel min-gap (NULL would break the order-insensitive
    hash).

    Plan/scale: ONE per-host window pass over the fetch log (the same
    shuffle the scheduler already pays), then a map-side-combinable
    census into |hosts| rows."""
    li = _t(spark, sf_dir, "lineitem")
    host_id = F.col("l_orderkey") % 30
    fetches = li.select(
        F.concat(F.lit("h"), host_id.cast("string")).alias("host"),
        (500 * (1 + host_id % 4)).cast("long").alias("delay_ms"),
        ((F.col("l_partkey") * 137 + F.col("l_suppkey") * 11
          + F.col("l_linenumber")) % 600000).cast("long").alias("ts_ms"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long").alias("fetch_id"))
    w = Window.partitionBy("host").orderBy(F.asc("ts_ms"),
                                           F.asc("fetch_id"))
    gaps = (fetches
            .withColumn("gap_ms",
                        F.col("ts_ms") - F.lag("ts_ms").over(w)))
    return (gaps.groupBy("host", "delay_ms")
            .agg(F.count(F.lit(1)).cast("long").alias("n_fetches"),
                 F.sum(F.when(F.col("gap_ms") < F.col("delay_ms"), 1)
                       .otherwise(0)).cast("long").alias("n_violations"),
                 F.coalesce(F.min("gap_ms"), F.lit(-1).cast("long"))
                 .cast("long").alias("min_gap_ms"))
            .withColumn("violation_ppm",
                        F.expr("n_violations * 1000000 DIV n_fetches")
                        .cast("long")))


ORACLE_POLITENESS_VIOLATIONS = """
WITH f AS (
  SELECT 'h' || (l_orderkey % 30) AS host,
         CAST(500 * (1 + (l_orderkey % 30) % 4) AS BIGINT) AS delay_ms,
         (l_partkey * 137 + l_suppkey * 11 + l_linenumber) % 600000 AS ts_ms,
         l_orderkey * 10 + l_linenumber AS fetch_id
  FROM lineitem),
g AS (
  SELECT host, delay_ms,
         ts_ms - lag(ts_ms) OVER (PARTITION BY host
                                  ORDER BY ts_ms ASC, fetch_id ASC)
           AS gap_ms
  FROM f)
SELECT host, delay_ms, CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(sum(CASE WHEN gap_ms < delay_ms THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violations,
       CAST(coalesce(min(gap_ms), -1) AS BIGINT) AS min_gap_ms,
       CAST(sum(CASE WHEN gap_ms < delay_ms THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS violation_ppm
FROM g GROUP BY host, delay_ms
"""


def q_robots_conflict(spark, sf_dir):
    """robots.txt vs page-directive CONFLICT census — the two
    admission layers can disagree, and each disagreement class is an
    operational smell: a crawlable-but-noindex page is a WASTED FETCH
    (the crawler spends budget on a page that opted out of the index),
    a disallowed-but-indexable page is INVISIBLE CONTENT (the site
    wants it indexed but its own robots.txt blocks the fetch). The
    audit a crawl operator sends back to webmasters.

    Exactness: both layers are closed-form over the same keys (host
    tier decides the /priv disallow; page mods decide path and meta
    noindex); counts and ppm are exact integers.

    Plan/scale: per-page classification is a zero-exchange map (the
    robots decision is a broadcastable per-host bit at production
    scale — same shape as the soft-404 probe join); census into
    |hosts| rows."""
    k = F.col("o_orderkey")
    host_id = k % 20
    path = F.when(k % 3 == 0,
                  F.concat(F.lit("/priv/p"), k.cast("string"))) \
            .otherwise(F.concat(F.lit("/p"), k.cast("string")))
    noindex = (F.expr("o_orderkey DIV 20") % 4 == 0).cast("int")
    disallow_priv = (host_id % 5 == 0).cast("int")
    pages = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), host_id.cast("string")).alias("host"),
        path.alias("path"), noindex.alias("noindex"),
        disallow_priv.alias("disallow_priv"))
    crawlable = ~((F.col("disallow_priv") == 1)
                  & F.col("path").startswith("/priv/"))
    cls = (F.when(crawlable & (F.col("noindex") == 1), "fetch_wasted")
           .when(~crawlable & (F.col("noindex") == 0),
                 "blocked_indexable")
           .otherwise("consistent"))
    return (pages.select("host", cls.alias("cls"))
            .groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum((F.col("cls") == "fetch_wasted").cast("int"))
                 .cast("long").alias("n_fetch_wasted"),
                 F.sum((F.col("cls") == "blocked_indexable").cast("int"))
                 .cast("long").alias("n_blocked_indexable"))
            .withColumn("conflict_ppm", F.expr(
                "(n_fetch_wasted + n_blocked_indexable) * 1000000 "
                "DIV n_pages").cast("long")))


ORACLE_ROBOTS_CONFLICT = """
WITH p AS (
  SELECT 'h' || (o_orderkey % 20) AS host,
         CASE WHEN o_orderkey % 3 = 0 THEN '/priv/p' || o_orderkey
              ELSE '/p' || o_orderkey END AS path,
         CASE WHEN (o_orderkey // 20) % 4 = 0 THEN 1 ELSE 0 END AS noindex,
         CASE WHEN (o_orderkey % 20) % 5 = 0 THEN 1 ELSE 0 END
           AS disallow_priv
  FROM orders),
c AS (
  SELECT host,
         CASE WHEN NOT (disallow_priv = 1 AND path LIKE '/priv/%')
                   AND noindex = 1 THEN 'fetch_wasted'
              WHEN (disallow_priv = 1 AND path LIKE '/priv/%')
                   AND noindex = 0 THEN 'blocked_indexable'
              ELSE 'consistent' END AS cls
  FROM p)
SELECT host, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN cls = 'fetch_wasted' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_fetch_wasted,
       CAST(sum(CASE WHEN cls = 'blocked_indexable' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_blocked_indexable,
       CAST((sum(CASE WHEN cls = 'fetch_wasted' THEN 1 ELSE 0 END)
             + sum(CASE WHEN cls = 'blocked_indexable' THEN 1 ELSE 0 END))
            * 1000000 // count(*) AS BIGINT) AS conflict_ppm
FROM c GROUP BY host
"""


def q_robots_sitemap_xref(spark, sf_dir):
    """ROBOTS -> SITEMAP discovery cross-reference — robots.txt
    'Sitemap:' directives are the polite high-yield discovery
    channel (they advertise exactly what the operator wants
    crawled), and the convention probe (/sitemap.xml) is the
    fallback; the xref tells the seeder which hosts expose which
    channel. Per host: sitemaps declared in robots, whether the
    convention probe hits, the discovery class (both /
    robots_only / probe_only / none), and the seeder's source
    decision.

    Fixture: every 4th host declares one robots sitemap (every
    8th declares two); every 5th answers the convention probe.

    Plan/scale: distinct hosts then row-local regexp count —
    census-sized."""
    k = F.col("o_orderkey")
    h = (k % 50).cast("long")
    hosts = (_t(spark, sf_dir, "orders")
             .select(h.alias("hid")).distinct())
    robots = (F.when(F.col("hid") % 8 == 0,
                     F.lit("User-agent: *\nSitemap: /s1.xml\n"
                           "Sitemap: /s2.xml"))
              .when(F.col("hid") % 4 == 0,
                    F.lit("User-agent: *\nSitemap: /sitemap.xml"))
              .otherwise(F.lit("User-agent: *\nDisallow: /tmp")))
    d = (hosts.select(
        F.concat(F.lit("h"), F.col("hid").cast("string"))
        .alias("host_key"),
        robots.alias("robots_txt"),
        (F.col("hid") % 5 == 0).cast("int").alias("probe_hit")))
    n_rs = F.expr("size(regexp_extract_all(robots_txt, "
                  "'Sitemap:', 0))")
    out = d.withColumn("n_robots_sitemaps", n_rs.cast("long"))
    cls = (F.when((F.col("n_robots_sitemaps") > 0)
                  & (F.col("probe_hit") == 1), F.lit("both"))
           .when(F.col("n_robots_sitemaps") > 0, F.lit("robots_only"))
           .when(F.col("probe_hit") == 1, F.lit("probe_only"))
           .otherwise(F.lit("none")))
    return (out.select("host_key", "n_robots_sitemaps", "probe_hit")
            .withColumn("discovery_class", cls)
            .withColumn("seed_source",
                        F.when(F.col("n_robots_sitemaps") > 0,
                               F.lit("robots_directive"))
                        .when(F.col("probe_hit") == 1,
                              F.lit("convention_probe"))
                        .otherwise(F.lit("link_discovery_only"))))


ORACLE_ROBOTS_SITEMAP_XREF = """
WITH hosts AS (SELECT DISTINCT o_orderkey % 50 AS hid FROM orders),
d AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host_key,
         CAST(CASE WHEN hid % 8 = 0 THEN 2
                   WHEN hid % 4 = 0 THEN 1
                   ELSE 0 END AS BIGINT) AS n_robots_sitemaps,
         CAST(CASE WHEN hid % 5 = 0 THEN 1 ELSE 0 END AS INT)
           AS probe_hit
  FROM hosts)
SELECT host_key, n_robots_sitemaps, probe_hit,
       CASE WHEN n_robots_sitemaps > 0 AND probe_hit = 1 THEN 'both'
            WHEN n_robots_sitemaps > 0 THEN 'robots_only'
            WHEN probe_hit = 1 THEN 'probe_only'
            ELSE 'none' END AS discovery_class,
       CASE WHEN n_robots_sitemaps > 0 THEN 'robots_directive'
            WHEN probe_hit = 1 THEN 'convention_probe'
            ELSE 'link_discovery_only' END AS seed_source
FROM d
"""


def q_robots_fetch_policy(spark, sf_dir):
    """ROBOTS.TXT fetch-status policy (RFC 9309 §2.3.1) — the rules
    rows (robots_rfc/robots_admission) assume a parsed file, but the
    spec also fixes what a crawler MUST do when the fetch itself
    fails: 400-499 means no usable robots -> crawl is allowed
    (§2.3.1.3 "Unavailable"); 500-599 means the server could not
    answer -> MUST assume complete disallow (§2.3.1.4
    "Unreachable"), except a cached copy younger than 24 hours MAY
    be used instead (§2.4 caching). Per (host, candidate path): the
    fetch status, the policy branch taken, and admission under a
    'Disallow: /private' live/cached rule.

    Fixture: every 9th host 503, every 7th 404, every 11th 403,
    else 200; cache age cycles 0/20/40 h BY hid//9 (hid%3 would be
    constant-0 on the 9-multiples) so some 5xx hosts hold a fresh
    cache and some are hard-down.

    Plan/scale: distinct hosts x 3-path explode, row-local policy
    codegen — census-sized, no shuffle after the distinct."""
    hosts = (_t(spark, sf_dir, "orders")
             .select((F.col("o_orderkey") % 50).cast("long").alias("hid"))
             .distinct())
    status = (F.when(F.col("hid") % 9 == 0, F.lit(503))
              .when(F.col("hid") % 7 == 0, F.lit(404))
              .when(F.col("hid") % 11 == 0, F.lit(403))
              .otherwise(F.lit(200)))
    d = (hosts.select(
        F.concat(F.lit("h"), F.col("hid").cast("string")).alias("host_key"),
        status.cast("int").alias("status"),
        (((F.col("hid") / 9).cast("long") % 3) * 20)
        .cast("long").alias("cache_age_h"))
        .withColumn("path", F.explode(F.array(
            F.lit("/"), F.lit("/private/acct"), F.lit("/pub/page")))))
    policy = (F.when((F.col("status") >= 200) & (F.col("status") < 300),
                     F.lit("parse_live"))
              .when((F.col("status") >= 400) & (F.col("status") < 500),
                    F.lit("allow_all"))
              .when(F.col("cache_age_h") <= 24, F.lit("use_cached"))
              .otherwise(F.lit("disallow_all")))
    out = d.withColumn("policy", policy)
    blocked = F.col("path").startswith("/private")
    admitted = (F.when(F.col("policy") == "allow_all", F.lit(1))
                .when(F.col("policy") == "disallow_all", F.lit(0))
                .otherwise((~blocked).cast("int")))
    return out.withColumn("admitted", admitted.cast("int"))


ORACLE_ROBOTS_FETCH_POLICY = """
WITH hosts AS (SELECT DISTINCT o_orderkey % 50 AS hid FROM orders),
d AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host_key,
         CAST(CASE WHEN hid % 9 = 0 THEN 503
                   WHEN hid % 7 = 0 THEN 404
                   WHEN hid % 11 = 0 THEN 403
                   ELSE 200 END AS INT) AS status,
         CAST(((hid // 9) % 3) * 20 AS BIGINT) AS cache_age_h,
         unnest(['/', '/private/acct', '/pub/page']) AS path
  FROM hosts),
p AS (
  SELECT *,
         CASE WHEN status >= 200 AND status < 300 THEN 'parse_live'
              WHEN status >= 400 AND status < 500 THEN 'allow_all'
              WHEN cache_age_h <= 24 THEN 'use_cached'
              ELSE 'disallow_all' END AS policy
  FROM d)
SELECT host_key, status, cache_age_h, path, policy,
       CAST(CASE WHEN policy = 'allow_all' THEN 1
                 WHEN policy = 'disallow_all' THEN 0
                 WHEN path LIKE '/private%' THEN 0
                 ELSE 1 END AS INT) AS admitted
FROM p
"""


def q_robots_churn(spark, sf_dir):
    """Robots-policy CHURN monitor — what a polite recrawler checks
    before reusing cached admission decisions: per host, the rule-set
    diff between two crawl rounds (added / removed / allow-flag
    flipped rules via ONE full-outer join on (host, path)) and the
    TIGHTENED verdict (some path a crawler was allowed to fetch last
    round — including by rule absence — is now explicitly blocked),
    which is the case that forces frontier invalidation. Deterministic
    rule tables: round 1 gives host hid paths /p{(hid*3+j)%7} (j 0..2,
    allow = (hid+j)%3 != 0); round 2 shifts every 4th host's paths by
    one (j 1..3) and flips allows where (hid+j)%5 == 0.

    Plan/scale: rule tables are census-sized (rules per host, not
    URLs); one co-partitioned full outer join + one per-host rollup."""
    hid = (_t(spark, sf_dir, "orders")
           .select((F.col("o_orderkey") % 40).alias("hid")).distinct())

    def rules(jlo, shift_every4):
        js = F.array(*[F.lit(jlo + i) for i in range(3)])
        base = hid.select(
            "hid", F.explode(js).alias("j")) if not shift_every4 else \
            hid.select(
                "hid",
                F.explode(F.when(F.col("hid") % 4 == 0,
                                 F.array(*[F.lit(jlo + 1 + i)
                                           for i in range(3)]))
                          .otherwise(js)).alias("j"))
        return base.select(
            F.concat(F.lit("h"), F.col("hid").cast("string"))
            .alias("host_key"), "hid",
            F.concat(F.lit("/p"),
                     ((F.col("hid") * 3 + F.col("j")) % 7).cast("string"))
            .alias("path"),
            ((F.col("hid") + F.col("j")) % 3 != 0).alias("allow"))

    r1 = rules(0, False)
    r2 = (rules(0, True)
          .withColumn("allow",
                      F.when((F.col("hid") + F.expr(
                          "CAST(substring(path, 3) AS INT)")) % 5 == 0,
                          ~F.col("allow"))
                      .otherwise(F.col("allow"))))
    # NOTE: the flip keys on the PATH DIGIT, not j — mirrored verbatim
    # in the oracle, so both engines flip the same rules.
    a = r1.select("host_key", "path", F.col("allow").alias("allow_old"))
    b = r2.select("host_key", "path", F.col("allow").alias("allow_new"))
    j = a.join(b, ["host_key", "path"], "full_outer")
    cls = (F.when(F.col("allow_old").isNull(), F.lit("added"))
           .when(F.col("allow_new").isNull(), F.lit("removed"))
           .when(F.col("allow_old") != F.col("allow_new"),
                 F.lit("flipped"))
           .otherwise(F.lit("kept")))
    tightened = (
        ((F.col("allow_new") == False) &                       # noqa: E712
         (F.col("allow_old").isNull() | (F.col("allow_old") == True)))  # noqa: E712,E501
        .cast("long"))
    per = (j.withColumn("cls", cls)
           .groupBy("host_key")
           .agg(F.sum((F.col("cls") == "added").cast("long"))
                .alias("n_added"),
                F.sum((F.col("cls") == "removed").cast("long"))
                .alias("n_removed"),
                F.sum((F.col("cls") == "flipped").cast("long"))
                .alias("n_flipped"),
                F.max(tightened).cast("int").alias("tightened")))
    return per


ORACLE_ROBOTS_CHURN = """
WITH hid AS (SELECT DISTINCT o_orderkey % 40 AS hid FROM orders),
r1 AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host_key,
         '/p' || CAST((hid * 3 + j) % 7 AS VARCHAR) AS path,
         (hid + j) % 3 <> 0 AS allow
  FROM hid, UNNEST([0, 1, 2]) t(j)),
r2base AS (
  SELECT hid,
         CASE WHEN hid % 4 = 0 THEN j + 1 ELSE j END AS j
  FROM hid, UNNEST([0, 1, 2]) t(j)),
r2 AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host_key, path,
         CASE WHEN (hid + CAST(substr(path, 3) AS INT)) % 5 = 0
              THEN NOT allow ELSE allow END AS allow
  FROM (SELECT hid, '/p' || CAST((hid * 3 + j) % 7 AS VARCHAR) AS path,
               (hid + j) % 3 <> 0 AS allow
        FROM r2base)),
j AS (
  SELECT COALESCE(a.host_key, b.host_key) AS host_key,
         a.allow AS allow_old, b.allow AS allow_new
  FROM r1 a FULL OUTER JOIN r2 b
    ON a.host_key = b.host_key AND a.path = b.path)
SELECT host_key,
       CAST(SUM(CASE WHEN allow_old IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_added,
       CAST(SUM(CASE WHEN allow_new IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN allow_old IS NOT NULL AND allow_new IS NOT NULL
                      AND allow_old <> allow_new THEN 1 ELSE 0 END)
            AS BIGINT) AS n_flipped,
       CAST(MAX(CASE WHEN allow_new = false
                      AND (allow_old IS NULL OR allow_old = true)
                THEN 1 ELSE 0 END) AS INT) AS tightened
FROM j GROUP BY host_key
"""


def q_robots_crawl_delay_budget(spark, sf_dir):
    """Crawl-delay -> dispatch-cycle budget reconciliation — the planning
    row that turns parsed politeness directives into the number the
    scheduler actually needs: how many pending pages can this host
    legally absorb per 10-minute dispatch cycle (the reference's crawl
    loop cadence, crawl_controller dispatch; politeness clamp [500ms,
    10s] as in crawler/politeness.py), and how many cycles of backlog
    does its queue represent. Four robots shapes exercise the parse
    (0.5 s delay, an extreme 30 s delay that hits the clamp, no
    directive -> 1 s default, unparseable -> default); pending load is
    hub-skewed (hosts 0-2 absorb half the queue) so starvation emerges
    from delay x backlog jointly, not from either alone. All-integer
    math; the directive parse is the SAME operator the robots_directives
    row verifies (crawler.politeness.parse_robots_directives)."""
    from genesis_spark.crawler.politeness import parse_robots_directives

    r = F.col("id")
    delay_line = (F.when(r % 4 == 0, "Crawl-delay: 0.5\n")
                  .when(r % 4 == 1, "Crawl-delay: 30\n")
                  .when(r % 4 == 2, "")
                  .otherwise("Crawl-delay: oops\n"))
    robots = spark.range(30).select(
        F.concat(F.lit("h"), r.cast("string")).alias("host_key"),
        F.concat(F.lit("User-agent: *\n"), delay_line).alias("robots_txt"))
    dirs = parse_robots_directives(robots, agent="genesis").select(
        "host_key", "crawl_delay_ms")

    key = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (F.when(key % 4 < 2, key % 3)
                                 .otherwise(key % 30)).cast("string"))
    pending = (_t(spark, sf_dir, "orders")
               .groupBy(host.alias("host_key"))
               .agg(F.count("*").alias("pending")))

    eff = F.least(F.greatest(F.coalesce(F.col("crawl_delay_ms"),
                                        F.lit(1000)), F.lit(500)),
                  F.lit(10000))
    out = (pending.join(dirs, "host_key", "left")
           .withColumn("effective_delay_ms", eff.cast("long"))
           .withColumn("cycle_budget",
                       (F.lit(600000) / F.col("effective_delay_ms"))
                       .cast("long"))
           .withColumn("backlog_cycles",
                       ((F.col("pending") + F.col("cycle_budget") - 1)
                        / F.col("cycle_budget")).cast("long"))
           .withColumn("starved", F.col("backlog_cycles") > 7))
    return (out.select("host_key", "effective_delay_ms", "pending",
                       "cycle_budget", "backlog_cycles", "starved")
            .orderBy("host_key"))


ORACLE_ROBOTS_CRAWL_DELAY_BUDGET = """
WITH delays AS (
  SELECT 'h' || r AS host_key,
         CASE r % 4 WHEN 0 THEN 500 WHEN 1 THEN 30000
                    WHEN 2 THEN NULL ELSE NULL END AS crawl_delay_ms
  FROM range(30) t(r)
),
pending AS (
  SELECT 'h' || (CASE WHEN o_orderkey % 4 < 2 THEN o_orderkey % 3
                      ELSE o_orderkey % 30 END) AS host_key,
         count(*) AS pending
  FROM orders GROUP BY 1
),
calc AS (
  SELECT p.host_key, p.pending,
         CAST(least(greatest(coalesce(d.crawl_delay_ms, 1000), 500),
                    10000) AS BIGINT) AS effective_delay_ms
  FROM pending p LEFT JOIN delays d USING (host_key)
),
budget AS (
  SELECT host_key, effective_delay_ms, pending,
         600000 // effective_delay_ms AS cycle_budget
  FROM calc
)
SELECT host_key, effective_delay_ms, pending, cycle_budget,
       (pending + cycle_budget - 1) // cycle_budget AS backlog_cycles,
       (pending + cycle_budget - 1) // cycle_budget > 7 AS starved
FROM budget
ORDER BY host_key
"""
