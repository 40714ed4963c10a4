"""Registry family: Leak-site extraction (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_leak_dispatch(spark, sf_dir):
    """M4/S7: leak-site registry dispatch + per-site extraction. Pages are
    synthesized from the documents table (two registered site shapes + one
    unregistered host that the dispatch join must drop); the REAL extractors
    run in mapInPandas — the oracle replays the extraction arithmetic on the
    same synthesized structure."""
    from genesis_spark import leaks as L

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    zone_url = F.concat(F.lit("http://mirror-archive.onion/zone/"),
                        k.cast("string"))
    victim_url = F.concat(F.lit("http://victim-board.onion/v/"),
                          k.cast("string"))
    other_url = F.concat(F.lit("http://unknown-site.onion/p/"),
                         k.cast("string"))
    zone_html = F.concat(
        F.lit('<html><body><div class="zone"><td class="attacker">A'),
        k.cast("string"),
        F.lit('</td><td class="date">2024-01-15</td>'
              '<div class="defacement">'),
        F.col("text"), F.lit('</div></div></body></html>'))
    victim_html = F.concat(
        F.lit('<html><body><ul>'),
        F.array_join(F.transform(
            F.slice(F.split(F.col("text"), " "), 1, 12),
            lambda w: F.concat(F.lit('<li class="list-group-item">'
                                     'Victime: '), w, F.lit('</li>'))), ""),
        F.lit('</ul></body></html>'))
    pages = d.select(
        F.when(k % 3 == 0, zone_url).when(k % 3 == 1, victim_url)
        .otherwise(other_url).alias("url"),
        F.when(k % 3 == 0, zone_html).when(k % 3 == 1, victim_html)
        .otherwise(F.lit("<html></html>")).alias("html"))
    cards = L.dispatch_leak_parse(pages)
    return cards.select("host_key", "m_url", "card_pos", "batch_id",
                        "m_title", "m_network", "m_important_content",
                        "m_content", "m_leak_date")


ORACLE_LEAK_DISPATCH = """
WITH zone AS (
  SELECT 'mirror-archive' AS host_key,
         'http://mirror-archive.onion/zone/' || doc_id AS m_url,
         0 AS card_pos, 0 AS batch_id,
         'Hacked by A' || doc_id AS m_title,
         'onion' AS m_network,
         CASE WHEN len(w) > 500 THEN array_to_string(w[1:500], ' ')
              ELSE text END AS m_important_content,
         CASE WHEN len(w) > 500 THEN array_to_string(w[501:len(w)], ' ')
              ELSE '' END AS m_content,
         '2024-01-15' AS m_leak_date
  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
        FROM documents WHERE doc_id % 3 = 0)
), victims AS (
  SELECT 'victim-board' AS host_key,
         'http://victim-board.onion/v/' || doc_id AS m_url,
         CAST(u['i'] AS INT) AS card_pos,
         CAST(u['i'] // 10 AS INT) AS batch_id,
         rtrim(u['w'], '.') AS m_title,
         'onion' AS m_network,
         rtrim(u['w'], '.') AS m_important_content,
         '' AS m_content,
         NULL AS m_leak_date
  FROM (SELECT doc_id,
               unnest(list_transform(range(least(len(w), 10)),
                      i -> {'i': i, 'w': w[i + 1]})) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id % 3 = 1))
)
SELECT * FROM zone UNION ALL SELECT * FROM victims
"""


def q_leak_dispatch2(spark, sf_dir):
    """M4 round 3: three of the six new site shapes (ransom-board download
    table, hack-blog post page, card-grid) synthesized from the documents
    table and run through the same registry dispatch; the oracle replays
    each extractor's arithmetic. (feed-site/post-board/leak-archive are
    golden-tested; their date stamping / fallback sentinels don't add
    oracle-expressible structure.)"""
    from genesis_spark import leaks as L

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    ransom_url = F.concat(F.lit("http://ransom-board.onion/post/"),
                          k.cast("string"))
    blog_url = F.concat(F.lit("http://hack-blog.onion/post/"),
                        k.cast("string"))
    grid_url = F.concat(F.lit("http://card-grid.onion/page/"),
                        k.cast("string"))
    ransom_html = F.concat(
        F.lit('<html><body><div class="theading">C'), k.cast("string"),
        F.lit('</div><div class="tstat">'), F.col("text"),
        F.lit('</div><table class="tdownload"><tr><td>'
              '<a href="/files/a.zip">a</a><a href="/files/b.zip">b</a>'
              '</td></tr></table></body></html>'))
    blog_html = F.concat(
        F.lit('<html><body><h1 class="wp-block-post-title '
              'has-x-large-font-size">B'), k.cast("string"),
        F.lit('</h1><div class="wp-block-post-date">'
              '<time datetime="2024-06-15">x</time></div>'
              '<div class="entry-content wp-block-post-content"><p>'),
        F.col("text"), F.lit('</p></div></body></html>'))
    grid_html = F.concat(
        F.lit("<html><body>"),
        F.array_join(F.transform(
            F.slice(F.split(F.col("text"), " "), 1, 6),
            lambda w: F.concat(
                F.lit('<div class="card"><div class="title">'), w,
                F.lit('</div><div class="text">'), w,
                F.lit("</div></div>"))), ""),
        F.lit("</body></html>"))
    pages = d.select(
        F.when(k % 3 == 0, ransom_url).when(k % 3 == 1, blog_url)
        .otherwise(grid_url).alias("url"),
        F.when(k % 3 == 0, ransom_html).when(k % 3 == 1, blog_html)
        .otherwise(grid_html).alias("html"))
    cards = L.dispatch_leak_parse(pages)
    return cards.select("host_key", "m_url", "card_pos", "batch_id",
                        "m_title", "m_content", "m_important_content",
                        "m_leak_date",
                        F.array_join("m_dumplink", ",").alias("dump_csv"))


ORACLE_LEAK_DISPATCH2 = r"""
WITH ransom AS (
  SELECT 'ransom-board' AS host_key,
         'http://ransom-board.onion/post/' || doc_id AS m_url,
         0 AS card_pos, 0 AS batch_id,
         'C' || doc_id AS m_title,
         trim(regexp_replace(text, '\s+', ' ', 'g')) AS m_content,
         trim(regexp_replace(text, '\s+', ' ', 'g'))
           AS m_important_content,
         CAST(NULL AS VARCHAR) AS m_leak_date,
         'http://ransom-board.onion/files/a.zip,' ||
         'http://ransom-board.onion/files/b.zip' AS dump_csv
  FROM documents WHERE doc_id % 3 = 0
), blog AS (
  SELECT 'hack-blog' AS host_key,
         'http://hack-blog.onion/post/' || doc_id AS m_url,
         0 AS card_pos, 0 AS batch_id,
         'B' || doc_id AS m_title,
         text AS m_content,
         CASE WHEN len(w) > 500 THEN array_to_string(w[1:500], ' ')
              ELSE text END AS m_important_content,
         '2024-06-15' AS m_leak_date,
         '' AS dump_csv
  FROM (SELECT doc_id, text, string_split(text, ' ') AS w
        FROM documents WHERE doc_id % 3 = 1)
), grid AS (
  SELECT 'card-grid' AS host_key,
         'http://card-grid.onion/page/' || doc_id AS m_url,
         CAST(u['i'] AS INT) AS card_pos, 0 AS batch_id,
         u['w'] AS m_title, u['w'] AS m_content,
         u['w'] AS m_important_content,
         CAST(NULL AS VARCHAR) AS m_leak_date,
         '' AS dump_csv
  FROM (SELECT doc_id,
               unnest(list_transform(range(least(len(w), 6)),
                      i -> {'i': i, 'w': w[i + 1]})) AS u
        FROM (SELECT doc_id, string_split(text, ' ') AS w
              FROM documents WHERE doc_id % 3 = 2))
)
SELECT * FROM ransom UNION ALL SELECT * FROM blog
UNION ALL SELECT * FROM grid
"""


def q_leak_dispatch3(spark, sf_dir):
    """M4 completion (18/18 sites): three of the round-3 batch's nine
    shapes with oracle-expressible structure — advert blocks (data_size
    string assembly + 'Leak of' title), sales table (empty-popup fallback
    to the 'year | db | site | records | price' string), posts article
    (revenue '$'-prefix gate and data-size digit gate). The other six are
    golden-tested; their fallback sentinels / whole-page-text quirks add
    no oracle-expressible arithmetic."""
    from genesis_spark import leaks as L

    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    ks = k.cast("string")
    advert_url = F.concat(F.lit("http://advert-board.onion/leaks/"), ks)
    sales_url = F.concat(F.lit("http://sales-table.onion/list/"), ks)
    posts_url = F.concat(F.lit("http://posts-board.onion/posts/"), ks)
    advert_html = F.concat(
        F.lit('<html><body><div class="advert_col">'
              '<div class="advert_info_title">A'), ks,
        F.lit('</div><div class="advert_info_p">'), F.col("text"),
        F.lit('<a href="http://w'), ks,
        F.lit('.example">s</a></div><div class="advert_info_code">'
              '<span>Size: '), ks,
        F.lit('GB</span><span>Files: '), (k * 2).cast("string"),
        F.lit('</span><span>Folders: 7</span></div>'
              '<div class="advert_action"><a href="/dl/'), ks,
        F.lit('.7z">get</a></div></div></body></html>'))
    sales_html = F.concat(
        F.lit('<html><body><table class="list"><tbody><tr><td>Y'), ks,
        F.lit("</td><td>D"), ks, F.lit("</td><td>s"), ks,
        F.lit(".io</td><td>R"), ks, F.lit("</td><td>$"), ks,
        F.lit('</td><td><button>Buy</button>'
              '<table class="order-details"><tr><td>h</td></tr>'
              '<tr><td>h</td></tr><tr><td>h</td></tr><tr><td></td></tr>'
              "</table></td></tr></tbody></table></body></html>"))
    posts_html = F.concat(
        F.lit('<html><body><p class="text-center text-4xl font-bold">P'),
        ks, F.lit('</p><div class="text-sm"><span>11 Aug, 2024</span>'
                  "</div><article><h3>H</h3><p>"), F.col("text"),
        F.lit("</p><p>Revenue: "),
        F.when(k % 2 == 0, F.concat(F.lit("$"), ks, F.lit("M")))
        .otherwise(F.lit("n/a")),
        F.lit("</p><p>Data: "),
        F.when(k % 4 < 2, F.concat(ks, F.lit(" GB")))
        .otherwise(F.lit("lots")),
        F.lit('</p><a href="http://z'), ks,
        F.lit('.example">z</a></article></body></html>'))
    pages = d.select(
        F.when(k % 3 == 0, advert_url).when(k % 3 == 1, sales_url)
        .otherwise(posts_url).alias("url"),
        F.when(k % 3 == 0, advert_html).when(k % 3 == 1, sales_html)
        .otherwise(posts_html).alias("html"))
    cards = L.dispatch_leak_parse(pages)
    return cards.select(
        "host_key", "m_url", "card_pos", "batch_id", "m_title",
        "m_content", "m_data_size", "m_leak_date", "m_revenue",
        F.array_join("m_weblink", ",").alias("web_csv"),
        F.array_join("m_dumplink", ",").alias("dump_csv"))


ORACLE_LEAK_DISPATCH3 = r"""
WITH advert AS (
  SELECT 'advert-board' AS host_key,
         'http://advert-board.onion/leaks/' || doc_id AS m_url,
         0 AS card_pos, 0 AS batch_id,
         'Leak of A' || doc_id AS m_title,
         text || chr(10) || 's' AS m_content,
         'Size: ' || doc_id || 'GB, Files: ' || (doc_id * 2) ||
           ', Folders: 7' AS m_data_size,
         CAST(NULL AS VARCHAR) AS m_leak_date,
         CAST(NULL AS VARCHAR) AS m_revenue,
         'http://w' || doc_id || '.example' AS web_csv,
         '/dl/' || doc_id || '.7z' AS dump_csv
  FROM documents WHERE doc_id % 3 = 0
), sales AS (
  SELECT 'sales-table' AS host_key,
         'http://sales-table.onion/list/' || doc_id AS m_url,
         0 AS card_pos, 0 AS batch_id,
         'D' || doc_id AS m_title,
         'Y' || doc_id || ' | D' || doc_id || ' | s' || doc_id ||
           '.io | R' || doc_id || ' | $' || doc_id AS m_content,
         CAST(NULL AS VARCHAR) AS m_data_size,
         'Y' || doc_id AS m_leak_date,
         CAST(NULL AS VARCHAR) AS m_revenue,
         's' || doc_id || '.io' AS web_csv,
         '' AS dump_csv
  FROM documents WHERE doc_id % 3 = 1
), posts AS (
  SELECT 'posts-board' AS host_key,
         'http://posts-board.onion/posts/' || doc_id AS m_url,
         0 AS card_pos, 0 AS batch_id,
         'P' || doc_id AS m_title,
         'H' || text || 'Revenue: ' ||
           CASE WHEN doc_id % 2 = 0 THEN '$' || doc_id || 'M'
                ELSE 'n/a' END ||
           'Data: ' ||
           CASE WHEN doc_id % 4 < 2 THEN doc_id || ' GB'
                ELSE 'lots' END || 'z' AS m_content,
         CASE WHEN doc_id % 4 < 2 THEN doc_id || ' GB'
              ELSE '' END AS m_data_size,
         '11 Aug, 2024' AS m_leak_date,
         CASE WHEN doc_id % 2 = 0 THEN '$' || doc_id || 'M'
              ELSE '' END AS m_revenue,
         'http://z' || doc_id || '.example' AS web_csv,
         '' AS dump_csv
  FROM documents WHERE doc_id % 3 = 2
)
SELECT * FROM advert UNION ALL SELECT * FROM sales
UNION ALL SELECT * FROM posts
"""


def q_leak_collect(spark, sf_dir):
    """M5: the dynamic (query-driven) collector path as one oracle row.
    A watchlist of (email, username) subjects is synthesized from the
    documents table; the REAL ``collect_breach_records`` operator
    (leaks/collector.py — mapInPandas, reference card semantics from
    _breachdbsztfykg2...py:37-100) runs against the deterministic fake
    search endpoint ``fixture_search_fetch``, so the Username-before-
    Email order, empty-value skip, whole-row ERR abort, 10-char title
    truncation, and record scrape are all value-hashed against SQL."""
    from genesis_spark.leaks.collector import (collect_breach_records,
                                               fixture_search_fetch)

    base = "http://breach-db.onion"
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    watch = d.select(
        k.alias("query_id"),
        F.when(k % 3 != 0,
               F.concat(F.lit("user"), k.cast("string"),
                        F.lit("@example.com"))).otherwise(F.lit(""))
        .alias("email"),
        F.when(k % 2 == 0, F.concat(F.lit("name"), k.cast("string")))
        .otherwise(F.lit("")).alias("username"))
    cards = collect_breach_records(watch, fixture_search_fetch, base)
    return cards.select(
        "query_id", "search_type", "m_title", "m_important_content",
        "m_name", "m_network", "m_url",
        F.array_join("m_dumplink", ",").alias("dump_csv"),
        F.array_join("m_email_addresses", ",").alias("emails_csv"))


ORACLE_LEAK_COLLECT = """
WITH watch AS (
  SELECT doc_id AS query_id,
         CASE WHEN doc_id % 3 <> 0
              THEN 'user' || doc_id || '@example.com' ELSE '' END AS email,
         CASE WHEN doc_id % 2 = 0
              THEN 'name' || doc_id ELSE '' END AS username
  FROM documents
), searches AS (
  -- Username first; an ERR on it (digits % 7 = 0) aborts the whole row
  SELECT query_id, 'Username' AS search_type, username AS value,
         username, email
  FROM watch
  WHERE username <> '' AND query_id % 7 <> 0
  UNION ALL
  SELECT query_id, 'Email' AS search_type, email AS value,
         username, email
  FROM watch
  WHERE email <> '' AND NOT (username <> '' AND query_id % 7 = 0)
)
SELECT query_id, search_type,
       'Records for ' || substr(value, 1, 10) AS m_title,
       'Records were found for ' || search_type ||
       ' in a data breach.' AS m_important_content,
       CASE WHEN search_type = 'Username' THEN username ELSE '' END
         AS m_name,
       'onion' AS m_network,
       'http://breach-db.onion' AS m_url,
       array_to_string(list_transform(range(length(value) % 3),
         i -> value || ':' || substr(search_type, 1, 1) || ':' || i), ',')
         AS dump_csv,
       CASE WHEN search_type = 'Email' THEN email ELSE '' END AS emails_csv
FROM searches
WHERE length(value) % 3 > 0
"""


def q_dispatch_join(spark, sf_dir):
    """J3-style dispatch: broadcast the small dimension chain."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy(F.col("r_name").alias("region"))
            .agg(F.count("*").alias("n_customers"),
                 F.round(F.sum("c_acctbal"), 2).alias("total_balance")))


ORACLE_DISPATCH_JOIN = """
SELECT r_name AS region, count(*) AS n_customers,
       round(sum(c_acctbal), 2) AS total_balance
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_leak_victim_overlap(spark, sf_dir):
    """Cross-SITE leak-victim overlap — the same victim posted on
    several extortion sites is the strongest triage signal an
    intel pipeline extracts from its card stream (double-extortion
    handoffs, re-posts after non-payment): per victim key over a
    synthesized (victim, site, day) card log: post mass, distinct
    sites, first/last day, the repost lag, and the multi-site
    flag.

    Fixture: every 6th victim is cross-posted to a second site 3-9
    days later; every 15th hits three sites.

    Plan/scale: distinct (victim, site, day) then one
    groupBy(victim) — the card-stream census shape of
    leaks/dispatch.py's sink."""
    k = F.col("o_orderkey")
    v = (k % 90).cast("long")
    # round index; k % 3 would be degenerate (v fixes k mod 3)
    r = (k / 90).cast("long") % 3
    site = (F.when((v % 15 == 0) & (r == 2), F.lit("site_c"))
            .when((v % 6 == 0) & (r == 1), F.lit("site_b"))
            .otherwise(F.lit("site_a")))
    day = (F.when((v % 6 == 0) & (r != 0),
                  (v % 20) + 3 + (k % 7)).otherwise(v % 20))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("victim"), v.cast("string"))
                 .alias("victim_key"), site.alias("site"),
                 day.cast("long").alias("day"))
         .distinct())
    return (d.groupBy("victim_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_posts"),
                 F.countDistinct("site").cast("long").alias("n_sites"),
                 F.min("day").cast("long").alias("first_day"),
                 F.max("day").cast("long").alias("last_day"))
            .withColumn("repost_lag_days",
                        (F.col("last_day") - F.col("first_day"))
                        .cast("long"))
            .withColumn("multi_site",
                        (F.col("n_sites") >= 2).cast("int")))


ORACLE_LEAK_VICTIM_OVERLAP = """
WITH d AS (
  SELECT DISTINCT
    'victim' || CAST(o_orderkey % 90 AS VARCHAR) AS victim_key,
    CASE WHEN (o_orderkey % 90) % 15 = 0
              AND (o_orderkey // 90) % 3 = 2
           THEN 'site_c'
         WHEN (o_orderkey % 90) % 6 = 0
              AND (o_orderkey // 90) % 3 = 1
           THEN 'site_b'
         ELSE 'site_a' END AS site,
    CAST(CASE WHEN (o_orderkey % 90) % 6 = 0
              AND (o_orderkey // 90) % 3 <> 0
         THEN (o_orderkey % 90) % 20 + 3 + o_orderkey % 7
         ELSE (o_orderkey % 90) % 20 END AS BIGINT) AS day
  FROM orders)
SELECT victim_key, CAST(count(*) AS BIGINT) AS n_posts,
       CAST(count(DISTINCT site) AS BIGINT) AS n_sites,
       CAST(min(day) AS BIGINT) AS first_day,
       CAST(max(day) AS BIGINT) AS last_day,
       CAST(max(day) - min(day) AS BIGINT) AS repost_lag_days,
       CAST(CASE WHEN count(DISTINCT site) >= 2 THEN 1 ELSE 0 END
            AS INT) AS multi_site
FROM d GROUP BY victim_key
"""


def q_leak_entity_normalize(spark, sf_dir):
    """Victim ENTITY NORMALIZATION across leak-site cards — the step
    between extraction (leak_dispatch) and cross-site analytics
    (leak_victim_overlap): the same organization appears as "Acme-7
    Inc.", "ACME-7, LLC", "acme-7 GmbH" on different sites; triage
    needs ONE canonical key. Normalization = lowercase, strip [.,],
    collapse whitespace, drop trailing legal-suffix tokens (inc, llc,
    gmbh, ltd, incorporated, corp — iterated so stacked suffixes
    fall). Census per canonical entity: card mass, raw-variant count,
    site spread, and the lexicographically-first raw form as the
    display name. Pure codegen string pipeline; the shuffle key is the
    canonical name (uniform by construction)."""
    k = F.col("o_orderkey")
    v = (k % 120).cast("string")
    # style/site are driven by k DIV 120, NOT k — k % 120 fixes k % 5
    # (gcd 5) and k % 3 (gcd 3), which would pin every entity to a
    # single variant and a single site
    s = F.expr("(o_orderkey DIV 120) % 5")
    raw = (F.when(s == 0, F.concat(F.lit("Acme-"), v, F.lit(" Inc.")))
           .when(s == 1, F.concat(F.lit("ACME-"), v, F.lit(", LLC")))
           .when(s == 2, F.concat(F.lit("acme-"), v, F.lit(" GmbH")))
           .when(s == 3, F.concat(F.lit("Acme-"), v))
           .otherwise(F.concat(F.lit("Acme-"), v, F.lit(" Incorporated"))))
    cards = _t(spark, sf_dir, "orders").select(
        raw.alias("raw_name"),
        F.concat(F.lit("site"),
                 F.expr("(o_orderkey DIV 120) % 3").cast("string"))
        .alias("site"))
    canon = F.trim(F.regexp_replace(
        F.regexp_replace(F.regexp_replace(F.lower("raw_name"),
                                          r"[.,]", ""),
                         r"(?: (?:inc|llc|gmbh|ltd|incorporated|corp))+$",
                         ""),
        r"\s+", " "))
    return (cards.withColumn("entity", canon)
            .groupBy("entity")
            .agg(F.count("*").alias("n_cards"),
                 F.countDistinct("raw_name").alias("n_variants"),
                 F.countDistinct("site").alias("n_sites"),
                 F.min("raw_name").alias("display_name"))
            .orderBy("entity"))


ORACLE_LEAK_ENTITY_NORMALIZE = """
WITH cards AS (
  SELECT CASE (o_orderkey // 120) % 5
           WHEN 0 THEN 'Acme-' || (o_orderkey % 120) || ' Inc.'
           WHEN 1 THEN 'ACME-' || (o_orderkey % 120) || ', LLC'
           WHEN 2 THEN 'acme-' || (o_orderkey % 120) || ' GmbH'
           WHEN 3 THEN 'Acme-' || (o_orderkey % 120)
           ELSE 'Acme-' || (o_orderkey % 120) || ' Incorporated'
         END AS raw_name,
         'site' || ((o_orderkey // 120) % 3) AS site
  FROM orders
),
norm AS (
  SELECT raw_name, site,
         trim(regexp_replace(regexp_replace(regexp_replace(
             lower(raw_name), '[.,]', '', 'g'),
             '(?: (?:inc|llc|gmbh|ltd|incorporated|corp))+$', ''),
             '\\s+', ' ', 'g')) AS entity
  FROM cards
)
SELECT entity,
       count(*) AS n_cards,
       CAST(count(DISTINCT raw_name) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT site) AS BIGINT) AS n_sites,
       min(raw_name) AS display_name
FROM norm GROUP BY entity
ORDER BY entity
"""
