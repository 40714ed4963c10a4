"""Registry family: URL normalization & hygiene (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403




# ---------------------------------------------------------------------------
# URL kernel queries (P1-P6, T16 — SURVEY.md §2.2/2.7)
# ---------------------------------------------------------------------------

def q_url_canonicalize(spark, sf_dir):
    """P1 on_clean_url canonicalization (helper_method.py:34-47) over
    messy synthesized URLs — scheme+host lowercase, one leading www.
    stripped, trailing '/ ' trimmed — through the shared codegen expr
    (functions/urls.canonicalize_expr), the same kernel the crawl
    install path runs."""
    k = F.col("o_orderkey")
    raw = F.when(k % 2 == 0,
                 F.concat(F.lit("HTTP://WWW.Site"), (k % 50).cast("string"),
                          F.lit(".Onion/Path/"), k.cast("string"), F.lit("//")))\
          .otherwise(
                 F.concat(F.lit("http://www.site"), (k % 50).cast("string"),
                          F.lit(".onion/p"), k.cast("string"), F.lit("/")))
    return (_t(spark, sf_dir, "orders").filter(k < 2000)
            .select(k.alias("o_orderkey"),
                    U.canonicalize_expr(raw).alias("url_canonical")))


ORACLE_URL_CANONICALIZE = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 2 = 0
            THEN 'http://www.site' || (o_orderkey % 50) || '.onion/Path/' || o_orderkey
            ELSE 'http://site' || (o_orderkey % 50) || '.onion/p' || o_orderkey
       END AS url_canonical
FROM orders WHERE o_orderkey < 2000
"""


def q_url_network_type(spark, sf_dir):
    """P5 get_network_type (helper_method.py:55-62): onion / i2p /
    clearnet classification, grouped to a 3-row census."""
    k = F.col("o_orderkey")
    raw = (F.when(k % 4 == 0, F.concat(F.lit("http://h"), k.cast("string"), F.lit(".onion/x")))
           .when(k % 4 == 1, F.concat(F.lit("http://h"), k.cast("string"), F.lit(".i2p")))
           .when(k % 4 == 2, F.concat(F.lit("http://h"), k.cast("string"), F.lit(".com/a")))
           .otherwise(F.concat(F.lit("h"), k.cast("string"), F.lit(".onion"))))
    return (_t(spark, sf_dir, "orders")
            .select(U.network_type_expr(raw).alias("network"))
            .groupBy("network").agg(F.count("*").alias("n_urls")))


ORACLE_URL_NETWORK_TYPE = """
SELECT CASE WHEN o_orderkey % 4 IN (0, 3) THEN 'onion'
            WHEN o_orderkey % 4 = 1 THEN 'i2p'
            ELSE 'clearnet' END AS network,
       count(*) AS n_urls
FROM orders GROUP BY 1
"""


def q_url_host_key(spark, sf_dir):
    """P6 get_host_name (helper_method.py:50-53): registrable host-key
    extraction through the codegen expr over synthesized URLs."""
    k = F.col("o_orderkey")
    raw = F.concat(F.lit("http://www.shop"), (k % 20).cast("string"),
                   F.lit(".com/item/"), k.cast("string"))
    return (_t(spark, sf_dir, "orders").filter(k < 1000)
            .select(k.alias("o_orderkey"),
                    U.host_name_expr(raw).alias("host_key")))


ORACLE_URL_HOST_KEY = """
SELECT o_orderkey, 'shop' || (o_orderkey % 20) AS host_key
FROM orders WHERE o_orderkey < 1000
"""


def q_url_ext_bucket(spark, sf_dir):
    """T16 extension bucketing: path extension -> media-class routing
    (the reference's parser dispatch tables), grouped per bucket."""
    k = F.col("o_orderkey")
    ext = (F.when(k % 5 == 0, ".jpg").when(k % 5 == 1, ".mp4")
           .when(k % 5 == 2, ".pdf").when(k % 5 == 3, ".zip")
           .otherwise(".html"))
    raw = F.concat(F.lit("http://files.example.com/f"), k.cast("string"), ext)
    return (_t(spark, sf_dir, "orders")
            .select(U.ext_bucket_expr(raw).alias("bucket"))
            .groupBy("bucket").agg(F.count("*").alias("n_urls")))


ORACLE_URL_EXT_BUCKET = """
SELECT CASE o_orderkey % 5 WHEN 0 THEN 'image' WHEN 1 THEN 'video'
            WHEN 2 THEN 'document' WHEN 3 THEN 'archive'
            ELSE 'none' END AS bucket,
       count(*) AS n_urls
FROM orders GROUP BY 1
"""


def q_url_kmv_distinct(spark, sf_dir):
    """KMV (k-minimum-values) distinct-count sketch per host — the
    mergeable cardinality sketch a 10^10-URL frontier uses where exact
    COUNT(DISTINCT) per host would shuffle every URL: keep each host's k
    smallest 60-bit hashes; estimate = (k-1) / normalized kth-min.
    Deterministic by construction (md5 prefix as the hash), so the oracle
    compares the ESTIMATE bit-for-bit, alongside the exact count. k=32
    here; the estimate is mergeable across partitions/waves (union the
    min-sets, re-take k smallest)."""
    k = 32
    key = F.col("o_orderkey")
    urls = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (key % 50).cast("string")).alias("host_key"),
        F.concat(F.lit("http://h"), (key % 50).cast("string"),
                 F.lit(".onion/p"), (key % 997).cast("string")).alias("url"))
        .distinct())
    hashed = urls.withColumn(
        "h", F.conv(F.substring(F.md5("url"), 1, 15), 16, 10).cast("long"))
    w = Window.partitionBy("host_key").orderBy("h")
    ranked = hashed.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("host_key").agg(
        F.count("*").alias("n_exact"),
        F.max(F.when(F.col("rn") == k, F.col("h"))).alias("hk"))
    est = F.when(F.col("hk").isNull(), F.col("n_exact").cast("double")) \
        .otherwise(F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("hk"))
    return stats.select("host_key", "n_exact",
                        F.round(est, 2).alias("kmv_estimate"))


ORACLE_URL_KMV = """
WITH u AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS host_key,
         'http://h' || (o_orderkey % 50) || '.onion/p' || (o_orderkey % 997)
           AS url
  FROM orders),
h AS (SELECT host_key,
             ('0x' || substr(md5(url), 1, 15))::BIGINT AS h FROM u),
r AS (SELECT host_key, h,
             row_number() OVER (PARTITION BY host_key ORDER BY h) AS rn
      FROM h),
s AS (SELECT host_key, count(*) AS n_exact,
             max(CASE WHEN rn = 32 THEN h END) AS hk
      FROM r GROUP BY host_key)
SELECT host_key, n_exact,
       round(CASE WHEN hk IS NULL THEN CAST(n_exact AS DOUBLE)
             ELSE 31.0 * 1152921504606846976.0 / hk END, 2) AS kmv_estimate
FROM s
"""


def q_url_hll_distinct(spark, sf_dir):
    """HyperLogLog per-host distinct-URL estimate — the register-table
    sketch next to KMV's min-set sketch (operators.sketches): md5-hex
    bucket+rank, integer register sum (row-order-exact), linear-counting
    small-range correction. The oracle replays the identical arithmetic,
    so the ESTIMATE matches bit-for-bit alongside the exact count."""
    from genesis_spark.operators.sketches import hll_distinct

    key = F.col("o_orderkey")
    urls = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (key % 50).cast("string")).alias("host_key"),
        F.concat(F.lit("http://h"), (key % 50).cast("string"),
                 F.lit(".onion/p"), (key % 997).cast("string")).alias("url"))
        .distinct())
    exact = urls.groupBy("host_key").agg(F.count("*").alias("n_exact"))
    return (hll_distinct(urls, ["host_key"], "url")
            .join(exact, "host_key")
            .select("host_key", "n_exact", "hll_estimate"))

ORACLE_URL_HLL = f"""
WITH u AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS host_key,
         'http://h' || (o_orderkey % 50) || '.onion/p' || (o_orderkey % 997)
           AS url
  FROM orders),
hx AS (
  SELECT host_key,
         CAST(concat('0x', substr(md5(url), 1, 2)) AS BIGINT) AS bucket,
         regexp_replace(substr(md5(url), 3, 13), '^0*', '') AS nz
  FROM u),
rk AS (
  SELECT host_key, bucket,
         CASE WHEN nz = '' THEN 53
              ELSE (13 - length(nz)) * 4
                   + (CASE WHEN substr(nz, 1, 1) IN
                             ('8','9','a','b','c','d','e','f') THEN 0
                           WHEN substr(nz, 1, 1) IN ('4','5','6','7') THEN 1
                           WHEN substr(nz, 1, 1) IN ('2','3') THEN 2
                           ELSE 3 END) + 1 END AS rank
  FROM hx),
regs AS (
  SELECT host_key, bucket, max(rank) AS r FROM rk GROUP BY 1, 2),
per_key AS (
  SELECT host_key, count(*) AS npres,
         sum(CAST(power(2, 53 - r) AS BIGINT)) AS s_int
  FROM regs GROUP BY 1),
est AS (
  SELECT host_key,
         CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M} * {_HLL_M}
           / (s_int / {float(1 << 53)!r} + ({_HLL_M} - npres)) AS raw,
         {_HLL_M} - npres AS v
  FROM per_key),
ex AS (SELECT host_key, count(*) AS n_exact FROM u GROUP BY 1)
SELECT ex.host_key, ex.n_exact,
       round(CASE WHEN raw <= 2.5 * {_HLL_M} AND v > 0
                  THEN {float(_HLL_M)!r} * ln({float(_HLL_M)!r} / v)
                  ELSE raw END, 2) AS hll_estimate
FROM est JOIN ex USING (host_key)
"""


def q_url_cms_heavy(spark, sf_dir):
    """Count-Min heavy hitters — the frequency sketch next to HLL/KMV's
    cardinality sketches (operators.sketches): a 4x512 counter table
    built in one scan that a 10^10-hit stream can maintain incrementally
    (additive merge) where an exact per-host count would shuffle every
    hit. Hosts follow a hub-plus-long-tail split (7 hubs carry half the
    hits, ~1000 tail hosts share the rest) so the sketch actually
    collides in the tail; top-25 by (estimate DESC, host_key) with the
    exact count alongside. Deterministic md5 addressing, so the oracle
    matches the ESTIMATE bit-for-bit."""
    from genesis_spark.operators.sketches import cms_counts, cms_estimate

    key = F.col("o_orderkey")
    host_id = (F.when(key % 4 < 2, key % 7)
               .otherwise(key % 1000 + 100)).cast("string")
    hits = (_t(spark, sf_dir, "orders")
            .select(F.concat(F.lit("h"), host_id).alias("host_key")))
    counts = cms_counts(hits, "host_key")
    exact = hits.groupBy("host_key").agg(F.count("*").alias("n_exact"))
    est = cms_estimate(counts, hits.distinct(), "host_key")
    return (est.join(exact, "host_key")
            .orderBy(F.desc("cms_estimate"), "host_key").limit(25)
            .select("host_key", "n_exact", "cms_estimate"))

# the sketch width for THIS oracle is operators.sketches.CMS_W (512) — in
# the pre-split monolith the name _CMS_W was later rebound to 32 by the
# events-family streaming-CMS section, and only textual order kept this
# f-string seeing 512; bind it explicitly so module order can't change it
from genesis_spark.operators.sketches import CMS_W as _URL_CMS_W  # noqa: E402

ORACLE_URL_CMS = f"""
WITH hits AS (
  SELECT 'h' || (CASE WHEN o_orderkey % 4 < 2 THEN o_orderkey % 7
                      ELSE o_orderkey % 1000 + 100 END) AS host_key
  FROM orders),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
pairs AS (
  SELECT host_key, j,
         CAST(concat('0x', substr(md5(concat(j, ':', host_key)), 1, 8))
              AS BIGINT) % {_URL_CMS_W} AS col
  FROM hits CROSS JOIN js),
counts AS (SELECT j, col, count(*) AS cnt FROM pairs GROUP BY 1, 2),
hosts AS (SELECT DISTINCT host_key FROM hits),
probe AS (
  SELECT host_key, j,
         CAST(concat('0x', substr(md5(concat(j, ':', host_key)), 1, 8))
              AS BIGINT) % {_URL_CMS_W} AS col
  FROM hosts CROSS JOIN js),
est AS (
  SELECT p.host_key, min(coalesce(c.cnt, 0)) AS cms_estimate
  FROM probe p LEFT JOIN counts c USING (j, col) GROUP BY 1),
ex AS (SELECT host_key, count(*) AS n_exact FROM hits GROUP BY 1)
SELECT est.host_key, n_exact, cms_estimate
FROM est JOIN ex USING (host_key)
ORDER BY cms_estimate DESC, est.host_key
LIMIT 25
"""


def q_url_trap_detect(spark, sf_dir):
    """Crawl-trap detection (real crawler ops the reference lacks —
    its only expansion guards are the depth/link caps,
    generic_parse_controller.py:116-117): collapse digit runs in the
    path to a template; a host whose distinct-URL count explodes
    relative to its distinct-template count (calendar/session-id
    traps) gets flagged and its crawl budget should shrink. Pure
    codegen: two count-distincts per host, one shuffle each."""
    lk, pk = F.col("l_orderkey"), F.col("l_partkey")
    hid = lk % 30
    path = (F.when(hid < 5,
                   F.concat(F.lit("/cal/"), lk.cast("string"),
                            F.lit("/"), pk.cast("string")))
            .otherwise(F.concat(F.lit("/page"), (pk % 20).cast("string"))))
    urls = (_t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("h"), hid.cast("string")).alias("host_key"),
        path.alias("path")))
    agg = urls.groupBy("host_key").agg(
        F.countDistinct("path").alias("n_urls"),
        F.countDistinct(F.regexp_replace("path", "[0-9]+", "N"))
        .alias("n_templates"))
    ratio = F.round(F.col("n_urls") / F.col("n_templates"), 4)
    return agg.select("host_key", "n_urls", "n_templates",
                      ratio.alias("url_template_ratio"),
                      (ratio >= 50.0).alias("is_trap"))


ORACLE_URL_TRAP = """
WITH u AS (
  SELECT 'h' || (l_orderkey % 30) AS host_key,
         CASE WHEN l_orderkey % 30 < 5
              THEN '/cal/' || l_orderkey || '/' || l_partkey
              ELSE '/page' || (l_partkey % 20) END AS path
  FROM lineitem),
a AS (
  SELECT host_key, count(DISTINCT path) AS n_urls,
         count(DISTINCT regexp_replace(path, '[0-9]+', 'N', 'g'))
           AS n_templates
  FROM u GROUP BY 1)
SELECT host_key, n_urls, n_templates,
       round(n_urls / n_templates, 4) AS url_template_ratio,
       round(n_urls / n_templates, 4) >= 50.0 AS is_trap
FROM a
"""


def q_url_param_strip(spark, sf_dir):
    """Tracking-parameter canonicalization — the URL-normalization pass a
    dedup-correct frontier needs beyond P1 (utm_*/ref/fbclid query params
    make infinite aliases of one page): split the query string, drop
    tracking keys, rebuild preserving the order of surviving params
    (dropping '?' entirely when none survive). Pure codegen (split +
    filter + array_join) — zero shuffles."""
    k = F.col("o_orderkey")
    raw_q = F.concat(
        F.lit("a="), (k % 5).cast("string"),
        F.when(k % 2 == 0, F.lit("&utm_source=feed")).otherwise(F.lit("")),
        F.when(k % 3 == 0, F.concat(F.lit("&b="), (k % 7).cast("string")))
         .otherwise(F.lit("")),
        F.when(k % 4 == 0, F.lit("&ref=tw")).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.lit("&fbclid=x9")).otherwise(F.lit("")))
    base = F.concat(F.lit("http://site"), (k % 30).cast("string"),
                    F.lit(".onion/p"), k.cast("string"))
    kept = F.filter(
        F.split(raw_q, "&"),
        lambda p: ~(p.rlike("^(utm_[A-Za-z0-9_]*|ref|fbclid)=")))
    cleaned = F.when(F.size(kept) > 0,
                     F.concat(base, F.lit("?"), F.array_join(kept, "&"))
                     ).otherwise(base)
    return (_t(spark, sf_dir, "orders").filter(k < 3000)
            .select(k.alias("o_orderkey"),
                    F.concat(base, F.lit("?"), raw_q).alias("url_raw"),
                    cleaned.alias("url_stripped")))


ORACLE_URL_PARAM_STRIP = """
WITH r AS (
  SELECT o_orderkey,
         'http://site' || (o_orderkey % 30) || '.onion/p' || o_orderkey
           AS base,
         'a=' || (o_orderkey % 5)
         || CASE WHEN o_orderkey % 2 = 0 THEN '&utm_source=feed' ELSE '' END
         || CASE WHEN o_orderkey % 3 = 0
                 THEN '&b=' || (o_orderkey % 7) ELSE '' END
         || CASE WHEN o_orderkey % 4 = 0 THEN '&ref=tw' ELSE '' END
         || CASE WHEN o_orderkey % 5 = 0 THEN '&fbclid=x9' ELSE '' END
           AS q
  FROM orders WHERE o_orderkey < 3000),
k AS (
  SELECT o_orderkey, base, q,
         list_filter(string_split(q, '&'),
             p -> NOT regexp_matches(p, '^(utm_[A-Za-z0-9_]*|ref|fbclid)='))
           AS kept
  FROM r)
SELECT o_orderkey, base || '?' || q AS url_raw,
       CASE WHEN len(kept) > 0
            THEN base || '?' || array_to_string(kept, '&')
            ELSE base END AS url_stripped
FROM k
"""


def q_url_idn_normalize(spark, sf_dir):
    """IDN host normalization — the RFC 3490 punycode step RFC-3986-level
    canonicalization needs for international onion mirrors and clearnet
    hosts: unicode hostnames encode to their xn-- ASCII form via Python's
    built-in ``idna`` codec inside an ARROW-VECTORIZED pandas UDF (the
    input_hint's sanctioned truth path for kernels SQL cannot express —
    same tier as the url kernel *_udf forms; never a row-at-a-time Python
    UDF). The fixture cycles unicode hosts whose punycode forms the
    oracle bakes as literals, plus an ASCII passthrough and an
    already-encoded form (idempotence)."""
    k = F.col("o_orderkey")
    host = (F.when(k % 4 == 0, F.lit("b\u00fccher"))
            .when(k % 4 == 1, F.lit("m\u00fcnchen"))
            .when(k % 4 == 2, F.lit("xn--bcher-kva"))
            .otherwise(F.lit("plain")))
    raw = F.concat(host, F.lit(".example"))
    return (_t(spark, sf_dir, "orders").filter(k < 2000)
            .select(k.alias("o_orderkey"), raw.alias("host_raw"),
                    U.idn_encode_udf(raw).alias("host_ascii")))


ORACLE_URL_IDN = """
SELECT o_orderkey,
       CASE o_orderkey % 4 WHEN 0 THEN 'bücher.example'
            WHEN 1 THEN 'münchen.example'
            WHEN 2 THEN 'xn--bcher-kva.example'
            ELSE 'plain.example' END AS host_raw,
       CASE o_orderkey % 4 WHEN 0 THEN 'xn--bcher-kva.example'
            WHEN 1 THEN 'xn--mnchen-3ya.example'
            WHEN 2 THEN 'xn--bcher-kva.example'
            ELSE 'plain.example' END AS host_ascii
FROM orders WHERE o_orderkey < 2000
"""


# ---------------------------------------------------------------------------
# block 15: URL alias near-dup, host-graph triangles
# ---------------------------------------------------------------------------

def q_url_near_dup(spark, sf_dir):
    """URL alias detection — same-host URL pairs whose PATHS are within
    edit distance 2 (trailing-slash variants, one-character typos,
    version bumps): the crawl-side near-dup the canonicalizer can't
    catch. The self-join is equi-keyed on host (politeness-bucket-sized
    groups — never a corpus cross join) and the levenshtein filter runs
    inside the join's codegen. Both engines implement classic
    Levenshtein, so the distance is oracle-exact."""
    k = F.col("o_orderkey")
    urls = _t(spark, sf_dir, "orders").filter(k < 2500).select(
        k.alias("url_id"),
        F.concat(F.lit("h"), (k % 40).cast("string")).alias("host_key"),
        F.concat(F.lit("/item/"), (k % 60).cast("string"),
                 F.when(k % 3 == 0, F.lit("/")).otherwise(F.lit("")),
                 F.when(k % 7 == 0, F.lit("x")).otherwise(F.lit("")))
        .alias("path"))
    a = urls.select(F.col("url_id").alias("id_a"), "host_key",
                    F.col("path").alias("path_a"))
    b = urls.select(F.col("url_id").alias("id_b"), "host_key",
                    F.col("path").alias("path_b"))
    return (a.join(b, "host_key")
            .filter(F.col("id_a") < F.col("id_b"))
            .withColumn("edit_dist",
                        F.levenshtein(F.col("path_a"), F.col("path_b")))
            .filter(F.col("edit_dist") <= 2)
            .select("host_key", "id_a", "id_b", "edit_dist"))


ORACLE_URL_NEAR_DUP = """
WITH u AS (
  SELECT o_orderkey AS url_id, 'h' || (o_orderkey % 40) AS host_key,
         '/item/' || (o_orderkey % 60)
         || CASE WHEN o_orderkey % 3 = 0 THEN '/' ELSE '' END
         || CASE WHEN o_orderkey % 7 = 0 THEN 'x' ELSE '' END AS path
  FROM orders WHERE o_orderkey < 2500)
SELECT a.host_key, a.url_id AS id_a, b.url_id AS id_b,
       CAST(levenshtein(a.path, b.path) AS INT) AS edit_dist
FROM u a JOIN u b ON a.host_key = b.host_key AND a.url_id < b.url_id
WHERE levenshtein(a.path, b.path) <= 2
"""


def q_url_shard_rebalance(spark, sf_dir):
    """Reshard churn audit, 16 -> 17 shards: what fraction of URLs MOVE
    under naive mod-N routing (expected ~16/17 — nearly everything)
    versus rendezvous/HRW hashing (Thaler & Ravishankar 1998; expected
    ~1/17 — only the keys the new shard wins). This quantifies WHY
    corpus_shard_manifest's routing must be consistent-hash-shaped
    before anyone adds a shard to a 100 TB corpus. HRW argmax is an
    array_max over (score, shard) structs — field-order comparison is
    identical in Spark and DuckDB, and md5 scores make ties
    impossible in practice while shard DESC breaks them identically.

    Plan/scale: pure map-side expressions (17 md5s per URL, codegen) +
    one 1-row agg; zero shuffles before the final count."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.concat(F.lit("http://h"), (k % 50).cast("string"),
                   F.lit(".onion/p"), k.cast("string"))
    h = (F.conv(F.substring(F.md5(url), 1, 8), 16, 10).cast("long"))
    hrw_old = F.array_max(F.array(
        *[_hrw_struct(url, s) for s in range(_HRW_SHARDS)]))["shard"]
    hrw_new = F.array_max(F.array(
        *[_hrw_struct(url, s) for s in range(_HRW_SHARDS + 1)]))["shard"]
    agg = (o.select(
        ((h % _HRW_SHARDS) != (h % (_HRW_SHARDS + 1)))
        .cast("long").alias("mod_moved"),
        (hrw_old != hrw_new).cast("long").alias("hrw_moved"))
        .agg(F.count("*").alias("n"),
             F.sum("mod_moved").alias("mod_m"),
             F.sum("hrw_moved").alias("hrw_m")))
    return (agg.select(F.lit("mod").alias("strategy"),
                       F.col("n").alias("n_urls"),
                       F.col("mod_m").alias("n_moved"),
                       F.round(F.col("mod_m") / F.col("n"), 4)
                       .alias("moved_pct"))
            .unionByName(
        agg.select(F.lit("hrw").alias("strategy"),
                   F.col("n").alias("n_urls"),
                   F.col("hrw_m").alias("n_moved"),
                   F.round(F.col("hrw_m") / F.col("n"), 4)
                   .alias("moved_pct"))))


ORACLE_URL_SHARD_REBALANCE = _hrw_oracle()


def q_url_bloom_eval(spark, sf_dir):
    """Measured false-positive rate of the URL-seen Bloom prefilter —
    the estimator-vs-truth row for the filter family (the pattern
    dedup_minhash_eval / ann_recall_eval set): a 512-bit / 4-hash Bloom
    built from the seen set probes every candidate, and the verdicts
    are graded against the exact anti-join truth.  ``n_false_neg`` is
    the no-false-negatives contract the engine's prefilter path relies
    on — both engines must compute it as literally zero — and
    ``fpr_ppm`` (exact integer parts-per-million) is the number the
    operators/bloom.py sizing knobs trade memory against.  Hash
    positions are md5-substring-derived (the repo's engine-portable
    construction), so DuckDB replays the filter bit-for-bit.

    Plan/scale: the bit set is DISTINCT positions (<= m rows —
    broadcast); probing is one semi-join + per-URL count; grading one
    anti-join. At 10^10 URLs this exact shape is the bloom.py sharded
    path; here the SQL-expressible single-shard geometry is what gets
    oracle-graded."""
    m = _BLOOM_EVAL_M
    cand = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("http://u"), (F.col("l_orderkey") % 1000).cast("string"),
                 F.lit(".onion")).alias("url")).distinct()
    seen = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0) \
        .select(F.concat(F.lit("http://u"),
                         (F.col("o_orderkey") % 300).cast("string"),
                         F.lit(".onion")).alias("url")).distinct()

    def positions(df):
        return df.select("url", F.explode(F.array(*[
            (F.conv(F.substring(F.md5("url"), 1 + 8 * i, 8), 16, 10)
             .cast("long") % m).alias(f"p{i}") for i in range(4)]))
            .alias("pos"))

    bits = positions(seen).select("pos").distinct()
    hits = (positions(cand)
            .join(F.broadcast(bits), "pos", "left_semi")
            .groupBy("url").agg(F.count(F.lit(1)).alias("nhit")))
    new = (cand.join(seen, "url", "left_anti")
           .select("url", F.lit(1).alias("is_new")))
    graded = (cand.join(hits, "url", "left").join(new, "url", "left")
              .select(
                  (F.coalesce("nhit", F.lit(0)) == 4).cast("int")
                  .alias("maybe"),
                  F.coalesce("is_new", F.lit(0)).alias("is_new")))
    agg = graded.agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum("is_new").cast("long").alias("n_new"),
        F.sum("maybe").cast("long").alias("n_maybe"),
        F.sum(((1 - F.col("is_new")) * (1 - F.col("maybe"))))
        .cast("long").alias("n_false_neg"),
        F.sum(F.col("is_new") * F.col("maybe")).cast("long")
        .alias("n_false_pos"))
    return agg.select(
        "n_candidates", "n_new", "n_maybe", "n_false_neg", "n_false_pos",
        F.floor(F.col("n_false_pos") * 1000000 / F.col("n_new"))
        .cast("long").alias("fpr_ppm"))


ORACLE_URL_BLOOM_EVAL = f"""
WITH cand AS (
  SELECT DISTINCT 'http://u' || (l_orderkey % 1000) || '.onion' AS url
  FROM lineitem),
seen AS (
  SELECT DISTINCT 'http://u' || (o_orderkey % 300) || '.onion' AS url
  FROM orders WHERE o_orderkey % 3 = 0),
bits AS (
  SELECT DISTINCT
         ('0x' || substr(md5(url), 1 + 8 * i, 8))::BIGINT
           % {_BLOOM_EVAL_M} AS pos
  FROM seen CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
probe AS (
  SELECT c.url,
         ('0x' || substr(md5(c.url), 1 + 8 * i, 8))::BIGINT
           % {_BLOOM_EVAL_M} AS pos
  FROM cand c CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i)),
hits AS (
  SELECT url, count(*) AS nhit FROM probe
  WHERE pos IN (SELECT pos FROM bits) GROUP BY url),
graded AS (
  SELECT CASE WHEN coalesce(h.nhit, 0) = 4 THEN 1 ELSE 0 END AS maybe,
         CASE WHEN s.url IS NULL THEN 1 ELSE 0 END AS is_new
  FROM cand c
  LEFT JOIN hits h ON h.url = c.url
  LEFT JOIN seen s ON s.url = c.url)
SELECT CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(is_new) AS BIGINT) AS n_new,
       CAST(sum(maybe) AS BIGINT) AS n_maybe,
       CAST(sum((1 - is_new) * (1 - maybe)) AS BIGINT) AS n_false_neg,
       CAST(sum(is_new * maybe) AS BIGINT) AS n_false_pos,
       CAST(sum(is_new * maybe) * 1000000 // sum(is_new) AS BIGINT)
         AS fpr_ppm
FROM graded
"""


def q_url_redirect_resolve(spark, sf_dir):
    """Bounded redirect-chain resolution — what a fetcher does with 301s
    before a URL may enter the frontier (the reference follows redirects
    inline per fetch, crawler_instance's response handling; a batch
    engine resolves the whole wave at once): follow each URL's redirect
    edge up to 3 hops; a URL still redirecting after 3 hops (loop or
    over-long chain) is classified `redirect_limit`, otherwise `ok` with
    the hop count and final URL.

    Deterministic edge rule over url_id = o_orderkey: id % 97 == 5 ->
    id+1 and id % 97 == 6 -> id-1 (adjacent pairs form 2-cycles — real
    loops), else id % 7 in (1,2,3) -> id+1 (chains of length up to 3
    that terminate at id % 7 == 4). Targets outside the key set are
    terminal (no edge row). All-integer.

    Plan/scale: the resolver is 3 unrolled left equi-joins on the
    current URL plus one membership probe — each join keys on a LONG, so
    at 10^10 URLs it bucket-co-locates with the frontier layout; no
    iteration state, no driver loop; AQE handles the shrinking matched
    side per hop."""
    k = F.col("o_orderkey")
    urls = _t(spark, sf_dir, "orders").select(k.alias("url_id")).distinct()
    dst = (F.when(k % 97 == 5, k + 1)
           .when(k % 97 == 6, k - 1)
           .when((k % 7).isin(1, 2, 3), k + 1))
    edges = (_t(spark, sf_dir, "orders")
             .select(k.alias("src"), dst.cast("long").alias("dst"))
             .filter(F.col("dst").isNotNull()).distinct())
    cur = urls.select("url_id", F.col("url_id").alias("cur"),
                      F.lit(0).alias("hops"))
    for _ in range(3):
        e = edges.withColumnRenamed("src", "cur")
        cur = (cur.join(e, "cur", "left")
               .select("url_id",
                       F.coalesce("dst", "cur").alias("cur"),
                       (F.col("hops")
                        + F.col("dst").isNotNull().cast("int"))
                       .alias("hops")))
    probe = edges.select(F.col("src").alias("cur"),
                         F.lit(1).alias("more"))
    out = cur.join(probe, "cur", "left")
    return out.select(
        "url_id",
        F.col("cur").cast("long").alias("final_url"),
        F.col("hops").cast("int").alias("n_hops"),
        F.when(F.col("more").isNotNull(), F.lit("redirect_limit"))
        .otherwise(F.lit("ok")).alias("status"))


ORACLE_URL_REDIRECT_RESOLVE = """
WITH u AS (SELECT DISTINCT o_orderkey AS url_id FROM orders),
e AS (
  SELECT DISTINCT o_orderkey AS src,
         CASE WHEN o_orderkey % 97 = 5 THEN o_orderkey + 1
              WHEN o_orderkey % 97 = 6 THEN o_orderkey - 1
              WHEN o_orderkey % 7 IN (1, 2, 3) THEN o_orderkey + 1
         END AS dst
  FROM orders
  WHERE CASE WHEN o_orderkey % 97 = 5 THEN o_orderkey + 1
             WHEN o_orderkey % 97 = 6 THEN o_orderkey - 1
             WHEN o_orderkey % 7 IN (1, 2, 3) THEN o_orderkey + 1
        END IS NOT NULL),
h1 AS (SELECT u.url_id, coalesce(e.dst, u.url_id) AS cur,
              CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
       FROM u LEFT JOIN e ON e.src = u.url_id),
h2 AS (SELECT h1.url_id, coalesce(e.dst, h1.cur) AS cur,
              h1.hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
       FROM h1 LEFT JOIN e ON e.src = h1.cur),
h3 AS (SELECT h2.url_id, coalesce(e.dst, h2.cur) AS cur,
              h2.hops + CASE WHEN e.dst IS NULL THEN 0 ELSE 1 END AS hops
       FROM h2 LEFT JOIN e ON e.src = h2.cur)
SELECT h3.url_id,
       CAST(h3.cur AS BIGINT) AS final_url,
       CAST(h3.hops AS INT) AS n_hops,
       CASE WHEN e.src IS NULL THEN 'ok' ELSE 'redirect_limit' END
         AS status
FROM h3 LEFT JOIN e ON e.src = h3.cur
"""


def q_url_shard_handoff(spark, sf_dir):
    """Resharding-movement planning — what happens to a 10^10-URL
    frontier when the shard count changes (8 -> 12 here): under naive
    mod-hashing almost every key changes owner (a full-frontier
    re-shuffle); under rendezvous/HRW hashing (Thaler & Ravishankar
    1996 — argmax of md5(key, shard) over shards) only keys whose new
    shard WINS move, ~new/(old+new) of them. The row computes both
    schemes' exact moved counts side by side — the table that justifies
    consistent hashing before an ops change, not after.

    Plan/scale: the HRW argmax is a 12-way literal explode + one
    bounded window per url (12 rows); mod is pure codegen; one 2-row
    agg."""
    k = F.col("o_orderkey")
    urls = _t(spark, sf_dir, "orders").select(k.alias("url_id"))
    mod = urls.select(
        F.lit("mod").alias("scheme"),
        ((F.col("url_id") % 8) != (F.col("url_id") % 12)).cast("long")
        .alias("moved"))
    shards = spark.range(0, 12).select(F.col("id").cast("int")
                                       .alias("shard"))
    cand = (urls.crossJoin(F.broadcast(shards))
            .select("url_id", "shard",
                    F.md5(F.concat(F.col("url_id").cast("string"),
                                   F.lit("-"),
                                   F.col("shard").cast("string")))
                    .alias("h")))
    w_old = Window.partitionBy("url_id").orderBy(F.col("h").desc(),
                                                 F.col("shard").asc())
    old = (cand.filter(F.col("shard") < 8)
           .withColumn("rk", F.row_number().over(w_old))
           .filter(F.col("rk") == 1)
           .select("url_id", F.col("shard").alias("old_shard")))
    new = (cand.withColumn("rk", F.row_number().over(w_old))
           .filter(F.col("rk") == 1)
           .select("url_id", F.col("shard").alias("new_shard")))
    hrw = (old.join(new, "url_id")
           .select(F.lit("rendezvous").alias("scheme"),
                   (F.col("old_shard") != F.col("new_shard"))
                   .cast("long").alias("moved")))
    return (mod.unionByName(hrw)
            .groupBy("scheme")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.sum("moved").cast("long").alias("n_moved"))
            .select("scheme", "n_urls", "n_moved",
                    F.expr("n_moved * 1000000 DIV n_urls").cast("long")
                    .alias("moved_ppm")))


ORACLE_URL_SHARD_HANDOFF = """
WITH urls AS (SELECT o_orderkey AS url_id FROM orders),
mod AS (
  SELECT 'mod' AS scheme,
         CASE WHEN url_id % 8 <> url_id % 12 THEN 1 ELSE 0 END AS moved
  FROM urls),
cand AS (
  SELECT u.url_id, s.shard,
         md5(CAST(u.url_id AS VARCHAR) || '-'
             || CAST(s.shard AS VARCHAR)) AS h
  FROM urls u CROSS JOIN
       (SELECT CAST(i AS INT) AS shard FROM range(0, 12) t(i)) s),
old AS (
  SELECT url_id, shard AS old_shard FROM (
    SELECT url_id, shard,
           row_number() OVER (PARTITION BY url_id
                              ORDER BY h DESC, shard ASC) AS rk
    FROM cand WHERE shard < 8) WHERE rk = 1),
new AS (
  SELECT url_id, shard AS new_shard FROM (
    SELECT url_id, shard,
           row_number() OVER (PARTITION BY url_id
                              ORDER BY h DESC, shard ASC) AS rk
    FROM cand) WHERE rk = 1),
hrw AS (
  SELECT 'rendezvous' AS scheme,
         CASE WHEN o.old_shard <> n.new_shard THEN 1 ELSE 0 END AS moved
  FROM old o JOIN new n ON n.url_id = o.url_id),
allr AS (SELECT * FROM mod UNION ALL SELECT * FROM hrw)
SELECT scheme,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(moved) AS BIGINT) AS n_moved,
       CAST(sum(moved) * 1000000 // count(*) AS BIGINT) AS moved_ppm
FROM allr GROUP BY scheme
"""


def q_url_kmv_overlap(spark, sf_dir):
    """KMV set-operation sketch BETWEEN two crawl snapshots — the
    mergeable-sketch algebra url_kmv_distinct only hints at: crawl A
    and crawl B each keep their k smallest URL hashes; the union
    sketch (k smallest of A∪B) estimates |A∪B| from its kth minimum,
    and the fraction of union-sketch members present in BOTH sets
    estimates Jaccard (Beyer et al. 2007) — how much of tonight's
    crawl is yesterday's, without ever joining the two URL sets at
    full width. Exact counterparts computed alongside so the row
    grades its own sketch error.

    All-integer estimator (31 · (2^60 DIV kth_min); ppm Jaccard) —
    both engines run the identical expression, so even the ESTIMATE
    matches bit-for-bit. Plan/scale: per-side distinct on the hash
    (the only URL-grain shuffle), a global top-k (TakeOrderedAndProject
    — never a full sort), and a 1-row agg."""
    k = 32
    u = F.col("o_orderkey") % 1500
    urls = (_t(spark, sf_dir, "orders")
            .select(u.alias("u"),
                    (u % 3 != 0).alias("in_a"),
                    (u % 2 != 0).alias("in_b"))
            .filter(F.col("in_a") | F.col("in_b"))
            .groupBy("u")
            .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
            .select("u", "in_a", "in_b",
                    F.conv(F.substring(F.md5(
                        F.concat(F.lit("http://site/u"),
                                 F.col("u").cast("string"))), 1, 15),
                        16, 10).cast("long").alias("h")))
    exact = urls.agg(
        F.sum(F.col("in_a").cast("long")).cast("long").alias("exact_a"),
        F.sum(F.col("in_b").cast("long")).cast("long").alias("exact_b"),
        F.sum((F.col("in_a") & F.col("in_b")).cast("long")).cast("long")
        .alias("exact_inter"),
        F.count("*").cast("long").alias("exact_union"))
    sketch = (urls.orderBy("h").limit(k)
              .agg(F.max("h").alias("kth"),
                   F.sum((F.col("in_a") & F.col("in_b")).cast("long"))
                   .alias("n_both")))
    # integer DIV everywhere — float division would round differently
    # across engines
    est_union = "(31 * (1152921504606846976 DIV kth))"
    return (exact.crossJoin(sketch).select(
        "exact_a", "exact_b", "exact_inter", "exact_union",
        F.expr(f"CAST({est_union} AS BIGINT)").alias("est_union"),
        F.expr(f"CAST(n_both * {est_union} DIV 32 AS BIGINT)")
        .alias("est_inter"),
        F.expr("CAST(n_both * 1000000 DIV 32 AS BIGINT)")
        .alias("jaccard_est_ppm"),
        F.expr("CAST(exact_inter * 1000000 DIV exact_union AS BIGINT)")
        .alias("jaccard_exact_ppm")))


ORACLE_URL_KMV_OVERLAP = """
WITH urls AS (
  SELECT u, max(in_a) AS in_a, max(in_b) AS in_b,
         ('0x' || substr(md5('http://site/u' || u), 1, 15))::BIGINT AS h
  FROM (SELECT o_orderkey % 1500 AS u,
               o_orderkey % 1500 % 3 <> 0 AS in_a,
               o_orderkey % 1500 % 2 <> 0 AS in_b
        FROM orders)
  WHERE in_a OR in_b
  GROUP BY u),
exact AS (
  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_a,
         CAST(sum(CASE WHEN in_b THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_b,
         CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
           AS exact_inter,
         CAST(count(*) AS BIGINT) AS exact_union
  FROM urls),
sk AS (
  SELECT max(h) AS kth,
         sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS n_both
  FROM (SELECT * FROM urls ORDER BY h LIMIT 32))
SELECT exact_a, exact_b, exact_inter, exact_union,
       CAST(31 * (1152921504606846976 // kth) AS BIGINT) AS est_union,
       CAST(n_both * (31 * (1152921504606846976 // kth)) // 32
            AS BIGINT) AS est_inter,
       CAST(n_both * 1000000 // 32 AS BIGINT) AS jaccard_est_ppm,
       CAST(exact_inter * 1000000 // exact_union AS BIGINT)
         AS jaccard_exact_ppm
FROM exact CROSS JOIN sk
"""


def q_url_blocklist_filter(spark, sf_dir):
    """Blocklist admission over the frontier candidate stream: hosts are
    blocked when they equal a blocklist entry or sit under it as a
    subdomain (label-boundary match via urls.blocklist_match — the
    admission gate the reference lacks; its only host filters are
    same-domain + extension, generic_parser admission caps).

    Deterministic synthesis: host = [www.|sK.|''] + name(c%6) + (k%10)
    + '.' + tld(k%4). Plan/scale: URL stream collapses to the
    DISTINCT-host census FIRST (one groupBy — the shuffle a 10^10-URL
    stream owes its per-host stats anyway); the suffix explode
    (<= label count) and the broadcast entry join run on the census
    only. Output: per-entry blocked census + the ALLOWED remainder."""
    from genesis_spark.functions import urls as _U

    k, c = F.col("o_orderkey"), F.col("o_custkey")
    name = F.element_at(
        F.array(F.lit("ads"), F.lit("track"), F.lit("spam"),
                F.lit("cdn"), F.lit("site"), F.lit("shop")),
        (c % 6 + 1).cast("int"))
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net"), F.lit("io")),
        (k % 4 + 1).cast("int"))
    sub = (F.when(k % 3 == 0, F.lit("www."))
           .when(k % 3 == 1,
                 F.concat(F.lit("s"), (c % 5).cast("string"), F.lit(".")))
           .otherwise(F.lit("")))
    host = F.concat(sub, name, (k % 10).cast("string"), F.lit("."), tld)
    urls = _t(spark, sf_dir, "orders").select(host.alias("host"))
    census = urls.groupBy("host").agg(
        F.count("*").cast("long").alias("n_urls"))
    entries = spark.createDataFrame([(e,) for e in _BLOCKLIST51],
                                    "entry string")
    tagged = _U.blocklist_match(census, entries)
    return (tagged
            .groupBy(F.coalesce("matched_entry", F.lit("ALLOWED"))
                     .alias("matched_entry"))
            .agg(F.count("*").cast("long").alias("n_hosts"),
                 F.sum("n_urls").cast("long").alias("n_urls")))


ORACLE_URL_BLOCKLIST_FILTER = """
WITH hosts AS (
  SELECT (CASE WHEN o_orderkey % 3 = 0 THEN 'www.'
               WHEN o_orderkey % 3 = 1 THEN 's' || (o_custkey % 5) || '.'
               ELSE '' END)
         || (CASE o_custkey % 6 WHEN 0 THEN 'ads' WHEN 1 THEN 'track'
                 WHEN 2 THEN 'spam' WHEN 3 THEN 'cdn' WHEN 4 THEN 'site'
                 ELSE 'shop' END)
         || (o_orderkey % 10)
         || '.'
         || (CASE o_orderkey % 4 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
                 WHEN 2 THEN 'net' ELSE 'io' END) AS host
  FROM orders),
census AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM hosts GROUP BY 1),
bl AS (
  SELECT unnest(['ads4.com', 'track3.org', 'spam2.net', 'shop9.io',
                 'cdn6.net', 'www.site8.com', 'mal4.io']) AS entry),
matched AS (
  SELECT c.host, min(b.entry) AS matched_entry
  FROM census c JOIN bl b
    ON c.host = b.entry OR c.host LIKE '%.' || b.entry
  GROUP BY c.host)
SELECT coalesce(m.matched_entry, 'ALLOWED') AS matched_entry,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(c.n_urls) AS BIGINT) AS n_urls
FROM census c LEFT JOIN matched m ON c.host = m.host
GROUP BY 1
"""


def q_url_pattern_mine(spark, sf_dir):
    """URL template mining: collapse digit runs to {N} and long hex ids
    to {H}, then rank each host's top-3 templates by URL volume — the
    structure inventory crawl rules are written from (which listing/
    pagination/profile patterns dominate a host), the per-template
    complement to url_trap_detect's per-host explosion ratio.

    variability_ppm = distinct raw URLs per template occurrence: ~1e6
    means every hit is a fresh URL (id-bearing template), small means a
    static page re-encountered. Plan/scale: one groupBy (host,
    template) with count-distinct, one per-host top-3 window over the
    TEMPLATE census (bounded rows/host), never a global URL sort."""
    lk, pk, ln = (F.col("l_orderkey"), F.col("l_partkey"),
                  F.col("l_linenumber"))
    m = lk % 4
    path = (F.when(m == 0, F.concat(F.lit("/item/"),
                                    (pk % 90000).cast("string"),
                                    F.lit("/v"), ln.cast("string")))
            .when(m == 1, F.concat(F.lit("/p"), (pk % 15).cast("string")))
            .when(m == 2, F.concat(F.lit("/u/"),
                                   F.substring(F.md5(pk.cast("string")),
                                               1, 6),
                                   F.lit("/profile")))
            .otherwise(F.lit("/static/css")))
    urls = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("h"), (lk % 25).cast("string")).alias("host_key"),
        path.alias("path"))
    tmpl = F.regexp_replace(
        F.regexp_replace("path", "[0-9a-f]{6,}", "{H}"), "[0-9]+", "{N}")
    agg = (urls.groupBy("host_key", tmpl.alias("template"))
           .agg(F.count("*").cast("long").alias("n_urls"),
                F.countDistinct("path").cast("long").alias("n_distinct")))
    w = Window.partitionBy("host_key").orderBy(F.desc("n_urls"),
                                               "template")
    return (agg.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= 3)
            .withColumn("variability_ppm",
                        F.expr("n_distinct * 1000000 DIV n_urls")
                        .cast("long")))


ORACLE_URL_PATTERN_MINE = """
WITH u AS (
  SELECT 'h' || (l_orderkey % 25) AS host_key,
         CASE l_orderkey % 4
           WHEN 0 THEN '/item/' || (l_partkey % 90000) || '/v'
                       || l_linenumber
           WHEN 1 THEN '/p' || (l_partkey % 15)
           WHEN 2 THEN '/u/' || substr(md5(l_partkey::VARCHAR), 1, 6)
                       || '/profile'
           ELSE '/static/css' END AS path
  FROM lineitem),
a AS (
  SELECT host_key,
         regexp_replace(regexp_replace(path, '[0-9a-f]{6,}', '{H}', 'g'),
                        '[0-9]+', '{N}', 'g') AS template,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT path) AS BIGINT) AS n_distinct
  FROM u GROUP BY 1, 2),
r AS (
  SELECT *, row_number() OVER (PARTITION BY host_key
              ORDER BY n_urls DESC, template) AS rnk
  FROM a)
SELECT host_key, template, n_urls, n_distinct, CAST(rnk AS BIGINT) AS rnk,
       CAST(n_distinct * 1000000 // n_urls AS BIGINT) AS variability_ppm
FROM r WHERE rnk <= 3
"""


def q_url_scheme_consolidate(spark, sf_dir):
    """http<->https duplicate consolidation census — the canonical-
    scheme cleanup every URL-seen set needs (the same page crawled
    under both schemes is the cheapest duplicate class there is):
    per (host, path), which schemes were seen; per host, how much of
    the URL space is dual-scheme (consolidatable to https), https-only
    (done), or http-only (the migration backlog). Exact counts + ppm.

    Plan/scale: one (host, path)-keyed agg over the URL stream, then a
    host census agg — both map-side combinable; no joins."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    urls = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (c % 20).cast("string")).alias("host"),
        F.concat(F.lit("/p"), (k % 30).cast("string")).alias("path"),
        F.when(F.expr("(o_orderkey DIV 30) % 2 = 0"), "https")
        .otherwise("http").alias("scheme"))
    pages = (urls.groupBy("host", "path")
             .agg(F.max(F.when(F.col("scheme") == "http", 1).otherwise(0))
                  .alias("has_http"),
                  F.max(F.when(F.col("scheme") == "https", 1).otherwise(0))
                  .alias("has_https")))
    return (pages.groupBy("host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_paths"),
                 F.sum(F.when((F.col("has_http") == 1)
                              & (F.col("has_https") == 1), 1)
                       .otherwise(0)).cast("long").alias("n_dual"),
                 F.sum(F.when((F.col("has_http") == 1)
                              & (F.col("has_https") == 0), 1)
                       .otherwise(0)).cast("long").alias("n_http_only"),
                 F.sum(F.when((F.col("has_http") == 0)
                              & (F.col("has_https") == 1), 1)
                       .otherwise(0)).cast("long").alias("n_https_only"))
            .withColumn("dual_ppm", F.expr(
                "(n_dual * 1000000) DIV greatest(n_paths, 1)")))


ORACLE_URL_SCHEME_CONSOLIDATE = """
WITH urls AS (
  SELECT 'h' || (o_custkey % 20) AS host,
         '/p' || (o_orderkey % 30) AS path,
         CASE WHEN (o_orderkey // 30) % 2 = 0 THEN 'https' ELSE 'http'
           END AS scheme
  FROM orders),
pages AS (
  SELECT host, path,
         max(CASE WHEN scheme = 'http' THEN 1 ELSE 0 END) AS has_http,
         max(CASE WHEN scheme = 'https' THEN 1 ELSE 0 END) AS has_https
  FROM urls GROUP BY host, path)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_paths,
       CAST(sum(CASE WHEN has_http = 1 AND has_https = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dual,
       CAST(sum(CASE WHEN has_http = 1 AND has_https = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_http_only,
       CAST(sum(CASE WHEN has_http = 0 AND has_https = 1
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_https_only,
       (CAST(sum(CASE WHEN has_http = 1 AND has_https = 1
                      THEN 1 ELSE 0 END) AS BIGINT) * 1000000)
         // greatest(count(*), 1) AS dual_ppm
FROM pages GROUP BY host
"""


def q_url_dot_segments(spark, sf_dir):
    """RFC 3986 §5.2.4 dot-segment removal — the canonicalization step
    relative-URL resolution forces on a crawler ('/a/./b/../c' and
    '/a/c' are the SAME resource, and a URL-seen set that misses this
    double-fetches): './' collapse, 'seg/../' collapse, trailing '/.'
    and 'seg/..', and leading '/../' clamp to root. The spec's stack
    algorithm is sequential; here it is a FIXED cascade of global
    regexp passes (both engines scan the original string left-to-right,
    non-overlapping — identical semantics), with enough passes for the
    synth family's nesting depth; the unit test checks every output
    against the real RFC stack algorithm in Python.

    Plan/scale: zero-shuffle pure map — fuses into the URL scan."""
    k = F.col("o_orderkey")
    base = F.concat(F.lit("/s"), (k % 7).cast("string"),
                    F.lit("/d"), (k % 3).cast("string"))
    raw = (F.when(k % 5 == 0, base)
           .when(k % 5 == 1,
                 F.concat(F.lit("/s"), (k % 7).cast("string"),
                          F.lit("/./d"), (k % 3).cast("string")))
           .when(k % 5 == 2,
                 F.concat(F.lit("/s"), (k % 7).cast("string"),
                          F.lit("/x/../d"), (k % 3).cast("string")))
           .when(k % 5 == 3, F.concat(base, F.lit("/.")))
           .otherwise(F.concat(F.lit("/.."), base)))
    d = _t(spark, sf_dir, "orders").select(k.alias("url_id"),
                                           raw.alias("raw_path"))
    p = F.col("raw_path")
    for _ in range(3):  # './' then 'seg/../' collapse, 3 levels deep
        p = F.regexp_replace(p, "/\\./", "/")
        p = F.regexp_replace(p, "/[^/.][^/]*/\\.\\./", "/")
    p = F.regexp_replace(p, "/[^/.][^/]*/\\.\\.$", "/")
    p = F.regexp_replace(p, "/\\.$", "/")
    for _ in range(2):  # leading '/../' clamps to root
        p = F.regexp_replace(p, "^/\\.\\.(/|$)", "/")
    return d.select("url_id", "raw_path", p.alias("clean_path"),
                    (F.col("raw_path") != p).cast("int")
                    .alias("changed"))


ORACLE_URL_DOT_SEGMENTS = f"""
WITH d AS (
  SELECT o_orderkey AS url_id,
         CASE o_orderkey % 5
           WHEN 0 THEN '/s' || (o_orderkey % 7) || '/d' || (o_orderkey % 3)
           WHEN 1 THEN '/s' || (o_orderkey % 7) || '/./d'
                       || (o_orderkey % 3)
           WHEN 2 THEN '/s' || (o_orderkey % 7) || '/x/../d'
                       || (o_orderkey % 3)
           WHEN 3 THEN '/s' || (o_orderkey % 7) || '/d' || (o_orderkey % 3)
                       || '/.'
           ELSE '/..' || '/s' || (o_orderkey % 7) || '/d'
                || (o_orderkey % 3)
         END AS raw_path
  FROM orders)
SELECT url_id, raw_path, {_dot_seg_sql()} AS clean_path,
       CAST(CASE WHEN raw_path <> {_dot_seg_sql()} THEN 1 ELSE 0 END
            AS INT) AS changed
FROM d
"""


def q_url_soft404_detect(spark, sf_dir):
    """Soft-404 detection — pages that answer HTTP 200 but serve the
    host's error page (the classic index-pollution bug: a CMS that
    '200 OK's its not-found template poisons the URL-seen set AND the
    training corpus with thousands of identical junk docs). Protocol:
    each host gets a PROBE fetch of a known-nonexistent path; the
    probe's content digest is the host's error fingerprint, and a
    probe that answers 200 marks the host as a soft-404 server. Every
    regular 200 page whose digest equals the host's error fingerprint
    is then a soft-404 hit.

    Exactness: digest equality + exact counts + integer DIV ppm.

    Plan/scale: the probe census is |hosts| rows and broadcasts back
    onto the page stream (one broadcast hash join, no shuffle of the
    pages); the final per-host rollup is map-side combinable."""
    k = F.col("o_orderkey")
    host_id, seq = k % 40, (k / 40).cast("long")
    soft = host_id % 7 == 0
    is_probe = seq % 25 == 0
    host = F.concat(F.lit("h"), host_id.cast("string"))
    digest = (F.when(is_probe, F.concat(F.lit("err-"), host))
              .when(soft & (seq % 5 == 0), F.concat(F.lit("err-"), host))
              .otherwise(F.concat(F.lit("doc-"), k.cast("string"))))
    status = (F.when(is_probe & soft, F.lit(200))
              .when(is_probe, F.lit(404))
              .otherwise(F.lit(200)))
    fetches = _t(spark, sf_dir, "orders").select(
        host.alias("host"), is_probe.cast("int").alias("is_probe"),
        digest.alias("digest"), status.alias("status"))
    probes = (fetches.filter(F.col("is_probe") == 1)
              .groupBy("host")
              .agg(F.min("digest").alias("err_digest"),
                   F.max((F.col("status") == 200).cast("int"))
                   .alias("soft_host")))
    pages = fetches.filter(F.col("is_probe") == 0)
    joined = pages.join(F.broadcast(probes), "host")
    return (joined.groupBy("host", "soft_host")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum(((F.col("status") == 200)
                        & (F.col("digest") == F.col("err_digest")))
                       .cast("long")).alias("n_soft404"))
            .select("host", "n_pages", "n_soft404",
                    F.expr("n_soft404 * 1000000 DIV n_pages")
                    .cast("long").alias("soft404_ppm"),
                    F.col("soft_host").cast("int").alias("soft_host")))


ORACLE_URL_SOFT404_DETECT = """
WITH f AS (
  SELECT 'h' || (o_orderkey % 40) AS host,
         CASE WHEN (o_orderkey // 40) % 25 = 0 THEN 1 ELSE 0 END
           AS is_probe,
         CASE
           WHEN (o_orderkey // 40) % 25 = 0
             THEN 'err-h' || (o_orderkey % 40)
           WHEN (o_orderkey % 40) % 7 = 0
                AND (o_orderkey // 40) % 5 = 0
             THEN 'err-h' || (o_orderkey % 40)
           ELSE 'doc-' || o_orderkey
         END AS digest,
         CASE
           WHEN (o_orderkey // 40) % 25 = 0
                AND (o_orderkey % 40) % 7 = 0 THEN 200
           WHEN (o_orderkey // 40) % 25 = 0 THEN 404
           ELSE 200
         END AS status
  FROM orders),
probes AS (
  SELECT host, min(digest) AS err_digest,
         max(CASE WHEN status = 200 THEN 1 ELSE 0 END) AS soft_host
  FROM f WHERE is_probe = 1 GROUP BY host),
agg AS (
  SELECT p.host, pr.soft_host,
         CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(CASE WHEN p.status = 200
                        AND p.digest = pr.err_digest
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_soft404
  FROM f p JOIN probes pr USING (host)
  WHERE p.is_probe = 0
  GROUP BY p.host, pr.soft_host)
SELECT host, n_pages, n_soft404,
       CAST(n_soft404 * 1000000 // n_pages AS BIGINT) AS soft404_ppm,
       CAST(soft_host AS INT) AS soft_host
FROM agg
"""


def q_url_lang_variant(spark, sf_dir):
    """Language-variant URL families — /en/ /fr/ /de/ path-prefix
    aliases of the same logical page (the hreflang-cluster dedup a
    crawler needs: the variants are near-identical for URL-seen and
    corpus purposes, and a politeness budget that treats them as
    independent pages re-crawls each page up to |langs|+1 times).
    Family key = (host, stem) where the stem is the path with the
    leading language label stripped; emits the per-family variant
    census and the consolidation win (dup_urls = variants - 1).

    Exactness: regexp prefix strip is identical RE semantics in both
    engines; lang list is a sorted-distinct join (total order).

    Plan/scale: pure-map lang-prefix parse fused into the scan + ONE
    (host, stem) census agg; family cardinality ~= |logical pages|."""
    k = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (k % 10).cast("string"))
    pid = (k / 40).cast("long") % 50
    lv = (k / 10).cast("long") % 4  # decoupled from host parity
    lang = (F.when(lv == 1, "/en").when(lv == 2, "/fr")
            .when(lv == 3, "/de").otherwise(""))
    path = F.concat(lang, F.lit("/p"), pid.cast("string"))
    urls = _t(spark, sf_dir, "orders").select(
        host.alias("host"), path.alias("path"))
    parsed = urls.select(
        "host",
        F.regexp_extract("path", "^/(en|fr|de)/", 1).alias("lang"),
        F.regexp_replace("path", "^/(en|fr|de)/", "/").alias("stem"))
    return (parsed.groupBy("host", "stem")
            .agg(F.count(F.lit(1)).cast("long").alias("n_fetches"),
                 F.countDistinct(
                     F.when(F.col("lang") != "", F.col("lang")))
                 .cast("long").alias("n_langs"),
                 F.max((F.col("lang") == "").cast("int"))
                 .alias("has_default"),
                 F.array_join(F.array_sort(F.collect_set(
                     F.when(F.col("lang") != "", F.col("lang")))), ",")
                 .alias("langs"))
            .withColumn("n_variants",
                        (F.col("n_langs")
                         + F.col("has_default").cast("long"))
                        .cast("long"))
            .withColumn("dup_urls", (F.col("n_variants") - 1)
                        .cast("long"))
            .select("host", "stem", "n_fetches", "n_variants", "n_langs",
                    "has_default", "langs", "dup_urls"))


ORACLE_URL_LANG_VARIANT = """
WITH u AS (
  SELECT 'h' || (o_orderkey % 10) AS host,
         CASE (o_orderkey // 10) % 4 WHEN 1 THEN '/en' WHEN 2 THEN '/fr'
                                     WHEN 3 THEN '/de' ELSE '' END
           || '/p' || ((o_orderkey // 40) % 50) AS path
  FROM orders),
p AS (
  SELECT host,
         CASE WHEN regexp_matches(path, '^/(en|fr|de)/')
              THEN regexp_extract(path, '^/(en|fr|de)/', 1) ELSE '' END
           AS lang,
         regexp_replace(path, '^/(en|fr|de)/', '/') AS stem
  FROM u)
SELECT host, stem,
       CAST(count(*) AS BIGINT) AS n_fetches,
       CAST(count(DISTINCT CASE WHEN lang <> '' THEN lang END)
            AS BIGINT) AS n_langs,
       CAST(max(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS INT)
         AS has_default,
       coalesce(string_agg(DISTINCT CASE WHEN lang <> '' THEN lang END,
                           ',' ORDER BY CASE WHEN lang <> ''
                                             THEN lang END), '')
         AS langs,
       CAST(count(DISTINCT CASE WHEN lang <> '' THEN lang END)
            + max(CASE WHEN lang = '' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_variants,
       CAST(count(DISTINCT CASE WHEN lang <> '' THEN lang END)
            + max(CASE WHEN lang = '' THEN 1 ELSE 0 END) - 1 AS BIGINT)
         AS dup_urls
FROM p GROUP BY host, stem
"""


def q_url_pct_normalize(spark, sf_dir):
    """RFC 3986 §6.2.2.2 percent-encoding normalization
    (functions/urls.py:pct_normalize_expr): unreserved escapes decode
    (%7E -> ~, %41 -> A), reserved escapes keep their encoding but get
    uppercase hex (%2f -> %2F), malformed escapes (bare % not followed
    by two hex digits) pass through byte-identical. The missing half
    of the P1 canonicalizer: without it /%7euser and /~user are two
    frontier entries, two politeness slots, and two corpus docs.

    Exactness: the kernel is engine-neutral by construction (strpos
    arithmetic over a literal hex alphabet, leftmost-first regexp
    tokenization — identical in Java regex and RE2); the oracle states
    the expected normalized form per fixture branch CLOSED-FORM, so a
    value-hash match proves the whole transform. Generality beyond the
    fixture shapes is pinned by the pure-Python parity test
    (tests/test_block63_ops.py) over adversarial escapes.

    Plan/scale: zero-exchange pure map — fuses into the scan; the
    tokenize/transform sits in a single project node."""
    from genesis_spark.functions.urls import pct_normalize_expr

    k = F.col("o_orderkey")
    m = k % 6
    host = F.concat(F.lit("http://ex"), (k % 7).cast("string"),
                    F.lit(".com/"))
    url = (F.when(m == 0, F.concat(host, F.lit("%7euser"),
                                   (k % 10).cast("string")))
           .when(m == 1, F.concat(host, F.lit("a%2fb/p"),
                                  k.cast("string")))
           .when(m == 2, F.concat(host, F.lit("%41%42c"),
                                  (k % 10).cast("string")))
           .when(m == 3, F.concat(host, F.lit("100%25off")))
           .when(m == 4, F.concat(host, F.lit("a%zzq"),
                                  (k % 10).cast("string")))
           .otherwise(F.concat(host, F.lit("p"), k.cast("string"))))
    urls = _t(spark, sf_dir, "orders").select(url.alias("url"))
    return (urls
            .withColumn("url_norm", pct_normalize_expr("url"))
            .withColumn("changed",
                        (F.col("url_norm") != F.col("url")).cast("int")))


ORACLE_URL_PCT_NORMALIZE = """
WITH u AS (
  SELECT o_orderkey AS k,
         'http://ex' || (o_orderkey % 7) || '.com/' AS h,
         o_orderkey % 6 AS m
  FROM orders)
SELECT CASE m WHEN 0 THEN h || '%7euser' || (k % 10)
              WHEN 1 THEN h || 'a%2fb/p' || k
              WHEN 2 THEN h || '%41%42c' || (k % 10)
              WHEN 3 THEN h || '100%25off'
              WHEN 4 THEN h || 'a%zzq' || (k % 10)
              ELSE h || 'p' || k END AS url,
       CASE m WHEN 0 THEN h || '~user' || (k % 10)
              WHEN 1 THEN h || 'a%2Fb/p' || k
              WHEN 2 THEN h || 'ABc' || (k % 10)
              WHEN 3 THEN h || '100%25off'
              WHEN 4 THEN h || 'a%zzq' || (k % 10)
              ELSE h || 'p' || k END AS url_norm,
       CASE WHEN m IN (0, 1, 2) THEN 1 ELSE 0 END AS changed
FROM u
"""


def q_url_rel_canonical(spark, sf_dir):
    """rel=canonical consolidation — the page-DECLARED dedup signal a
    crawler folds in before any content dedup runs: extract
    ``<link rel="canonical" href>`` from the head, treat an absent
    declaration as self-canonical (the spec default), and roll pages
    up by canonical TARGET. Cross-host canonicals are counted
    separately — they move indexing authority across domains and a
    polite crawler treats them as a trust decision, not a rewrite.

    Exactness: both engines parse the same synthesized head with the
    same regex; the self/cross/cross-host classification is string
    equality on closed-form URLs; counts are exact.

    Plan/scale: extraction is a zero-exchange map; the rollup is ONE
    map-side-combinable census keyed on canonical target."""
    k = F.col("o_orderkey")
    m = k % 4
    host = F.concat(F.lit("http://h"), (k % 10).cast("string"),
                    F.lit(".onion"))
    own = F.concat(host, F.lit("/p"), k.cast("string"))
    target = (F.when(m == 0, own)
              .when(m == 1, F.concat(host, F.lit("/p"),
                                     F.expr("(o_orderkey DIV 5) * 5")
                                     .cast("string")))
              .when(m == 3, F.concat(F.lit("http://h0.onion/p"),
                                     (k % 50).cast("string")))
              .otherwise(F.lit(None).cast("string")))
    html = F.when(target.isNotNull(), F.concat(
        F.lit('<head><link rel="canonical" href="'), target,
        F.lit('"></head>'))).otherwise(F.lit("<head></head>"))
    pages = _t(spark, sf_dir, "orders").select(
        own.alias("url"), html.alias("html"))
    declared = F.nullif(F.regexp_extract(
        "html", '<link rel="canonical" href="([^"]*)"', 1), F.lit(""))
    canon = F.coalesce(declared, F.col("url"))
    hk = F.regexp_extract("url", r"^http://([^/]+)", 1)
    ck = F.regexp_extract(canon, r"^http://([^/]+)", 1)
    classified = pages.select(
        canon.alias("canonical_url"),
        (canon == F.col("url")).cast("int").alias("is_self"),
        ((canon != F.col("url")) & (hk == ck)).cast("int")
        .alias("is_cross"),
        (hk != ck).cast("int").alias("is_cross_host"))
    return (classified.groupBy("canonical_url")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum("is_self").cast("long").alias("n_self"),
                 F.sum("is_cross").cast("long").alias("n_cross"),
                 F.sum("is_cross_host").cast("long")
                 .alias("n_cross_host")))


ORACLE_URL_REL_CANONICAL = """
WITH p AS (
  SELECT 'http://h' || (o_orderkey % 10) || '.onion/p' || o_orderkey
           AS url,
         CASE o_orderkey % 4
           WHEN 0 THEN 'http://h' || (o_orderkey % 10) || '.onion/p'
                       || o_orderkey
           WHEN 1 THEN 'http://h' || (o_orderkey % 10) || '.onion/p'
                       || ((o_orderkey // 5) * 5)
           WHEN 3 THEN 'http://h0.onion/p' || (o_orderkey % 50)
           ELSE NULL END AS declared
  FROM orders),
c AS (
  SELECT url, coalesce(declared, url) AS canonical_url,
         regexp_extract(url, '^http://([^/]+)', 1) AS hk,
         regexp_extract(coalesce(declared, url),
                        '^http://([^/]+)', 1) AS ck
  FROM p)
SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_pages,
       CAST(sum(CASE WHEN canonical_url = url THEN 1 ELSE 0 END)
            AS BIGINT) AS n_self,
       CAST(sum(CASE WHEN canonical_url <> url AND hk = ck
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
       CAST(sum(CASE WHEN hk <> ck THEN 1 ELSE 0 END) AS BIGINT)
         AS n_cross_host
FROM c GROUP BY canonical_url
"""


def q_url_content_agreement(spark, sf_dir):
    """URL-key vs content-hash dedup DISAGREEMENT audit — the
    consistency check between the two dedup identities the engine
    maintains (P1's canonical URL key and exact content digests):
    URL groups serving >1 distinct content are drift/soft-404-family
    suspects; content groups reachable under >1 URL are mirrors the
    URL-seen set cannot catch (exactly why content dedup exists). Run
    over the twin-injected corpus so both disagreement classes are
    guaranteed non-empty.

    Exactness: md5 content digests and closed-form URL keys; every
    census term is an exact integer.

    Plan/scale: two census aggs over (key, digest) pairs — the wide
    text never shuffles (digest computed at the scan); output is one
    audit row."""
    c = _corpus(spark, sf_dir).filter(F.col("text").isNotNull())
    keyed = c.select(
        F.concat(F.lit("http://m"), (F.col("doc_id") % 40).cast("string"),
                 F.lit(".onion/d"), (F.col("doc_id") % 13).cast("string"))
        .alias("url_key"),
        F.md5("text").alias("digest"))
    urlg = (keyed.groupBy("url_key")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.countDistinct("digest").alias("n_content")))
    cong = (keyed.groupBy("digest")
            .agg(F.countDistinct("url_key").alias("n_urls")))
    u = urlg.agg(
        F.count(F.lit(1)).cast("long").alias("n_url_groups"),
        F.sum((F.col("n_docs") > 1).cast("int")).cast("long")
        .alias("n_url_multi_doc"),
        F.sum((F.col("n_content") > 1).cast("int")).cast("long")
        .alias("n_url_drift"))
    g = cong.agg(
        F.count(F.lit(1)).cast("long").alias("n_content_groups"),
        F.sum((F.col("n_urls") > 1).cast("int")).cast("long")
        .alias("n_content_multi_url"))
    return u.crossJoin(g)


ORACLE_URL_CONTENT_AGREEMENT = f"""
WITH {_CORPUS_SQL},
keyed AS (
  SELECT 'http://m' || (doc_id % 40) || '.onion/d' || (doc_id % 13)
           AS url_key,
         md5(text) AS digest
  FROM corpus WHERE text IS NOT NULL),
urlg AS (
  SELECT url_key, count(*) AS n_docs,
         count(DISTINCT digest) AS n_content
  FROM keyed GROUP BY url_key),
cong AS (
  SELECT digest, count(DISTINCT url_key) AS n_urls
  FROM keyed GROUP BY digest)
SELECT
  (SELECT CAST(count(*) AS BIGINT) FROM urlg) AS n_url_groups,
  (SELECT CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
   FROM urlg) AS n_url_multi_doc,
  (SELECT CAST(sum(CASE WHEN n_content > 1 THEN 1 ELSE 0 END) AS BIGINT)
   FROM urlg) AS n_url_drift,
  (SELECT CAST(count(*) AS BIGINT) FROM cong) AS n_content_groups,
  (SELECT CAST(sum(CASE WHEN n_urls > 1 THEN 1 ELSE 0 END) AS BIGINT)
   FROM cong) AS n_content_multi_url
"""


def q_url_normalize_pipeline(spark, sf_dir):
    """The FULL URL canonicalizer as one composed row — the pipeline a
    frontier actually runs before the URL-seen probe, chaining four
    individually-verified kernels in their production order:
    (1) P1 canonicalize (scheme/netloc lowercase, www-strip, trailing
    slash), (2) RFC 3986 percent-encoding normalization
    (url_pct_normalize's kernel), (3) dot-segment removal cascade
    (url_dot_segments' passes), (4) tracking-param strip
    (url_param_strip's filter). A fixture branch exercises each stage
    alone and in combination; the oracle states the expected FINAL
    form closed-form, so the hash verifies the COMPOSITION — kernel
    order matters (lowercasing after escape-normalization would break
    hex case; param-stripping before dot-removal would miss moved
    queries) and this row pins it.

    Plan/scale: the whole chain is ONE zero-exchange project —
    regexps, array ops, no shuffle, fused into the URL scan."""
    from genesis_spark.functions.urls import (canonicalize_expr,
                                              pct_normalize_expr)

    k = F.col("o_orderkey")
    h = (k % 9).cast("string")
    m = k % 6
    raw = (F.when(m == 0, F.concat(
        F.lit("HTTP://WWW.Site"), h, F.lit(".Onion/A/./B%7Ez/p"),
        k.cast("string"), F.lit("//?a=1&utm_source=x")))
        .when(m == 1, F.concat(
            F.lit("http://www.site"), h, F.lit(".onion/x/../%41"),
            k.cast("string"), F.lit("?utm_campaign=c")))
        .when(m == 2, F.concat(F.lit("HTTP://Site"), h,
                               F.lit(".Onion/p"), k.cast("string"),
                               F.lit("/")))
        .when(m == 3, F.concat(
            F.lit("http://site"), h, F.lit(".onion/a/b/../c%2fd?x="),
            (k % 7).cast("string"), F.lit("&ref=t")))
        .when(m == 4, F.concat(F.lit("http://site"), h,
                               F.lit(".onion/%7euser"),
                               (k % 10).cast("string"),
                               F.lit("/./docs")))
        .otherwise(F.concat(F.lit("http://site"), h, F.lit(".onion/ok"),
                            k.cast("string"))))
    u = _t(spark, sf_dir, "orders").select(k.alias("url_id"),
                                           raw.alias("raw"))
    # stage 1+2: canonicalize, then escape-normalize
    u = u.withColumn("_c", canonicalize_expr(F.col("raw")))
    u = u.withColumn("_p", pct_normalize_expr("_c"))
    # stage 3: dot-segment cascade (url_dot_segments' passes)
    p = F.col("_p")
    for _ in range(3):
        p = F.regexp_replace(p, r"/\./", "/")
        p = F.regexp_replace(p, r"/[^/.][^/]*/\.\./", "/")
    u = u.withColumn("_d", p)
    # stage 4: tracking-param strip (url_param_strip's filter)
    q = F.regexp_extract("_d", r"\?(.*)$", 1)
    pre = F.regexp_replace("_d", r"\?.*$", "")
    kept = F.filter(F.split(q, "&"),
                    lambda x: ~(x.rlike("^(utm_[A-Za-z0-9_]*|ref|fbclid)=")))
    final = F.when((q != "") & (F.size(kept) > 0),
                   F.concat(pre, F.lit("?"), F.array_join(kept, "&"))) \
             .otherwise(pre)
    return u.select("url_id", F.col("raw").alias("url_raw"),
                    final.alias("url_norm"))


ORACLE_URL_NORMALIZE_PIPELINE = """
WITH u AS (
  SELECT o_orderkey AS url_id, o_orderkey AS k,
         CAST(o_orderkey % 9 AS VARCHAR) AS h, o_orderkey % 6 AS m
  FROM orders)
SELECT url_id,
       CASE m
         WHEN 0 THEN 'HTTP://WWW.Site' || h || '.Onion/A/./B%7Ez/p' || k
                     || '//?a=1&utm_source=x'
         WHEN 1 THEN 'http://www.site' || h || '.onion/x/../%41' || k
                     || '?utm_campaign=c'
         WHEN 2 THEN 'HTTP://Site' || h || '.Onion/p' || k || '/'
         WHEN 3 THEN 'http://site' || h || '.onion/a/b/../c%2fd?x='
                     || (k % 7) || '&ref=t'
         WHEN 4 THEN 'http://site' || h || '.onion/%7euser' || (k % 10)
                     || '/./docs'
         ELSE 'http://site' || h || '.onion/ok' || k END AS url_raw,
       CASE m
         WHEN 0 THEN 'http://www.site' || h || '.onion/A/B~z/p' || k
                     || '?a=1'
         WHEN 1 THEN 'http://site' || h || '.onion/A' || k
         WHEN 2 THEN 'http://site' || h || '.onion/p' || k
         WHEN 3 THEN 'http://site' || h || '.onion/a/c%2Fd?x=' || (k % 7)
         WHEN 4 THEN 'http://site' || h || '.onion/~user' || (k % 10)
                     || '/docs'
         ELSE 'http://site' || h || '.onion/ok' || k END AS url_norm
FROM u
"""


def q_url_session_params(spark, sf_dir):
    """Session-id query-parameter mining — the cardinality-based
    companion to url_param_strip's fixed blocklist (Heritrix/Nutch
    learn strip-lists this way): per query-param KEY, how many URLs
    carry it and how many DISTINCT values it takes; a key whose
    values are (nearly) unique per URL (sid-style tokens) is an
    alias-generator the canonicalizer must strip, while low-
    cardinality keys (a=0..4, page=0..6) are real routing params.
    Flags keys with distinct/occurrences > 0.5 at support >= 20.

    Fixture: orders-derived URLs carry a stable 'a' param, a
    modular 'page' param on every 3rd URL, an md5-unique 'sid' on
    every 2nd, and a quarter-cardinality 'v' on every 5th.

    Plan/scale: split+explode the query string, ONE groupBy(key)
    with count + approx-free exact count(DISTINCT) — at 10^10 URLs
    the key space is tiny (Heaps-law params), so the agg reduces
    map-side; the URL strings themselves never shuffle."""
    k = F.col("o_orderkey")
    q = F.concat(
        F.lit("a="), (k % 5).cast("string"),
        F.when(k % 3 == 0, F.concat(F.lit("&page="),
                                    (k % 7).cast("string")))
         .otherwise(F.lit("")),
        F.when(k % 2 == 0, F.concat(F.lit("&sid="),
                                    F.md5(k.cast("string"))))
         .otherwise(F.lit("")),
        F.when(k % 5 == 0, F.concat(F.lit("&v="),
                                    (k % 97).cast("string")))
         .otherwise(F.lit("")))
    urls = (_t(spark, sf_dir, "orders")
            .select(k.alias("o_orderkey"), q.alias("qs")))
    kv = urls.select(F.explode(F.split("qs", "&")).alias("pair"))
    keyed = kv.select(
        F.substring_index("pair", "=", 1).alias("param_key"),
        F.substring_index("pair", "=", -1).alias("param_val"))
    return (keyed.groupBy("param_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                 F.countDistinct("param_val").cast("long")
                 .alias("n_distinct"))
            .withColumn("distinct_ppm",
                        F.expr("n_distinct * 1000000 DIV n_urls")
                        .cast("long"))
            .withColumn("is_session_like",
                        ((F.col("distinct_ppm") > 500000)
                         & (F.col("n_urls") >= 20)).cast("int")))


ORACLE_URL_SESSION_PARAMS = """
WITH u AS (
  SELECT o_orderkey,
         'a=' || (o_orderkey % 5)
         || CASE WHEN o_orderkey % 3 = 0
                 THEN '&page=' || (o_orderkey % 7) ELSE '' END
         || CASE WHEN o_orderkey % 2 = 0
                 THEN '&sid=' || md5(CAST(o_orderkey AS VARCHAR))
                 ELSE '' END
         || CASE WHEN o_orderkey % 5 = 0
                 THEN '&v=' || (o_orderkey % 97) ELSE '' END AS qs
  FROM orders),
kv AS (
  SELECT unnest(string_split(qs, '&')) AS pair FROM u),
keyed AS (
  SELECT string_split(pair, '=')[1] AS param_key,
         string_split(pair, '=')[-1] AS param_val
  FROM kv),
agg AS (
  SELECT param_key, CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT param_val) AS BIGINT) AS n_distinct
  FROM keyed GROUP BY param_key)
SELECT param_key, n_urls, n_distinct,
       CAST(n_distinct * 1000000 // n_urls AS BIGINT) AS distinct_ppm,
       CAST(CASE WHEN n_distinct * 1000000 // n_urls > 500000
                  AND n_urls >= 20 THEN 1 ELSE 0 END AS INT)
         AS is_session_like
FROM agg
"""


def q_url_double_encoding(spark, sf_dir):
    """Percent-encoding DEPTH detection — the double-encoding
    canonicalization gap (%2520 = an encoded '%20') that WAF-bypass
    and cache-poisoning URLs exploit and that url_pct_normalize's
    single decode pass cannot see: extract the '%(25)*20' chain, its
    nesting depth ((len−1)/2: %20→1, %2520→2, %252520→3), the fully
    collapsed canonical form, and the alias flag (depth>=2 means two
    crawler passes would admit the same resource twice).

    Fixture: orders-keyed paths carrying plain/single/double/triple
    encoded spaces by key mod 4.

    Plan/scale: per-row regexp + length codegen, no shuffle — fuses
    into the scan like the other url_* normalizers."""
    k = F.col("o_orderkey")
    enc = (F.when(k % 4 == 0, F.lit("%2520"))
           .when(k % 4 == 1, F.lit("%20"))
           .when(k % 4 == 2, F.lit("%252520"))
           .otherwise(F.lit("_")))
    url = F.concat(F.lit("http://site"), (k % 30).cast("string"),
                   F.lit(".onion/a"), enc, F.lit("b"), k.cast("string"))
    d = _t(spark, sf_dir, "orders").select(k.alias("o_orderkey"),
                                           url.alias("url"))
    chain = F.regexp_extract("url", "%(?:25)*20", 0)
    depth = F.when(F.length(chain) > 0,
                   (F.length(chain) - 1) / 2).otherwise(F.lit(0)) \
        .cast("long")
    canon = F.regexp_replace("url", "%(?:25)*20", " ")
    return (d.withColumn("enc_depth", depth)
            .withColumn("url_canonical",
                        F.when(depth > 0, canon).otherwise(F.col("url")))
            .withColumn("is_alias_risk", (depth >= 2).cast("int")))


ORACLE_URL_DOUBLE_ENCODING = """
WITH d AS (
  SELECT o_orderkey,
         'http://site' || (o_orderkey % 30) || '.onion/a'
         || CASE WHEN o_orderkey % 4 = 0 THEN '%2520'
                 WHEN o_orderkey % 4 = 1 THEN '%20'
                 WHEN o_orderkey % 4 = 2 THEN '%252520'
                 ELSE '_' END
         || 'b' || o_orderkey AS url
  FROM orders),
x AS (
  SELECT o_orderkey, url,
         coalesce(regexp_extract(url, '%(?:25)*20', 0), '') AS chain
  FROM d)
SELECT o_orderkey, url,
       CAST(CASE WHEN length(chain) > 0
                 THEN (length(chain) - 1) // 2 ELSE 0 END AS BIGINT)
         AS enc_depth,
       CASE WHEN length(chain) > 0
            THEN regexp_replace(url, '%(?:25)*20', ' ', 'g')
            ELSE url END AS url_canonical,
       CAST(CASE WHEN length(chain) >= 5 THEN 1 ELSE 0 END AS INT)
         AS is_alias_risk
FROM x
"""


def q_url_mobile_amp_collapse(spark, sf_dir):
    """Mobile/AMP MIRROR collapse — the URL-convention twin of the
    content-based host_mirror_detect: m.host, amp.host, www.host,
    path/amp, and ?amp=1 all serve the page host/path already serves,
    so a frontier that treats them as distinct wastes 2-5x fetches per
    page and pollutes dedup. Variants fold onto a canonical family key
    (labels stripped, /amp segment dropped, amp=1 param dropped); the
    census reports per-family variant count, which convention classes
    appeared, and the fetch-savings the collapse buys.

    Fixture: every order key spawns the base URL plus m./amp./?amp=1
    variants on deterministic mods.

    Plan/scale: per-row regexp canonicalization + ONE groupBy(family)
    — the same shuffle the URL-seen dedup already pays; no joins."""
    k = F.col("o_orderkey")
    base = F.concat(F.lit("site"), (k % 200).cast("string"),
                    F.lit(".onion/p"), (k % 50).cast("string"))
    variants = F.array_compact(F.array(
        F.concat(F.lit("http://"), base),
        F.when(k % 2 == 0, F.concat(F.lit("http://m."), base))
        .otherwise(F.lit(None)),
        F.when(k % 3 == 0, F.concat(F.lit("http://amp."), base))
        .otherwise(F.lit(None)),
        F.when(k % 5 == 0, F.concat(F.lit("http://"), base,
                                    F.lit("?amp=1")))
        .otherwise(F.lit(None))))
    u = (_t(spark, sf_dir, "orders")
         .select(F.explode(variants).alias("url")).distinct())
    canon = F.regexp_replace(
        F.regexp_replace("url", r"^http://(m|amp|www)\.", "http://"),
        r"\?amp=1$", "")
    tagged = (u.withColumn("family", canon)
              .withColumn("is_mobile",
                          F.col("url").rlike(r"^http://m\.").cast("int"))
              .withColumn("is_amp",
                          (F.col("url").rlike(r"^http://amp\.")
                           | F.col("url").rlike(r"\?amp=1$"))
                          .cast("int")))
    return (tagged.groupBy("family")
            .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
                 F.sum("is_mobile").cast("long").alias("n_mobile"),
                 F.sum("is_amp").cast("long").alias("n_amp"))
            .withColumn("fetches_saved",
                        (F.col("n_variants") - 1).cast("long")))


ORACLE_URL_MOBILE_AMP_COLLAPSE = """
WITH v AS (
  SELECT DISTINCT unnest(list_filter([
      'http://site' || (o_orderkey % 200) || '.onion/p'
        || (o_orderkey % 50),
      CASE WHEN o_orderkey % 2 = 0 THEN
        'http://m.site' || (o_orderkey % 200) || '.onion/p'
        || (o_orderkey % 50) END,
      CASE WHEN o_orderkey % 3 = 0 THEN
        'http://amp.site' || (o_orderkey % 200) || '.onion/p'
        || (o_orderkey % 50) END,
      CASE WHEN o_orderkey % 5 = 0 THEN
        'http://site' || (o_orderkey % 200) || '.onion/p'
        || (o_orderkey % 50) || '?amp=1' END],
      x -> x IS NOT NULL)) AS url
  FROM orders),
t AS (
  SELECT url,
         regexp_replace(regexp_replace(url,
             '^http://(m|amp|www)\\.', 'http://'),
             '\\?amp=1$', '') AS family,
         CASE WHEN regexp_matches(url, '^http://m\\.') THEN 1 ELSE 0 END
           AS is_mobile,
         CASE WHEN regexp_matches(url, '^http://amp\\.')
                OR regexp_matches(url, '\\?amp=1$') THEN 1 ELSE 0 END
           AS is_amp
  FROM v)
SELECT family, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(sum(is_mobile) AS BIGINT) AS n_mobile,
       CAST(sum(is_amp) AS BIGINT) AS n_amp,
       CAST(count(*) - 1 AS BIGINT) AS fetches_saved
FROM t GROUP BY family
"""


def q_url_shortener_detect(spark, sf_dir):
    """URL-SHORTENER detection — shorteners hide destinations from
    every URL-level gate (blocklists, dedup, SSRF guards), so a
    crawler must route them through a separate expand-then-readmit
    queue with its own politeness class: a host is shortener-LIKE
    when its path population is dominated by single-segment opaque
    tokens (short, mixed-case-alnum, no extension, no slashes).
    Per host: URL count, opaque-token share in ppm, mean token
    length in centichars, and the route verdict at the 80% floor
    with >= 20 URLs support.

    Fixture: 4 synthetic hosts — two shorteners (base62-ish md5
    tokens of length 7), a docs site (real paths), a mixed host.

    Plan/scale: per-row regexp classification + ONE groupBy(host)
    — the expand queue itself is the fetch path's job; this row is
    the router."""
    k = F.col("o_orderkey")
    host = (F.when(k % 4 == 0, F.lit("sh.rt"))
            .when(k % 4 == 1, F.lit("tiny.onion"))
            .when(k % 4 == 2, F.lit("docs.site.onion"))
            .otherwise(F.lit("mix.onion")))
    path = (F.when(k % 4 < 2,
                   F.substring(F.md5(k.cast("string")), 1, 7))
            .when(k % 4 == 2,
                  F.concat(F.lit("guides/install-"),
                           (k % 30).cast("string"), F.lit(".html")))
            .otherwise(F.when(k % 8 == 3,
                              F.substring(F.md5(k.cast("string")), 1, 7))
                       .otherwise(F.concat(F.lit("blog/post-"),
                                           (k % 40).cast("string")))))
    d = (_t(spark, sf_dir, "orders")
         .select(host.alias("host_key"), path.alias("path")))
    opaque = (F.col("path").rlike("^[a-z0-9]{5,10}$")
              & ~F.col("path").contains("/")
              & ~F.col("path").contains(".")).cast("int")
    cen = (d.withColumn("opaque", opaque)
           .groupBy("host_key")
           .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                F.sum("opaque").cast("long").alias("n_opaque"),
                F.sum(F.length("path")).cast("long").alias("path_chars")))
    return (cen.withColumn("opaque_ppm",
                           F.expr("n_opaque * 1000000 DIV n_urls")
                           .cast("long"))
            .withColumn("mean_len_centi",
                        F.expr("path_chars * 100 DIV n_urls")
                        .cast("long"))
            .withColumn("is_shortener",
                        ((F.col("opaque_ppm") >= 800000)
                         & (F.col("n_urls") >= 20)).cast("int")))


ORACLE_URL_SHORTENER_DETECT = """
WITH d AS (
  SELECT CASE WHEN o_orderkey % 4 = 0 THEN 'sh.rt'
              WHEN o_orderkey % 4 = 1 THEN 'tiny.onion'
              WHEN o_orderkey % 4 = 2 THEN 'docs.site.onion'
              ELSE 'mix.onion' END AS host_key,
         CASE WHEN o_orderkey % 4 < 2
              THEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7)
              WHEN o_orderkey % 4 = 2
              THEN 'guides/install-' || (o_orderkey % 30) || '.html'
              WHEN o_orderkey % 8 = 3
              THEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 7)
              ELSE 'blog/post-' || (o_orderkey % 40) END AS path
  FROM orders),
t AS (
  SELECT host_key, path,
         CASE WHEN regexp_matches(path, '^[a-z0-9]{5,10}$')
               AND NOT contains(path, '/')
               AND NOT contains(path, '.') THEN 1 ELSE 0 END AS opaque
  FROM d),
cen AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_urls,
         CAST(sum(opaque) AS BIGINT) AS n_opaque,
         CAST(sum(length(path)) AS BIGINT) AS path_chars
  FROM t GROUP BY host_key)
SELECT host_key, n_urls, n_opaque, path_chars,
       CAST(n_opaque * 1000000 // n_urls AS BIGINT) AS opaque_ppm,
       CAST(path_chars * 100 // n_urls AS BIGINT) AS mean_len_centi,
       CAST(CASE WHEN n_opaque * 1000000 // n_urls >= 800000
                  AND n_urls >= 20 THEN 1 ELSE 0 END AS INT)
         AS is_shortener
FROM cen
"""


def q_url_fragment_policy(spark, sf_dir):
    """URL FRAGMENT policy — '#fragment' is client-side-only per RFC
    3986 §3.5, so a frontier that keeps fragments aliases every
    anchor on a page into a distinct URL; the one exception is the
    legacy hashbang ('#!/state'), where the fragment IS server
    routing (Google's old AJAX-crawling scheme maps it to
    ?_escaped_fragment_=). Per URL: the fragment class (none /
    anchor / hashbang), the dedup key (fragment stripped), and the
    fetch URL (hashbang rewritten to _escaped_fragment_); the
    anchor-alias savings fall out of the dedup-key census.

    Plan/scale: per-row split/regexp codegen + one groupBy on the
    dedup key for the savings census; the policy columns are
    exactly what the frontier's canonicalizer applies inline."""
    k = F.col("o_orderkey")
    frag = (F.when(k % 3 == 1,
                   F.concat(F.lit("#sec"), (k % 12).cast("string")))
            .when(k % 7 == 3,
                  F.concat(F.lit("#!/page/"), (k % 9).cast("string")))
            .otherwise(F.lit("")))
    url = F.concat(F.lit("http://site"), (k % 150).cast("string"),
                   F.lit(".onion/doc"), (k % 40).cast("string"), frag)
    d = _t(spark, sf_dir, "orders").select(k.alias("o_orderkey"),
                                           url.alias("url"))
    base = F.substring_index("url", "#", 1)
    fragment = F.when(F.col("url").contains("#"),
                      F.substring_index("url", "#", -1)) \
        .otherwise(F.lit(""))
    cls = (F.when(fragment == "", F.lit("none"))
           .when(fragment.startswith("!/"), F.lit("hashbang"))
           .otherwise(F.lit("anchor")))
    fetch = (F.when(cls == "hashbang",
                    F.concat(base, F.lit("?_escaped_fragment_="),
                             F.substring(fragment, 3, 10000)))
             .otherwise(base))
    return (d.withColumn("dedup_key", base)
            .withColumn("frag_class", cls)
            .withColumn("fetch_url", fetch))


ORACLE_URL_FRAGMENT_POLICY = """
WITH d AS (
  SELECT o_orderkey,
         'http://site' || (o_orderkey % 150) || '.onion/doc'
         || (o_orderkey % 40)
         || CASE WHEN o_orderkey % 3 = 1 THEN '#sec' || (o_orderkey % 12)
                 WHEN o_orderkey % 7 = 3
                   THEN '#!/page/' || (o_orderkey % 9)
                 ELSE '' END AS url
  FROM orders),
x AS (
  SELECT o_orderkey, url,
         CASE WHEN contains(url, '#')
              THEN string_split(url, '#')[1] ELSE url END AS base,
         CASE WHEN contains(url, '#')
              THEN string_split(url, '#')[-1] ELSE '' END AS frag
  FROM d),
c AS (
  SELECT o_orderkey, url, base, frag,
         CASE WHEN frag = '' THEN 'none'
              WHEN frag LIKE '!/%' THEN 'hashbang'
              ELSE 'anchor' END AS frag_class
  FROM x)
SELECT o_orderkey, url, base AS dedup_key, frag_class,
       CASE WHEN frag_class = 'hashbang'
            THEN base || '?_escaped_fragment_=' || substr(frag, 3)
            ELSE base END AS fetch_url
FROM c
"""


def q_url_case_fold(spark, sf_dir):
    """CASE normalization per RFC 3986 §6.2.2.1 — scheme and host are
    case-INsensitive (HTTP://EXAMPLE.onion == http://example.onion)
    but the path is case-SENSITIVE (/Docs != /docs), so the correct
    fold lowercases exactly the authority prefix and must NOT touch
    the path; a frontier that lowercases whole URLs corrupts paths,
    one that folds nothing aliases every case variant. Per URL: the
    correctly folded form, whether folding changed it, and the
    alias-family census on the folded key showing the fetches the
    fold deduplicates.

    Fixture: scheme/host/path case variants on deterministic mods
    (every 3rd URL uppercases the host, every 4th the scheme, every
    5th the path — only the last must survive the fold).

    Plan/scale: split at the authority boundary + lower() codegen,
    one groupBy(folded) census — the URL-seen shuffle shape."""
    k = F.col("o_orderkey")
    scheme = F.when(k % 4 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    host = F.when(k % 3 == 0,
                  F.concat(F.lit("SITE"), (k % 120).cast("string"),
                           F.lit(".ONION"))) \
        .otherwise(F.concat(F.lit("site"), (k % 120).cast("string"),
                            F.lit(".onion")))
    path = F.when(k % 5 == 0,
                  F.concat(F.lit("/Docs/Page"), (k % 30).cast("string"))) \
        .otherwise(F.concat(F.lit("/docs/page"), (k % 30).cast("string")))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(scheme, F.lit("://"), host, path).alias("url"))
         .distinct())
    prefix = F.concat(F.substring_index("url", "/", 3))
    rest = F.substring(F.col("url"),
                       F.length(prefix) + 1, F.lit(100000))
    folded = F.concat(F.lower(prefix), rest)
    t = (d.withColumn("url_folded", folded)
         .withColumn("changed", (F.col("url") != F.col("url_folded"))
                     .cast("int")))
    return (t.groupBy("url_folded")
            .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
                 F.sum("changed").cast("long").alias("n_folded"))
            .withColumn("fetches_saved",
                        (F.col("n_variants") - 1).cast("long")))


ORACLE_URL_CASE_FOLD = """
WITH d AS (
  SELECT DISTINCT
         CASE WHEN o_orderkey % 4 = 0 THEN 'HTTP' ELSE 'http' END
         || '://'
         || CASE WHEN o_orderkey % 3 = 0
                 THEN 'SITE' || (o_orderkey % 120) || '.ONION'
                 ELSE 'site' || (o_orderkey % 120) || '.onion' END
         || CASE WHEN o_orderkey % 5 = 0
                 THEN '/Docs/Page' || (o_orderkey % 30)
                 ELSE '/docs/page' || (o_orderkey % 30) END AS url
  FROM orders),
t AS (
  SELECT url,
         lower(array_to_string(string_split(url, '/')[1:3], '/'))
         || substr(url,
                   length(array_to_string(string_split(url, '/')[1:3],
                                          '/')) + 1) AS url_folded
  FROM d)
SELECT url_folded, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(sum(CASE WHEN url <> url_folded THEN 1 ELSE 0 END) AS BIGINT)
         AS n_folded,
       CAST(count(*) - 1 AS BIGINT) AS fetches_saved
FROM t GROUP BY url_folded
"""


def q_url_redirect_loops(spark, sf_dir):
    """Redirect LOOP detection — the fetch-budget leak
    url_redirect_resolve's chain walk cannot terminate on (A→B→A
    ping-pongs from broken canonicalization, A→B→C→A cycles from
    migration mistakes): over the redirect edge set, find every
    2-cycle and 3-cycle via two bounded self-joins (never a
    transitive closure), emit each loop once keyed by its smallest
    member, with the loop length and member list.

    Fixture: a deterministic redirect graph — chains toward hubs
    plus injected 2-cycles (every 7th source) and 3-cycles (every
    11th).

    Plan/scale: 2-cycles are ONE self-equi-join on the reversed
    edge; 3-cycles one wedge join + closing equi-join — the
    triangle-counting shape, bounded fan-out, no iteration."""
    k = F.col("o_orderkey")
    src = F.concat(F.lit("u"), (k % 300).cast("string"))
    dst = (F.when(k % 7 == 0,
                  F.concat(F.lit("u"), ((k + 150) % 300).cast("string")))
           .when(k % 11 == 0,
                 F.concat(F.lit("u"), ((k * 3 + 1) % 300).cast("string")))
           .otherwise(F.concat(F.lit("u"), ((k % 300) % 20)
                               .cast("string"))))
    edges = (_t(spark, sf_dir, "orders")
             .select(src.alias("src"), dst.alias("dst"))
             .filter(F.col("src") != F.col("dst")).distinct())
    rev = edges.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"))
    two = (edges.join(rev, ["src", "dst"])
           .filter(F.col("src") < F.col("dst"))
           .select(F.col("src").alias("loop_key"),
                   F.lit(2).cast("long").alias("loop_len"),
                   F.concat_ws(",", "src", "dst").alias("members")))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("c"), F.col("dst").alias("a"))
    three = (edges.select(F.col("src").alias("a"),
                          F.col("dst").alias("b"))
             .join(e2, "b").join(e3, ["c", "a"])
             .filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c"))
                     & (F.col("b") != F.col("c")))
             .select(F.col("a").alias("loop_key"),
                     F.lit(3).cast("long").alias("loop_len"),
                     F.concat_ws(",", "a", "b", "c").alias("members")))
    return two.unionByName(three)


ORACLE_URL_REDIRECT_LOOPS = """
WITH edges AS (
  SELECT DISTINCT 'u' || (o_orderkey % 300) AS src,
         CASE WHEN o_orderkey % 7 = 0
                THEN 'u' || ((o_orderkey + 150) % 300)
              WHEN o_orderkey % 11 = 0
                THEN 'u' || ((o_orderkey * 3 + 1) % 300)
              ELSE 'u' || ((o_orderkey % 300) % 20) END AS dst
  FROM orders
  WHERE 'u' || (o_orderkey % 300) <> CASE WHEN o_orderkey % 7 = 0
                THEN 'u' || ((o_orderkey + 150) % 300)
              WHEN o_orderkey % 11 = 0
                THEN 'u' || ((o_orderkey * 3 + 1) % 300)
              ELSE 'u' || ((o_orderkey % 300) % 20) END),
two AS (
  SELECT e.src AS loop_key, CAST(2 AS BIGINT) AS loop_len,
         e.src || ',' || e.dst AS members
  FROM edges e JOIN edges r ON r.src = e.dst AND r.dst = e.src
  WHERE e.src < e.dst),
three AS (
  SELECT e1.src AS loop_key, CAST(3 AS BIGINT) AS loop_len,
         e1.src || ',' || e1.dst || ',' || e2.dst AS members
  FROM edges e1
  JOIN edges e2 ON e2.src = e1.dst
  JOIN edges e3 ON e3.src = e2.dst AND e3.dst = e1.src
  WHERE e1.src < e1.dst AND e1.src < e2.dst AND e1.dst <> e2.dst)
SELECT * FROM two UNION ALL SELECT * FROM three
"""


def q_url_default_port(spark, sf_dir):
    """DEFAULT-PORT and empty-path normalization per RFC 3986 §6.2.3
    — the last syntax-based normalization pass the url_* family was
    missing (:80 on http and :443 on https are the defaults, so
    http://h:80/x aliases http://h/x; an empty path after the
    authority normalizes to '/'): per URL, the normalized form,
    which of the two rules fired, and the alias-family census on
    the normalized key.

    Fixture: every 3rd URL carries :80, every 5th :443 (on an
    https scheme), every 4th has an empty path.

    Plan/scale: regexp codegen + one groupBy(normalized) census —
    composes with url_case_fold/url_pct_normalize into the full
    §6.2 pipeline."""
    k = F.col("o_orderkey")
    scheme = F.when(k % 5 == 0, F.lit("https")).otherwise(F.lit("http"))
    port = (F.when(k % 3 == 0, F.lit(":80"))
            .when(k % 5 == 0, F.lit(":443"))
            .otherwise(F.lit("")))
    path = F.when(k % 4 == 0, F.lit("")) \
        .otherwise(F.concat(F.lit("/p"), (k % 25).cast("string")))
    url = F.concat(scheme, F.lit("://host"), (k % 90).cast("string"),
                   F.lit(".onion"), port, path)
    d = (_t(spark, sf_dir, "orders")
         .select(url.alias("url")).distinct())
    noport = F.regexp_replace(
        F.regexp_replace("url", r"^(http://[^/:]+):80(/|$)", "$1$2"),
        r"^(https://[^/:]+):443(/|$)", "$1$2")
    norm = F.when(noport.rlike(r"^https?://[^/]+$"),
                  F.concat(noport, F.lit("/"))).otherwise(noport)
    t = (d.withColumn("url_norm", norm)
         .withColumn("port_stripped",
                     (F.col("url") != noport).cast("int"))
         .withColumn("path_added",
                     (noport != norm).cast("int")))
    fam = (t.groupBy("url_norm")
           .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
                F.sum("port_stripped").cast("long").alias("n_port"),
                F.sum("path_added").cast("long").alias("n_path")))
    return fam.withColumn("fetches_saved",
                          (F.col("n_variants") - 1).cast("long"))


ORACLE_URL_DEFAULT_PORT = """
WITH d AS (
  SELECT DISTINCT
         CASE WHEN o_orderkey % 5 = 0 THEN 'https' ELSE 'http' END
         || '://host' || (o_orderkey % 90) || '.onion'
         || CASE WHEN o_orderkey % 3 = 0 THEN ':80'
                 WHEN o_orderkey % 5 = 0 THEN ':443' ELSE '' END
         || CASE WHEN o_orderkey % 4 = 0 THEN ''
                 ELSE '/p' || (o_orderkey % 25) END AS url
  FROM orders),
s AS (
  SELECT url,
         regexp_replace(regexp_replace(url,
             '^(http://[^/:]+):80(/|$)', '\\1\\2'),
             '^(https://[^/:]+):443(/|$)', '\\1\\2') AS noport
  FROM d),
t AS (
  SELECT url, noport,
         CASE WHEN regexp_matches(noport, '^https?://[^/]+$')
              THEN noport || '/' ELSE noport END AS url_norm
  FROM s)
SELECT url_norm, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(sum(CASE WHEN url <> noport THEN 1 ELSE 0 END) AS BIGINT)
         AS n_port,
       CAST(sum(CASE WHEN noport <> url_norm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_path,
       CAST(count(*) - 1 AS BIGINT) AS fetches_saved
FROM t GROUP BY url_norm
"""


def q_url_param_sort(spark, sf_dir):
    """Query-parameter SORT canonicalization — parameter order is
    semantically irrelevant for virtually every server (?b=2&a=1
    serves ?a=1&b=2), so a frontier that preserves order aliases
    n! variants of the same resource; the canonical form sorts
    pairs by (key, value) with a stable array_sort. Per URL: the
    sorted form, whether sorting changed it, and the alias-family
    census on the canonical key.

    Fixture: each resource emits its params in 2-3 deterministic
    orders across order keys, so families genuinely collapse.

    Plan/scale: split + array_sort + array_join codegen, one
    census groupBy — composes after url_param_strip (strip first,
    then sort what survives)."""
    k = F.col("o_orderkey")
    a = F.concat(F.lit("a="), (k % 5).cast("string"))
    b = F.concat(F.lit("b="), (k % 7).cast("string"))
    c = F.concat(F.lit("c="), (k % 3).cast("string"))
    sel = F.expr("(o_orderkey DIV 420) % 3")
    qs = (F.when(sel == 0, F.concat_ws("&", a, b, c))
          .when(sel == 1, F.concat_ws("&", c, a, b))
          .otherwise(F.concat_ws("&", b, c, a)))
    base = F.concat(F.lit("http://site"), (k % 60).cast("string"),
                    F.lit(".onion/q"))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(base, F.lit("?"), qs).alias("url"))
         .distinct())
    parts = F.split(F.substring_index("url", "?", -1), "&")
    canon = F.concat(F.substring_index("url", "?", 1), F.lit("?"),
                     F.array_join(F.array_sort(parts), "&"))
    t = (d.withColumn("url_canon", canon)
         .withColumn("reordered",
                     (F.col("url") != F.col("url_canon")).cast("int")))
    return (t.groupBy("url_canon")
            .agg(F.count(F.lit(1)).cast("long").alias("n_variants"),
                 F.sum("reordered").cast("long").alias("n_reordered"))
            .withColumn("fetches_saved",
                        (F.col("n_variants") - 1).cast("long")))


ORACLE_URL_PARAM_SORT = """
WITH d AS (
  SELECT DISTINCT
         'http://site' || (o_orderkey % 60) || '.onion/q?'
         || CASE WHEN (o_orderkey // 420) % 3 = 0 THEN
                 'a=' || (o_orderkey % 5) || '&b=' || (o_orderkey % 7)
                 || '&c=' || (o_orderkey % 3)
              WHEN (o_orderkey // 420) % 3 = 1 THEN
                 'c=' || (o_orderkey % 3) || '&a=' || (o_orderkey % 5)
                 || '&b=' || (o_orderkey % 7)
              ELSE
                 'b=' || (o_orderkey % 7) || '&c=' || (o_orderkey % 3)
                 || '&a=' || (o_orderkey % 5) END AS url
  FROM orders),
t AS (
  SELECT url,
         string_split(url, '?')[1] || '?'
         || array_to_string(list_sort(
                string_split(string_split(url, '?')[2], '&')), '&')
           AS url_canon
  FROM d)
SELECT url_canon, CAST(count(*) AS BIGINT) AS n_variants,
       CAST(sum(CASE WHEN url <> url_canon THEN 1 ELSE 0 END) AS BIGINT)
         AS n_reordered,
       CAST(count(*) - 1 AS BIGINT) AS fetches_saved
FROM t GROUP BY url_canon
"""


def q_url_hreflang_audit(spark, sf_dir):
    """HREFLANG reciprocity audit — hreflang alternate declarations
    are only honored when RECIPROCAL (if A declares B as its 'fr'
    alternate, B must declare A back, else search engines drop the
    whole cluster and a crawler chasing declared alternates fetches
    orphans): over the declared (page, alternate) edge set, classify
    each directed declaration as reciprocal / dangling (target never
    declares anything) / asymmetric (target declares, but not back),
    with the per-class census the i18n-SEO fix list reads.

    Fixture: per host family — /0 declares /1 (always), /1
    declares /0 back except on every 5th host (asymmetric, since /1
    still declares its one-way /2 alternate), and /2 never declares
    anything (dangling).

    Plan/scale: ONE self-left-join of the edge list on the reversed
    key + one existence join — the host_reciprocal shape with a
    3-way verdict."""
    k = F.col("o_orderkey")
    hosts = (_t(spark, sf_dir, "orders")
             .select((k % 120).cast("long").alias("h")).distinct())

    def u(h, p):
        return F.concat(F.lit("http://s"), h.cast("string"),
                        F.lit(".onion/"), F.lit(p))

    h = F.col("h")
    drop_rev = (F.conv(F.substring(F.md5(h.cast("string")), 1, 6),
                       16, 10).cast("long") % 5 == 0)
    a_edges = hosts.select(u(h, "0").alias("src"), u(h, "1").alias("dst"))
    b_edges = (hosts.filter(~drop_rev)
               .select(u(h, "1").alias("src"), u(h, "0").alias("dst")))
    c_edges = hosts.select(u(h, "1").alias("src"), u(h, "2").alias("dst"))
    all_e = a_edges.unionByName(b_edges).unionByName(c_edges).distinct()
    declarers = all_e.select(F.col("src").alias("d")).distinct()
    rev = all_e.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"),
                       F.lit(1).alias("has_rev"))
    j = (all_e.join(rev, ["src", "dst"], "left")
         .join(declarers.select(F.col("d").alias("dst"),
                                F.lit(1).alias("dst_declares")),
               "dst", "left"))
    verdict = (F.when(F.col("has_rev") == 1, F.lit("reciprocal"))
               .when(F.col("dst_declares").isNull(), F.lit("dangling"))
               .otherwise(F.lit("asymmetric")))
    return (j.withColumn("verdict", verdict)
            .groupBy("verdict")
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"),
                 F.countDistinct("src").cast("long").alias("n_pages")))


ORACLE_URL_HREFLANG_AUDIT = """
WITH hosts AS (
  SELECT DISTINCT CAST(o_orderkey % 120 AS BIGINT) AS h FROM orders),
a_e AS (
  SELECT 'http://s' || h || '.onion/0' AS src,
         'http://s' || h || '.onion/1' AS dst FROM hosts),
b_e AS (
  SELECT 'http://s' || h || '.onion/1' AS src,
         'http://s' || h || '.onion/0' AS dst
  FROM hosts
  WHERE NOT (('0x' || substr(md5(CAST(h AS VARCHAR)), 1, 6))::BIGINT
             % 5 = 0)),
c_e AS (
  SELECT 'http://s' || h || '.onion/1' AS src,
         'http://s' || h || '.onion/2' AS dst FROM hosts),
all_e AS (
  SELECT DISTINCT * FROM (
    SELECT * FROM a_e UNION ALL SELECT * FROM b_e
    UNION ALL SELECT * FROM c_e)),
decl AS (SELECT DISTINCT src AS d FROM all_e),
j AS (
  SELECT e.src, e.dst,
         CASE WHEN r.src IS NOT NULL THEN 1 END AS has_rev,
         CASE WHEN dd.d IS NOT NULL THEN 1 END AS dst_declares
  FROM all_e e
  LEFT JOIN (SELECT DISTINCT dst AS src, src AS dst FROM all_e) r
    ON r.src = e.src AND r.dst = e.dst
  LEFT JOIN decl dd ON dd.d = e.dst)
SELECT CASE WHEN has_rev = 1 THEN 'reciprocal'
            WHEN dst_declares IS NULL THEN 'dangling'
            ELSE 'asymmetric' END AS verdict,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(count(DISTINCT src) AS BIGINT) AS n_pages
FROM j GROUP BY 1
"""


def q_url_pagination_audit(spark, sf_dir):
    """PAGINATION-family audit — listing pages (?page=N) are how a
    crawler discovers archives, and the family census answers the
    two questions that matter: how deep does each listing go (crawl
    budget), and are there GAPS (missing pages = partial coverage
    the recrawler must patch)? Per family (URL with the page number
    stripped): page count, max page, the exact missing-page count
    (max − distinct observed), and the coverage ppm.

    Fixture: listing families with deterministic depth (host-keyed)
    and every 7th page of deep families missing.

    Plan/scale: regexp family-key extraction + ONE groupBy(family)
    with count/max — the URL-seen shuffle; gap math is arithmetic
    on the census row (page 1..max convention)."""
    k = F.col("o_orderkey")
    fam_id = (k % 40).cast("long")
    depth = (fam_id % 9 + 2).cast("long")
    page_no = (k % 97) % depth + 1
    d = (_t(spark, sf_dir, "orders")
         .select(fam_id.alias("fid"), page_no.alias("p"))
         .filter(~((F.col("p") % 7 == 0) & (F.col("fid") % 3 == 0)))
         .select(F.concat(F.lit("http://list"),
                          F.col("fid").cast("string"),
                          F.lit(".onion/items?page="),
                          F.col("p").cast("string")).alias("url"))
         .distinct())
    fam = F.regexp_replace("url", r"page=[0-9]+$", "page=<N>")
    pg = F.regexp_extract("url", r"page=([0-9]+)$", 1).cast("long")
    cen = (d.withColumn("family", fam).withColumn("p", pg)
           .groupBy("family")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                F.max("p").cast("long").alias("max_page"),
                F.countDistinct("p").cast("long").alias("n_distinct")))
    return (cen.withColumn("n_missing",
                           (F.col("max_page") - F.col("n_distinct"))
                           .cast("long"))
            .withColumn("coverage_ppm",
                        F.expr("n_distinct * 1000000 DIV max_page")
                        .cast("long"))
            .select("family", "n_pages", "max_page", "n_missing",
                    "coverage_ppm"))


ORACLE_URL_PAGINATION_AUDIT = """
WITH d AS (
  SELECT DISTINCT
         'http://list' || (o_orderkey % 40) || '.onion/items?page='
         || ((o_orderkey % 97) % ((o_orderkey % 40) % 9 + 2) + 1)
           AS url
  FROM orders
  WHERE NOT (((o_orderkey % 97) % ((o_orderkey % 40) % 9 + 2) + 1)
             % 7 = 0 AND (o_orderkey % 40) % 3 = 0)),
t AS (
  SELECT regexp_replace(url, 'page=[0-9]+$', 'page=<N>') AS family,
         CAST(regexp_extract(url, 'page=([0-9]+)$', 1) AS BIGINT) AS p
  FROM d),
cen AS (
  SELECT family, CAST(count(*) AS BIGINT) AS n_pages,
         CAST(max(p) AS BIGINT) AS max_page,
         CAST(count(DISTINCT p) AS BIGINT) AS n_distinct
  FROM t GROUP BY family)
SELECT family, n_pages, max_page,
       CAST(max_page - n_distinct AS BIGINT) AS n_missing,
       CAST(n_distinct * 1000000 // max_page AS BIGINT)
         AS coverage_ppm
FROM cen
"""


def q_url_ext_mismatch(spark, sf_dir):
    """Extension vs served CONTENT-TYPE mismatch census — a
    crawler that routes parsers by URL extension mis-parses every
    mismatched response (the .jpg that serves text/html is an
    error page; the .html serving octet-stream is a forced
    download), so the census tells it how much to trust the
    extension per bucket. Per (extension, served type): count,
    the extension's expected type, the mismatch flag, and the
    share of that extension's traffic in ppm.

    Fixture: extensions cycle over 5 kinds + none; every 7th
    response serves text/html regardless (error pages), every
    11th serves application/octet-stream.

    Plan/scale: one census groupBy over codegen-derived columns —
    output is |ext x type|, scale-free."""
    k = F.col("o_orderkey")
    ext = (F.when(k % 6 == 0, F.lit("html"))
           .when(k % 6 == 1, F.lit("jpg"))
           .when(k % 6 == 2, F.lit("pdf"))
           .when(k % 6 == 3, F.lit("png"))
           .when(k % 6 == 4, F.lit("json"))
           .otherwise(F.lit("none")))
    expected = (F.when(ext == "html", F.lit("text/html"))
                .when(ext == "jpg", F.lit("image/jpeg"))
                .when(ext == "pdf", F.lit("application/pdf"))
                .when(ext == "png", F.lit("image/png"))
                .when(ext == "json", F.lit("application/json"))
                .otherwise(F.lit("text/html")))
    served = (F.when(k % 7 == 0, F.lit("text/html"))
              .when(k % 11 == 0, F.lit("application/octet-stream"))
              .otherwise(expected))
    d = (_t(spark, sf_dir, "orders")
         .select(ext.alias("ext"), expected.alias("expected_type"),
                 served.alias("served_type")))
    cens = (d.groupBy("ext", "expected_type", "served_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls")))
    w = Window.partitionBy("ext")
    return (cens.withColumn("ext_urls",
                            F.sum("n_urls").over(w).cast("long"))
            .withColumn("share_ppm",
                        F.expr("n_urls * 1000000 DIV ext_urls")
                        .cast("long"))
            .withColumn("is_mismatch",
                        (F.col("served_type") != F.col("expected_type"))
                        .cast("int"))
            .drop("ext_urls"))


ORACLE_URL_EXT_MISMATCH = """
WITH d AS (
  SELECT CASE WHEN o_orderkey % 6 = 0 THEN 'html'
              WHEN o_orderkey % 6 = 1 THEN 'jpg'
              WHEN o_orderkey % 6 = 2 THEN 'pdf'
              WHEN o_orderkey % 6 = 3 THEN 'png'
              WHEN o_orderkey % 6 = 4 THEN 'json'
              ELSE 'none' END AS ext,
         o_orderkey AS k
  FROM orders),
e AS (
  SELECT ext,
         CASE WHEN ext = 'html' THEN 'text/html'
              WHEN ext = 'jpg' THEN 'image/jpeg'
              WHEN ext = 'pdf' THEN 'application/pdf'
              WHEN ext = 'png' THEN 'image/png'
              WHEN ext = 'json' THEN 'application/json'
              ELSE 'text/html' END AS expected_type, k
  FROM d),
s AS (
  SELECT ext, expected_type,
         CASE WHEN k % 7 = 0 THEN 'text/html'
              WHEN k % 11 = 0 THEN 'application/octet-stream'
              ELSE expected_type END AS served_type
  FROM e),
cens AS (
  SELECT ext, expected_type, served_type,
         CAST(count(*) AS BIGINT) AS n_urls
  FROM s GROUP BY ext, expected_type, served_type)
SELECT ext, expected_type, served_type, n_urls,
       CAST(n_urls * 1000000 //
            sum(n_urls) OVER (PARTITION BY ext) AS BIGINT)
         AS share_ppm,
       CAST(CASE WHEN served_type <> expected_type THEN 1 ELSE 0 END
            AS INT) AS is_mismatch
FROM cens
"""


def q_url_userinfo_strip(spark, sf_dir):
    """URL USERINFO strip + deception screen — RFC 3986 §3.2.1
    userinfo is legal but browsers dropped it because
    `http://www.paypal.com@evil.example/` renders the trusted name
    and fetches the attacker (the classic phishing obfuscation);
    a crawler must (a) strip credentials before logging/dedup so
    secrets never land in the frontier, and (b) flag userinfo that
    LOOKS like a hostname as deception. Per URL: the userinfo
    presence, the deception signal (a dot in the userinfo), the
    stripped canonical URL, and the verdict.

    Fixture: every 11th URL carries user:pass credentials, every
    17th a deceptive hostname-shaped userinfo.

    Plan/scale: regexp codegen per row, zero shuffle — runs inside
    the canonicalization pass."""
    k = F.col("o_orderkey")
    userinfo = (F.when(k % 11 == 0, F.lit("user:s3cret@"))
                .when(k % 17 == 0, F.lit("www.paypal.com@"))
                .otherwise(F.lit("")))
    url = F.concat(F.lit("http://"), userinfo,
                   F.lit("h"), (k % 50).cast("string"),
                   F.lit(".example/p"), (k % 9).cast("string"))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("u"), k.cast("string")).alias("url_id"),
                 url.alias("url")))
    ui = F.regexp_extract("url", "://([^/@]*)@", 1)
    stripped = F.regexp_replace("url", "://[^/@]*@", "://")
    out = (d.withColumn("userinfo", ui)
           .withColumn("has_userinfo",
                       (F.col("userinfo") != "").cast("int"))
           .withColumn("deceptive",
                       ((F.col("userinfo") != "")
                        & F.col("userinfo").contains(".")).cast("int"))
           .withColumn("stripped_url", stripped))
    verdict = (F.when(F.col("deceptive") == 1, F.lit("phishing_risk"))
               .when(F.col("has_userinfo") == 1, F.lit("credentials"))
               .otherwise(F.lit("clean")))
    return (out.select("url_id", "url", "has_userinfo", "deceptive",
                       "stripped_url")
            .withColumn("verdict", verdict))


ORACLE_URL_USERINFO_STRIP = """
WITH d AS (
  SELECT 'u' || CAST(o_orderkey AS VARCHAR) AS url_id,
         'http://'
         || CASE WHEN o_orderkey % 11 = 0 THEN 'user:s3cret@'
                 WHEN o_orderkey % 17 = 0 THEN 'www.paypal.com@'
                 ELSE '' END
         || 'h' || CAST(o_orderkey % 50 AS VARCHAR)
         || '.example/p' || CAST(o_orderkey % 9 AS VARCHAR) AS url
  FROM orders),
x AS (
  SELECT url_id, url,
         regexp_extract(url, '://([^/@]*)@', 1) AS userinfo,
         regexp_replace(url, '://[^/@]*@', '://') AS stripped_url
  FROM d)
SELECT url_id, url,
       CAST(CASE WHEN userinfo <> '' THEN 1 ELSE 0 END AS INT)
         AS has_userinfo,
       CAST(CASE WHEN userinfo <> '' AND contains(userinfo, '.')
                 THEN 1 ELSE 0 END AS INT) AS deceptive,
       stripped_url,
       CASE WHEN userinfo <> '' AND contains(userinfo, '.')
              THEN 'phishing_risk'
            WHEN userinfo <> '' THEN 'credentials'
            ELSE 'clean' END AS verdict
FROM x
"""


def q_url_path_depth(spark, sf_dir):
    """PATH-DEPTH budget histogram — crawl depth caps are usually
    set by folklore; this census sets them from data: per path
    depth, the URL mass, cumulative mass, cumulative ppm, and the
    cap recommendation (the shallowest depth whose cumulative
    coverage reaches 95% — everything deeper buys < 5% of the
    corpus for unbounded trap risk, cf. url_trap_detect).

    Fixture: depth from a skewed two-term rule so shallow depths
    dominate the way real sites do.

    Plan/scale: one census groupBy + an ordered cumulative window
    over |depths| rows — scale-free after the scan."""
    k = F.col("o_orderkey")
    depth = F.least((k % 9).cast("long"),
                    ((k / F.lit(9)).cast("long") % 5))
    d = (_t(spark, sf_dir, "orders")
         .select(depth.alias("depth")))
    cens = (d.groupBy("depth")
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls")))
    tot = cens.agg(F.sum("n_urls").cast("long").alias("total"))
    w = (Window.orderBy("depth")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (cens.crossJoin(F.broadcast(tot))
           .withColumn("cum_urls", F.sum("n_urls").over(w)
                       .cast("long"))
           .withColumn("cum_ppm",
                       F.expr("cum_urls * 1000000 DIV total")
                       .cast("long")))
    w2 = Window.orderBy("depth").rowsBetween(
        Window.unboundedPreceding, -1)
    return (cum.withColumn(
        "prev_cum_ppm",
        F.coalesce(F.max("cum_ppm").over(w2), F.lit(0)).cast("long"))
        .withColumn("is_recommended_cap",
                    ((F.col("cum_ppm") >= 950000)
                     & (F.col("prev_cum_ppm") < 950000)).cast("int"))
        .select("depth", "n_urls", "cum_urls", "cum_ppm",
                "is_recommended_cap"))


ORACLE_URL_PATH_DEPTH = """
WITH d AS (
  SELECT least(o_orderkey % 9, (o_orderkey // 9) % 5) AS depth
  FROM orders),
cens AS (
  SELECT CAST(depth AS BIGINT) AS depth,
         CAST(count(*) AS BIGINT) AS n_urls
  FROM d GROUP BY depth),
tot AS (SELECT CAST(sum(n_urls) AS BIGINT) AS total FROM cens),
cum AS (
  SELECT depth, n_urls,
         CAST(sum(n_urls) OVER (ORDER BY depth
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_urls,
         total
  FROM cens CROSS JOIN tot),
pp AS (
  SELECT *, CAST(cum_urls * 1000000 // total AS BIGINT) AS cum_ppm,
         CAST(coalesce(max(cum_urls * 1000000 // total) OVER (
           ORDER BY depth ROWS BETWEEN UNBOUNDED PRECEDING
           AND 1 PRECEDING), 0) AS BIGINT) AS prev_cum_ppm
  FROM cum)
SELECT depth, n_urls, cum_urls, cum_ppm,
       CAST(CASE WHEN cum_ppm >= 950000 AND prev_cum_ppm < 950000
                 THEN 1 ELSE 0 END AS INT) AS is_recommended_cap
FROM pp
"""


def q_url_param_entropy(spark, sf_dir):
    """Cardinality/entropy-based tracking-parameter classification —
    what url_param_strip's FIXED list (utm_*/fbclid/...) can't catch:
    a param whose values are (nearly) unique per URL carries no
    routing information and should be stripped before dedup/seen
    checks, whatever it is called. Per (host, param): occurrence
    count, distinct-value count, distinct ratio (exact ppm by integer
    division), Shannon value-entropy in 1e-6 bits/occurrence (each
    value's c*log2(n/c) term rounded to integer units before the sum,
    then one exact integer division), and the verdict
    (ratio > 0.5 AND n >= 20 -> 'tracking').

    Fixture: host h(k%20); 'id' = k%50 (shared content values),
    'page' = k%5 (tiny vocab), 'utm_c' = md5 prefix (unique every
    row), 'sid' = md5 prefix on even k only (unique, half coverage).

    Plan/scale: explode to (host, param, value), ONE
    (host,param,value) census groupBy (map-side combine collapses
    repeats), then a (host,param) agg — both shuffles carry counts,
    never URLs. At 100 TB the value census is the only wide exchange
    and it is bounded by the live vocabulary."""
    k = F.col("o_orderkey")
    kv = F.array(
        F.struct(F.lit("id").alias("param"),
                 (k % 50).cast("string").alias("value")),
        F.struct(F.lit("page").alias("param"),
                 (k % 5).cast("string").alias("value")),
        F.struct(F.lit("utm_c").alias("param"),
                 F.substring(F.md5(k.cast("string")), 1, 12)
                 .alias("value")),
        F.struct(F.lit("sid").alias("param"),
                 F.when(k % 2 == 0,
                        F.substring(F.md5(F.concat(F.lit("s"),
                                                   k.cast("string"))),
                                    1, 12)).alias("value")))
    occ = (_t(spark, sf_dir, "orders")
           .select(F.concat(F.lit("h"), (k % 20).cast("string"))
                   .alias("host_key"),
                   F.explode(kv).alias("p"))
           .select("host_key", F.col("p.param").alias("param"),
                   F.col("p.value").alias("value"))
           .filter(F.col("value").isNotNull()))
    census = (occ.groupBy("host_key", "param", "value")
              .agg(F.count("*").alias("c")))
    wn = Window.partitionBy("host_key", "param")
    per = (census
           .withColumn("n", F.sum("c").over(wn))
           .withColumn("term_u",
                       F.round(F.col("c")
                               * F.log2(F.col("n") / F.col("c")) * 1e6)
                       .cast("long")))
    agg = (per.groupBy("host_key", "param")
           .agg(F.max("n").alias("n"),
                F.count("*").alias("nd"),
                F.sum("term_u").alias("sum_u")))
    return (agg.select(
        "host_key", "param", "n", "nd",
        F.expr("nd * 1000000 DIV n").alias("ratio_ppm"),
        F.expr("sum_u DIV n").alias("entropy_mu"),
        F.when((F.col("nd") * 2 > F.col("n")) & (F.col("n") >= 20),
               F.lit("tracking")).otherwise(F.lit("content"))
        .alias("verdict")))


ORACLE_URL_PARAM_ENTROPY = """
WITH occ AS (
  SELECT 'h' || (o_orderkey % 20) AS host_key, p.param, p.value
  FROM orders, UNNEST([
    {'param': 'id', 'value': CAST(o_orderkey % 50 AS VARCHAR)},
    {'param': 'page', 'value': CAST(o_orderkey % 5 AS VARCHAR)},
    {'param': 'utm_c',
      'value': substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12)},
    {'param': 'sid',
      'value': CASE WHEN o_orderkey % 2 = 0
                    THEN substr(md5('s' || CAST(o_orderkey AS VARCHAR)),
                                1, 12) END}]) AS t(p)
  WHERE p.value IS NOT NULL),
census AS (
  SELECT host_key, param, value, count(*) AS c
  FROM occ GROUP BY host_key, param, value),
per AS (
  SELECT *,
         SUM(c) OVER (PARTITION BY host_key, param) AS n
  FROM census),
agg AS (
  SELECT host_key, param,
         CAST(MAX(n) AS BIGINT) AS n,
         count(*) AS nd,
         CAST(SUM(CAST(round(c * log2(CAST(n AS DOUBLE) / c)
                             * 1000000.0) AS BIGINT)) AS BIGINT) AS sum_u
  FROM per GROUP BY host_key, param)
SELECT host_key, param, n, nd,
       nd * 1000000 // n AS ratio_ppm,
       sum_u // n AS entropy_mu,
       CASE WHEN nd * 2 > n AND n >= 20 THEN 'tracking'
            ELSE 'content' END AS verdict
FROM agg
"""


def q_url_ipv6_normalize(spark, sf_dir):
    """RFC 5952 IPv6-literal canonicalization — the missing sibling of
    url_canonicalize for bracketed-IPv6 hosts (two spellings of one
    address MUST collapse to one frontier key or the URL-seen set
    leaks duplicates): parse a full 8-group literal (mixed case,
    optional leading zeros), then emit the canonical form — lowercase
    hex, no leading zeros, and the LONGEST run of >=2 zero groups
    compressed to ``::`` (leftmost on tie), per RFC 5952 §4.

    The longest-zero-run search is pure codegen: a z/x mask string of
    the 8 groups probed with ``instr(mask, repeat('z', L))`` for L=8..2
    — no UDF, no explode.

    Fixture: group i of key k is 0 when (k+i)%3=0 (k%97=0 -> all-zero
    address, exercising '::'), else (k*(i+3))%65536; k%2 pads to 4
    digits, k%3=0 uppercases.

    Plan/scale: map-only string codegen over the literal — frontier-
    scan shaped."""
    k = F.col("o_orderkey")
    gcols = []
    for i in range(8):
        v = (F.when(k % 97 == 0, F.lit(0))
             .when((k + i) % 3 == 0, F.lit(0))
             .otherwise((k * (i + 3)) % 65536))
        g = F.lower(F.hex(v.cast("long")))
        g = F.when(k % 2 == 0, F.lpad(g, 4, "0")).otherwise(g)
        g = F.when(k % 3 == 0, F.upper(g)).otherwise(g)
        gcols.append(g)
    rows = (_t(spark, sf_dir, "orders").filter(k % 5 == 0)
            .select(k.alias("rid"),
                    F.concat_ws(":", *gcols).alias("addr")))
    # --- parse side (operates only on rid + addr) ---
    vals = F.expr("transform(split(addr, ':'), "
                  "x -> cast(conv(x, 16, 10) as bigint))")
    parsed = rows.select(
        "rid", "addr", vals.alias("vals"),
        F.expr("array_join(transform(transform(split(addr, ':'), "
               "x -> cast(conv(x, 16, 10) as bigint)), "
               "v -> if(v = 0, 'z', 'x')), '')").alias("mask"))
    canon_groups = F.expr("transform(vals, v -> lower(hex(v)))")
    run_len = F.lit(0)
    for L in range(2, 9):
        run_len = F.when(F.instr("mask", "z" * L) > 0, F.lit(L)) \
                   .otherwise(run_len)
    parsed = (parsed
              .select("rid", "addr", canon_groups.alias("cg"), "mask")
              .withColumn("zero_run_len", run_len)
              .withColumn(
                  "zero_run_start",
                  F.when(F.col("zero_run_len") > 0,
                         F.expr("instr(mask, repeat('z', zero_run_len))"
                                " - 1"))
                  .otherwise(F.lit(-1)))
              .drop("mask"))
    s, L = F.col("zero_run_start"), F.col("zero_run_len")
    prefix = F.when(s <= 0, F.lit("")).otherwise(
        F.expr("array_join(slice(cg, 1, zero_run_start), ':')"))
    suffix = F.when(s + L >= 8, F.lit("")).otherwise(
        F.expr("array_join(slice(cg, zero_run_start + zero_run_len + 1, "
               "8 - zero_run_start - zero_run_len), ':')"))
    canonical = F.when(L == 0, F.expr("array_join(cg, ':')")) \
                 .otherwise(F.concat(prefix, F.lit("::"), suffix))
    return parsed.select(
        "rid", "addr", canonical.alias("canonical"),
        "zero_run_len", "zero_run_start",
        (L > 0).cast("int").alias("compressed"))


ORACLE_URL_IPV6_NORMALIZE = """
WITH ks AS (
  SELECT o_orderkey AS rid FROM orders WHERE o_orderkey % 5 = 0),
vals AS (
  SELECT rid,
         list_transform(range(8), i -> CASE
             WHEN rid % 97 = 0 THEN 0
             WHEN (rid + i) % 3 = 0 THEN 0
             ELSE (rid * (i + 3)) % 65536 END) AS vs
  FROM ks),
fixture AS (
  SELECT rid, vs,
         array_to_string(list_transform(vs, v -> CASE
             WHEN rid % 3 = 0 AND rid % 2 = 0
               THEN upper(lpad(lower(to_hex(v)), 4, '0'))
             WHEN rid % 3 = 0 THEN upper(lower(to_hex(v)))
             WHEN rid % 2 = 0 THEN lpad(lower(to_hex(v)), 4, '0')
             ELSE lower(to_hex(v)) END), ':') AS addr
  FROM vals),
parsed AS (
  SELECT rid, addr,
         list_transform(string_split(addr, ':'),
                        x -> CAST(('0x' || x) AS BIGINT)) AS pv
  FROM fixture),
masked AS (
  SELECT rid, addr,
         list_transform(pv, v -> lower(to_hex(v))) AS cg,
         array_to_string(list_transform(pv,
             v -> CASE WHEN v = 0 THEN 'z' ELSE 'x' END), '') AS mask
  FROM parsed),
runs AS (
  SELECT rid, addr, cg,
         CASE WHEN strpos(mask, repeat('z', 8)) > 0 THEN 8
              WHEN strpos(mask, repeat('z', 7)) > 0 THEN 7
              WHEN strpos(mask, repeat('z', 6)) > 0 THEN 6
              WHEN strpos(mask, repeat('z', 5)) > 0 THEN 5
              WHEN strpos(mask, repeat('z', 4)) > 0 THEN 4
              WHEN strpos(mask, repeat('z', 3)) > 0 THEN 3
              WHEN strpos(mask, repeat('z', 2)) > 0 THEN 2
              ELSE 0 END AS zero_run_len,
         mask
  FROM masked),
placed AS (
  SELECT rid, addr, cg, zero_run_len,
         CASE WHEN zero_run_len > 0
              THEN strpos(mask, repeat('z', zero_run_len)) - 1
              ELSE -1 END AS zero_run_start
  FROM runs)
SELECT rid, addr,
       CASE WHEN zero_run_len = 0 THEN array_to_string(cg, ':')
            ELSE
              (CASE WHEN zero_run_start <= 0 THEN ''
                    ELSE array_to_string(
                        list_slice(cg, 1, zero_run_start), ':') END)
              || '::' ||
              (CASE WHEN zero_run_start + zero_run_len >= 8 THEN ''
                    ELSE array_to_string(
                        list_slice(cg, zero_run_start + zero_run_len + 1,
                                   8), ':') END)
       END AS canonical,
       zero_run_len, zero_run_start,
       CAST(CASE WHEN zero_run_len > 0 THEN 1 ELSE 0 END AS INT)
         AS compressed
FROM placed
"""


def q_url_surt_key(spark, sf_dir):
    """SURT (Sort-friendly URI Reordering Transform) canonical keys —
    the index key of the Wayback/Common-Crawl world (CDX files sort
    by SURT so one host's records, and one registrable domain's
    subdomains, are CONTIGUOUS — turning per-domain scans into range
    reads): scheme stripped, host lowercased, leading 'www.'
    dropped, labels REVERSED and comma-joined, ')' appended, path
    lowercased with the trailing slash trimmed, query dropped but
    flagged. 'com,example,sub)/path' sorts every example.com page
    together — the property the frontier's domain locality relies on.

    Plan/scale: map-only regexp/array codegen; the downstream win is
    range-partitioning ON the SURT key."""
    k = F.col("o_orderkey")
    site = F.concat(F.lit("Site"), (k % 50).cast("string"),
                    F.lit(".Example"))
    host = (F.when(k % 7 == 0, F.concat(F.lit("a.b."), site))
            .when(k % 3 == 0, F.concat(F.lit("www."), site))
            .otherwise(site))
    url = F.concat(
        F.when(k % 2 == 0, F.lit("https://")).otherwise("http://"),
        host, F.lit("/P"), (k % 20).cast("string"), F.lit("/Item"),
        k.cast("string"),
        F.when(k % 11 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(k % 5 == 0, F.lit("?b=2&a=1")).otherwise(F.lit("")))
    rows = (_t(spark, sf_dir, "orders")
            .select(k.alias("rid"), url.alias("url")))
    h = F.lower(F.regexp_extract("url", "^[a-z]+://([^/?]+)", 1))
    h_nw = F.regexp_replace(h, "^www\\.", "")
    rev = F.expr("array_join(reverse(split(hnw, '\\\\.')), ',')")
    path = F.lower(F.regexp_extract("url", "^[a-z]+://[^/?]+([^?]*)",
                                    1))
    path_t = F.regexp_replace(path, "/$", "")
    return (rows
            .withColumn("hnw", h_nw)
            .select("rid", "url",
                    F.concat(rev, F.lit(")"), path_t).alias("surt"),
                    (F.instr("url", "?") > 0).cast("int")
                    .alias("had_query"))
            )


ORACLE_URL_SURT_KEY = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         (CASE WHEN o_orderkey % 2 = 0 THEN 'https://'
               ELSE 'http://' END)
         || (CASE WHEN o_orderkey % 7 = 0
                THEN 'a.b.Site' || (o_orderkey % 50) || '.Example'
              WHEN o_orderkey % 3 = 0
                THEN 'www.Site' || (o_orderkey % 50) || '.Example'
              ELSE 'Site' || (o_orderkey % 50) || '.Example' END)
         || '/P' || (o_orderkey % 20) || '/Item' || o_orderkey
         || (CASE WHEN o_orderkey % 11 = 0 THEN '/' ELSE '' END)
         || (CASE WHEN o_orderkey % 5 = 0 THEN '?b=2&a=1'
             ELSE '' END) AS url
  FROM orders),
parts AS (
  SELECT rid, url,
         regexp_replace(lower(regexp_extract(url,
             '^[a-z]+://([^/?]+)', 1)), '^www\\.', '') AS hnw,
         regexp_replace(lower(regexp_extract(url,
             '^[a-z]+://[^/?]+([^?]*)', 1)), '/$', '') AS path_t
  FROM rows_)
SELECT rid, url,
       array_to_string(list_reverse(string_split(hnw, '.')), ',')
         || ')' || path_t AS surt,
       CAST(CASE WHEN strpos(url, '?') > 0 THEN 1 ELSE 0 END AS INT)
         AS had_query
FROM parts
"""


def q_url_amp_cache_decode(spark, sf_dir):
    """AMP-cache URL decoding — recovering the ORIGIN URL from a
    ``*.cdn.ampproject.org`` cache address (frontier dedup must fold
    cache hits onto their origin or every AMP page counts twice):
    the cache subdomain encodes the origin host with ``.``->``-``
    and a literal ``-``->``--``, so decoding needs the classic
    three-step sentinel dance (``--``->SENTINEL, ``-``->``.``,
    SENTINEL->``-``) — a naive single replace turns ``my-blog`` into
    ``my.blog``. The decoded host is cross-checked against the host
    embedded in the ``/c/[s/]`` path (mismatch = spoofed cache URL),
    and the ``s/`` segment yields the origin-scheme flag.

    Fixture: origin hosts with plain dots, embedded hyphens, and
    double-dotted TLDs; k%9 drops the ``s/`` (http origin).

    Plan/scale: map-only string codegen."""
    k = F.col("o_orderkey")
    origin = (F.when(k % 3 == 0,
                     F.concat(F.lit("www.site"), (k % 50).cast("string"),
                              F.lit(".example")))
              .when(k % 3 == 1,
                    F.concat(F.lit("my-blog"), (k % 50).cast("string"),
                             F.lit(".example")))
              .otherwise(F.concat(F.lit("site"), (k % 50).cast("string"),
                                  F.lit(".co.uk"))))
    rows = (_t(spark, sf_dir, "orders")
            .select(k.alias("rid"), origin.alias("origin_host"),
                    (k % 9 != 0).cast("int").alias("origin_https")))
    enc = F.expr("replace(replace(origin_host, '-', '--'), '.', '-')")
    url = F.concat(
        F.lit("https://"), enc, F.lit(".cdn.ampproject.org/c/"),
        F.when(F.col("origin_https") == 1, "s/").otherwise(""),
        F.col("origin_host"), F.lit("/art"),
        (F.col("rid") % 20).cast("string"))
    rows = rows.select("rid", "origin_host", "origin_https",
                       url.alias("cache_url"))
    sub = F.regexp_extract(
        "cache_url", "^https://([^.]+)\\.cdn\\.ampproject\\.org", 1)
    decoded = F.expr(
        "replace(replace(replace(sub, '--', char(1)), '-', '.'), "
        "char(1), '-')")
    path_host = F.regexp_extract("cache_url", "/c/(s/)?([^/]+)", 2)
    https_flag = (F.regexp_extract("cache_url", "/c/(s/)?", 1) == "s/")
    return (rows.withColumn("sub", sub)
            .select("rid", "cache_url",
                    decoded.alias("decoded_host"),
                    path_host.alias("path_host"),
                    (decoded == path_host).cast("int")
                    .alias("consistent"),
                    https_flag.cast("int").alias("https_origin")))


ORACLE_URL_AMP_CACHE_DECODE = """
WITH origins AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 3 = 0
                THEN 'www.site' || (o_orderkey % 50) || '.example'
              WHEN o_orderkey % 3 = 1
                THEN 'my-blog' || (o_orderkey % 50) || '.example'
              ELSE 'site' || (o_orderkey % 50) || '.co.uk'
         END AS origin_host,
         CASE WHEN o_orderkey % 9 <> 0 THEN 1 ELSE 0 END
           AS origin_https
  FROM orders),
built AS (
  SELECT rid, origin_host, origin_https,
         'https://'
         || replace(replace(origin_host, '-', '--'), '.', '-')
         || '.cdn.ampproject.org/c/'
         || (CASE WHEN origin_https = 1 THEN 's/' ELSE '' END)
         || origin_host || '/art' || (rid % 20) AS cache_url
  FROM origins),
parsed AS (
  SELECT rid, cache_url,
         regexp_extract(cache_url,
           '^https://([^.]+)\\.cdn\\.ampproject\\.org', 1) AS sub,
         regexp_extract(cache_url, '/c/(s/)?([^/]+)', 2) AS path_host,
         regexp_extract(cache_url, '/c/(s/)?', 1) = 's/' AS https_o
  FROM built)
SELECT rid, cache_url,
       replace(replace(replace(sub, '--', chr(1)), '-', '.'),
               chr(1), '-') AS decoded_host,
       path_host,
       CAST(replace(replace(replace(sub, '--', chr(1)), '-', '.'),
                    chr(1), '-') = path_host AS INT) AS consistent,
       CAST(https_o AS INT) AS https_origin
FROM parsed
"""


def q_url_open_redirect_detect(spark, sf_dir):
    """Open-redirect parameter detection — both a crawler-trap guard
    (a ``?next=`` chain through a redirector page loops the frontier
    through infinite URL variants) and the classic security lint:
    known redirect parameter names (next/goto) are pulled from the
    query string, their values classified as absolute-cross-host
    (the open redirect), absolute-same-host, or relative, by
    extracting and comparing the embedded target host against the
    page's own host.

    Fixture: k%4 cycles same-host absolute / cross-host absolute
    (evil target) / relative / no redirect param; the param name
    alternates next/goto by k%2.

    Plan/scale: map-only regexp codegen."""
    k = F.col("o_orderkey")
    site = F.concat(F.lit("site"), (k % 50).cast("string"),
                    F.lit(".example"))
    pname = F.when(k % 2 == 0, "next").otherwise(F.lit("goto"))
    val = (F.when(k % 4 == 0, F.concat(F.lit("https://"), site,
                                       F.lit("/home")))
           .when(k % 4 == 1, F.concat(F.lit("https://evil"),
                                      (k % 7).cast("string"),
                                      F.lit(".example/phish")))
           .when(k % 4 == 2, F.lit("/dashboard"))
           .otherwise(F.lit("")))
    url = F.concat(
        F.lit("https://"), site, F.lit("/login"),
        F.when(k % 4 == 3, F.lit("?ref=abc"))
        .otherwise(F.concat(F.lit("?"), pname, F.lit("="), val)))
    rows = (_t(spark, sf_dir, "orders")
            .select(k.alias("rid"), url.alias("url")))
    page_host = F.regexp_extract("url", "^https://([^/]+)/", 1)
    rparam = F.regexp_extract("url", "[?&](next|goto)=", 1)
    rval = F.regexp_extract("url", "[?&](?:next|goto)=([^&]*)", 1)
    tgt = F.regexp_extract(rval, "^https?://([^/]+)", 1)
    verdict = (F.when(rparam == "", "none")
               .when(tgt == "", "relative")
               .when(tgt == page_host, "same_host")
               .otherwise(F.lit("open_redirect")))
    return rows.select(
        "rid", "url",
        rparam.alias("redirect_param"),
        tgt.alias("target_host"),
        ((rparam != "") & (tgt != "") & (tgt != page_host))
        .cast("int").alias("cross_host"),
        verdict.alias("verdict"))


ORACLE_URL_OPEN_REDIRECT_DETECT = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         'site' || (o_orderkey % 50) || '.example' AS site,
         CASE WHEN o_orderkey % 2 = 0 THEN 'next' ELSE 'goto' END
           AS pname,
         o_orderkey % 4 AS m4, o_orderkey % 7 AS m7
  FROM orders),
built AS (
  SELECT rid,
         'https://' || site || '/login' ||
         CASE WHEN m4 = 3 THEN '?ref=abc'
              ELSE '?' || pname || '=' ||
                CASE WHEN m4 = 0 THEN 'https://' || site || '/home'
                     WHEN m4 = 1
                       THEN 'https://evil' || m7 || '.example/phish'
                     ELSE '/dashboard' END
         END AS url
  FROM rows_),
parsed AS (
  SELECT rid, url,
         regexp_extract(url, '^https://([^/]+)/', 1) AS page_host,
         regexp_extract(url, '[?&](next|goto)=', 1) AS rparam,
         regexp_extract(regexp_extract(url,
             '[?&](?:next|goto)=([^&]*)', 1),
             '^https?://([^/]+)', 1) AS tgt
  FROM built)
SELECT rid, url, rparam AS redirect_param, tgt AS target_host,
       CAST(rparam <> '' AND tgt <> '' AND tgt <> page_host AS INT)
         AS cross_host,
       CASE WHEN rparam = '' THEN 'none'
            WHEN tgt = '' THEN 'relative'
            WHEN tgt = page_host THEN 'same_host'
            ELSE 'open_redirect' END AS verdict
FROM parsed
"""


def q_url_slug_classify(spark, sf_dir):
    """URL-slug readability classification — a corpus-quality prior
    that costs nothing (human-written articles live at hyphenated
    word slugs; session dumps and CDN assets live at hex blobs;
    the share of readable slugs per host predicts content quality
    before a single byte of HTML is fetched): the LAST path segment
    is classified by shape — numeric, long-hex id, hyphenated slug,
    bare word — and a per-host window rolls up the readable share
    in ppm (readable = slug|word).

    Fixture: k%4 cycles hyphenated slug / 16-hex id / numeric /
    short word.

    Plan/scale: regexp codegen + one host-keyed window — the same
    shuffle any per-host census pays."""
    k = F.col("o_orderkey")
    seg = (F.when(k % 4 == 0,
                  F.concat(F.lit("my-article-title-"),
                           (k % 9).cast("string")))
           .when(k % 4 == 1,
                 F.substring(F.md5(k.cast("string")), 1, 16))
           .when(k % 4 == 2, k.cast("string"))
           .otherwise(F.concat(F.lit("page"), (k % 7).cast("string"))))
    url = F.concat(F.lit("https://site"), (k % 50).cast("string"),
                   F.lit(".example/sec/"), seg)
    rows = (_t(spark, sf_dir, "orders")
            .select(k.alias("rid"), url.alias("url")))
    last = F.regexp_extract("url", "/([^/]+)$", 1)
    klass = (F.when(last.rlike("^[0-9]+$"), "numeric")
             .when(last.rlike("^[0-9a-f]{8,}$"), "hex_id")
             .when(last.rlike("^[a-z]+(-[a-z0-9]+)+$"), "slug")
             .when(last.rlike("^[a-z]+[0-9]*$"), "word")
             .otherwise(F.lit("other")))
    host = F.regexp_extract("url", "^https://([^/]+)/", 1)
    base = rows.select("rid", "url", host.alias("host"),
                       last.alias("last_seg"),
                       klass.alias("seg_class"))
    w = Window.partitionBy("host")
    readable = F.col("seg_class").isin("slug", "word").cast("long")
    return (base
            .withColumn("readable", readable.cast("int"))
            .withColumn("_n_read", F.sum(readable).over(w))
            .withColumn("_n_host", F.count("*").over(w))
            .withColumn("host_readable_ppm",
                        F.expr("(_n_read * 1000000) div _n_host"))
            .drop("_n_read", "_n_host"))


ORACLE_URL_SLUG_CLASSIFY = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         'https://site' || (o_orderkey % 50) || '.example/sec/' ||
         CASE WHEN o_orderkey % 4 = 0
                THEN 'my-article-title-' || (o_orderkey % 9)
              WHEN o_orderkey % 4 = 1
                THEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 16)
              WHEN o_orderkey % 4 = 2
                THEN CAST(o_orderkey AS VARCHAR)
              ELSE 'page' || (o_orderkey % 7) END AS url
  FROM orders),
parsed AS (
  SELECT rid, url,
         regexp_extract(url, '^https://([^/]+)/', 1) AS host,
         regexp_extract(url, '/([^/]+)$', 1) AS last_seg
  FROM rows_),
classed AS (
  SELECT rid, url, host, last_seg,
         CASE WHEN regexp_matches(last_seg, '^[0-9]+$')
                THEN 'numeric'
              WHEN regexp_matches(last_seg, '^[0-9a-f]{8,}$')
                THEN 'hex_id'
              WHEN regexp_matches(last_seg, '^[a-z]+(-[a-z0-9]+)+$')
                THEN 'slug'
              WHEN regexp_matches(last_seg, '^[a-z]+[0-9]*$')
                THEN 'word'
              ELSE 'other' END AS seg_class
  FROM parsed)
SELECT rid, url, host, last_seg, seg_class,
       CAST(CASE WHEN seg_class IN ('slug', 'word') THEN 1 ELSE 0 END
            AS INT) AS readable,
       (SUM(CASE WHEN seg_class IN ('slug', 'word')
             THEN 1 ELSE 0 END) OVER (PARTITION BY host)
        * 1000000) // COUNT(*) OVER (PARTITION BY host)
         AS host_readable_ppm
FROM classed
"""


def q_url_param_profile(spark, sf_dir):
    """Query-parameter TYPE profiling per host — API-surface mining
    from URL logs alone (knowing ``id`` is an integer key, ``page``
    a small enum, and ``ref`` an opaque token tells the frontier
    which params enumerate real content and which explode into
    traps): params explode once, and each (host, param) rolls up
    URL count, distinct values, and a shape class decided by
    all-value predicates folded into the agg (min-of-matches = 1
    means EVERY value matched): all-numeric -> 'int', all-hex8+ ->
    'token', <=5 distinct -> 'enum', else 'opaque'.

    Plan/scale: explode map-side, ONE (host,param) agg with
    conditional mins + distinct count — no second pass."""
    k = F.col("o_orderkey")
    host = F.concat(F.lit("site"), (k % 20).cast("string"),
                    F.lit(".example"))
    qparts = F.concat(
        F.lit("id="), k.cast("string"),
        F.lit("&page="), (k % 5).cast("string"),
        F.lit("&sort="),
        F.when(k % 3 == 0, "asc").when(k % 3 == 1, "desc")
        .otherwise(F.lit("top")),
        F.when(k % 3 == 0,
               F.concat(F.lit("&ref="),
                        F.substring(F.md5(k.cast("string")), 1, 12)))
        .otherwise(F.lit("")))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), host.alias("host"), qparts.alias("qs"))
    params = rows.select(
        "host",
        F.explode(F.expr("split(qs, '&')")).alias("kv"))
    params = params.select(
        "host",
        F.expr("split(kv, '=')[0]").alias("param"),
        F.expr("split(kv, '=')[1]").alias("val"))
    agg = (params.groupBy("host", "param")
           .agg(F.count("*").cast("long").alias("n_urls"),
                F.countDistinct("val").cast("long")
                .alias("n_distinct"),
                F.min(F.col("val").rlike("^[0-9]+$").cast("int"))
                .alias("all_num"),
                F.min(F.col("val").rlike("^[0-9a-f]{8,}$")
                      .cast("int")).alias("all_hex")))
    return (agg.withColumn(
        "value_class",
        F.when(F.col("all_num") == 1, "int")
        .when(F.col("all_hex") == 1, "token")
        .when(F.col("n_distinct") <= 5, "enum")
        .otherwise(F.lit("opaque")))
        .withColumn("cardinality_ppm",
                    F.expr("(n_distinct * 1000000) div n_urls"))
        .drop("all_num", "all_hex"))


ORACLE_URL_PARAM_PROFILE = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         'site' || (o_orderkey % 20) || '.example' AS host,
         'id=' || o_orderkey || '&page=' || (o_orderkey % 5)
         || '&sort=' || (CASE WHEN o_orderkey % 3 = 0 THEN 'asc'
                         WHEN o_orderkey % 3 = 1 THEN 'desc'
                         ELSE 'top' END) ||
         CASE WHEN o_orderkey % 3 = 0
              THEN '&ref=' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                     1, 12)
              ELSE '' END AS qs
  FROM orders),
params AS (
  SELECT host, unnest(string_split(qs, '&')) AS kv FROM rows_),
parsed AS (
  SELECT host, string_split(kv, '=')[1] AS param,
         string_split(kv, '=')[2] AS val
  FROM params),
agg AS (
  SELECT host, param,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(count(DISTINCT val) AS BIGINT) AS n_distinct,
         min(CASE WHEN regexp_matches(val, '^[0-9]+$')
             THEN 1 ELSE 0 END) AS all_num,
         min(CASE WHEN regexp_matches(val, '^[0-9a-f]{8,}$')
             THEN 1 ELSE 0 END) AS all_hex
  FROM parsed GROUP BY host, param)
SELECT host, param, n_urls, n_distinct,
       CASE WHEN all_num = 1 THEN 'int'
            WHEN all_hex = 1 THEN 'token'
            WHEN n_distinct <= 5 THEN 'enum'
            ELSE 'opaque' END AS value_class,
       (n_distinct * 1000000) // n_urls AS cardinality_ppm
FROM agg
"""


def q_url_feed_autodiscovery(spark, sf_dir):
    """RSS/Atom feed autodiscovery — the ``<link rel="alternate">``
    convention that turns a page fetch into a subscription (a
    crawler that discovers feeds re-crawls CHANGES instead of
    polling whole sites; the reference's periodic re-feed loop is
    exactly what this replaces at scale): alternate links with
    rss/atom media types are pulled from the head, RELATIVE hrefs
    resolve against the page origin, stylesheets and other link
    rels must not match.

    Fixture: k%3 cycles relative-rss / absolute-atom / no feed;
    every page carries a stylesheet decoy.

    Plan/scale: map-only regexp codegen."""
    k = F.col("o_orderkey")
    origin = F.concat(F.lit("https://site"), (k % 50).cast("string"),
                      F.lit(".example"))
    head = F.concat(
        F.lit('<link rel="stylesheet" href="/s.css">'),
        F.when(k % 3 == 0,
               F.lit('<link rel="alternate" '
                     'type="application/rss+xml" href="/feed.xml">'))
        .when(k % 3 == 1,
              F.concat(F.lit('<link rel="alternate" '
                             'type="application/atom+xml" href="'),
                       origin, F.lit('/atom">')))
        .otherwise(F.lit("")))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), origin.alias("origin"), head.alias("head"))
    pat = ('<link rel="alternate" type="application/'
           '(rss|atom)\\+xml" href="([^"]*)"')
    kind = F.regexp_extract("head", pat, 1)
    href = F.regexp_extract("head", pat, 2)
    resolved = (F.when(href == "", F.lit(""))
                .when(href.startswith("http"), href)
                .otherwise(F.concat(F.col("origin"), href)))
    return rows.select(
        "rid",
        F.when(kind == "", "none").otherwise(kind).alias("feed_kind"),
        resolved.alias("feed_url"),
        (kind != "").cast("int").alias("has_feed"))


ORACLE_URL_FEED_AUTODISCOVERY = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         'https://site' || (o_orderkey % 50) || '.example' AS origin,
         '<link rel="stylesheet" href="/s.css">' ||
         CASE WHEN o_orderkey % 3 = 0
                THEN '<link rel="alternate" '
                  || 'type="application/rss+xml" href="/feed.xml">'
              WHEN o_orderkey % 3 = 1
                THEN '<link rel="alternate" '
                  || 'type="application/atom+xml" href="https://site'
                  || (o_orderkey % 50) || '.example/atom">'
              ELSE '' END AS head
  FROM orders),
parsed AS (
  SELECT rid, origin,
         regexp_extract(head, '<link rel="alternate" '
           || 'type="application/(rss|atom)\\+xml" href="([^"]*)"',
           1) AS kind,
         regexp_extract(head, '<link rel="alternate" '
           || 'type="application/(rss|atom)\\+xml" href="([^"]*)"',
           2) AS href
  FROM rows_)
SELECT rid,
       CASE WHEN kind = '' THEN 'none' ELSE kind END AS feed_kind,
       CASE WHEN href = '' THEN ''
            WHEN href LIKE 'http%' THEN href
            ELSE origin || href END AS feed_url,
       CAST(kind <> '' AS INT) AS has_feed
FROM parsed
"""


def q_url_template_expand(spark, sf_dir):
    """RFC 6570 URI-template expansion (level 1) — how an API-aware
    crawler turns endpoint TEMPLATES into fetchable URLs (OpenAPI
    specs and sitemap generators publish '/users/{id}' shapes; the
    frontier wants concrete URLs and must KNOW when a variable had
    no binding rather than fetch a literal '{q}'): each template's
    variables substitute from the binding set, and unresolved
    ``{var}`` tokens are counted — an incomplete expansion never
    reaches the frontier.

    Fixture: 4 template shapes; the 'q' variable is deliberately
    unbound.

    Plan/scale: map-only replace/regexp codegen."""
    k = F.col("o_orderkey")
    template = (F.when(k % 4 == 0, "/users/{id}")
                .when(k % 4 == 1, "/repos/{owner}/{repo}")
                .when(k % 4 == 2, "/search?q={q}")
                .otherwise(F.lit("/static/logo.png")))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), template.alias("template"))
    expanded = F.col("template")
    for var, val in (("{id}", F.col("rid").cast("string")),
                     ("{owner}", F.concat(F.lit("org"),
                                          (F.col("rid") % 10)
                                          .cast("string"))),
                     ("{repo}", F.concat(F.lit("proj"),
                                         (F.col("rid") % 7)
                                         .cast("string")))):
        expanded = F.replace(expanded, F.lit(var), val)
    n_vars = F.expr(
        "size(regexp_extract_all(template, '\\\\{[a-z]+\\\\}', 0))")
    out = rows.select("rid", "template", expanded.alias("expanded"),
                      n_vars.cast("int").alias("n_vars"))
    n_unres = F.expr(
        "size(regexp_extract_all(expanded, '\\\\{[a-z]+\\\\}', 0))")
    return (out.withColumn("n_unresolved", n_unres.cast("int"))
            .withColumn("complete",
                        (F.col("n_unresolved") == 0).cast("int")))


ORACLE_URL_TEMPLATE_EXPAND = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 4 = 0 THEN '/users/{id}'
              WHEN o_orderkey % 4 = 1 THEN '/repos/{owner}/{repo}'
              WHEN o_orderkey % 4 = 2 THEN '/search?q={q}'
              ELSE '/static/logo.png' END AS template
  FROM orders),
expanded AS (
  SELECT rid, template,
         replace(replace(replace(template,
             '{id}', CAST(rid AS VARCHAR)),
             '{owner}', 'org' || (rid % 10)),
             '{repo}', 'proj' || (rid % 7)) AS expanded
  FROM rows_)
SELECT rid, template, expanded,
       CAST(len(regexp_extract_all(template, '\\{[a-z]+\\}'))
            AS INT) AS n_vars,
       CAST(len(regexp_extract_all(expanded, '\\{[a-z]+\\}'))
            AS INT) AS n_unresolved,
       CAST(len(regexp_extract_all(expanded, '\\{[a-z]+\\}')) = 0
            AS INT) AS complete
FROM expanded
"""


def q_url_front_coding(spark, sf_dir):
    """Front-coding (incremental-prefix) storage accounting for the
    sorted URL frontier — the trick CDX indexes and search-engine
    term dictionaries live on (consecutive SORTED urls share long
    prefixes; storing only the tail + an LCP byte collapses a
    10^10-row frontier's hot index by 60-80%): within each host's
    sorted URL stream, the LCP against the predecessor computes as
    a monotone prefix-match count (count of i where the i-prefixes
    agree — monotonicity makes count == LCP, O(len²) per row but
    len is bounded), and the per-host census prices raw vs
    front-coded bytes.

    Plan/scale: one per-host ordered window (lag) + census on the
    same key; the LCP math is row-local codegen."""
    k = F.col("o_orderkey")
    url = F.concat(F.lit("/cat"), (k % 5).cast("string"),
                   F.lit("/item"),
                   F.lpad(k.cast("string"), 8, "0"))
    rows = _t(spark, sf_dir, "orders").select(
        (k % 40).alias("hn"), url.alias("url"))
    w = Window.partitionBy("hn").orderBy("url")
    rows = rows.withColumn("prev", F.lag("url").over(w))
    lcp = F.expr(
        "if(prev is null, 0, size(filter(sequence(1, "
        "least(length(url), length(prev))), "
        "i -> substr(url, 1, i) = substr(prev, 1, i))))")
    costed = rows.withColumn("lcp", lcp.cast("long")) \
        .withColumn("coded_bytes",
                    F.length("url") - F.col("lcp") + 2)
    return (costed.groupBy("hn")
            .agg(F.count("*").cast("long").alias("n_urls"),
                 F.sum(F.length("url")).cast("long")
                 .alias("raw_bytes"),
                 F.sum("coded_bytes").cast("long")
                 .alias("coded_bytes"))
            .select(F.concat(F.lit("h"), F.col("hn").cast("string"))
                    .alias("host"),
                    "n_urls", "raw_bytes", "coded_bytes",
                    F.expr("((raw_bytes - coded_bytes) * 1000000)"
                           " div raw_bytes").alias("savings_ppm")))


ORACLE_URL_FRONT_CODING = """
WITH rows_ AS (
  SELECT o_orderkey % 40 AS hn,
         '/cat' || (o_orderkey % 5) || '/item'
         || lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS url
  FROM orders),
lagged AS (
  SELECT hn, url,
         LAG(url) OVER (PARTITION BY hn ORDER BY url) AS prev
  FROM rows_),
costed AS (
  SELECT hn, url,
         CASE WHEN prev IS NULL THEN 0
              ELSE len(list_filter(range(1,
                   least(length(url), length(prev)) + 1),
                   i -> substr(url, 1, CAST(i AS INT))
                        = substr(prev, 1, CAST(i AS INT)))) END
           AS lcp
  FROM lagged)
SELECT 'h' || hn AS host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(length(url)) AS BIGINT) AS raw_bytes,
       CAST(sum(length(url) - lcp + 2) AS BIGINT) AS coded_bytes,
       ((CAST(sum(length(url)) AS BIGINT)
         - CAST(sum(length(url) - lcp + 2) AS BIGINT)) * 1000000)
         // CAST(sum(length(url)) AS BIGINT) AS savings_ppm
FROM costed GROUP BY hn
"""


def q_url_hostname_validate(spark, sf_dir):
    """RFC 1123 hostname validation at LABEL granularity — the
    spec-precise layer under the repo's coarse URL validators (a
    hostname is valid iff every dot-label is 1-63 chars of
    [a-z0-9-] with no leading/trailing hyphen, the whole name is
    <= 253 chars, and the TLD is not all-numeric — each rule
    catches a distinct garbage class the frontier must bounce):
    labels split and each rule evaluates in the array domain; the
    verdict names the FIRST violated rule.

    Fixture: k%7 plants label-too-long / leading-hyphen /
    trailing-hyphen / empty-label (double dot) / numeric-TLD /
    underscore classes against valid hosts.

    Plan/scale: map-only regexp + array codegen."""
    k = F.col("o_orderkey")
    host = (F.when(k % 7 == 1,
                   F.concat(F.lit("a"), F.expr("repeat('x', 64)"),
                            F.lit(".example")))
            .when(k % 7 == 2, F.concat(F.lit("-bad"),
                                       (k % 9).cast("string"),
                                       F.lit(".example")))
            .when(k % 7 == 3, F.concat(F.lit("bad-"),
                                       (k % 9).cast("string"),
                                       F.lit("-.example")))
            .when(k % 7 == 4, F.concat(F.lit("a.."),
                                       (k % 9).cast("string"),
                                       F.lit(".example")))
            .when(k % 7 == 5, F.concat(F.lit("site"),
                                       (k % 9).cast("string"),
                                       F.lit(".12345")))
            .when(k % 7 == 6, F.concat(F.lit("un_der"),
                                       (k % 9).cast("string"),
                                       F.lit(".example")))
            .otherwise(F.concat(F.lit("ok-site"),
                                (k % 50).cast("string"),
                                F.lit(".example"))))
    rows = (_t(spark, sf_dir, "orders")
            .select(k.alias("rid"), host.alias("host")))
    labels = F.expr("split(host, '\\\\.')")
    base = rows.select("rid", "host", labels.alias("ls"))
    too_long_host = F.length("host") > 253
    bad_label = F.expr(
        "size(filter(ls, l -> length(l) = 0 or length(l) > 63 "
        "or l rlike '^-' or l rlike '-$' "
        "or not l rlike '^[a-z0-9-]+$')) > 0")
    numeric_tld = F.expr(
        "element_at(ls, size(ls)) rlike '^[0-9]+$'")
    verdict = (F.when(too_long_host, "too_long")
               .when(F.expr("size(filter(ls, l -> length(l) = 0))"
                            " > 0"), "empty_label")
               .when(F.expr("size(filter(ls, l -> length(l) > 63))"
                            " > 0"), "label_too_long")
               .when(F.expr("size(filter(ls, l -> l rlike '^-' or "
                            "l rlike '-$')) > 0"), "hyphen_edge")
               .when(F.expr("size(filter(ls, l -> not l rlike "
                            "'^[a-z0-9-]+$')) > 0"), "bad_chars")
               .when(numeric_tld, "numeric_tld")
               .otherwise(F.lit("valid")))
    return base.select(
        "rid", "host",
        F.expr("size(ls)").cast("int").alias("n_labels"),
        verdict.alias("verdict"),
        ((~too_long_host) & (~bad_label) & (~numeric_tld))
        .cast("int").alias("is_valid"))


ORACLE_URL_HOSTNAME_VALIDATE = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         CASE WHEN o_orderkey % 7 = 1
                THEN 'a' || repeat('x', 64) || '.example'
              WHEN o_orderkey % 7 = 2
                THEN '-bad' || (o_orderkey % 9) || '.example'
              WHEN o_orderkey % 7 = 3
                THEN 'bad-' || (o_orderkey % 9) || '-.example'
              WHEN o_orderkey % 7 = 4
                THEN 'a..' || (o_orderkey % 9) || '.example'
              WHEN o_orderkey % 7 = 5
                THEN 'site' || (o_orderkey % 9) || '.12345'
              WHEN o_orderkey % 7 = 6
                THEN 'un_der' || (o_orderkey % 9) || '.example'
              ELSE 'ok-site' || (o_orderkey % 50) || '.example'
         END AS host
  FROM orders),
split_ AS (
  SELECT rid, host, string_split(host, '.') AS ls FROM rows_),
checked AS (
  SELECT rid, host, ls,
         length(host) > 253 AS too_long,
         len(list_filter(ls, l -> length(l) = 0)) > 0 AS has_empty,
         len(list_filter(ls, l -> length(l) > 63)) > 0 AS has_long,
         len(list_filter(ls, l -> regexp_matches(l, '^-')
             OR regexp_matches(l, '-$'))) > 0 AS hyphen_edge,
         len(list_filter(ls, l -> NOT regexp_matches(l,
             '^[a-z0-9-]+$'))) > 0 AS bad_chars,
         regexp_matches(ls[len(ls)], '^[0-9]+$') AS numeric_tld
  FROM split_)
SELECT rid, host, CAST(len(ls) AS INT) AS n_labels,
       CASE WHEN too_long THEN 'too_long'
            WHEN has_empty THEN 'empty_label'
            WHEN has_long THEN 'label_too_long'
            WHEN hyphen_edge THEN 'hyphen_edge'
            WHEN bad_chars THEN 'bad_chars'
            WHEN numeric_tld THEN 'numeric_tld'
            ELSE 'valid' END AS verdict,
       CAST(NOT too_long AND NOT has_empty AND NOT has_long
            AND NOT hyphen_edge AND NOT bad_chars
            AND NOT numeric_tld AS INT) AS is_valid
FROM checked
"""


def q_url_alias_resolve(spark, sf_dir):
    """URL ALIAS RESOLUTION — the composition row over the three alias
    signals the registry verifies separately (url_redirect_resolve,
    url_rel_canonical, url_mobile_amp_collapse): redirect targets,
    rel=canonical declarations, and amp./m. host variants all assert
    "these URLs are the same page"; a frontier must crawl ONE
    representative per alias component or it spends 4x fetches per
    page. Edges form an undirected alias graph (variant -> base ->
    canonical chains, diameter <= 2 by construction), components are
    resolved by THREE unrolled rounds of hash-min label propagation
    (the bounded-diameter closed form of operators/cc.py's loop —
    SQL-expressible, so the oracle replays it exactly), and each
    component elects its lexicographic-min URL. Output is one row per
    distinct URL with its representative and component size.

    Plan/scale: 3 self-joins on a uniform url key + one count per
    component — O(E) per round, E = O(urls), no iteration beyond the
    fixed unroll because alias chains are short in real crawls (and
    anything longer belongs to the general CC operator)."""
    k = F.col("o_orderkey")
    b = k % 200
    base = F.concat(F.lit("https://h"), (b % 20).cast("string"),
                    F.lit(".example.com/p"), b.cast("string"))
    canon = F.concat(F.lit("https://h"), (b % 20).cast("string"),
                     F.lit(".example.com/canonical"),
                     (b / 10).cast("long").cast("string"))
    variant = (F.when(k % 3 == 0,
                      F.concat(F.lit("https://amp.h"),
                               (b % 20).cast("string"),
                               F.lit(".example.com/p"), b.cast("string")))
               .when(k % 3 == 1,
                     F.concat(F.lit("https://m.h"), (b % 20).cast("string"),
                              F.lit(".example.com/p"), b.cast("string")))
               .otherwise(F.concat(base, F.lit("?utm_source=x"))))
    orders = _t(spark, sf_dir, "orders")
    e_var = orders.select(variant.alias("src"), base.alias("dst"))
    # every 10th base also declares rel=canonical -> a 2-hop chain
    e_can = (orders.filter(b % 10 == 0)
             .select(base.alias("src"), canon.alias("dst")))
    edges = e_var.unionByName(e_can).distinct()
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    nodes = (und.select(F.col("src").alias("url")).distinct())
    lab = nodes.select("url", F.col("url").alias("lbl"))
    for _ in range(3):
        nbr = (und.join(lab, und.dst == lab.url)
               .groupBy("src").agg(F.min("lbl").alias("nbr_min")))
        lab = (lab.join(nbr, lab.url == nbr.src, "left")
               .select(lab.url,
                       F.least(F.col("lbl"),
                               F.coalesce("nbr_min", F.col("lbl")))
                       .alias("lbl")))
    size = lab.groupBy("lbl").agg(F.count("*").alias("component_size"))
    return (lab.join(size, "lbl")
            .select("url", F.col("lbl").alias("canonical_rep"),
                    "component_size")
            .orderBy("url"))


ORACLE_URL_ALIAS_RESOLVE = """
WITH ords AS (
  SELECT o_orderkey AS k, o_orderkey % 200 AS b FROM orders
),
named AS (
  SELECT k, b,
         'https://h' || (b % 20) || '.example.com/p' || b AS base,
         'https://h' || (b % 20) || '.example.com/canonical' || (b // 10)
           AS canon
  FROM ords
),
e_var AS (
  SELECT CASE k % 3
           WHEN 0 THEN 'https://amp.h' || (b % 20) || '.example.com/p' || b
           WHEN 1 THEN 'https://m.h' || (b % 20) || '.example.com/p' || b
           ELSE base || '?utm_source=x'
         END AS src, base AS dst
  FROM named
),
e_can AS (
  SELECT base AS src, canon AS dst FROM named WHERE b % 10 = 0
),
edges AS (
  SELECT DISTINCT src, dst FROM
    (SELECT src, dst FROM e_var UNION ALL SELECT src, dst FROM e_can)
),
und AS (
  SELECT DISTINCT src, dst FROM
    (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges)
),
l0 AS (SELECT DISTINCT src AS url, src AS lbl FROM und),
l1 AS (
  SELECT l.url,
         least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l0 l LEFT JOIN und e ON e.src = l.url
            LEFT JOIN l0 n ON n.url = e.dst
  GROUP BY l.url, l.lbl
),
l2 AS (
  SELECT l.url,
         least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l1 l LEFT JOIN und e ON e.src = l.url
            LEFT JOIN l1 n ON n.url = e.dst
  GROUP BY l.url, l.lbl
),
l3 AS (
  SELECT l.url,
         least(l.lbl, coalesce(min(n.lbl), l.lbl)) AS lbl
  FROM l2 l LEFT JOIN und e ON e.src = l.url
            LEFT JOIN l2 n ON n.url = e.dst
  GROUP BY l.url, l.lbl
),
sz AS (SELECT lbl, count(*) AS component_size FROM l3 GROUP BY lbl)
SELECT l3.url, l3.lbl AS canonical_rep, sz.component_size
FROM l3 JOIN sz USING (lbl)
ORDER BY l3.url
"""


def q_url_scheme_downgrade(spark, sf_dir):
    """HTTPS->HTTP DOWNGRADE-link detection — the security-ops signal on
    link EDGES that url_scheme_consolidate (which merges scheme-duplicate
    URLs) cannot see: a secure page linking to a cleartext target leaks
    referrer context and invites SSLstrip-style interception, and sites
    with a high downgrade share need scheme-upgrade rewriting at the
    frontier. Edges are synthesized with a per-host mix (every 3rd host
    serves half its outlinks as downgrades, every 7th link on any host
    is cleartext-to-cleartext — not a downgrade); per source host: edge
    mass, downgrade count, share in ppm, and the rewrite flag at the 20%
    threshold. Pure codegen census, one partial agg at host grain."""
    k = F.col("l_orderkey") + F.col("l_linenumber")
    h = k % 30
    src_secure = ~((k % 7 == 0) | ((h % 3 == 0) & (k % 2 == 0)))
    dst_secure = ~((k % 7 == 0) | ((h % 3 == 0) & (k % 4 < 2)))
    edges = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("h"), h.cast("string")).alias("src_host"),
        src_secure.alias("src_https"), dst_secure.alias("dst_https"))
    is_down = (F.col("src_https") & ~F.col("dst_https")).cast("long")
    return (edges.groupBy("src_host")
            .agg(F.count("*").alias("n_links"),
                 F.sum(is_down).alias("n_downgrade"))
            .withColumn("downgrade_ppm",
                        F.expr("n_downgrade * 1000000 DIV n_links"))
            .withColumn("needs_rewrite",
                        F.expr("n_downgrade * 1000000 DIV n_links")
                        >= 200000)
            .orderBy("src_host"))


ORACLE_URL_SCHEME_DOWNGRADE = """
WITH edges AS (
  SELECT 'h' || ((l_orderkey + l_linenumber) % 30) AS src_host,
         NOT ((l_orderkey + l_linenumber) % 7 = 0
              OR (((l_orderkey + l_linenumber) % 30) % 3 = 0
                  AND (l_orderkey + l_linenumber) % 2 = 0)) AS src_https,
         NOT ((l_orderkey + l_linenumber) % 7 = 0
              OR (((l_orderkey + l_linenumber) % 30) % 3 = 0
                  AND (l_orderkey + l_linenumber) % 4 < 2)) AS dst_https
  FROM lineitem
),
agg AS (
  SELECT src_host, count(*) AS n_links,
         sum(CASE WHEN src_https AND NOT dst_https THEN 1 ELSE 0 END)
           AS n_downgrade
  FROM edges GROUP BY src_host
)
SELECT src_host, n_links, n_downgrade,
       n_downgrade * 1000000 // n_links AS downgrade_ppm,
       n_downgrade * 1000000 // n_links >= 200000 AS needs_rewrite
FROM agg
ORDER BY src_host
"""
