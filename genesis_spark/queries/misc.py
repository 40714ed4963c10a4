"""Registry family: Other (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_tls_cert_audit(spark, sf_dir):
    """TLS certificate admission audit — the transport-trust gate a
    crawler runs before trusting a host's content (reference trusts the
    Tor/SOCKS layer; on clearnet the cert IS the identity check): per
    connection, RFC 6125 name matching (exact SAN, or wildcard ``*.d``
    covering exactly ONE left-most label — ``www.siteN.example``
    matches ``*.siteN.example`` but the apex ``siteN.example`` does
    NOT) plus validity-window arithmetic against a fixed "today"
    (day 400), yielding the four-way verdict
    expired > name_mismatch > expiring(<30d) > ok.

    Fixture: host k%4 -> www./api./apex of site(k%50); SAN k%3 ->
    wildcard / exact-apex / mismatched; not_before=(k*7)%365,
    lifetime 90 or 365 by k%2.

    Plan/scale: pure codegen string/when arithmetic, zero shuffles —
    at 10^10 connections this is a map-only scan."""
    k = F.col("o_orderkey")
    site = F.concat(F.lit("site"), (k % 50).cast("string"),
                    F.lit(".example"))
    host = (F.when(k % 4 < 2, F.concat(F.lit("www."), site))
            .when(k % 4 == 2, F.concat(F.lit("api."), site))
            .otherwise(site))
    san = (F.when(k % 3 == 0, F.concat(F.lit("*."), site))
           .when(k % 3 == 1, site)
           .otherwise(F.lit("othersite.example")))
    rows = _t(spark, sf_dir, "orders").select(
        k.alias("rid"), host.alias("host"), san.alias("san"),
        ((k * 7) % 365 + 90 + (k % 2) * 275).alias("not_after_day"))
    suf = F.expr("substr(san, 2)")          # '.siteN.example'
    label_len = F.length("host") - F.length(suf)
    wild_ok = (F.col("san").startswith("*.")
               & (F.expr("right(host, length(san) - 1)") == suf)
               & (label_len > 0)
               & (F.instr(F.expr("substr(host, 1, length(host)"
                                 " - length(san) + 1)"), ".") == 0))
    san_ok = ((F.col("host") == F.col("san")) | wild_ok).cast("int")
    days_left = (F.col("not_after_day") - F.lit(400)).alias("days_left")
    return (rows.select("rid", "host", "san", "not_after_day",
                        days_left, san_ok.alias("san_ok"))
            .withColumn("verdict",
                        F.when(F.col("days_left") < 0, F.lit("expired"))
                        .when(F.col("san_ok") == 0, F.lit("name_mismatch"))
                        .when(F.col("days_left") < 30, F.lit("expiring"))
                        .otherwise(F.lit("ok"))))


ORACLE_TLS_CERT_AUDIT = """
WITH rows_ AS (
  SELECT o_orderkey AS rid,
         'site' || (o_orderkey % 50) || '.example' AS site,
         o_orderkey % 4 AS h4, o_orderkey % 3 AS s3,
         (o_orderkey * 7) % 365 + 90 + (o_orderkey % 2) * 275
           AS not_after_day
  FROM orders),
named AS (
  SELECT rid, not_after_day,
         CASE WHEN h4 < 2 THEN 'www.' || site
              WHEN h4 = 2 THEN 'api.' || site
              ELSE site END AS host,
         CASE WHEN s3 = 0 THEN '*.' || site
              WHEN s3 = 1 THEN site
              ELSE 'othersite.example' END AS san
  FROM rows_),
checked AS (
  SELECT rid, host, san, not_after_day,
         not_after_day - 400 AS days_left,
         CASE WHEN host = san THEN 1
              WHEN san LIKE '*.%'
                   AND length(host) > length(san) - 1
                   AND substr(host, length(host) - length(san) + 2)
                       = substr(san, 2)
                   AND strpos(substr(host, 1,
                              length(host) - length(san) + 1), '.') = 0
              THEN 1 ELSE 0 END AS san_ok
  FROM named)
SELECT rid, host, san, not_after_day, days_left,
       CAST(san_ok AS INT) AS san_ok,
       CASE WHEN days_left < 0 THEN 'expired'
            WHEN san_ok = 0 THEN 'name_mismatch'
            WHEN days_left < 30 THEN 'expiring'
            ELSE 'ok' END AS verdict
FROM checked
"""


def q_code_lang_classify(spark, sf_dir):
    """Code-corpus language routing by 3-signal vote — the first gate
    of a Stack-style code pipeline (a mislabeled file trains the wrong
    expert / pollutes lang-balanced sampling): per file, the EXTENSION
    vote (path suffix map), the SHEBANG vote (first line '#!...python'
    / '#!...node'), and the KEYWORD vote (first matching signature
    among '#include', 'fn main', 'function', 'def ' — priority order
    matters: C's '#include' must not be read as a Python comment).
    Final label: any two agreeing signals win; otherwise the extension
    (if known), else the keyword vote.

    All three signals are PARSED from path/content with regexps — the
    fixture formulas never leak into the classify path.

    Plan/scale: map-only regexp codegen."""
    files = _code_fixture(spark, sf_dir)
    ext = F.regexp_extract("path", r"\.([a-z]+)$", 1)
    ext_lang = (F.when(ext == "py", "python")
                .when(ext == "js", "javascript")
                .when(ext == "c", "c").when(ext == "rs", "rust")
                .otherwise("unknown"))
    first_line = F.expr("split(content, '\n')[0]")
    sb_lang = (F.when(~first_line.startswith("#!"), "")
               .when(first_line.rlike("python$"), "python")
               .when(first_line.rlike("node$"), "javascript")
               .otherwise(""))
    kw_lang = (F.when(F.col("content").rlike("(^|\n)#include "), "c")
               .when(F.col("content").rlike("(^|\n)fn main"), "rust")
               .when(F.col("content").rlike("(^|\n)function "),
                     "javascript")
               .when(F.col("content").rlike("(^|\n)def "), "python")
               .otherwise("unknown"))
    out = files.select("file_id", "path", ext_lang.alias("ext_lang"),
                       sb_lang.alias("shebang_lang"),
                       kw_lang.alias("kw_lang"))
    e, s, w = (F.col("ext_lang"), F.col("shebang_lang"),
               F.col("kw_lang"))
    final = (F.when((s != "") & (s == w), s)
             .when(e == w, e)
             .when((s != "") & (e == s), e)
             .when(e != "unknown", e)
             .otherwise(w))
    return out.withColumn("lang", final)


ORACLE_CODE_LANG_CLASSIFY = f"""
WITH files AS ({_CODE_FIXTURE_SQL}),
sig AS (
  SELECT file_id, path,
         CASE regexp_extract(path, '\\.([a-z]+)$', 1)
           WHEN 'py' THEN 'python' WHEN 'js' THEN 'javascript'
           WHEN 'c' THEN 'c' WHEN 'rs' THEN 'rust'
           ELSE 'unknown' END AS ext_lang,
         CASE WHEN string_split(content, chr(10))[1] NOT LIKE '#!%'
                THEN ''
              WHEN regexp_matches(string_split(content, chr(10))[1],
                                  'python$') THEN 'python'
              WHEN regexp_matches(string_split(content, chr(10))[1],
                                  'node$') THEN 'javascript'
              ELSE '' END AS shebang_lang,
         CASE WHEN regexp_matches(content, '(^|\n)#include ') THEN 'c'
              WHEN regexp_matches(content, '(^|\n)fn main') THEN 'rust'
              WHEN regexp_matches(content, '(^|\n)function ')
                THEN 'javascript'
              WHEN regexp_matches(content, '(^|\n)def ') THEN 'python'
              ELSE 'unknown' END AS kw_lang
  FROM files)
SELECT file_id, path, ext_lang, shebang_lang, kw_lang,
       CASE WHEN shebang_lang <> '' AND shebang_lang = kw_lang
              THEN shebang_lang
            WHEN ext_lang = kw_lang THEN ext_lang
            WHEN shebang_lang <> '' AND ext_lang = shebang_lang
              THEN ext_lang
            WHEN ext_lang <> 'unknown' THEN ext_lang
            ELSE kw_lang END AS lang
FROM sig
"""


def q_code_secret_scan(spark, sf_dir):
    """Credential scanning over the code corpus — the non-negotiable
    pre-release gate (a single AWS key memorized by a model is an
    incident): per file, counts of AWS access-key IDs
    (``AKIA[0-9A-Z]{16}``), PEM private-key headers, and 32+-char hex
    tokens (API-secret shape), plus the block verdict. Patterns are
    industry-standard (gitleaks/trufflehog shapes), evaluated as
    regexp_extract_all counts in codegen.

    Plan/scale: map-only regexp scan; at 100 TB this is the cheapest
    full-corpus pass there is — no shuffle, prunes to (file_id,
    content)."""
    files = _code_fixture(spark, sf_dir)
    cnt = lambda p: F.expr(
        f"size(regexp_extract_all(content, '{p}', 0))").cast("long")
    out = files.select(
        "file_id",
        cnt("AKIA[0-9A-Z]{16}").alias("n_aws_keys"),
        cnt("-----BEGIN [A-Z ]*PRIVATE KEY-----").alias("n_priv_keys"),
        cnt("[0-9a-f]{32}").alias("n_hex_tokens"))
    return out.withColumn(
        "blocked",
        ((F.col("n_aws_keys") + F.col("n_priv_keys")
          + F.col("n_hex_tokens")) > 0).cast("int"))


ORACLE_CODE_SECRET_SCAN = f"""
WITH files AS ({_CODE_FIXTURE_SQL}),
scanned AS (
  SELECT file_id,
         CAST(len(regexp_extract_all(content, 'AKIA[0-9A-Z]{{16}}'))
              AS BIGINT) AS n_aws_keys,
         CAST(len(regexp_extract_all(content,
              '-----BEGIN [A-Z ]*PRIVATE KEY-----')) AS BIGINT)
           AS n_priv_keys,
         CAST(len(regexp_extract_all(content, '[0-9a-f]{{32}}'))
              AS BIGINT) AS n_hex_tokens
  FROM files)
SELECT file_id, n_aws_keys, n_priv_keys, n_hex_tokens,
       CAST(CASE WHEN n_aws_keys + n_priv_keys + n_hex_tokens > 0
            THEN 1 ELSE 0 END AS INT) AS blocked
FROM scanned
"""


def q_code_comment_ratio(spark, sf_dir):
    """Comment/blank/code line census with the Stack-style comment-
    ratio gate (near-zero comments → minified/generated; comment-
    dominated → license boilerplate or tutorial dumps — both are
    low-value training text): lines are split and classified by shape
    ('' blank, '^(#|//)' comment, else code) INSIDE the array domain
    (filter/size lambdas — no explode, zero shuffle), and
    comment_ppm = comment·10^6 div (comment+code) drives the verdict
    (<1% low_comment, >60% high_comment).

    Plan/scale: map-only array codegen; the census never leaves the
    row."""
    files = _code_fixture(spark, sf_dir)
    out = files.select(
        "file_id",
        F.expr("split(content, '\n')").alias("lines"))
    out = out.select(
        "file_id",
        F.expr("size(lines)").cast("long").alias("n_lines"),
        F.expr("size(filter(lines, x -> x = ''))").cast("long")
        .alias("n_blank"),
        F.expr("size(filter(lines, x -> x rlike '^(#|//)'))")
        .cast("long").alias("n_comment"))
    out = out.withColumn(
        "n_code", F.col("n_lines") - F.col("n_blank")
        - F.col("n_comment"))
    out = out.withColumn(
        "comment_ppm",
        F.expr("(n_comment * 1000000) div (n_comment + n_code)"))
    return out.withColumn(
        "verdict",
        F.when(F.col("comment_ppm") < 10000, "low_comment")
        .when(F.col("comment_ppm") > 600000, "high_comment")
        .otherwise(F.lit("ok")))


ORACLE_CODE_COMMENT_RATIO = f"""
WITH files AS ({_CODE_FIXTURE_SQL}),
lined AS (
  SELECT file_id, string_split(content, chr(10)) AS lines
  FROM files),
census AS (
  SELECT file_id,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(len(list_filter(lines, x -> x = '')) AS BIGINT)
           AS n_blank,
         CAST(len(list_filter(lines,
              x -> regexp_matches(x, '^(#|//)'))) AS BIGINT)
           AS n_comment
  FROM lined)
SELECT file_id, n_lines, n_blank, n_comment,
       n_lines - n_blank - n_comment AS n_code,
       (n_comment * 1000000) // (n_comment + (n_lines - n_blank
                                              - n_comment))
         AS comment_ppm,
       CASE WHEN (n_comment * 1000000) // (n_comment + (n_lines
                 - n_blank - n_comment)) < 10000 THEN 'low_comment'
            WHEN (n_comment * 1000000) // (n_comment + (n_lines
                 - n_blank - n_comment)) > 600000 THEN 'high_comment'
            ELSE 'ok' END AS verdict
FROM census
"""


def q_code_stack_rules(spark, sf_dir):
    """Stack-style file-level quality filters for the code corpus
    (the published BigCode recipe shape: line-length and
    alphanumeric-fraction gates that drop minified bundles and
    binary-ish blobs BEFORE tokenization): per file, max line length,
    average line length in exact centichars (sum·100 div n — no
    float), alphanumeric fraction in ppm (chars surviving
    ``[^A-Za-z0-9]`` removal vs total), and the first-failing-rule
    verdict: max_line > 500 -> 'long_lines' (minified), avg > 100 ->
    'dense_lines', alnum < 250000 ppm -> 'low_alnum', else 'kept'.

    Fixture: the shared code fixture plus a 600-char minified tail
    ('a();' x 150) appended to every 23rd file — appended HERE, not
    in the shared fixture, so the block-138 rows are untouched.

    Plan/scale: array + regexp codegen, zero shuffles."""
    files = _code_fixture(spark, sf_dir)
    files = files.select(
        "file_id",
        F.when(F.col("file_id") % 23 == 0,
               F.concat(F.col("content"), F.lit("\n"),
                        F.expr("repeat('a();', 150)")))
        .otherwise(F.col("content")).alias("content"))
    lines = F.expr("split(content, '\n')")
    out = files.select(
        "file_id",
        F.length("content").cast("long").alias("n_chars"),
        F.expr("size(split(content, '\n'))").cast("long")
        .alias("n_lines"),
        F.expr("array_max(transform(split(content, '\n'), "
               "x -> length(x)))").cast("long").alias("max_line_len"),
        F.expr("aggregate(transform(split(content, '\n'), "
               "x -> cast(length(x) as bigint)), 0L, "
               "(acc, x) -> acc + x)").alias("sum_line_chars"),
        F.length(F.regexp_replace("content", "[^A-Za-z0-9]", ""))
        .cast("long").alias("n_alnum"))
    out = (out
           .withColumn("avg_line_centichars",
                       F.expr("(sum_line_chars * 100) div n_lines"))
           .withColumn("alnum_ppm",
                       F.expr("(n_alnum * 1000000) div n_chars")))
    return out.select(
        "file_id", "n_lines", "max_line_len", "avg_line_centichars",
        "alnum_ppm",
        F.when(F.col("max_line_len") > 500, "long_lines")
        .when(F.col("avg_line_centichars") > 10000, "dense_lines")
        .when(F.col("alnum_ppm") < 250000, "low_alnum")
        .otherwise(F.lit("kept")).alias("verdict"))


ORACLE_CODE_STACK_RULES = f"""
WITH base AS ({_CODE_FIXTURE_SQL}),
files AS (
  SELECT file_id,
         CASE WHEN file_id % 23 = 0
              THEN content || chr(10) || repeat('a();', 150)
              ELSE content END AS content
  FROM base),
lined AS (
  SELECT file_id, content,
         string_split(content, chr(10)) AS lines
  FROM files),
census AS (
  SELECT file_id,
         CAST(length(content) AS BIGINT) AS n_chars,
         CAST(len(lines) AS BIGINT) AS n_lines,
         CAST(list_max(list_transform(lines, x -> length(x)))
              AS BIGINT) AS max_line_len,
         CAST(list_sum(list_transform(lines, x -> length(x)))
              AS BIGINT) AS sum_line_chars,
         CAST(length(regexp_replace(content, '[^A-Za-z0-9]', '', 'g'))
              AS BIGINT) AS n_alnum
  FROM lined)
SELECT file_id, n_lines, max_line_len,
       (sum_line_chars * 100) // n_lines AS avg_line_centichars,
       (n_alnum * 1000000) // n_chars AS alnum_ppm,
       CASE WHEN max_line_len > 500 THEN 'long_lines'
            WHEN (sum_line_chars * 100) // n_lines > 10000
              THEN 'dense_lines'
            WHEN (n_alnum * 1000000) // n_chars < 250000
              THEN 'low_alnum'
            ELSE 'kept' END AS verdict
FROM census
"""


def q_code_import_census(spark, sf_dir):
    """Cross-language import/dependency census over the code corpus —
    the fan-in table that drives dedup-by-vendored-library decisions
    and license-transitivity checks (the most-imported modules are
    what every file partially duplicates): one alternation regex
    captures the module token behind 'import ' (Python),
    'use ' (Rust), '#include <' (C) and 'require("' (JS); modules
    are exploded, counted as total references AND distinct files,
    ranked densely by refs DESC then name.

    Fixture: k%4 import lines prepended per file (module
    mod{(k*3+j*5)%25}), plus the organic '#include <stdio.h>'
    keyword lines the block-138 fixture already carries — the census
    must count those too (stdio shows up as a real module).

    Plan/scale: explode -> two-phase (module) agg -> one bounded
    window over ~|modules| rows — never over raw imports."""
    files = _code_fixture(spark, sf_dir)
    imports = F.expr(
        "if(file_id % 4 = 0, '', array_join(transform("
        "sequence(0, cast(file_id % 4 as int) - 1), j -> "
        "concat(CASE cast((file_id * 3 + j * 5) % 4 as int) "
        "WHEN 0 THEN concat('import mod', (file_id * 3 + j * 5) % 25) "
        "WHEN 1 THEN concat('use mod', (file_id * 3 + j * 5) % 25) "
        "WHEN 2 THEN concat('#include <mod', "
        "(file_id * 3 + j * 5) % 25, '.h>') "
        "ELSE concat('const m', j, ' = require(\"mod', "
        "(file_id * 3 + j * 5) % 25, '\");') END, '\n')), ''))")
    files = files.select(
        "file_id",
        F.concat(imports, F.col("content")).alias("content"))
    # NB Spark SQL string literals consume one backslash level —
    # '\\\\(' in the Python source reaches the regex engine as '\\('.
    pat = ("(import |use |#include <|require\\\\(\")"
           "([a-zA-Z0-9_]+)")
    mods = (files.select(
        "file_id",
        F.explode(F.expr(
            f"regexp_extract_all(content, '{pat}', 2)"))
        .alias("module")))
    agg = (mods.groupBy("module")
           .agg(F.count("*").cast("long").alias("n_refs"),
                F.countDistinct("file_id").cast("long")
                .alias("n_files")))
    w = Window.orderBy(F.col("n_refs").desc(), F.col("module").asc())
    return (agg.withColumn("rank", F.row_number().over(w).cast("int"))
            .select("module", "n_refs", "n_files", "rank",
                    (F.col("rank") <= 10).cast("int").alias("top10")))


ORACLE_CODE_IMPORT_CENSUS = f"""
WITH base AS ({_CODE_FIXTURE_SQL}),
files AS (
  SELECT file_id,
         CASE WHEN file_id % 4 = 0 THEN '' ELSE
           COALESCE(array_to_string(list_transform(
             range(file_id % 4), j ->
               CASE (file_id * 3 + j * 5) % 4
                 WHEN 0 THEN 'import mod' || (file_id * 3 + j * 5) % 25
                 WHEN 1 THEN 'use mod' || (file_id * 3 + j * 5) % 25
                 WHEN 2 THEN '#include <mod'
                      || (file_id * 3 + j * 5) % 25 || '.h>'
                 ELSE 'const m' || j || ' = require("mod'
                      || (file_id * 3 + j * 5) % 25 || '");'
               END || chr(10)), ''), '') END || content AS content
  FROM base),
mods AS (
  SELECT file_id,
         unnest(regexp_extract_all(content,
           '(import |use |#include <|require\\(")([a-zA-Z0-9_]+)', 2))
           AS module
  FROM files),
agg AS (
  SELECT module, CAST(count(*) AS BIGINT) AS n_refs,
         CAST(count(DISTINCT file_id) AS BIGINT) AS n_files
  FROM mods GROUP BY module)
SELECT module, n_refs, n_files,
       CAST(row_number() OVER (ORDER BY n_refs DESC, module ASC)
            AS INT) AS rank,
       CAST(CASE WHEN row_number() OVER (ORDER BY n_refs DESC,
                 module ASC) <= 10 THEN 1 ELSE 0 END AS INT) AS top10
FROM agg
"""


def q_layout_zonemap_audit(spark, sf_dir):
    """Zone-map (row-group min/max) pruning audit — the file-layout
    decision quantified: the SAME 500 rows in 25 groups of 20, laid
    out (a) CLUSTERED on the filter key vs (b) in natural arrival
    order, probed with 10 range predicates; per (layout, query) the
    groups a parquet reader would actually scan (group pruned iff
    max < lo or min > hi). The clustered layout prunes to ~1 group
    per query, arrival order scans nearly all — the measured
    justification for the frontier's z-order/Hilbert clustering keys.

    Key = (doc_id·37) mod 500, a permutation, so 'clustered' is
    exactly key div 20 with no ties.

    Plan/scale: two tiny (group) aggs + a broadcast of the 10-range
    literal table; the audit itself is metadata-sized at any corpus
    scale — exactly like real parquet footers."""
    key = ((F.col("doc_id") * 37) % 500).alias("key")
    rows = _t(spark, sf_dir, "documents").select("doc_id", key)
    stats = None
    for layout, grp in (("clustered", F.expr("key div 20")),
                        ("arrival", F.expr("doc_id div 20"))):
        g = (rows.groupBy(grp.cast("long").alias("grp"))
             .agg(F.min("key").alias("g_min"),
                  F.max("key").alias("g_max"))
             .withColumn("layout", F.lit(layout)))
        stats = g if stats is None else stats.unionByName(g)
    qs = spark.range(10).select(
        F.col("id").cast("long").alias("q"),
        (F.col("id") * 50).alias("lo"),
        (F.col("id") * 50 + 24).alias("hi"))
    hit = (stats.crossJoin(F.broadcast(qs))
           .withColumn("scanned",
                       (~((F.col("g_max") < F.col("lo"))
                          | (F.col("g_min") > F.col("hi"))))
                       .cast("long")))
    return (hit.groupBy("layout", "q")
            .agg(F.count("*").cast("long").alias("groups_total"),
                 F.sum("scanned").cast("long").alias("groups_scanned"))
            .withColumn("scan_ppm",
                        F.expr("(groups_scanned * 1000000)"
                               " div groups_total")))


ORACLE_LAYOUT_ZONEMAP_AUDIT = """
WITH rows_ AS (
  SELECT doc_id, (doc_id * 37) % 500 AS key FROM documents),
stats AS (
  SELECT 'clustered' AS layout, key // 20 AS grp,
         min(key) AS g_min, max(key) AS g_max
  FROM rows_ GROUP BY key // 20
  UNION ALL
  SELECT 'arrival', doc_id // 20, min(key), max(key)
  FROM rows_ GROUP BY doc_id // 20),
qs AS (
  SELECT i AS q, i * 50 AS lo, i * 50 + 24 AS hi
  FROM (SELECT unnest(range(10)) AS i)),
hit AS (
  SELECT layout, q,
         CASE WHEN g_max < lo OR g_min > hi THEN 0 ELSE 1 END
           AS scanned
  FROM stats, qs)
SELECT layout, CAST(q AS BIGINT) AS q,
       CAST(count(*) AS BIGINT) AS groups_total,
       CAST(sum(scanned) AS BIGINT) AS groups_scanned,
       (CAST(sum(scanned) AS BIGINT) * 1000000) // count(*)
         AS scan_ppm
FROM hit GROUP BY layout, q
"""


def q_layout_partition_evolution(spark, sf_dir):
    """Hive partition-scheme evolution audit — the lakehouse
    migration mess made countable (a table written for years as
    ``year=YYYY/month=M`` — month UNPADDED, the classic trap — then
    switched to ``date=YYYY-MM``; readers must see ONE logical
    partitioning or scans silently miss files): file paths of both
    schemes are PARSED back to a normalized (year, month), and the
    census reports per logical partition the file count per scheme
    and the mixed flag that tells the compactor where both layouts
    coexist.

    Fixture: month_id = k%24 over 2023-2024; (k div 24)%3=0 files
    use the new date= scheme (decorrelated from the month).

    Plan/scale: map-side regexp parse + one census agg — the audit
    reads the file MANIFEST, never the data."""
    k = F.col("o_orderkey")
    month_id = k % 24
    year = (2023 + month_id / 12).cast("int")
    month = (month_id % 12 + 1).cast("int")
    # scheme chosen by (k div 24) % 3 — INDEPENDENT of month_id = k%24
    # (k%3 would be fully determined by k%24 and no month would mix)
    path = (F.when((k / 24).cast("long") % 3 == 0,
                   F.concat(F.lit("/warehouse/events/date="),
                            year.cast("string"), F.lit("-"),
                            F.lpad(month.cast("string"), 2, "0"),
                            F.lit("/part-"), k.cast("string"),
                            F.lit(".parquet")))
            .otherwise(
                F.concat(F.lit("/warehouse/events/year="),
                         year.cast("string"), F.lit("/month="),
                         month.cast("string"), F.lit("/part-"),
                         k.cast("string"), F.lit(".parquet"))))
    files = _t(spark, sf_dir, "orders").select(path.alias("path"))
    is_new = F.col("path").rlike("/date=[0-9]{4}-[0-9]{2}/")
    y_new = F.regexp_extract("path", "/date=([0-9]{4})-", 1)
    m_new = F.regexp_extract("path", "/date=[0-9]{4}-([0-9]{2})/", 1)
    y_old = F.regexp_extract("path", "/year=([0-9]{4})/", 1)
    m_old = F.regexp_extract("path", "/month=([0-9]+)/", 1)
    parsed = files.select(
        F.when(is_new, y_new).otherwise(y_old).cast("int")
        .alias("year"),
        F.when(is_new, m_new).otherwise(m_old).cast("int")
        .alias("month"),
        is_new.cast("long").alias("new_scheme"))
    return (parsed.groupBy("year", "month")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum("new_scheme").cast("long").alias("n_new"),
                 (F.count("*") - F.sum("new_scheme")).cast("long")
                 .alias("n_old"))
            .withColumn("mixed",
                        ((F.col("n_new") > 0) & (F.col("n_old") > 0))
                        .cast("int"))
            .withColumn("new_ppm",
                        F.expr("(n_new * 1000000) div n_files")))


ORACLE_LAYOUT_PARTITION_EVOLUTION = """
WITH files AS (
  SELECT CASE WHEN (o_orderkey // 24) % 3 = 0
           THEN '/warehouse/events/date='
                || (2023 + (o_orderkey % 24) // 12) || '-'
                || lpad(CAST((o_orderkey % 24) % 12 + 1 AS VARCHAR),
                        2, '0')
                || '/part-' || o_orderkey || '.parquet'
           ELSE '/warehouse/events/year='
                || (2023 + (o_orderkey % 24) // 12)
                || '/month=' || ((o_orderkey % 24) % 12 + 1)
                || '/part-' || o_orderkey || '.parquet'
         END AS path
  FROM orders),
parsed AS (
  SELECT CASE WHEN regexp_matches(path, '/date=[0-9]{4}-[0-9]{2}/')
           THEN CAST(regexp_extract(path, '/date=([0-9]{4})-', 1)
                     AS INT)
           ELSE CAST(regexp_extract(path, '/year=([0-9]{4})/', 1)
                     AS INT) END AS year,
         CASE WHEN regexp_matches(path, '/date=[0-9]{4}-[0-9]{2}/')
           THEN CAST(regexp_extract(path,
                     '/date=[0-9]{4}-([0-9]{2})/', 1) AS INT)
           ELSE CAST(regexp_extract(path, '/month=([0-9]+)/', 1)
                     AS INT) END AS month,
         CASE WHEN regexp_matches(path, '/date=[0-9]{4}-[0-9]{2}/')
           THEN 1 ELSE 0 END AS new_scheme
  FROM files)
SELECT year, month,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(new_scheme) AS BIGINT) AS n_new,
       CAST(count(*) - sum(new_scheme) AS BIGINT) AS n_old,
       CAST(CASE WHEN sum(new_scheme) > 0
                  AND count(*) - sum(new_scheme) > 0
            THEN 1 ELSE 0 END AS INT) AS mixed,
       (CAST(sum(new_scheme) AS BIGINT) * 1000000) // count(*)
         AS new_ppm
FROM parsed GROUP BY year, month
"""


def q_code_nesting_depth(spark, sf_dir):
    """Brace-nesting depth census — the structural complexity signal
    a code curator uses where an AST is too expensive (max depth >
    ~8 correlates with generated/minified code; negative depth means
    a closing brace before any opener — a truncated fragment, the
    single most common corruption in scraped code): the brace stream
    is folded with the ASSOCIATIVE (sum, maxPrefix, minPrefix)
    combine — max prefix sum as a segment-combine, the exact trick
    that makes this computable by ANY fold order, hence by Spark's
    ``aggregate`` and DuckDB's ``list_reduce`` identically.

    Fixture plants: k%6=0 appends a closing brace, k%31=0 PREPENDS
    one (negative dip).

    Plan/scale: array codegen, zero shuffles, O(len) per row."""
    files = _code_fixture(spark, sf_dir)
    content2 = (F.when(F.col("file_id") % 31 == 0,
                       F.concat(F.lit("}"), F.col("content")))
                .otherwise(F.col("content")))
    content2 = (F.when(F.col("file_id") % 6 == 0,
                       F.concat(content2, F.lit("\n}")))
                .otherwise(content2))
    base = files.select("file_id", content2.alias("content"))
    folded = base.select(
        "file_id",
        F.expr(
            "aggregate(regexp_extract_all(content, '[{}]', 0), "
            "struct(0L as s, 0L as maxp, 0L as minp), "
            "(a, c) -> struct("
            "a.s + if(c = '{', 1L, -1L) as s, "
            "greatest(a.maxp, a.s + if(c = '{', 1L, -1L)) as maxp, "
            "least(a.minp, a.s + if(c = '{', 1L, -1L)) as minp))")
        .alias("st"),
        F.expr("size(regexp_extract_all(content, '[{]', 0))")
        .cast("long").alias("n_open"),
        F.expr("size(regexp_extract_all(content, '[}]', 0))")
        .cast("long").alias("n_close"))
    return folded.select(
        "file_id", "n_open", "n_close",
        F.col("st.s").alias("balance"),
        F.greatest(F.lit(0), F.col("st.maxp")).cast("long")
        .alias("max_depth"),
        (F.col("st.minp") < 0).cast("int").alias("underflow"),
        ((F.col("st.s") == 0) & (F.col("st.minp") >= 0)).cast("int")
        .alias("balanced"))


ORACLE_CODE_NESTING_DEPTH = f"""
WITH base AS ({_CODE_FIXTURE_SQL}),
files AS (
  SELECT file_id,
         (CASE WHEN file_id % 31 = 0 THEN '}}' ELSE '' END)
         || content
         || (CASE WHEN file_id % 6 = 0 THEN chr(10) || '}}'
             ELSE '' END) AS content
  FROM base),
braces AS (
  SELECT file_id,
         list_transform(regexp_extract_all(content, '[{{}}]'),
           c -> {{'s': CASE WHEN c = '{{' THEN 1 ELSE -1 END,
                 'maxp': CASE WHEN c = '{{' THEN 1 ELSE -1 END,
                 'minp': CASE WHEN c = '{{' THEN 1 ELSE -1 END}})
           AS elems,
         CAST(len(regexp_extract_all(content, '[{{]')) AS BIGINT)
           AS n_open,
         CAST(len(regexp_extract_all(content, '[}}]')) AS BIGINT)
           AS n_close
  FROM files),
folded AS (
  SELECT file_id, n_open, n_close,
         CASE WHEN len(elems) = 0
              THEN {{'s': 0, 'maxp': 0, 'minp': 0}}
              ELSE list_reduce(elems, (a, b) ->
                {{'s': a.s + b.s,
                  'maxp': greatest(a.maxp, a.s + b.maxp),
                  'minp': least(a.minp, a.s + b.minp)}})
         END AS st
  FROM braces)
SELECT file_id, n_open, n_close,
       CAST(st.s AS BIGINT) AS balance,
       CAST(greatest(0, st.maxp) AS BIGINT) AS max_depth,
       CAST(st.minp < 0 AS INT) AS underflow,
       CAST(st.s = 0 AND st.minp >= 0 AS INT) AS balanced
FROM folded
"""


def q_code_api_diff(spark, sf_dir):
    """Public-API diff with a semver verdict — the release gate a
    library corpus can compute mechanically (exports removed or
    re-signatured = MAJOR, only additions = MINOR, neither = PATCH;
    the rule that keeps dependents compiling): two versions' export
    tables FULL-OUTER-join per (module, function) and each module
    rolls up removed / added / arity-changed counts into the
    verdict.

    Fixture: module m ships 4+m%4 functions; v2 drops (m+j)%7=0,
    bumps arity where (m+j)%5=0, and adds one new export per
    module.

    Plan/scale: explode both versions map-side, one full-outer
    equi-join on (module, fn), one census agg — the diff of two
    10^8-export corpora is the same three steps."""
    mods = spark.range(25).select(F.col("id").alias("m"))
    fns = mods.select("m", F.explode(F.expr(
        "sequence(0, cast(3 + m % 4 as int))")).alias("j"))
    base = fns.select(
        "m",
        F.concat(F.lit("fn"), F.col("m").cast("string"), F.lit("_"),
                 F.col("j").cast("string")).alias("fn"),
        (1 + (F.col("m") + F.col("j")) % 3).alias("arity1"),
        F.col("j"))
    v1 = base.select("m", "fn", "arity1")
    v2_kept = (base.filter((F.col("m") + F.col("j")) % 7 != 0)
               .select("m", "fn",
                       F.when((F.col("m") + F.col("j")) % 5 == 0,
                              F.col("arity1") + 1)
                       .otherwise(F.col("arity1")).alias("arity2")))
    v2_new = mods.select(
        "m",
        F.concat(F.lit("fn"), F.col("m").cast("string"),
                 F.lit("_new")).alias("fn"),
        F.lit(2).cast("long").alias("arity2"))
    v2 = v2_kept.unionByName(v2_new)
    j = v1.join(v2, ["m", "fn"], "full_outer")
    per = (j.groupBy("m")
           .agg(F.sum(F.col("arity1").isNotNull().cast("long"))
                .alias("n_v1"),
                F.sum(F.col("arity2").isNotNull().cast("long"))
                .alias("n_v2"),
                F.sum((F.col("arity1").isNotNull()
                       & F.col("arity2").isNull()).cast("long"))
                .alias("n_removed"),
                F.sum((F.col("arity1").isNull()
                       & F.col("arity2").isNotNull()).cast("long"))
                .alias("n_added"),
                F.sum((F.col("arity1").isNotNull()
                       & F.col("arity2").isNotNull()
                       & (F.col("arity1") != F.col("arity2")))
                      .cast("long")).alias("n_changed")))
    return per.select(
        F.col("m").cast("int").alias("module"),
        "n_v1", "n_v2", "n_removed", "n_added", "n_changed",
        F.when((F.col("n_removed") > 0) | (F.col("n_changed") > 0),
               "major")
        .when(F.col("n_added") > 0, "minor")
        .otherwise(F.lit("patch")).alias("semver"))


ORACLE_CODE_API_DIFF = """
WITH mods AS (SELECT unnest(range(25)) AS m),
fns AS (
  SELECT m, unnest(range(4 + m % 4)) AS j FROM mods),
v1 AS (
  SELECT m, 'fn' || m || '_' || j AS fn,
         1 + (m + j) % 3 AS arity1
  FROM fns),
v2 AS (
  SELECT m, 'fn' || m || '_' || j AS fn,
         CASE WHEN (m + j) % 5 = 0 THEN 1 + (m + j) % 3 + 1
              ELSE 1 + (m + j) % 3 END AS arity2
  FROM fns WHERE (m + j) % 7 <> 0
  UNION ALL
  SELECT m, 'fn' || m || '_new', 2 FROM mods),
j AS (
  SELECT COALESCE(v1.m, v2.m) AS m, v1.arity1, v2.arity2
  FROM v1 FULL OUTER JOIN v2 ON v1.m = v2.m AND v1.fn = v2.fn),
per AS (
  SELECT m,
         CAST(sum(CASE WHEN arity1 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_v1,
         CAST(sum(CASE WHEN arity2 IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_v2,
         CAST(sum(CASE WHEN arity1 IS NOT NULL AND arity2 IS NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
         CAST(sum(CASE WHEN arity1 IS NULL AND arity2 IS NOT NULL
              THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
         CAST(sum(CASE WHEN arity1 IS NOT NULL AND arity2 IS NOT NULL
              AND arity1 <> arity2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changed
  FROM j GROUP BY m)
SELECT CAST(m AS INT) AS module, n_v1, n_v2, n_removed, n_added,
       n_changed,
       CASE WHEN n_removed > 0 OR n_changed > 0 THEN 'major'
            WHEN n_added > 0 THEN 'minor'
            ELSE 'patch' END AS semver
FROM per
"""


def q_code_clone_type2(spark, sf_dir):
    """Type-2 clone detection — rename-invariant code dedup (the
    clone class exact hashing misses and token-window tools like
    CCFinder exist for: two files identical up to identifier and
    literal renaming): every identifier normalizes to ``ID`` and
    every integer literal to ``N`` (identifiers FIRST — an
    identifier may contain digits that must not become N), the
    normalized body hashes, and clone classes form on the hash.
    The shared code fixture's line grids differ only in literals,
    so real multi-file clone classes emerge.

    Plan/scale: map-side normalize+hash, one fingerprint-keyed
    window — exact-dedup cost for a much stronger equivalence."""
    files = _code_fixture(spark, sf_dir)
    norm = F.regexp_replace(
        F.regexp_replace("content", "[a-zA-Z_][a-zA-Z0-9_]*", "ID"),
        "[0-9]+", "N")
    rows = files.select("file_id", F.md5(norm).alias("fp"))
    w = Window.partitionBy("fp")
    return (rows
            .withColumn("class_size",
                        F.count("*").over(w).cast("long"))
            .withColumn("rep_file", F.min("file_id").over(w))
            .withColumn("is_clone",
                        (F.col("class_size") > 1).cast("int"))
            .select("file_id", F.substring("fp", 1, 8).alias("fp8"),
                    "class_size", "rep_file", "is_clone"))


ORACLE_CODE_CLONE_TYPE2 = f"""
WITH base AS ({_CODE_FIXTURE_SQL}),
norm AS (
  SELECT file_id,
         md5(regexp_replace(regexp_replace(content,
             '[a-zA-Z_][a-zA-Z0-9_]*', 'ID', 'g'),
             '[0-9]+', 'N', 'g')) AS fp
  FROM base)
SELECT file_id, substr(fp, 1, 8) AS fp8,
       CAST(count(*) OVER (PARTITION BY fp) AS BIGINT) AS class_size,
       min(file_id) OVER (PARTITION BY fp) AS rep_file,
       CAST(CASE WHEN count(*) OVER (PARTITION BY fp) > 1
            THEN 1 ELSE 0 END AS INT) AS is_clone
FROM norm
"""


def q_code_requirements_pin_audit(spark, sf_dir):
    """Dependency-pinning audit over requirements manifests — the
    reproducibility gate of a code corpus's BUILDABILITY story
    (``pkg==1.2.3`` reproduces; ``pkg>=1.0`` drifts; a bare name is
    whatever the resolver felt like that day): each manifest's lines
    parse into (name, operator) pairs, and per module the census
    counts pinned / ranged / compatible-release / unpinned specs
    with the all-pinned reproducibility verdict.

    Fixture: module m lists 3+m%4 deps cycling the four spec
    styles.

    Plan/scale: explode + one census agg, map-side combinable."""
    mods = spark.range(25).select(F.col("id").alias("m"))
    deps = mods.select("m", F.explode(F.expr(
        "sequence(0, cast(2 + m % 4 as int))")).alias("j"))
    spec = (F.when((F.col("m") + F.col("j")) % 4 == 0,
                   F.concat(F.lit("==1."), F.col("j").cast("string"),
                            F.lit(".0")))
            .when((F.col("m") + F.col("j")) % 4 == 1, ">=1.0")
            .when((F.col("m") + F.col("j")) % 4 == 2, "~=2.1")
            .otherwise(F.lit("")))
    lines = deps.select(
        "m",
        F.concat(F.lit("pkg"),
                 ((F.col("m") * 3 + F.col("j")) % 30).cast("string"),
                 spec).alias("line"))
    parsed = lines.select(
        "m",
        F.regexp_extract("line", "^([a-z0-9]+)", 1).alias("name"),
        F.regexp_extract("line", "(==|>=|~=)", 1).alias("op"))
    agg = (parsed.groupBy("m")
           .agg(F.count("*").cast("long").alias("n_deps"),
                F.sum((F.col("op") == "==").cast("long"))
                .alias("n_pinned"),
                F.sum((F.col("op") == ">=").cast("long"))
                .alias("n_ranged"),
                F.sum((F.col("op") == "~=").cast("long"))
                .alias("n_compat"),
                F.sum((F.col("op") == "").cast("long"))
                .alias("n_unpinned")))
    return agg.select(
        F.col("m").cast("int").alias("module"),
        "n_deps", "n_pinned", "n_ranged", "n_compat", "n_unpinned",
        (F.col("n_pinned") == F.col("n_deps")).cast("int")
        .alias("reproducible"))


ORACLE_CODE_REQUIREMENTS_PIN_AUDIT = """
WITH mods AS (SELECT unnest(range(25)) AS m),
deps AS (SELECT m, unnest(range(3 + m % 4)) AS j FROM mods),
lines_ AS (
  SELECT m,
         'pkg' || ((m * 3 + j) % 30) ||
         CASE WHEN (m + j) % 4 = 0 THEN '==1.' || j || '.0'
              WHEN (m + j) % 4 = 1 THEN '>=1.0'
              WHEN (m + j) % 4 = 2 THEN '~=2.1'
              ELSE '' END AS line
  FROM deps),
parsed AS (
  SELECT m, regexp_extract(line, '^([a-z0-9]+)', 1) AS name,
         regexp_extract(line, '(==|>=|~=)', 1) AS op
  FROM lines_),
agg AS (
  SELECT m, CAST(count(*) AS BIGINT) AS n_deps,
         CAST(sum(CASE WHEN op = '==' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_pinned,
         CAST(sum(CASE WHEN op = '>=' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ranged,
         CAST(sum(CASE WHEN op = '~=' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_compat,
         CAST(sum(CASE WHEN op = '' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_unpinned
  FROM parsed GROUP BY m)
SELECT CAST(m AS INT) AS module, n_deps, n_pinned, n_ranged,
       n_compat, n_unpinned,
       CAST(n_pinned = n_deps AS INT) AS reproducible
FROM agg
"""


def q_code_generated_detect(spark, sf_dir):
    """Generated-file marker detection — the cheap, HIGH-precision
    autogen filter that runs before any statistical one (protobuf,
    stringer, swagger and friends all stamp 'DO NOT EDIT' /
    '@generated' headers precisely so tools can skip them; training
    on generated code teaches the generator's tics, not
    programming): the corpus scans for the three canonical marker
    shapes, records which fired, and routes marked files out.

    Fixture: k%19 files carry the protoc-style header, k%23 the
    @generated stamp (some carry both).

    Plan/scale: map-only regexp scan."""
    files = _code_fixture(spark, sf_dir)
    content2 = F.concat(
        F.when(F.col("file_id") % 19 == 0,
               F.lit("// Code generated by protoc-gen-go."
                     " DO NOT EDIT.\n")).otherwise(F.lit("")),
        F.when(F.col("file_id") % 23 == 0,
               F.lit("# @generated by tooling\n"))
        .otherwise(F.lit("")),
        F.col("content"))
    rows = files.select("file_id", content2.alias("content"))
    do_not_edit = F.col("content").rlike("DO NOT EDIT")
    at_generated = F.col("content").rlike("@generated")
    gen_by = F.col("content").rlike("[Gg]enerated by")
    return rows.select(
        "file_id",
        do_not_edit.cast("int").alias("do_not_edit"),
        at_generated.cast("int").alias("at_generated"),
        gen_by.cast("int").alias("generated_by"),
        (do_not_edit | at_generated | gen_by).cast("int")
        .alias("is_generated"))


ORACLE_CODE_GENERATED_DETECT = f"""
WITH base AS ({_CODE_FIXTURE_SQL}),
files AS (
  SELECT file_id,
         (CASE WHEN file_id % 19 = 0
           THEN '// Code generated by protoc-gen-go. DO NOT EDIT.'
                || chr(10) ELSE '' END)
         || (CASE WHEN file_id % 23 = 0
             THEN '# @generated by tooling' || chr(10)
             ELSE '' END)
         || content AS content
  FROM base)
SELECT file_id,
       CAST(regexp_matches(content, 'DO NOT EDIT') AS INT)
         AS do_not_edit,
       CAST(regexp_matches(content, '@generated') AS INT)
         AS at_generated,
       CAST(regexp_matches(content, '[Gg]enerated by') AS INT)
         AS generated_by,
       CAST(regexp_matches(content, 'DO NOT EDIT')
            OR regexp_matches(content, '@generated')
            OR regexp_matches(content, '[Gg]enerated by') AS INT)
         AS is_generated
FROM files
"""
