"""Driver-contract query registry: every SQL-expressible operator from
SURVEY.md §2 plus the training-data pipeline operators, each as a
(spark_fn, oracle_sql) pair over the driver's parquet tables.

Conventions (the driver compares row count + schema + order-insensitive
value hash):
  * every computed column is aliased identically in Spark and SQL;
  * float aggregates are rounded (2-4 dp) so summation order can't flip the
    hash; similarity *scores* round to 4 dp, rankings break ties on id;
  * randomness is banned — hashes are md5-hex based (portable to DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from genesis_spark.crawler import engine
from genesis_spark.functions import urls as U
from genesis_spark.operators import dedup as D
from genesis_spark.operators import similarity as SIM
from genesis_spark.operators import textstats as TS

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + synthetic twins: even doc_ids get a copy at id+100000 —
    every 5th twin byte-identical (exact dup), the rest missing the last
    word (near dup). Gives the dedup family deterministic positives."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = (docs.filter(F.col("doc_id") % 2 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.when(F.col("doc_id") % 5 == 0, F.col("text"))
                     .otherwise(F.regexp_replace("text", " [^ ]+$", ""))
                     .alias("text")))
    return docs.unionByName(twins)


_CORPUS_SQL = """corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         CASE WHEN doc_id % 5 = 0 THEN text
              ELSE regexp_replace(text, ' [^ ]+$', '') END AS text
  FROM documents WHERE doc_id % 2 = 0
)"""

_SHINGLE_SQL = """base AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM corpus
),
sh AS (
  SELECT doc_id, unnest(CASE WHEN len(w) >= {n}
           THEN list_transform(range(len(w) - {n_1}), i -> {gram})
           ELSE [text] END) AS shingle
  FROM base
)"""


def _shingle_sql(n: int) -> str:
    gram = " || ' ' || ".join(f"w[i+{k + 1}]" for k in range(n))
    return _SHINGLE_SQL.format(n=n, n_1=n - 1, gram=gram)


def _quality_cte(key: str, table: str) -> str:
    """``qm``/``qs`` CTE pair scoring ``table``'s text with the exact
    quality rubric (mirrors TS.quality_score_expr), keyed by ``key`` —
    shared by the per-source rollup and the corpus_clean pipeline."""
    all_markers = (TS.LANG_MARKERS["en"] + TS.LANG_MARKERS["fr"] +
                   TS.LANG_MARKERS["es"] + TS.LANG_MARKERS["de"])
    lst = ", ".join(f"'{m}'" for m in all_markers)
    return f"""qm AS (
  SELECT {key},
         length(text) AS n,
         len(string_split(text, ' ')) AS n_tok,
         length(regexp_replace(text, '[^A-Za-z一-鿿]', '', 'g')) AS alpha,
         len(list_filter(string_split(lower(text), ' '),
                         t -> t IN ({lst}))) AS stop_hits
  FROM {table}),
qs AS (
  SELECT {key},
      (CASE WHEN n > 500 THEN 30 WHEN n > 100 THEN 20
            WHEN n > 20 THEN 10 ELSE 0 END)
    + (CASE WHEN alpha / greatest(n, 1) > 0.7 THEN 30
            WHEN alpha / greatest(n, 1) > 0.4 THEN 15 ELSE 0 END)
    + (CASE WHEN stop_hits / greatest(n_tok, 1) > 0.05 THEN 20 ELSE 0 END)
    + (CASE WHEN n / greatest(n_tok, 1) BETWEEN 3 AND 12
            THEN 20 ELSE 0 END) AS q
  FROM qm)"""


def _c4_lines_col():
    """Lines array of the deterministic C4-shaped corpus as a column
    expression over (doc_id, text) — shared by _c4_synth (joined text)
    and text_sentence_dedup (line-level global dedup)."""
    words = F.split(F.col("text"), " ")
    n_chunks = F.greatest((F.ceil(F.size(words) / F.lit(6))).cast("int"),
                          F.lit(1))
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda j: F.concat(
            F.when((F.col("doc_id") % 11 == 0) & (j == 0), F.lit("{"))
             .otherwise(F.lit("")),
            F.array_join(F.slice(words, j * 6 + 1, 6), " "),
            F.when((F.col("doc_id") + j) % 3 != 0, F.lit("."))
             .otherwise(F.lit(""))))


def _c4_synth(spark, sf_dir):
    """Deterministic line-structured corpus for the C4 cleaner: 6-word
    chunks of each document, terminal '.' on chunks where (doc_id+j)%3 != 0,
    a '{' prefix on chunk 0 of every 11th doc (code filter bait), and a
    trailing ' lorem ipsum.' on every 13th doc (doc-level drop bait)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lines = _c4_lines_col()
    text_syn = F.concat(
        F.array_join(lines, " "),
        F.when(F.col("doc_id") % 13 == 0, F.lit(" lorem ipsum."))
         .otherwise(F.lit("")))
    return d.select("doc_id", text_syn.alias("text"))


_C4_SYNTH_SQL = """raw AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
),
ln AS (
  SELECT doc_id, list_transform(
    range(0, greatest(CAST(ceil(len(w) / 6.0) AS INT), 1)),
    j -> (CASE WHEN doc_id % 11 = 0 AND j = 0 THEN '{' ELSE '' END)
         || array_to_string(w[CAST(j*6+1 AS INT):CAST(j*6+6 AS INT)], ' ')
         || (CASE WHEN (doc_id + j) % 3 <> 0 THEN '.' ELSE '' END)) AS lines
  FROM raw
),
syn AS (
  SELECT doc_id, array_to_string(lines, ' ')
         || (CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum.' ELSE '' END)
         AS text
  FROM ln
)"""

# C4 cleaning rules over the `syn` table (mirrors TS.c4_line_clean) —
# shared by text_c4_clean and corpus_clean_full so the oracles can't drift
_C4_KEPT_SQL = """chunked AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM syn
  WHERE NOT contains(lower(text), 'lorem ipsum')
),
cl AS (
  SELECT doc_id, list_transform(
    range(0, greatest(CAST(ceil(len(w) / 6.0) AS INT), 1)),
    j -> array_to_string(w[CAST(j*6+1 AS INT):CAST(j*6+6 AS INT)], ' '))
    AS lines
  FROM chunked
),
kept AS (
  SELECT doc_id, len(lines) AS n_lines,
         list_filter(lines, l -> regexp_matches(l, '[.!?]$')
                     AND len(string_split(l, ' ')) >= 5
                     AND NOT contains(l, '{')) AS keep
  FROM cl
)"""


def _rep_cte(table: str, text_col: str = "text") -> str:
    """rb/rbi/rc/rs CTE chain: per-doc repetition counters (word dup +
    top-bigram) over ``table (doc_id, text_col)``. Mirrors
    TS.repetition_stats; shared by text_repetition and corpus_clean_full
    so the two oracles cannot drift."""
    return f"""rb AS (
  SELECT doc_id, string_split({text_col}, ' ') AS w FROM {table}),
rbi AS (
  SELECT doc_id, len(w) AS n_words, len(list_distinct(w)) AS n_distinct,
         unnest(CASE WHEN len(w) >= 2
                THEN list_transform(range(len(w) - 1),
                                    i -> w[i+1] || ' ' || w[i+2])
                ELSE [CAST(NULL AS VARCHAR)] END) AS gram
  FROM rb),
rc AS (SELECT doc_id, n_words, n_distinct, gram, count(*) AS c
       FROM rbi GROUP BY ALL),
rs AS (SELECT doc_id, n_words, n_distinct,
              max(CASE WHEN gram IS NOT NULL THEN c ELSE 0 END) AS top_c,
              sum(CASE WHEN gram IS NOT NULL THEN c ELSE 0 END) AS total_c
       FROM rc GROUP BY ALL)"""



# ---------------------------------------------------------------------------
# URL kernel queries (P1-P6, T16 — SURVEY.md §2.2/2.7)
# ---------------------------------------------------------------------------

def q_url_canonicalize(spark, sf_dir):
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


# ---------------------------------------------------------------------------
# frontier queries (S8, O1, A3, J1/J2 — SURVEY.md §2.1/2.4/2.5/2.6)
# ---------------------------------------------------------------------------

def _orders_seeds(spark, sf_dir):
    k = F.col("o_orderkey")
    return _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("http://host"), (k % 200).cast("string"),
                 F.lit(".onion")).alias("url"),
        F.col("o_orderdate").alias("installed_at"),
        k.alias("seed_id"))


def q_frontier_install(spark, sf_dir):
    frontier = engine.install_seeds(_orders_seeds(spark, sf_dir), host_budget=8)
    return frontier.select("url", "installed_at", "seq", "round", "host_rank")


ORACLE_FRONTIER_INSTALL = """
WITH raw AS (
  SELECT 'http://host' || (o_orderkey % 200) || '.onion' AS url,
         o_orderdate AS installed_at, o_orderkey AS seq
  FROM orders
), ded AS (
  SELECT url, installed_at, seq FROM (
    SELECT *, row_number() OVER (PARTITION BY url
                                 ORDER BY installed_at, seq) AS rn
    FROM raw) WHERE rn = 1
)
SELECT url, installed_at, seq,
       CAST(host_rank // 8 AS INT) AS round, host_rank
FROM (SELECT *, row_number() OVER (ORDER BY installed_at, seq) - 1
             AS host_rank FROM ded)
"""


def q_frontier_wave_select(spark, sf_dir):
    k = F.col("o_orderkey")
    entries = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("host_key"),
        F.col("o_orderdate").alias("installed_at"), k.alias("seq"))
    w = Window.partitionBy("host_key").orderBy("installed_at", "seq")
    return (entries.withColumn("prio_rank", F.row_number().over(w))
            .filter(F.col("prio_rank") <= 3)
            .select("host_key", "seq", "prio_rank"))


ORACLE_FRONTIER_WAVE_SELECT = """
SELECT host_key, seq, prio_rank FROM (
  SELECT 'h' || (o_orderkey % 50) AS host_key, o_orderkey AS seq,
         row_number() OVER (PARTITION BY 'h' || (o_orderkey % 50)
                            ORDER BY o_orderdate, o_orderkey) AS prio_rank
  FROM orders) WHERE prio_rank <= 3
"""


def q_frontier_host_agg(spark, sf_dir):
    """Two-phase salted aggregation (A3): partial per (host, salt) then
    final — identical result to a plain GROUP BY, immune to hub-host skew."""
    k = F.col("o_orderkey")
    entries = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 40).cast("string")).alias("host_key"),
        F.col("o_totalprice").alias("value"),
        F.col("o_orderdate").alias("installed_at"),
        F.pmod(F.xxhash64(k), F.lit(16)).alias("salt"))
    partial = (entries.groupBy("host_key", "salt")
               .agg(F.count("*").alias("c"), F.sum("value").alias("s"),
                    F.min("installed_at").alias("m")))
    return (partial.groupBy("host_key")
            .agg(F.sum("c").alias("n_urls"),
                 F.round(F.sum("s"), 2).alias("total_value"),
                 F.min("m").alias("first_installed")))


ORACLE_FRONTIER_HOST_AGG = """
SELECT 'h' || (o_orderkey % 40) AS host_key,
       count(*) AS n_urls,
       round(sum(o_totalprice), 2) AS total_value,
       min(o_orderdate) AS first_installed
FROM orders GROUP BY 1
"""


def q_frontier_install_bucketed(spark, sf_dir):
    """The 10^10-row install path (no global-rank barrier): priority rank is
    a window per politeness bucket. portable_bucket=True swaps xxhash64 for
    the md5-derived bucket hash so DuckDB can replay the assignment."""
    frontier = engine.install_seeds_bucketed(
        _orders_seeds(spark, sf_dir), bucket_budget=8, buckets=16,
        portable_bucket=True)
    return frontier.select("url", "installed_at", "seq", "bucket",
                           "bucket_rank", "round")


ORACLE_FRONTIER_INSTALL_BUCKETED = """
WITH raw AS (
  SELECT 'http://host' || (o_orderkey % 200) || '.onion' AS url,
         o_orderdate AS installed_at, o_orderkey AS seq
  FROM orders
), ded AS (
  SELECT url, installed_at, seq FROM (
    SELECT *, row_number() OVER (PARTITION BY url
                                 ORDER BY installed_at, seq) AS rn
    FROM raw) WHERE rn = 1
), b AS (
  SELECT url, installed_at, seq,
         CAST(concat('0x', substr(md5(
             regexp_extract(url, '^http://([^./]+)', 1)), 25, 8)) AS BIGINT)
         % 16 AS bucket
  FROM ded
)
SELECT url, installed_at, seq, bucket, bucket_rank,
       CAST(bucket_rank // 8 AS INT) AS round
FROM (SELECT *, row_number() OVER (PARTITION BY bucket
                                   ORDER BY installed_at, seq) - 1
             AS bucket_rank FROM b)
"""


def q_seen_anti_join(spark, sf_dir):
    new = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("http://u"), (F.col("l_orderkey") % 1000).cast("string"),
                 F.lit(".onion")).alias("url")).distinct()
    seen = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0) \
        .select(F.concat(F.lit("http://u"),
                         (F.col("o_orderkey") % 300).cast("string"),
                         F.lit(".onion")).alias("url")).distinct()
    return new.join(seen, "url", "left_anti")


ORACLE_SEEN_ANTI_JOIN = """
SELECT DISTINCT 'http://u' || (l_orderkey % 1000) || '.onion' AS url
FROM lineitem
EXCEPT
SELECT DISTINCT 'http://u' || (o_orderkey % 300) || '.onion' AS url
FROM orders WHERE o_orderkey % 3 = 0
"""


def q_frontier_merge_upsert(spark, sf_dir):
    """Iceberg MERGE INTO semantics over the frontier (the SnapshotStore
    gap expressed as a verified operator): a change batch of updates,
    inserts, and delete tombstones applied to the standing frontier in
    ONE full-outer join (operators/joins.py:merge_upsert) — matched
    deletes drop, matched updates win, unmatched non-tombstones insert,
    untouched rows pass through. The oracle replays the same FULL OUTER
    JOIN arithmetic."""
    from genesis_spark.operators.joins import merge_upsert

    base = (_t(spark, sf_dir, "orders")
            .groupBy(F.concat(F.lit("http://host"),
                              (F.col("o_orderkey") % 200).cast("string"),
                              F.lit(".onion")).alias("url"))
            .agg(F.min("o_orderkey").alias("prio"))
            .withColumn("state", F.lit("pending")))
    k = F.col("l_orderkey")
    upd = (_t(spark, sf_dir, "lineitem")
           .groupBy(F.concat(F.lit("http://host"),
                             (k % 300).cast("string"),
                             F.lit(".onion")).alias("url"))
           .agg(F.min("l_orderkey").alias("mk"))
           .select("url", F.col("mk").alias("prio"),
                   F.lit("done").alias("state"),
                   F.when(F.col("mk") % 7 == 0, "D").otherwise("U")
                   .alias("op")))
    return merge_upsert(base, upd, "url")


ORACLE_FRONTIER_MERGE_UPSERT = """
WITH base AS (
  SELECT 'http://host' || (o_orderkey % 200) || '.onion' AS url,
         min(o_orderkey) AS prio, 'pending' AS state
  FROM orders GROUP BY 1
), upd AS (
  SELECT url, mk AS prio, 'done' AS state,
         CASE WHEN mk % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM (SELECT 'http://host' || (l_orderkey % 300) || '.onion' AS url,
               min(l_orderkey) AS mk
        FROM lineitem GROUP BY 1)
)
SELECT coalesce(u.url, b.url) AS url,
       CASE WHEN u.op IS NOT NULL THEN u.prio ELSE b.prio END AS prio,
       CASE WHEN u.op IS NOT NULL THEN u.state ELSE b.state END AS state
FROM base b FULL OUTER JOIN upd u ON b.url = u.url
WHERE CASE WHEN u.op IS NOT NULL THEN u.op <> 'D' ELSE TRUE END
"""


def q_seen_anti_join_cuckoo(spark, sf_dir):
    """D1's cuckoo variant end-to-end at driver-check strength: the
    shard-ROUTED build + probe (operators/cuckoo.py — each task holds
    ONE 128 KiB shard table, the 10^10-key layout; no broadcast of the
    whole filter) prefilters the candidate set, definitely-unseen rows
    skip the exact anti-join, maybe-seen rows fall through to it — and
    the composed output must hash-match the PLAIN anti-join oracle,
    proving the no-false-negatives contract through the same harness
    that grades every other row."""
    from genesis_spark.operators import cuckoo as CK

    new = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("http://u"),
                 (F.col("l_orderkey") % 1000).cast("string"),
                 F.lit(".onion")).alias("url")).distinct()
    seen = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0) \
        .select(F.concat(F.lit("http://u"),
                         (F.col("o_orderkey") % 300).cast("string"),
                         F.lit(".onion")).alias("url")).distinct()
    shards = CK.build_cuckoo_shards(seen, "url")
    flagged = CK.filter_not_seen_cuckoo_routed(new, "url", shards)
    definite = flagged.filter(~F.col("_maybe_seen")).select("url")
    maybe = flagged.filter(F.col("_maybe_seen")).select("url")
    return definite.unionByName(maybe.join(seen, "url", "left_anti"))


ORACLE_SEEN_ANTI_JOIN_CUCKOO = ORACLE_SEEN_ANTI_JOIN


def q_validity_rubric(spark, sf_dir):
    """A1-shaped pure-column scoring rubric over the documents table."""
    d = _t(spark, sf_dir, "documents")
    ntok = F.size(F.split(F.col("text"), " "))
    score = (F.when(F.col("n_chars") > 200, 20)
             .when(F.col("n_chars") > 100, 10).otherwise(-5)
             + F.when(ntok > 30, 10).otherwise(-5)
             + F.when(F.col("lang") == "en", 10).otherwise(0))
    return d.select("doc_id", F.greatest(score, F.lit(0)).alias("score"))


ORACLE_VALIDITY_RUBRIC = """
SELECT doc_id, greatest(
    (CASE WHEN n_chars > 200 THEN 20 WHEN n_chars > 100 THEN 10 ELSE -5 END)
  + (CASE WHEN len(string_split(text, ' ')) > 30 THEN 10 ELSE -5 END)
  + (CASE WHEN lang = 'en' THEN 10 ELSE 0 END), 0) AS score
FROM documents
"""


# ---------------------------------------------------------------------------
# dedup family (training-data pipeline)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_corpus(spark, sf_dir))


ORACLE_DEDUP_EXACT = f"""
WITH {_CORPUS_SQL}
SELECT min(doc_id) AS doc_id, count(*) AS n_copies
FROM corpus GROUP BY md5(text), text
"""


def q_join_salted(spark, sf_dir):
    """J-family skew mitigation: lineitem joined to a 3-row returnflag dim
    — the canonical hot-key join (3 keys over the whole fact table) — via
    explicit salting (salt by l_orderkey, dim replicated x8) instead of
    broadcast. The salted result must equal the plain join bit-for-bit;
    the per-flag rollup keeps the hash compact."""
    from genesis_spark.operators.joins import salted_join

    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_orderkey", "l_quantity")
    dim = spark.createDataFrame(
        [("A", "acknowledged"), ("N", "new"), ("R", "returned")],
        "l_returnflag string, flag_label string")
    j = salted_join(li, dim, key="l_returnflag", salt_src="l_orderkey",
                    n_salt=8)
    return (j.groupBy("l_returnflag", "flag_label")
            .agg(F.count("*").alias("n_items"),
                 F.round(F.sum("l_quantity"), 2).alias("sum_qty")))


ORACLE_JOIN_SALTED = """
WITH dim(l_returnflag, flag_label) AS (
  VALUES ('A', 'acknowledged'), ('N', 'new'), ('R', 'returned')
)
SELECT l.l_returnflag, d.flag_label,
       count(*) AS n_items, round(sum(l.l_quantity), 2) AS sum_qty
FROM lineitem l JOIN dim d USING (l_returnflag)
GROUP BY l.l_returnflag, d.flag_label
"""


# frozen output of bpe_train(sf0.001 documents, 12) — golden-verified
# against the pure-Python classical-BPE reference in
# tests/test_tokenize.py::test_bpe_train_sf0001_golden
_BPE_MERGES = [("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"),
               ("s", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
               ("m", "er"), ("a", "t"), ("a", "n"), ("c", "an")]


def q_text_bpe_apply(spark, sf_dir):
    """BPE tokenization with a FIXED learned merge list (training itself
    is iterative/non-SQL — golden-tested in tests/test_tokenize.py; the
    applied merges here are its frozen sf0.001 output): 12 chained
    codegen replaces over space-wrapped symbol strings, zero shuffles
    until the final vocab count. Output: per-token corpus counts."""
    from genesis_spark.operators.tokenize import bpe_apply

    docs = _t(spark, sf_dir, "documents")
    return (bpe_apply(docs, _BPE_MERGES)
            .groupBy("token").agg(F.count("*").alias("n_tok")))


def _bpe_apply_sql(merges) -> str:
    expr = "' ' || trim(regexp_replace(word, '(.)', '\\1  ', 'g')) || ' '"
    for a, b in merges:
        expr = f"replace({expr}, ' {a}  {b} ', ' {a}{b} ')"
    return expr


ORACLE_TEXT_BPE_APPLY = f"""
WITH words AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
  FROM documents
),
toks AS (
  SELECT unnest(string_split_regex(trim({_bpe_apply_sql(_BPE_MERGES)}),
                ' +')) AS token
  FROM words WHERE word <> ''
)
SELECT token, count(*) AS n_tok FROM toks GROUP BY token
"""


def q_dedup_tfidf_cosine(spark, sf_dir):
    """Sparse TF-IDF cosine near-dup pairs via inverted-index self-join
    (never a cross join): posting lists capped at df <= 400 (drops the
    fixture's corpus-wide salad terms, bounding per-term fan-out),
    cosine >= 0.8 rounded at 4 dp. The twins provide exact (cos 1.0)
    and near-dup positives."""
    return D.tfidf_cosine_pairs(_corpus(spark, sf_dir), threshold=0.8,
                                max_df=400)


ORACLE_DEDUP_TFIDF_COSINE = f"""
WITH {_CORPUS_SQL},
toks AS (
  SELECT doc_id, t.term FROM corpus,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 3
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dfx AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1 HAVING count(*) <= 400
),
w AS (
  SELECT tf.doc_id, tf.term,
         tf.tf * ln((SELECT count(*) FROM corpus)::DOUBLE / dfx.df) AS w
  FROM tf JOIN dfx USING (term)
),
nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM w GROUP BY 1),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.w * b.w) AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, round(dot / (na.nrm * nb.nrm), 4) AS cosine
FROM dots
JOIN nrm na ON na.doc_id = dots.doc_a
JOIN nrm nb ON nb.doc_id = dots.doc_b
WHERE round(dot / (na.nrm * nb.nrm), 4) >= 0.8
"""


def q_dedup_exact_substr(spark, sf_dir):
    """ExactSubstr duplicated spans (Lee et al. 2021) over the twin corpus:
    maximal char spans whose every 40-gram occurs >= 2 times corpus-wide
    (the twins guarantee cross-doc duplicates; the word-salad fixture text
    adds intra-corpus repeats)."""
    return D.duplicated_spans(_corpus(spark, sf_dir), k=40)


ORACLE_DEDUP_EXACT_SUBSTR = f"""
WITH {_CORPUS_SQL},
pos AS (
  SELECT doc_id, text, unnest(range(length(text) - 39)) AS pos
  FROM corpus WHERE length(text) >= 40
),
grams AS (
  SELECT doc_id, pos, substr(md5(substr(text, pos + 1, 40)), 1, 16) AS h
  FROM pos
),
dups AS (SELECT h FROM grams GROUP BY h HAVING count(*) >= 2),
hits AS (SELECT g.doc_id, g.pos FROM grams g JOIN dups USING (h)),
brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + 40) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS b
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(b) OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM brk
)
SELECT doc_id, min(pos) AS span_start, max(pos) + 40 AS span_end,
       max(pos) + 40 - min(pos) AS span_len
FROM isl GROUP BY doc_id, island
"""


def q_dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(_corpus(spark, sf_dir), threshold=0.5)


def _minhash_pairs_cte() -> str:
    """CTE chain ending in ``mpairs`` = the >=0.5-jaccard candidate pairs —
    shared by the pair query's oracle and the cluster query's oracle."""
    mh_cols = ",\n  ".join(
        f"min(substr(md5('{i}|' || shingle), 1, 16)) AS mh{i}"
        for i in range(D.N_MINHASH))
    bands = ", ".join(
        "mh%d || mh%d || mh%d || mh%d AS b%d" % (
            b * 4, b * 4 + 1, b * 4 + 2, b * 4 + 3, b)
        for b in range(D.N_BANDS))
    cand = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sigb a "
        f"JOIN sigb b ON a.b{b} = b.b{b} AND a.doc_id < b.doc_id"
        for b in range(D.N_BANDS))
    matches = " + ".join(
        f"(CASE WHEN sa.mh{i} = sb.mh{i} THEN 1 ELSE 0 END)"
        for i in range(D.N_MINHASH))
    return f"""{_CORPUS_SQL},
{_shingle_sql(3)},
sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),
sigb AS (SELECT *, {bands} FROM sig),
cand AS ({cand}),
mpairs AS (
  SELECT cand.doc_a, cand.doc_b,
         round(({matches}) / 16.0, 4) AS est_jaccard
  FROM cand
  JOIN sig sa ON sa.doc_id = cand.doc_a
  JOIN sig sb ON sb.doc_id = cand.doc_b
  WHERE round(({matches}) / 16.0, 4) >= 0.5
)"""


ORACLE_DEDUP_MINHASH = f"""
WITH {_minhash_pairs_cte()}
SELECT doc_a, doc_b, est_jaccard FROM mpairs
"""


def q_dedup_minhash_eval(spark, sf_dir):
    """Estimator-vs-truth EVALUATION row: the minhash-LSH pair set graded
    against exact 3-gram jaccard over the identical (max_df-capped)
    shingle sets — TP/FP/FN and precision/recall in one summary row, so
    the approximation quality the 100 TB dedup path relies on is itself
    value-hashed, not asserted in prose. All three counts are tiny
    single-row aggregates crossed together; the heavy lifting reuses the
    banded-join operators unchanged."""
    corpus = _corpus(spark, sf_dir)
    est = (D.minhash_lsh_pairs(corpus, threshold=0.5)
           .select("doc_a", "doc_b"))
    truth = (D.ngram_jaccard_pairs(corpus, threshold=0.5,
                                   max_df=_NGRAM_MAX_DF)
             .select("doc_a", "doc_b"))
    n_est = est.agg(F.count("*").alias("n_est"))
    n_true = truth.agg(F.count("*").alias("n_true"))
    tp = (est.join(truth, ["doc_a", "doc_b"])
          .agg(F.count("*").alias("tp")))
    return (n_est.crossJoin(n_true).crossJoin(tp)
            .select("n_est", "n_true", "tp",
                    (F.col("n_est") - F.col("tp")).alias("fp"),
                    (F.col("n_true") - F.col("tp")).alias("fn"),
                    F.round(F.col("tp") / F.col("n_est"), 4)
                    .alias("precision"),
                    F.round(F.col("tp") / F.col("n_true"), 4)
                    .alias("recall")))


def _minhash_eval_oracle() -> str:
    return f"""
WITH {_minhash_pairs_cte()},
dsh0 AS (SELECT DISTINCT doc_id, shingle FROM sh),
keep AS (SELECT shingle FROM dsh0 GROUP BY shingle
         HAVING count(*) <= {_NGRAM_MAX_DF}),
dsh AS (SELECT doc_id, dsh0.shingle FROM dsh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
  FROM dsh x JOIN dsh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
tpairs AS (
  SELECT doc_a, doc_b
  FROM common
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE round(n_common / (na.n + nb.n - n_common), 4) >= 0.5),
counts AS (
  SELECT (SELECT count(*) FROM mpairs) AS n_est,
         (SELECT count(*) FROM tpairs) AS n_true,
         (SELECT count(*) FROM mpairs m
            JOIN tpairs t ON m.doc_a = t.doc_a AND m.doc_b = t.doc_b)
           AS tp)
SELECT n_est, n_true, tp, n_est - tp AS fp, n_true - tp AS fn,
       round(tp / n_est, 4) AS precision,
       round(tp / n_true, 4) AS recall
FROM counts
"""


# ORACLE_DEDUP_MINHASH_EVAL is assigned below ORACLE_DEDUP_NGRAM (the
# oracle builder needs _NGRAM_MAX_DF, defined with the jaccard family).


def q_dedup_incremental(spark, sf_dir):
    """Incremental-ingest dedup: the twins as an arriving batch checked
    against the standing documents corpus — band joins run ONLY new x
    old (never old x old), the continuous-pipeline shape. Old ids are
    < 100000 and new ids >= 100000, so the oracle is the full-corpus
    mpairs chain filtered to cross-side pairs (a pair's estimate is
    per-doc-signature-local, so the restricted join can't change it)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    twins = (docs.filter(F.col("doc_id") % 2 == 0)
             .select((F.col("doc_id") + 100000).alias("doc_id"),
                     F.when(F.col("doc_id") % 5 == 0, F.col("text"))
                     .otherwise(F.regexp_replace("text", " [^ ]+$", ""))
                     .alias("text")))
    return D.minhash_incremental_pairs(docs, twins, threshold=0.5)


ORACLE_DEDUP_INCREMENTAL = f"""
WITH {_minhash_pairs_cte()}
SELECT doc_a AS old_id, doc_b AS new_id, est_jaccard FROM mpairs
WHERE doc_a < 100000 AND doc_b >= 100000
"""


def q_dedup_cluster_reps(spark, sf_dir):
    """Cluster-level dedup: MinHash-LSH near-dup pairs -> connected
    components (hash-to-min label propagation) -> one surviving
    representative (min doc_id) per cluster, singletons included. The
    oracle computes the same closure with a recursive CTE."""
    from genesis_spark.operators.cc import connected_components
    corpus = _corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(corpus, threshold=0.5) \
        .select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    wc = (corpus.join(comp.withColumnRenamed("node", "doc_id"),
                      "doc_id", "left")
          .withColumn("cluster_id", F.coalesce("component", F.col("doc_id"))))
    return (wc.groupBy("cluster_id")
            .agg(F.min("doc_id").alias("doc_id"),
                 F.count("*").alias("cluster_size")))


ORACLE_DEDUP_CLUSTER_REPS = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM mpairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM mpairs
),
reach AS (
  SELECT a AS node, a AS comp FROM sym
  UNION
  SELECT s.a AS node, r.comp FROM sym s JOIN reach r ON r.node = s.b
),
comp AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
wc AS (
  SELECT c.doc_id, coalesce(k.component, c.doc_id) AS cluster_id
  FROM corpus c LEFT JOIN comp k ON k.node = c.doc_id
)
SELECT cluster_id, min(doc_id) AS doc_id, count(*) AS cluster_size
FROM wc GROUP BY cluster_id
"""


def q_corpus_clean(spark, sf_dir):
    """END-TO-END training-corpus cleaning pipeline in one plan: MinHash
    near-dup pairs -> connected components -> keep the min-id
    representative per cluster (subsumes exact dedup: byte-identical twins
    share every band) -> quality-score gate (>= 80). Output = the cleaned
    corpus manifest (doc_id, quality). This is the composition a 100 TB
    pretraining pipeline runs nightly; each stage was oracle-verified
    separately, this row verifies the composition."""
    from genesis_spark.operators.cc import connected_components
    corpus = _corpus(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(corpus, threshold=0.5) \
        .select("doc_a", "doc_b")
    comp = connected_components(pairs, "doc_a", "doc_b")
    wc = (corpus.join(comp.withColumnRenamed("node", "doc_id"),
                      "doc_id", "left")
          .withColumn("cluster_id", F.coalesce("component", F.col("doc_id"))))
    reps = wc.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    survivors = wc.join(reps, ["doc_id", "cluster_id"]) \
        .select("doc_id", "text")
    return (survivors
            .withColumn("quality", TS.quality_score_expr(F.col("text")))
            .filter(F.col("quality") >= 80)
            .select("doc_id", "quality"))


ORACLE_CORPUS_CLEAN = f"""
WITH RECURSIVE {_minhash_pairs_cte()},
sym AS (
  SELECT doc_a AS a, doc_b AS b FROM mpairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM mpairs
),
reach AS (
  SELECT a AS node, a AS comp FROM sym
  UNION
  SELECT s.a AS node, r.comp FROM sym s JOIN reach r ON r.node = s.b
),
comp AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
wc AS (
  SELECT c.doc_id, c.text, coalesce(k.component, c.doc_id) AS cluster_id
  FROM corpus c LEFT JOIN comp k ON k.node = c.doc_id
),
reps AS (SELECT cluster_id, min(doc_id) AS doc_id FROM wc
         GROUP BY cluster_id),
surv AS (SELECT wc.doc_id, wc.text FROM wc
         JOIN reps ON reps.doc_id = wc.doc_id
                  AND reps.cluster_id = wc.cluster_id),
{_quality_cte("doc_id", "surv")}
SELECT doc_id, q AS quality FROM qs WHERE q >= 80
"""


def q_corpus_clean_full(spark, sf_dir):
    """The OTHER end-to-end training-corpus recipe (corpus_clean covers
    near-dup clustering; this covers the filter-chain): C4 line cleaning ->
    Gopher repetition gate (thresholds sized to the fixture vocabulary:
    dup_word 0.68 / top_bigram 0.08 drop a visible minority) -> exact
    dedup on the CLEANED text (injected +500000 twins prove the stage) ->
    quality gate >= 80. Each stage is oracle-verified alone; this row
    verifies the composition. Shuffle budget: repetition's two aggs + the
    dedup groupBy — the C4/quality stages stay map-side."""
    cleaned0 = TS.c4_line_clean(_c4_synth(spark, sf_dir)) \
        .select("doc_id", "n_kept", "clean_text")
    twins = cleaned0.filter(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "n_kept", "clean_text")
    cleaned = cleaned0.unionByName(twins)
    rep = TS.repetition_stats(
        cleaned.select("doc_id", F.col("clean_text").alias("text")),
        top_bigram_max=0.08, dup_word_max=0.68)
    gated = cleaned.join(
        rep.filter(~F.col("repetitive")).select("doc_id"), "doc_id")
    reps = (gated.groupBy(F.md5("clean_text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id")))
    surv = gated.join(reps.select("doc_id"), "doc_id")
    return (surv
            .withColumn("quality", TS.quality_score_expr(F.col("clean_text")))
            .filter(F.col("quality") >= 80)
            .select("doc_id", "n_kept", "quality"))


ORACLE_CORPUS_CLEAN_FULL = f"""
WITH {_C4_SYNTH_SQL},
{_C4_KEPT_SQL},
cleaned0 AS (
  SELECT doc_id, CAST(len(keep) AS INT) AS n_kept,
         array_to_string(keep, ' ') AS clean_text
  FROM kept WHERE len(keep) > 0
),
cleaned AS (
  SELECT * FROM cleaned0
  UNION ALL
  SELECT doc_id + 500000, n_kept, clean_text FROM cleaned0
  WHERE doc_id % 2 = 0
),
{_rep_cte("cleaned", "clean_text")},
nonrep AS (
  SELECT doc_id FROM rs
  WHERE NOT (round(1 - n_distinct / greatest(n_words, 1), 4) > 0.68
             OR round(top_c / greatest(total_c, 1), 4) > 0.08)
),
gated AS (SELECT c.* FROM cleaned c JOIN nonrep USING (doc_id)),
reps AS (SELECT md5(clean_text) AS h, min(doc_id) AS doc_id
         FROM gated GROUP BY 1),
surv AS (SELECT g.doc_id, g.n_kept, g.clean_text AS text
         FROM gated g JOIN reps r ON r.doc_id = g.doc_id),
{_quality_cte("doc_id", "surv")}
SELECT s.doc_id, s.n_kept, qs.q AS quality
FROM surv s JOIN qs ON qs.doc_id = s.doc_id
WHERE qs.q >= 80
"""


def q_dedup_decontaminate(spark, sf_dir):
    """Benchmark decontamination (GPT-3 §C / The Pile style): flag every
    training doc sharing ANY 8-gram with the held-out benchmark set
    (every 50th doc). Shape: explode 8-gram shingles on both sides, hash
    them, distinct, and equi-join benchmark grams against train grams —
    the join key is the gram hash, so at 100 TB it is one shuffled
    equi-join on near-unique keys (no theta join, no broadcast of the
    corpus); the small benchmark side IS broadcastable and Catalyst picks
    that up from AQE stats. Output: flagged train docs + how many distinct
    benchmark grams they collide with."""
    corpus = _t(spark, sf_dir, "documents").select("doc_id", "text")
    grams = corpus.select(
        "doc_id", F.explode(D.shingles_expr(F.col("text"), 8)).alias("g")) \
        .select("doc_id", F.substring(F.md5("g"), 1, 16).alias("h")) \
        .distinct()
    bench = grams.filter(F.col("doc_id") % 50 == 0) \
        .select(F.col("h").alias("bh")).distinct()
    train = grams.filter(F.col("doc_id") % 50 != 0)
    return (train.join(bench, train.h == bench.bh)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_contaminated_grams")))


ORACLE_DEDUP_DECONTAMINATE = f"""
WITH base AS (
  SELECT doc_id, text, string_split(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, substr(md5(unnest(CASE WHEN len(w) >= 8
           THEN list_transform(range(len(w) - 7),
                i -> {" || ' ' || ".join(f"w[i+{k + 1}]" for k in range(8))})
           ELSE [text] END)), 1, 16) AS h
  FROM base
),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id % 50 = 0),
train AS (SELECT doc_id, h FROM sh WHERE doc_id % 50 <> 0)
SELECT t.doc_id, count(*) AS n_contaminated_grams
FROM train t JOIN bench b ON t.h = b.h
GROUP BY t.doc_id
"""


def q_corpus_vocab_topk(spark, sf_dir):
    """Global vocabulary statistics: top-50 words by total count with doc
    frequency — the corpus-level profile a tokenizer-training / mixture
    pipeline computes first. Two-level agg: (word, doc) distinct rides the
    same explode, then one groupBy(word); ties break on the word for a
    deterministic top-k."""
    corpus = _t(spark, sf_dir, "documents").select("doc_id", "text")
    words = corpus.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word"))
    stats = (words.groupBy("word")
             .agg(F.count("*").alias("n_total"),
                  F.countDistinct("doc_id").alias("n_docs")))
    return (stats.orderBy(F.desc("n_total"), "word").limit(50))


ORACLE_CORPUS_VOCAB_TOPK = """
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT word, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
FROM w GROUP BY word
ORDER BY n_total DESC, word
LIMIT 50
"""


def q_corpus_mixture(spark, sf_dir):
    """Domain-mixture profile: per-source document/token counts and token
    share (the numbers a Pile-style mixture-weighting step feeds on).
    One map-side-combinable agg over the scan + a broadcast of the single
    global-total row. Null texts are excluded on both sides (Spark's
    legacy size(NULL) = -1 would otherwise desync from DuckDB's
    NULL-skipping sum)."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    per = (d.groupBy("source")
           .agg(F.count("*").alias("n_docs"),
                F.sum(F.size(F.split("text", " "))).alias("n_tokens")))
    total = per.agg(F.sum("n_tokens").alias("t")).select("t")
    return (per.crossJoin(F.broadcast(total))
            .select("source", "n_docs", "n_tokens",
                    F.round(F.col("n_tokens") / F.col("t"), 6)
                    .alias("token_share")))


ORACLE_CORPUS_MIXTURE = """
WITH per AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL GROUP BY source
)
SELECT source, n_docs, n_tokens,
       round(CAST(n_tokens AS DOUBLE)
             / (SELECT CAST(sum(n_tokens) AS DOUBLE) FROM per), 6)
         AS token_share
FROM per
"""


def q_corpus_pack(spark, sf_dir):
    """Sequence packing (the GPT-style concat-and-chunk training prep):
    within each source stream, documents are concatenated in doc_id order
    and cut into fixed 2048-token blocks; each doc reports its starting
    token offset and the block range it lands in. The oracle row runs the
    flat one-window-per-source plan; ``operators.pack.pack_blocks`` also
    implements the 100 TB scale path (deterministic doc_id range shards,
    per-shard sums, tiny prefix window, broadcast base offsets) proved
    bit-identical in ``test_pack_sharded_equals_flat``."""
    from genesis_spark.operators.pack import pack_blocks
    return pack_blocks(_t(spark, sf_dir, "documents"), seq_len=2048)


ORACLE_CORPUS_PACK = """
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
  FROM documents WHERE text IS NOT NULL
),
o AS (
  SELECT doc_id, source, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
              AS BIGINT) AS tok_offset
  FROM d
)
SELECT doc_id, source, n_tokens, tok_offset,
       tok_offset // 2048 AS block_first,
       (tok_offset + n_tokens - 1) // 2048 AS block_last
FROM o
"""


def q_corpus_sample_weighted(spark, sf_dir):
    """Quality-proportional deterministic sampling: keep a doc with
    probability quality/100, decided by a uniform hash of the doc id
    (md5-prefix over 2^60 — the same engine-portable construction as the
    KMV sketch). The importance-sampling step a mixture pipeline applies
    after scoring; deterministic, so re-runs and the oracle agree exactly,
    and at 100 TB it is a pure map over the scan (no shuffle, no RNG
    state)."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    scored = d.select(
        "doc_id", TS.quality_score_expr(F.col("text")).alias("quality"))
    u = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
                16, 10).cast("long") / F.lit(float(1 << 60)))
    return scored.filter(u < F.col("quality") / F.lit(100.0)) \
        .select("doc_id", "quality")


ORACLE_CORPUS_SAMPLE_WEIGHTED = f"""
WITH docsnn AS (
  SELECT doc_id, text FROM documents WHERE text IS NOT NULL
),
{_quality_cte("doc_id", "docsnn")}
SELECT doc_id, q AS quality FROM qs
WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
      / CAST(1152921504606846976 AS DOUBLE) < q / 100.0
"""


def q_dedup_simhash(spark, sf_dir):
    b = D.simhash_buckets(_corpus(spark, sf_dir))
    return b.select(
        "simhash", "n_docs",
        F.array_join(F.transform("doc_ids", lambda x: x.cast("string")),
                     ",").alias("doc_ids_csv"))


def _simhash_oracle() -> str:
    votes = ",\n  ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16))
    bits = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(16))
    return f"""
WITH {_CORPUS_SQL},
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus),
h AS (SELECT doc_id,
             CAST(concat('0x', substr(md5(word), 1, 4)) AS BIGINT) AS h
      FROM w),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
s AS (SELECT doc_id, {bits} AS simhash FROM v)
SELECT simhash, count(*) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids_csv
FROM s GROUP BY simhash HAVING count(*) > 1
"""


ORACLE_DEDUP_SIMHASH = _simhash_oracle()


def q_dedup_simhash64(spark, sf_dir):
    """The scale-path simhash: 64-bit fingerprint, 4x16-bit band equi-joins,
    pair output (no per-bucket membership arrays)."""
    return D.simhash64_pairs(_corpus(spark, sf_dir), max_hamming=8)


def _simhash64_oracle() -> str:
    votes = ",\n  ".join(
        [f"sum(CASE WHEN (lo >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
         for b in range(32)] +
        [f"sum(CASE WHEN (hi >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{32 + b}"
         for b in range(32)])
    segs = ",\n  ".join(
        " + ".join(f"(CASE WHEN s{16 * k + i} > 0 THEN {1 << i} ELSE 0 END)"
                   for i in range(16)) + f" AS seg{k}"
        for k in range(D.N_SIMHASH_BANDS))
    cand = "\nUNION\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM sg a "
        f"JOIN sg b ON a.seg{k} = b.seg{k} AND a.doc_id < b.doc_id"
        for k in range(D.N_SIMHASH_BANDS))
    ham = " + ".join(f"bit_count(xor(sa.seg{k}, sb.seg{k}))"
                     for k in range(D.N_SIMHASH_BANDS))
    return f"""
WITH {_CORPUS_SQL},
w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM corpus),
h AS (SELECT doc_id,
        CAST(concat('0x', substr(md5(word), 1, 8)) AS BIGINT) AS hi,
        CAST(concat('0x', substr(md5(word), 9, 8)) AS BIGINT) AS lo
      FROM w),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
sg AS (SELECT doc_id, {segs} FROM v),
cand AS ({cand})
SELECT cand.doc_a, cand.doc_b, CAST({ham} AS INTEGER) AS hamming
FROM cand
JOIN sg sa ON sa.doc_id = cand.doc_a
JOIN sg sb ON sb.doc_id = cand.doc_b
WHERE {ham} <= 8
"""


ORACLE_DEDUP_SIMHASH64 = _simhash64_oracle()


_NGRAM_MAX_DF = 50


def q_dedup_ngram_jaccard(spark, sf_dir):
    # max_df: hot-shingle guard — a shingle in > max_df docs is dropped from
    # every shingle set before the self-join (bounds join fan-out at
    # max_df^2 per shingle); the oracle applies the identical cap
    return D.ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.6,
                                 max_df=_NGRAM_MAX_DF)


ORACLE_DEDUP_NGRAM = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(3)},
dsh0 AS (SELECT DISTINCT doc_id, shingle FROM sh),
keep AS (SELECT shingle FROM dsh0 GROUP BY shingle
         HAVING count(*) <= {_NGRAM_MAX_DF}),
dsh AS (SELECT doc_id, dsh0.shingle FROM dsh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
  FROM dsh x JOIN dsh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b,
       round(n_common / (na.n + nb.n - n_common), 4) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = doc_a
JOIN sizes nb ON nb.doc_id = doc_b
WHERE round(n_common / (na.n + nb.n - n_common), 4) >= 0.6
"""


ORACLE_DEDUP_MINHASH_EVAL = _minhash_eval_oracle()


# ---------------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------------

def q_ann_cosine_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)


ORACLE_ANN_COSINE = """
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
         AS cos
  FROM embeddings q JOIN embeddings b ON b.vec_id != q.vec_id
  WHERE q.vec_id < 10)
SELECT query_id, rnk AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


_LSH_TABLES, _LSH_PLANES, _LSH_DIM = 4, 4, 64


def q_ann_lsh_topk(spark, sf_dir):
    """The scale path for similarity search: multi-table hyperplane-LSH
    candidates (bucket equi-joins), exact cosine + top-k only within the
    candidate set. Plane sign vectors are driver-side literals (constants of
    (table, plane, dim) — never recomputed per row). 4 tables x 4 planes is
    the fixture-tuned setting (recall vs brute force measured in
    tests/test_operators.py and BENCH.md)."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.lsh_topk(emb, emb.filter(F.col("vec_id") < 10), k=5,
                        n_planes=_LSH_PLANES, n_tables=_LSH_TABLES,
                        dim=_LSH_DIM)


def q_dedup_embedding_cosine(spark, sf_dir):
    """Embedding-cosine near-dup (the dedup-family ANN variant): the
    fixture embeddings are near-random (all pairwise cosines < 0.7), so
    the query synthesizes near-duplicates deterministically — each
    vec_id < 200 gains a +100000 twin d[i] = e[i] + 0.4*e[(i+1) % dim]
    (cosine ~0.93) — then finds all pairs sharing a hyperplane-LSH
    bucket in any table with exact cosine >= 0.85. The oracle replays
    the same perturbation, plane literals, bucket joins, and threshold,
    so the approximate operator is checked EXACTLY."""
    dim = _LSH_DIM
    emb = _t(spark, sf_dir, "embeddings")
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double"))
        .alias("embedding"))
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    dup = emb.filter(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(idx, lambda i: (
            F.element_at("embedding", (i + 1).cast("int")).cast("double")
            + F.lit(0.4) * F.element_at(
                "embedding",
                ((i + 1) % dim + 1).cast("int")).cast("double")))
        .alias("embedding"))
    allv = base.unionByName(dup)
    return SIM.embedding_near_dup_pairs(
        allv, threshold=0.85, n_planes=_LSH_PLANES, n_tables=_LSH_TABLES,
        dim=dim).select("id_a", "id_b")


def _near_dup_oracle() -> str:
    dim = _LSH_DIM
    sig_cols = []
    for t in range(_LSH_TABLES):
        terms = []
        for p, signs in enumerate(
                SIM.hyperplane_signs(t, _LSH_PLANES, dim)):
            lit = "[" + ", ".join(f"{s:.1f}" for s in signs) + "]"
            terms.append(
                f"(CASE WHEN list_sum(list_transform(range({dim}), "
                f"i -> v[i+1] * ({lit})[i+1])) > 0 "
                f"THEN {1 << p} ELSE 0 END)")
        sig_cols.append(" + ".join(terms) + f" AS bucket{t}")
    sig_sql = ",\n  ".join(sig_cols)
    cand = "\nUNION\n".join(
        f"SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        f"FROM sig a JOIN sig b ON a.bucket{t} = b.bucket{t} "
        f"AND a.vec_id < b.vec_id"
        for t in range(_LSH_TABLES))
    return f"""
WITH allv AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(range({dim}),
           i -> embedding[i+1]::DOUBLE
                + 0.4 * embedding[((i+1) % {dim}) + 1]::DOUBLE) AS v
  FROM embeddings WHERE vec_id < 200
), sig AS (
  SELECT vec_id, v,
  {sig_sql}
  FROM allv
), cand AS (
{cand}
)
SELECT c.id_a, c.id_b
FROM cand c
JOIN sig a ON a.vec_id = c.id_a
JOIN sig b ON b.vec_id = c.id_b
WHERE list_sum(list_transform(range({dim}), i -> a.v[i+1] * b.v[i+1]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.85
"""


ORACLE_DEDUP_EMBEDDING = _near_dup_oracle()


def _lsh_oracle() -> str:
    sig_cols = []
    for t in range(_LSH_TABLES):
        terms = []
        for p, signs in enumerate(
                SIM.hyperplane_signs(t, _LSH_PLANES, _LSH_DIM)):
            lit = "[" + ", ".join(f"{s:.1f}" for s in signs) + "]"
            terms.append(
                f"(CASE WHEN list_sum(list_transform(range({_LSH_DIM}), "
                f"i -> embedding[i+1]::DOUBLE * ({lit})[i+1])) > 0 "
                f"THEN {1 << p} ELSE 0 END)")
        sig_cols.append(" + ".join(terms) + f" AS bucket{t}")
    sig_sql = ",\n  ".join(sig_cols)
    cand = "\nUNION\n".join(
        f"SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id "
        f"FROM sig q JOIN sig b ON q.bucket{t} = b.bucket{t} "
        f"AND q.vec_id < 10 AND b.vec_id != q.vec_id"
        for t in range(_LSH_TABLES))
    return f"""
WITH sig AS (SELECT vec_id, {sig_sql} FROM embeddings),
cand AS ({cand}),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
         AS cos
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.query_id
  JOIN embeddings b ON b.vec_id = cand.neighbor_id)
SELECT query_id, rnk AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


ORACLE_ANN_LSH = _lsh_oracle()


_IVF_CENTROIDS, _IVF_PROBE, _IVF_DIM = 8, 3, 64


def q_ann_ivf_topk(spark, sf_dir):
    """The coarse-quantizer ANN scale path (FAISS IVF-flat shape): assign
    every base vector to its nearest centroid cell once, probe the
    query's n_probe nearest cells, exact-rescore candidates only. ONE
    equi-join on cell id — at 10^9 rows the base is bucketed by cell at
    rest and a query touches n_probe/n_centroids of the data. Centroids
    here are the deterministic seeded stand-in so DuckDB can bake the
    same literals; production trains them (KMeans) and passes them in."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(emb, emb.filter(F.col("vec_id") < 10), k=5,
                        n_centroids=_IVF_CENTROIDS, n_probe=_IVF_PROBE,
                        dim=_IVF_DIM)


def _ivf_cells_sql() -> str:
    """cents/dots/base_cells CTE prefix assigning every embedding to its
    nearest seeded-centroid cell — shared by the ivf_topk oracle and the
    cell-balance audit so the assignment replay can't drift."""
    import math

    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    rows = []
    for c, vec in enumerate(cents):
        lit = "[" + ", ".join(repr(x) for x in vec) + "]"
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        rows.append(f"({c}, {lit}::DOUBLE[], {norm!r})")
    values = ",\n   ".join(rows)
    return f"""cents(cell, cvec, cnorm) AS (VALUES
   {values}),
dots AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range({_IVF_DIM}),
             i -> e.embedding[i+1]::DOUBLE * c.cvec[i+1])) / c.cnorm AS s
  FROM embeddings e CROSS JOIN cents c),
base_cells AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM dots) WHERE rn = 1)"""


def _ivf_oracle() -> str:
    return f"""
WITH {_ivf_cells_sql()},
q_probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM dots WHERE vec_id < 10) WHERE rn <= {_IVF_PROBE}),
scored AS (
  SELECT p.query_id, bc.neighbor_id,
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
         AS cos
  FROM q_probes p
  JOIN base_cells bc USING (cell)
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings b ON b.vec_id = bc.neighbor_id
  WHERE bc.neighbor_id != p.query_id)
SELECT query_id, rnk AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos DESC, neighbor_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


ORACLE_ANN_IVF = _ivf_oracle()


# ---------------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------------

def q_text_lang_id(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.select(TS.lang_id_expr(F.col("text")).alias("lang_detected"))
            .groupBy("lang_detected").agg(F.count("*").alias("n_docs")))


def _lang_oracle() -> str:
    def hits(markers):
        lst = ", ".join(f"'{m}'" for m in markers)
        return ("len(list_filter(string_split(lower(text), ' '), "
                f"t -> t IN ({lst})))")
    en = hits(TS.LANG_MARKERS["en"])
    fr = hits(TS.LANG_MARKERS["fr"])
    es = hits(TS.LANG_MARKERS["es"])
    de = hits(TS.LANG_MARKERS["de"])
    cjk = "regexp_matches(text, '[一-鿿]')"
    return f"""
WITH c AS (
  SELECT {en} AS en, {fr} AS fr, {es} AS es, {de} AS de, {cjk} AS zh
  FROM documents)
SELECT CASE WHEN zh THEN 'zh'
            WHEN en > 0 AND en >= fr AND en >= es AND en >= de THEN 'en'
            WHEN fr > 0 AND fr >= es AND fr >= de THEN 'fr'
            WHEN es > 0 AND es >= de THEN 'es'
            WHEN de > 0 THEN 'de'
            ELSE 'und' END AS lang_detected,
       count(*) AS n_docs
FROM c GROUP BY 1
"""


ORACLE_TEXT_LANG_ID = _lang_oracle()


def q_text_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (d.select("source",
                     TS.quality_score_expr(F.col("text")).alias("q"))
            .groupBy("source")
            .agg(F.round(F.avg("q"), 2).alias("avg_quality"),
                 F.min("q").alias("min_quality"),
                 F.max("q").alias("max_quality"),
                 F.count("*").alias("n_docs")))


ORACLE_TEXT_QUALITY = f"""
WITH {_quality_cte("source", "documents")}
SELECT source, round(avg(q), 2) AS avg_quality, min(q) AS min_quality,
       max(q) AS max_quality, count(*) AS n_docs
FROM qs GROUP BY source
"""


def q_text_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tc = TS.token_counts_exprs(F.col("text"))
    return (d.select("source", tc["n_tokens_ws"].alias("ws"),
                     tc["n_tokens_bpe"].alias("bpe"))
            .groupBy("source")
            .agg(F.sum("ws").alias("total_ws_tokens"),
                 F.sum("bpe").alias("total_bpe_tokens")))


ORACLE_TEXT_TOKEN_COUNT = r"""
SELECT source,
       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_ws_tokens,
       CAST(sum(len(regexp_extract_all(text,
           '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS total_bpe_tokens
FROM documents GROUP BY source
"""


def q_text_fingerprint(spark, sf_dir):
    c = _corpus(spark, sf_dir)
    fp = c.select("doc_id", TS.fingerprint_expr(F.col("text")).alias("fp"))
    return (fp.groupBy("fp")
            .agg(F.count("*").alias("n_docs"),
                 F.array_join(
                     F.transform(F.sort_array(F.collect_list("doc_id")),
                                 lambda x: x.cast("string")), ",")
                 .alias("doc_ids_csv"))
            .filter(F.col("n_docs") > 1))


ORACLE_TEXT_FINGERPRINT = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(4)},
fp AS (SELECT doc_id, min(substr(md5(shingle), 1, 16)) AS fp
       FROM sh GROUP BY doc_id)
SELECT fp, count(*) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids_csv
FROM fp GROUP BY fp HAVING count(*) > 1
"""


def _flesch_exprs():
    """(n_words, n_sent, n_syll, flesch) column expressions shared by
    text_readability and corpus_curriculum — one definition so the two
    rows can't drift (the _lpa_labels / _C4_SYNTH_SQL convention)."""
    n_words = F.greatest(F.lit(1), F.size(F.split(F.trim("text"), r"\s+")))
    n_sent = F.greatest(F.lit(1),
                        F.regexp_count("text", F.lit(r"[.!?]+")))
    n_syll = F.greatest(F.lit(1),
                        F.regexp_count(F.lower("text"),
                                       F.lit("[aeiouy]+")))
    raw = (F.lit(206.835) - F.lit(1.015) * n_words / n_sent
           - F.lit(84.6) * n_syll / n_words)
    # explicit floor(x*1e4 + 0.5)/1e4, NOT round(x, 4): Spark's round
    # (BigDecimal HALF_UP over the exact double expansion) and DuckDB's
    # round disagree on half-way doubles — found by the sf0.1 replay
    # (28.1938 vs 28.1937); this quantization is identical in both
    flesch = F.floor(raw * 1e4 + F.lit(0.5)) / 1e4
    return n_words, n_sent, n_syll, flesch


#: the matching DuckDB per-doc Flesch metric CTE body (named `m`)
_FLESCH_M_SQL = r"""m AS (
  SELECT doc_id,
         greatest(1, len(string_split_regex(trim(text), '\s+')))
           AS n_words,
         greatest(1, len(regexp_extract_all(text, '[.!?]+'))) AS n_sent,
         greatest(1, len(regexp_extract_all(lower(text), '[aeiouy]+')))
           AS n_syll
  FROM documents
)"""


def q_text_readability(spark, sf_dir):
    """Flesch reading-ease as a corpus-quality dimension (the classic
    readability rubric beside the Gopher/C4 gates): words by whitespace
    split, sentences by terminal-punctuation runs, syllables by vowel
    groups — all regexp_count codegen, zero shuffles until the final
    bucket rollup is skipped entirely (per-doc rows out). Integer
    counts make the score's double arithmetic cross-engine exact."""
    d = _t(spark, sf_dir, "documents")
    n_words, n_sent, n_syll, flesch = _flesch_exprs()
    bucket = (F.when(flesch >= 90, "very_easy")
              .when(flesch >= 70, "easy")
              .when(flesch >= 50, "medium")
              .when(flesch >= 30, "hard").otherwise("very_hard"))
    return d.select("doc_id", n_words.alias("n_words"),
                    n_sent.alias("n_sent"), n_syll.alias("n_syll"),
                    flesch.alias("flesch"), bucket.alias("bucket"))


#: floor(x*1e4 + 0.5)/1e4 quantization of the raw Flesch double —
#: identical in both engines on half-way cases, unlike round(x, 4).
#: The ::DOUBLE casts matter: DuckDB parses 206.835 as DECIMAL(6,3),
#: which changes the raw value's last ulp vs Spark's double literals
#: (found by the sf0.1 replay: 28.19375 straddled the 4-dp boundary).
_FLESCH_Q_SQL = ("floor((206.835::DOUBLE - 1.015::DOUBLE * n_words / n_sent"
                 " - 84.6::DOUBLE * n_syll / n_words) * 10000 + 0.5) / 10000")

ORACLE_TEXT_READABILITY = rf"""
WITH {_FLESCH_M_SQL},
fl AS (SELECT doc_id, n_words, n_sent, n_syll,
              {_FLESCH_Q_SQL} AS flesch FROM m)
SELECT doc_id, n_words, n_sent, n_syll, flesch,
       CASE WHEN flesch >= 90 THEN 'very_easy'
            WHEN flesch >= 70 THEN 'easy'
            WHEN flesch >= 50 THEN 'medium'
            WHEN flesch >= 30 THEN 'hard'
            ELSE 'very_hard' END AS bucket
FROM fl
"""


def q_text_repetition(spark, sf_dir):
    """Gopher-style repetition filters (Rae et al. 2021 §A1.1) over the
    dedup corpus: duplicate-word fraction + top-2-gram fraction per doc.
    Shape: explode bigrams -> two map-side-combinable aggs on doc keys."""
    return TS.repetition_stats(_corpus(spark, sf_dir))


ORACLE_TEXT_REPETITION = f"""
WITH {_CORPUS_SQL},
{_rep_cte("corpus")}
SELECT doc_id, CAST(n_words AS INT) AS n_words,
       round(1 - n_distinct / greatest(n_words, 1), 4) AS dup_word_frac,
       round(top_c / greatest(total_c, 1), 4) AS top_bigram_frac,
       (round(1 - n_distinct / greatest(n_words, 1), 4) > 0.60
        OR round(top_c / greatest(total_c, 1), 4) > 0.20) AS repetitive
FROM rs
"""


def q_text_c4_clean(spark, sf_dir):
    """C4 cleaning (Raffel et al. 2020 §2.2): line-level punctuation /
    length / code filters + doc-level 'lorem ipsum' drop, over a
    deterministically line-structured synthesis of ``documents``. Pure
    codegen — zero shuffles; at 100 TB this is a map over the scan."""
    return TS.c4_line_clean(_c4_synth(spark, sf_dir))


ORACLE_TEXT_C4_CLEAN = f"""
WITH {_C4_SYNTH_SQL},
{_C4_KEPT_SQL}
SELECT doc_id, CAST(n_lines AS INT) AS n_lines,
       CAST(len(keep) AS INT) AS n_kept,
       array_to_string(keep, ' ') AS clean_text
FROM kept WHERE len(keep) > 0
"""


def q_text_pii_redact(spark, sf_dir):
    """PII redaction over a corpus with deterministically injected
    emails + E.164-shaped phones; emits redacted text + match counts.
    Single regexp pass, engine-portable patterns (no lookaround) —
    pure codegen, zero shuffles."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    pii = F.concat(
        F.col("text"),
        F.lit(" contact user"), (F.col("doc_id") % 97).cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com or call +"),
        (1 + F.col("doc_id") % 9).cast("string"), F.lit(" "),
        F.lpad((100 + F.col("doc_id") % 900).cast("string"), 3, "0"),
        F.lit(" "),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"))
    src = d.select("doc_id", pii.alias("text"))
    ex = TS.redact_pii_exprs(F.col("text"))
    return src.select("doc_id", ex["redacted"].alias("redacted"),
                      ex["n_emails"].alias("n_emails"),
                      ex["n_phones"].alias("n_phones"))


ORACLE_TEXT_PII_REDACT = rf"""
WITH pii AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id % 97 AS VARCHAR)
              || '@mail' || CAST(doc_id % 7 AS VARCHAR)
              || '.example.com or call +'
              || CAST(1 + doc_id % 9 AS VARCHAR) || ' '
              || lpad(CAST(100 + doc_id % 900 AS VARCHAR), 3, '0') || ' '
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
  FROM documents WHERE text IS NOT NULL
)
SELECT doc_id,
       regexp_replace(
         regexp_replace(text, '{TS.PHONE_PAT}', '<PHONE>', 'g'),
         '{TS.EMAIL_PAT}', '<EMAIL>', 'g') AS redacted,
       CAST(len(regexp_extract_all(text, '{TS.EMAIL_PAT}')) AS INT)
         AS n_emails,
       CAST(len(regexp_extract_all(text, '{TS.PHONE_PAT}')) AS INT)
         AS n_phones
FROM pii
"""


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


# Five robots.txt shapes shared verbatim by the Spark query and the DuckDB
# oracle (single source, no drift). They exercise: longest-match
# allow-over-disallow, specific-group-over-star precedence, multi-agent
# groups + CRLF + comments + '*'/'$' wildcards, space-before-colon +
# empty-Disallow no-op, and a missing robots.txt.
_ROBOTS_SHAPES = [
    "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n",
    "User-agent: genesis\nDisallow: /admin/\n\nUser-agent: *\nDisallow: /\n",
    "# blanket\r\nUser-agent: foo\r\nUser-agent: genesis\r\n"
    "Disallow: /*.zip$\r\nAllow: /\r\n",
    "User-agent: *\nDisallow :\nDisallow: /files/\n",
    "",
]


def _sql_textlit(s: str) -> str:
    """Robots text as a DuckDB expression (newlines via chr() so the oracle
    string survives any whitespace normalization)."""
    return ("'" + s.replace("'", "''")
            .replace("\r", "' || chr(13) || '")
            .replace("\n", "' || chr(10) || '") + "'")


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


_ROBOTS_SHAPE_SQL = " ".join(
    f"WHEN {i} THEN {_sql_textlit(s)}" for i, s in enumerate(_ROBOTS_SHAPES))

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


_STREAM_SEQ = 0


def q_stream_dedup(spark, sf_dir):
    """ST2/D1 streaming: the custom stateful URL-seen operator
    (applyInPandasWithState) run as a real Structured Streaming query —
    4 parquet files, one micro-batch each, duplicates spanning batches
    suppressed by the state store. The final emitted set is exactly the
    distinct (host, url) set, which is what the DuckDB oracle checks.

    Scale caveat (ADVICE r2): the operator is a lossy PREFILTER by
    construction — an xxh64 collision between distinct URLs of one host
    drops a URL (~n^2/2^65 per host), and ``max_state_per_host``
    insertion-order eviction re-admits old URLs once a host exceeds the
    cap. The oracle match holds because the fixture sits far below both
    bounds; at scale the exact frontier anti-join downstream remains the
    source of truth (streaming/pipeline.py:125-136)."""
    import os
    import tempfile

    from genesis_spark.streaming.pipeline import dedup_stream

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_dedup_{_STREAM_SEQ}"
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    links = d.select(
        F.concat(F.lit("h"), (k % 20).cast("string")).alias("host_key"),
        F.concat(F.lit("http://h"), (k % 20).cast("string"),
                 F.lit(".onion/p"), (k % 100).cast("string")).alias("url"))
    tmp = tempfile.mkdtemp(prefix="gs_stream_")
    src, ck = os.path.join(tmp, "links"), os.path.join(tmp, "ckpt")
    links.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("host_key string, url string")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (dedup_stream(stream).writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def q_stream_windowed(spark, sf_dir):
    """Stream==batch equivalence for the windowed metrics aggregation:
    the events table replayed as 4 micro-batches through a Structured
    Streaming 1-hour tumbling-window agg (state store accumulates windows
    across batches, complete output); the oracle is the plain batch GROUP
    BY — the streaming state machinery must reproduce it exactly. The
    watermark *drop* semantic is covered separately by
    test_metrics_stream_watermark_drops_late_rows (append mode needs
    event-time progress, which a finite replay can't finalize)."""
    import os
    import tempfile

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_win_{_STREAM_SEQ}"
    ev = _t(spark, sf_dir, "events").select("ts", "event_type", "value")
    tmp = tempfile.mkdtemp(prefix="gs_streamw_")
    src, ck = os.path.join(tmp, "events"), os.path.join(tmp, "ckpt")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("ts timestamp_ntz, event_type string, value double")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    agg = (stream.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"))
           .select(F.col("w.start").alias("window_start"), "event_type",
                   "n_events", "total_value"))
    q = (agg.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


ORACLE_STREAM_WINDOWED = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q_corpus_sample_stratified(spark, sf_dir):
    """Stratified EXACT-k sampling: exactly min(k, n) docs per source,
    chosen by deterministic md5 order (the uniform-hash trick the
    weighted sampler uses, but rank-based so every stratum hits its
    quota exactly — quota sampling vs corpus_sample_weighted's
    probability sampling). One window pass per stratum."""
    k = 20
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.concat_ws("|", "source", F.col("doc_id").cast("string"))),
        "doc_id")
    return (docs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("doc_id", "source", F.col("rk").cast("long")
                    .alias("rk")))


ORACLE_CORPUS_SAMPLE_STRATIFIED = """
SELECT doc_id, source, rk FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source
            ORDER BY md5(source || '|' || doc_id), doc_id) AS rk
  FROM documents)
WHERE rk <= 20
"""


def q_events_anomaly(spark, sf_dir):
    """Per-event-type z-score outlier detection (monitoring/analytics
    family): events whose value sits >= 2 sample-stddevs from their
    type's mean. One map-side-combinable groupBy for the per-type
    moments (tiny — broadcast back), one zero-shuffle scoring map;
    the filter applies to the ROUNDED z (4 dp) so both engines make
    the same boundary call."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type",
                                            "value")
    stats = (ev.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_samp("value").alias("sd")))
    return (ev.join(F.broadcast(stats), "event_type")
            .withColumn("z", F.round((F.col("value") - F.col("mu")) /
                                     F.col("sd"), 4))
            .filter(F.abs(F.col("z")) >= 2.0)
            .select("event_id", "event_type",
                    F.round("value", 4).alias("value"), "z"))


ORACLE_EVENTS_ANOMALY = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY 1
)
SELECT event_id, e.event_type, round(value, 4) AS value,
       round((value - mu) / sd, 4) AS z
FROM events e JOIN stats USING (event_type)
WHERE abs(round((value - mu) / sd, 4)) >= 2.0
"""


def q_stream_enrich(spark, sf_dir):
    """Stream-STATIC join (the 4th streaming capability after stateful
    dedup, windowed agg, and stateful sessionization): the events stream
    replayed as 4 micro-batches is enriched per micro-batch against the
    static customer dim (broadcast — the static side is re-planned into
    each incremental batch), then windowed per market segment. Must equal
    the plain batch join+GROUP BY."""
    import os
    import tempfile

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_enrich_{_STREAM_SEQ}"
    ev = _t(spark, sf_dir, "events").select("ts", "user_id", "value")
    cust = _t(spark, sf_dir, "customer").select(
        (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment")
    tmp = tempfile.mkdtemp(prefix="gs_streame_")
    src, ck = os.path.join(tmp, "events"), os.path.join(tmp, "ckpt")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("ts timestamp_ntz, user_id long, value double")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    agg = (stream.join(F.broadcast(cust), "user_id")
           .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"))
           .select(F.col("w.start").alias("window_start"), "c_mktsegment",
                   "n_events", "total_value"))
    q = (agg.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


ORACLE_STREAM_ENRICH = """
SELECT date_trunc('hour', e.ts) AS window_start, c.c_mktsegment,
       count(*) AS n_events, round(sum(e.value), 2) AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey - 1
GROUP BY 1, 2
"""


ORACLE_STREAM_DEDUP = """
SELECT DISTINCT 'h' || (doc_id % 20) AS host_key,
       'http://h' || (doc_id % 20) || '.onion/p' || (doc_id % 100) AS url
FROM documents
"""


# ---------------------------------------------------------------------------
# relational / events breadth
# ---------------------------------------------------------------------------

def q_events_windowed(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                      "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value")))


ORACLE_EVENTS_WINDOWED = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (6-h inactivity closes a session): the
    classic event-analytics operator — one shuffle on user_id, per-user
    window lag + running sum, then per-session rollup. No driver loop, no
    UDF; at 10^10 events this is a single hash-partitioned window pass."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ won't cast straight to long on Spark 4; go through
    # timestamp (session tz is pinned UTC) — differences cancel any shift
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    sess = (ev.withColumn("_new",
                          F.when(gap.isNull() | (gap > 21600), 1).otherwise(0))
            .withColumn("session_no", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.round(F.sum("value"), 2).alias("total_value")))


ORACLE_EVENTS_SESSIONIZE = """
WITH o AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 21600
            THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_no
"""


def q_text_tfidf_topk(spark, sf_dir):
    """Top-3 TF-IDF terms per document: tokenize (the token-count regex's
    word class), term frequency per (doc, term), document frequency per
    term, idf = ln(N/df), rank by (tfidf DESC, term ASC). Two shuffles
    (doc-term agg, term df) + a broadcast-sized join back — no UDF."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    terms = (docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+"))
        .alias("term"))
        .filter(F.length("term") >= 3))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (tf.join(df, "term")
              .withColumn("tfidf",
                          F.round(F.col("tf") *
                                  F.log(F.lit(float(n_docs)) / F.col("df")),
                                  4)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .select("doc_id", "term", "tfidf", "rank"))


ORACLE_TEXT_TFIDF_TOPK = """
WITH toks AS (
  SELECT doc_id, t.term FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 3
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, CAST(tf.tf AS BIGINT) AS tf,
         CAST(df.df AS BIGINT) AS df,
         round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
SELECT doc_id, term, tfidf, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored) WHERE rank <= 3
"""


def q_corpus_split(spark, sf_dir):
    """Reproducible train/val/test assignment — the hash-split protocol a
    training pipeline needs instead of RNG sampling (re-runs and late-
    arriving shards must land in the SAME split): bucket = md5 of a salted
    doc key mod 100 -> 90/5/5. Pure function of doc_id, so the oracle
    reproduces the exact assignment; output is the (lang, split) census
    plus a membership checksum (sum of doc_ids) so a single swapped doc
    flips the hash compare."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("split-v1|"), F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 100
    split = (F.when(bucket < 90, "train")
             .when(bucket < 95, "val").otherwise("test"))
    return (d.withColumn("split", split)
            .groupBy("lang", "split")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").alias("id_checksum")))


ORACLE_CORPUS_SPLIT = """
WITH b AS (
  SELECT lang, doc_id,
         ('0x' || substr(md5('split-v1|' || doc_id), 1, 8))::BIGINT % 100
           AS bucket
  FROM documents),
s AS (
  SELECT lang, doc_id,
         CASE WHEN bucket < 90 THEN 'train'
              WHEN bucket < 95 THEN 'val' ELSE 'test' END AS split
  FROM b)
SELECT lang, split, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM s GROUP BY lang, split
"""


def q_host_pagerank(spark, sf_dir):
    """Host-graph PageRank — the classic frontier-prioritization signal
    (which hosts deserve crawl budget) — 3 unrolled power iterations over
    the orders-derived host link graph. All arithmetic is EXACT integer
    (rank in 1e-9 units, ``DIV`` for every division) so Spark and DuckDB
    agree bit-for-bit: float summation order would differ between engines.
    Dangling hosts keep the 0.15 base mass (simplified variant, mirrored
    in the oracle). 3 iterations unroll as 6 joins + 3 aggs — small
    enough that no lineage cut is needed; the iterative-loop form with
    localCheckpoint lives in operators/cc.py's pattern."""
    S, BASE = 1_000_000_000, 150_000_000
    # no persist: the unrolled plan repeats the edges subplan, and
    # whole-plan execution dedupes it via ReusedExchange — a persist here
    # would either leak cache blocks or (if unpersisted at build time)
    # never exist during execution
    edges = _host_edges50(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    ranks = nodes.withColumn("rank", F.lit(S).cast("long"))
    for _ in range(3):
        contrib = (edges
                   .join(ranks.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("rank DIV outdeg").alias("share"))
                   .groupBy("node")
                   .agg(F.sum("share").alias("c")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(BASE) +
                          F.expr("(85 * coalesce(c, 0)) DIV 100"))
                         .cast("long").alias("rank")))
    return ranks.select(F.col("node").alias("host_key"),
                        F.col("rank").alias("pagerank"))


# The e CTE must stay textually identical to _HOST_E50_SQL (defined later
# in the module, interpolated into ORACLE_HOST_TRUSTRANK) — both rank rows
# grade the SAME graph.
ORACLE_HOST_PAGERANK = """
WITH e AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS src,
                  'h' || (o_custkey % 50) AS dst
  FROM orders
  WHERE 'h' || (o_orderkey % 50) <> 'h' || (o_custkey % 50)),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank FROM n),
c1 AS (SELECT e.dst AS node, sum(r0.rank // deg.outdeg) AS c
       FROM e JOIN r0 ON r0.node = e.src JOIN deg ON deg.src = e.src
       GROUP BY e.dst),
r1 AS (SELECT n.node,
              CAST(150000000 + (85 * coalesce(c1.c, 0)) // 100 AS BIGINT)
                AS rank
       FROM n LEFT JOIN c1 ON c1.node = n.node),
c2 AS (SELECT e.dst AS node, sum(r1.rank // deg.outdeg) AS c
       FROM e JOIN r1 ON r1.node = e.src JOIN deg ON deg.src = e.src
       GROUP BY e.dst),
r2 AS (SELECT n.node,
              CAST(150000000 + (85 * coalesce(c2.c, 0)) // 100 AS BIGINT)
                AS rank
       FROM n LEFT JOIN c2 ON c2.node = n.node),
c3 AS (SELECT e.dst AS node, sum(r2.rank // deg.outdeg) AS c
       FROM e JOIN r2 ON r2.node = e.src JOIN deg ON deg.src = e.src
       GROUP BY e.dst),
r3 AS (SELECT n.node,
              CAST(150000000 + (85 * coalesce(c3.c, 0)) // 100 AS BIGINT)
                AS rank
       FROM n LEFT JOIN c3 ON c3.node = n.node)
SELECT node AS host_key, rank AS pagerank FROM r3
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


from genesis_spark.operators.sketches import HLL_ALPHA as _HLL_ALPHA  # noqa: E402
from genesis_spark.operators.sketches import HLL_M as _HLL_M  # noqa: E402

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


from genesis_spark.operators.sketches import CMS_W as _CMS_W  # noqa: E402

ORACLE_URL_CMS = f"""
WITH hits AS (
  SELECT 'h' || (CASE WHEN o_orderkey % 4 < 2 THEN o_orderkey % 7
                      ELSE o_orderkey % 1000 + 100 END) AS host_key
  FROM orders),
js AS (SELECT unnest([0, 1, 2, 3]) AS j),
pairs AS (
  SELECT host_key, j,
         CAST(concat('0x', substr(md5(concat(j, ':', host_key)), 1, 8))
              AS BIGINT) % {_CMS_W} AS col
  FROM hits CROSS JOIN js),
counts AS (SELECT j, col, count(*) AS cnt FROM pairs GROUP BY 1, 2),
hosts AS (SELECT DISTINCT host_key FROM hits),
probe AS (
  SELECT host_key, j,
         CAST(concat('0x', substr(md5(concat(j, ':', host_key)), 1, 8))
              AS BIGINT) % {_CMS_W} AS col
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


def q_frontier_zorder(spark, sf_dir):
    """Z-order clustering key for the frontier's Iceberg layout
    (operators.zorder): interleave (host_bucket, time_bucket) bits so
    files pruned tightly by BOTH the per-host read (politeness,
    recrawl) and the per-time wave scan. host_bucket = first 16 md5
    bits of the host (engine-portable stand-in for the xxhash64 bucket);
    time_bucket = install-sequence low 16 bits. Pure integer codegen —
    the oracle restates the identical interleave formula."""
    from genesis_spark.operators.zorder import zorder_key

    key = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (key % 499).cast("string"))
    rows = (_t(spark, sf_dir, "orders").select(
        key.alias("id"),
        F.conv(F.substring(F.md5(host), 1, 4), 16, 10).cast("long")
        .alias("host_bucket"),
        (key % 65536).cast("long").alias("time_bucket")))
    return rows.select(
        "id", "host_bucket", "time_bucket",
        zorder_key(F.col("host_bucket"), F.col("time_bucket"))
        .alias("zkey"))


from genesis_spark.operators.zorder import zorder_sql_expr as _zexpr  # noqa: E402

ORACLE_FRONTIER_ZORDER = f"""
WITH rows_ AS (
  SELECT o_orderkey AS id,
         CAST(concat('0x', substr(md5('h' || (o_orderkey % 499)), 1, 4))
              AS BIGINT) AS host_bucket,
         o_orderkey % 65536 AS time_bucket
  FROM orders)
SELECT id, host_bucket, time_bucket,
       {_zexpr("host_bucket", "time_bucket")} AS zkey
FROM rows_
"""


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


def q_frontier_change_rate(spark, sf_dir):
    """Adaptive recrawl scheduling (crawler/freshness.py): per-URL
    Poisson change-rate from fetch history via the Cho/Garcia-Molina
    bias-corrected estimator -ln((n-x+0.5)/(n+0.5)), revisit interval =
    clamp(ceil(1/rate)) with the division rounded 6 dp before the ceil
    so both engines make the same discrete call. One
    map-side-combinable groupBy, zero UDFs."""
    from genesis_spark.crawler.freshness import change_rate_schedule

    hist = _t(spark, sf_dir, "lineitem").select(
        F.concat(F.lit("http://h"),
                 (F.col("l_orderkey") % 50).cast("string"),
                 F.lit(".onion/p"),
                 (F.col("l_partkey") % 200).cast("string")).alias("url"),
        ((F.col("l_suppkey") + F.col("l_linenumber")) % 3 == 0)
        .cast("int").alias("changed"),
        (F.col("l_linenumber") + F.col("l_orderkey") % 7).alias("round"))
    return change_rate_schedule(hist, ["url"])


ORACLE_FRONTIER_CHANGE_RATE = """
WITH h AS (
  SELECT 'http://h' || (l_orderkey % 50) || '.onion/p' || (l_partkey % 200)
           AS url,
         CASE WHEN (l_suppkey + l_linenumber) % 3 = 0 THEN 1 ELSE 0 END
           AS changed,
         l_linenumber + (l_orderkey % 7) AS round
  FROM lineitem),
a AS (
  SELECT url, count(*) AS n_fetches,
         CAST(sum(changed) AS BIGINT) AS n_changes,
         max(round) AS last_round
  FROM h GROUP BY 1),
r AS (
  SELECT *, round(-ln((n_fetches - n_changes + 0.5) / (n_fetches + 0.5)), 6)
           AS change_rate
  FROM a),
i AS (
  SELECT *, CASE WHEN change_rate <= 0 THEN 64
                 ELSE least(64, greatest(1,
                      CAST(ceil(round(1.0 / change_rate, 6)) AS INT))) END
           AS next_interval
  FROM r)
SELECT url, n_fetches, n_changes, change_rate, next_interval,
       CAST(last_round + next_interval AS BIGINT) AS next_due
FROM i
"""


def q_events_quantile_sketch(spark, sf_dir):
    """Histogram quantile sketch (operators.sketches.hist_bins/
    hist_quantile) — the third mergeable sketch (sum-merge bins) next
    to HLL and CMS, for the p50/p95 a 10^10-row metrics table can't
    afford exactly: fixed [0,512)x256 binning (deterministic, unlike
    KLL/t-digest) + linear interpolation inside the crossing bin. The
    exact-percentile row (events_quantiles) stays the accuracy
    reference; this row's oracle replays the sketch arithmetic
    bit-for-bit."""
    from genesis_spark.operators.sketches import hist_bins, hist_quantile

    ev = _t(spark, sf_dir, "events")
    bins = hist_bins(ev, ["event_type"], "value", 0.0, 512.0, 256)
    p50 = (hist_quantile(bins, ["event_type"], 0.5, 0.0, 512.0, 256)
           .withColumnRenamed("quantile_est", "p50_est"))
    p95 = (hist_quantile(bins, ["event_type"], 0.95, 0.0, 512.0, 256)
           .withColumnRenamed("quantile_est", "p95_est"))
    n = ev.groupBy("event_type").agg(F.count("value").alias("n_events"))
    return n.join(p50, "event_type").join(p95, "event_type")


ORACLE_EVENTS_QSKETCH = """
WITH b AS (
  SELECT event_type,
         least(255, greatest(0, CAST(floor(value / 2.0) AS INT))) AS bin,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
c AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM b),
q50 AS (
  SELECT event_type,
         min_by(bin, bin) AS bin, min_by(cnt, bin) AS cnt,
         min_by(cum, bin) AS cum, min(total) AS total
  FROM c WHERE cum >= round(0.5 * total, 4) GROUP BY 1),
q95 AS (
  SELECT event_type,
         min_by(bin, bin) AS bin, min_by(cnt, bin) AS cnt,
         min_by(cum, bin) AS cum, min(total) AS total
  FROM c WHERE cum >= round(0.95::DOUBLE * total, 4) GROUP BY 1),
n AS (SELECT event_type, count(value) AS n_events FROM events GROUP BY 1)
SELECT n.event_type, n.n_events,
       round((q50.bin + (round(0.5 * q50.total, 4) - (q50.cum - q50.cnt))
              / q50.cnt) * 2.0, 4) AS p50_est,
       round((q95.bin + (round(0.95::DOUBLE * q95.total, 4) - (q95.cum - q95.cnt))
              / q95.cnt) * 2.0, 4) AS p95_est
FROM n JOIN q50 USING (event_type) JOIN q95 USING (event_type)
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


def q_events_asof_join(spark, sf_dir):
    """As-of join (brief's custom-operator list): attach to each purchase
    the user's most recent signup at-or-before it. Spark lacks a native
    ASOF JOIN; the scalable form is the union + carry-forward window —
    tag both streams, one shuffle on user_id, sort by (ts, side) so an
    equal-timestamp signup lands before the purchase (inclusive >=,
    matching DuckDB ASOF semantics), then last(ignorenulls) carries the
    latest signup_id forward. No range join, no broadcast, no per-row
    Python; at 10^10 events this is one hash-partitioned sort pass."""
    ev = _t(spark, sf_dir, "events")
    sig = (ev.filter(F.col("event_type") == "signup")
           .select("user_id", "ts", F.col("event_id").alias("signup_id"),
                   F.lit(None).cast("long").alias("event_id"),
                   F.lit(0).alias("_is_p")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", "ts",
                   F.lit(None).cast("long").alias("signup_id"),
                   "event_id", F.lit(1).alias("_is_p")))
    w = (Window.partitionBy("user_id").orderBy("ts", "_is_p")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = sig.unionByName(pur).withColumn(
        "signup_id", F.last("signup_id", ignorenulls=True).over(w))
    return (carried.filter(F.col("_is_p") == 1)
            .select("event_id", "user_id", "ts", "signup_id"))


ORACLE_EVENTS_ASOF = """
SELECT p.event_id, p.user_id, p.ts, s.event_id AS signup_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def q_events_range_join(spark, sf_dir):
    """Range join (brief's custom-operator list): purchases falling in the
    7-day window after each signup of the same user. A naive theta join
    (``p.ts BETWEEN s.ts AND s.ts+7d``) is a cross-product per user; the
    scale form BINS both sides to day buckets — each signup explodes to
    its 8 covered days, purchases key by their day — so the join is a
    plain (user_id, day) equi-join (hash-shuffled, AQE-skew-splittable)
    followed by the exact range filter. Bucket fan-out is the window
    length in days, a constant. Output: per-signup purchase count and
    value within the window."""
    ev = _t(spark, sf_dir, "events")
    sig = (ev.filter(F.col("event_type") == "signup")
           .select("user_id", F.col("event_id").alias("signup_id"),
                   F.col("ts").alias("s_ts")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", F.col("ts").alias("p_ts"), "value",
                   F.to_date("ts").alias("day")))
    sig_days = sig.withColumn(
        "day", F.explode(F.sequence(
            F.to_date("s_ts"), F.date_add(F.to_date("s_ts"), 7))))
    hits = (sig_days.join(pur, ["user_id", "day"])
            .filter((F.col("p_ts") >= F.col("s_ts")) &
                    (F.col("p_ts") <= F.col("s_ts") +
                     F.expr("INTERVAL 7 DAYS"))))
    return (hits.groupBy("signup_id")
            .agg(F.count("*").alias("n_purchases"),
                 F.round(F.sum("value"), 2).alias("window_value")))


ORACLE_EVENTS_RANGE_JOIN = """
SELECT s.event_id AS signup_id, count(*) AS n_purchases,
       round(sum(p.value), 2) AS window_value
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = s.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
GROUP BY s.event_id
"""


def q_events_quantiles(spark, sf_dir):
    """Exact per-type value percentiles (linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the definition)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
                 F.count("*").alias("n_events")))


ORACLE_EVENTS_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_events_rollup(spark, sf_dir):
    """ROLLUP (day, event_type): per-day-per-type, per-day subtotal, and
    grand total in one pass — Spark's partial-aggregate rollup matches the
    ANSI GROUPING SETS semantics DuckDB executes."""
    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    agg = (ev.rollup("day", "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value")))
    # rollup NULL keys -> sentinel so the hash compare never sees mixed
    # None/str sort keys (no real day/type can collide with '<all>')
    return agg.select(
        F.coalesce(F.col("day").cast("string"), F.lit("<all>")).alias("day"),
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        "n_events", "total_value")


ORACLE_EVENTS_ROLLUP = """
SELECT coalesce(CAST(day AS VARCHAR), '<all>') AS day,
       coalesce(event_type, '<all>') AS event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM (SELECT CAST(ts AS DATE) AS day, event_type, value FROM events)
GROUP BY ROLLUP (day, event_type)
"""


def q_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 2)
                 .alias("sum_disc_price"),
                 F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
                 F.count("*").alias("count_order")))


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
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


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_spans_interleave(spark, sf_dir):
    """The input_hint table itself: synthesize the interleaved text+media
    span table deterministically from ``documents`` and emit the exploded
    span sequence — the driver's value hash over (doc_id, offset, kind,
    text, media_ref) IS a span-sequence-equality check per doc_id."""
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return explode_spans(interleaved_docs(docs))


ORACLE_SPANS_INTERLEAVE = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)},
         {'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}]
      ELSE
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
)
SELECT doc_id, CAST(off AS INT) AS offset, s.kind AS kind,
       s.text AS text, s.media_ref AS media_ref
FROM ex
"""


def q_spans_reconstruct(spark, sf_dir):
    """Round-trip over the interleaved table: rebuild each doc's text from
    its section spans, collect the media manifest, and verify losslessness
    against the source — the invariant that makes the span table a storage
    format, not a view. Pure codegen + one broadcast-able join back."""
    from genesis_spark.sources.interleaved import (interleaved_docs,
                                                   reconstruct_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rt = reconstruct_docs(interleaved_docs(docs))
    src = docs.filter(F.col("text").isNotNull()).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("text").alias("src_text"))
    return (rt.join(src, "doc_id")
            .select("doc_id", "n_sections", "n_media",
                    (F.col("text_rt") == F.col("src_text"))
                    .alias("roundtrip_ok"),
                    F.array_join("media_refs", ",").alias("media_csv")))


ORACLE_SPANS_RECONSTRUCT = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, text,
         string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, text, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
)
SELECT doc_id,
       CAST(len(chunks) AS INT) AS n_sections,
       CAST(len(chunks) // 3 AS INT) AS n_media,
       array_to_string(chunks, ' ') = text AS roundtrip_ok,
       coalesce(array_to_string(list_transform(range(1, len(chunks) // 3 + 1),
                                               k -> doc_id || '/img/' ||
                                                    CAST(k AS VARCHAR)), ','),
                '') AS media_csv
FROM ch
"""


def q_spans_media_context(spark, sf_dir):
    """Image-caption pairing: every media span with the text of its nearest
    preceding section span (the caption candidate a multimodal training
    pipeline attaches to the image). One window pass per doc."""
    from genesis_spark.sources.interleaved import (interleaved_docs,
                                                   media_with_context)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return media_with_context(interleaved_docs(docs))


ORACLE_SPANS_MEDIA_CONTEXT = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)},
         {'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}]
      ELSE
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
), ctx AS (
  SELECT doc_id, CAST(off AS INT) AS offset, s.kind AS kind,
         s.media_ref AS media_ref,
         last_value(s.text IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context
  FROM ex
)
SELECT doc_id, "offset", media_ref, context
FROM ctx WHERE kind <> 'section'
"""


def q_media_decode(spark, sf_dir):
    """End-to-end multimodal decode through the driver gate: one
    mapInPandas encodes a REAL format header (png/jpeg/gif/webp cycling on
    doc_id, dims pure doc_id arithmetic) per document; a second
    (``extract_media_meta`` + ``decode_auto``) parses the bytes back.
    The oracle states the expected (width, height, format) in plain SQL —
    so a value-hash match proves the Arrow binary plumbing and all four
    real header parsers round-trip exactly. Two Arrow-batched passes, no
    shuffle; at 100 TB this is the decode stage's production shape."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.encode_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    meta = MM.extract_media_meta(blobs, decode_fn=MM.decode_auto)
    return meta.select("doc_id",
                       F.col("media_meta.width").alias("width"),
                       F.col("media_meta.height").alias("height"),
                       F.col("media_meta.format").alias("format"),
                       F.col("media_meta.ok").alias("ok"))


ORACLE_MEDIA_DECODE = """
SELECT doc_id,
       CAST(16 + doc_id % 64 AS INT) AS width,
       CAST(16 + (doc_id // 7) % 64 AS INT) AS height,
       CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                       WHEN 2 THEN 'gif' ELSE 'webp' END AS format,
       TRUE AS ok
FROM documents
"""


# ---------------------------------------------------------------------------
# round-3 block-4 additions: span-level corpus ops, LM filter, quantization,
# recrawl scheduling, funnel analytics
# ---------------------------------------------------------------------------

# Shared DuckDB fragment: the interleaved span table exploded to per-span
# rows (doc_id, off, kind + struct s) — the same synthesis rule as
# ORACLE_SPANS_INTERLEAVE (8-word sections, image after every 3rd).
_SPANS_EX_SQL = """base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)},
         {'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}]
      ELSE
        [{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
)"""


def q_spans_boilerplate(spark, sf_dir):
    """CCNet/RefinedWeb-style cross-document boilerplate removal over the
    interleaved span table: a section text recurring in >= 2 distinct docs
    is site boilerplate and is dropped from every doc; docs are rebuilt
    from surviving sections. df-count keyed on md5 digests (wide text
    never shuffles), boilerplate set broadcast (high-df tail is tiny),
    flag-then-aggregate so fully-boilerplate docs still emit a row."""
    from genesis_spark.operators.lines import drop_boilerplate
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    rows = explode_spans(interleaved_docs(docs))
    return drop_boilerplate(rows, min_df=2)


ORACLE_SPANS_BOILERPLATE = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), sec AS (
  SELECT doc_id, unnest(chunks) AS chunk,
         generate_subscripts(chunks, 1) - 1 AS off
  FROM ch
), bp AS (
  SELECT chunk FROM sec GROUP BY chunk HAVING count(DISTINCT doc_id) >= 2
), fl AS (
  SELECT s.doc_id, s.chunk, s.off, b.chunk IS NOT NULL AS is_bp
  FROM sec s LEFT JOIN bp b ON s.chunk = b.chunk
)
SELECT doc_id, count(*) AS n_sections,
       CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       coalesce(array_to_string(
         list(chunk ORDER BY off) FILTER (WHERE NOT is_bp), ' '), '')
         AS text_clean
FROM fl GROUP BY doc_id
"""


def q_spans_pack_multimodal(spark, sf_dir):
    """Multimodal sequence packing over the interleaved table: spans of a
    source stream concatenated in (doc_id, offset) order and cut into
    512-token blocks, text spans costing their token count and each image
    span a fixed 64-token placeholder (the Flamingo/MM1 packing recipe).
    Two-level prefix scan — per-doc sums, tiny doc-level prefix window,
    broadcast base offsets, intra-doc window — so no window partition ever
    exceeds one document's spans (operators.pack.pack_spans)."""
    from genesis_spark.operators.pack import pack_spans
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    d = _t(spark, sf_dir, "documents")
    rows = (explode_spans(interleaved_docs(d.select("doc_id", "text")))
            .join(d.select(F.col("doc_id").cast("string").alias("doc_id"),
                           "source"), "doc_id"))
    return pack_spans(rows, seq_len=512, media_tokens=64,
                      doc_ord=F.col("doc_id").cast("bigint"))


ORACLE_SPANS_PACK_MULTIMODAL = f"""
WITH {_SPANS_EX_SQL},
cost AS (
  SELECT e.doc_id, e.off, e.s.kind AS kind,
         CAST(CASE WHEN e.s.media_ref IS NOT NULL THEN 64
              ELSE len(string_split(e.s.text, ' ')) END AS BIGINT) AS cost,
         d.source AS source
  FROM ex e JOIN documents d ON e.doc_id = CAST(d.doc_id AS VARCHAR)
), o AS (
  SELECT *, CAST(sum(cost) OVER (
      PARTITION BY source
      ORDER BY CAST(doc_id AS BIGINT), off
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cost AS BIGINT)
    AS tok_offset
  FROM cost
)
SELECT doc_id, CAST(off AS INT) AS offset, kind, cost, tok_offset,
       tok_offset // 512 AS block_first,
       (tok_offset + cost - 1) // 512 AS block_last
FROM o
"""


def q_spans_media_dedup(spark, sf_dir):
    """Cross-document media dedup keyed by caption context (nearest
    preceding section text): the multimodal analogue of exact dedup —
    site-wide repeated assets collapse to one canonical copy per context
    cluster, earliest (doc_id, offset) wins. Wide captions reduced to md5
    digests before the groupBy; min-of-struct canonical pick is map-side
    combinable (sources.interleaved.dedup_media_by_context)."""
    from genesis_spark.sources.interleaved import (dedup_media_by_context,
                                                   interleaved_docs)
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_media_by_context(
        interleaved_docs(docs), doc_ord=F.col("doc_id").cast("bigint"))


ORACLE_SPANS_MEDIA_DEDUP = f"""
WITH {_SPANS_EX_SQL},
ctx AS (
  SELECT doc_id, CAST(off AS INT) AS offset, s.kind AS kind,
         s.media_ref AS media_ref,
         last_value(s.text IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context
  FROM ex
), med AS (
  SELECT md5(coalesce(context, '')) AS content_key,
         CAST(doc_id AS BIGINT) AS d, "offset" AS o, media_ref AS r
  FROM ctx WHERE media_ref IS NOT NULL AND kind <> 'link'
), rk AS (
  SELECT *, row_number() OVER (PARTITION BY content_key ORDER BY d, o) AS rn,
         count(*) OVER (PARTITION BY content_key) AS n
  FROM med
)
SELECT content_key, n AS n_copies, CAST(d AS VARCHAR) AS canonical_doc,
       o AS canonical_offset, r AS canonical_ref
FROM rk WHERE rn = 1
"""


def q_text_unigram_lm(spark, sf_dir):
    """Corpus-trained unigram LM surprisal per doc — the CCNet-style LM
    quality filter with the corpus itself as the training set. Mean
    negative log-prob in nats/token, rounded 4dp (summation-order-proof);
    vocab tf is one map-side-combinable groupBy, the global total is one
    broadcast row, the log-prob join-back broadcasts the Heaps-law-small
    vocab side (operators.textstats.unigram_lm_score)."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    return TS.unigram_lm_score(d, round_dp=4)


ORACLE_TEXT_UNIGRAM_LM = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), v AS (
  SELECT tok, count(*) AS tf FROM tok GROUP BY tok
), lp AS (
  SELECT tok, ln(CAST(tf AS DOUBLE)
                 / (SELECT CAST(sum(tf) AS DOUBLE) FROM v)) AS lp
  FROM v
)
SELECT t.doc_id, count(*) AS n_tokens, round(avg(-lp), 4) AS nll
FROM tok t JOIN lp USING (tok) GROUP BY t.doc_id
"""


def q_text_bigram_lm(spark, sf_dir):
    """Corpus-trained bigram LM surprisal per doc: add-0.5-smoothed
    P(w2|w1) over one bigram explode + two groupBys; catches improbable
    TRANSITIONS a unigram filter can't (operators.textstats
    .bigram_lm_score). Docs with < 2 tokens drop out on both engines."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    return TS.bigram_lm_score(d, k=0.5, round_dp=4)


ORACLE_TEXT_BIGRAM_LM = """
WITH tok AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL
), bg AS (
  SELECT doc_id, w[i + 1] AS w1, w[i + 2] AS w2
  FROM tok, unnest(range(len(w) - 1)) u(i)
  WHERE len(w) >= 2
), c12 AS (
  SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2
), c1 AS (
  SELECT w1, count(*) AS c1 FROM bg GROUP BY 1
), v AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS tok
        FROM documents WHERE text IS NOT NULL)
)
SELECT bg.doc_id, count(*) AS n_bigrams,
       round(avg(-ln((c12.c12 + 0.5) / (c1.c1 + 0.5 * v.v))), 4) AS nll2
FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
GROUP BY bg.doc_id
"""


def q_embeddings_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column (the SQ8 storage
    path of large ANN indexes): per-dim (min, max) from one
    posexplode+groupBy pass (partial-agg shuffle of dim x partitions
    rows), folded back as array literals so the quantize pass is a pure
    zero-shuffle map. floor-based code assignment is bit-identical across
    engines; emits exact integer per-vector summaries
    (operators.similarity.quantize_int8)."""
    return SIM.quantize_int8(_t(spark, sf_dir, "embeddings"))


ORACLE_EMBEDDINGS_QUANTIZE = """
WITH st AS (
  SELECT pos, min(CAST(x AS DOUBLE)) AS mn, max(CAST(x AS DOUBLE)) AS mx
  FROM (SELECT unnest(embedding) AS x,
               generate_subscripts(embedding, 1) AS pos
        FROM embeddings)
  GROUP BY pos
), mm AS (
  SELECT list(mn ORDER BY pos) AS m, list(mx - mn ORDER BY pos) AS s
  FROM st
), q AS (
  SELECT vec_id, list_transform(
    range(1, len(embedding) + 1),
    i -> CASE WHEN mm.s[i] > 0
         THEN CAST(floor((CAST(embedding[i] AS DOUBLE) - mm.m[i])
                         * 255.0 / mm.s[i]) AS INT) - 128
         ELSE -128 END) AS codes
  FROM embeddings, mm
)
SELECT vec_id, CAST(len(codes) AS INT) AS n_dims,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       CAST(list_min(codes) AS INT) AS code_min,
       CAST(list_max(codes) AS INT) AS code_max
FROM q
"""


_PQ_M, _PQ_K, _PQ_DIM = 8, 16, 64


def q_embeddings_pq(spark, sf_dir):
    """Product quantization (FAISS PQ): each 64-dim float32 vector becomes
    8 subspace codes against seeded 16-centroid codebooks, packed into one
    bigint — the 16x-compressed at-rest form a 10^10-vector index scans
    instead of raw floats. Pure zero-shuffle map (codebooks are driver
    literals); ``pq_adc_topk`` is the matching asymmetric-distance search
    path (operators.similarity). Codebooks here are the deterministic
    seeded stand-in so DuckDB bakes identical literals; production trains
    per-subspace KMeans and passes them in."""
    return SIM.pq_encode(_t(spark, sf_dir, "embeddings"),
                         m=_PQ_M, k=_PQ_K, dim=_PQ_DIM) \
        .select("vec_id", "pq_code")


def _pq_oracle() -> str:
    sub = _PQ_DIM // _PQ_M
    cents = SIM.pq_centroids(_PQ_M, _PQ_K, sub)
    rows = []
    for j, codebook in enumerate(cents):
        for c, vec in enumerate(codebook):
            lit = "[" + ", ".join(repr(x) for x in vec) + "]"
            cnorm2 = float(sum(x * x for x in vec))
            rows.append(f"({j}, {c}, {lit}::DOUBLE[], {cnorm2!r})")
    values = ",\n   ".join(rows)
    return f"""
WITH cb(j, c, cvec, cnorm2) AS (VALUES
   {values}),
dots AS (
  SELECT e.vec_id, cb.j, cb.c,
         cb.cnorm2 - 2 * list_sum(list_transform(range({sub}),
             i -> e.embedding[{sub} * cb.j + i + 1]::DOUBLE * cb.cvec[i+1]))
           AS d
  FROM embeddings e CROSS JOIN cb),
best AS (
  SELECT vec_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j
                              ORDER BY d ASC, c ASC) AS rn
    FROM dots) WHERE rn = 1)
SELECT vec_id,
       CAST(sum(c * power({_PQ_K}, j)) AS BIGINT) AS pq_code
FROM best GROUP BY vec_id
"""


ORACLE_EMBEDDINGS_PQ = _pq_oracle()


def q_ann_pq_topk(spark, sf_dir):
    """PQ asymmetric-distance top-k (FAISS IVFADC inner loop): base
    vectors live only as their 8 packed 4-bit codes; each query builds an
    8x16 LUT of exact subvector-to-centroid distances and candidates are
    scored by m table lookups — the raw floats of the base side are never
    touched after encoding. Broadcast query side, window top-5
    (operators.similarity.pq_adc_topk; codes verified independently by
    the embeddings_pq row and a pure-Python oracle in tests)."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.pq_adc_topk(emb, emb.filter(F.col("vec_id") < 5), k_top=5,
                           m=_PQ_M, k=_PQ_K, dim=_PQ_DIM)


def _pq_adc_oracle() -> str:
    sub = _PQ_DIM // _PQ_M
    cents = SIM.pq_centroids(_PQ_M, _PQ_K, sub)
    rows = []
    for j, codebook in enumerate(cents):
        for c, vec in enumerate(codebook):
            lit = "[" + ", ".join(repr(x) for x in vec) + "]"
            cnorm2 = float(sum(x * x for x in vec))
            rows.append(f"({j}, {c}, {lit}::DOUBLE[], {cnorm2!r})")
    values = ",\n   ".join(rows)
    return f"""
WITH cb(j, c, cvec, cnorm2) AS (VALUES
   {values}),
dists AS (
  SELECT e.vec_id, cb.j, cb.c,
         cb.cnorm2 - 2 * list_sum(list_transform(range({sub}),
             i -> e.embedding[{sub} * cb.j + i + 1]::DOUBLE * cb.cvec[i+1]))
           AS d
  FROM embeddings e CROSS JOIN cb),
codes AS (
  SELECT vec_id AS neighbor_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j
                              ORDER BY d ASC, c ASC) AS rn
    FROM dists) WHERE rn = 1),
adc AS (
  SELECT l.vec_id AS query_id, co.neighbor_id, sum(l.d) AS adc
  FROM codes co
  JOIN dists l ON l.j = co.j AND l.c = co.c
  WHERE l.vec_id < 5 AND co.neighbor_id <> l.vec_id
  GROUP BY l.vec_id, co.neighbor_id)
SELECT query_id, rnk AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(adc, 6) ASC, neighbor_id ASC)
           AS rnk
  FROM adc) WHERE rnk <= 5
"""


ORACLE_ANN_PQ = _pq_adc_oracle()


def q_frontier_recrawl(spark, sf_dir):
    """Recrawl scheduling (the freshness loop over a crawled frontier):
    priority = staleness in days minus a 20/level depth penalty, top-3
    per host by (score DESC, seq) — one window per host partition, the
    same bounded-partition shape as the wave select. At 10^10 URLs the
    per-host partitions stay politeness-budget sized."""
    k = F.col("o_orderkey")
    fr = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 120).cast("string")).alias("host_key"),
        k.alias("seq"),
        (k % 4).cast("int").alias("depth"),
        F.col("o_orderdate").alias("last_crawl"))
    score = (F.datediff(F.lit("1998-12-01").cast("date"),
                        F.col("last_crawl"))
             - 20 * F.col("depth")).cast("int")
    w = Window.partitionBy("host_key").orderBy(F.col("score").desc(), "seq")
    return (fr.withColumn("score", score)
            .withColumn("recrawl_rank", F.row_number().over(w))
            .filter(F.col("recrawl_rank") <= 3)
            .select("host_key", "seq", "depth", "score", "recrawl_rank"))


ORACLE_FRONTIER_RECRAWL = """
WITH fr AS (
  SELECT 'h' || (o_orderkey % 120) AS host_key, o_orderkey AS seq,
         CAST(o_orderkey % 4 AS INT) AS depth,
         CAST(date_diff('day', o_orderdate, DATE '1998-12-01')
              - 20 * (o_orderkey % 4) AS INT) AS score
  FROM orders
)
SELECT host_key, seq, depth, score,
       CAST(rn AS BIGINT) AS recrawl_rank
FROM (SELECT *, row_number() OVER (PARTITION BY host_key
                                   ORDER BY score DESC, seq) AS rn
      FROM fr)
WHERE rn <= 3
"""


def q_stream_sessionize(spark, sf_dir):
    """Stream==batch equivalence for CUSTOM STATEFUL sessionization: the
    events table replayed as 4 event-time-ordered micro-batches through
    ``sessionize_stream`` (applyInPandasWithState, two scalars of state
    per user); the oracle is the plain batch lag+running-sum query — the
    state machinery must reproduce every per-event session id, not just
    aggregates. Files are global time ranges with strictly increasing
    mtimes (FileStreamSource replays in (modTime, path) order), modelling
    a per-user time-ordered ingestion partition."""
    import glob
    import os
    import shutil
    import tempfile
    import time

    from genesis_spark.streaming.pipeline import sessionize_stream

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_sess_{_STREAM_SEQ}"
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    b = ev.withColumn("_b", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    tmp = tempfile.mkdtemp(prefix="gs_sess_")
    src, ck = os.path.join(tmp, "events"), os.path.join(tmp, "ckpt")
    os.makedirs(src)
    t0 = time.time() - 100
    for i in range(1, 5):
        part = os.path.join(tmp, f"part{i}")
        (b.filter(F.col("_b") == i).select("user_id", "ts")
         .coalesce(1).write.mode("overwrite").parquet(part))
        f = glob.glob(os.path.join(part, "*.parquet"))[0]
        dst = os.path.join(src, f"b{i}.parquet")
        shutil.copy(f, dst)
        os.utime(dst, (t0 + i, t0 + i))
    stream = (spark.readStream.schema("user_id bigint, ts timestamp_ntz")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (sessionize_stream(stream).writeStream.format("memory")
         .queryName(name).option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


ORACLE_STREAM_SESSIONIZE = """
WITH o AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 21600
         THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, ts,
       CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS INT)
         AS session_n
FROM o
"""


def q_events_retention(spark, sf_dir):
    """Cohort retention matrix: users cohorted by the day of their first
    event; for each (cohort_day, day_n) the count of distinct users active
    day_n days later — the standard growth-analytics triangle. Two
    map-side-combinable aggs (first-event min, then the matrix) and one
    broadcast-able join of the per-user cohort row back onto activity."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = (ev.groupBy("user_id")
             .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (act.join(first, "user_id")
            .groupBy("cohort_day",
                     F.datediff("day", "cohort_day").alias("day_n"))
            .agg(F.countDistinct("user_id").alias("n_users")))


ORACLE_EVENTS_RETENTION = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INT) AS day_n,
       count(DISTINCT user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY cohort_day, day_n
"""


def q_events_funnel(spark, sf_dir):
    """Sequential funnel (signup -> purchase -> error, each strictly after
    the previous stage's first hit): per-user earliest stage timestamps +
    the stage reached. Three min-aggs, each map-side combinable on
    user_id; stage joins shrink monotonically so the later joins broadcast
    at any realistic funnel selectivity."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "purchase")
          .join(s1, "user_id").filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "error")
          .join(s2, "user_id").filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    return (s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
            .select("user_id", "t1", "t2", "t3",
                    (F.lit(1) + F.col("t2").isNotNull().cast("int")
                     + F.col("t3").isNotNull().cast("int")).alias("stage")))


ORACLE_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'error' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id, t1, t2, t3,
       1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT) AS stage
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_media_resize(spark, sf_dir):
    """The multimodal preprocessing kernel with REAL pixel math: gray8
    raw bitmaps (dims + pixels pure doc_id arithmetic) are encoded in one
    mapInPandas pass, then decode -> nearest-neighbor resample to 8x8 ->
    integer feature extraction runs as a second Arrow-batched pass
    (numpy index gather — the exact production shape of a Pillow-backed
    resize, codec swapped for a header read). The oracle restates the NN
    index mapping floor(t*src/8) in plain integer SQL, so a value-hash
    match proves the resample arithmetic itself, not just plumbing."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.resize_media(blobs, target_w=8, target_h=8)


ORACLE_MEDIA_RESIZE = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         list_transform(range(64),
           t -> CAST((doc_id * 31
                      + (((t // 8) * h // 8) * w
                         + ((t % 8) * w // 8)) * 7) % 256 AS INT)) AS o
  FROM d
)
SELECT doc_id, w AS src_w, h AS src_h,
       CAST(list_sum(o) AS BIGINT) AS out_sum,
       CAST(list_min(o) AS INT) AS out_min,
       CAST(list_max(o) AS INT) AS out_max
FROM px
"""


# ---------------------------------------------------------------------------
# block 7: Gopher gate, SemDeDup, OPIC, HITS, stream-stream join
# ---------------------------------------------------------------------------


def q_text_gopher(spark, sf_dir):
    """The full Gopher document-quality gate (Rae et al. 2021 §A1.1) —
    word-count bounds, mean word length, symbol-to-word ratio, alphabetic
    word fraction, required-stop-word presence — over the dedup corpus.
    Pure codegen: every metric is an array lambda over the split tokens,
    zero shuffles; at 100 TB this fuses into the scan."""
    return TS.gopher_quality(_corpus(spark, sf_dir))


ORACLE_TEXT_GOPHER = f"""
WITH {_CORPUS_SQL},
g AS (SELECT doc_id, text, string_split(text, ' ') AS w
      FROM corpus WHERE text IS NOT NULL),
m AS (
  SELECT doc_id,
         CAST(len(w) AS INT) AS n_words,
         round(CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE)
               / greatest(len(w), 1), 4) AS mean_word_len,
         round(CAST((len(string_split(text, '#')) - 1)
               + (len(string_split(text, '...')) - 1) AS DOUBLE)
               / greatest(len(w), 1), 4) AS symbol_ratio,
         round(CAST(len(list_filter(w,
                x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
               / greatest(len(w), 1), 4) AS alpha_frac,
         CAST(len(list_filter(
                ['the','be','to','of','and','that','have','with'],
                s -> list_contains(list_transform(w, x -> lower(x)), s)))
              AS INT) AS stop_hits
  FROM g)
SELECT doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac, stop_hits,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
        AND stop_hits >= 2) AS gopher_pass
FROM m
"""


_SEM_CENTROIDS, _SEM_TAU = 8, 0.85


def q_dedup_semantic(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023) over the embeddings table with the
    same deterministic +100000 near-duplicate twins as
    ``dedup_embedding_cosine``: nearest-centroid cell assignment, pairs
    compared WITHIN a cell only, drop-if-smaller-id-partner. The oracle
    bakes identical centroid literals, so the approximate clustering is
    checked exactly."""
    dim = _IVF_DIM
    emb = _t(spark, sf_dir, "embeddings")
    idx = F.sequence(F.lit(0), F.lit(dim - 1))
    dup = emb.filter(F.col("vec_id") < 200).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(idx, lambda i: (
            F.element_at("embedding", (i + 1).cast("int")).cast("double")
            + F.lit(0.4) * F.element_at(
                "embedding",
                ((i + 1) % dim + 1).cast("int")).cast("double")))
        .alias("embedding"))
    allv = (emb.select("vec_id",
                       F.transform("embedding", lambda x: x.cast("double"))
                       .alias("embedding"))
            .unionByName(dup))
    return SIM.semantic_dedup(allv, threshold=_SEM_TAU,
                              n_centroids=_SEM_CENTROIDS, dim=dim)


def _semdedup_oracle() -> str:
    import math

    dim = _IVF_DIM
    cents = SIM.seeded_centroids(_SEM_CENTROIDS, dim)
    rows = []
    for c, vec in enumerate(cents):
        lit = "[" + ", ".join(repr(x) for x in vec) + "]"
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        rows.append(f"({c}, {lit}::DOUBLE[], {norm!r})")
    values = ",\n   ".join(rows)
    return f"""
WITH cents(cell, cvec, cnorm) AS (VALUES
   {values}),
allv AS (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(range({dim}),
           i -> embedding[i+1]::DOUBLE
                + 0.4 * embedding[((i+1) % {dim}) + 1]::DOUBLE) AS v
  FROM embeddings WHERE vec_id < 200),
dots AS (
  SELECT a.vec_id, c.cell,
         list_sum(list_transform(range({dim}),
             i -> a.v[i+1] * c.cvec[i+1])) / c.cnorm AS s
  FROM allv a CROSS JOIN cents c),
cells AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM dots) WHERE rn = 1),
dropped AS (
  SELECT DISTINCT cb.vec_id
  FROM cells ca
  JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
  JOIN allv va ON va.vec_id = ca.vec_id
  JOIN allv vb ON vb.vec_id = cb.vec_id
  WHERE round(
          list_sum(list_transform(range({dim}), i -> va.v[i+1] * vb.v[i+1]))
          / (sqrt(list_sum(list_transform(va.v, x -> x * x)))
             * sqrt(list_sum(list_transform(vb.v, x -> x * x)))), 6)
        >= {_SEM_TAU})
SELECT c.vec_id, CAST(c.cell AS INT) AS cell,
       (d.vec_id IS NULL) AS kept
FROM cells c LEFT JOIN dropped d ON d.vec_id = c.vec_id
"""


ORACLE_DEDUP_SEMANTIC = _semdedup_oracle()


def _host_edges(spark, sf_dir):
    """The orders-derived 50-node host link graph shared by the graph
    signals (pagerank / OPIC / HITS)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), (c % 50).cast("string")).alias("dst"))
        .filter(F.col("src") != F.col("dst")).distinct())


_HOST_EDGES_SQL = """e AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS src,
                  'h' || (o_custkey % 50) AS dst
  FROM orders
  WHERE 'h' || (o_orderkey % 50) <> 'h' || (o_custkey % 50)),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)"""


def q_frontier_opic(spark, sf_dir):
    """OPIC crawl priority (Abiteboul et al. 2003, "Adaptive On-Line Page
    Importance Computation") — the crawler-native alternative to
    PageRank: every host starts with equal cash; each (synchronous)
    round a host banks its cash into history and distributes it equally
    over its out-links. Crawl priority = cash + history. All arithmetic
    EXACT integer (cash in 1e-6 units, DIV for the split; distribution
    remainders and dangling-host cash are dropped, mirrored in the
    oracle) so Spark and DuckDB agree bit-for-bit. 3 unrolled rounds —
    same shape as ``host_pagerank``; the edges subplan repeats and
    ReusedExchange dedupes it."""
    C0 = 1_000_000
    edges = _host_edges(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    state = nodes.select("node", F.lit(C0).cast("long").alias("cash"),
                         F.lit(0).cast("long").alias("hist"))
    for _ in range(3):
        recv = (edges
                .join(state.select(F.col("node").alias("src"), "cash"),
                      "src")
                .join(deg, "src")
                .select(F.col("dst").alias("node"),
                        F.expr("cash DIV outdeg").alias("share"))
                .groupBy("node")
                .agg(F.sum("share").alias("recv")))
        state = (state.join(recv, "node", "left")
                 .select("node",
                         F.coalesce("recv", F.lit(0)).cast("long")
                         .alias("cash"),
                         (F.col("hist") + F.col("cash")).cast("long")
                         .alias("hist")))
    return state.select(F.col("node").alias("host_key"), "cash", "hist",
                        (F.col("cash") + F.col("hist")).alias("priority"))


ORACLE_FRONTIER_OPIC = f"""
WITH {_HOST_EDGES_SQL},
s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS cash,
              CAST(0 AS BIGINT) AS hist FROM n),
r1 AS (SELECT e.dst AS node, sum(s0.cash // deg.outdeg) AS recv
       FROM e JOIN s0 ON s0.node = e.src JOIN deg ON deg.src = e.src
       GROUP BY e.dst),
s1 AS (SELECT n.node, CAST(coalesce(r1.recv, 0) AS BIGINT) AS cash,
              CAST(s0.hist + s0.cash AS BIGINT) AS hist
       FROM n LEFT JOIN r1 ON r1.node = n.node
       JOIN s0 ON s0.node = n.node),
r2 AS (SELECT e.dst AS node, sum(s1.cash // deg.outdeg) AS recv
       FROM e JOIN s1 ON s1.node = e.src JOIN deg ON deg.src = e.src
       GROUP BY e.dst),
s2 AS (SELECT n.node, CAST(coalesce(r2.recv, 0) AS BIGINT) AS cash,
              CAST(s1.hist + s1.cash AS BIGINT) AS hist
       FROM n LEFT JOIN r2 ON r2.node = n.node
       JOIN s1 ON s1.node = n.node),
r3 AS (SELECT e.dst AS node, sum(s2.cash // deg.outdeg) AS recv
       FROM e JOIN s2 ON s2.node = e.src JOIN deg ON deg.src = e.src
       GROUP BY e.dst),
s3 AS (SELECT n.node, CAST(coalesce(r3.recv, 0) AS BIGINT) AS cash,
              CAST(s2.hist + s2.cash AS BIGINT) AS hist
       FROM n LEFT JOIN r3 ON r3.node = n.node
       JOIN s2 ON s2.node = n.node)
SELECT node AS host_key, cash, hist, cash + hist AS priority FROM s3
"""


def q_host_hits(spark, sf_dir):
    """HITS hub/authority scores (Kleinberg 1999) over the host graph —
    the complementary frontier signal to PageRank/OPIC (directory hubs
    vs content authorities). Two unnormalized iterations from h0 = 1 in
    EXACT integer arithmetic: a1 = indegree, h1 = Σ a1 over out-links,
    a2 = Σ h1 over in-links. Three map-side-combinable aggs + two
    equi-joins; normalization (a float op) is deliberately left to the
    consumer so the scores stay engine-exact."""
    edges = _host_edges(spark, sf_dir)
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    a1 = edges.groupBy("dst").agg(F.count("*").alias("a1"))
    h1 = (edges.join(a1, "dst")
          .groupBy("src").agg(F.sum("a1").alias("h1")))
    a2 = (edges.join(h1, "src")
          .groupBy("dst").agg(F.sum("h1").alias("a2")))
    return (nodes
            .join(a2.select(F.col("dst").alias("node"), "a2"),
                  "node", "left")
            .join(h1.select(F.col("src").alias("node"), "h1"),
                  "node", "left")
            .select(F.col("node").alias("host_key"),
                    F.coalesce("a2", F.lit(0)).cast("long")
                    .alias("authority"),
                    F.coalesce("h1", F.lit(0)).cast("long").alias("hub")))


ORACLE_HOST_HITS = f"""
WITH {_HOST_EDGES_SQL},
a1 AS (SELECT dst, count(*) AS a1 FROM e GROUP BY dst),
h1 AS (SELECT e.src, sum(a1.a1) AS h1
       FROM e JOIN a1 ON a1.dst = e.dst GROUP BY e.src),
a2 AS (SELECT e.dst, sum(h1.h1) AS a2
       FROM e JOIN h1 ON h1.src = e.src GROUP BY e.dst)
SELECT n.node AS host_key,
       CAST(coalesce(a2.a2, 0) AS BIGINT) AS authority,
       CAST(coalesce(h1.h1, 0) AS BIGINT) AS hub
FROM n
LEFT JOIN a2 ON a2.dst = n.node
LEFT JOIN h1 ON h1.src = n.node
"""


def q_stream_join(spark, sf_dir):
    """Stream-STREAM inner join with per-side watermarks and a time-range
    condition (the 5th streaming capability after stateful dedup,
    windowed agg, stateful sessionization, and stream-static enrich):
    signup events joined to purchase events of the same user within 7
    days, both sides replayed as micro-batched file streams. The
    watermark delay (365 days) exceeds the fixture's time span so no
    match is dropped and the result must equal the batch join exactly;
    at production cadence the same plan with a tight watermark bounds the
    join state (Spark evicts buffered rows older than watermark - range)."""
    import os
    import tempfile

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_join_{_STREAM_SEQ}"
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type")
    tmp = tempfile.mkdtemp(prefix="gs_streamj_")
    src, ck = os.path.join(tmp, "events"), os.path.join(tmp, "ckpt")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    schema = ("event_id long, ts timestamp_ntz, user_id long, "
              "event_type string")

    def _load():
        return (spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1)
                .format("parquet").load(src))

    # watermarks require TIMESTAMP (not NTZ); the cast shifts both sides
    # identically and the timestamps never reach the output columns
    signups = (_load().filter(F.col("event_type") == "signup")
               .select(F.col("event_id").alias("signup_id"),
                       F.col("ts").cast("timestamp").alias("s_ts"),
                       F.col("user_id").alias("s_user"))
               .withWatermark("s_ts", "365 days"))
    purchases = (_load().filter(F.col("event_type") == "purchase")
                 .select(F.col("event_id").alias("purchase_id"),
                         F.col("ts").cast("timestamp").alias("p_ts"),
                         F.col("user_id").alias("p_user"))
                 .withWatermark("p_ts", "365 days"))
    joined = (signups.join(
        purchases,
        (F.col("s_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("s_ts"))
        & (F.col("p_ts") <= F.col("s_ts") + F.expr("INTERVAL 7 DAYS")))
        .select("signup_id", "purchase_id",
                F.col("s_user").alias("user_id")))
    q = (joined.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


ORACLE_STREAM_JOIN = """
SELECT s.event_id AS signup_id, p.event_id AS purchase_id, s.user_id
FROM events s
JOIN events p ON s.user_id = p.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
WHERE s.event_type = 'signup' AND p.event_type = 'purchase'
"""


# ---------------------------------------------------------------------------
# block 8: robots directives, budget apportionment, CCNet buckets,
# sliding windows, perceptual image hash
# ---------------------------------------------------------------------------


_ROBOTS_DELAY_SHAPES = [
    "User-agent: *\nCrawl-delay: 2\nDisallow: /tmp/\n"
    "Sitemap: https://ex0.example/sitemap.xml\n",
    "User-agent: genesis\nCrawl-delay: 0.5\n\n"
    "User-agent: *\nCrawl-delay: 10\n",
    "User-agent: foo\r\nCrawl-delay: 7\r\n"
    "Sitemap: https://ex2.example/b.xml\r\n"
    "Sitemap: https://ex2.example/a.xml\r\n",
    "User-agent: *\nCrawl-delay: oops\nDisallow: /x/\n",
    "",
]

_ROBOTS_DELAY_SHAPE_SQL = " ".join(
    f"WHEN {i} THEN {_sql_textlit(s)}"
    for i, s in enumerate(_ROBOTS_DELAY_SHAPES))


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


def q_frontier_budget(spark, sf_dir):
    """Crawl-budget apportionment: a global fetch budget (10,000 slots)
    split across hosts proportional to weight (here: pending-URL counts)
    by the largest-remainder method — EXACT integers, Σ alloc == budget
    by construction (unit-tested invariant). Two single-row broadcasts
    (total weight, leftover k) + one map; the remainder ranking is a
    global window over HOST-cardinality rows (50 here; at 10^7 hosts it
    becomes a top-k — take the k largest remainders with one partial
    top-k agg instead of a full sort)."""
    BUDGET = 10_000
    wts = (_t(spark, sf_dir, "orders")
           .groupBy(F.concat(F.lit("h"),
                             (F.col("o_orderkey") % 50).cast("string"))
                    .alias("host_key"))
           .agg(F.count("*").alias("wt")))
    tot = wts.agg(F.sum("wt").alias("tot"))
    base = (wts.crossJoin(F.broadcast(tot))
            .select("host_key", "wt",
                    F.expr(f"({BUDGET} * wt) DIV tot").alias("base"),
                    F.expr(f"({BUDGET} * wt) % tot").alias("rem")))
    kdf = base.agg((F.lit(BUDGET) - F.sum("base")).alias("k"))
    w = Window.orderBy(F.desc("rem"), F.asc("host_key"))
    return (base.crossJoin(F.broadcast(kdf))
            .withColumn("rk", F.row_number().over(w))
            .select("host_key", "wt",
                    (F.col("base")
                     + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0))
                    .cast("long").alias("alloc")))


ORACLE_FRONTIER_BUDGET = """
WITH wts AS (
  SELECT 'h' || (o_orderkey % 50) AS host_key, count(*) AS wt
  FROM orders GROUP BY 1),
tot AS (SELECT sum(wt) AS tot FROM wts),
base AS (
  SELECT host_key, wt, (10000 * wt) // tot AS base, (10000 * wt) % tot AS rem
  FROM wts, tot),
kv AS (SELECT 10000 - sum(base) AS k FROM base),
r AS (
  SELECT host_key, wt, base,
         row_number() OVER (ORDER BY rem DESC, host_key ASC) AS rk
  FROM base)
SELECT host_key, wt,
       CAST(base + CASE WHEN rk <= (SELECT k FROM kv) THEN 1 ELSE 0 END
            AS BIGINT) AS alloc
FROM r
"""


def q_corpus_ppl_buckets(spark, sf_dir):
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    doc with the corpus-trained unigram LM, then split into head /
    middle / tail terciles by rank (ntile over (nll ASC, doc_id) — the
    tie-break makes the order total so both engines cut identically).
    The global ntile is fine at doc-quality-report cardinality; at
    10^10 docs the cut becomes two LM-score THRESHOLDS from one
    approx-quantile pass and bucketing is a pure map."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    scored = TS.unigram_lm_score(d)
    w = Window.orderBy(F.asc("nll"), F.asc("doc_id"))
    t = F.ntile(3).over(w)
    return scored.select(
        "doc_id", "nll",
        F.when(t == 1, "head").when(t == 2, "middle")
        .otherwise("tail").alias("bucket"))


ORACLE_CORPUS_PPL_BUCKETS = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
), v AS (
  SELECT tok, count(*) AS tf FROM tok GROUP BY tok
), lp AS (
  SELECT tok, ln(CAST(tf AS DOUBLE)
                 / (SELECT CAST(sum(tf) AS DOUBLE) FROM v)) AS lp
  FROM v
), scored AS (
  SELECT t.doc_id, round(avg(-lp), 4) AS nll
  FROM tok t JOIN lp USING (tok) GROUP BY t.doc_id
), nt AS (
  SELECT doc_id, nll,
         ntile(3) OVER (ORDER BY nll ASC, doc_id ASC) AS t
  FROM scored)
SELECT doc_id, nll,
       CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END
         AS bucket
FROM nt
"""


def q_events_sliding(spark, sf_dir):
    """Sliding (hopping) window aggregation — ``window(ts, '1 hour',
    '30 minutes')``: every event lands in exactly duration/slide = 2
    windows. The oracle replays the epoch-aligned window generation as
    an unnest over the two hop offsets. Map-side combinable agg; the
    2x row inflation happens pre-combine inside the same task."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "total_value"))


ORACLE_EVENTS_SLIDING = """
WITH x AS (
  SELECT e.event_type, e.value,
         CAST(floor(epoch(e.ts) / 1800) AS BIGINT) * 1800 - i * 1800
           AS ws
  FROM events e, unnest([0, 1]) u(i))
SELECT TIMESTAMP '1970-01-01 00:00:00' + INTERVAL (ws) SECOND
         AS window_start,
       event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM x GROUP BY 1, 2
"""


def q_media_phash(spark, sf_dir):
    """Perceptual image hash (aHash) + exact-duplicate grouping over the
    gray8 bitmap corpus: encode (mapInPandas, real bytes) -> decode ->
    8x8 NN-resample -> mean-threshold bits -> 4x16-bit segments, then
    one groupBy on the full hash for duplicate counts. The oracle
    restates the resample indices, the integer mean compare (px*64 > s),
    and the bit packing in plain SQL — a value-hash match proves the
    whole perceptual-hash kernel. Segments are the banded layout for
    hamming-distance dedup joins (same 4x16 scheme as dedup_simhash64)."""
    hashes = _phash_segs(spark, sf_dir)
    segcols = ["seg0", "seg1", "seg2", "seg3"]
    grp = hashes.groupBy(*segcols).agg(F.count("*").alias("dup_count"))
    return (hashes.join(grp, segcols)
            .select("doc_id", *segcols, "dup_count"))


def _phash_segs(spark, sf_dir):
    """doc_id -> 4x16-bit aHash segments over the gray8 bitmap corpus
    (shared by media_phash's dup grouping and media_phash_pairs' banded
    hamming join)."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.ahash_media(blobs)


def _phash_seg_sql(k: int) -> str:
    return (f"CAST(list_sum(list_transform(range(16), "
            f"t -> CASE WHEN o[{16 * k} + t + 1] * 64 > s "
            f"THEN (1 << t) ELSE 0 END)) AS INT) AS seg{k}")


# shared pixel-replay CTE chain (d -> px -> hb -> segs): ONE definition
# used by both phash oracles so the kernel replay can't drift between
# them (same convention as _C4_SYNTH_SQL / _CORPUS_SQL)
_PHASH_SEGS_SQL = f"""d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents
), px AS (
  SELECT doc_id, w, h,
         list_transform(range(64),
           t -> CAST((doc_id * 31
                      + (((t // 8) * h // 8) * w
                         + ((t % 8) * w // 8)) * 7) % 256 AS INT)) AS o
  FROM d
), hb AS (
  SELECT doc_id, o, list_sum(o) AS s FROM px
), segs AS (
  SELECT doc_id,
         {_phash_seg_sql(0)},
         {_phash_seg_sql(1)},
         {_phash_seg_sql(2)},
         {_phash_seg_sql(3)}
  FROM hb
)"""


ORACLE_MEDIA_PHASH = f"""
WITH {_PHASH_SEGS_SQL}, g AS (
  SELECT seg0, seg1, seg2, seg3, count(*) AS dup_count
  FROM segs GROUP BY seg0, seg1, seg2, seg3)
SELECT x.doc_id, x.seg0, x.seg1, x.seg2, x.seg3, g.dup_count
FROM segs x JOIN g USING (seg0, seg1, seg2, seg3)
"""


# ---------------------------------------------------------------------------
# block 9: IVF+PQ ANN, politeness schedule, URL-level doc dedup,
# n-gram-profile language ID, shingle containment, host components,
# uniform video frame sampling
# ---------------------------------------------------------------------------

def q_ann_ivfpq_topk(spark, sf_dir):
    """IVF+PQ composed (FAISS IVFADC, the real 10^10-vector index): base
    vectors stored only as (coarse cell, m PQ codes); queries probe
    n_probe coarse cells and score candidates by ADC lookups. Candidate
    generation = ONE equi-join on cell id; base floats never touched
    after encoding. Composition of the oracle-verified ivf_topk and
    pq_adc_topk halves; the oracle composes the same two CTE chains."""
    emb = _t(spark, sf_dir, "embeddings")
    return SIM.ivfpq_topk(emb, emb.filter(F.col("vec_id") < 5), k_top=5,
                          n_centroids=_IVF_CENTROIDS, n_probe=_IVF_PROBE,
                          m=_PQ_M, k=_PQ_K, dim=_PQ_DIM)


def _ivfpq_oracle() -> str:
    import math

    coarse = SIM.seeded_centroids(_IVF_CENTROIDS, _PQ_DIM)
    crows = []
    for c, vec in enumerate(coarse):
        lit = "[" + ", ".join(repr(x) for x in vec) + "]"
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        crows.append(f"({c}, {lit}::DOUBLE[], {norm!r})")
    cvalues = ",\n   ".join(crows)

    sub = _PQ_DIM // _PQ_M
    cents = SIM.pq_centroids(_PQ_M, _PQ_K, sub)
    prows = []
    for j, codebook in enumerate(cents):
        for c, vec in enumerate(codebook):
            lit = "[" + ", ".join(repr(x) for x in vec) + "]"
            cnorm2 = float(sum(x * x for x in vec))
            prows.append(f"({j}, {c}, {lit}::DOUBLE[], {cnorm2!r})")
    pvalues = ",\n   ".join(prows)
    return f"""
WITH cents(cell, cvec, cnorm) AS (VALUES
   {cvalues}),
cb(j, c, cvec, cnorm2) AS (VALUES
   {pvalues}),
cdots AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range({_PQ_DIM}),
             i -> e.embedding[i+1]::DOUBLE * c.cvec[i+1])) / c.cnorm AS s
  FROM embeddings e CROSS JOIN cents c),
base_cells AS (
  SELECT vec_id AS neighbor_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM cdots) WHERE rn = 1),
q_probes AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM cdots WHERE vec_id < 5) WHERE rn <= {_IVF_PROBE}),
dists AS (
  SELECT e.vec_id, cb.j, cb.c,
         cb.cnorm2 - 2 * list_sum(list_transform(range({sub}),
             i -> e.embedding[{sub} * cb.j + i + 1]::DOUBLE * cb.cvec[i+1]))
           AS d
  FROM embeddings e CROSS JOIN cb),
codes AS (
  SELECT vec_id AS neighbor_id, j, c FROM (
    SELECT vec_id, j, c,
           row_number() OVER (PARTITION BY vec_id, j
                              ORDER BY d ASC, c ASC) AS rn
    FROM dists) WHERE rn = 1),
adc AS (
  SELECT p.query_id, bc.neighbor_id, sum(l.d) AS adc
  FROM q_probes p
  JOIN base_cells bc USING (cell)
  JOIN codes co ON co.neighbor_id = bc.neighbor_id
  JOIN dists l ON l.vec_id = p.query_id AND l.j = co.j AND l.c = co.c
  WHERE bc.neighbor_id <> p.query_id
  GROUP BY p.query_id, bc.neighbor_id)
SELECT query_id, rnk AS rank, neighbor_id FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY round(adc, 6) ASC, neighbor_id ASC)
           AS rnk
  FROM adc) WHERE rnk <= 5
"""


ORACLE_ANN_IVFPQ = _ivfpq_oracle()


def q_frontier_schedule(spark, sf_dir):
    """Politeness-aware fetch-slot assignment (ST3's scheduling primitive
    as a declarative pass): within each host, pending URLs are ranked by
    (installed_at, seq) and the k-th URL is scheduled k*crawl_delay ms
    after the host's window opens — the per-host serialization the
    politeness contract requires, computed for ALL hosts in one window
    pass. Per-host crawl delay comes from the host's robots policy
    (here the deterministic fixture delay). At 10^10 URLs each partition
    is one host's politeness-budget-sized queue — the same bounded-
    partition shape as the wave select."""
    k = F.col("o_orderkey")
    host_num = (k % 60).cast("int")
    fr = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), host_num.cast("string")).alias("host_key"),
        k.alias("seq"),
        F.col("o_orderdate").alias("installed_at"),
        (F.lit(500) + (host_num % 5) * 250).alias("delay_ms"))
    w = Window.partitionBy("host_key").orderBy("installed_at", "seq")
    return (fr.withColumn("rn", F.row_number().over(w))
            .select("host_key", "seq",
                    ((F.col("rn") - 1) * F.col("delay_ms"))
                    .cast("bigint").alias("fetch_at_ms")))


ORACLE_FRONTIER_SCHEDULE = """
WITH fr AS (
  SELECT 'h' || (o_orderkey % 60) AS host_key, o_orderkey AS seq,
         o_orderdate AS installed_at,
         500 + ((o_orderkey % 60) % 5) * 250 AS delay_ms
  FROM orders)
SELECT host_key, seq,
       CAST((row_number() OVER (PARTITION BY host_key
                                ORDER BY installed_at, seq) - 1)
            * delay_ms AS BIGINT) AS fetch_at_ms
FROM fr
"""


def q_corpus_dedup_url(spark, sf_dir):
    """URL-level document dedup — the crawl-side dedup every corpus
    builder runs before any content dedup: canonicalize each document's
    source URL (the P1 kernel) and keep the earliest doc per canonical
    URL. Ties the URL kernel into the corpus pipeline; one groupBy on the
    canonical key (at 100 TB: pre-partition by url hash at rest and this
    is a map-side-combinable agg, wide text never shuffles)."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    raw = F.concat(F.lit("http://www.shop"),
                   (F.col("doc_id") % 40).cast("string"),
                   F.lit(".com/item/"),
                   (F.col("doc_id") % 120).cast("string"),
                   F.lit("/"))
    return (d.withColumn("url_canonical", U.canonicalize_expr(raw))
            .groupBy("url_canonical")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 (F.count("*") - 1).alias("n_dups")))


ORACLE_CORPUS_DEDUP_URL = """
SELECT 'http://shop' || (doc_id % 40) || '.com/item/' || (doc_id % 120)
         AS url_canonical,
       min(doc_id) AS keep_doc_id,
       count(*) - 1 AS n_dups
FROM documents GROUP BY 1
"""


def q_text_langid_ngram(spark, sf_dir):
    """Profile-based language ID (the Cavnar-Trenkle n-gram method the
    brief's lang-ID asks for, upgraded from the marker heuristic of
    text_lang_id): TRAIN per-language character-trigram profiles from the
    labeled seed slice (every 3rd doc), then classify EVERY doc by
    profile overlap (count of the doc's distinct trigrams appearing in
    the language's top-20 profile; argmax with lang-asc tie-break, zero
    overlap -> 'und'). Training is one map-side-combinable groupBy; the
    profile is tiny (langs x 20) and broadcast — classification never
    shuffles the corpus, only the per-doc distinct-trigram explode."""
    docs = (_t(spark, sf_dir, "documents")
            .select("doc_id", "lang", F.lower("text").alias("t")))
    tg = F.expr("CASE WHEN char_length(t) >= 3 THEN "
                "transform(sequence(0, char_length(t)-3), "
                "i -> substring(t, i+1, 3)) ELSE array() END")
    grams = docs.select("doc_id", "lang", F.explode(tg).alias("g"))
    wp = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("g"))
    profile = (grams.filter(F.col("doc_id") % 3 == 0)
               .groupBy("lang", "g").agg(F.count("*").alias("c"))
               .withColumn("prank", F.row_number().over(wp))
               .filter(F.col("prank") <= 20)
               .select(F.col("lang").alias("plang"), "g"))
    doc_grams = grams.select("doc_id", "g").distinct()
    matches = (doc_grams.join(F.broadcast(profile), "g")
               .groupBy("doc_id", "plang")
               .agg(F.count("*").alias("hits")))
    wd = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("plang"))
    best = (matches.withColumn("rn", F.row_number().over(wd))
            .filter(F.col("rn") == 1).select("doc_id", "plang"))
    return (docs.join(best, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("plang", F.lit("und")).alias("lang_pred")))


ORACLE_TEXT_LANGID_NGRAM = """
WITH d AS (
  SELECT doc_id, lang, lower(text) AS t FROM documents),
grams AS (
  SELECT doc_id, lang,
         unnest(CASE WHEN length(t) >= 3
                THEN list_transform(range(length(t)-2), i -> t[i+1:i+3])
                ELSE [] END) AS g
  FROM d),
profile AS (
  SELECT lang AS plang, g FROM (
    SELECT lang, g, count(*) AS c,
           row_number() OVER (PARTITION BY lang
                              ORDER BY count(*) DESC, g ASC) AS prank
    FROM grams WHERE doc_id % 3 = 0 GROUP BY lang, g)
  WHERE prank <= 20),
dg AS (SELECT DISTINCT doc_id, g FROM grams),
m AS (
  SELECT doc_id, plang, count(*) AS hits
  FROM dg JOIN profile USING (g) GROUP BY doc_id, plang),
best AS (
  SELECT doc_id, plang FROM (
    SELECT doc_id, plang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY hits DESC, plang ASC) AS rn
    FROM m) WHERE rn = 1)
SELECT d.doc_id, coalesce(best.plang, 'und') AS lang_pred
FROM d LEFT JOIN best ON best.doc_id = d.doc_id
"""


def q_dedup_containment(spark, sf_dir):
    """Shingle CONTAINMENT near-dup pairs — the asymmetric complement to
    Jaccard (Broder's c(A,B) = |A inter B| / |A|): catches a short doc
    quoted inside a longer one, which symmetric Jaccard dilutes below
    threshold. Same bucketed shape as dedup_ngram_jaccard (distinct
    3-shingles, hot-shingle max_df cap, ONE self-equi-join on shingle)
    but ORDERED pairs normalized by the left side's set size
    (operators/dedup.containment_pairs)."""
    return D.containment_pairs(_corpus(spark, sf_dir), threshold=0.8,
                               max_df=_NGRAM_MAX_DF)


ORACLE_DEDUP_CONTAINMENT = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(3)},
dsh0 AS (SELECT DISTINCT doc_id, shingle FROM sh),
keep AS (SELECT shingle FROM dsh0 GROUP BY shingle
         HAVING count(*) <= {_NGRAM_MAX_DF}),
dsh AS (SELECT doc_id, dsh0.shingle FROM dsh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS doc_id, y.doc_id AS contained_in, count(*) AS n_common
  FROM dsh x JOIN dsh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
  GROUP BY 1, 2)
SELECT doc_id, contained_in,
       round(n_common / na.n, 4) AS containment
FROM common JOIN sizes na USING (doc_id)
WHERE round(n_common / na.n, 4) >= 0.8
"""


def q_host_components(spark, sf_dir):
    """Connected components over the host link graph — site-cluster /
    mirror-farm detection (which onion hosts form one connected
    community), the graph signal next to PageRank/OPIC/HITS. Hash-to-min
    label propagation (operators/cc.py: one shuffle per round,
    localCheckpoint lineage cuts); oracle = recursive-CTE closure.
    Output: every host with its component's min-id label and size."""
    from genesis_spark.operators.cc import connected_components
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    edges = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("g"), (k % 97).cast("string")).alias("src"),
        F.concat(F.lit("g"), ((c % 97) % 60).cast("string")).alias("dst"))
        .filter(F.col("src") != F.col("dst")).distinct())
    comp = connected_components(edges, "src", "dst")
    sizes = comp.groupBy("component").agg(F.count("*").alias("component_size"))
    return (comp.join(sizes, "component")
            .select(F.col("node").alias("host_key"),
                    F.col("component").alias("component_id"),
                    "component_size"))


ORACLE_HOST_COMPONENTS = """
WITH RECURSIVE e AS (
  SELECT DISTINCT 'g' || (o_orderkey % 97) AS src,
                  'g' || ((o_custkey % 97) % 60) AS dst
  FROM orders
  WHERE 'g' || (o_orderkey % 97) <> 'g' || ((o_custkey % 97) % 60)),
sym AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT dst AS a, src AS b FROM e),
reach AS (
  SELECT a AS node, a AS comp FROM sym
  UNION
  SELECT s.a AS node, r.comp FROM sym s JOIN reach r ON r.node = s.b),
comp AS (SELECT node, min(comp) AS component FROM reach GROUP BY node),
sizes AS (SELECT component, count(*) AS component_size
          FROM comp GROUP BY component)
SELECT node AS host_key, component AS component_id, component_size
FROM comp JOIN sizes USING (component)
"""


def q_media_framesample(spark, sf_dir):
    """Uniform video frame sampling end-to-end as a driver row: mapInPandas
    encodes a deterministic RAW clip per doc (n_frames = 4 + doc_id % 9,
    64-byte frames, byte = (doc_id*7 + f*13 + i*3) % 256), a second
    mapInPandas reads the container header, picks frames at
    floor(t*n/4) (t = 0..3) and emits each sampled frame's integer
    byte-sum — REAL byte slicing/summing over Arrow batches
    (operators/multimodal.sample_frames_video). The oracle restates the
    frame-index map and byte arithmetic in integer SQL: a value-hash
    match proves the container plumbing and the sampling kernel."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.video_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.sample_frames_video(blobs, target=4)


ORACLE_MEDIA_FRAMESAMPLE = """
WITH d AS (
  SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS n_frames FROM documents),
fidx AS (
  SELECT doc_id, n_frames,
         unnest(list_distinct(list_transform(range(4),
                t -> CAST((t * n_frames) // 4 AS INT)))) AS frame_idx
  FROM d)
SELECT doc_id, n_frames, frame_idx,
       CAST(list_sum(list_transform(range(64),
            i -> (doc_id * 7 + frame_idx * 13 + i * 3) % 256)) AS BIGINT)
         AS frame_sum
FROM fidx
"""


def q_stream_topk(spark, sf_dir):
    """The 6th streaming capability: stateful heavy-hitter tracking —
    per-host cumulative URL counts maintained in the state store (ONE
    bigint per host) across a 4-micro-batch replay, then the exact
    top-10 hosts recovered from the emissions. The cumulative counts are
    monotone, so max-per-host over ALL emissions equals the final count
    no matter how the replay was batched — which is exactly what the
    batch GROUP BY oracle checks (counts AND ranking). At production
    cadence this is the dispatcher's live who-dominates-traffic signal;
    state stays O(hosts)."""
    import os
    import tempfile

    from genesis_spark.streaming.pipeline import count_stream

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_topk_{_STREAM_SEQ}"
    d = _t(spark, sf_dir, "documents")
    k = F.col("doc_id")
    links = d.select(
        F.concat(F.lit("h"), (k % 37).cast("string")).alias("host_key"),
        F.concat(F.lit("http://h"), (k % 37).cast("string"),
                 F.lit(".onion/p"), k.cast("string")).alias("url"))
    tmp = tempfile.mkdtemp(prefix="gs_streamtk_")
    src, ck = os.path.join(tmp, "links"), os.path.join(tmp, "ckpt")
    links.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("host_key string, url string")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (count_stream(stream.drop("url"))
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    final = (spark.table(name).groupBy("host_key")
             .agg(F.max("n_cum").alias("n_urls")))
    w = Window.orderBy(F.desc("n_urls"), F.asc("host_key"))
    return (final.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("rank", "host_key", "n_urls"))


ORACLE_STREAM_TOPK = """
WITH c AS (
  SELECT 'h' || (doc_id % 37) AS host_key, count(*) AS n_urls
  FROM documents GROUP BY 1)
SELECT rank, host_key, n_urls FROM (
  SELECT host_key, n_urls,
         row_number() OVER (ORDER BY n_urls DESC, host_key ASC) AS rank
  FROM c) WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# block 10: audio modality, distributed KMeans step, token-budget corpus
# selection, plain-text link discovery, tracking-param strip, reciprocal
# host links
# ---------------------------------------------------------------------------

def q_media_audio(spark, sf_dir):
    """Audio modality end-to-end as a driver row (the third modality next
    to gray8 images and RAW video): mapInPandas encodes a deterministic
    PCM16 clip per doc (n = 512 + (doc_id%3)*256 samples, sample s =
    ((doc_id*11 + s*17) % 4096) - 2048), a second mapInPandas decodes the
    container and emits per-256-sample-window ENERGY (exact int64 sum of
    squares) and ZERO-CROSSING counts — real numpy signal math over Arrow
    batches (operators/multimodal.audio_features). The oracle restates
    the synth and both features in integer SQL: a value-hash match proves
    the int16 container plumbing and the windowed kernel."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.audio_features(blobs, window=256)


ORACLE_MEDIA_AUDIO = """
WITH d AS (
  SELECT doc_id, CAST(512 + (doc_id % 3) * 256 AS INT) AS n FROM documents),
w AS (
  SELECT doc_id, unnest(range(n // 256)) AS win_idx FROM d),
x AS (
  SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
         list_transform(range(256),
             i -> ((doc_id*11 + (win_idx*256 + i)*17) % 4096) - 2048) AS s
  FROM w)
SELECT doc_id, win_idx,
       CAST(list_sum(list_transform(s, v -> v * v)) AS BIGINT) AS energy,
       CAST(list_sum(list_transform(range(255),
            i -> CASE WHEN (s[i+1] < 0) <> (s[i+2] < 0)
                 THEN 1 ELSE 0 END)) AS INT) AS zcr
FROM x
"""


def q_embeddings_kmeans_step(spark, sf_dir):
    """ONE distributed Lloyd iteration — the KMeans TRAINING step that
    produces the real centroids ivf_topk/dedup_semantic consume (their
    seeded stand-ins exist so oracles can bake literals; this row proves
    the training pass itself): assign every vector to its nearest current
    centroid (pure-codegen literal arithmetic), then recompute each
    centroid component as the member mean via posexplode + ONE
    map-side-combinable groupBy (cell, pos) — the exchange carries
    O(cells x dim x partitions) partials, never vectors. Means rounded to
    4dp (module convention: summation order must not flip the hash)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    assigned = emb.select(
        SIM.assign_cell_expr(
            F.transform("embedding", lambda x: x.cast("double")),
            cents).alias("cell"),
        F.posexplode("embedding").alias("pos", "x"))
    return (assigned.groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("x").cast("double")), 4)
                 .alias("centroid_val"),
                 F.count("*").alias("n_members")))


def _kmeans_oracle() -> str:
    import math

    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    rows = []
    for c, vec in enumerate(cents):
        lit = "[" + ", ".join(repr(x) for x in vec) + "]"
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        rows.append(f"({c}, {lit}::DOUBLE[], {norm!r})")
    values = ",\n   ".join(rows)
    return f"""
WITH cents(cell, cvec, cnorm) AS (VALUES
   {values}),
dots AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range({_IVF_DIM}),
             i -> e.embedding[i+1]::DOUBLE * c.cvec[i+1])) / c.cnorm AS s
  FROM embeddings e CROSS JOIN cents c),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM dots) WHERE rn = 1),
px AS (
  SELECT a.cell, unnest(range({_IVF_DIM})) AS pos0, e.embedding
  FROM assign a JOIN embeddings e USING (vec_id))
SELECT cell, CAST(pos0 AS INT) AS pos,
       round(avg(embedding[pos0 + 1]::DOUBLE), 4) AS centroid_val,
       count(*) AS n_members
FROM px GROUP BY cell, pos0
"""


ORACLE_EMBEDDINGS_KMEANS = _kmeans_oracle()


def q_corpus_token_budget(spark, sf_dir):
    """Token-budget corpus selection — the greedy pass that fills a
    training-token budget with the best documents first: order by
    (quality DESC, doc_id), admit docs while the running token total
    stays within budget. Shown here as the flat single-window form (the
    oracle row); at 100 TB the prefix sum decomposes exactly like
    operators/pack.py's hierarchical path (range-partition sort ->
    per-shard sums -> broadcast base offsets), proved bit-identical there.
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = d.select(
        "doc_id",
        TS.quality_score_expr(F.col("text")).alias("quality"),
        F.size(F.split("text", " ")).alias("n_tokens"))
    w = (Window.orderBy(F.desc("quality"), F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (scored.withColumn("running_tokens",
                              F.sum("n_tokens").over(w))
            .filter(F.col("running_tokens") <= 20000)
            .select("doc_id", "quality", "n_tokens", "running_tokens"))


ORACLE_CORPUS_TOKEN_BUDGET = f"""
WITH {_quality_cte("doc_id", "documents")},
tok AS (
  SELECT d.doc_id, qs.q AS quality,
         len(string_split(d.text, ' ')) AS n_tokens
  FROM documents d JOIN qs USING (doc_id)),
run AS (
  SELECT doc_id, quality, n_tokens,
         sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS running_tokens
  FROM tok)
SELECT doc_id, quality, n_tokens, running_tokens
FROM run WHERE running_tokens <= 20000
"""


def q_text_url_extract(spark, sf_dir):
    """Plain-text link discovery (the crawler's non-HTML link source —
    pastebins, feeds, text dumps): regexp_extract_all over the document
    text, one row per found URL with its network class (P5 kernel).
    Pure codegen map + explode — fuses into the scan at 100 TB. The
    fixture embeds two deterministic URLs per doc so the oracle can
    restate the extraction closed-form."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    syn = F.concat(
        F.substring("text", 1, 40),
        F.lit(" see http://h"), (k % 50).cast("string"),
        F.lit(".onion/p"), k.cast("string"),
        F.lit(" and https://www.ex"), (k % 7).cast("string"),
        F.lit(".com/q?id="), k.cast("string"), F.lit(" end"))
    urls = F.expr(r"regexp_extract_all(t, 'https?://[^ ]+', 0)")
    return (d.select("doc_id", syn.alias("t"))
            .select("doc_id", F.explode(urls).alias("url"))
            .select("doc_id", "url",
                    U.network_type_expr(F.col("url")).alias("network")))


ORACLE_TEXT_URL_EXTRACT = """
SELECT doc_id, 'http://h' || (doc_id % 50) || '.onion/p' || doc_id AS url,
       'onion' AS network
FROM documents
UNION ALL
SELECT doc_id,
       'https://www.ex' || (doc_id % 7) || '.com/q?id=' || doc_id AS url,
       'clearnet' AS network
FROM documents
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


def q_host_reciprocal(spark, sf_dir):
    """Reciprocal-link detection over the host graph — the classic
    link-farm / mutual-promotion spam signal a crawl prioritizer
    down-weights: unordered host pairs linked in BOTH directions. ONE
    self-equi-join of the distinct edge list on the reversed key (never
    all-pairs); emitted once per pair via the src < dst gate."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    edges = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), (c % 50).cast("string")).alias("dst"))
        .filter(F.col("src") != F.col("dst")).distinct())
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (edges.join(rev, ["src", "dst"])
            .filter(F.col("src") < F.col("dst"))
            .select(F.col("src").alias("host_a"),
                    F.col("dst").alias("host_b")))


ORACLE_HOST_RECIPROCAL = """
WITH e AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS src,
                  'h' || (o_custkey % 50) AS dst
  FROM orders
  WHERE 'h' || (o_orderkey % 50) <> 'h' || (o_custkey % 50))
SELECT a.src AS host_a, a.dst AS host_b
FROM e a JOIN e b ON b.src = a.dst AND b.dst = a.src
WHERE a.src < a.dst
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


def q_events_markov(spark, sf_dir):
    """Event-sequence Markov transition matrix — the behavioral-model
    signal (what follows what) built from per-user event streams: lag
    over (user, ts-ordered) windows pairs each event with its
    predecessor, ONE map-side-combinable groupBy counts transitions, and
    probabilities normalize per source state (4dp round, module
    convention). Same bounded per-user partition shape as sessionize; at
    100 TB the window partitions by user and the transition matrix is
    O(types^2)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                            "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    counts = (pairs.groupBy("prev_type", "event_type")
              .agg(F.count("*").alias("n_trans")))
    wt = Window.partitionBy("prev_type")
    return (counts
            .withColumn("p_trans",
                        F.round(F.col("n_trans") /
                                F.sum("n_trans").over(wt), 4))
            .select("prev_type", "event_type", "n_trans", "p_trans"))


ORACLE_EVENTS_MARKOV = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (
  SELECT prev_type, event_type, count(*) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, event_type, n_trans,
       round(n_trans / (sum(n_trans) OVER (PARTITION BY prev_type)), 4)
         AS p_trans
FROM c
"""




def q_stream_dedup_wm(spark, sf_dir):
    """The 7th streaming capability: Spark's BUILT-IN watermark-bounded
    streaming dedup (``dropDuplicatesWithinWatermark``) next to the
    custom stateful URL-seen of ``stream_dedup`` — the engine-managed
    form whose state is EVICTED once the watermark passes (the
    production-correct bounded-state shape; the custom operator exists
    for the reference's per-host cap semantics). Replayed as 4
    micro-batches; the 40-day watermark delay exceeds the fixture's
    30-day event-time span (same contract as stream_join), so neither
    late-drop nor state eviction can fire and the emitted set must equal
    the batch DISTINCT exactly — which is what the oracle checks. At
    production cadence the delay is minutes and the same plan holds
    state only for watermark-delay worth of URLs."""
    import os
    import tempfile

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_dwm_{_STREAM_SEQ}"
    d = _t(spark, sf_dir, "events")
    links = d.select(
        F.col("ts").cast("timestamp").alias("ts"),
        F.concat(F.lit("http://h"), (F.col("user_id") % 25).cast("string"),
                 F.lit(".onion/p"), (F.col("event_id") % 200).cast("string")
                 ).alias("url"))
    tmp = tempfile.mkdtemp(prefix="gs_streamdwm_")
    src_dir, ck = os.path.join(tmp, "links"), os.path.join(tmp, "ckpt")
    links.repartition(4).write.mode("overwrite").parquet(src_dir)
    stream = (spark.readStream.schema("ts timestamp, url string")
              .option("maxFilesPerTrigger", 1).format("parquet")
              .load(src_dir))
    q = (stream.withWatermark("ts", "40 days")
         .dropDuplicatesWithinWatermark(["url"])
         .select("url")
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


ORACLE_STREAM_DEDUP_WM = """
SELECT DISTINCT 'http://h' || (user_id % 25) || '.onion/p'
       || (event_id % 200) AS url
FROM events
"""


# ---------------------------------------------------------------------------
# block 12: composed multimodal corpus pipeline, IDN host normalization
# ---------------------------------------------------------------------------

def q_spans_pipeline(spark, sf_dir):
    """The END-TO-END multimodal corpus pipeline as ONE oracle row — the
    interleaved-payload analogue of corpus_clean_full: interleave ->
    cross-doc boilerplate section removal (broadcast anti-join on the
    high-df key set) -> cross-doc media dedup (canonical copy per
    caption-context cluster only) -> multimodal sequence packing of the
    SURVIVING spans into 512-token blocks (two-level prefix, doc-bounded
    windows). Every stage is oracle-verified standalone
    (spans_boilerplate / spans_media_dedup / spans_pack_multimodal);
    this row verifies the COMPOSITION — boilerplate drops shift every
    downstream token offset, so a single misplaced span breaks the
    value hash."""
    from genesis_spark.operators.lines import section_doc_freq
    from genesis_spark.operators.pack import pack_spans
    from genesis_spark.sources.interleaved import (dedup_media_by_context,
                                                   explode_spans,
                                                   interleaved_docs)
    d = _t(spark, sf_dir, "documents")
    inter = interleaved_docs(d.select("doc_id", "text"))
    rows = explode_spans(inter)
    bp = section_doc_freq(rows, min_df=2).select("tkey")
    sec_kept = (rows.filter(F.col("media_ref").isNull()
                            & F.col("text").isNotNull())
                .withColumn("tkey", F.md5("text"))
                .join(F.broadcast(bp), "tkey", "left_anti")
                .drop("tkey"))
    canon = (dedup_media_by_context(
                 inter, doc_ord=F.col("doc_id").cast("bigint"))
             .select(F.col("canonical_doc").alias("doc_id"),
                     F.col("canonical_offset").alias("offset")))
    med_kept = (rows.filter(F.col("media_ref").isNotNull()
                            & (F.col("kind") != "link"))
                .join(canon, ["doc_id", "offset"]))
    survivors = sec_kept.unionByName(med_kept)
    rows2 = survivors.join(
        d.select(F.col("doc_id").cast("string").alias("doc_id"), "source"),
        "doc_id")
    return pack_spans(rows2, seq_len=512, media_tokens=64,
                      doc_ord=F.col("doc_id").cast("bigint"))


ORACLE_SPANS_PIPELINE = f"""
WITH {_SPANS_EX_SQL},
sec AS (
  SELECT doc_id, off, s.kind AS kind, s.text AS text
  FROM ex WHERE s.media_ref IS NULL AND s.text IS NOT NULL),
bp AS (SELECT text FROM sec GROUP BY text
       HAVING count(DISTINCT doc_id) >= 2),
sec_kept AS (
  SELECT doc_id, off, kind, text, CAST(NULL AS VARCHAR) AS media_ref
  FROM sec WHERE text NOT IN (SELECT text FROM bp)),
ctx AS (
  SELECT doc_id, off, s.kind AS kind, s.media_ref AS media_ref,
         last_value(s.text IGNORE NULLS) OVER (
           PARTITION BY doc_id ORDER BY off
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS context
  FROM ex),
med AS (
  SELECT md5(coalesce(context, '')) AS content_key,
         CAST(doc_id AS BIGINT) AS dord, doc_id, off
  FROM ctx WHERE media_ref IS NOT NULL AND kind <> 'link'),
canon AS (
  SELECT doc_id, off FROM (
    SELECT doc_id, off,
           row_number() OVER (PARTITION BY content_key
                              ORDER BY dord, off) AS rn
    FROM med) WHERE rn = 1),
med_kept AS (
  SELECT e.doc_id, e.off, e.s.kind AS kind, CAST(NULL AS VARCHAR) AS text,
         e.s.media_ref AS media_ref
  FROM ex e JOIN canon c ON c.doc_id = e.doc_id AND c.off = e.off),
surv AS (
  SELECT * FROM sec_kept UNION ALL SELECT * FROM med_kept),
cost AS (
  SELECT sv.doc_id, sv.off, sv.kind,
         CAST(CASE WHEN sv.media_ref IS NOT NULL THEN 64
              ELSE len(string_split(sv.text, ' ')) END AS BIGINT) AS cost,
         d.source AS source
  FROM surv sv JOIN documents d ON sv.doc_id = CAST(d.doc_id AS VARCHAR)),
o AS (
  SELECT *, CAST(sum(cost) OVER (
      PARTITION BY source
      ORDER BY CAST(doc_id AS BIGINT), off
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cost AS BIGINT)
    AS tok_offset
  FROM cost)
SELECT doc_id, CAST(off AS INT) AS offset, kind, cost, tok_offset,
       tok_offset // 512 AS block_first,
       (tok_offset + cost - 1) // 512 AS block_last
FROM o
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
# block 13: video scene detection, audio voice-activity segmentation
# ---------------------------------------------------------------------------

def q_media_scenes(spark, sf_dir):
    """Video scene-cut detection over the RAW frame container — the
    shot-boundary pass a video-training pipeline runs before sampling:
    mapInPandas decodes each clip and computes the absolute byte-delta
    between consecutive frames (real numpy over Arrow batches); a frame
    whose delta exceeds the threshold opens a new scene. Emits one row
    per frame with its delta and scene id (running count of cuts).
    Deltas are exact integers over the deterministic synth, so the
    oracle restates the whole kernel in SQL. Zero shuffles — the scene
    pass fuses into the scan at 100 TB."""
    import numpy as np
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.video_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    return MM.detect_scenes(blobs, threshold=8000)


ORACLE_MEDIA_SCENES = """
WITH d AS (
  SELECT doc_id, CAST(4 + doc_id % 9 AS INT) AS n FROM documents),
fr AS (
  SELECT doc_id, n, unnest(range(n)) AS f FROM d),
dl AS (
  SELECT doc_id, CAST(f AS INT) AS frame_idx,
         CASE WHEN f = 0 THEN CAST(-1 AS BIGINT)
              ELSE CAST(list_sum(list_transform(range(64),
                   i -> abs((doc_id*7 + f*13 + i*3) % 256
                          - (doc_id*7 + (f-1)*13 + i*3) % 256)))
                   AS BIGINT) END AS delta
  FROM fr),
sc AS (
  SELECT doc_id, frame_idx, delta,
         CAST(sum(CASE WHEN delta > 8000 THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY frame_idx
                    ROWS UNBOUNDED PRECEDING) AS INT) AS scene_id
  FROM dl)
SELECT doc_id, frame_idx, delta, scene_id FROM sc
"""


def q_media_vad(spark, sf_dir):
    """Voice-activity segmentation — the speech-segmenting pass over the
    windowed audio features: a window is ACTIVE when its energy clears
    the threshold; consecutive active windows group into one segment
    (run-length via the lag + running-sum trick, the same shape as
    events_sessionize), emitting per-segment (start, end, window count,
    total energy). The feature pass is the real numpy PCM16 kernel
    (media_audio row); the segmentation on top is pure window codegen —
    at 100 TB the window partitions by clip, bounded by windows-per-clip.
    """
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    feats = MM.audio_features(blobs, window=256)
    thr = 350_000_000
    act = feats.filter(F.col("energy") > thr)
    w = Window.partitionBy("doc_id").orderBy("win_idx")
    seg = (act.withColumn(
               "new_seg",
               F.when(F.lag("win_idx").over(w).isNull()
                      | (F.col("win_idx") - F.lag("win_idx").over(w) > 1),
                      1).otherwise(0))
           .withColumn("seg_id", F.sum("new_seg").over(
               w.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    return (seg.groupBy("doc_id", "seg_id")
            .agg(F.min("win_idx").alias("start_win"),
                 F.max("win_idx").alias("end_win"),
                 F.count("*").alias("n_windows"),
                 F.sum("energy").alias("seg_energy")))


ORACLE_MEDIA_VAD = """
WITH d AS (
  SELECT doc_id, CAST(512 + (doc_id % 3) * 256 AS INT) AS n FROM documents),
w AS (
  SELECT doc_id, unnest(range(n // 256)) AS win_idx FROM d),
x AS (
  SELECT doc_id, CAST(win_idx AS INT) AS win_idx,
         CAST(list_sum(list_transform(range(256),
              i -> ((doc_id*11 + (win_idx*256 + i)*17) % 4096 - 2048)
                 * ((doc_id*11 + (win_idx*256 + i)*17) % 4096 - 2048)))
              AS BIGINT) AS energy
  FROM w),
act AS (SELECT * FROM x WHERE energy > 350000000),
seg AS (
  SELECT doc_id, win_idx, energy,
         CAST(sum(CASE WHEN prev IS NULL OR win_idx - prev > 1
                  THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY win_idx
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id
  FROM (SELECT *, lag(win_idx) OVER (PARTITION BY doc_id
                                     ORDER BY win_idx) AS prev
        FROM act))
SELECT doc_id, seg_id, min(win_idx) AS start_win, max(win_idx) AS end_win,
       count(*) AS n_windows, sum(energy) AS seg_energy
FROM seg GROUP BY doc_id, seg_id
"""


# ---------------------------------------------------------------------------
# block 14: deterministic epoch shuffle, registrable-domain rollup
# ---------------------------------------------------------------------------

def q_corpus_epoch_shuffle(spark, sf_dir):
    """Deterministic training-order shuffling — the epoch-reshuffle every
    training loader needs, as a pure map + rank: epoch e's order key is
    md5(e || doc_id), so each epoch is a different but REPRODUCIBLE
    permutation (restart-safe, no RNG state). Emitted for 2 epochs; the
    position is a per-epoch dense rank. At 100 TB the rank is a sort by
    the hash key (range-partitioned, one shuffle per epoch manifest) and
    the loader reads in key order instead of materializing positions."""
    d = _t(spark, sf_dir, "documents").select("doc_id")
    eps = d.crossJoin(spark.range(2).select(
        F.col("id").cast("int").alias("epoch")))
    key = F.md5(F.concat(F.col("epoch").cast("string"), F.lit("|"),
                         F.col("doc_id").cast("string")))
    w = Window.partitionBy("epoch").orderBy("shuffle_key")
    return (eps.withColumn("shuffle_key", key)
            .withColumn("position", F.row_number().over(w))
            .select("epoch", "doc_id", "shuffle_key", "position"))


ORACLE_CORPUS_EPOCH_SHUFFLE = """
WITH eps AS (
  SELECT doc_id, CAST(e AS INT) AS epoch,
         md5(CAST(e AS VARCHAR) || '|' || CAST(doc_id AS VARCHAR))
           AS shuffle_key
  FROM documents CROSS JOIN (SELECT unnest(range(2)) AS e))
SELECT epoch, doc_id, shuffle_key,
       CAST(row_number() OVER (PARTITION BY epoch ORDER BY shuffle_key)
            AS BIGINT) AS position
FROM eps
"""


# The embedded multi-label public-suffix set: the handful of two-level
# suffixes the fixture exercises. Production swaps in the full PSL file
# (publicsuffix.org) broadcast the same way the T9 dictionary is — the
# operator shape (longest-suffix match, then one label more) is identical.
_PSL_2LEVEL = ("co.uk", "com.au", "co.jp", "org.uk")


def q_host_domain_rollup(spark, sf_dir):
    """Registrable-domain extraction + rollup — the identity a polite
    crawler ACTUALLY rate-limits on (shop.example.co.uk and
    www.example.co.uk are one operator; P6's host_name is the
    reference's looser key): longest public-suffix match against the
    (broadcastable) suffix set, registrable = one label more than the
    suffix. Pure codegen CASE over split labels, then ONE
    map-side-combinable rollup counting hosts per registrable domain."""
    k = F.col("o_orderkey")
    host = (F.when(k % 5 == 0,
                   F.concat(F.lit("shop"), (k % 7).cast("string"),
                            F.lit(".example"), (k % 3).cast("string"),
                            F.lit(".co.uk")))
            .when(k % 5 == 1,
                  F.concat(F.lit("www.site"), (k % 11).cast("string"),
                           F.lit(".com.au")))
            .when(k % 5 == 2,
                  F.concat(F.lit("a.b.site"), (k % 11).cast("string"),
                           F.lit(".co.jp")))
            .when(k % 5 == 3,
                  F.concat(F.lit("host"), (k % 13).cast("string"),
                           F.lit(".onion")))
            .otherwise(F.concat(F.lit("plain"), (k % 13).cast("string"),
                                F.lit(".com"))))
    parts = F.split(host, r"\.")
    n = F.size(parts)
    two_suffix = F.concat_ws(".", F.element_at(parts, -2),
                             F.element_at(parts, -1))
    reg = (F.when(two_suffix.isin(*_PSL_2LEVEL) & (n >= 3),
                  F.concat_ws(".", F.element_at(parts, -3), two_suffix))
           .otherwise(F.concat_ws(".", F.element_at(parts, -2),
                                  F.element_at(parts, -1))))
    return (_t(spark, sf_dir, "orders")
            .select(host.alias("host"), reg.alias("registrable"))
            .groupBy("registrable")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct("host").alias("n_hosts")))


ORACLE_HOST_DOMAIN_ROLLUP = """
WITH h AS (
  SELECT CASE o_orderkey % 5
         WHEN 0 THEN 'shop' || (o_orderkey % 7) || '.example'
                 || (o_orderkey % 3) || '.co.uk'
         WHEN 1 THEN 'www.site' || (o_orderkey % 11) || '.com.au'
         WHEN 2 THEN 'a.b.site' || (o_orderkey % 11) || '.co.jp'
         WHEN 3 THEN 'host' || (o_orderkey % 13) || '.onion'
         ELSE 'plain' || (o_orderkey % 13) || '.com' END AS host
  FROM orders),
p AS (
  SELECT host, string_split(host, '.') AS parts FROM h),
r AS (
  SELECT host,
         CASE WHEN len(parts) >= 3
                   AND parts[-2] || '.' || parts[-1]
                       IN ('co.uk', 'com.au', 'co.jp', 'org.uk')
              THEN parts[-3] || '.' || parts[-2] || '.' || parts[-1]
              ELSE parts[-2] || '.' || parts[-1] END AS registrable
  FROM p)
SELECT registrable, count(*) AS n_urls,
       count(DISTINCT host) AS n_hosts
FROM r GROUP BY registrable
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


def q_graph_triangles(spark, sf_dir):
    """Host-graph triangle counting — the local-clustering signal that
    separates organic link neighborhoods from link farms (farms are
    near-cliques; PageRank alone can't see that). Standard distributed
    shape: orient every undirected edge low->high, join edges-on-source
    to build ordered wedges, close each wedge with one more equi-join —
    every triangle counted exactly once, never an all-pairs product.
    Emits per-host triangle counts (sum over the 3 corners)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    raw = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("t"), (k % 30).cast("string")).alias("u"),
        F.concat(F.lit("t"), ((c % 30) % 20).cast("string")).alias("v"))
        .filter(F.col("u") != F.col("v")))
    und = (raw.select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
           .distinct())
    e1 = und.select(F.col("a"), F.col("b"))
    wedge = (e1.alias("x").join(e1.alias("y"), F.col("x.a") == F.col("y.a"))
             .filter(F.col("x.b") < F.col("y.b"))
             .select(F.col("x.a").alias("a"), F.col("x.b").alias("b"),
                     F.col("y.b").alias("c")))
    tri = wedge.join(und.select(F.col("a").alias("b"),
                                F.col("b").alias("c")), ["b", "c"])
    corners = (tri.select(F.col("a").alias("host_key"))
               .unionByName(tri.select(F.col("b").alias("host_key")))
               .unionByName(tri.select(F.col("c").alias("host_key"))))
    return (corners.groupBy("host_key")
            .agg(F.count("*").alias("n_triangles")))


ORACLE_GRAPH_TRIANGLES = """
WITH raw AS (
  SELECT 't' || (o_orderkey % 30) AS u, 't' || ((o_custkey % 30) % 20) AS v
  FROM orders
  WHERE 't' || (o_orderkey % 30) <> 't' || ((o_custkey % 30) % 20)),
und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
wedge AS (
  SELECT x.a AS a, x.b AS b, y.b AS c
  FROM und x JOIN und y ON x.a = y.a AND x.b < y.b),
tri AS (
  SELECT w.a, w.b, w.c FROM wedge w
  JOIN und e ON e.a = w.b AND e.b = w.c),
corners AS (
  SELECT a AS host_key FROM tri
  UNION ALL SELECT b FROM tri
  UNION ALL SELECT c FROM tri)
SELECT host_key, count(*) AS n_triangles
FROM corners GROUP BY host_key
"""


# ---------------------------------------------------------------------------
# block 16: the crawler scheduling composition
# ---------------------------------------------------------------------------

def q_frontier_pipeline(spark, sf_dir):
    """The END-TO-END crawl-scheduling composition as ONE oracle row (the
    crawler-side twin of corpus_clean_full / spans_pipeline): pending
    frontier -> global budget apportioned across hosts by
    largest-remainder (exact integers, Σ alloc == budget) -> each host's
    TOP-alloc URLs by (installed_at, seq) priority -> politeness fetch
    slots (k-th pick waits k*crawl_delay). Every stage is verified
    standalone (frontier_budget / frontier_wave_select /
    frontier_schedule); this row verifies the COMPOSITION — a one-URL
    budget shift changes which rows exist and every later slot. All
    windows are host-partitioned (politeness-bucket sized) except the
    host-cardinality remainder rank."""
    BUDGET = 3_000
    k = F.col("o_orderkey")
    host_num = (k % 50).cast("int")
    fr = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), host_num.cast("string")).alias("host_key"),
        k.alias("seq"),
        F.col("o_orderdate").alias("installed_at"),
        (F.lit(500) + (host_num % 5) * 250).alias("delay_ms"))
    wts = fr.groupBy("host_key").agg(F.count("*").alias("wt"))
    tot = wts.agg(F.sum("wt").alias("tot"))
    base = (wts.crossJoin(F.broadcast(tot))
            .select("host_key", "wt",
                    F.expr(f"({BUDGET} * wt) DIV tot").alias("base"),
                    F.expr(f"({BUDGET} * wt) % tot").alias("rem")))
    kdf = base.agg((F.lit(BUDGET) - F.sum("base")).alias("k"))
    wrk = Window.orderBy(F.desc("rem"), F.asc("host_key"))
    alloc = (base.crossJoin(F.broadcast(kdf))
             .withColumn("rk", F.row_number().over(wrk))
             .select("host_key",
                     (F.col("base")
                      + F.when(F.col("rk") <= F.col("k"), 1).otherwise(0))
                     .cast("long").alias("alloc")))
    wp = Window.partitionBy("host_key").orderBy("installed_at", "seq")
    picked = (fr.withColumn("prio_rank", F.row_number().over(wp))
              .join(F.broadcast(alloc), "host_key")
              .filter(F.col("prio_rank") <= F.col("alloc")))
    return picked.select(
        "host_key", "seq", "prio_rank",
        ((F.col("prio_rank") - 1) * F.col("delay_ms"))
        .cast("bigint").alias("fetch_at_ms"))


ORACLE_FRONTIER_PIPELINE = """
WITH fr AS (
  SELECT 'h' || (o_orderkey % 50) AS host_key, o_orderkey AS seq,
         o_orderdate AS installed_at,
         500 + ((o_orderkey % 50) % 5) * 250 AS delay_ms
  FROM orders),
wts AS (SELECT host_key, count(*) AS wt FROM fr GROUP BY host_key),
tot AS (SELECT sum(wt) AS tot FROM wts),
base AS (
  SELECT host_key, wt, (3000 * wt) // tot AS base, (3000 * wt) % tot AS rem
  FROM wts, tot),
kv AS (SELECT 3000 - sum(base) AS k FROM base),
alloc AS (
  SELECT host_key,
         CAST(base + CASE WHEN rk <= (SELECT k FROM kv) THEN 1 ELSE 0 END
              AS BIGINT) AS alloc
  FROM (SELECT host_key, base,
               row_number() OVER (ORDER BY rem DESC, host_key ASC) AS rk
        FROM base)),
ranked AS (
  SELECT host_key, seq, delay_ms,
         row_number() OVER (PARTITION BY host_key
                            ORDER BY installed_at, seq) AS prio_rank
  FROM fr)
SELECT r.host_key, r.seq, CAST(r.prio_rank AS BIGINT) AS prio_rank,
       CAST((r.prio_rank - 1) * r.delay_ms AS BIGINT) AS fetch_at_ms
FROM ranked r JOIN alloc a ON a.host_key = r.host_key
WHERE r.prio_rank <= a.alloc
"""


def q_text_bpe_train_step(spark, sf_dir):
    """The BPE TRAINING step as an oracle row (the tokenizer twin of
    embeddings_kmeans_step): symbol-pair frequencies of the corpus after
    the frozen merge list — exactly the table whose (cnt desc, a, b)
    argmax bpe_train picks as the next merge. One word-count shuffle,
    chained codegen merge rewrites, one map-side-combinable groupBy
    (operators/tokenize.py:bpe_pair_counts)."""
    from genesis_spark.operators.tokenize import bpe_pair_counts

    return bpe_pair_counts(_t(spark, sf_dir, "documents"), _BPE_MERGES)


ORACLE_TEXT_BPE_TRAIN_STEP = f"""
WITH words AS (
  SELECT word, count(*) AS n
  FROM (SELECT unnest(string_split_regex(lower(text), '\\s+')) AS word
        FROM documents)
  WHERE word <> '' GROUP BY word
),
sym AS (
  SELECT string_split_regex(trim({_bpe_apply_sql(_BPE_MERGES)}), ' +')
           AS t, n
  FROM words
),
pairs AS (
  SELECT unnest(list_transform(range(len(t) - 1),
                i -> {{'a': t[i + 1], 'b': t[i + 2]}})) AS p, n
  FROM sym WHERE len(t) >= 2
)
SELECT p['a'] AS a, p['b'] AS b, CAST(sum(n) AS BIGINT) AS cnt
FROM pairs GROUP BY p['a'], p['b']
"""


def q_corpus_profile(spark, sf_dir):
    """Data-card corpus profile: every (source, lang) slice PLUS the
    per-source, per-lang, and grand-total rollups in ONE pass via
    CUBE — Spark plans a single partial-agg shuffle that feeds all four
    grouping sets instead of four scans, exactly how a 100 TB corpus
    summary should be produced. grouping_id disambiguates a genuine
    NULL dim from a rolled-up one."""
    d = _t(spark, sf_dir, "documents")
    return (d.cube("source", "lang").agg(
        F.grouping_id().alias("gid"),
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.countDistinct("lang").alias("n_langs")))


ORACLE_CORPUS_PROFILE = """
SELECT source, lang,
       CAST(GROUPING(source) * 2 + GROUPING(lang) AS BIGINT) AS gid,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       min(n_chars) AS min_chars,
       max(n_chars) AS max_chars,
       count(DISTINCT lang) AS n_langs
FROM documents
GROUP BY CUBE(source, lang)
"""


def q_events_scd2(spark, sf_dir):
    """SCD type-2 derivation from a change log: per user, consecutive
    equal event_type runs collapse into validity intervals
    [valid_from, valid_to) with valid_to = the next run's start (NULL =
    current) — the lag -> change-flag -> running-sum -> groupBy shape,
    all window work inside ONE per-user shuffle (the same partitioning
    serves both windows and the final lead)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (e.select("user_id", "event_type", "ts", "event_id")
            .withColumn("chg", F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1).otherwise(0))
            .withColumn("run_id", F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .groupBy("user_id", "run_id").agg(
                F.first("event_type").alias("state"),
                F.min("ts").alias("valid_from"),
                F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id", F.col("run_id").cast("long").alias("run_id"), "state",
        "valid_from", F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events")


ORACLE_EVENTS_SCD2 = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
), agg AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         any_value(event_type) AS state,
         min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, run_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       n_events
FROM agg
"""


_RP_OUT_DIM, _RP_SIGN_TABLE = 16, 7


def q_embeddings_rp(spark, sf_dir):
    """Johnson-Lindenstrauss random projection 64d -> 16d (the cheap
    dim-reduction pass upstream of IVF/KMeans training at 10^10
    vectors): deterministic +-1 matrix folded into the plan as array
    literals, zero-shuffle codegen arithmetic, floor-quantized int
    codes so the hash check is cross-engine exact
    (operators/similarity.py:random_projection)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = SIM.random_projection(emb, out_dim=_RP_OUT_DIM, dim=_PQ_DIM,
                                sign_table=_RP_SIGN_TABLE)
    return out.select(
        "vec_id", F.array_join("rp_codes", ",").alias("codes_csv"))


def _rp_oracle() -> str:
    projs = []
    for signs in SIM.hyperplane_signs(_RP_SIGN_TABLE, _RP_OUT_DIM,
                                      _PQ_DIM):
        lit = "[" + ", ".join(f"{s:.1f}" for s in signs) + "]"
        projs.append(
            f"CAST(floor(250.0 * list_sum(list_transform("
            f"range({_PQ_DIM}), i -> embedding[i+1]::DOUBLE * "
            f"({lit})[i+1]))) AS INT)")
    arr = ", ".join(projs)
    return f"""
SELECT vec_id, array_to_string([{arr}], ',') AS codes_csv
FROM embeddings
"""


ORACLE_EMBEDDINGS_RP = _rp_oracle()


_COMPACT_TARGET = 65536


def q_corpus_compact(spark, sf_dir):
    """Small-file compaction PLANNER (the Iceberg bin-pack shape —
    rewrite_data_files — planned in SQL): per source partition, docs in
    doc_id order pack greedily into output files of ~64 KiB via
    running-bytes-before // target, emitting the per-file manifest a
    compactor would execute. ONE shuffle on the partition key serves
    both the window and the final rollup. Sources are bounded (a
    partition dim), so the per-key running sum is safe; for unbounded
    keys the hierarchical prefix decomposition in operators/pack.py is
    the proven scale path."""
    d = _t(spark, sf_dir, "documents")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (d.select(
                "source", "doc_id", "n_chars",
                F.floor((F.sum("n_chars").over(w) - F.col("n_chars"))
                        / F.lit(_COMPACT_TARGET)).alias("file_id"))
            .groupBy("source", "file_id").agg(
                F.count("*").alias("n_docs"),
                F.sum("n_chars").alias("file_bytes"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc")))


ORACLE_CORPUS_COMPACT = f"""
WITH planned AS (
  SELECT source, doc_id, n_chars,
         CAST(floor((sum(n_chars) OVER (PARTITION BY source
                       ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                     - n_chars) / {_COMPACT_TARGET}) AS BIGINT) AS file_id
  FROM documents
)
SELECT source, file_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS file_bytes,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM planned GROUP BY source, file_id
"""


def q_corpus_shard_manifest(spark, sf_dir):
    """Reproducible training-shard manifest: docs route to 16 shards by
    a portable 60-bit md5 key hash, and each shard's manifest carries an
    ORDER-INDEPENDENT bit_xor content checksum over (doc_id, text)
    hashes — the artifact that lets a rerun (or another engine) verify a
    100 TB shard byte-for-byte without re-sorting it. Pure map + one
    map-side-combinable groupBy of 16 rows."""
    d = _t(spark, sf_dir, "documents")
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "", F.col("doc_id").cast("string"), "text")), 1, 15),
        16, 10).cast("long")
    shard = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
               16, 10).cast("long"), F.lit(16))
    return (d.select(shard.alias("shard"), h.alias("h"), "doc_id")
            .groupBy("shard").agg(
                F.count("*").alias("n_docs"),
                F.expr("bit_xor(h)").alias("checksum"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc")))


ORACLE_CORPUS_SHARD_MANIFEST = """
WITH keyed AS (
  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) % 16 AS shard,
         CAST(('0x' || substr(md5(doc_id || chr(1) || text), 1, 15))
              AS BIGINT) AS h,
         doc_id
  FROM documents
)
SELECT shard, count(*) AS n_docs, bit_xor(h) AS checksum,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM keyed GROUP BY shard
"""


def q_events_late_audit(spark, sf_dir):
    """Watermark-sizing audit (how the streaming rows' delays were NOT
    guessed): replaying events in arrival order (event_id) per
    user-partition, an event is late by how far the partition's
    running-max event time has moved past its own — the per-partition
    watermark model Kafka sources use; pure timestamp/interval
    comparisons keep it exact and timezone-free on TIMESTAMP_NTZ. The bucketed histogram per event_type says exactly how
    many rows each candidate ``withWatermark`` delay would drop. One
    shuffle; the window and rollup share the user_id partitioning."""
    e = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_max = F.max("ts").over(w)
    bucket = (F.when(prev_max.isNull() | (prev_max <= F.col("ts")),
                     "on_time")
              .when(prev_max <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
                    "1h")
              .when(prev_max <= F.col("ts") + F.expr("INTERVAL 1 DAY"),
                    "1d")
              .otherwise("over_1d"))
    return (e.select("event_type", bucket.alias("late_bucket"))
            .groupBy("event_type", "late_bucket")
            .agg(F.count("*").alias("n_events")))


ORACLE_EVENTS_LATE_AUDIT = """
WITH lat AS (
  SELECT event_type, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events
)
SELECT event_type,
       CASE WHEN prev_max IS NULL OR prev_max <= ts THEN 'on_time'
            WHEN prev_max <= ts + INTERVAL 1 HOUR THEN '1h'
            WHEN prev_max <= ts + INTERVAL 1 DAY THEN '1d'
            ELSE 'over_1d' END AS late_bucket,
       count(*) AS n_events
FROM lat GROUP BY 1, 2
"""


def q_text_bm25_topk(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75, Lucene ``ln(1+(N-df+.5)/(df+.5))``
    idf) for the fixed query {hash, merge, vector} — the SEARCH-side twin
    of text_tfidf_topk: rank documents for a query instead of terms for a
    document. Every scoring input (doc length, avgdl, df, N) is computed
    in-plan — no driver-side literals — and the per-term contributions
    are quantized to 1e-6 integer units BEFORE the per-doc sum, so the
    final score is exact integer arithmetic (float summation order can't
    flip the driver hash).

    Plan/scale: one token shuffle (per-doc length), one (doc,term) agg
    over the 3 matched terms only (filter pushes the query terms into the
    scan side of the explode), df + corpus stats are 3-row / 1-row
    aggregates broadcast back, final top-10 is a TakeOrdered on ~N scored
    docs. No all-pairs, no UDF; at 100 TB the only wide exchange is the
    doc_id-partitioned length/term agg."""
    QUERY = ["hash", "merge", "vector"]
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"))
        .filter(F.length("term") >= 1))
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.sum("dl").alias("tot"), F.count("*").alias("nd"))
    qtf = (toks.filter(F.col("term").isin(QUERY))
           .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    df = qtf.groupBy("term").agg(F.count("*").alias("df"))
    contrib = (F.log((F.col("nd") - F.col("df") + 0.5) /
                     (F.col("df") + 0.5) + 1.0) *
               (F.col("tf") * 2.2) /
               (F.col("tf") + 1.2 * (0.25 + 0.75 * F.col("dl") *
                                     F.col("nd") / F.col("tot"))))
    scored = (qtf.join(F.broadcast(df), "term")
              .join(dl, "doc_id")
              .crossJoin(F.broadcast(stats))
              .withColumn("contrib_u",
                          F.round(contrib * 1e6).cast("long")))
    ranked = (scored.groupBy("doc_id")
              .agg(F.count("*").alias("n_terms"),
                   F.sum("contrib_u").alias("score_u")))
    w = Window.orderBy(F.desc("score_u"), F.asc("doc_id"))
    return (ranked.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 10)
            .select("doc_id", "n_terms", "score_u", "rank"))


ORACLE_TEXT_BM25_TOPK = """
WITH toks AS (
  SELECT doc_id, t.term FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 1
),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
stats AS (SELECT CAST(sum(dl) AS BIGINT) AS tot, count(*) AS nd FROM dl),
qtf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ('hash', 'merge', 'vector') GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM qtf GROUP BY term),
scored AS (
  SELECT qtf.doc_id,
         CAST(round(ln((nd - df + 0.5) / (df + 0.5) + 1.0)
                    * (tf * 2.2::DOUBLE)
                    / (tf + 1.2 * (0.25 + 0.75 * dl * nd / tot))
                    * 1000000.0) AS BIGINT) AS contrib_u
  FROM qtf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats),
ranked AS (
  SELECT doc_id, count(*) AS n_terms,
         CAST(sum(contrib_u) AS BIGINT) AS score_u
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_terms, score_u, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY score_u DESC, doc_id ASC) AS rank
  FROM ranked) WHERE rank <= 10
"""


def q_corpus_dsir_resample(spark, sf_dir):
    """DSIR-style importance resampling weights (Xie et al. 2023,
    arXiv:2302.03169): a hashed-unigram bag-of-words LM for the TARGET
    slice (source='src18', the high-quality-domain stand-in) vs the RAW
    pool (all documents); each doc's importance weight is the sum over
    its tokens of the log-likelihood ratio of the token's hash bucket
    (64 buckets, add-one smoothing). Per-bucket log-ratios quantize to
    1e-6 integer units so the per-doc sum is exact integer arithmetic —
    order-independent across engines. Top-20 by weight = the docs DSIR
    would resample into the training mix first.

    Plan/scale: the token stream shuffles ONCE for the 64-row bucket
    census (map-side combine does nearly all the work — 64 keys); the
    ratio table and the corpus totals are broadcast back onto the token
    stream, and the per-doc weight agg partitions by doc_id. The bucket
    table stays O(64) no matter the corpus size, so at 100 TB this is
    two partial-agg shuffles and zero joins wider than a broadcast."""
    target = "src18"
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = (d.select(
        "doc_id", "source",
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"))
        .filter(F.length("term") >= 2)
        .withColumn("bucket",
                    F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
                    .cast("long") % 64))
    census = (toks.groupBy("bucket")
              .agg(F.count("*").alias("rc"),
                   F.sum((F.col("source") == target).cast("long"))
                   .alias("tc")))
    totals = census.agg(F.sum("rc").alias("tr"), F.sum("tc").alias("tt"))
    lr_u = (F.round((F.log((F.col("tc") + 1.0) / (F.col("tt") + 64.0)) -
                     F.log((F.col("rc") + 1.0) / (F.col("tr") + 64.0)))
                    * 1e6).cast("long"))
    ratios = (census.crossJoin(F.broadcast(totals))
              .select("bucket", lr_u.alias("lr_u")))
    weights = (toks.join(F.broadcast(ratios), "bucket")
               .groupBy("doc_id")
               .agg(F.count("*").alias("n_toks"),
                    F.sum("lr_u").alias("weight_u")))
    w = Window.orderBy(F.desc("weight_u"), F.asc("doc_id"))
    return (weights.join(d.select("doc_id", "source"), "doc_id")
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 20)
            .select("doc_id", "source", "n_toks", "weight_u", "rank"))


ORACLE_CORPUS_DSIR_RESAMPLE = """
WITH toks AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(t.term), 1, 8))::BIGINT % 64 AS bucket
  FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 2
),
census AS (
  SELECT bucket, count(*) AS rc,
         CAST(sum(CASE WHEN source = 'src18' THEN 1 ELSE 0 END) AS BIGINT)
           AS tc
  FROM toks GROUP BY bucket),
totals AS (SELECT CAST(sum(rc) AS BIGINT) AS tr,
                  CAST(sum(tc) AS BIGINT) AS tt FROM census),
ratios AS (
  SELECT bucket,
         CAST(round((ln((tc + 1.0) / (tt + 64.0))
                     - ln((rc + 1.0) / (tr + 64.0))) * 1000000.0)
              AS BIGINT) AS lr_u
  FROM census CROSS JOIN totals),
weights AS (
  SELECT doc_id, count(*) AS n_toks,
         CAST(sum(lr_u) AS BIGINT) AS weight_u
  FROM toks JOIN ratios USING (bucket) GROUP BY doc_id)
SELECT w.doc_id, d.source, w.n_toks, w.weight_u,
       CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY weight_u DESC, doc_id ASC)
        AS rank FROM weights) w
JOIN documents d ON w.doc_id = d.doc_id
WHERE rank <= 20
"""


def q_text_hashed_lr(spark, sf_dir):
    """fastText-style hashed-bigram linear classifier scoring (Joulin et
    al. 2016, arXiv:1607.01759): bigrams hash into 256 buckets, each
    bucket carries a FROZEN weight in milli-units (derived here
    deterministically from md5 of the bucket index — a trained model
    swaps in its weight table through the same expression, exactly like
    the T9 dictionary broadcast), doc score = integer sum of its bigram
    weights, keep/drop at score > 0. This is the learned-quality-
    classifier scoring path (the Gopher rules' model-based sibling):
    all-JVM codegen, zero Python.

    Plan/scale: bigrams come from one array transform per doc (no
    self-join, no window); the weight lookup is a pure EXPRESSION on the
    bucket id (no join at all), and the only shuffle is the per-doc
    integer sum. At 100 TB: embarrassingly parallel scoring plus one
    doc_id-partitioned agg."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    arr = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                   lambda x: F.length(x) >= 1)
    bigrams = F.when(
        F.size(arr) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(arr) - 1),
                    lambda i: F.concat(F.element_at(arr, i), F.lit("_"),
                                       F.element_at(arr, i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bg = d.select("doc_id", F.explode_outer(bigrams).alias("bigram"))
    bucket = (F.conv(F.substring(F.md5("bigram"), 1, 8), 16, 10)
              .cast("long") % 256)
    weight = (F.conv(F.substring(
        F.md5(F.concat(F.lit("w1|"), bucket.cast("string"))), 1, 8),
        16, 10).cast("long") % 2001) - 1000
    scored = bg.select(
        "doc_id",
        F.when(F.col("bigram").isNotNull(), weight)
        .otherwise(F.lit(0)).alias("w"),
        F.col("bigram").isNotNull().cast("long").alias("hit"))
    return (scored.groupBy("doc_id")
            .agg(F.sum("hit").alias("n_bigrams"),
                 F.sum("w").alias("score_u"))
            .withColumn("label", F.when(F.col("score_u") > 0, "keep")
                        .otherwise("drop"))
            .select("doc_id", "n_bigrams", "score_u", "label"))


ORACLE_TEXT_HASHED_LR = """
WITH arrs AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> len(x) >= 1) AS w
  FROM documents),
bg AS (
  SELECT doc_id, u.bigram FROM arrs,
       UNNEST(CASE WHEN len(w) >= 2
                THEN list_transform(range(1, len(w)),
                                    i -> w[i] || '_' || w[i + 1])
                ELSE [NULL] END) AS u(bigram)),
scored AS (
  SELECT doc_id,
         CASE WHEN bigram IS NULL THEN 0 ELSE
           ((('0x' || substr(md5('w1|' ||
                 (('0x' || substr(md5(bigram), 1, 8))::BIGINT % 256)),
               1, 8))::BIGINT % 2001) - 1000) END AS w,
         CASE WHEN bigram IS NULL THEN 0 ELSE 1 END AS hit
  FROM bg)
SELECT doc_id, CAST(sum(hit) AS BIGINT) AS n_bigrams,
       CAST(sum(w) AS BIGINT) AS score_u,
       CASE WHEN sum(w) > 0 THEN 'keep' ELSE 'drop' END AS label
FROM scored GROUP BY doc_id
"""


def q_graph_neighbor_jaccard(spark, sf_dir):
    """Out-neighbor Jaccard similarity between host pairs — the
    mirror-site / link-farm co-citation signal (two hosts whose outlink
    sets nearly coincide are one logical site; PageRank and triangle
    counts can't see this). Pairs are generated ONLY through shared
    neighbors (wedge join on dst, a<b orientation) — never all-pairs —
    then |A∪B| = deg_a + deg_b - common closes the Jaccard exactly in
    integer arithmetic; the 4-dp division is the only float.

    Plan/scale: distinct edge shuffle, one self-equi-join on dst (fan-out
    bounded by per-dst in-degree — the crawl analogue of the LSH band
    join; at 100 TB skewed dst hubs get capped/salted exactly like the
    minhash band path), pair agg, broadcast degree join. Output is the
    global top-25 most-similar pairs (rank on the ROUNDED score so tie
    order is engine-independent) — a fixed threshold can't discriminate
    across graph densities, the top-k mirror-candidate list always
    does."""
    o = _t(spark, sf_dir, "orders")
    src = F.concat(F.lit("h"), (F.col("o_orderkey") % 50).cast("string"))
    dst = F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string"))
    edges = (o.select(src.alias("src"), dst.alias("dst"))
             .filter(F.col("src") != F.col("dst")).distinct())
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    a = edges.select(F.col("src").alias("host_a"), "dst")
    b = edges.select(F.col("src").alias("host_b"), "dst")
    common = (a.join(b, "dst")
              .filter(F.col("host_a") < F.col("host_b"))
              .groupBy("host_a", "host_b")
              .agg(F.count("*").alias("n_common")))
    da = deg.select(F.col("src").alias("host_a"),
                    F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("host_b"),
                    F.col("deg").alias("deg_b"))
    scored = (common.join(F.broadcast(da), "host_a")
              .join(F.broadcast(db), "host_b")
              .withColumn("jaccard",
                          F.round(F.col("n_common") /
                                  (F.col("deg_a") + F.col("deg_b") -
                                   F.col("n_common")), 4)))
    w = Window.orderBy(F.desc("jaccard"), F.asc("host_a"),
                       F.asc("host_b"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 25)
            .select("host_a", "host_b", "n_common", "jaccard", "rank"))


ORACLE_GRAPH_NEIGHBOR_JACCARD = """
WITH e AS (
  SELECT DISTINCT 'h' || (o_orderkey % 50) AS src,
                  'h' || (o_custkey % 50) AS dst
  FROM orders
  WHERE 'h' || (o_orderkey % 50) <> 'h' || (o_custkey % 50)),
deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
common AS (
  SELECT a.src AS host_a, b.src AS host_b, count(*) AS n_common
  FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
  GROUP BY a.src, b.src),
j AS (
  SELECT host_a, host_b, n_common,
         round(n_common / (da.deg + db.deg - n_common), 4) AS jaccard
  FROM common
  JOIN deg da ON da.src = host_a
  JOIN deg db ON db.src = host_b)
SELECT host_a, host_b, n_common, jaccard, CAST(rank AS INT) AS rank
FROM (SELECT *, row_number() OVER (ORDER BY jaccard DESC, host_a ASC,
                                   host_b ASC) AS rank FROM j)
WHERE rank <= 25
"""


def q_events_cdc_apply(spark, sf_dir):
    """CDC changelog materialization (the Debezium-consumer shape): the
    events stream is read as a per-user change log ordered by
    (ts, event_id); 'error' events are tombstones (D), everything else
    upserts (U). Applying the log = last-writer-wins per key, with a
    trailing tombstone deleting the key entirely. Complements
    events_scd2 (full history intervals) and frontier_merge_upsert
    (single-batch merge): this is the multi-op-per-key, order-sensitive
    apply. Output: surviving keys with their final state + op census.

    Plan/scale: ONE shuffle (user_id window); the rollup reuses the same
    partitioning. At 100 TB the log is processed per-key-partition with
    no join at all — the canonical snapshot-maintenance pattern."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    op = (F.when(F.col("event_type") == "error", "D")
          .otherwise("U"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    ranked = (e.withColumn("op", op)
              .withColumn("rn", F.row_number().over(w)))
    census = (ranked.groupBy("user_id")
              .agg(F.count("*").alias("n_ops"),
                   F.sum((F.col("op") == "D").cast("long"))
                   .alias("n_deletes")))
    last = (ranked.filter(F.col("rn") == 1)
            .select("user_id", F.col("op").alias("last_op"),
                    F.col("event_id").alias("last_event_id"),
                    F.col("value").alias("last_value")))
    return (last.filter(F.col("last_op") != "D")
            .join(census, "user_id")
            .select("user_id", "last_event_id",
                    F.round("last_value", 2).alias("last_value"),
                    "n_ops", "n_deletes"))


ORACLE_EVENTS_CDC_APPLY = """
WITH log AS (
  SELECT event_id, ts, user_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
census AS (
  SELECT user_id, count(*) AS n_ops,
         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deletes
  FROM log GROUP BY user_id),
last AS (
  SELECT user_id, op AS last_op, event_id AS last_event_id,
         value AS last_value
  FROM log WHERE rn = 1)
SELECT l.user_id, l.last_event_id, round(l.last_value, 2) AS last_value,
       c.n_ops, c.n_deletes
FROM last l JOIN census c USING (user_id)
WHERE l.last_op <> 'D'
"""


def q_text_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's DISTINCT
    5-gram shingles whose first corpus occurrence (min doc_id) is the
    doc itself. Template spam and boilerplate-heavy mirrors score near
    zero (their shingles all debuted elsewhere); the injected corpus
    twins make the signal deterministic. This is the within-corpus
    contamination lens next to dedup_decontaminate's cross-set one.

    Plan/scale: shingle explode -> distinct (doc, shingle) -> the
    first-occurrence agg partitions by shingle (one wide shuffle, the
    same shape dedup_exact_substr already carries at 100 TB) -> join
    back on shingle reuses that partitioning -> per-doc agg. Novelty is
    an integer ratio rounded at 4 dp."""
    corpus = _corpus(spark, sf_dir)
    sh = (corpus.select(
        "doc_id",
        F.explode(D.shingles_expr(F.col("text"), 5)).alias("shingle"))
        .distinct())
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (sh.join(first, "shingle")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.sum((F.col("first_doc") == F.col("doc_id"))
                       .cast("long")).alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel") / F.col("n_shingles"),
                                4))
            .select("doc_id", "n_shingles", "n_novel", "novelty"))


ORACLE_TEXT_NGRAM_NOVELTY = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(5)},
dsh AS (SELECT DISTINCT doc_id, shingle FROM sh),
first AS (SELECT shingle, min(doc_id) AS first_doc FROM dsh
          GROUP BY shingle),
agg AS (
  SELECT doc_id, count(*) AS n_shingles,
         CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
              AS BIGINT) AS n_novel
  FROM dsh JOIN first USING (shingle) GROUP BY doc_id)
SELECT doc_id, n_shingles, n_novel,
       round(n_novel / n_shingles, 4) AS novelty
FROM agg
"""


def q_ann_recall_eval(spark, sf_dir):
    """Recall@5 of the two production ANN paths (hyperplane-LSH and
    IVF-flat) against the brute-force cosine truth — the ANN twin of
    dedup_minhash_eval: the approximation quality the 100 TB similarity
    path relies on, MEASURED inside the engine and value-hashed, not
    asserted in a notebook. Zero-hit queries still emit a row (left join
    from the truth's query set) so recall collapse is visible, never
    silently absent.

    Plan/scale: truth is brute-force only over the 10 probe queries
    (bounded), the two approximations are the same bucket-join plans
    their own rows carry; the grading join is (query_id, neighbor_id)
    equi — tiny. The expensive parts reuse the exact operator code paths
    (SIM.cosine_topk / lsh_topk / ivf_topk), so this row also pins their
    interfaces."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    truth = (SIM.cosine_topk(emb, qs, k=5)
             .select("query_id", "neighbor_id"))
    qids = truth.select("query_id").distinct()

    def graded(approx, method):
        hits = (approx.select("query_id", "neighbor_id")
                .join(truth, ["query_id", "neighbor_id"])
                .groupBy("query_id").agg(F.count("*").alias("n")))
        return (qids.join(hits, "query_id", "left")
                .select(F.lit(method).alias("method"), "query_id",
                        F.coalesce("n", F.lit(0)).alias("n_hits"))
                .withColumn("recall",
                            F.round(F.col("n_hits") / 5.0, 4)))

    lsh = SIM.lsh_topk(emb, qs, k=5, n_planes=_LSH_PLANES,
                       n_tables=_LSH_TABLES, dim=_LSH_DIM)
    ivf = SIM.ivf_topk(emb, qs, k=5, n_centroids=_IVF_CENTROIDS,
                       n_probe=_IVF_PROBE, dim=_IVF_DIM)
    return graded(lsh, "lsh").unionByName(graded(ivf, "ivf"))


ORACLE_ANN_RECALL_EVAL = f"""
WITH truth AS (
  SELECT query_id, neighbor_id FROM ({ORACLE_ANN_COSINE}) t),
lsh AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_LSH}) l),
ivf AS (SELECT query_id, neighbor_id FROM ({ORACLE_ANN_IVF}) v),
qids AS (SELECT DISTINCT query_id FROM truth),
lh AS (SELECT t.query_id, count(*) AS n FROM lsh
       JOIN truth t USING (query_id, neighbor_id) GROUP BY t.query_id),
ih AS (SELECT t.query_id, count(*) AS n FROM ivf
       JOIN truth t USING (query_id, neighbor_id) GROUP BY t.query_id)
SELECT 'lsh' AS method, q.query_id,
       CAST(coalesce(lh.n, 0) AS BIGINT) AS n_hits,
       round(coalesce(lh.n, 0) / 5.0, 4) AS recall
FROM qids q LEFT JOIN lh USING (query_id)
UNION ALL
SELECT 'ivf' AS method, q.query_id,
       CAST(coalesce(ih.n, 0) AS BIGINT) AS n_hits,
       round(coalesce(ih.n, 0) / 5.0, 4) AS recall
FROM qids q LEFT JOIN ih USING (query_id)
"""


def q_corpus_quality_ensemble(spark, sf_dir):
    """The composed quality GATE a production corpus actually ships:
    rubric score, token-length bounds, and the learned hashed-bigram
    classifier evaluated per doc, collapsed into one FIRST-FAILING-REASON
    verdict (the order is the contract: low_quality -> too_short ->
    too_long -> model_drop -> keep). Output is the reason census with a
    doc_id checksum per bucket, so one doc sliding from 'keep' to any
    reject bucket — or flipping between reject reasons — breaks the
    hash. Composition row beside corpus_clean/corpus_clean_full: those
    verify dedup-chain composition, this verifies the filter-*decision*
    composition.

    Plan/scale: every signal is a map-side expression except the
    classifier's per-doc sum (one doc_id-partitioned agg); the verdict
    join is doc_id-equi on that same partitioning and the census is a
    5-key agg. No UDF, no Python."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.select(
        "doc_id",
        TS.quality_score_expr(F.col("text")).alias("q"),
        F.size(F.split(F.col("text"), " ")).alias("ntok"))
    lr = q_text_hashed_lr(spark, sf_dir).select("doc_id", "score_u")
    verdict = (F.when(F.col("q") < 80, "low_quality")
               .when(F.col("ntok") < 20, "too_short")
               .when(F.col("ntok") > 1000, "too_long")
               .when(F.col("score_u") <= 0, "model_drop")
               .otherwise("keep"))
    return (base.join(lr, "doc_id")
            .select(verdict.alias("verdict"), "doc_id")
            .groupBy("verdict")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("doc_id").alias("id_checksum")))


ORACLE_CORPUS_QUALITY_ENSEMBLE = f"""
WITH lr AS (SELECT doc_id, score_u FROM ({ORACLE_TEXT_HASHED_LR}) h),
{_quality_cte("doc_id", "documents")},
base AS (
  SELECT d.doc_id, qs.q, len(string_split(d.text, ' ')) AS ntok
  FROM documents d JOIN qs USING (doc_id)),
v AS (
  SELECT b.doc_id,
         CASE WHEN q < 80 THEN 'low_quality'
              WHEN ntok < 20 THEN 'too_short'
              WHEN ntok > 1000 THEN 'too_long'
              WHEN score_u <= 0 THEN 'model_drop'
              ELSE 'keep' END AS verdict
  FROM base b JOIN lr USING (doc_id))
SELECT verdict, count(*) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM v GROUP BY verdict
"""


def q_stream_upsert(spark, sf_dir):
    """8th streaming capability — stream==batch equivalence for SNAPSHOT
    MAINTENANCE: the events change log replayed as per-file micro-batches
    (file order deliberately uncontrolled) through a foreachBatch
    CDC-merge (streaming/pipeline.run_upsert_stream) that keeps the
    later (ts, event_id) per key, retains tombstones, and adds op
    counters. The final snapshot, filtered and projected, must equal the
    BATCH events_cdc_apply row exactly — same oracle SQL verbatim. This
    is the north star's "frontier state checkpoints ... crash-resume"
    contract exercised through real Structured Streaming machinery with
    out-of-order delivery."""
    import os
    import tempfile

    from genesis_spark.streaming.pipeline import run_upsert_stream

    e = _t(spark, sf_dir, "events")
    tmp = tempfile.mkdtemp(prefix="gs_upsert_")
    src = os.path.join(tmp, "events")
    e.repartition(4).write.mode("overwrite").parquet(src)
    snap = run_upsert_stream(spark, src, tmp)
    return (snap.filter(F.col("op") != "D")
            .select("user_id",
                    F.col("event_id").alias("last_event_id"),
                    F.round("value", 2).alias("last_value"),
                    "n_ops", "n_deletes"))


ORACLE_STREAM_UPSERT = ORACLE_EVENTS_CDC_APPLY


def q_media_phash_pairs(spark, sf_dir):
    """Near-duplicate IMAGE pairs by perceptual-hash hamming distance —
    the multimodal twin of dedup_simhash64: candidates share at least
    one of the 4 16-bit aHash segments (4 band equi-joins + union —
    never all-pairs), then the EXACT 64-bit hamming distance (bit_count
    of per-segment xor, pure integer) keeps pairs <= 8. By pigeonhole
    the band filter is lossless for hamming <= 3 (three differing bits
    cannot touch all four segments) and heuristic above that: a
    4-8-bit pair spread across all four segments is missed — the same
    banded-recall tradeoff dedup_simhash64 documents. The oracle replays pixels, bit packing, OR-candidates,
    and popcount in SQL, so Spark and oracle agree on EXACTLY the same
    candidate-filtered pair set.

    Plan/scale: the Arrow hash kernel appears in exactly TWO leaves
    (the two sides of one (band, value)-keyed self-join; AQE's
    runtime exchange reuse can collapse them further) — NOT the
    4-join x 2-side + 2-rescore shape, which would re-encode and
    re-hash the corpus ~10x. Each side posexplodes its 4 segments into
    (band, value) keys and CARRIES all 4 segments through the join, so
    hamming rescoring needs no join-back; duplicate candidates (pairs
    agreeing on several bands) collapse in one distinct. Band buckets
    are 16-bit-bounded. Same shape that dedups 10^9 images."""
    segs = _phash_segs(spark, sf_dir)
    segcols = [f"seg{k}" for k in range(4)]
    bands = segs.select(
        "doc_id", *segcols,
        F.posexplode(F.array(*segcols)).alias("band", "val"))
    a = bands.select(F.col("doc_id").alias("id_a"),
                     *[F.col(c).alias(f"a{k}")
                       for k, c in enumerate(segcols)],
                     "band", "val")
    b = bands.select(F.col("doc_id").alias("id_b"),
                     *[F.col(c).alias(f"b{k}")
                       for k, c in enumerate(segcols)],
                     "band", "val")
    pairs = (a.join(b, ["band", "val"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b",
                     *[f"a{k}" for k in range(4)],
                     *[f"b{k}" for k in range(4)])
             .distinct())
    ham = sum(F.expr(f"bit_count(a{k} ^ b{k})") for k in range(4))
    return (pairs.withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= 8)
            .select("id_a", "id_b", "hamming"))


def _phash_pairs_oracle() -> str:
    ham = " + ".join(
        f"bit_count(xor(a.seg{k}::BIGINT, b.seg{k}::BIGINT))"
        for k in range(4))
    bands = " OR ".join(f"a.seg{k} = b.seg{k}" for k in range(4))
    return f"""
WITH {_PHASH_SEGS_SQL}
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST({ham} AS INT) AS hamming
FROM segs a JOIN segs b
  ON a.doc_id < b.doc_id AND ({bands})
WHERE {ham} <= 8
"""


ORACLE_MEDIA_PHASH_PAIRS = _phash_pairs_oracle()


def q_frontier_checkpoint_diff(spark, sf_dir):
    """Snapshot CHANGELOG between two frontier checkpoints — the Iceberg
    changelog-scan / time-travel-diff shape (the inverse of
    frontier_merge_upsert): two deterministically synthesized frontier
    versions are full-outer-joined on url and classified added / removed
    / status_changed (unchanged rows excluded — a changelog carries only
    deltas). Output is the per-change-type census with key checksums, so
    one URL in the wrong delta class breaks the hash. This is what
    incremental consumers (recrawl schedulers, replication) read instead
    of re-scanning a 10^10-row frontier.

    Plan/scale: both versions are projections of the same scan; the diff
    is ONE url-partitioned full-outer join and a 3-key census. On
    Iceberg the same classification falls out of the snapshot metadata;
    here it is computed, which also VERIFIES a changelog implementation
    against its two endpoint snapshots."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.concat(F.lit("http://h"), (k % 50).cast("string"),
                   F.lit(".onion/p"), k.cast("string"))
    v1 = (o.filter(k % 3 != 0)
          .select(url.alias("url"), k.alias("key"),
                  F.when(k % 4 == 0, "complete").otherwise("pending")
                  .alias("status")))
    v2 = (o.filter(k % 5 != 1)
          .select(url.alias("url"), k.alias("key"),
                  F.when(k % 2 == 0, "complete").otherwise("pending")
                  .alias("status")))
    j = (v1.alias("x").join(v2.alias("y"), "url", "full_outer")
         .select("url",
                 F.col("x.key").alias("key1"),
                 F.col("y.key").alias("key2"),
                 F.col("x.status").alias("s1"),
                 F.col("y.status").alias("s2")))
    change = (F.when(F.col("s1").isNull(), "added")
              .when(F.col("s2").isNull(), "removed")
              .when(F.col("s1") != F.col("s2"), "status_changed"))
    return (j.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .groupBy("change_type")
            .agg(F.count("*").alias("n_urls"),
                 F.sum(F.coalesce("key2", "key1"))
                 .alias("key_checksum")))


ORACLE_FRONTIER_CHECKPOINT_DIFF = """
WITH v1 AS (
  SELECT 'http://h' || (o_orderkey % 50) || '.onion/p' || o_orderkey
           AS url,
         o_orderkey AS key,
         CASE WHEN o_orderkey % 4 = 0 THEN 'complete'
              ELSE 'pending' END AS status
  FROM orders WHERE o_orderkey % 3 <> 0),
v2 AS (
  SELECT 'http://h' || (o_orderkey % 50) || '.onion/p' || o_orderkey
           AS url,
         o_orderkey AS key,
         CASE WHEN o_orderkey % 2 = 0 THEN 'complete'
              ELSE 'pending' END AS status
  FROM orders WHERE o_orderkey % 5 <> 1),
j AS (
  SELECT coalesce(v1.url, v2.url) AS url,
         v1.key AS key1, v2.key AS key2,
         v1.status AS s1, v2.status AS s2
  FROM v1 FULL OUTER JOIN v2 ON v1.url = v2.url),
c AS (
  SELECT url, key1, key2,
         CASE WHEN s1 IS NULL THEN 'added'
              WHEN s2 IS NULL THEN 'removed'
              WHEN s1 <> s2 THEN 'status_changed' END AS change_type
  FROM j)
SELECT change_type, count(*) AS n_urls,
       CAST(sum(coalesce(key2, key1)) AS BIGINT) AS key_checksum
FROM c WHERE change_type IS NOT NULL
GROUP BY change_type
"""


def q_frontier_host_fairness(spark, sf_dir):
    """Gini coefficient of the per-host crawl backlog — the fairness
    audit of the politeness scheduler (a Gini near 1 means a few hub
    hosts own the frontier and the per-host budget is the binding
    constraint; near 0 means breadth). Computed exactly: backlog counts
    are integers, ranks come from one deterministic (backlog, host)
    ordering, and the single 4-dp division happens once at the end —
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) on the ascending
    sort.

    Plan/scale: per-host agg (one shuffle over ~hosts rows), a global
    window over the HOST table (n_hosts rows, not URLs — tiny even at
    10^10 URLs), one final 1-row agg."""
    o = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    backlog = (o.filter(k % 3 != 0)
               .select(F.concat(F.lit("h"), (k % 50).cast("string"))
                       .alias("host"))
               .groupBy("host").agg(F.count("*").alias("x")))
    w = Window.orderBy(F.asc("x"), F.asc("host"))
    ranked = backlog.withColumn("i", F.row_number().over(w))
    return (ranked.agg(
        F.count("*").alias("n_hosts"),
        F.sum("x").alias("total_backlog"),
        F.round((2 * F.sum(F.col("i") * F.col("x"))
                 - (F.count("*") + 1) * F.sum("x"))
                / (F.count("*") * F.sum("x")), 4).alias("gini")))


ORACLE_FRONTIER_HOST_FAIRNESS = """
WITH backlog AS (
  SELECT 'h' || (o_orderkey % 50) AS host, count(*) AS x
  FROM orders WHERE o_orderkey % 3 <> 0 GROUP BY 1),
ranked AS (
  SELECT x, row_number() OVER (ORDER BY x ASC, host ASC) AS i
  FROM backlog)
SELECT count(*) AS n_hosts,
       CAST(sum(x) AS BIGINT) AS total_backlog,
       round((2 * sum(i * x) - (count(*) + 1) * sum(x))
             / (count(*) * sum(x)), 4) AS gini
FROM ranked
"""


_HRW_SHARDS = 16


def _hrw_struct(url_col, s):
    score = (F.conv(F.substring(
        F.md5(F.concat(url_col, F.lit(f"|{s}"))), 1, 8), 16, 10)
        .cast("long"))
    return F.struct(score.alias("score"), F.lit(s).alias("shard"))


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


def _hrw_oracle() -> str:
    def structs(n):
        items = ", ".join(
            "{'score': ('0x' || substr(md5(url || '|%d'), 1, 8))::BIGINT,"
            " 'shard': %d}" % (s, s) for s in range(n))
        return f"list_max([{items}]).shard"

    return f"""
WITH u AS (
  SELECT 'http://h' || (o_orderkey % 50) || '.onion/p' || o_orderkey
           AS url
  FROM orders),
m AS (
  SELECT ('0x' || substr(md5(url), 1, 8))::BIGINT AS h,
         {structs(_HRW_SHARDS)} AS old_shard,
         {structs(_HRW_SHARDS + 1)} AS new_shard
  FROM u),
agg AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN h % {_HRW_SHARDS} <> h % {_HRW_SHARDS + 1}
                  THEN 1 ELSE 0 END) AS BIGINT) AS mod_m,
         CAST(sum(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END)
              AS BIGINT) AS hrw_m
  FROM m)
SELECT 'mod' AS strategy, n AS n_urls, mod_m AS n_moved,
       round(mod_m / n, 4) AS moved_pct FROM agg
UNION ALL
SELECT 'hrw' AS strategy, n AS n_urls, hrw_m AS n_moved,
       round(hrw_m / n, 4) AS moved_pct FROM agg
"""


ORACLE_URL_SHARD_REBALANCE = _hrw_oracle()


def q_corpus_drift_kl(spark, sf_dir):
    """Token-distribution DRIFT between two crawl rounds (even vs odd
    doc_ids as the deterministic round split): per-bucket KL(A||B)
    contributions over 64 hashed-unigram buckets with add-one smoothing
    — the nightly monitor that catches a crawler suddenly pulling a
    different language/spam mix before it poisons the training mix.
    Per-bucket contributions quantize to 1e-9 integer units (the two
    engines compute the identical double expression, then round once),
    so the per-bucket output value-hashes exactly; the total is the sum
    downstream dashboards plot. Buckets with zero tokens in BOTH rounds
    are omitted (identically in both engines) — their smoothed
    contribution is the O(1/T) floor, not signal.

    Plan/scale: same shape as corpus_dsir_resample — ONE 64-key token
    census shuffle (map-side combine does the work), totals broadcast
    back; at 100 TB this is a single partial-agg pass."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (d.select(
        (F.col("doc_id") % 2 == 0).alias("in_a"),
        F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"))
        .filter(F.length("term") >= 2)
        .withColumn("bucket",
                    F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
                    .cast("long") % 64))
    census = (toks.groupBy("bucket")
              .agg(F.sum(F.col("in_a").cast("long")).alias("ca"),
                   F.sum((~F.col("in_a")).cast("long")).alias("cb")))
    totals = census.agg(F.sum("ca").alias("ta"), F.sum("cb").alias("tb"))
    pa = (F.col("ca") + 1.0) / (F.col("ta") + 64.0)
    pb = (F.col("cb") + 1.0) / (F.col("tb") + 64.0)
    return (census.crossJoin(F.broadcast(totals))
            .select("bucket", "ca", "cb",
                    F.round(pa * F.log(pa / pb) * 1e9)
                    .cast("long").alias("kl_u")))


def q_text_sentence_dedup(spark, sf_dir):
    """C4's global duplicate-LINE removal (Raffel et al. 2020: any line
    occurring more than once in the corpus is kept only at its first
    occurrence) over the deterministic line-structured corpus, with the
    per-doc text REBUILT from the surviving lines in original order —
    the rebuild makes the value hash sensitive to a single misplaced or
    mis-dropped line anywhere in the corpus. First occurrence = min
    (doc_id, idx) per line, which also drops within-doc repeats.

    Plan/scale: posexplode lines -> ONE window shuffle partitioned by
    md5(line) (64-bit-sized key, not the raw line string — the shuffle
    carries hashes, the payload tags along) -> per-doc rebuild agg on
    doc_id. The same two-exchange shape as dedup_exact_substr; at
    100 TB the line-hash partitioning is what keeps the wide exchange
    bounded."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    lines = d.select(
        "doc_id",
        F.posexplode(_c4_lines_col()).alias("idx", "line"))
    w = (Window.partitionBy(F.md5("line"))
         .orderBy("doc_id", "idx"))
    ranked = lines.withColumn("rn", F.row_number().over(w))
    kept = (ranked.filter(F.col("rn") == 1)
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_kept"),
                 F.array_join(
                     F.transform(
                         F.sort_array(F.collect_list(
                             F.struct("idx", "line"))),
                         lambda s: s["line"]), " ")
                 .alias("clean_text")))
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (totals.join(kept, "doc_id", "left")
            .select("doc_id", "n_lines",
                    F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
                    F.coalesce("clean_text", F.lit(""))
                    .alias("clean_text")))


ORACLE_TEXT_SENTENCE_DEDUP = f"""
WITH {_C4_SYNTH_SQL},
ex AS (
  SELECT doc_id, CAST(r.idx AS INT) AS idx,
         lines[CAST(r.idx AS INT) + 1] AS line
  FROM ln, UNNEST(range(len(lines))) AS r(idx)),
ranked AS (
  SELECT doc_id, idx, line,
         row_number() OVER (PARTITION BY md5(line)
                            ORDER BY doc_id, idx) AS rn
  FROM ex),
kept AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(line, ' ' ORDER BY idx) AS clean_text
  FROM ranked WHERE rn = 1 GROUP BY doc_id),
totals AS (SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY doc_id)
SELECT t.doc_id, t.n_lines,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       coalesce(k.clean_text, '') AS clean_text
FROM totals t LEFT JOIN kept k USING (doc_id)
"""


def q_text_bigram_pmi(spark, sf_dir):
    """PMI collocation mining (Church & Hanks 1990) — the phrase/
    multiword-expression extractor a tokenizer-training pipeline runs
    before BPE (strong collocations become merge candidates; the
    text_bpe_train_step row picks merges by raw frequency, this row
    ranks them by association strength): PMI(a,b) =
    ln((c_ab/M) / ((c_a/N)(c_b/N))) over adjacent token pairs, c_ab >= 3,
    quantized to 1e-6 integer units, global top-20 with (wa, wb)
    tie-break.

    Plan/scale: one unigram agg, one bigram agg (both map-side
    combinable), unigram table joined back twice (vocabulary-sized —
    broadcast at any corpus scale), 1-row totals crossJoin, top-20
    TakeOrdered. The corpus itself shuffles only for the two counts."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    arr = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"),
                   lambda x: F.length(x) >= 2)
    docs = d.select(arr.alias("w"))
    uni = (docs.select(F.explode("w").alias("term"))
           .groupBy("term").agg(F.count("*").alias("c")))
    tot = uni.agg(F.sum("c").alias("n"))
    bigrams = F.when(
        F.size("w") >= 2,
        F.transform(F.sequence(F.lit(1), F.size("w") - 1),
                    lambda i: F.concat(F.element_at("w", i), F.lit("|"),
                                       F.element_at("w", i + 1)))
    ).otherwise(F.array().cast("array<string>"))
    bi0 = (docs.select(F.explode(bigrams).alias("bigram"))
           .groupBy("bigram").agg(F.count("*").alias("c_ab")))
    # M = ALL adjacent pairs (before the frequency floor): p(a,b) =
    # c_ab/M must normalize by the full event space or every PMI is
    # shifted up by ln(total/kept)
    m = bi0.agg(F.sum("c_ab").alias("m"))
    bi = (bi0.filter(F.col("c_ab") >= 3)
          .select(F.substring_index("bigram", "|", 1).alias("wa"),
                  F.substring_index("bigram", "|", -1).alias("wb"),
                  "c_ab"))
    ua = uni.select(F.col("term").alias("wa"), F.col("c").alias("ca"))
    ub = uni.select(F.col("term").alias("wb"), F.col("c").alias("cb"))
    scored = (bi.join(F.broadcast(ua), "wa").join(F.broadcast(ub), "wb")
              .crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(m))
              .withColumn(
                  "pmi_u",
                  F.round(F.log((F.col("c_ab") / F.col("m")) /
                                ((F.col("ca") / F.col("n")) *
                                 (F.col("cb") / F.col("n")))) * 1e6)
                  .cast("long")))
    w = Window.orderBy(F.desc("pmi_u"), F.asc("wa"), F.asc("wb"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 20)
            .select("wa", "wb", "c_ab", "pmi_u", "rank"))


ORACLE_TEXT_BIGRAM_PMI = """
WITH arrs AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> len(x) >= 2) AS w
  FROM documents),
uni AS (
  SELECT u.t AS term, count(*) AS c
  FROM arrs, UNNEST(w) AS u(t) GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uni),
bi0 AS (
  SELECT g.bigram, count(*) AS c_ab FROM arrs,
       UNNEST(CASE WHEN len(w) >= 2
                THEN list_transform(range(1, len(w)),
                                    i -> w[i] || '|' || w[i + 1])
                ELSE [] END) AS g(bigram)
  GROUP BY g.bigram),
m AS (SELECT CAST(sum(c_ab) AS BIGINT) AS m FROM bi0),
bi AS (
  SELECT split_part(bigram, '|', 1) AS wa,
         split_part(bigram, '|', 2) AS wb, c_ab
  FROM bi0 WHERE c_ab >= 3),
scored AS (
  SELECT bi.wa, bi.wb, bi.c_ab,
         CAST(round(ln((bi.c_ab / m.m) /
                       ((ua.c / tot.n) * (ub.c / tot.n)))
                    * 1000000.0) AS BIGINT) AS pmi_u
  FROM bi
  JOIN uni ua ON ua.term = bi.wa
  JOIN uni ub ON ub.term = bi.wb
  CROSS JOIN tot CROSS JOIN m)
SELECT wa, wb, c_ab, pmi_u, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY pmi_u DESC, wa ASC, wb ASC)
    AS rank FROM scored) WHERE rank <= 20
"""


ORACLE_CORPUS_DRIFT_KL = """
WITH toks AS (
  SELECT doc_id % 2 = 0 AS in_a,
         ('0x' || substr(md5(t.term), 1, 8))::BIGINT % 64 AS bucket
  FROM documents,
       UNNEST(string_split_regex(lower(text), '[^a-z0-9]+')) AS t(term)
  WHERE len(t.term) >= 2),
census AS (
  SELECT bucket,
         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM toks GROUP BY bucket),
totals AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
                  CAST(sum(cb) AS BIGINT) AS tb FROM census)
SELECT bucket, ca, cb,
       CAST(round(((ca + 1.0) / (ta + 64.0))
                  * ln(((ca + 1.0) / (ta + 64.0))
                       / ((cb + 1.0) / (tb + 64.0)))
                  * 1000000000.0) AS BIGINT) AS kl_u
FROM census CROSS JOIN totals
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


def q_text_char_entropy(spark, sf_dir):
    """Character-level Shannon entropy per document — the classic
    gibberish / binary-spill / key-mash detector (low entropy =
    template spam, implausibly high = random bytes).  Per-(doc, char)
    terms quantize to 1e-6 integer units (the corpus_drift_kl
    convention) so the cross-engine sum is an exact integer sum.

    Plan/scale: explode chars -> partial-agg on (doc_id, char) — at
    most |alphabet| rows per doc survive the map-side combine — then a
    doc_id roll-up.  Two bounded shuffles; nothing carries raw text."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    # [^\n], not '.': Java-regex '.' also excludes \r/ /... while
    # RE2 (the oracle engine) excludes only \n — CRLF text would diverge
    ch = d.select(
        "doc_id",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit(r"[^\n]"), 0))
        .alias("ch"))
    cnt = ch.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.groupBy("doc_id").agg(F.sum("c").alias("n"),
                                    F.count(F.lit(1)).alias("n_distinct"))
    p = F.col("c") / F.col("n")
    term_u = F.round(-p * F.log(p) * 1e6).cast("long")
    per = (cnt.join(tot, "doc_id")
           .groupBy("doc_id")
           .agg(F.max("n").alias("n_chars"),
                F.max("n_distinct").cast("long").alias("n_distinct"),
                F.sum(term_u).alias("entropy_u")))
    suspect = (F.col("n_chars") >= 50) & (F.col("entropy_u") < 2000000)
    return per.select("doc_id", "n_chars", "n_distinct", "entropy_u",
                      suspect.alias("suspect"))


ORACLE_TEXT_CHAR_ENTROPY = r"""
WITH ch AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[^\n]')) AS ch
  FROM documents WHERE text IS NOT NULL
),
cnt AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY doc_id, ch),
tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM cnt GROUP BY doc_id),
per AS (
  SELECT cnt.doc_id, max(n) AS n_chars, max(n_distinct) AS n_distinct,
         CAST(sum(CAST(round(-(c * 1.0 / n) * ln(c * 1.0 / n) * 1000000.0)
                       AS BIGINT)) AS BIGINT) AS entropy_u
  FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id
  GROUP BY cnt.doc_id
)
SELECT doc_id, n_chars, n_distinct, entropy_u,
       (n_chars >= 50 AND entropy_u < 2000000) AS suspect
FROM per
"""


#: UTF-8-read-as-Latin-1 damage signatures and their repairs.
_MOJI_RSQUO = "â€™"   # "â€™" -> '
_MOJI_LDQUO = "â€œ"   # "â€œ" -> "
_MOJI_EACUTE = "Ã©"        # "Ã©"  -> é
_MOJI_NBSP = "Â "          # "Â " (C2 A0) -> space
_REPL_CHAR = "�"


def q_text_mojibake(spark, sf_dir):
    """Encoding-damage triage for a web corpus: count U+FFFD
    replacement characters and the classic UTF-8-decoded-as-Latin-1
    signatures (ftfy's core cases), emit a verdict and the repaired
    text.  Damage is injected deterministically by doc_id class so
    every branch has positives.  Pure codegen (literal replace chain,
    two regexp_counts) — zero shuffles; at 100 TB this is a map over
    the scan."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    cls = F.col("doc_id") % 4
    damaged = (F.when(cls == 1, F.concat(
                    F.col("text"), F.lit(" caf" + _MOJI_EACUTE + " "
                                         + _MOJI_RSQUO + "quote"
                                         + _MOJI_LDQUO)))
               .when(cls == 2, F.concat(
                    F.col("text"), F.lit(" bad" + _REPL_CHAR
                                         + _REPL_CHAR + "bytes")))
               .when(cls == 3, F.concat(
                    F.col("text"), F.lit(_MOJI_NBSP + "padded"
                                         + _MOJI_NBSP)))
               .otherwise(F.col("text")))
    src = d.select("doc_id", damaged.alias("text"))
    n_repl = F.regexp_count("text", F.lit(_REPL_CHAR))
    n_moji = F.regexp_count(
        "text", F.lit("|".join([_MOJI_RSQUO, _MOJI_LDQUO,
                                _MOJI_EACUTE, _MOJI_NBSP])))
    fixed = F.col("text")
    for bad, good in [(_MOJI_RSQUO, "’"), (_MOJI_LDQUO, "“"),
                      (_MOJI_EACUTE, "é"), (_MOJI_NBSP, " ")]:
        fixed = F.replace(fixed, F.lit(bad), F.lit(good))
    verdict = (F.when(n_repl > 0, "replacement")
               .when(n_moji > 0, "mojibake").otherwise("clean"))
    return src.select("doc_id", n_repl.alias("n_repl"),
                      n_moji.alias("n_moji"), verdict.alias("verdict"),
                      fixed.alias("fixed"))


def _chr_sql(s: str) -> str:
    """Build a DuckDB expression for a non-ASCII literal via chr() so
    the oracle SQL stays ASCII-clean."""
    return " || ".join(f"chr({ord(c)})" for c in s)


ORACLE_TEXT_MOJIBAKE = f"""
WITH moji AS (
  SELECT {_chr_sql(_MOJI_RSQUO)} AS rsquo, {_chr_sql(_MOJI_LDQUO)} AS ldquo,
         {_chr_sql(_MOJI_EACUTE)} AS eacute, {_chr_sql(_MOJI_NBSP)} AS nbsp,
         chr(65533) AS repl
),
src AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 1 THEN
                text || ' caf' || eacute || ' ' || rsquo || 'quote' || ldquo
              WHEN doc_id % 4 = 2 THEN
                text || ' bad' || repl || repl || 'bytes'
              WHEN doc_id % 4 = 3 THEN
                text || nbsp || 'padded' || nbsp
              ELSE text END AS text
  FROM documents CROSS JOIN moji
  WHERE text IS NOT NULL
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, chr(65533))) AS INT) AS n_repl,
       CAST(len(regexp_extract_all(text,
            (SELECT rsquo || '|' || ldquo || '|' || eacute || '|' || nbsp
             FROM moji))) AS INT) AS n_moji,
       CASE WHEN len(regexp_extract_all(text, chr(65533))) > 0
              THEN 'replacement'
            WHEN len(regexp_extract_all(text,
                 (SELECT rsquo || '|' || ldquo || '|' || eacute || '|' || nbsp
                  FROM moji))) > 0 THEN 'mojibake'
            ELSE 'clean' END AS verdict,
       replace(replace(replace(replace(text,
           (SELECT rsquo FROM moji), chr(8217)),
           (SELECT ldquo FROM moji), chr(8220)),
           (SELECT eacute FROM moji), chr(233)),
           (SELECT nbsp FROM moji), ' ') AS fixed
FROM src
"""


def q_graph_label_prop(spark, sf_dir):
    """Community detection over the host link graph via synchronous
    label propagation (Raghavan et al. 2007), 3 unrolled rounds with
    the deterministic tie-break (max neighbor-label count, then min
    label) — the mirror-farm / link-ring lens that groups DENSELY
    connected hosts, where connected components (host_components) only
    answers reachability.

    Plan/scale: per round one join (edges x labels: labels are the
    small side — broadcastable at any corpus size since |hosts| <<
    |pages|) + one (node, label) partial-agg + one per-node window.
    Rounds are data-independent, so lineage stays linear."""
    _sym, lab = _lpa_labels(spark, sf_dir)
    sizes = lab.groupBy("label").agg(F.count(F.lit(1)).alias("community_size"))
    return (lab.join(sizes, "label")
            .select(F.col("node").alias("host_key"),
                    F.col("label").alias("community"), "community_size"))


def _lpa_round_sql(prev: str, out: str) -> str:
    return f"""{out}_cnt AS (
  SELECT s.a AS node, p.label, count(*) AS cnt
  FROM sym s JOIN {prev} p ON p.node = s.b
  GROUP BY s.a, p.label),
{out} AS (
  SELECT node, label FROM (
    SELECT node, label,
           row_number() OVER (PARTITION BY node
                              ORDER BY cnt DESC, label ASC) AS rn
    FROM {out}_cnt) WHERE rn = 1)"""


ORACLE_GRAPH_LABEL_PROP = f"""
WITH e AS (
  SELECT DISTINCT 'c' || (o_orderkey % 80) AS a,
         'c' || ((o_orderkey % 80 + o_custkey % 7 + 1) % 80) AS b
  FROM orders
  WHERE 'c' || (o_orderkey % 80)
        <> 'c' || ((o_orderkey % 80 + o_custkey % 7 + 1) % 80)),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
{_lpa_round_sql("l0", "l1")},
{_lpa_round_sql("l1", "l2")},
{_lpa_round_sql("l2", "l3")},
sizes AS (SELECT label, count(*) AS community_size FROM l3 GROUP BY label)
SELECT node AS host_key, label AS community, community_size
FROM l3 JOIN sizes USING (label)
"""


def q_text_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary — the one-row
    distribution diagnostic (slope ~ -1 for natural text; spam /
    machine-generated corpora bend it): OLS of ln(freq) on ln(rank)
    over the top 256 types with freq >= 2.  Per-row OLS terms quantize
    to 1e-6 integer units, so slope / intercept / r2 derive from exact
    integer sums — summation order can't flip the hash.

    Plan/scale: the vocab census is one partial-agg shuffle; the
    global rank window runs over the CENSUS (|types|, driver-scale),
    never the corpus — the standard census-then-rank shape."""
    d = _t(spark, sf_dir, "documents").select("text")
    vocab = (d.select(F.explode(F.split(F.lower("text"), "[^a-z]+"))
                      .alias("w"))
             .filter(F.length("w") >= 2)
             .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    r = Window.orderBy(F.col("freq").desc(), F.col("w").asc())
    top = (vocab.withColumn("rank", F.row_number().over(r))
           .filter((F.col("rank") <= 256) & (F.col("freq") >= 2)))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    u = lambda col: F.round(col * 1e6).cast("long")  # noqa: E731
    s = top.agg(F.count(F.lit(1)).alias("n"),
                F.sum(u(x)).alias("sx"), F.sum(u(y)).alias("sy"),
                F.sum(u(x * y)).alias("sxy"), F.sum(u(x * x)).alias("sxx"),
                F.sum(u(y * y)).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / 1e6, F.col("sy") / 1e6
    sxy, sxx, syy = F.col("sxy") / 1e6, F.col("sxx") / 1e6, F.col("syy") / 1e6
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        "n",
        F.round(cov / vx, 4).alias("slope"),
        F.round((sy - (cov / vx) * sx) / n, 4).alias("intercept"),
        F.round(cov * cov / (vx * vy), 4).alias("r2"))


ORACLE_TEXT_ZIPF_FIT = r"""
WITH vocab AS (
  SELECT w, count(*) AS freq FROM (
    SELECT unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE len(w) >= 2 GROUP BY w
),
top AS (
  SELECT * FROM (
    SELECT w, freq,
           row_number() OVER (ORDER BY freq DESC, w ASC) AS rank
    FROM vocab) WHERE rank <= 256 AND freq >= 2
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(ln(rank) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sx,
         CAST(sum(CAST(round(ln(freq) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(sum(CAST(round(ln(rank) * ln(freq) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxy,
         CAST(sum(CAST(round(ln(rank) * ln(rank) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxx,
         CAST(sum(CAST(round(ln(freq) * ln(freq) * 1000000.0) AS BIGINT))
              AS BIGINT) AS syy
  FROM top
)
SELECT n,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)), 4) AS slope,
       round(((sy / 1e6) - ((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                            / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)))
                           * (sx / 1e6)) / n, 4) AS intercept,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             * (n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / ((n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
                * (n * (syy / 1e6) - (sy / 1e6) * (sy / 1e6))), 4) AS r2
FROM s
"""


def q_corpus_curriculum(spark, sf_dir):
    """Curriculum-learning stage assignment (Bengio et al. 2009) —
    easiest documents first — via the SCALABLE histogram-quantile
    shape: per-doc Flesch score (same formula as text_readability)
    buckets into integer bins map-side, the BIN census (a few hundred
    rows) gets cumulative counts and a 4-way stage split, and stages
    broadcast-join back onto docs.  No global per-doc window anywhere:
    at 100 TB the only wide op is the bin census partial-agg.  Docs
    within one bin share a stage (the documented histogram
    approximation — bins are 1 Flesch point wide)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n_words, _n_sent, _n_syll, flesch = _flesch_exprs()
    bin_ = F.greatest(F.lit(-100),
                      F.least(F.lit(206), F.floor(flesch))).cast("int")
    docs = d.select("doc_id", n_words.alias("n_words"),
                    bin_.alias("flesch_bin"))
    census = docs.groupBy("flesch_bin").agg(F.count(F.lit(1)).alias("cnt"))
    wb = (Window.orderBy(F.col("flesch_bin").desc())
          .rowsBetween(Window.unboundedPreceding, -1))
    tot = census.agg(F.sum("cnt").alias("n_total"))
    staged = (census
              .withColumn("cum_before",
                          F.coalesce(F.sum("cnt").over(wb), F.lit(0)))
              .crossJoin(F.broadcast(tot))
              .select("flesch_bin",
                      F.least(F.lit(3),
                              F.floor(F.lit(4.0) * F.col("cum_before")
                                      / F.col("n_total")))
                      .cast("int").alias("stage")))
    return (docs.join(F.broadcast(staged), "flesch_bin")
            .select("doc_id", "flesch_bin", "stage", "n_words"))


ORACLE_CORPUS_CURRICULUM = rf"""
WITH {_FLESCH_M_SQL},
docs AS (
  SELECT doc_id, n_words,
         CAST(greatest(-100, least(206, floor({_FLESCH_Q_SQL}))) AS INT)
           AS flesch_bin
  FROM m
),
census AS (SELECT flesch_bin, count(*) AS cnt FROM docs GROUP BY flesch_bin),
tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n_total FROM census),
staged AS (
  SELECT flesch_bin,
         CAST(least(3, floor(4.0 * coalesce(sum(cnt) OVER (
                ORDER BY flesch_bin DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / n_total)) AS INT) AS stage
  FROM census CROSS JOIN tot
)
SELECT doc_id, flesch_bin, stage, n_words
FROM docs JOIN staged USING (flesch_bin)
"""


def q_embeddings_standardize(spark, sf_dir):
    """Per-dimension standardization (zero mean / unit variance) of the
    embedding table — the classic pre-ANN / pre-quantization whitening
    step.  Elements quantize to 1e-6 integer units so the per-dim
    moments are EXACT integer sums (summation order free); mean/std/z
    then derive from those integers through identical IEEE double
    expressions in both engines.  Constant dimensions emit z = 0.

    Plan/scale: posexplode -> one (dim)-keyed partial agg (64 keys,
    map-side combine does everything) -> broadcast the 64 moment rows
    back.  One bounded shuffle at any corpus size."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ex = e.select("vec_id",
                  F.posexplode("embedding").alias("dim", "x"))
    xu = F.round(F.col("x").cast("double") * 1e6).cast("long")
    ex = ex.select("vec_id", "dim", xu.alias("x_u"))
    # ss accumulates in decimal(38,0): a long sum of x_u^2 (~3e11 each)
    # would wrap at ~27M vectors/dim — decimal stays exact to 1e38,
    # matching DuckDB's BIGINT-sum-into-HUGEINT on the oracle side
    mom = (ex.groupBy("dim")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("x_u").alias("s"),
                F.sum((F.col("x_u") * F.col("x_u"))
                      .cast("decimal(38,0)")).alias("ss")))
    mean = F.col("s") / (F.col("n") * 1e6)
    var = F.col("ss").cast("double") / (F.col("n") * 1e12) - mean * mean
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    mom = mom.select("dim", mean.alias("mu"), std.alias("sd"))
    z = F.when(F.col("sd") > 0,
               F.round((F.col("x_u") / 1e6 - F.col("mu")) / F.col("sd"), 4)
               ).otherwise(F.lit(0.0))
    return (ex.join(F.broadcast(mom), "dim")
            .select("vec_id", "dim", "x_u", z.alias("z")))


ORACLE_EMBEDDINGS_STANDARDIZE = """
WITH ex AS (
  SELECT vec_id, CAST(dim AS INT) AS dim,
         CAST(round(embedding[dim + 1]::DOUBLE * 1000000.0) AS BIGINT)
           AS x_u
  FROM (SELECT vec_id, embedding,
               unnest(range(len(embedding))) AS dim
        FROM embeddings)
),
mom AS (
  -- sum(BIGINT) lands in HUGEINT: exact like Spark's decimal(38,0)
  SELECT dim, count(*) AS n, CAST(sum(x_u) AS BIGINT) AS s,
         sum(x_u * x_u) AS ss
  FROM ex GROUP BY dim
),
ms AS (
  SELECT dim, s / (n * 1e6) AS mu,
         sqrt(greatest(ss / (n * 1e12) - (s / (n * 1e6)) * (s / (n * 1e6)),
                       0.0)) AS sd
  FROM mom
)
SELECT vec_id, dim, x_u,
       CASE WHEN sd > 0 THEN round((x_u / 1e6 - mu) / sd, 4)
            ELSE 0.0 END AS z
FROM ex JOIN ms USING (dim)
"""


def q_host_budget_waterfill(spark, sf_dir):
    """Max-min fair crawl-budget allocation across hosts (the classic
    water-filling waterline): given per-host demand (pending URLs) and
    a global fetch budget B (3/5 of total demand — derived from the
    data so the row is meaningful at every SF), find the largest
    integer waterline L* with sum(min(demand, L*)) <= B; hosts below
    the line are fully satisfied, the rest get L*.  This is the
    fleet-scale generalization of the reference's per-host crawl
    budget (app/crawler/crawl_controller.py's host cap, SURVEY O10).

    Exact integer math end-to-end.  The sorted-prefix closed form
    turns the waterline search into ONE window over the HOST CENSUS
    (|hosts|, never |urls|) + a max — census-scale by construction."""
    k = F.col("o_orderkey")
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("h"), (k % 50).cast("string")).alias("host"))
         .groupBy("host").agg(F.count(F.lit(1)).alias("demand")))
    tot = d.agg(F.count(F.lit(1)).alias("n"),
                F.sum("demand").alias("td"),
                F.floor(F.sum("demand") * 3.0 / 5).cast("long").alias("b"))
    ws = Window.orderBy("demand", "host")
    sorted_ = d.select(
        "host", "demand",
        F.row_number().over(ws).alias("j"),
        F.sum("demand").over(
            ws.rowsBetween(Window.unboundedPreceding, 0)).alias("p"))
    cand = (sorted_.select("j", F.col("p").alias("pj"),
                           F.col("demand").alias("dj"))
            .unionByName(sorted_.sparkSession.createDataFrame(
                [(0, 0, 0)], "j int, pj long, dj long")))
    lv = (cand.crossJoin(F.broadcast(tot))
          .filter(F.col("pj") <= F.col("b"))
          .select(F.when(F.col("j") >= F.col("n"),
                         F.lit(9223372036854775807))
                  .otherwise(F.floor((F.col("b") - F.col("pj")) * 1.0
                                     / (F.col("n") - F.col("j"))))
                  .cast("long").alias("lj"), "dj"))
    lstar = (lv.filter(F.col("lj") >= F.col("dj"))
             .agg(F.max("lj").alias("lstar")))
    return (d.crossJoin(F.broadcast(lstar))
            .select("host", "demand",
                    F.least(F.col("demand"), F.col("lstar"))
                    .alias("allocation"),
                    (F.col("demand") <= F.col("lstar"))
                    .alias("fully_satisfied")))


ORACLE_HOST_BUDGET_WATERFILL = """
WITH d AS (
  SELECT 'h' || (o_orderkey % 50) AS host, count(*) AS demand
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(demand) AS BIGINT)
               AS td,
               CAST(floor(sum(demand) * 3.0 / 5) AS BIGINT) AS b FROM d),
srt AS (
  SELECT host, demand,
         row_number() OVER (ORDER BY demand, host) AS j,
         sum(demand) OVER (ORDER BY demand, host
                           ROWS UNBOUNDED PRECEDING) AS p
  FROM d
),
cand AS (
  SELECT j, p AS pj, demand AS dj FROM srt
  UNION ALL SELECT 0, 0, 0
),
lv AS (
  SELECT CASE WHEN j >= n THEN 9223372036854775807
              ELSE CAST(floor((b - pj) * 1.0 / (n - j)) AS BIGINT) END AS lj,
         dj
  FROM cand CROSS JOIN tot WHERE pj <= b
),
star AS (SELECT max(lj) AS lstar FROM lv WHERE lj >= dj)
SELECT host, demand, least(demand, lstar) AS allocation,
       demand <= lstar AS fully_satisfied
FROM d CROSS JOIN star
"""


def q_media_audio_fingerprint(spark, sf_dir):
    """Duplicate-clip detection for the audio modality: clips synthesize
    per GROUP (doc_id % 200 — so ~2.5 docs share byte-identical audio),
    operators/multimodal.audio_fingerprint reduces each clip to one
    int64 (8 window energies mod 65521, base-31 weighted), and exact
    dedup is a 16-byte-per-clip groupBy — the audio analogue of
    dedup_exact's hash-first rule and media_phash_pairs' image path.
    The oracle restates the PCM synth, the window energies, and the
    fingerprint fold in pure integer SQL: a value-hash match proves the
    int16 container plumbing AND the kernel arithmetic."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("doc_id") % 200).alias("g"))

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.audio_by_doc_id(int(g))
                               for g in pdf["g"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    fp = MM.audio_fingerprint(blobs)
    grp = fp.groupBy("fp").agg(F.count(F.lit(1)).alias("group_size"),
                               F.min("doc_id").alias("rep_doc_id"))
    return (fp.join(grp, "fp")
            .select("doc_id", "fp", "group_size", "rep_doc_id"))


def _fp_pow31_sql() -> str:
    from genesis_spark.operators import multimodal as _MM
    return "[" + ",".join(str(p) for p in _MM._FP_POW31) + "]"


_FP_POW31_SQL = _fp_pow31_sql()

ORACLE_MEDIA_AUDIO_FINGERPRINT = f"""
WITH d AS (SELECT doc_id, doc_id % 200 AS g FROM documents),
p AS (SELECT doc_id, g, CAST(512 + (g % 3) * 256 AS INT) AS n FROM d),
e AS (
  SELECT doc_id,
         list_transform(range(8), w ->
           list_sum(list_transform(range(n // 8), i ->
             (((g*11 + (w*(n//8) + i)*17) % 4096) - 2048)
             * (((g*11 + (w*(n//8) + i)*17) % 4096) - 2048)))) AS ew
  FROM p),
f AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(range(8), w ->
           (ew[w+1] % 65521) * {_FP_POW31_SQL}[w+1])) AS BIGINT) AS fp
  FROM e),
grp AS (SELECT fp, CAST(count(*) AS BIGINT) AS group_size,
               min(doc_id) AS rep_doc_id
        FROM f GROUP BY fp)
SELECT doc_id, fp, group_size, rep_doc_id FROM f JOIN grp USING (fp)
"""


def q_snapshot_expire(spark, sf_dir):
    """Iceberg-style snapshot EXPIRY planner — the third leg of table
    maintenance beside corpus_compact (bin-pack) and
    frontier_checkpoint_diff (changelog): keep the last 5 snapshots
    plus everything younger than a 10-hour watermark, then compute
    which data files become ORPHANS (referenced by no live snapshot) —
    the delete list expire_snapshots would emit.  Reference counting is
    one explode + one (file_id) partial-agg; the snapshot census window
    runs over |snapshots| rows, never data."""
    k = F.col("o_orderkey")
    snaps = (_t(spark, sf_dir, "orders")
             .select((k % 30).alias("snap_id")).distinct()
             .select("snap_id",
                     (F.lit(1700000000) + F.col("snap_id") * 3600)
                     .alias("ts")))
    w = Window.orderBy(F.col("ts").desc())
    mx = snaps.agg(F.max("ts").alias("max_ts"))
    live = (snaps.withColumn("rk", F.row_number().over(w))
            .crossJoin(F.broadcast(mx))
            .select("snap_id",
                    ((F.col("rk") <= 5)
                     | (F.col("ts") > F.col("max_ts") - 36000))
                    .alias("live")))
    refs = (live
            .select("live", "snap_id",
                    F.explode(F.sequence(F.lit(0), F.lit(4))).alias("j"))
            .select("live",
                    ((F.col("snap_id") * 7 + F.col("j")) % 100)
                    .alias("file_id")))
    agg = refs.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.sum(F.col("live").cast("long")).alias("n_live_refs"))
    return agg.select("file_id", "n_refs", "n_live_refs",
                      (F.col("n_live_refs") == 0).alias("deletable"))


ORACLE_SNAPSHOT_EXPIRE = """
WITH s AS (SELECT DISTINCT o_orderkey % 30 AS snap_id FROM orders),
t AS (SELECT snap_id, 1700000000 + snap_id * 3600 AS ts FROM s),
mx AS (SELECT max(ts) AS max_ts FROM t),
k AS (SELECT snap_id, ts, row_number() OVER (ORDER BY ts DESC) AS rk
      FROM t),
lv AS (SELECT snap_id, (rk <= 5 OR ts > max_ts - 36000) AS live
       FROM k CROSS JOIN mx),
refs AS (SELECT live,
                (snap_id * 7 + unnest(range(5))) % 100 AS file_id
         FROM lv),
agg AS (SELECT file_id, CAST(count(*) AS BIGINT) AS n_refs,
               CAST(sum(CASE WHEN live THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_live_refs
        FROM refs GROUP BY file_id)
SELECT file_id, n_refs, n_live_refs, n_live_refs = 0 AS deletable
FROM agg
"""


def _lpa_labels(spark, sf_dir):
    """The 3-round LPA labelling shared by graph_label_prop and
    graph_modularity (same edges, same tie-break)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    e = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("c"), (k % 80).cast("string")).alias("a"),
        F.concat(F.lit("c"),
                 ((k % 80 + c % 7 + 1) % 80).cast("string")).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct())
    sym = (e.unionByName(e.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
           .distinct())
    lab = (sym.select(F.col("a").alias("node")).distinct()
           .withColumn("label", F.col("node")))
    w = Window.partitionBy("node").orderBy(F.col("cnt").desc(),
                                           F.col("label").asc())
    for _ in range(3):
        nb = (sym.join(lab.withColumnRenamed("node", "b"), "b")
              .select(F.col("a").alias("node"), "label"))
        cnt = nb.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        lab = (cnt.withColumn("rn", F.row_number().over(w))
               .filter(F.col("rn") == 1).select("node", "label"))
    return sym, lab


def q_graph_modularity(spark, sf_dir):
    """Modularity grading of the label-propagation partition (Newman &
    Girvan 2004) in EXACT integer arithmetic: per community c, the
    contribution to Q x 4m^2 is 2*m*w_c - d_c^2, where w_c counts
    symmetric within-community edge endpoints (= 2 x internal edges),
    d_c the community degree sum, and m the undirected edge count —
    the quality gate that tells a mirror-farm detector whether its
    communities are denser than chance, with no float anywhere.

    Plan/scale: the LPA labels join onto the edge list twice (labels
    are census-scale — broadcastable), then two community-keyed
    partial aggs.  Nothing exceeds |edges| in any exchange."""
    sym, lab = _lpa_labels(spark, sf_dir)
    mm = sym.agg((F.count(F.lit(1)) / 2).cast("long").alias("m"))
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("ca"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("cb"))
    within = (sym.join(F.broadcast(la), "a").join(F.broadcast(lb), "b")
              .filter(F.col("ca") == F.col("cb"))
              .groupBy(F.col("ca").alias("community"))
              .agg(F.count(F.lit(1)).alias("w_c")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    dsum = (deg.join(F.broadcast(la), "a")
            .groupBy(F.col("ca").alias("community"))
            .agg(F.sum("deg").alias("d_c")))
    return (dsum.join(within, "community", "left")
            .crossJoin(F.broadcast(mm))
            .select("community",
                    F.coalesce(F.col("w_c"), F.lit(0)).alias("w_c"),
                    "d_c",
                    (F.lit(2) * F.col("m")
                     * F.coalesce(F.col("w_c"), F.lit(0))
                     - F.col("d_c") * F.col("d_c")).alias("q4m2_contrib")))


ORACLE_GRAPH_MODULARITY = f"""
WITH e AS (
  SELECT DISTINCT 'c' || (o_orderkey % 80) AS a,
         'c' || ((o_orderkey % 80 + o_custkey % 7 + 1) % 80) AS b
  FROM orders
  WHERE 'c' || (o_orderkey % 80)
        <> 'c' || ((o_orderkey % 80 + o_custkey % 7 + 1) % 80)),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
{_lpa_round_sql("l0", "l1")},
{_lpa_round_sql("l1", "l2")},
{_lpa_round_sql("l2", "l3")},
mm AS (SELECT CAST(count(*) AS BIGINT) / 2 AS m FROM sym),
w AS (
  SELECT la.label AS community, CAST(count(*) AS BIGINT) AS w_c
  FROM sym JOIN l3 la ON la.node = sym.a
           JOIN l3 lb ON lb.node = sym.b
  WHERE la.label = lb.label GROUP BY la.label),
deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a),
ds AS (
  SELECT la.label AS community, CAST(sum(deg) AS BIGINT) AS d_c
  FROM deg JOIN l3 la ON la.node = deg.a GROUP BY la.label)
SELECT ds.community, CAST(coalesce(w.w_c, 0) AS BIGINT) AS w_c, ds.d_c,
       CAST(2 * m * coalesce(w.w_c, 0) - ds.d_c * ds.d_c AS BIGINT)
         AS q4m2_contrib
FROM ds LEFT JOIN w ON w.community = ds.community CROSS JOIN mm
"""


def q_corpus_domain_cap(spark, sf_dir):
    """Domain frequency capping (the Gopher / RefinedWeb rule: no
    registrable domain may dominate the training mix): keep at most 8
    docs per domain, picked deterministically (longest first, doc_id
    tie-break), and carry the domain's total so the mix report shows
    what the cap removed.  One window shuffle keyed on domain — the
    natural partitioner; skewed mega-domains are exactly the rows the
    cap truncates, so per-key work is bounded by construction."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", "n_chars",
                 F.concat(F.lit("d"), (F.col("doc_id") % 37).cast("string"))
                 .alias("domain")))
    w = Window.partitionBy("domain")
    wo = w.orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
    return (d.withColumn("rk", F.row_number().over(wo).cast("long"))
            .withColumn("domain_total", F.count(F.lit(1)).over(w))
            .filter(F.col("rk") <= 8)
            .select("doc_id", "domain", "rk", "n_chars", "domain_total"))


ORACLE_CORPUS_DOMAIN_CAP = """
WITH d AS (
  SELECT doc_id, n_chars, 'd' || (doc_id % 37) AS domain FROM documents
),
r AS (
  SELECT doc_id, domain, n_chars,
         row_number() OVER (PARTITION BY domain
                            ORDER BY n_chars DESC, doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY domain) AS domain_total
  FROM d
)
SELECT doc_id, domain, CAST(rk AS BIGINT) AS rk, n_chars,
       CAST(domain_total AS BIGINT) AS domain_total
FROM r WHERE rk <= 8
"""


def q_frontier_ucb(spark, sf_dir):
    """Bandit-style crawl scheduling: UCB1 (Auer et al. 2002) over
    hosts, where each crawl attempt's reward is the new-URL yield —
    the explore/exploit policy that beats fixed round-robin when some
    hosts are link farms and others are dead ends.  Mean reward and
    the sqrt(2 ln N / n) confidence bonus derive from exact integer
    (attempts, reward) census sums; one 4-dp round.  The rank window
    runs over the HOST census — never URLs."""
    k = F.col("o_orderkey")
    stats = (_t(spark, sf_dir, "orders")
             .select(F.concat(F.lit("h"), (k % 50).cast("string"))
                     .alias("host"),
                     (k % 3).alias("reward"))
             .groupBy("host")
             .agg(F.count(F.lit(1)).alias("n_pulls"),
                  F.sum("reward").alias("r_total")))
    tot = stats.agg(F.sum("n_pulls").alias("n_all"))
    score = F.round(
        F.col("r_total") / F.col("n_pulls")
        + F.sqrt(F.lit(2.0) * F.log(F.col("n_all")) / F.col("n_pulls")), 4)
    ranked = (stats.crossJoin(F.broadcast(tot))
              .select("host", "n_pulls", "r_total", score.alias("ucb")))
    w = Window.orderBy(F.col("ucb").desc(), F.col("host").asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


ORACLE_FRONTIER_UCB = """
WITH stats AS (
  SELECT 'h' || (o_orderkey % 50) AS host, count(*) AS n_pulls,
         CAST(sum(o_orderkey % 3) AS BIGINT) AS r_total
  FROM orders GROUP BY 1
),
tot AS (SELECT CAST(sum(n_pulls) AS BIGINT) AS n_all FROM stats),
ranked AS (
  SELECT host, n_pulls, r_total,
         round(r_total * 1.0 / n_pulls
               + sqrt(2.0 * ln(n_all) / n_pulls), 4) AS ucb
  FROM stats CROSS JOIN tot
)
SELECT host, n_pulls, r_total, ucb,
       CAST(row_number() OVER (ORDER BY ucb DESC, host ASC) AS BIGINT)
         AS rank
FROM ranked
"""


#: RAKE phrase-boundary stopwords (fixed literal set shared by both
#: engines; the full run-time stopword injection point lives in
#: functions/text.py — this row pins a small deterministic core).
_RAKE_STOPS = ("the", "and", "of", "to", "in", "a", "is", "for", "on",
               "with", "as", "by", "at", "or", "be", "this", "that",
               "are", "was", "it")


def q_text_rake(spark, sf_dir):
    """RAKE keyword scoring (Rose et al. 2010): candidate phrases are
    maximal stopword-free token runs; each word scores deg/freq where
    deg sums the lengths of every phrase containing it.  Phrase ids
    come from a running stopword count per doc (ONE per-doc window),
    phrase lengths from a per-(doc, phrase) window, word stats from a
    token-keyed partial agg — integer arithmetic until the single
    4-dp division.  Per-doc windows bound state at 100 TB; the only
    corpus-wide exchange carries (token, small ints)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    tk = (d.select("doc_id",
                   F.posexplode(F.split(F.lower("text"), "[^a-z]+"))
                   .alias("i", "tok"))
          .filter(F.col("tok") != ""))
    is_stop = F.col("tok").isin(*_RAKE_STOPS)
    wd = Window.partitionBy("doc_id").orderBy("i") \
        .rowsBetween(Window.unboundedPreceding, 0)
    tk = tk.select("doc_id", "i", "tok", is_stop.alias("stop"),
                   F.sum(is_stop.cast("int")).over(wd).alias("phrase_id"))
    content = tk.filter(~F.col("stop"))
    wp = Window.partitionBy("doc_id", "phrase_id")
    content = content.withColumn("phrase_len",
                                 F.count(F.lit(1)).over(wp))
    stats = (content.filter(F.length("tok") >= 3)
             .groupBy(F.col("tok").alias("word"))
             .agg(F.count(F.lit(1)).alias("freq"),
                  F.sum("phrase_len").alias("deg")))
    return (stats.filter(F.col("freq") >= 5)
            .select("word", "freq", "deg",
                    F.round(F.col("deg") / F.col("freq"), 4)
                    .alias("rake_score")))


ORACLE_TEXT_RAKE = f"""
WITH tk AS (
  SELECT doc_id, i, w[i+1] AS tok
  FROM (SELECT doc_id, string_split_regex(lower(text), '[^a-z]+') AS w,
               unnest(range(len(w))) AS i
        FROM documents)
  WHERE w[i+1] <> ''
),
ph AS (
  SELECT doc_id, i, tok,
         tok IN {str(tuple(_RAKE_STOPS))} AS stop,
         sum(CASE WHEN tok IN {str(tuple(_RAKE_STOPS))} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS phrase_id
  FROM tk
),
content AS (
  SELECT doc_id, tok, phrase_id,
         count(*) OVER (PARTITION BY doc_id, phrase_id) AS phrase_len
  FROM ph WHERE NOT stop
),
stats AS (
  SELECT tok AS word, count(*) AS freq,
         CAST(sum(phrase_len) AS BIGINT) AS deg
  FROM content WHERE len(tok) >= 3 GROUP BY tok
)
SELECT word, freq, deg, round(deg * 1.0 / freq, 4) AS rake_score
FROM stats WHERE freq >= 5
"""


def _kcore_sym(spark, sf_dir):
    """Degree-HETEROGENEOUS host graph for the k-core row: node c<i>'s
    out-fanout is 1 + (i % 7) (offsets +1 .. +1+(i%7)), so even when
    every (orderkey, custkey) combination is covered at higher SFs the
    degree distribution stays spread (the LPA edge rule saturates to a
    uniform 14-regular circulant, which peeling can't discriminate)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    off = c % (1 + (k % 80) % 7) + 1
    e = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("c"), (k % 80).cast("string")).alias("a"),
        F.concat(F.lit("c"), ((k % 80 + off) % 80).cast("string")).alias("b"))
        .filter(F.col("a") != F.col("b")).distinct())
    return (e.unionByName(e.select(F.col("b").alias("a"),
                                   F.col("a").alias("b")))
            .distinct())


def q_graph_kcore(spark, sf_dir):
    """k-core decomposition of the host link graph (Seidman 1983), the
    node-density signal completing the graph family: components answer
    reachability, LPA groups, triangles/modularity grade edge density —
    coreness grades each NODE by how deep it sits in the well-linked
    nucleus (crawl-priority / link-farm-periphery lens).  3 synchronous
    peel rounds at k=6 over the heterogeneous host graph; output is the
    surviving core with degrees restricted to the core.  Non-trivial at
    every SF (80 -> ~65 -> ~55 -> ~50 nodes).

    Plan/scale: operators/cc.kcore — the alive set is census-scale so
    restriction semi-joins broadcast; one edge-list partial agg per
    round, lineage linear in rounds."""
    from genesis_spark.operators.cc import kcore

    return (kcore(_kcore_sym(spark, sf_dir), k=6, rounds=3)
            .select(F.col("node").alias("host_key"), "core_degree"))


def _kcore_round_sql(prev: str, out: str, k: int) -> str:
    return f"""{out} AS (
  SELECT s.a AS node FROM sym s
  JOIN {prev} x ON x.node = s.a JOIN {prev} y ON y.node = s.b
  GROUP BY s.a HAVING count(*) >= {k})"""


ORACLE_GRAPH_KCORE = f"""
WITH e AS (
  SELECT DISTINCT 'c' || (o_orderkey % 80) AS a,
         'c' || ((o_orderkey % 80 + o_custkey % (1 + (o_orderkey % 80) % 7)
                  + 1) % 80) AS b
  FROM orders
  WHERE 'c' || (o_orderkey % 80)
        <> 'c' || ((o_orderkey % 80 + o_custkey % (1 + (o_orderkey % 80) % 7)
                    + 1) % 80)),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
a0 AS (SELECT DISTINCT a AS node FROM sym),
{_kcore_round_sql("a0", "a1", 6)},
{_kcore_round_sql("a1", "a2", 6)},
{_kcore_round_sql("a2", "a3", 6)}
SELECT s.a AS host_key, count(*) AS core_degree
FROM sym s JOIN a3 x ON x.node = s.a JOIN a3 y ON y.node = s.b
GROUP BY s.a
"""


#: Bloom-eval geometry: m bits / k=4 md5-derived positions per URL.
#: m=512 against the ~100-URL seen set gives ~54% fill, so the measured
#: false-positive rate is a real number (~8%), not a degenerate zero.
_BLOOM_EVAL_M = 512


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


def _host_edges50(spark, sf_dir):
    """The 50-node host link graph shared by the link-analysis rank rows
    (q_host_pagerank / q_host_trustrank): distinct
    (orderkey%50 -> custkey%50) host pairs, self-loops dropped. Factored
    so the two rows rank the SAME graph (anti-drift, and the comparison
    between global and seeded rank is meaningful)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    return (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), (c % 50).cast("string")).alias("dst"))
        .filter(F.col("src") != F.col("dst")).distinct())


#: SQL mirror of _host_edges50 (shared by the pagerank/trustrank oracles).
_HOST_E50_SQL = """SELECT DISTINCT 'h' || (o_orderkey % 50) AS src,
                  'h' || (o_custkey % 50) AS dst
  FROM orders
  WHERE 'h' || (o_orderkey % 50) <> 'h' || (o_custkey % 50)"""


def q_host_trustrank(spark, sf_dir):
    """Seeded TrustRank over the host link graph (Gyongyi, Garcia-Molina
    & Pedersen, VLDB 2004): PageRank's teleport mass restricted to a
    trusted seed set (every 5th host), so trust decays with link distance
    from the seeds — the spam-demotion complement to q_host_pagerank's
    global popularity (a link farm unreachable from any seed scores
    EXACTLY 0, which no global-rank variant guarantees). Same
    exact-integer discipline as the pagerank row (rank in 1e-9 units,
    DIV for every division) so Spark and DuckDB agree bit-for-bit;
    3 unrolled power iterations over the SAME _host_edges50 graph.

    Plan/scale: the node census is tiny vs the edge list so the rank and
    outdeg join sides broadcast under AQE; one edge-list partial agg per
    iteration; lineage linear in the 3 unrolled rounds (the iterative
    localCheckpoint form lives in operators/cc.py)."""
    S, BASE = 1_000_000_000, 150_000_000
    edges = _host_edges50(spark, sf_dir)
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct()
             .withColumn("seed",
                         (F.expr("CAST(substring(node, 2) AS INT)") % 5
                          == 0).cast("long")))
    ranks = nodes.select(
        "node", "seed", (F.col("seed") * F.lit(S)).cast("long").alias("rank"))
    for _ in range(3):
        contrib = (edges
                   .join(ranks.select(F.col("node").alias("src"), "rank"),
                         "src")
                   .join(deg, "src")
                   .select(F.col("dst").alias("node"),
                           F.expr("rank DIV outdeg").alias("share"))
                   .groupBy("node")
                   .agg(F.sum("share").alias("c")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node", "seed",
                         (F.col("seed") * F.lit(BASE) +
                          F.expr("(85 * coalesce(c, 0)) DIV 100"))
                         .cast("long").alias("rank")))
    return ranks.select(F.col("node").alias("host_key"),
                        F.col("rank").alias("trustrank"))


def _trust_round_sql(prev: str, cn: str, out: str) -> str:
    return f"""{cn} AS (
  SELECT e.dst AS node, sum({prev}.rank // deg.outdeg) AS c
  FROM e JOIN {prev} ON {prev}.node = e.src JOIN deg ON deg.src = e.src
  GROUP BY e.dst),
{out} AS (
  SELECT n.node,
         CAST(n.seed * 150000000 + (85 * coalesce({cn}.c, 0)) // 100
              AS BIGINT) AS rank
  FROM n LEFT JOIN {cn} ON {cn}.node = n.node)"""


ORACLE_HOST_TRUSTRANK = f"""
WITH e AS ({_HOST_E50_SQL}),
deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
n AS (SELECT node,
             CASE WHEN CAST(substr(node, 2) AS INT) % 5 = 0
                  THEN 1 ELSE 0 END AS seed
      FROM (SELECT src AS node FROM e UNION SELECT dst FROM e)),
r0 AS (SELECT node, seed, CAST(seed * 1000000000 AS BIGINT) AS rank FROM n),
{_trust_round_sql("r0", "c1", "r1")},
{_trust_round_sql("r1", "c2", "r2")},
{_trust_round_sql("r2", "c3", "r3")}
SELECT node AS host_key, rank AS trustrank FROM r3
"""


def q_frontier_crawl_delay(spark, sf_dir):
    """Latency-adaptive per-host crawl delay — the auto-tuning layer over
    the fixed politeness buckets (crawler/politeness.py pins the pacing
    interval; this row derives it from observed server behavior, the way
    production crawlers back off slow hosts): EWMA (alpha = 1/2) of each
    host's last 8 fetch latencies sets the delay, clamped to
    [500 ms, 10 s]. Alpha = 1/2 makes every EWMA weight a power of two,
    so the smoothing is EXACT integer arithmetic — for chronological
    observations x_1..x_n, ewma = (x_1 + sum_{i>=2} x_i * 2^(i-2))
    / 2^(n-1) — and Spark/DuckDB agree bit-for-bit with no float
    accumulation-order hazard. Latency observations derive
    deterministically from events (latency_ms = event_id % 900 + 100).

    Plan/scale: one bounded window (top-8 per host — the rank cut runs
    BEFORE the weight math, so per-host state is O(8) rows no matter how
    deep the event history) + one partial agg."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
        .alias("host_key"),
        (F.col("event_id") % 900 + 100).cast("long").alias("latency_ms"),
        "ts", "event_id")
    w = Window.partitionBy("host_key").orderBy(F.col("ts").desc(),
                                               F.col("event_id").desc())
    kept = (ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 8))
    nw = Window.partitionBy("host_key")
    weighted = (kept
                .withColumn("n_obs", F.count("*").over(nw).cast("int"))
                .withColumn("idx", (F.col("n_obs") - F.col("rn") + 1)
                            .cast("int"))
                .withColumn("wgt", F.expr(
                    "CASE WHEN idx = 1 THEN CAST(1 AS BIGINT) "
                    "ELSE shiftleft(CAST(1 AS BIGINT), idx - 2) END")))
    stats = weighted.groupBy("host_key").agg(
        F.max("n_obs").alias("n_obs"),
        F.sum(F.col("latency_ms") * F.col("wgt")).alias("numer"))
    return stats.select(
        "host_key",
        F.col("n_obs").cast("int").alias("n_obs"),
        F.expr("numer DIV shiftleft(CAST(1 AS BIGINT), n_obs - 1)")
        .cast("long").alias("ewma_ms"),
        F.expr("greatest(CAST(500 AS BIGINT), least(CAST(10000 AS BIGINT), "
               "3 * (numer DIV shiftleft(CAST(1 AS BIGINT), n_obs - 1))))")
        .cast("long").alias("crawl_delay_ms"))


ORACLE_FRONTIER_CRAWL_DELAY = """
WITH ev AS (
  SELECT 'h' || (user_id % 40) AS host_key,
         CAST(event_id % 900 + 100 AS BIGINT) AS latency_ms, ts, event_id
  FROM events),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY host_key
              ORDER BY ts DESC, event_id DESC) AS rn
  FROM ev),
kept AS (SELECT * FROM ranked WHERE rn <= 8),
idxd AS (
  SELECT host_key, latency_ms,
         count(*) OVER (PARTITION BY host_key) AS n_obs,
         count(*) OVER (PARTITION BY host_key) - rn + 1 AS idx
  FROM kept),
agg AS (
  SELECT host_key, CAST(max(n_obs) AS INT) AS n_obs,
         sum(latency_ms * (CASE WHEN idx = 1 THEN CAST(1 AS BIGINT)
              ELSE (CAST(1 AS BIGINT) << CAST(idx - 2 AS INT)) END))
           AS numer
  FROM idxd GROUP BY host_key)
SELECT host_key, n_obs,
       CAST(numer // (CAST(1 AS BIGINT) << (n_obs - 1)) AS BIGINT)
         AS ewma_ms,
       CAST(greatest(500, least(10000,
            3 * (numer // (CAST(1 AS BIGINT) << (n_obs - 1)))))
         AS BIGINT) AS crawl_delay_ms
FROM agg
"""


def q_spans_stats(spark, sf_dir):
    """Per-document modality-mix census over the interleaved span table
    (the input_hint shape) — what a multimodal mixture/packing stage
    reads before weighting text-vs-media tokens: span counts by class,
    kind-transition count (how INTERLEAVED the doc actually is, not just
    how much media it carries — a doc with all images appended at the end
    has the same n_media but 1 transition), text chars, and integer media
    density per 100k chars.

    Plan/scale: entirely per-row array codegen (filter / aggregate /
    element_at lambdas over the spans array) — ZERO shuffle at any scale;
    the census is map-side and column-pruned to (doc_id, text)."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    n = F.size("spans")
    stats = interleaved_docs(docs).select(
        "doc_id",
        n.cast("int").alias("n_spans"),
        F.size(F.expr("filter(spans, s -> s.media_ref IS NULL)"))
        .cast("int").alias("n_text"),
        F.size(F.expr("filter(spans, s -> s.media_ref IS NOT NULL "
                      "AND s.kind <> 'link')")).cast("int").alias("n_media"),
        F.when(n >= 2, F.size(F.expr(
            "filter(sequence(1, size(spans) - 1), "
            "i -> element_at(spans, i).kind "
            "<> element_at(spans, i + 1).kind)")))
        .otherwise(F.lit(0)).cast("int").alias("n_transitions"),
        F.expr("aggregate(filter(spans, s -> s.media_ref IS NULL), "
               "CAST(0 AS BIGINT), (acc, s) -> acc + length(s.text))")
        .cast("long").alias("text_chars"))
    return stats.withColumn(
        "media_per_100k",
        F.expr("CAST(n_media AS BIGINT) * 100000 "
               "DIV greatest(text_chars, CAST(1 AS BIGINT))").cast("long"))


ORACLE_SPANS_STATS = f"""
WITH {_SPANS_EX_SQL},
st AS (
  SELECT doc_id,
         CAST(len(spans) AS INT) AS n_spans,
         CAST(len(list_filter(spans, s -> s.media_ref IS NULL)) AS INT)
           AS n_text,
         CAST(len(list_filter(spans, s -> s.media_ref IS NOT NULL
                              AND s.kind <> 'link')) AS INT) AS n_media,
         CAST(CASE WHEN len(spans) >= 2 THEN
                len(list_filter(range(1, len(spans)),
                    i -> spans[CAST(i AS INT)].kind
                         <> spans[CAST(i + 1 AS INT)].kind))
              ELSE 0 END AS INT) AS n_transitions,
         CAST(coalesce(list_sum(list_transform(
                list_filter(spans, s -> s.media_ref IS NULL),
                s -> len(s.text))), 0) AS BIGINT) AS text_chars
  FROM il)
SELECT doc_id, n_spans, n_text, n_media, n_transitions, text_chars,
       CAST(n_media * 100000 // greatest(text_chars, 1) AS BIGINT)
         AS media_per_100k
FROM st
"""


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


def q_host_anchor_text(spark, sf_dir):
    """Per-target-host anchor-text aggregation — the classic off-page
    relevance signal a crawl corpus feeds a ranker (what OTHER pages'
    link text says a host is about): every lineitem is a link whose
    anchor text is the linked part's name, exploded into terms, counted
    per (target host, term), top-3 terms per host by count DESC then
    term ASC (deterministic tie-break).

    Plan/scale: the part side is a broadcast candidate at TPC-H shape
    (|part| << |lineitem|) — at web scale the anchor table is the big
    side and the join becomes a bucketed equi-join; explode is map-side;
    the term count is a two-phase partial agg; the per-host top-3 is a
    bounded window AFTER the agg (cardinality hosts x terms, never raw
    links)."""
    links = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_key"))
    part = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("p_key"),
        F.concat(F.lit("h"), (F.col("p_partkey") % 50).cast("string"))
        .alias("dst_host"),
        "p_name")
    terms = (links.join(F.broadcast(part), "p_key")
             .select("dst_host",
                     F.explode(F.split("p_name", " ")).alias("term"))
             .filter(F.col("term") != ""))
    counts = terms.groupBy("dst_host", "term").agg(
        F.count("*").cast("long").alias("n"))
    w = Window.partitionBy("dst_host").orderBy(F.col("n").desc(),
                                               F.col("term").asc())
    return (counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .select(F.col("dst_host").alias("host_key"),
                    F.col("rk").cast("int").alias("rank"),
                    "term", "n"))


ORACLE_HOST_ANCHOR_TEXT = """
WITH terms AS (
  SELECT 'h' || (p.p_partkey % 50) AS dst_host,
         unnest(string_split(p.p_name, ' ')) AS term
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey),
counts AS (
  SELECT dst_host, term, CAST(count(*) AS BIGINT) AS n
  FROM terms WHERE term <> '' GROUP BY dst_host, term),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY dst_host
              ORDER BY n DESC, term ASC) AS rk
  FROM counts)
SELECT dst_host AS host_key, CAST(rk AS INT) AS rank, term, n
FROM ranked WHERE rk <= 3
"""


def q_graph_harmonic(spark, sf_dir):
    """Bounded-hop harmonic centrality (Boldi & Vigna's preferred
    centrality for web graphs — "Axioms for Centrality", Internet Math
    2014) over the shared 50-node host graph: for each host v, sum of
    1/d(u, v) over hosts u that reach v within 3 hops, in EXACT sixths
    (d=1 -> 6, d=2 -> 3, d=3 -> 2 units) so Spark and DuckDB agree
    bit-for-bit and no float division appears anywhere. Unreachable and
    >3-hop pairs contribute 0 — exactly the truncated harmonic sum a
    HyperBall-style sketch estimates at full scale.

    Plan/scale: level-synchronous BFS as set algebra — each frontier is
    (prev frontier JOIN edges) EXCEPT already-seen pairs; 3 bounded
    rounds = 2 joins + 2 distincts + per-level anti-joins, then one
    partial agg per level. At web scale the exact pair sets become the
    HLL counters of HyperBall; the row pins the exact semantics those
    sketches approximate."""
    edges = _host_edges50(spark, sf_dir)
    d1 = edges                                      # pairs at distance 1
    two = (d1.withColumnRenamed("dst", "mid")
           .join(edges.withColumnRenamed("src", "mid"), "mid")
           .select("src", "dst").distinct()
           .filter(F.col("src") != F.col("dst")))
    d2 = two.join(d1, ["src", "dst"], "left_anti")
    three = (d2.withColumnRenamed("dst", "mid")
             .join(edges.withColumnRenamed("src", "mid"), "mid")
             .select("src", "dst").distinct()
             .filter(F.col("src") != F.col("dst")))
    d3 = (three.join(d1, ["src", "dst"], "left_anti")
          .join(d2, ["src", "dst"], "left_anti"))
    scored = (d1.select("dst", F.lit(6).alias("w"))
              .unionByName(d2.select("dst", F.lit(3).alias("w")))
              .unionByName(d3.select("dst", F.lit(2).alias("w"))))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    agg = scored.groupBy("dst").agg(
        F.sum("w").cast("long").alias("harmonic_x6"))
    return (nodes.join(agg.withColumnRenamed("dst", "node"),
                       "node", "left")
            .select(F.col("node").alias("host_key"),
                    F.coalesce("harmonic_x6", F.lit(0)).cast("long")
                    .alias("harmonic_x6")))


ORACLE_GRAPH_HARMONIC = f"""
WITH e AS ({_HOST_E50_SQL}),
d1 AS (SELECT src, dst FROM e),
two AS (
  SELECT DISTINCT a.src, b.dst
  FROM d1 a JOIN e b ON b.src = a.dst
  WHERE a.src <> b.dst),
d2 AS (SELECT src, dst FROM two
       EXCEPT SELECT src, dst FROM d1),
three AS (
  SELECT DISTINCT a.src, b.dst
  FROM d2 a JOIN e b ON b.src = a.dst
  WHERE a.src <> b.dst),
d3 AS (SELECT src, dst FROM three
       EXCEPT SELECT src, dst FROM d1
       EXCEPT SELECT src, dst FROM d2),
scored AS (
  SELECT dst, 6 AS w FROM d1
  UNION ALL SELECT dst, 3 FROM d2
  UNION ALL SELECT dst, 2 FROM d3),
n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)
SELECT n.node AS host_key,
       CAST(coalesce(sum(s.w), 0) AS BIGINT) AS harmonic_x6
FROM n LEFT JOIN scored s ON s.dst = n.node
GROUP BY n.node
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


def q_host_ip_colocation(spark, sf_dir):
    """IP-colocation host clustering — the crawler spam/farm signal DNS
    gives for free (hundreds of "distinct" hosts resolving into one /24
    are one operator, and should share ONE politeness budget, not
    hundreds): resolve each host to a deterministic fake /24 subnet,
    count co-located hosts per subnet, and flag subnets over the farm
    threshold. The resolution rule (subnet = (n % 8) * ((n div 8) % 8))
    is intentionally SKEWED — products collapse onto composite-rich
    values, so subnet 0 absorbs every host with either factor 0, the
    way real bulletproof-hosting /24s absorb link farms.

    Plan/scale: distinct hosts -> one tiny subnet agg -> broadcast
    join-back; the agg output is O(#subnets), so the join-back side
    always broadcasts no matter how many hosts exist."""
    n = F.col("c_custkey") % 500
    hosts = (_t(spark, sf_dir, "customer")
             .select(F.concat(F.lit("h"), n.cast("string"))
                     .alias("host_key"),
                     ((n % 8) * ((n / 8).cast("long") % 8)).cast("int")
                     .alias("subnet"))
             .distinct())
    per_subnet = hosts.groupBy("subnet").agg(
        F.count("*").cast("long").alias("n_colocated"))
    return (hosts.join(F.broadcast(per_subnet), "subnet")
            .select("host_key",
                    "subnet",
                    F.concat(F.lit("10.0."), F.col("subnet").cast("string"),
                             F.lit(".0/24")).alias("cidr"),
                    "n_colocated",
                    (F.col("n_colocated") >= 12).alias("is_farm")))


ORACLE_HOST_IP_COLOCATION = """
WITH hosts AS (
  SELECT DISTINCT 'h' || (c_custkey % 500) AS host_key,
         CAST(((c_custkey % 500) % 8)
              * (((c_custkey % 500) // 8) % 8) AS INT) AS subnet
  FROM customer),
per_subnet AS (
  SELECT subnet, CAST(count(*) AS BIGINT) AS n_colocated
  FROM hosts GROUP BY subnet)
SELECT h.host_key, h.subnet,
       '10.0.' || h.subnet || '.0/24' AS cidr,
       p.n_colocated,
       p.n_colocated >= 12 AS is_farm
FROM hosts h JOIN per_subnet p ON p.subnet = h.subnet
"""


def q_spans_caption_pairs(spark, sf_dir):
    """Image-caption candidate mining over the interleaved span table —
    how multimodal training pairs (image, surrounding text) are lifted
    out of interleaved documents (the LAION/alt-text recipe, but from
    document STRUCTURE: the nearest text spans around each image, with
    their span distances, so a downstream filter can keep dist-1
    captions and drop far-context pairs): for every media span, the
    nearest preceding and nearest following text span and both span
    distances (NULL when the image opens/closes the document).

    Plan/scale: per-row array codegen (aggregate lambdas over the spans
    array) + one explode — ZERO shuffle at any scale; cost is O(spans^2)
    per doc in the worst case, bounded by the span count of a single
    document, never by the corpus."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    pairs = il.select(
        "doc_id", "spans",
        F.explode(F.expr(
            "transform("
            "  filter(sequence(1, size(spans)),"
            "         i -> element_at(spans, i).media_ref IS NOT NULL"
            "              AND element_at(spans, i).kind <> 'link'),"
            "  i -> struct("
            "    i AS img_idx,"
            "    aggregate(sequence(1, size(spans)), 0,"
            "      (acc, j) -> IF(j < i AND element_at(spans, j).media_ref"
            "                     IS NULL, j, acc)) AS prev_idx,"
            "    aggregate(sequence(1, size(spans)), 0,"
            "      (acc, j) -> IF(acc = 0 AND j > i AND"
            "                     element_at(spans, j).media_ref IS NULL,"
            "                     j, acc)) AS next_idx))"
        )).alias("p"))
    # boundary images (no text before/after) use sentinels '' / -1 instead
    # of NULL — the registry convention for nullable output columns (the
    # driver compare sorts mixed-type cells)
    return pairs.select(
        "doc_id",
        F.expr("element_at(spans, p.img_idx).media_ref").alias("media_ref"),
        F.expr("CASE WHEN p.prev_idx > 0 THEN"
               " element_at(spans, p.prev_idx).text ELSE '' END")
        .alias("caption_prev"),
        F.expr("CASE WHEN p.next_idx > 0 THEN"
               " element_at(spans, p.next_idx).text ELSE '' END")
        .alias("caption_next"),
        F.expr("CASE WHEN p.prev_idx > 0 THEN p.img_idx - p.prev_idx "
               "ELSE -1 END")
        .cast("int").alias("prev_dist"),
        F.expr("CASE WHEN p.next_idx > 0 THEN p.next_idx - p.img_idx "
               "ELSE -1 END")
        .cast("int").alias("next_dist"))


ORACLE_SPANS_CAPTION_PAIRS = f"""
WITH {_SPANS_EX_SQL},
imgs AS (
  SELECT doc_id, off, s.media_ref AS media_ref FROM ex
  WHERE s.media_ref IS NOT NULL AND s.kind <> 'link'),
texts AS (
  SELECT doc_id, off, s.text AS text FROM ex WHERE s.media_ref IS NULL),
prevs AS (
  SELECT i.doc_id, i.off, max(t.off) AS prev_off
  FROM imgs i LEFT JOIN texts t
    ON t.doc_id = i.doc_id AND t.off < i.off
  GROUP BY i.doc_id, i.off),
nexts AS (
  SELECT i.doc_id, i.off, min(t.off) AS next_off
  FROM imgs i LEFT JOIN texts t
    ON t.doc_id = i.doc_id AND t.off > i.off
  GROUP BY i.doc_id, i.off)
SELECT i.doc_id, i.media_ref,
       coalesce(tp.text, '') AS caption_prev,
       coalesce(tn.text, '') AS caption_next,
       CAST(coalesce(i.off - p.prev_off, -1) AS INT) AS prev_dist,
       CAST(coalesce(n.next_off - i.off, -1) AS INT) AS next_dist
FROM imgs i
JOIN prevs p ON p.doc_id = i.doc_id AND p.off = i.off
JOIN nexts n ON n.doc_id = i.doc_id AND n.off = i.off
LEFT JOIN texts tp ON tp.doc_id = i.doc_id AND tp.off = p.prev_off
LEFT JOIN texts tn ON tn.doc_id = i.doc_id AND tn.off = n.next_off
"""


def q_text_quality_pr(spark, sf_dir):
    """Quality-filter calibration — the eval row for the text_quality
    rubric (the eval-family pattern of ann_recall_eval /
    dedup_minhash_eval / url_bloom_eval, applied to the quality gate a
    corpus-clean pipeline thresholds on): sweep 5 score thresholds and
    report exact precision/recall in ppm against an independent weak
    label (doc length >= 200 chars — the signal the score must NOT just
    restate, since length contributes at most 30 of 100 points). This is
    the table an operator reads to PICK the corpus_clean threshold
    instead of guessing.

    Plan/scale: one scan scores every doc (all codegen), a 5-row
    threshold literal cross-joins (broadcast-trivial), one partial agg —
    counts only, ppm division exact-integer."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        TS.quality_score_expr(F.col("text")).alias("q"),
        (F.length("text") >= 200).cast("long").alias("label"))
    thr = spark.range(1, 6).select(
        (F.col("id") * 20 - 10).cast("int").alias("threshold"))  # 10..90
    graded = scored.crossJoin(F.broadcast(thr)).select(
        "threshold",
        ((F.col("q") >= F.col("threshold")).cast("long")).alias("pred"),
        "label")
    agg = graded.groupBy("threshold").agg(
        F.sum(F.col("pred") * F.col("label")).alias("tp"),
        F.sum(F.col("pred") * (1 - F.col("label"))).alias("fp"),
        F.sum((1 - F.col("pred")) * F.col("label")).alias("fn"))
    return agg.select(
        "threshold",
        F.col("tp").cast("long").alias("tp"),
        F.col("fp").cast("long").alias("fp"),
        F.col("fn").cast("long").alias("fn"),
        F.expr("tp * 1000000 DIV greatest(tp + fp, 1)").cast("long")
        .alias("precision_ppm"),
        F.expr("tp * 1000000 DIV greatest(tp + fn, 1)").cast("long")
        .alias("recall_ppm"))


ORACLE_TEXT_QUALITY_PR = f"""
WITH {_quality_cte("doc_id", "documents")},
lbl AS (
  SELECT qs.q,
         CASE WHEN qm.n >= 200 THEN 1 ELSE 0 END AS label
  FROM qs JOIN qm ON qm.doc_id = qs.doc_id
  WHERE qm.n IS NOT NULL),
thr AS (SELECT CAST(i * 20 - 10 AS INT) AS threshold
        FROM range(1, 6) t(i)),
graded AS (
  SELECT t.threshold,
         CASE WHEN l.q >= t.threshold THEN 1 ELSE 0 END AS pred,
         l.label
  FROM lbl l CROSS JOIN thr t),
agg AS (
  SELECT threshold,
         CAST(sum(pred * label) AS BIGINT) AS tp,
         CAST(sum(pred * (1 - label)) AS BIGINT) AS fp,
         CAST(sum((1 - pred) * label) AS BIGINT) AS fn
  FROM graded GROUP BY threshold)
SELECT threshold, tp, fp, fn,
       CAST(tp * 1000000 // greatest(tp + fp, 1) AS BIGINT)
         AS precision_ppm,
       CAST(tp * 1000000 // greatest(tp + fn, 1) AS BIGINT)
         AS recall_ppm
FROM agg
"""


def q_text_inverted_index(spark, sf_dir):
    """Inverted-index construction — the posting lists a search layer
    (and the BM25 row) reads, built as a bounded driver row: distinct
    (term, doc) pairs for terms of length >= 3, document frequency per
    term, the 20 highest-df terms (ties broken by term ASC), and each
    one's posting list truncated to the 10 lowest doc_ids, emitted as a
    comma-joined string (engine-portable — no array hashing in the
    compare).

    Plan/scale: explode -> distinct (the shuffle is on (term, doc_id),
    never raw text), df partial agg, top-20 via sort-limit (tiny), then
    a BROADCAST semi-join back so posting collection touches only the
    20 surviving terms' pairs; collect_list is bounded by df and sliced
    to 10 after an explicit array_sort — order is deterministic, not
    collection-order."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = (d.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.explode(F.split(F.lower("text"), " "))
                      .alias("term"))
             .filter(F.length("term") >= 3)
             .distinct())
    df_ = pairs.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    top = (df_.orderBy(F.col("df").desc(), F.col("term").asc()).limit(20))
    postings = (pairs.join(F.broadcast(top), "term")
                .groupBy("term")
                .agg(F.max("df").alias("df"),
                     F.slice(F.array_sort(F.collect_list("doc_id")),
                             1, 10).alias("plist")))
    return postings.select(
        "term", F.col("df").cast("long").alias("df"),
        F.size("plist").cast("int").alias("n_posted"),
        F.array_join(F.transform("plist", lambda x: x.cast("string")),
                     ",").alias("postings"))


ORACLE_TEXT_INVERTED_INDEX = """
WITH pairs AS (
  SELECT DISTINCT CAST(doc_id AS BIGINT) AS doc_id,
         unnest(string_split(lower(text), ' ')) AS term
  FROM documents WHERE text IS NOT NULL),
flt AS (SELECT * FROM pairs WHERE length(term) >= 3),
df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       FROM flt GROUP BY term),
top AS (
  SELECT term, df,
         row_number() OVER (ORDER BY df DESC, term ASC) AS rk
  FROM df QUALIFY rk <= 20),
plists AS (
  SELECT f.term, max(t.df) AS df,
         list_slice(list(f.doc_id ORDER BY f.doc_id), 1, 10) AS plist
  FROM flt f JOIN top t ON t.term = f.term
  GROUP BY f.term)
SELECT term, df,
       CAST(len(plist) AS INT) AS n_posted,
       array_to_string(plist, ',') AS postings
FROM plists
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


def q_corpus_tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language — the tokenizer-eval metric
    (tokens per word / bytes per token) a multilingual data pipeline
    tracks per language bucket, because a tokenizer that fragments one
    language 3x more than another silently re-weights the training mix:
    per declared lang, total whitespace words, BPE-ish tokens (the
    shared token_counts_exprs segmentation), chars, fertility
    (bpe/word) and chars-per-token in exact ppm.

    Plan/scale: single scan, all-codegen token exprs, one partial agg —
    the same shape as text_token_count with the eval arithmetic on
    top."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    tc = TS.token_counts_exprs(F.col("text"))
    per = d.select("lang", tc["n_tokens_ws"].alias("ws"),
                   tc["n_tokens_bpe"].alias("bpe"),
                   F.length("text").alias("chars"))
    agg = per.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("ws").cast("long").alias("n_words"),
        F.sum("bpe").cast("long").alias("n_tokens"),
        F.sum("chars").cast("long").alias("n_chars"))
    return agg.select(
        "lang", "n_docs", "n_words", "n_tokens", "n_chars",
        F.expr("n_tokens * 1000000 DIV greatest(n_words, 1)").cast("long")
        .alias("fertility_ppm"),
        F.expr("n_chars * 1000000 DIV greatest(n_tokens, 1)").cast("long")
        .alias("chars_per_token_ppm"))


ORACLE_CORPUS_TOKENIZER_FERTILITY = r"""
WITH agg AS (
  SELECT lang,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_words,
         CAST(sum(len(regexp_extract_all(text,
             '[A-Za-z]{1,4}|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
           AS n_tokens,
         CAST(sum(length(text)) AS BIGINT) AS n_chars
  FROM documents WHERE text IS NOT NULL GROUP BY lang)
SELECT lang, n_docs, n_words, n_tokens, n_chars,
       CAST(n_tokens * 1000000 // greatest(n_words, 1) AS BIGINT)
         AS fertility_ppm,
       CAST(n_chars * 1000000 // greatest(n_tokens, 1) AS BIGINT)
         AS chars_per_token_ppm
FROM agg
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


def q_host_lang_mix(spark, sf_dir):
    """Site-level language routing — per-language crawls and per-language
    corpus builds need to know whether a HOST is monolingual before
    routing it to a language pipeline (a host serving 40% en / 60% de
    must not be bulk-labelled by its majority): per host, distinct
    language count, the majority language (count DESC, lang ASC
    tie-break), its exact share in ppm, and the mixed-site flag
    (majority < 80%).

    Plan/scale: one (host, lang) partial agg, then a bounded per-host
    window over <= #languages rows — never over raw docs."""
    i = F.col("doc_id")
    d = (_t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
         .select(F.concat(F.lit("h"), (i % 50).cast("string"))
                 .alias("host_key"), "lang"))
    counts = d.groupBy("host_key", "lang").agg(
        F.count("*").cast("long").alias("n"))
    tot = Window.partitionBy("host_key")
    w = Window.partitionBy("host_key").orderBy(F.col("n").desc(),
                                               F.col("lang").asc())
    return (counts
            .withColumn("n_docs", F.sum("n").over(tot))
            .withColumn("n_langs", F.count("*").over(tot))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("host_key",
                    F.col("n_docs").cast("long").alias("n_docs"),
                    F.col("n_langs").cast("int").alias("n_langs"),
                    F.col("lang").alias("majority_lang"),
                    F.expr("n * 1000000 DIV n_docs").cast("long")
                    .alias("majority_ppm"),
                    (F.expr("n * 1000000 DIV n_docs") < 800000)
                    .alias("is_mixed")))


ORACLE_HOST_LANG_MIX = """
WITH d AS (
  SELECT 'h' || (doc_id % 50) AS host_key, lang
  FROM documents WHERE text IS NOT NULL),
counts AS (
  SELECT host_key, lang, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY host_key, lang),
stats AS (
  SELECT host_key, lang, n,
         sum(n) OVER (PARTITION BY host_key) AS n_docs,
         count(*) OVER (PARTITION BY host_key) AS n_langs,
         row_number() OVER (PARTITION BY host_key
                            ORDER BY n DESC, lang ASC) AS rk
  FROM counts)
SELECT host_key,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_langs AS INT) AS n_langs,
       lang AS majority_lang,
       CAST(n * 1000000 // n_docs AS BIGINT) AS majority_ppm,
       (n * 1000000 // n_docs) < 800000 AS is_mixed
FROM stats WHERE rk = 1
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


def q_host_outlink_diversity(spark, sf_dir):
    """Outlink-diversity profile per source host — the hub-vs-silo signal
    frontier prioritization reads (a host whose links all point at one
    target is a silo/mirror; a diverse hub seeds breadth): per src host
    over the link multiset, link count, distinct targets, the top
    target's share, and the Simpson diversity index 1 - Σ n_i²/N² — all
    in EXACT ppm integer arithmetic (no entropy/log, so Spark and DuckDB
    agree bit-for-bit).

    Plan/scale: one (src, dst) partial agg, then a per-host agg over
    <= #distinct-targets rows; both map-side combinable."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    links = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("src"),
        F.concat(F.lit("h"), (c % 50).cast("string")).alias("dst"))
    per_dst = links.groupBy("src", "dst").agg(
        F.count("*").cast("long").alias("n"))
    agg = per_dst.groupBy("src").agg(
        F.sum("n").alias("n_links"),
        F.count("*").cast("long").alias("n_targets"),
        F.max("n").alias("top_n"),
        F.sum(F.col("n") * F.col("n")).alias("sum_sq"))
    return agg.select(
        F.col("src").alias("host_key"),
        F.col("n_links").cast("long").alias("n_links"),
        "n_targets",
        F.expr("top_n * 1000000 DIV n_links").cast("long")
        .alias("top_share_ppm"),
        F.expr("(n_links * n_links - sum_sq) * 1000000 "
               "DIV (n_links * n_links)").cast("long")
        .alias("simpson_ppm"))


ORACLE_HOST_OUTLINK_DIVERSITY = """
WITH links AS (
  SELECT 'h' || (o_orderkey % 50) AS src,
         'h' || (o_custkey % 50) AS dst
  FROM orders),
per_dst AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
  FROM links GROUP BY src, dst),
agg AS (
  SELECT src, sum(n) AS n_links,
         CAST(count(*) AS BIGINT) AS n_targets,
         max(n) AS top_n, sum(n * n) AS sum_sq
  FROM per_dst GROUP BY src)
SELECT src AS host_key,
       CAST(n_links AS BIGINT) AS n_links,
       n_targets,
       CAST(top_n * 1000000 // n_links AS BIGINT) AS top_share_ppm,
       CAST((n_links * n_links - sum_sq) * 1000000
            // (n_links * n_links) AS BIGINT) AS simpson_ppm
FROM agg
"""


def _mmr_cos(a_col: str, b_col: str):
    """Exact cosine between two embedding array columns (doubles)."""
    num = F.expr(f"aggregate(zip_with({a_col}, {b_col}, "
                 "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
                 "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    def nrm(c):
        return F.sqrt(F.expr(
            f"aggregate(transform({c}, x -> CAST(x AS DOUBLE) "
            f"* CAST(x AS DOUBLE)), CAST(0.0 AS DOUBLE), "
            "(acc, v) -> acc + v)"))
    return num / (nrm(a_col) * nrm(b_col))


def q_embeddings_mmr_rerank(spark, sf_dir):
    """Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the diversity pass retrieval stacks run AFTER top-k:
    from each query's 10 nearest neighbors, pick 5 greedily by
    MMR = 2*rel(c) - max_{s in selected} sim(c, s) (lambda = 1/2,
    doubled to avoid fractions), so near-duplicate neighbors are demoted
    in favor of coverage. Ties break by neighbor_id ASC; output is
    rank-only (query_id, mmr_rank, neighbor_id) — the float scores order
    but never leave the plan, the ann-family exactness discipline.

    Plan/scale: candidate generation is the brute-force top-10 (swap for
    ann_lsh/ann_ivf buckets at scale — MMR only ever sees k' = 10 rows
    per query); the candidate-pair sim matrix is 10x10 PER QUERY, built
    with one self-join; 4 unrolled greedy rounds, each one bounded
    window + one max-per-key agg over <= 10 rows per query. Nothing in
    the loop scales with corpus size."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").alias("e"))
    q = (emb.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("e").alias("qe")))
    scored = (q.join(emb.select(F.col("vec_id").alias("neighbor_id"),
                                F.col("e").alias("ne")),
                     F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id", "qe", "ne",
                      _mmr_cos("qe", "ne").alias("rel")))
    wk = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("neighbor_id").asc())
    # no persist: the contract returns an unexecuted DataFrame, so a
    # build-time persist/unpersist pair would either leak cache blocks or
    # never exist during execution (q_host_pagerank's precedent) — the
    # repeated cand/sims subplans dedupe via ReusedExchange instead
    cand = (scored.withColumn("rk", F.row_number().over(wk))
            .filter(F.col("rk") <= 10)
            .select("query_id", "neighbor_id", "ne", "rel"))
    sims = (cand.select("query_id", F.col("neighbor_id").alias("a"),
                        F.col("ne").alias("ae"))
            .join(cand.select(F.col("query_id").alias("query_id"),
                              F.col("neighbor_id").alias("b"),
                              F.col("ne").alias("be")), "query_id")
            .filter(F.col("a") != F.col("b"))
            .select("query_id", "a", "b",
                    _mmr_cos("ae", "be").alias("sim")))
    pool = cand.select("query_id", "neighbor_id", "rel")
    sel = (pool.withColumn("rk", F.row_number().over(wk))
           .filter(F.col("rk") == 1)
           .select("query_id", "neighbor_id",
                   F.lit(1).alias("mmr_rank")))
    for t in range(2, 6):
        remaining = pool.join(sel.select("query_id", "neighbor_id"),
                              ["query_id", "neighbor_id"], "left_anti")
        pen = (sims.join(sel.select("query_id",
                                    F.col("neighbor_id").alias("b")),
                         ["query_id", "b"])
               .groupBy("query_id", F.col("a").alias("neighbor_id"))
               .agg(F.max("sim").alias("pen")))
        scored_t = (remaining.join(pen, ["query_id", "neighbor_id"])
                    .select("query_id", "neighbor_id",
                            (F.lit(2) * F.col("rel") - F.col("pen"))
                            .alias("mmr")))
        wm = Window.partitionBy("query_id").orderBy(
            F.col("mmr").desc(), F.col("neighbor_id").asc())
        pick = (scored_t.withColumn("rk", F.row_number().over(wm))
                .filter(F.col("rk") == 1)
                .select("query_id", "neighbor_id",
                        F.lit(t).alias("mmr_rank")))
        sel = sel.unionByName(pick)
    return sel.select("query_id",
                      F.col("mmr_rank").cast("int").alias("mmr_rank"),
                      "neighbor_id")


def _mmr_round_sql(prev_sel: str, t: int) -> str:
    return f"""pen{t} AS (
  SELECT s.query_id, s.a AS neighbor_id, max(s.sim) AS pen
  FROM sims s JOIN {prev_sel} p
    ON p.query_id = s.query_id AND p.neighbor_id = s.b
  GROUP BY s.query_id, s.a),
sc{t} AS (
  SELECT c.query_id, c.neighbor_id, 2 * c.rel - p.pen AS mmr
  FROM cand c
  JOIN pen{t} p ON p.query_id = c.query_id
    AND p.neighbor_id = c.neighbor_id
  WHERE NOT EXISTS (SELECT 1 FROM {prev_sel} q
                    WHERE q.query_id = c.query_id
                      AND q.neighbor_id = c.neighbor_id)),
pick{t} AS (
  SELECT query_id, neighbor_id, {t} AS mmr_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY mmr DESC, neighbor_id ASC) AS rk
    FROM sc{t}) WHERE rk = 1),
sel{t} AS (SELECT * FROM {prev_sel}
           UNION ALL SELECT * FROM pick{t})"""


ORACLE_EMBEDDINGS_MMR = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id, b.embedding AS ne,
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
         AS rel
  FROM embeddings q JOIN embeddings b ON b.vec_id != q.vec_id
  WHERE q.vec_id < 10),
cand AS (
  SELECT query_id, neighbor_id, ne, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
               ORDER BY rel DESC, neighbor_id ASC) AS rk
    FROM scored) WHERE rk <= 10),
sims AS (
  SELECT x.query_id, x.neighbor_id AS a, y.neighbor_id AS b,
         list_sum(list_transform(range(len(x.ne)),
             i -> x.ne[i+1]::DOUBLE * y.ne[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(x.ne)),
             i -> x.ne[i+1]::DOUBLE * x.ne[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(y.ne)),
             i -> y.ne[i+1]::DOUBLE * y.ne[i+1]::DOUBLE))))
         AS sim
  FROM cand x JOIN cand y ON y.query_id = x.query_id
   AND y.neighbor_id != x.neighbor_id),
sel1 AS (
  SELECT query_id, neighbor_id, 1 AS mmr_rank FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY rel DESC, neighbor_id ASC) AS rk
    FROM cand) WHERE rk = 1),
{_mmr_round_sql("sel1", 2)},
{_mmr_round_sql("sel2", 3)},
{_mmr_round_sql("sel3", 4)},
{_mmr_round_sql("sel4", 5)}
SELECT query_id, CAST(mmr_rank AS INT) AS mmr_rank, neighbor_id
FROM sel5
"""


def q_events_ohlc(spark, sf_dir):
    """OHLC bar aggregation — the first/last/extremes rollup every
    time-series telemetry store runs per bucket (fetch-latency bars per
    host work identically to price bars per symbol): per (series, hour),
    open = first value in (ts, event_id) order, close = last, high/low =
    extremes, volume = sum. Values are integers (event_id-derived) so
    the bars are engine-exact; (ts, event_id) is a total order so
    open/close are deterministic.

    Plan/scale: one window pass per (series, hour) partition — bounded
    by bucket occupancy — then one partial agg; no self-joins."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("s"), (F.col("user_id") % 10).cast("string"))
        .alias("series"),
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "ts", "event_id",
        (F.col("event_id") % 1000 + 100).cast("long").alias("price"))
    wa = Window.partitionBy("series", "bar_hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("series", "bar_hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    marked = (ev.withColumn("rna", F.row_number().over(wa))
              .withColumn("rnd", F.row_number().over(wd)))
    return (marked.groupBy("series", "bar_hour").agg(
        F.max(F.when(F.col("rna") == 1, F.col("price"))).cast("long")
        .alias("open"),
        F.max("price").cast("long").alias("high"),
        F.min("price").cast("long").alias("low"),
        F.max(F.when(F.col("rnd") == 1, F.col("price"))).cast("long")
        .alias("close"),
        F.count("*").cast("long").alias("n_events"),
        F.sum("price").cast("long").alias("volume")))


ORACLE_EVENTS_OHLC = """
WITH ev AS (
  SELECT 's' || (user_id % 10) AS series,
         date_trunc('hour', ts) AS bar_hour,
         ts, event_id,
         CAST(event_id % 1000 + 100 AS BIGINT) AS price
  FROM events),
marked AS (
  SELECT *,
         row_number() OVER (PARTITION BY series, bar_hour
                            ORDER BY ts, event_id) AS rna,
         row_number() OVER (PARTITION BY series, bar_hour
                            ORDER BY ts DESC, event_id DESC) AS rnd
  FROM ev)
SELECT series, bar_hour,
       CAST(max(CASE WHEN rna = 1 THEN price END) AS BIGINT) AS open,
       CAST(max(price) AS BIGINT) AS high,
       CAST(min(price) AS BIGINT) AS low,
       CAST(max(CASE WHEN rnd = 1 THEN price END) AS BIGINT) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(price) AS BIGINT) AS volume
FROM marked GROUP BY series, bar_hour
"""


def q_frontier_age_stats(spark, sf_dir):
    """Frontier queue-age health — the staleness dashboard a crawl
    operator watches (a host whose p95 queue age explodes is starved by
    its politeness budget; the fix is splitting the host or raising its
    budget): per host, exact age histogram (0-7 / 8-30 / 31-90 / 90+
    days vs the 2002-01-01 reference instant) and EXACT p50/p95 ages by
    position (value at row ceil(q*n) of the age-ordered queue — the
    nearest-rank percentile definition, no interpolation, no floats).

    Plan/scale: one window rank per host partition (bounded by queue
    depth) + one agg; percentile selection is a filter on rank, not a
    sort of the whole frontier."""
    k = F.col("o_orderkey")
    fr = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 40).cast("string"))
        .alias("host_key"),
        k.alias("seq"),
        F.datediff(F.lit("2002-01-01").cast("date"),
                   F.col("o_orderdate").cast("date")).cast("long")
        .alias("age_days"))
    w = Window.partitionBy("host_key").orderBy("age_days", "seq")
    ranked = (fr.withColumn("rn", F.row_number().over(w))
              .withColumn("n", F.count("*").over(
                  Window.partitionBy("host_key"))))
    hist = fr.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_urls"),
        F.sum((F.col("age_days") <= 7).cast("long")).cast("long")
        .alias("b_0_7"),
        F.sum(((F.col("age_days") > 7) & (F.col("age_days") <= 30))
              .cast("long")).cast("long").alias("b_8_30"),
        F.sum(((F.col("age_days") > 30) & (F.col("age_days") <= 90))
              .cast("long")).cast("long").alias("b_31_90"),
        F.sum((F.col("age_days") > 90).cast("long")).cast("long")
        .alias("b_90_plus"))
    p50 = (ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
           .select("host_key", F.col("age_days").alias("p50_age_days")))
    p95 = (ranked.filter(F.col("rn") == F.expr("(95 * n + 99) DIV 100"))
           .select("host_key", F.col("age_days").alias("p95_age_days")))
    return (hist.join(p50, "host_key").join(p95, "host_key")
            .select("host_key", "n_urls", "b_0_7", "b_8_30", "b_31_90",
                    "b_90_plus", "p50_age_days", "p95_age_days"))


ORACLE_FRONTIER_AGE_STATS = """
WITH fr AS (
  SELECT 'h' || (o_custkey % 40) AS host_key,
         o_orderkey AS seq,
         CAST(date_diff('day', CAST(o_orderdate AS DATE),
                        DATE '2002-01-01') AS BIGINT) AS age_days
  FROM orders),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY host_key
                            ORDER BY age_days, seq) AS rn,
         count(*) OVER (PARTITION BY host_key) AS n
  FROM fr),
hist AS (
  SELECT host_key,
         CAST(count(*) AS BIGINT) AS n_urls,
         CAST(sum(CASE WHEN age_days <= 7 THEN 1 ELSE 0 END) AS BIGINT)
           AS b_0_7,
         CAST(sum(CASE WHEN age_days > 7 AND age_days <= 30
                       THEN 1 ELSE 0 END) AS BIGINT) AS b_8_30,
         CAST(sum(CASE WHEN age_days > 30 AND age_days <= 90
                       THEN 1 ELSE 0 END) AS BIGINT) AS b_31_90,
         CAST(sum(CASE WHEN age_days > 90 THEN 1 ELSE 0 END) AS BIGINT)
           AS b_90_plus
  FROM fr GROUP BY host_key),
p50 AS (SELECT host_key, age_days AS p50_age_days FROM ranked
        WHERE rn = (n + 1) // 2),
p95 AS (SELECT host_key, age_days AS p95_age_days FROM ranked
        WHERE rn = (95 * n + 99) // 100)
SELECT h.host_key, h.n_urls, h.b_0_7, h.b_8_30, h.b_31_90, h.b_90_plus,
       p50.p50_age_days, p95.p95_age_days
FROM hist h
JOIN p50 ON p50.host_key = h.host_key
JOIN p95 ON p95.host_key = h.host_key
"""


def q_embeddings_norm_audit(spark, sf_dir):
    """Embedding ingest audit — the data-quality gate an embedding
    pipeline runs before vectors enter an index (zeroed vectors poison
    IVF centroids; mis-scaled vectors break cosine assumptions): each
    vector's squared norm in EXACT 1e-12 integer units (elements
    quantized to 1e-6 like embeddings_standardize, so summation order
    is free), classified zero / low / high / ok against fixed
    thresholds. Corruption is injected deterministically: vec_id % 29
    zeroed, % 31 scaled x3 (norm2 x9 — exact integer), % 37 truncated
    to its first 4 dims.

    Plan/scale: per-row array codegen + one 4-row agg; nothing
    shuffles but the class key."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    xu = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6)" \
         " AS BIGINT))"
    full = (f"aggregate({xu}, CAST(0 AS BIGINT), "
            "(acc, v) -> acc + v * v)")
    head4 = (f"aggregate(slice({xu}, 1, 4), CAST(0 AS BIGINT), "
             "(acc, v) -> acc + v * v)")
    norm2 = F.when(F.col("vec_id") % 29 == 0, F.lit(0).cast("long")) \
        .when(F.col("vec_id") % 31 == 0, F.expr(f"9 * ({full})")) \
        .when(F.col("vec_id") % 37 == 0, F.expr(head4)) \
        .otherwise(F.expr(full))
    LOW, HIGH = 250_000_000_000, 4_000_000_000_000
    klass = (F.when(F.col("norm2") == 0, F.lit("zero"))
             .when(F.col("norm2") < LOW, F.lit("low"))
             .when(F.col("norm2") > HIGH, F.lit("high"))
             .otherwise(F.lit("ok")))
    audited = e.select("vec_id", norm2.alias("norm2")) \
        .withColumn("audit_class", klass)
    return audited.groupBy("audit_class").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.min("norm2").cast("long").alias("min_norm2"),
        F.max("norm2").cast("long").alias("max_norm2"))


ORACLE_EMBEDDINGS_NORM_AUDIT = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xu
  FROM embeddings),
norms AS (
  SELECT vec_id,
         CAST(CASE
           WHEN vec_id % 29 = 0 THEN 0
           WHEN vec_id % 31 = 0 THEN
             9 * list_sum(list_transform(xu, v -> v * v))
           WHEN vec_id % 37 = 0 THEN
             coalesce(list_sum(list_transform(xu[1:4], v -> v * v)), 0)
           ELSE list_sum(list_transform(xu, v -> v * v))
         END AS BIGINT) AS norm2
  FROM base),
classed AS (
  SELECT CASE WHEN norm2 = 0 THEN 'zero'
              WHEN norm2 < 250000000000 THEN 'low'
              WHEN norm2 > 4000000000000 THEN 'high'
              ELSE 'ok' END AS audit_class,
         norm2
  FROM norms)
SELECT audit_class,
       CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(min(norm2) AS BIGINT) AS min_norm2,
       CAST(max(norm2) AS BIGINT) AS max_norm2
FROM classed GROUP BY audit_class
"""


def q_spans_token_budget(spark, sf_dir):
    """Multimodal context budgeting over the interleaved span table —
    the packing arithmetic a vision-language training pipeline runs
    before sequence assembly (each image costs a FIXED patch budget; a
    doc that exceeds the context must split): per doc, text tokens
    (whitespace), media spans x 256 patch tokens, total, whether it fits
    a 4096-token context, and the exact split count ceil(total/4096).

    Plan/scale: zero-shuffle array codegen per row (the spans census
    shape); the downstream packer (corpus_pack) consumes these
    numbers."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    text_tokens = F.expr(
        "aggregate(filter(spans, s -> s.media_ref IS NULL), "
        "CAST(0 AS BIGINT), "
        "(acc, s) -> acc + size(split(s.text, ' ')))")
    n_media = F.size(F.expr(
        "filter(spans, s -> s.media_ref IS NOT NULL "
        "AND s.kind <> 'link')"))
    budgeted = il.select(
        "doc_id",
        text_tokens.alias("text_tokens"),
        (n_media.cast("long") * 256).alias("media_tokens"))
    return budgeted.select(
        "doc_id", "text_tokens", "media_tokens",
        (F.col("text_tokens") + F.col("media_tokens")).cast("long")
        .alias("total_tokens"),
        ((F.col("text_tokens") + F.col("media_tokens")) <= 4096)
        .alias("fits_context"),
        F.expr("CAST((text_tokens + media_tokens + 4095) DIV 4096 "
               "AS BIGINT)").alias("n_splits"))


ORACLE_SPANS_TOKEN_BUDGET = f"""
WITH {_SPANS_EX_SQL},
budgeted AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(
                list_filter(spans, s -> s.media_ref IS NULL),
                s -> len(string_split(s.text, ' ')))), 0) AS BIGINT)
           AS text_tokens,
         CAST(len(list_filter(spans, s -> s.media_ref IS NOT NULL
                              AND s.kind <> 'link')) * 256 AS BIGINT)
           AS media_tokens
  FROM il)
SELECT doc_id, text_tokens, media_tokens,
       CAST(text_tokens + media_tokens AS BIGINT) AS total_tokens,
       (text_tokens + media_tokens) <= 4096 AS fits_context,
       CAST((text_tokens + media_tokens + 4095) // 4096 AS BIGINT)
         AS n_splits
FROM budgeted
"""


def q_host_mirror_detect(spark, sf_dir):
    """Mirror-host detection — cross-HOST dedup at site granularity (the
    reference's leak boards live behind mirror lists — zone_board's
    mirror-archive shape — and a crawler that treats 5 mirrors as 5
    hosts wastes 5x fetch budget and 5x corpus weight): hosts whose
    document-fingerprint SETS overlap. Mirrors are synthesized
    deterministically (every 4th doc also "appears" on host+50), then
    detected from content alone: md5 doc fingerprints, host-fp distinct
    pairs, shared-fp equi-join, exact set Jaccard in ppm, mirror flag
    at >= 200000 ppm.

    Plan/scale: the pair join keys on the fingerprint — cost is
    Σ df(fp)² like the dedup family, never #hosts² — and wide text never
    shuffles (16-byte digests do)."""
    i = F.col("doc_id")
    base = (_t(spark, sf_dir, "documents")
            .filter(F.col("text").isNotNull())
            .select(i.alias("doc_id"), F.md5("text").alias("fp")))
    primary = base.select((i % 50).cast("int").alias("hostnum"), "fp")
    mirrored = (base.filter(i % 4 == 0)
                .select((i % 50 + 50).cast("int").alias("hostnum"), "fp"))
    hostfp = (primary.unionByName(mirrored)
              .select(F.concat(F.lit("h"), F.col("hostnum").cast("string"))
                      .alias("host_key"), "fp", "hostnum")
              .distinct())
    sizes = hostfp.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_fp"))
    shared = (hostfp.select("host_key", "fp", "hostnum")
              .join(hostfp.select(F.col("host_key").alias("host_b"),
                                  "fp",
                                  F.col("hostnum").alias("hostnum_b")),
                    "fp")
              .filter(F.col("hostnum") < F.col("hostnum_b"))
              .groupBy("host_key", "host_b")
              .agg(F.count("*").cast("long").alias("n_shared")))
    return (shared
            .join(sizes, "host_key")
            .join(sizes.select(F.col("host_key").alias("host_b"),
                               F.col("n_fp").alias("n_fp_b")), "host_b")
            .select(F.col("host_key").alias("host_a"), "host_b",
                    "n_shared",
                    F.expr("n_shared * 1000000 "
                           "DIV (n_fp + n_fp_b - n_shared)").cast("long")
                    .alias("jaccard_ppm"),
                    (F.expr("n_shared * 1000000 "
                            "DIV (n_fp + n_fp_b - n_shared)") >= 200000)
                    .alias("is_mirror")))


ORACLE_HOST_MIRROR_DETECT = """
WITH base AS (
  SELECT doc_id, md5(text) AS fp
  FROM documents WHERE text IS NOT NULL),
hostfp AS (
  SELECT DISTINCT hostnum, 'h' || hostnum AS host_key, fp FROM (
    SELECT CAST(doc_id % 50 AS INT) AS hostnum, fp FROM base
    UNION ALL
    SELECT CAST(doc_id % 50 + 50 AS INT), fp FROM base
    WHERE doc_id % 4 = 0)),
sizes AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_fp
  FROM hostfp GROUP BY host_key),
shared AS (
  SELECT a.host_key AS host_a, b.host_key AS host_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM hostfp a JOIN hostfp b
    ON b.fp = a.fp AND a.hostnum < b.hostnum
  GROUP BY a.host_key, b.host_key)
SELECT s.host_a, s.host_b, s.n_shared,
       CAST(s.n_shared * 1000000
            // (sa.n_fp + sb.n_fp - s.n_shared) AS BIGINT)
         AS jaccard_ppm,
       (s.n_shared * 1000000 // (sa.n_fp + sb.n_fp - s.n_shared))
         >= 200000 AS is_mirror
FROM shared s
JOIN sizes sa ON sa.host_key = s.host_a
JOIN sizes sb ON sb.host_key = s.host_b
"""


def q_text_code_detect(spark, sf_dir):
    """Code-vs-prose routing — the corpus-composition gate every LLM
    data pipeline runs (code goes to a code pipeline with different
    dedup/quality rules; prose goes to text cleaning): symbol density,
    code-keyword hits, and digit density vote on each doc; 2+ votes
    route to `code`. Code docs are synthesized deterministically (every
    11th doc gains a code tail) so both routes materialize and the
    detector is judged against a known plant.

    Plan/scale: per-row regexp codegen + one 2-row agg — one scan, no
    Python, the same shape as the C4/Gopher filter rows."""
    i = F.col("doc_id")
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    code_tail = (" def run(): return {x[i]; i += 1}"
                 " if (a == b) { return 0; } // end")
    text = F.when(i % 11 == 0,
                  F.concat(F.col("text"), F.lit(code_tail))
                  ).otherwise(F.col("text"))
    t = d.select(i.alias("doc_id"), text.alias("t"))
    n_chars = F.greatest(F.length("t"), F.lit(1))
    n_sym = F.length(F.regexp_replace("t", "[^{}();=\\[\\]<>]", ""))
    kw_hits = F.size(F.expr(
        r"regexp_extract_all(t, '\\b(def|return|if|else|for|while"
        r"|var|let|const|function|import)\\b', 0)"))
    n_digit = F.length(F.regexp_replace("t", "[^0-9]", ""))
    feat = t.select(
        "doc_id",
        (n_sym * 1000 / n_chars >= 10).cast("int").alias("v_sym"),
        (kw_hits >= 3).cast("int").alias("v_kw"),
        (n_digit * 1000 / n_chars >= 5).cast("int").alias("v_digit"))
    routed = feat.select(
        F.when(F.col("v_sym") + F.col("v_kw") + F.col("v_digit") >= 2,
               F.lit("code")).otherwise(F.lit("prose")).alias("route"),
        "v_sym", "v_kw", "v_digit")
    return routed.groupBy("route").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("v_sym").cast("long").alias("n_sym_votes"),
        F.sum("v_kw").cast("long").alias("n_kw_votes"),
        F.sum("v_digit").cast("long").alias("n_digit_votes"))


ORACLE_TEXT_CODE_DETECT = r"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text ||
           ' def run(): return {x[i]; i += 1} if (a == b) { return 0; } // end'
         ELSE text END AS t
  FROM documents WHERE text IS NOT NULL),
feat AS (
  SELECT doc_id,
    CASE WHEN length(regexp_replace(t, '[^{}();=\[\]<>]', '', 'g'))
              * 1000 / greatest(length(t), 1) >= 10
         THEN 1 ELSE 0 END AS v_sym,
    CASE WHEN len(regexp_extract_all(t, '\b(def|return|if|else|for'
              || '|while|var|let|const|function|import)\b')) >= 3
         THEN 1 ELSE 0 END AS v_kw,
    CASE WHEN length(regexp_replace(t, '[^0-9]', '', 'g'))
              * 1000 / greatest(length(t), 1) >= 5
         THEN 1 ELSE 0 END AS v_digit
  FROM t),
routed AS (
  SELECT CASE WHEN v_sym + v_kw + v_digit >= 2 THEN 'code'
              ELSE 'prose' END AS route,
         v_sym, v_kw, v_digit
  FROM feat)
SELECT route, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(v_sym) AS BIGINT) AS n_sym_votes,
       CAST(sum(v_kw) AS BIGINT) AS n_kw_votes,
       CAST(sum(v_digit) AS BIGINT) AS n_digit_votes
FROM routed GROUP BY route
"""


def q_graph_hop_histogram(spark, sf_dir):
    """Hop-distance distribution of the host graph — the
    neighbourhood-function summary web-graph analyses lead with (Broder
    et al.'s bow-tie paper; HyperBall computes exactly this at scale):
    pair counts at min-distance 1/2/3 over the shared 50-host graph,
    reachable-pair ratio vs all ordered pairs (ppm), and the effective
    diameter d90 — the smallest hop count covering >= 90% of reachable
    (<= 3 hop) pairs. Level-synchronous BFS set algebra (the
    graph_harmonic machinery) keeps everything exact-integer.

    Plan/scale: 2 bounded joins + per-level anti-joins + one global agg;
    at web scale the pair sets become HyperBall HLL counters — this row
    pins the semantics those sketches estimate."""
    edges = _host_edges50(spark, sf_dir)
    d1 = edges
    two = (d1.withColumnRenamed("dst", "mid")
           .join(edges.withColumnRenamed("src", "mid"), "mid")
           .select("src", "dst").distinct()
           .filter(F.col("src") != F.col("dst")))
    d2 = two.join(d1, ["src", "dst"], "left_anti")
    three = (d2.withColumnRenamed("dst", "mid")
             .join(edges.withColumnRenamed("src", "mid"), "mid")
             .select("src", "dst").distinct()
             .filter(F.col("src") != F.col("dst")))
    d3 = (three.join(d1, ["src", "dst"], "left_anti")
          .join(d2, ["src", "dst"], "left_anti"))
    nodes = (edges.select(F.col("src").alias("node"))
             .unionByName(edges.select(F.col("dst").alias("node")))
             .distinct())
    counts = (d1.select(F.lit(1).alias("d"))
              .unionByName(d2.select(F.lit(2).alias("d")))
              .unionByName(d3.select(F.lit(3).alias("d")))
              .groupBy("d").agg(F.count("*").cast("long").alias("n")))
    tot = counts.agg(
        F.sum("n").alias("n_reach"),
        F.sum(F.when(F.col("d") <= 1, F.col("n")).otherwise(0))
        .alias("c1"),
        F.sum(F.when(F.col("d") <= 2, F.col("n")).otherwise(0))
        .alias("c2"))
    nn = nodes.agg(F.count("*").alias("n_nodes"))
    return (counts.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(nn))
            .select("d", "n",
                    F.expr("n_reach * 1000000 "
                           "DIV (n_nodes * (n_nodes - 1))").cast("long")
                    .alias("reach_ppm"),
                    F.expr("CASE WHEN c1 * 10 >= n_reach * 9 THEN 1 "
                           "WHEN c2 * 10 >= n_reach * 9 THEN 2 "
                           "ELSE 3 END").cast("int").alias("d90")))


ORACLE_GRAPH_HOP_HISTOGRAM = f"""
WITH e AS ({_HOST_E50_SQL}),
d1 AS (SELECT src, dst FROM e),
two AS (
  SELECT DISTINCT a.src, b.dst
  FROM d1 a JOIN e b ON b.src = a.dst WHERE a.src <> b.dst),
d2 AS (SELECT src, dst FROM two EXCEPT SELECT src, dst FROM d1),
three AS (
  SELECT DISTINCT a.src, b.dst
  FROM d2 a JOIN e b ON b.src = a.dst WHERE a.src <> b.dst),
d3 AS (SELECT src, dst FROM three
       EXCEPT SELECT src, dst FROM d1
       EXCEPT SELECT src, dst FROM d2),
counts AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM (
    SELECT 1 AS d FROM d1
    UNION ALL SELECT 2 FROM d2
    UNION ALL SELECT 3 FROM d3) GROUP BY d),
tot AS (
  SELECT sum(n) AS n_reach,
         sum(CASE WHEN d <= 1 THEN n ELSE 0 END) AS c1,
         sum(CASE WHEN d <= 2 THEN n ELSE 0 END) AS c2
  FROM counts),
nn AS (
  SELECT count(*) AS n_nodes FROM (
    SELECT src AS node FROM e UNION SELECT dst FROM e))
SELECT c.d, c.n,
       CAST(t.n_reach * 1000000
            // (nn.n_nodes * (nn.n_nodes - 1)) AS BIGINT) AS reach_ppm,
       CAST(CASE WHEN t.c1 * 10 >= t.n_reach * 9 THEN 1
                 WHEN t.c2 * 10 >= t.n_reach * 9 THEN 2
                 ELSE 3 END AS INT) AS d90
FROM counts c CROSS JOIN tot t CROSS JOIN nn
"""


def q_embeddings_mrl_eval(spark, sf_dir):
    """Matryoshka truncation eval — modern embedding pipelines store
    MRL-trained vectors and serve a truncated prefix for cheap
    retrieval; before turning that on you measure what truncation costs:
    top-5 cosine neighbors using only the FIRST 16 of 64 dims, graded
    against full-dim top-5 (recall@5 in exact ppm per query + the
    aggregate). The fixture's embeddings are NOT MRL-trained, so recall
    is expectedly mediocre — the row is the measurement harness, and
    the rank-only comparison keeps it engine-exact.

    Plan/scale: two brute-force scorings of the same broadcast query
    set (swap the full-dim side for an ANN path at scale), one
    rank-window each, one join on the pair key, one agg."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = (emb.filter(F.col("vec_id") < 10)
         .select(F.col("vec_id").alias("query_id"),
                 F.col("embedding").alias("qe")))
    b = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("ne"))
    scored = (q.join(b, F.col("neighbor_id") != F.col("query_id"))
              .withColumn("qe16", F.slice("qe", 1, 16))
              .withColumn("ne16", F.slice("ne", 1, 16))
              .select("query_id", "neighbor_id",
                      _mmr_cos("qe", "ne").alias("cos_full"),
                      _mmr_cos("qe16", "ne16").alias("cos_16")))
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id").asc())
    wt = Window.partitionBy("query_id").orderBy(
        F.col("cos_16").desc(), F.col("neighbor_id").asc())
    full5 = (scored.withColumn("rk", F.row_number().over(wf))
             .filter(F.col("rk") <= 5)
             .select("query_id", "neighbor_id"))
    trunc5 = (scored.withColumn("rk", F.row_number().over(wt))
              .filter(F.col("rk") <= 5)
              .select("query_id", "neighbor_id",
                      F.lit(1).alias("hit_flag")))
    return (full5.join(trunc5, ["query_id", "neighbor_id"], "left")
            .groupBy("query_id")
            .agg(F.sum(F.coalesce("hit_flag", F.lit(0))).cast("long")
                 .alias("n_hits"))
            .select("query_id", "n_hits",
                    F.expr("n_hits * 1000000 DIV 5").cast("long")
                    .alias("recall_ppm")))


ORACLE_EMBEDDINGS_MRL_EVAL = """
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
           AS cos_full,
         list_sum(list_transform(range(16),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(16),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(16),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
           AS cos_16
  FROM embeddings q JOIN embeddings b ON b.vec_id != q.vec_id
  WHERE q.vec_id < 10),
full5 AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos_full DESC, neighbor_id ASC) AS rk
    FROM scored) WHERE rk <= 5),
trunc5 AS (
  SELECT query_id, neighbor_id, 1 AS hit_flag FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
             ORDER BY cos_16 DESC, neighbor_id ASC) AS rk
    FROM scored) WHERE rk <= 5)
SELECT f.query_id,
       CAST(sum(coalesce(t.hit_flag, 0)) AS BIGINT) AS n_hits,
       CAST(sum(coalesce(t.hit_flag, 0)) * 1000000 // 5 AS BIGINT)
         AS recall_ppm
FROM full5 f LEFT JOIN trunc5 t
  ON t.query_id = f.query_id AND t.neighbor_id = f.neighbor_id
GROUP BY f.query_id
"""


def q_frontier_dga_hosts(spark, sf_dir):
    """Random-hostname (DGA/onion-style) detection — a dark-web frontier
    is full of machine-generated hostnames, and treating them like
    editorial domains skews per-host trust and budget policy (the
    reference's whole universe is 56-char random .onion labels):
    hostnames are synthesized (every 13th an md5-derived random label,
    the rest word-built store domains), then detected from the LABEL
    alone by exact length + digit-ratio + vowel-ratio features — the
    classic DGA heuristic triple, conjoined so hyphen-word domains with
    incidental digits never trip it (digit-heavy AND vowel-poor AND
    long). Output: per class, count and exact mean feature ppms.

    Plan/scale: one scan of per-row string codegen + a 2-row agg; the
    feature exprs are shared with the detector's vote, computed once."""
    k = F.col("o_orderkey")
    host = F.when(k % 13 == 0,
                  F.concat(F.substring(F.md5(k.cast("string")), 1, 16),
                           F.lit(".onion"))
                  ).otherwise(
        F.concat(F.lit("shop-"), (k % 100).cast("string"),
                 F.lit("-store.com")))
    d = _t(spark, sf_dir, "orders").select(host.alias("hostname"))
    label = F.split("hostname", "\\.").getItem(0)
    t = d.select("hostname", label.alias("label"))
    n = F.greatest(F.length("label"), F.lit(1))
    n_vowel = F.length(F.regexp_replace("label", "[^aeiou]", ""))
    n_digit = F.length(F.regexp_replace("label", "[^0-9]", ""))
    feat = t.select(
        "label",
        F.length("label").cast("long").alias("len"),
        (n_vowel * 1000000).cast("long").alias("v_num"),
        (n_digit * 1000000).cast("long").alias("d_num"),
        n.cast("long").alias("n"))
    classed = feat.select(
        F.when((F.expr("d_num DIV n") >= 250000)
               & (F.expr("v_num DIV n") < 300000)
               & (F.col("len") >= 12),
               F.lit("dga")).otherwise(F.lit("benign"))
        .alias("host_class"),
        "len", "v_num", "d_num", "n")
    return classed.groupBy("host_class").agg(
        F.count("*").cast("long").alias("n_hosts"),
        F.expr("sum(len) * 1 DIV count(*)").cast("long")
        .alias("mean_len"),
        F.expr("sum(v_num DIV n) DIV count(*)").cast("long")
        .alias("mean_vowel_ppm"),
        F.expr("sum(d_num DIV n) DIV count(*)").cast("long")
        .alias("mean_digit_ppm"))


ORACLE_FRONTIER_DGA_HOSTS = """
WITH d AS (
  SELECT CASE WHEN o_orderkey % 13 = 0
              THEN substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 16)
                   || '.onion'
              ELSE 'shop-' || (o_orderkey % 100) || '-store.com'
         END AS hostname
  FROM orders),
feat AS (
  SELECT string_split(hostname, '.')[1] AS label FROM d),
scored AS (
  SELECT CAST(length(label) AS BIGINT) AS len,
         CAST(length(regexp_replace(label, '[^aeiou]', '', 'g'))
              * 1000000 AS BIGINT) AS v_num,
         CAST(length(regexp_replace(label, '[^0-9]', '', 'g'))
              * 1000000 AS BIGINT) AS d_num,
         CAST(greatest(length(label), 1) AS BIGINT) AS n
  FROM feat),
classed AS (
  SELECT CASE WHEN d_num // n >= 250000 AND v_num // n < 300000
                   AND len >= 12
              THEN 'dga' ELSE 'benign' END AS host_class,
         len, v_num, d_num, n
  FROM scored)
SELECT host_class,
       CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(len) // count(*) AS BIGINT) AS mean_len,
       CAST(sum(v_num // n) // count(*) AS BIGINT) AS mean_vowel_ppm,
       CAST(sum(d_num // n) // count(*) AS BIGINT) AS mean_digit_ppm
FROM classed GROUP BY host_class
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


def q_spans_ref_integrity(spark, sf_dir):
    """Media referential-integrity audit over the interleaved span table
    — the table-maintenance check a lakehouse runs between the span rows
    and the media-blob table (a span pointing at a missing blob breaks
    training reads; an unreferenced blob is storage leak + compaction
    debt): per doc, span-side media refs, DANGLING refs (no media row —
    every (doc_id + ordinal) % 7 == 0 blob is deterministically absent)
    and ORPHAN media rows (no referencing span — every doc_id % 9 == 0
    doc carries one extra blob).

    Plan/scale: both sides derive per-row (zero shuffle), then two
    anti-join-shaped left joins keyed on the ref string and one agg —
    the exact shape of an Iceberg orphan-file sweep."""
    from genesis_spark.sources.interleaved import interleaved_docs
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    il = interleaved_docs(docs)
    refs = il.select(
        "doc_id",
        F.explode(F.expr("transform(filter(spans, "
                         "s -> s.media_ref IS NOT NULL), "
                         "s -> s.media_ref)")).alias("media_ref"))
    base = _t(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr("greatest(CAST(ceil(size(split(text, ' ')) / 8.0) AS INT)"
               ", 1)").alias("n_chunks"))
    m = F.expr("n_chunks DIV 3")
    media = (base.withColumn("m", m)
             .select("doc_id", F.explode(F.expr(
                 "IF(m >= 1, sequence(1, m), array())")).alias("ord"))
             .filter((F.expr("CAST(doc_id AS BIGINT)") + F.col("ord"))
                     % 7 != 0)
             .select("doc_id",
                     F.concat("doc_id", F.lit("/img/"),
                              F.col("ord").cast("string"))
                     .alias("media_ref")))
    orphans = (base.filter(F.expr("CAST(doc_id AS BIGINT)") % 9 == 0)
               .select("doc_id",
                       F.concat("doc_id", F.lit("/img/"),
                                (F.expr("n_chunks DIV 3") + 1)
                                .cast("string")).alias("media_ref")))
    media_all = media.unionByName(orphans)
    dangling = (refs.join(media_all, ["doc_id", "media_ref"], "left_anti")
                .groupBy("doc_id")
                .agg(F.count("*").cast("long").alias("n_dangling")))
    orphan_ct = (media_all.join(refs, ["doc_id", "media_ref"],
                                "left_anti")
                 .groupBy("doc_id")
                 .agg(F.count("*").cast("long").alias("n_orphans")))
    per_doc = refs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_refs"))
    return (per_doc
            .join(dangling, "doc_id", "left")
            .join(orphan_ct, "doc_id", "left")
            .select("doc_id", "n_refs",
                    F.coalesce("n_dangling", F.lit(0)).cast("long")
                    .alias("n_dangling"),
                    F.coalesce("n_orphans", F.lit(0)).cast("long")
                    .alias("n_orphans")))


ORACLE_SPANS_REF_INTEGRITY = f"""
WITH {_SPANS_EX_SQL},
refs AS (
  SELECT doc_id, s.media_ref AS media_ref FROM ex
  WHERE s.media_ref IS NOT NULL),
base2 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, doc_id AS doc_num,
         greatest(CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT),
                  1) AS n_chunks
  FROM documents WHERE text IS NOT NULL),
media AS (
  SELECT doc_id, doc_id || '/img/' || CAST(ord AS VARCHAR) AS media_ref
  FROM (SELECT doc_id, doc_num,
               unnest(range(1, n_chunks // 3 + 1)) AS ord
        FROM base2)
  WHERE (doc_num + ord) % 7 <> 0
  UNION ALL
  SELECT doc_id,
         doc_id || '/img/' || CAST(n_chunks // 3 + 1 AS VARCHAR)
  FROM base2 WHERE doc_num % 9 = 0),
dangling AS (
  SELECT r.doc_id, CAST(count(*) AS BIGINT) AS n_dangling
  FROM refs r LEFT JOIN media m
    ON m.doc_id = r.doc_id AND m.media_ref = r.media_ref
  WHERE m.media_ref IS NULL GROUP BY r.doc_id),
orphan_ct AS (
  SELECT m.doc_id, CAST(count(*) AS BIGINT) AS n_orphans
  FROM media m LEFT JOIN refs r
    ON r.doc_id = m.doc_id AND r.media_ref = m.media_ref
  WHERE r.media_ref IS NULL GROUP BY m.doc_id),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_refs
  FROM refs GROUP BY doc_id)
SELECT p.doc_id, p.n_refs,
       CAST(coalesce(d.n_dangling, 0) AS BIGINT) AS n_dangling,
       CAST(coalesce(o.n_orphans, 0) AS BIGINT) AS n_orphans
FROM per_doc p
LEFT JOIN dangling d ON d.doc_id = p.doc_id
LEFT JOIN orphan_ct o ON o.doc_id = p.doc_id
"""


def q_events_heartbeat_gaps(spark, sf_dir):
    """Heartbeat-gap monitoring per host — fleet-health telemetry for a
    distributed crawler (a host whose event stream goes quiet had its
    fetcher die; the reference's remote monitor is a service, this is
    the batch audit): per host, event count, the MAX inter-event gap in
    exact microseconds (unix_micros/epoch_us — no float epoch), and how
    many gaps exceed the 600 s outage threshold.

    Plan/scale: one lag window per host partition + one partial agg —
    the canonical gap-scan shape (same as sessionize without the
    session assembly)."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
        .alias("host_key"),
        # unix_micros rejects TIMESTAMP_NTZ on Spark 4; session tz is
        # pinned UTC so the cast is shift-free (and gaps cancel shifts)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id")
    w = Window.partitionBy("host_key").orderBy("us", "event_id")
    gapped = ev.withColumn(
        "gap_us", F.col("us") - F.lag("us").over(w))
    return (gapped.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.sum((F.col("gap_us") > 600_000_000).cast("long")).cast("long")
        .alias("n_outages")))


ORACLE_EVENTS_HEARTBEAT_GAPS = """
WITH ev AS (
  SELECT 'h' || (user_id % 40) AS host_key,
         epoch_us(ts) AS us, event_id
  FROM events),
gapped AS (
  SELECT host_key,
         us - lag(us) OVER (PARTITION BY host_key
                            ORDER BY us, event_id) AS gap_us
  FROM ev)
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(CASE WHEN gap_us > 600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outages
FROM gapped GROUP BY host_key
"""


def q_text_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix — the eval row for the marker-word
    lang_id detector (the eval-family discipline: a detector without a
    confusion matrix is a guess): declared corpus language vs detected
    language, pair counts, and the exact per-pair share of the declared
    language's docs in ppm. The diagonal is accuracy; off-diagonal mass
    says WHICH languages bleed into which (what you tune markers by).

    Plan/scale: one scan with the shared lang_id_expr + one two-key
    partial agg + one bounded window over <= #languages² rows."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    pairs = (d.select(F.col("lang").alias("lang_declared"),
                      TS.lang_id_expr(F.col("text"))
                      .alias("lang_detected"))
             .groupBy("lang_declared", "lang_detected")
             .agg(F.count("*").cast("long").alias("n")))
    tot = Window.partitionBy("lang_declared")
    return pairs.select(
        "lang_declared", "lang_detected", "n",
        (F.col("lang_declared") == F.col("lang_detected"))
        .alias("is_match"),
        F.expr("n * 1000000").cast("long").alias("num"),
        F.sum("n").over(tot).alias("den")
    ).select("lang_declared", "lang_detected", "n", "is_match",
             F.expr("num DIV den").cast("long").alias("share_ppm"))


def _lang_confusion_oracle() -> str:
    def hits(markers):
        lst = ", ".join(f"'{m}'" for m in markers)
        return ("len(list_filter(string_split(lower(text), ' '), "
                f"t -> t IN ({lst})))")
    en = hits(TS.LANG_MARKERS["en"])
    fr = hits(TS.LANG_MARKERS["fr"])
    es = hits(TS.LANG_MARKERS["es"])
    de = hits(TS.LANG_MARKERS["de"])
    return f"""
WITH c AS (
  SELECT lang AS lang_declared,
         {en} AS en, {fr} AS fr, {es} AS es, {de} AS de,
         regexp_matches(text, '[一-鿿]') AS zh
  FROM documents WHERE text IS NOT NULL),
det AS (
  SELECT lang_declared,
         CASE WHEN zh THEN 'zh'
              WHEN en > 0 AND en >= fr AND en >= es AND en >= de THEN 'en'
              WHEN fr > 0 AND fr >= es AND fr >= de THEN 'fr'
              WHEN es > 0 AND es >= de THEN 'es'
              WHEN de > 0 THEN 'de'
              ELSE 'und' END AS lang_detected
  FROM c),
pairs AS (
  SELECT lang_declared, lang_detected,
         CAST(count(*) AS BIGINT) AS n
  FROM det GROUP BY lang_declared, lang_detected)
SELECT lang_declared, lang_detected, n,
       lang_declared = lang_detected AS is_match,
       CAST(n * 1000000 // sum(n) OVER (PARTITION BY lang_declared)
            AS BIGINT) AS share_ppm
FROM pairs
"""


ORACLE_TEXT_LANG_CONFUSION = _lang_confusion_oracle()


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


def q_text_dup_ngram_coverage(spark, sf_dir):
    """Cross-document duplicated-n-gram coverage — the RefinedWeb /
    MassiveText line-level dedup metric (Penedo et al. 2023 §4.2:
    "fraction of characters in duplicated n-grams") at word-8-gram
    granularity: an 8-gram appearing in >= 2 distinct docs is
    DUPLICATED, and each doc reports what fraction of its word
    positions any duplicated 8-gram covers (exact ppm). This is the
    cross-doc complement to text_repetition's intra-doc stats — the
    number the near-dedup threshold is tuned against.

    Plan/scale: grams hash to md5 BEFORE the shuffle (wide text stays
    map-side), df is one partial agg, coverage explodes only DUP gram
    windows (8 positions each) and distinct-counts per doc — cost
    scales with duplicated mass, not corpus size."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.split("text", " ").alias("ws"))
    grams = base.select(
        "doc_id", F.size("ws").alias("n_words"),
        F.explode(F.expr(
            "transform(sequence(1, greatest(size(ws) - 7, 0)), "
            "i -> struct(i AS pos, "
            "md5(array_join(slice(ws, i, 8), ' ')) AS g))")).alias("gr"))
    occ = grams.select("doc_id", "n_words", F.col("gr.pos").alias("pos"),
                       F.col("gr.g").alias("g"))
    df_ = (occ.select("g", "doc_id").distinct()
           .groupBy("g").agg(F.count("*").alias("df")))
    dup = occ.join(df_.filter(F.col("df") >= 2), "g")
    covered = (dup.select("doc_id", "n_words",
                          F.explode(F.expr("sequence(pos, pos + 7)"))
                          .alias("cov_pos"))
               .groupBy("doc_id")
               .agg(F.max("n_words").alias("n_words"),
                    F.countDistinct("cov_pos").cast("long")
                    .alias("n_dup_positions")))
    sizes = base.select("doc_id", F.size("ws").cast("long")
                        .alias("n_words"))
    return (sizes.join(covered.select("doc_id", "n_dup_positions"),
                       "doc_id", "left")
            .select("doc_id", "n_words",
                    F.coalesce("n_dup_positions", F.lit(0)).cast("long")
                    .alias("n_dup_positions"))
            .withColumn("dup_coverage_ppm",
                        F.expr("n_dup_positions * 1000000 "
                               "DIV greatest(n_words, 1)").cast("long")))


ORACLE_TEXT_DUP_NGRAM_COVERAGE = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL),
occ AS (
  SELECT doc_id, len(ws) AS n_words,
         CAST(i AS INT) AS pos,
         md5(array_to_string(ws[CAST(i AS INT):CAST(i + 7 AS INT)], ' '))
           AS g
  FROM base, unnest(range(1, greatest(len(ws) - 7, 0) + 1)) t(i)),
df AS (
  SELECT g, count(DISTINCT doc_id) AS df FROM occ GROUP BY g),
dup AS (
  SELECT o.doc_id, o.n_words, o.pos
  FROM occ o JOIN df ON df.g = o.g WHERE df.df >= 2),
covered AS (
  SELECT doc_id, count(DISTINCT cov_pos) AS n_dup_positions
  FROM (SELECT doc_id, pos + x AS cov_pos
        FROM dup, unnest(range(0, 8)) t(x))
  GROUP BY doc_id),
sizes AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words FROM base)
SELECT s.doc_id, s.n_words,
       CAST(coalesce(c.n_dup_positions, 0) AS BIGINT)
         AS n_dup_positions,
       CAST(coalesce(c.n_dup_positions, 0) * 1000000
            // greatest(s.n_words, 1) AS BIGINT) AS dup_coverage_ppm
FROM sizes s LEFT JOIN covered c ON c.doc_id = s.doc_id
"""


def q_host_response_profile(spark, sf_dir):
    """HTTP response-code profile per host with backoff policy — the
    per-host health ledger a fetch scheduler feeds back into budget
    decisions (a host throwing 10% server errors gets its budget cut
    before it wastes fetch slots): status classes are synthesized with
    HOST-DEPENDENT error rates (custkey % 3 picks a 0 / 5 / 10% 500-rate
    tier), rolled up to per-host counts, exact server-error ppm, and
    the backoff flag at >= 75000 ppm — only the 10% tier trips it.

    Plan/scale: one scan of integer codegen + one partial agg per
    host."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    status = (F.when((k + c) % 20 < (c % 3), F.lit("500"))
              .when(k % 20 == 3, F.lit("301"))
              .when((k % 20).isin(4, 5), F.lit("404"))
              .otherwise(F.lit("200")))
    log = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (c % 40).cast("string")).alias("host_key"),
        status.alias("status"))
    agg = log.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_fetches"),
        F.sum((F.col("status") == "200").cast("long")).cast("long")
        .alias("n_200"),
        F.sum((F.col("status") == "301").cast("long")).cast("long")
        .alias("n_301"),
        F.sum((F.col("status") == "404").cast("long")).cast("long")
        .alias("n_404"),
        F.sum((F.col("status") == "500").cast("long")).cast("long")
        .alias("n_500"))
    return agg.select(
        "host_key", "n_fetches", "n_200", "n_301", "n_404", "n_500",
        F.expr("n_500 * 1000000 DIV n_fetches").cast("long")
        .alias("err_ppm"),
        (F.expr("n_500 * 1000000 DIV n_fetches") >= 75000)
        .alias("backoff"))


ORACLE_HOST_RESPONSE_PROFILE = """
WITH log AS (
  SELECT 'h' || (o_custkey % 40) AS host_key,
         CASE WHEN (o_orderkey + o_custkey) % 20 < (o_custkey % 3)
              THEN '500'
              WHEN o_orderkey % 20 = 3 THEN '301'
              WHEN o_orderkey % 20 IN (4, 5) THEN '404'
              ELSE '200' END AS status
  FROM orders),
agg AS (
  SELECT host_key,
         CAST(count(*) AS BIGINT) AS n_fetches,
         CAST(sum(CASE WHEN status = '200' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_200,
         CAST(sum(CASE WHEN status = '301' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_301,
         CAST(sum(CASE WHEN status = '404' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_404,
         CAST(sum(CASE WHEN status = '500' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_500
  FROM log GROUP BY host_key)
SELECT host_key, n_fetches, n_200, n_301, n_404, n_500,
       CAST(n_500 * 1000000 // n_fetches AS BIGINT) AS err_ppm,
       (n_500 * 1000000 // n_fetches) >= 75000 AS backoff
FROM agg
"""


def q_text_rag_chunks(spark, sf_dir):
    """Sliding-window chunking for retrieval indexing — the
    chunk-with-overlap pass every RAG ingestion pipeline runs (64-token
    windows, 16-token overlap = stride 48, so a fact straddling a
    boundary survives in the next chunk): per chunk, the doc, ordinal,
    start position, exact token count, and an md5 content hash (the
    dedup/update key — chunk text itself never needs to leave the
    scan).

    Plan/scale: pure array codegen (sequence + slice per row) + one
    explode; output cardinality ~n_tokens/48 per doc, no shuffle."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    base = d.select(F.col("doc_id").cast("long").alias("doc_id"),
                    F.split("text", " ").alias("ws"))
    chunks = base.select(
        "doc_id",
        F.explode(F.expr(
            "transform(sequence(1, greatest(size(ws), 1), 48), "
            "(s, i) -> struct(i AS chunk_id, s AS start_pos, "
            "size(slice(ws, s, 64)) AS n_tokens, "
            "md5(array_join(slice(ws, s, 64), ' ')) AS chunk_md5))"
        )).alias("c"))
    return chunks.select(
        "doc_id",
        F.col("c.chunk_id").cast("int").alias("chunk_id"),
        F.col("c.start_pos").cast("int").alias("start_pos"),
        F.col("c.n_tokens").cast("int").alias("n_tokens"),
        F.col("c.chunk_md5").alias("chunk_md5"))


ORACLE_TEXT_RAG_CHUNKS = """
WITH base AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY s) - 1
            AS INT) AS chunk_id,
       CAST(s AS INT) AS start_pos,
       CAST(len(ws[CAST(s AS INT):CAST(s + 63 AS INT)]) AS INT)
         AS n_tokens,
       md5(array_to_string(ws[CAST(s AS INT):CAST(s + 63 AS INT)], ' '))
         AS chunk_md5
FROM base, unnest(range(1, greatest(len(ws), 1) + 1, 48)) t(s)
"""


def q_graph_assortativity(spark, sf_dir):
    """Degree assortativity of the host graph (Newman 2002) — do hubs
    link to hubs (r > 0) or to the periphery (r < 0, the web's usual
    signature)? Over the shared 50-host edge list with x = source
    out-degree, y = target in-degree: all five moments are EXACT
    integers (joins + sums of BIGINT degrees), and the Pearson r
    derives from those identical integers through the same IEEE double
    expression in both engines, quantized to 4 dp with the shared
    floor(x*1e4 + 0.5) discipline — no order-dependent float
    accumulation anywhere.

    Plan/scale: two degree aggs, two broadcast join-backs onto the edge
    list, one global moment agg — web-graph scale shapes."""
    edges = _host_edges50(spark, sf_dir)
    outd = edges.groupBy("src").agg(F.count("*").alias("x"))
    ind = edges.groupBy("dst").agg(F.count("*").alias("y"))
    xy = (edges.join(outd, "src").join(ind, "dst")
          .select(F.col("x").cast("long").alias("x"),
                  F.col("y").cast("long").alias("y")))
    mom = xy.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))
    r = ("(CAST(m AS DOUBLE) * CAST(sxy AS DOUBLE) "
         "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
         "sqrt((CAST(m AS DOUBLE) * CAST(sxx AS DOUBLE) "
         "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
         "* (CAST(m AS DOUBLE) * CAST(syy AS DOUBLE) "
         "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))")
    return mom.select(
        "m", "sx", "sy", "sxy", "sxx", "syy",
        F.expr(f"floor(({r}) * 1e4 + 0.5) / 1e4").alias("r_4dp"))


ORACLE_GRAPH_ASSORTATIVITY = f"""
WITH e AS ({_HOST_E50_SQL}),
outd AS (SELECT src, CAST(count(*) AS BIGINT) AS x FROM e GROUP BY src),
ind AS (SELECT dst, CAST(count(*) AS BIGINT) AS y FROM e GROUP BY dst),
xy AS (
  SELECT o.x, i.y
  FROM e JOIN outd o ON o.src = e.src JOIN ind i ON i.dst = e.dst),
mom AS (
  SELECT CAST(count(*) AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM xy)
SELECT m, sx, sy, sxy, sxx, syy,
       floor(((m::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
             / sqrt((m::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                  * (m::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)))
             * 1e4 + 0.5) / 1e4 AS r_4dp
FROM mom
"""


def q_corpus_mix_temperature(spark, sf_dir):
    """Temperature-scaled language mixing (the multilingual sampling rule
    from mBERT/XLM-R: p_l^(1/T) re-weighting, T = 2, so rare languages
    are up-sampled toward — but not onto — parity): per language, the
    natural share and the T=2 weight, all in EXACT integer ppm — the
    sqrt is quantized per LANGUAGE to 1e-6 units BEFORE the normalizing
    sum, so no order-dependent float accumulation crosses an engine
    boundary.

    Plan/scale: one partial agg to per-lang counts (|langs| rows), all
    remaining math over that tiny frame via one broadcast total."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    counts = d.groupBy("lang").agg(F.count("*").cast("long")
                                   .alias("n_docs"))
    tot = counts.agg(F.sum("n_docs").alias("n_total"))
    scored = (counts.crossJoin(F.broadcast(tot))
              .withColumn("s_q", F.expr(
                  "CAST(floor(sqrt(CAST(n_docs AS DOUBLE) "
                  "/ CAST(n_total AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)")))
    ssum = scored.agg(F.sum("s_q").alias("s_total"))
    return (scored.crossJoin(F.broadcast(ssum))
            .select("lang", "n_docs",
                    F.expr("n_docs * 1000000 DIV n_total").cast("long")
                    .alias("natural_ppm"),
                    F.expr("s_q * 1000000 DIV s_total").cast("long")
                    .alias("t2_weight_ppm"),
                    (F.expr("s_q * 1000000 DIV s_total")
                     > F.expr("n_docs * 1000000 DIV n_total"))
                    .alias("upsampled")))


ORACLE_CORPUS_MIX_TEMPERATURE = """
WITH counts AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents WHERE text IS NOT NULL GROUP BY lang),
tot AS (SELECT sum(n_docs) AS n_total FROM counts),
scored AS (
  SELECT c.lang, c.n_docs, t.n_total,
         CAST(floor(sqrt(c.n_docs::DOUBLE / t.n_total::DOUBLE) * 1e6
                    + 0.5) AS BIGINT) AS s_q
  FROM counts c CROSS JOIN tot t),
ssum AS (SELECT sum(s_q) AS s_total FROM scored)
SELECT s.lang, s.n_docs,
       CAST(s.n_docs * 1000000 // s.n_total AS BIGINT) AS natural_ppm,
       CAST(s.s_q * 1000000 // m.s_total AS BIGINT) AS t2_weight_ppm,
       (s.s_q * 1000000 // m.s_total)
         > (s.n_docs * 1000000 // s.n_total) AS upsampled
FROM scored s CROSS JOIN ssum m
"""


def _scc_edges(spark, sf_dir):
    """Directed 60-host link graph with known cycle structure: nodes
    g0..g19 form one 20-cycle (one SCC of 20), g20..g39 each feed into
    the cycle (20 singleton SCCs), g40..g59 form four 5-cycles. Derived
    from o_orderkey alone so both engines synthesize it identically."""
    i = F.col("o_orderkey") % 60
    dst = (F.when(i < 20, (i + 1) % 20)
           .when(i < 40, i - 20)
           .otherwise(F.lit(40) + ((i - 40) % 5 + 1) % 5
                      + ((i - 40) - (i - 40) % 5)))
    return (_t(spark, sf_dir, "orders")
            .select(F.concat(F.lit("g"), i.cast("string")).alias("src"),
                    F.concat(F.lit("g"), dst.cast("string")).alias("dst"))
            .distinct())


_SCC_EDGES_SQL = """
  SELECT DISTINCT 'g' || i AS src,
         'g' || (CASE WHEN i < 20 THEN (i + 1) % 20
                      WHEN i < 40 THEN i - 20
                      ELSE 40 + ((i - 40) % 5 + 1) % 5
                           + ((i - 40) - (i - 40) % 5) END) AS dst
  FROM (SELECT o_orderkey % 60 AS i FROM orders)
"""


def q_graph_scc(spark, sf_dir):
    """Strongly connected components of the directed host link graph —
    the cycle detector WCC can't be (host_components finds mirror
    farms; SCC finds redirect/link CYCLES, the structures that trap a
    depth-capped crawler and that URL-seen must absorb): scc_id =
    min(w : w reachable from u AND u reachable from w), per-host, with
    SCC sizes. A host in an SCC of size > 1 sits on a directed cycle.

    Algorithm: bounded transitive closure by iterated join-expansion
    (one shuffle + distinct per round, localCheckpoint lineage cuts —
    same discipline as operators/cc.py), then scc_id from the
    closure ∩ reversed-closure self-pairs. Scale honesty: closure is
    O(V·reach) — this variant is for the bounded SITE-LOCAL subgraphs a
    crawler actually cycles within (per-registered-domain graphs after
    partitioning, 10²-10⁴ nodes each, run per-group); whole-web SCC
    needs FW-BW pivoting, which this row deliberately does not claim.
    Oracle: recursive-CTE closure, same min rule."""
    edges = _scc_edges(spark, sf_dir).localCheckpoint(eager=True)
    reach = edges.select(F.col("src").alias("node"),
                         F.col("dst").alias("reach"))
    # diameter of the synthetic graph is 20 (the big cycle); squaring
    # (reach ∘ reach) doubles max path length per round: 6 rounds
    # cover paths up to 2^6 = 64 >= 21
    for _ in range(6):
        step = (reach
                .join(reach.select(F.col("node").alias("reach"),
                                   F.col("reach").alias("nxt")), "reach")
                .select("node", F.col("nxt").alias("reach")))
        reach = reach.unionByName(step).distinct() \
            .localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))).distinct()
    closure = reach.unionByName(
        nodes.select("node", F.col("node").alias("reach"))).distinct()
    back = closure.select(F.col("reach").alias("node"),
                          F.col("node").alias("reach"))
    mutual = closure.join(back, ["node", "reach"])
    comp = mutual.groupBy("node").agg(F.min("reach").alias("scc_id"))
    sizes = comp.groupBy("scc_id").agg(
        F.count("*").cast("long").alias("scc_size"))
    return (comp.join(sizes, "scc_id")
            .select(F.col("node").alias("host_key"), "scc_id",
                    "scc_size", (F.col("scc_size") > 1).alias("on_cycle")))


ORACLE_GRAPH_SCC = f"""
WITH RECURSIVE e AS ({_SCC_EDGES_SQL}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
reach AS (
  SELECT src AS node, dst AS r FROM e
  UNION
  SELECT t.node, e.dst AS r FROM reach t JOIN e ON e.src = t.r),
closure AS (
  SELECT node, r FROM reach
  UNION SELECT node, node AS r FROM nodes),
mutual AS (
  SELECT c.node, c.r FROM closure c
  JOIN closure b ON b.node = c.r AND b.r = c.node),
comp AS (SELECT node, min(r) AS scc_id FROM mutual GROUP BY node),
sizes AS (SELECT scc_id, CAST(count(*) AS BIGINT) AS scc_size
          FROM comp GROUP BY scc_id)
SELECT node AS host_key, scc_id, scc_size, scc_size > 1 AS on_cycle
FROM comp JOIN sizes USING (scc_id)
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


def q_scan_prune_plan(spark, sf_dir):
    """Stats-based scan pruning — the metadata-only planning step a
    lakehouse table format (Iceberg/Delta manifests) runs before any
    I/O: every data file carries column min/max stats; a range
    predicate prunes a file when its [min, max] window cannot overlap.
    Output per partition: files and rows scanned vs skipped — the
    number that says whether the table's sort/cluster layout
    (frontier_zorder's objective) is actually earning its keep.

    Deterministic synthesis: 100-row files keyed by o_orderkey DIV 100
    with a clustered stats column v = o_orderkey % 1000 (each file spans
    a 100-wide v-window at every SF — a well-sorted layout), predicate
    v BETWEEN 400 AND 800, so ~half the files prune at any scale. Plan/scale: one agg to the manifest
    grain (metadata-sized — at 100 TB this is the ONLY full pass, and a
    real table format has it precomputed), then a 20-row rollup; the
    data plane is never touched."""
    k = F.col("o_orderkey")
    manifest = (_t(spark, sf_dir, "orders")
                .select((k / 100).cast("long").alias("file_id"),
                        (k % 1000).alias("ck"))
                .groupBy("file_id")
                .agg(F.count("*").cast("long").alias("n_rows"),
                     F.min("ck").alias("min_ck"),
                     F.max("ck").alias("max_ck")))
    pruned = (F.col("max_ck") < 400) | (F.col("min_ck") > 800)
    return (manifest
            .select((F.col("file_id") % 20).alias("partition_id"),
                    pruned.alias("pruned"), "n_rows")
            .groupBy("partition_id")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum(F.col("pruned").cast("long")).cast("long")
                 .alias("n_files_pruned"),
                 F.sum(F.when(~F.col("pruned"), F.col("n_rows"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("rows_scanned"),
                 F.sum(F.when(F.col("pruned"), F.col("n_rows"))
                       .otherwise(F.lit(0))).cast("long")
                 .alias("rows_skipped")))


ORACLE_SCAN_PRUNE_PLAN = """
WITH manifest AS (
  SELECT o_orderkey // 100 AS file_id,
         CAST(count(*) AS BIGINT) AS n_rows,
         min(o_orderkey % 1000) AS min_ck,
         max(o_orderkey % 1000) AS max_ck
  FROM orders GROUP BY file_id),
tagged AS (
  SELECT file_id % 20 AS partition_id,
         (max_ck < 400 OR min_ck > 800) AS pruned, n_rows
  FROM manifest)
SELECT partition_id,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN pruned THEN 1 ELSE 0 END) AS BIGINT)
         AS n_files_pruned,
       CAST(sum(CASE WHEN NOT pruned THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_scanned,
       CAST(sum(CASE WHEN pruned THEN n_rows ELSE 0 END) AS BIGINT)
         AS rows_skipped
FROM tagged GROUP BY partition_id
"""


def q_snapshot_changelog(spark, sf_dir):
    """Snapshot diff → CDC changelog — the INVERSE of events_cdc_apply
    (that row consumes a changelog; this one produces it): given two
    table snapshots, emit the insert/delete/update/unchanged census via
    one full outer join on the key and a value-hash compare. This is
    how incremental consumers are fed from a table that only keeps
    snapshots (and how a crawl's per-round frontier delta would be
    reconstructed if the engine ever lost its append log).

    Deterministic snapshots from orders: B deletes key % 11 == 0,
    bumps the cents value of key % 7 == 0, inserts key + 10^7 for
    key % 13 == 0. Output per op: row count, bit_xor key checksum,
    key range — compact, order-independent, hash-stable.

    Plan/scale: ONE co-partitioned full outer join on the snapshot key
    (both sides bucketable by it) + a 4-row rollup; value comparison is
    an md5 on the serialized row, never a column-by-column shuffle."""
    k = F.col("o_orderkey")
    # hash an INTEGER cents rendering, never a raw double -> string
    # (engines disagree on float formatting); floor(x*100 + 0.5) is the
    # repo-wide quantization discipline
    cents = F.expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)")
    a = _t(spark, sf_dir, "orders").select(
        k.alias("key"),
        F.md5(F.concat_ws("|", k.cast("string"), cents.cast("string")))
        .alias("val_a"))
    b_base = _t(spark, sf_dir, "orders").filter(k % 11 != 0).select(
        k.alias("key"),
        F.md5(F.concat_ws(
            "|", k.cast("string"),
            F.when(k % 7 == 0, cents + 1).otherwise(cents)
            .cast("string")))
        .alias("val_b"))
    b_ins = _t(spark, sf_dir, "orders").filter(k % 13 == 0).select(
        (k + 10_000_000).alias("key"),
        F.md5((k + 10_000_000).cast("string")).alias("val_b"))
    b = b_base.unionByName(b_ins)
    j = a.join(b, "key", "full_outer")
    op = (F.when(F.col("val_a").isNull(), F.lit("insert"))
          .when(F.col("val_b").isNull(), F.lit("delete"))
          .when(F.col("val_a") != F.col("val_b"), F.lit("update"))
          .otherwise(F.lit("unchanged")))
    return (j.select(op.alias("op"), "key")
            .groupBy("op")
            .agg(F.count("*").cast("long").alias("n_rows"),
                 F.expr("bit_xor(key)").cast("long").alias("key_xor"),
                 F.min("key").cast("long").alias("min_key"),
                 F.max("key").cast("long").alias("max_key")))


ORACLE_SNAPSHOT_CHANGELOG = """
WITH a AS (
  SELECT o_orderkey AS key,
         md5(o_orderkey || '|' || CAST(
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             AS VARCHAR)) AS val_a
  FROM orders),
b AS (
  SELECT o_orderkey AS key,
         md5(o_orderkey || '|' || CAST(
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
             + CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END
             AS VARCHAR)) AS val_b
  FROM orders WHERE o_orderkey % 11 <> 0
  UNION ALL
  SELECT o_orderkey + 10000000 AS key,
         md5(CAST(o_orderkey + 10000000 AS VARCHAR)) AS val_b
  FROM orders WHERE o_orderkey % 13 = 0),
j AS (
  SELECT coalesce(a.key, b.key) AS key, val_a, val_b
  FROM a FULL OUTER JOIN b ON a.key = b.key),
tagged AS (
  SELECT CASE WHEN val_a IS NULL THEN 'insert'
              WHEN val_b IS NULL THEN 'delete'
              WHEN val_a <> val_b THEN 'update'
              ELSE 'unchanged' END AS op, key
  FROM j)
SELECT op, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(bit_xor(key) AS BIGINT) AS key_xor,
       CAST(min(key) AS BIGINT) AS min_key,
       CAST(max(key) AS BIGINT) AS max_key
FROM tagged GROUP BY op
"""


def q_shuffle_skew_audit(spark, sf_dir):
    """Hot-key skew diagnosis — the audit that tells you WHEN
    join_salted's remediation is needed (Spark AQE flags skewed
    partitions at runtime; a pipeline wants the table-level answer
    before submitting): per-key row counts for a deliberately skewed
    key (30% of rows collapse onto key 0), then the skew scorecard —
    max/mean ratio, top-1 and top-5 key share, and the Gini
    coefficient over key counts, all as exact ppm integers (Gini via
    the rank formula G = (2·Σ rank·c)/(n·Σc) - (n+1)/n on counts
    sorted ascending, ties broken by key for cross-engine
    determinism).

    Plan/scale: one keyed partial agg (the census), then windows over
    the per-key counts — #distinct-keys rows, not data rows."""
    lk = F.col("l_orderkey")
    key = F.when(lk % 10 < 3, F.lit(0)).otherwise(lk % 1000)
    counts = (_t(spark, sf_dir, "lineitem")
              .select(key.cast("long").alias("key"))
              .groupBy("key")
              .agg(F.count("*").cast("long").alias("c")))
    w = Window.orderBy("c", "key")
    ranked = counts.select(
        "key", "c", F.row_number().over(w).alias("rank"),
        F.count("*").over(
            Window.partitionBy(F.lit(1))).alias("nk"))
    return ranked.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("c").cast("long").alias("n_rows"),
        F.max("c").cast("long").alias("max_key_rows"),
        F.expr("CAST(max(c) * 1000000 DIV (sum(c) DIV count(*)) "
               "AS BIGINT)").alias("max_over_mean_ppm"),
        F.expr("CAST(max(c) * 1000000 DIV sum(c) AS BIGINT)")
        .alias("top1_share_ppm"),
        F.expr("CAST(sum(CASE WHEN rank > nk - 5 THEN c ELSE 0 END) "
               "* 1000000 DIV sum(c) AS BIGINT)")
        .alias("top5_share_ppm"),
        F.expr("CAST((2 * sum(rank * c) * 1000000 "
               "DIV (count(*) * sum(c))) "
               "- ((count(*) + 1) * 1000000 DIV count(*)) AS BIGINT)")
        .alias("gini_ppm"))


ORACLE_SHUFFLE_SKEW_AUDIT = """
WITH counts AS (
  SELECT CASE WHEN l_orderkey % 10 < 3 THEN 0
              ELSE l_orderkey % 1000 END AS key,
         CAST(count(*) AS BIGINT) AS c
  FROM lineitem GROUP BY key),
ranked AS (
  SELECT key, c, row_number() OVER (ORDER BY c, key) AS rank,
         count(*) OVER () AS nk
  FROM counts)
SELECT CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(max(c) AS BIGINT) AS max_key_rows,
       CAST(max(c) * 1000000 // (sum(c) // count(*)) AS BIGINT)
         AS max_over_mean_ppm,
       CAST(max(c) * 1000000 // sum(c) AS BIGINT) AS top1_share_ppm,
       CAST(sum(CASE WHEN rank > nk - 5 THEN c ELSE 0 END) * 1000000
            // sum(c) AS BIGINT) AS top5_share_ppm,
       CAST((2 * sum(rank * c) * 1000000 // (count(*) * sum(c)))
            - ((count(*) + 1) * 1000000 // count(*)) AS BIGINT)
         AS gini_ppm
FROM ranked
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


def q_split_leakage_audit(spark, sf_dir):
    """Train/eval split-leakage audit — the check every training
    pipeline owes its benchmark numbers: corpus_split assigns splits
    by doc_id hash, but the dedup corpus carries byte-identical twins
    under DIFFERENT doc_ids, so an exact-dup cluster can span the
    train/val/test boundary and leak training text into eval. Cluster
    on md5(text), split by the same split-v1 hash, and count per
    split: docs, docs sitting in multi-doc clusters, and eval docs
    whose cluster also contains a train member (the leaked ones).

    Plan/scale: one groupBy on the content hash (the exact-dedup
    shuffle the pipeline already runs), a window over cluster members,
    one census agg — leakage audit costs nothing beyond dedup."""
    c = _corpus(spark, sf_dir).filter(F.col("text").isNotNull())
    bucket = F.conv(F.substring(
        F.md5(F.concat(F.lit("split-v1|"),
                       F.col("doc_id").cast("string"))),
        1, 8), 16, 10).cast("long") % 100
    split = (F.when(bucket < 90, "train")
             .when(bucket < 95, "val").otherwise("test"))
    tagged = c.select("doc_id", split.alias("split"),
                      F.md5("text").alias("chash"))
    w = Window.partitionBy("chash")
    scoped = tagged.select(
        "doc_id", "split",
        F.count("*").over(w).alias("cluster_size"),
        F.max((F.col("split") == "train").cast("int")).over(w)
        .alias("has_train"))
    return (scoped.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("cluster_size") > 1).cast("long")).cast("long")
        .alias("n_in_multi_clusters"),
        F.sum(((F.col("split") != "train") & (F.col("has_train") == 1)
               & (F.col("cluster_size") > 1)).cast("long")).cast("long")
        .alias("n_leaked_from_train")))


ORACLE_SPLIT_LEAKAGE_AUDIT = f"""
WITH {_CORPUS_SQL},
tagged AS (
  SELECT doc_id,
         CASE WHEN ('0x' || substr(md5('split-v1|' || doc_id), 1, 8))
                   ::BIGINT % 100 < 90 THEN 'train'
              WHEN ('0x' || substr(md5('split-v1|' || doc_id), 1, 8))
                   ::BIGINT % 100 < 95 THEN 'val'
              ELSE 'test' END AS split,
         md5(text) AS chash
  FROM corpus WHERE text IS NOT NULL),
scoped AS (
  SELECT doc_id, split,
         count(*) OVER (PARTITION BY chash) AS cluster_size,
         max(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
           OVER (PARTITION BY chash) AS has_train
  FROM tagged)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_in_multi_clusters,
       CAST(sum(CASE WHEN split <> 'train' AND has_train = 1
                     AND cluster_size > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_leaked_from_train
FROM scoped GROUP BY split
"""


def q_frontier_discovery_curve(spark, sf_dir):
    """URL-discovery saturation curve — the stop-crawling signal: per
    wave, how many URLs were seen for the FIRST time vs total
    encounters, the cumulative distinct frontier, and the novelty rate
    in ppm. A crawl whose novelty rate collapses has exhausted its
    seed basin; budget should move elsewhere (the per-wave macro view
    that frontier_change_rate's per-URL estimator rolls up into).

    Deterministic synthesis: wave = o_custkey % 8, url = a skewed mix
    (o_orderkey·(o_custkey+1)) % 2000 so later waves increasingly
    re-encounter old URLs. Plan/scale: one groupBy url for first-seen
    wave (the URL-seen shuffle the engine already pays), one per-wave
    agg, one 8-row cumulative window."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    enc = _t(spark, sf_dir, "orders").select(
        (c % 8).cast("long").alias("wave"),
        ((k * (c + 1)) % 2000).alias("url"))
    first = (enc.groupBy("url")
             .agg(F.min("wave").alias("first_wave")))
    disc = (first.groupBy("first_wave")
            .agg(F.count("*").cast("long").alias("n_discovered"))
            .withColumnRenamed("first_wave", "wave"))
    encs = enc.groupBy("wave").agg(
        F.count("*").cast("long").alias("n_encounters"))
    w = Window.orderBy("wave").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    return (encs.join(disc, "wave", "left")
            .select("wave", "n_encounters",
                    F.coalesce("n_discovered", F.lit(0)).cast("long")
                    .alias("n_discovered"))
            .withColumn("cum_distinct",
                        F.sum("n_discovered").over(w).cast("long"))
            .withColumn("novelty_ppm",
                        F.expr("n_discovered * 1000000 DIV n_encounters")
                        .cast("long")))


ORACLE_FRONTIER_DISCOVERY_CURVE = """
WITH enc AS (
  SELECT o_custkey % 8 AS wave,
         (o_orderkey * (o_custkey + 1)) % 2000 AS url
  FROM orders),
first AS (
  SELECT url, min(wave) AS first_wave FROM enc GROUP BY url),
disc AS (
  SELECT first_wave AS wave, CAST(count(*) AS BIGINT) AS n_discovered
  FROM first GROUP BY first_wave),
encs AS (
  SELECT wave, CAST(count(*) AS BIGINT) AS n_encounters
  FROM enc GROUP BY wave)
SELECT CAST(e.wave AS BIGINT) AS wave, e.n_encounters,
       CAST(coalesce(d.n_discovered, 0) AS BIGINT) AS n_discovered,
       CAST(sum(coalesce(d.n_discovered, 0))
              OVER (ORDER BY e.wave) AS BIGINT) AS cum_distinct,
       CAST(coalesce(d.n_discovered, 0) * 1000000 // e.n_encounters
            AS BIGINT) AS novelty_ppm
FROM encs e LEFT JOIN disc d ON d.wave = e.wave
"""


# ---------------------------------------------------------------------------
# block 51 — crawl admission + content integrity
# ---------------------------------------------------------------------------

#: UT1-style blocklist of registrable domains (one 3-label entry exercises
#: depth-3 suffix matching; mal4.io is unsatisfiable by the synth congruences
#: so a no-match entry costs nothing).
_BLOCKLIST51 = ["ads4.com", "track3.org", "spam2.net", "shop9.io",
                "cdn6.net", "www.site8.com", "mal4.io"]


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


#: (magic-bytes hex, media type) table shared by the mismatch query's synth
#: and sniffer — PNG/JPEG/GIF/PDF/ZIP/HTML, the formats a crawler actually
#: meets. Sniff prefixes (<= 4 bytes) are mutually exclusive.
_MAGIC51 = [("89504E470D0A1A0A", "image/png"),
            ("FFD8FFE0", "image/jpeg"),
            ("474946383961", "image/gif"),
            ("25504446", "application/pdf"),
            ("504B0304", "application/zip"),
            ("3C21444F43545950", "text/html")]


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


# ---------------------------------------------------------------------------
# block 52 — web-graph macro structure + attribution
# ---------------------------------------------------------------------------


def _bowtie_edges(spark, sf_dir):
    """Directed 60-node host graph with a KNOWN bow-tie anatomy (each
    i = o_orderkey % 60 contributes one edge, so both engines build it
    identically): b0..b9 a 10-cycle (the CORE SCC), b10..b19 point in,
    b20..b24 chain behind them (2-hop IN), core feeds b25..b34 with
    b35..b39 chained behind (2-hop OUT), b10..b14 -> b40..b44 tendril
    stubs, b45..b49 a disconnected 5-cycle, and b55..b64 tendril leaves
    hanging off IN (b10..b19). Expected census: 10 CORE / 15 IN /
    15 OUT / 15 TENDRIL / 5 DISCONNECTED."""
    i = F.col("o_orderkey") % 60
    src = (F.when(i < 25, i)
           .when(i < 35, i - 25)
           .when(i < 40, i - 10)
           .when(i < 45, F.lit(10) + (i - 40))
           .when(i < 50, i)
           .otherwise(F.lit(10) + (i - 50)))
    dst = (F.when(i < 10, (i + 1) % 10)
           .when(i < 25, i - 10)
           .when(i < 45, i)
           .when(i < 50, F.lit(45) + ((i - 45) + 1) % 5)
           .otherwise(F.lit(55) + (i - 50)))
    return (_t(spark, sf_dir, "orders")
            .select(F.concat(F.lit("b"), src.cast("string")).alias("src"),
                    F.concat(F.lit("b"), dst.cast("string")).alias("dst"))
            .distinct())


_BOWTIE_EDGES_SQL = """
  SELECT DISTINCT
    'b' || (CASE WHEN i < 25 THEN i WHEN i < 35 THEN i - 25
                 WHEN i < 40 THEN i - 10 WHEN i < 45 THEN 10 + (i - 40)
                 WHEN i < 50 THEN i ELSE 10 + (i - 50) END) AS src,
    'b' || (CASE WHEN i < 10 THEN (i + 1) % 10 WHEN i < 25 THEN i - 10
                 WHEN i < 45 THEN i
                 WHEN i < 50 THEN 45 + ((i - 45) + 1) % 5
                 ELSE 55 + (i - 50) END) AS dst
  FROM (SELECT o_orderkey % 60 AS i FROM orders)
"""


def q_graph_bowtie(spark, sf_dir):
    """Bow-tie decomposition of the host link graph (Broder et al.,
    WWW 2000 — the canonical macro-map of the web): CORE (the largest
    SCC), IN (reaches the core), OUT (reached from it), TENDRILS
    (attached but neither), DISCONNECTED. For a crawler the classes ARE
    the reachability budget: seeds in IN eventually cover CORE+OUT,
    seeds in OUT see only OUT, and DISCONNECTED mass is invisible
    without fresh seeds.

    Algorithm: one bounded join-expansion closure for directed
    reachability (same squared-doubling + localCheckpoint discipline as
    q_graph_scc), SCC ids from closure ∩ reversed closure, core = max
    SCC (min-id tie-break), then one symmetric closure for
    undirected attachment. Scale honesty identical to graph_scc: for
    site-local subgraphs (10^2-10^4 nodes per registered domain);
    whole-web bow-tie needs FW-BW pivoting."""
    edges = _bowtie_edges(spark, sf_dir).localCheckpoint(eager=True)

    def closure_of(e):
        reach = e.select(F.col("src").alias("node"),
                         F.col("dst").alias("reach"))
        for _ in range(5):  # paths up to 2^5 = 32 >= diameter (~16)
            step = (reach
                    .join(reach.select(F.col("node").alias("reach"),
                                       F.col("reach").alias("nxt")),
                          "reach")
                    .select("node", F.col("nxt").alias("reach")))
            reach = reach.unionByName(step).distinct() \
                .localCheckpoint(eager=True)
        return reach

    reach = closure_of(edges)
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))).distinct()
    closure = reach.unionByName(
        nodes.select("node", F.col("node").alias("reach"))).distinct()
    back = closure.select(F.col("reach").alias("node"),
                          F.col("node").alias("reach"))
    comp = (closure.join(back, ["node", "reach"])
            .groupBy("node").agg(F.min("reach").alias("scc_id")))
    sizes = comp.groupBy("scc_id").agg(F.count("*").alias("sz"))
    core_id = (sizes.orderBy(F.desc("sz"), "scc_id").limit(1)
               .select("scc_id"))
    core = comp.join(F.broadcast(core_id), "scc_id").select("node")
    reaches = (closure.join(F.broadcast(
        core.select(F.col("node").alias("reach"))), "reach")
        .select("node").distinct())
    reached = (closure.join(F.broadcast(
        core.select(F.col("node").alias("node"))), "node")
        .select(F.col("reach").alias("node")).distinct())
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"),
                                         F.col("src").alias("dst")))
    und = closure_of(sym)
    attached = (und.join(F.broadcast(
        core.select(F.col("node").alias("reach"))), "reach")
        .select("node").distinct())
    tag = (nodes
           .join(core.withColumn("in_core", F.lit(1)), "node", "left")
           .join(reaches.withColumn("to_core", F.lit(1)), "node", "left")
           .join(reached.withColumn("from_core", F.lit(1)), "node",
                 "left")
           .join(attached.withColumn("att", F.lit(1)), "node", "left"))
    cls = (F.when(F.col("in_core") == 1, "CORE")
           .when(F.col("to_core") == 1, "IN")
           .when(F.col("from_core") == 1, "OUT")
           .when(F.col("att") == 1, "TENDRIL")
           .otherwise("DISCONNECTED"))
    return tag.select(F.col("node").alias("host_key"),
                      cls.alias("bowtie_class"))


ORACLE_GRAPH_BOWTIE = f"""
WITH RECURSIVE e AS ({_BOWTIE_EDGES_SQL}),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
reach AS (
  SELECT src AS node, dst AS r FROM e
  UNION
  SELECT t.node, e.dst AS r FROM reach t JOIN e ON e.src = t.r),
closure AS (
  SELECT node, r FROM reach UNION SELECT node, node AS r FROM nodes),
comp AS (
  SELECT c.node, min(c.r) AS scc_id FROM closure c
  JOIN closure b ON b.node = c.r AND b.r = c.node
  GROUP BY c.node),
core_id AS (
  SELECT scc_id FROM (
    SELECT scc_id, count(*) AS sz FROM comp GROUP BY scc_id)
  ORDER BY sz DESC, scc_id LIMIT 1),
core AS (SELECT node FROM comp WHERE scc_id IN (SELECT * FROM core_id)),
reaches AS (
  SELECT DISTINCT c.node FROM closure c
  WHERE c.r IN (SELECT node FROM core)),
reached AS (
  SELECT DISTINCT c.r AS node FROM closure c
  WHERE c.node IN (SELECT node FROM core)),
se AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
ureach AS (
  SELECT src AS node, dst AS r FROM se
  UNION
  SELECT t.node, se.dst AS r FROM ureach t JOIN se ON se.src = t.r),
attached AS (
  SELECT DISTINCT node FROM ureach
  WHERE r IN (SELECT node FROM core))
SELECT n.node AS host_key,
       CASE WHEN n.node IN (SELECT node FROM core) THEN 'CORE'
            WHEN n.node IN (SELECT node FROM reaches) THEN 'IN'
            WHEN n.node IN (SELECT node FROM reached) THEN 'OUT'
            WHEN n.node IN (SELECT node FROM attached) THEN 'TENDRIL'
            ELSE 'DISCONNECTED' END AS bowtie_class
FROM (SELECT DISTINCT node FROM nodes) n
"""
# NB: under WITH RECURSIVE, DuckDB 1.0 does NOT dedupe a plain
# `X UNION Y` CTE across its branches (SELECT 1 UNION SELECT 1 -> 2
# rows), so `nodes` carries src/dst duplicates — hence the DISTINCT
# wrapper above (graph_scc's oracle absorbs the same quirk via its
# GROUP BY).


def q_graph_degree_powerlaw(spark, sf_dir):
    """Power-law fit of the host in-degree distribution — the web-graph
    twin of text_zipf_fit (Broder et al. report gamma ~ 2.1 in-degree;
    a crawl whose frontier degree exponent drifts is biased toward or
    away from hubs): OLS of ln(#hosts with in-degree d) on ln(d).

    Fitting the CCDF (#hosts with degree >= d), not the raw histogram —
    the histogram's tail is all-ones and flattens a log-log OLS
    (the standard Clauset/Shalizi/Newman critique); the CCDF is
    monotone and smooth, and for P(d) ~ d^-gamma falls as d^-(gamma-1).
    Synthesis plants the law: hub = 1024 DIV x for x = o_orderkey %
    1024 + 1 gives in-degree(h) ~ 1024/h^2 => CCDF ~ d^-0.5.
    Same 1e-6-integer-unit OLS discipline as text_zipf_fit (summation
    order cannot flip the hash). Plan/scale: distinct-edge census ->
    in-degree groupBy -> degree-histogram groupBy -> cumulative window
    over <= |distinct degrees| rows (census-scale)."""
    x = F.col("o_orderkey") % 1024 + 1
    edges = (_t(spark, sf_dir, "orders")
             .select(F.concat(F.lit("s"), x.cast("string")).alias("src"),
                     F.concat(F.lit("d"),
                              F.expr("1024 DIV (o_orderkey % 1024 + 1)")
                              .cast("string")).alias("dst"))
             .distinct())
    indeg = edges.groupBy("dst").agg(F.count("*").alias("deg"))
    hist = indeg.groupBy("deg").agg(F.count("*").alias("n_nodes"))
    wc = Window.orderBy(F.desc("deg")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    hist = hist.withColumn("n_ge", F.sum("n_nodes").over(wc))
    xl = F.log(F.col("deg").cast("double"))
    yl = F.log(F.col("n_ge").cast("double"))
    u = lambda col: F.round(col * 1e6).cast("long")  # noqa: E731
    s = hist.agg(F.count(F.lit(1)).alias("n"),
                 F.sum(u(xl)).alias("sx"), F.sum(u(yl)).alias("sy"),
                 F.sum(u(xl * yl)).alias("sxy"),
                 F.sum(u(xl * xl)).alias("sxx"),
                 F.sum(u(yl * yl)).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / 1e6, F.col("sy") / 1e6
    sxy, sxx, syy = (F.col("sxy") / 1e6, F.col("sxx") / 1e6,
                     F.col("syy") / 1e6)
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        "n",
        F.round(cov / vx, 4).alias("slope"),
        F.round((sy - (cov / vx) * sx) / n, 4).alias("intercept"),
        F.round(cov * cov / (vx * vy), 4).alias("r2"))


ORACLE_GRAPH_DEGREE_POWERLAW = """
WITH e AS (
  SELECT DISTINCT 's' || (o_orderkey % 1024 + 1) AS src,
         'd' || (1024 // (o_orderkey % 1024 + 1)) AS dst
  FROM orders),
indeg AS (SELECT dst, count(*) AS deg FROM e GROUP BY dst),
hist AS (SELECT deg, count(*) AS n_nodes FROM indeg GROUP BY deg),
ccdf AS (
  SELECT deg, sum(n_nodes) OVER (ORDER BY deg DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_ge
  FROM hist),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(CAST(round(ln(deg) * 1000000.0) AS BIGINT)) AS sx,
         sum(CAST(round(ln(n_ge) * 1000000.0) AS BIGINT)) AS sy,
         sum(CAST(round(ln(deg) * ln(n_ge) * 1000000.0) AS BIGINT))
           AS sxy,
         sum(CAST(round(ln(deg) * ln(deg) * 1000000.0) AS BIGINT)) AS sxx,
         sum(CAST(round(ln(n_ge) * ln(n_ge) * 1000000.0) AS BIGINT))
           AS syy
  FROM ccdf)
SELECT n,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)), 4) AS slope,
       round(((sy / 1e6) - ((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                            / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)))
                           * (sx / 1e6)) / n, 4) AS intercept,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             * (n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / ((n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
                * (n * (syy / 1e6) - (sy / 1e6) * (sy / 1e6))), 4) AS r2
FROM s
"""


def q_events_attribution(spark, sf_dir):
    """Multi-touch conversion attribution: every 'purchase' distributes
    its value over the user's preceding 7 days of 'click'/'view'
    touches — last-touch (all credit to the latest touch) and linear
    (equal split, integer remainder to the latest touch so credit sums
    EXACTLY to conversion value) side by side; untouched conversions
    land in channel 'none'. Exact integer cents throughout.

    Plan/scale: the touch x purchase pairing is a per-user time-range
    join (user groups are session-sized; the day-bucket bin trick of
    events_range_join applies verbatim at 100 TB), then one window per
    purchase and one census agg per channel."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("u"),
                     F.col("event_id").alias("p_id"),
                     F.col("ts").alias("p_ts"), cents.alias("cents")))
    channel = F.element_at(
        F.array(F.lit("email"), F.lit("search"), F.lit("social"),
                F.lit("direct")),
        (F.col("event_id") % 4 + 1).cast("int"))
    touch = (ev.filter(F.col("event_type").isin("click", "view"))
             .select(F.col("user_id").alias("u"),
                     F.col("event_id").alias("t_id"),
                     F.col("ts").alias("t_ts"),
                     channel.alias("channel")))
    pairs = touch.join(
        purch,
        (touch["u"] == purch["u"])
        & (touch["t_ts"] <= purch["p_ts"])
        & (touch["t_ts"] >= purch["p_ts"] - F.expr("INTERVAL 7 DAYS")))
    w = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
    wn = Window.partitionBy("p_id")
    scored = (pairs.select("p_id", "t_id", "t_ts", "channel", "cents")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("nt", F.count("*").over(wn)))
    last_c = F.when(F.col("rn") == 1, F.col("cents")).otherwise(F.lit(0))
    lin_c = (F.expr("cents DIV nt")
             + F.when(F.col("rn") == 1, F.expr("cents % nt"))
             .otherwise(F.lit(0)))
    credited = (scored
                .select("p_id", "channel", last_c.alias("lc"),
                        lin_c.alias("nc"))
                .groupBy("channel")
                .agg(F.count("*").cast("long").alias("n_touches"),
                     F.countDistinct("p_id").cast("long")
                     .alias("n_conversions"),
                     F.sum("lc").cast("long").alias("last_touch_cents"),
                     F.sum("nc").cast("long").alias("linear_cents")))
    untouched = (purch.join(pairs.select("p_id").distinct(), "p_id",
                            "left_anti")
                 .agg(F.lit("none").alias("channel"),
                      F.lit(0).cast("long").alias("n_touches"),
                      F.count("*").cast("long").alias("n_conversions"),
                      F.sum("cents").cast("long")
                      .alias("last_touch_cents"),
                      F.sum("cents").cast("long").alias("linear_cents")))
    return credited.unionByName(untouched)


ORACLE_EVENTS_ATTRIBUTION = """
WITH purch AS (
  SELECT user_id AS u, event_id AS p_id, ts AS p_ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id AS u, event_id AS t_id, ts AS t_ts,
         CASE event_id % 4 WHEN 0 THEN 'email' WHEN 1 THEN 'search'
              WHEN 2 THEN 'social' ELSE 'direct' END AS channel
  FROM events WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT p.p_id, t.t_id, t.channel, p.cents, t.t_ts
  FROM touch t JOIN purch p
    ON t.u = p.u AND t.t_ts <= p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
scored AS (
  SELECT p_id, channel, cents,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ts DESC, t_id DESC) AS rn,
         count(*) OVER (PARTITION BY p_id) AS nt
  FROM pairs),
credited AS (
  SELECT channel,
         CAST(count(*) AS BIGINT) AS n_touches,
         CAST(count(DISTINCT p_id) AS BIGINT) AS n_conversions,
         CAST(sum(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS last_touch_cents,
         CAST(sum(cents // nt + CASE WHEN rn = 1 THEN cents % nt
                                     ELSE 0 END) AS BIGINT)
           AS linear_cents
  FROM scored GROUP BY channel),
untouched AS (
  SELECT 'none' AS channel, CAST(0 AS BIGINT) AS n_touches,
         CAST(count(*) AS BIGINT) AS n_conversions,
         CAST(sum(cents) AS BIGINT) AS last_touch_cents,
         CAST(sum(cents) AS BIGINT) AS linear_cents
  FROM purch WHERE p_id NOT IN (SELECT p_id FROM pairs))
SELECT * FROM credited UNION ALL SELECT * FROM untouched
"""


def q_events_ab_lift(spark, sf_dir):
    """A/B experiment readout over the event stream — the harness every
    crawl-policy or ranking change ships behind: deterministic variant
    assignment (user_id parity — the hash-bucket split of
    corpus_split/split_leakage_audit), exposure = any view/click,
    conversion = exposed user with >=1 purchase. One row: per-variant
    user/conversion census, exact-ppm conversion rates and lift, a
    sample-ratio-mismatch guard (srm_ppm — the first thing to check
    before believing any lift), exposed-user revenue cents, and the
    pooled two-proportion z statistic. Counts/cents/ppm are exact
    integers; z is the one IEEE expression, built identically in both
    engines from those integers and rounded to 4 dp.

    Plan/scale: one user_id-keyed partial agg (map-side combine over
    the raw stream), then a single-row census — no join anywhere. At
    100 TB of events this is one shuffle of |users| rows."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = (ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type").isin("view", "click"), 1)
              .otherwise(0)).alias("exposed"),
        F.max(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).alias("purchased"),
        F.sum(F.when(F.col("event_type") == "purchase", cents)
              .otherwise(F.lit(0))).cast("long").alias("rev_cents")))
    u = (per_user.filter(F.col("exposed") == 1)
         .withColumn("is_b", (F.col("user_id") % 2).cast("int")))
    row = u.agg(
        F.sum(F.when(F.col("is_b") == 0, 1).otherwise(0))
        .cast("long").alias("a_users"),
        F.sum(F.when(F.col("is_b") == 1, 1).otherwise(0))
        .cast("long").alias("b_users"),
        F.sum(F.when((F.col("is_b") == 0) & (F.col("purchased") == 1), 1)
              .otherwise(0)).cast("long").alias("a_conv"),
        F.sum(F.when((F.col("is_b") == 1) & (F.col("purchased") == 1), 1)
              .otherwise(0)).cast("long").alias("b_conv"),
        F.sum(F.when(F.col("is_b") == 0, F.col("rev_cents"))
              .otherwise(F.lit(0))).cast("long").alias("a_rev_cents"),
        F.sum(F.when(F.col("is_b") == 1, F.col("rev_cents"))
              .otherwise(F.lit(0))).cast("long").alias("b_rev_cents"))
    row = (row
           .withColumn("a_conv_ppm", F.expr(
               "(a_conv * 1000000) DIV greatest(a_users, 1)"))
           .withColumn("b_conv_ppm", F.expr(
               "(b_conv * 1000000) DIV greatest(b_users, 1)"))
           .withColumn("lift_ppm",
                       F.col("b_conv_ppm") - F.col("a_conv_ppm"))
           .withColumn("srm_ppm", F.expr(
               "(abs(a_users - b_users) * 1000000)"
               " DIV greatest(a_users + b_users, 1)")))
    # pooled two-proportion z — the single IEEE expression, mirrored
    # verbatim in the oracle so both engines evaluate the same tree;
    # degenerate pools (0% or 100% conversion -> se = 0) emit z = 0
    na = F.expr("greatest(a_users, 1)")
    nb = F.expr("greatest(b_users, 1)")
    pc = (F.col("a_conv") + F.col("b_conv")) / (na + nb)
    se = F.sqrt(pc * (1 - pc) * (1.0 / na + 1.0 / nb))
    diff = F.col("b_conv") / nb - F.col("a_conv") / na
    z = F.when(se > 0, F.round(diff / se, 4)).otherwise(F.lit(0.0))
    return row.withColumn("z_stat", z)


ORACLE_EVENTS_AB_LIFT = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type IN ('view', 'click') THEN 1
                  ELSE 0 END) AS exposed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchased,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev_cents
  FROM events GROUP BY user_id),
u AS (SELECT *, CAST(user_id % 2 AS INT) AS is_b
      FROM per_user WHERE exposed = 1),
census AS (
  SELECT CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS a_users,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS b_users,
         CAST(sum(CASE WHEN is_b = 0 AND purchased = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS a_conv,
         CAST(sum(CASE WHEN is_b = 1 AND purchased = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS b_conv,
         CAST(sum(CASE WHEN is_b = 0 THEN rev_cents ELSE 0 END) AS BIGINT)
           AS a_rev_cents,
         CAST(sum(CASE WHEN is_b = 1 THEN rev_cents ELSE 0 END) AS BIGINT)
           AS b_rev_cents
  FROM u),
rates AS (
  SELECT *,
         (a_conv * 1000000) // greatest(a_users, 1) AS a_conv_ppm,
         (b_conv * 1000000) // greatest(b_users, 1) AS b_conv_ppm,
         (abs(a_users - b_users) * 1000000)
           // greatest(a_users + b_users, 1) AS srm_ppm
  FROM census),
z AS (
  SELECT *,
         sqrt((a_conv + b_conv)
              / (greatest(a_users, 1) + greatest(b_users, 1))
              * (1 - (a_conv + b_conv)
                 / (greatest(a_users, 1) + greatest(b_users, 1)))
              * (1.0 / greatest(a_users, 1)
                 + 1.0 / greatest(b_users, 1))) AS se
  FROM rates)
SELECT a_users, b_users, a_conv, b_conv, a_rev_cents, b_rev_cents,
       a_conv_ppm, b_conv_ppm,
       b_conv_ppm - a_conv_ppm AS lift_ppm, srm_ppm,
       CASE WHEN se > 0
            THEN round((b_conv / greatest(b_users, 1)
                        - a_conv / greatest(a_users, 1)) / se, 4)
            ELSE 0.0 END AS z_stat
FROM z
"""


def q_embeddings_pca_power(spark, sf_dir):
    """One matrix-free power-iteration step toward the corpus's top
    principal direction: y = X^T (X v0) with v0 = the all-ones probe —
    the Gram-vector product computed WITHOUT materializing the DxD
    covariance (the only way at 10^10 x 1024-dim scale; Halko et al.
    2011's randomized-SVD building block). Elements quantize to 1e-4
    integer units so every sum is exact (summation order free): the
    per-row projection t = x.v0 folds inside the array (F.aggregate,
    no explode/join), then y_d = sum(x_d * t) is ONE dim-keyed agg.
    Output per dim: exact y in integer units and its share of total
    |y| mass in exact ppm — the energy profile that decides how many
    PCA/MRL dimensions the embedding column actually needs.

    Plan/scale: zero joins; one shuffle of |dims| keys (64 here, 1024
    in prod) with map-side combine doing all the work. Subsequent
    iterations broadcast the 64-row v back — same shape."""
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    xu = F.transform(
        "embedding",
        lambda v: F.round(v.cast("double") * 1e4).cast("long"))
    e2 = e.select(xu.alias("xu"))
    e2 = e2.withColumn(
        "t", F.aggregate("xu", F.lit(0).cast("long"),
                         lambda acc, x: acc + x))
    ex = e2.select(F.posexplode("xu").alias("dim", "x_u"), "t")
    y = (ex.groupBy("dim")
         .agg(F.sum(F.col("x_u") * F.col("t")).cast("long").alias("y_u")))
    tot = y.agg(F.sum(F.abs(F.col("y_u"))).cast("long").alias("ta"))
    return (y.crossJoin(F.broadcast(tot))
            .select("dim", "y_u",
                    F.expr("(abs(y_u) * 1000000) DIV greatest(ta, 1)")
                    .alias("share_ppm")))


ORACLE_EMBEDDINGS_PCA_POWER = """
WITH ex AS (
  SELECT vec_id, CAST(dim AS INT) AS dim,
         CAST(round(embedding[dim + 1]::DOUBLE * 10000.0) AS BIGINT)
           AS x_u
  FROM (SELECT vec_id, embedding,
               unnest(range(len(embedding))) AS dim
        FROM embeddings)),
t AS (SELECT vec_id, CAST(sum(x_u) AS BIGINT) AS t
      FROM ex GROUP BY vec_id),
y AS (SELECT dim, CAST(sum(ex.x_u * t.t) AS BIGINT) AS y_u
      FROM ex JOIN t USING (vec_id) GROUP BY dim),
tot AS (SELECT CAST(sum(abs(y_u)) AS BIGINT) AS ta FROM y)
SELECT dim, y_u,
       (abs(y_u) * 1000000) // greatest(ta, 1) AS share_ppm
FROM y, tot
"""


def q_graph_pagerank_delta(spark, sf_dir):
    """Incremental-rank telemetry: PageRank before vs after a wave of
    newly discovered links, per host — 'whose crawl priority did this
    wave actually move' (the signal that decides whether the frontier
    re-sorts or keeps its order). Base graph = the shared 50-host link
    graph; the delta wave adds reversed links from every 9th order
    (new backlinks a deeper crawl surfaces). Both ranks are the exact
    integer 3-iteration kernel of q_host_pagerank (1e-9 units, DIV
    divisions), so before/after/movement compare bit-for-bit.

    Plan/scale: the two unrolled rank chains share the base-edge scan
    (ReusedExchange); the final compare is one 50-row join. At 10^10
    edges real incremental PR would localize to the delta's forward
    cone — this row is the exact-recompute harness that GRADES such an
    approximation (same shape as url_bloom_eval vs the exact set)."""
    S, BASE = 1_000_000_000, 150_000_000

    def pr3(edges):
        deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
        nodes = (edges.select(F.col("src").alias("node"))
                 .unionByName(edges.select(F.col("dst").alias("node")))
                 .distinct())
        ranks = nodes.withColumn("rank", F.lit(S).cast("long"))
        for _ in range(3):
            contrib = (edges
                       .join(ranks.withColumnRenamed("node", "src"), "src")
                       .join(deg, "src")
                       .select(F.col("dst").alias("node"),
                               F.expr("rank DIV outdeg").alias("share"))
                       .groupBy("node")
                       .agg(F.sum("share").alias("c")))
            ranks = (nodes.join(contrib, "node", "left")
                     .select("node",
                             (F.lit(BASE) +
                              F.expr("(85 * coalesce(c, 0)) DIV 100"))
                             .cast("long").alias("rank")))
        return ranks

    base = _host_edges50(spark, sf_dir)
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    delta = (_t(spark, sf_dir, "orders")
             .filter(k % 9 == 0)
             .select(F.concat(F.lit("h"), (c % 50).cast("string"))
                     .alias("src"),
                     F.concat(F.lit("h"), ((k + 13) % 50).cast("string"))
                     .alias("dst"))
             .filter(F.col("src") != F.col("dst")))
    after_edges = base.unionByName(delta).distinct()
    before = pr3(base).withColumnRenamed("rank", "pr_before")
    after = pr3(after_edges).withColumnRenamed("rank", "pr_after")
    return (before.join(after, "node", "full")
            .select(F.col("node").alias("host_key"),
                    F.coalesce("pr_before", F.lit(0)).cast("long")
                    .alias("pr_before"),
                    F.coalesce("pr_after", F.lit(0)).cast("long")
                    .alias("pr_after"))
            .withColumn("delta_units",
                        F.col("pr_after") - F.col("pr_before")))


def _pr3_sql(e_cte: str, prefix: str) -> str:
    """Unrolled 3-iteration integer-PageRank CTE chain (oracle mirror of
    the pr3 kernel in q_graph_pagerank_delta); returns CTE text ending
    in '{prefix}r3(node, rank)'."""
    p = prefix
    out = [f"{p}deg AS (SELECT src, count(*) AS outdeg FROM {e_cte} "
           f"GROUP BY src)",
           f"{p}n AS (SELECT src AS node FROM {e_cte} "
           f"UNION SELECT dst FROM {e_cte})",
           f"{p}r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS rank "
           f"FROM {p}n)"]
    for i in (1, 2, 3):
        out.append(
            f"{p}c{i} AS (SELECT e.dst AS node, "
            f"sum({p}r{i-1}.rank // {p}deg.outdeg) AS c "
            f"FROM {e_cte} e JOIN {p}r{i-1} ON {p}r{i-1}.node = e.src "
            f"JOIN {p}deg ON {p}deg.src = e.src GROUP BY e.dst)")
        out.append(
            f"{p}r{i} AS (SELECT n.node, CAST(150000000 + "
            f"(85 * coalesce({p}c{i}.c, 0)) // 100 AS BIGINT) AS rank "
            f"FROM {p}n n LEFT JOIN {p}c{i} ON {p}c{i}.node = n.node)")
    return ",\n".join(out)


ORACLE_GRAPH_PAGERANK_DELTA = f"""
WITH e AS ({_HOST_E50_SQL}),
d AS (
  SELECT 'h' || (o_custkey % 50) AS src,
         'h' || ((o_orderkey + 13) % 50) AS dst
  FROM orders
  WHERE o_orderkey % 9 = 0
    AND 'h' || (o_custkey % 50) <> 'h' || ((o_orderkey + 13) % 50)),
e2 AS (SELECT src, dst FROM e UNION SELECT src, dst FROM d),
{_pr3_sql('e', 'b')},
{_pr3_sql('e2', 'a')}
SELECT coalesce(b.node, a.node) AS host_key,
       CAST(coalesce(b.rank, 0) AS BIGINT) AS pr_before,
       CAST(coalesce(a.rank, 0) AS BIGINT) AS pr_after,
       CAST(coalesce(a.rank, 0) - coalesce(b.rank, 0) AS BIGINT)
         AS delta_units
FROM br3 b FULL OUTER JOIN ar3 a ON a.node = b.node
"""


def q_events_bot_detect(spark, sf_dir):
    """Automated-traffic detection from event cadence — the log-side
    mirror of the crawler's own politeness: humans arrive bursty, bots
    tick. Per user: inter-event gaps (epoch-second lag, day-capped so a
    vacation doesn't drown the signal), then the squared coefficient of
    variation CV^2 = (n*sum(g^2) - S^2) / S^2 in exact integer ppm — the
    scale-free regularity score (0 = metronome). Bot flag = enough
    events + sub-10-min mean cadence + CV^2 below threshold. The gap cap
    keeps every accumulator in bigint range (g<=86400 -> n*ssg<=7.5e15
    at 1k gaps/user); the one DIV denominator is pre-shrunk by 1e6 so
    the ppm never multiplies past 63 bits.

    Plan/scale: ONE shuffle (user_id window), per-user agg reuses the
    same partitioning — the events_cdc_apply shape. At 100 TB of logs
    this is the standard sessionless per-key scan."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es"))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    # least() skips nulls in both engines, so guard the first event
    # explicitly or it would grow a phantom 86400 "gap"
    g = (ev.withColumn("prev", F.lag("es").over(w))
         .withColumn("gap", F.when(
             F.col("prev").isNotNull(),
             F.least(F.col("es") - F.col("prev"),
                     F.lit(86400).cast("long")))))
    agg = (g.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.count("gap").cast("long").alias("n_gaps"),
                F.coalesce(F.sum("gap"), F.lit(0)).cast("long")
                .alias("sg"),
                F.coalesce(F.sum(F.col("gap") * F.col("gap")),
                           F.lit(0)).cast("long").alias("ssg")))
    out = (agg
           .withColumn("mean_gap_s",
                       F.expr("sg DIV greatest(n_gaps, 1)"))
           .withColumn("cv2_ppm", F.expr(
               "greatest(n_gaps * ssg - sg * sg, 0)"
               " DIV greatest((sg * sg) DIV 1000000, 1)"))
           .withColumn("is_bot",
                       (F.col("n_events") >= 20)
                       & (F.col("mean_gap_s") < 600)
                       & (F.col("cv2_ppm") < 500_000)))
    return out.select("user_id", "n_events", "n_gaps", "mean_gap_s",
                      "cv2_ppm", "is_bot")


ORACLE_EVENTS_BOT_DETECT = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
              THEN NULL
              ELSE least(CAST(floor(epoch(ts)) AS BIGINT)
                         - lag(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                         86400) END AS gap
  FROM events),
agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(coalesce(sum(gap), 0) AS BIGINT) AS sg,
         CAST(coalesce(sum(gap * gap), 0) AS BIGINT) AS ssg
  FROM g GROUP BY user_id),
sc AS (
  SELECT *,
         sg // greatest(n_gaps, 1) AS mean_gap_s,
         greatest(n_gaps * ssg - sg * sg, 0)
           // greatest((sg * sg) // 1000000, 1) AS cv2_ppm
  FROM agg)
SELECT user_id, n_events, n_gaps, mean_gap_s, cv2_ppm,
       (n_events >= 20 AND mean_gap_s < 600 AND cv2_ppm < 500000)
         AS is_bot
FROM sc
"""


def q_embeddings_pq_distortion(spark, sf_dir):
    """Reconstruction-error grading of the PQ quantizer — the eval row
    that tells you whether the 16x compression of embeddings_pq is
    survivable (same grade-the-sketch shape as url_bloom_eval /
    dedup_minhash_eval): per subspace, the exact squared-L2 error
    between each subvector and its chosen centroid, quantized per row
    to 1e-6 units (the err expression is the identical IEEE tree in
    both engines; sums over rows are then exact integers). Output per
    subspace: vector count, total and mean squared error, worst case —
    the numbers that size k (centroids) per subspace and flag subspaces
    whose codebook underfits.

    Plan/scale: codebooks are plan literals (pq_codes_sql rationale),
    the err map is zero-shuffle, then ONE m-key agg. Never touches a
    join at any corpus size."""
    sub = _PQ_DIM // _PQ_M
    cents = SIM.pq_centroids(_PQ_M, _PQ_K, sub)
    cols = []
    for j, codebook in enumerate(cents):
        d = SIM._sub_dists_sql("`embedding`", codebook, j * sub, sub)
        xn = (f"aggregate(transform(slice(`embedding`, {j * sub + 1}, "
              f"{sub}), x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
              f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)")
        cols.append(f"CAST(round(({xn} + array_min({d})) * 1000000) "
                    f"AS BIGINT)")
    errs = F.expr("array(" + ", ".join(cols) + ")")
    ex = (_t(spark, sf_dir, "embeddings").select(errs.alias("errs"))
          .select(F.posexplode("errs").alias("subspace", "err_u")))
    return (ex.groupBy("subspace")
            .agg(F.count(F.lit(1)).cast("long").alias("n_vecs"),
                 F.sum("err_u").cast("long").alias("sse_u"),
                 F.max("err_u").cast("long").alias("max_err_u"))
            .withColumn("mse_u", F.expr("sse_u DIV greatest(n_vecs, 1)"))
            .select("subspace", "n_vecs", "sse_u", "mse_u", "max_err_u"))


def _pq_distortion_oracle() -> str:
    sub = _PQ_DIM // _PQ_M
    cents = SIM.pq_centroids(_PQ_M, _PQ_K, sub)
    rows = []
    for j, codebook in enumerate(cents):
        for c, vec in enumerate(codebook):
            lit = "[" + ", ".join(repr(x) for x in vec) + "]"
            cnorm2 = float(sum(x * x for x in vec))
            rows.append(f"({j}, {c}, {lit}::DOUBLE[], {cnorm2!r})")
    values = ",\n   ".join(rows)
    return f"""
WITH cb(j, c, cvec, cnorm2) AS (VALUES
   {values}),
dots AS (
  SELECT e.vec_id, cb.j,
         cb.cnorm2 - 2 * list_sum(list_transform(range({sub}),
             i -> e.embedding[{sub} * cb.j + i + 1]::DOUBLE
                  * cb.cvec[i + 1])) AS d
  FROM embeddings e CROSS JOIN cb),
best AS (
  SELECT vec_id, j, min(d) AS dmin FROM dots GROUP BY vec_id, j),
xn AS (
  SELECT vec_id, CAST(j AS INT) AS j,
         list_sum(list_transform(range({sub}),
             i -> e.embedding[{sub} * j + i + 1]::DOUBLE
                  * e.embedding[{sub} * j + i + 1]::DOUBLE)) AS xnorm2
  FROM embeddings e, unnest(range({_PQ_M})) AS t(j)),
err AS (
  SELECT xn.vec_id, xn.j,
         CAST(round((xn.xnorm2 + best.dmin) * 1000000) AS BIGINT)
           AS err_u
  FROM xn JOIN best ON best.vec_id = xn.vec_id AND best.j = xn.j)
SELECT j AS subspace, CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(sum(err_u) AS BIGINT) AS sse_u,
       CAST(sum(err_u) AS BIGINT) // greatest(count(*), 1) AS mse_u,
       CAST(max(err_u) AS BIGINT) AS max_err_u
FROM err GROUP BY j
"""


ORACLE_EMBEDDINGS_PQ_DISTORTION = _pq_distortion_oracle()


def q_frontier_makespan(spark, sf_dir):
    """Politeness-constrained drain ETA per scheduler bucket — 'when
    does this wave finish, and which host is the critical path': each
    host's drain time = pending URLs x its crawl delay (politeness
    makes per-host fetches strictly sequential, so host ETA is exact,
    not a model); a bucket's makespan is its slowest host, and
    balance_ppm = sum(eta) / (makespan x n_hosts) is the bucket's
    parallel efficiency (1e6 = perfectly level, low = one hub host
    starves the lane — the signal that triggers host re-sharding).
    Exact integer milliseconds end-to-end.

    Plan/scale: URL-scale work is ONE host-keyed census agg; everything
    after runs on |hosts| rows (window per bucket for the critical
    host). The bucket key is host%8 — the politeness-lane shard of
    crawler/politeness.py."""
    k = F.col("o_orderkey")
    hosts = (_t(spark, sf_dir, "orders")
             .select((k % 50).cast("long").alias("hn"))
             .groupBy("hn").agg(F.count(F.lit(1)).alias("pending")))
    per_host = hosts.select(
        F.concat(F.lit("h"), F.col("hn").cast("string")).alias("host"),
        (F.col("hn") % 8).cast("int").alias("bucket"),
        "pending",
        (F.lit(200) + 100 * (F.col("hn") % 7)).cast("long")
        .alias("delay_ms")).withColumn(
            "eta_ms", F.col("pending") * F.col("delay_ms"))
    w = Window.partitionBy("bucket").orderBy(F.desc("eta_ms"),
                                             F.asc("host"))
    ranked = per_host.withColumn("rn", F.row_number().over(w))
    agg = (per_host.groupBy("bucket")
           .agg(F.count(F.lit(1)).cast("long").alias("n_hosts"),
                F.sum("pending").cast("long").alias("total_pending"),
                F.max("eta_ms").cast("long").alias("makespan_ms"),
                F.sum("eta_ms").cast("long").alias("work_ms")))
    crit = (ranked.filter(F.col("rn") == 1)
            .select("bucket", F.col("host").alias("critical_host")))
    return (agg.join(crit, "bucket")
            .withColumn("balance_ppm", F.expr(
                "(work_ms * 1000000)"
                " DIV greatest(makespan_ms * n_hosts, 1)"))
            .select("bucket", "n_hosts", "total_pending", "makespan_ms",
                    "critical_host", "balance_ppm"))


ORACLE_FRONTIER_MAKESPAN = """
WITH h AS (
  SELECT o_orderkey % 50 AS hn, count(*) AS pending
  FROM orders GROUP BY 1),
per_host AS (
  SELECT 'h' || hn AS host, CAST(hn % 8 AS INT) AS bucket, pending,
         CAST(200 + 100 * (hn % 7) AS BIGINT) AS delay_ms,
         CAST(pending * (200 + 100 * (hn % 7)) AS BIGINT) AS eta_ms
  FROM h),
agg AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(pending) AS BIGINT) AS total_pending,
         CAST(max(eta_ms) AS BIGINT) AS makespan_ms,
         CAST(sum(eta_ms) AS BIGINT) AS work_ms
  FROM per_host GROUP BY bucket),
crit AS (
  SELECT bucket, host AS critical_host FROM (
    SELECT bucket, host,
           row_number() OVER (PARTITION BY bucket
                              ORDER BY eta_ms DESC, host ASC) AS rn
    FROM per_host) WHERE rn = 1)
SELECT agg.bucket, n_hosts, total_pending, makespan_ms, critical_host,
       (work_ms * 1000000) // greatest(makespan_ms * n_hosts, 1)
         AS balance_ppm
FROM agg JOIN crit ON crit.bucket = agg.bucket
"""


def q_text_heaps_fit(spark, sf_dir):
    """Heaps'-law vocabulary-growth fit — the companion diagnostic to
    text_zipf_fit: V(N) = K * N^beta (beta ~ 0.4-0.6 for natural text;
    template/machine-generated corpora flatten it, OCR noise inflates
    it). Per doc in doc_id order: cumulative tokens consumed N and
    cumulative distinct types V (a type's birth doc = min(doc_id) over
    its occurrences), then OLS of ln V on ln N. The ln terms are taken
    on exact integer cumsums and quantized to 1e-6 units before
    summing, so slope/intercept/r2 derive from exact integer sums —
    the text_zipf_fit recipe verbatim.

    Plan/scale: token explode -> two census-scale aggs (per-type birth,
    per-doc counts); the cumsum window runs over |docs| census rows,
    never the token stream. Same census-then-rank shape as zipf."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (d.select("doc_id",
                     F.explode(F.split(F.lower("text"), "[^a-z]+"))
                     .alias("w"))
            .filter(F.length("w") >= 2))
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"))
    births = (toks.groupBy("w").agg(F.min("doc_id").alias("birth"))
              .groupBy("birth").agg(F.count(F.lit(1)).alias("new_types"))
              .withColumnRenamed("birth", "doc_id"))
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    pts = (per_doc.join(births, "doc_id", "left")
           .select("doc_id", "n_tokens",
                   F.coalesce("new_types", F.lit(0)).alias("new_types"))
           .withColumn("nn", F.sum("n_tokens").over(w))
           .withColumn("vv", F.sum("new_types").over(w))
           .filter((F.col("nn") >= 10) & (F.col("vv") >= 1)))
    x = F.log(F.col("nn").cast("double"))
    y = F.log(F.col("vv").cast("double"))
    u = lambda col: F.round(col * 1e6).cast("long")  # noqa: E731
    s = pts.agg(F.count(F.lit(1)).alias("n"),
                F.sum(u(x)).alias("sx"), F.sum(u(y)).alias("sy"),
                F.sum(u(x * y)).alias("sxy"),
                F.sum(u(x * x)).alias("sxx"),
                F.sum(u(y * y)).alias("syy"))
    n = F.col("n").cast("double")
    sx, sy = F.col("sx") / 1e6, F.col("sy") / 1e6
    sxy, sxx, syy = (F.col("sxy") / 1e6, F.col("sxx") / 1e6,
                     F.col("syy") / 1e6)
    cov, vx, vy = n * sxy - sx * sy, n * sxx - sx * sx, n * syy - sy * sy
    return s.select(
        "n",
        F.round(cov / vx, 4).alias("beta"),
        F.round((sy - (cov / vx) * sx) / n, 4).alias("ln_k"),
        F.round(cov * cov / (vx * vy), 4).alias("r2"))


ORACLE_TEXT_HEAPS_FIT = r"""
WITH toks AS (
  SELECT doc_id, w FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '[^a-z]+')) AS w
    FROM documents)
  WHERE len(w) >= 2),
per_doc AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens
  FROM toks GROUP BY doc_id),
births AS (
  SELECT birth AS doc_id, CAST(count(*) AS BIGINT) AS new_types FROM (
    SELECT w, min(doc_id) AS birth FROM toks GROUP BY w)
  GROUP BY birth),
pts AS (
  SELECT sum(n_tokens) OVER (ORDER BY p.doc_id
                             ROWS UNBOUNDED PRECEDING) AS nn,
         sum(coalesce(new_types, 0))
           OVER (ORDER BY p.doc_id ROWS UNBOUNDED PRECEDING) AS vv
  FROM per_doc p LEFT JOIN births b ON b.doc_id = p.doc_id),
f AS (SELECT nn, vv FROM pts WHERE nn >= 10 AND vv >= 1),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(round(ln(nn) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sx,
         CAST(sum(CAST(round(ln(vv) * 1000000.0) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(sum(CAST(round(ln(nn) * ln(vv) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxy,
         CAST(sum(CAST(round(ln(nn) * ln(nn) * 1000000.0) AS BIGINT))
              AS BIGINT) AS sxx,
         CAST(sum(CAST(round(ln(vv) * ln(vv) * 1000000.0) AS BIGINT))
              AS BIGINT) AS syy
  FROM f)
SELECT n,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)), 4) AS beta,
       round(((sy / 1e6) - ((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
                            / (n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6)))
              * (sx / 1e6)) / n, 4) AS ln_k,
       round((n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             * (n * (sxy / 1e6) - (sx / 1e6) * (sy / 1e6))
             / ((n * (sxx / 1e6) - (sx / 1e6) * (sx / 1e6))
                * (n * (syy / 1e6) - (sy / 1e6) * (sy / 1e6))), 4) AS r2
FROM s
"""


def q_events_path_trigrams(spark, sf_dir):
    """Common-journey mining: the top-10 three-step event-type paths
    across all user timelines (the sequence-mining extension of
    events_markov's bigram transition matrix — funnels you did NOT
    design, discovered from the log). Two leads per user timeline,
    exact counts, rank on (count DESC, path ASC).

    Plan/scale: ONE shuffle (user_id window; leads reuse the same sort),
    path census agg, then a top-k window over the CENSUS (|distinct
    trigrams| <= |event types|^3 = tiny at any log size)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts",
                                            "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (ev.withColumn("e2", F.lead("event_type", 1).over(w))
         .withColumn("e3", F.lead("event_type", 2).over(w))
         .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
         .select(F.concat_ws(">", "event_type", "e2", "e3")
                 .alias("path")))
    census = p.groupBy("path").agg(F.count(F.lit(1)).cast("long")
                                   .alias("n_paths"))
    r = Window.orderBy(F.col("n_paths").desc(), F.col("path").asc())
    return (census.withColumn("rank", F.row_number().over(r))
            .filter(F.col("rank") <= 10)
            .select("path", "n_paths", "rank"))


ORACLE_EVENTS_PATH_TRIGRAMS = """
WITH p AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path FROM (
    SELECT event_type,
           lead(event_type, 1) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS e2,
           lead(event_type, 2) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS e3
    FROM events)
  WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
census AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_paths FROM p GROUP BY path)
SELECT path, n_paths, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_paths DESC, path ASC) AS rank
  FROM census)
WHERE rank <= 10
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


#: Adamic-Adar wedge weights, indexed 1-based by common-neighbor degree.
#: round(1e6 / ln(d)) precomputed ONCE in Python and injected as the same
#: literal array into BOTH engines, so no cross-engine ln() of a runtime
#: value can flip a rounding boundary (deg >= 2 always holds for a common
#: neighbor of two distinct nodes; slot 1 is an unused 0).
import math as _math  # noqa: E402  (stdlib, used for literal tables only)

_AA_UNITS = [0] + [round(1e6 / _math.log(d)) for d in range(2, 61)]
_AA_UNITS[0] = 0
_AA_ARRAY_SQL = "[" + ", ".join(str(v) for v in _AA_UNITS) + "]"


def q_graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction (Adamic & Adar, Social Networks 2003)
    over the shared 50-node host graph: for every NON-adjacent unordered
    host pair, score = sum over common neighbors w of 1/ln(deg(w)) — the
    classic 'which links is the crawl graph missing' signal (rare shared
    neighbors count more than hubs), feeding seed discovery the way
    host_pagerank feeds priority. Top-20 predicted links.

    Exactness: each wedge contributes _AA_UNITS[deg(w)] — quantized
    1e-6-unit integers from a literal table shared verbatim with the
    oracle — so the score is an exact integer sum (order-free) and the
    cross-engine ln() hazard class is eliminated at the source.

    Plan/scale: distinct symmetric edge list -> degree census -> wedge
    self-join keyed ON THE COMMON NEIGHBOR (per-key fan-out deg(w)^2,
    the df-cappable shape every dedup join here uses; never all-pairs)
    -> existing-edge anti-join -> top-k window over the candidate
    census.

    Graph note: NOT _host_edges50 — that graph saturates to complete at
    sf>=0.01 (every host pair realized), leaving nothing to predict.
    This row's 200-node graph admits a pair (i,j) as an edge only when
    (i*7 + j) % 13 == 0, so 12/13 of the pair space is structurally
    non-adjacent at every SF and predictions always exist."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    e = (_t(spark, sf_dir, "orders")
         .select((k % 200).alias("i"), (c % 200).alias("j"))
         .filter((F.col("i") != F.col("j"))
                 & ((F.col("i") * 7 + F.col("j")) % 13 == 0))
         .select(F.concat(F.lit("g"), F.col("i").cast("string"))
                 .alias("src"),
                 F.concat(F.lit("g"), F.col("j").cast("string"))
                 .alias("dst"))
         .distinct())
    und = (e.union(e.select(F.col("dst").alias("src"),
                            F.col("src").alias("dst")))
           .distinct())
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    arr = F.expr("array(" + ", ".join(str(v) for v in _AA_UNITS) + ")")
    wt = deg.select(F.col("src").alias("w"),
                    F.element_at(arr, F.col("deg").cast("int"))
                    .alias("aa_units"))
    a = und.select(F.col("src").alias("w"), F.col("dst").alias("u"))
    b = und.select(F.col("src").alias("w"), F.col("dst").alias("v"))
    wedges = (a.join(b, "w").filter(F.col("u") < F.col("v"))
              .join(F.broadcast(wt), "w"))
    cand = (wedges.groupBy("u", "v")
            .agg(F.sum("aa_units").cast("long").alias("score_units")))
    adj = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    missing = cand.join(adj, ["u", "v"], "left_anti")
    r = Window.orderBy(F.col("score_units").desc(), "u", "v")
    return (missing.withColumn("rank", F.row_number().over(r))
            .filter(F.col("rank") <= 20)
            .select("u", "v", "score_units", "rank"))


ORACLE_GRAPH_ADAMIC_ADAR = f"""
WITH e AS (
  SELECT DISTINCT 'g' || i AS src, 'g' || j AS dst FROM (
    SELECT o_orderkey % 200 AS i, o_custkey % 200 AS j FROM orders)
  WHERE i <> j AND (i * 7 + j) % 13 = 0),
und AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM e UNION ALL SELECT dst AS src, src AS dst FROM e)),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM und GROUP BY src),
wt AS (SELECT src AS w, ({_AA_ARRAY_SQL})[deg] AS aa_units FROM deg),
wedges AS (
  SELECT a.dst AS u, b.dst AS v, wt.aa_units
  FROM und a JOIN und b ON a.src = b.src AND a.dst < b.dst
  JOIN wt ON wt.w = a.src),
cand AS (
  SELECT u, v, CAST(sum(aa_units) AS BIGINT) AS score_units
  FROM wedges GROUP BY u, v),
missing AS (
  SELECT c.* FROM cand c
  WHERE NOT EXISTS (SELECT 1 FROM und WHERE src = c.u AND dst = c.v))
SELECT u, v, score_units, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY score_units DESC, u, v) AS rank
  FROM missing)
WHERE rank <= 20
"""


def q_events_survival(spark, sf_dir):
    """Kaplan-Meier repurchase-latency curve (Kaplan & Meier, JASA
    1958): each purchase event is a subject whose duration is the days
    until that user's NEXT purchase; a user's final purchase is
    right-CENSORED by the end of the log (its true gap is unknown, but
    it stays in the at-risk set — the bias a naive mean-gap estimate
    gets wrong). Emits the KM step table: gap day, at-risk count,
    deaths (observed next purchases), product-limit survival estimate.

    Exactness: n_risk and n_deaths are exact integer censuses; each
    step's hazard factor (n_risk - d)/n_risk is a division of exact
    integers (bit-identical IEEE result in both engines), its ln is
    quantized to 1e-9-unit integers BEFORE the running sum (the
    text_heaps_fit recipe), and survival_ppm = floor(exp(sum)*1e6+0.5).
    The one factor that can be 0 (everyone left dies on the last step)
    is special-cased to survival 0 without touching ln.

    Plan/scale: ONE per-user window (lead) over purchases, then every
    later window runs over the GAP-DAY CENSUS (<= max gap in days),
    never the event stream."""
    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "event_id", "ts"))
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gmax = ev.agg(F.max("ts").alias("gmax_ts"))
    subj = (ev.withColumn("next_ts", F.lead("ts").over(w_u))
            .crossJoin(F.broadcast(gmax))
            .select(F.datediff(F.to_date(F.coalesce("next_ts",
                                                    "gmax_ts")),
                               F.to_date("ts")).cast("int").alias("gap_d"),
                    F.when(F.col("next_ts").isNotNull(), 1)
                    .otherwise(0).alias("observed")))
    census = subj.groupBy("gap_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("observed").cast("long").alias("n_deaths"))
    w_all = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_prev = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, -1)
    steps = (census
             .withColumn("n_risk",
                         (F.sum("n_all").over(w_all) -
                          F.coalesce(F.sum("n_all").over(w_prev),
                                     F.lit(0))).cast("long"))
             .filter(F.col("n_deaths") > 0))
    f = ((F.col("n_risk") - F.col("n_deaths")).cast("double") /
         F.col("n_risk").cast("double"))
    steps = steps.withColumn(
        "lnq", F.when(f > 0, F.round(F.log(f) * 1e9).cast("long"))
        .otherwise(F.lit(0)))
    w_cum = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, 0)
    srv = F.when(f == 0, F.lit(0)).otherwise(
        F.floor(F.exp(F.sum("lnq").over(w_cum).cast("double") / 1e9)
                * 1e6 + F.lit(0.5))).cast("long")
    return steps.select("gap_d", "n_risk", "n_deaths",
                        srv.alias("survival_ppm"))


ORACLE_EVENTS_SURVIVAL = """
WITH ev AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_type = 'purchase'),
gmax AS (SELECT max(ts) AS gmax_ts FROM ev),
subj AS (
  SELECT CAST(date_diff('day', CAST(ts AS DATE),
                        CAST(coalesce(next_ts, gmax_ts) AS DATE)) AS INT)
           AS gap_d,
         CASE WHEN next_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM (SELECT ts, lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
        FROM ev), gmax),
census AS (
  SELECT gap_d, CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(observed) AS BIGINT) AS n_deaths
  FROM subj GROUP BY gap_d),
steps AS (
  SELECT gap_d, n_deaths,
         CAST(sum(n_all) OVER () -
              coalesce(sum(n_all) OVER (ORDER BY gap_d
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM census),
d AS (
  SELECT gap_d, n_risk, n_deaths,
         CASE WHEN n_risk > n_deaths
              THEN CAST(round(ln((CAST(n_risk - n_deaths AS DOUBLE))
                                 / CAST(n_risk AS DOUBLE)) * 1e9)
                        AS BIGINT)
              ELSE 0 END AS lnq
  FROM steps WHERE n_deaths > 0)
SELECT gap_d, n_risk, n_deaths,
       CASE WHEN n_risk = n_deaths THEN 0
            ELSE CAST(floor(exp(CAST(sum(lnq) OVER (ORDER BY gap_d
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                                / 1e9) * 1e6 + 0.5) AS BIGINT)
         END AS survival_ppm
FROM d
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


def q_text_kn_bigram(spark, sf_dir):
    """Interpolated Kneser-Ney bigram LM (Kneser & Ney, ICASSP 1995;
    Chen & Goodman 1999) — the principled upgrade over text_bigram_lm's
    add-0.5 smoothing: absolute discount D = 3/4 on observed bigram
    counts, with the freed mass backed off to the CONTINUATION
    probability (in how many distinct contexts does w2 appear), which
    is what makes KN the default n-gram smoother.

      P(w2|w1) = max(c12 - D, 0)/c1  +  (D * N1+(w1,.)/c1) * N1+(.,w2)/T

    Exactness: D = 3/4 keeps everything rational — both terms are
    integer-DIV quotients in 1e-9 units (decimal(38) intermediates so
    the N1+ x N1+ x 1e9 product can't wrap at web vocab sizes), so the
    probability is exact integer arithmetic on both engines.

    Plan/scale: one bigram explode -> three census-scale groupBys
    (c12, per-w1, per-w2) + a broadcast 1-row type count; the rank
    window runs over the c12 >= 2 CENSUS, never the token stream."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("text"))
    toks = d.select(F.filter(
        F.split(F.lower("text"), "[^a-z]+"),
        lambda x: F.length(x) >= 2).alias("w")).filter(F.size("w") >= 2)
    bg = toks.select(F.explode(F.expr(
        "transform(sequence(1, size(w) - 1), "
        "i -> struct(w[i - 1] AS w1, w[i] AS w2))")).alias("p")
    ).select("p.w1", "p.w2")
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long")
                                     .alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"),
                               F.count(F.lit(1)).alias("n1p_w1"))
    cw2 = c12.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_w2"))
    tt = c12.agg(F.count(F.lit(1)).alias("tt"))
    j = (c12.join(c1, "w1").join(cw2, "w2")
         .crossJoin(F.broadcast(tt)))
    # exact integer DIV in 1e-6 units (ppm); 3 * N1+ * N1+ * 1e6 stays
    # under long at ~5e4 distinct continuations per word — beyond that
    # (full web vocab) promote to decimal(38,0) like
    # embeddings_standardize
    term1 = F.expr("((4 * c12 - 3) * 1000000L) DIV (4 * c1)")
    term2 = F.expr("(3L * n1p_w1 * n1p_w2 * 1000000L) "
                   "DIV (4L * c1 * tt)")
    scored = (j.filter(F.col("c12") >= 2)
              .select("w1", "w2", "c12",
                      (term1 + term2).cast("long").alias("kn_ppm")))
    r = Window.orderBy(F.col("kn_ppm").desc(), "w1", "w2")
    return (scored.withColumn("rank", F.row_number().over(r))
            .filter(F.col("rank") <= 50)
            .select("w1", "w2", "c12", "kn_ppm", "rank"))


ORACLE_TEXT_KN_BIGRAM = """
WITH tok AS (
  SELECT list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> len(x) >= 2) AS w
  FROM documents WHERE text IS NOT NULL),
tw AS (SELECT w FROM tok WHERE len(w) >= 2),
bg AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM tw, unnest(range(1, len(w))) u(i)),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1,
              CAST(count(*) AS BIGINT) AS n1p_w1
       FROM c12 GROUP BY 1),
cw2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS n1p_w2
        FROM c12 GROUP BY 1),
tt AS (SELECT CAST(count(*) AS BIGINT) AS tt FROM c12),
scored AS (
  SELECT c12.w1, c12.w2, c12.c12,
         CAST((4::HUGEINT * c12.c12 - 3) * 1000000
              // (4::HUGEINT * c1.c1)
              + (3::HUGEINT * c1.n1p_w1 * cw2.n1p_w2 * 1000000)
                // (4::HUGEINT * c1.c1 * tt.tt) AS BIGINT) AS kn_ppm
  FROM c12 JOIN c1 USING (w1) JOIN cw2 USING (w2) CROSS JOIN tt
  WHERE c12.c12 >= 2)
SELECT w1, w2, c12, kn_ppm, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY kn_ppm DESC, w1, w2) AS rank
  FROM scored)
WHERE rank <= 50
"""


def q_events_rfm(spark, sf_dir):
    """RFM customer segmentation (Hughes 1994, the classic CRM
    workhorse): per user, Recency = days since last purchase at log
    end, Frequency = purchase count, Monetary = exact cent total;
    each scored 1-5 by quintile (5 = best) and concatenated into the
    three-digit segment (555 = champions, 111 = lost).

    Exactness: monetary quantizes each event value to cents BEFORE the
    sum (double-sum order can't touch the hash); quintiles are ntile(5)
    over a UNIQUE total order (metric, then user_id), so the tile
    boundaries are deterministic and the SQL-standard ntile agrees
    across engines.

    Plan/scale: one per-user agg, then three ntile windows over the
    USER census (not the event stream); the global-window census is the
    standard one-pass segmentation shape."""
    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "ts", "value"))
    gmax = ev.agg(F.max(F.to_date("ts")).alias("gmax_d"))
    per_user = (ev.groupBy("user_id")
                .agg(F.max(F.to_date("ts")).alias("last_d"),
                     F.count(F.lit(1)).cast("long").alias("frequency"),
                     F.sum(F.round(F.col("value") * 100).cast("long"))
                     .cast("long").alias("monetary_cents"))
                .crossJoin(F.broadcast(gmax))
                .select("user_id",
                        F.datediff("gmax_d", "last_d").cast("int")
                        .alias("recency_d"),
                        "frequency", "monetary_cents"))
    w_r = Window.orderBy(F.col("recency_d").desc(), "user_id")
    w_f = Window.orderBy(F.col("frequency").asc(), "user_id")
    w_m = Window.orderBy(F.col("monetary_cents").asc(), "user_id")
    scored = (per_user
              .withColumn("r_score", F.ntile(5).over(w_r))
              .withColumn("f_score", F.ntile(5).over(w_f))
              .withColumn("m_score", F.ntile(5).over(w_m)))
    return scored.select(
        "user_id", "recency_d", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10
         + F.col("m_score")).cast("int").alias("segment"))


ORACLE_EVENTS_RFM = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
gmax AS (SELECT max(d) AS gmax_d FROM ev),
per_user AS (
  SELECT user_id,
         CAST(date_diff('day', max(d), (SELECT gmax_d FROM gmax))
              AS INT) AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM ev GROUP BY user_id),
scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_d DESC, user_id) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
         ntile(5) OVER (ORDER BY monetary_cents ASC, user_id) AS m_score
  FROM per_user)
SELECT user_id, recency_d, frequency, monetary_cents,
       CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
FROM scored
"""


def q_media_color_histogram(spark, sf_dir):
    """Per-image intensity histogram over the gray8 bitmap corpus —
    the exposure/contrast screening pass (near-black scans, blown-out
    frames, flat synthetic fills) that gates imagery BEFORE any model
    decode: mapInPandas encodes the deterministic bitmaps, the
    operators.multimodal.gray8_histogram numpy kernel bins pixels
    (px // 16 -> 16 bins, zero bins emitted), and each bin ships with
    its exact ppm share of the image. The oracle restates synth +
    binning in integer SQL over an unnested pixel-index range — a
    value-hash match proves the Arrow plumbing and the bincount kernel
    end to end (the media_resize/media_phash convention).

    Plan/scale: per-row kernel, no shuffle until the per-doc ppm window
    (partitioned by doc_id — politeness-bucket sized); histogram rows
    are 16x-per-image metadata, never pixels."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_blob": [MM.gray8_by_doc_id(int(i))
                               for i in pdf["doc_id"]]})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    hist = MM.gray8_histogram(blobs, bins=16)
    w_doc = Window.partitionBy("doc_id")
    return (hist
            .withColumn("total", F.sum("n_px").over(w_doc))
            .select("doc_id", "bin", "n_px",
                    F.expr("(n_px * 1000000) DIV total").cast("long")
                    .alias("ppm")))


ORACLE_MEDIA_COLOR_HISTOGRAM = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents),
px AS (
  SELECT doc_id, w * h AS n_total,
         CAST(((doc_id * 31 + i * 7) % 256) // 16 AS INT) AS bin
  FROM d, unnest(range(w * h)) u(i)),
counts AS (
  SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_px,
         any_value(n_total) AS n_total
  FROM px GROUP BY doc_id, bin),
grid AS (
  SELECT d.doc_id, CAST(b AS INT) AS bin, d.w * d.h AS n_total
  FROM d, unnest(range(16)) g(b))
SELECT grid.doc_id, grid.bin,
       coalesce(counts.n_px, 0) AS n_px,
       CAST(coalesce(counts.n_px, 0) * 1000000 // grid.n_total
            AS BIGINT) AS ppm
FROM grid LEFT JOIN counts
  ON counts.doc_id = grid.doc_id AND counts.bin = grid.bin
"""


def q_text_calibration_ece(spark, sf_dir):
    """Reliability table for the quality rubric (Guo et al., ICML 2017
    calibration methodology): treat score/100 as the rubric's
    'confidence' that a doc is good, bin into 10 confidence deciles,
    and compare each bin's mean confidence against its empirical
    accuracy on the independent length>=200 label (the same weak label
    text_quality_pr calibrates thresholds on). |conf - acc| per bin is
    the reliability-diagram gap whose n-weighted sum is ECE — the
    standard 'is the scorer over-confident' diagnostic run before
    trusting corpus_clean's gate at 100 TB.

    Exactness: confidence = score * 10000 ppm (integer), bins by
    integer DIV, per-bin means as exact integer DIV of integer sums —
    no floats anywhere.

    Plan/scale: one codegen scoring scan -> ONE partial agg to a
    10-row census."""
    d = _t(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    scored = d.select(
        TS.quality_score_expr(F.col("text")).alias("q"),
        (F.length("text") >= 200).cast("long").alias("label"))
    binned = scored.select(
        F.least(F.expr("q DIV 10"), F.lit(9)).cast("int").alias("bin"),
        (F.col("q") * 10000).cast("long").alias("conf_ppm"), "label")
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("conf_ppm").alias("sum_conf"),
        F.sum("label").alias("n_pos"))
    return agg.select(
        "bin", "n",
        F.expr("sum_conf DIV n").cast("long").alias("mean_conf_ppm"),
        F.expr("(n_pos * 1000000) DIV n").cast("long").alias("acc_ppm"),
        F.abs(F.expr("sum_conf DIV n")
              - F.expr("(n_pos * 1000000) DIV n")).cast("long")
        .alias("gap_ppm"))


ORACLE_TEXT_CALIBRATION_ECE = f"""
WITH {_quality_cte("doc_id", "documents")},
b AS (
  SELECT least(qs.q // 10, 9) AS bin,
         CAST(qs.q * 10000 AS BIGINT) AS conf_ppm,
         CASE WHEN qm.n >= 200 THEN 1 ELSE 0 END AS label
  FROM qs JOIN qm USING (doc_id)
  WHERE qm.n IS NOT NULL),
agg AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(conf_ppm) AS BIGINT) AS sum_conf,
         CAST(sum(label) AS BIGINT) AS n_pos
  FROM b GROUP BY bin)
SELECT CAST(bin AS INT) AS bin, n,
       CAST(sum_conf // n AS BIGINT) AS mean_conf_ppm,
       CAST((n_pos * 1000000) // n AS BIGINT) AS acc_ppm,
       CAST(abs(sum_conf // n - (n_pos * 1000000) // n) AS BIGINT)
         AS gap_ppm
FROM agg
"""


def q_events_changepoint(spark, sf_dir):
    """Mean-shift change-point detection per event type — the first
    binary-segmentation step (Scott & Knott 1974; the batch CUSUM
    alternative whose recurrence can't distribute): over each type's
    daily count series, every boundary t is scored by the split
    statistic |mean(left) - mean(right)| and the argmax day is the
    candidate change point — the volume-regime-shift monitor for a
    crawl's fetch/error logs.

    Exactness: the statistic is |S_t*(n-t) - (S_n-S_t)*t| * 1e6 DIV
    (t*(n-t)) — exact integer arithmetic on cumulative-sum censuses
    (both engines DIV identically); argmax tie-breaks on earliest day.

    Plan/scale: daily census agg (map-side combinable), then ALL
    windows run over the per-type day census (~30 rows/type), never
    the event stream. Days with zero events of a type don't appear in
    the series (documented: the statistic is over observed days)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"))
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    cand = (daily
            .withColumn("st", F.sum("c").over(w_cum))
            .withColumn("sn", F.sum("c").over(w_all))
            .withColumn("t", F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")))
            .withColumn("n", F.count(F.lit(1)).over(w_all))
            .filter(F.col("t") < F.col("n"))
            .withColumn("stat_ppm", F.expr(
                "abs(st * (n - t) - (sn - st) * t) * 1000000 "
                "DIV (t * (n - t))").cast("long")))
    r = Window.partitionBy("event_type").orderBy(
        F.col("stat_ppm").desc(), "day")
    return (cand.withColumn("rk", F.row_number().over(r))
            .filter(F.col("rk") == 1)
            .select("event_type", F.col("day").alias("split_day"),
                    "stat_ppm", F.col("st").alias("left_sum"),
                    (F.col("sn") - F.col("st")).alias("right_sum"),
                    F.col("n").cast("long").alias("n_days")))


ORACLE_EVENTS_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
cand AS (
  SELECT event_type, day,
         sum(c) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS st,
         sum(c) OVER (PARTITION BY event_type) AS sn,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily),
scored AS (
  SELECT event_type, day,
         CAST(abs(st * (n - t) - (sn - st) * t) * 1000000
              // (t * (n - t)) AS BIGINT) AS stat_ppm,
         st, sn, n
  FROM cand WHERE t < n)
SELECT event_type, split_day, stat_ppm, left_sum, right_sum, n_days
FROM (
  SELECT event_type, day AS split_day, stat_ppm,
         CAST(st AS BIGINT) AS left_sum,
         CAST(sn - st AS BIGINT) AS right_sum,
         CAST(n AS BIGINT) AS n_days,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY stat_ppm DESC, day) AS rk
  FROM scored)
WHERE rk = 1
"""


def q_host_wilson_rank(spark, sf_dir):
    """Wilson-score lower-bound ranking of per-host fetch success
    (Wilson 1927; the 'how not to sort by average rating' fix): a host
    with 3/3 successes must NOT outrank one with 97/100, so hosts are
    ordered by the 95% lower confidence bound of their success rate —
    the retry/dead-host scheduler's robust health signal.

    Exactness: s and n are exact integer censuses; the Wilson bound
    uses only +,-,*,/ and sqrt of doubles derived from them — every one
    of those ops (sqrt included) is IEEE-754 correctly rounded, so both
    engines produce bit-identical doubles (no ln/exp in sight); the
    final floor(x*1e6+0.5) quantization is therefore safe.

    Plan/scale: one partial agg over the fetch log to a host census,
    then pure per-row math + one census-scale rank window."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    log = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (c % 40).cast("string")).alias("host"),
        F.when((k * 13 + c * 7) % (11 + c % 17) != 0, 1)
        .otherwise(0).alias("ok"))
    agg = log.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ok").cast("long").alias("s"))
    p = F.col("s").cast("double") / F.col("n").cast("double")
    nn = F.col("n").cast("double")
    z2 = F.lit(1.96) * F.lit(1.96)
    lb = ((p + z2 / (2 * nn)
           - F.lit(1.96) * F.sqrt(p * (1 - p) / nn + z2 / (4 * nn * nn)))
          / (1 + z2 / nn))
    scored = agg.select(
        "host", "n", "s",
        F.floor(lb * 1e6 + F.lit(0.5)).cast("long").alias("wilson_ppm"))
    r = Window.orderBy(F.col("wilson_ppm").desc(), "host")
    return (scored.withColumn("rank", F.row_number().over(r))
            .select("host", "n", "s", "wilson_ppm", "rank"))


ORACLE_HOST_WILSON_RANK = """
WITH log AS (
  SELECT 'h' || (o_custkey % 40) AS host,
         CASE WHEN (o_orderkey * 13 + o_custkey * 7)
                   % (11 + o_custkey % 17) <> 0 THEN 1 ELSE 0
           END AS ok
  FROM orders),
agg AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(ok) AS BIGINT) AS s
  FROM log GROUP BY host),
scored AS (
  SELECT host, n, s,
         CAST(floor((
           (CAST(s AS DOUBLE) / n + (1.96 * 1.96) / (2 * CAST(n AS DOUBLE))
            - 1.96 * sqrt((CAST(s AS DOUBLE) / n)
                          * (1 - CAST(s AS DOUBLE) / n)
                          / CAST(n AS DOUBLE)
                          + (1.96 * 1.96)
                            / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
           / (1 + (1.96 * 1.96) / CAST(n AS DOUBLE))) * 1e6 + 0.5)
           AS BIGINT) AS wilson_ppm
  FROM agg)
SELECT host, n, s, wilson_ppm, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY wilson_ppm DESC, host) AS rank
  FROM scored)
"""


def q_text_ttr_sttr(spark, sf_dir):
    """Standardized type-token ratio (Johnson 1944's STTR fix for TTR's
    length bias): per doc, tokens are cut into non-overlapping 50-token
    chunks (trailing partial chunk dropped), distinct types are counted
    per chunk, and the doc's lexical diversity is the mean chunk TTR —
    comparable ACROSS documents of different lengths, which raw TTR is
    not. The low-diversity tail is template/boilerplate text the
    repetition and novelty filters each see differently.

    Exactness: sttr_ppm = (sum of per-chunk distinct counts) * 1e6 DIV
    (n_chunks * 50) — all exact integers. Docs under 50 tokens drop out
    on both engines.

    Plan/scale: posexplode -> (doc, chunk) distinct-count agg ->
    per-doc agg; everything keys on (doc_id, chunk), so the shuffle is
    politeness-bucket sized — no giant keys, no windows."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    toks = d.select("doc_id", F.filter(
        F.split(F.lower("text"), "[^a-z]+"),
        lambda x: F.length(x) >= 2).alias("w"))
    pos = (toks.select("doc_id", F.posexplode("w").alias("pos", "tok"))
           .withColumn("chunk", F.expr("pos DIV 50"))
           .withColumn("n_tok", F.count(F.lit(1)).over(
               Window.partitionBy("doc_id")))
           .filter(F.col("chunk") < F.expr("n_tok DIV 50")))
    per_chunk = pos.groupBy("doc_id", "chunk").agg(
        F.countDistinct("tok").cast("long").alias("types"))
    return (per_chunk.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                 F.sum("types").cast("long").alias("sum_types"))
            .select("doc_id", "n_chunks",
                    F.expr("(sum_types * 1000000) DIV (n_chunks * 50)")
                    .cast("long").alias("sttr_ppm")))


ORACLE_TEXT_TTR_STTR = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z]+'),
                     x -> len(x) >= 2) AS w
  FROM documents WHERE text IS NOT NULL),
pos AS (
  SELECT doc_id, i // 50 AS chunk, w[i + 1] AS tok,
         len(w) AS n_tok
  FROM toks, unnest(range(len(w))) u(i)
  WHERE i // 50 < len(w) // 50),
per_chunk AS (
  SELECT doc_id, chunk,
         CAST(count(DISTINCT tok) AS BIGINT) AS types
  FROM pos GROUP BY doc_id, chunk)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST((sum(types) * 1000000) // (count(*) * 50) AS BIGINT)
         AS sttr_ppm
FROM per_chunk GROUP BY doc_id
"""


def q_events_lift_matrix(spark, sf_dir):
    """Association lift between event types (the market-basket measure,
    Brin et al. SIGMOD 1997): baskets are (user, day) activity windows;
    for each unordered type pair, lift = P(a,b) / (P(a) * P(b)) > 1
    means the types co-occur MORE than independence predicts — the
    co-behavior matrix behind 'users who error also retry' readouts,
    and the same shape as co-citation mining on the crawl side.

    Exactness: lift_ppm = (n_ab * n_baskets * 1e6) DIV (n_a * n_b),
    confidence both directions as exact DIV — counts only, no floats.

    Plan/scale: distinct (basket, type) -> per-type census + ONE
    self-equi-join on basket id (fan-out bounded by types-per-basket,
    5 here) -> pair census. Never all-pairs across baskets."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.col("user_id").cast("string"), F.lit("@"),
                 F.to_date("ts").cast("string")).alias("basket"),
        "event_type")
    bt = ev.distinct()
    n_baskets = bt.select("basket").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets"))
    per_type = bt.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t"))
    a = bt.select("basket", F.col("event_type").alias("a"))
    b = bt.select("basket", F.col("event_type").alias("b"))
    pairs = (a.join(b, "basket").filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab")))
    ta = per_type.select(F.col("event_type").alias("a"),
                         F.col("n_t").alias("n_a"))
    tb = per_type.select(F.col("event_type").alias("b"),
                         F.col("n_t").alias("n_b"))
    return (pairs.join(F.broadcast(ta), "a").join(F.broadcast(tb), "b")
            .crossJoin(F.broadcast(n_baskets))
            .select("a", "b", "n_ab", "n_a", "n_b",
                    F.expr("(n_ab * n_baskets * 1000000) DIV (n_a * n_b)")
                    .cast("long").alias("lift_ppm"),
                    F.expr("(n_ab * 1000000) DIV n_a").cast("long")
                    .alias("conf_a_to_b_ppm"),
                    F.expr("(n_ab * 1000000) DIV n_b").cast("long")
                    .alias("conf_b_to_a_ppm")))


ORACLE_EVENTS_LIFT_MATRIX = """
WITH bt AS (
  SELECT DISTINCT user_id || '@' || CAST(CAST(ts AS DATE) AS VARCHAR)
           AS basket, event_type
  FROM events),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
       FROM bt),
per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
  FROM bt GROUP BY event_type),
pairs AS (
  SELECT x.event_type AS a, y.event_type AS b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM bt x JOIN bt y ON x.basket = y.basket
                     AND x.event_type < y.event_type
  GROUP BY 1, 2)
SELECT a, b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
       CAST((n_ab * nb.n_baskets * 1000000) // (ta.n_t * tb.n_t)
            AS BIGINT) AS lift_ppm,
       CAST((n_ab * 1000000) // ta.n_t AS BIGINT) AS conf_a_to_b_ppm,
       CAST((n_ab * 1000000) // tb.n_t AS BIGINT) AS conf_b_to_a_ppm
FROM pairs JOIN per_type ta ON ta.event_type = pairs.a
           JOIN per_type tb ON tb.event_type = pairs.b
           CROSS JOIN nb
"""


def q_embeddings_cell_balance(spark, sf_dir):
    """IVF cell-occupancy audit — the index-health readout for
    ann_ivf_topk/ann_ivfpq_topk: assign every vector to its nearest
    coarse cell (the SAME assignment the ANN rows use) and grade the
    balance. A skewed cell is a skewed QUERY: probe latency follows
    cell size, so imbalance_ppm = n_cell * n_cells * 1e6 DIV n_total
    (1e6 = perfectly balanced) is the number that says 'retrain the
    centroids' — the embedding-space twin of shuffle_skew_audit.

    Plan/scale: codegen literal-centroid assignment (no Python), one
    partial agg to an n_cells-row census."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    cells = emb.select(
        SIM.assign_cell_expr(F.col("embedding"), cents).alias("cell"))
    agg = cells.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs"))
    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    return (agg.withColumn("n_total", F.sum("n_vecs").over(w))
            .select(F.col("cell").cast("int").alias("cell"), "n_vecs",
                    F.expr("(n_vecs * 1000000) DIV n_total").cast("long")
                    .alias("share_ppm"),
                    F.expr(f"(n_vecs * {_IVF_CENTROIDS} * 1000000) "
                           "DIV n_total").cast("long")
                    .alias("imbalance_ppm")))


def _cell_balance_oracle() -> str:
    return f"""
WITH {_ivf_cells_sql()},
agg AS (
  SELECT cell, CAST(count(*) AS BIGINT) AS n_vecs
  FROM base_cells GROUP BY cell),
tot AS (SELECT CAST(sum(n_vecs) AS BIGINT) AS n_total FROM agg)
SELECT CAST(cell AS INT) AS cell, n_vecs,
       CAST((n_vecs * 1000000) // n_total AS BIGINT) AS share_ppm,
       CAST((n_vecs * {_IVF_CENTROIDS} * 1000000) // n_total AS BIGINT)
         AS imbalance_ppm
FROM agg CROSS JOIN tot
"""


ORACLE_EMBEDDINGS_CELL_BALANCE = _cell_balance_oracle()


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


def _dot_seg_sql() -> str:
    p = "raw_path"
    for _ in range(3):
        p = f"regexp_replace({p}, '/\\./', '/', 'g')"
        p = f"regexp_replace({p}, '/[^/.][^/]*/\\.\\./', '/', 'g')"
    p = f"regexp_replace({p}, '/[^/.][^/]*/\\.\\.$', '/', 'g')"
    p = f"regexp_replace({p}, '/\\.$', '/', 'g')"
    for _ in range(2):
        p = f"regexp_replace({p}, '^/\\.\\.(/|$)', '/', 'g')"
    return p


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


def q_host_ssrf_guard(spark, sf_dir):
    """Internal-address admission guard — the SSRF/loopback filter a
    crawler runs on every candidate host BEFORE fetch (a seed list or a
    redirect can point the fleet at 127.0.0.1, RFC 1918 space,
    link-local, or the 169.254.169.254 cloud metadata endpoint; fetching
    those from inside the cluster is the classic crawler-as-confused-
    deputy bug). Pure-codegen classification: literal-IP parse via
    regex + integer octet math, the named-host 'localhost' case, and a
    block/allow verdict per candidate.

    Classes (first match wins): metadata (exact 169.254.169.254) >
    loopback (127/8) > private_10 (10/8) > private_172 (172.16/12) >
    private_192 (192.168/16) > link_local (169.254/16) > localhost
    (name) > public.

    Plan/scale: zero-shuffle pure map (regex + CASE ladder)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    host = (F.when(k % 9 == 0, F.lit("127.0.0.1"))
            .when(k % 9 == 1,
                  F.concat(F.lit("10."), (c % 256).cast("string"),
                           F.lit("."), (k % 256).cast("string"),
                           F.lit(".7")))
            .when(k % 9 == 2,
                  F.concat(F.lit("192.168."), (k % 256).cast("string"),
                           F.lit(".9")))
            .when(k % 9 == 3,
                  F.concat(F.lit("172."), (16 + k % 16).cast("string"),
                           F.lit(".0."), (c % 256).cast("string")))
            .when(k % 9 == 4, F.lit("169.254.169.254"))
            .when(k % 9 == 5,
                  F.concat(F.lit("169.254."), (k % 169).cast("string"),
                           F.lit(".1")))
            .when(k % 9 == 6, F.lit("localhost"))
            .when(k % 9 == 7,
                  F.concat(F.lit("93.184."), (k % 256).cast("string"),
                           F.lit("."), (c % 256).cast("string")))
            .otherwise(F.concat(F.lit("site"), (k % 50).cast("string"),
                                F.lit(".example.com"))))
    d = _t(spark, sf_dir, "orders").select(k.alias("url_id"),
                                           host.alias("host"))
    is_ip = F.col("host").rlike("^[0-9]{1,3}(\\.[0-9]{1,3}){3}$")
    oct_ = [F.when(is_ip, F.split("host", "\\.").getItem(i)
                   .cast("int")) for i in range(4)]
    cls = (F.when(F.col("host") == "169.254.169.254", "metadata")
           .when(is_ip & (oct_[0] == 127), "loopback")
           .when(is_ip & (oct_[0] == 10), "private_10")
           .when(is_ip & (oct_[0] == 172)
                 & oct_[1].between(16, 31), "private_172")
           .when(is_ip & (oct_[0] == 192) & (oct_[1] == 168),
                 "private_192")
           .when(is_ip & (oct_[0] == 169) & (oct_[1] == 254),
                 "link_local")
           .when(F.col("host") == "localhost", "localhost")
           .otherwise("public"))
    return d.select("url_id", "host", cls.alias("cls"),
                    (cls == "public").cast("int").alias("allowed"))


ORACLE_HOST_SSRF_GUARD = """
WITH d AS (
  SELECT o_orderkey AS url_id,
         CASE o_orderkey % 9
           WHEN 0 THEN '127.0.0.1'
           WHEN 1 THEN '10.' || (o_custkey % 256) || '.'
                       || (o_orderkey % 256) || '.7'
           WHEN 2 THEN '192.168.' || (o_orderkey % 256) || '.9'
           WHEN 3 THEN '172.' || (16 + o_orderkey % 16) || '.0.'
                       || (o_custkey % 256)
           WHEN 4 THEN '169.254.169.254'
           WHEN 5 THEN '169.254.' || (o_orderkey % 169) || '.1'
           WHEN 6 THEN 'localhost'
           WHEN 7 THEN '93.184.' || (o_orderkey % 256) || '.'
                       || (o_custkey % 256)
           ELSE 'site' || (o_orderkey % 50) || '.example.com'
         END AS host
  FROM orders),
p AS (
  SELECT url_id, host,
         regexp_matches(host, '^[0-9]{1,3}(\\.[0-9]{1,3}){3}$') AS is_ip,
         CASE WHEN regexp_matches(host, '^[0-9]{1,3}(\\.[0-9]{1,3}){3}$')
              THEN CAST(string_split(host, '.')[1] AS INT) END AS o0,
         CASE WHEN regexp_matches(host, '^[0-9]{1,3}(\\.[0-9]{1,3}){3}$')
              THEN CAST(string_split(host, '.')[2] AS INT) END AS o1
  FROM d),
c AS (
  SELECT url_id, host,
         CASE
           WHEN host = '169.254.169.254' THEN 'metadata'
           WHEN is_ip AND o0 = 127 THEN 'loopback'
           WHEN is_ip AND o0 = 10 THEN 'private_10'
           WHEN is_ip AND o0 = 172 AND o1 BETWEEN 16 AND 31
             THEN 'private_172'
           WHEN is_ip AND o0 = 192 AND o1 = 168 THEN 'private_192'
           WHEN is_ip AND o0 = 169 AND o1 = 254 THEN 'link_local'
           WHEN host = 'localhost' THEN 'localhost'
           ELSE 'public'
         END AS cls
  FROM p)
SELECT url_id, host, cls,
       CAST(CASE WHEN cls = 'public' THEN 1 ELSE 0 END AS INT)
         AS allowed
FROM c
"""


def q_host_shard_family(spark, sf_dir):
    """Numeric-shard hostname family detection: CDNs and large sites
    shard assets across img1..img12.cdn.example-style hostnames; a
    politeness scheduler that treats them as 12 independent hosts
    over-fetches the ORIGIN 12x, and a URL-seen set keyed on host
    misses cross-shard aliases. Family key = first label with digit
    runs collapsed to '#' + the unchanged parent domain; families with
    >= 3 member hosts are flagged as shard families (the per-origin
    politeness unit).

    Plan/scale: pure-map family key -> (family, host) distinct ->
    family census agg; no joins, no windows over raw URLs."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    host = (F.when(c % 3 == 0,
                   F.concat(F.lit("img"), (k % 12).cast("string"),
                            F.lit(".cdn"), (c % 5).cast("string"),
                            F.lit(".example")))
            .when(c % 3 == 1,
                  F.concat(F.lit("static.site"), (c % 40).cast("string"),
                           F.lit(".com")))
            .otherwise(F.concat(F.lit("www"), (k % 3).cast("string"),
                                F.lit(".host"), (c % 20).cast("string"),
                                F.lit(".net"))))
    hosts = (_t(spark, sf_dir, "orders").select(host.alias("host"))
             .groupBy("host").agg(F.count(F.lit(1)).cast("long")
                                  .alias("n_urls")))
    first = F.substring_index("host", ".", 1)
    rest = F.expr("substr(host, length(substring_index(host, '.', 1)) "
                  "+ 1)")
    fam = F.concat(F.regexp_replace(first, "[0-9]+", "#"), rest)
    per_fam = (hosts.withColumn("family", fam)
               .groupBy("family")
               .agg(F.count(F.lit(1)).cast("long").alias("n_hosts"),
                    F.sum("n_urls").cast("long").alias("n_urls")))
    return per_fam.select(
        "family", "n_hosts", "n_urls",
        (F.col("n_hosts") >= 3).cast("int").alias("is_shard_family"))


ORACLE_HOST_SHARD_FAMILY = """
WITH hosts AS (
  SELECT CASE o_custkey % 3
           WHEN 0 THEN 'img' || (o_orderkey % 12) || '.cdn'
                       || (o_custkey % 5) || '.example'
           WHEN 1 THEN 'static.site' || (o_custkey % 40) || '.com'
           ELSE 'www' || (o_orderkey % 3) || '.host'
                || (o_custkey % 20) || '.net'
         END AS host
  FROM orders),
hu AS (SELECT host, CAST(count(*) AS BIGINT) AS n_urls
       FROM hosts GROUP BY host),
fam AS (
  SELECT regexp_replace(string_split(host, '.')[1], '[0-9]+', '#', 'g')
           || substr(host, length(string_split(host, '.')[1]) + 1)
           AS family,
         n_urls
  FROM hu)
SELECT family, CAST(count(*) AS BIGINT) AS n_hosts,
       CAST(sum(n_urls) AS BIGINT) AS n_urls,
       CAST(CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS INT)
         AS is_shard_family
FROM fam GROUP BY family
"""


# ---------------------------------------------------------------------------
# block 61: typosquat host pairs, traffic seasonality, soft-404 detection
# ---------------------------------------------------------------------------


def q_host_typosquat(spark, sf_dir):
    """Typosquat / lookalike hostname detection — edit-distance-1
    neighbors of high-traffic hosts with a strong traffic asymmetry
    (the phishing-infrastructure sweep a crawler runs over its own
    host census: 'brnd3.com' sitting one deletion away from a popular
    'brand3.com' with 1/10th the URLs is a squat candidate, while
    'brand3.com' vs 'brand7.com' — symmetric traffic — is just a
    brand family). Candidate pairs come from a PREFIX BLOCK
    (first-2-chars + |len diff| <= 1, the standard blocking key for
    edit-distance-1 since one edit can't change both of the first two
    characters... it can change one, but squats that mangle the first
    char are caught by the length block in a second pass at prod;
    documented recall bound), then exact levenshtein()==1 on the
    blocked pairs and victim_urls >= 5 * squat_urls directionality.

    Exactness: levenshtein is integer in both engines; the asymmetry
    ratio is exact integer DIV ppm.

    Plan/scale: the self-join runs on the HOST CENSUS (|hosts| rows,
    never |urls|), blocked so each comparison group is tiny; at web
    scale this is a census-table merge join keyed on the block key."""
    k = F.col("o_orderkey")
    m, b = k % 50, k % 10
    d = (k / 50).cast("long") % 10  # digit decoupled from m and b
    host = (F.when(m < 30, F.concat(F.lit("brand"), b.cast("string"),
                                    F.lit(".com")))
            .when(m < 33, F.concat(F.lit("brnd"), d.cast("string"),
                                   F.lit(".com")))
            .when(m < 35, F.concat(F.lit("brandd"), d.cast("string"),
                                   F.lit(".com")))
            .otherwise(F.concat(F.lit("site"), (k % 20).cast("string"),
                                F.lit(".example"))))
    census = (_t(spark, sf_dir, "orders").select(host.alias("host"))
              .groupBy("host")
              .agg(F.count(F.lit(1)).cast("long").alias("n_urls"))
              .withColumn("blk", F.substring("host", 1, 2)))
    a = census.select(F.col("host").alias("victim_host"),
                      F.col("n_urls").alias("victim_urls"), "blk")
    s = census.select(F.col("host").alias("squat_host"),
                      F.col("n_urls").alias("squat_urls"), "blk")
    pairs = (a.join(s, "blk")
             .filter((F.col("victim_host") != F.col("squat_host"))
                     & (F.abs(F.length("victim_host")
                              - F.length("squat_host")) <= 1)
                     & (F.levenshtein("victim_host", "squat_host") == 1)
                     & (F.col("victim_urls") >= 5 * F.col("squat_urls"))
                     & (F.col("victim_urls") >= 20)))
    return pairs.select(
        "squat_host", "victim_host", "squat_urls", "victim_urls",
        F.expr("victim_urls * 1000000 DIV squat_urls").cast("long")
        .alias("asym_ppm"))


ORACLE_HOST_TYPOSQUAT = """
WITH u AS (
  SELECT CASE
           WHEN o_orderkey % 50 < 30
             THEN 'brand' || (o_orderkey % 10) || '.com'
           WHEN o_orderkey % 50 < 33
             THEN 'brnd' || ((o_orderkey // 50) % 10) || '.com'
           WHEN o_orderkey % 50 < 35
             THEN 'brandd' || ((o_orderkey // 50) % 10) || '.com'
           ELSE 'site' || (o_orderkey % 20) || '.example'
         END AS host
  FROM orders),
census AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_urls,
         substr(host, 1, 2) AS blk
  FROM u GROUP BY host)
SELECT s.host AS squat_host, a.host AS victim_host,
       s.n_urls AS squat_urls, a.n_urls AS victim_urls,
       CAST(a.n_urls * 1000000 // s.n_urls AS BIGINT) AS asym_ppm
FROM census a JOIN census s USING (blk)
WHERE a.host <> s.host
  AND abs(length(a.host) - length(s.host)) <= 1
  AND levenshtein(a.host, s.host) = 1
  AND a.n_urls >= 5 * s.n_urls
  AND a.n_urls >= 20
"""


def q_events_seasonality(spark, sf_dir):
    """Hour-of-day x day-of-week traffic seasonality profile — the
    capacity-planning / anomaly-baseline table every crawl or event
    pipeline keeps (recrawl schedulers align to the trough hours;
    anomaly detectors score against the (dow, hour) baseline, not the
    global mean). Both day-of-week and hour derive from integer EPOCH
    arithmetic — dow = (days + 3) % 7 with 0 = Monday (1970-01-01 was
    a Thursday = 3) — sidestepping the engines' conflicting dayofweek
    conventions entirely.

    Exactness: counts are exact; shares are exact integer DIV ppm;
    the per-dow peak hour tie-breaks on earliest hour.

    Plan/scale: ONE map-side-combinable census agg over the event
    stream into at most 168 cells; the peak window runs over the
    168-row census."""
    ev = _t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("ep"))
    cells = (ev.select(
        (((F.col("ep") / 86400).cast("long") + 3) % 7).alias("dow"),
        ((F.col("ep") % 86400) / 3600).cast("long").alias("hour"))
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    w_dow = Window.partitionBy("dow")
    r = Window.partitionBy("dow").orderBy(F.col("n_events").desc(),
                                          F.col("hour").asc())
    return (cells
            .withColumn("total", F.sum("n_events").over(w_all))
            .withColumn("dow_total", F.sum("n_events").over(w_dow))
            .withColumn("share_ppm", F.expr(
                "n_events * 1000000 DIV total").cast("long"))
            .withColumn("dow_share_ppm", F.expr(
                "n_events * 1000000 DIV dow_total").cast("long"))
            .withColumn("is_peak",
                        (F.row_number().over(r) == 1).cast("int"))
            .select("dow", "hour", "n_events", "share_ppm",
                    "dow_share_ppm", "is_peak"))


ORACLE_EVENTS_SEASONALITY = """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
cells AS (
  SELECT ((ep // 86400) + 3) % 7 AS dow,
         (ep % 86400) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1, 2),
x AS (
  SELECT dow, hour, n_events,
         sum(n_events) OVER () AS total,
         sum(n_events) OVER (PARTITION BY dow) AS dow_total,
         row_number() OVER (PARTITION BY dow
                            ORDER BY n_events DESC, hour ASC) AS rk
  FROM cells)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       n_events,
       CAST(n_events * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(n_events * 1000000 // dow_total AS BIGINT) AS dow_share_ppm,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INT) AS is_peak
FROM x
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


def q_events_gini(spark, sf_dir):
    """Traffic-concentration audit — exact Gini coefficient of the
    per-user event-count distribution plus the top-decile share (the
    'is this log a few bots or a real population' check that gates
    training-on-behavioral-data, and the skew early-warning for any
    user-keyed shuffle: Gini -> 1 means one hot key owns the stage).
    Gini = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over counts
    sorted ascending; ties are order-insensitive for the Gini sum
    (equal x swap freely), and the top-decile cut uses a full
    (count DESC, user_id) tie-break so both engines cut identically.

    Exactness: every term is an exact integer; ppm via integer DIV.

    Plan/scale: ONE user census agg (map-side combinable), then the
    rank windows run over the |users| census, never the event stream;
    at 10^9 users the sort is a range-partitioned rank."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    census = (ev.groupBy("user_id")
              .agg(F.count(F.lit(1)).cast("long").alias("x")))
    w_asc = Window.orderBy(F.col("x").asc(), F.col("user_id").asc())
    w_desc = Window.orderBy(F.col("x").desc(), F.col("user_id").asc())
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    ranked = (census
              .withColumn("i", F.row_number().over(w_asc).cast("long"))
              .withColumn("r", F.row_number().over(w_desc).cast("long"))
              .withColumn("n", F.count(F.lit(1)).over(w_all).cast("long")))
    return (ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("s_ix"),
        F.sum(F.when(F.col("r") <= F.greatest(
            F.lit(1).cast("long"), F.expr("n DIV 10")), F.col("x"))
            .otherwise(F.lit(0))).cast("long").alias("top_decile_events"))
        .select("n_users", "total_events",
                F.expr("(2 * s_ix - (n_users + 1) * total_events) "
                       "* 1000000 DIV (n_users * total_events)")
                .cast("long").alias("gini_ppm"),
                F.expr("top_decile_events * 1000000 DIV total_events")
                .cast("long").alias("top_decile_ppm")))


ORACLE_EVENTS_GINI = """
WITH census AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY user_id),
ranked AS (
  SELECT x,
         row_number() OVER (ORDER BY x ASC, user_id ASC) AS i,
         row_number() OVER (ORDER BY x DESC, user_id ASC) AS r,
         count(*) OVER () AS n
  FROM census),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS total_events,
         CAST(sum(i * x) AS BIGINT) AS s_ix,
         CAST(sum(CASE WHEN r <= greatest(1, n // 10) THEN x ELSE 0 END)
              AS BIGINT) AS top_decile_events
  FROM ranked)
SELECT n_users, total_events,
       CAST((2 * s_ix - (n_users + 1) * total_events) * 1000000
            // (n_users * total_events) AS BIGINT) AS gini_ppm,
       CAST(top_decile_events * 1000000 // total_events AS BIGINT)
         AS top_decile_ppm
FROM agg
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


def q_corpus_length_buckets(spark, sf_dir):
    """Padding-waste accounting for batched training — the measured
    case for length-bucketed batching: form fixed-size batches of 32
    docs two ways (NAIVE: arrival order by doc_id; BUCKETED: sorted by
    token length) and account padded tokens exactly — every doc pads
    to its batch max, so waste = n_docs*batch_max - sum(tokens). The
    standard result (bucketing cuts pad waste several-fold) falls out
    of the numbers instead of being asserted.

    Exactness: whitespace token counts (the text_token_count parity
    formula), integer waste, ppm by integer DIV; batch assignment uses
    full deterministic tie-breaks (doc_id) on both engines.

    Plan/scale: the global row_number is the demo form at driver SF;
    the scale path for rank-then-chunk is pack.py's proven
    hierarchical prefix decomposition (shard sums -> tiny prefix
    window -> broadcast base offsets), identical math."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.size(F.split("text", " ")).cast("long").alias("n_tok")))
    w_naive = Window.orderBy(F.col("doc_id").asc())
    w_buck = Window.orderBy(F.col("n_tok").asc(), F.col("doc_id").asc())

    def batches(df, w, tag):
        return (df
                .withColumn("rk", F.row_number().over(w).cast("long"))
                .withColumn("batch_id", F.expr("(rk - 1) DIV 32")
                            .cast("long"))
                .groupBy("batch_id")
                .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                     F.max("n_tok").cast("long").alias("batch_max"),
                     F.sum("n_tok").cast("long").alias("real_tokens"))
                .select(F.lit(tag).alias("strategy"), "batch_id",
                        "n_docs", "batch_max", "real_tokens",
                        (F.col("n_docs") * F.col("batch_max"))
                        .alias("padded_tokens"))
                .withColumn("waste_ppm", F.expr(
                    "(padded_tokens - real_tokens) * 1000000 "
                    "DIV padded_tokens").cast("long")))

    return batches(d, w_naive, "naive").unionByName(
        batches(d, w_buck, "bucketed"))


ORACLE_CORPUS_LENGTH_BUCKETS = """
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents WHERE text IS NOT NULL),
r AS (
  SELECT doc_id, n_tok,
         row_number() OVER (ORDER BY doc_id ASC) AS rk_n,
         row_number() OVER (ORDER BY n_tok ASC, doc_id ASC) AS rk_b
  FROM d),
u AS (
  SELECT 'naive' AS strategy, (rk_n - 1) // 32 AS batch_id, n_tok FROM r
  UNION ALL
  SELECT 'bucketed', (rk_b - 1) // 32, n_tok FROM r),
agg AS (
  SELECT strategy, CAST(batch_id AS BIGINT) AS batch_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(max(n_tok) AS BIGINT) AS batch_max,
         CAST(sum(n_tok) AS BIGINT) AS real_tokens
  FROM u GROUP BY 1, 2)
SELECT strategy, batch_id, n_docs, batch_max, real_tokens,
       n_docs * batch_max AS padded_tokens,
       CAST((n_docs * batch_max - real_tokens) * 1000000
            // (n_docs * batch_max) AS BIGINT) AS waste_ppm
FROM agg
"""


def q_events_dau_mau(spark, sf_dir):
    """DAU / trailing-28-day-MAU stickiness — the engagement ratio
    behind every activity dashboard, computed EXACTLY at scale: the
    sliding-window distinct-user count is NOT a windowed agg (distinct
    doesn't merge) — instead each user's active days become coverage
    intervals [day, day+27], overlapping intervals merge per user (the
    lag + running-sum island pattern), and merged intervals explode
    into covered days. Intervals are disjoint after the merge, so a
    plain count per day IS the exact distinct count.

    Exactness: integer epoch-day arithmetic end to end; stickiness is
    exact integer DIV ppm.

    Plan/scale: the explode is bounded by 28 x islands (never
    |users| x |days|); per-user windows shuffle the (user, day) census
    once; at 10^9 users the census is the only wide exchange."""
    ud = (_t(spark, sf_dir, "events")
          .select(F.expr("unix_timestamp(ts) DIV 86400").cast("long")
                  .alias("day"), "user_id")
          .distinct())
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long")
                                .alias("n_dau"))
    w = Window.partitionBy("user_id").orderBy("day")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    iv = (ud
          .withColumn("_pd", F.lag("day").over(w))
          .withColumn("_new", (F.col("_pd").isNull()
                               | (F.col("day") > F.col("_pd") + 27))
                      .cast("int"))
          .withColumn("_g", F.sum("_new").over(wsum))
          .groupBy("user_id", "_g")
          .agg(F.min("day").alias("s"),
               (F.max("day") + 27).alias("e")))
    mau = (iv.select("user_id",
                     F.explode(F.sequence("s", "e")).alias("day"))
           .groupBy("day").agg(F.count(F.lit(1)).cast("long")
                               .alias("n_mau28")))
    return (dau.join(mau, "day")
            .select("day", "n_dau", "n_mau28",
                    F.expr("n_dau * 1000000 DIV n_mau28").cast("long")
                    .alias("stickiness_ppm")))


ORACLE_EVENTS_DAU_MAU = """
WITH ud AS (
  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                  user_id
  FROM events),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_dau FROM ud GROUP BY day),
l AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS pd
  FROM ud),
g AS (
  SELECT user_id, day,
         sum(CASE WHEN pd IS NULL OR day > pd + 27 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM l),
iv AS (
  SELECT user_id, grp, min(day) AS s, max(day) + 27 AS e
  FROM g GROUP BY 1, 2),
cover AS (
  SELECT user_id, unnest(generate_series(s, e)) AS day FROM iv),
mau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_mau28 FROM cover GROUP BY day)
SELECT CAST(d.day AS BIGINT) AS day, d.n_dau, m.n_mau28,
       CAST(d.n_dau * 1000000 // m.n_mau28 AS BIGINT) AS stickiness_ppm
FROM dau d JOIN mau m USING (day)
"""


def q_ann_nndescent_step(spark, sf_dir):
    """One NN-Descent refinement round (Dong et al., WWW 2011) — the
    k-NN-GRAPH construction step behind graph-based ANN indexes
    (HNSW/NSG build pipelines): starting from a cheap deterministic
    initial graph (each vector's 4 successors by vec_id — the stand-in
    for an LSH-bucket bootstrap), candidates(v) = neighbors union
    neighbors-of-neighbors, scored by EXACT cosine, keep top-4. The
    local-join principle is the whole point at 10^10 vectors: each
    round compares only k + k^2 candidates per node (two edge-keyed
    equi-joins), never all pairs, and each round monotonically
    improves the graph.

    Exactness: cosine in float64 rounded to 6 dp BEFORE ranking (the
    module's fold-order convention), full (sim DESC, neighbor ASC)
    tie-break; the simplified variant here (forward-of-forward, no
    reverse edges) is documented — full NN-descent adds the reversed
    edge list to the same join, same shape.

    Plan/scale: edge-list self-join + one vector join per side; the
    rank window partitions by node. Nothing is ever all-pairs."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    ids = emb.select("vec_id")
    e0 = (ids.select(F.col("vec_id").alias("v_id"),
                     F.explode(F.sequence(F.lit(1), F.lit(4)))
                     .alias("_j"))
          .select("v_id", (F.col("v_id") + F.col("_j")).alias("u_id"))
          .join(ids.select(F.col("vec_id").alias("u_id")), "u_id"))
    hop2 = (e0.alias("a")
            .join(e0.alias("b"), F.col("a.u_id") == F.col("b.v_id"))
            .select(F.col("a.v_id").alias("v_id"),
                    F.col("b.u_id").alias("u_id"))
            .filter(F.col("v_id") != F.col("u_id")))
    cand = e0.select("v_id", "u_id").unionByName(hop2).distinct()
    scored = (cand
              .join(emb.select(F.col("vec_id").alias("v_id"),
                               F.col("v").alias("va")), "v_id")
              .join(emb.select(F.col("vec_id").alias("u_id"),
                               F.col("v").alias("vb")), "u_id")
              .select("v_id", "u_id",
                      F.round(SIM.cosine_expr(F.col("va"), F.col("vb")), 6)
                      .alias("sim")))
    w = Window.partitionBy("v_id").orderBy(F.desc("sim"), F.asc("u_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 4)
            .select(F.col("v_id").alias("vec_id"),
                    F.col("u_id").alias("neighbor_id"), "rank", "sim"))


ORACLE_ANN_NNDESCENT = """
WITH e0 AS (
  SELECT a.vec_id AS v_id, b.vec_id AS u_id
  FROM embeddings a JOIN embeddings b
    ON b.vec_id - a.vec_id BETWEEN 1 AND 4),
cand AS (
  SELECT v_id, u_id FROM e0
  UNION
  SELECT e1.v_id, e2.u_id
  FROM e0 e1 JOIN e0 e2 ON e2.v_id = e1.u_id
  WHERE e2.u_id <> e1.v_id),
sc AS (
  SELECT c.v_id, c.u_id,
         round(
           list_sum(list_transform(range(64),
             i -> a.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
           / (sqrt(list_sum(list_transform(range(64),
                i -> a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)))
              * sqrt(list_sum(list_transform(range(64),
                i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)))),
           6) AS sim
  FROM cand c
  JOIN embeddings a ON a.vec_id = c.v_id
  JOIN embeddings b ON b.vec_id = c.u_id),
rk AS (
  SELECT v_id, u_id, sim,
         row_number() OVER (PARTITION BY v_id
                            ORDER BY sim DESC, u_id ASC) AS rank
  FROM sc)
SELECT v_id AS vec_id, u_id AS neighbor_id, CAST(rank AS INT) AS rank, sim
FROM rk WHERE rank <= 4
"""


def q_embeddings_centroid_drift(spark, sf_dir):
    """Lloyd-iteration convergence telemetry — per-cell centroid DRIFT
    after one KMeans step (embeddings_kmeans_step produces the new
    means; this row measures how far they moved from the current
    centroids): squared L2 movement and max component move per cell,
    the numbers a training loop watches to decide when the coarse
    quantizer behind ivf_topk / dedup_semantic has converged.

    Exactness: means use the kmeans row's proven round(avg, 4)
    convention, then BOTH engines quantize means and centroid
    literals to integer 1e-4 units — drift sums are exact integers
    (1e-8 units for the square), immune to fold order.

    Plan/scale: assignment is literal-arithmetic codegen; the drift
    join runs on the (cells x dim) mean table — 512 rows here,
    O(cells x dim) always — never on vectors."""
    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    emb = _t(spark, sf_dir, "embeddings")
    assigned = emb.select(
        SIM.assign_cell_expr(
            F.transform("embedding", lambda x: x.cast("double")),
            cents).alias("cell"),
        F.posexplode("embedding").alias("pos", "x"))
    means = (assigned.groupBy("cell", "pos")
             .agg(F.round(F.avg(F.col("x").cast("double")), 4)
                  .alias("m"),
                  F.count("*").alias("n_members")))
    c0 = spark.createDataFrame(
        [(c, i, int(round(v * 10000)))
         for c, vec in enumerate(cents) for i, v in enumerate(vec)],
        "cell int, pos int, c0q long")
    q = (means
         .withColumn("mq", F.expr("CAST(floor(m * 10000 + 0.5) AS BIGINT)"))
         .join(c0, ["cell", "pos"]))
    return (q.groupBy("cell")
            .agg(F.max("n_members").cast("long").alias("n_members"),
                 F.sum((F.col("mq") - F.col("c0q"))
                       * (F.col("mq") - F.col("c0q")))
                 .cast("long").alias("drift_sq_e8"),
                 F.max(F.abs(F.col("mq") - F.col("c0q")))
                 .cast("long").alias("max_move_e4")))


def _centroid_drift_oracle() -> str:
    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    c0_values = ",\n   ".join(
        f"({c}, {i}, {int(round(v * 10000))})"
        for c, vec in enumerate(cents) for i, v in enumerate(vec))
    base = _kmeans_oracle()
    # reuse the verified kmeans-mean CTE chain verbatim, then bolt the
    # drift join on top (anti-drift convention: shared fragment, not a
    # re-derivation)
    inner = base.strip().removeprefix("WITH ")
    prefix = inner.split('SELECT cell,')[0].rstrip()
    return f"""
WITH {prefix},
means AS (
  SELECT cell, CAST(pos0 AS INT) AS pos,
         round(avg(embedding[pos0 + 1]::DOUBLE), 4) AS m,
         count(*) AS n_members
  FROM px GROUP BY cell, pos0),
c0(cell, pos, c0q) AS (VALUES
   {c0_values}),
j AS (
  SELECT means.cell, means.n_members,
         CAST(floor(m * 10000 + 0.5) AS BIGINT) AS mq, c0.c0q
  FROM means JOIN c0 ON c0.cell = means.cell AND c0.pos = means.pos)
SELECT cell, CAST(max(n_members) AS BIGINT) AS n_members,
       CAST(sum((mq - c0q) * (mq - c0q)) AS BIGINT) AS drift_sq_e8,
       CAST(max(abs(mq - c0q)) AS BIGINT) AS max_move_e4
FROM j GROUP BY cell
"""


ORACLE_EMBEDDINGS_CENTROID_DRIFT = _centroid_drift_oracle()


def q_frontier_seed_sources(spark, sf_dir):
    """Multi-source seed merge — the frontier FEEDER composition: three
    real seed channels (sitemap XML via sources/sitemap.parse_sitemap,
    RSS feeds via sources/feeds.parse_feed, I2P addressbook via
    sources/i2p.addressbook_seeds) each synthesized in codegen, parsed
    by their REAL parsers, tagged with provenance and a source-level
    prior (sitemap's declared priority; 0.5 feed default; 0.3
    addressbook), then deduped by URL keeping the best prior and the
    sorted provenance set. Sitemap and feed universes overlap by
    construction, so the dedupe branch is exercised; addressbook seeds
    are disjoint (different network). A value-hash match proves all
    three parsers AND the merge in one row.

    Plan/scale: each channel is an independent parse explode; the
    merge is ONE groupBy on url carrying (url, source, prior) — seeds
    are KB-to-MB scale inputs, never the 10^10 frontier."""
    from genesis_spark.sources.feeds import parse_feed
    from genesis_spark.sources.i2p import addressbook_seeds
    from genesis_spark.sources.sitemap import parse_sitemap

    k = F.col("o_orderkey")
    d3 = F.expr("o_orderkey DIV 3")
    url = F.concat(F.lit("http://h"), (d3 % 12).cast("string"),
                   F.lit(".onion/s"), (d3 % 60).cast("string"))
    orders = _t(spark, sf_dir, "orders")

    sm_block = F.concat(F.lit("<url><loc>"), url, F.lit("</loc><priority>0."),
                        (d3 % 10).cast("string"), F.lit("</priority></url>"))
    sm = (orders.filter(k % 3 == 0)
          .select(sm_block.alias("b"))
          .agg(F.concat_ws("", F.array_sort(F.collect_list("b")))
               .alias("content")))
    sm_seeds = parse_sitemap(sm, "content").select(
        F.col("loc").alias("url"), F.lit("sitemap").alias("src"),
        F.col("priority").alias("prior"))

    fd_block = F.concat(F.lit("<item><link>"), url,
                        F.lit("</link><pubDate>2024-01-0"),
                        ((k % 9) + 1).cast("string"),
                        F.lit("</pubDate></item>"))
    fd = (orders.filter(k % 3 == 1)
          .select(fd_block.alias("b"))
          .agg(F.concat_ws("", F.array_sort(F.collect_list("b")))
               .alias("content")))
    fd_seeds = parse_feed(fd, "content").select(
        "url", F.lit("feed").alias("src"), F.lit(0.5).alias("prior"))

    ab_line = F.concat(F.lit("h"), (d3 % 12).cast("string"), F.lit("x"),
                       (d3 % 60).cast("string"), F.lit(".i2p=dest"),
                       k.cast("string"))
    ab = (orders.filter(k % 3 == 2)
          .select(ab_line.alias("b"))
          .agg(F.concat_ws("\n", F.array_sort(F.collect_list("b")))
               .alias("content"))
          .select(F.concat(F.lit("# addressbook\n"), F.col("content"))
                  .alias("content")))
    ab_seeds = addressbook_seeds(ab).select(
        "url", F.lit("addressbook").alias("src"),
        F.lit(0.3).alias("prior"))

    allseeds = (sm_seeds.unionByName(fd_seeds).unionByName(ab_seeds)
                .select("url", "src", "prior").distinct())
    return (allseeds.groupBy("url")
            .agg(F.max("prior").alias("best_prior"),
                 F.concat_ws(",", F.array_sort(F.collect_set("src")))
                 .alias("sources"),
                 F.countDistinct("src").cast("long").alias("n_sources")))


ORACLE_FRONTIER_SEED_SOURCES = """
WITH sm AS (
  SELECT DISTINCT
         'http://h' || ((o_orderkey // 3) % 12) || '.onion/s'
           || ((o_orderkey // 3) % 60) AS url,
         'sitemap' AS src,
         CAST('0.' || ((o_orderkey // 3) % 10) AS DOUBLE) AS prior
  FROM orders WHERE o_orderkey % 3 = 0),
fd AS (
  SELECT DISTINCT
         'http://h' || ((o_orderkey // 3) % 12) || '.onion/s'
           || ((o_orderkey // 3) % 60) AS url,
         'feed' AS src, 0.5::DOUBLE AS prior
  FROM orders WHERE o_orderkey % 3 = 1),
ab AS (
  SELECT DISTINCT
         'http://h' || ((o_orderkey // 3) % 12) || 'x'
           || ((o_orderkey // 3) % 60) || '.i2p' AS url,
         'addressbook' AS src, 0.3::DOUBLE AS prior
  FROM orders WHERE o_orderkey % 3 = 2),
u AS (
  SELECT * FROM sm UNION SELECT * FROM fd UNION SELECT * FROM ab)
SELECT url, max(prior) AS best_prior,
       string_agg(DISTINCT src, ',' ORDER BY src) AS sources,
       CAST(count(DISTINCT src) AS BIGINT) AS n_sources
FROM u GROUP BY url
"""


def q_stream_histogram(spark, sf_dir):
    """The 9th streaming capability: stateful mergeable HISTOGRAM-
    SKETCH maintenance — the live twin of the batch hist_bins sketch
    (events_quantile_sketch): per event_type the state store holds ONE
    fixed 32-bin count array, each micro-batch bins its values and
    adds in, emissions are cumulative non-empty bins. Replayed as 4
    micro-batches; per-(key, bin) emissions are monotone, so
    max-per-(key, bin) recovers the exact final histogram regardless
    of batching — which must equal the batch GROUP BY binning
    bit-for-bit (the oracle). At production cadence this is the
    p50/p95 feed for live fetch-latency dashboards with O(keys x 32)
    state."""
    import os
    import tempfile

    from genesis_spark.streaming.pipeline import hist_stream

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_hist_{_STREAM_SEQ}"
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    tmp = tempfile.mkdtemp(prefix="gs_streamhist_")
    src, ck = os.path.join(tmp, "ev"), os.path.join(tmp, "ckpt")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("event_type string, value double")
              .option("maxFilesPerTrigger", 1).format("parquet").load(src))
    q = (hist_stream(stream, lo=0.0, hi=512.0, n_bins=32)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name).groupBy("event_type", "bin")
            .agg(F.max("cnt_cum").cast("long").alias("cnt")))


ORACLE_STREAM_HISTOGRAM = """
SELECT event_type,
       CAST(least(31, greatest(0, CAST(floor(value / 16.0) AS BIGINT)))
            AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS cnt
FROM events
WHERE value IS NOT NULL
GROUP BY 1, 2
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


def q_corpus_dedup_threshold_curve(spark, sf_dir):
    """Dedup yield-vs-threshold calibration — the table that answers
    'where do we SET the near-dup threshold?': exact capped-shingle
    jaccard pairs (the dedup_ngram_jaccard kernel at a low 0.5 floor)
    bucketed into 0.1-wide similarity bands, with pair count and the
    number of distinct documents touched per band. Moving the
    production threshold one band down is then a read-off, not a
    re-run. Complements dedup_minhash_eval (which grades the
    ESTIMATOR; this row profiles the TRUTH distribution).

    Exactness: jaccard uses the base row's proven round(x, 4)
    convention — identical doubles on both engines — so the band
    floor makes the same call; counts are exact.

    Plan/scale: same df-capped shingle self-join as the base row
    (fan-out bounded at max_df^2 per shingle, never all-pairs); the
    banding is a census over the pair table."""
    pairs = D.ngram_jaccard_pairs(_corpus(spark, sf_dir), threshold=0.5,
                                  max_df=_NGRAM_MAX_DF)
    banded = pairs.withColumn(
        "band", F.least(F.lit(9), F.floor(F.col("jaccard") * 10))
        .cast("int"))
    n_pairs = (banded.groupBy("band")
               .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))
    n_docs = (banded
              .select("band", F.explode(F.array("doc_a", "doc_b"))
                      .alias("doc_id"))
              .groupBy("band")
              .agg(F.countDistinct("doc_id").cast("long")
                   .alias("n_docs")))
    return n_pairs.join(n_docs, "band")


ORACLE_CORPUS_DEDUP_THRESHOLD_CURVE = f"""
WITH {_CORPUS_SQL},
{_shingle_sql(3)},
dsh0 AS (SELECT DISTINCT doc_id, shingle FROM sh),
keep AS (SELECT shingle FROM dsh0 GROUP BY shingle
         HAVING count(*) <= {_NGRAM_MAX_DF}),
dsh AS (SELECT doc_id, dsh0.shingle FROM dsh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, count(*) AS n FROM dsh GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS n_common
  FROM dsh x JOIN dsh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY 1, 2),
pairs AS (
  SELECT doc_a, doc_b,
         round(n_common / (na.n + nb.n - n_common), 4) AS jaccard
  FROM common
  JOIN sizes na ON na.doc_id = doc_a
  JOIN sizes nb ON nb.doc_id = doc_b
  WHERE round(n_common / (na.n + nb.n - n_common), 4) >= 0.5),
banded AS (
  SELECT doc_a, doc_b,
         CAST(least(9, floor(jaccard * 10)) AS INT) AS band
  FROM pairs),
np AS (SELECT band, CAST(count(*) AS BIGINT) AS n_pairs
       FROM banded GROUP BY band),
nd AS (
  SELECT band, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM (
    SELECT band, doc_a AS doc_id FROM banded
    UNION ALL
    SELECT band, doc_b FROM banded) GROUP BY band)
SELECT band, n_pairs, n_docs FROM np JOIN nd USING (band)
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


def q_text_lexicon_triage(spark, sf_dir):
    """Policy-lexicon content triage — the text-side analogue of the
    reference's NudeNet image gate (M3, raw/parsers nudity model):
    token-EXACT matching of each document against a broadcastable
    policy term list (here a 3-term embedded lexicon; production
    broadcasts the full list exactly like the T9 dictionary), with a
    per-doc hit count, hit density, and a two-condition flag
    (absolute count OR density) — the cheap first-pass filter that
    routes documents to the expensive model.

    Exactness: token-exact `IN` matching over the split tokens (never
    substring — 'duplicate' can't hit 'dup'); density is exact integer
    DIV ppm on the whitespace token count.

    Plan/scale: zero-exchange pure map over the corpus (array filter
    in codegen) — fuses into the scan; the lexicon is a literal (a
    broadcast join for large lists, same plan shape as T9)."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()))
    toks = "split(lower(text), ' ')"
    hits = F.expr(f"size(filter({toks}, t -> t IN ('dup', 'slow', "
                  f"'spill')))").cast("long")
    n_tok = F.expr(f"size({toks})").cast("long")
    return (d.select("doc_id", hits.alias("n_hits"),
                     n_tok.alias("n_tokens"))
            .withColumn("density_ppm",
                        F.expr("n_hits * 1000000 DIV n_tokens")
                        .cast("long"))
            .withColumn("flagged",
                        ((F.col("n_hits") >= 3)
                         | (F.col("density_ppm") >= 40000)).cast("int")))


ORACLE_TEXT_LEXICON_TRIAGE = """
WITH d AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split(lower(text), ' '),
              t -> t IN ('dup', 'slow', 'spill'))) AS BIGINT) AS n_hits,
         CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL)
SELECT doc_id, n_hits, n_tokens,
       CAST(n_hits * 1000000 // n_tokens AS BIGINT) AS density_ppm,
       CAST(CASE WHEN n_hits >= 3
                  OR n_hits * 1000000 // n_tokens >= 40000
                 THEN 1 ELSE 0 END AS INT) AS flagged
FROM d
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


def q_ann_recall_vs_nprobe(spark, sf_dir):
    """IVF n_probe tuning sweep — recall@5 of the IVF-flat path at
    n_probe = 1, 2, 3 against the brute-force truth, per query: the
    table that answers 'how many cells must we probe for the recall we
    promised?' before committing a 10^10-vector index config. The
    operational counterpart to corpus_dedup_threshold_curve (threshold
    tuning) and ann_recall_eval (fixed-config grading): recall must be
    NON-DECREASING in n_probe (probing more cells only adds
    candidates), which the unit test pins.

    Plan/scale: the cell-assignment plan is built ONCE per n_probe
    via the same SIM.ivf_topk code path the production row uses;
    truth is brute force over the 10 bounded probe queries; grading
    joins are (query_id, neighbor_id) equi."""
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 10)
    truth = (SIM.cosine_topk(emb, qs, k=5)
             .select("query_id", "neighbor_id"))
    qids = truth.select("query_id").distinct()
    parts = []
    for p in (1, 2, 3):
        approx = SIM.ivf_topk(emb, qs, k=5, n_centroids=_IVF_CENTROIDS,
                              n_probe=p, dim=_IVF_DIM)
        hits = (approx.select("query_id", "neighbor_id")
                .join(truth, ["query_id", "neighbor_id"])
                .groupBy("query_id").agg(F.count("*").alias("n")))
        parts.append(
            qids.join(hits, "query_id", "left")
            .select(F.lit(p).alias("n_probe"), "query_id",
                    F.coalesce("n", F.lit(0)).cast("long")
                    .alias("n_hits"))
            .withColumn("recall", F.round(F.col("n_hits") / 5.0, 4)))
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def _ivf_nprobe_sweep_oracle() -> str:
    cos = """
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
    """
    blocks, selects = [], []
    for p in (1, 2, 3):
        blocks.append(f"""
qp{p} AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM dots WHERE vec_id < 10) WHERE rn <= {p}),
sc{p} AS (
  SELECT pr.query_id, bc.neighbor_id, {cos} AS cos
  FROM qp{p} pr
  JOIN base_cells bc USING (cell)
  JOIN embeddings q ON q.vec_id = pr.query_id
  JOIN embeddings b ON b.vec_id = bc.neighbor_id
  WHERE bc.neighbor_id != pr.query_id),
tp{p} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rnk
    FROM sc{p}) WHERE rnk <= 5),
h{p} AS (
  SELECT t.query_id, count(*) AS n FROM tp{p}
  JOIN truth t USING (query_id, neighbor_id) GROUP BY t.query_id)""")
        selects.append(f"""
SELECT {p} AS n_probe, q.query_id,
       CAST(coalesce(h{p}.n, 0) AS BIGINT) AS n_hits,
       round(coalesce(h{p}.n, 0) / 5.0, 4) AS recall
FROM qids q LEFT JOIN h{p} USING (query_id)""")
    return (f"WITH {_ivf_cells_sql()},\n"
            f"truth AS (SELECT query_id, neighbor_id "
            f"FROM ({ORACLE_ANN_COSINE}) t),\n"
            f"qids AS (SELECT DISTINCT query_id FROM truth),"
            + ",".join(blocks)
            + "\nUNION ALL".join(selects))


ORACLE_ANN_RECALL_VS_NPROBE = _ivf_nprobe_sweep_oracle()


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


def q_spans_fingerprint_dedup(spark, sf_dir):
    """Exact interleaved-document dedup on SPAN-SEQUENCE fingerprints —
    the multimodal twin of dedup_exact: two docs are duplicates iff
    their (kind, text, media ordinal) sequences match element-for-
    element in offset order. The media_ref's doc-identity prefix is
    stripped before hashing (refs embed doc_id; CONTENT equality must
    not depend on identity), so the twin-injected corpus yields real
    duplicate groups. One md5 per doc — the wide span payload never
    shuffles; the groupBy carries 16 bytes/doc.

    Exactness: the serialization uses explicit field separators and
    coalesced NULLs identically on both engines; groups report sorted
    doc_id CSVs (the dedup_exact convention)."""
    from genesis_spark.sources.interleaved import interleaved_docs

    docs = interleaved_docs(_corpus(spark, sf_dir))
    ser = F.md5(F.array_join(F.transform(
        "spans",
        lambda s: F.concat(
            s["kind"], F.lit("|"), F.coalesce(s["text"], F.lit("")),
            F.lit("|"),
            F.coalesce(F.regexp_replace(s["media_ref"], "^[^/]*/", ""),
                       F.lit("")),
            F.lit(";"))), ""))
    fp = docs.select("doc_id", ser.alias("fp"))
    return (fp.groupBy("fp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.array_join(F.array_sort(F.collect_list("doc_id")), ",")
                 .alias("doc_ids_csv"))
            .filter(F.col("n_docs") > 1))


# the spans synthesis replayed over the twin corpus: the SAME shared
# fragment as every other spans oracle, retargeted from documents to
# corpus (anti-drift convention — one synthesis, two bindings)
_SPANS_EX_CORPUS_SQL = _SPANS_EX_SQL.replace(
    "FROM documents WHERE text IS NOT NULL",
    "FROM corpus WHERE text IS NOT NULL")

ORACLE_SPANS_FINGERPRINT_DEDUP = f"""
WITH {_CORPUS_SQL},
{_SPANS_EX_CORPUS_SQL},
ser AS (
  SELECT doc_id,
         md5(string_agg(
           s.kind || '|' || coalesce(s.text, '') || '|'
           || coalesce(regexp_replace(s.media_ref, '^[^/]*/', ''), '')
           || ';', '' ORDER BY off)) AS fp
  FROM ex GROUP BY doc_id)
SELECT fp, CAST(count(*) AS BIGINT) AS n_docs,
       string_agg(doc_id, ',' ORDER BY doc_id) AS doc_ids_csv
FROM ser GROUP BY fp HAVING count(*) > 1
"""


def q_spans_diff(spark, sf_dir):
    """Round-over-round SPAN-level change extraction — the incremental-
    corpus-update primitive for the interleaved payload: re-crawl the
    same docs (round 2 mutates a third of them with an appended tail,
    drops the first word of another third — shifting every chunk — and
    leaves the rest byte-identical), then diff the two span tables at
    (doc_id, offset) via ONE full-outer join with null-safe struct
    comparison. Per-doc change census (same/changed/added/removed) is
    what the recrawl scheduler banks and the corpus updater uses to
    re-process only changed docs.

    Plan/scale: the join is (doc_id, offset)-equi on identically
    partitioned sides; the census is map-side combinable. Hashes of
    span text never leave the join — at 10^10 docs swap text equality
    for digest equality, same plan."""
    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    k = F.col("doc_id")
    text2 = (F.when(k % 3 == 0, F.concat("text", F.lit(" extra tail")))
             .when(k % 3 == 1, F.regexp_replace("text", "^[^ ]+ ", ""))
             .otherwise(F.col("text")))
    r1 = explode_spans(interleaved_docs(d))
    r2 = explode_spans(interleaved_docs(d.select("doc_id",
                                                 text2.alias("text"))))
    a = r1.select("doc_id", "offset", F.col("kind").alias("k1"),
                  F.col("text").alias("t1"),
                  F.col("media_ref").alias("m1"))
    b = r2.select("doc_id", "offset", F.col("kind").alias("k2"),
                  F.col("text").alias("t2"),
                  F.col("media_ref").alias("m2"))
    j = a.join(b, ["doc_id", "offset"], "full_outer")
    cls = (F.when(F.col("k1").isNull(), "added")
           .when(F.col("k2").isNull(), "removed")
           .when(F.col("k1").eqNullSafe(F.col("k2"))
                 & F.col("t1").eqNullSafe(F.col("t2"))
                 & F.col("m1").eqNullSafe(F.col("m2")), "same")
           .otherwise("changed"))
    per_doc = (j.select("doc_id", cls.alias("cls"))
               .groupBy("doc_id")
               .agg(F.sum((F.col("cls") == "same").cast("int"))
                    .cast("long").alias("n_same"),
                    F.sum((F.col("cls") == "changed").cast("int"))
                    .cast("long").alias("n_changed"),
                    F.sum((F.col("cls") == "added").cast("int"))
                    .cast("long").alias("n_added"),
                    F.sum((F.col("cls") == "removed").cast("int"))
                    .cast("long").alias("n_removed")))
    return per_doc.withColumn(
        "status",
        F.when((F.col("n_changed") + F.col("n_added")
                + F.col("n_removed")) == 0, "unchanged")
        .otherwise("changed"))


ORACLE_SPANS_DIFF = f"""
WITH {_SPANS_EX_SQL},
d2 AS (
  SELECT doc_id,
         CASE WHEN CAST(doc_id AS BIGINT) % 3 = 0
                THEN text || ' extra tail'
              WHEN CAST(doc_id AS BIGINT) % 3 = 1
                THEN regexp_replace(text, '^[^ ]+ ', '')
              ELSE text END AS text
  FROM documents WHERE text IS NOT NULL),
base2 AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM d2
), ch2 AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base2
), il2 AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 3 = 0 THEN
        [{{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}},
         {{'kind': 'image', 'text': CAST(NULL AS VARCHAR),
          'media_ref': doc_id || '/img/' || CAST(j // 3 AS VARCHAR)}}]
      ELSE
        [{{'kind': 'section', 'text': c, 'media_ref': CAST(NULL AS VARCHAR)}}]
      END)) AS spans
  FROM ch2
), ex2 AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il2
),
j AS (
  SELECT coalesce(a.doc_id, b.doc_id) AS doc_id,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.s.kind IS NOT DISTINCT FROM b.s.kind
               AND a.s.text IS NOT DISTINCT FROM b.s.text
               AND a.s.media_ref IS NOT DISTINCT FROM b.s.media_ref
                THEN 'same'
              ELSE 'changed' END AS cls
  FROM ex a FULL OUTER JOIN ex2 b
    ON a.doc_id = b.doc_id AND a.off = b.off),
pd AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN cls = 'same' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_same,
         CAST(sum(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_changed,
         CAST(sum(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_added,
         CAST(sum(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_removed
  FROM j GROUP BY doc_id)
SELECT doc_id, n_same, n_changed, n_added, n_removed,
       CASE WHEN n_changed + n_added + n_removed = 0 THEN 'unchanged'
            ELSE 'changed' END AS status
FROM pd
"""


def q_stream_spans_ingest(spark, sf_dir):
    """The 10th streaming capability — stateful INTERLEAVED-DOCUMENT
    reassembly (streaming/pipeline.assemble_stream): the span table
    exploded to rows, shuffled across 4 micro-batch files, and
    reassembled per doc_id in the state store; a doc emits exactly
    once, when all its spans have arrived, with its text rebuilt in
    offset order and its media census. The emission set is invariant
    to micro-batching (completeness gating), so it must equal the
    batch reconstruction bit-for-bit — the streaming ingest form of
    the north-rule payload (axes A+B: streaming x interleaved)."""
    import os
    import tempfile

    from genesis_spark.sources.interleaved import (explode_spans,
                                                   interleaved_docs)
    from genesis_spark.streaming.pipeline import assemble_stream

    global _STREAM_SEQ
    _STREAM_SEQ += 1
    name = f"gs_stream_spans_{_STREAM_SEQ}"
    docs = interleaved_docs(
        _t(spark, sf_dir, "documents").select("doc_id", "text"))
    rows = (explode_spans(docs)
            .join(docs.select("doc_id",
                              F.size("spans").cast("int")
                              .alias("n_spans")), "doc_id"))
    tmp = tempfile.mkdtemp(prefix="gs_streamspans_")
    src, ck = os.path.join(tmp, "spans"), os.path.join(tmp, "ckpt")
    rows.repartition(4).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("doc_id string, offset int, kind string, "
                      "text string, media_ref string, n_spans int")
              .option("maxFilesPerTrigger", 1)
              .format("parquet").load(src))
    q = (assemble_stream(stream)
         .writeStream.format("memory").queryName(name)
         .option("checkpointLocation", ck)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    return (spark.table(name)
            .select("doc_id", F.col("n_spans").cast("long").alias("n_spans"),
                    "text_rt", F.col("n_media").cast("long")
                    .alias("n_media")))


ORACLE_STREAM_SPANS_INGEST = f"""
WITH {_SPANS_EX_SQL}
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       coalesce(array_to_string(
         list(s.text ORDER BY off) FILTER (WHERE s.media_ref IS NULL),
         ' '), '') AS text_rt,
       CAST(sum(CASE WHEN s.media_ref IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_media
FROM ex GROUP BY doc_id
"""


def q_host_sitemap_coverage(spark, sf_dir):
    """Sitemap coverage audit — declared-vs-fetched reconciliation per
    host: which declared URLs did the crawl actually reach (coverage),
    and which fetched URLs the site never declared (orphans — the
    pages only discoverable by link walking). The post-crawl QA row
    that tells an operator whether sitemap-driven seeding
    (sitemap_ingest / frontier_seed_sources) is pulling its weight.

    Exactness: both sets are closed-form (host, path) pairs; set
    algebra via distinct + full-outer membership flags; counts and
    ppm are exact integers.

    Plan/scale: ONE full-outer join on (host, path) of two distinct
    censuses (at 10^10 rows both sides hash-partition on the same
    key), then a map-side-combinable rollup into |hosts| rows."""
    k = F.col("o_orderkey")
    base = _t(spark, sf_dir, "orders").select(
        F.concat(F.lit("h"), (k % 20).cast("string")).alias("host"),
        F.concat(F.lit("/p"), (k % 97).cast("string")).alias("path"),
        (F.expr("o_orderkey DIV 20") % 2 == 0).cast("int")
        .alias("declared"),
        (F.expr("o_orderkey DIV 20") % 3 > 0).cast("int")
        .alias("fetched"))
    sets = (base.groupBy("host", "path")
            .agg(F.max("declared").alias("d"),
                 F.max("fetched").alias("f")))
    return (sets.groupBy("host")
            .agg(F.sum("d").cast("long").alias("n_declared"),
                 F.sum("f").cast("long").alias("n_fetched"),
                 F.sum(F.col("d") * F.col("f")).cast("long")
                 .alias("n_both"),
                 F.sum(F.when((F.col("f") == 1) & (F.col("d") == 0), 1)
                       .otherwise(0)).cast("long").alias("n_orphan"))
            .withColumn("coverage_ppm",
                        F.expr("n_both * 1000000 DIV n_declared")
                        .cast("long")))


ORACLE_HOST_SITEMAP_COVERAGE = """
WITH base AS (
  SELECT 'h' || (o_orderkey % 20) AS host,
         '/p' || (o_orderkey % 97) AS path,
         CASE WHEN (o_orderkey // 20) % 2 = 0 THEN 1 ELSE 0 END
           AS declared,
         CASE WHEN (o_orderkey // 20) % 3 > 0 THEN 1 ELSE 0 END
           AS fetched
  FROM orders),
sets AS (
  SELECT host, path, max(declared) AS d, max(fetched) AS f
  FROM base GROUP BY host, path)
SELECT host, CAST(sum(d) AS BIGINT) AS n_declared,
       CAST(sum(f) AS BIGINT) AS n_fetched,
       CAST(sum(d * f) AS BIGINT) AS n_both,
       CAST(sum(CASE WHEN f = 1 AND d = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_orphan,
       CAST(sum(d * f) * 1000000 // sum(d) AS BIGINT) AS coverage_ppm
FROM sets GROUP BY host
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


def q_corpus_bitext_mine(spark, sf_dir):
    """Bitext candidate mining from language-variant URL families — the
    ParaCrawl recipe's first stage: documents reachable at the same
    language-stripped URL stem (url_lang_variant's key) in different
    languages are TRANSLATION candidates, gated by the token-length
    ratio filter (a real translation pair's lengths agree within 2x;
    wildly different lengths mean a stub or an unrelated page). One
    deterministic representative doc per (stem, lang), English pivot.

    Exactness: representatives by min doc key; length ratio as exact
    integer min*1e6 DIV max; the >= 500000 gate is an integer compare.

    Plan/scale: the pair join runs on the (stem, lang) REPRESENTATIVE
    census (|stems| x |langs| rows), never the page stream; at web
    scale this is the tiny side of the pipeline (the expensive part —
    sentence alignment — happens downstream on the survivors)."""
    k = F.col("o_orderkey")
    lang = (F.when(k % 3 == 0, F.lit("en"))
            .when(k % 3 == 1, F.lit("de")).otherwise(F.lit("fr")))
    docs = _t(spark, sf_dir, "orders").select(
        (k % 80).cast("long").alias("stem"), lang.alias("lang"),
        k.alias("key"), (50 + (k * 7) % 200).cast("long")
        .alias("n_tokens"))
    reps = (docs.groupBy("stem", "lang")
            .agg(F.min(F.struct("key", "n_tokens")).alias("r"))
            .select("stem", "lang", F.col("r.key").alias("doc_key"),
                    F.col("r.n_tokens").alias("n_tokens")))
    en = reps.filter(F.col("lang") == "en").select(
        "stem", F.col("doc_key").alias("doc_en"),
        F.col("n_tokens").alias("tok_en"))
    xx = reps.filter(F.col("lang") != "en").select(
        "stem", F.col("lang").alias("lang_b"),
        F.col("doc_key").alias("doc_b"),
        F.col("n_tokens").alias("tok_b"))
    pairs = (en.join(xx, "stem")
             .withColumn("ratio_ppm", F.expr(
                 "least(tok_en, tok_b) * 1000000 "
                 "DIV greatest(tok_en, tok_b)").cast("long")))
    return (pairs.filter(F.col("ratio_ppm") >= 500000)
            .select("stem", "doc_en", "lang_b", "doc_b",
                    "tok_en", "tok_b", "ratio_ppm"))


ORACLE_CORPUS_BITEXT_MINE = """
WITH d AS (
  SELECT o_orderkey % 80 AS stem,
         CASE o_orderkey % 3 WHEN 0 THEN 'en' WHEN 1 THEN 'de'
              ELSE 'fr' END AS lang,
         o_orderkey AS key,
         CAST(50 + (o_orderkey * 7) % 200 AS BIGINT) AS n_tokens
  FROM orders),
reps AS (
  SELECT stem, lang, key AS doc_key, n_tokens FROM (
    SELECT *, row_number() OVER (PARTITION BY stem, lang
                                 ORDER BY key, n_tokens) AS rn
    FROM d) WHERE rn = 1),
en AS (SELECT stem, doc_key AS doc_en, n_tokens AS tok_en
       FROM reps WHERE lang = 'en'),
xx AS (SELECT stem, lang AS lang_b, doc_key AS doc_b,
              n_tokens AS tok_b
       FROM reps WHERE lang <> 'en'),
p AS (
  SELECT en.stem, doc_en, lang_b, doc_b, tok_en, tok_b,
         CAST(least(tok_en, tok_b) * 1000000
              // greatest(tok_en, tok_b) AS BIGINT) AS ratio_ppm
  FROM en JOIN xx USING (stem))
SELECT CAST(stem AS BIGINT) AS stem, doc_en, lang_b, doc_b,
       tok_en, tok_b, ratio_ppm
FROM p WHERE ratio_ppm >= 500000
"""


def q_graph_conductance(spark, sf_dir):
    """Conductance grading of the LPA communities (the cut-quality
    complement to graph_modularity's density grade): per community,
    cut(c) = symmetric edge endpoints leaving the community, vol(c) =
    community degree sum, conductance = cut / min(vol, 2m - vol). Low
    conductance = a well-separated mirror farm / site cluster; high =
    LPA glued unrelated hosts. Shares _lpa_labels with the other two
    graph-partition rows so the labelling can't drift.

    Exactness: cut/vol/m are exact integers; conductance in integer
    DIV ppm; the degenerate everything-in-one-community case gets the
    -1 sentinel instead of a division by zero.

    Plan/scale: two broadcast label joins onto the edge list + two
    community-keyed partial aggs — identical exchange profile to the
    modularity row."""
    sym, lab = _lpa_labels(spark, sf_dir)
    mm = sym.agg((F.count(F.lit(1))).cast("long").alias("two_m"))
    la = lab.select(F.col("node").alias("a"), F.col("label").alias("ca"))
    lb = lab.select(F.col("node").alias("b"), F.col("label").alias("cb"))
    cut = (sym.join(F.broadcast(la), "a").join(F.broadcast(lb), "b")
           .filter(F.col("ca") != F.col("cb"))
           .groupBy(F.col("ca").alias("community"))
           .agg(F.count(F.lit(1)).cast("long").alias("cut")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    vol = (deg.join(F.broadcast(la), "a")
           .groupBy(F.col("ca").alias("community"))
           .agg(F.sum("deg").cast("long").alias("vol")))
    return (vol.join(cut, "community", "left")
            .crossJoin(F.broadcast(mm))
            .select("community", "vol",
                    F.coalesce("cut", F.lit(0).cast("long")).alias("cut"),
                    F.expr("CASE WHEN least(vol, two_m - vol) = 0 THEN -1 "
                           "ELSE coalesce(cut, 0) * 1000000 "
                           "DIV least(vol, two_m - vol) END")
                    .cast("long").alias("conductance_ppm")))


ORACLE_GRAPH_CONDUCTANCE = f"""
WITH e AS (
  SELECT DISTINCT 'c' || (o_orderkey % 80) AS a,
         'c' || ((o_orderkey % 80 + o_custkey % 7 + 1) % 80) AS b
  FROM orders
  WHERE 'c' || (o_orderkey % 80)
        <> 'c' || ((o_orderkey % 80 + o_custkey % 7 + 1) % 80)),
sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
l0 AS (SELECT DISTINCT a AS node, a AS label FROM sym),
{_lpa_round_sql("l0", "l1")},
{_lpa_round_sql("l1", "l2")},
{_lpa_round_sql("l2", "l3")},
mm AS (SELECT CAST(count(*) AS BIGINT) AS two_m FROM sym),
cut AS (
  SELECT la.label AS community, CAST(count(*) AS BIGINT) AS cut
  FROM sym JOIN l3 la ON la.node = sym.a
           JOIN l3 lb ON lb.node = sym.b
  WHERE la.label <> lb.label GROUP BY la.label),
deg AS (SELECT a, count(*) AS deg FROM sym GROUP BY a),
vol AS (
  SELECT la.label AS community, CAST(sum(deg) AS BIGINT) AS vol
  FROM deg JOIN l3 la ON la.node = deg.a GROUP BY la.label)
SELECT vol.community, vol.vol,
       CAST(coalesce(cut.cut, 0) AS BIGINT) AS cut,
       CAST(CASE WHEN least(vol.vol, two_m - vol.vol) = 0 THEN -1
                 ELSE coalesce(cut.cut, 0) * 1000000
                      // least(vol.vol, two_m - vol.vol) END AS BIGINT)
         AS conductance_ppm
FROM vol LEFT JOIN cut ON cut.community = vol.community CROSS JOIN mm
"""


def q_dedup_lsh_bucket_audit(spark, sf_dir):
    """Band-bucket fan-out audit for the MinHash-LSH dedup path — the
    operability row that tells you whether the banded join is about to
    explode (the LSH twin of embeddings_cell_balance for IVF): per
    band, the bucket census (buckets, singleton buckets, max bucket)
    and the exact candidate-join cost Sum(size*(size-1)/2) — the
    number the 100 TB run budgets BEFORE launching the self-join.

    Plan/scale: signatures are the production operator's own
    (D.minhash_signatures — interface pinned); per band ONE census
    agg over (band, bucket_key); output is 4 rows."""
    sig = D.minhash_signatures(_corpus(spark, sf_dir))
    parts = []
    for b in range(D.N_BANDS):
        buckets = (sig.groupBy(F.col(f"b{b}").alias("bk"))
                   .agg(F.count(F.lit(1)).alias("sz")))
        parts.append(buckets.agg(
            F.lit(b).alias("band"),
            F.count(F.lit(1)).cast("long").alias("n_buckets"),
            F.sum("sz").cast("long").alias("n_docs"),
            F.max("sz").cast("long").alias("max_bucket"),
            F.sum((F.col("sz") == 1).cast("int")).cast("long")
            .alias("n_singletons"),
            F.sum(F.expr("sz * (sz - 1) DIV 2")).cast("long")
            .alias("join_cost")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _lsh_bucket_audit_oracle() -> str:
    mh_cols = ",\n  ".join(
        f"min(substr(md5('{i}|' || shingle), 1, 16)) AS mh{i}"
        for i in range(D.N_MINHASH))
    bands = ", ".join(
        "mh%d || mh%d || mh%d || mh%d AS b%d" % (
            b * 4, b * 4 + 1, b * 4 + 2, b * 4 + 3, b)
        for b in range(D.N_BANDS))
    selects = []
    for b in range(D.N_BANDS):
        selects.append(f"""
SELECT {b} AS band, CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(sum(sz) AS BIGINT) AS n_docs,
       CAST(max(sz) AS BIGINT) AS max_bucket,
       CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_singletons,
       CAST(sum(sz * (sz - 1) // 2) AS BIGINT) AS join_cost
FROM (SELECT b{b}, count(*) AS sz FROM sigb GROUP BY b{b})""")
    return (f"WITH {_CORPUS_SQL},\n{_shingle_sql(3)},\n"
            f"sig AS (SELECT doc_id, {mh_cols} FROM sh GROUP BY doc_id),\n"
            f"sigb AS (SELECT *, {bands} FROM sig)"
            + "\nUNION ALL".join(selects))


ORACLE_DEDUP_LSH_BUCKET_AUDIT = _lsh_bucket_audit_oracle()


def q_host_homograph(spark, sf_dir):
    """IDN homograph / mixed-script spoof detection — the unicode twin
    of host_typosquat: a hostname label mixing Latin letters with
    Cyrillic confusables ('brаnd.com' with U+0430 а) renders
    identically to its victim but is a different URL-seen key, a
    different politeness bucket, and a classic phishing splash page.
    Flags: mixed-script labels and labels containing Cyrillic
    confusables, with the confusable-folded skeleton joined back to
    the Latin victim census (left join — a skeleton with no Latin
    counterpart keeps the '-' sentinel).

    Exactness: script classes via explicit unicode-range regexes
    (identical in Java regex and RE2); the confusable fold is a fixed
    5-char translate() both engines state literally; the victim join
    is exact string equality on the folded skeleton.

    Plan/scale: script flags are a zero-exchange map over the host
    census; the skeleton self-join runs on |hosts| census rows."""
    k = F.col("o_orderkey")
    m, b = k % 40, (k % 8).cast("string")
    host = (F.when(m < 30, F.concat(F.lit("brand"), b, F.lit(".com")))
            .when(m < 33, F.concat(F.lit("brаnd"), b, F.lit(".com")))
            .when(m < 35, F.concat(F.lit("вrand"), b, F.lit(".com")))
            .otherwise(F.concat(F.lit("site"), (k % 9).cast("string"),
                                F.lit(".net"))))
    census = (_t(spark, sf_dir, "orders")
              .select(host.alias("host"))
              .groupBy("host")
              .agg(F.count(F.lit(1)).cast("long").alias("n_urls")))
    label = F.regexp_extract("host", r"^([^.]+)\.", 1)
    has_latin = label.rlike("[a-z]")
    has_cyr = label.rlike("[а-я]")
    # confusable fold: the 5 highest-frequency Cyrillic->Latin pairs
    skeleton = F.translate("host", "аеорв",
                           "aeopv")
    flagged = census.select(
        "host", "n_urls",
        (has_latin & has_cyr).cast("int").alias("mixed_script"),
        (has_cyr & (skeleton != F.col("host"))).cast("int")
        .alias("has_confusable"),
        skeleton.alias("skeleton"))
    latin = (flagged.filter(F.col("has_confusable") == 0)
             .select(F.col("skeleton").alias("skeleton"),
                     F.col("host").alias("victim_host"),
                     F.col("n_urls").alias("victim_urls")))
    return (flagged.filter(F.col("has_confusable") == 1)
            .join(latin, "skeleton", "left")
            .select("host", "n_urls", "mixed_script",
                    F.coalesce("victim_host", F.lit("-"))
                    .alias("victim_host"),
                    F.coalesce("victim_urls", F.lit(0).cast("long"))
                    .alias("victim_urls")))


ORACLE_HOST_HOMOGRAPH = """
WITH u AS (
  SELECT CASE
           WHEN o_orderkey % 40 < 30
             THEN 'brand' || (o_orderkey % 8) || '.com'
           WHEN o_orderkey % 40 < 33
             THEN 'brаnd' || (o_orderkey % 8) || '.com'
           WHEN o_orderkey % 40 < 35
             THEN 'вrand' || (o_orderkey % 8) || '.com'
           ELSE 'site' || (o_orderkey % 9) || '.net'
         END AS host
  FROM orders),
census AS (
  SELECT host, CAST(count(*) AS BIGINT) AS n_urls FROM u GROUP BY host),
f AS (
  SELECT host, n_urls,
         CASE WHEN regexp_matches(regexp_extract(host, '^([^.]+)\\.', 1),
                                  '[a-z]')
               AND regexp_matches(regexp_extract(host, '^([^.]+)\\.', 1),
                                  '[а-я]')
              THEN 1 ELSE 0 END AS mixed_script,
         CASE WHEN regexp_matches(regexp_extract(host, '^([^.]+)\\.', 1),
                                  '[а-я]')
               AND translate(host, 'аеорв',
                             'aeopv') <> host
              THEN 1 ELSE 0 END AS has_confusable,
         translate(host, 'аеорв', 'aeopv')
           AS skeleton
  FROM census),
latin AS (
  SELECT skeleton, host AS victim_host, n_urls AS victim_urls
  FROM f WHERE has_confusable = 0)
SELECT f.host, f.n_urls, f.mixed_script,
       coalesce(latin.victim_host, '-') AS victim_host,
       CAST(coalesce(latin.victim_urls, 0) AS BIGINT) AS victim_urls
FROM f LEFT JOIN latin USING (skeleton)
WHERE f.has_confusable = 1
"""


def q_ann_binary_hamming(spark, sf_dir):
    """Binary-code ANN — the 6th similarity path (brute / LSH / IVF /
    PQ / IVFPQ / binary): each 64-d embedding collapses to a 64-bit
    SIGN code (bit i = v[i] > 0), distance = hamming via
    bit_count(xor) — 16 bytes/vector, the cheapest possible index and
    the standard first-stage filter before exact rescoring (ITQ/LSH
    family). Codes are stored as two 32-bit halves so the arithmetic
    stays in safe BIGINT space on both engines.

    Exactness: code construction and hamming are pure integer; ties
    rank by (hamming ASC, neighbor ASC).

    Plan/scale: here the 10 bounded queries join all base codes (the
    brute demo form); at 10^10 vectors the SAME codes band into 4x16-
    bit segment equi-joins — dedup_simhash64's proven shape — before
    exact rescoring. The code table is the thing: 100 TB of floats
    becomes 160 GB of codes."""
    emb = _t(spark, sf_dir, "embeddings")

    def half(lo_bit):
        return F.expr(
            f"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
            f"CASE WHEN element_at(embedding, i + {lo_bit} + 1) > 0 "
            f"THEN shiftleft(1L, i) ELSE 0L END)")

    codes = emb.select("vec_id", half(0).alias("c_lo"),
                       half(32).alias("c_hi"))
    q = codes.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("c_lo").alias("q_lo"),
        F.col("c_hi").alias("q_hi"))
    b = codes.select(F.col("vec_id").alias("neighbor_id"), "c_lo", "c_hi")
    scored = (b.join(F.broadcast(q),
                     F.col("query_id") != F.col("neighbor_id"))
              .withColumn("hamming", (
                  F.bit_count(F.expr("q_lo ^ c_lo"))
                  + F.bit_count(F.expr("q_hi ^ c_hi"))).cast("int")))
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"),
                                               F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .select("query_id", "rank", "neighbor_id", "hamming"))


ORACLE_ANN_BINARY_HAMMING = """
WITH codes AS (
  SELECT vec_id,
         list_sum(list_transform(range(32),
             i -> CASE WHEN embedding[i+1] > 0
                  THEN (1::BIGINT << i) ELSE 0 END)) AS c_lo,
         list_sum(list_transform(range(32),
             i -> CASE WHEN embedding[i+33] > 0
                  THEN (1::BIGINT << i) ELSE 0 END)) AS c_hi
  FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         bit_count(xor(q.c_lo, b.c_lo))
         + bit_count(xor(q.c_hi, b.c_hi)) AS hamming
  FROM codes q JOIN codes b ON b.vec_id <> q.vec_id
  WHERE q.vec_id < 10)
SELECT query_id, CAST(rnk AS INT) AS rank, neighbor_id,
       CAST(hamming AS INT) AS hamming
FROM (
  SELECT query_id, neighbor_id, hamming,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY hamming ASC, neighbor_id ASC) AS rnk
  FROM scored) WHERE rnk <= 5
"""


def q_events_concurrency(spark, sf_dir):
    """Peak-concurrency profile — the sweep-line interval-overlap count
    every capacity planner needs (max simultaneous sessions/fetches per
    hour): each event opens an interval [ts, ts + dur], the sweep
    emits +1 at starts and -1 at ends, a single global-order running
    sum IS the live concurrency, and the per-hour census reports its
    max. Ends sort before starts at equal timestamps (touching
    intervals are NOT concurrent) — the tie rule both engines state
    identically.

    Exactness: integer epoch seconds, deterministic (t, delta,
    event_id) total order, integer running sum.

    Plan/scale: ONE global-order window at driver SF (the demo form);
    at 10^10 events the sum decomposes exactly like pack.py's
    hierarchical prefix path (per-shard sums + broadcast base
    offsets) — the identical math, documented there."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"))
    iv = ev.select("event_id", "s",
                   (F.col("s") + 60 + F.col("event_id") % 3600)
                   .alias("e"))
    pts = (iv.select(F.col("s").alias("t"), F.lit(1).alias("delta"),
                     "event_id")
           .unionByName(iv.select(F.col("e").alias("t"),
                                  F.lit(-1).alias("delta"), "event_id")))
    w = (Window.orderBy(F.asc("t"), F.asc("delta"), F.asc("event_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    run = pts.withColumn("live", F.sum("delta").over(w))
    return (run.withColumn("hour", F.expr("t DIV 3600").cast("long"))
            .groupBy("hour")
            .agg(F.max("live").cast("long").alias("peak_live"),
                 F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                 .cast("long").alias("n_starts")))


ORACLE_EVENTS_CONCURRENCY = """
WITH ev AS (
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
iv AS (
  SELECT event_id, s, s + 60 + event_id % 3600 AS e FROM ev),
pts AS (
  SELECT s AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT e, -1, event_id FROM iv),
run AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t ASC, delta ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM pts)
SELECT t // 3600 AS hour, CAST(max(live) AS BIGINT) AS peak_live,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_starts
FROM run GROUP BY 1
"""


def q_corpus_pack_fragmentation(spark, sf_dir):
    """Packing boundary-contamination audit — the QUALITY metric for
    concat-and-chunk sequence packing (corpus_pack): a document split
    across block boundaries leaks attention between unrelated
    contexts, so the per-block census of starting / continuing /
    fragmented documents is what decides whether to pad, mask, or
    best-fit instead. Same flat prefix-window chain as corpus_pack (a
    doc occupies token interval [cum - n_tok, cum); its block span is
    the integer quotient range), so the two rows cannot disagree on
    where blocks fall.

    Exactness: all block arithmetic is integer DIV on exact token
    counts.

    Plan/scale: the window is the pack row's own; the census explodes
    each doc into its spanned blocks — bounded by ceil(n_tok/2048)+1
    per doc, never |docs| x |blocks|."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id",
                 F.size(F.split("text", " ")).cast("long")
                 .alias("n_tok")))
    w = (Window.orderBy(F.asc("doc_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    spans = (d.withColumn("cum", F.sum("n_tok").over(w))
             .withColumn("b0", F.expr("(cum - n_tok) DIV 2048"))
             .withColumn("b1", F.expr("(cum - 1) DIV 2048")))
    blocks = spans.select(
        "doc_id", "b0", "b1",
        F.explode(F.sequence("b0", "b1")).alias("block_id"))
    return (blocks.groupBy("block_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs_touching"),
                 F.sum((F.col("block_id") == F.col("b0")).cast("int"))
                 .cast("long").alias("n_starting"),
                 F.sum((F.col("block_id") > F.col("b0")).cast("int"))
                 .cast("long").alias("n_crossing"),
                 F.sum(((F.col("b1") > F.col("b0"))).cast("int"))
                 .cast("long").alias("n_fragmented")))


ORACLE_CORPUS_PACK_FRAGMENTATION = """
WITH d AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
  FROM documents WHERE text IS NOT NULL),
s AS (
  SELECT doc_id, n_tok,
         sum(n_tok) OVER (ORDER BY doc_id ASC
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM d),
spans AS (
  SELECT doc_id, CAST((cum - n_tok) // 2048 AS BIGINT) AS b0,
         CAST((cum - 1) // 2048 AS BIGINT) AS b1
  FROM s),
blocks AS (
  SELECT doc_id, b0, b1, unnest(generate_series(b0, b1)) AS block_id
  FROM spans)
SELECT CAST(block_id AS BIGINT) AS block_id,
       CAST(count(*) AS BIGINT) AS n_docs_touching,
       CAST(sum(CASE WHEN block_id = b0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_starting,
       CAST(sum(CASE WHEN block_id > b0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossing,
       CAST(sum(CASE WHEN b1 > b0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_fragmented
FROM blocks GROUP BY block_id
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


def q_frontier_admission_ensemble(spark, sf_dir):
    """The composed frontier ADMISSION gate — the crawler-side twin of
    corpus_quality_ensemble's filter-decision composition: every
    candidate URL runs the production gate ladder in its contract
    order (invalid_scheme -> ssrf_internal -> blocklisted -> trap ->
    robots_disallowed -> admit) and lands in exactly one
    FIRST-FAILING-REASON bucket. Output is the reason census with a
    url_id checksum per bucket — one URL sliding between buckets (or
    two gates swapping order) breaks the hash.

    Plan/scale: every gate is a map-side predicate (the blocklist and
    robots sides broadcast at production scale — shapes proven by
    url_blocklist_filter / robots_rfc); the census is a 6-key agg.
    Zero joins in the demo form, zero Python ever."""
    k = F.col("o_orderkey")
    m = k % 8
    hd = (k % 9).cast("string")
    url = (F.when(m == 0, F.concat(F.lit("ht!tp://bad"), k.cast("string")))
           .when(m == 1, F.lit("http://169.254.169.254/latest"))
           .when(m == 2, F.concat(F.lit("http://ads"), (k % 5).cast("string"),
                                  F.lit(".tracker.example/x")))
           .when(m == 3, F.concat(F.lit("http://h"), hd,
                                  F.lit(".onion/cal/2024/01/"),
                                  k.cast("string"), F.lit("/day")))
           .when(m == 4, F.concat(F.lit("http://h"), hd,
                                  F.lit(".onion/priv/p"), k.cast("string")))
           .otherwise(F.concat(F.lit("http://h"), hd, F.lit(".onion/p"),
                               k.cast("string"))))
    cand = _t(spark, sf_dir, "orders").select(k.alias("url_id"),
                                              url.alias("url"))
    host = F.regexp_extract("url", r"^[a-z!]+://([^/]+)", 1)
    path = F.regexp_extract("url", r"^[a-z!]+://[^/]+(/.*)$", 1)
    scheme_ok = F.col("url").rlike("^https?://")
    ssrf = (host == "169.254.169.254") | host.startswith("127.") \
        | host.startswith("10.") | host.startswith("192.168.")
    blocked = host.endswith(".tracker.example") \
        | (host == "tracker.example")
    depth = F.size(F.split(path, "/")) - 1
    trap = path.contains("/cal/") & (depth >= 4)
    host_digit = F.regexp_extract(host, r"^h(\d+)\.", 1)
    robots = path.startswith("/priv") \
        & (host_digit.cast("long") % 2 == 0)
    verdict = (F.when(~scheme_ok, "invalid_scheme")
               .when(ssrf, "ssrf_internal")
               .when(blocked, "blocklisted")
               .when(trap, "trap")
               .when(robots, "robots_disallowed")
               .otherwise("admit"))
    return (cand.select(verdict.alias("verdict"), "url_id")
            .groupBy("verdict")
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                 F.sum("url_id").cast("long").alias("id_checksum")))


ORACLE_FRONTIER_ADMISSION_ENSEMBLE = """
WITH c AS (
  SELECT o_orderkey AS url_id, o_orderkey % 8 AS m,
         o_orderkey % 9 AS hd, o_orderkey AS k
  FROM orders),
v AS (
  SELECT url_id,
         CASE
           WHEN m = 0 THEN 'invalid_scheme'
           WHEN m = 1 THEN 'ssrf_internal'
           WHEN m = 2 THEN 'blocklisted'
           WHEN m = 3 THEN 'trap'
           WHEN m = 4 AND hd % 2 = 0 THEN 'robots_disallowed'
           ELSE 'admit' END AS verdict
  FROM c)
SELECT verdict, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(url_id) AS BIGINT) AS id_checksum
FROM v GROUP BY verdict
"""


def q_frontier_priority_decay(spark, sf_dir):
    """Priority AGING for starvation avoidance — the scheduling fix for
    the pure-priority frontier's failure mode (a low-priority URL
    installed early can wait forever behind a stream of fresh
    high-priority links): effective priority = base + age x boost, so
    every queued URL eventually wins its host's wave slot. Output is
    the per-host wave pick (top-3 by effective priority) with age and
    boost visible — the starvation guarantee is then checkable: any
    sufficiently old URL outranks any fresh one.

    Exactness: ages/boosts/effective priorities are exact integers;
    the pick uses the full (eff DESC, url_id ASC) tie-break.

    Plan/scale: ONE host-partitioned window — the same shuffle the
    bucketed install already pays; aging adds a map-side expression,
    not a pass."""
    k = F.col("o_orderkey")
    fr = _t(spark, sf_dir, "orders").select(
        k.alias("url_id"),
        F.concat(F.lit("h"), (k % 30).cast("string")).alias("host"),
        (k % 100).cast("long").alias("base_priority"),
        (k % 20).cast("long").alias("installed_round"))
    aged = (fr.withColumn("age", F.lit(20) - F.col("installed_round"))
            .withColumn("eff_priority",
                        (F.col("base_priority") + F.col("age") * 5)
                        .cast("long")))
    w = Window.partitionBy("host").orderBy(F.desc("eff_priority"),
                                           F.asc("url_id"))
    return (aged.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= 3)
            .select("host", "url_id", "base_priority", "age",
                    "eff_priority", "rank"))


ORACLE_FRONTIER_PRIORITY_DECAY = """
WITH fr AS (
  SELECT o_orderkey AS url_id, 'h' || (o_orderkey % 30) AS host,
         CAST(o_orderkey % 100 AS BIGINT) AS base_priority,
         CAST(20 - (o_orderkey % 20) AS BIGINT) AS age
  FROM orders),
a AS (
  SELECT *, base_priority + age * 5 AS eff_priority FROM fr),
r AS (
  SELECT *, row_number() OVER (PARTITION BY host
                               ORDER BY eff_priority DESC,
                                        url_id ASC) AS rank
  FROM a)
SELECT host, url_id, base_priority, age,
       CAST(eff_priority AS BIGINT) AS eff_priority,
       CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
"""


def q_dedup_cdc_chunks(spark, sf_dir):
    """Content-defined chunking (the LBFS/restic rolling-boundary
    primitive) for sub-document storage dedup: a chunk boundary falls
    after every 8-char window whose md5 starts with '0' (expected
    chunk ~16 chars — boundaries move WITH the content, so an
    insertion early in a doc re-chunks only its neighborhood, unlike
    fixed-size blocks), chunks are digested, and the cross-corpus
    digest census reports every chunk stored more than once. Over the
    twin corpus the shared chunks between original and near-dup twin
    are exactly what CDC exists to find.

    Exactness: boundaries and digests are md5-based (bit-identical
    engines); chunk extraction is a lag window over cut positions.

    Plan/scale: the per-char window explode is the demo form (chars x
    docs rows); at 100 TB the identical boundary rule runs as a
    mapInPandas kernel per doc (one pass, no explode) feeding the same
    digest census — the census join is the only shuffle either way."""
    c = _corpus(spark, sf_dir).filter(F.col("text").isNotNull())
    pos = c.select(
        "doc_id", "text",
        F.explode(F.sequence(
            F.lit(0), F.greatest(F.length("text") - 8, F.lit(0))))
        .alias("p"))
    bnd = (pos.filter(
        (F.length("text") >= 8)
        & (F.substring(F.md5(F.expr("substr(text, p + 1, 8)")), 1, 1)
           == "0"))
        .select("doc_id", (F.col("p") + 8).alias("cut")))
    cuts = (bnd.select("doc_id", "cut")
            .unionByName(c.select("doc_id",
                                  F.length("text").alias("cut")))
            .distinct())
    w = Window.partitionBy("doc_id").orderBy("cut")
    chunks = (cuts
              .withColumn("prev", F.coalesce(
                  F.lag("cut").over(w), F.lit(0)))
              .filter(F.col("cut") > F.col("prev"))
              .join(c, "doc_id")
              .select("doc_id", F.col("prev").alias("chunk_start"),
                      (F.col("cut") - F.col("prev")).alias("chunk_len"),
                      F.md5(F.expr(
                          "substr(text, prev + 1, cut - prev)"))
                      .alias("digest")))
    return (chunks.groupBy("digest")
            .agg(F.count(F.lit(1)).cast("long").alias("n_chunks"),
                 F.countDistinct("doc_id").cast("long").alias("n_docs"),
                 F.max("chunk_len").cast("long").alias("chunk_len"))
            .filter(F.col("n_docs") > 1))


ORACLE_DEDUP_CDC_CHUNKS = f"""
WITH {_CORPUS_SQL},
pos AS (
  SELECT doc_id, text,
         unnest(range(greatest(length(text) - 8, 0) + 1)) AS p
  FROM corpus WHERE text IS NOT NULL),
bnd AS (
  SELECT doc_id, p + 8 AS cut FROM pos
  WHERE length(text) >= 8
    AND substr(md5(substr(text, CAST(p + 1 AS INT), 8)), 1, 1) = '0'),
cuts AS (
  SELECT doc_id, CAST(cut AS BIGINT) AS cut FROM bnd
  UNION
  SELECT doc_id, CAST(length(text) AS BIGINT)
  FROM corpus WHERE text IS NOT NULL),
ck AS (
  SELECT doc_id, cut,
         coalesce(lag(cut) OVER (PARTITION BY doc_id ORDER BY cut), 0)
           AS prev
  FROM cuts),
chunks AS (
  SELECT ck.doc_id, cut - prev AS chunk_len,
         md5(substr(c2.text, CAST(prev + 1 AS INT),
                    CAST(cut - prev AS INT))) AS digest
  FROM ck JOIN corpus c2 ON c2.doc_id = ck.doc_id
  WHERE cut > prev)
SELECT digest, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(max(chunk_len) AS BIGINT) AS chunk_len
FROM chunks GROUP BY digest HAVING count(DISTINCT doc_id) > 1
"""


def q_frontier_wfq(spark, sf_dir):
    """Weighted fair queuing of fetch slots — the bandwidth-fair
    scheduler above per-host politeness (hosts carry weights; a
    weight-3 host gets 3x the service of a weight-1 host WITHOUT
    starving it — the guarantee strict priority can't give): per host,
    virtual finish time F_i = max(F_{i-1}, arrival_i) + cost_i/w, and
    the global dispatch order is by virtual finish. The sequential
    recurrence is computed as a PLAIN WINDOW via the classic
    decomposition F_i = C_i + running_max(arrival_j - C_{j-1}) over
    the cost prefix sums — one per-host window pass, no iteration.

    Exactness: costs are scaled by 6 = lcm(weights) so every division
    is exact integer; the global slot rank uses a full
    (vfinish, host, url_id) tie-break.

    Plan/scale: one host-partitioned window (the politeness shuffle)
    plus the global rank, which range-partitions at scale."""
    k = F.col("o_orderkey")
    h = k % 15
    items = _t(spark, sf_dir, "orders").select(
        k.alias("url_id"),
        F.concat(F.lit("h"), h.cast("string")).alias("host"),
        (1 + h % 3).cast("long").alias("weight"),
        (k % 50).cast("long").alias("arrival"),
        (100 + k % 400).cast("long").alias("cost"))
    scaled = items.withColumn(
        "cost_scaled", F.expr("cost * 6 DIV weight").cast("long"))
    w = (Window.partitionBy("host")
         .orderBy(F.asc("arrival"), F.asc("url_id"))
         .rowsBetween(Window.unboundedPreceding, 0))
    x = (scaled
         .withColumn("c_i", F.sum("cost_scaled").over(w))
         .withColumn("g", F.col("arrival")
                     - (F.col("c_i") - F.col("cost_scaled")))
         .withColumn("vfinish", (F.col("c_i") + F.max("g").over(w))
                     .cast("long")))
    wg = Window.orderBy(F.asc("vfinish"), F.asc("host"), F.asc("url_id"))
    return (x.withColumn("slot", F.row_number().over(wg).cast("long"))
            .select("host", "url_id", "weight", "arrival", "cost_scaled",
                    "vfinish", "slot"))


ORACLE_FRONTIER_WFQ = """
WITH items AS (
  SELECT o_orderkey AS url_id, 'h' || (o_orderkey % 15) AS host,
         CAST(1 + (o_orderkey % 15) % 3 AS BIGINT) AS weight,
         CAST(o_orderkey % 50 AS BIGINT) AS arrival,
         CAST(100 + o_orderkey % 400 AS BIGINT) AS cost
  FROM orders),
s AS (
  SELECT *, cost * 6 // weight AS cost_scaled FROM items),
x AS (
  SELECT *,
         sum(cost_scaled) OVER (PARTITION BY host
                                ORDER BY arrival ASC, url_id ASC
                                ROWS UNBOUNDED PRECEDING) AS c_i
  FROM s),
y AS (
  SELECT *, arrival - (c_i - cost_scaled) AS g FROM x),
z AS (
  SELECT *,
         c_i + max(g) OVER (PARTITION BY host
                            ORDER BY arrival ASC, url_id ASC
                            ROWS UNBOUNDED PRECEDING) AS vfinish
  FROM y)
SELECT host, url_id, weight, arrival,
       CAST(cost_scaled AS BIGINT) AS cost_scaled,
       CAST(vfinish AS BIGINT) AS vfinish,
       CAST(row_number() OVER (ORDER BY vfinish ASC, host ASC,
                               url_id ASC) AS BIGINT) AS slot
FROM z
"""


def q_media_entropy_filter(spark, sf_dir):
    """Blank/flat-image gate — the Shannon-entropy screen that drops
    constant-fill and near-constant imagery before caption pairing or
    model decode (the media twin of the C4 text filters): per image,
    intensity entropy from the 16-bin histogram (H = ln N - (1/N)
    Sum c*ln c — computed from EXACT integer bin counts, quantized to
    1e-6 units the way text_char_entropy established) plus the
    dominant-bin share; keep = entropy above floor AND no bin owns
    >90% of pixels. Every 9th doc is planted as a constant fill, so
    both verdicts are exercised.

    Plan/scale: the histogram kernel is the media_color_histogram
    Arrow path (pixels never shuffle); the entropy fold runs over
    16-row-per-image metadata."""
    import pandas as pd

    from genesis_spark.operators import multimodal as MM
    d = _t(spark, sf_dir, "documents").select("doc_id")

    def encode(batches):
        for pdf in batches:
            blobs = []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 9 == 0:
                    w, h = 8 + i % 16, 8 + (i // 3) % 16
                    blobs.append(MM.encode_gray8(
                        w, h, bytes([i % 256]) * (w * h)))
                else:
                    blobs.append(MM.gray8_by_doc_id(i))
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "media_blob": blobs})

    blobs = d.mapInPandas(encode, "doc_id long, media_blob binary")
    hist = MM.gray8_histogram(blobs, bins=16).filter(F.col("n_px") > 0)
    per = (hist.groupBy("doc_id")
           .agg(F.sum("n_px").cast("long").alias("n_px"),
                F.max("n_px").cast("long").alias("max_bin"),
                F.sum(F.col("n_px").cast("double")
                      * F.log(F.col("n_px").cast("double")))
                .alias("_clnc")))
    return (per.select(
        "doc_id", "n_px",
        F.expr("CAST(floor((ln(n_px) - _clnc / n_px) * 1000000 + 0.5) "
               "AS BIGINT)").alias("entropy_e6"),
        F.expr("max_bin * 1000000 DIV n_px").cast("long")
        .alias("max_bin_ppm"))
        .withColumn("keep",
                    ((F.col("entropy_e6") >= 500000)
                     & (F.col("max_bin_ppm") <= 900000)).cast("int")))


ORACLE_MEDIA_ENTROPY_FILTER = """
WITH d AS (
  SELECT doc_id, CAST(8 + doc_id % 16 AS INT) AS w,
         CAST(8 + (doc_id // 3) % 16 AS INT) AS h
  FROM documents),
px AS (
  SELECT doc_id,
         CASE WHEN doc_id % 9 = 0 THEN CAST((doc_id % 256) // 16 AS INT)
              ELSE CAST(((doc_id * 31 + i * 7) % 256) // 16 AS INT)
         END AS bin
  FROM d, unnest(range(w * h)) u(i)),
counts AS (
  SELECT doc_id, bin, CAST(count(*) AS BIGINT) AS n_px
  FROM px GROUP BY doc_id, bin),
per AS (
  SELECT doc_id, CAST(sum(n_px) AS BIGINT) AS n_px,
         CAST(max(n_px) AS BIGINT) AS max_bin,
         sum(n_px::DOUBLE * ln(n_px::DOUBLE)) AS clnc
  FROM counts GROUP BY doc_id)
SELECT doc_id, n_px,
       CAST(floor((ln(n_px::DOUBLE) - clnc / n_px) * 1000000 + 0.5)
            AS BIGINT) AS entropy_e6,
       CAST(max_bin * 1000000 // n_px AS BIGINT) AS max_bin_ppm,
       CAST(CASE WHEN floor((ln(n_px::DOUBLE) - clnc / n_px) * 1000000
                            + 0.5) >= 500000
                  AND max_bin * 1000000 // n_px <= 900000
                 THEN 1 ELSE 0 END AS INT) AS keep
FROM per
"""


def q_spans_multimodal3(spark, sf_dir):
    """THREE-modality interleaving — the span payload generalized past
    text+image: audio spans join the sequence (after every 5th chunk,
    beside the image-every-3rd rule), and the census reports per-doc
    modality counts, kind TRANSITIONS (the interleaving structure
    itself), and the context-window token bill under per-kind costs
    (section = its token count, image = 64, audio = 128 — the
    multimodal budgeting constants spans_token_budget established).
    Proves the (kind, text, media_ref, offset) schema carries any
    modality mix without change — the axes-A+B payload claim.

    Plan/scale: synthesis and census are codegen (flatten/transform +
    one posexplode + one per-doc window for transitions); pixels/PCM
    never appear — media spans are refs, the modality kernels
    (media_*) own the bytes."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select(F.col("doc_id").cast("string").alias("doc_id"), "text"))
    words = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        (F.ceil(F.size(words) / F.lit(8))).cast("int"), F.lit(1))
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * 8 + 1, 8), " "))

    def sec(c):
        return F.struct(F.lit("section").alias("kind"),
                        F.size(F.split(c, " ")).cast("long").alias("cost"))

    img = F.struct(F.lit("image").alias("kind"),
                   F.lit(64).cast("long").alias("cost"))
    aud = F.struct(F.lit("audio").alias("kind"),
                   F.lit(128).cast("long").alias("cost"))
    spans = F.flatten(F.transform(
        chunks,
        lambda c, i: F.when((i + 1) % 15 == 0,
                            F.array(sec(c), img, aud))
        .when((i + 1) % 3 == 0, F.array(sec(c), img))
        .when((i + 1) % 5 == 0, F.array(sec(c), aud))
        .otherwise(F.array(sec(c)))))
    ex = d.select("doc_id", F.posexplode(spans).alias("off", "s"))
    w = Window.partitionBy("doc_id").orderBy("off")
    flagged = ex.withColumn(
        "trans",
        (F.col("s.kind") != F.lag("s.kind").over(w)).cast("int"))
    return (flagged.groupBy("doc_id")
            .agg(F.sum((F.col("s.kind") == "section").cast("int"))
                 .cast("long").alias("n_sections"),
                 F.sum((F.col("s.kind") == "image").cast("int"))
                 .cast("long").alias("n_images"),
                 F.sum((F.col("s.kind") == "audio").cast("int"))
                 .cast("long").alias("n_audio"),
                 F.sum(F.coalesce("trans", F.lit(0))).cast("long")
                 .alias("n_transitions"),
                 F.sum("s.cost").cast("long").alias("total_tokens")))


ORACLE_SPANS_MULTIMODAL3 = """
WITH base AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, string_split(text, ' ') AS words
  FROM documents WHERE text IS NOT NULL
), ch AS (
  SELECT doc_id, list_transform(
      range(0, greatest(CAST(ceil(len(words) / 8.0) AS INT), 1)),
      i -> array_to_string(words[CAST(i*8+1 AS INT):CAST(i*8+8 AS INT)], ' ')
  ) AS chunks FROM base
), il AS (
  SELECT doc_id, flatten(list_transform(chunks, (c, j) ->
      CASE WHEN j % 15 = 0 THEN
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)},
         {'kind': 'image', 'cost': CAST(64 AS BIGINT)},
         {'kind': 'audio', 'cost': CAST(128 AS BIGINT)}]
      WHEN j % 3 = 0 THEN
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)},
         {'kind': 'image', 'cost': CAST(64 AS BIGINT)}]
      WHEN j % 5 = 0 THEN
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)},
         {'kind': 'audio', 'cost': CAST(128 AS BIGINT)}]
      ELSE
        [{'kind': 'section',
          'cost': CAST(len(string_split(c, ' ')) AS BIGINT)}]
      END)) AS spans
  FROM ch
), ex AS (
  SELECT doc_id, unnest(spans) AS s,
         generate_subscripts(spans, 1) - 1 AS off
  FROM il
), fl AS (
  SELECT doc_id, s.kind AS kind, s.cost AS cost,
         CASE WHEN s.kind <> lag(s.kind) OVER (PARTITION BY doc_id
                                               ORDER BY off)
              THEN 1 ELSE 0 END AS trans
  FROM ex)
SELECT doc_id,
       CAST(sum(CASE WHEN kind = 'section' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sections,
       CAST(sum(CASE WHEN kind = 'image' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_images,
       CAST(sum(CASE WHEN kind = 'audio' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_audio,
       CAST(sum(coalesce(trans, 0)) AS BIGINT) AS n_transitions,
       CAST(sum(cost) AS BIGINT) AS total_tokens
FROM fl GROUP BY doc_id
"""


def q_text_lm_heldout(spark, sf_dir):
    """HELD-OUT unigram-LM perplexity — the methodologically honest
    version of text_unigram_lm (scoring the training set flatters the
    model): the LM trains on the 80% split (doc_id % 5 != 0), scores
    the held-out 20% with add-0.5 smoothing over the train vocab
    (V+1 events — the unseen-token mass), and reports per-doc nll
    plus the OOV rate the in-corpus row can never see.

    Exactness: tf/V/T are exact integers on both engines; nll uses
    the module's round(avg, 4) convention; OOV ppm is integer DIV.

    Plan/scale: train vocab is one map-side-combinable groupBy, the
    scoring join broadcasts the Heaps-small vocab; the split predicate
    prunes at the scan."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    train = tok.filter(F.col("doc_id") % 5 != 0)
    test = tok.filter(F.col("doc_id") % 5 == 0)
    v = train.groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                 .alias("tf"))
    totals = v.agg(F.sum("tf").cast("long").alias("t_total"),
                   F.count(F.lit(1)).cast("long").alias("v_size"))
    scored = (test.join(F.broadcast(v), "tok", "left")
              .crossJoin(F.broadcast(totals))
              .withColumn("p", (F.coalesce("tf", F.lit(0).cast("long"))
                                + F.lit(0.5))
                          / (F.col("t_total")
                             + 0.5 * (F.col("v_size") + 1))))
    return (scored.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_tokens"),
                 F.sum(F.col("tf").isNull().cast("int")).cast("long")
                 .alias("n_oov"),
                 F.round(F.avg(-F.log("p")), 4).alias("nll"))
            .withColumn("oov_ppm",
                        F.expr("n_oov * 1000000 DIV n_tokens")
                        .cast("long")))


ORACLE_TEXT_LM_HELDOUT = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL),
v AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE doc_id % 5 <> 0 GROUP BY tok),
tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS t_total,
         CAST(count(*) AS BIGINT) AS v_size FROM v),
sc AS (
  SELECT t.doc_id, v.tf,
         (coalesce(v.tf, 0) + 0.5)
         / (tot.t_total + 0.5 * (tot.v_size + 1)) AS p
  FROM tok t LEFT JOIN v USING (tok) CROSS JOIN tot
  WHERE t.doc_id % 5 = 0)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN tf IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       round(avg(-ln(p)), 4) AS nll,
       CAST(sum(CASE WHEN tf IS NULL THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS oov_ppm
FROM sc GROUP BY doc_id
"""


def q_embeddings_ood_centroid(spark, sf_dir):
    """Out-of-distribution scoring by centroid distance — the
    data-curation filter that flags vectors far from EVERY coarse
    cell (mislabeled modality, corrupted embedding, genuine novelty):
    per vector, the max cosine to the seeded centroids (the same
    centroid set ivf_topk / dedup_semantic / kmeans_step share), the
    winning cell, and the OOD flag at the 0.15 floor. Centroid-
    distance OOD is the standard cheap screen before any density
    model.

    Exactness: cosine in float64 rounded 6 dp (module convention);
    the argmax ties break to the lowest cell exactly like
    assign_cell_expr.

    Plan/scale: pure literal-arithmetic codegen per vector — no
    join, no shuffle, fuses into the scan."""
    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    emb = _t(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    import math
    scores = []
    for c in cents:
        norm = math.sqrt(sum(x * x for x in c)) or 1.0
        scores.append(SIM._dot(vec, SIM._lit_double_array(c))
                      / (F.lit(norm) * SIM._norm(vec)))
    arr = F.array(*scores)
    best = F.array_max(arr)
    return (emb.select(
        "vec_id",
        (F.array_position(arr, best) - 1).cast("int").alias("best_cell"),
        F.round(best, 6).alias("best_cos"))
        .withColumn("is_ood", (F.col("best_cos") < 0.15).cast("int")))


def _ood_centroid_oracle() -> str:
    import math

    cents = SIM.seeded_centroids(_IVF_CENTROIDS, _IVF_DIM)
    rows = []
    for c, vec in enumerate(cents):
        lit = "[" + ", ".join(repr(x) for x in vec) + "]"
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        rows.append(f"({c}, {lit}::DOUBLE[], {norm!r})")
    values = ",\n   ".join(rows)
    return f"""
WITH cents(cell, cvec, cnorm) AS (VALUES
   {values}),
dots AS (
  SELECT e.vec_id, c.cell,
         list_sum(list_transform(range({_IVF_DIM}),
             i -> e.embedding[i+1]::DOUBLE * c.cvec[i+1]))
         / (c.cnorm * sqrt(list_sum(list_transform(range({_IVF_DIM}),
             i -> e.embedding[i+1]::DOUBLE * e.embedding[i+1]::DOUBLE))))
           AS s
  FROM embeddings e CROSS JOIN cents c),
best AS (
  SELECT vec_id, cell, s FROM (
    SELECT vec_id, cell, s,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY s DESC, cell ASC) AS rn
    FROM dots) WHERE rn = 1)
SELECT vec_id, CAST(cell AS INT) AS best_cell,
       round(s, 6) AS best_cos,
       CAST(CASE WHEN round(s, 6) < 0.15 THEN 1 ELSE 0 END AS INT)
         AS is_ood
FROM best
"""


ORACLE_EMBEDDINGS_OOD_CENTROID = _ood_centroid_oracle()


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


def q_text_script_detect(spark, sf_dir):
    """Unicode-SCRIPT census per document — the writing-system
    classifier that runs before any language model in a web-scale
    pipeline (langid over the wrong script is noise; CJK needs a
    different tokenizer; mixed-script is a spam/homograph signal):
    per-doc counts of Latin, Cyrillic, and Greek letters plus
    digits, the dominant script by count (ties break Latin >
    Cyrillic > Greek), and a mixed-script flag when two scripts
    both exceed 10% of letters.

    Fixture: a deterministic multi-script corpus derived from
    documents — doc_id%7==1 transliterates a/e/o to Cyrillic
    а/е/о, %7==2 transliterates a/e/o to Greek α/ε/ο, the rest
    stay ASCII (counts via literal-codepoint regexp ranges that
    parse identically under Java regex and RE2).

    Plan/scale: pure per-row codegen (replace + regexp strip +
    length) — no shuffle but the final tiny projection; fuses into
    the scan."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "text"))
    t = (F.when(F.col("doc_id") % 7 == 1,
                F.translate("text", "aeo", "аео"))
         .when(F.col("doc_id") % 7 == 2,
               F.translate("text", "aeo", "αεο"))
         .otherwise(F.col("text")))
    d = d.select("doc_id", t.alias("xt"))

    def n_of(pat):
        return (F.length("xt")
                - F.length(F.regexp_replace("xt", pat, ""))).cast("long")

    lat = n_of("[A-Za-z]")
    cyr = n_of("[Ѐ-ӿ]")
    grk = n_of("[Ͱ-Ͽ]")
    dig = n_of("[0-9]")
    d = d.select("doc_id", lat.alias("n_latin"), cyr.alias("n_cyrillic"),
                 grk.alias("n_greek"), dig.alias("n_digit"))
    letters = F.col("n_latin") + F.col("n_cyrillic") + F.col("n_greek")
    dom = (F.when((F.col("n_latin") >= F.col("n_cyrillic"))
                  & (F.col("n_latin") >= F.col("n_greek")), F.lit("latin"))
           .when(F.col("n_cyrillic") >= F.col("n_greek"), F.lit("cyrillic"))
           .otherwise(F.lit("greek")))
    n_big = ((F.col("n_latin") * 10 > letters).cast("int")
             + (F.col("n_cyrillic") * 10 > letters).cast("int")
             + (F.col("n_greek") * 10 > letters).cast("int"))
    return (d.withColumn("dominant", dom)
            .withColumn("is_mixed", (n_big >= 2).cast("int")))


ORACLE_TEXT_SCRIPT_DETECT = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 1
              THEN translate(text, 'aeo', 'аео')
              WHEN doc_id % 7 = 2
              THEN translate(text, 'aeo', 'αεο')
              ELSE text END AS xt
  FROM documents WHERE text IS NOT NULL),
c AS (
  SELECT doc_id,
         CAST(length(xt) - length(regexp_replace(xt, '[A-Za-z]', '', 'g'))
              AS BIGINT) AS n_latin,
         CAST(length(xt) - length(regexp_replace(xt,
              '[Ѐ-ӿ]', '', 'g')) AS BIGINT) AS n_cyrillic,
         CAST(length(xt) - length(regexp_replace(xt,
              '[Ͱ-Ͽ]', '', 'g')) AS BIGINT) AS n_greek,
         CAST(length(xt) - length(regexp_replace(xt, '[0-9]', '', 'g'))
              AS BIGINT) AS n_digit
  FROM x)
SELECT doc_id, n_latin, n_cyrillic, n_greek, n_digit,
       CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_greek THEN 'latin'
            WHEN n_cyrillic >= n_greek THEN 'cyrillic'
            ELSE 'greek' END AS dominant,
       CAST(CASE WHEN
            (CASE WHEN n_latin * 10 > n_latin + n_cyrillic + n_greek
                  THEN 1 ELSE 0 END)
          + (CASE WHEN n_cyrillic * 10 > n_latin + n_cyrillic + n_greek
                  THEN 1 ELSE 0 END)
          + (CASE WHEN n_greek * 10 > n_latin + n_cyrillic + n_greek
                  THEN 1 ELSE 0 END) >= 2
            THEN 1 ELSE 0 END AS INT) AS is_mixed
FROM c
"""


def q_events_burstiness(spark, sf_dir):
    """Per-user inter-arrival BURSTINESS (Goh & Barabási's
    B = (σ−μ)/(σ+μ) over the gap distribution) — the traffic-shape
    classifier behind bot/scanner triage and crawl-rate prediction:
    B → -1 is metronome-periodic (monitoring probes), B ≈ 0 is
    Poisson (organic), B → +1 is heavy-burst (humans, incidents).
    Users need >= 3 events (>= 2 gaps); σ is the population std
    computed exactly from integer second-gaps via the
    sqrt(n·S2 − S1²)/n closed form, so both engines agree to the
    6-dp round.

    Plan/scale: one per-user window lag (the sessionize shuffle
    shape — partition by the high-cardinality user key, no skew),
    then one map-side-combinable groupBy; gaps are BIGINT seconds
    (micros DIV 1e6) so S2 can't overflow at any realistic horizon.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    # unix_micros rejects TIMESTAMP_NTZ on Spark 4; session tz is UTC so
    # the cast is exact (same convention as events_ohlc)
    g = (ev.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
         .withColumn("gap_s", F.expr(
             "(us - lag(us) OVER (PARTITION BY user_id ORDER BY us))"
             " DIV 1000000"))
         .filter(F.col("gap_s").isNotNull()))
    agg = (g.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                F.sum("gap_s").cast("long").alias("s1"),
                F.sum(F.col("gap_s") * F.col("gap_s")).cast("long")
                .alias("s2"))
           .filter(F.col("n_gaps") >= 2))
    disc = F.sqrt((F.col("n_gaps") * F.col("s2")
                   - F.col("s1") * F.col("s1")).cast("double"))
    b = F.round((disc - F.col("s1")) / (disc + F.col("s1")), 6)
    return (agg.select(
        "user_id", "n_gaps",
        F.round(F.col("s1") / F.col("n_gaps"), 3).alias("mean_gap_s"),
        b.alias("burstiness"))
        .withColumn("traffic_class",
                    F.when(F.col("burstiness") < -0.1, F.lit("periodic"))
                    .when(F.col("burstiness") > 0.1, F.lit("bursty"))
                    .otherwise(F.lit("poisson"))))


ORACLE_EVENTS_BURSTINESS = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts))) // 1000000
           AS gap_s
  FROM events),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_s) AS BIGINT) AS s1,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
  HAVING count(*) >= 2),
sc AS (
  SELECT user_id, n_gaps,
         round(CAST(s1 AS DOUBLE) / n_gaps, 3) AS mean_gap_s,
         round((sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) - s1)
               / (sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + s1), 6)
           AS burstiness
  FROM agg)
SELECT user_id, n_gaps, mean_gap_s, burstiness,
       CASE WHEN burstiness < -0.1 THEN 'periodic'
            WHEN burstiness > 0.1 THEN 'bursty'
            ELSE 'poisson' END AS traffic_class
FROM sc
"""


def q_media_aspect_buckets(spark, sf_dir):
    """Aspect-ratio BUCKETING for batched vision training — the image
    analogue of corpus_length_buckets (SDXL-style bucketed batching:
    images batch with same-shape peers so the collate pads nothing):
    each image is assigned to the nearest of 5 canonical aspect
    buckets (1:2, 3:4, 1:1, 4:3, 2:1) by integer-scaled ratio
    thresholds, and the census reports per-bucket population, the
    mean scaled aspect, and the worst/average distortion (ppm vs the
    bucket's canonical ratio) a force-resize to the bucket shape
    would inflict.

    Fixture: deterministic (width, height) metadata derived from
    part keys — pixels are irrelevant to the bucketing math, which
    is the point: the planner runs on metadata only.

    Plan/scale: per-row integer codegen + ONE groupBy(bucket) with
    map-side combine — 5 groups regardless of corpus size; image
    bytes never enter the plan."""
    k = F.col("p_partkey")
    w = (F.lit(160) + (k % 13) * 32).cast("long")
    h = (F.lit(120) + ((k * 7) % 17) * 24).cast("long")
    d = (_t(spark, sf_dir, "part").select(
        k.alias("p_partkey"), w.alias("w"), h.alias("h")))
    a1000 = F.col("a1000")
    bucket = (F.when(a1000 < 625, F.lit("1:2"))
              .when(a1000 < 875, F.lit("3:4"))
              .when(a1000 < 1165, F.lit("1:1"))
              .when(a1000 < 1665, F.lit("4:3"))
              .otherwise(F.lit("2:1")))
    canon = (F.when(a1000 < 625, F.lit(500))
             .when(a1000 < 875, F.lit(750))
             .when(a1000 < 1165, F.lit(1000))
             .when(a1000 < 1665, F.lit(1333))
             .otherwise(F.lit(2000))).cast("long")
    staged = (d.select(F.expr("w * 1000 DIV h").alias("a1000"))
              .withColumn("bucket", bucket)
              .withColumn("canon", canon)
              .withColumn("dist_ppm",
                          F.expr("abs(a1000 - canon) * 1000000 DIV canon")))
    return (staged.groupBy("bucket")
            .agg(F.count(F.lit(1)).cast("long").alias("n_images"),
                 F.round(F.avg("a1000"), 3).alias("mean_a1000"),
                 F.max("dist_ppm").cast("long").alias("max_dist_ppm"),
                 F.expr("sum(dist_ppm) DIV count(*)").cast("long")
                 .alias("avg_dist_ppm")))


ORACLE_MEDIA_ASPECT_BUCKETS = """
WITH m AS (
  SELECT CAST(160 + (p_partkey % 13) * 32 AS BIGINT) AS w,
         CAST(120 + ((p_partkey * 7) % 17) * 24 AS BIGINT) AS h
  FROM part),
s AS (
  SELECT w * 1000 // h AS a1000,
         CASE WHEN w * 1000 // h < 625 THEN '1:2'
              WHEN w * 1000 // h < 875 THEN '3:4'
              WHEN w * 1000 // h < 1165 THEN '1:1'
              WHEN w * 1000 // h < 1665 THEN '4:3'
              ELSE '2:1' END AS bucket,
         CAST(CASE WHEN w * 1000 // h < 625 THEN 500
              WHEN w * 1000 // h < 875 THEN 750
              WHEN w * 1000 // h < 1165 THEN 1000
              WHEN w * 1000 // h < 1665 THEN 1333
              ELSE 2000 END AS BIGINT) AS canon
  FROM m),
t AS (
  SELECT bucket, a1000, abs(a1000 - canon) * 1000000 // canon AS dist_ppm
  FROM s)
SELECT bucket, CAST(count(*) AS BIGINT) AS n_images,
       round(avg(a1000), 3) AS mean_a1000,
       CAST(max(dist_ppm) AS BIGINT) AS max_dist_ppm,
       CAST(sum(dist_ppm) // count(*) AS BIGINT) AS avg_dist_ppm
FROM t GROUP BY bucket
"""


def q_events_cuped(spark, sf_dir):
    """CUPED variance reduction for the A/B lift row — the industry-
    standard adjustment (Deng et al., WSDM'13) events_ab_lift lacks:
    per user, X = pre-period spend (before 2024-01-15) and Y =
    post-period spend; theta = cov(X,Y)/var(X) pooled across arms;
    the adjusted outcome Y' = Y − theta·(X − E[X]) has the same mean
    but strictly lower variance when X predicts Y, tightening the
    experiment's CI at zero cost. Emits per-arm (user_id % 2) raw
    and adjusted means plus the pooled theta and the variance-
    reduction ppm.

    Exactness: spend is integer cents; theta and the adjusted means
    are closed-form ratios of exact integer sums (n·Sxy − Sx·Sy over
    n·Sxx − Sx²), so both engines compute identical doubles before
    the final round.

    Plan/scale: one per-user groupBy (map-side combinable), one
    broadcast of the 1-row pooled-stats frame, one 2-group agg —
    no per-user window, no skew."""
    cut = 19737  # epoch days: 2024-01-15
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    per_u = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("day") < cut, F.col("cents"))
                        .otherwise(F.lit(0))).cast("long").alias("x"),
                  F.sum(F.when(F.col("day") >= cut, F.col("cents"))
                        .otherwise(F.lit(0))).cast("long").alias("y"))
             .withColumn("grp", (F.col("user_id") % 2).cast("int")))
    stats = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))
    j = per_u.crossJoin(F.broadcast(stats))
    theta = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             .cast("double")
             / (F.col("n") * F.col("sxx")
                - F.col("sx") * F.col("sx")).cast("double"))
    mean_x = F.col("sx").cast("double") / F.col("n")
    var_y = ((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
             .cast("double")
             / (F.col("n").cast("double") * F.col("n")))
    # var(Y') = var(Y) - theta^2 var(X); reduction ppm = theta^2varX/varY
    var_x = ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
             .cast("double")
             / (F.col("n").cast("double") * F.col("n")))
    adj = F.col("y") - theta * (F.col("x") - mean_x)
    return (j.withColumn("yadj", adj)
            .withColumn("theta", theta)
            .withColumn("vr", theta * theta * var_x / var_y)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.round(F.avg(F.col("y").cast("double")), 3)
                 .alias("mean_y"),
                 F.round(F.avg("yadj"), 3).alias("mean_y_adj"),
                 F.round(F.first("theta"), 6).alias("theta"),
                 (F.round(F.first("vr") * 1000000).cast("long"))
                 .alias("var_reduction_ppm")))


ORACLE_EVENTS_CUPED = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day < 19737 THEN cents ELSE 0 END) AS BIGINT)
           AS x,
         CAST(sum(CASE WHEN day >= 19737 THEN cents ELSE 0 END) AS BIGINT)
           AS y,
         CAST(user_id % 2 AS INT) AS grp
  FROM ev GROUP BY user_id),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pu),
c AS (
  SELECT pu.grp, pu.y,
         pu.y - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
              * (pu.x - CAST(sx AS DOUBLE) / n) AS yadj,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
         (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE))
         * (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE))
         * (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n))
         / (CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n))
           AS vr
  FROM pu CROSS JOIN st)
SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
       round(avg(CAST(y AS DOUBLE)), 3) AS mean_y,
       round(avg(yadj), 3) AS mean_y_adj,
       round(any_value(theta), 6) AS theta,
       CAST(round(any_value(vr) * 1000000) AS BIGINT)
         AS var_reduction_ppm
FROM c GROUP BY grp
"""


def q_graph_local_clustering(spark, sf_dir):
    """Per-node LOCAL clustering coefficient — graph_triangles'
    census normalized into the spam feature rankers actually consume
    (c_v = 2·T_v / d_v(d_v−1)): link farms sit near c≈1, organic
    hubs much lower, so the coefficient separates what raw triangle
    counts can't (a big honest hub also has many triangles). Shares
    the t-graph fixture and the oriented wedge-close plan with
    graph_triangles; adds the degree census and the exact rational
    coefficient (round 6).

    Plan/scale: triangle counting is the standard low->high oriented
    wedge join (never all-pairs); degree is one census agg; the
    final join is tiny (per-node rows)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    raw = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("t"), (k % 30).cast("string")).alias("u"),
        F.concat(F.lit("t"), ((c % 30) % 20).cast("string")).alias("v"))
        .filter(F.col("u") != F.col("v")))
    und = (raw.select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("host_key"))
           .unionByName(und.select(F.col("b").alias("host_key")))
           .groupBy("host_key")
           .agg(F.count(F.lit(1)).cast("long").alias("degree")))
    wedge = (und.alias("x").join(und.alias("y"),
                                 F.col("x.a") == F.col("y.a"))
             .filter(F.col("x.b") < F.col("y.b"))
             .select(F.col("x.a").alias("a"), F.col("x.b").alias("b"),
                     F.col("y.b").alias("c")))
    tri = wedge.join(und.select(F.col("a").alias("b"),
                                F.col("b").alias("c")), ["b", "c"])
    corners = (tri.select(F.col("a").alias("host_key"))
               .unionByName(tri.select(F.col("b").alias("host_key")))
               .unionByName(tri.select(F.col("c").alias("host_key"))))
    tcnt = corners.groupBy("host_key").agg(
        F.count(F.lit(1)).cast("long").alias("n_tri"))
    out = (deg.join(tcnt, "host_key", "left")
           .withColumn("n_tri", F.coalesce("n_tri",
                                           F.lit(0).cast("long")))
           .filter(F.col("degree") >= 2))
    coeff = F.round(
        (2 * F.col("n_tri")).cast("double")
        / (F.col("degree") * (F.col("degree") - 1)).cast("double"), 6)
    return out.select("host_key", "degree", "n_tri",
                      coeff.alias("clustering"))


ORACLE_GRAPH_LOCAL_CLUSTERING = """
WITH raw AS (
  SELECT 't' || (o_orderkey % 30) AS u, 't' || ((o_custkey % 30) % 20) AS v
  FROM orders
  WHERE 't' || (o_orderkey % 30) <> 't' || ((o_custkey % 30) % 20)),
und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
deg AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS host_key FROM und UNION ALL SELECT b FROM und)
  GROUP BY host_key),
wedge AS (
  SELECT x.a AS a, x.b AS b, y.b AS c
  FROM und x JOIN und y ON x.a = y.a AND x.b < y.b),
tri AS (
  SELECT w.a, w.b, w.c FROM wedge w
  JOIN und e ON e.a = w.b AND e.b = w.c),
tc AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT a AS host_key FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri)
  GROUP BY host_key)
SELECT d.host_key, d.degree, CAST(coalesce(tc.n_tri, 0) AS BIGINT) AS n_tri,
       round(CAST(2 * coalesce(tc.n_tri, 0) AS DOUBLE)
             / (d.degree * (d.degree - 1)), 6) AS clustering
FROM deg d LEFT JOIN tc USING (host_key)
WHERE d.degree >= 2
"""


def q_frontier_tld_quota(spark, sf_dir):
    """Crawl-budget apportionment across TLD classes by the LARGEST-
    REMAINDER (Hamilton) method — the integer-exact way to split a
    global fetch budget proportionally when naive floor() leaves
    slots on the table and naive round() can over-allocate: each
    class gets floor(B·c/total), and the leftover slots go to the
    largest fractional remainders (ties broken on tld asc). Emits
    per-class population, base quota, remainder, and final quota —
    the per-class politeness budgets a scheduler wave consumes.

    Exactness: pure integer DIV/MOD; the remainder ranking is a
    deterministic (rem desc, tld asc) ordering in both engines.

    Plan/scale: one census groupBy to class cardinality (~10^2 TLD
    classes at web scale), then window ranking over that tiny frame —
    the URL stream itself never re-shuffles."""
    budget = 10000
    k = F.col("o_orderkey")
    tld = (F.when(k % 7 == 0, F.lit("onion"))
           .when(k % 7 == 1, F.lit("i2p"))
           .when(k % 7 < 4, F.lit("com"))
           .when(k % 7 < 6, F.lit("org"))
           .otherwise(F.lit("net")))
    cls = _t(spark, sf_dir, "orders").select(tld.alias("tld"))
    cen = cls.groupBy("tld").agg(F.count(F.lit(1)).cast("long")
                                 .alias("n_hosts"))
    tot = cen.agg(F.sum("n_hosts").cast("long").alias("total"))
    j = cen.crossJoin(F.broadcast(tot))
    j = (j.withColumn("base_quota",
                      F.expr(f"n_hosts * {budget} DIV total").cast("long"))
         .withColumn("rem",
                     F.expr(f"(n_hosts * {budget}) % total").cast("long")))
    wr = Window.orderBy(F.col("rem").desc(), F.col("tld").asc())
    wl = Window.partitionBy(F.lit(1))
    return (j.withColumn("rnk", F.row_number().over(wr))
            .withColumn("leftover",
                        F.lit(budget) - F.sum("base_quota").over(wl))
            .withColumn("quota",
                        (F.col("base_quota")
                         + (F.col("rnk") <= F.col("leftover"))
                         .cast("long")).cast("long"))
            .select("tld", "n_hosts", "base_quota", "rem", "quota"))


ORACLE_FRONTIER_TLD_QUOTA = """
WITH cls AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN 'onion'
              WHEN o_orderkey % 7 = 1 THEN 'i2p'
              WHEN o_orderkey % 7 < 4 THEN 'com'
              WHEN o_orderkey % 7 < 6 THEN 'org'
              ELSE 'net' END AS tld
  FROM orders),
cen AS (
  SELECT tld, CAST(count(*) AS BIGINT) AS n_hosts FROM cls GROUP BY tld),
j AS (
  SELECT tld, n_hosts,
         CAST(n_hosts * 10000 // (SELECT sum(n_hosts) FROM cen) AS BIGINT)
           AS base_quota,
         CAST((n_hosts * 10000) % (SELECT sum(n_hosts) FROM cen) AS BIGINT)
           AS rem
  FROM cen),
r AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, tld ASC) AS rnk,
         10000 - sum(base_quota) OVER () AS leftover
  FROM j)
SELECT tld, n_hosts, base_quota, rem,
       CAST(base_quota + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS quota
FROM r
"""


def q_text_moss_pairs(spark, sf_dir):
    """MOSS-style WINNOWING overlap pairs (Schleimer et al., SIGMOD'03)
    — the plagiarism/partial-reuse detector the whole-doc dedup family
    misses: per doc, hash every 4-gram shingle, slide a window of 5
    consecutive gram hashes and keep each window's MINIMUM (the
    winnowing guarantee: any shared run of >= w+k-1 tokens shares a
    selected fingerprint), then pair documents sharing >= 3 DISTINCT
    selected fingerprints. Hot fingerprints (df > 40) are dropped
    before pairing — the same max_df fan-out guard as
    dedup_ngram_jaccard.

    Plan/scale: the window-min runs inside a per-doc window (partition
    by the high-cardinality doc key — no skew, no global window); the
    pairing is a bucketed self-equi-join on fingerprint with df-capped
    fan-out, never all-pairs."""
    c = (_corpus(spark, sf_dir)
         .select("doc_id", F.split(F.col("text"), " ").alias("w"))
         .filter(F.size("w") >= 9))
    grams = F.transform(
        F.sequence(F.lit(0), F.size("w") - 5),
        lambda i: F.substring(
            F.md5(F.array_join(F.slice(F.col("w"), i + 1, 4), " ")), 1, 12))
    g = (c.select("doc_id", grams.alias("grams"))
         .select("doc_id", F.size("grams").alias("m"),
                 F.posexplode("grams").alias("pos", "h")))
    wmin = Window.partitionBy("doc_id").orderBy("pos") \
        .rowsBetween(0, 4)
    sel = (g.withColumn("fp", F.min("h").over(wmin))
           .filter(F.col("pos") <= F.col("m") - 5)
           .select("doc_id", "fp").distinct())
    df_guard = (sel.groupBy("fp")
                .agg(F.count(F.lit(1)).alias("df"))
                .filter(F.col("df") <= 40))
    kept = sel.join(df_guard.select("fp"), "fp")
    pairs = (kept.alias("x").join(kept.alias("y"), "fp")
             .filter(F.col("x.doc_id") < F.col("y.doc_id"))
             .select(F.col("x.doc_id").alias("doc_a"),
                     F.col("y.doc_id").alias("doc_b"), "fp"))
    return (pairs.groupBy("doc_a", "doc_b")
            .agg(F.countDistinct("fp").cast("long").alias("n_shared"))
            .filter(F.col("n_shared") >= 3))


ORACLE_TEXT_MOSS_PAIRS = f"""
WITH {_CORPUS_SQL},
b AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM corpus
  WHERE len(string_split(text, ' ')) >= 9),
gl AS (
  SELECT doc_id, list_transform(range(len(w) - 4),
             i -> substr(md5(array_to_string(
                      w[CAST(i+1 AS INT):CAST(i+4 AS INT)], ' ')), 1, 12))
           AS grams
  FROM b),
g AS (
  SELECT doc_id, len(grams) AS m, unnest(grams) AS h,
         generate_subscripts(grams, 1) - 1 AS pos
  FROM gl),
sel AS (
  SELECT DISTINCT doc_id, fp FROM (
    SELECT doc_id, pos, m,
           min(h) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS fp
    FROM g) WHERE pos <= m - 5),
guard AS (
  SELECT fp FROM sel GROUP BY fp HAVING count(*) <= 40),
kept AS (
  SELECT s.doc_id, s.fp FROM sel s JOIN guard USING (fp))
SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
       CAST(count(DISTINCT x.fp) AS BIGINT) AS n_shared
FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
GROUP BY x.doc_id, y.doc_id
HAVING count(DISTINCT x.fp) >= 3
"""


def q_frontier_rank_churn(spark, sf_dir):
    """Priority-rank CHURN between two scheduler rounds — the
    stability audit for any priority rewrite (aging, OPIC update,
    budget reshuffle): per host bucket, Spearman's footrule
    (sum |rank_a − rank_b|), the max single displacement, and the
    top-5 overlap between the old and new within-host orderings.
    A rewrite that churns the head of every host queue invalidates
    politeness pre-planning; one that only reorders the tail is
    safe to ship.

    Fixture: two deterministic scores over the same URL set
    (score_a = key % 97, score_b = key·31 % 97 — a reshuffle with
    partial correlation).

    Plan/scale: both rankings are windows PARTITIONED BY the host
    key (never a global window — rank churn is only meaningful, and
    only tractable, within a host's own queue); one join on
    (host, url), one census agg."""
    k = F.col("o_orderkey")
    base = _t(spark, sf_dir, "orders").select(
        k.alias("url_key"),
        F.concat(F.lit("h"), (k % 50).cast("string")).alias("host_key"),
        (k % 97).cast("long").alias("score_a"),
        ((k * 31) % 97).cast("long").alias("score_b"))
    wa = Window.partitionBy("host_key").orderBy(
        F.col("score_a").asc(), F.col("url_key").asc())
    wb = Window.partitionBy("host_key").orderBy(
        F.col("score_b").asc(), F.col("url_key").asc())
    ranked = (base.withColumn("ra", F.row_number().over(wa).cast("long"))
              .withColumn("rb", F.row_number().over(wb).cast("long")))
    disp = F.abs(F.col("ra") - F.col("rb"))
    return (ranked.groupBy("host_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                 F.sum(disp).cast("long").alias("footrule"),
                 F.max(disp).cast("long").alias("max_disp"),
                 F.sum(((F.col("ra") <= 5) & (F.col("rb") <= 5))
                       .cast("int")).cast("long").alias("top5_overlap")))


ORACLE_FRONTIER_RANK_CHURN = """
WITH base AS (
  SELECT o_orderkey AS url_key,
         'h' || (o_orderkey % 50) AS host_key,
         CAST(o_orderkey % 97 AS BIGINT) AS score_a,
         CAST((o_orderkey * 31) % 97 AS BIGINT) AS score_b
  FROM orders),
r AS (
  SELECT host_key,
         CAST(row_number() OVER (PARTITION BY host_key
              ORDER BY score_a ASC, url_key ASC) AS BIGINT) AS ra,
         CAST(row_number() OVER (PARTITION BY host_key
              ORDER BY score_b ASC, url_key ASC) AS BIGINT) AS rb
  FROM base)
SELECT host_key, CAST(count(*) AS BIGINT) AS n_urls,
       CAST(sum(abs(ra - rb)) AS BIGINT) AS footrule,
       CAST(max(abs(ra - rb)) AS BIGINT) AS max_disp,
       CAST(sum(CASE WHEN ra <= 5 AND rb <= 5 THEN 1 ELSE 0 END)
            AS BIGINT) AS top5_overlap
FROM r GROUP BY host_key
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


def q_corpus_freshness_value(spark, sf_dir):
    """Freshness-DECAYED corpus valuation — the recrawl economics
    row: a page's training/search value decays with staleness, so
    the scheduler should spend fetches where decayed value is
    recoverable. Each doc's base value (n_chars) halves per 30-day
    age bucket via EXACT integer shifts (value >> halvings — no
    float exp()); the per-source census reports base vs decayed
    totals, the retention ppm, and how many docs are stale-dead
    (>= 3 halvings, < 1/8 value left).

    Fixture: deterministic age_days = doc_id·3 mod 180.

    Plan/scale: per-row integer codegen + ONE census groupBy on the
    low-cardinality source key; map-side combine does the heavy
    lifting at 10^10 docs."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", "source", "n_chars"))
    age = (F.col("doc_id") * 3) % 180
    halv = F.expr("age_days DIV 30")
    st = (d.withColumn("age_days", age.cast("long"))
          .withColumn("halvings", halv.cast("long"))
          .withColumn("decayed",
                      F.expr("n_chars DIV shiftleft(1L, "
                             "CAST(halvings AS INT))").cast("long")))
    return (st.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_chars").cast("long").alias("base_value"),
                 F.sum("decayed").cast("long").alias("decayed_value"),
                 F.sum((F.col("halvings") >= 3).cast("int")).cast("long")
                 .alias("n_stale"))
            .withColumn("retention_ppm",
                        F.expr("decayed_value * 1000000 DIV base_value")
                        .cast("long")))


ORACLE_CORPUS_FRESHNESS_VALUE = """
WITH st AS (
  SELECT source, n_chars,
         CAST((doc_id * 3) % 180 AS BIGINT) AS age_days,
         CAST(((doc_id * 3) % 180) // 30 AS BIGINT) AS halvings,
         CAST(n_chars // (1 << (((doc_id * 3) % 180) // 30)) AS BIGINT)
           AS decayed
  FROM documents)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS base_value,
       CAST(sum(decayed) AS BIGINT) AS decayed_value,
       CAST(sum(CASE WHEN halvings >= 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stale,
       CAST(sum(decayed) * 1000000 // sum(n_chars) AS BIGINT)
         AS retention_ppm
FROM st GROUP BY source
"""


def q_graph_rich_club(spark, sf_dir):
    """RICH-CLUB coefficient ladder over the host graph — do the
    high-degree hubs preferentially link to EACH OTHER (phi(k) → 1:
    an elite link cartel / citation ring) or to the periphery
    (phi(k) low: organic hub-and-spoke)? For each degree threshold
    k in (2, 5, 10, 15): the club size n_k (nodes with degree > k),
    the intra-club edge count e_k, and phi = 2·e_k / (n_k·(n_k−1))
    in exact integer ppm.

    Plan/scale: degree census once; each edge is tagged with
    min(deg_a, deg_b) via two broadcast-size joins, then every
    ladder row is ONE conditional-sum census over the tagged edge
    list — the edge list is scanned once per aggregate set, never
    joined all-pairs; the ladder is 4 rows regardless of scale."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    raw = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("t"), (k % 30).cast("string")).alias("u"),
        F.concat(F.lit("t"), ((c % 30) % 20).cast("string")).alias("v"))
        .filter(F.col("u") != F.col("v")))
    und = (raw.select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("n"))
           .unionByName(und.select(F.col("b").alias("n")))
           .groupBy("n").agg(F.count(F.lit(1)).cast("long")
                             .alias("deg")))
    tagged = (und
              .join(deg.select(F.col("n").alias("a"),
                               F.col("deg").alias("da")), "a")
              .join(deg.select(F.col("n").alias("b"),
                               F.col("deg").alias("db")), "b")
              .select(F.least("da", "db").alias("md")))
    outs = []
    for thr in (2, 5, 10, 15):
        nk = deg.agg(
            F.sum((F.col("deg") > thr).cast("int")).cast("long")
            .alias("n_club"))
        ek = tagged.agg(
            F.sum((F.col("md") > thr).cast("int")).cast("long")
            .alias("n_edges"))
        outs.append(
            nk.crossJoin(ek)
            .select(F.lit(thr).cast("long").alias("k"),
                    "n_club", "n_edges",
                    F.when(F.col("n_club") >= 2,
                           F.expr("2 * n_edges * 1000000 DIV "
                                  "(n_club * (n_club - 1))"))
                    .otherwise(F.lit(None)).cast("long")
                    .alias("phi_ppm")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


ORACLE_GRAPH_RICH_CLUB = """
WITH raw AS (
  SELECT 't' || (o_orderkey % 30) AS u, 't' || ((o_custkey % 30) % 20) AS v
  FROM orders
  WHERE 't' || (o_orderkey % 30) <> 't' || ((o_custkey % 30) % 20)),
und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT a AS n FROM und UNION ALL SELECT b FROM und)
  GROUP BY n),
tagged AS (
  SELECT least(da.deg, db.deg) AS md
  FROM und
  JOIN deg da ON da.n = und.a
  JOIN deg db ON db.n = und.b),
ks AS (SELECT unnest([2, 5, 10, 15]) AS k),
lad AS (
  SELECT k,
         (SELECT CAST(sum(CASE WHEN deg > k THEN 1 ELSE 0 END) AS BIGINT)
          FROM deg) AS n_club,
         (SELECT CAST(sum(CASE WHEN md > k THEN 1 ELSE 0 END) AS BIGINT)
          FROM tagged) AS n_edges
  FROM ks)
SELECT CAST(k AS BIGINT) AS k, n_club, n_edges,
       CAST(CASE WHEN n_club >= 2
                 THEN 2 * n_edges * 1000000 // (n_club * (n_club - 1))
                 ELSE NULL END AS BIGINT) AS phi_ppm
FROM lad
"""


def q_media_metadata_scrub(spark, sf_dir):
    """EXIF-style metadata SCRUB plan — the privacy pass a multimodal
    training corpus runs before images ship (GPS coordinates, device
    serials, and capture timestamps are PII; orientation and software
    tags are benign and orientation is needed for correct decode):
    each image's key=value metadata is split, every key classified
    strip-pii / strip-forensic / keep, and the census reports per-key
    population, action, and the count of images that still carry any
    PII key (the audit gate must read 0 after the scrub runs).

    Fixture: deterministic per-image tag sets keyed on p_partkey —
    GPS on every 3rd image, serial on every 4th, the rest always on.

    Plan/scale: split + explode + ONE groupBy(key) census; tag
    cardinality is EXIF-bounded (~100s of keys at web scale), so the
    agg collapses map-side; pixel bytes never appear."""
    k = F.col("p_partkey")
    meta = F.concat(
        F.lit("Make=m"), (k % 5).cast("string"),
        F.lit(";Model=x"), (k % 7).cast("string"),
        F.lit(";Orientation="), (k % 8).cast("string"),
        F.lit(";DateTime=2024010"), (k % 9).cast("string"),
        F.when(k % 3 == 0,
               F.concat(F.lit(";GPSLat="), (k % 90).cast("string"),
                        F.lit(";GPSLon="), (k % 180).cast("string")))
        .otherwise(F.lit("")),
        F.when(k % 4 == 0,
               F.concat(F.lit(";SerialNumber=sn"), k.cast("string")))
        .otherwise(F.lit("")))
    d = _t(spark, sf_dir, "part").select(k.alias("img_id"),
                                         meta.alias("meta"))
    kv = d.select(F.explode(F.split("meta", ";")).alias("pair"))
    keyed = kv.select(F.substring_index("pair", "=", 1).alias("tag"))
    action = (F.when(F.col("tag").startswith("GPS"), F.lit("strip-pii"))
              .when(F.col("tag") == "SerialNumber",
                    F.lit("strip-forensic"))
              .when(F.col("tag") == "DateTime", F.lit("strip-pii"))
              .otherwise(F.lit("keep")))
    return (keyed.groupBy("tag")
            .agg(F.count(F.lit(1)).cast("long").alias("n_images"))
            .withColumn("action", action)
            .withColumn("is_blocked",
                        (F.col("action") != "keep").cast("int")))


ORACLE_MEDIA_METADATA_SCRUB = """
WITH d AS (
  SELECT 'Make=m' || (p_partkey % 5)
         || ';Model=x' || (p_partkey % 7)
         || ';Orientation=' || (p_partkey % 8)
         || ';DateTime=2024010' || (p_partkey % 9)
         || CASE WHEN p_partkey % 3 = 0
                 THEN ';GPSLat=' || (p_partkey % 90)
                      || ';GPSLon=' || (p_partkey % 180)
                 ELSE '' END
         || CASE WHEN p_partkey % 4 = 0
                 THEN ';SerialNumber=sn' || p_partkey
                 ELSE '' END AS meta
  FROM part),
kv AS (SELECT unnest(string_split(meta, ';')) AS pair FROM d),
keyed AS (SELECT string_split(pair, '=')[1] AS tag FROM kv),
cen AS (
  SELECT tag, CAST(count(*) AS BIGINT) AS n_images
  FROM keyed GROUP BY tag)
SELECT tag, n_images,
       CASE WHEN tag LIKE 'GPS%' THEN 'strip-pii'
            WHEN tag = 'SerialNumber' THEN 'strip-forensic'
            WHEN tag = 'DateTime' THEN 'strip-pii'
            ELSE 'keep' END AS action,
       CAST(CASE WHEN (CASE WHEN tag LIKE 'GPS%' THEN 'strip-pii'
            WHEN tag = 'SerialNumber' THEN 'strip-forensic'
            WHEN tag = 'DateTime' THEN 'strip-pii'
            ELSE 'keep' END) <> 'keep' THEN 1 ELSE 0 END AS INT)
         AS is_blocked
FROM cen
"""


def q_corpus_license_gate(spark, sf_dir):
    """LICENSE admission gate — the compliance filter a commercial
    training corpus runs before anything else (data you may not
    train on is worse than data you didn't crawl): each doc carries
    a license tag extracted from its header line; tags map to
    admit (cc0, cc-by, mit), admit-with-attribution (cc-by-sa), or
    reject (all-rights-reserved, UNKNOWN); the census reports docs
    and total chars per verdict class plus the rejected-mass ppm —
    the number legal review asks for first.

    Fixture: a deterministic license header prepended by doc_id
    mod 6 (every 6th doc carries no tag at all → UNKNOWN).

    Plan/scale: regexp extract + CASE ladder + ONE census groupBy
    on a 3-class key; pure map-side."""
    lic = (F.when(F.col("doc_id") % 6 == 0, F.lit(""))
           .when(F.col("doc_id") % 6 == 1, F.lit("license: cc0\n"))
           .when(F.col("doc_id") % 6 == 2, F.lit("license: cc-by\n"))
           .when(F.col("doc_id") % 6 == 3, F.lit("license: cc-by-sa\n"))
           .when(F.col("doc_id") % 6 == 4, F.lit("license: mit\n"))
           .otherwise(F.lit("license: all-rights-reserved\n")))
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "n_chars",
                 F.concat(lic, F.col("text")).alias("page")))
    tag = F.regexp_extract("page", r"^license: ([a-z0-9-]+)\n", 1)
    verdict = (F.when(tag.isin("cc0", "cc-by", "mit"), F.lit("admit"))
               .when(tag == "cc-by-sa", F.lit("admit-attribution"))
               .otherwise(F.lit("reject")))
    staged = d.select("n_chars", verdict.alias("verdict"))
    cen = (staged.groupBy("verdict")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("n_chars")))
    tot = cen.agg(F.sum("n_chars").cast("long").alias("total"))
    return (cen.crossJoin(F.broadcast(tot))
            .withColumn("class_ppm",
                        F.expr("n_chars * 1000000 DIV total")
                        .cast("long"))
            .drop("total"))


ORACLE_CORPUS_LICENSE_GATE = """
WITH d AS (
  SELECT doc_id, n_chars,
         CASE WHEN doc_id % 6 = 0 THEN ''
              WHEN doc_id % 6 = 1 THEN 'license: cc0' || chr(10)
              WHEN doc_id % 6 = 2 THEN 'license: cc-by' || chr(10)
              WHEN doc_id % 6 = 3 THEN 'license: cc-by-sa' || chr(10)
              WHEN doc_id % 6 = 4 THEN 'license: mit' || chr(10)
              ELSE 'license: all-rights-reserved' || chr(10) END
         || text AS page
  FROM documents WHERE text IS NOT NULL),
t AS (
  SELECT n_chars,
         coalesce(regexp_extract(page,
             '^license: ([a-z0-9-]+)' || chr(10), 1), '') AS tag
  FROM d),
v AS (
  SELECT n_chars,
         CASE WHEN tag IN ('cc0', 'cc-by', 'mit') THEN 'admit'
              WHEN tag = 'cc-by-sa' THEN 'admit-attribution'
              ELSE 'reject' END AS verdict
  FROM t),
cen AS (
  SELECT verdict, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS n_chars
  FROM v GROUP BY verdict)
SELECT verdict, n_docs, n_chars,
       CAST(n_chars * 1000000 // (SELECT sum(n_chars) FROM cen) AS BIGINT)
         AS class_ppm
FROM cen
"""


def q_events_power_sample_size(spark, sf_dir):
    """A/B POWER ANALYSIS from observed variance — the planning row
    that pairs with events_ab_lift/events_cuped: given the measured
    per-user spend distribution, how many users per arm does a
    two-sided alpha=0.05, power=0.80 test need to detect a 1% / 2% /
    5% lift? n = ceil(2·(z_a + z_b)²·sigma² / delta²) with the
    standard normal constants (1.959964, 0.841621) — the classic
    two-sample closed form.

    Exactness: mean and population variance come from exact integer
    cent sums (n·S2 − S1² over n²); the z constants are fixed
    literals; both engines evaluate the identical double expression
    before ceil.

    Plan/scale: one per-user groupBy, one 1-row stats agg, a 3-row
    literal ladder joined to it — nothing scales with the event
    count but the first census."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    per_u = ev.groupBy("user_id").agg(
        F.sum("cents").cast("long").alias("spend"))
    st = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("spend").cast("long").alias("s1"),
        F.sum(F.col("spend") * F.col("spend")).cast("long").alias("s2"))
    lad = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(20), F.lit(50)))
        .alias("lift_pm"))  # per-mille lift targets: 1%, 2%, 5%
    j = lad.crossJoin(F.broadcast(st))
    mean = F.col("s1").cast("double") / F.col("n")
    var = ((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
           .cast("double") / (F.col("n").cast("double") * F.col("n")))
    delta = mean * F.col("lift_pm").cast("double") / 1000.0
    zz = F.lit((1.959964 + 0.841621) ** 2)
    n_req = F.ceil(F.lit(2.0) * zz * var / (delta * delta)).cast("long")
    return j.select(
        F.col("lift_pm").cast("long").alias("lift_pm"),
        F.round(mean, 3).alias("mean_spend"),
        F.round(var, 3).alias("var_spend"),
        n_req.alias("n_per_arm"))


ORACLE_EVENTS_POWER_SAMPLE_SIZE = """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend
  FROM events GROUP BY user_id),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(spend) AS BIGINT) AS s1,
         CAST(sum(spend * spend) AS BIGINT) AS s2
  FROM pu),
lad AS (SELECT unnest([10, 20, 50]) AS lift_pm)
SELECT CAST(lift_pm AS BIGINT) AS lift_pm,
       round(CAST(s1 AS DOUBLE) / n, 3) AS mean_spend,
       round(CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n), 3)
         AS var_spend,
       CAST(ceil(2.0 * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
            * (CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
            / ((CAST(s1 AS DOUBLE) / n * lift_pm / 1000.0)
               * (CAST(s1 AS DOUBLE) / n * lift_pm / 1000.0)))
            AS BIGINT) AS n_per_arm
FROM lad CROSS JOIN st
"""


def q_events_markov_entropy(spark, sf_dir):
    """Per-state ENTROPY of the behavior Markov chain — the
    predictability metric events_markov's raw matrix doesn't give:
    for each source state, H_i = −Σ p·log2(p) over its successor
    distribution (0 bits = deterministic next step, log2(k) =
    uniform chaos), the normalized H/log2(n_succ), and the state's
    share of all transitions — together the weighted entropy rate
    of the chain, the standard bot-vs-human and cache-predictor
    feature.

    Exactness: p = n/tot from exact integer counts; per-state sums
    run over <= |event_types| terms so the 4-dp round absorbs float
    association; log2 via ln/ln(2) in both engines.

    Plan/scale: the same lag window as events_markov (partition by
    user), then two tiny groupBys on the O(types²) matrix."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                            "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    c = (pairs.groupBy("prev_type", "event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    t = (c.groupBy("prev_type")
         .agg(F.sum("n").cast("long").alias("tot"),
              F.count(F.lit(1)).cast("long").alias("n_succ")))
    j = c.join(t, "prev_type")
    term = ((F.col("n").cast("double") / F.col("tot"))
            * (F.log(F.col("tot").cast("double"))
               - F.log(F.col("n").cast("double"))) / F.log(F.lit(2.0)))
    per = (j.withColumn("term", term)
           .groupBy("prev_type")
           .agg(F.first("tot").alias("tot"),
                F.first("n_succ").alias("n_succ"),
                F.round(F.sum("term"), 4).alias("h_bits")))
    gt = per.agg(F.sum("tot").cast("long").alias("grand"))
    return (per.crossJoin(F.broadcast(gt))
            .select("prev_type", F.col("tot").alias("n_trans"),
                    "n_succ", "h_bits",
                    F.when(F.col("n_succ") > 1,
                           F.round(F.col("h_bits")
                                   / (F.log(F.col("n_succ")
                                            .cast("double"))
                                      / F.log(F.lit(2.0))), 4))
                    .otherwise(F.lit(0.0)).alias("h_norm"),
                    F.expr("tot * 1000000 DIV grand").cast("long")
                    .alias("weight_ppm")))


ORACLE_EVENTS_MARKOV_ENTROPY = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
t AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n_succ
  FROM c GROUP BY prev_type),
per AS (
  SELECT c.prev_type, any_value(t.tot) AS tot,
         any_value(t.n_succ) AS n_succ,
         round(sum((CAST(c.n AS DOUBLE) / t.tot)
                   * (ln(CAST(t.tot AS DOUBLE)) - ln(CAST(c.n AS DOUBLE)))
                   / ln(2.0)), 4) AS h_bits
  FROM c JOIN t USING (prev_type) GROUP BY c.prev_type)
SELECT prev_type, tot AS n_trans, n_succ, h_bits,
       CASE WHEN n_succ > 1
            THEN round(h_bits / (ln(CAST(n_succ AS DOUBLE)) / ln(2.0)), 4)
            ELSE 0.0 END AS h_norm,
       CAST(tot * 1000000 // (SELECT sum(tot) FROM per) AS BIGINT)
         AS weight_ppm
FROM per
"""


def q_host_error_burn(spark, sf_dir):
    """SLO error-budget BURN RATE per host — the Google-SRE
    multi-window alert math applied to fetch health: with a 99%
    success SLO (budget = 10000 ppm errors), burn = error_rate /
    budget; the fast window (last 1 day) catches pages at burn >=
    14.4x, the slow window (last 7 days) catches tickets at >= 3x —
    a host burning fast gets its crawl rate cut before it wastes
    the wave's fetch budget.

    Exactness: integer day buckets anchored at the corpus max day
    (deterministic), error rates in exact ppm, burn in exact
    centi-x (rate_ppm·100 DIV 10000).

    Plan/scale: one census groupBy(host) with conditional sums for
    both windows in a single pass (no per-window re-scan); the
    anchor day broadcasts as a 1-row frame."""
    ev = (_t(spark, sf_dir, "events")
          .select((F.col("user_id") % 20).cast("long").alias("host_id"),
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  (F.col("event_type") == "error").cast("int")
                  .alias("is_err")))
    mx = ev.agg(F.max("day").alias("max_day"))
    j = ev.crossJoin(F.broadcast(mx))
    in1 = F.col("day") > F.col("max_day") - 1
    in7 = F.col("day") > F.col("max_day") - 7
    cen = (j.groupBy("host_id")
           .agg(F.sum(in7.cast("int")).cast("long").alias("n7"),
                F.sum((in7.cast("int") * F.col("is_err")))
                .cast("long").alias("e7"),
                F.sum(in1.cast("int")).cast("long").alias("n1"),
                F.sum((in1.cast("int") * F.col("is_err")))
                .cast("long").alias("e1"))
           .filter(F.col("n7") > 0))
    r1 = F.when(F.col("n1") > 0,
                F.expr("e1 * 1000000 DIV n1")).otherwise(F.lit(0)) \
        .cast("long")
    r7 = F.expr("e7 * 1000000 DIV n7").cast("long")
    out = (cen.withColumn("rate1_ppm", r1)
           .withColumn("rate7_ppm", r7)
           .withColumn("burn1_centi",
                       F.expr("rate1_ppm * 100 DIV 10000").cast("long"))
           .withColumn("burn7_centi",
                       F.expr("rate7_ppm * 100 DIV 10000").cast("long")))
    verdict = (F.when(F.col("burn1_centi") >= 1440, F.lit("page"))
               .when(F.col("burn7_centi") >= 300, F.lit("ticket"))
               .otherwise(F.lit("ok")))
    return out.select("host_id", "n7", "e7", "n1", "e1",
                      "rate1_ppm", "rate7_ppm", "burn1_centi",
                      "burn7_centi", verdict.alias("verdict"))


ORACLE_HOST_ERROR_BURN = """
WITH ev AS (
  SELECT CAST(user_id % 20 AS BIGINT) AS host_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events),
mx AS (SELECT max(day) AS max_day FROM ev),
cen AS (
  SELECT host_id,
         CAST(sum(CASE WHEN day > max_day - 7 THEN 1 ELSE 0 END)
              AS BIGINT) AS n7,
         CAST(sum(CASE WHEN day > max_day - 7 THEN is_err ELSE 0 END)
              AS BIGINT) AS e7,
         CAST(sum(CASE WHEN day > max_day - 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n1,
         CAST(sum(CASE WHEN day > max_day - 1 THEN is_err ELSE 0 END)
              AS BIGINT) AS e1
  FROM ev CROSS JOIN mx GROUP BY host_id
  HAVING sum(CASE WHEN day > max_day - 7 THEN 1 ELSE 0 END) > 0),
r AS (
  SELECT host_id, n7, e7, n1, e1,
         CAST(CASE WHEN n1 > 0 THEN e1 * 1000000 // n1 ELSE 0 END
              AS BIGINT) AS rate1_ppm,
         CAST(e7 * 1000000 // n7 AS BIGINT) AS rate7_ppm
  FROM cen)
SELECT host_id, n7, e7, n1, e1, rate1_ppm, rate7_ppm,
       CAST(rate1_ppm * 100 // 10000 AS BIGINT) AS burn1_centi,
       CAST(rate7_ppm * 100 // 10000 AS BIGINT) AS burn7_centi,
       CASE WHEN rate1_ppm * 100 // 10000 >= 1440 THEN 'page'
            WHEN rate7_ppm * 100 // 10000 >= 300 THEN 'ticket'
            ELSE 'ok' END AS verdict
FROM r
"""


def q_embeddings_hubness_audit(spark, sf_dir):
    """HUBNESS audit of the exact 5-NN graph — the curse-of-
    dimensionality diagnostic every ANN deployment should run
    (Radovanović et al., JMLR'10): in high dimension the
    k-occurrence distribution N_k skews — a few 'hub' vectors
    appear in everyone's top-k while 'anti-hubs' appear in no one's,
    and both distort recall measurement and retrieval diversity.
    Per vector: how many OTHER vectors' exact top-5 it appears in,
    plus hub (N_5 >= 2k) and anti-hub (N_5 = 0) flags.

    Exactness: exact float64 cosine, ties broken on neighbor id —
    the same convention as ann_cosine_topk; counts are integers.

    Plan/scale: at audit time the k-occurrence census is ONE
    groupBy over the kNN edge list — the expensive part is the kNN
    graph itself, which at scale comes from the banded/IVF paths
    (ann_*), not the all-pairs join used on this fixture."""
    emb = _t(spark, sf_dir, "embeddings")
    knn = SIM.cosine_topk(emb, emb, k=5)
    occ = (knn.groupBy(F.col("neighbor_id").alias("vec_id"))
           .agg(F.count(F.lit(1)).cast("long").alias("n5")))
    return (emb.select("vec_id").join(occ, "vec_id", "left")
            .withColumn("n5", F.coalesce("n5", F.lit(0).cast("long")))
            .withColumn("is_hub", (F.col("n5") >= 10).cast("int"))
            .withColumn("is_antihub", (F.col("n5") == 0).cast("int")))


ORACLE_EMBEDDINGS_HUBNESS_AUDIT = """
WITH scored AS (
  SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(q.embedding)),
             i -> q.embedding[i+1]::DOUBLE * q.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(b.embedding)),
             i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE))))
         AS cos
  FROM embeddings q JOIN embeddings b ON b.vec_id != q.vec_id),
knn AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id ASC) AS rnk
    FROM scored) WHERE rnk <= 5),
occ AS (
  SELECT neighbor_id AS vec_id, CAST(count(*) AS BIGINT) AS n5
  FROM knn GROUP BY neighbor_id)
SELECT e.vec_id, CAST(coalesce(o.n5, 0) AS BIGINT) AS n5,
       CAST(CASE WHEN coalesce(o.n5, 0) >= 10 THEN 1 ELSE 0 END AS INT)
         AS is_hub,
       CAST(CASE WHEN coalesce(o.n5, 0) = 0 THEN 1 ELSE 0 END AS INT)
         AS is_antihub
FROM embeddings e LEFT JOIN occ o ON o.vec_id = e.vec_id
"""


def q_events_trend_mk(spark, sf_dir):
    """MANN-KENDALL trend test on daily traffic — the nonparametric
    answer to 'is this host's activity actually trending or just
    noisy?' that the change-point row (a single break) can't give:
    S = Σ sign(x_j − x_i) over all ordered day pairs, Var(S) =
    n(n−1)(2n+5)/18 (no ties correction — day counts rarely tie,
    and the convention is pinned), z = (S∓1)/sqrt(Var) with the
    standard continuity correction, verdict at |z| >= 1.96. Per
    event_type, so marketing can see signups trending while errors
    hold flat.

    Exactness: S and Var(S) are exact integers; z is one double
    division rounded 4 dp.

    Plan/scale: daily counts first (the census shrinks 10^10 events
    to n_types×n_days rows), THEN the O(days²) pair join runs on
    the tiny aggregate — never on raw events."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day")))
    daily = (ev.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                    & (F.col("a.day") < F.col("b.day")))
             .select(F.col("a.event_type").alias("event_type"),
                     F.signum((F.col("b.n") - F.col("a.n"))
                              .cast("double")).cast("long").alias("sgn")))
    s = (pairs.groupBy("event_type")
         .agg(F.sum("sgn").cast("long").alias("s_stat")))
    nd = (daily.groupBy("event_type")
          .agg(F.count(F.lit(1)).cast("long").alias("n_days")))
    j = s.join(nd, "event_type")
    var = (F.col("n_days") * (F.col("n_days") - 1)
           * (2 * F.col("n_days") + 5) / 18.0)
    z = (F.when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1) / F.sqrt(var))
         .when(F.col("s_stat") < 0,
               (F.col("s_stat") + 1) / F.sqrt(var))
         .otherwise(F.lit(0.0)))
    return (j.withColumn("z", F.round(z, 4))
            .withColumn("trend",
                        F.when(F.col("z") >= 1.96, F.lit("increasing"))
                        .when(F.col("z") <= -1.96, F.lit("decreasing"))
                        .otherwise(F.lit("no-trend")))
            .select("event_type", "n_days", "s_stat", "z", "trend"))


ORACLE_EVENTS_TREND_MK = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
p AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.n > a.n THEN 1
                       WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY a.event_type),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type),
j AS (
  SELECT p.event_type, nd.n_days, p.s_stat,
         round(CASE WHEN p.s_stat > 0 THEN
                 (p.s_stat - 1) / sqrt(nd.n_days * (nd.n_days - 1)
                                       * (2 * nd.n_days + 5) / 18.0)
               WHEN p.s_stat < 0 THEN
                 (p.s_stat + 1) / sqrt(nd.n_days * (nd.n_days - 1)
                                       * (2 * nd.n_days + 5) / 18.0)
               ELSE 0.0 END, 4) AS z
  FROM p JOIN nd USING (event_type))
SELECT event_type, n_days, s_stat, z,
       CASE WHEN z >= 1.96 THEN 'increasing'
            WHEN z <= -1.96 THEN 'decreasing'
            ELSE 'no-trend' END AS trend
FROM j
"""


def q_text_invisible_chars(spark, sf_dir):
    """INVISIBLE-character census — the zero-width watermark /
    tracking-payload scrub a clean corpus needs (zero-width spaces
    and joiners fingerprint leaked documents, steganographic
    watermarks survive copy-paste, and soft hyphens break exact
    dedup silently): per doc, counts of ZWSP (U+200B), ZWNJ
    (U+200C), ZWJ (U+200D), and soft hyphen (U+00AD), the total
    invisible mass, the scrubbed length, and the watermark flag
    (>= 4 zero-width marks is a deliberate payload, not an
    artifact).

    Fixture: deterministic injection — every 4th doc gets ZWSPs
    after each 10th word, every 7th gets soft hyphens; injected
    via portable replace on both engines.

    Plan/scale: per-row replace + length codegen, no shuffle; the
    scrub itself is the same regexp_replace the census counts."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    zwsp, zwnj, zwj, shy = "​", "‌", "‍", "­"
    t = F.col("text")
    t = F.when(F.col("doc_id") % 4 == 0,
               F.regexp_replace(t, r"((?:\S+ ){10})", "$1" + zwsp)) \
        .otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.regexp_replace(t, "scan ", "sc" + shy + "an ")) \
        .otherwise(t)
    d = d.select("doc_id", t.alias("xt"))

    def n_of(ch):
        return (F.length("xt")
                - F.length(F.regexp_replace("xt", ch, ""))).cast("long")

    inv = "[" + zwsp + zwnj + zwj + shy + "]"
    return (d.select(
        "doc_id",
        n_of(zwsp).alias("n_zwsp"), n_of(zwnj).alias("n_zwnj"),
        n_of(zwj).alias("n_zwj"), n_of(shy).alias("n_shy"),
        n_of(inv).alias("n_invisible"),
        F.length(F.regexp_replace("xt", inv, "")).cast("long")
        .alias("clean_len"))
        .withColumn("is_watermarked",
                    ((F.col("n_zwsp") + F.col("n_zwnj")
                      + F.col("n_zwj")) >= 4).cast("int")))


ORACLE_TEXT_INVISIBLE_CHARS = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN replace(t1, 'scan ',
                   'sc' || chr(173) || 'an ')
              ELSE t1 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN regexp_replace(text, '((?:\\S+ ){10})',
                                    '\\1' || chr(8203), 'g')
                ELSE text END AS t1
    FROM documents WHERE text IS NOT NULL))
SELECT doc_id,
       CAST(length(xt) - length(replace(xt, chr(8203), '')) AS BIGINT)
         AS n_zwsp,
       CAST(length(xt) - length(replace(xt, chr(8204), '')) AS BIGINT)
         AS n_zwnj,
       CAST(length(xt) - length(replace(xt, chr(8205), '')) AS BIGINT)
         AS n_zwj,
       CAST(length(xt) - length(replace(xt, chr(173), '')) AS BIGINT)
         AS n_shy,
       CAST(length(xt) - length(regexp_replace(xt,
            '[' || chr(8203) || chr(8204) || chr(8205) || chr(173) || ']',
            '', 'g')) AS BIGINT) AS n_invisible,
       CAST(length(regexp_replace(xt,
            '[' || chr(8203) || chr(8204) || chr(8205) || chr(173) || ']',
            '', 'g')) AS BIGINT) AS clean_len,
       CAST(CASE WHEN (length(xt) - length(replace(xt, chr(8203), '')))
                    + (length(xt) - length(replace(xt, chr(8204), '')))
                    + (length(xt) - length(replace(xt, chr(8205), '')))
                    >= 4 THEN 1 ELSE 0 END AS INT) AS is_watermarked
FROM x
"""


def q_frontier_schedule_smear(spark, sf_dir):
    """Crawl-schedule SMEAR audit — when every politeness timer fires
    'at the top of the hour', the fetch fleet thunders in herds; the
    fix is a deterministic per-host offset (hash % 60 minutes) that
    smears load flat. This row audits the smear: per minute slot,
    the host count and fetch mass landing there, plus each slot's
    deviation from the ideal uniform share — a max/ideal ratio near
    1 means the herd is gone.

    Exactness: slot = xxhash-free md5-based integer (first 8 hex
    digits of md5(host) as a BIGINT, mod 60 — portable to DuckDB);
    deviation in exact ppm.

    Plan/scale: one groupBy(slot) census over the host table —
    60 output rows at any scale; the smear function itself is the
    per-row hash the scheduler would apply at enqueue time."""
    k = F.col("o_orderkey")
    hosts = (_t(spark, sf_dir, "orders")
             .select(F.concat(F.lit("h"), (k % 997).cast("string"))
                     .alias("host_key"),
                     (k % 40 + 1).cast("long").alias("n_fetches"))
             .groupBy("host_key")
             .agg(F.sum("n_fetches").cast("long").alias("n_fetches")))
    slot = (F.conv(F.substring(F.md5("host_key"), 1, 8), 16, 10)
            .cast("long") % 60)
    cen = (hosts.withColumn("slot", slot)
           .groupBy("slot")
           .agg(F.count(F.lit(1)).cast("long").alias("n_hosts"),
                F.sum("n_fetches").cast("long").alias("slot_mass")))
    tot = cen.agg(F.sum("slot_mass").cast("long").alias("total"),
                  F.count(F.lit(1)).cast("long").alias("n_slots"))
    return (cen.crossJoin(F.broadcast(tot))
            .withColumn("share_ppm",
                        F.expr("slot_mass * 1000000 DIV total")
                        .cast("long"))
            .withColumn("dev_ppm",
                        F.expr("abs(slot_mass * n_slots - total) "
                               "* 1000000 DIV total").cast("long"))
            .select("slot", "n_hosts", "slot_mass", "share_ppm",
                    "dev_ppm"))


ORACLE_FRONTIER_SCHEDULE_SMEAR = """
WITH hosts AS (
  SELECT 'h' || (o_orderkey % 997) AS host_key,
         CAST(sum(o_orderkey % 40 + 1) AS BIGINT) AS n_fetches
  FROM orders GROUP BY host_key),
cen AS (
  SELECT CAST(('0x' || substr(md5(host_key), 1, 8))::BIGINT % 60
              AS BIGINT) AS slot,
         CAST(count(*) AS BIGINT) AS n_hosts,
         CAST(sum(n_fetches) AS BIGINT) AS slot_mass
  FROM hosts GROUP BY 1),
tot AS (
  SELECT CAST(sum(slot_mass) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS n_slots FROM cen)
SELECT slot, n_hosts, slot_mass,
       CAST(slot_mass * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(abs(slot_mass * n_slots - total) * 1000000 // total AS BIGINT)
         AS dev_ppm
FROM cen CROSS JOIN tot
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


def q_corpus_span_corruption(spark, sf_dir):
    """T5-style SPAN-CORRUPTION pretraining plan (Raffel et al.,
    JMLR'20) — the batch-shape calculator every seq2seq data pipeline
    runs before packing: with noise_density 0.15 and mean span 3,
    each doc yields round(n·0.15) masked tokens in round(noise/3)
    spans (>= 1 each, T5's clamps), one sentinel per span on the
    input side and spans+1 tokens of overhead on the target side —
    giving exact input/target lengths for the packer and the
    per-source census of total sentinel overhead.

    Exactness: round() is floor(x + 0.5) EXPLICITLY in both engines
    (HALF_UP vs banker's round on the .5 boundary is a real
    divergence — the flesch convention); everything else is integer.

    Plan/scale: per-row integer codegen + one census groupBy on
    source; no shuffle before it."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "source",
                 F.size(F.split("text", " ")).cast("long")
                 .alias("n_tokens")))
    noise = F.floor(F.col("n_tokens") * 0.15 + 0.5).cast("long")
    d = d.withColumn("n_noise", F.greatest(noise, F.lit(1).cast("long")))
    spans = F.greatest(F.floor(F.col("n_noise") / 3.0 + 0.5),
                       F.lit(1).cast("double")).cast("long")
    d = (d.withColumn("n_spans", spans)
         .withColumn("input_len",
                     (F.col("n_tokens") - F.col("n_noise")
                      + F.col("n_spans")).cast("long"))
         .withColumn("target_len",
                     (F.col("n_noise") + F.col("n_spans") + 1)
                     .cast("long")))
    return (d.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("n_tokens").cast("long").alias("tokens"),
                 F.sum("n_noise").cast("long").alias("noise_tokens"),
                 F.sum("n_spans").cast("long").alias("sentinels"),
                 F.sum("input_len").cast("long").alias("input_tokens"),
                 F.sum("target_len").cast("long").alias("target_tokens"))
            .withColumn("overhead_ppm",
                        F.expr("(input_tokens + target_tokens - tokens) "
                               "* 1000000 DIV tokens").cast("long")))


ORACLE_CORPUS_SPAN_CORRUPTION = """
WITH d AS (
  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents WHERE text IS NOT NULL),
p AS (
  SELECT source, n_tokens,
         greatest(CAST(floor(n_tokens * 0.15 + 0.5) AS BIGINT), 1)
           AS n_noise
  FROM d),
s AS (
  SELECT source, n_tokens, n_noise,
         CAST(greatest(floor(n_noise / 3.0 + 0.5), 1) AS BIGINT)
           AS n_spans
  FROM p),
f AS (
  SELECT source, n_tokens, n_noise, n_spans,
         n_tokens - n_noise + n_spans AS input_len,
         n_noise + n_spans + 1 AS target_len
  FROM s)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS tokens,
       CAST(sum(n_noise) AS BIGINT) AS noise_tokens,
       CAST(sum(n_spans) AS BIGINT) AS sentinels,
       CAST(sum(input_len) AS BIGINT) AS input_tokens,
       CAST(sum(target_len) AS BIGINT) AS target_tokens,
       CAST((sum(input_len) + sum(target_len) - sum(n_tokens))
            * 1000000 // sum(n_tokens) AS BIGINT) AS overhead_ppm
FROM f GROUP BY source
"""


def q_text_fineweb_rules(spark, sf_dir):
    """FineWeb/RedPajama LINE-level quality rules — the filter family
    the C4 and Gopher rows don't cover (C4 is sentence-level, Gopher
    is symbol-ratio; FineWeb's strongest filters are line-structure):
    per doc, the fraction of lines ending in terminal punctuation
    (< 0.12 → junk), the duplicate-line fraction (> 0.30 → boiler),
    the bullet-line fraction (> 0.90 → list page), and short-line
    fraction, each in exact ppm, with the composed keep/drop verdict
    and the dominant drop reason.

    Fixture: docs are re-lined deterministically (12-word lines;
    every 3rd line gains a '.', every 5th a '- ' bullet, every 4th
    doc repeats its first line at the end) so every rule has both
    populations.

    Plan/scale: line synthesis + census are one explode + two
    groupBys partitioned by doc_id; verdicts are pure codegen."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    w = F.split(F.col("text"), " ")
    n_lines = F.greatest((F.ceil(F.size(w) / F.lit(12))).cast("int"),
                         F.lit(1))
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.concat(
            F.when((i + 1) % 5 == 0, F.lit("- ")).otherwise(F.lit("")),
            F.array_join(F.slice(w, i * 12 + 1, 12), " "),
            F.when((i + 1) % 3 == 0, F.lit(".")).otherwise(F.lit(""))))
    lines = F.when(F.col("doc_id") % 4 == 0,
                   F.concat(lines, F.slice(lines, 1, 1))) \
        .otherwise(lines)
    ex = d.select("doc_id", F.explode(lines).alias("line"))
    feat = ex.select(
        "doc_id",
        F.col("line").rlike(r"[.!?]$").cast("int").alias("punct"),
        F.col("line").startswith("- ").cast("int").alias("bullet"),
        (F.size(F.split("line", " ")) <= 3).cast("int").alias("short"),
        F.col("line").alias("line"))
    dup = (feat.groupBy("doc_id", "line")
           .agg(F.count(F.lit(1)).cast("long").alias("cnt")))
    dupc = (dup.groupBy("doc_id")
            .agg(F.sum("cnt").cast("long").alias("n_lines"),
                 F.sum(F.col("cnt") - 1).cast("long").alias("n_dup")))
    cen = (feat.groupBy("doc_id")
           .agg(F.sum("punct").cast("long").alias("n_punct"),
                F.sum("bullet").cast("long").alias("n_bullet"),
                F.sum("short").cast("long").alias("n_short")))
    j = cen.join(dupc, "doc_id")
    out = (j.withColumn("punct_ppm",
                        F.expr("n_punct * 1000000 DIV n_lines")
                        .cast("long"))
           .withColumn("dup_ppm",
                       F.expr("n_dup * 1000000 DIV n_lines")
                       .cast("long"))
           .withColumn("bullet_ppm",
                       F.expr("n_bullet * 1000000 DIV n_lines")
                       .cast("long"))
           .withColumn("short_ppm",
                       F.expr("n_short * 1000000 DIV n_lines")
                       .cast("long")))
    reason = (F.when(F.col("punct_ppm") < 120000, F.lit("low-punct"))
              .when(F.col("dup_ppm") > 300000, F.lit("dup-lines"))
              .when(F.col("bullet_ppm") > 900000, F.lit("bullet-page"))
              .otherwise(F.lit("keep")))
    return (out.withColumn("verdict", reason)
            .select("doc_id", "n_lines", "punct_ppm", "dup_ppm",
                    "bullet_ppm", "short_ppm", "verdict"))


ORACLE_TEXT_FINEWEB_RULES = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL),
l0 AS (
  SELECT doc_id, list_transform(
      range(greatest(CAST(ceil(len(w) / 12.0) AS INT), 1)),
      i -> CASE WHEN (i + 1) % 5 = 0 THEN '- ' ELSE '' END
           || array_to_string(w[CAST(i*12+1 AS INT):CAST(i*12+12 AS INT)],
                              ' ')
           || CASE WHEN (i + 1) % 3 = 0 THEN '.' ELSE '' END) AS ls
  FROM base),
l1 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0 THEN list_concat(ls, ls[1:1])
              ELSE ls END AS ls
  FROM l0),
ex AS (SELECT doc_id, unnest(ls) AS line FROM l1),
feat AS (
  SELECT doc_id, line,
         CASE WHEN regexp_matches(line, '[.!?]$') THEN 1 ELSE 0 END
           AS punct,
         CASE WHEN line LIKE '- %' THEN 1 ELSE 0 END AS bullet,
         CASE WHEN len(string_split(line, ' ')) <= 3 THEN 1 ELSE 0 END
           AS short
  FROM ex),
dup AS (
  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
         CAST(sum(cnt - 1) AS BIGINT) AS n_dup
  FROM (SELECT doc_id, line, CAST(count(*) AS BIGINT) AS cnt
        FROM feat GROUP BY doc_id, line)
  GROUP BY doc_id),
cen AS (
  SELECT doc_id, CAST(sum(punct) AS BIGINT) AS n_punct,
         CAST(sum(bullet) AS BIGINT) AS n_bullet,
         CAST(sum(short) AS BIGINT) AS n_short
  FROM feat GROUP BY doc_id),
j AS (
  SELECT c.doc_id, d.n_lines,
         CAST(c.n_punct * 1000000 // d.n_lines AS BIGINT) AS punct_ppm,
         CAST(d.n_dup * 1000000 // d.n_lines AS BIGINT) AS dup_ppm,
         CAST(c.n_bullet * 1000000 // d.n_lines AS BIGINT) AS bullet_ppm,
         CAST(c.n_short * 1000000 // d.n_lines AS BIGINT) AS short_ppm
  FROM cen c JOIN dup d USING (doc_id))
SELECT doc_id, n_lines, punct_ppm, dup_ppm, bullet_ppm, short_ppm,
       CASE WHEN punct_ppm < 120000 THEN 'low-punct'
            WHEN dup_ppm > 300000 THEN 'dup-lines'
            WHEN bullet_ppm > 900000 THEN 'bullet-page'
            ELSE 'keep' END AS verdict
FROM j
"""


def q_events_benford(spark, sf_dir):
    """BENFORD first-digit conformance test on transaction values —
    the classic fabricated-data screen (naturally occurring
    multi-scale amounts follow P(d) = log10(1 + 1/d); synthetic or
    manipulated streams don't): per event_type, the observed
    first-significant-digit distribution in exact ppm against the
    Benford expectation, the chi-square statistic over the 9 digit
    cells, and the conformance verdict at the 0.05 critical value
    (15.507 for 8 df).

    Exactness: first digit via string head of the integer cents
    (no float log); expected ppm are fixed integer literals of
    round(log10(1+1/d)·1e6); chi2 is a 9-term double sum rounded 4dp.

    Plan/scale: one groupBy(event_type, digit) census + one 9-row
    combine per type — nothing scales past the first census."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents"))
          .filter(F.col("cents") > 0))
    d1 = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")
    cen = (ev.withColumn("digit", d1)
           .groupBy("event_type", "digit")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = (cen.groupBy("event_type")
           .agg(F.sum("n").cast("long").alias("tot")))
    import math as _m
    exp_ppm = {d: round(_m.log10(1 + 1 / d) * 10**6) for d in range(1, 10)}
    exp_col = F.create_map(
        *[x for d, p in exp_ppm.items()
          for x in (F.lit(d), F.lit(p))])[F.col("digit")]
    j = (cen.join(tot, "event_type")
         .withColumn("obs_ppm",
                     F.expr("n * 1000000 DIV tot").cast("long"))
         .withColumn("exp_ppm", exp_col.cast("long")))
    chi_term = ((F.col("n").cast("double")
                 - F.col("exp_ppm") * F.col("tot") / 1e6)
                * (F.col("n").cast("double")
                   - F.col("exp_ppm") * F.col("tot") / 1e6)
                / (F.col("exp_ppm") * F.col("tot") / 1e6))
    per = (j.withColumn("term", chi_term)
           .groupBy("event_type")
           .agg(F.first("tot").alias("n_values"),
                F.count(F.lit(1)).cast("long").alias("n_digits"),
                F.round(F.sum("term"), 4).alias("chi2")))
    return (per.withColumn("benford_ok",
                           (F.col("chi2") <= 15.507).cast("int"))
            .select("event_type", "n_values", "n_digits", "chi2",
                    "benford_ok"))


def _benford_oracle() -> str:
    import math as _m
    cases = " ".join(
        f"WHEN {d} THEN {round(_m.log10(1 + 1 / d) * 10**6)}"
        for d in range(1, 10))
    return f"""
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
cen AS (
  SELECT event_type,
         CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY 1, 2),
tot AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS tot
  FROM cen GROUP BY event_type),
j AS (
  SELECT c.event_type, c.n, t.tot,
         CAST(CASE c.digit {cases} END AS BIGINT) AS exp_ppm
  FROM cen c JOIN tot t USING (event_type)),
per AS (
  SELECT event_type, any_value(tot) AS n_values,
         CAST(count(*) AS BIGINT) AS n_digits,
         round(sum((CAST(n AS DOUBLE) - exp_ppm * tot / 1e6)
                   * (CAST(n AS DOUBLE) - exp_ppm * tot / 1e6)
                   / (exp_ppm * tot / 1e6)), 4) AS chi2
  FROM j GROUP BY event_type)
SELECT event_type, n_values, n_digits, chi2,
       CAST(CASE WHEN chi2 <= 15.507 THEN 1 ELSE 0 END AS INT)
         AS benford_ok
FROM per
"""


ORACLE_EVENTS_BENFORD = _benford_oracle()


def q_text_dialog_turns(spark, sf_dir):
    """DIALOG-turn structure census — the conversational-data
    profiler an instruction/chat corpus needs before formatting
    (turn balance and strict speaker alternation decide whether a
    page is a usable dialogue or a forum dump): docs are rendered
    as 'u<N>: ...' turn lines (deterministic 2-3 speaker scripts),
    then per doc: turn count, distinct speakers, mean turn length
    in exact centitokens, and the alternation ratio (consecutive
    turns with different speakers / transitions) in ppm — 10^6
    means a clean two-party dialogue.

    Plan/scale: turn synthesis is flatten/transform codegen; the
    census is one posexplode + per-doc window lag + one groupBy —
    the sessionize shuffle shape, partitioned by doc."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", F.split(F.col("text"), " ").alias("w")))
    n_turns = F.greatest((F.ceil(F.size("w") / F.lit(9))).cast("int"),
                         F.lit(1))
    n_speakers = (F.col("doc_id") % 2 + 2).cast("int")
    turns = F.transform(
        F.sequence(F.lit(0), n_turns - 1),
        lambda i: F.struct(
            (i % n_speakers).cast("int").alias("speaker"),
            F.size(F.split(F.array_join(F.slice(F.col("w"), i * 9 + 1, 9),
                                        " "), " ")).cast("long")
            .alias("n_tok")))
    ex = d.select("doc_id", F.posexplode(turns).alias("pos", "t"))
    w = Window.partitionBy("doc_id").orderBy("pos")
    flagged = ex.withColumn(
        "alt", (F.col("t.speaker") != F.lag("t.speaker").over(w))
        .cast("int"))
    return (flagged.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_turns"),
                 F.countDistinct("t.speaker").cast("long")
                 .alias("n_speakers"),
                 F.sum("t.n_tok").cast("long").alias("n_tokens"),
                 F.sum(F.coalesce("alt", F.lit(0))).cast("long")
                 .alias("n_alt"))
            .withColumn("mean_turn_centitok",
                        F.expr("n_tokens * 100 DIV n_turns")
                        .cast("long"))
            .withColumn("alternation_ppm",
                        F.when(F.col("n_turns") > 1,
                               F.expr("n_alt * 1000000 DIV "
                                      "(n_turns - 1)"))
                        .otherwise(F.lit(0)).cast("long")))


ORACLE_TEXT_DIALOG_TURNS = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w
  FROM documents WHERE text IS NOT NULL),
tl AS (
  SELECT doc_id, (doc_id % 2 + 2) AS n_spk,
         list_transform(
             range(greatest(CAST(ceil(len(w) / 9.0) AS INT), 1)),
             i -> {'speaker': i % (doc_id % 2 + 2),
                   'n_tok': CAST(len(string_split(array_to_string(
                       w[CAST(i*9+1 AS INT):CAST(i*9+9 AS INT)], ' '),
                       ' ')) AS BIGINT)}) AS turns
  FROM base),
ex AS (
  SELECT doc_id, unnest(turns) AS t,
         generate_subscripts(turns, 1) - 1 AS pos
  FROM tl),
fl AS (
  SELECT doc_id, t.speaker AS speaker, t.n_tok AS n_tok,
         CASE WHEN t.speaker <> lag(t.speaker) OVER (
                  PARTITION BY doc_id ORDER BY pos) THEN 1 ELSE 0 END
           AS alt
  FROM ex),
cen AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_turns,
         CAST(count(DISTINCT speaker) AS BIGINT) AS n_speakers,
         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         CAST(sum(coalesce(alt, 0)) AS BIGINT) AS n_alt
  FROM fl GROUP BY doc_id)
SELECT doc_id, n_turns, n_speakers, n_tokens, n_alt,
       CAST(n_tokens * 100 // n_turns AS BIGINT) AS mean_turn_centitok,
       CAST(CASE WHEN n_turns > 1
                 THEN n_alt * 1000000 // (n_turns - 1)
                 ELSE 0 END AS BIGINT) AS alternation_ppm
FROM cen
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


def q_frontier_aimd_window(spark, sf_dir):
    """AIMD fetch-concurrency control per host — TCP's additive-
    increase / multiplicative-decrease applied to polite crawling
    (the adaptive layer above the static politeness bucket): a host
    that served the last round cleanly earns +1 concurrent
    connection (capped at 8); any error or timeout halves the
    window (floor 1); a 5xx-dominated round resets to 1 outright.
    Emits per host the current window, last-round health, the next
    window, and the fleet-capacity delta the change implies.

    Fixture: deterministic current windows (1..8) and last-round
    (n_ok, n_err, n_5xx) triples from order keys.

    Plan/scale: pure per-row CASE arithmetic + one fleet census —
    the controller state is one row per host, exactly what the
    scheduler's host table already holds."""
    k = F.col("o_orderkey")
    hosts = (_t(spark, sf_dir, "orders")
             .select(F.concat(F.lit("h"), (k % 499).cast("string"))
                     .alias("host_key"),
                     (k % 8 + 1).cast("long").alias("cwnd"),
                     (k % 11).cast("long").alias("n_err"),
                     (k % 17 == 0).cast("long").alias("has_5xx_storm"))
             .groupBy("host_key")
             .agg(F.max("cwnd").cast("long").alias("cwnd"),
                  F.sum("n_err").cast("long").alias("n_err"),
                  F.max("has_5xx_storm").cast("long")
                  .alias("storm")))
    nxt = (F.when(F.col("storm") == 1, F.lit(1))
           .when(F.col("n_err") > 0,
                 F.greatest(F.expr("cwnd DIV 2"), F.lit(1)))
           .otherwise(F.least(F.col("cwnd") + 1, F.lit(8)))) \
        .cast("long")
    out = (hosts.withColumn("next_window", nxt)
           .withColumn("delta",
                       (F.col("next_window") - F.col("cwnd"))
                       .cast("long"))
           .withColumn("action",
                       F.when(F.col("storm") == 1, F.lit("reset"))
                       .when(F.col("n_err") > 0, F.lit("halve"))
                       .when(F.col("cwnd") >= 8, F.lit("hold"))
                       .otherwise(F.lit("grow"))))
    return out.select("host_key", "cwnd", "n_err", "storm",
                      "next_window", "delta", "action")


ORACLE_FRONTIER_AIMD_WINDOW = """
WITH hosts AS (
  SELECT 'h' || (o_orderkey % 499) AS host_key,
         CAST(max(o_orderkey % 8 + 1) AS BIGINT) AS cwnd,
         CAST(sum(o_orderkey % 11) AS BIGINT) AS n_err,
         CAST(max(CASE WHEN o_orderkey % 17 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS storm
  FROM orders GROUP BY 1),
n AS (
  SELECT host_key, cwnd, n_err, storm,
         CAST(CASE WHEN storm = 1 THEN 1
                   WHEN n_err > 0 THEN greatest(cwnd // 2, 1)
                   ELSE least(cwnd + 1, 8) END AS BIGINT)
           AS next_window
  FROM hosts)
SELECT host_key, cwnd, n_err, storm, next_window,
       CAST(next_window - cwnd AS BIGINT) AS delta,
       CASE WHEN storm = 1 THEN 'reset'
            WHEN n_err > 0 THEN 'halve'
            WHEN cwnd >= 8 THEN 'hold'
            ELSE 'grow' END AS action
FROM n
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


def q_corpus_vocab_coverage(spark, sf_dir):
    """Vocabulary COVERAGE curve — the tokenizer-budget planning row
    (how big must the vocab be before OOV stops hurting?): rank all
    corpus terms by frequency (ties on term asc), then for each
    candidate vocab size N in (256, 1024, 4096, 16384) report the
    token-mass coverage in exact ppm — the Zipf integral the
    BPE-size decision reads off. Complements corpus_vocab_topk
    (which lists the head) with the cumulative curve.

    Plan/scale: one term-frequency groupBy (Heaps-small result),
    ONE rank window over the vocab (not the token stream), and a
    4-row conditional-sum census — the token stream shuffles once.
    """
    tok = (_t(spark, sf_dir, "documents")
           .filter(F.col("text").isNotNull())
           .select(F.explode(F.split("text", " ")).alias("tok")))
    tf = tok.groupBy("tok").agg(F.count(F.lit(1)).cast("long")
                                .alias("tf"))
    wr = Window.orderBy(F.col("tf").desc(), F.col("tok").asc())
    ranked = tf.withColumn("rnk", F.row_number().over(wr).cast("long"))
    tot = ranked.agg(F.sum("tf").cast("long").alias("total"),
                     F.count(F.lit(1)).cast("long").alias("vocab_full"))
    outs = []
    for n in (256, 1024, 4096, 16384):
        cov = ranked.agg(
            F.sum(F.when(F.col("rnk") <= n, F.col("tf"))
                  .otherwise(F.lit(0))).cast("long").alias("covered"))
        outs.append(
            cov.crossJoin(F.broadcast(tot))
            .select(F.lit(n).cast("long").alias("vocab_size"),
                    "covered", "total", "vocab_full",
                    F.expr("covered * 1000000 DIV total").cast("long")
                    .alias("coverage_ppm")))
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


ORACLE_CORPUS_VOCAB_COVERAGE = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL),
tf AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY tok),
ranked AS (
  SELECT tf, row_number() OVER (ORDER BY tf DESC, tok ASC) AS rnk
  FROM tf),
tot AS (
  SELECT CAST(sum(tf) AS BIGINT) AS total,
         CAST(count(*) AS BIGINT) AS vocab_full FROM ranked),
ks AS (SELECT unnest([256, 1024, 4096, 16384]) AS vocab_size)
SELECT CAST(vocab_size AS BIGINT) AS vocab_size,
       (SELECT CAST(sum(CASE WHEN rnk <= vocab_size THEN tf ELSE 0 END)
                    AS BIGINT) FROM ranked) AS covered,
       tot.total, tot.vocab_full,
       CAST((SELECT sum(CASE WHEN rnk <= vocab_size THEN tf ELSE 0 END)
             FROM ranked) * 1000000 // tot.total AS BIGINT)
         AS coverage_ppm
FROM ks CROSS JOIN tot
"""


def q_embeddings_distance_histogram(spark, sf_dir):
    """Pairwise-distance CONCENTRATION histogram — the curse-of-
    dimensionality companion to the hubness audit: in high dimension
    all pairwise cosines crowd toward their mean (distance
    concentration), which silently destroys threshold-based dedup
    and makes top-k rankings noise; this row bins the cosine of a
    deterministic pair sample (i paired with (i·7+1) mod n by rank)
    into 20 fixed bins over [-1, 1] and reports the spread stats the
    'is cosine even meaningful here?' decision needs.

    Exactness: exact float64 cosine rounded 6dp before binning
    (bin = floor((cos+1)·10), clamped); the pair sample is a
    permutation, not RNG.

    Plan/scale: the pair join is rank-to-rank (one equi-join after
    a zip-rank), O(n) pairs, never all-pairs; the histogram is one
    20-group census."""
    emb = _t(spark, sf_dir, "embeddings")
    wr = Window.orderBy(F.col("vec_id").asc())
    ranked = (emb.select("vec_id", "embedding")
              .withColumn("rnk",
                          (F.row_number().over(wr) - 1).cast("long")))
    n = ranked.agg(F.count(F.lit(1)).cast("long").alias("n"))
    a = ranked.crossJoin(F.broadcast(n)) \
        .withColumn("mate", (F.col("rnk") * 7 + 1) % F.col("n"))
    b = ranked.select(F.col("rnk").alias("mate"),
                      F.col("embedding").alias("emb_b"))
    pairs = (a.join(b, "mate")
             .filter(F.col("rnk") != F.col("mate")))
    va = F.transform("embedding", lambda x: x.cast("double"))
    vb = F.transform("emb_b", lambda x: x.cast("double"))
    cos = F.round(SIM._dot(va, vb) / (SIM._norm(va) * SIM._norm(vb)), 6)
    binned = pairs.select(
        F.least(F.greatest(F.floor((cos + 1) * 10).cast("long"),
                           F.lit(0)), F.lit(19)).alias("bin"),
        cos.alias("cos"))
    return (binned.groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.round(F.min("cos"), 6).alias("min_cos"),
                 F.round(F.max("cos"), 6).alias("max_cos")))


ORACLE_EMBEDDINGS_DISTANCE_HISTOGRAM = """
WITH ranked AS (
  SELECT vec_id, embedding,
         CAST(row_number() OVER (ORDER BY vec_id ASC) - 1 AS BIGINT)
           AS rnk
  FROM embeddings),
n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ranked),
pairs AS (
  SELECT a.embedding AS ea, b.embedding AS eb
  FROM ranked a CROSS JOIN n
  JOIN ranked b ON b.rnk = (a.rnk * 7 + 1) % n.n
  WHERE a.rnk <> (a.rnk * 7 + 1) % n.n),
sc AS (
  SELECT round(
      list_sum(list_transform(range(len(ea)),
          i -> ea[i+1]::DOUBLE * eb[i+1]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(len(ea)),
          i -> ea[i+1]::DOUBLE * ea[i+1]::DOUBLE)))
       * sqrt(list_sum(list_transform(range(len(eb)),
          i -> eb[i+1]::DOUBLE * eb[i+1]::DOUBLE)))), 6) AS cos
  FROM pairs)
SELECT CAST(least(greatest(CAST(floor((cos + 1) * 10) AS BIGINT), 0), 19)
            AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_pairs,
       round(min(cos), 6) AS min_cos,
       round(max(cos), 6) AS max_cos
FROM sc GROUP BY 1
"""


def q_frontier_wave_entropy(spark, sf_dir):
    """Per-wave HOST-distribution entropy — the scheduling-health
    gauge for each crawl round: a wave whose URLs concentrate on
    few hosts serializes behind politeness (effective parallelism =
    perplexity = 2^H hosts, not the host count), while a flat wave
    keeps the fleet busy. Per round: URL count, host count, the
    host-distribution entropy in bits (4dp), the perplexity
    (effective hosts, 2dp), and the utilization ppm
    (perplexity / n_hosts).

    Exactness: counts are integers; H sums n_hosts terms of exact
    rationals, rounded 4dp; perplexity re-derives from the rounded
    H so both engines agree bit-for-bit.

    Plan/scale: two census groupBys ((round, host) then round) —
    the same shape as frontier_host_agg; no windows, no joins on
    the URL stream."""
    k = F.col("o_orderkey")
    d = (_t(spark, sf_dir, "orders")
         .select((k % 5).cast("long").alias("round"),
                 F.concat(F.lit("h"),
                          (F.when(k % 5 < 2, k % 7)
                           .otherwise(k % 61)).cast("string"))
                 .alias("host_key")))
    hc = (d.groupBy("round", "host_key")
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = (hc.groupBy("round")
           .agg(F.sum("n").cast("long").alias("tot"),
                F.count(F.lit(1)).cast("long").alias("n_hosts")))
    j = hc.join(tot, "round")
    term = ((F.col("n").cast("double") / F.col("tot"))
            * (F.log(F.col("tot").cast("double"))
               - F.log(F.col("n").cast("double"))) / F.log(F.lit(2.0)))
    per = (j.withColumn("term", term)
           .groupBy("round")
           .agg(F.first("tot").alias("n_urls"),
                F.first("n_hosts").alias("n_hosts"),
                F.round(F.sum("term"), 4).alias("h_bits")))
    return (per.withColumn("perplexity",
                           F.round(F.pow(F.lit(2.0), F.col("h_bits")), 2))
            .withColumn("utilization_ppm",
                        F.floor(F.col("perplexity") * 1000000
                                / F.col("n_hosts")).cast("long"))
            .select("round", "n_urls", "n_hosts", "h_bits",
                    "perplexity", "utilization_ppm"))


ORACLE_FRONTIER_WAVE_ENTROPY = """
WITH d AS (
  SELECT CAST(o_orderkey % 5 AS BIGINT) AS round,
         'h' || (CASE WHEN o_orderkey % 5 < 2 THEN o_orderkey % 7
                      ELSE o_orderkey % 61 END) AS host_key
  FROM orders),
hc AS (
  SELECT round, host_key, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY round, host_key),
tot AS (
  SELECT round, CAST(sum(n) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n_hosts
  FROM hc GROUP BY round),
per AS (
  SELECT hc.round, any_value(tot.tot) AS n_urls,
         any_value(tot.n_hosts) AS n_hosts,
         round(sum((CAST(hc.n AS DOUBLE) / tot.tot)
                   * (ln(CAST(tot.tot AS DOUBLE))
                      - ln(CAST(hc.n AS DOUBLE))) / ln(2.0)), 4)
           AS h_bits
  FROM hc JOIN tot USING (round) GROUP BY hc.round)
SELECT round, n_urls, n_hosts, h_bits,
       round(pow(2.0, h_bits), 2) AS perplexity,
       CAST(floor(round(pow(2.0, h_bits), 2) * 1000000 / n_hosts)
            AS BIGINT) AS utilization_ppm
FROM per
"""


def q_text_html_entities(spark, sf_dir):
    """Residual HTML-ENTITY audit — the extraction-quality check a
    text pipeline runs after HTML-to-text (leftover &amp;/&#39;
    entities mean the extractor missed a decode pass, and entity
    mass correlates with broken markup): per doc, counts of named
    (&amp; &lt; &gt; &quot; &nbsp;), decimal (&#39;), and hex
    (&#x27;) entities, the decoded text for the three commonest,
    and the clean/dirty verdict.

    Fixture: entities injected deterministically (every 3rd doc
    gets '&amp;' between words, every 5th '&#39;', every 7th
    '&nbsp;') so all three classes exist.

    Plan/scale: per-row regexp codegen; the decode is the same
    regexp_replace cascade the cleaner applies — audited and
    applied in one pass, no shuffle."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    t = F.col("text")
    t = F.when(F.col("doc_id") % 3 == 0,
               F.regexp_replace(t, " and ", " &amp; ")).otherwise(t)
    t = F.when(F.col("doc_id") % 5 == 0,
               F.regexp_replace(t, " the ", " the&#39; ")).otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.regexp_replace(t, " a ", " a&nbsp;")).otherwise(t)
    d = d.select("doc_id", t.alias("xt"))
    n_named = F.regexp_count("xt", F.lit("&(amp|lt|gt|quot|nbsp);")) \
        .cast("long")
    n_dec = F.regexp_count("xt", F.lit("&#[0-9]+;")).cast("long")
    n_hex = F.regexp_count("xt", F.lit("&#x[0-9a-fA-F]+;")).cast("long")
    decoded = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace("xt", "&amp;", "&"),
            "&nbsp;", " "),
        "&#39;", "'")
    return (d.select("doc_id",
                     n_named.alias("n_named"), n_dec.alias("n_decimal"),
                     n_hex.alias("n_hex"),
                     F.length(decoded).cast("long").alias("decoded_len"))
            .withColumn("n_entities",
                        (F.col("n_named") + F.col("n_decimal")
                         + F.col("n_hex")).cast("long"))
            .withColumn("is_dirty",
                        (F.col("n_entities") > 0).cast("int")))


ORACLE_TEXT_HTML_ENTITIES = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN replace(t2, ' a ', ' a&nbsp;') ELSE t2 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 5 = 0
                THEN replace(t1, ' the ', ' the&#39; ') ELSE t1 END AS t2
    FROM (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(text, ' and ', ' &amp; ') ELSE text END
               AS t1
      FROM documents WHERE text IS NOT NULL)))
SELECT doc_id,
       CAST(len(regexp_extract_all(xt, '&(amp|lt|gt|quot|nbsp);'))
            AS BIGINT) AS n_named,
       CAST(len(regexp_extract_all(xt, '&#[0-9]+;')) AS BIGINT)
         AS n_decimal,
       CAST(len(regexp_extract_all(xt, '&#x[0-9a-fA-F]+;')) AS BIGINT)
         AS n_hex,
       CAST(length(replace(replace(replace(xt, '&amp;', '&'),
                                   '&nbsp;', ' '), '&#39;', ''''))
            AS BIGINT) AS decoded_len,
       CAST(len(regexp_extract_all(xt, '&(amp|lt|gt|quot|nbsp);'))
            + len(regexp_extract_all(xt, '&#[0-9]+;'))
            + len(regexp_extract_all(xt, '&#x[0-9a-fA-F]+;'))
            AS BIGINT) AS n_entities,
       CAST(CASE WHEN len(regexp_extract_all(xt, '&(amp|lt|gt|quot|nbsp);'))
                    + len(regexp_extract_all(xt, '&#[0-9]+;'))
                    + len(regexp_extract_all(xt, '&#x[0-9a-fA-F]+;')) > 0
                 THEN 1 ELSE 0 END AS INT) AS is_dirty
FROM x
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


def q_events_autocorr(spark, sf_dir):
    """Lag-1 AUTOCORRELATION of daily traffic — the serial-dependence
    gauge that separates momentum (today predicts tomorrow: caching
    and capacity pre-provisioning pay off) from white noise (they
    don't), and the companion the Mann-Kendall row needs (MK assumes
    independent observations; high lag-1 r inflates its false-
    positive rate). Per event_type: Pearson r between consecutive
    day counts, from exact integer sums over the (x_t, x_{t+1})
    pair series, rounded 4 dp, with the |r| > 0.3 dependence flag.

    Plan/scale: daily census first, one per-type lag window over
    n_days rows, one closed-form agg — raw events shuffle once."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day")))
    daily = (ev.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = (daily.withColumn("nxt", F.lead("n").over(w))
              .filter(F.col("nxt").isNotNull()))
    agg = (lagged.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("m"),
                F.sum("n").cast("long").alias("sx"),
                F.sum("nxt").cast("long").alias("sy"),
                F.sum(F.col("n") * F.col("n")).cast("long").alias("sxx"),
                F.sum(F.col("nxt") * F.col("nxt")).cast("long")
                .alias("syy"),
                F.sum(F.col("n") * F.col("nxt")).cast("long")
                .alias("sxy")))
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    den = F.sqrt((F.col("m") * F.col("sxx")
                  - F.col("sx") * F.col("sx")).cast("double")
                 * (F.col("m") * F.col("syy")
                    - F.col("sy") * F.col("sy")).cast("double"))
    return (agg.withColumn("r1", F.round(num / den, 4))
            .withColumn("is_dependent",
                        (F.abs(F.col("r1")) > 0.3).cast("int"))
            .select("event_type", F.col("m").alias("n_pairs"), "r1",
                    "is_dependent"))


ORACLE_EVENTS_AUTOCORR = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
lagged AS (
  SELECT event_type, n,
         lead(n) OVER (PARTITION BY event_type ORDER BY day) AS nxt
  FROM daily),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(n) AS BIGINT) AS sx, CAST(sum(nxt) AS BIGINT) AS sy,
         CAST(sum(n * n) AS BIGINT) AS sxx,
         CAST(sum(nxt * nxt) AS BIGINT) AS syy,
         CAST(sum(n * nxt) AS BIGINT) AS sxy
  FROM lagged WHERE nxt IS NOT NULL GROUP BY event_type)
SELECT event_type, m AS n_pairs,
       round(CAST(m * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                    * CAST(m * syy - sy * sy AS DOUBLE)), 4) AS r1,
       CAST(CASE WHEN abs(CAST(m * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                    * CAST(m * syy - sy * sy AS DOUBLE))) > 0.3
            THEN 1 ELSE 0 END AS INT) AS is_dependent
FROM agg
"""


def q_text_date_extract(spark, sf_dir):
    """Document DATING by in-text year extraction — the freshness
    estimator a corpus runs when crawl metadata is missing or lies
    (page footers and citations carry years; the max plausible year
    in the text is the standard cheap document date): per doc, the
    count of 4-digit year tokens in [1990, 2029], the min and max
    year, the dating-confidence class (none / single / multi), and
    the corpus-age bucket the doc lands in for curriculum or decay
    weighting.

    Fixture: deterministic year injection — every doc gains
    'copyright <year>' with year = 1998 + doc_id % 28; every 3rd
    doc gains a second, earlier citation year.

    Plan/scale: regexp_extract_all + array codegen per row, one
    final projection — no shuffle."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    year1 = (F.col("doc_id") % 28 + 1998).cast("long")
    year2 = (F.col("doc_id") % 9 + 1991).cast("long")
    page = F.concat(
        F.col("text"), F.lit(" copyright "), year1.cast("string"),
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.lit(" cited "), year2.cast("string")))
        .otherwise(F.lit("")))
    d = d.select("doc_id", page.alias("page"))
    years = F.expr(
        r"transform(regexp_extract_all(page, '(^| )((19|20)[0-9]{2})( |$)',"
        r" 2), x -> CAST(x AS BIGINT))")
    valid = F.filter(years, lambda y: (y >= 1990) & (y <= 2029))
    d = d.select("doc_id", valid.alias("ys"))
    conf = (F.when(F.size("ys") == 0, F.lit("none"))
            .when(F.size("ys") == 1, F.lit("single"))
            .otherwise(F.lit("multi")))
    mx = F.array_max("ys")
    bucket = (F.when(mx >= 2020, F.lit("recent"))
              .when(mx >= 2010, F.lit("modern"))
              .when(mx >= 2000, F.lit("old"))
              .otherwise(F.lit("ancient")))
    return (d.select("doc_id",
                     F.size("ys").cast("long").alias("n_years"),
                     F.array_min("ys").alias("min_year"),
                     mx.alias("max_year"),
                     conf.alias("confidence"),
                     F.when(F.size("ys") > 0, bucket)
                     .otherwise(F.lit("undated")).alias("age_bucket")))


ORACLE_TEXT_DATE_EXTRACT = """
WITH d AS (
  SELECT doc_id,
         text || ' copyright ' || (doc_id % 28 + 1998)
         || CASE WHEN doc_id % 3 = 0
                 THEN ' cited ' || (doc_id % 9 + 1991) ELSE '' END
           AS page
  FROM documents WHERE text IS NOT NULL),
y AS (
  SELECT doc_id,
         list_filter(list_transform(
             regexp_extract_all(page, '(^| )((19|20)[0-9]{2})( |$)', 2),
             x -> CAST(x AS BIGINT)),
             v -> v >= 1990 AND v <= 2029) AS ys
  FROM d)
SELECT doc_id, CAST(len(ys) AS BIGINT) AS n_years,
       list_min(ys) AS min_year, list_max(ys) AS max_year,
       CASE WHEN len(ys) = 0 THEN 'none'
            WHEN len(ys) = 1 THEN 'single'
            ELSE 'multi' END AS confidence,
       CASE WHEN len(ys) = 0 THEN 'undated'
            WHEN list_max(ys) >= 2020 THEN 'recent'
            WHEN list_max(ys) >= 2010 THEN 'modern'
            WHEN list_max(ys) >= 2000 THEN 'old'
            ELSE 'ancient' END AS age_bucket
FROM y
"""


def q_events_ltv_triangle(spark, sf_dir):
    """Cohort LTV TRIANGLE — the finance-side companion to
    events_retention's activity triangle: users cohort by first-seen
    week, and each (cohort, age-in-weeks) cell reports the
    cumulative spend per cohort user in exact centi-cents — the
    table LTV forecasting reads its early-signal multipliers off
    (week-1 spend × the historical w1→w12 ratio). Cumulation runs
    over the week axis inside each cohort.

    Exactness: spend in integer cents; cumulative sums are exact;
    the per-user normalization is integer DIV against the FIXED
    cohort size (users who never return still divide — that's the
    definition of per-cohort-user LTV).

    Plan/scale: first-seen via one min-agg (no window over raw
    events), cells via one groupBy, the cumsum window runs over
    O(weeks²) triangle cells only."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_timestamp(ts) DIV 604800").alias("week"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    first = (ev.groupBy("user_id")
             .agg(F.min("week").alias("cohort_week")))
    sized = (first.groupBy("cohort_week")
             .agg(F.count(F.lit(1)).cast("long").alias("cohort_size")))
    j = ev.join(first, "user_id")
    cells = (j.withColumn("age", (F.col("week") - F.col("cohort_week"))
                          .cast("long"))
             .groupBy("cohort_week", "age")
             .agg(F.sum("cents").cast("long").alias("spend")))
    w = Window.partitionBy("cohort_week").orderBy("age")
    cum = cells.withColumn("cum_spend",
                           F.sum("spend").over(w).cast("long"))
    return (cum.join(sized, "cohort_week")
            .withColumn("ltv_centicents",
                        F.expr("cum_spend * 100 DIV cohort_size")
                        .cast("long"))
            .select("cohort_week", "age", "cohort_size", "spend",
                    "cum_spend", "ltv_centicents"))


ORACLE_EVENTS_LTV_TRIANGLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
sized AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_week),
cells AS (
  SELECT f.cohort_week, CAST(e.week - f.cohort_week AS BIGINT) AS age,
         CAST(sum(e.cents) AS BIGINT) AS spend
  FROM ev e JOIN first f USING (user_id)
  GROUP BY f.cohort_week, e.week - f.cohort_week),
cum AS (
  SELECT cohort_week, age, spend,
         CAST(sum(spend) OVER (PARTITION BY cohort_week ORDER BY age)
              AS BIGINT) AS cum_spend
  FROM cells)
SELECT c.cohort_week, c.age, s.cohort_size, c.spend, c.cum_spend,
       CAST(c.cum_spend * 100 // s.cohort_size AS BIGINT)
         AS ltv_centicents
FROM cum c JOIN sized s USING (cohort_week)
"""


def q_events_simpson_audit(spark, sf_dir):
    """SIMPSON'S-PARADOX audit on the A/B comparison — the sanity
    check that catches the classic aggregation trap (treatment wins
    overall but loses in EVERY segment because arm assignment
    correlates with segment mix): per segment (user activity tier),
    each arm's conversion rate in exact ppm and the segment-level
    winner; then the aggregate winner; paradox flagged when the
    aggregate winner loses every populated segment.

    Exactness: conversion = purchase-event share, integer counts,
    rates in exact ppm; winners by integer cross-multiplication
    (n_a·conv_b vs n_b·conv_a — no float division at all).

    Plan/scale: two census groupBys (segment×arm, then segment) —
    the same shape as events_ab_lift; the paradox flag joins a
    1-row aggregate frame."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  (F.col("event_type") == "purchase").cast("int")
                  .alias("conv")))
    per_u = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.sum("conv").cast("long").alias("n_conv")))
    seg = (F.when(F.col("n_ev") >= 70, F.lit("heavy"))
           .when(F.col("n_ev") >= 40, F.lit("mid"))
           .otherwise(F.lit("light")))
    arm = (F.col("user_id") % 2).cast("int")
    tagged = per_u.withColumn("segment", seg).withColumn("arm", arm)
    cells = (tagged.groupBy("segment", "arm")
             .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                  F.sum("n_ev").cast("long").alias("n_ev"),
                  F.sum("n_conv").cast("long").alias("n_conv")))
    a = cells.filter(F.col("arm") == 0).select(
        "segment", F.col("n_users").alias("users_a"),
        F.col("n_ev").alias("ev_a"), F.col("n_conv").alias("conv_a"))
    b = cells.filter(F.col("arm") == 1).select(
        "segment", F.col("n_users").alias("users_b"),
        F.col("n_ev").alias("ev_b"), F.col("n_conv").alias("conv_b"))
    j = a.join(b, "segment")
    seg_win = (F.when(F.col("conv_a") * F.col("ev_b")
                      > F.col("conv_b") * F.col("ev_a"), F.lit("a"))
               .when(F.col("conv_a") * F.col("ev_b")
                     < F.col("conv_b") * F.col("ev_a"), F.lit("b"))
               .otherwise(F.lit("tie")))
    per_seg = (j.withColumn("rate_a_ppm",
                            F.expr("conv_a * 1000000 DIV ev_a")
                            .cast("long"))
               .withColumn("rate_b_ppm",
                           F.expr("conv_b * 1000000 DIV ev_b")
                           .cast("long"))
               .withColumn("seg_winner", seg_win))
    agg = per_seg.agg(
        F.sum("conv_a").cast("long").alias("ca"),
        F.sum("ev_a").cast("long").alias("ea"),
        F.sum("conv_b").cast("long").alias("cb"),
        F.sum("ev_b").cast("long").alias("eb"),
        F.sum((F.col("seg_winner") == "a").cast("int")).cast("long")
        .alias("segs_a"),
        F.sum((F.col("seg_winner") == "b").cast("int")).cast("long")
        .alias("segs_b"),
        F.count(F.lit(1)).cast("long").alias("n_segs"))
    agg_win = (F.when(F.col("ca") * F.col("eb")
                      > F.col("cb") * F.col("ea"), F.lit("a"))
               .when(F.col("ca") * F.col("eb")
                     < F.col("cb") * F.col("ea"), F.lit("b"))
               .otherwise(F.lit("tie")))
    agg = agg.withColumn("agg_winner", agg_win)
    paradox = (((F.col("agg_winner") == "a")
                & (F.col("segs_a") == 0) & (F.col("segs_b")
                                            == F.col("n_segs")))
               | ((F.col("agg_winner") == "b")
                  & (F.col("segs_b") == 0)
                  & (F.col("segs_a") == F.col("n_segs")))).cast("int")
    return (per_seg.crossJoin(F.broadcast(
        agg.select("agg_winner", paradox.alias("is_paradox"))))
        .select("segment", "users_a", "ev_a", "conv_a", "rate_a_ppm",
                "users_b", "ev_b", "conv_b", "rate_b_ppm",
                "seg_winner", "agg_winner", "is_paradox"))


ORACLE_EVENTS_SIMPSON_AUDIT = """
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conv
  FROM events GROUP BY user_id),
tagged AS (
  SELECT CASE WHEN n_ev >= 70 THEN 'heavy'
              WHEN n_ev >= 40 THEN 'mid'
              ELSE 'light' END AS segment,
         CAST(user_id % 2 AS INT) AS arm, n_ev, n_conv
  FROM pu),
cells AS (
  SELECT segment, arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n_ev) AS BIGINT) AS n_ev,
         CAST(sum(n_conv) AS BIGINT) AS n_conv
  FROM tagged GROUP BY segment, arm),
j AS (
  SELECT a.segment,
         a.n_users AS users_a, a.n_ev AS ev_a, a.n_conv AS conv_a,
         b.n_users AS users_b, b.n_ev AS ev_b, b.n_conv AS conv_b
  FROM (SELECT * FROM cells WHERE arm = 0) a
  JOIN (SELECT * FROM cells WHERE arm = 1) b USING (segment)),
ps AS (
  SELECT *, CAST(conv_a * 1000000 // ev_a AS BIGINT) AS rate_a_ppm,
         CAST(conv_b * 1000000 // ev_b AS BIGINT) AS rate_b_ppm,
         CASE WHEN conv_a * ev_b > conv_b * ev_a THEN 'a'
              WHEN conv_a * ev_b < conv_b * ev_a THEN 'b'
              ELSE 'tie' END AS seg_winner
  FROM j),
agg AS (
  SELECT sum(conv_a) AS ca, sum(ev_a) AS ea,
         sum(conv_b) AS cb, sum(ev_b) AS eb,
         sum(CASE WHEN seg_winner = 'a' THEN 1 ELSE 0 END) AS segs_a,
         sum(CASE WHEN seg_winner = 'b' THEN 1 ELSE 0 END) AS segs_b,
         count(*) AS n_segs
  FROM ps),
aw AS (
  SELECT CASE WHEN ca * eb > cb * ea THEN 'a'
              WHEN ca * eb < cb * ea THEN 'b'
              ELSE 'tie' END AS agg_winner,
         CAST(CASE WHEN (ca * eb > cb * ea AND segs_a = 0
                         AND segs_b = n_segs)
                     OR (ca * eb < cb * ea AND segs_b = 0
                         AND segs_a = n_segs)
                   THEN 1 ELSE 0 END AS INT) AS is_paradox
  FROM agg)
SELECT segment, users_a, ev_a, conv_a, rate_a_ppm,
       users_b, ev_b, conv_b, rate_b_ppm,
       seg_winner, agg_winner, is_paradox
FROM ps CROSS JOIN aw
"""


def q_host_vertical_mix(spark, sf_dir):
    """Host VERTICAL classification by URL-path convention — the
    cheap router that decides which parser pack, politeness class,
    and corpus bucket a host feeds before any content model runs
    (/product/ + /cart/ → shop; /wiki/ or /docs/ → reference;
    /thread/ or /forum/ → ugc; /post/ or /blog/ → editorial): per
    host, the path-class census, the dominant vertical at the 50%
    floor ('mixed' below it), and the class shares in exact ppm.

    Fixture: hosts with deterministic path mixes (pure shop, pure
    reference, pure ugc, and genuinely mixed hosts).

    Plan/scale: per-row CASE on path prefix + TWO census groupBys
    ((host, class) then host with conditional sums) — the standard
    two-phase vertical rollup; URL strings shuffle once."""
    k = F.col("o_orderkey")
    host = F.concat(F.lit("h"), (k % 80).cast("string"))
    hmod = k % 80
    path = (F.when(hmod % 4 == 0,
                   F.when(k % 2 == 0, F.lit("/product/x"))
                   .otherwise(F.lit("/cart/add")))
            .when(hmod % 4 == 1,
                  F.when(k % 2 == 0, F.lit("/wiki/page"))
                  .otherwise(F.lit("/docs/ref")))
            .when(hmod % 4 == 2,
                  F.when(k % 2 == 0, F.lit("/thread/t"))
                  .otherwise(F.lit("/forum/f")))
            .otherwise(F.when(k % 3 == 0, F.lit("/product/x"))
                       .when(k % 3 == 1, F.lit("/wiki/page"))
                       .otherwise(F.lit("/blog/post"))))
    d = (_t(spark, sf_dir, "orders")
         .select(host.alias("host_key"), path.alias("path")))
    cls = (F.when(F.col("path").rlike("^/(product|cart)/"),
                  F.lit("shop"))
           .when(F.col("path").rlike("^/(wiki|docs)/"),
                 F.lit("reference"))
           .when(F.col("path").rlike("^/(thread|forum)/"), F.lit("ugc"))
           .when(F.col("path").rlike("^/(post|blog)/"),
                 F.lit("editorial"))
           .otherwise(F.lit("other")))
    cen = (d.withColumn("vertical", cls)
           .groupBy("host_key")
           .agg(F.count(F.lit(1)).cast("long").alias("n_urls"),
                F.sum((F.col("vertical") == "shop").cast("int"))
                .cast("long").alias("n_shop"),
                F.sum((F.col("vertical") == "reference").cast("int"))
                .cast("long").alias("n_reference"),
                F.sum((F.col("vertical") == "ugc").cast("int"))
                .cast("long").alias("n_ugc"),
                F.sum((F.col("vertical") == "editorial").cast("int"))
                .cast("long").alias("n_editorial")))
    top = F.greatest("n_shop", "n_reference", "n_ugc", "n_editorial")
    dom = (F.when(top * 2 <= F.col("n_urls"), F.lit("mixed"))
           .when(F.col("n_shop") == top, F.lit("shop"))
           .when(F.col("n_reference") == top, F.lit("reference"))
           .when(F.col("n_ugc") == top, F.lit("ugc"))
           .otherwise(F.lit("editorial")))
    return (cen.withColumn("top", top)
            .withColumn("dominant", dom)
            .withColumn("top_share_ppm",
                        F.expr("top * 1000000 DIV n_urls").cast("long"))
            .drop("top"))


ORACLE_HOST_VERTICAL_MIX = """
WITH d AS (
  SELECT 'h' || (o_orderkey % 80) AS host_key,
         CASE WHEN (o_orderkey % 80) % 4 = 0 THEN
                CASE WHEN o_orderkey % 2 = 0 THEN '/product/x'
                     ELSE '/cart/add' END
              WHEN (o_orderkey % 80) % 4 = 1 THEN
                CASE WHEN o_orderkey % 2 = 0 THEN '/wiki/page'
                     ELSE '/docs/ref' END
              WHEN (o_orderkey % 80) % 4 = 2 THEN
                CASE WHEN o_orderkey % 2 = 0 THEN '/thread/t'
                     ELSE '/forum/f' END
              ELSE CASE WHEN o_orderkey % 3 = 0 THEN '/product/x'
                        WHEN o_orderkey % 3 = 1 THEN '/wiki/page'
                        ELSE '/blog/post' END END AS path
  FROM orders),
t AS (
  SELECT host_key,
         CASE WHEN regexp_matches(path, '^/(product|cart)/')
                THEN 'shop'
              WHEN regexp_matches(path, '^/(wiki|docs)/')
                THEN 'reference'
              WHEN regexp_matches(path, '^/(thread|forum)/') THEN 'ugc'
              WHEN regexp_matches(path, '^/(post|blog)/')
                THEN 'editorial'
              ELSE 'other' END AS vertical
  FROM d),
cen AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_urls,
         CAST(sum(CASE WHEN vertical = 'shop' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_shop,
         CAST(sum(CASE WHEN vertical = 'reference' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_reference,
         CAST(sum(CASE WHEN vertical = 'ugc' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_ugc,
         CAST(sum(CASE WHEN vertical = 'editorial' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_editorial
  FROM t GROUP BY host_key),
g AS (
  SELECT *, greatest(n_shop, n_reference, n_ugc, n_editorial) AS top
  FROM cen)
SELECT host_key, n_urls, n_shop, n_reference, n_ugc, n_editorial,
       CASE WHEN top * 2 <= n_urls THEN 'mixed'
            WHEN n_shop = top THEN 'shop'
            WHEN n_reference = top THEN 'reference'
            WHEN n_ugc = top THEN 'ugc'
            ELSE 'editorial' END AS dominant,
       CAST(top * 1000000 // n_urls AS BIGINT) AS top_share_ppm
FROM g
"""


def q_text_math_detect(spark, sf_dir):
    """MATH-content detection — the STEM-corpus router that pairs
    with text_code_detect (math-heavy pages want different
    tokenization, LaTeX-aware cleaning, and usually UP-weighting in
    a pretraining mix): per doc, the digit-token ratio, operator
    density (=+−*/^<>), equation-pattern count ('a = b' shapes and
    \\frac/\\sum LaTeX commands), all in exact ppm of tokens, and
    the math/mixed/prose verdict.

    Fixture: every 4th doc gains equation snippets ('x = 3 + 4'),
    every 6th a LaTeX fragment — deterministic injections over the
    prose corpus.

    Plan/scale: per-row regexp census, no shuffle; verdicts are the
    same CASE ladder the router applies inline."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull()).select("doc_id", "text"))
    t = F.col("text")
    t = F.when(F.col("doc_id") % 4 == 0,
               F.concat(t, F.lit(" x = 3 + 4 y = x * 2 z = y - 1"))) \
        .otherwise(t)
    t = F.when(F.col("doc_id") % 6 == 0,
               F.concat(t, F.lit(" \\frac{a}{b} \\sum_{i=0} e^x"))) \
        .otherwise(t)
    d = d.select("doc_id", t.alias("xt"))
    n_tok = F.size(F.split("xt", " ")).cast("long")
    n_digit_tok = F.size(F.filter(F.split("xt", " "),
                                  lambda w: w.rlike("^[0-9]+$"))) \
        .cast("long")
    n_ops = F.regexp_count("xt", F.lit(r"[=+*/^]| - ")).cast("long")
    n_eq = F.regexp_count(
        "xt", F.lit(r"[a-z0-9}] = [a-z0-9\\]")).cast("long")
    n_latex = F.regexp_count("xt", F.lit(r"\\(frac|sum|int|sqrt)")) \
        .cast("long")
    cen = (d.select("doc_id", n_tok.alias("n_tokens"),
                    n_digit_tok.alias("n_digit_tokens"),
                    n_ops.alias("n_operators"),
                    n_eq.alias("n_equations"),
                    n_latex.alias("n_latex"))
           .withColumn("digit_ppm",
                       F.expr("n_digit_tokens * 1000000 DIV n_tokens")
                       .cast("long"))
           .withColumn("op_ppm",
                       F.expr("n_operators * 1000000 DIV n_tokens")
                       .cast("long")))
    verdict = (F.when((F.col("n_latex") > 0)
                      | (F.col("n_equations") >= 3), F.lit("math"))
               .when(F.col("n_equations") >= 1, F.lit("mixed"))
               .otherwise(F.lit("prose")))
    return cen.withColumn("verdict", verdict)


ORACLE_TEXT_MATH_DETECT = """
WITH x AS (
  SELECT doc_id,
         CASE WHEN doc_id % 6 = 0
              THEN t1 || ' \\frac{a}{b} \\sum_{i=0} e^x'
              ELSE t1 END AS xt
  FROM (
    SELECT doc_id,
           CASE WHEN doc_id % 4 = 0
                THEN text || ' x = 3 + 4 y = x * 2 z = y - 1'
                ELSE text END AS t1
    FROM documents WHERE text IS NOT NULL)),
c AS (
  SELECT doc_id,
         CAST(len(string_split(xt, ' ')) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split(xt, ' '),
              w -> regexp_matches(w, '^[0-9]+$'))) AS BIGINT)
           AS n_digit_tokens,
         CAST(len(regexp_extract_all(xt, '[=+*/^]| - '))
              AS BIGINT) AS n_operators,
         CAST(len(regexp_extract_all(xt, '[a-z0-9}] = [a-z0-9\\\\]'))
              AS BIGINT) AS n_equations,
         CAST(len(regexp_extract_all(xt, '\\\\(frac|sum|int|sqrt)'))
              AS BIGINT) AS n_latex
  FROM x)
SELECT doc_id, n_tokens, n_digit_tokens, n_operators, n_equations,
       n_latex,
       CAST(n_digit_tokens * 1000000 // n_tokens AS BIGINT) AS digit_ppm,
       CAST(n_operators * 1000000 // n_tokens AS BIGINT) AS op_ppm,
       CASE WHEN n_latex > 0 OR n_equations >= 3 THEN 'math'
            WHEN n_equations >= 1 THEN 'mixed'
            ELSE 'prose' END AS verdict
FROM c
"""


def q_events_entry_exit(spark, sf_dir):
    """Session ENTRY/EXIT page census — the classic web-analytics
    pair the sessionizer feeds (which event type opens sessions
    tells you where traffic lands; which one closes them tells you
    where it leaks): sessions cut at 30-minute idle gaps (the
    events_sessionize convention), then per event_type: how often
    it is a session's FIRST event, its LAST, a census of
    single-event (bounce) sessions it constitutes, and the
    entry/exit shares in exact ppm of all sessions.

    Plan/scale: the standard per-user lag window builds session
    ids, one first/last extraction via min/max on (ts, event_id)
    struct ordering, one census groupBy — raw events shuffle once
    by user, sessions once by type."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id", "event_id", "event_type",
                  F.expr("unix_timestamp(ts)").cast("long").alias("es")))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = (ev.withColumn("prev", F.lag("es").over(w))
         .withColumn("new_sess",
                     ((F.col("prev").isNull())
                      | (F.col("es") - F.col("prev") > 1800))
                     .cast("int"))
         .withColumn("sess_no", F.sum("new_sess").over(
             w.rowsBetween(Window.unboundedPreceding, 0))))
    sid = F.concat(F.col("user_id").cast("string"), F.lit("#"),
                   F.col("sess_no").cast("string"))
    sess = (g.withColumn("sid", sid)
            .groupBy("sid")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.min(F.struct("es", "event_id", "event_type"))
                 .alias("first"),
                 F.max(F.struct("es", "event_id", "event_type"))
                 .alias("last")))
    tot = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    entries = (sess.select(F.col("first.event_type").alias("event_type"),
                           (F.col("n_events") == 1).cast("int")
                           .alias("bounce"))
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("long").alias("n_entry"),
                    F.sum("bounce").cast("long").alias("n_bounce")))
    exits = (sess.groupBy(F.col("last.event_type").alias("event_type"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_exit")))
    j = (entries.join(exits, "event_type", "full")
         .na.fill(0, ["n_entry", "n_bounce", "n_exit"]))
    return (j.crossJoin(F.broadcast(tot))
            .withColumn("entry_ppm",
                        F.expr("n_entry * 1000000 DIV n_sessions")
                        .cast("long"))
            .withColumn("exit_ppm",
                        F.expr("n_exit * 1000000 DIV n_sessions")
                        .cast("long"))
            .select("event_type", "n_entry", "n_exit", "n_bounce",
                    "entry_ppm", "exit_ppm"))


ORACLE_EVENTS_ENTRY_EXIT = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events),
g AS (
  SELECT *, CASE WHEN prev IS NULL OR es - prev > 1800 THEN 1 ELSE 0 END
           AS new_sess
  FROM (SELECT *, lag(es) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS prev
        FROM ev)),
s AS (
  SELECT *, CAST(user_id AS VARCHAR) || '#' || CAST(
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY es, event_id
                                 ROWS UNBOUNDED PRECEDING) AS VARCHAR)
           AS sid
  FROM g),
sess AS (
  SELECT sid, CAST(count(*) AS BIGINT) AS n_events,
         min(struct_pack(es := es, event_id := event_id,
                         event_type := event_type)) AS first,
         max(struct_pack(es := es, event_id := event_id,
                         event_type := event_type)) AS last
  FROM s GROUP BY sid),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM sess),
entries AS (
  SELECT first.event_type AS event_type,
         CAST(count(*) AS BIGINT) AS n_entry,
         CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounce
  FROM sess GROUP BY first.event_type),
exits AS (
  SELECT last.event_type AS event_type,
         CAST(count(*) AS BIGINT) AS n_exit
  FROM sess GROUP BY last.event_type)
SELECT coalesce(e.event_type, x.event_type) AS event_type,
       CAST(coalesce(e.n_entry, 0) AS BIGINT) AS n_entry,
       CAST(coalesce(x.n_exit, 0) AS BIGINT) AS n_exit,
       CAST(coalesce(e.n_bounce, 0) AS BIGINT) AS n_bounce,
       CAST(coalesce(e.n_entry, 0) * 1000000 // tot.n_sessions
            AS BIGINT) AS entry_ppm,
       CAST(coalesce(x.n_exit, 0) * 1000000 // tot.n_sessions
            AS BIGINT) AS exit_ppm
FROM entries e FULL JOIN exits x USING (event_type) CROSS JOIN tot
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


def q_embeddings_triplet_audit(spark, sf_dir):
    """TRIPLET-margin audit of the embedding space — the metric-
    learning acceptance test (is same-label actually closer than
    different-label?) run exactly the way a training-eval would:
    deterministic triplets pair each anchor with the next vector of
    its own label (positive, by vec_id order, cyclic) and the next
    vector of a different label (negative, the vec_id-adjacent one);
    a triplet VIOLATES when cos(a,p) < cos(a,n) + 0.05 margin. Per
    label: triplet count, violations, violation ppm — a space where
    violations ~ 50% carries no label signal.

    Exactness: exact float64 cosines rounded 6dp before the margin
    comparison; triplet choice is rank arithmetic, not sampling.

    Plan/scale: positives via one per-label lead() window, negatives
    via one global-order lead() filtered to label mismatch — two
    windows + two small joins, never all-pairs."""
    emb = (_t(spark, sf_dir, "embeddings")
           .select("vec_id", "label", "embedding"))
    wl = Window.partitionBy("label").orderBy("vec_id")
    wg = Window.orderBy("vec_id")
    trip = (emb
            .withColumn("pos_id", F.coalesce(
                F.lead("vec_id").over(wl),
                F.first("vec_id").over(
                    wl.rowsBetween(Window.unboundedPreceding,
                                   Window.unboundedFollowing))))
            .withColumn("cand_id", F.lead("vec_id").over(wg))
            .withColumn("cand_label", F.lead("label").over(wg)))
    neg = (trip.filter(F.col("cand_label") != F.col("label"))
           .filter(F.col("pos_id") != F.col("vec_id"))
           .select("vec_id", "label", "embedding", "pos_id",
                   F.col("cand_id").alias("neg_id")))
    p = emb.select(F.col("vec_id").alias("pos_id"),
                   F.col("embedding").alias("emb_p"))
    n = emb.select(F.col("vec_id").alias("neg_id"),
                   F.col("embedding").alias("emb_n"))
    j = neg.join(p, "pos_id").join(n, "neg_id")
    va = F.transform("embedding", lambda x: x.cast("double"))
    vp = F.transform("emb_p", lambda x: x.cast("double"))
    vn = F.transform("emb_n", lambda x: x.cast("double"))
    cos_p = F.round(SIM._dot(va, vp) / (SIM._norm(va) * SIM._norm(vp)), 6)
    cos_n = F.round(SIM._dot(va, vn) / (SIM._norm(va) * SIM._norm(vn)), 6)
    scored = j.select("label",
                      (cos_p < cos_n + 0.05).cast("int").alias("viol"))
    return (scored.groupBy("label")
            .agg(F.count(F.lit(1)).cast("long").alias("n_triplets"),
                 F.sum("viol").cast("long").alias("n_violations"))
            .withColumn("violation_ppm",
                        F.expr("n_violations * 1000000 DIV n_triplets")
                        .cast("long")))


ORACLE_EMBEDDINGS_TRIPLET_AUDIT = """
WITH emb AS (SELECT vec_id, label, embedding FROM embeddings),
trip AS (
  SELECT vec_id, label, embedding,
         coalesce(lead(vec_id) OVER (PARTITION BY label ORDER BY vec_id),
                  first_value(vec_id) OVER (
                      PARTITION BY label ORDER BY vec_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND UNBOUNDED FOLLOWING)) AS pos_id,
         lead(vec_id) OVER (ORDER BY vec_id) AS cand_id,
         lead(label) OVER (ORDER BY vec_id) AS cand_label
  FROM emb),
neg AS (
  SELECT vec_id, label, embedding, pos_id, cand_id AS neg_id
  FROM trip
  WHERE cand_label <> label AND pos_id <> vec_id),
j AS (
  SELECT a.label,
         round(list_sum(list_transform(range(len(a.embedding)),
             i -> a.embedding[i+1]::DOUBLE * p.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(a.embedding)),
             i -> a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(p.embedding)),
             i -> p.embedding[i+1]::DOUBLE * p.embedding[i+1]::DOUBLE)))),
           6) AS cos_p,
         round(list_sum(list_transform(range(len(a.embedding)),
             i -> a.embedding[i+1]::DOUBLE * n.embedding[i+1]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(len(a.embedding)),
             i -> a.embedding[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)))
          * sqrt(list_sum(list_transform(range(len(n.embedding)),
             i -> n.embedding[i+1]::DOUBLE * n.embedding[i+1]::DOUBLE)))),
           6) AS cos_n
  FROM neg a
  JOIN emb p ON p.vec_id = a.pos_id
  JOIN emb n ON n.vec_id = a.neg_id)
SELECT label, CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(sum(CASE WHEN cos_p < cos_n + 0.05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_violations,
       CAST(sum(CASE WHEN cos_p < cos_n + 0.05 THEN 1 ELSE 0 END)
            * 1000000 // count(*) AS BIGINT) AS violation_ppm
FROM j GROUP BY label
"""


def q_frontier_quarantine(spark, sf_dir):
    """Dead-host QUARANTINE with exponential re-probe — the policy
    that stops a crawler from burning its politeness budget on hosts
    that have been dark for weeks while still noticing when they
    come back: a host with f consecutive failed rounds is probed
    again only at round last_success + 2^min(f, 6) (capped
    backoff); the row emits each host's failure streak, quarantine
    state, the next probe round, and whether the CURRENT round
    (fixture round 100) should probe it.

    Exactness: pure integer arithmetic (shiftleft for 2^f).

    Plan/scale: one row per host from the host-state table — the
    same single-pass shape as the AIMD row; no joins."""
    k = F.col("o_orderkey")
    hosts = (_t(spark, sf_dir, "orders")
             .select(F.concat(F.lit("h"), (k % 499).cast("string"))
                     .alias("host_key"),
                     (k % 9).cast("long").alias("fail_streak"),
                     (F.lit(100) - k % 40 - 1).cast("long")
                     .alias("last_success_round"))
             .groupBy("host_key")
             .agg(F.max("fail_streak").cast("long").alias("fail_streak"),
                  F.min("last_success_round").cast("long")
                  .alias("last_success_round")))
    backoff = F.expr(
        "shiftleft(1L, CAST(least(fail_streak, 6L) AS INT))")
    nxt = (F.col("last_success_round") + backoff).cast("long")
    cur = 100
    return (hosts.withColumn("backoff_rounds", backoff.cast("long"))
            .withColumn("next_probe_round", nxt)
            .withColumn("is_quarantined",
                        (F.col("fail_streak") >= 3).cast("int"))
            .withColumn("probe_now",
                        ((F.col("fail_streak") < 3)
                         | (nxt <= cur)).cast("int")))


ORACLE_FRONTIER_QUARANTINE = """
WITH hosts AS (
  SELECT 'h' || (o_orderkey % 499) AS host_key,
         CAST(max(o_orderkey % 9) AS BIGINT) AS fail_streak,
         CAST(min(100 - o_orderkey % 40 - 1) AS BIGINT)
           AS last_success_round
  FROM orders GROUP BY 1),
b AS (
  SELECT host_key, fail_streak, last_success_round,
         CAST(1 << CAST(least(fail_streak, 6) AS INT) AS BIGINT)
           AS backoff_rounds
  FROM hosts)
SELECT host_key, fail_streak, last_success_round, backoff_rounds,
       CAST(last_success_round + backoff_rounds AS BIGINT)
         AS next_probe_round,
       CAST(CASE WHEN fail_streak >= 3 THEN 1 ELSE 0 END AS INT)
         AS is_quarantined,
       CAST(CASE WHEN fail_streak < 3
                  OR last_success_round + backoff_rounds <= 100
                 THEN 1 ELSE 0 END AS INT) AS probe_now
FROM b
"""


def q_corpus_greedy_select(spark, sf_dir):
    """GREEDY budget-constrained curation — the knapsack-relaxation
    every 'best N tokens under budget' data selection runs (sort by
    quality density, take the prefix): docs score a deterministic
    quality (the length/digit/stopword rubric in integer milli-
    units), density = quality per token, and the selector admits
    docs in (density desc, doc_id asc) order until the 20k-token
    budget is hit (first overflow doc excluded, classic greedy).
    Emits the per-source census of selected vs rejected mass and
    the realized average quality — the number you compare against
    random selection to prove curation pays.

    Plan/scale: the running-sum window is ordered over DOC-level
    rows (not tokens); at 10^10 docs the same selection runs as a
    density-histogram threshold search (two passes) — documented
    here, the window form is the fixture-exact reference."""
    d = (_t(spark, sf_dir, "documents")
         .filter(F.col("text").isNotNull())
         .select("doc_id", "source",
                 F.size(F.split("text", " ")).cast("long")
                 .alias("n_tokens")))
    quality = ((F.col("doc_id") * 37) % 1000 + 1).cast("long")
    d = (d.withColumn("quality_milli", quality)
         .withColumn("density_micro",
                     F.expr("quality_milli * 1000 DIV n_tokens")
                     .cast("long")))
    w = Window.orderBy(F.col("density_micro").desc(),
                       F.col("doc_id").asc())
    sel = (d.withColumn("cum_tokens",
                        F.sum("n_tokens").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                        .cast("long"))
           .withColumn("selected",
                       (F.col("cum_tokens") <= 20000).cast("int")))
    return (sel.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                 F.sum("selected").cast("long").alias("n_selected"),
                 F.sum(F.col("selected") * F.col("n_tokens"))
                 .cast("long").alias("tokens_selected"),
                 F.sum(F.col("selected") * F.col("quality_milli"))
                 .cast("long").alias("quality_selected"),
                 F.sum("n_tokens").cast("long").alias("tokens_total"))
            .withColumn("select_ppm",
                        F.expr("tokens_selected * 1000000 "
                               "DIV tokens_total").cast("long")))


ORACLE_CORPUS_GREEDY_SELECT = """
WITH d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         CAST((doc_id * 37) % 1000 + 1 AS BIGINT) AS quality_milli
  FROM documents WHERE text IS NOT NULL),
dd AS (
  SELECT *, CAST(quality_milli * 1000 // n_tokens AS BIGINT)
           AS density_micro
  FROM d),
sel AS (
  SELECT *, CAST(sum(n_tokens) OVER (
             ORDER BY density_micro DESC, doc_id ASC
             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM dd)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN cum_tokens <= 20000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_selected,
       CAST(sum(CASE WHEN cum_tokens <= 20000 THEN n_tokens ELSE 0 END)
            AS BIGINT) AS tokens_selected,
       CAST(sum(CASE WHEN cum_tokens <= 20000 THEN quality_milli
                     ELSE 0 END) AS BIGINT) AS quality_selected,
       CAST(sum(n_tokens) AS BIGINT) AS tokens_total,
       CAST(sum(CASE WHEN cum_tokens <= 20000 THEN n_tokens ELSE 0 END)
            * 1000000 // sum(n_tokens) AS BIGINT) AS select_ppm
FROM sel GROUP BY source
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


def q_corpus_dedup_mix_shift(spark, sf_dir):
    """Dedup MIX-SHIFT audit — deduplication is not mix-neutral
    (boilerplate-heavy sources lose more mass), so a curation
    pipeline must re-check its source mixture AFTER dedup or the
    carefully-tuned weights silently drift: over the twin corpus,
    per source (docs keyed back to their origin), the pre-dedup and
    post-dedup (exact md5, keep-lowest-id) doc counts and shares in
    ppm, and the mix shift each source suffered.

    Plan/scale: the exact-dedup groupBy the dedup family already
    pays, plus two census aggs; the shift math is arithmetic on the
    census rows."""
    c = _corpus(spark, sf_dir)
    src = F.when(F.col("doc_id") % 3 == 0, F.lit("web")) \
        .when(F.col("doc_id") % 3 == 1, F.lit("forum")) \
        .otherwise(F.lit("docs"))
    tagged = c.withColumn("source", src)
    keep = (tagged.groupBy(F.md5("text").alias("h"))
            .agg(F.min("doc_id").alias("doc_id")))
    kept = tagged.join(keep, "doc_id")
    pre = (tagged.groupBy("source")
           .agg(F.count(F.lit(1)).cast("long").alias("n_pre")))
    post = (kept.groupBy("source")
            .agg(F.count(F.lit(1)).cast("long").alias("n_post")))
    tp = pre.agg(F.sum("n_pre").cast("long").alias("tot_pre"))
    to = post.agg(F.sum("n_post").cast("long").alias("tot_post"))
    j = (pre.join(post, "source")
         .crossJoin(F.broadcast(tp)).crossJoin(F.broadcast(to)))
    return (j.withColumn("pre_ppm",
                         F.expr("n_pre * 1000000 DIV tot_pre")
                         .cast("long"))
            .withColumn("post_ppm",
                        F.expr("n_post * 1000000 DIV tot_post")
                        .cast("long"))
            .withColumn("shift_ppm",
                        (F.col("post_ppm") - F.col("pre_ppm"))
                        .cast("long"))
            .withColumn("survival_ppm",
                        F.expr("n_post * 1000000 DIV n_pre")
                        .cast("long"))
            .select("source", "n_pre", "n_post", "pre_ppm", "post_ppm",
                    "shift_ppm", "survival_ppm"))


ORACLE_CORPUS_DEDUP_MIX_SHIFT = f"""
WITH {_CORPUS_SQL},
tagged AS (
  SELECT doc_id, text,
         CASE WHEN doc_id % 3 = 0 THEN 'web'
              WHEN doc_id % 3 = 1 THEN 'forum'
              ELSE 'docs' END AS source
  FROM corpus),
keep AS (
  SELECT md5(text) AS h, min(doc_id) AS doc_id
  FROM tagged GROUP BY md5(text)),
kept AS (
  SELECT t.source FROM tagged t JOIN keep k ON k.doc_id = t.doc_id),
pre AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_pre
  FROM tagged GROUP BY source),
post AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_post
  FROM kept GROUP BY source)
SELECT source, n_pre, n_post,
       CAST(n_pre * 1000000 // (SELECT sum(n_pre) FROM pre) AS BIGINT)
         AS pre_ppm,
       CAST(n_post * 1000000 // (SELECT sum(n_post) FROM post)
            AS BIGINT) AS post_ppm,
       CAST(n_post * 1000000 // (SELECT sum(n_post) FROM post)
            - n_pre * 1000000 // (SELECT sum(n_pre) FROM pre)
            AS BIGINT) AS shift_ppm,
       CAST(n_post * 1000000 // n_pre AS BIGINT) AS survival_ppm
FROM pre JOIN post USING (source)
"""


def q_events_qini_curve(spark, sf_dir):
    """QINI / uplift-by-decile curve — the standard evaluation for
    any targeting model (does the model's top decile actually show
    more treatment lift than the bottom?): users are ranked by a
    deterministic model score, cut into 10 deciles by exact
    nearest-rank, and each decile reports treatment vs control
    conversion in exact ppm, the decile lift, and the cumulative
    qini numerator (conv_t·N_c − conv_c·N_t scaled) that the area-
    under-qini reads off.

    Exactness: deciles via integer rank math ((rank−1)·10 DIV n);
    all rates exact ppm; the qini term is pure integer cross-
    multiplication.

    Plan/scale: one per-user census, one rank window over users
    (at 10^10 users: pre-aggregate to score histograms), one
    decile groupBy + one cumsum over 10 rows."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  (F.col("event_type") == "purchase").cast("int")
                  .alias("conv")))
    per_u = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max("conv").cast("long").alias("converted")))
    score = ((F.col("user_id") * 61 + F.col("n_ev") * 17) % 1000) \
        .cast("long")
    arm = (F.col("user_id") % 2).cast("int")
    t = per_u.withColumn("score", score).withColumn("arm", arm)
    wr = Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
    nn = t.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (t.withColumn("rnk", F.row_number().over(wr).cast("long"))
              .crossJoin(F.broadcast(nn))
              .withColumn("decile",
                          F.expr("(rnk - 1) * 10 DIV n").cast("long")))
    dec = (ranked.groupBy("decile")
           .agg(F.sum((F.col("arm") == 1).cast("int")).cast("long")
                .alias("n_t"),
                F.sum(((F.col("arm") == 1) & (F.col("converted") == 1))
                      .cast("int")).cast("long").alias("c_t"),
                F.sum((F.col("arm") == 0).cast("int")).cast("long")
                .alias("n_c"),
                F.sum(((F.col("arm") == 0) & (F.col("converted") == 1))
                      .cast("int")).cast("long").alias("c_c")))
    rate_t = F.when(F.col("n_t") > 0,
                    F.expr("c_t * 1000000 DIV n_t"))
    rate_c = F.when(F.col("n_c") > 0,
                    F.expr("c_c * 1000000 DIV n_c"))
    scored = (dec.withColumn("rate_t_ppm", rate_t.cast("long"))
              .withColumn("rate_c_ppm", rate_c.cast("long"))
              .withColumn("lift_ppm",
                          (rate_t - rate_c).cast("long"))
              .withColumn("qini_term",
                          (F.col("c_t") * F.col("n_c")
                           - F.col("c_c") * F.col("n_t")).cast("long")))
    wq = Window.orderBy("decile")
    return (scored.withColumn("qini_cum",
                              F.sum("qini_term").over(wq).cast("long"))
            .select("decile", "n_t", "c_t", "n_c", "c_c",
                    "rate_t_ppm", "rate_c_ppm", "lift_ppm", "qini_cum"))


ORACLE_EVENTS_QINI_CURVE = """
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events GROUP BY user_id),
t AS (
  SELECT user_id, converted,
         CAST((user_id * 61 + n_ev * 17) % 1000 AS BIGINT) AS score,
         CAST(user_id % 2 AS INT) AS arm
  FROM pu),
r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, user_id ASC)
                 AS BIGINT) AS rnk,
         (SELECT CAST(count(*) AS BIGINT) FROM t) AS n
  FROM t),
d AS (
  SELECT CAST((rnk - 1) * 10 // n AS BIGINT) AS decile,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_t,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_c
  FROM r GROUP BY 1)
SELECT decile, n_t, c_t, n_c, c_c,
       CAST(CASE WHEN n_t > 0 THEN c_t * 1000000 // n_t END AS BIGINT)
         AS rate_t_ppm,
       CAST(CASE WHEN n_c > 0 THEN c_c * 1000000 // n_c END AS BIGINT)
         AS rate_c_ppm,
       CAST(CASE WHEN n_t > 0 AND n_c > 0
                 THEN c_t * 1000000 // n_t - c_c * 1000000 // n_c
            END AS BIGINT) AS lift_ppm,
       CAST(sum(c_t * n_c - c_c * n_t) OVER (ORDER BY decile)
            AS BIGINT) AS qini_cum
FROM d
"""


def q_corpus_storage_tiering(spark, sf_dir):
    """HOT/WARM/COLD storage-tier planning — the cost lever every
    100 TB corpus store pulls (hot SSD for the working set, warm
    object storage for occasional reads, cold archive for the
    long tail): docs tier by access recency (age <= 30d hot,
    <= 90d warm, else cold — the freshness-decay fixture's ages),
    and the plan reports per-tier object count, byte mass, the
    monthly cost in exact micro-units (hot 23, warm 10, cold 2 per
    char — S3-ish ratios), and the saving vs an all-hot layout.

    Plan/scale: per-row CASE + ONE census groupBy(tier) — the plan
    is three rows at any corpus size; the mover job that executes
    it reads only the tier column."""
    d = (_t(spark, sf_dir, "documents")
         .select("doc_id", "n_chars",
                 ((F.col("doc_id") * 3) % 180).cast("long")
                 .alias("age_days")))
    tier = (F.when(F.col("age_days") <= 30, F.lit("hot"))
            .when(F.col("age_days") <= 90, F.lit("warm"))
            .otherwise(F.lit("cold")))
    price = (F.when(F.col("age_days") <= 30, F.lit(23))
             .when(F.col("age_days") <= 90, F.lit(10))
             .otherwise(F.lit(2))).cast("long")
    staged = d.withColumn("tier", tier).withColumn("price", price)
    cen = (staged.groupBy("tier")
           .agg(F.count(F.lit(1)).cast("long").alias("n_docs"),
                F.sum("n_chars").cast("long").alias("bytes"),
                F.sum(F.col("n_chars") * F.col("price")).cast("long")
                .alias("cost_micro")))
    return (cen.withColumn("all_hot_micro",
                           (F.col("bytes") * 23).cast("long"))
            .withColumn("saving_micro",
                        (F.col("bytes") * 23 - F.col("cost_micro"))
                        .cast("long")))


ORACLE_CORPUS_STORAGE_TIERING = """
WITH d AS (
  SELECT n_chars, CAST((doc_id * 3) % 180 AS BIGINT) AS age_days
  FROM documents),
s AS (
  SELECT n_chars,
         CASE WHEN age_days <= 30 THEN 'hot'
              WHEN age_days <= 90 THEN 'warm'
              ELSE 'cold' END AS tier,
         CAST(CASE WHEN age_days <= 30 THEN 23
              WHEN age_days <= 90 THEN 10 ELSE 2 END AS BIGINT) AS price
  FROM d)
SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS bytes,
       CAST(sum(n_chars * price) AS BIGINT) AS cost_micro,
       CAST(sum(n_chars) * 23 AS BIGINT) AS all_hot_micro,
       CAST(sum(n_chars) * 23 - sum(n_chars * price) AS BIGINT)
         AS saving_micro
FROM s GROUP BY tier
"""


def q_events_seasonal_residual(spark, sf_dir):
    """Hour-of-day SEASONAL-RESIDUAL anomaly — the detector the
    plain z-score row misfires on (3am traffic is 'anomalously low'
    only if you ignore that 3am is always low): per (event_type,
    hour-of-day) cell, the mean daily count over the corpus day
    span in exact centi-events, the single worst day's count, and
    the anomaly flag when the peak runs >= 2x the cell's own
    seasonal baseline — deviation FROM the cycle, not from the
    global mean.

    Exactness: pure epoch integer arithmetic for day/hour; mean in
    centi via integer DIV over the full day span (absent days count
    as zero — that is the baseline's denominator by definition).

    Plan/scale: one (type, hour, day) census, one (type, hour)
    rollup — 24·|types| output rows at any scale."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  F.expr("unix_timestamp(ts) % 86400 DIV 3600")
                  .cast("long").alias("hour")))
    span = ev.agg((F.max("day") - F.min("day") + 1).cast("long")
                  .alias("span_days"))
    cell = (ev.groupBy("event_type", "hour", "day")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per = (cell.groupBy("event_type", "hour")
           .agg(F.sum("n").cast("long").alias("total"),
                F.max("n").cast("long").alias("peak"),
                F.count(F.lit(1)).cast("long").alias("n_days_active")))
    j = per.crossJoin(F.broadcast(span))
    return (j.withColumn("mean_centi",
                         F.expr("total * 100 DIV span_days")
                         .cast("long"))
            .withColumn("is_anomalous",
                        (F.col("peak") * 100
                         >= 2 * F.col("mean_centi")).cast("int"))
            .select("event_type", "hour", "total", "peak",
                    "n_days_active", "mean_centi", "is_anomalous"))


ORACLE_EVENTS_SEASONAL_RESIDUAL = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS hour
  FROM events),
span AS (
  SELECT CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days FROM ev),
cell AS (
  SELECT event_type, hour, day, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type, hour, day),
per AS (
  SELECT event_type, hour, CAST(sum(n) AS BIGINT) AS total,
         CAST(max(n) AS BIGINT) AS peak,
         CAST(count(*) AS BIGINT) AS n_days_active
  FROM cell GROUP BY event_type, hour)
SELECT event_type, hour, total, peak, n_days_active,
       CAST(total * 100 // span.span_days AS BIGINT) AS mean_centi,
       CAST(CASE WHEN peak * 100 >= 2 * (total * 100 // span.span_days)
                 THEN 1 ELSE 0 END AS INT) AS is_anomalous
FROM per CROSS JOIN span
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


def q_graph_katz_bounded(spark, sf_dir):
    """Bounded KATZ centrality (2-walk truncation) — the attenuated
    walk-count centrality that ranks influence without PageRank's
    iteration: katz(v) = Σ_k α^k · walks_k(v) truncated at k=2,
    which is deg(v) + α·Σ_{u∈N(v)} deg(u) exactly — one degree
    census and one neighbor join, no fixpoint. α = 1/4 keeps the
    score an exact integer in milli-units (deg·1000 +
    250·Σ deg(u)). The truncation is the standard cheap Katz
    screen before anyone pays for the full solve.

    Plan/scale: degree census + ONE join of the edge list to the
    degree table + one groupBy — linear in edges, no iteration."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    raw = (_t(spark, sf_dir, "orders").select(
        F.concat(F.lit("t"), (k % 30).cast("string")).alias("u"),
        F.concat(F.lit("t"), ((c % 30) % 20).cast("string")).alias("v"))
        .filter(F.col("u") != F.col("v")))
    und = (raw.select(F.least("u", "v").alias("a"),
                      F.greatest("u", "v").alias("b"))
           .distinct())
    sym = (und.select(F.col("a").alias("n"), F.col("b").alias("m"))
           .unionByName(und.select(F.col("b").alias("n"),
                                   F.col("a").alias("m"))))
    deg = sym.groupBy("n").agg(F.count(F.lit(1)).cast("long")
                               .alias("deg"))
    nbr = (sym.join(deg.select(F.col("n").alias("m"),
                               F.col("deg").alias("deg_m")), "m")
           .groupBy("n")
           .agg(F.sum("deg_m").cast("long").alias("sum_nbr_deg")))
    return (deg.join(nbr, "n")
            .withColumn("katz_milli",
                        (F.col("deg") * 1000
                         + 250 * F.col("sum_nbr_deg")).cast("long"))
            .select(F.col("n").alias("host_key"), "deg",
                    "sum_nbr_deg", "katz_milli"))


ORACLE_GRAPH_KATZ_BOUNDED = """
WITH raw AS (
  SELECT 't' || (o_orderkey % 30) AS u, 't' || ((o_custkey % 30) % 20) AS v
  FROM orders
  WHERE 't' || (o_orderkey % 30) <> 't' || ((o_custkey % 30) % 20)),
und AS (
  SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b FROM raw),
sym AS (
  SELECT a AS n, b AS m FROM und
  UNION ALL SELECT b AS n, a AS m FROM und),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS deg FROM sym GROUP BY n),
nbr AS (
  SELECT s.n, CAST(sum(d.deg) AS BIGINT) AS sum_nbr_deg
  FROM sym s JOIN deg d ON d.n = s.m GROUP BY s.n)
SELECT deg.n AS host_key, deg.deg, nbr.sum_nbr_deg,
       CAST(deg.deg * 1000 + 250 * nbr.sum_nbr_deg AS BIGINT)
         AS katz_milli
FROM deg JOIN nbr USING (n)
"""


def q_text_template_mine(spark, sf_dir):
    """Log/boilerplate TEMPLATE mining (Drain-style, one level) —
    the structure extractor for machine-generated text: lines that
    become identical once their variable slots (digit runs) are
    masked to '<N>' belong to one template; per template the census
    reports instance count, how many DISTINCT raw variants filled
    it, the slot count, and the template class (static: one
    variant; parametric: many variants through few slots). Mining
    templates first is how log corpora dedup 100:1 before any
    n-gram pass.

    Fixture: deterministic machine lines ('fetch <id> took <ms> ms'
    shapes) emitted with varying ids/latencies.

    Plan/scale: mask via one regexp_replace, census via ONE
    groupBy(template) with count + countDistinct — the template
    space is Heaps-tiny; raw lines shuffle once."""
    k = F.col("o_orderkey")
    line = (F.when(k % 4 == 0,
                   F.concat(F.lit("fetch "), k.cast("string"),
                            F.lit(" took "), (k % 900).cast("string"),
                            F.lit(" ms")))
            .when(k % 4 == 1,
                  F.concat(F.lit("retry "), (k % 5).cast("string"),
                           F.lit(" for host h"),
                           (k % 120).cast("string")))
            .when(k % 4 == 2,
                  F.concat(F.lit("parsed "), (k % 60).cast("string"),
                           F.lit(" links depth "),
                           (k % 3).cast("string")))
            .otherwise(F.lit("politeness sleep done")))
    d = _t(spark, sf_dir, "orders").select(line.alias("line"))
    tpl = F.regexp_replace("line", "[0-9]+", "<N>")
    t = d.withColumn("template", tpl)
    cen = (t.groupBy("template")
           .agg(F.count(F.lit(1)).cast("long").alias("n_instances"),
                F.countDistinct("line").cast("long").alias("n_variants")))
    n_slots = F.expr(
        "CAST((length(template) - "
        "length(replace(template, '<N>', 'xx'))) AS BIGINT)")
    return (cen.withColumn("n_slots", n_slots)
            .withColumn("template_class",
                        F.when(F.col("n_variants") == 1, F.lit("static"))
                        .otherwise(F.lit("parametric"))))


ORACLE_TEXT_TEMPLATE_MINE = """
WITH d AS (
  SELECT CASE WHEN o_orderkey % 4 = 0 THEN
              'fetch ' || o_orderkey || ' took ' || (o_orderkey % 900)
              || ' ms'
            WHEN o_orderkey % 4 = 1 THEN
              'retry ' || (o_orderkey % 5) || ' for host h'
              || (o_orderkey % 120)
            WHEN o_orderkey % 4 = 2 THEN
              'parsed ' || (o_orderkey % 60) || ' links depth '
              || (o_orderkey % 3)
            ELSE 'politeness sleep done' END AS line
  FROM orders),
t AS (
  SELECT line, regexp_replace(line, '[0-9]+', '<N>', 'g') AS template
  FROM d),
cen AS (
  SELECT template, CAST(count(*) AS BIGINT) AS n_instances,
         CAST(count(DISTINCT line) AS BIGINT) AS n_variants
  FROM t GROUP BY template)
SELECT template, n_instances, n_variants,
       CAST(length(template) - length(replace(template, '<N>', 'xx'))
            AS BIGINT) AS n_slots,
       CASE WHEN n_variants = 1 THEN 'static'
            ELSE 'parametric' END AS template_class
FROM cen
"""


def q_host_uptime_sla(spark, sf_dir):
    """Host UPTIME-SLA attainment — the availability grade a crawl
    operator reads before blaming its own fetcher (a host that was
    genuinely down doesn't count against crawler health): a host-day
    is DOWN when errors carry more than half that day's events;
    uptime = up-days over observed days in exact ppm, graded
    against the standard SLA ladder (99.9% / 99% / 95%) with the
    credit tier a real SLA would pay out.

    Plan/scale: one (host, day) census with conditional sums, one
    host rollup — two map-side-combinable aggs, no windows."""
    ev = (_t(spark, sf_dir, "events")
          .select((F.col("user_id") % 20).cast("long").alias("host_id"),
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  (F.col("event_type") == "error").cast("int")
                  .alias("is_err")))
    hd = (ev.groupBy("host_id", "day")
          .agg(F.count(F.lit(1)).cast("long").alias("n"),
               F.sum("is_err").cast("long").alias("e")))
    flagged = hd.withColumn("down", (F.col("e") * 2 > F.col("n"))
                            .cast("int"))
    per = (flagged.groupBy("host_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum("down").cast("long").alias("down_days")))
    up_ppm = F.expr("(n_days - down_days) * 1000000 DIV n_days")
    return (per.withColumn("uptime_ppm", up_ppm.cast("long"))
            .withColumn("sla_tier",
                        F.when(up_ppm >= 999000, F.lit("meets-99.9"))
                        .when(up_ppm >= 990000, F.lit("meets-99"))
                        .when(up_ppm >= 950000, F.lit("meets-95"))
                        .otherwise(F.lit("breach")))
            .withColumn("credit_pct",
                        F.when(up_ppm >= 999000, F.lit(0))
                        .when(up_ppm >= 990000, F.lit(10))
                        .when(up_ppm >= 950000, F.lit(25))
                        .otherwise(F.lit(100)).cast("long")))


ORACLE_HOST_UPTIME_SLA = """
WITH ev AS (
  SELECT CAST(user_id % 20 AS BIGINT) AS host_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_err
  FROM events),
hd AS (
  SELECT host_id, day, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(is_err) AS BIGINT) AS e
  FROM ev GROUP BY host_id, day),
per AS (
  SELECT host_id, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CASE WHEN e * 2 > n THEN 1 ELSE 0 END) AS BIGINT)
           AS down_days
  FROM hd GROUP BY host_id),
u AS (
  SELECT host_id, n_days, down_days,
         CAST((n_days - down_days) * 1000000 // n_days AS BIGINT)
           AS uptime_ppm
  FROM per)
SELECT host_id, n_days, down_days, uptime_ppm,
       CASE WHEN uptime_ppm >= 999000 THEN 'meets-99.9'
            WHEN uptime_ppm >= 990000 THEN 'meets-99'
            WHEN uptime_ppm >= 950000 THEN 'meets-95'
            ELSE 'breach' END AS sla_tier,
       CAST(CASE WHEN uptime_ppm >= 999000 THEN 0
                 WHEN uptime_ppm >= 990000 THEN 10
                 WHEN uptime_ppm >= 950000 THEN 25
                 ELSE 100 END AS BIGINT) AS credit_pct
FROM u
"""


QUERIES = {
    "url_canonicalize": q_url_canonicalize,
    "url_network_type": q_url_network_type,
    "url_host_key": q_url_host_key,
    "url_ext_bucket": q_url_ext_bucket,
    "frontier_install": q_frontier_install,
    "frontier_install_bucketed": q_frontier_install_bucketed,
    "frontier_wave_select": q_frontier_wave_select,
    "frontier_host_agg": q_frontier_host_agg,
    "seen_anti_join": q_seen_anti_join,
    "validity_rubric": q_validity_rubric,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_incremental": q_dedup_incremental,
    "dedup_cluster_reps": q_dedup_cluster_reps,
    "dedup_exact_substr": q_dedup_exact_substr,
    "dedup_tfidf_cosine": q_dedup_tfidf_cosine,
    "join_salted": q_join_salted,
    "text_bpe_apply": q_text_bpe_apply,
    "corpus_clean": q_corpus_clean,
    "corpus_clean_full": q_corpus_clean_full,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash64": q_dedup_simhash64,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "dedup_decontaminate": q_dedup_decontaminate,
    "corpus_vocab_topk": q_corpus_vocab_topk,
    "corpus_mixture": q_corpus_mixture,
    "corpus_pack": q_corpus_pack,
    "corpus_sample_weighted": q_corpus_sample_weighted,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "text_lang_id": q_text_lang_id,
    "text_quality": q_text_quality,
    "text_token_count": q_text_token_count,
    "text_fingerprint": q_text_fingerprint,
    "text_tfidf_topk": q_text_tfidf_topk,
    "text_repetition": q_text_repetition,
    "text_c4_clean": q_text_c4_clean,
    "text_pii_redact": q_text_pii_redact,
    "events_windowed": q_events_windowed,
    "events_sessionize": q_events_sessionize,
    "events_quantiles": q_events_quantiles,
    "events_rollup": q_events_rollup,
    "events_asof_join": q_events_asof_join,
    "events_range_join": q_events_range_join,
    "url_kmv_distinct": q_url_kmv_distinct,
    "url_hll_distinct": q_url_hll_distinct,
    "url_cms_heavy": q_url_cms_heavy,
    "frontier_zorder": q_frontier_zorder,
    "sitemap_ingest": q_sitemap_ingest,
    "frontier_change_rate": q_frontier_change_rate,
    "events_quantile_sketch": q_events_quantile_sketch,
    "url_trap_detect": q_url_trap_detect,
    "host_pagerank": q_host_pagerank,
    "corpus_split": q_corpus_split,
    "pricing_summary": q_pricing_summary,
    "dispatch_join": q_dispatch_join,
    "leak_dispatch": q_leak_dispatch,
    "leak_dispatch2": q_leak_dispatch2,
    "leak_dispatch3": q_leak_dispatch3,
    "leak_collect": q_leak_collect,
    "text_bpe_train_step": q_text_bpe_train_step,
    "corpus_profile": q_corpus_profile,
    "events_scd2": q_events_scd2,
    "embeddings_rp": q_embeddings_rp,
    "corpus_compact": q_corpus_compact,
    "corpus_shard_manifest": q_corpus_shard_manifest,
    "events_late_audit": q_events_late_audit,
    "seen_anti_join_cuckoo": q_seen_anti_join_cuckoo,
    "frontier_merge_upsert": q_frontier_merge_upsert,
    "dedup_minhash_eval": q_dedup_minhash_eval,
    "text_readability": q_text_readability,
    "robots_admission": q_robots_admission,
    "robots_rfc": q_robots_rfc,
    "spans_interleave": q_spans_interleave,
    "spans_reconstruct": q_spans_reconstruct,
    "spans_media_context": q_spans_media_context,
    "media_decode": q_media_decode,
    "media_resize": q_media_resize,
    "spans_boilerplate": q_spans_boilerplate,
    "spans_pack_multimodal": q_spans_pack_multimodal,
    "spans_media_dedup": q_spans_media_dedup,
    "text_unigram_lm": q_text_unigram_lm,
    "text_bigram_lm": q_text_bigram_lm,
    "embeddings_quantize": q_embeddings_quantize,
    "embeddings_pq": q_embeddings_pq,
    "ann_pq_topk": q_ann_pq_topk,
    "frontier_recrawl": q_frontier_recrawl,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "stream_sessionize": q_stream_sessionize,
    "stream_dedup": q_stream_dedup,
    "stream_windowed": q_stream_windowed,
    "corpus_sample_stratified": q_corpus_sample_stratified,
    "events_anomaly": q_events_anomaly,
    "stream_enrich": q_stream_enrich,
    "text_gopher": q_text_gopher,
    "dedup_semantic": q_dedup_semantic,
    "frontier_opic": q_frontier_opic,
    "host_hits": q_host_hits,
    "stream_join": q_stream_join,
    "robots_directives": q_robots_directives,
    "frontier_budget": q_frontier_budget,
    "corpus_ppl_buckets": q_corpus_ppl_buckets,
    "events_sliding": q_events_sliding,
    "media_phash": q_media_phash,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "frontier_schedule": q_frontier_schedule,
    "corpus_dedup_url": q_corpus_dedup_url,
    "text_langid_ngram": q_text_langid_ngram,
    "dedup_containment": q_dedup_containment,
    "host_components": q_host_components,
    "media_framesample": q_media_framesample,
    "stream_topk": q_stream_topk,
    "media_audio": q_media_audio,
    "embeddings_kmeans_step": q_embeddings_kmeans_step,
    "corpus_token_budget": q_corpus_token_budget,
    "text_url_extract": q_text_url_extract,
    "url_param_strip": q_url_param_strip,
    "host_reciprocal": q_host_reciprocal,
    "warc_ingest": q_warc_ingest,
    "events_markov": q_events_markov,
    "stream_dedup_wm": q_stream_dedup_wm,
    "spans_pipeline": q_spans_pipeline,
    "url_idn_normalize": q_url_idn_normalize,
    "media_scenes": q_media_scenes,
    "media_vad": q_media_vad,
    "corpus_epoch_shuffle": q_corpus_epoch_shuffle,
    "host_domain_rollup": q_host_domain_rollup,
    "url_near_dup": q_url_near_dup,
    "graph_triangles": q_graph_triangles,
    "frontier_pipeline": q_frontier_pipeline,
    "text_bm25_topk": q_text_bm25_topk,
    "corpus_dsir_resample": q_corpus_dsir_resample,
    "text_hashed_lr": q_text_hashed_lr,
    "graph_neighbor_jaccard": q_graph_neighbor_jaccard,
    "events_cdc_apply": q_events_cdc_apply,
    "text_ngram_novelty": q_text_ngram_novelty,
    "ann_recall_eval": q_ann_recall_eval,
    "corpus_quality_ensemble": q_corpus_quality_ensemble,
    "stream_upsert": q_stream_upsert,
    "media_phash_pairs": q_media_phash_pairs,
    "frontier_checkpoint_diff": q_frontier_checkpoint_diff,
    "frontier_host_fairness": q_frontier_host_fairness,
    "url_shard_rebalance": q_url_shard_rebalance,
    "corpus_drift_kl": q_corpus_drift_kl,
    "text_sentence_dedup": q_text_sentence_dedup,
    "text_bigram_pmi": q_text_bigram_pmi,
    "cdx_ingest": q_cdx_ingest,
    "text_char_entropy": q_text_char_entropy,
    "text_mojibake": q_text_mojibake,
    "graph_label_prop": q_graph_label_prop,
    "text_zipf_fit": q_text_zipf_fit,
    "corpus_curriculum": q_corpus_curriculum,
    "embeddings_standardize": q_embeddings_standardize,
    "host_budget_waterfill": q_host_budget_waterfill,
    "media_audio_fingerprint": q_media_audio_fingerprint,
    "snapshot_expire": q_snapshot_expire,
    "graph_modularity": q_graph_modularity,
    "corpus_domain_cap": q_corpus_domain_cap,
    "frontier_ucb": q_frontier_ucb,
    "text_rake": q_text_rake,
    "graph_kcore": q_graph_kcore,
    "url_bloom_eval": q_url_bloom_eval,
    "host_trustrank": q_host_trustrank,
    "frontier_crawl_delay": q_frontier_crawl_delay,
    "spans_stats": q_spans_stats,
    "fetch_revalidate": q_fetch_revalidate,
    "host_anchor_text": q_host_anchor_text,
    "graph_harmonic": q_graph_harmonic,
    "url_redirect_resolve": q_url_redirect_resolve,
    "host_ip_colocation": q_host_ip_colocation,
    "spans_caption_pairs": q_spans_caption_pairs,
    "text_quality_pr": q_text_quality_pr,
    "text_inverted_index": q_text_inverted_index,
    "warc_revisit": q_warc_revisit,
    "corpus_tokenizer_fertility": q_corpus_tokenizer_fertility,
    "jsonl_ingest": q_jsonl_ingest,
    "host_lang_mix": q_host_lang_mix,
    "http_content_type": q_http_content_type,
    "host_outlink_diversity": q_host_outlink_diversity,
    "embeddings_mmr_rerank": q_embeddings_mmr_rerank,
    "events_ohlc": q_events_ohlc,
    "frontier_age_stats": q_frontier_age_stats,
    "embeddings_norm_audit": q_embeddings_norm_audit,
    "spans_token_budget": q_spans_token_budget,
    "host_mirror_detect": q_host_mirror_detect,
    "text_code_detect": q_text_code_detect,
    "graph_hop_histogram": q_graph_hop_histogram,
    "embeddings_mrl_eval": q_embeddings_mrl_eval,
    "frontier_dga_hosts": q_frontier_dga_hosts,
    "sitemap_staleness": q_sitemap_staleness,
    "spans_ref_integrity": q_spans_ref_integrity,
    "events_heartbeat_gaps": q_events_heartbeat_gaps,
    "text_lang_confusion": q_text_lang_confusion,
    "warc_cdx_audit": q_warc_cdx_audit,
    "politeness_audit": q_politeness_audit,
    "url_shard_handoff": q_url_shard_handoff,
    "text_dup_ngram_coverage": q_text_dup_ngram_coverage,
    "host_response_profile": q_host_response_profile,
    "text_rag_chunks": q_text_rag_chunks,
    "graph_assortativity": q_graph_assortativity,
    "corpus_mix_temperature": q_corpus_mix_temperature,
    "graph_scc": q_graph_scc,
    "dns_cache_plan": q_dns_cache_plan,
    "fetch_backoff_plan": q_fetch_backoff_plan,
    "scan_prune_plan": q_scan_prune_plan,
    "snapshot_changelog": q_snapshot_changelog,
    "shuffle_skew_audit": q_shuffle_skew_audit,
    "url_kmv_overlap": q_url_kmv_overlap,
    "split_leakage_audit": q_split_leakage_audit,
    "frontier_discovery_curve": q_frontier_discovery_curve,
    "url_blocklist_filter": q_url_blocklist_filter,
    "fetch_mime_mismatch": q_fetch_mime_mismatch,
    "url_pattern_mine": q_url_pattern_mine,
    "graph_bowtie": q_graph_bowtie,
    "graph_degree_powerlaw": q_graph_degree_powerlaw,
    "events_attribution": q_events_attribution,
    "events_ab_lift": q_events_ab_lift,
    "embeddings_pca_power": q_embeddings_pca_power,
    "graph_pagerank_delta": q_graph_pagerank_delta,
    "events_bot_detect": q_events_bot_detect,
    "embeddings_pq_distortion": q_embeddings_pq_distortion,
    "frontier_makespan": q_frontier_makespan,
    "text_heaps_fit": q_text_heaps_fit,
    "events_path_trigrams": q_events_path_trigrams,
    "url_scheme_consolidate": q_url_scheme_consolidate,
    "graph_adamic_adar": q_graph_adamic_adar,
    "events_survival": q_events_survival,
    "http_cache_headers": q_http_cache_headers,
    "text_kn_bigram": q_text_kn_bigram,
    "events_rfm": q_events_rfm,
    "media_color_histogram": q_media_color_histogram,
    "text_calibration_ece": q_text_calibration_ece,
    "events_changepoint": q_events_changepoint,
    "host_wilson_rank": q_host_wilson_rank,
    "text_ttr_sttr": q_text_ttr_sttr,
    "events_lift_matrix": q_events_lift_matrix,
    "embeddings_cell_balance": q_embeddings_cell_balance,
    "url_dot_segments": q_url_dot_segments,
    "host_ssrf_guard": q_host_ssrf_guard,
    "host_shard_family": q_host_shard_family,
    "host_typosquat": q_host_typosquat,
    "events_seasonality": q_events_seasonality,
    "url_soft404_detect": q_url_soft404_detect,
    "http_security_headers": q_http_security_headers,
    "url_lang_variant": q_url_lang_variant,
    "events_gini": q_events_gini,
    "url_pct_normalize": q_url_pct_normalize,
    "robots_meta": q_robots_meta,
    "feed_ingest": q_feed_ingest,
    "http_cookies": q_http_cookies,
    "corpus_length_buckets": q_corpus_length_buckets,
    "events_dau_mau": q_events_dau_mau,
    "ann_nndescent_step": q_ann_nndescent_step,
    "embeddings_centroid_drift": q_embeddings_centroid_drift,
    "frontier_seed_sources": q_frontier_seed_sources,
    "stream_histogram": q_stream_histogram,
    "politeness_violations": q_politeness_violations,
    "corpus_dedup_threshold_curve": q_corpus_dedup_threshold_curve,
    "url_rel_canonical": q_url_rel_canonical,
    "text_lexicon_triage": q_text_lexicon_triage,
    "url_content_agreement": q_url_content_agreement,
    "ann_recall_vs_nprobe": q_ann_recall_vs_nprobe,
    "http_compression": q_http_compression,
    "robots_conflict": q_robots_conflict,
    "spans_fingerprint_dedup": q_spans_fingerprint_dedup,
    "spans_diff": q_spans_diff,
    "stream_spans_ingest": q_stream_spans_ingest,
    "host_sitemap_coverage": q_host_sitemap_coverage,
    "http_ratelimit": q_http_ratelimit,
    "corpus_bitext_mine": q_corpus_bitext_mine,
    "graph_conductance": q_graph_conductance,
    "dedup_lsh_bucket_audit": q_dedup_lsh_bucket_audit,
    "host_homograph": q_host_homograph,
    "ann_binary_hamming": q_ann_binary_hamming,
    "events_concurrency": q_events_concurrency,
    "corpus_pack_fragmentation": q_corpus_pack_fragmentation,
    "url_normalize_pipeline": q_url_normalize_pipeline,
    "frontier_admission_ensemble": q_frontier_admission_ensemble,
    "frontier_priority_decay": q_frontier_priority_decay,
    "dedup_cdc_chunks": q_dedup_cdc_chunks,
    "frontier_wfq": q_frontier_wfq,
    "media_entropy_filter": q_media_entropy_filter,
    "spans_multimodal3": q_spans_multimodal3,
    "text_lm_heldout": q_text_lm_heldout,
    "embeddings_ood_centroid": q_embeddings_ood_centroid,
    "url_session_params": q_url_session_params,
    "text_script_detect": q_text_script_detect,
    "events_burstiness": q_events_burstiness,
    "media_aspect_buckets": q_media_aspect_buckets,
    "events_cuped": q_events_cuped,
    "graph_local_clustering": q_graph_local_clustering,
    "frontier_tld_quota": q_frontier_tld_quota,
    "text_moss_pairs": q_text_moss_pairs,
    "frontier_rank_churn": q_frontier_rank_churn,
    "url_double_encoding": q_url_double_encoding,
    "corpus_freshness_value": q_corpus_freshness_value,
    "graph_rich_club": q_graph_rich_club,
    "media_metadata_scrub": q_media_metadata_scrub,
    "corpus_license_gate": q_corpus_license_gate,
    "events_power_sample_size": q_events_power_sample_size,
    "events_markov_entropy": q_events_markov_entropy,
    "host_error_burn": q_host_error_burn,
    "embeddings_hubness_audit": q_embeddings_hubness_audit,
    "events_trend_mk": q_events_trend_mk,
    "text_invisible_chars": q_text_invisible_chars,
    "frontier_schedule_smear": q_frontier_schedule_smear,
    "url_mobile_amp_collapse": q_url_mobile_amp_collapse,
    "corpus_span_corruption": q_corpus_span_corruption,
    "text_fineweb_rules": q_text_fineweb_rules,
    "events_benford": q_events_benford,
    "text_dialog_turns": q_text_dialog_turns,
    "url_shortener_detect": q_url_shortener_detect,
    "frontier_aimd_window": q_frontier_aimd_window,
    "url_fragment_policy": q_url_fragment_policy,
    "corpus_vocab_coverage": q_corpus_vocab_coverage,
    "embeddings_distance_histogram": q_embeddings_distance_histogram,
    "frontier_wave_entropy": q_frontier_wave_entropy,
    "text_html_entities": q_text_html_entities,
    "url_case_fold": q_url_case_fold,
    "events_autocorr": q_events_autocorr,
    "text_date_extract": q_text_date_extract,
    "events_ltv_triangle": q_events_ltv_triangle,
    "events_simpson_audit": q_events_simpson_audit,
    "host_vertical_mix": q_host_vertical_mix,
    "text_math_detect": q_text_math_detect,
    "events_entry_exit": q_events_entry_exit,
    "url_redirect_loops": q_url_redirect_loops,
    "embeddings_triplet_audit": q_embeddings_triplet_audit,
    "frontier_quarantine": q_frontier_quarantine,
    "corpus_greedy_select": q_corpus_greedy_select,
    "url_default_port": q_url_default_port,
    "corpus_dedup_mix_shift": q_corpus_dedup_mix_shift,
    "events_qini_curve": q_events_qini_curve,
    "corpus_storage_tiering": q_corpus_storage_tiering,
    "events_seasonal_residual": q_events_seasonal_residual,
    "url_param_sort": q_url_param_sort,
    "graph_katz_bounded": q_graph_katz_bounded,
    "text_template_mine": q_text_template_mine,
    "host_uptime_sla": q_host_uptime_sla,
}

ORACLES = {
    "url_canonicalize": ORACLE_URL_CANONICALIZE,
    "url_network_type": ORACLE_URL_NETWORK_TYPE,
    "url_host_key": ORACLE_URL_HOST_KEY,
    "url_ext_bucket": ORACLE_URL_EXT_BUCKET,
    "frontier_install": ORACLE_FRONTIER_INSTALL,
    "frontier_install_bucketed": ORACLE_FRONTIER_INSTALL_BUCKETED,
    "frontier_wave_select": ORACLE_FRONTIER_WAVE_SELECT,
    "frontier_host_agg": ORACLE_FRONTIER_HOST_AGG,
    "seen_anti_join": ORACLE_SEEN_ANTI_JOIN,
    "validity_rubric": ORACLE_VALIDITY_RUBRIC,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "dedup_minhash_lsh": ORACLE_DEDUP_MINHASH,
    "dedup_incremental": ORACLE_DEDUP_INCREMENTAL,
    "dedup_cluster_reps": ORACLE_DEDUP_CLUSTER_REPS,
    "dedup_exact_substr": ORACLE_DEDUP_EXACT_SUBSTR,
    "dedup_tfidf_cosine": ORACLE_DEDUP_TFIDF_COSINE,
    "join_salted": ORACLE_JOIN_SALTED,
    "text_bpe_apply": ORACLE_TEXT_BPE_APPLY,
    "corpus_clean": ORACLE_CORPUS_CLEAN,
    "corpus_clean_full": ORACLE_CORPUS_CLEAN_FULL,
    "dedup_simhash": ORACLE_DEDUP_SIMHASH,
    "dedup_simhash64": ORACLE_DEDUP_SIMHASH64,
    "dedup_ngram_jaccard": ORACLE_DEDUP_NGRAM,
    "dedup_embedding_cosine": ORACLE_DEDUP_EMBEDDING,
    "dedup_decontaminate": ORACLE_DEDUP_DECONTAMINATE,
    "corpus_vocab_topk": ORACLE_CORPUS_VOCAB_TOPK,
    "corpus_mixture": ORACLE_CORPUS_MIXTURE,
    "corpus_pack": ORACLE_CORPUS_PACK,
    "corpus_sample_weighted": ORACLE_CORPUS_SAMPLE_WEIGHTED,
    "ann_cosine_topk": ORACLE_ANN_COSINE,
    "ann_lsh_topk": ORACLE_ANN_LSH,
    "ann_ivf_topk": ORACLE_ANN_IVF,
    "text_lang_id": ORACLE_TEXT_LANG_ID,
    "text_quality": ORACLE_TEXT_QUALITY,
    "text_token_count": ORACLE_TEXT_TOKEN_COUNT,
    "text_fingerprint": ORACLE_TEXT_FINGERPRINT,
    "text_tfidf_topk": ORACLE_TEXT_TFIDF_TOPK,
    "text_repetition": ORACLE_TEXT_REPETITION,
    "text_c4_clean": ORACLE_TEXT_C4_CLEAN,
    "text_pii_redact": ORACLE_TEXT_PII_REDACT,
    "events_windowed": ORACLE_EVENTS_WINDOWED,
    "events_sessionize": ORACLE_EVENTS_SESSIONIZE,
    "events_quantiles": ORACLE_EVENTS_QUANTILES,
    "events_rollup": ORACLE_EVENTS_ROLLUP,
    "events_asof_join": ORACLE_EVENTS_ASOF,
    "events_range_join": ORACLE_EVENTS_RANGE_JOIN,
    "url_kmv_distinct": ORACLE_URL_KMV,
    "url_hll_distinct": ORACLE_URL_HLL,
    "url_cms_heavy": ORACLE_URL_CMS,
    "frontier_zorder": ORACLE_FRONTIER_ZORDER,
    "sitemap_ingest": ORACLE_SITEMAP_INGEST,
    "frontier_change_rate": ORACLE_FRONTIER_CHANGE_RATE,
    "events_quantile_sketch": ORACLE_EVENTS_QSKETCH,
    "url_trap_detect": ORACLE_URL_TRAP,
    "host_pagerank": ORACLE_HOST_PAGERANK,
    "corpus_split": ORACLE_CORPUS_SPLIT,
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "dispatch_join": ORACLE_DISPATCH_JOIN,
    "leak_dispatch": ORACLE_LEAK_DISPATCH,
    "leak_dispatch2": ORACLE_LEAK_DISPATCH2,
    "leak_dispatch3": ORACLE_LEAK_DISPATCH3,
    "leak_collect": ORACLE_LEAK_COLLECT,
    "text_bpe_train_step": ORACLE_TEXT_BPE_TRAIN_STEP,
    "corpus_profile": ORACLE_CORPUS_PROFILE,
    "events_scd2": ORACLE_EVENTS_SCD2,
    "embeddings_rp": ORACLE_EMBEDDINGS_RP,
    "corpus_compact": ORACLE_CORPUS_COMPACT,
    "corpus_shard_manifest": ORACLE_CORPUS_SHARD_MANIFEST,
    "events_late_audit": ORACLE_EVENTS_LATE_AUDIT,
    "seen_anti_join_cuckoo": ORACLE_SEEN_ANTI_JOIN_CUCKOO,
    "frontier_merge_upsert": ORACLE_FRONTIER_MERGE_UPSERT,
    "dedup_minhash_eval": ORACLE_DEDUP_MINHASH_EVAL,
    "text_readability": ORACLE_TEXT_READABILITY,
    "robots_admission": ORACLE_ROBOTS_ADMISSION,
    "robots_rfc": ORACLE_ROBOTS_RFC,
    "spans_interleave": ORACLE_SPANS_INTERLEAVE,
    "spans_reconstruct": ORACLE_SPANS_RECONSTRUCT,
    "spans_media_context": ORACLE_SPANS_MEDIA_CONTEXT,
    "media_decode": ORACLE_MEDIA_DECODE,
    "media_resize": ORACLE_MEDIA_RESIZE,
    "spans_boilerplate": ORACLE_SPANS_BOILERPLATE,
    "spans_pack_multimodal": ORACLE_SPANS_PACK_MULTIMODAL,
    "spans_media_dedup": ORACLE_SPANS_MEDIA_DEDUP,
    "text_unigram_lm": ORACLE_TEXT_UNIGRAM_LM,
    "text_bigram_lm": ORACLE_TEXT_BIGRAM_LM,
    "embeddings_quantize": ORACLE_EMBEDDINGS_QUANTIZE,
    "embeddings_pq": ORACLE_EMBEDDINGS_PQ,
    "ann_pq_topk": ORACLE_ANN_PQ,
    "frontier_recrawl": ORACLE_FRONTIER_RECRAWL,
    "events_funnel": ORACLE_EVENTS_FUNNEL,
    "events_retention": ORACLE_EVENTS_RETENTION,
    "stream_sessionize": ORACLE_STREAM_SESSIONIZE,
    "stream_dedup": ORACLE_STREAM_DEDUP,
    "stream_windowed": ORACLE_STREAM_WINDOWED,
    "corpus_sample_stratified": ORACLE_CORPUS_SAMPLE_STRATIFIED,
    "events_anomaly": ORACLE_EVENTS_ANOMALY,
    "stream_enrich": ORACLE_STREAM_ENRICH,
    "text_gopher": ORACLE_TEXT_GOPHER,
    "dedup_semantic": ORACLE_DEDUP_SEMANTIC,
    "frontier_opic": ORACLE_FRONTIER_OPIC,
    "host_hits": ORACLE_HOST_HITS,
    "stream_join": ORACLE_STREAM_JOIN,
    "robots_directives": ORACLE_ROBOTS_DIRECTIVES,
    "frontier_budget": ORACLE_FRONTIER_BUDGET,
    "corpus_ppl_buckets": ORACLE_CORPUS_PPL_BUCKETS,
    "events_sliding": ORACLE_EVENTS_SLIDING,
    "media_phash": ORACLE_MEDIA_PHASH,
    "ann_ivfpq_topk": ORACLE_ANN_IVFPQ,
    "frontier_schedule": ORACLE_FRONTIER_SCHEDULE,
    "corpus_dedup_url": ORACLE_CORPUS_DEDUP_URL,
    "text_langid_ngram": ORACLE_TEXT_LANGID_NGRAM,
    "dedup_containment": ORACLE_DEDUP_CONTAINMENT,
    "host_components": ORACLE_HOST_COMPONENTS,
    "media_framesample": ORACLE_MEDIA_FRAMESAMPLE,
    "stream_topk": ORACLE_STREAM_TOPK,
    "media_audio": ORACLE_MEDIA_AUDIO,
    "embeddings_kmeans_step": ORACLE_EMBEDDINGS_KMEANS,
    "corpus_token_budget": ORACLE_CORPUS_TOKEN_BUDGET,
    "text_url_extract": ORACLE_TEXT_URL_EXTRACT,
    "url_param_strip": ORACLE_URL_PARAM_STRIP,
    "host_reciprocal": ORACLE_HOST_RECIPROCAL,
    "warc_ingest": ORACLE_WARC_INGEST,
    "events_markov": ORACLE_EVENTS_MARKOV,
    "stream_dedup_wm": ORACLE_STREAM_DEDUP_WM,
    "spans_pipeline": ORACLE_SPANS_PIPELINE,
    "url_idn_normalize": ORACLE_URL_IDN,
    "media_scenes": ORACLE_MEDIA_SCENES,
    "media_vad": ORACLE_MEDIA_VAD,
    "corpus_epoch_shuffle": ORACLE_CORPUS_EPOCH_SHUFFLE,
    "host_domain_rollup": ORACLE_HOST_DOMAIN_ROLLUP,
    "url_near_dup": ORACLE_URL_NEAR_DUP,
    "graph_triangles": ORACLE_GRAPH_TRIANGLES,
    "frontier_pipeline": ORACLE_FRONTIER_PIPELINE,
    "text_bm25_topk": ORACLE_TEXT_BM25_TOPK,
    "corpus_dsir_resample": ORACLE_CORPUS_DSIR_RESAMPLE,
    "text_hashed_lr": ORACLE_TEXT_HASHED_LR,
    "graph_neighbor_jaccard": ORACLE_GRAPH_NEIGHBOR_JACCARD,
    "events_cdc_apply": ORACLE_EVENTS_CDC_APPLY,
    "text_ngram_novelty": ORACLE_TEXT_NGRAM_NOVELTY,
    "ann_recall_eval": ORACLE_ANN_RECALL_EVAL,
    "corpus_quality_ensemble": ORACLE_CORPUS_QUALITY_ENSEMBLE,
    "stream_upsert": ORACLE_STREAM_UPSERT,
    "media_phash_pairs": ORACLE_MEDIA_PHASH_PAIRS,
    "frontier_checkpoint_diff": ORACLE_FRONTIER_CHECKPOINT_DIFF,
    "frontier_host_fairness": ORACLE_FRONTIER_HOST_FAIRNESS,
    "url_shard_rebalance": ORACLE_URL_SHARD_REBALANCE,
    "corpus_drift_kl": ORACLE_CORPUS_DRIFT_KL,
    "text_sentence_dedup": ORACLE_TEXT_SENTENCE_DEDUP,
    "text_bigram_pmi": ORACLE_TEXT_BIGRAM_PMI,
    "cdx_ingest": ORACLE_CDX_INGEST,
    "text_char_entropy": ORACLE_TEXT_CHAR_ENTROPY,
    "text_mojibake": ORACLE_TEXT_MOJIBAKE,
    "graph_label_prop": ORACLE_GRAPH_LABEL_PROP,
    "text_zipf_fit": ORACLE_TEXT_ZIPF_FIT,
    "corpus_curriculum": ORACLE_CORPUS_CURRICULUM,
    "embeddings_standardize": ORACLE_EMBEDDINGS_STANDARDIZE,
    "host_budget_waterfill": ORACLE_HOST_BUDGET_WATERFILL,
    "media_audio_fingerprint": ORACLE_MEDIA_AUDIO_FINGERPRINT,
    "snapshot_expire": ORACLE_SNAPSHOT_EXPIRE,
    "graph_modularity": ORACLE_GRAPH_MODULARITY,
    "corpus_domain_cap": ORACLE_CORPUS_DOMAIN_CAP,
    "frontier_ucb": ORACLE_FRONTIER_UCB,
    "text_rake": ORACLE_TEXT_RAKE,
    "graph_kcore": ORACLE_GRAPH_KCORE,
    "url_bloom_eval": ORACLE_URL_BLOOM_EVAL,
    "host_trustrank": ORACLE_HOST_TRUSTRANK,
    "frontier_crawl_delay": ORACLE_FRONTIER_CRAWL_DELAY,
    "spans_stats": ORACLE_SPANS_STATS,
    "fetch_revalidate": ORACLE_FETCH_REVALIDATE,
    "host_anchor_text": ORACLE_HOST_ANCHOR_TEXT,
    "graph_harmonic": ORACLE_GRAPH_HARMONIC,
    "url_redirect_resolve": ORACLE_URL_REDIRECT_RESOLVE,
    "host_ip_colocation": ORACLE_HOST_IP_COLOCATION,
    "spans_caption_pairs": ORACLE_SPANS_CAPTION_PAIRS,
    "text_quality_pr": ORACLE_TEXT_QUALITY_PR,
    "text_inverted_index": ORACLE_TEXT_INVERTED_INDEX,
    "warc_revisit": ORACLE_WARC_REVISIT,
    "corpus_tokenizer_fertility": ORACLE_CORPUS_TOKENIZER_FERTILITY,
    "jsonl_ingest": ORACLE_JSONL_INGEST,
    "host_lang_mix": ORACLE_HOST_LANG_MIX,
    "http_content_type": ORACLE_HTTP_CONTENT_TYPE,
    "host_outlink_diversity": ORACLE_HOST_OUTLINK_DIVERSITY,
    "embeddings_mmr_rerank": ORACLE_EMBEDDINGS_MMR,
    "events_ohlc": ORACLE_EVENTS_OHLC,
    "frontier_age_stats": ORACLE_FRONTIER_AGE_STATS,
    "embeddings_norm_audit": ORACLE_EMBEDDINGS_NORM_AUDIT,
    "spans_token_budget": ORACLE_SPANS_TOKEN_BUDGET,
    "host_mirror_detect": ORACLE_HOST_MIRROR_DETECT,
    "text_code_detect": ORACLE_TEXT_CODE_DETECT,
    "graph_hop_histogram": ORACLE_GRAPH_HOP_HISTOGRAM,
    "embeddings_mrl_eval": ORACLE_EMBEDDINGS_MRL_EVAL,
    "frontier_dga_hosts": ORACLE_FRONTIER_DGA_HOSTS,
    "sitemap_staleness": ORACLE_SITEMAP_STALENESS,
    "spans_ref_integrity": ORACLE_SPANS_REF_INTEGRITY,
    "events_heartbeat_gaps": ORACLE_EVENTS_HEARTBEAT_GAPS,
    "text_lang_confusion": ORACLE_TEXT_LANG_CONFUSION,
    "warc_cdx_audit": ORACLE_WARC_CDX_AUDIT,
    "politeness_audit": ORACLE_POLITENESS_AUDIT,
    "url_shard_handoff": ORACLE_URL_SHARD_HANDOFF,
    "text_dup_ngram_coverage": ORACLE_TEXT_DUP_NGRAM_COVERAGE,
    "host_response_profile": ORACLE_HOST_RESPONSE_PROFILE,
    "text_rag_chunks": ORACLE_TEXT_RAG_CHUNKS,
    "graph_assortativity": ORACLE_GRAPH_ASSORTATIVITY,
    "corpus_mix_temperature": ORACLE_CORPUS_MIX_TEMPERATURE,
    "graph_scc": ORACLE_GRAPH_SCC,
    "dns_cache_plan": ORACLE_DNS_CACHE_PLAN,
    "fetch_backoff_plan": ORACLE_FETCH_BACKOFF_PLAN,
    "scan_prune_plan": ORACLE_SCAN_PRUNE_PLAN,
    "snapshot_changelog": ORACLE_SNAPSHOT_CHANGELOG,
    "shuffle_skew_audit": ORACLE_SHUFFLE_SKEW_AUDIT,
    "url_kmv_overlap": ORACLE_URL_KMV_OVERLAP,
    "split_leakage_audit": ORACLE_SPLIT_LEAKAGE_AUDIT,
    "frontier_discovery_curve": ORACLE_FRONTIER_DISCOVERY_CURVE,
    "url_blocklist_filter": ORACLE_URL_BLOCKLIST_FILTER,
    "fetch_mime_mismatch": ORACLE_FETCH_MIME_MISMATCH,
    "url_pattern_mine": ORACLE_URL_PATTERN_MINE,
    "graph_bowtie": ORACLE_GRAPH_BOWTIE,
    "graph_degree_powerlaw": ORACLE_GRAPH_DEGREE_POWERLAW,
    "events_attribution": ORACLE_EVENTS_ATTRIBUTION,
    "events_ab_lift": ORACLE_EVENTS_AB_LIFT,
    "embeddings_pca_power": ORACLE_EMBEDDINGS_PCA_POWER,
    "graph_pagerank_delta": ORACLE_GRAPH_PAGERANK_DELTA,
    "events_bot_detect": ORACLE_EVENTS_BOT_DETECT,
    "embeddings_pq_distortion": ORACLE_EMBEDDINGS_PQ_DISTORTION,
    "frontier_makespan": ORACLE_FRONTIER_MAKESPAN,
    "text_heaps_fit": ORACLE_TEXT_HEAPS_FIT,
    "events_path_trigrams": ORACLE_EVENTS_PATH_TRIGRAMS,
    "url_scheme_consolidate": ORACLE_URL_SCHEME_CONSOLIDATE,
    "graph_adamic_adar": ORACLE_GRAPH_ADAMIC_ADAR,
    "events_survival": ORACLE_EVENTS_SURVIVAL,
    "http_cache_headers": ORACLE_HTTP_CACHE_HEADERS,
    "text_kn_bigram": ORACLE_TEXT_KN_BIGRAM,
    "events_rfm": ORACLE_EVENTS_RFM,
    "media_color_histogram": ORACLE_MEDIA_COLOR_HISTOGRAM,
    "text_calibration_ece": ORACLE_TEXT_CALIBRATION_ECE,
    "events_changepoint": ORACLE_EVENTS_CHANGEPOINT,
    "host_wilson_rank": ORACLE_HOST_WILSON_RANK,
    "text_ttr_sttr": ORACLE_TEXT_TTR_STTR,
    "events_lift_matrix": ORACLE_EVENTS_LIFT_MATRIX,
    "embeddings_cell_balance": ORACLE_EMBEDDINGS_CELL_BALANCE,
    "url_dot_segments": ORACLE_URL_DOT_SEGMENTS,
    "host_ssrf_guard": ORACLE_HOST_SSRF_GUARD,
    "host_shard_family": ORACLE_HOST_SHARD_FAMILY,
    "host_typosquat": ORACLE_HOST_TYPOSQUAT,
    "events_seasonality": ORACLE_EVENTS_SEASONALITY,
    "url_soft404_detect": ORACLE_URL_SOFT404_DETECT,
    "http_security_headers": ORACLE_HTTP_SECURITY_HEADERS,
    "url_lang_variant": ORACLE_URL_LANG_VARIANT,
    "events_gini": ORACLE_EVENTS_GINI,
    "url_pct_normalize": ORACLE_URL_PCT_NORMALIZE,
    "robots_meta": ORACLE_ROBOTS_META,
    "feed_ingest": ORACLE_FEED_INGEST,
    "http_cookies": ORACLE_HTTP_COOKIES,
    "corpus_length_buckets": ORACLE_CORPUS_LENGTH_BUCKETS,
    "events_dau_mau": ORACLE_EVENTS_DAU_MAU,
    "ann_nndescent_step": ORACLE_ANN_NNDESCENT,
    "embeddings_centroid_drift": ORACLE_EMBEDDINGS_CENTROID_DRIFT,
    "frontier_seed_sources": ORACLE_FRONTIER_SEED_SOURCES,
    "stream_histogram": ORACLE_STREAM_HISTOGRAM,
    "politeness_violations": ORACLE_POLITENESS_VIOLATIONS,
    "corpus_dedup_threshold_curve": ORACLE_CORPUS_DEDUP_THRESHOLD_CURVE,
    "url_rel_canonical": ORACLE_URL_REL_CANONICAL,
    "text_lexicon_triage": ORACLE_TEXT_LEXICON_TRIAGE,
    "url_content_agreement": ORACLE_URL_CONTENT_AGREEMENT,
    "ann_recall_vs_nprobe": ORACLE_ANN_RECALL_VS_NPROBE,
    "http_compression": ORACLE_HTTP_COMPRESSION,
    "robots_conflict": ORACLE_ROBOTS_CONFLICT,
    "spans_fingerprint_dedup": ORACLE_SPANS_FINGERPRINT_DEDUP,
    "spans_diff": ORACLE_SPANS_DIFF,
    "stream_spans_ingest": ORACLE_STREAM_SPANS_INGEST,
    "host_sitemap_coverage": ORACLE_HOST_SITEMAP_COVERAGE,
    "http_ratelimit": ORACLE_HTTP_RATELIMIT,
    "corpus_bitext_mine": ORACLE_CORPUS_BITEXT_MINE,
    "graph_conductance": ORACLE_GRAPH_CONDUCTANCE,
    "dedup_lsh_bucket_audit": ORACLE_DEDUP_LSH_BUCKET_AUDIT,
    "host_homograph": ORACLE_HOST_HOMOGRAPH,
    "ann_binary_hamming": ORACLE_ANN_BINARY_HAMMING,
    "events_concurrency": ORACLE_EVENTS_CONCURRENCY,
    "corpus_pack_fragmentation": ORACLE_CORPUS_PACK_FRAGMENTATION,
    "url_normalize_pipeline": ORACLE_URL_NORMALIZE_PIPELINE,
    "frontier_admission_ensemble": ORACLE_FRONTIER_ADMISSION_ENSEMBLE,
    "frontier_priority_decay": ORACLE_FRONTIER_PRIORITY_DECAY,
    "dedup_cdc_chunks": ORACLE_DEDUP_CDC_CHUNKS,
    "frontier_wfq": ORACLE_FRONTIER_WFQ,
    "media_entropy_filter": ORACLE_MEDIA_ENTROPY_FILTER,
    "spans_multimodal3": ORACLE_SPANS_MULTIMODAL3,
    "text_lm_heldout": ORACLE_TEXT_LM_HELDOUT,
    "embeddings_ood_centroid": ORACLE_EMBEDDINGS_OOD_CENTROID,
    "url_session_params": ORACLE_URL_SESSION_PARAMS,
    "text_script_detect": ORACLE_TEXT_SCRIPT_DETECT,
    "events_burstiness": ORACLE_EVENTS_BURSTINESS,
    "media_aspect_buckets": ORACLE_MEDIA_ASPECT_BUCKETS,
    "events_cuped": ORACLE_EVENTS_CUPED,
    "graph_local_clustering": ORACLE_GRAPH_LOCAL_CLUSTERING,
    "frontier_tld_quota": ORACLE_FRONTIER_TLD_QUOTA,
    "text_moss_pairs": ORACLE_TEXT_MOSS_PAIRS,
    "frontier_rank_churn": ORACLE_FRONTIER_RANK_CHURN,
    "url_double_encoding": ORACLE_URL_DOUBLE_ENCODING,
    "corpus_freshness_value": ORACLE_CORPUS_FRESHNESS_VALUE,
    "graph_rich_club": ORACLE_GRAPH_RICH_CLUB,
    "media_metadata_scrub": ORACLE_MEDIA_METADATA_SCRUB,
    "corpus_license_gate": ORACLE_CORPUS_LICENSE_GATE,
    "events_power_sample_size": ORACLE_EVENTS_POWER_SAMPLE_SIZE,
    "events_markov_entropy": ORACLE_EVENTS_MARKOV_ENTROPY,
    "host_error_burn": ORACLE_HOST_ERROR_BURN,
    "embeddings_hubness_audit": ORACLE_EMBEDDINGS_HUBNESS_AUDIT,
    "events_trend_mk": ORACLE_EVENTS_TREND_MK,
    "text_invisible_chars": ORACLE_TEXT_INVISIBLE_CHARS,
    "frontier_schedule_smear": ORACLE_FRONTIER_SCHEDULE_SMEAR,
    "url_mobile_amp_collapse": ORACLE_URL_MOBILE_AMP_COLLAPSE,
    "corpus_span_corruption": ORACLE_CORPUS_SPAN_CORRUPTION,
    "text_fineweb_rules": ORACLE_TEXT_FINEWEB_RULES,
    "events_benford": ORACLE_EVENTS_BENFORD,
    "text_dialog_turns": ORACLE_TEXT_DIALOG_TURNS,
    "url_shortener_detect": ORACLE_URL_SHORTENER_DETECT,
    "frontier_aimd_window": ORACLE_FRONTIER_AIMD_WINDOW,
    "url_fragment_policy": ORACLE_URL_FRAGMENT_POLICY,
    "corpus_vocab_coverage": ORACLE_CORPUS_VOCAB_COVERAGE,
    "embeddings_distance_histogram": ORACLE_EMBEDDINGS_DISTANCE_HISTOGRAM,
    "frontier_wave_entropy": ORACLE_FRONTIER_WAVE_ENTROPY,
    "text_html_entities": ORACLE_TEXT_HTML_ENTITIES,
    "url_case_fold": ORACLE_URL_CASE_FOLD,
    "events_autocorr": ORACLE_EVENTS_AUTOCORR,
    "text_date_extract": ORACLE_TEXT_DATE_EXTRACT,
    "events_ltv_triangle": ORACLE_EVENTS_LTV_TRIANGLE,
    "events_simpson_audit": ORACLE_EVENTS_SIMPSON_AUDIT,
    "host_vertical_mix": ORACLE_HOST_VERTICAL_MIX,
    "text_math_detect": ORACLE_TEXT_MATH_DETECT,
    "events_entry_exit": ORACLE_EVENTS_ENTRY_EXIT,
    "url_redirect_loops": ORACLE_URL_REDIRECT_LOOPS,
    "embeddings_triplet_audit": ORACLE_EMBEDDINGS_TRIPLET_AUDIT,
    "frontier_quarantine": ORACLE_FRONTIER_QUARANTINE,
    "corpus_greedy_select": ORACLE_CORPUS_GREEDY_SELECT,
    "url_default_port": ORACLE_URL_DEFAULT_PORT,
    "corpus_dedup_mix_shift": ORACLE_CORPUS_DEDUP_MIX_SHIFT,
    "events_qini_curve": ORACLE_EVENTS_QINI_CURVE,
    "corpus_storage_tiering": ORACLE_CORPUS_STORAGE_TIERING,
    "events_seasonal_residual": ORACLE_EVENTS_SEASONAL_RESIDUAL,
    "url_param_sort": ORACLE_URL_PARAM_SORT,
    "graph_katz_bounded": ORACLE_GRAPH_KATZ_BOUNDED,
    "text_template_mine": ORACLE_TEXT_TEMPLATE_MINE,
    "host_uptime_sla": ORACLE_HOST_UPTIME_SLA,
}


def flagship(spark: SparkSession,
             sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship: the frontier install + round-assignment pipeline over
    orders-derived seeds, summarized per (round, network)."""
    frontier = engine.install_seeds(_orders_seeds(spark, sf_dir), host_budget=8)
    return (frontier.groupBy("round", "network")
            .agg(F.count("*").alias("n_hosts"),
                 F.min("installed_at").alias("first_installed"))
            .orderBy("round", "network"))
