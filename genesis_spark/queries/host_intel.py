"""Registry family: Host intelligence (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



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


def q_host_fast_flux(spark, sf_dir):
    """FAST-FLUX detection — botnet-fronted hosts rotate through
    large IP pools on short TTLs (classic flux: dozens of IPs per
    day, low per-IP dwell), while honest hosts resolve to a stable
    handful; a crawler flags flux hosts because their content is
    adversarial and their politeness identity is meaningless. Per
    host over the observation window: distinct IPs, active days,
    the IPs-per-day rate in exact centi-units, the max NEW IPs
    introduced on any single day, and the flux verdict (rate >= 3
    IPs/day with >= 10 total IPs).

    Fixture: stable hosts pin 2-3 IPs; every 9th host rotates a
    key-derived IP per observation.

    Plan/scale: two census groupBys ((host, day) first-seen via
    min, then host) — the DNS log shuffles once by host."""
    k = F.col("o_orderkey")
    host_id = (k % 90).cast("long")
    day = (F.when(host_id % 9 == 0, F.expr("(o_orderkey DIV 90) % 5"))
           .otherwise(k % 28)).cast("long")
    ip = (F.when(host_id % 9 == 0,
                 F.concat(F.lit("10."), ((k * 7) % 250).cast("string"),
                          F.lit("."), ((k * 13) % 250).cast("string"),
                          F.lit(".1")))
          .otherwise(F.concat(F.lit("10.0."),
                              (host_id % 50).cast("string"), F.lit("."),
                              (k % 3).cast("string"))))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("h"), host_id.cast("string"))
                 .alias("host_key"), day.alias("day"), ip.alias("ip"))
         .distinct())
    first_seen = (d.groupBy("host_key", "ip")
                  .agg(F.min("day").alias("first_day")))
    new_per_day = (first_seen.groupBy("host_key", "first_day")
                   .agg(F.count(F.lit(1)).cast("long").alias("n_new")))
    days = (d.select("host_key", "day").distinct()
            .groupBy("host_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days")))
    per = (first_seen.groupBy("host_key")
           .agg(F.count(F.lit(1)).cast("long").alias("n_ips")))
    worst = (new_per_day.groupBy("host_key")
             .agg(F.max("n_new").cast("long").alias("max_new_per_day")))
    j = per.join(days, "host_key").join(worst, "host_key")
    rate_centi = F.expr("n_ips * 100 DIV n_days")
    return (j.withColumn("ips_per_day_centi", rate_centi.cast("long"))
            .withColumn("is_flux",
                        ((rate_centi >= 300) & (F.col("n_ips") >= 10))
                        .cast("int")))


ORACLE_HOST_FAST_FLUX = """
WITH d AS (
  SELECT DISTINCT 'h' || (o_orderkey % 90) AS host_key,
         CAST(CASE WHEN (o_orderkey % 90) % 9 = 0
                   THEN (o_orderkey // 90) % 5
                   ELSE o_orderkey % 28 END AS BIGINT) AS day,
         CASE WHEN (o_orderkey % 90) % 9 = 0
              THEN '10.' || ((o_orderkey * 7) % 250) || '.'
                   || ((o_orderkey * 13) % 250) || '.1'
              ELSE '10.0.' || ((o_orderkey % 90) % 50) || '.'
                   || (o_orderkey % 3) END AS ip
  FROM orders),
fs AS (
  SELECT host_key, ip, min(day) AS first_day
  FROM d GROUP BY host_key, ip),
npd AS (
  SELECT host_key, first_day, CAST(count(*) AS BIGINT) AS n_new
  FROM fs GROUP BY host_key, first_day),
days AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_days
  FROM (SELECT DISTINCT host_key, day FROM d) GROUP BY host_key),
per AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_ips
  FROM fs GROUP BY host_key),
worst AS (
  SELECT host_key, CAST(max(n_new) AS BIGINT) AS max_new_per_day
  FROM npd GROUP BY host_key)
SELECT p.host_key, p.n_ips, d2.n_days, w.max_new_per_day,
       CAST(p.n_ips * 100 // d2.n_days AS BIGINT) AS ips_per_day_centi,
       CAST(CASE WHEN p.n_ips * 100 // d2.n_days >= 300
                  AND p.n_ips >= 10 THEN 1 ELSE 0 END AS INT)
         AS is_flux
FROM per p JOIN days d2 USING (host_key) JOIN worst w USING (host_key)
"""


def q_host_geo_mix(spark, sf_dir):
    """Host GEO-mix census — per host, where its traffic actually
    comes from (deterministic fake GeoIP): request mass, distinct
    countries, the dominant country and its share, and the
    is_global verdict (>= 4 countries, dominant <= 50%). A crawl
    operator reads this to place fetch workers (latency), pick
    hreflang expectations, and spot geo-cloaking candidates (a
    'global' host serving one country is suspicious).

    Fixture: every 6th host is single-country; the rest draw from
    a 5-country rotation.

    Plan/scale: one (host, country) census, one groupBy(host)
    roll-up, a top-1 window per host — all host-keyed shuffles."""
    k = F.col("o_orderkey")
    h = (k % 45).cast("long")
    country = (F.when(h % 6 == 0, F.lit("us"))
               .otherwise(F.element_at(
                   F.array(F.lit("us"), F.lit("de"), F.lit("jp"),
                           F.lit("br"), F.lit("in")),
                   (k % 5 + 1).cast("int"))))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("h"), h.cast("string"))
                 .alias("host_key"), country.alias("country")))
    cc = (d.groupBy("host_key", "country")
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per = (cc.groupBy("host_key")
           .agg(F.sum("n").cast("long").alias("n_req"),
                F.count(F.lit(1)).cast("long").alias("n_countries")))
    w = (Window.partitionBy("host_key")
         .orderBy(F.desc("n"), F.asc("country")))
    top = (cc.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1)
           .select("host_key", F.col("country").alias("top_country"),
                   F.col("n").alias("top_n")))
    j = per.join(top, "host_key")
    return (j.withColumn("top_share_ppm",
                         F.expr("top_n * 1000000 DIV n_req")
                         .cast("long"))
            .withColumn("is_global",
                        ((F.col("n_countries") >= 4)
                         & (F.col("top_share_ppm") <= 500000))
                        .cast("int"))
            .select("host_key", "n_req", "n_countries", "top_country",
                    "top_share_ppm", "is_global"))


ORACLE_HOST_GEO_MIX = """
WITH d AS (
  SELECT 'h' || CAST(o_orderkey % 45 AS VARCHAR) AS host_key,
         CASE WHEN (o_orderkey % 45) % 6 = 0 THEN 'us'
              ELSE ['us', 'de', 'jp', 'br', 'in'][
                     CAST(o_orderkey % 5 + 1 AS INT)]
         END AS country
  FROM orders),
cc AS (
  SELECT host_key, country, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY host_key, country),
per AS (
  SELECT host_key, CAST(sum(n) AS BIGINT) AS n_req,
         CAST(count(*) AS BIGINT) AS n_countries
  FROM cc GROUP BY host_key),
top AS (
  SELECT host_key, country AS top_country, n AS top_n
  FROM (SELECT *, row_number() OVER (PARTITION BY host_key
                  ORDER BY n DESC, country ASC) AS rk FROM cc)
  WHERE rk = 1)
SELECT host_key, n_req, n_countries, top_country,
       CAST(top_n * 1000000 // n_req AS BIGINT) AS top_share_ppm,
       CAST(CASE WHEN n_countries >= 4
                  AND top_n * 1000000 // n_req <= 500000
                 THEN 1 ELSE 0 END AS INT) AS is_global
FROM per JOIN top USING (host_key)
"""


def q_host_yield_roi(spark, sf_dir):
    """Crawl YIELD-ROI per host — the budget economics the
    scheduler should read next to host_wilson_rank's quality
    ranking: a host where every fetch returns a page you already
    have (mirror farms, template sites) wastes budget regardless
    of quality. Over the dedup corpus bucketed by host: fetches,
    unique texts (exact md5), yield ppm, wasted-fetch ppm, and the
    budget verdict (keep / reduce at <= 80% yield / quarantine at
    <= 60%).

    Plan/scale: one (host, md5) distinct + one groupBy(host) —
    the per-host dedup-rate shuffle the dedup stage already pays,
    read back as scheduling signal."""
    c = _corpus(spark, sf_dir).filter(F.col("text").isNotNull())
    d = c.select(F.concat(F.lit("h"), (F.col("doc_id") % 40)
                          .cast("string")).alias("host_key"),
                 F.md5("text").alias("h"))
    fetches = (d.groupBy("host_key")
               .agg(F.count(F.lit(1)).cast("long").alias("n_fetches")))
    uniq = (d.distinct().groupBy("host_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_unique")))
    j = fetches.join(uniq, "host_key")
    y = F.expr("n_unique * 1000000 DIV n_fetches")
    return (j.withColumn("yield_ppm", y.cast("long"))
            .withColumn("wasted_ppm",
                        (F.lit(1000000) - F.col("yield_ppm"))
                        .cast("long"))
            .withColumn("budget_verdict",
                        F.when(F.col("yield_ppm") <= 600000,
                               F.lit("quarantine"))
                        .when(F.col("yield_ppm") <= 800000,
                              F.lit("reduce"))
                        .otherwise(F.lit("keep"))))


ORACLE_HOST_YIELD_ROI = f"""
WITH {_CORPUS_SQL},
d AS (
  SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) AS host_key,
         md5(text) AS h
  FROM corpus WHERE text IS NOT NULL),
fetches AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_fetches
  FROM d GROUP BY host_key),
uniq AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_unique
  FROM (SELECT DISTINCT host_key, h FROM d) GROUP BY host_key)
SELECT host_key, n_fetches, n_unique,
       CAST(n_unique * 1000000 // n_fetches AS BIGINT) AS yield_ppm,
       CAST(1000000 - n_unique * 1000000 // n_fetches AS BIGINT)
         AS wasted_ppm,
       CASE WHEN n_unique * 1000000 // n_fetches <= 600000
              THEN 'quarantine'
            WHEN n_unique * 1000000 // n_fetches <= 800000
              THEN 'reduce'
            ELSE 'keep' END AS budget_verdict
FROM fetches JOIN uniq USING (host_key)
"""


def q_host_parked_detect(spark, sf_dir):
    """PARKED-domain detection — registrar lander pages ('this
    domain is for sale') are crawl dead weight AND corpus poison
    (thousands of near-identical SEO stubs); the classic detector
    votes content lexicon + structural poverty. Per page: the
    for-sale lexicon hit, the outlink floor (<= 2), the thin-text
    floor (< 60 chars) — 2-of-3 votes; per host: page mass, parked
    share, and the verdict (>= 50% parked pages).

    Fixture: every 9th host serves a registrar lander on most of
    its pages; honest hosts serve linked articles.

    Plan/scale: page votes are row-local codegen; one
    groupBy(host) census."""
    k = F.col("o_orderkey")
    h = (k % 55).cast("long")
    parked_page = (h % 9 == 0) & (k % 10 != 0)
    body = (F.when(parked_page,
                   F.lit("This domain is for sale - make an offer"))
            .otherwise(F.concat(
                F.lit("article content "),
                F.expr("repeat('useful words here ', "
                       "CAST(o_orderkey % 5 + 4 AS INT))"))))
    outlinks = (F.when(parked_page, (k % 3).cast("long"))
                .otherwise((k % 12 + 3).cast("long")))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("h"), h.cast("string"))
                 .alias("host_key"), body.alias("body"),
                 outlinks.alias("n_outlinks")))
    lex = (F.lower("body").contains("domain is for sale")
           | F.lower("body").contains("buy this domain")
           | F.lower("body").contains("domain parking"))
    votes = (lex.cast("int") + (F.col("n_outlinks") <= 2).cast("int")
             + (F.length("body") < 60).cast("int"))
    pages = d.withColumn("is_parked_page", (votes >= 2).cast("int"))
    cens = (pages.groupBy("host_key")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
                 F.sum("is_parked_page").cast("long")
                 .alias("n_parked_pages")))
    share = F.expr("n_parked_pages * 1000000 DIV n_pages")
    return (cens.withColumn("parked_share_ppm", share.cast("long"))
            .withColumn("is_parked",
                        (F.col("parked_share_ppm") >= 500000)
                        .cast("int")))


ORACLE_HOST_PARKED_DETECT = """
WITH d AS (
  SELECT 'h' || CAST(o_orderkey % 55 AS VARCHAR) AS host_key,
         CASE WHEN (o_orderkey % 55) % 9 = 0 AND o_orderkey % 10 <> 0
              THEN 'This domain is for sale - make an offer'
              ELSE 'article content '
                   || repeat('useful words here ',
                             CAST(o_orderkey % 5 + 4 AS INT))
         END AS body,
         CASE WHEN (o_orderkey % 55) % 9 = 0 AND o_orderkey % 10 <> 0
              THEN CAST(o_orderkey % 3 AS BIGINT)
              ELSE CAST(o_orderkey % 12 + 3 AS BIGINT)
         END AS n_outlinks
  FROM orders),
pages AS (
  SELECT host_key,
         CASE WHEN (CASE WHEN contains(lower(body), 'domain is for sale')
                          OR contains(lower(body), 'buy this domain')
                          OR contains(lower(body), 'domain parking')
                         THEN 1 ELSE 0 END
                    + CASE WHEN n_outlinks <= 2 THEN 1 ELSE 0 END
                    + CASE WHEN len(body) < 60 THEN 1 ELSE 0 END) >= 2
              THEN 1 ELSE 0 END AS is_parked_page
  FROM d),
cens AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_pages,
         CAST(sum(is_parked_page) AS BIGINT) AS n_parked_pages
  FROM pages GROUP BY host_key)
SELECT host_key, n_pages, n_parked_pages,
       CAST(n_parked_pages * 1000000 // n_pages AS BIGINT)
         AS parked_share_ppm,
       CAST(CASE WHEN n_parked_pages * 1000000 // n_pages >= 500000
                 THEN 1 ELSE 0 END AS INT) AS is_parked
FROM cens
"""


def q_host_migration_detect(spark, sf_dir):
    """SITE-MIGRATION detection from redirect mass — when a host
    301s the bulk of its URLs to ONE other host, the site moved
    and the frontier should rewrite its entries wholesale (keeping
    crawl history under the new identity) instead of chasing
    redirects one URL at a time. Per source host: redirect mass,
    the dominant destination host and its share, and the
    migration verdict (>= 80% of redirects to one foreign host).

    Fixture: every 8th+3 host redirects ~90% of its URLs to a
    'moved-to' twin; other hosts scatter redirects.

    Plan/scale: one (src, dst) census + a top-1 window per src —
    host-keyed shuffles only."""
    k = F.col("o_orderkey")
    h = (k % 48).cast("long")
    scatter = (h + (k / F.lit(48)).cast("long") * 5) % 48
    dst = (F.when((h % 8 == 3) & (k % 10 != 0),
                  F.concat(F.lit("new"), h.cast("string")))
           .otherwise(F.concat(F.lit("h"), scatter.cast("string"))))
    d = (_t(spark, sf_dir, "orders")
         .select(F.concat(F.lit("h"), h.cast("string"))
                 .alias("src_host"), dst.alias("dst_host")))
    cc = (d.groupBy("src_host", "dst_host")
          .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per = (cc.groupBy("src_host")
           .agg(F.sum("n").cast("long").alias("n_redirects")))
    w = (Window.partitionBy("src_host")
         .orderBy(F.desc("n"), F.asc("dst_host")))
    top = (cc.withColumn("rk", F.row_number().over(w))
           .filter(F.col("rk") == 1)
           .select("src_host", F.col("dst_host").alias("top_dst"),
                   F.col("n").alias("top_n")))
    j = per.join(top, "src_host")
    share = F.expr("top_n * 1000000 DIV n_redirects")
    return (j.withColumn("top_share_ppm", share.cast("long"))
            .withColumn("migrated",
                        ((F.col("top_share_ppm") >= 800000)
                         & (F.col("top_dst") != F.col("src_host")))
                        .cast("int"))
            .select("src_host", "n_redirects", "top_dst",
                    "top_share_ppm", "migrated"))


ORACLE_HOST_MIGRATION_DETECT = """
WITH d AS (
  SELECT 'h' || CAST(o_orderkey % 48 AS VARCHAR) AS src_host,
         CASE WHEN (o_orderkey % 48) % 8 = 3 AND o_orderkey % 10 <> 0
              THEN 'new' || CAST(o_orderkey % 48 AS VARCHAR)
              ELSE 'h' || CAST((o_orderkey % 48
                                + (o_orderkey // 48) * 5) % 48
                               AS VARCHAR)
         END AS dst_host
  FROM orders),
cc AS (
  SELECT src_host, dst_host, CAST(count(*) AS BIGINT) AS n
  FROM d GROUP BY src_host, dst_host),
per AS (
  SELECT src_host, CAST(sum(n) AS BIGINT) AS n_redirects
  FROM cc GROUP BY src_host),
top AS (
  SELECT src_host, dst_host AS top_dst, n AS top_n
  FROM (SELECT *, row_number() OVER (PARTITION BY src_host
                  ORDER BY n DESC, dst_host ASC) AS rk FROM cc)
  WHERE rk = 1)
SELECT src_host, n_redirects, top_dst,
       CAST(top_n * 1000000 // n_redirects AS BIGINT)
         AS top_share_ppm,
       CAST(CASE WHEN top_n * 1000000 // n_redirects >= 800000
                  AND top_dst <> src_host
                 THEN 1 ELSE 0 END AS INT) AS migrated
FROM per JOIN top USING (src_host)
"""


def q_host_cofailure(spark, sf_dir):
    """CO-FAILURE correlation — hosts that go dark in the SAME
    hour windows share infrastructure even when DNS says nothing
    (the behavioral complement to host_ip_colocation's resolver
    signal: CDNs behind distinct IPs, shared upstreams, common
    DDoS targets). Per host pair with any overlap: each host's
    failure-window count, the co-failure count, window Jaccard in
    ppm, and the correlated flag (>= 50% Jaccard on >= 3 shared
    windows).

    Fixture: every 6th+2 host joins a shared-outage cluster (all
    fail in the same recurring windows); other hosts fail in
    key-scattered windows.

    Plan/scale: distinct (host, window), a self-equi-join ON
    WINDOW (bounded fan-out per window), pair census — never a
    host-pair cross join."""
    k = F.col("o_orderkey")
    h = (k % 36).cast("long")
    win = (F.when(h % 6 == 2, (k % 21) - (k % 21) % 7)
           .otherwise((k * 13) % 21)).cast("long")
    fails = (_t(spark, sf_dir, "orders")
             .filter((h % 6 == 2) | (k % 5 == 0))
             .select(F.concat(F.lit("h"), h.cast("string"))
                     .alias("host_key"), win.alias("win"))
             .distinct())
    a = fails.select(F.col("host_key").alias("host_a"), "win")
    b = fails.select(F.col("host_key").alias("host_b"), "win")
    co = (a.join(b, "win")
          .filter(F.col("host_a") < F.col("host_b"))
          .groupBy("host_a", "host_b")
          .agg(F.count(F.lit(1)).cast("long").alias("n_co")))
    per = (fails.groupBy("host_key")
           .agg(F.count(F.lit(1)).cast("long").alias("n_wins")))
    j = (co.join(per.withColumnRenamed("host_key", "host_a")
                 .withColumnRenamed("n_wins", "n_a"), "host_a")
         .join(per.withColumnRenamed("host_key", "host_b")
               .withColumnRenamed("n_wins", "n_b"), "host_b"))
    jac = F.expr("n_co * 1000000 DIV (n_a + n_b - n_co)")
    return (j.withColumn("jaccard_ppm", jac.cast("long"))
            .withColumn("correlated",
                        ((F.col("jaccard_ppm") >= 500000)
                         & (F.col("n_co") >= 3)).cast("int"))
            .select("host_a", "host_b", "n_a", "n_b", "n_co",
                    "jaccard_ppm", "correlated"))


ORACLE_HOST_COFAILURE = """
WITH raw AS (
  SELECT o_orderkey AS k, o_orderkey % 36 AS h FROM orders),
fails AS (
  SELECT DISTINCT 'h' || CAST(h AS VARCHAR) AS host_key,
         CAST(CASE WHEN h % 6 = 2 THEN (k % 21) - (k % 21) % 7
              ELSE (k * 13) % 21 END AS BIGINT) AS win
  FROM raw WHERE h % 6 = 2 OR k % 5 = 0),
co AS (
  SELECT a.host_key AS host_a, b.host_key AS host_b,
         CAST(count(*) AS BIGINT) AS n_co
  FROM fails a JOIN fails b USING (win)
  WHERE a.host_key < b.host_key
  GROUP BY a.host_key, b.host_key),
per AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_wins
  FROM fails GROUP BY host_key)
SELECT host_a, host_b, pa.n_wins AS n_a, pb.n_wins AS n_b, n_co,
       CAST(n_co * 1000000 // (pa.n_wins + pb.n_wins - n_co)
            AS BIGINT) AS jaccard_ppm,
       CAST(CASE WHEN n_co * 1000000
                      // (pa.n_wins + pb.n_wins - n_co) >= 500000
                  AND n_co >= 3
                 THEN 1 ELSE 0 END AS INT) AS correlated
FROM co
JOIN per pa ON pa.host_key = host_a
JOIN per pb ON pb.host_key = host_b
"""


def q_host_asn_lpm(spark, sf_dir):
    """Longest-prefix-match routing join — the networking join
    primitive (host IP -> announcing ASN) done the scale-right way:
    instead of a theta join on CIDR ranges, each IP is masked at
    every table prefix length (/8, /16, /24) and EQUI-joined against
    the prefix table, then one window keeps the longest match
    (classic LPM-as-equi-join). Hosts matching nothing report
    asn 0 / prefix_len 0. The deterministic prefix table and the
    Knuth-hash fake IPs live in both engines as closed-form
    arithmetic.

    Plan/scale: candidate fan-out is exactly 3 rows per host
    (number of prefix lengths, not table size); the prefix table
    broadcasts; never a range scan. At 10^9 hosts this is three
    broadcast-hash probes and one bounded window."""
    hid = F.col("o_orderkey") % 500
    hosts = (_t(spark, sf_dir, "orders")
             .select(hid.alias("hid")).distinct()
             .select(F.concat(F.lit("h"), F.col("hid").cast("string"))
                     .alias("host_key"),
                     ((F.col("hid") * 2654435761) % 4294967296)
                     .cast("long").alias("ip")))
    a8 = spark.range(0, 16).select(
        (F.col("id") * 16777216).alias("pfx"),
        F.lit(8).alias("plen"), (F.col("id") + 100).alias("asn"))
    a16 = spark.range(0, 64).select(
        ((F.col("id") % 16) * 16777216
         + ((F.col("id") * 7) % 256) * 65536).alias("pfx"),
        F.lit(16).alias("plen"), (F.col("id") + 1000).alias("asn"))
    a24 = spark.range(0, 128).select(
        ((F.col("id") % 16) * 16777216
         + ((F.col("id") * 11) % 256) * 65536
         + ((F.col("id") * 29) % 256) * 256).alias("pfx"),
        F.lit(24).alias("plen"), (F.col("id") + 10000).alias("asn"))
    prefixes = a8.unionByName(a16).unionByName(a24).distinct()
    cand = hosts.select(
        "host_key", "ip",
        F.explode(F.array(
            F.struct((F.col("ip") - F.col("ip") % 16777216).alias("pfx"),
                     F.lit(8).alias("plen")),
            F.struct((F.col("ip") - F.col("ip") % 65536).alias("pfx"),
                     F.lit(16).alias("plen")),
            F.struct((F.col("ip") - F.col("ip") % 256).alias("pfx"),
                     F.lit(24).alias("plen")))).alias("c"))
    matched = (cand.select("host_key", "ip", F.col("c.pfx").alias("pfx"),
                           F.col("c.plen").alias("plen"))
               .join(F.broadcast(prefixes), ["pfx", "plen"]))
    w = Window.partitionBy("host_key").orderBy(F.desc("plen"))
    best = (matched.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("host_key", F.col("plen").alias("prefix_len"),
                    F.col("asn").cast("long").alias("asn")))
    return (hosts.join(best, "host_key", "left")
            .select("host_key", "ip",
                    F.coalesce("prefix_len", F.lit(0)).cast("int")
                    .alias("prefix_len"),
                    F.coalesce("asn", F.lit(0)).cast("long").alias("asn")))


ORACLE_HOST_ASN_LPM = """
WITH hosts AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host_key,
         CAST((hid * 2654435761) % 4294967296 AS BIGINT) AS ip
  FROM (SELECT DISTINCT o_orderkey % 500 AS hid FROM orders)),
prefixes AS (
  SELECT DISTINCT * FROM (
    SELECT i * 16777216 AS pfx, 8 AS plen, i + 100 AS asn
    FROM range(0, 16) t(i)
    UNION ALL
    SELECT (i % 16) * 16777216 + ((i * 7) % 256) * 65536, 16, i + 1000
    FROM range(0, 64) t(i)
    UNION ALL
    SELECT (i % 16) * 16777216 + ((i * 11) % 256) * 65536
           + ((i * 29) % 256) * 256, 24, i + 10000
    FROM range(0, 128) t(i))),
cand AS (
  SELECT host_key, ip, ip - ip % 16777216 AS pfx, 8 AS plen FROM hosts
  UNION ALL
  SELECT host_key, ip, ip - ip % 65536, 16 FROM hosts
  UNION ALL
  SELECT host_key, ip, ip - ip % 256, 24 FROM hosts),
matched AS (
  SELECT c.host_key, c.ip, c.plen, p.asn,
         row_number() OVER (PARTITION BY c.host_key
                            ORDER BY c.plen DESC) AS rn
  FROM cand c JOIN prefixes p ON c.pfx = p.pfx AND c.plen = p.plen)
SELECT h.host_key, h.ip,
       CAST(COALESCE(m.plen, 0) AS INT) AS prefix_len,
       CAST(COALESCE(m.asn, 0) AS BIGINT) AS asn
FROM hosts h LEFT JOIN (SELECT * FROM matched WHERE rn = 1) m
  ON h.host_key = m.host_key
"""


def q_host_subnet_reputation(spark, sf_dir):
    """Infrastructure-mediated reputation propagation — the
    guilt-by-hosting signal host_ip_colocation stops short of: each
    host's base spam score (deterministic rubric: 0-100 from host
    arithmetic) is pooled at its /24 subnet (the SAME skewed product rule as
    host_ip_colocation — subnet (hid%8)*((hid//8)%8) — so farm
    subnets really absorb many hosts), and every
    host's adjusted score is the dyadic blend (own + subnet_mean)/2 —
    computed in EXACT integer space by carrying the pooled sum and
    count (adj_num = own*2*cnt... precisely: adj = own/2 +
    sum/(2*cnt), emitted as adj_ppm = (own*cnt + sum) * 500000 DIV
    cnt DIV 100 — pure integer ops). Hosts alone on their subnet are
    unchanged (blend degenerates to own).

    Plan/scale: one subnet groupBy (map-side combinable) + one
    broadcast join-back — two narrow shuffles at any host count."""
    hid = F.col("hid")
    hosts = (_t(spark, sf_dir, "orders")
             .select((F.col("o_orderkey") % 500).alias("hid")).distinct()
             .select(
                 F.concat(F.lit("h"), hid.cast("string")).alias("host_key"),
                 (((hid % 8) * ((hid / 8).cast("long") % 8)) * 256)
                 .cast("long").alias("subnet"),
                 ((hid * 37 + 13) % 101).cast("long").alias("own")))
    sub = hosts
    pool = (sub.groupBy("subnet")
            .agg(F.sum("own").cast("long").alias("pool_sum"),
                 F.count("*").cast("long").alias("pool_n")))
    return (sub.join(pool, "subnet")
            .select("host_key", "subnet", "own",
                    "pool_sum", "pool_n",
                    F.expr("(own * pool_n + pool_sum) * 500000 "
                           "DIV pool_n DIV 100").alias("adj_ppm"),
                    (F.col("pool_n") > 1).cast("int").alias("colocated")))


ORACLE_HOST_SUBNET_REPUTATION = """
WITH hosts AS (
  SELECT 'h' || CAST(hid AS VARCHAR) AS host_key,
         CAST(((hid % 8) * ((hid // 8) % 8)) * 256 AS BIGINT) AS subnet,
         CAST((hid * 37 + 13) % 101 AS BIGINT) AS own
  FROM (SELECT DISTINCT o_orderkey % 500 AS hid FROM orders)),
sub AS (SELECT * FROM hosts),
pool AS (
  SELECT subnet, CAST(sum(own) AS BIGINT) AS pool_sum,
         CAST(count(*) AS BIGINT) AS pool_n
  FROM sub GROUP BY subnet)
SELECT host_key, s.subnet, own, pool_sum, pool_n,
       (own * pool_n + pool_sum) * 500000 // pool_n // 100 AS adj_ppm,
       CAST(CASE WHEN pool_n > 1 THEN 1 ELSE 0 END AS INT) AS colocated
FROM sub s JOIN pool USING (subnet)
"""


def q_host_third_party_deps(spark, sf_dir):
    """Third-party dependency census — which hosts a page pulls
    subresources from (the supply-chain / tracking surface a crawler
    maps, and the prefetch list a renderer needs): per page,
    deterministic asset URLs (every page: one same-host image; every
    2nd: a cdn.h{k%5} script; every 3rd: a fonts.h9 stylesheet; every
    7th: an analytics.h3 beacon), classified on-host vs foreign by
    host comparison; per host: asset count, foreign count/ppm, and
    the DOMINANT foreign dependency (max count, ties by name) via one
    two-level agg.

    Plan/scale: explode is bounded (<= 4 assets/page), census
    shuffles carry counts; the dominant-dep pick is a max-struct agg,
    no window over assets."""
    k = F.col("o_orderkey")
    page_host = F.concat(F.lit("h"), (k % 60).cast("string"))
    assets = F.array_compact(F.array(
        F.concat(page_host, F.lit("/img"), k.cast("string"),
                 F.lit(".png")),
        F.when(k % 2 == 0,
               F.concat(F.lit("cdn.h"), (k % 5).cast("string"),
                        F.lit("/lib.js"))),
        F.when(k % 3 == 0, F.lit("fonts.h9/face.woff2")),
        F.when(k % 7 == 0, F.lit("analytics.h3/beacon.gif"))))
    rows = (_t(spark, sf_dir, "orders")
            .select(page_host.alias("host_key"),
                    F.explode(assets).alias("asset")))
    dep = F.substring_index("asset", "/", 1)
    cls = (rows.withColumn("dep_host", dep)
           .withColumn("foreign",
                       (F.col("dep_host") != F.col("host_key"))
                       .cast("long")))
    per_dep = (cls.filter(F.col("foreign") == 1)
               .groupBy("host_key", "dep_host")
               .agg(F.count("*").cast("long").alias("n")))
    top = (per_dep.groupBy("host_key")
           .agg(F.max(F.struct(F.col("n").alias("n"),
                               F.col("dep_host").alias("d"))).alias("t")))
    tot = (cls.groupBy("host_key")
           .agg(F.count("*").cast("long").alias("n_assets"),
                F.sum("foreign").cast("long").alias("n_foreign")))
    return (tot.join(top, "host_key", "left")
            .select("host_key", "n_assets", "n_foreign",
                    F.expr("n_foreign * 1000000 DIV n_assets")
                    .alias("foreign_ppm"),
                    F.coalesce(F.col("t.d"), F.lit("none"))
                    .alias("top_dep"),
                    F.coalesce(F.col("t.n"), F.lit(0)).cast("long")
                    .alias("top_dep_n")))


ORACLE_HOST_THIRD_PARTY_DEPS = """
WITH pages AS (
  SELECT o_orderkey AS k, 'h' || (o_orderkey % 60) AS host_key
  FROM orders),
assets AS (
  SELECT host_key, asset FROM (
    SELECT host_key,
           unnest([host_key || '/img' || k || '.png',
                   CASE WHEN k % 2 = 0
                        THEN 'cdn.h' || (k % 5) || '/lib.js' END,
                   CASE WHEN k % 3 = 0 THEN 'fonts.h9/face.woff2' END,
                   CASE WHEN k % 7 = 0
                        THEN 'analytics.h3/beacon.gif' END]) AS asset
    FROM pages)
  WHERE asset IS NOT NULL),
cls AS (
  SELECT host_key, string_split(asset, '/')[1] AS dep_host,
         CASE WHEN string_split(asset, '/')[1] <> host_key
              THEN 1 ELSE 0 END AS is_foreign
  FROM assets),
per_dep AS (
  SELECT host_key, dep_host, CAST(count(*) AS BIGINT) AS n
  FROM cls WHERE is_foreign = 1 GROUP BY host_key, dep_host),
top AS (
  SELECT host_key, MAX(struct_pack(n := n, d := dep_host)) AS t
  FROM per_dep GROUP BY host_key),
tot AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS n_assets,
         CAST(sum(is_foreign) AS BIGINT) AS n_foreign
  FROM cls GROUP BY host_key)
SELECT tot.host_key, n_assets, n_foreign,
       n_foreign * 1000000 // n_assets AS foreign_ppm,
       COALESCE(top.t.d, 'none') AS top_dep,
       CAST(COALESCE(top.t.n, 0) AS BIGINT) AS top_dep_n
FROM tot LEFT JOIN top ON tot.host_key = top.host_key
"""


def q_host_favicon_cluster(spark, sf_dir):
    """Favicon-hash infrastructure clustering (the Shodan ``http.
    favicon.hash`` pivot): hosts serving the SAME favicon are almost
    always the same operator — phishing kits, mirror farms, parked
    lots — so the favicon hash is a join key that groups hosts no
    URL/IP signal connects. Per host: its favicon hash, the size of
    the hash's host cluster, the representative (min) host, and the
    shared-infrastructure flag (cluster >= 3 hosts).

    Fixture: family f=k%30 hosts share hash 2*((f*2654435761) % 2^31)
    (even); every 7th host serves a unique odd hash — even/odd keeps
    the two populations collision-free by construction.

    Plan/scale: one hash-partitioned window (count+min) — a single
    shuffle on favicon_hash; at 10^10 hosts the hash space is
    uniform, no skew."""
    k = F.col("c_custkey")
    fam = (k % 30)
    shared_hash = (fam * F.lit(2654435761).cast("long")) % 2147483648 * 2
    rows = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        F.when(k % 7 == 0, k * 2 + 1).otherwise(shared_hash)
        .cast("long").alias("favicon_hash"))
    w = Window.partitionBy("favicon_hash")
    return (rows
            .withColumn("cluster_size",
                        F.count("*").over(w).cast("long"))
            .withColumn("rep_host", F.min("host").over(w))
            .withColumn("shared_infra",
                        (F.col("cluster_size") >= 3).cast("int")))


ORACLE_HOST_FAVICON_CLUSTER = """
WITH rows_ AS (
  SELECT 'h' || c_custkey AS host,
         CASE WHEN c_custkey % 7 = 0 THEN c_custkey * 2 + 1
              ELSE ((c_custkey % 30) * 2654435761) % 2147483648 * 2
         END AS favicon_hash
  FROM customer)
SELECT host, CAST(favicon_hash AS BIGINT) AS favicon_hash,
       CAST(count(*) OVER (PARTITION BY favicon_hash) AS BIGINT)
         AS cluster_size,
       min(host) OVER (PARTITION BY favicon_hash) AS rep_host,
       CAST(CASE WHEN count(*) OVER (PARTITION BY favicon_hash) >= 3
            THEN 1 ELSE 0 END AS INT) AS shared_infra
FROM rows_
"""


def q_host_cdn_detect(spark, sf_dir):
    """CDN-provider detection per host — crawl-ops routing signal
    (CDN-fronted hosts share rate-limit pools and edge caches:
    politeness should budget the PROVIDER, not each customer host,
    and fetch-latency SLAs differ per edge network): the host's
    CNAME target is normalized to its registrable suffix (last two
    labels) and EQUI-joined against a broadcast provider table —
    suffix normalization turns a would-be endswith scan join into a
    hash join — with a 'Server:' header signature (cloudflare) as
    the fallback channel.

    Fixture: k%5 cycles cloudfront/fastly/akamaiedge CNAMEs, an
    origin CNAME, and no CNAME; k%7=0 adds the cloudflare header.

    Plan/scale: map-side suffix extraction + broadcast-hash join
    against a constant-size provider dim — no shuffle on the host
    side."""
    k = F.col("c_custkey")
    cname = (F.when(k % 5 == 0, F.concat(F.lit("d"), k.cast("string"),
                                         F.lit(".cloudfront.net")))
             .when(k % 5 == 1, F.concat(F.lit("h"), k.cast("string"),
                                        F.lit(".fastly.net")))
             .when(k % 5 == 2, F.concat(F.lit("cust"), k.cast("string"),
                                        F.lit(".akamaiedge.net")))
             .when(k % 5 == 3, F.concat(F.lit("origin"),
                                        k.cast("string"),
                                        F.lit(".example-origin.net")))
             .otherwise(F.lit("")))
    server = (F.when(k % 7 == 0, "Server: cloudflare")
              .when(k % 7 == 1, "Server: nginx")
              .otherwise(F.lit("")))
    hosts = _t(spark, sf_dir, "customer").select(
        F.concat(F.lit("h"), k.cast("string")).alias("host"),
        cname.alias("cname"), server.alias("server_hdr"))
    providers = spark.createDataFrame(
        [("cloudfront.net", "cloudfront"),
         ("fastly.net", "fastly"),
         ("akamaiedge.net", "akamai")],
        ["suffix", "cname_provider"])
    suf = F.regexp_extract("cname", r"([a-z0-9-]+\.[a-z]+)$", 1)
    joined = (hosts.withColumn("suffix", suf)
              .join(F.broadcast(providers), "suffix", "left"))
    hdr_cf = F.col("server_hdr") == "Server: cloudflare"
    provider = F.coalesce(
        F.col("cname_provider"),
        F.when(hdr_cf, "cloudflare"), F.lit("none"))
    return joined.select(
        "host", "cname", provider.alias("provider"),
        F.col("cname_provider").isNotNull().cast("int")
        .alias("via_cname"),
        (F.col("cname_provider").isNull() & hdr_cf).cast("int")
        .alias("via_header"),
        (provider != "none").cast("int").alias("is_cdn"))


ORACLE_HOST_CDN_DETECT = """
WITH hosts AS (
  SELECT 'h' || c_custkey AS host,
         CASE WHEN c_custkey % 5 = 0
                THEN 'd' || c_custkey || '.cloudfront.net'
              WHEN c_custkey % 5 = 1
                THEN 'h' || c_custkey || '.fastly.net'
              WHEN c_custkey % 5 = 2
                THEN 'cust' || c_custkey || '.akamaiedge.net'
              WHEN c_custkey % 5 = 3
                THEN 'origin' || c_custkey || '.example-origin.net'
              ELSE '' END AS cname,
         CASE WHEN c_custkey % 7 = 0 THEN 'Server: cloudflare'
              WHEN c_custkey % 7 = 1 THEN 'Server: nginx'
              ELSE '' END AS server_hdr
  FROM customer),
providers AS (
  SELECT * FROM (VALUES ('cloudfront.net', 'cloudfront'),
                        ('fastly.net', 'fastly'),
                        ('akamaiedge.net', 'akamai'))
    AS t(suffix, cname_provider)),
joined AS (
  SELECT h.*, p.cname_provider
  FROM hosts h
  LEFT JOIN providers p
    ON p.suffix = regexp_extract(h.cname, '([a-z0-9-]+\\.[a-z]+)$', 1))
SELECT host, cname,
       COALESCE(cname_provider,
                CASE WHEN server_hdr = 'Server: cloudflare'
                     THEN 'cloudflare' END, 'none') AS provider,
       CAST(cname_provider IS NOT NULL AS INT) AS via_cname,
       CAST(cname_provider IS NULL
            AND server_hdr = 'Server: cloudflare' AS INT) AS via_header,
       CAST(COALESCE(cname_provider,
                CASE WHEN server_hdr = 'Server: cloudflare'
                     THEN 'cloudflare' END, 'none') <> 'none' AS INT)
         AS is_cdn
FROM joined
"""
