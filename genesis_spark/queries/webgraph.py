"""Registry family: Web-graph analytics (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



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


def q_graph_bipartite_projection(spark, sf_dir):
    """BIPARTITE PROJECTION — hosts linked by shared items (shared
    outlink targets, shared media hashes, shared templates): the
    host-host similarity graph is the one-mode projection of the
    host x item bipartite graph, weight = co-occurrence count.
    This is how mirror rings and template farms surface without
    any content comparison.

    Fixture: host 'h'||(l_orderkey%40) carries item l_partkey%m
    where m = greatest(200, floor(rows/15)) SCALES WITH THE TABLE
    (~15 rows/item => expected item df ~= 40*(1-(39/40)^15) ~= 12.6
    hosts at EVERY sf). The round-3 fixed m=200 was vacuous at
    sf>=0.01: every item's df exceeded max_df and the output was
    empty — both engines agreed on nothing (VERDICT.md r3 finding
    #1); the scaled modulus keeps the row non-empty at all replay
    SFs and leaves the df cap real work (the Poisson-binomial tail
    above 20 still gets dropped). The modulus is a 1-row broadcast
    crossJoin (scalar-subquery shape), never a driver collect.

    Plan/scale: the projection explodes quadratically on HOT items
    (an item on k hosts emits k^2 pairs), so items with df >
    max_df=20 are dropped BEFORE the self-join — the same df-cap
    guard as the shingle join; cost is then bounded by
    sum(min(df,20)^2). Edges dedup once, one equi-join on item_id,
    one pair census groupBy."""
    max_df = 20
    li = _t(spark, sf_dir, "lineitem")
    mod = li.agg(F.greatest(
        F.lit(200).cast("long"),
        F.floor(F.count(F.lit(1)) / 15).cast("long")).alias("m"))
    e = (li.crossJoin(F.broadcast(mod))
         .select(F.concat(F.lit("h"), (F.col("l_orderkey") % 40)
                          .cast("string")).alias("host_key"),
                 (F.col("l_partkey") % F.col("m")).cast("long")
                 .alias("item_id"))
         .distinct())
    df_ok = (e.groupBy("item_id")
             .agg(F.count(F.lit(1)).cast("long").alias("df"))
             .filter(F.col("df") <= max_df))
    kept = e.join(F.broadcast(df_ok.select("item_id")), "item_id")
    deg = (kept.groupBy("host_key")
           .agg(F.count(F.lit(1)).cast("long").alias("deg")))
    a = kept.select("item_id", F.col("host_key").alias("ha"))
    b = kept.select("item_id", F.col("host_key").alias("hb"))
    pairs = (a.join(b, "item_id")
             .filter(F.col("ha") < F.col("hb"))
             .groupBy("ha", "hb")
             .agg(F.count(F.lit(1)).cast("long").alias("weight")))
    da = deg.select(F.col("host_key").alias("ha"),
                    F.col("deg").alias("deg_a"))
    db = deg.select(F.col("host_key").alias("hb"),
                    F.col("deg").alias("deg_b"))
    out = (pairs.join(F.broadcast(da), "ha").join(F.broadcast(db), "hb")
           .withColumn("overlap_milli",
                       F.expr("weight * 1000 DIV least(deg_a, deg_b)")
                       .cast("long"))
           .filter(F.col("weight") >= 3))
    return out.select("ha", "hb", "weight", "deg_a", "deg_b",
                      "overlap_milli")


ORACLE_GRAPH_BIPARTITE_PROJECTION = """
WITH m AS (
  SELECT greatest(CAST(200 AS BIGINT),
                  CAST(floor(count(*) / 15.0) AS BIGINT)) AS m
  FROM lineitem),
e AS (
  SELECT DISTINCT 'h' || (l_orderkey % 40) AS host_key,
         CAST(l_partkey % m.m AS BIGINT) AS item_id
  FROM lineitem CROSS JOIN m),
ok AS (
  SELECT item_id FROM e GROUP BY item_id HAVING count(*) <= 20),
kept AS (SELECT e.* FROM e JOIN ok USING (item_id)),
deg AS (
  SELECT host_key, CAST(count(*) AS BIGINT) AS deg
  FROM kept GROUP BY host_key),
pairs AS (
  SELECT a.host_key AS ha, b.host_key AS hb,
         CAST(count(*) AS BIGINT) AS weight
  FROM kept a JOIN kept b
    ON a.item_id = b.item_id AND a.host_key < b.host_key
  GROUP BY a.host_key, b.host_key)
SELECT p.ha, p.hb, p.weight, da.deg AS deg_a, db.deg AS deg_b,
       CAST(p.weight * 1000 // least(da.deg, db.deg) AS BIGINT)
         AS overlap_milli
FROM pairs p
JOIN deg da ON da.host_key = p.ha
JOIN deg db ON db.host_key = p.hb
WHERE p.weight >= 3
"""


def q_graph_betweenness2(spark, sf_dir):
    """2-hop shortest-path betweenness over the shared 50-host link
    graph (the bounded member of the centrality family beside
    PageRank/HITS/harmonic/k-core): for every ordered pair (s, t)
    with NO direct edge and at least one s->v->t path, the shortest
    s~t distance is exactly 2 and every middle v carries credit
    1/sigma_st (sigma = number of 2-paths = number of shortest
    paths). Credits are exact integers — 1000000 DIV sigma — so the
    per-host sum is order-free on both engines. The brokers this
    surfaces (hosts that mediate pairs no one links directly) are the
    crawl-scheduling analogue of Freeman betweenness without the
    unbounded BFS.

    Plan/scale: ONE self-equi-join of the distinct edge list
    (dst=src), a left-anti join against direct edges, one window
    count per (s,t), one groupBy(v) — wedge-shaped like
    graph_triangles, never all-pairs; fan-out bounded by d_in*d_out
    per middle host."""
    e = _host_edges50(spark, sf_dir)
    p = (e.alias("e1")
         .join(e.alias("e2"), F.col("e1.dst") == F.col("e2.src"))
         .select(F.col("e1.src").alias("s"), F.col("e1.dst").alias("v"),
                 F.col("e2.dst").alias("t"))
         .filter(F.col("s") != F.col("t")))
    np_ = p.join(e.select(F.col("src").alias("s"),
                          F.col("dst").alias("t")),
                 ["s", "t"], "left_anti")
    sig = np_.withColumn("sigma",
                         F.count("*").over(Window.partitionBy("s", "t")))
    return (sig.groupBy(F.col("v").alias("host"))
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(F.expr("1000000 DIV sigma")).alias("bc_u")))


ORACLE_GRAPH_BETWEENNESS2 = f"""
WITH e AS ({_HOST_E50_SQL}),
p AS (
  SELECT e1.src AS s, e1.dst AS v, e2.dst AS t
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  WHERE e1.src <> e2.dst),
np AS (
  SELECT p.s, p.v, p.t FROM p
  LEFT JOIN e ON p.s = e.src AND p.t = e.dst
  WHERE e.src IS NULL),
sig AS (
  SELECT *, count(*) OVER (PARTITION BY s, t) AS sigma FROM np)
SELECT v AS host, count(*) AS n_pairs,
       CAST(SUM(1000000 // sigma) AS BIGINT) AS bc_u
FROM sig GROUP BY v
"""


def q_graph_local_bridges(spark, sf_dir):
    """Local-bridge detection (Granovetter weak ties): an undirected
    host edge whose endpoints share ZERO common neighbors sits in no
    triangle — cutting it leaves no 2-hop detour, so it is the
    inter-community tie link-analysis wants surfaced (the edge-level
    complement of graph_triangles' per-node counts). Over a sparse
    499-node host graph: per canonical edge, the common-neighbor
    count and the local-bridge verdict, plus each edge's embeddedness
    denominator (min degree) for the tie-strength ratio.

    Plan/scale: ONE wedge equi-join of the undirected adjacency with
    itself per edge endpoint pair (never all-pairs; fan-out bounded
    by degree like graph_triangles), one left join-back for the
    zero-common-neighbor edges."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    e = (_t(spark, sf_dir, "orders").select(
        (k % 499).alias("x"), (c % 499).alias("y"))
        .filter(F.col("x") != F.col("y"))
        .select(F.least("x", "y").alias("a"),
                F.greatest("x", "y").alias("b"))
        .distinct())
    adj = (e.select(F.col("a").alias("u"), F.col("b").alias("v"))
           .unionByName(e.select(F.col("b").alias("u"),
                                 F.col("a").alias("v"))))
    deg = adj.groupBy("u").agg(F.count("*").cast("long").alias("d"))
    cn = (e.join(adj.select(F.col("u").alias("a"), F.col("v").alias("w")),
                 "a")
          .join(adj.select(F.col("u").alias("b"), F.col("v").alias("w")),
                ["b", "w"])
          .groupBy("a", "b").agg(F.count("*").cast("long").alias("cn")))
    return (e.join(cn, ["a", "b"], "left")
            .withColumn("cn", F.coalesce(F.col("cn"), F.lit(0)))
            .join(deg.select(F.col("u").alias("a"),
                             F.col("d").alias("da")), "a")
            .join(deg.select(F.col("u").alias("b"),
                             F.col("d").alias("db")), "b")
            .select("a", "b", "cn",
                    F.least("da", "db").alias("min_deg"),
                    (F.col("cn") == 0).cast("int")
                    .alias("is_local_bridge")))


ORACLE_GRAPH_LOCAL_BRIDGES = """
WITH e AS (
  SELECT DISTINCT least(o_orderkey % 499, o_custkey % 499) AS a,
                  greatest(o_orderkey % 499, o_custkey % 499) AS b
  FROM orders
  WHERE o_orderkey % 499 <> o_custkey % 499),
adj AS (
  SELECT a AS u, b AS v FROM e
  UNION ALL
  SELECT b, a FROM e),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY u),
cn AS (
  SELECT e.a, e.b, CAST(count(*) AS BIGINT) AS cn
  FROM e
  JOIN adj x ON x.u = e.a
  JOIN adj y ON y.u = e.b AND y.v = x.v
  GROUP BY e.a, e.b)
SELECT e.a, e.b, COALESCE(cn.cn, 0) AS cn,
       least(da.d, db.d) AS min_deg,
       CAST(CASE WHEN COALESCE(cn.cn, 0) = 0 THEN 1 ELSE 0 END AS INT)
         AS is_local_bridge
FROM e
LEFT JOIN cn ON e.a = cn.a AND e.b = cn.b
JOIN deg da ON da.u = e.a
JOIN deg db ON db.u = e.b
"""


def q_graph_triad_census(spark, sf_dir):
    """Directed triad-motif census (Milo et al. 2002) per mediator
    host: every 2-path a -> b -> c (a != c) through b either closes
    FORWARD (a -> c exists: a feed-forward loop — the reinforcing
    citation motif) or BACKWARD (c -> a exists: a 3-cycle — the
    link-scheme motif PageRank inflates on), or stays open. Per host
    b: wedge count, FFL count, cycle-closure count, and the FFL rate
    in exact ppm — the directed counterpart of graph_triangles /
    graph_local_bridges.

    Plan/scale: one wedge self-equi-join on the distinct 499-node
    edge list plus two semi-join probes of the closing edge (left
    joins on the edge key — never all-pairs; fan-out d_in * d_out
    per mediator, the graph_triangles bound)."""
    k, c = F.col("o_orderkey"), F.col("o_custkey")
    e = (_t(spark, sf_dir, "orders").select(
        (k % 499).alias("src"), (c % 499).alias("dst"))
        .filter(F.col("src") != F.col("dst")).distinct())
    wedges = (e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
              .join(e.select(F.col("src").alias("b"),
                             F.col("dst").alias("c")), "b")
              .filter(F.col("a") != F.col("c")))
    fwd = e.select(F.col("src").alias("a"), F.col("dst").alias("c"),
                   F.lit(1).alias("fwd"))
    bwd = e.select(F.col("dst").alias("a"), F.col("src").alias("c"),
                   F.lit(1).alias("bwd"))
    marked = (wedges.join(fwd, ["a", "c"], "left")
              .join(bwd, ["a", "c"], "left"))
    return (marked.groupBy(F.col("b").alias("host"))
            .agg(F.count("*").cast("long").alias("n_wedges"),
                 F.sum(F.coalesce("fwd", F.lit(0))).cast("long")
                 .alias("n_ffl"),
                 F.sum(F.coalesce("bwd", F.lit(0))).cast("long")
                 .alias("n_cycle"))
            .withColumn("ffl_ppm",
                        F.expr("n_ffl * 1000000 DIV n_wedges")))


ORACLE_GRAPH_TRIAD_CENSUS = """
WITH e AS (
  SELECT DISTINCT o_orderkey % 499 AS src, o_custkey % 499 AS dst
  FROM orders WHERE o_orderkey % 499 <> o_custkey % 499),
w AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  WHERE e1.src <> e2.dst),
m AS (
  SELECT w.b,
         CASE WHEN f.src IS NULL THEN 0 ELSE 1 END AS fwd,
         CASE WHEN g.src IS NULL THEN 0 ELSE 1 END AS bwd
  FROM w
  LEFT JOIN e f ON f.src = w.a AND f.dst = w.c
  LEFT JOIN e g ON g.src = w.c AND g.dst = w.a)
SELECT b AS host, CAST(count(*) AS BIGINT) AS n_wedges,
       CAST(sum(fwd) AS BIGINT) AS n_ffl,
       CAST(sum(bwd) AS BIGINT) AS n_cycle,
       CAST(sum(fwd) AS BIGINT) * 1000000 // count(*) AS ffl_ppm
FROM m GROUP BY b
"""


def q_graph_sssp_bounded(spark, sf_dir):
    """Weighted single-source shortest paths, 3 Bellman-Ford rounds
    (level-synchronous relaxation — the weighted counterpart of
    graph_harmonic's unweighted BFS): seeds = every 10th host of the
    shared 50-host graph at distance 0; edge latency = 10 +
    (src_n*7 + dst_n*13) % 90 ms (closed-form, both engines); each
    round relaxes every edge once (join + min-agg + full-outer merge
    with the previous frontier). Hosts unreached within 3 hops report
    -1 (a NULL would break order-insensitive value hashing). This is
    the latency-aware scheduling distance a fetch planner uses where
    hop counts lie.

    Plan/scale: 3x (edge join + min groupBy) on the distinct edge
    list — O(rounds) shuffles, never materializing paths."""
    e = _host_edges50(spark, sf_dir)
    num = lambda c: F.substring(c, 2, 10).cast("long")
    we = e.select("src", "dst",
                  (10 + (num(F.col("src")) * 7 + num(F.col("dst")) * 13)
                   % 90).alias("w"))
    hosts = (we.select(F.col("src").alias("host"))
             .unionByName(we.select(F.col("dst").alias("host")))
             .distinct())
    dist = hosts.select(
        "host",
        F.when(num(F.col("host")) % 10 == 0, F.lit(0))
        .otherwise(F.lit(None)).cast("long").alias("d"))
    for _ in range(3):
        relaxed = (dist.filter(F.col("d").isNotNull())
                   .join(we, dist.host == we.src)
                   .groupBy(F.col("dst").alias("host"))
                   .agg(F.min(F.col("d") + F.col("w")).alias("nd")))
        dist = (dist.join(relaxed, "host", "left")
                .select("host",
                        F.when(F.col("d").isNull(), F.col("nd"))
                        .when(F.col("nd").isNull(), F.col("d"))
                        .otherwise(F.least("d", "nd")).alias("d")))
    return dist.select("host",
                       F.coalesce(F.col("d"), F.lit(-1)).cast("long")
                       .alias("dist_ms"))


ORACLE_GRAPH_SSSP_BOUNDED = f"""
WITH e AS ({_HOST_E50_SQL}),
we AS (
  SELECT src, dst,
         10 + (CAST(substr(src, 2) AS BIGINT) * 7
               + CAST(substr(dst, 2) AS BIGINT) * 13) % 90 AS w
  FROM e),
hosts AS (SELECT src AS host FROM we UNION SELECT dst FROM we),
d0 AS (
  SELECT host,
         CASE WHEN CAST(substr(host, 2) AS BIGINT) % 10 = 0
              THEN CAST(0 AS BIGINT) END AS d
  FROM hosts),
r1 AS (
  SELECT d0.host,
         least(COALESCE(d0.d, 9223372036854775807),
               COALESCE(m.nd, 9223372036854775807)) AS dr
  FROM d0 LEFT JOIN (
    SELECT dst AS host, min(d0.d + we.w) AS nd
    FROM d0 JOIN we ON d0.host = we.src WHERE d0.d IS NOT NULL
    GROUP BY dst) m ON d0.host = m.host),
d1 AS (SELECT host, CASE WHEN dr < 9223372036854775807 THEN dr END AS d
       FROM r1),
r2 AS (
  SELECT d1.host,
         least(COALESCE(d1.d, 9223372036854775807),
               COALESCE(m.nd, 9223372036854775807)) AS dr
  FROM d1 LEFT JOIN (
    SELECT dst AS host, min(d1.d + we.w) AS nd
    FROM d1 JOIN we ON d1.host = we.src WHERE d1.d IS NOT NULL
    GROUP BY dst) m ON d1.host = m.host),
d2 AS (SELECT host, CASE WHEN dr < 9223372036854775807 THEN dr END AS d
       FROM r2),
r3 AS (
  SELECT d2.host,
         least(COALESCE(d2.d, 9223372036854775807),
               COALESCE(m.nd, 9223372036854775807)) AS dr
  FROM d2 LEFT JOIN (
    SELECT dst AS host, min(d2.d + we.w) AS nd
    FROM d2 JOIN we ON d2.host = we.src WHERE d2.d IS NOT NULL
    GROUP BY dst) m ON d2.host = m.host)
SELECT host,
       CAST(COALESCE(CASE WHEN dr < 9223372036854775807 THEN dr END, -1)
            AS BIGINT) AS dist_ms
FROM r3
"""


def q_graph_eccentricity(spark, sf_dir):
    """Bounded-3-hop out-eccentricity, radius and diameter membership
    over the shared 50-host link graph — the center/periphery map of
    the crawlable web (a crawl seeded at a CENTER host reaches
    everything it can in the fewest waves; periphery hosts are where
    BFS frontiers die): per host, ecc3 = max d(v, u) over hosts
    reached within 3 hops, the reach count, and flags for membership
    in the 3-bounded center (ecc = radius) and periphery
    (ecc = diameter). Truncation semantics identical to
    q_graph_harmonic — the exact quantity an ANF/HyperBall sketch
    approximates at web scale.

    Plan/scale: level-synchronous BFS as set algebra (2 joins +
    anti-joins on bounded 50x50 pair sets), one agg, one broadcast
    of the 2-row radius/diameter aggregate back onto hosts."""
    edges = _host_edges50(spark, sf_dir)
    d1 = edges.select("src", "dst")
    d2 = (d1.alias("a").join(edges.alias("b"),
                             F.col("a.dst") == F.col("b.src"))
          .select(F.col("a.src").alias("src"),
                  F.col("b.dst").alias("dst"))
          .filter(F.col("src") != F.col("dst")).distinct()
          .join(d1, ["src", "dst"], "left_anti"))
    d3 = (d2.alias("a").join(edges.alias("b"),
                             F.col("a.dst") == F.col("b.src"))
          .select(F.col("a.src").alias("src"),
                  F.col("b.dst").alias("dst"))
          .filter(F.col("src") != F.col("dst")).distinct()
          .join(d1, ["src", "dst"], "left_anti")
          .join(d2, ["src", "dst"], "left_anti"))
    pairs = (d1.withColumn("d", F.lit(1))
             .unionByName(d2.withColumn("d", F.lit(2)))
             .unionByName(d3.withColumn("d", F.lit(3))))
    ecc = (pairs.groupBy("src")
           .agg(F.max("d").cast("long").alias("ecc3"),
                F.count("*").cast("long").alias("n_reach3"))
           .withColumnRenamed("src", "host"))
    bounds = ecc.agg(F.min("ecc3").alias("radius3"),
                     F.max("ecc3").alias("diameter3"))
    return (ecc.crossJoin(F.broadcast(bounds))
            .select("host", "ecc3", "n_reach3",
                    (F.col("ecc3") == F.col("radius3")).cast("int")
                    .alias("is_center"),
                    (F.col("ecc3") == F.col("diameter3")).cast("int")
                    .alias("is_periphery")))


ORACLE_GRAPH_ECCENTRICITY = f"""
WITH edges AS ({_HOST_E50_SQL}),
d1 AS (SELECT src, dst FROM edges),
d2 AS (
  SELECT DISTINCT a.src, b.dst
  FROM d1 a JOIN edges b ON a.dst = b.src
  WHERE a.src <> b.dst
  EXCEPT SELECT src, dst FROM d1),
d3 AS (
  SELECT DISTINCT a.src, b.dst
  FROM d2 a JOIN edges b ON a.dst = b.src
  WHERE a.src <> b.dst
  EXCEPT SELECT src, dst FROM d1
  EXCEPT SELECT src, dst FROM d2),
pairs AS (
  SELECT src, dst, 1 AS d FROM d1
  UNION ALL SELECT src, dst, 2 FROM d2
  UNION ALL SELECT src, dst, 3 FROM d3),
ecc AS (
  SELECT src AS host, CAST(max(d) AS BIGINT) AS ecc3,
         CAST(count(*) AS BIGINT) AS n_reach3
  FROM pairs GROUP BY src),
bounds AS (
  SELECT min(ecc3) AS radius3, max(ecc3) AS diameter3 FROM ecc)
SELECT host, ecc3, n_reach3,
       CAST(CASE WHEN ecc3 = radius3 THEN 1 ELSE 0 END AS INT)
         AS is_center,
       CAST(CASE WHEN ecc3 = diameter3 THEN 1 ELSE 0 END AS INT)
         AS is_periphery
FROM ecc, bounds
"""


def q_graph_effective_diameter(spark, sf_dir):
    """Effective diameter (90th-percentile pairwise distance) of the
    shared 50-host graph, 3-hop-bounded — THE web-graph scale number
    (the 'small world' claims in the Broder bow-tie and Leskovec
    densification papers are exactly this metric, sketched by ANF /
    HyperBall at full scale): reachable pairs are counted per exact
    BFS level (the q_graph_eccentricity set algebra), and because
    distances only take values 1/2/3 here, the nearest-rank p90 is a
    pure integer cumulative-count comparison (d90 = first d with
    10·cum(d) >= 9·total) — no sorting, no floats; the mean distance
    ships in exact millis.

    Plan/scale: the BFS joins dominate; the roll-up is a single
    4-value aggregate — at 10^10 nodes the exact pair sets become
    HLL counters and THIS row is the ground truth they estimate."""
    edges = _host_edges50(spark, sf_dir)
    d1 = edges.select("src", "dst")
    d2 = (d1.alias("a").join(edges.alias("b"),
                             F.col("a.dst") == F.col("b.src"))
          .select(F.col("a.src").alias("src"),
                  F.col("b.dst").alias("dst"))
          .filter(F.col("src") != F.col("dst")).distinct()
          .join(d1, ["src", "dst"], "left_anti"))
    d3 = (d2.alias("a").join(edges.alias("b"),
                             F.col("a.dst") == F.col("b.src"))
          .select(F.col("a.src").alias("src"),
                  F.col("b.dst").alias("dst"))
          .filter(F.col("src") != F.col("dst")).distinct()
          .join(d1, ["src", "dst"], "left_anti")
          .join(d2, ["src", "dst"], "left_anti"))
    counts = (d1.select(F.lit(1).alias("d"))
              .unionByName(d2.select(F.lit(2).alias("d")))
              .unionByName(d3.select(F.lit(3).alias("d")))
              .groupBy().agg(
                  F.count("*").cast("long").alias("n_pairs"),
                  F.sum((F.col("d") == 1).cast("long")).cast("long")
                  .alias("n_d1"),
                  F.sum((F.col("d") == 2).cast("long")).cast("long")
                  .alias("n_d2"),
                  F.sum((F.col("d") == 3).cast("long")).cast("long")
                  .alias("n_d3"),
                  F.sum("d").cast("long").alias("dist_sum")))
    return counts.select(
        "n_pairs", "n_d1", "n_d2", "n_d3",
        F.when(F.col("n_d1") * 10 >= F.col("n_pairs") * 9, 1)
        .when((F.col("n_d1") + F.col("n_d2")) * 10
              >= F.col("n_pairs") * 9, 2)
        .otherwise(F.lit(3)).cast("int").alias("eff_diameter_p90"),
        F.expr("(dist_sum * 1000) div n_pairs")
        .alias("mean_dist_milli"))


ORACLE_GRAPH_EFFECTIVE_DIAMETER = f"""
WITH edges AS ({_HOST_E50_SQL}),
d1 AS (SELECT src, dst FROM edges),
d2 AS (
  SELECT DISTINCT a.src, b.dst
  FROM d1 a JOIN edges b ON a.dst = b.src
  WHERE a.src <> b.dst
  EXCEPT SELECT src, dst FROM d1),
d3 AS (
  SELECT DISTINCT a.src, b.dst
  FROM d2 a JOIN edges b ON a.dst = b.src
  WHERE a.src <> b.dst
  EXCEPT SELECT src, dst FROM d1
  EXCEPT SELECT src, dst FROM d2),
pairs AS (
  SELECT 1 AS d FROM d1
  UNION ALL SELECT 2 FROM d2
  UNION ALL SELECT 3 FROM d3),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_d1,
         CAST(sum(CASE WHEN d = 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_d2,
         CAST(sum(CASE WHEN d = 3 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_d3,
         CAST(sum(d) AS BIGINT) AS dist_sum
  FROM pairs)
SELECT n_pairs, n_d1, n_d2, n_d3,
       CAST(CASE WHEN n_d1 * 10 >= n_pairs * 9 THEN 1
                 WHEN (n_d1 + n_d2) * 10 >= n_pairs * 9 THEN 2
                 ELSE 3 END AS INT) AS eff_diameter_p90,
       (dist_sum * 1000) // n_pairs AS mean_dist_milli
FROM agg
"""
