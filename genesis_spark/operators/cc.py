"""Distributed connected components — near-dup pairs to dedup clusters.

The dedup family (MinHash-LSH / SimHash64 / n-gram Jaccard /
embedding-cosine) emits *pairs*; a training-data pipeline needs the
transitive closure of those pairs — "keep ONE document per near-duplicate
cluster" — which is connected components over the pair graph.

Algorithm: iterated min-label propagation ("hash-to-min" family,
Rastogi et al. 2013): every node starts labeled with itself; each round a
node adopts the minimum label among itself and its neighbors. Converges in
O(diameter) rounds — near-dup clusters are dense and shallow (diameter
2-4), so 5-10 rounds close ~all real corpora; a convergence check stops
early the round no label changes.

Scale shape: each round is ONE shuffle (groupBy node over the
edge-join-labels frame); labels and the symmetrized edge list are the only
state. Each round's labels are **localCheckpoint(eager=True)**-ed: a plain
persist is NOT enough for an iterative algorithm — the logical plan of
round K's labels references round K-1's plan twice (union + join), so the
plan tree doubles per round and driver-side analysis goes exponential
(~2^K nodes) even though execution would hit the cache. Checkpointing cuts
the lineage so every round plans against a flat scan. On a real cluster
prefer ``spark.sparkContext.setCheckpointDir`` + ``.checkpoint()`` for
executor-loss tolerance; localCheckpoint is the single-node equivalent.
At 10^10 edges the per-round cost is a single aggregate-shuffle of the
edge list — no all-pairs, no driver-side graph.

The convergence check costs one tiny ``count`` action per round (the
changed-label count), mirroring ``engine.run_rounds``'s accepted
one-action-per-round pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str = "src",
                         dst: str = "dst", max_iter: int = 15) -> DataFrame:
    """Components of the undirected graph given by (src, dst) pairs.
    Returns (node, component) with component = min node id reachable.
    Node ids must be a sortable atomic type (long / string)."""
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = (e.unionByName(e.select(F.col("b").alias("a"),
                                  F.col("a").alias("b")))
           .filter(F.col("a") != F.col("b"))
           .distinct()
           .persist())
    labels = (sym.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint(eager=True))
    try:
        for _ in range(max_iter):
            # neighbor labels: edge (a,b) contributes b's current label to a
            neigh = (sym.join(labels.withColumnRenamed("node", "b"), "b")
                     .select(F.col("a").alias("node"), "component"))
            new_labels = (labels.unionByName(neigh)
                          .groupBy("node")
                          .agg(F.min("component").alias("component"))
                          .localCheckpoint(eager=True))   # cut lineage/plan
            changed = (new_labels.join(labels.withColumnRenamed(
                           "component", "old"), "node")
                       .filter(F.col("component") != F.col("old"))
                       .count())
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        sym.unpersist()


def keep_one_per_cluster(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id",
                         pair_cols: tuple[str, str] = ("doc_a", "doc_b")
                         ) -> DataFrame:
    """Cluster-level dedup: collapse the near-dup pair graph to components
    and keep the min-id representative of each cluster; singleton docs (in
    no pair) survive unchanged. Returns ``docs`` columns + ``cluster_id``
    for the survivors — the standard keep-one-per-near-dup-cluster pass."""
    comp = connected_components(pairs, *pair_cols)
    with_comp = (docs.join(comp.withColumnRenamed("node", id_col),
                           id_col, "left")
                 .withColumn("cluster_id",
                             F.coalesce("component", F.col(id_col)))
                 .drop("component"))
    survivors = (with_comp.groupBy("cluster_id")
                 .agg(F.min(id_col).alias(id_col)))
    return survivors.join(with_comp, [id_col, "cluster_id"])


def kcore(sym: DataFrame, k: int, rounds: int) -> DataFrame:
    """Synchronous k-core peeling over a SYMMETRIZED distinct edge list
    ``(a, b)``: each round drops every node whose degree *restricted to
    the still-alive set* is below ``k`` (Seidman 1983) — the density
    lens that separates genuinely well-linked hosts from ones that only
    touch the link-farm periphery (triangles/modularity grade edges;
    coreness grades nodes).

    Synchronous semantics matter: round N's degrees are computed against
    round N-1's alive set, so a pendant chain peels one link per round —
    exactly what the unit test pins. ``rounds`` is a fixed unroll (full
    coreness iterates to fixpoint; bounded rounds keep the lineage
    linear and the oracle expressible as a finite CTE chain).

    Returns ``(node, core_degree)`` for survivors, degree restricted to
    the surviving set.

    Scale shape: the alive set is census-scale (|hosts| << |pages|), so
    both restriction joins broadcast; each round costs one partial-agg
    shuffle of the edge list — no all-pairs, no driver-side graph."""
    alive = sym.select(F.col("a").alias("node")).distinct()

    def _restrict(al: DataFrame) -> DataFrame:
        return (sym.join(F.broadcast(al.select(F.col("node").alias("a"))),
                         "a", "left_semi")
                .join(F.broadcast(al.select(F.col("node").alias("b"))),
                      "b", "left_semi"))

    for _ in range(rounds):
        alive = (_restrict(alive)
                 .groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
                 .filter(F.col("deg") >= k)
                 .select(F.col("a").alias("node")))
    return (_restrict(alive)
            .groupBy(F.col("a").alias("node"))
            .agg(F.count(F.lit(1)).alias("core_degree")))
