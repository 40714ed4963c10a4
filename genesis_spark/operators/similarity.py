"""Embedding similarity search (ANN) over an array<float> column.

Two paths:
  * ``cosine_topk``  — brute-force: broadcast the (small) query set against
    the base table, JVM-side dot product via zip_with/aggregate, window
    top-k. The correctness baseline; O(|Q| * |base|) but embarrassingly
    parallel and shuffle-free up to the final per-query top-k.
  * ``lsh_topk``     — random-hyperplane LSH: deterministic md5-derived
    +-1 projections -> sign bits -> bucket equi-join, then exact cosine only
    within buckets. The 100TB path: candidate generation is an equi-join on
    the signature, so the base table shuffles once by bucket instead of
    cross-joining.

Scores are rounded before emission; ranking ties break on neighbor id so
results are engine-portable (DuckDB oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    # multiply in float64 — float32 products would diverge from any
    # double-precision oracle and flip near-tie rankings
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(base: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine neighbors per query vector (self-matches excluded).
    Returns (query_id, rank, neighbor_id). The query side is broadcast —
    keep it small; for query sets beyond broadcast size use ``lsh_topk``."""
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"))
    b = base.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("b_vec"))
    scored = (b.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("b_vec"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))


def hyperplane_signature_expr(vec: Column, n_planes: int = 8) -> Column:
    """Deterministic random-hyperplane sign signature: plane p's component i
    is +1 iff hex digit (md5(p|i) first nibble) >= 8. Engine-portable."""
    sig = F.lit(0)
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, i: v * F.when(
                    F.conv(F.substring(
                        F.md5(F.concat_ws("|", F.lit(str(p)), i.cast("string"))),
                        1, 1), 16, 10).cast("int") >= 8, 1.0).otherwise(-1.0)),
            F.lit(0.0), lambda acc, v: acc + v)
        sig = sig + F.when(proj > 0, 1 << p).otherwise(0)
    return sig


def lsh_topk(base: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8) -> DataFrame:
    """Approximate top-k: exact cosine only among vectors sharing the
    hyperplane signature bucket. Recall < 1.0 by design; bucket-join keeps
    the pair count ~|base| * avg_bucket_occupancy instead of |Q| * |base|."""
    sig = hyperplane_signature_expr(F.col(vec_col), n_planes)
    b = base.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("b_vec"), sig.alias("bucket"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("q_vec"), sig.alias("bucket"))
    scored = (b.join(q, "bucket")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("b_vec"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))
