"""Embedding similarity search (ANN) over an array<float> column.

Three paths:
  * ``cosine_topk``  — brute-force: broadcast the (small) query set against
    the base table, JVM-side dot product via zip_with/aggregate, window
    top-k. The correctness baseline; O(|Q| * |base|) but embarrassingly
    parallel and shuffle-free up to the final per-query top-k.
  * ``lsh_topk``     — random-hyperplane LSH: deterministic md5-derived
    +-1 projections -> sign bits -> bucket equi-join, then exact cosine only
    within buckets. The 100TB path: candidate generation is an equi-join on
    the signature, so the base table shuffles once by bucket instead of
    cross-joining.
  * ``ivf_topk``    — coarse-quantizer inverted file (FAISS IVF-flat
    shape): one nearest-centroid cell per base vector, queries probe their
    n_probe nearest cells, ONE cell equi-join + exact rescoring. The
    bucketed-at-rest path: base can be written bucketed by cell so probe
    queries prune n_probe/n_centroids of the files.

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


def _lit_double_array(vals) -> Column:
    """Literal array<double> built with ONE parser call instead of one
    py4j round trip per element: the centroid/codebook/plane operators
    embed hundreds of these arrays, and per-element ``F.lit`` made plan
    CONSTRUCTION (driver Python, before any analysis or execution) the
    dominant cost — measured 17 s of a 25 s ivfpq run. ``repr`` round-
    trips doubles exactly and CAST('…' AS DOUBLE) constant-folds to the
    identical literal, so plans and results are unchanged."""
    inner = ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals)
    return F.expr(f"array({inner})")


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


def hyperplane_signs(table: int, n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic +-1 hyperplane components, computed ONCE on the driver:
    plane p's component i is +1 iff the first hex nibble of
    md5(f"{table}|{p}|{i}") >= 8. Engine-portable (an oracle can bake the
    same literals); the old per-row expression recomputed this md5 per
    (row x plane x dimension) for values that are constants of (plane, dim).
    """
    import hashlib

    return [[1.0 if int(hashlib.md5(f"{table}|{p}|{i}".encode())
                        .hexdigest()[0], 16) >= 8 else -1.0
             for i in range(dim)]
            for p in range(n_planes)]


def hyperplane_signature_expr(vec: Column, table: int, n_planes: int,
                              dim: int) -> Column:
    """Sign signature of ``vec`` against the precomputed plane literals:
    bit p = 1 iff dot(vec, plane_p) > 0. The planes are embedded as array
    literals, so the whole expression is codegen'd arithmetic — no hashing
    in the per-row path."""
    sig = F.lit(0)
    for p, signs in enumerate(hyperplane_signs(table, n_planes, dim)):
        plane = _lit_double_array(signs)
        proj = F.aggregate(
            F.zip_with(vec, plane, lambda v, s: v.cast("double") * s),
            F.lit(0.0), lambda acc, v: acc + v)
        sig = sig + F.when(proj > 0, 1 << p).otherwise(0)
    return sig


def random_projection(df: DataFrame, out_dim: int, dim: int,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      sign_table: int = 7, scale: float = 250.0) -> DataFrame:
    """Johnson-Lindenstrauss sign random projection (Achlioptas 2003):
    reduce ``dim``-d vectors to ``out_dim`` dims with a deterministic
    +-1 matrix (rows = ``hyperplane_signs(sign_table, out_dim, dim)``),
    the cheap dimensionality-reduction pass upstream of clustering /
    IVF training at 10^10 vectors. The matrix folds into the plan as
    array literals, so the whole pass is zero-shuffle codegen — no
    per-row hashing, no Python.

    Codes are emitted as ``floor(scale * proj)`` ints (the engine-
    portable form the quantize/pq rows also use): with the default
    scale 250 = 1000 / sqrt(16), the 1/sqrt(out_dim) JL normalization
    is folded in exactly for out_dim 16 (4 is a power of two, so the
    division is exact in binary and cross-engine bit-identical)."""
    codes = []
    for signs in hyperplane_signs(sign_table, out_dim, dim):
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), _lit_double_array(signs),
                       lambda v, s: v.cast("double") * s),
            F.lit(0.0), lambda acc, x: acc + x)
        codes.append(F.floor(proj * F.lit(float(scale))).cast("int"))
    return df.select(F.col(id_col), F.array(*codes).alias("rp_codes"))


def auto_n_planes(n_rows: int, target_bucket_rows: int = 1024) -> int:
    """Sizing rule for the hyperplane count, as code instead of prose:
    with ``p`` planes a table has 2**p buckets, so expected occupancy is
    n_rows / 2**p — pick the smallest p (floor 8) that brings occupancy
    under ``target_bucket_rows``. At 10^9 rows / 1024-row buckets that is
    max(8, ceil(log2(10^9/1024))) = 20 planes; without this the default 8
    planes would make each bucket join ~n/256 x n/256."""
    import math

    if n_rows <= 0:
        return 8
    return max(8, math.ceil(math.log2(max(1.0, n_rows / target_bucket_rows))))


def lsh_topk(base: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, n_tables: int = 4,
             dim: int | None = None) -> DataFrame:
    """Approximate top-k: exact cosine only among vectors sharing a
    hyperplane signature bucket in ANY of ``n_tables`` independent tables
    (standard multi-table LSH — one table's recall is limited by its bucket
    occupancy; unioning tables multiplies recall at linear candidate cost).
    Candidate generation is one 2-column equi-join per table, so the base
    shuffles by bucket instead of cross-joining |Q| x |base|. Recall < 1 by
    design; measured vs ``cosine_topk`` in tests/test_operators.py.

    ``dim`` is required: the plane literals are dim-length arrays and a
    wrong dim silently zero-pads every projection (all signatures collapse
    to one bucket = accidental brute force), so rows are runtime-checked
    against it. Size ``n_planes`` with ``auto_n_planes(n_rows)``."""
    if dim is None:
        raise TypeError(
            "lsh_topk requires dim= (the embedding length); inferring it "
            "with a driver-side head() hides a job in plan construction")
    # the check lives INSIDE the vector expression (a side column would be
    # pruned by Catalyst and never run): wrong-length rows raise, they do
    # not silently null-pad into bucket 0
    def _checked(col: Column) -> Column:
        return F.when(F.size(col) == dim, col).otherwise(F.raise_error(
            F.concat(F.lit(f"lsh_topk: vector length != dim={dim}, got "),
                     F.size(col).cast("string"))))

    b_all = base.select(F.col(id_col).alias("neighbor_id"),
                        _checked(F.col(vec_col)).alias("b_vec"))
    q_all = queries.select(F.col(id_col).alias("query_id"),
                           _checked(F.col(vec_col)).alias("q_vec"))
    cand = None
    for t in range(n_tables):
        sig_b = hyperplane_signature_expr(F.col("b_vec"), t, n_planes, dim)
        sig_q = hyperplane_signature_expr(F.col("q_vec"), t, n_planes, dim)
        p = (b_all.withColumn("bucket", sig_b)
             .join(q_all.withColumn("bucket", sig_q), "bucket")
             .filter(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "neighbor_id"))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    scored = (cand.join(b_all, "neighbor_id").join(q_all, "query_id")
              .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("b_vec"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.85,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             n_planes: int = 8, n_tables: int = 4,
                             dim: int | None = None) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS (the dedup-family variant of
    ``lsh_topk``): emit (id_a, id_b, cos) for every pair sharing a
    hyperplane-LSH bucket in ANY table whose exact cosine >= threshold,
    with id_a < id_b. Candidate generation is a per-table SELF equi-join
    on the signature — the table shuffles by bucket, never cross-joins —
    so at 10^9 rows the cost is sum of bucket^2, controlled by
    ``auto_n_planes`` exactly like ``lsh_topk``. Recall < 1 by design
    (a near-dup pair split across all tables' buckets is missed);
    per-table miss probability for cosine c is 1-(1-(1-theta/pi)^p)^T.

    The signature columns are pure row-local codegen (no aggregate
    subplan), so both join sides recompute them instead of persisting —
    nothing leaks cached blocks (ADVICE r2: dedup.py:179)."""
    if dim is None:
        raise TypeError("embedding_near_dup_pairs requires dim= "
                        "(see lsh_topk)")

    def _checked(col: Column) -> Column:
        return F.when(F.size(col) == dim, col).otherwise(F.raise_error(
            F.concat(F.lit(f"near_dup: vector length != dim={dim}, got "),
                     F.size(col).cast("string"))))

    sig = df.select(
        F.col(id_col).alias("_id"), _checked(F.col(vec_col)).alias("_v"),
        *[hyperplane_signature_expr(_checked(F.col(vec_col)), t, n_planes,
                                    dim).alias(f"_b{t}")
          for t in range(n_tables)])
    cand = None
    for t in range(n_tables):
        a = sig.select(F.col("_id").alias("id_a"), F.col(f"_b{t}").alias("_bk"))
        b = sig.select(F.col("_id").alias("id_b"), F.col(f"_b{t}").alias("_bk"))
        p = (a.join(b, "_bk").filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.distinct()
    va = sig.select(F.col("_id").alias("id_a"), F.col("_v").alias("_va"))
    vb = sig.select(F.col("_id").alias("id_b"), F.col("_v").alias("_vb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cos", cosine_expr(F.col("_va"), F.col("_vb")))
            .filter(F.col("cos") >= threshold)
            .select("id_a", "id_b", "cos"))


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path
# ---------------------------------------------------------------------------

def seeded_centroids(n_centroids: int, dim: int) -> list[list[float]]:
    """Deterministic pseudo-random coarse-quantizer centroids, computed
    ONCE on the driver: component i of centroid c is in [-1, 1), derived
    from md5(f"ivf|{c}|{i}") (same engine-portable recipe as
    ``hyperplane_signs`` — an oracle can bake identical literals). These
    stand in for KMeans-trained centroids in tests/oracles; production
    passes trained centroids (e.g. pyspark.ml KMeans clusterCenters_) to
    ``ivf_topk`` for better cell balance — the operator shape is the same.
    """
    import hashlib

    return [[int(hashlib.md5(f"ivf|{c}|{i}".encode()).hexdigest()[:8], 16)
             / float(1 << 31) - 1.0
             for i in range(dim)]
            for c in range(n_centroids)]


def _centroid_scores(vec: Column, centroids: list[list[float]]) -> Column:
    """array<double> of cosine-proportional scores dot(vec, c)/|c| — |vec|
    is constant across centroids so argmax matches cosine argmax. Norms are
    driver-side literals; the whole thing is codegen'd arithmetic."""
    import math

    scores = []
    for c in centroids:
        norm = math.sqrt(sum(x * x for x in c)) or 1.0
        scores.append(_dot(vec, _lit_double_array(c)) / F.lit(norm))
    return F.array(*scores)


def assign_cell_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid cell id (ties -> lowest cell id, matching the
    oracle's ORDER BY s DESC, cell ASC): array_position returns the FIRST
    occurrence of the max."""
    scores = _centroid_scores(vec, centroids)
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def probe_cells_expr(vec: Column, centroids: list[list[float]],
                     n_probe: int) -> Column:
    """The ``n_probe`` nearest cell ids for a query vector, as an
    array<int>: sort (score desc, cell asc) via a struct array (structs
    sort lexicographically, so negate the score)."""
    scores = _centroid_scores(vec, centroids)
    ranked = F.array_sort(F.transform(
        F.sequence(F.lit(0), F.lit(len(centroids) - 1)),
        lambda i: F.struct((-F.element_at(scores, i + 1)).alias("negs"),
                           i.cast("int").alias("cell"))))
    return F.transform(F.slice(ranked, 1, n_probe), lambda s: s["cell"])


def ivf_topk(base: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: list[list[float]] | None = None,
             n_centroids: int = 8, n_probe: int = 3,
             dim: int | None = None) -> DataFrame:
    """IVF approximate top-k (the FAISS IVF-flat shape, re-expressed as
    DataFrame ops): every base vector is assigned to its nearest coarse
    centroid's cell ONCE; a query scans only its ``n_probe`` nearest
    cells. Candidate generation is a single equi-join on cell id — the
    base shuffles once by cell (or is bucketed by cell at rest) and a
    query touches n_probe/n_centroids of the data, vs LSH's per-table
    bucket joins. Exact cosine rescoring + top-k within candidates only.
    Recall < 1 by design (a true neighbor outside the probed cells is
    missed); measured vs ``cosine_topk`` in tests/test_operators.py.

    At 10^9 rows: size ``n_centroids`` ~ sqrt(n) (IVF rule of thumb) and
    train real centroids with KMeans on a sample; pass them in — the
    default ``seeded_centroids`` is the deterministic stand-in that keeps
    the operator oracle-checkable."""
    if dim is None:
        raise TypeError("ivf_topk requires dim= (see lsh_topk)")
    cents = centroids if centroids is not None \
        else seeded_centroids(n_centroids, dim)

    def _checked(col: Column) -> Column:
        return F.when(F.size(col) == dim, col).otherwise(F.raise_error(
            F.concat(F.lit(f"ivf_topk: vector length != dim={dim}, got "),
                     F.size(col).cast("string"))))

    b = base.select(F.col(id_col).alias("neighbor_id"),
                    _checked(F.col(vec_col)).alias("b_vec"))
    b = b.withColumn("cell", assign_cell_expr(F.col("b_vec"), cents))
    q = queries.select(F.col(id_col).alias("query_id"),
                       _checked(F.col(vec_col)).alias("q_vec"))
    q = (q.withColumn("cell", F.explode(
            probe_cells_expr(F.col("q_vec"), cents, n_probe))))
    # each base row lives in exactly ONE cell, so (query, neighbor) pairs
    # are already unique — no distinct needed after the cell equi-join
    scored = (b.join(q, "cell")
              .filter(F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", cosine_expr(F.col("q_vec"), F.col("b_vec"))))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id"))


def quantize_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension (min, max) over the corpus — the scalar-quantizer
    training pass. ``posexplode`` then groupBy(pos) with min/max plans as
    a map-side-combinable partial agg: each task reduces its rows to
    ``dim`` partials before the shuffle, so the exchange carries
    O(dim x n_partitions) rows regardless of corpus size."""
    return (df.select(F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.min(F.col("x").cast("double")).alias("mn"),
                 F.max(F.col("x").cast("double")).alias("mx")))


def quantize_int8(df: DataFrame, vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Int8 scalar quantization of an embedding column (the SQ8 storage
    path every large ANN index uses: 4x smaller vectors, distance on
    codes). Per-dim code = floor((x - mn) * 255 / (mx - mn)) - 128
    (floor, not round — identical in IEEE double on every engine; a
    constant dimension maps to code -128).

    The (min, max) stats job reduces to ``dim`` rows which are collected
    and folded into the quantization expression as array literals (the
    same driver-side-literal pattern as the LSH hyperplanes) — the
    quantize pass itself is then a pure zero-shuffle map over the scan.

    Returns ``(id_col, n_dims, code_sum, code_min, code_max)`` — integer
    summaries per vector, exact under any row or summation order."""
    stats = sorted(quantize_stats(df, vec_col).collect(),
                   key=lambda r: r["pos"])
    mins = F.array(*[F.lit(r["mn"]) for r in stats])
    spans = F.array(*[F.lit(r["mx"] - r["mn"]) for r in stats])
    codes = F.zip_with(
        F.zip_with(F.col(vec_col), mins,
                   lambda x, mn: x.cast("double") - mn),
        spans,
        lambda d, s: F.when(s > 0.0, F.floor(d * 255.0 / s) - 128)
                      .otherwise(F.lit(-128)).cast("int"))
    c = codes.alias("codes")
    return df.select(
        F.col(id_col),
        F.size(F.col(vec_col)).alias("n_dims"),
        F.aggregate(c, F.lit(0).cast("bigint"),
                    lambda acc, v: acc + v).alias("code_sum"),
        F.array_min(c).alias("code_min"),
        F.array_max(c).alias("code_max"))


# ---------------------------------------------------------------------------
# product quantization (FAISS PQ / IVFADC shape)
# ---------------------------------------------------------------------------

def pq_centroids(m: int, k: int, sub_dim: int) -> list[list[list[float]]]:
    """Deterministic per-subspace PQ codebooks: ``m`` subspaces x ``k``
    centroids x ``sub_dim`` components, each in [-1, 1) from
    md5(f"pq|{j}|{c}|{i}") — the same engine-portable stand-in recipe as
    ``seeded_centroids``; production passes per-subspace KMeans codebooks
    instead, the operator shape is unchanged."""
    import hashlib

    return [[[int(hashlib.md5(f"pq|{j}|{c}|{i}".encode()).hexdigest()[:8],
                  16) / float(1 << 31) - 1.0
              for i in range(sub_dim)]
             for c in range(k)]
            for j in range(m)]


def _sql_double_array(vals) -> str:
    return ("array(" +
            ", ".join(f"CAST('{float(v)!r}' AS DOUBLE)" for v in vals) +
            ")")


def _dot_sql(vec_sql: str, vals) -> str:
    """SQL text of _dot(vec, literal-array): identical zip_with/aggregate
    fold (same order, same casts) built with zero per-element py4j calls."""
    return (f"aggregate(zip_with({vec_sql}, {_sql_double_array(vals)}, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")


def _sub_dists_sql(vec_sql: str, codebook, offset: int, sub_dim: int) -> str:
    """SQL text of the per-subspace distance array |c|^2 - 2*dot over
    slice(vec, offset+1, sub_dim) (the |x|^2 term is constant across
    centroids, so the argmin/ADC ranking is unchanged)."""
    terms = []
    for c in codebook:
        cnorm2 = float(sum(x * x for x in c))
        dot = _dot_sql(f"slice({vec_sql}, {offset + 1}, {sub_dim})", c)
        terms.append(f"CAST('{cnorm2!r}' AS DOUBLE) "
                     f"- CAST(2.0 AS DOUBLE) * {dot}")
    return "array(" + ", ".join(terms) + ")"


def pq_codes_sql(vec_sql: str, cents, sub_dim: int) -> str:
    """SQL text of the per-subspace PQ codes over a named vector column
    (argmin of squared-L2 vs each subspace codebook, ties -> lowest code;
    the single implementation of the code math — the per-Column form it
    replaced was deleted so the two cannot drift): the m x k
    codebook expands to hundreds of literal arrays, and building it
    Column-by-Column paid one py4j round trip per node — plan
    CONSTRUCTION dominated the whole query (see _lit_double_array). One
    parsed string removes that; the analyzed expression (and so results
    and codegen) is identical to the Column form."""
    codes = []
    for j, codebook in enumerate(cents):
        d = _sub_dists_sql(vec_sql, codebook, j * sub_dim, sub_dim)
        codes.append(f"CAST(array_position({d}, array_min({d})) - 1 AS INT)")
    return "array(" + ", ".join(codes) + ")"


def pq_luts_sql(vec_sql: str, cents, sub_dim: int) -> str:
    """SQL text of the per-query ADC lookup tables (array of m per-
    subspace distance arrays) — same py4j-chatter rationale as
    ``pq_codes_sql``."""
    return ("array(" + ", ".join(
        _sub_dists_sql(vec_sql, codebook, j * sub_dim, sub_dim)
        for j, codebook in enumerate(cents)) + ")")


def pq_encode(df: DataFrame, vec_col: str = "embedding",
              id_col: str = "vec_id", m: int = 8, k: int = 16,
              dim: int = 64) -> DataFrame:
    """Product-quantize an embedding column: split each vector into ``m``
    subvectors, code each against its subspace codebook, pack the codes
    into one bigint (base-``k`` digits). 64 float32 dims become m=8 4-bit
    codes — the 16x-compressed at-rest representation a 10^10-vector ANN
    index stores and scans instead of raw vectors.

    Zero-shuffle pure map over the scan (codebooks are literals). Returns
    ``(id_col, codes array<int>, pq_code bigint)``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    cents = pq_centroids(m, k, dim // m)
    codes = F.expr(pq_codes_sql(f"`{vec_col}`", cents, dim // m))
    packed = F.aggregate(
        F.zip_with(codes,
                   F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                               lambda j: j),
                   lambda c, j: c.cast("bigint")
                   * F.pow(F.lit(float(k)), j.cast("double"))
                   .cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, v: acc + v)
    return df.select(F.col(id_col), codes.alias("codes"),
                     packed.alias("pq_code"))


def pq_adc_topk(base: DataFrame, queries: DataFrame, k_top: int = 5,
                m: int = 8, k: int = 16, dim: int = 64,
                vec_col: str = "embedding",
                id_col: str = "vec_id") -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search: the base side is only
    its PQ codes; each query computes an m x k lookup table of exact
    subvector-to-centroid distances, and a candidate's approximate
    distance is the sum of m table lookups — the FAISS IVFADC inner loop.

    Plan: encode base (pure map), broadcast the (small) query side with
    its LUTs, one join, aggregate-of-lookups, window top-``k_top`` per
    query (ties -> lowest neighbor id). The base's raw vectors are never
    read after encoding — at 10^10 rows the scan touches 4-bit codes, not
    float32 vectors."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    cents = pq_centroids(m, k, sub_dim)
    # codes only — the packed pq_code is a storage concern; computing it
    # here would pay the base-k fold per base row just to drop it
    coded = base.select(
        F.col(id_col).alias("neighbor_id"),
        F.expr(pq_codes_sql(f"`{vec_col}`", cents, sub_dim)).alias("codes"))
    luts = F.expr(pq_luts_sql(f"`{vec_col}`", cents, sub_dim))
    q = queries.select(F.col(id_col).alias("query_id"),
                       luts.alias("luts"))
    adc = F.aggregate(
        F.zip_with(F.col("codes"),
                   F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                               lambda j: j),
                   lambda c, j: F.element_at(
                       F.element_at("luts", j.cast("int") + 1), c + 1)),
        F.lit(0.0), lambda acc, v: acc + v)
    # rank on the 6dp-rounded score with an id tie-break (module
    # convention): the m-term double sum is fold-order sensitive, so raw
    # last-bit differences must not decide a ranking
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_r").asc(), F.col("neighbor_id").asc())
    return (F.broadcast(q).crossJoin(coded)
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("adc_r", F.round(adc, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_top)
            .select("query_id", "rank", "neighbor_id"))


def semantic_dedup(df: DataFrame, threshold: float = 0.85,
                   centroids: list[list[float]] | None = None,
                   n_centroids: int = 8, dim: int | None = None,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   round_dp: int = 6) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate removal via
    coarse clustering — assign every vector to its nearest centroid cell,
    compare pairs WITHIN a cell only, and drop any vector that has a
    same-cell partner with cosine >= threshold and a smaller id (greedy
    min-id representative, the paper's keep-one-per-group policy applied
    deterministically).

    Distributed shape: one cell assignment map + ONE self-equi-join on
    cell id — never an all-pairs product; a cell of size s contributes
    s^2/2 comparisons, so at 10^9 rows n_centroids scales ~sqrt(n) (same
    sizing rule as ``ivf_topk``) and the join is bucketable by cell at
    rest. Cosine is rounded to ``round_dp`` before the threshold compare
    so the keep/drop decision is fold-order-free and oracle-portable.

    Returns (id, cell, kept) for every input vector."""
    if dim is None:
        raise TypeError("semantic_dedup requires dim= (see lsh_topk)")
    cents = centroids if centroids is not None \
        else seeded_centroids(n_centroids, dim)

    def _checked(col: Column) -> Column:
        return F.when(F.size(col) == dim, col).otherwise(F.raise_error(
            F.concat(F.lit(f"semantic_dedup: vector length != dim={dim},"
                           " got "), F.size(col).cast("string"))))

    assigned = df.select(
        F.col(id_col).alias("vec_id"),
        _checked(F.transform(vec_col, lambda x: x.cast("double")))
        .alias("v")).withColumn(
            "cell", assign_cell_expr(F.col("v"), cents))
    a = assigned.select(F.col("vec_id").alias("id_a"),
                        F.col("v").alias("v_a"), "cell")
    b = assigned.select(F.col("vec_id").alias("id_b"),
                        F.col("v").alias("v_b"), "cell")
    dropped = (a.join(b, "cell")
               .filter(F.col("id_a") < F.col("id_b"))
               .filter(F.round(cosine_expr(F.col("v_a"), F.col("v_b")),
                               round_dp) >= threshold)
               .select(F.col("id_b").alias("vec_id"))
               .distinct())
    return (assigned
            .join(dropped.withColumn("dup", F.lit(True)), "vec_id", "left")
            .select("vec_id", "cell",
                    F.coalesce(~F.col("dup"), F.lit(True)).alias("kept")))


def ivfpq_topk(base: DataFrame, queries: DataFrame, k_top: int = 5,
               coarse: list[list[float]] | None = None,
               n_centroids: int = 8, n_probe: int = 3,
               m: int = 8, k: int = 16, dim: int = 64,
               vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """IVF+PQ composed — the actual FAISS IVFADC index shape and the real
    100 TB ANN path: base vectors are stored ONLY as (coarse cell id, m
    PQ codes); a query probes its ``n_probe`` nearest coarse cells and
    scores the candidates inside them by ADC table lookups. Neither side
    ever touches raw base floats after encoding, and candidate generation
    is a single equi-join on cell id — at 10^10 vectors the scan reads
    4-bit codes for n_probe/n_centroids of the data.

    Composition of the two oracle-verified halves: ``ivf_topk``'s cell
    assignment/probing (``seeded_centroids`` stand-in for trained coarse
    centroids) and ``pq_adc_topk``'s LUT scoring (``pq_centroids``
    codebooks). ADC scores are ranked on the 6dp round with an id
    tie-break (module convention: the m-term double sum is fold-order
    sensitive). Returns (query_id, rank, neighbor_id)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m
    cents_c = coarse if coarse is not None \
        else seeded_centroids(n_centroids, dim)
    cents_pq = pq_centroids(m, k, sub_dim)

    def _checked(col: Column) -> Column:
        return F.when(F.size(col) == dim, col).otherwise(F.raise_error(
            F.concat(F.lit(f"ivfpq_topk: vector length != dim={dim}, got "),
                     F.size(col).cast("string"))))

    coded = base.select(
        F.col(id_col).alias("neighbor_id"),
        _checked(F.col(vec_col)).alias("b_vec"))
    coded = coded.select(
        "neighbor_id",
        assign_cell_expr(F.col("b_vec"), cents_c).alias("cell"),
        F.expr(pq_codes_sql("`b_vec`", cents_pq, sub_dim)).alias("codes"))
    luts = F.expr(pq_luts_sql(f"`{vec_col}`", cents_pq, sub_dim))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_cells_expr(_checked(F.col(vec_col)), cents_c,
                                   n_probe)).alias("cell"),
        luts.alias("luts"))
    adc = F.aggregate(
        F.zip_with(F.col("codes"),
                   F.transform(F.sequence(F.lit(0), F.lit(m - 1)),
                               lambda j: j),
                   lambda c, j: F.element_at(
                       F.element_at("luts", j.cast("int") + 1), c + 1)),
        F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_r").asc(), F.col("neighbor_id").asc())
    # each base row lives in exactly ONE cell -> (query, neighbor) pairs
    # are already unique after the cell equi-join (same as ivf_topk)
    return (F.broadcast(q).join(coded, "cell")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .withColumn("adc_r", F.round(adc, 6))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k_top)
            .select("query_id", "rank", "neighbor_id"))
