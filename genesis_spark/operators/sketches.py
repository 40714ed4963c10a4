"""Cardinality sketches (the mergeable-aggregate family).

HyperLogLog distinct counting, deterministic by construction: the hash
is the md5 hex prefix (engine-portable — a DuckDB oracle reproduces the
ESTIMATE bit-for-bit, not just approximately), and the register sum
2^-M_j is accumulated in INTEGER space (sum of 2^(53-rank) as BIGINT,
exact and commutative) so no float summation order can wiggle the
estimate. Spark's own approx_count_distinct is the production shortcut;
this implementation exists because (a) its registers are an explicit
DataFrame you can persist/merge across waves like the KMV row's
min-sets, and (b) it is oracle-checkable.

Layout per key: bucket = first 8 md5 bits (m = 256 registers), rank =
leading-zero count of the next 52 bits + 1 (hex-char arithmetic, no
float log2). Estimate = alpha_m * m^2 / sum(2^-M_j) with the standard
small-range linear-counting correction (Flajolet et al. 2007).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_D = 4                                # count-min hash rows
CMS_W = 512                              # count-min columns per row

HLL_P = 8
HLL_M = 1 << HLL_P                       # 256 registers
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_REST_LEN = 13                           # 52 bits after the bucket byte


def _rank_expr(rest):
    """Leading-zero-bit count of a 13-hex-char (52-bit) string + 1,
    via hex-char arithmetic: 4 bits per leading '0' char plus 0-3 bits
    from the first nonzero digit; all-zero -> 53."""
    nz = F.regexp_replace(rest, "^0*", "")
    z4 = (F.lit(_REST_LEN) - F.length(nz)) * 4
    first = F.substring(nz, 1, 1)
    extra = (F.when(first.isin(*"89abcdef"), 0)
             .when(first.isin(*"4567"), 1)
             .when(first.isin("2", "3"), 2)
             .otherwise(3))
    return (F.when(nz == "", F.lit(4 * _REST_LEN + 1))
            .otherwise(z4 + extra + 1))


def hll_registers(df: DataFrame, key_cols: list[str],
                  val_col: str) -> DataFrame:
    """(key_cols..., bucket, r) — the materialized register table. This
    is the mergeable state: union two register tables and re-take
    max(r) per (key, bucket) to merge sketches across partitions,
    waves, or days."""
    h = F.md5(F.col(val_col))
    return (df
            .filter(F.col(val_col).isNotNull())
            .select(*key_cols,
                    F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
                    .alias("bucket"),
                    _rank_expr(F.substring(h, 3, _REST_LEN)).alias("rank"))
            .groupBy(*key_cols, "bucket")
            .agg(F.max("rank").alias("r")))


def hll_distinct(df: DataFrame, key_cols: list[str],
                 val_col: str, round_dp: int = 2) -> DataFrame:
    """Per-key HLL cardinality estimate (see module docstring). Returns
    (key_cols..., hll_estimate). The register sum is exact integer math
    (sum of 2^(53-r) as BIGINT), so the estimate is row-order-free."""
    regs = hll_registers(df, key_cols, val_col)
    per_key = (regs.groupBy(*key_cols)
               .agg(F.count("*").alias("npres"),
                    F.sum(F.pow(F.lit(2.0), F.lit(53) - F.col("r"))
                          .cast("long")).alias("s_int")))
    v = F.lit(HLL_M) - F.col("npres")                 # zero registers
    s = F.col("s_int") / F.lit(float(1 << 53)) + v    # sum of 2^-M_j
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) / s
    est = (F.when((raw <= 2.5 * HLL_M) & (v > 0),
                  F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v))
           .otherwise(raw))
    return per_key.select(*key_cols,
                          F.round(est, round_dp).alias("hll_estimate"))


# --------------------------------------------------------------- Count-Min

def _cms_col(j: int, val):
    """Column index of hash row j for value `val`: first 32 bits of
    md5('<j>:' + val) mod CMS_W. Engine-portable (a DuckDB oracle
    replays the identical arithmetic)."""
    h = F.md5(F.concat(F.lit(f"{j}:"), val))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(CMS_W))


def cms_counts(df: DataFrame, val_col: str,
               weight_col: str | None = None) -> DataFrame:
    """Count-Min sketch of the frequency of `val_col`: a (j, col, cnt)
    table of CMS_D x CMS_W counters, built in ONE scan (explode of the
    D (j, col) pairs, then a map-side-combinable sum). Mergeable state:
    union two count tables and re-sum per (j, col) — the additive
    counterpart of the HLL register table's max-merge. At 100 TB the
    sketch is ~2K rows regardless of input size, so it broadcasts."""
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    val = F.col(val_col)
    pairs = F.array(*[
        F.struct(F.lit(j).alias("j"), _cms_col(j, val).alias("col"))
        for j in range(CMS_D)])
    return (df.filter(val.isNotNull())
            .select(F.explode(pairs).alias("p"), w.alias("w"))
            .groupBy(F.col("p.j").alias("j"), F.col("p.col").alias("col"))
            .agg(F.sum("w").alias("cnt")))


def cms_estimate(counts: DataFrame, keys: DataFrame,
                 val_col: str) -> DataFrame:
    """Point-query the sketch for every row of `keys`: estimate =
    min over the D rows of the addressed counter (0 when the counter
    was never touched). Guarantees estimate >= true count (never
    under); the counts table is tiny so the join broadcasts."""
    val = F.col(val_col)
    probes = (keys
              .select(val_col,
                      F.explode(F.array(*[
                          F.struct(F.lit(j).alias("j"),
                                   _cms_col(j, val).alias("col"))
                          for j in range(CMS_D)])).alias("p"))
              .select(val_col, "p.j", "p.col"))
    return (probes
            .join(F.broadcast(counts), ["j", "col"], "left")
            .groupBy(val_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0)))
                 .alias("cms_estimate")))


# ----------------------------------------------------- histogram quantiles

def hist_bins(df: DataFrame, key_cols: list[str], val_col: str,
              lo: float, hi: float, n_bins: int = 256) -> DataFrame:
    """(key_cols..., bin, cnt) — fixed-bin histogram state over a known
    [lo, hi) value range. The third mergeable sketch next to HLL
    (max-merge) and CMS (sum-merge): union two bin tables and re-sum
    per (key, bin). Fixed binning (vs a data-dependent KLL/t-digest)
    keeps the state deterministic, so estimates are oracle-checkable
    bit-for-bit; out-of-range values clamp into the edge bins."""
    width = (hi - lo) / n_bins
    b = F.floor((F.col(val_col).cast("double") - lo) / width).cast("int")
    clamped = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    return (df.filter(F.col(val_col).isNotNull())
            .groupBy(*key_cols, clamped.alias("bin"))
            .agg(F.count("*").alias("cnt")))


def hist_quantile(bins: DataFrame, key_cols: list[str], q: float,
                  lo: float, hi: float, n_bins: int = 256,
                  round_dp: int = 4) -> DataFrame:
    """Estimate the q-quantile per key from histogram state by linear
    interpolation inside the bin where the cumulative count crosses
    q*n. One window pass over the (tiny) bin table; every float step
    is rounded at round_dp so the bin/offset decisions are
    engine-portable."""
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = (Window.partitionBy(*key_cols).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, 0))
    wk = Window.partitionBy(*key_cols)
    cum = bins.select(*key_cols, "bin", "cnt",
                      F.sum("cnt").over(w).alias("cum"),
                      F.sum("cnt").over(wk).alias("total"))
    target = F.round(F.lit(q) * F.col("total"), round_dp)
    hit = (cum.filter(F.col("cum") >= target)
           .groupBy(*key_cols)
           .agg(F.min_by(F.struct("bin", "cnt", "cum"), "bin").alias("s"),
                F.first(F.col("total")).alias("total")))
    s = F.col("s")
    frac = ((F.round(F.lit(q) * F.col("total"), round_dp)
             - (s.cum - s.cnt)) / s.cnt)
    est = F.lit(lo) + (s.bin + frac) * F.lit(width)
    return hit.select(*key_cols,
                      F.round(est, round_dp).alias("quantile_est"))
