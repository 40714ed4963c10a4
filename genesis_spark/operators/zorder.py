"""Z-order (Morton) clustering keys for frontier data layout.

At 10^10 frontier rows the scan-pruning story needs the table sorted so
BOTH hot predicates prune files: per-host reads (politeness buckets,
re-crawl of one host) and per-time reads (the wave scan is
installed_at ASC). A single-column sort serves one and destroys the
other; interleaving the bits of (host_bucket, time_bucket) into one
sort key gives every file a tight min/max envelope in both dimensions,
which is exactly what Iceberg's metadata pruning consumes. This module
is the pure-codegen kernel: no UDF, no shuffle of its own — it's an
ORDER BY key, Catalyst sees ~4*bits integer ops per row.

The reference has no storage layout at all (Mongo point lookups,
mongo_request_generator.py:42-46); this is north-star engineering for
the Iceberg frontier table (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ZORDER_BITS = 16


def zorder_key(a: Column, b: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low `bits` bits of two non-negative long columns
    into one long: bit i of `a` lands at position 2i+1, bit i of `b` at
    2i (a-major). Pure integer expression — engine-portable, so a SQL
    oracle can restate it verbatim (see zorder_sql_expr)."""
    expr = None
    for i in range(bits):
        ta = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        tb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i)
        term = ta + tb
        expr = term if expr is None else expr + term
    return expr


def zorder_sql_expr(a: str, b: str, bits: int = ZORDER_BITS) -> str:
    """The identical interleave as ANSI SQL text over column names
    `a`/`b` — used by the DuckDB oracle so Spark and the oracle compute
    the key from one spelled-out formula."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return " + ".join(terms)


def zorder_py(a: int, b: int, bits: int = ZORDER_BITS) -> int:
    """Pure-Python oracle for tests."""
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i + 1)
        out |= ((b >> i) & 1) << (2 * i)
    return out


# ------------------------------------------------------------- Hilbert
#
# The Hilbert curve is the locality-tighter sibling of the Morton key
# above: consecutive key values are always grid-adjacent (Morton jumps
# across the plane at quadrant boundaries), so file min/max envelopes
# are tighter for the same file count — the reason Databricks liquid
# clustering and Amazon S3 analytics layouts moved from Z-order to
# Hilbert. Same contract as zorder_key: pure integer arithmetic, no
# UDF, expressible identically in Spark Columns and ANSI SQL so the
# DuckDB oracle restates the exact formula. The transform is the
# canonical xy2d walk (one quadrant decision + rotation per bit,
# Wikipedia "Hilbert curve" C form) unrolled over `bits` levels; the
# per-level state (hx, hy, hd) is carried as named projection columns
# so the expression tree stays linear in `bits` (a single nested
# Column would grow 3^bits).

HILBERT_BITS = 16


def hilbert_py(a: int, b: int, bits: int = HILBERT_BITS) -> int:
    """Pure-Python oracle: Hilbert distance of cell (a, b) on the
    2^bits x 2^bits grid (canonical xy2d)."""
    n = 1 << bits
    x, y, d = a, b, 0
    s = n >> 1
    while s > 0:
        rx = 1 if x & s else 0
        ry = 1 if y & s else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:             # rotate quadrant
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s >>= 1
    return d


def with_hilbert_key(df, a: str, b: str, out: str = "hkey",
                     bits: int = HILBERT_BITS):
    """Append the Hilbert key of (df[a], df[b]) as `out`.

    Chained projections, one per bit level — Catalyst collapses them
    into a single whole-stage-codegen project; zero shuffle."""
    n = 1 << bits
    df = (df.withColumn("_hx", F.col(a).cast("long"))
            .withColumn("_hy", F.col(b).cast("long"))
            .withColumn("_hd", F.lit(0).cast("long")))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.shiftright(F.col("_hx"), i).bitwiseAND(F.lit(1))
        ry = F.shiftright(F.col("_hy"), i).bitwiseAND(F.lit(1))
        quad = F.when(rx == 1, F.lit(3) - ry).otherwise(ry)
        nx = (F.when(ry == 0,
                     F.when(rx == 1, F.lit(n - 1) - F.col("_hy"))
                     .otherwise(F.col("_hy")))
              .otherwise(F.col("_hx")))
        ny = (F.when(ry == 0,
                     F.when(rx == 1, F.lit(n - 1) - F.col("_hx"))
                     .otherwise(F.col("_hx")))
              .otherwise(F.col("_hy")))
        df = (df.withColumn("_hd2",
                            F.col("_hd") + F.lit(s * s).cast("long") * quad)
                .withColumn("_hx2", nx)
                .withColumn("_hy2", ny)
                .drop("_hx", "_hy", "_hd")
                .withColumnRenamed("_hx2", "_hx")
                .withColumnRenamed("_hy2", "_hy")
                .withColumnRenamed("_hd2", "_hd"))
    return (df.withColumn(out, F.col("_hd"))
              .drop("_hx", "_hy", "_hd"))


def hilbert_sql_ctes(a: str, b: str, carry: str, base: str,
                     bits: int = HILBERT_BITS) -> str:
    """The identical unrolled xy2d walk as a chain of SQL CTEs over
    input relation `base` (column expressions `a`, `b`; `carry` =
    comma-joined passthrough columns). Each level gets fresh names
    hx{i}/hy{i}/hd{i} — no lateral-alias ambiguity in either engine.
    Final CTE is `h0` with the key in column `hkey`."""
    n = 1 << bits
    parts = [
        f"h{bits} AS (SELECT {carry}, CAST({a} AS BIGINT) AS hx{bits}, "
        f"CAST({b} AS BIGINT) AS hy{bits}, CAST(0 AS BIGINT) AS hd{bits} "
        f"FROM {base})"]
    for i in range(bits - 1, -1, -1):
        s, j = 1 << i, i + 1
        rx = f"((hx{j} >> {i}) & 1)"
        ry = f"((hy{j} >> {i}) & 1)"
        parts.append(
            f"h{i} AS (SELECT {carry}, "
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
            f"THEN {n - 1} - hy{j} ELSE hy{j} END ELSE hx{j} END AS hx{i}, "
            f"CASE WHEN {ry} = 0 THEN CASE WHEN {rx} = 1 "
            f"THEN {n - 1} - hx{j} ELSE hx{j} END ELSE hy{j} END AS hy{i}, "
            f"hd{j} + {s * s} * (CASE WHEN {rx} = 1 THEN 3 - {ry} "
            f"ELSE {ry} END) AS hd{i} FROM h{j})")
    parts.append(f"hfin AS (SELECT {carry}, hd0 AS hkey FROM h0)")
    return ",\n".join(parts)
