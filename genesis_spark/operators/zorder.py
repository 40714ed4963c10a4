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
