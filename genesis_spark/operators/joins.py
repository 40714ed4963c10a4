"""Skew- and shuffle-conscious join strategies.

Two 100 TB join tools the DataFrame API doesn't hand you directly:

  salted_join      hot-key mitigation when the dim side is too big to
                   broadcast and AQE skew-split can't help (e.g. a single
                   key holding >1 executor's worth of probe rows): salt
                   the big side by a per-row varying column, replicate the
                   small side once per salt, join on (key, salt) so one
                   hot key fans out over n_salt tasks.
  write_bucketed   co-located joins: persist both sides bucketed+sorted on
                   the join key so repeated joins are Exchange-free (the
                   scan itself is the shuffle, amortized across queries).

The reference crawler's frontier/host joins motivate both: onion hub
hosts are the canonical hot key (SURVEY §2 A3 salts the same skew for
aggregation; this is the join-side counterpart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                salt_src: str, n_salt: int = 8,
                how: str = "inner") -> DataFrame:
    """Equi-join ``big`` to ``small`` on ``key`` with explicit salting.

    ``salt_src`` names a big-side column that VARIES WITHIN a hot key
    (a row id, url hash, timestamp — anything but the key itself); the
    salt is ``pmod(xxhash64(salt_src), n_salt)``, deterministic so plans
    are replayable. The small side is exploded once per salt value —
    n_salt × |small| rows, the price of splitting each hot key into
    n_salt independent join partitions.

    Result == plain ``big.join(small, key, how)`` (column order: big
    columns then small non-key columns). Inner and left joins only —
    right/full would need salt-aware null handling on the replicated side.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt_src == key:
        raise ValueError("salt_src must vary within a key; salting by the "
                         "join key itself leaves every hot key in one task")
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salt))
        .cast("int"))
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def merge_upsert(base: DataFrame, updates: DataFrame, key: str,
                 op_col: str = "op", delete_op: str = "D") -> DataFrame:
    """``MERGE INTO`` semantics (the Iceberg/Delta upsert the jar-less
    sandbox can't run natively — SnapshotStore's documented gap) as ONE
    full-outer join:

      WHEN MATCHED AND op = delete_op  -> DELETE (row dropped)
      WHEN MATCHED                     -> UPDATE (update row's values win)
      WHEN NOT MATCHED AND op != delete_op -> INSERT
      base rows with no update         -> unchanged pass-through

    ``updates`` must be unique per ``key`` (the MERGE cardinality
    precondition — Iceberg aborts the commit on violation; callers
    pre-aggregate). One shuffle on ``key``; Catalyst broadcasts the
    update side automatically when it is small. Value columns must match
    by name; every shared non-key column resolves to the update side's
    value on a match."""
    val_cols = [c for c in base.columns if c != key]
    u_cols = set(updates.columns)
    missing = [c for c in val_cols if c not in u_cols]
    if missing:
        raise ValueError(f"updates missing value columns: {missing}")
    b = base.select(key, *val_cols,
                    F.lit(True).alias("_in_base"))
    u = updates.select(key, *[F.col(c).alias(f"_u_{c}") for c in val_cols],
                       F.col(op_col).alias("_op"))
    j = b.join(u, key, "full_outer")
    matched = F.col("_in_base").isNotNull() & F.col("_op").isNotNull()
    keep = (
        # matched delete -> drop; matched update -> keep (update values)
        F.when(matched, F.col("_op") != delete_op)
        # unmatched update row -> insert unless it's a tombstone
        .when(F.col("_op").isNotNull(), F.col("_op") != delete_op)
        # base-only row -> pass through
        .otherwise(F.lit(True)))
    out_vals = [F.when(F.col("_op").isNotNull(), F.col(f"_u_{c}"))
                .otherwise(F.col(c)).alias(c) for c in val_cols]
    return (j.filter(keep).select(key, *out_vals))


def write_bucketed(df: DataFrame, table: str, key: str,
                   n_buckets: int = 8, path: str | None = None) -> None:
    """Persist ``df`` hash-bucketed AND sorted on ``key`` so equi-joins
    between same-bucketed tables run Exchange-free (and Sort-free): the
    bucket layout IS the shuffle, paid once at write time and amortized
    over every later join/agg on the key. At 100 TB this is how the
    frontier×seen and frontier×host-state joins avoid re-shuffling
    petabytes per wave — both tables live bucketed by host_key.
    """
    w = (df.write.mode("overwrite")
         .bucketBy(n_buckets, key).sortBy(key)
         .format("parquet"))
    if path is not None:                 # external table (tests: tmp dir)
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, key: str,
                  how: str = "inner") -> DataFrame:
    """Join two ``write_bucketed`` tables on their bucket key. With equal
    bucket counts Spark plans a SortMergeJoin whose children are bare
    bucketed scans — no ShuffleExchange on either side (asserted in
    tests/test_operators.py::test_bucketed_join_no_shuffle)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
