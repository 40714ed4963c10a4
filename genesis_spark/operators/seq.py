"""Scalable global sequence numbering.

The crawl-ordering contract (SURVEY.md §2.6 O1) needs a total order index
(frontier priority rank, crawl_seq). A single-partition window would serialize
the whole table through one task — unacceptable at 10^10 rows. Instead:
range-repartition on the order keys, sort within partitions, count rows per
partition (one cheap job over the cached shuffle output), then add
``offset[pid] + local_position`` per partition via Arrow batches. Two jobs,
no global shuffle beyond the range sort itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_global_seq(df: DataFrame, order_cols: list[str],
                    seq_col: str = "seq") -> DataFrame:
    """Append a dense 0-based global index following ``order_cols`` order.
    Order keys must be unique for a deterministic result. The intermediate
    is persisted so the count pass and the numbering pass see identical
    partitioning; caller may ``.unpersist()`` the result's parent when done.
    """
    import pandas as pd

    d = (df.repartitionByRange(*order_cols)
           .sortWithinPartitions(*order_cols)
           .withColumn("_pid", F.spark_partition_id()))
    d = d.persist()
    sizes = {r["_pid"]: r["count"] for r in d.groupBy("_pid").count().collect()}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]

    # NOTE: never StructType.add() on df.schema — pyspark 4 caches the schema
    # object and .add mutates it in place, corrupting the DataFrame's column
    # resolution. Always copy.
    from pyspark.sql import types as T
    out_schema = T.StructType(
        list(d.schema.fields) + [T.StructField(seq_col, T.LongType(), False)])

    def number(batches):
        pos = None
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{seq_col: pd.Series([], dtype="int64")})
                continue
            if pos is None:
                pos = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            pdf = pdf.copy()
            pdf[seq_col] = range(pos, pos + len(pdf))
            pos += len(pdf)
            yield pdf

    return d.mapInPandas(number, out_schema).drop("_pid")
