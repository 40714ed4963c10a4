"""Registry-dispatch leak parsing as one Spark operator.

Plan shape: pages -> host_key projection -> broadcast INNER join against
the (small) parser registry -> ONE mapInPandas over the matched pages,
dispatching to the per-site extractor inside the Arrow batch -> one output
row per card, with (card_pos, batch_id) mirroring the reference's
in-document card order and batch-of-10 indexing cadence
(leak_parse_controller.py:129-136). Unregistered hosts never reach Python
(the join drops them — the reference's silent ``except: pass``,
leak_parse_controller.py:61-62).

At scale: the registry is O(sites) (dozens) — always broadcast; the HTML
payload crosses the Arrow boundary once, partitioned however the fetch
left it (politeness buckets), so no shuffle is introduced by dispatch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from genesis_spark.functions import urls as U
from genesis_spark.leaks.model import CARD_SCHEMA
from genesis_spark.leaks.parsers import REGISTRY


def leak_registry(spark: SparkSession,
                  parsers: dict | None = None) -> DataFrame:
    """Registry table (host_key). One row per implemented site parser."""
    hosts = sorted(parsers if parsers is not None else REGISTRY)
    return spark.createDataFrame([(h,) for h in hosts], "host_key string")


def dispatch_leak_parse(pages: DataFrame, url_col: str = "url",
                        html_col: str = "html",
                        parsers: dict | None = None) -> DataFrame:
    """Parse every page of a registered leak site into card rows.

    Returns (host_key, card_pos, batch_id, <CARD_SCHEMA fields>): card_pos
    is the in-page document order the extractor emitted, batch_id =
    card_pos // 10 — the batch grouping the reference flushes to its index
    (leak_parse_controller.py:129-136).
    """
    reg = parsers if parsers is not None else REGISTRY
    spark = pages.sparkSession
    matched = (pages
               .withColumn("host_key", U.host_name_expr(F.col(url_col)))
               .join(F.broadcast(leak_registry(spark, reg)), "host_key")
               .select("host_key", F.col(url_col).alias("_u"),
                       F.col(html_col).alias("_h")))

    out_schema = T.StructType(
        [T.StructField("host_key", T.StringType(), False),
         T.StructField("card_pos", T.IntegerType(), False),
         T.StructField("batch_id", T.IntegerType(), False)]
        + list(CARD_SCHEMA.fields))
    card_cols = [f.name for f in CARD_SCHEMA.fields]

    def run(batches):
        for pdf in batches:
            rows = []
            for host, u, h in zip(pdf["host_key"], pdf["_u"], pdf["_h"]):
                fn = reg[host]
                for pos, card in enumerate(fn(u, h or "")):
                    rows.append({"host_key": host, "card_pos": pos,
                                 "batch_id": pos // 10, **card})
            yield pd.DataFrame(rows, columns=["host_key", "card_pos",
                                              "batch_id"] + card_cols)

    return matched.mapInPandas(run, out_schema)


def sink_leak_cards(cards: DataFrame, path: str) -> None:
    """Leak sink (S7): cards land partitioned by host_key so per-site
    consumers prune to their partition; batch_id preserves the reference's
    flush grouping for downstream idempotent indexing."""
    cards.write.mode("append").partitionBy("host_key").parquet(path)
