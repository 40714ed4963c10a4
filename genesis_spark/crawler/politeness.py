"""Per-host politeness buckets + paced fetch (SURVEY.md §2.9 ST3).

The reference guarantees politeness structurally: one host runs inside one
serial Celery task (generic_parse_controller.py:97-123), workers sleep 5 s
after each host (genbot_controller.py:60), and 10 Tor circuits are assigned
round-robin through a shared Redis counter (tor_controller.py:106-111).

The Spark rebuild replaces all shared state with computed partitioning:

* ``politeness_bucket_expr`` (functions/urls.py) maps host_key ->
  ``pmod(xxhash64(host_key), B)`` — the deterministic stand-in for the Redis
  round-robin counter (J5);
* ``repartition(B, bucket)`` pins every URL of a host to exactly one task,
  so a host is never fetched concurrently with itself;
* inside each partition a token-bucket paces requests per host; pass
  ``order_col`` to ``paced_fetch`` to fetch each host's rows in a defined
  order (sort is by (host_key, order_col) — without it only per-host
  serialization is guaranteed, not FIFO, since Spark's sort is not stable).

In the sandbox the fetch function is injected (the web_pages dict join is
the test path); the pacing/partitioning machinery is the real, tested
surface. robots.txt admission (north-star addition, absent in the
reference) is a pre-filter join in ``apply_robots``.
"""

from __future__ import annotations

import time
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from genesis_spark import conf
from genesis_spark.functions.urls import politeness_bucket_expr


def with_politeness_bucket(df: DataFrame, host_col: str = "host_key",
                           buckets: int = conf.POLITENESS_BUCKETS) -> DataFrame:
    return df.withColumn("bucket", politeness_bucket_expr(F.col(host_col), buckets))


def paced_fetch(df: DataFrame,
                fetch_fn: Callable[[str], tuple[int, str | None, str | None]],
                url_col: str = "url", host_col: str = "host_key",
                buckets: int = conf.POLITENESS_BUCKETS,
                per_host_delay_s: float = 0.0,
                order_col: str | None = None) -> DataFrame:
    """Fetch every row's URL with per-host serialization + pacing.

    One Spark task per politeness bucket, so a host is never fetched
    concurrently with itself; a token bucket waits ``per_host_delay_s``
    between consecutive requests to the same host (the reference's 5 s
    inter-host sleep generalized per host). With ``order_col`` set, rows are
    fetched in (host_key, order_col) order — per-host FIFO; without it only
    per-host serialization is guaranteed (Spark's sort is not stable, so
    "input order" is not a thing after a shuffle). ``fetch_fn`` returns
    (status, final_url, html) and must be picklable.

    The per-row ``iterrows`` loop here is deliberate: fetching is I/O-bound
    and pacing is inherently sequential per host — do NOT copy this pattern
    into compute operators.
    """
    import pandas as pd

    from pyspark.sql import types as T

    out_schema = T.StructType(list(df.schema.fields) + [
        T.StructField("status", T.IntegerType(), True),
        T.StructField("final_url", T.StringType(), True),
        T.StructField("fetched_html", T.StringType(), True),
    ])

    sort_cols = [host_col] + ([order_col] if order_col else [])
    bucketed = (with_politeness_bucket(df, host_col, buckets)
                .repartition(buckets, "bucket")
                .sortWithinPartitions(*sort_cols))

    def run(batches):
        last_hit: dict[str, float] = {}
        for pdf in batches:
            statuses, finals, htmls = [], [], []
            for _, row in pdf.iterrows():
                host = row[host_col]
                if per_host_delay_s > 0:
                    elapsed = time.monotonic() - last_hit.get(host, 0.0)
                    if elapsed < per_host_delay_s:
                        time.sleep(per_host_delay_s - elapsed)
                status, final, html = fetch_fn(row[url_col])
                last_hit[host] = time.monotonic()
                statuses.append(status)
                finals.append(final)
                htmls.append(html)
            pdf = pdf.drop(columns=["bucket"])
            pdf["status"] = pd.Series(statuses, dtype="int32", index=pdf.index)
            pdf["final_url"] = finals
            pdf["fetched_html"] = htmls
            yield pdf

    return bucketed.mapInPandas(run, out_schema)


def apply_robots(candidates: DataFrame, robots: DataFrame,
                 url_col: str = "url",
                 host_col: str = "host_key") -> DataFrame:
    """Robots.txt admission filter (north-star addition; the reference has no
    robots handling — keep OFF for order-equality runs). ``robots`` has
    (host_key, disallow: array<string> path prefixes). A candidate is dropped
    when its path starts with any disallowed prefix of its host. Broadcast
    join — the robots cache is small relative to the frontier."""
    path = F.regexp_extract(F.col(url_col),
                            r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*(/[^?#]*)?", 1)
    joined = candidates.withColumn("_path", path).join(
        F.broadcast(robots.select(host_col, "disallow")), host_col, "left")
    blocked = F.exists(
        "disallow", lambda p: F.col("_path").startswith(p))
    return (joined.filter(~F.coalesce(blocked, F.lit(False)))
            .drop("_path", "disallow"))
