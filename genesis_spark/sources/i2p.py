"""I2P addressbook source (S3): subscription files -> frontier seeds.

Mirrors ``i2p_controller.fetch_known_urls`` (i2p_controller.py:25-50)
line semantics exactly:
  * blank lines skipped (``line.strip()`` falsy);
  * comment = line whose RAW text starts with '#' — a line with leading
    whitespace before '#' is NOT a comment in the reference and becomes a
    (bogus) host; the quirk is kept deliberately and pinned by test;
  * host = text before the first '=', stripped (hosts.txt 'host=b64dest'
    subscription format);
  * 'http://' prefixed unless the host already starts with 'http'.

The parse is pure column expressions over a DataFrame of subscription file
contents; fetching the (tiny, O(few)) subscription files is driver-side via
any fetch_fn (crawler/fetch.py) — file contents are KB-scale, the 10^10
frontier never flows through here.
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def addressbook_seeds(subscriptions: DataFrame,
                      text_col: str = "content") -> DataFrame:
    """Explode subscription file text into seed URLs (column-only plan).

    Input: one row per subscription file with its full text.
    Output: (url) rows ready for ``engine.install_seeds`` (attach
    installed_at/seed_id with the caller's ingest clock/sequence).
    """
    # reference uses splitlines() + str.strip(): CRLF files must not leave
    # a trailing '\r' on hosts, and whitespace-only (tab) lines are blank.
    lines = subscriptions.select(
        F.explode(F.split(F.col(text_col), "\r?\n")).alias("_line"))
    kept = lines.filter(
        (~F.col("_line").rlike(r"^\s*$"))
        & (~F.col("_line").startswith("#")))
    host = F.regexp_replace(
        F.split(F.col("_line"), "=").getItem(0), r"^\s+|\s+$", "")
    url = F.when(host.startswith("http"), host) \
        .otherwise(F.concat(F.lit("http://"), host))
    return kept.select(url.alias("url"))


def fetch_subscriptions(spark: SparkSession, urls: Iterable[str],
                        fetch_fn: Callable[[str],
                                           tuple[int, str | None,
                                                 str | None]]) -> DataFrame:
    """Driver-side fetch of the subscription list (the reference loops
    requests.get over SUBSCRIPTION_URLS through the i2p HTTP proxy,
    i2p_controller.py:29-44; failures are logged-and-skipped there,
    skipped here)."""
    rows = []
    for u in urls:
        status, _final, text = fetch_fn(u)
        if status == 200 and text:
            rows.append((u, text))
    return spark.createDataFrame(rows, "subscription_url string, "
                                       "content string")
