"""Adaptive recrawl scheduling from observed change history.

The reference recrawls on a fixed 1800 s re-feed timer for every host
(scheduler.py:3-33, constant.py:73) — no per-page freshness model. At
10^10 URLs a flat period either hammers static pages or goes stale on
hot ones, so the north-star scheduler estimates each page's Poisson
change rate from its fetch history and spaces revisits inversely to it
(Cho & Garcia-Molina, "Estimating Frequency of Change", ACM TOIT 2003).

Estimator: with n fetches of which x found the page changed, the
naive -ln(1 - x/n) is undefined at x = n; the paper's bias-corrected
form  r = -ln((n - x + 0.5) / (n + 0.5))  is defined everywhere and
consistent. Interval = 1/r rounds-between-visits, clamped to
[1, max_interval]; the division is rounded to 6 dp BEFORE the ceil so
the discrete decision is identical across engines (the same
boundary-rounding discipline as the z-score/repetition rows).

Everything is one map-side-combinable groupBy + scalar math — no UDF,
no second shuffle; the output is a tiny per-URL schedule that joins
back to the frontier on url_hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def change_rate_schedule(history: DataFrame, key_cols: list[str],
                         changed_col: str = "changed",
                         round_col: str = "round",
                         max_interval: int = 64) -> DataFrame:
    """(key_cols..., n_fetches, n_changes, change_rate, next_interval,
    next_due) from a fetch-history table with one row per fetch and a
    0/1 changed flag."""
    agg = history.groupBy(*key_cols).agg(
        F.count("*").alias("n_fetches"),
        F.sum(F.col(changed_col).cast("long")).alias("n_changes"),
        F.max(F.col(round_col)).alias("last_round"))
    n = F.col("n_fetches").cast("double")
    x = F.col("n_changes").cast("double")
    rate = -F.log((n - x + 0.5) / (n + 0.5))
    # x = 0 -> rate exactly 0 -> 1/rate is inf: never-seen-changing pages
    # just get the max interval instead of a division blow-up.
    interval = F.when(
        F.col("change_rate") <= 0, F.lit(max_interval)).otherwise(
        F.least(
            F.lit(max_interval),
            F.greatest(F.lit(1),
                       F.ceil(F.round(F.lit(1.0) / F.col("change_rate"),
                                      6)).cast("int"))))
    return (agg
            .withColumn("change_rate", F.round(rate, 6))
            .withColumn("next_interval", interval)
            .withColumn("next_due",
                        (F.col("last_round") + F.col("next_interval"))
                        .cast("long"))
            .drop("last_round"))
