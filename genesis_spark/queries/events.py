"""Registry family: Event analytics & experimentation (split from the monolithic queries.py)."""

from __future__ import annotations

from genesis_spark.queries._shared import *  # noqa: F401,F403



def q_events_anomaly(spark, sf_dir):
    """Per-event-type z-score outlier detection (monitoring/analytics
    family): events whose value sits >= 2 sample-stddevs from their
    type's mean. One map-side-combinable groupBy for the per-type
    moments (tiny — broadcast back), one zero-shuffle scoring map;
    the filter applies to the ROUNDED z (4 dp) so both engines make
    the same boundary call."""
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type",
                                            "value")
    stats = (ev.groupBy("event_type")
             .agg(F.avg("value").alias("mu"),
                  F.stddev_samp("value").alias("sd")))
    return (ev.join(F.broadcast(stats), "event_type")
            .withColumn("z", F.round((F.col("value") - F.col("mu")) /
                                     F.col("sd"), 4))
            .filter(F.abs(F.col("z")) >= 2.0)
            .select("event_id", "event_type",
                    F.round("value", 4).alias("value"), "z"))


ORACLE_EVENTS_ANOMALY = """
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sd
  FROM events GROUP BY 1
)
SELECT event_id, e.event_type, round(value, 4) AS value,
       round((value - mu) / sd, 4) AS z
FROM events e JOIN stats USING (event_type)
WHERE abs(round((value - mu) / sd, 4)) >= 2.0
"""


# ---------------------------------------------------------------------------
# relational / events breadth
# ---------------------------------------------------------------------------

def q_events_windowed(spark, sf_dir):
    """Hourly tumbling-window event aggregation (count + value sum per
    type) — the batch twin of the streaming windowed row
    (stream_windowed)."""
    e = _t(spark, sf_dir, "events")
    return (e.groupBy(F.date_trunc("hour", "ts").alias("window_start"),
                      "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value")))


ORACLE_EVENTS_WINDOWED = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""


def q_events_sessionize(spark, sf_dir):
    """Gap-based sessionization (6-h inactivity closes a session): the
    classic event-analytics operator — one shuffle on user_id, per-user
    window lag + running sum, then per-session rollup. No driver loop, no
    UDF; at 10^10 events this is a single hash-partitioned window pass."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ won't cast straight to long on Spark 4; go through
    # timestamp (session tz is pinned UTC) — differences cancel any shift
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    sess = (ev.withColumn("_new",
                          F.when(gap.isNull() | (gap > 21600), 1).otherwise(0))
            .withColumn("session_no", F.sum("_new").over(
                w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.round(F.sum("value"), 2).alias("total_value")))


ORACLE_EVENTS_SESSIONIZE = """
WITH o AS (
  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                   OR date_diff('second', lag(ts) OVER w, ts) > 21600
            THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_no
"""


def q_events_quantile_sketch(spark, sf_dir):
    """Histogram quantile sketch (operators.sketches.hist_bins/
    hist_quantile) — the third mergeable sketch (sum-merge bins) next
    to HLL and CMS, for the p50/p95 a 10^10-row metrics table can't
    afford exactly: fixed [0,512)x256 binning (deterministic, unlike
    KLL/t-digest) + linear interpolation inside the crossing bin. The
    exact-percentile row (events_quantiles) stays the accuracy
    reference; this row's oracle replays the sketch arithmetic
    bit-for-bit."""
    from genesis_spark.operators.sketches import hist_bins, hist_quantile

    ev = _t(spark, sf_dir, "events")
    bins = hist_bins(ev, ["event_type"], "value", 0.0, 512.0, 256)
    p50 = (hist_quantile(bins, ["event_type"], 0.5, 0.0, 512.0, 256)
           .withColumnRenamed("quantile_est", "p50_est"))
    p95 = (hist_quantile(bins, ["event_type"], 0.95, 0.0, 512.0, 256)
           .withColumnRenamed("quantile_est", "p95_est"))
    n = ev.groupBy("event_type").agg(F.count("value").alias("n_events"))
    return n.join(p50, "event_type").join(p95, "event_type")


ORACLE_EVENTS_QSKETCH = """
WITH b AS (
  SELECT event_type,
         least(255, greatest(0, CAST(floor(value / 2.0) AS INT))) AS bin,
         count(*) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
c AS (
  SELECT event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS total
  FROM b),
q50 AS (
  SELECT event_type,
         min_by(bin, bin) AS bin, min_by(cnt, bin) AS cnt,
         min_by(cum, bin) AS cum, min(total) AS total
  FROM c WHERE cum >= round(0.5 * total, 4) GROUP BY 1),
q95 AS (
  SELECT event_type,
         min_by(bin, bin) AS bin, min_by(cnt, bin) AS cnt,
         min_by(cum, bin) AS cum, min(total) AS total
  FROM c WHERE cum >= round(0.95::DOUBLE * total, 4) GROUP BY 1),
n AS (SELECT event_type, count(value) AS n_events FROM events GROUP BY 1)
SELECT n.event_type, n.n_events,
       round((q50.bin + (round(0.5 * q50.total, 4) - (q50.cum - q50.cnt))
              / q50.cnt) * 2.0, 4) AS p50_est,
       round((q95.bin + (round(0.95::DOUBLE * q95.total, 4) - (q95.cum - q95.cnt))
              / q95.cnt) * 2.0, 4) AS p95_est
FROM n JOIN q50 USING (event_type) JOIN q95 USING (event_type)
"""


def q_events_asof_join(spark, sf_dir):
    """As-of join (brief's custom-operator list): attach to each purchase
    the user's most recent signup at-or-before it. Spark lacks a native
    ASOF JOIN; the scalable form is the union + carry-forward window —
    tag both streams, one shuffle on user_id, sort by (ts, side) so an
    equal-timestamp signup lands before the purchase (inclusive >=,
    matching DuckDB ASOF semantics), then last(ignorenulls) carries the
    latest signup_id forward. No range join, no broadcast, no per-row
    Python; at 10^10 events this is one hash-partitioned sort pass."""
    ev = _t(spark, sf_dir, "events")
    sig = (ev.filter(F.col("event_type") == "signup")
           .select("user_id", "ts", F.col("event_id").alias("signup_id"),
                   F.lit(None).cast("long").alias("event_id"),
                   F.lit(0).alias("_is_p")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", "ts",
                   F.lit(None).cast("long").alias("signup_id"),
                   "event_id", F.lit(1).alias("_is_p")))
    w = (Window.partitionBy("user_id").orderBy("ts", "_is_p")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = sig.unionByName(pur).withColumn(
        "signup_id", F.last("signup_id", ignorenulls=True).over(w))
    return (carried.filter(F.col("_is_p") == 1)
            .select("event_id", "user_id", "ts", "signup_id"))


ORACLE_EVENTS_ASOF = """
SELECT p.event_id, p.user_id, p.ts, s.event_id AS signup_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
ON p.user_id = s.user_id AND p.ts >= s.ts
"""


def q_events_range_join(spark, sf_dir):
    """Range join (brief's custom-operator list): purchases falling in the
    7-day window after each signup of the same user. A naive theta join
    (``p.ts BETWEEN s.ts AND s.ts+7d``) is a cross-product per user; the
    scale form BINS both sides to day buckets — each signup explodes to
    its 8 covered days, purchases key by their day — so the join is a
    plain (user_id, day) equi-join (hash-shuffled, AQE-skew-splittable)
    followed by the exact range filter. Bucket fan-out is the window
    length in days, a constant. Output: per-signup purchase count and
    value within the window."""
    ev = _t(spark, sf_dir, "events")
    sig = (ev.filter(F.col("event_type") == "signup")
           .select("user_id", F.col("event_id").alias("signup_id"),
                   F.col("ts").alias("s_ts")))
    pur = (ev.filter(F.col("event_type") == "purchase")
           .select("user_id", F.col("ts").alias("p_ts"), "value",
                   F.to_date("ts").alias("day")))
    sig_days = sig.withColumn(
        "day", F.explode(F.sequence(
            F.to_date("s_ts"), F.date_add(F.to_date("s_ts"), 7))))
    hits = (sig_days.join(pur, ["user_id", "day"])
            .filter((F.col("p_ts") >= F.col("s_ts")) &
                    (F.col("p_ts") <= F.col("s_ts") +
                     F.expr("INTERVAL 7 DAYS"))))
    return (hits.groupBy("signup_id")
            .agg(F.count("*").alias("n_purchases"),
                 F.round(F.sum("value"), 2).alias("window_value")))


ORACLE_EVENTS_RANGE_JOIN = """
SELECT s.event_id AS signup_id, count(*) AS n_purchases,
       round(sum(p.value), 2) AS window_value
FROM (SELECT * FROM events WHERE event_type = 'signup') s
JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON p.user_id = s.user_id
 AND p.ts >= s.ts AND p.ts <= s.ts + INTERVAL 7 DAY
GROUP BY s.event_id
"""


def q_events_quantiles(spark, sf_dir):
    """Exact per-type value percentiles (linear interpolation — Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the definition)."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
                 F.count("*").alias("n_events")))


ORACLE_EVENTS_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       count(*) AS n_events
FROM events GROUP BY event_type
"""


def q_events_rollup(spark, sf_dir):
    """ROLLUP (day, event_type): per-day-per-type, per-day subtotal, and
    grand total in one pass — Spark's partial-aggregate rollup matches the
    ANSI GROUPING SETS semantics DuckDB executes."""
    ev = _t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    agg = (ev.rollup("day", "event_type")
           .agg(F.count("*").alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value")))
    # rollup NULL keys -> sentinel so the hash compare never sees mixed
    # None/str sort keys (no real day/type can collide with '<all>')
    return agg.select(
        F.coalesce(F.col("day").cast("string"), F.lit("<all>")).alias("day"),
        F.coalesce("event_type", F.lit("<all>")).alias("event_type"),
        "n_events", "total_value")


ORACLE_EVENTS_ROLLUP = """
SELECT coalesce(CAST(day AS VARCHAR), '<all>') AS day,
       coalesce(event_type, '<all>') AS event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM (SELECT CAST(ts AS DATE) AS day, event_type, value FROM events)
GROUP BY ROLLUP (day, event_type)
"""


def q_events_retention(spark, sf_dir):
    """Cohort retention matrix: users cohorted by the day of their first
    event; for each (cohort_day, day_n) the count of distinct users active
    day_n days later — the standard growth-analytics triangle. Two
    map-side-combinable aggs (first-event min, then the matrix) and one
    broadcast-able join of the per-user cohort row back onto activity."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    first = (ev.groupBy("user_id")
             .agg(F.min(F.to_date("ts")).alias("cohort_day")))
    act = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    return (act.join(first, "user_id")
            .groupBy("cohort_day",
                     F.datediff("day", "cohort_day").alias("day_n"))
            .agg(F.countDistinct("user_id").alias("n_users")))


ORACLE_EVENTS_RETENTION = """
WITH first AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
)
SELECT cohort_day,
       CAST(date_diff('day', cohort_day, day) AS INT) AS day_n,
       count(DISTINCT user_id) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY cohort_day, day_n
"""


def q_events_funnel(spark, sf_dir):
    """Sequential funnel (signup -> purchase -> error, each strictly after
    the previous stage's first hit): per-user earliest stage timestamps +
    the stage reached. Three min-aggs, each map-side combinable on
    user_id; stage joins shrink monotonically so the later joins broadcast
    at any realistic funnel selectivity."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t1")))
    s2 = (ev.filter(F.col("event_type") == "purchase")
          .join(s1, "user_id").filter(F.col("ts") > F.col("t1"))
          .groupBy("user_id").agg(F.min("ts").alias("t2")))
    s3 = (ev.filter(F.col("event_type") == "error")
          .join(s2, "user_id").filter(F.col("ts") > F.col("t2"))
          .groupBy("user_id").agg(F.min("ts").alias("t3")))
    return (s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
            .select("user_id", "t1", "t2", "t3",
                    (F.lit(1) + F.col("t2").isNotNull().cast("int")
                     + F.col("t3").isNotNull().cast("int")).alias("stage")))


ORACLE_EVENTS_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'signup' GROUP BY user_id
), s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > s1.t1
  GROUP BY e.user_id
), s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'error' AND e.ts > s2.t2
  GROUP BY e.user_id
)
SELECT s1.user_id, t1, t2, t3,
       1 + CAST(t2 IS NOT NULL AS INT) + CAST(t3 IS NOT NULL AS INT) AS stage
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_events_sliding(spark, sf_dir):
    """Sliding (hopping) window aggregation — ``window(ts, '1 hour',
    '30 minutes')``: every event lands in exactly duration/slide = 2
    windows. The oracle replays the epoch-aligned window generation as
    an unnest over the two hop offsets. Map-side combinable agg; the
    2x row inflation happens pre-combine inside the same task."""
    ev = _t(spark, sf_dir, "events")
    return (ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                       "event_type")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 2).alias("total_value"))
            .select(F.col("w.start").alias("window_start"), "event_type",
                    "n_events", "total_value"))


ORACLE_EVENTS_SLIDING = """
WITH x AS (
  SELECT e.event_type, e.value,
         CAST(floor(epoch(e.ts) / 1800) AS BIGINT) * 1800 - i * 1800
           AS ws
  FROM events e, unnest([0, 1]) u(i))
SELECT TIMESTAMP '1970-01-01 00:00:00' + INTERVAL (ws) SECOND
         AS window_start,
       event_type, count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM x GROUP BY 1, 2
"""


def q_events_markov(spark, sf_dir):
    """Event-sequence Markov transition matrix — the behavioral-model
    signal (what follows what) built from per-user event streams: lag
    over (user, ts-ordered) windows pairs each event with its
    predecessor, ONE map-side-combinable groupBy counts transitions, and
    probabilities normalize per source state (4dp round, module
    convention). Same bounded per-user partition shape as sessionize; at
    100 TB the window partitions by user and the transition matrix is
    O(types^2)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                            "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    counts = (pairs.groupBy("prev_type", "event_type")
              .agg(F.count("*").alias("n_trans")))
    wt = Window.partitionBy("prev_type")
    return (counts
            .withColumn("p_trans",
                        F.round(F.col("n_trans") /
                                F.sum("n_trans").over(wt), 4))
            .select("prev_type", "event_type", "n_trans", "p_trans"))


ORACLE_EVENTS_MARKOV = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (
  SELECT prev_type, event_type, count(*) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type)
SELECT prev_type, event_type, n_trans,
       round(n_trans / (sum(n_trans) OVER (PARTITION BY prev_type)), 4)
         AS p_trans
FROM c
"""


def q_events_scd2(spark, sf_dir):
    """SCD type-2 derivation from a change log: per user, consecutive
    equal event_type runs collapse into validity intervals
    [valid_from, valid_to) with valid_to = the next run's start (NULL =
    current) — the lag -> change-flag -> running-sum -> groupBy shape,
    all window work inside ONE per-user shuffle (the same partitioning
    serves both windows and the final lead)."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = (e.select("user_id", "event_type", "ts", "event_id")
            .withColumn("chg", F.when(
                F.lag("event_type").over(w).isNull()
                | (F.lag("event_type").over(w) != F.col("event_type")),
                1).otherwise(0))
            .withColumn("run_id", F.sum("chg").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
            .groupBy("user_id", "run_id").agg(
                F.first("event_type").alias("state"),
                F.min("ts").alias("valid_from"),
                F.count("*").alias("n_events")))
    w2 = Window.partitionBy("user_id").orderBy("valid_from")
    return runs.select(
        "user_id", F.col("run_id").cast("long").alias("run_id"), "state",
        "valid_from", F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events")


ORACLE_EVENTS_SCD2 = """
WITH flagged AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), runs AS (
  SELECT user_id, event_type, ts,
         sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM flagged
), agg AS (
  SELECT user_id, CAST(run_id AS BIGINT) AS run_id,
         any_value(event_type) AS state,
         min(ts) AS valid_from, count(*) AS n_events
  FROM runs GROUP BY user_id, run_id
)
SELECT user_id, run_id, state, valid_from,
       lead(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
         AS valid_to,
       n_events
FROM agg
"""


def q_events_late_audit(spark, sf_dir):
    """Watermark-sizing audit (how the streaming rows' delays were NOT
    guessed): replaying events in arrival order (event_id) per
    user-partition, an event is late by how far the partition's
    running-max event time has moved past its own — the per-partition
    watermark model Kafka sources use; pure timestamp/interval
    comparisons keep it exact and timezone-free on TIMESTAMP_NTZ. The bucketed histogram per event_type says exactly how
    many rows each candidate ``withWatermark`` delay would drop. One
    shuffle; the window and rollup share the user_id partitioning."""
    e = _t(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("event_id")
         .rowsBetween(Window.unboundedPreceding, -1))
    prev_max = F.max("ts").over(w)
    bucket = (F.when(prev_max.isNull() | (prev_max <= F.col("ts")),
                     "on_time")
              .when(prev_max <= F.col("ts") + F.expr("INTERVAL 1 HOUR"),
                    "1h")
              .when(prev_max <= F.col("ts") + F.expr("INTERVAL 1 DAY"),
                    "1d")
              .otherwise("over_1d"))
    return (e.select("event_type", bucket.alias("late_bucket"))
            .groupBy("event_type", "late_bucket")
            .agg(F.count("*").alias("n_events")))


ORACLE_EVENTS_LATE_AUDIT = """
WITH lat AS (
  SELECT event_type, ts,
         max(ts) OVER (PARTITION BY user_id ORDER BY event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM events
)
SELECT event_type,
       CASE WHEN prev_max IS NULL OR prev_max <= ts THEN 'on_time'
            WHEN prev_max <= ts + INTERVAL 1 HOUR THEN '1h'
            WHEN prev_max <= ts + INTERVAL 1 DAY THEN '1d'
            ELSE 'over_1d' END AS late_bucket,
       count(*) AS n_events
FROM lat GROUP BY 1, 2
"""


def q_events_cdc_apply(spark, sf_dir):
    """CDC changelog materialization (the Debezium-consumer shape): the
    events stream is read as a per-user change log ordered by
    (ts, event_id); 'error' events are tombstones (D), everything else
    upserts (U). Applying the log = last-writer-wins per key, with a
    trailing tombstone deleting the key entirely. Complements
    events_scd2 (full history intervals) and frontier_merge_upsert
    (single-batch merge): this is the multi-op-per-key, order-sensitive
    apply. Output: surviving keys with their final state + op census.

    Plan/scale: ONE shuffle (user_id window); the rollup reuses the same
    partitioning. At 100 TB the log is processed per-key-partition with
    no join at all — the canonical snapshot-maintenance pattern."""
    e = _t(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value")
    op = (F.when(F.col("event_type") == "error", "D")
          .otherwise("U"))
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"),
                                              F.desc("event_id"))
    ranked = (e.withColumn("op", op)
              .withColumn("rn", F.row_number().over(w)))
    census = (ranked.groupBy("user_id")
              .agg(F.count("*").alias("n_ops"),
                   F.sum((F.col("op") == "D").cast("long"))
                   .alias("n_deletes")))
    last = (ranked.filter(F.col("rn") == 1)
            .select("user_id", F.col("op").alias("last_op"),
                    F.col("event_id").alias("last_event_id"),
                    F.col("value").alias("last_value")))
    return (last.filter(F.col("last_op") != "D")
            .join(census, "user_id")
            .select("user_id", "last_event_id",
                    F.round("last_value", 2).alias("last_value"),
                    "n_ops", "n_deletes"))


ORACLE_EVENTS_CDC_APPLY = """
WITH log AS (
  SELECT event_id, ts, user_id, value,
         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events),
census AS (
  SELECT user_id, count(*) AS n_ops,
         CAST(sum(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_deletes
  FROM log GROUP BY user_id),
last AS (
  SELECT user_id, op AS last_op, event_id AS last_event_id,
         value AS last_value
  FROM log WHERE rn = 1)
SELECT l.user_id, l.last_event_id, round(l.last_value, 2) AS last_value,
       c.n_ops, c.n_deletes
FROM last l JOIN census c USING (user_id)
WHERE l.last_op <> 'D'
"""


def q_events_ohlc(spark, sf_dir):
    """OHLC bar aggregation — the first/last/extremes rollup every
    time-series telemetry store runs per bucket (fetch-latency bars per
    host work identically to price bars per symbol): per (series, hour),
    open = first value in (ts, event_id) order, close = last, high/low =
    extremes, volume = sum. Values are integers (event_id-derived) so
    the bars are engine-exact; (ts, event_id) is a total order so
    open/close are deterministic.

    Plan/scale: one window pass per (series, hour) partition — bounded
    by bucket occupancy — then one partial agg; no self-joins."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("s"), (F.col("user_id") % 10).cast("string"))
        .alias("series"),
        F.date_trunc("hour", F.col("ts")).alias("bar_hour"),
        "ts", "event_id",
        (F.col("event_id") % 1000 + 100).cast("long").alias("price"))
    wa = Window.partitionBy("series", "bar_hour").orderBy("ts", "event_id")
    wd = Window.partitionBy("series", "bar_hour").orderBy(
        F.col("ts").desc(), F.col("event_id").desc())
    marked = (ev.withColumn("rna", F.row_number().over(wa))
              .withColumn("rnd", F.row_number().over(wd)))
    return (marked.groupBy("series", "bar_hour").agg(
        F.max(F.when(F.col("rna") == 1, F.col("price"))).cast("long")
        .alias("open"),
        F.max("price").cast("long").alias("high"),
        F.min("price").cast("long").alias("low"),
        F.max(F.when(F.col("rnd") == 1, F.col("price"))).cast("long")
        .alias("close"),
        F.count("*").cast("long").alias("n_events"),
        F.sum("price").cast("long").alias("volume")))


ORACLE_EVENTS_OHLC = """
WITH ev AS (
  SELECT 's' || (user_id % 10) AS series,
         date_trunc('hour', ts) AS bar_hour,
         ts, event_id,
         CAST(event_id % 1000 + 100 AS BIGINT) AS price
  FROM events),
marked AS (
  SELECT *,
         row_number() OVER (PARTITION BY series, bar_hour
                            ORDER BY ts, event_id) AS rna,
         row_number() OVER (PARTITION BY series, bar_hour
                            ORDER BY ts DESC, event_id DESC) AS rnd
  FROM ev)
SELECT series, bar_hour,
       CAST(max(CASE WHEN rna = 1 THEN price END) AS BIGINT) AS open,
       CAST(max(price) AS BIGINT) AS high,
       CAST(min(price) AS BIGINT) AS low,
       CAST(max(CASE WHEN rnd = 1 THEN price END) AS BIGINT) AS close,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(price) AS BIGINT) AS volume
FROM marked GROUP BY series, bar_hour
"""


def q_events_heartbeat_gaps(spark, sf_dir):
    """Heartbeat-gap monitoring per host — fleet-health telemetry for a
    distributed crawler (a host whose event stream goes quiet had its
    fetcher die; the reference's remote monitor is a service, this is
    the batch audit): per host, event count, the MAX inter-event gap in
    exact microseconds (unix_micros/epoch_us — no float epoch), and how
    many gaps exceed the 600 s outage threshold.

    Plan/scale: one lag window per host partition + one partial agg —
    the canonical gap-scan shape (same as sessionize without the
    session assembly)."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.lit("h"), (F.col("user_id") % 40).cast("string"))
        .alias("host_key"),
        # unix_micros rejects TIMESTAMP_NTZ on Spark 4; session tz is
        # pinned UTC so the cast is shift-free (and gaps cancel shifts)
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id")
    w = Window.partitionBy("host_key").orderBy("us", "event_id")
    gapped = ev.withColumn(
        "gap_us", F.col("us") - F.lag("us").over(w))
    return (gapped.groupBy("host_key").agg(
        F.count("*").cast("long").alias("n_events"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
        F.sum((F.col("gap_us") > 600_000_000).cast("long")).cast("long")
        .alias("n_outages")))


ORACLE_EVENTS_HEARTBEAT_GAPS = """
WITH ev AS (
  SELECT 'h' || (user_id % 40) AS host_key,
         epoch_us(ts) AS us, event_id
  FROM events),
gapped AS (
  SELECT host_key,
         us - lag(us) OVER (PARTITION BY host_key
                            ORDER BY us, event_id) AS gap_us
  FROM ev)
SELECT host_key,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us,
       CAST(sum(CASE WHEN gap_us > 600000000 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outages
FROM gapped GROUP BY host_key
"""


def q_events_attribution(spark, sf_dir):
    """Multi-touch conversion attribution: every 'purchase' distributes
    its value over the user's preceding 7 days of 'click'/'view'
    touches — last-touch (all credit to the latest touch) and linear
    (equal split, integer remainder to the latest touch so credit sums
    EXACTLY to conversion value) side by side; untouched conversions
    land in channel 'none'. Exact integer cents throughout.

    Plan/scale: the touch x purchase pairing is a per-user time-range
    join (user groups are session-sized; the day-bucket bin trick of
    events_range_join applies verbatim at 100 TB), then one window per
    purchase and one census agg per channel."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    purch = (ev.filter(F.col("event_type") == "purchase")
             .select(F.col("user_id").alias("u"),
                     F.col("event_id").alias("p_id"),
                     F.col("ts").alias("p_ts"), cents.alias("cents")))
    channel = F.element_at(
        F.array(F.lit("email"), F.lit("search"), F.lit("social"),
                F.lit("direct")),
        (F.col("event_id") % 4 + 1).cast("int"))
    touch = (ev.filter(F.col("event_type").isin("click", "view"))
             .select(F.col("user_id").alias("u"),
                     F.col("event_id").alias("t_id"),
                     F.col("ts").alias("t_ts"),
                     channel.alias("channel")))
    pairs = touch.join(
        purch,
        (touch["u"] == purch["u"])
        & (touch["t_ts"] <= purch["p_ts"])
        & (touch["t_ts"] >= purch["p_ts"] - F.expr("INTERVAL 7 DAYS")))
    w = Window.partitionBy("p_id").orderBy(F.desc("t_ts"), F.desc("t_id"))
    wn = Window.partitionBy("p_id")
    scored = (pairs.select("p_id", "t_id", "t_ts", "channel", "cents")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("nt", F.count("*").over(wn)))
    last_c = F.when(F.col("rn") == 1, F.col("cents")).otherwise(F.lit(0))
    lin_c = (F.expr("cents DIV nt")
             + F.when(F.col("rn") == 1, F.expr("cents % nt"))
             .otherwise(F.lit(0)))
    credited = (scored
                .select("p_id", "channel", last_c.alias("lc"),
                        lin_c.alias("nc"))
                .groupBy("channel")
                .agg(F.count("*").cast("long").alias("n_touches"),
                     F.countDistinct("p_id").cast("long")
                     .alias("n_conversions"),
                     F.sum("lc").cast("long").alias("last_touch_cents"),
                     F.sum("nc").cast("long").alias("linear_cents")))
    untouched = (purch.join(pairs.select("p_id").distinct(), "p_id",
                            "left_anti")
                 .agg(F.lit("none").alias("channel"),
                      F.lit(0).cast("long").alias("n_touches"),
                      F.count("*").cast("long").alias("n_conversions"),
                      F.sum("cents").cast("long")
                      .alias("last_touch_cents"),
                      F.sum("cents").cast("long").alias("linear_cents")))
    return credited.unionByName(untouched)


ORACLE_EVENTS_ATTRIBUTION = """
WITH purch AS (
  SELECT user_id AS u, event_id AS p_id, ts AS p_ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id AS u, event_id AS t_id, ts AS t_ts,
         CASE event_id % 4 WHEN 0 THEN 'email' WHEN 1 THEN 'search'
              WHEN 2 THEN 'social' ELSE 'direct' END AS channel
  FROM events WHERE event_type IN ('click', 'view')),
pairs AS (
  SELECT p.p_id, t.t_id, t.channel, p.cents, t.t_ts
  FROM touch t JOIN purch p
    ON t.u = p.u AND t.t_ts <= p.p_ts
   AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
scored AS (
  SELECT p_id, channel, cents,
         row_number() OVER (PARTITION BY p_id
                            ORDER BY t_ts DESC, t_id DESC) AS rn,
         count(*) OVER (PARTITION BY p_id) AS nt
  FROM pairs),
credited AS (
  SELECT channel,
         CAST(count(*) AS BIGINT) AS n_touches,
         CAST(count(DISTINCT p_id) AS BIGINT) AS n_conversions,
         CAST(sum(CASE WHEN rn = 1 THEN cents ELSE 0 END) AS BIGINT)
           AS last_touch_cents,
         CAST(sum(cents // nt + CASE WHEN rn = 1 THEN cents % nt
                                     ELSE 0 END) AS BIGINT)
           AS linear_cents
  FROM scored GROUP BY channel),
untouched AS (
  SELECT 'none' AS channel, CAST(0 AS BIGINT) AS n_touches,
         CAST(count(*) AS BIGINT) AS n_conversions,
         CAST(sum(cents) AS BIGINT) AS last_touch_cents,
         CAST(sum(cents) AS BIGINT) AS linear_cents
  FROM purch WHERE p_id NOT IN (SELECT p_id FROM pairs))
SELECT * FROM credited UNION ALL SELECT * FROM untouched
"""


def q_events_ab_lift(spark, sf_dir):
    """A/B experiment readout over the event stream — the harness every
    crawl-policy or ranking change ships behind: deterministic variant
    assignment (user_id parity — the hash-bucket split of
    corpus_split/split_leakage_audit), exposure = any view/click,
    conversion = exposed user with >=1 purchase. One row: per-variant
    user/conversion census, exact-ppm conversion rates and lift, a
    sample-ratio-mismatch guard (srm_ppm — the first thing to check
    before believing any lift), exposed-user revenue cents, and the
    pooled two-proportion z statistic. Counts/cents/ppm are exact
    integers; z is the one IEEE expression, built identically in both
    engines from those integers and rounded to 4 dp.

    Plan/scale: one user_id-keyed partial agg (map-side combine over
    the raw stream), then a single-row census — no join anywhere. At
    100 TB of events this is one shuffle of |users| rows."""
    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    per_user = (ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type").isin("view", "click"), 1)
              .otherwise(0)).alias("exposed"),
        F.max(F.when(F.col("event_type") == "purchase", 1)
              .otherwise(0)).alias("purchased"),
        F.sum(F.when(F.col("event_type") == "purchase", cents)
              .otherwise(F.lit(0))).cast("long").alias("rev_cents")))
    u = (per_user.filter(F.col("exposed") == 1)
         .withColumn("is_b", (F.col("user_id") % 2).cast("int")))
    row = u.agg(
        F.sum(F.when(F.col("is_b") == 0, 1).otherwise(0))
        .cast("long").alias("a_users"),
        F.sum(F.when(F.col("is_b") == 1, 1).otherwise(0))
        .cast("long").alias("b_users"),
        F.sum(F.when((F.col("is_b") == 0) & (F.col("purchased") == 1), 1)
              .otherwise(0)).cast("long").alias("a_conv"),
        F.sum(F.when((F.col("is_b") == 1) & (F.col("purchased") == 1), 1)
              .otherwise(0)).cast("long").alias("b_conv"),
        F.sum(F.when(F.col("is_b") == 0, F.col("rev_cents"))
              .otherwise(F.lit(0))).cast("long").alias("a_rev_cents"),
        F.sum(F.when(F.col("is_b") == 1, F.col("rev_cents"))
              .otherwise(F.lit(0))).cast("long").alias("b_rev_cents"))
    row = (row
           .withColumn("a_conv_ppm", F.expr(
               "(a_conv * 1000000) DIV greatest(a_users, 1)"))
           .withColumn("b_conv_ppm", F.expr(
               "(b_conv * 1000000) DIV greatest(b_users, 1)"))
           .withColumn("lift_ppm",
                       F.col("b_conv_ppm") - F.col("a_conv_ppm"))
           .withColumn("srm_ppm", F.expr(
               "(abs(a_users - b_users) * 1000000)"
               " DIV greatest(a_users + b_users, 1)")))
    # pooled two-proportion z — the single IEEE expression, mirrored
    # verbatim in the oracle so both engines evaluate the same tree;
    # degenerate pools (0% or 100% conversion -> se = 0) emit z = 0
    na = F.expr("greatest(a_users, 1)")
    nb = F.expr("greatest(b_users, 1)")
    pc = (F.col("a_conv") + F.col("b_conv")) / (na + nb)
    se = F.sqrt(pc * (1 - pc) * (1.0 / na + 1.0 / nb))
    diff = F.col("b_conv") / nb - F.col("a_conv") / na
    z = F.when(se > 0, F.round(diff / se, 4)).otherwise(F.lit(0.0))
    return row.withColumn("z_stat", z)


ORACLE_EVENTS_AB_LIFT = """
WITH per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type IN ('view', 'click') THEN 1
                  ELSE 0 END) AS exposed,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS purchased,
         CAST(sum(CASE WHEN event_type = 'purchase'
                       THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS rev_cents
  FROM events GROUP BY user_id),
u AS (SELECT *, CAST(user_id % 2 AS INT) AS is_b
      FROM per_user WHERE exposed = 1),
census AS (
  SELECT CAST(sum(CASE WHEN is_b = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS a_users,
         CAST(sum(CASE WHEN is_b = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS b_users,
         CAST(sum(CASE WHEN is_b = 0 AND purchased = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS a_conv,
         CAST(sum(CASE WHEN is_b = 1 AND purchased = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS b_conv,
         CAST(sum(CASE WHEN is_b = 0 THEN rev_cents ELSE 0 END) AS BIGINT)
           AS a_rev_cents,
         CAST(sum(CASE WHEN is_b = 1 THEN rev_cents ELSE 0 END) AS BIGINT)
           AS b_rev_cents
  FROM u),
rates AS (
  SELECT *,
         (a_conv * 1000000) // greatest(a_users, 1) AS a_conv_ppm,
         (b_conv * 1000000) // greatest(b_users, 1) AS b_conv_ppm,
         (abs(a_users - b_users) * 1000000)
           // greatest(a_users + b_users, 1) AS srm_ppm
  FROM census),
z AS (
  SELECT *,
         sqrt((a_conv + b_conv)
              / (greatest(a_users, 1) + greatest(b_users, 1))
              * (1 - (a_conv + b_conv)
                 / (greatest(a_users, 1) + greatest(b_users, 1)))
              * (1.0 / greatest(a_users, 1)
                 + 1.0 / greatest(b_users, 1))) AS se
  FROM rates)
SELECT a_users, b_users, a_conv, b_conv, a_rev_cents, b_rev_cents,
       a_conv_ppm, b_conv_ppm,
       b_conv_ppm - a_conv_ppm AS lift_ppm, srm_ppm,
       CASE WHEN se > 0
            THEN round((b_conv / greatest(b_users, 1)
                        - a_conv / greatest(a_users, 1)) / se, 4)
            ELSE 0.0 END AS z_stat
FROM z
"""


def q_events_bot_detect(spark, sf_dir):
    """Automated-traffic detection from event cadence — the log-side
    mirror of the crawler's own politeness: humans arrive bursty, bots
    tick. Per user: inter-event gaps (epoch-second lag, day-capped so a
    vacation doesn't drown the signal), then the squared coefficient of
    variation CV^2 = (n*sum(g^2) - S^2) / S^2 in exact integer ppm — the
    scale-free regularity score (0 = metronome). Bot flag = enough
    events + sub-10-min mean cadence + CV^2 below threshold. The gap cap
    keeps every accumulator in bigint range (g<=86400 -> n*ssg<=7.5e15
    at 1k gaps/user); the one DIV denominator is pre-shrunk by 1e6 so
    the ppm never multiplies past 63 bits.

    Plan/scale: ONE shuffle (user_id window), per-user agg reuses the
    same partitioning — the events_cdc_apply shape. At 100 TB of logs
    this is the standard sessionless per-key scan."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("es"))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    # least() skips nulls in both engines, so guard the first event
    # explicitly or it would grow a phantom 86400 "gap"
    g = (ev.withColumn("prev", F.lag("es").over(w))
         .withColumn("gap", F.when(
             F.col("prev").isNotNull(),
             F.least(F.col("es") - F.col("prev"),
                     F.lit(86400).cast("long")))))
    agg = (g.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                F.count("gap").cast("long").alias("n_gaps"),
                F.coalesce(F.sum("gap"), F.lit(0)).cast("long")
                .alias("sg"),
                F.coalesce(F.sum(F.col("gap") * F.col("gap")),
                           F.lit(0)).cast("long").alias("ssg")))
    out = (agg
           .withColumn("mean_gap_s",
                       F.expr("sg DIV greatest(n_gaps, 1)"))
           .withColumn("cv2_ppm", F.expr(
               "greatest(n_gaps * ssg - sg * sg, 0)"
               " DIV greatest((sg * sg) DIV 1000000, 1)"))
           .withColumn("is_bot",
                       (F.col("n_events") >= 20)
                       & (F.col("mean_gap_s") < 600)
                       & (F.col("cv2_ppm") < 500_000)))
    return out.select("user_id", "n_events", "n_gaps", "mean_gap_s",
                      "cv2_ppm", "is_bot")


ORACLE_EVENTS_BOT_DETECT = """
WITH g AS (
  SELECT user_id,
         CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) IS NULL
              THEN NULL
              ELSE least(CAST(floor(epoch(ts)) AS BIGINT)
                         - lag(CAST(floor(epoch(ts)) AS BIGINT))
                           OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id),
                         86400) END AS gap
  FROM events),
agg AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(gap) AS BIGINT) AS n_gaps,
         CAST(coalesce(sum(gap), 0) AS BIGINT) AS sg,
         CAST(coalesce(sum(gap * gap), 0) AS BIGINT) AS ssg
  FROM g GROUP BY user_id),
sc AS (
  SELECT *,
         sg // greatest(n_gaps, 1) AS mean_gap_s,
         greatest(n_gaps * ssg - sg * sg, 0)
           // greatest((sg * sg) // 1000000, 1) AS cv2_ppm
  FROM agg)
SELECT user_id, n_events, n_gaps, mean_gap_s, cv2_ppm,
       (n_events >= 20 AND mean_gap_s < 600 AND cv2_ppm < 500000)
         AS is_bot
FROM sc
"""


def q_events_path_trigrams(spark, sf_dir):
    """Common-journey mining: the top-10 three-step event-type paths
    across all user timelines (the sequence-mining extension of
    events_markov's bigram transition matrix — funnels you did NOT
    design, discovered from the log). Two leads per user timeline,
    exact counts, rank on (count DESC, path ASC).

    Plan/scale: ONE shuffle (user_id window; leads reuse the same sort),
    path census agg, then a top-k window over the CENSUS (|distinct
    trigrams| <= |event types|^3 = tiny at any log size)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts",
                                            "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    p = (ev.withColumn("e2", F.lead("event_type", 1).over(w))
         .withColumn("e3", F.lead("event_type", 2).over(w))
         .filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
         .select(F.concat_ws(">", "event_type", "e2", "e3")
                 .alias("path")))
    census = p.groupBy("path").agg(F.count(F.lit(1)).cast("long")
                                   .alias("n_paths"))
    r = Window.orderBy(F.col("n_paths").desc(), F.col("path").asc())
    return (census.withColumn("rank", F.row_number().over(r))
            .filter(F.col("rank") <= 10)
            .select("path", "n_paths", "rank"))


ORACLE_EVENTS_PATH_TRIGRAMS = """
WITH p AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS path FROM (
    SELECT event_type,
           lead(event_type, 1) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS e2,
           lead(event_type, 2) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS e3
    FROM events)
  WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
census AS (
  SELECT path, CAST(count(*) AS BIGINT) AS n_paths FROM p GROUP BY path)
SELECT path, n_paths, CAST(rank AS INT) AS rank FROM (
  SELECT *, row_number() OVER (ORDER BY n_paths DESC, path ASC) AS rank
  FROM census)
WHERE rank <= 10
"""


def q_events_survival(spark, sf_dir):
    """Kaplan-Meier repurchase-latency curve (Kaplan & Meier, JASA
    1958): each purchase event is a subject whose duration is the days
    until that user's NEXT purchase; a user's final purchase is
    right-CENSORED by the end of the log (its true gap is unknown, but
    it stays in the at-risk set — the bias a naive mean-gap estimate
    gets wrong). Emits the KM step table: gap day, at-risk count,
    deaths (observed next purchases), product-limit survival estimate.

    Exactness: n_risk and n_deaths are exact integer censuses; each
    step's hazard factor (n_risk - d)/n_risk is a division of exact
    integers (bit-identical IEEE result in both engines), its ln is
    quantized to 1e-9-unit integers BEFORE the running sum (the
    text_heaps_fit recipe), and survival_ppm = floor(exp(sum)*1e6+0.5).
    The one factor that can be 0 (everyone left dies on the last step)
    is special-cased to survival 0 without touching ln.

    Plan/scale: ONE per-user window (lead) over purchases, then every
    later window runs over the GAP-DAY CENSUS (<= max gap in days),
    never the event stream."""
    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "event_id", "ts"))
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gmax = ev.agg(F.max("ts").alias("gmax_ts"))
    subj = (ev.withColumn("next_ts", F.lead("ts").over(w_u))
            .crossJoin(F.broadcast(gmax))
            .select(F.datediff(F.to_date(F.coalesce("next_ts",
                                                    "gmax_ts")),
                               F.to_date("ts")).cast("int").alias("gap_d"),
                    F.when(F.col("next_ts").isNotNull(), 1)
                    .otherwise(0).alias("observed")))
    census = subj.groupBy("gap_d").agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.sum("observed").cast("long").alias("n_deaths"))
    w_all = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    w_prev = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, -1)
    steps = (census
             .withColumn("n_risk",
                         (F.sum("n_all").over(w_all) -
                          F.coalesce(F.sum("n_all").over(w_prev),
                                     F.lit(0))).cast("long"))
             .filter(F.col("n_deaths") > 0))
    f = ((F.col("n_risk") - F.col("n_deaths")).cast("double") /
         F.col("n_risk").cast("double"))
    steps = steps.withColumn(
        "lnq", F.when(f > 0, F.round(F.log(f) * 1e9).cast("long"))
        .otherwise(F.lit(0)))
    w_cum = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, 0)
    srv = F.when(f == 0, F.lit(0)).otherwise(
        F.floor(F.exp(F.sum("lnq").over(w_cum).cast("double") / 1e9)
                * 1e6 + F.lit(0.5))).cast("long")
    return steps.select("gap_d", "n_risk", "n_deaths",
                        srv.alias("survival_ppm"))


ORACLE_EVENTS_SURVIVAL = """
WITH ev AS (
  SELECT user_id, event_id, ts FROM events
  WHERE event_type = 'purchase'),
gmax AS (SELECT max(ts) AS gmax_ts FROM ev),
subj AS (
  SELECT CAST(date_diff('day', CAST(ts AS DATE),
                        CAST(coalesce(next_ts, gmax_ts) AS DATE)) AS INT)
           AS gap_d,
         CASE WHEN next_ts IS NOT NULL THEN 1 ELSE 0 END AS observed
  FROM (SELECT ts, lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_ts
        FROM ev), gmax),
census AS (
  SELECT gap_d, CAST(count(*) AS BIGINT) AS n_all,
         CAST(sum(observed) AS BIGINT) AS n_deaths
  FROM subj GROUP BY gap_d),
steps AS (
  SELECT gap_d, n_deaths,
         CAST(sum(n_all) OVER () -
              coalesce(sum(n_all) OVER (ORDER BY gap_d
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING), 0) AS BIGINT)
           AS n_risk
  FROM census),
d AS (
  SELECT gap_d, n_risk, n_deaths,
         CASE WHEN n_risk > n_deaths
              THEN CAST(round(ln((CAST(n_risk - n_deaths AS DOUBLE))
                                 / CAST(n_risk AS DOUBLE)) * 1e9)
                        AS BIGINT)
              ELSE 0 END AS lnq
  FROM steps WHERE n_deaths > 0)
SELECT gap_d, n_risk, n_deaths,
       CASE WHEN n_risk = n_deaths THEN 0
            ELSE CAST(floor(exp(CAST(sum(lnq) OVER (ORDER BY gap_d
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                                / 1e9) * 1e6 + 0.5) AS BIGINT)
         END AS survival_ppm
FROM d
"""


def q_events_rfm(spark, sf_dir):
    """RFM customer segmentation (Hughes 1994, the classic CRM
    workhorse): per user, Recency = days since last purchase at log
    end, Frequency = purchase count, Monetary = exact cent total;
    each scored 1-5 by quintile (5 = best) and concatenated into the
    three-digit segment (555 = champions, 111 = lost).

    Exactness: monetary quantizes each event value to cents BEFORE the
    sum (double-sum order can't touch the hash); quintiles are ntile(5)
    over a UNIQUE total order (metric, then user_id), so the tile
    boundaries are deterministic and the SQL-standard ntile agrees
    across engines.

    Plan/scale: one per-user agg, then three ntile windows over the
    USER census (not the event stream); the global-window census is the
    standard one-pass segmentation shape."""
    ev = (_t(spark, sf_dir, "events")
          .filter(F.col("event_type") == "purchase")
          .select("user_id", "ts", "value"))
    gmax = ev.agg(F.max(F.to_date("ts")).alias("gmax_d"))
    per_user = (ev.groupBy("user_id")
                .agg(F.max(F.to_date("ts")).alias("last_d"),
                     F.count(F.lit(1)).cast("long").alias("frequency"),
                     F.sum(F.round(F.col("value") * 100).cast("long"))
                     .cast("long").alias("monetary_cents"))
                .crossJoin(F.broadcast(gmax))
                .select("user_id",
                        F.datediff("gmax_d", "last_d").cast("int")
                        .alias("recency_d"),
                        "frequency", "monetary_cents"))
    w_r = Window.orderBy(F.col("recency_d").desc(), "user_id")
    w_f = Window.orderBy(F.col("frequency").asc(), "user_id")
    w_m = Window.orderBy(F.col("monetary_cents").asc(), "user_id")
    scored = (per_user
              .withColumn("r_score", F.ntile(5).over(w_r))
              .withColumn("f_score", F.ntile(5).over(w_f))
              .withColumn("m_score", F.ntile(5).over(w_m)))
    return scored.select(
        "user_id", "recency_d", "frequency", "monetary_cents",
        "r_score", "f_score", "m_score",
        (F.col("r_score") * 100 + F.col("f_score") * 10
         + F.col("m_score")).cast("int").alias("segment"))


ORACLE_EVENTS_RFM = """
WITH ev AS (
  SELECT user_id, CAST(ts AS DATE) AS d,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
gmax AS (SELECT max(d) AS gmax_d FROM ev),
per_user AS (
  SELECT user_id,
         CAST(date_diff('day', max(d), (SELECT gmax_d FROM gmax))
              AS INT) AS recency_d,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(sum(cents) AS BIGINT) AS monetary_cents
  FROM ev GROUP BY user_id),
scored AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_d DESC, user_id) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
         ntile(5) OVER (ORDER BY monetary_cents ASC, user_id) AS m_score
  FROM per_user)
SELECT user_id, recency_d, frequency, monetary_cents,
       CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
FROM scored
"""


def q_events_changepoint(spark, sf_dir):
    """Mean-shift change-point detection per event type — the first
    binary-segmentation step (Scott & Knott 1974; the batch CUSUM
    alternative whose recurrence can't distribute): over each type's
    daily count series, every boundary t is scored by the split
    statistic |mean(left) - mean(right)| and the argmax day is the
    candidate change point — the volume-regime-shift monitor for a
    crawl's fetch/error logs.

    Exactness: the statistic is |S_t*(n-t) - (S_n-S_t)*t| * 1e6 DIV
    (t*(n-t)) — exact integer arithmetic on cumulative-sum censuses
    (both engines DIV identically); argmax tie-breaks on earliest day.

    Plan/scale: daily census agg (map-side combinable), then ALL
    windows run over the per-type day census (~30 rows/type), never
    the event stream. Days with zero events of a type don't appear in
    the series (documented: the statistic is over observed days)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"))
    daily = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("long").alias("c"))
    w_cum = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = (Window.partitionBy("event_type").orderBy("day")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    cand = (daily
            .withColumn("st", F.sum("c").over(w_cum))
            .withColumn("sn", F.sum("c").over(w_all))
            .withColumn("t", F.row_number().over(
                Window.partitionBy("event_type").orderBy("day")))
            .withColumn("n", F.count(F.lit(1)).over(w_all))
            .filter(F.col("t") < F.col("n"))
            .withColumn("stat_ppm", F.expr(
                "abs(st * (n - t) - (sn - st) * t) * 1000000 "
                "DIV (t * (n - t))").cast("long")))
    r = Window.partitionBy("event_type").orderBy(
        F.col("stat_ppm").desc(), "day")
    return (cand.withColumn("rk", F.row_number().over(r))
            .filter(F.col("rk") == 1)
            .select("event_type", F.col("day").alias("split_day"),
                    "stat_ppm", F.col("st").alias("left_sum"),
                    (F.col("sn") - F.col("st")).alias("right_sum"),
                    F.col("n").cast("long").alias("n_days")))


ORACLE_EVENTS_CHANGEPOINT = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2),
cand AS (
  SELECT event_type, day,
         sum(c) OVER (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING) AS st,
         sum(c) OVER (PARTITION BY event_type) AS sn,
         row_number() OVER (PARTITION BY event_type ORDER BY day) AS t,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM daily),
scored AS (
  SELECT event_type, day,
         CAST(abs(st * (n - t) - (sn - st) * t) * 1000000
              // (t * (n - t)) AS BIGINT) AS stat_ppm,
         st, sn, n
  FROM cand WHERE t < n)
SELECT event_type, split_day, stat_ppm, left_sum, right_sum, n_days
FROM (
  SELECT event_type, day AS split_day, stat_ppm,
         CAST(st AS BIGINT) AS left_sum,
         CAST(sn - st AS BIGINT) AS right_sum,
         CAST(n AS BIGINT) AS n_days,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY stat_ppm DESC, day) AS rk
  FROM scored)
WHERE rk = 1
"""


def q_events_lift_matrix(spark, sf_dir):
    """Association lift between event types (the market-basket measure,
    Brin et al. SIGMOD 1997): baskets are (user, day) activity windows;
    for each unordered type pair, lift = P(a,b) / (P(a) * P(b)) > 1
    means the types co-occur MORE than independence predicts — the
    co-behavior matrix behind 'users who error also retry' readouts,
    and the same shape as co-citation mining on the crawl side.

    Exactness: lift_ppm = (n_ab * n_baskets * 1e6) DIV (n_a * n_b),
    confidence both directions as exact DIV — counts only, no floats.

    Plan/scale: distinct (basket, type) -> per-type census + ONE
    self-equi-join on basket id (fan-out bounded by types-per-basket,
    5 here) -> pair census. Never all-pairs across baskets."""
    ev = _t(spark, sf_dir, "events").select(
        F.concat(F.col("user_id").cast("string"), F.lit("@"),
                 F.to_date("ts").cast("string")).alias("basket"),
        "event_type")
    bt = ev.distinct()
    n_baskets = bt.select("basket").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets"))
    per_type = bt.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_t"))
    a = bt.select("basket", F.col("event_type").alias("a"))
    b = bt.select("basket", F.col("event_type").alias("b"))
    pairs = (a.join(b, "basket").filter(F.col("a") < F.col("b"))
             .groupBy("a", "b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ab")))
    ta = per_type.select(F.col("event_type").alias("a"),
                         F.col("n_t").alias("n_a"))
    tb = per_type.select(F.col("event_type").alias("b"),
                         F.col("n_t").alias("n_b"))
    return (pairs.join(F.broadcast(ta), "a").join(F.broadcast(tb), "b")
            .crossJoin(F.broadcast(n_baskets))
            .select("a", "b", "n_ab", "n_a", "n_b",
                    F.expr("(n_ab * n_baskets * 1000000) DIV (n_a * n_b)")
                    .cast("long").alias("lift_ppm"),
                    F.expr("(n_ab * 1000000) DIV n_a").cast("long")
                    .alias("conf_a_to_b_ppm"),
                    F.expr("(n_ab * 1000000) DIV n_b").cast("long")
                    .alias("conf_b_to_a_ppm")))


ORACLE_EVENTS_LIFT_MATRIX = """
WITH bt AS (
  SELECT DISTINCT user_id || '@' || CAST(CAST(ts AS DATE) AS VARCHAR)
           AS basket, event_type
  FROM events),
nb AS (SELECT CAST(count(DISTINCT basket) AS BIGINT) AS n_baskets
       FROM bt),
per_type AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_t
  FROM bt GROUP BY event_type),
pairs AS (
  SELECT x.event_type AS a, y.event_type AS b,
         CAST(count(*) AS BIGINT) AS n_ab
  FROM bt x JOIN bt y ON x.basket = y.basket
                     AND x.event_type < y.event_type
  GROUP BY 1, 2)
SELECT a, b, n_ab, ta.n_t AS n_a, tb.n_t AS n_b,
       CAST((n_ab * nb.n_baskets * 1000000) // (ta.n_t * tb.n_t)
            AS BIGINT) AS lift_ppm,
       CAST((n_ab * 1000000) // ta.n_t AS BIGINT) AS conf_a_to_b_ppm,
       CAST((n_ab * 1000000) // tb.n_t AS BIGINT) AS conf_b_to_a_ppm
FROM pairs JOIN per_type ta ON ta.event_type = pairs.a
           JOIN per_type tb ON tb.event_type = pairs.b
           CROSS JOIN nb
"""


def q_events_seasonality(spark, sf_dir):
    """Hour-of-day x day-of-week traffic seasonality profile — the
    capacity-planning / anomaly-baseline table every crawl or event
    pipeline keeps (recrawl schedulers align to the trough hours;
    anomaly detectors score against the (dow, hour) baseline, not the
    global mean). Both day-of-week and hour derive from integer EPOCH
    arithmetic — dow = (days + 3) % 7 with 0 = Monday (1970-01-01 was
    a Thursday = 3) — sidestepping the engines' conflicting dayofweek
    conventions entirely.

    Exactness: counts are exact; shares are exact integer DIV ppm;
    the per-dow peak hour tie-breaks on earliest hour.

    Plan/scale: ONE map-side-combinable census agg over the event
    stream into at most 168 cells; the peak window runs over the
    168-row census."""
    ev = _t(spark, sf_dir, "events").select(
        F.unix_timestamp("ts").alias("ep"))
    cells = (ev.select(
        (((F.col("ep") / 86400).cast("long") + 3) % 7).alias("dow"),
        ((F.col("ep") % 86400) / 3600).cast("long").alias("hour"))
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events")))
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    w_dow = Window.partitionBy("dow")
    r = Window.partitionBy("dow").orderBy(F.col("n_events").desc(),
                                          F.col("hour").asc())
    return (cells
            .withColumn("total", F.sum("n_events").over(w_all))
            .withColumn("dow_total", F.sum("n_events").over(w_dow))
            .withColumn("share_ppm", F.expr(
                "n_events * 1000000 DIV total").cast("long"))
            .withColumn("dow_share_ppm", F.expr(
                "n_events * 1000000 DIV dow_total").cast("long"))
            .withColumn("is_peak",
                        (F.row_number().over(r) == 1).cast("int"))
            .select("dow", "hour", "n_events", "share_ppm",
                    "dow_share_ppm", "is_peak"))


ORACLE_EVENTS_SEASONALITY = """
WITH e AS (
  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events),
cells AS (
  SELECT ((ep // 86400) + 3) % 7 AS dow,
         (ep % 86400) // 3600 AS hour,
         CAST(count(*) AS BIGINT) AS n_events
  FROM e GROUP BY 1, 2),
x AS (
  SELECT dow, hour, n_events,
         sum(n_events) OVER () AS total,
         sum(n_events) OVER (PARTITION BY dow) AS dow_total,
         row_number() OVER (PARTITION BY dow
                            ORDER BY n_events DESC, hour ASC) AS rk
  FROM cells)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hour AS BIGINT) AS hour,
       n_events,
       CAST(n_events * 1000000 // total AS BIGINT) AS share_ppm,
       CAST(n_events * 1000000 // dow_total AS BIGINT) AS dow_share_ppm,
       CAST(CASE WHEN rk = 1 THEN 1 ELSE 0 END AS INT) AS is_peak
FROM x
"""


def q_events_gini(spark, sf_dir):
    """Traffic-concentration audit — exact Gini coefficient of the
    per-user event-count distribution plus the top-decile share (the
    'is this log a few bots or a real population' check that gates
    training-on-behavioral-data, and the skew early-warning for any
    user-keyed shuffle: Gini -> 1 means one hot key owns the stage).
    Gini = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over counts
    sorted ascending; ties are order-insensitive for the Gini sum
    (equal x swap freely), and the top-decile cut uses a full
    (count DESC, user_id) tie-break so both engines cut identically.

    Exactness: every term is an exact integer; ppm via integer DIV.

    Plan/scale: ONE user census agg (map-side combinable), then the
    rank windows run over the |users| census, never the event stream;
    at 10^9 users the sort is a range-partitioned rank."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    census = (ev.groupBy("user_id")
              .agg(F.count(F.lit(1)).cast("long").alias("x")))
    w_asc = Window.orderBy(F.col("x").asc(), F.col("user_id").asc())
    w_desc = Window.orderBy(F.col("x").desc(), F.col("user_id").asc())
    w_all = Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)
    ranked = (census
              .withColumn("i", F.row_number().over(w_asc).cast("long"))
              .withColumn("r", F.row_number().over(w_desc).cast("long"))
              .withColumn("n", F.count(F.lit(1)).over(w_all).cast("long")))
    return (ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total_events"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("s_ix"),
        F.sum(F.when(F.col("r") <= F.greatest(
            F.lit(1).cast("long"), F.expr("n DIV 10")), F.col("x"))
            .otherwise(F.lit(0))).cast("long").alias("top_decile_events"))
        .select("n_users", "total_events",
                F.expr("(2 * s_ix - (n_users + 1) * total_events) "
                       "* 1000000 DIV (n_users * total_events)")
                .cast("long").alias("gini_ppm"),
                F.expr("top_decile_events * 1000000 DIV total_events")
                .cast("long").alias("top_decile_ppm")))


ORACLE_EVENTS_GINI = """
WITH census AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY user_id),
ranked AS (
  SELECT x,
         row_number() OVER (ORDER BY x ASC, user_id ASC) AS i,
         row_number() OVER (ORDER BY x DESC, user_id ASC) AS r,
         count(*) OVER () AS n
  FROM census),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(x) AS BIGINT) AS total_events,
         CAST(sum(i * x) AS BIGINT) AS s_ix,
         CAST(sum(CASE WHEN r <= greatest(1, n // 10) THEN x ELSE 0 END)
              AS BIGINT) AS top_decile_events
  FROM ranked)
SELECT n_users, total_events,
       CAST((2 * s_ix - (n_users + 1) * total_events) * 1000000
            // (n_users * total_events) AS BIGINT) AS gini_ppm,
       CAST(top_decile_events * 1000000 // total_events AS BIGINT)
         AS top_decile_ppm
FROM agg
"""


def q_events_dau_mau(spark, sf_dir):
    """DAU / trailing-28-day-MAU stickiness — the engagement ratio
    behind every activity dashboard, computed EXACTLY at scale: the
    sliding-window distinct-user count is NOT a windowed agg (distinct
    doesn't merge) — instead each user's active days become coverage
    intervals [day, day+27], overlapping intervals merge per user (the
    lag + running-sum island pattern), and merged intervals explode
    into covered days. Intervals are disjoint after the merge, so a
    plain count per day IS the exact distinct count.

    Exactness: integer epoch-day arithmetic end to end; stickiness is
    exact integer DIV ppm.

    Plan/scale: the explode is bounded by 28 x islands (never
    |users| x |days|); per-user windows shuffle the (user, day) census
    once; at 10^9 users the census is the only wide exchange."""
    ud = (_t(spark, sf_dir, "events")
          .select(F.expr("unix_timestamp(ts) DIV 86400").cast("long")
                  .alias("day"), "user_id")
          .distinct())
    dau = ud.groupBy("day").agg(F.count(F.lit(1)).cast("long")
                                .alias("n_dau"))
    w = Window.partitionBy("user_id").orderBy("day")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    iv = (ud
          .withColumn("_pd", F.lag("day").over(w))
          .withColumn("_new", (F.col("_pd").isNull()
                               | (F.col("day") > F.col("_pd") + 27))
                      .cast("int"))
          .withColumn("_g", F.sum("_new").over(wsum))
          .groupBy("user_id", "_g")
          .agg(F.min("day").alias("s"),
               (F.max("day") + 27).alias("e")))
    mau = (iv.select("user_id",
                     F.explode(F.sequence("s", "e")).alias("day"))
           .groupBy("day").agg(F.count(F.lit(1)).cast("long")
                               .alias("n_mau28")))
    return (dau.join(mau, "day")
            .select("day", "n_dau", "n_mau28",
                    F.expr("n_dau * 1000000 DIV n_mau28").cast("long")
                    .alias("stickiness_ppm")))


ORACLE_EVENTS_DAU_MAU = """
WITH ud AS (
  SELECT DISTINCT CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
                  user_id
  FROM events),
dau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_dau FROM ud GROUP BY day),
l AS (
  SELECT user_id, day,
         lag(day) OVER (PARTITION BY user_id ORDER BY day) AS pd
  FROM ud),
g AS (
  SELECT user_id, day,
         sum(CASE WHEN pd IS NULL OR day > pd + 27 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM l),
iv AS (
  SELECT user_id, grp, min(day) AS s, max(day) + 27 AS e
  FROM g GROUP BY 1, 2),
cover AS (
  SELECT user_id, unnest(generate_series(s, e)) AS day FROM iv),
mau AS (
  SELECT day, CAST(count(*) AS BIGINT) AS n_mau28 FROM cover GROUP BY day)
SELECT CAST(d.day AS BIGINT) AS day, d.n_dau, m.n_mau28,
       CAST(d.n_dau * 1000000 // m.n_mau28 AS BIGINT) AS stickiness_ppm
FROM dau d JOIN mau m USING (day)
"""


def q_events_concurrency(spark, sf_dir):
    """Peak-concurrency profile — the sweep-line interval-overlap count
    every capacity planner needs (max simultaneous sessions/fetches per
    hour): each event opens an interval [ts, ts + dur], the sweep
    emits +1 at starts and -1 at ends, a single global-order running
    sum IS the live concurrency, and the per-hour census reports its
    max. Ends sort before starts at equal timestamps (touching
    intervals are NOT concurrent) — the tie rule both engines state
    identically.

    Exactness: integer epoch seconds, deterministic (t, delta,
    event_id) total order, integer running sum.

    Plan/scale: the sweep's running sum is seq.with_global_running_sum
    — the hierarchical prefix decomposition (range-partition sort,
    per-partition deltas, broadcast base offsets) IS the registered
    plan, so no single-partition window at any scale (round-4 verdict
    item #2); the per-hour census is one groupBy."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_timestamp("ts").cast("long").alias("s"))
    iv = ev.select("event_id", "s",
                   (F.col("s") + 60 + F.col("event_id") % 3600)
                   .alias("e"))
    pts = (iv.select(F.col("s").alias("t"), F.lit(1).alias("delta"),
                     "event_id")
           .unionByName(iv.select(F.col("e").alias("t"),
                                  F.lit(-1).alias("delta"), "event_id")))
    run = SEQ.with_global_running_sum(
        pts, [F.asc("t"), F.asc("delta"), F.asc("event_id")],
        "delta", "live")
    return (run.withColumn("hour", F.expr("t DIV 3600").cast("long"))
            .groupBy("hour")
            .agg(F.max("live").cast("long").alias("peak_live"),
                 F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
                 .cast("long").alias("n_starts")))


ORACLE_EVENTS_CONCURRENCY = """
WITH ev AS (
  SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS s FROM events),
iv AS (
  SELECT event_id, s, s + 60 + event_id % 3600 AS e FROM ev),
pts AS (
  SELECT s AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT e, -1, event_id FROM iv),
run AS (
  SELECT t, delta,
         sum(delta) OVER (ORDER BY t ASC, delta ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS live
  FROM pts)
SELECT t // 3600 AS hour, CAST(max(live) AS BIGINT) AS peak_live,
       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_starts
FROM run GROUP BY 1
"""


def q_events_burstiness(spark, sf_dir):
    """Per-user inter-arrival BURSTINESS (Goh & Barabási's
    B = (σ−μ)/(σ+μ) over the gap distribution) — the traffic-shape
    classifier behind bot/scanner triage and crawl-rate prediction:
    B → -1 is metronome-periodic (monitoring probes), B ≈ 0 is
    Poisson (organic), B → +1 is heavy-burst (humans, incidents).
    Users need >= 3 events (>= 2 gaps); σ is the population std
    computed exactly from integer second-gaps via the
    sqrt(n·S2 − S1²)/n closed form, so both engines agree to the
    6-dp round.

    Plan/scale: one per-user window lag (the sessionize shuffle
    shape — partition by the high-cardinality user key, no skew),
    then one map-side-combinable groupBy; gaps are BIGINT seconds
    (micros DIV 1e6) so S2 can't overflow at any realistic horizon.
    """
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    # unix_micros rejects TIMESTAMP_NTZ on Spark 4; session tz is UTC so
    # the cast is exact (same convention as events_ohlc)
    g = (ev.withColumn("us", F.unix_micros(F.col("ts").cast("timestamp")))
         .withColumn("gap_s", F.expr(
             "(us - lag(us) OVER (PARTITION BY user_id ORDER BY us))"
             " DIV 1000000"))
         .filter(F.col("gap_s").isNotNull()))
    agg = (g.groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n_gaps"),
                F.sum("gap_s").cast("long").alias("s1"),
                F.sum(F.col("gap_s") * F.col("gap_s")).cast("long")
                .alias("s2"))
           .filter(F.col("n_gaps") >= 2))
    disc = F.sqrt((F.col("n_gaps") * F.col("s2")
                   - F.col("s1") * F.col("s1")).cast("double"))
    b = F.round((disc - F.col("s1")) / (disc + F.col("s1")), 6)
    return (agg.select(
        "user_id", "n_gaps",
        F.round(F.col("s1") / F.col("n_gaps"), 3).alias("mean_gap_s"),
        b.alias("burstiness"))
        .withColumn("traffic_class",
                    F.when(F.col("burstiness") < -0.1, F.lit("periodic"))
                    .when(F.col("burstiness") > 0.1, F.lit("bursty"))
                    .otherwise(F.lit("poisson"))))


ORACLE_EVENTS_BURSTINESS = """
WITH g AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts))) // 1000000
           AS gap_s
  FROM events),
agg AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_s) AS BIGINT) AS s1,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
  FROM g WHERE gap_s IS NOT NULL GROUP BY user_id
  HAVING count(*) >= 2),
sc AS (
  SELECT user_id, n_gaps,
         round(CAST(s1 AS DOUBLE) / n_gaps, 3) AS mean_gap_s,
         round((sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) - s1)
               / (sqrt(CAST(n_gaps * s2 - s1 * s1 AS DOUBLE)) + s1), 6)
           AS burstiness
  FROM agg)
SELECT user_id, n_gaps, mean_gap_s, burstiness,
       CASE WHEN burstiness < -0.1 THEN 'periodic'
            WHEN burstiness > 0.1 THEN 'bursty'
            ELSE 'poisson' END AS traffic_class
FROM sc
"""


def q_events_cuped(spark, sf_dir):
    """CUPED variance reduction for the A/B lift row — the industry-
    standard adjustment (Deng et al., WSDM'13) events_ab_lift lacks:
    per user, X = pre-period spend (before 2024-01-15) and Y =
    post-period spend; theta = cov(X,Y)/var(X) pooled across arms;
    the adjusted outcome Y' = Y − theta·(X − E[X]) has the same mean
    but strictly lower variance when X predicts Y, tightening the
    experiment's CI at zero cost. Emits per-arm (user_id % 2) raw
    and adjusted means plus the pooled theta and the variance-
    reduction ppm.

    Exactness: spend is integer cents; theta and the adjusted means
    are closed-form ratios of exact integer sums (n·Sxy − Sx·Sy over
    n·Sxx − Sx²), so both engines compute identical doubles before
    the final round.

    Plan/scale: one per-user groupBy (map-side combinable), one
    broadcast of the 1-row pooled-stats frame, one 2-group agg —
    no per-user window, no skew."""
    cut = 19737  # epoch days: 2024-01-15
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    per_u = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("day") < cut, F.col("cents"))
                        .otherwise(F.lit(0))).cast("long").alias("x"),
                  F.sum(F.when(F.col("day") >= cut, F.col("cents"))
                        .otherwise(F.lit(0))).cast("long").alias("y"))
             .withColumn("grp", (F.col("user_id") % 2).cast("int")))
    stats = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"))
    j = per_u.crossJoin(F.broadcast(stats))
    theta = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             .cast("double")
             / (F.col("n") * F.col("sxx")
                - F.col("sx") * F.col("sx")).cast("double"))
    mean_x = F.col("sx").cast("double") / F.col("n")
    var_y = ((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
             .cast("double")
             / (F.col("n").cast("double") * F.col("n")))
    # var(Y') = var(Y) - theta^2 var(X); reduction ppm = theta^2varX/varY
    var_x = ((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
             .cast("double")
             / (F.col("n").cast("double") * F.col("n")))
    adj = F.col("y") - theta * (F.col("x") - mean_x)
    return (j.withColumn("yadj", adj)
            .withColumn("theta", theta)
            .withColumn("vr", theta * theta * var_x / var_y)
            .groupBy("grp")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.round(F.avg(F.col("y").cast("double")), 3)
                 .alias("mean_y"),
                 F.round(F.avg("yadj"), 3).alias("mean_y_adj"),
                 F.round(F.first("theta"), 6).alias("theta"),
                 (F.round(F.first("vr") * 1000000).cast("long"))
                 .alias("var_reduction_ppm")))


ORACLE_EVENTS_CUPED = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day < 19737 THEN cents ELSE 0 END) AS BIGINT)
           AS x,
         CAST(sum(CASE WHEN day >= 19737 THEN cents ELSE 0 END) AS BIGINT)
           AS y,
         CAST(user_id % 2 AS INT) AS grp
  FROM ev GROUP BY user_id),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pu),
c AS (
  SELECT pu.grp, pu.y,
         pu.y - (CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(n * sxx - sx * sx AS DOUBLE))
              * (pu.x - CAST(sx AS DOUBLE) / n) AS yadj,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
         (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE))
         * (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE))
         * (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * n))
         / (CAST(n * syy - sy * sy AS DOUBLE) / (CAST(n AS DOUBLE) * n))
           AS vr
  FROM pu CROSS JOIN st)
SELECT grp, CAST(count(*) AS BIGINT) AS n_users,
       round(avg(CAST(y AS DOUBLE)), 3) AS mean_y,
       round(avg(yadj), 3) AS mean_y_adj,
       round(any_value(theta), 6) AS theta,
       CAST(round(any_value(vr) * 1000000) AS BIGINT)
         AS var_reduction_ppm
FROM c GROUP BY grp
"""


def q_events_power_sample_size(spark, sf_dir):
    """A/B POWER ANALYSIS from observed variance — the planning row
    that pairs with events_ab_lift/events_cuped: given the measured
    per-user spend distribution, how many users per arm does a
    two-sided alpha=0.05, power=0.80 test need to detect a 1% / 2% /
    5% lift? n = ceil(2·(z_a + z_b)²·sigma² / delta²) with the
    standard normal constants (1.959964, 0.841621) — the classic
    two-sample closed form.

    Exactness: mean and population variance come from exact integer
    cent sums (n·S2 − S1² over n²); the z constants are fixed
    literals; both engines evaluate the identical double expression
    before ceil.

    Plan/scale: one per-user groupBy, one 1-row stats agg, a 3-row
    literal ladder joined to it — nothing scales with the event
    count but the first census."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    per_u = ev.groupBy("user_id").agg(
        F.sum("cents").cast("long").alias("spend"))
    st = per_u.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("spend").cast("long").alias("s1"),
        F.sum(F.col("spend") * F.col("spend")).cast("long").alias("s2"))
    lad = spark.range(1).select(
        F.explode(F.array(F.lit(10), F.lit(20), F.lit(50)))
        .alias("lift_pm"))  # per-mille lift targets: 1%, 2%, 5%
    j = lad.crossJoin(F.broadcast(st))
    mean = F.col("s1").cast("double") / F.col("n")
    var = ((F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
           .cast("double") / (F.col("n").cast("double") * F.col("n")))
    delta = mean * F.col("lift_pm").cast("double") / 1000.0
    zz = F.lit((1.959964 + 0.841621) ** 2)
    n_req = F.ceil(F.lit(2.0) * zz * var / (delta * delta)).cast("long")
    return j.select(
        F.col("lift_pm").cast("long").alias("lift_pm"),
        F.round(mean, 3).alias("mean_spend"),
        F.round(var, 3).alias("var_spend"),
        n_req.alias("n_per_arm"))


ORACLE_EVENTS_POWER_SAMPLE_SIZE = """
WITH pu AS (
  SELECT user_id,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS spend
  FROM events GROUP BY user_id),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(spend) AS BIGINT) AS s1,
         CAST(sum(spend * spend) AS BIGINT) AS s2
  FROM pu),
lad AS (SELECT unnest([10, 20, 50]) AS lift_pm)
SELECT CAST(lift_pm AS BIGINT) AS lift_pm,
       round(CAST(s1 AS DOUBLE) / n, 3) AS mean_spend,
       round(CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n), 3)
         AS var_spend,
       CAST(ceil(2.0 * ((1.959964 + 0.841621) * (1.959964 + 0.841621))
            * (CAST(n * s2 - s1 * s1 AS DOUBLE) / (CAST(n AS DOUBLE) * n))
            / ((CAST(s1 AS DOUBLE) / n * lift_pm / 1000.0)
               * (CAST(s1 AS DOUBLE) / n * lift_pm / 1000.0)))
            AS BIGINT) AS n_per_arm
FROM lad CROSS JOIN st
"""


def q_events_markov_entropy(spark, sf_dir):
    """Per-state ENTROPY of the behavior Markov chain — the
    predictability metric events_markov's raw matrix doesn't give:
    for each source state, H_i = −Σ p·log2(p) over its successor
    distribution (0 bits = deterministic next step, log2(k) =
    uniform chaos), the normalized H/log2(n_succ), and the state's
    share of all transitions — together the weighted entropy rate
    of the chain, the standard bot-vs-human and cache-predictor
    feature.

    Exactness: p = n/tot from exact integer counts; per-state sums
    run over <= |event_types| terms so the 4-dp round absorbs float
    association; log2 via ln/ln(2) in both engines.

    Plan/scale: the same lag window as events_markov (partition by
    user), then two tiny groupBys on the O(types²) matrix."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                            "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.withColumn("prev_type", F.lag("event_type").over(w))
             .filter(F.col("prev_type").isNotNull()))
    c = (pairs.groupBy("prev_type", "event_type")
         .agg(F.count(F.lit(1)).cast("long").alias("n")))
    t = (c.groupBy("prev_type")
         .agg(F.sum("n").cast("long").alias("tot"),
              F.count(F.lit(1)).cast("long").alias("n_succ")))
    j = c.join(t, "prev_type")
    term = ((F.col("n").cast("double") / F.col("tot"))
            * (F.log(F.col("tot").cast("double"))
               - F.log(F.col("n").cast("double"))) / F.log(F.lit(2.0)))
    per = (j.withColumn("term", term)
           .groupBy("prev_type")
           .agg(F.first("tot").alias("tot"),
                F.first("n_succ").alias("n_succ"),
                F.round(F.sum("term"), 4).alias("h_bits")))
    gt = per.agg(F.sum("tot").cast("long").alias("grand"))
    return (per.crossJoin(F.broadcast(gt))
            .select("prev_type", F.col("tot").alias("n_trans"),
                    "n_succ", "h_bits",
                    F.when(F.col("n_succ") > 1,
                           F.round(F.col("h_bits")
                                   / (F.log(F.col("n_succ")
                                            .cast("double"))
                                      / F.log(F.lit(2.0))), 4))
                    .otherwise(F.lit(0.0)).alias("h_norm"),
                    F.expr("tot * 1000000 DIV grand").cast("long")
                    .alias("weight_ppm")))


ORACLE_EVENTS_MARKOV_ENTROPY = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events),
c AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY prev_type, event_type),
t AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot,
         CAST(count(*) AS BIGINT) AS n_succ
  FROM c GROUP BY prev_type),
per AS (
  SELECT c.prev_type, any_value(t.tot) AS tot,
         any_value(t.n_succ) AS n_succ,
         round(sum((CAST(c.n AS DOUBLE) / t.tot)
                   * (ln(CAST(t.tot AS DOUBLE)) - ln(CAST(c.n AS DOUBLE)))
                   / ln(2.0)), 4) AS h_bits
  FROM c JOIN t USING (prev_type) GROUP BY c.prev_type)
SELECT prev_type, tot AS n_trans, n_succ, h_bits,
       CASE WHEN n_succ > 1
            THEN round(h_bits / (ln(CAST(n_succ AS DOUBLE)) / ln(2.0)), 4)
            ELSE 0.0 END AS h_norm,
       CAST(tot * 1000000 // (SELECT sum(tot) FROM per) AS BIGINT)
         AS weight_ppm
FROM per
"""


def q_events_trend_mk(spark, sf_dir):
    """MANN-KENDALL trend test on daily traffic — the nonparametric
    answer to 'is this host's activity actually trending or just
    noisy?' that the change-point row (a single break) can't give:
    S = Σ sign(x_j − x_i) over all ordered day pairs, Var(S) =
    n(n−1)(2n+5)/18 (no ties correction — day counts rarely tie,
    and the convention is pinned), z = (S∓1)/sqrt(Var) with the
    standard continuity correction, verdict at |z| >= 1.96. Per
    event_type, so marketing can see signups trending while errors
    hold flat.

    Exactness: S and Var(S) are exact integers; z is one double
    division rounded 4 dp.

    Plan/scale: daily counts first (the census shrinks 10^10 events
    to n_types×n_days rows), THEN the O(days²) pair join runs on
    the tiny aggregate — never on raw events."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day")))
    daily = (ev.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    a, b = daily.alias("a"), daily.alias("b")
    pairs = (a.join(b, (F.col("a.event_type") == F.col("b.event_type"))
                    & (F.col("a.day") < F.col("b.day")))
             .select(F.col("a.event_type").alias("event_type"),
                     F.signum((F.col("b.n") - F.col("a.n"))
                              .cast("double")).cast("long").alias("sgn")))
    s = (pairs.groupBy("event_type")
         .agg(F.sum("sgn").cast("long").alias("s_stat")))
    nd = (daily.groupBy("event_type")
          .agg(F.count(F.lit(1)).cast("long").alias("n_days")))
    j = s.join(nd, "event_type")
    var = (F.col("n_days") * (F.col("n_days") - 1)
           * (2 * F.col("n_days") + 5) / 18.0)
    z = (F.when(F.col("s_stat") > 0,
                (F.col("s_stat") - 1) / F.sqrt(var))
         .when(F.col("s_stat") < 0,
               (F.col("s_stat") + 1) / F.sqrt(var))
         .otherwise(F.lit(0.0)))
    return (j.withColumn("z", F.round(z, 4))
            .withColumn("trend",
                        F.when(F.col("z") >= 1.96, F.lit("increasing"))
                        .when(F.col("z") <= -1.96, F.lit("decreasing"))
                        .otherwise(F.lit("no-trend")))
            .select("event_type", "n_days", "s_stat", "z", "trend"))


ORACLE_EVENTS_TREND_MK = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
p AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.n > a.n THEN 1
                       WHEN b.n < a.n THEN -1 ELSE 0 END) AS BIGINT)
           AS s_stat
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY a.event_type),
nd AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type),
j AS (
  SELECT p.event_type, nd.n_days, p.s_stat,
         round(CASE WHEN p.s_stat > 0 THEN
                 (p.s_stat - 1) / sqrt(nd.n_days * (nd.n_days - 1)
                                       * (2 * nd.n_days + 5) / 18.0)
               WHEN p.s_stat < 0 THEN
                 (p.s_stat + 1) / sqrt(nd.n_days * (nd.n_days - 1)
                                       * (2 * nd.n_days + 5) / 18.0)
               ELSE 0.0 END, 4) AS z
  FROM p JOIN nd USING (event_type))
SELECT event_type, n_days, s_stat, z,
       CASE WHEN z >= 1.96 THEN 'increasing'
            WHEN z <= -1.96 THEN 'decreasing'
            ELSE 'no-trend' END AS trend
FROM j
"""


def q_events_benford(spark, sf_dir):
    """BENFORD first-digit conformance test on transaction values —
    the classic fabricated-data screen (naturally occurring
    multi-scale amounts follow P(d) = log10(1 + 1/d); synthetic or
    manipulated streams don't): per event_type, the observed
    first-significant-digit distribution in exact ppm against the
    Benford expectation, the chi-square statistic over the 9 digit
    cells, and the conformance verdict at the 0.05 critical value
    (15.507 for 8 df).

    Exactness: first digit via string head of the integer cents
    (no float log); expected ppm are fixed integer literals of
    round(log10(1+1/d)·1e6); chi2 is a 9-term double sum rounded 4dp.

    Plan/scale: one groupBy(event_type, digit) census + one 9-row
    combine per type — nothing scales past the first census."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents"))
          .filter(F.col("cents") > 0))
    d1 = F.substring(F.col("cents").cast("string"), 1, 1).cast("int")
    cen = (ev.withColumn("digit", d1)
           .groupBy("event_type", "digit")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    tot = (cen.groupBy("event_type")
           .agg(F.sum("n").cast("long").alias("tot")))
    import math as _m
    exp_ppm = {d: round(_m.log10(1 + 1 / d) * 10**6) for d in range(1, 10)}
    exp_col = F.create_map(
        *[x for d, p in exp_ppm.items()
          for x in (F.lit(d), F.lit(p))])[F.col("digit")]
    j = (cen.join(tot, "event_type")
         .withColumn("obs_ppm",
                     F.expr("n * 1000000 DIV tot").cast("long"))
         .withColumn("exp_ppm", exp_col.cast("long")))
    chi_term = ((F.col("n").cast("double")
                 - F.col("exp_ppm") * F.col("tot") / 1e6)
                * (F.col("n").cast("double")
                   - F.col("exp_ppm") * F.col("tot") / 1e6)
                / (F.col("exp_ppm") * F.col("tot") / 1e6))
    per = (j.withColumn("term", chi_term)
           .groupBy("event_type")
           .agg(F.first("tot").alias("n_values"),
                F.count(F.lit(1)).cast("long").alias("n_digits"),
                F.round(F.sum("term"), 4).alias("chi2")))
    return (per.withColumn("benford_ok",
                           (F.col("chi2") <= 15.507).cast("int"))
            .select("event_type", "n_values", "n_digits", "chi2",
                    "benford_ok"))


ORACLE_EVENTS_BENFORD = _benford_oracle()


def q_events_autocorr(spark, sf_dir):
    """Lag-1 AUTOCORRELATION of daily traffic — the serial-dependence
    gauge that separates momentum (today predicts tomorrow: caching
    and capacity pre-provisioning pay off) from white noise (they
    don't), and the companion the Mann-Kendall row needs (MK assumes
    independent observations; high lag-1 r inflates its false-
    positive rate). Per event_type: Pearson r between consecutive
    day counts, from exact integer sums over the (x_t, x_{t+1})
    pair series, rounded 4 dp, with the |r| > 0.3 dependence flag.

    Plan/scale: daily census first, one per-type lag window over
    n_days rows, one closed-form agg — raw events shuffle once."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day")))
    daily = (ev.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = (daily.withColumn("nxt", F.lead("n").over(w))
              .filter(F.col("nxt").isNotNull()))
    agg = (lagged.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("m"),
                F.sum("n").cast("long").alias("sx"),
                F.sum("nxt").cast("long").alias("sy"),
                F.sum(F.col("n") * F.col("n")).cast("long").alias("sxx"),
                F.sum(F.col("nxt") * F.col("nxt")).cast("long")
                .alias("syy"),
                F.sum(F.col("n") * F.col("nxt")).cast("long")
                .alias("sxy")))
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    den = F.sqrt((F.col("m") * F.col("sxx")
                  - F.col("sx") * F.col("sx")).cast("double")
                 * (F.col("m") * F.col("syy")
                    - F.col("sy") * F.col("sy")).cast("double"))
    return (agg.withColumn("r1", F.round(num / den, 4))
            .withColumn("is_dependent",
                        (F.abs(F.col("r1")) > 0.3).cast("int"))
            .select("event_type", F.col("m").alias("n_pairs"), "r1",
                    "is_dependent"))


ORACLE_EVENTS_AUTOCORR = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
lagged AS (
  SELECT event_type, n,
         lead(n) OVER (PARTITION BY event_type ORDER BY day) AS nxt
  FROM daily),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS m,
         CAST(sum(n) AS BIGINT) AS sx, CAST(sum(nxt) AS BIGINT) AS sy,
         CAST(sum(n * n) AS BIGINT) AS sxx,
         CAST(sum(nxt * nxt) AS BIGINT) AS syy,
         CAST(sum(n * nxt) AS BIGINT) AS sxy
  FROM lagged WHERE nxt IS NOT NULL GROUP BY event_type)
SELECT event_type, m AS n_pairs,
       round(CAST(m * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                    * CAST(m * syy - sy * sy AS DOUBLE)), 4) AS r1,
       CAST(CASE WHEN abs(CAST(m * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                    * CAST(m * syy - sy * sy AS DOUBLE))) > 0.3
            THEN 1 ELSE 0 END AS INT) AS is_dependent
FROM agg
"""


def q_events_ltv_triangle(spark, sf_dir):
    """Cohort LTV TRIANGLE — the finance-side companion to
    events_retention's activity triangle: users cohort by first-seen
    week, and each (cohort, age-in-weeks) cell reports the
    cumulative spend per cohort user in exact centi-cents — the
    table LTV forecasting reads its early-signal multipliers off
    (week-1 spend × the historical w1→w12 ratio). Cumulation runs
    over the week axis inside each cohort.

    Exactness: spend in integer cents; cumulative sums are exact;
    the per-user normalization is integer DIV against the FIXED
    cohort size (users who never return still divide — that's the
    definition of per-cohort-user LTV).

    Plan/scale: first-seen via one min-agg (no window over raw
    events), cells via one groupBy, the cumsum window runs over
    O(weeks²) triangle cells only."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_timestamp(ts) DIV 604800").alias("week"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    first = (ev.groupBy("user_id")
             .agg(F.min("week").alias("cohort_week")))
    sized = (first.groupBy("cohort_week")
             .agg(F.count(F.lit(1)).cast("long").alias("cohort_size")))
    j = ev.join(first, "user_id")
    cells = (j.withColumn("age", (F.col("week") - F.col("cohort_week"))
                          .cast("long"))
             .groupBy("cohort_week", "age")
             .agg(F.sum("cents").cast("long").alias("spend")))
    w = Window.partitionBy("cohort_week").orderBy("age")
    cum = cells.withColumn("cum_spend",
                           F.sum("spend").over(w).cast("long"))
    return (cum.join(sized, "cohort_week")
            .withColumn("ltv_centicents",
                        F.expr("cum_spend * 100 DIV cohort_size")
                        .cast("long"))
            .select("cohort_week", "age", "cohort_size", "spend",
                    "cum_spend", "ltv_centicents"))


ORACLE_EVENTS_LTV_TRIANGLE = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
first AS (
  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id),
sized AS (
  SELECT cohort_week, CAST(count(*) AS BIGINT) AS cohort_size
  FROM first GROUP BY cohort_week),
cells AS (
  SELECT f.cohort_week, CAST(e.week - f.cohort_week AS BIGINT) AS age,
         CAST(sum(e.cents) AS BIGINT) AS spend
  FROM ev e JOIN first f USING (user_id)
  GROUP BY f.cohort_week, e.week - f.cohort_week),
cum AS (
  SELECT cohort_week, age, spend,
         CAST(sum(spend) OVER (PARTITION BY cohort_week ORDER BY age)
              AS BIGINT) AS cum_spend
  FROM cells)
SELECT c.cohort_week, c.age, s.cohort_size, c.spend, c.cum_spend,
       CAST(c.cum_spend * 100 // s.cohort_size AS BIGINT)
         AS ltv_centicents
FROM cum c JOIN sized s USING (cohort_week)
"""


def q_events_simpson_audit(spark, sf_dir):
    """SIMPSON'S-PARADOX audit on the A/B comparison — the sanity
    check that catches the classic aggregation trap (treatment wins
    overall but loses in EVERY segment because arm assignment
    correlates with segment mix): per segment (user activity tier),
    each arm's conversion rate in exact ppm and the segment-level
    winner; then the aggregate winner; paradox flagged when the
    aggregate winner loses every populated segment.

    Exactness: conversion = purchase-event share, integer counts,
    rates in exact ppm; winners by integer cross-multiplication
    (n_a·conv_b vs n_b·conv_a — no float division at all).

    Plan/scale: two census groupBys (segment×arm, then segment) —
    the same shape as events_ab_lift; the paradox flag joins a
    1-row aggregate frame."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id", "event_id",
                  (F.col("event_type") == "purchase").cast("int")
                  .alias("conv")))
    per_u = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.sum("conv").cast("long").alias("n_conv")))
    seg = (F.when(F.col("n_ev") >= 70, F.lit("heavy"))
           .when(F.col("n_ev") >= 40, F.lit("mid"))
           .otherwise(F.lit("light")))
    arm = (F.col("user_id") % 2).cast("int")
    tagged = per_u.withColumn("segment", seg).withColumn("arm", arm)
    cells = (tagged.groupBy("segment", "arm")
             .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                  F.sum("n_ev").cast("long").alias("n_ev"),
                  F.sum("n_conv").cast("long").alias("n_conv")))
    a = cells.filter(F.col("arm") == 0).select(
        "segment", F.col("n_users").alias("users_a"),
        F.col("n_ev").alias("ev_a"), F.col("n_conv").alias("conv_a"))
    b = cells.filter(F.col("arm") == 1).select(
        "segment", F.col("n_users").alias("users_b"),
        F.col("n_ev").alias("ev_b"), F.col("n_conv").alias("conv_b"))
    j = a.join(b, "segment")
    seg_win = (F.when(F.col("conv_a") * F.col("ev_b")
                      > F.col("conv_b") * F.col("ev_a"), F.lit("a"))
               .when(F.col("conv_a") * F.col("ev_b")
                     < F.col("conv_b") * F.col("ev_a"), F.lit("b"))
               .otherwise(F.lit("tie")))
    per_seg = (j.withColumn("rate_a_ppm",
                            F.expr("conv_a * 1000000 DIV ev_a")
                            .cast("long"))
               .withColumn("rate_b_ppm",
                           F.expr("conv_b * 1000000 DIV ev_b")
                           .cast("long"))
               .withColumn("seg_winner", seg_win))
    agg = per_seg.agg(
        F.sum("conv_a").cast("long").alias("ca"),
        F.sum("ev_a").cast("long").alias("ea"),
        F.sum("conv_b").cast("long").alias("cb"),
        F.sum("ev_b").cast("long").alias("eb"),
        F.sum((F.col("seg_winner") == "a").cast("int")).cast("long")
        .alias("segs_a"),
        F.sum((F.col("seg_winner") == "b").cast("int")).cast("long")
        .alias("segs_b"),
        F.count(F.lit(1)).cast("long").alias("n_segs"))
    agg_win = (F.when(F.col("ca") * F.col("eb")
                      > F.col("cb") * F.col("ea"), F.lit("a"))
               .when(F.col("ca") * F.col("eb")
                     < F.col("cb") * F.col("ea"), F.lit("b"))
               .otherwise(F.lit("tie")))
    agg = agg.withColumn("agg_winner", agg_win)
    paradox = (((F.col("agg_winner") == "a")
                & (F.col("segs_a") == 0) & (F.col("segs_b")
                                            == F.col("n_segs")))
               | ((F.col("agg_winner") == "b")
                  & (F.col("segs_b") == 0)
                  & (F.col("segs_a") == F.col("n_segs")))).cast("int")
    return (per_seg.crossJoin(F.broadcast(
        agg.select("agg_winner", paradox.alias("is_paradox"))))
        .select("segment", "users_a", "ev_a", "conv_a", "rate_a_ppm",
                "users_b", "ev_b", "conv_b", "rate_b_ppm",
                "seg_winner", "agg_winner", "is_paradox"))


ORACLE_EVENTS_SIMPSON_AUDIT = """
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_conv
  FROM events GROUP BY user_id),
tagged AS (
  SELECT CASE WHEN n_ev >= 70 THEN 'heavy'
              WHEN n_ev >= 40 THEN 'mid'
              ELSE 'light' END AS segment,
         CAST(user_id % 2 AS INT) AS arm, n_ev, n_conv
  FROM pu),
cells AS (
  SELECT segment, arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n_ev) AS BIGINT) AS n_ev,
         CAST(sum(n_conv) AS BIGINT) AS n_conv
  FROM tagged GROUP BY segment, arm),
j AS (
  SELECT a.segment,
         a.n_users AS users_a, a.n_ev AS ev_a, a.n_conv AS conv_a,
         b.n_users AS users_b, b.n_ev AS ev_b, b.n_conv AS conv_b
  FROM (SELECT * FROM cells WHERE arm = 0) a
  JOIN (SELECT * FROM cells WHERE arm = 1) b USING (segment)),
ps AS (
  SELECT *, CAST(conv_a * 1000000 // ev_a AS BIGINT) AS rate_a_ppm,
         CAST(conv_b * 1000000 // ev_b AS BIGINT) AS rate_b_ppm,
         CASE WHEN conv_a * ev_b > conv_b * ev_a THEN 'a'
              WHEN conv_a * ev_b < conv_b * ev_a THEN 'b'
              ELSE 'tie' END AS seg_winner
  FROM j),
agg AS (
  SELECT sum(conv_a) AS ca, sum(ev_a) AS ea,
         sum(conv_b) AS cb, sum(ev_b) AS eb,
         sum(CASE WHEN seg_winner = 'a' THEN 1 ELSE 0 END) AS segs_a,
         sum(CASE WHEN seg_winner = 'b' THEN 1 ELSE 0 END) AS segs_b,
         count(*) AS n_segs
  FROM ps),
aw AS (
  SELECT CASE WHEN ca * eb > cb * ea THEN 'a'
              WHEN ca * eb < cb * ea THEN 'b'
              ELSE 'tie' END AS agg_winner,
         CAST(CASE WHEN (ca * eb > cb * ea AND segs_a = 0
                         AND segs_b = n_segs)
                     OR (ca * eb < cb * ea AND segs_b = 0
                         AND segs_a = n_segs)
                   THEN 1 ELSE 0 END AS INT) AS is_paradox
  FROM agg)
SELECT segment, users_a, ev_a, conv_a, rate_a_ppm,
       users_b, ev_b, conv_b, rate_b_ppm,
       seg_winner, agg_winner, is_paradox
FROM ps CROSS JOIN aw
"""


def q_events_entry_exit(spark, sf_dir):
    """Session ENTRY/EXIT page census — the classic web-analytics
    pair the sessionizer feeds (which event type opens sessions
    tells you where traffic lands; which one closes them tells you
    where it leaks): sessions cut at 30-minute idle gaps (the
    events_sessionize convention), then per event_type: how often
    it is a session's FIRST event, its LAST, a census of
    single-event (bounce) sessions it constitutes, and the
    entry/exit shares in exact ppm of all sessions.

    Plan/scale: the standard per-user lag window builds session
    ids, one first/last extraction via min/max on (ts, event_id)
    struct ordering, one census groupBy — raw events shuffle once
    by user, sessions once by type."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id", "event_id", "event_type",
                  F.expr("unix_timestamp(ts)").cast("long").alias("es")))
    w = Window.partitionBy("user_id").orderBy("es", "event_id")
    g = (ev.withColumn("prev", F.lag("es").over(w))
         .withColumn("new_sess",
                     ((F.col("prev").isNull())
                      | (F.col("es") - F.col("prev") > 1800))
                     .cast("int"))
         .withColumn("sess_no", F.sum("new_sess").over(
             w.rowsBetween(Window.unboundedPreceding, 0))))
    sid = F.concat(F.col("user_id").cast("string"), F.lit("#"),
                   F.col("sess_no").cast("string"))
    sess = (g.withColumn("sid", sid)
            .groupBy("sid")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.min(F.struct("es", "event_id", "event_type"))
                 .alias("first"),
                 F.max(F.struct("es", "event_id", "event_type"))
                 .alias("last")))
    tot = sess.agg(F.count(F.lit(1)).cast("long").alias("n_sessions"))
    entries = (sess.select(F.col("first.event_type").alias("event_type"),
                           (F.col("n_events") == 1).cast("int")
                           .alias("bounce"))
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("long").alias("n_entry"),
                    F.sum("bounce").cast("long").alias("n_bounce")))
    exits = (sess.groupBy(F.col("last.event_type").alias("event_type"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_exit")))
    j = (entries.join(exits, "event_type", "full")
         .na.fill(0, ["n_entry", "n_bounce", "n_exit"]))
    return (j.crossJoin(F.broadcast(tot))
            .withColumn("entry_ppm",
                        F.expr("n_entry * 1000000 DIV n_sessions")
                        .cast("long"))
            .withColumn("exit_ppm",
                        F.expr("n_exit * 1000000 DIV n_sessions")
                        .cast("long"))
            .select("event_type", "n_entry", "n_exit", "n_bounce",
                    "entry_ppm", "exit_ppm"))


ORACLE_EVENTS_ENTRY_EXIT = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS es
  FROM events),
g AS (
  SELECT *, CASE WHEN prev IS NULL OR es - prev > 1800 THEN 1 ELSE 0 END
           AS new_sess
  FROM (SELECT *, lag(es) OVER (PARTITION BY user_id
                                ORDER BY es, event_id) AS prev
        FROM ev)),
s AS (
  SELECT *, CAST(user_id AS VARCHAR) || '#' || CAST(
             sum(new_sess) OVER (PARTITION BY user_id
                                 ORDER BY es, event_id
                                 ROWS UNBOUNDED PRECEDING) AS VARCHAR)
           AS sid
  FROM g),
sess AS (
  SELECT sid, CAST(count(*) AS BIGINT) AS n_events,
         min(struct_pack(es := es, event_id := event_id,
                         event_type := event_type)) AS first,
         max(struct_pack(es := es, event_id := event_id,
                         event_type := event_type)) AS last
  FROM s GROUP BY sid),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_sessions FROM sess),
entries AS (
  SELECT first.event_type AS event_type,
         CAST(count(*) AS BIGINT) AS n_entry,
         CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounce
  FROM sess GROUP BY first.event_type),
exits AS (
  SELECT last.event_type AS event_type,
         CAST(count(*) AS BIGINT) AS n_exit
  FROM sess GROUP BY last.event_type)
SELECT coalesce(e.event_type, x.event_type) AS event_type,
       CAST(coalesce(e.n_entry, 0) AS BIGINT) AS n_entry,
       CAST(coalesce(x.n_exit, 0) AS BIGINT) AS n_exit,
       CAST(coalesce(e.n_bounce, 0) AS BIGINT) AS n_bounce,
       CAST(coalesce(e.n_entry, 0) * 1000000 // tot.n_sessions
            AS BIGINT) AS entry_ppm,
       CAST(coalesce(x.n_exit, 0) * 1000000 // tot.n_sessions
            AS BIGINT) AS exit_ppm
FROM entries e FULL JOIN exits x USING (event_type) CROSS JOIN tot
"""


def q_events_qini_curve(spark, sf_dir):
    """QINI / uplift-by-decile curve — the standard evaluation for
    any targeting model (does the model's top decile actually show
    more treatment lift than the bottom?): users are ranked by a
    deterministic model score, cut into 10 deciles by exact
    nearest-rank, and each decile reports treatment vs control
    conversion in exact ppm, the decile lift, and the cumulative
    qini numerator (conv_t·N_c − conv_c·N_t scaled) that the area-
    under-qini reads off.

    Exactness: deciles via integer rank math ((rank−1)·10 DIV n);
    all rates exact ppm; the qini term is pure integer cross-
    multiplication.

    Plan/scale: one per-user census, one rank window over users
    (at 10^10 users: pre-aggregate to score histograms), one
    decile groupBy + one cumsum over 10 rows."""
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  (F.col("event_type") == "purchase").cast("int")
                  .alias("conv")))
    per_u = (ev.groupBy("user_id")
             .agg(F.count(F.lit(1)).cast("long").alias("n_ev"),
                  F.max("conv").cast("long").alias("converted")))
    score = ((F.col("user_id") * 61 + F.col("n_ev") * 17) % 1000) \
        .cast("long")
    arm = (F.col("user_id") % 2).cast("int")
    t = per_u.withColumn("score", score).withColumn("arm", arm)
    wr = Window.orderBy(F.col("score").desc(), F.col("user_id").asc())
    nn = t.agg(F.count(F.lit(1)).cast("long").alias("n"))
    ranked = (t.withColumn("rnk", F.row_number().over(wr).cast("long"))
              .crossJoin(F.broadcast(nn))
              .withColumn("decile",
                          F.expr("(rnk - 1) * 10 DIV n").cast("long")))
    dec = (ranked.groupBy("decile")
           .agg(F.sum((F.col("arm") == 1).cast("int")).cast("long")
                .alias("n_t"),
                F.sum(((F.col("arm") == 1) & (F.col("converted") == 1))
                      .cast("int")).cast("long").alias("c_t"),
                F.sum((F.col("arm") == 0).cast("int")).cast("long")
                .alias("n_c"),
                F.sum(((F.col("arm") == 0) & (F.col("converted") == 1))
                      .cast("int")).cast("long").alias("c_c")))
    rate_t = F.when(F.col("n_t") > 0,
                    F.expr("c_t * 1000000 DIV n_t"))
    rate_c = F.when(F.col("n_c") > 0,
                    F.expr("c_c * 1000000 DIV n_c"))
    scored = (dec.withColumn("rate_t_ppm", rate_t.cast("long"))
              .withColumn("rate_c_ppm", rate_c.cast("long"))
              .withColumn("lift_ppm",
                          (rate_t - rate_c).cast("long"))
              .withColumn("qini_term",
                          (F.col("c_t") * F.col("n_c")
                           - F.col("c_c") * F.col("n_t")).cast("long")))
    wq = Window.orderBy("decile")
    return (scored.withColumn("qini_cum",
                              F.sum("qini_term").over(wq).cast("long"))
            .select("decile", "n_t", "c_t", "n_c", "c_c",
                    "rate_t_ppm", "rate_c_ppm", "lift_ppm", "qini_cum"))


ORACLE_EVENTS_QINI_CURVE = """
WITH pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
         CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS converted
  FROM events GROUP BY user_id),
t AS (
  SELECT user_id, converted,
         CAST((user_id * 61 + n_ev * 17) % 1000 AS BIGINT) AS score,
         CAST(user_id % 2 AS INT) AS arm
  FROM pu),
r AS (
  SELECT *, CAST(row_number() OVER (ORDER BY score DESC, user_id ASC)
                 AS BIGINT) AS rnk,
         (SELECT CAST(count(*) AS BIGINT) FROM t) AS n
  FROM t),
d AS (
  SELECT CAST((rnk - 1) * 10 // n AS BIGINT) AS decile,
         CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_t,
         CAST(sum(CASE WHEN arm = 1 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_t,
         CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_c,
         CAST(sum(CASE WHEN arm = 0 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c_c
  FROM r GROUP BY 1)
SELECT decile, n_t, c_t, n_c, c_c,
       CAST(CASE WHEN n_t > 0 THEN c_t * 1000000 // n_t END AS BIGINT)
         AS rate_t_ppm,
       CAST(CASE WHEN n_c > 0 THEN c_c * 1000000 // n_c END AS BIGINT)
         AS rate_c_ppm,
       CAST(CASE WHEN n_t > 0 AND n_c > 0
                 THEN c_t * 1000000 // n_t - c_c * 1000000 // n_c
            END AS BIGINT) AS lift_ppm,
       CAST(sum(c_t * n_c - c_c * n_t) OVER (ORDER BY decile)
            AS BIGINT) AS qini_cum
FROM d
"""


def q_events_seasonal_residual(spark, sf_dir):
    """Hour-of-day SEASONAL-RESIDUAL anomaly — the detector the
    plain z-score row misfires on (3am traffic is 'anomalously low'
    only if you ignore that 3am is always low): per (event_type,
    hour-of-day) cell, the mean daily count over the corpus day
    span in exact centi-events, the single worst day's count, and
    the anomaly flag when the peak runs >= 2x the cell's own
    seasonal baseline — deviation FROM the cycle, not from the
    global mean.

    Exactness: pure epoch integer arithmetic for day/hour; mean in
    centi via integer DIV over the full day span (absent days count
    as zero — that is the baseline's denominator by definition).

    Plan/scale: one (type, hour, day) census, one (type, hour)
    rollup — 24·|types| output rows at any scale."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  F.expr("unix_timestamp(ts) % 86400 DIV 3600")
                  .cast("long").alias("hour")))
    span = ev.agg((F.max("day") - F.min("day") + 1).cast("long")
                  .alias("span_days"))
    cell = (ev.groupBy("event_type", "hour", "day")
            .agg(F.count(F.lit(1)).cast("long").alias("n")))
    per = (cell.groupBy("event_type", "hour")
           .agg(F.sum("n").cast("long").alias("total"),
                F.max("n").cast("long").alias("peak"),
                F.count(F.lit(1)).cast("long").alias("n_days_active")))
    j = per.crossJoin(F.broadcast(span))
    return (j.withColumn("mean_centi",
                         F.expr("total * 100 DIV span_days")
                         .cast("long"))
            .withColumn("is_anomalous",
                        (F.col("peak") * 100
                         >= 2 * F.col("mean_centi")).cast("int"))
            .select("event_type", "hour", "total", "peak",
                    "n_days_active", "mean_centi", "is_anomalous"))


ORACLE_EVENTS_SEASONAL_RESIDUAL = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(floor(epoch(ts)) AS BIGINT) % 86400 // 3600 AS hour
  FROM events),
span AS (
  SELECT CAST(max(day) - min(day) + 1 AS BIGINT) AS span_days FROM ev),
cell AS (
  SELECT event_type, hour, day, CAST(count(*) AS BIGINT) AS n
  FROM ev GROUP BY event_type, hour, day),
per AS (
  SELECT event_type, hour, CAST(sum(n) AS BIGINT) AS total,
         CAST(max(n) AS BIGINT) AS peak,
         CAST(count(*) AS BIGINT) AS n_days_active
  FROM cell GROUP BY event_type, hour)
SELECT event_type, hour, total, peak, n_days_active,
       CAST(total * 100 // span.span_days AS BIGINT) AS mean_centi,
       CAST(CASE WHEN peak * 100 >= 2 * (total * 100 // span.span_days)
                 THEN 1 ELSE 0 END AS INT) AS is_anomalous
FROM per CROSS JOIN span
"""


def q_events_did(spark, sf_dir):
    """DIFFERENCE-IN-DIFFERENCES — the quasi-experimental estimator
    for launches without randomization (the treatment cohort chose
    itself; DiD removes both the cohort's level difference and the
    common time trend): per-user spend in the pre period (before
    2024-01-15) and post period, arms by user_id parity, and the
    2x2 table of per-user mean spend with the DiD estimate
    (T_post − T_pre) − (C_post − C_pre) in exact milli-cents
    (means via integer DIV against fixed arm sizes).

    Plan/scale: one per-user census with conditional sums, one
    2-row arm rollup, one 1-row estimate — nothing scales past the
    first groupBy."""
    cut = 19737
    ev = (_t(spark, sf_dir, "events")
          .select("user_id",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day"),
                  F.expr("CAST(round(value * 100) AS BIGINT)")
                  .alias("cents")))
    per_u = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.col("day") < cut, F.col("cents"))
                        .otherwise(F.lit(0))).cast("long").alias("pre"),
                  F.sum(F.when(F.col("day") >= cut, F.col("cents"))
                        .otherwise(F.lit(0))).cast("long")
                  .alias("post"))
             .withColumn("arm", (F.col("user_id") % 2).cast("int")))
    arms = (per_u.groupBy("arm")
            .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                 F.sum("pre").cast("long").alias("pre_cents"),
                 F.sum("post").cast("long").alias("post_cents")))
    m = (arms.withColumn("pre_mean_milli",
                         F.expr("pre_cents * 1000 DIV n_users")
                         .cast("long"))
         .withColumn("post_mean_milli",
                     F.expr("post_cents * 1000 DIV n_users")
                     .cast("long"))
         .withColumn("delta_milli",
                     (F.col("post_mean_milli")
                      - F.col("pre_mean_milli")).cast("long")))
    t = m.filter(F.col("arm") == 1).select(
        F.col("delta_milli").alias("dt"))
    c = m.filter(F.col("arm") == 0).select(
        F.col("delta_milli").alias("dc"))
    did = t.crossJoin(c).select(
        (F.col("dt") - F.col("dc")).cast("long").alias("did_milli"))
    return (m.crossJoin(F.broadcast(did))
            .select("arm", "n_users", "pre_mean_milli",
                    "post_mean_milli", "delta_milli", "did_milli"))


ORACLE_EVENTS_DID = """
WITH ev AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events),
pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN day < 19737 THEN cents ELSE 0 END)
              AS BIGINT) AS pre,
         CAST(sum(CASE WHEN day >= 19737 THEN cents ELSE 0 END)
              AS BIGINT) AS post,
         CAST(user_id % 2 AS INT) AS arm
  FROM ev GROUP BY user_id),
arms AS (
  SELECT arm, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(pre) AS BIGINT) AS pre_cents,
         CAST(sum(post) AS BIGINT) AS post_cents
  FROM pu GROUP BY arm),
m AS (
  SELECT arm, n_users,
         CAST(pre_cents * 1000 // n_users AS BIGINT) AS pre_mean_milli,
         CAST(post_cents * 1000 // n_users AS BIGINT)
           AS post_mean_milli
  FROM arms),
d AS (
  SELECT arm, n_users, pre_mean_milli, post_mean_milli,
         CAST(post_mean_milli - pre_mean_milli AS BIGINT)
           AS delta_milli
  FROM m),
did AS (
  SELECT CAST((SELECT delta_milli FROM d WHERE arm = 1)
              - (SELECT delta_milli FROM d WHERE arm = 0) AS BIGINT)
           AS did_milli)
SELECT arm, n_users, pre_mean_milli, post_mean_milli, delta_milli,
       did.did_milli
FROM d CROSS JOIN did
"""


def q_events_snaive_backtest(spark, sf_dir):
    """SEASONAL-NAIVE forecast backtest — the baseline every traffic
    forecaster must beat before it earns compute (predict day t with
    day t−7; if your model can't beat that, ship the lag): per
    event_type, the backtest over all days with a t−7 ancestor
    reports MAE in exact centi-events, MAPE in exact ppm, and the
    bias (mean signed error, centi) that says whether traffic is
    growing through the weekly cycle.

    Exactness: daily counts are integers; errors are integer
    |y − y_hat|; means via integer DIV against the backtest day
    count; MAPE terms are per-day integer ppm averaged by DIV.

    Plan/scale: daily census then ONE self-join on (type, day−7) —
    the as-of-lag shape; everything after runs on n_types×n_days
    rows."""
    ev = (_t(spark, sf_dir, "events")
          .select("event_type",
                  F.expr("unix_timestamp(ts) DIV 86400").alias("day")))
    daily = (ev.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    lag7 = daily.select("event_type",
                        (F.col("day") + 7).alias("day"),
                        F.col("n").alias("n_hat"))
    j = daily.join(lag7, ["event_type", "day"])
    scored = (j.withColumn("abs_err", F.abs(F.col("n") - F.col("n_hat"))
                           .cast("long"))
              .withColumn("sgn_err", (F.col("n") - F.col("n_hat"))
                          .cast("long"))
              .withColumn("ape_ppm",
                          F.expr("abs(n - n_hat) * 1000000 DIV n")
                          .cast("long")))
    return (scored.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.expr("sum(abs_err) * 100 DIV count(*)").cast("long")
                 .alias("mae_centi"),
                 F.expr("sum(ape_ppm) DIV count(*)").cast("long")
                 .alias("mape_ppm"),
                 F.expr("sum(sgn_err) * 100 DIV count(*)").cast("long")
                 .alias("bias_centi")))


ORACLE_EVENTS_SNAIVE_BACKTEST = """
WITH daily AS (
  SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, day),
j AS (
  SELECT a.event_type, a.n, b.n AS n_hat
  FROM daily a JOIN daily b
    ON b.event_type = a.event_type AND b.day = a.day - 7),
s AS (
  SELECT event_type, abs(n - n_hat) AS abs_err, n - n_hat AS sgn_err,
         abs(n - n_hat) * 1000000 // n AS ape_ppm
  FROM j)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       CAST(sum(abs_err) * 100 // count(*) AS BIGINT) AS mae_centi,
       CAST(sum(ape_ppm) // count(*) AS BIGINT) AS mape_ppm,
       CAST(sum(sgn_err) * 100 // count(*) AS BIGINT) AS bias_centi
FROM s GROUP BY event_type
"""


def q_events_pareto_front(spark, sf_dir):
    """PARETO FRONT (skyline) over per-user activity — the classic
    "best hosts/users under two criteria with no weighting" query
    (Börzsönyi et al., ICDE'01): a user is on the skyline iff no
    other user has >= activity AND >= value with one strict. Used
    to pick crawl sources that are jointly high-volume and
    high-value without committing to a scalar score.

    Axes are exact integers: x = event count, y = sum of per-row
    centi-value (round once per row, then exact long sums).

    Plan/scale: the naive skyline is an all-pairs dominance join;
    the 2-D reduction here is sort + running max — one window over
    (-x) ordering (max y among strictly-greater x) plus a per-x
    partition max. One shuffle for the census, one global sort —
    no O(n^2) anywhere."""
    per = (_t(spark, sf_dir, "events")
           .groupBy("user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("x"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .cast("long").alias("y"))
           .withColumn("negx", (-F.col("x")).cast("long")))
    w_gt = (Window.orderBy("negx")
            .rangeBetween(Window.unboundedPreceding, -1))
    w_eq = Window.partitionBy("x")
    staged = (per.withColumn("best_y_gt", F.max("y").over(w_gt))
              .withColumn("best_y_eq", F.max("y").over(w_eq)))
    return (staged.filter(
        (F.col("best_y_gt").isNull()
         | (F.col("y") > F.col("best_y_gt")))
        & (F.col("y") == F.col("best_y_eq")))
        .select("user_id", F.col("x").alias("n_events"),
                F.col("y").alias("value_centi")))


ORACLE_EVENTS_PARETO_FRONT = """
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
  FROM events GROUP BY user_id),
st AS (
  SELECT user_id, x, y,
         max(y) OVER (ORDER BY -x
                      RANGE BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS best_y_gt,
         max(y) OVER (PARTITION BY x) AS best_y_eq
  FROM per)
SELECT user_id, x AS n_events, y AS value_centi
FROM st
WHERE (best_y_gt IS NULL OR y > best_y_gt) AND y = best_y_eq
"""


def q_events_hhi(spark, sf_dir):
    """HERFINDAHL-HIRSCHMAN concentration of event mass across
    users, per event type — the antitrust-grade concentration
    index a data curator runs on "who produces this corpus slice":
    HHI = sum of squared shares. A slice where three accounts
    produce everything is a bot farm, not a community. Per type:
    users, events, hhi_ppm (exact: sum(n_i^2)*1e6 DIV N^2), the
    effective participant count (inverse HHI, centi), top-1 share
    ppm, and the DOJ band (0 <1500 pts, 1 <2500, 2 concentrated).

    Plan/scale: two census groupBys ((type,user) then type) plus a
    per-type max — shares never materialize as doubles, the index
    is exact integer arithmetic end-to-end."""
    per = (_t(spark, sf_dir, "events")
           .groupBy("event_type", "user_id")
           .agg(F.count(F.lit(1)).cast("long").alias("n")))
    agg = (per.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_users"),
                F.sum("n").cast("long").alias("n_events"),
                F.sum(F.col("n") * F.col("n")).cast("long").alias("sq"),
                F.max("n").cast("long").alias("top1")))
    hhi = F.expr("sq * 1000000 DIV (n_events * n_events)")
    return (agg.withColumn("hhi_ppm", hhi.cast("long"))
            .withColumn("effective_users_centi",
                        F.expr("n_events * n_events * 100 DIV sq")
                        .cast("long"))
            .withColumn("top1_share_ppm",
                        F.expr("top1 * 1000000 DIV n_events").cast("long"))
            .withColumn("doj_band",
                        F.when(hhi < 150000, F.lit(0))
                        .when(hhi < 250000, F.lit(1))
                        .otherwise(F.lit(2)).cast("int"))
            .drop("sq", "top1"))


ORACLE_EVENTS_HHI = """
WITH per AS (
  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, user_id),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(n) AS BIGINT) AS n_events,
         CAST(sum(n * n) AS BIGINT) AS sq,
         CAST(max(n) AS BIGINT) AS top1
  FROM per GROUP BY event_type)
SELECT event_type, n_users, n_events,
       CAST(sq * 1000000 // (n_events * n_events) AS BIGINT) AS hhi_ppm,
       CAST(n_events * n_events * 100 // sq AS BIGINT)
         AS effective_users_centi,
       CAST(top1 * 1000000 // n_events AS BIGINT) AS top1_share_ppm,
       CAST(CASE WHEN sq * 1000000 // (n_events * n_events) < 150000
                 THEN 0
                 WHEN sq * 1000000 // (n_events * n_events) < 250000
                 THEN 1 ELSE 2 END AS INT) AS doj_band
FROM agg
"""


def q_events_theil_sen(spark, sf_dir):
    """THEIL-SEN robust trend — the median of all pairwise daily
    slopes, the estimator behind every "is this host's activity
    actually drifting or is one spike lying to the mean" check
    (breakdown point 29% vs OLS's 0). Per event type over the
    daily event-count census: days, slope pairs, the Theil-Sen
    slope in milli-events/day, and the drift verdict (+1/-1/0 at
    |slope| >= 0.05 events/day).

    Exactness: slopes are floor(1000*dy DIV dx) integers; the
    median of an even count is the floor-average of the two middle
    order statistics — identical in both engines.

    Plan/scale: pairs are O(days^2) on the DAILY CENSUS (window-
    bounded, e.g. 365 days -> 66k pairs), never on raw events; the
    raw table contributes one census groupBy."""
    daily = (_t(spark, sf_dir, "events")
             .select("event_type",
                     F.datediff(F.to_date("ts"),
                                F.lit("1970-01-01")).cast("long")
                     .alias("d"))
             .groupBy("event_type", "d")
             .agg(F.count(F.lit(1)).cast("long").alias("y")))
    a = daily.select("event_type", F.col("d").alias("di"),
                     F.col("y").alias("yi"))
    b = daily.select("event_type", F.col("d").alias("dj"),
                     F.col("y").alias("yj"))
    pairs = (a.join(b, "event_type")
             .filter(F.col("di") < F.col("dj"))
             .withColumn("slope_milli",
                         F.expr("(yj - yi) * 1000 DIV (dj - di)")
                         .cast("long")))
    w = Window.partitionBy("event_type").orderBy("slope_milli", "di", "dj")
    ranked = pairs.withColumn("rn", F.row_number().over(w))
    counts = (pairs.groupBy("event_type")
              .agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))
    med = (ranked.join(counts, "event_type")
           .filter((F.col("rn") == F.expr("(n_pairs + 1) DIV 2"))
                   | (F.col("rn") == F.expr("n_pairs DIV 2 + 1")))
           .groupBy("event_type", "n_pairs")
           .agg(F.floor(F.avg("slope_milli")).cast("long")
                .alias("ts_slope_milli")))
    days = (daily.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days")))
    return (med.join(days, "event_type")
            .withColumn("drift",
                        F.when(F.col("ts_slope_milli") >= 50, F.lit(1))
                        .when(F.col("ts_slope_milli") <= -50, F.lit(-1))
                        .otherwise(F.lit(0)).cast("int"))
            .select("event_type", "n_days", "n_pairs",
                    "ts_slope_milli", "drift"))


ORACLE_EVENTS_THEIL_SEN = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
pairs AS (
  SELECT a.event_type, a.d AS di, b.d AS dj,
         CAST((b.y - a.y) * 1000 // (b.d - a.d) AS BIGINT) AS slope_milli
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY slope_milli, di, dj) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM pairs),
med AS (
  SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
         CAST(floor(avg(slope_milli)) AS BIGINT) AS ts_slope_milli
  FROM ranked
  WHERE rn = (n_pairs + 1) // 2 OR rn = n_pairs // 2 + 1
  GROUP BY event_type, n_pairs),
days AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
  FROM daily GROUP BY event_type)
SELECT m.event_type, d.n_days, m.n_pairs, m.ts_slope_milli,
       CAST(CASE WHEN m.ts_slope_milli >= 50 THEN 1
                 WHEN m.ts_slope_milli <= -50 THEN -1
                 ELSE 0 END AS INT) AS drift
FROM med m JOIN days d USING (event_type)
"""


def q_events_queueing_mm1(spark, sf_dir):
    """M/M/1 FETCH-QUEUE capacity plan (Little's law) — each event
    class is a fetch queue: arrivals over the observed horizon give
    lambda, per-event service demand (value, centi-seconds, >= 1)
    gives utilization rho = total service / horizon. For rho < 1
    the M/M/1 ladder prices the queue: Lq = rho^2/(1-rho) expected
    backlog, Wq = Lq/lambda expected wait — the numbers that size
    how many politeness-bucket workers a class needs; rho >= 1 is
    a saturation verdict (backlog grows without bound).

    Exactness: arrivals/horizon/service are exact integers
    (per-row round once); rho is ppm integer; Lq/Wq are integer
    expressions of rho_ppm — no engine-varying float paths.

    Plan/scale: one census groupBy(event_type) over one scan."""
    d = (_t(spark, sf_dir, "events")
         .select("event_type",
                 F.unix_timestamp("ts").cast("long").alias("sec"),
                 F.greatest(F.round(F.col("value") * 100).cast("long"),
                            F.lit(1).cast("long")).alias("s_centi")))
    agg = (d.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_arrivals"),
                F.min("sec").alias("t0"), F.max("sec").alias("t1"),
                F.sum("s_centi").cast("long").alias("service_centi")))
    horizon = (F.col("t1") - F.col("t0")).cast("long")
    staged = (agg.withColumn("horizon_s", F.greatest(horizon,
                                                     F.lit(1).cast("long")))
              .withColumn("lambda_micro",
                          F.greatest(
                              F.expr("n_arrivals * 1000000 DIV horizon_s"),
                              F.lit(1).cast("long")))
              .withColumn("rho_ppm",
                          F.expr("service_centi * 10000 DIV horizon_s")
                          .cast("long")))
    sat = F.col("rho_ppm") >= 1000000
    lq_milli = F.expr(
        "rho_ppm * rho_ppm DIV (1000 * (1000000 - rho_ppm))")
    wq_milli = F.expr("lq_milli * 1000000 DIV lambda_micro")
    return (staged.withColumn("saturated", sat.cast("int"))
            .withColumn("lq_milli",
                        F.when(sat, F.lit(-1)).otherwise(lq_milli)
                        .cast("long"))
            .withColumn("wq_milli",
                        F.when(sat, F.lit(-1)).otherwise(wq_milli)
                        .cast("long"))
            .select("event_type", "n_arrivals", "horizon_s",
                    "lambda_micro", "rho_ppm", "saturated",
                    "lq_milli", "wq_milli"))


ORACLE_EVENTS_QUEUEING_MM1 = """
WITH d AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         greatest(CAST(round(value * 100) AS BIGINT), 1) AS s_centi
  FROM events),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_arrivals,
         greatest(CAST(max(sec) - min(sec) AS BIGINT), 1) AS horizon_s,
         CAST(sum(s_centi) AS BIGINT) AS service_centi
  FROM d GROUP BY event_type),
st AS (
  SELECT *, greatest(CAST(n_arrivals * 1000000 // horizon_s AS BIGINT),
                     1) AS lambda_micro,
         CAST(service_centi * 10000 // horizon_s AS BIGINT) AS rho_ppm
  FROM agg),
lq AS (
  SELECT *, CAST(rho_ppm * rho_ppm
                 // (1000 * (1000000 - rho_ppm)) AS BIGINT) AS lq_raw
  FROM st WHERE rho_ppm < 1000000)
SELECT s.event_type, s.n_arrivals, s.horizon_s, s.lambda_micro,
       s.rho_ppm,
       CAST(CASE WHEN s.rho_ppm >= 1000000 THEN 1 ELSE 0 END AS INT)
         AS saturated,
       CAST(CASE WHEN s.rho_ppm >= 1000000 THEN -1
                 ELSE l.lq_raw END AS BIGINT) AS lq_milli,
       CAST(CASE WHEN s.rho_ppm >= 1000000 THEN -1
                 ELSE l.lq_raw * 1000000 // s.lambda_micro
            END AS BIGINT) AS wq_milli
FROM st s LEFT JOIN lq l USING (event_type)
"""


def q_events_spc_control(spark, sf_dir):
    """SPC CONTROL CHART (Shewhart + Western Electric rule 2) over
    the daily event-count series per type — the ops-grade "is the
    crawl pipeline drifting" monitor: center line and sigma from
    the series' own exact moments, days beyond 3-sigma are
    violations, and 2-of-3 consecutive days beyond 2-sigma on the
    SAME side (WE rule 2) catches slow drifts a 3-sigma gate
    misses. Per type: days, center/sigma (milli, floor-pinned),
    3-sigma violations, WE-2 windows, and the in-control verdict.

    Exactness: mean and sigma come from exact integer sum/sumsq
    (population sigma, one sqrt, floor once); z per day is
    floor-pinned milli.

    Plan/scale: daily census groupBy, a 3-row sliding count window
    per type (ordered by day), one final census — the raw table is
    scanned once."""
    daily = (_t(spark, sf_dir, "events")
             .select("event_type",
                     F.datediff(F.to_date("ts"),
                                F.lit("1970-01-01")).cast("long")
                     .alias("d"))
             .groupBy("event_type", "d")
             .agg(F.count(F.lit(1)).cast("long").alias("y")))
    mom = (daily.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                F.sum("y").cast("long").alias("s1"),
                F.sum(F.col("y") * F.col("y")).cast("long").alias("s2")))
    mean = F.col("s1").cast("double") / F.col("n_days")
    var = ((F.col("n_days") * F.col("s2") - F.col("s1") * F.col("s1"))
           .cast("double")
           / (F.col("n_days") * F.col("n_days")).cast("double"))
    mom = (mom.withColumn("mu", mean)
           .withColumn("sigma", F.sqrt(var)))
    z = (daily.join(mom, "event_type")
         .withColumn("z_milli",
                     F.when(F.col("sigma") == 0.0, F.lit(0).cast("long"))
                     .otherwise(F.floor(
                         F.lit(1000.0) * (F.col("y") - F.col("mu"))
                         / F.col("sigma")).cast("long"))))
    w3 = (Window.partitionBy("event_type").orderBy("d")
          .rowsBetween(-2, 0))
    flagged = (z.withColumn("hi2", (F.col("z_milli") >= 2000).cast("int"))
               .withColumn("lo2", (F.col("z_milli") <= -2000).cast("int"))
               .withColumn("we2",
                           ((F.sum("hi2").over(w3) >= 2)
                            | (F.sum("lo2").over(w3) >= 2)).cast("int"))
               .withColumn("b3", ((F.col("z_milli") >= 3000)
                                  | (F.col("z_milli") <= -3000))
                           .cast("int")))
    return (flagged.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_days"),
                 F.floor(F.lit(1000.0) * F.first("mu")).cast("long")
                 .alias("center_milli"),
                 F.floor(F.lit(1000.0) * F.first("sigma")).cast("long")
                 .alias("sigma_milli"),
                 F.sum("b3").cast("long").alias("beyond_3s"),
                 F.sum("we2").cast("long").alias("we2_windows"))
            .withColumn("in_control",
                        ((F.col("beyond_3s") == 0)
                         & (F.col("we2_windows") == 0)).cast("int")))


ORACLE_EVENTS_SPC_CONTROL = """
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
              AS BIGINT) AS d,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
mom AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(y) AS BIGINT) AS s1,
         CAST(sum(y * y) AS BIGINT) AS s2
  FROM daily GROUP BY event_type),
mm AS (
  SELECT *, CAST(s1 AS DOUBLE) / n_days AS mu,
         sqrt(CAST(n_days * s2 - s1 * s1 AS DOUBLE)
              / CAST(n_days * n_days AS DOUBLE)) AS sigma
  FROM mom),
z AS (
  SELECT d.event_type, d.d, m.mu, m.sigma,
         CASE WHEN m.sigma = 0.0 THEN 0
              ELSE CAST(floor(1000.0 * (d.y - m.mu) / m.sigma)
                        AS BIGINT) END AS z_milli
  FROM daily d JOIN mm m USING (event_type)),
fl AS (
  SELECT event_type, mu, sigma, z_milli,
         CASE WHEN z_milli >= 3000 OR z_milli <= -3000
              THEN 1 ELSE 0 END AS b3,
         CASE WHEN sum(CASE WHEN z_milli >= 2000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
                OR sum(CASE WHEN z_milli <= -2000 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
              THEN 1 ELSE 0 END AS we2
  FROM z)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
       CAST(floor(1000.0 * any_value(mu)) AS BIGINT) AS center_milli,
       CAST(floor(1000.0 * any_value(sigma)) AS BIGINT) AS sigma_milli,
       CAST(sum(b3) AS BIGINT) AS beyond_3s,
       CAST(sum(we2) AS BIGINT) AS we2_windows,
       CAST(CASE WHEN sum(b3) = 0 AND sum(we2) = 0
                 THEN 1 ELSE 0 END AS INT) AS in_control
FROM fl GROUP BY event_type
"""


def q_events_cusum(spark, sf_dir):
    """CUSUM changepoint detection (Page 1954) over the daily
    event-count series per type — the sequential drift detector
    SPC's point rules miss (a small persistent shift never crosses
    3-sigma on any single day but accumulates in the CUSUM).
    Exact-integer form: work in count x n_days units so the mean
    never becomes a fraction — d_up = n*D - total - total/8 (slack
    k = mu/8), and the recursion S_t = max(0, S_{t-1} + d_t) is
    computed by its CLOSED FORM S_t = C_t - min(0, min_{j<=t} C_j)
    (prefix sum minus running prefix-min), which two window
    functions express without any iteration. Alarm at h = 2*mu
    (scaled: 2*total).

    Plan/scale: the daily census is |types x days| rows; windows
    are partitioned by event_type — no global window, no driver
    loop, exact integers end-to-end."""
    daily = (_t(spark, sf_dir, "events")
             .select("event_type", F.to_date("ts").alias("day"))
             .groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    wt = Window.partitionBy("event_type")
    t1 = (daily
          .withColumn("total", F.sum("n").over(wt).cast("long"))
          .withColumn("n_days", F.count(F.lit(1)).over(wt)
                      .cast("long")))
    t2 = (t1.withColumn("d_up",
                        F.expr("n * n_days - total - total DIV 8")
                        .cast("long"))
          .withColumn("d_lo",
                      F.expr("total - n * n_days - total DIV 8")
                      .cast("long")))
    wo = (Window.partitionBy("event_type").orderBy("day")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t3 = (t2.withColumn("c_up", F.sum("d_up").over(wo).cast("long"))
          .withColumn("c_lo", F.sum("d_lo").over(wo).cast("long")))
    t4 = (t3.withColumn("m_up", F.min("c_up").over(wo).cast("long"))
          .withColumn("m_lo", F.min("c_lo").over(wo).cast("long")))
    return (t4.select(
        "event_type", "day", "n", "total",
        (F.col("c_up") - F.least(F.lit(0), F.col("m_up")))
        .cast("long").alias("s_up"),
        (F.col("c_lo") - F.least(F.lit(0), F.col("m_lo")))
        .cast("long").alias("s_lo"))
        .withColumn("alarm_up",
                    (F.col("s_up") >= 2 * F.col("total")).cast("int"))
        .withColumn("alarm_lo",
                    (F.col("s_lo") >= 2 * F.col("total")).cast("int"))
        .drop("total"))


ORACLE_EVENTS_CUSUM = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
t1 AS (
  SELECT event_type, day, n,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
           AS total,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS n_days
  FROM daily),
t2 AS (
  SELECT *, n * n_days - total - total // 8 AS d_up,
            total - n * n_days - total // 8 AS d_lo
  FROM t1),
t3 AS (
  SELECT *,
    sum(d_up) OVER (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS c_up,
    sum(d_lo) OVER (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS c_lo
  FROM t2),
t4 AS (
  SELECT *,
    min(c_up) OVER (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS m_up,
    min(c_lo) OVER (PARTITION BY event_type ORDER BY day
                    ROWS UNBOUNDED PRECEDING) AS m_lo
  FROM t3)
SELECT event_type, day, n,
       CAST(c_up - least(0, m_up) AS BIGINT) AS s_up,
       CAST(c_lo - least(0, m_lo) AS BIGINT) AS s_lo,
       CAST(CASE WHEN c_up - least(0, m_up) >= 2 * total
                 THEN 1 ELSE 0 END AS INT) AS alarm_up,
       CAST(CASE WHEN c_lo - least(0, m_lo) >= 2 * total
                 THEN 1 ELSE 0 END AS INT) AS alarm_lo
FROM t4
"""


def q_events_ewma_forecast(spark, sf_dir):
    """EWMA one-step forecast backtest vs the seasonal-naive
    baseline — the second rung of the forecasting ladder
    events_snaive_backtest established: exponential smoothing with
    alpha = 1/2 over the last 8 days, in EXACT integers (the
    frontier_crawl_delay trick: power-of-two weights
    128/64/32/16/8/4/2/2 sum to 256, so the smoothing is a
    weighted sum + one shift, no float state). Per event type:
    forecastable days, EWMA MAE vs the t-7 seasonal-naive MAE in
    milli-events, and which estimator wins.

    Plan/scale: daily census then 8 lag() taps on a per-type
    window — state is |types x days|, no recursion, no UDF."""
    daily = (_t(spark, sf_dir, "events")
             .select("event_type", F.to_date("ts").alias("day"))
             .groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = daily
    for i in range(1, 9):
        lagged = lagged.withColumn(f"l{i}",
                                   F.lag("n", i).over(w).cast("long"))
    fc = (lagged.filter(F.col("l8").isNotNull())
          .withColumn("ewma_fc",
                      F.expr("(128*l1 + 64*l2 + 32*l3 + 16*l4 + 8*l5"
                             " + 4*l6 + 2*l7 + 2*l8) DIV 256")
                      .cast("long"))
          .withColumn("snaive_fc", F.col("l7")))
    err = (fc.withColumn("e_ewma", F.abs(F.col("n") - F.col("ewma_fc")))
           .withColumn("e_snaive",
                       F.abs(F.col("n") - F.col("snaive_fc"))))
    return (err.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("long").alias("n_forecasts"),
                 F.sum("e_ewma").cast("long").alias("ewma_abs_sum"),
                 F.sum("e_snaive").cast("long").alias("snaive_abs_sum"))
            .withColumn("ewma_mae_milli",
                        F.expr("ewma_abs_sum * 1000 DIV n_forecasts")
                        .cast("long"))
            .withColumn("snaive_mae_milli",
                        F.expr("snaive_abs_sum * 1000 DIV n_forecasts")
                        .cast("long"))
            .withColumn("ewma_wins",
                        (F.col("ewma_abs_sum") < F.col("snaive_abs_sum"))
                        .cast("int")))


ORACLE_EVENTS_EWMA_FORECAST = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
lagged AS (
  SELECT *,
    lag(n, 1) OVER w AS l1, lag(n, 2) OVER w AS l2,
    lag(n, 3) OVER w AS l3, lag(n, 4) OVER w AS l4,
    lag(n, 5) OVER w AS l5, lag(n, 6) OVER w AS l6,
    lag(n, 7) OVER w AS l7, lag(n, 8) OVER w AS l8
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
fc AS (
  SELECT event_type, day, n,
         (128*l1 + 64*l2 + 32*l3 + 16*l4 + 8*l5 + 4*l6 + 2*l7 + 2*l8)
           // 256 AS ewma_fc,
         l7 AS snaive_fc
  FROM lagged WHERE l8 IS NOT NULL)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_forecasts,
       CAST(sum(abs(n - ewma_fc)) AS BIGINT) AS ewma_abs_sum,
       CAST(sum(abs(n - snaive_fc)) AS BIGINT) AS snaive_abs_sum,
       CAST(sum(abs(n - ewma_fc)) * 1000 // count(*) AS BIGINT)
         AS ewma_mae_milli,
       CAST(sum(abs(n - snaive_fc)) * 1000 // count(*) AS BIGINT)
         AS snaive_mae_milli,
       CAST(CASE WHEN sum(abs(n - ewma_fc)) < sum(abs(n - snaive_fc))
                 THEN 1 ELSE 0 END AS INT) AS ewma_wins
FROM fc GROUP BY event_type
"""


def q_events_srm_check(spark, sf_dir):
    """SAMPLE-RATIO-MISMATCH guardrail — the first thing a trusted
    experimentation platform checks (Fabijan et al., KDD'19): if a
    50/50 assignment doesn't produce ~50/50 observed traffic, the
    experiment is corrupted (logging loss, bot filters, redirect
    asymmetry) and every downstream metric is invalid. Arms from
    user_id parity; a deterministic logging bug drops part of the
    treatment arm. Per event type: arm counts, the 1-df chi-square
    statistic in EXACT micro units ((a-b)^2 * 1e6 / (a+b)), and
    the SRM verdict at the p<0.001 bar (chi2 > 10.828).

    Plan/scale: one census groupBy — the guardrail is scale-free
    over the event count."""
    e = (_t(spark, sf_dir, "events")
         .select("event_type", "user_id"))
    logged = e.filter(~((F.col("user_id") % 2 == 1)
                        & (F.col("user_id") % 20 == 1)))
    arm = (F.col("user_id") % 2 == 0).cast("int")
    cens = (logged.select("event_type", arm.alias("is_control"))
            .groupBy("event_type")
            .agg(F.sum("is_control").cast("long").alias("n_control"),
                 F.sum(1 - F.col("is_control")).cast("long")
                 .alias("n_treat")))
    chi2 = F.expr("(n_control - n_treat) * (n_control - n_treat) "
                  "* 1000000 DIV (n_control + n_treat)")
    return (cens.withColumn("chi2_micro", chi2.cast("long"))
            .withColumn("srm",
                        (F.col("chi2_micro") > 10828000).cast("int")))


ORACLE_EVENTS_SRM_CHECK = """
WITH logged AS (
  SELECT event_type, user_id FROM events
  WHERE NOT (user_id % 2 = 1 AND user_id % 20 = 1)),
cens AS (
  SELECT event_type,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_control,
         CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_treat
  FROM logged GROUP BY event_type)
SELECT event_type, n_control, n_treat,
       CAST((n_control - n_treat) * (n_control - n_treat) * 1000000
            // (n_control + n_treat) AS BIGINT) AS chi2_micro,
       CAST(CASE WHEN (n_control - n_treat) * (n_control - n_treat)
                      * 1000000 // (n_control + n_treat) > 10828000
                 THEN 1 ELSE 0 END AS INT) AS srm
FROM cens
"""


def q_events_seasonality_strength(spark, sf_dir):
    """SEASONALITY strength as total-variation distance from the
    uniform hour-of-day profile — the single number that says
    whether a traffic series has a diurnal shape worth modeling
    (the gate before events_seasonal_residual's per-hour baseline
    earns its keep): per event type, the 24-bin hour profile, the
    peak hour and its share, and TV = sum |24*s_h - T| / (46*T)
    in ppm — EXACT integers (0 = flat, 1e6 = single-hour spike;
    46T is the one-hot maximum of the numerator).

    Plan/scale: one (type, hour) census then a 24-row fold per
    type — scale-free after the scan."""
    e = (_t(spark, sf_dir, "events")
         .select("event_type", F.hour("ts").alias("hr")))
    hourly = (e.groupBy("event_type", "hr")
              .agg(F.count(F.lit(1)).cast("long").alias("n")))
    w = Window.partitionBy("event_type")
    t1 = hourly.withColumn("total", F.sum("n").over(w).cast("long"))
    dev = (t1.withColumn("d", F.abs(24 * F.col("n") - F.col("total"))
                         .cast("long")))
    per = (dev.groupBy("event_type")
           .agg(F.max("total").cast("long").alias("total"),
                F.sum("d").cast("long").alias("dev_obs"),
                F.count(F.lit(1)).cast("long").alias("hours_seen"),
                F.max(F.struct(F.col("n"), F.col("hr"))).alias("pk")))
    # hours with zero events contribute |0 - T| = T each
    full = (per.withColumn("dev_sum",
                           (F.col("dev_obs")
                            + (24 - F.col("hours_seen"))
                            * F.col("total")).cast("long"))
            .withColumn("peak_hour", F.col("pk.hr").cast("int"))
            .withColumn("peak_share_ppm",
                        F.expr("pk.n * 1000000 DIV total").cast("long")))
    return (full.select("event_type", "total", "peak_hour",
                        "peak_share_ppm",
                        F.expr("dev_sum * 1000000 DIV (46 * total)")
                        .cast("long").alias("tv_ppm"))
            .withColumn("is_seasonal",
                        (F.col("tv_ppm") >= 200000).cast("int")))


ORACLE_EVENTS_SEASONALITY_STRENGTH = """
WITH hourly AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hr,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type, hour(ts)),
t1 AS (
  SELECT *, CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
              AS total
  FROM hourly),
per AS (
  SELECT event_type, CAST(max(total) AS BIGINT) AS total,
         CAST(sum(abs(24 * n - total)) AS BIGINT) AS dev_obs,
         CAST(count(*) AS BIGINT) AS hours_seen
  FROM t1 GROUP BY event_type),
peak AS (
  SELECT event_type, CAST(n AS BIGINT) AS peak_n,
         CAST(hr AS INT) AS peak_hour
  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
                  ORDER BY n DESC, hr DESC) AS rk FROM t1)
  WHERE rk = 1),
full_ AS (
  SELECT per.*, peak_n, peak_hour,
         dev_obs + (24 - hours_seen) * total AS dev_sum
  FROM per JOIN peak USING (event_type))
SELECT event_type, total, peak_hour,
       CAST(peak_n * 1000000 // total AS BIGINT) AS peak_share_ppm,
       CAST(dev_sum * 1000000 // (46 * total) AS BIGINT) AS tv_ppm,
       CAST(CASE WHEN dev_sum * 1000000 // (46 * total) >= 200000
                 THEN 1 ELSE 0 END AS INT) AS is_seasonal
FROM full_
"""


def q_events_audience_overlap(spark, sf_dir):
    """AUDIENCE-overlap matrix across event types — the exact
    Jaccard between user sets that tells a product/capacity owner
    which behaviors share an audience (and a sampling designer
    which strata are redundant); the exact twin of the KMV-sketch
    overlap row (url_kmv_overlap) at census-able cardinalities.
    Per unordered type pair: both user counts, the intersection,
    and Jaccard in ppm.

    Plan/scale: distinct (type, user), a self-equi-join ON USER
    (never a cross join), pair census — at web scale the user key
    shards the join, and the sketch row is the fallback."""
    d = (_t(spark, sf_dir, "events")
         .select("event_type", "user_id").distinct())
    a = d.select(F.col("event_type").alias("type_a"), "user_id")
    b = d.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (a.join(b, "user_id")
             .filter(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).cast("long").alias("n_inter")))
    per = (d.groupBy("event_type")
           .agg(F.count(F.lit(1)).cast("long").alias("n_users")))
    j = (inter
         .join(per.withColumnRenamed("event_type", "type_a")
               .withColumnRenamed("n_users", "n_a"), "type_a")
         .join(per.withColumnRenamed("event_type", "type_b")
               .withColumnRenamed("n_users", "n_b"), "type_b"))
    return (j.withColumn("jaccard_ppm",
                         F.expr("n_inter * 1000000 "
                                "DIV (n_a + n_b - n_inter)")
                         .cast("long"))
            .select("type_a", "type_b", "n_a", "n_b", "n_inter",
                    "jaccard_ppm"))


ORACLE_EVENTS_AUDIENCE_OVERLAP = """
WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(count(*) AS BIGINT) AS n_inter
  FROM d a JOIN d b USING (user_id)
  WHERE a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type),
per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
  FROM d GROUP BY event_type)
SELECT type_a, type_b,
       pa.n_users AS n_a, pb.n_users AS n_b, n_inter,
       CAST(n_inter * 1000000
            // (pa.n_users + pb.n_users - n_inter) AS BIGINT)
         AS jaccard_ppm
FROM inter
JOIN per pa ON pa.event_type = type_a
JOIN per pb ON pb.event_type = type_b
"""


def q_events_jackknife(spark, sf_dir):
    """Delete-1 JACKKNIFE variance of a RATIO estimator (Quenouille/
    Tukey; the deterministic resampling scheme — no randomness, so
    it belongs in an oracle-checked registry where bootstrap
    can't): the statistic is value-per-event theta = V/N per event
    type, whose nonlinearity makes naive variance wrong; each day
    is a delete-1 replicate theta_(i) = (V - v_i)/(N - n_i).
    Day values quantized to exact milli units and pseudo-values to
    micro units (documented quantization, both engines identical),
    then the jackknife variance (D-1)/D * sum dev^2 is EXACT
    integer arithmetic over those quantized replicates. Per type:
    days, theta, jackknife variance and SE in micro units.

    Plan/scale: one daily census groupBy, one per-type fold —
    scale-free after the scan."""
    e = (_t(spark, sf_dir, "events")
         .select("event_type", F.to_date("ts").alias("day"),
                 F.expr("CAST(round(value * 1000) AS BIGINT)")
                 .alias("v_milli")))
    daily = (e.groupBy("event_type", "day")
             .agg(F.count(F.lit(1)).cast("long").alias("n"),
                  F.sum("v_milli").cast("long").alias("v")))
    w = Window.partitionBy("event_type")
    t1 = (daily
          .withColumn("big_n", F.sum("n").over(w).cast("long"))
          .withColumn("big_v", F.sum("v").over(w).cast("long"))
          .withColumn("d_days", F.count(F.lit(1)).over(w)
                      .cast("long")))
    # pseudo-value per replicate, milli units of milli-value/event
    # (milli, not micro: theta_i^2 must stay inside BIGINT under ANSI)
    t2 = t1.withColumn(
        "theta_i",
        F.expr("(big_v - v) * 1000 DIV (big_n - n)").cast("long"))
    per = (t2.groupBy("event_type")
           .agg(F.max("d_days").cast("long").alias("n_days"),
                F.max("big_n").cast("long").alias("n_events"),
                F.expr("max(big_v * 1000 DIV big_n)").cast("long")
                .alias("theta_milli"),
                F.sum("theta_i").cast("long").alias("s1"),
                F.expr("sum(theta_i * theta_i)").cast("long")
                .alias("s2")))
    # Var_jack = (D-1)/D * sum (theta_i - mean)^2
    #          = (D-1) * (D*s2 - s1^2) / D^3   (exact integer floor)
    return (per.withColumn(
        "var_jack_milli2",
        F.expr("(n_days - 1) * (n_days * s2 - s1 * s1) "
               "DIV (n_days * n_days * n_days)").cast("long"))
        .withColumn("se_jack_milli", F.expr(
            "CAST(floor(sqrt(CAST((n_days - 1) * (n_days * s2 - s1 * s1)"
            " DIV (n_days * n_days * n_days) AS DOUBLE))) AS BIGINT)"))
        .select("event_type", "n_days", "n_events", "theta_milli",
                "var_jack_milli2", "se_jack_milli"))


ORACLE_EVENTS_JACKKNIFE = """
WITH e AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(round(value * 1000) AS BIGINT) AS v_milli
  FROM events),
daily AS (
  SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(v_milli) AS BIGINT) AS v
  FROM e GROUP BY event_type, day),
t1 AS (
  SELECT *,
         CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT)
           AS big_n,
         CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT)
           AS big_v,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
           AS d_days
  FROM daily),
t2 AS (
  SELECT *, (big_v - v) * 1000 // (big_n - n) AS theta_i
  FROM t1),
per AS (
  SELECT event_type, CAST(max(d_days) AS BIGINT) AS n_days,
         CAST(max(big_n) AS BIGINT) AS n_events,
         CAST(max(big_v * 1000 // big_n) AS BIGINT) AS theta_milli,
         CAST(sum(theta_i) AS BIGINT) AS s1,
         CAST(sum(theta_i * theta_i) AS BIGINT) AS s2
  FROM t2 GROUP BY event_type)
SELECT event_type, n_days, n_events, theta_milli,
       CAST((n_days - 1) * (n_days * s2 - s1 * s1)
            // (n_days * n_days * n_days) AS BIGINT)
         AS var_jack_milli2,
       CAST(floor(sqrt(CAST((n_days - 1) * (n_days * s2 - s1 * s1)
            // (n_days * n_days * n_days) AS DOUBLE))) AS BIGINT)
         AS se_jack_milli
FROM per
"""


def q_events_growth_accounting(spark, sf_dir):
    """GROWTH-accounting decomposition (the Social Capital /
    startup-metrics identity): each week's active users split
    EXACTLY into new (first week ever), retained (also active the
    week before), and resurrected (active some earlier week but
    not last week); churned is last week's actives who left. The
    identity actives = new + retained + resurrected is enforced
    per row — flows, where DAU/MAU and retention rows report
    stocks. Weeks are days-since-epoch-origin / 7 so the boundary
    is engine-portable.

    Plan/scale: distinct (user, week), a min-week census, one
    self-join on (user, week-1) — all user-keyed shuffles."""
    e = (_t(spark, sf_dir, "events")
         .select("user_id",
                 (F.datediff(F.to_date("ts"),
                             F.to_date(F.lit("2024-01-01")))
                  / F.lit(7)).cast("long").alias("week")))
    uw = e.distinct()
    first = (uw.groupBy("user_id")
             .agg(F.min("week").cast("long").alias("first_week")))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week"),
                     F.lit(1).alias("was_prev"))
    j = (uw.join(first, "user_id")
         .join(prev, ["user_id", "week"], "left")
         .withColumn("was_prev", F.coalesce("was_prev", F.lit(0))))
    cls = (F.when(F.col("week") == F.col("first_week"), F.lit("new"))
           .when(F.col("was_prev") == 1, F.lit("retained"))
           .otherwise(F.lit("resurrected")))
    per = (j.withColumn("cls", cls)
           .groupBy("week")
           .agg(F.count(F.lit(1)).cast("long").alias("actives"),
                F.sum((F.col("cls") == "new").cast("int")).cast("long")
                .alias("new_users"),
                F.sum((F.col("cls") == "retained").cast("int"))
                .cast("long").alias("retained"),
                F.sum((F.col("cls") == "resurrected").cast("int"))
                .cast("long").alias("resurrected")))
    prev_tot = (uw.groupBy("week")
                .agg(F.count(F.lit(1)).cast("long").alias("prev_act"))
                .select((F.col("week") + 1).alias("week"), "prev_act"))
    return (per.join(prev_tot, "week", "left")
            .withColumn("churned",
                        (F.coalesce("prev_act", F.lit(0))
                         - F.col("retained")).cast("long"))
            .withColumn("identity_ok",
                        (F.col("actives") == F.col("new_users")
                         + F.col("retained") + F.col("resurrected"))
                        .cast("int"))
            .select("week", "actives", "new_users", "retained",
                    "resurrected", "churned", "identity_ok"))


ORACLE_EVENTS_GROWTH_ACCOUNTING = """
WITH e AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
              // 7 AS BIGINT) AS week
  FROM events),
first AS (
  SELECT user_id, CAST(min(week) AS BIGINT) AS first_week
  FROM e GROUP BY user_id),
j AS (
  SELECT e.user_id, e.week, first_week,
         CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END AS was_prev
  FROM e JOIN first USING (user_id)
  LEFT JOIN e p ON p.user_id = e.user_id AND p.week = e.week - 1),
cl AS (
  SELECT week,
         CASE WHEN week = first_week THEN 'new'
              WHEN was_prev = 1 THEN 'retained'
              ELSE 'resurrected' END AS cls
  FROM j),
per AS (
  SELECT week, CAST(count(*) AS BIGINT) AS actives,
         CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
           AS new_users,
         CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
              AS BIGINT) AS retained,
         CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
              AS BIGINT) AS resurrected
  FROM cl GROUP BY week),
prev_tot AS (
  SELECT week + 1 AS week, CAST(count(*) AS BIGINT) AS prev_act
  FROM e GROUP BY week)
SELECT p.week, actives, new_users, retained, resurrected,
       CAST(coalesce(prev_act, 0) - retained AS BIGINT) AS churned,
       CAST(CASE WHEN actives = new_users + retained + resurrected
                 THEN 1 ELSE 0 END AS INT) AS identity_ok
FROM per p LEFT JOIN prev_tot pt ON pt.week = p.week
"""


def q_events_frequency_cap(spark, sf_dir):
    """FREQUENCY-CAP curve — response rate by exposure ordinal
    (the fatigue analysis behind every cap policy: after the Nth
    touch, conversion stops paying for the annoyance): each
    user's events are ordered, the ordinal bucketed
    (1/2/3/4/5/6-10/11+), and per bucket the purchase-response
    rate in exact ppm plus the fatigue flag (rate below half the
    first bucket's). The cap recommendation is the first fatigued
    bucket.

    Plan/scale: one per-user window for ordinals (user-keyed,
    bounded by per-user activity), one bucket census."""
    e = (_t(spark, sf_dir, "events")
         .select("user_id", "event_id", "ts", "event_type"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t1 = e.withColumn("ordinal", F.row_number().over(w))
    bucket = (F.when(F.col("ordinal") <= 5,
                     F.col("ordinal").cast("string"))
              .when(F.col("ordinal") <= 10, F.lit("6-10"))
              .otherwise(F.lit("11+")))
    per = (t1.withColumn("bucket", bucket)
           .groupBy("bucket")
           .agg(F.count(F.lit(1)).cast("long").alias("exposures"),
                F.sum((F.col("event_type") == "purchase").cast("int"))
                .cast("long").alias("responses")))
    rated = per.withColumn("rate_ppm",
                           F.expr("responses * 1000000 DIV exposures")
                           .cast("long"))
    first = (rated.filter(F.col("bucket") == "1")
             .select(F.col("rate_ppm").alias("first_rate")))
    return (rated.crossJoin(F.broadcast(first))
            .withColumn("fatigued",
                        (2 * F.col("rate_ppm") < F.col("first_rate"))
                        .cast("int"))
            .drop("first_rate"))


ORACLE_EVENTS_FREQUENCY_CAP = """
WITH t1 AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS ordinal
  FROM events),
per AS (
  SELECT CASE WHEN ordinal <= 5 THEN CAST(ordinal AS VARCHAR)
              WHEN ordinal <= 10 THEN '6-10'
              ELSE '11+' END AS bucket,
         CAST(count(*) AS BIGINT) AS exposures,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                  END) AS BIGINT) AS responses
  FROM t1 GROUP BY 1),
rated AS (
  SELECT *, CAST(responses * 1000000 // exposures AS BIGINT)
              AS rate_ppm
  FROM per),
first AS (SELECT rate_ppm AS first_rate FROM rated WHERE bucket = '1')
SELECT bucket, exposures, responses, rate_ppm,
       CAST(CASE WHEN 2 * rate_ppm < first_rate THEN 1 ELSE 0 END
            AS INT) AS fatigued
FROM rated CROSS JOIN first
"""


def q_events_streaks(spark, sf_dir):
    """Activity STREAKS via gaps-and-islands — the classic
    consecutive-runs SQL pattern (island id = day_index - rank)
    that turns 'longest consecutive-day streak' from a sequential
    scan into two windowed passes; streaks are the engagement
    texture the stock retention rows (events_retention, dau_mau)
    can't see: two users with 10 active days differ enormously if
    one did them consecutively. Per user: active days, number of
    streaks, the longest streak, and its start day index.

    Plan/scale: distinct (user, day), one per-user window for the
    island id, one groupBy((user, island)), one top-1 window —
    every shuffle user-keyed."""
    e = (_t(spark, sf_dir, "events")
         .select("user_id",
                 F.datediff(F.to_date("ts"),
                            F.to_date(F.lit("2024-01-01")))
                 .cast("long").alias("day_idx"))
         .distinct())
    w = Window.partitionBy("user_id").orderBy("day_idx")
    isl = e.withColumn(
        "island", (F.col("day_idx")
                   - F.row_number().over(w)).cast("long"))
    runs = (isl.groupBy("user_id", "island")
            .agg(F.count(F.lit(1)).cast("long").alias("len"),
                 F.min("day_idx").cast("long").alias("start_day")))
    per = (runs.groupBy("user_id")
           .agg(F.sum("len").cast("long").alias("active_days"),
                F.count(F.lit(1)).cast("long").alias("n_streaks")))
    w2 = (Window.partitionBy("user_id")
          .orderBy(F.desc("len"), F.asc("start_day")))
    top = (runs.withColumn("rk", F.row_number().over(w2))
           .filter(F.col("rk") == 1)
           .select("user_id", F.col("len").alias("longest_streak"),
                   F.col("start_day").alias("longest_start_day")))
    return per.join(top, "user_id")


ORACLE_EVENTS_STREAKS = """
WITH e AS (
  SELECT DISTINCT user_id,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS BIGINT) AS day_idx
  FROM events),
isl AS (
  SELECT user_id, day_idx,
         day_idx - row_number() OVER (PARTITION BY user_id
                                      ORDER BY day_idx) AS island
  FROM e),
runs AS (
  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len,
         CAST(min(day_idx) AS BIGINT) AS start_day
  FROM isl GROUP BY user_id, island),
per AS (
  SELECT user_id, CAST(sum(len) AS BIGINT) AS active_days,
         CAST(count(*) AS BIGINT) AS n_streaks
  FROM runs GROUP BY user_id),
top AS (
  SELECT user_id, len AS longest_streak,
         start_day AS longest_start_day
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY len DESC, start_day ASC) AS rk FROM runs)
  WHERE rk = 1)
SELECT user_id, active_days, n_streaks, longest_streak,
       longest_start_day
FROM per JOIN top USING (user_id)
"""


def q_events_holt_linear(spark, sf_dir):
    """Holt linear-trend double exponential smoothing (the
    trend-aware member of the forecasting family beside
    events_ewma_forecast / events_snaive_backtest): per event type,
    the DAILY count series of the last 8 observed days (dense spine
    — missing days count 0), smoothed with alpha = beta = 1/2 and
    forecast 1..3 days ahead (f_h = l + h*b). Halving chains on
    small integers are exact dyadic doubles, so the smoothing is
    bit-deterministic without any float-order hazard; outputs are
    scaled into exact 2^14 integer units.

    Plan/scale: one (type, day) census (map-side combinable), an
    8-day spine broadcast from a 1-row max agg, one pivot groupBy
    per type — state per series is O(8) whatever the history
    length, the same rank-cut-then-pivot shape as
    frontier_crawl_delay."""
    piv = _holt_pivot(spark, sf_dir)
    l = F.col("y1").cast("double")
    b = (F.col("y2") - F.col("y1")).cast("double")
    for t in range(2, _HOLT_N + 1):
        ln = (F.col(f"y{t}") + l + b) / 2.0
        b = ((ln - l) + b) / 2.0
        l = ln
    return piv.select(
        "event_type",
        F.round(l * 16384).cast("long").alias("level_u"),
        F.round(b * 16384).cast("long").alias("trend_u"),
        *[F.round((l + h * b) * 16384).cast("long").alias(f"f{h}_u")
          for h in (1, 2, 3)])

ORACLE_EVENTS_HOLT_LINEAR = f"""
WITH {_HOLT_CHAIN_SQL}
SELECT event_type,
       CAST(round(l{_HOLT_N} * 16384) AS BIGINT) AS level_u,
       CAST(round(b{_HOLT_N} * 16384) AS BIGINT) AS trend_u,
       CAST(round((l{_HOLT_N} + 1 * b{_HOLT_N}) * 16384) AS BIGINT) AS f1_u,
       CAST(round((l{_HOLT_N} + 2 * b{_HOLT_N}) * 16384) AS BIGINT) AS f2_u,
       CAST(round((l{_HOLT_N} + 3 * b{_HOLT_N}) * 16384) AS BIGINT) AS f3_u
FROM hs{_HOLT_N}
"""


def q_events_xcorr(spark, sf_dir):
    """Lead-lag CROSS-correlation between event-type daily series —
    the pairwise complement of events_autocorr (does clicking today
    predict purchasing in 2 days?): for three (driver, follower)
    pairs and every lag in -3..3, the Pearson numerator/denominators
    over the aligned dense day series in EXACT integer arithmetic
    (cov_num = n*Sxy - Sx*Sy etc.), the signed r^2 in ppm by
    integer-safe decimal division, and each pair's best lag (max
    |r^2|, smallest lag on ties). No sqrt ever runs — comparing r^2
    preserves the argmax.

    Plan/scale: one (type, day) census, a dense spine fill, one
    3x7-row literal explode joined twice against the tiny series
    table, one agg per (pair, lag) — the series table is O(days x
    types) whatever the event volume, so this is census-sized end to
    end."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"),
                   F.lit("2024-01-01").cast("date")).alias("day"))
    counts = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("y"))
    rng = ev.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    spine = (counts.select("event_type").distinct()
             .crossJoin(F.broadcast(rng))
             .select("event_type",
                     F.explode(F.sequence("lo", "hi")).alias("day")))
    dense = (spine.join(counts, ["event_type", "day"], "left")
             .withColumn("y", F.coalesce(F.col("y"), F.lit(0))))
    pairs = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"))
        for a, b in [("click", "purchase"), ("view", "click"),
                     ("signup", "purchase")]])
    grid = (spark.range(-3, 4).select(F.col("id").cast("int").alias("lag"))
            .withColumn("p", F.explode(pairs))
            .select("lag", F.col("p.a").alias("ta"),
                    F.col("p.b").alias("tb")))
    xa = dense.select(F.col("event_type").alias("ta"),
                      F.col("day").alias("da"), F.col("y").alias("x"))
    xb = dense.select(F.col("event_type").alias("tb"),
                      F.col("day").alias("db"), F.col("y").alias("yv"))
    j = (grid.join(xa, "ta")
         .join(xb, "tb")
         .filter(F.col("db") == F.col("da") + F.col("lag")))
    agg = (j.groupBy("ta", "tb", "lag")
           .agg(F.count("*").cast("long").alias("n"),
                F.sum("x").cast("long").alias("sx"),
                F.sum("yv").cast("long").alias("sy"),
                F.sum(F.col("x") * F.col("yv")).cast("long").alias("sxy"),
                F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
                F.sum(F.col("yv") * F.col("yv")).cast("long").alias("syy")))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    cov = dec("n") * dec("sxy") - dec("sx") * dec("sy")
    vx = dec("n") * dec("sxx") - dec("sx") * dec("sx")
    vy = dec("n") * dec("syy") - dec("sy") * dec("sy")
    stats = (agg.withColumn("cov_num", cov.cast("long"))
             .withColumn(
                 "r2_ppm",
                 (F.signum(cov).cast("long")
                  * F.floor((cov * cov * F.lit(1000000).cast("decimal(38,0)")
                             / (vx * vy)).cast("decimal(38,6)"))
                  ).cast("long")))
    w = Window.partitionBy("ta", "tb")
    best = F.max(F.struct(F.abs(F.col("r2_ppm")).alias("a"),
                          (-F.col("lag")).alias("nl"))).over(w)
    return (stats.withColumn("best_lag", (-best["nl"]).cast("int"))
            .select("ta", "tb", "lag", "n", "cov_num", "r2_ppm",
                    "best_lag"))


ORACLE_EVENTS_XCORR = """
WITH ev AS (
  SELECT event_type,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day
  FROM events),
counts AS (
  SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
  FROM ev GROUP BY event_type, day),
rng AS (SELECT min(day) AS lo, max(day) AS hi FROM ev),
spine AS (
  SELECT et.event_type, t.day
  FROM (SELECT DISTINCT event_type FROM counts) et
  CROSS JOIN rng, UNNEST(range(rng.lo, rng.hi + 1)) AS t(day)),
dense AS (
  SELECT s.event_type, s.day, COALESCE(c.y, 0) AS y
  FROM spine s LEFT JOIN counts c
    ON s.event_type = c.event_type AND s.day = c.day),
grid AS (
  SELECT CAST(l AS INT) AS lag, p.a AS ta, p.b AS tb
  FROM range(-3, 4) t(l), UNNEST([
    {'a': 'click', 'b': 'purchase'},
    {'a': 'view', 'b': 'click'},
    {'a': 'signup', 'b': 'purchase'}]) AS u(p)),
j AS (
  SELECT g.ta, g.tb, g.lag, a.y AS x, b.y AS yv
  FROM grid g
  JOIN dense a ON a.event_type = g.ta
  JOIN dense b ON b.event_type = g.tb AND b.day = a.day + g.lag),
agg AS (
  SELECT ta, tb, lag, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(yv) AS BIGINT) AS sy,
         CAST(sum(x * yv) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(yv * yv) AS BIGINT) AS syy
  FROM j GROUP BY ta, tb, lag),
stats AS (
  SELECT ta, tb, lag, n,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
              AS BIGINT) AS cov_num,
         CAST(CASE WHEN CAST(n AS HUGEINT) * sxy
                        - CAST(sx AS HUGEINT) * sy < 0
                   THEN -1
                   WHEN CAST(n AS HUGEINT) * sxy
                        - CAST(sx AS HUGEINT) * sy > 0
                   THEN 1 ELSE 0 END
              * ((CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                 * (CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
                 * 1000000
                 // ((CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
                     * (CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy)))
              AS BIGINT) AS r2_ppm
  FROM agg)
SELECT ta, tb, lag, n, cov_num, r2_ppm,
       CAST(-(MAX(struct_pack(a := abs(r2_ppm), nl := -lag))
              OVER (PARTITION BY ta, tb)).nl AS INT) AS best_lag
FROM stats
"""


def q_events_cart_split(spark, sf_dir):
    """CART regression-tree SPLIT SEARCH — the tree-training step
    (the decision-tree member of the training-pass family beside
    embeddings_kmeans_step / text_bpe_train_step): per event type,
    evaluate every hour-of-day threshold t in 1..23 for predicting
    the event's value (cents) and report the variance-reduction
    surrogate gain(t) = S_l^2*10^6 DIV n_l + S_r^2*10^6 DIV n_r
    (sum-of-squares is constant across splits, so maximizing this
    quantized gain picks CART's split; each term is an exact integer
    division in decimal space). The best split per type is flagged
    (ties -> smallest t). Empty sides score 0.

    Plan/scale: ONE (type, hour) census (map-side combinable, 24
    rows/type), thresholds evaluated by a triangle join on the tiny
    census — the event stream is read once; this is how a
    distributed GBDT layer evaluates split candidates from
    histograms (the LightGBM histogram trick)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("h"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"))
    hist = (ev.groupBy("event_type", "h")
            .agg(F.count("*").cast("long").alias("n"),
                 F.sum("cents").cast("long").alias("s")))
    thr = spark.range(1, 24).select(F.col("id").cast("int").alias("t"))
    sides = (hist.crossJoin(F.broadcast(thr))
             .groupBy("event_type", "t")
             .agg(F.sum(F.when(F.col("h") < F.col("t"), F.col("n"))
                        .otherwise(0)).cast("long").alias("n_l"),
                  F.sum(F.when(F.col("h") < F.col("t"), F.col("s"))
                        .otherwise(0)).cast("long").alias("s_l"),
                  F.sum(F.when(F.col("h") >= F.col("t"), F.col("n"))
                        .otherwise(0)).cast("long").alias("n_r"),
                  F.sum(F.when(F.col("h") >= F.col("t"), F.col("s"))
                        .otherwise(0)).cast("long").alias("s_r")))
    scored = sides.withColumn(
        "gain_u",
        F.expr(
            "CAST((CASE WHEN n_l = 0 THEN CAST(0 AS decimal(38,0)) "
            "ELSE CAST(s_l AS decimal(38,0)) * s_l * 1000000 DIV n_l "
            "END) + (CASE WHEN n_r = 0 THEN CAST(0 AS decimal(38,0)) "
            "ELSE CAST(s_r AS decimal(38,0)) * s_r * 1000000 DIV n_r "
            "END) AS decimal(38,0))"))
    w = Window.partitionBy("event_type")
    best = F.max(F.struct(F.col("gain_u").alias("g"),
                          (-F.col("t")).alias("nt"))).over(w)
    return (scored
            .withColumn("is_best",
                        ((F.col("gain_u") == best["g"])
                         & (F.col("t") == -best["nt"])).cast("int"))
            .select("event_type", "t", "n_l", "s_l", "n_r", "s_r",
                    F.col("gain_u").cast("decimal(38,0)").cast("string")
                    .alias("gain_u"), "is_best"))


ORACLE_EVENTS_CART_SPLIT = """
WITH ev AS (
  SELECT event_type, CAST(extract(hour FROM ts) AS INT) AS h,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
hist AS (
  SELECT event_type, h, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s
  FROM ev GROUP BY event_type, h),
thr AS (SELECT CAST(t AS INT) AS t FROM range(1, 24) x(t)),
sides AS (
  SELECT event_type, t,
         CAST(sum(CASE WHEN h < t THEN n ELSE 0 END) AS BIGINT) AS n_l,
         CAST(sum(CASE WHEN h < t THEN s ELSE 0 END) AS BIGINT) AS s_l,
         CAST(sum(CASE WHEN h >= t THEN n ELSE 0 END) AS BIGINT) AS n_r,
         CAST(sum(CASE WHEN h >= t THEN s ELSE 0 END) AS BIGINT) AS s_r
  FROM hist CROSS JOIN thr GROUP BY event_type, t),
scored AS (
  SELECT *,
         (CASE WHEN n_l = 0 THEN 0
               ELSE CAST(s_l AS HUGEINT) * s_l * 1000000 // n_l END)
         + (CASE WHEN n_r = 0 THEN 0
                 ELSE CAST(s_r AS HUGEINT) * s_r * 1000000 // n_r END)
           AS gain
  FROM sides)
SELECT event_type, t, n_l, s_l, n_r, s_r,
       CAST(gain AS VARCHAR) AS gain_u,
       CAST(CASE WHEN struct_pack(g := gain, nt := -t)
                 = MAX(struct_pack(g := gain, nt := -t))
                   OVER (PARTITION BY event_type)
            THEN 1 ELSE 0 END AS INT) AS is_best
FROM scored
"""


def q_events_holtwinters(spark, sf_dir):
    """Holt-Winters ADDITIVE seasonal smoothing (alpha = beta = gamma
    = 1/2, period 4) — the seasonal member of the forecasting family
    (events_holt_linear handles trend, this adds the repeating
    component): per event type, the dense last-12-day daily series
    (3 full periods), classical init (level = first-period mean,
    trend = period-mean difference / p^2, seasonals = first-period
    deviations), 8 unrolled smoothing steps, and forecasts
    f_h = l + h*b + s_(matching season) for h = 1..2. The period is a
    power of two so EVERY operation is a dyadic add/halve — exact
    IEEE doubles, zero rounding discipline needed; outputs scale into
    2^20 integer units.

    Plan/scale: same census+pivot shape as events_holt_linear — O(p)
    state per series regardless of history."""
    p, n = _HW_P, _HW_N
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.col("ts").cast("date"),
                   F.lit("2024-01-01").cast("date")).alias("day"))
    counts = ev.groupBy("event_type", "day").agg(
        F.count("*").cast("long").alias("y"))
    mx = ev.agg(F.max("day").alias("max_day"))
    spine = (counts.select("event_type").distinct()
             .crossJoin(F.broadcast(mx))
             .select("event_type", "max_day",
                     F.explode(F.sequence(F.col("max_day") - (n - 1),
                                          F.col("max_day"))).alias("day"))
             .withColumn("t", (F.col("day") - (F.col("max_day") - (n - 1))
                               + 1).cast("int"))
             .drop("max_day"))
    dense = (spine.join(counts, ["event_type", "day"], "left")
             .withColumn("y", F.coalesce(F.col("y"), F.lit(0))))
    piv = dense.groupBy("event_type").agg(*[
        F.max(F.when(F.col("t") == t, F.col("y"))).alias(f"y{t}")
        for t in range(1, n + 1)])
    # chained named projections (the Hilbert-walk discipline): each
    # step references COLUMNS, not inlined expression trees — a naive
    # env-substitution build grows the tree ~3^steps and stalls
    # Catalyst analysis for minutes
    df = piv
    for t in range(1, n + 1):
        df = df.withColumn(f"y{t}", F.col(f"y{t}").cast("double"))
    s1 = sum(F.col(f"y{i}") for i in range(1, p + 1))
    s2 = sum(F.col(f"y{i}") for i in range(p + 1, 2 * p + 1))
    df = df.withColumn(f"l{p}", s1 / float(p))
    df = df.withColumn(f"b{p}", (s2 - s1) / float(p * p))
    for i in range(1, p + 1):
        df = df.withColumn(f"s{i}", F.col(f"y{i}") - F.col(f"l{p}"))
    for t in range(p + 1, n + 1):
        df = df.withColumn(
            f"l{t}", (F.col(f"y{t}") - F.col(f"s{t - p}")
                      + F.col(f"l{t - 1}") + F.col(f"b{t - 1}")) / 2.0)
        df = df.withColumn(
            f"b{t}", ((F.col(f"l{t}") - F.col(f"l{t - 1}"))
                      + F.col(f"b{t - 1}")) / 2.0)
        df = df.withColumn(
            f"s{t}", ((F.col(f"y{t}") - F.col(f"l{t}"))
                      + F.col(f"s{t - p}")) / 2.0)
    l, b = F.col(f"l{n}"), F.col(f"b{n}")
    out = [F.round(l * (1 << 20)).cast("long").alias("level_u"),
           F.round(b * (1 << 20)).cast("long").alias("trend_u")]
    for h in (1, 2):
        sn = F.col(f"s{n + h - p}")
        out.append(F.round((l + h * b + sn) * (1 << 20)).cast("long")
                   .alias(f"f{h}_u"))
    for i in range(1, p + 1):
        out.append(F.round(F.col(f"s{n - p + i}") * (1 << 20))
                   .cast("long").alias(f"season{i}_u"))
    return df.select("event_type", *out)


def q_events_policy_replay(spark, sf_dir):
    """Offline POLICY EVALUATION by the replay method (Li et al.
    2011, WSDM — the unbiased offline bandit estimator): the logged
    stream (context x = hour // 6, logged arm = event_id % 3,
    binary reward = value > 256) evaluates three CANDIDATE policies
    without ever deploying them — only rounds where the candidate
    agrees with the logged arm count, and the estimate is
    matched-reward / matched-count. Per policy: match count, reward
    count, the value estimate in exact ppm, and the match RATE (the
    estimator's effective sample size — a policy that rarely agrees
    with the log has a high-variance estimate, which is the caveat
    the paper stresses).

    Plan/scale: one scan, a 3-policy literal explode, one census agg
    — evaluation is free at any log size."""
    ev = _t(spark, sf_dir, "events").select(
        (F.hour("ts") / 6).cast("int").alias("x"),
        (F.col("event_id") % 3).cast("int").alias("a_log"),
        (F.col("value") > 256).cast("long").alias("reward"))
    pol = F.array(F.lit("always0"), F.lit("by_context"), F.lit("mirror"))
    graded = (ev.withColumn("policy", F.explode(pol))
              .withColumn(
                  "a_pi",
                  F.when(F.col("policy") == "always0", F.lit(0))
                  .when(F.col("policy") == "by_context",
                        F.col("x") % 3)
                  .otherwise((F.col("x") + 1) % 3).cast("int"))
              .withColumn("match",
                          (F.col("a_pi") == F.col("a_log"))
                          .cast("long")))
    return (graded.groupBy("policy")
            .agg(F.count("*").cast("long").alias("n_rounds"),
                 F.sum("match").cast("long").alias("n_matched"),
                 F.sum(F.col("match") * F.col("reward")).cast("long")
                 .alias("n_reward"))
            .select("policy", "n_rounds", "n_matched", "n_reward",
                    F.expr("n_reward * 1000000 "
                           "DIV greatest(n_matched, 1)")
                    .alias("value_ppm"),
                    F.expr("n_matched * 1000000 DIV n_rounds")
                    .alias("match_ppm")))


ORACLE_EVENTS_POLICY_REPLAY = """
WITH ev AS (
  SELECT CAST(extract(hour FROM ts) // 6 AS INT) AS x,
         CAST(event_id % 3 AS INT) AS a_log,
         CASE WHEN value > 256 THEN 1 ELSE 0 END AS reward
  FROM events),
graded AS (
  SELECT p.policy,
         CASE WHEN p.policy = 'always0' THEN 0
              WHEN p.policy = 'by_context' THEN x % 3
              ELSE (x + 1) % 3 END AS a_pi,
         a_log, reward
  FROM ev, UNNEST(['always0', 'by_context', 'mirror']) p(policy)),
agg AS (
  SELECT policy, CAST(count(*) AS BIGINT) AS n_rounds,
         CAST(sum(CASE WHEN a_pi = a_log THEN 1 ELSE 0 END) AS BIGINT)
           AS n_matched,
         CAST(sum(CASE WHEN a_pi = a_log THEN reward ELSE 0 END)
              AS BIGINT) AS n_reward
  FROM graded GROUP BY policy)
SELECT policy, n_rounds, n_matched, n_reward,
       n_reward * 1000000 // greatest(n_matched, 1) AS value_ppm,
       n_matched * 1000000 // n_rounds AS match_ppm
FROM agg
"""


def q_events_dtw(spark, sf_dir):
    """Dynamic Time Warping between event-type daily series (Sakoe &
    Chiba 1978, band radius 2) — the alignment-tolerant similarity
    the lag-grid of events_xcorr can't express (xcorr shifts the
    WHOLE series; DTW warps locally): for the three (driver,
    follower) pairs, the banded DP over the shared last-8-day dense
    series (_holt_dense — the same table the forecasting rows
    smooth), all in exact integer arithmetic (|x_i - y_j| costs,
    min-of-neighbors recursion, out-of-band = +inf literal), plus
    the rigid L1 baseline. dtw <= l1 always (the identity path is in
    the band); strictly smaller where warping genuinely helps.

    Plan/scale: the DP is 40 banded cells unrolled as CHAINED
    projections over a 3-row table — Catalyst collapses them into
    one codegen stage; series extraction is the census+pivot shape
    (O(types x days), never O(events))."""
    piv = _holt_pivot(spark, sf_dir)
    pairs = spark.createDataFrame(_DTW_PAIRS, "pa string, pb string")
    a = piv.select(F.col("event_type").alias("pa"),
                   *[F.col(f"y{t}").alias(f"x{t}")
                     for t in range(1, _DTW_N + 1)])
    b = piv.select(F.col("event_type").alias("pb"),
                   *[F.col(f"y{t}").alias(f"yy{t}")
                     for t in range(1, _DTW_N + 1)])
    df = pairs.join(F.broadcast(a), "pa").join(F.broadcast(b), "pb")
    INF = F.lit(10 ** 15)

    def cell(i, j):
        return (F.col(f"d_{i}_{j}")
                if abs(i - j) <= _DTW_BAND and i >= 1 and j >= 1
                else (F.lit(0) if i == 0 and j == 0 else INF))

    for i, j in _dtw_cells():
        cost = F.abs(F.col(f"x{i}") - F.col(f"yy{j}"))
        best = F.least(cell(i - 1, j), cell(i, j - 1), cell(i - 1, j - 1))
        df = df.withColumn(f"d_{i}_{j}", (cost + best).cast("long"))
    l1 = sum(F.abs(F.col(f"x{t}") - F.col(f"yy{t}"))
             for t in range(1, _DTW_N + 1))
    return df.select(F.col("pa").alias("ta"), F.col("pb").alias("tb"),
                     F.col(f"d_{_DTW_N}_{_DTW_N}").alias("dtw"),
                     l1.cast("long").alias("l1"))


def q_events_hill_tail(spark, sf_dir):
    """Hill tail-index estimation (Hill 1975) over event values — the
    heavy-tail diagnostic that complements text_zipf_fit (vocabulary)
    and corpus_lognormal_fit (lengths): per event type, the top k=25
    order statistics x_1 >= ... >= x_k, hill = mean of
    ln(x_i / x_k) for i < k, and the implied tail exponent
    alpha = 1/hill — the number a capacity planner reads to know
    whether p999 spikes are exponential noise or a genuine power
    law. Values are exact cents; each log ratio is quantized to 1e-6
    integer units BEFORE the sum (the repo discipline), and alpha is
    an exact integer division of scaled units.

    Plan/scale: one rank window cut at k per type (the shuffle
    carries (type, cents)), then a k-row agg — O(k) state per
    series."""
    k_top = 25
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("cents"))
    w = Window.partitionBy("event_type").orderBy(
        F.desc("cents"), F.asc("event_type"))
    top = (ev.withColumn("rn", F.row_number().over(w))
           .filter(F.col("rn") <= k_top))
    xk = (top.filter(F.col("rn") == k_top)
          .select("event_type", F.col("cents").alias("xk")))
    terms = (top.filter(F.col("rn") < k_top)
             .join(xk, "event_type")
             .select("event_type", "xk",
                     F.round(F.log(F.col("cents").cast("double")
                                   / F.col("xk")) * 1e6).cast("long")
                     .alias("lr_u")))
    agg = (terms.groupBy("event_type")
           .agg(F.count("*").cast("long").alias("n_terms"),
                F.max("xk").cast("long").alias("xk"),
                F.sum("lr_u").cast("long").alias("sum_lr_u")))
    return agg.select(
        "event_type", "n_terms", "xk",
        F.expr("sum_lr_u DIV n_terms").alias("hill_u"),
        F.expr("CASE WHEN sum_lr_u > 0 THEN n_terms * 1000000000000 "
               "DIV sum_lr_u ELSE -1 END").alias("alpha_u"))


ORACLE_EVENTS_HILL_TAIL = """
WITH ev AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events),
top AS (
  SELECT event_type, cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY cents DESC, event_type ASC) AS rn
  FROM ev),
xk AS (SELECT event_type, cents AS xk FROM top WHERE rn = 25),
terms AS (
  SELECT t.event_type, x.xk,
         CAST(round(ln(CAST(t.cents AS DOUBLE) / x.xk) * 1000000.0)
              AS BIGINT) AS lr_u
  FROM top t JOIN xk x USING (event_type) WHERE t.rn < 25),
agg AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_terms,
         CAST(max(xk) AS BIGINT) AS xk,
         CAST(sum(lr_u) AS BIGINT) AS sum_lr_u
  FROM terms GROUP BY event_type)
SELECT event_type, n_terms, xk,
       sum_lr_u // n_terms AS hill_u,
       CASE WHEN sum_lr_u > 0
            THEN n_terms * 1000000000000 // sum_lr_u
            ELSE CAST(-1 AS BIGINT) END AS alpha_u
FROM agg
"""


def q_events_session_native(spark, sf_dir):
    """Spark's NATIVE ``session_window`` aggregation proven against
    the classical SQL gaps-and-islands definition — the engine
    feature the custom stateful sessionizer (stream_sessionize)
    reimplements, checked here for semantic equality: per user,
    6-hour-gap sessions summarized as (start, end, n_events). The
    DuckDB oracle has no session_window — it derives the SAME
    sessions from lag + running-sum islands, so a value-hash match
    IS the proof that Spark's built-in closes sessions exactly at
    gap > 6h with inclusive ends.

    Plan/scale: one shuffle on user_id serves the whole aggregation
    (session_window is a first-class group key, no self-join)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    sw = (ev.groupBy("user_id",
                     F.session_window("ts", "6 hours").alias("w"))
          .agg(F.count("*").cast("long").alias("n_events"),
               F.min("ts").alias("first_ts"),
               F.max("ts").alias("last_ts")))
    return (sw.select("user_id", "n_events", "first_ts", "last_ts")
            .withColumn("session_n", F.row_number().over(
                Window.partitionBy("user_id").orderBy("first_ts"))
                .cast("int")))


def q_events_mann_whitney(spark, sf_dir):
    """Mann-Whitney U rank-sum test with TIE CORRECTION — the
    nonparametric A/B significance test beside the KS row (KS
    compares whole CDFs; U asks specifically "does one group
    stochastically dominate?"): pair 'ab' splits values by event_id
    parity (null holds), pair 'ac' scales the B side 1.5x (must
    reject). Average ranks are carried DOUBLED (2*avg-rank is always
    an integer, ties included), U in the same half-units, and the
    normal-approximation decision |z| > 1.96 is evaluated as the
    cross-multiplied HUGEINT inequality
      (U2x - n1*n2)^2 * 120000 * N * (N-1)
        > 153664 * n1 * n2 * ((N+1)*N*(N-1) - sum(t^3 - t))
    — tie-corrected variance, no float ever.

    Plan/scale: per-pair value census (map-side combine), prior-count
    window over distinct values, one agg — the shuffle carries
    (pair, value, counts), never events."""
    ev = _t(spark, sf_dir, "events").select(
        (F.col("event_id") % 2).alias("grp"),
        F.expr("CAST(floor(value * 100 + 0.5) AS BIGINT)").alias("v"))
    a = ev.filter(F.col("grp") == 0).select("v")
    b = ev.filter(F.col("grp") == 1).select("v")
    bshift = b.select((F.col("v") + (F.col("v") / 2).cast("long"))
                      .alias("v"))

    def side(df, pair, g):
        return df.select(F.lit(pair).alias("pair"),
                         F.lit(g).alias("g"), "v")

    allrows = (side(a, "ab", 1).unionByName(side(b, "ab", 2))
               .unionByName(side(a, "ac", 1))
               .unionByName(side(bshift, "ac", 2)))
    census = (allrows.groupBy("pair", "v")
              .agg(F.sum((F.col("g") == 1).cast("long")).alias("c1"),
                   F.sum((F.col("g") == 2).cast("long")).alias("c2")))
    wprior = (Window.partitionBy("pair").orderBy("v")
              .rowsBetween(Window.unboundedPreceding, -1))
    ranked = (census
              .withColumn("t", F.col("c1") + F.col("c2"))
              .withColumn("prior",
                          F.coalesce(F.sum("t").over(wprior), F.lit(0))))
    # doubled average rank of this tie group: 2*(prior+1) + t - 1
    r2x = 2 * (F.col("prior") + 1) + F.col("t") - 1
    agg = (ranked.groupBy("pair")
           .agg(F.sum("c1").cast("long").alias("n1"),
                F.sum("c2").cast("long").alias("n2"),
                F.sum(F.col("c1") * r2x).cast("long").alias("r1_2x"),
                F.sum(F.col("t") * F.col("t") * F.col("t")
                      - F.col("t")).cast("long").alias("tie_sum")))
    dec = lambda c: F.col(c).cast("decimal(38,0)")
    u2x = dec("r1_2x") - dec("n1") * (dec("n1") + 1)
    nn = dec("n1") + dec("n2")
    k_corr = (nn + 1) * nn * (nn - 1) - dec("tie_sum")
    diff = u2x - dec("n1") * dec("n2")
    lhs = diff * diff * 120000 * nn * (nn - 1)
    rhs = F.lit(153664).cast("decimal(38,0)") * dec("n1") * dec("n2") \
        * k_corr
    return (agg.select(
        "pair", "n1", "n2",
        u2x.cast("long").alias("u2x"),
        F.col("tie_sum").alias("tie_sum"),
        (lhs > rhs).cast("int").alias("reject")))


ORACLE_EVENTS_MANN_WHITNEY = """
WITH ev AS (
  SELECT CAST(event_id % 2 AS INT) AS grp,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events),
sides AS (
  SELECT 'ab' AS pair, 1 AS g, v FROM ev WHERE grp = 0
  UNION ALL
  SELECT 'ab', 2, v FROM ev WHERE grp = 1
  UNION ALL
  SELECT 'ac', 1, v FROM ev WHERE grp = 0
  UNION ALL
  SELECT 'ac', 2, v + v // 2 FROM ev WHERE grp = 1),
census AS (
  SELECT pair, v,
         SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS c2
  FROM sides GROUP BY pair, v),
ranked AS (
  SELECT pair, v, c1, c2, c1 + c2 AS t,
         COALESCE(SUM(c1 + c2) OVER (PARTITION BY pair ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS prior
  FROM census),
agg AS (
  SELECT pair,
         CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 * (2 * (prior + 1) + t - 1)) AS BIGINT) AS r1_2x,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tie_sum
  FROM ranked GROUP BY pair)
SELECT pair, n1, n2,
       CAST(CAST(r1_2x AS HUGEINT) - CAST(n1 AS HUGEINT) * (n1 + 1)
            AS BIGINT) AS u2x,
       tie_sum,
       CAST(CASE WHEN
         (CAST(r1_2x AS HUGEINT) - CAST(n1 AS HUGEINT) * (n1 + 1)
          - CAST(n1 AS HUGEINT) * n2)
         * (CAST(r1_2x AS HUGEINT) - CAST(n1 AS HUGEINT) * (n1 + 1)
            - CAST(n1 AS HUGEINT) * n2)
         * 120000 * (CAST(n1 AS HUGEINT) + n2)
         * (CAST(n1 AS HUGEINT) + n2 - 1)
         > 153664 * CAST(n1 AS HUGEINT) * n2
           * ((CAST(n1 AS HUGEINT) + n2 + 1)
              * (CAST(n1 AS HUGEINT) + n2)
              * (CAST(n1 AS HUGEINT) + n2 - 1)
              - tie_sum)
       THEN 1 ELSE 0 END AS INT) AS reject
FROM agg
"""


def q_events_mad_outliers(spark, sf_dir):
    """Robust per-type outlier detection by Median Absolute Deviation
    — the metric-guard that survives the exact skew that breaks
    3-sigma (one whale purchase inflates a mean+stddev gate into
    uselessness; the median pair is immune): values quantized to
    exact cents, per event_type the nearest-rank-lower median
    (rank ceil(n/2) on a (value, event_id) total order), then the
    MAD as the same nearest-rank median of |v - med|, and the
    classic |v - med| > 3·MAD flag — all integer comparisons, no
    floats anywhere after the cent quantization.

    Plan/scale: two window phases BOTH partitioned on event_type —
    one exchange, reused; at 10^10 events add a salt on the rank
    phase exactly as frontier_host_agg does."""
    v = F.expr("cast(round(value * 100) as bigint)")
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", "event_type", v.alias("v_cents")))
    w_ord = (Window.partitionBy("event_type")
             .orderBy("v_cents", "event_id"))
    w_all = Window.partitionBy("event_type")
    ranked = (ev
              .withColumn("rn", F.row_number().over(w_ord))
              .withColumn("n", F.count("*").over(w_all)))
    with_med = ranked.withColumn(
        "med_cents",
        F.max(F.when(F.col("rn") == F.expr("(n + 1) div 2"),
                     F.col("v_cents"))
              .otherwise(F.lit(None))).over(w_all))
    dev = with_med.withColumn(
        "dev", F.abs(F.col("v_cents") - F.col("med_cents")))
    w_dev = (Window.partitionBy("event_type")
             .orderBy("dev", "event_id"))
    ranked2 = dev.withColumn("rn2", F.row_number().over(w_dev))
    with_mad = ranked2.withColumn(
        "mad_cents",
        F.max(F.when(F.col("rn2") == F.expr("(n + 1) div 2"),
                     F.col("dev"))
              .otherwise(F.lit(None))).over(w_all))
    return with_mad.select(
        "event_id", "event_type", "v_cents", "med_cents", "mad_cents",
        (F.col("dev") > 3 * F.col("mad_cents")).cast("int")
        .alias("is_outlier"))


ORACLE_EVENTS_MAD_OUTLIERS = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY v_cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev),
with_med AS (
  SELECT *, MAX(CASE WHEN rn = (n + 1) // 2 THEN v_cents END)
              OVER (PARTITION BY event_type) AS med_cents
  FROM ranked),
dev AS (
  SELECT *, abs(v_cents - med_cents) AS dv FROM with_med),
ranked2 AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY dv, event_id) AS rn2
  FROM dev),
with_mad AS (
  SELECT *, MAX(CASE WHEN rn2 = (n + 1) // 2 THEN dv END)
              OVER (PARTITION BY event_type) AS mad_cents
  FROM ranked2)
SELECT event_id, event_type, v_cents, med_cents, mad_cents,
       CAST(CASE WHEN dv > 3 * mad_cents THEN 1 ELSE 0 END AS INT)
         AS is_outlier
FROM with_mad
"""


def q_events_winsorize(spark, sf_dir):
    """Winsorized per-type means — the standard heavy-tail guard for
    metric aggregation (cap, don't drop: clamp every value into the
    exact [p10, p90] nearest-rank band, then average — robust like
    trimming but keeps n constant): values in exact cents, cut ranks
    lo = ceil(n/10), hi = ceil(9n/10) on a (value, event_id) total
    order (standard nearest-rank p10/p90),
    and both the raw and winsorized means emitted in exact
    micro-cents (sum·10^6 div n — integers end-to-end).

    Plan/scale: one window phase + one agg, both partitioned on
    event_type — a single exchange, the MAD row's shape."""
    v = F.expr("cast(round(value * 100) as bigint)")
    ev = (_t(spark, sf_dir, "events")
          .select("event_id", "event_type", v.alias("v_cents")))
    w_ord = (Window.partitionBy("event_type")
             .orderBy("v_cents", "event_id"))
    w_all = Window.partitionBy("event_type")
    ranked = (ev.withColumn("rn", F.row_number().over(w_ord))
              .withColumn("n", F.count("*").over(w_all)))
    ranked = (ranked
              .withColumn("lo_rank", F.expr("(n + 9) div 10"))
              .withColumn("hi_rank", F.expr("(9 * n + 9) div 10")))
    cut = (ranked
           .withColumn("lo_cents",
                       F.max(F.when(F.col("rn") == F.col("lo_rank"),
                                    F.col("v_cents"))).over(w_all))
           .withColumn("hi_cents",
                       F.max(F.when(F.col("rn") == F.col("hi_rank"),
                                    F.col("v_cents"))).over(w_all)))
    clamped = cut.withColumn(
        "w_cents",
        F.greatest("lo_cents", F.least("hi_cents", F.col("v_cents"))))
    return (clamped.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n"),
                 F.max("lo_cents").alias("lo_cents"),
                 F.max("hi_cents").alias("hi_cents"),
                 F.expr("(sum(v_cents) * 1000000) div count(*)")
                 .alias("mean_microcents"),
                 F.expr("(sum(w_cents) * 1000000) div count(*)")
                 .alias("winsor_mean_microcents")))


ORACLE_EVENTS_WINSORIZE = """
WITH ev AS (
  SELECT event_id, event_type,
         CAST(round(value * 100) AS BIGINT) AS v_cents
  FROM events),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
              ORDER BY v_cents, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM ev),
cuts AS (
  SELECT *, (n + 9) // 10 AS lo_rank,
         (9 * n + 9) // 10 AS hi_rank
  FROM ranked),
banded AS (
  SELECT *,
         MAX(CASE WHEN rn = lo_rank THEN v_cents END)
           OVER (PARTITION BY event_type) AS lo_cents,
         MAX(CASE WHEN rn = hi_rank THEN v_cents END)
           OVER (PARTITION BY event_type) AS hi_cents
  FROM cuts),
clamped AS (
  SELECT *, greatest(lo_cents, least(hi_cents, v_cents)) AS w_cents
  FROM banded)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       MAX(lo_cents) AS lo_cents, MAX(hi_cents) AS hi_cents,
       (sum(v_cents) * 1000000) // count(*) AS mean_microcents,
       (sum(w_cents) * 1000000) // count(*) AS winsor_mean_microcents
FROM clamped GROUP BY event_type
"""


def q_events_countmin(spark, sf_dir):
    """Count-Min sketch accuracy audit (Cormode & Muthukrishnan 2005)
    — the fixed-memory frequency sketch a 10^10-event stream uses
    where an exact per-key count cannot fit: d=4 rows x w=32
    counters, hash_j(key) = ((key·A_j + B_j) mod P) mod w with P =
    2^31-1 (portable integer hashing — NO engine-specific hash
    function), estimate = min over rows. Audited against the exact
    per-user counts: the sketch may only OVERestimate (est >= true
    always — collisions add, never subtract), and the error column
    shows by how much at this deliberately tiny w.

    Plan/scale: counters are ONE map-side-combinable agg over the
    exploded (row, bucket) pairs — 128 cells total regardless of
    stream size — then a broadcast join of those 128 cells onto the
    per-key truth. The sketch is the broadcastable summary; the
    exact count is the audit, not the product."""
    ev = _t(spark, sf_dir, "events").select("user_id")
    cells = F.array(*[
        F.struct(F.lit(j).alias("j"),
                 (((F.col("user_id") * _CMS_A[j] + _CMS_B[j])
                   % _CMS_P) % _CMS_W).alias("bucket"))
        for j in range(_CMS_D)])
    counters = (ev.select(F.explode(cells).alias("c"))
                .groupBy(F.col("c.j").alias("j"),
                         F.col("c.bucket").alias("bucket"))
                .agg(F.count("*").cast("long").alias("cnt")))
    truth = (ev.groupBy("user_id")
             .agg(F.count("*").cast("long").alias("true_n")))
    probes = truth.select(
        "user_id", "true_n",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"),
                     (((F.col("user_id") * _CMS_A[j] + _CMS_B[j])
                       % _CMS_P) % _CMS_W).alias("bucket"))
            for j in range(_CMS_D)])).alias("p"))
    est = (probes.join(F.broadcast(counters),
                       (F.col("p.j") == F.col("j"))
                       & (F.col("p.bucket") == F.col("bucket")))
           .groupBy("user_id", "true_n")
           .agg(F.min("cnt").alias("est_n")))
    return est.select(
        "user_id", "true_n", "est_n",
        (F.col("est_n") - F.col("true_n")).alias("overcount"),
        (F.col("est_n") >= F.col("true_n")).cast("int")
        .alias("never_under"))


ORACLE_EVENTS_COUNTMIN = """
WITH ev AS (SELECT user_id FROM events),
cells AS (
  SELECT user_id, j,
         ((user_id * (CASE j WHEN 0 THEN 1103 WHEN 1 THEN 12289
                      WHEN 2 THEN 786433 ELSE 908209 END)
           + (CASE j WHEN 0 THEN 12345 WHEN 1 THEN 67891
              WHEN 2 THEN 24681 ELSE 13579 END))
          % 2147483647) % 32 AS bucket
  FROM ev, (SELECT unnest(range(4)) AS j)),
counters AS (
  SELECT j, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM cells GROUP BY j, bucket),
truth AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS true_n
  FROM ev GROUP BY user_id),
probes AS (
  SELECT t.user_id, t.true_n, j,
         ((t.user_id * (CASE j WHEN 0 THEN 1103 WHEN 1 THEN 12289
                        WHEN 2 THEN 786433 ELSE 908209 END)
           + (CASE j WHEN 0 THEN 12345 WHEN 1 THEN 67891
              WHEN 2 THEN 24681 ELSE 13579 END))
          % 2147483647) % 32 AS bucket
  FROM truth t, (SELECT unnest(range(4)) AS j)),
est AS (
  SELECT p.user_id, p.true_n, min(c.cnt) AS est_n
  FROM probes p JOIN counters c ON c.j = p.j AND c.bucket = p.bucket
  GROUP BY p.user_id, p.true_n)
SELECT user_id, true_n, est_n,
       est_n - true_n AS overcount,
       CAST(CASE WHEN est_n >= true_n THEN 1 ELSE 0 END AS INT)
         AS never_under
FROM est
"""


def q_events_forward_fill(spark, sf_dir):
    """Gap-filling (LOCF forward fill) over a sensor/metric tick grid
    — the resampling step before any per-tick comparison of
    irregular telemetry (fetch-rate gauges, per-host health probes):
    the sparse readings are joined onto the full (sensor, tick) grid
    and each hole takes the LAST present value, implemented WITHOUT
    `IGNORE NULLS` (not portable across engines): a running
    MAX(CASE WHEN present THEN t END) window finds each row's
    last-present tick, and a self-equi-join on (sensor, last_t)
    fetches that tick's value — the two-phase trick that works on
    any SQL engine. Leading holes stay unfilled (-1) and every fill
    carries its AGE so consumers can bound staleness.

    Fixture: 5 sensors x 20 ticks, reading absent when (s+t)%4=0.

    Plan/scale: one window + one self-join, both keyed on sensor —
    a single partitioning reused."""
    grid = spark.range(100).select(
        (F.col("id") % 5).alias("s"),
        (F.col("id") / 5).cast("long").alias("t"))
    readings = (grid.filter((F.col("s") + F.col("t")) % 4 != 0)
                .select("s", "t",
                        (F.col("s") * 100 + F.col("t"))
                        .alias("value")))
    full = (grid.join(readings, ["s", "t"], "left")
            .withColumn("present",
                        F.col("value").isNotNull().cast("int")))
    w = (Window.partitionBy("s").orderBy("t")
         .rowsBetween(Window.unboundedPreceding, 0))
    full = full.withColumn(
        "last_t",
        F.max(F.when(F.col("present") == 1, F.col("t"))).over(w))
    src = readings.select(F.col("s").alias("s2"),
                          F.col("t").alias("t2"),
                          F.col("value").alias("last_value"))
    return (full.join(src, (F.col("s") == F.col("s2"))
                      & (F.col("last_t") == F.col("t2")), "left")
            .select("s", "t", "present",
                    F.coalesce("last_value", F.lit(-1))
                    .alias("filled_value"),
                    F.coalesce(F.col("t") - F.col("last_t"),
                               F.lit(-1)).alias("fill_age")))


ORACLE_EVENTS_FORWARD_FILL = """
WITH grid AS (
  SELECT i % 5 AS s, i // 5 AS t
  FROM (SELECT unnest(range(100)) AS i)),
readings AS (
  SELECT s, t, s * 100 + t AS value
  FROM grid WHERE (s + t) % 4 <> 0),
full_ AS (
  SELECT g.s, g.t, r.value,
         CASE WHEN r.value IS NOT NULL THEN 1 ELSE 0 END AS present
  FROM grid g LEFT JOIN readings r ON r.s = g.s AND r.t = g.t),
marked AS (
  SELECT *, MAX(CASE WHEN present = 1 THEN t END)
              OVER (PARTITION BY s ORDER BY t
                    ROWS UNBOUNDED PRECEDING) AS last_t
  FROM full_)
SELECT m.s, m.t, m.present,
       COALESCE(r2.value, -1) AS filled_value,
       COALESCE(m.t - m.last_t, -1) AS fill_age
FROM marked m
LEFT JOIN readings r2 ON r2.s = m.s AND r2.t = m.last_t
"""


def q_events_latency_hdr(spark, sf_dir):
    """HDR-style power-of-two latency histogram with integer-exact
    log2 bucketing — the fixed-size latency summary every fetch
    fleet exports (exponential buckets keep tail resolution
    without unbounded cardinality): bucket = floor(log2(v)) computed
    WITHOUT floating log as length(binary(v)) - 1 (bit-length — the
    engines' binary-string formatters agree exactly where any
    float log2 would wobble at bucket edges), plus per-type
    cumulative counts and the nearest-rank p50/p95 BUCKET each type
    lands in.

    Plan/scale: one (type, bucket) agg then a per-type window over
    ~64 bucket rows — never over raw events."""
    v = F.expr("cast(round(value * 100) as bigint)")
    ev = (_t(spark, sf_dir, "events")
          .select("event_type", v.alias("v"))
          .filter(F.col("v") > 0))
    bucketed = ev.select(
        "event_type",
        (F.length(F.expr("bin(v)")) - 1).cast("int").alias("bucket"))
    hist = (bucketed.groupBy("event_type", "bucket")
            .agg(F.count("*").cast("long").alias("cnt")))
    w_cum = (Window.partitionBy("event_type").orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_all = Window.partitionBy("event_type")
    hist = (hist.withColumn("cum", F.sum("cnt").over(w_cum)
                            .cast("long"))
            .withColumn("n", F.sum("cnt").over(w_all).cast("long")))
    hist = (hist
            .withColumn("p50_bucket",
                        F.min(F.when(F.col("cum") * 2 >= F.col("n"),
                                     F.col("bucket"))).over(w_all)
                        .cast("int"))
            .withColumn("p95_bucket",
                        F.min(F.when(F.col("cum") * 20
                                     >= F.col("n") * 19,
                                     F.col("bucket"))).over(w_all)
                        .cast("int")))
    return hist.select("event_type", "bucket", "cnt", "cum",
                       "p50_bucket", "p95_bucket")


ORACLE_EVENTS_LATENCY_HDR = """
WITH ev AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
  FROM events WHERE CAST(round(value * 100) AS BIGINT) > 0),
bucketed AS (
  SELECT event_type,
         CAST(length(printf('%b', v)) - 1 AS INT) AS bucket
  FROM ev),
hist AS (
  SELECT event_type, bucket, CAST(count(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY event_type, bucket),
cums AS (
  SELECT *, CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY
              bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hist)
SELECT event_type, bucket, cnt, cum,
       CAST(MIN(CASE WHEN cum * 2 >= n THEN bucket END)
            OVER (PARTITION BY event_type) AS INT) AS p50_bucket,
       CAST(MIN(CASE WHEN cum * 20 >= n * 19 THEN bucket END)
            OVER (PARTITION BY event_type) AS INT) AS p95_bucket
FROM cums
"""


def q_events_calendar_join(spark, sf_dir):
    """Business-calendar classification of the event stream — the
    seasonality-aware roll-up every traffic model needs (weekend
    and holiday days must not train the weekday baseline): days are
    indexed as day_index = days since 2024-01-01 (a MONDAY — so
    weekday = day_index % 7 with 0=Mon is exact arithmetic, dodging
    the engines' incompatible dayofweek conventions entirely), the
    holiday set joins as a literal broadcast dim, and each day rolls
    up with its workday / weekend / holiday class (holiday wins).

    Plan/scale: map-side day arithmetic + one census agg + broadcast
    holiday join — no engine-specific calendar functions in the
    row path."""
    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("long").alias("day_index"),
        F.expr("cast(round(value * 100) as bigint)").alias("v"))
    days = (ev.groupBy("day_index")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum("v").cast("long").alias("value_cents")))
    hol = spark.createDataFrame(
        [(d,) for d in _HOLIDAY_DAYS], ["day_index"]) \
        .withColumn("is_holiday", F.lit(1))
    days = (days.join(F.broadcast(hol), "day_index", "left")
            .withColumn("is_holiday",
                        F.coalesce("is_holiday", F.lit(0))))
    wd = (F.col("day_index") % 7).cast("int")
    return (days
            .withColumn("weekday", wd)
            .withColumn("is_weekend", (wd >= 5).cast("int"))
            .withColumn("day_class",
                        F.when(F.col("is_holiday") == 1, "holiday")
                        .when(wd >= 5, "weekend")
                        .otherwise(F.lit("workday"))))


ORACLE_EVENTS_CALENDAR_JOIN = """
WITH ev AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
           AS day_index,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events),
days AS (
  SELECT day_index, CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(v) AS BIGINT) AS value_cents
  FROM ev GROUP BY day_index),
hol AS (SELECT unnest([0, 14, 45, 90, 120, 180]) AS day_index),
joined AS (
  SELECT d.*, CASE WHEN h.day_index IS NOT NULL THEN 1 ELSE 0 END
           AS is_holiday
  FROM days d LEFT JOIN hol h ON h.day_index = d.day_index)
SELECT day_index, n_events, value_cents, is_holiday,
       CAST(day_index % 7 AS INT) AS weekday,
       CAST(CASE WHEN day_index % 7 >= 5 THEN 1 ELSE 0 END AS INT)
         AS is_weekend,
       CASE WHEN is_holiday = 1 THEN 'holiday'
            WHEN day_index % 7 >= 5 THEN 'weekend'
            ELSE 'workday' END AS day_class
FROM joined
"""


def q_events_sliding_distinct(spark, sf_dir):
    """EXACT sliding-window distinct users (3-day window ending each
    day) — the rolling-reach metric HLL sketches approximate, pinned
    exactly: each event is EXPLODED into the three windows it
    belongs to (window w sees days w-2..w), then one
    (window, user) dedup feeds the distinct count — the standard
    exact-rolling-distinct shape whose cost is window_len x |events|
    explode, which is why sketches exist at 10^10 (this row is their
    ground truth).

    Plan/scale: explode(3) map-side, then a two-phase
    count-distinct agg keyed on the window day."""
    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("long").alias("d"),
        "user_id")
    exploded = ev.select(
        "user_id",
        F.explode(F.expr("array(d, d + 1, d + 2)")).alias("w"))
    return (exploded.groupBy("w")
            .agg(F.count("*").cast("long").alias("n_events_window"),
                 F.countDistinct("user_id").cast("long")
                 .alias("n_users_distinct"))
            .withColumnRenamed("w", "window_day"))


ORACLE_EVENTS_SLIDING_DISTINCT = """
WITH ev AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
         user_id
  FROM events),
exploded AS (
  SELECT user_id, d + o AS w
  FROM ev, (SELECT unnest([0, 1, 2]) AS o))
SELECT w AS window_day,
       CAST(count(*) AS BIGINT) AS n_events_window,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_distinct
FROM exploded GROUP BY w
"""


def q_events_wow_delta(spark, sf_dir):
    """Day-over-day / week-over-week traffic deltas — the first
    dashboard any crawl or ingest pipeline grows, done by CALENDAR
    self-join rather than row-lag (a lag() over row order silently
    compares across gaps when a day is missing; joining on
    day_index-1 and day_index-7 compares the calendar, with -1
    sentinels where no baseline exists): per day, counts plus exact
    ppm deltas vs yesterday and the same weekday last week.

    Plan/scale: one census agg, then two self-joins of the tiny
    per-day table — the joins never touch raw events."""
    ev = _t(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("long").alias("d"))
    daily = (ev.groupBy("d")
             .agg(F.count("*").cast("long").alias("n")))
    p1 = daily.select(F.col("d").alias("d1"),
                      F.col("n").alias("n_prev_day"))
    p7 = daily.select(F.col("d").alias("d7"),
                      F.col("n").alias("n_prev_week"))
    j = (daily
         .join(p1, daily["d"] - 1 == p1["d1"], "left")
         .join(p7, daily["d"] - 7 == p7["d7"], "left")
         .drop("d1", "d7"))
    return (j
            .withColumn("n_prev_day",
                        F.coalesce("n_prev_day", F.lit(-1)))
            .withColumn("n_prev_week",
                        F.coalesce("n_prev_week", F.lit(-1)))
            .withColumn(
                "dod_delta_ppm",
                F.when(F.col("n_prev_day") > 0,
                       F.expr("((n - n_prev_day) * 1000000)"
                              " div n_prev_day"))
                .otherwise(F.lit(None)).cast("long"))
            .withColumn(
                "wow_delta_ppm",
                F.when(F.col("n_prev_week") > 0,
                       F.expr("((n - n_prev_week) * 1000000)"
                              " div n_prev_week"))
                .otherwise(F.lit(None)).cast("long"))
            .withColumnRenamed("d", "day_index"))


ORACLE_EVENTS_WOW_DELTA = """
WITH ev AS (
  SELECT date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d
  FROM events),
daily AS (
  SELECT d, CAST(count(*) AS BIGINT) AS n FROM ev GROUP BY d),
j AS (
  SELECT a.d AS day_index, a.n,
         COALESCE(b.n, -1) AS n_prev_day,
         COALESCE(c.n, -1) AS n_prev_week
  FROM daily a
  LEFT JOIN daily b ON b.d = a.d - 1
  LEFT JOIN daily c ON c.d = a.d - 7)
SELECT day_index, n, n_prev_day, n_prev_week,
       CASE WHEN n_prev_day > 0
            THEN ((n - n_prev_day) * 1000000) // n_prev_day
       END AS dod_delta_ppm,
       CASE WHEN n_prev_week > 0
            THEN ((n - n_prev_week) * 1000000) // n_prev_week
       END AS wow_delta_ppm
FROM j
"""


def q_events_flap_detect(spark, sf_dir):
    """Alert flap detection — the monitoring hygiene rule that keeps
    a fetch fleet's pager sane (a threshold alert crossing back and
    forth every few samples is noise, not signal; flapping alerts
    get damped, not paged): per event_type the value stream
    (ordered by event_id) binarizes against the alert threshold,
    TRANSITIONS count via lag comparison, and a type flaps when
    more than 10% of samples are transitions.

    Plan/scale: one per-type lag window + census on the same key —
    single exchange."""
    v = F.expr("cast(round(value * 100) as bigint)")
    ev = (_t(spark, sf_dir, "events")
          .select("event_type", "event_id", v.alias("v")))
    state = (F.col("v") > 10000).cast("int")
    w = Window.partitionBy("event_type").orderBy("event_id")
    marked = (ev.withColumn("state", state)
              .withColumn("prev_state",
                          F.lag("state").over(w))
              .withColumn("transition",
                          (F.col("prev_state").isNotNull()
                           & (F.col("state")
                              != F.col("prev_state")))
                          .cast("long")))
    return (marked.groupBy("event_type")
            .agg(F.count("*").cast("long").alias("n_samples"),
                 F.sum("transition").cast("long")
                 .alias("n_transitions"),
                 F.sum("state").cast("long").alias("n_active"))
            .withColumn("flapping",
                        (F.col("n_transitions") * 10
                         > F.col("n_samples")).cast("int")))


ORACLE_EVENTS_FLAP_DETECT = """
WITH ev AS (
  SELECT event_type, event_id,
         CASE WHEN CAST(round(value * 100) AS BIGINT) > 10000
              THEN 1 ELSE 0 END AS state
  FROM events),
marked AS (
  SELECT event_type, state,
         LAG(state) OVER (PARTITION BY event_type ORDER BY event_id)
           AS prev_state
  FROM ev)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(CASE WHEN prev_state IS NOT NULL
                AND state <> prev_state THEN 1 ELSE 0 END) AS BIGINT)
         AS n_transitions,
       CAST(sum(state) AS BIGINT) AS n_active,
       CAST(CASE WHEN sum(CASE WHEN prev_state IS NOT NULL
                 AND state <> prev_state THEN 1 ELSE 0 END) * 10
                 > count(*) THEN 1 ELSE 0 END AS INT) AS flapping
FROM marked GROUP BY event_type
"""


def q_events_wasserstein_drift(spark, sf_dir):
    """Exact Wasserstein-1 (earth-mover) drift between each event
    type's FIRST-half and SECOND-half value distributions — the
    drift metric that, unlike the KS sup-norm already in the
    registry, weights HOW FAR mass moved, not just the single worst
    CDF gap: W1 = integral |F_A - F_B| computes exactly as
    sum over consecutive distinct values of
    |cumA·nB - cumB·nA| · gap, carried in integer (nA·nB)-units —
    the common-denominator trick that removes every division until
    the final report in milli-cents.

    Plan/scale: one per-type ordered window pass over the merged
    tagged sample (cum counts + lead gap) + one census agg — the
    same single exchange every per-type window row pays."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "event_id",
        F.expr("cast(round(value * 100) as bigint)").alias("v"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01"))
        .cast("long").alias("d"))
    half = ev.withColumn("tag",
                         F.when(F.col("d") < 15, "a")
                         .otherwise(F.lit("b")))
    w_all = Window.partitionBy("event_type")
    half = (half
            .withColumn("na", F.sum((F.col("tag") == "a")
                                    .cast("long")).over(w_all))
            .withColumn("nb", F.sum((F.col("tag") == "b")
                                    .cast("long")).over(w_all)))
    w_ord = (Window.partitionBy("event_type")
             .orderBy("v", "event_id")
             .rowsBetween(Window.unboundedPreceding, 0))
    w_lead = (Window.partitionBy("event_type")
              .orderBy("v", "event_id"))
    marked = (half
              .withColumn("cum_a", F.sum((F.col("tag") == "a")
                                         .cast("long")).over(w_ord))
              .withColumn("cum_b", F.sum((F.col("tag") == "b")
                                         .cast("long")).over(w_ord))
              .withColumn("next_v", F.lead("v").over(w_lead)))
    contrib = F.when(
        F.col("next_v").isNull(), F.lit(0)).otherwise(
        F.abs(F.col("cum_a") * F.col("nb")
              - F.col("cum_b") * F.col("na"))
        * (F.col("next_v") - F.col("v")))
    agg = (marked.withColumn("c", contrib)
           .groupBy("event_type")
           .agg(F.max("na").alias("na"), F.max("nb").alias("nb"),
                F.sum("c").cast("long").alias("w1_scaled")))
    return agg.withColumn(
        "w1_millicents",
        F.expr("(w1_scaled * 1000) div (na * nb)"))


ORACLE_EVENTS_WASSERSTEIN_DRIFT = """
WITH ev AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         CASE WHEN date_diff('day', DATE '2024-01-01',
                             CAST(ts AS DATE)) < 15
              THEN 'a' ELSE 'b' END AS tag
  FROM events),
sized AS (
  SELECT *,
         SUM(CASE WHEN tag = 'a' THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type) AS na,
         SUM(CASE WHEN tag = 'b' THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type) AS nb
  FROM ev),
marked AS (
  SELECT *,
         SUM(CASE WHEN tag = 'a' THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY v, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(CASE WHEN tag = 'b' THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY v, event_id
                 ROWS UNBOUNDED PRECEDING) AS cum_b,
         LEAD(v) OVER (PARTITION BY event_type
                       ORDER BY v, event_id) AS next_v
  FROM sized),
agg AS (
  SELECT event_type, max(na) AS na, max(nb) AS nb,
         CAST(sum(CASE WHEN next_v IS NULL THEN 0
                  ELSE abs(cum_a * nb - cum_b * na) * (next_v - v)
                  END) AS BIGINT) AS w1_scaled
  FROM marked GROUP BY event_type)
SELECT event_type, CAST(na AS BIGINT) AS na,
       CAST(nb AS BIGINT) AS nb, w1_scaled,
       (w1_scaled * 1000) // (na * nb) AS w1_millicents
FROM agg
"""
