"""Streaming-operator queries, batch-checkable (SURVEY §2.B streaming row).

``window()`` / ``session_window()`` evaluate identically on static
DataFrames, so the correctness gate runs them in batch against a DuckDB
oracle; tests/test_streaming.py runs the same operators through a real
``readStream`` and asserts equal results.  Watermark late-drop semantics
are expressed explicitly (running-max event-time over arrival order) so
DuckDB can mirror them.

Scale notes: streaming aggs shuffle on (window, key) — state-store size
is |windows × keys|, bounded by the watermark horizon.  The batch forms
below have the same shuffle profile.
"""

from __future__ import annotations

from qin_cdc_spark.testing import gate_tmp

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from qin_cdc_spark.sources.tables import load_table


def ev_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window agg per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


EV_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS win_start, event_type,
       count(*) AS n_events, sum(value) AS sum_value
FROM events GROUP BY 1, 2
"""


def ev_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes (each event in 2 windows)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.avg("value").alias("avg_value"))
        .select(F.col("w.start").alias("win_start"), "n_events", "avg_value")
    )


EV_SLIDING_ORACLE = """
WITH slid AS (
  SELECT make_timestamp(((CAST(floor(epoch(ts) / 1800) AS BIGINT) - k.k) * 1800) * 1000000)
           AS win_start,
         value
  FROM events CROSS JOIN (SELECT unnest([0, 1]) AS k) k
  WHERE epoch(ts) - (CAST(floor(epoch(ts) / 1800) AS BIGINT) - k.k) * 1800 < 3600
)
SELECT win_start, count(*) AS n_events, avg(value) AS avg_value
FROM slid GROUP BY win_start
"""


def ev_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


# Gaps-and-islands mirror: new session when the gap >= 10 minutes
# (Spark extends a session while ts < last_ts + gap).
EV_SESSION_ORACLE = """
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL 10 MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
)
SELECT user_id, min(ts) AS sess_start,
       max(ts) + INTERVAL 10 MINUTE AS sess_end,
       count(*) AS n_events, sum(value) AS sum_value
FROM sess GROUP BY user_id, sess_id
"""


def ev_dedup_first_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-dedup analog: first event per (user_id, event_type) in
    event-time order (deterministic tie-break on event_id).  In a live
    stream this is ``dropDuplicates`` with watermark; batch form uses
    min_by so partial aggregation keeps the shuffle at |keys|."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min_by(F.struct("event_id", "ts", "value"), F.struct("ts", "event_id")).alias("_f")
    ).select(
        "user_id",
        "event_type",
        F.col("_f.event_id").alias("first_event_id"),
        F.col("_f.ts").alias("first_ts"),
        F.col("_f.value").alias("first_value"),
    )


EV_DEDUP_ORACLE = """
SELECT user_id, event_type,
       event_id AS first_event_id, ts AS first_ts, value AS first_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) AS rn
      FROM events)
WHERE rn = 1
"""


def ev_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark semantics made explicit: arrival order = event_id, the
    watermark is (running max event-time − 10 min), and an event is late
    iff its event time is below the watermark at arrival.  This is the
    deterministic per-row form of ``withWatermark('ts','10 minutes')``
    late-data dropping; tests compare it with a real stream run."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("event_id").rowsBetween(Window.unboundedPreceding, -1)
    return (
        ev.withColumn("wm", F.max("ts").over(w) - F.expr("INTERVAL 10 MINUTES"))
        .filter(F.col("wm").isNull() | (F.col("ts") >= F.col("wm")))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


EV_WATERMARK_ORACLE = """
SELECT event_id, ts, user_id, event_type, value
FROM (
  SELECT *, max(ts) OVER (ORDER BY event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            - INTERVAL 10 MINUTE AS wm
  FROM events
)
WHERE wm IS NULL OR ts >= wm
"""


QUERIES = {
    "ev_tumbling_window": ev_tumbling_window,
    "ev_sliding_window": ev_sliding_window,
    "ev_session_window": ev_session_window,
    "ev_dedup_first_by_key": ev_dedup_first_by_key,
    "ev_watermark_late_drop": ev_watermark_late_drop,
}

ORACLES = {
    "ev_tumbling_window": EV_TUMBLING_ORACLE,
    "ev_sliding_window": EV_SLIDING_ORACLE,
    "ev_session_window": EV_SESSION_ORACLE,
    "ev_dedup_first_by_key": EV_DEDUP_ORACLE,
    "ev_watermark_late_drop": EV_WATERMARK_ORACLE,
}


def ev_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composable sessionization: new session when the per-user gap
    exceeds 30 min (lag + cumulative sum of boundary flags) — the
    window-function formulation that, unlike ``session_window``, leaves
    per-event rows available for downstream ops.  One shuffle on
    user_id; session stats per (user, session)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = ev.select(
        "user_id", "ts", "event_id", "value", F.sum(is_new).over(w).alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum("value").alias("sum_value"),
    )


EV_SESSIONIZE_GAP_ORACLE = """
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts, value,
         -- BIGINT: DuckDB's windowed sum(int) is HUGEINT, Spark's is bigint
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       sum(value) AS sum_value
FROM sess GROUP BY user_id, session_id
"""


def ev_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first 'view' precedes their first
    'click' precedes their first 'purchase' — conditional min-timestamp
    aggregation (one shuffle on user_id), the standard conversion
    query."""
    ev = load_table(spark, sf_dir, "events")
    first_of = lambda t: F.min(  # noqa: E731
        F.when(F.col("event_type") == t, F.col("ts"))
    )
    per_user = ev.groupBy("user_id").agg(
        first_of("view").alias("t_view"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    return per_user.select(
        "user_id",
        "t_view",
        "t_click",
        "t_purchase",
        (
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & F.col("t_purchase").isNotNull()
            & (F.col("t_view") < F.col("t_click"))
            & (F.col("t_click") < F.col("t_purchase"))
        ).alias("converted"),
    )


EV_FUNNEL_ORACLE = """
SELECT user_id,
       min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
       min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
       min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase,
       coalesce(
         min(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
         AND min(CASE WHEN event_type = 'click' THEN ts END) IS NOT NULL
         AND min(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
         AND min(CASE WHEN event_type = 'view' THEN ts END)
             < min(CASE WHEN event_type = 'click' THEN ts END)
         AND min(CASE WHEN event_type = 'click' THEN ts END)
             < min(CASE WHEN event_type = 'purchase' THEN ts END), false)
         AS converted
FROM events GROUP BY user_id
"""

QUERIES["ev_sessionize_gap"] = ev_sessionize_gap
QUERIES["ev_funnel_conversion"] = ev_funnel_conversion
ORACLES["ev_sessionize_gap"] = EV_SESSIONIZE_GAP_ORACLE
ORACLES["ev_funnel_conversion"] = EV_FUNNEL_ORACLE


def ev_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-activity day (cohort),
    counted as retained in each later day they return.  Two shuffles
    (first-seen agg on user_id, then cohort-cell agg) — the standard
    growth-analytics rollup."""
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(first_seen, "user_id")
        .withColumn(
            "day_offset",
            F.datediff(F.to_date(F.col("ts")), F.col("cohort_day")),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


EV_COHORT_ORACLE = """
WITH first_seen AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT cohort_day,
       CAST(datediff('day', cohort_day, CAST(ts AS DATE)) AS INTEGER) AS day_offset,
       count(DISTINCT e.user_id) AS n_active
FROM events e JOIN first_seen USING (user_id)
GROUP BY 1, 2
"""

QUERIES["ev_cohort_retention"] = ev_cohort_retention
ORACLES["ev_cohort_retention"] = EV_COHORT_ORACLE


def rollup_continuous_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The month-partitioned RollupStore, oracle-checked end to end:
    two ADDITIVE merge batches (events split by id parity — different
    batch compositions must converge to the single-pass aggregate) into
    a snapshot-pointer store, then read back.

    Values quantize to integer cents (floor(value·100)) BEFORE the
    additive merge — float sums are not associative, so a two-batch
    (sumA + sumB) can land on the other side of a rounding boundary
    from DuckDB's one-pass sum (observed at sf0.1, round 2); integer
    sums are exact under any batch composition.  This is also the
    correct 100 TB practice for money-like rollups (fixed-point, not
    float accumulation)."""
    import tempfile

    from qin_cdc_spark.streaming.rollup import RollupStore

    ev = load_table(spark, sf_dir, "events").withColumn(
        "value_c", F.floor(F.col("value") * 100).cast("long")
    )
    store = RollupStore(
        spark,
        gate_tmp("rollup_gate_") + "/store",
        keys=["event_type"],
        value_col="value_c",
        window_duration="1 hour",
    )
    store.merge_batch(ev.filter(F.col("event_id") % 2 == 0), 0, run_id="gate")
    store.merge_batch(ev.filter(F.col("event_id") % 2 == 1), 1, run_id="gate")
    return store.read().select(
        "window_start",
        "event_type",
        "cnt",
        # exact: the stored double sum is integer-valued (sum of longs)
        F.col("sum_value").cast("long").alias("sum_cents"),
        F.round(F.col("sum_value") / F.col("cnt"), 6).alias("avg_cents_r"),
    )


ROLLUP_CONTINUOUS_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS cnt,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       round(CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) / count(*), 6)
         AS avg_cents_r
FROM events GROUP BY 1, 2
"""

QUERIES["rollup_continuous_agg"] = rollup_continuous_agg
ORACLES["rollup_continuous_agg"] = ROLLUP_CONTINUOUS_ORACLE


def ev_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: each purchase credits the user's most
    recent click/view within a 72 h lookback.

    One window pass over (user_id, ts): a running ``max(struct(ts,
    event_id))`` over touch rows gives the last preceding touch without
    a self-join — the shuffle is one hashpartition on user_id, and the
    state per row is a single struct (contrast the naive purchases ⋈
    touches range join, which explodes on active users).  72 h
    staleness yields touch_id 0 / secs_since -1 ('organic')."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_touch = F.col("event_type").isin("click", "view")
    last_touch = F.max(
        F.when(
            is_touch,
            F.struct(F.col("ts").alias("tts"), F.col("event_id").alias("tid")),
        )
    ).over(w)
    tagged = ev.select(
        "event_id", "user_id", "ts", "event_type", last_touch.alias("lt")
    ).filter(F.col("event_type") == "purchase")
    fresh = F.col("lt").isNotNull() & (
        F.col("ts").cast("long") - F.col("lt.tts").cast("long") <= 259200
    )
    return tagged.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(fresh, F.col("lt.tid")).otherwise(F.lit(0)).alias("touch_id"),
        F.when(
            fresh, F.col("ts").cast("long") - F.col("lt.tts").cast("long")
        )
        .otherwise(F.lit(-1))
        .cast("long")
        .alias("secs_since_touch"),
    )


EV_ATTRIBUTION_ORACLE = """
WITH tagged AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type IN ('click', 'view')
               THEN struct_pack(tts := ts, tid := event_id) END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lt
  FROM events)
SELECT event_id AS purchase_id, user_id,
       CASE WHEN lt IS NOT NULL
             AND CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch((lt).tts)) AS BIGINT) <= 259200
            THEN (lt).tid ELSE 0 END AS touch_id,
       CAST(CASE WHEN lt IS NOT NULL
             AND CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch((lt).tts)) AS BIGINT) <= 259200
            THEN CAST(floor(epoch(ts)) AS BIGINT)
                 - CAST(floor(epoch((lt).tts)) AS BIGINT)
            ELSE -1 END AS BIGINT) AS secs_since_touch
FROM tagged WHERE event_type = 'purchase'
"""

QUERIES["ev_attribution_last_touch"] = ev_attribution_last_touch
ORACLES["ev_attribution_last_touch"] = EV_ATTRIBUTION_ORACLE


def ev_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly event rates with an integer-exact spike flag:
    a window is anomalous when its count exceeds 3× the type's mean
    active-window rate (cnt * n_windows > 3 * total — cross-multiplied,
    no float division).  One groupBy + a per-type single-row broadcast
    join; the monitor any streaming rollup consumer runs."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        F.floor(F.col("ts").cast("long") / 3600).cast("long").alias("win_hour"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_type = hourly.groupBy("event_type").agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("n_windows")
    )
    return (
        hourly.join(F.broadcast(per_type), "event_type")
        .select(
            "event_type",
            "win_hour",
            "cnt",
            (F.col("cnt") * F.col("n_windows") > 3 * F.col("total"))
            .cast("int")
            .alias("anomalous"),
        )
    )


EV_RATE_ANOMALY_ORACLE = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win_hour,
         count(*) AS cnt
  FROM events GROUP BY 1, 2),
per_type AS (
  SELECT event_type, CAST(sum(cnt) AS BIGINT) AS total,
         count(*) AS n_windows
  FROM hourly GROUP BY 1)
SELECT h.event_type, h.win_hour, h.cnt,
       CAST(h.cnt * p.n_windows > 3 * p.total AS INT) AS anomalous
FROM hourly h JOIN per_type p ON h.event_type = p.event_type
"""

QUERIES["ev_rate_anomaly"] = ev_rate_anomaly
ORACLES["ev_rate_anomaly"] = EV_RATE_ANOMALY_ORACLE
