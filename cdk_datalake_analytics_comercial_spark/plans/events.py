"""Event-stream queries (batch semantics over the ``events`` table).

The reference is batch-only (SURVEY §2.11) — late data is handled by period
reprocessing. These queries add the windowed-aggregation semantics a modern
pipeline needs, expressed so the same logic runs in Structured Streaming
(see ``streaming/windows.py``); here they run in batch with DuckDB oracles.

Time policy: bucket arithmetic happens on integer epoch seconds/micros so
both engines agree exactly (no timezone or ns-truncation ambiguity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import dsum, t
from ..core.barrier import shared_barrier


def _epoch_s(df, col="ts"):
    """Epoch seconds regardless of physical representation — ``ts`` arrives
    as a nanosecond long (nanosAsLong read of parquet TIMESTAMP(NANOS)) or a
    timestamp. Integer ``div`` keeps full precision (double division would
    lose it above 2^53)."""
    if dict(df.dtypes)[col] == "bigint":
        return F.expr(f"{col} div 1000000000")
    return F.col(col).cast("timestamp").cast("long")


def _epoch_us(df, col="ts"):
    if dict(df.dtypes)[col] == "bigint":
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


# --------------------------------------------------------------------------
# Tumbling 5-minute windows per event type.


def q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    es = _epoch_s(e)
    bucket = (es - (es % 300)).cast("bigint")
    return (
        e.groupBy(bucket.alias("bucket_start"), F.col("event_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
        )
    )


_ORACLE_TUMBLING = """
SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS bucket_start,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# Sliding windows (10-minute window, 5-minute slide): each event lands in 2
# buckets — expressed by exploding the bucket assignment, which is exactly
# what Spark's window(slideDuration) does physically.


def q_events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    es = _epoch_s(e)
    base = (es - (es % 300)).cast("bigint")
    buckets = F.array(base - 300, base)  # windows [b-300, b+300) and [b, b+600)
    return (
        e.select(F.explode(buckets).alias("win_start"), "event_type", "value")
        .filter(F.col("win_start") >= 0)
        .groupBy("win_start", "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


_ORACLE_SLIDING = """
WITH base AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS b, event_type, value
  FROM events
), ex AS (
  SELECT unnest([b - 300, b]) AS win_start, event_type, value FROM base
)
SELECT win_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM ex
WHERE win_start >= 0
GROUP BY 1, 2
"""

# --------------------------------------------------------------------------
# Sessionization: 30-minute inactivity gap per user (lag + cumulative-sum
# session ids — the batch twin of streaming session windows).


def q_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    e = ev.select("user_id", _epoch_us(ev).alias("us"), "event_id")
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gapped = e.withColumn(
        "new_session",
        F.when(
            F.col("us") - F.lag("us").over(w) > 1_800_000_000, F.lit(1)
        ).otherwise(F.lit(0))
        + F.when(F.lag("us").over(w).isNull(), F.lit(1)).otherwise(F.lit(0)),
    )
    return gapped.groupBy("user_id").agg(
        F.sum("new_session").cast("bigint").alias("n_sessions"),
        F.count("*").cast("bigint").alias("n_events"),
        ((F.max("us") - F.min("us")) / F.lit(1_000_000.0)).alias("span_seconds"),
    )


_ORACLE_SESSIONS = """
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS prev_us
  FROM events
)
SELECT user_id,
       CAST(SUM(CASE WHEN prev_us IS NULL THEN 1 WHEN us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       (MAX(us) - MIN(us)) / 1000000.0 AS span_seconds
FROM seq
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# As-of enrichment: each click event annotated with the user's most recent
# error event at or before it. Spark side is the union-window as-of join
# (operators/asof.py — one shuffle, no join operator); the oracle is
# DuckDB's NATIVE ASOF LEFT JOIN, i.e. the semantics are checked against an
# independent first-class implementation, not a re-derivation.


def q_events_asof_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof import asof_join

    e = t(spark, sf_dir, "events")
    ev = e.select(
        "event_id", "user_id", "event_type", "value", _epoch_us(e).alias("tus")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "tus"
    )
    w = Window.partitionBy("user_id", "tus").orderBy(F.desc("event_id"))
    errors = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "tus",
            F.col("event_id").alias("error_event_id"),
            F.col("value").alias("error_value"),
        )
    )
    return asof_join(
        clicks,
        errors,
        on="tus",
        by=["user_id"],
        value_cols=["error_event_id", "error_value"],
    )


_ORACLE_ASOF_ERROR = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS tus FROM events
), clicks AS (
  SELECT event_id, user_id, tus FROM ev WHERE event_type = 'click'
), errors AS (
  SELECT user_id, tus,
         MAX(event_id) AS error_event_id,
         max_by(value, event_id) AS error_value
  FROM ev WHERE event_type = 'error' GROUP BY user_id, tus
)
SELECT c.event_id, c.user_id, c.tus,
       e.tus AS tus_asof,
       e.error_event_id AS error_event_id_asof,
       e.error_value AS error_value_asof
FROM clicks c ASOF LEFT JOIN errors e
  ON c.user_id = e.user_id AND e.tus <= c.tus
"""


# --------------------------------------------------------------------------
# Funnel analysis: per-user ordered step progression (view → click →
# purchase, each step strictly after the previous step's FIRST qualifying
# event). Three conditional-min aggregations chained by key joins — each
# stage shuffles only the users still in the funnel, so the frontier
# shrinks monotonically (at scale the step-2/3 joins ride broadcast once
# the survivor set is small).


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    ev = e.select("user_id", "event_type", _epoch_us(e).alias("tus"))

    # each step frame feeds the NEXT step's join AND its own count row;
    # without a barrier the cascade re-derives v three times and c twice
    # (6 events scans — AQE does not reuse exchanges across the union
    # branches), so the two shared steps materialize once, lazily
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("tus").alias("t1"))
        .transform(shared_barrier)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("tus") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t2"))
        .transform(shared_barrier)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("tus") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("tus").alias("t3"))
    )

    def step(df: DataFrame, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).cast("bigint").alias("n_users")).select(
            F.lit(name).alias("step"), "n_users"
        )

    return (
        step(v, "1_view")
        .unionByName(step(c, "2_click"))
        .unionByName(step(p, "3_purchase"))
    )


_ORACLE_FUNNEL = """
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
), v AS (
  SELECT user_id, MIN(tus) AS t1 FROM ev WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, MIN(e.tus) AS t2
  FROM ev e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.tus > v.t1 GROUP BY 1
), p AS (
  SELECT e.user_id, MIN(e.tus) AS t3
  FROM ev e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.tus > c.t2 GROUP BY 1
)
SELECT '1_view' AS step, CAST(COUNT(*) AS BIGINT) AS n_users FROM v
UNION ALL SELECT '2_click', CAST(COUNT(*) AS BIGINT) FROM c
UNION ALL SELECT '3_purchase', CAST(COUNT(*) AS BIGINT) FROM p
"""


# --------------------------------------------------------------------------
# Time-to-next-action after an error: lead() over the per-user event
# sequence — the lag/lead window surface the reference never uses (its
# window inventory is ranking-only, SURVEY §2.6). One shuffle on user_id;
# the (tus, event_id) ordering is total, so the result is deterministic
# even with simultaneous events.


def q_events_next_after_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    ev = e.select("event_id", "user_id", "event_type", _epoch_us(e).alias("tus"))
    w = Window.partitionBy("user_id").orderBy(F.col("tus"), F.col("event_id"))
    return (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("gap_us", (F.lead("tus").over(w) - F.col("tus")).cast("bigint"))
        .filter((F.col("event_type") == "error") & F.col("next_type").isNotNull())
        .select("event_id", "user_id", "next_type", "gap_us")
    )


_ORACLE_NEXT_AFTER_ERROR = """
WITH ev AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS tus FROM events
), led AS (
  SELECT event_id, user_id, event_type,
         lead(event_type) OVER w AS next_type,
         CAST(lead(tus) OVER w - tus AS BIGINT) AS gap_us
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id)
)
SELECT event_id, user_id, next_type, gap_us
FROM led WHERE event_type = 'error' AND next_type IS NOT NULL
"""


def q_events_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate distinct users per hour via the portable HyperLogLog —
    the streaming-shaped sketch use (per-window registers merge by max, so
    a live pipeline keeps m longs per open window, not a user set);
    exact count rides along to expose the estimation error."""
    from ..operators.sketches import hll_distinct

    e = t(spark, sf_dir, "events")
    es = _epoch_s(e)
    bucket = (es - (es % 3600)).cast("bigint")
    pairs = e.select(bucket.alias("bucket_start"), F.col("user_id").alias("v"))
    # ONE (bucket, user) distinct grain serves both sides (guide §2.4):
    # the sketch's internal distinct and the exact COUNT(DISTINCT)'s
    # two-level rewrite each re-shuffled the full pair stream and
    # re-scanned events — the shared grain scans once and shuffles the
    # full stream once; both aggregations then run over the (much
    # smaller) distinct rows. countDistinct over pairs ≡ count(*) over
    # the distinct grain.
    dv = pairs.distinct().transform(shared_barrier)
    sketch = hll_distinct(dv, ["bucket_start"], "v", p=8, assume_distinct=True)
    exact = dv.groupBy("bucket_start").agg(
        # count(v), not count(1): NULL users must stay skipped (ADVICE r13)
        F.count(F.col("v")).cast("bigint").alias("exact_users")
    )
    return sketch.join(exact, "bucket_start").select(
        "bucket_start", "hll_buckets_used", "hll_estimate", "exact_users"
    )


def _hll_users_oracle() -> str:
    from .common import hll_oracle_sql

    pairs = (
        "SELECT DISTINCT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 "
        "AS bucket_start, user_id AS v FROM events"
    )
    inner = hll_oracle_sql(pairs, "bucket_start")
    return f"""
WITH sketch AS ({inner}
), exact AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS bucket_start,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events GROUP BY 1
)
SELECT s.bucket_start, hll_buckets_used, hll_estimate, exact_users
FROM sketch s JOIN exact USING (bucket_start)
"""


# --------------------------------------------------------------------------
# Cohort retention — the activity matrix behind every retention curve: each
# user's cohort is their first active epoch-week (fixed 7-day buckets from
# the epoch, integer math per the module's time policy — no calendar-week
# ambiguity between engines), and cell (cohort_week, week_offset) counts the
# cohort's users active that many weeks later. Shape at scale: groupBy user
# then an equi-join back on user reuses the same hash partitioning (no extra
# shuffle), then one final agg shuffle on the bounded (cohort, offset) grid.


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    # ONE events pass and ONE exchange: collect_set(wk) per user both
    # dedups the (user, week) grain AND carries the user's whole history,
    # so the cohort week is array_min — the r12 shape computed `weeks`
    # twice (distinct + cohort re-derivation) and joined them back.
    # Per-user arrays are calendar-bounded (#weeks in the data), so the
    # sets are metadata-sized at any corpus scale. Counting exploded
    # (cohort, offset) rows counts exactly the distinct (user, wk) pairs
    # the join form counted.
    sets = (
        e.select(F.col("user_id"), _epoch_s(e).alias("_es"))
        .select("user_id", F.expr("_es div 604800").alias("wk"))
        .groupBy("user_id")
        .agg(F.collect_set("wk").alias("wks"))
        .select(F.array_min("wks").alias("cohort_week"), F.explode("wks").alias("wk"))
    )
    return (
        sets.groupBy(
            F.col("cohort_week").cast("bigint").alias("cohort_week"),
            (F.col("wk") - F.col("cohort_week")).cast("bigint").alias(
                "week_offset"
            ),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


_ORACLE_EVENTS_RETENTION = """
WITH weeks AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
  FROM events
), cohort AS (
  SELECT user_id, MIN(wk) AS cohort_week FROM weeks GROUP BY user_id
)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(w.wk - c.cohort_week AS BIGINT) AS week_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM weeks w JOIN cohort c USING (user_id)
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Stickiness (DAU/WAU) — the product-analytics engagement ratio: per epoch
# week, the mean daily-active count over the week's ACTIVE days divided by
# the weekly-active count. All counts are integers; the single ratio is one
# IEEE division of integer-valued doubles, so no rounding is needed for
# engine parity.


def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    dw = e.select(F.col("user_id"), _epoch_s(e).alias("_es")).select(
        "user_id",
        F.expr("_es div 86400").alias("day"),
        F.expr("_es div 604800").alias("wk"),
    )
    # ONE pass over events builds the distinct (wk, day, user) grain;
    # both frequencies re-aggregate from it (dau = triples per (wk, day),
    # wau = distinct users per wk — identical to the two raw
    # countDistincts, which each re-scanned events). Checkpoint: two
    # consumers, no exchange reuse across them.
    tri = (
        dw.select("wk", "day", "user_id")
        .distinct()
        .transform(shared_barrier)
    )
    daily = tri.groupBy("wk", "day").agg(
        F.count(F.lit(1)).alias("dau")
    )
    weekly = tri.groupBy("wk").agg(
        F.countDistinct("user_id").cast("bigint").alias("wau")
    )
    agg = daily.groupBy("wk").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("sum_dau"),
    )
    return agg.join(weekly, "wk").select(
        F.col("wk").cast("bigint").alias("wk"),
        "n_days",
        "sum_dau",
        "wau",
        (
            F.col("sum_dau").cast("double")
            / (F.col("n_days") * F.col("wau")).cast("double")
        ).alias("stickiness"),
    )


_ORACLE_EVENTS_STICKINESS = """
WITH dw AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day,
         CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS wk
  FROM events
), daily AS (
  SELECT wk, day, COUNT(DISTINCT user_id) AS dau FROM dw GROUP BY 1, 2
), weekly AS (
  SELECT wk, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau FROM dw GROUP BY 1
), agg AS (
  SELECT wk, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS sum_dau
  FROM daily GROUP BY wk
)
SELECT a.wk, a.n_days, a.sum_dau, w.wau,
       CAST(a.sum_dau AS DOUBLE) / CAST(a.n_days * w.wau AS DOUBLE)
         AS stickiness
FROM agg a JOIN weekly w USING (wk)
"""


QUERIES = {
    "events_retention": q_events_retention,
    "events_stickiness": q_events_stickiness,
    "events_hll_users": q_events_hll_users,
    "events_tumbling": q_events_tumbling,
    "events_sliding": q_events_sliding,
    "events_sessions": q_events_sessions,
    "events_asof_error": q_events_asof_error,
    "events_funnel": q_events_funnel,
    "events_next_after_error": q_events_next_after_error,
}

ORACLES = {
    "events_retention": _ORACLE_EVENTS_RETENTION,
    "events_stickiness": _ORACLE_EVENTS_STICKINESS,
    "events_hll_users": _hll_users_oracle(),
    "events_tumbling": _ORACLE_TUMBLING,
    "events_sliding": _ORACLE_SLIDING,
    "events_sessions": _ORACLE_SESSIONS,
    "events_asof_error": _ORACLE_ASOF_ERROR,
    "events_funnel": _ORACLE_FUNNEL,
    "events_next_after_error": _ORACLE_NEXT_AFTER_ERROR,
}
