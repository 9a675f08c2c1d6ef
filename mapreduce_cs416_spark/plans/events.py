"""Event-time analytics over the `events` table (SURVEY.md §7 Phase 4d).

The reference is strictly batch (hard map→reduce barrier,
mr/coordinator.go:78-87); these queries give the engine the
time-windowed operator family in batch form, using the *same*
``window()`` / ``session_window()`` expressions Structured Streaming
executes incrementally — see ``streaming/pipelines.py`` for the
readStream twins with watermarks.

Oracle notes: Spark windows are epoch-aligned, so the DuckDB twins are
date_trunc arithmetic; session windows use the standard
gaps-and-islands rewrite with the same strict `gap >= 30min` boundary
(Spark sessions are half-open [ts, ts+gap)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import decimal_sum, sql_decimal_sum
from ..sources.tables import load_table
from .spec import QuerySpec


def _ev(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type: count + value sum.
    One shuffle on (window, type); partial agg map-side."""
    return (
        _ev(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


EVENTS_TUMBLING_SQL = f"""
SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
       event_type,
       count(*) AS n_events,
       {sql_decimal_sum('value')} AS sum_value
FROM events
GROUP BY 1, 2
"""


def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 hour long, every 30 minutes): each event
    lands in exactly two windows; Spark plans this as an explode of
    window starts + hash agg (no self-join)."""
    return (
        _ev(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


EVENTS_SLIDING_SQL = f"""
WITH g AS (
    SELECT value,
           CAST(date_trunc('hour', ts)
                + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
             AS TIMESTAMP) AS g0
    FROM events
), u AS (
    SELECT g0 AS window_start, value FROM g
    UNION ALL
    SELECT g0 - INTERVAL 30 MINUTE, value FROM g
)
SELECT window_start, count(*) AS n_events, {sql_decimal_sum('value')} AS sum_value
FROM u
GROUP BY 1
"""


def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows per user with a 30-minute inactivity gap:
    session start, size, and value sum. The stateful-streaming twin
    lives in streaming/pipelines.py."""
    return (
        _ev(spark, sf_dir)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )


EVENTS_SESSION_SQL = f"""
WITH o AS (
    SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), s AS (
    SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
)
SELECT user_id,
       CAST(min(ts) AS TIMESTAMP) AS session_start,
       count(*) AS n_events,
       {sql_decimal_sum('value')} AS sum_value
FROM s
GROUP BY user_id, sid
"""


def events_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct-user reach via mergeable HLL sketches
    (operators/sketches.distinct_user_rollup): per-day sketches roll
    up by lossless union, the two-level re-aggregation exact distinct
    state cannot do — constant-size partial state per group at any
    cardinality. Rows-only at the driver: estimates depend on the
    DataSketches hash family, which DuckDB does not implement; the
    error-bound and union-losslessness contracts are pinned in
    tests/test_sketches.py."""
    from ..operators import sketches

    return sketches.distinct_user_rollup(_ev(spark, sf_dir))


def events_attribution_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch face of the stream-stream attribution join
    (streaming/pipelines.streaming_attribution_join — the same
    function body runs on both): each purchase joined to the same
    user's clicks from the preceding hour. In streaming form both
    sides are watermarked and the time-range predicate bounds join
    state; tests/test_streaming.py asserts batch == streaming."""
    from ..streaming.pipelines import streaming_attribution_join

    return streaming_attribution_join(_ev(spark, sf_dir))


EVENTS_ATTRIBUTION_SQL = """
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       c.ts AS click_ts,
       p.ts AS purchase_ts
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 1 HOUR
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view → click → purchase) per user: the first
    view, the first click at-or-after that view, and the first
    purchase at-or-after that click, plus the funnel stage reached
    (0-3). The sequential constraint is what distinguishes this from
    three independent mins — a click before any view does not count.

    Single-pass shape: two stacked range-frame window mins over the
    SAME (user_id, ts) ordering (one shuffle on user_id; the second
    Window and the final groupBy reuse the partitioning), then a
    conditional-min hash agg. No self-joins: the naive 3-way
    events⋈events⋈events formulation shuffles the fact table three
    times and explodes on users with many events; this is one shuffle
    and O(rows) work. RANGE frames (not ROWS) make ties exact: a
    click at the identical timestamp as the first view counts,
    regardless of row order within the tie — ROWS frames would make
    the result depend on nondeterministic shuffle order.
    """
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).select("user_id", "ts", "event_type")
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("event_type") == "view"
    is_click = F.col("event_type") == "click"
    is_purchase = F.col("event_type") == "purchase"
    staged = (
        ev.withColumn("v1", F.min(F.when(is_view, F.col("ts"))).over(wr))
        .withColumn("c1", F.min(F.when(is_click & F.col("v1").isNotNull(), F.col("ts"))).over(wr))
    )
    funnel = staged.groupBy("user_id").agg(
        F.min(F.when(is_view, F.col("ts"))).alias("view_ts"),
        F.min(F.when(is_click & F.col("v1").isNotNull(), F.col("ts"))).alias("click_ts"),
        F.min(F.when(is_purchase & F.col("c1").isNotNull(), F.col("ts"))).alias("purchase_ts"),
    )
    stage = (
        F.col("view_ts").isNotNull().cast("int")
        + F.col("click_ts").isNotNull().cast("int")
        + F.col("purchase_ts").isNotNull().cast("int")
    )
    return funnel.select("user_id", "view_ts", "click_ts", "purchase_ts", stage.alias("stage"))


EVENTS_FUNNEL_SQL = """
WITH o AS (
    SELECT user_id, ts, event_type,
           min(CASE WHEN event_type = 'view' THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v1
    FROM events
), c AS (
    SELECT *,
           min(CASE WHEN event_type = 'click' AND v1 IS NOT NULL THEN ts END)
               OVER (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1
    FROM o
)
SELECT user_id,
       view_ts, click_ts, purchase_ts,
       (CASE WHEN view_ts IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN click_ts IS NOT NULL THEN 1 ELSE 0 END
        + CASE WHEN purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS stage
FROM (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN ts END) AS view_ts,
           min(CASE WHEN event_type = 'click' AND v1 IS NOT NULL THEN ts END) AS click_ts,
           min(CASE WHEN event_type = 'purchase' AND c1 IS NOT NULL THEN ts END) AS purchase_ts
    FROM c
    GROUP BY user_id
)
"""


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week (Monday-truncated), counted distinct in each later week —
    (cohort_week, week_offset, n_users). The standard product-
    analytics rollup (offset 0 = cohort size).

    Scale shape: one groupBy(user) for first-seen, one distinct over
    (user, week) — both shuffles keyed by user_id so they co-partition
    with the join between them; the final (cohort, offset) aggregate
    is tiny (weeks² cells) with map-side partials. Week arithmetic is
    date-integer math (both weeks Monday-aligned ⇒ the day diff is an
    exact multiple of 7), identical in the DuckDB twin."""
    ev = _ev(spark, sf_dir)
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    return (
        active.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


EVENTS_COHORT_SQL = """
WITH cohort AS (
    SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
),
active AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
           FROM events)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) // 7 AS INT) AS week_offset,
       count(DISTINCT user_id) AS n_users
FROM active JOIN cohort USING (user_id)
GROUP BY 1, 2
"""


def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type: 20 buckets of 25
    over [0, 500), top bucket open — (event_type, bucket, n, lo, hi).
    One shuffle over |types|·20 groups with map-side partials; the
    bucket index is row-local double math (identical IEEE division +
    floor in the oracle), so the histogram is engine-exact — the
    building block for distribution drift checks between corpus
    snapshots."""
    bucket = F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("int")
    return (
        _ev(spark, sf_dir)
        .groupBy("event_type", bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
    )


EVENTS_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(least(floor(value / 25.0), 19) AS INT) AS bucket,
       count(*) AS n,
       min(value) AS lo,
       max(value) AS hi
FROM events
GROUP BY 1, 2
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection per event type: each day's event count
    scored as a z-score against that type's own daily history, |z| ≥ 2
    flagged — the monitoring query that catches an instrumentation
    break or a bot flood in one slice without a model. Returns
    (event_type, day, n, z, is_anomaly).

    Determinism discipline: mean and variance are computed explicitly
    from INTEGER aggregates (Σn, Σn², d — exact in any order; counts
    here keep Σn² far under 2⁵³) with one fixed float expression
    var = (Σn² − (Σn)²/d)/d, NOT engine stddev implementations whose
    internal accumulation differs — so the z-scores are bit-equal in
    the DuckDB twin. Shuffle shape: one groupBy(type, day) with
    map-side partials, one tiny groupBy(type), broadcast join of the
    |types|-row stats back onto the daily counts. The daily rollup is
    eagerly materialized (localCheckpoint — bounded at |types|·|days|
    rows) because the finisher references it twice (per-type stats +
    the join back); without it the events table is scanned and
    re-aggregated once per branch (ADVICE r6).
    """
    daily = (
        _ev(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    return anomaly_from_counts(daily)


def anomaly_from_counts(daily: DataFrame) -> DataFrame:
    """The stateless finishing step of the volume-anomaly monitor:
    turn an (event_type, day, n) daily-counter table — however
    maintained — into the z-scored rows of ``events_anomaly_zscore``.
    A batch snapshot and an incrementally-maintained streaming counter
    state (streaming/pipelines.streaming_daily_type_counts) produce
    identical scores — asserted in tests/test_streaming.py (cf. the
    same split in textstats.source_kl_from_counts)."""
    stats = daily.groupBy("event_type").agg(
        F.count("*").alias("d"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    var = (F.col("q") - F.col("s") * F.col("s") / F.col("d")) / F.col("d")
    # zero-variance guard: a type seen on one day (or with constant
    # daily counts) has var EXACTLY 0.0 (the float subtraction is
    # exact for these integer magnitudes, identically in both
    # engines) — without the guard the division is DIVIDE_BY_ZERO
    # under ANSI mode and a NaN/NULL oracle divergence without it.
    # No variance ⇒ no anomaly signal: z is NULL, flag false.
    z = F.when(
        var > 0, (F.col("n") - F.col("s") / F.col("d")) / F.sqrt(var)
    )
    return (
        daily.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            "day",
            F.col("n").cast("long").alias("n"),
            F.round(z, 6).alias("z"),
            F.coalesce(F.abs(F.round(z, 6)) >= 2.0, F.lit(False)).alias("is_anomaly"),
        )
    )


EVENTS_ANOMALY_SQL = """
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day, count(*) AS n
    FROM events GROUP BY 1, 2
),
stats AS (
    SELECT event_type, count(*) AS d, sum(n) AS s, sum(n * n) AS q
    FROM daily GROUP BY 1
)
SELECT daily.event_type, day, CAST(n AS BIGINT) AS n,
       CASE WHEN (q - s * s / d) / d > 0
            THEN round((n - s / d) / sqrt((q - s * s / d) / d), 6) END AS z,
       coalesce(CASE WHEN (q - s * s / d) / d > 0
                     THEN abs(round((n - s / d) / sqrt((q - s * s / d) / d), 6)) >= 2.0
                END, FALSE) AS is_anomaly
FROM daily JOIN stats ON daily.event_type = stats.event_type
"""


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix: for every consecutive pair of
    events by the same user (ordered by ts, event_id tie-break), the
    transition count and conditional probability
    P(next_type | event_type) — the first-order Markov view of product
    flows ("what do users do after search?"). Returns
    (event_type, next_type, n, p).

    One shuffle partitions by user_id for the lead() window (a real
    partitioned window — each user's timeline is modest, so no skewed
    single task), then a tiny (|types|² upper-bounded) pair groupBy
    with map-side partials and a broadcast of the per-type totals for
    the probability. p is one integer-ratio IEEE division rounded to
    6 dp → hash-exact in the DuckDB twin.
    """
    from pyspark.sql import Window

    ev = _ev(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    pairs = ev.select("event_type", nxt.alias("next_type")).where(
        F.col("next_type").isNotNull()
    )
    counts = pairs.groupBy("event_type", "next_type").agg(F.count("*").alias("n"))
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return (
        counts.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "next_type",
            "n",
            F.round(F.col("n") / F.col("tot"), 6).alias("p"),
        )
    )


EVENTS_TRANSITION_SQL = """
WITH seq AS (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
),
counts AS (
    SELECT event_type, next_type, count(*) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY 1, 2
),
totals AS (SELECT event_type, sum(n) AS tot FROM counts GROUP BY 1)
SELECT c.event_type, c.next_type, c.n, round(c.n / t.tot, 6) AS p
FROM counts c JOIN totals t ON c.event_type = t.event_type
"""


def events_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution time-series downsampling in ONE aggregation —
    the hypertable "continuous aggregate" shape: hour, day, AND week
    rollups per event type from a single scan + single shuffle. Each
    row explodes into its three (resolution, bucket) assignments (the
    same Expand encoding Catalyst lowers GROUPING SETS to, expressed
    directly so the DataFrame plan is one hash aggregate); computing
    the three resolutions as separate jobs would scan and shuffle the
    events table three times. The DuckDB twin is the literal GROUPING
    SETS query."""
    ev = _ev(spark, sf_dir)
    r = F.explode(
        F.array(
            F.struct(F.lit("hour").alias("resolution"), F.date_trunc("hour", "ts").alias("bucket")),
            F.struct(F.lit("day").alias("resolution"), F.date_trunc("day", "ts").alias("bucket")),
            F.struct(F.lit("week").alias("resolution"), F.date_trunc("week", "ts").alias("bucket")),
        )
    ).alias("r")
    return (
        ev.select("event_type", "value", r)
        .groupBy("event_type", "r.resolution", "r.bucket")
        .agg(F.count("*").alias("n_events"), decimal_sum(F.col("value"), "sum_value"))
    )


EVENTS_MULTIRES_SQL = f"""
WITH b AS (
    SELECT event_type, value,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS d,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
    FROM events
)
SELECT event_type,
       CASE WHEN grouping(h) = 0 THEN 'hour'
            WHEN grouping(d) = 0 THEN 'day'
            ELSE 'week' END AS resolution,
       coalesce(h, d, wk) AS bucket,
       count(*) AS n_events,
       {sql_decimal_sum('value')} AS sum_value
FROM b
GROUP BY GROUPING SETS ((event_type, h), (event_type, d), (event_type, wk))
"""


def events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled daily series per event type (the
    time_bucket_gapfill shape): every (type, day) cell between the
    corpus' first and last active day, zero-filled where no events
    landed. The events table shuffles ONCE into the daily rollup;
    everything after is calendar-sized — bounds are a one-row
    aggregate of the rollup, the calendar is one sequence() explode,
    and the grid joins back broadcast. At 100 TB the gap-fill cost is
    |days|·|types|, independent of event volume."""
    ev = _ev(spark, sf_dir)
    # Eagerly materialize the rollup: bounds, types, and the grid join
    # all branch from it, and without the checkpoint each branch would
    # replay the events scan+shuffle (bounded at |types|·|days| rows).
    daily = (
        ev.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("n"))
        .localCheckpoint()
    )
    bounds = daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    cal = bounds.select(F.explode(F.sequence("lo", "hi", F.expr("interval 1 day"))).alias("day"))
    # types come from the ROLLUP, not a second events scan — every
    # event lands in daily, so the distinct set is identical and this
    # branch is genuinely rollup-sized.
    types = daily.select("event_type").distinct()
    grid = cal.crossJoin(F.broadcast(types))
    return grid.join(F.broadcast(daily), ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("n", F.lit(0)).cast("long").alias("n_events")
    )


EVENTS_GAPFILL_SQL = """
WITH daily AS (
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, count(*) AS n
    FROM events GROUP BY 1, 2
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM daily),
cal AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM b),
types AS (SELECT DISTINCT event_type FROM events)
SELECT t.event_type, c.day, CAST(coalesce(d.n, 0) AS BIGINT) AS n_events
FROM cal c
CROSS JOIN types t
LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = c.day
"""


QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        # events_tumbling followed events_sliding / events_session to
        # EXTRA in r8 (all three time-window twins stay oracle-checked
        # by tests/test_parity.py; tumbling keeps its headline bench
        # slot). events_multires_rollup followed in r9 (driver-hashed
        # green in r8; the grouping-sets family keeps its oracle there
        # plus grouping_variants in extras) — the freed slot carries
        # one of the r8-oracled northstar extras the driver had never
        # hashed (VERDICT r8 item 4).
        # events_anomaly_zscore rotated to EXTRA in r14 (driver-hashed
        # green r6-r13; keeps its headline bench slot + exact oracle in
        # parity) — the freed slot carries events_funnel, exact-oracled
        # since r5 but never driver-hashed (VERDICT r13 item 8).
        QuerySpec("events_funnel", events_funnel, EVENTS_FUNNEL_SQL, events_funnel.__doc__, tags=("events", "window", "funnel", "custom-op")),
        # events_transition_matrix rotated to EXTRA late-r8 (driver-
        # hashed green in r7; the freed slot carries the newly
        # exact-oracled LSH family — see plans/northstar.py).
        # events_distinct_rollup rotated to EXTRA in r6 (VERDICT r5
        # item 7): rows-only by construction (DataSketches HLL), its
        # real check is the error-bound/union pytest — the freed window
        # slot carries an oracled r5 family instead.
    ]
}

# Batch twin of the stream-stream join — EXTRA (outside the driver
# window); oracle-checked by tests/test_parity.py, stream==batch by
# tests/test_streaming.py.
EXTRA_QUERIES: dict[str, QuerySpec] = {
    q.name: q
    for q in [
        QuerySpec("events_tumbling", events_tumbling, EVENTS_TUMBLING_SQL, events_tumbling.__doc__, headline=True, tags=("events", "window")),
        QuerySpec("events_multires_rollup", events_multires_rollup, EVENTS_MULTIRES_SQL, events_multires_rollup.__doc__, tags=("events", "window", "agg", "rollup")),
        QuerySpec("events_transition_matrix", events_transition_matrix, EVENTS_TRANSITION_SQL, events_transition_matrix.__doc__, tags=("events", "window", "markov")),
        QuerySpec("events_sliding", events_sliding, EVENTS_SLIDING_SQL, events_sliding.__doc__, tags=("events", "window")),
        QuerySpec("events_session", events_session, EVENTS_SESSION_SQL, events_session.__doc__, headline=True, tags=("events", "session", "custom-op")),
        QuerySpec("events_distinct_rollup", events_distinct_rollup, None, events_distinct_rollup.__doc__, tags=("events", "agg", "approx", "sketch")),
        QuerySpec("events_attribution_join", events_attribution_join, EVENTS_ATTRIBUTION_SQL, events_attribution_join.__doc__, tags=("events", "join", "streaming", "range")),
        QuerySpec("events_anomaly_zscore", events_anomaly_zscore, EVENTS_ANOMALY_SQL, events_anomaly_zscore.__doc__, headline=True, tags=("events", "agg", "anomaly", "monitoring")),
        QuerySpec("events_cohort_retention", events_cohort_retention, EVENTS_COHORT_SQL, events_cohort_retention.__doc__, tags=("events", "agg", "cohort")),
        QuerySpec("events_value_histogram", events_value_histogram, EVENTS_HISTOGRAM_SQL, events_value_histogram.__doc__, tags=("events", "agg", "histogram")),
        QuerySpec("events_gapfill", events_gapfill, EVENTS_GAPFILL_SQL, events_gapfill.__doc__, tags=("events", "window", "timeseries")),
    ]
}
