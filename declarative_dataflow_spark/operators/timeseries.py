"""Time-series operators over event streams: bucketized interval
(range) joins and per-key rolling-window features.

Beyond-reference extensions: the reference's event handling stops at
windows and bitemporal snapshots (SURVEY §2.5/§2.6); feature pipelines
over event logs additionally need "events within an interval" joins
and trailing-window statistics. Both are shaped for 100 TB:

- ``interval_join``: a naive ``t BETWEEN s AND e`` join is a
  BroadcastNestedLoopJoin (quadratic per key-group, and Spark will
  happily emit a cartesian for it). Instead, both sides land in
  fixed-width time buckets: the point side maps to ONE bucket, the
  interval side replicates to ceil(duration / bucket) + 1 buckets
  (a small constant when the bucket width is chosen >= the typical
  duration), and the join becomes an EQUI-join on (key, bucket) with
  a residual range filter. Each (point, interval) match is produced
  exactly once because the point lives in exactly one bucket — no
  dedup pass. The shuffle key (key, bucket) is uniform even when a
  single logical key is hot across time, because time spreads it.
- ``rolling_stats``: trailing-range window PARTITIONED by key —
  parallel across keys, never a global sort. Sums run in
  DECIMAL(18,6) so the result is order-independent (the PageRank
  discipline); a double sum would let the physical plan pick the
  last digit.

Both are pure DataFrame compositions of JVM-side expressions with
exact DuckDB twins (range semantics over epoch microseconds are
identical in both engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _epoch_us(col_name: str) -> Column:
    """Microseconds since the epoch for a TIMESTAMP_NTZ column,
    timezone-independent (``unix_micros`` rejects NTZ, and casting
    through TIMESTAMP would shift by the session zone). DuckDB twin:
    ``epoch_us(ts)`` — both treat the naive value as-is."""

    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST({col_name} AS TIMESTAMP_NTZ))"
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join point rows to every interval row (same ``on`` keys) whose
    [start, end] contains the point's timestamp — inclusive on both
    ends. Returns points' columns plus the intervals' columns.

    The caller picks ``bucket_seconds`` near the typical interval
    duration: the interval side replicates once per covered bucket, so
    a bucket much smaller than the duration multiplies the shuffle
    volume, while a bucket much larger keeps the residual filter busy
    discarding non-matches. Correct for any choice.
    """

    us = bucket_seconds * 1_000_000
    pt = points.withColumn("__bin", F.floor(_epoch_us(ts_col) / us))
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(_epoch_us(start_col) / us),
                F.floor(_epoch_us(end_col) / us),
            )
        ),
    )
    joined = pt.join(iv, on + ["__bin"]).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) <= F.col(end_col))
    )
    return joined.drop("__bin")


def rolling_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key trailing-window statistics: for every event, the count,
    mean, and max of ``value_col`` over this key's events in the
    preceding ``window_seconds`` (inclusive of the current event).
    Returns (id, key, n_win, avg_win, max_win).

    RANGE frame over epoch microseconds — peers with identical
    timestamps are all included, so the result is deterministic
    without a tiebreak. The mean divides an exact DECIMAL sum and
    rounds to 6 decimals.
    """

    w = (
        Window.partitionBy(key_col)
        .orderBy(_epoch_us(ts_col))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    v = F.col(value_col).cast("decimal(18,6)")
    return events.select(
        F.col(id_col),
        F.col(key_col),
        F.count(F.lit(1)).over(w).alias("n_win"),
        F.round(
            F.sum(v).over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("avg_win"),
        F.max(v).over(w).cast("double").alias("max_win"),
    )


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Assign every event a per-key session index (gaps-and-islands):
    a new session starts when the gap to the key's previous event
    exceeds ``gap_seconds`` (strictly; an event exactly at the gap
    boundary continues the session). Returns the events' columns plus
    ``session_seq`` (1-based within the key).

    Unlike ``windows.session_agg`` — which AGGREGATES events into
    merged session windows — this labels each event row, the form a
    training pipeline needs to carry session context into downstream
    features. One window PARTITIONED by key (parallel across keys,
    never a global sort); equal-timestamp events tiebreak on the id
    column so the labeling is a deterministic total order, though the
    session assignment itself is tiebreak-independent (a zero gap
    never opens a session).
    """

    t = events.withColumn("__t", _epoch_us(ts_col))
    return sessionize_us(
        t, key_col, "__t", id_col, gap_seconds * 1_000_000
    ).drop("__t")


def sessionize_us(
    events: DataFrame,
    key_col: str,
    tu_col: str,
    id_col: str,
    gap_us: int,
) -> DataFrame:
    """:func:`sessionize` core over a pre-computed epoch-us column —
    shared verbatim by the batch operator and the incremental
    maintainer (streaming/event_stats.py) so their session semantics
    cannot drift."""

    w = Window.partitionBy(key_col).orderBy(tu_col, id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = events.withColumn(
        "__new",
        F.when(
            F.lag(tu_col).over(w).isNull()
            | ((F.col(tu_col) - F.lag(tu_col).over(w)) > F.lit(gap_us)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    return flagged.withColumn(
        "session_seq", F.sum("__new").over(run).cast("long")
    ).drop("__new")


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session summary over :func:`sessionize`: (key, session_seq,
    n_events, start_us, end_us, duration_s). The window labeling and
    the rollup shuffle on the same key, so the aggregation reuses the
    session partitioning."""

    t = events.withColumn("__t", _epoch_us(ts_col))
    return session_stats_us(
        t, key_col, "__t", id_col, gap_seconds * 1_000_000
    )


def session_stats_us(
    events: DataFrame,
    key_col: str = "k",
    tu_col: str = "tu",
    id_col: str = "eid",
    gap_us: int = 1_800_000_000,
) -> DataFrame:
    """:func:`session_stats` core over a pre-computed epoch-us column
    — the maintainer's entry point (same shared-core discipline as
    funnel_us / retention_from_activity)."""

    lab = sessionize_us(events, key_col, tu_col, id_col, gap_us)
    t = F.col(tu_col)
    return lab.groupBy(key_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(t).alias("start_us"),
        F.max(t).alias("end_us"),
        ((F.max(t) - F.min(t)) / F.lit(1_000_000.0)).alias("duration_s"),
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel completion: for every key with at least one
    ``steps[0]`` event, the earliest chain of strictly-increasing
    timestamps walking the step sequence, and the depth reached.
    Returns (key, depth, t1..tk) with ``t{i}`` the epoch-us completion
    time of step i (NULL once the chain breaks).

    Each step is one filtered scan (the type predicate pushes into the
    parquet scan) aggregated to at most one row per key, then an
    equi-join against the previous step's per-key table — never a
    window over the full event stream and never an inequality join:
    the ``ts > t_{i-1}`` comparison is a residual filter on the
    equi-joined rows. Per-key tables are the smallest relation in
    every join, so AQE broadcasts them when they fit; the chain is
    k-1 uniform-key joins for a k-step funnel.

    Greedy-earliest is the standard funnel semantics: taking the
    earliest completion of each prefix never shrinks the set of keys
    that can complete the next step (any later step-i event admits a
    superset of nothing the earliest admits — min is optimal).
    """

    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    return funnel_us(
        events.withColumn("__tu", _epoch_us(ts_col)),
        steps,
        key_col=key_col,
        tu_col="__tu",
        type_col=type_col,
    )


def funnel_us(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    tu_col: str = "tu",
    type_col: str = "event_type",
) -> DataFrame:
    """:func:`funnel` core over a precomputed epoch-microseconds long
    column — the form the incremental maintainer feeds from its event
    state (which stores epoch-us, not timestamps).

    ONE event scan (r13; guide §2.4 — the r10 form ran k filtered
    scans + k per-key aggregates + k-1 equi-joins for a k-step
    funnel): the single scan filters to the step types, ONE grouped
    aggregate collects each key's per-step timestamp list, and the
    greedy chain — t_i = min{t in step_i : t > t_{i-1}} — becomes
    row-local ``array_min(filter(...))`` over those lists. The chain
    semantics is EXACTLY the old join chain's: array_min of an empty
    or null filter result is NULL, a NULL t_{i-1} nulls every later
    comparison, so chain-break propagation is identical; keys qualify
    by having >= 1 step-1 EVENT (counted separately, so a key whose
    step-1 timestamps are all NULL still surfaces with t1 NULL,
    exactly like min() over nulls in the old per-step aggregate).
    Cost: k corpus scans -> 1, k-1 joins -> 0, at the price of ONE
    un-pre-aggregated shuffle of the step-typed events (collect_list
    has no map-side reduction) — at 100 TB that trades k full column
    scans for one shuffle of the filtered rows, a win whenever the
    steps cover < (k-1)/k of the stream. Skew note (guide §2.5): a
    single hyperactive key's events concentrate in one task's
    collect_list; per-key event counts bound the array, and the
    filter HOFs run over already-built arrays (not the bm25 hazard
    of re-evaluating an expensive producer per expression)."""

    t = F.col(tu_col)
    aggs = [
        F.count(F.when(F.col(type_col) == steps[0], F.lit(1))).alias("__n1")
    ] + [
        F.collect_list(F.when(F.col(type_col) == step, t)).alias(f"__c{i}")
        for i, step in enumerate(steps, start=1)
    ]
    per_key = (
        events.filter(F.col(type_col).isin(list(steps)))
        .groupBy(key_col)
        .agg(*aggs)
        .filter(F.col("__n1") > 0)
    )
    out = per_key.withColumn("t1", F.array_min("__c1"))
    for i in range(2, len(steps) + 1):
        prev = F.col(f"t{i-1}")
        out = out.withColumn(
            f"t{i}",
            F.array_min(F.filter(F.col(f"__c{i}"), lambda x: x > prev)),
        )
    depth = F.lit(1)
    for i in range(2, len(steps) + 1):
        depth = depth + F.when(F.col(f"t{i}").isNotNull(), 1).otherwise(0)
    return out.select(
        key_col,
        depth.cast("long").alias("depth"),
        *[F.col(f"t{i}") for i in range(1, len(steps) + 1)],
    )


def retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 86_400,
) -> DataFrame:
    """Cohort retention: keys cohorted by the period bucket of their
    first event; for every (cohort, offset) the number of distinct
    keys active ``offset`` periods after their cohort period. Returns
    (cohort, offset, n_users) with cohort = floor(first_ts / period)
    as an epoch bucket (integer bucket arithmetic — engine-portable,
    no calendar-week convention to disagree on).

    Two uniform-key shuffles: distinct (key, bucket) activity, then
    the per-key min bucket joined back on the key — the activity table
    is already one row per (key, period) so the final count is a plain
    ``count(*)``. No windows, no driver-side state.
    """

    us = period_seconds * 1_000_000
    # Exact integer bucketing: subtracting the modulus first makes the
    # division an exact integer-valued double (< 2^53), so the bucket
    # matches DuckDB's integer `//` on every input — a plain
    # floor(epoch / period) in double can round a timestamp within
    # ~the quotient's half-ulp of a boundary into the wrong period.
    epoch = _epoch_us(ts_col)
    bucket = ((epoch - epoch % F.lit(us)) / F.lit(us)).cast("long")
    active = (
        events.select(
            F.col(key_col).alias("__k"), bucket.alias("__bucket")
        )
        .distinct()
    )
    return retention_from_activity(active)


def retention_from_activity(
    active: DataFrame, key_col: str = "__k", bucket_col: str = "__bucket"
) -> DataFrame:
    """:func:`retention` core over a deduplicated (key, period-bucket)
    activity table — the table the incremental maintainer keeps as its
    state (with signed support counts consolidated away first)."""

    first = active.groupBy(key_col).agg(F.min(bucket_col).alias("cohort"))
    return (
        active.join(first, key_col)
        .groupBy(
            "cohort", (F.col(bucket_col) - F.col("cohort")).alias("offset")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def asof_join(
    points: DataFrame,
    quotes: DataFrame,
    on: list[str],
    ts_col: str = "ts",
    quote_ts_col: str = "ts",
    point_id_col: str = "event_id",
    quote_id_col: str = "quote_id",
    value_col: str = "value",
) -> DataFrame:
    """Point-in-time (as-of) join: attach to every point row the most
    recent quote row with the same keys and quote-time <= point-time —
    the feature-store primitive that prevents training-serving skew
    (each training example must see exactly the feature values that
    existed at its own event time, never later ones). Returns
    (point_id, keys..., ts, asof_quote_id, asof_value); points with no
    prior quote keep NULLs (left semantics).

    NOT implemented as a range join: the classic formulation
    (quote.ts = max over quotes <= point.ts) needs an inequality join
    that Spark lowers to a nested loop. Instead both sides UNION into
    one stream tagged quote=0 / point=1 and a single window
    PARTITIONED by key, ordered by (time, tag, id), carries the last
    non-null quote forward (``last(..., ignorenulls=True)``) — one
    uniform-key shuffle + per-key sort, the same cost as any grouped
    window, at any scale. A quote at exactly the point's timestamp IS
    visible (tag orders quotes first), matching ASOF JOIN ``>=``
    semantics; equal-time quotes resolve to the highest quote id —
    total order, engine-portable.
    """

    pid, qid = F.col(point_id_col), F.col(quote_id_col)
    pt = points.select(
        *[F.col(c) for c in on],
        F.col(ts_col).alias("__t"),
        pid.alias("__pid"),
        F.lit(None).cast("long").alias("__qid"),
        F.lit(None).cast("double").alias("__qv"),
        F.lit(1).alias("__tag"),
    )
    qt = quotes.select(
        *[F.col(c) for c in on],
        F.col(quote_ts_col).alias("__t"),
        F.lit(None).cast("long").alias("__pid"),
        qid.cast("long").alias("__qid"),
        F.col(value_col).cast("double").alias("__qv"),
        F.lit(0).alias("__tag"),
    )
    w = (
        Window.partitionBy(*on)
        .orderBy(
            _epoch_us("__t"),
            F.col("__tag"),
            F.coalesce(F.col("__qid"), F.col("__pid")),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = pt.unionByName(qt).select(
        *on,
        "__t",
        "__pid",
        "__tag",
        F.last("__qid", ignorenulls=True).over(w).alias("asof_quote_id"),
        F.last("__qv", ignorenulls=True).over(w).alias("asof_value"),
    )
    return merged.filter(F.col("__tag") == 1).select(
        F.col("__pid").alias(point_id_col),
        *on,
        F.col("__t").alias(ts_col),
        "asof_quote_id",
        "asof_value",
    )

def resample_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    grid_seconds: int = 3600,
    id_col: str = "event_id",
) -> DataFrame:
    """Resample an irregular per-key series onto a regular time grid,
    carrying the last observation forward (LOCF gap-fill) — the step
    that turns an event log into the regularly-sampled series a
    training job can window over. Returns (key, grid_us, value) where
    ``grid_us = tick * grid_seconds * 1e6`` and ``value`` is the most
    recent observation at-or-before the tick. The grid spans each
    key's own observed range: first tick at-or-after its first
    observation through the last tick at-or-before its final one, so
    no value is ever invented before a key exists (no leading NULLs to
    special-case downstream).

    Scale shape: equal-timestamp observations collapse via ``max_by``
    (latest ``id_col`` wins — a total order, engine-portable), one
    ``lead`` window gives each observation its validity interval
    [ts, next_ts), and each observation explodes to exactly the grid
    ticks it covers. Explode volume == output volume — the resampled
    series itself — so there is no intermediate blow-up: two
    uniform-key shuffles (dedup agg + window) and a map-side explode,
    linear at any scale. A naive grid×events range join would be a
    BroadcastNestedLoopJoin; a per-key collect would not be
    distributed.

    Beyond-reference: the reference stops at windows over observed
    events (SURVEY §2.5); gap-filling regularization has no analog
    there.
    """

    return resample_locf_us(
        events.withColumn("__us", _epoch_us(ts_col)),
        key_col,
        "__us",
        value_col,
        id_col,
        grid_seconds * 1_000_000,
    )


def resample_locf_us(
    events: DataFrame,
    key_col: str = "k",
    tu_col: str = "tu",
    value_col: str = "value",
    id_col: str = "eid",
    grid_us: int = 3_600_000_000,
) -> DataFrame:
    """:func:`resample_locf` core over a pre-computed epoch-us column
    — the maintainer's entry point (shared-core discipline)."""

    g = grid_us
    obs = (
        events.withColumn("__us", F.col(tu_col))
        .groupBy(key_col, "__us")
        .agg(F.max_by(F.col(value_col), F.col(id_col)).alias("__v"))
    )
    w = Window.partitionBy(key_col).orderBy("__us")
    nxt = obs.withColumn("__next_us", F.lead("__us").over(w))
    # ceil/floor in exact integer arithmetic (epoch_us >= 0 here;
    # `div` is long division in Spark, `//` in the DuckDB twin).
    lo = F.expr(f"(__us + {g - 1}) div {g}")
    hi = F.when(
        F.col("__next_us").isNull(), F.expr(f"__us div {g}")
    ).otherwise(F.expr(f"(__next_us + {g - 1}) div {g} - 1"))
    ticks = nxt.select(
        F.col(key_col),
        F.col("__v"),
        F.explode(
            F.when(lo <= hi, F.sequence(lo, hi)).otherwise(
                F.expr("CAST(array() AS array<bigint>)")
            )
        ).alias("__tick"),
    )
    return ticks.select(
        F.col(key_col),
        (F.col("__tick") * g).alias("grid_us"),
        F.col("__v").cast("double").alias("value"),
    )

def rolling_zscore(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    window_seconds: int = 604_800,
    min_n: int = 8,
    threshold: float = 2.0,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: flag events whose
    value deviates more than ``threshold`` standard deviations from
    the key's own trailing-window distribution (monitoring spikes,
    feature drift, bad-sensor runs). Returns (id, key, value, z) for
    the anomalous events only; windows with fewer than ``min_n``
    events are never flagged (a 2-event "distribution" flags half of
    everything).

    Engine portability: count/sum/sum-of-squares accumulate in exact
    DECIMAL over the RANGE window (order-independent), then the
    moment arithmetic runs as single IEEE double ops on identical
    operands — mean = s/n, var = ss/n - mean² (clamped at 0: exact
    cancellation can land a hair negative), z = (v - mean)/std — so
    both engines produce bit-identical z. Same one-partitioned-window
    shape as :func:`rolling_stats`: parallel across keys, never a
    global sort.
    """

    return rolling_zscore_us(
        events.withColumn("__tu", _epoch_us(ts_col)),
        key_col=key_col,
        tu_col="__tu",
        value_col=value_col,
        id_col=id_col,
        window_us=window_seconds * 1_000_000,
        min_n=min_n,
        threshold=threshold,
    )


def rolling_zscore_us(
    events: DataFrame,
    key_col: str = "k",
    tu_col: str = "tu",
    value_col: str = "value",
    id_col: str = "eid",
    window_us: int = 604_800_000_000,
    min_n: int = 8,
    threshold: float = 2.0,
) -> DataFrame:
    """:func:`rolling_zscore` core over a pre-computed epoch-us column
    — the maintainer's entry point (shared-core discipline)."""

    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(tu_col))
        .rangeBetween(-window_us, 0)
    )
    dv = F.col(value_col).cast("decimal(18,6)")
    stats = events.select(
        F.col(id_col),
        F.col(key_col),
        F.col(value_col).cast("double").alias("__val"),
        F.count(F.lit(1)).over(w).alias("__n"),
        F.sum(dv).over(w).cast("double").alias("__s"),
        F.sum(dv * dv).over(w).cast("double").alias("__ss"),
    )
    mean = F.col("__s") / F.col("__n")
    var = F.greatest(
        F.col("__ss") / F.col("__n") - mean * mean, F.lit(0.0)
    )
    z = F.round(
        (F.col("__val") - mean) / F.nullif(F.sqrt(var), F.lit(0.0)), 6
    )
    return (
        stats.filter(F.col("__n") >= min_n)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > threshold)
        .select(
            F.col(id_col),
            F.col(key_col),
            F.col("__val").alias("value"),
            "z",
        )
    )


def changepoint(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket_seconds: int = 86_400,
    window: int = 7,
    min_shift: float = 0.0,
) -> DataFrame:
    """Mean-shift changepoint profile per key: bucket events into
    ``bucket_seconds`` bins, then at every bin compare the mean of the
    PRECEDING ``window`` bins against the mean of the bin-inclusive
    NEXT ``window`` bins (the two-sided sliding-window test — the
    batch form of CUSUM-style drift detection a corpus/metrics monitor
    runs when a new source lands). Returns (key, bucket, left_mean,
    right_mean, mean_shift) for every bin where BOTH windows are full,
    mean_shift >= ``min_shift``, ordered within the caller's compare.

    Determinism discipline: per-row values cast to DECIMAL(18,6), bin
    sums and window sums are exact decimal (associative — partition-
    order-free), counts are integers; the ONLY float ops are the final
    correctly-rounded double divisions/subtraction, identical in any
    engine. ROWS frames over the per-key bin sequence (bins are unique
    per key, so the order is total); partitions are key-sized bin
    tables, never a global sort. One uniform (key, bin) aggregation
    shuffle + one key-partitioned window — linear at any corpus size.
    """

    us = bucket_seconds * 1_000_000
    daily = (
        events.select(
            F.col(key_col).alias("key"),
            F.floor(_epoch_us(ts_col) / us).alias("bucket"),
            F.col(value_col).cast("decimal(18,6)").alias("v"),
        )
        .groupBy("key", "bucket")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
    )
    return changepoint_from_daily(daily, window=window, min_shift=min_shift)


def changepoint_from_daily(
    daily: DataFrame,
    window: int = 7,
    min_shift: float = 0.0,
) -> DataFrame:
    """:func:`changepoint` core over pre-aggregated (key, bucket, s, c)
    bin sums — the maintainer's entry point (shared-core discipline:
    the streaming twin re-derives through THIS function, so maintained
    and batch semantics cannot drift). ``s`` must be an exact decimal
    sum and ``c`` the bin's event count."""

    wl = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(-window, -1)
    )
    wr = (
        Window.partitionBy("key")
        .orderBy("bucket")
        .rowsBetween(0, window - 1)
    )
    stats = daily.select(
        "key",
        "bucket",
        F.count(F.lit(1)).over(wl).alias("nl"),
        F.sum("s").over(wl).alias("sl"),
        F.sum("c").over(wl).alias("cl"),
        F.count(F.lit(1)).over(wr).alias("nr"),
        F.sum("s").over(wr).alias("sr"),
        F.sum("c").over(wr).alias("cr"),
    ).filter((F.col("nl") == window) & (F.col("nr") == window))
    l_mean = F.col("sl").cast("double") / F.col("cl")
    r_mean = F.col("sr").cast("double") / F.col("cr")
    return stats.select(
        "key",
        "bucket",
        F.round(l_mean, 6).alias("left_mean"),
        F.round(r_mean, 6).alias("right_mean"),
        F.round(F.abs(r_mean - l_mean), 6).alias("mean_shift"),
    ).filter(F.col("mean_shift") >= min_shift)


def last_touch_attribution(
    events: DataFrame,
    conversion: str = "purchase",
    touches: tuple = ("click", "view"),
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    tu_col: str | None = None,
) -> DataFrame:
    """Last-touch conversion attribution: for every ``conversion``
    event, the same key's most recent STRICTLY-preceding touch event
    (type in ``touches``) — the credit assignment a growth/ads
    pipeline runs nightly, and the event-analytics sibling of funnel
    (funnel asks "did the ordered steps happen"; attribution asks
    "which touch gets the conversion"). Returns (event_id, user_id,
    conv_tu, touch_event_id, touch_type, gap_us); a conversion with no
    prior touch keeps NULL touch columns (a "direct" conversion — a
    report that dropped it would overstate attributed volume).

    Shape: ONE key-partitioned window over the touch+conversion events
    ordered (tu, event_id) — ties at the same microsecond break by
    event id, so "strictly preceding" is total and engine-portable —
    with a ROWS frame ending at 1 PRECEDING and last(... ignorenulls)
    picking the latest touch. The three touch columns derive from the
    same CASE, so they always come from the same row. Per-key
    partitions, never a global sort; events of other types are dropped
    at the scan."""

    # tu_col: callers that already hold epoch-micros (the incremental
    # maintainer's state) pass it directly — no timestamp round-trip,
    # no session-zone exposure.
    tu = F.col(tu_col) if tu_col else _epoch_us(ts_col)
    ev = events.filter(
        F.col(type_col).isin([conversion, *touches])
    ).select(
        F.col(key_col).alias("k"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("t"),
        tu.alias("tu"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("tu", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("t") != conversion
    flagged = ev.select(
        "k",
        "event_id",
        "t",
        "tu",
        F.last(F.when(is_touch, F.col("tu")), ignorenulls=True)
        .over(w)
        .alias("touch_tu"),
        F.last(F.when(is_touch, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("touch_event_id"),
        F.last(F.when(is_touch, F.col("t")), ignorenulls=True)
        .over(w)
        .alias("touch_type"),
    )
    return flagged.filter(F.col("t") == conversion).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("tu").alias("conv_tu"),
        "touch_event_id",
        "touch_type",
        (F.col("tu") - F.col("touch_tu")).alias("gap_us"),
    )


def ewma_term_sql(
    j: int, window: str = "(PARTITION BY user_id ORDER BY tu, event_id)"
) -> str:
    """One exact-decimal EWMA tap: lag(value, j) x 2^-(j+1), shared
    verbatim by the Spark operator and the DuckDB oracle so both
    engines evaluate the identical decimal expression. The weight
    prints at 8 decimals — every dyadic weight down to 2^-8
    terminates there exactly."""

    return (
        f"CAST(coalesce(lag(CAST(value AS DECIMAL(18,6)), {j}) "
        f"OVER {window} "
        f"* CAST('{2.0 ** -(j + 1):.8f}' AS DECIMAL(10,8)), 0) "
        "AS DECIMAL(30,14))"
    )


def ewma_dyadic(
    events: DataFrame,
    taps: int = 8,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Half-life EWMA smoothing, dyadic-exact: per key, in (ts, id)
    order, the classic recursion s_t = v_t/2 + s_{t-1}/2 truncated to
    a ``taps``-term FIR — the j-th most recent value weighs 2^-(j+1)
    (tail weight past 8 taps is < 0.4%). The smoothing pass a metrics
    or feature pipeline runs before thresholding noisy per-entity
    series. Returns (event_id, user_id, tu, value, ewma).

    Determinism discipline: EXACT DECIMAL end-to-end. Every dyadic
    weight 2^-(j+1) terminates within 8 decimals (that is WHY the
    kernel is dyadic rather than the usual alpha=0.1 — arbitrary alpha
    powers don't terminate), values cast to DECIMAL(18,6) (the
    rolling_stats cross-engine cast), so each term, the sum, and the
    final HALF_UP round-6 are exact decimal arithmetic that cannot
    land between engines — a pure-double chain measured FAIL here:
    dyadic sums of 2-decimal-ish values hit .5e-6 rounding midpoints
    routinely, where Spark rounds the exact decimal and DuckDB rounds
    x*1e6 in floats (the PR_CONTRIB_SQL lesson, transposed to
    windows). Missing lags (the first taps-1 rows of each key)
    contribute 0 — the standard seed-at-zero warm-up of streaming
    EWMA implementations, documented rather than renormalized. Shape:
    ONE key-partitioned window, taps lag() columns over the same
    frame, no joins, no global sort."""

    if taps < 1:
        raise ValueError(f"ewma_dyadic: taps must be >= 1, got {taps}")
    tu = _epoch_us(ts_col)
    ev = events.select(
        F.col(id_col).alias("event_id"),
        F.col(key_col).alias("user_id"),
        tu.alias("tu"),
        F.col(val_col).cast("double").alias("value"),
    )
    term = " + ".join(ewma_term_sql(j) for j in range(taps))
    return ev.withColumn(
        "ewma", F.expr(f"CAST(round({term}, 6) AS DOUBLE)")
    )


def time_weighted_avg(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-weighted average (TWAP): per key, each value held until
    the NEXT observation weighs by its holding duration — the honest
    mean of an irregularly-sampled series (a plain AVG over-weights
    bursts; finance's TWAP, monitoring's time-weighted utilization).
    The last observation of each key has no successor and carries no
    weight (standard left-closed convention). Returns (user_id,
    n_holds, held_us, twap).

    Determinism discipline: durations are exact integer microseconds
    (lead over a (tu, id)-total order); each value casts to
    DECIMAL(18,6) — the established cross-engine-exact cast for this
    corpus (rolling_stats) — so value x duration products and their
    sums are EXACT decimals at any partitioning; the single float op
    is the final correctly-rounded division, rounded to 6. Shape: one
    key-partitioned lead window + one key aggregation; nothing global,
    nothing joins."""

    tu = _epoch_us(ts_col)
    ev = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("event_id"),
        tu.alias("tu"),
        F.col(val_col).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("tu", "event_id")
    held = ev.withColumn(
        "hold_us", F.lead("tu").over(w) - F.col("tu")
    ).filter(F.col("hold_us").isNotNull())
    return held.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_holds"),
        F.sum("hold_us").alias("held_us"),
        F.expr(
            "round(CAST(sum(CAST(value AS DECIMAL(18,6)) * hold_us) "
            "AS DOUBLE) / nullif(CAST(sum(hold_us) AS DOUBLE), 0.0), 6)"
        ).alias("twap"),
    )


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix of event types: for every
    observed (from_type, to_type) pair of CONSECUTIVE events of the
    same key, the transition count and row-normalized probability —
    the sequence model behind next-action prediction, bot detection
    (improbable chains), and session-shape drift. Returns (from_type,
    to_type, n, p), p = round(n / out_total(from_type), 6).

    Shape: one key-partitioned lead() window (the attribution/funnel
    discipline — per-key partitions, ties broken by event id), one
    uniform (from, to) count, and a broadcast join against the
    type-level totals (|types| rows) for the normalization — no
    window over the count table, no global sort. At 100 TB the pair
    table is |types|² regardless of corpus size."""

    tu = _epoch_us(ts_col)
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(type_col).alias("t"),
        tu.alias("tu"),
        F.col(id_col).alias("eid"),
    )
    w = Window.partitionBy("k").orderBy("tu", "eid")
    pairs = (
        ev.withColumn("to_type", F.lead("t").over(w))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("t").alias("from_type"), "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("from_type").agg(F.sum("n").alias("out_n"))
    return pairs.join(F.broadcast(totals), "from_type").select(
        "from_type",
        "to_type",
        "n",
        F.expr("round(CAST(n AS DOUBLE) / out_n, 6)").alias("p"),
    )


def burstiness(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 2,
) -> DataFrame:
    """Inter-arrival burstiness per key: the index of dispersion
    (variance / mean) of the gaps between consecutive events — ~mean
    for a Poisson process, far above it for bursty bots/retry storms,
    near 0 for schedulers. The arrival-process feature a traffic or
    abuse pipeline computes per entity. Returns (user_id, n_gaps,
    mean_gap_s, dispersion_s) — both in SECONDS; keys with fewer than
    ``min_gaps`` gaps are dropped (a 1-gap variance is 0 by
    construction and reads as 'perfectly regular').

    Determinism discipline: gaps are exact integer microseconds; the
    two moments (Σg, Σg²) aggregate as exact DECIMAL(38,0) — the
    assortativity/anomalies discipline, associative at any
    partitioning — and the float ops are the final divisions
    (population variance via E[g²] − E[g]², clamped at 0 against
    exact-cancellation dust), rounded to 6. The outputs are in
    SECONDS deliberately: a microsecond mean gap is ~1e10, and
    round-6 at that magnitude needs 1e16 scaled integers — past
    double's 2^53, where the two engines' nearest-representable
    values differ in the last digit (measured FAIL). Seconds keep
    the scaled value far inside exact-integer range. Shape: one
    key-partitioned lead window + one key aggregation."""

    tu = _epoch_us(ts_col)
    ev = events.select(
        F.col(key_col).alias("user_id"),
        F.col(id_col).alias("eid"),
        tu.alias("tu"),
    )
    w = Window.partitionBy("user_id").orderBy("tu", "eid")
    gaps = ev.withColumn(
        "g", F.lead("tu").over(w) - F.col("tu")
    ).filter(F.col("g").isNotNull())
    m = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(F.expr("CAST(g AS DECIMAL(38,0))")).alias("sg"),
        F.sum(
            F.expr("CAST(g AS DECIMAL(38,0)) * CAST(g AS DECIMAL(38,0))")
        ).alias("sgg"),
    )
    return m.filter(F.col("n_gaps") >= min_gaps).select(
        "user_id",
        "n_gaps",
        F.expr(
            "round(CAST(sg AS DOUBLE) / n_gaps / 1000000.0, 6)"
        ).alias("mean_gap_s"),
        F.expr(
            "round(greatest(CAST(sgg AS DOUBLE) / n_gaps - "
            "(CAST(sg AS DOUBLE) / n_gaps) * "
            "(CAST(sg AS DOUBLE) / n_gaps), 0.0) / "
            "nullif(CAST(sg AS DOUBLE) / n_gaps, 0.0) / 1000000.0, 6)"
        ).alias("dispersion_s"),
    )


RFM_RECENCY_DAYS = (30, 90, 365)
RFM_FREQUENCY = (2, 5, 10)
RFM_MONETARY = (1_000, 5_000, 20_000)


def rfm_segments(
    orders: DataFrame,
    key_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
) -> DataFrame:
    """Banded RFM segmentation: per customer, Recency (days since
    last order, vs the corpus max date), Frequency (order count) and
    Monetary (exact DECIMAL(18,2) revenue sum), each banded 1-4 by
    FIXED policy thresholds (RFM_* above) — the lifecycle segmentation
    a CRM/growth pipeline materializes nightly. Returns (custkey,
    recency_days, frequency, monetary, r_score, f_score, m_score,
    segment) with segment = 100·r + 10·f + m.

    Fixed bands rather than quantiles ON PURPOSE: quantile scoring
    needs a rank over all customers — a global sort that lands the
    whole dimension on a handful of reducers at 100 TB (the
    plan-audit's banned shape) — while policy bands are one CASE
    ladder over an already-aggregated row, stable across runs, and
    comparable across corpus snapshots (a quantile RFM silently
    re-defines 'good' every night). Shape: one key aggregation + one
    1-row broadcast of the corpus max date; monetary sums exact
    DECIMAL(18,2) (the TPC-H money cast), day arithmetic exact
    integers."""

    du = _epoch_us(date_col)
    agg = orders.groupBy(F.col(key_col).alias("custkey")).agg(
        F.max(du).alias("last_us"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.expr(f"CAST({amount_col} AS DECIMAL(18,2))")).alias(
            "monetary"
        ),
    )
    maxd = orders.agg(F.max(du).alias("corpus_max_us"))
    r1, r2, r3 = RFM_RECENCY_DAYS
    f1, f2, f3 = RFM_FREQUENCY
    m1, m2, m3 = RFM_MONETARY
    scored = agg.crossJoin(F.broadcast(maxd)).select(
        "custkey",
        # exact integer day arithmetic on epoch micros — the corpus
        # max is the 1-row broadcast, never a second pass per row
        F.expr(
            "CAST((corpus_max_us - last_us) DIV 86400000000 AS INT)"
        ).alias("recency_days"),
        "frequency",
        "monetary",
    ).select(
        "custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.expr(
            f"CASE WHEN recency_days <= {r1} THEN 4 "
            f"WHEN recency_days <= {r2} THEN 3 "
            f"WHEN recency_days <= {r3} THEN 2 ELSE 1 END"
        ).alias("r_score"),
        F.expr(
            f"CASE WHEN frequency >= {f3} THEN 4 "
            f"WHEN frequency >= {f2} THEN 3 "
            f"WHEN frequency >= {f1} THEN 2 ELSE 1 END"
        ).alias("f_score"),
        F.expr(
            f"CASE WHEN monetary >= {m3} THEN 4 "
            f"WHEN monetary >= {m2} THEN 3 "
            f"WHEN monetary >= {m1} THEN 2 ELSE 1 END"
        ).alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.expr("CAST(100 * r_score + 10 * f_score + m_score AS INT)"),
    ).withColumn(
        # engine lockstep: band comparisons above ran on the exact
        # DECIMAL(18,2) sum; the EMITTED column is the cast-round
        # double every TPC-H money key uses, so Spark and the DuckDB
        # twin hash identically (DECIMAL "3916451.10" vs double
        # "3916451.1" was the r11 driver-red seam).
        "monetary",
        F.round(F.col("monetary").cast("double"), 2),
    )


def top_paths(
    events: DataFrame,
    depth: int = 3,
    top_k: int = 20,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Most common event paths: the ``top_k`` most frequent
    ``depth``-step consecutive event-type sequences across all keys —
    the path-mining view behind UX flow analysis and bot-signature
    discovery (transition_matrix is the depth-2 marginal of this).
    Returns (t1..t<depth>, n) with a TOTAL tie order (n desc, then
    the path lexicographically), so the top-k cut is deterministic in
    any engine.

    Shape: ONE key-partitioned window producing depth-1 lead()
    columns, one uniform path count, and a TakeOrderedAndProject of
    top_k rows — the output is |types|^depth at worst and top_k
    always; nothing global sorts the data."""

    if depth < 2:
        raise ValueError(f"top_paths: depth must be >= 2, got {depth}")
    tu = _epoch_us(ts_col)
    ev = events.select(
        F.col(key_col).alias("k"),
        F.col(type_col).alias("t1"),
        tu.alias("tu"),
        F.col(id_col).alias("eid"),
    )
    w = Window.partitionBy("k").orderBy("tu", "eid")
    cols = ["t1"]
    for j in range(1, depth):
        name = f"t{j + 1}"
        ev = ev.withColumn(name, F.lead("t1", j).over(w))
        cols.append(name)
    paths = (
        ev.filter(F.col(cols[-1]).isNotNull())
        .groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("n"))
    )
    order = [F.desc("n")] + [F.asc(c) for c in cols]
    return paths.orderBy(*order).limit(top_k)


def seasonality(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
) -> DataFrame:
    """Day-of-week seasonality profile per key: (key, dow, n, share,
    avg_value) — the weekly-shape fingerprint behind load forecasting
    and anomaly baselines (a metric that breaks its own weekday
    profile is the alert). dow is 0=Monday..6=Sunday computed as
    exact INTEGER arithmetic on epoch days ((days + 3) % 7 —
    1970-01-01 was a Thursday), NEVER an engine dayofweek() builtin:
    Spark numbers Sunday=1, DuckDB Sunday=0, and both answers depend
    on session settings somewhere. share = n / key total (round 6);
    avg_value sums exact DECIMAL(18,6) first.

    Shape: one |keys| x 7 aggregation with map-side combine + a
    broadcast join against the |keys|-row totals."""

    tu = _epoch_us(ts_col)
    # integer day arithmetic: FLOOR division of epoch micros (the
    # timestamps here are non-negative; a DIV would truncate toward
    # zero and mislabel pre-1970 rows — guard with floor for generality)
    base = events.select(
        F.col(key_col).alias("k"),
        (F.floor(tu / F.lit(86_400_000_000)).cast("long") + F.lit(3)).alias(
            "__days3"
        ),
        F.col(val_col).alias("v"),
    ).select(
        "k",
        F.expr("CAST(__days3 % 7 AS INT)").alias("dow"),
        "v",
    )
    prof = base.groupBy("k", "dow").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.expr("CAST(v AS DECIMAL(18,6))")).alias("sv"),
    )
    tot = prof.groupBy("k").agg(F.sum("n").alias("tot"))
    return prof.join(F.broadcast(tot), "k").select(
        F.col("k").alias(key_col),
        "dow",
        "n",
        F.expr("round(CAST(n AS DOUBLE) / tot, 6)").alias("share"),
        F.expr("round(CAST(sv AS DOUBLE) / n, 6)").alias("avg_value"),
    )
