"""Temporal join operators Spark lacks as built-ins (as-of join,
range join, gap filling) — expressed as compositions of existing
DataFrame ops so Catalyst still optimizes them (SURVEY §2.5 ext).

Scale notes:
- ``asof_join`` uses the union + partitioned-window formulation: no
  range cross-product ever materializes, state per key is one row
  (the running last match), and the only shuffle is on the join key —
  the same dataflow whether there are 10 or 10 billion rows per key.
- ``bucketed_range_join`` converts an interval join into an equi-join
  on overlapping buckets + a residual predicate: Spark would
  otherwise fall back to BroadcastNestedLoopJoin (quadratic); with
  bucketing the shuffle is keyed and the residual filter is
  map-side.
- ``gap_fill`` materializes the dense grid with ``sequence`` —
  JVM-side, no driver loop — and left-joins observations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    strict: bool = True,
) -> DataFrame:
    """For every left row, the right row with the greatest
    ``right_ts`` <= (``<`` when strict) ``left_ts`` for the same key.

    Union-window formulation: tag both sides, sort by (key, ts, tag)
    and carry the last-seen right values forward with a running
    ``last(ignorenulls)`` window — one shuffle on the key, no range
    join, no per-row probe."""
    lt = left.withColumn("__ts__", F.col(left_ts)).withColumn("__is_l__", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts__"),
            *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        )
        .withColumn("__is_l__", F.lit(0))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # strict: right rows at the same instant sort AFTER left rows, so
    # a left row cannot see a simultaneous right row; non-strict: the
    # right row sorts first and is visible
    tag_order = F.col("__is_l__").asc() if not strict else F.col("__is_l__").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts__").asc(), tag_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    return (
        carried.where(F.col("__is_l__") == 1)
        .drop("__ts__", "__is_l__", *[f"__r_{c}" for c in right_vals])
    )


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400 * 30,
) -> DataFrame:
    """point-in-interval join without a nested-loop plan: both sides
    explode to the coarse buckets they touch, equi-join on the bucket,
    then the exact containment predicate filters residually.  Interval
    rows replicate only across the buckets they span."""
    pb = points.withColumn(
        "__bucket__", F.floor(F.unix_timestamp(F.col(point_col)) / bucket_seconds)
    )
    ib = intervals.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_col)) / bucket_seconds),
                F.floor(F.unix_timestamp(F.col(end_col)) / bucket_seconds),
            )
        ),
    )
    return (
        pb.join(ib, "__bucket__")
        .where((F.col(point_col) >= F.col(start_col)) & (F.col(point_col) < F.col(end_col)))
        .drop("__bucket__")
    )


def gap_fill(
    observed: DataFrame,
    ts_col: str,
    step_seconds: int,
    group_cols: list[str],
    fill: dict[str, float],
) -> DataFrame:
    """Dense time grid per group: every ``step_seconds`` tick between
    the group's min and max observation, with missing ticks taking
    the ``fill`` defaults — the sparse→dense step before windowed
    models.  The grid is built with ``sequence`` (JVM-side) and the
    observations left-join back."""
    bounds = observed.groupBy(*group_cols).agg(
        F.min(ts_col).alias("__min__"), F.max(ts_col).alias("__max__")
    )
    grid = bounds.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("__min__"),
                F.col("__max__"),
                F.expr(f"INTERVAL {step_seconds} SECONDS"),
            )
        ).alias(ts_col),
    )
    out = grid.join(observed, [*group_cols, ts_col], "left_outer")
    for c, v in fill.items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out


def event_sequence_pairs(
    events: DataFrame,
    first_type: str,
    then_type: str,
    within_s: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """CEP-style sequence pattern: for every ``first_type`` event, the
    first ``then_type`` event by the same user within ``within_s``
    seconds — "view followed by purchase inside 30 minutes", the
    MATCH_RECOGNIZE / FlinkCEP staple.

    Output: (user_id, first_event_id, first_ts, then_ts, gap_us).

    Dataflow: ONE window over (user, time) — the next-matching-event
    timestamp is a running MIN over the strictly-following frame, so
    no self-join, no range join, no per-user state beyond the sort:
    exactly one shuffle keyed by user.  Works in epoch micros so the
    arithmetic is integer-exact on both engines."""
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_then_us = F.min(F.when(F.col(type_col) == then_type, ts_us)).over(w)
    return (
        events.withColumn("_ts_us", ts_us)
        .withColumn("_next_us", next_then_us)
        .where(
            (F.col(type_col) == first_type)
            & F.col("_next_us").isNotNull()
            & ((F.col("_next_us") - F.col("_ts_us")) <= within_s * 1_000_000)
        )
        .select(
            F.col(user_col),
            F.col(id_col).alias("first_event_id"),
            F.col(ts_col).alias("first_ts"),
            F.timestamp_micros(F.col("_next_us")).cast("timestamp_ntz").alias("then_ts"),
            (F.col("_next_us") - F.col("_ts_us")).alias("gap_us"),
        )
    )


def interval_union(
    events: DataFrame,
    duration_s: int,
    key_cols: list[str],
    ts_col: str = "ts",
) -> DataFrame:
    """(key..., n_islands, covered_s): per-key union length of the
    intervals ``[ts, ts + duration_s)`` — the gaps-and-islands shape
    (time-on-site, machine-uptime, sensor-coverage rollups).

    Classic two-window formulation: an interval starts a new island
    when its start exceeds the running max end of all earlier
    intervals; island ids are the running count of such starts; one
    aggregate per island, one per key.  All arithmetic is integer
    epoch seconds, so the result is exact on both engines.  Both
    windows and both aggregations share the ``key_cols`` partitioning,
    so the whole plan is ONE shuffle of the events (AQE reuses the
    exchange), and per-key window state is O(1).
    """
    from pyspark.sql.window import Window

    # integer epoch micros (exact; NTZ under a UTC session keeps the
    # wall time); duration_s stays the caller-facing unit
    if dict(events.dtypes).get(ts_col) == "bigint":
        ep = F.col(ts_col)
    else:
        ep = F.unix_micros(F.col(ts_col).cast("timestamp"))
    dur = F.lit(int(duration_s) * 1_000_000).cast("bigint")
    base = events.select(*key_cols, ep.alias("s"), (ep + dur).alias("e"))
    w = Window.partitionBy(*key_cols).orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = base.withColumn(
        "new_island", F.when(prev_max_e.isNull() | (F.col("s") > prev_max_e), 1).otherwise(0)
    )
    islands = flagged.withColumn(
        "island", F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    per_island = islands.groupBy(*key_cols, "island").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    return per_island.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_islands"),
        (F.sum(F.col("ie") - F.col("is_")) / F.lit(1_000_000))
        .cast("double")
        .alias("covered_s"),
    )


def decayed_activity_score(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
    window: int = 8,
) -> DataFrame:
    """(key, n_recent, decay_score): per-key exponentially decayed
    activity — the recency-weighted engagement metric (half-life = one
    event): the most recent event counts fully, each older one half as
    much, truncated at ``window`` events.

    Determinism is the design constraint: a float 0.5**lag chain sums
    in partition order, so instead each value is scaled by the INTEGER
    weight 2^(window-1-lag), summed exactly in decimal, and divided by
    2^(window-1) once at the end — a power-of-two division of a
    double, which is exact.  The whole thing is one partitioned
    window (row_number) + one partial agg: shuffle on the key only,
    identical dataflow at any scale."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    scale = 1 << (window - 1)
    recent = (
        events.select(
            F.col(key_col).alias("key"),
            F.col(value_col).cast("decimal(28,6)").alias("v"),
            (F.row_number().over(w) - 1).alias("lag"),
        )
        .where(F.col("lag") < window)
    )
    # python F.shiftleft needs a literal bit count; the SQL form
    # accepts an expression
    weight = F.expr(f"cast(shiftleft(1, {window - 1} - lag) as bigint)")
    return (
        recent.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            (
                F.sum(F.col("v") * weight).cast("double") / F.lit(float(scale))
            ).alias("decay_score"),
        )
    )


def scd2_intervals(
    events: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(key, attr, valid_from, valid_to, n_events): slowly-changing-
    dimension type-2 history built from an event log — consecutive
    same-attribute runs per key collapse into validity intervals,
    ``valid_to`` = the next regime's start (NULL on the open, current
    regime).  This is the change-data-capture → dimension-history
    build every warehouse does; the triple-store analogue is the
    per-predicate commit history (vc_history) at entity grain.

    Gaps-and-islands with two window passes over the SAME (key, ts)
    partitioning — one shuffle total, then a keyed aggregate; no
    self-joins."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    runs = (
        events.select(key_col, attr_col, ts_col, id_col)
        .withColumn("_chg", F.lag(attr_col).over(w) != F.col(attr_col))
        .withColumn(
            "_run",
            F.sum(F.when(F.coalesce(F.col("_chg"), F.lit(True)), 1).otherwise(0)).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    iv = runs.groupBy(key_col, "_run", attr_col).agg(
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("valid_from")
    return iv.select(
        F.col(key_col).alias("key"),
        F.col(attr_col).alias("attr"),
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def markov_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """(prev_type, next_type, n, p): first-order Markov transition
    matrix over per-user event sequences — the behavioral model
    behind next-action prediction and funnel diagnostics.

    LAG over a window PARTITIONED BY user (distributed across users;
    ``id_col`` breaks timestamp ties so the sequence is total), one
    (prev, next) count aggregate, and the row-normalizing total joined
    back — n and the row totals are exact bigints, so p is a single
    deterministic double division.  K² output rows regardless of
    corpus size."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(id_col))
    seq = events.select(
        F.lag(type_col).over(w).alias("prev_type"), F.col(type_col).alias("next_type")
    ).where(F.col("prev_type").isNotNull())
    counts = seq.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return counts.join(totals, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.col("row_n").cast("double")).alias("p"),
    )


def ohlc_downsample(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """(key, bucket_start, open, high, low, close, n): OHLC
    downsampling — per key and time bucket, the first/max/min/last
    value plus the sample count (the candlestick / monitoring rollup
    every time-series store exposes; the reference's temporal
    analytics sibling of gap_fill).

    Open/close are argmin/argmax over (ts, event_id) via
    min/max(struct(...)) — partial-aggregating, ORDER-FREE (no window,
    no sort): one groupBy on (key, window) that AQE can shuffle
    however it likes, bit-identical result.  At 100 TB this is the
    canonical map-side-combine rollup: state per group is five
    scalars."""
    w = F.window(F.col(ts_col), bucket)
    o = F.min(
        F.struct(F.col(ts_col), F.col("event_id"), F.col(value_col).alias("v"))
    )
    c = F.max(
        F.struct(F.col(ts_col), F.col("event_id"), F.col(value_col).alias("v"))
    )
    return (
        events.groupBy(F.col(key_col).alias("key"), w.alias("_w"))
        .agg(
            o.alias("_o"),
            c.alias("_c"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "key",
            F.col("_w.start").cast("timestamp_ntz").alias("bucket_start"),
            F.col("_o.v").alias("open"),
            "high",
            "low",
            F.col("_c.v").alias("close"),
            "n",
        )
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance_s: int | None = None,
    right_id: str = "event_id",
) -> DataFrame:
    """Forward (look-ahead) as-of join with a match tolerance: for
    every left row, the EARLIEST right row at or after it for the
    same key — (right_ts, right_id) minimal, so ties at one instant
    resolve deterministically — NULLed out when the gap exceeds
    ``tolerance_s`` seconds.  The attribution/next-action shape
    ("first purchase within 2 days of the click"), completing
    :func:`asof_join`'s backward direction.

    Same union-window plan as the backward join, scanned in DESCENDING
    time order (one shuffle on the key, no range join): walking from
    the future toward each left row, the last right row seen is
    exactly the nearest one at-or-after it.  Adds ``asof_<col>``
    columns plus ``asof_gap_s``."""
    lt = left.withColumn("__ts__", F.col(left_ts)).withColumn("__is_l__", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts__"),
            F.col(right_id).alias("__rid__"),
            *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        )
        .withColumn("__is_l__", F.lit(0))
        .withColumn("__rts__", F.col("__ts__"))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # descending time; at one instant rights come first (non-strict:
    # a simultaneous right row IS a 0-gap match); among equal-ts
    # rights the larger id scans first so last() keeps the smallest
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("__ts__").desc(), F.col("__is_l__").asc(), F.col("__rid__").desc()
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last("__rts__", ignorenulls=True).over(w).alias("__mts__"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__a_{c}")
            for c in right_vals
        ],
    )
    # integer epoch micros (the module's exact-arithmetic convention;
    # unix_timestamp on NTZ would read the session zone); the reported
    # gap floor-divides to whole seconds and the tolerance compares in
    # MICROS so fractional-second timestamps stay integer-exact
    gap_us = F.unix_micros(F.col("__mts__").cast("timestamp")) - F.unix_micros(
        F.col("__ts__").cast("timestamp")
    )
    gap = F.floor(gap_us / F.lit(1_000_000)).cast("bigint")
    ok = F.col("__mts__").isNotNull() & (
        F.lit(True)
        if tolerance_s is None
        else (gap_us <= F.lit(int(tolerance_s) * 1_000_000))
    )
    out_vals = [
        F.when(ok, F.col(f"__a_{c}")).alias(f"asof_{c}") for c in right_vals
    ] + [F.when(ok, gap).alias("asof_gap_s")]
    return (
        carried.where(F.col("__is_l__") == 1)
        .select(
            *[c for c in left.columns],
            *out_vals,
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tolerance_s: int | None = None,
    right_id: str = "event_id",
) -> DataFrame:
    """Nearest-match as-of join: for every left row, the right row
    with the SMALLEST absolute time gap in either direction for the
    same key (pandas merge_asof direction='nearest'), ties preferring
    the backward (at-or-before) match, then the smallest right id —
    fully deterministic.  ``tolerance_s`` NULLs matches whose
    absolute gap exceeds it.

    Two union-window passes over the same key partitioning (one
    ascending carry for the latest at-or-before right, one descending
    for the earliest at-or-after — each the proven one-shuffle plan
    of :func:`asof_join` / :func:`asof_join_forward`), then a per-row
    argmin between the two candidates.  No range join, no per-row
    probe; adds ``asof_<col>``, ``asof_abs_gap_s``, ``asof_dir``."""
    lt = left.withColumn("__ts__", F.col(left_ts)).withColumn("__is_l__", F.lit(1))
    rt = (
        right.select(
            F.col(key),
            F.col(right_ts).alias("__ts__"),
            F.col(right_id).alias("__rid__"),
            *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        )
        .withColumn("__is_l__", F.lit(0))
        .withColumn("__rts__", F.col("__ts__"))
    )
    unioned = lt.unionByName(rt, allowMissingColumns=True)
    # ascending pass: rights sort before lefts at the same instant
    # (a simultaneous right IS a 0-gap backward match); equal-ts
    # rights scan largest-id first so last() keeps the smallest id
    wb = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts__").asc(), F.col("__is_l__").asc(), F.col("__rid__").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts__").desc(), F.col("__is_l__").asc(), F.col("__rid__").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.select(
        "*",
        F.last("__rts__", ignorenulls=True).over(wb).alias("__bts__"),
        F.last("__rts__", ignorenulls=True).over(wf).alias("__fts__"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wb).alias(f"__b_{c}")
            for c in right_vals
        ],
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(wf).alias(f"__f_{c}")
            for c in right_vals
        ],
    )
    l_us = F.unix_micros(F.col("__ts__").cast("timestamp"))
    bgap = l_us - F.unix_micros(F.col("__bts__").cast("timestamp"))
    fgap = F.unix_micros(F.col("__fts__").cast("timestamp")) - l_us
    take_back = F.col("__bts__").isNotNull() & (
        F.col("__fts__").isNull() | (bgap <= fgap)
    )
    gap_us = F.when(take_back, bgap).otherwise(fgap)
    has = F.col("__bts__").isNotNull() | F.col("__fts__").isNotNull()
    ok = has & (
        F.lit(True)
        if tolerance_s is None
        else (gap_us <= F.lit(int(tolerance_s) * 1_000_000))
    )
    out_vals = (
        [
            F.when(ok, F.when(take_back, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}"))).alias(
                f"asof_{c}"
            )
            for c in right_vals
        ]
        + [
            F.when(ok, F.floor(gap_us / F.lit(1_000_000)).cast("bigint")).alias(
                "asof_abs_gap_s"
            ),
            F.when(ok, F.when(take_back, F.lit("back")).otherwise(F.lit("fwd"))).alias(
                "asof_dir"
            ),
        ]
    )
    return carried.where(F.col("__is_l__") == 1).select(
        *[c for c in left.columns], *out_vals
    )


def resample_interpolate(
    observed: DataFrame,
    ts_col: str,
    step_seconds: int,
    group_cols: list[str],
    val_col: str,
) -> DataFrame:
    """(group..., ts, value, filled): dense time grid per group with
    LINEAR INTERPOLATION across gaps — the sensor/price-series
    resampling step where carry-forward (LOCF) would bias a ramp:
    an interior missing tick takes v_prev + (v_next − v_prev)·
    (t − t_prev)/(t_next − t_prev), rounded to 6 places so the
    float is engine-stable; observed ticks pass through untouched
    (``filled`` marks the synthesized rows).

    Plan: the :func:`gap_fill` grid (JVM-side ``sequence``), then ONE
    window partitioning serves all four carries (previous/next value
    and timestamp via last/first ignorenulls over mirrored frames) —
    a (group)-keyed sort, no self-join, no per-gap probe.  Grid ends
    never extrapolate: before the first or after the last observation
    the value stays NULL.  Observations OFF the min-anchored grid
    pass through untouched and anchor their neighbors' ramps
    (``observed`` must have at most one row per (group, ts) —
    pre-aggregate upstream)."""
    grid = gap_fill(observed, ts_col, step_seconds, group_cols, {})
    # observations that do not land on the min-anchored grid must not
    # vanish: they pass through AND anchor their neighbors' ramps
    offgrid = observed.join(
        grid.select(*group_cols, ts_col), [*group_cols, ts_col], "left_anti"
    )
    dense = grid.unionByName(offgrid.select(*grid.columns))
    wb = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*group_cols)
        .orderBy(ts_col)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    v = F.col(val_col)
    marked = dense.select(
        *group_cols,
        ts_col,
        v.alias("__v__"),
        F.when(v.isNotNull(), F.col(ts_col)).alias("__ots__"),
    )
    carried = marked.select(
        *group_cols,
        ts_col,
        "__v__",
        F.last("__v__", ignorenulls=True).over(wb).alias("__pv__"),
        F.last("__ots__", ignorenulls=True).over(wb).alias("__pt__"),
        F.first("__v__", ignorenulls=True).over(wf).alias("__nv__"),
        F.first("__ots__", ignorenulls=True).over(wf).alias("__nt__"),
    )
    t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pt_us = F.unix_micros(F.col("__pt__").cast("timestamp"))
    nt_us = F.unix_micros(F.col("__nt__").cast("timestamp"))
    interp = F.round(
        F.col("__pv__")
        + (F.col("__nv__") - F.col("__pv__"))
        * ((t_us - pt_us).cast("double") / (nt_us - pt_us).cast("double")),
        6,
    )
    can = (
        F.col("__v__").isNull()
        & F.col("__pv__").isNotNull()
        & F.col("__nv__").isNotNull()
    )
    return carried.select(
        *group_cols,
        ts_col,
        F.when(F.col("__v__").isNotNull(), F.col("__v__"))
        .when(can, interp)
        .alias("value"),
        (F.col("__v__").isNull() & can).alias("filled"),
    )


def holt_linear_forecast(
    df: DataFrame,
    key_col: str,
    t_col: str,
    y_col: str,
    horizons: tuple[int, ...] = (1, 3),
) -> DataFrame:
    """(key, n_periods, level6, trend6, forecast_h...): Holt's LINEAR
    TREND method (double exponential smoothing, Holt 1957 / the ETS
    (A,A,N) model — the standard capacity-planning forecast) with
    α = β = 1/2, run as an exact FIXED-POINT recurrence:

        l_t = floor((y_t·1e6 + l_{t-1} + b_{t-1}) / 2)
        b_t = floor((l_t − l_{t-1} + b_{t-1}) / 2)        (l_1 = y_1·1e6, b_1 = 0)

    Level and trend live in micro-unit BIGINTs and every step is an
    integer add + floor halve, so the recurrence is bit-identical on
    any engine at ANY series length — no float error accumulation,
    no left-vs-pairwise fold mismatch (a raw float EWMA is exact
    only to ~50 steps at α = 1/2).  Forecast at horizon h is the
    linear extrapolation (l_T + h·b_T) / 1e6.

    The sequential dependence lives INSIDE one per-key array fold
    (sort_array + aggregate over the collected series — a series is
    one key's bounded history, thousands of points at most, while
    keys distribute freely), so the plan is one groupBy: the same
    shape at 5 keys and 5 million."""
    zero = F.lit(0).cast("bigint")

    def half_floor(x):
        # floor(x/2) on BIGINT micro-units, negative-safe
        return F.floor(x.cast("double") / F.lit(2.0)).cast("bigint")

    series = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col(t_col).alias("t"),
                    F.col(y_col).cast("bigint").alias("y"),
                )
            )
        ).alias("_s"),
        F.count(F.lit(1)).cast("bigint").alias("n_periods"),
    )
    init = F.struct(
        zero.alias("l"), zero.alias("b"), F.lit(0).cast("bigint").alias("i")
    )

    def step(acc, row):
        y6 = row["y"] * F.lit(1000000).cast("bigint")
        l_new = F.when(acc["i"] == 0, y6).otherwise(
            half_floor(y6 + acc["l"] + acc["b"])
        )
        b_new = F.when(acc["i"] == 0, zero).otherwise(
            half_floor(l_new - acc["l"] + acc["b"])
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            (acc["i"] + 1).alias("i"),
        )

    folded = series.select(
        "key",
        "n_periods",
        F.aggregate(F.col("_s"), init, step).alias("_hw"),
    )
    cols = [
        "key",
        "n_periods",
        F.col("_hw.l").alias("level6"),
        F.col("_hw.b").alias("trend6"),
    ]
    for h in horizons:
        cols.append(
            (
                (F.col("_hw.l") + F.lit(h) * F.col("_hw.b")).cast("double")
                / F.lit(1e6)
            ).alias(f"forecast_{h}")
        )
    return folded.select(*cols)
