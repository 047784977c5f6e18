"""Temporal operators Spark lacks natively — the as-of join.

As-of (a.k.a. point-in-time / MERGE_ASOF) join: for every left row,
the LATEST right row with ``right.ts <= left.ts`` within the same
key — how event logs attach "state at the time" (last price before a
trade, last page view before a click). Spark has no ASOF JOIN; the
naive re-expression is a range theta-join (quadratic blowup per key).

Re-expression here is the merge-sorted algorithm as ONE declarative
plan: tag both sides, union, and run a single keyed, time-ordered
window with a carry-forward ``last(payload, ignorenulls)`` — exactly
one hash exchange on the key plus one sort, linear in rows at any
scale (the same shape a native ASOF implementation produces).
Verified value-exact against DuckDB's NATIVE ASOF JOIN — a fully
independent implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts: str = "ts",
    start: str = "start_ts",
    end: str = "end_ts",
    bin_seconds: int = 3600,
    max_cover: int | None = None,
    level_scale: int = 8,
    max_levels: int = 6,
) -> DataFrame:
    """points × intervals with ``start ≤ ts < end`` — the temporal
    twin of the engine's cell-indexed spatial join. A naive range
    theta-join forces a broadcast-nested-loop; binning re-expresses it
    as an EQUI-join Catalyst can hash/broadcast: intervals explode
    over the hour bins they cover, points key by their bin, and the
    pair is counted once in the canonical bin that contains the
    point's timestamp (that bin is the point's own bin — so the
    containment refine subsumes the dedup, no distinct needed: same
    trick as the overlay's canonical-cell filter). Pick ``bin_seconds``
    ≈ typical interval length so the cover stays O(1) per interval.

    Cover valve (``max_cover``): heavy-tailed interval tables (a few
    month-long intervals among millions of hour-long ones) would
    explode the long tail into thousands of bins each — the time-axis
    twin of split_by_cover_size (operators/spatial_join.py). With
    ``max_cover`` set, each interval is routed to the COARSEST-needed
    level of a bin hierarchy (widths bin_seconds·level_scale^ℓ,
    ℓ < max_levels): the lowest level where its cover ≤ max_cover.
    Every level runs the same equi-join + containment refine against
    points keyed at that level's width, results union — still zero
    nested-loop joins, and per-interval explode is bounded by
    ``max_cover`` (except at the top level, which bounds the
    hierarchy: width · max_cover · level_scale^(max_levels-1) spans
    ~centuries at the defaults). Each interval lives in exactly ONE
    level, so no cross-level dedup is needed."""
    if max_cover is None:
        return _interval_join_level(points, intervals, ts, start, end,
                                    int(bin_seconds))
    s, e = F.unix_timestamp(F.col(start)), F.unix_timestamp(F.col(end))
    out = None
    for lvl in range(max_levels):
        width = int(bin_seconds) * int(level_scale) ** lvl
        cover = F.floor(e / F.lit(width)) - F.floor(s / F.lit(width)) + 1
        sel = (cover <= max_cover) if lvl < max_levels - 1 else F.lit(True)
        if lvl > 0:
            prev_w = int(bin_seconds) * int(level_scale) ** (lvl - 1)
            prev_cover = (
                F.floor(e / F.lit(prev_w)) - F.floor(s / F.lit(prev_w)) + 1
            )
            sel = sel & (prev_cover > max_cover)
        part = _interval_join_level(
            points, intervals.filter(sel), ts, start, end, width
        )
        out = part if out is None else out.unionByName(part)
    return out


def _interval_join_level(
    points: DataFrame, intervals: DataFrame, ts: str, start: str, end: str,
    width: int,
) -> DataFrame:
    """One bin level: explode intervals over their ``width``-second bin
    cover, equi-join points on their own bin, refine by containment."""
    # unix_timestamp truncates to seconds, so the end bin is covered
    # unconditionally (a half-open interval ending mid-second still
    # reaches into it); the containment refine discards any surplus
    b = F.lit(int(width))
    p = points.withColumn("_bin", F.floor(F.unix_timestamp(F.col(ts)) / b))
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start)) / b),
                F.floor(F.unix_timestamp(F.col(end)) / b),
            )
        ),
    )
    return (
        p.join(i, "_bin", "inner")
        .filter((F.col(start) <= F.col(ts)) & (F.col(ts) < F.col(end)))
        .drop("_bin")
    )


def gapfill_locf(
    series: DataFrame,
    by: str,
    ts: str,
    value: str,
    bucket_seconds: int,
    start_ts: str,
    end_ts: str,
    id_col: str | None = None,
) -> DataFrame:
    """Regular time grid per key with last-observation-carried-forward
    — the hypertable ``time_bucket_gapfill(..., locf(...))`` shape:
    → (by, bucket_ts, value_filled, observed).

    Semantics: buckets of ``bucket_seconds`` over the half-open
    [start_ts, end_ts) literal window; each key contributes a row for
    EVERY bucket; a bucket's own value is its last observation
    (latest ts; ties broken on ``id_col`` descending — a total order,
    same discipline as asof_join); empty buckets carry the previous
    bucket's value forward; leading empties stay NULL. ``observed``
    marks buckets with a real observation.

    Plan shape (audited on this repo's fixture): two hash exchanges —
    (key, bucket) for the in-bucket last-observation window, and (key)
    shared by the grid build and the carry-forward window; the
    grid↔obs equi-join broadcasts when the reduced observation table
    (≤ one row per non-empty bucket) fits, and falls back to a shuffle
    that reuses those same partitionings otherwise. No nested loop;
    linear at any scale."""
    b = F.lit(int(bucket_seconds))
    lo = F.floor(F.unix_timestamp(F.lit(start_ts)) / b)
    hi = F.floor(F.unix_timestamp(F.lit(end_ts)) / b)
    order = [F.col(ts).desc()] + ([F.col(id_col).desc()] if id_col else [])
    wb = Window.partitionBy(by, "_bin").orderBy(*order)
    obs = (
        series.withColumn("_bin", F.floor(F.unix_timestamp(F.col(ts)) / b))
        .filter((F.col("_bin") >= lo) & (F.col("_bin") < hi))
        .withColumn("_rn", F.row_number().over(wb))
        .filter(F.col("_rn") == 1)
        .select(by, "_bin", F.col(value).alias("_v"))
    )
    grid = (
        series.select(by).distinct()
        .select(F.col(by), F.explode(F.sequence(lo, hi - 1)).alias("_bin"))
    )
    wf = (
        Window.partitionBy(by)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [by, "_bin"], "left")
        .withColumn("observed", F.col("_v").isNotNull())
        .withColumn("value_filled", F.last("_v", ignorenulls=True).over(wf))
        .select(
            by,
            F.timestamp_seconds(F.col("_bin") * b).alias("bucket_ts"),
            "value_filled",
            "observed",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "prev_",
) -> DataFrame:
    """← left columns + ``prefix``-renamed right ``payload`` columns of
    the latest right row with ``right[ts] <= left[ts]`` per ``by`` key
    (NULLs when no prior right row — left-join semantics).

    Ordering inside one timestamp: right rows sort BEFORE left rows
    (``<=`` semantics: a right row at exactly left's ts matches), and
    equal-ts right rows break ties on the FULL payload struct
    (field-by-field, in ``payload`` order) — a total order, so the
    carried-forward payload is deterministic across runs even when two
    right rows share (by, ts, payload[0]) but differ later (DuckDB's
    native ASOF is arbitrary on such ties; ours is pinned)."""
    payload = payload or [c for c in right.columns if c != by]
    pstruct = F.struct(*[F.col(c).alias(c) for c in payload])
    r2 = right.select(
        F.col(by),
        F.col(ts).alias("_t"),
        pstruct.alias("_p"),
        F.lit(0).alias("_side"),
    )
    l2 = left.withColumn("_t", F.col(ts)).withColumn("_side", F.lit(1))
    u = l2.unionByName(r2, allowMissingColumns=True)
    w = (
        Window.partitionBy(by)
        .orderBy(
            F.col("_t").asc(),
            F.col("_side").asc(),
            F.col("_p").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        u.withColumn("_m", F.last("_p", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    for c in payload:
        out = out.withColumn(prefix + c, F.col("_m").getField(c))
    return out.drop("_t", "_side", "_p", "_m")


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    by: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Session assignment: within each ``by`` key, a NEW session starts
    at the first event and whenever the gap since the previous event is
    ≥ ``gap_seconds`` — the same boundary rule as Spark's native
    streaming ``session_window`` (an event extends its session's
    window by ``gap``; an event arriving exactly at the closed end
    opens a new one), so the batch assignment and the streaming rollup
    agree. Output = input + ``session_seq`` (0-based per key, in time
    order; ties broken by ``id_col`` for a total order). Gap
    arithmetic is exact integer MICROSECONDS — no float time math.

    Scale shape: one hash exchange on the key + one per-key sort (the
    lag/cumsum island pattern); sessions never cross keys, so there is
    no global order anywhere."""
    if gap_seconds < 1:
        raise ValueError(f"gap_seconds must be >= 1, got {gap_seconds}")
    gap_us = int(gap_seconds) * 1_000_000
    # parquet event times are TIMESTAMP_NTZ; unix_micros needs TS —
    # the cast interprets NTZ in the session tz (UTC here, matching
    # DuckDB's epoch_us view of NTZ), exact to the microsecond
    d = events.withColumn("_us", F.unix_micros(F.col(ts_col).cast("timestamp")))
    w = Window.partitionBy(by).orderBy("_us", id_col)
    new = F.when(
        F.lag("_us").over(w).isNull()
        | (F.col("_us") - F.lag("_us").over(w) >= gap_us),
        1,
    ).otherwise(0)
    return (
        d.withColumn("session_seq", (F.sum(new).over(w) - 1).cast("long"))
        .drop("_us")
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    ts_col: str = "ts",
    by: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup over sessionize: ``(by, session_seq,
    n_events, ts_start, ts_end, duration_us)`` — duration in exact
    integer microseconds. The batch twin of a streaming
    ``session_window`` aggregation (same boundary rule;
    ``session_window.end == ts_end + gap``): one keyed window + one
    map-side-combined groupBy whose key extends the window's
    partitioning."""
    s = sessionize(events, gap_seconds, ts_col, by, id_col)
    return s.groupBy(by, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("ts_start"),
        F.max(ts_col).alias("ts_end"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("duration_us"),
    )
