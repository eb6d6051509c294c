"""Temporal join / rollup operators: as-of join, interval (range) join,
hierarchical time rollup.

Beyond-reference surface: the reference's only temporal notion is the
run watermark (`/root/reference/main_dag.py:40-43`); a time-series or
training-data pipeline needs point-in-time correctness (as-of), bounded
time-proximity joins (interval), and multi-granularity rollups
(hypertable-style). Spark has no built-in as-of or interval join, so
both are implemented as compositions of existing DataFrame ops with
scale-safe plans — no UDFs, no cross joins, no driver loops:

- as-of:    the union+window plan. Tag both sides, union, one window
            sort per key carries the latest right-side value forward
            (``last(ignorenulls)`` over rows-unbounded-preceding), then
            keep left rows. ONE shuffle on the join key; never builds
            candidate pairs, so it is immune to the per-key quadratic
            blowup a naive ``t_left >= t_right`` join suffers.
- interval: bucketed band join. Right rows land in one fixed-width time
            bucket; left rows probe the ≤3 buckets their ±tolerance
            window can overlap (explode ≤3, not a range predicate), the
            equi-join on (key, bucket) bounds the candidate set, and an
            exact band filter finishes. Shuffle keys are (key, bucket),
            so a hot key is further spread across time — the classic
            skew-resistant interval-join plan (Flink's interval join /
            Databricks range-join hints do the same binning).
- rollup:   ``ROLLUP(day, hour)`` grouping sets — the hypertable
            continuous-aggregate shape: every granularity computed in
            one pass with map-side partial aggregation, instead of one
            scan per granularity.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = ("value",),
    ts_out: str = "asof_ts",
) -> DataFrame:
    """Point-in-time join: for every left row, attach the right row with
    the largest ``right_ts <= left_ts`` for the same ``key`` (ties at
    equal timestamps match, as in ANSI/DuckDB ``ASOF JOIN ... >=``).
    Left rows with no preceding right row keep nulls (left-outer).

    Contract: ``right`` must be unique per (key, right_ts) — pre-
    aggregate if not, or the carried value is ambiguous in ANY engine.

    Plan: union both sides (side tag 0=right, 1=left so a right row at
    the exact left timestamp sorts first and is visible), one window
    per key ordered by (ts, side) carrying each right column forward
    with ``last(ignorenulls=True)``, filter back to left rows. Single
    hash-partition on the key + in-partition sort; at 100 TB this is
    strictly the exchange a sort-merge equi-join would do anyway.

    Output columns are ``left.columns + [ts_out] + right_cols`` — a
    collision (left already carries ``ts_out`` or one of ``right_cols``)
    would produce ambiguous duplicate names, so it raises up front;
    rename on the way in (interval_join auto-suffixes instead because
    it returns ALL right columns; here the caller picks them).
    """
    clash = ({ts_out} | set(right_cols)) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join output name collision on {sorted(clash)}: rename the "
            f"left column(s) or pass a different ts_out/right_cols"
        )
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__left"),
        F.lit(None).cast("timestamp").alias("__rts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l_tagged.schema["__left"].dataType).alias("__left"),
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "__side",
        "__left",
        F.last("__rts", ignorenulls=True).over(w).alias(ts_out),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c) for c in right_cols],
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols], ts_out, *right_cols
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    tolerance_sec: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Band join: all (left, right) pairs sharing ``key`` with
    ``|right_ts - left_ts| <= tolerance_sec`` (inclusive bounds).
    Returns the left columns, right columns suffixed ``_r`` on name
    clash, plus ``delta_us = right_ts - left_ts`` in microseconds.

    Plan: right rows are bucketed once at width = tolerance; left rows
    explode to the 2–3 buckets their window overlaps; equi-join on
    (key, bucket); exact filter. Each true pair is found exactly once
    (the right row lives in exactly one bucket), so no distinct is
    needed. Candidate count is bounded by bucket co-residency — never
    the all-pairs-per-key explosion of a pure range-predicate join,
    which Spark would execute as a per-key nested loop.
    """
    t_us = int(tolerance_sec) * 1_000_000

    rcols = right.columns
    rename = {c: (f"{c}_r" if c in left.columns else c) for c in rcols}
    r = right.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(right_ts)).alias("__rus"),
        (F.unix_micros(F.col(right_ts)) / F.lit(t_us)).cast("long").alias("__bucket"),
        F.struct(*rcols).alias("__right"),
    )
    lo = (F.unix_micros(F.col(left_ts)) - F.lit(t_us)) / F.lit(t_us)
    hi = (F.unix_micros(F.col(left_ts)) + F.lit(t_us)) / F.lit(t_us)
    l = left.select(
        F.col(key).alias("__k"),
        F.unix_micros(F.col(left_ts)).alias("__lus"),
        F.explode(F.sequence(lo.cast("long"), hi.cast("long"))).alias("__bucket"),
        F.struct(*left.columns).alias("__left"),
    )
    joined = l.join(r, ["__k", "__bucket"]).filter(
        F.abs(F.col("__rus") - F.col("__lus")) <= F.lit(t_us)
    )
    return joined.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__right.{c}").alias(rename[c]) for c in rcols],
        (F.col("__rus") - F.col("__lus")).alias("delta_us"),
    )


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: Column | None = None,
) -> DataFrame:
    """Hierarchical time rollup (hypertable continuous-aggregate shape):
    counts and value sums at (day, hour), (day), and grand-total
    granularity in ONE pass via ``ROLLUP``. ``g_day``/``g_hour`` are the
    grouping flags (1 = aggregated away) so a null day from rollup is
    distinguishable from a null data value. DECIMAL-cast sum keeps the
    double deterministic across engines and partition orders."""
    v = value_col if value_col is not None else F.col("value")
    return (
        df.withColumn("day", F.date_trunc("day", F.col(ts_col)))
        .withColumn("hour", F.date_trunc("hour", F.col(ts_col)))
        .rollup("day", "hour")
        .agg(
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(v.cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    bucket_sec: int,
    left_start: str = "start",
    left_end: str = "end",
    right_start: str = "start",
    right_end: str = "end",
) -> DataFrame:
    """Interval-overlap join: all (left, right) pairs sharing ``key``
    whose [start, end] intervals intersect (inclusive bounds). Returns
    left columns, right columns suffixed ``_r`` on clash, plus
    ``overlap_us``.

    Spark has no overlap-join operator; the naive range-predicate join
    is a per-key nested loop. This decomposes time into ``bucket_sec``
    cells: every interval explodes to the cells it covers, candidates
    equi-join on (key, cell), and each TRUE pair is emitted exactly
    once — at the first cell both intervals inhabit (cell ==
    greatest(floor(start/w)) of the two) — so no distinct pass over the
    pair stream is needed. Candidates are bounded by per-cell
    co-residency; pick ``bucket_sec`` near the median interval length
    (too small explodes long intervals across many cells, too large
    degenerates toward per-key nested loops). At 100 TB the shuffle key
    (key, cell) also defuses hot keys: a heavy user's intervals spread
    over its time cells instead of one reducer."""
    w_us = int(bucket_sec) * 1_000_000

    def prep(df: DataFrame, start: str, end: str, side: str, cols: list[str]) -> DataFrame:
        s_us = F.unix_micros(F.col(start))
        e_us = F.unix_micros(F.col(end))
        return df.select(
            F.col(key).alias("__k"),
            s_us.alias(f"__{side}s"),
            e_us.alias(f"__{side}e"),
            F.explode(
                F.sequence((s_us / w_us).cast("long"), (e_us / w_us).cast("long"))
            ).alias("__cell"),
            F.struct(*cols).alias(f"__{side}"),
        )

    lcols, rcols = left.columns, right.columns
    rename = {c: (f"{c}_r" if c in lcols else c) for c in rcols}
    l = prep(left, left_start, left_end, "l", lcols)
    r = prep(right, right_start, right_end, "r", rcols)
    first_shared = F.greatest(
        (F.col("__ls") / w_us).cast("long"), (F.col("__rs") / w_us).cast("long")
    )
    joined = l.join(r, ["__k", "__cell"]).filter(
        (F.col("__ls") <= F.col("__re"))
        & (F.col("__rs") <= F.col("__le"))
        & (F.col("__cell") == first_shared)
    )
    return joined.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__r.{c}").alias(rename[c]) for c in rcols],
        (F.least("__le", "__re") - F.greatest("__ls", "__rs")).alias("overlap_us"),
    )
