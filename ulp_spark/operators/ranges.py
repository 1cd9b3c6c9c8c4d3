"""Range (interval-containment) join: points joined to the intervals that
contain them — WITHOUT a BroadcastNestedLoopJoin.

Spark's optimizer turns a bare ``p.ts >= i.start AND p.ts < i.end`` join
into a nested-loop (O(|points|·|intervals|) — a scale-killer).  The
standard distributed strategy (same trick as Databricks' range-join bin
optimization) is BINNING: pick a bin width W, assign every point to the
single bin ``floor(ts / W)``, explode every interval to ALL bins it
overlaps, equi-join on the bin key (a plain shuffled hash join), then
re-check the exact predicate.  Each (point, interval) pair meets in
exactly one bin — the point's — so no dedup is needed.  Cost:
shuffle(|points| + |intervals| · avg_bins_per_interval); pick W near the
typical interval length so intervals explode to O(1) bins.

All timestamp arithmetic is in epoch MICROSECONDS (exact integers; no
session-timezone dependence for TIMESTAMP_NTZ inputs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _us(df: DataFrame, col: str) -> Column:
    """Epoch micros, TYPE-AWARE.  TIMESTAMP (instant) goes through
    unix_micros — casting an instant to NTZ first would read the
    session-local WALL CLOCK, which is non-monotonic across a DST
    fall-back (an interval spanning the fold would look inverted and
    silently drop matches).  TIMESTAMP_NTZ (which unix_micros rejects)
    uses the NTZ-epoch diff, matching DuckDB's epoch_us on naive
    timestamps."""
    dt = df.schema[col].dataType.typeName()
    if dt == "timestamp":
        return F.unix_micros(F.col(col))
    epoch = F.lit("1970-01-01 00:00:00").cast("timestamp_ntz")
    return F.timestamp_diff("MICROSECOND", epoch,
                            F.col(col).cast("timestamp_ntz"))


def range_join(
    points: DataFrame, intervals: DataFrame,
    point_ts: str, start_ts: str, end_ts: str,
    bin_width_s: int = 300,
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point_ts < end``.  Returns all columns of both inputs.

    ``bin_width_s`` is the binning width in seconds; intervals longer
    than the width explode to proportionally more bin rows (cost is
    linear, correctness unaffected).
    """
    types = {points.schema[point_ts].dataType.typeName(),
             intervals.schema[start_ts].dataType.typeName(),
             intervals.schema[end_ts].dataType.typeName()}
    if len(types) != 1:
        raise ValueError(
            f"range_join requires one timestamp type on all three "
            f"columns (instant vs NTZ micros are incomparable): {types}")
    w_us = int(bin_width_s) * 1_000_000

    def idiv(a: Column) -> Column:
        # exact floor division at ALL magnitudes: (a - pmod) is an exact
        # multiple of w_us; dividing in decimal(38,0) (not double — a
        # double round-trips only up to 2^53 micros, ~year 2255) keeps
        # the quotient exact, and pmod gives floor semantics for
        # negative epochs too.
        floored = (a - F.pmod(a, F.lit(w_us))).cast("decimal(38,0)")
        return (floored / F.lit(w_us)).cast("bigint")

    p = points.withColumn("__bin", idiv(_us(points, point_ts)))
    s_us, e_us = _us(intervals, start_ts), _us(intervals, end_ts)
    # interval [s, e) overlaps bins floor(s/W) .. floor((e-1)/W); empty or
    # inverted intervals (e <= s) produce no bins (sequence would run
    # DESCENDING otherwise — Spark's auto-negative-step trap).
    iv = intervals.withColumn(
        "__bins",
        F.when(e_us > s_us, F.sequence(idiv(s_us), idiv(e_us - 1)))
        .otherwise(F.array().cast("array<bigint>")),
    ).withColumn("__bin", F.explode("__bins")).drop("__bins")
    joined = p.join(iv, "__bin").filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) < F.col(end_ts)))
    return joined.drop("__bin")
