"""Skew-aware aggregation: two-level salted aggregates.

The fixture's ``source`` column is deliberately skewed (web=60%,
FIXTURES.md T1) — the analog of the reference's 1-file-=-1-task skew where
one huge file pegs one worker (``src/workerpool.rs:130``).  For algebraic
aggregates (count/sum/min/max/bit_or) the fix is classic salting:

    stage 1: groupBy(key, salt = hash(row) % S)  -- hot key splits S ways
    stage 2: groupBy(key) re-combine

Both stages are map-side-combined hash aggregations, so the extra shuffle
volume is |keys| x S rows — nothing — while the hot key's reduce work
fans out over S tasks instead of one.  (AQE's skew handling only splits
skewed *join* partitions; skewed aggregation keys still need salting.)

``salted_agg`` takes (agg_col_expr, combine1, combine2) triples so any
algebraic aggregate decomposes correctly: count -> (count, sum), avg ->
(sum+count, sum/sum), etc.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, Column, str]],
    salt_buckets: int = 32,
    salt_on: Column | None = None,
) -> DataFrame:
    """Two-level aggregation with a salt on the first level.

    ``aggs``: (output name, partial aggregate over raw rows, final combine
    fn name); the final fn re-aggregates the partials, e.g.::

        salted_agg(df, ["source"], [
            ("n_rows", F.count(F.lit(1)), "sum"),
            ("sum_tok", F.sum("n_tok"), "sum"),
            ("max_tok", F.max("n_tok"), "max"),
        ])
    """
    salt = (
        F.pmod(salt_on, F.lit(salt_buckets))
        if salt_on is not None
        else F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    )
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(*[a.alias(n) for n, a, _ in aggs])
    )
    finals = [getattr(F, fn)(n).alias(n) for n, _, fn in aggs]
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame, small: DataFrame, keys: list[str],
    salt_buckets: int = 16, how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: a hot key on the big side fans out over
    ``salt_buckets`` reduce tasks instead of one.

    The big side gets a deterministic per-row salt (xxhash64 of the whole
    row, mod S); the small side is replicated S ways (explode of a
    0..S-1 sequence); the join runs on (keys + salt).  Shuffle volume
    grows by |small| x (S - 1) — cheap when small is dimension-sized but
    too big to broadcast.  Use when AQE's skew-join can't kick in (e.g.
    the join is forced to shuffled-hash, or salting must compose with a
    downstream same-key aggregation).  Results are row-identical to the
    plain join (pytest-pinned).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]),
                  F.lit(salt_buckets))
    b = big.withColumn("__salt", salt)
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [*keys, "__salt"], how).drop("__salt")
