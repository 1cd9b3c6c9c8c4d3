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


def _row_salt(df: DataFrame, buckets: int,
              salt_on: Column | None = None) -> Column:
    """Deterministic per-row salt in [0, buckets): caller-supplied column
    hash, else xxhash64 of the whole row (pass ``salt_on`` when the row
    contains unhashable types like MapType)."""
    base = (salt_on if salt_on is not None
            else F.xxhash64(*[F.col(c) for c in df.columns]))
    return F.pmod(base, F.lit(buckets))


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
    salt = _row_salt(df, salt_buckets, salt_on)
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
    salt_on: Column | None = None,
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
    if how not in ("inner", "left", "leftouter", "left_outer"):
        # right/full/outer would keep each unmatched SMALL replica as its
        # own null-extended row — S duplicates — so reject loudly.
        raise ValueError(f"salted_join supports inner/left only, got {how!r}")
    b = big.withColumn("__salt", _row_salt(big, salt_buckets, salt_on))
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, [*keys, "__salt"], how).drop("__salt")
