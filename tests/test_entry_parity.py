"""Mimics the driver's CORRECTNESS gate: run each __spark_entry__ query and
its DuckDB oracle side-by-side at sf0.01, compare row multisets exactly
(column order normalized by name, NULLs included)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _norm(v):
    if isinstance(v, float):
        return round(v, 9) if math.isfinite(v) else str(v)
    if isinstance(v, bool):
        return int(v)
    return v


def _rows(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(_norm(r[i]) for i in order) for r in data]
    return sorted(rows, key=lambda t: tuple((v is None, str(type(v)), v) for v in t))


def test_driver_gate_capacity():
    """The driver records at most 50 CORRECTNESS rows; every active query
    must get a verdict (round-2 lesson: 55 queries -> 5 silently ungated)."""
    active = entrymod.queries()
    assert len(active) <= 50
    assert set(entrymod.oracle_sql()) <= set(active)
    # retired queries stay out of the driver surface but keep their oracles
    assert not (set(entrymod.retired_queries()) & set(active))


@pytest.mark.parametrize(
    "name", list(entrymod.queries()) + list(entrymod.retired_queries()))
def test_query_matches_oracle(spark, con, name):
    q = {**entrymod.queries(), **entrymod.retired_queries()}[name]
    osql = {**entrymod.oracle_sql(), **entrymod.retired_oracle_sql()}.get(name)
    df = q(spark, SF_DIR)
    got_cols = [c.lower() for c in df.columns]
    got = _rows(got_cols, [tuple(r) for r in df.collect()])
    if osql is None:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    res = con.sql(osql)
    exp_cols = [c.lower() for c in res.columns]
    exp = _rows(exp_cols, res.fetchall())
    assert sorted(got_cols) == sorted(exp_cols), (got_cols, exp_cols)
    assert len(got) == len(exp), f"{name}: {len(got)} vs {len(exp)} rows"
    mism = [i for i, (g, e) in enumerate(zip(got, exp)) if g != e]
    assert not mism, f"{name}: first mismatch {got[mism[0]]} vs {exp[mism[0]]}"


def test_session_windows_equal_sessions(spark):
    """The retired native-F.session_window variant must stay row-identical
    to the gaps-and-islands composition (both may sit on either side of
    the driver-slate rotation, so look each up in the merged dict)."""
    allq = {**entrymod.queries(), **entrymod.retired_queries()}
    a = allq["events_sessions"](spark, SF_DIR).drop("session_no")
    b = allq["events_session_windows"](spark, SF_DIR)
    assert sorted(a.columns) == sorted(b.columns)
    ra = _rows([c.lower() for c in a.columns], [tuple(r) for r in a.collect()])
    rb = _rows([c.lower() for c in b.columns], [tuple(r) for r in b.collect()])
    assert ra == rb


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"route", "n_rows"}
