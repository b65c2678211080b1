"""Seeded randomized DuckDB-parity fuzz for the temporal operator family
(asof both directions + tolerance, interval join, time-range rolling,
row-frame rolling).  Each iteration draws a small random corpus with
adversarial properties (duplicate timestamps, NULL values, singleton and
missing keys, empty sides) and compares the FULL output hash against
DuckDB over the same frames — the same order-insensitive compare the
driver uses.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data

from paradedb_ray.pipelines.aggregate import (partitioned_window,
                                              time_rolling_window)
from paradedb_ray.pipelines.joins import asof_join, interval_join


def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(list(df.columns),
                          kind="mergesort").reset_index(drop=True)


def to_pdf(obj):
    """Dataset -> pandas via arrow refs: Ray's Dataset.to_pandas() drops
    the schema of an ALL-EMPTY dataset (the blocks themselves are typed;
    verified), so convert at the Arrow level."""
    if isinstance(obj, ray.data.Dataset):
        tabs = ray.get(obj.to_arrow_refs())
        return pa.concat_tables(tabs,
                                promote_options="default").to_pandas()
    return obj


def assert_same(mine, orc: pd.DataFrame, what: str):
    a, b = canon(to_pdf(mine)), canon(orc)
    assert len(a) == len(b), (what, len(a), len(b))
    pd.testing.assert_frame_equal(a, b, check_dtype=False, obj=what)


def rand_events(rng: np.random.RandomState, n: int, n_keys: int,
                null_ts: bool = False):
    """ts drawn from a SMALL domain so duplicates are common; with
    ``null_ts`` ~10% of timestamps are NULL (joins must treat them as
    never-matching, SQL comparison semantics)."""
    ts = pa.array(rng.randint(0, 50, n).astype(np.int64) * 1_000_000
                  ).cast(pa.timestamp("us"))
    if null_ts:
        keep = rng.rand(n) >= 0.1
        ts = pa.array(
            [t if k else None for t, k in zip(ts.to_pylist(), keep)],
            pa.timestamp("us"))
    return pa.table({
        "k": pa.array(rng.randint(0, n_keys, n).astype(np.int64)),
        "ts": ts,
        "rid": pa.array(np.arange(n, dtype=np.int64)),
        "v": pa.array(np.where(rng.rand(n) < 0.15, np.nan,
                               rng.randint(0, 100, n).astype(float)),
                      from_pandas=True),
    })


@pytest.mark.parametrize("seed", range(6))
def test_asof_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.RandomState(seed)
    nl, nr = rng.randint(1, 120), rng.randint(0, 120)
    left = rand_events(rng, nl, 5, null_ts=True)
    right = rand_events(rng, max(nr, 1), 5, null_ts=True).rename_columns(
        ["k", "rts", "qid", "rv"])
    if nr == 0:
        right = right.slice(0, 0)
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    lds = ray.data.from_arrow(left).repartition(3)
    rds = (ray.data.from_arrow(right).repartition(2)
           if right.num_rows else ray.data.from_arrow(right))

    out = asof_join(lds, rds, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["qid", "rv"], tie_col="qid",
                    how="left")
    orc = con.execute("""
      SELECT l.*, r.qid, r.rv FROM l LEFT JOIN r
        ON r.k = l.k AND r.rts <= l.ts
      QUALIFY row_number() OVER (PARTITION BY l.rid
        ORDER BY r.rts DESC, r.qid DESC) = 1""").df()
    assert_same(out, orc, f"asof backward seed={seed}")

    fwd = asof_join(lds, rds, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["qid"], tie_col="qid",
                    direction="forward", how="inner")
    orc2 = con.execute("""
      SELECT l.*, r.qid FROM l JOIN r ON r.k = l.k AND r.rts >= l.ts
      QUALIFY row_number() OVER (PARTITION BY l.rid
        ORDER BY r.rts ASC, r.qid DESC) = 1""").df()
    assert_same(fwd, orc2, f"asof forward seed={seed}")

    tol = asof_join(lds, rds, on="k", left_ts="ts", right_ts="rts",
                    right_cols=["qid"], tie_col="qid",
                    tolerance="7s", how="inner")
    orc3 = con.execute("""
      SELECT l.*, r.qid FROM l JOIN r ON r.k = l.k AND r.rts <= l.ts
        AND l.ts - r.rts <= INTERVAL 7 SECOND
      QUALIFY row_number() OVER (PARTITION BY l.rid
        ORDER BY r.rts DESC, r.qid DESC) = 1""").df()
    assert_same(tol, orc3, f"asof tolerance seed={seed}")


@pytest.mark.parametrize("seed", range(4))
def test_interval_join_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.RandomState(100 + seed)
    left = rand_events(rng, rng.randint(1, 150), 4, null_ts=True)
    nr = rng.randint(1, 60)
    s = rng.randint(0, 50, nr).astype(np.int64) * 1_000_000
    # include zero-length and inverted (empty) windows
    dur = rng.randint(-5, 20, nr).astype(np.int64) * 1_000_000
    right = pa.table({
        "k": pa.array(rng.randint(0, 4, nr).astype(np.int64)),
        "ws": pa.array(s).cast(pa.timestamp("us")),
        "we": pa.array(s + dur).cast(pa.timestamp("us")),
        "wid": pa.array(np.arange(nr, dtype=np.int64)),
    })
    con = duckdb.connect()
    con.register("l", left.to_pandas())
    con.register("r", right.to_pandas())
    out = interval_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        on="k", left_ts="ts", right_start="ws", right_end="we",
        bucket="13s")
    orc = con.execute("""
      SELECT l.*, r.ws, r.we, r.wid FROM l JOIN r
        ON l.k = r.k AND l.ts >= r.ws AND l.ts <= r.we""").df()
    assert_same(out, orc, f"interval seed={seed}")

    lo = interval_join(
        ray.data.from_arrow(left).repartition(3),
        ray.data.from_arrow(right).repartition(2),
        on="k", left_ts="ts", right_start="ws", right_end="we",
        bucket="13s", how="left")
    orc_l = con.execute("""
      SELECT l.*, r.ws, r.we, r.wid FROM l LEFT JOIN r
        ON l.k = r.k AND l.ts >= r.ws AND l.ts <= r.we""").df()
    assert_same(lo, orc_l, f"interval-left seed={seed}")


@pytest.mark.parametrize("seed", range(4))
def test_rolling_fuzz_vs_duckdb(ray_session, seed):
    rng = np.random.RandomState(200 + seed)
    t = rand_events(rng, rng.randint(2, 200), 3)
    con = duckdb.connect()
    con.register("t", t.to_pandas())
    ds = ray.data.from_arrow(t).repartition(3)

    # time RANGE frame (count/min/max + integer-valued sum: exact)
    mine = time_rolling_window(
        ds, ["k"], "ts",
        {"c": ("count", "v"), "s": ("sum", "v"),
         "mn": ("min", "v"), "mx": ("max", "v")}, window="9s").to_pandas()
    orc = con.execute("""
      SELECT t.*, count(v) OVER w AS c, sum(v) OVER w AS s,
        min(v) OVER w AS mn, max(v) OVER w AS mx
      FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
        RANGE BETWEEN INTERVAL 9 SECOND PRECEDING AND CURRENT ROW)""").df()
    assert_same(mine, orc, f"time_rolling seed={seed}")

    # ROWS frame over a UNIQUE order (rid) — deterministic under ties
    mine2 = partitioned_window(
        ds, ["k"], [("rid", "ascending")],
        {"rs": ("rolling_sum", "v", 3), "rmn": ("rolling_min", "v", 3),
         "pr": ("percent_rank", None), "cd": ("cume_dist", None),
         "nt": ("ntile", None, 3)}).to_pandas()
    orc2 = con.execute("""
      SELECT t.*, sum(v) OVER w AS rs, min(v) OVER w AS rmn,
        percent_rank() OVER w2 AS pr, cume_dist() OVER w2 AS cd,
        ntile(3) OVER w2 AS nt
      FROM t WINDOW
        w AS (PARTITION BY k ORDER BY rid
              ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
        w2 AS (PARTITION BY k ORDER BY rid)""").df()
    assert_same(mine2, orc2, f"rows_rolling seed={seed}")
