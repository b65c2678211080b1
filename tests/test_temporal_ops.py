"""Temporal / CEP operators (round-5 session-5): as-of join, interval
(range) join, rolling row-frame window aggregates, and adjacent-sequence
pattern matching.  The reference owns none of these shapes (its JoinScan
is equi-only, `postgres/customscan/joinscan/mod.rs:20-64`; window/CEP SQL
runs in Postgres above its scans) — they are the streaming-engine surface
the north rule adds, each here pinned against a hand-computed fixture and
a block-layout invariance check.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from paradedb_ray.pipelines.aggregate import partitioned_window
from paradedb_ray.pipelines.joins import asof_join, range_join
from paradedb_ray.pipelines.windows import match_sequence


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


@pytest.fixture
def trades_quotes():
    trades = pa.table({
        "sym": ["A", "A", "A", "B", "B", "C"],
        "t_ts": pa.array([10, 20, 30, 15, 5, 7], pa.int64()),
        "t_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
    })
    quotes = pa.table({
        "sym": ["A", "A", "A", "B", "B", "D"],
        "q_ts": pa.array([5, 20, 25, 10, 20, 1], pa.int64()),
        "q_id": pa.array([100, 101, 102, 103, 104, 105], pa.int64()),
        "px": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    return trades, quotes


def test_asof_join_backward_with_ties_and_misses(trades_quotes):
    trades, quotes = trades_quotes
    lds = ray.data.from_arrow(trades).repartition(3)
    rds = ray.data.from_arrow(quotes).repartition(2)
    out = asof_join(lds, rds, on="sym", left_ts="t_ts", right_ts="q_ts",
                    right_cols=["q_id", "px"], tie_col="q_id",
                    how="left").to_pandas()
    out = _sorted(out, ["t_id"])
    # trade 1 (A,10) -> quote 100 (ts 5); trade 2 (A,20) -> quote 101
    # (equal ts matches, <=); trade 3 (A,30) -> quote 102; trade 4 (B,15)
    # -> 103; trade 5 (B,5) -> NO match (earliest quote is ts 10);
    # trade 6 (C) -> NO match (no C quotes at all)
    assert out["q_id"].tolist()[:4] == [100, 101, 102, 103]
    assert out["q_id"].isna().tolist() == [False] * 4 + [True, True]
    assert out["px"].tolist()[:4] == [1.0, 2.0, 3.0, 4.0]

    inner = asof_join(lds, rds, on="sym", left_ts="t_ts", right_ts="q_ts",
                      right_cols=["q_id"], tie_col="q_id",
                      how="inner").to_pandas()
    assert len(inner) == 4 and inner["q_id"].notna().all()


def test_asof_join_tie_breaks_by_greatest_tie_col():
    left = pa.table({"k": ["x"], "ts": pa.array([10], pa.int64()),
                     "lid": pa.array([1], pa.int64())})
    # two right rows share ts=10: the greater rid must win
    right = pa.table({"k": ["x", "x"], "rts": pa.array([10, 10], pa.int64()),
                      "rid": pa.array([7, 9], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="k", left_ts="ts", right_ts="rts",
                    right_cols=["rid"], tie_col="rid").to_pandas()
    assert out["rid"].tolist() == [9]


def test_asof_join_block_layout_invariance(trades_quotes):
    trades, quotes = trades_quotes
    ref = None
    for nl, nr in [(1, 1), (4, 3)]:
        out = asof_join(ray.data.from_arrow(trades).repartition(nl),
                        ray.data.from_arrow(quotes).repartition(nr),
                        on="sym", left_ts="t_ts", right_ts="q_ts",
                        right_cols=["q_id", "px"], tie_col="q_id",
                        how="left").to_pandas()
        out = _sorted(out, ["t_id"])
        if ref is None:
            ref = out
        else:
            assert out.equals(ref)


def test_range_join_overlapping_bands_and_closed_both():
    rows = pa.table({"rid": pa.array([1, 2, 3], pa.int64()),
                     "v": pa.array([5.0, 10.0, 99.0])})
    bands = pa.table({"lo": [0.0, 4.0], "hi": [10.0, 11.0],
                      "band": ["wide", "narrow"]})
    ds = ray.data.from_arrow(rows).repartition(2)
    out = _sorted(range_join(ds, bands, "v", "lo", "hi").to_pandas(),
                  ["rid", "band"])
    # v=5 hits BOTH overlapping bands; v=10 only [4,11); v=99 none
    assert list(zip(out["rid"], out["band"])) == [
        (1, "narrow"), (1, "wide"), (2, "narrow")]
    both = range_join(ds, bands, "v", "lo", "hi", closed="both").to_pandas()
    # closed='both' admits v=10 into [0,10] too
    assert len(both) == 4


def test_rolling_frames_skip_nulls_and_clip_at_partition_start():
    t = pa.table({
        "k": ["a"] * 4 + ["b"] * 2,
        "o": pa.array([1, 2, 3, 4, 1, 2], pa.int64()),
        "v": pa.array([1.0, None, 3.0, 5.0, 10.0, 20.0]),
    })
    out = partitioned_window(
        ray.data.from_arrow(t).repartition(3), ["k"], [("o", "ascending")],
        {"s": ("rolling_sum", "v", 2), "a": ("rolling_avg", "v", 2),
         "mn": ("rolling_min", "v", 2), "mx": ("rolling_max", "v", 2)}
    ).to_pandas()
    out = _sorted(out, ["k", "o"])
    # frames: a1=[1], a2=[1,N], a3=[1,N,3], a4=[N,3,5]; b1=[10], b2=[10,20]
    assert out["s"].tolist() == [1.0, 1.0, 4.0, 8.0, 10.0, 30.0]
    assert out["a"].tolist() == [1.0, 1.0, 2.0, 4.0, 10.0, 15.0]
    assert out["mn"].tolist() == [1.0, 1.0, 1.0, 3.0, 10.0, 10.0]
    assert out["mx"].tolist() == [1.0, 1.0, 3.0, 5.0, 10.0, 20.0]


def test_rolling_all_null_frame_is_null_and_frame_wider_than_partition():
    t = pa.table({"k": ["a", "a"], "o": pa.array([1, 2], pa.int64()),
                  "v": pa.array([None, None], pa.float64())})
    out = partitioned_window(
        ray.data.from_arrow(t), ["k"], [("o", "ascending")],
        {"s": ("rolling_sum", "v", 9), "mn": ("rolling_min", "v", 9)}
    ).to_pandas()
    assert out["s"].isna().all() and out["mn"].isna().all()


def test_match_sequence_three_steps_respects_key_and_within():
    t = pa.table({
        "k": ["u1"] * 4 + ["u2"] * 3,
        "ts": pa.array([1_000_000 * x for x in [1, 2, 3, 50, 4, 5, 6]],
                       pa.timestamp("us")),
        "eid": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "ev": ["a", "b", "c", "a", "a", "b", "b"],
    })
    ds = ray.data.from_arrow(t).repartition(3)
    out = match_sequence(
        ds, "k", [("ts", "ascending"), ("eid", "ascending")],
        steps=[("ev", "a"), ("ev", "b"), ("ev", "c")],
        emit=[(0, "eid", "e1"), (2, "eid", "e3")]).to_pandas()
    # only u1 has a->b->c adjacent (eids 1,2,3); u2's a->b->b fails step 3
    assert list(zip(out["e1"], out["e3"])) == [(1, 3)]

    # a within bound tighter than the 2s spacing kills the match
    none = match_sequence(
        ds, "k", [("ts", "ascending"), ("eid", "ascending")],
        steps=[("ev", "a"), ("ev", "b"), ("ev", "c")],
        emit=[(0, "eid", "e1")], within="1s", ts_col="ts").to_pandas()
    assert len(none) == 0


def test_match_sequence_never_crosses_key_boundary():
    # adjacent rows a(end of k1) then b(start of k2) must NOT match
    t = pa.table({"k": ["k1", "k2"], "ts": pa.array([1, 2], pa.int64()),
                  "eid": pa.array([1, 2], pa.int64()), "ev": ["a", "b"]})
    out = match_sequence(
        ray.data.from_arrow(t), "k",
        [("ts", "ascending"), ("eid", "ascending")],
        steps=[("ev", "a"), ("ev", "b")],
        emit=[(0, "eid", "e1")]).to_pandas()
    assert len(out) == 0


def test_match_sequence_callable_step_and_empty_partitions():
    t = pa.table({"k": ["u"] * 3, "ts": pa.array([1, 2, 3], pa.int64()),
                  "eid": pa.array([1, 2, 3], pa.int64()),
                  "v": pa.array([5.0, 50.0, 5.0])})

    def big(tab):
        return tab.column("v").to_numpy(zero_copy_only=False) > 10.0

    out = match_sequence(
        ray.data.from_arrow(t).repartition(2), "k",
        [("ts", "ascending"), ("eid", "ascending")],
        steps=[big, lambda tab: np.asarray(
            tab.column("v").to_numpy(zero_copy_only=False) < 10.0)],
        emit=[(0, "eid", "big_id"), (1, "eid", "small_id")]).to_pandas()
    assert list(zip(out["big_id"], out["small_id"])) == [(2, 3)]


def test_time_rolling_peer_group_and_boundaries():
    from paradedb_ray.pipelines.aggregate import time_rolling_window

    t = pa.table({
        "k": ["a"] * 5 + ["b"] * 2,
        # duplicate ts 30 within 'a': both peers must see the SAME frame
        # (through the LAST peer), including each other's values
        "ts": pa.array([10, 20, 30, 30, 100, 10, 1000], pa.timestamp("s")),
        "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 64.0]),
    })
    out = partitioned_window  # silence linters; real call below
    from paradedb_ray.pipelines.aggregate import time_rolling_window as trw
    res = trw(ray.data.from_arrow(t).repartition(3), ["k"], "ts",
              {"s": ("sum", "v"), "c": ("count", "v"),
               "mn": ("min", "v"), "mx": ("max", "v")},
              window="15s").to_pandas()
    res = _sorted(res, ["k", "ts", "v"])
    # a: ts10 frame=[10] s=1; ts20 frame=[10,20] s=3; ts30 peers frame=
    # [20,30,30] s=14 for BOTH; ts100 frame=[100] s=16
    assert res["s"].tolist() == [1.0, 3.0, 14.0, 14.0, 16.0, 32.0, 64.0]
    assert res["c"].tolist() == [1, 2, 3, 3, 1, 1, 1]
    assert res["mn"].tolist() == [1.0, 1.0, 2.0, 2.0, 16.0, 32.0, 64.0]
    assert res["mx"].tolist() == [1.0, 2.0, 8.0, 8.0, 16.0, 32.0, 64.0]
    # 'b' rows 990s apart: frames never merge, and never leak from 'a'


def test_time_rolling_nulls_and_layout_invariance():
    from paradedb_ray.pipelines.aggregate import time_rolling_window as trw

    t = pa.table({
        "k": ["a"] * 3,
        "ts": pa.array([1, 2, 3], pa.timestamp("s")),
        "v": pa.array([None, 5.0, None]),
    })
    ref = None
    for n in (1, 3):
        res = trw(ray.data.from_arrow(t).repartition(n), ["k"], "ts",
                  {"s": ("sum", "v"), "c": ("count", "v"),
                   "mn": ("min", "v")}, window="10s").to_pandas()
        res = _sorted(res, ["ts"])
        # NULLs skipped: counts 0,1,1; all-null first frame -> NULL sum/min
        assert res["c"].tolist() == [0, 1, 1]
        assert res["s"].isna().tolist() == [True, False, False]
        assert res["mn"].isna().tolist() == [True, False, False]
        if ref is None:
            ref = res
        else:
            assert res.equals(ref)


def test_first_value_and_offset_lag_lead():
    t = pa.table({
        "k": ["a"] * 3 + ["b"],
        "o": pa.array([1, 2, 3, 1], pa.int64()),
        "v": pa.array([10.0, 20.0, 30.0, 7.0]),
    })
    out = partitioned_window(
        ray.data.from_arrow(t).repartition(2), ["k"], [("o", "ascending")],
        {"fv": ("first_value", "v"), "lag2": ("lag", "v", 2),
         "lead2": ("lead", "v", 2)}).to_pandas()
    out = _sorted(out, ["k", "o"])
    assert out["fv"].tolist() == [10.0, 10.0, 10.0, 7.0]
    assert out["lag2"].fillna(-1).tolist() == [-1, -1, 10.0, -1]
    assert out["lead2"].fillna(-1).tolist() == [30.0, -1, -1, -1]


def test_interval_join_bucket_spans_and_no_duplicates():
    from paradedb_ray.pipelines.joins import interval_join

    left = pa.table({
        "k": ["a", "a", "a", "b"],
        "ts": pa.array([5, 25, 99, 10], pa.timestamp("s")),
        "lid": pa.array([1, 2, 3, 4], pa.int64()),
    })
    # window [0, 30] spans 4 one-10s-buckets; a pair must still emit ONCE
    right = pa.table({
        "k": ["a", "b"],
        "s": pa.array([0, 50], pa.timestamp("s")),
        "e": pa.array([30, 60], pa.timestamp("s")),
        "rid": pa.array([7, 8], pa.int64()),
    })
    out = interval_join(ray.data.from_arrow(left).repartition(2),
                        ray.data.from_arrow(right).repartition(2),
                        on="k", left_ts="ts", right_start="s",
                        right_end="e", bucket="10s").to_pandas()
    out = _sorted(out, ["lid"])
    # lid1 (ts5) and lid2 (ts25) inside a's [0,30]; lid3 outside;
    # lid4 (b,10) outside b's [50,60]
    assert list(zip(out["lid"], out["rid"])) == [(1, 7), (2, 7)]

    # boundary inclusivity: ts == start and ts == end both match
    edge_l = pa.table({"k": ["x", "x"], "ts": pa.array([50, 60],
                       pa.timestamp("s")),
                       "lid": pa.array([9, 10], pa.int64())})
    edge = interval_join(ray.data.from_arrow(edge_l),
                         ray.data.from_arrow(right.filter(
                             pa.array([False, True]))).map_batches(
                                 lambda b: b.set_column(
                                     0, "k", pa.array(["x"])),
                                 batch_format="pyarrow"),
                         on="k", left_ts="ts", right_start="s",
                         right_end="e", bucket="1h").to_pandas()
    assert sorted(edge["lid"].tolist()) == [9, 10]


def test_interval_join_overlapping_windows_emit_all_pairs():
    from paradedb_ray.pipelines.joins import interval_join

    left = pa.table({"k": ["a"], "ts": pa.array([15], pa.timestamp("s")),
                     "lid": pa.array([1], pa.int64())})
    right = pa.table({
        "k": ["a", "a"],
        "s": pa.array([0, 10], pa.timestamp("s")),
        "e": pa.array([20, 30], pa.timestamp("s")),
        "rid": pa.array([1, 2], pa.int64()),
    })
    out = interval_join(ray.data.from_arrow(left),
                        ray.data.from_arrow(right),
                        on="k", left_ts="ts", right_start="s",
                        right_end="e", bucket="7s").to_pandas()
    assert sorted(out["rid"].tolist()) == [1, 2]


def test_rank_distribution_kinds_with_ties():
    t = pa.table({
        "k": ["a"] * 4 + ["b"],
        "o": pa.array([1, 1, 2, 3, 9], pa.int64()),
        "rid": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = partitioned_window(
        ray.data.from_arrow(t).repartition(2), ["k"], [("o", "ascending")],
        {"pr": ("percent_rank", None), "cd": ("cume_dist", None),
         "nt": ("ntile", None, 3)}).to_pandas()
    out = _sorted(out, ["rid"])
    # a: ranks 1,1,3,4 over 4 rows -> pr = (r-1)/3; cd = last_peer/4
    assert out["pr"].tolist() == [0.0, 0.0, 2 / 3, 1.0, 0.0]
    assert out["cd"].tolist() == [0.5, 0.5, 0.75, 1.0, 1.0]
    # ntile(3) over 4 rows: tiles sized 2,1,1 in order
    assert out["nt"].tolist() == [1, 1, 2, 3, 1]


def test_asof_join_forward_and_tolerance(trades_quotes):
    trades, quotes = trades_quotes
    lds = ray.data.from_arrow(trades).repartition(2)
    rds = ray.data.from_arrow(quotes).repartition(2)
    fwd = asof_join(lds, rds, on="sym", left_ts="t_ts", right_ts="q_ts",
                    right_cols=["q_id"], tie_col="q_id",
                    direction="forward").to_pandas()
    fwd = _sorted(fwd, ["t_id"])
    # forward: smallest q_ts >= t_ts.  trade1 (A,10) -> q101 (ts20);
    # trade2 (A,20) -> q101 (equal ts); trade3 (A,30) -> none (latest A
    # quote is 25); trade4 (B,15) -> q104 (ts20); trade5 (B,5) -> q103
    # (ts10); trade6 (C,7) -> none
    assert fwd["q_id"].fillna(-1).tolist() == [101, 101, -1, 104, 103, -1]

    # tolerance: backward match farther than 5 ticks is discarded
    tol = asof_join(lds, rds, on="sym", left_ts="t_ts", right_ts="q_ts",
                    right_cols=["q_id"], tie_col="q_id",
                    tolerance="5s").to_pandas()
    tol = _sorted(tol, ["t_id"])
    # trade1 (A,10): q100 at ts5, gap 5e6 us vs 5s tolerance -> kept only
    # if ts unit matches; t_ts here is raw int64 (already "us"), so gap
    # 5 <= 5s -> kept.  trade3 (A,30): q102 at 25, gap 5 -> kept.
    assert tol["q_id"].fillna(-1).tolist()[:4] == [100, 101, 102, 103]

    # a tiny tolerance (raw int = 1 microsecond) discards every
    # non-equal-ts match
    tol0 = asof_join(lds, rds, on="sym", left_ts="t_ts", right_ts="q_ts",
                     right_cols=["q_id"], tie_col="q_id",
                     tolerance=1).to_pandas()
    tol0 = _sorted(tol0, ["t_id"])
    # only trade2 (A,20) has an exactly-equal-ts quote (q101, gap 0)
    assert tol0["q_id"].fillna(-1).tolist() == [-1, 101, -1, -1, -1, -1]


def test_sessionize_ordinals_and_composite_key_cep():
    from paradedb_ray.pipelines.windows import match_sequence, sessionize

    t = pa.table({
        "k": ["u"] * 5,
        "ts": pa.array([0, 10, 100, 105, 300], pa.timestamp("s")),
        "eid": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "ev": ["a", "b", "a", "b", "a"],
    })
    s = sessionize(ray.data.from_arrow(t).repartition(2), "k", "ts",
                   gap="30s").to_pandas()
    s = _sorted(s, ["eid"])
    # gaps: 10 (same), 90 (break), 5 (same), 195 (break)
    assert s["session_id"].tolist() == [0, 0, 1, 1, 2]

    # a->b adjacent pairs exist in sessions 0 and 1; session boundaries
    # hold even though a global scan would also pair eids (2,3) etc.
    sd = sessionize(ray.data.from_arrow(t), "k", "ts", gap="30s")
    m = match_sequence(
        sd, ["k", "session_id"],
        [("ts", "ascending"), ("eid", "ascending")],
        steps=[("ev", "a"), ("ev", "b")],
        emit=[(0, "eid", "a_id"), (1, "eid", "b_id")]).to_pandas()
    assert sorted(zip(m["a_id"], m["b_id"])) == [(1, 2), (3, 4)]


def test_fill_forward_respects_partition_start():
    t = pa.table({
        "k": ["a"] * 4 + ["b"] * 2,
        "o": pa.array([1, 2, 3, 4, 1, 2], pa.int64()),
        "v": pa.array([None, 7.0, None, None, None, 3.0]),
    })
    out = partitioned_window(
        ray.data.from_arrow(t).repartition(3), ["k"], [("o", "ascending")],
        {"f": ("fill_forward", "v")}).to_pandas()
    out = _sorted(out, ["k", "o"])
    # a: NULL (nothing to carry), 7, 7, 7; b: NULL (a's 7 must NOT leak), 3
    assert out["f"].fillna(-1).tolist() == [-1, 7.0, 7.0, 7.0, -1, 3.0]


def test_changed_kind_any_type_and_partition_start():
    t = pa.table({
        "k": ["a"] * 4 + ["b"],
        "o": pa.array([1, 2, 3, 4, 1], pa.int64()),
        "s": ["x", "x", "y", "y", "y"],
    })
    out = partitioned_window(
        ray.data.from_arrow(t).repartition(2), ["k"], [("o", "ascending")],
        {"ch": ("changed", "s")}).to_pandas()
    out = _sorted(out, ["k", "o"])
    # a: first row True, x->x False, x->y True, y->y False;
    # b's first row True even though the PREVIOUS global row was also 'y'
    assert out["ch"].tolist() == [True, False, True, False, True]


def test_interval_join_left_outer_keeps_uncovered_rows():
    from paradedb_ray.pipelines.joins import interval_join

    left = pa.table({
        "k": ["a", "a", "b"],
        "ts": pa.array([5, 99, 10], pa.timestamp("s")),
        "lid": pa.array([1, 2, 3], pa.int64()),
    })
    right = pa.table({
        "k": ["a"], "s": pa.array([0], pa.timestamp("s")),
        "e": pa.array([30], pa.timestamp("s")),
        "rid": pa.array([7], pa.int64()),
    })
    out = interval_join(ray.data.from_arrow(left).repartition(2),
                        ray.data.from_arrow(right),
                        on="k", left_ts="ts", right_start="s",
                        right_end="e", bucket="10s",
                        how="left").to_pandas()
    out = _sorted(out, ["lid"])
    # lid1 covered by a's window; lid2 (a, ts 99) uncovered; lid3 (b) has
    # no windows at all - both survive with NULL right cols
    assert out["lid"].tolist() == [1, 2, 3]
    assert out["rid"].fillna(-1).tolist() == [7, -1, -1]


def test_review_fixes_lag0_null_ts_and_validation():
    from paradedb_ray.pipelines.aggregate import time_rolling_window
    from paradedb_ray.pipelines.joins import interval_join

    t = pa.table({"k": ["a", "a"], "o": pa.array([1, 2], pa.int64()),
                  "v": pa.array([3.0, 4.0])})
    # SQL LAG(v, 0) is the value itself
    out = partitioned_window(
        ray.data.from_arrow(t), ["k"], [("o", "ascending")],
        {"l0": ("lag", "v", 0)}).to_pandas()
    assert _sorted(out, ["o"])["l0"].tolist() == [3.0, 4.0]

    # invalid how/closed/direction fail loudly instead of silently
    # falling through to a default branch
    with pytest.raises(ValueError):
        asof_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                  on="k", left_ts="o", right_ts="o", right_cols=[],
                  how="full")
    with pytest.raises(ValueError):
        range_join(ray.data.from_arrow(t),
                   pa.table({"lo": [0.0], "hi": [1.0]}), "v", "lo", "hi",
                   closed="right")
    with pytest.raises(ValueError):
        interval_join(ray.data.from_arrow(t), ray.data.from_arrow(t),
                      on="k", left_ts="o", right_start="o",
                      right_end="o", how="outer")

    # NULL timestamps in a RANGE frame would silently corrupt the sorted
    # precondition: fail loudly
    tn = pa.table({"k": ["a", "a"],
                   "ts": pa.array([1, None], pa.timestamp("s")),
                   "v": pa.array([1.0, 2.0])})
    with pytest.raises(Exception):
        time_rolling_window(ray.data.from_arrow(tn), ["k"], "ts",
                            {"c": ("count", "v")}, window="5s").to_pandas()


def test_streaming_dedup_restore_shard_mismatch(ray_session, tmp_path):
    from paradedb_ray.streaming.dedup_stream import StreamingDeduper

    ck = str(tmp_path / "ck")
    d = StreamingDeduper(num_shards=4, checkpoint_dir=ck)
    try:
        d.ingest(pa.table({"text": ["a", "b"]}), epoch=0)
        d.checkpoint(0)
    finally:
        d.shutdown()
    d2 = StreamingDeduper(num_shards=2, checkpoint_dir=ck)
    try:
        with pytest.raises(ValueError):
            d2.restore()
    finally:
        d2.shutdown()
