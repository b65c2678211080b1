"""Property tests for the hash-partitioned vectorized reducers
(partitioned windows, batch session windows, grouped percentiles):
random multi-block inputs with ties and NULLs vs brute-force oracles."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _events(rng, n):
    return pa.table({
        "k": pa.array(rng.choice(["a", "b", "c", "d"], n).tolist()),
        "ts": pa.array(rng.randint(0, 50, n) * 60_000_000,
                       pa.timestamp("us")),
        "v": pa.array([None if rng.rand() < 0.15 else float(x)
                       for x in rng.randint(0, 9, n)], pa.float64()),
        "o": pa.array(rng.randint(0, 5, n), pa.int64()),  # tied order col
        "uid": pa.array(range(n), pa.int64()),  # unique tiebreak
    })


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_partitioned_window_vs_pandas(ray_session, seed):
    from paradedb_ray.pipelines.aggregate import partitioned_window

    rng = np.random.RandomState(seed)
    t = _events(rng, 300)
    ds = ray.data.from_arrow(t).repartition(5)
    out = partitioned_window(
        ds, ["k"], [("o", "ascending"), ("uid", "ascending")],
        {"rn": ("row_number", None), "rk": ("rank", None),
         "dr": ("dense_rank", None), "lg": ("lag", "v"),
         "ld": ("lead", "v"), "rs": ("running_sum", "v")},
    ).to_pandas().sort_values("uid").reset_index(drop=True)

    df = t.to_pandas().sort_values(["k", "o", "uid"],
                                   kind="mergesort").reset_index(drop=True)
    g = df.groupby("k", sort=False)
    df["rn"] = g.cumcount() + 1
    # rank over (o, uid) is all-distinct thanks to uid, so rank == rn;
    # recompute rank/dense_rank on the TIED column alone via pandas
    out2 = partitioned_window(
        ds, ["k"], [("o", "ascending")],
        {"rk": ("rank", None), "dr": ("dense_rank", None)},
    ).to_pandas()
    exp_rk = df.groupby("k")["o"].rank(method="min").astype(int)
    exp_dr = df.groupby("k")["o"].rank(method="dense").astype(int)
    m = out2.set_index("uid")
    df2 = df.set_index("uid")
    assert (m.loc[df2.index, "rk"].to_numpy() == exp_rk.to_numpy()).all()
    assert (m.loc[df2.index, "dr"].to_numpy() == exp_dr.to_numpy()).all()

    df["lg"] = g["v"].shift(1)
    df["ld"] = g["v"].shift(-1)
    df["rs"] = g["v"].cumsum()
    m = out.set_index("uid")
    for c in ("rn", "lg", "ld", "rs"):
        got = m.loc[df["uid"], c].to_numpy(dtype=float)
        exp = df[c].to_numpy(dtype=float)
        assert np.allclose(got, exp, equal_nan=True), c


@pytest.mark.parametrize("seed", [3, 11])
def test_session_window_vs_bruteforce(ray_session, seed):
    from paradedb_ray.pipelines.windows import session_window

    rng = np.random.RandomState(seed)
    t = _events(rng, 250)
    ds = ray.data.from_arrow(t).repartition(4)
    out = session_window(ds, "ts", "k", "30m",
                         aggs={"s": ("sum", "v"), "m": ("max", "v"),
                               "c": ("count", "v")}).to_pandas()
    got = {(r["k"], r["session_start"].value): (
        r["session_end"].value, r["n_events"],
        None if pd.isna(r["s"]) else round(r["s"], 9),
        r["c"]) for _, r in out.iterrows()}

    gap = 30 * 60_000_000
    exp = {}
    df = t.to_pandas()
    for k, g in df.groupby("k"):
        ts = np.sort(g["ts"].astype("int64").to_numpy())
        rows = g.sort_values("ts", kind="mergesort")
        tarr = rows["ts"].astype("int64").to_numpy()
        v = rows["v"].to_numpy(dtype=float)
        start = 0
        for i in range(1, len(tarr) + 1):
            if i == len(tarr) or tarr[i] - tarr[i - 1] > gap:
                seg = v[start:i]
                valid = seg[~np.isnan(seg)]
                exp[(k, tarr[start] * 1000)] = (
                    tarr[i - 1] * 1000, i - start,
                    None if len(valid) == 0 else round(valid.sum(), 9),
                    len(valid))
                start = i
    assert got == exp


@pytest.mark.parametrize("seed", [5, 17])
def test_grouped_percentiles_vs_duckdb(ray_session, seed):
    import duckdb

    from paradedb_ray.pipelines.aggregate import percentiles_agg

    rng = np.random.RandomState(seed)
    t = _events(rng, 400)
    ds = ray.data.from_arrow(t).repartition(6)
    out = percentiles_agg(ds, ["k"], "v",
                          percents=[25.0, 50.0, 95.0]).to_pandas()
    df = t.to_pandas()
    exp = duckdb.sql(
        "SELECT k, quantile_cont(v, 0.25) AS p25,"
        " quantile_cont(v, 0.50) AS p50, quantile_cont(v, 0.95) AS p95"
        " FROM df GROUP BY k").df()
    m = out.set_index("k")
    e = exp.set_index("k")
    for c in ("p25", "p50", "p95"):
        got = m.loc[e.index, c].to_numpy(dtype=float)
        want = e[c].to_numpy(dtype=float)
        # bit-exact: the interpolation formula matches quantile_cont
        assert np.array_equal(got, want, equal_nan=True), c
