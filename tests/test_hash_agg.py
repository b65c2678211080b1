"""Two-stage hash aggregate (stages/hash_agg.py) vs a pandas oracle:
random multi-block inputs with NULL keys/values, every agg kind, and the
distinct-count path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data


def _mk(rng, n, null_keys=True):
    keys = rng.choice(["a", "b", "c", None] if null_keys else ["a", "b", "c"],
                      n).tolist()
    k2 = rng.randint(0, 3, n)
    vals = rng.randint(0, 100, n).astype(float)
    vals[rng.rand(n) < 0.15] = np.nan
    t = pa.table({
        "k": pa.array(keys, pa.string()),
        "k2": pa.array(k2, pa.int64()),
        "v": pa.array([None if np.isnan(x) else float(x) for x in vals],
                      pa.float64()),
        "w": pa.array(rng.randint(0, 10, n), pa.int64()),
    })
    return ray.data.from_arrow(t).repartition(7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_hash_group_aggregate_matches_pandas(ray_session, seed):
    from paradedb_ray.stages.hash_agg import hash_group_aggregate

    rng = np.random.RandomState(seed)
    ds = _mk(rng, 500)
    out = hash_group_aggregate(ds, ["k", "k2"], {
        "n": ("count_star", None),
        "nv": ("count", "v"),
        "s": ("sum", "v"),
        "m": ("avg", "v"),
        "lo": ("min", "v"),
        "hi": ("max", "w"),
    }).to_pandas()

    df = ds.to_pandas()
    exp = df.groupby(["k", "k2"], dropna=False).agg(
        n=("k2", "size"), nv=("v", "count"), s=("v", "sum"),
        m=("v", "mean"), lo=("v", "min"), hi=("w", "max")).reset_index()

    key = lambda d: d.sort_values(["k", "k2"], na_position="last").reset_index(drop=True)
    got, exp = key(out), key(exp)
    assert len(got) == len(exp)
    assert got["k"].fillna("~").tolist() == exp["k"].fillna("~").tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    assert got["nv"].tolist() == exp["nv"].tolist()
    # all-null groups: pandas sum() gives 0.0, ours NULL (SQL) — compare
    # only groups with values for sum/mean
    has = exp["nv"] > 0
    assert np.allclose(got.loc[has, "s"], exp.loc[has, "s"])
    assert np.allclose(got.loc[has, "m"], exp.loc[has, "m"])
    assert np.allclose(got.loc[has, "lo"], exp.loc[has, "lo"])
    assert got["hi"].tolist() == exp["hi"].tolist()
    assert got.loc[~has, "s"].isna().all()
    assert got.loc[~has, "m"].isna().all()


@pytest.mark.parametrize("grouped", [True, False])
def test_hash_distinct_count_matches_pandas(ray_session, grouped):
    from paradedb_ray.stages.hash_agg import hash_distinct_count

    rng = np.random.RandomState(5)
    ds = _mk(rng, 400)
    keys = ["k"] if grouped else []
    out = hash_distinct_count(ds, keys, "w", "card").to_pandas()
    df = ds.to_pandas()
    if grouped:
        exp = df.groupby("k", dropna=False)["w"].nunique().reset_index(
            name="card")
        got = out.sort_values("k", na_position="last").reset_index(drop=True)
        exp = exp.sort_values("k", na_position="last").reset_index(drop=True)
        assert got["card"].tolist() == exp["card"].tolist()
    else:
        assert out["card"].tolist() == [df["w"].nunique()]


def test_hash_distinct_count_excludes_null_values(ray_session):
    from paradedb_ray.stages.hash_agg import hash_distinct_count

    t = pa.table({"k": ["a", "a", "b", "b"],
                  "v": pa.array([1, None, None, None], pa.int64())})
    ds = ray.data.from_arrow(t).repartition(2)
    out = hash_distinct_count(ds, ["k"], "v", "card").to_pandas()
    got = dict(zip(out["k"], out["card"]))
    # SQL COUNT(DISTINCT v): NULLs never count; all-null groups report 0
    assert got == {"a": 1, "b": 0}
    out = hash_distinct_count(ds, [], "v", "card").to_pandas()
    assert out["card"].tolist() == [1]
