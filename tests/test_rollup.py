"""GROUP BY ROLLUP / CUBE / GROUPING SETS — multi-level grouped
aggregates with SQL NULL fill (`pipelines/aggregate.py`)."""

import numpy as np
import pyarrow as pa

import ray
import ray.data

from paradedb_ray.pipelines.aggregate import cube_aggregate, rollup_aggregate


def _t():
    return pa.table({
        "a": ["x", "x", "y", "y", "y"],
        "b": ["p", "q", "p", "p", None],
        "v": pa.array([1.0, 2.0, 4.0, 8.0, 16.0]),
    })


def test_rollup_levels_and_null_fill(ray_session):
    out = rollup_aggregate(
        ray.data.from_arrow(_t()).repartition(2), ["a", "b"],
        {"n": ("count_star", None), "s": ("sum", "v")}).to_pandas()
    # levels: (a,b) -> 5 groups incl. the NULL-b source group; (a) -> 2;
    # () -> 1 grand total
    assert len(out) == 4 + 2 + 1
    grand = out[out["a"].isna() & out["b"].isna()]
    assert grand["s"].tolist() == [31.0] and grand["n"].tolist() == [5]
    ya = out[(out["a"] == "y") & out["b"].isna() & (out["n"] == 3)]
    # the (a='y') subtotal spans ALL y rows including the NULL-b one
    assert ya["s"].tolist() == [28.0]
    # source group with a real NULL b survives at the detail level
    detail_null = out[(out["a"] == "y") & out["b"].isna() & (out["n"] == 1)]
    assert detail_null["s"].tolist() == [16.0]


def test_cube_includes_b_only_level(ray_session):
    out = cube_aggregate(
        ray.data.from_arrow(_t()), ["a", "b"],
        {"n": ("count_star", None)}).to_pandas()
    b_only = out[out["a"].isna() & (out["b"] == "p")]
    # CUBE has the (b) level ROLLUP lacks: 3 'p' rows across both a's
    assert b_only["n"].tolist() == [3]
    assert len(out) == 4 + 2 + 3 + 1  # (a,b) + (a) + (b incl NULL) + ()


def test_grouping_sets_custom(ray_session):
    out = rollup_aggregate(
        ray.data.from_arrow(_t()), ["a", "b"],
        {"n": ("count_star", None)},
        grouping_sets=[["b"], []]).to_pandas()
    assert len(out) == 3 + 1
    assert out[out["a"].notna()].empty  # 'a' never grouped -> always NULL
