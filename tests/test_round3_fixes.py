"""Round-3 fixes (VERDICT r2): scale-safe exact dedup, widened LSH
bucketing with all-pairs verification, tree-reduced partial merges,
compacted session sink, vectorized Jaccard verify, agg memory guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data


def _corpus(texts, keys=None):
    keys = keys if keys is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(keys, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "extra": pa.array([f"x{k}" for k in keys], pa.string()),
    }))


def test_exact_dedup_metadata_only_shuffle(ray_session):
    """The exact-dedup all-to-all must ship ONLY (fingerprint, key)
    metadata — never the text payload (VERDICT r2 #3)."""
    from paradedb_ray.pipelines.dedup import _exact_sigs

    ds = _corpus(["a b c", "d e f", "a b c"])
    sigs = _exact_sigs(ds, "text", "doc_id")
    names = set(sigs.schema().names)
    assert names == {"__h1", "__h2", "doc_id"}


def test_exact_dedup_keeps_min_key(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = ["dup one", "uniq a", "dup one", "uniq b", "dup one", "dup two",
             "dup two"]
    ds = _corpus(texts).repartition(3)
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 3, 5]
    # all original columns survive
    assert set(out.columns) == {"doc_id", "text", "extra"}


def test_exact_dedup_keep_max(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = ["dup one", "uniq a", "dup one"]
    out = exact_dedup(_corpus(texts), "text", "doc_id",
                      keep="max").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_exact_dedup_no_duplicates_is_identity(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = [f"unique text {i}" for i in range(10)]
    out = exact_dedup(_corpus(texts), "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == list(range(10))


def test_exact_dedup_block_layout_invariance(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = (["same doc"] * 5) + [f"u{i}" for i in range(7)]
    outs = []
    for nblocks in (1, 4):
        ds = _corpus(texts).repartition(nblocks)
        outs.append(sorted(
            exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"]))
    assert outs[0] == outs[1]
