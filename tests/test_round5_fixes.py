"""Round-5 fixes (VERDICT r4).

#1: the last flat driver-loop partial merges (t-digest / rank-histogram)
tree-reduce — results must be block-layout invariant.
#2: read_sessions has a distributed twin (`read_sessions_dataset`) that
folds per shard inside tasks and must return the same rows.
#3: IVF centroid training samples via a seeded distributed reservoir —
deterministic, independent of block layout AND of corpus row order.
#5: aggregate-over-join breadth mirrors
`pg_regress/sql/aggregate_join_multitable.sql` (ref expected outputs
from the matching .out file).
"""

import numpy as np
import pyarrow as pa
import pytest

import ray
import ray.data

from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import F64, I64, TEXT, IndexSchema


# ---------------------------------------------------------------------------
# #1 percentile merges: block-layout invariance
# ---------------------------------------------------------------------------


def test_percentiles_exact_block_invariance(ray_session):
    from paradedb_ray.pipelines.aggregate import percentiles_agg

    rng = np.random.RandomState(5)
    t = pa.table({"v": pa.array(rng.standard_normal(5000) * 100)})
    outs = []
    for n in (1, 64):
        ds = ray.data.from_arrow(t).repartition(n)
        out = percentiles_agg(ds, [], "v",
                              percents=[25.0, 50.0, 75.0, 95.0]).take_all()
        outs.append(out[0])
    # integer-histogram counts + min/max merge in an associative tree:
    # bit-identical at any block count
    assert outs[0] == outs[1]
    exact = {f"p{p}": np.percentile(t.column("v").to_numpy(), p)
             for p in (25, 50, 75, 95)}
    for k, v in exact.items():
        assert outs[0][k] == pytest.approx(v, rel=1e-12)


def test_percentiles_tdigest_tree_merge_runs(ray_session):
    from paradedb_ray.pipelines.aggregate import percentiles_tdigest_agg

    rng = np.random.RandomState(6)
    t = pa.table({"v": pa.array(rng.standard_normal(20000))})
    ds = ray.data.from_arrow(t).repartition(48)
    row = percentiles_tdigest_agg(ds, [], "v",
                                  percents=[50.0, 95.0]).take_all()[0]
    assert abs(row["p50"]) < 0.05 and 1.5 < row["p95"] < 1.8


# ---------------------------------------------------------------------------
# #2 read_sessions_dataset parity
# ---------------------------------------------------------------------------


def test_read_sessions_dataset_parity(ray_session, tmp_path):
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.streaming import (EpochRunner, StreamConfig,
                                        StreamEngine)
    from paradedb_ray.testing.transcripts import transcript_turns

    turns = transcript_turns(2500, seed=9)
    idx = pa.compute.sort_indices(turns, sort_keys=[("ts", "ascending")])
    ordered = turns.take(idx)
    n = ordered.num_rows
    epochs = [ordered.slice(i * n // 3, n // 3) for i in range(2)]
    epochs.append(ordered.slice(2 * (n // 3)))

    eng = StreamEngine(transcripts_schema(),
                       StreamConfig(num_partitions=2, mutable_rows=500),
                       checkpoint_dir=str(tmp_path / "ck"))
    try:
        r = EpochRunner(eng, str(tmp_path / "sink"),
                        {"q": pdb.term("text", "merge")}, topk=5,
                        columns=["conv_id", "turn_idx", "score"],
                        checkpoint_every=2)
        r.run(epochs)
        want = r.read_sessions().to_pandas()
        got = r.read_sessions_dataset().to_pandas()
    finally:
        eng.shutdown()
    key = ["conv_id", "session_start"]
    want = want.sort_values(key).reset_index(drop=True)
    got = got.sort_values(key).reset_index(drop=True)
    assert want.columns.tolist() == got.columns.tolist()
    assert want.equals(got[want.columns])


# ---------------------------------------------------------------------------
# #3 centroid sample: deterministic, layout- and row-order-independent
# ---------------------------------------------------------------------------


def test_centroid_sample_canonical(ray_session):
    from paradedb_ray.pipelines.knn import _centroid_sample

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((3000, 8)).astype(np.float32)
    perm = rng.permutation(3000)

    def sample(v, nblocks):
        t = pa.table({"embedding": pa.array(v.tolist(),
                                            pa.list_(pa.float32(), 8))})
        ds = ray.data.from_arrow(t).repartition(nblocks)
        return _centroid_sample(ds, "embedding", 500)

    a = sample(vecs, 2)
    b = sample(vecs, 13)          # different block layout
    c = sample(vecs[perm], 5)     # different ROW ORDER (sorted-corpus bug)
    assert a.shape == (500, 8)
    assert np.array_equal(a, b)
    assert np.array_equal(a, c)
    # and it IS a sample of the corpus
    corpus = {v.tobytes() for v in vecs}
    assert all(r.tobytes() in corpus for r in a)


# ---------------------------------------------------------------------------
# topk_by: block invariance, null placement, projection after merge
# ---------------------------------------------------------------------------


def test_topk_by_block_invariance(ray_session):
    from paradedb_ray.pipelines.relational import topk_by

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 50, 400).astype(float)
    vals[rng.choice(400, 30, replace=False)] = np.nan
    t = pa.table({"id": pa.array(range(400), pa.int64()),
                  "v": pa.array(vals)})
    outs = []
    for n in (1, 16):
        ds = ray.data.from_arrow(t).repartition(n)
        out = topk_by(ds, [("v", "descending"), ("id", "ascending")], 20,
                      null_placement="at_start",
                      columns=["id"]).take_all()
        outs.append([r["id"] for r in out])
    assert outs[0] == outs[1]
    # NULLS FIRST: the 30 null rows lead, ordered by id
    null_ids = sorted(int(i) for i in np.flatnonzero(np.isnan(vals)))
    assert outs[0][:20] == null_ids[:20]


# ---------------------------------------------------------------------------
# #5 aggregate_join_multitable.sql regress mirror (ref expected/.out)
# ---------------------------------------------------------------------------


def _mt_fixture():
    products = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "description": ["Laptop fast processor", "Gaming laptop RGB",
                        "Running shoes athlete", "Winter jacket warm",
                        "Toy laptop kids"],
        "category": ["Electronics", "Electronics", "Sports", "Clothing",
                     "Toys"],
        "price": pa.array([999.99, 1299.99, 89.99, 129.99, 49.99]),
        "in_stock": pa.array([True, True, True, False, True]),
    })
    tags = pa.table({
        "product_id": pa.array([1, 1, 2, 2, 3, 3, 4, 5, 5], pa.int64()),
        "tag_name": ["tech", "computer", "tech", "gaming", "fitness",
                     "running", "outdoor", "tech", "kids"],
    })
    reviews = pa.table({
        "product_id": pa.array([1, 1, 2, 3, 4], pa.int64()),
        "rating": pa.array([5, 4, 3, 4, 3], pa.int64()),
    })
    schema = IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        description={"type": TEXT},
        category={"type": TEXT, "fast": True},
        price={"type": F64, "fast": True})
    return products, tags, reviews, schema


def _rows(ds, keys):
    out = ds.to_pandas().sort_values(keys).reset_index(drop=True)
    return list(out.itertuples(index=False, name=None))


def test_aggregate_join_multitable_sections_1_3(ray_session):
    from paradedb_ray.pipelines.aggregate import sql_aggregate
    from paradedb_ray.pipelines.joins import broadcast_join
    from paradedb_ray.pipelines.search import search

    products, tags, reviews, schema = _mt_fixture()

    def joined(query):
        p = search(ray.data.from_arrow(products).repartition(2), schema,
                   query, with_score=False,
                   output_columns=["id", "category", "in_stock"])
        j = broadcast_join(p, tags, on="id", right_on="product_id",
                           right_columns=["tag_name"])
        return broadcast_join(j, reviews, on="id", right_on="product_id",
                              right_columns=["rating"])

    # Section 1: GROUP BY category over the 3-table join
    q = pdb.parse_with_field("description", "laptop OR shoes OR jacket")
    out = sql_aggregate(joined(q), ["category"],
                        {"count": ("count_star", None),
                         "sum": ("sum", "rating"),
                         "avg": ("avg", "rating")})
    got = _rows(out.select_columns(["category", "count", "sum", "avg"]),
                ["category"])
    assert got == [("Clothing", 1, 3, 3.0),
                   ("Electronics", 6, 24, 4.0),
                   ("Sports", 2, 8, 4.0)]

    # Section 3: scalar aggregate, WHERE description @@@ 'laptop'
    out = sql_aggregate(joined(pdb.parse_with_field("description",
                                                    "laptop")), [],
                        {"count": ("count_star", None),
                         "sum": ("sum", "rating"),
                         "min": ("min", "rating"),
                         "max": ("max", "rating")})
    row = out.take_all()[0]
    assert (row["count"], row["sum"], row["min"], row["max"]) == \
        (6, 24, 3, 5)


def test_aggregate_join_multitable_sections_4_5_9(ray_session):
    from paradedb_ray.pipelines.aggregate import sql_aggregate
    from paradedb_ray.pipelines.joins import broadcast_join
    from paradedb_ray.pipelines.search import search

    products, tags, reviews, schema = _mt_fixture()

    # Section 4: INNER tags + LEFT reviews, COUNT(*) vs COUNT(rating)
    q = pdb.parse_with_field("description",
                             "laptop OR shoes OR jacket OR kids")
    p = search(ray.data.from_arrow(products).repartition(2), schema, q,
               with_score=False, output_columns=["id", "category"])
    j = broadcast_join(p, tags, on="id", right_on="product_id",
                       right_columns=["tag_name"])
    j = broadcast_join(j, reviews, on="id", right_on="product_id",
                       right_columns=["rating"], how="left")
    out = sql_aggregate(j, ["category"],
                        {"count": ("count_star", None),
                         "count_r": ("count", "rating")})
    got = _rows(out.select_columns(["category", "count", "count_r"]),
                ["category"])
    assert got == [("Clothing", 1, 1), ("Electronics", 6, 6),
                   ("Sports", 2, 2), ("Toys", 2, 0)]

    # Sections 5 + 9: GROUP BY keys from two tables; COUNT(DISTINCT)
    q = pdb.parse_with_field("description", "laptop")
    p = search(ray.data.from_arrow(products).repartition(2), schema, q,
               with_score=False, output_columns=["id", "category"])
    j = broadcast_join(p, tags, on="id", right_on="product_id",
                       right_columns=["tag_name"])
    j = broadcast_join(j, reviews, on="id", right_on="product_id",
                       right_columns=["rating"])
    out = sql_aggregate(j, ["category", "tag_name"],
                        {"count": ("count_star", None),
                         "sum": ("sum", "rating")})
    got = _rows(out.select_columns(["category", "tag_name", "count",
                                    "sum"]), ["category", "tag_name"])
    assert got == [("Electronics", "computer", 2, 9),
                   ("Electronics", "gaming", 1, 3),
                   ("Electronics", "tech", 3, 12)]

    out = sql_aggregate(j, ["category"],
                        {"count": ("cardinality", "tag_name")})
    got = _rows(out.select_columns(["category", "count"]), ["category"])
    assert got == [("Electronics", 3)]
