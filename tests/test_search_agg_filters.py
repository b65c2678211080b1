"""Mirror of `pg_regress/expected/groupby_filter_mixed_buckets.out` —
twelve `COUNT(*) FILTER (WHERE ...)` clauses mixing search predicates
(`category @@@ 'electronics'`) with plain comparisons, evaluated in ONE
aggregate pass.  Search masks come from
`stages.search_stages.search_agg_filters`, which builds the block's
segment once and shares it across every mask (the MultiQueryScorer
amortization)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from paradedb_ray.pipelines.aggregate import sql_aggregate
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import BOOL, F64, I64, TEXT, IndexSchema
from paradedb_ray.stages.search_stages import search_agg_filters

_ROWS = [
    (1, 'MacBook Pro', 'laptop computer with keyboard', 'electronics', 'Apple', 'available', 2499.99, 5, True, 1500),
    (2, 'iMac Desktop', 'desktop computer with monitor', 'electronics', 'Apple', 'available', 1999.99, 5, True, 1200),
    (3, 'iPad Tablet', 'tablet with stylus', 'electronics', 'Apple', 'sold', 899.99, 4, False, 2000),
    (4, 'Galaxy Laptop', 'laptop computer gaming', 'electronics', 'Samsung', 'available', 1799.99, 4, True, 800),
    (5, 'Samsung Monitor', 'monitor ultra wide', 'electronics', 'Samsung', 'available', 599.99, 4, True, 600),
    (6, 'Galaxy Tablet', 'tablet android device', 'electronics', 'Samsung', 'sold', 649.99, 3, False, 900),
    (7, 'Gaming Keyboard', 'keyboard mechanical gaming', 'electronics', 'Generic', 'available', 149.99, 3, True, 400),
    (8, 'Wireless Mouse', 'mouse wireless pro', 'electronics', 'Generic', 'available', 79.99, 4, True, 300),
    (9, 'Developer T-Shirt', 'shirt for programming', 'clothing', 'TechWear', 'available', 24.99, 4, True, 200),
    (10, 'Database Hoodie', 'hoodie with logo', 'clothing', 'TechWear', 'available', 59.99, 5, True, 350),
    (11, 'Running Shoes', 'shoes for running', 'clothing', 'SportsBrand', 'sold', 129.99, 4, False, 180),
    (12, 'Casual Jeans', 'jeans casual wear', 'clothing', 'FashionCo', 'available', 79.99, 3, True, 120),
    (13, 'Database Systems', 'database design book', 'books', 'TechPress', 'available', 49.99, 5, True, 1800),
    (14, 'Search Engines', 'search engine design', 'books', 'TechPress', 'available', 59.99, 5, True, 1600),
    (15, 'SQL Performance', 'sql optimization guide', 'books', 'DataBooks', 'sold', 39.99, 4, False, 1400),
    (16, 'PostgreSQL Guide', 'postgresql advanced topics', 'books', 'DataBooks', 'available', 44.99, 4, True, 1200),
    (17, 'Tennis Racket', 'racket for tennis', 'sports', 'SportsCorp', 'available', 199.99, 4, True, 250),
    (18, 'Basketball', 'basketball official size', 'sports', 'SportsCorp', 'available', 29.99, 3, True, 150),
    (19, 'Soccer Ball', 'soccer ball professional', 'sports', 'PlayTime', 'sold', 39.99, 4, False, 200),
    (20, 'Golf Clubs', 'golf club set premium', 'sports', 'GolfPro', 'available', 899.99, 5, True, 100),
]

_COLS = ["id", "title", "description", "category", "brand", "status",
         "price", "rating", "in_stock", "views"]


def _table() -> pa.Table:
    cols = list(zip(*_ROWS))
    return pa.table({
        "id": pa.array(cols[0], pa.int64()),
        "title": pa.array(cols[1]), "description": pa.array(cols[2]),
        "category": pa.array(cols[3]), "brand": pa.array(cols[4]),
        "status": pa.array(cols[5]),
        "price": pa.array(cols[6], pa.float64()),
        "rating": pa.array(cols[7], pa.int64()),
        "in_stock": pa.array(cols[8], pa.bool_()),
        "views": pa.array(cols[9], pa.int64()),
    })


def _schema() -> IndexSchema:
    return IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        title={"type": TEXT}, description={"type": TEXT},
        category={"type": TEXT, "fast": True},
        brand={"type": TEXT, "fast": True},
        status={"type": TEXT, "fast": True},
        price={"type": F64, "fast": True},
        rating={"type": I64, "fast": True},
        in_stock={"type": BOOL, "fast": True},
        views={"type": I64, "fast": True})


def test_mixed_filter_buckets(ray_session):
    schema = _schema()
    # 3 blocks so the per-batch segment memo is exercised across blocks
    ds = ray.data.from_arrow(_table()).repartition(3)

    search_filters = search_agg_filters(schema, {
        "f1": pdb.match_disjunction("category", "electronics"),
        "f2": pdb.match_disjunction("category", "clothing"),
        "f3": pdb.match_disjunction("category", "books"),
        "f4": pdb.match_disjunction("category", "sports"),
        "f5": pdb.match_disjunction("brand", "Apple"),
        "f6": pdb.match_disjunction("brand", "Samsung"),
        "f7": pdb.match_disjunction("brand", "TechPress"),
        "f8": pdb.match_disjunction("status", "available"),
        "f9": pdb.match_disjunction("status", "sold"),
    })
    agg_filters = dict(search_filters)
    agg_filters["f10"] = lambda b: np.asarray(
        pc.greater_equal(b.column("rating"), 4))
    agg_filters["f11"] = lambda b: np.asarray(
        pc.greater_equal(b.column("rating"), 5))
    agg_filters["f12"] = lambda b: np.asarray(b.column("in_stock"))

    names = [f"f{i}" for i in range(1, 13)]
    out = sql_aggregate(ds, [], {n: ("count_star", None) for n in names},
                        agg_filters=agg_filters)
    got = out.to_pandas()
    assert len(got) == 1
    want = dict(zip(names, [8, 4, 4, 4, 3, 3, 2, 15, 5, 16, 6, 15]))
    for n in names:
        assert int(got[n].iloc[0]) == want[n], (n, got[n].iloc[0], want[n])
