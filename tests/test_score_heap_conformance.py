"""Mirror of `pg_regress/expected/score_non_indexed_predicates.out`:
pdb.score() when the WHERE clause mixes indexed (@@@) and non-indexed
(heap) predicates.

Pinned semantics (exact f32 scores from the golden):
* indexed-only OR: BM25 scores as usual,
* indexed AND heap-pred: the heap filter prunes rows, scores survive,
* indexed OR heap-pred (the reference's Full-Index-Scan fallback): the
  row set is the SQL union; rows reachable only through the heap
  predicate carry score 0, rows matching the indexed part keep their
  BM25 score even when the heap predicate is false for them.

The OR case composes from existing primitives —
``Boolean(should=[indexed, ConstScore(0, HeapFilter(All, pred))])`` —
mirroring the reference's all-scan + heap recheck plan
(`score_non_indexed_predicates.out` "Full Index Scan: true").
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema

_ROWS = [
    (1, "Apple iPhone 14", "Latest Apple smartphone with great camera", "Casual"),
    (2, "MacBook Pro", "Powerful Apple laptop for professionals", "Electronics"),
    (3, "Nike Air Max", "Comfortable running shoes for athletes", "Footwear"),
    (4, "Samsung Galaxy", "Android smartphone with excellent display", "Electronics"),
    (5, "Adidas Ultraboost", "Premium running shoes with boost technology", "Footwear"),
    (6, "Nike Normal", "Comfortable running shoes for athletes and technology enthusiasts", "Footwear"),
    (7, "Apple Watch", "Smartwatch with health tracking features", "Electronics"),
    (8, "Sony Headphones", "Noise-canceling headphones for music lovers", "Electronics"),
    (9, "Running Socks", "Moisture-wicking socks for athletes", "Footwear"),
    (10, "Budget Phone", "Affordable smartphone for basic needs", "Electronics"),
    (11, "Budget Tablet", "Affordable tablet for basic needs", "Garbage"),
]


@pytest.fixture(scope="module")
def s():
    # the bm25 index covers only (id, name, description); category_name
    # is heap-only
    schema = IndexSchema.build("id", name={"type": "text"},
                               description={"type": "text"})
    t = pa.table({
        "id": pa.array([r[0] for r in _ROWS], pa.int64()),
        "name": pa.array([r[1] for r in _ROWS]),
        "description": pa.array([r[2] for r in _ROWS]),
        "category_name": pa.array([r[3] for r in _ROWS]),
    })
    return Searcher(build_segment(t, schema), schema)


def _scored(s, q):
    h = s.eval(q)
    ids = s.seg.table.column("id").to_numpy()[h.ids]
    return {int(i): np.float32(sc) for i, sc in zip(ids, h.scores)}


_INDEXED_OR = ast.Boolean(should=[
    ast.ParseWithField("name", "Apple"),
    ast.ParseWithField("description", "smartphone")])


def _electronics(tbl: pa.Table):
    return pc.equal(tbl.column("category_name"), "Electronics").to_numpy(
        zero_copy_only=False)


def test_indexed_only_scores(s):
    got = _scored(s, _INDEXED_OR)
    assert got == {1: np.float32(2.5521502), 7: np.float32(1.6239789),
                   4: np.float32(1.2838018), 10: np.float32(1.2838018)}


def test_indexed_and_heap(s):
    q = ast.HeapFilter(indexed_query=_INDEXED_OR, predicate=_electronics,
                       sql="category_name = 'Electronics'")
    got = _scored(s, q)
    assert got == {7: np.float32(1.6239789), 4: np.float32(1.2838018),
                   10: np.float32(1.2838018)}


def test_indexed_or_heap(s):
    q = ast.Boolean(should=[
        _INDEXED_OR,
        ast.ConstScore(ast.HeapFilter(
            indexed_query=ast.All(), predicate=_electronics,
            sql="category_name = 'Electronics'"), 0.0)])
    got = _scored(s, q)
    assert got == {1: np.float32(2.5521502),   # Casual, indexed match
                   7: np.float32(1.6239789),
                   4: np.float32(1.2838018),
                   10: np.float32(1.2838018),
                   2: np.float32(0.0),          # Electronics, heap-only
                   8: np.float32(0.0)}


def test_indexed_must_or_heap(s):
    # (name @@@ 'Apple' AND description @@@ 'smartphone') OR Electronics
    must = ast.Boolean(must=[ast.ParseWithField("name", "Apple"),
                             ast.ParseWithField("description", "smartphone")])
    q = ast.Boolean(should=[
        must,
        ast.ConstScore(ast.HeapFilter(
            indexed_query=ast.All(), predicate=_electronics,
            sql="category_name = 'Electronics'"), 0.0)])
    got = _scored(s, q)
    assert got == {1: np.float32(2.5521502),
                   2: np.float32(0.0), 4: np.float32(0.0),
                   7: np.float32(0.0), 8: np.float32(0.0),
                   10: np.float32(0.0)}
