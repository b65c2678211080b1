"""BM25 float-parity tests pinned to the reference's golden regression
outputs (`pg_search/tests/pg_regress/expected/topk_scores.out:38-42`,
`expected/operators.out:41-46`)."""

import numpy as np
import pytest

from paradedb_ray.index.segment import build_segment
from paradedb_ray.index.searcher import Searcher
from paradedb_ray.query import ast
from paradedb_ray.schema import mock_items_schema
from paradedb_ray.testing.fixtures import mock_items_table


@pytest.fixture(scope="module")
def searcher():
    schema = mock_items_schema()
    seg = build_segment(mock_items_table(), schema)
    return Searcher(seg, schema)


def _topk_query():
    # description @@@ 'keyboard' OR (description @@@ 'shoes' AND rating > 2)
    return ast.Boolean(should=[
        ast.ParseWithField("description", "keyboard"),
        ast.Boolean(must=[
            ast.ParseWithField("description", "shoes"),
            ast.Range("rating", ast.Bound.excluded(2)),
        ]),
    ])


def test_topk_scores_golden(searcher):
    hits = searcher.eval(_topk_query())
    ids = searcher.seg.table.column("id").to_numpy()[hits.ids]
    got = dict(zip(ids.tolist(), hits.scores.tolist()))
    golden = {
        3: 3.4849067,
        5: 3.8772602,
        2: 3.2668595,
        1: 2.8213787,
        4: 3.4849067,
    }
    assert set(got) == set(golden)
    for k, v in golden.items():
        assert got[k] == pytest.approx(v, abs=2e-7), (k, got[k], v)


def test_topk_scores_exact_f32(searcher):
    """The scores should be bit-identical f32s, not just approximately equal."""
    hits = searcher.eval(_topk_query())
    ids = searcher.seg.table.column("id").to_numpy()[hits.ids]
    got = dict(zip(ids.tolist(), hits.scores.tolist()))
    golden = {3: 3.4849067, 5: 3.8772602, 2: 3.2668595, 1: 2.8213787, 4: 3.4849067}
    for k, v in golden.items():
        assert np.float32(got[k]) == np.float32(v), (k, got[k], v)


def test_operators_running_shoes(searcher):
    # description @@@ 'running shoes' -> ids {3,4,5} (expected/operators.out:41-46)
    hits = searcher.eval(ast.ParseWithField("description", "running shoes"))
    ids = sorted(searcher.seg.table.column("id").to_numpy()[hits.ids].tolist())
    assert ids == [3, 4, 5]


def test_rating_order_topk(searcher):
    """ORDER BY rating DESC LIMIT 5 over the matched set."""
    hits = searcher.eval(_topk_query())
    t = searcher.seg.table
    ids = t.column("id").to_numpy()[hits.ids]
    ratings = t.column("rating").to_numpy()[hits.ids]
    order = np.lexsort((ids, -ratings))[:5]
    assert ids[order].tolist() == [3, 5, 2, 1, 4] or ratings[order].tolist() == [5, 4, 4, 4, 3]
