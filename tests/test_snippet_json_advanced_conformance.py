"""Mirror of `pg_regress/expected/snippet_json_02_advanced.out` (ref
`pg_search/tests/pg_regress/sql/snippet_json_02_advanced.sql`): snippets,
snippet_positions and per-relation scores over JSON dot-paths, projected
onto joined rows (books x authors x reviews).

Every asserted value (f32 scores, highlight strings, byte positions) is
verbatim from the reference .out.  The final block of the reference file
("complex JSON path queries") ERRORS in the reference itself
("Unsupported query shape") and is not mirrored.
"""

import json
import os

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.index.snippet import (
    SnippetConfig,
    query_terms_for_field,
    snippet_column,
)
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema

_LOREM = open(os.path.join(os.path.dirname(__file__), "data",
                           "lorem_snippet_fixture.txt")).read()

_AUTHORS = [
    (1, "J.K. Rowling", 55,
     "British author best known for the Harry Potter fantasy series"),
    (2, "Stephen King", 75,
     "American author known for his horror and supernatural fiction novels"),
    (3, "Agatha Christie", 80,
     "English writer known for her detective novels featuring Hercule Poirot"),
    (4, "Dan Brown", 60,
     "American author of thriller novels including The Da Vinci Code"),
    (5, "J.R.R. Tolkien", 100,
     "English author and philologist famous for The Lord of the Rings"),
]
_BOOKS = [  # (id, author_id, content, titles)
    (1, 2, "This is a test test of the snippet function with multiple test words",
     ["test", "snippet", "function"]),
    (2, 2, "Another test of the snippet snippet function with repeated snippet words",
     ["test", "test", "function"]),
    (3, 1, "Yet another test test test of the function function function",
     ["test", "snippet", "test"]),
    (4, 3, _LOREM, ["test", "snippet", "function"]),
]
_REVIEWS = [  # (id, book_id, review)
    (1, 1, "This is a test review of the snippet function with multiple test words"),
    (2, 2, "Another test review of the snippet snippet function with repeated snippet words"),
    (3, 3, "Yet another test review of the function function function"),
    (4, 3, "test review of the snippet function with multiple test words"),
    (5, 2, "test review of the snippet snippet function with repeated snippet words"),
    (6, 1, "test review of the function function function"),
]


@pytest.fixture(scope="module")
def env():
    a_schema = IndexSchema.build("id", name={"type": "text"},
                                 metadata={"type": "json"})
    a_tbl = pa.table({
        "id": pa.array([r[0] for r in _AUTHORS], pa.int64()),
        "name": pa.array([r[1] for r in _AUTHORS]),
        "metadata": pa.array([json.dumps({"age": r[2], "text": r[3]})
                              for r in _AUTHORS]),
    })
    b_schema = IndexSchema.build("id", author_id={"type": "i64"},
                                 metadata={"type": "json"})
    b_tbl = pa.table({
        "id": pa.array([r[0] for r in _BOOKS], pa.int64()),
        "author_id": pa.array([r[1] for r in _BOOKS], pa.int64()),
        "metadata": pa.array([json.dumps(
            {"content": r[2], "titles": r[3], "test": "test"})
            for r in _BOOKS]),
    })
    r_schema = IndexSchema.build("id", book_id={"type": "i64"},
                                 metadata={"type": "json"})
    r_tbl = pa.table({
        "id": pa.array([r[0] for r in _REVIEWS], pa.int64()),
        "book_id": pa.array([r[1] for r in _REVIEWS], pa.int64()),
        "metadata": pa.array([json.dumps({"review": r[2]})
                              for r in _REVIEWS]),
    })

    def s(t, sch):
        return Searcher(build_segment(t, sch), sch)

    return {"a": (s(a_tbl, a_schema), a_schema),
            "b": (s(b_tbl, b_schema), b_schema),
            "r": (s(r_tbl, r_schema), r_schema)}


def _hits(searcher, query):
    h = searcher.eval(query)
    ids = searcher.seg.table.column("id").to_numpy()[h.ids]
    return {int(i): np.float32(s)
            for i, s in zip(ids.tolist(), h.scores.tolist())}


def _proj(env_entry, query, field, row_id):
    """(snippet, positions) for the row with id ``row_id``."""
    searcher, schema = env_entry
    ids = searcher.seg.table.column("id").to_pylist()
    row = ids.index(row_id)
    terms = query_terms_for_field(query, schema, field)

    class H:
        ids = np.array([row], dtype=np.int64)
        scores = np.array([0.0], dtype=np.float32)

    snip = snippet_column(searcher, H, SnippetConfig(field=field),
                          terms).to_pylist()[0]
    pos = snippet_column(searcher, H,
                         SnippetConfig(field=field, mode="positions"),
                         terms).to_pylist()[0]
    return snip, pos


_B_TEST = ast.Parse("metadata.content:test")
_A_HARRY = ast.Parse("metadata.text:Harry")
_R_TEST_AND_SNIPPET = ast.Boolean(
    must=[ast.Parse("metadata.review:test"),
          ast.Parse("metadata.review:snippet")])

# golden f32 anchors (snippet_json_02_advanced.out)
_BS = {1: np.float32(0.21010332), 2: np.float32(0.17698145),
       3: np.float32(0.21010332), 4: np.float32(0.21010332)}
_SC_HARRY = np.float32(2.2094626)


def test_cte_block(env):
    """Block 1: (books x authors WHERE content:test OR text:Harry) x
    reviews WHERE review:test AND review:snippet."""
    b_hits = _hits(env["b"][0], _B_TEST)
    a_hits = _hits(env["a"][0], _A_HARRY)
    r_hits = _hits(env["r"][0], _R_TEST_AND_SNIPPET)

    assert b_hits == {1: _BS[1], 2: _BS[2], 3: _BS[3], 4: _BS[4]}
    assert a_hits == {1: _SC_HARRY}
    assert r_hits == {1: np.float32(0.83736646),
                      2: np.float32(0.9784815),
                      4: np.float32(0.83736646),
                      5: np.float32(0.9784815)}

    # join rows (book_id, review_id) as in the golden: books 1-3 survive
    # the review filter; book 4 has no reviews (inner filter drops it)
    by_book = {}
    for r_id, bk, _ in _REVIEWS:
        by_book.setdefault(bk, []).append(r_id)
    rows = []
    for b_id, a_id, _, _ in _BOOKS:
        if b_id not in b_hits and a_id not in a_hits:
            continue
        for r_id in by_book.get(b_id, []):
            if r_id in r_hits:
                rows.append((b_id, r_id))
    rows.sort()
    assert rows == [(1, 1), (2, 2), (2, 5), (3, 4)]

    # projections, golden strings/positions
    snip, pos = _proj(env["b"], _B_TEST, "metadata.content", 1)
    assert snip == ("This is a <b>test</b> <b>test</b> of the snippet "
                    "function with multiple <b>test</b> words")
    assert pos == [[10, 14], [15, 19], [58, 62]]
    snip, pos = _proj(env["b"], _B_TEST, "metadata.content", 2)
    assert snip == ("Another <b>test</b> of the snippet snippet function "
                    "with repeated snippet words")
    assert pos == [[8, 12]]
    snip, pos = _proj(env["a"], _A_HARRY, "metadata.text", 1)
    assert snip == ("British author best known for the <b>Harry</b> "
                    "Potter fantasy series")
    assert pos == [[34, 39]]
    snip, pos = _proj(env["r"], _R_TEST_AND_SNIPPET, "metadata.review", 2)
    assert snip == ("Another <b>test</b> review of the <b>snippet</b> "
                    "<b>snippet</b> function with repeated "
                    "<b>snippet</b> words")
    assert pos == [[8, 12], [27, 34], [35, 42], [66, 73]]
    snip, pos = _proj(env["r"], _R_TEST_AND_SNIPPET, "metadata.review", 5)
    assert snip == ("<b>test</b> review of the <b>snippet</b> "
                    "<b>snippet</b> function with repeated "
                    "<b>snippet</b> words")
    assert pos == [[0, 4], [19, 26], [27, 34], [58, 65]]


def test_three_table_or_block(env):
    """Block 2: OR across the three relations with LEFT JOIN reviews —
    7 golden rows; book-4 keeps a NULL review score."""
    b_hits = _hits(env["b"][0], _B_TEST)
    a_hits = _hits(env["a"][0], ast.Parse("metadata.text:fantasy"))
    rq = ast.Boolean(should=[ast.Parse("metadata.review:test"),
                             ast.Parse("metadata.review:snippet")])
    r_hits = _hits(env["r"][0], rq)

    assert a_hits == {1: _SC_HARRY}  # 'fantasy' scores like 'Harry' (df=1)
    by_book = {}
    for r_id, bk, _ in _REVIEWS:
        by_book.setdefault(bk, []).append(r_id)
    rows = {}
    for b_id, a_id, _, _ in _BOOKS:
        for r_id in (by_book.get(b_id) or [None]):
            keep = (b_id in b_hits or a_id in a_hits
                    or (r_id is not None and r_id in r_hits))
            if keep:
                rows[(b_id, r_id)] = (
                    b_hits.get(b_id, np.float32(0.0)),
                    a_hits.get(a_id, np.float32(0.0)),
                    None if r_id is None
                    else r_hits.get(r_id, np.float32(0.0)))
    assert len(rows) == 7
    assert rows[(1, 1)] == (_BS[1], np.float32(0.0),
                            np.float32(0.83736646))
    assert rows[(1, 6)] == (_BS[1], np.float32(0.0),
                            np.float32(0.11753877))
    assert rows[(2, 2)] == (_BS[2], np.float32(0.0),
                            np.float32(0.9784815))
    assert rows[(2, 5)] == (_BS[2], np.float32(0.0),
                            np.float32(0.9784815))
    assert rows[(3, 3)] == (_BS[3], _SC_HARRY, np.float32(0.11753877))
    assert rows[(3, 4)] == (_BS[3], _SC_HARRY, np.float32(0.83736646))
    assert rows[(4, None)] == (_BS[4], np.float32(0.0), None)

    snip, pos = _proj(env["a"], ast.Parse("metadata.text:fantasy"),
                      "metadata.text", 1)
    assert snip == ("British author best known for the Harry Potter "
                    "<b>fantasy</b> series")
    assert pos == [[47, 54]]
    snip, pos = _proj(env["r"], rq, "metadata.review", 3)
    assert snip == ("Yet another <b>test</b> review of the function "
                    "function function")
    assert pos == [[12, 16]]


def test_multi_term_authors_block(env):
    """Block 3: text:author AND text:novels over authors only."""
    q = ast.Boolean(must=[ast.Parse("metadata.text:author"),
                          ast.Parse("metadata.text:novels")])
    hits = _hits(env["a"][0], q)
    assert hits == {2: np.float32(1.3175524), 4: np.float32(1.3175524)}
    snip, pos = _proj(env["a"], q, "metadata.text", 2)
    assert snip == ("American <b>author</b> known for his horror and "
                    "supernatural fiction <b>novels</b>")
    assert pos == [[9, 15], [62, 68]]
    snip, pos = _proj(env["a"], q, "metadata.text", 4)
    assert snip == ("American <b>author</b> of thriller <b>novels</b> "
                    "including The Da Vinci Code")
    assert pos == [[9, 15], [28, 34]]


def test_json_array_titles_block(env):
    """Block 4: content:function OR titles:test — the snippet over
    metadata.content highlights BOTH query terms ('test' from the titles
    clause highlights in content too: term collection is per base JSON
    field in the reference)."""
    q = ast.Boolean(should=[ast.Parse("metadata.content:function"),
                            ast.Parse("metadata.titles:test")])
    hits = _hits(env["b"][0], q)
    assert hits == {1: np.float32(0.77611315),
                    2: np.float32(0.79984426),
                    3: np.float32(0.9119711),
                    4: np.float32(0.17698145)}

    snip, pos = _proj(env["b"], q, "metadata.content", 1)
    assert snip == ("This is a <b>test</b> <b>test</b> of the snippet "
                    "<b>function</b> with multiple <b>test</b> words")
    assert pos == [[10, 14], [15, 19], [35, 43], [58, 62]]
    snip, pos = _proj(env["b"], q, "metadata.content", 2)
    assert snip == ("Another <b>test</b> of the snippet snippet "
                    "<b>function</b> with repeated snippet words")
    assert pos == [[8, 12], [36, 44]]
    snip, pos = _proj(env["b"], q, "metadata.content", 3)
    assert snip == ("Yet another <b>test</b> <b>test</b> <b>test</b> of "
                    "the <b>function</b> <b>function</b> <b>function</b>")
    assert pos == [[12, 16], [17, 21], [22, 26], [34, 42], [43, 51],
                   [52, 60]]
    snip, pos = _proj(env["b"], q, "metadata.content", 4)
    assert snip == (
        "<b>test</b> Lorem ipsum dolor sit amet, consectetur adipiscing "
        "elit. Sed do eiusmod tempor incididunt ut labore et dolore magna "
        "aliqua. Ut enim ad minim")
    assert pos == [[0, 4], [1317, 1321], [2167, 2171]]


def test_json_score_distributed_matches_local(ray_session, env):
    """The stats-exchange pipeline (StatsCollector json token-df + json
    total tokens) must score EXACTLY like the single-segment Searcher,
    at any block count — json df/avgdl come from the exchange, never
    from a segment-local guess."""
    import ray.data

    from paradedb_ray.pipelines.search import search_topk

    searcher, schema = env["b"]
    t = searcher.seg.table
    q = ast.Boolean(should=[ast.Parse("metadata.content:function"),
                            ast.Parse("metadata.titles:test")])
    want = {1: np.float32(0.77611315), 2: np.float32(0.79984426),
            3: np.float32(0.9119711), 4: np.float32(0.17698145)}
    for nblocks in (1, 3):
        out = search_topk(
            ray.data.from_arrow(t).repartition(nblocks), schema, q,
            limit=10, order_by=[("score", "descending"),
                                ("id", "ascending")],
            output_columns=["id", "score"]).take_all()
        got = {r["id"]: np.float32(r["score"]) for r in out}
        assert got == want, nblocks
