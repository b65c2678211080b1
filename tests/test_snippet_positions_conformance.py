"""Row-for-row mirror of
`pg_regress/expected/snippet_position_01_basic.out`: snippet /
snippet_positions over TEXT and TEXT[] fields with exact highlight
strings, exact byte-offset position arrays and exact f32 scores for the
mixed-field OR query.  The TEXT[] rows pin the array-flattening rule
(`scan_state.rs:447-461`: elements space-joined before highlighting).
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

_CONTENT = [
    "This is a test test of the snippet function with multiple test words",
    "Another test of the snippet snippet function with repeated snippet words",
    "Yet another test test test of the function function function",
    _LOREM,
]
_TITLES = [
    ["test", "snippet", "function"],
    ["test", "test", "function"],
    ["test", "snippet", "test"],
    ["test", "snippet", "function"],
]


@pytest.fixture(scope="module")
def env():
    schema = IndexSchema.build(
        "id", content={"type": "text"}, titles={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "content": pa.array(_CONTENT, pa.string()),
        "titles": pa.array(_TITLES, pa.list_(pa.string())),
    })
    seg = build_segment(t, schema)
    return schema, seg, Searcher(seg, schema)


def _rows(env, query, field):
    """{id: (snippet, positions)} for every hit, via the projection API."""
    schema, seg, s = env
    hits = s.eval(query)
    terms = query_terms_for_field(query, schema, field)
    an = schema.field(field).analyzer
    out = {}
    ids = seg.table.column("id").to_numpy()
    col = seg.table.column(field)
    for d in hits.ids.tolist():
        txt = col[d].as_py()
        snip = generate(txt, an, terms, SnippetConfig(field=field))
        pos = generate(txt, an, terms,
                       SnippetConfig(field=field, mode="positions"))
        out[int(ids[d])] = (snip, pos)
    return out


def _or(field_a, qa, field_b, qb):
    return ast.Boolean(should=[ast.ParseWithField(field_a, qa),
                               ast.ParseWithField(field_b, qb)])


def test_content_snippets_and_positions(env):
    got = _rows(env, _or("content", "test", "content", "snippet"),
                "content")
    assert set(got) == {1, 2, 3, 4}
    assert got[1] == (
        "This is a <b>test</b> <b>test</b> of the <b>snippet</b> function "
        "with multiple <b>test</b> words",
        [[10, 14], [15, 19], [27, 34], [58, 62]])
    assert got[2] == (
        "Another <b>test</b> of the <b>snippet</b> <b>snippet</b> function "
        "with repeated <b>snippet</b> words",
        [[8, 12], [20, 27], [28, 35], [59, 66]])
    assert got[3] == (
        "Yet another <b>test</b> <b>test</b> <b>test</b> of the function "
        "function function",
        [[12, 16], [17, 21], [22, 26]])
    # the long row: first fragment wins the tie; every occurrence appears
    # in positions even though the snippet shows only the fragment
    snip4, pos4 = got[4]
    assert snip4 == (
        "<b>test</b> Lorem ipsum dolor sit amet, consectetur adipiscing "
        "elit. Sed do eiusmod tempor incididunt ut labore et dolore magna "
        "aliqua. Ut enim ad minim")
    assert pos4 == [[0, 4], [1317, 1321], [2167, 2171]]


def test_titles_array_snippets_and_positions(env):
    got = _rows(env, _or("titles", "test", "titles", "snippet"), "titles")
    assert got[1] == ("<b>test</b> <b>snippet</b> function",
                      [[0, 4], [5, 12]])
    assert got[2] == ("<b>test</b> <b>test</b> function",
                      [[0, 4], [5, 9]])
    assert got[3] == ("<b>test</b> <b>snippet</b> <b>test</b>",
                      [[0, 4], [5, 12], [13, 17]])
    assert got[4] == ("<b>test</b> <b>snippet</b> function",
                      [[0, 4], [5, 12]])


def test_mixed_field_or_scores_and_projections(env):
    """titles @@@ 'test' OR content @@@ 'ipsum' — exact f32 scores and
    per-field snippet projections (snippet_position_01_basic.out:46-76)."""
    schema, seg, s = env
    q = _or("titles", "test", "content", "ipsum")
    hits = s.eval(q)
    ids = seg.table.column("id").to_numpy()
    scores = {int(ids[d]): np.float32(sc)
              for d, sc in zip(hits.ids.tolist(), hits.scores.tolist())}
    assert scores == {4: np.float32(1.0748948),
                      2: np.float32(0.14487077),
                      3: np.float32(0.14487077),
                      1: np.float32(0.10536056)}

    got_c = _rows(env, q, "content")
    # only row 4 matches on content; its content terms are {ipsum} alone
    snip4, pos4 = got_c[4]
    assert snip4 == (
        "test Lorem <b>ipsum</b> dolor sit amet, consectetur adipiscing "
        "elit. Sed do eiusmod tempor incididunt ut labore et dolore magna "
        "aliqua. Ut enim ad minim")
    assert pos4 == [[11, 16], [860, 865]]
    assert got_c[1] == (None, []) and got_c[2] == (None, [])

    got_t = _rows(env, q, "titles")
    assert got_t[4] == ("<b>test</b> snippet function", [[0, 4]])
    assert got_t[2] == ("<b>test</b> <b>test</b> function",
                        [[0, 4], [5, 9]])
    assert got_t[3] == ("<b>test</b> snippet <b>test</b>",
                        [[0, 4], [13, 17]])
    assert got_t[1] == ("<b>test</b> snippet function", [[0, 4]])


def test_positions_element_access(env):
    """The final block: first/second span element access over
    content @@@ 'test' (ids 1-3)."""
    got = _rows(env, ast.ParseWithField("content", "test"), "content")
    assert got[1][1] == [[10, 14], [15, 19], [58, 62]]
    assert got[2][1] == [[8, 12]]
    assert got[3][1] == [[12, 16], [17, 21], [22, 26]]
    assert got[1][1][0] == [10, 14]
    assert got[1][1][1] == [15, 19]
