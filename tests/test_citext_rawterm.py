"""citext fields + raw term-query semantics, golden-checked against
`pg_search/tests/pg_regress/expected/citext.out` Test 5:

* ``|||`` / ``###`` (Match/TokenizedPhrase) analyze the QUERY text, so any
  case matches ("quick" == "QUICK" == "Quick"),
* ``===`` / ``paradedb.term()`` is a RAW term-dict lookup
  (`query/mod.rs:1630-1660` value_to_term): the index stores lowercased
  tokens, so only the lowercase query matches,
* identical BM25 scores for 'quick' vs 'QUICK' via ``|||``.
"""

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast, builders as pdb
from paradedb_ray.schema import IndexSchema


@pytest.fixture(scope="module")
def citext_searcher():
    schema = IndexSchema.build("id", content={"type": "citext"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "content": pa.array(["The Quick Brown Fox", "THE LAZY DOG",
                             "quick brown fox jumps", "lazy dog sleeps"]),
    })
    return Searcher(build_segment(t, schema), schema)


def _ids(s, hits):
    return sorted(s.seg.table.column("id").to_numpy()[hits.ids].tolist())


def test_citext_match_any_case(citext_searcher):
    s = citext_searcher
    for q in ("quick", "QUICK", "Quick"):
        h = s.eval(pdb.match_disjunction("content", q))
        assert _ids(s, h) == [1, 3], q


def test_citext_phrase(citext_searcher):
    s = citext_searcher
    h = s.eval(ast.TokenizedPhrase("content", "quick brown"))
    assert _ids(s, h) == [1, 3]


def test_raw_term_case_sensitive(citext_searcher):
    # citext.out: === 'quick' -> {1,3}; === 'QUICK' / 'Quick' -> 0 rows
    s = citext_searcher
    assert _ids(s, s.eval(ast.Term("content", "quick"))) == [1, 3]
    assert _ids(s, s.eval(ast.Term("content", "QUICK"))) == []
    assert _ids(s, s.eval(ast.Term("content", "Quick"))) == []
    # TermSet follows the same raw lookup
    assert _ids(s, s.eval(ast.TermSet("content", ["quick", "LAZY"]))) == [1, 3]


def test_citext_same_score_any_case(citext_searcher):
    s = citext_searcher
    a = s.eval(pdb.match_disjunction("content", "quick"))
    b = s.eval(pdb.match_disjunction("content", "QUICK"))
    assert np.array_equal(a.ids, b.ids)
    assert np.array_equal(a.scores, b.scores)
    assert (a.scores > 0).all()


def test_parse_string_still_analyzed(citext_searcher):
    # @@@ analyzes the query string — uppercase matches through the parser
    s = citext_searcher
    h = s.eval(ast.ParseWithField("content", "QUICK"))
    assert _ids(s, h) == [1, 3]
