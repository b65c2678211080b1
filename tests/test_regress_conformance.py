"""Row-for-row conformance against pg_regress golden outputs (beyond the
topk_scores/operators files covered in test_bm25_golden): slop phrase
semantics, score_filter bounds with exact f32 scores, stopword filtering
inside search.

Golden sources:
* `pg_search/tests/pg_regress/expected/slop.out` (mock_items)
* `pg_search/tests/pg_regress/expected/score_filter.out` (score_items)
* `pg_search/tests/pg_regress/expected/stopwords.out` (test_stopwords)
"""

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema
from paradedb_ray.testing import mock_items_table
from paradedb_ray.schema import mock_items_schema


@pytest.fixture(scope="module")
def mock_searcher():
    schema = mock_items_schema()
    return Searcher(build_segment(mock_items_table(), schema), schema)


def _ids(searcher, hits):
    return sorted(searcher.seg.table.column("id").to_numpy()[hits.ids].tolist())


# -- slop.out ---------------------------------------------------------------


def test_slop_tokenized_phrase(mock_searcher):
    # description ### 'running shoes'::pdb.slop(2) -> id 3 (slop.out:28-33)
    h = mock_searcher.eval(ast.TokenizedPhrase(
        field="description", phrase="running shoes", slop=2))
    assert _ids(mock_searcher, h) == [3]


def test_slop_reversed_phrase_array(mock_searcher):
    # ### ARRAY['shoes','running']: slop 2 matches (transposition cost 2),
    # slop 0 and 1 do not (slop.out:49-66)
    for slop, want in ((2, [3]), (1, []), (0, [])):
        h = mock_searcher.eval(ast.PhraseArray(
            field="description", tokens=["shoes", "running"], slop=slop))
        assert _ids(mock_searcher, h) == want, slop


# -- score_filter.out -------------------------------------------------------


@pytest.fixture(scope="module")
def score_searcher():
    schema = IndexSchema.build("id", description={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "description": pa.array(["PostgreSQL is amazing",
                                 "Search engines are powerful",
                                 "Tantivy is fast"]),
    })
    return Searcher(build_segment(t, schema), schema)


def test_score_filter_golden_score(score_searcher):
    # score for @@@ 'PostgreSQL' = 1.0226655 (score_filter.out TEST 1)
    h = score_searcher.eval(ast.ParseWithField("description", "PostgreSQL"))
    assert _ids(score_searcher, h) == [1]
    assert np.float32(h.scores[0]) == np.float32(1.0226655)


def test_score_filter_bounds(score_searcher):
    base = ast.ParseWithField("description", "PostgreSQL")
    keep = score_searcher.eval(ast.ScoreFilter(bounds=[(0.0, None)], query=base))
    assert _ids(score_searcher, keep) == [1]
    over = score_searcher.eval(ast.ScoreFilter(bounds=[(10.0, None)], query=base))
    assert _ids(score_searcher, over) == []


# -- proximity.out ----------------------------------------------------------


@pytest.fixture(scope="module")
def prox_searcher():
    schema = IndexSchema.build("id", text={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j k l m n o p q r s t u v w x y z",
            "bbq chicken is delicious",
            "bbq ribs are delicious",
            "chicken will be served at the bbq party",
            "ribs will be served at the party bbq",
        ]),
    })
    return Searcher(build_segment(t, schema), schema)


def test_proximity_distance_window(prox_searcher):
    # pdb.proximity('a', 23, 'z') -> none; ('a', 24, 'z') -> id 1
    h = prox_searcher.eval(ast.Proximity("text", "a", 23, "z"))
    assert _ids(prox_searcher, h) == []
    h = prox_searcher.eval(ast.Proximity("text", "a", 24, "z"))
    assert _ids(prox_searcher, h) == [1]


def test_proximity_array_and_order(prox_searcher):
    # unordered 'delicious' ~2 ['bbq','chicken'] -> {2,3};
    # in-order variant -> {}; reversed in-order -> {2,3}
    h = prox_searcher.eval(ast.Proximity(
        "text", "delicious", 2, ["bbq", "chicken"], ordered=False))
    assert _ids(prox_searcher, h) == [2, 3]
    h = prox_searcher.eval(ast.Proximity(
        "text", "delicious", 2, ["bbq", "chicken"], ordered=True))
    assert _ids(prox_searcher, h) == []
    h = prox_searcher.eval(ast.Proximity(
        "text", ["bbq", "chicken"], 2, "delicious", ordered=True))
    assert _ids(prox_searcher, h) == [2, 3]


def test_proximity_regex_clauses(prox_searcher):
    # pdb.prox_regex('del...ous') ~1 ['chicken', /r..s/] -> {2,3} unordered,
    # {} in order
    h = prox_searcher.eval(ast.Proximity(
        "text", "/del...ous/", 1, ["chicken", "/r..s/"], ordered=False))
    assert _ids(prox_searcher, h) == [2, 3]
    h = prox_searcher.eval(ast.Proximity(
        "text", "/del...ous/", 1, ["chicken", "/r..s/"], ordered=True))
    assert _ids(prox_searcher, h) == []


# -- fuzzy.out --------------------------------------------------------------


def test_fuzzy_distance_golden(mock_searcher):
    # === 'sho'::pdb.fuzzy(d): d=0,1 -> none; d=2 -> {3,4,5}
    for d, want in ((0, []), (1, []), (2, [3, 4, 5])):
        h = mock_searcher.eval(ast.FuzzyTerm(
            field="description", value="sho", distance=d))
        assert _ids(mock_searcher, h) == want, d


def test_fuzzy_array_occurs(mock_searcher):
    fz = [ast.FuzzyTerm(field="description", value=v, distance=2)
          for v in ("sho", "running")]
    # === ARRAY (term-set OR) and ||| -> {3,4,5}
    h = mock_searcher.eval(ast.Boolean(should=fz))
    assert _ids(mock_searcher, h) == [3, 4, 5]
    # &&& ARRAY (conjunction) -> {3}
    h = mock_searcher.eval(ast.Boolean(must=fz))
    assert _ids(mock_searcher, h) == [3]


# -- stopwords.out ----------------------------------------------------------


def test_stopwords_tokenize_positions():
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    tk = tokenizer_from_config({"type": "default", "stopwords": ["stopword"]})
    toks = tk.tokenize_tokens("something, stopword, else")
    assert [(t.text, t.position) for t in toks] == [("something", 0),
                                                   ("else", 2)]
    tk2 = tokenizer_from_config({"type": "default",
                                 "stopwords_language": "English"})
    toks2 = tk2.tokenize_tokens("something and else")
    assert [(t.text, t.position) for t in toks2] == [("something", 0),
                                                     ("else", 2)]


def test_stopwords_search_scores_golden():
    """Docs 'something else' and 'something, stopword, else' score
    identically (stopword removed before indexing); golden f32 scores from
    stopwords.out: 0.60353506 / 0.13353144."""
    schema = IndexSchema.build("id", name={
        "type": "text",
        "tokenizer": {"type": "default", "stopwords": ["stopword"]}})
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["something else", "something more",
                          "something, stopword, else"]),
    })
    s = Searcher(build_segment(t, schema), schema)
    h = s.eval(ast.ParseWithField("name", '("something" "else")'))
    got = dict(zip(s.seg.table.column("id").to_numpy()[h.ids].tolist(),
                   h.scores.tolist()))
    golden = {1: 0.60353506, 2: 0.13353144, 3: 0.60353506}
    assert set(got) == set(golden)
    for k, v in golden.items():
        assert np.float32(got[k]) == np.float32(v), (k, got[k], v)
    # searching the stopword itself finds nothing
    h2 = s.eval(ast.ParseWithField("name", "stopword"))
    assert len(h2) == 0
