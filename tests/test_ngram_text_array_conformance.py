"""Mirror of `pg_regress/expected/ngram-text-array.out`: a TEXT[] column
indexed TWICE — once word-tokenized (icu) and once under a secondary
``column``-aliased field with an ngram(4,4) tokenizer — queried through
pdb.match with conjunction_mode, boost + disjunction_max, and the raw
JSON query path.

Pinned semantics:
* ``{"column": "all_titles"}`` re-indexes an existing column under a new
  field name/configuration (`ngram-text-array.sql` text_fields JSON).
* match analyzes the query value with the FIELD's tokenizer; conjunction
  mode dedups tokens then requires ALL of them (`pdb_query.rs:1931-1998`).
* a query shorter than min_gram yields zero tokens -> zero rows (NOT
  match-all): test 4.
* with distance=0 the prefix flag is ignored (`(0, _) => TermQuery`).
"""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import IndexSchema

_TITLES = [
    ["The Dragon Hatchling", "A Tale of Fire", "Wings of Gold"],
    ["PostgreSQL Database Guide", "SQL for Beginners", "Advanced Queries"],
    ["The Hatchling Returns", "Dragon Slayer", "Fire and Ice"],
    ["Cooking with Dragon Fruit", "Hatchling Care Guide"],
    ["Mystery at the Library", "The Lost Book", "Hidden Pages"],
    ["Science of Flight", "Bird Watching 101", "Wings and Feathers"],
    ["Database Internals", "Index Structures", "B-Tree Deep Dive"],
    ["The Dragon Chronicles", "Rise of the Phoenix", "Ancient Legends"],
]


@pytest.fixture(scope="module")
def s():
    schema = IndexSchema.build(
        "id",
        all_titles={"type": "text", "tokenizer": {"type": "icu"}},
        all_titles_ngram={
            "type": "text", "column": "all_titles",
            "tokenizer": {"type": "ngram", "min_gram": 4, "max_gram": 4,
                          "prefix_only": False}},
    )
    t = pa.table({"id": pa.array(list(range(1, 9)), pa.int64()),
                  "all_titles": pa.array(_TITLES, pa.list_(pa.string()))})
    return Searcher(build_segment(t, schema), schema)


def _ids(s, q):
    return sorted(s.seg.table.column("id").to_numpy()[s.eval(q).ids].tolist())


def test_single_word_ngram_conjunction(s):
    # test 1: all 4-grams of 'dragon' must appear
    q = pdb.match_conjunction("all_titles_ngram", "Dragon")
    assert _ids(s, q) == [1, 3, 4, 8]


def test_multi_word_ngram_conjunction(s):
    # test 2: 'Dragon Hatchling' explodes to 13 grams incl. cross-word
    # spans — only the row containing the full substring survives
    q = pdb.match_conjunction("all_titles_ngram", "Dragon Hatchling")
    assert _ids(s, q) == [1]


def test_dismax_boosted_word_plus_ngram(s):
    # test 3: dismax(boost(50, icu word match w/ prefix+conjunction),
    # ngram conjunction) — prefix is a no-op at distance 0
    q = pdb.disjunction_max([
        pdb.boost(50, ast.Match(field="all_titles", value="Dragon",
                                prefix=True, conjunction_mode=True)),
        pdb.match_conjunction("all_titles_ngram", "Dragon"),
    ])
    assert _ids(s, q) == [1, 3, 4, 8]


def test_short_query_yields_no_rows(s):
    # test 4: 'SQL' < min_gram 4 -> zero tokens -> zero rows
    q = pdb.match_conjunction("all_titles_ngram", "SQL")
    assert _ids(s, q) == []


def test_exact_min_gram_single_token(s):
    # test 5: 'Fire' is exactly one 4-gram
    q = pdb.match_conjunction("all_titles_ngram", "Fire")
    assert _ids(s, q) == [1, 3]


def test_json_query_path(s):
    # test 6: the ::jsonb query serialization round-trips to the same AST
    j = {"disjunction_max": {"disjuncts": [
        {"boost": {"factor": 50, "query": {"match": {
            "field": "all_titles", "value": "Dragon",
            "prefix": True, "conjunction_mode": True}}}},
        {"match": {"field": "all_titles_ngram", "value": "Dragon",
                   "prefix": False, "conjunction_mode": True}},
    ]}}
    q = ast.from_json(j)
    assert _ids(s, q) == [1, 3, 4, 8]


def test_disjunction_baseline(s):
    # test 7: without conjunction_mode any gram suffices — same rows here
    q = pdb.match_disjunction("all_titles_ngram", "Dragon")
    assert _ids(s, q) == [1, 3, 4, 8]
