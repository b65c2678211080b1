"""JSON dot-path snippets + tokenized JSON term matching, golden-checked
against `pg_search/tests/pg_regress/expected/snippet_json_01_basic.out`:

* ``parse('metadata_jsonb.details.author.description:test')`` matches the
  row whose leaf is "A test author" (string leaves are TOKENIZED through
  the field's analyzer, not equality-matched),
* ``pdb.snippet`` over the path renders "A <b>test</b> author" with byte
  positions {{2,6}},
* array leaves (``tags: ["test","snippet"]``) match per element and
  snippet as the space-joined string ("test <b>snippet</b>", {{5,12}}).
"""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.index.snippet import SnippetConfig, query_terms_for_field, \
    snippet_column
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema


@pytest.fixture(scope="module")
def json_searcher():
    # the snippet_json_basic_setup.sql corpus, verbatim
    schema = IndexSchema.build(
        "id", content={"type": "text"},
        metadata_json={"type": "json"}, metadata_jsonb={"type": "json"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "content": pa.array([
            "This is a test test of the snippet function with multiple test words",
            "Another test of the snippet snippet function with repeated snippet words",
            "Yet another test test test of the function function function",
            "test Lorem ipsum dolor sit amet...test"]),
        "metadata_json": pa.array([
            '{"name": "test1", "tags": ["test", "snippet"], "metadata": {"created": "2023-01-01", "priority": 1}}',
            '{"name": "test2", "scores": [10, 20, 30], "config": {"enabled": true, "settings": {"mode": "advanced", "limit": 5}}}',
            '{"name": "test3", "mixed": [{"key": "value"}, 42, null, true], "timestamp": "2023-12-31T23:59:59Z"}',
            '{"name": "test4", "complex": {"arrays": [[1,2], [3,4]], "object": {"null": null, "bool": false, "num": 3.14159}}}']),
        "metadata_jsonb": pa.array([
            '{"id": 1, "details": {"author": {"first_name": "John", "last_name": "Doe", "description": "A test author"}, "stats": {"views": 100, "likes": 50}}, "active": true}',
            '{"id": 2, "nested": {"level1": {"level2": {"level3": "deep value"}}, "array": [1, "two", 3.14]}, "status": "active"}',
            '{"id": 3, "data": {"numbers": [1.1, 2.2, 3.3], "flags": {"debug": true, "test": false}}, "tags": ["alpha", "beta"]}',
            '{"id": 4, "metadata": {"created_at": "2023-12-01", "updated_at": "2023-12-31", "versions": [1, 2, 3]}, "settings": {"notifications": {"email": true, "push": false}, "theme": "dark"}}']),
    })
    return Searcher(build_segment(t, schema), schema)


def _row_ids(s, hits):
    return sorted(s.seg.table.column("id").to_numpy()[hits.ids].tolist())


def test_json_tokenized_term_match(json_searcher):
    s = json_searcher
    # string leaf "A test author" matches token 'test'
    q = ast.Term("metadata_jsonb.details.author.description", "test")
    assert _row_ids(s, s.eval(q)) == [1]
    # array leaf ["test","snippet"] matches per element
    q = ast.Term("metadata_json.tags", "snippet")
    assert _row_ids(s, s.eval(q)) == [1]
    # numeric array membership: scores [10,20,30]
    q = ast.Term("metadata_json.scores", 20)
    assert _row_ids(s, s.eval(q)) == [2]
    # no match across rows
    q = ast.Term("metadata_jsonb.details.author.description", "snippet")
    assert _row_ids(s, s.eval(q)) == []


def _snip(s, q, field, mode):
    hits = s.eval(q)
    cfg = SnippetConfig(field=field, mode=mode)
    terms = query_terms_for_field(q, s.schema, field)
    col = snippet_column(s, hits, cfg, terms)
    return _row_ids(s, hits), col.to_pylist()


def test_json_snippet_string_leaf_golden(json_searcher):
    # snippet_json_01_basic.out: "A <b>test</b> author" / {{2,6}}
    q = ast.Term("metadata_jsonb.details.author.description", "test")
    ids, snips = _snip(json_searcher, q,
                       "metadata_jsonb.details.author.description", "single")
    assert ids == [1]
    assert snips == ["A <b>test</b> author"]
    _, poss = _snip(json_searcher, q,
                    "metadata_jsonb.details.author.description", "positions")
    assert poss == [[[2, 6]]]


def test_json_snippet_array_leaf_golden(json_searcher):
    # tags ["test","snippet"] render space-joined: "test <b>snippet</b>",
    # positions {{5,12}}
    q = ast.Term("metadata_json.tags", "snippet")
    ids, snips = _snip(json_searcher, q, "metadata_json.tags", "single")
    assert ids == [1]
    assert snips == ["test <b>snippet</b>"]
    _, poss = _snip(json_searcher, q, "metadata_json.tags", "positions")
    assert poss == [[[5, 12]]]


def test_json_term_set_still_raw_equality(json_searcher):
    # full-string leaves (RFC3339 dates etc.) keep whole-value matching
    # (json_term_set.out) — the tokenized route only fires for
    # single-token query values
    s = json_searcher
    q = ast.Term("metadata_json.timestamp", "2023-12-31T23:59:59Z")
    assert _row_ids(s, s.eval(q)) == [3]


def test_json_snippet_search_pipeline(ray_session, json_searcher):
    """End-to-end through search(): snippet + positions columns on a JSON
    path, with projection pushdown keeping the base column."""
    import ray.data

    from paradedb_ray.pipelines.search import search

    ds = ray.data.from_arrow(json_searcher.seg.table)
    schema = json_searcher.schema
    q = ast.Parse("metadata_jsonb.details.author.description:test")
    out = search(
        ds, schema, q, with_score=False, output_columns=["id", "snippet"],
        snippet_cfgs=[SnippetConfig(
            field="metadata_jsonb.details.author.description")],
    ).to_pandas()
    assert out["id"].tolist() == [1]
    assert out["snippet"].tolist() == ["A <b>test</b> author"]


def test_json_match_operator(json_searcher):
    """`json_operator.sql`: ||| / &&& over a JSON dot-path tokenize with
    the base field's analyzer."""
    s = json_searcher
    q = ast.Match("metadata_jsonb.details.author.description", "test author",
                  conjunction_mode=True)
    assert _row_ids(s, s.eval(q)) == [1]
    q = ast.Match("metadata_json.tags", "snippet missing",
                  conjunction_mode=False)
    assert _row_ids(s, s.eval(q)) == [1]


def test_json_vs_text_term_property():
    """Differential oracle: a JSON string leaf must match single-token
    term queries exactly like the same string indexed as a TEXT field
    (tantivy tokenizes JSON string values with the field analyzer)."""
    import json

    from hypothesis import given, settings, strategies as st

    words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
    docs = st.lists(st.lists(words, min_size=0, max_size=6), min_size=1,
                    max_size=12)

    @settings(max_examples=40, deadline=None)
    @given(docs=docs, q=words)
    def check(docs, q):
        texts = [" ".join(d) for d in docs]
        schema = IndexSchema.build(
            "id", body={"type": "text"}, meta={"type": "json"})
        t = pa.table({
            "id": pa.array(range(len(texts)), pa.int64()),
            "body": pa.array(texts),
            "meta": pa.array([json.dumps({"body": x}) for x in texts]),
        })
        s = Searcher(build_segment(t, schema), schema)
        a = _row_ids(s, s.eval(ast.Term("body", q)))
        b = _row_ids(s, s.eval(ast.Term("meta.body", q)))
        assert a == b, (texts, q)

    check()
