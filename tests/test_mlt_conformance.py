"""MoreLikeThis conformance against the reference's regress goldens
(`pg_search/tests/pg_regress/sql/more_like_this.sql` /
`expected/more_like_this.out`): full parameter set — field scoping,
min/max doc frequency, min term frequency, word-length bounds, stopwords,
max_query_terms truncation order, numeric fields, JSON rejection,
missing exemplar."""

import pyarrow as pa
import pytest

import ray.data

from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import I64, JSON, TEXT, IndexSchema


def _mlt_schema():
    return IndexSchema.build(
        key_field="id",
        id={"type": I64, "fast": True},
        text_field_a={"type": TEXT},
        text_field_b={"type": TEXT},
        numeric_field={"type": I64, "fast": True},
        json_field={"type": JSON},
    )


@pytest.fixture(scope="module")
def mlt_tbl():
    return pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "text_field_a": pa.array(["aaa bbb ccc", "aaa aaa",
                                  "ddd eee fff", "aaa aaa"]),
        "text_field_b": pa.array(["foo bar", "baz baz",
                                  "foo foo foo", "baz baz"]),
        "numeric_field": pa.array([1, 1, 2, 3], pa.int64()),
        "json_field": pa.array(['{"color": "aaa bbb ccc"}',
                                '{"color": "aaa aaa"}',
                                '{"color": "ddd eee fff"}',
                                '{"color": "aaa aaa"}']),
    })


def _run(mlt_tbl, **kw):
    from paradedb_ray.pipelines.search import search

    ds = ray.data.from_arrow(mlt_tbl)
    out = search(ds, _mlt_schema(), pdb.more_like_this(**kw),
                 with_score=False, output_columns=["id"]).to_pandas()
    # Ray quirk: an all-empty result can drop the schema
    return set(out["id"]) if "id" in out.columns else set()


# each case is (kwargs, expected id set) straight from more_like_this.out
_CASES = [
    (dict(key_value=1), {1, 2, 3, 4}),
    (dict(key_value=1, fields=["text_field_a"]), {1, 2, 4}),
    (dict(key_value=1, fields=["text_field_b"]), {1, 3}),
    (dict(key_value=1, fields=["numeric_field"]), {1, 2}),
    (dict(key_value=2, min_term_frequency=2), {1, 2, 4}),
    (dict(key_value=2, min_term_frequency=3), set()),
    (dict(key_value=1, min_doc_frequency=2), {1, 2, 3, 4}),
    (dict(key_value=1, min_doc_frequency=3), {1, 2, 4}),
    (dict(key_value=1, fields=["text_field_a"], max_doc_frequency=2), {1}),
    (dict(key_value=1, fields=["text_field_a"], max_doc_frequency=3),
     {1, 2, 4}),
    (dict(key_value=1, fields=["text_field_a"], max_word_length=2), set()),
    (dict(key_value=1, fields=["text_field_a"], max_word_length=3),
     {1, 2, 4}),
    (dict(key_value=1, fields=["text_field_a"], stop_words=["aaa"]), {1}),
    # max_query_terms truncates in Term order (aaa, bbb) -> {1,2,4}; a
    # tf-idf top-k would keep the rarer (bbb, ccc) and return only {1}
    (dict(key_value=1, fields=["text_field_a"], max_query_terms=2),
     {1, 2, 4}),
    (dict(key_value=100), set()),  # exemplar does not exist
]


@pytest.mark.parametrize("kw,want", _CASES)
def test_mlt_regress_golden(ray_session, mlt_tbl, kw, want):
    assert _run(mlt_tbl, **kw) == want


def test_mlt_json_field_rejected(ray_session, mlt_tbl):
    with pytest.raises(ValueError, match="json fields are not supported"):
        _run(mlt_tbl, key_value=1, fields=["json_field"])
