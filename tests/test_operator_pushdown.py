"""SQL comparison-operator pushdown builders
(`api/builder_fns/paradedb.rs:109-267`) and IS NULL / IS NOT NULL
(`is_null_pushdown.sql`): = / <> / ranges / = ANY / <> ALL with Postgres
NULL semantics."""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import IndexSchema


@pytest.fixture(scope="module")
def s():
    schema = IndexSchema.build(
        "id", rating={"type": "i64", "fast": True},
        deleted_at={"type": "date", "fast": True})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "rating": pa.array([1, 2, 3, 4, None], pa.int64()),
        "deleted_at": pa.array(
            [None, 1_000_000, None, 2_000_000, None], pa.timestamp("us")),
    })
    return Searcher(build_segment(t, schema), schema)


def _ids(s, hits):
    return sorted(s.seg.table.column("id").to_numpy()[hits.ids].tolist())


def test_is_null_is_not_null(s):
    # is_null_pushdown.sql: complementary counts, NULL rows only on IS NULL
    assert _ids(s, s.eval(pdb.is_not_null("deleted_at"))) == [2, 4]
    assert _ids(s, s.eval(pdb.is_null("deleted_at"))) == [1, 3, 5]


def test_term_with_operator_comparisons(s):
    assert _ids(s, s.eval(pdb.term_with_operator("rating", "=", 3))) == [3]
    # <> excludes NULL rows (Exists AND NOT term)
    assert _ids(s, s.eval(pdb.term_with_operator("rating", "<>", 3))) == [1, 2, 4]
    assert _ids(s, s.eval(pdb.term_with_operator("rating", ">", 2))) == [3, 4]
    assert _ids(s, s.eval(pdb.term_with_operator("rating", ">=", 2))) == [2, 3, 4]
    assert _ids(s, s.eval(pdb.term_with_operator("rating", "<", 2))) == [1]
    assert _ids(s, s.eval(pdb.term_with_operator("rating", "<=", 2))) == [1, 2]
    with pytest.raises(ValueError):
        pdb.term_with_operator("rating", "~", 2)


def test_terms_with_operator(s):
    # = ANY -> TermSet, NULL elements skipped
    q = pdb.terms_with_operator("rating", "=", [1, None, 3])
    assert _ids(s, s.eval(q)) == [1, 3]
    # <> ALL (NOT IN): Exists AND NOT each term
    q = pdb.terms_with_operator("rating", "<>", [1, 3], conjunction_mode=True)
    assert _ids(s, s.eval(q)) == [2, 4]
    # conjunction with a NULL element can never match -> Empty
    q = pdb.terms_with_operator("rating", "<>", [1, None],
                                conjunction_mode=True)
    assert _ids(s, s.eval(q)) == []
    # disjunction of ranges: rating < 2 OR rating > 3
    q = pdb.terms_with_operator("rating", ">", [3])
    assert _ids(s, s.eval(q)) == [4]


def test_schema_info_shape():
    """paradedb.schema() analogue: one row per field, reference column
    set, tantivy-style type names (tokenize-uuid.sql output shape)."""
    from paradedb_ray.index.verify import schema_info
    from paradedb_ray.schema import mock_items_schema

    t = schema_info(mock_items_schema())
    assert t.column_names == ["name", "field_type", "stored", "indexed",
                              "fast", "fieldnorms", "expand_dots",
                              "tokenizer", "record", "normalizer"]
    rows = {r["name"]: r for r in t.to_pylist()}
    assert rows["description"]["field_type"] == "Str"
    assert rows["description"]["record"] == "position"
    assert rows["rating"]["field_type"] == "I64"
    assert rows["metadata"]["field_type"] == "Json"
    assert rows["metadata"]["expand_dots"] is True
    assert rows["category"]["normalizer"] == "raw"
    assert rows["category"]["tokenizer"] == "keyword"
