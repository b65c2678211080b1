"""Mirror of `tests/tests/query_edge_cases.rs` (issue 5264): SQL-level
NOT over pushed-down predicates preserves three-valued NULL semantics —
`builders.sql_not`."""

import pyarrow as pa

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import I64, KEYWORD, TEXT, IndexSchema


def _searcher(table, **fields):
    schema = IndexSchema.build(key_field="id",
                               id={"type": I64, "fast": True}, **fields)
    seg = build_segment(table, schema)
    return seg, Searcher(seg, schema)


def _ids(seg, hits):
    return sorted(seg.table.column("id")[i].as_py() for i in hits.ids)


def test_unary_not_over_text_array():
    """`unary_not_issue2141`: NOT over a text[] field (generic
    complement — arrays are not guard-eligible)."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "value": pa.array([["beer", "cheese"], ["beer", "wine"],
                           ["beer"], ["beer"]],
                          pa.list_(pa.string()))})
    seg, s = _searcher(t, value={"type": TEXT})
    arr = ("value",)

    assert len(_ids(seg, s.eval(pdb.term("value", "beer")))) == 4
    assert _ids(seg, s.eval(pdb.sql_not(pdb.term("value", "beer"),
                                        arr))) == []
    assert _ids(seg, s.eval(pdb.sql_not(pdb.term("value", "wine"),
                                        arr))) == [1, 3, 4]
    # wine AND NOT cheese
    q = pdb.boolean(must=[pdb.term("value", "wine"),
                          pdb.sql_not(pdb.term("value", "cheese"), arr)])
    assert _ids(seg, s.eval(q)) == [2]
    # NOT wine OR NOT missing
    q = pdb.boolean(should=[pdb.sql_not(pdb.term("value", "wine"), arr),
                            pdb.sql_not(pdb.term("value", "missing"), arr)])
    assert _ids(seg, s.eval(q)) == [1, 2, 3, 4]
    # NOT wine AND NOT cheese
    q = pdb.boolean(must=[pdb.sql_not(pdb.term("value", "wine"), arr),
                          pdb.sql_not(pdb.term("value", "cheese"), arr)])
    assert _ids(seg, s.eval(q)) == [3, 4]


def test_not_excludes_null_rows():
    """`not_operator_preserves_null_semantics`: NOT (color @@@ 'blue')
    must EXCLUDE the NULL row like Postgres `NOT (color = 'blue')`."""
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "color": pa.array(["blue", "red", None])})
    seg, s = _searcher(
        t, color={"type": KEYWORD, "tokenizer": {"type": "keyword"},
                  "fast": True})
    assert _ids(seg, s.eval(pdb.sql_not(pdb.term("color", "blue")))) == [2]


def test_negated_boolean_composition():
    """`negated_boolean_composition_preserves_null_semantics`: De Morgan
    with per-clause guards — NULL AND false = false, so a row NULL in
    one clause can still match the negated AND."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "color": pa.array(["blue", "red", None, "red", None]),
        "shape": pa.array(["square", "square", "square",
                           "circle", "circle"])})
    kw = {"type": KEYWORD, "tokenizer": {"type": "keyword"}, "fast": True}
    seg, s = _searcher(t, color=dict(kw), shape=dict(kw))

    q_and = pdb.sql_not(pdb.boolean(must=[pdb.term("color", "blue"),
                                          pdb.term("shape", "square")]))
    assert _ids(seg, s.eval(q_and)) == [2, 4, 5]

    q_or = pdb.sql_not(pdb.boolean(should=[pdb.term("color", "blue"),
                                           pdb.term("shape", "square")]))
    assert _ids(seg, s.eval(q_or)) == [4]


def test_not_numeric_predicate():
    """`bitmap_index_scan_preserves_null_semantics`: NOT (quantity @@@
    '7') over (7, 8, NULL) matches only the 8 row."""
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "quantity": pa.array([7, 8, None], pa.int64())})
    seg, s = _searcher(t, quantity={"type": I64, "fast": True})
    assert _ids(seg, s.eval(pdb.sql_not(pdb.term("quantity", 7)))) == [2]


def test_negated_exists_returns_missing_rows():
    """`negated_exists_returns_missing_rows`: NOT exists must return the
    missing rows (never `exists AND NOT exists`), including through
    Boost/ConstScore wrappers."""
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "color": pa.array(["blue", None, "red", None])})
    seg, s = _searcher(
        t, color={"type": KEYWORD, "tokenizer": {"type": "keyword"},
                  "fast": True})
    assert _ids(seg, s.eval(pdb.exists("color"))) == [1, 3]
    assert _ids(seg, s.eval(pdb.sql_not(pdb.exists("color")))) == [2, 4]
    assert _ids(seg, s.eval(pdb.sql_not(
        pdb.boost(2.0, pdb.exists("color"))))) == [2, 4]
    assert _ids(seg, s.eval(pdb.sql_not(
        pdb.const_score(1.0, pdb.exists("color"))))) == [2, 4]


def test_negated_predicate_empty_array_not_null():
    """`negated_predicate_preserves_empty_array_not_null`: '{}'::text[]
    is SQL NOT NULL; the guard must not treat it as NULL — array fields
    use the generic complement, so the empty-array row matches the
    negation and the matching row does not."""
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "tags": pa.array([["beer"], [], None], pa.list_(pa.string()))})
    seg, s = _searcher(
        t, tags={"type": TEXT, "tokenizer": {"type": "keyword"},
                 "fast": True})
    got = _ids(seg, s.eval(pdb.sql_not(pdb.term("tags", "beer"),
                                       ("tags",))))
    assert 2 in got and 1 not in got


def test_boolean_is_operators_with_nulls():
    """`pushdown.rs::test_boolean_operators_with_null_values`: IS TRUE /
    IS FALSE exclude NULLs; IS NOT TRUE / IS NOT FALSE INCLUDE NULLs;
    = TRUE/FALSE and their sql_not negations always exclude NULLs."""
    from paradedb_ray.schema import BOOL

    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "bool_field": pa.array([True, False, None], pa.bool_())})
    seg, s = _searcher(t, bool_field={"type": BOOL, "fast": True})

    assert _ids(seg, s.eval(pdb.boolean_is("bool_field", True))) == [1]
    assert _ids(seg, s.eval(pdb.boolean_is("bool_field", False))) == [2]
    assert _ids(seg, s.eval(
        pdb.boolean_is("bool_field", True, negated=True))) == [2, 3]
    assert _ids(seg, s.eval(
        pdb.boolean_is("bool_field", False, negated=True))) == [1, 3]
    # equality forms: NULL excluded in both directions
    assert _ids(seg, s.eval(pdb.term("bool_field", True))) == [1]
    assert _ids(seg, s.eval(
        pdb.sql_not(pdb.term("bool_field", True)))) == [2]
    assert _ids(seg, s.eval(
        pdb.sql_not(pdb.term("bool_field", False)))) == [1]
