"""Query-string parser tests (tantivy ``query_grammar`` surface,
`pg_search/src/query/pdb_query.rs:1832-1928`): precedence, occur prefixes,
phrases with slop, fuzzy, boost, ranges, field scoping, IN sets."""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.query.parser import parse_query_string
from paradedb_ray.schema import documents_schema, mock_items_schema
from paradedb_ray.testing import mock_items_table


@pytest.fixture(scope="module")
def schema():
    return documents_schema()


def _p(s, schema, fields=("text",), conj=False, lenient=False):
    return parse_query_string(s, schema, list(fields), conj, lenient)


def test_bare_term(schema):
    q = _p("spark", schema)
    assert isinstance(q, ast.Term) and q.value == "spark"


def test_implicit_or_and_explicit_and(schema):
    q = _p("spark batch", schema)
    assert isinstance(q, ast.Boolean) and len(q.should) == 2
    q2 = _p("spark AND batch", schema)
    assert isinstance(q2, ast.Boolean) and len(q2.must) == 2


def test_and_binds_tighter_than_or(schema):
    q = _p("a OR b AND c", schema)
    assert isinstance(q, ast.Boolean)
    assert len(q.should) == 2
    inner = q.should[1]
    assert isinstance(inner, ast.Boolean) and len(inner.must) == 2


def test_not_and_minus(schema):
    for s in ("spark NOT batch", "spark -batch"):
        q = _p(s, schema)
        assert isinstance(q, ast.Boolean)
        assert len(q.must_not) == 1, s


def test_plus_occur(schema):
    q = _p("+spark batch", schema)
    assert isinstance(q, ast.Boolean)
    assert len(q.must) == 1 and len(q.should) == 1


def test_phrase_with_slop(schema):
    q = _p('"merge join"~2', schema)
    assert isinstance(q, (ast.Phrase, ast.TokenizedPhrase, ast.PhraseArray))
    assert q.slop == 2


def test_fuzzy_and_boost(schema):
    q = _p("sparc~1", schema)
    assert isinstance(q, ast.FuzzyTerm) and q.distance == 1
    q2 = _p("spark^2.5", schema)
    assert isinstance(q2, ast.Boost) and q2.factor == 2.5


def test_field_scoping(schema):
    q = _p("lang:en", schema)
    assert isinstance(q, ast.Term) and q.field == "lang" and q.value == "en"
    q2 = _p("lang:(en OR de)", schema)
    assert isinstance(q2, ast.Boolean)
    assert all(c.field == "lang" for c in q2.should)


def test_numeric_range(schema):
    q = _p("n_chars:[100 TO 300]", schema)
    assert isinstance(q, ast.Range)
    assert q.lower_bound.value == 100 and q.lower_bound.kind == "included"
    assert q.upper_bound.value == 300 and q.upper_bound.kind == "included"
    q2 = _p("n_chars:{100 TO *}", schema)
    assert q2.lower_bound.kind == "excluded"
    assert q2.upper_bound.kind == "unbounded"


def test_cmp_shorthand(schema):
    q = _p("n_chars:>=200", schema)
    assert isinstance(q, ast.Range)
    assert q.lower_bound.value == 200 and q.lower_bound.kind == "included"


def test_in_set(schema):
    q = _p("lang:IN [en de]", schema)
    assert isinstance(q, ast.TermSet)
    assert sorted(q.terms) == ["de", "en"]


def test_wildcard_prefix(schema):
    q = _p("spar*", schema)
    assert isinstance(q, ast.Regex) and q.pattern == "spar.*"
    q2 = _p("lang:e*", schema)
    assert isinstance(q2, ast.Regex) and q2.field == "lang"


def test_conjunction_mode(schema):
    q = _p("spark batch", schema, conj=True)
    assert isinstance(q, ast.Boolean) and len(q.must) == 2


def test_lenient_swallows_garbage(schema):
    q = _p("spark AND", schema, lenient=True)
    assert q is not None
    with pytest.raises(Exception):
        _p("n_chars:[1 TO", schema, lenient=False)


def test_end_to_end_on_mock_items():
    """Parsed query evaluates identically to the hand-built AST
    (regress `operators.sql` shape)."""
    schema = mock_items_schema()
    seg = build_segment(mock_items_table(), schema)
    s = Searcher(seg, schema)
    parsed = s.eval(ast.ParseWithField("description", "running shoes"))
    manual = s.eval(ast.Boolean(should=[
        ast.Term(field="description", value="running"),
        ast.Term(field="description", value="shoes")]))
    assert parsed.ids.tolist() == manual.ids.tolist()
    assert parsed.scores.tolist() == manual.scores.tolist()


def test_parse_datetime_terms():
    """Mirror of `parse.out` rows 4-8: quoted literals on date/timestamp/
    time fields are TYPED TERMS, not tokenized phrases — including the
    tz-suffixed timestamptz/timetz forms (naive columns store UTC)."""
    t = mock_items_table()
    schema = mock_items_schema()
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)

    def ids(qs):
        q = parse_query_string(qs, schema, ["description"], False, False)
        return sorted(t.column("id")[i].as_py() for i in s.eval(q).ids)

    assert ids('created_at:"2023-05-01 09:12:34"') == [1]
    assert ids('created_at:"2023-05-01 09:12:34+00"') == [1]
    assert ids('last_updated_date:"2023-05-03"') == [1, 5, 28]
    assert ids('latest_available_time:"09:12:34"') == [1]
    assert ids('latest_available_time:"09:12:34+00"') == [1]


def test_parse_conjunction_and_field_group():
    """Mirror of `parse.out` rows 1-3 (field-grouped parse, conjunction
    mode, lenient parse_with_field)."""
    t = mock_items_table()
    schema = mock_items_schema()
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)

    def ids(q):
        return sorted(t.column("id")[i].as_py() for i in s.eval(q).ids)

    from paradedb_ray.query import builders as pdb
    assert ids(pdb.parse(
        'description:(running shoes) AND category:footwear')) == [3, 4, 5]
    assert ids(pdb.parse(
        'description:(running shoes) AND category:footwear',
        conjunction_mode=True)) == [3]
    assert ids(pdb.parse_with_field(
        "description", "(running shoes)", lenient=True)) == [3, 4, 5]


def test_datetime_precision_terms():
    """Mirror of `tests/tests/datetime.rs`: microsecond-precision term /
    parse / range with ISO 'T'+'Z' literal forms; sub-precision literals
    match nothing on coarser columns (TIMESTAMP(3) semantics)."""
    import datetime as dt

    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import DATE, I64, IndexSchema

    def mk(typ, vals):
        t = pa.table({
            "id": pa.array(range(1, len(vals) + 1), pa.int64()),
            "t": pa.array([dt.datetime.fromisoformat(v) for v in vals],
                          typ)})
        schema = IndexSchema.build(
            key_field="id", id={"type": I64, "fast": True},
            t={"type": DATE, "fast": True})
        seg = build_segment(t, schema)
        return t, schema, Searcher(seg, schema)

    us = ['2025-01-28T18:19:14.079776', '2025-01-28T18:19:14.079777',
          '2025-01-28T18:19:14.079778']
    t, schema, s = mk(pa.timestamp("us"), us)

    def ids(q):
        return sorted(t.column("id")[i].as_py() for i in s.eval(q).ids)

    assert ids(pdb.term("t", "2025-01-28T18:19:14.079777Z")) == [2]
    q = parse_query_string('t:"2025-01-28T18:19:14.079777Z"',
                           schema, ["t"], False, False)
    assert ids(q) == [2]
    assert ids(pdb.range("t", lower="2025-01-28T18:19:14.079777Z",
                         lower_inclusive=False)) == [3]

    ms = ['2025-01-28T18:19:14.078', '2025-01-28T18:19:14.079',
          '2025-01-28T18:19:14.080']
    t, schema, s = mk(pa.timestamp("ms"), ms)
    assert ids(pdb.term("t", "2025-01-28T18:19:14.079Z")) == [2]
    assert ids(pdb.term("t", "2025-01-28T18:19:14.078001Z")) == []
    assert ids(pdb.term("t", "2025-01-28T18:19:14Z")) == []


def test_composite_multitoken_term_is_phrase():
    """`composite.out`: a bare parse term that the field tokenizer splits
    into several tokens ('PostgreSQL_Guide' -> postgresql, guide) becomes
    a tokenized PHRASE — adjacency required, order-sensitive."""
    import pyarrow as pa

    from paradedb_ray.index import Searcher, build_segment
    from paradedb_ray.query import ast
    from paradedb_ray.schema import IndexSchema

    schema = IndexSchema.build("id", title={"type": "text"},
                               body={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "title": pa.array(["PostgreSQL_Guide", "Search_Tutorial"]),
        "body": pa.array(["Learn_PostgreSQL_basics",
                          "Full_text_search_techniques"])})
    s = Searcher(build_segment(t, schema), schema)

    def ids(q):
        return sorted(t.column("id").to_numpy()[s.eval(q).ids].tolist())

    assert ids(ast.ParseWithField("title", "PostgreSQL_Guide")) == [1]
    assert ids(ast.ParseWithField("body",
                                  "Full_text_search_techniques")) == [2]
    # order matters: the reversed word pair matches nothing even though
    # both tokens exist in row 1's title/body
    assert ids(ast.ParseWithField("title", "Guide_PostgreSQL")) == []
