"""Query builder functions — 1:1 with pg_search's ``paradedb.*`` / ``pdb.*``
SQL constructors (`/root/reference/pg_search/src/api/builder_fns/paradedb.rs:29-310`,
`pdb.rs:37-530`, `mlt.rs`, `proximity.rs`).  Each returns an AST node."""

from __future__ import annotations

from typing import Any, Optional, Sequence

from paradedb_ray.query import ast

__all__ = [
    "all_query", "empty", "boolean", "boost", "boost_cast", "const_score",
    "const_score_cast",
    "disjunction_max", "parse", "parse_with_field", "term", "term_set",
    "exists", "fuzzy_term", "match_query", "match_conjunction",
    "match_disjunction", "phrase", "phrase_string", "phrase_array",
    "phrase_prefix", "regex", "regex_phrase", "range", "range_term",
    "score_filter", "proximity", "more_like_this", "match_array",
]


def all_query() -> ast.Query:
    return ast.All()


def empty() -> ast.Query:
    return ast.Empty()


def boolean(must=None, should=None, must_not=None,
            minimum_should_match=None) -> ast.Query:
    return ast.Boolean(
        must=list(must or []), should=list(should or []),
        must_not=list(must_not or []),
        minimum_should_match=minimum_should_match,
    )


def boost(factor: float, query: ast.Query) -> ast.Query:
    return ast.Boost(query, factor)


def sql_not(query: ast.Query, array_fields=()) -> ast.Query:
    """SQL-level ``NOT (...)`` over a pushed-down predicate under
    three-valued logic (`qual_inspect.rs:280-432`, issue 5264): a strict
    predicate over a NULL field evaluates to NULL, so its negation must
    still EXCLUDE the NULL rows — plain complement-of-matches would
    wrongly include them.

    Mirrors ``negate_fielded_input`` exactly:

    - fielded predicate P(f) on an eligible SCALAR field -> must
      ``ConstScore(0, Exists(f))`` (scored 0 so rankings inside
      ``should`` don't shift) AND NOT P
    - ``Exists`` (incl. wrapped in Boost/ConstScore — existence is
      non-strict, the wrapper is unwrapped per
      ``negated_exists_returns_missing_rows``) -> the missing rows,
      never ``exists AND NOT exists``
    - array and JSON fields are NOT guarded (``'{}'::text[]`` /
      ``'{}'::jsonb`` are SQL NOT NULL yet index no values —
      ``field_supports_null_preserving_guard``); they fall back to the
      generic complement, the reference's documented trade-off.  Pass
      the index's array-typed field names via ``array_fields`` (our
      IndexSchema types arrays as their element type; array-ness lives
      in the Arrow column).
    - pure-AND / pure-OR booleans -> De Morgan with each clause negated
      by this same rule; mixed shapes -> generic complement
    """
    inner = query
    while isinstance(inner, (ast.Boost, ast.ConstScore)):
        inner = inner.query
    if isinstance(inner, ast.Exists):
        return ast.Boolean(must=[ast.All()],
                           must_not=[ast.Exists(inner.field)])
    if isinstance(inner, ast.Boolean) and not inner.must_not:
        if inner.must and not inner.should:
            return ast.Boolean(
                should=[sql_not(c, array_fields) for c in inner.must])
        if inner.should and not inner.must \
                and not inner.minimum_should_match:
            return ast.Boolean(
                must=[sql_not(c, array_fields) for c in inner.should])
    field = getattr(inner, "field", None)
    if isinstance(field, str) and "." not in field \
            and field not in array_fields:
        guard = ast.ConstScore(ast.Exists(field), 0.0)
        return ast.Boolean(must=[guard], must_not=[inner])
    # array/JSON-path/non-fielded predicate: complement of matches
    return ast.Boolean(must=[ast.All()], must_not=[query])


def const_score(score: float, query: ast.Query) -> ast.Query:
    return ast.ConstScore(query, score)


def _f16_typmod(val: float) -> float:
    """The ``::pdb.boost(x)`` / ``::pdb.const_score(x)`` CAST surface
    smuggles its factor through a Postgres typmod: f32 -> half::f16 bits
    -> i32 (`pg_search/src/api/operator.rs:1221-1264`), so cast-applied
    factors quantize to f16 and only finite values in [-2048, 2048] are
    accepted (`boost.out`: 3.14159 renders as 3.140625).  The builder
    FUNCTION surface (``paradedb.boost``) keeps full f32."""
    import math

    if not (isinstance(val, (int, float)) and math.isfinite(val)
            and -2048.0 <= float(val) <= 2048.0):
        raise ValueError(
            "only 16 bit floats in the range [-2048..2048] are supported")
    import numpy as np

    return float(np.float32(np.float16(val)))


def boost_cast(factor: float, query: ast.Query) -> ast.Query:
    """``query_string::pdb.boost(factor)`` (`api/operator/boost.rs`)."""
    return ast.Boost(query, _f16_typmod(factor))


def const_score_cast(score: float, query: ast.Query) -> ast.Query:
    """``query_string::pdb.const_score(s)`` (`api/operator/const_score.rs`)."""
    return ast.ConstScore(query, _f16_typmod(score))


def disjunction_max(disjuncts: Sequence[ast.Query],
                    tie_breaker: Optional[float] = None) -> ast.Query:
    return ast.DisjunctionMax(list(disjuncts), tie_breaker)


def parse(query_string: str, lenient: Optional[bool] = None,
          conjunction_mode: Optional[bool] = None) -> ast.Query:
    return ast.Parse(query_string, lenient, conjunction_mode)


def parse_with_field(field: str, query_string: str,
                     lenient: Optional[bool] = None,
                     conjunction_mode: Optional[bool] = None) -> ast.Query:
    return ast.ParseWithField(field, query_string, lenient, conjunction_mode)


def term(field: str, value: Any) -> ast.Query:
    return ast.Term(field, value)


def term_set(terms: Sequence) -> ast.Query:
    """``paradedb.term_set(ARRAY[paradedb.term(...), ...])`` — accepts
    (field, value) pairs or Term nodes."""
    pairs = []
    for t in terms:
        if isinstance(t, ast.Term):
            pairs.append((t.field, t.value))
        else:
            f, v = t
            pairs.append((f, v))
    return ast.TermSetMulti(pairs)


def exists(field: str) -> ast.Query:
    return ast.Exists(field)


def fuzzy_term(field: str, value: str, distance: int = 2,
               transposition_cost_one: bool = True,
               prefix: bool = False) -> ast.Query:
    return ast.FuzzyTerm(field, value, distance, transposition_cost_one, prefix)


def match_query(field: str, value: str, tokenizer: Optional[dict] = None,
                distance: int = 0, transposition_cost_one: bool = True,
                prefix: bool = False, conjunction_mode: bool = False) -> ast.Query:
    return ast.Match(field, value, tokenizer, distance, transposition_cost_one,
                     prefix, conjunction_mode)


def match_conjunction(field: str, value: str, **kw) -> ast.Query:
    """``field &&& 'text'`` (`api/operator/andandand.rs`)."""
    return match_query(field, value, conjunction_mode=True, **kw)


def match_disjunction(field: str, value: str, **kw) -> ast.Query:
    """``field ||| 'text'`` (`api/operator/ororor.rs`)."""
    return match_query(field, value, conjunction_mode=False, **kw)


def phrase(field: str, phrases: Sequence[str], slop: int = 0) -> ast.Query:
    return ast.Phrase(field, list(phrases), slop)


def phrase_string(field: str, value: str, slop: int = 0) -> ast.Query:
    """``field ### 'text'`` (`api/operator/hashhashhash.rs`,
    `api/builder_fns/pdb.rs:97-99`)."""
    return ast.TokenizedPhrase(field, value, slop)


def phrase_array(field: str, tokens: Sequence[str], slop: int = 0) -> ast.Query:
    return ast.PhraseArray(field, list(tokens), slop)


def phrase_prefix(field: str, phrases: Sequence[str],
                  max_expansions: int = 50) -> ast.Query:
    return ast.PhrasePrefix(field, list(phrases), max_expansions)


def regex(field: str, pattern: str) -> ast.Query:
    return ast.Regex(field, pattern)


def regex_phrase(field: str, regexes: Sequence[str], slop: int = 0,
                 max_expansions: int = 50) -> ast.Query:
    return ast.RegexPhrase(field, list(regexes), slop, max_expansions)


def range(field: str, lower=None, upper=None,
          lower_inclusive: bool = True, upper_inclusive: bool = False) -> ast.Query:
    lb = ast.Bound.unbounded() if lower is None else (
        ast.Bound.included(lower) if lower_inclusive else ast.Bound.excluded(lower))
    ub = ast.Bound.unbounded() if upper is None else (
        ast.Bound.included(upper) if upper_inclusive else ast.Bound.excluded(upper))
    return ast.Range(field, lb, ub)


def range_contains(field: str, lower=None, upper=None,
                   lower_inclusive: bool = True,
                   upper_inclusive: bool = False) -> ast.Query:
    """``range_field @> [lower, upper)`` (`api/builder_fns` range_contains)."""
    return ast.RangeContains(field, _bound(lower, lower_inclusive),
                             _bound(upper, upper_inclusive))


def range_intersects(field: str, lower=None, upper=None,
                     lower_inclusive: bool = True,
                     upper_inclusive: bool = False) -> ast.Query:
    return ast.RangeIntersects(field, _bound(lower, lower_inclusive),
                               _bound(upper, upper_inclusive))


def range_within(field: str, lower=None, upper=None,
                 lower_inclusive: bool = True,
                 upper_inclusive: bool = False) -> ast.Query:
    return ast.RangeWithin(field, _bound(lower, lower_inclusive),
                           _bound(upper, upper_inclusive))


def _bound(v, inclusive: bool) -> ast.Bound:
    if v is None:
        return ast.Bound.unbounded()
    return ast.Bound.included(v) if inclusive else ast.Bound.excluded(v)


def range_term(field: str, value: Any) -> ast.Query:
    return ast.RangeTerm(field, value)


def score_filter(bounds: Sequence, query: ast.Query) -> ast.Query:
    return ast.ScoreFilter([tuple(b) for b in bounds], query)


def proximity(field: str, left, distance: int, right,
              ordered: bool = False) -> ast.Query:
    """``field ##> prox_clause`` (`api/builder_fns/proximity.rs:32-146`)."""
    return ast.Proximity(field, left, distance, right, ordered)


def prox_clause(left, distance: int, right) -> ast.ProximityClause:
    """Nested proximity group (``pdb.prox_clause``)."""
    return ast.ProximityClause(left, distance, right)


def prox_array(*alternatives) -> list:
    """Alternatives for one proximity slot (``pdb.prox_array``)."""
    return list(alternatives)


def prox_regex(pattern: str) -> str:
    """Regex proximity slot (``pdb.prox_regex``); encoded as ``/pat/``."""
    return f"/{pattern}/"


def more_like_this(**kw) -> ast.Query:
    return ast.MoreLikeThis(**kw)


def match_array(field: str, tokens, **kw) -> ast.Query:
    """Pre-split Match (`pdb.match` with a token array,
    `pdb_query.rs:222-228`)."""
    return ast.MatchArray(field, list(tokens), **kw)


def is_not_null(field: str) -> ast.Query:
    """``field IS NOT NULL`` pushdown -> Exists (`is_null_pushdown.sql`)."""
    return ast.Exists(field)


def is_null(field: str) -> ast.Query:
    """``field IS NULL`` pushdown -> must_not Exists
    (`is_null_pushdown.sql`: "pushed to the index as NOT EXISTS")."""
    return ast.Boolean(must=[ast.All()], must_not=[ast.Exists(field)])


def boolean_is(field: str, value: bool, negated: bool = False) -> ast.Query:
    """``bool_field IS [NOT] TRUE/FALSE`` pushdown
    (`qual_inspect.rs:84-110` PushdownVarIsTrue/IsFalse +
    `pushdown.rs::test_boolean_operators_with_null_values`): ``IS x``
    matches only the x rows (NULL is not TRUE and not FALSE), while the
    negation ``IS NOT x`` INCLUDES the NULL rows — unlike ``NOT (field
    = x)``, whose equality guard keeps NULLs excluded (``sql_not``)."""
    if not negated:
        return ast.Term(field, bool(value))
    return ast.Boolean(must=[ast.All()],
                       must_not=[ast.Term(field, bool(value))])


def term_with_operator(field: str, operator: str, value) -> ast.Query:
    """``paradedb.term_with_operator(field, op, value)`` — the planner's
    comparison pushdown (`api/builder_fns/paradedb.rs:109-165`): ``=`` ->
    Term, ``<>`` -> Exists AND NOT Term (NULL rows never match), and the
    four inequalities -> half-open ranges."""
    op = operator.strip()
    if op == "=":
        return ast.Term(field, value)
    if op == "<>":
        return ast.Boolean(must=[ast.Exists(field)],
                           must_not=[ast.Term(field, value)])
    if op == ">":
        return range(field, lower=value, lower_inclusive=False)
    if op == ">=":
        return range(field, lower=value, lower_inclusive=True)
    if op == "<":
        return range(field, upper=value, upper_inclusive=False)
    if op == "<=":
        return range(field, upper=value, upper_inclusive=True)
    raise ValueError(f"unsupported operator: {op}")


def terms_with_operator(field: str, operator: str, values,
                        conjunction_mode: bool = False) -> ast.Query:
    """``paradedb.terms_with_operator(field, op, ARRAY[...], conj)`` —
    ``= ANY`` / ``IN`` / ``<> ALL`` pushdown
    (`api/builder_fns/paradedb.rs:181-267`): the ``= ANY`` disjunction
    optimizes to a TermSet with NULL elements skipped; any other form
    builds a Boolean of per-element quals; a conjunction containing a
    NULL element can never match -> Empty."""
    values = list(values)
    if not conjunction_mode and operator.strip() == "=":
        return ast.TermSet(field, [v for v in values if v is not None])
    if conjunction_mode and any(v is None for v in values):
        return ast.Empty()
    quals = [term_with_operator(field, operator, v)
             for v in values if v is not None]
    if conjunction_mode:
        return ast.Boolean(must=quals)
    return ast.Boolean(should=quals)
