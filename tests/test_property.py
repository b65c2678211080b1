"""Property-based differential tests — the analogue of the reference's
query-generator oracle suite (`tests/src/fixtures/querygen/*`,
SURVEY §5.3): random documents + random query ASTs, engine result compared
against a brute-force Python oracle over the same tokens.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.schema import documents_schema

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
    min_size=1, max_size=40)


def leaf_strategy():
    term = st.sampled_from(VOCAB).map(lambda t: ast.Term(field="text", value=t))
    term_set = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3).map(
        lambda ts: ast.TermSet(field="text", terms=list(ts)))
    phrase = st.lists(st.sampled_from(VOCAB), min_size=2, max_size=3).map(
        lambda ts: ast.PhraseArray(field="text", tokens=list(ts), slop=0))
    return st.one_of(term, term_set, phrase)


def query_strategy(depth=2):
    if depth == 0:
        return leaf_strategy()
    sub = query_strategy(depth - 1)
    boolean = st.tuples(
        st.lists(sub, max_size=2), st.lists(sub, max_size=2),
        st.lists(sub, max_size=1),
    ).map(lambda t: ast.Boolean(must=list(t[0]), should=list(t[1]),
                                must_not=list(t[2])))
    return st.one_of(leaf_strategy(), boolean)


def brute(q: ast.Query, toks: list) -> bool:
    """Does a doc with tokens ``toks`` match ``q``? (Lucene semantics:
    a Boolean with no must matches when any should matches; must_not is a
    filter; empty boolean matches nothing.)"""
    if isinstance(q, ast.Term):
        return q.value in toks
    if isinstance(q, ast.TermSet):
        return any(t in toks for t in q.terms)
    if isinstance(q, ast.PhraseArray):
        k = len(q.tokens)
        return any(toks[i:i + k] == list(q.tokens)
                   for i in range(len(toks) - k + 1))
    if isinstance(q, ast.Boolean):
        if q.must_not and any(brute(c, toks) for c in q.must_not):
            return False
        if q.must:
            return all(brute(c, toks) for c in q.must)
        if q.should:
            return any(brute(c, toks) for c in q.should)
        return False
    raise TypeError(type(q))


def _table(docs):
    texts = [" ".join(d) if d else None for d in docs]
    return pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(docs)),
        "source": pa.array(["s"] * len(docs)),
        "n_chars": pa.array([len(t or "") for t in texts], pa.int64()),
    })


@settings(max_examples=120, deadline=None)
@given(docs=docs_strategy, q=query_strategy())
def test_engine_matches_brute_force(docs, q):
    schema = documents_schema()
    seg = build_segment(_table(docs), schema)
    s = Searcher(seg, schema)
    hits = s.eval(q)
    got = set(hits.ids.tolist())
    want = {i for i, d in enumerate(docs) if brute(q, d)}
    assert got == want, (q.to_json(), docs)


@settings(max_examples=60, deadline=None)
@given(docs=docs_strategy,
       terms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3,
                      unique=True))
def test_scores_invariant_to_block_split(docs, terms):
    """Scoring with searcher-global stats must give the same scores no
    matter how the corpus is split into blocks (the distributed-scoring
    invariant behind the stats-exchange design)."""
    from paradedb_ray.index.searcher import GlobalStats

    schema = documents_schema()
    t = _table(docs)
    q = ast.Boolean(should=[ast.Term(field="text", value=x) for x in terms])

    whole = build_segment(t, schema)
    stats = GlobalStats.from_segment(whole, schema)
    ref = {}
    h = Searcher(whole, schema, stats).eval(q)
    for i, sc in zip(h.ids.tolist(), h.scores.tolist()):
        ref[i] = sc

    cut = max(1, len(docs) // 2)
    got = {}
    for part, off in ((t.slice(0, cut), 0), (t.slice(cut), cut)):
        if part.num_rows == 0:
            continue
        seg = build_segment(part, schema)
        hh = Searcher(seg, schema, stats).eval(q)
        for i, sc in zip(hh.ids.tolist(), hh.scores.tolist()):
            got[i + off] = sc
    assert set(got) == set(ref)
    for k in ref:
        assert np.float32(got[k]) == np.float32(ref[k])


@settings(max_examples=60, deadline=None)
@given(q=query_strategy())
def test_ast_json_roundtrip(q):
    j = q.to_json()
    q2 = ast.from_json(j)
    assert q2.to_json() == j
