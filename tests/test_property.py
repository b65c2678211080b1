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


# -- round-2 property tests: postings merge and session windows --------------


@given(docs=docs_strategy,
       splits=st.lists(st.integers(1, 10), min_size=1, max_size=4),
       keep_seed=st.integers(0, 2**31 - 1),
       data=st.data())
@settings(max_examples=40, deadline=None)
def test_merge_segments_equals_rebuild_property(docs, splits, keep_seed,
                                                data):
    """merge_segments(segs, keeps) is BIT-IDENTICAL to build_segment over
    the concatenated kept rows, for arbitrary splits and keep masks."""
    from paradedb_ray.index.segment import merge_segments

    schema = documents_schema()
    texts = [" ".join(d) if d else None for d in docs]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(texts),
                  "lang": pa.array(["en"] * len(docs)),
                  "source": pa.array(["s"] * len(docs)),
                  "n_chars": pa.array([len(x or "") for x in texts],
                                      pa.int64())})
    # random contiguous split into <=4 parts
    bounds = [0]
    for s in splits:
        bounds.append(min(len(docs), bounds[-1] + s))
    bounds.append(len(docs))
    parts = [t.slice(a, b - a) for a, b in zip(bounds, bounds[1:])
             if b > a]
    if not parts:
        parts = [t]
    rng = np.random.RandomState(keep_seed % (2**31))
    keeps = [rng.rand(p.num_rows) > 0.3 for p in parts]
    segs = [build_segment(p, schema) for p in parts]
    merged = merge_segments(segs, schema, list(keeps))
    ref_tbl = pa.concat_tables(
        [p.filter(pa.array(k)) for p, k in zip(parts, keeps)]
    ).combine_chunks()
    ref = build_segment(ref_tbl, schema)
    assert merged.num_docs == ref.num_docs
    assert merged.table.equals(ref.table)
    a, b = merged.text.get("text"), ref.text.get("text")
    if b is None:
        assert a is None or a.doc_count == 0
        return
    assert list(a.vocab) == list(b.vocab)
    for attr in ("term_offsets", "g_doc", "g_tf", "g_pos_off", "pos_flat",
                 "fieldnorm_ids", "has_value"):
        assert np.array_equal(getattr(a, attr), getattr(b, attr)), attr
    assert (a.total_tokens, a.doc_count) == (b.total_tokens, b.doc_count)


@given(ts=st.lists(st.integers(0, 500), min_size=1, max_size=60,
                   unique=True),
       gap=st.integers(1, 40))
@settings(max_examples=60, deadline=None)
def test_session_interval_merge_matches_gap_scan(ts, gap):
    """The store's incremental interval merge equals the batch gap-scan
    definition of sessions for any arrival order."""
    # incremental merge, arrival order = given order
    sessions = []  # [start, end, n]

    def add(t):
        joined = None
        for s in sessions:
            if s[0] - gap <= t <= s[1] + gap:
                joined = s
                break
        if joined is None:
            sessions.append([t, t, 1])
            sessions.sort(key=lambda s: s[0])
            return
        joined[0] = min(joined[0], t)
        joined[1] = max(joined[1], t)
        joined[2] += 1
        sessions.sort(key=lambda s: s[0])
        i = sessions.index(joined)
        while i + 1 < len(sessions) and sessions[i + 1][0] - gap <= joined[1]:
            nxt = sessions.pop(i + 1)
            joined[1] = max(joined[1], nxt[1])
            joined[2] += nxt[2]
        while i > 0 and sessions[i - 1][1] + gap >= joined[0]:
            prv = sessions.pop(i - 1)
            i -= 1
            joined[0] = min(joined[0], prv[0])
            joined[2] += prv[2]

    for t in ts:
        add(t)
    # batch definition: sort, break where diff > gap
    srt = sorted(ts)
    ref = []
    cur = [srt[0], srt[0], 1]
    for t in srt[1:]:
        if t - cur[1] > gap:
            ref.append(cur)
            cur = [t, t, 1]
        else:
            cur[1] = t
            cur[2] += 1
    ref.append(cur)
    assert sessions == ref


@given(n=st.integers(1, 60), dim=st.integers(1, 8), k=st.integers(1, 10),
       metric_i=st.integers(0, 2), seed=st.integers(0, 2**31 - 1),
       with_nulls=st.booleans())
@settings(max_examples=60, deadline=None)
def test_searcher_knn_matches_numpy(n, dim, k, metric_i, seed, with_nulls):
    """Searcher.knn == brute-force numpy under every pgvector metric,
    with random null rows and exact (distance, id) tie-breaks."""
    metric, op = [("l2", "<->"), ("cosine", "<=>"), ("ip", "<#>")][metric_i]
    rng = np.random.RandomState(seed % (2**31))
    mat = rng.randn(n, dim).astype(np.float32)
    null_mask = (rng.rand(n) < 0.2) if with_nulls else np.zeros(n, bool)
    vecs = [None if null_mask[i] else mat[i].tolist() for i in range(n)]
    t = pa.table({"id": pa.array(range(n), pa.int64()),
                  "v": pa.array(vecs, pa.list_(pa.float32()))})
    from paradedb_ray.schema import IndexSchema

    schema = IndexSchema.build(
        "id", v={"type": "vector", "dim": dim, "metric": metric})
    s = Searcher(build_segment(t, schema), schema)
    q = rng.randn(dim).astype(np.float32)
    ids, dist = s.knn("v", q, op, k)
    # numpy oracle
    valid = np.flatnonzero(~null_mask)
    if len(valid) == 0:
        assert len(ids) == 0
        return
    sub = mat[valid].astype(np.float64)
    qq = q.astype(np.float64)
    if metric == "l2":
        d = np.sqrt(((sub - qq) ** 2).sum(1))
    elif metric == "cosine":
        den = np.linalg.norm(sub, axis=1) * np.linalg.norm(qq)
        with np.errstate(invalid="ignore", divide="ignore"):
            d = 1.0 - np.where(den > 0, sub @ qq / den, 0.0)
    else:
        d = -(sub @ qq)
    order = np.lexsort((valid, d))[:k]
    assert ids.tolist() == valid[order].tolist()
    # the engine's einsum and this oracle's (a-b)^2 sum can differ by an
    # ULP; ordering is the contract, values agree to float64 precision
    assert np.allclose(dist, d[order], rtol=1e-12, atol=1e-12)


_fuzzy_alphabet = st.sampled_from(list("abcdeé"))
_fuzzy_word = st.text(alphabet=_fuzzy_alphabet, min_size=0, max_size=8)


@given(
    query=_fuzzy_word,
    terms=st.lists(_fuzzy_word, min_size=0, max_size=40),
    dist=st.integers(min_value=0, max_value=2),
    transp=st.booleans(),
)
@settings(max_examples=300, deadline=None)
def test_fuzzy_mask_matches_scalar_dp(query, terms, dist, transp):
    """Vectorized banded Levenshtein == the per-term scalar DP."""
    from paradedb_ray.index.searcher import _fuzzy_match_mask, _lev

    got = _fuzzy_match_mask(query, terms, dist, transp, prefix=False)
    want = np.array([_lev(query, t, dist, transp) <= dist for t in terms],
                    dtype=bool)
    assert got.tolist() == want.tolist()


@given(
    query=_fuzzy_word.filter(lambda w: len(w) > 0),
    terms=st.lists(_fuzzy_word, min_size=0, max_size=30),
    dist=st.integers(min_value=0, max_value=2),
    transp=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_fuzzy_prefix_mask_matches_bruteforce(query, terms, dist, transp):
    """Prefix mode == 'some prefix of the term is within distance d'
    (the tantivy prefix-DFA semantics)."""
    from paradedb_ray.index.searcher import _fuzzy_match_mask, _lev

    got = _fuzzy_match_mask(query, terms, dist, transp, prefix=True)
    want = np.array(
        [any(_lev(query, t[:j], dist, transp) <= dist
             for j in range(len(t) + 1)) for t in terms],
        dtype=bool)
    assert got.tolist() == want.tolist()


@given(
    docs=docs_strategy,
    phrase=st.lists(st.sampled_from(VOCAB), min_size=2, max_size=4),
    slop=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=150, deadline=None)
def test_sloppy_phrase_matches_scalar_oracle(docs, phrase, slop):
    """Vectorized spread-window phrase (slop>0) == the per-doc
    `_phrase_freq` greedy oracle, doc set AND tf values."""
    from paradedb_ray.index.searcher import (
        _phrase_freq, _sloppy_phrase_tfs)

    schema = documents_schema()
    seg = build_segment(_table(docs), schema)
    ti = seg.text.get("text")
    if ti is None:
        return
    codes = [ti.term_code(t) for t in phrase]
    if any(c < 0 for c in codes):
        return
    cand = np.arange(len(docs), dtype=np.int64)
    got_docs, got_tf = _sloppy_phrase_tfs(
        ti, cand, [[c] for c in codes], slop)
    want = {}
    for doc in range(len(docs)):
        plists = []
        ok = True
        for c in codes:
            docs_c, _, (s, e) = ti.postings(c)
            j = int(np.searchsorted(docs_c, doc))
            if j >= len(docs_c) or docs_c[j] != doc:
                ok = False
                break
            plists.append(ti.positions(s + j))
        if not ok:
            continue
        tf = _phrase_freq(plists, slop)
        if tf > 0:
            want[doc] = tf
    if got_docs is None:
        assert want == {}
    else:
        assert dict(zip(got_docs.tolist(), got_tf.tolist())) == want


@settings(max_examples=80, deadline=None)
@given(docs=docs_strategy, q=query_strategy(),
       cut_frac=st.floats(min_value=0.0, max_value=1.0))
def test_single_scan_packets_match_classic(docs, q, cut_frac):
    """The single-scan packet route (vocab-filtered mini-segments +
    merged partial stats) must reproduce the classic full-segment route
    bit-exactly: same global stats for every requested term, same doc
    set, same f32 scores — for any eligible query and any block split."""
    from paradedb_ray.index.searcher import GlobalStats
    from paradedb_ray.stages.search_stages import (
        build_query_segment,
        single_scan_terms,
    )

    schema = documents_schema()
    m = single_scan_terms(q, schema)
    if m is None:
        return

    t = _table(docs)
    whole = build_segment(t, schema)
    stats = GlobalStats.from_segment(whole, schema)
    h = Searcher(whole, schema, stats).eval(q)
    ref = dict(zip(h.ids.tolist(), h.scores.tolist()))

    cut = min(len(docs) - 1, max(1, int(len(docs) * cut_frac)))
    parts = [p for p in (t.slice(0, cut), t.slice(cut)) if p.num_rows]
    merged = GlobalStats()
    minis = []
    for part in parts:
        seg, partial = build_query_segment(part, schema, m, True, ["doc_id"])
        minis.append(seg)
        merged.merge(partial)

    # stats parity on everything the searcher will consult
    assert merged.num_docs == stats.num_docs
    for fname, terms in m.items():
        assert merged.field_total_tokens.get(fname, 0) == \
            stats.field_total_tokens.get(fname, 0)
        assert merged.field_doc_count.get(fname, 0) == \
            stats.field_doc_count.get(fname, 0)
        for term in terms:
            assert merged.term_df.get((fname, term), 0) == \
                stats.term_df.get((fname, term), 0), (fname, term)

    got = {}
    for seg in minis:
        if seg.num_docs == 0:
            continue
        hh = Searcher(seg, schema, merged).eval(q)
        orig = seg.table.column("doc_id").to_pylist()
        for i, sc in zip(hh.ids.tolist(), hh.scores.tolist()):
            got[orig[i]] = sc

    assert set(got) == set(ref), (q.to_json(), docs)
    for k in ref:
        assert np.float32(got[k]) == np.float32(ref[k]), (q.to_json(), k)
