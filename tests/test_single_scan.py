"""Single-scan standing-query path: one corpus pass builds per-block
query-term packets (filtered postings + fieldnorms + candidate rows +
exact partial stats); scoring replays the ordinary Searcher over the
packets, so results must be BITWISE identical to the classic two-pass
route for every eligible query shape — and ineligible shapes must fall
back transparently.
"""

import importlib

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from paradedb_ray.query import ast
from paradedb_ray.schema import mock_items_schema
from paradedb_ray.testing import mock_items_table

sp = importlib.import_module("paradedb_ray.pipelines.search")


@pytest.fixture
def items_ds(ray_session):
    return ray.data.from_arrow(mock_items_table()).repartition(3)


def _both_paths(ds, schema, q, **kw):
    fast = sp.search_topk(ds, schema, q, 5, **kw).take_all()
    orig = sp._single_scan_scored
    sp._single_scan_scored = lambda *a, **k: None
    try:
        slow = sp.search_topk(ds, schema, q, 5, **kw).take_all()
    finally:
        sp._single_scan_scored = orig
    return fast, slow


ELIGIBLE = [
    ast.ParseWithField("description", "running shoes"),
    ast.Parse("shoes"),
    ast.Boolean(must=[ast.Term("description", "shoes")],
                must_not=[ast.Term("description", "running")]),
    ast.Boolean(should=[ast.Term("description", "shoes"),
                        ast.Term("description", "keyboard")]),
    ast.Phrase("description", ["running", "shoes"]),
    ast.Phrase("description", ["plush", "shoes"], slop=2),
    ast.TermSet("description", ["shoes", "boots"]),
    ast.Match("description", "sleek running shoes"),
    ast.Boost(ast.Term("description", "shoes"), 2.5),
    ast.DisjunctionMax([ast.Term("description", "shoes"),
                        ast.Term("description", "keyboard")],
                       tie_breaker=0.3),
]


@pytest.mark.parametrize("q", ELIGIBLE, ids=lambda q: type(q).__name__)
def test_single_scan_bitwise_parity(items_ds, q):
    schema = mock_items_schema()
    fast, slow = _both_paths(items_ds, schema, q,
                             output_columns=["id", "description", "score"])
    assert fast == slow
    fs = np.array([r["score"] for r in fast], dtype=np.float32)
    ss = np.array([r["score"] for r in slow], dtype=np.float32)
    assert fs.tobytes() == ss.tobytes()


def test_single_scan_engages_for_terms(items_ds):
    from paradedb_ray.stages.search_stages import single_scan_terms

    schema = mock_items_schema()
    m = single_scan_terms(ast.Match("description", "running shoes"), schema)
    assert m == {"description": {"running", "shoes"}}
    # vocab-expansion / non-TEXT shapes are ineligible
    assert single_scan_terms(
        ast.FuzzyTerm("description", "shoes", 1, True, False), schema) is None
    assert single_scan_terms(
        ast.Term("category", "footwear"), schema) is None
    assert single_scan_terms(
        ast.PhrasePrefix("description", ["running", "sho"]), schema) is None
    assert single_scan_terms(ast.All(), schema) is None


def test_single_scan_all_columns_and_empty_result(items_ds):
    schema = mock_items_schema()
    fast, slow = _both_paths(items_ds, schema,
                             ast.Term("description", "shoes"))
    assert fast == slow and len(fast) > 0
    # zero matches: schema must survive (driver hashes empty frames too)
    fast, slow = _both_paths(items_ds, schema,
                             ast.Term("description", "zzznope"),
                             output_columns=["id", "score"])
    assert fast == [] and slow == []
    out = sp.search_topk(items_ds, schema,
                         ast.Term("description", "zzznope"), 5,
                         output_columns=["id", "score"])
    assert [f.name for f in out.schema().base_schema] == ["id", "score"]


def test_single_scan_multi_query(items_ds):
    schema = mock_items_schema()
    queries = {"a": ast.Parse("shoes"),
               "b": ast.Match("description", "plush keyboard")}
    fast = sp.search_topk_multi(
        items_ds, schema, queries, 3,
        output_columns=["id", "score"]).take_all()
    orig = sp._single_scan_scored
    sp._single_scan_scored = lambda *a, **k: None
    try:
        slow = sp.search_topk_multi(
            items_ds, schema, queries, 3,
            output_columns=["id", "score"]).take_all()
    finally:
        sp._single_scan_scored = orig
    key = lambda r: (r["query_id"], -r["score"], r["id"])
    assert sorted(fast, key=key) == sorted(slow, key=key)


def test_single_scan_multi_query_mixed_eligibility(items_ds):
    """A standing set mixing known-term and vocab-expansion queries
    splits: eligible queries ride the single-scan path, the rest take
    the classic route, and the union matches classic-only bitwise."""
    schema = mock_items_schema()
    queries = {"a": ast.Match("description", "running shoes"),
               "b": ast.FuzzyTerm("description", "shoez", 1, True, False)}
    fast = sp.search_topk_multi(
        items_ds, schema, queries, 3,
        output_columns=["id", "score"]).take_all()
    orig = sp._single_scan_scored
    sp._single_scan_scored = lambda *a, **k: None
    try:
        slow = sp.search_topk_multi(
            items_ds, schema, queries, 3,
            output_columns=["id", "score"]).take_all()
    finally:
        sp._single_scan_scored = orig
    assert len(fast) > 0
    key = lambda r: (r["query_id"], -r["score"], r["id"])
    assert sorted(fast, key=key) == sorted(slow, key=key)


def test_vocab_filtered_index_matches_full():
    """_build_text_index(vocab_filter=...) == the full index restricted
    to those terms: same postings, same positions, same fieldnorms."""
    from paradedb_ray.index.segment import _build_text_index
    from paradedb_ray.schema import mock_items_schema

    f = mock_items_schema().fields["description"]
    texts = [r["description"]
             for r in mock_items_table().to_pylist()]
    full = _build_text_index(texts, f.analyzer, True)
    terms = np.array(sorted({"shoes", "running", "keyboard", "zzz"}),
                     dtype=object)
    filt = _build_text_index(texts, f.analyzer, True, vocab_filter=terms)
    assert filt.total_tokens == full.total_tokens
    assert filt.doc_count == full.doc_count
    assert filt.fieldnorm_ids.tobytes() == full.fieldnorm_ids.tobytes()
    for t in terms:
        cf, cb = filt.term_code(str(t)), full.term_code(str(t))
        if cb < 0:
            assert filt.doc_freq(str(t)) == 0
            continue
        df, tf_f, (s_f, e_f) = filt.postings(cf)
        db, tf_b, (s_b, e_b) = full.postings(cb)
        assert df.tolist() == db.tolist()
        assert tf_f.tolist() == tf_b.tolist()
        for gf, gb in zip(range(s_f, e_f), range(s_b, e_b)):
            assert filt.positions(gf).tolist() == \
                full.positions(gb).tolist()
