"""Row-for-row conformance against pg_regress golden outputs (beyond the
topk_scores/operators files covered in test_bm25_golden): slop phrase
semantics, score_filter bounds with exact f32 scores, stopword filtering
inside search.

Golden sources:
* `pg_search/tests/pg_regress/expected/slop.out` (mock_items)
* `pg_search/tests/pg_regress/expected/score_filter.out` (score_items)
* `pg_search/tests/pg_regress/expected/stopwords.out` (test_stopwords)
"""

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema
from paradedb_ray.testing import mock_items_table
from paradedb_ray.schema import mock_items_schema


@pytest.fixture(scope="module")
def mock_searcher():
    schema = mock_items_schema()
    return Searcher(build_segment(mock_items_table(), schema), schema)


def _ids(searcher, hits):
    return sorted(searcher.seg.table.column("id").to_numpy()[hits.ids].tolist())


# -- AST JSON serialization parity (the EXPLAIN `Tantivy Query:` shapes) ----


def test_ast_json_matches_reference_explain():
    import json

    # slop.out: description ### 'running shoes'::pdb.slop(2)
    assert ast.TokenizedPhrase("description", "running shoes", 2).to_json() \
        == json.loads('{"tokenized_phrase":{"field":"description",'
                      '"phrase":"running shoes","slop":2}}')
    # score_filter.out: paradedb.score(id) >= 0
    sf = ast.ScoreFilter(bounds=[(0.0, None)],
                         query=ast.Term(field="f", value="x"))
    assert sf.to_json()["score_filter"]["bounds"] == \
        [[{"Included": 0.0}, "Unbounded"]]
    rt = ast.from_json(sf.to_json())
    assert rt.to_json() == sf.to_json()
    # json_range.out legacy raw-JSONB query syntax round-trips
    j = {"range": {"field": "metadata.attributes.score",
                   "lower_bound": {"included": 4}, "upper_bound": None}}
    assert ast.from_json(j).to_json()["range"]["lower_bound"] == \
        {"included": 4}


# -- slop.out ---------------------------------------------------------------


def test_slop_tokenized_phrase(mock_searcher):
    # description ### 'running shoes'::pdb.slop(2) -> id 3 (slop.out:28-33)
    h = mock_searcher.eval(ast.TokenizedPhrase(
        field="description", phrase="running shoes", slop=2))
    assert _ids(mock_searcher, h) == [3]


def test_slop_reversed_phrase_array(mock_searcher):
    # ### ARRAY['shoes','running']: slop 2 matches (transposition cost 2),
    # slop 0 and 1 do not (slop.out:49-66)
    for slop, want in ((2, [3]), (1, []), (0, [])):
        h = mock_searcher.eval(ast.PhraseArray(
            field="description", tokens=["shoes", "running"], slop=slop))
        assert _ids(mock_searcher, h) == want, slop


# -- score_filter.out -------------------------------------------------------


@pytest.fixture(scope="module")
def score_searcher():
    schema = IndexSchema.build("id", description={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "description": pa.array(["PostgreSQL is amazing",
                                 "Search engines are powerful",
                                 "Tantivy is fast"]),
    })
    return Searcher(build_segment(t, schema), schema)


def test_score_filter_golden_score(score_searcher):
    # score for @@@ 'PostgreSQL' = 1.0226655 (score_filter.out TEST 1)
    h = score_searcher.eval(ast.ParseWithField("description", "PostgreSQL"))
    assert _ids(score_searcher, h) == [1]
    assert np.float32(h.scores[0]) == np.float32(1.0226655)


def test_score_filter_bounds(score_searcher):
    base = ast.ParseWithField("description", "PostgreSQL")
    keep = score_searcher.eval(ast.ScoreFilter(bounds=[(0.0, None)], query=base))
    assert _ids(score_searcher, keep) == [1]
    over = score_searcher.eval(ast.ScoreFilter(bounds=[(10.0, None)], query=base))
    assert _ids(score_searcher, over) == []
    # boundary inclusivity at the exact golden score 1.0226655
    exact = np.float32(1.0226655)
    incl = score_searcher.eval(ast.ScoreFilter(
        bounds=[({"Included": float(exact)}, None)], query=base))
    assert _ids(score_searcher, incl) == [1]
    excl = score_searcher.eval(ast.ScoreFilter(
        bounds=[({"Excluded": float(exact)}, None)], query=base))
    assert _ids(score_searcher, excl) == []


# -- proximity.out ----------------------------------------------------------


@pytest.fixture(scope="module")
def prox_searcher():
    schema = IndexSchema.build("id", text={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "a b c d e f g h i j k l m n o p q r s t u v w x y z",
            "bbq chicken is delicious",
            "bbq ribs are delicious",
            "chicken will be served at the bbq party",
            "ribs will be served at the party bbq",
        ]),
    })
    return Searcher(build_segment(t, schema), schema)


def test_proximity_distance_window(prox_searcher):
    # pdb.proximity('a', 23, 'z') -> none; ('a', 24, 'z') -> id 1
    h = prox_searcher.eval(ast.Proximity("text", "a", 23, "z"))
    assert _ids(prox_searcher, h) == []
    h = prox_searcher.eval(ast.Proximity("text", "a", 24, "z"))
    assert _ids(prox_searcher, h) == [1]


def test_proximity_array_and_order(prox_searcher):
    # unordered 'delicious' ~2 ['bbq','chicken'] -> {2,3};
    # in-order variant -> {}; reversed in-order -> {2,3}
    h = prox_searcher.eval(ast.Proximity(
        "text", "delicious", 2, ["bbq", "chicken"], ordered=False))
    assert _ids(prox_searcher, h) == [2, 3]
    h = prox_searcher.eval(ast.Proximity(
        "text", "delicious", 2, ["bbq", "chicken"], ordered=True))
    assert _ids(prox_searcher, h) == []
    h = prox_searcher.eval(ast.Proximity(
        "text", ["bbq", "chicken"], 2, "delicious", ordered=True))
    assert _ids(prox_searcher, h) == [2, 3]


def test_proximity_nested_clause_golden(prox_searcher):
    # prox(prox_clause(prox_array('chicken','ribs'),0,'will'), 4,
    #      prox_clause('bbq',0,'party')) -> {4,5} (ordered AND unordered)
    inner_l = ast.ProximityClause(["chicken", "ribs"], 0, "will")
    inner_r = ast.ProximityClause("bbq", 0, "party")
    for ordered in (False, True):
        h = prox_searcher.eval(ast.Proximity("text", inner_l, 4, inner_r,
                                             ordered=ordered))
        assert _ids(prox_searcher, h) == [4, 5], ordered


def test_proximity_regex_clauses(prox_searcher):
    # pdb.prox_regex('del...ous') ~1 ['chicken', /r..s/] -> {2,3} unordered,
    # {} in order
    h = prox_searcher.eval(ast.Proximity(
        "text", "/del...ous/", 1, ["chicken", "/r..s/"], ordered=False))
    assert _ids(prox_searcher, h) == [2, 3]
    h = prox_searcher.eval(ast.Proximity(
        "text", "/del...ous/", 1, ["chicken", "/r..s/"], ordered=True))
    assert _ids(prox_searcher, h) == []


# -- snippets.out -----------------------------------------------------------

_SNIPPET_DOCS = {
    1: "The quick brown fox jumps over the lazy dog. The dog is very lazy. "
       "The fox is quick.",
    2: "A lazy dog is a happy dog. Dogs are the best, especially a lazy one.",
    3: "Foxes and dogs are not friends. A quick fox is a clever fox.",
    4: "This text does not contain the search words.",
    5: "The lazy brown dog, and the quick red fox. The dog and fox are here.",
    6: "A sentence with no matching words.",
    7: "A test sentence for testing. Another test sentence.",
}


def _snips(terms, cfg):
    from paradedb_ray.index.snippet import generate
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    an = tokenizer_from_config(None)
    out = {}
    for i, txt in _SNIPPET_DOCS.items():
        s = generate(txt, an, terms, cfg)
        if s:
            out[i] = s
    return out


def test_snippets_multi_golden():
    from paradedb_ray.index.snippet import SnippetConfig

    cfg = SnippetConfig(field="content", mode="multi")
    got = _snips({"lazy"}, cfg)
    assert got == {
        1: ["The quick brown fox jumps over the <b>lazy</b> dog. The dog is "
            "very <b>lazy</b>. The fox is quick"],
        2: ["A <b>lazy</b> dog is a happy dog. Dogs are the best, especially "
            "a <b>lazy</b> one"],
        5: ["The <b>lazy</b> brown dog, and the quick red fox. The dog and "
            "fox are here"],
    }
    got2 = _snips({"fox", "dog"}, cfg)
    assert got2[3] == ["Foxes and dogs are not friends. A quick <b>fox</b> "
                       "is a clever <b>fox</b>"]


def test_snippets_custom_tags_golden():
    from paradedb_ray.index.snippet import SnippetConfig

    cfg = SnippetConfig(field="content", mode="multi",
                        start_tag="<em>", end_tag="</em>")
    got = _snips({"quick"}, cfg)
    assert got[5] == ["The lazy brown dog, and the <em>quick</em> red fox. "
                      "The dog and fox are here"]


def test_snippets_fragmentation_golden():
    from paradedb_ray.index.snippet import SnippetConfig

    cfg = SnippetConfig(field="content", mode="multi", max_num_chars=25)
    got = _snips({"fox"}, cfg)
    assert got == {
        1: ["The quick brown <b>fox</b> jumps",
            "dog is very lazy. The <b>fox</b>"],
        3: ["friends. A quick <b>fox</b> is a", "clever <b>fox</b>"],
        5: ["the quick red <b>fox</b>. The", "dog and <b>fox</b> are here"],
    }
    cfg1 = SnippetConfig(field="content", mode="multi", max_num_chars=25,
                         limit=1)
    got1 = _snips({"fox"}, cfg1)
    assert got1 == {1: ["The quick brown <b>fox</b> jumps"],
                    3: ["friends. A quick <b>fox</b> is a"],
                    5: ["the quick red <b>fox</b>. The"]}


# -- json_range.out ---------------------------------------------------------


def test_json_nested_range_golden():
    """range('metadata.attributes.score', int4range(4, NULL, '[)')) ->
    ids {2,3}; also via the raw JSONB query syntax (ast.from_json)."""
    schema = IndexSchema.build("id", metadata={"type": "json"})
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "metadata": pa.array([
            '{"attributes": {"score": 3, "tstz": "2023-05-01T08:12:34Z"}}',
            '{"attributes": {"score": 4, "tstz": "2023-05-01T09:12:34Z"}}',
            '{"attributes": {"score": 5, "tstz": "2023-05-01T10:12:34Z"}}',
        ]),
    })
    s = Searcher(build_segment(t, schema), schema)
    q = ast.Range("metadata.attributes.score", ast.Bound.included(4),
                  ast.Bound.unbounded())
    assert _ids(s, s.eval(q)) == [2, 3]
    # legacy raw-JSON query input (json_range.out second block)
    qj = ast.from_json({"range": {"field": "metadata.attributes.score",
                                  "lower_bound": {"included": 4},
                                  "upper_bound": None}})
    assert _ids(s, s.eval(qj)) == [2, 3]


# -- fuzzy.out --------------------------------------------------------------


def test_fuzzy_distance_golden(mock_searcher):
    # === 'sho'::pdb.fuzzy(d): d=0,1 -> none; d=2 -> {3,4,5}
    for d, want in ((0, []), (1, []), (2, [3, 4, 5])):
        h = mock_searcher.eval(ast.FuzzyTerm(
            field="description", value="sho", distance=d))
        assert _ids(mock_searcher, h) == want, d


def test_fuzzy_array_occurs(mock_searcher):
    fz = [ast.FuzzyTerm(field="description", value=v, distance=2)
          for v in ("sho", "running")]
    # === ARRAY (term-set OR) and ||| -> {3,4,5}
    h = mock_searcher.eval(ast.Boolean(should=fz))
    assert _ids(mock_searcher, h) == [3, 4, 5]
    # &&& ARRAY (conjunction) -> {3}
    h = mock_searcher.eval(ast.Boolean(must=fz))
    assert _ids(mock_searcher, h) == [3]


# -- datetime_stability.out -------------------------------------------------


def test_timestamp_range_query_string_golden():
    """`occurred_at @@@ '[2024-01-02T00:00:00Z TO 2024-01-04T00:00:00Z}'`
    -> ids {2,3}: ISO timestamps inside query-string ranges with mixed
    bracket inclusivity."""
    import datetime as dt

    from paradedb_ray.query.parser import parse_query_string

    schema = IndexSchema.build("id", occurred_at={"type": "date"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "occurred_at": pa.array(
            [dt.datetime(2024, 1, d, 10 + d - 1) for d in range(1, 6)],
            pa.timestamp("us")),
    })
    s = Searcher(build_segment(t, schema), schema)
    q = parse_query_string(
        "occurred_at:[2024-01-02T00:00:00 TO 2024-01-04T00:00:00}",
        schema, ["occurred_at"], False, False)
    assert _ids(s, s.eval(q)) == [2, 3]


# -- join_scoring.out (BM25 scores carried through a join) ------------------


def test_join_scoring_golden(ray_session):
    """`p.description @@@ 'wireless'` JOIN suppliers ORDER BY score LIMIT 5
    -> exact f32 scores 0.96774966 / 0.9080427 survive the join
    (join_scoring.out TEST 1)."""
    import ray.data

    from paradedb_ray.pipelines.joins import broadcast_join
    from paradedb_ray.pipelines.search import search_topk

    pschema = IndexSchema.build(
        "id", name={"type": "text"}, description={"type": "text"},
        supplier_id={"type": "i64"}, price={"type": "f64"})
    products = pa.table({
        "id": pa.array([201, 202, 203, 204, 205, 206, 207, 208], pa.int64()),
        "name": pa.array(["Wireless Mouse", "USB Cable", "Keyboard",
                          "Monitor Stand", "Webcam", "Headphones",
                          "Mouse Pad", "Cable Organizer"]),
        "description": pa.array([
            "Ergonomic wireless mouse with Bluetooth connectivity",
            "High-speed USB-C cable for fast data transfer",
            "Mechanical keyboard with RGB lighting",
            "Adjustable monitor stand for ergonomic setup",
            "HD webcam for video conferencing",
            "Wireless noise-canceling headphones with premium sound",
            "Large gaming mouse pad with wireless charging",
            "Desktop cable organizer for clean setup"]),
        "supplier_id": pa.array([151, 152, 151, 153, 154, 151, 152, 153],
                                pa.int64()),
        "price": pa.array([29.99, 9.99, 89.99, 49.99, 59.99, 199.99, 39.69,
                           14.99]),
    })
    suppliers = pa.table({
        "sid": pa.array([151, 152, 153, 154], pa.int64()),
        "supplier_name": pa.array(["TechCorp", "GlobalSupply", "FastParts",
                                   "QualityFirst"]),
    })
    hits = search_topk(
        ray.data.from_arrow(products).repartition(2), pschema,
        ast.ParseWithField("description", "wireless"), limit=5,
        order_by=[("score", "descending"), ("id", "ascending")],
        output_columns=["id", "name", "supplier_id", "score"])
    joined = broadcast_join(hits, suppliers, on="supplier_id",
                            right_on="sid", how="inner")
    df = joined.to_pandas().sort_values(
        ["score", "id"], ascending=[False, True]).reset_index(drop=True)
    assert df["id"].tolist() == [201, 206, 207]
    assert df["supplier_name"].tolist() == ["TechCorp", "TechCorp",
                                            "GlobalSupply"]
    golden = [0.96774966, 0.9080427, 0.9080427]
    for got, want in zip(df["score"], golden):
        assert np.float32(got) == np.float32(want), (got, want)


# -- term_set_dispatch.out (search-driven JoinScan) -------------------------


def test_search_join_limit_golden(ray_session):
    """ts_outer (100 rows, all 'doc') search + range, joined to ts_unique
    (10k rows, fk=i) ORDER BY id LIMIT 10 -> matched ids in order
    (term_set_dispatch.out: JoinScan TermSet-pushdown path)."""
    import ray.data

    from paradedb_ray.pipelines.joins import broadcast_join
    from paradedb_ray.pipelines.search import search

    schema = IndexSchema.build("id", val={"type": "text"},
                               id={"type": "i64"})
    outer = pa.table({"id": pa.array(range(1, 101), pa.int64()),
                      "val": pa.array(["doc"] * 100)})
    unique = pa.table({"id": pa.array(range(1, 10001), pa.int64()),
                       "fk": pa.array(range(1, 10001), pa.int64()),
                       "val": pa.array(["doc"] * 10000)})
    for cap, want_n in ((4, 4), (5, 5), (100, 10)):
        q = ast.Boolean(must=[
            ast.ParseWithField("val", "doc"),
            ast.Range("id", ast.Bound.unbounded(), ast.Bound.included(cap))])
        matched = search(ray.data.from_arrow(outer), schema, q,
                         with_score=False)
        # small matched side broadcast into the big probe side
        j = broadcast_join(ray.data.from_arrow(unique).repartition(4),
                           matched, on="fk", right_on="id",
                           right_columns=["id"], how="inner")
        got = j.sort(["id"]).limit(10).to_pandas()["id"].tolist()
        assert got == list(range(1, min(cap, 10) + 1))[:10]
        assert len(got) == want_n


# -- unicode_words.out ------------------------------------------------------


def test_unicode_words_adjacent_emoji_golden():
    """`'it''s Paul''s birthday today!  🎂🚨👀🥜🛜🫨🫩'::pdb.unicode_words`
    -> {it's,paul's,birthday,today,🎂,🚨,👀,🥜,🛜,🫨,🫩}: adjacent emoji
    are separate tokens; ZWJ sequences / flags / skin tones stay joined."""
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    tk = tokenizer_from_config({"type": "unicode_words"})
    got = tk.tokenize("it's Paul's birthday today!  "
                      "\U0001f382\U0001f6a8\U0001f440\U0001f95c"
                      "\U0001f6dc\U0001fae8\U0001fae9")
    assert got == ["it's", "paul's", "birthday", "today",
                   "\U0001f382", "\U0001f6a8", "\U0001f440", "\U0001f95c",
                   "\U0001f6dc", "\U0001fae8", "\U0001fae9"]
    assert tk.tokenize("family \U0001f468‍\U0001f469‍\U0001f467 "
                       "flag \U0001f1fa\U0001f1f8 skin \U0001f44d\U0001f3fd") \
        == ["family", "\U0001f468‍\U0001f469‍\U0001f467",
            "flag", "\U0001f1fa\U0001f1f8", "skin", "\U0001f44d\U0001f3fd"]


def test_unicode_words_emoji_search_golden():
    # SELECT * FROM unicode_words WHERE t @@@ '🚨' -> the birthday row
    schema = IndexSchema.build("id", t={"type": "text"})
    tbl = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "t": pa.array(["it's Paul's birthday today!  "
                                   "\U0001f382\U0001f6a8\U0001f440\U0001f95c",
                                   "no emoji here"])})
    s = Searcher(build_segment(tbl, schema), schema)
    h = s.eval(ast.ParseWithField("t", "\U0001f6a8"))
    assert _ids(s, h) == [1]


# -- range-type operators (`query/range.rs`) over mock_items weight_range ---


def _brute_ranges():
    import json

    rows = json.load(open(
        "/root/repo/paradedb_ray/testing/mock_data.json"))["items"]
    out = {}
    for r in rows:
        wr = r.get("weight_range")
        if not wr:
            continue
        (lk, lv), (uk, uv) = wr
        out[r["id"]] = (lv, lk == "inclusive", uv, uk == "inclusive")
    return out


def _contains_point(b, v):
    lv, li, uv, ui = b
    lo_ok = lv is None or v > lv or (v == lv and li)
    hi_ok = uv is None or v < uv or (v == uv and ui)
    return lo_ok and hi_ok


def test_range_term_vs_brute(mock_searcher):
    ranges = _brute_ranges()
    for v in (2, 3, 5, 10, 11, 0):
        h = mock_searcher.eval(ast.RangeTerm(field="weight_range", value=v))
        got = _ids(mock_searcher, h)
        want = sorted(i for i, b in ranges.items() if _contains_point(b, v))
        assert got == want, v


def test_range_contains_within_intersects(mock_searcher):
    ranges = _brute_ranges()
    q_lo, q_hi = 3, 9  # argument range [3, 9)

    def covers(b):  # field range contains [3,9)
        lv, li, uv, ui = b
        lo_ok = lv is None or lv < q_lo or (lv == q_lo and li)
        # arg upper is EXCLUSIVE at 9, so a field upper of 9 covers it
        # regardless of the field's own upper inclusivity
        hi_ok = uv is None or uv >= q_hi
        return lo_ok and hi_ok

    def within(b):
        lv, li, uv, ui = b
        lo_ok = lv is not None and (lv > q_lo or lv == q_lo)
        hi_ok = uv is not None and (uv < q_hi or (uv == q_hi and not ui))
        return lo_ok and hi_ok

    def intersects(b):
        lv, li, uv, ui = b
        left_dis = uv is not None and (uv < q_lo or (uv == q_lo and not ui))
        right_dis = lv is not None and lv >= q_hi
        return not (left_dis or right_dis)

    h = mock_searcher.eval(ast.RangeContains(
        "weight_range", ast.Bound.included(q_lo), ast.Bound.excluded(q_hi)))
    assert _ids(mock_searcher, h) == sorted(
        i for i, b in ranges.items() if covers(b))
    h = mock_searcher.eval(ast.RangeWithin(
        "weight_range", ast.Bound.included(q_lo), ast.Bound.excluded(q_hi)))
    assert _ids(mock_searcher, h) == sorted(
        i for i, b in ranges.items() if within(b))
    h = mock_searcher.eval(ast.RangeIntersects(
        "weight_range", ast.Bound.included(q_lo), ast.Bound.excluded(q_hi)))
    assert _ids(mock_searcher, h) == sorted(
        i for i, b in ranges.items() if intersects(b))


# -- indexed expression aliases (`operators.sql:17-20`) ---------------------


def test_indexed_expression_alias():
    """`(lower(description)::pdb.simple('alias=description_lower'))` — a
    derived column indexed under an alias, queried by alias name, with its
    own tokenizer (simple, no lowercase filter needed post-transform)."""
    import pyarrow.compute as pc_

    schema = IndexSchema.build(
        "id",
        description={"type": "text"},
        description_lower={
            "type": "text",
            "tokenizer": {"type": "default", "lowercase": False},
            "expr_source": "description",
            "expr_fn": lambda col: pc_.utf8_lower(col),
        })
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "description": pa.array(["Sleek RUNNING Shoes",
                                           "Plain keyboard"])})
    s = Searcher(build_segment(t, schema), schema)
    h = s.eval(ast.Term(field="description_lower", value="running"))
    assert _ids(s, h) == [1]
    # the UPPERCASE form does not exist in the lowered alias index
    h2 = s.eval(ast.Term(field="description_lower", value="RUNNING"))
    assert _ids(s, h2) == []


# -- columnar_edgecases_02_null_handling.out --------------------------------


def test_null_handling_golden():
    """Search matches docs whose OTHER columns are NULL; nulls survive to
    the output and Exists distinguishes them."""
    schema = IndexSchema.build("id", content={"type": "text"},
                               string_field={"type": "keyword"},
                               numeric_field={"type": "i64"})
    t = pa.table({
        "id": pa.array(["null1", "null2", "full1"], pa.string()),
        "content": pa.array(["all about null values",
                             "null values with data", "no match here"]),
        "string_field": pa.array([None, "not null", "x"], pa.string()),
        "numeric_field": pa.array([None, 42, 7], pa.int64()),
    })
    s = Searcher(build_segment(t, schema), schema)
    h = s.eval(ast.ParseWithField("content", "null"))
    got = s.seg.table.take(pa.array(sorted(h.ids.tolist()), pa.int64()))
    assert got.column("id").to_pylist() == ["null1", "null2"]
    assert got.column("string_field").to_pylist() == [None, "not null"]
    assert got.column("numeric_field").to_pylist() == [None, 42]
    # Exists excludes the null rows
    h2 = s.eval(ast.Boolean(must=[ast.ParseWithField("content", "null"),
                                  ast.Exists(field="numeric_field")]))
    ids2 = s.seg.table.column("id").take(
        pa.array(h2.ids, pa.int64())).to_pylist()
    assert ids2 == ["null2"]


# -- ascii_folding_filter.out / phrase_tokenization.out ---------------------


def test_ascii_folding_golden():
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    on = tokenizer_from_config({"type": "default", "ascii_folding": True})
    assert on.tokenize("café") == ["cafe"]
    off = tokenizer_from_config({"type": "default", "ascii_folding": False})
    assert off.tokenize("café") == ["café"]
    default = tokenizer_from_config({"type": "default"})
    assert default.tokenize("café") == ["café"]


def test_phrase_raw_json_query_golden():
    # phrase_tokenization.out: raw JSONB phrase query, query words
    # normalized by the field analyzer ("BANANA" -> banana), slop 2 skips
    # the intervening token
    schema = IndexSchema.build("id", flavour={"type": "text"})
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "flavour": pa.array(["apple, with, banana",
                                       "banana apple pie"])})
    s = Searcher(build_segment(t, schema), schema)
    q = ast.from_json({"phrase": {"field": "flavour",
                                  "phrases": ["apple", "BANANA"],
                                  "slop": 2}})
    assert _ids(s, s.eval(q)) == [1, 2]  # slop 2 also admits the reversal
    q0 = ast.from_json({"phrase": {"field": "flavour",
                                   "phrases": ["apple", "BANANA"],
                                   "slop": 1}})
    assert _ids(s, s.eval(q0)) == [1]


# -- ngram-field search (substring semantics via the index) -----------------


def test_ngram_field_substring_search():
    """A field indexed with ngram(3,3) matches substring grams: querying a
    3-gram finds every doc whose text contains it (`tokenizers/` ngram;
    how pg_search serves LIKE-ish lookups through the index)."""
    schema = IndexSchema.build("id", sku={
        "type": "text",
        "tokenizer": {"type": "ngram", "min_gram": 3, "max_gram": 3}})
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "sku": pa.array(["ABC-1234", "XYZ-1299", "ABD-7777"])})
    s = Searcher(build_segment(t, schema), schema)
    got = _ids(s, s.eval(ast.Term(field="sku", value="abc")))
    assert got == [1]
    got = _ids(s, s.eval(ast.Term(field="sku", value="129")))
    assert got == [2]
    # shared gram across docs
    got = _ids(s, s.eval(ast.Term(field="sku", value="ab")))
    assert got == []  # 2-gram never indexed at min_gram=3


def test_edge_ngram_autocomplete():
    """edge_ngram(2,5) serves prefix/autocomplete lookups: typing 'sea'
    matches 'search' and 'seattle' but not 'asea'."""
    schema = IndexSchema.build("id", title={
        "type": "text",
        "tokenizer": {"type": "edge_ngram", "min_gram": 2, "max_gram": 5}})
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "title": pa.array(["search engine", "seattle rain",
                                     "asea drift"])})
    s = Searcher(build_segment(t, schema), schema)
    assert _ids(s, s.eval(ast.Term(field="title", value="sea"))) == [1, 2]
    assert _ids(s, s.eval(ast.Term(field="title", value="se"))) == [1, 2]
    assert _ids(s, s.eval(ast.Term(field="title", value="as"))) == [3]


# -- bm25-params.out --------------------------------------------------------


def _bm25_params_scores(tokenizer_opts):
    texts = ["search search search", "search engine",
             "postgres database", "search"]
    schema = IndexSchema.build("id", short_text=dict(
        {"type": "text", "tokenizer": {"type": "default"}}, **tokenizer_opts))
    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "short_text": pa.array(texts)})
    s = Searcher(build_segment(t, schema), schema)
    h = s.eval(ast.ParseWithField("short_text", "search"))
    return {int(i): round(float(sc), 4)
            for i, sc in zip(s.seg.table.column("id").take(
                h.ids.tolist()).to_pylist(), h.scores.tolist())}


def test_bm25_default_params_golden():
    # bm25-params.out default index: 1->0.5062, 4->0.4484, 2->0.3567
    got = _bm25_params_scores({})
    assert got == {1: 0.5062, 2: 0.3567, 4: 0.4484}


def test_bm25_k1_zero_golden():
    # k1=0: tf and length vanish -> every match scores idf-flat 0.3567
    got = _bm25_params_scores({"k1": 0.0})
    assert got == {1: 0.3567, 2: 0.3567, 4: 0.3567}


def test_bm25_b_zero_no_length_norm():
    # b=0: no length normalization -> doc 2 (2 tokens) scores same as
    # doc 4 (1 token); doc 1 still wins on tf
    got = _bm25_params_scores({"b": 0.0})
    assert got[2] == got[4]
    assert got[1] > got[4]


# -- json_term_set.out ------------------------------------------------------


def test_json_term_set_golden():
    """TermSetMulti over a JSON dot-path (string-valued tstz) -> ids {2,3}
    (json_term_set.out; values compared as stored strings)."""
    schema = IndexSchema.build("id", metadata={"type": "json"})
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "metadata": pa.array([
            '{"attributes": {"tstz": "2023-05-01T08:12:34Z"}}',
            '{"attributes": {"tstz": "2023-05-01T09:12:34Z"}}',
            '{"attributes": {"tstz": "2023-05-01T10:12:34Z"}}']),
    })
    s = Searcher(build_segment(t, schema), schema)
    q = ast.TermSet(field="metadata.attributes.tstz",
                    terms=["2023-05-01T09:12:34Z", "2023-05-01T10:12:34Z"])
    assert _ids(s, s.eval(q)) == [2, 3]


# -- exists_json.out --------------------------------------------------------


def test_exists_json_golden():
    schema = IndexSchema.build("id", description={"type": "text"},
                               data={"type": "json"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "description": pa.array(["Marketing manager", "Sales manager",
                                 "Engineer", "CEO", "CTO", "Intern"]),
        "data": pa.array([
            '{"last_name": "Smith", "first_name": "John"}',
            '{"first_name": "Jane"}',
            '{"last_name": "Wilson"}',
            None,
            '{"last_name": "Johnson", "first_name": "Jim"}',
            '{"address": {"city": "New York", "zip": "10001"}}']),
    })
    s = Searcher(build_segment(t, schema), schema)
    # jsonb_exists_operator.out test 1: data ? 'first_name'
    assert _ids(s, s.eval(ast.Exists(field="data.first_name"))) == [1, 2, 5]
    # test 2: data ? 'last_name' OR description ||| 'CEO'
    q = ast.Boolean(should=[ast.Exists(field="data.last_name"),
                            ast.ParseWithField("description", "CEO")])
    assert _ids(s, s.eval(q)) == [1, 3, 4, 5]
    # test 3: AND of two key-exists
    q = ast.Boolean(must=[ast.Exists(field="data.first_name"),
                          ast.Exists(field="data.last_name")])
    assert _ids(s, s.eval(q)) == [1, 5]
    # test 5: nested path (data->'address' ? 'city')
    assert _ids(s, s.eval(ast.Exists(field="data.address.city"))) == [6]
    # test 7: NOT (data ? 'first_name') is index-exists semantics — the
    # NULL-data row 4 IS included (unlike vanilla SQL three-valued NOT)
    q = ast.Boolean(must=[ast.All()],
                    must_not=[ast.Exists(field="data.first_name")])
    assert _ids(s, s.eval(q)) == [3, 4, 6]
    assert _ids(s, s.eval(ast.Exists(field="data"))) == [1, 2, 3, 5, 6]


# -- aggregate.out ----------------------------------------------------------


def test_aggregate_pushdown_golden(ray_session):
    """COUNT/SUM/AVG/MIN/MAX over `description @@@ 'laptop'` on the
    products fixture (aggregate.out tests 1.1-1.5)."""
    import ray.data

    from paradedb_ray.pipelines.aggregate import sql_aggregate

    schema = IndexSchema.build(
        "id", description={"type": "text"},
        category={"type": "keyword"}, rating={"type": "i64"},
        price={"type": "f64"})
    t = pa.table({
        "id": pa.array(range(1, 9), pa.int64()),
        "description": pa.array([
            "Laptop with fast processor", "Gaming laptop with RGB",
            "Toy laptop for kids", "Wireless keyboard and mouse",
            "Mechanical keyboard RGB", "Running shoes for athletes",
            "Winter jacket warm", "Summer jacket light"]),
        "category": pa.array(["Electronics", "Electronics", "Toys",
                              "Electronics", "Electronics", "Sports",
                              "Clothing", "Clothing"]),
        "rating": pa.array([5, 5, 3, 4, 5, 5, 4, 3], pa.int64()),
        "price": pa.array([999.99, 1299.99, 499.99, 79.99, 149.99, 89.99,
                           129.99, 59.99], pa.float64()),
    })
    ds = ray.data.from_arrow(t)
    out = sql_aggregate(
        ds, [], {"count": ("count_star", None), "sum": ("sum", "price"),
                 "avg": ("avg", "price"), "min": ("min", "price"),
                 "max": ("max", "price")},
        schema=schema,
        filter_query=ast.ParseWithField("description", "laptop"),
    ).to_pandas().iloc[0]
    assert out["count"] == 3
    assert out["sum"] == 2799.9700000000003
    assert out["avg"] == 933.3233333333334
    assert out["min"] == 499.99 and out["max"] == 1299.99


# -- stopwords.out ----------------------------------------------------------


def test_stopwords_tokenize_positions():
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    tk = tokenizer_from_config({"type": "default", "stopwords": ["stopword"]})
    toks = tk.tokenize_tokens("something, stopword, else")
    assert [(t.text, t.position) for t in toks] == [("something", 0),
                                                   ("else", 2)]
    tk2 = tokenizer_from_config({"type": "default",
                                 "stopwords_language": "English"})
    toks2 = tk2.tokenize_tokens("something and else")
    assert [(t.text, t.position) for t in toks2] == [("something", 0),
                                                     ("else", 2)]


def test_stopwords_search_scores_golden():
    """Docs 'something else' and 'something, stopword, else' score
    identically (stopword removed before indexing); golden f32 scores from
    stopwords.out: 0.60353506 / 0.13353144."""
    schema = IndexSchema.build("id", name={
        "type": "text",
        "tokenizer": {"type": "default", "stopwords": ["stopword"]}})
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["something else", "something more",
                          "something, stopword, else"]),
    })
    s = Searcher(build_segment(t, schema), schema)
    h = s.eval(ast.ParseWithField("name", '("something" "else")'))
    got = dict(zip(s.seg.table.column("id").to_numpy()[h.ids].tolist(),
                   h.scores.tolist()))
    golden = {1: 0.60353506, 2: 0.13353144, 3: 0.60353506}
    assert set(got) == set(golden)
    for k, v in golden.items():
        assert np.float32(got[k]) == np.float32(v), (k, got[k], v)
    # searching the stopword itself finds nothing
    h2 = s.eval(ast.ParseWithField("name", "stopword"))
    assert len(h2) == 0


def test_minimum_should_match_regress():
    """Mirror of `minimum_should_match.sql`: the 6-doc corpus and every
    msm edge (2-of-3, all-3, msm=0 retrieval = union, msm > clauses = no
    rows, combined with must, default >= 1, single-clause variant)."""
    from paradedb_ray.query import builders as pdb

    schema = IndexSchema.build("id", title={"type": "text"},
                               body={"type": "text"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "title": pa.array(["apple banana cherry", "apple banana",
                           "apple only", "banana cherry date",
                           "cherry date elderberry", "unrelated document"]),
        "body": pa.array(["fruit salad", "two fruits", "just apple",
                          "three fruits", "more fruits", "no match"]),
    })
    s = Searcher(build_segment(t, schema), schema)

    def ids(q):
        h = s.eval(q)
        return sorted(s.seg.table.column("id").to_numpy()[h.ids].tolist())

    abc = [pdb.term("title", w) for w in ("apple", "banana", "cherry")]
    ab = [pdb.term("title", w) for w in ("apple", "banana")]
    # Test 1: at least 2 of apple/banana/cherry
    assert ids(pdb.boolean(should=abc, minimum_should_match=2)) == [1, 2, 4]
    # Test 2: all 3
    assert ids(pdb.boolean(should=abc, minimum_should_match=3)) == [1]
    # Test 3: msm=0 retrieves the union of should clauses
    assert ids(pdb.boolean(should=ab, minimum_should_match=0)) == [1, 2, 3, 4]
    # Test 4: msm > clause count matches nothing
    assert ids(pdb.boolean(should=ab, minimum_should_match=5)) == []
    # Test 5: combined with must
    assert ids(pdb.boolean(must=[pdb.term("body", "fruit")], should=abc,
                           minimum_should_match=2)) == [1]
    # Test 6: omitted msm keeps >= 1 behavior
    assert ids(pdb.boolean(should=ab)) == [1, 2, 3, 4]
    # Test 7: single should clause with msm=1
    assert ids(pdb.boolean(should=[pdb.term("title", "apple")],
                           minimum_should_match=1)) == [1, 2, 3]


def test_explain_topk_plan_shape():
    """EXPLAIN textual parity with the reference's Custom Scan block
    (`topk_scores.out`): plan node lines, exec method, TopK order/limit,
    and a `Tantivy Query:` JSON that round-trips through ast.from_json."""
    import json

    from paradedb_ray.query import builders as pdb
    from paradedb_ray.query.explain import explain

    q = pdb.boolean(should=[
        pdb.parse_with_field("description", "keyboard"),
        pdb.boolean(must=[
            pdb.parse_with_field("description", "shoes"),
            ast.Range("rating", ast.Bound.excluded(2), None)])])
    plan = explain(q, table="mock_items", index="search_idx", limit=5,
                   order_by=[("rating", "descending")], with_score=True)
    lines = plan.splitlines()
    assert lines[0] == "Limit"
    assert lines[1] == "  ->  Custom Scan (ParadeDB Base Scan) on mock_items"
    assert "Exec Method: TopKScanExecState" in plan
    assert "Scores: true" in plan
    assert "TopK Order By: rating desc" in plan
    assert "TopK Limit: 5" in plan
    # the serialized query is our serde twin: null for an unbounded side,
    # and it parses back into an equivalent AST
    tq = next(x for x in lines if "Tantivy Query:" in x)
    j = json.loads(tq.split("Tantivy Query: ", 1)[1])
    assert j["boolean"]["should"][1]["boolean"]["must"][1]["range"][
        "upper_bound"] is None
    rt = ast.from_json(j)
    assert rt.to_json() == j
    # un-limited scan renders the normal exec method
    plan2 = explain(pdb.term("description", "shoes"), table="mock_items")
    assert plan2.splitlines()[0] == \
        "Custom Scan (ParadeDB Base Scan) on mock_items"
    assert "Exec Method: NormalScanExecState" in plan2


def test_text_array_fields_regress():
    """Mirror of `tokenize-text-arrays.sql`: TEXT[] columns index every
    element into one field; `===` is an untokenized vocab lookup (so a
    two-token string only matches under the literal tokenizer); phrases
    never match across element boundaries (POSITION_GAP)."""
    from paradedb_ray.query import builders as pdb

    arrs = [["red", "blue", "blue green"], ["blue green"]]
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "arr": pa.array(arrs, pa.list_(pa.string()))})

    def ids(s, q):
        h = s.eval(q)
        return sorted(s.seg.table.column("id").to_numpy()[h.ids].tolist())

    # default tokenizer: elements tokenize, 'blue green' is two tokens
    schema = IndexSchema.build("id", arr={"type": "text"})
    s = Searcher(build_segment(t, schema), schema)
    assert ids(s, pdb.term("arr", "red")) == [1]
    assert ids(s, pdb.term("arr", "blue")) == [1, 2]
    assert ids(s, pdb.term("arr", "blue green")) == []
    # the phrase matches INSIDE an element...
    assert ids(s, pdb.phrase_string("arr", "blue green")) == [1, 2]
    # ...but never across element boundaries (red|blue are adjacent
    # elements in row 1)
    assert ids(s, pdb.phrase_string("arr", "red blue")) == []

    # literal tokenizer: whole elements are single tokens
    schema2 = IndexSchema.build(
        "id", arr={"type": "text", "tokenizer": {"type": "literal"}})
    s2 = Searcher(build_segment(t, schema2), schema2)
    assert ids(s2, pdb.term("arr", "red")) == [1]
    assert ids(s2, pdb.term("arr", "blue")) == [1]
    assert ids(s2, pdb.term("arr", "blue green")) == [1, 2]

    # null elements and null rows
    t3 = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                   "arr": pa.array([["x", None, "y"], None, []],
                                   pa.list_(pa.string()))})
    s3 = Searcher(build_segment(t3, schema), schema)
    assert ids(s3, pdb.term("arr", "y")) == [1]
    ti = s3.seg.text["arr"]
    # a NULL row and an empty array both add no values -> no field value
    assert ti.doc_count == 1
    assert ids(s3, pdb.exists("arr")) == [1]


def test_search_tokenizer_autocomplete_regress():
    """Mirror of `search_tokenizer.sql`: edge-ngram index tokenizer +
    unicode_words search tokenizer — 'sho' matches only the prefix-ngram
    titles, 's' matches every s-title, and WITHOUT search_tokenizer the
    query 'sho' would ngram-explode and match everything s-ish."""
    from paradedb_ray.query import builders as pdb

    titles = ["shoes", "shirt", "shorts", "shoelaces", "socks"]
    t = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "title": pa.array(titles)})

    def ids(schema, q):
        s = Searcher(build_segment(t, schema), schema)
        h = s.eval(q)
        return sorted(s.seg.table.column("id").to_numpy()[h.ids].tolist())

    ngram = {"type": "edge_ngram", "min_gram": 1, "max_gram": 10}
    with_st = IndexSchema.build(
        "id", title={"type": "text", "tokenizer": ngram,
                     "search_tokenizer": {"type": "default"}})
    assert ids(with_st,
               pdb.match_disjunction("title", "sho")) == [1, 3, 4]
    assert ids(with_st,
               pdb.match_disjunction("title", "s")) == [1, 2, 3, 4, 5]
    # control: without the override the search side ngram-explodes 'sho'
    # into s/sh/sho and over-matches
    without = IndexSchema.build(
        "id", title={"type": "text", "tokenizer": ngram})
    assert ids(without,
               pdb.match_disjunction("title", "sho")) == [1, 2, 3, 4, 5]


def test_require_positions_regress():
    """Mirror of `require_positions.sql`: every positional query family
    raises a clear error on a field indexed without positions."""
    from paradedb_ray.query import builders as pdb

    schema = IndexSchema.build(
        "id", t={"type": "text", "positions": False,
                 "tokenizer": {"type": "ngram", "min_gram": 3,
                               "max_gram": 3}})
    tab = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "t": pa.array(["AAABBB", "BBBAAA"])})
    s = Searcher(build_segment(tab, schema), schema)
    qs = [ast.TokenizedPhrase("t", "aaa", 0),
          ast.Proximity("t", "aaa", 1, "bbb"),
          pdb.phrase_string("t", "aaa"),
          ast.PhrasePrefix("t", ["aaa", "b"]),
          ast.RegexPhrase("t", ["a.*", "bbb"])]
    for q in qs:
        with pytest.raises(ValueError, match="without positions"):
            s.eval(q)
    # non-positional queries still work
    h = s.eval(ast.Term("t", "aaa"))
    assert len(h) == 2


# -- f16 typmod quantization on the cast surface (boost.out / const_score.out)


def test_boost_cast_quantizes_through_f16():
    """`::pdb.boost(x)` smuggles x through an f16 typmod
    (`api/operator.rs:1221-1264`); golden renderings from `boost.out` /
    `const_score.out`: 3.14159 -> 3.140625, bounds at +/-2048."""
    from paradedb_ray.query import builders as pdb

    inner = ast.Term("description", "shoes")
    for given, want in [(3, 3.0), (3.14159, 3.140625), (0.5, 0.5),
                        (0, 0.0), (-100, -100.0), (2048, 2048.0),
                        (-2048.0, -2048.0)]:
        assert pdb.boost_cast(given, inner).factor == want, given
        assert pdb.const_score_cast(given, inner).score == want, given
    for bad in (2049, -2049, float("nan"), float("inf")):
        with pytest.raises(ValueError, match="16 bit floats"):
            pdb.boost_cast(bad, inner)
        with pytest.raises(ValueError, match="16 bit floats"):
            pdb.const_score_cast(bad, inner)


def test_boost_cast_scoring_uses_quantized_factor(mock_searcher):
    """Scores under a cast boost must be computed from the f16-rounded
    factor, not the user's literal."""
    from paradedb_ray.query import builders as pdb

    inner = ast.Term("description", "shoes")
    cast = mock_searcher.eval(pdb.boost_cast(3.14159, inner))
    want = mock_searcher.eval(pdb.boost(3.140625, inner))
    lit = mock_searcher.eval(pdb.boost(3.14159, inner))
    assert cast.ids.tolist() == want.ids.tolist()
    assert cast.scores.tobytes() == want.scores.tobytes()
    assert cast.scores.tobytes() != lit.scores.tobytes()
