"""Snippet conformance against
`pg_search/tests/pg_regress/expected/snippets.out`."""

import pyarrow as pa
import pytest

from paradedb_ray.index.segment import build_segment
from paradedb_ray.index.searcher import Searcher
from paradedb_ray.index.snippet import SnippetConfig, generate, query_terms_for_field
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema

ROWS = [
    (1, "The quick brown fox jumps over the lazy dog. The dog is very lazy. The fox is quick."),
    (2, "A lazy dog is a happy dog. Dogs are the best, especially a lazy one."),
    (3, "Foxes and dogs are not friends. A quick fox is a clever fox."),
    (4, "This text does not contain the search words."),
    (5, "The lazy brown dog, and the quick red fox. The dog and fox are here."),
    (6, "A sentence with no matching words."),
    (7, "A test sentence for testing. Another test sentence."),
]


@pytest.fixture(scope="module")
def env():
    schema = IndexSchema.build(key_field="id", id={"type": "i64"},
                               content={"type": "text"})
    table = pa.table({"id": [r[0] for r in ROWS],
                      "content": [r[1] for r in ROWS]})
    seg = build_segment(table, schema)
    return schema, seg, Searcher(seg, schema)


def _snips(env, query_str, **cfg_kw):
    schema, seg, s = env
    q = ast.ParseWithField("content", query_str)
    hits = s.eval(q)
    terms = query_terms_for_field(q, schema, "content")
    cfg = SnippetConfig(field="content", mode="multi", **cfg_kw)
    out = {}
    for i, doc in enumerate(hits.ids.tolist()):
        txt = seg.table.column("content")[doc].as_py()
        out[seg.table.column("id")[doc].as_py()] = generate(
            txt, schema.field("content").analyzer, terms, cfg)
    return out


def test_snippets_lazy(env):
    got = _snips(env, "lazy")
    assert got == {
        1: ["The quick brown fox jumps over the <b>lazy</b> dog. The dog is very <b>lazy</b>. The fox is quick"],
        2: ["A <b>lazy</b> dog is a happy dog. Dogs are the best, especially a <b>lazy</b> one"],
        5: ["The <b>lazy</b> brown dog, and the quick red fox. The dog and fox are here"],
    }


def test_snippets_fox_or_dog(env):
    got = _snips(env, "fox OR dog")
    assert got[1] == ["The quick brown <b>fox</b> jumps over the lazy <b>dog</b>. The <b>dog</b> is very lazy. The <b>fox</b> is quick"]
    assert got[3] == ["Foxes and dogs are not friends. A quick <b>fox</b> is a clever <b>fox</b>"]


def test_snippets_phrase_highlights_all_occurrences(env):
    got = _snips(env, '"lazy dog"')
    assert set(got) == {1, 2}
    assert got[1] == ["The quick brown fox jumps over the <b>lazy</b> <b>dog</b>. The <b>dog</b> is very <b>lazy</b>. The fox is quick"]


def test_snippets_custom_tags(env):
    got = _snips(env, "quick", start_tag="<em>", end_tag="</em>")
    assert got[1] == ["The <em>quick</em> brown fox jumps over the lazy dog. The dog is very lazy. The fox is <em>quick</em>"]


def test_snippets_max_chars_multi(env):
    got = _snips(env, "fox", max_num_chars=25)
    assert got[1] == ["The quick brown <b>fox</b> jumps",
                      "dog is very lazy. The <b>fox</b>"]
    assert got[3] == ["friends. A quick <b>fox</b> is a", "clever <b>fox</b>"]
    assert got[5] == ["the quick red <b>fox</b>. The", "dog and <b>fox</b> are here"]


def test_snippets_limit(env):
    got = _snips(env, "fox", max_num_chars=25, limit=1)
    assert got[1] == ["The quick brown <b>fox</b> jumps"]


def test_snippet_on_text_array():
    """Snippets over TEXT[] fields flatten the array into one space-joined
    string (`scan_state.rs:447-461`): fragments, highlight spans and
    snippet_positions all address the joined text."""
    from paradedb_ray.index.snippet import SnippetConfig, generate
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    an = tokenizer_from_config(None)
    arr = ["red fox", "no match here", "blue fox jumps"]
    single = generate(arr, an, {"fox"}, SnippetConfig(field="arr"))
    assert single == ("red <b>fox</b> no match here blue <b>fox</b> jumps")
    pos = generate(arr, an, {"fox"},
                   SnippetConfig(field="arr", mode="positions"))
    assert pos == [[4, 7], [27, 30]]
