"""Batch (vectorized-Arrow) tokenization must be BIT-IDENTICAL to the
per-row scalar path — same tokens, same postings structure, same
positions — across adversarial ASCII (mid-char soup), non-ASCII
fallback rows, nulls, empties and vocab filters."""

import random

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index.segment import (_build_text_index,
                                        build_text_index_arrow)
from paradedb_ray.text.batch_tokenize import batch_tokenize_arrow
from paradedb_ray.text.tokenizers import (SimpleTokenizer,
                                          UnicodeWordsTokenizer,
                                          WhitespaceTokenizer)

# heavy on mid chars / digits / underscores: every UAX#29 join edge
_ALPHABET = "ab1 2._'x:,;Z\t\n\r-!09z_"


def _rand_texts(rng, n, alphabet=_ALPHABET, maxlen=24):
    out = []
    for _ in range(n):
        out.append("".join(rng.choice(alphabet)
                           for _ in range(rng.randrange(0, maxlen))))
    return out


def _assert_ti_equal(a, b):
    assert list(a.vocab) == list(b.vocab)
    np.testing.assert_array_equal(a.term_offsets, b.term_offsets)
    np.testing.assert_array_equal(a.g_doc, b.g_doc)
    np.testing.assert_array_equal(a.g_tf, b.g_tf)
    if a.g_pos_off is None:
        assert b.g_pos_off is None
    else:
        np.testing.assert_array_equal(a.g_pos_off, b.g_pos_off)
        np.testing.assert_array_equal(a.pos_flat, b.pos_flat)
    np.testing.assert_array_equal(a.fieldnorm_ids, b.fieldnorm_ids)
    assert a.total_tokens == b.total_tokens
    assert a.doc_count == b.doc_count
    np.testing.assert_array_equal(a.has_value, b.has_value)


@pytest.mark.parametrize("tok_cls", [UnicodeWordsTokenizer, SimpleTokenizer,
                                     WhitespaceTokenizer])
def test_kernel_matches_scalar_tokenize(tok_cls):
    tok = tok_cls()
    rng = random.Random(20260818)
    texts = _rand_texts(rng, 400)
    # pinned join/boundary edges
    texts += ["it's Paul's 1,024.5 a:b a::b 1.2.3 x_:y a.1 1.a a. .a",
              "a'b'c''d", "1;2 a;b", "_._ _'a' 9,9,9", "", "Q", "a" * 500,
              ":,;.'", "word", "a.b.c.d.e 0'0"]
    arr = pa.array(texts, pa.string())
    got = batch_tokenize_arrow(arr, tok)
    assert got is not None
    tokens, doc_of, pos, lens, has_value = got
    toks_py = tokens.to_pylist()
    # regroup per doc and compare with scalar tokenize
    for i, t in enumerate(texts):
        mine = [toks_py[j] for j in np.flatnonzero(doc_of == i)]
        assert mine == tok.tokenize(t), repr(t)
        assert lens[i] == len(mine)
    assert has_value.all()
    # positions are per-doc token indexes for plain string docs
    for i in np.flatnonzero(lens)[:50]:
        p = pos[doc_of == i]
        np.testing.assert_array_equal(p, np.arange(lens[i], dtype=np.int32))


def test_index_parity_mixed_ascii_nonascii_null():
    tok = UnicodeWordsTokenizer()
    rng = random.Random(7)
    texts = _rand_texts(rng, 120)
    texts += ["héllo wörld", "это тест", "日本語 テスト", "mixed ascii héré",
              None, "", "🎂 party's over", None, "naïve café's"]
    rng.shuffle(texts)

    class F:  # minimal schema-field stand-in
        analyzer = tok

    arr = pa.array(texts, pa.string())
    a = build_text_index_arrow(arr, tok, True)
    assert a is not None
    b = _build_text_index(list(texts), tok, True)
    _assert_ti_equal(a, b)


def test_index_parity_vocab_filter():
    tok = UnicodeWordsTokenizer()
    rng = random.Random(99)
    texts = _rand_texts(rng, 200, alphabet="abc d1 2.',", maxlen=16)
    vf = np.array(sorted({"a", "b1", "d", "2", "zz"}), dtype=object)
    arr = pa.array(texts, pa.string())
    a = build_text_index_arrow(arr, tok, True, vocab_filter=vf)
    assert a is not None
    b = _build_text_index(list(texts), tok, True, vocab_filter=vf)
    _assert_ti_equal(a, b)


def test_index_parity_empty_and_all_null():
    tok = UnicodeWordsTokenizer()
    for texts in [[], [None, None], ["", ""], [".,;", "  "]]:
        arr = pa.array(texts, pa.string())
        a = build_text_index_arrow(arr, tok, True)
        b = _build_text_index(list(texts), tok, True)
        _assert_ti_equal(a, b)


def test_ineligible_configs_return_none():
    # stemmer / stopwords / folding configs must fall back entirely
    assert batch_tokenize_arrow(
        pa.array(["a b"]), UnicodeWordsTokenizer(
            filters={"stemmer": "english"})) is None
    assert batch_tokenize_arrow(
        pa.array(["a b"]), UnicodeWordsTokenizer(
            filters={"stopwords_language": "English"})) is None
    assert batch_tokenize_arrow(
        pa.array(["a b"]), UnicodeWordsTokenizer(
            filters={"ascii_folding": True})) is None
    # non-string column
    assert build_text_index_arrow(
        pa.array([[1, 2]]), UnicodeWordsTokenizer(), True) is None


def test_sliced_column_offsets():
    tok = UnicodeWordsTokenizer()
    texts = ["alpha beta", "gamma", "it's delta 1,024", "x.y", "tail end"]
    arr = pa.array(texts, pa.string()).slice(1, 3)
    a = build_text_index_arrow(arr, tok, True)
    b = _build_text_index(texts[1:4], tok, True)
    _assert_ti_equal(a, b)


def test_chunked_column():
    tok = UnicodeWordsTokenizer()
    ch = pa.chunked_array([pa.array(["one two", "three"]),
                           pa.array(["four's five", None])])
    a = build_text_index_arrow(ch, tok, True)
    b = _build_text_index(ch.to_pylist(), tok, True)
    _assert_ti_equal(a, b)


def test_stats_collector_batch_scalar_parity(monkeypatch):
    import pickle

    from paradedb_ray.schema import mock_items_schema
    from paradedb_ray.stages.search_stages import StatsCollector
    from paradedb_ray.testing import mock_items_table
    import paradedb_ray.text.batch_tokenize as bt

    schema = mock_items_schema()
    batch = mock_items_table()
    reqs = {"terms": [("description", "shoes"), ("description", "zzz"),
                      ("category", "Electronics")],
            "fields": ["description", "category"]}
    sc = StatsCollector(schema, reqs)
    a = pickle.loads(sc(batch).column("partial")[0].as_py())
    monkeypatch.setattr(bt, "batch_tokenize_arrow", lambda *x, **k: None)
    b = pickle.loads(sc(batch).column("partial")[0].as_py())
    assert a.field_total_tokens == b.field_total_tokens
    assert a.field_doc_count == b.field_doc_count
    assert a.term_df == b.term_df
