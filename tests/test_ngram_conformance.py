"""Row-for-row conformance against `pg_regress/expected/ngram.out` and
`expected/token_length_filter.out`, plus the reference edge_ngram unit
goldens (`tokenizers/src/edge_ngram.rs:267-360`).

Key semantics pinned here:

* tantivy's NgramTokenizer leaves every gram at position 0; pg_search's
  wrapper (`tokenizers/src/ngram.rs:18-48`) emits sequential positions
  only when ``positions=true`` AND ``min_gram == max_gram`` — so phrase /
  proximity queries over an ngram field work ONLY with positions enabled.
* edge_ngram is word-aware (`tokenizers/src/edge_ngram.rs`): words are
  runs of token_chars-class characters (default letter+digit), each word
  emits min..max-char prefixes, words shorter than min_gram are skipped
  without consuming a position, and all grams of the i-th emitted word
  share position i.
* token-length filters measure characters of the raw token with
  ``len < remove_short`` and ``len > remove_long`` dropped (== kept).
"""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import IndexSchema
from paradedb_ray.text.tokenizers import (
    EdgeNgramTokenizer,
    NgramTokenizer,
    tokenizer_from_config,
)


def _ids(s, h):
    return sorted(s.seg.table.column("id").to_numpy()[h.ids].tolist())


# -- ngram.out: cast goldens -------------------------------------------------


def test_ngram_prefix_only_cast():
    # SELECT 'Tokenize me!'::pdb.ngram(3,3,'prefix_only=true')::text[]
    tok = tokenizer_from_config(
        {"type": "ngram", "min_gram": 3, "max_gram": 3, "prefix_only": True})
    assert tok.tokenize("Tokenize me!") == ["tok"]


def test_ngram_full_cast():
    # prefix_only=false / positions=true / positions=false all emit the
    # same 10 grams (ngram.out:12-30)
    want = ["tok", "oke", "ken", "eni", "niz", "ize", "ze ", "e m", " me",
            "me!"]
    for extra in ({"prefix_only": False}, {"positions": True},
                  {"positions": False}):
        cfg = {"type": "ngram", "min_gram": 3, "max_gram": 3, **extra}
        assert tokenizer_from_config(cfg).tokenize("Tokenize me!") == want


def test_ngram_positions_requires_equal_grams():
    # ngram.out:31-32: ERROR: An invalid argument was passed:
    # 'min_gram must equal max_gram when positions are enabled'
    with pytest.raises(ValueError,
                       match="min_gram must equal max_gram"):
        NgramTokenizer(3, 4, positions=True)
    with pytest.raises(ValueError, match="min_gram must equal max_gram"):
        tokenizer_from_config({"type": "ngram", "min_gram": 3,
                               "max_gram": 4, "positions": True})


# -- ngram.out: positional queries over the ngram_positions table ------------


@pytest.fixture(scope="module")
def ngram_pos_searcher():
    schema = IndexSchema.build("id", description={
        "type": "text",
        "tokenizer": {"type": "ngram", "min_gram": 3, "max_gram": 3,
                      "positions": True}})
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "description": pa.array(["aaabbb", "bbbaaa"])})
    return Searcher(build_segment(t, schema), schema)


def test_ngram_positions_phrase_array(ngram_pos_searcher):
    s = ngram_pos_searcher
    # ### ARRAY['aaa','aab'] -> id 1 (consecutive gram positions);
    # reversed array -> no rows (ngram.out:37-48)
    h = s.eval(pdb.phrase("description", ["aaa", "aab"]))
    assert _ids(s, h) == [1]
    h = s.eval(pdb.phrase("description", ["aab", "aaa"]))
    assert _ids(s, h) == []


def test_ngram_positions_proximity(ngram_pos_searcher):
    s = ngram_pos_searcher
    # 'aaa' ##> 2 ##> 'bbb' (ordered, within 2 intervening grams):
    # aaabbb has aaa@0 / bbb@3 -> matches; bbbaaa only has aaa after bbb
    h = s.eval(pdb.proximity("description", "aaa", 2, "bbb", ordered=True))
    assert _ids(s, h) == [1]
    # undirected ## 2 matches both rows (ngram.out:55-61)
    h = s.eval(pdb.proximity("description", "aaa", 2, "bbb", ordered=False))
    assert _ids(s, h) == [1, 2]


def test_ngram_default_zero_positions_break_phrases():
    """Without positions=true every gram sits at position 0, so the same
    phrase that matched above finds nothing (tantivy NgramTokenizer
    behavior the reference wrapper documents at ngram.rs:20-22)."""
    schema = IndexSchema.build("id", description={
        "type": "text",
        "tokenizer": {"type": "ngram", "min_gram": 3, "max_gram": 3}})
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "description": pa.array(["aaabbb", "bbbaaa"])})
    s = Searcher(build_segment(t, schema), schema)
    assert _ids(s, s.eval(pdb.phrase("description", ["aaa", "aab"]))) == []
    # term lookups are unaffected
    assert _ids(s, s.eval(pdb.term("description", "aaa"))) == [1, 2]


# -- token_length_filter.out --------------------------------------------------

_SENT = "a sentence with a veryveryverylong token"


def test_remove_long_drops_whole_token():
    very_long = "f2a8" * 1024  # 4096 chars, same shape as the fixture's
    tok = tokenizer_from_config({"type": "default"})
    assert tok.tokenize(very_long) == [very_long]  # no default cap
    tok = tokenizer_from_config({"type": "default", "remove_long": 255})
    assert tok.tokenize(very_long) == []


def test_remove_short_boundaries():
    tok = tokenizer_from_config({"type": "default"})
    assert tok.tokenize(_SENT) == [
        "a", "sentence", "with", "a", "veryveryverylong", "token"]
    # remove_short=1 keeps 1-char tokens (strictly-shorter drop)
    tok = tokenizer_from_config({"type": "default", "remove_short": 1})
    assert tok.tokenize(_SENT) == [
        "a", "sentence", "with", "a", "veryveryverylong", "token"]
    tok = tokenizer_from_config({"type": "default", "remove_short": 2})
    assert tok.tokenize(_SENT) == [
        "sentence", "with", "veryveryverylong", "token"]


def test_remove_long_boundaries():
    # 'veryveryverylong' is 16 chars: dropped at remove_long=15, kept at 16
    tok = tokenizer_from_config(
        {"type": "default", "remove_short": 2, "remove_long": 15})
    assert tok.tokenize(_SENT) == ["sentence", "with", "token"]
    tok = tokenizer_from_config(
        {"type": "default", "remove_short": 2, "remove_long": 16})
    assert tok.tokenize(_SENT) == [
        "sentence", "with", "veryveryverylong", "token"]


# -- edge_ngram.rs unit goldens ----------------------------------------------


def _edge(min_g, max_g, classes=("letter", "digit")):
    # raw tokenizer (no lowercase) mirrors the Rust unit tests exactly
    return EdgeNgramTokenizer(min_g, max_g, classes,
                              filters={"lowercase": False})


def test_edge_ngram_basic():
    # edge_ngram.rs:268-276
    assert _edge(2, 5).tokenize("Quick Fox") == [
        "Qu", "Qui", "Quic", "Quick", "Fo", "Fox"]


def test_edge_ngram_defaults():
    # edge_ngram.rs:278-287 (and manager.rs:499-512 default 1..2)
    assert _edge(1, 2).tokenize("Quick Fox") == ["Q", "Qu", "F", "Fo"]
    d = tokenizer_from_config({"type": "edge_ngram",
                               "lowercase": False})
    assert d.tokenize("Quick Fox") == ["Q", "Qu", "F", "Fo"]


def test_edge_ngram_short_words_skipped():
    # edge_ngram.rs:289-293: words < min_gram vanish entirely
    assert _edge(3, 5).tokenize("I am here") == ["her", "here"]


def test_edge_ngram_empty_and_unicode():
    assert _edge(1, 3).tokenize("") == []
    # edge_ngram.rs:303-309: char-counted grams, not bytes
    assert _edge(1, 4).tokenize("café") == ["c", "ca", "caf", "café"]


def test_edge_ngram_token_chars_punctuation():
    # edge_ngram.rs:311-325: hyphen joins the word when punctuation is a
    # token class — and 'Quick-Fox' is 9 chars so grams stop at max 5
    assert _edge(2, 5, ("letter", "punctuation")).tokenize("Quick-Fox") == [
        "Qu", "Qui", "Quic", "Quick"]


def test_edge_ngram_digits():
    # edge_ngram.rs:327-336
    assert _edge(1, 3).tokenize("abc 123") == [
        "a", "ab", "abc", "1", "12", "123"]


def test_edge_ngram_positions_per_word():
    # edge_ngram.rs:338-341: all grams of word i carry position i
    toks = _edge(2, 4).tokenize_tokens("hello world")
    got = [(t.text, t.position) for t in toks]
    assert got == [("he", 0), ("hel", 0), ("hell", 0),
                   ("wo", 1), ("wor", 1), ("worl", 1)]
    # a skipped short word does not consume a position
    toks = _edge(3, 5).tokenize_tokens("I am here now")
    assert {(t.text, t.position) for t in toks} >= {("her", 0), ("now", 1)}


def test_edge_ngram_unknown_class_errors():
    with pytest.raises(ValueError, match="unknown token_chars class"):
        EdgeNgramTokenizer(1, 2, ("letter", "vowel"))


def test_edge_ngram_phrase_across_words():
    """Word positions make cross-word phrase queries meaningful: the gram
    'qui' directly precedes 'fox' as word positions 0 and 1."""
    schema = IndexSchema.build("id", t={
        "type": "text",
        "tokenizer": {"type": "edge_ngram", "min_gram": 2, "max_gram": 5}})
    tab = pa.table({"id": pa.array([1, 2], pa.int64()),
                    "t": pa.array(["Quick Fox", "Fox Quick tail"])})
    s = Searcher(build_segment(tab, schema), schema)
    # raw-token phrase (### ARRAY[...]): grams are NOT re-analyzed
    assert _ids(s, s.eval(pdb.phrase_array("t", ["qui", "fox"]))) == [1]
    assert _ids(s, s.eval(pdb.phrase_array("t", ["fox", "qui"]))) == [2]
