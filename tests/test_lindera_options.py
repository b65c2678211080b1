"""LinderaOptions conformance: keep_whitespace / nfkc / reading_form
(ref `tokenizers/src/lindera.rs:60-120` and its option tests at
`lindera.rs:428-516`).  The real lindera stack is not installable in
this container, so these mirror the reference's option INVARIANTS over
the bundled lexeme lattices: nfkc must change the token stream (and
normalize full-width forms to ASCII), reading_form must substitute
dictionary readings while leaving unknown words' surfaces alone (never
emitting the `*` placeholder), keep_whitespace must add whitespace
tokens.  Documented fallback difference: unknown full-width digit runs
stay whole, where ipadic splits them singly.
"""

from paradedb_ray.text.tokenizers import tokenizer_from_config


def _segs(cfg, text):
    return [w for w, _, _ in tokenizer_from_config(cfg)._segments(text)]


def test_ja_nfkc_changes_stream():  # lindera.rs:429-445
    ja = {"type": "japanese_lindera"}
    off = _segs(ja, "ＡＢＣ１２３")
    on = _segs({**ja, "nfkc": True}, "ＡＢＣ１２３")
    assert on == ["ABC", "123"]
    # alpha/digit boundary as in the reference; the digit run stays
    # whole where ipadic splits unknown full-width digits singly
    assert off == ["ＡＢＣ", "１２３"]
    assert off != on, "nfkc must change the token stream"


def test_ja_nfkc_offsets_point_into_original():
    tok = tokenizer_from_config({"type": "japanese_lindera", "nfkc": True})
    text = "ＡＢＣ１２３の東京"
    segs = tok._segments(text)
    # token texts are normalized, offsets slice the ORIGINAL text
    assert [(w, text[a:b]) for w, a, b in segs] == [
        ("ABC", "ＡＢＣ"), ("123", "１２３"), ("の", "の"),
        ("東京", "東京")]


def test_ja_reading_form():  # lindera.rs:447-466
    ja = {"type": "japanese_lindera"}
    assert _segs(ja, "日本語") == ["日本語"]
    assert _segs({**ja, "reading_form": True}, "日本語") == ["ニホンゴ"]


def test_ja_reading_form_keeps_unknown_words():  # lindera.rs:489-516
    on = {"type": "japanese_lindera", "reading_form": True}
    toks = _segs(on, "ParadeDB は Postgres 用の検索エンジンです。")
    assert toks == ["ParadeDB", "ハ", "Postgres", "ヨウ", "ノ",
                    "ケンサク", "エンジン", "デス"]
    assert "*" not in toks


def test_ko_reading_form():  # lindera.rs:467-487
    ko = {"type": "korean_lindera"}
    assert _segs(ko, "韓國") == ["韓國"]
    assert _segs({**ko, "reading_form": True}, "韓國") == ["한국"]


def test_keep_whitespace():  # lindera.rs:398-415 (11 vs 8 tokens)
    ko = {"type": "korean_lindera"}
    base = _segs(ko, "매우 멋진 단어입니다")
    kept = _segs({**ko, "keep_whitespace": True}, "매우 멋진 단어입니다")
    assert base == ["매우", "멋진", "단어", "입니다"]
    assert kept == ["매우", " ", "멋진", " ", "단어", "입니다"]


def test_options_compose():
    # nfkc + reading_form together: normalize, segment, substitute,
    # offsets still in the original text
    tok = tokenizer_from_config({"type": "japanese_lindera",
                                 "nfkc": True, "reading_form": True})
    text = "日本語ＡＢＣ"
    segs = tok._segments(text)
    assert [(w, text[a:b]) for w, a, b in segs] == [
        ("ニホンゴ", "日本語"), ("ABC", "ＡＢＣ")]
