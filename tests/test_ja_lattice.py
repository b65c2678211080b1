"""Token-level goldens for the japanese_lindera lexeme lattice
(`text/ja_dict.py`) over the reference's `tests/tests/lindera.rs`
fixture sentences.

Expected sequences are hand-derived mecab-ipadic segmentations (the
dictionary lindera embeds, ref `tokenizers/src/lindera.rs:135-156`) —
the library itself is not installable in this container, so these
goldens encode the documented ipadic behavior: lexeme boundaries at
kanji+okurigana forms (新しい, 祭り, 食べ物), noun+suffix splits
(中心|部, 今週|末), separate auxiliary morphemes (開催|さ|れ|ます,
見|られ|まし|た, でし|た), and whole-run grouping of katakana.
"""

import pytest

from paradedb_ray.text.tokenizers import tokenizer_from_config

GOLDENS = [
    ("佐藤健", ["佐藤", "健"]),
    ("鈴木一郎", ["鈴木", "一郎"]),
    ("高橋花子", ["高橋", "花子"]),
    ("東京の新しいカフェ", ["東京", "の", "新しい", "カフェ"]),
    ("サッカー試合レビュー", ["サッカー", "試合", "レビュー"]),
    ("地元の祭り", ["地元", "の", "祭り"]),
    ("東京の中心部に新しいカフェがオープンしました。"
     "モダンなデザインとユニークなコーヒーが特徴です。",
     ["東京", "の", "中心", "部", "に", "新しい", "カフェ", "が",
      "オープン", "し", "まし", "た", "モダン", "な", "デザイン",
      "と", "ユニーク", "な", "コーヒー", "が", "特徴", "です"]),
    ("昨日のサッカー試合では素晴らしいゴールが見られました。"
     "終了間際のドラマチックな展開がハイライトでした。",
     ["昨日", "の", "サッカー", "試合", "で", "は", "素晴らしい",
      "ゴール", "が", "見", "られ", "まし", "た", "終了", "間際",
      "の", "ドラマチック", "な", "展開", "が", "ハイライト",
      "でし", "た"]),
    ("今週末に地元で祭りが開催されます。"
     "様々な食べ物とパフォーマンスが用意されています。",
     ["今週", "末", "に", "地元", "で", "祭り", "が", "開催", "さ",
      "れ", "ます", "様々", "な", "食べ物", "と", "パフォーマンス",
      "が", "用意", "さ", "れ", "て", "い", "ます"]),
]


@pytest.mark.parametrize("text,want", GOLDENS,
                         ids=[g[0][:12] for g in GOLDENS])
def test_ja_lattice_fixture_goldens(text, want):
    tok = tokenizer_from_config({"type": "japanese_lindera"})
    got = [w for w, _, _ in tok._segments(text)]
    assert got == want


def test_ja_lattice_offsets_exact():
    tok = tokenizer_from_config({"type": "japanese_lindera"})
    for text, _ in GOLDENS:
        for w, a, b in tok._segments(text):
            assert text[a:b] == w


def test_ja_lattice_unknown_handling():
    tok = tokenizer_from_config({"type": "japanese_lindera"})

    def cut(s):
        return [w for w, _, _ in tok._segments(s)]

    # unknown katakana groups as a whole run (MeCab unknown grouping)
    assert cut("バズワード") == ["バズワード"]
    # dict word + unknown katakana remainder does NOT get swallowed
    assert cut("サッカーボール") == ["サッカー", "ボール"]
    # ties prefer the longer FIRST token: 今週|末, not 今|週末
    assert cut("今週末") == ["今週", "末"]
    # mixed Latin stays whole
    assert cut("abc 東京123") == ["abc", "東京", "123"]
