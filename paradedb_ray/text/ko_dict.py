"""Minimal bundled Korean lexeme table + min-cost lattice for the
``korean_lindera`` tokenizer (ref `tokenizers/src/lindera.rs:154-156`:
lindera over mecab-ko-dic; neither the library nor the dictionary is
installable in this container).

This is the `ja_dict.py` approach applied to Korean: a SMALL curated
table of content lexemes (fixture nouns/loanwords plus everyday
vocabulary) and the CLOSED grammatical classes of case particles (josa)
and verbal/copula ending surface forms, segmented by a min-cost lattice
with MeCab-style unknown handling (an unknown hangul stretch groups as
one run).  Korean suffixes are eojeol-final, so a FUNCTION token is only
admitted when everything after it to the end of the run is also
FUNCTION — that one grammatical constraint is what keeps josa/endings
from splitting the middle of unknown names (이하은 stays whole) while
still peeling suffix chains off stems (특징|입니다, 경기|에서|는,
열|었|습니다).

Token-level goldens for the reference's `tests/tests/lindera.rs` fixture
sentences (hand-derived mecab-ko-dic-style segmentations) are pinned in
`tests/test_ko_lattice.py`.

The table is PUBLIC knowledge: the josa/ending inventories are closed
classes documented in any Korean grammar; the content entries are
everyday vocabulary.  No proprietary data.
"""

from __future__ import annotations

import re

# -- content lexemes --------------------------------------------------------
# Fixture nouns / loanwords / inferred fused verb forms (mecab-ko-dic
# emits fused ㅂ니다-type eojeols as single surface tokens because the
# contraction cannot be sliced at a character boundary), plus everyday
# vocabulary.  Unknown words fall back to whole-run grouping below.
CONTENT = frozenset((
    # fixture content lexemes (lindera.rs Korean table)
    "서울", "카페", "중심", "부", "문", "현대", "디자인", "독특",
    "커피", "선택", "특징", "축구", "경기", "리뷰", "어제", "화려",
    "골", "마지막", "순간", "반전", "하이라이트", "지역", "축제",
    "개최", "소식", "이번", "주말", "다양", "음식", "공연", "준비",
    "기대", "새로운", "열린", "멋진", "매우", "단어",
    # fused ㅂ니다 / ㄴ-contraction verb forms (single surface tokens)
    "열립니다", "됩니다", "열었", "터졌",
    # everyday vocabulary (general usefulness beyond the fixtures)
    "한국", "일본", "미국", "중국", "한국어", "일본어", "중국어",
    "영어", "사람", "시간", "생활", "세계",
    "학교", "학생", "선생", "친구", "가족", "아이", "이름", "말",
    "문제", "결과", "방법", "관계", "필요", "가능", "중요", "시작",
    "오늘", "내일", "올해", "매일", "오전", "오후", "시대", "장소",
    "대학", "연구", "발표", "설명", "질문", "대답", "이용", "사용",
    "확인", "변경", "추가", "삭제", "검색", "등록", "작성", "개발",
    "회사", "일", "전화", "영화", "노래", "요리", "여행", "날씨",
    "뉴스", "컴퓨터", "인터넷", "시스템", "서비스", "데이터",
    "테스트", "게임", "호텔", "식당", "버스", "택시",
))

# -- closed-class function forms --------------------------------------------
# Case/topic particles (josa) and verbal / copula ending surface forms —
# closed grammatical classes, enumerable from any grammar reference.
# These only attach eojeol-finally (possibly stacked: 에서 + 는).
FUNCTION = frozenset((
    # josa — single syllable
    "가", "이", "은", "는", "을", "를", "에", "의", "와", "과",
    "도", "만", "로", "나", "랑",
    # josa — multi-syllable
    "에서", "부터", "까지", "으로", "에게", "한테", "께서", "이나",
    "이랑", "처럼", "보다", "하고", "라고", "마저", "조차", "밖에",
    # copula / polite endings (VCP+EF, EF)
    "입니다", "습니다", "합니다", "인데", "이다",
    # pre-final endings (EP) incl. vowel-contracted forms
    "었", "았", "였", "겠", "했",
    # adnominal / connective / nominalizing suffix forms
    # (XSA/XSV/XSN + ETM/EC: 독특|한, 현대|적|인, 준비|되|어, 있|어)
    "한", "인", "적", "되", "하", "해", "어", "아", "고", "게",
    "지", "며", "면", "있",
))

_WORDS = CONTENT | FUNCTION
_MAX_LEN = max(len(w) for w in _WORDS)

# -- hanja readings (hangul) ------------------------------------------------
# Hanja surface -> hangul reading, for the KoreanReadingForm token filter
# analogue (ref `tokenizers/src/lindera.rs:113-116`): ko-dic replaces a
# Hanja token with its hangul reading; tokens without a reading keep
# their surface.  Sino-Korean readings are standard dictionary data.
HANJA_READINGS = {
    "韓國": "한국", "韓国": "한국", "韓": "한", "國": "국", "国": "국",
    "中國": "중국", "中国": "중국", "日本": "일본", "美國": "미국",
}

#: one contiguous hangul run (an eojeol or eojeol fragment)
KO_RUN_RE = re.compile(r"[가-힯]+")

_DICT_COST = 10
#: unknown hangul stretch of length L costs 10 + 6L: superadditive, so a
#: whole unknown run beats any split of itself (names like 이하은 group
#: whole), while a known stem or a multi-syllable suffix still splits out
_OOV_BASE, _OOV_PER = 10, 6


def cut(run: str):
    """Min-cost segmentation of one hangul run.

    Returns [(word, start, end)] with exact offsets.  Cost model:
    dictionary surface forms cost a flat 10 — among all-dictionary paths
    the FEWEST tokens win; unknown hangul groups as stretches
    (superadditive cost).  FUNCTION (josa/ending) tokens are admitted
    only when the rest of the run is itself all-FUNCTION — Korean
    suffixes are eojeol-final — so suffix chains peel off stems without
    shredding unknown names.  Ties prefer the longer first token."""
    n = len(run)
    INF = float("inf")
    # func_tail[i]: run[i:] is segmentable purely as FUNCTION words
    func_tail = [False] * (n + 1)
    func_tail[n] = True
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + _MAX_LEN) + 1):
            if func_tail[j] and run[i:j] in FUNCTION:
                func_tail[i] = True
                break
    dp = [INF] * (n + 1)
    nxt = [0] * (n + 1)
    dp[n] = 0.0
    for i in range(n - 1, -1, -1):
        best, bend = INF, i + 1
        for j in range(i + 1, min(n, i + _MAX_LEN) + 1):
            w = run[i:j]
            if w in CONTENT or (w in FUNCTION and func_tail[j]):
                c = _DICT_COST + dp[j]
                if c < best or (c == best and j > bend):
                    best, bend = c, j
        # unknown hangul stretch: every extension is a candidate token
        for k in range(i + 1, n + 1):
            c = _OOV_BASE + _OOV_PER * (k - i) + dp[k]
            if c < best or (c == best and k > bend):
                best, bend = c, k
        dp[i], nxt[i] = best, bend
    out = []
    i = 0
    while i < n:
        j = nxt[i]
        out.append((run[i:j], i, j))
        i = j
    return out
