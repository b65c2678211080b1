"""Token-level goldens for the korean_lindera lexeme lattice
(`text/ko_dict.py`) over the reference's `tests/tests/lindera.rs`
fixture sentences.

Expected sequences are hand-derived mecab-ko-dic-style segmentations
(the dictionary lindera embeds, ref `tokenizers/src/lindera.rs:154-156`)
— the library itself is not installable in this container, so these
goldens encode the documented ko-dic behavior: noun + josa splits
(서울|의, 경기|에서), noun + copula/ending chains (특징|입니다,
하이라이트|였|습니다), derivational suffix chains (현대|적|인,
준비|되|어), fused ㅂ니다/ㄴ contractions kept whole (열립니다, 됩니다,
새로운, 멋진 — the contraction cannot be sliced at a syllable
boundary), and whole-run grouping of unknown hangul (person names).
"""

import pytest

from paradedb_ray.text.tokenizers import tokenizer_from_config

GOLDENS = [
    # author names: OOV hangul groups as a whole run (ko-dic unknown
    # handling; none of these are dictionary entries)
    ("김민준", ["김민준"]),
    ("이하은", ["이하은"]),
    ("박지후", ["박지후"]),
    # titles
    ("서울의 새로운 카페", ["서울", "의", "새로운", "카페"]),
    ("축구 경기 리뷰", ["축구", "경기", "리뷰"]),
    ("지역 축제 개최 소식", ["지역", "축제", "개최", "소식"]),
    # the lindera.rs token-count fixture sentence (8 non-whitespace
    # tokens in the reference incl. the two periods the filter chain
    # strips here): 일본|입니다|매우|멋진|단어|입니다
    ("일본입니다. 매우 멋진 단어입니다.",
     ["일본", "입니다", "매우", "멋진", "단어", "입니다"]),
    # messages
    ("서울 중심부에 새로운 카페가 문을 열었습니다. "
     "현대적인 디자인과 독특한 커피 선택이 특징입니다.",
     ["서울", "중심", "부", "에", "새로운", "카페", "가", "문", "을",
      "열었", "습니다", "현대", "적", "인", "디자인", "과", "독특",
      "한", "커피", "선택", "이", "특징", "입니다"]),
    ("어제 열린 축구 경기에서 화려한 골이 터졌습니다. "
     "마지막 순간의 반전이 경기의 하이라이트였습니다.",
     ["어제", "열린", "축구", "경기", "에서", "화려", "한", "골",
      "이", "터졌", "습니다", "마지막", "순간", "의", "반전", "이",
      "경기", "의", "하이라이트", "였", "습니다"]),
    ("이번 주말 지역 축제가 열립니다. "
     "다양한 음식과 공연이 준비되어 있어 기대가 됩니다.",
     ["이번", "주말", "지역", "축제", "가", "열립니다", "다양", "한",
      "음식", "과", "공연", "이", "준비", "되", "어", "있", "어",
      "기대", "가", "됩니다"]),
]


@pytest.mark.parametrize("text,want", GOLDENS,
                         ids=[g[0][:12] for g in GOLDENS])
def test_ko_lattice_fixture_goldens(text, want):
    tok = tokenizer_from_config({"type": "korean_lindera"})
    got = [w for w, _, _ in tok._segments(text)]
    assert got == want


def test_ko_lattice_offsets_exact():
    tok = tokenizer_from_config({"type": "korean_lindera"})
    for text, _ in GOLDENS:
        for w, a, b in tok._segments(text):
            assert text[a:b] == w


def test_ko_lattice_suffix_constraint():
    tok = tokenizer_from_config({"type": "korean_lindera"})

    def cut(s):
        return [w for w, _, _ in tok._segments(s)]

    # suffixes are eojeol-final: a josa syllable inside an unknown name
    # must NOT split it (이 is a josa, 이하은 is a name)
    assert cut("이하은") == ["이하은"]
    # ...but the same syllable after a known stem DOES split
    assert cut("골이") == ["골", "이"]
    # stacked suffix chains peel in order (josa + topic marker)
    assert cut("경기에서는") == ["경기", "에서", "는"]
    # an ending chain after a known stem peels morpheme by morpheme
    assert cut("확인했습니다") == ["확인", "했", "습니다"]
    # an unknown stem absorbs a fused pre-final ending (the same
    # unknown-word convention as the 열었/터졌 inferred forms) but the
    # final polite ending still peels
    assert cut("발전했습니다") == ["발전했", "습니다"]
    # mixed Latin / digits stay whole
    assert cut("abc 서울123") == ["abc", "서울", "123"]


def test_ko_lattice_conformance_queries_unbroken():
    # the behavioral lindera.rs mirrors rely on these exact tokens
    tok = tokenizer_from_config({"type": "korean_lindera"})

    def cut(s):
        return [w for w, _, _ in tok._segments(s)]

    assert "경기" in cut("축구 경기 리뷰")
    got = cut("이번 주말 지역 축제가 열립니다.")
    i = got.index("지역")
    assert got[i + 1] == "축제"
