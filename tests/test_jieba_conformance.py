"""Mirror of `pg_regress/expected/jieba_chinese_convert.out` — the jieba
tokenizer with bundled chinese_convert tables + dictionary segmentation
(`text/cjk_dict.py`).

All rows of the golden are mirrored, including test 4 (s2tw over
out-of-vocabulary Traditional text), whose grouping {鼠,標裡面,硅二極,管壞}
exercises the bundled finalseg-style BMES Viterbi (round 4) — jieba's
published start/transition constants plus a hand-curated emission table.
"""

import pyarrow as pa

from paradedb_ray.query import builders as pdb
from paradedb_ray.text.tokenizers import tokenizer_from_config


def _tok(text, **cfg):
    return tokenizer_from_config({"type": "jieba", **cfg}).tokenize(text)


def test_t2s_tokenization():  # golden test 1
    assert _tok("繁體中文測試", chinese_convert="t2s") == [
        "繁体", "中文", "繁体中文", "测试"]


def test_s2t_tokenization():  # golden test 2
    assert _tok("简体中文测试", chinese_convert="s2t") == [
        "簡體", "中文", "測試"]


def test_tw2s_vocabulary():  # golden tests 3 + 5 (tw2s == tw2sp here)
    want = ["鼠标", "里面", "的", "硅", "二极管", "坏", "了"]
    assert _tok("鼠標里面的硅二極管壞了", chinese_convert="tw2s") == want
    assert _tok("鼠標里面的硅二極管壞了", chinese_convert="tw2sp") == want


def test_s2tw_oov_hmm_grouping():  # golden test 4
    # Traditional text after s2tw conversion is out-of-vocabulary for the
    # (simplified) dictionary; the BMES Viterbi produces jieba's exact
    # context-dependent grouping — contrast with test 13 where the same
    # 鼠標 standalone stays ONE token
    assert _tok("鼠标里面的硅二极管坏了", chinese_convert="s2tw") == [
        "鼠", "標裡面", "的", "硅二極", "管壞", "了"]


def test_s2tw_is_character_conversion():  # golden test 13
    # the reference's own golden shows NO Taiwan vocabulary substitution
    # (鼠标 -> 鼠標, not 滑鼠) — character conversion only
    assert _tok("鼠标", chinese_convert="s2tw") == ["鼠標"]
    assert _tok("硬盘", chinese_convert="s2tw") == ["硬盤"]
    assert _tok("软件", chinese_convert="s2tw") == ["軟件"]
    assert _tok("信息", chinese_convert="s2tw") == ["信息"]


def test_filters_on_converted_tokens():  # golden test 14 (byte lengths)
    assert _tok("繁體中文測試", chinese_convert="t2s",
                remove_short=2, remove_long=10) == ["繁体", "中文", "测试"]


# --- golden tests 6-12: the indexed-table queries ------------------------

_TITLES = ["繁體標題", "简体标题", "運動鞋", "运动鞋", "電腦配件", "电脑配件"]
_CONTENT = ["這是繁體中文的內容測試", "这是简体中文的内容测试",
            "適合跑步和運動的鞋子", "适合跑步和运动的鞋子",
            "鼠標、鍵盤、顯示器", "鼠标、键盘、显示器"]


def _searcher(convert):
    from paradedb_ray.index import Searcher, build_segment
    from paradedb_ray.schema import I64, TEXT, IndexSchema

    schema = IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        title={"type": TEXT,
               "tokenizer": {"type": "jieba", "chinese_convert": convert}},
        content={"type": TEXT,
                 "tokenizer": {"type": "jieba", "chinese_convert": convert}})
    t = pa.table({"id": pa.array(range(1, 7), pa.int64()),
                  "title": pa.array(_TITLES),
                  "content": pa.array(_CONTENT)})
    seg = build_segment(t, schema)
    return seg, Searcher(seg, schema)


def _ids(seg, hits):
    return sorted(seg.table.column("id")[i].as_py() for i in hits.ids)


def test_t2s_index_queries():  # golden tests 6-11
    seg, s = _searcher("t2s")
    # Traditional and Simplified query forms both match both scripts
    assert _ids(seg, s.eval(pdb.match_disjunction("title", "標題"))) == [1, 2]
    assert _ids(seg, s.eval(pdb.match_disjunction("title", "标题"))) == [1, 2]
    assert _ids(seg, s.eval(pdb.match_disjunction("title", "運動"))) == [3, 4]
    assert _ids(seg, s.eval(pdb.match_disjunction("title", "运动"))) == [3, 4]
    assert _ids(seg, s.eval(pdb.match_disjunction("content", "鼠標"))) == [5, 6]
    assert _ids(seg, s.eval(pdb.match_disjunction("content", "鼠标"))) == [5, 6]


def test_s2t_index_queries():  # golden test 12
    seg, s = _searcher("s2t")
    assert _ids(seg, s.eval(pdb.match_disjunction("title", "标题"))) == [1, 2]


# --- token_trim_filter.out: jieba whitespace tokens + trim filter ---------

def test_jieba_emits_whitespace_tokens():  # row 1
    # jieba cut() emits whitespace and punctuation as tokens; only the
    # trim filter removes the whitespace ones
    assert _tok("this is a test.") == [
        "this", " ", "is", " ", "a", " ", "test", "."]


def test_trim_removes_whitespace_tokens():  # rows 2-3
    assert _tok("this is a test.", trim=True) == ["this", "is", "a", "test", "."]
    assert _tok("   ", trim=True) == []


def test_trim_unicode_whitespace():  # rows 4-5 (NBSP, ideographic space)
    assert _tok("\u00a0foo\u00a0") == ["\u00a0", "foo", "\u00a0"]
    assert _tok("\u00a0foo\u00a0", trim=True) == ["foo"]
    assert _tok("\u3000漢字\u3000", trim=True) == ["漢字"]
