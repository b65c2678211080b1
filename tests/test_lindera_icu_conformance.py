"""Behavioral mirror of the reference's lindera + ICU tokenizer goldens.

The reference asserts SEARCH RESULTS (which row ids match which fielded
queries), not token dumps — `tests/tests/lindera.rs` (korean / chinese
/ japanese lindera over three 3-row tables) and `tests/tests/icu.rs`
(arabic / amharic / greek / czech posts + a phrase, a slop phrase and a
snippet).  Fixture rows are copied from
`tests/src/fixtures/tables/icu_*_posts.rs` and the inline tables in
`lindera.rs`.

The real lindera/ICU libraries are not in this container; these tests
pin that the documented fallbacks (dictionary-lattice zh cut, closed
class okurigana/joshi handling for ja, josa splitting for ko, UAX#29
for ICU's non-dictionary scripts) reproduce every golden assertion.
"""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.index.snippet import (SnippetConfig, generate,
                                        query_terms_for_field)
from paradedb_ray.query import ast
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import IndexSchema


def _posts(tokenizer_type, rows):
    tok = {"type": tokenizer_type}
    schema = IndexSchema.build(
        key_field="id", id={"type": "i64", "fast": True},
        author={"type": "text", "tokenizer": tok, "record": "position"},
        title={"type": "text", "tokenizer": tok, "record": "position"},
        message={"type": "text", "tokenizer": tok, "record": "position"})
    t = pa.table({"id": pa.array(range(1, len(rows) + 1), pa.int64()),
                  "author": pa.array([r[0] for r in rows]),
                  "title": pa.array([r[1] for r in rows]),
                  "message": pa.array([r[2] for r in rows])})
    seg = build_segment(t, schema)
    return schema, seg, Searcher(seg, schema)


def _ids(seg, hits):
    return sorted(seg.table.column("id")[i].as_py() for i in hits.ids)


# --- lindera.rs fixtures --------------------------------------------------

KOREAN = [
    ("김민준", "서울의 새로운 카페",
     "서울 중심부에 새로운 카페가 문을 열었습니다. 현대적인 디자인과 독특한 "
     "커피 선택이 특징입니다."),
    ("이하은", "축구 경기 리뷰",
     "어제 열린 축구 경기에서 화려한 골이 터졌습니다. 마지막 순간의 반전이 "
     "경기의 하이라이트였습니다."),
    ("박지후", "지역 축제 개최 소식",
     "이번 주말 지역 축제가 열립니다. 다양한 음식과 공연이 준비되어 있어 "
     "기대가 됩니다."),
]

CHINESE = [
    ("李华", "北京的新餐馆",
     "北京市中心新开了一家餐馆，以其现代设计和独特的菜肴选择而闻名。"),
    ("张伟", "篮球比赛回顾",
     "昨日篮球比赛精彩纷呈，尤其是最后时刻的逆转成为了比赛的亮点。"),
    ("王芳", "本地文化节",
     "本周末将举行一个地方文化节，预计将有各种食物和表演。"),
]

JAPANESE = [
    ("佐藤健", "東京の新しいカフェ",
     "東京の中心部に新しいカフェがオープンしました。モダンなデザインと"
     "ユニークなコーヒーが特徴です。"),
    ("鈴木一郎", "サッカー試合レビュー",
     "昨日のサッカー試合では素晴らしいゴールが見られました。終了間際の"
     "ドラマチックな展開がハイライトでした。"),
    ("高橋花子", "地元の祭り",
     "今週末に地元で祭りが開催されます。様々な食べ物とパフォーマンスが"
     "用意されています。"),
]


def test_lindera_korean():  # lindera.rs::lindera_korean_tokenizer
    schema, seg, s = _posts("korean_lindera", KOREAN)
    assert _ids(seg, s.eval(ast.ParseWithField("author", "김민준"))) == [1]
    assert _ids(seg, s.eval(ast.ParseWithField("title", '"경기"'))) == [2]
    assert _ids(seg, s.eval(
        ast.ParseWithField("message", '"지역 축제"'))) == [3]


def test_lindera_chinese():  # lindera.rs::lindera_chinese_tokenizer
    schema, seg, s = _posts("chinese_lindera", CHINESE)
    assert _ids(seg, s.eval(ast.ParseWithField("author", "华"))) == [1]
    assert _ids(seg, s.eval(ast.ParseWithField("title", "北京"))) == [1]
    assert _ids(seg, s.eval(ast.ParseWithField("message", "文化节"))) == [3]


def test_lindera_japanese():  # lindera.rs::lindera_japenese_tokenizer
    schema, seg, s = _posts("japanese_lindera", JAPANESE)
    assert _ids(seg, s.eval(ast.ParseWithField("author", "佐藤"))) == [1]
    assert _ids(seg, s.eval(ast.ParseWithField("title", "サッカー"))) == [2]
    assert _ids(seg, s.eval(ast.ParseWithField("message", "祭り"))) == [3]


# --- icu.rs fixtures ------------------------------------------------------

ARABIC = [
    ("فاطمة", "رحلة إلى الشرق",
     "في هذا المقال، سنستكشف رحلة مثيرة إلى الشرق ونتعرف على ثقافات مختلفة "
     "وتاريخها الغني"),
    ("محمد", "رحلة إلى السوق مع أبي",
     "مرحباً بك في المقالة الأولى. أتمنى أن تجد المحتوى مفيدًا ومثيرًا "
     "للاهتمام"),
    ("أحمد", "نصائح للنجاح",
     "هنا نقدم لك بعض النصائح القيمة لتحقيق النجاح في حياتك المهنية "
     "والشخصية. استفد منها وحقق أهدافك"),
]

AMHARIC = [
    ("መሐመድ", "መደመር ተጨማሪ",
     "እንኳን ነበር በመደመር ተጨማሪ፣ በደስታ እና በልዩ ዝናብ ይከብዳል።"),
    ("ፋትስ", "የምስሉ ማህበረሰብ",
     "በዚህ ግዜ የምስሉ ማህበረሰብ እና እንደዚህ ዝናብ ይችላል።"),
    ("አለም", "መረጃዎች ለመማር",
     "እነዚህ መረጃዎች የምስሉ ለመማር በእያንዳንዱ ላይ ይመልከቱ።"),
]

GREEK = [
    ("Δημήτρης", "Η πρώτη άρθρο",
     "Καλώς ήρθες στο πρώτο άρθρο. Ελπίζω να βρεις το περιεχόμενο χρήσιμο "
     "και ενδιαφέρον."),
    ("Σοφία", "Ταξίδι στην Ανατολή",
     "Σε αυτό το άρθρο, θα εξερευνήσουμε ένα συναρπαστικό ταξίδι στην "
     "Ανατολή και θα γνωρίσουμε διάφορες πολιτισμικές και ιστορικές πτυχές."),
    ("Αλέξανδρος", "Συμβουλές για την επιτυχία",
     "Εδώ παρέχουμε μερικές πολύτιμες συμβουλές για την επίτευξη επιτυχίας "
     "στην επαγγελματική και προσωπική σας ζωή. Επωφεληθείτε από αυτές και "
     "επιτύχετε τους στόχους σας."),
]

CZECH = [
    ("Tomáš", "kouše sendvič", "červená karkulka v lese šla sbírat dříví"),
    ("Eliška", "zdravý banán", "zpívat srdcem do světa"),
    ("Adéla", "bylo nebylo", "ve ztraceném tajném městě žil velký mág"),
]


def test_icu_arabic():  # icu.rs::test_icu_arabic_tokenizer
    schema, seg, s = _posts("icu", ARABIC)
    assert _ids(seg, s.eval(ast.ParseWithField("author", '"محمد"'))) == [2]
    assert _ids(seg, s.eval(ast.ParseWithField("title", '"السوق"'))) == [2]
    assert _ids(seg, s.eval(
        ast.ParseWithField("message", '"في"'))) == [1, 2, 3]


def test_icu_amharic():  # icu.rs::test_icu_amharic_tokenizer
    schema, seg, s = _posts("icu", AMHARIC)
    assert _ids(seg, s.eval(ast.ParseWithField("author", '"አለም"'))) == [3]
    assert _ids(seg, s.eval(ast.ParseWithField("title", '"ለመማር"'))) == [3]
    assert _ids(seg, s.eval(ast.ParseWithField("message", '"ዝናብ"'))) == [1, 2]


def test_icu_greek():  # icu.rs::test_icu_greek_tokenizer
    schema, seg, s = _posts("icu", GREEK)
    assert _ids(seg, s.eval(ast.ParseWithField("author", '"Σοφία"'))) == [2]
    assert _ids(seg, s.eval(ast.ParseWithField("title", '"επιτυχία"'))) == [3]
    assert _ids(seg, s.eval(
        ast.ParseWithField("message", '"συμβουλές"'))) == [3]


def test_icu_czech():  # icu.rs::test_icu_czech_tokenizer
    schema, seg, s = _posts("icu", CZECH)
    assert _ids(seg, s.eval(ast.ParseWithField("author", '"Tomáš"'))) == [1]
    assert _ids(seg, s.eval(ast.ParseWithField("title", '"zdravý"'))) == [2]
    assert _ids(seg, s.eval(
        ast.ParseWithField("message", '"velký"~100'))) == [3]


def test_icu_czech_content_phrase():  # icu.rs::test_icu_czech_content_...
    schema, seg, s = _posts("icu", CZECH)
    assert _ids(seg, s.eval(
        pdb.phrase("message", ["šla", "sbírat"]))) == [1]


def test_icu_snippet():  # icu.rs::test_icu_snippet
    schema, seg, s = _posts("icu", ARABIC)
    q = ast.ParseWithField("title", "السوق")
    hits = s.eval(q)
    terms = query_terms_for_field(q, schema, "title")
    cfg = SnippetConfig(field="title")
    out = []
    for doc in hits.ids.tolist():
        txt = seg.table.column("title")[doc].as_py()
        out.append((seg.table.column("id")[doc].as_py(),
                    generate(txt, schema.field("title").analyzer,
                             terms, cfg)))
    assert out == [(2, "رحلة إلى <b>السوق</b> مع أبي")]


def test_lindera_offsets_reproduce_token_text():
    # snippets rely on (start, end) spans slicing back to the token text;
    # the okurigana attachment and josa splits must keep them exact
    import random

    from paradedb_ray.text.tokenizers import tokenizer_from_config

    rng = random.Random(42)
    pools = ["祭り地元で開催されが", "축제가지역 음식과에서",
             "北京文化节的李华", "サッカー試合のレビューが",
             "abc 123 ", "。、 "]
    for typ in ("chinese_lindera", "japanese_lindera", "korean_lindera"):
        tok = tokenizer_from_config({"type": typ})
        for _ in range(300):
            s = "".join(rng.choice(pools[rng.randrange(len(pools))])
                        for _ in range(rng.randrange(0, 40)))
            for w, a, b in tok._segments(s):
                assert s[a:b] == w, (typ, s, w, a, b)
