"""Tokenizers + token-filter chain, re-implementing pg_search's tokenizer
surface (`/root/reference/tokenizers/src/manager.rs:348-425`) in pure Python.

Semantics anchors (behavior extracted by reading the reference, not ported
code):

* default text tokenizer = ``unicode_words`` with ``remove_emojis=false``
  (`manager.rs:436-443`): UAX#29 word-bound segments that contain a unicode
  word, plus whole-segment emoji (`unicode_words.rs:63-90`). Token text is
  the *raw segment* ("it's" stays "it's"); offsets are UTF-8 byte offsets;
  positions number kept tokens sequentially per document.
* filter chain order (`manager.rs:315-337`):
  token_length -> trim -> lowercase -> stemmer -> custom stopwords ->
  ascii_folding -> [tokenizer extras] -> alpha_num_only -> language stopwords.
  Only ``lowercase`` is on by default (`manager.rs:258-263`).

Golden test replicated in tests/test_tokenizers.py from
`tokenizers/src/unicode_words.rs:104-139`:
``"it's Paul's birthday today!  🎂  hurray!"`` ->
``["it's","Paul's","birthday","today","🎂","hurray"]``.

Filters that *remove* tokens (stopwords, length) leave position gaps, like
tantivy's filters, so phrase queries see the original positions.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass, field
from typing import Iterable, Optional

__all__ = [
    "Token",
    "Tokenizer",
    "UnicodeWordsTokenizer",
    "SimpleTokenizer",
    "WhitespaceTokenizer",
    "KeywordTokenizer",
    "LiteralTokenizer",
    "NgramTokenizer",
    "RegexTokenizer",
    "ChineseCompatibleTokenizer",
    "SourceCodeTokenizer",
    "tokenizer_from_config",
    "default_tokenizer",
]


@dataclass
class Token:
    text: str
    position: int
    offset_from: int  # char offset (use byte_offsets() for tantivy parity)
    offset_to: int


# ---------------------------------------------------------------------------
# UAX#29-ish word segmentation
# ---------------------------------------------------------------------------

_LETTER = r"[^\W\d_]"
_DIGIT = r"\d"
# MidLetter (colon, middle dot...) joins letter<.>letter; MidNumLet (period,
# apostrophes) joins both letter and digit contexts; MidNum (comma, semicolon)
# joins digit<.>digit.  (UAX#29 WB6/7/11/12.)
_MIDLETTER = "[:·‧״︓﹕：]"
_MIDNUMLET = "[.'‘’․﹒．＇]"
_MIDNUM = "[,;;։٬︐︔，；]"

_WORD_RE = re.compile(
    rf"\w+"
    rf"(?:"
    rf"(?:(?<={_LETTER})(?:{_MIDLETTER}|{_MIDNUMLET})(?={_LETTER})"
    rf"|(?<={_DIGIT})(?:{_MIDNUM}|{_MIDNUMLET})(?={_DIGIT}))"
    rf"\w+)*",
    re.UNICODE,
)

# Pictographic / emoji sequences: ranges covering the emoji blocks plus
# ZWJ/variation-selector/skin-tone/regional-indicator sequence glue.
_EMOJI_CORE = (
    "\U0001f000-\U0001f02f"
    "\U0001f0a0-\U0001f0ff"
    "\U0001f300-\U0001f5ff"
    "\U0001f600-\U0001f64f"
    "\U0001f680-\U0001f6ff"
    "\U0001f700-\U0001f77f"
    "\U0001f900-\U0001f9ff"
    "\U0001fa00-\U0001faff"
    "☀-➿"
    "⬀-⯿"
    "←-⇿"
    "⌀-⏿"
    "✀-➿"
    "©®‼⁉™ℹ"
)
#: modifiers that attach to the preceding emoji: variation selectors +
#: skin tones; ZWJ joins whole emoji into one sequence; regional
#: indicators pair up into flags.  Adjacent plain emoji are SEPARATE
#: tokens (unicode-segmentation word bounds; golden
#: `pg_regress/expected/unicode_words.out`: 🎂🚨👀 -> three tokens).
_EMOJI_MOD = "︎️\U0001f3fb-\U0001f3ff"
_EMOJI_RE = re.compile(
    rf"(?:[\U0001f1e6-\U0001f1ff]{{2}}"
    rf"|[{_EMOJI_CORE}][{_EMOJI_MOD}]*"
    rf"(?:‍[{_EMOJI_CORE}][{_EMOJI_MOD}]*)*)"
)


class Tokenizer:
    """Base class: subclasses implement raw segmentation; the filter chain is
    applied by :meth:`tokenize` / :meth:`tokenize_tokens`."""

    name = "base"

    #: True when the tokenizer assigns its own token positions (ngram /
    #: edge_ngram); sequential-by-index otherwise.  Positions are assigned
    #: BEFORE the filter chain runs and removing filters never renumber
    #: them (tantivy filter semantics).
    custom_positions = False

    def __init__(self, filters: Optional[dict] = None):
        self.filters = TokenFilterChain(filters or {}, lowercase_default=self.lowercase_default())

    def lowercase_default(self) -> bool:
        return True

    def _segments(self, text: str) -> Iterable[tuple[str, int, int]]:
        """Yield (raw_token_text, char_start, char_end)."""
        raise NotImplementedError

    #: regex for the ASCII texts-only fast path (None = always slow path)
    _fast_re = None

    def tokenize(self, text: str) -> list[str]:
        """Hot path: filtered token texts only (positions implicit by index
        when no removing filters are configured)."""
        # ASCII fast path: findall on the whole (lowercased) text — skips
        # match objects, per-token lower/trim, and emoji scanning.  Pure
        # ASCII lowercasing is 1:1 and never moves a word boundary, so the
        # result is byte-identical to the general path.
        f = self.filters
        rx = self._fast_re
        if (rx is not None and not f._removes and f._stem is None
                and not f.ascii_folding and text.isascii()):
            return rx.findall(text.lower() if f.lowercase else text)
        toks = [t for t, _, _ in self._segments(text)]
        return f.apply_texts(toks)

    def _segment_positions(self, segs):
        """Token positions parallel to ``segs`` (pre-filter).  Overridden
        by position-aware tokenizers (ngram / edge_ngram)."""
        return range(len(segs))

    def tokenize_tokens(self, text: str) -> list[Token]:
        """Full tokens with positions + char offsets (for phrase indexes and
        snippet generation)."""
        segs = list(self._segments(text))
        toks = [
            Token(t, p, s, e)
            for (t, s, e), p in zip(segs, self._segment_positions(segs))
        ]
        return self.filters.apply_tokens(toks)


class UnicodeWordsTokenizer(Tokenizer):
    name = "unicode_words"
    _fast_re = _WORD_RE

    def __init__(self, remove_emojis: bool = False, filters: Optional[dict] = None):
        super().__init__(filters)
        self.remove_emojis = remove_emojis

    def _segments(self, text: str):
        words = [(m.group(), m.start(), m.end()) for m in _WORD_RE.finditer(text)]
        if not self.remove_emojis:
            emo = [(m.group(), m.start(), m.end()) for m in _EMOJI_RE.finditer(text)]
            if emo:
                words = sorted(words + emo, key=lambda t: t[1])
        return words


class SimpleTokenizer(Tokenizer):
    """tantivy SimpleTokenizer: runs of alphanumeric characters."""

    name = "default"
    _RE = re.compile(r"[^\W_]+", re.UNICODE)
    _fast_re = _RE

    def _segments(self, text: str):
        return [(m.group(), m.start(), m.end()) for m in self._RE.finditer(text)]


class WhitespaceTokenizer(Tokenizer):
    name = "whitespace"
    _RE = re.compile(r"\S+")
    # ASCII lowering never creates/destroys whitespace, so findall on the
    # lowered text equals per-token lowering — fast path is exact
    _fast_re = _RE

    def _segments(self, text: str):
        return [(m.group(), m.start(), m.end()) for m in self._RE.finditer(text)]


class KeywordTokenizer(Tokenizer):
    """Whole value = one token (pg_search ``keyword`` / deprecated ``raw``)."""

    name = "keyword"

    def _segments(self, text: str):
        return [(text, 0, len(text))] if text else []


class LiteralTokenizer(KeywordTokenizer):
    """pg_search ``literal``: keyword with NO normalization at all."""

    name = "literal"

    def lowercase_default(self) -> bool:
        return False


class LiteralNormalizedTokenizer(KeywordTokenizer):
    name = "literal_normalized"


class NgramTokenizer(Tokenizer):
    """pg_search ``ngram``: tantivy's NgramTokenizer, wrapped so that
    positional queries work only when explicitly requested.

    Tantivy's tokenizer leaves every gram at position 0 (so phrase /
    proximity queries never match an ngram field); pg_search's wrapper
    (`tokenizers/src/ngram.rs:18-48`) emits sequential positions
    0,1,2,... when ``positions=true`` AND ``min_gram == max_gram`` —
    unequal grams with positions enabled are a build-time error."""

    name = "ngram"
    custom_positions = True

    def __init__(
        self,
        min_gram: int = 2,
        max_gram: int = 3,
        prefix_only: bool = False,
        positions: bool = False,
        filters: Optional[dict] = None,
    ):
        super().__init__(filters)
        if min_gram <= 0 or max_gram < min_gram:
            raise ValueError("invalid ngram bounds")
        if positions and min_gram != max_gram:
            # error string matches ngram.rs:39-42 / expected/ngram.out
            raise ValueError(
                "min_gram must equal max_gram when positions are enabled")
        self.min_gram, self.max_gram, self.prefix_only = min_gram, max_gram, prefix_only
        self.positions = positions

    def _segments(self, text: str):
        out = []
        n = len(text)
        starts = [0] if self.prefix_only else range(n)
        for s in starts:
            for g in range(self.min_gram, self.max_gram + 1):
                if s + g <= n:
                    out.append((text[s : s + g], s, s + g))
        return out

    def _segment_positions(self, segs):
        if self.positions:
            return range(len(segs))
        return (0,) * len(segs)


def _edge_char_pred(classes: tuple) -> "callable":
    """Predicate for the reference's TokenCharClass matching
    (`tokenizers/src/edge_ngram.rs:48-80`): letter = Unicode L*,
    digit = Nd/Nl/No (Rust ``char::is_numeric``), whitespace =
    White_Space, punctuation = P*, symbol = S*."""
    want_letter = "letter" in classes
    want_digit = "digit" in classes
    want_ws = "whitespace" in classes
    want_punct = "punctuation" in classes
    want_sym = "symbol" in classes
    unknown = set(classes) - {"letter", "digit", "whitespace",
                              "punctuation", "symbol"}
    if unknown:
        raise ValueError(
            f"unknown token_chars class: '{sorted(unknown)[0]}'. expected "
            "one of: letter, digit, whitespace, punctuation, symbol")
    _ws_extra = "\t\n\x0b\x0c\r\x85"

    def pred(c: str) -> bool:
        if want_letter and c.isalpha():
            return True
        cat = unicodedata.category(c)
        if want_digit and cat in ("Nd", "Nl", "No"):
            return True
        if want_ws and (cat in ("Zs", "Zl", "Zp") or c in _ws_extra):
            return True
        if want_punct and cat.startswith("P"):
            return True
        if want_sym and cat.startswith("S"):
            return True
        return False

    return pred


class EdgeNgramTokenizer(Tokenizer):
    """pg_search ``edge_ngram``: word-aware leading-edge grams
    (`tokenizers/src/edge_ngram.rs:93-240`, NOT tantivy's prefix-only
    ngram over the raw text).  The text is segmented into words — maximal
    runs of characters matching any ``token_chars`` class (default
    ``[letter, digit]``, `manager.rs:499-512`) — and each word emits its
    ``min_gram..=max_gram``-char prefixes.  Words shorter than
    ``min_gram`` are skipped entirely and do NOT consume a position;
    every gram of the i-th emitted word carries position i."""

    name = "edge_ngram"
    custom_positions = True

    def __init__(self, min_gram: int = 1, max_gram: int = 2,
                 token_chars=None, filters: Optional[dict] = None):
        super().__init__(filters)
        if min_gram < 1:
            raise ValueError("min_gram must be >= 1")
        if max_gram < min_gram:
            raise ValueError("max_gram must be >= min_gram")
        self.min_gram, self.max_gram = min_gram, max_gram
        self.token_chars = tuple(token_chars or ("letter", "digit"))
        self._pred = _edge_char_pred(self.token_chars)

    def _words(self, text: str):
        """Maximal runs of token_chars-matching characters as
        (char_start, char_end) spans."""
        pred = self._pred
        out = []
        start = None
        for i, c in enumerate(text):
            if pred(c):
                if start is None:
                    start = i
            elif start is not None:
                out.append((start, i))
                start = None
        if start is not None:
            out.append((start, len(text)))
        return out

    def _segments(self, text: str):
        out = []
        for ws, we in self._words(text):
            wlen = we - ws
            if wlen < self.min_gram:
                continue  # skipped words do not consume a position
            for g in range(self.min_gram, min(self.max_gram, wlen) + 1):
                out.append((text[ws : ws + g], ws, ws + g))
        return out

    def _segment_positions(self, segs):
        # every gram of one word shares the word's char start, and words
        # are emitted in order — position = rank of distinct starts
        pos = []
        p = -1
        prev_start = None
        for _, s, _ in segs:
            if s != prev_start:
                p += 1
                prev_start = s
            pos.append(p)
        return pos


class RegexTokenizer(Tokenizer):
    name = "regex"

    def __init__(self, pattern: str, filters: Optional[dict] = None):
        super().__init__(filters)
        self._re = re.compile(pattern)

    def _segments(self, text: str):
        return [(m.group(), m.start(), m.end()) for m in self._re.finditer(text)]


class ChineseCompatibleTokenizer(Tokenizer):
    """Latin/digit runs as tokens; each CJK codepoint its own token."""

    name = "chinese_compatible"
    _RE = re.compile(r"[一-鿿㐀-䶿]|[A-Za-z0-9_]+")

    def _segments(self, text: str):
        return [(m.group(), m.start(), m.end()) for m in self._RE.finditer(text)]


_CJK_RUN_RE = re.compile(
    r"[一-鿿㐀-䶿]+"      # Han
    r"|[぀-ゟ゠-ヿ]+"     # hiragana / katakana
    r"|[가-힯]+"                  # hangul syllables
    r"|[A-Za-z0-9_]+"
)


class CjkBigramTokenizer(Tokenizer):
    """Dictionary-less CJK segmentation: overlapping BIGRAMS over each CJK
    run (the standard search-engine fallback when no segmentation
    dictionary is available), Latin/digit runs as whole tokens.

    This is the FALLBACK behind the dictionary tokenizers below
    (`tokenizers/src/manager.rs:348-425` jieba / lindera / icu): when the
    real library is importable it is used; otherwise this deterministic
    approximation keeps recall (every true word of length >= 2 shares a
    bigram with its query form) at some precision cost — it does NOT
    reproduce the reference's dictionary segmentations."""

    name = "cjk_bigram"
    #: scripts that bigram (no word delimiters): Han + kana; hangul is
    #: space-delimited so its runs stay whole tokens
    _CJK_ONE = re.compile(r"[一-鿿㐀-䶿぀-ヿ]")

    def _segments(self, text: str):
        out = []
        for m in _CJK_RUN_RE.finditer(text):
            run, s = m.group(), m.start()
            if self._CJK_ONE.match(run):
                if len(run) == 1:
                    out.append((run, s, s + 1))
                else:
                    for i in range(len(run) - 1):
                        out.append((run[i:i + 2], s + i, s + i + 2))
            else:
                out.append((run, s, m.end()))
        return out


class JiebaTokenizer(CjkBigramTokenizer):
    """``pdb.jieba``: real jieba word segmentation when the library is
    importable (not in this container); otherwise the bundled
    dictionary segmenter (`text/cjk_dict.py`): DAG + max-probability
    route over a curated word-frequency table in jieba's search mode
    (in-dict 2/3-gram subwords emitted before compounds, matching the
    index expansion of `jieba_chinese_convert.out` tests 1-3) — with
    single-ideograph fallback for out-of-vocabulary Han runs (jieba's
    HMM there is a data file this repo does not bundle; its goldens'
    test 4 is the documented delta).  Kana runs keep the bigram
    fallback; Latin/hangul runs stay whole tokens.

    ``chinese_convert`` (t2s/s2t/tw2s/s2tw/tw2sp) applies via OpenCC
    when importable, else the bundled character+phrase tables (same
    observable behavior as the reference build: character conversion,
    no Taiwan vocabulary substitution — see golden test 13).  The
    bundled conversion is length-preserving, so token offsets refer to
    the original text.

    Token emission follows jieba's ``cut()`` block structure (the
    reference wraps ``tantivy_jieba`` over jieba-rs, which mirrors it):
    ``re_han_default`` blocks are dictionary-cut; everything else is
    split into ``\\r\\n``/single-whitespace tokens and char-by-char
    remainders — so WHITESPACE AND PUNCTUATION ARE EMITTED AS TOKENS
    (`token_trim_filter.out`: {this," ",is," ",a," ",test,.}) and the
    ``trim=true`` filter is what removes the whitespace ones.  Kana is
    outside ``re_han_default`` and therefore emits per-character, as
    real jieba does."""

    name = "jieba"
    #: jieba re_han_default: dictionary-cut blocks
    _RE_HAN = re.compile(r"[一-鿕a-zA-Z0-9+#&._%\-]+")
    #: jieba re_skip_default: whitespace tokens inside non-han blocks
    _RE_SKIP = re.compile(r"\r\n|\s")
    #: finalseg re_skip: alnum (decimal/percent) runs stay whole
    _RE_ENG = re.compile(r"[a-zA-Z0-9]+(?:\.\d+)?%?")
    _HAN_RUN = re.compile(r"[一-鿕]+")

    def __init__(self, chinese_convert: Optional[str] = None,
                 filters: Optional[dict] = None):
        super().__init__(filters)
        self.chinese_convert = chinese_convert
        try:  # pragma: no cover - library not in the container
            import jieba as _jieba

            self._jieba = _jieba
        except ImportError:
            self._jieba = None
        self._cc = None
        if chinese_convert:
            try:  # pragma: no cover
                import opencc

                self._cc = opencc.OpenCC(chinese_convert)
            except ImportError:
                pass

    def _segments(self, text: str):
        from paradedb_ray.text import cjk_dict

        if self._cc is not None:  # pragma: no cover
            text = self._cc.convert(text)
        elif self.chinese_convert:
            text = cjk_dict.convert(text, self.chinese_convert)
        if self._jieba is not None:  # pragma: no cover
            return [(w, s, e) for w, s, e in self._jieba.tokenize(
                text, mode="search")]
        out = []
        pos = 0
        for m in self._RE_HAN.finditer(text):
            if m.start() > pos:
                self._other_block(text[pos:m.start()], pos, out)
            self._han_block(m.group(), m.start(), out)
            pos = m.end()
        if pos < len(text):
            self._other_block(text[pos:], pos, out)
        return out

    def _han_block(self, blk: str, base: int, out: list) -> None:
        """A ``re_han_default`` block: Han runs dictionary-cut in search
        mode (with the BMES Viterbi for OOV runs); the interleaved
        ascii-ish remainder through the finalseg split (`_eng_piece`)."""
        from paradedb_ray.text import cjk_dict

        i = 0
        for m in self._HAN_RUN.finditer(blk):
            if m.start() > i:
                self._eng_piece(blk[i:m.start()], base + i, out)
            out.extend((w, base + m.start() + ws, base + m.start() + we)
                       for w, ws, we in cjk_dict.cut_for_search(m.group()))
            i = m.end()
        if i < len(blk):
            self._eng_piece(blk[i:], base + i, out)

    def _eng_piece(self, piece: str, base: int, out: list) -> None:
        """finalseg's non-Han handling: alnum (decimal/percent) runs whole,
        the chars between them grouped as-is ('test.' -> test, .)."""
        i = 0
        for m in self._RE_ENG.finditer(piece):
            if m.start() > i:
                out.append((piece[i:m.start()], base + i, base + m.start()))
            out.append((m.group(), base + m.start(), base + m.end()))
            i = m.end()
        if i < len(piece):
            out.append((piece[i:], base + i, base + len(piece)))

    def _other_block(self, blk: str, base: int, out: list) -> None:
        """Between-block text: each ``\\r\\n``/whitespace char is its own
        token; everything else (punctuation, kana, symbols) emits
        char-by-char — jieba ``cut()``'s non-han branch."""
        i = 0
        for m in self._RE_SKIP.finditer(blk):
            for j in range(i, m.start()):
                out.append((blk[j], base + j, base + j + 1))
            out.append((m.group(), base + m.start(), base + m.end()))
            i = m.end()
        for j in range(i, len(blk)):
            out.append((blk[j], base + j, base + j + 1))


class IcuTokenizer(Tokenizer):
    """``pdb.icu``: ICU word-break segmentation when PyICU is importable
    (not in this container); fallback = UAX#29 words with each Han
    ideograph its own token (ICU's own dictionary-less behavior for
    unlisted scripts)."""

    name = "icu"
    _FALLBACK_RE = re.compile(
        r"[一-鿿㐀-䶿]"   # one token per Han ideograph
        r"|[぀-ゟ]+|[゠-ヿ]+|[가-힯]+"
        r"|\w+", re.UNICODE)

    def __init__(self, filters: Optional[dict] = None):
        super().__init__(filters)
        try:  # pragma: no cover - library not in the container
            import icu as _icu

            self._brk = _icu.BreakIterator.createWordInstance(
                _icu.Locale.getRoot())
        except ImportError:
            self._brk = None

    def _segments(self, text: str):
        if self._brk is not None:  # pragma: no cover
            self._brk.setText(text)
            out, start = [], 0
            for end in self._brk:
                tok = text[start:end]
                if tok.strip() and any(c.isalnum() for c in tok):
                    out.append((tok, start, end))
                start = end
            return out
        return [(m.group(), m.start(), m.end())
                for m in self._FALLBACK_RE.finditer(text)
                if not m.group().isspace() and m.group() != "_"]


# (Korean josa/endings live in `text/ko_dict.py`'s closed-class
# FUNCTION table, Japanese particles/auxiliaries in `text/ja_dict.py`'s
# — both consumed by the per-language lexeme lattices.)

_HAN_RE_ONE = re.compile(r"[一-鿿㐀-䶿]")
_HANGUL_RE_ONE = re.compile(r"[가-힯]")
#: japanese_lindera run split: ONE run per contiguous Japanese
#: (Han+kana) stretch — the ja_dict lattice needs cross-script spans —
#: plus hangul runs; Latin and digit runs SEPARATE (ipadic segments
#: alphabetic and numeric stretches as distinct tokens), and full-width
#: alnum forms as their own runs (they normalize to ASCII under nfkc)
_JA_SEG_RE = re.compile(
    r"[一-鿿㐀-䶿぀-ゟ゠-ヿ々〆ヶ]+"
    r"|[가-힯]+"
    r"|[A-Za-z_]+|[0-9]+"
    r"|[Ａ-Ｚａ-ｚ]+|[０-９]+")

#: whitespace runs, emitted as tokens under lindera keep_whitespace
_WS_RUN_RE = re.compile(r"\s+")


def _nfkc_map(text: str):
    """Per-character NFKC normalization with an offset map back to the
    ORIGINAL text (the lindera UnicodeNormalizeCharacterFilter corrects
    offsets the same way, ref `tokenizers/src/lindera.rs:99-103`).
    Returns ``(normalized_text, starts)`` where ``starts[i]`` is the
    original index of normalized char ``i``.  Per-char normalization
    covers the compatibility forms the option targets (full-width ->
    ASCII, ligatures); multi-char composition sequences are left to the
    segmenter as-is."""
    import unicodedata

    parts: list[str] = []
    starts: list[int] = []
    for i, ch in enumerate(text):
        n = unicodedata.normalize("NFKC", ch)
        parts.append(n)
        starts.extend([i] * len(n))
    return "".join(parts), starts


class LinderaTokenizer(CjkBigramTokenizer):
    """``pdb.chinese_lindera`` / ``japanese_lindera`` / ``korean_lindera``:
    real lindera morphological segmentation needs the embedded
    cc-cedict/ipadic/ko-dic dictionaries (ref
    `tokenizers/src/lindera.rs:135-156`; no Python binding in this
    container).  The fallback approximates each dictionary's observable
    segmentation with public, closed-class grammar:

    * **chinese**: dictionary-lattice cut over the bundled word table
      (`text/cjk_dict.py`) with OOV characters emitted singly —
      jieba's ``cut(HMM=False)``, which is also how a cc-cedict lattice
      treats unknown runs (no name-grouping model).
    * **japanese**: ipadic-style LEXEME LATTICE over the bundled
      minimal word table (`text/ja_dict.py`, the approach that closed
      jieba): content lexemes (incl. cross-script forms 新しい / 祭り /
      食べ物) + closed-class particles/auxiliaries, min-cost Viterbi
      with MeCab-style unknown handling (katakana groups as runs,
      kanji/hiragana OOV emit singly).  Token-level goldens for the
      lindera.rs fixture sentences: `tests/test_ja_lattice.py`.
    * **korean**: ko-dic-style LEXEME LATTICE over the bundled minimal
      word table (`text/ko_dict.py`): content lexemes + the closed
      classes of josa and verbal/copula endings, with suffixes admitted
      only eojeol-finally (특징|입니다, 경기|에서|는, 열|었|습니다);
      unknown hangul (names) groups as a whole run, MeCab-style.
      Token-level goldens for the lindera.rs fixture sentences:
      `tests/test_ko_lattice.py`.

    Both the index and query sides run the same rules, so matching is
    self-consistent; behavioral parity with the reference's
    `tests/tests/lindera.rs` goldens is pinned in
    `tests/test_lindera_icu_conformance.py`."""

    name = "lindera"

    def __init__(self, language: str = "unspecified",
                 filters: Optional[dict] = None,
                 keep_whitespace: bool = False, nfkc: bool = False,
                 reading_form: bool = False):
        super().__init__(filters)
        self.language = language
        self.keep_whitespace = keep_whitespace
        self.nfkc = nfkc
        self.reading_form = reading_form

    def _segments(self, text: str):
        """Apply the LinderaOptions pipeline around the per-language
        segmenter (ref `tokenizers/src/lindera.rs:85-120`): NFKC char
        filter BEFORE segmentation (offsets corrected back to the
        original text), whitespace tokens kept when requested, and the
        reading-form token filter AFTER segmentation (ja: ipadic
        katakana readings; ko: hanja -> hangul; zh: unsupported, a
        no-op here as the reference rejects it at CREATE INDEX)."""
        opts = self.keep_whitespace or self.nfkc or self.reading_form
        if not opts:
            return self._lang_segments(text)
        smap = None
        if self.nfkc:
            text, smap = _nfkc_map(text)
        segs = list(self._lang_segments(text))
        if self.keep_whitespace:
            segs = sorted(
                segs + [(m.group(), m.start(), m.end())
                        for m in _WS_RUN_RE.finditer(text)],
                key=lambda t: t[1])
        if self.reading_form:
            table = {}
            if self.language == "japanese":
                from paradedb_ray.text import ja_dict
                table = ja_dict.READINGS
            elif self.language == "korean":
                from paradedb_ray.text import ko_dict
                table = ko_dict.HANJA_READINGS
            segs = [(table.get(w, w), a, b) for w, a, b in segs]
        if smap is not None:
            segs = [(w, smap[a], smap[b - 1] + 1) for w, a, b in segs]
        return segs

    def _bigram_run(self, run: str, s: int):
        if len(run) == 1:
            return [(run, s, s + 1)]
        return [(run[i:i + 2], s + i, s + i + 2)
                for i in range(len(run) - 1)]

    def _lang_segments(self, text: str):
        lang = self.language
        if lang == "chinese":
            from paradedb_ray.text import cjk_dict

            out = []
            for m in _CJK_RUN_RE.finditer(text):
                run, s = m.group(), m.start()
                if _HAN_RE_ONE.match(run):
                    out.extend((w, s + ws, s + we)
                               for w, ws, we in cjk_dict.cut(run, hmm=False))
                elif self._CJK_ONE.match(run):
                    out.extend(self._bigram_run(run, s))
                else:
                    out.append((run, s, m.end()))
            return out
        if lang == "korean":
            # bundled ko-dic-style lexeme lattice (`text/ko_dict.py`):
            # closed-class josa/ending suffix chains peel off stems
            # (특징|입니다, 경기|에서), unknown hangul (names) groups as
            # a whole run — MeCab-style unknown handling.  Token-level
            # goldens for the lindera.rs fixture sentences are pinned in
            # tests/test_ko_lattice.py.
            from paradedb_ray.text import ko_dict

            out = []
            for m in _CJK_RUN_RE.finditer(text):
                run, s = m.group(), m.start()
                if _HANGUL_RE_ONE.match(run):
                    out.extend((w, s + ws, s + we)
                               for w, ws, we in ko_dict.cut(run))
                elif self._CJK_ONE.match(run):
                    out.extend(self._bigram_run(run, s))
                else:
                    out.append((run, s, m.end()))
            return out
        if lang == "japanese":
            # bundled ipadic-style lexeme lattice (`text/ja_dict.py`):
            # one run spans Han+kana so cross-script lexemes (新しい,
            # 祭り, 食べ物) segment at their true boundaries; unknown
            # katakana groups as a run, unknown kanji/hiragana emit
            # singly — MeCab's unknown-word handling.  Token-level
            # goldens for the lindera.rs fixture sentences are pinned in
            # tests/test_ja_lattice.py.
            from paradedb_ray.text import ja_dict

            out = []
            for m in _JA_SEG_RE.finditer(text):
                run, s = m.group(), m.start()
                if ja_dict.JA_RUN_RE.match(run):
                    out.extend((w, s + ws, s + we)
                               for w, ws, we in ja_dict.cut(run))
                elif _HANGUL_RE_ONE.match(run):
                    out.extend(self._bigram_run(run, s))
                else:
                    out.append((run, s, m.end()))
            return out
        return super()._segments(text)


class SourceCodeTokenizer(Tokenizer):
    """Split identifiers on non-alnum plus camelCase / letter-digit
    boundaries (pg_search ``source_code``)."""

    name = "source_code"
    _RE = re.compile(
        r"[A-Z]+(?![a-z])|[A-Z][a-z]+|[a-z]+|[0-9]+|[^\x00-\x7f]+"
    )

    def _segments(self, text: str):
        return [(m.group(), m.start(), m.end()) for m in self._RE.finditer(text)]


# ---------------------------------------------------------------------------
# Token filters
# ---------------------------------------------------------------------------

# Lucene/tantivy English stop set (tantivy StopWordFilter::new(English));
# other languages come from the public Snowball corpus in
# `paradedb_ray.text.stopwords` (`multi_language_stopwords.sql`).
from paradedb_ray.text.stopwords import ENGLISH as ENGLISH_STOPWORDS
from paradedb_ray.text.stopwords import stopwords_for as _stopwords_for

# tantivy AlphaNumOnlyFilter: ASCII alphanumeric ONLY — 'Český' is dropped
# even though it is Unicode-alphanumeric (`alpha_num_only_filter.out`:
# plain alpha_num_only=true over Czech text yields {}; only after
# ascii_folding do the tokens survive).
_ALNUM_ONLY_RE = re.compile(r"^[a-zA-Z0-9]+$")


def _ascii_fold(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
    )


@dataclass
class TokenFilterChain:
    """Fixed-order filter chain mirroring `manager.rs:315-337`."""

    config: dict = field(default_factory=dict)
    lowercase_default: bool = True

    def __post_init__(self):
        c = self.config
        self.remove_short = c.get("remove_short")
        self.remove_long = c.get("remove_long")
        self.trim = bool(c.get("trim", False))
        lc = c.get("lowercase")
        self.lowercase = self.lowercase_default if lc is None else bool(lc)
        self.stemmer = c.get("stemmer")
        self._stem = None
        if self.stemmer:
            from paradedb_ray.text.stemmer import stemmer_for

            # per-analyzer memo: stemming cost is per-VOCABULARY, not
            # per-token (zipfian text repeats tokens constantly; the
            # stemmers are pure functions of the token)
            import functools

            self._stem = functools.lru_cache(maxsize=65536)(
                stemmer_for(self.stemmer))
        self.stopwords = frozenset(c["stopwords"]) if c.get("stopwords") else None
        self.ascii_folding = bool(c.get("ascii_folding", False))
        self.alpha_num_only = bool(c.get("alpha_num_only", False))
        langs = c.get("stopwords_language")
        if isinstance(langs, str):
            # v2 typmod comma form: 'stopwords_language=English,French'
            langs = [x.strip() for x in langs.split(",") if x.strip()]
        self.lang_stopwords = None
        if langs:
            s = set()
            for lang in langs:
                s |= _stopwords_for(lang)
            self.lang_stopwords = frozenset(s)
        # Precompute whether the chain is a pure per-text transform (fast
        # path).  trim is a REMOVING filter: tokens that become empty after
        # whitespace-trimming are dropped (`tokenizers/src/token_trim.rs`,
        # "After trimming, tokens that become empty are filtered out").
        self._removes = bool(
            self.remove_short or self.remove_long or self.stopwords is not None
            or self.alpha_num_only or self.lang_stopwords is not None
            or self.trim
        )

    def _map_text(self, t: str) -> str:
        if self.trim:
            t = t.strip()
        if self.lowercase:
            t = t.lower()
        if self._stem is not None:
            t = self._stem(t)
        if self.ascii_folding:
            t = _ascii_fold(t)
        return t

    def _keep_pre(self, t: str) -> bool:
        # TokenLengthFilter measures UTF-8 BYTES and keeps == max
        # (`tokenizers/src/token_length.rs:36-43`; the jieba golden's
        # remove_long=10 drops 4-char/12-byte 繁体中文).  ASCII tokens
        # skip the encode — len() is already the byte count.
        n = len(t)
        if (self.remove_long is not None or self.remove_short is not None) \
                and not t.isascii():
            n = len(t.encode("utf-8"))
        if self.remove_short is not None and n < self.remove_short:
            return False
        if self.remove_long is not None and n > self.remove_long:
            return False
        return True

    def _keep_post(self, t: str, pre_stop_checked: bool = False) -> bool:
        # stopword check happens between stemmer and ascii_folding in the
        # reference chain; with no ascii folding the distinction is moot.
        if self.stopwords is not None and t in self.stopwords:
            return False
        if self.alpha_num_only and not _ALNUM_ONLY_RE.match(t):
            return False
        if self.lang_stopwords is not None and t in self.lang_stopwords:
            return False
        return True

    def apply_texts(self, toks: list[str]) -> list[str]:
        if not self._removes:
            if not self.lowercase and not self.trim and self._stem is None and not self.ascii_folding:
                return toks
            return [self._map_text(t) for t in toks]
        out = []
        for t in toks:
            if not self._keep_pre(t):
                continue
            t2 = self._map_text(t)
            if self.trim and not t2:
                continue
            if self._keep_post(t2):
                out.append(t2)
        return out

    def apply_tokens(self, toks: list[Token]) -> list[Token]:
        out = []
        for tok in toks:
            if not self._keep_pre(tok.text):
                continue
            t2 = self._map_text(tok.text)
            if self.trim and not t2:
                continue
            if self._keep_post(t2):
                tok.text = t2
                out.append(tok)
        return out


# ---------------------------------------------------------------------------
# Config -> tokenizer
# ---------------------------------------------------------------------------

_TOKENIZERS = {
    "default": SimpleTokenizer,
    "simple": SimpleTokenizer,
    "unicode_words": UnicodeWordsTokenizer,
    "whitespace": WhitespaceTokenizer,
    "keyword": KeywordTokenizer,
    "raw": KeywordTokenizer,
    "literal": LiteralTokenizer,
    "literal_normalized": LiteralNormalizedTokenizer,
    "ngram": NgramTokenizer,
    "edge_ngram": EdgeNgramTokenizer,
    "regex": RegexTokenizer,
    "chinese_compatible": ChineseCompatibleTokenizer,
    "source_code": SourceCodeTokenizer,
    "cjk_bigram": CjkBigramTokenizer,
    "jieba": JiebaTokenizer,
    "icu": IcuTokenizer,
    "lindera": LinderaTokenizer,
    "chinese_lindera": LinderaTokenizer,
    "japanese_lindera": LinderaTokenizer,
    "korean_lindera": LinderaTokenizer,
}

_FILTER_KEYS = {
    "remove_short", "remove_long", "lowercase", "stemmer", "stopwords",
    "stopwords_language", "ascii_folding", "trim", "alpha_num_only",
}


def tokenizer_from_config(config: Optional[dict]) -> Tokenizer:
    """Build a tokenizer from a pg_search-style JSON config
    (``{"type": "ngram", "min_gram": 2, ..., "lowercase": true}``)."""
    if config is None:
        return default_tokenizer()
    cfg = dict(config)
    typ = cfg.pop("type", "unicode_words")
    filters = {k: v for k, v in cfg.items() if k in _FILTER_KEYS}
    extra = {k: v for k, v in cfg.items() if k not in _FILTER_KEYS}
    cls = _TOKENIZERS.get(typ)
    if cls is None:
        raise ValueError(f"unknown tokenizer type: {typ!r}")
    if cls is NgramTokenizer:
        return cls(
            extra.get("min_gram", 2), extra.get("max_gram", 3),
            extra.get("prefix_only", False),
            extra.get("positions", False), filters,
        )
    if cls is EdgeNgramTokenizer:
        # reference defaults: min 1, max 2, token_chars [letter, digit]
        # (`manager.rs:499-512`)
        return cls(extra.get("min_gram", 1), extra.get("max_gram", 2),
                   extra.get("token_chars"), filters)
    if cls is RegexTokenizer:
        return cls(extra["pattern"], filters)
    if cls is UnicodeWordsTokenizer:
        return cls(extra.get("remove_emojis", False), filters)
    if cls is JiebaTokenizer:
        return cls(extra.get("chinese_convert"), filters)
    if cls is LinderaTokenizer:
        # `lindera{language, keep_whitespace, nfkc, reading_form}` and
        # the per-language forms' `keep_whitespace` (`manager.rs:389-416`)
        return cls(extra.get("language", typ.replace("_lindera", "")),
                   filters,
                   keep_whitespace=extra.get("keep_whitespace", False),
                   nfkc=extra.get("nfkc", False),
                   reading_form=extra.get("reading_form", False))
    return cls(filters=filters)


def default_tokenizer() -> UnicodeWordsTokenizer:
    """pg_search's default for text fields (`manager.rs:436-443`)."""
    return UnicodeWordsTokenizer(remove_emojis=False)


def byte_offsets(text: str, tokens: list[Token]) -> list[tuple[int, int]]:
    """Convert char offsets to UTF-8 byte offsets (tantivy offsets parity)."""
    # cumulative byte length per char prefix
    enc = [len(c.encode("utf-8")) for c in text]
    cum = [0]
    for n in enc:
        cum.append(cum[-1] + n)
    return [(cum[t.offset_from], cum[t.offset_to]) for t in tokens]


def tokenizers() -> list:
    """Registered tokenizer names — ``paradedb.tokenizers()``
    (`pg_search/src/api/tokenize.rs:50`)."""
    return sorted(_TOKENIZERS)
