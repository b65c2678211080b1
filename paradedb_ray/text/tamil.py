"""Tamil Snowball stemmer (snowballstem.org/algorithms/tamil/stemmer.html,
the Damodharan Rajalingam algorithm).

Control flow, rule order, guards and replacement strings reconstructed
from the official Snowball-generated implementation (the same dialect the
reference embeds via rust-stemmers — `tokenizers/src/manager.rs:266-268`)
and verified bit-exact against a PostgreSQL 15 ``ts_lexize('bare_tamil',
word)`` oracle over fuzz + suffix-stacked corpora (goldens in
``tests/test_snowball_goldens.py``).

Snowball semantics notes that shape this port:
- every phase resets the cursor to the word start and matches suffixes
  bounded by position 0;
- ``fix_ending`` is a single alternative chain (first hit wins) and is
  re-applied with ``repeat`` by most phases;
- ``found_vetrumai_urupu`` is the one cross-routine boolean: set when a
  case marker was stripped, read by ``fix_ending``'s த்த் rule.
"""

from __future__ import annotations

VIRAMA = "்"            # ்
#: the 8-entry vowel-sign grouping the algorithm tests with (no ொ/ோ/ௌ)
_VOWEL_SIGNS = frozenset("ீுூெேைாி")
_STOPS = frozenset("கசடதபற")
_LIQUIDS = frozenset("யரலளழவ")
_NASALS = frozenset("ஙஞணநனம")
_CONSONANTS_PREFIX = frozenset("கஙசஞதநபமயவ")
_INDEP_VOWELS = frozenset("அஆஇஈஉஊஎஏஐஒஓஔ")


class _W:
    """Mutable word + the cross-routine boolean."""

    __slots__ = ("s", "vetrumai")

    def __init__(self, s: str):
        self.s = s
        self.vetrumai = False


def _ends(s: str, suf: str) -> bool:
    return s.endswith(suf) and len(s) >= len(suf)


def _fix_va_start(w: _W) -> None:
    s = w.s
    for pat, repl in (("வோ", "ஓ"), ("வொ", "ஒ"), ("வு", "உ"), ("வூ", "ஊ")):
        if s.startswith(pat):
            w.s = repl + s[2:]
            return


def _fix_ending(w: _W) -> bool:
    """One pass of the ending-normalization chain; True if it changed."""
    s = w.s
    if len(s) <= 3:
        return False
    # A1: [among('ந்த்' 'ந்த' 'ந்')] delete (longest match)
    for suf in ("ந்த்", "ந்த", "ந்"):
        if _ends(s, suf):
            w.s = s[: -len(suf)]
            return True
    # A2: ['ய்'] test (ை|ி|ீ) delete
    if _ends(s, "ய்") and len(s) > 2 and s[-3] in "ைிீ":
        w.s = s[:-2]
        return True
    # A3/A4: ட்ப்/ட்க் -> ள்
    if _ends(s, "ட்ப்") or _ends(s, "ட்க்"):
        w.s = s[:-4] + "ள்"
        return True
    # A5/A6: ன்ற்/ற்க் -> ல்
    if _ends(s, "ன்ற்") or _ends(s, "ற்க்"):
        w.s = s[:-4] + "ல்"
        return True
    # A7: ட்ட் -> டு
    if _ends(s, "ட்ட்"):
        w.s = s[:-4] + "டு"
        return True
    # A8: found_vetrumai_urupu and ['த்த்'] (test not 'ை') <- 'ம்'
    if w.vetrumai and _ends(s, "த்த்") and (len(s) <= 4 or s[-5] != "ை"):
        w.s = s[:-4] + "ம்"
        return True
    # A9/A10: ுக்/ுக்க் -> ்
    if _ends(s, "ுக்") or _ends(s, "ுக்க்"):
        w.s = s[: -3 if s.endswith("ுக்") and not s.endswith("ுக்க்")
                else -5] + VIRAMA
        return True
    # A11: [stop ் stop ்] delete
    if (len(s) >= 4 and s[-1] == VIRAMA and s[-2] in _STOPS
            and s[-3] == VIRAMA and s[-4] in _STOPS):
        w.s = s[:-4]
        return True
    # A13: [stop ்] delete
    if len(s) >= 2 and s[-1] == VIRAMA and s[-2] in _STOPS:
        w.s = s[:-2]
        return True
    # A14: [் liquid/nasal ்] <- ்
    if (len(s) >= 3 and s[-1] == VIRAMA
            and (s[-2] in _LIQUIDS or s[-2] in _NASALS)
            and s[-3] == VIRAMA):
        w.s = s[:-3] + VIRAMA
        return True
    # A16: [among('வ்' 'ய' 'வ')] delete
    for suf in ("வ்", "ய", "வ"):
        if _ends(s, suf):
            w.s = s[: -len(suf)]
            return True
    # A17: ['னு'] (test not vowel-sign) delete
    if _ends(s, "னு") and (len(s) <= 2 or s[-3] not in _VOWEL_SIGNS):
        w.s = s[:-2]
        return True
    # A18/A19: ங் -> ம் unless preceded by ை (then delete)
    if _ends(s, "ங்"):
        if len(s) > 2 and s[-3] == "ை":
            w.s = s[:-2]
        else:
            w.s = s[:-2] + "ம்"
        return True
    # A20: ['்'] (test vowel-sign or '்') delete
    if (s[-1] == VIRAMA and len(s) >= 2
            and (s[-2] in _VOWEL_SIGNS or s[-2] == VIRAMA)):
        w.s = s[:-1]
        return True
    return False


def _fix_endings(w: _W) -> None:
    while _fix_ending(w):
        pass


def _remove_question_prefixes(w: _W) -> None:
    s = w.s
    if (len(s) >= 3 and s[0] == "எ" and s[1] in _CONSONANTS_PREFIX
            and s[2] == VIRAMA):
        w.s = s[3:]
        _fix_va_start(w)


def _remove_pronoun_prefixes(w: _W) -> None:
    s = w.s
    if (len(s) >= 3 and s[0] in "அஇஉ" and s[1] in _CONSONANTS_PREFIX
            and s[2] == VIRAMA):
        w.s = s[3:]
        _fix_va_start(w)


def _remove_question_suffixes(w: _W) -> None:
    if len(w.s) <= 4:
        return
    for suf in ("ே", "ோ", "ா"):  # ே ோ ா
        if _ends(w.s, suf):
            w.s = w.s[:-1] + VIRAMA
            break
    _fix_endings(w)


def _remove_um(w: _W) -> None:
    if len(w.s) > 4 and _ends(w.s, "ும்"):
        w.s = w.s[:-3] + VIRAMA
        _fix_ending(w)


#: common-word endings replaced by virama, in chain order
_COMMON_TO_VIRAMA = ("ுடன்", "ில்லை", "ிடம்", "ின்றி", "ாகி", "ாகிய",
                     "ென்று", "ுள்ள", "ுடைய", "ுடை", "ெனும்")
#: trailing common words deleted outright (among: longest match wins)
_COMMON_DELETE = sorted(
    ("பட்டு", "விட்டு", "படு", "விடு", "பட்டது", "ெல்லாம்", "பட்ட",
     "பட்டண", "தான", "படிதான", "குரிய", "படி", "பற்றி"),
    key=len, reverse=True)


def _remove_common_word_endings(w: _W) -> None:
    if len(w.s) <= 4:
        return
    s = w.s
    matched = False
    for suf in _COMMON_TO_VIRAMA:
        if _ends(s, suf):
            w.s = s[: -len(suf)] + VIRAMA
            matched = True
            break
    if not matched and _ends(s, "ல்ல") and (
            len(s) <= 3 or s[-4] not in _VOWEL_SIGNS):
        w.s = s[:-3] + VIRAMA
        matched = True
    if not matched:
        for suf in ("ென", "ாகி"):
            if _ends(s, suf):
                w.s = s[: -len(suf)] + VIRAMA
                matched = True
                break
    if not matched:
        for suf in _COMMON_DELETE:
            if _ends(s, suf):
                w.s = s[: -len(suf)]
                matched = True
                break
    if matched:
        _fix_endings(w)


def _vetrumai_post(w: _W) -> None:
    w.vetrumai = True
    if _ends(w.s, "ின்"):
        w.s = w.s[:-3] + VIRAMA
    _fix_endings(w)


def _remove_vetrumai_urupukal(w: _W) -> None:
    w.vetrumai = False
    if len(w.s) <= 4:
        return
    s = w.s

    def repl(n: int) -> None:
        w.s = s[:-n] + VIRAMA
        _vetrumai_post(w)

    def dele(n: int) -> None:
        w.s = s[:-n]
        _vetrumai_post(w)

    if _ends(s, "னை"):
        return dele(2)
    if _ends(s, "ினை") and (len(s) <= 3 or s[-4] not in _STOPS):
        return repl(3)
    if _ends(s, "ை"):
        if len(s) > 1 and s[-2] not in _STOPS:
            return repl(1)
        # ை preceded by ்+stop cluster -> ்
        if len(s) > 2 and s[-2] in _STOPS and s[-3] == VIRAMA:
            return repl(1)
    for suf in ("ொடு", "ோடு", "ில்", "ிற்"):
        if _ends(s, suf):
            return repl(len(suf))
    if _ends(s, "ின்") and (len(s) <= 3 or s[-4] != "ம"):
        return repl(3)
    for suf in ("ின்று", "ிருந்து", "விட"):
        if _ends(s, suf):
            return repl(len(suf))
    if len(s) > 6 and _ends(s, "ிடம்"):
        return repl(4)
    for suf in ("ால்", "ுடை", "ாமல்"):
        if _ends(s, suf):
            return repl(len(suf))
    if _ends(s, "ல்") and (len(s) <= 2 or s[-3] not in _VOWEL_SIGNS):
        return repl(2)
    if _ends(s, "ுள்"):
        return repl(3)
    for suf in ("கண்", "முன்", "மேல்", "மேற்", "கீழ்", "பின்"):
        if _ends(s, suf):
            return dele(len(suf))
    if _ends(s, "து") and (len(s) <= 2 or s[-3] not in _VOWEL_SIGNS):
        return dele(2)
    if _ends(s, "ீ"):  # ீ -> ி (shortens the long vowel sign)
        w.s = s[:-1] + "ி"
        return _vetrumai_post(w)


def _remove_plural_suffix(w: _W) -> None:
    s = w.s
    if _ends(s, "ுங்கள்") and (len(s) <= 6 or s[-7] not in _STOPS):
        w.s = s[:-6] + VIRAMA
    elif _ends(s, "ற்கள்"):
        w.s = s[:-5] + "ல்"
    elif _ends(s, "ட்கள்"):
        w.s = s[:-5] + "ள்"
    elif _ends(s, "கள்"):
        w.s = s[:-3]


def _remove_command_suffixes(w: _W) -> None:
    if len(w.s) > 4 and (w.s.endswith("பி") or w.s.endswith("வி")):
        w.s = w.s[:-2]


#: tense suffixes deleted outright, in chain order (the வன்/து entries
#: carry their guards inline below)
_TENSE_DELETE_PLAIN = ("மின்", "னன்", "னான்", "னாள்", "னார்")
_TENSE_DELETE_TAIL = ("னள்", "வள்", "னர்", "வர்", "ன", "ப", "க", "த", "ய",
                      "பன்", "பள்", "பர்")
_TENSE_DELETE_TAIL2 = ("ிற்று", "பம்", "னம்", "தும்", "றும்", "கும்",
                       "னென்", "னை", "வை")
#: tense suffixes replaced by virama (ான் carries its guard inline)
_TENSE_TO_VIRAMA = ("ாள்", "ார்", "ேன்", "ா", "ாம்", "ெம்", "ேம்", "ோம்",
                    "கும்", "தும்", "டும்", "றும்", "ாய்", "னென்", "னிர்",
                    "ீர்", "ீயர்")
_KINRA = sorted(("கின்ற்", "ாநின்ற்", "கிற்", "கின்ற", "ாநின்ற", "கிற"),
                key=len, reverse=True)


def _remove_tense_suffix(w: _W) -> bool:
    """One tense-suffix pass; True if anything was removed."""
    if len(w.s) <= 4:
        return False
    found = False
    s = w.s
    # part 1: the big alternative chain (first hit wins)
    hit = False
    for suf in ("படு", "கொண்டிர்", "மார்"):
        if _ends(s, suf):
            w.s = s[: -len(suf)]
            hit = found = True
            break
    if not hit:
        for suf in _TENSE_DELETE_PLAIN:
            if _ends(s, suf):
                w.s = s[: -len(suf)]
                hit = found = True
                break
    if not hit and _ends(s, "வன்") and (
            len(s) <= 3 or s[-4] not in _INDEP_VOWELS):
        w.s = s[:-3]
        hit = found = True
    if not hit:
        for suf in _TENSE_DELETE_TAIL:
            if _ends(s, suf):
                w.s = s[: -len(suf)]
                hit = found = True
                break
    if not hit and _ends(s, "து") and (
            len(s) <= 2 or s[-3] not in _VOWEL_SIGNS):
        w.s = s[:-2]
        hit = found = True
    if not hit:
        for suf in _TENSE_DELETE_TAIL2:
            if _ends(s, suf):
                w.s = s[: -len(suf)]
                hit = found = True
                break
    if not hit and _ends(s, "ான்") and (len(s) <= 3 or s[-4] != "ச"):
        w.s = s[:-3] + VIRAMA
        hit = found = True
    if not hit:
        for suf in _TENSE_TO_VIRAMA:
            if _ends(s, suf):
                w.s = s[: -len(suf)] + VIRAMA
                hit = found = True
                break
    if not hit:
        for suf in ("கு", "து"):
            if _ends(s, suf) and len(s) > 2 and s[-3] == VIRAMA:
                w.s = s[:-2]
                hit = found = True
                break
    # part 2: the kinra among (runs whether or not part 1 hit)
    s = w.s
    for suf in _KINRA:
        if _ends(s, suf):
            w.s = s[: -len(suf)]
            found = True
            break
    _fix_endings(w)
    return found


def _remove_tense_suffixes(w: _W) -> None:
    found = True
    while found:
        found = _remove_tense_suffix(w)


def stem_tamil(word: str) -> str:
    w = _W(word)
    _fix_ending(w)
    if len(w.s) <= 4:
        return w.s
    _remove_question_prefixes(w)
    _remove_pronoun_prefixes(w)
    _remove_question_suffixes(w)
    _remove_um(w)
    _remove_common_word_endings(w)
    _remove_vetrumai_urupukal(w)
    _remove_plural_suffix(w)
    _remove_command_suffixes(w)
    _remove_tense_suffixes(w)
    # the dictionary layer returns the original word when stemming
    # consumed it entirely (verified against the PG15 oracle)
    return w.s if w.s else word
