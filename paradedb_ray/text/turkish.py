"""Turkish Snowball stemmer (snowballstem.org/algorithms/turkish/stemmer.html).

Suffix tables, per-mark vowel-harmony/optional-letter behavior and the
nominal-verb / noun-suffix control flow were reconstructed from the
official Snowball-generated code (the spec prose leaves the chain
structure and the optional y/n/s/U buffer-letter semantics ambiguous);
verified bit-exact against the official implementation on fuzz vectors
(see tests/test_snowball_goldens.py).

Model: every ``mark_X`` returns the number of trailing chars its suffix
(including an absorbed optional buffer letter) occupies, or None.  A
whole alternative only mutates the word when its full mark sequence
succeeds — mirroring Snowball's cursor save/restore.
"""

from __future__ import annotations

_VOW = frozenset("aeıiouöü")
_U = frozenset("ıiuü")

#: suffix-vowel -> allowed previous vowel (two/four-fold vowel harmony)
_HARMONY = {
    "a": frozenset("aıou"), "e": frozenset("eiöü"),
    "ı": frozenset("aı"), "i": frozenset("ei"),
    "o": frozenset("ou"), "u": frozenset("ou"),
    "ö": frozenset("öü"), "ü": frozenset("öü"),
}


def _check_harmony(word: str) -> bool:
    """goto semantics: find the last vowel, then scan FURTHER back for
    ANY character in its allowed-partner set (non-matching vowels are
    skipped, so 'boderla' harmonizes a..o across the e)."""
    i = len(word) - 1
    while i >= 0 and word[i] not in _VOW:
        i -= 1
    if i < 0:
        return False
    allowed = _HARMONY[word[i]]
    i -= 1
    while i >= 0:
        if word[i] in allowed:
            return True
        i -= 1
    return False


def _opt_letter(word: str, L: int, letter: str):
    """mark_suffix_with_optional_{y,n,s}_consonant: the char before the
    matched suffix either IS ``letter`` (then the char before it must be
    a vowel; the letter joins the suffix) or is any other char whose OWN
    predecessor must be a vowel (suffix unchanged).  Returns the new
    suffix length or None (mark fails)."""
    c = len(word) - L
    if c - 1 >= 0 and word[c - 1] == letter:
        if c - 2 >= 0 and word[c - 2] in _VOW:
            return L + 1
        return None
    if c - 1 >= 0 and c - 2 >= 0 and word[c - 2] in _VOW:
        return L
    return None


def _opt_U(word: str, L: int):
    """mark_suffix_with_optional_U_vowel: mirrored with the U vowel set
    and a NON-vowel requirement before it."""
    c = len(word) - L
    if c - 1 >= 0 and word[c - 1] in _U:
        if c - 2 >= 0 and word[c - 2] not in _VOW:
            return L + 1
        return None
    if c - 1 >= 0 and c - 2 >= 0 and word[c - 2] not in _VOW:
        return L
    return None


def _among(word: str, sufs) -> int | None:
    best = None
    for s in sufs:
        if word.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return len(best) if best else None


#: name -> (suffixes, harmony?, optional: None|'y'|'n'|'s'|'U')
_MARKS = {
    "ymUs": (("miş", "muş", "mış", "müş"), True, "y"),
    "yDU": (("di", "ti", "dik", "tik", "duk", "tuk", "dık", "tık",
             "dük", "tük", "dim", "tim", "dum", "tum", "dım", "tım",
             "düm", "tüm", "din", "tin", "dun", "tun", "dın", "tın",
             "dün", "tün", "du", "tu", "dı", "tı", "dü", "tü"),
            True, "y"),
    "ysA": (("sa", "se", "sak", "sek", "sam", "sem", "san", "sen"),
            False, "y"),
    "ken": (("ken",), False, "y"),
    "cAsInA": (("casına", "cesine"), False, None),
    "sUnUz": (("siniz", "sunuz", "sınız", "sünüz"), False, None),
    "lAr": (("lar", "ler"), True, None),
    "yUm": (("im", "um", "ım", "üm"), True, "y"),
    "sUn": (("sin", "sun", "sın", "sün"), True, None),
    "yUz": (("iz", "uz", "ız", "üz"), True, "y"),
    "DUr": (("dir", "tir", "dur", "tur", "dır", "tır", "dür", "tür"),
            True, None),
    "nUz": (("niz", "nuz", "nız", "nüz"), True, None),
    "cA": (("ca", "ce"), True, "n"),
    "ylA": (("la", "le"), True, "y"),
    "nDAn": (("ndan", "nden"), True, None),
    "DAn": (("dan", "tan", "den", "ten"), True, None),
    "nDA": (("nda", "nde"), True, None),
    "DA": (("da", "ta", "de", "te"), True, None),
    "nA": (("na", "ne"), True, None),
    "yA": (("a", "e"), True, "y"),
    "nUn": (("in", "un", "ın", "ün"), True, "n"),
    "nU": (("ni", "nu", "nı", "nü"), True, None),
    "lArI": (("leri", "ları"), False, None),
    "poss": (("m", "n", "miz", "niz", "muz", "nuz", "mız", "nız",
              "müz", "nüz"), False, "U"),
    "sU": (("ı", "i", "u", "ü"), True, "s"),
    "yU": (("ı", "i", "u", "ü"), True, "y"),
}


def _mark(word: str, name: str):
    sufs, harmony, opt = _MARKS[name]
    if harmony and not _check_harmony(word):
        return None
    L = _among(word, sufs)
    if L is None:
        return None
    if opt == "U":
        return _opt_U(word, L)
    if opt:
        return _opt_letter(word, L, opt)
    return L


def _first(word: str, names):
    for n in names:
        L = _mark(word, n)
        if L:
            return L
    return None


def _nominal_verb(word: str):
    """-> (word, continue_stemming_noun_suffixes)."""
    # alt 1: (ymUs_ or yDU or ysA or ken) ] delete
    L = _first(word, ("ymUs", "yDU", "ysA", "ken"))
    if L:
        return word[:-L], True
    # alt 2: cAsInA (sUnUz|lAr|yUm|sUn|yUz|true) ymUs_ ] delete
    L = _mark(word, "cAsInA")
    if L:
        rest = word[:-L]
        L2 = _first(rest, ("sUnUz", "lAr", "yUm", "sUn", "yUz")) or 0
        rest2 = rest[: len(rest) - L2] if L2 else rest
        L3 = _mark(rest2, "ymUs")
        if L3:
            return rest2[:-L3], True
    # alt 3: lAr ] delete try((DUr|yDU|ysA|ymUs_) delete); UNSET flag
    L = _mark(word, "lAr")
    if L:
        word = word[:-L]
        L2 = _first(word, ("DUr", "yDU", "ysA", "ymUs"))
        if L2:
            word = word[:-L2]
        return word, False
    # alt 4: nUz (yDU or ysA) ] delete
    L = _mark(word, "nUz")
    if L:
        rest = word[:-L]
        L2 = _first(rest, ("yDU", "ysA"))
        if L2:
            return rest[:-L2], True
    # alt 5: (sUnUz|yUz|sUn|yUm) ] delete try([ymUs_] delete)
    L = _first(word, ("sUnUz", "yUz", "sUn", "yUm"))
    if L:
        word = word[:-L]
        L2 = _mark(word, "ymUs")
        if L2:
            word = word[:-L2]
        return word, True
    # alt 6: DUr ] delete try(((sUnUz|lAr|yUm|sUn|yUz|true) ymUs_) delete)
    L = _mark(word, "DUr")
    if L:
        word = word[:-L]
        rest = word
        L2 = _first(rest, ("sUnUz", "lAr", "yUm", "sUn", "yUz")) or 0
        rest2 = rest[: len(rest) - L2] if L2 else rest
        L3 = _mark(rest2, "ymUs")
        if L3:
            word = rest2[:-L3]
        return word, True
    return word, True


def _chain_ki(word: str):
    """stem_suffix_chain_after_ki — ``word`` ends with 'ki' (verified by
    the caller); marks match BEFORE the ki and deletes include it.
    Returns the new word, or None when no branch applies."""
    base = word[:-2]
    L = _mark(base, "DA")
    if L:
        rest = base[:-L]
        L2 = _mark(rest, "lAr")
        if L2:
            rest2 = rest[:-L2]
            if rest2.endswith("ki"):
                r = _chain_ki(rest2)
                if r is not None:
                    return r
            return rest2
        L2 = _mark(rest, "poss")
        if L2:
            rest2 = rest[:-L2]
            L3 = _mark(rest2, "lAr")
            if L3:
                rest3 = rest2[:-L3]
                if rest3.endswith("ki"):
                    r = _chain_ki(rest3)
                    if r is not None:
                        return r
                return rest3
            return rest2
        return rest
    L = _mark(base, "nUn")
    if L:
        rest = base[:-L]
        L2 = _mark(rest, "lArI")
        if L2:
            return rest[:-L2]
        L2 = _first(rest, ("poss", "sU"))
        if L2:
            rest2 = rest[:-L2]
            L3 = _mark(rest2, "lAr")
            if L3:
                rest3 = rest2[:-L3]
                if rest3.endswith("ki"):
                    r = _chain_ki(rest3)
                    if r is not None:
                        return r
                return rest3
            return rest2
        if rest.endswith("ki"):
            r = _chain_ki(rest)
            if r is not None:
                return r
        return rest
    L = _mark(base, "nDA")
    if L:
        rest = base[:-L]
        L2 = _mark(rest, "lArI")
        if L2:
            return rest[:-L2]
        L2 = _mark(rest, "sU")
        if L2:
            rest2 = rest[:-L2]
            L3 = _mark(rest2, "lAr")
            if L3:
                rest3 = rest2[:-L3]
                if rest3.endswith("ki"):
                    r = _chain_ki(rest3)
                    if r is not None:
                        return r
                return rest3
            return rest2
        return None
    return None


def _try_ki(word: str):
    """mark_ki: literal 'ki' + tail-call into the chain; None = no 'ki'
    or no chain branch applied."""
    if word.endswith("ki"):
        return _chain_ki(word)
    return None


def _tail_lAr_ki(word: str) -> str:
    """Shared sub-chain tail: try lAr -> delete -> try('ki' chain)."""
    L = _mark(word, "lAr")
    if L:
        word = word[:-L]
        r = _try_ki(word)
        if r is not None:
            return r
    return word


def _noun_suffixes(word: str) -> str:
    # A: lAr ] delete try('ki' chain)
    L = _mark(word, "lAr")
    if L:
        word = word[:-L]
        r = _try_ki(word)
        if r is not None:
            return r
        return word
    # B: cA ] delete (lArI | (poss|sU)->lAr->ki | lAr->ki)
    L = _mark(word, "cA")
    if L:
        word = word[:-L]
        L2 = _mark(word, "lArI")
        if L2:
            return word[:-L2]
        L2 = _first(word, ("poss", "sU"))
        if L2:
            return _tail_lAr_ki(word[:-L2])
        return _tail_lAr_ki(word)
    # C: (nDA or nA) (lArI ]del | sU ]del ->lAr->ki | ki+chain | fall)
    L = _mark(word, "nDA") or _mark(word, "nA")
    if L:
        rest = word[: len(word) - L]
        L2 = _mark(rest, "lArI")
        if L2:
            return rest[:-L2]
        L2 = _mark(rest, "sU")
        if L2:
            return _tail_lAr_ki(rest[:-L2])
        r = _try_ki(rest)
        if r is not None:
            return r
        # fall through with the ORIGINAL word
    # E: (nDAn or nU) (sU ]del ->lAr->ki | lArI END-no-del | fall)
    L = _mark(word, "nDAn") or _mark(word, "nU")
    if L:
        rest = word[: len(word) - L]
        L2 = _mark(rest, "sU")
        if L2:
            return _tail_lAr_ki(rest[:-L2])
        if _mark(rest, "lArI"):
            return word  # matched, nothing deleted
        # fall through with the ORIGINAL word
    # D: DAn ] delete (poss->lAr->ki | lAr->del->ki | bare ki)
    L = _mark(word, "DAn")
    if L:
        word = word[:-L]
        L2 = _mark(word, "poss")
        if L2:
            return _tail_lAr_ki(word[:-L2])
        L2 = _mark(word, "lAr")
        if L2:
            word = word[:-L2]
        r = _try_ki(word)
        if r is not None:
            return r
        return word
    # F: (nUn or ylA) ] delete; (lAr->delete (ki END | poss/sU cont.))
    L = _mark(word, "nUn") or _mark(word, "ylA")
    if L:
        word = word[:-L]
        L2 = _mark(word, "lAr")
        if L2:
            word = word[:-L2]
            r = _try_ki(word)
            if r is not None:
                return r
        L2 = _first(word, ("poss", "sU"))
        if L2:
            return _tail_lAr_ki(word[:-L2])
        r = _try_ki(word)
        if r is not None:
            return r
        return word
    # G: lArI ] delete
    L = _mark(word, "lArI")
    if L:
        return word[:-L]
    # H: 'ki' chain (falls through when no chain branch applies)
    r = _try_ki(word)
    if r is not None:
        return r
    # I: (DA or yU or yA) ] delete (poss->lAr->ki | lAr->ki)
    L = _mark(word, "DA") or _mark(word, "yU") or _mark(word, "yA")
    if L:
        word = word[:-L]
        L2 = _mark(word, "poss")
        if L2:
            return _tail_lAr_ki(word[:-L2])
        return _tail_lAr_ki(word)
    # J: poss ] delete ->lAr->ki ; or sU ] delete ->lAr->ki
    L = _mark(word, "poss")
    if L:
        return _tail_lAr_ki(word[:-L])
    L = _mark(word, "sU")
    if L:
        return _tail_lAr_ki(word[:-L])
    return word


def _postlude(word: str) -> str:
    if word in ("ad", "soyad"):
        return word
    # append_U to stems ending d/g: harmonize with the LAST vowel
    if word.endswith(("d", "g")):
        for i in range(len(word) - 1, -1, -1):
            if word[i] in _VOW:
                v = word[i]
                if v in "aı":
                    word += "ı"
                elif v in "ei":
                    word += "i"
                elif v in "ou":
                    word += "u"
                else:
                    word += "ü"
                break
    # final consonant devoicing
    last = word[-1:] if word else ""
    if last == "b":
        word = word[:-1] + "p"
    elif last == "c":
        word = word[:-1] + "ç"
    elif last == "d":
        word = word[:-1] + "t"
    elif last == "ğ":
        word = word[:-1] + "k"
    return word


def stem_turkish(word: str) -> str:
    if sum(ch in _VOW for ch in word) <= 1:
        return word
    original = word
    word, cont = _nominal_verb(word)
    if cont:
        word = _noun_suffixes(word)
        word = _postlude(word)
    # else: the unset continue-flag ABORTS the whole stem: noun suffixes
    # AND the postlude (append_U, devoicing) are skipped — 'adablar'
    # -> 'adab' (no devoice) vs 'adabı' -> 'adap'
    if not word:
        # a whole-word suffix match strips to empty; the original word
        # is restored ('sünüz' -> 'sünüz', but 'asünüz' -> 'a')
        return original
    return word
