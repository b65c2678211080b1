"""Greek Snowball stemmer (snowballstem.org/algorithms/greek/stemmer.html,
the Ntais/Saroukos algorithm).

Suffix and exception tables are auto-extracted from the official
Snowball-generated among arrays (``greek_data.py``); the step driver
follows the published algorithm with details (exception-action bindings,
test1 gating, whole-word anchoring) resolved against the official
implementation and verified bit-exact on fuzz vectors.
"""

from __future__ import annotations

from paradedb_ray.text import greek_data as D

_V = frozenset("αεηιουω")   # vowel grouping
_V2 = frozenset("αεηιοω")   # vowel grouping without υ

#: derived from the official TOLOWER among (result = alphabet index);
#: note the official quirks 'ϊ'->'η' and 'ΐ'->'η' (but 'Ϊ'->'ι')
_ALPHABET = "αβγδεζηθικλμνξοπρστυφχψω"
_LOWER = {s: _ALPHABET[r - 1] for s, r in D.TOLOWER if s and 1 <= r <= 24}


def _tolower(word: str) -> str:
    # callers (ts_lexize / the analyzer chain) lowercase BEFORE the
    # stemmer, so uppercase table entries are effectively unreachable —
    # 'Ϊ' becomes 'ϊ' first and then maps to 'η' like the official build
    return "".join(_LOWER.get(ch, ch) for ch in word.lower())


def _longest(word: str, table):
    """Longest (suffix, res) among the (string, res) entries."""
    best = None
    for s, r in table:
        if s and word.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, r)
    return best


def _whole(word: str, table):
    """(entry, res) when the ENTIRE word is in the table (atlimit)."""
    for s, r in table:
        if word == s:
            return (s, r)
    return None


def _ends(word: str, table):
    """Longest ends-with entry (res -1 entries VETO shorter positives)."""
    return _longest(word, table)


class _G:
    __slots__ = ("w", "test1")

    def __init__(self, w):
        self.w = w
        self.test1 = True


def _suffix_del(g, table) -> bool:
    m = _longest(g.w, table)
    if m is None:
        return False
    g.w = g.w[: -len(m[0])]
    g.test1 = False
    return True


def stem_greek(word: str) -> str:
    # callers lowercase first (per-char, so Σ -> σ never final-ς);
    # the empty-restore returns THAT form
    original = "".join(c.lower() for c in word)
    word = _tolower(word)
    if len(word) < 3:
        return word
    g = _G(word)

    # step1: irregular nouns (replace, unset test1)
    m = _longest(g.w, D.STEP1)
    if m is not None:
        g.w = g.w[: -len(m[0])] + {
            1: "φα", 2: "σκα", 3: "ολο", 4: "σο", 5: "τατο", 6: "κρε",
            7: "περ", 8: "τερ", 9: "φω", 10: "καθεστ", 11: "γεγον",
        }[m[1]]
        g.test1 = False

    # steps1: -ιζω verbs
    if _suffix_del(g, D.S1_SUF):
        m = _whole(g.w, D.S1_EXC)
        if m:
            g.w += "ι" if m[1] == 1 else "ιζ"

    # steps2: -ωνω verbs
    if _suffix_del(g, D.S2_SUF):
        if _whole(g.w, D.S2_EXC):
            g.w += "ων"

    # steps3: -ισα verbs (whole-word 'ισα' strips to empty and is
    # restored by the empty-result rule)
    if _suffix_del(g, D.S3_SUF):
        m = _whole(g.w, D.S3_EXC)
        if m:
            g.w += "ι" if m[1] == 1 else "ισ"

    # steps4: -ισω verbs
    if _suffix_del(g, D.S4_SUF):
        if _whole(g.w, D.S4_EXC):
            g.w += "ι"

    # steps5: -ιστα adjectives
    if _suffix_del(g, D.S5_SUF):
        m = _whole(g.w, D.S5_EXC)
        if m:
            g.w += "ι" if m[1] == 1 else "ιστ"

    # steps6: -ισμος nouns.  EXC1 is ends-with and rewrites the matched
    # tail to its root (σκεπτικ -> σκεπτ); EXC2 is whole-word.
    if _suffix_del(g, D.S6_SUF):
        m = _ends(g.w, D.S6_EXC1)
        if m:
            g.w = g.w[: -len(m[0])] + {
                1: "αγνωστ", 2: "ατομ", 3: "γνωστ", 4: "εθν",
                5: "εκλεκτ", 6: "σκεπτ", 7: "τοπ", 8: "αλεξανδρ",
                9: "βυζαντ", 10: "θεατρ",
            }[m[1]]
        else:
            m = _whole(g.w, D.S6_EXC2)
            if m:
                g.w += "ισμ" if m[1] == 1 else "ι"

    # steps7: -αρακι nouns
    if _suffix_del(g, D.S7_SUF):
        if _whole(g.w, D.S7_EXC):
            g.w += "αρακ"

    # steps8: -ακι / -ιτσα nouns
    if _suffix_del(g, D.S8_SUF):
        m = _whole(g.w, D.S8_EXC)
        if m:
            g.w += "ακ" if m[1] == 1 else "ιτσ"
        elif g.w.endswith("κορ"):
            g.w += "ιτσ"

    # steps9: -ιδιο nouns (whole-word list OR ends-with {ε, παιχν})
    if _suffix_del(g, D.S9_SUF):
        if _whole(g.w, D.S9_EXC) or _ends(g.w, D.ST3B_EXC):
            g.w += "ιδ"

    # steps10: -ισκος nouns
    if _suffix_del(g, D.S10_SUF):
        if _whole(g.w, D.S10_EXC):
            g.w += "ισκ"

    # step2a: -αδες (exception list is ends-with)
    m = _longest(g.w, D.ST2A_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        if not _ends(g.w, D.ST2A_EXC):
            g.w += "αδ"

    # step2b: -εδες
    m = _longest(g.w, D.ST2B_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        if _ends(g.w, D.ST2B_EXC):
            g.w += "εδ"

    # step2c: -ουδες
    m = _longest(g.w, D.ST2C_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        if _ends(g.w, D.ST2C_EXC):
            g.w += "ουδ"

    # step2d: -εως
    m = _longest(g.w, D.ST2D_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _whole(g.w, D.ST2D_EXC):
            g.w += "ε"

    # step3: -ιου/-ια/-ιων
    m = _longest(g.w, D.ST3_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if g.w and g.w[-1] in _V:
            g.w += "ι"

    # step4: -ικου/-ικα/-ικων
    m = _longest(g.w, D.ST4_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if (g.w and g.w[-1] in _V
                and _whole(g.w[:-1], D.ST4_EXC)):
            # bracket-vowel variant: the trailing vowel is consumed and
            # the exception (anchored at word start) doubles the append
            g.w = g.w[:-1] + "ικικ"
        elif (g.w and g.w[-1] in _V) or _whole(g.w, D.ST4_EXC):
            g.w += "ικ"

    # step5a: -αμε.  Whole-word 'αγαμε': the official rule writes to the
    # LAST slice region — untouched input has the whole word as the
    # slice (replace -> 'αγαμ'), while a word an earlier step cut down
    # to 'αγαμε' has an empty slice at the cut (insert -> 'αγαμεαγαμ')
    if g.w == "αγαμε":
        if g.w == word:
            g.w = "αγαμ"
        else:
            g.w += "αγαμ"
    m = _longest(g.w, D.S5A_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
    if g.w.endswith("αμε"):
        g.w = g.w[:-3]
        g.test1 = False
        if _whole(g.w, D.S5A_EXC):
            g.w += "αμ"

    # step5b: -ανε
    m = _longest(g.w, D.S5B_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _whole(g.w, D.S5B_EXC1):
            g.w += "αγαν"
    if g.w.endswith("ανε"):
        g.w = g.w[:-3]
        g.test1 = False
        if (g.w and g.w[-1] in _V2
                and _whole(g.w[:-1], D.S5B_EXC2)):
            g.w = g.w[:-1] + "αναν"   # bracket-vowel: 'γωανε' -> 'γαναν'
        elif (g.w and g.w[-1] in _V2) or _whole(g.w, D.S5B_EXC2):
            g.w += "αν"

    # step5c: -ετε
    if _suffix_del(g, D.S5C_PRE):
        pass
    if g.w.endswith("ετε"):
        g.w = g.w[:-3]
        g.test1 = False
        # bracket-tail variant: the tail is a trailing vowel OR the
        # longest EXC1 suffix; if the rest is wholly an EXC2 entry the
        # tail is replaced with 'ετετ' ('υωετε' -> 'υετετ',
        # 'υδιαθετε' -> 'υετετ')
        tail = 1 if (g.w and g.w[-1] in _V2) else 0
        if not tail:
            m = _longest(g.w, D.S5C_EXC1)
            if m is not None:
                tail = len(m[0])
        if tail and _whole(g.w[:-tail], D.S5C_EXC2):
            g.w = g.w[:-tail] + "ετετ"
        elif ((g.w and g.w[-1] in _V2) or _longest(g.w, D.S5C_EXC1)
                or _whole(g.w, D.S5C_EXC2)):
            g.w += "ετ"

    # step5d: -οντας/-ωντας
    m = _longest(g.w, D.S5D_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if g.w == "αρχ":
            g.w += "οντ"
        elif g.w.endswith("κρε"):
            g.w += "ωντ"

    # step5e: -ομαστε
    m = _longest(g.w, D.S5E_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if g.w == "ον":
            g.w += "ομαστ"

    # step5f: -ιεστε / -εστε
    if g.w.endswith("ιεστε"):
        g.w = g.w[:-5]
        g.test1 = False
        if _whole(g.w, D.S5F_EXC):
            g.w += "ιεστ"
    if g.w.endswith("εστε"):
        g.w = g.w[:-4]
        g.test1 = False
        if _whole(g.w, D.S5F_EXC2):
            g.w += "ιεστ"

    # step5g: -ηκα / -ηθηκα
    if _suffix_del(g, D.S5G_PRE):
        pass
    m = _longest(g.w, D.S5G_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _longest(g.w, D.S5G_EXC1) or _whole(g.w, D.S5G_EXC2):
            g.w += "ηκ"

    # step5h: -ουσα
    m = _longest(g.w, D.S5H_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _ends(g.w, D.S5H_EXC1) or _whole(g.w, D.S5H_EXC2):
            g.w += "ουσ"

    # step5i: -ησε/-ησου/-ησα
    m = _longest(g.w, D.S5I_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _whole(g.w, D.S5I_EXC2):
            g.w += "ησ"

    # step5j: -αγα/-αγες/-αγε
    m = _longest(g.w, D.S5J_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if g.w == "κολλ":
            g.w += "αγ"
        else:
            ex = _ends(g.w, D.S5J_EXC)
            if (ex and ex[1] == 1) or _whole(g.w, D.S5J_EXC2):
                g.w += "αγ"

    # step5k: -ηστε
    m = _longest(g.w, D.S5K_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _whole(g.w, D.S5K_EXC):
            g.w += "ηστ"

    # step5l: -ουνε/-ησουνε/-ηθουνε
    m = _longest(g.w, D.S5L_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _whole(g.w, D.S5L_EXC):
            g.w += "ουν"

    # step5m: -ουμε/-ησουμε/-ηθουμε
    m = _longest(g.w, D.S5M_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
        g.test1 = False
        if _whole(g.w, D.S5M_EXC):
            g.w += "ουμ"

    # step6: -ματα and general endings (only when nothing else matched)
    m = _longest(g.w, D.ST6A_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])] + "μα"
    if g.test1:
        m = _longest(g.w, D.ST6B_SUF)
        if m is not None:
            g.w = g.w[: -len(m[0])]

    # step7: comparatives/superlatives
    m = _longest(g.w, D.ST7_SUF)
    if m is not None:
        g.w = g.w[: -len(m[0])]
    # a pipeline that consumed the whole word restores the input
    return g.w if g.w else original
