"""Snowball stemmer goldens: 120 (word -> stem) pairs per language,
produced by PostgreSQL 15's bundled snowball dictionaries (the official
Snowball-generated C, via ``ts_lexize('<lang>_stem', word)`` on a local
instance) — a public, independently-reproducible oracle.  Every
implemented language was additionally verified bit-exact against that
oracle on 8-16k fuzz+suffix vectors during development; these baked
pairs keep the parity durable without a PostgreSQL dependency.
"""

import json
import os

import pytest

from paradedb_ray.text.stemmer import stemmer_for

_GOLDENS = json.load(open(
    os.path.join(os.path.dirname(__file__), "data",
                 "snowball_goldens.json"), encoding="utf-8"))


@pytest.mark.parametrize("lang", sorted(_GOLDENS))
def test_snowball_golden(lang):
    fn = stemmer_for(lang)
    bad = [(w, fn(w), s) for w, s in _GOLDENS[lang] if fn(w) != s]
    assert not bad, f"{lang}: {len(bad)} mismatches, first: {bad[:3]}"


def test_unknown_languages_raise():
    with pytest.raises(NotImplementedError):
        stemmer_for("klingon")
