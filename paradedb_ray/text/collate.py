"""Collation-aware sort keys for ORDER BY (`order_by_collation.sql`).

The reference refuses to push an ORDER BY into tantivy when the column's
collation is not byte-ordered (tantivy sorts raw bytes — C/POSIX only)
and lets Postgres apply the ICU collation in a Sort node above the scan
(`order_by_collation.out` tests 1.2/4.2).  Here the engine IS the whole
stack, so an opt-in ``collation=<locale>`` sort-key modifier computes a
locale sort key engine-side instead:

* with PyICU importable, ``icu.Collator`` supplies the real UCA key;
* otherwise a documented fallback approximates UCA primary/tertiary
  strength: primary = casefolded NFKD with combining marks stripped,
  tertiary tiebreak = lowercase-before-uppercase per character, final
  tiebreak = raw codepoints (a deterministic total order).  The fallback
  reproduces the golden's en-US ordering (case-insensitive alphabetic,
  'Amsterdam' < 'berlin' < 'chicago' < 'Delhi').

Default (no modifier) stays Arrow's raw byte order — the exact analogue
of the reference's C-collation pushdown.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa

try:  # pragma: no cover - not present in this container
    import icu  # type: ignore

    _COLLATORS: dict = {}

    def _icu_key(s: str, locale: str) -> bytes:
        coll = _COLLATORS.get(locale)
        if coll is None:
            coll = _COLLATORS[locale] = icu.Collator.createInstance(
                icu.Locale(locale))
        return coll.getSortKey(s)

    HAVE_ICU = True
except ImportError:
    HAVE_ICU = False


def _fallback_key(s: str) -> bytes:
    primary = "".join(
        ch for ch in unicodedata.normalize("NFKD", s.casefold())
        if not unicodedata.combining(ch))
    tertiary = bytes(
        (1 if ch.isupper() else 0) for ch in s)
    return (primary.encode("utf-8") + b"\x00" + tertiary + b"\x00"
            + s.encode("utf-8"))


def sort_key_array(arr, locale: str) -> pa.Array:
    """Binary locale sort keys for a string array (nulls stay null)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if HAVE_ICU:  # pragma: no cover
        keys = [None if v is None else _icu_key(v, locale)
                for v in arr.to_pylist()]
    else:
        keys = [None if v is None else _fallback_key(v)
                for v in arr.to_pylist()]
    return pa.array(keys, pa.binary())
