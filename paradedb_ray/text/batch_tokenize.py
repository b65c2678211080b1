"""Vectorized batch tokenization for the ASCII fast path.

``Tokenizer.tokenize`` has an ASCII fast path (``text/tokenizers.py``):
for ASCII input with no token-removing filters, no stemmer and no ASCII
folding, the filtered token stream is exactly ``rx.findall(text.lower())``.
Calling that per row is the hot cost of segment builds (one ``re`` engine
invocation per document).  This module produces the identical token stream
for a whole Arrow string column at once, without materializing a single
Python string for the common case:

* the column's UTF-8 data buffer is already the concatenation of every
  document, and the offsets buffer is the document boundaries — no join
  or copy is needed;
* token membership per byte is a 256-entry table lookup (numpy fancy
  indexing), with the UAX#29 mid-word joins (``it's``, ``1,024``)
  expressed as a vectorized neighbour-class test;
* token texts are emitted as ONE ``pa.StringArray`` built from the
  masked byte stream + cumulative-length offsets, so downstream
  vocabulary building can use Arrow ``dictionary_encode`` (C speed)
  instead of ``pd.factorize`` over Python objects.

Byte-identity with the per-row fast path is guaranteed by construction:
the character-class tables are PROBED from the very regexes the scalar
path uses (a byte is a word char iff the pattern fullmatches it; a byte
is a joining mid iff the pattern fullmatches ``"a<c>b"`` / ``"1<c>2"``),
and ``tests/test_batch_tokenize.py`` fuzzes the equivalence.

Rows that are not eligible (non-ASCII text) fall back to the scalar
``tokenize`` per row; columns whose analyzer configuration is not
eligible (stemmer, stopwords, folding, non-fast tokenizer) are rejected
entirely (the caller keeps its list-based path).
"""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from paradedb_ray.text.tokenizers import (
    SimpleTokenizer,
    UnicodeWordsTokenizer,
    WhitespaceTokenizer,
)

__all__ = ["batch_tokenize_arrow"]

#: letter / digit classes used by the UAX#29 mid-word lookarounds
#: (must mirror ``tokenizers._LETTER`` / ``_DIGIT``)
_LETTER_RE = re.compile(r"[^\W\d_]", re.UNICODE)
_DIGIT_RE = re.compile(r"\d", re.UNICODE)


class _Spec:
    __slots__ = ("word", "letter", "digit", "mid_letter", "mid_digit",
                 "has_mids")


def _probe_spec(rx: "re.Pattern") -> _Spec:
    """Derive byte-class tables from the fast-path regex itself.

    ``word[b]``: a single char is a token on its own.
    ``mid_letter[b]`` / ``mid_digit[b]``: the char joins two word chars
    in letter / digit context (probed with ``a<c>b`` / ``1<c>2``) —
    exactly the UAX#29 WB6/7/11/12 shapes the scalar pattern encodes.
    Tables cover bytes 0..127 only; the batch path never sees >127
    (non-ASCII rows take the scalar fallback).
    """
    s = _Spec()
    s.word = np.zeros(256, dtype=bool)
    s.letter = np.zeros(256, dtype=bool)
    s.digit = np.zeros(256, dtype=bool)
    s.mid_letter = np.zeros(256, dtype=bool)
    s.mid_digit = np.zeros(256, dtype=bool)
    for b in range(128):
        c = chr(b)
        if rx.fullmatch(c) is not None:
            s.word[b] = True
            s.letter[b] = _LETTER_RE.fullmatch(c) is not None
            s.digit[b] = _DIGIT_RE.fullmatch(c) is not None
        else:
            s.mid_letter[b] = rx.fullmatch(f"a{c}b") is not None
            s.mid_digit[b] = rx.fullmatch(f"1{c}2") is not None
    s.has_mids = bool(s.mid_letter.any() or s.mid_digit.any())
    return s


_SPECS: dict = {}
#: tokenizer classes whose ASCII fast path the kernel reproduces; exact
#: type match (a subclass may override segmentation)
_KERNEL_CLASSES = (UnicodeWordsTokenizer, SimpleTokenizer,
                   WhitespaceTokenizer)


def _spec_for(tokenizer) -> Optional[_Spec]:
    cls = type(tokenizer)
    if cls not in _KERNEL_CLASSES:
        return None
    got = _SPECS.get(cls)
    if got is None:
        got = _SPECS[cls] = _probe_spec(cls._fast_re)
    return got


def _kernel(data: np.ndarray, doc_offsets: np.ndarray, spec: _Spec):
    """Token spans over the concatenated byte stream.

    ``doc_offsets`` (int64, [n_docs+1], first element 0) are hard run
    breaks: a token never spans two documents and a mid char never joins
    across a boundary.  Returns ``(tok_mask, starts, lengths)``.
    """
    N = len(data)
    tok = spec.word[data]
    brk = np.zeros(N + 1, dtype=bool)
    brk[doc_offsets] = True
    if spec.has_mids and N >= 3:
        mid_b = data[1:-1]
        L = spec.letter[data]
        D = spec.digit[data]
        mj = (spec.mid_letter[mid_b] & L[:-2] & L[2:]) \
            | (spec.mid_digit[mid_b] & D[:-2] & D[2:])
        # a join at i bridges i-1..i+1: forbid when a doc boundary sits
        # at i or i+1
        mj &= ~(brk[1:N - 1] | brk[2:N])
        tok[1:-1] |= mj
    if not tok.any():
        return tok, np.empty(0, np.int64), np.empty(0, np.int64)
    prev = np.empty(N, dtype=bool)
    prev[0] = False
    prev[1:] = tok[:-1]
    nxt = np.empty(N, dtype=bool)
    nxt[-1] = False
    nxt[:-1] = tok[1:]
    starts = np.flatnonzero(tok & (~prev | brk[:N]))
    ends = np.flatnonzero(tok & (~nxt | brk[1:N + 1])) + 1
    return tok, starts, ends - starts


def _string_buffers(arr: pa.Array):
    """(data uint8 ndarray, offsets int64 ndarray rebased to 0) for a
    (possibly sliced) StringArray."""
    offs_buf = arr.buffers()[1]
    data_buf = arr.buffers()[2]
    offs = np.frombuffer(offs_buf, dtype=np.int32)[
        arr.offset: arr.offset + len(arr) + 1].astype(np.int64)
    data = np.frombuffer(data_buf, dtype=np.uint8)[offs[0]: offs[-1]]
    return data, offs - offs[0]


def batch_tokenize_arrow(col, tokenizer):
    """Tokenize an Arrow string column with the analyzer's fast-path
    semantics, fully vectorized.

    Returns ``(tokens, doc_ids, pos, lens, has_value)`` where ``tokens``
    is a ``pa.StringArray`` of every kept token (grouped by document,
    document-order positions ascending), ``doc_ids`` int32, ``pos``
    int32 per-document token positions, ``lens`` int64 per-document
    token counts and ``has_value`` bool per document — or ``None`` when
    the analyzer configuration is not fast-path eligible (caller falls
    back to the scalar path).  Non-ASCII rows are tokenized per row with
    the scalar ``tokenize`` (identical by definition).
    """
    f = tokenizer.filters
    if f._removes or f._stem is not None or f.ascii_folding:
        return None
    spec = _spec_for(tokenizer)
    if spec is None:
        return None
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks() if col.num_chunks != 1 else col.chunk(0)
        if isinstance(col, pa.ChunkedArray):  # 0 chunks
            col = pa.array([], pa.string())
    if not pa.types.is_string(col.type):
        return None
    n = len(col)
    if n == 0:
        return (pa.array([], pa.string()), np.empty(0, np.int32),
                np.empty(0, np.int32), np.empty(0, np.int64),
                np.empty(0, dtype=bool))

    if col.null_count:
        has_value = ~np.asarray(col.is_null())
        col = pc.fill_null(col, "")
    else:
        has_value = np.ones(n, dtype=bool)

    ascii_ok = np.asarray(pc.string_is_ascii(col))
    all_ascii = bool(ascii_ok.all())
    fast_col = col if all_ascii else pc.if_else(
        pa.array(ascii_ok), col, pa.scalar("", pa.string()))
    if f.lowercase:
        fast_col = pc.ascii_lower(fast_col)

    data, doc_offsets = _string_buffers(fast_col)
    if len(data) > (1 << 31) - 2:  # int32 StringArray offset ceiling
        return None
    tok_mask, starts, tok_lens = _kernel(data, doc_offsets, spec)
    ntok = len(starts)

    if ntok:
        # gather token bytes: every masked byte belongs to exactly one
        # token, in stream order — one fancy-index extract, then offsets
        # from the cumulative lengths
        tok_bytes = np.ascontiguousarray(data[tok_mask])
        offs = np.zeros(ntok + 1, dtype=np.int64)
        np.cumsum(tok_lens, out=offs[1:])
        offs = offs.astype(np.int32)
        tokens = pa.StringArray.from_buffers(
            ntok, pa.py_buffer(offs), pa.py_buffer(tok_bytes))
        doc_of = (np.searchsorted(doc_offsets, starts, side="right") - 1) \
            .astype(np.int32)
        lens = np.bincount(doc_of, minlength=n).astype(np.int64)
        firsts = np.cumsum(lens) - lens
        pos = (np.arange(ntok, dtype=np.int64)
               - np.repeat(firsts, lens)).astype(np.int32)
    else:
        tokens = pa.array([], pa.string())
        doc_of = np.empty(0, np.int32)
        lens = np.zeros(n, dtype=np.int64)
        pos = np.empty(0, np.int32)

    if not all_ascii:
        fb_rows = np.flatnonzero(~ascii_ok & has_value)
        fb_toks: list = []
        fb_doc: list = []
        fb_pos: list = []
        tokenize = tokenizer.tokenize
        for i in fb_rows.tolist():
            ts = tokenize(col[i].as_py())
            if not ts:
                continue
            fb_toks.extend(ts)
            fb_doc.append(np.full(len(ts), i, dtype=np.int32))
            fb_pos.append(np.arange(len(ts), dtype=np.int32))
            lens[i] = len(ts)
        if fb_toks:
            tokens = pa.concat_arrays(
                [tokens, pa.array(fb_toks, pa.string())])
            doc_of = np.concatenate([doc_of] + fb_doc)
            pos = np.concatenate([pos] + fb_pos)

    return tokens, doc_of, pos, lens, has_value
