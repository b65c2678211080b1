"""Text-analysis stages for training-data pipelines: tokenize-as-table
(paradedb.tokenize twin, `pg_search/src/api/tokenize.rs:22-47`), token
counting, quality scoring, language-ID heuristic, and rolling-hash
document fingerprinting.  All are stateless vectorized ``map_batches``
stages (analyzers compiled once per callable instance)."""

from __future__ import annotations

import re
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from paradedb_ray.text.tokenizers import tokenizer_from_config

# -- paradedb.tokenize ------------------------------------------------------


def tokenize_table(tokenizer_config, text: str) -> pa.Table:
    """Debug table function: (token, position) rows for one string."""
    tok = tokenizer_from_config(
        tokenizer_config if isinstance(tokenizer_config, dict)
        else {"type": tokenizer_config})
    toks = tok.tokenize_tokens(text)
    return pa.table({
        "token": pa.array([t.text for t in toks]),
        "position": pa.array([t.position for t in toks], pa.int32()),
    })


def tokenize_dataset(ds: ray.data.Dataset, text_col: str,
                     tokenizer_config=None, key_col: Optional[str] = None
                     ) -> ray.data.Dataset:
    """flat_map each row into (key, token, position) rows."""
    cfg = tokenizer_config

    class Tok:
        def __init__(self):
            self.tok = tokenizer_from_config(
                cfg if isinstance(cfg, dict) or cfg is None
                else {"type": cfg})

        def __call__(self, batch: pa.Table) -> pa.Table:
            texts = batch.column(text_col).to_pylist()
            keys = batch.column(key_col).to_pylist() if key_col else range(len(texts))
            out_k, out_t, out_p = [], [], []
            for k, txt in zip(keys, texts):
                if txt is None:
                    continue
                for t in self.tok.tokenize_tokens(txt):
                    out_k.append(k)
                    out_t.append(t.text)
                    out_p.append(t.position)
            cols = {"token": pa.array(out_t), "position": pa.array(out_p, pa.int32())}
            if key_col:
                cols = {key_col: pa.array(out_k), **cols}
            return pa.table(cols)

    from paradedb_ray.pipelines.multimodal import _pool

    return ds.map_batches(Tok, batch_format="pyarrow", batch_size=None,
                          concurrency=_pool(None))


# -- token counting ---------------------------------------------------------

_BPEISH = re.compile(r"\w+|[^\w\s]")


def add_token_count(ds: ray.data.Dataset, text_col: str,
                    mode: str = "whitespace",
                    out_col: str = "n_tokens") -> ray.data.Dataset:
    """Append a token count column. mode: whitespace | bpe_ish (regex over
    words + punctuation, a cheap BPE proxy)."""

    def count(batch: pa.Table) -> pa.Table:
        if mode == "whitespace":
            # fully vectorized: count space-separated parts
            col = batch.column(text_col)
            parts = pc.split_pattern_regex(col, r"\s+")
            n = pc.list_value_length(parts)
            # empty strings -> 0
            n = pc.if_else(pc.equal(pc.utf8_length(pc.utf8_trim_whitespace(col)), 0),
                           pa.scalar(0, pa.int32()), n)
            return batch.append_column(out_col, n.cast(pa.int64()))
        texts = batch.column(text_col).to_pylist()
        n = [len(_BPEISH.findall(t or "")) for t in texts]
        return batch.append_column(out_col, pa.array(n, pa.int64()))

    return ds.map_batches(count, batch_format="pyarrow", batch_size=None)


# -- quality scoring --------------------------------------------------------

_STOPWORDS = frozenset(
    "the a an and or of to in is it that for on with as at by this".split())


def add_quality_score(ds: ray.data.Dataset, text_col: str) -> ray.data.Dataset:
    """Append quality features: n_chars_q, n_words, mean_word_len,
    punct_ratio, stopword_ratio, quality (composite in [0,1])."""

    def score(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        n_chars = np.zeros(n, dtype=np.int64)
        n_words = np.zeros(n, dtype=np.int64)
        mean_wl = np.zeros(n, dtype=np.float64)
        punct = np.zeros(n, dtype=np.float64)
        stopr = np.zeros(n, dtype=np.float64)
        for i, t in enumerate(texts):
            t = t or ""
            n_chars[i] = len(t)
            words = t.split()
            n_words[i] = len(words)
            if words:
                mean_wl[i] = sum(len(w) for w in words) / len(words)
                stopr[i] = sum(1 for w in words if w.lower() in _STOPWORDS) / len(words)
            if t:
                punct[i] = sum(1 for c in t if not c.isalnum() and not c.isspace()) / len(t)
        quality = np.clip(
            0.4 * (n_words >= 5)
            + 0.3 * ((mean_wl >= 3) & (mean_wl <= 12))
            + 0.2 * (punct < 0.2)
            + 0.1 * (stopr > 0.0),
            0, 1)
        return (batch
                .append_column("n_chars_q", pa.array(n_chars))
                .append_column("n_words", pa.array(n_words))
                .append_column("mean_word_len", pa.array(mean_wl))
                .append_column("punct_ratio", pa.array(punct))
                .append_column("stopword_ratio", pa.array(stopr))
                .append_column("quality", pa.array(quality.astype(np.float64))))

    return ds.map_batches(score, batch_format="pyarrow", batch_size=None)


# -- language id (n-gram/stopword heuristic) --------------------------------

_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "with"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "los", "por", "con"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "für"},
    "fr": {"le", "la", "les", "des", "est", "et", "un", "une", "dans", "pour"},
}


def add_repetition(ds: ray.data.Dataset, text_col: str,
                   prefix: str = "rep") -> ray.data.Dataset:
    """Append Gopher-style repetition features (the published
    quality-filter family: a document dominated by one repeated n-gram
    is boilerplate): ``{prefix}_top2`` = occurrence count of the most
    frequent token bigram, ``{prefix}2_frac`` = that count over the
    number of bigram slots (``n_tokens - 1``), 0.0 for docs with < 2
    tokens.

    Fully vectorized per batch: tokens factorize to int codes once, doc-
    crossing bigrams mask out, one lexsort + run-length pass finds each
    doc's top bigram — no Python loop over rows.  Exact DuckDB oracle
    (list_transform bigrams + per-doc max) in ``__ray_entry__``."""
    import pandas as pd

    def rep(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        ndocs = len(col)
        parts = pc.split_pattern_regex(col.fill_null(""), r"\s+")
        lens = pc.list_value_length(parts).to_numpy(zero_copy_only=False)
        doc_of = np.repeat(np.arange(ndocs), lens)
        toks = np.asarray(pc.list_flatten(parts).to_pandas(), dtype=object)
        valid = toks != ""
        toks, doc_of = toks[valid], doc_of[valid]
        n_tok = np.bincount(doc_of, minlength=ndocs).astype(np.int64)
        top = np.zeros(ndocs, np.int64)
        if len(toks) > 1:
            codes, uniq = pd.factorize(pd.Series(toks))
            codes = codes.astype(np.int64)
            same = doc_of[1:] == doc_of[:-1]
            if same.any():
                key = codes[:-1][same] * np.int64(len(uniq)) \
                    + codes[1:][same]
                bdoc = doc_of[:-1][same]
                order = np.lexsort((key, bdoc))
                k_s, d_s = key[order], bdoc[order]
                newrun = np.r_[True, (k_s[1:] != k_s[:-1])
                               | (d_s[1:] != d_s[:-1])]
                starts = np.flatnonzero(newrun)
                counts = np.diff(np.r_[starts, len(k_s)])
                np.maximum.at(top, d_s[starts], counts)
        frac = np.where(n_tok >= 2,
                        top / np.maximum(n_tok - 1, 1), 0.0)
        return (batch
                .append_column(f"{prefix}_n_tokens", pa.array(n_tok))
                .append_column(f"{prefix}_top2", pa.array(top))
                .append_column(f"{prefix}2_frac",
                               pa.array(frac, pa.float64())))

    return ds.map_batches(rep, batch_format="pyarrow", batch_size=None)


def classify_language(text: str) -> str:
    words = set((text or "").lower().split())
    best, best_n = "unknown", 0
    for lang, markers in _LANG_MARKERS.items():
        k = len(words & markers)
        if k > best_n:
            best, best_n = lang, k
    return best


def add_langid(ds: ray.data.Dataset, text_col: str,
               out_col: str = "lang_pred") -> ray.data.Dataset:
    def lid(batch: pa.Table) -> pa.Table:
        preds = [classify_language(t) for t in batch.column(text_col).to_pylist()]
        return batch.append_column(out_col, pa.array(preds, pa.string()))

    return ds.map_batches(lid, batch_format="pyarrow", batch_size=None)


# -- rolling-hash fingerprint ----------------------------------------------

_B = 1_000_003
_M = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Winnowing-style fingerprint: min of rolling hashes over token
    windows (deterministic)."""
    toks = (text or "").split()
    if not toks:
        return 0
    hs = [hash_token(t) for t in toks]
    if len(hs) <= window:
        acc = 0
        for h in hs:
            acc = (acc * _B + h) % _M
        return acc
    best = None
    acc = 0
    poww = pow(_B, window - 1, _M)
    for i, h in enumerate(hs):
        if i < window:
            acc = (acc * _B + h) % _M
            if i == window - 1 and (best is None or acc < best):
                best = acc
        else:
            acc = ((acc - hs[i - window] * poww) * _B + h) % _M
            if best is None or acc < best:
                best = acc
    return best


def hash_token(t: str) -> int:
    """60 low-order bits of md5 (< 2^60 < _M, so no reduction needed).

    md5 rather than blake2b so the whole fingerprint is reproducible in
    ANSI-ish SQL: DuckDB's ``md5(t)`` + HUGEINT modular arithmetic
    reproduces every value bit-exactly (the ``fingerprint`` oracle)."""
    import hashlib

    return int(hashlib.md5(t.encode()).hexdigest()[:15], 16)


def _fingerprint_from_hashes(hs: list, window: int) -> int:
    """The rolling-min recurrence of :func:`rolling_fingerprint`, over
    precomputed token hashes (bit-identical values)."""
    if not hs:
        return 0
    if len(hs) <= window:
        acc = 0
        for h in hs:
            acc = (acc * _B + h) % _M
        return acc
    best = None
    acc = 0
    poww = pow(_B, window - 1, _M)
    for i, h in enumerate(hs):
        if i < window:
            acc = (acc * _B + h) % _M
            if i == window - 1 and (best is None or acc < best):
                best = acc
        else:
            acc = ((acc - hs[i - window] * poww) * _B + h) % _M
            if best is None or acc < best:
                best = acc
    return best


def add_fingerprint(ds: ray.data.Dataset, text_col: str,
                    out_col: str = "fingerprint",
                    window: int = 8) -> ray.data.Dataset:
    def fp(batch: pa.Table) -> pa.Table:
        # blake2b once per UNIQUE token (vocabulary cost, not corpus
        # cost) — the rolling recurrence itself is cheap integer math
        tok_lists = [(t or "").split()
                     for t in batch.column(text_col).to_pylist()]
        memo: dict = {}
        vals = []
        for toks in tok_lists:
            hs = []
            for t in toks:
                h = memo.get(t)
                if h is None:
                    h = memo[t] = hash_token(t)
                hs.append(h)
            vals.append(_fingerprint_from_hashes(hs, window))
        return batch.append_column(out_col, pa.array(vals, pa.int64()))

    return ds.map_batches(fp, batch_format="pyarrow", batch_size=None)


# -- document chunking --------------------------------------------------------

_WS_TOKEN_RE = re.compile(r"\S+")


def chunk_documents(ds: ray.data.Dataset, text_col: str, key_col: str,
                    max_tokens: int = 128, overlap: int = 0,
                    ) -> ray.data.Dataset:
    """Sliding token-window chunking — the training-data op that splits
    long documents into model-context-sized pieces.

    Chunks start every ``max_tokens - overlap`` whitespace tokens; each
    chunk covers up to ``max_tokens`` tokens.  ``chunk_text`` is the
    ORIGINAL text slice between the first and last covered token (inner
    whitespace preserved), with exact char offsets for traceability.
    Output: (key, chunk_idx, chunk_text, n_tokens, char_start, char_end),
    one row per chunk, NULL/empty docs dropped.  Stateless vectorized-
    per-batch map_batches — chunk boundaries are a pure function of each
    row, so any block partitioning yields the same chunks.
    """
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    step = max_tokens - overlap

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        row_idx, cidx, ctext, ntok, cs, ce = [], [], [], [], [], []
        for r, txt in enumerate(texts):
            if not txt:
                continue
            spans = [(m.start(), m.end())
                     for m in _WS_TOKEN_RE.finditer(txt)]
            n = len(spans)
            if n == 0:
                continue
            for ci, start in enumerate(range(0, n, step)):
                stop = min(start + max_tokens, n)
                row_idx.append(r)
                cidx.append(ci)
                ctext.append(txt[spans[start][0]:spans[stop - 1][1]])
                ntok.append(stop - start)
                cs.append(spans[start][0])
                ce.append(spans[stop - 1][1])
        keys = batch.column(key_col).take(pa.array(row_idx, pa.int64()))
        return pa.table({
            key_col: keys,
            "chunk_idx": pa.array(cidx, pa.int32()),
            "chunk_text": pa.array(ctext, pa.string()),
            "n_tokens": pa.array(ntok, pa.int32()),
            "char_start": pa.array(cs, pa.int64()),
            "char_end": pa.array(ce, pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# -- PII scrubbing ------------------------------------------------------------

#: default masks: email, international-ish phone, IPv4 — each vectorized
#: through Arrow's RE2 kernel in one pass per pattern
DEFAULT_PII_PATTERNS = (
    (r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?\d[\d\-\s]{7,}\d", "<PHONE>"),
    (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def scrub_text(ds: ray.data.Dataset, text_col: str,
               patterns=DEFAULT_PII_PATTERNS,
               out_col: Optional[str] = None) -> ray.data.Dataset:
    """Mask PII-shaped spans: each (regex, replacement) pair applies in
    order via ``pc.replace_substring_regex`` (RE2, whole column per call
    — no Python row loop).  Writes ``out_col`` (default: in place)."""
    dst = out_col or text_col

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        for pat, repl in patterns:
            col = pc.replace_substring_regex(col, pattern=pat,
                                             replacement=repl)
        if dst in batch.column_names:
            return batch.set_column(batch.column_names.index(dst), dst, col)
        return batch.append_column(dst, col)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# -- benchmark decontamination -------------------------------------------------


def decontaminate(ds: ray.data.Dataset, text_col: str, needles,
                  case_insensitive: bool = True) -> ray.data.Dataset:
    """Drop documents containing ANY of the benchmark strings — exact
    substring containment, the standard eval-decontamination filter.
    The needle list is broadcast inside the (pickled-once) closure;
    each needle is one vectorized ``pc.match_substring`` pass."""
    needles = tuple(needles)

    def fn(batch: pa.Table) -> pa.Table:
        col = batch.column(text_col)
        bad = None
        for n in needles:
            hit = pc.match_substring(col, pattern=n,
                                     ignore_case=case_insensitive)
            bad = hit if bad is None else pc.or_kleene(bad, hit)
        if bad is None:
            return batch
        keep = pc.fill_null(pc.invert(bad), True)  # NULL text: keep
        return batch.filter(keep)

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def decontaminate_ngram(ds: ray.data.Dataset, text_col: str, needles,
                        n: int = 8) -> ray.data.Dataset:
    """Drop documents sharing ANY word ``n``-gram with a benchmark
    needle set — the published window-overlap decontamination recipe
    (GPT-3 used 13-grams), stricter than substring containment for
    paraphrased-but-overlapping leaks.

    Shingle identity is the 64-bit polynomial token-hash of
    `pipelines/dedup.py::_shingle_hash_sets` (equal word windows hash
    equal by construction; texts shorter than ``n`` contribute their
    whole token list as one window, same as the dedup kernel).  The
    needle hash set is built once and broadcast in the (pickled-once)
    closure; membership is a vectorized searchsorted per batch."""
    import numpy as np

    from paradedb_ray.pipelines.dedup import _shingle_hash_sets

    nh = _shingle_hash_sets([t or "" for t in needles], n)
    needle_h = np.unique(np.concatenate(nh)) if nh else np.empty(
        0, np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        if not len(needle_h):
            # check BEFORE hashing: with no needles the full per-batch
            # tokenize+hash pass would be wasted corpus work
            return batch
        hs = _shingle_hash_sets(batch.column(text_col).to_pylist(), n)
        lens = np.fromiter((len(h) for h in hs), dtype=np.int64,
                           count=len(hs))
        flat = (np.concatenate(hs) if lens.sum()
                else np.empty(0, np.uint64))
        idx = np.searchsorted(needle_h, flat)
        idx[idx == len(needle_h)] = 0
        hit = needle_h[idx] == flat
        doc_idx = np.repeat(np.arange(len(hs)), lens)
        bad = np.zeros(len(hs), np.int64)
        np.add.at(bad, doc_idx[hit], 1)
        return batch.filter(pa.array(bad == 0))

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# -- sample packing -------------------------------------------------------------


def pack_documents(ds: ray.data.Dataset, text_col: str, key_col: str,
                   budget: int, partition_cols: Optional[list] = None,
                   ) -> ray.data.Dataset:
    """Fixed-boundary sample packing: assign each document to the
    context-window bin its starting token offset falls in —
    ``bin = tokens_before // budget`` with documents ordered by
    ``key_col`` inside each partition.  Deterministic (a pure function
    of the partition's ordered token counts), so any block layout yields
    the same bins, and SQL-expressible for the oracle (a window
    running sum).

    At 100-TB scale pass ``partition_cols`` (e.g. a shard key): packing
    is then partition-local — one shuffle, no global order — which is
    how production packing runs; the global (no-partition) form is for
    small corpora and testing.  Output adds (n_tokens, bin).
    """
    from paradedb_ray.pipelines.aggregate import partitioned_window

    ds = add_token_count(ds, text_col, mode="whitespace")
    part = list(partition_cols) if partition_cols else []
    if not part:
        # single global partition: constant key (small-corpus form)
        def const(b: pa.Table) -> pa.Table:
            return b.append_column("__pack_part",
                                   pa.array([0] * b.num_rows, pa.int32()))

        ds = ds.map_batches(const, batch_format="pyarrow", batch_size=None)
        part = ["__pack_part"]
    out = partitioned_window(
        ds, part, [(key_col, "ascending")],
        {"__cum": ("running_sum", "n_tokens")})

    def binize(b: pa.Table) -> pa.Table:
        cum = b.column("__cum").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        before = (cum - n).astype(np.int64)
        bins = before // budget
        b = b.append_column("bin", pa.array(bins, pa.int64()))
        return b.drop_columns(["__cum"] + (["__pack_part"]
                                           if "__pack_part" in b.column_names
                                           else []))

    return out.map_batches(binize, batch_format="pyarrow", batch_size=None)
