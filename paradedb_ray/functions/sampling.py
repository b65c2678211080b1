"""Deterministic corpus sampling — the training-data-pipeline ops a
100-TB run needs to carve reproducible subsets without a shuffle.

Both ops key every decision off a 60-bit md5 hash of the row's key (the
same md5-low-60 trick as ``rolling_fingerprint``,
`functions/text_analysis.py`), so the EXACT survivor set is reproducible
in ANSI-ish SQL (DuckDB ``md5()`` + substr + BIGINT cast) and in any
other engine — a rerun, a different block layout, or a different cluster
size always picks the same rows.

* :func:`hash_sample` — global rate sampling: keep rows whose
  ``h(key || salt) % 10_000 < rate_bp``.  Stateless per-batch filter; no
  shuffle, no coordination, trivially resumable (the decision is a pure
  function of the row).
* :func:`stratified_sample` — exact per-group reservoir: the ``n`` rows
  with the smallest ``(h, key)`` per group.  Routes through
  :func:`~paradedb_ray.pipelines.relational.topn_per_group`, so each
  block first prunes to ≤n rows per group it contains (combiner) and the
  shuffle moves O(n × groups) rows — never the corpus.

Scale note: md5 per row is ~0.5 µs; for keys that are already integers a
splitmix64 variant would be ~10× faster, but md5 is what keeps the
survivor set SQL-reproducible (the oracle contract this repo holds
everywhere).  Swap only if you give up the oracle.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data


def _hash60(s: str) -> int:
    """Low 60 bits of md5 — matches DuckDB
    ``CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)``."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


class _HashSampler:
    """Per-batch deterministic filter: keep ``h(key||salt) % 10k < rate_bp``."""

    def __init__(self, key_col: str, rate_bp: int, salt: str):
        self.key_col = key_col
        self.rate_bp = int(rate_bp)
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        keys = batch.column(self.key_col).to_pylist()
        salt = self.salt
        bp = self.rate_bp
        mask = np.fromiter(
            (_hash60(str(k) + salt) % 10_000 < bp for k in keys),
            dtype=bool, count=len(keys))
        return batch.filter(pa.array(mask))


def hash_sample(ds: ray.data.Dataset, key_col: str, rate_bp: int,
                salt: str = "") -> ray.data.Dataset:
    """Keep a deterministic ``rate_bp``/10000 fraction of rows by key hash.

    Same contract as a Bernoulli sample but reproducible: the decision
    depends only on ``(key, salt)``, so reruns, retries and re-layouts
    keep the identical survivor set, and disjoint salts give independent
    (non-overlapping-in-distribution) samples for train/held-out splits.
    """
    return ds.map_batches(_HashSampler(key_col, rate_bp, salt),
                          batch_format="pyarrow", batch_size=None)


def add_hash_column(ds: ray.data.Dataset, key_col: str, out_col: str,
                    salt: str = "") -> ray.data.Dataset:
    """Append the 60-bit md5 hash of ``key_col`` (as int64) — the sort
    key for :func:`stratified_sample` and any rank-by-hash downstream."""

    def add(batch: pa.Table) -> pa.Table:
        vals = [_hash60(str(k) + salt)
                for k in batch.column(key_col).to_pylist()]
        return batch.append_column(out_col, pa.array(vals, pa.int64()))

    return ds.map_batches(add, batch_format="pyarrow", batch_size=None)


class _MixSampler:
    """Per-batch deterministic filter with a PER-GROUP rate: keep rows
    whose ``h(key||salt) % 10k < rates[group]`` (``default_bp`` for
    groups absent from the map, NULL group included)."""

    def __init__(self, group_col: str, key_col: str, rates: dict,
                 default_bp: int, salt: str):
        self.group_col = group_col
        self.key_col = key_col
        self.rates = dict(rates)
        self.default_bp = int(default_bp)
        self.salt = salt

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        keys = batch.column(self.key_col).to_pylist()
        groups = batch.column(self.group_col).to_pylist()
        rates, dflt, salt = self.rates, self.default_bp, self.salt
        mask = np.fromiter(
            (_hash60(str(k) + salt) % 10_000 < rates.get(g, dflt)
             for k, g in zip(keys, groups)),
            dtype=bool, count=len(keys))
        return batch.filter(pa.array(mask))


def mix_sources(ds: ray.data.Dataset, group_col: str, key_col: str,
                rates: dict, default_bp: int = 0,
                salt: str = "") -> ray.data.Dataset:
    """Weighted corpus mixing: resample each source/domain/language at
    its own deterministic rate in ONE stateless pass (the standard
    LLM-training recipe of up-/down-weighting sources without
    duplicating or shuffling data).  ``rates`` maps group value ->
    basis points kept; unknown (and NULL) groups fall back to
    ``default_bp``.  The survivor set is a pure function of
    ``(key, salt)`` per group, so it is layout- and retry-stable and
    exactly reproducible in SQL (a CASE over the same md5 predicate)."""
    return ds.map_batches(
        _MixSampler(group_col, key_col, rates, default_bp, salt),
        batch_format="pyarrow", batch_size=None)


def stratified_sample(ds: ray.data.Dataset, group_col: str, key_col: str,
                      n: int, salt: str = "") -> ray.data.Dataset:
    """Exact deterministic per-group sample: the ``n`` rows with the
    smallest ``(h(key||salt), key)`` in each group (a per-group md5-rank
    reservoir — balanced subsets per language/source without a global
    shuffle; the top-n prune moves only O(n × groups) rows)."""
    from paradedb_ray.pipelines.relational import topn_per_group

    h = "__strat_h"
    withh = add_hash_column(ds, key_col, h, salt)
    out = topn_per_group(withh, [group_col],
                         [(h, "ascending"), (key_col, "ascending")], n)
    return out.drop_columns([h])
