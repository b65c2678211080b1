"""Deduplication pipelines for large-scale training-data curation:
exact (hash-partitioned), MinHash+LSH, SimHash, and n-gram Jaccard
verification.  All hashing is deterministic (no process salt), so results
are stable across runs and cluster sizes.

Scale design: per-doc signatures are computed vectorized in stateless
``map_batches``; the only wide steps are groupbys on hash/band keys —
each group is tiny (true duplicates), so no skew amplification.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_MERSENNE = (1 << 61) - 1


def _stable_hash64(values: list) -> np.ndarray:
    """Deterministic 64-bit content hash (blake2b) per value."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        h = hashlib.blake2b((v or "").encode("utf-8"), digest_size=8).digest()
        out[i] = int.from_bytes(h, "little")
    return out


def exact_dedup(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    keep: str = "min",
) -> ray.data.Dataset:
    """Exact duplicate removal: hash-partition on a content hash, keep the
    first (min key) row per group.  Emits the surviving rows (all columns)."""

    def add_hash(batch: pa.Table) -> pa.Table:
        h = _stable_hash64(batch.column(text_col).to_pylist())
        return batch.append_column("__h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow", batch_size=None)

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        # group = one content hash; resolve hash collisions by exact text
        g = g.sort_values(key_col, kind="mergesort")
        out = g.drop_duplicates(subset=[text_col], keep="first")
        return out.drop(columns="__h")

    return hashed.groupby("__h").map_groups(first_per_group,
                                            batch_format="pandas")


def _shingles(tokens: list, k: int) -> set:
    if len(tokens) < k:
        return {" ".join(tokens)} if tokens else set()
    return {" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)}


class MinHasher:
    """Stateful map_batches callable: 64-perm MinHash over word k-shingles.

    Fully vectorized across the batch: one fixed-key siphash pass over ALL
    shingles (pandas ``hash_array``), one ``(a·h+b) mod p`` + segmented min
    (``minimum.reduceat``) per permutation, and a polynomial band combine —
    no per-document Python loop.  Permutation parameters derive from a
    fixed seed (once per actor)."""

    def __init__(self, text_col: str, key_col: str, num_perm: int = 64,
                 shingle_k: int = 3, bands: int = 16, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.text_col = text_col
        self.key_col = key_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.bands = bands
        self.rows_per_band = num_perm // bands

    def signatures(self, texts: list):
        """-> (doc_index ndarray, sig matrix [n_docs_with_shingles, P])."""
        all_sh, counts, doc_idx = [], [], []
        for i, text in enumerate(texts):
            sh = _shingles((text or "").split(), self.shingle_k)
            if not sh:
                continue
            all_sh.extend(sh)
            counts.append(len(sh))
            doc_idx.append(i)
        if not all_sh:
            return np.empty(0, np.int64), np.empty((0, self.num_perm),
                                                   np.uint64)
        hs = pd.util.hash_array(np.asarray(all_sh, dtype=object))
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        sig = np.empty((len(counts), self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):
            vals = (self.a[p] * hs + self.b[p]) % _MERSENNE
            sig[:, p] = np.minimum.reduceat(vals, starts)
        return np.asarray(doc_idx, dtype=np.int64), sig

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        doc_idx, sig = self.signatures(texts)
        n = len(doc_idx)
        if n == 0:
            return pa.table({
                self.key_col: pa.array([], batch.column(self.key_col).type),
                "band": pa.array([], pa.int32()),
                "band_hash": pa.array([], pa.int64()),
            })
        kvals = batch.column(self.key_col).take(pa.array(doc_idx))
        # polynomial combine of each band's rows (vectorized per band)
        C = np.uint64(0x9E3779B97F4A7C15)
        out_keys, out_band, out_hash = [], [], []
        for bi in range(self.bands):
            chunk = sig[:, bi * self.rows_per_band:(bi + 1) * self.rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for j in range(self.rows_per_band):
                h = h * C + chunk[:, j]
            out_keys.append(kvals)
            out_band.append(np.full(n, bi, dtype=np.int32))
            out_hash.append((h & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64))
        return pa.table({
            self.key_col: pa.concat_arrays([pa.concat_arrays(k.chunks)
                                            if isinstance(k, pa.ChunkedArray)
                                            else k for k in out_keys]),
            "band": pa.array(np.concatenate(out_band)),
            "band_hash": pa.array(np.concatenate(out_hash)),
        })


def minhash_lsh_duplicates(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    num_perm: int = 64,
    shingle_k: int = 3,
    bands: int = 16,
) -> ray.data.Dataset:
    """MinHash+LSH near-duplicate candidates: shingle -> minhash -> band ->
    bucket groupby.  Emits (key, dup_of) pairs: every non-minimal member of
    a collision bucket maps to the bucket's minimal key (canonical doc)."""
    sigs = ds.map_batches(
        MinHasher(text_col, key_col, num_perm, shingle_k, bands),
        batch_format="pyarrow", batch_size=None,
        concurrency=None,
    )
    return _lsh_bucket_pairs(sigs, key_col, ["band", "band_hash"])


def _lsh_bucket_pairs(sigs: "ray.data.Dataset", key_col: str,
                      bucket_cols: list,
                      dedup: bool = True) -> "ray.data.Dataset":
    """(key, *bucket) rows -> (key, dup_of) pairs, canonical = bucket-min.

    Scale shape: ONE native hash aggregate finds each bucket's min key and
    size; only COLLIDING buckets (true near-dup candidates, a vanishing
    fraction of the corpus) are broadcast back and expanded — no per-group
    Python call over millions of singleton buckets."""
    from ray.data.aggregate import Count, Min

    agg = sigs.groupby(bucket_cols).aggregate(
        Min(on=key_col, alias_name="dup_of"), Count(alias_name="__n"))
    coll = agg.map_batches(
        lambda b: b.filter(pc.greater(b.column("__n"), 1)),
        batch_format="pyarrow", batch_size=None).to_pandas()
    if len(coll) == 0:
        return ray.data.from_pandas(pd.DataFrame({key_col: [], "dup_of": []}))
    canon = {tuple(r[c] for c in bucket_cols): r["dup_of"]
             for _, r in coll.iterrows()}
    import ray as _ray

    canon_ref = _ray.put(canon)

    def expand(batch: pa.Table) -> pa.Table:
        cmap = _ray.get(canon_ref)
        cols = [batch.column(c).to_pylist() for c in bucket_cols]
        keys = batch.column(key_col).to_pylist()
        out_k, out_d = [], []
        for i, k in enumerate(keys):
            d = cmap.get(tuple(c[i] for c in cols))
            if d is not None and d != k:
                out_k.append(k)
                out_d.append(d)
        return pa.table({key_col: pa.array(out_k, batch.column(key_col).type),
                         "dup_of": pa.array(out_d,
                                            batch.column(key_col).type)})

    pairs = sigs.map_batches(expand, batch_format="pyarrow", batch_size=None)
    if not dedup:
        return pairs
    # a key may collide in several bands: keep the smallest dup_of per key
    return pairs.groupby(key_col).aggregate(Min(on="dup_of",
                                                alias_name="dup_of"))


def _filter_colliding(sigs: "ray.data.Dataset", bucket_cols: list,
                      key_col: str) -> "ray.data.Dataset":
    """Keep only rows whose bucket holds >1 distinct key (the candidate
    fraction); singleton buckets — the overwhelming majority — never reach
    the per-bucket verification step."""
    from ray.data.aggregate import Count

    agg = sigs.groupby(bucket_cols).aggregate(Count(alias_name="__n"))
    coll = agg.map_batches(
        lambda b: b.filter(pc.greater(b.column("__n"), 1)),
        batch_format="pyarrow", batch_size=None).to_pandas()
    buckets = {tuple(r[c] for c in bucket_cols) for _, r in coll.iterrows()}
    import ray as _ray

    ref = _ray.put(buckets)

    def keep(batch: pa.Table) -> pa.Table:
        bs = _ray.get(ref)
        cols = [batch.column(c).to_pylist() for c in bucket_cols]
        mask = pa.array([tuple(c[i] for c in cols) in bs
                         for i in range(batch.num_rows)], pa.bool_())
        return batch.filter(mask)

    return sigs.map_batches(keep, batch_format="pyarrow", batch_size=None)


def simhash64(tokens: list) -> int:
    """64-bit SimHash over token hashes (document fingerprinting)."""
    if not tokens:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    one = np.uint64(1)
    for t in tokens:
        h = np.uint64(int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little"))
        bits = (h >> shifts) & one
        acc += np.where(bits == one, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out


def simhash_duplicates(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    hamming_k: int = 3,
) -> ray.data.Dataset:
    """SimHash near-dup: 64-bit fingerprint, banded into 4×16-bit chunks;
    docs sharing a chunk are candidates, verified by hamming distance <= k."""

    def sigs(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        keys = batch.column(key_col).to_pylist()
        out_k, out_band, out_chunk, out_sim = [], [], [], []
        for key, t in zip(keys, texts):
            s = simhash64((t or "").split())
            for b in range(4):
                out_k.append(key)
                out_band.append(b)
                out_chunk.append((s >> (16 * b)) & 0xFFFF)
                out_sim.append(s & 0x7FFFFFFFFFFFFFFF)
        return pa.table({key_col: pa.array(out_k), "band": pa.array(out_band, pa.int32()),
                         "chunk": pa.array(out_chunk, pa.int64()),
                         "sim": pa.array(out_sim, pa.int64())})

    sig = ds.map_batches(sigs, batch_format="pyarrow", batch_size=None)
    cand = _filter_colliding(sig, ["band", "chunk"], key_col)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g[key_col].nunique() < 2:
            return pd.DataFrame({key_col: [], "dup_of": []})
        g = g.drop_duplicates(subset=[key_col]).sort_values(key_col)
        keys = g[key_col].tolist()
        hams = g["sim"].to_numpy()
        out_k, out_d = [], []
        canon = keys[0]
        for i in range(1, len(keys)):
            d = bin(int(hams[0]) ^ int(hams[i])).count("1")
            if d <= hamming_k:
                out_k.append(keys[i])
                out_d.append(canon)
        return pd.DataFrame({key_col: out_k, "dup_of": out_d})

    pairs = cand.groupby(["band", "chunk"]).map_groups(bucket,
                                                       batch_format="pandas")
    from ray.data.aggregate import Min

    return pairs.groupby(key_col).aggregate(Min(on="dup_of",
                                                alias_name="dup_of"))


def ngram_jaccard(a: str, b: str, k: int = 3) -> float:
    """Exact word-k-gram Jaccard similarity (verification kernel)."""
    sa, sb = _shingles((a or "").split(), k), _shingles((b or "").split(), k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def ngram_jaccard_duplicates(
    ds: ray.data.Dataset,
    text_col: str,
    key_col: str,
    shingle_k: int = 3,
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
) -> ray.data.Dataset:
    """Near-dup pairs with EXACT n-gram-Jaccard verification: MinHash+LSH
    proposes candidate pairs (the scale path), then each pair is verified
    with the exact word-k-gram Jaccard kernel.  Emits
    (key, dup_of, jaccard) for pairs >= threshold.

    The verification join ships only the candidate keys' texts (a filter
    over the corpus), never all-pairs."""
    sigs = ds.map_batches(
        MinHasher(text_col, key_col, num_perm, shingle_k, bands),
        batch_format="pyarrow", batch_size=None)
    pairs = _lsh_bucket_pairs(sigs, key_col, ["band", "band_hash"],
                              dedup=False)
    cand = pairs.to_pandas().drop_duplicates([key_col, "dup_of"])
    if len(cand) == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {key_col: [], "dup_of": [], "jaccard": []}))

    # fetch the candidate keys' texts with a broadcast membership filter
    import ray as _ray

    wanted_ref = _ray.put(set(cand[key_col]) | set(cand["dup_of"]))

    def keep(batch: pa.Table) -> pa.Table:
        wanted = _ray.get(wanted_ref)
        kv = batch.column(key_col).to_pylist()
        mask = pa.array([k in wanted for k in kv], pa.bool_())
        return batch.filter(mask).select([key_col, text_col])

    texts = {r[key_col]: r[text_col]
             for r in ds.map_batches(keep, batch_format="pyarrow",
                                     batch_size=None).take_all()}
    out_k, out_d, out_j = [], [], []
    for _, row in cand.iterrows():
        j = ngram_jaccard(texts.get(row[key_col], ""),
                          texts.get(row["dup_of"], ""), shingle_k)
        if j >= threshold:
            out_k.append(row[key_col])
            out_d.append(row["dup_of"])
            out_j.append(j)
    res = pd.DataFrame({key_col: out_k, "dup_of": out_d, "jaccard": out_j})
    # keep one canonical target per duplicate key
    res = res.sort_values([key_col, "dup_of"]).drop_duplicates([key_col])
    return ray.data.from_pandas(res.reset_index(drop=True))


def embedding_near_duplicates(
    ds: ray.data.Dataset,
    vec_col: str,
    key_col: str,
    threshold: float = 0.95,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> ray.data.Dataset:
    """Embedding-cosine near-dup: random-hyperplane LSH (sign bits of
    ``V @ P``), banded; within each colliding bucket exact cosine verifies
    pairs >= threshold.  Emits (key, dup_of, cosine) with the bucket-minimal
    key canonical.  All-pairs work is confined to LSH buckets."""
    bits_per_band = n_bits // bands

    class Planes:
        def __init__(self):
            self.P = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            V = np.stack([np.asarray(v, dtype=np.float32)
                          for v in batch.column(vec_col).to_pylist()])
            if self.P is None:
                rng = np.random.RandomState(seed)
                self.P = rng.standard_normal((V.shape[1], n_bits)).astype(
                    np.float32)
            signs = (V @ self.P) > 0
            weights = (1 << np.arange(bits_per_band, dtype=np.int64))
            keys = batch.column(key_col).to_pylist()
            norm = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True),
                                  1e-12)
            out_k, out_b, out_h, out_v = [], [], [], []
            for b in range(bands):
                chunk = signs[:, b * bits_per_band:(b + 1) * bits_per_band]
                h = chunk.astype(np.int64) @ weights
                out_k.extend(keys)
                out_b.extend([b] * len(keys))
                out_h.extend(h.tolist())
                out_v.extend(norm.tolist())
            return pa.table({
                key_col: pa.array(out_k),
                "band": pa.array(out_b, pa.int32()),
                "bucket": pa.array(out_h, pa.int64()),
                "nvec": pa.array(out_v, pa.list_(pa.float32())),
            })

    sig = ds.map_batches(Planes(), batch_format="pyarrow", batch_size=None,
                         concurrency=2)

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[key_col]).sort_values(key_col)
        if len(g) < 2:
            return pd.DataFrame({key_col: [], "dup_of": [], "cosine": []})
        V = np.stack([np.asarray(v, dtype=np.float32) for v in g["nvec"]])
        keys = g[key_col].tolist()
        cos = V[1:] @ V[0]
        m = cos >= threshold
        return pd.DataFrame({key_col: np.asarray(keys[1:])[m],
                             "dup_of": keys[0],
                             "cosine": cos[m].astype(float)})

    cand = _filter_colliding(sig, ["band", "bucket"], key_col)
    pairs = cand.groupby(["band", "bucket"]).map_groups(
        bucket, batch_format="pandas")
    from ray.data.aggregate import Min

    return pairs.groupby(key_col).aggregate(Min(on="dup_of",
                                                alias_name="dup_of"))
