"""MinHash+LSH dedup scale soak: deterministic dup-heavy corpus, planted
near-duplicate recall + false-positive audit + throughput.

Corpus (no external data, hash-derived so any partitioning yields the
same documents): N_UNIQUE base docs of DOC_LEN vocabulary words; ids >=
N_UNIQUE are near-duplicates of base ``id - N_UNIQUE`` with ~3% of
tokens replaced (Jaccard ~0.9 vs the base).  The whole corpus streams
through ``minhash_lsh_duplicates`` (signature -> band groupby ->
candidate join — no driver-side dicts), then the planted-pair recall and
cross-cluster false positives are computed with dataset ops.

Usage: RAY_GRAFT_CPUS=32 python tools/dedup_soak.py [n_docs] [mode]

Modes: ``minhash`` (default) — LSH near-dup recall/throughput over the
~3%-mutated corpus; ``exact`` — byte-identical planted copies
(mutate_pct=0) through the metadata-only exact_dedup (survivor-set
identity is asserted, so this is also a correctness soak); ``ngram`` —
LSH + exact-Jaccard verification, plus a verify-kernel microbench
(scalar string-set vs vectorized sorted-hash-intersection)."""

import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONPATH",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray


def gen_corpus(n_docs: int, n_unique: int, doc_len: int = 60,
               vocab: int = 5000, mutate_pct: int = 3):
    """Dataset of (doc_id, text); derivation is pure hash of doc_id."""
    import ray.data

    def mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """splitmix-style 2D hash — affine formulas alias across docs
        (shared shingles between unrelated bases), a real mix doesn't."""
        x = (a.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)) \
            ^ (b.astype(np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9))
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(29)
        return x

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        base = np.where(ids < n_unique, ids, ids - n_unique)
        # token matrix: word index per (doc, slot), derived from the BASE
        # id so duplicates start from identical docs
        slots = np.arange(doc_len, dtype=np.int64)
        w = (mix(base, slots) % np.uint64(vocab)).astype(np.int64)
        # mutate ~mutate_pct% of a duplicate's slots to fresh words
        is_dup = ids >= n_unique
        mut = (mix(ids * 31 + 7, slots) % np.uint64(100)).astype(np.int64) \
            < mutate_pct
        mut &= is_dup[:, None]
        repl = vocab + (mix(ids * 131 + 3, slots)
                        % np.uint64(vocab)).astype(np.int64)
        w = np.where(mut, repl, w)
        texts = [" ".join(map(str, row)) for row in w]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ray.data.range(n_docs, override_num_blocks=64).map_batches(
        build, batch_format="pyarrow")


def run_exact(corpus, n_docs: int, n_unique: int):
    """Planted byte-identical copies through the metadata-only exact
    dedup: survivors must be EXACTLY the n_unique base ids (keep=min)."""
    from paradedb_ray.pipelines.dedup import exact_dedup

    t0 = time.perf_counter()
    out = exact_dedup(corpus, "text", "doc_id").materialize()
    dt = time.perf_counter() - t0
    n_out = out.count()
    max_id = out.max("doc_id")
    print(f"docs={n_docs} planted_copies={n_docs - n_unique} "
          f"wall={dt:.1f}s throughput={n_docs / dt:,.0f} docs/s")
    print(f"survivors={n_out} (want {n_unique}) max_survivor_id={max_id} "
          f"(want < {n_unique})")
    assert n_out == n_unique and max_id == n_unique - 1, "exact soak FAILED"
    print("exact-mode soak OK: survivor set is exactly the base ids")


def run_ngram(corpus, n_docs: int, n_unique: int):
    from paradedb_ray.pipelines.dedup import (ngram_jaccard,
                                              ngram_jaccard_batch,
                                              ngram_jaccard_duplicates)

    t0 = time.perf_counter()
    pairs = ngram_jaccard_duplicates(corpus, "text", "doc_id",
                                     threshold=0.7).materialize()
    dt = time.perf_counter() - t0
    caught = fp = 0
    for ref in pairs.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        a = t.column("doc_id").to_numpy()
        b = t.column("dup_of").to_numpy()
        hi, lo = np.maximum(a, b), np.minimum(a, b)
        planted = (hi >= n_unique) & (lo == hi - n_unique)
        caught += int(planted.sum())
        fp += int((~planted).sum())
    n_planted = n_docs - n_unique
    print(f"docs={n_docs} wall={dt:.1f}s throughput={n_docs/dt:,.0f} docs/s "
          f"pairs={pairs.count()} recall={caught/max(n_planted,1):.4f} fp={fp}")
    # verify-kernel microbench: scalar string-set vs vectorized hashes
    sample = corpus.limit(4000).to_pandas()["text"].tolist()
    ta, tb = sample[: len(sample) // 2], sample[len(sample) // 2:]
    t0 = time.perf_counter()
    want = np.array([ngram_jaccard(a, b, 3) for a, b in zip(ta, tb)])
    t_scalar = time.perf_counter() - t0
    t0 = time.perf_counter()
    got = ngram_jaccard_batch(ta, tb, 3)
    t_batch = time.perf_counter() - t0
    assert np.array_equal(got, want), "kernel mismatch"
    print(f"verify kernel: scalar {len(ta)/t_scalar:,.0f} pairs/s, "
          f"batch {len(ta)/t_batch:,.0f} pairs/s "
          f"({t_scalar/t_batch:.1f}x), identical values")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "minhash"
    n_unique = int(n_docs * 0.8)
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from paradedb_ray.pipelines.dedup import minhash_lsh_duplicates

    mutate = 0 if mode == "exact" else 3
    corpus = gen_corpus(n_docs, n_unique,
                        mutate_pct=mutate).materialize()  # exclude gen cost
    # warm the worker pool (cold actors cost ~10s at 32 CPUs)
    corpus.map_batches(lambda b: b, batch_format="pyarrow").count()

    if mode == "exact":
        run_exact(corpus, n_docs, n_unique)
        ray.shutdown()
        return
    if mode == "ngram":
        run_ngram(corpus, n_docs, n_unique)
        ray.shutdown()
        return

    t0 = time.perf_counter()
    pairs = minhash_lsh_duplicates(corpus, "text", "doc_id").materialize()
    dt = time.perf_counter() - t0

    n_pairs = pairs.count()
    # planted recall: a dup id (>= n_unique) is caught when it appears on
    # either side of a pair with its own base (pairs map member -> bucket
    # min, which is the base here since base < dup id)
    import pyarrow.compute as pc

    caught = 0
    fp = 0
    for ref in pairs.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        a = t.column("doc_id").to_numpy()
        b = t.column("dup_of").to_numpy()
        hi, lo = np.maximum(a, b), np.minimum(a, b)
        planted = (hi >= n_unique) & (lo == hi - n_unique)
        caught += int(planted.sum())
        fp += int((~planted).sum())

    n_planted = n_docs - n_unique
    print(f"docs={n_docs} planted_dups={n_planted} wall={dt:.1f}s "
          f"throughput={n_docs/dt:,.0f} docs/s")
    print(f"pairs={n_pairs} recall={caught/n_planted:.4f} "
          f"cross_cluster_pairs={fp}")
    ray.shutdown()


if __name__ == "__main__":
    main()
