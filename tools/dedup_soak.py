"""MinHash+LSH dedup scale soak: deterministic dup-heavy corpus, planted
near-duplicate recall + false-positive audit + throughput.

Corpus (no external data, hash-derived so any partitioning yields the
same documents): N_UNIQUE base docs of DOC_LEN vocabulary words; ids >=
N_UNIQUE are near-duplicates of base ``id - N_UNIQUE`` with ~3% of
tokens replaced (Jaccard ~0.9 vs the base).  The whole corpus streams
through ``minhash_lsh_duplicates`` (signature -> band groupby ->
candidate join — no driver-side dicts), then the planted-pair recall and
cross-cluster false positives are computed with dataset ops.

Usage: RAY_GRAFT_CPUS=32 python tools/dedup_soak.py [n_docs]
"""

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


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_unique = int(n_docs * 0.8)
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    from paradedb_ray.pipelines.dedup import minhash_lsh_duplicates

    corpus = gen_corpus(n_docs, n_unique).materialize()  # exclude gen cost
    # warm the worker pool (cold actors cost ~10s at 32 CPUs)
    corpus.map_batches(lambda b: b, batch_format="pyarrow").count()

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
