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
(scalar string-set vs vectorized sorted-hash-intersection); ``simhash``
and ``embedding`` (round 4) — CHAINED plantings (base b, d1 ~ b,
d2 ~ d1 with d2 often out of range of b), so recall depends on pairs
whose nearest neighbour is NOT the bucket minimum — the exact shape the
round-3 all-pairs verify fix exists for; ``clusters`` (round 5) —
3-tier chains through verified-Jaccard pairs + distributed connected
components, asserting every chain collapses EXACTLY to its base
(multi-hop: d2 reaches the base only through d1).  Ground-truth eligibility is
recomputed exactly (hamming / cosine) per planted edge, and the caught
set must include non-min-anchored pairs."""

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


def _chain_base(ids: np.ndarray, n_unique: int) -> np.ndarray:
    """Chained planting: id < nu = base; nu <= id < 2nu ~ id-nu (base);
    2nu <= id < 3nu ~ id-nu (the FIRST dup, not the base)."""
    return np.where(ids < n_unique, ids, ids - n_unique)


def gen_chain_corpus(n_docs: int, n_unique: int, doc_len: int = 60,
                     vocab: int = 5000, words_per_hop: int = 1):
    """Text corpus where each tier mutates ``words_per_hop`` MORE words
    than its parent tier — d2 is close to d1 but farther from b."""
    import ray.data

    def mix(a, b):
        x = (a.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)) \
            ^ (b.astype(np.uint64)[None, :] * np.uint64(0xBF58476D1CE4E5B9))
        x ^= x >> np.uint64(33)
        x *= np.uint64(0xFF51AFD7ED558CCD)
        x ^= x >> np.uint64(29)
        return x

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        tier = ids // n_unique           # 0 = base, 1 = d1, 2 = d2
        root = ids % n_unique
        slots = np.arange(doc_len, dtype=np.int64)
        w = (mix(root, slots) % np.uint64(vocab)).astype(np.int64)
        # tier t mutates slots [0, t*words_per_hop) to tier-specific words
        # (d2 keeps d1's slot-0 mutation? no: each hop rewrites fresh
        # slots, so d2 differs from d1 in exactly words_per_hop slots and
        # from b in 2*words_per_hop slots)
        for t in (1, 2):
            sel = tier >= t
            lo, hi = (t - 1) * words_per_hop, t * words_per_hop
            repl = vocab * t + (mix(root * 131 + t, slots)
                                % np.uint64(vocab)).astype(np.int64)
            mask = np.zeros_like(w, dtype=bool)
            mask[:, lo:hi] = True
            mask &= sel[:, None]
            w = np.where(mask, repl, w)
        texts = [" ".join(map(str, row)) for row in w]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    return ray.data.range(n_docs, override_num_blocks=64).map_batches(
        build, batch_format="pyarrow")


def _gauss(ids: np.ndarray, dim: int, salt: int) -> np.ndarray:
    """Deterministic per-(id, slot) standard normals via splitmix +
    Box-Muller — any partitioning yields the same vectors."""
    slots = np.arange(dim, dtype=np.uint64)
    x = (ids.astype(np.uint64)[:, None] * np.uint64(0x9E3779B97F4A7C15)) \
        ^ ((slots + np.uint64(salt * 1000003))
           * np.uint64(0xBF58476D1CE4E5B9))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(29)
    u1 = ((x >> np.uint64(11)).astype(np.float64) + 0.5) / 2**53
    y = x * np.uint64(0xD6E8FEB86659FD93)
    y ^= y >> np.uint64(32)
    u2 = ((y >> np.uint64(11)).astype(np.float64) + 0.5) / 2**53
    return np.sqrt(-2 * np.log(u1)) * np.cos(2 * np.pi * u2)


def _chain_vectors(ids: np.ndarray, n_unique: int, dim: int,
                   alpha: float) -> np.ndarray:
    """base = unit gaussian(root); each hop adds alpha * fresh unit noise
    and renormalizes — cos(child, parent) ~ 1/sqrt(1+alpha^2)."""
    root = ids % n_unique
    tier = ids // n_unique
    v = _gauss(root, dim, 0)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    for t in (1, 2):
        sel = tier >= t
        e = _gauss(root * 7 + t, dim, t)
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        v2 = v + alpha * e
        v2 /= np.linalg.norm(v2, axis=1, keepdims=True)
        v = np.where(sel[:, None], v2, v)
    return v.astype(np.float32)


def run_simhash(n_docs: int, n_unique: int):
    from paradedb_ray.pipelines.dedup import (simhash64_batch,
                                              simhash_duplicates)

    corpus = gen_chain_corpus(n_docs, n_unique).materialize()
    corpus.map_batches(lambda b: b, batch_format="pyarrow").count()
    t0 = time.perf_counter()
    pairs = simhash_duplicates(corpus, "text", "doc_id",
                               hamming_k=3).materialize()
    dt = time.perf_counter() - t0

    # exact ground truth: recompute each planted edge's hamming distance
    def truth(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        texts = [t.split() for t in batch.column("text").to_pylist()]
        s = simhash64_batch(texts)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "sim": pa.array(s.view(np.int64), pa.int64())})

    sigs = {}
    for ref in corpus.map_batches(truth, batch_format="pyarrow",
                                  batch_size=None).to_arrow_refs():
        t = ray.get(ref)
        sigs.update(zip(t.column("doc_id").to_pylist(),
                        t.column("sim").to_pylist()))
    eligible = set()
    for i in range(n_unique, n_docs):
        parent = i - n_unique
        d = bin((sigs[i] ^ sigs[parent]) & 0xFFFFFFFFFFFFFFFF).count("1")
        if d <= 3:
            eligible.add((parent, i))
    got = set()
    for ref in pairs.to_arrow_refs():
        t = ray.get(ref)
        for a, b in zip(t.column("doc_id").to_pylist(),
                        t.column("dup_of").to_pylist()):
            got.add((min(a, b), max(a, b)))
    # the output maps doc -> MIN matching dup_of, so an eligible edge
    # (p, c) counts as caught when c appears with ANY dup_of <= p
    by_child = {}
    for a, b in got:
        by_child.setdefault(b, set()).add(a)
    caught = sum(1 for p, c in eligible
                 if c in by_child and any(x <= p for x in by_child[c]))
    nonmin = sum(1 for a, b in got if a >= n_unique)
    rec = caught / max(len(eligible), 1)
    print(f"docs={n_docs} wall={dt:.1f}s throughput={n_docs/dt:,.0f} docs/s"
          f" eligible_edges={len(eligible)} caught={caught}"
          f" recall={rec:.4f} nonmin_anchored_pairs={nonmin}")
    assert rec >= 0.99, "simhash soak recall regression"
    assert nonmin > 0, "no non-min-anchored pairs caught (all-pairs fix!)"
    print("simhash-mode soak OK")


def run_embedding(n_docs: int, n_unique: int, dim: int = 64,
                  alpha: float = 0.15, threshold: float = 0.95):
    import ray.data

    from paradedb_ray.pipelines.dedup import embedding_near_duplicates

    def build(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_numpy()
        V = _chain_vectors(ids, n_unique, dim, alpha)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in V],
                                  pa.list_(pa.float32()))})

    corpus = ray.data.range(n_docs, override_num_blocks=64).map_batches(
        build, batch_format="pyarrow").materialize()
    corpus.map_batches(lambda b: b, batch_format="pyarrow").count()
    t0 = time.perf_counter()
    pairs = embedding_near_duplicates(corpus, "embedding", "doc_id",
                                      threshold=threshold).materialize()
    dt = time.perf_counter() - t0

    # exact eligibility per planted edge (f32 cosines, same as the stage)
    ids = np.arange(n_docs, dtype=np.int64)
    V = _chain_vectors(ids, n_unique, dim, alpha).astype(np.float32)
    V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    eligible = set()
    for i in range(n_unique, n_docs):
        p = i - n_unique
        if float(V[i] @ V[p]) >= threshold:
            eligible.add((p, i))
    by_child = {}
    nonmin = 0
    for ref in pairs.to_arrow_refs():
        t = ray.get(ref)
        for a, b in zip(t.column("doc_id").to_pylist(),
                        t.column("dup_of").to_pylist()):
            lo, hi = min(a, b), max(a, b)
            by_child.setdefault(hi, set()).add(lo)
            if lo >= n_unique:
                nonmin += 1
    caught = sum(1 for p, c in eligible
                 if c in by_child and any(x <= p for x in by_child[c]))
    rec = caught / max(len(eligible), 1)
    print(f"docs={n_docs} dim={dim} wall={dt:.1f}s "
          f"throughput={n_docs/dt:,.0f} docs/s eligible={len(eligible)} "
          f"caught={caught} recall={rec:.4f} nonmin_anchored={nonmin}")
    assert rec >= 0.99, "embedding soak recall regression"
    assert nonmin > 0, "no non-min-anchored pairs caught (all-pairs fix!)"
    print("embedding-mode soak OK")


def run_clusters(n_docs: int, n_unique: int):
    """Multi-hop cluster soak: 3-tier chained corpus (words_per_hop=6 ->
    exact 3-gram Jaccard ~0.758 parent-child, ~0.611 grandparent-child),
    pairs at threshold 0.68 (links ONLY adjacent tiers: d2 reaches the
    base exclusively through d1), then distributed connected components.
    Ground truth is exact: every node of root r must land in cluster r."""
    from paradedb_ray.pipelines.dedup import ngram_jaccard_duplicates
    from paradedb_ray.pipelines.graph import connected_components

    n_docs = 3 * n_unique  # exactly three tiers per root
    corpus = gen_chain_corpus(n_docs, n_unique,
                              words_per_hop=6).materialize()
    corpus.map_batches(lambda b: b, batch_format="pyarrow").count()
    t0 = time.perf_counter()
    pairs = ngram_jaccard_duplicates(corpus, "text", "doc_id",
                                     threshold=0.68, num_perm=64,
                                     bands=32).materialize()
    t_pairs = time.perf_counter() - t0
    t0 = time.perf_counter()
    cc = connected_components(pairs.select_columns(["doc_id", "dup_of"]),
                              "doc_id", "dup_of")
    got = {}
    for ref in cc.to_arrow_refs():
        t = ray.get(ref)
        got.update(zip(t.column("node").to_pylist(),
                       t.column("cluster_id").to_pylist()))
    t_cc = time.perf_counter() - t0
    wrong = sum(1 for node, cl in got.items() if cl != node % n_unique)
    missing = 3 * n_unique - len(got)
    print(f"docs={n_docs} pairs_wall={t_pairs:.1f}s cc_wall={t_cc:.1f}s "
          f"throughput={n_docs/(t_pairs+t_cc):,.0f} docs/s "
          f"nodes={len(got)} wrong_cluster={wrong} missing={missing}")
    assert wrong == 0, "cluster soak: wrong cluster assignment"
    assert missing == 0, "cluster soak: nodes missing from components"
    print("clusters-mode soak OK: every 3-tier chain collapsed to its "
          "base (d2 reaches the base only through d1)")


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "minhash"
    n_unique = int(n_docs * 0.8)
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    if mode == "simhash":
        # chained plantings need 3 tiers
        run_simhash(n_docs, n_docs // 3)
        ray.shutdown()
        return
    if mode == "embedding":
        run_embedding(n_docs, n_docs // 3)
        ray.shutdown()
        return
    if mode == "clusters":
        run_clusters(n_docs, n_docs // 3)
        ray.shutdown()
        return
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
