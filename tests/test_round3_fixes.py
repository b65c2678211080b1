"""Round-3 fixes (VERDICT r2): scale-safe exact dedup, widened LSH
bucketing with all-pairs verification, tree-reduced partial merges,
compacted session sink, vectorized Jaccard verify, agg memory guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data


def _corpus(texts, keys=None):
    keys = keys if keys is not None else list(range(len(texts)))
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(keys, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "extra": pa.array([f"x{k}" for k in keys], pa.string()),
    }))


def test_exact_dedup_metadata_only_shuffle(ray_session):
    """The exact-dedup all-to-all must ship ONLY (fingerprint, key)
    metadata — never the text payload (VERDICT r2 #3)."""
    from paradedb_ray.pipelines.dedup import _exact_sigs

    ds = _corpus(["a b c", "d e f", "a b c"])
    sigs = _exact_sigs(ds, "text", "doc_id")
    names = set(sigs.schema().names)
    assert names == {"__h1", "__h2", "doc_id"}


def test_exact_dedup_keeps_min_key(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = ["dup one", "uniq a", "dup one", "uniq b", "dup one", "dup two",
             "dup two"]
    ds = _corpus(texts).repartition(3)
    out = exact_dedup(ds, "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 3, 5]
    # all original columns survive
    assert set(out.columns) == {"doc_id", "text", "extra"}


def test_exact_dedup_keep_max(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = ["dup one", "uniq a", "dup one"]
    out = exact_dedup(_corpus(texts), "text", "doc_id",
                      keep="max").to_pandas()
    assert sorted(out["doc_id"]) == [1, 2]


def test_exact_dedup_no_duplicates_is_identity(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = [f"unique text {i}" for i in range(10)]
    out = exact_dedup(_corpus(texts), "text", "doc_id").to_pandas()
    assert sorted(out["doc_id"]) == list(range(10))


def test_exact_dedup_block_layout_invariance(ray_session):
    from paradedb_ray.pipelines.dedup import exact_dedup

    texts = (["same doc"] * 5) + [f"u{i}" for i in range(7)]
    outs = []
    for nblocks in (1, 4):
        ds = _corpus(texts).repartition(nblocks)
        outs.append(sorted(
            exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"]))
    assert outs[0] == outs[1]


# ---------------------------------------------------------------------------
# LSH all-pairs verification (VERDICT r2 #4): planted duplicate pairs whose
# members are BOTH non-minimal in every shared bucket — the old
# star-vs-canonical verify dropped them.
# ---------------------------------------------------------------------------


def test_simhash_pair_not_containing_bucket_min(ray_session):
    from paradedb_ray.pipelines.dedup import _banded_hamming_pairs

    B = np.uint64(0x0123456789ABCDEF)
    C = B ^ np.uint64(0b11)  # hamming 2 (flips land in chunk 0)
    # per-band colliders: keep chunk i identical to B, trash the rest
    trash = np.uint64(0x5A5A5A5A5A5A5A5A)
    sims, keys = [], []
    for i, k in ((1, 0), (2, 1), (3, 2)):
        mask = ~(np.uint64(0xFFFF) << np.uint64(16 * i))
        sims.append((B ^ (trash & mask)) & np.uint64(0xFFFFFFFFFFFFFFFF))
        keys.append(k)
    sims += [B, C]
    keys += [10, 11]
    rows_k, rows_b, rows_c, rows_s = [], [], [], []
    for k, s in zip(keys, sims):
        for b in range(4):
            rows_k.append(k)
            rows_b.append(b)
            rows_c.append(int((s >> np.uint64(16 * b)) & np.uint64(0xFFFF)))
            rows_s.append(int(s.view(np.int64)))
    sig = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(rows_k, pa.int64()),
        "band": pa.array(rows_b, pa.int32()),
        "chunk": pa.array(rows_c, pa.int64()),
        "sim": pa.array(rows_s, pa.int64())}))
    out = _banded_hamming_pairs(sig.materialize(), "doc_id",
                                hamming_k=3).to_pandas()
    # every bucket that holds both B and C also holds a smaller collider
    # with huge hamming distance; all-pairs still surfaces (C -> B)
    assert dict(zip(out["doc_id"], out["dup_of"])) == {11: 10}


def test_embedding_dup_pair_not_containing_bucket_min(ray_session):
    from paradedb_ray.pipelines.dedup import embedding_near_duplicates

    dim, n_bits, bands, seed = 64, 128, 8, 42
    bpb = n_bits // bands
    rng = np.random.RandomState(seed)
    P = rng.standard_normal((dim, n_bits)).astype(np.float32)  # pipeline's planes
    gen = np.random.RandomState(7)
    B = gen.standard_normal(dim).astype(np.float32)
    B /= np.linalg.norm(B)
    C = B + gen.standard_normal(dim).astype(np.float32) * 1e-4
    vecs, keys = [], []
    for i in range(bands):
        # n_i orthogonal to band i's plane normals AND to B: A_i = B + n_i
        # shares band i's bucket with B/C exactly, at cosine ~0.707 < 0.95
        basis = np.column_stack([P[:, i * bpb:(i + 1) * bpb], B])
        q, _ = np.linalg.qr(basis)
        r = gen.standard_normal(dim).astype(np.float64)
        n = r - q @ (q.T @ r)
        n = (n / np.linalg.norm(n)).astype(np.float32)
        a = B + n
        assert np.all(np.sign(a @ P[:, i * bpb:(i + 1) * bpb])
                      == np.sign(B @ P[:, i * bpb:(i + 1) * bpb]))
        assert float(a @ B) / np.linalg.norm(a) < 0.95
        vecs.append(a)
        keys.append(i)  # keys 0..7 — all smaller than B/C
    vecs += [B, C]
    keys += [100, 101]
    t = pa.table({"vec_id": pa.array(keys, pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    out = embedding_near_duplicates(
        ray.data.from_arrow(t), "embedding", "vec_id",
        threshold=0.95, seed=seed).to_pandas()
    assert dict(zip(out["vec_id"], out["dup_of"])) == {101: 100}


def test_bucket_salt_cap_splits_giant_cluster(ray_session):
    """Oversize buckets salt-split before the O(m^2) verify: subgroup
    sizes stay near the cap and every index appears at most once."""
    from paradedb_ray.pipelines.dedup import _salt_groups, simhash_duplicates

    keys = np.arange(1000, dtype=np.int64)
    groups = list(_salt_groups(keys, cap=64))
    seen = np.concatenate(groups)
    assert len(seen) == len(np.unique(seen))  # disjoint
    assert all(len(g) <= 3 * 64 for g in groups)  # hash-balanced near cap
    assert len(seen) >= 990  # only sub-2-member groups may drop out
    # end-to-end: a giant identical cluster still links every member to
    # some smaller canonical
    texts = ["identical duplicate document body here"] * 24
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(24), pa.int64()),
        "text": pa.array(texts)}))
    out = simhash_duplicates(ds, "text", "doc_id").to_pandas()
    assert (out["dup_of"] < out["doc_id"]).all()
    assert len(out) == 23


def test_ngram_jaccard_batch_matches_scalar(ray_session):
    """The vectorized sorted-hash-intersection kernel must produce the
    exact float the string-set scalar kernel produces (same integer
    |A∩B| / |A∪B| arithmetic; 64-bit hash collisions are ~impossible at
    this scale)."""
    from paradedb_ray.pipelines.dedup import ngram_jaccard, ngram_jaccard_batch

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(200)]

    def doc(n):
        return " ".join(rng.choice(vocab, size=n))

    ta, tb = [], []
    for _ in range(50):
        a = doc(rng.randint(0, 40))
        b_toks = a.split()
        # mutate a random fraction so jaccard spans (0, 1)
        for j in range(len(b_toks)):
            if rng.rand() < 0.3:
                b_toks[j] = rng.choice(vocab)
        ta.append(a)
        tb.append(" ".join(b_toks))
    ta += ["", "one two three", ""]
    tb += ["", "", "x y z"]
    got = ngram_jaccard_batch(ta, tb, k=3)
    want = np.array([ngram_jaccard(a, b, 3) for a, b in zip(ta, tb)])
    assert np.array_equal(got, want)


# ---------------------------------------------------------------------------
# Tree-reduced partial merges (VERDICT r2 #5): the global-stats exchange and
# the single-pass top-k+facet reduce must be bit-identical across block
# layouts — 1 block (no tree) vs 64 blocks (two tree levels at fan-in 32).
# ---------------------------------------------------------------------------


def _docs_table():
    import pyarrow.parquet as pq

    return pq.read_table("/root/testdata/sf0.001/documents.parquet")


def test_global_stats_tree_reduce_block_invariance(ray_session):
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import documents_schema
    from paradedb_ray.stages.search_stages import compute_global_stats

    t = _docs_table()
    q = pdb.boolean(should=[pdb.term("text", "spark"),
                            pdb.term("text", "data")])
    stats = [compute_global_stats(ray.data.from_arrow(t).repartition(n),
                                  documents_schema(), q)
             for n in (1, 64)]
    a, b = stats
    assert a.num_docs == b.num_docs == t.num_rows
    assert a.field_total_tokens == b.field_total_tokens
    assert a.field_doc_count == b.field_doc_count
    assert a.term_df == b.term_df
    assert a.term_df[("text", "spark")] > 0


def test_topk_facet_tree_reduce_block_invariance(ray_session):
    from paradedb_ray.pipelines.search import search_topk_with_facet
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import documents_schema

    t = _docs_table()
    q = pdb.term("text", "spark")
    outs = []
    for n in (1, 64):
        topk, facet = search_topk_with_facet(
            ray.data.from_arrow(t).repartition(n), documents_schema(), q,
            limit=10, facet_field="lang",
            order_by=[("score", "descending"), ("doc_id", "ascending")],
            output_columns=["doc_id", "score"])
        outs.append((topk, facet))
    (t1, f1), (t64, f64) = outs
    assert t1.column("doc_id").to_pylist() == t64.column("doc_id").to_pylist()
    assert (t1.column("score").to_numpy(zero_copy_only=False)
            == t64.column("score").to_numpy(zero_copy_only=False)).all()
    assert f1.to_pylist() == f64.to_pylist()
    assert t1.num_rows == 10 and f1.num_rows > 0
