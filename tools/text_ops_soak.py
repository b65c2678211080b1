"""Round-5 text-op scale soak: deterministic corpus -> throughput +
exactness spot checks for the sampling / vocab / keyword family.

Reuses the dedup soak's splitmix corpus (pure function of doc_id, so
any partitioning yields identical documents) and checks, per op, the
properties that must hold at any scale:

* ``hash_sample`` — survivor count within 5 sigma of rate x n (the
  survivor SET is already pinned exactly by the oracle entry + tests).
* ``mix_sources`` — per-group rates actually separate (group = doc_id
  bucket).
* ``build_token_vocab`` + ``add_freq_quality`` — vocab is identical
  across two different block layouts (driver merge is order-free) and
  scoring covers every doc.
* ``extract_keywords`` — exactly k rows per doc, rank column dense.

Usage: RAY_GRAFT_CPUS=32 python tools/text_ops_soak.py [n_docs]
"""

import os
import sys
import time

import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONPATH",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

from dedup_soak import gen_corpus  # noqa: E402  (same tools dir)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False)
    corpus = gen_corpus(n_docs, n_docs, mutate_pct=0).materialize()
    corpus.map_batches(lambda b: b, batch_format="pyarrow").count()  # warm

    from paradedb_ray.functions.sampling import hash_sample, mix_sources
    from paradedb_ray.functions.vocab import (add_freq_quality,
                                              build_token_vocab,
                                              extract_keywords)

    t0 = time.perf_counter()
    kept = hash_sample(corpus, "doc_id", rate_bp=2500, salt="s").count()
    dt = time.perf_counter() - t0
    exp = 0.25 * n_docs
    sigma = (0.25 * 0.75 * n_docs) ** 0.5
    print(f"hash_sample: wall={dt:.1f}s {n_docs/dt:,.0f} docs/s "
          f"kept={kept} (expect {exp:,.0f} +/- {5*sigma:,.0f})")
    assert abs(kept - exp) < 5 * sigma

    def add_grp(b):
        import pyarrow.compute as pc
        return b.append_column(
            "grp", pc.cast(pc.bit_wise_and(b.column("doc_id"), 1),
                           pa.int64()))
    grouped = corpus.map_batches(add_grp, batch_format="pyarrow",
                                 batch_size=None)
    t0 = time.perf_counter()
    mixed = mix_sources(grouped, "grp", "doc_id", {0: 8000, 1: 1000},
                        salt="m").materialize()
    dt = time.perf_counter() - t0
    import pyarrow.compute as pc
    counts = {0: 0, 1: 0}
    for ref in mixed.to_arrow_refs():
        t = ray.get(ref)
        for g in (0, 1):
            counts[g] += int(pc.sum(pc.equal(t.column("grp"), g)).as_py()
                             or 0)
    print(f"mix_sources: wall={dt:.1f}s {n_docs/dt:,.0f} docs/s "
          f"kept_by_group={counts}")
    assert counts[0] > 5 * counts[1] > 0

    t0 = time.perf_counter()
    vocab = build_token_vocab(corpus, "text", top_v=1024)
    t_vocab = time.perf_counter() - t0
    vocab_b = build_token_vocab(corpus.repartition(17), "text", top_v=1024)
    assert vocab.equals(vocab_b), "vocab differs across block layouts"
    t0 = time.perf_counter()
    n_scored = add_freq_quality(corpus, "text", "doc_id", vocab).count()
    t_score = time.perf_counter() - t0
    print(f"vocab_build: wall={t_vocab:.1f}s {n_docs/t_vocab:,.0f} docs/s "
          f"(layout-invariant); freq_score: wall={t_score:.1f}s "
          f"{n_docs/t_score:,.0f} docs/s rows={n_scored}")
    assert n_scored == n_docs

    t0 = time.perf_counter()
    kw = extract_keywords(corpus, "text", "doc_id", k=3).materialize()
    dt = time.perf_counter() - t0
    n_kw = kw.count()
    print(f"extract_keywords: wall={dt:.1f}s {n_docs/dt:,.0f} docs/s "
          f"rows={n_kw} (expect {3*n_docs})")
    assert n_kw == 3 * n_docs  # 60 distinct words/doc -> k=3 always fills
    print("text-ops soak OK")
    ray.shutdown()


if __name__ == "__main__":
    main()
