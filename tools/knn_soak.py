"""ANN scale soak: IVF recall/throughput vs exact brute force over a
deterministic clustered vector corpus.

Corpus (no external data): C seeded cluster centers in dim-D unit space;
vector i = normalize(center[i % C] + noise(i)) with noise derived from a
per-row philox stream, so ANY block partitioning yields the same corpus.
Queries are perturbed centers, so every query has a dense true-neighbor
cell — the shape IVF exists for.

Checks:
* ``knn_brute`` (Ray) result == a chunked-numpy exact ground truth,
  key-for-key (brute path correctness at scale, not just sf fixtures).
* ``knn_ivf`` recall@k vs ground truth at nprobe/nlist in {1/16, 4/16},
  plus the exhaustive nprobe=nlist configuration which must be EXACT
  (the invariant the knn_ivf_exact oracle rests on).
* throughput (vectors/s) per configuration.

Usage: RAY_GRAFT_CPUS=32 python tools/knn_soak.py [n_vectors]
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYTHONPATH",
                      os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

DIM = 64
N_CENTERS = 32
N_QUERIES = 32
K = 10


def _centers() -> np.ndarray:
    rng = np.random.default_rng(20260818)
    c = rng.standard_normal((N_CENTERS, DIM)).astype(np.float32)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _block(start: int, stop: int, centers: np.ndarray,
           n_total: int = 0) -> pa.Table:
    """Rows [start, stop): deterministic per-row noise via a seeded
    generator keyed on the row range (ranges are fixed by the driver
    loop, not by Ray's partitioning).  ``n_total`` > 0 selects the
    SORTED layout: rows grouped by cluster in contiguous runs — the
    corpus shape where first-N centroid sampling (the pre-round-5 bug)
    sees only the first few clusters and recall quietly collapses."""
    n = stop - start
    rng = np.random.default_rng(start)
    if n_total:
        idx = (np.arange(start, stop) * N_CENTERS) // n_total
    else:
        idx = (np.arange(start, stop) % N_CENTERS)
    v = centers[idx] + 0.25 * rng.standard_normal((n, DIM)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return pa.table({
        "vec_id": pa.array(np.arange(start, stop), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
    })


STEP = 50_000


def _ground_truth(centers: np.ndarray, n: int, queries: np.ndarray,
                  n_total: int = 0):
    """Exact cosine top-K per query by chunked matmul (independent of the
    engine: recomputes the same deterministic corpus).  MUST walk the
    same STEP-sized ranges as the corpus builder — the per-row noise
    stream is seeded by the block start."""
    best_keys = [None] * len(queries)
    best_scores = [None] * len(queries)
    for start in range(0, n, STEP):
        stop = min(n, start + STEP)
        t = _block(start, stop, centers, n_total)
        m = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
        keys = t.column("vec_id").to_numpy()
        sims = queries @ m.T  # (nq, block)
        for qi in range(len(queries)):
            s = sims[qi]
            if best_keys[qi] is None:
                cand_k, cand_s = keys, s
            else:
                cand_k = np.concatenate([best_keys[qi], keys])
                cand_s = np.concatenate([best_scores[qi], s])
            top = np.argsort(-cand_s, kind="stable")[:K]
            best_keys[qi], best_scores[qi] = cand_k[top], cand_s[top]
    return best_keys


def main(n: int = 1_000_000):
    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True)
    from paradedb_ray.pipelines.knn import knn_brute, knn_ivf

    centers = _centers()
    rng = np.random.default_rng(7)
    q = centers[rng.integers(0, N_CENTERS, N_QUERIES)] + \
        0.1 * rng.standard_normal((N_QUERIES, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    ranges = [(s, min(n, s + STEP)) for s in range(0, n, STEP)]

    # synthesize blocks in parallel tasks, materialize once, reuse per run
    def corpus(n_total: int = 0):
        return ray.data.from_items(
            [{"start": s, "stop": e} for s, e in ranges]) \
            .map_batches(lambda b: pa.concat_tables(
                [_block(int(s), int(e), centers, n_total)
                 for s, e in zip(b.column("start").to_pylist(),
                                 b.column("stop").to_pylist())]),
                batch_format="pyarrow", batch_size=1).materialize()

    ds = corpus()

    print(f"corpus: {n} vectors dim {DIM}")
    gt = _ground_truth(centers, n, q)

    def run(label, fn, truth=None):
        truth = gt if truth is None else truth
        t0 = time.time()
        out = fn().to_pandas()
        dt = time.time() - t0
        got = {qi: set(g["vec_id"]) for qi, g in out.groupby("query_id")}
        hits = sum(len(got.get(qi, set()) & set(truth[qi]))
                   for qi in range(N_QUERIES))
        recall = hits / (N_QUERIES * K)
        rate = n / dt
        print(f"{label}: recall@{K}={recall:.4f}  {dt:.1f}s  "
              f"{rate/1e6:.2f}M vec/s")
        return {"recall": round(recall, 4), "sec": round(dt, 1),
                "vec_per_s": int(rate)}

    res = {"n": n, "dim": DIM}
    res["brute"] = run("brute", lambda: knn_brute(
        ds, "embedding", "vec_id", q, k=K))
    assert res["brute"]["recall"] == 1.0, "brute must equal ground truth"
    res["ivf_np1"] = run("ivf nprobe=1/16", lambda: knn_ivf(
        ds, "embedding", "vec_id", q, k=K, n_clusters=16, nprobe=1))
    res["ivf_np4"] = run("ivf nprobe=4/16", lambda: knn_ivf(
        ds, "embedding", "vec_id", q, k=K, n_clusters=16, nprobe=4))
    res["ivf_exhaustive"] = run("ivf nprobe=16/16 (exact)", lambda: knn_ivf(
        ds, "embedding", "vec_id", q, k=K, n_clusters=16, nprobe=16))
    assert res["ivf_exhaustive"]["recall"] == 1.0, \
        "exhaustive-probe IVF must be exactly brute force"

    # SORTED corpus (contiguous cluster runs): the seeded distributed
    # reservoir sample must hold recall here too — ds.limit() sampling
    # (pre-round-5) would train centroids on the first clusters only
    ds_sorted = corpus(n_total=n)
    gt_sorted = _ground_truth(centers, n, q, n_total=n)
    res["ivf_np4_sorted"] = run(
        "ivf nprobe=4/16 SORTED corpus",
        lambda: knn_ivf(ds_sorted, "embedding", "vec_id", q, k=K,
                        n_clusters=16, nprobe=4), truth=gt_sorted)
    print(json.dumps(res))
    ray.shutdown()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000)
