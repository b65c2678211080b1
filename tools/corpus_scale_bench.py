"""Corpus-size linearity bench (BASELINE.md, round-4).

The 100-TB criterion is that per-row cost stays FLAT as the corpus
grows (linear scaling in data, the precondition for "add nodes to go
faster").  This runs the two headline phases — indexing (tokenize +
segment build) and single-scan BM25 top-k — over the cached 1M / 4M /
8M-turn transcript corpora at a fixed 32 CPUs and reports turns/s at
each size.  Flat turns/s across an 8x data range means no
superlinear structure (global barriers, driver loops, whole-corpus
materialization) hides in either path.

Usage: python tools/corpus_scale_bench.py [sizes...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import ray
    import ray.data

    sizes = [int(a) for a in sys.argv[1:]] or [1_000_000, 4_000_000,
                                               8_000_000]
    ray.init(address="local", num_cpus=32, include_dashboard=False,
             logging_level="ERROR", log_to_driver=False)
    ray.data.DataContext.get_current().enable_progress_bars = False

    import pyarrow as pa

    from paradedb_ray.index.segment import build_segment
    from paradedb_ray.pipelines.search import search_topk
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.testing.transcripts import transcripts_path

    schema = transcripts_schema()
    q = pdb.boolean(should=[pdb.term("text", "checkpoint"),
                            pdb.term("text", "epoch"),
                            pdb.term("text", "watermark")])

    def build(batch: pa.Table) -> pa.Table:
        seg = build_segment(batch, schema)
        return pa.table({"n": pa.array([seg.num_docs], pa.int64())})

    def read(path, columns=None):
        # block size FIXED across corpus sizes (blocks scale with data,
        # the multi-node layout); 1M turns -> 32 blocks
        n_blocks = max(32, nm // 31_250)
        return ray.data.read_parquet(path, columns=columns,
                                     override_num_blocks=n_blocks)

    # warm the worker pool on the smallest corpus
    nm = sizes[0]
    p = transcripts_path(nm)
    read(p, ["text"]).map_batches(build, batch_format="pyarrow",
                                  batch_size=None).count()

    for nm in sizes:
        p = transcripts_path(nm)
        t0 = time.perf_counter()
        read(p, ["text"]).map_batches(build, batch_format="pyarrow",
                                      batch_size=None).count()
        t_index = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = search_topk(read(p, ["conv_id", "turn_idx", "text"]),
                          schema, q, limit=10,
                          order_by=[("score", "descending"),
                                    ("conv_id", "ascending"),
                                    ("turn_idx", "ascending")],
                          output_columns=["conv_id", "turn_idx",
                                          "score"]).take_all()
        t_topk = time.perf_counter() - t0
        assert len(out) == 10
        print(f"turns={nm:9d}  index={t_index:6.2f}s "
              f"({nm / t_index / 1e6:5.2f}M turns/s)  "
              f"topk={t_topk:6.2f}s ({nm / t_topk / 1e6:5.2f}M turns/s)")
    ray.shutdown()


if __name__ == "__main__":
    main()
