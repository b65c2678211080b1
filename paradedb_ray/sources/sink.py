"""Resumable partitioned Parquet sink.

Design point from the 100 TB brief: output lands as one directory per
input shard / key range — never one giant file — so a failed run skips
finished partitions on retry.  The reference analogue is the segment
manifest + WAL pair (`pg_search/src/postgres/storage/xlog.rs`,
`metadata.rs`): a partition is visible only once its commit marker exists.

Layout:

    out_dir/
      part=00000/data.parquet      (atomic: .tmp then rename)
      part=00000/_COMMIT
      ...
      _SUCCESS                      (all partitions committed)

``write_partitioned`` runs the write INSIDE ``map_batches`` tasks (no
driver materialization); each task writes its block as one partition keyed
by a stable block hash, so a re-run with identical input re-derives the
same partition names and skips committed ones.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def _commit(path: str) -> str:
    return os.path.join(path, "_COMMIT")


def write_partitioned(
    ds: ray.data.Dataset,
    out_dir: str,
    partition_col: str = None,
) -> dict:
    """Write ``ds`` as committed partition directories; returns stats.

    Without ``partition_col``: one partition per block, named by a stable
    content hash of the block's first row + row count (deterministic for
    deterministic pipelines).  With ``partition_col``: blocks are split by
    the column value first (one dir per value per block).
    Already-committed partitions are skipped (resume support).
    """
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        import pandas as pd

        pieces = [("", batch)]
        if partition_col is not None:
            import pyarrow.compute as pc

            vals = batch.column(partition_col).unique()
            pieces = [(f"{partition_col}={v}",
                       batch.filter(pc.equal(batch.column(partition_col), v)))
                      for v in vals.to_pylist()]
        written = skipped = 0
        for label, piece in pieces:
            if piece.num_rows == 0:
                continue
            key = int(pd.util.hash_pandas_object(
                piece.slice(0, 1).to_pandas(), index=False).sum()) \
                ^ piece.num_rows
            name = f"part-{key & 0xFFFFFFFFFFFF:012x}"
            pdir = os.path.join(out_dir, label, name) if label \
                else os.path.join(out_dir, name)
            if os.path.exists(_commit(pdir)):
                skipped += 1
                continue
            os.makedirs(pdir, exist_ok=True)
            tmp = os.path.join(pdir, "data.parquet.tmp")
            pq.write_table(piece, tmp)
            os.replace(tmp, os.path.join(pdir, "data.parquet"))
            with open(_commit(pdir), "w") as f:
                f.write(json.dumps({"rows": piece.num_rows}))
            written += 1
        return pa.table({"written": pa.array([written], pa.int64()),
                         "skipped": pa.array([skipped], pa.int64()),
                         "rows": pa.array([batch.num_rows], pa.int64())})

    stats = ds.map_batches(write_block, batch_format="pyarrow",
                           batch_size=None).take_all()
    out = {"written": sum(r["written"] for r in stats),
           "skipped": sum(r["skipped"] for r in stats),
           "rows": sum(r["rows"] for r in stats)}
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write(json.dumps(out))
    return out


def read_partitioned(out_dir: str) -> ray.data.Dataset:
    """Read back only COMMITTED partitions (uncommitted stragglers from a
    crashed run are invisible, preserving exactly-once)."""
    files = []
    for root, _dirs, names in os.walk(out_dir):
        if "_COMMIT" in names and "data.parquet" in names:
            files.append(os.path.join(root, "data.parquet"))
    return ray.data.read_parquet(sorted(files))
