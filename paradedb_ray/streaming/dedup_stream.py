"""Exactly-once streaming content dedup — the online twin of
``pipelines/dedup.py::exact_dedup`` for a training-data ingest stream:
the FIRST arrival of each distinct text survives, every later arrival
(same epoch or any later epoch) drops, and a crash-replayed epoch
reproduces its original survivor set bit-for-bit.

Architecture (same shape as the BM25 ``StreamEngine``): ``P`` dedup
shard actors, each owning the fingerprints whose hash routes to it
(single-writer-per-shard — no races, no locks).  The driver computes the
128-bit content fingerprint vectorized (two independent fixed-key hash
passes, the `exact_dedup` bound: ~3e-15 collisions over a 100-TB
corpus), routes ONLY (h1, h2) to the shards — text never leaves the
caller's table — and applies the returned survivor mask.

Replay idempotence: shard state maps fingerprint -> epoch of first
sight.  Within an epoch the first occurrence (in table order) survives;
on replay of that epoch the map already holds ``epoch``, and the same
first-occurrence rule re-selects the same rows, so the filter is a pure
function of (state-before-epoch, epoch table) — the same contract as
the EpochRunner sink.  Scale: per-shard state is one dict entry per
distinct content fingerprint routed to it (~50 B); shard count spreads
both memory and the per-row membership work.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray

_HASH_KEY_2 = "fedcba9876543210"


@ray.remote
class _DedupShard:
    def __init__(self, shard_id: int):
        self.shard_id = shard_id
        self.seen: dict = {}  # (h1, h2) -> epoch of first sight

    def filter_epoch(self, h1s: list, h2s: list, epoch: int) -> np.ndarray:
        """Survivor mask for this shard's rows of one epoch, in arrival
        order.  First-ever sight survives; a row whose fingerprint was
        first seen in THIS epoch survives only as the epoch's first
        occurrence (replay reproduces the original choice)."""
        seen = self.seen
        local: set = set()
        out = np.empty(len(h1s), dtype=bool)
        for i, k in enumerate(zip(h1s, h2s)):
            e = seen.get(k)
            if e is None:
                seen[k] = epoch
                local.add(k)
                out[i] = True
            elif e == epoch:
                if k in local:
                    out[i] = False
                else:
                    local.add(k)
                    out[i] = True
            else:
                out[i] = False
        return out

    def checkpoint(self, ckpt_dir: str) -> str:
        ks = list(self.seen)
        t = pa.table({
            "h1": pa.array([k[0] for k in ks], pa.int64()),
            "h2": pa.array([k[1] for k in ks], pa.int64()),
            "epoch": pa.array([self.seen[k] for k in ks], pa.int64()),
        })
        path = os.path.join(ckpt_dir, f"dedup_shard_{self.shard_id}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return path

    def restore(self, ckpt_dir: str) -> int:
        path = os.path.join(ckpt_dir, f"dedup_shard_{self.shard_id}.parquet")
        if not os.path.exists(path):
            return 0
        t = pq.read_table(path)
        self.seen = dict(zip(
            zip(t.column("h1").to_pylist(), t.column("h2").to_pylist()),
            t.column("epoch").to_pylist()))
        return len(self.seen)

    def size(self) -> int:
        return len(self.seen)


class StreamingDeduper:
    """Driver handle over the dedup shard pool.  ``ingest(table, epoch)``
    returns the surviving rows of one epoch table (call once per epoch —
    the replay contract is per-epoch, like the EpochRunner)."""

    def __init__(self, num_shards: int = 8,
                 checkpoint_dir: Optional[str] = None):
        self.num_shards = num_shards
        self.checkpoint_dir = checkpoint_dir
        self.actors = [_DedupShard.remote(i) for i in range(num_shards)]
        if checkpoint_dir:
            os.makedirs(checkpoint_dir, exist_ok=True)

    def _fingerprints(self, table: pa.Table, text_col: str):
        vals = np.asarray(table.column(text_col).to_pylist(), dtype=object)
        h1 = pd.util.hash_array(vals).astype(np.int64)
        h2 = pd.util.hash_array(vals, hash_key=_HASH_KEY_2).astype(np.int64)
        return h1, h2

    def ingest(self, table: pa.Table, epoch: int,
               text_col: str = "text") -> pa.Table:
        """Filter one epoch's table to its content-first survivors.  Only
        the 16-byte fingerprints travel to the shards; the mask comes
        back and applies in place."""
        if table.num_rows == 0:
            return table
        h1, h2 = self._fingerprints(table, text_col)
        shard = (h1.astype(np.uint64) % np.uint64(self.num_shards)
                 ).astype(np.int64)
        mask = np.zeros(table.num_rows, dtype=bool)
        pend = []
        for s in range(self.num_shards):
            idx = np.flatnonzero(shard == s)
            if len(idx):
                pend.append((idx, self.actors[s].filter_epoch.remote(
                    h1[idx].tolist(), h2[idx].tolist(), epoch)))
        for idx, ref in pend:
            mask[idx] = ray.get(ref)
        return table.filter(pa.array(mask))

    def checkpoint(self, epoch: int) -> None:
        assert self.checkpoint_dir, "no checkpoint_dir configured"
        ray.get([a.checkpoint.remote(self.checkpoint_dir)
                 for a in self.actors])
        tmp = os.path.join(self.checkpoint_dir, "dedup_manifest.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "num_shards": self.num_shards}, f)
        os.replace(tmp, os.path.join(self.checkpoint_dir,
                                     "dedup_manifest.json"))

    def restore(self) -> int:
        """Returns the last checkpointed epoch (-1 when none)."""
        assert self.checkpoint_dir, "no checkpoint_dir configured"
        mpath = os.path.join(self.checkpoint_dir, "dedup_manifest.json")
        if not os.path.exists(mpath):
            return -1
        with open(mpath) as f:
            man = json.load(f)
        if int(man["num_shards"]) != self.num_shards:
            # fingerprints were routed under hash % old_shards: a
            # different shard count would silently lose/misroute state
            raise ValueError(
                f"StreamingDeduper.restore: checkpoint has "
                f"{man['num_shards']} shards, this instance has "
                f"{self.num_shards} — shard count is part of the state")
        ray.get([a.restore.remote(self.checkpoint_dir)
                 for a in self.actors])
        return int(man["epoch"])

    def num_seen(self) -> int:
        return sum(ray.get([a.size.remote() for a in self.actors]))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
