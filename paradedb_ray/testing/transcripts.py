"""Deterministic synthetic transcript-turn generator.

Produces the driver-mandated table shape (BASELINE.json ``input_hint``):
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — seeded, chunked, and stable across runs and worker
counts so benchmark inputs are reproducible with no external data.

Skew is built in on purpose: conversation lengths are heavy-tailed (a few
"hot" conversations hold ~100× median turns) so the salting / partitioning
paths get exercised, mirroring the hot-``conv_id`` concern in SURVEY §7.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_VOCAB = np.array(
    "the a of to and in for on with query data table index search run batch "
    "stream merge join sort filter scan agg group window value key row column "
    "plan cost shard segment token score rank fetch cache spill limit offset "
    "hash range term phrase fuzzy regex boost slop snippet facet count sum "
    "error retry commit checkpoint epoch watermark late event state actor "
    "block arrow parquet read write emit tool call user assistant system "
    "python rust code test fix bug trace log level debug info warn".split()
)
_ROLES = np.array(["user", "assistant", "tool", "system"])
_ROLE_P = np.array([0.35, 0.40, 0.20, 0.05])
_TOOLS = np.array(["", "bash", "search", "browser", "editor", "calculator"])
_TOOL_P = np.array([0.55, 0.12, 0.10, 0.08, 0.10, 0.05])

_EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z


def transcript_turns(n_turns: int, seed: int = 42,
                     start_conv: int = 0) -> pa.Table:
    """One deterministic chunk of ``n_turns`` transcript turns.

    Conversations are numbered from ``start_conv`` so multiple chunks can be
    generated independently (per-task parallel generation) without overlap.
    """
    rng = np.random.RandomState(seed + start_conv)

    # heavy-tailed conversation lengths: median ~8, max ~1000 (hot convs)
    lens = []
    total = 0
    while total < n_turns:
        u = rng.random_sample()
        if u < 0.02:
            ln = int(rng.randint(200, 1000))
        else:
            ln = 1 + int(rng.exponential(8.0))
        lens.append(min(ln, n_turns - total))
        total += lens[-1]
    lens = np.asarray(lens, dtype=np.int64)
    n_convs = len(lens)

    conv_num = np.repeat(np.arange(n_convs) + start_conv, lens)
    conv_id = np.char.add("conv-", conv_num.astype("U12"))
    turn_idx = np.concatenate([np.arange(l, dtype=np.int32) for l in lens])

    role = _ROLES[rng.choice(len(_ROLES), size=n_turns, p=_ROLE_P)]
    tool = _TOOLS[rng.choice(len(_TOOLS), size=n_turns, p=_TOOL_P)]
    tool = np.where(role == "tool", tool, "")

    # Zipf-ish token draw; 5-60 tokens per turn, vectorized then joined
    n_tok = rng.randint(5, 61, size=n_turns)
    ranks = rng.zipf(1.3, size=int(n_tok.sum()))
    ranks = np.clip(ranks - 1, 0, len(_VOCAB) - 1)
    words = _VOCAB[ranks]
    bounds = np.concatenate([[0], np.cumsum(n_tok)])
    texts = [" ".join(words[bounds[i]:bounds[i + 1]]) for i in range(n_turns)]

    # ts: per conversation an arrival offset, turns spaced 1-120s apart
    conv_start = (rng.randint(0, 30 * 86_400, size=n_convs).astype(np.int64)
                  * 1_000_000)
    gaps = rng.randint(1, 120, size=n_turns).astype(np.int64) * 1_000_000
    ts = np.empty(n_turns, dtype=np.int64)
    pos = 0
    for c in range(n_convs):
        l = lens[c]
        ts[pos:pos + l] = conv_start[c] + np.cumsum(gaps[pos:pos + l])
        pos += l
    ts += _EPOCH_US

    return pa.table({
        "conv_id": pa.array(conv_id, pa.string()),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role, pa.string()),
        "text": pa.array(texts, pa.string()),
        "tool": pa.array(tool, pa.string()),
        "ts": pa.array(ts, pa.timestamp("us")),
    })


#: parquet row-group size — the unit ray.data can split blocks on
_ROW_GROUP = 4096
#: files per generated dataset — the unit ray.data parallelizes reads over
#: (a real transcript stream lands as many shard files, never one blob)
_N_FILES = 32


def write_transcripts(path: str, n_turns: int, seed: int = 42) -> str:
    """Write (and cache) a deterministic transcripts dataset: a DIRECTORY of
    ``_N_FILES`` parquet shard files (read-parallel, resumable layout)."""
    marker = os.path.join(path, "_DONE")
    if os.path.isdir(path) and os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == str(n_turns):
                return path
    os.makedirs(path, exist_ok=True)
    per_file = max(1, n_turns // _N_FILES)
    done = 0
    conv_base = 0
    i = 0
    while done < n_turns:
        n = per_file if done + 2 * per_file <= n_turns else n_turns - done
        t = transcript_turns(n, seed=seed, start_conv=conv_base)
        conv_base += len(np.unique(t.column("conv_id").to_numpy(
            zero_copy_only=False)))
        pq.write_table(t, os.path.join(path, f"part-{i:05d}.parquet"),
                       row_group_size=_ROW_GROUP)
        done += n
        i += 1
    with open(marker, "w") as f:
        f.write(str(n_turns))
    return path


def transcripts_path(n_turns: int, seed: int = 42,
                     root: str = "/tmp/paradedb_ray_data") -> str:
    """Cached dataset directory for an ``n_turns`` transcript table."""
    p = os.path.join(root, f"transcripts_{n_turns}_{seed}")
    return write_transcripts(p, n_turns, seed=seed)
