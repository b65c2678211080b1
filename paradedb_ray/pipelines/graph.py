"""Distributed connected components — near-dup EDGES -> dup CLUSTER ids.

The dedup family (`pipelines/dedup.py`) emits verified candidate PAIRS;
corpus curation wants the transitive closure: every document labeled
with the min key of its connected component, so a whole chain of
near-copies (A~B, B~C, but A!~C) collapses to one cluster and one
survivor.  Pairwise dedup alone keeps one member per EDGE, not per
component — the difference is exactly the multi-hop chains.

Shape (min-label propagation, hash-partitioned):

* Edges are hash-partitioned by source ONCE into ``P`` object-store
  tables (both directions, so propagation is symmetric); iterations
  never reshuffle them.
* The label table (one row per node that touches an edge — bounded by
  2x the edge count, FAR smaller than the corpus) is co-partitioned by
  the same hash.  Each iteration is two object-store-native rounds:
  per-partition pyarrow hash join emits ``(dst, lbl_src)`` messages
  split ``num_returns=P`` by destination hash, then each partition
  min-reduces its old labels with its inbound messages.
* Convergence is exact and cheap: labels only ever DECREASE, so the
  per-partition int sum of labels is strictly monotone — fixpoint iff
  the total sum is unchanged (python ints, no overflow).

Iterations = component diameter.  Near-dup graphs are star/clique
shaped (copies of a common ancestor), so diameter is small; the
``max_iters`` guard raises rather than silently returning a
half-propagated labeling.

Reference analogue: ParadeDB has no graph operator — this is part of
the training-data layer the brief adds on top (the standard map-reduce
CC used by large-scale dedup pipelines, e.g. the hash-to-min family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from paradedb_ray.stages.hash_agg import _key_hash


def _split_by_hash(tbl: pa.Table, col: str, P: int) -> list:
    h = _key_hash(tbl, [col]) % P
    return [tbl.filter(pa.array(h == p)) for p in range(P)]


@ray.remote
def _edge_part(tbl: pa.Table, P: int, template: pa.Table):
    """Symmetrize one edge block and split by source hash.  Blocks that
    lost their schema (zero-column empties from upstream filters at tiny
    scale) are replaced by the typed template."""
    if tbl.num_columns < 2:
        tbl = template
    a, b = tbl.column(0), tbl.column(1)
    sym = pa.concat_tables([pa.table({"src": a, "dst": b}),
                            pa.table({"src": b, "dst": a})]).combine_chunks()
    parts = _split_by_hash(sym, "src", P)
    return parts if P > 1 else parts[0]


@ray.remote(num_returns=2)
def _init_labels(*edge_parts):
    """Distinct nodes of this partition's edge slice (they are already
    co-located: hash(src) routed here), labeled with themselves.
    Returns (labels, concatenated edge slice) as TWO object refs so
    neither ever lands on the driver."""
    t = pa.concat_tables(edge_parts).combine_chunks()
    nodes = pa.table({"node": t.column("src")}).group_by("node").aggregate([])
    return (pa.table({"node": nodes.column("node"),
                      "lbl": nodes.column("node")}), t)


@ray.remote
def _gen_msgs(edges: pa.Table, labels: pa.Table, P: int):
    """Per-partition join edges(src) x labels(node) -> (dst, lbl)
    messages, split by destination hash."""
    j = edges.join(labels, keys=["src"], right_keys=["node"],
                   join_type="inner")
    msgs = pa.table({"node": j.column("dst"), "lbl": j.column("lbl")})
    parts = _split_by_hash(msgs, "node", P)
    return parts if P > 1 else parts[0]


@ray.remote(num_returns=2)
def _min_reduce(labels: pa.Table, *msg_parts):
    """New labels = min(old label, inbound message labels) per node;
    returns (table ref, int label sum ref) — only the scalar sum is ever
    fetched by the driver (it drives exact fixpoint detection: labels
    only decrease, so the total is strictly monotone until fixpoint)."""
    cand = pa.concat_tables([labels, *msg_parts])
    red = cand.group_by("node").aggregate([("lbl", "min")]).rename_columns(
        ["node", "lbl"])
    s = pa.compute.sum(red.column("lbl")).as_py() or 0
    return red, int(s)


def connected_components(edges: ray.data.Dataset, a_col: str, b_col: str,
                         num_partitions: int = 32,
                         max_iters: int = 64) -> ray.data.Dataset:
    """Label every node of the (undirected) edge list with the MIN node
    id of its connected component.  Output: ``(node, cluster_id)``, one
    row per node that appears in any edge."""
    from paradedb_ray.stages.hash_agg import _exec_blocks_schema

    P = num_partitions
    sel = edges.select_columns([a_col, b_col])
    blocks, sch = _exec_blocks_schema(sel)
    key_t = (dict(zip(sch.names, sch.types)).get(a_col, pa.int64())
             if sch is not None else pa.int64())
    template = pa.schema([(a_col, key_t), (b_col, key_t)]).empty_table()
    if not blocks:
        empty = pa.table({"node": pa.array([], key_t),
                          "cluster_id": pa.array([], key_t)})
        return ray.data.from_arrow(empty)
    split = _edge_part.options(num_returns=P if P > 1 else 1)
    per_block = [split.remote(b, P, template) for b in blocks]
    if P == 1:
        per_block = [[r] for r in per_block]
    init = [_init_labels.remote(*[pb[p] for pb in per_block])
            for p in range(P)]
    label_refs = [i[0] for i in init]
    edge_refs = [i[1] for i in init]
    prev_sum = None
    for _ in range(max_iters):
        gen = _gen_msgs.options(num_returns=P if P > 1 else 1)
        msg_parts = [gen.remote(edge_refs[p], label_refs[p], P)
                     for p in range(P)]
        if P == 1:
            msg_parts = [[r] for r in msg_parts]
        reduced = [_min_reduce.remote(label_refs[q],
                                      *[mp[q] for mp in msg_parts])
                   for q in range(P)]
        label_refs = [r[0] for r in reduced]
        total = sum(ray.get([r[1] for r in reduced]))
        if total == prev_sum:
            break
        prev_sum = total
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iters} iterations "
            "(component diameter exceeds the guard)")
    final = [_rename.remote(r) for r in label_refs]
    return ray.data.from_arrow_refs(final)


@ray.remote
def _rename(t: pa.Table) -> pa.Table:
    return t.rename_columns(["node", "cluster_id"])
