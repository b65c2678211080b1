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
  per-partition pyarrow hash join of edges against the FRONTIER (only
  nodes whose label improved last round — delta propagation; round 1
  every node announces itself) emits ``(dst, lbl_src)`` messages split
  ``num_returns=P`` by destination hash, then each partition
  min-reduces its labels with its inbound messages.
* Convergence is exact and cheap: a node re-sends only when its label
  strictly improves, so the frontier shrinks to empty exactly at the
  fixpoint; the driver fetches one int (changed count) per partition
  per round.

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
    """Per-partition join edges(src) x frontier(node) -> (dst, lbl)
    messages, split by destination hash."""
    j = edges.join(labels, keys=["src"], right_keys=["node"],
                   join_type="inner")
    msgs = pa.table({"node": j.column("dst"), "lbl": j.column("lbl")})
    parts = _split_by_hash(msgs, "node", P)
    return parts if P > 1 else parts[0]


@ray.remote(num_returns=3)
def _min_reduce(labels: pa.Table, *msg_parts):
    """New labels = min(old label, inbound message labels) per node.
    Returns (new labels, CHANGED rows, change count) as three refs —
    the changed subset is the next round's message frontier (a node
    whose label didn't improve already delivered its best label, so
    re-sending is pure waste: delta propagation), and only the scalar
    count is ever fetched by the driver (exact fixpoint detection)."""
    import pyarrow.compute as pc

    cand = pa.concat_tables([labels, *msg_parts])
    red = cand.group_by("node").aggregate([("lbl", "min")]).rename_columns(
        ["node", "lbl"])
    old = labels.rename_columns(["node", "old"])
    j = red.join(old, keys=["node"], join_type="left outer")
    improved = pc.or_kleene(pc.is_null(j.column("old")),
                            pc.less(j.column("lbl"), j.column("old")))
    changed = j.filter(pc.fill_null(improved, True)).select(["node", "lbl"])
    return red, changed, changed.num_rows


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
    frontier_refs = label_refs  # round 1: every node announces itself
    for _ in range(max_iters):
        gen = _gen_msgs.options(num_returns=P if P > 1 else 1)
        msg_parts = [gen.remote(edge_refs[p], frontier_refs[p], P)
                     for p in range(P)]
        if P == 1:
            msg_parts = [[r] for r in msg_parts]
        reduced = [_min_reduce.remote(label_refs[q],
                                      *[mp[q] for mp in msg_parts])
                   for q in range(P)]
        label_refs = [r[0] for r in reduced]
        frontier_refs = [r[1] for r in reduced]
        if sum(ray.get([r[2] for r in reduced])) == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint in {max_iters} iterations "
            "(component diameter exceeds the guard)")
    final = [_rename.remote(r) for r in label_refs]
    return ray.data.from_arrow_refs(final)


@ray.remote
def _rename(t: pa.Table) -> pa.Table:
    return t.rename_columns(["node", "cluster_id"])
