"""Small relational helpers: vectorized filter/project/distinct over Arrow
batches (the non-search predicates pg_search leaves to Postgres and we run
with pyarrow.compute kernels inside map_batches)."""

from __future__ import annotations

from typing import Callable, Optional

import pyarrow as pa

import ray.data


def filter_batches(ds: ray.data.Dataset,
                   predicate: Callable[[pa.Table], "pa.BooleanArray"],
                   columns: Optional[list] = None) -> ray.data.Dataset:
    """Vectorized filter: ``predicate`` maps a batch to a boolean mask."""

    def f(batch: pa.Table) -> pa.Table:
        mask = predicate(batch)
        out = batch.filter(mask)
        return out.select(columns) if columns else out

    return ds.map_batches(f, batch_format="pyarrow", batch_size=None)


def distinct(ds: ray.data.Dataset, columns: list) -> ray.data.Dataset:
    """DISTINCT over columns: two-stage hash dedup (block-local unique,
    tuple-hash split, per-part unique — `stages/hash_agg.py`); output has
    exactly ``columns``."""
    from paradedb_ray.stages.hash_agg import hash_distinct

    return hash_distinct(ds.select_columns(columns), columns)


def topk_by(ds: ray.data.Dataset, sort_keys: list, limit: int,
            null_placement: str = "at_end",
            columns: Optional[list] = None) -> ray.data.Dataset:
    """Distributed ``ORDER BY ... LIMIT k`` over arbitrary (incl. derived
    /join-output) columns — the JoinScan ORDER-BY + top-k dynamic-filter
    shape (ref `pg_regress/sql/join_order_by.sql`,
    `join_orderby_expression.sql`) without requiring a search index.

    ``sort_keys``: [(col, "ascending"|"descending"), ...] — pass a total
    order (add a tie-break key) for deterministic output.
    ``null_placement``: "at_end" (SQL ASC NULLS LAST) or "at_start"
    (DESC NULLS FIRST), applied to every key.

    Scale shape: each block keeps its own top-k (a superset of its
    contribution to the global head), per-block heads merge in O(CPUs)
    chunked raw tasks (`search._chunk_refs`), and only the final <=
    chunks x k rows meet for the exact global sort — never an all-to-all
    sort shuffle."""
    import pyarrow.compute as pc

    keys = [(c, d) for c, d in sort_keys]

    def head(t: pa.Table) -> pa.Table:
        if t.num_rows > 0:
            idx = pc.sort_indices(t, sort_keys=keys,
                                  null_placement=null_placement)
            t = t.take(idx[:limit])
        return t

    from paradedb_ray.pipelines.search import _chunk_refs, _merge_blocks

    pruned = ds.map_batches(head, batch_format="pyarrow", batch_size=None)
    refs = pruned.to_arrow_refs()
    chunks = _chunk_refs(refs)
    if len(chunks) < len(refs):
        refs = [_merge_blocks.remote(head, *ch) for ch in chunks]
    # the projection runs AFTER the final merge so sort columns (possibly
    # derived expressions) stay available to every re-sort along the tree
    fin = (lambda t: head(t).select(columns)) if columns else head
    return ray.data.from_arrow_refs([_merge_blocks.remote(fin, *refs)])
