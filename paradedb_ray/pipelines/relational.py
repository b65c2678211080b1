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
