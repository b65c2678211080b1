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
    """DISTINCT over columns: per-block unique (combiner) then one groupby
    shuffle; output has exactly ``columns``."""

    def local_unique(batch: pa.Table) -> pa.Table:
        return batch.select(columns).group_by(columns).aggregate([])

    pruned = ds.map_batches(local_unique, batch_format="pyarrow",
                            batch_size=None)
    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pruned.groupby(columns).map_groups(first, batch_format="pandas")
