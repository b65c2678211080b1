"""Column-pruned Parquet sources (prune at the read — only needed
columns/row-groups leave storage)."""

from __future__ import annotations

import os
from typing import Optional

import ray.data


def read_table(sf_dir: str, name: str, columns: Optional[list] = None,
               **kw) -> ray.data.Dataset:
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns, **kw)
