from paradedb_ray.sources.read import read_table  # noqa: F401
from paradedb_ray.sources.sink import (  # noqa: F401
    read_partitioned,
    write_partitioned,
)
