from paradedb_ray.sources.read import read_table  # noqa: F401
