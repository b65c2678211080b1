from paradedb_ray.query import ast, builders, parser  # noqa: F401
from paradedb_ray.query.ast import Query  # noqa: F401
