"""paradedb_ray — a Ray-Data-native streaming full-text search & analytics
engine with the query capabilities of ParadeDB's pg_search (BM25, the
@@@/&&&/|||/###/=== algebra, snippets, facets, top-k), built from scratch on
public Ray Data / Apache Arrow APIs.  See SURVEY.md for the structural
analysis of the reference."""

from paradedb_ray.schema import IndexSchema  # noqa: F401
from paradedb_ray.query import ast  # noqa: F401

__version__ = "0.1.0"
