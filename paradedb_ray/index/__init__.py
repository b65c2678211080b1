from paradedb_ray.index.segment import Segment, build_segment  # noqa: F401
from paradedb_ray.index.searcher import Searcher, GlobalStats  # noqa: F401
