from paradedb_ray.stages.search_stages import (  # noqa: F401
    StatsCollector,
    BatchScorer,
    collect_stat_requests,
    compute_global_stats,
)
