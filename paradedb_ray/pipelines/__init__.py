from paradedb_ray.pipelines.search import search, search_topk, search_count  # noqa: F401
