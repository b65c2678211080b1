from paradedb_ray.streaming.engine import (
    EpochRunner,
    StreamConfig,
    StreamEngine,
)

__all__ = ["StreamEngine", "StreamConfig", "EpochRunner"]
