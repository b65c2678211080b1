"""Conformance fixtures: faithful Parquet/Arrow twins of
``paradedb.create_bm25_test_table`` (FIXTURES.md §2-4; data ported verbatim
from `/root/reference/pg_search/src/bootstrap/test_table.rs:268-1040` into
``mock_data.json``)."""

from __future__ import annotations

import datetime as dt
import json
import os

import pyarrow as pa

_HERE = os.path.dirname(__file__)


def _load():
    with open(os.path.join(_HERE, "mock_data.json")) as f:
        return json.load(f)


def mock_items_table() -> pa.Table:
    """41-row mock_items twin."""
    rows = _load()["items"]
    return pa.table(
        {
            "id": pa.array([r["id"] for r in rows], pa.int32()),
            "description": pa.array([r["description"] for r in rows]),
            "rating": pa.array([r["rating"] for r in rows], pa.int32()),
            "category": pa.array([r["category"] for r in rows]),
            "in_stock": pa.array([r["in_stock"] for r in rows]),
            "metadata": pa.array([json.dumps(r["metadata"]) for r in rows]),
            "created_at": pa.array(
                [dt.datetime.fromisoformat(r["created_at"]) for r in rows],
                pa.timestamp("us"),
            ),
            "last_updated_date": pa.array(
                [dt.date.fromisoformat(r["last_updated_date"]) for r in rows],
                pa.date32(),
            ),
            "latest_available_time": pa.array(
                [dt.time.fromisoformat(r["latest_available_time"]) for r in rows],
                pa.time64("us"),
            ),
            "weight_range": pa.array([json.dumps(r["weight_range"]) for r in rows]),
            "embedding": pa.array([r["embedding"] for r in rows],
                                  pa.list_(pa.float32())),
        }
    )


def mock_orders_table() -> pa.Table:
    rows = _load()["orders"]
    return pa.table(
        {
            "order_id": pa.array([r["order_id"] for r in rows], pa.int32()),
            "product_id": pa.array([r["product_id"] for r in rows], pa.int32()),
            "order_quantity": pa.array([r["order_quantity"] for r in rows], pa.int32()),
            "order_total": pa.array([r["order_total"] for r in rows], pa.float64()),
            "customer_name": pa.array([r["customer_name"] for r in rows]),
        }
    )
