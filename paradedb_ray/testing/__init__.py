from paradedb_ray.testing.fixtures import mock_items_table, mock_orders_table  # noqa: F401
