"""Resumable partitioned sink + streaming Dataset-ingest path."""

import os

import pyarrow as pa

import ray.data


def test_write_partitioned_resume(ray_session, tmp_path):
    from paradedb_ray.sources import read_partitioned, write_partitioned

    t = pa.table({"k": pa.array(list(range(100)), pa.int64()),
                  "g": pa.array(["a" if i % 2 else "b" for i in range(100)])})
    out = str(tmp_path / "out")
    ds = ray.data.from_arrow(t).repartition(4)
    r1 = write_partitioned(ds, out)
    assert r1["rows"] == 100 and r1["written"] > 0 and r1["skipped"] == 0
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    # re-run: same deterministic partitions -> all skipped, nothing rewritten
    r2 = write_partitioned(ray.data.from_arrow(t).repartition(4), out)
    assert r2["written"] == 0 and r2["skipped"] == r1["written"]
    back = read_partitioned(out).to_pandas().sort_values("k")
    assert back["k"].tolist() == list(range(100))


def test_write_partitioned_by_column(ray_session, tmp_path):
    from paradedb_ray.sources import read_partitioned, write_partitioned

    t = pa.table({"k": pa.array(list(range(60)), pa.int64()),
                  "g": pa.array([f"g{i % 3}" for i in range(60)])})
    out = str(tmp_path / "out")
    write_partitioned(ray.data.from_arrow(t), out, partition_col="g")
    assert sorted(d for d in os.listdir(out) if d.startswith("g=")) == \
        ["g=g0", "g=g1", "g=g2"]
    back = read_partitioned(out).to_pandas()
    assert len(back) == 60


def test_stream_ingest_files_sharded(ray_session, tmp_path):
    """Shard-parallel routers (one task per file) produce the same index
    as driver-side routing."""
    import pyarrow.parquet as pq

    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.streaming import StreamConfig, StreamEngine
    from paradedb_ray.testing.transcripts import transcript_turns

    t = transcript_turns(2000, seed=17)
    files = []
    for i in range(4):
        f = str(tmp_path / f"shard-{i}.parquet")
        pq.write_table(t.slice(i * 500, 500), f)
        files.append(f)
    eng = StreamEngine(transcripts_schema(), StreamConfig(num_partitions=3))
    try:
        info = eng.ingest_files(files)
        assert info["rows"] == 2000
        assert eng.num_docs() == 2000
        got = eng.query_matches(pdb.term("text", "watermark"),
                                columns=["conv_id", "turn_idx"])
        brute = sum(1 for x in t.column("text").to_pylist()
                    if "watermark" in x.split(" "))
        assert got.num_rows == brute
    finally:
        eng.shutdown()


def test_stream_ingest_dataset_path(ray_session):
    """StreamEngine.ingest accepts a ray Dataset: routing runs inside
    map_batches tasks, not on the driver."""
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.streaming import StreamConfig, StreamEngine
    from paradedb_ray.testing.transcripts import transcript_turns

    t = transcript_turns(1500, seed=13)
    eng = StreamEngine(transcripts_schema(), StreamConfig(num_partitions=3))
    try:
        info = eng.ingest(ray.data.from_arrow(t).repartition(4))
        assert info["rows"] == 1500
        assert eng.num_docs() == 1500
        got = eng.query_matches(pdb.term("text", "merge"),
                                columns=["conv_id", "turn_idx"])
        brute = sum(1 for x in t.column("text").to_pylist()
                    if "merge" in x.split(" "))
        assert got.num_rows == brute
    finally:
        eng.shutdown()
