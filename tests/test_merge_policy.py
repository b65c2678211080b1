"""LayeredMergePolicy simulations mirroring the reference's merge-policy
tests (`pg_search/src/index/merge_policy.rs:440-540`), plus the streaming
store's size-tiered merge behavior."""

import pyarrow as pa

from paradedb_ray.streaming.merge_policy import (
    LayeredMergePolicy,
    SegmentInfo,
)


def _seg(i, size, docs, deleted=0):
    return SegmentInfo(seg_id=i, byte_size=size, num_docs=docs,
                       num_deleted=deleted)


def test_simple_two_segments_merge():
    # two 700-byte segments, layer 1000: 1400 >= 1333 -> one candidate
    pol = LayeredMergePolicy([1000])
    c = pol.compute_merge_candidates([_seg(0, 700, 70), _seg(1, 700, 70)])
    assert c == [[0, 1]]


def test_not_full_enough_discarded():
    # 3 x 400 = 1200 < 1333 (layer + third): trailing candidate dropped
    pol = LayeredMergePolicy([1000])
    c = pol.compute_merge_candidates(
        [_seg(i, 400, 40) for i in range(3)])
    assert c == []


def test_min_merge_count():
    pol = LayeredMergePolicy([1000], min_merge_count=3)
    c = pol.compute_merge_candidates([_seg(0, 700, 70), _seg(1, 700, 70)])
    assert c == []


def test_multiple_layers():
    pol = LayeredMergePolicy([1000, 10000])
    segs = [_seg(0, 700, 70), _seg(1, 700, 70),
            _seg(2, 7000, 700), _seg(3, 7000, 700)]
    c = pol.compute_merge_candidates(segs)
    assert len(c) == 2
    assert sorted(map(sorted, c)) == [[0, 1], [2, 3]]


def test_oversized_segment_skipped():
    # a segment larger than every layer never merges
    pol = LayeredMergePolicy([1000])
    c = pol.compute_merge_candidates(
        [_seg(0, 5000, 500), _seg(1, 700, 70), _seg(2, 700, 70)])
    assert c == [[1, 2]]


def test_deleted_fraction_shrinks_segment():
    # 2000 bytes but 75% deleted -> adjusted 500 <= layer, so it packs
    # with the small segment and the candidate total (2000 + 700) passes
    # the extended layer threshold
    pol = LayeredMergePolicy([1000])
    c = pol.compute_merge_candidates(
        [_seg(0, 2000, 25, deleted=75), _seg(1, 700, 70)])
    assert c == [[0, 1]]


def test_merge_segments_bit_identical_to_rebuild():
    """The postings-list merge must produce EXACTLY the index a rebuild
    from the merged (filtered) rows would — vocab, postings, positions,
    fieldnorms, stats — without re-tokenizing anything."""
    import numpy as np
    import pyarrow as pa

    from paradedb_ray.index.segment import build_segment, merge_segments
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.testing.transcripts import transcript_turns

    schema = transcripts_schema()
    turns = transcript_turns(900, seed=19)
    parts = [turns.slice(0, 300), turns.slice(300, 300), turns.slice(600)]
    segs = [build_segment(p, schema) for p in parts]
    rng = np.random.RandomState(3)
    keeps = [rng.rand(p.num_rows) > 0.2 for p in parts]

    merged = merge_segments(segs, schema, [k for k in keeps])
    ref_table = pa.concat_tables(
        [p.filter(pa.array(k)) for p, k in zip(parts, keeps)]
    ).combine_chunks()
    ref = build_segment(ref_table, schema)

    assert merged.num_docs == ref.num_docs
    a, b = merged.text["text"], ref.text["text"]
    assert list(a.vocab) == list(b.vocab)
    assert np.array_equal(a.term_offsets, b.term_offsets)
    assert np.array_equal(a.g_doc, b.g_doc)
    assert np.array_equal(a.g_tf, b.g_tf)
    assert np.array_equal(a.g_pos_off, b.g_pos_off)
    assert np.array_equal(a.pos_flat, b.pos_flat)
    assert np.array_equal(a.fieldnorm_ids, b.fieldnorm_ids)
    assert a.total_tokens == b.total_tokens
    assert a.doc_count == b.doc_count
    assert np.array_equal(a.has_value, b.has_value)
    assert merged.table.equals(ref.table)


def test_store_size_tiered_merge(ray_session):
    """Streaming store: many tiny segments compact via the ladder; query
    results are invariant across the merge."""
    import ray

    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.streaming import StreamConfig, StreamEngine
    from paradedb_ray.testing.transcripts import transcript_turns

    turns = transcript_turns(3000, seed=13)
    eng = StreamEngine(
        transcripts_schema(),
        StreamConfig(num_partitions=2, mutable_rows=200,
                     layer_sizes=(4 * 1024, 64 * 1024, 1024 * 1024)))
    try:
        for off in range(0, turns.num_rows, 200):  # many small freezes
            eng.ingest(turns.slice(off, 200))
        eng.advance_watermark(0)  # freeze buffers
        before = eng.query_matches(pdb.term("text", "merge"),
                                   columns=["conv_id", "turn_idx", "score"])
        pre_segments = sum(m["sealed_segments"] for m in eng.metrics())
        n = eng.merge_tick()
        assert n > 0
        post_segments = sum(m["sealed_segments"] for m in eng.metrics())
        assert post_segments < pre_segments
        after = eng.query_matches(pdb.term("text", "merge"),
                                  columns=["conv_id", "turn_idx", "score"])
        b = before.to_pandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        a = after.to_pandas().sort_values(
            ["conv_id", "turn_idx"]).reset_index(drop=True)
        assert b.equals(a)
    finally:
        eng.shutdown()


def test_index_layer_info(ray_session):
    """pdb.index_layer_info analogue (`index_layer_info.sql`): one row
    per ladder band, pg_size_pretty bounds largest-first, sealed
    segments assigned by byte size."""
    from paradedb_ray.schema import transcripts_schema
    from paradedb_ray.streaming import StreamConfig, StreamEngine
    from paradedb_ray.testing.transcripts import transcript_turns

    eng = StreamEngine(
        transcripts_schema(),
        StreamConfig(num_partitions=2, mutable_rows=200))
    try:
        eng.ingest(transcript_turns(2000, seed=5))
        eng.advance_watermark(0)
        t = eng.index_layer_info().to_pandas()
        # default ladder: 6 rungs -> 7 bands, largest first
        assert len(t) == 7
        assert t["layer_size"].iloc[0] == "10000 MB.."
        assert t["layer_size"].iloc[-1] == "..100 kB"
        assert t["layer_size"].iloc[-2] == "100 kB..1024 kB"
        total = sum(m["sealed_segments"] for m in eng.metrics())
        assert t["segments"].sum() == total
        assert (t["byte_size"] >= 0).all()
    finally:
        eng.shutdown()
