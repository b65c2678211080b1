"""Tests for round-1 coverage additions: cardinality/percentiles/stats
aggs, regex-phrase, RRF, n-gram-Jaccard and embedding near-dup,
multimodal stub stages."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


@pytest.fixture
def events_tbl():
    rng = np.random.RandomState(5)
    n = 400
    return pa.table({
        "event_type": pa.array([f"t{i % 4}" for i in range(n)]),
        "user_id": pa.array((rng.randint(0, 37, n)).tolist(), pa.int64()),
        "value": pa.array(rng.randint(0, 50, n).astype(float)),
    })


def test_cardinality_exact(ray_session, events_tbl):
    import duckdb

    from paradedb_ray.pipelines.aggregate import sql_aggregate

    ds = ray.data.from_arrow(events_tbl)
    got = sql_aggregate(ds, ["event_type"],
                        {"n_users": ("cardinality", "user_id"),
                         "total": ("count_star", None)}).to_pandas()
    exp = duckdb.sql(
        "SELECT event_type, count(DISTINCT user_id) AS n_users,"
        " count(*) AS total FROM events_tbl GROUP BY event_type").df()
    got = got.sort_values("event_type").reset_index(drop=True)
    exp = exp.sort_values("event_type").reset_index(drop=True)
    assert got[["event_type", "n_users", "total"]].astype(
        {"n_users": int, "total": int}).equals(
        exp[["event_type", "n_users", "total"]].astype(
            {"n_users": int, "total": int}))


def test_percentiles_bitwise_vs_duckdb(ray_session, events_tbl):
    import duckdb

    from paradedb_ray.pipelines.aggregate import percentiles_agg

    ds = ray.data.from_arrow(events_tbl)
    got = percentiles_agg(ds, ["event_type"], "value",
                          percents=[25, 50, 90]).to_pandas()
    exp = duckdb.sql(
        "SELECT event_type, quantile_cont(value, 0.25) AS p25,"
        " quantile_cont(value, 0.50) AS p50,"
        " quantile_cont(value, 0.90) AS p90"
        " FROM events_tbl GROUP BY event_type").df()
    got = got.sort_values("event_type").reset_index(drop=True)
    exp = exp.sort_values("event_type").reset_index(drop=True)
    for c in ("p25", "p50", "p90"):
        assert [v.hex() for v in got[c]] == [v.hex() for v in exp[c]], c


def test_stats_agg_expansion(ray_session, events_tbl):
    from paradedb_ray.pipelines.aggregate import pdb_agg

    ds = ray.data.from_arrow(events_tbl)
    out = pdb_agg(ds, {"g": {"terms": {"field": "event_type", "size": 10},
                             "aggs": {"v": {"stats": {"field": "value"}}}}})
    df = out.to_pandas()
    assert {"event_type", "doc_count", "v_count", "v_min", "v_max",
            "v_sum", "v_avg"} <= set(df.columns)
    assert df["doc_count"].sum() == 400


def test_regex_phrase_matches_brute(ray_session):
    from paradedb_ray.index import Searcher, build_segment
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import documents_schema
    import re

    texts = ["spark batch runs", "spork batch", "spark match", "batch spark",
             "the spark bunch works", "spark  batch", None, "sprk batch"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x or "") for x in texts],
                                      pa.int64())})
    schema = documents_schema()
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)
    def brute(slop):
        out = []
        r1, r2 = re.compile("sp.*k"), re.compile("b.*h")
        for i, x in enumerate(texts):
            toks = (x or "").split()
            hit = any(r1.fullmatch(toks[a]) and r2.fullmatch(toks[b])
                      for a in range(len(toks))
                      for b in range(a + 1, min(a + 2 + slop, len(toks))))
            if hit:
                out.append(i)
        return out

    h = s.eval(pdb.regex_phrase("text", ["sp.*k", "b.*h"]))
    got = sorted(seg.table.column("doc_id").take(h.ids.tolist()).to_pylist())
    assert got == brute(0)
    # slop=1 lets one token intervene
    h2 = s.eval(pdb.regex_phrase("text", ["sp.*k", "b.*h"], slop=1))
    got2 = sorted(seg.table.column("doc_id").take(h2.ids.tolist()).to_pylist())
    assert got2 == brute(1)
    assert set(got2) >= set(got)


def test_rrf_prefers_docs_in_both_rankings(ray_session):
    from paradedb_ray.pipelines.search import reciprocal_rank_fusion
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import documents_schema

    texts = (["alpha beta"] * 3) + ["alpha only"] + ["beta only"] + \
        ["gamma delta"] * 4
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    ds = ray.data.from_arrow(t)
    out = reciprocal_rank_fusion(
        ds, documents_schema(),
        {"qa": pdb.term("text", "alpha"), "qb": pdb.term("text", "beta")},
        key_cols=["doc_id"], limit=5).to_pandas()
    # docs 0-2 appear in both rankings -> fused above single-ranking docs
    top3 = set(out.head(3)["doc_id"])
    assert top3 == {0, 1, 2}


def test_ngram_jaccard_duplicates(ray_session):
    from paradedb_ray.pipelines.dedup import ngram_jaccard_duplicates

    base = ("the quick brown fox jumps over the lazy dog and then runs "
            "far away into the deep green forest tonight")
    near = base.replace("tonight", "today")
    other = "completely different words with no overlap whatsoever here"
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([base, near, other])})
    out = ngram_jaccard_duplicates(ray.data.from_arrow(t), "text", "doc_id",
                                   threshold=0.5).to_pandas()
    assert list(out["doc_id"]) == [2]
    assert list(out["dup_of"]) == [1]
    assert (out["jaccard"] >= 0.5).all()


def test_embedding_near_duplicates(ray_session):
    from paradedb_ray.pipelines.dedup import embedding_near_duplicates

    rng = np.random.RandomState(0)
    base = rng.standard_normal(32).astype(np.float32)
    near = base + rng.standard_normal(32).astype(np.float32) * 0.01
    rest = rng.standard_normal((20, 32)).astype(np.float32)
    vecs = [base, near] + list(rest)
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    out = embedding_near_duplicates(ray.data.from_arrow(t), "embedding",
                                    "vec_id", threshold=0.95).to_pandas()
    assert list(out["vec_id"]) == [1]
    assert list(out["dup_of"]) == [0]


def test_more_like_this(ray_session):
    from paradedb_ray.pipelines.search import search
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import documents_schema

    texts = ["apple banana cherry", "apple banana grape", "apple pear kiwi",
             "stone brick cement", "glass steel wood"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string()),
                  "lang": pa.array(["en"] * len(texts)),
                  "source": pa.array(["s"] * len(texts)),
                  "n_chars": pa.array([len(x) for x in texts], pa.int64())})
    ds = ray.data.from_arrow(t)
    # field-less MLT now uses every indexed non-JSON field (keyword
    # lang/source would match everything here), so scope to text
    q = pdb.more_like_this(key_value=0, fields=["text"],
                           min_doc_frequency=1, min_term_frequency=1)
    out = search(ds, documents_schema(), q,
                 output_columns=["doc_id", "score"]).to_pandas()
    # docs sharing terms with doc 0 match; unrelated docs don't
    assert set(out["doc_id"]) == {0, 1, 2}
    ranked = out.sort_values("score", ascending=False)["doc_id"].tolist()
    assert ranked[0] == 0          # the exemplar itself scores highest
    assert ranked[1] == 1          # two shared terms beat one


def test_null_group_keys(ray_session):
    """NULL group keys form their own bucket (the reference's terms-agg
    ``missing`` sentinel rewritten back to SQL NULL,
    `aggregate/mod.rs:576-705`; Arrow groupby gives it natively)."""
    from paradedb_ray.pipelines.aggregate import sql_aggregate

    t = pa.table({"g": pa.array(["a", None, "b", None, "a"]),
                  "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0])})
    out = sql_aggregate(ray.data.from_arrow(t), ["g"],
                        {"n": ("count_star", None),
                         "s": ("sum", "v")}).to_pandas()
    by = {row["g"]: (row["n"], row["s"]) for _, row in out.iterrows()}
    assert by["a"] == (2, 6.0) and by["b"] == (1, 3.0)
    assert by[None] == (2, 6.0)


def test_topk_with_facet_single_pass(ray_session):
    """One pass yields the same top-k as search_topk AND the same facet as
    facet_terms (`topk-agg-facet.sql` single-pass semantics)."""
    import pyarrow.parquet as pq

    from paradedb_ray.pipelines.aggregate import facet_terms
    from paradedb_ray.pipelines.search import (
        search_topk,
        search_topk_with_facet,
    )
    from paradedb_ray.query import builders as pdb
    from paradedb_ray.schema import documents_schema

    t = pq.read_table("/root/testdata/sf0.01/documents.parquet")
    ds = ray.data.from_arrow(t).repartition(4)
    q = pdb.term("text", "spark")
    topk, facet = search_topk_with_facet(
        ds, documents_schema(), q, limit=10, facet_field="lang",
        order_by=[("score", "descending"), ("doc_id", "ascending")],
        output_columns=["doc_id", "score"])
    want_topk = search_topk(
        ray.data.from_arrow(t).repartition(4), documents_schema(), q,
        limit=10, order_by=[("score", "descending"), ("doc_id", "ascending")],
        output_columns=["doc_id", "score"]).to_pandas()
    got = topk.to_pandas()
    assert got["doc_id"].tolist() == want_topk["doc_id"].tolist()
    assert (got["score"].to_numpy(np.float32)
            == want_topk["score"].to_numpy(np.float32)).all()
    want_facet = facet_terms(ray.data.from_arrow(t).repartition(4), "lang",
                             schema=documents_schema(),
                             filter_query=q).to_pandas()
    fc = dict(zip(facet.column("lang").to_pylist(),
                  facet.column("doc_count").to_pylist()))
    assert fc == dict(zip(want_facet["lang"], want_facet["doc_count"]))


def test_dedup_block_layout_invariance(ray_session):
    """MinHash dedup results are identical regardless of how the input is
    split into blocks (deterministic hashing + min-canonicalization) —
    the cluster-size invariance the dedup family promises."""
    from paradedb_ray.pipelines.dedup import minhash_lsh_duplicates

    base = ("many words that repeat in a long document about engines and "
            "data processing at very large scale with ray and arrow")
    texts = [base, base.replace("ray", "spark"), base + " extra tail",
             "completely unrelated text with nothing in common at all"]
    texts = texts * 3  # 12 docs incl. exact triplicates
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    outs = []
    for nblocks in (1, 3, 6):
        ds = ray.data.from_arrow(t).repartition(nblocks)
        out = minhash_lsh_duplicates(ds, "text", "doc_id").to_pandas()
        outs.append(out.sort_values("doc_id").reset_index(drop=True))
    assert len(outs[0]) > 0
    for other in outs[1:]:
        assert outs[0].equals(other)


def test_knn_ivf_recall(ray_session):
    """IVF (nprobe=half the clusters) must reach >=0.8 recall@10 vs brute
    force on clustered vectors (the reference benchmarks recall at fixed
    selectivity, `benchmarks/datasets/cohere/recall.sql`)."""
    from paradedb_ray.pipelines.knn import knn_brute, knn_ivf

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((5, 24)).astype(np.float32) * 4
    vecs = np.concatenate([
        c + rng.standard_normal((80, 24)).astype(np.float32)
        for c in centers])
    t = pa.table({"vec_id": pa.array(range(len(vecs)), pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    q = vecs[:3] + 0.01
    exact = knn_brute(ds, "embedding", "vec_id", q, k=10).to_pandas()
    approx = knn_ivf(ds, "embedding", "vec_id", q, k=10, n_clusters=8,
                     nprobe=4).to_pandas()
    recalls = []
    for qid in range(3):
        a = set(exact[exact["query_id"] == qid]["vec_id"])
        b = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(a & b) / len(a))
    assert np.mean(recalls) >= 0.8, recalls


def test_multimodal_stub_pipeline(ray_session):
    import hashlib

    from paradedb_ray.pipelines.multimodal import (
        FEATURE_DIM,
        decode_media,
        extract_features,
        synthesize_payloads,
    )

    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["hello world", "abc"])})
    ds = synthesize_payloads(ray.data.from_arrow(t), "text", "doc_id")
    dec = decode_media(ds).to_pandas().sort_values("doc_id")
    h = hashlib.md5(b"hello world").digest()
    assert dec.iloc[0]["width"] == 16 + h[0] % 240
    assert dec.iloc[0]["height"] == 16 + h[1] % 240
    assert dec.iloc[0]["n_bytes"] == len(b"hello world")
    feat = extract_features(ds).to_pandas().sort_values("doc_id")
    assert all(len(f) == FEATURE_DIM for f in feat["features"])
    # deterministic across runs
    feat2 = extract_features(ds).to_pandas().sort_values("doc_id")
    assert [list(a) for a in feat["features"]] == \
        [list(a) for a in feat2["features"]]


def test_multimodal_resize_and_frame_sample(ray_session):
    from paradedb_ray.pipelines.multimodal import (
        decode_media,
        resize_media,
        sample_frames,
        synthesize_payloads,
    )

    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["x" * 400])})
    ds = synthesize_payloads(ray.data.from_arrow(t), "text", "doc_id")
    resized = decode_media(resize_media(ds, max_side=32)).to_pandas()
    assert max(resized.iloc[0]["width"], resized.iloc[0]["height"]) <= 32
    assert resized.iloc[0]["n_bytes"] == 400  # body preserved
    frames = sample_frames(ds, "doc_id", frame_bytes=64,
                           stride=2).to_pandas()
    # 400 bytes -> 6 frames, stride 2 -> frames 0,2,4
    assert frames["frame_idx"].tolist() == [0, 2, 4]
    assert all(len(f) == 64 for f in frames["frame"][:2])


def test_rrf_fuse_rank_ties():
    """RRF with RANK() semantics (`reciprocal_rank_fusion.sql`): ties
    share a rank, contributions sum across inputs, order by fused score
    then key."""
    import pyarrow as pa

    from paradedb_ray.pipelines.fusion import rrf_fuse

    a = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "s": pa.array([9.0, 9.0, 5.0])})   # ranks 1,1,3
    b = pa.table({"id": pa.array([3, 4], pa.int64()),
                  "d": pa.array([0.1, 0.2])})         # asc: ranks 1,2
    out = rrf_fuse([(a, "id", "s", True), (b, "id", "d", False)],
                   k=60, key_out="id")
    got = dict(zip(out.column("id").to_pylist(),
                   out.column("rrf_score").to_pylist()))
    assert got[1] == got[2] == 1 / 61
    assert got[3] == 1 / 63 + 1 / 61
    assert got[4] == 1 / 62
    # doc 3 fused first (two contributions)
    assert out.column("id").to_pylist()[0] == 3
    # tie between 1 and 2 resolved by key asc
    ids = out.column("id").to_pylist()
    assert ids.index(1) < ids.index(2)


def test_png_codec_roundtrip_all_filters():
    """The dependency-free PNG codec recovers exact pixels through every
    PNG filter type (None/Sub/Up/Average/Paeth) and shapes."""
    from paradedb_ray.pipelines import codecs

    rng = np.random.RandomState(0)
    for w, h, c in ((13, 7, 3), (1, 1, 1), (32, 5, 4), (9, 20, 2)):
        px = rng.randint(0, 256, size=w * h * c).astype(np.uint8)
        for ft in (0, 1, 2, 3, 4, -1):
            d = codecs.decode_png(codecs.encode_png(px, w, h, c,
                                                    filter_type=ft))
            assert (d["width"], d["height"], d["channels"]) == (w, h, c)
            assert np.array_equal(d["pixels"], px), (w, h, c, ft)
    # non-PNG and unsupported depth gracefully None
    assert codecs.decode_png(b"not a png") is None


def test_wav_codec_roundtrip():
    from paradedb_ray.pipelines import codecs

    sm = (np.sin(np.arange(800)) * 20000).astype(np.int16)
    d = codecs.decode_wav(codecs.encode_wav(sm, 8000, 2))
    assert d["rate"] == 8000 and d["channels"] == 2
    assert np.array_equal(d["samples"], sm)
    assert codecs.decode_wav(b"RIFFxxxxJUNK") is None


def test_multimodal_real_png_pipeline(ray_session):
    """synthesize real PNGs -> actor-pool decode recovers the md5-derived
    dimensions by parsing; resize re-encodes a genuinely smaller PNG."""
    import hashlib

    from paradedb_ray.pipelines import codecs
    from paradedb_ray.pipelines.multimodal import (
        decode_media,
        resize_media,
        synthesize_png_payloads,
    )

    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array([f"document body {i} spark" * (i + 1)
                                    for i in range(40)])})
    ds = synthesize_png_payloads(ray.data.from_arrow(t), "text", "doc_id")
    out = decode_media(ds).to_pandas().sort_values("doc_id")
    for i, row in out.iterrows():
        h = hashlib.md5(t.column("text")[int(row["doc_id"])]
                        .as_py().encode()).digest()
        assert row["width"] == 4 + h[0] % 29
        assert row["height"] == 4 + h[1] % 29
    # resize: decode the resized payloads and check the bounding box
    small = resize_media(ds, max_side=8).take_all()
    for r in small:
        d = codecs.decode_png(r["media"])
        assert d is not None and max(d["width"], d["height"]) <= 8


def test_multimodal_wav_decode(ray_session):
    from paradedb_ray.pipelines import codecs
    from paradedb_ray.pipelines.multimodal import decode_media

    payloads = [codecs.encode_wav(
        (np.sin(np.arange(100 + 10 * i)) * 1000).astype(np.int16),
        16000, 1) for i in range(5)]
    t = pa.table({"k": pa.array(range(5), pa.int64()),
                  "media": pa.array(payloads, pa.binary())})
    out = decode_media(ray.data.from_arrow(t)).to_pandas().sort_values("k")
    # WAV maps to (width=n_frames, height=1, channels=n)
    assert list(out["width"]) == [100 + 10 * i for i in range(5)]
    assert set(out["height"]) == {1} and set(out["channels"]) == {1}


def test_audio_feature_stage(ray_session):
    from paradedb_ray.pipelines import codecs
    from paradedb_ray.pipelines.multimodal import extract_audio_features

    tone = (np.sin(np.arange(16000) * 0.1) * 10000).astype(np.int16)
    silence = np.zeros(8000, np.int16)
    t = pa.table({"k": pa.array([0, 1, 2], pa.int64()),
                  "media": pa.array([codecs.encode_wav(tone, 16000),
                                     codecs.encode_wav(silence, 16000),
                                     b"not audio"], pa.binary())})
    out = extract_audio_features(
        ray.data.from_arrow(t)).to_pandas().sort_values("k")
    assert abs(out["duration_s"][0] - 1.0) < 1e-9
    assert out["rms"][0] > 5000 and out["rms"][1] == 0.0
    assert 0.02 < out["zcr"][0] < 0.05  # sin(0.1t): ~1 crossing / 31 samples
    assert np.isnan(out["rms"][2])  # non-WAV row -> nulls


def test_fingerprint_sql_oracle_matches_python():
    # the fingerprint entry's DuckDB oracle (HUGEINT window polynomial
    # mod 2^61-1 over md5-low-60-bit token hashes) must equal
    # rolling_fingerprint bit-exactly on any corpus, not just the
    # fixture: fuzz token counts around the window boundary (1..20),
    # unicode tokens, repeated tokens
    import random

    import duckdb

    from paradedb_ray.functions.text_analysis import rolling_fingerprint

    rng = random.Random(99)
    words = ["alpha", "beta", "gamma", "δέλτα", "ε", "zêta", "京", "x1",
             "longtokenlongtoken", "Q"]
    texts = [" ".join(rng.choice(words)
                      for _ in range(rng.randrange(1, 21)))
             for _ in range(200)]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents AS SELECT * FROM (SELECT "
                "unnest(range(200)) AS doc_id, unnest($1) AS text)",
                [texts])
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_entry", "/root/repo/__ray_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sql = m.oracle_sql()["fingerprint"]
    got = dict(con.execute(sql).fetchall())
    want = {i: rolling_fingerprint(t) for i, t in enumerate(texts)}
    assert got == want


def test_knn_ivf_exhaustive_probe_equals_brute(ray_session):
    # nprobe == n_clusters must be EXACTLY brute force (the basis of the
    # knn_ivf_exact / knn_ivf_partitioned oracles)
    import numpy as np
    import pyarrow as pa

    import ray

    from paradedb_ray.pipelines.knn import knn_brute, knn_ivf

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((500, 8)).astype(np.float32)
    t = pa.table({"vec_id": pa.array(range(500), pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        pa.list_(pa.float32(), 8))})
    ds = ray.data.from_arrow(t).repartition(3)
    q = vecs[:2]
    a = knn_ivf(ds, "embedding", "vec_id", q, k=7, n_clusters=4, nprobe=4,
                dtype=np.float64).take_all()
    b = knn_brute(ds, "embedding", "vec_id", q, k=7,
                  dtype=np.float64).take_all()
    key = lambda r: (r["query_id"], r["vec_id"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_chunk_documents(ray_session):
    """Sliding token-window chunking: chunk_text preserves ORIGINAL inner
    whitespace, char offsets are exact, overlap repeats the tail tokens,
    null/empty docs drop, overlap >= max_tokens rejects."""
    import pyarrow as pa
    import pytest

    from paradedb_ray.functions.text_analysis import chunk_documents

    txt = "a  bb\tccc dddd eee"  # irregular whitespace, 5 tokens
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": pa.array([txt, None, ""])})
    ds = ray.data.from_arrow(t)
    out = chunk_documents(ds, "text", "doc_id",
                          max_tokens=3, overlap=1).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    # starts at 0, 2, 4 (step 2): tokens [a,bb,ccc], [ccc,dddd,eee], [eee]
    assert out["doc_id"].tolist() == [1, 1, 1]
    assert out["chunk_text"].tolist() == [
        "a  bb\tccc", "ccc dddd eee", "eee"]
    assert out["n_tokens"].tolist() == [3, 3, 1]
    assert out["char_start"].tolist() == [0, 6, 15]
    assert out["char_end"].tolist() == [9, 18, 18]
    # char offsets index back into the original text exactly
    for _, r in out.iterrows():
        assert txt[r["char_start"]:r["char_end"]] == r["chunk_text"]
    with pytest.raises(ValueError):
        chunk_documents(ds, "text", "doc_id", max_tokens=4, overlap=4)


def test_scrub_and_decontaminate_and_pack(ray_session):
    import pyarrow as pa

    from paradedb_ray.functions.text_analysis import (
        decontaminate,
        pack_documents,
        scrub_text,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "mail me at bob.smith+x@corp.io today",
            "call +1 555-0199 1234 or visit 192.168.0.7 now",
            "clean document with no pii",
            None,
        ])})
    ds = ray.data.from_arrow(t)
    out = scrub_text(ds, "text").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert out["text"][0] == "mail me at <EMAIL> today"
    assert out["text"][1] == "call <PHONE> or visit <IP> now"
    assert out["text"][2] == "clean document with no pii"
    assert out["text"][3] is None

    kept = decontaminate(ray.data.from_arrow(t), "text",
                         ["NO PII"]).to_pandas()
    # case-insensitive needle hit drops doc 3; NULL text rows are kept
    assert sorted(kept["doc_id"].tolist()) == [1, 2, 4]

    pt = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                   "text": pa.array(["a b c", "d e", "f g h i", "j"])})
    packed = pack_documents(ray.data.from_arrow(pt), "text", "doc_id",
                            budget=4).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    # token starts: 0, 3, 5, 9 -> bins 0, 0, 1, 2
    assert packed["n_tokens"].tolist() == [3, 2, 4, 1]
    assert packed["bin"].tolist() == [0, 0, 1, 2]


def test_chunk_pack_invariants_random(ray_session):
    """Randomized invariants over messy-whitespace docs (one Ray pass):

    * every chunk's text slice reproduces exactly from its char offsets,
    * de-overlapped chunk token streams reconstruct the full token list,
    * consecutive chunks share exactly `overlap` tokens (except the tail),
    * pack bins are nondecreasing in key order and bin boundaries match
      the running token count.
    """
    import numpy as np
    import pyarrow as pa

    from paradedb_ray.functions.text_analysis import (
        chunk_documents,
        pack_documents,
    )

    rng = np.random.default_rng(20260818)
    words = ["alpha", "be", "gamma!", "d,e", "<eos>", "x9", "Zz"]
    seps = [" ", "  ", "\t", "\n", " \t "]
    docs = []
    for i in range(60):
        n = int(rng.integers(1, 40))
        parts = []
        for j in range(n):
            parts.append(words[int(rng.integers(0, len(words)))])
            parts.append(seps[int(rng.integers(0, len(seps)))])
        docs.append("".join(parts[:-1]))
    t = pa.table({"doc_id": pa.array(list(range(60)), pa.int64()),
                  "text": pa.array(docs)})

    MAXT, OV = 7, 3
    out = chunk_documents(ray.data.from_arrow(t), "text", "doc_id",
                          max_tokens=MAXT, overlap=OV).to_pandas()
    out = out.sort_values(["doc_id", "chunk_idx"])
    for doc_id, g in out.groupby("doc_id"):
        txt = docs[doc_id]
        toks = txt.split()
        rebuilt = []
        prev_tokens = None
        for k, r in enumerate(g.itertuples()):
            assert txt[r.char_start:r.char_end] == r.chunk_text
            ctoks = r.chunk_text.split()
            assert len(ctoks) == r.n_tokens <= MAXT
            if prev_tokens is not None and k < len(g):
                # consecutive chunks overlap by OV tokens unless the tail
                # chunk is shorter than the overlap
                shared = min(OV, len(ctoks))
                assert prev_tokens[-shared:] == ctoks[:shared] or \
                    len(ctoks) < OV
            rebuilt.extend(ctoks if prev_tokens is None else ctoks[OV:])
            prev_tokens = ctoks
        assert rebuilt == toks, doc_id

    packed = pack_documents(ray.data.from_arrow(t), "text", "doc_id",
                            budget=16).to_pandas().sort_values("doc_id")
    bins = packed["bin"].tolist()
    ns = packed["n_tokens"].tolist()
    assert bins == sorted(bins)  # nondecreasing in key order
    before = 0
    for n, b in zip(ns, bins):
        assert b == before // 16
        before += n
