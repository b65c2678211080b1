"""Independent BM25 score oracle, covering the quantized-fieldnorm range
that short-doc goldens never reach (the round-4 fieldnorm bug hid above
dl=39).

The oracle rebuilds the Lucene ``SmallFloat.byte4`` length table from the
published algorithm (4-bit mantissa float, 24 free values) with a DIFFERENT
construction than ``paradedb_ray.fieldnorm`` uses — octave enumeration
instead of encode/decode round-trips — plus literal anchors from the
sequence the reference's tantivy pin ships, and then scores documents with
a 15-line textbook BM25 implementation compared f32-exact to the engine.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from paradedb_ray.fieldnorm import FIELD_NORMS_TABLE, fieldnorm_to_id
from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import ast
from paradedb_ray.schema import IndexSchema


def _oracle_table() -> list:
    """Lucene SmallFloat byte4 table by direct octave enumeration:
    24 free values 0..23, then int4 values (3 stored mantissa bits + an
    implicit leading bit): subnormals 0..7, then for each shift s >= 0
    the eight values (8..15) << s."""
    int4 = list(range(8))
    s = 0
    while len(int4) < 232:
        int4.extend((m | 8) << s for m in range(8))
        s += 1
    return list(range(24)) + [24 + v for v in int4[: 256 - 24]]


def test_field_norms_table_matches_published_sequence():
    oracle = _oracle_table()
    assert FIELD_NORMS_TABLE.tolist() == oracle
    # literal anchors straight from the published table: identity to 40,
    # then geometric octaves
    t = FIELD_NORMS_TABLE.tolist()
    assert t[:41] == list(range(41))
    assert t[41:49] == [42, 44, 46, 48, 50, 52, 54, 56]
    assert t[49:57] == [60, 64, 68, 72, 76, 80, 84, 88]
    assert t[57:65] == [96, 104, 112, 120, 128, 136, 144, 152]
    assert t[65:73] == [168, 184, 200, 216, 232, 248, 264, 280]
    assert t[73:81] == [312, 344, 376, 408, 440, 472, 504, 536]
    # round-down encode: the snippet_position golden's 321-token doc
    assert t[int(fieldnorm_to_id(321))] == 312


def _naive_bm25(doc_tokens: list, query: str, k1=1.2, b=0.75):
    """Textbook tantivy BM25 for a single-term query over all docs:
    idf = ln(1 + (N - n + 0.5)/(n + 0.5)); tf part uses the QUANTIZED
    doc length and the EXACT average length; f32 at every step."""
    f32 = np.float32
    table = _oracle_table()

    def quantize(dl):
        # largest table value <= dl
        lo = 0
        for v in table:
            if v <= dl:
                lo = v
            else:
                break
        return lo

    # tantivy Bm25Weight op order, f32 at every step (ln in f64 of the
    # f32 operand, rounded back):
    #   idf    = ln(1 + (N - n + 0.5)/(n + 0.5))
    #   weight = idf * boost * (1 + k1)
    #   norm   = k1 * ((1 - b) + (b * dl_quantized) / avgdl)
    #   score  = weight * tf / (tf + norm)
    N = len(doc_tokens)
    n = sum(1 for toks in doc_tokens if query in toks)
    if n == 0:
        return {}
    k1 = f32(k1)
    b = f32(b)
    one = f32(1.0)
    half = f32(0.5)
    avgdl = f32(sum(len(t) for t in doc_tokens)) / f32(N)
    x = (f32(N - n) + half) / (f32(n) + half)
    idf = f32(np.log(np.float64(one + x)))
    weight = idf * one * (one + k1)
    out = {}
    for i, toks in enumerate(doc_tokens):
        tf = toks.count(query)
        if tf == 0:
            continue
        dl = f32(quantize(len(toks)))
        norm = k1 * (one - b + b * dl / avgdl)
        tff = f32(tf)
        out[i] = f32(weight * (tff / (tff + norm)))
    return out


@settings(max_examples=60, deadline=None)
@given(
    lens=st.lists(st.integers(1, 600), min_size=1, max_size=8),
    tfs=st.lists(st.integers(0, 5), min_size=8, max_size=8),
    seed=st.integers(0, 2**31 - 1),
)
def test_engine_scores_match_naive_bm25(lens, tfs, seed):
    """Random corpora whose doc lengths sweep every fieldnorm octave up
    to 600 tokens: engine term scores == naive f32 BM25 bit-exactly."""
    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    doc_tokens = []
    for i, L in enumerate(lens):
        toks = [vocab[int(x)] for x in rng.integers(1, len(vocab), size=L)]
        # plant the query term with a controlled tf
        tf = tfs[i % len(tfs)]
        for p in range(min(tf, L)):
            toks[int(rng.integers(0, L))] = "alpha"
        # ensure tf==0 stays 0 when requested
        if tf == 0:
            toks = [t if t != "alpha" else "beta" for t in toks]
        doc_tokens.append(toks)

    schema = IndexSchema.build(
        "id", body={"type": "text", "tokenizer": {"type": "whitespace"}})
    t = pa.table({"id": pa.array(list(range(len(doc_tokens))), pa.int64()),
                  "body": pa.array([" ".join(toks) for toks in doc_tokens])})
    s = Searcher(build_segment(t, schema), schema)
    hits = s.eval(ast.Term(field="body", value="alpha"))
    got = {int(d): np.float32(sc)
           for d, sc in zip(hits.ids.tolist(), hits.scores.tolist())}
    want = _naive_bm25(doc_tokens, "alpha")
    assert got == want
