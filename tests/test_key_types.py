"""Mirror of `tests/tests/key.rs`: every scalar key_field type carries
through indexing + scoring.  The 10-doc ngram(4,4) corpus produces the
reference's EXACT f32 BM25 scores regardless of key type — keys are
pass-through Arrow columns in this engine, so the test pins both the
ngram scoring golden and key-type neutrality."""

import datetime as dt
import decimal

import numpy as np
import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import IndexSchema

_VALUES = ['bluetooth', 'bluebell', 'jetblue', "blue's clues",
           'blue bloods', 'redness', 'yellowtooth', 'great white',
           'blue skies', 'rainbow']

# (value, exact f32 score) for term('value','blue'), score desc —
# key.rs asserts these literals for every key type
_GOLDEN = [('jetblue', 0.61846066), ('bluebell', 0.57459813),
           ('bluetooth', 0.53654534), ('blue skies', 0.50321954),
           ('blue bloods', 0.47379148), ("blue's clues", 0.44761515)]

_UUIDS = ['f159c89e-2162-48cd-85e3-e42b71d2ecd0',
          '38bf27a0-1aa8-42cd-9cb0-993025e0b8d0',
          'b5faacc0-9eba-441a-81f8-820b46a3b57e',
          'eb833eb6-c598-4042-b84a-0045828fceea',
          'ea1181a0-5d3e-4f5f-a6ab-b1354ffc91ad',
          '28b6374a-67d3-41c8-93af-490712f9923e',
          'f6e85626-298e-4112-9abb-3856f8aa046a',
          '88345d21-7b89-4fd6-87e4-83a4f68dbc3c',
          '40bc9216-66d0-4ae8-87ee-ddb02e3e1b33',
          '02f9789d-4963-47d5-a189-d9c114f5cba4']

_KEYS = {
    "i16": (pa.array(range(1, 11), pa.int16()), "i64"),
    "i32": (pa.array(range(1, 11), pa.int32()), "i64"),
    "i64": (pa.array(range(1, 11), pa.int64()), "i64"),
    "f32": (pa.array([i / 2 for i in range(1, 11)], pa.float32()), "f64"),
    "f64": (pa.array([i / 2 for i in range(1, 11)], pa.float64()), "f64"),
    "numeric": (pa.array([decimal.Decimal(i) for i in range(1, 11)],
                         pa.decimal128(10, 2)), "numeric"),
    "string": (pa.array(_VALUES), "keyword"),
    "uuid": (pa.array(_UUIDS), "uuid"),
    "date": (pa.array([dt.date(2023, 5, d) for d in range(3, 13)],
                      pa.date32()), "date"),
    "time": (pa.array([dt.time(9, 0, s) for s in range(10)],
                      pa.time64("us")), "date"),
    "timestamp": (pa.array([dt.datetime(2023, 5, 1, 9, 0, s)
                            for s in range(10)],
                           pa.timestamp("us")), "date"),
    "bool_2row": (None, None),  # special-cased below
}


@pytest.mark.parametrize("kind", [k for k in _KEYS if k != "bool_2row"])
def test_key_type_neutral_scoring(kind):
    arr, ftype = _KEYS[kind]
    t = pa.table({"id": arr, "value": pa.array(_VALUES)})
    schema = IndexSchema.build(
        key_field="id", id={"type": ftype, "fast": True},
        value={"type": "text",
               "tokenizer": {"type": "ngram", "min_gram": 4,
                             "max_gram": 4, "prefix_only": False}})
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)
    hits = s.eval(pdb.term("value", "blue"))
    rows = sorted(zip(hits.ids, hits.scores), key=lambda x: (-x[1], x[0]))
    got = [(_VALUES[i], float(np.float32(sc))) for i, sc in rows]
    want = [(v, float(np.float32(sc))) for v, sc in _GOLDEN]
    assert got == want
    # the key column round-trips untouched
    assert t.column("id").to_pylist() == seg.table.column("id").to_pylist()


def test_boolean_key():
    """key.rs::boolean_key — 2-row corpus, exact f32 scores."""
    t = pa.table({"id": pa.array([True, False]),
                  "value": pa.array(["bluetooth", "blue"])})
    schema = IndexSchema.build(
        key_field="id", id={"type": "bool", "fast": True},
        value={"type": "text",
               "tokenizer": {"type": "ngram", "min_gram": 4,
                             "max_gram": 4, "prefix_only": False}})
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)
    hits = s.eval(pdb.term("value", "blue"))
    by_key = {seg.table.column("id")[i].as_py(): float(np.float32(sc))
              for i, sc in zip(hits.ids, hits.scores)}
    assert by_key == {False: float(np.float32(0.25759196)),
                      True: float(np.float32(0.14109309))}
