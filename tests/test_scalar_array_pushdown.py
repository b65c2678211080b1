"""Mirror of `tests/tests/scalar_array_pushdown.rs` (proptest): every
`col OP ANY/ALL(array)` combination over the reference's 13-row fixture
must match SQL three-valued semantics — exhaustive over operators x
quantifiers x value subsets (with NULL elements), compared against a
Python 3VL oracle.  Covers the checked-in proptest regression seeds
(`Le/Any` on boolean, `In/Any` on text, NULL-bearing arrays)."""

import itertools

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import BOOL, I64, KEYWORD, IndexSchema

_TEXT = ['apple', 'Apple', 'Apple Tree', 'banana', 'banana bunch',
         'Ripe Banana', 'banana', 'banana', None, 'cherry', 'date',
         'elderberry', 'cherry']
_INTS = [1, 2, 3, 42, 100, 1, 2, 3, 4, None, 42, 2, 1]
_BOOLS = [True, False, True, False, True, False, True, False, True,
          False, None, True, False]

_OPS = {"=": lambda a, b: a == b, "<>": lambda a, b: a != b,
        "<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}


def _fixture():
    t = pa.table({
        "id": pa.array(range(1, 14), pa.int64()),
        # raw-string equality needs the non-folding literal tokenizer
        # (`===` semantics); a lowercase keyword field would not push
        # down a case-sensitive `=` in the reference either
        "text_col": pa.array(_TEXT),
        "int_col": pa.array(_INTS, pa.int64()),
        "bool_col": pa.array(_BOOLS, pa.bool_())})
    schema = IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        text_col={"type": KEYWORD, "tokenizer": {"type": "literal"},
                  "fast": True},
        int_col={"type": I64, "fast": True},
        bool_col={"type": BOOL, "fast": True})
    seg = build_segment(t, schema)
    return t, seg, Searcher(seg, schema)


def _oracle(col, op, values, conj):
    """SQL 3VL: NULL column value or NULL element -> never True; ALL is
    True only with zero False and zero NULL verdicts."""
    out = []
    for v in col:
        if v is None:
            out.append(False)
            continue
        res = [None if w is None else _OPS[op](v, w) for w in values]
        ok = ((False not in res) and (None not in res)) if conj \
            else (True in res)
        out.append(bool(ok))
    return sorted(i + 1 for i, m in enumerate(out) if m)


_POOLS = {"text_col": (_TEXT, ['apple', 'banana', 'Apple Tree', None],
                       ("=", "<>")),
          "int_col": (_INTS, [1, 42, None], tuple(_OPS)),
          "bool_col": (_BOOLS, [True, False, None], tuple(_OPS))}


@pytest.mark.parametrize("colname", list(_POOLS))
def test_scalar_array_matrix(colname):
    t, seg, s = _fixture()
    col, pool, ops = _POOLS[colname]
    n = 0
    for op in ops:
        for conj in (False, True):
            for r in (1, 2, 3):
                for values in itertools.combinations(pool, r):
                    q = pdb.terms_with_operator(
                        colname, op, list(values), conjunction_mode=conj)
                    got = sorted(t.column("id")[i].as_py()
                                 for i in s.eval(q).ids)
                    want = _oracle(col, op, list(values), conj)
                    assert got == want, (colname, op, conj, values)
                    n += 1
    assert n > 50
