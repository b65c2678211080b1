"""uuid / inet / ltree field support mirroring the reference's regress
shapes (`ltree.sql`, `inet.sql`, `tokenize-uuid.sql`;
`postgres/types.rs:1134-1232`)."""

import pyarrow as pa
import pytest

from paradedb_ray.index import Searcher, build_segment
from paradedb_ray.pg_types import normalize_inet, normalize_uuid
from paradedb_ray.query import builders as pdb
from paradedb_ray.schema import I64, IndexSchema


def test_normalize_uuid():
    u = "A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11"
    assert normalize_uuid(u) == u.lower()
    assert normalize_uuid(u.lower()) == u.lower()
    assert normalize_uuid("{a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11}") == \
        "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
    with pytest.raises(ValueError):
        normalize_uuid("not-a-uuid")


def test_normalize_inet():
    assert normalize_inet("192.168.000.001") == "192.168.0.1"
    assert normalize_inet("192.168.0.1/32") == "192.168.0.1"
    assert normalize_inet("10.0.0.0/8") == "10.0.0.0/8"
    assert normalize_inet("2001:0db8::0001") == "2001:db8::1"


def _ids(seg, hits):
    return {seg.table.column("id")[i].as_py() for i in hits.ids}


def test_ltree_hierarchical_match(ray_session):
    """`ltree.sql`: @@@ on an ltree field is PREFIX/HIERARCHICAL —
    'Top.Science.Biology' matches the node and 'Top.Science.Biology.Botany',
    unlike exact ltree equality."""
    schema = IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        category={"type": "ltree"})
    t = pa.table({
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
        "category": pa.array([
            "Top.Science.Astronomy", "Top.Science.Biology",
            "Top.Science.Biology.Botany", "Top.Collections.Pictures",
            "Top.Collections.Pictures.Astronomy",
            "Top.Hobbies.Photography", None]),
    })
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)
    assert _ids(s.seg, s.eval(pdb.term("category",
                                       "Top.Science.Astronomy"))) == {1}
    # hierarchical: node + descendants (ltree.sql count(*) = 2)
    assert _ids(s.seg, s.eval(pdb.term("category",
                                       "Top.Science.Biology"))) == {2, 3}
    assert _ids(s.seg, s.eval(pdb.term("category", "Top"))) == \
        {1, 2, 3, 4, 5, 6}
    # 'Pictures.Astronomy' is NOT an ancestor prefix of anything
    assert _ids(s.seg, s.eval(pdb.term("category",
                                       "Pictures.Astronomy"))) == set()
    # a label prefix that is not a full label does not match
    assert _ids(s.seg, s.eval(pdb.term("category", "Top.Sci"))) == set()


def test_inet_term(ray_session):
    schema = IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        ip={"type": "inet"})
    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "ip": pa.array(["192.168.0.1", "192.168.000.002",
                                  "10.0.0.0/8"])})
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)
    assert _ids(s.seg, s.eval(pdb.term("ip", "192.168.0.1"))) == {1}
    # both sides normalize: zero-padded query and stored value match
    assert _ids(s.seg, s.eval(pdb.term("ip", "192.168.0.002"))) == {2}
    assert _ids(s.seg, s.eval(pdb.term("ip", "10.0.0.0/8"))) == {3}
    assert _ids(s.seg, s.eval(pdb.term("ip", "junk"))) == set()


def test_uuid_term(ray_session):
    schema = IndexSchema.build(
        key_field="id", id={"type": I64, "fast": True},
        uid={"type": "uuid"})
    u1 = "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "uid": pa.array([u1, "11111111-2222-3333-4444-"
                                   "555555555555"])})
    seg = build_segment(t, schema)
    s = Searcher(seg, schema)
    # case-insensitive canonical match
    assert _ids(s.seg, s.eval(pdb.term("uid", u1.upper()))) == {1}
    assert _ids(s.seg, s.eval(pdb.term("uid", u1))) == {1}
