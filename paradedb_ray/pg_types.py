"""Postgres type normalizations — the Python twin of pg_search's
datum conversions (`pg_search/src/postgres/types.rs:1-1342`):

* **uuid** — canonical lowercase hyphenated string terms
  (`types.rs:1134-1152`: pgrx::Uuid -> uuid::Uuid::to_string);
* **inet** — canonical address text (collapsed IPv6, no leading zeros),
  host addresses without a /32 / /128 suffix, networks with their prefix
  (`types.rs:1210-1232`);
* **ltree** — hierarchical label paths indexed as a Facet: a term query
  for ``Top.Science`` matches the node AND all descendants
  (`ltree.sql` regress: "@@@ on an ltree field is PREFIX/HIERARCHICAL
  matching, not exact matching").
"""

from __future__ import annotations

import ipaddress
import uuid as _uuid

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def normalize_uuid(v) -> str:
    """-> canonical lowercase hyphenated form; raises on invalid input."""
    if isinstance(v, (bytes, bytearray)):
        return str(_uuid.UUID(bytes=bytes(v)))
    return str(_uuid.UUID(str(v)))


def _strip_v4_leading_zeros(s: str) -> str:
    """Postgres inet accepts zero-padded IPv4 octets; Python's ipaddress
    (post-CVE-2021-29921) rejects them — canonicalize first."""
    addr, slash, pfx = s.partition("/")
    parts = addr.split(".")
    if len(parts) == 4 and all(p.isdigit() for p in parts):
        addr = ".".join(str(int(p)) for p in parts)
    return addr + slash + pfx


def normalize_inet(v) -> str:
    """-> canonical inet text: host addresses bare, networks with
    prefix ('192.168.000.001' -> '192.168.0.1',
    '2001:0db8::0001' -> '2001:db8::1', '10.0.0.0/8' stays)."""
    s = _strip_v4_leading_zeros(str(v).strip())
    if "/" in s:
        net = ipaddress.ip_network(s, strict=False)
        if net.prefixlen == net.max_prefixlen:
            return str(net.network_address)
        return str(net)
    return str(ipaddress.ip_address(s))


def normalized_column(col, kind: str):
    """Arrow column -> (object ndarray of canonical strings, valid mask).
    Unparseable values are invalid (never match)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    fn = normalize_uuid if kind == "uuid" else normalize_inet
    vals = col.to_pylist()
    out = np.full(len(vals), "", dtype=object)
    valid = np.zeros(len(vals), dtype=bool)
    for i, v in enumerate(vals):
        if v is None:
            continue
        try:
            out[i] = fn(v)
            valid[i] = True
        except (ValueError, TypeError):
            pass
    return out, valid


def ltree_term_mask(col, query: str):
    """Hierarchical facet match: path == query OR path startswith
    query + '.' (vectorized arrow kernels)."""
    q = str(query)
    eq = pc.equal(col, q)
    desc = pc.starts_with(col, pattern=q + ".")
    return np.asarray(pc.or_kleene(eq, desc).fill_null(False))


def typed_term_count(col, value, kind: str) -> int:
    """Doc-freq of a uuid/inet/ltree term over a column (stats path)."""
    try:
        if kind == "ltree":
            return int(ltree_term_mask(col, value).sum())
        fn = normalize_uuid if kind == "uuid" else normalize_inet
        qv = fn(value)
    except (ValueError, TypeError):
        return 0
    rep, valid = normalized_column(col, kind)
    return int((valid & (rep == np.array(qv, dtype=object))).sum())
