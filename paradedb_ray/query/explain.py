"""Textual EXPLAIN for search pipelines — mirrors the shape of the
reference's `Custom Scan (ParadeDB Base Scan)` plan block
(`topk_scores.out`, `pg_search/src/postgres/customscan/`): exec method,
score projection, top-k order/limit, and the serialized query tree (our
``ast.to_json()`` is the twin of the reference's serde form, so the
`Tantivy Query:` line round-trips through ``ast.from_json``).
"""

from __future__ import annotations

import json
from typing import Optional, Sequence, Union

from paradedb_ray.query import ast


def _fmt_order_by(order_by: Sequence) -> str:
    parts = []
    for k in order_by:
        col, direction = k[0], k[1]
        s = f"{col} {'desc' if direction == 'descending' else 'asc'}"
        if len(k) > 2:
            s += " " + k[2].replace("_", " ")
        parts.append(s)
    return ", ".join(parts)


def explain(
    query: Union[ast.Query, str],
    *,
    table: str = "?",
    index: Optional[str] = None,
    limit: Optional[int] = None,
    offset: int = 0,
    order_by: Optional[Sequence] = None,
    with_score: bool = False,
    exec_method: Optional[str] = None,
) -> str:
    """Render the plan for a search / top-k pipeline invocation.

    ``exec_method`` defaults to the reference's naming: a LIMIT with an
    ordering runs ``TopKScanExecState``, everything else
    ``NormalScanExecState``.
    """
    if isinstance(query, str):
        query = ast.Parse(query)
    if exec_method is None:
        exec_method = ("TopKScanExecState" if limit is not None
                       else "NormalScanExecState")
    pad = " " * 8
    lines = []
    indent = ""
    if limit is not None:
        lines.append("Limit")
        indent = "  "
    lines.append(
        f"{indent}->  Custom Scan (ParadeDB Base Scan) on {table}"
        if limit is not None
        else f"Custom Scan (ParadeDB Base Scan) on {table}")
    body = indent + pad if limit is not None else pad
    lines.append(f"{body}Table: {table}")
    lines.append(f"{body}Index: {index or table + '_idx'}")
    lines.append(f"{body}Exec Method: {exec_method}")
    lines.append(f"{body}Scores: {'true' if with_score else 'false'}")
    if limit is not None and order_by:
        lines.append(f"{body}   TopK Order By: {_fmt_order_by(order_by)}")
        lines.append(f"{body}   TopK Limit: {limit}")
        if offset:
            lines.append(f"{body}   TopK Offset: {offset}")
    lines.append(
        f"{body}Tantivy Query: "
        + json.dumps(query.to_json(), separators=(",", ":"),
                     ensure_ascii=False))
    return "\n".join(lines)
